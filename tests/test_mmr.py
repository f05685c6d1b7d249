"""MMR re-rank (operators/similarity.mmr_rerank): bit-pinned against a
local numpy reference (the selection is exact int64 micro-unit
arithmetic, so distributed and local runs must agree exactly), plus
structural properties and the sanctioned rows-only contract query.
"""

from __future__ import annotations

import numpy as np
import pytest

from polars_sim_spark.operators.similarity import mmr_rerank


def _micro(x):
    return np.round(np.round(x, 6) * 1_000_000).astype(np.int64)


def _mmr_py(ids, rel, mat, k, lam):
    """Local reference: identical integer recurrence, plain loops."""
    ids = np.asarray(ids)
    order = np.argsort(ids)
    ids, rel, mat = ids[order], np.asarray(rel, dtype=np.float64)[order], np.asarray(mat, dtype=np.float64)[order]
    rel = _micro(rel)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mat = mat / norms[:, None]
    sims = _micro(mat @ mat.T)
    n = len(ids)
    remaining = np.ones(n, dtype=bool)
    maxsim = np.zeros(n, dtype=np.int64)
    out = []
    for rank in range(min(k, n)):
        score = (lam * rel - (100 - lam) * maxsim) // 100
        score[~remaining] = np.iinfo(np.int64).min
        best = int(np.flatnonzero(score == score.max())[0])
        out.append((rank + 1, int(ids[best]), int(score[best])))
        remaining[best] = False
        maxsim = np.maximum(maxsim, sims[:, best])
    return out


def _cands(spark, n_queries=3, n_cands=40, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for q in range(n_queries):
        qv = rng.normal(size=dim)
        ids = rng.choice(10_000, size=n_cands, replace=False)
        for i in ids:
            v = rng.normal(size=dim)
            sim = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            rows.append((q, int(i), sim, [float(x) for x in v]))
    return spark.createDataFrame(rows, "q_id int, n_id long, sim double, embedding array<double>"), rows


def test_matches_numpy_reference_exactly(spark):
    df, rows = _cands(spark)
    got = {
        (r.q_id, r.rank, r.n_id, r.mmr_micro)
        for r in mmr_rerank(df, k=10, lambda_pct=70).collect()
    }
    want = set()
    for q in {r[0] for r in rows}:
        qrows = [r for r in rows if r[0] == q]
        ref = _mmr_py(
            [r[1] for r in qrows],
            [r[2] for r in qrows],
            np.array([r[3] for r in qrows]),
            k=10,
            lam=70,
        )
        want |= {(q, rank, i, s) for rank, i, s in ref}
    assert got == want


def test_first_pick_is_pure_relevance_and_no_dups(spark):
    df, rows = _cands(spark, n_queries=2, n_cands=25, seed=9)
    out = mmr_rerank(df, k=25, lambda_pct=70).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        assert len({r.n_id for r in rs}) == len(rs) == 25
        first = next(r for r in rs if r.rank == 1)
        qrows = [r for r in rows if r[0] == q]
        best_rel = max(_micro(np.array([r[2] for r in qrows])))
        assert first.mmr_micro == (70 * best_rel) // 100


def test_lambda_100_is_relevance_order(spark):
    df, rows = _cands(spark, n_queries=1, n_cands=15, seed=3)
    out = sorted(mmr_rerank(df, k=15, lambda_pct=100).collect(), key=lambda r: r.rank)
    rels = sorted(
        ((_micro(np.array([r[2]]))[0], -r[1]) for r in rows), reverse=True
    )
    want_ids = [-negid for _, negid in rels]
    assert [r.n_id for r in out] == want_ids


def test_rejects_bad_args(spark):
    df, _ = _cands(spark, n_queries=1, n_cands=5)
    with pytest.raises(ValueError):
        mmr_rerank(df, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(df, lambda_pct=101)
