"""Pins for the learned quality probe (operators/classifier.py).

The fit's distributed part is exact integer arithmetic (micro-unit
features, DECIMAL-exact X^T X / X^T y sums) and the solve is one numpy
call on those integers — so a pure-Python reference that replays the
same contract must reproduce the fitted weights BIT-FOR-BIT, not
approximately. That is the sanction for the rows-only fit contract row
(`quality_probe_fit_docs`), same pattern as tests/test_bpe.py and
tests/test_pq.py.
"""

from __future__ import annotations

import collections
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_sim_spark.operators.classifier import (
    BIAS_TOKEN,
    MICRO,
    fit_linear_probe,
    materialize_quality_probe,
    score_with_stored_model,
)


def _reference_fit(rows, vocab_size=64, ridge=1e-3):
    """Pure-Python replay of fit_linear_probe's exact contract:
    lowercase whitespace tokens, top-df vocab (tie lexicographic),
    x = (c*1e6) div n, integer X^T X / X^T y, same numpy solve."""
    docs = {
        did: [w for w in re.split(r"\s+", t.strip().lower()) if w]
        for did, t, _ in rows
    }
    docs = {d: tk for d, tk in docs.items() if tk}
    y = {did: yy for did, _, yy in rows}
    dfreq = collections.Counter()
    for tk in docs.values():
        dfreq.update(set(tk))
    vocab = sorted(dfreq, key=lambda t: (-dfreq[t], t))[:vocab_size]
    tidx = {t: i for i, t in enumerate(vocab)}
    V1 = len(vocab) + 1
    A = np.zeros((V1, V1), dtype=np.int64)
    b = np.zeros(V1, dtype=np.int64)
    for d, tk in docs.items():
        n = len(tk)
        feats = [(tidx[t], (c * MICRO) // n) for t, c in collections.Counter(tk).items() if t in tidx]
        feats.append((V1 - 1, MICRO))
        for i, xi in feats:
            b[i] += xi * y[d] * MICRO
            for j, xj in feats:
                A[i, j] += xi * xj
    w = np.linalg.solve(
        A.astype(np.float64) / 1e12 + ridge * np.eye(V1), b.astype(np.float64) / 1e12
    )
    weights = sorted((t, round(float(w[tidx[t]]), 6)) for t in vocab)
    return weights, round(float(w[V1 - 1]), 6)


@pytest.fixture(scope="module")
def hand_corpus(spark):
    rows = [
        (1, "good data spark query model fast", 1),
        (2, "the a the a slow filler words here", 0),
        (3, "spark data pipelines win big", 1),
        (4, "the the the a a nothing", 0),
        (5, "query data quality spark stream", 1),
        (6, "a the boring a the list", 0),
        (7, "data spark", 1),
        (8, "the a", 0),
        (9, "spark query data model", 1),
        (10, "a the a the", 0),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_fit_matches_pure_python_reference_bitwise(spark, hand_corpus):
    rows, df = hand_corpus
    got_w, got_b = fit_linear_probe(df, "doc_id", "text", "y", vocab_size=64)
    want_w, want_b = _reference_fit(rows, vocab_size=64)
    assert got_w == want_w  # exact float equality — same ints, same solve
    assert got_b == want_b


def test_fit_is_deterministic_across_partitionings(spark, hand_corpus):
    _, df = hand_corpus
    a = fit_linear_probe(df, "doc_id", "text", "y", vocab_size=64)
    b = fit_linear_probe(df.repartition(7), "doc_id", "text", "y", vocab_size=64)
    assert a == b


def test_fit_separates_teacher_labels(spark, sf_small):
    """On the contract task (teacher-threshold distillation over real
    testdata) the probe must clearly beat the majority baseline."""
    from polars_sim_spark.operators.curation import score_linear_model
    from polars_sim_spark.queries.curation import _probe_labeled_docs

    dl = _probe_labeled_docs(spark, sf_small)
    weights, bias = fit_linear_probe(dl, "doc_id", "text", "y", vocab_size=128)
    wdf = spark.createDataFrame(weights, "word string, w double")
    sc = score_linear_model(dl, "doc_id", "text", wdf, bias=bias)
    joined = sc.join(dl.select(F.col("doc_id").alias("id"), "y"), "id")
    acc = (
        joined.select(
            ((F.col("score") > 0.5) == (F.col("y") == 1)).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    base = max(r[0] for r in dl.groupBy("y").count().select(F.col("count")).collect()) / dl.count()
    assert acc >= max(0.9, base + 0.05)


def test_stored_model_roundtrip(spark, hand_corpus, tmp_path):
    rows, df = hand_corpus
    path = str(tmp_path / "probe")
    materialize_quality_probe(df, "doc_id", "text", "y", path, vocab_size=64)
    stored = {
        (r["doc_id"], r["score"])
        for r in score_with_stored_model(spark, df, "doc_id", "text", path).collect()
    }
    from polars_sim_spark.operators.curation import score_linear_model

    weights, bias = fit_linear_probe(df, "doc_id", "text", "y", vocab_size=64)
    wdf = spark.createDataFrame(weights, "word string, w double")
    live = {
        (r["id"], r["score"])
        for r in score_linear_model(df, "doc_id", "text", wdf, bias=bias).collect()
    }
    assert stored == live


def test_bias_token_cannot_collide(spark):
    # The intercept pseudo-token is a NUL-prefixed string no whitespace
    # tokenization can produce.
    assert BIAS_TOKEN.startswith("\x00")


def test_probe_stats_rejects_reserved_alias_tokens(spark):
    """ADVICE r10: a corpus whose vocabulary contains the PUBLIC aliases
    ('__bias__' / '__y__') would make the stats table key ambiguous —
    probe_sufficient_stats must refuse, not merge rows silently."""
    from polars_sim_spark.operators.classifier import probe_sufficient_stats

    df = spark.createDataFrame(
        [(1, "__bias__ weight lives here", 1), (2, "plain words", 0)],
        "doc_id long, text string, label int",
    )
    with pytest.raises(ValueError, match="__bias__"):
        probe_sufficient_stats(df, "doc_id", "text", "label").collect()
    ok = spark.createDataFrame(
        [(1, "plain words", 1), (2, "more words", 0)],
        "doc_id long, text string, label int",
    )
    assert probe_sufficient_stats(ok, "doc_id", "text", "label").count() > 0
