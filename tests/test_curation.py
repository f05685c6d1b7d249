"""Curation operators: deterministic splits, sessionization, near-dup
removal — unit semantics plus the plan properties that make them scale."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from polars_sim_spark.operators import dedup
from polars_sim_spark.operators.curation import hash_split, sessionize


def test_hash_split_deterministic_and_proportional(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs, "doc_id").select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    frac = {
        r["split"]: r["n"] / docs.count()
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["train"] - 0.8) < 0.1
    assert abs(frac.get("val", 0) - 0.1) < 0.07
    assert abs(frac.get("test", 0) - 0.1) < 0.07


def test_hash_split_salt_changes_assignment(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="x").collect()}
    assert a != b  # different salt, different assignment...
    assert set(a) == set(b)  # ...same universe


def test_hash_split_validation(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5})


def test_hash_split_zero_shuffle(spark, sf_small):
    """The split label must be a scan-level projection — no Exchange."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = hash_split(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _ts(s):
    return datetime.fromisoformat(s)


def test_sessionize_gaps_and_islands(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [
        # user 1: two sessions (40-min gap between event 2 and 3)
        (1, base, 0),
        (1, base + timedelta(minutes=10), 1),
        (1, base + timedelta(minutes=50), 2),
        # user 2: one session
        (2, base, 3),
        (2, base + timedelta(minutes=29), 4),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize(ev, user_col="user_id", ts_col="ts", order_col="event_id")
    got = {(r["user_id"], r["event_id"]): r["session_id"] for r in out.collect()}
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (2, 3): 1, (2, 4): 1}


def test_sessionize_boundary_is_strict(spark):
    """A gap of exactly gap_minutes does NOT split (strict >)."""
    base = _ts("2024-01-01T00:00:00")
    ev = spark.createDataFrame(
        [(1, base, 0), (1, base + timedelta(minutes=30), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    out = sessionize(ev, user_col="user_id", ts_col="ts", order_col="event_id")
    assert {r["session_id"] for r in out.collect()} == {1}


def test_sessionize_single_exchange(spark, sf_small):
    """Lag window, running sum, and the session aggregate must share ONE
    user-hash exchange (hash(user_id) co-locates (user, session) groups)."""
    from polars_sim_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    s = sessionize(ev, user_col="user_id", ts_col="ts", order_col="event_id")
    agg = s.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_remove_near_dups_keeps_canonicals(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (3, "completely different words appear here only today"),
        ],
        "doc_id long, text string",
    )
    out = dedup.remove_near_dups(docs, "doc_id", "text", min_jaccard=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert out.columns == docs.columns  # full payload survives


def test_remove_near_dups_lsh_path_matches_exact(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(200)
    exact = {r["doc_id"] for r in dedup.remove_near_dups(docs, "doc_id", "text").collect()}
    lsh = {
        r["doc_id"]
        for r in dedup.remove_near_dups(docs, "doc_id", "text", use_lsh=True).collect()
    }
    # LSH may miss pairs (approximate recall) → keeps a superset of docs;
    # on this corpus the 16x4 signature finds everything exact finds.
    assert exact <= lsh


def test_chunk_text_windows(spark):
    from polars_sim_spark.operators.curation import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "  ")],
        "doc_id long, text string",
    )
    out = chunk_text(docs, "doc_id", "text", chunk_tokens=4, overlap=2)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_n_tokens"])
        for r in out.collect()
    }
    # doc 1: 10 words, stride 2 → chunks at 0,2,4,6 (ceil((10-4)/2)+1 = 4)
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w2 w3 w4 w5", 4)
    assert got[(1, 3)] == ("w6 w7 w8 w9", 4)
    assert (1, 4) not in got
    # doc 2: shorter than one chunk → exactly one, short
    assert got[(2, 0)] == ("a b", 2)
    # doc 3: whitespace-only → no chunks at all
    assert not any(d == 3 for d, _ in got)


def test_chunk_text_zero_shuffle_and_validation(spark, sf_small):
    from polars_sim_spark.operators.curation import chunk_text

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = chunk_text(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(docs, "doc_id", "text", chunk_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# decontaminate / pack_shards / temperature_sample
# ---------------------------------------------------------------------------


def test_decontaminate_flags_overlap(spark):
    from polars_sim_spark.operators.curation import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine"),
            (3, "totally different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta kappa")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["contaminated"] for r in decontaminate(corpus, ev, n=8).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_pack_shards_matches_naive_global_cumsum(spark):
    from pyspark.sql import Window

    from polars_sim_spark.operators.curation import pack_shards
    from polars_sim_spark.operators.dedup import md5_hash64

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 5).alias("n_tok")
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(
            df, id_col="doc_id", token_col="n_tok", shard_tokens=100, num_parts=8
        ).collect()
    }
    part = F.pmod(md5_hash64(F.col("doc_id").cast("string")), F.lit(8))
    w = (
        Window.orderBy("part", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]: r["shard"]
        for r in df.withColumn("part", part)
        .withColumn(
            "shard",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(100)),
        )
        .collect()
    }
    assert got == want
    # shards fill contiguously: every shard id in [0, max] occurs
    shards = sorted(set(got.values()))
    assert shards == list(range(len(shards)))


def test_pack_sequences_tiles_exactly(spark):
    from polars_sim_spark.operators.curation import pack_sequences

    df = spark.range(150).select(
        F.col("id").alias("doc_id"), (F.col("id") % 53 + 1).alias("n_tok")
    )
    rows = pack_sequences(
        df, id_col="doc_id", token_col="n_tok", seq_len=64, num_parts=8
    ).collect()
    total = sum(r["n_tok"] for r in df.collect())
    # 1. spans cover every token of every doc exactly once, in order
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 150
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["seq_id"])
        assert spans[0]["doc_lo"] == 0
        for a, b in zip(spans, spans[1:]):
            assert b["doc_lo"] == a["doc_hi"]
            assert b["seq_id"] == a["seq_id"] + 1  # contiguous chunks
            assert a["seq_hi"] == 64 and b["seq_lo"] == 0  # boundary cross
    # 2. every sequence is exactly full except the last
    by_seq: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["seq_lo"] < r["seq_hi"] <= 64
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + (r["seq_hi"] - r["seq_lo"])
    seq_ids = sorted(by_seq)
    assert seq_ids == list(range(len(seq_ids)))
    assert all(by_seq[s] == 64 for s in seq_ids[:-1])
    assert by_seq[seq_ids[-1]] == total - 64 * (len(seq_ids) - 1)


def test_pack_sequences_single_shuffle_no_global_window(spark, sf_small):
    """The doc-side plan must not contain a partition-less window: the
    global cumsum is two-level (per-partition windows + a tiny offset
    table), so only the num_parts-row offset branch may sort globally."""
    from polars_sim_spark.operators.curation import pack_sequences

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok")
    )
    out = pack_sequences(docs, id_col="doc_id", token_col="n_tok", seq_len=512, num_parts=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only exchanges: hash by __part (docs) + the broadcast offsets
    assert plan.count("Exchange SinglePartition") <= 1  # offsets branch only
    assert out.count() > 0


def test_temperature_sample_flattens_and_is_deterministic(spark):
    from polars_sim_spark.operators.curation import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(i + 900, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_sample(df, group_col="lang", id_col="doc_id", alpha=0.3)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # small group keeps everything; big group downsampled toward its
    # n^alpha share (big target = 1000 * 900^.3/(900^.3+100^.3) ~ 660)
    assert counts["small"] == 100
    assert 500 < counts["big"] < 800
    again = temperature_sample(df, group_col="lang", id_col="doc_id", alpha=0.3)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_score_linear_model_values(spark):
    """Hand-checkable BoW logits: score = mean token weight + bias,
    OOV tokens weigh 0, tokenization is lowercased whitespace."""
    from polars_sim_spark.operators.curation import score_linear_model

    docs = spark.createDataFrame(
        [(1, "the Model"), (2, "unknown words only"), (3, "  ")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame([("the", -0.08), ("model", 0.10)], "word string, w double")
    got = {
        r["id"]: r["score"]
        for r in score_linear_model(docs, "doc_id", "text", w, bias=0.05).collect()
    }
    assert got[1] == round((-0.08 + 0.10) / 2 + 0.05, 6)
    assert got[2] == 0.05  # all OOV -> bias only
    assert 3 not in got  # whitespace-only doc has no tokens


def test_weighted_sample_k_matches_model(spark):
    """weighted_sample_k equals a direct Python evaluation of the
    Efraimidis-Spirakis keys (same md5 randomness), and excludes
    non-positive weights."""
    import hashlib
    import math

    from polars_sim_spark.operators.curation import weighted_sample_k

    rows = [(i, "g1" if i < 12 else "g2", float(1 + (i * 7) % 5)) for i in range(20)]
    rows.append((99, "g1", 0.0))  # zero weight: never sampled
    df = spark.createDataFrame(rows, "id long, g string, w double")

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return round(-math.log((h + 1) / 2**32) / w, 9)

    expected = set()
    for g in ("g1", "g2"):
        members = [(key(i, w), i) for i, gg, w in rows if gg == g and w > 0]
        expected |= {i for _, i in sorted(members)[:5]}

    got = {
        r["id"]
        for r in weighted_sample_k(
            df, group_col="g", weight_col="w", id_col="id", k=5
        ).collect()
    }
    assert got == expected and 99 not in got


def test_weighted_sample_k_small_groups(spark):
    from polars_sim_spark.operators.curation import weighted_sample_k

    df = spark.createDataFrame(
        [(1, "g", 2.0), (2, "g", 3.0)], "id long, g string, w double"
    )
    got = {r["id"] for r in weighted_sample_k(
        df, group_col="g", weight_col="w", id_col="id", k=10
    ).collect()}
    assert got == {1, 2}  # k beyond group size returns the whole group


def test_events_user_funnel_hand_values(spark, tmp_path):
    """Funnel semantics on hand-built events: conversion only when the
    first purchase strictly follows the first click; missing stages
    carry NULLs."""
    from datetime import datetime

    from polars_sim_spark import queries as q

    rows = [
        (1, "click", datetime(2024, 1, 1, 10, 0, 0)),
        (1, "purchase", datetime(2024, 1, 1, 10, 0, 30)),   # converts in 30s
        (2, "purchase", datetime(2024, 1, 1, 9, 0, 0)),
        (2, "click", datetime(2024, 1, 1, 10, 0, 0)),       # purchase BEFORE click
        (3, "click", datetime(2024, 1, 1, 8, 0, 0)),        # never purchases
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    df = df.withColumn("value", F.lit(1.0))
    d = str(tmp_path / "events.parquet")
    df.write.parquet(d)
    # the query loads {sf_dir}/events.parquet
    out = {r["user_id"]: r["secs_to_convert"]
           for r in q.events_user_funnel(spark, str(tmp_path)).collect()}
    assert out == {1: 30, 2: None, 3: None}


def test_budget_cap_per_group(spark):
    from polars_sim_spark.operators.curation import budget_cap_per_group

    rows = [(i, "en" if i % 2 == 0 else "fr", 10) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = budget_cap_per_group(
        docs, group_col="lang", id_col="doc_id", token_col="n_tok",
        budget={"en": 100, "fr": 35}, num_parts=4,
    ).collect()
    en = [r for r in out if r["lang"] == "en"]
    fr = [r for r in out if r["lang"] == "fr"]
    # exactly-divisible budget: exactly 10 docs of 10 tokens
    assert len(en) == 10
    # 35-token budget: kept while before < 35 → before 0,10,20,30 → 4 docs
    # (overshoot by at most one doc, per the contract)
    assert len(fr) == 4
    # deterministic: same call returns the same kept ids
    out2 = budget_cap_per_group(
        docs, group_col="lang", id_col="doc_id", token_col="n_tok",
        budget={"en": 100, "fr": 35}, num_parts=4,
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    # a group absent from the dict is dropped entirely
    out3 = budget_cap_per_group(
        docs, group_col="lang", id_col="doc_id", token_col="n_tok",
        budget={"en": 50}, num_parts=4,
    ).collect()
    assert {r["lang"] for r in out3} == {"en"}


def test_budget_cap_per_group_int_group_col(spark):
    """The dict-budget broadcast table must be keyed with the group
    column's OWN type — an int domain id used to hit a hardcoded
    '{group_col} string' schema (createDataFrame failure / silent cast
    join)."""
    from polars_sim_spark.operators.curation import budget_cap_per_group

    rows = [(i, i % 2, 10) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, domain long, n_tok long")
    out = budget_cap_per_group(
        docs, group_col="domain", id_col="doc_id", token_col="n_tok",
        budget={0: 50, 1: 20}, num_parts=4,
    ).collect()
    assert len([r for r in out if r["domain"] == 0]) == 5
    assert len([r for r in out if r["domain"] == 1]) == 2


def test_packing_append_preserves_stored_spans(spark, tmp_path):
    """Appending new docs must not read, rewrite, or shift anything
    already packed: base span rows stay byte-identical, new offsets
    continue from the stored total (boundary sequence shared), and the
    combined store still tiles every token exactly."""
    from polars_sim_spark.operators.curation import (
        append_packed_sequences,
        materialize_packing,
    )

    path = str(tmp_path / "packing")
    base = spark.range(40).select(
        F.col("id").alias("doc_id"), (F.col("id") % 23 + 1).alias("n_tok")
    )
    new = spark.range(40, 60).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("n_tok")
    )
    materialize_packing(base, path, id_col="doc_id", token_col="n_tok", seq_len=64, num_parts=8)
    before = set(map(tuple, spark.read.parquet(f"{path}/_spans").collect()))
    total_base = sum(r["n_tok"] for r in base.collect())
    assert spark.read.parquet(f"{path}/_meta").collect()[0]["total_tokens"] == total_base

    append_packed_sequences(new, path)
    after = set(map(tuple, spark.read.parquet(f"{path}/_spans").collect()))
    assert before <= after  # stored spans untouched
    total_all = total_base + sum(r["n_tok"] for r in new.collect())
    assert spark.read.parquet(f"{path}/_meta").collect()[0]["total_tokens"] == total_all

    # combined store tiles exactly: every sequence full except the last
    by_seq: dict[int, int] = {}
    for r in after:
        _, seq_id, _, _, lo, hi = r
        by_seq[seq_id] = by_seq.get(seq_id, 0) + (hi - lo)
    seq_ids = sorted(by_seq)
    assert seq_ids == list(range(len(seq_ids)))
    assert all(by_seq[s] == 64 for s in seq_ids[:-1])
    assert sum(by_seq.values()) == total_all
    # the boundary sequence is genuinely shared between segments
    new_rows = after - before
    boundary = min(s for (_, s, *_rest) in new_rows)
    assert any(s == boundary for (_, s, *_r) in before)


def test_gather_packed_sequences_reconstructs_stream(spark):
    """Concatenating the gathered sequences in seq_id order must
    reproduce the full token stream in packing order, with every
    sequence exactly seq_len tokens except the last."""
    from polars_sim_spark.operators.curation import (
        gather_packed_sequences,
        pack_sequences,
    )
    from polars_sim_spark.operators.dedup import md5_hash64

    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(i % 7 + 1))) for i in range(30)],
        "doc_id long, text string",
    )
    counts = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok")
    )
    spans = pack_sequences(counts, id_col="doc_id", token_col="n_tok", seq_len=16, num_parts=4)
    got = {
        r["seq_id"]: (r["n_tokens"], r["seq_text"])
        for r in gather_packed_sequences(docs, spans, id_col="doc_id", text_col="text").collect()
    }
    # expected global stream: docs in (md5 % 4, doc_id) order
    order = [
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.pmod(md5_hash64(F.col("doc_id").cast("string")), F.lit(4)).alias("p")
        ).orderBy("p", "doc_id").collect()
    ]
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    stream = [w for d in order for w in texts[d].split()]
    for k in sorted(got):
        n, txt = got[k]
        assert txt.split() == stream[k * 16 : k * 16 + 16]
        assert n == len(txt.split())


def test_kn_surprisal_normalizes_and_discriminates(spark, tmp_path):
    """Kneser-Ney sanity on a hand corpus: (1) for every observed
    context, Σ_w2 p_KN(w2|w1) over the VOCAB of continuations = 1
    (the property absolute discounting + continuation backoff is built
    to preserve); (2) repetitive boilerplate scores lower surprisal
    than token soup."""
    import collections
    import math

    from polars_sim_spark import queries as q

    rows = [
        (0, "the cat sat on the mat the cat sat again"),
        (1, "the cat sat on the mat the cat sat again"),
        (2, "zeta quark blimp oxide nunatak grue vex kola jib womp"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["mean_kn_surprisal"]
           for r in q.text_kn_surprisal(spark, str(tmp_path)).collect()}
    assert out[0] == out[1] < out[2]

    # pure-python replica of the model for the normalization check
    toks = [t.split() for _, t in [(i, r[1]) for i, r in enumerate(rows)]]
    bigs = [(w1, w2) for ws in toks for w1, w2 in zip(ws, ws[1:])]
    c12 = collections.Counter(bigs)
    cctx = collections.Counter(w1 for w1, _ in bigs)
    n1f = collections.Counter(w1 for w1, _ in set(bigs))
    n1b = collections.Counter(w2 for _, w2 in set(bigs))
    nbt = len(set(bigs))
    vocab2 = {w2 for _, w2 in bigs}
    for w1 in cctx:
        total = sum(
            max(c12.get((w1, w2), 0) - 0.75, 0.0) / cctx[w1]
            + 0.75 * n1f[w1] / cctx[w1] * (n1b[w2] / nbt)
            for w2 in vocab2
        )
        # sums to 1 when Σ_w2 N1+(·w2) = N1+(··), which holds by definition
        assert math.isclose(total, 1.0, rel_tol=1e-9), (w1, total)


# ---------------------------------------------------------------------------
# Boundary-respecting (harmonic shelf) sequence packing
# ---------------------------------------------------------------------------


def _boundary_pack(spark, sizes, seq_len=512, num_parts=8):
    from polars_sim_spark.operators.curation import pack_sequences_boundary

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tok long"
    )
    return pack_sequences_boundary(
        df, id_col="doc_id", token_col="n_tok", seq_len=seq_len, num_parts=num_parts
    ).collect()


def test_boundary_pack_invariants(spark):
    """The three contract invariants on a size mix spanning every regime
    (tiny, half-window, exact-window, oversize, zero), plus the measured
    utilization report."""
    import collections

    L = 512
    sizes = [1, 3, 17, 100, 255, 256, 257, 400, 511, 512, 513, 1000, 1024, 2000, 0, 7, 7, 7]
    rows = _boundary_pack(spark, sizes, seq_len=L)

    # 1. Full coverage, split ONLY at window multiples: each doc's pieces
    # partition [0, n) and every interior boundary is a multiple of L.
    per_doc = collections.defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    for i, n in enumerate(sizes):
        got = sorted(per_doc[i], key=lambda r: r["piece"])
        if n == 0:
            assert not got
            continue
        assert [r["doc_lo"] for r in got] == [j * L for j in range(len(got))]
        assert got[-1]["doc_hi"] == n
        for r in got[:-1]:
            assert r["doc_hi"] == r["doc_lo"] + L  # interior cut at the window
        for r in got:
            assert r["doc_hi"] - r["doc_lo"] <= L  # never below-window splits

    # 2. Sequences never exceed L and are packed contiguously from 0
    # (next-fit within a shelf: spans tile [0, fill) with no overlap).
    per_seq = collections.defaultdict(list)
    for r in rows:
        per_seq[r["seq_id"]].append(r)
    for seq_rows in per_seq.values():
        seq_rows.sort(key=lambda r: r["seq_lo"])
        assert seq_rows[0]["seq_lo"] == 0
        for a, b in zip(seq_rows, seq_rows[1:]):
            assert b["seq_lo"] == a["seq_hi"]
        assert seq_rows[-1]["seq_hi"] <= L

    # 3. Harmonic fill bound on every FULL shelf (q pieces of class q):
    # fill > q * (L // (q + 1)) >= L // 2 for q >= 1 — and report overall
    # utilization for the record.
    total = sum(r["seq_hi"] - r["seq_lo"] for r in rows)
    n_seqs = len(per_seq)
    util = total / (n_seqs * L)
    class_counts = collections.Counter()
    for r in rows:
        m = r["doc_hi"] - r["doc_lo"]
        class_counts[L // m] += 1
    full_shelves = sum(c // q for q, c in class_counts.items())
    if full_shelves:
        fills = sorted(
            sum(r["seq_hi"] - r["seq_lo"] for r in v) for v in per_seq.values()
        )
        # the full_shelves largest fills are the full ones
        for fill in fills[-full_shelves:]:
            assert fill > L // 2
    print(f"boundary-pack utilization: {util:.3f} over {n_seqs} sequences")
    assert util > 0.5


def test_boundary_pack_matches_local_reference(spark):
    """Bit-pin the distributed layout against a plain-python replay of
    the same deterministic rule (md5-part order, class rank, shelf)."""
    import hashlib

    L = 64
    num_parts = 4
    sizes = [1, 2, 5, 9, 13, 17, 21, 30, 33, 40, 63, 64, 65, 130, 7, 7, 25, 25, 25]
    rows = _boundary_pack(spark, sizes, seq_len=L, num_parts=num_parts)

    def md5part(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % num_parts

    pieces = []
    for i, n in enumerate(sizes):
        for j in range((max(n, 1) - 1) // L + 1):
            if n == 0:
                continue
            lo, hi = j * L, min(n, (j + 1) * L)
            pieces.append((i, j, lo, hi, hi - lo, L // (hi - lo)))
    # class ranks in (part, id, piece) order
    expect = {}
    classes = sorted({p[5] for p in pieces})
    qoff = 0
    shelf_counts = {}
    for q in classes:
        members = sorted(
            [p for p in pieces if p[5] == q],
            key=lambda p: (md5part(p[0]), p[0], p[1]),
        )
        shelf_counts[q] = (len(members) + q - 1) // q
        pos = 0
        for idx, p in enumerate(members):
            shelf = idx // q
            if idx % q == 0:
                pos = 0
            expect[(p[0], p[1])] = (qoff + shelf, p[2], p[3], pos, pos + p[4])
            pos += p[4]
        qoff += shelf_counts[q]
    got = {
        (r["doc_id"], r["piece"]): (
            r["seq_id"],
            r["doc_lo"],
            r["doc_hi"],
            r["seq_lo"],
            r["seq_hi"],
        )
        for r in rows
    }
    assert got == expect


def test_boundary_pack_rejects_bad_seq_len(spark):
    from polars_sim_spark.operators.curation import pack_sequences_boundary

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences_boundary(df, id_col="doc_id", token_col="n_tok", seq_len=0)


def test_contamination_fraction_invariants(spark, sf_small):
    """Eval documents measured against themselves hit 10^6 ppm exactly;
    the boolean decontaminate flag is exactly (n_hit > 0); docs shorter
    than n words report zeros."""
    from polars_sim_spark.operators.curation import (
        contamination_fraction,
        decontaminate,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 7 == 0)
    frac = contamination_fraction(docs, ev, n=8).collect()
    by_id = {r["doc_id"]: r for r in frac}
    assert len(by_id) == docs.count()

    # eval members with >= 8 words are fully contained in the eval set
    ev_ids = {r["doc_id"] for r in ev.select("doc_id").collect()}
    saw_full = 0
    for i in ev_ids:
        r = by_id[i]
        if r["n_sh"] > 0:
            assert r["n_hit"] == r["n_sh"] and r["frac_ppm"] == 1_000_000
            saw_full += 1
        else:
            assert r["n_hit"] == 0 and r["frac_ppm"] == 0
    assert saw_full > 0

    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, ev, n=8).collect()
    }
    for i, r in by_id.items():
        assert flags[i] == (r["n_hit"] > 0), i
    # fraction adds information the flag doesn't: some contaminated doc
    # is only PARTIALLY contained
    partial = [r for r in frac if 0 < r["frac_ppm"] < 1_000_000]
    assert partial


def test_cluster_safe_split_no_leakage(spark, sf_small):
    """Round 11: every member of a near-dup cluster gets the SAME split
    label (the leakage guarantee), labels are the md5 hash_split of the
    cluster id (determinism pin vs hash_split on the CC output), and a
    plain per-document split on the same corpus DOES leak — proving the
    operator is load-bearing, not vacuously equal."""
    from polars_sim_spark.operators import dedup
    from polars_sim_spark.operators.curation import cluster_safe_split, hash_split

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    postings = dedup.shingle_postings(docs, "doc_id", "text")
    pairs = dedup.jaccard_pairs(postings, min_jaccard=0.5).select("l_id", "r_id")
    out = cluster_safe_split(docs, "doc_id", pairs, salt="t")
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    assert len(rows) == docs.count()

    # per-cluster label uniqueness = the leakage guarantee
    by_cluster = {}
    for _id, (cid, sp) in rows.items():
        by_cluster.setdefault(cid, set()).add(sp)
    assert all(len(v) == 1 for v in by_cluster.values())
    assert any(cid != i for i, (cid, _) in rows.items())  # real clusters exist

    # label == hash_split of the cluster id (same salt)
    cc = dedup.connected_components(
        docs.selectExpr("doc_id as id"), pairs
    )
    want = {
        r["id"]: r["split"]
        for r in hash_split(cc, "cluster_id", salt="t").collect()
    }
    assert {i: sp for i, (_c, sp) in rows.items()} == want

    # a naive per-document split DOES leak on this corpus
    naive = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", salt="t").select("doc_id", "split").collect()
    }
    leaked = [
        (l, r)
        for l, r in ((p["l_id"], p["r_id"]) for p in pairs.collect())
        if naive[l] != naive[r]
    ]
    assert leaked, "corpus has no straddling pairs — test fixture too weak"


def test_cluster_safe_split_rejects_column_collisions(spark):
    """Round 12 (ADVICE): pre-existing cluster_id / out_col columns must
    raise IMMEDIATELY (the join would otherwise create ambiguous
    duplicate names that only fail at first reference)."""
    import pytest

    from polars_sim_spark.operators.curation import cluster_safe_split

    pairs = spark.createDataFrame([(1, 2)], "l_id long, r_id long")
    has_cluster = spark.createDataFrame(
        [(1, 9), (2, 9)], "doc_id long, cluster_id long"
    )
    with pytest.raises(ValueError, match="cluster_id"):
        cluster_safe_split(has_cluster, "doc_id", pairs)
    has_split = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, split string")
    with pytest.raises(ValueError, match="split"):
        cluster_safe_split(has_split, "doc_id", pairs)
