"""Deterministic HLL: estimates within the theoretical error band of
exact distinct counts, and exactly reproducible run-to-run."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_sim_spark.operators.sketches import hll_distinct


def test_hll_accuracy_vs_exact(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    est = {r[0]: r["hll_distinct"] for r in hll_distinct(ev, "event_type", "user_id").collect()}
    exact = {
        r[0]: r[1]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        rel = abs(e - exact[k]) / max(exact[k], 1)
        # 1.04/sqrt(256) ≈ 6.5% std error; allow 3 sigma
        assert rel < 0.20, (k, e, exact[k])


def test_hll_deterministic_and_synthetic_cardinalities(spark):
    # known cardinalities across the small-range-correction boundary
    rows = [(g, f"u{g}_{i % n}") for g, n in [("a", 5), ("b", 700), ("c", 3000)] for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, u string")
    est1 = {r["g"]: r["hll_distinct"] for r in hll_distinct(df, "g", "u").collect()}
    est2 = {r["g"]: r["hll_distinct"] for r in hll_distinct(df, "g", "u").collect()}
    assert est1 == est2
    for g, n in [("a", 5), ("b", 700), ("c", 3000)]:
        rel = abs(est1[g] - n) / n
        assert rel < 0.20, (g, est1[g], n)
    # tiny cardinality goes through linear counting and is near-exact
    assert abs(est1["a"] - 5) < 0.5


def test_cms_overestimate_guarantee(spark, sf_small):
    """Count-min structural guarantee: estimate >= true count for EVERY
    item, and the overestimate stays within the collision bound for
    most items."""
    from polars_sim_spark.operators.sketches import CMS_W, cms_counters, cms_estimate

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    n = ev.count()
    counters = cms_counters(ev, None, "user_id")
    cand = ev.select("user_id").distinct()
    est = {
        r["user_id"]: r["cms_count"]
        for r in cms_estimate(counters, cand, "user_id").collect()
    }
    exact = {r[0]: r[1] for r in ev.groupBy("user_id").count().collect()}
    # NB: cms_estimate casts items to string; exact keys are ints
    est = {int(k): v for k, v in est.items()}
    assert set(est) == set(exact)
    over = []
    for k, true in exact.items():
        assert est[k] >= true, (k, est[k], true)  # never underestimates
        over.append(est[k] - true)
    # expected collision mass ~ n/w per row; min over 4 rows ≪ that.
    # assert the MEDIAN overestimate is within 2x the single-row bound.
    over.sort()
    assert over[len(over) // 2] <= 2 * n / CMS_W, (over[len(over) // 2], n / CMS_W)


def test_cms_grouped(spark):
    from polars_sim_spark.operators.sketches import cms_counters, cms_estimate

    rows = [("a", "x")] * 50 + [("a", "y")] * 3 + [("b", "x")] * 7
    df = spark.createDataFrame(rows, "g string, v string")
    counters = cms_counters(df, "g", "v")
    items = df.select("g", "v").distinct()
    est = {
        (r["g"], r["v"]): r["cms_count"]
        for r in cms_estimate(counters, items, "v", group_col="g").collect()
    }
    # tiny domain: no collisions → exact
    assert est == {("a", "x"): 50, ("a", "y"): 3, ("b", "x"): 7}


def test_cms_heavy_hitters_no_false_negatives(spark, sf_small):
    """Every TRUE phi-heavy value must appear in the sketch's output
    (estimates never undercount), and each survivor's estimate clears
    the threshold it was filtered on."""
    import math

    from polars_sim_spark.operators.sketches import cms_heavy_hitters

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    phi = 0.01
    n = ev.count()
    got = {
        int(r["user_id"]): r["cms_count"]
        for r in cms_heavy_hitters(ev, "user_id", phi).collect()
    }
    exact = {r[0]: r[1] for r in ev.groupBy("user_id").count().collect()}
    thr = math.ceil(phi * n)
    true_heavy = {k for k, c in exact.items() if c >= thr}
    assert true_heavy <= set(got)
    assert all(est >= thr for est in got.values())


def test_cms_heavy_hitters_grouped_and_validation(spark):
    from polars_sim_spark.operators.sketches import cms_heavy_hitters

    rows = [("a", "x")] * 50 + [("a", "y")] * 3 + [("b", "x")] * 7
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["v"]): r["cms_count"]
        for r in cms_heavy_hitters(df, "v", 0.5, group_col="g").collect()
    }
    # tiny domain: no collisions -> exact counts; per-group thresholds
    # (27 for g=a, 4 for g=b) keep only the dominant value of each group
    assert got == {("a", "x"): 50, ("b", "x"): 7}
    import pytest

    with pytest.raises(ValueError, match="phi"):
        cms_heavy_hitters(df, "v", 0.0)


def test_heavy_hitters_exact_equals_plain_groupby(spark, sf_small):
    """The exact confirming pass end-to-end: CMS candidates → semi join →
    exact count → threshold must equal a plain exact GROUP BY/HAVING —
    any false negative in the sketch chain would drop a row here."""
    from polars_sim_spark.operators.sketches import heavy_hitters_exact

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    got = sorted(
        (r["user_id"], r["exact_count"])
        for r in heavy_hitters_exact(ev, "user_id", 0.005).collect()
    )
    n = ev.count()
    import math

    thresh = math.ceil(0.005 * n)
    expected = sorted(
        (r["user_id"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= thresh)
        .collect()
    )
    assert got == expected and len(got) > 0


def test_quantile_sketch_rank_error_bound(spark, sf_small):
    """The sample-quantile guarantee: for each group and each q, the
    rank of the sketch estimate in the TRUE value distribution is
    within a few standard errors (sqrt(q(1-q)/s)) of q·n. With s=256
    the worst σ is ~0.031 (median); assert a 4σ-with-margin bound of
    0.15 everywhere and a tighter mean bound."""
    from polars_sim_spark.operators.sketches import quantile_sketch

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    est = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in quantile_sketch(
            ev, "event_type", "value", "event_id", [0.5, 0.9, 0.99], s=256
        ).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    errs = []
    for et, (p50, p90, p99) in est.items():
        xs = sorted(vals[et])
        n = len(xs)
        for q, e in ((0.5, p50), (0.9, p90), (0.99, p99)):
            import bisect

            rank = bisect.bisect_right(xs, e) / n
            errs.append(abs(rank - q))
    assert max(errs) <= 0.15, (max(errs), errs)
    assert sum(errs) / len(errs) <= 0.05, sum(errs) / len(errs)


def test_quantile_sketch_plans_partial_group_limit(spark, sf_small):
    """Bounded state claim: the s-smallest-per-group filter must plan as
    WindowGroupLimit (partial map-side limit BEFORE the exchange), so
    the shuffle moves O(tasks·s) rows per group, not the group."""
    from polars_sim_spark.operators.sketches import quantile_sketch

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    df = quantile_sketch(ev, "event_type", "value", "event_id", [0.5], s=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_sketch_merge_equals_single_pass(spark, sf_small):
    """Mergeability of both sketch states: HLL registers merge by max,
    CMS counters by sum — merged-shard state must equal the single-pass
    state ROW FOR ROW (not just estimate-close)."""
    from polars_sim_spark.operators.sketches import (
        cms_counters,
        cms_merge,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]

    direct = sorted(map(tuple, hll_registers(ev, "event_type", "user_id").collect()))
    merged = sorted(
        map(
            tuple,
            hll_merge(
                *[hll_registers(p, "event_type", "user_id") for p in parts]
            ).collect(),
        )
    )
    assert direct == merged

    d_cms = sorted(map(tuple, cms_counters(ev, "event_type", "user_id").collect()))
    m_cms = sorted(
        map(
            tuple,
            cms_merge(*[cms_counters(p, "event_type", "user_id") for p in parts]).collect(),
        )
    )
    assert d_cms == m_cms


def test_hll_shards_append_and_serve(spark, sf_small, tmp_path):
    """Persisted sketch maintenance: ingest two day-shards, append a
    third later, and the stored-sketch estimate must equal the
    single-pass estimate over the whole corpus — the serve reads only
    register rows (asserted via the scan's tiny input)."""
    from polars_sim_spark.operators.sketches import (
        append_hll_shard,
        hll_distinct,
        hll_estimate_stored,
        materialize_hll_shards,
    )

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    path = str(tmp_path / "hll_shards")
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    materialize_hll_shards(parts[0], path, "event_type", "user_id", shard="d0")
    materialize_hll_shards(parts[1], path, "event_type", "user_id", shard="d1")
    served_2 = hll_estimate_stored(spark, path, "event_type")
    assert served_2.count() > 0  # serving works mid-history

    append_hll_shard(parts[2], path, "event_type", "user_id", shard="d2")
    served = sorted(
        map(tuple, hll_estimate_stored(spark, path, "event_type").collect())
    )
    direct = sorted(map(tuple, hll_distinct(ev, "event_type", "user_id").collect()))
    assert served == direct

    # the serve plan reads the sketch parquet, not the events corpus
    plan = (
        hll_estimate_stored(spark, path, "event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hll_shards" in plan and "events.parquet" not in plan


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value answers TRUE; merged shard filters equal the
    filter over the union; false positives exist at tiny m (sanity that
    the maybe-set is a superset, not equality by construction)."""
    from polars_sim_spark.operators.sketches import (
        bloom_bits,
        bloom_contains,
        bloom_merge,
    )

    a = spark.createDataFrame([(f"in_{i}",) for i in range(200)], "v string")
    b = spark.createDataFrame([(f"in_{i}",) for i in range(200, 400)], "v string")
    both = a.unionByName(b)
    probe = spark.createDataFrame(
        [(f"in_{i}",) for i in range(400)] + [(f"out_{i}",) for i in range(400)],
        "v string",
    )
    # tiny m forces collisions → false positives must appear
    bits = bloom_bits(both, "v", m=512, k=3)
    got = {r["v"]: r["bloom_maybe"] for r in bloom_contains(bits, probe, "v", m=512, k=3).collect()}
    assert all(got[f"in_{i}"] for i in range(400))  # no false negatives
    assert any(got[f"out_{i}"] for i in range(400))  # collisions occur at m=512
    assert not all(got[f"out_{i}"] for i in range(400))  # but not everything
    # shard merge == union build, exactly
    merged = bloom_merge(bloom_bits(a, "v", m=512, k=3), bloom_bits(b, "v", m=512, k=3))
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in bits.collect()
    )


def test_decontaminate_bloom_equals_plain(spark, sf_small):
    """The bloom-prefiltered flag equals plain decontaminate exactly, and
    contaminated ⇒ bloom_candidate on every row."""
    from polars_sim_spark.operators.curation import decontaminate, decontaminate_bloom

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    ev = docs.where(F.col("doc_id") < 50)
    plain = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, ev, n=8).select("doc_id", "contaminated").collect()
    }
    rows = decontaminate_bloom(docs, ev, n=8).collect()
    assert len(rows) == len(plain)
    for r in rows:
        assert r["contaminated"] == plain[r["doc_id"]]
        if r["contaminated"]:
            assert r["bloom_candidate"]


def test_bloom_packed_kernel_equals_row_form(spark):
    """The packed-bitset mapInPandas twin answers identically to the
    declarative row-form join on every probe (same md5 arithmetic)."""
    from polars_sim_spark.operators.sketches import (
        bloom_bits,
        bloom_contains,
        bloom_contains_packed,
    )

    vals = spark.createDataFrame([(f"in_{i}",) for i in range(300)], "v string")
    probe = spark.createDataFrame(
        [(f"in_{i}",) for i in range(600)] + [(f"out_{i}",) for i in range(600)],
        "v string",
    )
    bits = bloom_bits(vals, "v", m=2048, k=3)
    a = {r["v"]: r["bloom_maybe"] for r in bloom_contains(bits, probe, "v", m=2048, k=3).collect()}
    b = {r["v"]: r["bloom_maybe"] for r in bloom_contains_packed(bits, probe, "v", m=2048, k=3).collect()}
    assert a == b
    assert any(a[f"out_{i}"] for i in range(600))  # collisions present at m=2048


def test_cms_and_bloom_shards_append_and_serve(spark, tmp_path):
    """Stored-sketch symmetry: CMS shards sum to the single-pass
    counters' estimates; bloom shards union to the single-pass filter."""
    from polars_sim_spark.operators.sketches import (
        append_bloom_shard,
        append_cms_shard,
        bloom_bits,
        bloom_contains,
        bloom_contains_stored,
        cms_counters,
        cms_estimate,
        cms_estimate_stored,
    )

    rows = [(f"u{i % 37}",) for i in range(600)]
    df = spark.createDataFrame(rows, "u string")
    half1 = spark.createDataFrame(rows[:300], "u string")
    half2 = spark.createDataFrame(rows[300:], "u string")
    items = spark.createDataFrame([(f"u{i}",) for i in range(40)], "u string")

    cpath = str(tmp_path / "cms")
    append_cms_shard(half1, cpath, None, "u", shard="a")
    append_cms_shard(half2, cpath, None, "u", shard="b")
    served = {
        r["u"]: r["cms_count"]
        for r in cms_estimate_stored(spark, cpath, items, "u").collect()
    }
    single = {
        r["u"]: r["cms_count"]
        for r in cms_estimate(cms_counters(df, None, "u"), items, "u").collect()
    }
    assert served == single

    bpath = str(tmp_path / "bloom")
    append_bloom_shard(half1, bpath, "u", shard="a", m=512, k=3)
    append_bloom_shard(half2, bpath, "u", shard="b", m=512, k=3)
    got = {
        r["u"]: r["bloom_maybe"]
        for r in bloom_contains_stored(spark, bpath, items, "u", m=512, k=3).collect()
    }
    want = {
        r["u"]: r["bloom_maybe"]
        for r in bloom_contains(bloom_bits(df, "u", m=512, k=3), items, "u", m=512, k=3).collect()
    }
    assert got == want
    assert all(got[f"u{i}"] for i in range(37))  # every inserted value TRUE
