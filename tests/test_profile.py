"""Dataset profiler (operators/profile.py): values and plan shape."""

from __future__ import annotations

import pytest

from polars_sim_spark.operators.profile import profile_columns


def test_profile_values_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, 4.0), (3, "b", None), (4, "a", 8.0)],
        "id long, s string, v double",
    )
    got = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(got) == {"id", "s", "v"}
    for r in got.values():
        assert r["n_rows"] == 4
    assert (got["id"]["n_null"], got["id"]["n_distinct"]) == (0, 4)
    assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["v"]["n_null"], got["v"]["n_distinct"]) == (1, 3)
    # native-typed extrema, cast AFTER aggregation: numeric order, not
    # lexicographic ('10' < '9' as strings would flip this)
    assert (got["id"]["min_str"], got["id"]["max_str"]) == ("1", "4")
    assert (got["v"]["min_str"], got["v"]["max_str"]) == ("2.0", "8.0")
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "b")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    got = {r["column"]: r for r in profile_columns(df, ["s"]).collect()}
    r = got["s"]
    assert (r["n_null"], r["n_distinct"], r["min_str"], r["max_str"]) == (2, 0, None, None)


def test_profile_single_scan_plan(spark, sf_small):
    """All columns' stats come from ONE scan: the plan has exactly one
    parquet scan and the multi-DISTINCT compiles through Expand."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    out = profile_columns(ev, ["event_id", "user_id", "event_type"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan
    assert out.count() == 3


def test_profile_validates_empty(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        profile_columns(df, [])


def test_drift_tv_hand_values(spark):
    from polars_sim_spark.operators.profile import drift_tv

    a = spark.createDataFrame([("x",), ("x",), ("y",), ("z",)], "b string")
    b = spark.createDataFrame([("x",), ("y",), ("y",), ("y",)], "b string")
    got = {r["b"]: r for r in drift_tv(a, b, ["b"]).collect()}
    # p: x=2/4, y=1/4, z=1/4 ; q: x=1/4, y=3/4, z=0
    assert (got["x"]["p_micro"], got["x"]["q_micro"]) == (500000, 250000)
    assert (got["y"]["p_micro"], got["y"]["q_micro"]) == (250000, 750000)
    assert (got["z"]["cnt_b"], got["z"]["q_micro"]) == (0, 0)  # one-sided bucket kept
    assert sum(r["tv_micro"] for r in got.values()) == 1000000  # TV = 0.5
    # identical snapshots → zero drift everywhere
    same = drift_tv(a, a, ["b"]).collect()
    assert all(r["tv_micro"] == 0 for r in same)


def test_drift_tv_single_shuffle(spark, sf_small):
    from polars_sim_spark.operators.profile import drift_tv
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    out = drift_tv(
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1),
        ["event_type"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partition exchange for the bucket agg; side totals come
    # from a window over the aggregated table, NOT a second aggregate
    # branch — so the parquet scan appears exactly twice (side A + side
    # B of the union), not four times
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert plan.count("Scan parquet") == 2
    assert "Window" in plan
    assert out.count() > 0


def test_drift_ks_detects_ordered_shift(spark):
    from polars_sim_spark.operators.profile import drift_ks

    # side B is side A shifted one bucket up: per-bucket TV is small
    # (each bucket loses/gains 25%), but the CDF gap concentrates
    a = spark.createDataFrame([(1,), (2,), (3,), (4,)], "b long")
    b = spark.createDataFrame([(2,), (3,), (4,), (5,)], "b long")
    got = {r["b"]: r for r in drift_ks(a, b, "b").collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]
    # cumulative masses: A = 25/50/75/100/100, B = 0/25/50/75/100 (micro)
    want = {1: (250000, 0), 2: (500000, 250000), 3: (750000, 500000),
            4: (1000000, 750000), 5: (1000000, 1000000)}
    for k, (p, q) in want.items():
        assert (got[k]["cum_p_micro"], got[k]["cum_q_micro"]) == (p, q)
        assert got[k]["ks_micro"] == abs(p - q)
    assert max(r["ks_micro"] for r in got.values()) == 250000  # KS = 0.25
    # identical snapshots → KS 0
    assert all(r["ks_micro"] == 0 for r in drift_ks(a, a, "b").collect())


def test_check_expectations_counts_violations(spark):
    from polars_sim_spark.operators.profile import check_expectations
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "b", 3.0), (None, "c", 50.0)],
        "id long, s string, v double",
    )
    out = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in check_expectations(
            df,
            {
                "id_not_null": F.col("id").isNull(),
                "s_not_null": F.col("s").isNull(),
                "v_in_range": F.col("v").isNull() | (F.col("v") < 0) | (F.col("v") > 10),
            },
            unique_cols=["id"],
        ).collect()
    }
    assert out == {
        "id_not_null": (1, 4),
        "s_not_null": (1, 4),
        "v_in_range": (2, 4),   # -1.0 below, 50.0 above
        "unique_id": (1, 4),    # id=2 twice → one extra
    }
    plan_df = check_expectations(df, {"x": F.col("id").isNull()}, unique_cols=["id"])
    assert plan_df.count() == 2


def test_check_expectations_validates_empty(spark):
    import pytest

    from polars_sim_spark.operators.profile import check_expectations

    with pytest.raises(ValueError):
        check_expectations(spark.range(3), {})


def test_profile_sketch_tracks_exact_cardinalities(spark, sf_small):
    """The HLL profiler path estimates within HLL's expected error of
    the exact profiler's distinct counts, column for column."""
    from polars_sim_spark import queries as q

    exact = {
        r["column"]: r["n_distinct"]
        for r in q.events_profile(spark, sf_small).collect()
    }
    est = {
        r["column"]: r["hll_distinct"]
        for r in q.events_profile_sketch(spark, sf_small).collect()
    }
    assert set(est) == set(exact)
    for c, e in exact.items():
        assert abs(est[c] - e) <= max(0.15 * e, 3.0), (c, est[c], e)
