"""Range-join operator: equivalence to the naive per-key cross filter,
outer semantics, and the banding invariant (each pair produced once)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from polars_sim_spark.operators.range_join import range_join


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 10:00:00", lid=1),
            Row(k="a", ts="2024-01-01 10:07:00", lid=2),
            Row(k="b", ts="2024-01-01 10:00:30", lid=3),
            Row(k="c", ts="2024-01-01 09:00:00", lid=4),  # no right rows at all
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 09:55:01", rid=10),  # in [-5m, 0] of lid=1
            Row(k="a", ts="2024-01-01 10:00:00", rid=11),  # boundary: equal ts
            Row(k="a", ts="2024-01-01 10:03:00", rid=12),  # matches lid=2 only
            Row(k="b", ts="2024-01-01 10:00:00", rid=13),
            Row(k="b", ts="2024-01-01 11:00:00", rid=14),  # out of range
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def _naive(left, right, lower, upper, how):
    r = right.withColumnRenamed("ts", "ts_r").withColumnRenamed("k", "k_r")
    cond = (
        (left.k == r.k_r)
        & (r.ts_r >= left.ts + F.expr(f"INTERVAL '{lower}' SECOND"))
        & (r.ts_r <= left.ts + F.expr(f"INTERVAL '{upper}' SECOND"))
    )
    return left.join(r, cond, how).select("lid", "rid").orderBy("lid", "rid")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_naive_cross_filter(spark, frames, how):
    left, right = frames
    got = (
        range_join(left, right, on="k", lower=-300, upper=0, how=how)
        .select("lid", "rid")
        .orderBy("lid", "rid")
        .collect()
    )
    want = _naive(left, right, -300, 0, how).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pairs_produced_exactly_once(spark, frames):
    left, right = frames
    out = range_join(left, right, on="k", lower=-300, upper=0, how="inner")
    dups = out.groupBy("lid", "rid").count().where(F.col("count") > 1).count()
    assert dups == 0


def test_left_outer_keeps_unmatched_once(spark, frames):
    left, right = frames
    out = range_join(left, right, on="k", lower=-300, upper=0, how="left")
    c4 = out.where(F.col("lid") == 4)
    assert c4.count() == 1
    assert c4.collect()[0]["rid"] is None


def test_forward_window(spark, frames):
    """lower=0, upper=+300: matches right rows AFTER the left row."""
    left, right = frames
    got = (
        range_join(left, right, on="k", lower=0, upper=300, how="inner")
        .select("lid", "rid")
        .orderBy("lid", "rid")
        .collect()
    )
    want = _naive(left, right, 0, 300, "inner").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_collision_suffix(spark, frames):
    left, right = frames
    out = range_join(left, right, on="k", lower=-300, upper=0, how="inner")
    assert "ts_r" in out.columns and "ts" in out.columns
    assert out.columns.count("k") == 1


def test_bad_bounds_raise(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="lower"):
        range_join(left, right, on="k", lower=10, upper=0)


def test_self_join_same_source(spark):
    """Both sides derived from ONE DataFrame (the bug class: per-side
    Column refs alias the same attribute id and mis-bind the join)."""
    base = spark.createDataFrame(
        [Row(k="a", ts="2024-01-01 10:00:00", kind="x", i=1),
         Row(k="a", ts="2024-01-01 10:02:00", kind="y", i=2),
         Row(k="a", ts="2024-01-01 10:20:00", kind="y", i=3)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = base.where(F.col("kind") == "x").select("k", "ts", F.col("i").alias("lid"))
    right = base.where(F.col("kind") == "y").select("k", "ts", F.col("i").alias("rid"))
    got = (
        range_join(left, right, on="k", lower=0, upper=300, how="left")
        .select("lid", "rid").collect()
    )
    assert [tuple(r) for r in got] == [(1, 2)]


# ---------------------------------------------------------------------------
# Property-based: banded range_join vs a pure-Python interval model
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st

_BASE = datetime(2024, 1, 1)


def _model(lrows, rrows, lower, upper):
    out = set()
    for lid, k, lts in lrows:
        for rid, rk, rts in rrows:
            if k == rk and lower <= (rts - lts).total_seconds() <= upper:
                out.add((lid, rid))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    data=st.data(),
    bounds=st.tuples(
        st.integers(min_value=-900, max_value=900),
        st.integers(min_value=-900, max_value=900),
    ).map(sorted),
)
def test_range_join_matches_interval_model(spark, data, bounds):
    lower, upper = bounds
    keys = st.sampled_from(["a", "b"])
    offs = st.integers(min_value=0, max_value=3600)
    lrows = [
        (i, k, _BASE + timedelta(seconds=o))
        for i, (k, o) in enumerate(
            data.draw(st.lists(st.tuples(keys, offs), min_size=1, max_size=8))
        )
    ]
    rrows = [
        (i, k, _BASE + timedelta(seconds=o))
        for i, (k, o) in enumerate(
            data.draw(st.lists(st.tuples(keys, offs), min_size=0, max_size=8))
        )
    ]
    left = spark.createDataFrame(
        [(lid, k, ts) for lid, k, ts in lrows], ["lid", "k", "ts"]
    )
    right = (
        spark.createDataFrame([(rid, k, ts) for rid, k, ts in rrows], ["rid", "k", "ts"])
        if rrows
        else spark.createDataFrame([], "rid long, k string, ts timestamp")
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, on="k", lower=lower, upper=upper).collect()
    }
    assert got == _model(lrows, rrows, lower, upper)
