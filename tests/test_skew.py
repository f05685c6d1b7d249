"""Salted join: equivalence to the plain join, outer semantics, and the
plan property that the shuffle key actually includes the salt."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from polars_sim_spark.operators.skew import salted_join
from polars_sim_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key ("hot" = 2000 rows), a long uniform tail, plus a probe
    # key absent from the build side.
    left = spark.range(2600).select(
        F.when(F.col("id") < 2000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 500).cast("string")))
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.createDataFrame(
        [Row(k="hot", payload=1.0)]
        + [Row(k=f"k{i}", payload=float(i)) for i in range(400)]
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_equals_plain(spark, skewed, how):
    left, right = skewed
    got = (
        salted_join(left, right, on="k", num_salts=8, salt_by=["lid"], how=how)
        .select("lid", "payload")
        .orderBy("lid", "payload")
        .collect()
    )
    want = (
        left.join(right.withColumnRenamed("k", "k2"), left.k == F.col("k2"), how)
        .select("lid", "payload")
        .orderBy("lid", "payload")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_shuffle_key_includes_salt(spark, skewed):
    left, right = skewed
    # tiny test frames auto-broadcast (no Exchange at all); disable it so
    # the shuffle-grade plan — the one a 100 TB build side would get —
    # is what we assert on.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(left, right, on="k", num_salts=8, salt_by=["lid"])
        plan = formatted_plan(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    exchanges = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert any("__salt" in ln for ln in exchanges), plan


def test_self_join_same_source(spark):
    ev = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("eid")
    )
    totals = ev.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    out = salted_join(ev, totals, on="k", num_salts=4, salt_by=["eid"])
    assert out.count() == 100
    assert out.where(F.col("n").isNull()).count() == 0


def test_bad_args(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="num_salts"):
        salted_join(left, right, on="k", num_salts=0)
    with pytest.raises(ValueError, match="how"):
        salted_join(left, right, on="k", how="full")
