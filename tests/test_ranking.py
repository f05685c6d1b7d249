"""Distributed global rank / exact ntile (operators/ranking.py) pinned
against the single-task window they replace, plus the SQL-standard
bucket-size law and plan assertions (no global-window single task).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_sim_spark.operators.ranking import global_rank, ntile_exact


def _df(spark, n=5000, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 500) / 7.0) for i in range(n)]
    return spark.createDataFrame(rows, ["id", "v"])


def test_global_rank_matches_window(spark):
    df = _df(spark)
    got = {
        (r.id, r.rank)
        for r in global_rank(df, ["v", "id"], num_parts=8).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


@pytest.mark.parametrize("k,n", [(10, 5000), (4, 25), (10, 3), (7, 7)])
def test_ntile_matches_window_ntile(spark, k, n):
    df = _df(spark, n=n)
    got = {
        (r.id, r.bucket)
        for r in ntile_exact(df, ["v", "id"], k, num_parts=5).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r.id, r.bucket) for r in df.withColumn("bucket", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_bucket_size_law(spark):
    # n = 25, k = 10: first n mod k = 5 buckets get ceil(25/10) = 3 rows.
    df = _df(spark, n=25)
    out = ntile_exact(df, ["v", "id"], 10).groupBy("bucket").count().collect()
    sizes = {r.bucket: r["count"] for r in out}
    assert sizes == {**{b: 3 for b in range(1, 6)}, **{b: 2 for b in range(6, 11)}}


def test_rejects_bad_args(spark):
    df = _df(spark, n=5)
    with pytest.raises(ValueError):
        global_rank(df, [])
    with pytest.raises(ValueError):
        ntile_exact(df, ["v", "id"], 0)


def test_no_single_task_global_window(spark):
    # The whole point: the executed plan must not contain a global
    # (empty-partition-spec) Window — ranks come from per-partition
    # windows keyed by spark_partition_id.
    df = _df(spark, n=200)
    plan = (
        global_rank(df, ["v", "id"], num_parts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "__pid" not in line and "windowspecdefinition" in line:
            # the only windows allowed are partitioned by __pid (local
            # ranks) or over the tiny offsets table (__c running sum)
            assert "__c" in line, line
