"""Distributed global rank and exact ntile — the single-task global
window, removed.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole table through ONE task — the classic scale cliff (Spark even warns
at plan time).  This module computes the identical global rank with no
sequential structure beyond a |partitions|-row offset table:

1. ``repartitionByRange`` on the order columns — cross-partition order
   guaranteed by range partitioning (boundary sampling is seeded per
   partition index, deterministic for a stable input layout; rank
   correctness does not depend on WHERE the boundaries land, only on
   the range invariant);
2. per-partition ``row_number`` (parallel windows keyed by
   ``spark_partition_id``);
3. per-partition counts -> exclusive running offsets (a window over
   |partitions| rows) broadcast back; global rank = offset + local rank.

This is the same two-level lift ``operators/curation.pack_shards`` uses
for running token sums, applied to rank-by-VALUE order (which needs the
range shuffle, not a hash bucket).  The reference has no ranking surface
(its one operator is the similarity join, reference
``python/polars_sim/dataframe/join.py:15-30``).

``ntile_exact`` then buckets by the SQL-standard ntile rule — the first
``n mod k`` buckets get ``ceil(n/k)`` rows — written as explicit integer
arithmetic evaluated identically by Spark and the DuckDB oracle, so the
assignment is hash-checkable without trusting two engines' ntile
implementations to agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    num_parts: int = 32,
    out_col: str = "rank",
) -> DataFrame:
    """Add ``out_col`` = the 1-based global rank of each row under the
    lexicographic ``order_cols`` order.  The order must be a total order
    (include a unique id as the last column) — otherwise ranks of tied
    rows depend on partition placement.
    """
    if not order_cols:
        raise ValueError("global_rank: order_cols must be non-empty")
    d = df.repartitionByRange(num_parts, *[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__pid",
            F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    w_in = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        d.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    *,
    num_parts: int = 32,
    rank_col: str = "rank",
    out_col: str = "bucket",
) -> DataFrame:
    """Add ``rank_col`` (global rank) and ``out_col`` (1..k, SQL-standard
    ntile: first ``n mod k`` buckets hold ``ceil(n/k)`` rows) without a
    global window.  ``n`` rides along as a broadcast one-row total, so
    the whole computation stays distributed.
    """
    if k < 1:
        raise ValueError(f"ntile_exact: k must be >= 1, got {k}")
    ranked = global_rank(df, order_cols, num_parts=num_parts, out_col=rank_col)
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    big = f"(( __n + {k} - 1) div {k})"  # ceil(n/k)
    nbig = f"(__n % {k})"
    bucket = (
        f"CASE WHEN {rank_col} <= {nbig} * {big} "
        f"THEN ({rank_col} - 1) div {big} + 1 "
        f"ELSE {nbig} + ({rank_col} - {nbig} * {big} - 1) div (__n div {k}) + 1 END"
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, F.expr(bucket).cast("int"))
        .drop("__n")
    )
