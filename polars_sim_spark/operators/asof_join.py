"""As-of (nearest-preceding) join — Spark-native, one shuffle.

The reference's docstring likens its similarity join to ``join_asof``
"for strings" (reference ``python/polars_sim/dataframe/join.py:32-33``,
``README.md:14``); the temporal as-of join itself is the classic
time-series operator (Polars ``join_asof``, pandas ``merge_asof``,
DuckDB ``ASOF JOIN``). Spark has no built-in, so we implement it as a
composition of existing operators rather than a UDF:

    union(tag left/right) → window last(ignorenulls) over (key, time) → filter left

Physical behavior: ONE shuffle, partitioned by the ``by`` key and sorted
by (time, side-tag, seq) inside each partition; the match is a running
``last_value(..., ignorenulls=True)`` — O(n log n) per key group, no
range-join quadratic blowup, no driver involvement. At 100 TB the plan
is a single Exchange + Sort + Window, which AQE sizes; skewed keys split
via the standard skew-join machinery.

Semantics (match DuckDB ``ASOF JOIN`` with ``l.ts >= r.ts``):
* backward direction: each left row matches the right row with the
  greatest time ≤ the left row's time, within the same ``by`` group;
* equal timestamps match (right sorts before left at the same instant);
* ties among right rows at the same time resolve to the greatest
  ``right_seq`` value (deterministic; DuckDB leaves this arbitrary, so
  oracle comparisons should pin it the same way);
* unmatched left rows survive with nulls (left-outer), or drop with
  ``how="inner"``;
* optional ``tolerance`` (seconds): matches older than the tolerance
  are nulled out (then dropped under ``how="inner"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG = "__asof_tag"
_SEQ = "__asof_seq"
_TS = "__asof_ts"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str | list[str],
    right_on: str | None = None,
    right_seq: str | None = None,
    tolerance_seconds: float | None = None,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Parameters
    ----------
    on: left time column; ``right_on`` defaults to the same name.
    by: equality key(s) — the shuffle partitioning.
    right_seq: deterministic tiebreak column among right rows sharing a
        timestamp (e.g. an event id); highest wins.
    tolerance_seconds: max allowed staleness of the match.
    how: "left" (keep unmatched with nulls) or "inner".
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    right_on = right_on or on
    by_cols = [by] if isinstance(by, str) else list(by)

    # Right payload = everything except the by-keys; collisions suffixed.
    payload = [c for c in right.columns if c not in by_cols]
    renamed = {c: (f"{c}{suffix}" if c in left.columns else c) for c in payload}

    # ALL matched fields (match ts + every payload column) ride in ONE
    # struct, so last(..., ignorenulls=True) atomically picks the whole
    # matched right row — a NULL payload value on the matched row stays
    # NULL instead of leaking an older row's value (per-column last()
    # would stitch fields from different right rows).
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    match_type = T.StructType(
        [T.StructField("ts", rtypes[right_on])]
        + [T.StructField(renamed[c], rtypes[c]) for c in payload]
    )
    r = right.select(
        *[F.col(c) for c in by_cols],
        F.col(right_on).alias(_TS),
        (F.col(right_seq) if right_seq else F.monotonically_increasing_id()).alias(_SEQ),
        F.lit(0).alias(_TAG),
        F.struct(
            F.col(right_on).alias("ts"),
            *[F.col(c).alias(renamed[c]) for c in payload],
        ).alias(_MATCH),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias(_TS),
        F.lit(None).cast("long").alias(_SEQ),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(match_type).alias(_MATCH),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    # Right rows sort before left rows at equal time (inclusive match);
    # among right rows at the same time the greatest _SEQ lands last, so
    # last_value picks it — deterministic.
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc(), F.col(_SEQ).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l)
    matched = F.last(F.col(_MATCH), ignorenulls=True).over(w)

    out = (
        u.select(
            F.col(_TAG),
            F.col(_TS),
            matched.alias(_MATCH),
            *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        )
        .where(F.col(_TAG) == 1)
        .drop(_TAG)
        .withColumn("__match_ts", F.col(_MATCH).getField("ts"))
    )
    for c in payload:
        out = out.withColumn(renamed[c], F.col(_MATCH).getField(renamed[c]))
    out = out.drop(_MATCH)

    if tolerance_seconds is not None:
        stale = (
            F.col("__match_ts").isNull()
            | (F.unix_micros(F.col(_TS)) - F.unix_micros(F.col("__match_ts"))
               > int(tolerance_seconds * 1_000_000))
        )
        for c in payload:
            out = out.withColumn(renamed[c], F.when(stale, F.lit(None)).otherwise(F.col(renamed[c])))
        out = out.withColumn("__match_ts", F.when(stale, F.lit(None)).otherwise(F.col("__match_ts")))

    if how == "inner":
        out = out.where(F.col("__match_ts").isNotNull())
    return out.drop(_TS, "__match_ts")
