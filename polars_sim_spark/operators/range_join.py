"""Range (interval) join — Spark-native, banded to avoid the cross product.

The reference ships no temporal operators (its one operator is the
similarity join, reference ``python/polars_sim/dataframe/join.py:15-30``);
this is part of the engine's generalization surface, same family as
:mod:`polars_sim_spark.operators.asof_join`.  Semantics match the classic
interval join (DuckDB/Postgres ``l JOIN r ON key AND r.ts BETWEEN
l.ts + lower AND l.ts + upper``).

A naive implementation is an equi-join on the key followed by the range
predicate — which Spark executes as a per-key cross product (quadratic in
the hot key's row count).  Instead we *band* time into buckets of width
``upper - lower`` (the span):

* every LEFT row lands in exactly one bucket, ``floor(ts / w)``;
* every RIGHT row is exploded into the ≤2 buckets that can contain a
  matching left timestamp, ``floor((ts-upper)/w) .. floor((ts-lower)/w)``;
* the join is an equi-join on ``(key, bucket)`` with the exact range
  predicate *in the join condition* (so ``how="left"`` keeps correct
  outer semantics: each unmatched left row survives exactly once, and
  each matching (left, right) pair is produced exactly once because the
  exploded buckets of one right row are distinct).

Physical behavior: one shuffle of each side on ``(key, bucket)`` — a
hash join whose per-task work is bounded by bucket population, never by
key population.  The right side is amplified ≤2×, map-side, before the
exchange.  At 100 TB: bucket width equals the query span, so state per
(key, bucket) cell stays proportional to the data rate within one span —
the same bound Structured Streaming uses for stream-stream interval
joins; a hot (key, bucket) cell falls to AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"
_RBUCKET = "__rj_bucket_r"
_RKEY = "__rj_key"


def _interval(seconds: int) -> Column:
    return F.expr(f"INTERVAL '{int(seconds)}' SECOND")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int,
    upper: int,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to right rows of the same ``on`` key whose
    timestamp lies in the closed interval ``[left_ts + lower, left_ts +
    upper]`` (bounds in whole seconds, ``lower <= upper``).

    Right-side columns are renamed with ``suffix`` when they collide with
    a left column (including the shared key/timestamp names), mirroring
    the collision policy of ``join_sim`` (reference ``join.py:143-149``).
    ``how`` is ``"inner"`` or ``"left"``.
    """
    if lower > upper:
        raise ValueError(f"range_join: lower ({lower}) must be <= upper ({upper})")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be 'inner' or 'left', got {how!r}")
    span = max(upper - lower, 1)

    # Every right-side column gets a name distinct from every left-side
    # name (collisions take `suffix`; the key and band columns take
    # internal names).  The join condition then resolves purely by name,
    # which stays unambiguous even when both inputs derive from the SAME
    # source DataFrame (self-join: e.g. clicks-vs-errors of one events
    # table) — per-side Column references (lb[c]/rb[c]) would alias the
    # same attribute id there and silently mis-bind.
    lcols = set(left.columns)
    renames = {c: c + suffix for c in right.columns if c in lcols and c != on}
    renames[on] = _RKEY
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)

    # Left: single bucket. Cast truncates to epoch seconds — fine for
    # banding; the exact predicate below uses the full-precision columns.
    lb = left.withColumn(_BUCKET, F.floor(F.col(left_ts).cast("long") / span))

    # Right: explode into every bucket a matching left ts could occupy.
    lo_b = F.floor((F.col(r_ts) - _interval(upper)).cast("long") / span)
    hi_b = F.floor((F.col(r_ts) - _interval(lower)).cast("long") / span)
    rb = r.withColumn(_RBUCKET, F.explode(F.sequence(lo_b, hi_b)))

    in_range = F.col(r_ts).between(
        F.col(left_ts) + _interval(lower), F.col(left_ts) + _interval(upper)
    )
    cond = (
        (F.col(on) == F.col(_RKEY)) & (F.col(_BUCKET) == F.col(_RBUCKET)) & in_range
    )
    return lb.join(rb, cond, how).drop(_RKEY, _BUCKET, _RBUCKET)
