"""Query registry: every implemented operator exposed as a named query
``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle SQL string that must
produce identical rows (same column names; floats rounded identically).

Determinism rules used throughout (so Spark and DuckDB hash-match):

* money/measure sums go through ``CAST(... AS DECIMAL(18,6))`` so the
  aggregation is exact and order-independent; the final value is rounded
  and cast back to double;
* per-row float math is written with identical association in both
  engines (IEEE doubles are deterministic given the same expression);
* rankings that could tie on floats rank on ``round(x, 6)`` with an
  integer-key tiebreak;
* every computed column is aliased to the same name in both engines;
* round DECIMAL sums BEFORE casting to double: ``round(cast(sum ..
  double), 2)`` diverges across engines when the target digit sits on a
  half boundary — Spark's double round goes through the shortest
  decimal rendering while DuckDB rounds the exact binary value
  (``tpch_q10_returned_revenue`` hit this: decimal 307843.595 → .60 vs
  .59). ``round(sum_decimal, 2)`` then cast agrees everywhere. Older
  queries using the cast-first order are green on the fixed testdata
  and stay untouched; new queries must round decimal-first.
* MEANS of rounded values go further: even ``round(decimal_sum/count)``
  divides as a double and can land on a half boundary
  (``text_bigram_surprisal`` hit one at the 6th decimal). Compute
  means in integer micro-units instead — round the per-row value to
  6 dp, scale ×10⁶ to BIGINT, sum exactly, integer-divide by the
  count (``div`` / ``//``), then /1e6 — every step is exact and
  engine-identical.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


DUCK_HASH = "CAST(('0x' || substr(md5({c}),1,8)) AS BIGINT)"
