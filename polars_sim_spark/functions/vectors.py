"""Dense-vector similarity primitives over ``array<float|double>`` columns.

Pure Column expressions using ``F.zip_with`` / ``F.aggregate`` — stays in
whole-stage codegen, no Python UDF. Summation is sequential left-to-right
(deterministic), which matters for oracle comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated as double."""
    prods = F.zip_with(_as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = _as_col(a)
    sq = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe-ish: 0 when either norm is 0."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > F.lit(0.0), d / denom).otherwise(F.lit(0.0))
