"""Z-order clustered lake layout: multi-dimensional data skipping.

Hive partitioning (sinks.py) prunes on ONE low-cardinality column and
bucketing co-partitions joins — neither helps a selective scan that
filters on TWO independent high-cardinality columns at once (user AND
value range, key AND time). The lake answer (public: the Morton/Z-curve
literature, and the OPTIMIZE ZORDER feature of open-source lakehouse
table formats) is to CLUSTER rows by an interleaved-bit key so that a
box in (x, y) space touches few row groups, letting parquet min/max
stats skip the rest. At 100 TB the scan cost of a selective 2-D query
is proportional to row groups whose stats overlap the box — clustering
is the difference between reading the whole table and reading a sliver.

Spark-first mechanics: the z-key is a pure Column expression (scale
each dimension to a fixed-width integer grid against its min/max, then
interleave bits with literal-shift ``shiftleft``/``&`` terms — all
whole-stage-codegen JVM arithmetic); the layout is
``repartitionByRange`` on the key (range exchange = contiguous z-runs
per file) + ``sortWithinPartitions`` (contiguous z-runs per ROW GROUP —
the unit parquet stats skip at). No UDFs, no driver loops; the only
driver-side values are the per-column min/max bounds (one 1-row agg),
which callers at scale would source from catalog stats instead.

The key itself is deterministic given the bounds — integer grid, IEEE
scaling done in one fixed operation order — so the contract query's
DuckDB oracle reproduces every z-value exactly (queries/events.py).
Measured pruning deltas live in BASELINE.md; the row-group-overlap
mechanics are pinned in tests/test_sinks.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Grid width per dimension. 16 bits × up to 3 dims < 63 bits keeps the
#: interleaved key a positive BIGINT under ANSI arithmetic.
ZORDER_BITS = 16


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = ZORDER_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Interleaved-bit (Morton) key over ``cols`` as a Column.

    Each column is scaled to ``[0, 2**bits)`` against its (min, max) —
    passed via ``bounds`` or computed here with one single-row agg —
    with ``floor((v - min) / span * (2**bits - 1))``, then bit i of
    dimension j lands at key bit ``i * ncols + j``. Nulls clamp to grid
    cell 0 (they sort first, same as a plain sort). The expression is
    ``bits × ncols`` literal-shift terms — constant-folded, codegen'd,
    engine-portable integer arithmetic.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"{len(cols)} dims × {bits} bits = {bits * len(cols)} key bits; "
            "keep it under 63 (lower `bits` for more dimensions)"
        )
    if bounds is None:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).first()
        bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    ncols = len(cols)
    grid_max = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = bounds[c]
        span = (mx - mn) or 1.0  # constant column -> everything in cell 0
        cell = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(float(span))
            * F.lit(float(grid_max))
        ).cast("long")
        cell = F.greatest(F.lit(0), F.least(F.lit(grid_max), F.coalesce(cell, F.lit(0))))
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * ncols + j
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = ZORDER_BITS,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-curve over ``cols``:
    range-partition on the key (each output file owns a contiguous
    z-range) and sort within partitions (each ROW GROUP owns a
    contiguous z-run), so every clustered column's min/max stats are
    tight and a multi-column box predicate prunes at both the file and
    row-group level. The key is layout-only — it is not written."""
    z = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def row_groups_overlapping(
    path: str,
    predicates: dict[str, tuple[float, float]],
) -> tuple[int, int]:
    """(matching, total) parquet row groups whose min/max stats overlap
    EVERY ``col: (lo, hi)`` box side — the skipping a stats-aware scan
    achieves on this layout, counted from file metadata only (no data
    read). This is the audit tool behind the BASELINE.md pruning table
    and the layout tests; Spark's own scan applies the same bound via
    parquet filter pushdown."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = matching = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in predicates.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> scanner must read it
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            matching += ok
    return matching, total
