"""Sinks: partitioned / bucketed columnar output.

The reference has NO storage layer at all (in-memory frames in and out,
reference ``src/lib.rs:14-25``); an engine meant for 100 TB pipelines
needs its results written back to a lake in a layout the next job can
prune and co-partition on. Two layouts:

* ``write_partitioned`` — hive-style directory partitioning on
  low-cardinality columns → downstream partition pruning.
* ``write_bucketed`` — hash-bucketed, optionally sorted, saved as a
  catalog table → downstream equi-joins and aggregations on the bucket
  keys skip the shuffle entirely (both sides pre-partitioned on disk).

Both are thin, opinionated wrappers over the DataFrameWriter so tests
and queries exercise a single audited path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a (optionally hive-partitioned) columnar dataset.

    ``max_records_per_file`` bounds output file size without an extra
    repartition job (maxRecordsPerFile is applied inside the write task).
    """
    w = df.write.mode(mode).format(format)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) catalog table.

    Joins/aggregations between tables bucketed the same way on the same
    keys execute shuffle-free — the on-disk layout IS the exchange.
    """
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_back(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    *,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a dataset written by the sinks above.

    Self-describing formats (parquet/orc) carry their schema. For text
    formats (csv/json) an EXPLICIT schema is required: schema inference
    is a full extra pass over the data — a non-starter at 100 TB — and
    silently types everything it can't parse as string. ``options``
    pass through to the reader (e.g. ``header="true"`` for csv).
    """
    r = spark.read.format(format)
    if schema is not None:
        r = r.schema(schema)
    elif format in ("csv", "json"):
        raise ValueError(
            f"{format} has no embedded schema; pass schema= explicitly "
            "(inference would scan the whole dataset)"
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
