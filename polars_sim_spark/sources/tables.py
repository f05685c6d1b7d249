"""Parquet sources for the driver testdata star schema (TESTDATA.md).

The reference has no IO layer at all (in-memory DataFrames only,
reference ``src/lib.rs:14-25``); this engine reads columnar parquet so
Catalyst gets predicate pushdown + column pruning for free. At cluster
scale the same code reads a partitioned lake path — nothing here assumes
local files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to a session-tz (UTC) TimestampType column
    regardless of how the generator encoded it — the driver has shipped
    both TIMESTAMP(NANOS) (which Spark reads as long under the legacy
    conf) and plain µs timestamps without UTC adjustment (which Spark
    reads as TIMESTAMP_NTZ, rejected by e.g. streaming watermarks). All
    conversions are exact and keep the scan distributed."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_field = next(f for f in df.schema.fields if f.name == "ts")
    if isinstance(ts_field.dataType, T.LongType):
        # Integer division: epoch nanos exceed 2^53, so the double round
        # trip of col/1000 could land µs-aligned values 1µs off.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_field.dataType, T.TimestampNTZType):
        # Session tz is pinned UTC (session.py), so this cast maps the
        # wall-clock reading to the same instant.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
