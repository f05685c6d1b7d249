"""Sink round-trip tests: partitioned and bucketed output layouts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from polars_sim_spark.sources.sinks import read_back, write_bucketed, write_partitioned


def test_partitioned_roundtrip(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(events, out, partition_by=["lang"], max_records_per_file=10_000)
    # hive layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(out))
    back = read_back(spark, out)
    assert back.count() == events.count()
    # partition pruning: only the one directory is scanned
    one = back.where(F.col("lang") == back.select("lang").first()["lang"])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


def test_bucketed_table_roundtrip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS t_docs_bucketed")
    write_bucketed(
        docs, "t_docs_bucketed", bucket_by=["doc_id"], num_buckets=4, sort_by=["doc_id"]
    )
    back = spark.table("t_docs_bucketed")
    assert back.count() == docs.count()
    desc = spark.sql("DESCRIBE EXTENDED t_docs_bucketed").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "doc_id" in txt
    spark.sql("DROP TABLE t_docs_bucketed")


def test_csv_json_roundtrip_require_schema(spark, tmp_path):
    """Text-format round-trips: values survive, and schemaless reads of
    csv/json are refused (inference = full extra scan at scale)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5)], "id long, name string, score double"
    )
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        write_partitioned(df, path, format=fmt)
        back = read_back(
            spark, path, fmt, schema="id long, name string, score double"
        )
        assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
            (1, "alpha", 1.5),
            (2, "beta", 2.5),
        ]
        with pytest.raises(ValueError, match="schema"):
            read_back(spark, path, fmt)
