"""Physical-variant equivalence: the broadcast dense-accumulator kernel
(mapInPandas, operators/join_sim_kernel.py) must produce exactly the same
mapping as the declarative token-join plan — the analog of the
reference's left/right threading-dimension equivalence tests
(reference ``tests/test_sim.py:55-74``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_sim_spark.operators.join_sim import join_sim, similarity_mapping


@pytest.fixture(scope="module")
def part(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/part.parquet").select("p_partkey", "p_name")


def _collect_mapping(df):
    return sorted(
        (r["l_id"], r["r_id"], round(r["sim"], 9)) for r in df.collect()
    )


@pytest.mark.parametrize("normalization", ["l2", "count"])
def test_kernel_equals_declarative(spark, part, normalization):
    left = part.select(F.col("p_partkey").alias("l_id"), F.col("p_name").alias("ls"))
    right = part.select(F.col("p_partkey").alias("r_id"), F.col("p_name").alias("rs"))
    kw = dict(
        left_on="ls",
        right_on="rs",
        top_n=3,
        normalization=normalization,
        left_id="l_id",
        right_id="r_id",
    )
    declarative = similarity_mapping(left, right, strategy="shuffle", **kw)
    kernel = similarity_mapping(left, right, strategy="kernel", **kw)
    assert _collect_mapping(declarative) == _collect_mapping(kernel)


def test_kernel_through_join_sim(spark, part):
    out = join_sim(
        part,
        part,
        on="p_name",
        top_n=2,
        strategy="kernel",
        left_id="p_partkey",
        right_id="p_partkey",
    )
    assert out.count() > 0
    assert "sim" in out.columns


def test_threading_dimension_compat(spark, part):
    """Reference keyword `threading_dimension` maps onto the strategy."""
    left = part.select(F.col("p_partkey").alias("l_id"), F.col("p_name").alias("s"))
    a = join_sim(
        left, left, on="s", top_n=2, left_id="l_id", right_id="l_id",
        threading_dimension="left", threads=8,
    )
    b = join_sim(
        left, left, on="s", top_n=2, left_id="l_id", right_id="l_id",
        threading_dimension="right",
    )
    sa = sorted((r["l_id"], r["sim"]) for r in a.select("l_id", "sim").collect())
    sb = sorted((r["l_id"], r["sim"]) for r in b.select("l_id", "sim").collect())
    assert [x[0] for x in sa] == [x[0] for x in sb]


def test_kernel_right_size_guard(spark, monkeypatch):
    """Oversized right side must fail fast with the documented message,
    not collect onto the driver (round-1 finding: unguarded OOM path)."""
    import polars_sim_spark.operators.join_sim_kernel as jk

    monkeypatch.setattr(jk, "KERNEL_RIGHT_MAX_ROWS", 2)
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "bcdefg"), (3, "cdefgh")], "rid long, s string"
    )
    with pytest.raises(ValueError, match="KERNEL_RIGHT_MAX_ROWS"):
        similarity_mapping(
            df.withColumnRenamed("rid", "l_id"),
            df.withColumnRenamed("rid", "r_id"),
            left_on="s",
            right_on="s",
            strategy="kernel",
            left_id="l_id",
            right_id="r_id",
        )


def test_kernel_preserves_string_ids(spark):
    """strategy='kernel' with string natural keys (the docstring's own
    recommendation) must work and match the declarative plan — round-1
    forced ids into np.int64 and crashed."""
    left = spark.createDataFrame(
        [("L1", "spark engine"), ("L2", "sparkly engines")], "l_id string, ls string"
    )
    right = spark.createDataFrame(
        [("Ra", "spark engine"), ("Rb", "spark end"), ("Rc", "zzz")],
        "r_id string, rs string",
    )
    kw = dict(left_on="ls", right_on="rs", top_n=2, left_id="l_id", right_id="r_id")
    kernel = similarity_mapping(left, right, strategy="kernel", **kw)
    declarative = similarity_mapping(left, right, strategy="shuffle", **kw)
    assert _collect_mapping(kernel) == _collect_mapping(declarative)
    assert dict(kernel.dtypes)["r_id"] == "string"
