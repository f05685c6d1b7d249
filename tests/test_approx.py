"""Scale-path approximations: the exact operators in the contract have
documented approximate swaps for the 100 TB regime (SCALE.md). These
tests pin that the swaps stay within tolerance of the exact answers on
real testdata, so 'swap at scale' is a measured claim, not a hope."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_sim_spark.sources.tables import load_table


def test_approx_count_distinct_within_5pct(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_approx_percentile_close_to_exact(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    row = docs.agg(
        F.percentile("n_chars", F.lit(0.5)).alias("exact"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    # percentile_approx returns an actual data value; exact interpolates.
    # On a few hundred rows they must land within a tight relative band.
    assert abs(row["approx"] - row["exact"]) <= 0.02 * row["exact"]
