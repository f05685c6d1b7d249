"""Structured Streaming operators.

The reference is fully batch (SURVEY.md §2.4: no streaming surface);
these extend the engine to the streaming half of a training-data
pipeline: watermarked windowed aggregation over an event stream, and a
stream-static similarity enrichment that reuses the batch join_sim
token postings as the static side.

All operators take/return streaming DataFrames — sources and sinks are
the caller's choice (tests use file sources with availableNow + memory
sinks; production would use Kafka/Delta). State stores bound memory via
watermarks; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_sim_spark.functions.text import trigram_tokens


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts+sums per key — the streaming
    twin of the batch ``events_hourly`` query (same grouping semantics;
    late rows beyond the watermark are dropped instead of restated)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_static_token_enrich(
    stream: DataFrame,
    static_right: DataFrame,
    *,
    stream_text_col: str,
    right_text_col: str,
    right_id_col: str,
    min_overlap: int = 1,
) -> DataFrame:
    """Stream-static similarity enrichment: each streaming row joins (by
    trigram token) against the static corpus, keeping candidates with
    ≥ ``min_overlap`` shared trigrams and their overlap count.

    This is the streaming face of join_sim's decomposition: the static
    side's token postings behave like a broadcast index (Spark plans a
    stream-static join per micro-batch; no state store needed for the
    join itself). The full top-n requires per-key ranking, which
    Structured Streaming only allows post-aggregation — downstream
    consumers typically keep the max-overlap candidate via
    ``F.max_by`` as shown in tests.
    """
    s_tok = stream.select(
        "*", F.explode(trigram_tokens(F.col(stream_text_col))).alias("__token")
    )
    r_tok = static_right.select(
        F.col(right_id_col).alias("__rid"),
        F.explode(trigram_tokens(F.col(right_text_col))).alias("__token"),
    )
    joined = s_tok.join(r_tok, "__token")
    group_cols = [c for c in stream.columns]
    return (
        joined.groupBy(*group_cols, "__rid")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .where(F.col("overlap") >= min_overlap)
        .withColumnRenamed("__rid", right_id_col)
    )
