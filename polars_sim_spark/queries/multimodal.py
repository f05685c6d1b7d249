"""Multimodal contract queries: binary-column decode metadata and frame statistics over the mapInPandas plumbing.

Split out of the former monolithic queries.py (round 5); the
registration registry and driver-order governance live in
``polars_sim_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from polars_sim_spark import cache as cache_registry
from polars_sim_spark.functions import text as text_fns
from polars_sim_spark.functions.text import trigram_tokens
from polars_sim_spark.sources.tables import load_table
from polars_sim_spark.queries._registry import register


@register(
    "multimodal_decode_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(16 + octet_length(encode(text)) % 97 AS INT) AS width,
       CAST(16 + octet_length(encode(text)) % 83 AS INT) AS height,
       'stub' AS decoder
FROM documents
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode metadata through the Arrow mapInPandas path.
    The codec is stubbed (deterministic dims from payload size) but the
    distributed plumbing — binary column, batch iteration, typed output
    schema — is the real thing, and the oracle checks it end-to-end."""
    from polars_sim_spark.operators.multimodal import attach_binary_payload, decode_image_meta

    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(attach_binary_payload(docs))


@register(
    "multimodal_frame_stats",
    """
SELECT doc_id,
       CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
FROM documents
WHERE octet_length(encode(text)) > 0
""",
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through mapInPandas (1→N fan-out),
    validated by aggregate: frame count and reassembled byte total per
    document must match the payload exactly."""
    from polars_sim_spark.operators.multimodal import attach_binary_payload, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_binary_payload(docs), every_n_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("total_bytes"),
    )

