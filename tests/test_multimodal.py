"""Multimodal plumbing: binary columns through Arrow mapInPandas."""

from __future__ import annotations

import hashlib

from polars_sim_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_meta,
    frame_sample,
)


def test_decode_meta_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 200)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_image_meta(attach_binary_payload(docs)).collect()}
    assert out[1]["n_bytes"] == 11
    assert out[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["width"] == 16 + 11 % 97 and out[1]["height"] == 16 + 11 % 83
    assert out[1]["decoder"] == "stub"
    assert out[2]["n_bytes"] == 200


def test_frame_sample_fanout(spark):
    docs = spark.createDataFrame([(1, "x" * 150)], "doc_id long, text string")
    frames = frame_sample(attach_binary_payload(docs), every_n_bytes=64).collect()
    assert len(frames) == 3  # 150 bytes → offsets 0, 64, 128
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    total = b"".join(bytes(r["frame"]) for r in sorted(frames, key=lambda r: r["frame_idx"]))
    assert total == b"x" * 150


def test_schema_is_stable(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    df = decode_image_meta(attach_binary_payload(docs))
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "content_md5", "width", "height", "decoder",
    ]
