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


def test_resize_shapes(spark, sf_small):
    from polars_sim_spark.operators.multimodal import attach_binary_payload, resize_image

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    out = resize_image(attach_binary_payload(docs), target_w=8, target_h=8).collect()
    assert len(out) == 20
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["resized"]) in (0, 64)  # empty payload stays empty


def test_extract_features_histogram(spark, sf_small):
    from polars_sim_spark.operators.multimodal import attach_binary_payload, extract_features

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    out = extract_features(attach_binary_payload(docs), bins=16).collect()
    for r in out:
        f = r["features"]
        assert len(f) == 16
        s = sum(f)
        assert s == 0.0 or abs(s - 1.0) < 1e-9  # L1-normalized


def test_features_feed_ann(spark, sf_small):
    """Byte-histogram features flow into the ANN operator unchanged —
    the media near-dup pipeline end-to-end."""
    from pyspark.sql import functions as F

    from polars_sim_spark.operators.multimodal import attach_binary_payload, extract_features
    from polars_sim_spark.operators.similarity import ann_topk_bruteforce

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    feats = extract_features(attach_binary_payload(docs))
    qs = feats.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_id"), F.col("features").alias("q_emb")
    )
    out = ann_topk_bruteforce(
        feats, qs, id_col="doc_id", vec_col="features", k=3
    )
    assert out.count() > 0


def test_real_header_decode_png_gif_bmp_pnm(spark):
    """decode_image_meta reads REAL dimensions from PNG/GIF/BMP/PPM
    headers by pure byte parsing (no codec library) and still falls
    back to the deterministic stub for unrecognized payloads."""
    import struct

    from polars_sim_spark.operators.multimodal import decode_image_meta

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 8
    ppm = b"P6\n# a comment\n1024 768\n255\n" + b"\x00" * 12
    junk = b"not an image at all"
    rows = [(1, png), (2, gif), (3, bmp), (4, ppm), (5, junk)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["decoder"])
        for r in decode_image_meta(df).collect()
    }
    assert got[1] == (640, 480, "png")
    assert got[2] == (320, 200, "gif")
    assert got[3] == (800, 600, "bmp")  # top-down BMP: magnitude
    assert got[4] == (1024, 768, "pnm")
    assert got[5][2] == "stub"


def test_real_header_decode_jpeg(spark):
    """JPEG dims via SOF marker scan: baseline (SOF0) and progressive
    (SOF2), with intervening APP0/DQT/DHT segments and RST/fill bytes —
    the byte layouts a real camera/exporter JPEG actually has. A JPEG
    whose scan starts before any SOF falls back to the stub."""
    import struct

    from polars_sim_spark.operators.multimodal import decode_image_meta

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    dht = seg(0xC4, b"\x00" + bytes(16) + b"\x01")  # DHT is 0xC4 — must be skipped, not read as SOF
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + bytes(9))
    sof2 = seg(0xC2, b"\x08" + struct.pack(">HH", 1080, 1920) + b"\x03" + bytes(9))
    baseline = b"\xff\xd8" + app0 + dqt + dht + sof0 + b"\xff\xda" + b"\x00" * 8
    progressive = b"\xff\xd8" + b"\xff\xff" + app0 + sof2 + b"\x00" * 4
    no_sof = b"\xff\xd8" + app0 + b"\xff\xda" + b"\x00" * 8  # SOS before any SOF
    rows = [(1, baseline), (2, progressive), (3, no_sof)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["decoder"])
        for r in decode_image_meta(df).collect()
    }
    assert got[1] == (640, 480, "jpeg")
    assert got[2] == (1920, 1080, "jpeg")
    assert got[3][2] == "stub"
