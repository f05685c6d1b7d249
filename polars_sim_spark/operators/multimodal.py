"""Multimodal (image/audio/video) column handling.

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside. Decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` operators — the only place
this engine leaves the JVM, because media codecs are Python-library
territory. The Spark-side plumbing (schemas, batch iteration,
partitioning) is real and tested; the codec call itself is stubbed
behind an import-guard (`PIL`/`librosa` are not in this container) with
a deterministic fallback, clearly marked.

Scale notes: mapInPandas streams Arrow batches — no per-row pickling,
memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
Payload bytes never shuffle unless the user repartitions; metadata-only
projections (the common filter path) prune the binary column at the
parquet scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, width int, height int, decoder string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column from a text column
    (testdata has no real media; utf-8 bytes stand in for an encoded blob)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _try_real_decode(data: bytes):
    """REAL header decode for the formats whose dimensions live in the
    header — JPEG (SOF marker scan), PNG, GIF, BMP, binary PPM/PGM — as
    pure byte parsing, no codec library: at 100 TB "decode" for metadata
    extraction means exactly this (reading dimensions never requires
    decompressing pixels). Anything else falls through to the PIL
    integration point (absent in this container → NotImplementedError,
    and the pipeline's deterministic fallback). Returns
    (width, height, decoder_name).
    """
    import struct

    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", data, 16)
        return int(w), int(h), "png"
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return int(w), int(h), "gif"
    if len(data) >= 26 and data[:2] == b"BM":
        w, h = struct.unpack_from("<ii", data, 18)
        # negative height = top-down row order; dims are magnitudes
        return abs(int(w)), abs(int(h)), "bmp"
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        # JPEG: dims live in the first Start-Of-Frame segment (SOF0
        # baseline … SOF15, excluding DHT/JPG/DAC which share the 0xCx
        # range). Walk the marker stream — each non-SOF segment carries a
        # big-endian length — until a SOF marker; its payload is
        # precision(1) height(2) width(2). Pure byte scan, no
        # entropy-decode: progressive (SOF2) and baseline (SOF0) alike.
        i, n = 2, len(data)
        while i + 3 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            if marker == 0xD9 or marker == 0xDA:
                break  # EOI / start-of-scan: no SOF found before pixels
            seg_len = struct.unpack_from(">H", data, i + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack_from(">HH", data, i + 5)
                    return int(w), int(h), "jpeg"
                break
            i += 2 + seg_len
        raise NotImplementedError("JPEG without a parseable SOF header")
    if len(data) > 2 and data[:2] in (b"P5", b"P6"):
        # netpbm: magic, then (whitespace/comment-separated) width height
        vals, i, n = [], 2, len(data)
        while i < n and len(vals) < 2:
            c = data[i]
            if c in b" \t\r\n":
                i += 1
            elif c == ord("#"):
                while i < n and data[i] not in b"\r\n":
                    i += 1
            elif chr(c).isdigit():
                j = i
                while j < n and chr(data[j]).isdigit():
                    j += 1
                vals.append(int(data[i:j]))
                i = j
            else:
                break
        if len(vals) == 2:
            return vals[0], vals[1], "pnm"
        raise NotImplementedError("malformed netpbm header")
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError("image codec not installed in this environment") from exc
    raise NotImplementedError("real decode path is a stub until a codec ships")


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in dimensions derived from payload size (so the
    full pipeline, including the oracle, is reproducible)."""
    return 16 + n_bytes % 97, 16 + n_bytes % 83


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-payload decode metadata via Arrow-batched mapInPandas.

    Output: (id, n_bytes, content_md5, width, height, decoder). With no
    codec installed, width/height come from the deterministic fake and
    ``decoder`` is 'stub'.
    """
    id_name = id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims_w, dims_h, decoders = [], [], []
            for b in payloads:
                try:
                    w, h, dec = _try_real_decode(bytes(b))
                except NotImplementedError:
                    w, h = _fake_dims(len(b))
                    dec = "stub"
                dims_w.append(w)
                dims_h.append(h)
                decoders.append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "n_bytes": n_bytes,
                    "content_md5": md5s,
                    "width": pd.array(dims_w, dtype="int32"),
                    "height": pd.array(dims_h, dtype="int32"),
                    "decoder": decoders,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(op, DECODE_META_SCHEMA)


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    target_w: int = 64,
    target_h: int = 64,
) -> DataFrame:
    """Stand-in for image resizing: binary in → binary out through
    mapInPandas (the real thing once a codec ships; the stub truncates /
    cycles payload bytes to exactly target_w*target_h bytes so output
    sizes are shape-correct and deterministic)."""
    n_out = target_w * target_h

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                data = bytes(b)
                try:
                    _try_real_decode(data)
                except NotImplementedError:
                    reps = (n_out // max(len(data), 1)) + 1 if data else 0
                    out.append((data * reps)[:n_out] if data else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": pd.array([target_w] * len(out), dtype="int32"),
                    "height": pd.array([target_h] * len(out), dtype="int32"),
                    "resized": out,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, "doc_id long, width int, height int, resized binary"
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    bins: int = 16,
) -> DataFrame:
    """REAL feature extraction (no stub): L1-normalized byte histogram of
    the payload as ``array<float>`` — the classic content-signature
    feature for binary blobs. Output plugs straight into the ANN
    operators (operators/similarity.py) for media near-dup search."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                data = np.frombuffer(bytes(b), dtype=np.uint8)
                if data.size == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(data >> (8 - bins.bit_length() + 1), minlength=bins)[:bins]
                feats.append((hist / data.size).astype(float).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, "doc_id long, features array<double>"
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    every_n_bytes: int = 64,
) -> DataFrame:
    """Stand-in for video frame sampling: emit one row per sampled offset
    of the payload (1→N row fan-out through mapInPandas, the exact batch
    shape a real frame sampler produces: id, frame_idx, frame_bytes)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                data = bytes(row[payload_col])
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(data[off : off + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, "doc_id long, frame_idx int, frame binary"
    )
