"""Round-14 decoded-pixel video scale probe: `dedup_video_pixel_crossformat`
ships the twin-corpus construction (MJPEG AVI at doc_id, raw-gray MP4 of
the decode's output at doc_id + 10^6) under the frame-aligned Hamming-0
match. This probe measures the two real costs at ×10/×100 on a
HIGH-ENTROPY corpus (pseudo-random frame bytes keyed by doc_id — the r12
fixture-entropy lesson: utf-8 text under-counts the hash space):

1. the HASH wall — one JPEG encode per frame on the fixture side, then
   the AVI walk + per-frame baseline JPEG decode and the BMFF walk +
   raw reshape on the operator side;
2. the PAIR wall — the (frame, band, value)-bucketed candidate join +
   exact verify at max_dist=0, and whether recall is exactly the twin
   count (every doc must pair with its own +10^6 twin on EVERY frame;
   the high-entropy 64-bit frame hashes make organic collisions
   negligible, so pairs ≈ docs is the expected LINEAR shape).

Usage: python tools/bench_round14_video.py [x10|x100|x10,x100]
Timed — run SOLO like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark.operators import dedup  # noqa: E402
from polars_sim_spark.operators.multimodal import (  # noqa: E402
    FRAME_DUR_MS,
    _jpeg_gray_pixels,
    synth_avi_mjpeg,
    synth_jpeg,
    synth_mp4,
    video_frame_pixel_phash,
)
from polars_sim_spark.session import get_spark  # noqa: E402

X10 = "/tmp/sfx10_r11docs"
X100 = "/tmp/sfx100_r11docs"
TWIN_OFFSET = 1_000_000_000  # above the ×100 id space


def attach_random_video_twins(docs):
    """High-entropy analogue of `attach_video_pixel_twin_payload`:
    1–6 frames of pseudo-random bytes per doc (keyed by doc_id), JPEG
    frames into an MJPEG AVI at doc_id and the decoded raw output into
    an MP4 at doc_id + TWIN_OFFSET."""

    def op(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                rng = np.random.default_rng(i % (1 << 63))
                nb = 1 + i % 6
                data = rng.integers(0, 256, nb * 64, dtype=np.uint8).tobytes()
                jpegs = [
                    synth_jpeg(data[k * 64 : (k + 1) * 64]) for k in range(nb)
                ]
                decoded = b"".join(
                    _jpeg_gray_pixels(j).tobytes() for j in jpegs
                )
                ids.append(i)
                payloads.append(synth_avi_mjpeg(jpegs, 8, 8))
                ids.append(i + TWIN_OFFSET)
                payloads.append(
                    synth_mp4(
                        decoded, 8, 8, nb * FRAME_DUR_MS,
                        frame_sizes=[64] * nb, codec=b"raw ",
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(op, "doc_id long, payload binary")


def main() -> None:
    want = (sys.argv[1].split(",") if len(sys.argv) > 1 else ["x10", "x100"])
    spark = get_spark("bench-r14-video", shuffle_partitions=64)
    bands4 = tuple(f"band{j}" for j in range(4))
    for label, src in (("x10", X10), ("x100", X100)):
        if label not in want or not os.path.isdir(src):
            continue
        docs = spark.read.parquet(f"{src}/documents.parquet")
        n_docs = docs.count()
        print(f"== {label}: {n_docs} docs (2 containers each)", flush=True)

        t0 = time.perf_counter()
        ph = video_frame_pixel_phash(
            attach_random_video_twins(docs), n_bands=4
        ).localCheckpoint(eager=True)
        n_frames = ph.count()
        print(
            f"hash {label}: {n_frames} frame hashes "
            f"wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )

        t0 = time.perf_counter()
        pr = dedup.video_frame_match_pairs(
            ph, id_col="doc_id", band_cols=bands4, max_dist=0, min_frames=1,
            max_bucket_size=1000,
        )
        st = pr.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.greatest("l_id", "r_id") - F.least("l_id", "r_id")
                    == TWIN_OFFSET
                ).cast("long")
            ).alias("twins"),
            F.sum("n_frames_matched").alias("frames_matched"),
        ).collect()[0]
        print(
            f"pairs {label} (frame-aligned d0 cap=1000): pairs={st['n']} "
            f"twins={st['twins']} frames_matched={st['frames_matched']} "
            f"wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


if __name__ == "__main__":
    main()
