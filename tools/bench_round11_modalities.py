"""Round-11 modality-operator scale probe: 1x/10x slopes for the new
audio/video perceptual-hash dedup ops (wav_phash, mp4_vhash + banded
pair generation), over the decorrelated x10 documents replicas from
tools/make_scale_data.py (the bench_round11_fixture.py dataset).

Both hashers are single-pass Arrow mapInPandas (no shuffle) and the
pair join is the shared banded machinery, so the expected shape is:
hash wall ~linear in rows, pair count driven by hash-space clustering
(see the round-11 degenerate-image analysis in BASELINE.md — audio and
video hashes do NOT have the tiny-image degeneracy, since 65 samples
are always available once n >= 1 frame/sample exists, so their pair
growth should sit far below the image path's quadratic tail).

Results -> BASELINE.md round-11 table.

Usage: python tools/bench_round11_modalities.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark.operators import dedup  # noqa: E402
from polars_sim_spark.operators.multimodal import (  # noqa: E402
    attach_media_payload,
    mp4_vhash,
    wav_phash,
)
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r11docs"


def main() -> None:
    if not os.path.exists(os.path.join(X10, "documents.parquet")):
        subprocess.run(
            [sys.executable, "tools/make_scale_data.py", SRC, X10, "10", "documents"],
            check=True,
        )
    spark = get_spark("r11-modalities", shuffle_partitions=64)
    for label, src in (("1x", SRC), ("10x", X10)):
        docs = spark.read.parquet(f"{src}/documents.parquet")
        media = attach_media_payload(docs)
        for mod, hasher, nb, md in (
            ("audio", wav_phash, 16, 15),
            ("video", mp4_vhash, 8, 7),
        ):
            t0 = time.perf_counter()
            ph = hasher(media, n_bands=nb).localCheckpoint(eager=True)
            n_hashed = ph.count()
            t_hash = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_pairs = dedup.phash_near_pairs(
                ph,
                id_col="doc_id",
                band_cols=tuple(f"band{j}" for j in range(nb)),
                max_dist=md,
            ).count()
            t_pairs = time.perf_counter() - t0
            print(
                f"{label} {mod}: hashed={n_hashed} hash_wall={t_hash:.1f}s "
                f"pairs={n_pairs} pair_wall={t_pairs:.1f}s"
            )
            cache_registry.unpersist_all()
    spark.stop()


if __name__ == "__main__":
    main()
