"""Round-12 scale probes (VERDICT r11 #3/#4): ×10/×100 rows for the
round-11 operators that had none, pair slopes for audio/video on
HIGH-ENTROPY fixtures, and the hot-bucket diagnosis probe's cost.

Four questions, each answered with a measured row for BASELINE.md:

1. `cluster_safe_split` at corpus scale — shingle Jaccard pairs + CC +
   hash bucketing over the decorrelated ×10/×100 documents replicas
   (the bench_round11_fixture.py corpora at /tmp/sfx10_r11docs and
   /tmp/sfx100_r11docs).
2. `dedup_images_multiformat` (mixed PPM/BMP/GIF containers) at
   ×10/×100 with the hot-bucket cap — the cross-container decode path
   had only an sf0.01 correctness row.
3. Audio/video pair slopes on DECORRELATED payloads: the round-11
   superlinear slopes (37×/961× per step) were diagnosed as a
   fixture-entropy artifact (ASCII-text-derived PCM clusters the
   envelope hash). Here payloads are replica-keyed pseudo-random bytes
   with planted twins at rate 1/17 (twin = same seed, every 97th byte
   perturbed — the same construction as the frame-match test), so a
   correct operator should find ~n/17 pairs: the slope must be
   ~linear, proving the r11 growth was the corpus, not the operator.
4. `video_frame_match_pairs` (frame-aligned) at scale with the round-12
   `max_bucket_size` plumbed, plus `diagnose_hot_buckets`' wall on the
   real image corpus (the probe must be cheap enough to run by default
   in pipelines that enable the cap guard).

Usage: python tools/bench_round12_scale.py [legs]
  legs: comma-separated subset of {split,images,audio,video,diag}
        (default: all). ×100 legs run only where the corpus exists.
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
from polars_sim_spark.operators.curation import cluster_safe_split  # noqa: E402
from polars_sim_spark.operators.multimodal import (  # noqa: E402
    attach_multiformat_payload,
    mp4_frame_phash,
    mp4_vhash,
    ppm_phash,
    synth_mp4,
    synth_wav,
    wav_phash,
)
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r11docs"
X100 = "/tmp/sfx100_r11docs"
OFF = 100_000_000
TWIN_MOD = 17


def attach_random_media(docs, modality: str):
    """Replica-keyed pseudo-random payloads with planted twins: doc
    base = doc_id - 5 when (doc_id//5) % 17 == 1 (else itself); bytes are a
    per-base PCG stream, twins get every 97th byte's low bit flipped —
    high-entropy content whose ONLY near-dup structure is the planted
    twin rate of ~1/17, so pair counts have a known linear target."""

    def op(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                # twin stride 5 keeps both twin members inside the
                # 1-in-5 fixture slices the audio/video legs use
                base = i - 5 if (i // 5) % TWIN_MOD == 1 else i
                rng = np.random.default_rng(base % (1 << 63))
                n = 800 + (base % 13) * 137
                data = rng.integers(0, 256, n, dtype=np.uint8)
                if base != i:
                    data = data.copy()
                    data[::97] ^= 1
                raw = data.tobytes()
                if modality == "audio":
                    payloads.append(synth_wav(raw, 16000, 1))
                else:
                    payloads.append(synth_mp4(raw, 320, 240, len(raw) * 40))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(op, "doc_id long, payload binary")


def pair_stats(pr):
    return pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("l_id") % OFF) == (F.col("r_id") % OFF)).cast("long")).alias(
            "same_base"
        ),
        F.sum(
            (
                F.greatest("l_id", "r_id") - F.least("l_id", "r_id") == 5
            ).cast("long")
        ).alias("twins"),
    ).collect()[0]


def leg_split(spark, corpora):
    for label, src in corpora:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        t0 = time.perf_counter()
        postings = dedup.shingle_postings(docs, "doc_id", "text").localCheckpoint(
            eager=True
        )
        t_post = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = dedup.jaccard_pairs(postings, min_jaccard=0.5).select("l_id", "r_id")
        out = cluster_safe_split(docs, "doc_id", pairs, salt="r12")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cluster_id").alias("clusters"),
            F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
        ).collect()[0]
        print(
            f"split {label}: docs={agg['n']} clusters={agg['clusters']} "
            f"test={agg['n_test']} postings_wall={t_post:.1f}s "
            f"split_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


def leg_images(spark, corpora):
    bands = tuple(f"band{j}" for j in range(8))
    for label, src in corpora:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        t0 = time.perf_counter()
        ph = ppm_phash(attach_multiformat_payload(docs), n_bands=8).localCheckpoint(
            eager=True
        )
        n = ph.count()
        t_hash = time.perf_counter() - t0
        t0 = time.perf_counter()
        agg = pair_stats(
            dedup.phash_near_pairs(
                ph, id_col="doc_id", band_cols=bands, max_dist=7, max_bucket_size=1000
            )
        )
        print(
            f"images(multiformat) {label}: hashed={n} hash_wall={t_hash:.1f}s "
            f"cap=1000 pairs={agg['n']} same_base={agg['same_base']} "
            f"pair_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


def leg_audio(spark, corpora):
    # Two configs: the r11 apples-to-apples one (16×4-bit bands, d≤15 —
    # 4-bit band values make buckets n/16 BY CONSTRUCTION, so this is
    # not a scale configuration and runs only to ×10, uncapped like the
    # r11 probe), and the scale configuration (4×16-bit bands, d≤3 —
    # the image-path geometry) through ×100.
    for nb, md, max_label in ((16, 15, "10x"), (4, 3, "100x")):
        bands = tuple(f"band{j}" for j in range(nb))
        for label, src in corpora:
            # the r11 rows hashed the 1-in-5 WAV fixture slice (1k/10k
            # rows) — keep the same population for comparable slopes
            docs = spark.read.parquet(f"{src}/documents.parquet").where(
                F.col("doc_id") % 5 == 0
            )
            t0 = time.perf_counter()
            ph = wav_phash(
                attach_random_media(docs, "audio"), n_bands=nb
            ).localCheckpoint(eager=True)
            n = ph.count()
            t_hash = time.perf_counter() - t0
            t0 = time.perf_counter()
            agg = pair_stats(
                dedup.phash_near_pairs(
                    ph, id_col="doc_id", band_cols=bands, max_dist=md
                )
            )
            print(
                f"audio(high-entropy,{nb}b,d{md}) {label}: hashed={n} "
                f"hash_wall={t_hash:.1f}s pairs={agg['n']} "
                f"twins={agg['twins'] or 0} target~{n // TWIN_MOD} "
                f"pair_wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )
            cache_registry.unpersist_all()
            if label == max_label:
                break


def leg_video(spark, corpora):
    fold_bands = tuple(f"band{j}" for j in range(8))
    for label, src in corpora:
        # match the r11 rows' 1-in-5 MP4 fixture slice
        docs = spark.read.parquet(f"{src}/documents.parquet").where(
            F.col("doc_id") % 5 == 1
        )
        media = attach_random_media(docs, "video").localCheckpoint(eager=True)
        # fold path
        t0 = time.perf_counter()
        phf = mp4_vhash(media, every_n=2, n_bands=8).localCheckpoint(eager=True)
        nf = phf.count()
        t_hash = time.perf_counter() - t0
        t0 = time.perf_counter()
        agg = pair_stats(
            dedup.phash_near_pairs(
                phf, id_col="doc_id", band_cols=fold_bands, max_dist=7
            )
        )
        print(
            f"video-fold(high-entropy) {label}: hashed={nf} "
            f"hash_wall={t_hash:.1f}s pairs={agg['n']} twins={agg['twins'] or 0} "
            f"target~{nf // TWIN_MOD} pair_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        # frame-aligned path with the round-12 cap plumbed
        t0 = time.perf_counter()
        phr = mp4_frame_phash(media, every_n=2, n_bands=8).localCheckpoint(eager=True)
        n_frames = phr.count()
        t_hash = time.perf_counter() - t0
        t0 = time.perf_counter()
        pr = dedup.video_frame_match_pairs(
            phr,
            id_col="doc_id",
            band_cols=fold_bands,
            max_dist=7,
            min_frames=3,
            max_bucket_size=1000,
        )
        agg = pr.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.greatest("l_id", "r_id") - F.least("l_id", "r_id") == 5
                ).cast("long")
            ).alias("twins"),
        ).collect()[0]
        print(
            f"video-frames(high-entropy) {label}: frame_hashes={n_frames} "
            f"hash_wall={t_hash:.1f}s cap=1000 pairs={agg['n']} "
            f"twins={agg['twins']} pair_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


def leg_jpeg(spark, corpora):
    # decode-wall scale posture for the round-12 lossy path: gray and
    # color JPEG pixel stats over the decorrelated corpora — pure-python
    # Huffman entropy decode + fixed-point IDCT per block, one Arrow pass
    from polars_sim_spark.operators.multimodal import (
        attach_jpeg_color_payload,
        attach_jpeg_payload,
        jpeg_color_pixel_stats,
        jpeg_pixel_stats,
    )

    for label, src in corpora:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        t0 = time.perf_counter()
        n = jpeg_pixel_stats(attach_jpeg_payload(docs)).count()
        t_gray = time.perf_counter() - t0
        t0 = time.perf_counter()
        nc = jpeg_color_pixel_stats(attach_jpeg_color_payload(docs)).count()
        print(
            f"jpeg {label}: gray_decoded={n} gray_wall={t_gray:.1f}s "
            f"color_decoded={nc} color_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


def leg_diag(spark, corpora):
    bands = tuple(f"band{j}" for j in range(8))
    for label, src in corpora:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        ph = ppm_phash(attach_multiformat_payload(docs), n_bands=8).localCheckpoint(
            eager=True
        )
        ph.count()
        t0 = time.perf_counter()
        d = dedup.diagnose_hot_buckets(
            ph, id_col="doc_id", band_cols=bands, max_bucket_size=1000
        )
        print(
            f"diagnose_hot_buckets {label}: wall={time.perf_counter() - t0:.1f}s "
            f"hot={d['n_hot_buckets']} max={d['max_bucket']} "
            f"same_frac={d['same_hash_pair_fraction']:.3f} "
            f"deletes_signal={d['cap_deletes_signal']}",
            flush=True,
        )
        cache_registry.unpersist_all()


def main() -> None:
    legs = (sys.argv[1].split(",") if len(sys.argv) > 1 else
            ["split", "images", "audio", "video", "diag"])
    spark = get_spark("r12-scale", shuffle_partitions=128)
    c10 = [("1x", SRC)] + ([("10x", X10)] if os.path.exists(X10) else [])
    c100 = c10 + ([("100x", X100)] if os.path.exists(X100) else [])
    if "split" in legs:
        leg_split(spark, c100)
    if "images" in legs:
        leg_images(spark, c100)
    if "audio" in legs:
        leg_audio(spark, c100)
    if "video" in legs:
        leg_video(spark, c10)
    if "video100" in legs:
        leg_video(spark, [("100x", X100)] if os.path.exists(X100) else [])
    if "jpeg" in legs:
        leg_jpeg(spark, c100)
    if "diag" in legs:
        leg_diag(spark, c100)
    spark.stop()


if __name__ == "__main__":
    main()
