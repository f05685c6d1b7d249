"""Round-14 audio-multiformat scale probe (VERDICT r13 "what's wrong"
#2): `dedup_audio_multiformat` ships the 16-band × 4-bit / d≤15
geometry — BASELINE.md documents it as the small-corpus config, but its
×100 wall had never been measured the way the image/video geometries
were. This probe answers three questions on a high-entropy WAV+FLAC
corpus with planted CROSS-CONTAINER twins (the r12 fixture construction;
twin stride 5 is odd, so every planted twin straddles the WAV/FLAC
parity routing):

1. What does the cross-container HASH wall cost at ×10/×100 — i.e. the
   real-frame FLAC encode+decode plus WAV parse for every doc?
2. Does the 16×4-bit / d≤15 contract geometry stay feasible under the
   hot-bucket cap at ×100, and what does `diagnose_hot_buckets` say
   about what the cap drops (SAFE = band degeneracy, not replicas)?
3. Does the 4×16-bit / d≤3 scale geometry (the r12 posture: band-value
   space ≥ corpus size) recover exactly the planted twins, linearly?

Usage: python tools/bench_round14_audio.py [legs]
  legs: comma-separated subset of {hash,contract,scale,diag} (default
  all), ×100 legs only where /tmp/sfx100_r11docs exists. Timed — run
  SOLO like bench.py.
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
    synth_flac_pcm,
    synth_wav,
    wav_phash,
)
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r11docs"
X100 = "/tmp/sfx100_r11docs"
TWIN_MOD = 17


def attach_random_audioformat(docs):
    """Replica-keyed pseudo-random PCM with planted twins at ~1/17,
    alternating containers by id parity (even = WAV, odd = real-frame
    FLAC — the `attach_audioformat_payload` routing over high-entropy
    samples instead of utf-8 text): twin = (i, i-5), and stride 5 flips
    parity, so EVERY planted twin is a cross-container pair."""

    def op(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                base = i - 5 if (i // 5) % TWIN_MOD == 1 else i
                rng = np.random.default_rng(base % (1 << 63))
                n = 800 + (base % 13) * 137
                data = rng.integers(0, 256, n, dtype=np.uint8)
                if base != i:
                    data = data.copy()
                    data[::97] ^= 1
                raw = data.tobytes()
                if i % 2 == 0:
                    payloads.append(synth_wav(raw, 16000, 1))
                else:
                    payloads.append(synth_flac_pcm(raw) or raw)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(op, "doc_id long, payload binary")


def pair_stats(pr):
    return pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                (F.greatest("l_id", "r_id") - F.least("l_id", "r_id") == 5)
                & (
                    (
                        F.floor(
                            (F.least("l_id", "r_id") + F.lit(5)) / F.lit(5)
                        )
                        % TWIN_MOD
                    )
                    == 1
                )
            ).cast("long")
        ).alias("twins"),
        F.sum(
            ((F.col("l_id") % 2) != (F.col("r_id") % 2)).cast("long")
        ).alias("cross_container"),
    ).collect()[0]


def corpora(legs_all):
    out = [("x10", X10)]
    if os.path.isdir(X100):
        out.append(("x100", X100))
    return out


def main() -> None:
    legs = (sys.argv[1].split(",") if len(sys.argv) > 1 else
            ["hash", "contract", "scale", "diag"])
    spark = get_spark("bench-r14-audio", shuffle_partitions=64)
    bands16 = tuple(f"band{j}" for j in range(16))
    bands4 = tuple(f"band{j}" for j in range(4))
    for label, src in corpora(legs):
        docs = spark.read.parquet(f"{src}/documents.parquet")
        n_docs = docs.count()
        twins_planted = docs.where(
            (F.floor(F.col("doc_id") / F.lit(5)) % TWIN_MOD == 1)
            & (F.col("doc_id") >= 5)
        ).count()
        print(f"== {label}: {n_docs} docs, ~{twins_planted} planted twins",
              flush=True)

        if "hash" in legs or "contract" in legs or "diag" in legs:
            t0 = time.perf_counter()
            ph16 = wav_phash(
                attach_random_audioformat(docs), n_bands=16
            ).localCheckpoint(eager=True)
            n_hashed = ph16.count()
            print(
                f"hash {label} (16 bands): {n_hashed} hashed "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        if "diag" in legs:
            t0 = time.perf_counter()
            diag = dedup.diagnose_hot_buckets(
                ph16, id_col="doc_id", band_cols=bands16,
                max_bucket_size=1000,
            )
            print(
                f"diag {label}: cap_deletes_signal="
                f"{diag['cap_deletes_signal']} "
                f"hot_buckets={diag['n_hot_buckets']} "
                f"max_bucket={diag['max_bucket']} "
                f"same_hash_frac={diag['same_hash_pair_fraction']:.4f} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        if "contract" in legs:
            t0 = time.perf_counter()
            pr = dedup.phash_near_pairs(
                ph16, id_col="doc_id", band_cols=bands16, max_dist=15,
                max_bucket_size=1000, cap_guard=False,
            )
            st = pair_stats(pr)
            print(
                f"contract-geometry {label} (16x4bit d15 cap=1000): "
                f"pairs={st['n']} twins={st['twins']} "
                f"cross={st['cross_container']} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        if "scale" in legs:
            t0 = time.perf_counter()
            ph4 = wav_phash(
                attach_random_audioformat(docs), n_bands=4
            ).localCheckpoint(eager=True)
            t_hash = time.perf_counter() - t0
            t0 = time.perf_counter()
            pr = dedup.phash_near_pairs(
                ph4, id_col="doc_id", band_cols=bands4, max_dist=3,
                max_bucket_size=1000, cap_guard=False,
            )
            st = pair_stats(pr)
            print(
                f"scale-geometry {label} (4x16bit d3 cap=1000): "
                f"pairs={st['n']} twins={st['twins']} "
                f"cross={st['cross_container']} hash_wall={t_hash:.1f}s "
                f"pairs_wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        cache_registry.unpersist_all()





def mp3_twin_leg() -> None:
    """×10/×100 walls for the MP3 twin corpus (`dedup_audio_mp3_crossformat`'s
    shape): every doc → profile MP3 at doc_id + WAV of the decoded PCM at
    doc_id + 10^6, hashed through wav_phash (MP3 routed through the full
    synthesis chain), paired at the 4×16-bit / d≤3 scale geometry.
    Run standalone: python tools/bench_round14_audio.py mp3twin"""
    from polars_sim_spark.operators.multimodal import (
        attach_audio_mp3_twin_payload,
    )

    spark = get_spark("bench-r14-mp3twin", shuffle_partitions=64)
    bands4 = tuple(f"band{j}" for j in range(4))
    for label, src in corpora(None):
        docs = spark.read.parquet(f"{src}/documents.parquet")
        t0 = time.perf_counter()
        ph = wav_phash(
            attach_audio_mp3_twin_payload(docs), n_bands=4
        ).localCheckpoint(eager=True)
        n_hashed = ph.count()
        t_hash = time.perf_counter() - t0
        t0 = time.perf_counter()
        pr = dedup.phash_near_pairs(
            ph, id_col="doc_id", band_cols=bands4, max_dist=3,
            max_bucket_size=1000, cap_guard=False,
        )
        st = pr.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("r_id") - F.col("l_id") == 1_000_000).cast("long")
            ).alias("twins"),
        ).collect()[0]
        n_docs = docs.count()
        print(
            f"mp3twin {label}: docs={n_docs} hashed={n_hashed} "
            f"pairs={st['n']} twin_pairs={st['twins']} "
            f"hash_wall={t_hash:.1f}s pairs_wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "mp3twin":
        mp3_twin_leg()
    else:
        main()
