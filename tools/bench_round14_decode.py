"""Round-14 decode walls at 1×/10×/×100 for the paths added this round
— palette PNG, Adam7 PNG, 16-bit PNG, CMYK JPEG, MP3 Layer III PCM,
plus the widened 8-bit WAV and 24-bit FLAC — full attach+decode
end-to-end (one Arrow pass, zero shuffles), same decorrelated corpora
and method as the r12/r13 probes.

Usage: python tools/bench_round14_decode.py [legs]
  legs: comma-separated subset of
  {palette,adam7,png16,cmyk,mp3,wav8,flac24,tiff} (default: all).
Timed — run SOLO like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r11docs"
X100 = "/tmp/sfx100_r11docs"

LEGS = {}


def leg(name):
    def deco(fn):
        LEGS[name] = fn
        return fn

    return deco


@leg("palette")
def _palette(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_png_palette_payload,
        png_palette_stats,
    )

    return png_palette_stats(attach_png_palette_payload(docs))


@leg("adam7")
def _adam7(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_png_adam7_payload,
        png_pixel_stats,
    )

    return png_pixel_stats(attach_png_adam7_payload(docs))


@leg("png16")
def _png16(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_png16_payload,
        png16_stats,
    )

    return png16_stats(attach_png16_payload(docs))


@leg("cmyk")
def _cmyk(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_jpeg_cmyk_payload,
        jpeg_cmyk_pixel_stats,
    )

    return jpeg_cmyk_pixel_stats(attach_jpeg_cmyk_payload(docs))


@leg("mp3")
def _mp3(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_mp3_pcm_payload,
        mp3_pcm_stats,
    )

    return mp3_pcm_stats(attach_mp3_pcm_payload(docs))


@leg("tiff")
def _tiff(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_tiff_payload,
        tiff_pixel_stats,
    )

    return tiff_pixel_stats(attach_tiff_payload(docs))


@leg("wav8")
def _wav8(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_wav8_payload,
        wav_pcm_stats,
    )

    return wav_pcm_stats(attach_wav8_payload(docs))


@leg("flac24")
def _flac24(docs):
    from polars_sim_spark.operators.multimodal import (
        attach_flac24_payload,
        flac_pcm_stats,
    )

    return flac_pcm_stats(attach_flac24_payload(docs))


def main() -> None:
    legs = sys.argv[1].split(",") if len(sys.argv) > 1 else list(LEGS)
    spark = get_spark("bench-r14-decode", shuffle_partitions=64)
    corpora = [("1x", SRC)]
    for label, path in (("10x", X10), ("100x", X100)):
        if os.path.isdir(path):
            corpora.append((label, path))
    for name in legs:
        fn = LEGS[name]
        for label, path in corpora:
            f = os.path.join(path, "documents.parquet")
            docs = spark.read.parquet(f if os.path.exists(f) else path)
            t0 = time.perf_counter()
            n = fn(docs).count()
            print(
                f"{name} {label}: decoded={n} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
