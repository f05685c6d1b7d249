"""Round-13 scale walls for the new decode paths: FLAC PCM (Rice +
fixed/LPC predictors), 4:2:0 JPEG, restart-interval JPEG, and
progressive JPEG (gray + 4:2:0) — full attach+decode end-to-end over
the decorrelated ×10/×100 documents replicas (same corpora as the
round-12 probes: /tmp/sfx10_r11docs, /tmp/sfx100_r11docs).

Usage: python tools/bench_round13_scale.py [legs]
  legs: comma-separated subset of {flac,jpeg} (default: all).
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


def _docs(spark, path):
    f = os.path.join(path, "documents.parquet")
    return spark.read.parquet(f if os.path.exists(f) else path)


def leg_flac(spark, corpora) -> None:
    from polars_sim_spark.operators.multimodal import (
        attach_flac_pcm_payload,
        flac_pcm_stats,
    )

    for label, path in corpora:
        docs = _docs(spark, path)
        t0 = time.perf_counter()
        n = flac_pcm_stats(attach_flac_pcm_payload(docs)).count()
        print(
            f"flac {label}: decoded={n} wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )


def leg_stereo(spark, corpora) -> None:
    from polars_sim_spark.operators.multimodal import (
        attach_flac_stereo_payload,
        flac_stereo_pcm_stats,
    )

    for label, path in corpora:
        docs = _docs(spark, path)
        t0 = time.perf_counter()
        n = flac_stereo_pcm_stats(attach_flac_stereo_payload(docs)).count()
        print(
            f"flac_stereo {label}: decoded={n} "
            f"wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )


def leg_jpeg(spark, corpora) -> None:
    from polars_sim_spark.operators.multimodal import (
        attach_jpeg420_payload,
        attach_jpeg420_progressive_payload,
        attach_jpeg422_payload,
        attach_jpeg_progressive_payload,
        attach_jpeg_restart_payload,
        jpeg_color_pixel_stats,
        jpeg_pixel_stats,
    )

    legs = [
        ("jpeg420", attach_jpeg420_payload, jpeg_color_pixel_stats),
        ("jpeg422", attach_jpeg422_payload, jpeg_color_pixel_stats),
        ("jpeg_restart", attach_jpeg_restart_payload, jpeg_pixel_stats),
        ("jpeg_prog", attach_jpeg_progressive_payload, jpeg_pixel_stats),
        (
            "jpeg420_prog",
            attach_jpeg420_progressive_payload,
            jpeg_color_pixel_stats,
        ),
    ]
    for label, path in corpora:
        docs = _docs(spark, path)
        for name, attach, stats in legs:
            t0 = time.perf_counter()
            n = stats(attach(docs)).count()
            print(
                f"{name} {label}: decoded={n} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )


def main() -> None:
    legs = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["flac", "stereo", "jpeg"]
    )
    spark = get_spark("r13-scale", shuffle_partitions=128)
    corpora = [("1x", SRC)]
    if os.path.exists(X10):
        corpora.append(("10x", X10))
    if os.path.exists(X100):
        corpora.append(("100x", X100))
    if "flac" in legs:
        leg_flac(spark, corpora)
    if "stereo" in legs:
        leg_stereo(spark, corpora)
    if "jpeg" in legs:
        leg_jpeg(spark, corpora)
    spark.stop()


if __name__ == "__main__":
    main()
