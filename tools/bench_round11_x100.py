"""Round-11 x100 re-read on the REPAIRED fixture: phash pair economics
and the star-contraction A/B at 500k images with the hot-bucket cap.

Round 10 measured the x100 image graph on the correlated fixture
(24.7M edges; contraction 66x fewer CC inputs, CC 8.8x faster). The
round-11 fixture fix removed replica-copy correlation but left the
degenerate-hash birthday tail (BASELINE.md round-11 analysis), so the
x100 questions become:

1. does `max_bucket_size=1000` stay near-free on true-dup recall when
   buckets are 10x hotter than at x10 (where it kept 99.5%)?
2. does band-local star contraction pay at x100 on THIS fixture (it
   was parity at x10 — machinery not amortized — and 8.8x on the old
   correlated fixture)?

Usage: python tools/bench_round11_x100.py   (expects /tmp/sfx100_r11docs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark.operators import dedup  # noqa: E402
from polars_sim_spark.operators.multimodal import (  # noqa: E402
    attach_image_payload,
    ppm_phash,
)
from polars_sim_spark.session import get_spark  # noqa: E402

X100 = "/tmp/sfx100_r11docs"
OFF = 100_000_000
BANDS = tuple(f"band{j}" for j in range(8))


def main() -> None:
    spark = get_spark("r11-x100", shuffle_partitions=128)
    docs = spark.read.parquet(f"{X100}/documents.parquet")
    t0 = time.perf_counter()
    ph = ppm_phash(attach_image_payload(docs), n_bands=8).localCheckpoint(eager=True)
    n_img = ph.count()
    print(f"x100 hashed={n_img} hash_wall={time.perf_counter() - t0:.1f}s")

    # Uncapped leg REMOVED after measurement: on this fixture the
    # degenerate-hash mass concentrates in a few mega-buckets whose
    # quadratic self-join did not complete within 50 minutes at x100
    # (the correlated round-10 fixture spread collisions across many
    # mid-size buckets and finished in 10-19 min). At this scale the
    # hot-bucket cap is FEASIBILITY, not tuning.
    for cap in (1000,):
        t0 = time.perf_counter()
        pr = dedup.phash_near_pairs(
            ph, id_col="doc_id", band_cols=BANDS, max_dist=7, max_bucket_size=cap
        )
        agg = pr.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                ((F.col("l_id") % OFF) == (F.col("r_id") % OFF)).cast("long")
            ).alias("same_base"),
        ).collect()[0]
        print(
            f"x100 cap={cap}: pairs={agg['n']} same_base={agg['same_base']} "
            f"wall={time.perf_counter() - t0:.1f}s"
        )
        cache_registry.unpersist_all()

    # contraction A/B on the capped edge set (the realistic x100 config)
    pairs = dedup.phash_near_pairs(
        ph, id_col="doc_id", band_cols=BANDS, max_dist=7, max_bucket_size=1000
    ).localCheckpoint(eager=True)
    contracted = dedup.phash_contracted_pairs(
        ph, id_col="doc_id", band_cols=BANDS, max_dist=7, max_bucket_size=1000
    )
    n_raw = pairs.count()
    n_con = contracted.localCheckpoint(eager=True).count()
    print(f"x100 CC input edges: raw={n_raw} contracted={n_con}")
    nodes = ph.select(F.col("doc_id").alias("id"))

    def cc_sum(edges):
        t0 = time.perf_counter()
        cc = dedup.connected_components(nodes, edges, id_col="id")
        row = cc.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("id", "cluster_id").cast("long")).alias("h"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        cache_registry.unpersist_all()
        return (row["n"], row["h"]), dt

    sig_raw, t_raw = cc_sum(pairs.select("l_id", "r_id"))
    sig_con, t_con = cc_sum(contracted.select("l_id", "r_id"))
    print(
        f"x100 CC wall: raw={t_raw:.1f}s contracted={t_con:.1f}s "
        f"identical={sig_raw == sig_con}"
    )
    assert sig_raw == sig_con
    spark.stop()


if __name__ == "__main__":
    main()
