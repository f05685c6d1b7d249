"""Round-11 fixture-decorrelation probe (VERDICT r10 #6 follow-through).

Round 10's scale fixture kept image replicas Hamming-close (the
per-word text suffix barely moves the 72 phash-sampled pixel bytes), so
image near-dup pair counts grew ~quadratically across replicas
(92x/step) and the star-contraction A/B had to be read "both sides see
the same fixture". make_scale_data now applies a replica-keyed alphabet
permutation + byte-offset prefix that scrambles cross-replica sampled
gradients while preserving within-replica structure exactly.

This probe validates the fix and re-reads the A/B on the repaired
fixture:

1. phash pair count at 1x (sf0.1) vs x10 (fresh replicas) — DONE means
   the x10 count is ~10x the 1x count (near-dup RATE constant), not
   ~90x;
2. star-contraction A/B at x10 on the fixed fixture: raw vs contracted
   CC input edges, CC wall-clock, components identical.

Results -> BASELINE.md (fixture caveat paragraph gets the re-read).

Usage: python tools/bench_round11_fixture.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
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

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r11docs"  # documents x10, round-11 decorrelated fixture


def _pairs(docs):
    ph = ppm_phash(attach_image_payload(docs), n_bands=8)
    return (
        dedup.phash_near_pairs(
            ph,
            id_col="doc_id",
            band_cols=tuple(f"band{j}" for j in range(8)),
            max_dist=7,
        ),
        ph,
    )


def main() -> None:
    if not os.path.exists(os.path.join(X10, "documents.parquet")):
        subprocess.run(
            [
                sys.executable,
                "tools/make_scale_data.py",
                SRC,
                X10,
                "10",
                "documents",
            ],
            check=True,
        )
    spark = get_spark("r11-fixture", shuffle_partitions=64)

    docs1 = spark.read.parquet(f"{SRC}/documents.parquet")
    pairs1, _ = _pairs(docs1)
    n1 = pairs1.count()
    cache_registry.unpersist_all()

    docs10 = spark.read.parquet(f"{X10}/documents.parquet")
    pairs10, ph10 = _pairs(docs10)
    t0 = time.perf_counter()
    n10 = pairs10.count()
    t_pairs10 = time.perf_counter() - t0
    print(
        f"phash pairs: 1x={n1}  x10={n10}  slope={n10 / max(n1, 1):.1f}x/step "
        f"(x10 pair gen {t_pairs10:.1f}s)"
    )

    # --- star-contraction A/B on the repaired fixture ---
    contracted = dedup.phash_contracted_pairs(
        ph10,
        id_col="doc_id",
        band_cols=tuple(f"band{j}" for j in range(8)),
        max_dist=7,
    )
    nodes = ph10.select(F.col("doc_id").alias("id"))

    n_con = contracted.count()
    print(f"x10 CC input edges: raw={n10}  contracted={n_con}")

    t0 = time.perf_counter()
    cc_raw = dedup.connected_components(
        nodes, pairs10.select("l_id", "r_id"), id_col="id"
    )
    raw_sum = cc_raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("id", "cluster_id").cast("long")).alias("h"),
    ).collect()[0]
    t_raw = time.perf_counter() - t0
    cache_registry.unpersist_all()

    t0 = time.perf_counter()
    cc_con = dedup.connected_components(nodes, contracted, id_col="id")
    con_sum = cc_con.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("id", "cluster_id").cast("long")).alias("h"),
    ).collect()[0]
    t_con = time.perf_counter() - t0
    cache_registry.unpersist_all()

    same = (raw_sum["n"], raw_sum["h"]) == (con_sum["n"], con_sum["h"])
    print(
        f"CC wall: raw={t_raw:.1f}s contracted={t_con:.1f}s  "
        f"components identical: {same}"
    )
    assert same, "contraction changed components — BUG"
    spark.stop()


if __name__ == "__main__":
    main()
