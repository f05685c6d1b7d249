"""Round-15 verify-floor scale A/B (VERDICT r14 next-#2 "done"
criterion): wall-time the two CPU-per-row verify compositions — the
FastSS edit-distance join (Levenshtein DP verify) and the MinHash-LSH
pipeline (exact-Jaccard array_intersect verify) — on the decorrelated
×10/×100 corpora, under the same session shape as
tools/bench_scale100.py (256 shuffle partitions sized for the largest
scale, noop-sink action). Run from BOTH the round-15 tree and the
round-14 worktree to A/B the cpu_floor_repartition change.

Usage: python tools/bench_verify_floor_r15.py <data_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark import cache as cache_registry
from polars_sim_spark.operators import dedup
from polars_sim_spark.operators.edit_join import edit_join
from polars_sim_spark.session import get_spark


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    d = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("verify-floor-ab", shuffle_partitions=256)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    cust = spark.read.parquet(f"{d}/customer.parquet")
    docs.count()
    cust.count()
    for name, build in (
        (
            "edit_join_customers_k1",
            lambda: edit_join(cust, None, "c_name", left_id="c_custkey", max_dist=1),
        ),
        (
            "minhash_lsh_pairs",
            lambda: dedup.minhash_lsh_dedup_pairs(
                docs, "doc_id", "text", min_jaccard=0.5
            ),
        ),
    ):
        walls = []
        for _ in range(reps):
            walls.append(noop(build()))
            cache_registry.unpersist_all()
            cache_registry.sweep_persistent_rdds(spark)
        print(f"{name} @ {d}: walls={walls}")
    spark.stop()


if __name__ == "__main__":
    main()
