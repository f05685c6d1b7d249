"""100× scale slopes for the five heaviest dedup/ANN paths (VERDICT r5
task #6): substring spans, passage dedup, MinHash-LSH pairs, IVF
embedding near-dup, and connected components — sf0.1 → 10× → 100×
(sf10-equivalent) over decorrelated replicas from make_scale_data.py.

Where a CONTRACT query pins oracle-exactness parameters that are not
the operator's scale defaults, this bench measures the scale-path
composition instead (and says so):

* IVF embedding near-dup: operator default √n centroids (the contract
  query pins 16 centroids so its DuckDB oracle is a fixed unrolling —
  16 cells over 200k vectors would be Σcell² ≈ 2.5G exact pairs, the
  documented quadratic-twin regime, not the operator's design point).
* Connected components: LSH-banded pairs feed CC (the
  dedup_remove_docs_lsh composition); the contract cluster query's
  all-shingle-pairs generation is the labeled oracle twin.

Usage: python tools/bench_scale100.py <dir1x> <dir10x> <dir100x> [reps]
Each cell is best-of-``reps`` (default 2; the 100× column uses 1 rep —
minutes per query). Results → BASELINE.md "100× dedup/ANN slopes".

Measurement hygiene (both found the hard way in round 6):

* The action is a ``noop``-sink WRITE, not ``count()``: passage dedup
  re-joins its aggregate to the input on a unique key, and Catalyst
  ELIMINATES the whole pipeline for a count (0.3 s flat at every
  scale — it was counting the input scan).
* The session uses 256 shuffle partitions + 48g: partitions must be
  sized for the LARGEST scale (AQE coalesces surplus partitions at
  small scales but never splits a too-big partition outside skew
  joins) — at 32 partitions the 100× IVF verify stage (the designed
  O(n^1.5) pair volume) dies with UNABLE_TO_ACQUIRE_MEMORY.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_sim_spark import cache as cache_registry
from polars_sim_spark.operators import dedup
from polars_sim_spark.session import get_spark


def _docs(spark, d):
    return spark.read.parquet(f"{d}/documents.parquet")


def _emb(spark, d):
    return spark.read.parquet(f"{d}/embeddings.parquet")


def substring_spans(spark, d):
    return dedup.duplicate_substring_spans(_docs(spark, d), "doc_id", "text")


def passages(spark, d):
    return dedup.remove_duplicate_passages(_docs(spark, d), "doc_id", "text")


def minhash_lsh(spark, d):
    return dedup.minhash_lsh_dedup_pairs(_docs(spark, d), "doc_id", "text", min_jaccard=0.5)


def embedding_ivf(spark, d):
    n = _emb(spark, d).count()
    c = max(16, int(n ** 0.5))
    return dedup.embedding_ivf_near_dup_pairs(
        _emb(spark, d), "vec_id", "embedding", min_cosine=0.35, num_centroids=c, nprobe=2
    )


def embedding_ivf_capped(spark, d):
    """The round-7 hot-cell cap engaged (max_cell_fraction=0.01): cells
    past 1% of the corpus are re-quantized in place before pair
    generation — the mitigation for the measured 72.9× quantizer-skew
    slope at the 100× step (VERDICT r6 #2; designed n^1.5 is 31.6×)."""
    n = _emb(spark, d).count()
    c = max(16, int(n ** 0.5))
    return dedup.embedding_ivf_near_dup_pairs(
        _emb(spark, d), "vec_id", "embedding", min_cosine=0.35, num_centroids=c,
        nprobe=2, max_cell_fraction=0.01,
    )


def connected_components_lsh(spark, d):
    docs = _docs(spark, d)
    pairs = dedup.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", min_jaccard=0.5
    ).select("l_id", "r_id")
    nodes = docs.select(F.col("doc_id").alias("id"))
    return dedup.connected_components(nodes, pairs)


CASES = [
    ("substring_spans", substring_spans),
    ("passage_dedup", passages),
    ("minhash_lsh_pairs", minhash_lsh),
    ("embedding_ivf_sqrtn", embedding_ivf),
    ("embedding_ivf_capped", embedding_ivf_capped),
    ("cc_over_lsh_pairs", connected_components_lsh),
]


def main() -> None:
    dirs = sys.argv[1:4]
    if len(dirs) != 3:
        dirs = ["/root/testdata/sf0.1", "/tmp/bench_sf1_docs", "/tmp/bench_sf10_docs"]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("bench_scale100", shuffle_partitions=256)
    for d in dirs:
        _docs(spark, d).count()
        _emb(spark, d).count()
    only = os.environ.get("SCALE100_ONLY", "")
    print(f"dirs={dirs} reps={reps} (100x col: 1 rep) only={only!r}", flush=True)
    for name, fn in CASES:
        if only and only not in name:
            continue
        row = []
        for i, d in enumerate(dirs):
            best = None
            for _ in range(1 if i == 2 else reps):
                t0 = time.perf_counter()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                cache_registry.unpersist_all()
            cnt = fn(spark, d).count()
            cache_registry.unpersist_all()
            row.append((round(best, 1), cnt))
        s10 = row[1][0] / row[0][0]
        s100 = row[2][0] / row[1][0]
        print(
            f"{name}: 1x {row[0][0]}s ({row[0][1]} rows)  10x {row[1][0]}s "
            f"({row[1][1]} rows, {s10:.1f}x)  100x {row[2][0]}s "
            f"({row[2][1]} rows, {s100:.1f}x vs 10x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
