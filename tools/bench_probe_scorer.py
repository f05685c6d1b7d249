"""Measure the probe-scorer cost at large centroid counts.

Round-4 finding (BASELINE.md "Kernel crossover"): past ~100 centroids
both IVF assignment paths were dominated by the PROBE side's literal
centroid table — ``_centroid_scores`` builds num_centroids × dim plan
literals, and constructing + analyzing + codegen'ing those constants is
data-independent overhead that grows with the centroid count. Round 5
routes the probe side through the broadcast-matrix GEMM kernel whenever
``assignment="kernel"``, so kernel mode never builds the literal array.

This sweep times ann_topk_ivf end-to-end on a synthetic 10×-sf0.1-sized
corpus (20k × 64-dim vectors, deterministic hash-derived components) at
growing centroid counts, expr vs kernel. Run:

    python tools/bench_probe_scorer.py [n_corpus] [centroid counts...]

Results recorded in BASELINE.md ("Probe scorer at large centroid
counts").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_sim_spark.operators.similarity import ann_topk_ivf
from polars_sim_spark.session import get_spark

DIM = 64


def synth_embeddings(spark, n: int):
    """n rows of (vec_id, embedding): 64 deterministic pseudo-random
    floats in [-1, 1) derived from xxhash64(id, component)."""
    comp = (
        "transform(sequence(0, %d), j -> "
        "cast(pmod(xxhash64(id * 1315423911 + j), 2000) / 1000.0 - 1.0 "
        "as float))" % (DIM - 1)
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(comp).alias("embedding")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    counts = [int(x) for x in sys.argv[2:]] or [128, 512, 1000]
    spark = get_spark("bench_probe_scorer")
    corpus = synth_embeddings(spark, n).persist()
    corpus.count()
    queries = (
        synth_embeddings(spark, 50)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
        .persist()
    )
    queries.count()
    # warmup: JVM + Arrow path
    ann_topk_ivf(corpus, queries, num_centroids=16, nprobe=3, k=5).count()

    print(f"corpus={n} dim={DIM} queries=50 nprobe=3 k=5")
    for c in counts:
        row = [f"centroids={c}"]
        for mode in ("expr", "kernel"):
            t0 = time.time()
            cnt = ann_topk_ivf(
                corpus,
                queries,
                num_centroids=c,
                nprobe=3,
                k=5,
                assignment=mode,
            ).count()
            row.append(f"{mode}={time.time() - t0:.2f}s rows={cnt}")
        print("  ".join(row))
    # k-means refinement rides the same literal-vs-broadcast split
    # (BASELINE.md "Probe scorer at large centroid counts"): with
    # kmeans_iters=2 every Lloyd iteration re-evaluates the scorer, so
    # the literal path compounds.
    for c in counts:
        if c > max(counts) // 2:
            continue  # the largest expr+kmeans case runs for minutes
        row = [f"centroids={c} kmeans_iters=2"]
        for mode in ("expr", "kernel"):
            t0 = time.time()
            cnt = ann_topk_ivf(
                corpus,
                queries,
                num_centroids=c,
                nprobe=3,
                k=5,
                kmeans_iters=2,
                assignment=mode,
            ).count()
            row.append(f"{mode}={time.time() - t0:.2f}s rows={cnt}")
        print("  ".join(row))
    spark.stop()


if __name__ == "__main__":
    main()
