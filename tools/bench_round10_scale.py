"""Round-10 scale probes (VERDICT r9 #2/#5/#8 plus new-op slopes):

Part A — 1x/10x slopes for the round-10 operators over the decorrelated
x10 replicas from tools/make_scale_data.py:

* ``dedup_remove_images`` RE-measured after the band-local star
  contraction (r9 slope was 8.3x, CC-round-count bound; target <= ~5x);
* ``entity_resolve_incremental`` (pinned 16-cell CONTRACT geometry —
  expected to inherit entity_resolve_embeddings' near-linear-x10 shape;
  the scale path is Part B);
* ``join_sim_parts_tfidf`` (TF-IDF weighting over the x10 part table);
* ``multimodal_bmp_pixel_stats`` (expected flat, like phash);
* ``quality_probe_fit_docs`` (sufficient-stats contract output);
* ``ann_topk_pq`` (fit-in-query PQ after the grid-committed assignment).

Part B — the knn_graph SCALE PATH's own BASELINE row (VERDICT r9 #2):
the one-call convenience entry (ceil(sqrt(n)) centroids, kernel probe
scoring) timed at 1x and 10x, index build and edge serve separately
(build amortizes once per rebuild cadence; serve is the recurring
cost).

CAVEAT (BASELINE.md round-10 "measurement hygiene"): repeated
knn_graph calls in ONE session slow down progressively — eager
localCheckpoint blocks free only on JVM GC, so storage fills and later
joins spill (measured 18 -> 71 -> 140 s for identical serves). The
OFFICIAL 1x/10x/100x rows in BASELINE.md were re-measured with a FRESH
session per cell; this script's one-session part B is a quick smoke,
not the record.

Measurement hygiene per the round-6 lessons: noop-sink writes (never
count()), partitions sized for the LARGEST scale, caches released
between cells.  Results -> BASELINE.md.

Usage:
  SPARK_DRIVER_MEMORY=48g python tools/bench_round10_scale.py [a|b]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark import queries as q  # noqa: E402
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r10"  # + part (the tfidf row reads it)

PART_A = [
    "multimodal_bmp_pixel_stats",
    "quality_probe_fit_docs",
    "join_sim_parts_tfidf",
    "ann_topk_pq",
    "dedup_remove_images",
    "entity_resolve_incremental",
]


def _ensure_dirs() -> None:
    if not os.path.exists(os.path.join(X10, "part.parquet")):
        subprocess.run(
            [
                sys.executable,
                "tools/make_scale_data.py",
                SRC,
                X10,
                "10",
                "customer,part,documents,events,embeddings",
            ],
            check=True,
        )


def _run(spark, name: str, sf_dir: str) -> float:
    fn = q.QUERIES[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 2)
    cache_registry.unpersist_all()
    return dt


def _knn_graph_cell(spark, sf_dir: str, tag: str) -> dict:
    """Build + serve the sqrt(n)-kernel kNN graph (the knn_graph
    convenience defaults) with both phases timed."""
    from pyspark.sql import functions as F

    from polars_sim_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    path = f"/tmp/knn_scale_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    edges = knn_graph(emb, path, k=5, nprobe=3, mutual=True, min_cosine=0.3)
    edges.write.mode("overwrite").format("noop").save()
    total = round(time.perf_counter() - t0, 2)
    # second call reuses the committed index: serve-only cost
    t1 = time.perf_counter()
    edges2 = knn_graph(emb, path, k=5, nprobe=3, mutual=True, min_cosine=0.3)
    n_edges = edges2.count()
    serve = round(time.perf_counter() - t1, 2)
    cents = spark.read.parquet(os.path.join(path, "_centroids")).count()
    cache_registry.unpersist_all()
    return {
        "build_plus_serve": total,
        "serve": serve,
        "centroids": cents,
        "edges": int(n_edges),
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    _ensure_dirs()
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("r10_scale", shuffle_partitions=256)
    out: dict = {}
    if "a" in which:
        for name in PART_A:
            row = {}
            for label, d in (("1x", SRC), ("10x", X10)):
                row[label] = _run(spark, name, d)
            row["slope"] = round(row["10x"] / max(row["1x"], 1e-9), 1)
            out[name] = row
            print(name, row, flush=True)
        tmp_idx = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "indexes",
            os.path.basename(X10),
        )
        shutil.rmtree(tmp_idx, ignore_errors=True)
    if "b" in which:
        for label, d in (("1x", SRC), ("10x", X10)):
            out[f"knn_graph_{label}"] = _knn_graph_cell(spark, d, label)
            print(f"knn_graph_{label}", out[f"knn_graph_{label}"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
