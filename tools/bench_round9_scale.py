"""Round-9 scale probes (VERDICT r8 #7 plus new-op slopes):

Part A — 1x/10x slopes for the round-9 operators (phash image dedup,
boundary packing, embedding entity resolution) over the decorrelated
x10 replicas from tools/make_scale_data.py.

Part B — the 100x probes for the remaining ITERATIVE families the r8
verdict asked for: graph_part_communities (LPA), graph_part_kcore
(peeling) on the 120M-edge x100 co-purchase graph, and
entity_resolve_customers (edit-join -> CC) on the x100 customer table —
run under the documented single-JVM boundary (SPARK_DRIVER_MEMORY=80g,
shuffle.partitions=256; see BASELINE.md "Graph 100x probe" for why 16g
OOMs and 48g GC-thrashes materializing the checkpointed adjacency).

Measurement hygiene per the round-6 lessons: noop-sink writes (never
count()), partitions sized for the LARGEST scale, caches released
between cells. Results -> BASELINE.md.

Usage:
  SPARK_DRIVER_MEMORY=80g python tools/bench_round9_scale.py [a|b]
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
X10 = "/tmp/sfx10_r8c"  # customer,lineitem,documents,events,embeddings x10
X100 = "/tmp/sfx100_r8"  # customer,lineitem x100

PART_A = [
    "dedup_images_phash",
    "pack_sequences_boundary",
    "entity_resolve_embeddings",
    "ann_recall_ivf",
    "dedup_remove_images",
    "decontaminate_fraction_docs",
]
PART_B = [
    "graph_part_communities",
    "graph_part_kcore",
    "entity_resolve_customers",
]


def _ensure_dirs() -> None:
    if not os.path.exists(os.path.join(X10, "embeddings.parquet")):
        subprocess.run(
            [
                sys.executable,
                "tools/make_scale_data.py",
                SRC,
                X10,
                "10",
                "customer,lineitem,documents,events,embeddings",
            ],
            check=True,
        )
    if not os.path.exists(os.path.join(X100, "lineitem.parquet")):
        subprocess.run(
            [
                sys.executable,
                "tools/make_scale_data.py",
                SRC,
                X100,
                "100",
                "customer,lineitem",
            ],
            check=True,
        )


def _run(spark, name: str, sf_dir: str) -> dict:
    fn = q.QUERIES[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 2)
    cache_registry.unpersist_all()
    return {"sec": dt}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    _ensure_dirs()
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "80g")
    spark = get_spark("r9_scale", shuffle_partitions=256)
    out: dict = {}
    if "a" in which:
        for name in PART_A:
            row = {}
            for label, d in (("1x", SRC), ("10x", X10)):
                row[label] = _run(spark, name, d)["sec"]
            row["slope"] = round(row["10x"] / max(row["1x"], 1e-9), 1)
            out[name] = row
            print(name, row, flush=True)
        # the x10 contract index was built under the repo's indexes/ dir
        # by ensure_* (keyed on the sf basename) — probe artifact, not a
        # committed fixture; drop it
        tmp_idx = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "indexes", os.path.basename(X10))
        shutil.rmtree(tmp_idx, ignore_errors=True)
    if "b" in which:
        for name in PART_B:
            row = {}
            for label, d in (("1x", SRC), ("100x", X100)):
                row[label] = _run(spark, name, d)["sec"]
            row["slope_per_step"] = round((row["100x"] / max(row["1x"], 1e-9)) ** 0.5, 1)
            out[name] = row
            print(name, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
