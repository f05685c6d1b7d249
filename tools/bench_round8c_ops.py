"""Third-batch round-8 new-op 10x slope measurements: edit-distance
join, graph triangle/PageRank, PMI pairs, robust anomalies, WebDataset
shards, MMR re-rank, global deciles.  Reuses the decorrelated-replica
conventions of tools/make_scale_data.py (customer names track shifted
keys so the edit join sees 10x distinct names, not replica cliques),
times each contract query at 1x and 10x with caches released between
runs, and prints one JSON line.  Results -> BASELINE.md.
Usage: python tools/bench_round8c_ops.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark import queries as q  # noqa: E402
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
X10 = "/tmp/sfx10_r8c"
TABLES = "customer,lineitem,documents,events,embeddings"

QUERIES = [
    "join_edit_customers",
    "graph_part_triangles",
    "graph_part_pagerank",
    "text_pmi_pairs",
    "events_robust_anomalies",
    "pack_webdataset_docs",
    "ann_mmr_rerank",
    "events_value_deciles",
]


def main() -> None:
    if not os.path.exists(os.path.join(X10, "events.parquet")):
        subprocess.run(
            [sys.executable, "tools/make_scale_data.py", SRC, X10, "10", TABLES],
            check=True,
        )
    spark = get_spark("r8c_scale", shuffle_partitions=64)
    for t in TABLES.split(","):
        spark.read.parquet(f"{SRC}/{t}.parquet").count()
        spark.read.parquet(f"{X10}/{t}.parquet").count()
    out = {}
    for name in QUERIES:
        fn = q.QUERIES[name]
        row = {}
        for label, sf_dir in (("1x", SRC), ("10x", X10)):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            row[label] = round(time.monotonic() - t0, 2)
            row[f"rows_{label}"] = n
            cache_registry.unpersist_all()
        row["slope"] = round(row["10x"] / max(row["1x"], 1e-9), 1)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
