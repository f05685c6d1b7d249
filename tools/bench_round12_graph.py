"""Round-12 graph re-measure (VERDICT r11 #5): k-core and LPA at
1×/×100 on a FRESH ×100 co-purchase corpus, with an incident-only vs
full-recompute A/B for the k-core peel.

The standing slopes (kcore 8.9×/step, communities 5.6×/step) date from
round 9, before the incident-only shapes matured. k_core now maintains
degrees incrementally (round 12); this probe records the new slope and
the A/B delta at both scales, under the documented single-JVM boundary
(SPARK_DRIVER_MEMORY=80g for the ×100 adjacency).

Usage:
  SPARK_DRIVER_MEMORY=80g python tools/bench_round12_graph.py [x100_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark import cache as cache_registry  # noqa: E402
from polars_sim_spark import queries as q  # noqa: E402
from polars_sim_spark.operators.graph import k_core  # noqa: E402
from polars_sim_spark.queries.graph import _copurchase_edges  # noqa: E402
from polars_sim_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx100_r12graph"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "80g")
    spark = get_spark("r12-graph", shuffle_partitions=256)
    for label, d in (("1x", SRC), ("100x", x100)):
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            print(f"{label}: corpus missing at {d}, skipped", flush=True)
            continue
        edges = _copurchase_edges(spark, d).localCheckpoint(eager=True)
        n_edges = edges.count()
        for mode, flag in (("incident", True), ("recompute", False)):
            t0 = time.perf_counter()
            n = k_core(edges, k=80, incident_only=flag).count()
            print(
                f"kcore {label} {mode}: edges={n_edges} core_nodes={n} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )
            cache_registry.unpersist_all()
        t0 = time.perf_counter()
        q.QUERIES["graph_part_communities"](spark, d).write.mode(
            "overwrite"
        ).format("noop").save()
        print(
            f"communities {label}: wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        cache_registry.unpersist_all()
    spark.stop()


if __name__ == "__main__":
    main()
