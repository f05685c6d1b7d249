"""Round-15 drift adjudication (VERDICT r14 #8 + this round's touched
rows): re-times ``quality_probe_fit_docs`` (official readings spanned
4.1-27.3 s across rounds — adjudicate whether the 15.7/27.3 s shapes
reproduce after the round-15 symmetric-half X^TX cut) plus the rows the
round-15 changes touched most (verify-floor, LPA cadence, IVF/PQ
fan-out checkpoints) three times each at sf0.1 on a quiet host,
bracketed by canary trio samples. Writes /root/repo/BENCH_drift_r15.json;
does NOT touch BENCH_local.json (the committed official record).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_sim_spark import cache as cache_registry
from polars_sim_spark import queries as q
from polars_sim_spark.session import get_spark

ROWS = [
    "quality_probe_fit_docs",
    "entity_resolve_customers",
    "dedup_jaccard_docs",
    "dedup_minhash_lsh_docs",
    "graph_part_communities",
    "graph_part_kcore",
    "ann_topk_pq",
    "dedup_embedding_ivf",
    "dedup_embedding_ivf_capped",
]
CANARY = ["text_fingerprint", "text_token_count", "tpch_q6_forecast_revenue"]
REPEATS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-drift-r15")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    q.ensure_quality_probe(spark, sf_dir)

    def canary_sample() -> float:
        t0 = time.perf_counter()
        for name in CANARY:
            q.QUERIES[name](spark, sf_dir).count()
        cache_registry.unpersist_all()
        return round(time.perf_counter() - t0, 3)

    canary_sample()  # discard the hot first pass (bench.py precedent)
    canaries = [canary_sample()]
    timings: dict[str, list[float]] = {name: [] for name in ROWS}
    for rep in range(REPEATS):
        for name in ROWS:
            fn = q.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name].append(round(time.perf_counter() - t0, 3))
            cache_registry.unpersist_all()
            cache_registry.sweep_persistent_rdds(spark)
        canaries.append(canary_sample())

    record = {
        "metric": "drift_retimes_r15",
        "sf": 0.1,
        "repeats": REPEATS,
        "canary_samples": canaries,
        "canary_median": sorted(canaries)[len(canaries) // 2],
        "timings": timings,
        "medians": {n: sorted(v)[len(v) // 2] for n, v in timings.items()},
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_drift_r15.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
