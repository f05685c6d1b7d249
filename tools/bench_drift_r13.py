"""Round-13 drift adjudication (VERDICT r12 'Next round' #2).

Re-times the four rows whose round-12 deltas sat above the noise band
(``dedup_remove_docs_lsh`` +38% unexplained; ``dedup_images_multiformat``,
``resolve_entities_scale``, ``entity_resolve_embeddings`` named capability
costs) three times each at sf0.1 on a quiet host, bracketed by canary
trio samples, and writes ``/root/repo/BENCH_drift_r13.json``. Does NOT
touch BENCH_local.json (the committed official record).
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
    "dedup_remove_docs_lsh",
    "dedup_images_multiformat",
    "resolve_entities_scale",
    "entity_resolve_embeddings",
]
CANARY = ["text_fingerprint", "text_token_count", "tpch_q6_forecast_revenue"]
REPEATS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-drift-r13")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    q.ensure_ivf_sqrt_index(spark, sf_dir)

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
        canaries.append(canary_sample())

    record = {
        "metric": "drift_retimes_r13",
        "sf": 0.1,
        "repeats": REPEATS,
        "canary_samples": canaries,
        "canary_median": sorted(canaries)[len(canaries) // 2],
        "timings": timings,
        "medians": {
            n: sorted(v)[len(v) // 2] for n, v in timings.items()
        },
        # Committed official records (git 4fd9d35 / 7f2e437). Note the
        # judge's +38% figure compared the driver's r11 rerun (6.953 at
        # canary 0.544, from BENCH_r11.json's truncated map) against the
        # r12 official — on committed officials the row moved
        # 8.678 -> 9.621 (+10.9%) while the canary moved 0.475 -> 0.551
        # (+16%), i.e. flat-to-down normalized.
        "r12_official": {
            "dedup_remove_docs_lsh": 9.621,
            "dedup_images_multiformat": 5.452,
            "resolve_entities_scale": 10.217,
            "entity_resolve_embeddings": 8.015,
            "canary": 0.551,
        },
        "r11_official": {
            "dedup_remove_docs_lsh": 8.678,
            "dedup_images_multiformat": 3.502,
            "resolve_entities_scale": 11.382,
            "entity_resolve_embeddings": 7.136,
            "canary": 0.475,
        },
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_drift_r13.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
