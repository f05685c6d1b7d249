"""Exact per-group percentiles vs the bounded-state quantile sketch at
1x/10x/100x events (round 8): the sketch's partial WindowGroupLimit
keeps s rows per group per task BEFORE the exchange, so its shuffle is
O(tasks*s) per group while exact percentile co-locates every value.
Results -> BASELINE.md. Usage: bench_quantiles_scale.py <1x> <10x> <100x>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from polars_sim_spark.operators.sketches import quantile_sketch  # noqa: E402
from polars_sim_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("qsk_scale", shuffle_partitions=256)
    out = {}
    for tag, d in zip(("1x", "10x", "100x"), sys.argv[1:4]):
        ev = spark.read.parquet(f"{d}/events.parquet")
        ev.count()  # warm
        best_e = best_s = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            noop(
                ev.groupBy("event_type").agg(
                    *[
                        F.round(F.percentile(F.col("value").cast("double"), F.lit(p)), 6)
                        for p in (0.5, 0.9, 0.99)
                    ]
                )
            )
            best_e = min(best_e, time.monotonic() - t0)
            t0 = time.monotonic()
            noop(
                quantile_sketch(
                    ev, "event_type", "value", "event_id", [0.5, 0.9, 0.99], s=256
                )
            )
            best_s = min(best_s, time.monotonic() - t0)
        out[tag] = {"exact_sec": round(best_e, 3), "sketch_sec": round(best_s, 3)}
        print(json.dumps({tag: out[tag]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
