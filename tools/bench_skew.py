"""Measure what salting actually buys on a hot-key join.

Purpose: `salted_join` (operators/skew.py) claims to fix the skew AQE
cannot split — one key so hot its pair output swamps a single task.
This script measures plain-vs-salted wall time on a synthetic worst
case: the probe has `HOT_FRAC` of all rows on ONE key; the build side
carries `BUILD_PER_KEY` rows per key, so the hot key alone produces
|hot probe| × BUILD_PER_KEY output pairs inside one task when unsalted.
Broadcast is disabled (a 100 TB build side would not broadcast) and AQE
left ON — so the baseline already enjoys AQE's skew handling, and the
delta isolates what the salt adds beyond it.

Run:  python tools/bench_skew.py [probe_rows] [num_salts]
Results recorded in BASELINE.md (Skew-join section).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from polars_sim_spark.operators.skew import salted_join
from polars_sim_spark.session import get_spark

HOT_FRAC = 0.5
NUM_KEYS = 100_000
BUILD_PER_KEY = 8


def synth(spark, probe_rows: int):
    probe = spark.range(probe_rows).select(
        F.when(
            F.col("id") < int(probe_rows * HOT_FRAC), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(NUM_KEYS)))
        .alias("k"),
        F.col("id").alias("pid"),
    )
    build = (
        spark.range(NUM_KEYS)
        .select(F.col("id").alias("k"))
        .crossJoin(spark.range(BUILD_PER_KEY).select(F.col("id").alias("slot")))
        .select("k", (F.col("k") * 100 + F.col("slot")).alias("payload"))
    )
    return probe, build


def run(spark, probe_rows: int, num_salts: int) -> dict[str, float]:
    probe, build = synth(spark, probe_rows)
    out = {}
    for mode in ("plain", "salted"):
        t0 = time.time()
        if mode == "plain":
            j = probe.join(build.withColumnRenamed("k", "k2"), probe.k == F.col("k2"))
        else:
            j = salted_join(probe, build, on="k", num_salts=num_salts, salt_by=["pid"])
        n = j.count()
        out[mode] = round(time.time() - t0, 2)
        print(f"{mode:7s} probe={probe_rows} salts={num_salts}: "
              f"{out[mode]}s ({n} pairs)", flush=True)
    return out


def main():
    probe_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("bench-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    warm = run(spark, probe_rows // 10, num_salts)  # warm the JVM
    print("warmup:", warm, flush=True)
    res = run(spark, probe_rows, num_salts)
    speedup = round(res["plain"] / res["salted"], 2) if res["salted"] else 0
    print(f"SUMMARY plain={res['plain']}s salted={res['salted']}s "
          f"speedup={speedup}x", flush=True)


if __name__ == "__main__":
    main()
