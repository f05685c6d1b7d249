"""Measure z-order layout pruning (sources/layout.py) vs the layouts
the repo already ships: natural order, a 1-D sort, and hive
partitioning. For a 2-D box predicate on (user_id, value) we count the
parquet row groups whose min/max stats overlap the box — the unit a
stats-aware scan reads — and time the filtered Spark scan on each
layout. Feeds the BASELINE.md pruning table (VERDICT r7 #1).

Usage: python tools/bench_zorder.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from polars_sim_spark.session import get_spark  # noqa: E402
from polars_sim_spark.sources.layout import (  # noqa: E402
    row_groups_overlapping,
    write_zordered,
)

BOX = {"user_id": (400, 799), "value": (100.0, 200.0)}
NFILES = 64


def timed_scan(spark, path, runs=3):
    pred = F.col("user_id").between(*BOX["user_id"]) & F.col("value").between(
        *BOX["value"]
    )
    best = float("inf")
    n = None
    for _ in range(runs):
        t0 = time.monotonic()
        n = (
            spark.read.parquet(path)
            .where(pred)
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect()[0][0]
        )
        best = min(best, time.monotonic() - t0)
    return best, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="zbench_")
    spark = get_spark()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    layouts = {}
    p = f"{out_root}/flat"
    ev.repartition(NFILES).write.mode("overwrite").parquet(p)
    layouts["natural (repartition)"] = p

    p = f"{out_root}/sorted_user"
    (
        ev.repartitionByRange(NFILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(p)
    )
    layouts["1-D sort (user_id)"] = p

    p = f"{out_root}/hive_type"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(p)
    layouts["hive (event_type)"] = p

    p = f"{out_root}/zorder"
    write_zordered(ev, p, ["user_id", "value"], num_files=NFILES)
    layouts["z-order (user_id,value)"] = p

    rows = []
    for name, path in layouts.items():
        m, t = row_groups_overlapping(path, BOX)
        sec, n = timed_scan(spark, path)
        rows.append(
            {"layout": name, "rg_match": m, "rg_total": t, "scan_sec": round(sec, 3), "rows": n}
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"sf_dir": sf_dir, "box": str(BOX), "results": rows}))
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
