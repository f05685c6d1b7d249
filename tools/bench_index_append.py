"""Incremental IVF-PQ maintenance cost: append 10% of the corpus to a
stored index vs a full pinned rebuild over the union (VERDICT r7 #3).
Usage: python tools/bench_index_append.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from polars_sim_spark.operators import pq  # noqa: E402
from polars_sim_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm footer/scan
    old = emb.where(F.col("vec_id") % 10 != 0)
    new = emb.where(F.col("vec_id") % 10 == 0)
    root = tempfile.mkdtemp(prefix="pss_append_")
    inc, reb = f"{root}/inc", f"{root}/reb"
    t0 = time.monotonic()
    pq.materialize_ivfpq_index(old, inc, num_centroids=16, m=8, k_codes=16, pq_iters=3)
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    pq.append_to_ivfpq_index(new, inc)
    t_append = time.monotonic() - t0
    t0 = time.monotonic()
    pq.materialize_ivfpq_index(emb, reb, from_index=inc)
    t_rebuild = time.monotonic() - t0
    n_old, n_new = old.count(), new.count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows_base": n_old,
                "rows_appended": n_new,
                "build_90pct_sec": round(t_build, 3),
                "append_10pct_sec": round(t_append, 3),
                "pinned_rebuild_sec": round(t_rebuild, 3),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
