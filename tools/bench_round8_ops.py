"""Round-8 new-op measurements: partition-pruned upsert vs full rewrite,
SQ8 storage/recall/latency vs raw float serving, and bloom-prefiltered
decontamination vs the plain broadcast join at a LARGE eval set.
Usage: python tools/bench_round8_ops.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from polars_sim_spark.operators.curation import decontaminate, decontaminate_bloom  # noqa: E402
from polars_sim_spark.operators.similarity import (  # noqa: E402
    ann_topk_bruteforce,
    ann_topk_sq8,
    sq8_quantize,
)
from polars_sim_spark.session import get_spark  # noqa: E402
from polars_sim_spark.sources.sinks import upsert_partitions  # noqa: E402


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def bench_upsert(spark, sf_dir, root):
    # 50-way partition grain (a day-partitioned lake's shape, not the
    # contract row's 5-way event_type demo): updates touch ONE value.
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            "value",
            F.pmod("user_id", F.lit(50)).cast("int").alias("p"),
        )
    )
    ev.count()
    lake = f"{root}/lake"
    ev.write.partitionBy("p").parquet(lake)
    updates = (
        ev.where((F.col("p") == 7) & (F.pmod("event_id", F.lit(11)) == 0))
        .withColumn("value", F.col("value") + 1000.0)
    )
    n_upd = updates.count()
    t0 = time.monotonic()
    upsert_partitions(spark, lake, updates, key_cols=["event_id"], partition_col="p")
    t_upsert = time.monotonic() - t0
    # full-rewrite equivalent: read whole lake, anti join, union, write all
    lake2 = f"{root}/lake2"
    ev.write.partitionBy("p").parquet(lake2)
    upd2 = updates.localCheckpoint(eager=True)
    t0 = time.monotonic()
    allrows = spark.read.parquet(lake2)
    merged = allrows.join(upd2, ["event_id"], "left_anti").unionByName(
        upd2.select(*allrows.columns)
    ).localCheckpoint(eager=True)
    merged.write.mode("overwrite").partitionBy("p").parquet(f"{root}/lake2_out")
    t_rewrite = time.monotonic() - t0
    part_bytes = {
        d: _dir_bytes(os.path.join(lake, d))
        for d in os.listdir(lake)
        if d.startswith("p=")
    }
    touched = part_bytes.get("p=7", 0)
    return {
        "rows_total": ev.count(),
        "rows_updated": n_upd,
        "partitions_total": len(part_bytes),
        "partitions_rewritten": 1,
        "bytes_rewritten": touched,
        "bytes_total": sum(part_bytes.values()),
        "upsert_sec": round(t_upsert, 3),
        "full_rewrite_sec": round(t_rewrite, 3),
    }


def bench_sq8(spark, sf_dir, root):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # storage: raw float32 arrays vs int codes (0..255) on disk
    raw_p, code_p = f"{root}/raw_emb", f"{root}/sq8_codes"
    emb.select("vec_id", "embedding").write.parquet(raw_p)
    coded = sq8_quantize(emb).select(
        "vec_id", F.expr("transform(codes, c -> cast(c as int))").alias("codes")
    )
    coded.write.parquet(code_p)
    t0 = time.monotonic()
    exact = {(r["q_id"], r["n_id"]) for r in ann_topk_bruteforce(emb, queries, k=5).collect()}
    t_brute = time.monotonic() - t0
    t0 = time.monotonic()
    approx = {(r["q_id"], r["n_id"]) for r in ann_topk_sq8(emb, queries, k=5).collect()}
    t_sq8 = time.monotonic() - t0
    return {
        "n_vectors": emb.count(),
        "raw_bytes": _dir_bytes(raw_p),
        "sq8_code_bytes": _dir_bytes(code_p),
        "recall_at_5_vs_exact_cosine": round(len(exact & approx) / len(exact), 4),
        "bruteforce_sec": round(t_brute, 3),
        "sq8_sec": round(t_sq8, 3),
    }


def bench_bloom(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    # LARGE eval set: half the corpus — the regime bloom is built for
    ev = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    m, k = 1 << 21, 3
    t0 = time.monotonic()
    plain = decontaminate(docs, ev, n=8).where(F.col("contaminated")).count()
    t_plain = time.monotonic() - t0
    t0 = time.monotonic()
    out = decontaminate_bloom(docs, ev, n=8, m=m, k=k)
    agg = out.agg(
        F.sum(F.col("bloom_candidate").cast("long")).alias("cand"),
        F.sum(F.col("contaminated").cast("long")).alias("cont"),
    ).collect()[0]
    t_bloom = time.monotonic() - t0
    t0 = time.monotonic()
    packed = decontaminate_bloom(docs, ev, n=8, m=m, k=k, packed=True)
    agg_p = packed.agg(
        F.sum(F.col("bloom_candidate").cast("long")).alias("cand"),
        F.sum(F.col("contaminated").cast("long")).alias("cont"),
    ).collect()[0]
    t_packed = time.monotonic() - t0
    assert (int(agg_p["cand"]), int(agg_p["cont"])) == (int(agg["cand"]), int(agg["cont"]))
    from polars_sim_spark.functions.text import word_shingles

    n_eval_sh = (
        ev.select(F.explode(word_shingles(F.col("text"), 8)).alias("sh")).distinct().count()
    )
    return {
        "eval_docs": ev.count(),
        "eval_distinct_shingles": n_eval_sh,
        "bloom_m_bits": m,
        "bloom_k": k,
        "plain_contaminated": plain,
        "bloom_candidates": int(agg["cand"]),
        "bloom_contaminated": int(agg["cont"]),
        "plain_sec": round(t_plain, 3),
        "bloom_row_sec": round(t_bloom, 3),
        "bloom_packed_sec": round(t_packed, 3),
        "packed_broadcast_bytes": m // 8,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="pss_r8_")
    try:
        out = {"sf_dir": sf_dir}
        if only in (None, "upsert"):
            out["upsert"] = bench_upsert(spark, sf_dir, root)
        if only in (None, "sq8"):
            out["sq8"] = bench_sq8(spark, sf_dir, root)
        if only in (None, "bloom"):
            out["bloom"] = bench_bloom(spark, sf_dir)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()


