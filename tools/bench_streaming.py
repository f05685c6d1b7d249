"""Streaming micro-bench: measured throughput + state-store size for the
stateful streaming operators (VERDICT r4 task #6 — the streaming surface
had equivalence tests but no recorded numbers).

Method: synthesize a deterministic doc corpus (10% exact duplicates; 20%
of docs carry a shared 16-word boilerplate passage), write it as 32
parquet files, then drive each operator with a file source capped at 8
files per micro-batch under ``Trigger.AvailableNow`` into a ``noop``
sink — 4 micro-batches of real state-store traffic, no driver-side
collection. Reported: end-to-end wall clock, input docs/s, and the final
progress's state rows + state memory.

Run: python tools/bench_streaming.py [n_docs]
Results recorded in BASELINE.md ("Streaming bench").
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_sim_spark.session import get_spark
from polars_sim_spark.streaming.stream_ops import (
    stream_clicks_before_error,
    stream_incremental_near_dedup,
    stream_passage_dedup,
    stream_substring_dedup,
    streaming_dedup_first_seen,
)

BOILER = " ".join(f"boiler{i}" for i in range(16))


def synth_docs(spark, n: int, seed: int = 0):
    """(doc_id, text): deterministic corpus — every 10th doc repeats its
    predecessor's text exactly; every 5th carries the shared boilerplate
    passage; the rest is hash-derived word soup."""
    cid = F.when(F.col("id") % 10 == 9, F.col("id") - 1).otherwise(F.col("id"))
    word = (
        "transform(sequence(1, 28), j -> concat('w', pmod(xxhash64(cid * 131 + j + %d), 5000)))"
        % seed
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), cid.alias("cid")
    )
    body = F.concat_ws(" ", F.expr(word))
    text = F.when(
        F.col("cid") % 5 == 0, F.concat(F.lit(BOILER + " "), body)
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def run_stream(spark, df_fn, src_schema, src_path, mode: str, wait_s: int | None = None) -> dict:
    """``wait_s`` bounds the run for TTL cases: a query holding
    ProcessingTime timers does NOT terminate under availableNow once the
    data is consumed — every TTL expiry schedules another no-data batch
    to fire the timeout callbacks, so a large keyed state drains over
    hundreds of post-data batches (observed: epoch 283 and climbing on
    the 1M-key substring state). The bench stops such a query once the
    input is through; ``state_rows_last`` (the final batch's
    numRowsTotal) shows the post-reap bound vs the in-flight max."""
    ckpt = tempfile.mkdtemp(prefix="pss_sbench_ckpt_")
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(src_path)
    )
    out = df_fn(stream)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if wait_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(wait_s):
        q.stop()
        q.awaitTermination(60)
    wall = time.time() - t0
    n_in = 0
    state_rows = 0
    state_mem = 0
    n_batches = 0
    state_last = 0
    for p in q.recentProgress:
        n_batches += 1
        n_in += p["numInputRows"]
        for so in p.get("stateOperators") or []:
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
            state_mem = max(state_mem, so.get("memoryUsedBytes", 0))
            state_last = so.get("numRowsTotal", state_last)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "wall_s": round(wall, 2),
        "input_rows": n_in,
        "rows_per_s": int(n_in / wall) if wall > 0 else 0,
        "batches": n_batches,
        "state_rows": state_rows,
        "state_rows_last": state_last,
        "state_mb": round(state_mem / 1e6, 1),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    only = sys.argv[2] if len(sys.argv) > 2 else ""  # substring filter over case names
    spark = get_spark("bench_streaming")
    src = tempfile.mkdtemp(prefix="pss_sbench_src_")
    synth_docs(spark, n).repartition(32).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    hist = synth_docs(spark, 5_000, seed=7)

    cases = [
        (
            "streaming_dedup_first_seen (exact, md5 fingerprint)",
            lambda s: streaming_dedup_first_seen(
                s.withColumn("__fp", F.md5("text")),
                key_col="__fp",
                order_col="doc_id",
            ),
            "append",
        ),
        (
            "stream_passage_dedup (16-word passages)",
            lambda s: stream_passage_dedup(
                s, id_col="doc_id", text_col="text", passage_words=16
            ),
            "append",
        ),
        (
            "stream_substring_dedup (stride-1 8-word windows)",
            lambda s: stream_substring_dedup(
                s, id_col="doc_id", text_col="text", window_words=8
            ),
            "append",
        ),
        (
            # TTL demonstration: the gate's batches take tens of seconds,
            # so a 5 s TTL reaps every key untouched since the previous
            # micro-batch — max state across batches ≈ one batch's novel
            # keys instead of the cumulative corpus (the unbounded row
            # above measures the cumulative case).
            "stream_substring_dedup (8-word windows, state_ttl_ms=5000)",
            lambda s: stream_substring_dedup(
                s, id_col="doc_id", text_col="text", window_words=8, state_ttl_ms=5000
            ),
            "append",
        ),
        (
            "stream_incremental_near_dedup (vs 5k-doc static history)",
            lambda s: stream_incremental_near_dedup(
                s,
                hist,
                stream_text_col="text",
                hist_text_col="text",
                hist_id_col="doc_id",
                min_jaccard=0.5,
            ),
            "update",
        ),
    ]
    print(f"n_docs={n} files=32 maxFilesPerTrigger=8 sink=noop")
    for name, fn, mode in cases:
        if only and only not in name:
            continue
        wait = 150 if "ttl" in name else None
        r = run_stream(spark, fn, schema, src, mode, wait_s=wait)
        print(f"{name}: {r}", flush=True)
    shutil.rmtree(src, ignore_errors=True)

    # Stream⋈stream interval join: synthetic click/error event stream,
    # both sides read from one file source (self-join of the topic).
    n_ev = n
    ev_src = tempfile.mkdtemp(prefix="pss_sbench_ev_")
    etype = (
        F.when(F.col("id") % 10 == 0, "error")
        .when(F.col("id") % 10 < 7, "click")
        .otherwise("view")
    )
    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("user_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(secs=F.col("id") / 10)).alias("ts"),
        etype.alias("event_type"),
    )
    events.repartition(32).write.mode("overwrite").parquet(ev_src)
    ev_schema = spark.read.parquet(ev_src).schema

    def ssj(stream):
        errors = stream.where(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        )
        clicks = stream.where(F.col("event_type") == "click").select("user_id", "ts")
        return stream_clicks_before_error(errors, clicks, how="inner")

    r = run_stream(spark, ssj, ev_schema, ev_src, "append")
    print(f"stream_clicks_before_error (stream-stream interval join, {n_ev} events): {r}", flush=True)
    shutil.rmtree(ev_src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
