"""Cache lifecycle: operators persist intermediates whose blocks must
outlive the call (the returned frame's lineage references them), so the
package routes every such persist through the session-scoped registry
(`polars_sim_spark/cache.py`) and `unpersist_all()` releases them.
Without this, a long-lived session leaks storage memory on every
join_sim / dedup-query call."""

from __future__ import annotations

from pyspark.sql import functions as F

import polars_sim_spark as pss
from polars_sim_spark import cache as cache_registry
from polars_sim_spark.operators import dedup


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_join_sim_caches_released_by_unpersist_all(spark, sf_small):
    # Start from a clean slate so leftovers from other tests don't mask
    # (or fake) a leak.
    cache_registry.unpersist_all(blocking=True)
    # Baseline, not zero: localCheckpoint blocks from other tests in the
    # shared session linger until GC and are outside this contract.
    baseline = _persistent_rdd_count(spark)

    part = spark.read.parquet(f"{sf_small}/part.parquet")
    # No ids supplied → join_sim caches both generated-id frames; the
    # distinct path caches the per-side distinct-string frames too.
    out = pss.join_sim(part, part.select("p_name"), on="p_name", top_n=2)
    n = out.count()
    assert n > 0
    assert _persistent_rdd_count(spark) > baseline, "expected tracked caches while in use"

    released = cache_registry.unpersist_all(blocking=True)
    assert released > 0
    assert _persistent_rdd_count(spark) <= baseline

    # Results stay valid after release — lineage recomputes.
    assert out.count() == n


def test_lsh_dedup_pairs_caches_released(spark, sf_small):
    cache_registry.unpersist_all(blocking=True)
    baseline = _persistent_rdd_count(spark)

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pairs = dedup.minhash_lsh_dedup_pairs(docs, "doc_id", "text", min_jaccard=0.5)
    pairs.count()
    assert _persistent_rdd_count(spark) > baseline

    cache_registry.unpersist_all(blocking=True)
    assert _persistent_rdd_count(spark) <= baseline


def test_remove_near_dups_does_not_leak(spark, sf_small):
    # remove_near_dups unpersists inline (localCheckpoint severs the
    # postings lineage), so it must leave nothing behind on its own —
    # localCheckpoint blocks are released when the frames are GC'd, so
    # only the tracked-persist count matters here.
    cache_registry.unpersist_all(blocking=True)
    before = len(cache_registry._TRACKED)
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(100)
    out = dedup.remove_near_dups(docs, "doc_id", "text", min_jaccard=0.5)
    out.count()
    assert len(cache_registry._TRACKED) == before
