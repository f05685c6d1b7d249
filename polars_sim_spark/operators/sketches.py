"""Cardinality sketches as DETERMINISTIC column pipelines.

``approx_count_distinct`` (Spark) and ``approx_count_distinct``
(DuckDB) are different HLL implementations with different hashes — an
oracle can never check one against the other. This module implements
HyperLogLog (Flajolet et al. 2007, public literature) as a pure
function of the data using the repo's engine-portable md5 hash, so the
SAME estimate — to the last rounded digit — is computable in any SQL
engine: the contract query's DuckDB oracle reproduces the Spark
estimate exactly, and the ESTIMATOR itself (not just the plumbing)
is under the correctness gate. Accuracy vs exact distinct counts is
pinned separately in tests (the usual ~1.04/√m relative error).

Determinism details worth copying:

* register index and remainder come from integer arithmetic on the
  32-bit md5 prefix (``md5_hash64``), never engine hash functions;
* rho (leading-zero rank) is computed via ``length(bin(x))`` — string
  length of the minimal binary rendering, identical in Spark and
  DuckDB — not floating log2, whose boundary behavior differs;
* the harmonic sum Σ 2^−M is scaled by 2^25 and summed as an EXACT
  BIGINT (every term is a dyadic rational, and max rho = 25), so no
  float-addition-order divergence can flip a digit; the only floating
  steps are one multiply, one divide, and (in the small-range branch)
  one ``ln`` — rounded to 4 decimals at the edge.

Scale: the whole sketch is one groupBy (group, register) max + one
groupBy (group) sum — two map-side-combining aggregates over narrow
rows; registers-per-group is fixed (m), so sketch state is O(groups·m)
regardless of corpus size, the same bound the built-in HLL has. The
32-bit hash caps reliable range around ~10^8 distinct values; swap the
hash width before the large-range-correction regime matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: HLL bias constant for m=256, embedded as the SAME literal in the
#: DuckDB oracle (queries/events.py) — compute once, paste everywhere.
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)  # 0.7182725932495458
#: m² · 2^25 — the exact-integer scaling of the harmonic sum.
HLL_SCALE = HLL_M * HLL_M * (1 << 25)  # 2199023255552


def hll_distinct(
    df: DataFrame,
    group_col: str | list[str],
    value_col: str,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (m=256 registers):
    (group…, hll_distinct double) with the estimate rounded to 4
    decimals. ``group_col`` may be one column name or a list (e.g.
    (window, key) for the streaming twin's batch oracle). Deterministic
    and engine-portable — see module docstring.
    """
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    return hll_estimate_from_registers(
        hll_registers(df, group_col, value_col), gcols
    )


def hll_registers(
    df: DataFrame,
    group_col: str | list[str],
    value_col: str,
) -> DataFrame:
    """The sketch STATE: one row per (group…, register) with the max
    rho — the storable/mergeable form. At 100 TB this table (not the
    raw data) is what a serving layer persists per shard/day: register
    tables MERGE by groupBy-max (:func:`hll_merge`) with no corpus
    rescan, because max is associative/commutative/idempotent — the
    estimate of the merged sketch EQUALS the estimate over the union
    of the raw data, by construction, not approximation (pinned
    cross-engine by the ``events_hll_users_sharded`` contract row)."""
    from polars_sim_spark.operators.dedup import md5_hash64

    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    h = md5_hash64(F.col(value_col).cast("string"))
    bucket = F.pmod(h, F.lit(HLL_M))
    rem = F.floor(h / F.lit(HLL_M))
    rho = F.when(rem == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.bin(rem))
    )
    return (
        df.select(*[F.col(g) for g in gcols], bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*gcols, "__b")
        .agg(F.max("__rho").alias("__M"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL register tables (same grouping/register schema):
    union + groupBy max. One narrow shuffle over O(shards·groups·m)
    SKETCH rows — never the data."""
    import functools

    merged = functools.reduce(lambda a, b: a.unionByName(b), register_tables)
    gcols = [c for c in merged.columns if c not in ("__M",)]
    return merged.groupBy(*gcols).agg(F.max("__M").alias("__M"))


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str | list[str]
) -> DataFrame:
    """Finalize register rows into the rounded estimate — the same
    expression whether the registers came from one pass
    (:func:`hll_registers`) or a merge of stored shards."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    per_group = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.pow(F.lit(2.0), F.lit(25) - F.col("__M")).cast("long")).alias("__s"),
    )
    int_sum = F.col("__s") + (F.lit(HLL_M) - F.col("__present")) * F.lit(1 << 25)
    e_raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_SCALE)) / int_sum
    v_zero = F.lit(HLL_M) - F.col("__present")
    small = (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0)
    est = F.when(
        small, F.lit(HLL_M) * F.log(F.lit(float(HLL_M)) / v_zero)
    ).otherwise(e_raw)
    return per_group.select(
        *[F.col(g) for g in gcols], F.round(est, 4).alias("hll_distinct")
    )


#: Count-min geometry: d hash rows × w counters. Seeds are small
#: integers mixed into the md5 input so every row is an independent
#: deterministic hash — the same strings hash identically in any
#: engine.
CMS_D = 4
CMS_W = 256


def cms_counters(
    df: DataFrame,
    group_col: str | None,
    value_col: str,
) -> DataFrame:
    """Build count-min counters: one row per (seed, col[, group]) with
    the collision-summed count — fixed O(d·w) state per group at ANY
    corpus size (the whole point: a frequency table over an unbounded
    value domain in bounded memory). One map-side-combining aggregate.
    """
    from polars_sim_spark.operators.dedup import md5_hash64

    seeds = F.explode(F.array(*[F.lit(s) for s in range(CMS_D)])).alias("seed")
    keys = ([F.col(group_col)] if group_col else []) + [F.col(value_col).cast("string").alias("__val")]
    rows = df.select(*keys).select("*", seeds)
    col = F.pmod(
        md5_hash64(F.concat_ws("\x1f", F.col("seed").cast("string"), F.col("__val"))),
        F.lit(CMS_W),
    )
    gcols = ([group_col] if group_col else []) + ["seed"]
    return (
        rows.withColumn("__c", col)
        .groupBy(*gcols, "__c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float,
    group_col: str | None = None,
) -> DataFrame:
    """Heavy hitters through the count-min sketch: every value whose
    CMS estimate is ≥ ``phi`` of its group's row count, with the
    estimate attached. Classic guarantee (testable): NO FALSE
    NEGATIVES — a true φ-heavy value always survives because the
    estimate never under-counts; false positives are bounded by the
    collision mass (~N/w per counter row), so the output is the small
    candidate superset a second exact pass confirms when exactness
    matters. Deterministic end to end (md5 counters + integer
    thresholds), so the DuckDB oracle reproduces the exact member set
    and estimates.

    Scale: counters are the fixed O(groups·d·w) sketch; candidates are
    a map-side-combined distinct over the value column; thresholds come
    from one broadcast per-group total. The real 100 TB shape serves
    candidates against ALREADY-BUILT counters (the streaming twin
    ``stream_cms_counters`` maintains them per window) without
    rescanning the corpus — this one-shot form exists for the
    correctness gate."""
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    gsel = [F.col(group_col)] if group_col else []
    counters = cms_counters(df, group_col, value_col)
    cand = df.select(*gsel, F.col(value_col)).distinct()
    est = cms_estimate(counters, cand, value_col, group_col)
    totals = df.groupBy(*gsel).agg(F.count(F.lit(1)).alias("__N"))
    joined = (
        est.join(F.broadcast(totals), group_col, "inner")
        if group_col
        else est.crossJoin(F.broadcast(totals))
    )
    return joined.where(
        F.col("cms_count") >= F.ceil(F.lit(phi) * F.col("__N"))
    ).drop("__N")


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    item_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Point-query the sketch: for each candidate item (and group), the
    count-min estimate = min over the d rows of that item's counter.
    Guarantees (classic, and structurally testable): estimate ≥ true
    count always; overestimate bounded by collision mass ~N/w per row.
    The counter table is O(groups·d·w) rows — broadcast; estimating a
    candidate list never rescans the corpus."""
    from polars_sim_spark.operators.dedup import md5_hash64

    seeds = F.explode(F.array(*[F.lit(s) for s in range(CMS_D)])).alias("seed")
    probe = items.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.col(item_col).cast("string").alias("__val"),
    ).select("*", seeds)
    probe = probe.withColumn(
        "__c",
        F.pmod(
            md5_hash64(F.concat_ws("\x1f", F.col("seed").cast("string"), F.col("__val"))),
            F.lit(CMS_W),
        ),
    )
    join_keys = ([group_col] if group_col else []) + ["seed", "__c"]
    est = (
        probe.join(F.broadcast(counters), join_keys, "left")
        .withColumn("__cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*(([group_col] if group_col else []) + ["__val"]))
        .agg(F.min("__cnt").alias("cms_count"))
    )
    return est.withColumnRenamed("__val", item_col)


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    phi: float,
    group_col: str | None = None,
) -> DataFrame:
    """EXACT φ-heavy hitters via the sketch's two-pass shape: the CMS
    candidate superset (``cms_heavy_hitters`` — no false negatives, so
    no true heavy hitter can be missing from it) semi-join-filters the
    corpus, and one exact map-side-combining count over the survivors
    confirms against the integer threshold. Output
    ``(group…, value, exact_count)`` — by the no-false-negative
    guarantee this EQUALS a plain exact GROUP BY/HAVING over the whole
    corpus, which is precisely what the contract row's oracle runs: a
    dropped true heavy hitter anywhere in the sketch→candidates→confirm
    chain would surface as a driver hash mismatch.

    Scale: pass 1 is the fixed O(groups·d·w) sketch + a distinct over
    values; pass 2 scans the corpus once more but aggregates ONLY the
    ≤ ~1/φ-per-group candidate keys (broadcast semi join, no skew —
    the hot keys are exactly the ones kept, and the combiner collapses
    them map-side). At 100 TB the second pass is the price of exactness;
    serving layers that can live with ε·N overestimates skip it and use
    ``cms_heavy_hitters`` alone."""
    gsel = [F.col(group_col)] if group_col else []
    gnames = [group_col] if group_col else []
    cand = cms_heavy_hitters(df, value_col, phi, group_col).select(
        *gsel, F.col(value_col)
    )
    keys = gnames + [value_col]
    exact = (
        df.join(F.broadcast(cand), keys, "left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    totals = df.groupBy(*gsel).agg(F.count(F.lit(1)).alias("__N"))
    joined = (
        exact.join(F.broadcast(totals), gnames, "inner")
        if group_col
        else exact.crossJoin(F.broadcast(totals))
    )
    return joined.where(
        F.col("exact_count") >= F.ceil(F.lit(phi) * F.col("__N"))
    ).drop("__N")


#: Default sample size for the quantile sketch: rank error is
#: ~sqrt(q(1-q)/s) per quantile (≈3% at the median for s=256), the
#: classic bottom-k/uniform-sample bound — pinned empirically in
#: tests/test_sketches.py.
QSK_S = 256


def quantile_sketch(
    df: DataFrame,
    group_col: str | list[str],
    value_col: str,
    key_col: str,
    probs: list[float],
    *,
    s: int = QSK_S,
) -> DataFrame:
    """Bounded-state per-group quantile ESTIMATES — the third sketch of
    the family (HLL: cardinality, CMS: frequency, this: rank), built
    under the same constraint as the other two: the estimate must be a
    deterministic, order-independent pure function of the data multiset
    so any SQL engine reproduces it digit-for-digit and the contract
    row's DuckDB oracle checks the ESTIMATOR, not just the plumbing.

    Classic KLL/GK compaction is stream-ORDER-dependent (which items a
    compactor merges depends on arrival order) — two engines, or two
    shuffle schedules, would legitimately disagree. The deterministic
    replacement is hash-rank sampling, KLL's sampler run on md5: each
    row's ``key_col`` hash is its fixed position in a global random
    permutation, the sketch keeps the s hash-smallest rows per group
    (bottom-k = a uniform s-sample without replacement), and quantiles
    interpolate over the sample exactly as the exact operator would —
    rank error O(sqrt(q(1-q)/s)), the standard sample-quantile bound.

    Scale posture (the gap events_value_quantiles documents): exact
    percentiles co-locate every group value; here each task keeps only
    its s hash-smallest rows per group BEFORE the exchange (the window
    plans as a partial WindowGroupLimit map-side, asserted in
    tests/test_plans.py), so the shuffle moves O(tasks·s) rows per
    group and sketch state is O(groups·s) at any corpus size. Sketches
    merge: bottom-k of a union = bottom-k of the parts' bottom-k, the
    same property the partial group-limit exploits."""
    from polars_sim_spark.operators.dedup import md5_hash64
    from pyspark.sql import Window

    gnames = [group_col] if isinstance(group_col, str) else list(group_col)
    h = md5_hash64(F.col(key_col).cast("string"))
    # value_col is the FINAL tiebreaker: if key_col is not unique per row,
    # rows tied on (hash, key) but carrying different values would make
    # the kept sample shuffle-order-dependent; ordering by value last
    # keeps the sample (and thus the served quantiles) a pure function of
    # the data multiset even under duplicate keys.
    w = (
        Window.partitionBy(*gnames)
        .orderBy(F.col("__h"), F.col(key_col), F.col(value_col))
    )
    kept = (
        df.select(*gnames, F.col(value_col), F.col(key_col), h.alias("__h"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= s)
    )
    return kept.groupBy(*gnames).agg(
        *[
            F.round(
                F.percentile(F.col(value_col).cast("double"), F.lit(p)), 6
            ).alias(f"p{str(p).replace('0.', '').ljust(2, '0')}")
            for p in probs
        ]
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Merge count-min counter tables (same grouping/seed/column
    schema): union + groupBy sum — counts are additive, so the merged
    sketch equals the sketch of the unioned data exactly. Like
    :func:`hll_merge`, the shuffle is over O(shards·groups·d·w) sketch
    rows, never the corpus."""
    import functools

    merged = functools.reduce(lambda a, b: a.unionByName(b), counter_tables)
    gcols = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*gcols).agg(F.sum("cnt").alias("cnt"))


def materialize_hll_shards(
    df: DataFrame,
    path: str,
    group_col: str | list[str],
    value_col: str,
    shard: str,
) -> None:
    """Persist an HLL register table as one hive shard partition
    (``path/shard=<shard>/``) — the lake form of the sketch: a daily
    ingest appends ONE new shard of O(groups·m) register rows
    (:func:`append_hll_shard`), and estimates are served by merging the
    stored shards (:func:`hll_estimate_stored`) without ever rescanning
    a previous day's corpus. The incremental-maintenance pattern of
    append_history_bands (LSH) and append_to_ivfpq_index (ANN), applied
    to the sketch family."""
    regs = hll_registers(df, group_col, value_col).withColumn("shard", F.lit(shard))
    (
        regs.repartition(1)
        .write.mode("append")
        .partitionBy("shard")
        .parquet(path.rstrip("/"))
    )


#: Appending a shard IS materializing one — same write, same layout.
append_hll_shard = materialize_hll_shards


def hll_estimate_stored(spark, path: str, group_col: str | list[str]) -> DataFrame:
    """Serve distinct-count estimates from the stored shard registers:
    read the sketch rows (O(shards·groups·m) — never the data), merge
    by max, finalize. Equal to the single-pass estimate over the union
    corpus by merge-equivalence (tested)."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    regs = spark.read.parquet(path.rstrip("/")).drop("shard")
    return hll_estimate_from_registers(hll_merge(regs), gcols)


#: Bloom filter defaults, sized for the decontamination contract query:
#: at sf0.01 the eval slice has ~2.3k distinct shingles → fill ratio
#: ~0.34, false-positive rate ~4% — large enough that the exact-confirm
#: pass is genuinely exercised by the testdata, small enough that the
#: prefilter still cuts the candidate set an order of magnitude. The
#: SAME literals are embedded in the DuckDB oracle.
BLOOM_M = 16384
BLOOM_K = 3


def bloom_bits(df: DataFrame, value_col: str, *, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Build a Bloom filter (Bloom 1970, public literature) over the
    distinct values of ``value_col`` as a SPARSE bitset table:
    one row per set bit, column ``bit`` (0 ≤ bit < m). Bit positions
    are ``md5(seed ␟ value) mod m`` for seeds 0..k−1 — the repo's
    engine-portable hash, so any SQL engine reproduces the identical
    bitset (the contract row's DuckDB oracle does).

    The sparse-row form is the storable/mergeable state, like
    :func:`hll_registers` and :func:`cms_counters`: shards MERGE by
    union-distinct (:func:`bloom_merge`) — set-bit union is exactly
    the Bloom filter of the unioned data, no approximation. At most m
    rows regardless of input size; always broadcastable. That is the
    100 TB point: an eval/contamination set too large to broadcast raw
    collapses to a fixed-m bitset every executor can hold.
    """
    from polars_sim_spark.operators.dedup import md5_hash64

    seeds = F.explode(F.array(*[F.lit(s) for s in range(k)])).alias("seed")
    rows = df.select(F.col(value_col).cast("string").alias("__val")).distinct().select("*", seeds)
    bit = F.pmod(
        md5_hash64(F.concat_ws("\x1f", F.col("seed").cast("string"), F.col("__val"))),
        F.lit(m),
    )
    return rows.select(bit.alias("bit")).distinct()


def bloom_merge(*bit_tables: DataFrame) -> DataFrame:
    """Merge Bloom bitsets: union-distinct of set bits — the merged
    filter EQUALS the filter built over the unioned values (bit union
    is associative/commutative/idempotent), so shard-built filters
    compose without rescans, like :func:`hll_merge`/:func:`cms_merge`."""
    import functools

    return functools.reduce(lambda a, b: a.unionByName(b), bit_tables).distinct()


def bloom_contains(
    bits: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test against a built filter: returns the DISTINCT
    values of ``items.item_col`` with ``bloom_maybe`` — TRUE iff all k
    bit positions are set. Classic guarantee (testable): NO FALSE
    NEGATIVES — every value that was inserted answers TRUE; false
    positives occur at the fill-ratio^k rate and are removed by the
    caller's exact confirm pass when exactness matters
    (:func:`polars_sim_spark.operators.curation.decontaminate_bloom`).

    Shape: probe rows explode to k (value, bit) rows, LEFT join the
    broadcast bitset (≤ m rows), and a map-side-combining count checks
    hits == k. The corpus side never shuffles on data size — only on
    its own distinct-value count."""
    from polars_sim_spark.operators.dedup import md5_hash64

    seeds = F.explode(F.array(*[F.lit(s) for s in range(k)])).alias("seed")
    probe = (
        items.select(F.col(item_col).cast("string").alias("__val"))
        .distinct()
        .select("*", seeds)
    )
    probe = probe.withColumn(
        "bit",
        F.pmod(
            md5_hash64(F.concat_ws("\x1f", F.col("seed").cast("string"), F.col("__val"))),
            F.lit(m),
        ),
    )
    hit = F.broadcast(bits.withColumn("__hit", F.lit(1)))
    return (
        probe.join(hit, "bit", "left")
        .groupBy("__val")
        .agg((F.sum(F.coalesce(F.col("__hit"), F.lit(0))) == F.lit(k)).alias("bloom_maybe"))
        .withColumnRenamed("__val", item_col)
    )


def bloom_contains_packed(
    bits: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Kernel twin of :func:`bloom_contains` (same contract, pinned
    equal in tests/test_sketches.py): the sparse bit rows collapse into
    a PACKED numpy bitset of m/8 bytes — 2^21 bits = 256 KB, ~10×
    smaller than the row-form broadcast — shipped once as a broadcast
    variable, and membership is evaluated in Arrow batches via
    mapInPandas with zero joins and zero shuffle on the probe side.
    This is the row-form/kernel pairing the repo uses wherever a
    table-of-constants is hot (join_sim kernel, PQ LUT): the
    declarative form stays the oracle-checkable default; the packed
    form is the broadcast-size escape hatch at large m. Hashes are the
    same md5 arithmetic (``int(md5('seed␟val').hexdigest()[:8], 16)
    mod m``), so the two forms agree bit-for-bit."""
    import numpy as np

    vals = bits.select("bit").toPandas()["bit"].to_numpy()
    packed = np.zeros(m, dtype=bool)
    packed[vals] = True
    packed = np.packbits(packed)  # m/8 bytes
    spark = items.sparkSession
    bc = spark.sparkContext.broadcast(packed)
    out_schema = f"{item_col} string, bloom_maybe boolean"

    def _probe(batches):
        import hashlib

        import pandas as pd

        arr = bc.value
        for pdf in batches:
            vals = pdf[item_col].astype(str)
            ok = []
            for v in vals:
                hit = True
                for s in range(k):
                    h = int(
                        hashlib.md5(f"{s}\x1f{v}".encode()).hexdigest()[:8], 16
                    ) % m
                    if not (arr[h >> 3] >> (7 - (h & 7))) & 1:
                        hit = False
                        break
                ok.append(hit)
            yield pd.DataFrame({item_col: vals, "bloom_maybe": ok})

    probe = items.select(F.col(item_col).cast("string").alias(item_col)).distinct()
    return probe.mapInPandas(_probe, out_schema)


def materialize_cms_shards(
    df: DataFrame,
    path: str,
    group_col: str | None,
    value_col: str,
    shard: str,
) -> None:
    """Persist count-min counters as one hive shard partition — the
    additive twin of :func:`materialize_hll_shards`: a daily ingest
    appends ONE shard of O(groups·d·w) counter rows, and point queries
    are served by summing stored shards (:func:`cms_estimate_stored`)
    with no corpus rescan. Replayed shards DOUBLE counts (sums are not
    idempotent, unlike HLL max) — pair with exactly-once batch ids or
    overwrite-by-shard, stated honestly."""
    cnt = cms_counters(df, group_col, value_col).withColumn("shard", F.lit(shard))
    cnt.repartition(1).write.mode("append").partitionBy("shard").parquet(path.rstrip("/"))


#: Appending a CMS shard IS materializing one — same write, same layout.
append_cms_shard = materialize_cms_shards


def cms_estimate_stored(
    spark,
    path: str,
    items: DataFrame,
    item_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Serve count-min point queries from stored shard counters: read
    the sketch rows (never the data), merge by sum, estimate. Equal to
    the single-pass estimate over the union corpus because counter
    addition is exact (tested)."""
    counters = spark.read.parquet(path.rstrip("/")).drop("shard")
    return cms_estimate(cms_merge(counters), items, item_col, group_col)


def materialize_bloom_shard(
    df: DataFrame,
    path: str,
    value_col: str,
    shard: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> None:
    """Persist a Bloom bitset as one hive shard partition — membership's
    entry in the stored-sketch family. Set-bit union is idempotent, so
    replayed shards are harmless (same posture as HLL max-merge)."""
    bits = bloom_bits(df, value_col, m=m, k=k).withColumn("shard", F.lit(shard))
    bits.repartition(1).write.mode("append").partitionBy("shard").parquet(path.rstrip("/"))


#: Appending a bloom shard IS materializing one.
append_bloom_shard = materialize_bloom_shard


def bloom_contains_stored(
    spark,
    path: str,
    items: DataFrame,
    item_col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test against stored shard bitsets: union-distinct the
    stored bits (≤ m rows regardless of shard count) and probe. Equal
    to a filter built over the union of all shards' values, exactly
    (bit union is the Bloom of the union — tested)."""
    bits = spark.read.parquet(path.rstrip("/")).select("bit").distinct()
    return bloom_contains(bits, items, item_col, m=m, k=k)
