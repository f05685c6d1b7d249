"""Corpus-curation contract queries: pipelines, sampling (stratified/temperature/weighted), splits, decontamination, shard packing, quality-model scoring.

Split out of the former monolithic queries.py (round 5); the
registration registry and driver-order governance live in
``polars_sim_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from polars_sim_spark import cache as cache_registry
from polars_sim_spark.functions import text as text_fns
from polars_sim_spark.functions.text import trigram_tokens
from polars_sim_spark.operators import dedup
from polars_sim_spark.sources.tables import load_table
from polars_sim_spark.fsutil import hadoop_exists as _hx
from polars_sim_spark.queries._registry import register
from polars_sim_spark.queries._registry import DUCK_HASH
from polars_sim_spark.queries.dedup import duck_lsh_cand_ctes, duck_shingles_cte


_DECON_EVAL = "(SELECT * FROM documents WHERE doc_id < 50)"


QUALITY_MODEL_WEIGHTS: list[tuple[str, float]] = [
    ("the", -0.08), ("a", -0.06), ("and", -0.07), ("of", -0.05),
    ("to", -0.05), ("in", -0.04), ("is", -0.03), ("that", -0.03),
    ("data", 0.09), ("model", 0.10), ("learning", 0.12), ("spark", 0.11),
    ("query", 0.08), ("distributed", 0.13), ("results", 0.07),
    ("performance", 0.10), ("analysis", 0.09), ("system", 0.06),
]


QUALITY_MODEL_BIAS = 0.05


@register(
    "sample_documents_stratified",
    f"""
SELECT doc_id, lang FROM documents
WHERE ({DUCK_HASH.format(c="CAST(doc_id AS VARCHAR)")}) % 100 <
      CASE WHEN lang = 'en' THEN 10 ELSE 50 END
""",
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus curation: keep 10% of
    the dominant language (en), 50% of the rest, decided by a hash of the
    doc id — NOT an RNG. Hash-threshold sampling is reproducible across
    engines/runs/partitionings (an RNG sample is none of those), runs
    inside the scan as a plain filter, and needs no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(50))
    keep = dedup.md5_hash64(F.col("doc_id").cast("string")) % 100 < rate
    return docs.where(keep).select("doc_id", "lang")


@register(
    "split_documents_hash",
    f"""
SELECT doc_id,
       CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
             ({DUCK_HASH.format(c="CAST(doc_id AS VARCHAR) || 'r2'")}) % 1000 AS b
      FROM documents)
""",
)
def split_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split (operators/curation.py
    hash_split): label is a pure md5 function of the doc id + salt, so it
    is stable across runs/engines/partitionings and re-ingests never leak
    documents across splits. Zero-shuffle scan-level projection."""
    from polars_sim_spark.operators.curation import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id", salt="r2").select("doc_id", "split")


@register(
    "split_documents_cluster_safe",
    f"""
WITH RECURSIVE sh AS ({duck_shingles_cte('documents', 'doc_id', 'text')}),
n AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS l_id, b.id AS r_id, count(*) AS k
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
),
jac AS (
  SELECT inter.l_id, inter.r_id, CAST(k AS DOUBLE) / (na.n + nb.n - k) AS jac
  FROM inter JOIN n na ON na.id = inter.l_id JOIN n nb ON nb.id = inter.r_id
),
pairs AS (SELECT l_id, r_id FROM jac WHERE round(jac, 6) >= 0.5),
e AS (SELECT l_id AS src, r_id AS dst FROM pairs
      UNION ALL SELECT r_id AS src, l_id AS dst FROM pairs),
nodes AS (SELECT doc_id AS id FROM documents),
reach AS (
  SELECT id, id AS lab FROM nodes
  UNION
  SELECT e.dst AS id, reach.lab FROM e JOIN reach ON reach.id = e.src
),
cc AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, cluster_id,
             ({DUCK_HASH.format(c="CAST(cluster_id AS VARCHAR) || 'r11'")}) % 1000 AS b
      FROM cc)
""",
)
def split_documents_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split (round 11,
    operators/curation.py:cluster_safe_split): near-dup CLUSTERS
    (Jaccard ≥ 0.5 pairs → connected components) are the split unit, so
    two near-duplicate documents can never land on opposite sides of
    the train/test boundary — the eval-contamination guarantee a plain
    per-document hash split cannot give. The label is a pure md5
    function of the cluster minimum + salt; ONE oracle replays shingle
    Jaccard, the reachability closure, the min-label clustering AND the
    hash bucketing, so a wrong component or a drifted bucket edge is a
    hash mismatch."""
    from polars_sim_spark.operators.curation import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    postings = cache_registry.track(dedup.shingle_postings(docs, "doc_id", "text"))
    pairs = dedup.jaccard_pairs(postings, min_jaccard=0.5).select("l_id", "r_id")
    out = cluster_safe_split(docs, "doc_id", pairs, salt="r11")
    return out.select("doc_id", "cluster_id", "split")


@register(
    "curate_corpus_pipeline",
    f"""
WITH RECURSIVE fdocs AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  WHERE length(text) > 0
    AND round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / length(text), 6) >= 0.82
),
sh AS ({duck_shingles_cte('fdocs', 'doc_id', 'text')}),
n AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS l_id, b.id AS r_id, count(*) AS k
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
),
jac AS (
  SELECT inter.l_id, inter.r_id, CAST(k AS DOUBLE) / (na.n + nb.n - k) AS jac
  FROM inter JOIN n na ON na.id = inter.l_id JOIN n nb ON nb.id = inter.r_id
),
pairs AS (SELECT l_id, r_id FROM jac WHERE round(jac, 6) >= 0.5),
e AS (SELECT l_id AS src, r_id AS dst FROM pairs
      UNION ALL SELECT r_id AS src, l_id AS dst FROM pairs),
nodes AS (SELECT doc_id AS id FROM fdocs),
reach AS (
  SELECT id, id AS lab FROM nodes
  UNION
  SELECT e.dst AS id, reach.lab FROM e JOIN reach ON reach.id = e.src
),
cc AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, lang, n_chars,
       CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT f.doc_id, f.lang, f.n_chars,
         ({DUCK_HASH.format(c="CAST(f.doc_id AS VARCHAR) || 'curate'")}) % 1000 AS b
  FROM fdocs f JOIN cc ON f.doc_id = cc.doc_id
  WHERE cc.doc_id = cc.cluster_id
)
""",
)
def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline — the composition a training-data
    team actually ships, every stage an operator from this repo: quality
    filter (alpha ratio ≥ 0.82, a scan-level predicate) → near-dup
    removal (Jaccard-0.5 clusters, keep the canonical doc; EXACT
    candidate generation — the oracle twin, see
    ``curate_corpus_pipeline_lsh`` for the scale path) →
    deterministic train/val/test hash split (zero-shuffle projection).
    One DuckDB oracle checks the WHOLE pipeline end-to-end, not just the
    stages in isolation — composition bugs (filter ordering, id
    mismatches across stages) have nowhere to hide."""
    from polars_sim_spark.operators.curation import hash_split

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    alpha = F.round(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / F.length("text"),
        6,
    )
    filtered = docs.where(alpha >= 0.82)
    survivors = dedup.remove_near_dups(filtered, "doc_id", "text", min_jaccard=0.5)
    out = hash_split(survivors, "doc_id", salt="curate")
    return out.select("doc_id", "lang", "n_chars", "split")


@register(
    "curate_corpus_pipeline_lsh",
    f"""
WITH RECURSIVE fdocs AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  WHERE length(text) > 0
    AND round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / length(text), 6) >= 0.82
),
sh AS ({duck_shingles_cte('fdocs', 'doc_id', 'text')}){duck_lsh_cand_ctes(20)},
n AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS l_id, b.id AS r_id, count(*) AS k
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
),
jac AS (
  SELECT inter.l_id, inter.r_id, CAST(k AS DOUBLE) / (na.n + nb.n - k) AS jac
  FROM inter
  JOIN n na ON na.id = inter.l_id
  JOIN n nb ON nb.id = inter.r_id
  JOIN cands ON cands.l_id = inter.l_id AND cands.r_id = inter.r_id
),
pairs AS (SELECT l_id, r_id FROM jac WHERE round(jac, 6) >= 0.5),
e AS (SELECT l_id AS src, r_id AS dst FROM pairs
      UNION ALL SELECT r_id AS src, l_id AS dst FROM pairs),
nodes AS (SELECT doc_id AS id FROM fdocs),
reach AS (
  SELECT id, id AS lab FROM nodes
  UNION
  SELECT e.dst AS id, reach.lab FROM e JOIN reach ON reach.id = e.src
),
cc AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, lang, n_chars,
       CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT f.doc_id, f.lang, f.n_chars,
         ({DUCK_HASH.format(c="CAST(f.doc_id AS VARCHAR) || 'curate'")}) % 1000 AS b
  FROM fdocs f JOIN cc ON f.doc_id = cc.doc_id
  WHERE cc.doc_id = cc.cluster_id
)
""",
)
def curate_corpus_pipeline_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline with its dedup stage on the SCALE path:
    quality filter (scan-level predicate) → MinHash-LSH near-dup removal
    (banded buckets, hot-bucket cap, candidates-only verification) →
    deterministic hash split. Same end-to-end oracle discipline as
    ``curate_corpus_pipeline`` — one DuckDB query checks the whole
    composition — but the dedup plan here is the one that survives a
    100× scale-up (no all-pairs stage anywhere)."""
    from polars_sim_spark.operators.curation import hash_split

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    alpha = F.round(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / F.length("text"),
        6,
    )
    filtered = docs.where(alpha >= 0.82)
    survivors = dedup.remove_near_dups(
        filtered, "doc_id", "text", min_jaccard=0.5, use_lsh=True, max_bucket_size=20
    )
    out = hash_split(survivors, "doc_id", salt="curate")
    return out.select("doc_id", "lang", "n_chars", "split")


@register(
    "decontaminate_docs",
    f"""
WITH c AS ({duck_shingles_cte("documents", "doc_id", "text", n=8)}),
e AS (SELECT DISTINCT sh FROM ({duck_shingles_cte(_DECON_EVAL, "doc_id", "text", n=8)})),
bad AS (SELECT DISTINCT c.id AS id FROM c JOIN e USING (sh))
SELECT d.doc_id AS doc_id, (bad.id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN bad ON d.doc_id = bad.id
""",
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any 8-word
    shingle with the eval slice (doc_id < 50) are flagged.  Eval shingles
    broadcast; corpus flagged via LEFT SEMI + left join back, preserving
    cardinality."""
    from polars_sim_spark.operators.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") < 50)
    return decontaminate(docs, ev, n=8).select("doc_id", "contaminated")


@register(
    "decontaminate_docs_bloom",
    f"""
WITH e AS (SELECT DISTINCT sh FROM ({duck_shingles_cte(_DECON_EVAL, "doc_id", "text", n=8)})),
seeds AS (SELECT unnest(range(3)) AS seed),
bits AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(seed AS VARCHAR) || chr(31) || sh), 1, 8)) AS BIGINT) % 16384 AS bit
  FROM e CROSS JOIN seeds
),
c AS (SELECT DISTINCT id, sh FROM ({duck_shingles_cte("documents", "doc_id", "text", n=8)})),
csh AS (SELECT DISTINCT sh FROM c),
probe AS (
  SELECT sh,
         CAST(('0x' || substr(md5(CAST(seed AS VARCHAR) || chr(31) || sh), 1, 8)) AS BIGINT) % 16384 AS bit
  FROM csh CROSS JOIN seeds
),
maybe AS (SELECT sh FROM probe JOIN bits USING (bit) GROUP BY sh HAVING count(*) = 3),
cand AS (SELECT DISTINCT c.id AS id FROM c JOIN maybe USING (sh)),
bad AS (SELECT DISTINCT c.id AS id FROM c JOIN maybe USING (sh) JOIN e ON c.sh = e.sh)
SELECT d.doc_id AS doc_id,
       (cand.id IS NOT NULL) AS bloom_candidate,
       (bad.id IS NOT NULL) AS contaminated
FROM documents d
LEFT JOIN cand ON d.doc_id = cand.id
LEFT JOIN bad ON d.doc_id = bad.id
""",
)
def decontaminate_docs_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (operators/curation.py
    decontaminate_bloom + operators/sketches.py bloom_bits/contains):
    the eval slice's 8-gram shingles collapse to a fixed-16384-bit
    md5 Bloom filter (Bloom 1970); corpus shingles membership-test
    against the broadcast bitset and only candidates reach the exact
    confirm join. The oracle reproduces BOTH flags — the bitset, the
    k-of-k membership rule, and the confirmed contamination — pinning
    the no-false-negative guarantee (contaminated ⇒ bloom_candidate)
    and exactness (contaminated ≡ plain decontaminate, also pinned by
    pytest equality) cross-engine. The 100 TB shape: an eval set too
    big to broadcast raw still broadcasts as ≤ m sketch rows."""
    from polars_sim_spark.operators.curation import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") < 50)
    return decontaminate_bloom(docs, ev, n=8).select(
        "doc_id", "bloom_candidate", "contaminated"
    )


@register(
    "decontaminate_fraction_docs",
    f"""
WITH c AS (SELECT DISTINCT id, sh FROM ({duck_shingles_cte("documents", "doc_id", "text", n=8)})),
e AS (SELECT DISTINCT sh FROM ({duck_shingles_cte(_DECON_EVAL, "doc_id", "text", n=8)})),
per AS (
  SELECT c.id,
         CAST(count(*) AS BIGINT) AS n_sh,
         CAST(sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM c LEFT JOIN e USING (sh) GROUP BY c.id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_sh, 0) AS BIGINT) AS n_sh,
       CAST(coalesce(per.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(per.n_hit, 0) * 1000000 // greatest(coalesce(per.n_sh, 0), 1) AS BIGINT) AS frac_ppm
FROM documents d LEFT JOIN per ON per.id = d.doc_id
""",
)
def decontaminate_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured decontamination (curation.contamination_fraction): per
    document, the exact ppm fraction of its distinct 8-gram shingles
    that appear in the eval set (doc_id < 50 — the same fixture as the
    boolean rows) — what a production pipeline actually thresholds on,
    with n_sh/n_hit alongside so the report is auditable. Every value
    is an exact integer the oracle reproduces digit-for-digit."""
    from polars_sim_spark.operators.curation import contamination_fraction

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") < 50)
    return contamination_fraction(docs, ev, n=8)


@register(
    "pack_documents_shards",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
)
SELECT doc_id, n_tok,
       CAST(floor((sum(n_tok) OVER (ORDER BY part, doc_id ROWS UNBOUNDED PRECEDING) - n_tok)
                  / 2000.0) AS BIGINT) AS shard
FROM t
""",
)
def pack_documents_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (~2000 tokens/shard) via the two-level
    distributed cumulative sum in curation.pack_shards: parallel
    within-partition windows + a 16-row offset table — no global window.
    The oracle reproduces the identical assignment with one flat ORDER BY
    (part, doc_id) running sum."""
    from polars_sim_spark.operators.curation import pack_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    out = pack_shards(
        docs, id_col="doc_id", token_col="n_tok", shard_tokens=2000, num_parts=16
    )
    return out.select("doc_id", "n_tok", "shard")


@register(
    "pack_token_sequences",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
),
o AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY part, doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS s
  FROM t
),
e AS (
  SELECT doc_id, n_tok, s, s // 512 + u.i AS seq_id
  FROM o, unnest(range((s + n_tok - 1) // 512 - s // 512 + 1)) AS u(i)
)
SELECT doc_id, seq_id,
       greatest(s, seq_id*512) - s AS doc_lo,
       least(s+n_tok, (seq_id+1)*512) - s AS doc_hi,
       greatest(s, seq_id*512) - seq_id*512 AS seq_lo,
       least(s+n_tok, (seq_id+1)*512) - seq_id*512 AS seq_hi
FROM e
""",
)
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the whole corpus into 512-token
    training sequences (curation.pack_sequences): documents laid
    end-to-end in deterministic (md5-partition, doc_id) order, one
    output row per document × sequence overlap with exact token spans
    on both sides. Same two-level distributed cumsum as
    ``pack_documents_shards``; the chunk fan-out is a bounded
    sequence/explode. The oracle replays it with one flat running sum
    plus ``unnest(range(...))``."""
    from polars_sim_spark.operators.curation import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    return pack_sequences(
        docs, id_col="doc_id", token_col="n_tok", seq_len=512, num_parts=16
    )


@register(
    "pack_sequences_boundary",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
),
pp AS (
  SELECT doc_id, part, u.i AS piece,
         u.i * 512 AS doc_lo,
         least(n_tok, (u.i + 1) * 512) AS doc_hi,
         least(n_tok, (u.i + 1) * 512) - u.i * 512 AS m,
         512 // (least(n_tok, (u.i + 1) * 512) - u.i * 512) AS q
  FROM t, unnest(range((n_tok - 1) // 512 + 1)) AS u(i)
  WHERE n_tok > 0
),
ix AS (
  SELECT *, row_number() OVER (PARTITION BY q ORDER BY part, doc_id, piece) - 1 AS idx
  FROM pp
),
sh AS (SELECT *, idx // q AS shelf FROM ix),
cof AS (
  SELECT q,
         CAST(coalesce(sum((cnt + q - 1) // q) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS qoff
  FROM (SELECT q, count(*) AS cnt FROM pp GROUP BY q)
),
pos AS (
  SELECT s.*,
         CAST(coalesce(sum(m) OVER (PARTITION BY q, shelf ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS seq_lo
  FROM sh s
)
SELECT p.doc_id, CAST(p.piece AS BIGINT) AS piece,
       CAST(c.qoff + p.shelf AS BIGINT) AS seq_id,
       CAST(p.doc_lo AS BIGINT) AS doc_lo, CAST(p.doc_hi AS BIGINT) AS doc_hi,
       seq_lo, CAST(seq_lo + p.m AS BIGINT) AS seq_hi
FROM pos p JOIN cof c USING (q)
""",
)
def pack_sequences_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting packing of the corpus into 512-token
    sequences (curation.pack_sequences_boundary — harmonic shelf
    packing): no document is split below the context window (oversize
    docs chunk ONLY at exact 512 multiples), shelves never exceed 512
    by the arithmetic invariant q·m ≤ L, and the whole layout —
    chunking, per-class distributed ranks, shelf ids, within-shelf
    offsets — is exact integers the oracle replays cell-for-cell. The
    hygiene complement of ``pack_token_sequences``: that row pins the
    throughput-maximal concat-and-chunk layout, this one the
    no-cross-window-split layout a contamination-sensitive training
    run wants."""
    from polars_sim_spark.operators.curation import pack_sequences_boundary

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    return pack_sequences_boundary(
        docs, id_col="doc_id", token_col="n_tok", seq_len=512, num_parts=16
    )


@register(
    "temperature_sample_docs",
    """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
s AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.3)) AS wsum, sum(n) AS tot FROM c),
r AS (SELECT lang, least(1.0, ((tot * pow(CAST(n AS DOUBLE), 0.3)) / wsum) / n) AS q FROM c, s)
SELECT d.doc_id AS doc_id, d.lang AS lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
      < floor(q * 1000000)
""",
)
def temperature_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix temperature resampling at alpha=0.3: over-represented
    languages hash-downsample toward n^alpha shares, small ones keep all
    rows.  Rate table is |langs| rows broadcast back; decision is a pure
    md5(doc_id) threshold — deterministic in both engines."""
    from polars_sim_spark.operators.curation import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_sample(docs, group_col="lang", id_col="doc_id", alpha=0.3)
    return out.select("doc_id", "lang")


@register(
    "weighted_sample_docs",
    """
WITH w AS (
  SELECT doc_id, lang,
         round(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))
                         AS BIGINT) + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY es_key, doc_id) AS rn
  FROM w
) WHERE rn <= 30
""",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement
    (curation.weighted_sample_k): exactly 30 docs per language, chosen
    by Efraimidis-Spirakis exponential keys weighted by document length
    — deterministic md5 randomness, so the sample is a pure function of
    the corpus. One WindowGroupLimit-bounded shuffle by language."""
    from polars_sim_spark.operators.curation import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_k(
        docs, group_col="lang", weight_col="n_chars", id_col="doc_id", k=30
    ).select("doc_id", "lang")


def _duck_quality_model_sql() -> str:
    vals = ", ".join(f"('{w}', {x})" for w, x in QUALITY_MODEL_WEIGHTS)
    return f"""
WITH w(word, wt) AS (VALUES {vals}),
toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
nz AS (SELECT id, tok FROM toks WHERE tok != '')
SELECT nz.id AS doc_id,
       round(CAST(sum(COALESCE(CAST(w.wt AS DECIMAL(18,6)),
                               CAST(0 AS DECIMAL(18,6)))) AS DOUBLE)
             / count(*) + {QUALITY_MODEL_BIAS}, 6) AS score
FROM nz LEFT JOIN w ON nz.tok = w.word
GROUP BY nz.id
"""


@register("quality_model_score_docs", _duck_quality_model_sql())
def quality_model_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear bag-of-words quality-model logit per document — classifier
    inference as a broadcast-join relational plan (no UDF): the model is
    a table, the corpus text never shuffles, and the decimal-exact
    aggregation makes scores engine-reproducible."""
    from polars_sim_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(QUALITY_MODEL_WEIGHTS, "word string, w double")
    out = curation.score_linear_model(
        docs, "doc_id", "text", weights, bias=QUALITY_MODEL_BIAS
    )
    return out.withColumnRenamed("id", "doc_id")



def _doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )


def ensure_packed_sequences(spark: SparkSession, sf_dir: str) -> str:
    """Build the committed append-only packing table for ``sf_dir`` if
    absent: documents with ``doc_id % 4 != 3`` are packed first, the
    remaining quarter is APPENDED through the incremental path — so the
    committed artifact exercises ``append_packed_sequences`` end to end
    and the serving row's oracle must reproduce both segments. A
    ``_done`` marker written last keys completion."""
    from polars_sim_spark.operators.curation import (
        append_packed_sequences,
        materialize_packing,
    )
    from polars_sim_spark.queries.vectors import _index_dir
    import os as _os

    path = _index_dir(sf_dir, "packing")
    if not _hx(spark, _os.path.join(path, "_done", "_SUCCESS")):
        docs = _doc_token_counts(spark, sf_dir)
        materialize_packing(
            docs.where(F.col("doc_id") % 4 != 3),
            path,
            id_col="doc_id",
            token_col="n_tok",
            seq_len=512,
            num_parts=16,
        )
        append_packed_sequences(docs.where(F.col("doc_id") % 4 == 3), path)
        spark.createDataFrame([(1,)], "ok int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(path, "_done"))
    return path


@register(
    "pack_token_sequences_stored",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part,
         CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS grp
  FROM documents
),
btot AS (SELECT coalesce(sum(n_tok), 0) AS bt FROM t WHERE grp = 0),
o AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY grp ORDER BY part, doc_id ROWS UNBOUNDED PRECEDING)
              - n_tok + CASE WHEN grp = 1 THEN (SELECT bt FROM btot) ELSE 0 END AS BIGINT) AS s
  FROM t
),
e AS (
  SELECT doc_id, n_tok, s, s // 512 + u.i AS seq_id
  FROM o, unnest(range((s + n_tok - 1) // 512 - s // 512 + 1)) AS u(i)
)
SELECT doc_id, seq_id,
       greatest(s, seq_id*512) - s AS doc_lo,
       least(s+n_tok, (seq_id+1)*512) - s AS doc_hi,
       greatest(s, seq_id*512) - seq_id*512 AS seq_lo,
       least(s+n_tok, (seq_id+1)*512) - seq_id*512 AS seq_hi
FROM e
""",
)
def pack_token_sequences_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED append-only packing (curation.materialize_packing /
    append_packed_sequences — the index-maintenance pattern applied to
    the packing table): three quarters of the corpus packed at build
    time, the last quarter APPENDED with offsets continuing from the
    stored total, previously written span rows untouched. Serves the
    committed ``_spans`` parquet; the oracle recomputes BOTH segments
    in closed form (per-segment running sums, appended segment shifted
    by the stored total) — a repacked span, shifted offset, or broken
    boundary sequence anywhere in the build→append→serve chain is a
    driver hash mismatch."""
    import os as _os

    path = ensure_packed_sequences(spark, sf_dir)
    return spark.read.parquet(_os.path.join(path, "_spans")).select(
        "doc_id", "seq_id", "doc_lo", "doc_hi", "seq_lo", "seq_hi"
    )


def _probe_labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a deterministic binary quality label: y = 1 iff the
    hand-written teacher model's bias-free logit exceeds 0.005 (≈ the
    corpus median, so classes are balanced). The fit rows distill this
    teacher — a well-posed linear target the probe must recover."""
    from polars_sim_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    teacher = spark.createDataFrame(QUALITY_MODEL_WEIGHTS, "word string, w double")
    lab = curation.score_linear_model(docs, "doc_id", "text", teacher, bias=0.0).select(
        F.col("id").alias("doc_id"), (F.col("score") > 0.005).cast("int").alias("y")
    )
    return docs.join(lab, "doc_id")


def ensure_quality_probe(spark: SparkSession, sf_dir: str) -> str:
    """Fit and persist the committed quality-probe model for ``sf_dir``
    if absent; returns its path. Completion keys on ``_meta/_SUCCESS``
    (written last), like the ANN index layouts."""
    from polars_sim_spark.operators.classifier import materialize_quality_probe
    from polars_sim_spark.queries.vectors import _index_dir
    import os as _os

    path = _index_dir(sf_dir, "quality_lr")
    if not _hx(spark, _os.path.join(path, "_meta", "_SUCCESS")):
        materialize_quality_probe(
            _probe_labeled_docs(spark, sf_dir), "doc_id", "text", "y", path
        )
    return path


def _duck_probe_stats_sql(vocab_size: int = 128) -> str:
    """Oracle replaying the probe fit's ENTIRE distributed half — teacher
    labels, df-ranked vocabulary, exact micro-unit features (truncating
    integer division, replicable in any engine), and the X^T X / X^T y
    exact-integer cells — in plain SQL."""
    vals = ", ".join(f"('{w}', {x})" for w, x in QUALITY_MODEL_WEIGHTS)
    return f"""
WITH w(word, wt) AS (VALUES {vals}),
toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
nz AS (SELECT id, tok FROM toks WHERE tok != ''),
lab AS (
  SELECT nz.id,
         CASE WHEN round(CAST(sum(COALESCE(CAST(w.wt AS DECIMAL(18,6)),
                                           CAST(0 AS DECIMAL(18,6)))) AS DOUBLE)
                         / count(*), 6) > 0.005
              THEN 1 ELSE 0 END AS y
  FROM nz LEFT JOIN w ON nz.tok = w.word
  GROUP BY nz.id
),
cnts AS (SELECT id, tok, count(*) AS c FROM nz GROUP BY 1, 2),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS df_ FROM cnts GROUP BY tok
    ORDER BY df_ DESC, tok LIMIT {vocab_size}
  )
),
nd AS (SELECT id, count(*) AS n FROM nz GROUP BY id),
feat AS (
  SELECT c.id, c.tok, (c.c * 1000000) // n.n AS x
  FROM cnts c JOIN vocab v USING (tok) JOIN nd n ON n.id = c.id
  UNION ALL
  SELECT id, '__bias__' AS tok, CAST(1000000 AS BIGINT) AS x FROM nd
),
xtx AS (
  SELECT a.tok, b.tok AS tok2, CAST(sum(a.x * b.x) AS BIGINT) AS s
  FROM feat a JOIN feat b USING (id)
  GROUP BY 1, 2
),
xty AS (
  SELECT f.tok, '__y__' AS tok2, CAST(sum(f.x * l.y * 1000000) AS BIGINT) AS s
  FROM feat f JOIN lab l ON l.id = f.id
  GROUP BY 1
)
SELECT tok, tok2, s FROM xtx
UNION ALL
SELECT tok, tok2, s FROM xty
"""


@register("quality_probe_fit_docs", _duck_probe_stats_sql())
def quality_probe_fit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-probe FIT's distributed half as a hash-checkable
    contract (oracle-ized in round 10 per VERDICT r9 #4): teacher-label
    distillation → df-ranked vocabulary → exact micro-unit features →
    the full exact-integer X^T X / X^T y sufficient-statistic table
    (operators/classifier.py probe_sufficient_stats) that the driver-
    side ridge solve consumes. The solve itself — the only float step —
    stays pinned bit-for-bit against numpy on these SAME integers in
    tests/test_classifier.py, and its output is hash-checked end-to-end
    by quality_probe_score_stored; train accuracy (≥0.9 vs the 0.53
    majority baseline) is asserted in tests too."""
    from polars_sim_spark.operators.classifier import probe_sufficient_stats

    dl = _probe_labeled_docs(spark, sf_dir)
    return probe_sufficient_stats(dl, "doc_id", "text", "y", vocab_size=128)


def _duck_quality_probe_stored_sql() -> str:
    """Oracle for the stored-probe serving row: weights and bias come
    from the COMMITTED model parquet (read_parquet) — exactly the files
    score_with_stored_model reads — and the DECIMAL scoring plan is
    replayed cell-for-cell."""
    from polars_sim_spark.queries.vectors import _index_dir

    idx = _index_dir("sf0.01", "quality_lr")
    return f"""
WITH w AS (SELECT word, w AS wt FROM read_parquet('{idx}/_weights/*.parquet')),
toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
nz AS (SELECT id, tok FROM toks WHERE tok != '')
SELECT nz.id AS doc_id,
       round(CAST(sum(COALESCE(CAST(w.wt AS DECIMAL(18,6)),
                               CAST(0 AS DECIMAL(18,6)))) AS DOUBLE)
             / count(*)
             + (SELECT bias FROM read_parquet('{idx}/_meta/*.parquet')), 6) AS score
FROM nz LEFT JOIN w ON nz.tok = w.word
GROUP BY nz.id
"""


@register("quality_probe_score_stored", _duck_quality_probe_stored_sql())
def quality_probe_score_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED quality-probe serving (operators/classifier.py
    materialize_quality_probe / score_with_stored_model): score every
    document through the committed learned weights — the corpus is
    scored by a broadcast-join DECIMAL plan, the model is a table, and
    the oracle recomputes every score from the SAME committed parquet,
    so a drifted weight, bias, or scoring step anywhere in the
    fit→store→serve chain is a driver hash mismatch."""
    from polars_sim_spark.operators.classifier import score_with_stored_model

    path = ensure_quality_probe(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return score_with_stored_model(spark, docs, "doc_id", "text", path)


@register(
    "mix_budget_docs",
    """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tok,
         sum(n_tok) OVER (PARTITION BY lang ORDER BY part, doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS before
  FROM t
)
SELECT doc_id, lang, n_tok FROM c WHERE before < 2000
""",
)
def mix_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix token budgets: cap every language at 2000 tokens,
    kept in deterministic md5-bucket order (curation.budget_cap_per_group
    — the two-level per-group cumsum, no single-group global window).
    The oracle reproduces the identical kept set with one per-language
    windowed running sum."""
    from polars_sim_spark.operators.curation import budget_cap_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    out = budget_cap_per_group(
        docs, group_col="lang", id_col="doc_id", token_col="n_tok",
        budget=2000, num_parts=16,
    )
    return out.select("doc_id", "lang", "n_tok")


@register(
    "pack_sequences_gathered",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
),
o AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY part, doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS s
  FROM t
),
spans AS (
  SELECT doc_id,
         s // 512 + u.i AS seq_id,
         greatest(s, (s // 512 + u.i)*512) - s AS doc_lo,
         least(s+n_tok, (s // 512 + u.i + 1)*512) - s AS doc_hi,
         greatest(s, (s // 512 + u.i)*512) - (s // 512 + u.i)*512 AS seq_lo
  FROM o, unnest(range((s + n_tok - 1) // 512 - s // 512 + 1)) AS u(i)
),
toks AS (
  SELECT doc_id, CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS pos, unnest(a) AS tok
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS a FROM documents)
),
placed AS (
  SELECT sp.seq_id, sp.seq_lo + tk.pos - sp.doc_lo AS seq_pos, tk.tok
  FROM toks tk JOIN spans sp
    ON tk.doc_id = sp.doc_id AND tk.pos >= sp.doc_lo AND tk.pos < sp.doc_hi
  WHERE tk.tok != ''
)
SELECT seq_id, CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY seq_pos) AS seq_text
FROM placed GROUP BY seq_id
""",
)
def pack_sequences_gathered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end packed-sequence MATERIALIZATION
    (curation.gather_packed_sequences): the packing spans joined back to
    document text, every sequence's tokens gathered in order — actual
    512-token model inputs, not just placement metadata. One
    posexplode + equi-join with the span range in the join condition
    (each token lands in exactly one span) + one sequence-keyed shuffle
    with array_sort ordering. The oracle rebuilds every sequence string
    with an ordered string_agg — a token routed to the wrong sequence,
    offset by one, or out of order changes the text and fails the
    hash."""
    from polars_sim_spark.operators.curation import (
        gather_packed_sequences,
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    spans = pack_sequences(
        _doc_token_counts(spark, sf_dir),
        id_col="doc_id",
        token_col="n_tok",
        seq_len=512,
        num_parts=16,
    )
    return gather_packed_sequences(docs, spans, id_col="doc_id", text_col="text")


def ensure_jsonl_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write the committed JSONL ingest fixture for ``sf_dir`` if
    absent: one JSON line per document, with every ``doc_id % 50 == 7``
    line deterministically TRUNCATED (unterminated string → guaranteed
    parse failure) so the corrupt-record path is exercised by real bad
    lines, not synthetic ones."""
    from polars_sim_spark.queries.vectors import _index_dir
    import os as _os

    path = _index_dir(sf_dir, "docs_jsonl")
    if not _hx(spark, _os.path.join(path, "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        line = F.to_json(F.struct("doc_id", "text", "lang"))
        out = docs.withColumn("l", line).select(
            F.when(
                F.col("doc_id") % 50 == 7,
                F.expr("substr(l, 1, length(l) - 5)"),
            )
            .otherwise(F.col("l"))
            .alias("value")
        )
        out.coalesce(1).write.mode("overwrite").text(path)
    return path


@register(
    "ingest_jsonl_docs",
    """
SELECT doc_id, md5(text) AS text_md5, lang
FROM documents WHERE doc_id % 50 != 7
""",
)
def ingest_jsonl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSONL ingestion (sources/ingest.py:read_jsonl):
    the committed fixture carries one JSON line per document with every
    50th line deterministically truncated mid-string; PERMISSIVE parse
    with explicit corrupt-record isolation must land EXACTLY the intact
    lines in the good set — the oracle recomputes the survivors from
    the original table, so a silently dropped good line, a null-filled
    corrupt line leaking through, or a parser-behavior drift is a
    driver hash mismatch. (Corrupt-line ACCOUNTING — the bad set — is
    pinned in tests/test_ingest.py.)"""
    from polars_sim_spark.sources.ingest import read_jsonl

    path = ensure_jsonl_fixture(spark, sf_dir)
    good, _bad = read_jsonl(spark, path, "doc_id long, text string, lang string")
    return good.select("doc_id", F.md5(F.col("text")).alias("text_md5"), "lang")


@register(
    "pack_webdataset_docs",
    """
WITH t AS (
  SELECT doc_id, strlen(text) AS ob, strlen(source) AS os,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS part
  FROM documents
),
a AS (
  SELECT doc_id, ob, os,
         (row_number() OVER (ORDER BY part, doc_id) - 1) // 100 AS shard_id
  FROM t
)
SELECT shard_id, count(*) AS n_samples,
       CAST(((sum(1024 + ((ob + 511) // 512) * 512 + ((os + 511) // 512) * 512)
              + 1024 + 10239) // 10240) * 10240 AS BIGINT) AS n_bytes
FROM a GROUP BY shard_id
""",
)
def pack_webdataset_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar shards of the document corpus (100 samples/shard,
    members {doc_id}.txt + {doc_id}.src).  The engine BUILDS each archive
    in a bounded per-shard Arrow task (sources/webdataset.py); the oracle
    cannot build tars, but USTAR overhead is closed-form, so it verifies
    the manifest — shard assignment, sample counts, and the exact byte
    size of every archive — from octet lengths alone.  Byte-level tar
    correctness is pinned by tests/test_webdataset.py (tarfile read-back
    + run-to-run identity)."""
    from polars_sim_spark.sources.webdataset import pack_webdataset_shards

    docs = load_table(spark, sf_dir, "documents")
    out = pack_webdataset_shards(
        docs,
        id_col="doc_id",
        members=[("txt", "text"), ("src", "source")],
        docs_per_shard=100,
        num_parts=16,
    )
    return out.select("shard_id", "n_samples", "n_bytes")


def ensure_csv_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write the committed CSV ingest fixture for ``sf_dir`` if absent:
    one ``doc_id,lang,n_chars`` line per document, with every
    ``doc_id % 50 == 7`` line's numeric field replaced by a non-numeric
    token (guaranteed type-mismatch under PERMISSIVE parse)."""
    from polars_sim_spark.queries.vectors import _index_dir
    import os as _os

    path = _index_dir(sf_dir, "docs_csv")
    if not _hx(spark, _os.path.join(path, "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        line = F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            "lang",
            F.when(F.col("doc_id") % 50 == 7, F.lit("not_a_number")).otherwise(
                F.col("n_chars").cast("string")
            ),
        )
        docs.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(path)
    return path


@register(
    "ingest_csv_docs",
    """
SELECT doc_id, lang, n_chars
FROM documents WHERE doc_id % 50 != 7
""",
)
def ingest_csv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read CSV ingestion with corrupt-record isolation
    (sources/ingest.py:read_csv_ingest — the JSONL row's format twin):
    the committed fixture poisons every 50th line's numeric field, and
    the good set must land EXACTLY the intact lines — the oracle
    recomputes the survivors from the original table, so silently
    dropped good rows or null-filled corrupt rows are a driver hash
    mismatch."""
    from polars_sim_spark.sources.ingest import read_csv_ingest

    path = ensure_csv_fixture(spark, sf_dir)
    good, _bad = read_csv_ingest(
        spark, path, "doc_id long, lang string, n_chars long"
    )
    return good.select("doc_id", "lang", "n_chars")
