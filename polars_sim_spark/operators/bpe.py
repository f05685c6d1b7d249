"""Distributed BPE (byte-pair encoding) fit + tokenization.

Classic Sennrich-style BPE, restructured for Spark's execution model:
the corpus-scale work happens exactly ONCE (a word-frequency
aggregation, and at the end one explode + join to count tokens per
document); every fit iteration runs over the *word-frequency table*
(vocabulary-sized — bounded by distinct words, not corpus rows), which
is the standard trick that makes BPE corpus-size-independent after the
first pass. Per round:

  1. adjacent symbol pairs are counted with a frequency-weighted
     explode + groupBy over the vocab table (one small shuffle),
  2. the argmax pair — ONE row — is collected to the driver
     (tie-break: count desc, then pair lexicographically, so the fit
     is fully deterministic),
  3. the merge is applied to every vocab word JVM-side with a
     sequential-scan ``F.aggregate`` lambda (greedy left-to-right
     non-overlapping, the reference BPE semantics),
  4. the vocab table is ``localCheckpoint``-ed so lineage stays O(1)
     across rounds (same pattern as the connected-components loop in
     operators/dedup.py).

At 100 TB: the vocab table is heavy-tailed but bounded (≈ millions of
rows ≈ tens of MB); rounds cost one vocab-sized shuffle each and the
driver only ever receives one row per round. Tokenizing the corpus is
a words-explode + vocab join + per-doc sum — no per-document Python,
no chained per-row merge application at corpus scale.

No counterpart in /root/reference (north-star LLM-pipeline surface);
semantics pinned against a pure-Python Sennrich implementation in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Pre-tokenizer: lowercase letter runs (BPE fits within-word; the
#: digit/punctuation classes of text_bpe_token_count's BPE-ish counter
#: are atomic tokens there and would be atomic here too — letters are
#: where merges live).
WORD_PATTERN = "[a-z]+"


def _apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping application of merge (a, b)
    to an array<string> of symbols, as a sequential-scan ``aggregate``:
    append each symbol unless the accumulator's last element is ``a``
    and the incoming symbol is ``b`` — then replace the last element
    with the merged symbol. ``F.get`` (0-based, null-safe) instead of
    ``element_at`` keeps the empty-accumulator probe legal under ANSI
    mode."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequency_table(
    docs: DataFrame, text_col: str = "text", word_pattern: str = WORD_PATTERN
) -> DataFrame:
    """(word, freq, syms) — the ONE corpus-scale aggregation of the fit.
    ``syms`` starts as the word's characters."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), F.lit(0))
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def bpe_fit(
    docs: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
    word_pattern: str = WORD_PATTERN,
    checkpoint_every: int = 5,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Fit ``num_merges`` BPE merges on a corpus; returns the ordered
    merge list and the final vocab table (word, freq, syms) whose
    ``syms`` reflect all merges — ready for :func:`bpe_token_counts`.

    The per-round ``.collect()`` receives exactly ONE row (the argmax
    pair) — driver-coordinated iteration in the Lloyd/k-means style,
    not a data collect. Lineage is truncated every ``checkpoint_every``
    merges rather than every round, bounding plan growth at
    ``checkpoint_every`` chained merge lambdas. (Measured at sf0.01
    the wall clock is identical either way — ~0.5 s/round of
    job-launch latency dominates, the same latency-bound profile as
    the CC loop at small scale; at real vocab sizes the shuffle is the
    cost and fewer checkpoint jobs matter.)"""
    wf = word_frequency_table(docs, text_col, word_pattern).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    last_ckpt = wf
    for round_no in range(num_merges):
        pairs = (
            wf.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        wf = wf.withColumn("syms", _apply_merge_expr(F.col("syms"), a, b))
        if (round_no + 1) % checkpoint_every == 0:
            nxt = wf.localCheckpoint(eager=True)
            last_ckpt.unpersist()
            wf = last_ckpt = nxt
    return merges, wf


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Per-document BPE token count using a fitted vocab table: explode
    words, join the vocab's per-word token count, sum per document.
    Documents with zero words keep a 0 via the left join. The vocab
    side is explicitly broadcast — it came through localCheckpoint, so
    the planner has no size stats for it (the mapInPandas lesson from
    BASELINE.md applies to checkpoints too)."""
    word_tok = vocab.select("word", F.size("syms").alias("n_tok"))
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), F.lit(0))
    per_doc = (
        docs.select(F.col(id_col), F.explode(words).alias("word"))
        .join(F.broadcast(word_tok), "word")
        .groupBy(id_col)
        .agg(F.sum("n_tok").alias("n_bpe_tokens"))
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )


def materialize_bpe_vocab(
    docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    word_pattern: str = WORD_PATTERN,
) -> list[tuple[str, str]]:
    """Fit BPE on a corpus and persist the tokenizer as a lake asset:
    the final vocab table (word, freq, syms, n_tok) under ``path`` and
    the ordered merge list under ``path/_merges`` — the BPE member of
    the persisted-index family (token postings / LSH bands / IVF cells
    / BM25 postings / IVF-PQ). A tokenizer is fit once on a corpus
    snapshot and then applied to every later batch; re-deriving it per
    run re-pays the corpus pass and (worse) silently changes token
    counts as the corpus drifts. Returns the merge list."""
    merges, vocab = bpe_fit(
        docs, text_col, num_merges=num_merges, word_pattern=word_pattern
    )
    out = vocab.withColumn("n_tok", F.size("syms"))
    out.write.mode("overwrite").parquet(path)
    spark = docs.sparkSession
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "i int, a string, b string"
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/_merges")
    return merges


def bpe_token_counts_prebuilt(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Per-document token counts against a :func:`materialize_bpe_vocab`
    asset: no fit, no merge application — one explode + broadcast vocab
    join. Words ABSENT from the stored vocab (corpus drift since the
    fit) fall back to their character count, the exact cost an
    untrained BPE assigns an unseen word before any merge applies."""
    spark = docs.sparkSession
    vocab = spark.read.parquet(path).select("word", "n_tok")
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), F.lit(0))
    per_doc = (
        docs.select(F.col(id_col), F.explode(words).alias("word"))
        .join(F.broadcast(vocab), "word", "left")
        .withColumn("__n", F.coalesce(F.col("n_tok"), F.length("word").cast("int")))
        .groupBy(id_col)
        .agg(F.sum("__n").alias("n_bpe_tokens"))
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )
