"""Similarity-join contract queries (the reference's core surface): join_sim variants, normalization, trigram tokens.

Split out of the former monolithic queries.py (round 5); the
registration registry and driver-order governance live in
``polars_sim_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from polars_sim_spark import cache as cache_registry
from polars_sim_spark.functions import text as text_fns
from polars_sim_spark.functions.text import normalize_string_col, trigram_tokens
from polars_sim_spark.operators.join_sim import similarity_mapping
from polars_sim_spark.sources.tables import load_table
from polars_sim_spark.queries._registry import register


def duck_trigrams_cte(table: str, id_col: str, str_col: str, normalize: bool = False) -> str:
    """Distinct in-vocab trigram postings ``(id, tok)`` — the oracle twin of
    functions.text.trigram_tokens (semantics: SURVEY.md §1.4)."""
    s = f"lower(regexp_replace({str_col}, '[^a-zA-Z0-9]', '', 'g'))" if normalize else str_col
    return f"""
  SELECT id, unnest(toks) AS tok FROM (
    SELECT {id_col} AS id,
           list_distinct([g FOR g IN
             [substr(s, CAST(i AS INT), 3) FOR i IN range(1, greatest(length(s) - 2, 0) + 1)]
             IF regexp_matches(g, '^[a-z]{{3}}$')]) AS toks
    FROM (SELECT {id_col}, {s} AS s FROM {table})
  )"""


def duck_join_sim_sql(
    table: str,
    id_col: str,
    str_col: str,
    top_n: int,
    normalization: str = "l2",
    normalize_words: bool = False,
) -> str:
    sim_expr = (
        "CAST(overlap AS DOUBLE) / (sqrt(ca.n) * sqrt(cb.n))"
        if normalization == "l2"
        else "CAST(overlap AS DOUBLE)"
    )
    return f"""
WITH tok AS ({duck_trigrams_cte(table, id_col, str_col, normalize_words)}),
cnt AS (SELECT id, count(*) AS n FROM tok GROUP BY id),
ov AS (
  SELECT a.id AS l_id, b.id AS r_id, count(*) AS overlap
  FROM tok a JOIN tok b USING (tok)
  GROUP BY 1, 2
),
sim AS (
  SELECT l_id, r_id, {sim_expr} AS sim
  FROM ov JOIN cnt ca ON ca.id = l_id JOIN cnt cb ON cb.id = r_id
)
SELECT l_id, r_id, round(sim, 6) AS sim_r
FROM (SELECT *, row_number() OVER (PARTITION BY l_id ORDER BY sim DESC, r_id) AS rn FROM sim)
WHERE rn <= {top_n}
"""


def _self_join_sim(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    id_col: str,
    str_col: str,
    top_n: int,
    normalization: str = "l2",
    normalize_words: bool = False,
    weighting: str = "binary",
) -> DataFrame:
    df = load_table(spark, sf_dir, table)
    left = df.select(F.col(id_col).alias("l_id"), F.col(str_col).alias("__s"))
    right = df.select(F.col(id_col).alias("r_id"), F.col(str_col).alias("__s"))
    m = similarity_mapping(
        left,
        right,
        left_on="__s",
        right_on="__s",
        top_n=top_n,
        normalization=normalization,
        apply_word_normalization=normalize_words,
        left_id="l_id",
        right_id="r_id",
        weighting=weighting,
    )
    return m.select("l_id", "r_id", F.round("sim", 6).alias("sim_r"))


def duck_join_sim_tfidf_sql(table: str, id_col: str, str_col: str, top_n: int) -> str:
    """Oracle twin of the TF-IDF-weighted l2 similarity self-join: smoothed
    IDF (ln((1+N)/(1+df)) + 1) in exact micro-units over the table's
    DISTINCT key strings, dot/norms as exact integer sums of squared
    weights — the same deterministic arithmetic operators/join_sim.py
    executes, so values hash-match bit-for-bit."""
    return f"""
WITH tok AS ({duck_trigrams_cte(table, id_col, str_col)}),
base AS (
  SELECT s, list_distinct([g FOR g IN
    [substr(s, CAST(i AS INT), 3) FOR i IN range(1, greatest(length(s) - 2, 0) + 1)]
    IF regexp_matches(g, '^[a-z]{{3}}$')]) AS toks
  FROM (SELECT DISTINCT {str_col} AS s FROM {table} WHERE {str_col} IS NOT NULL)
),
nz AS (SELECT * FROM base WHERE len(toks) > 0),
nn AS (SELECT count(*) AS n FROM nz),
ndf AS (
  SELECT tok, count(*) AS df
  FROM (SELECT s, unnest(toks) AS tok FROM nz) GROUP BY tok
),
w AS (
  SELECT tok,
         CAST(round((ln(CAST(1 + nn.n AS DOUBLE) / (1.0 + CAST(df AS DOUBLE))) + 1.0)
                    * 1000000.0, 0) AS BIGINT) AS wu
  FROM ndf, nn
),
wt AS (SELECT t.id, t.tok, w.wu * w.wu AS w2 FROM tok t JOIN w USING (tok)),
norm AS (SELECT id, sum(w2) AS n2 FROM wt GROUP BY id),
ov AS (
  SELECT a.id AS l_id, b.id AS r_id, sum(a.w2) AS dot
  FROM wt a JOIN wt b USING (tok)
  GROUP BY 1, 2
),
sim AS (
  SELECT l_id, r_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS sim
  FROM ov JOIN norm na ON na.id = l_id JOIN norm nb ON nb.id = r_id
)
SELECT l_id, r_id, round(sim, 6) AS sim_r
FROM (SELECT *, row_number() OVER (PARTITION BY l_id ORDER BY sim DESC, r_id) AS rn FROM sim)
WHERE rn <= {top_n}
"""


@register(
    "join_sim_parts_l2",
    duck_join_sim_sql("part", "p_partkey", "p_name", top_n=3, normalization="l2"),
)
def join_sim_parts_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: for each part, top-3 most similarly-named parts (cosine)."""
    return _self_join_sim(spark, sf_dir, "part", "p_partkey", "p_name", top_n=3)


@register(
    "join_sim_parts_count",
    duck_join_sim_sql("part", "p_partkey", "p_name", top_n=5, normalization="count"),
)
def join_sim_parts_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count-normalization mode: sim = raw trigram overlap (reference join.py:54-59)."""
    return _self_join_sim(
        spark, sf_dir, "part", "p_partkey", "p_name", top_n=5, normalization="count"
    )


@register(
    "join_sim_parts_tfidf",
    duck_join_sim_tfidf_sql("part", "p_partkey", "p_name", top_n=3),
)
def join_sim_parts_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted similarity self-join — the reference's own declared
    roadmap (the ``// TODO: eventually we could use tfidf`` above the
    binary-weight choice, src/cossim.rs:45-48): for each part, the top-3
    most similarly-named parts under smoothed-IDF trigram weights fitted
    over the distinct part names (operators/join_sim.py:build_idf_weights),
    in exact micro-units so the oracle reproduces every bit."""
    return _self_join_sim(
        spark, sf_dir, "part", "p_partkey", "p_name", top_n=3, weighting="tfidf"
    )


@register(
    "join_sim_suppliers_normalized",
    duck_join_sim_sql(
        "supplier", "s_suppkey", "s_name", top_n=3, normalization="l2", normalize_words=True
    ),
)
def join_sim_suppliers_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_word_normalization path (reference join.py:61-66,126-130)."""
    return _self_join_sim(
        spark, sf_dir, "supplier", "s_suppkey", "s_name", top_n=3, normalize_words=True
    )


@register(
    "normalize_part_names",
    """
SELECT p_partkey, lower(regexp_replace(p_name, '[^a-zA-Z0-9]', '', 'g')) AS norm_name
FROM part
""",
)
def normalize_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_string_col as a standalone operator (reference P2, join.py:6-12)."""
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", normalize_string_col("p_name").alias("norm_name"))


@register(
    "trigram_token_df",
    f"""
WITH tok AS ({duck_trigrams_cte("part", "p_partkey", "p_name")})
SELECT tok AS token, count(*) AS df FROM tok GROUP BY tok
""",
)
def trigram_token_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency of every trigram token over part names — pins the
    tokenizer (src/cossim.rs:27-60 semantics) against an independent SQL
    implementation."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.col("p_partkey"), F.explode(trigram_tokens(F.col("p_name"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )



@register(
    "join_edit_customers",
    """
SELECT a.c_custkey AS l_id, b.c_custkey AS r_id,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a, customer b
WHERE a.c_custkey < b.c_custkey
  AND abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) <= 1
""",
)
def join_edit_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join: every customer-name pair within Levenshtein
    distance 1 (operators/edit_join.py — Ed-Join q-gram prefix pruning).
    Extends the reference's similarity-join family (join.py:15-30) to the
    edit metric; the oracle runs the O(n^2) cross product the Spark plan
    exists to avoid."""
    from polars_sim_spark.operators.edit_join import edit_join

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_join(
        cust, None, "c_name", left_id="c_custkey", max_dist=1
    ).select("l_id", "r_id", "edit_dist")


@register(
    "entity_resolve_customers",
    """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS l_id, b.c_custkey AS r_id
  FROM customer a, customer b
  WHERE a.c_custkey < b.c_custkey
    AND abs(length(a.c_name) - length(b.c_name)) <= 1
    AND levenshtein(a.c_name, b.c_name) <= 1
),
e AS (SELECT l_id AS src, r_id AS dst FROM pairs
      UNION ALL SELECT r_id AS src, l_id AS dst FROM pairs),
reach AS (
  SELECT c_custkey AS id, c_custkey AS lab FROM customer
  UNION
  SELECT e.dst AS id, reach.lab FROM e JOIN reach ON reach.id = e.src
)
SELECT id AS c_custkey, min(lab) AS entity_id FROM reach GROUP BY id
""",
)
def entity_resolve_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END entity resolution: names within edit distance 1 are the
    same entity — edit_join (FastSS candidates + threshold DP) produces
    the match pairs, connected components (pointer jumping,
    operators/dedup.py) collapses transitive chains, and every customer
    gets a canonical entity_id (the smallest member key).  One oracle
    checks the whole composition: the O(n^2) Levenshtein cross product
    plus a recursive-CTE closure.  This is the similarity-join family's
    production shape — dedup_cluster_docs for STRUCTURED identifiers."""
    from polars_sim_spark.operators.dedup import connected_components
    from polars_sim_spark.operators.edit_join import edit_join

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = edit_join(cust, None, "c_name", left_id="c_custkey", max_dist=1)
    out = connected_components(
        cust.select(F.col("c_custkey").alias("id")),
        pairs,
        id_col="id",
        src_col="l_id",
        dst_col="r_id",
    )
    return out.select(
        F.col("id").alias("c_custkey"), F.col("cluster_id").alias("entity_id")
    )
