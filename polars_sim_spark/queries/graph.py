"""Graph-analytics contract queries: co-occurrence edges, triangle counts,
exact-integer PageRank (operators/graph.py).

The graph is the part co-purchase graph: two parts are connected iff some
order contains both.  Both queries are fully hash-checkable — triangle
counting is plain exact counting, and PageRank runs a FIXED iteration
count in int64 micro-units so the DuckDB oracle reproduces every value by
unrolling the same integer recurrence (module doc of operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_sim_spark.sources.tables import load_table
from polars_sim_spark.queries._registry import register

#: Shared oracle CTEs: the co-purchase edge set (distinct part pairs per
#: order, a < b) — the SQL twin of operators.graph.cooccurrence_edges.
_EDGES_CTE = """
items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
edges AS (
  SELECT x.i AS a, y.i AS b
  FROM items x JOIN items y ON x.g = y.g AND x.i < y.i
  GROUP BY 1, 2
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_sim_spark.operators.graph import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem")
    return cooccurrence_edges(li, group_col="l_orderkey", item_col="l_partkey")


@register(
    "graph_part_triangles",
    f"""
WITH {_EDGES_CTE},
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM edges e1
  JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT node, count(*) AS n_triangles
FROM (SELECT unnest([u, v, w]) AS node FROM tri)
GROUP BY node
""",
)
def graph_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph.  The
    Spark plan is the degree-ordered node-iterator (per-node wedge work
    bounded by sqrt(m)); the oracle is the textbook three-way self-join
    the node-iterator exists to avoid at scale."""
    from polars_sim_spark.operators.graph import triangle_counts

    return triangle_counts(_copurchase_edges(spark, sf_dir))


def _pagerank_oracle(iterations: int = 3, damping_pct: int = 85) -> str:
    """Unroll the exact integer PageRank recurrence as a CTE chain."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(
            f"""
r{i} AS (
  SELECT deg.n AS node,
         tele.t + CAST(({damping_pct} * coalesce(infl.s, 0)) // 100 AS BIGINT) AS rank_micro
  FROM deg
  CROSS JOIN tele
  LEFT JOIN (
    SELECT dir.dst AS n, CAST(sum(r.rank_micro // d2.deg) AS BIGINT) AS s
    FROM dir
    JOIN deg d2 ON d2.n = dir.src
    JOIN {prev} r ON r.node = dir.src
    GROUP BY dir.dst
  ) infl ON infl.n = deg.n
)"""
        )
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
WITH {_EDGES_CTE},
dir AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS n, count(*) AS deg FROM dir GROUP BY 1),
c AS (SELECT count(*) AS n FROM deg),
tele AS (SELECT CAST((1000000000000 * (100 - {damping_pct})) // (100 * n) AS BIGINT) AS t FROM c),
r0 AS (SELECT deg.n AS node, CAST(1000000000000 // c.n AS BIGINT) AS rank_micro FROM deg CROSS JOIN c),
{chain}
SELECT node, rank_micro FROM {prev}
"""


@register("graph_part_pagerank", _pagerank_oracle(iterations=3))
def graph_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the co-purchase graph in
    exact int64 micro-units — every value hash-matches the oracle's
    unrolled integer recurrence.  Iterative Spark loop with per-round
    localCheckpoint (the connected-components pattern)."""
    from polars_sim_spark.operators.graph import pagerank

    return pagerank(_copurchase_edges(spark, sf_dir), iterations=3)


def _kcore_oracle(k: int = 80, peels: int = 5) -> str:
    """Unroll k-core peeling to the observed sf0.01 fixpoint depth AND
    assert the fixpoint in-oracle: after ``peels`` peel rounds the
    low-degree set must be EMPTY, and the final SELECT is gated on that
    emptiness — if the data ever needs more rounds the oracle returns 0
    rows and the contract row goes red (a safe failure, never a wrong
    pass).  Same unrolled-CTE trick as the PageRank/LPA oracles; each
    edge CTE is MATERIALIZED because the degree union references it
    twice."""
    steps = []
    for r in range(peels + 1):
        steps.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT n, count(*) AS deg
  FROM (SELECT a AS n FROM e{r} UNION ALL SELECT b AS n FROM e{r})
  GROUP BY n
),
low{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE deg < {k})"""
        )
        if r < peels:
            steps.append(
                f""",
e{r + 1} AS MATERIALIZED (
  SELECT a, b FROM e{r}
  WHERE a NOT IN (SELECT n FROM low{r}) AND b NOT IN (SELECT n FROM low{r})
)"""
            )
    return f"""
WITH {_EDGES_CTE},
e0 AS MATERIALIZED (SELECT a, b FROM edges){"".join(steps)}
SELECT n AS node, CAST(deg AS BIGINT) AS core_deg
FROM d{peels}
WHERE (SELECT count(*) FROM low{peels}) = 0
"""


@register("graph_part_kcore", _kcore_oracle(k=80, peels=5))
def graph_part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80-core of the co-purchase graph with each survivor's induced
    degree (operators/graph.py:k_core — iterative peeling, checkpointed
    rounds, isEmpty convergence probe).  The testdata graph has a sharp
    core transition (k=80 keeps ~93% of parts; k=90 is empty), so the
    query exercises real multi-round peeling.  FULLY oracle-checked
    since round 9: the peel is unrolled to the observed sf0.01 fixpoint
    (5 peel rounds + the empty check), with the fixpoint ASSERTED in
    the oracle's final stage — more-rounds-needed degrades to 0 oracle
    rows (red), never a wrong pass.  The plain-Python peeling reference
    in tests/test_graph.py stays as the scale-independent second pin."""
    from polars_sim_spark.operators.graph import k_core

    return k_core(_copurchase_edges(spark, sf_dir), k=80)


def _lpa_oracle(iterations: int = 3) -> str:
    """Unroll deterministic synchronous label propagation as a CTE chain."""
    steps = []
    prev = "l0"
    for i in range(1, iterations + 1):
        steps.append(
            f"""
l{i} AS (
  SELECT n AS node, lbl FROM (
    SELECT d.dst AS n, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY d.dst ORDER BY count(*) DESC, l.lbl) AS rn
    FROM dir d JOIN {prev} l ON l.node = d.src
    GROUP BY d.dst, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    chain = ",".join(steps)
    return f"""
WITH {_EDGES_CTE},
dir AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b AS src, a AS dst FROM edges),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM dir),
{chain}
SELECT node, lbl AS community FROM {prev}
"""


@register("graph_part_communities", _lpa_oracle(iterations=3))
def graph_part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label-propagation communities (3 synchronous rounds,
    most-frequent-neighbor label, smallest-label ties) on the co-purchase
    graph — exact counting end to end, so every (node, community)
    assignment hash-matches the oracle's unrolled rounds
    (operators/graph.py:label_propagation)."""
    from polars_sim_spark.operators.graph import label_propagation

    return label_propagation(_copurchase_edges(spark, sf_dir), iterations=3)


def _ppr_oracle(iterations: int = 3, damping_pct: int = 85, seed_where: str = "n < 100") -> str:
    """Unrolled personalized-PageRank oracle: teleport mass only to seeds."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(
            f"""
r{i} AS (
  SELECT tele.node,
         tele.t + CAST(({damping_pct} * coalesce(infl.s, 0)) // 100 AS BIGINT) AS rank_micro
  FROM tele
  LEFT JOIN (
    SELECT dir.dst AS n, CAST(sum(r.rank_micro // d2.deg) AS BIGINT) AS s
    FROM dir
    JOIN deg d2 ON d2.n = dir.src
    JOIN {prev} r ON r.node = dir.src
    GROUP BY dir.dst
  ) infl ON infl.n = tele.node
)"""
        )
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
WITH {_EDGES_CTE},
dir AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS n, count(*) AS deg FROM dir GROUP BY 1),
seeds AS (SELECT n FROM deg WHERE {seed_where}),
cs AS (SELECT count(*) AS n FROM seeds),
r0 AS (
  SELECT deg.n AS node,
         CASE WHEN s.n IS NOT NULL THEN CAST(1000000000000 // cs.n AS BIGINT) ELSE 0 END AS rank_micro
  FROM deg LEFT JOIN seeds s ON s.n = deg.n CROSS JOIN cs
),
tele AS (
  SELECT deg.n AS node,
         CASE WHEN s.n IS NOT NULL
              THEN CAST((1000000000000 * (100 - {damping_pct})) // (100 * cs.n) AS BIGINT)
              ELSE 0 END AS t
  FROM deg LEFT JOIN seeds s ON s.n = deg.n CROSS JOIN cs
),
{chain}
SELECT node, rank_micro FROM {prev}
"""


@register("graph_part_pagerank_seeded", _ppr_oracle(iterations=3))
def graph_part_pagerank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank: teleport mass restricted to the seed parts
    (p_partkey < 100) — "relevance to these items" propagation over the
    co-purchase graph, the related-items/recommendation shape.  Same
    exact int64 recurrence as graph_part_pagerank (hash-exact vs the
    unrolled oracle), teleport vector now a per-node column."""
    from polars_sim_spark.operators.graph import pagerank

    edges = _copurchase_edges(spark, sf_dir)
    seeds = edges.sparkSession.range(100).select(F.col("id").alias("n"))
    return pagerank(edges, iterations=3, seeds=seeds)


@register(
    "graph_part_clustering",
    f"""
WITH {_EDGES_CTE},
tri3 AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM edges e1
  JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
),
tri AS (
  SELECT node, count(*) AS n_triangles
  FROM (SELECT unnest([u, v, w]) AS node FROM tri3)
  GROUP BY node
),
deg AS (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM edges UNION ALL SELECT b AS n FROM edges
  ) GROUP BY n
)
SELECT deg.n AS node, deg.deg,
       coalesce(tri.n_triangles, 0) AS n_triangles,
       CAST((2 * coalesce(tri.n_triangles, 0) * 1000000) // (deg.deg * (deg.deg - 1)) AS BIGINT) AS coef_micro
FROM deg LEFT JOIN tri ON tri.node = deg.n
WHERE deg.deg >= 2
""",
)
def graph_part_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part (2T / deg(deg-1), exact
    integer micro-units) — the graph-health statistic: how clique-like
    each node's co-purchase neighborhood is
    (operators/graph.py:clustering_coefficients, a pure composition of
    the triangle and degree operators)."""
    from polars_sim_spark.operators.graph import clustering_coefficients

    return clustering_coefficients(_copurchase_edges(spark, sf_dir))


@register(
    "graph_part_link_prediction",
    """
WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
ew AS (
  SELECT x.i AS a, y.i AS b
  FROM items x JOIN items y ON x.g = y.g AND x.i < y.i
  GROUP BY 1, 2 HAVING count(*) >= 2
),
dir2 AS (SELECT a AS u, b AS v FROM ew UNION ALL SELECT b AS u, a AS v FROM ew),
cand AS (
  SELECT d1.v AS node, d2.v AS candidate, count(*) AS common
  FROM dir2 d1 JOIN dir2 d2 ON d1.u = d2.u AND d1.v <> d2.v
  GROUP BY 1, 2
),
nonedge AS (
  SELECT c.node, c.candidate, c.common
  FROM cand c
  LEFT JOIN ew ON ew.a = least(c.node, c.candidate) AND ew.b = greatest(c.node, c.candidate)
  WHERE ew.a IS NULL
)
SELECT node, candidate, common FROM (
  SELECT *, row_number() OVER (PARTITION BY node ORDER BY common DESC, candidate) AS rn
  FROM nonedge
) WHERE rn <= 5
""",
)
def graph_part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the REPEAT-signal co-purchase
    graph (pairs co-ordered >= 2 times): per part, the top-5 parts it has
    never been co-ordered with but shares the most repeat-co-purchase
    neighbors with — the recommendation primitive
    (operators/graph.py:link_prediction_topk).  The support threshold is
    both the honest statistical filter and what bounds the 2-hop wedge
    fan-out at scale."""
    from polars_sim_spark.operators.graph import (
        cooccurrence_edges,
        link_prediction_topk,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", min_support=2
    )
    return link_prediction_topk(edges, k=5)
