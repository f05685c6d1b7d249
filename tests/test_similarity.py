"""ANN operators: brute-force exactness + LSH candidate quality."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_sim_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
)


def _emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def _queries(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def test_bruteforce_shape_and_order(spark, sf_small):
    emb = _emb(spark, sf_small)
    out = ann_topk_bruteforce(emb, _queries(emb), k=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r["sim"])
    assert len(per_q) == 10
    for sims in per_q.values():
        assert len(sims) == 5
        assert sims == sorted(sims, reverse=True)


def test_bruteforce_self_similarity(spark, sf_small):
    emb = _emb(spark, sf_small)
    out = ann_topk_bruteforce(emb, _queries(emb), k=5, exclude_same_id=False)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    top1 = out.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    # with self included, every query's nearest neighbor is itself (sim 1.0)
    assert all(r["n_id"] == r["q_id"] and r["sim"] == 1.0 for r in top1)


def test_lsh_subset_of_space_and_exact_sims(spark, sf_small):
    """LSH output must be ≤k rows per query, and each reported sim must
    equal the exact cosine (re-rank is exact even if recall isn't)."""
    emb = _emb(spark, sf_small)
    qs = _queries(emb)
    lsh = ann_topk_lsh(emb, qs, k=5).collect()
    exact = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in ann_topk_bruteforce(emb, qs, k=10**9).collect()
    }
    per_q = {}
    for r in lsh:
        per_q.setdefault(r["q_id"], 0)
        per_q[r["q_id"]] += 1
        assert exact[(r["q_id"], r["n_id"])] == r["sim"]
    assert all(n <= 5 for n in per_q.values())


def test_lsh_bucket_determinism(spark, sf_small):
    emb = _emb(spark, sf_small)
    qs = _queries(emb)
    a = sorted(map(tuple, ann_topk_lsh(emb, qs, k=5).collect()))
    b = sorted(map(tuple, ann_topk_lsh(emb, qs, k=5).collect()))
    assert a == b


def test_ivf_exact_sims_and_recall(spark, sf_small):
    """IVF candidates re-rank with exact cosine; probing all centroids
    must recover the brute-force result exactly."""
    from polars_sim_spark.operators.similarity import ann_topk_ivf

    emb = _emb(spark, sf_small)
    qs = _queries(emb)
    exact = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in ann_topk_bruteforce(emb, qs, k=10**9).collect()
    }
    ivf = ann_topk_ivf(emb, qs, k=5, num_centroids=8, nprobe=2).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r["q_id"], 0)
        per_q[r["q_id"]] += 1
        assert exact[(r["q_id"], r["n_id"])] == r["sim"]
    assert all(n <= 5 for n in per_q.values())

    # nprobe = num_centroids ⇒ candidates = whole corpus ⇒ exact top-k
    full = ann_topk_ivf(emb, qs, k=3, num_centroids=8, nprobe=8)
    brute = ann_topk_bruteforce(emb, qs, k=3)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


def test_lsh_covers_dims_past_256(spark):
    """Regression: plane table must cover the TRUE vector dimension.
    Round-1 hardcoded range(256), silently dropping components ≥ 256.
    Two 300-dim vectors identical in dims 0..255 but opposite in dims
    256..299 must be able to land in different buckets."""
    from polars_sim_spark.operators.similarity import _sign_buckets

    base = [0.0] * 256
    a = base + [1.0] * 44
    b = base + [-1.0] * 44
    df = spark.createDataFrame([(0, a), (1, b)], "vec_id long, embedding array<double>")
    buckets = _sign_buckets(df, "vec_id", "embedding", 16, 4, num_dims=300).collect()
    by_id = {}
    for r in buckets:
        by_id.setdefault(r["id"], {})[r["band"]] = r["bucket"]
    # a and b differ ONLY past dim 255; with ±1 plane weights their signed
    # sums are exact negations, so at least one band bucket must differ.
    assert by_id[0] != by_id[1]


def test_lsh_raises_on_wider_queries(spark):
    from polars_sim_spark.operators.similarity import ann_topk_lsh
    import pytest

    corpus = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(1, [1.0] * 16)], "q_id long, q_emb array<double>"
    )
    with pytest.raises(ValueError, match="num_dims"):
        ann_topk_lsh(corpus, queries, k=1)


def test_lsh_explicit_num_dims_matches_derived(spark, sf_small):
    """num_dims larger than the true dim must be a no-op (extra planes
    never meet a component) — pins oracle-equivalence of the 256 bound."""
    from polars_sim_spark.operators.similarity import ann_topk_lsh

    emb = _emb(spark, sf_small)
    qs = _queries(emb)
    derived = sorted(map(tuple, ann_topk_lsh(emb, qs, k=5).collect()))
    bounded = sorted(map(tuple, ann_topk_lsh(emb, qs, k=5, num_dims=256).collect()))
    assert derived == bounded


def test_ivf_kmeans_full_probe_equals_brute(spark, sf_small):
    """With nprobe = num_centroids the IVF result is exact regardless of
    centroid quality — must hold for the k-means-refined quantizer too."""
    emb = _emb(spark, sf_small)
    qs = _queries(emb)
    full = ann_topk_ivf(emb, qs, k=3, num_centroids=8, nprobe=8, kmeans_iters=2)
    brute = ann_topk_bruteforce(emb, qs, k=3)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


def test_kmeans_refinement_converges_to_cluster_means(spark):
    """Two tight clusters, one seed in each: after refinement each
    centroid must sit at (the 6-decimal rounding of) its cluster's mean."""
    from polars_sim_spark.functions.vectors import l2_norm
    from polars_sim_spark.operators.similarity import refine_centroids_kmeans

    a = [[1.0, 0.0, 0.1 * i] for i in range(3)]   # cluster around +x
    b = [[-1.0, 0.05 * i, 0.0] for i in range(3)]  # cluster around -x
    rows = [(i, v) for i, v in enumerate(a + b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = [
        {"c_id": 0, "__centroid": a[0], "__cnorm": 1.0},
        {"c_id": 3, "__centroid": b[0], "__cnorm": 1.0},
    ]
    out = refine_centroids_kmeans(df, "embedding", seeds, iters=2)
    got = {c["c_id"]: c["__centroid"] for c in out}
    mean_a = [round(sum(v[d] for v in a) / 3, 6) for d in range(3)]
    mean_b = [round(sum(v[d] for v in b) / 3, 6) for d in range(3)]
    assert got[0] == pytest.approx(mean_a)
    assert got[3] == pytest.approx(mean_b)


def test_kmeans_empty_centroid_keeps_position(spark):
    """A seed that attracts no members (every vector is nearer the other
    seed) must keep its previous position, not vanish."""
    from polars_sim_spark.operators.similarity import refine_centroids_kmeans

    rows = [(i, [1.0, float(i) * 0.01]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lonely = [0.0, -1.0]
    seeds = [
        {"c_id": 0, "__centroid": [1.0, 0.0], "__cnorm": 1.0},
        {"c_id": 99, "__centroid": lonely, "__cnorm": 1.0},
    ]
    out = refine_centroids_kmeans(df, "embedding", seeds, iters=1)
    got = {c["c_id"]: c["__centroid"] for c in out}
    assert got[99] == lonely
    assert got[0] != [1.0, 0.0]  # the populated one moved to the mean


def test_centroid_assignment_kernel_equals_expr(spark, sf_small):
    """The Arrow-batched GEMM assignment must produce EXACTLY the
    assignments of the Column-expression path, including the
    (sim desc, centroid-rank) tiebreak."""
    from polars_sim_spark.operators import dedup
    from polars_sim_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    kw = dict(min_cosine=0.2, num_centroids=12, nprobe=2)
    expr = {
        (r["l_id"], r["r_id"], round(r["sim"], 6))
        for r in dedup.embedding_ivf_near_dup_pairs(
            emb, "vec_id", "embedding", assignment="expr", **kw
        ).collect()
    }
    kern = {
        (r["l_id"], r["r_id"], round(r["sim"], 6))
        for r in dedup.embedding_ivf_near_dup_pairs(
            emb, "vec_id", "embedding", assignment="kernel", **kw
        ).collect()
    }
    assert len(expr) > 0
    assert expr == kern


def test_ann_ivf_kernel_assignment_equals_expr(spark, sf_small):
    """ann_topk_ivf with the GEMM corpus assignment must equal the
    expression-path result exactly (num_centroids above the auto
    crossover would pick it silently; pin the equivalence)."""
    from polars_sim_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    kw = dict(k=5, num_centroids=12, nprobe=3)
    a = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in ann_topk_ivf(emb, queries, assignment="expr", **kw).collect()
    }
    b = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in ann_topk_ivf(emb, queries, assignment="kernel", **kw).collect()
    }
    assert len(a) > 0
    assert a == b


def test_bm25_topk_matches_python_model(spark):
    """bm25_topk agrees with a direct Python evaluation of the Okapi
    formula (idf+1 variant) on a hand-sized corpus, including the
    deterministic (score desc, doc_id) tie order."""
    import math
    from collections import Counter

    from polars_sim_spark.operators.similarity import bm25_topk

    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark tuning guide",
        3: "completely unrelated cooking recipe text",
        4: "data cluster guide",
    }
    qtext = {10: "spark cluster", 11: "recipe"}
    k1, b = 1.2, 0.75

    tf = {d: Counter(t.split()) for d, t in corpus.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / len(dl)
    n = len(corpus)

    def score(q, d):
        s = 0.0
        for t in set(qtext[q].split()):
            if tf[d][t] == 0:
                continue
            df = sum(1 for c in tf.values() if c[t] > 0)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            f = tf[d][t]
            s += round(idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl)), 6)
        return round(s, 6)

    expected = {}
    for q in qtext:
        ranked = sorted(
            ((score(q, d), d) for d in corpus if score(q, d) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        expected[q] = [(d, s) for s, d in ranked]

    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    qs = spark.createDataFrame(list(qtext.items()), "query_id long, qtext string")
    out = bm25_topk(
        docs, qs, doc_id_col="doc_id", doc_text_col="text",
        query_id_col="query_id", query_text_col="qtext", k=3,
    )
    got = {}
    for r in out.orderBy("query_id", F.desc("score"), "doc_id").collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 6)))
    assert got == expected


def test_bm25_unseen_terms_and_empty_query(spark):
    from polars_sim_spark.operators.similarity import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(10, "zzz qqq"), (11, "   "), (12, "alpha")],
        "query_id long, qtext string",
    )
    out = bm25_topk(
        docs, qs, doc_id_col="doc_id", doc_text_col="text",
        query_id_col="query_id", query_text_col="qtext", k=5,
    ).collect()
    got = {(r["query_id"], r["doc_id"]) for r in out}
    # unseen-term and empty queries return nothing; no zero-score filler
    assert got == {(12, 1)}


def test_ann_lsh_broadcast_optout_same_values(spark, sf_small):
    """broadcast_queries=False (shuffled-join fallback for oversized
    query sets) must return exactly the broadcast path's rows."""
    from polars_sim_spark.operators.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    def run(flag):
        return {
            (r["q_id"], r["n_id"], r["sim"])
            for r in ann_topk_lsh(
                emb, qs, k=3, broadcast_queries=flag
            ).collect()
        }
    assert run(True) == run(False)


def test_cluster_medoids_matches_model(spark, sf_small):
    """cluster_medoids equals a numpy evaluation over the same
    deterministic centroids: sizes sum to the corpus, each medoid is
    its cluster's max-cosine member (ties → smallest id)."""
    import numpy as np

    from polars_sim_spark.operators.similarity import cluster_medoids, pick_centroids

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    cents = {
        r["c_id"]: np.array(r["__centroid"], dtype=float)
        for r in pick_centroids(emb, "vec_id", "embedding", 8).collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return round(float(a @ b / (na * nb)), 6) if na > 0 and nb > 0 else 0.0

    ordered = sorted(cents)  # tie = -rank over c_id-ascending order
    assign = {}
    for vid, v in vecs.items():
        best = max(
            ((cos(v, cents[c]), -r, c) for r, c in enumerate(ordered)),
        )
        assign[vid] = (best[2], best[0])
    expected = {}
    for c in ordered:
        members = [(s, vid) for vid, (cc, s) in assign.items() if cc == c]
        if members:
            s, vid = max(((s, -vid) for s, vid in members))
            expected[c] = (-vid, s, len(members))

    got = {
        r["c_id"]: (r["medoid_id"], r["sim"], r["cluster_size"])
        for r in cluster_medoids(emb, num_centroids=8).collect()
    }
    assert got == expected
    assert sum(v[2] for v in got.values()) == len(vecs)


def test_refine_kmeans_kernel_equals_expr(spark, sf_small):
    """k-means refinement with the GEMM assignment must rebuild
    bit-identical centroids to the expression path (component sums stay
    on the exact decimal path in both; only the argmax routing differs,
    and this corpus sits away from 6-dp rounding boundaries)."""
    from polars_sim_spark.operators.similarity import (
        pick_centroids,
        refine_centroids_kmeans,
    )
    from polars_sim_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    seeds = pick_centroids(emb, "vec_id", "embedding", 12).collect()
    seeds.sort(key=lambda r: r["c_id"])
    a = refine_centroids_kmeans(emb, "embedding", seeds, 2, assignment="expr")
    b = refine_centroids_kmeans(emb, "embedding", seeds, 2, assignment="kernel")
    assert [c["c_id"] for c in a] == [c["c_id"] for c in b]
    for ca, cb in zip(a, b):
        assert ca["__centroid"] == cb["__centroid"], ca["c_id"]


def test_ann_ivf_kmeans_kernel_assignment_equals_expr(spark, sf_small):
    """End-to-end: kmeans-refined IVF under kernel assignment (which now
    covers corpus scoring, probe scoring, AND the refinement loop) must
    equal the expression-path result exactly."""
    from polars_sim_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    kw = dict(k=5, num_centroids=12, nprobe=3, kmeans_iters=2)
    a = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in ann_topk_ivf(emb, queries, assignment="expr", **kw).collect()
    }
    b = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in ann_topk_ivf(emb, queries, assignment="kernel", **kw).collect()
    }
    assert len(a) > 0
    assert a == b


def test_nearest_centroid_assignments_kernel_equals_expr(spark, sf_small):
    """(id, c_id, sim) from the carry_sim GEMM path must equal the
    expression path exactly — including the rounded cosine — so
    cluster_medoids/balanced sampling can flip to the kernel at large
    centroid counts without changing results."""
    from polars_sim_spark.operators.similarity import nearest_centroid_assignments
    from polars_sim_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    kw = dict(num_centroids=12, kmeans_iters=1)
    a = {
        (r["id"], r["c_id"], round(r["sim"], 6))
        for r in nearest_centroid_assignments(emb, assignment="expr", **kw).collect()
    }
    b = {
        (r["id"], r["c_id"], round(r["sim"], 6))
        for r in nearest_centroid_assignments(emb, assignment="kernel", **kw).collect()
    }
    assert len(a) > 0
    assert a == b


def test_ivf_prebuilt_filtered_search(spark, sf_small, tmp_path):
    """Filtered vector search invariants: every returned neighbor
    satisfies the predicate; the all-ids filter is a no-op (identical
    rows to unfiltered serving); sims stay exact cosines."""
    from polars_sim_spark.operators.similarity import (
        ann_topk_ivf_prebuilt,
        materialize_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    materialize_ivf_index(emb, path, num_centroids=8, kmeans_iters=1, assignment="expr")
    qs = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    allowed = emb.where(F.col("label") < 3).select("vec_id")
    got = ann_topk_ivf_prebuilt(spark, path, qs, k=5, nprobe=3, allowed=allowed)
    ok_ids = {r["vec_id"] for r in allowed.collect()}
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["n_id"] in ok_ids for r in rows)

    noop_filter = ann_topk_ivf_prebuilt(
        spark, path, qs, k=5, nprobe=3, allowed=emb.select("vec_id")
    )
    plain = ann_topk_ivf_prebuilt(spark, path, qs, k=5, nprobe=3)
    assert sorted(map(tuple, noop_filter.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_sq8_codes_in_range_and_deterministic(spark, sf_small):
    from polars_sim_spark.operators.similarity import sq8_quantize

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    coded = sq8_quantize(emb)
    rows = coded.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("d_lo"),
        F.max(F.size("codes")).alias("d_hi"),
    ).collect()[0]
    assert rows["lo"] >= 0 and rows["hi"] <= 255
    assert rows["d_lo"] == rows["d_hi"] == 64
    # per-dim extremes map to the code range ends
    a = {r[0]: r["codes"] for r in coded.select("vec_id", "codes").collect()}
    b = {r[0]: r["codes"] for r in sq8_quantize(emb).select("vec_id", "codes").collect()}
    assert a == b  # deterministic run-to-run


def test_sq8_topk_recall_vs_exact(spark, sf_small):
    """SQ8 keeps most of the exact top-k at 8 bits/dim: recall@5 vs the
    exact cosine baseline stays high on the testdata (embeddings are
    ~unit-norm, so inner product ranks like cosine)."""
    from polars_sim_spark.operators.similarity import ann_topk_bruteforce, ann_topk_sq8

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    exact = ann_topk_bruteforce(emb, queries, k=5)
    approx = ann_topk_sq8(emb, queries, k=5)
    ex = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall


def test_sq8_prebuilt_equals_live(spark, sf_small, tmp_path):
    """Stored SQ8 serving equals the fit-in-query path row-for-row (the
    min/max quantizer is deterministic), and the serve plan reads only
    codes + stats — never the float vector column."""
    from polars_sim_spark.operators.similarity import (
        ann_topk_sq8,
        ann_topk_sq8_prebuilt,
        materialize_sq8_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    path = str(tmp_path / "sq8")
    materialize_sq8_index(emb, path)
    live = sorted(map(tuple, ann_topk_sq8(emb, queries, k=5).collect()))
    served = ann_topk_sq8_prebuilt(spark, path, queries, k=5)
    assert sorted(map(tuple, served.collect())) == live
    files = served.inputFiles()
    assert any("_codes" in f for f in files) and any("_stats" in f for f in files)
    # the float corpus is only read on the (filtered) query side
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(vec_id,10)" in plan


def test_hash_embed_feeds_ann_end_to_end(spark, sf_small):
    """Raw text → hash_embed → brute-force cosine top-k, no external
    model anywhere: the embedding column's double view works as an ANN
    corpus, and a doc's nearest neighbor under the hashed features is
    itself when queried with its own vector."""
    from pyspark.sql import functions as F

    from polars_sim_spark.functions.text import hash_embed
    from polars_sim_spark.operators.similarity import ann_topk_bruteforce

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(100)
    emb = hash_embed(docs, "doc_id", "text", dim=16).select("id", "embedding")
    qs = emb.where(F.col("id") < 5).select(
        F.col("id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = ann_topk_bruteforce(emb, qs, id_col="id", vec_col="embedding", k=3)
    rows = out.collect()
    assert rows
    # self-similarity: cosine(v, v) = 1 is the max — but self-matches are
    # excluded by the operator, so just check structure + determinism
    again = set(map(tuple, ann_topk_bruteforce(emb, qs, id_col="id", vec_col="embedding", k=3).collect()))
    assert set(map(tuple, rows)) == again
    # micro/double views agree
    both = hash_embed(docs, "doc_id", "text", dim=16).collect()
    for r in both:
        assert r["embedding"] == [m / 1e6 for m in r["emb_micro"]]


def test_rrf_fuse_known_values(spark):
    from polars_sim_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["q_id", "n_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 13, 3)], ["q_id", "n_id", "rank"]
    )
    out = {r.n_id: (r.rrf_nano, r.n_lists, r.rank) for r in rrf_fuse([a, b], top_k=4).collect()}
    d = lambda r: 1000000000 // (60 + r)
    # 10: ranks 1+2; 11: ranks 2+1 -> same sum; tie broken by smaller id
    assert out[10] == (d(1) + d(2), 2, 1)
    assert out[11] == (d(2) + d(1), 2, 2)
    assert out[12] == (d(3), 1, 3)
    assert out[13] == (d(3), 1, 4)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_knn_graph_prebuilt_equals_serving_path_plus_mutual_gate(spark, sf_small, tmp_path):
    """knn_graph_ivf_prebuilt's corpus-shuffle plan must equal the
    broadcast serving path run with the corpus as queries, followed by a
    plain-python mutual+threshold gate — same committed index, two
    independent plans."""
    from polars_sim_spark.operators.similarity import (
        ann_topk_ivf_prebuilt,
        knn_graph_ivf_prebuilt,
        materialize_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    materialize_ivf_index(emb, path, num_centroids=4, kmeans_iters=1, assignment="expr")

    k, nprobe, tau = 4, 2, 0.25
    directional = ann_topk_ivf_prebuilt(
        spark,
        path,
        emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")),
        k=k,
        nprobe=nprobe,
    ).collect()
    topk = {}
    sims = {}
    for r in directional:
        topk.setdefault(r["q_id"], set()).add(r["n_id"])
        sims[(r["q_id"], r["n_id"])] = r["sim"]
    expect = {
        (a, b): sims[(a, b)]
        for (a, b) in sims
        if a < b and a in topk.get(b, set()) and b in topk.get(a, set())
        and sims[(a, b)] >= tau
    }

    got = {
        (r["l_id"], r["r_id"]): r["sim"]
        for r in knn_graph_ivf_prebuilt(
            spark, path, k=k, nprobe=nprobe, mutual=True, min_cosine=tau
        ).collect()
    }
    assert got == expect
    # undirected invariant: l < r, no duplicate pairs
    assert all(l < r for (l, r) in got)


def test_knn_graph_non_mutual_is_superset(spark, sf_small, tmp_path):
    from polars_sim_spark.operators.similarity import (
        knn_graph_ivf_prebuilt,
        materialize_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    materialize_ivf_index(emb, path, num_centroids=4, kmeans_iters=1, assignment="expr")
    mut = {
        (r["l_id"], r["r_id"])
        for r in knn_graph_ivf_prebuilt(spark, path, k=3, nprobe=2, mutual=True).collect()
    }
    allp = {
        (r["l_id"], r["r_id"])
        for r in knn_graph_ivf_prebuilt(spark, path, k=3, nprobe=2, mutual=False).collect()
    }
    assert mut <= allp
    assert len(allp) > len(mut)  # asymmetric hub edges exist on real data


def test_knn_graph_convenience_sqrt_n_kernel_default(spark, sf_small, tmp_path):
    """knn_graph (round 10): the one-call scale-path entry builds a
    ⌈√n⌉-centroid index with kernel probing by default, reuses the
    committed files on a second call, and its edges equal the prebuilt
    path served from the same index."""
    import os

    from polars_sim_spark.operators.similarity import (
        knn_graph,
        knn_graph_ivf_prebuilt,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    n = emb.count()
    path = str(tmp_path / "knn_ivf")
    edges = {
        (r["l_id"], r["r_id"]): r["sim"]
        for r in knn_graph(emb, path, k=4, nprobe=2, min_cosine=0.25).collect()
    }
    # index materialized with ⌈√n⌉ centroids
    cents = spark.read.parquet(os.path.join(path, "_centroids")).count()
    import math

    assert cents == math.isqrt(n - 1) + 1
    # second call reuses the committed index (no rebuild) and matches the
    # prebuilt entry point bit-for-bit
    again = {
        (r["l_id"], r["r_id"]): r["sim"]
        for r in knn_graph(emb, path, k=4, nprobe=2, min_cosine=0.25).collect()
    }
    direct = {
        (r["l_id"], r["r_id"]): r["sim"]
        for r in knn_graph_ivf_prebuilt(
            spark, path, k=4, nprobe=2, mutual=True, min_cosine=0.25,
            probe_mode="kernel",
        ).collect()
    }
    assert edges == again == direct
    assert all(l < r for (l, r) in edges)


def test_resolve_entities_equals_manual_composition(spark, sf_small, tmp_path):
    """resolve_entities == knn_graph + connected_components composed by
    hand over the same committed index, and labels are component minima."""
    from polars_sim_spark.operators.dedup import connected_components
    from polars_sim_spark.operators.similarity import knn_graph, resolve_entities

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "re_ivf")
    got = {
        r["vec_id"]: r["entity_id"]
        for r in resolve_entities(emb, path, k=4, nprobe=2, min_cosine=0.25).collect()
    }
    edges = knn_graph(emb, path, k=4, nprobe=2, mutual=True, min_cosine=0.25)
    want = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            emb.select(F.col("vec_id").alias("id")), edges,
            id_col="id", src_col="l_id", dst_col="r_id",
        ).collect()
    }
    assert got == want
    assert len(got) == emb.count()
    assert all(e <= i for i, e in got.items())  # canonical = component min
    assert any(e != i for i, e in got.items())  # non-trivial clusters exist


def test_hash_embed_wide_dims_are_not_degenerate(spark, sf_small):
    """Dims >= 32 draw sign bits from the second md5 slice: they must
    vary across documents (the pre-fix behavior gave every dim >= 32 a
    constant -wt sign), and dim > 64 is rejected."""
    from polars_sim_spark.functions.text import hash_embed

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    emb = hash_embed(docs, "doc_id", "text", dim=64).collect()
    import numpy as np

    mat = np.array([r["emb_micro"] for r in emb], dtype=np.float64)
    for j in range(32, 64):
        col = mat[:, j]
        # a degenerate dim would equal exactly -(sum of all wt) for every
        # doc, i.e. perfectly correlated with every other high dim; the
        # cheap detectable symptom is "always strictly negative"
        assert (col > 0).any(), f"dim {j} never positive: constant-sign degeneracy"

    with pytest.raises(ValueError, match="dim <= 64"):
        hash_embed(docs, "doc_id", "text", dim=65)


def test_knn_graph_kernel_probe_equals_expr(spark, sf_small, tmp_path):
    """probe_mode='kernel' (broadcast-GEMM, the sqrt-n-centroid scale
    path) must produce the same edge set as the expression path on a
    corpus away from rounding boundaries."""
    from polars_sim_spark.operators.similarity import (
        knn_graph_ivf_prebuilt,
        materialize_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    materialize_ivf_index(emb, path, num_centroids=4, kmeans_iters=1, assignment="expr")
    runs = {}
    for mode in ("expr", "kernel"):
        runs[mode] = {
            (r["l_id"], r["r_id"]): r["sim"]
            for r in knn_graph_ivf_prebuilt(
                spark, path, k=4, nprobe=2, mutual=True, probe_mode=mode
            ).collect()
        }
    assert runs["expr"] == runs["kernel"] and runs["expr"]


def test_hadoop_exists_resolves_markers(spark, tmp_path):
    """ADVICE r10: knn_graph's build-if-missing gate goes through the
    Hadoop FileSystem API (scheme-aware — works on HDFS/S3 where a
    driver-local os.path.exists is always False). On local paths it must
    agree with the local stat for both bare and file:// forms."""
    from polars_sim_spark.fsutil import hadoop_exists

    d = tmp_path / "idx" / "_centroids"
    d.mkdir(parents=True)
    marker = d / "_SUCCESS"
    assert not hadoop_exists(spark, str(marker))
    marker.write_text("")
    assert hadoop_exists(spark, str(marker))
    assert hadoop_exists(spark, "file://" + str(marker))
    assert not hadoop_exists(spark, str(tmp_path / "nope" / "_SUCCESS"))


def test_knn_graph_serve_releases_previous_checkpoint(spark, sf_small, tmp_path):
    """VERDICT r10 #2: back-to-back serves must not accumulate
    localCheckpoint blocks (measured 18→71→140 s degradation as storage
    filled). Slot-keyed lifecycle: serve N+1 releases serve N's backing
    RDD; release_checkpoint frees the last one explicitly. Asserted on
    storage levels (noise-free), not wall-clock."""
    from polars_sim_spark import cache
    from polars_sim_spark.operators.similarity import (
        knn_graph_ivf_prebuilt,
        materialize_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    materialize_ivf_index(emb, path, num_centroids=8, kmeans_iters=1, assignment="expr")

    e1 = knn_graph_ivf_prebuilt(spark, path, k=3, nprobe=2)
    n1 = e1.count()  # consume serve 1 before serve 2 (the documented contract)
    j1 = cache._CKPT_SLOTS["knn_graph_serve"]
    lvl1 = j1.getStorageLevel()
    assert lvl1.useMemory() or lvl1.useDisk()  # blocks live after serve 1

    e2 = knn_graph_ivf_prebuilt(spark, path, k=3, nprobe=2)
    n2 = e2.count()
    j2 = cache._CKPT_SLOTS["knn_graph_serve"]
    assert j2.id() != j1.id()
    lvl1b = j1.getStorageLevel()
    assert not (lvl1b.useMemory() or lvl1b.useDisk())  # serve 1 released
    lvl2 = j2.getStorageLevel()
    assert lvl2.useMemory() or lvl2.useDisk()
    assert n1 == n2  # identical serves, identical edges

    assert cache.release_checkpoint("knn_graph_serve") is True
    lvl2b = j2.getStorageLevel()
    assert not (lvl2b.useMemory() or lvl2b.useDisk())
    assert cache.release_checkpoint("knn_graph_serve") is False  # empty slot


def test_entity_label_store_equals_fresh_rebuild(spark):
    """VERDICT r10 #3: the committed entity_labels store must equal a
    from-scratch rebuild of the historical 80%'s CC labels (the in-query
    rebuild the contract row used to run — moved here when the row was
    re-pointed at the store)."""
    from polars_sim_spark import queries as q

    sf_dir = "/root/testdata/sf0.01"
    lab = q.ensure_entity_labels(spark, sf_dir)
    stored = sorted(
        (r["id"], r["entity_id"]) for r in spark.read.parquet(lab).collect()
    )
    fresh = sorted(
        (r["id"], r["entity_id"])
        for r in q.build_historical_entity_labels(spark, sf_dir).collect()
    )
    assert stored == fresh
    assert len(stored) == 400  # the historical 80% of 500 vectors


def test_hadoop_delete_and_list_names(spark, tmp_path):
    """Round 12 (VERDICT r11 nit a): the remote-safe twins of
    shutil.rmtree and os.listdir used by the swept ensure_* gates and
    streaming sink bootstraps."""
    from polars_sim_spark.fsutil import (
        hadoop_delete,
        hadoop_exists,
        hadoop_list_names,
    )

    d = tmp_path / "lake"
    (d / "event_type=click").mkdir(parents=True)
    (d / "_SUCCESS").write_text("")
    assert sorted(hadoop_list_names(spark, str(d))) == [
        "_SUCCESS",
        "event_type=click",
    ]
    assert hadoop_list_names(spark, str(tmp_path / "absent")) == []
    hadoop_delete(spark, str(d))
    assert not hadoop_exists(spark, str(d))
    hadoop_delete(spark, str(d))  # idempotent on absent paths
