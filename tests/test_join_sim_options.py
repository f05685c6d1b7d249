"""Option-surface tests (FIXTURES.md §F3): left_on/right_on, top_n cutoff,
count mode, suffix collision renaming, add_mapping/add_similarity column
sets — reference join.py:15-149 behaviors."""

from __future__ import annotations

import pytest

from polars_sim_spark import join_sim


@pytest.fixture(scope="module")
def left(spark):
    rows = [(i, f"name{i:02d} widget", i * 10) for i in range(10)]
    return spark.createDataFrame(rows, "lid long, name string, payload_l long")


@pytest.fixture(scope="module")
def right(spark):
    rows = [(i, f"name{i:02d} widgets", f"r{i}") for i in range(20)]
    return spark.createDataFrame(rows, "rid long, name string, payload_r string")


def test_left_on_right_on(spark, left, right):
    l2 = left.withColumnRenamed("name", "lname")
    r2 = right.withColumnRenamed("name", "rname")
    out = join_sim(
        l2, r2, left_on="lname", right_on="rname", top_n=1, left_id="lid", right_id="rid"
    )
    assert out.count() == 10


@pytest.mark.parametrize("top_n", [1, 3, 10])
def test_topn_cutoff(spark, left, right, top_n):
    out = join_sim(left, right, on="name", top_n=top_n, left_id="lid", right_id="rid")
    counts = out.groupBy("lid").count().collect()
    assert all(r["count"] <= top_n for r in counts)
    assert out.count() <= 10 * top_n


def test_count_mode_integer_sims(spark, left, right):
    out = join_sim(
        left, right, on="name", top_n=3, normalization="count",
        left_id="lid", right_id="rid",
    )
    sims = [r["sim"] for r in out.collect()]
    assert all(s == int(s) and s >= 1 for s in sims)


def test_suffix_collision(spark, left, right):
    out = join_sim(left, right, on="name", top_n=1, left_id="lid", right_id="rid")
    assert "name" in out.columns and "name_right" in out.columns
    out2 = join_sim(
        left, right, on="name", top_n=1, left_id="lid", right_id="rid", suffix="_r"
    )
    assert "name_r" in out2.columns


def test_add_mapping_and_similarity_column_sets(spark, left, right):
    base = dict(on="name", top_n=1, left_id="lid", right_id="rid")
    both = join_sim(left, right, **base, add_mapping=True, add_similarity=True)
    assert {"lid", "rid", "sim"} <= set(both.columns)
    no_sim = join_sim(left, right, **base, add_similarity=False)
    assert "sim" not in no_sim.columns
    payload_kept = join_sim(left, right, **base)
    assert {"payload_l", "payload_r"} <= set(payload_kept.columns)


def test_payloads_carried_untouched(spark, left, right):
    out = join_sim(left, right, on="name", top_n=1, left_id="lid", right_id="rid")
    row = out.where("lid = 3").collect()[0]
    assert row["payload_l"] == 30
    assert row["payload_r"] == f"r{row['rid']}"
