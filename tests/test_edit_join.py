"""edit_join: brute-force pin + edge cases.

The operator (operators/edit_join.py) implements Ed-Join-style q-gram
prefix pruning; correctness = exactly the cross-product-with-Levenshtein
result, which these tests compute in pure Python on word lists chosen to
exercise every pruning path (long strings through the prefix join, short
strings through the length-banded block, and the boundary lengths where
the count-filter threshold crosses zero).
"""

from __future__ import annotations

import functools
import itertools
import random

import pytest

from polars_sim_spark.operators.edit_join import edit_join


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i: int, j: int) -> int:
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )
    return d(len(a), len(b))


def _words(seed: int, n: int, alpha: str = "abcde", max_len: int = 12):
    rng = random.Random(seed)
    return ["".join(rng.choice(alpha) for _ in range(rng.randint(1, max_len))) for _ in range(n)]


@pytest.mark.parametrize("method", ["neighborhood", "qgram"])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_self_join_matches_bruteforce(spark, k, method):
    rows = list(enumerate(_words(7, 80)))
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.l_id, r.r_id, r.edit_dist)
        for r in edit_join(
            df, None, "s", left_id="id", max_dist=k, method=method
        ).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }
    assert got == want


@pytest.mark.parametrize("method", ["neighborhood", "qgram"])
def test_two_sided_matches_bruteforce(spark, method):
    rows_l = list(enumerate(_words(11, 60)))
    # Right side stresses the short block: many strings below q + k*q.
    rows_r = [(1000 + i, w) for i, w in enumerate(_words(13, 60, max_len=5) + ["abcd", "a"])]
    dl = spark.createDataFrame(rows_l, ["id", "s"])
    dr = spark.createDataFrame(rows_r, ["id", "s"])
    got = {
        (r.l_id, r.r_id, r.edit_dist)
        for r in edit_join(
            dl, dr, "s", "s", left_id="id", right_id="id", max_dist=2, method=method
        ).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a) in rows_l
        for (j, b) in rows_r
        if _lev(a, b) <= 2
    }
    assert got == want


def test_duplicate_strings_self_join(spark):
    # Identical strings under different ids are distance-0 pairs; the
    # self-join emits each unordered pair once with l_id < r_id.
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello"), (3, "help"), (4, "yelp")], ["id", "s"]
    )
    got = {
        (r.l_id, r.r_id, r.edit_dist)
        for r in edit_join(df, None, "s", left_id="id", max_dist=2).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 2), (2, 3, 2), (3, 4, 1)}


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    with pytest.raises(ValueError):
        edit_join(df, None, "s", left_id="id", max_dist=-1)
    with pytest.raises(ValueError):
        edit_join(df, None, "s", left_id="id", q=1)


def test_no_cartesian_in_plan(spark):
    # The long-string path must be an equi-join on (gram, occ) — never a
    # cross product. (The short block is length-banded, also an equi-join.)
    df = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(100)], ["id", "s"]
    )
    plan = edit_join(df, None, "s", left_id="id", max_dist=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        words=st.lists(st.text(alphabet="abc", min_size=0, max_size=7), min_size=2, max_size=25),
        k=st.integers(min_value=0, max_value=2),
    )
    def test_edit_join_property_vs_bruteforce(spark, words, k):
        """Any corpus, any k in the neighborhood regime: edit_join ==
        the cross product filtered by Levenshtein (incl. empty strings,
        duplicates, and all-short corpora)."""
        rows = [(i, w) for i, w in enumerate(words) if w != ""]
        if len(rows) < 2:
            return
        df = spark.createDataFrame(rows, ["id", "s"])
        got = {
            (r.l_id, r.r_id, r.edit_dist)
            for r in edit_join(df, None, "s", left_id="id", max_dist=k).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= k
        }
        assert got == want
