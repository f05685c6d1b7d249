"""Golden-value tests for join_sim — ports of the reference's unit suite
(reference ``tests/test_sim.py:7-53``; cases catalogued in FIXTURES.md §F1).

Each case runs under BOTH physical strategies (broadcast and shuffle), the
analog of the reference running every case under both threading dimensions
(``tests/test_sim.py:55-61``). Comparison is order-insensitive on
``(row, col, sim)`` with float tolerance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_sim_spark import join_sim

STRATEGIES = ["broadcast", "shuffle"]

# (left_strings, right_strings, expected {(row, col): sim})
GOLDEN = [
    (["zzz"], ["zzz"], {(0, 0): 1.0}),
    (["aaa"], ["aaa"], {(0, 0): 1.0}),
    (["aaabb"], ["aaa"], {(0, 0): 1 / math.sqrt(3)}),
    (["aaa"], ["aaabb"], {(0, 0): 1 / math.sqrt(3)}),  # symmetry
    (["abc"], ["abcabc"], {(0, 0): 1 / math.sqrt(3)}),  # dedup: abcabc → {abc,bca,cab}
    (["abc", "def"], ["abc", "aaa"], {(0, 0): 1.0}),  # "def" has no match → absent
    (
        ["abc", "def", "aaabxy"],
        ["abc", "aaa"],
        {(0, 0): 1.0, (2, 1): 1 / math.sqrt(4)},  # aaabxy → {aaa,aab,abx,bxy}
    ),
]


def _frame(spark, strings, id_name):
    rows = [(i, s) for i, s in enumerate(strings)]
    return spark.createDataFrame(rows, schema=f"{id_name} long, s string")


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("case", range(len(GOLDEN)))
def test_golden(spark, case, strategy):
    left_s, right_s, expected = GOLDEN[case]
    left = _frame(spark, left_s, "row")
    right = _frame(spark, right_s, "col")
    out = join_sim(
        left,
        right,
        on="s",
        top_n=1,
        normalization="l2",
        add_mapping=True,
        strategy=strategy,
        left_id="row",
        right_id="col",
    )
    got = {(r["row"], r["col"]): r["sim"] for r in out.collect()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_count_mode(spark, strategy):
    # count mode: sim = integer overlap (reference join.py:54-59)
    left = _frame(spark, ["aaabb"], "row")
    right = _frame(spark, ["aaab"], "col")
    out = join_sim(
        left, right, on="s", top_n=1, normalization="count",
        add_mapping=True, strategy=strategy, left_id="row", right_id="col",
    )
    got = out.collect()
    # aaabb → {aaa,aab,abb}; aaab → {aaa,aab}; overlap = 2
    assert len(got) == 1 and got[0]["sim"] == 2.0


def test_strategy_equivalence_on_testdata(spark, sf_small):
    """Broadcast path ≡ shuffle path on real data (physical-variant
    equivalence, the analog of reference tests/test_sim.py:55-61)."""
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    kw = dict(
        left_on="p_name", right_on="p_name", top_n=3,
        add_mapping=True, left_id="p_partkey", right_id="p_partkey",
    )
    a = join_sim(part, part.select("p_partkey", "p_name"), **kw, strategy="broadcast")
    b = join_sim(part, part.select("p_partkey", "p_name"), **kw, strategy="shuffle")
    assert "p_partkey" in a.columns and "p_partkey_right" in a.columns
    rows_a = sorted(
        (r["p_partkey"], r["p_partkey_right"], round(r["sim"], 9)) for r in a.collect()
    )
    rows_b = sorted(
        (r["p_partkey"], r["p_partkey_right"], round(r["sim"], 9)) for r in b.collect()
    )
    assert rows_a == rows_b
    assert len(rows_a) > 0
