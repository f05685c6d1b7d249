"""As-of join unit tests on hand-computable frames."""

from __future__ import annotations

from datetime import datetime

from polars_sim_spark.operators.asof_join import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


LEFT = [
    (1, _ts("2024-01-01T10:00:00"), 100),
    (1, _ts("2024-01-01T12:00:00"), 101),
    (2, _ts("2024-01-01T11:00:00"), 200),
    (3, _ts("2024-01-01T11:00:00"), 300),  # no right rows for key 3
]
RIGHT = [
    (1, _ts("2024-01-01T09:00:00"), 1, 9.5),
    (1, _ts("2024-01-01T11:30:00"), 2, 11.5),
    (2, _ts("2024-01-01T11:00:00"), 3, 11.0),  # equal ts → matches (inclusive)
    (2, _ts("2024-01-01T11:00:00"), 4, 12.0),  # same ts, higher seq → wins
]


def _frames(spark):
    left = spark.createDataFrame(LEFT, "k long, ts timestamp, lval long")
    right = spark.createDataFrame(RIGHT, "k long, ts timestamp, seq long, rval double")
    return left, right


def test_backward_match_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k", right_seq="seq", how="left")
    rows = {(r["k"], r["lval"]): (r["seq"], r["rval"]) for r in out.collect()}
    assert rows[(1, 100)] == (1, 9.5)  # only the 09:00 row precedes 10:00
    assert rows[(1, 101)] == (2, 11.5)  # latest preceding
    assert rows[(2, 200)] == (4, 12.0)  # equal-ts inclusive, max-seq tiebreak
    assert rows[(3, 300)] == (None, None)  # unmatched survives under how="left"
    assert out.count() == 4


def test_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k", right_seq="seq", how="inner")
    assert out.count() == 3
    assert {r["k"] for r in out.collect()} == {1, 2}


def test_tolerance(spark):
    left, right = _frames(spark)
    # 10:00 ← 09:00 is 3600s stale; tolerance 2000s nulls it out while
    # keeping 12:00 ← 11:30 (1800s) and the equal-ts match (0s).
    out = asof_join(
        left, right, on="ts", by="k", right_seq="seq", how="inner", tolerance_seconds=2000
    )
    rows = {(r["k"], r["lval"]) for r in out.collect()}
    assert (1, 100) not in rows
    assert (1, 101) in rows and (2, 200) in rows


def test_suffix_on_collision(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k", right_seq="seq")
    # right's ts collides with left's → suffixed
    assert "ts_right" in out.columns and "ts" in out.columns


def test_null_payload_on_matched_row_stays_null(spark):
    """Regression: a NULL payload value on the MATCHED right row must not be
    back-filled from an older right row (per-column last(ignorenulls) bug)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 0)], "k long, ts timestamp, lval long"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 1, 9.5, "old"),
            (1, _ts("2024-01-01T11:00:00"), 2, None, None),  # matched row, NULL payload
        ],
        "k long, ts timestamp, seq long, rval double, tag string",
    )
    out = asof_join(left, right, on="ts", by="k", right_seq="seq").collect()
    assert len(out) == 1
    row = out[0]
    assert row["seq"] == 2  # matched the 11:00 row...
    assert row["rval"] is None and row["tag"] is None  # ...with ITS nulls intact
