"""Plan-inspection helpers — used by tests to assert physical properties
(broadcast joins actually broadcast, filters actually push to the scan).

The reference has no optimizer to inspect (SURVEY.md §4); these helpers
exist because in a Catalyst engine the *plan* is the artifact worth
testing, not just the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in plan:\n" + plan
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r} in plan:\n" + plan
    )
