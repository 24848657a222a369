"""Physical-plan inspection helpers.

The 100 TB discipline in code: operators assert their own plan shape
(no shuffle where none is needed, broadcasts where intended, partials
before finals) instead of hoping. Used by tests/test_plans.py and
available for ad-hoc `.explain` audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange")


def assert_no_shuffle(df: DataFrame, context: str = "") -> None:
    plan = executed_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"unexpected shuffle {context}:\n{plan[:1000]}")


def assert_broadcasts(df: DataFrame, at_least: int, context: str = "") -> None:
    plan = executed_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected ≥{at_least} broadcast joins, saw {n} {context}:\n{plan[:1000]}"
        )
