"""Plan inspection & scale-hygiene helpers (SURVEY.md §4).

No custom Catalyst rules — the reference surface needs none. These helpers
make the *built-in* optimizer's work visible and assertable in tests:
pushdown reached the scan, the dimension join broadcast, codegen spans are
wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the parquet scan
    (`PushedFilters: [...]` in the formatted plan)."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join; plan:\n{plan}")


def count_shuffles(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")
