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


def plan_summary(df: DataFrame) -> dict:
    """The four scale-hygiene numbers for a plan (the per-query accounting
    PLAN_AUDIT.md records; tools/audit_plans.py imports this): shuffle
    Exchange count, BroadcastExchange count, whether any cartesian /
    nested-loop join appears, and whole-stage-codegen span count. Counts
    come from the pre-AQE physical plan (AQE can only coalesce/replace
    exchanges at runtime, so these are upper bounds)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # WholeStageCodegen ids only materialize once AQE finalizes (after an
    # action on the frame); before that the count reports None, not 0
    spans = set(re.findall(r"\*\((\d+)\)", final))
    return {
        "exchanges": len(
            re.findall(
                r"Exchange (hashpartitioning|rangepartitioning|"
                r"SinglePartition)",
                final,
            )
        ),
        "broadcasts": final.count("BroadcastExchange"),
        "cartesian": "CartesianProduct" in final
        or "BroadcastNestedLoopJoin" in final,
        "codegen_spans": len(spans) if "isFinalPlan=true" in plan else None,
    }
