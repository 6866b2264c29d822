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


_SCAN_EXECS = (
    "FileSourceScanExec",
    "BatchScanExec",
    "RDDScanExec",
    "LocalTableScanExec",
    "InMemoryTableScanExec",
    "ExternalRDDScanExec",
)


def _metric_value(node, key):
    opt = node.metrics().get(key)
    return None if opt.isEmpty() else int(opt.get().value())


def executed_plan_rows(df: DataFrame, execute: bool = True) -> dict:
    """RUNTIME row accounting for a frame's plan — the measured side of
    the PLAN_AUDIT scale story. Executes the plan (a JVM-side
    ``execute().count()`` on the final physical plan: no driver
    collect, no extra shuffle the way ``df.count()``'s own agg would
    add), then walks the AQE-finalized tree reading each
    ``ShuffleExchangeExec``'s ``shuffleRecordsWritten`` metric, each
    ``BroadcastExchangeExec``'s ``numOutputRows``, and each scan's
    ``numOutputRows``.

    Returns ``{"shuffle_rows": [...], "broadcast_rows": [...],
    "scan_rows": [...], "reused": n}`` (reused exchanges/stages are
    counted once where they materialized). This is what lets
    PLAN_AUDIT.md CLASSIFY every exchange corpus-sized vs summary-sized
    from measurement rather than assertion — pre-AQE static counts
    (:func:`plan_summary`) stay the upper bound; these are the rows
    that actually moved.

    Pass ``execute=False`` when the frame's plan already ran (an eager
    ``localCheckpoint`` stage) — the metrics are read as-is."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    if execute:
        plan.execute().count()
    out = {"shuffle_rows": [], "broadcast_rows": [], "scan_rows": [],
           "reused": 0}

    def walk(node):
        # plans are trees apart from explicit Reused* nodes (skipped:
        # their rows materialized — and were counted — at the original)
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name.startswith("Reused"):
            out["reused"] += 1
            return
        if name == "ShuffleExchangeExec":
            v = _metric_value(node, "shuffleRecordsWritten")
            out["shuffle_rows"].append(v if v is not None else 0)
        elif name == "BroadcastExchangeExec":
            v = _metric_value(node, "numOutputRows")
            out["broadcast_rows"].append(v if v is not None else 0)
        elif any(name == s for s in _SCAN_EXECS):
            v = _metric_value(node, "numOutputRows")
            if v is not None:
                out["scan_rows"].append(v)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        sq = node.subqueries()
        for i in range(sq.size()):
            walk(sq.apply(i))

    walk(plan)
    return out
