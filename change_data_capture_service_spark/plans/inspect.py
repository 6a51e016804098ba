"""Plan inspection helpers: assert that the physical plan is the one we
want at 100 TB (filters pushed to the parquet scan, dims broadcast, codegen
spans wide), not just the first one that passed.

Used by tests and by ``bench.py --explain``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in a PushedFilters list of the scan."""
    plan = formatted_plan(df)
    return "PushedFilters" in plan and fragment in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names appearing in ReadSchema lines (pruning check)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols += [f.split(":")[0].strip() for f in inner.split(",") if ":" in f]
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange NODES (each appears twice in formatted output:
    once in the tree, once in the numbered detail section)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def executed_metrics(df: DataFrame, keys: tuple[str, ...]) -> dict[str, int]:
    """Sum named SQLMetrics over the EXECUTED physical plan (call after an
    action on this exact DataFrame, e.g. ``df.collect()``). Descends
    through AQE wrappers (AdaptiveSparkPlanExec.executedPlan,
    QueryStageExec.plan) so post-execution query stages are visited.

    This reads the ground truth the plan-shape gates can only infer:
    e.g. ``shuffleBytesWritten`` / ``shuffleRecordsWritten`` prove a
    partial-aggregating query shuffled O(|groups|) records regardless of
    input rows -- the measured form of every "shuffle budget" claim in
    SCALE.md."""
    totals: dict[str, int] = dict.fromkeys(keys, 0)
    seen_accumulators: set[int] = set()

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        # ReusedExchange/ReusedSubquery report the ORIGINAL node's SQLMetric
        # accumulators; walking them would double-count the same shuffle
        if "ReusedExchange" in cls or "ReusedSubquery" in cls:
            return
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k = str(kv._1())
            acc_id = kv._2().id()
            if k in totals and acc_id not in seen_accumulators:
                seen_accumulators.add(acc_id)
                totals[k] += kv._2().value()
        if "AdaptiveSparkPlan" in cls:
            walk(node.executedPlan())
        if "QueryStageExec" in cls:
            walk(node.plan())
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(df._jdf.queryExecution().executedPlan())
    return totals
