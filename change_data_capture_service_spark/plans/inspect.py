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


def executor_time_totals(spark) -> dict[str, float]:
    """Cumulative executor wall/CPU seconds over ALL stages the app has run
    so far, from the live AppStatusStore (the same numbers the Spark UI's
    stage table shows). Delta two snapshots around a query to get
    contention-robust per-query cost:

    - ``run_s``  = sum of executorRunTime (task wall on executor threads);
      inflates under host contention like driver wall does, but excludes
      scheduler/launch latency.
    - ``cpu_s``  = sum of executorCpuTime (actual CPU-seconds the tasks
      burned); invariant to *other processes* stealing the host, so a
      cross-round cpu_s drift is a real code regression while a wall-only
      drift is contention.

    Two failure modes are guarded at the CALLER (bench.py): the store
    retains only ``spark.ui.retainedStages`` stages (default 1000), so a
    long app EVICTS old stages and a later snapshot can read LOWER than
    an earlier one -- bench raises the retention and clamps deltas at 0;
    and stage metrics post through the async listener bus, so this
    function drains the bus (best-effort) before reading to keep a
    query's tail tasks out of the NEXT trial's delta.
    """
    sc = spark.sparkContext
    gw = sc._gateway
    try:
        # drain pending listener events so completed tasks are in the store
        sc._jsc.sc().listenerBus().waitUntilEmpty(2000)
    except Exception:  # noqa: BLE001 - private API; totals stay best-effort
        pass
    store = sc._jsc.sc().statusStore()
    empty = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    stages = store.stageList(empty, False, False, quantiles, empty)
    run_ms = 0
    cpu_ns = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        run_ms += s.executorRunTime()
        cpu_ns += s.executorCpuTime()
    return {"run_s": run_ms / 1e3, "cpu_s": cpu_ns / 1e9}
