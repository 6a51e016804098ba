"""Per-stage profile of one or more registered queries (guide §1/§7).

Usage: python scripts/profile_stages.py key1 [key2 ...]

Stages the fixtures exactly like bench.py, warms each query once, then
runs it again and prints every NEW stage's name, task count, executor
run/CPU seconds and shuffle read/write bytes -- the stage-level view the
Spark UI would give if it were enabled, so "where does the time go" is a
measured fact instead of a plan-shape guess.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_service_spark import registry  # noqa: E402
from change_data_capture_service_spark.session import get_spark  # noqa: E402


def stage_rows(spark):
    sc = spark.sparkContext
    gw = sc._gateway
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty(4000)
    except Exception:  # noqa: BLE001
        pass
    store = sc._jsc.sc().statusStore()
    empty = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    out = {}
    it = store.stageList(empty, False, False, quantiles, empty).iterator()
    while it.hasNext():
        s = it.next()
        out[(s.stageId(), s.attemptId())] = s
    return out


def describe(s) -> dict:
    d = {
        "name": str(s.name())[:80],
        "tasks": s.numCompleteTasks(),
        "run_s": s.executorRunTime() / 1e3,
        "cpu_s": s.executorCpuTime() / 1e9,
    }
    for attr, label in (
        ("shuffleReadBytes", "shr_mb"),
        ("shuffleWriteBytes", "shw_mb"),
        ("inputBytes", "in_mb"),
        ("outputBytes", "out_mb"),
    ):
        try:
            d[label] = getattr(s, attr)() / 1e6
        except Exception:  # noqa: BLE001
            d[label] = -1.0
    return d


def main() -> int:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="stage-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    registry.load_all()
    from bench import _stage_layout  # noqa: E402

    staged, load_s = _stage_layout(spark, sf_dir, int(cpus))
    print(f"staged layout in {load_s}s")
    try:
        for key in keys:
            df = registry.get(key).fn(spark, staged)
            df.write.format("noop").mode("overwrite").save()  # warm
            before = stage_rows(spark)
            spark.sparkContext.setJobDescription(f"profile:{key}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            after = stage_rows(spark)
            new = [describe(s) for k, s in after.items() if k not in before]
            new.sort(key=lambda d: -d["run_s"])
            print(f"\n==== {key}: wall {wall:.3f}s, {len(new)} stages ====")
            for d in new:
                print(
                    f"  run {d['run_s']:7.3f}s cpu {d['cpu_s']:7.3f}s tasks {d['tasks']:4d} "
                    f"in {d['in_mb']:8.2f}MB shr {d['shr_mb']:8.2f}MB shw {d['shw_mb']:8.2f}MB  {d['name']}"
                )
            spark.sparkContext.setJobDescription(None)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
