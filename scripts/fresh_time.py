"""Fresh-execution timing of registered queries (guide §1): each trial
rebuilds the DataFrame with fn() -- so eager checkpoints inside the
builder and first-materialization of lazy checkpoints are INSIDE the
timed region -- then materializes with the noop sink. Prints per-trial
wall and the executor run/CPU-second deltas.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/fresh_time.py key1 [key2 ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_service_spark import registry  # noqa: E402
from change_data_capture_service_spark.session import get_spark  # noqa: E402


def main() -> int:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")]
    trials = int(os.environ.get("FRESH_TRIALS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="fresh-time",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    registry.load_all()
    from bench import _stage_layout  # noqa: E402

    from change_data_capture_service_spark.plans.inspect import (  # noqa: E402
        executor_time_totals,
    )

    staged, load_s = _stage_layout(spark, sf_dir, int(cpus))
    print(f"staged layout in {load_s}s")
    try:
        for key in keys:
            # one fresh warm trial (JIT/codegen), untimed, then fresh trials
            registry.get(key).fn(spark, staged).write.format("noop").mode(
                "overwrite"
            ).save()
            walls, cpus_s, runs_s = [], [], []
            for _ in range(trials):
                c0 = executor_time_totals(spark)
                t0 = time.perf_counter()
                df = registry.get(key).fn(spark, staged)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
                c1 = executor_time_totals(spark)
                runs_s.append(max(c1["run_s"] - c0["run_s"], 0.0))
                cpus_s.append(max(c1["cpu_s"] - c0["cpu_s"], 0.0))
            w = sorted(walls)
            print(
                f"{key:44s} wall min {w[0]:7.3f}  med {w[len(w)//2]:7.3f}  "
                f"run_s min {min(runs_s):8.2f}  cpu_s min {min(cpus_s):8.2f}"
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
