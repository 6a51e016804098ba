"""Day-2 replica operations: the queries an operator runs AGAINST a CDC
replica to keep trusting it.

    python examples/replica_operations.py

1. catch-up delta   -- what changed since my last checkpoint? (cdc_changes_between)
2. reconciliation   -- which keys differ between two point-in-time states?
                       (cdc_snapshot_diff)
3. history          -- versioned SCD2 intervals for time-travel predicates
                       (cdc_scd2)
4. trust audit      -- null/range/uniqueness/referential constraint report
                       (dq_constraint_checks)
5. health dashboard -- sessionized activity + hourly OHLC + LOCF-filled gauge
                       (sessionize_batch / ohlc_hourly / locf_fill)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.session import get_spark

SF = "/root/testdata/sf0.001"

STEPS = [
    ("1. catch-up delta since checkpoint LSN 100 (top rows)", "cdc_changes_between"),
    ("2. reconcile state@LSN400 vs state@LSN800", "cdc_snapshot_diff"),
    ("3. SCD2 version history (current rows only)", "cdc_scd2"),
    ("4. constraint audit (violations should be 0)", "dq_constraint_checks"),
    ("5a. sessionized activity", "sessionize_batch"),
    ("5b. hourly OHLC rollup", "ohlc_hourly"),
    ("5c. LOCF-filled hourly gauge", "locf_fill"),
]


def main() -> None:
    spark = get_spark(app_name="replica-ops", master="local[8]", shuffle_partitions=8)
    registry.load_all()
    for title, key in STEPS:
        df = registry.get(key).fn(spark, SF)
        print(f"\n== {title} [{key}] ==")
        df.show(5, truncate=False)
        print(f"   ({df.count()} rows total)")
    print("\nreplica-operations walkthrough complete.")


if __name__ == "__main__":
    main()
