"""Reliability & data-quality audit pipeline (round-12 operator tour).

The ops-review sequence a replication-pipeline owner runs before
trusting (or re-sizing) a deployment, end to end on one SparkSession:

1. STRUCTURE -- dq_functional_dependency_audit: do the dependencies the
   downstream joins assume actually hold? A violated "key" is a silent
   fan-out in every consumer.
2. SKEW -- cdc_hot_key_skew_daily: is change traffic concentrated on hot
   keys (the salting / AQE-skew decision), and is it getting worse?
3. SIZING -- cdc_payload_size_profile + cdc_state_size_projection: the
   Kafka message-size / ES bulk-byte budgets and the stateful-operator
   memory plan, measured from the log itself.
4. DELIVERY -- cdc_duplicate_delivery_audit: how much at-least-once
   replay actually reached the sink (the idempotent-upsert write
   amplification).
5. HONESTY -- events_conformal_naive_backtest: do the capacity
   forecast's 90% intervals actually cover 90% out of sample?

Run: python examples/reliability_audit_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.session import get_spark

    spark = get_spark(app_name="reliability-audit")
    registry.load_all()

    def show(key: str, n: int = 10) -> None:
        print(f"\n== {key}")
        registry.get(key).fn(spark, sf_dir).show(n, truncate=False)

    # 1. do the assumed functional dependencies hold?
    show("dq_functional_dependency_audit")

    # 2. hot-key concentration: the skew-mitigation decision panel
    show("cdc_hot_key_skew_daily", 7)

    # 3a. payload envelope per stream (broker/bulk sizing)
    show("cdc_payload_size_profile")

    # 3b. stateful-operator memory projection for THIS corpus
    show("cdc_state_size_projection")

    # 4. how much duplicate delivery reached the sink
    show("cdc_duplicate_delivery_audit")

    # 5. are the forecast intervals honest out of sample?
    show("events_conformal_naive_backtest")

    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
