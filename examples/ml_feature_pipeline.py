"""ML feature pipeline over the change stream: the queries a training
platform runs BETWEEN the CDC engine and the model trainer.

    python examples/ml_feature_pipeline.py

1. feature table  -- user-grain RFM/tenure/breadth (events_propensity_features)
2. training set   -- point-in-time-correct churn labels: features strictly
                     before the cutoff, label strictly after
                     (events_churn_training_set)
3. drift gate     -- PSI of the value distribution, first week vs last
                     (events_value_psi_weekly): retrain only if it moved
4. experiment     -- pooled two-proportion z on the active A/B split
                     (events_ab_lift_ztest)

Every stage is a registered, DuckDB-oracle-checked operator; this script
composes them into the retrain-decision flow and prints the verdicts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="ml-feature-pipeline")
    registry.load_all()
    q = registry.queries()

    feat = q["events_propensity_features"](spark, SF)
    print(f"1. feature table: {feat.count()} users x {len(feat.columns)} features")
    feat.show(5)

    train = q["events_churn_training_set"](spark, SF).toPandas()
    churn = train["churned"].mean()
    print(f"2. training set: {len(train)} rows, churn base rate {churn:.1%} "
          "(features pre-cutoff ONLY -- leakage-safe by construction)")

    psi = q["events_value_psi_weekly"](spark, SF).toPandas()
    worst = psi.sort_values("psi", ascending=False).iloc[0]
    verdict = ("RETRAIN" if worst["psi"] > 0.25
               else "monitor" if worst["psi"] > 0.1 else "stable")
    print(f"3. drift gate: worst PSI {worst['psi']:.4f} "
          f"({worst['event_type']}) -> {verdict}")

    ab = q["events_ab_lift_ztest"](spark, SF).toPandas().iloc[0]
    sig = abs(ab["z_score"]) > 1.96 if ab["z_score"] == ab["z_score"] else False
    print(f"4. experiment: lift {ab['abs_lift']:+.4f}, z {ab['z_score']}, "
          f"{'significant at 5%' if sig else 'not significant'}")
    spark.stop()


if __name__ == "__main__":
    main()
