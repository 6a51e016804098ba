"""Forecast + change-detection pipeline over the event stream: the
capacity-planning loop a CDC consumer's operator runs weekly.

    python examples/forecast_monitoring_pipeline.py

1. BACKTEST SHOOTOUT -- three one-step forecasters on the daily series,
   cheapest first: seasonal-naive baseline, theta (SES + half drift),
   Holt linear. The lowest MAE earns tomorrow's capacity number.
2. RETROSPECTIVE REGIMES -- exact PELT segmentation labels every day
   with its regime and flags the changepoints (where the baseline the
   forecasters extrapolate from actually moved).
3. ONLINE MONITORS -- Page-Hinkley drift statistics (against the
   running mean) plus the watermark-skew and burst-capacity panels that
   say whether the INPUT is trustworthy before anyone trusts the
   forecast.

Every query is a registered operator (COVERAGE.md); this script only
composes them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.session import get_spark

    spark = get_spark(app_name="forecast-monitoring-example")
    registry.load_all()
    q = registry.queries()

    print("== 1. one-step backtest shootout on the DAILY series (lower MAE wins)")
    rows = []
    for key in ("events_theta_method_mae", "events_holt_linear_mae"):
        out = q[key](spark, SF_DIR).collect()
        if not out:
            continue
        r = out[0].asDict()
        rows.append((key, r["mae"], r))
        print(f"  {key:32s} mae={r['mae']}")
    best = min(rows, key=lambda r: r[1])
    print(f"  winner: {best[0]} -> forecast_next={best[2]['forecast_next']}")
    # the hourly-grain predictability check (different grain -- not a
    # competitor of the daily folds, the 'is this stream forecastable
    # at all' gate):
    base = q["events_forecast_baseline_mae"](spark, SF_DIR).collect()
    if base:
        worst_dow = max(base, key=lambda r: r.asDict().get("mae", 0))
        print(f"  seasonal-naive hourly check: worst dow row {worst_dow.asDict()}")

    print("== 2. PELT regimes on the daily series")
    pelt = q["events_changepoint_pelt"](spark, SF_DIR).collect()
    n_seg = max(r["segment_id"] for r in pelt) + 1 if pelt else 0
    print(f"  {len(pelt)} days in {n_seg} regime(s); changepoints:")
    for r in pelt:
        if r["is_changepoint"]:
            print(f"    {r['day']} -> new regime mean {r['seg_mean']}")

    print("== 3. online monitors")
    ph = q["events_page_hinkley_panel"](spark, SF_DIR).orderBy("day").collect()
    worst = max(ph, key=lambda r: max(r["ph_pos"], r["ph_neg"]))
    print(
        f"  page-hinkley peak: {worst['day']} ph_pos={worst['ph_pos']} "
        f"ph_neg={worst['ph_neg']}"
    )
    for r in q["cdc_watermark_skew_by_table"](spark, SF_DIR).collect():
        flag = " LAGGARD" if r["is_laggard"] else ""
        print(f"  watermark {r['event_type']:12s} skew_s={r['skew_s']}{flag}")
    t = q["cdc_throughput_percentiles_minute"](spark, SF_DIR).collect()[0]
    print(
        f"  burst envelope: p50={t['p50_epm']} p95={t['p95_epm']} "
        f"p99={t['p99_epm']} max={t['max_epm']} events/minute"
    )

    spark.stop()


if __name__ == "__main__":
    main()
