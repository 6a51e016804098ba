"""Revenue-retention dashboard: the monthly monetization review as one
pipeline -- the round-13 wave of warehouse operators composed the way a
revenue team actually reads them.

    python examples/revenue_retention_dashboard.py

1. LEVERS -- ARPU/AOV/orders-per-customer decomposition per month
   (which lever moved), then the NRR bridge (did the SAME customers
   grow, or did acquisition paper over churn?).
2. FULFILLMENT HONESTY -- the Wilson-ranked on-time league table (a
   19/20 supplier must not outrank a 940/1000 one) and the
   split-shipment consolidation panel.
3. CALENDAR -- the (month x dow) revenue/AOV-index heatmap and the
   day-spine completeness audit that says whether the calendar itself
   has ingestion holes before anyone reads seasonality off it.

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

    spark = get_spark(app_name="revenue-retention-example")
    registry.load_all()
    q = registry.queries()

    print("== 1. revenue levers (last 3 months)")
    arpu = q["orders_arpu_monthly"](spark, SF_DIR).collect()[-3:]
    for r in arpu:
        print(
            f"  {r['month_start']:%Y-%m}: revenue={r['revenue']:.0f}"
            f" arpu={r['arpu']:.2f} aov={r['aov']:.2f}"
            f" orders/cust={r['orders_per_customer']}"
        )
    nrr = q["customer_nrr_monthly"](spark, SF_DIR).collect()[-3:]
    for r in nrr:
        print(
            f"  {r['month_start']:%Y-%m}: nrr={r['nrr']:.3f}"
            f" (retained={r['retained_revenue']:.0f}"
            f" churned={r['churned_revenue']:.0f}"
            f" expansion={r['expansion_revenue']:.0f}"
            f" new={r['new_revenue']:.0f})"
        )

    print("== 2. fulfillment honesty")
    top = q["supplier_ontime_wilson_ranking"](spark, SF_DIR).collect()[:5]
    for r in top:
        print(
            f"  {r['s_name']}: ontime={r['ontime_rate']:.3f}"
            f" wilson_lb={r['wilson_lb']:.3f} (n={r['n_lines']})"
        )
    split = q["orders_shipment_split_profile"](spark, SF_DIR).collect()[-1]
    print(
        f"  last month: single-window share={split['single_window_share']}"
        f" p90 span={split['p90_span_days']}d"
    )

    print("== 3. calendar")
    cal = q["orders_calendar_completeness_audit"](spark, SF_DIR).collect()
    missing = sum(r["missing_days"] for r in cal)
    print(f"  day-spine completeness: {missing} missing days across dows")
    heat = q["orders_revenue_calendar_heatmap"](spark, SF_DIR).collect()
    hot = max(heat, key=lambda r: r["aov_index"])
    print(
        f"  hottest AOV cell: month={hot['month']} dw={hot['dw']}"
        f" aov_index={hot['aov_index']}"
    )

    spark.stop()


if __name__ == "__main__":
    main()
