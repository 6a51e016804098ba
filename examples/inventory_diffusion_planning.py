"""Inventory-and-growth planning review: the round-14 operator wave
composed the way a supply/growth team actually reads it.

    python examples/inventory_diffusion_planning.py

1. DEMAND SHAPE -- the Syntetos-Boylan intermittency census routes each
   part family to a forecaster class; the Hurst / DFA / Allan triage
   says whether the aggregate demand series has long memory, drift, or
   just noise (extrapolate, detrend, or don't bother).
2. HOW MUCH TO STOCK -- EOQ sizes the replenishment cycle per brand,
   the newsvendor critical fractile sizes the per-cycle buffer, and the
   Fano panel says whose load arrives in bursts (who needs the buffer
   most).
3. WHERE THE CEILING IS -- the Bass diffusion fit reads market size and
   the innovation/imitation split from the adoption curve; the cohort
   runoff triangle and its chain-ladder ultimates say how much revenue
   existing cohorts still owe.

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

    spark = get_spark(app_name="inventory-diffusion-example")
    registry.load_all()
    q = registry.queries()

    print("== 1a. demand-shape census (forecaster routing)")
    for r in q["part_demand_intermittency_profile"](spark, SF_DIR).collect():
        print(f"   {r['quadrant']:>12}: {r['n_parts']:>6} parts")

    print("== 1b. series triage: memory vs drift vs noise")
    h = q["events_hurst_rs_estimate"](spark, SF_DIR).collect()[0]
    d = q["events_dfa_alpha"](spark, SF_DIR).collect()[0]
    a = q["events_allan_variance"](spark, SF_DIR).collect()[0]
    print(
        f"   hurst H = {h['hurst']}, DFA alpha = {d['dfa_alpha']},"
        f" allan slope = {a['loglog_slope']}"
    )

    print("== 2a. cycle + buffer sizing (first 5 brands)")
    eoq = {r["p_brand"]: r for r in q["lineitem_eoq_panel"](spark, SF_DIR).collect()}
    nv = q["lineitem_newsvendor_service_panel"](spark, SF_DIR).collect()
    for r in nv[:5]:
        e = eoq.get(r["p_brand"])
        print(
            f"   {r['p_brand']}: EOQ {e['eoq_units'] if e else '-'} units/cycle,"
            f" buffer q* {r['q_star']} (service {r['service_level']})"
        )

    print("== 2b. burstiest suppliers (top 5 by Fano)")
    fano = sorted(
        q["supplier_volume_fano_panel"](spark, SF_DIR).collect(),
        key=lambda r: -r["fano"],
    )
    for r in fano[:5]:
        print(f"   supplier {r['suppkey']}: fano {r['fano']}"
              f" ({'over' if r['overdispersed'] else 'under'}dispersed)")

    print("== 3a. adoption ceiling (Bass fit)")
    b = q["customer_bass_diffusion_fit"](spark, SF_DIR).collect()[0]
    print(
        f"   adopters {b['total_adopters']}, implied market"
        f" {b['market_m']}, p = {b['p_innovation']}, q = {b['q_imitation']}"
    )

    print("== 3b. cohort ultimates (youngest 3 cohorts)")
    for r in q["orders_cohort_ultimate_projection"](spark, SF_DIR).collect()[-3:]:
        print(
            f"   {r['cohort_month']:%Y-%m}: to-date {r['revenue_to_date']:.0f},"
            f" ultimate {r['ultimate_revenue']:.0f}"
            f" (cdf {r['remaining_cdf']})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
