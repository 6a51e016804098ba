"""Round-14 wave-1 operator gates: chain-ladder triangle identities,
newsvendor fractile guarantees, RCA marginal identities, and clumpiness
bounds with planted regular-vs-bursty discrimination.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _rows(spark, sf_dir, key):
    return registry.get(key).fn(spark, sf_dir).collect()


def test_cohort_runoff_monotone_and_bounded(spark, sf_dir):
    """Cumulative revenue never shrinks with age (revenue is
    nonnegative), so every development factor >= 1; the cohort count
    shrinks (weakly) as age grows -- the triangle boundary."""
    rows = _rows(spark, sf_dir, "orders_cohort_revenue_runoff")
    assert len(rows) >= 2
    prev_n = None
    for r in rows:
        assert r["cum_revenue_next"] >= r["cum_revenue"] - 1e-6
        if r["dev_factor"] is not None:
            assert r["dev_factor"] >= 1 - 1e-9
        if prev_n is not None:
            assert r["n_cohorts"] <= prev_n
        prev_n = r["n_cohorts"]
    assert rows[0]["age"] == 0


def test_cohort_runoff_age0_covers_first_months(spark, sf_dir):
    """Age-0 cumulative revenue over the factor-eligible cohorts is
    positive and below the full panel revenue."""
    rows = _rows(spark, sf_dir, "orders_cohort_revenue_runoff")
    assert rows[0]["cum_revenue"] > 0
    assert rows[0]["cum_revenue"] <= rows[-1]["cum_revenue_next"] * rows[0]["n_cohorts"]


def test_newsvendor_service_meets_critical_ratio(spark, sf_dir):
    """q* is the CR = 0.8 exact-interp quantile of daily demand, so the
    achieved cycle service level is >= 0.8 minus one day's grain (the
    percentile sits between order statistics); lost sales are 0 exactly
    when service is total."""
    rows = _rows(spark, sf_dir, "lineitem_newsvendor_service_panel")
    assert len(rows) >= 2
    for r in rows:
        assert r["n_days"] >= 1
        grain = 1.0 / r["n_days"]
        assert r["service_level"] >= 0.8 - grain - 1e-9
        assert 0 <= r["service_level"] <= 1
        assert r["mean_lost_sales"] >= 0
        assert r["q_star"] >= 0
        if r["service_level"] == 1.0:
            assert r["mean_lost_sales"] == 0.0


def test_rca_marginal_identity(spark, sf_dir):
    """Revenue-share-weighted RCA sums to 1 per nation (the Balassa
    identity sum_t (x_t/X) * RCA_nt = 1), and the specialized flag
    agrees with rca > 1 wherever rounding leaves room."""
    rows = _rows(spark, sf_dir, "nation_part_rca_matrix")
    assert len(rows) >= 10
    tot = sum(r["revenue"] for r in rows)
    by_facet: dict = {}
    for r in rows:
        by_facet.setdefault(r["facet"], 0.0)
        by_facet[r["facet"]] += r["revenue"]
    for nation in {r["nation"] for r in rows}:
        s = sum(
            (by_facet[r["facet"]] / tot) * r["rca"]
            for r in rows
            if r["nation"] == nation
        )
        assert abs(s - 1.0) < 1e-3, (nation, s)
    for r in rows:
        if abs(r["rca"] - 1.0) > 1e-4:
            assert r["specialized"] == (1 if r["rca"] > 1 else 0)


def test_clumpiness_bounds_and_planted_discrimination(spark, sf_dir, tmp_path):
    """Panel values sit in [0, 1]; a planted metronome customer scores
    near 0 and a planted binge customer near 1, in the right order."""
    rows = _rows(spark, sf_dir, "customer_clumpiness_panel")
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["avg_clumpiness"] <= 1
        assert r["n_customers"] >= 1
        assert r["avg_active_days"] >= 2

    # planted: customer 1 orders on the 1st of every month (regular);
    # customer 2 orders 12 consecutive days then never again (burst)
    rows_in = []
    okey = 0
    for m in range(12):
        okey += 1
        rows_in.append((okey, 1, datetime(2024, 1 + m, 1)))
    for d in range(12):
        okey += 1
        rows_in.append((okey, 2, datetime(2024, 1, 1 + d)))
    orders = spark.createDataFrame(
        [
            {
                "o_orderkey": k,
                "o_custkey": ck,
                "o_orderdate": dt,
                "o_totalprice": 100.0,
                "o_orderpriority": "1-URGENT",
                "o_orderstatus": "O",
            }
            for (k, ck, dt) in rows_in
        ]
    )
    customer = spark.createDataFrame(
        [
            {"c_custkey": 1, "c_mktsegment": "REGULAR", "c_nationkey": 0},
            {"c_custkey": 2, "c_mktsegment": "BURSTY", "c_nationkey": 0},
        ]
    )
    out = str(tmp_path / "planted_sf")
    orders.write.parquet(f"{out}/orders.parquet")
    customer.write.parquet(f"{out}/customer.parquet")
    planted = {
        r["segment"]: r["avg_clumpiness"]
        for r in _rows(spark, out, "customer_clumpiness_panel")
    }
    assert planted["BURSTY"] > planted["REGULAR"]
    assert planted["BURSTY"] > 0.5
    assert planted["REGULAR"] < 0.35
