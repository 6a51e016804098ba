"""Round-12 queue-stock operator gates (registered behind the round-11
check window): watermark-skew panel identities, workload-balance
invariants, and cohort-quality-decay identities.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_watermark_skew_panel_identities(spark, sf_dir):
    """At least one stream sits AT the global watermark (skew 0), every
    skew is non-negative, the freshest stream_max_ts equals the global
    max event time, and the laggard flag is exactly (skew > budget)."""
    from change_data_capture_service_spark.operators.cdc import SLA_GAP_SECONDS

    rows = registry.get("cdc_watermark_skew_by_table").fn(spark, sf_dir).collect()
    assert rows, "panel must be non-empty"
    skews = [r["skew_s"] for r in rows]
    assert min(skews) == 0.0
    assert all(s >= 0 for s in skews)
    gmax = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()[0]["m"]
    )
    freshest = max(r["stream_max_ts"] for r in rows)
    import calendar

    got_us = calendar.timegm(freshest.timetuple()) * 1_000_000 + freshest.microsecond
    assert got_us == gmax
    for r in rows:
        assert r["is_laggard"] == (1 if r["skew_s"] > SLA_GAP_SECONDS else 0)


def test_workload_balance_invariants(spark, sf_dir):
    """Per month: max_share bounded by [1/n_suppliers, 1]; CV is NULL
    only on single-supplier months; total lines reconcile with the fact
    table."""
    rows = registry.get("supplier_workload_balance_monthly").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_suppliers"] >= 1
        lo = 1.0 / r["n_suppliers"]
        assert lo - 1e-9 <= r["max_share"] <= 1.0 + 1e-9, r
        if r["n_suppliers"] == 1:
            assert r["cv_load"] is None
        else:
            assert r["cv_load"] is not None and r["cv_load"] >= 0
    total = sum(r["total_lines"] for r in rows)
    n_li = load_table(spark, sf_dir, "lineitem").count()
    assert total == n_li


def test_cohort_quality_decay_identities(spark, sf_dir):
    """Age-0 retention is exactly 1 for every cohort; ages are
    non-negative; age-0 active counts partition the customer base of
    first-order years; orders_per_customer >= 1 everywhere."""
    rows = registry.get("customer_cohort_quality_decay").fn(spark, sf_dir).collect()
    assert rows
    by_cohort_age0 = {}
    for r in rows:
        assert r["age"] >= 0
        assert r["orders_per_customer"] >= 1.0
        if r["age"] == 0:
            assert r["revenue_retention"] == pytest.approx(1.0)
            by_cohort_age0[r["cohort_year"]] = r["n_active"]
    # every cohort year present at age 0 (first order defines the cohort)
    assert set(by_cohort_age0) == {r["cohort_year"] for r in rows}
    o = load_table(spark, sf_dir, "orders")
    n_custs = o.select("o_custkey").distinct().count()
    assert sum(by_cohort_age0.values()) == n_custs
