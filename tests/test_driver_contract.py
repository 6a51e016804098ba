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


# The front keys form the driver's bounded-budget check window for round 15
# (an OPTIMIZATION round -- no new operators): CORRECTNESS_r14 closed the
# round-14 window (50 keys, 0 failures), leaving exactly the 8 X92
# queue-stock keys (registered behind the r14 window, judge-sim verified
# clean at both SFs per the round-14 session log) never driver-attested;
# they rotate to the front, then the 13 round-14-rewritten oracle keys the
# r14 verdict ordered driver-attested post-rewrite, then this round's
# optimization targets and RE-ATTESTATION slots -- previously-green keys
# whose implementation files are diff-touched by this round's
# optimizations, so the driver record tracks drift. This order is
# load-bearing for grading -- an import refactor that silently reorders it
# would unprove operators -- so it is pinned here as a contract. Rounds
# 1-14 attested 579 keys with zero failures (CORRECTNESS_r01-r14 on record).
_R15_CHECK_WINDOW = [
    'text_burrows_delta_matrix',
    'sqlapi_pivot_dialect',
    'events_dfa_alpha',
    'events_recurrence_quantification',
    'orders_cohort_ultimate_projection',
    'supplier_volume_fano_panel',
    'lineitem_price_stickiness_panel',
    'lineitem_bullwhip_ratio_panel',
    'dedup_containment_pairs',
    'knn_graph_reciprocity',
    'embedding_kdist_profile',
    'knn_hubness_profile',
    'text_fuzzy_levenshtein',
    'dedup_minhash_near',
    'dedup_minhash_tuned',
    'dedup_minhash_lines',
    'dedup_minhash_estimate_quality',
    'dedup_lsh_tuning_curve',
    'dedup_semantic_minhash_union',
    'basket_brand_pairs',
    'part_link_prediction_adamic_adar',
    'part_price_ladder_by_nation',
    'lineitem_spearman_qty_price',
    'lineitem_ansari_bradley_returnflag',
    'graph_label_propagation',
    'dedup_exact_substring_runs',
    'knn_cosine_topk',
    'knn_l2_topk',
    'knn_label_purity',
    'knn_mmr_diversified',
    'knn_lowe_ratio_profile',
    'knn_cosine_ivf',
    'knn_cosine_ivf_pq',
    'knn_recall_eval',
    'embedding_int8_recall_eval',
    'lineitem_price_mann_kendall',
    'events_mannwhitney_purchase_ab',
    'lineitem_theilsen_price_trend',
    'graph_triangle_count',
    'graph_kcore',
    'graph_edge_jaccard_similarity',
    'dedup_exact',
    'dedup_simhash',
    'dedup_cluster_profile',
    'dedup_exact_vs_near_overlap',
    'multimodal_phash_dedup',
    'basket_brand_lift',
    'tpch_q5_local_supplier',
    'text_tokenize_tf',
    'docs_source_vocab_jaccard',
]


def test_check_window_order_is_pinned():
    n = len(_R15_CHECK_WINDOW)
    assert list(registry.entries())[:n] == _R15_CHECK_WINDOW


def test_check_order_names_are_all_registered():
    missing = [k for k in registry._CHECK_ORDER if k not in registry.entries()]
    assert not missing, f"_CHECK_ORDER names unknown keys: {missing}"
