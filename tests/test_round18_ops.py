"""Round-12 operator gates (batches A-E, the 23 new registered keys):
semantic invariants on the fixtures plus planted-defect recoveries for
the audit-flavored ops. Oracle hash parity is pinned separately by the
driver sim / test_oracle_parity; these tests pin the MEANING.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _rows(spark, sf_dir, key):
    return registry.get(key).fn(spark, sf_dir).collect()


# -- dialect / DQ -----------------------------------------------------------


def test_agg_filter_empty_set_semantics(spark, sf_dir):
    """The unsatisfiable status-'X' filter must yield NULL sums (the
    SQL standard's empty-set contract) while counts stay integers."""
    for r in _rows(spark, sf_dir, "sqlapi_agg_filter"):
        assert r["absent_cents"] is None
        assert r["n_final"] <= r["n_orders"]
        assert r["n_final"] >= 0


def test_win_ignore_nulls_locf_semantics(spark, sf_dir):
    """locf carries the last NON-NULL value: wherever nval is not null,
    locf == nval; wherever locf is null, no prior non-null exists for
    that user; first_cents never changes within a user once set."""
    rows = _rows(spark, sf_dir, "win_ignore_nulls")
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["event_id"])):
        seen = by_user.setdefault(r["user_id"], [])
        if r["nval"] is not None:
            assert r["locf_cents"] == r["nval"]
        elif not seen:
            assert r["locf_cents"] is None
        else:
            assert r["locf_cents"] == seen[-1]
        if r["nval"] is not None:
            seen.append(r["nval"])


def test_fd_audit_flags_planted_violation(spark, tmp_path):
    """A corpus where source s0 carries two langs must report the
    documents.source->lang dependency violated; a clean one must hold."""
    import shutil

    sf = str(tmp_path / "sf")
    from change_data_capture_service_spark.catalog import TABLE_NAMES

    for t in TABLE_NAMES:
        if t == "documents":
            continue
        load_table(spark, conftest_sf(), t).limit(30).coalesce(1).write.parquet(
            f"{sf}/{t}.parquet"
        )
    docs = [
        (1, "a b", "en", "s0", 3),
        (2, "c d", "de", "s0", 3),  # violation: s0 -> {en, de}
        (3, "e f", "fr", "s1", 3),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = {r["fd"]: r for r in _rows(spark, sf, "dq_functional_dependency_audit")}
    r = rows["documents.source->lang"]
    assert r["holds"] == 0 and r["n_violating"] == 1 and r["max_rhs_distinct"] == 2
    shutil.rmtree(sf, ignore_errors=True)


def conftest_sf():
    import os

    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


# -- daily-series diagnostics ----------------------------------------------


def test_turning_points_bounds(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_turning_points_test")[0]
    assert 0 <= r["n_turning"] <= r["n_days"] - 2
    assert abs(r["expected"] - 2.0 * (r["n_days"] - 2) / 3.0) < 1e-6


def test_turning_points_constructed_series(spark, tmp_path):
    """A strictly alternating daily series has a turning point at every
    interior day; a strictly monotone one has zero."""
    import datetime

    for mode, want in (("alt", 5), ("mono", 0)):
        sf = str(tmp_path / mode)
        rows, eid = [], 0
        for d in range(7):
            n = (3 if d % 2 == 0 else 1) if mode == "alt" else d + 1
            for _ in range(n):
                rows.append(
                    (eid, __import__("datetime").datetime(2024, 1, 1 + d), 1, "t", 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(f"{sf}/events.parquet")
        r = registry.get("events_turning_points_test").fn(spark, sf).collect()[0]
        assert r["n_turning"] == want, (mode, r)


def test_grubbs_argmax_is_true_extreme(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_grubbs_outlier_daily")[0]
    assert r["g_stat"] >= 0
    # the flagged day's deviation equals the max deviation by construction;
    # re-derive from the daily rollup
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    cnts = [x["cnt"] for x in daily]
    mean = sum(cnts) / len(cnts)
    assert abs(abs(r["outlier_cnt"] - mean) - max(abs(c - mean) for c in cnts)) < 1e-6


def test_kpss_properties(spark, sf_dir, tmp_path):
    r = _rows(spark, sf_dir, "events_kpss_level_stat")[0]
    assert r["kpss_eta"] >= 0
    # a strongly trending series must blow past the stationarity bar
    import datetime

    sf = str(tmp_path / "trend")
    rows, eid = [], 0
    for d in range(30):
        for _ in range(1 + d * 5):
            rows.append((eid, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), 1, "t", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    rt = registry.get("events_kpss_level_stat").fn(spark, sf).collect()[0]
    assert rt["kpss_eta"] > 0.463 and rt["level_stationary_5pct"] == 0


def test_variance_time_ratio_consistency(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_variance_time_ratio")[0]
    assert r["n_weeks"] <= r["n_days"] // 7
    assert r["var_daily"] >= 0 and r["var_weekly"] >= 0
    if r["var_daily"] > 0:
        assert abs(r["vr7"] - r["var_weekly"] / (7 * r["var_daily"])) < 1e-3


def test_median_test_cells_partition_days(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_median_test_weekend")[0]
    n_classified = r["we_above"] + r["we_below"] + r["wd_above"] + r["wd_below"]
    n_days = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )
    # equal-to-median days are excluded; everything else is classified
    assert n_classified <= n_days
    assert r["chi2"] >= 0


# -- warehouse --------------------------------------------------------------


def test_shift_share_identity(spark, sf_dir):
    """delta = national + mix + competitive EXACTLY (snapped space)."""
    for r in _rows(spark, sf_dir, "nation_revenue_shift_share"):
        lhs = r["delta_cents"]
        rhs = r["national_effect"] + r["mix_effect"] + r["competitive_effect"]
        assert abs(lhs - rhs) < 0.002, r


def test_substitute_pairs_fences(spark, sf_dir):
    for r in _rows(spark, sf_dir, "part_substitute_pairs"):
        assert r["a_key"] < r["b_key"]
        assert r["a_brand"] != r["b_brand"]
        assert abs(r["a_size"] - r["b_size"]) <= 1
        assert r["gap_cents"] >= 0


def test_fulfillment_sla_monotone(spark, sf_dir):
    for r in _rows(spark, sf_dir, "orders_fulfillment_sla_weekly"):
        assert 0 <= r["pct_30d"] <= r["pct_60d"] <= r["pct_90d"] <= 1


def test_latency_trend_vs_profile(spark, sf_dir):
    rows = _rows(spark, sf_dir, "supplier_latency_trend_by_nation")
    assert rows
    for r in rows:
        assert r["mean_delay_d"] >= 0
        assert r["n_lines"] >= 2


def test_purchase_regularity_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "customer_purchase_regularity_by_segment"):
        assert r["avg_cv"] >= 0
        assert 0 <= r["share_regular"] <= 1


# -- CDC monitors -----------------------------------------------------------


def test_hot_key_skew_share_ordering(spark, sf_dir):
    for r in _rows(spark, sf_dir, "cdc_hot_key_skew_daily"):
        assert 0 < r["top1_share"] <= r["top10_share"] <= 1 + 1e-9
        # HHI bounds: 1/n_keys <= hhi <= top1_share (since top1 is max share)
        assert r["hhi"] <= r["top1_share"] + 1e-6
        assert r["hhi"] >= 1.0 / r["n_keys"] - 1e-6


def test_payload_size_profile_ordering(spark, sf_dir):
    for r in _rows(spark, sf_dir, "cdc_payload_size_profile"):
        assert r["p50_chars"] <= r["p95_chars"] <= r["p99_chars"] <= r["max_chars"]
        assert r["total_chars"] >= r["n_events"]  # every payload >= 1 char


# -- curation / text --------------------------------------------------------


def test_hapax_bounds_and_reconciliation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_hapax_legomena_share")
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["vocab_size"] <= r["n_tokens"]
        assert 0 <= r["hapax_token_share"] <= r["hapax_vocab_share"] <= 1


def test_garbage_panel_flags_planted_noise(spark, tmp_path):
    """A source of hex-dump docs must flag ~100%; clean prose ~0%."""
    sf = str(tmp_path / "sf")
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en", "clean", 60),
        (2, "a plain sentence with ordinary words and no digits at all", "en", "clean", 57),
        (3, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!! ;;;; ::::", "en", "noisy", 59),
        (4, "00 11 22 33 44 55 66 77 88 99 aa bb cc dd ee ff 00 11 22 33", "en", "noisy", 59),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r["source"]: r for r in registry.get("text_garbage_token_panel").fn(spark, sf).collect()}
    assert rows["noisy"]["flagged_share"] == 1.0
    assert rows["clean"]["flagged_share"] == 0.0


def test_lang_confusion_row_shares_sum_to_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "docs_lang_confusion_matrix")
    per = {}
    for r in rows:
        per.setdefault(r["declared"], []).append(r["row_share"])
        assert r["detected"] in ("en", "de", "fr")
    for declared, shares in per.items():
        assert abs(sum(shares) - 1.0) < 1e-4, declared


def test_length_gini_bounds_and_template_signal(spark, sf_dir, tmp_path):
    for r in _rows(spark, sf_dir, "docs_length_gini_by_source"):
        assert -1e-6 <= r["length_gini"] <= 1
    # template farm (identical lengths) -> gini ~ 0; spread -> gini >> 0
    sf = str(tmp_path / "sf")
    docs = [(i, "x", "en", "tmpl", 100) for i in range(10)]
    docs += [(100 + i, "x", "en", "varied", (i + 1) * 40) for i in range(10)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r["source"]: r for r in registry.get("docs_length_gini_by_source").fn(spark, sf).collect()}
    assert rows["tmpl"]["length_gini"] == 0.0
    assert rows["varied"]["length_gini"] > 0.2


# -- retrieval / similarity / graph ----------------------------------------


def test_ranker_overlap_bounds(spark, sf_dir):
    r = _rows(spark, sf_dir, "search_bm25_vs_ql_overlap")[0]
    assert 0 <= r["n_common"] <= 20
    assert 0 <= r["jaccard"] <= 1
    # footrule over k common ranks is bounded by sum of max displacements
    assert r["footrule_common"] <= 20 * 19
    assert r["top1_same"] in (0, 1)


def test_lowe_ratio_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "knn_lowe_ratio_profile")
    assert len(rows) == 5
    for r in rows:
        assert r["nn1_cosine"] >= r["nn2_cosine"]
        if r["lowe_ratio"] is not None:
            assert r["lowe_ratio"] >= 0
            assert r["is_distinctive"] == (1 if r["lowe_ratio"] < 0.8 else 0)


def test_duplicate_audit_finds_planted_dups(spark, sf_dir, tmp_path):
    r = _rows(spark, sf_dir, "embedding_exact_duplicate_audit")[0]
    assert r["n_distinct"] <= r["n_vectors"]
    # plant: 3 copies of one vector + 2 singletons
    sf = str(tmp_path / "sf")
    v = [float(i) for i in range(8)]
    rows = [(1, v, 0), (2, v, 0), (3, v, 1), (4, [9.0] * 8, 1), (5, [7.0] * 8, 2)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    rp = registry.get("embedding_exact_duplicate_audit").fn(spark, sf).collect()[0]
    assert rp["n_vectors"] == 5 and rp["n_distinct"] == 3
    assert rp["n_dup_groups"] == 1 and rp["n_in_dup_groups"] == 3
    assert rp["max_group_size"] == 3
    assert abs(rp["removable_share"] - 2 / 5) < 1e-6


def test_degree_tail_alpha_positive(spark, sf_dir):
    r = _rows(spark, sf_dir, "graph_degree_tail_alpha")[0]
    assert r["n_nodes"] >= 1 and r["n_stubs"] >= r["n_nodes"]
    assert r["max_degree"] >= r["threshold_degree"]
    if r["tail_alpha"] is not None:
        assert r["tail_alpha"] > 0
