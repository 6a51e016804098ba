"""Round-13 wave-1 operator gates (registered inside the round-13 check
window): NRR bridge identity, Wilson-ranking dominance, shipment-span
bounds, calendar-spine reconciliation, and forecast-combination argmin
consistency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _rows(spark, sf_dir, key):
    return registry.get(key).fn(spark, sf_dir).collect()


def test_nrr_bridge_identity_and_bounds(spark, sf_dir):
    """The bridge identity holds EXACTLY in cents, so the presented
    revenue columns reconcile to < 3e-6 (three 2dp-rounded divisions):
    retained = prev_total - churned + expansion - contraction."""
    rows = _rows(spark, sf_dir, "customer_nrr_monthly")
    assert len(rows) >= 2
    for r in rows:
        lhs = r["retained_revenue"]
        rhs = (
            r["prev_revenue"]
            - r["churned_revenue"]
            + r["expansion_revenue"]
            - r["contraction_revenue"]
        )
        assert abs(lhs - rhs) < 3e-6, (r["month_start"], lhs, rhs)
        assert r["nrr"] >= 0
        assert r["retained_revenue"] <= r["prev_revenue"] + r["expansion_revenue"]
        assert r["n_retained"] >= 0 and r["n_new"] >= 0 and r["n_churned"] >= 0


def test_wilson_ranking_dominance_and_order(spark, sf_dir):
    """The Wilson lower bound is strictly below the raw rate for finite
    n (that's the whole point), rows arrive ranked by it, and the
    minimum-sample gate held."""
    rows = _rows(spark, sf_dir, "supplier_ontime_wilson_ranking")
    assert 1 <= len(rows) <= 25
    prev = None
    for r in rows:
        assert r["n_lines"] >= 20
        assert 0 <= r["wilson_lb"] < r["ontime_rate"] <= 1
        if prev is not None:
            assert r["wilson_lb"] <= prev + 1e-9
        prev = r["wilson_lb"]


def test_wilson_small_sample_underdog(spark):
    """19/20 must NOT outrank 940/1000: the Wilson bound of the small
    perfect-looking sample sits below the big slightly-worse one."""
    import math

    def wilson(ontime, n, z=1.96):
        p = ontime / n
        z2 = z * z
        return (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n))) / math.sqrt(n)) / (1 + z2 / n)

    assert wilson(19, 20) < wilson(940, 1000)
    # canonical spot values for the CORRECTED bound (z=1.96):
    # 19/20 -> 0.7639, 20/20 -> 0.8389 (was 0.7954/0.9014 under the
    # z^2/(4n^3) bug the round-13 advisor flagged).
    assert abs(wilson(19, 20) - 0.7639) < 5e-4
    assert abs(wilson(20, 20) - 0.8389) < 5e-4


def test_shipment_split_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "orders_shipment_split_profile")
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["single_window_share"] <= 1
        assert 0 <= r["mean_span_days"] <= r["max_span_days"] + 1e-9
        assert 0 <= r["p90_span_days"] <= r["max_span_days"]


def test_calendar_completeness_reconciles_to_spine(spark, sf_dir):
    """expected = observed + missing per dow, and the dow expected
    counts sum to the full inclusive day span."""
    rows = _rows(spark, sf_dir, "orders_calendar_completeness_audit")
    assert len(rows) == 7
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    b = o.agg(
        F.datediff(
            F.date_trunc("day", F.max("o_orderdate")),
            F.date_trunc("day", F.min("o_orderdate")),
        ).alias("span")
    ).collect()[0]
    assert sum(r["expected_days"] for r in rows) == b["span"] + 1
    for r in rows:
        assert r["expected_days"] == r["observed_days"] + r["missing_days"]
        assert 0 <= r["coverage"] <= 1


def test_forecast_combination_argmin_consistency(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_forecast_combination_mae")[0]
    maes = {
        "naive": r["mae_naive"],
        "snaive7": r["mae_snaive7"],
        "ma7": r["mae_ma7"],
        "combo": r["mae_combo"],
    }
    assert all(v >= 0 for v in maes.values())
    assert r["best_model"] in maes
    # the named best model's MAE is the minimum (to rounding grain)
    assert maes[r["best_model"]] <= min(maes.values()) + 2e-6
    assert r["n_test_days"] >= 1


def test_int8_recall_bounds_and_distortion(spark, sf_dir):
    r = _rows(spark, sf_dir, "embedding_int8_recall_eval")[0]
    assert r["n_queries"] >= 1
    assert 0 <= r["min_recall"] <= r["avg_recall"] <= 1
    # int8 symmetric quantization of 64-d vectors distorts cosines by
    # well under 0.05 and keeps most of the exact top-10
    assert r["avg_recall"] >= 0.5
    assert 0 <= r["avg_abs_cos_err"] < 0.05


def _write_planted_embeddings(spark, tmp_path, centers, per=25, noise=0.01):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for li, c in enumerate(centers):
        for _ in range(per):
            v = (np.asarray(c) + rng.normal(0, noise, len(c))).astype("float32")
            rows.append((vid, v.tolist(), li))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "planted_sf")
    df.write.parquet(f"{out}/embeddings.parquet")
    return out


def test_kmedoids_planted_clusters(spark, tmp_path):
    """Four well-separated planted clusters, k=4: one medoid lands in
    each, sizes conserve the corpus, deviation shares sum to 1."""
    centers = [[0.0] * 8, [10.0] + [0.0] * 7, [0.0, 10.0] + [0.0] * 6,
               [0.0, 0.0, 10.0] + [0.0] * 5]
    out = _write_planted_embeddings(spark, tmp_path, centers)
    rows = registry.get("cluster_kmedoids_pam").fn(spark, out, k=4)
    rows = rows.collect()
    assert len(rows) == 4
    assert sum(r["cluster_size"] for r in rows) == 100
    sizes = sorted(r["cluster_size"] for r in rows)
    assert sizes == [25, 25, 25, 25]  # one medoid per planted cluster
    assert abs(sum(r["deviation_share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["swapped"] for r in rows) <= 1


def test_birch_planted_clusters_and_conservation(spark, tmp_path):
    centers = [[0.0] * 8, [10.0] + [0.0] * 7]
    out = _write_planted_embeddings(spark, tmp_path, centers, per=30)
    rows = registry.get("cluster_birch_cf_profile").fn(spark, out).collect()
    assert len(rows) >= 2
    assert sum(r["n_points"] for r in rows) == 60
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    # the two planted blobs must not share a leaf: the top-2 leaves
    # carry all points and tight radii far under the blob separation
    top = sorted(rows, key=lambda r: -r["n_points"])[:2]
    assert sum(r["n_points"] for r in top) == 60
    for r in top:
        assert r["radius"] < 1.0
    assert all(r["threshold"] == rows[0]["threshold"] for r in rows)


def test_birch_full_corpus_conservation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "cluster_birch_cf_profile")
    from change_data_capture_service_spark.operators.similarity import _vectors

    n = _vectors(spark, sf_dir).count()
    assert sum(r["n_points"] for r in rows) == n
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3


def test_codec_probe_matrix_shape_and_stdlib_truths(spark, sf_dir):
    from change_data_capture_service_spark.operators.multimodal import (
        CODEC_PROBE_MATRIX,
        REAL_DECODERS_AVAILABLE,
    )

    rows = _rows(spark, sf_dir, "multimodal_codec_probe_matrix")
    assert len(rows) == len(CODEC_PROBE_MATRIX)
    by_lib = {r["codec_lib"]: r for r in rows}
    # stdlib + baked-in deps are available in ANY python runtime
    assert by_lib["wave"]["available"] == 1
    assert by_lib["numpy"]["available"] == 1
    assert by_lib["numpy"]["active_path"] == "real"
    # executor-side PIL probe agrees with the module's import probe
    # (driver == executor runtime in local mode)
    assert bool(by_lib["PIL"]["available"]) == REAL_DECODERS_AVAILABLE
    for r in rows:
        assert r["active_path"] == ("real" if r["available"] else "fake")


def test_status_consistency_partition_identity(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dq_status_consistency_audit")
    assert {r["o_orderstatus"] for r in rows} == {"F", "O", "P"}
    for r in rows:
        assert r["n_with_lines"] <= r["n_orders"]
        assert r["n_consistent"] + r["n_violations"] == r["n_with_lines"]
        assert 0 <= r["violation_share"] <= 1


def test_status_consistency_planted_semantics(spark, tmp_path):
    """An 'F' order with an open line is a violation; an 'F' order with
    all-'F' lines is consistent; a lineless order counts but never
    violates."""
    out = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, 1, "F", 10.0, "1995-01-01", "1-URGENT"),
         (2, 1, "F", 10.0, "1995-01-01", "1-URGENT"),
         (3, 1, "O", 10.0, "1995-01-01", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
                 "o_orderpriority").write.parquet(f"{out}/orders.parquet")
    li = [(1, 1, "F"), (1, 2, "F"), (2, 1, "O")]
    spark.createDataFrame(
        [(ok, ln, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", ls, "1995-01-02")
         for ok, ln, ls in li],
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus",
                 "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
                 ).write.parquet(f"{out}/lineitem.parquet")
    rows = {r["o_orderstatus"]: r for r in
            registry.get("dq_status_consistency_audit").fn(spark, out).collect()}
    assert rows["F"]["n_consistent"] == 1 and rows["F"]["n_violations"] == 1
    assert rows["O"]["n_orders"] == 1 and rows["O"]["n_with_lines"] == 0
    assert rows["O"]["n_violations"] == 0


def test_linenumber_density_partition_and_planted(spark, sf_dir, tmp_path):
    r = _rows(spark, sf_dir, "lineitem_linenumber_density_audit")[0]
    assert r["n_dense"] + r["n_duplicated"] + r["n_gapped"] == r["n_orders"]
    assert 0 <= r["dense_share"] <= 1
    # planted: order 1 dense (1,2), order 2 duplicated (1,1), order 3 gapped (2,3)
    out = str(tmp_path / "sf")
    rows = [(1, 1), (1, 2), (2, 1), (2, 1), (3, 2), (3, 3)]
    spark.createDataFrame(
        [(ok, ln, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", "1995-01-02") for ok, ln in rows],
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).write.parquet(f"{out}/lineitem.parquet")
    p = registry.get("lineitem_linenumber_density_audit").fn(spark, out).collect()[0]
    assert (p["n_orders"], p["n_dense"], p["n_duplicated"], p["n_gapped"]) == (3, 1, 1, 1)


def test_facet_decomposition_shares(spark, sf_dir):
    rows = _rows(spark, sf_dir, "part_type_facet_decomposition")
    from collections import defaultdict

    by_pos = defaultdict(list)
    for r in rows:
        by_pos[r["facet_pos"]].append(r)
    assert set(by_pos) == {1, 2, 3}
    totals = {p: sum(r["n_parts"] for r in rs) for p, rs in by_pos.items()}
    assert len(set(totals.values())) == 1  # every facet covers every part
    for p, rs in by_pos.items():
        assert abs(sum(r["facet_share"] for r in rs) - 1.0) < 1e-4


def test_vocab_jaccard_bounds_and_pair_count(spark, sf_dir):
    rows = _rows(spark, sf_dir, "docs_source_vocab_jaccard")
    sources = {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert 0 <= r["jaccard"] <= 1
        assert r["n_common"] <= min(r["n_terms_a"], r["n_terms_b"])
        assert r["source_a"] < r["source_b"]


def test_calendar_heatmap_shares_and_index(spark, sf_dir):
    rows = _rows(spark, sf_dir, "orders_revenue_calendar_heatmap")
    assert len(rows) <= 84
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    # order-weighted mean of the AOV index is 1 by construction
    tot_orders = sum(r["n_orders"] for r in rows)
    wmean = sum(r["aov_index"] * r["n_orders"] for r in rows) / tot_orders
    assert abs(wmean - 1.0) < 1e-2
    for r in rows:
        assert 1 <= r["month"] <= 12 and 0 <= r["dw"] <= 6


def test_distinct_on_dialect_first_order_per_customer(spark, sf_dir):
    rows = _rows(spark, sf_dir, "sqlapi_distinct_on_dialect")
    assert len({r["o_custkey"] for r in rows}) == len(rows)  # one row per cust
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert len(rows) == n_cust


def test_cross_source_matrix_planted_and_total(spark, sf_dir, tmp_path):
    # the fixture corpus has NO exact duplicates: every grid cell is 0,
    # but the zero-filled spine still covers all pairs + diagonals
    rows = _rows(spark, sf_dir, "dedup_cross_source_matrix")
    srcs = {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n + 1) // 2
    assert all(r["n_families"] == 0 and r["n_doc_pairs"] == 0 for r in rows)
    # planted: doc text X appears twice in src a and once in src b
    out = str(tmp_path / "sf")
    docs = [(1, "dup text", "en", "a", 8), (2, "dup text", "en", "a", 8),
            (3, "dup text", "en", "b", 8), (4, "unique", "en", "b", 6)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    got = {(r["source_a"], r["source_b"]): r for r in
           registry.get("dedup_cross_source_matrix").fn(spark, out).collect()}
    assert got[("a", "a")]["n_families"] == 1 and got[("a", "a")]["n_doc_pairs"] == 1
    assert got[("a", "b")]["n_families"] == 1 and got[("a", "b")]["n_doc_pairs"] == 2
    assert got[("b", "b")]["n_families"] == 0


def test_pam_sample_cap_bounds_the_driver_fit(spark, monkeypatch):
    """Grain contract for the PAM/BIRCH driver fit (the
    SERIES_FOLD_MAX_POINTS discipline): _pam_fit must see at most
    PAM_SAMPLE_CAP rows -- the vec_id-ordered PREFIX -- no matter how
    large the corpus, so a fixture change can never silently grow the
    O(k * n_sample^2) driver-side distance matrix. Monkeypatched cap 4
    over a 10-vector frame: every returned medoid must come from
    vec_ids {0..3}, and the fit must be the same as fitting the prefix
    alone (proving nothing past the cap leaked in)."""
    from change_data_capture_service_spark.operators import similarity

    vecs = [(i, [float(i), float(i % 3)]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    monkeypatch.setattr(similarity, "PAM_SAMPLE_CAP", 4)
    fit = similarity._pam_fit(df, k=2)
    assert len(fit) == 2
    assert {vid for _, vid, _, _ in fit} <= {0, 1, 2, 3}
    prefix_only = similarity._pam_fit(
        spark.createDataFrame(vecs[:4], "vec_id long, v array<double>"), k=2
    )
    assert [(r, vid) for r, vid, _, _ in fit] == [
        (r, vid) for r, vid, _, _ in prefix_only
    ]


def test_pam_k1_build_medoid_stands_unswapped(spark):
    """Round-13 ADVICE: with k == 1 there is no second-nearest medoid, so
    the swap pass is skipped -- the 1-medoid fit is exactly BUILD's
    argmin (the point minimizing total distance, here the middle of a
    line), never a spurious swap against a corrupt baseline."""
    from change_data_capture_service_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)], "vec_id long, v array<double>"
    )
    fit = similarity._pam_fit(df, k=1)
    assert len(fit) == 1
    rank, vid, _, swapped = fit[0]
    assert (rank, vid, swapped) == (1, 2, 0)  # the median point, no swap
