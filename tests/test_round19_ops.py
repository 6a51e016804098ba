"""Round-13 queue-stock operator gates (registered behind the round-12
check window): conformal coverage semantics, completion-curve
monotonicity, sourcing-tier spine totality, state projection
reconciliation, queueing-delay ordering, TextRank planted-hub recovery,
return-rate reconciliation, and Heaps-fit behavior.
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


def test_conformal_split_and_coverage_bounds(spark, sf_dir):
    r = _rows(spark, sf_dir, "events_conformal_naive_backtest")[0]
    assert r["n_calibration"] >= r["n_test"] >= 1
    assert 0 <= r["coverage_90"] <= 1
    assert r["q_hat_abs_err"] >= 0
    # exchangeable daily counts: coverage should sit near (not far below)
    # the nominal level; a collapse means the split harness is broken
    assert r["coverage_90"] >= 0.5


def test_completion_curve_monotone_and_total(spark, sf_dir):
    rows = _rows(spark, sf_dir, "orders_completion_curve_weekly")
    assert [r["week"] for r in rows] == list(range(1, 13))
    shares = [r["complete_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert all(0 <= s <= 1 for s in shares)


def test_sourcing_tiers_partition_parts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "part_sourcing_redundancy_panel")
    assert {r["sourcing_tier"] for r in rows} == {"single", "dual", "3-4", "5+"}
    total_share = sum(r["part_share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    n_parts = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts


def test_state_projection_reconciles_with_corpus(spark, sf_dir):
    rows = {r["operator"]: r for r in _rows(spark, sf_dir, "cdc_state_size_projection")}
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    n_types = e.select("event_type").distinct().count()
    assert rows["latest_state (per key)"]["n_state_rows"] == n_users
    assert rows["gap_sla / watermark (per stream)"]["n_state_rows"] == n_types
    for r in rows.values():
        assert r["bytes_upper"] >= r["n_state_rows"] * 8


def test_priority_delay_percentile_ordering(spark, sf_dir):
    rows = _rows(spark, sf_dir, "orders_priority_queueing_delay")
    assert len(rows) == 5
    for r in rows:
        assert r["p50_d"] <= r["p90_d"] <= r["p99_d"]
        assert r["mean_delay_d"] >= 0


def test_textrank_planted_hub_ranks_first(spark, tmp_path):
    """A term adjacent to MANY distinct well-connected terms must out-rank
    peripheral terms: docs of the form 'hubterm satX hubterm satY ...'
    make hubterm the planted centrality winner."""
    sf = str(tmp_path / "sf")
    sats = [f"satellite{i:02d}" for i in range(12)]
    docs = []
    for i in range(6):
        body = " ".join(
            f"hubterm {sats[(2 * i + j) % 12]}" for j in range(6)
        )
        docs.append((i, body, "en", f"s{i % 2}", len(body)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = registry.get("text_textrank_keywords").fn(spark, sf).collect()
    assert rows, "graph must be non-empty"
    assert rows[0]["term"] == "hubterm"
    # rank mass sanity: every rank positive, hub strictly above the median
    ranks = [r["textrank"] for r in rows]
    assert all(x > 0 for x in ranks)
    assert ranks[0] > sorted(ranks)[len(ranks) // 2]


def test_textrank_fixture_shape(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_textrank_keywords")
    assert 0 < len(rows) <= 20
    assert all(len(r["term"]) >= 4 for r in rows)
    ranks = [r["textrank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_return_rate_reconciles(spark, sf_dir):
    rows = _rows(spark, sf_dir, "lineitem_return_rate_by_brand_year")
    li = load_table(spark, sf_dir, "lineitem")
    want_lines = li.filter(F.col("l_shipdate").isNotNull()).count()
    want_returned = li.filter(
        F.col("l_shipdate").isNotNull() & (F.col("l_returnflag") == "R")
    ).count()
    assert sum(r["n_lines"] for r in rows) == want_lines
    assert sum(r["n_returned"] for r in rows) == want_returned
    for r in rows:
        assert 0 <= r["return_rate"] <= 1
        if r["n_returned"] == 0:
            assert r["returned_cents"] == 0


def test_heaps_fit_is_sublinear_on_natural_corpus(spark, sf_dir):
    r = _rows(spark, sf_dir, "docs_vocab_growth_heaps")[0]
    assert r["n_sources"] >= 2
    assert 0 < r["heaps_beta"] < 1.2  # sub-linear growth (noise caps above 1)
    assert r["heaps_k"] > 0


def test_mst_backbone_planted_graph(spark):
    """Known weighted graph: the maximum spanning tree must be exactly
    {(a,b,10), (b,c,8), (c,d,5)} -- the two weak edges (a,c,1), (b,d,2)
    are excluded. Determinism: two runs agree."""
    from change_data_capture_service_spark.operators.graph import mst_backbone

    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 8), ("a", "c", 1), ("c", "d", 5), ("b", "d", 2)],
        "u string, v string, n bigint",
    )
    got = {(r["u"], r["v"], r["n"]) for r in mst_backbone(edges).collect()}
    assert got == {("a", "b", 10), ("b", "c", 8), ("c", "d", 5)}
    got2 = {(r["u"], r["v"], r["n"]) for r in mst_backbone(edges).collect()}
    assert got2 == got


def test_mst_backbone_forest_on_disconnected_graph(spark):
    """Two components: the result is a spanning FOREST -- |E| = |V| - C,
    one best edge per 2-node component."""
    from change_data_capture_service_spark.operators.graph import mst_backbone

    edges = spark.createDataFrame(
        [("a", "b", 3), ("c", "d", 7), ("c", "e", 9)],
        "u string, v string, n bigint",
    )
    got = {(r["u"], r["v"], r["n"]) for r in mst_backbone(edges).collect()}
    assert got == {("a", "b", 3), ("c", "d", 7), ("c", "e", 9)}  # all tree edges


def test_mst_backbone_fixture_tree_invariants(spark, sf_dir):
    """On the fixture brand graph: acyclic (union-find check) and
    |E| = |V| - #components over the nodes the MST touches plus
    isolated co-purchase nodes."""
    rows = registry.get("graph_mst_backbone").fn(spark, sf_dir).collect()
    assert rows
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ru, rv = find(r["u"]), find(r["v"])
        assert ru != rv, f"cycle at {r}"  # MST never closes a cycle
        parent[ru] = rv
    nodes = {r["u"] for r in rows} | {r["v"] for r in rows}
    comps = len({find(x) for x in nodes})
    assert len(rows) == len(nodes) - comps


def test_duplicate_delivery_planted_replay(spark, tmp_path):
    """A log with one event delivered 3x and another 1x must report
    exactly 2 redundant deliveries and max_copies = 3."""
    import datetime

    sf = str(tmp_path / "sf")
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(1, t0, 7, "click", 1.0, "{}")] * 3 + [(2, t0, 8, "click", 1.0, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    r = registry.get("cdc_duplicate_delivery_audit").fn(spark, sf).collect()[0]
    assert r["n_deliveries"] == 4 and r["n_distinct_events"] == 2
    assert r["n_redundant"] == 2 and r["max_copies"] == 3
    assert abs(r["dup_rate"] - 0.5) < 1e-9


def test_clv_projection_composes_from_inputs(spark, sf_dir):
    rows = _rows(spark, sf_dir, "customer_retention_clv_projection")
    assert rows
    for r in rows:
        assert 0 <= r["retention"] <= 1
        assert r["n_retained"] <= r["n_prev"]
        want = r["avg_annual_value"] * (1 + r["retention"] + r["retention"] ** 2)
        assert abs(r["clv_3yr_projection"] - want) < 1e-2
        assert r["clv_3yr_projection"] >= r["avg_annual_value"] - 1e-9


def test_qualify_dialect_top2_per_customer(spark, sf_dir):
    rows = _rows(spark, sf_dir, "sqlapi_qualify_dialect")
    per = {}
    for r in rows:
        per.setdefault(r["o_custkey"], []).append(r["rnk"])
    for cust, rks in per.items():
        assert sorted(rks) in ([1], [1, 2]), cust


def test_split_centroid_drift_semantics(spark, sf_dir, tmp_path):
    rows = _rows(spark, sf_dir, "embedding_split_centroid_drift")
    assert rows
    for r in rows:
        assert -1 - 1e-9 <= r["centroid_cosine"] <= 1 + 1e-9
        assert r["drift_flag"] == (1 if r["centroid_cosine"] < 0.98 else 0)
    # planted drift: one label whose even/odd halves point in opposite
    # directions must flag; one stable label must not
    sf = str(tmp_path / "sf")
    stable = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(10)]
    drift = [
        (100 + i, ([0.0, 1.0, 0.0, 0.0] if i % 2 == 0 else [0.0, -1.0, 0.0, 0.0]), 1)
        for i in range(10)
    ]
    spark.createDataFrame(
        stable + drift, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    got = {
        r["label"]: r for r in registry.get("embedding_split_centroid_drift").fn(spark, sf).collect()
    }
    assert got[0]["drift_flag"] == 0 and abs(got[0]["centroid_cosine"] - 1.0) < 1e-6
    assert got[1]["drift_flag"] == 1 and got[1]["centroid_cosine"] < 0


def test_ffd_packing_quality_and_planted_optimum(spark, sf_dir, tmp_path):
    """Capacity respected via fill_rate <= 1; FFD bound n_bins <=
    (11*LB + 6) / 9; a planted exact-fit corpus (pairs summing to the
    capacity) must pack to its optimum."""
    from change_data_capture_service_spark.operators.curation import (
        PACK_BIN_CAPACITY,
    )

    rows = _rows(spark, sf_dir, "pack_context_bins_ffd")
    assert rows
    for r in rows:
        assert r["n_bins"] >= r["lower_bound"]
        assert 9 * r["n_bins"] <= 11 * r["lower_bound"] + 6
        if r["fill_rate"] is not None:
            assert 0 < r["fill_rate"] <= 1

    # planted: 4 docs of 1500 + 4 docs of 548 tokens -> four 2048 bins
    sf = str(tmp_path / "sf")
    docs = []
    for i in range(4):
        docs.append((i, " ".join(["a"] * 1500), "en", "s", 0))
        docs.append((10 + i, " ".join(["b"] * 548), "en", "s", 0))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    r = registry.get("pack_context_bins_ffd").fn(spark, sf).collect()[0]
    assert r["total_tokens"] == 4 * PACK_BIN_CAPACITY
    assert r["n_bins"] == 4 and r["lower_bound"] == 4
    assert r["fill_rate"] == 1.0


def test_var_shortfall_dominance(spark, sf_dir):
    """ES >= VaR by construction (tail mean of values >= the cut); the
    tail size is ~5% of orders."""
    r = _rows(spark, sf_dir, "orders_value_at_risk_shortfall")[0]
    assert r["expected_shortfall_95"] >= r["var_95"]
    assert 0 < r["n_tail"] <= max(1, int(0.06 * r["n_orders"]) + 2)


def test_drawdown_profile_bounds(spark, sf_dir):
    r = _rows(spark, sf_dir, "orders_revenue_drawdown_profile")[0]
    assert 0 <= r["max_drawdown_share"] <= 1
    assert 0 <= r["underwater_share"] <= 1
    assert r["max_drawdown"] <= r["peak_daily_revenue"]
    assert r["n_underwater"] <= r["n_days"]


def test_drawdown_grain_contract_raises_past_cap(spark, sf_dir, monkeypatch):
    """The round-12 verdict asked for the domain-bounded-window contract
    to be LOUD: with SERIES_FOLD_MAX_POINTS monkeypatched below the
    fixture's day count, orders_revenue_drawdown_profile must raise
    naming the cap instead of silently single-partitioning a fact-grain
    window; untouched, the same call runs clean (covered by
    test_drawdown_profile_bounds)."""
    from change_data_capture_service_spark.operators import timeseries

    monkeypatch.setattr(timeseries, "SERIES_FOLD_MAX_POINTS", 5)
    with pytest.raises(Exception, match="SERIES_FOLD_MAX_POINTS"):
        _rows(spark, sf_dir, "orders_revenue_drawdown_profile")


def test_hhi_trend_bounds_and_delta_identity(spark, sf_dir):
    rows = _rows(spark, sf_dir, "supplier_hhi_trend_yearly")
    assert len(rows) >= 2
    prev = None
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9
        if prev is None:
            assert r["hhi_delta"] is None
        else:
            assert abs(r["hhi_delta"] - (r["hhi"] - prev)) < 2e-6
        prev = r["hhi"]


def test_arpu_decomposition_identity(spark, sf_dir):
    """revenue = customers x orders_per_customer x AOV (to rounding)."""
    rows = _rows(spark, sf_dir, "orders_arpu_monthly")
    assert rows
    for r in rows:
        lhs = r["revenue"]
        rhs = r["n_customers"] * r["orders_per_customer"] * r["aov"]
        assert abs(lhs - rhs) / max(lhs, 1) < 1e-4
        assert r["arpu"] >= r["aov"] - 1e-9  # >= because orders/cust >= 1
