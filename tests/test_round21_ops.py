"""Round-14 queue-stock operator gates (registered behind the round-13
check window): Little's-law steady-state recovery, EOQ scaling
identities, clustering purity/NMI on planted taxonomies, and MTLD
length-robustness.
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


def test_little_law_identity_and_fixture_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "orders_little_law_check")
    assert len(rows) >= 2
    for r in rows:
        assert r["avg_backlog"] >= 0 and r["mean_cycle_days"] >= 0
        # the ratio is literally L / (lambda * W) at 6dp
        lw = r["lambda_per_day"] * r["mean_cycle_days"]
        if lw > 0:
            assert abs(r["littles_ratio"] - r["avg_backlog"] / lw) < 1e-3


def test_little_law_steady_state_is_one(spark, tmp_path):
    """Synthetic steady state: one order per day, each exactly 3 days of
    work -> interior months must read L = lambda * W (ratio 1)."""
    import datetime as dt

    out = str(tmp_path / "sf")
    base = dt.datetime(1995, 1, 1)
    orders, lines = [], []
    for i in range(120):
        d = base + dt.timedelta(days=i)
        orders.append((i, 1, "F", 10.0, d, "1-URGENT"))
        lines.append((i, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F",
                      d + dt.timedelta(days=3)))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{out}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{out}/lineitem.parquet")
    rows = registry.get("orders_little_law_check").fn(spark, out).collect()
    interior = [r for r in rows if r["month_start"].month in (2, 3)]
    assert interior
    for r in interior:
        assert abs(r["littles_ratio"] - 1.0) < 0.12  # edge-day effects only
        assert abs(r["mean_cycle_days"] - 3.0) < 1e-9


def test_eoq_identities(spark, sf_dir):
    rows = _rows(spark, sf_dir, "lineitem_eoq_panel")
    assert len(rows) >= 5
    for r in rows:
        assert r["eoq_units"] > 0 and r["avg_unit_price"] > 0
        # orders_per_year is literally demand / EOQ at the rounding grain
        assert abs(r["orders_per_year"] - r["annual_demand"] / r["eoq_units"]) < 1e-3
        # sqrt law: EOQ^2 * (H-rate * price) == 2 * D * S
        lhs = r["eoq_units"] ** 2 * 0.2 * r["avg_unit_price"]
        rhs = 2 * r["annual_demand"] * 100.0
        assert abs(lhs - rhs) / rhs < 1e-3


def _planted_labeled_embeddings(spark, tmp_path, centers, per=25, labels=None):
    import numpy as np

    rng = np.random.default_rng(11)
    rows, vid = [], 0
    for li, c in enumerate(centers):
        lab = labels[li] if labels else li
        for _ in range(per):
            v = (np.asarray(c) + rng.normal(0, 0.01, len(c))).astype("float32")
            rows.append((vid, v.tolist(), lab))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "sf")
    df.write.parquet(f"{out}/embeddings.parquet")
    return out


def test_purity_nmi_perfect_taxonomy(spark, tmp_path):
    centers = [[0.0] * 8, [10.0] + [0.0] * 7, [0.0, 10.0] + [0.0] * 6,
               [0.0, 0.0, 10.0] + [0.0] * 5]
    out = _planted_labeled_embeddings(spark, tmp_path, centers)
    r = registry.get("cluster_purity_nmi_eval").fn(spark, out, k=4).collect()[0]
    assert r["purity"] == 1.0
    assert abs(r["nmi"] - 1.0) < 1e-9
    assert r["n_points"] == 100 and r["n_labels"] == 4


def test_purity_nmi_uninformative_labels(spark, tmp_path):
    """One ground-truth label: H(L) = 0, NMI defined to 0; purity 1
    trivially -- exactly the inflation NMI corrects."""
    centers = [[0.0] * 8, [10.0] + [0.0] * 7]
    out = _planted_labeled_embeddings(spark, tmp_path, centers, labels=[5, 5])
    r = registry.get("cluster_purity_nmi_eval").fn(spark, out, k=2).collect()[0]
    assert r["purity"] == 1.0
    assert r["nmi"] == 0.0


def test_mtld_diverse_beats_repetitive_and_length_robust(spark, tmp_path):
    base = "the quick brown fox jumps over a lazy dog tonight"
    docs = [
        (1, " ".join(["spam"] * 100), "en", "rep", 100),
        (2, " ".join(f"w{i}" for i in range(100)), "en", "div", 100),
        (3, " ".join([base] * 3), "en", "cyc_short", 30),
        (4, " ".join([base] * 30), "en", "cyc_long", 300),
    ]
    out = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    got = {r["source"]: r for r in
           registry.get("text_mtld_lexical_diversity").fn(spark, out).collect()}
    assert got["div"]["mean_mtld"] > got["rep"]["mean_mtld"] * 10
    # MTLD is length-robust on cyclic text where raw TTR is not:
    short, long_ = got["cyc_short"], got["cyc_long"]
    assert short["mean_ttr"] > long_["mean_ttr"] * 2  # TTR decays with length
    assert abs(short["mean_mtld"] - long_["mean_mtld"]) < 0.35 * short["mean_mtld"]


def test_modularity_clique_cases(spark, tmp_path, monkeypatch):
    """Two disjoint K4 cliques -> LPA finds them, Q = 1/2 exactly; the
    whole graph as one community (single clique) -> Q = 0."""
    from change_data_capture_service_spark.operators import graph as G

    def two_cliques(spark_, sf_dir_):
        edges = []
        for base in (0, 100):
            mem = [base + i for i in range(4)]
            edges += [(a, b) for i, a in enumerate(mem) for b in mem[i + 1:]]
        return spark.createDataFrame(edges, "u long, v long")

    monkeypatch.setattr(G, "_brand_cooccurrence_edges", two_cliques)
    rows = registry.get("graph_modularity_eval").fn(spark, "unused").collect()
    assert len(rows) == 2
    q = sum(r["q_contribution"] for r in rows)
    assert abs(q - 0.5) < 1e-6
    for r in rows:
        assert r["n_nodes"] == 4 and r["within_edges"] == 6

    def one_clique(spark_, sf_dir_):
        mem = list(range(5))
        return spark.createDataFrame(
            [(a, b) for i, a in enumerate(mem) for b in mem[i + 1:]], "u long, v long"
        )

    monkeypatch.setattr(G, "_brand_cooccurrence_edges", one_clique)
    rows = registry.get("graph_modularity_eval").fn(spark, "unused").collect()
    assert len(rows) == 1
    assert abs(rows[0]["q_contribution"]) < 1e-6


def test_modularity_fixture_panel(spark, sf_dir):
    rows = _rows(spark, sf_dir, "graph_modularity_eval")
    q = sum(r["q_contribution"] for r in rows)
    assert -0.5 <= q <= 1.0  # Newman bounds
    assert all(r["within_edges"] * 2 <= r["degree_sum"] + 2 * r["within_edges"]
               for r in rows)


def test_spectral_recovers_planted_weekly_cycle(spark, tmp_path):
    """A pure 7-day sinusoid over 84 days must put the top peak at
    period 7 with dominant power share."""
    import datetime as dt
    import math

    base = dt.datetime(1995, 1, 1)
    rows = []
    eid = 0
    for d in range(84):
        n = 50 + int(30 * math.sin(2 * math.pi * d / 7))
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=d, hours=1), 1, "x", 1.0, "{}"))
            eid += 1
    out = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{out}/events.parquet")
    top = registry.get("events_spectral_top_periods").fn(spark, out).collect()
    assert top[0]["peak_rank"] == 1
    assert abs(top[0]["period_days"] - 7.0) < 0.25
    assert top[0]["power_share"] > 0.8


def test_spectral_fixture_shape(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_spectral_top_periods")
    assert len(rows) == 3
    shares = [r["power_share"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert sum(shares) <= 1.0 + 1e-9
    assert all(r["period_days"] >= 2.0 for r in rows)  # Nyquist


def test_intermittency_census_and_planted_quadrants(spark, sf_dir, tmp_path):
    rows = _rows(spark, sf_dir, "part_demand_intermittency_profile")
    assert [r["quadrant"] for r in rows] == ["erratic", "intermittent", "lumpy", "smooth"]
    assert abs(sum(r["part_share"] for r in rows) - 1.0) < 1e-4
    # planted: part 1 demands EVERY month with constant size -> smooth;
    # part 2 demands 2 of 12 months with wildly different sizes -> lumpy
    import datetime as dt

    out = str(tmp_path / "sf")
    lines = []
    ln = 0
    for m in range(12):
        d = dt.datetime(1995, m + 1, 15)
        lines.append((ln, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "F", d)); ln += 1
    for m, qty in ((0, 1.0), (11, 100.0)):
        d = dt.datetime(1995, m + 1, 15)
        lines.append((ln, 2, 1, 1, qty, 100.0, 0.0, 0.0, "N", "F", d)); ln += 1
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{out}/lineitem.parquet")
    got = {r["quadrant"]: r for r in
           registry.get("part_demand_intermittency_profile").fn(spark, out).collect()}
    assert got["smooth"]["n_parts"] == 1
    assert got["lumpy"]["n_parts"] == 1
    assert got["intermittent"]["n_parts"] == 0 and got["erratic"]["n_parts"] == 0


def test_growth_accounting_identities(spark, sf_dir):
    rows = _rows(spark, sf_dir, "customer_growth_accounting_monthly")
    assert len(rows) >= 3
    prev_active = None
    for r in rows:
        # partition identity: the three states cover the active set
        assert r["n_new"] + r["n_retained"] + r["n_reactivated"] == r["n_active"]
        if prev_active is not None:
            # flow identity: retained = prev_active - churned
            assert r["n_retained"] == prev_active - r["n_churned"]
            if prev_active > 0:
                assert abs(r["retention_rate"] - r["n_retained"] / prev_active) < 2e-6
        prev_active = r["n_active"]
