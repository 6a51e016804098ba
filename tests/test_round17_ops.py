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


def test_topk_drift_first_week_null_and_bounds(spark, sf_dir):
    rows = (
        registry.get("events_topk_drift_weekly").fn(spark, sf_dir)
        .orderBy("week_start").collect()
    )
    assert rows
    first, rest = rows[0], rows[1:]
    assert first["topk_jaccard_vs_prev"] is None
    assert first["n_new_entrants"] is None
    for r in rows:
        assert 1 <= r["n_topk"] <= 10
    for r in rest:
        assert 0.0 <= r["topk_jaccard_vs_prev"] <= 1.0
        assert 0 <= r["n_new_entrants"] <= r["n_topk"]


def test_cluster_profile_reconciles_with_cluster_stats(spark, sf_dir):
    """The per-cluster panel must re-aggregate to the one-row headline."""
    prof = registry.get("dedup_cluster_profile").fn(spark, sf_dir).collect()
    stats = registry.get("dedup_cluster_stats").fn(spark, sf_dir).collect()[0]
    assert len(prof) == stats["n_clusters"]
    assert sum(r["cluster_size"] for r in prof) == stats["docs_in_clusters"]
    assert max(r["cluster_size"] for r in prof) == stats["max_cluster_size"]
    for r in prof:
        assert r["cluster_size"] >= 2  # components come from pairs
        assert r["canonical_doc"] == r["cluster_id"]  # min-label == min doc
        assert r["min_chars"] <= r["max_chars"]
        assert 0 <= r["chars_removable"]


def test_pelt_recovers_planted_breaks(spark):
    import datetime

    from change_data_capture_service_spark.operators.stats import (
        pelt_segment_series,
    )

    base = datetime.datetime(2024, 1, 1)
    levels = [10, 50, 25]
    rows = [
        (base + datetime.timedelta(days=i), levels[i // 20])
        for i in range(60)
    ]
    s = spark.createDataFrame(rows, "day timestamp, n_events long")
    out = pelt_segment_series(s, "day", "n_events").orderBy("day").collect()
    cps = [r["day"] for r in out if r["is_changepoint"] == 1]
    assert cps == [base + datetime.timedelta(days=20), base + datetime.timedelta(days=40)]
    assert max(r["segment_id"] for r in out) == 2
    assert sorted({r["seg_mean"] for r in out}) == [10.0, 25.0, 50.0]


def test_pelt_constant_series_one_segment(spark):
    import datetime

    from change_data_capture_service_spark.operators.stats import (
        pelt_segment_series,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 7) for i in range(30)]
    s = spark.createDataFrame(rows, "day timestamp, n_events long")
    out = pelt_segment_series(s, "day", "n_events").collect()
    assert {r["segment_id"] for r in out} == {0}
    assert all(r["is_changepoint"] == 0 for r in out)
    assert all(r["seg_mean"] == 7.0 for r in out)


def test_pelt_registered_key_partitions_days(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    rows = registry.get("events_changepoint_pelt").fn(spark, sf_dir).collect()
    n_days = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(F.date_trunc("day", "ts")).distinct().count()
    )
    assert len(rows) == n_days
    seg_ids = sorted({r["segment_id"] for r in rows})
    assert seg_ids == list(range(len(seg_ids)))  # contiguous regimes
    assert sum(r["is_changepoint"] for r in rows) == len(seg_ids) - 1


def test_residual_energy_tight_vs_diffuse(spark, tmp_path):
    """A corpus of tight planted clusters must show near-zero residual
    energy; a diffuse random corpus must show high residual energy --
    the quality-skew signal the profile exists to surface."""
    import math
    import random

    from change_data_capture_service_spark.operators.ann_index import (
        build_ann_index,
        residual_energy_profile,
    )

    def corpus_df(vectors):
        rows = [
            (i, v, math.sqrt(sum(x * x for x in v)))
            for i, v in enumerate(vectors)
        ]
        return spark.createDataFrame(rows, "vec_id long, v array<double>, nrm double")

    rng = random.Random(7)
    # tight: 4 well-separated 64-dim centers, +/-0.01 jitter
    centers = []
    for c in range(4):
        vec = [0.0] * 64
        for j in range(16):
            vec[c * 16 + j] = 10.0
        centers.append(vec)
    tight = [
        [x + rng.uniform(-0.01, 0.01) for x in centers[i % 4]] for i in range(256)
    ]
    diffuse = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(256)]

    t_dir, d_dir = str(tmp_path / "tight"), str(tmp_path / "diffuse")
    tdf, ddf = corpus_df(tight).localCheckpoint(), corpus_df(diffuse).localCheckpoint()
    build_ann_index(spark, tdf, index_dir=t_dir, n_cells=4)
    build_ann_index(spark, ddf, index_dir=d_dir, n_cells=4)

    def overall(df):
        rows = df.collect()
        num = sum(r["mean_sq_residual"] * r["n_vectors"] for r in rows)
        den = sum(r["mean_sq_norm"] * r["n_vectors"] for r in rows)
        assert all(r["residual_energy_ratio"] >= 0 for r in rows)
        return num / den

    r_tight = overall(residual_energy_profile(spark, tdf, index_dir=t_dir))
    r_diffuse = overall(residual_energy_profile(spark, ddf, index_dir=d_dir))
    assert r_tight < 0.01, r_tight
    assert r_diffuse > 0.3, r_diffuse
    assert r_tight < r_diffuse


def test_residual_energy_registered_key_covers_corpus(spark, sf_dir):
    from change_data_capture_service_spark.operators.similarity import _vectors

    rows = registry.get("ann_index_residual_energy_profile").fn(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_vectors"] for r in rows) == _vectors(spark, sf_dir).count()
    for r in rows:
        assert r["mean_sq_residual"] >= 0
        assert r["residual_energy_ratio"] >= 0


def test_rake_hand_trace(spark, tmp_path):
    """Two copies of 'x y of x y of z': phrase 'x y' scores s(x)+s(y) =
    2+2 = 4 (deg 8 / freq 4 each), phrase 'z' scores 1 -- the RAKE
    deg/freq arithmetic on a closed-form corpus."""
    sf = str(tmp_path / "sf")
    docs = spark.createDataFrame(
        [(i, "x y of x y of z", "en", "s", 15) for i in range(2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = registry.get("text_rake_keywords").fn(spark, sf).collect()
    got = {r["phrase"]: (r["n_words"], r["n_occurrences"], r["rake_score"]) for r in rows}
    assert got == {"x y": (2, 4, 4.0), "z": (1, 2, 1.0)}
    assert [r["phrase"] for r in rows] == ["x y", "z"]  # score-desc order


def test_rake_fixture_invariants(spark, sf_dir):
    rows = registry.get("text_rake_keywords").fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["rake_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r["n_words"] <= 4
        assert r["n_occurrences"] >= 2
        for stop in ("the", "a", "of", "and"):
            assert stop not in r["phrase"].split()


def test_page_hinkley_step_series(spark, tmp_path):
    """Constant-then-step daily series: the statistic is exactly 0 while
    the series is constant (running mean == value), PH+ rises after the
    upward break, PH- stays 0 (m_t is nondecreasing for an upward
    shift)."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day in range(20):
        for k in range(1 if day < 10 else 5):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=k), 1, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = registry.get("events_page_hinkley_panel").fn(spark, sf).orderBy("day").collect()
    assert len(out) == 20
    for r in out[:10]:
        assert r["ph_pos"] == 0.0 and r["ph_neg"] == 0.0
    assert out[-1]["ph_pos"] > 0
    assert all(r["ph_neg"] == 0.0 for r in out)


def test_page_hinkley_fixture_invariants(spark, sf_dir):
    out = registry.get("events_page_hinkley_panel").fn(spark, sf_dir).orderBy("day").collect()
    assert out
    assert out[0]["ph_pos"] == 0.0 and out[0]["ph_neg"] == 0.0
    for r in out:
        assert r["ph_pos"] >= 0 and r["ph_neg"] >= 0


def test_dirichlet_ql_hand_trace(spark, tmp_path):
    """Two-doc corpus: per-term score ln(1 + tf*|C|/(mu*cf)) +
    ln(mu/(dl+mu)) with mu=2000 -- checked against the closed form."""
    import math

    sf = str(tmp_path / "sf")
    docs = spark.createDataFrame(
        [(1, "stream stream x", "en", "s", 15), (2, "stream x y z", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = registry.get("search_query_likelihood_dirichlet").fn(spark, sf).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    c_len, cf, mu = 7, 3, 2000.0
    s1 = math.log(1 + 2 * c_len / (mu * cf)) + math.log(mu / (3 + mu))
    s2 = math.log(1 + 1 * c_len / (mu * cf)) + math.log(mu / (4 + mu))
    assert rows[0]["score"] == pytest.approx(round(s1, 6), abs=1e-6)
    assert rows[1]["score"] == pytest.approx(round(s2, 6), abs=1e-6)
    assert rows[0]["n_terms_hit"] == 1 and rows[1]["n_terms_hit"] == 1


def test_dirichlet_ql_fixture_invariants(spark, sf_dir):
    rows = registry.get("search_query_likelihood_dirichlet").fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r["n_terms_hit"] <= 3


def test_ljung_box_weekly_cycle(spark, tmp_path):
    """A hard 7-day cycle must put the lag-7 autocorrelation far above
    lag 1, and Q must accumulate monotonically."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day in range(56):
        for k in range(10 if day % 7 == 0 else 1):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=k), 1, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = {r["lag"]: r for r in registry.get("events_ljung_box_daily").fn(spark, sf).collect()}
    assert set(out) == set(range(1, 8))
    assert out[7]["rho"] > 0.8
    assert out[7]["rho"] > out[1]["rho"]
    qs = [out[k]["q_stat"] for k in range(1, 8)]
    assert qs == sorted(qs)  # Q accumulates


def test_ljung_box_fixture_invariants(spark, sf_dir):
    out = registry.get("events_ljung_box_daily").fn(spark, sf_dir).orderBy("lag").collect()
    assert len(out) == 7
    for r in out:
        assert -1.000001 <= r["rho"] <= 1.000001
    qs = [r["q_stat"] for r in out]
    assert all(b >= a for a, b in zip(qs, qs[1:]))


def test_ktruss_clique_and_tail(spark):
    """Closed forms: a 5-clique is a 5-truss (all 10 edges survive k=5,
    nothing survives k=6); a triangle with a pendant tail edge keeps the
    triangle at k=3 and sheds the tail."""
    import itertools

    from change_data_capture_service_spark.operators.graph import ktruss_panel

    clique = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in itertools.combinations(range(5), 2)],
        "u string, v string",
    )
    assert ktruss_panel(clique) == [(3, 10, 5), (4, 10, 5), (5, 10, 5)]

    tri_tail = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")], "u string, v string"
    )
    assert ktruss_panel(tri_tail) == [(3, 3, 3)]


def test_ktruss_bowtie(spark):
    """Two triangles sharing one vertex: every edge closes exactly one
    triangle, so the whole bowtie is a 3-truss and nothing is a 4-truss."""
    from change_data_capture_service_spark.operators.graph import ktruss_panel

    bowtie = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("c", "e"), ("d", "e")],
        "u string, v string",
    )
    assert ktruss_panel(bowtie) == [(3, 6, 5)]


def test_ktruss_registered_key_monotone(spark, sf_dir):
    rows = registry.get("graph_ktruss").fn(spark, sf_dir).orderBy("k").collect()
    assert rows
    assert [r["k"] for r in rows] == list(range(3, 3 + len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"]  # trusses are nested
        assert b["n_nodes"] <= a["n_nodes"]


def test_theta_hand_trace(spark, tmp_path):
    """y = [10, 12, 15]: prefix OLS slope of [10,12] is 2, SES level 11,
    so f_3 = 11 + 1 = 12 and MAE = 3; final level 13, full-series slope
    2.5, forecast_next = 13 + 1.25 = 14.25."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day, n in enumerate((10, 12, 15)):
        for k in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=k), 1, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = registry.get("events_theta_method_mae").fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 3
    assert r["mae"] == 3.0
    assert r["forecast_next"] == 14.25


def test_theta_fixture_single_row(spark, sf_dir):
    out = registry.get("events_theta_method_mae").fn(spark, sf_dir).collect()
    assert len(out) == 1
    assert out[0]["mae"] >= 0


def test_rfm_migration_invariants(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    rows = registry.get("customer_rfm_migration_matrix").fn(spark, sf_dir).collect()
    assert rows
    from_tot, to_tot = {}, {}
    for r in rows:
        assert 0 <= r["q_from"] <= 4 and 0 <= r["q_to"] <= 4
        assert not (r["q_from"] == 0 and r["q_to"] == 0)
        from_tot[r["q_from"]] = from_tot.get(r["q_from"], 0) + r["n_customers"]
        to_tot[r["q_to"]] = to_tot.get(r["q_to"], 0) + r["n_customers"]
    # ntile balance: period quartiles (1..4) differ by at most 1
    for tot in (from_tot, to_tot):
        sizes = [tot[k] for k in (1, 2, 3, 4) if k in tot]
        assert sizes and max(sizes) - min(sizes) <= 1
    n_custs = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_custs


def test_js_distance_identical_and_disjoint(spark, tmp_path):
    """Two streams with identical (dow, hour) profiles have JS = 0; two
    with disjoint supports hit the ln 2 ceiling exactly."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows, eid = [], 0
    # 'a' and 'b': identical profiles (same cells, same proportions);
    # 'c': disjoint (different hour entirely)
    for day in range(7):
        for _ in range(3):
            for t, hour in (("a", 9), ("b", 9), ("c", 21)):
                rows.append(
                    (eid, base + datetime.timedelta(days=day, hours=hour, seconds=eid % 50),
                     1, t, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        (r["type_a"], r["type_b"]): r["js_divergence"]
        for r in registry.get("events_type_profile_js_distance").fn(spark, sf).collect()
    }
    assert got[("a", "b")] == 0.0
    assert got[("a", "c")] == pytest.approx(0.693147, abs=2e-6)
    assert got[("b", "c")] == pytest.approx(0.693147, abs=2e-6)


def test_js_distance_fixture_bounds(spark, sf_dir):
    rows = registry.get("events_type_profile_js_distance").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert -1e-9 <= r["js_divergence"] <= 0.693148


def test_hazard_curve_identities(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    rows = registry.get("orders_interorder_hazard_curve").fn(spark, sf_dir).orderBy("gap_weeks").collect()
    assert rows
    assert rows[-1]["hazard"] == 1.0  # largest observed bin exhausts its risk set
    at_risk = [r["n_at_risk"] for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)
    for r in rows:
        assert 0 < r["hazard"] <= 1.0
        assert r["n_events"] <= r["n_at_risk"]
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_events"] for r in rows) == n_orders - n_cust


def test_hazard_curve_planted_single_bin(spark, tmp_path):
    import datetime

    sf = str(tmp_path / "sf")
    rows = []
    for cust in range(5):
        for i in range(4):  # 3 gaps of exactly 14 days per customer
            rows.append(
                (cust * 10 + i, cust,
                 "O", 100.0, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=14 * i),
                 "1-URGENT")
            )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    out = registry.get("orders_interorder_hazard_curve").fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["gap_weeks"] == 2
    assert out[0]["n_events"] == 15 and out[0]["n_at_risk"] == 15
    assert out[0]["hazard"] == 1.0


def test_shingle_curve_monotone_in_k(spark, sf_dir):
    """Longer shingles are more selective: docs-per-shingle collision
    rate and the shared-doc share must be non-increasing in k."""
    rows = {
        r["shingle_k"]: r
        for r in registry.get("dedup_shingle_selectivity_curve").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {3, 5, 8}
    for k in (3, 5, 8):
        r = rows[k]
        assert r["n_shared_shingles"] <= r["n_distinct_shingles"]
        assert r["n_doc_shingle_pairs"] >= r["n_distinct_shingles"]
        assert r["avg_docs_per_shingle"] >= 1.0
        assert 0.0 <= r["share_docs_sharing"] <= 1.0
    assert rows[3]["avg_docs_per_shingle"] >= rows[5]["avg_docs_per_shingle"]
    assert rows[5]["avg_docs_per_shingle"] >= rows[8]["avg_docs_per_shingle"]
    assert rows[3]["share_docs_sharing"] >= rows[8]["share_docs_sharing"]


def test_throughput_percentiles_planted(spark, tmp_path):
    """10 observed minutes with counts 1..10: truncated-interpolation
    p50 = 5, p95 = p99 = 9, max = 10."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for minute in range(10):
        for k in range(minute + 1):
            rows.append(
                (eid, base + datetime.timedelta(minutes=minute, seconds=k % 60),
                 1, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = registry.get("cdc_throughput_percentiles_minute").fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_minutes"], r["p50_epm"], r["p95_epm"], r["p99_epm"], r["max_epm"]) == (
        10, 5, 9, 9, 10,
    )


def test_throughput_percentiles_ordered(spark, sf_dir):
    r = registry.get("cdc_throughput_percentiles_minute").fn(spark, sf_dir).collect()[0]
    assert r["p50_epm"] <= r["p95_epm"] <= r["p99_epm"] <= r["max_epm"]
    assert r["n_minutes"] > 0


def test_brand_share_sums_to_one_per_year(spark, sf_dir):
    rows = registry.get("part_brand_share_yearly").fn(spark, sf_dir).collect()
    assert rows
    by_year, first_year = {}, {}
    for r in rows:
        by_year.setdefault(r["yr"], 0.0)
        by_year[r["yr"]] += r["revenue_share"]
        first_year.setdefault(r["p_brand"], r["yr"])
    for yr, s in by_year.items():
        assert s == pytest.approx(1.0, abs=1e-4), yr
    for r in rows:
        if r["yr"] == first_year[r["p_brand"]]:
            assert r["share_change"] is None
        else:
            assert r["share_change"] is not None


def test_kcenter_planted_clusters(spark, tmp_path, monkeypatch):
    """Four tight well-separated clusters: the first four centers must
    land in four DIFFERENT clusters (farthest-point property), and the
    coverage radius must be non-increasing."""
    from change_data_capture_service_spark.operators import similarity as S

    rows = []
    vid = 0
    for c in range(4):
        base = [0.0] * 8
        base[c * 2] = 100.0
        for j in range(10):
            v = list(base)
            v[c * 2 + 1] = j * 0.01  # tiny within-cluster spread
            rows.append((vid, v))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>")

    def fake_vectors(spark_, sf_dir_):
        return corpus.select(
            "vec_id", "v", F.sqrt(
                F.expr("aggregate(v, 0D, (a, x) -> a + x * x)")
            ).alias("nrm"),
        )

    monkeypatch.setattr(S, "_vectors", fake_vectors)
    out = S.sample_kcenter_coreset(spark, "unused", k=6).collect()
    cluster_of = {r["vec_id"]: r["vec_id"] // 10 for r in out}
    first4 = [cluster_of[r["vec_id"]] for r in out[:4]]
    assert sorted(first4) == [0, 1, 2, 3]
    radii = [r["coverage_radius"] for r in out if r["coverage_radius"] is not None]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_fixture_shape(spark, sf_dir):
    rows = registry.get("sample_kcenter_coreset").fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 16
    assert rows[0]["center_rank"] == 1 and rows[0]["coverage_radius"] is None
    assert len({r["vec_id"] for r in rows}) == len(rows)  # centers distinct
    radii = [r["coverage_radius"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)


def test_replay_cost_monotone_windows(spark, sf_dir):
    rows = registry.get("cdc_replay_window_cost").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["replay_1m"] <= r["replay_5m"] <= r["replay_15m"] <= r["replay_60m"]
        assert r["replay_60m"] <= r["n_total"]
        assert 0 < r["share_60m"] <= 1.0


def test_reorder_buffer_planted_displacement(spark, tmp_path):
    """Arrival order (by event_id) carries ts sequence [2,3,4,1]: the
    late element displaces by 3, so the minimum in-order buffer is 3;
    pct_in_order counts NOT-LATE arrivals (early arrivals clamp to 0
    displacement): 3 of 4 here."""
    import datetime

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    ts_seq = [2, 3, 4, 1]
    rows = [
        (i + 1, base + datetime.timedelta(seconds=ts_seq[i]), 1, "t", 1.0, "{}")
        for i in range(4)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = registry.get("cdc_reorder_buffer_depth").fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["max_depth"] == 3
    assert r["n_events"] == 4
    assert r["pct_in_order"] == 0.75  # only the ts=1 element arrived late


def test_reorder_buffer_fixture_invariants(spark, sf_dir):
    rows = registry.get("cdc_reorder_buffer_depth").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["p95_depth"] <= r["max_depth"]
        assert 0 <= r["pct_in_order"] <= 1
        assert r["max_depth"] < r["n_events"]


def test_throughput_percentiles_empty_log_totality(spark, tmp_path):
    """Constant-panel totality on an empty / all-NULL-ts log: the oracle's
    aggregate-without-GROUP-BY emits exactly one (0, NULL, NULL, NULL,
    NULL) row, so the Spark side must too -- the stats aggregate DRIVES
    via a left join; a crossJoin against the vanished percentile relation
    would drop the panel (the alpha-DCG constant-panel class)."""
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, None, 1, "t", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = registry.get("cdc_throughput_percentiles_minute").fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_minutes"] == 0
    assert r["p50_epm"] is None and r["p95_epm"] is None and r["p99_epm"] is None
    assert r["max_epm"] is None


def test_watermark_skew_stream_null_ts_rows(spark, tmp_path):
    """The stateful high-water fold must not poison its max with NaT
    (int64-min garbage) while still counting NULL-ts rows in n_events,
    matching the batch twin's count(*) / max-skips-NULL split."""
    import datetime

    import pandas as pd

    from change_data_capture_service_spark.streaming.stateful import (
        _watermark_skew_fn,
    )

    class _FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    st = _FakeState()
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * 3,
            "ts": [
                pd.Timestamp(datetime.datetime(2024, 1, 1, 0, 0, 5)),
                pd.NaT,
                pd.Timestamp(datetime.datetime(2024, 1, 1, 0, 0, 2)),
            ],
        }
    )
    out = list(_watermark_skew_fn(("t",), iter([pdf]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    expect_us = int(
        datetime.datetime(2024, 1, 1, 0, 0, 5, tzinfo=datetime.timezone.utc).timestamp()
        * 1_000_000
    )
    assert int(row["max_us"]) == expect_us
    assert int(row["n_events"]) == 3

    # all-NaT batch: n_events counted, max emitted as NULL (batch twin
    # emits the stream row with a NULL high-water too)
    st2 = _FakeState()
    pdf2 = pd.DataFrame({"event_type": ["t"] * 2, "ts": [pd.NaT, pd.NaT]})
    out2 = list(_watermark_skew_fn(("t",), iter([pdf2]), st2))
    assert len(out2) == 1
    assert out2[0].iloc[0]["max_us"] is None
    assert int(out2[0].iloc[0]["n_events"]) == 2


def test_series_fold_grain_contract_boundary(spark, tmp_path, monkeypatch):
    """The single-array fold cap must be loud at the boundary: n == cap
    runs clean, n == cap + 1 raises naming SERIES_FOLD_MAX_POINTS (the
    PELT discipline extended to the Holt/theta folds)."""
    import datetime

    from change_data_capture_service_spark.operators import timeseries

    sf = str(tmp_path / "sf")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "t", 1.0, "{}")
        for i in range(6)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    monkeypatch.setattr(timeseries, "SERIES_FOLD_MAX_POINTS", 6)
    out = registry.get("events_holt_linear_mae").fn(spark, sf).collect()
    assert out[0]["n_days"] == 6  # n == cap: clean

    monkeypatch.setattr(timeseries, "SERIES_FOLD_MAX_POINTS", 5)
    with pytest.raises(Exception, match="SERIES_FOLD_MAX_POINTS"):
        registry.get("events_holt_linear_mae").fn(spark, sf).collect()
    with pytest.raises(Exception, match="SERIES_FOLD_MAX_POINTS"):
        registry.get("events_theta_method_mae").fn(spark, sf).collect()


def test_series_fold_cap_equals_pelt_cap():
    """One grain-contract constant across the sequential-fold family:
    the Holt/theta cap and PELT_MAX_POINTS must not drift apart."""
    from change_data_capture_service_spark.operators import stats, timeseries

    assert timeseries.SERIES_FOLD_MAX_POINTS == stats.PELT_MAX_POINTS
