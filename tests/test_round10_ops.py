"""Semantic invariants for the round-7 operator batch (multi-signal dedup
diagnostics, Markov clickstream views, concentration panels, embedding
eval) -- conservation laws and bounds hash parity can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table

registry.load_all()


def conftest_sf_dir() -> str:
    from conftest import SF_DIR

    return SF_DIR


def _pdf(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir).toPandas()


def test_semantic_union_verdicts_consistent_with_scores(spark, sf_dir):
    u = _pdf(spark, sf_dir, "dedup_semantic_minhash_union")
    assert len(u) > 0  # the fixtures plant near-dup pairs
    for _, r in u.iterrows():
        text = r["jaccard"] >= 0.8
        emb = r["cosine"] >= 0.35
        want = (
            "both" if text and emb else
            "text_only" if text else
            "embedding_only" if emb else "neither"
        )
        assert r["verdict"] == want, dict(r)
    assert (u["jaccard"] >= 0.5).all()
    assert u["cosine"].between(-1.000001, 1.000001).all()


def test_survivorship_tokens_conserve_and_prefer_quality(spark, sf_dir):
    s = _pdf(spark, sf_dir, "docs_dedup_survivorship_quality")
    assert (s["family_size"] >= 2).all()
    # the survivor's keep flag can only be 0 when NO family member passes
    bad = s[(s["survivor_keep"] == 0) & (s["n_quality_pass"] > 0)]
    assert bad.empty, bad
    # family sizes here must match the family-size histogram's >=2 tail
    hist = _pdf(spark, sf_dir, "dedup_family_size_dist")
    tail = hist[hist["family_size"] >= 2]
    assert int(tail["n_families"].sum()) == len(s)


def test_net_tokens_saved_conserves_totals(spark, sf_dir):
    t = _pdf(spark, sf_dir, "docs_dedup_net_tokens_saved")
    d = load_table(spark, sf_dir, "documents")
    assert int(t["n_docs"].sum()) == d.count()
    assert (t["dropped_tokens"] <= t["total_tokens"]).all()
    assert (t["dropped_docs"] <= t["n_docs"]).all()
    assert t["pct_tokens_saved"].between(0, 1).all()


def test_band_profile_covers_exactly_the_ngram_pairs(spark, sf_dir):
    bands = _pdf(spark, sf_dir, "docs_near_dup_band_profile")
    pairs = _pdf(spark, sf_dir, "dedup_ngram_jaccard")
    assert int(bands["n_pairs"].sum()) == len(pairs)
    assert set(bands["same_source"]) <= {0, 1}
    assert bands["band_lo"].between(0.5, 0.9).all()


def test_markov_topk_probs_and_entropy_bounds(spark, sf_dir):
    topk = _pdf(spark, sf_dir, "events_markov_next_event_topk")
    assert (topk.groupby("from_type")["rnk"].max() <= 3).all()
    assert topk["prob"].between(0, 1).all()
    ent = _pdf(spark, sf_dir, "events_markov_entropy").set_index("from_type")
    assert (ent["entropy_nats"] >= -1e-9).all()
    # H <= ln(number of observed next states), per state
    for ft, r in ent.iterrows():
        assert r["entropy_nats"] <= math.log(r["n_next_types"]) + 1e-6, ft
    # modal probability agrees with the top-1 of the topk view
    top1 = topk[topk["rnk"] == 1].set_index("from_type")["prob"]
    for ft in ent.index:
        assert abs(ent.loc[ft, "top_prob"] - top1[ft]) < 1e-9


def test_power_users_pareto_shares_are_ordered(spark, sf_dir):
    p = _pdf(spark, sf_dir, "events_power_users_pareto").iloc[0]
    assert 0 < p["top1pct_share"] <= p["top10pct_share"] <= 1.0
    ev = load_table(spark, sf_dir, "events")
    assert int(p["n_events"]) == ev.count()
    assert int(p["n_users"]) == ev.select("user_id").distinct().count()


def test_label_purity_beats_random_on_clustered_fixture(spark, sf_dir):
    pur = _pdf(spark, sf_dir, "knn_label_purity")
    assert len(pur) == 50
    assert pur["purity"].between(0, 1).all()
    n_labels = load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    # the fixture embeds label clusters; mean purity must beat random
    assert pur["purity"].mean() > 1.0 / n_labels


def test_returns_by_month_rates_and_concentration_bounds(spark, sf_dir):
    m = _pdf(spark, sf_dir, "lineitem_returns_by_month")
    assert (m["returned_revenue"] <= m["revenue"] + 1e-6).all()
    assert m["return_rate"].between(0, 1).all()
    c = _pdf(spark, sf_dir, "orders_customer_concentration").iloc[0]
    n = c["n_customers"]
    assert 1.0 / n - 1e-9 <= c["hhi"] <= 1.0  # HHI in [1/n, 1]
    assert c["max_share"] * c["max_share"] <= c["hhi"] + 1e-9


def test_exact_vs_near_overlap_counts_consistent(spark, sf_dir):
    o = _pdf(spark, sf_dir, "dedup_exact_vs_near_overlap").iloc[0]
    assert o["near_and_exact"] <= o["near_pairs"]
    assert o["near_and_exact"] <= max(o["exact_pairs"], o["near_pairs"])
    assert o["near_only_pairs"] == o["near_pairs"] - o["near_and_exact"]
    # the near-pair count must equal the >=0.8 slice of the exact-jaccard op
    nj = _pdf(spark, sf_dir, "dedup_ngram_jaccard")
    assert int(o["near_pairs"]) == int((nj["jaccard"] >= 0.8).sum())


def test_quality_pass_rate_grid_conserves_docs(spark, sf_dir):
    g = _pdf(spark, sf_dir, "docs_quality_pass_rate_by_source_lang")
    d = load_table(spark, sf_dir, "documents")
    assert int(g["n_docs"].sum()) == d.count()
    assert (g["n_pass"] <= g["n_docs"]).all()
    assert g["pass_rate"].between(0, 1).all()
    # grid totals must agree with the per-doc gopher gate
    q = _pdf(spark, sf_dir, "quality_gopher_rules")
    assert int(g["n_pass"].sum()) == int(q["keep"].sum())


def test_hourly_entropy_bounds(spark, sf_dir):
    ent = _pdf(spark, sf_dir, "events_hourly_activity_entropy")
    assert (ent["n_active_hours"] <= 24).all()
    assert (ent["entropy_nats"] >= -1e-9).all()
    for _, r in ent.iterrows():
        assert r["entropy_nats"] <= math.log(max(r["n_active_hours"], 1)) + 1e-6
        assert r["peak_hour_share"] >= 1.0 / max(r["n_active_hours"], 1) - 1e-9


def test_every_operator_survives_extreme_numerics(spark, tmp_path):
    """Engine totality under hostile numerics: an events table carrying
    NaN, +-Inf, +-1e15, -0.0, and heavy timestamp ties must not crash ANY
    registered operator Spark-side -- one bad telemetry row in 100 TB
    must not kill the job. (First run found four ANSI crashers: the
    round(value*100)->bigint cents cast threw on non-finite values in the
    LTV curve, session-position, propensity, and churn feature tables,
    and the z-score's bigint sum-of-squares overflowed at 1e17 cents; all
    now route through try_cast / DECIMAL(38,0) accumulators with the
    oracles mirrored.) Cross-engine agreement is NOT asserted here:
    NaN/Inf string formatting ('Infinity' vs 'inf', '1.0E15' vs
    '1e+15') and NaN quantile placement are engine-defined, so the
    oracle contract scopes them out -- this sweep pins that the ENGINE
    is total; hash parity stays pinned on the finite-valued fixtures."""
    from datetime import datetime

    from change_data_capture_service_spark.catalog import TABLE_NAMES

    rows = []
    vals = [float("nan"), float("inf"), float("-inf"), 1e15, -1e15, -0.0,
            0.0, 1e-15, 42.5]
    eid = 0
    for day in range(3):
        for k, v in enumerate(vals):
            rows.append(
                (eid, datetime(2024, 3, 1 + day, 10, 0), k % 3,
                 ["view", "click", "purchase"][k % 3], v, '{"a": 1}')
            )
            eid += 1
    src = str(tmp_path / "extreme")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{src}/events.parquet")
    for t in TABLE_NAMES:
        if t == "events":
            continue
        (
            load_table(spark, conftest_sf_dir(), t)
            .limit(50)
            .coalesce(1)
            .write.parquet(f"{src}/{t}.parquet")
        )

    failures = []
    for name in sorted(registry.entries()):
        try:
            registry.get(name).fn(spark, src).count()
        except Exception as ex:  # noqa: BLE001 - collecting the full list
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, failures


def test_every_operator_survives_hostile_prices(spark, tmp_path):
    """Relational totality: lineitem/orders rows with a near-DECIMAL-cap
    price, negative prices, discounts outside [0,1], zero quantities, and
    NULL flags/priorities must not crash any operator Spark-side. (First
    run found two ANSI crashers: the Q2 unit-cost division threw on a
    zero-quantity line, and the price-consistency DQ audit overflowed its
    6-dp DECIMAL on near-cap-price-over-cent-quantity -- exactly the
    defective rows a DQ pass exists to FLAG, so they now null out and are
    excluded instead of killing the query; oracles mirrored.)"""
    from change_data_capture_service_spark.catalog import TABLE_NAMES

    src = str(tmp_path / "hostile_prices")
    for t in TABLE_NAMES:
        if t in ("lineitem", "orders"):
            continue
        (
            load_table(spark, conftest_sf_dir(), t)
            .limit(50)
            .coalesce(1)
            .write.parquet(f"{src}/{t}.parquet")
        )
    li = load_table(spark, conftest_sf_dir(), "lineitem").limit(20).toPandas()
    li.loc[0, "l_extendedprice"] = 9.9e15  # near decimal(18,2) cap
    li.loc[1, "l_extendedprice"] = -5.0
    li.loc[2, "l_discount"] = 1.5
    li.loc[3, "l_discount"] = -0.5
    li.loc[4, "l_quantity"] = 0.0
    if "l_returnflag" in li.columns:
        li.loc[5, "l_returnflag"] = None
    spark.createDataFrame(li).coalesce(1).write.parquet(f"{src}/lineitem.parquet")
    o = load_table(spark, conftest_sf_dir(), "orders").limit(20).toPandas()
    o.loc[0, "o_totalprice"] = 9.9e15
    o.loc[1, "o_totalprice"] = -1.0
    o.loc[2, "o_orderpriority"] = None
    spark.createDataFrame(o).coalesce(1).write.parquet(f"{src}/orders.parquet")

    failures = []
    for name in sorted(registry.entries()):
        try:
            registry.get(name).fn(spark, src).count()
        except Exception as ex:  # noqa: BLE001 - collecting the full list
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, failures


def test_every_operator_survives_hostile_embeddings(spark, tmp_path):
    """Embedding totality: a corpus containing the zero vector (norm 0 --
    no direction), a NaN component, a 1e154 component (norm near double
    overflow), and an Inf component must not crash any operator
    Spark-side. (First run found 12 crashers, all one root cause: the
    cosine's norm-product divisor hit ANSI divide-by-zero, plus the
    Mahalanobis 1e-6 quantization overflowing BIGINT. Degenerate vectors
    are now excluded at the vector source -- they cannot participate in
    cosine space, the hygiene rule embedding_norm_stats surfaces -- and
    the Mahalanobis moments/terms try_cast, oracles mirrored.)"""
    from change_data_capture_service_spark.catalog import TABLE_NAMES

    src = str(tmp_path / "hostile_emb")
    for t in TABLE_NAMES:
        if t == "embeddings":
            continue
        (
            load_table(spark, conftest_sf_dir(), t)
            .limit(50)
            .coalesce(1)
            .write.parquet(f"{src}/{t}.parquet")
        )
    emb = load_table(spark, conftest_sf_dir(), "embeddings").limit(20).toPandas()
    emb.at[0, "embedding"] = [0.0] * 64
    v = list(emb.at[1, "embedding"]); v[0] = float("nan"); emb.at[1, "embedding"] = v
    v = list(emb.at[2, "embedding"]); v[0] = 1e154; emb.at[2, "embedding"] = v
    v = list(emb.at[3, "embedding"]); v[0] = float("inf"); emb.at[3, "embedding"] = v
    spark.createDataFrame(emb).coalesce(1).write.parquet(f"{src}/embeddings.parquet")

    failures = []
    for name in sorted(registry.entries()):
        try:
            registry.get(name).fn(spark, src).count()
        except Exception as ex:  # noqa: BLE001 - collecting the full list
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, failures
