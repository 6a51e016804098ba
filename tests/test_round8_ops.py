"""Semantic invariants for the round-5 late batch (TPC-H partsupp-derived
four, arrival/quality/mixture profiles, containment dedup, path mining,
discount dash) -- conservation laws and bounds that hash parity can't
express."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table

registry.load_all()


def _pdf(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir).toPandas()


def test_gini_bounds_and_independent_recompute(spark, sf_dir):
    """0 <= G < 1, and the operator's value matches an independent pandas
    recomputation of the rank formula from raw events."""
    g = _pdf(spark, sf_dir, "events_gini_concentration")
    assert ((g["gini"] >= 0) & (g["gini"] < 1)).all()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", F.col("value").cast("decimal(18,2)").alias("v"))
        .toPandas()
    )
    ev["cents"] = (ev["v"] * 100).astype("int64")
    for etype, grp in ev.groupby("event_type"):
        u = (
            grp.groupby("user_id")["cents"].sum().reset_index()
            .sort_values(["cents", "user_id"]).reset_index(drop=True)
        )
        n, tot = len(u), int(u["cents"].sum())
        s = int((u["cents"] * (u.index + 1)).sum())
        expect = round((2.0 * s - (n + 1) * tot) / (n * tot), 6)
        got = float(g.loc[g["event_type"] == etype, "gini"].iloc[0])
        assert math.isclose(got, expect, abs_tol=1e-9), (etype, got, expect)


def test_autocorr_is_a_correlation(spark, sf_dir):
    """|r| <= 1 and n_pairs = observed hours - 1 per stream."""
    a = _pdf(spark, sf_dir, "events_hourly_autocorr")
    assert (a["autocorr_lag1"].dropna().abs() <= 1.0 + 1e-9).all()
    hours = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts"))
        .count()
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for _, row in a.iterrows():
        assert row["n_pairs"] == hours[row["event_type"]] - 1


def test_perplexity_token_weighted_mean_is_corpus_entropy(spark, sf_dir):
    """Conservation law: the token-weighted mean of per-doc cross-entropy
    under the corpus unigram model IS the corpus unigram entropy --
    sum_docs(n_d * H_d) / N == -sum_vocab(p * ln p)."""
    ppl = _pdf(spark, sf_dir, "quality_perplexity_unigram")
    weighted = float((ppl["n_tokens"] * ppl["cross_entropy"]).sum() / ppl["n_tokens"].sum())
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")).alias("t"))
        .groupBy("t").count().toPandas()["count"]
    )
    p = toks / toks.sum()
    h_corpus = float(-(p * p.map(math.log)).sum())
    assert math.isclose(weighted, h_corpus, rel_tol=1e-4), (weighted, h_corpus)


def test_temperature_mixture_flattens_shares(spark, sf_dir):
    """Both share columns sum to 1, and alpha=0.5 compresses the
    distribution: the biggest source loses share, the smallest gains."""
    m = _pdf(spark, sf_dir, "sample_temperature_mixture").sort_values("raw_share")
    assert math.isclose(m["raw_share"].sum(), 1.0, abs_tol=1e-3)
    assert math.isclose(m["temp_share"].sum(), 1.0, abs_tol=1e-3)
    if m["raw_share"].iloc[-1] > m["raw_share"].iloc[0] + 1e-9:
        assert m["temp_share"].iloc[-1] < m["raw_share"].iloc[-1]
        assert m["temp_share"].iloc[0] > m["raw_share"].iloc[0]


def test_out_of_order_rate_internally_consistent(spark, sf_dir):
    o = _pdf(spark, sf_dir, "cdc_out_of_order_rate")
    assert (o["n_late"] <= o["n_events"]).all()
    for _, r in o.iterrows():
        assert math.isclose(r["late_rate"], round(r["n_late"] / r["n_events"], 6), abs_tol=1e-9)
        if r["n_late"] == 0:
            assert r["max_late_us"] == 0
        else:
            assert r["max_late_us"] > 0


def test_containment_dominates_jaccard(spark, sf_dir):
    """containment_a = c/na >= c/(na+nb-c) = jaccard, so every pair the
    exact-Jaccard op reports at >=0.5 must appear here with containment
    >= its jaccard (threshold permitting) -- and all containments are in
    (0, 1]."""
    cont = _pdf(spark, sf_dir, "dedup_containment_pairs")
    assert ((cont["containment_a"] > 0) & (cont["containment_a"] <= 1.0)).all()
    assert ((cont["containment_b"] > 0) & (cont["containment_b"] <= 1.0)).all()
    assert (cont[["containment_a", "containment_b"]].max(axis=1) >= 0.8 - 1e-9).all()
    assert (cont["doc_id_a"] < cont["doc_id_b"]).all()
    jac = _pdf(spark, sf_dir, "dedup_ngram_jaccard")
    merged = jac.merge(cont, on=["doc_id_a", "doc_id_b"], how="inner")
    for _, r in merged.iterrows():
        assert max(r["containment_a"], r["containment_b"]) >= r["jaccard"] - 1e-6


def test_entry_paths_conserve_users(spark, sf_dir):
    p = _pdf(spark, sf_dir, "events_entry_paths_topk")
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert p["n_users"].sum() <= n_users
    assert (p["path"].str.count(">") <= 2).all()
    # top-20 is sorted deterministically
    assert list(p["n_users"]) == sorted(p["n_users"], reverse=True)


def test_q2_reports_the_regional_minimum_once_per_supplier_part(spark, sf_dir):
    q2 = _pdf(spark, sf_dir, "tpch_q2_min_cost_supplier")
    if len(q2) == 0:
        return  # sf0.001 may have no LARGE parts in the size band
    assert (q2["supply_cost"] > 0).all()
    # every row for one part carries the same (minimum) cost
    assert (q2.groupby("p_partkey")["supply_cost"].nunique() == 1).all()


def test_q16_counts_bounded_by_clean_suppliers(spark, sf_dir):
    q16 = _pdf(spark, sf_dir, "tpch_q16_supplier_count_by_part")
    n_ok = (
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0).count()
    )
    assert (q16["supplier_cnt"] <= n_ok).all()
    assert q16["p_size"].isin([1, 4, 9, 16, 25, 36, 49]).all()
    assert (q16["p_type"] != "PROMO").all()


def test_q20_dominance_verified_from_raw(spark, sf_dir):
    """Every listed supplier must actually dominate (>half of 1996 volume)
    at least one 'small %' part, recomputed independently from raw."""
    q20 = _pdf(spark, sf_dir, "tpch_q20_dominant_suppliers")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .select("l_partkey", "l_suppkey", (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint").alias("qc"))
        .toPandas()
    )
    parts = load_table(spark, sf_dir, "part").toPandas()
    small = set(parts.loc[parts["p_name"].str.startswith("small "), "p_partkey"])
    sup = load_table(spark, sf_dir, "supplier").toPandas().set_index("s_suppkey")["s_name"]
    pq = li.groupby(["l_partkey", "l_suppkey"])["qc"].sum().reset_index()
    pt = pq.groupby("l_partkey")["qc"].sum()
    dom_keys = {
        int(r["l_suppkey"])
        for _, r in pq.iterrows()
        if r["l_partkey"] in small and 2 * r["qc"] > pt[r["l_partkey"]]
    }
    assert set(q20["s_name"]) == {sup[k] for k in dom_keys}


def test_discount_effect_shares_sum_to_one(spark, sf_dir):
    d = _pdf(spark, sf_dir, "discount_quantity_effect")
    assert math.isclose(d["revenue_share"].sum(), 1.0, abs_tol=1e-3)
    assert (d["avg_qty"] > 0).all()
    assert (d["n_items"] > 0).all()


def test_lsh_bucket_stats_bound_verified_pairs(spark, sf_dir):
    """Containment law: every near-dup pair the MinHash op reports must
    share at least one band bucket, so the panel's candidate total bounds
    the verified pair count; per-band doc totals equal the banded corpus."""
    stats = _pdf(spark, sf_dir, "dedup_lsh_bucket_stats")
    assert len(stats) == 8
    near = registry.get("dedup_minhash_near").fn(spark, sf_dir).count()
    assert int(stats["candidate_pairs"].sum()) >= near
    assert stats["n_docs"].nunique() == 1  # every band sees every banded doc
    assert (stats["max_bucket"] >= 1).all()


def test_attribution_conserves_purchases(spark, sf_dir):
    """Every purchase is attributed exactly once, and total attributed
    revenue equals total purchase revenue to the cent."""
    att = _pdf(spark, sf_dir, "attribution_last_touch")
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    n = e.count()
    cents = int(
        e.select(F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint")))
        .collect()[0][0]
    )
    assert int(att["n_purchases"].sum()) == n
    assert math.isclose(float(att["attributed_value"].sum()), cents / 100, abs_tol=0.05)


def test_minhash_estimator_error_inside_envelope(spark, sf_dir):
    """32-permutation MinHash: measured mean |est - exact| on candidate
    pairs must sit inside the analytic estimator envelope
    (std <= sqrt(0.25/32) ~ 0.088), and the estimate must rank near-dups
    usefully (no candidate with exact J >= 0.8 estimated below 0.5)."""
    q = _pdf(spark, sf_dir, "dedup_minhash_estimate_quality")
    if len(q) == 0:
        return
    assert q["abs_err"].mean() <= 0.09, q["abs_err"].mean()
    bad = q[(q["exact_jaccard"] >= 0.8) & (q["est_jaccard"] < 0.5)]
    assert len(bad) == 0, bad


def test_recall_eval_bounds_and_methods(spark, sf_dir):
    """Each method reports every query exactly once with recall in [0, 1];
    the IVF tier (probing real partitions of the space) must find at least
    some true neighbors on the fixture."""
    r = _pdf(spark, sf_dir, "knn_recall_eval")
    assert sorted(r["method"].unique()) == ["ivf", "ivf_pq", "lsh", "pq"]
    assert ((r["recall_at_k"] >= 0) & (r["recall_at_k"] <= 1)).all()
    assert (r.groupby("method")["query_id"].count() == r["query_id"].nunique()).all()
    assert r.loc[r["method"] == "ivf", "recall_at_k"].mean() > 0


def test_langid_confusion_rows_are_distributions(spark, sf_dir):
    """Within each true language the shares sum to 1; predictions only
    ever name the three languages the heuristic knows; English recall is
    high on the fixture (its markers are planted)."""
    c = _pdf(spark, sf_dir, "text_langid_confusion")
    assert set(c["pred_lang"]) <= {"en", "de", "fr"}
    sums = c.groupby("lang")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-3).all(), sums
    en = c[(c["lang"] == "en") & (c["pred_lang"] == "en")]["share"]
    assert len(en) == 1 and float(en.iloc[0]) >= 0.9


def test_cumulative_reach_converges_to_user_count(spark, sf_dir):
    """Each user is new exactly once: new_users sums to |users|, the curve
    is non-decreasing, and its last point equals the distinct user count."""
    r = _pdf(spark, sf_dir, "events_cumulative_reach").sort_values("day")
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert int(r["new_users"].sum()) == n_users
    assert int(r["cumulative_reach"].iloc[-1]) == n_users
    assert r["cumulative_reach"].is_monotonic_increasing


def test_containment_candidate_space_bounded_under_boilerplate(spark, tmp_path):
    """Adversarial fixture: 200 docs that all share one boilerplate
    shingle (df=200 > CONTAINMENT_DF_CAP) plus unique tails. Uncapped,
    the hot shingle alone forms C(200,2)=19900 candidate pairs; with the
    structural DF cap the candidate join sees ZERO pairs. A genuine
    near-dup pair built from low-df shingles must still surface with
    exact containment 1.0 -- the cap trades recall on boilerplate-only
    overlap, never correctness of surfaced values."""
    from change_data_capture_service_spark.operators.dedup import (
        CONTAINMENT_DF_CAP,
        _shingled_docs,
        dedup_containment_pairs,
    )

    rows = []
    # 200 docs: shared boilerplate trigram + a unique 3-token tail each
    for i in range(200):
        rows.append((i, f"common header line unique{i}a unique{i}b unique{i}c", "en", "t", 0))
    # one true containment pair from low-df shingles (doc 500 inside 501)
    core = "alpha beta gamma delta epsilon zeta"
    rows.append((500, core, "en", "t", 0))
    rows.append((501, core + " eta theta iota kappa", "en", "t", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    fx = str(tmp_path / "advfix")
    df.coalesce(1).write.mode("overwrite").parquet(fx + "/documents.parquet")

    import pyspark.sql.functions as F

    sh = _shingled_docs(spark, fx)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    assert dfreq.agg(F.max("df")).collect()[0][0] == 200  # fixture is adversarial
    ok = dfreq.filter(F.col("df") <= CONTAINMENT_DF_CAP).select("shingle")
    exc = ex.join(ok, "shingle", "left_semi")
    a, b = exc.alias("a"), exc.alias("b")
    n_cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    # bounded by construction: only the genuine pair's shared low-df shingles
    assert n_cand == 1, n_cand

    out = dedup_containment_pairs(spark, fx).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (500, 501)
    assert r["containment_a"] == 1.0  # doc 500 fully contained in 501
