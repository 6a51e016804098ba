"""Semantic invariants + plan-shape gates for the round-5 batch (TPC-H
completion, ops monitoring, corpus profiles, line-grain MinHash, hybrid
retrieval, the Misra-Gries sketch, and the windowed streaming top-k) --
the properties hash parity can't express, and the 100 TB plan shapes
asserted at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.plans import inspect as P

registry.load_all()


def _df(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


# -- plan shapes -------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["tpch_q9_product_profit", "tpch_q17_small_qty_revenue", "basket_brand_lift"],
)
def test_r5_relational_dims_broadcast(spark, sf_dir, name):
    assert P.uses_broadcast_join(_df(spark, sf_dir, name)), f"{name} lost its broadcast"


def test_q6_pushes_every_predicate(spark, sf_dir):
    """Q6 is the pushdown showcase: shipdate, discount, and quantity must
    all reach the parquet scan for row-group skipping."""
    df = _df(spark, sf_dir, "tpch_q6_forecast_revenue")
    plan = P.formatted_plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed to the scan"


def test_q4_exists_is_semi_join(spark, sf_dir):
    """The EXISTS must compile to a semi join (no row multiplication),
    never an aggregate-then-join or a nested loop over line items."""
    plan = P.formatted_plan(_df(spark, sf_dir, "tpch_q4_order_priority_exists"))
    assert "LeftSemi" in plan


def test_q21_windows_share_one_partitioning(spark, sf_dir):
    """All three windows partition by l_orderkey; the plan must sort and
    shuffle once for them, not once per window function."""
    df = _df(spark, sf_dir, "tpch_q21_waiting_suppliers")
    plan = P.formatted_plan(df)
    assert plan.count("Window") <= 4  # tree + detail for at most 2 Window nodes
    assert "TakeOrderedAndProject" in plan


def test_hybrid_ranks_never_window_corpus_rows(spark, sf_dir):
    """The rank windows must run on the top-50 limited relations: both
    single-partition windows sit above a limit, so the plan carries
    TakeOrderedAndProject nodes and the fusion join is row-bounded."""
    df = _df(spark, sf_dir, "knn_cosine_hybrid")
    plan = P.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert P.uses_broadcast_join(df)


def test_stream_topk_rank_prunes_map_side(spark, sf_dir):
    """rnk<=3 must push into the window sort (WindowGroupLimit) so only 3
    rows per window survive each partition before the exchange."""
    plan = P.formatted_plan(_df(spark, sf_dir, "stream_topk_windowed"))
    assert "WindowGroupLimit" in plan


def test_dim_profile_shuffles_dims_not_rows(spark, sf_dir):
    """The per-dimension agg must partial-aggregate: executed shuffle
    records are bounded by |dims| x |tasks|, never |rows| x |dims|."""
    from change_data_capture_service_spark.catalog import load_table

    df = _df(spark, sf_dir, "embedding_dim_profile")
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    e = load_table(spark, sf_dir, "embeddings")
    n_dims = len(e.select("embedding").first()[0])
    n_tasks = e.rdd.getNumPartitions()
    assert 0 < m["shuffleRecordsWritten"] <= n_dims * n_tasks


# -- semantic invariants -----------------------------------------------------


def test_approx_topk_matches_exact_heavy_hitters(spark, sf_dir, duck):
    """Misra-Gries gate: the estimated top-10 set must equal the exact
    top-10, and every estimate must sit within the deterministic N/cap
    error bound (estimates never exceed true counts)."""
    from change_data_capture_service_spark.operators.aggregates import MG_CAPACITY

    approx = _df(spark, sf_dir, "approx_topk").toPandas()
    exact = duck.execute(
        """
        SELECT tok, count(*) AS n FROM (
          SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
          FROM documents) GROUP BY 1 ORDER BY n DESC, tok LIMIT 20
        """
    ).fetchdf()
    n_total = duck.execute(
        "SELECT sum(len(list_filter(string_split(lower(text), ' '), x -> x <> '')))"
        " FROM documents"
    ).fetchone()[0]
    assert set(approx.tok[:10]) == set(exact.tok[:10])
    merged = approx.merge(exact, on="tok", how="inner")
    assert (merged.est_count <= merged.n).all(), "MG estimate exceeded true count"
    assert ((merged.n - merged.est_count) <= n_total / MG_CAPACITY).all()


def test_minhash_lines_is_subset_of_exact_and_finds_all(spark, sf_dir, duck):
    """Banding affects recall only (candidates are exact-verified): the
    result must equal the exact >=0.7 line-Jaccard pair set -- on the
    fixture the 16x2 banding detects every true pair."""
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in _df(spark, sf_dir, "dedup_minhash_lines").collect()
    }
    odf = duck.execute(registry.get("dedup_minhash_lines").oracle).fetchdf()
    want = set(zip(odf.doc_id_a, odf.doc_id_b))
    assert got == want


def test_stream_topk_windowed_stream_equivalence(spark, sf_dir, tmp_path):
    """Drain the true-streaming counts and take top-3 per window as a
    batch post-process: must equal the registered batch query exactly."""
    from pyspark.sql import Window as W

    from change_data_capture_service_spark.streaming.windows import (
        stream_events,
        topk_windowed_stream,
    )

    # complete mode: append-mode watermarking would (correctly) hold back
    # the final <watermark-delay> of windows at end-of-stream; equivalence
    # is about the finalized counts, so read the complete state
    counts = topk_windowed_stream(stream_events(spark, sf_dir))
    q = (
        counts.writeStream.format("memory")
        .queryName("tk_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("tk_counts")
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    )
    got = {
        tuple(r)
        for r in drained.withColumn("rnk", rk.cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "event_type", F.col("n").cast("bigint"), "rnk")
        .collect()
    }
    want = {tuple(r) for r in _df(spark, sf_dir, "stream_topk_windowed").collect()}
    assert got == want


def test_replication_lag_anchor_stream_has_zero_lag(spark, sf_dir):
    """The stream carrying the global max timestamp must report exactly
    zero lag; every stream's lag is non-negative."""
    rows = _df(spark, sf_dir, "cdc_replication_lag").collect()
    assert min(r.lag_seconds for r in rows) == 0.0
    assert all(r.lag_seconds >= 0 for r in rows)
    assert all(r.n_last_hour >= 0 for r in rows)


def test_ltv_deciles_partition_users_exactly(spark, sf_dir):
    """Deciles must cover every purchasing user exactly once, and band
    averages must be monotone non-increasing (decile 1 = whales)."""
    from change_data_capture_service_spark.catalog import load_table

    rows = sorted(
        _df(spark, sf_dir, "events_user_ltv_deciles").collect(), key=lambda r: r.decile
    )
    n_users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    avgs = [r.avg_ltv for r in rows]
    assert avgs == sorted(avgs, reverse=True)


def test_readability_bounds_and_monotonicity(spark, sf_dir):
    """Flesch pieces must be internally consistent: syllable runs can't
    exceed... (every token has at least one vowel run in this corpus's
    vocabulary is NOT guaranteed, so assert the weaker invariants:
    non-negative counts, sentences = ceil(words/12))."""
    import math

    for r in _df(spark, sf_dir, "docs_readability").collect():
        assert r.n_words > 0 and r.n_syllables >= 0
        assert r.n_sentences == math.ceil(r.n_words / 12.0)


def test_ttr_hapax_bounds(spark, sf_dir):
    for r in _df(spark, sf_dir, "text_doc_ttr_hapax").collect():
        assert 0 < r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        assert 0 < r.ttr <= 1 and 0 <= r.hapax_ratio <= 1


def test_bigram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The lowest doc_id can only contain first-seen bigrams: novelty 1;
    and every novelty lies in [0, 1]."""
    rows = _df(spark, sf_dir, "docs_bigram_novelty").collect()
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    assert all(0 <= r.novelty <= 1 for r in rows)


def test_hybrid_contains_head_of_both_lists(spark, sf_dir):
    """RRF with k=60 guarantees each list's rank-1 item scores at least
    1/61 > any single-list item at rank >= 2 can contribute alone -- both
    rank-1 docs must appear in the fused top-20."""
    rows = _df(spark, sf_dir, "knn_cosine_hybrid").collect()
    ids = {r.doc_id for r in rows}
    r1_bm = next((r.doc_id for r in rows if r.bm25_rank == 1), None)
    r1_vec = next((r.doc_id for r in rows if r.vec_rank == 1), None)
    assert r1_bm in ids and r1_vec in ids
    # fused order is by rrf_score: verify it recomputes from the ranks
    for r in rows:
        want = (1.0 / (60 + r.bm25_rank) if r.bm25_rank > 0 else 0.0) + (
            1.0 / (60 + r.vec_rank) if r.vec_rank > 0 else 0.0
        )
        assert abs(r.rrf_score - round(want, 6)) < 1e-9


def test_interarrival_median_le_max_and_positive_gaps(spark, sf_dir):
    for r in _df(spark, sf_dir, "events_interarrival_stats").collect():
        assert r.n_gaps > 0
        assert 0 <= r.p50_gap_s <= r.max_gap_s
        assert r.avg_gap_s <= r.max_gap_s
