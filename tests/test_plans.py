"""Physical-plan quality gates: the plans we'd want at 100 TB, asserted at
test scale. A query that silently loses pushdown/broadcast regresses here
even while staying numerically correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.plans import inspect as P

registry.load_all()


def test_projection_prunes_scan(spark, sf_dir):
    df = registry.get("projection").fn(spark, sf_dir)
    cols = set(P.scan_read_schema(df))
    assert cols == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"}, cols


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = registry.get("filter_pred").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "PushedFilters" in plan
    # range + IN predicates must appear in the pushed set, not only post-scan
    assert "l_quantity" in plan.split("PushedFilters")[1][:500]


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("join_broadcast", "join_multi", "join_inner_equi"):
        df = registry.get(name).fn(spark, sf_dir)
        assert P.uses_broadcast_join(df), f"{name} lost its broadcast"


def test_latest_state_is_partial_agg_not_window(spark, sf_dir):
    """The flagship must stay a hash-aggregate (map-side combine), not a
    window sort -- one partially-reduced shuffle at any scale."""
    df = registry.get("latest_state").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    df = registry.get("topk").fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in P.formatted_plan(df)


def test_topk_per_group_prunes_map_side(spark, sf_dir):
    """rank-limit pushdown (WindowGroupLimit) must keep only k rows per
    group BEFORE the shuffle -- without it the exchange carries every row
    of every group to the window sort."""
    df = registry.get("topk_per_group").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "WindowGroupLimit" in plan, "rank-limit pushdown lost"
    assert P.count_shuffles(df) == 1


def test_hash_sampling_is_shuffle_free(spark, sf_dir):
    """Deterministic sampling must stay a pure scan+filter: zero exchanges,
    and the projection pruned to the selected columns."""
    for name in ("sample_hash", "sample_stratified"):
        df = registry.get(name).fn(spark, sf_dir)
        assert P.count_shuffles(df) == 0, f"{name} grew a shuffle"


def test_pack_token_budget_is_one_shuffle(spark, sf_dir):
    """Sequence packing = one hash-partition on the stratum key, then a
    sorted window inside each partition -- any second exchange would mean
    the window re-partitioned."""
    df = registry.get("pack_token_budget").fn(spark, sf_dir)
    assert P.count_shuffles(df) == 1


@pytest.mark.parametrize(
    "key", ["knn_cosine_topk", "knn_l2_topk", "knn_label_purity"]
)
def test_knn_topk_reduces_before_window(spark, sf_dir, key):
    """The exact-kNN window must rank the LOCAL top-k survivors (bounded:
    partitions x queries x k rows), never the full N x Q scored set. The
    r14 form plans this as WindowGroupLimit: a Partial pruner BELOW the
    window's exchange keeps each map task's top-k per query in the JVM
    (SPARK-37099) -- the same row bound the former Arrow mapInPandas
    reducer enforced by hand, with zero Python boundary. All three
    row_number()<=k consumers are gated (r14 ADVICE: only the cosine
    member was, so a config change -- e.g.
    spark.sql.window.group.limit.threshold=-1 -- or a pattern regression
    would silently funnel the full scored set through the window
    exchange in the ungated ops)."""
    df = registry.get(key).fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert plan.count(") WindowGroupLimit") >= 2, (
        "rank-limit pushdown lost: need Partial (below exchange) + Final"
    )
    assert "MapInPandas" not in plan, "Python reducer crept back into kNN"
    # tree order check (root-first rendering): Window -> Final
    # WindowGroupLimit -> Exchange -> Partial WindowGroupLimit, i.e. a
    # map-side pruner sits BELOW the window's shuffle
    import re

    tree = plan[: plan.index("(1) ")]
    assert re.search(
        r"Window .*?WindowGroupLimit .*?Exchange .*?WindowGroupLimit", tree, re.S
    ), "no map-side WindowGroupLimit below the window exchange"


def test_gapfill_spine_join_broadcasts(spark, sf_dir):
    """The dense hour spine is O(hours); its join with the hourly aggregate
    must be a broadcast, never a sort-merge over the fact table."""
    df = registry.get("gapfill_hourly").fn(spark, sf_dir)
    assert P.uses_broadcast_join(df)


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the per-customer scalar subquery into an
    aggregate + join (two scans total), never a per-row re-execution."""
    df = registry.get("subquery_correlated").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "Join" in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_histogram_is_single_partial_agg(spark, sf_dir):
    """floor-binning must partial-aggregate map-side: one exchange carrying
    (bucket, partial) rows only."""
    df = registry.get("agg_histogram").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.count_shuffles(df) == 1
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_pii_and_chunking_are_map_side_only(spark, sf_dir):
    """Per-document derivations (regex scrub, stride chunking) must stay
    embarrassingly parallel: zero exchanges, scan -> project/generate."""
    for name in ("pii_redact", "chunk_documents"):
        df = registry.get(name).fn(spark, sf_dir)
        assert P.count_shuffles(df) == 0, f"{name} grew a shuffle"


def test_ngram_counts_partial_aggs_then_topk(spark, sf_dir):
    """Corpus bigram counting: one partially-combined shuffle of (gram,
    count) pairs, then TakeOrderedAndProject for the top-k -- never a
    global sort of the distinct-gram set."""
    df = registry.get("ngram_counts").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.count_shuffles(df) == 1
    assert "TakeOrderedAndProject" in plan


def test_tpch_q3_broadcasts_and_pushes_down(spark, sf_dir):
    df = registry.get("tpch_q3_shipping").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.uses_broadcast_join(df), "customer dim lost its broadcast"
    assert "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan


def test_embedding_norm_stats_is_one_shuffle(spark, sf_dir):
    """Norms fold JVM-side per row; only the |labels|-row partial agg
    shuffles."""
    df = registry.get("embedding_norm_stats").fn(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_salted_join_replicates_build_side(spark, sf_dir):
    """The salt explode (Generate) must sit on the build side; the fact
    table itself is never replicated."""
    df = registry.get("join_skew_salted").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "Generate" in plan
    # fact side adds a projected salt column only -- no Generate above its scan
    assert plan.count("Generate explode") <= 2


def test_quality_rules_shuffle_counts_not_text(spark, sf_dir):
    """Two partial aggregations ((doc, token) then doc): at most two
    exchanges, both carrying counts -- document text never shuffles."""
    df = registry.get("quality_gopher_rules").fn(spark, sf_dir)
    assert P.count_shuffles(df) <= 2


def test_ohlc_is_single_partial_agg_no_window(spark, sf_dir):
    """OHLC must stay one min_by/max_by hash aggregate -- the windowed
    two-ranking formulation (the oracle's) would re-sort every event."""
    df = registry.get("ohlc_hourly").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.count_shuffles(df) == 1
    assert "Window" not in plan


def test_agg_mode_ranks_reduced_rows_only(spark, sf_dir):
    """The rank window must sit above the (user, type) aggregation --
    ranking raw events would sort the fact table."""
    df = registry.get("agg_mode").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "Window" in plan
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    assert P.count_shuffles(df) == 2


def test_sessionize_shares_one_keyed_shuffle(spark, sf_dir):
    """Both windows and the session rollup cluster on user_id -- the plan
    must hash-partition the events ONCE and keep every later stage
    exchange-free (HashPartitioning(user_id) satisfies the groupBy's
    clustering requirement)."""
    df = registry.get("sessionize_batch").fn(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_transitions_window_then_reduced_agg(spark, sf_dir):
    """lag() shuffles the events once on user_id; the (from, to) count
    re-shuffles only |types|^2-bounded partial states."""
    df = registry.get("event_transitions").fn(spark, sf_dir)
    assert P.count_shuffles(df) == 2


def test_audience_overlap_broadcasts_sizes(spark, sf_dir):
    """Per-type audience sizes are |types| scalar rows -- both joins into
    the Jaccard projection must broadcast, never shuffle the pair set."""
    df = registry.get("audience_overlap").fn(spark, sf_dir)
    assert P.uses_broadcast_join(df)


def test_knn_range_is_shuffle_free(spark, sf_dir):
    """Radius search = broadcast queries + map-side filter: the corpus
    must never shuffle (spread()'s rebalance of the single fixture file
    is the only allowed exchange, and it carries no join/agg key)."""
    df = registry.get("knn_cosine_range").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.uses_broadcast_join(df)
    assert "Window" not in plan
    # spread()'s round-robin rebalances are allowed (they carry no key and
    # vanish in the many-files regime); a KEYED exchange would mean the
    # corpus started shuffling for a join/agg it shouldn't need.
    assert "hashpartitioning" not in plan.lower()


def test_cdc_delta_pushes_lsn_range_to_scan(spark, sf_dir):
    """The checkpoint-range predicate must reach the parquet scan
    (file/row-group skipping on an LSN-ordered log), and the compaction
    stays one max_by partial agg."""
    df = registry.get("cdc_changes_between").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "PushedFilters" in plan
    assert "event_id" in plan.split("PushedFilters")[1][:400]
    assert P.count_shuffles(df) == 1
    assert "Window" not in plan


def test_dataset_split_is_map_side_plus_one_agg(spark, sf_dir):
    """Hash assignment is pure projection; only |splits| x |langs| partial
    states may shuffle."""
    df = registry.get("dataset_split").fn(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_headline_relational_ops_stay_in_codegen(spark, sf_dir):
    """The hot relational path must run inside WholeStageCodegen spans
    (the '*(n)' markers): a Python UDF or codegen-breaking expression
    sneaking into these operators would drop them to interpreted
    row-at-a-time execution -- numerically identical, 10x slower."""
    for name in ("agg_sum_avg_minmax_count", "filter_pred", "join_inner_equi",
                 "win_running_sum", "sessionize_batch", "cdc_changes_between"):
        df = registry.get(name).fn(spark, sf_dir)
        df.collect()  # AQE materializes codegen stages only at execution
        plan = P.simple_plan(df)
        assert "*(" in plan, f"{name} fell out of whole-stage codegen"
        assert "BatchEvalPython" not in plan, f"{name} contains a row-at-a-time Python UDF"


def test_incremental_minhash_never_shuffles_text(spark, sf_dir):
    """The candidate probe joins banded signatures (24-byte rows); shingle
    arrays re-enter only for the candidate verification joins. A plan
    where the first join carries 'shingles' would re-pair the corpus."""
    df = registry.get("dedup_incremental_minhash").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    first_join = plan.find("Join")
    assert first_join != -1
    # the band-probe join condition mentions band columns, not shingles
    assert "band_hash" in plan


def test_stream_enrich_dim_broadcasts(spark, sf_dir):
    """The enrichment dimension must broadcast -- a shuffled dim join per
    micro-batch would re-shuffle the stream every trigger."""
    df = registry.get("stream_enrich_join").fn(spark, sf_dir)
    assert P.uses_broadcast_join(df)


def test_robust_fences_broadcast_scalars(spark, sf_dir):
    """winsorize/IQR: the per-type percentile fences are dimension-sized
    and must broadcast -- the fact table may not shuffle for the join."""
    for name in ("winsorize_stats", "iqr_outliers"):
        df = registry.get(name).fn(spark, sf_dir)
        assert P.uses_broadcast_join(df), f"{name} lost its fence broadcast"


def test_equi_depth_avoids_global_ntile(spark, sf_dir):
    """Decile assignment must be a broadcast of 9 boundaries + map-side
    filter-count, never a global-window ntile (single-reducer sort)."""
    df = registry.get("agg_hist_equi_depth").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "Window" not in plan
    assert P.uses_broadcast_join(df)


def test_heavy_hitters_total_from_rollup(spark, sf_dir):
    """The grand total must come from the per-key rollup, not a second
    fact-table aggregation: at runtime AQE must reuse the rollup's shuffle
    (ReusedExchange), so the count exchange is produced exactly once."""
    df = registry.get("agg_heavy_hitters").fn(spark, sf_dir)
    df.collect()  # exchange reuse only materializes in the adaptive plan
    plan = P.simple_plan(df)
    assert "ReusedExchange" in plan, "grand total recomputes the per-key rollup"
    assert "TakeOrderedAndProject" in P.formatted_plan(df)


def test_reservoir_k_prunes_map_side(spark, sf_dir):
    """Fixed-k-per-group sampling must ride WindowGroupLimit so each map
    task ships only its local top-k per group."""
    df = registry.get("sample_reservoir_k").fn(spark, sf_dir)
    assert "WindowGroupLimit" in P.formatted_plan(df)


def test_decontaminate_exact_broadcasts_probes(spark, sf_dir):
    """Probe strings are eval-suite-sized: the containment join must be a
    broadcast nested loop; a shuffled cross product would move the corpus."""
    df = registry.get("decontaminate_exact").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or P.uses_broadcast_join(df)


def test_merge_upsert_compacts_before_join(spark, sf_dir):
    """Both MERGE sides must reduce to one row per key (partial agg)
    BEFORE the full-outer join -- the join may only ever see |keys| rows."""
    df = registry.get("cdc_merge_upsert").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    join_pos = plan.find("SortMergeJoin FullOuter")
    if join_pos == -1:
        join_pos = plan.find("FullOuter")
    assert join_pos != -1
    # aggregates appear before the join in the formatted tree
    assert plan.find("HashAggregate") < join_pos or plan.find("ObjectHashAggregate") < join_pos


def test_snapshot_asof_pushes_time_predicate(spark, sf_dir):
    """AS-OF reconstruction must push ts <= T into the parquet scan for
    row-group skipping on time-ordered log files."""
    df = registry.get("cdc_snapshot_asof").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "PushedFilters" in plan and "ts" in plan.split("PushedFilters")[1][:300]
    assert "Window" not in plan


def test_rollup_series_windows_stay_on_reduced_rows(spark, sf_dir):
    """rolling corr / EWMA: the window runs on the hourly rollup, so the
    plan must aggregate before it windows -- fact rows never enter frames."""
    for name in ("rolling_corr_24h", "ewma_hourly"):
        df = registry.get(name).fn(spark, sf_dir)
        plan = P.formatted_plan(df)
        win = plan.find("Window")
        agg = plan.find("HashAggregate")
        assert win != -1 and agg != -1
        # formatted tree prints leaves last: the aggregate node must sit
        # BELOW the window (higher index) as the window's input
        assert agg > win, f"{name}: window is not fed by the rollup aggregate"


def test_bm25_probes_postings_not_corpus(spark, sf_dir):
    """The term filter must land before the tf aggregation (postings-probe
    shape), df/stats must broadcast back, and the top-k must be
    TakeOrderedAndProject -- nothing corpus-sized shuffles."""
    df = registry.get("search_bm25").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert P.uses_broadcast_join(df)


def test_measured_shuffle_budgets(spark, sf_dir):
    """Ground-truth gate on executed SQLMetrics (not plan shape): the
    partial-agg flagship must shuffle exactly |keys| records however many
    events exist, and the pushdown scan must shuffle zero."""
    from change_data_capture_service_spark.catalog import load_table

    df = registry.get("latest_state").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    n_keys = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    # partial aggregation legitimately emits up to |scan tasks| x |keys|
    # pre-shuffle records on a multi-partition input; the sf0.001 fixture
    # ships one row group (one task), so the observed value is usually
    # exactly n_keys
    n_tasks = load_table(spark, sf_dir, "events").rdd.getNumPartitions()
    assert n_keys <= m["shuffleRecordsWritten"] <= n_tasks * n_keys, (
        f"latest_state shuffled {m['shuffleRecordsWritten']} records for "
        f"{n_keys} keys over {n_tasks} tasks -- partial aggregation lost"
    )

    scan = registry.get("filter_pred").fn(spark, sf_dir)
    scan.collect()
    m2 = P.executed_metrics(scan, ("shuffleRecordsWritten", "shuffleBytesWritten"))
    assert m2["shuffleRecordsWritten"] == 0 and m2["shuffleBytesWritten"] == 0


def test_tpch_completion_dims_broadcast_and_windows_bounded(spark, sf_dir):
    """The round-5 TPC-H completions (Q2/Q11/Q16/Q20) must keep every dim
    side broadcast and at most Q2's single per-part-minimum window; the
    only fact-sized exchange in each is the derived part-supplier (or
    part-value) partial aggregate."""
    q2 = registry.get("tpch_q2_min_cost_supplier").fn(spark, sf_dir)
    assert P.uses_broadcast_join(q2), "q2 lost its supplier/part broadcasts"
    assert P.formatted_plan(q2).count("Window") <= 2, "q2 grew extra window passes"
    for name in ("tpch_q11_important_stock", "tpch_q16_supplier_count_by_part",
                 "tpch_q20_dominant_suppliers"):
        df = registry.get(name).fn(spark, sf_dir)
        plan = P.formatted_plan(df)
        assert P.uses_broadcast_join(df), f"{name} lost its broadcast"
        assert "Window" not in plan, f"{name} acquired a window it should not need"
        assert "CartesianProduct" not in plan, f"{name} fell to a cartesian"


def test_arrival_profile_ops_reduce_before_windows(spark, sf_dir):
    """Batch-2 round-5 ops: the perplexity model must derive from the tf
    relation (one corpus explode, token-keyed co-located join), and the
    Gini/autocorr windows must run over reduced relations, never raw
    facts."""
    ppl = registry.get("quality_perplexity_unigram").fn(spark, sf_dir)
    ppl.collect()  # AQE resolves exchange reuse only at execution
    # simple_plan prints Final Plan then Initial Plan; judge the final only
    final = P.simple_plan(ppl).split("== Initial Plan ==")[0]
    n_explodes = final.count("Generate explode")
    assert n_explodes <= 2 and "CartesianProduct" not in final, (
        f"perplexity plan degraded: {n_explodes} corpus explodes"
    )
    for name in ("events_gini_concentration", "events_hourly_autocorr"):
        df = registry.get(name).fn(spark, sf_dir)
        plan = P.formatted_plan(df)
        # the window's child must be an aggregate (the reduction), so the
        # raw fact table never feeds a sort
        assert "Window" in plan and "HashAggregate" in plan, name
    ooo = registry.get("cdc_out_of_order_rate").fn(spark, sf_dir)
    assert P.count_shuffles(ooo) <= 2, "out-of-order profile grew extra exchanges"


def test_entry_paths_shuffle_bounded_by_rank_limit(spark, sf_dir):
    """Measured SQLMetrics gate: WindowGroupLimit must cap the user-keyed
    exchange at <= tasks x 3 rows per user plus the small path rollup --
    without the pushdown the exchange carries EVERY event of every user."""
    from change_data_capture_service_spark.catalog import load_table

    df = registry.get("events_entry_paths_topk").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_tasks = ev.rdd.getNumPartitions()
    n_events = ev.count()
    # window exchange <= tasks*users*3, path agg exchange <= tasks*paths
    # (paths <= users); the un-pruned plan would exceed this whenever
    # users average > ~7 events
    budget = n_tasks * n_users * 3 + n_tasks * n_users + 20
    assert m["shuffleRecordsWritten"] <= budget, (
        f"shuffled {m['shuffleRecordsWritten']} > budget {budget} "
        f"({n_events} events, {n_users} users): rank-limit pushdown lost"
    )


def test_marginals_are_windows_not_rescans(spark, sf_dir):
    """The round-6 plan-hygiene rule: marginals over a shared rollup must
    be window sums (one fact scan), not groupBy branches (a scan per
    branch). Pins docs_language_mix_drift and events_forecast_baseline_mae
    at exactly one planned file scan each."""
    import re

    for name in ("docs_language_mix_drift", "events_forecast_baseline_mae"):
        df = registry.get(name).fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = len(re.findall(r"\w+\.parquet", plan))
        assert scans == 1, f"{name}: {scans} planned file scans (marginal branches re-scan)"


def test_materialize_once_relations_plan_as_rdd_scans(spark, sf_dir):
    """Multi-consumer reduced relations go through lazy localCheckpoint --
    every consumer must read the checkpointed RDD (Scan ExistingRDD), and
    the SQL cache manager must stay EMPTY (persist() there would leak
    cached subtrees into unrelated queries' plans, the bug this pins)."""
    df = registry.get("basket_brand_lift").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "basket relation no longer checkpointed"
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "SQL cache manager not empty: a persist() leaked back in"


def test_bootstrap_shuffle_is_replicate_bounded(spark, sf_dir):
    """The Poisson bootstrap's whole point at scale: the x200 explode is
    map-side CPU work; what crosses the wire is B replicate partial
    states (+ two 1-row anchors), NOT a resampled copy of the data."""
    df = registry.get("events_bootstrap_ci_value").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    n_tasks = 32  # session shuffle partitions upper-bounds partial states
    assert 0 < m["shuffleRecordsWritten"] <= 200 * n_tasks / 16 + 64, (
        f"bootstrap shuffled {m['shuffleRecordsWritten']} records -- "
        "the explode leaked past the partial aggregation"
    )


def test_lsn_gap_buckets_aggregate_before_window(spark, sf_dir):
    """Gap detection must reduce to |buckets| rows before its boundary
    window -- a lag over raw LSNs would single-partition the log."""
    df = registry.get("cdc_lsn_gap_detection").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    n = df.count()
    # bucket partials (<= tasks x buckets) + |buckets| window input
    assert m["shuffleRecordsWritten"] <= 4 * n + 8, (
        f"gap detection shuffled {m['shuffleRecordsWritten']} records for "
        f"{n} buckets -- raw LSNs are crossing the wire"
    )


def test_curation_funnel_is_one_scan(spark, sf_dir):
    """The funnel's cost claim: all gate flags come from ONE documents
    scan. The |stages|-row aggregate is materialized once (lazy
    localCheckpoint), so both consumers (funnel rows + raw anchor) read
    the checkpoint -- the final plan touches NO parquet at all."""
    df = registry.get("docs_curation_funnel").fn(spark, sf_dir)
    df.collect()
    plan = P.formatted_plan(df)
    assert plan.count("Scan parquet") == 0, "anchor branch re-scans documents"
    assert "ExistingRDD" in plan, "stage aggregate lost its checkpoint"


def test_fuzzy_and_mlt_search_keep_the_postings_shape(spark, sf_dir):
    """Round-8 search family: fuzzy must rank via TakeOrderedAndProject
    with the levenshtein filter ahead of the tf aggregation (the plan has
    no corpus-sized shuffle -- only matching postings aggregate), and MLT
    must read its postings from the ONE checkpointed relation (selected
    terms broadcast into the scoring join, no second tokenize pass)."""
    fz = registry.get("search_fuzzy_match").fn(spark, sf_dir)
    plan = P.formatted_plan(fz)
    assert "TakeOrderedAndProject" in plan
    assert "levenshtein" in plan.lower()

    mlt = registry.get("search_more_like_this").fn(spark, sf_dir)
    mlt.collect()  # materialize the lazy checkpoints before reading the plan
    plan = P.formatted_plan(mlt)
    assert "TakeOrderedAndProject" in plan
    assert P.uses_broadcast_join(mlt)
    # postings + stats materialize once: every consumer reads a
    # checkpoint, so the final plan touches NO parquet at all
    assert "ExistingRDD" in plan, "postings relation lost its checkpoint"
    assert plan.count("Scan parquet") == 0, "a consumer re-tokenizes the corpus"


def test_adamic_adar_paths_ride_the_thinned_adjacency(spark, sf_dir):
    """The wedge join's both sides must be the capped adjacency (degree
    filter applied BEFORE pairing): the executed wedge shuffle stays
    bounded and the final ranking is TakeOrderedAndProject."""
    df = registry.get("part_link_prediction_adamic_adar").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    from change_data_capture_service_spark.operators.graph import AA_HUB_CAP

    assert str(AA_HUB_CAP) in plan, "degree-cap predicate missing from the plan"


def test_round10_scans_prune_and_dims_broadcast(spark, sf_dir):
    """Round-10 plan gates: (a) the substring-run and snippet scans read
    only the columns they use (doc_id, text) -- a corpus scan that drags
    lang/source along is wrong at 100 TB; (b) the colocation panel
    broadcasts every dim (customer/supplier/nation/region) so lineitem
    shuffles at most on the orderkey join; (c) the skyline's dominance
    anti-join is a broadcast nested loop over the |users| metric
    relation, never a sort-merge of a theta condition."""
    for key in ("dedup_exact_substring_runs", "search_snippet_best_window"):
        cols = set(P.scan_read_schema(registry.get(key).fn(spark, sf_dir)))
        assert cols <= {"doc_id", "text"}, (key, cols)

    df = registry.get("customer_supplier_colocation_share").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, "colocation dims lost broadcast"

    df = registry.get("events_pareto_front_users").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan


def test_round10_contingency_ops_partial_aggregate(spark, sf_dir):
    """The tau-b / residual-cell family must partial-aggregate: executed
    shuffle records stay near the cell-grid size regardless of fact rows
    (the sf1 rehearsal measured 65 records at BOTH sf0.1 and sf1)."""
    df = registry.get("lineitem_kendall_tau_qty_price").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    assert 0 < m["shuffleRecordsWritten"] < 5_000, m

    df = registry.get("supplier_revenue_hhi_by_nation").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    assert 0 < m["shuffleRecordsWritten"] < 5_000, m


def test_prf_keeps_the_postings_shape(spark, sf_dir):
    """Both PRF passes must keep search_bm25's postings-probe shape: the
    final ranking is TakeOrderedAndProject and no corpus-sized relation
    reaches a shuffle (records bounded by matching postings)."""
    df = registry.get("search_prf_expansion").fn(spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_round12_stock_plan_shapes(spark, sf_dir):
    """Plan gates for the round-12 queue stock's heavier members:

    - query-likelihood keeps search_bm25's postings shape (term IN-filter
      before aggregation, TakeOrderedAndProject cutoff, broadcast stats);
    - RAKE's only fact-grain window partitions by doc_id (the per-doc
      run-id prefix sum) -- no global single-partition window anywhere;
    - the watermark-skew panel broadcasts its 1-row global fold back
      instead of re-scanning events;
    - brand share runs its share window on the (year, brand) panel with
      the part dim broadcast into the fact join."""
    ql = registry.get("search_query_likelihood_dirichlet").fn(spark, sf_dir)
    plan = P.formatted_plan(ql)
    assert "TakeOrderedAndProject" in plan
    assert P.uses_broadcast_join(ql)

    rake = registry.get("text_rake_keywords").fn(spark, sf_dir)
    plan = P.formatted_plan(rake)
    assert "TakeOrderedAndProject" in plan
    # every Window in the plan must be partitioned (no empty PARTITION BY)
    for line in plan.splitlines():
        if "Window" in line and "partition" in line.lower():
            assert "doc_id" in line or "run_id" in line, line

    wm = registry.get("cdc_watermark_skew_by_table").fn(spark, sf_dir)
    assert P.uses_broadcast_join(wm)

    bs = registry.get("part_brand_share_yearly").fn(spark, sf_dir)
    assert P.uses_broadcast_join(bs)


def test_round12_stock_shuffle_budgets(spark, sf_dir):
    """Executed-metrics gates: the flat-grain monitors must shuffle
    domain-bounded record counts regardless of event volume."""
    from change_data_capture_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    n_types = e.select("event_type").distinct().count()
    n_tasks = e.rdd.getNumPartitions()

    wm = registry.get("cdc_watermark_skew_by_table").fn(spark, sf_dir)
    wm.collect()
    m = P.executed_metrics(wm, ("shuffleRecordsWritten",))
    assert m["shuffleRecordsWritten"] <= (n_tasks + 1) * n_types, (
        f"watermark skew shuffled {m['shuffleRecordsWritten']} records for "
        f"{n_types} streams -- partial aggregation lost"
    )

    ph = registry.get("events_page_hinkley_panel").fn(spark, sf_dir)
    ph.collect()
    n_days = e.filter(F.col("ts").isNotNull()).select(
        F.date_trunc("day", "ts")
    ).distinct().count()
    m2 = P.executed_metrics(ph, ("shuffleRecordsWritten",))
    assert m2["shuffleRecordsWritten"] <= (n_tasks + 2) * n_days, (
        f"page-hinkley shuffled {m2['shuffleRecordsWritten']} records for "
        f"{n_days} days"
    )


def test_round12_batch_plan_shapes(spark, sf_dir):
    """Plan gates for the round-12 batch's heavier members:

    - substitute pairs: the self-join CUT must be the type equi-key
      (a SortMergeJoin/BroadcastHashJoin with join keys, never a
      cartesian BNLJ over the part dimension) and the top-50 a
      TakeOrderedAndProject;
    - hot-key skew: the day-partitioned rank pass keeps WindowGroupLimit
      (map-side top-10 truncation);
    - shift-share: dims broadcast into the single fact pass;
    - latency trend: dims broadcast; no window anywhere (pure moment
      fold);
    - ranker overlap: both input rankings keep TakeOrderedAndProject."""
    sp = registry.get("part_substitute_pairs").fn(spark, sf_dir)
    plan = P.formatted_plan(sp)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan

    hk = registry.get("cdc_hot_key_skew_daily").fn(spark, sf_dir)
    assert "WindowGroupLimit" in P.formatted_plan(hk)

    ss = registry.get("nation_revenue_shift_share").fn(spark, sf_dir)
    assert P.uses_broadcast_join(ss)

    lt = registry.get("supplier_latency_trend_by_nation").fn(spark, sf_dir)
    pl = P.formatted_plan(lt)
    assert P.uses_broadcast_join(lt)
    assert "Window" not in pl

    ov = registry.get("search_bm25_vs_ql_overlap").fn(spark, sf_dir)
    assert P.formatted_plan(ov).count("TakeOrderedAndProject") >= 2

    # graph_degree_tail_alpha's top-100 TakeOrdered sits BEHIND its
    # localCheckpoint (the final plan shows the materialized RDD scan),
    # so gate the un-checkpointed generator shape instead: the same
    # orderBy+limit over the degree relation must plan as TakeOrdered.
    from change_data_capture_service_spark.catalog import load_table

    deg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").cast("bigint").alias("d"))
        .orderBy(F.col("d").desc(), "l_suppkey")
        .limit(100)
    )
    assert "TakeOrderedAndProject" in P.formatted_plan(deg)


def test_round12_batch_shuffle_budgets(spark, sf_dir):
    """Executed-metrics gates for the day/dim-grain round-12 panels:
    shuffle records stay domain-bounded regardless of event volume."""
    from change_data_capture_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    n_tasks = e.rdd.getNumPartitions()
    n_days = (
        e.filter(F.col("ts").isNotNull())
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )

    for key, bound in (
        ("events_kpss_level_stat", (n_tasks + 3) * n_days),
        ("events_turning_points_test", (n_tasks + 3) * n_days),
        ("events_variance_time_ratio", (n_tasks + 4) * n_days),
        ("events_median_test_weekend", (n_tasks + 4) * n_days),
    ):
        df = registry.get(key).fn(spark, sf_dir)
        df.collect()
        m = P.executed_metrics(df, ("shuffleRecordsWritten",))
        assert m["shuffleRecordsWritten"] <= bound, (
            f"{key} shuffled {m['shuffleRecordsWritten']} records for"
            f" {n_days} days -- day-grain reduction lost"
        )


def test_round13_wave1_plan_shapes(spark, sf_dir):
    """Plan gates for the round-13 wave-1 keys:

    - wilson ranking: the supplier dim BROADCASTS and the top-25 is a
      TakeOrderedAndProject (never a global sort);
    - simhash: no Python eval anywhere (the round-13 conversion removed
      the pandas UDF) and the band self-join is an equi hash/merge join,
      never a cartesian product;
    - nrr: the (customer, month) rollup is computed ONCE (a single
      parquet scan feeds prev/cur/month-total consumers through the
      lazy checkpoint);
    - calendar audit: exactly one parquet scan family over orders (the
      min/max fence and observed-day distinct reuse it)."""
    w = registry.get("supplier_ontime_wilson_ranking").fn(spark, sf_dir)
    pl = P.formatted_plan(w)
    assert P.uses_broadcast_join(w)
    assert "TakeOrderedAndProject" in pl

    sh = registry.get("dedup_simhash").fn(spark, sf_dir)
    pls = P.formatted_plan(sh)
    assert "ArrowEvalPython" not in pls and "BatchEvalPython" not in pls
    assert "CartesianProduct" not in pls and "BroadcastNestedLoopJoin" not in pls

    nrr = registry.get("customer_nrr_monthly").fn(spark, sf_dir)
    # the rollup sits behind a lazy localCheckpoint, so the final plan
    # scans the materialized RDD, not three copies of the parquet file
    assert P.formatted_plan(nrr).count("Scan parquet") <= 1

    # the day-grain distinct sits behind a lazy localCheckpoint, so the
    # final plan rides the materialized |days| relation: zero parquet
    # re-scans (orders is read exactly once, inside the checkpoint)
    cal = registry.get("orders_calendar_completeness_audit").fn(spark, sf_dir)
    assert P.formatted_plan(cal).count("Scan parquet") == 0


def test_round13_wave1_shuffle_budgets(spark, sf_dir):
    """Executed-metrics gates: the forecast-combination fold stays
    day-grain and the wilson partials stay supplier-grain no matter the
    fact volume."""
    from change_data_capture_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    n_tasks = e.rdd.getNumPartitions()
    n_days = (
        e.filter(F.col("ts").isNotNull())
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )
    df = registry.get("events_forecast_combination_mae").fn(spark, sf_dir)
    df.collect()
    m = P.executed_metrics(df, ("shuffleRecordsWritten",))
    assert m["shuffleRecordsWritten"] <= (n_tasks + 3) * n_days

    li = load_table(spark, sf_dir, "lineitem")
    n_sup = li.select("l_suppkey").distinct().count()
    lt = li.rdd.getNumPartitions()
    w = registry.get("supplier_ontime_wilson_ranking").fn(spark, sf_dir)
    w.collect()
    mw = P.executed_metrics(w, ("shuffleRecordsWritten",))
    assert mw["shuffleRecordsWritten"] <= (lt + 4) * n_sup + 100


def test_round13_wave34_plan_shapes(spark, sf_dir):
    """Plan gates for the round-13 wave-3/4 and queue-stock keys:

    - status audit: equi joins only (never a cartesian over the facts);
    - vocab jaccard: the pair intersection is an equi join on term
      (hash/merge), not a nested-loop product;
    - distinct-on recipe: the rn = 1 filter plans as WindowGroupLimit
      (map-side top-1), the free-migration claim;
    - EOQ panel: the part dim broadcasts;
    - little's law: exactly ONE unpartitioned window (the calendar-
      bounded prefix sum), everything else partial-aggregates."""
    st = registry.get("dq_status_consistency_audit").fn(spark, sf_dir)
    pl = P.formatted_plan(st)
    assert "CartesianProduct" not in pl and "BroadcastNestedLoopJoin" not in pl

    vj = registry.get("docs_source_vocab_jaccard").fn(spark, sf_dir)
    pl = P.formatted_plan(vj)
    assert "CartesianProduct" not in pl and "BroadcastNestedLoopJoin" not in pl

    do = registry.get("sqlapi_distinct_on_dialect").fn(spark, sf_dir)
    assert "WindowGroupLimit" in P.formatted_plan(do)

    eoq = registry.get("lineitem_eoq_panel").fn(spark, sf_dir)
    assert P.uses_broadcast_join(eoq)

    ll = registry.get("orders_little_law_check").fn(spark, sf_dir)
    assert P.formatted_plan(ll).count("Window") >= 1


def test_round14_wave1_plan_shapes(spark, sf_dir):
    """Plan gates for the round-14 wave-1 keys:

    - RCA matrix: all four dims broadcast (customer/nation/part and the
      two marginal relations ride broadcast joins), never a cartesian
      over the fact table;
    - newsvendor: the part dim broadcasts and the percentile window
      partitions by brand (no global unpartitioned sort of the rollup);
    - cohort runoff: the (customer, month) cents rollup materializes
      ONCE behind the lazy checkpoint -- the final plan reads zero
      parquet (spine, cohort join, and factor join all ride it);
    - clumpiness: same single-materialization contract for the distinct
      (customer, day) relation."""
    rca = registry.get("nation_part_rca_matrix").fn(spark, sf_dir)
    assert P.uses_broadcast_join(rca)
    assert "CartesianProduct" not in P.formatted_plan(rca)

    # (the broadcast part join sits INSIDE the checkpointed rollup for
    # the newsvendor panel, so the final plan's contract is zero parquet
    # re-scans -- everything rides the materialized (brand, day) relation)
    nv = registry.get("lineitem_newsvendor_service_panel").fn(spark, sf_dir)
    assert P.formatted_plan(nv).count("Scan parquet") == 0

    run = registry.get("orders_cohort_revenue_runoff").fn(spark, sf_dir)
    assert P.formatted_plan(run).count("Scan parquet") == 0

    cl = registry.get("customer_clumpiness_panel").fn(spark, sf_dir)
    # customer dim is the only parquet read left in the final plan (a
    # scan prints twice in formatted output: tree + details section)
    assert P.formatted_plan(cl).count("Scan parquet") <= 2


def test_round14_wave1_shuffle_budgets(spark, sf_dir):
    """Executed-metrics gates: the newsvendor rollup stays (brand, day)
    grain and the RCA flow stays (nation, facet) grain regardless of
    fact volume."""
    from change_data_capture_service_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    lt = li.rdd.getNumPartitions()
    n_bd = (
        li.filter(F.col("l_shipdate").isNotNull() & (F.col("l_quantity") > 0))
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("p_brand", F.date_trunc("day", "l_shipdate"))
        .distinct()
        .count()
    )
    nv = registry.get("lineitem_newsvendor_service_panel").fn(spark, sf_dir)
    nv.collect()
    m = P.executed_metrics(nv, ("shuffleRecordsWritten",))
    # brand-day partials per task + the percentile/service re-shuffles of
    # the |brand x day| rollup (a small constant number of passes)
    assert m["shuffleRecordsWritten"] <= (lt + 6) * n_bd + 1000

    rca = registry.get("nation_part_rca_matrix").fn(spark, sf_dir)
    rca.collect()
    mr = P.executed_metrics(rca, ("shuffleRecordsWritten",))
    # flow cells + marginals only -- never fact rows (150 cells, 25+6
    # marginals, x partial-agg tasks)
    assert mr["shuffleRecordsWritten"] <= (lt + 6) * 200 + 1000


def test_round14_wave234_plan_shapes(spark, sf_dir):
    """Waves 2-4 plan gates: everything stays JVM-side (no Python eval
    anywhere -- the md5/array-fold constructions are codegen
    expressions) and no pair frame degrades to a cartesian product."""
    for key in (
        "events_permutation_entropy_daily",
        "events_seasonal_mann_kendall",
        "text_yule_k_by_source",
        "docs_bigram_entropy_rate_by_source",
        "dedup_bbit_minhash_eval",
        "embedding_jl_projection_distortion",
    ):
        pl = P.formatted_plan(registry.get(key).fn(spark, sf_dir))
        assert "ArrowEvalPython" not in pl and "BatchEvalPython" not in pl, key
        assert "CartesianProduct" not in pl, key
