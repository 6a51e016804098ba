"""Behavioral-analytics / split operators (round 3): semantic invariants
beyond DuckDB hash parity -- session gap laws, transition-count
conservation, Jaccard bounds, LOCF carry rules, and split determinism."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table

registry.load_all()

_GAP_US = 1_800_000_000  # 30 min in microseconds


def test_sessions_partition_events_and_respect_gap(spark, sf_dir):
    """Sessions tile the event stream exactly: event counts conserve, every
    in-session gap is <= 30 min, and consecutive sessions of one user are
    separated by > 30 min."""
    sessions = registry.get("sessionize_batch").fn(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events")
    assert int(sessions["n_events"].sum()) == events.count()
    assert (sessions["session_start"] <= sessions["session_end"]).all()
    for _, grp in sessions.groupby("user_id"):
        grp = grp.sort_values("session_start")
        starts = list(grp["session_start"])
        ends = list(grp["session_end"])
        # non-overlapping, and the inter-session gap exceeds the threshold
        for prev_end, nxt_start in zip(ends, starts[1:]):
            gap_us = (nxt_start - prev_end) / pd.Timedelta(microseconds=1)
            assert gap_us > _GAP_US
    # in-session max gap law, checked from raw events
    ev = events.select("user_id", "ts").toPandas().sort_values(["user_id", "ts"])
    for user_id, grp in ev.groupby("user_id"):
        n_sessions_expected = 1 + sum(
            (b - a) / pd.Timedelta(microseconds=1) > _GAP_US
            for a, b in zip(grp["ts"], grp["ts"][1:])
        )
        got = (sessions["user_id"] == user_id).sum()
        assert got == n_sessions_expected, f"user {user_id}"


def test_transitions_conserve_counts(spark, sf_dir):
    """Every event except each user's first contributes exactly one
    transition, so sum(n) == |events| - |users with events|."""
    trans = registry.get("event_transitions").fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    total = e.count()
    users = e.select("user_id").distinct().count()
    assert trans.agg(F.sum("n")).first()[0] == total - users


def test_audience_overlap_bounds(spark, sf_dir):
    """Jaccard in (0, 1], intersection bounded by either set size, pairs
    canonical (type_a < type_b) and unique."""
    ov = registry.get("audience_overlap").fn(spark, sf_dir).toPandas()
    e = load_table(spark, sf_dir, "events")
    sizes = {
        r["event_type"]: r["n"]
        for r in e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert (ov["type_a"] < ov["type_b"]).all()
    assert not ov.duplicated(["type_a", "type_b"]).any()
    for _, r in ov.iterrows():
        assert 0 < r["jaccard"] <= 1
        assert r["n_common"] <= min(sizes[r["type_a"]], sizes[r["type_b"]])


def test_locf_carries_last_observed(spark, sf_dir):
    """Observed hours keep their own total; unobserved hours inherit the
    previous row's carried value; spine length matches gapfill_hourly."""
    locf = registry.get("locf_fill").fn(spark, sf_dir).toPandas().sort_values("hour")
    gap = registry.get("gapfill_hourly").fn(spark, sf_dir).toPandas()
    assert len(locf) == len(gap)
    prev = None
    for _, r in locf.iterrows():
        if not r["observed"]:
            assert r["locf_value"] == prev or (
                prev is None and pd.isna(r["locf_value"])
            )
        prev = r["locf_value"]
    observed = locf[locf["observed"]].set_index("hour")["locf_value"]
    totals = gap[gap["n_events"] > 0].set_index("hour")["sum_value"]
    pd.testing.assert_series_equal(
        observed.sort_index(), totals.sort_index(), check_names=False
    )


def test_dataset_split_is_total_and_deterministic(spark, sf_dir):
    """The three splits cover every document exactly once, the train share
    lands near 80%, and re-running yields the identical composition (hash
    assignment, no RNG)."""
    split = registry.get("dataset_split").fn(spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert set(split["split"]) <= {"train", "val", "test"}
    assert int(split["n_docs"].sum()) == n_docs
    train_frac = split[split["split"] == "train"]["n_docs"].sum() / n_docs
    assert 0.7 < train_frac < 0.9
    again = registry.get("dataset_split").fn(spark, sf_dir).toPandas()
    key = ["split", "lang"]
    pd.testing.assert_frame_equal(
        split.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )


def test_dq_fixture_is_healthy(spark, sf_dir):
    """The driver fixtures satisfy every declared constraint -- a nonzero
    violation count here means either the fixture changed or a check's
    predicate drifted."""
    dq = registry.get("dq_constraint_checks").fn(spark, sf_dir).toPandas()
    assert len(dq) == 6
    assert (dq["violations"] == 0).all(), dq.to_dict("records")


def test_snapshot_diff_statuses_are_consistent(spark, sf_dir):
    """Append-only log: no key can be 'removed'; 'added' keys must have
    NULL old state; 'changed' keys need both states and a moved lsn."""
    diff = registry.get("cdc_snapshot_diff").fn(spark, sf_dir).toPandas()
    assert (diff["status"] != "removed").all()
    added = diff[diff["status"] == "added"]
    assert added["old_value"].isna().all() and added["old_lsn"].isna().all()
    changed = diff[diff["status"] == "changed"]
    assert (changed["new_lsn"] > changed["old_lsn"]).all()


def test_canonical_election_rules(spark, sf_dir):
    """Every cluster keeps exactly one doc; the keeper has the cluster's
    max n_chars (lowest doc_id on ties); n_docs matches the component
    membership from dedup_cluster."""
    canon = registry.get("dedup_canonical").fn(spark, sf_dir).toPandas()
    cc = registry.get("dedup_cluster").fn(spark, sf_dir).toPandas()
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    sizes = cc.groupby("cluster_id").size()
    assert len(canon) == len(sizes)
    for _, r in canon.iterrows():
        members = cc[cc["cluster_id"] == r["cluster_id"]]["doc_id"]
        assert r["n_docs"] == len(members) == r["n_dropped"] + 1
        best = max(chars[d] for d in members)
        assert chars[r["keep_doc_id"]] == best
        assert r["keep_doc_id"] == min(d for d in members if chars[d] == best)


def test_streaks_are_bounded_by_active_days(spark, sf_dir):
    """best_streak <= n_active_days, and n_active_days equals the user's
    distinct active day count from raw events."""
    st = registry.get("activity_streaks").fn(spark, sf_dir).toPandas()
    e = load_table(spark, sf_dir, "events")
    days = {
        r["user_id"]: r["n"]
        for r in e.select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert (st["best_streak"] <= st["n_active_days"]).all()
    for _, r in st.iterrows():
        assert r["n_active_days"] == days[r["user_id"]]


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HLL estimates must land within a generous multiple of the requested
    relative standard deviation of the exact NDV -- the semantic check
    behind the rows-only driver row."""
    approx = registry.get("agg_approx_count_distinct").fn(spark, sf_dir).toPandas()
    exact = registry.get("agg_count_distinct").fn(spark, sf_dir).toPandas()
    a = approx.set_index(approx.columns[0]).iloc[:, 0]
    e = exact.set_index(exact.columns[0]).iloc[:, 0]
    for k in e.index:
        rel_err = abs(int(a[k]) - int(e[k])) / max(int(e[k]), 1)
        assert rel_err < 0.15, f"{k}: approx {a[k]} vs exact {e[k]}"


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """t-digest medians must sit between the exact 40th and 60th
    percentiles of the same distribution."""
    approx = registry.get("agg_approx_percentile").fn(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem")
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.4)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.6)").alias("hi"),
        )
        .collect()
    }
    for _, r in approx.iterrows():
        lo, hi = bounds[r["l_returnflag"]]
        assert lo <= r["p50_price"] <= hi, (r["l_returnflag"], r["p50_price"], lo, hi)
