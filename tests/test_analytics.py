"""Event-analytics operators: funnel ordering, cohort arithmetic, robust
outliers -- semantic invariants beyond driver hash parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.plans import inspect as P

registry.load_all()


def test_funnel_is_monotone_and_ordered(spark, sf_dir):
    rows = {r["stage"]: r["users"] for r in registry.get("funnel_steps").fn(spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "purchase"}
    # each stage requires the previous one strictly earlier -> counts shrink
    assert rows["view"] >= rows["click"] >= rows["purchase"]
    assert rows["view"] > 0


def test_funnel_is_single_keyed_shuffle(spark, sf_dir):
    """The engine's funnel must not re-shuffle the fact table per stage:
    one user_id exchange + the final single-row rollup only."""
    df = registry.get("funnel_steps").fn(spark, sf_dir)
    assert P.count_shuffles(df) <= 2, "funnel grew per-stage shuffles"


def test_retention_week_zero_has_every_user(spark, sf_dir):
    df = registry.get("retention_cohorts").fn(spark, sf_dir)
    rows = df.collect()
    assert all(r["week_n"] >= 0 for r in rows)
    # every user is active in their own cohort week
    week0 = sum(r["active_users"] for r in rows if r["week_n"] == 0)
    from change_data_capture_service_spark.catalog import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users


def test_scd2_intervals_chain_per_key(spark, sf_dir):
    """Exactly one open (current) version per key, and each closed version's
    valid_to equals some later version's valid_from (the intervals tile the
    key's timeline with no gaps)."""
    df = registry.get("cdc_scd2").fn(spark, sf_dir)
    per_key = df.groupBy("user_id").agg(
        F.sum("is_current").alias("n_current"),
        F.count("*").alias("n_versions"),
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0
    closed = df.filter(F.col("valid_to").isNotNull())
    starts = df.select("user_id", F.col("valid_from").alias("valid_to"))
    dangling = closed.join(starts, ["user_id", "valid_to"], "left_anti")
    assert dangling.count() == 0


def test_anomaly_mad_broadcasts_thresholds(spark, sf_dir):
    df = registry.get("anomaly_mad").fn(spark, sf_dir)
    assert P.uses_broadcast_join(df), "per-type MAD thresholds must broadcast"
    assert df.filter(F.col("score") <= 3).count() == 0
