"""Semantic invariants for the round-5 operator batch (line dedup, OLS
trend, multi-grain rollup, dead-letter split, phrase search, k-anonymity)
-- properties the DuckDB hash parity can't express, plus plan-shape gates
for the scale-relevant ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.plans import inspect as P

registry.load_all()


def _df(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


# -- dedup_lines ------------------------------------------------------------


def test_dedup_lines_fractions_and_counts(spark, sf_dir):
    rows = _df(spark, sf_dir, "dedup_lines").collect()
    assert rows, "every document segments into >= 1 line"
    for r in rows:
        assert 1 <= r.n_lines
        assert 0 <= r.n_dup_lines <= r.n_lines
        assert abs(r.dup_frac - round(r.n_dup_lines / r.n_lines, 6)) < 1e-9


def test_dedup_lines_detects_planted_duplicate(spark, sf_dir, tmp_path):
    """Two docs sharing an identical 12-token line must both report >= 1
    duplicated line; a doc of unique gibberish reports 0."""
    shared = " ".join(f"tok{i}" for i in range(12))
    unique = " ".join(f"only{i}" for i in range(24))
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [shared + " tail one", shared + " tail two", unique],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(shared) + 9, len(shared) + 9, len(unique)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r.doc_id: r.n_dup_lines
        for r in _df(spark, str(tmp_path), "dedup_lines").collect()
    }
    assert got[1] >= 1 and got[2] >= 1
    assert got[3] == 0


# -- trend_linear_fit ---------------------------------------------------------


def test_trend_fit_reproduces_exact_line(spark, sf_dir, tmp_path):
    """Feed a synthetic exactly-linear daily series; OLS must recover the
    plant: slope 2.5/day, intercept anchored at the 2000-01-01 origin."""
    import datetime

    import pandas as pd

    base = datetime.datetime(2026, 1, 1)
    days = [base + datetime.timedelta(days=i) for i in range(10)]
    x0 = (base.date() - datetime.date(2000, 1, 1)).days
    pdf = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": days,
            "user_id": [1] * 10,
            "event_type": ["view"] * 10,
            # one event per day => daily sum y = 100 + 2.5*i exactly
            "value": [100.0 + 2.5 * i for i in range(10)],
            "props": ["{}"] * 10,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    r = _df(spark, str(tmp_path), "trend_linear_fit").collect()[0]
    assert abs(r.slope - 2.5) < 1e-6
    assert abs(r.intercept - (100.0 - 2.5 * x0)) < 1e-3


# -- rollup_time_grains -------------------------------------------------------


def test_rollup_grains_are_mergeable(spark, sf_dir):
    """Grand totals agree across every grain: re-rollup loses nothing."""
    df = _df(spark, sf_dir, "rollup_time_grains")
    tot = (
        df.groupBy("grain")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_value"), 4).alias("sv"))
        .collect()
    )
    by = {r.grain: (r.n, r.sv) for r in tot}
    assert by["hour"] == by["day"] == by["week"]


def test_rollup_single_fact_scan(spark, sf_dir):
    """ONE scan of events: day/week derive from the hourly rollup, so the
    plan reads the fact table once (the continuous-aggregate ladder), not
    three times like the oracle's recompute-from-raw."""
    plan = P.formatted_plan(_df(spark, sf_dir, "rollup_time_grains"))
    assert plan.count("events.parquet") <= 1


# -- dead_letter_split --------------------------------------------------------


def test_dead_letter_counts_match_plant(spark, sf_dir):
    rows = _df(spark, sf_dir, "dead_letter_split").collect()
    total_dead = sum(r.n_dead for r in rows)
    total = sum(r.n_ok + r.n_dead for r in rows)
    from change_data_capture_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    expect_dead = e.filter(F.col("event_id") % 13 == 0).count()
    assert total == e.count()
    assert total_dead == expect_dead


def test_dead_letter_is_map_side_only(spark, sf_dir):
    assert P.count_shuffles(_df(spark, sf_dir, "dead_letter_split")) == 1


def test_dead_letter_validity_semantics_agree_with_oracle(spark, sf_dir, duck):
    """Fixture contract: Spark ``try_parse_json`` and DuckDB ``json_valid``
    agree on EVERY wire payload the fixture produces (planted and raw).
    The engines genuinely differ on exotic inputs -- Spark's variant parse
    rejects duplicate object keys that DuckDB accepts; DuckDB rejects
    trailing garbage that Spark's parse tolerates -- but serializer-emitted
    props (``{"k": N}``) and their 3-char truncations hit neither case.
    This test pins that assumption so a fixture change that breaks it
    fails HERE, not in the driver's hash gate."""
    from change_data_capture_service_spark.catalog import load_table

    got = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.expr(
                "try_parse_json(CASE WHEN event_id % 13 = 0"
                " THEN substr(props, 1, 3) ELSE props END) IS NOT NULL"
            ).alias("ok"),
        )
        .collect()
    )
    spark_ok = {r.event_id: r.ok for r in got}
    duck_ok = dict(
        duck.execute(
            """
            SELECT event_id,
                   json_valid(CASE WHEN event_id % 13 = 0
                              THEN substr(props, 1, 3) ELSE props END)
            FROM events
            """
        ).fetchall()
    )
    assert spark_ok == duck_ok


# -- search_phrase ------------------------------------------------------------


def test_search_phrase_zero_shuffle(spark, sf_dir):
    assert P.count_shuffles(_df(spark, sf_dir, "search_phrase")) == 0


def test_search_phrase_counts_overlaps(spark, sf_dir, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["fast query fast query end", "slow join only"],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [25, 14],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {r.doc_id: r.n_hits for r in _df(spark, str(tmp_path), "search_phrase").collect()}
    assert got == {1: 2}


# -- dq_k_anonymity -----------------------------------------------------------


def test_k_anonymity_flags_only_small_groups(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    flagged = {
        (r.c_nationkey, r.c_mktsegment): r.group_size
        for r in _df(spark, sf_dir, "dq_k_anonymity").collect()
    }
    actual = {
        (r.c_nationkey, r.c_mktsegment): r.n
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for k, n in actual.items():
        assert (k in flagged) == (n < 10)
