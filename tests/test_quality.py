"""Quality/hygiene operators (round 3): semantic invariants beyond the
DuckDB hash parity the driver checks -- chunk reconstruction, post-scrub
cleanliness, salted-join equivalence under a forced shuffle join, and
rollup consistency."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.operators.quality import _EMAIL_RE, _PHONE_RE

registry.load_all()


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Stride-150/window-200 chunking is lossless: the first 150 chars of
    every chunk except the last, plus the last chunk whole, concatenate
    back to the original text."""
    chunks = registry.get("chunk_documents").fn(spark, sf_dir).toPandas()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for doc_id, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        parts = list(grp["chunk_text"])
        rebuilt = "".join(p[:150] for p in parts[:-1]) + parts[-1]
        assert rebuilt == docs[doc_id], f"doc {doc_id} chunking lost bytes"


def test_chunk_overlap_is_exact(spark, sf_dir):
    """Consecutive chunks overlap by exactly window - stride = 50 chars
    (except where the doc ends)."""
    chunks = registry.get("chunk_documents").fn(spark, sf_dir).toPandas()
    for _, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        texts = list(grp["chunk_text"])
        for a, b in zip(texts, texts[1:]):
            if len(a) == 200:  # a full window overlaps the next chunk's head
                assert a[150:] == b[: len(a[150:])]


def test_pii_redacted_output_is_clean(spark, sf_dir):
    """After the scrub, neither pattern matches anywhere, every doc counted
    at least one planted email+phone, and placeholders appear."""
    df = registry.get("pii_redact").fn(spark, sf_dir)
    leftover = df.filter(
        (F.regexp_count("redacted", F.lit(_EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(_PHONE_RE)) > 0)
    ).count()
    assert leftover == 0
    bad = df.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count()
    assert bad == 0
    unredacted = df.filter(~F.col("redacted").contains("[EMAIL]")).count()
    assert unredacted == 0


def test_salted_join_equals_plain_join_without_broadcast(spark, sf_dir):
    """The salt path's whole point is the non-broadcast regime: force a
    shuffle join (threshold -1) and the salted result must still equal the
    plain join exactly."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        salted = registry.get("join_skew_salted").fn(spark, sf_dir)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_linenumber", "o_custkey", "o_totalprice"
        )
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_gopher_rules_ratios_are_bounded(spark, sf_dir):
    rows = registry.get("quality_gopher_rules").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["unique_frac"] <= 1
        assert 0 < r["top_token_frac"] <= 1
        assert r["mean_word_len"] > 0
        assert r["keep"] in (0, 1)


def test_ohlc_bounds_are_consistent(spark, sf_dir):
    """low <= open, close <= high; n >= 1; single-event hours have all four
    equal."""
    rows = registry.get("ohlc_hourly").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low_value"] <= r["open_value"] <= r["high_value"]
        assert r["low_value"] <= r["close_value"] <= r["high_value"]
        assert r["n"] >= 1
        if r["n"] == 1:
            assert r["open_value"] == r["close_value"] == r["high_value"]


def test_active_users_7d_dominates_daily_actives(spark, sf_dir):
    """A trailing-7-day distinct count can never be below that day's own
    distinct count, and never above the global user count."""
    e = load_table(spark, sf_dir, "events")
    daily = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    total_users = e.select("user_id").distinct().count()
    rolling = registry.get("active_users_7d").fn(spark, sf_dir).collect()
    assert rolling
    for r in rolling:
        assert r["n_active"] <= total_users
        if r["anchor_day"] in daily:
            assert r["n_active"] >= daily[r["anchor_day"]]


def test_ohlc_rerollup_is_algebraic(spark, sf_dir):
    """Continuous-aggregate property: daily OHLC derived FROM the hourly
    rollup must equal daily OHLC computed from raw events. min_by/max_by
    over (hour-struct) partials re-aggregate losslessly, which is what
    makes the hourly table a valid materialization to serve coarser
    windows from (the TimescaleDB continuous-aggregate story)."""
    hourly = registry.get("ohlc_hourly").fn(spark, sf_dir)
    day = F.date_trunc("day", F.col("hour"))
    from_hourly = (
        hourly.groupBy(day.alias("day"))
        .agg(
            F.sum("n").alias("n"),
            F.min_by("open_value", F.col("hour")).alias("open_value"),
            F.max("high_value").alias("high_value"),
            F.min("low_value").alias("low_value"),
            F.max_by("close_value", F.col("hour")).alias("close_value"),
        )
    ).toPandas().sort_values("day").reset_index(drop=True)

    e = load_table(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    from_raw = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.min_by("value", order).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order).alias("close_value"),
        )
    ).toPandas().sort_values("day").reset_index(drop=True)

    pd.testing.assert_frame_equal(from_hourly, from_raw)


def test_compression_ratio_orders_repetitive_below_noise(spark, tmp_path):
    """The signal contract: highly repetitive text must compress much
    further (lower ratio) than high-entropy text, through the registered
    operator end-to-end on a constructed corpus."""
    import shutil

    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(33, 123)) for _ in range(1500))
    rows = [
        (1, "spam spam spam " * 100, "en", "rep", 1500),
        (2, noise, "en", "noise", 1500),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "cr_fixture"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = (
        registry.get("quality_compression_ratio")
        .fn(spark, str(d))
        .toPandas()
        .set_index("source")
    )
    assert out.loc["rep", "avg_ratio"] < 0.1
    assert out.loc["noise", "avg_ratio"] > 0.5
    shutil.rmtree(d, ignore_errors=True)


def test_compression_ratio_excludes_empty_docs_from_stats(spark, tmp_path):
    """Empty documents have no meaningful ratio (zlib's empty-stream
    overhead would read as ~8x 'expansion'): their ratio must be NULL and
    excluded from avg/min/max, counted in n_docs but not n_nonempty."""
    rows = [
        (1, "spam spam spam " * 100, "en", "s", 1500),
        (2, "", "en", "s", 0),
        (3, None, "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "cr_empty"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = (
        registry.get("quality_compression_ratio").fn(spark, str(d)).toPandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["n_docs"]) == 3 and int(r["n_nonempty"]) == 1
    # stats reflect only the non-empty doc: no 8.0-ish inflation anywhere
    assert r["avg_ratio"] == r["min_ratio"] == r["max_ratio"] < 0.2
