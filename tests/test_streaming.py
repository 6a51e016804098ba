"""True streaming tests (X16): watermarked windows over an unbounded file
source, batch/stream equivalence, late-data drop, stateful latest-state.
Driven with memory sinks + processAllAvailable (synchronous drain)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import windows as W
from change_data_capture_service_spark.streaming.stateful import latest_state_stream


def _drain(df, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = W.stream_events(spark, sf_dir)
    assert stream.isStreaming
    # complete mode: windows still open at end-of-stream are emitted too,
    # so the drained output equals the batch result exactly
    _drain(W.tumbling_count_stream(stream), "tumbling_out", "complete")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in W.stream_tumbling_count(spark, sf_dir).collect()
    }
    assert got == batch  # complete stream == batch semantics


def test_stream_session_equals_batch(spark, sf_dir):
    stream = W.stream_events(spark, sf_dir)
    _drain(W.session_stream(stream), "session_out", "complete")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in W.stream_session(spark, sf_dir).collect()
    }
    assert got == batch


def _write_events(spark, path, rows):
    rows = [(e, pd.Timestamp(ts).to_pydatetime(), u, t, v, p) for e, ts, u, t, v, p in rows]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode + watermark: an event arriving after the watermark passed
    its window is dropped (the reference has no late-data concept at all --
    every event applies; the engine makes lateness explicit)."""
    src = str(tmp_path / "events_stream")
    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:40:00", 1, "click", 1.0, "{}"),
        ],
    )
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).option("maxFilesPerTrigger", "1").parquet(src)
    )
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = agg.writeStream.format("memory").queryName("late_out").outputMode("append").start()
    q.processAllAvailable()
    # watermark is now 00:40 - 10min = 00:30 > first window end 00:30 -> closed+emitted
    _write_events(spark, src, [(3, "2024-01-01 00:05:00", 1, "late", 9.0, "{}")])  # hopelessly late
    _write_events(spark, src, [(4, "2024-01-01 02:00:00", 1, "click", 1.0, "{}")])  # advances wm, closes rest
    q.processAllAvailable()
    q.stop()
    out = {r["ws"].isoformat(): r["n"] for r in spark.sql("SELECT * FROM late_out").collect()}
    assert out.get("2024-01-01T00:00:00") == 1  # late event_id=3 did NOT bump it to 2


def test_stateful_latest_state_stream(spark, tmp_path):
    """applyInPandasWithState: emits a changelog row when a key's max-LSN
    advances, holds state across micro-batches, ignores stale LSNs."""
    src = str(tmp_path / "env_stream")
    schema = "key string, lsn long, op string, payload string"
    spark.createDataFrame(
        [("u:1", 1, "insert", '{"v":"a"}'), ("u:2", 2, "insert", '{"v":"b"}')], schema
    ).coalesce(1).write.mode("append").parquet(src)

    env_stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        latest_state_stream(env_stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    # batch 2: update u:1 forward (lsn 5) and u:2 backward (stale lsn 1)
    spark.createDataFrame(
        [("u:1", 5, "update", '{"v":"a2"}'), ("u:2", 1, "update", '{"v":"stale"}')], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM state_out").toPandas()
    # u:1 appears twice (lsn 1 then 5); u:2 once (stale never emitted)
    u1 = out[out.key == "u:1"].sort_values("lsn")
    assert list(u1.lsn) == [1, 5]
    u2 = out[out.key == "u:2"]
    assert list(u2.lsn) == [2]
    assert u2.iloc[0]["payload"] == '{"v":"b"}'


def test_dedup_stream_drops_in_window_duplicates(spark, tmp_path):
    src = str(tmp_path / "dedup_stream")
    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),  # dup within watermark
            (3, "2024-01-01 00:02:00", 2, "view", 1.0, "{}"),
        ],
    )
    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    q = (
        W.dedup_stream(events)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT user_id, event_type FROM dedup_out").collect()
    assert sorted((r["user_id"], r["event_type"]) for r in out) == [(1, "click"), (2, "view")]


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Click→purchase attribution as a watermarked stream-stream interval
    join must produce exactly the rows of the equivalent batch theta join."""
    ev_stream = W.stream_events(spark, sf_dir)
    clicks = ev_stream.filter(F.col("event_type") == "click")
    purchases = ev_stream.filter(F.col("event_type") == "purchase")
    _drain(W.interval_join_stream(clicks, purchases), "attrib_out")
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attrib_out").collect()
    }

    from change_data_capture_service_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_ohlc_equals_batch(spark, sf_dir):
    """The streaming OHLC (min_by/max_by under a watermark) must produce
    exactly the batch rollup once the stream drains -- proving the
    aggregate is algebraic/incremental, not batch-only."""
    from change_data_capture_service_spark import registry

    stream = W.stream_events(spark, sf_dir)
    _drain(W.ohlc_stream(stream), "ohlc_out", "complete")
    got = {
        r["hour"]: (r["n"], r["open_value"], r["high_value"], r["low_value"], r["close_value"])
        for r in spark.sql("SELECT * FROM ohlc_out").collect()
    }
    batch = {
        r["hour"]: (r["n"], r["open_value"], r["high_value"], r["low_value"], r["close_value"])
        for r in registry.get("ohlc_hourly").fn(spark, sf_dir).collect()
    }
    assert got == batch


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    """The stream-static broadcast join must emit exactly the batch join
    once the stream drains -- stateless enrichment, no watermark, no
    dropped or duplicated rows."""
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table

    stream = W.stream_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    _drain(W.enrich_join_stream(stream, dim), "enrich_out", "append")
    got = {
        (r["event_id"], r["c_name"], r["c_mktsegment"])
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    want = {
        (r["event_id"], r["c_name"], r["c_mktsegment"])
        for r in registry.get("stream_enrich_join").fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_join_equals_batch(spark, sf_dir, tmp_path):
    """Left-outer attribution: matched clicks pair with their purchase;
    unmatched clicks must STILL be emitted (with NULL purchase) once the
    watermark proves no match can arrive. A far-future sentinel pair in a
    second file advances the watermark past every real click's horizon, so
    the drained stream must equal the batch left join over the same data."""
    import shutil
    import time as _t

    from change_data_capture_service_spark.catalog import load_table

    src = str(tmp_path / "loj_events")
    import os
    os.makedirs(src)
    # rewrite the ns-timestamp fixture as plain µs parquet so one schema
    # covers both files in the streaming source directory
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(f"{src}/a_tmp")
    for f in os.listdir(f"{src}/a_tmp"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/a_tmp/{f}", f"{src}/a_events.parquet")
    shutil.rmtree(f"{src}/a_tmp")
    _t.sleep(0.05)
    # sentinel click+purchase far in the future, 1 day apart (no mutual match)
    spark.createDataFrame(
        [
            (10**9, "2030-01-01 00:00:00", -1, "click", 0.0, "{}"),
            (10**9 + 1, "2030-01-02 00:00:00", -1, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{src}/b_sentinel", mode="overwrite")
    for f in os.listdir(f"{src}/b_sentinel"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/b_sentinel/{f}", f"{src}/z_sentinel.parquet")
    shutil.rmtree(f"{src}/b_sentinel")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    _drain(W.left_outer_interval_join_stream(clicks, purchases), "loj_out")
    # the sentinel click exists only to advance the watermark; nothing later
    # can close ITS horizon, so it is excluded from the equivalence check
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM loj_out").collect()
        if r["click_id"] < 10**9
    }

    ev = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
            "leftOuter",
        ).collect()
        if r["click_id"] < 10**9
    }
    assert got == want
    assert any(p is None for _, p in got), "no watermark-driven null emissions seen"


def test_stateful_last_touch_stream(spark, tmp_path):
    """Continuous attribution: the last non-purchase touch persists in
    per-user state ACROSS micro-batches; purchases credit it on arrival;
    first-touch purchases credit 'direct'; emitted rows are final."""
    from change_data_capture_service_spark.streaming.stateful import last_touch_stream

    src = str(tmp_path / "attrib_stream")
    schema = "user_id long, event_id long, event_type string, cents long"
    # batch 1: u1 clicks then buys; u2 buys cold (direct)
    spark.createDataFrame(
        [(1, 1, "click", 0), (1, 2, "purchase", 1000), (2, 1, "purchase", 200)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        last_touch_stream(stream)
        .writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # batch 2: u1 views (new touch) then buys again -- the click credit
    # must NOT leak forward; u2's view updates state but emits nothing
    spark.createDataFrame(
        [(1, 3, "view", 0), (1, 4, "purchase", 500), (2, 2, "view", 0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM attrib_out").toPandas()
    got = {
        (int(r["user_id"]), int(r["event_id"])): (r["source"], int(r["cents"]))
        for _, r in out.iterrows()
    }
    assert got == {
        (1, 2): ("click", 1000),   # same-batch touch
        (2, 1): ("direct", 200),   # no prior touch ever
        (1, 4): ("view", 500),     # state crossed the batch boundary AND advanced
    }


def test_streaming_minhash_dedup_equals_batch(spark, sf_dir, tmp_path):
    """The streaming incremental near-dup sink, fed the documents table in
    doc_id-ordered micro-batches (one file per trigger), must produce
    EXACTLY the all-pairs batch operator's matches: cross-batch pairs come
    from probing the band store, intra-batch pairs from the self-join, so
    the union is invariant to how ingestion is chopped into batches."""
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.dedup_stream import (
        start_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    # 4 files in doc_id ranges -> 4 micro-batches in arrival order
    n_max = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (n_max + 4) // 4
    for i in range(4):
        (
            docs.filter(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q, sink = start_incremental_dedup(
        stream, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    got = {
        (min(r["new_doc_id"], r["seen_doc_id"]), max(r["new_doc_id"], r["seen_doc_id"]))
        for r in sink.matches().collect()
    }
    batch = {
        (min(r["doc_id_a"], r["doc_id_b"]), max(r["doc_id_a"], r["doc_id_b"]))
        for r in registry.get("dedup_minhash_near").fn(spark, sf_dir).collect()
    }
    assert got == batch, (got - batch, batch - got)
    assert len(got) > 0  # fixture plants near-dups; empty would be vacuous


def test_streaming_minhash_dedup_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-running an epoch (at-least-once replay) rewrites its epoch
    partitions byte-identically instead of duplicating matches or store
    rows."""
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.dedup_stream import (
        StreamingMinHashDedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    sink = StreamingMinHashDedup(spark, str(tmp_path / "store"))
    sink(half, 0)
    sink(other, 1)
    once = sorted(
        (r["new_doc_id"], r["seen_doc_id"], r["jaccard"])
        for r in sink.matches().collect()
    )
    sink(other, 1)  # replay epoch 1
    twice = sorted(
        (r["new_doc_id"], r["seen_doc_id"], r["jaccard"])
        for r in sink.matches().collect()
    )
    assert once == twice


def _protobuf_available() -> bool:
    """transformWithState's Python state-server protocol needs the
    google.protobuf runtime, which is absent in this sandbox (no wheel on
    disk, installs disallowed) -- same class of environment gap as the
    spark-sql-kafka jar, handled the same way: xfail(run=False) with the
    reason, plus an always-running plan-build test so the twin cannot
    silently rot."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent entirely
        return False


needs_protobuf = pytest.mark.xfail(
    condition=not _protobuf_available(),
    reason=(
        "transformWithStateInPandas execution needs the google.protobuf "
        "runtime for its state-server protocol; not installable in-sandbox "
        "(no network, no wheel cache). Plan construction is still covered "
        "by test_last_touch_tws_plan_builds. Deploy: RUNBOOK.md s4."
    ),
    run=False,
)


def test_last_touch_tws_plan_builds(spark):
    """The transformWithState twin must at least BUILD its unbounded plan
    in every environment: output schema identical to the GroupState
    baseline's, streaming bit set. (Execution needs protobuf; gated
    below.)"""
    from change_data_capture_service_spark.streaming.stateful import (
        last_touch_stream_tws,
    )

    stream = spark.readStream.format("rate").load().selectExpr(
        "value as user_id",
        "value as event_id",
        "'click' as event_type",
        "value as cents",
    )
    df = last_touch_stream_tws(stream)
    assert df.columns == ["user_id", "event_id", "source", "cents"]
    assert df.isStreaming


@needs_protobuf
def test_last_touch_tws_matches_group_state_twin(spark, tmp_path):
    """transformWithState twin: fed the same two micro-batches as
    test_stateful_last_touch_stream, the StatefulProcessor implementation
    must emit exactly the rows the applyInPandasWithState baseline does
    (state crossing batch boundaries, same-batch touches, cold 'direct').
    Requires the RocksDB state store provider, set for this query only."""
    from change_data_capture_service_spark.streaming.stateful import (
        last_touch_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "attrib_tws")
        schema = "user_id long, event_id long, event_type string, cents long"
        spark.createDataFrame(
            [(1, 1, "click", 0), (1, 2, "purchase", 1000), (2, 1, "purchase", 200)],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            last_touch_stream_tws(stream)
            .writeStream.format("memory")
            .queryName("attrib_tws_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        spark.createDataFrame(
            [(1, 3, "view", 0), (1, 4, "purchase", 500), (2, 2, "view", 0)],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()

        out = spark.sql("SELECT * FROM attrib_tws_out").toPandas()
        got = {
            (int(r["user_id"]), int(r["event_id"])): (r["source"], int(r["cents"]))
            for _, r in out.iterrows()
        }
        assert got == {
            (1, 2): ("click", 1000),
            (2, 1): ("direct", 200),
            (1, 4): ("view", 500),
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@needs_protobuf
def test_last_touch_tws_ttl_evicts_idle_state(spark, tmp_path):
    """The capability the GroupState path lacks: with a 100 ms state TTL,
    a user's touch recorded in batch 1 is evicted by the store before a
    batch processed ~2 s later, so the purchase credits 'direct' instead
    of the stale click. (TTL is processing-time; the 2 s sleep dwarfs the
    100 ms TTL, so eviction is deterministic in practice.)"""
    import time as _time

    from change_data_capture_service_spark.streaming.stateful import (
        last_touch_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "attrib_ttl")
        schema = "user_id long, event_id long, event_type string, cents long"
        spark.createDataFrame(
            [(1, 1, "click", 0)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            last_touch_stream_tws(stream, ttl_ms=100)
            .writeStream.format("memory")
            .queryName("attrib_ttl_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        _time.sleep(2)  # >> ttl: the click state expires
        spark.createDataFrame(
            [(1, 2, "purchase", 700)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()

        out = spark.sql("SELECT * FROM attrib_ttl_out").toPandas()
        assert len(out) == 1
        assert out.iloc[0]["source"] == "direct"  # not the expired click
        assert int(out.iloc[0]["cents"]) == 700
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_semi_anti_interval_joins_equal_batch(spark, sf_dir, tmp_path):
    """The watermarked leftSemi stream-stream join and the outer+IS NULL
    anti rewrite must, once both sides drain, equal their batch EXISTS /
    NOT EXISTS twins -- and together partition the click stream. Same
    far-future sentinel harness as the left-outer test: anti emissions
    are watermark-driven, so something must advance the watermark past
    the last real click's horizon."""
    import os
    import shutil
    import time as _t

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table

    src = str(tmp_path / "semi_anti_events")
    os.makedirs(src)
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(f"{src}/a_tmp")
    for f in os.listdir(f"{src}/a_tmp"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/a_tmp/{f}", f"{src}/a_events.parquet")
    shutil.rmtree(f"{src}/a_tmp")
    _t.sleep(0.05)
    spark.createDataFrame(
        [
            (10**9, "2030-01-01 00:00:00", -1, "click", 0.0, "{}"),
            (10**9 + 1, "2030-01-02 00:00:00", -1, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{src}/b_sentinel", mode="overwrite")
    for f in os.listdir(f"{src}/b_sentinel"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/b_sentinel/{f}", f"{src}/z_sentinel.parquet")
    shutil.rmtree(f"{src}/b_sentinel")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    def mkstream():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    st = mkstream()
    _drain(
        W.left_semi_interval_join_stream(
            st.filter(F.col("event_type") == "click"),
            st.filter(F.col("event_type") == "purchase"),
        ),
        "semi_out",
    )
    st = mkstream()
    _drain(
        W.anti_interval_join_stream(
            st.filter(F.col("event_type") == "click"),
            st.filter(F.col("event_type") == "purchase"),
        ),
        "anti_out",
    )
    got_semi = {
        r["click_id"]
        for r in spark.sql("SELECT * FROM semi_out").collect()
        if r["click_id"] < 10**9
    }
    got_anti = {
        r["click_id"]
        for r in spark.sql("SELECT * FROM anti_out").collect()
        if r["click_id"] < 10**9
    }

    registry.load_all()
    want_semi = {
        r["click_id"]
        for r in registry.get("stream_interval_join_semi").fn(spark, sf_dir).collect()
    }
    want_anti = {
        r["click_id"]
        for r in registry.get("stream_interval_join_anti").fn(spark, sf_dir).collect()
    }
    assert got_semi == want_semi and len(got_semi) > 0
    assert got_anti == want_anti and len(got_anti) > 0
    # the two partition the click stream
    assert not (got_semi & got_anti)
    n_clicks = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).count()
    assert len(got_semi) + len(got_anti) == n_clicks


def test_ewma_anomaly_stream_equals_batch(spark, sf_dir, tmp_path):
    """The O(1)-state streaming EWMA (applyInPandasWithState, one tuple
    per user) must equal the registered batch fold on every CLOSED day --
    the open final day per user legitimately sits in state. Data arrives
    in two day-split files so state genuinely persists across
    micro-batches."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import (
        ewma_anomaly_stream,
    )

    registry.load_all()
    src = str(tmp_path / "ewma_events")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    base = ev.filter(F.col("ts").isNotNull() & cents.isNotNull()).select(
        "user_id", "ts", cents.alias("cents")
    )
    mid = base.agg(F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 4 DAY")).collect()[0][0]
    for name, part in (
        ("a_first.parquet", base.filter(F.col("ts") < F.lit(mid))),
        ("z_second.parquet", base.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = spark.readStream.schema("user_id long, ts timestamp, cents long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        ewma_anomaly_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], str(r["day"])): (
            r["value_dollars"], r["ewma_dollars"], r["residual_dollars"], r["is_anomaly"]
        )
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }

    batch = registry.get("stream_ewma_anomaly").fn(spark, sf_dir)
    wlast = F.max("day").over(__import__("pyspark").sql.Window.partitionBy("user_id"))
    closed = batch.withColumn("_last", wlast).filter(F.col("day") < F.col("_last"))
    want = {
        (r["user_id"], str(r["day"])): (
            r["value_dollars"], r["ewma_dollars"], r["residual_dollars"], r["is_anomaly"]
        )
        for r in closed.collect()
    }
    assert len(got) > 0
    assert got == want


def test_ewma_tws_plan_builds(spark):
    """The transformWithState EWMA twin must BUILD its unbounded plan in
    every environment: output schema identical to the GroupState
    baseline's, streaming bit set. (Execution needs protobuf, same gate
    as the last-touch twin.)"""
    from change_data_capture_service_spark.streaming.stateful import (
        ewma_anomaly_stream_tws,
    )

    stream = spark.readStream.format("rate").load().selectExpr(
        "value as user_id", "timestamp as ts", "value as cents"
    )
    df = ewma_anomaly_stream_tws(stream)
    assert df.columns == [
        "user_id", "day", "value_dollars", "ewma_dollars",
        "residual_dollars", "is_anomaly",
    ]
    assert df.isStreaming


def test_gap_sla_stream_equals_batch(spark, sf_dir, tmp_path):
    """The O(1)-state streaming SLA monitor must equal the registered
    batch panel on every shared column once the feed drains (p95 is
    batch-only by declared contract). Two time-split files force state
    to persist across micro-batches; within-batch order is shuffled to
    prove the (ts, event_id) sort inside the fold."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import gap_sla_stream

    registry.load_all()
    src = str(tmp_path / "gap_events")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts").isNotNull()).select("event_type", "event_id", "ts")
    mid = base.agg(
        F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 9 DAY")
    ).collect()[0][0]
    for name, part in (
        ("a_first.parquet", base.filter(F.col("ts") < F.lit(mid))),
        ("z_second.parquet", base.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.orderBy(F.col("event_id") % 7).coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = spark.readStream.schema(
        "event_type string, event_id long, ts timestamp"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        gap_sla_stream(stream)
        .writeStream.format("memory")
        .queryName("gap_sla_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode: the LAST emitted row per stream is the final panel
    rows = spark.sql("SELECT * FROM gap_sla_out").collect()
    got = {}
    for r in rows:  # memory sink appends updates in batch order
        got[r["event_type"]] = (
            r["n_gaps"], r["pct_within_sla"], r["max_gap_s"],
            r["n_breaches"], r["breach_seconds"],
        )
    batch = registry.get("cdc_ingestion_sla_by_source").fn(spark, sf_dir)
    want = {
        r["event_type"]: (
            r["n_gaps"], r["pct_within_sla"], r["max_gap_s"],
            r["n_breaches"], r["breach_seconds"],
        )
        for r in batch.collect()
    }
    assert len(got) > 0
    assert got == want


def test_watermark_skew_stream_equals_batch(spark, sf_dir, tmp_path):
    """The O(1)-state streaming watermark tracker + finishing select must
    equal the registered batch panel exactly once the feed drains. Two
    time-split files force high-water state to persist across
    micro-batches."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import (
        watermark_skew_finish,
        watermark_skew_stream,
    )

    registry.load_all()
    src = str(tmp_path / "wm_events")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts").isNotNull()).select("event_type", "ts")
    mid = base.agg(
        F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 9 DAY")
    ).collect()[0][0]
    for name, part in (
        ("a_first.parquet", base.filter(F.col("ts") < F.lit(mid))),
        ("z_second.parquet", base.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = spark.readStream.schema("event_type string, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        watermark_skew_stream(stream)
        .writeStream.format("memory")
        .queryName("wm_skew_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    latest = {}
    for r in spark.sql("SELECT * FROM wm_skew_out").collect():
        latest[r["event_type"]] = (r["max_us"], r["n_events"])  # batch order: last wins
    panel = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in latest.items()],
        "event_type string, max_us long, n_events long",
    )
    got = {
        r["event_type"]: (r["stream_max_ts"], r["skew_s"], r["n_events"], r["is_laggard"])
        for r in watermark_skew_finish(panel).collect()
    }
    want = {
        r["event_type"]: (r["stream_max_ts"], r["skew_s"], r["n_events"], r["is_laggard"])
        for r in registry.get("cdc_watermark_skew_by_table").fn(spark, sf_dir).collect()
    }
    assert len(got) > 0
    assert got == want


def test_throughput_stream_equals_batch(spark, sf_dir, tmp_path):
    """The per-minute-keyed streaming count + the shared finishing fold
    must equal the registered batch burst panel exactly once the feed
    drains. Two time-split files force minute states to accumulate
    across micro-batches."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import (
        minute_count_stream,
        throughput_finish,
    )

    registry.load_all()
    src = str(tmp_path / "tp_events")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts").isNotNull()).select("ts")
    mid = base.agg(
        F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 9 DAY")
    ).collect()[0][0]
    for name, part in (
        ("a_first.parquet", base.filter(F.col("ts") < F.lit(mid))),
        ("z_second.parquet", base.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = spark.readStream.schema("ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        minute_count_stream(stream)
        .writeStream.format("memory")
        .queryName("tp_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    latest = {}
    for r in spark.sql("SELECT * FROM tp_out").collect():
        latest[r["m"]] = r["n"]  # last update per minute wins
    panel = spark.createDataFrame(
        [(k, v) for k, v in latest.items()], "m timestamp, n long"
    )
    got = throughput_finish(panel).collect()[0].asDict()
    want = (
        registry.get("cdc_throughput_percentiles_minute")
        .fn(spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    assert got == want


def test_growth_accounting_stream_equals_batch(spark, sf_dir, tmp_path):
    """The O(1)-per-customer streaming lifecycle classifier must equal
    the registered batch growth-accounting census column-for-column
    once the feed drains. Two time-split files force first/prev state
    to persist across micro-batches; within-batch order is shuffled to
    prove the in-fold month sort."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import (
        growth_accounting_finish,
        growth_accounting_stream,
    )

    registry.load_all()
    src = str(tmp_path / "ga_orders")
    os.makedirs(src)
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderdate").isNotNull()).select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    mid = base.agg(
        F.date_trunc("day", F.min("o_orderdate")) + F.expr("INTERVAL 400 DAY")
    ).collect()[0][0]
    for name, part in (
        ("a_first.parquet", base.filter(F.col("o_orderdate") < F.lit(mid))),
        ("z_second.parquet", base.filter(F.col("o_orderdate") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.orderBy(F.col("o_orderkey") % 7).coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = spark.readStream.schema(
        "o_custkey long, o_orderdate timestamp, o_orderkey long"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        growth_accounting_stream(stream)
        .writeStream.format("memory")
        .queryName("ga_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    panel = spark.sql("SELECT * FROM ga_out")
    got = {
        r["month_start"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_reactivated"], r["n_churned"], r["retention_rate"],
        )
        for r in growth_accounting_finish(panel).collect()
    }
    want = {
        r["month_start"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_reactivated"], r["n_churned"], r["retention_rate"],
        )
        for r in registry.get("customer_growth_accounting_monthly")
        .fn(spark, sf_dir)
        .collect()
    }
    assert len(got) > 2
    assert got == want


def test_growth_accounting_finish_gap_month_churn_is_zero(spark):
    """Round-13 advisor finding: across a GAP month (zero active
    customers) the batch anti-join attributes the churn to the empty
    month -- which emits no row -- so the re-entry month reports 0
    churned. The streaming finish must mirror that, not lag() the
    churn onto the next active month. Panel: custs 1,2 active in month
    0; nobody in month 1; cust 1 back (reactivated) in month 2."""
    from change_data_capture_service_spark.streaming.stateful import (
        growth_accounting_finish,
    )

    jan = 2024 * 12  # idx of January 2024
    panel = spark.createDataFrame(
        [(1, jan, "new"), (2, jan, "new"), (1, jan + 2, "reactivated")],
        "o_custkey long, idx long, state string",
    )
    rows = {r["month_start"].month: r for r in growth_accounting_finish(panel).collect()}
    assert set(rows) == {1, 3}  # idx 0 -> January, idx 2 -> March
    assert rows[1]["n_churned"] == 0  # no prior month at all
    # re-entry month after the gap: churn stays 0 (it belonged to the
    # empty February, which has no row), NOT prev_active - retained = 2
    assert rows[3]["n_churned"] == 0
    assert rows[3]["n_reactivated"] == 1


def test_schema_drift_stream_equals_batch(spark, sf_dir, tmp_path):
    """The O(1)-per-variant streaming schema census must equal the
    batch cdc_schema_drift_audit column-for-column once the
    time-ordered feed drains; two time-split files force variant state
    to persist across micro-batches."""
    import os
    import shutil

    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.streaming.stateful import (
        schema_drift_finish,
        schema_drift_stream,
    )

    registry.load_all()
    src = str(tmp_path / "sd_events")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    mid = e.agg(
        F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 15 DAY")
    ).collect()[0][0]
    for name, part in (
        ("a_first.parquet", e.filter(F.col("ts") < F.lit(mid))),
        ("z_second.parquet", e.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{src}/_tmp"
        part.orderBy("ts").coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/{name}")
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        schema_drift_stream(stream)
        .writeStream.format("memory")
        .queryName("sd_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    panel = spark.sql("SELECT * FROM sd_out")
    cols = (
        "event_type", "keyset", "n_keys", "n_events", "n_days",
        "first_seen", "last_seen", "share", "is_dominant",
    )
    got = sorted(
        tuple(r[c] for c in cols) for r in schema_drift_finish(panel).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in registry.get("cdc_schema_drift_audit").fn(spark, sf_dir).collect()
    )
    assert len(got) >= 1
    assert got == want
