"""End-to-end CDC pipeline semantics (reference entry points A-D):
snapshot -> change stream -> routed idempotent sink -> latest-state view.

The oracle for latest_state is "apply the ops in LSN order by hand" --
SURVEY.md §5 test strategy (3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.pipeline import CdcPipeline
from change_data_capture_service_spark.streaming.sink import (
    compact_event_log,
    read_event_log,
)


USERS_SCHEMA = "id long, name string, email string"


@pytest.fixture()
def users_df(spark):
    return spark.createDataFrame(
        [
            (1, "ada", "ada@a.io"),
            (2, "bob", "bob@b.io"),
            (3, "cyd", "cyd@c.io"),
        ],
        USERS_SCHEMA,
    )


def _change(spark, rows, op, lsn, before_row=None):
    """Build change envelopes from a single-row typed change (test helper)."""
    df = spark.createDataFrame(rows, USERS_SCHEMA)
    before_cols = None
    if before_row is not None:
        bdf = spark.createDataFrame([before_row], "old_id long, old_name string, old_email string")
        df = df.crossJoin(bdf)  # single-row zip, test-only
        before_cols = ["old_id", "old_name", "old_email"]
    return env.encode(
        df,
        op=op,
        schema_name="public",
        table_name="users",
        pk_cols=["id"],
        lsn=F.lit(lsn),
        ts=F.lit("2024-02-01 00:00:00").cast("timestamp"),
        before_cols=before_cols,
    )


def test_envelope_roundtrip(spark, users_df):
    """Typed rows -> envelope -> decode == string-degraded identity (R3/R13/R20)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    enc = env.encode(
        users_df,
        op="insert",
        schema_name="public",
        table_name="users",
        pk_cols=["id"],
        lsn=F.col("id"),
        ts=F.lit("2024-02-01 00:00:00").cast("timestamp"),
    )
    dec = env.decode_payload(enc, schema)
    got = {(r["id"], r["name"], r["email"]) for r in dec.collect()}
    want = {(r["id"], r["name"], r["email"]) for r in users_df.collect()}
    assert got == want
    keys = {r["key"] for r in enc.collect()}
    assert keys == {"public.users:1", "public.users:2", "public.users:3"}


def test_wire_json_roundtrip(spark, users_df):
    """Envelope -> Kafka wire JSON -> envelope (R18/R20 codec)."""
    enc = env.encode(
        users_df,
        op="insert",
        schema_name="public",
        table_name="users",
        pk_cols=["id"],
        lsn=F.col("id"),
        ts=F.lit("2024-02-01 00:00:00").cast("timestamp"),
    )
    wire = env.to_json_value(enc)
    back = env.from_json_value(wire)
    assert sorted(back.columns) == sorted(enc.columns)
    assert back.count() == 3
    r = back.filter(F.col("lsn") == 1).collect()[0]
    assert r["after"]["name"] == "ada"
    assert r["op"] == "insert"


def _mk_pipeline(spark, tmp_path):
    return CdcPipeline(
        spark=spark,
        changelog_dir=str(tmp_path / "changelog"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _append_changes(spark, pipe, ts="2024-02-01 00:00:00"):
    """insert id=4; update id=2 (bob->rob); delete id=3."""
    ins = _change(spark, [(4, "dee", "dee@d.io")], "insert", 101)
    upd = _change(
        spark,
        [(2, "rob", "rob@b.io")],
        "update",
        102,
        before_row=(2, "bob", "bob@b.io"),
    )
    dele = _change(spark, [(3, "cyd", "cyd@c.io")], "delete", 103)
    for df in (ins, upd, dele):
        df.write.mode("append").json(pipe.changelog_dir)


def test_pipeline_end_to_end_latest_state(spark, tmp_path, users_df):
    pipe = _mk_pipeline(spark, tmp_path)
    fence = pipe.snapshot(users_df, "public", "users")
    assert fence == 0
    _append_changes(spark, pipe)
    pipe.run_available()

    state = pipe.latest_state("public", "users")
    from pyspark.sql import types as T

    got = {(r["id"], r["name"], r["email"]) for r in state.collect()}
    # applied by hand: snapshot {1,2,3}; +4; 2->rob; -3
    assert got == {(1, "ada", "ada@a.io"), (2, "rob", "rob@b.io"), (4, "dee", "dee@d.io")}
    ops = {r["op"] for r in state.select("op").collect()}
    assert "delete" not in ops


def test_pipeline_resume_is_incremental_and_idempotent(spark, tmp_path, users_df):
    """Re-running with the same checkpoint must not duplicate events
    (R10/R19 done right: offsets commit after successful batches)."""
    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    pipe.run_available()
    log1 = read_event_log(spark, pipe.sink_dir, "public", "users").count()

    pipe.run_available()  # nothing new -> no growth
    log2 = read_event_log(spark, pipe.sink_dir, "public", "users").count()
    assert log1 == log2 == 3

    _append_changes(spark, pipe)
    pipe.run_available()  # only the 3 new events flow
    log3 = read_event_log(spark, pipe.sink_dir, "public", "users")
    assert log3.count() == 6
    # per-event docs keyed by LSN, exactly once each
    assert log3.select("lsn").distinct().count() == 4  # 0(×3 snapshot),101,102,103


def test_truncate_erases_prior_state(spark, tmp_path, users_df):
    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    trunc = spark.createDataFrame([(0,)], "dummy int").select(F.lit(1).alias("dummy"))
    trunc_env = env.encode(
        trunc,
        op="truncate",
        schema_name="public",
        table_name="users",
        pk_cols=["dummy"],
        lsn=F.lit(200),
        ts=F.lit("2024-02-02 00:00:00").cast("timestamp"),
    )
    trunc_env.write.mode("append").json(pipe.changelog_dir)
    post = _change(spark, [(9, "zoe", "zoe@z.io")], "insert", 201)
    post.write.mode("append").json(pipe.changelog_dir)
    pipe.run_available()

    state = pipe.latest_state("public", "users")
    got = {(r["id"], r["name"]) for r in state.collect()}
    assert got == {(9, "zoe")}  # truncate wiped the snapshot; only post-truncate insert survives


def test_multi_table_routing(spark, tmp_path, users_df):
    """R21: events route to per-table Hive partitions in ONE write job per
    epoch (``ingest/ingest_batch=*/schema_name=<s>/table_name=<t>``)."""
    import glob

    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    orders = spark.createDataFrame([(10, 1, 5.0)], "oid long, uid long, amt double")
    pipe.snapshot(orders, "public", "orders", pk_cols=["oid"])
    pipe.run_available()

    assert glob.glob(
        f"{pipe.sink_dir}/ingest/ingest_batch=*/ok=true/schema_name=public/table_name=users"
    )
    assert glob.glob(
        f"{pipe.sink_dir}/ingest/ingest_batch=*/ok=true/schema_name=public/table_name=orders"
    )
    assert read_event_log(spark, pipe.sink_dir, "public", "users").count() == 3
    assert read_event_log(spark, pipe.sink_dir, "public", "orders").count() == 1


def test_crafted_table_name_cannot_escape_sink(spark, tmp_path, users_df):
    """A wire envelope with a path-traversal table_name routes to the dead
    letter instead of writing outside the sink dir."""
    import json as _json
    import os

    from change_data_capture_service_spark.streaming.sink import read_dead_letters

    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    os.makedirs(pipe.changelog_dir, exist_ok=True)
    evil = {
        "op": "insert", "schema_name": "public", "table_name": "../../escape",
        "lsn": 999, "ts": "2024-02-01T00:00:00.000Z",
        "key": "public.x:1", "before": None, "after": {"id": "1"},
    }
    with open(f"{pipe.changelog_dir}/evil.json", "w") as f:
        f.write(_json.dumps(evil) + "\n")
    pipe.run_available()

    assert not os.path.exists(str(tmp_path / "escape"))
    dead = read_dead_letters(spark, pipe.sink_dir)
    assert dead.filter(F.col("table_name") == "../../escape").count() == 1
    assert pipe.latest_state("public", "users").count() == 3  # stream survived


def test_schema_evolution_new_column(spark, tmp_path, users_df):
    """R2 schema capture under evolution: the string-degraded map payload
    carries columns the catalog doesn't know yet, so adding a column
    upstream never breaks ingestion -- re-declaring the catalog schema
    surfaces it, with NULL for rows from before the change."""
    from pyspark.sql import types as T

    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    wide = spark.createDataFrame(
        [(5, "eve", "eve@e.io", 30)], "id long, name string, email string, age long"
    )
    env.encode(
        wide,
        op="insert",
        schema_name="public",
        table_name="users",
        pk_cols=["id"],
        lsn=F.lit(500),
        ts=F.lit("2024-02-03 00:00:00").cast("timestamp"),
    ).write.mode("append").json(pipe.changelog_dir)
    pipe.run_available()

    # catalog still at the old shape: pipeline works, new column invisible
    assert pipe.latest_state("public", "users").count() == 4

    # evolve the declared schema; pre-evolution rows read NULL for age
    pipe.catalog["users"] = T.StructType(
        list(pipe.catalog["users"].fields) + [T.StructField("age", T.LongType())]
    )
    state = {r["id"]: r["age"] for r in pipe.latest_state("public", "users").collect()}
    assert state[5] == 30
    assert state[1] is None and state[2] is None and state[3] is None


def test_dead_letter_routing(spark, tmp_path, users_df):
    """Malformed wire rows land in _dead_letter, not the void."""
    from change_data_capture_service_spark.streaming.sink import read_dead_letters

    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    import os

    os.makedirs(pipe.changelog_dir, exist_ok=True)
    with open(f"{pipe.changelog_dir}/garbage.json", "w") as f:
        f.write('{"not": "an envelope"}\n')
    pipe.run_available()
    assert pipe.latest_state("public", "users").count() == 3  # stream survived
    dead = read_dead_letters(spark, pipe.sink_dir)
    assert dead.count() == 1


def test_sink_epoch_replay_is_idempotent(spark, tmp_path, users_df):
    """At-least-once redelivery: the SAME epoch delivered twice (including a
    simulated partial first attempt) leaves exactly one copy of each event
    -- the epoch-dir overwrite is the Spark analogue of deterministic doc
    ids in the reference's ES sink."""
    from change_data_capture_service_spark.streaming.sink import (
        TableRoutingSink,
        read_event_log,
    )

    sink = TableRoutingSink(str(tmp_path / "sink"))
    batch = env.encode(
        users_df,
        op="insert",
        schema_name="public",
        table_name="users",
        pk_cols=["id"],
        lsn=F.col("id"),
        ts=F.lit("2024-02-01 00:00:00").cast("timestamp"),
    )
    sink(batch, 7)
    sink(batch, 7)  # exact redelivery
    sink(batch, 7)  # and again -- overwrite keeps the epoch single-copy

    log = read_event_log(spark, str(tmp_path / "sink"), "public", "users")
    assert log.count() == 3
    assert log.select("lsn").distinct().count() == 3


def test_compaction_preserves_latest_state(spark, tmp_path, users_df):
    from change_data_capture_service_spark.streaming.sink import read_event_log

    pipe = _mk_pipeline(spark, tmp_path)
    pipe.snapshot(users_df, "public", "users")
    _append_changes(spark, pipe)  # +insert 4, update 2, delete 3
    pipe.run_available()
    before_state = {(r["id"], r["name"]) for r in pipe.latest_state("public", "users").collect()}
    assert read_event_log(spark, pipe.sink_dir, "public", "users").count() == 6

    kept = pipe.compact("public", "users")
    assert kept == 4  # one max-lsn event per key (1,2,3,4); delete tombstone retained
    after_state = {(r["id"], r["name"]) for r in pipe.latest_state("public", "users").collect()}
    assert after_state == before_state


def test_parquet_format_pipeline(spark, tmp_path, users_df):
    """The throughput configuration (parquet changelog+sink) preserves
    identical semantics to the JSON wire-parity default -- including
    compaction and dead-letter reads, which self-resolve the format from
    the directory marker (a wrong-format read would silently yield
    all-null rows)."""
    import pytest as _pytest

    from change_data_capture_service_spark.streaming.sink import read_dead_letters

    pipe = CdcPipeline(
        spark=spark,
        changelog_dir=str(tmp_path / "plog"),
        sink_dir=str(tmp_path / "psink"),
        checkpoint_dir=str(tmp_path / "pckpt"),
        fmt="parquet",
    )
    pipe.snapshot(users_df, "public", "users")
    upd = _change(spark, [(2, "rob", "rob@b.io")], "update", 102)
    upd.write.mode("append").format("parquet").save(pipe.changelog_dir)
    pipe.run_available()
    got = {(r["id"], r["name"]) for r in pipe.latest_state("public", "users").collect()}
    assert got == {(1, "ada"), (2, "rob"), (3, "cyd")}

    # compaction without an explicit fmt arg must resolve parquet from the
    # marker and preserve state (regression: json default destroyed the log)
    kept = compact_event_log(spark, pipe.sink_dir, "public", "users")
    assert kept == 3
    got2 = {(r["id"], r["name"]) for r in pipe.latest_state("public", "users").collect()}
    assert got2 == got

    # dead-letter read also self-resolves (empty here, but must not misparse)
    assert read_dead_letters(spark, pipe.sink_dir).count() == 0

    # reopening the same dirs with a different fmt is refused outright
    with _pytest.raises(ValueError, match="refusing"):
        CdcPipeline(
            spark=spark,
            changelog_dir=pipe.changelog_dir,
            sink_dir=pipe.sink_dir,
            checkpoint_dir=pipe.checkpoint_dir,
            fmt="json",
        )
