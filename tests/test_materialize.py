"""Incrementally-materialized latest-state: merge semantics across
micro-batches, late-event rejection, tombstones, truncate fences."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.materialize import (
    MaterializedState,
    start_materialized,
)


def _env_rows(spark, rows, op, table="users"):
    """rows: list of (key_id, name, lsn)."""
    df = spark.createDataFrame([(i, n) for i, n, _ in rows], "id long, name string")
    lsn_map = {i: l for i, _, l in rows}
    mapping = F.create_map(*[x for i in lsn_map for x in (F.lit(i), F.lit(lsn_map[i]))])
    return env.encode(
        df,
        op=op,
        schema_name="public",
        table_name=table,
        pk_cols=["id"],
        lsn=mapping[F.col("id")],
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def _drain(spark, src, state_dir, ckpt):
    stream = spark.readStream.schema(env.ENVELOPE_SCHEMA).json(src)
    sink, q = start_materialized(stream, state_dir, ckpt)
    q.awaitTermination()
    return sink


def test_incremental_merge_across_batches(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    _env_rows(spark, [(1, "ada", 1), (2, "bob", 2)], "insert").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert {(r["key"], r["lsn"]) for r in sink.current().collect()} == {
        ("public.users:1", 1),
        ("public.users:2", 2),
    }

    # batch 2: forward update for 1, LATE (stale) update for 2, delete nothing
    _env_rows(spark, [(1, "ada2", 10)], "update").write.mode("append").json(src)
    _env_rows(spark, [(2, "stale", 1)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = {(r["key"], r["lsn"], r["after"]["name"]) for r in sink.current().collect()}
    assert got == {("public.users:1", 10, "ada2"), ("public.users:2", 2, "bob")}


def test_tombstone_blocks_resurrection(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    _env_rows(spark, [(1, "ada", 1)], "insert").write.mode("append").json(src)
    _env_rows(spark, [(1, "ada", 5)], "delete").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert sink.current().count() == 0

    # a late pre-delete update must NOT resurrect the key
    _env_rows(spark, [(1, "zombie", 3)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert sink.current().count() == 0


def test_truncate_fence_durable_across_batches(spark, tmp_path):
    """A late event arriving in a LATER batch, below a truncate fence applied
    in an earlier batch, must not resurrect (the fence is persisted as a
    control row, not just applied in-batch)."""
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    _env_rows(spark, [(1, "ada", 1)], "insert").write.mode("append").json(src)
    trunc_src = spark.createDataFrame([(1,)], "dummy int")
    env.encode(
        trunc_src, op="truncate", schema_name="public", table_name="users",
        pk_cols=["dummy"], lsn=F.lit(50),
        ts=F.lit("2024-03-02 00:00:00").cast("timestamp"),
    ).write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert sink.current().count() == 0

    # batch 2 (after the truncate batch committed): replayed pre-truncate event
    _env_rows(spark, [(2, "zombie", 30)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert sink.current().count() == 0  # fence survived the batch boundary

    # genuinely-new data above the fence still lands
    _env_rows(spark, [(3, "cyd", 60)], "insert").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert {(r["key"], r["lsn"]) for r in sink.current().collect()} == {("public.users:3", 60)}


def test_truncate_fence_in_materialized_state(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    _env_rows(spark, [(1, "ada", 1), (2, "bob", 2)], "insert").write.mode("append").json(src)
    trunc_src = spark.createDataFrame([(1,)], "dummy int")
    env.encode(
        trunc_src, op="truncate", schema_name="public", table_name="users",
        pk_cols=["dummy"], lsn=F.lit(50),
        ts=F.lit("2024-03-02 00:00:00").cast("timestamp"),
    ).write.mode("append").json(src)
    _env_rows(spark, [(3, "cyd", 60)], "insert").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = {(r["key"], r["lsn"]) for r in sink.current().collect()}
    assert got == {("public.users:3", 60)}
