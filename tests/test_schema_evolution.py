"""Schema evolution through the CDC path: the map-typed envelope makes the
pipeline tolerant of source DDL the reference would break on (its consumer
unmarshals whatever arrives, but ES dynamic mapping then freezes the first
guess; pgoutput tuples are positional, so a column added mid-stream
desyncs any consumer holding the old relation message).

Contract pinned here:
- envelopes written BEFORE a column existed decode under the WIDENED
  catalog schema with NULL for the new column (no replay, no crash);
- envelopes written AFTER carry the new column; both generations coexist
  in one changelog and one latest-state view;
- a DROPPED column simply stops being projected -- old payloads still
  hold the key in their map, the typed surface just ignores it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capture_service_spark.streaming import envelope as env

V1_SCHEMA = "id long, name string"
V2_SCHEMA = "id long, name string, email string"


def _v1_batch(spark, lsn):
    df = spark.createDataFrame([(1, "ada"), (2, "bob")], V1_SCHEMA)
    return env.encode(
        df, op="insert", schema_name="public", table_name="users",
        pk_cols=["id"], lsn=F.lit(lsn),
        ts=F.lit("2024-02-01 00:00:00").cast("timestamp"),
    )


def _v2_batch(spark, lsn):
    df = spark.createDataFrame([(3, "cyd", "cyd@c.io")], V2_SCHEMA)
    return env.encode(
        df, op="insert", schema_name="public", table_name="users",
        pk_cols=["id"], lsn=F.lit(lsn),
        ts=F.lit("2024-02-02 00:00:00").cast("timestamp"),
    )


def test_added_column_backfills_null(spark):
    """Old envelopes decode under the widened schema: new column is NULL."""
    log = _v1_batch(spark, 1).unionByName(_v2_batch(spark, 2))
    v2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    rows = {r.id: (r.name, r.email) for r in env.decode_payload(log, v2).collect()}
    assert rows == {1: ("ada", None), 2: ("bob", None), 3: ("cyd", "cyd@c.io")}


def test_dropped_column_is_ignored(spark):
    """Narrowing the catalog schema hides the column without touching the
    stored payloads."""
    log = _v2_batch(spark, 2)
    v1 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    decoded = env.decode_payload(log, v1)
    assert "email" not in decoded.columns
    assert {r.id for r in decoded.collect()} == {3}
    # the raw payload still carries the dropped column for audit/replay
    raw = log.select(F.element_at("after", "email").alias("e")).collect()
    assert raw[0].e == "cyd@c.io"


def test_mixed_generations_through_pipeline_latest_state(spark, tmp_path):
    """Both generations flow through the real pipeline (changelog ->
    stream -> routed sink -> latest-state) and the widened decode sees
    every key exactly once."""
    from change_data_capture_service_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(
        spark,
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        fmt="parquet",
    )
    v1 = spark.createDataFrame([(1, "ada"), (2, "bob")], V1_SCHEMA)
    pipe.snapshot(v1, "public", "users")
    _v2_batch(spark, lsn=10).write.mode("append").format("parquet").save(
        str(tmp_path / "log")
    )
    # update user 1 under the NEW schema (adds an email)
    upd = spark.createDataFrame([(1, "ada", "ada@new.io")], V2_SCHEMA)
    env.encode(
        upd, op="update", schema_name="public", table_name="users",
        pk_cols=["id"], lsn=F.lit(11),
        ts=F.lit("2024-02-03 00:00:00").cast("timestamp"),
    ).write.mode("append").format("parquet").save(str(tmp_path / "log"))
    pipe.run_available()

    # widen the relation registry (the engine's R2/R11 analogue of the
    # reference replacing its relationStore entry on a new RelationMessage):
    # latest_state now decodes every generation under the v2 schema
    pipe.catalog["users"] = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    state = pipe.latest_state("public", "users")
    rows = {r.id: (r.name, r.email) for r in state.collect()}
    assert rows == {
        1: ("ada", "ada@new.io"),  # updated under v2
        2: ("bob", None),          # v1 row, email backfilled NULL
        3: ("cyd", "cyd@c.io"),    # inserted under v2
    }
