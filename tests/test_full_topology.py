"""The whole reference topology in one scenario: two tables, snapshot,
stream of inserts/updates/deletes, a truncate, malformed wire rows, a
hostile table name, compaction, audit, and an incremental resume -- every
feature the piecewise tests prove, composed.

This is the shape a reference user's production deployment takes; if the
pieces compose wrong (fence vs compaction, dead letters vs routing,
checkpoint vs replay), this is where it shows.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.pipeline import CdcPipeline
from change_data_capture_service_spark.streaming.sink import read_dead_letters


def _envelopes(spark, table, rows, op, lsn0, schema="id long, v string"):
    df = spark.createDataFrame(rows, schema)
    return env.encode(
        df,
        op=op,
        schema_name="public",
        table_name=table,
        pk_cols=["id"],
        lsn=F.col("id") + lsn0,
        ts=F.lit("2024-04-01 00:00:00").cast("timestamp"),
    )


def test_full_topology(spark, tmp_path):
    pipe = CdcPipeline(
        spark=spark,
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        audit_log_path=str(tmp_path / "audit"),
    )

    # snapshots for two tables
    users = spark.createDataFrame([(1, "ada"), (2, "bob")], "id long, v string")
    items = spark.createDataFrame([(10, "hat"), (11, "mug")], "id long, v string")
    pipe.snapshot(users, "public", "users", pk_cols=["id"])
    pipe.snapshot(items, "public", "items", pk_cols=["id"])

    # stream batch 1: update users.1, insert items.12, malformed row, hostile name
    _envelopes(spark, "users", [(1, "ada2")], "update", 100).write.mode("append").json(
        pipe.changelog_dir
    )
    _envelopes(spark, "items", [(12, "pen")], "insert", 100).write.mode("append").json(
        pipe.changelog_dir
    )
    with open(f"{pipe.changelog_dir}/garbage.json", "a") as f:
        f.write('{"not": "an envelope"}\n')
        f.write(
            json.dumps(
                {
                    "op": "insert", "schema_name": "public", "table_name": "../evil",
                    "lsn": 999, "ts": "2024-04-01T00:00:00.000Z", "key": "k",
                    "before": None, "after": {"id": "1"},
                }
            )
            + "\n"
        )
    pipe.run_available()

    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "users").collect()} == {
        (1, "ada2"), (2, "bob"),
    }
    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "items").collect()} == {
        (10, "hat"), (11, "mug"), (12, "pen"),
    }
    assert read_dead_letters(spark, pipe.sink_dir).count() == 2

    # stream batch 2: truncate items, then one post-truncate insert; delete users.2
    trunc = spark.createDataFrame([(0, "x")], "id long, v string")
    env.encode(
        trunc, op="truncate", schema_name="public", table_name="items",
        pk_cols=["id"], lsn=F.lit(200),
        ts=F.lit("2024-04-02 00:00:00").cast("timestamp"),
    ).write.mode("append").json(pipe.changelog_dir)
    _envelopes(spark, "items", [(13, "cap")], "insert", 200).write.mode("append").json(
        pipe.changelog_dir
    )
    _envelopes(spark, "users", [(2, "bob")], "delete", 200).write.mode("append").json(
        pipe.changelog_dir
    )
    pipe.run_available()  # resumes from checkpoint: only new files processed

    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "items").collect()} == {
        (13, "cap"),
    }
    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "users").collect()} == {
        (1, "ada2"),
    }

    # compaction preserves both states (incl. the items truncate fence)
    kept_items = pipe.compact("public", "items")
    assert kept_items >= 2  # cap event + durable fence row
    kept_users = pipe.compact("public", "users")
    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "items").collect()} == {
        (13, "cap"),
    }
    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "users").collect()} == {
        (1, "ada2"),
    }

    # a LATE pre-truncate item arriving after compaction must stay erased
    _envelopes(spark, "items", [(11, "zombie-mug")], "update", 100).write.mode(
        "append"
    ).json(pipe.changelog_dir)
    pipe.run_available()
    assert {(r["id"], r["v"]) for r in pipe.latest_state("public", "items").collect()} == {
        (13, "cap"),
    }, "compacted truncate fence failed to block a late event"

    # audit captured stream lifecycle
    pipe._audit.flush()
    kinds = {
        json.loads(r["entry"]).get("kind")
        for r in pipe._audit.table().collect()
    }
    assert "query_started" in kinds or "progress" in kinds
