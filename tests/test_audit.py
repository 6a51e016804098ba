"""Audit log (R25): append-only parquet logs table + streaming listener."""

from __future__ import annotations

import json

from change_data_capture_service_spark.streaming.audit import AuditLog


def test_audit_log_appends_and_reads_back(spark, tmp_path):
    log = AuditLog(spark, str(tmp_path / "logs"), flush_every=2)
    log.log(level="info", msg="starting replication", slot="cdc_slot")
    log.log(level="info", msg="snapshot complete", table="public.users")  # triggers flush
    log.log(level="error", msg="decode failure", lsn=42)
    log.flush()

    table = log.table()
    rows = sorted(table.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [0, 1, 2]
    entries = [json.loads(r["entry"]) for r in rows]
    assert entries[0]["msg"] == "starting replication"
    assert entries[2]["lsn"] == 42
    assert all(r["ts"] is not None for r in rows)


def test_audit_ids_continue_across_runs(spark, tmp_path):
    """A new process (new AuditLog over the same path) must continue ids from
    max(id)+1, not restart at 0 -- the table is append-only, so a restart
    would collide ids."""
    path = str(tmp_path / "logs")
    first = AuditLog(spark, path)
    first.log(msg="a")
    first.log(msg="b")
    first.flush()

    second = AuditLog(spark, path)  # simulates a process restart
    second.log(msg="c")
    second.flush()

    ids = sorted(r["id"] for r in second.table().collect())
    assert ids == [0, 1, 2]


def test_pipeline_audits_stream_progress(spark, tmp_path):
    """R25 wired into the pipeline: micro-batch progress lands in the logs
    table via the streaming listener."""
    import json as _json
    import time

    from change_data_capture_service_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(
        spark=spark,
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        audit_log_path=str(tmp_path / "audit"),
    )
    users = spark.createDataFrame([(1, "ada")], "id long, name string")
    pipe.snapshot(users, "public", "users", pk_cols=["id"])
    pipe.run_available()
    # listener callbacks are async; wait for the flush
    for _ in range(40):
        try:
            if pipe._audit.table().count() > 0:
                break
        except Exception:
            pass
        time.sleep(0.25)
    entries = [_json.loads(r["entry"]) for r in pipe._audit.table().collect()]
    kinds = {e["kind"] for e in entries}
    assert "query_started" in kinds or "progress" in kinds


def test_observed_metrics_reach_the_audit_log(spark, tmp_path):
    """observe() accumulators (rows/deletes/high LSN) computed executor-side
    must land in the audit log via the listener -- per-batch ingest truth
    with no second pass over the data."""
    import json as _json
    import time

    from change_data_capture_service_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(
        spark=spark,
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        audit_log_path=str(tmp_path / "audit"),
    )
    users = spark.createDataFrame([(1, "ada"), (2, "bob")], "id long, name string")
    pipe.snapshot(users, "public", "users", pk_cols=["id"])
    pipe.run_available()

    obs = None
    for _ in range(40):
        try:
            entries = [_json.loads(r["entry"]) for r in pipe._audit.table().collect()]
            with_obs = [e for e in entries if e.get("kind") == "progress" and "obs_rows" in e]
            if with_obs:
                obs = with_obs
                break
        except Exception:
            pass
        time.sleep(0.25)
    assert obs, "no progress entry carried observed metrics"
    total_rows = sum(e["obs_rows"] for e in obs)
    assert total_rows == 2  # both snapshot envelopes counted executor-side
    assert all(e["obs_deletes"] == 0 and e["obs_truncates"] == 0 for e in obs)
    assert max(e["obs_high_lsn"] for e in obs) >= 0  # snapshot envelopes ride LSN 0
