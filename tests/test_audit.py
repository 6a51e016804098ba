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
