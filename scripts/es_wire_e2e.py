"""Wire-level end-to-end run of the ES ``_bulk`` sink WITH mid-stream
crash recovery -- the round-13 verdict's item 5 (upgrade R22/R23 from
"mock-tested inside pytest" to "wire-tested with recovery").

    python scripts/es_wire_e2e.py

What it does (all real components, no pytest harness):

1. Starts a loopback HTTP listener implementing Elasticsearch ``_bulk``
   semantics (``change_data_capture_service_spark.testing.MockEs`` -- the
   same stdlib ThreadingHTTPServer the sink's unit tests use, here run as
   a standalone wire endpoint).
2. Builds a REAL Structured Streaming query: parquet file source over an
   envelope changelog -> ``foreachBatch(EsBulkSink(mode="state"))`` with a
   ``checkpointLocation``, ``maxFilesPerTrigger=1`` so every file is its
   own epoch.
3. Phase A: drains two changelog files, then STOPS the query (graceful
   shutdown).
4. Phase B: lands two more files, arms the endpoint to fail the next
   ``_bulk`` request with HTTP 500, restarts the query from the SAME
   checkpoint, and lets the failing batch KILL it mid-stream (the sink's
   contract: non-2xx raises -> task -> batch -> query; the epoch never
   commits).
5. Phase C: disarms the failure, restarts from the same checkpoint again;
   Structured Streaming replays the failed epoch (same deterministic doc
   IDs -> idempotent rewrite) and drains the remainder.
6. Verifies the final endpoint state equals the batch-computed max-LSN
   latest state per key, byte-for-byte per doc, and that the failed epoch
   really was retried (bulk request count > file count).

Exit 0 + one summary JSON line on success; raises on any divergence.
Latest run recorded in RUNBOOK.md ("ES wire e2e" section).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from change_data_capture_service_spark.session import get_spark
    from change_data_capture_service_spark.streaming.envelope import ENVELOPE_SCHEMA
    from change_data_capture_service_spark.streaming.es_sink import EsBulkSink
    from change_data_capture_service_spark.testing import MockEs

    spark = get_spark(app_name="es-wire-e2e", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    work = tempfile.mkdtemp(prefix="es-wire-e2e-")
    log_dir, ckpt = f"{work}/changelog", f"{work}/ckpt"
    os.makedirs(log_dir)
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def envelopes(rows):
        return spark.createDataFrame(
            [
                {
                    "op": op,
                    "schema_name": "public",
                    "table_name": "users",
                    "lsn": lsn,
                    "ts": ts,
                    "key": f"public.users:{uid}",
                    "before": None,
                    "after": None if op == "delete" else {"id": str(uid), "v": v},
                }
                for (op, lsn, uid, v) in rows
            ],
            ENVELOPE_SCHEMA,
        )

    # four changelog files = four epochs at maxFilesPerTrigger=1
    files = [
        [("insert", 1, 1, "a"), ("insert", 2, 2, "b")],
        [("update", 3, 1, "a3"), ("insert", 4, 3, "c")],
        [("update", 5, 2, "b5"), ("delete", 6, 3, None)],
        [("insert", 7, 4, "d"), ("update", 8, 4, "d8")],
    ]

    def land(i: int) -> None:
        tmp = f"{work}/_tmp{i}"
        envelopes(files[i]).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(f"{tmp}/{part}", f"{log_dir}/f{i}.parquet")
        shutil.rmtree(tmp)

    with MockEs() as es:
        sink = EsBulkSink(es.url, mode="state")

        def start():
            return (
                spark.readStream.schema(ENVELOPE_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(log_dir)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .start()
            )

        # Phase A: two epochs, graceful stop
        land(0)
        land(1)
        q = start()
        q.processAllAvailable()
        q.stop()
        reqs_after_a = es.bulk_requests
        print(f"phase A: drained 2 epochs, {reqs_after_a} bulk requests, stopped")

        # Phase B: fail the next bulk -> the batch kills the query mid-stream
        land(2)
        land(3)
        es.fail_next = True
        q = start()
        died = False
        for _ in range(120):
            if q.exception() is not None:
                died = True
                break
            time.sleep(0.25)
        assert died, "query should have died on the HTTP 500 _bulk reply"
        assert "500" in str(q.exception()), q.exception()
        state_mid = es.snapshot()
        print(f"phase B: query died on induced 500 as contracted: "
              f"{str(q.exception())[:80]}...")

        # Phase C: restart from the same checkpoint; the failed epoch replays
        q = start()
        q.processAllAvailable()
        q.stop()
        final = es.snapshot()

        # expected: batch-computed max-LSN latest state per key over ALL files
        all_env = envelopes([r for f in files for r in f])
        latest = (
            all_env.groupBy("key")
            .agg(F.max_by(F.struct("op", "lsn", "after"), F.col("lsn")).alias("r"))
            .select("key", "r.op", "r.lsn", "r.after")
            .collect()
        )
        expected_live = {r["key"]: r for r in latest if r["op"] != "delete"}
        got = final.get("cdc_public_users", {})
        assert sorted(got) == sorted(expected_live), (sorted(got), sorted(expected_live))
        for key, r in expected_live.items():
            doc = got[key]
            assert doc["lsn"] == r["lsn"] and doc["data"] == dict(r["after"]), (key, doc, r)
        # the failed epoch really was retried over the wire
        assert es.bulk_requests > len(files), es.bulk_requests
        print(json.dumps({
            "phases": 3,
            "epochs": len(files),
            "bulk_requests": es.bulk_requests,
            "bulk_bytes": es.bulk_bytes,
            "induced_failures": 1,
            "live_docs": len(got),
            "state_matches_batch_latest": True,
            "mid_crash_docs": len(state_mid.get("cdc_public_users", {})),
        }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
