"""Audit log (reference R25: zap tee -> SQLite ``logs`` table,
``internal/logger/logger.go:14-73``).

Engine shape: an append-only parquet ``logs`` table with the same columns
(id, timestamp, entry-JSON) written in batches, plus a
``StreamingQueryListener`` that audits every micro-batch progress event --
the engine's replacement for per-line SQLite INSERTs (``logger.go:62-68``),
which would be a driver-side bottleneck at scale.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import listener as L

LOGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("entry", T.StringType()),
    ]
)


class AuditLog:
    """Buffered append logger -> parquet ``logs`` table. Entries buffer
    driver-side (they are control-plane metadata, a few per batch) and flush
    as a single distributed write."""

    def __init__(self, spark: SparkSession, path: str, flush_every: int = 100):
        self.spark = spark
        self.path = path
        self.flush_every = flush_every
        self._buf: list[str] = []
        self._next_id: int | None = None  # lazily seeded from max(id)+1 on first flush
        self._lock = threading.Lock()

    def _seed_next_id(self) -> int:
        """The logs table is append-only across process runs, so ids must
        continue from the stored maximum -- restarting at 0 every run would
        collide, breaking the unique-id contract of the reference's SQLite
        logs table (AUTOINCREMENT) this replaces."""
        import os

        if not os.path.isdir(self.path):
            return 0
        prev = self.table().agg(F.coalesce(F.max("id"), F.lit(-1)).alias("m")).collect()[0]["m"]
        return int(prev) + 1

    def log(self, **entry) -> None:
        with self._lock:
            self._buf.append(json.dumps(entry, sort_keys=True, default=str))
            if len(self._buf) >= self.flush_every:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        if self._next_id is None:
            self._next_id = self._seed_next_id()
        rows = [(self._next_id + i, e) for i, e in enumerate(self._buf)]
        self._next_id += len(rows)
        self._buf.clear()
        df = self.spark.createDataFrame(rows, "id long, entry string").select(
            "id", F.current_timestamp().alias("ts"), "entry"
        )
        df.write.mode("append").parquet(self.path)

    def table(self) -> DataFrame:
        return self.spark.read.schema(LOGS_SCHEMA).parquet(self.path)


class AuditListener(L.StreamingQueryListener):
    """Audits stream lifecycle + per-batch progress (rows/sec, batch id,
    sources) -- the observability the reference got from zap console+SQLite."""

    def __init__(self, audit: AuditLog):
        self.audit = audit

    def onQueryStarted(self, event):
        self.audit.log(kind="query_started", id=str(event.id), name=event.name)

    def onQueryProgress(self, event):
        p = event.progress
        entry = dict(
            kind="progress",
            id=str(p.id),
            batchId=p.batchId,
            numInputRows=p.numInputRows,
        )
        # per-batch observe() accumulators (rows/deletes/truncates/high_lsn)
        # computed executor-side by CdcPipeline.observed_stream
        m = (p.observedMetrics or {}).get("cdc_ingest")
        if m is not None:
            entry.update(
                obs_rows=m["rows"],
                obs_deletes=m["deletes"],
                obs_truncates=m["truncates"],
                obs_high_lsn=m["high_lsn"],
            )
        self.audit.log(**entry)
        self.audit.flush()

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.audit.log(kind="query_terminated", id=str(event.id), exception=event.exception)
        self.audit.flush()
