"""The CDC pipeline proper (reference entry points A-D, SURVEY.md §3), as
one Structured Streaming query.

Reference topology (three single-threaded processes):

    Postgres WAL --(replicator)--> Kafka --(consumer)--> Elasticsearch
         BoltDB LSN checkpoint          group offsets       per-event docs

Engine topology (one streaming query; driver/executor split replaces the
process split):

    changelog (file/Kafka source of envelope JSON)
      -> readStream + from_json(ENVELOPE_SCHEMA)
      -> TableRoutingSink via foreachBatch   (per-table dirs, idempotent)
    with option("checkpointLocation") replacing BOTH the BoltDB LSN store
    (R10) and Kafka group offsets (R19) -- offsets commit exactly once per
    successful batch, fixing the reference's never-commits-on-success bug
    (``cmd/es_consumer/main.go:56-115``).

The file-source changelog is the test/production-local shape; ``kafka_*``
helpers in ``sources.kafka`` build the same query against a broker.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..catalog import PRIMARY_KEYS, SCHEMAS
from . import envelope as env
from .sink import TableRoutingSink, latest_state_view
from .snapshot import write_snapshot


@dataclass
class CdcPipeline:
    """Snapshot-then-stream replication into a queryable per-table sink.

    Mirrors ``StartReplication`` (``internal/wal/replicator.go:186-242``):
    snapshot first (R1), then consume the change stream from the fence (R5)
    -- except the engine's "fence" is positional by construction: snapshot
    events carry lsn=0 inside the same ordered log, so no gap is possible.
    """

    spark: SparkSession
    changelog_dir: str
    sink_dir: str
    checkpoint_dir: str
    catalog: dict | None = None  # table -> StructType; the R11 registry
    max_files_per_trigger: int | None = None  # backpressure (R9 analogue)
    audit_log_path: str | None = None  # R25: append-parquet logs table
    fmt: str = "json"  # changelog+sink format: json (wire parity) | parquet (throughput)
    _sink: TableRoutingSink = field(init=False, default=None)  # type: ignore[assignment]

    def __post_init__(self):
        from .sink import write_format_marker

        self._sink = TableRoutingSink(self.sink_dir, fmt=self.fmt)  # validates fmt + stamps sink
        write_format_marker(self.changelog_dir, self.fmt)  # refuse fmt flips over existing data
        if self.catalog is None:
            self.catalog = dict(SCHEMAS)
        self._audit = None
        if self.audit_log_path:
            from .audit import AuditListener, AuditLog

            self._audit = AuditLog(self.spark, self.audit_log_path)
            self.spark.streams.addListener(AuditListener(self._audit))

    # -- entry point B: snapshot/backfill (R1+R5) ---------------------------
    def snapshot(
        self, df: DataFrame, schema_name: str, table_name: str, pk_cols: list[str] | None = None
    ) -> int:
        # register the table in the engine catalog (the R11 relation registry)
        self.catalog.setdefault(table_name, df.schema)
        return write_snapshot(
            self.spark,
            df,
            self.changelog_dir,
            schema_name=schema_name,
            table_name=table_name,
            pk_cols=pk_cols or PRIMARY_KEYS.get(table_name),
            fmt=self.fmt,
        )

    # -- entry points C+D: stream decode + routed sink (R7-R9, R19-R22) -----
    def change_stream(self) -> DataFrame:
        """Unbounded envelope DataFrame from the changelog (R7). The file
        source's discovered-files log is the LSN position; Kafka offsets play
        the same role in the broker shape."""
        reader = self.spark.readStream.schema(env.ENVELOPE_SCHEMA)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return reader.format(self.fmt).load(self.changelog_dir)

    def observed_stream(self) -> DataFrame:
        """change_stream + ``observe()`` accumulators: per-micro-batch row /
        delete / truncate counts and the high LSN, computed inline by the
        executors and delivered through StreamingQueryProgress -- the
        scalable twin of the reference's per-event audit INSERT
        (``logger.go:41-54`` writes one SQLite row per event; at 100 TB the
        metrics must ride the batch, not a side channel). AuditListener
        persists them, so the audit log carries per-batch ingest truth
        without a second pass over the data."""
        from pyspark.sql import functions as F

        return self.change_stream().observe(
            "cdc_ingest",
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("op") == "delete").cast("long")).alias("deletes"),
            F.sum((F.col("op") == "truncate").cast("long")).alias("truncates"),
            F.max("lsn").alias("high_lsn"),
        )

    def start(self, available_now: bool = False) -> StreamingQuery:
        writer = (
            self.observed_stream()
            .writeStream.foreachBatch(self._sink)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self) -> None:
        """Drain everything currently in the changelog and stop -- the test /
        batch-backfill mode (``trigger(availableNow)`` processes in bounded
        batches WITH checkpointing, so repeated calls resume incrementally)."""
        q = self.start(available_now=True)
        q.awaitTermination()

    def compact(self, schema_name: str, table_name: str) -> int:
        """Compact this pipeline's event log for one table (format-safe)."""
        from .sink import compact_event_log

        return compact_event_log(self.spark, self.sink_dir, schema_name, table_name, self.fmt)

    # -- the queryable surface the sink exists for --------------------------
    def latest_state(self, schema_name: str, table_name: str) -> DataFrame:
        return latest_state_view(
            self.spark, self.sink_dir, schema_name, table_name, self.catalog.get(table_name),
            fmt=self.fmt,
        )
