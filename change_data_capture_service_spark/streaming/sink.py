"""Routed idempotent sink (reference R21/R22, ``cmd/es_consumer/main.go:75-95``).

The reference writes one ES document per event, index ``cdc_<schema>_<table>``,
doc-id = LSN (idempotent per-event upsert), with ``refresh=true`` per event
(throughput worst case) and -- a bug -- never commits Kafka offsets on
success. The engine replaces all of that with one ``foreachBatch``:

- dynamic routing: one sink directory per source table
  (``<out>/<schema>_<table>/``), mirroring the per-table index;
- idempotence: each micro-batch writes to a deterministic
  ``ingest_batch=<epoch_id>`` subdirectory with mode=overwrite, so a
  replayed batch (at-least-once upstream) lands in the same place instead
  of duplicating -- the Spark analogue of deterministic doc IDs;
- offsets: Structured Streaming's checkpoint (offset+commit WAL) replaces
  both the BoltDB LSN store (R10) and the consumer group offsets (R19),
  committing exactly after a successful batch -- fixing the reference's
  missing-commit bug by construction.

The sink stores the *event log* (doc-per-event, like the reference);
``latest_state_view`` compacts it to current-state per key (X1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import SCHEMAS
from . import envelope as env


SUPPORTED_LOG_FORMATS = ("json", "parquet", "orc")
_MARKER = "_format"


def write_format_marker(out_dir: str, fmt: str) -> None:
    """Stamp a sink/changelog directory with its file format so readers and
    compaction can self-describe instead of trusting a caller's default --
    a format mismatch reads parquet binaries as JSON lines, i.e. all-null
    rows, silently."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        existing = open(marker).read().strip()
        if existing != fmt:
            raise ValueError(
                f"{out_dir} was written as {existing!r}; refusing to use it as {fmt!r}"
            )
        return
    with open(marker, "w") as f:
        f.write(fmt)


def resolve_format(out_dir: str, fmt: str | None) -> str:
    """Explicit fmt wins (validated against the marker by write paths);
    otherwise the directory's marker; otherwise the json default."""
    if fmt is not None:
        return fmt
    marker = os.path.join(out_dir.rstrip("/"), _MARKER)
    if os.path.exists(marker):
        return open(marker).read().strip()
    return "json"


class TableRoutingSink:
    """``foreachBatch`` callable: route envelope micro-batches to per-table
    directories, idempotently per epoch."""

    def __init__(self, out_dir: str, fmt: str = "json"):
        # fmt: "json" = wire-parity/debuggable (the reference's shape);
        # "parquet"/"orc" = columnar event log for throughput
        if fmt not in SUPPORTED_LOG_FORMATS:
            raise ValueError(f"fmt must be one of {SUPPORTED_LOG_FORMATS}, got {fmt!r}")
        self.out_dir = out_dir.rstrip("/")
        self.fmt = fmt
        write_format_marker(self.out_dir, fmt)

    def table_dir(self, schema_name: str, table_name: str) -> str:
        return f"{self.out_dir}/{schema_name}_{table_name}"

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            # malformed wire rows (schema-less JSON decodes to null fields)
            # route to a dead-letter dir instead of silently vanishing --
            # the observable version of the reference's skip-malformed
            # behavior (cmd/es_consumer/main.go:66-71)
            malformed = F.col("op").isNull() | F.col("table_name").isNull()
            dead = batch_df.filter(malformed)
            if dead.take(1):
                (
                    dead.write.mode("overwrite")
                    .format(self.fmt)
                    .save(f"{self.out_dir}/_dead_letter/ingest_batch={epoch_id}")
                )
            good = batch_df.filter(~malformed)
            # distinct (schema, table) pairs: bounded by the number of source
            # tables (a handful), safe to collect -- this is routing metadata,
            # not data.
            pairs = [
                (r["schema_name"], r["table_name"])
                for r in good.select("schema_name", "table_name").distinct().collect()
            ]
            for schema_name, table_name in pairs:
                (
                    good.filter(
                        (F.col("schema_name") == schema_name)
                        & (F.col("table_name") == table_name)
                    )
                    .write.mode("overwrite")  # idempotent replay of this epoch
                    .format(self.fmt)
                    .save(f"{self.table_dir(schema_name, table_name)}/ingest_batch={epoch_id}")
                )
        finally:
            batch_df.unpersist()


def read_dead_letters(spark: SparkSession, out_dir: str, fmt: str | None = None) -> DataFrame:
    fmt = resolve_format(out_dir, fmt)
    path = f"{out_dir.rstrip('/')}/_dead_letter"
    if not os.path.isdir(path):
        return spark.createDataFrame([], env.ENVELOPE_SCHEMA)
    return (
        spark.read.schema(env.ENVELOPE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .format(fmt)
        .load(path)
    )


def compact_event_log(
    spark: SparkSession, out_dir: str, schema_name: str, table_name: str, fmt: str | None = None
) -> int:
    """Rewrite a table's event log to its latest-state-relevant suffix: one
    max-LSN event per live key (deletes below the max are still dropped via
    latest-state semantics at read time; truncate fences apply first). The
    CDC analogue of a rollup/compaction job -- bounds log growth so
    latest_state_view cost stays O(keys), not O(history).

    Returns the number of events retained. Writes a ``compacted`` snapshot
    dir and removes the per-epoch ingest dirs it subsumes."""
    import shutil

    fmt = resolve_format(out_dir, fmt)
    log = read_event_log(spark, out_dir, schema_name, table_name, fmt)
    trunc_lsn = (
        log.filter(F.col("op") == "truncate")
        .agg(F.coalesce(F.max("lsn"), F.lit(-1)).alias("m"))
        .collect()[0]["m"]
    )
    keep = (
        log.filter((F.col("op") != "truncate") & (F.col("lsn") > F.lit(trunc_lsn)))
        .groupBy("key")
        .agg(
            F.max_by(
                F.struct("op", "schema_name", "table_name", "lsn", "ts", "before", "after"),
                F.col("lsn"),
            ).alias("r")
        )
        .select("key", "r.*")
        .select(*[f.name for f in env.ENVELOPE_SCHEMA.fields])
    )
    table_dir = f"{out_dir.rstrip('/')}/{schema_name}_{table_name}"
    tmp = f"{table_dir}__compacting"
    keep.write.mode("overwrite").format(fmt).save(tmp)
    n = spark.read.schema(env.ENVELOPE_SCHEMA).format(fmt).load(tmp).count()
    shutil.rmtree(table_dir)
    os.makedirs(table_dir)
    os.rename(tmp, f"{table_dir}/compacted")
    return n


def read_event_log(
    spark: SparkSession, out_dir: str, schema_name: str, table_name: str, fmt: str | None = None
) -> DataFrame:
    fmt = resolve_format(out_dir, fmt)
    path = f"{out_dir.rstrip('/')}/{schema_name}_{table_name}"
    if not os.path.isdir(path):
        return spark.createDataFrame([], env.ENVELOPE_SCHEMA)
    return (
        spark.read.schema(env.ENVELOPE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .format(fmt)
        .load(path)
    )


def latest_state_view(
    spark: SparkSession,
    out_dir: str,
    schema_name: str,
    table_name: str,
    schema: T.StructType | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """Current state per key from the event log (X1): keep the max-LSN event
    per key, drop keys whose latest op is delete, erase everything at/below
    the latest truncate. max_by aggregation => map-side partial reduction,
    one shuffle regardless of log length."""
    log = read_event_log(spark, out_dir, schema_name, table_name, fmt)
    trunc_lsn = (
        log.filter(F.col("op") == "truncate")
        .agg(F.coalesce(F.max("lsn"), F.lit(-1)).alias("m"))
        .collect()[0]["m"]
    )  # scalar control value, not data
    rows = log.filter((F.col("op") != "truncate") & (F.col("lsn") > F.lit(trunc_lsn)))
    latest = (
        rows.groupBy("key")
        .agg(
            F.max_by(
                F.struct("op", "schema_name", "table_name", "lsn", "ts", "before", "after"),
                F.col("lsn"),
            ).alias("r")
        )
        .select("key", "r.*")
        .filter(F.col("op") != "delete")
    )
    table_schema = schema or SCHEMAS.get(table_name)
    if table_schema is None:
        return latest
    return env.decode_payload(latest, table_schema)
