"""Routed idempotent sink (reference R21/R22, ``cmd/es_consumer/main.go:75-95``).

The reference writes one ES document per event, index ``cdc_<schema>_<table>``,
doc-id = LSN (idempotent per-event upsert), with ``refresh=true`` per event
(throughput worst case) and -- a bug -- never commits Kafka offsets on
success. The engine replaces all of that with one ``foreachBatch``:

- dynamic routing: one Hive partition per source table
  (``<out>/ingest/ingest_batch=<epoch>/schema_name=<s>/table_name=<t>/``),
  mirroring the per-table index -- written by ONE ``partitionBy`` job per
  epoch, never a per-table loop;
- idempotence: each micro-batch writes to a deterministic
  ``ingest_batch=<epoch_id>`` directory with mode=overwrite, so a
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

from pyspark.sql import DataFrame, Observation, SparkSession
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


# Routing identifiers become filesystem path components: anything outside
# this set (or empty/NULL) is malformed and goes to the dead letter, which
# both keeps routing unambiguous and blocks path traversal via a crafted
# wire value ('../x', 'a/b').
_SAFE_NAME = r"^[A-Za-z0-9_]+$"


class TableRoutingSink:
    """``foreachBatch`` callable: route envelope micro-batches to per-table
    Hive partitions, idempotently per epoch.

    ONE write job per epoch regardless of how many source tables appear in
    the batch: ``partitionBy(schema_name, table_name)`` fans rows out to
    ``ingest/ingest_batch=<epoch>/schema_name=<s>/table_name=<t>/`` in a
    single pass (the old shape -- collect the distinct pairs, then one
    filtered job per table -- rescans the batch T times and serializes on
    the driver; at many tables x many epochs that loop IS the pipeline's
    critical path). Epoch-dir overwrite keeps at-least-once replays
    idempotent. Dead letters are written unconditionally -- an empty write
    is one cheap no-op task, while probing with ``take(1)`` costs an extra
    job on EVERY batch."""

    def __init__(self, out_dir: str, fmt: str = "json"):
        # fmt: "json" = wire-parity/debuggable (the reference's shape);
        # "parquet"/"orc" = columnar event log for throughput
        if fmt not in SUPPORTED_LOG_FORMATS:
            raise ValueError(f"fmt must be one of {SUPPORTED_LOG_FORMATS}, got {fmt!r}")
        self.out_dir = out_dir.rstrip("/")
        self.fmt = fmt
        write_format_marker(self.out_dir, fmt)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        # malformed wire rows (schema-less JSON decodes to null fields,
        # crafted names would escape the sink dir) route to the ok=false
        # partition instead of silently vanishing -- the observable version
        # of the reference's skip-malformed behavior
        # (cmd/es_consumer/main.go:66-71).
        # NULL-safe: rlike(NULL) is NULL, so the isNull() terms must be
        # present for the OR to collapse to TRUE on null names.
        malformed = (
            F.col("op").isNull()
            | F.col("schema_name").isNull()
            | F.col("table_name").isNull()
            | ~F.col("schema_name").rlike(_SAFE_NAME)
            | ~F.col("table_name").rlike(_SAFE_NAME)
        )
        # ONE pass over the batch: dead letters are just the ok=false
        # partition of the same write (a separate filtered dead-letter write
        # would re-scan every batch a second time). Spark percent-escapes
        # partition values on write, so even a hostile table_name cannot
        # traverse outside the epoch directory.
        (
            batch_df.withColumn("ok", ~malformed)
            .write.mode("overwrite")  # idempotent replay of this epoch
            .partitionBy("ok", "schema_name", "table_name")
            .format(self.fmt)
            .save(f"{self.out_dir}/ingest/ingest_batch={epoch_id}")
        )


def read_dead_letters(spark: SparkSession, out_dir: str, fmt: str | None = None) -> DataFrame:
    """Malformed rows = the ``ok=false`` partition of the ingest log
    (partition-pruned: only dead-letter directories are listed)."""
    fmt = resolve_format(out_dir, fmt)
    ingest = f"{out_dir.rstrip('/')}/ingest"
    if not os.path.isdir(ingest):
        return spark.createDataFrame([], env.ENVELOPE_SCHEMA)
    cols = [f.name for f in env.ENVELOPE_SCHEMA.fields]
    return (
        spark.read.schema(_INGEST_SCHEMA)
        .format(fmt)
        .load(ingest)
        .filter(~F.col("ok"))
        .select(*cols)
    )


def compact_event_log(
    spark: SparkSession, out_dir: str, schema_name: str, table_name: str, fmt: str | None = None
) -> int:
    """Rewrite a table's event log to its latest-state-relevant suffix: one
    max-LSN event per live key, PLUS the max-LSN truncate control event if
    one exists. Keeping the truncate row makes the fence durable: without
    it, a late/replayed event with lsn below an already-applied truncate
    would re-enter state on the next read -- the resurrection class the
    delete-tombstone design guards against. The CDC analogue of a
    rollup/compaction job -- bounds log growth so latest_state_view cost
    stays O(keys), not O(history).

    Returns the number of events retained (incl. the fence row). Writes a
    ``compacted/<schema>_<table>`` snapshot dir and removes the per-epoch
    ingest partitions it subsumes."""
    import glob
    import shutil

    root = out_dir.rstrip("/")
    fmt = resolve_format(out_dir, fmt)
    log = read_event_log(spark, root, schema_name, table_name, fmt)
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
    if trunc_lsn >= 0:
        fence_row = (
            log.filter((F.col("op") == "truncate") & (F.col("lsn") == F.lit(trunc_lsn)))
            .select(*[f.name for f in env.ENVELOPE_SCHEMA.fields])
            .limit(1)
        )
        keep = keep.unionByName(fence_row)
    comp_dir = f"{root}/compacted/{schema_name}_{table_name}"
    tmp = f"{comp_dir}__compacting"
    # Row count comes from observed metrics on the write itself -- a
    # re-read .count() would be a second full scan of the compacted
    # output in a maintenance path.
    obs = Observation()
    keep.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").format(
        fmt
    ).save(tmp)
    n = int(obs.get["n"])
    # swap in the snapshot, then drop the ingest partitions it subsumes
    if os.path.isdir(comp_dir):
        shutil.rmtree(comp_dir)
    os.makedirs(os.path.dirname(comp_dir), exist_ok=True)
    os.rename(tmp, comp_dir)
    for p in glob.glob(
        f"{root}/ingest/ingest_batch=*/ok=true/schema_name={schema_name}/table_name={table_name}"
    ):
        shutil.rmtree(p)
    return n


# user schema for the partitioned ingest read: envelope fields + the
# partition columns' types (values come from directory names)
_INGEST_SCHEMA = T.StructType(
    list(env.ENVELOPE_SCHEMA.fields)
    + [
        T.StructField("ingest_batch", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), True),
    ]
)


def read_event_log(
    spark: SparkSession, out_dir: str, schema_name: str, table_name: str, fmt: str | None = None
) -> DataFrame:
    """One table's events = its ingest partitions (partition-pruned read:
    only ``schema_name=<s>/table_name=<t>`` directories are listed) plus its
    compacted snapshot, if any."""
    fmt = resolve_format(out_dir, fmt)
    root = out_dir.rstrip("/")
    cols = [f.name for f in env.ENVELOPE_SCHEMA.fields]
    parts = []
    ingest = f"{root}/ingest"
    if os.path.isdir(ingest):
        parts.append(
            spark.read.schema(_INGEST_SCHEMA)
            .format(fmt)
            .load(ingest)
            .filter(
                F.col("ok")
                & (F.col("schema_name") == schema_name)
                & (F.col("table_name") == table_name)
            )
            .select(*cols)
        )
    comp = f"{root}/compacted/{schema_name}_{table_name}"
    if os.path.isdir(comp):
        parts.append(
            spark.read.schema(env.ENVELOPE_SCHEMA).format(fmt).load(comp).select(*cols)
        )
    if not parts:
        return spark.createDataFrame([], env.ENVELOPE_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    # the truncate fence is a 1-row aggregate broadcast against the log --
    # no driver-side collect, so the whole view is ONE job instead of a
    # fence-lookup job followed by the real one
    fence = log.filter(F.col("op") == "truncate").agg(F.max("lsn").alias("trunc_lsn"))
    rows = (
        log.crossJoin(F.broadcast(fence))
        .filter(
            (F.col("op") != "truncate")
            & (F.col("trunc_lsn").isNull() | (F.col("lsn") > F.col("trunc_lsn")))
        )
        .drop("trunc_lsn")
    )
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
