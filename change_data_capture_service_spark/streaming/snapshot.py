"""Snapshot / backfill (reference R1+R5, ``internal/wal/replicator.go:69-184``).

The reference buffers each whole table in memory (``ReadAll``,
``replicator.go:103``) and publishes one row at a time synchronously. Here
the snapshot is a partitioned parallel scan -> envelope projection -> one
distributed write into the changelog; memory is O(partition), not O(table).

Fence semantics (R5): the reference reads ``pg_current_wal_lsn()`` after
snapshotting so streaming starts with no gap (``replicator.go:167-182``).
The engine's snapshot events carry ``lsn = SNAPSHOT_LSN (0)`` -- strictly
before every change ordinal -- so latest-state compaction (max_by lsn)
automatically prefers any change over the snapshot image, and the returned
fence is the ordinal change events must start above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import PRIMARY_KEYS
from . import envelope as env

SNAPSHOT_LSN = 0


def snapshot_table(
    df: DataFrame,
    *,
    schema_name: str,
    table_name: str,
    pk_cols: list[str] | None = None,
    snapshot_ts: str | None = None,
) -> DataFrame:
    """Typed table -> snapshot envelope events (op='snapshot', lsn=0)."""
    pk_cols = pk_cols or PRIMARY_KEYS.get(table_name) or [df.columns[0]]
    ts = F.lit(snapshot_ts).cast("timestamp") if snapshot_ts else F.current_timestamp()
    return env.encode(
        df,
        op="snapshot",
        schema_name=schema_name,
        table_name=table_name,
        pk_cols=pk_cols,
        lsn=F.lit(SNAPSHOT_LSN),
        ts=ts,
    )


def write_snapshot(
    spark: SparkSession,
    df: DataFrame,
    changelog_dir: str,
    *,
    schema_name: str,
    table_name: str,
    pk_cols: list[str] | None = None,
    snapshot_ts: str | None = None,
    fmt: str = "json",
) -> int:
    """Snapshot a table into the changelog (the reference publishes snapshot
    events to the same Kafka topic the stream uses, ``replicator.go:160-164``
    -- one ordered log for both). Returns the fence LSN: change events must
    be appended with lsn > fence."""
    from ..catalog import spread

    # bulk one-time op: spread a few-partition source across cores so the
    # envelope encode + write (and the downstream stream read of the files
    # produced here) run parallel instead of single-task
    if df.rdd.getNumPartitions() < df.sparkSession.sparkContext.defaultParallelism:
        df = spread(df)
    events = snapshot_table(
        df,
        schema_name=schema_name,
        table_name=table_name,
        pk_cols=pk_cols,
        snapshot_ts=snapshot_ts,
    )
    events.write.mode("append").format(fmt).save(changelog_dir)
    return SNAPSHOT_LSN
