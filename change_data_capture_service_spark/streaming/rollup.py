"""Continuously-maintained hourly rollup (the "continuous aggregate" /
hypertable-rollup shape): an additive aggregate table kept current by the
change stream instead of recomputed from the event log.

``rollup_time_grains`` (timeseries.py) is the batch ladder; this is its
incremental twin. The reference's consumers get this from Kibana
re-aggregating the ES index on every dashboard refresh -- O(index) per
view. Here each micro-batch reduces to per-(table, hour) partial states
(count + exact integer-cents sum), and reads merge the partials -- O(batch)
per update, O(|groups| x |epochs|) per read, never O(history).

Correctness under at-least-once replay: partials are keyed BY EPOCH
(``partials/epoch=N``, written with per-epoch overwrite). A replayed
micro-batch rewrites its own epoch directory rather than double-adding --
the same epoch-idempotence discipline as the routed sink
(``streaming/sink.py``). Deletes subtract (count -1, sum -cents), so the
rollup tracks the LIVE table, not arrival traffic; updates contribute
after-minus-before. ``compact()`` folds all epoch partials into one base
partial -- additivity means fold order is irrelevant -- and records the
highest epoch folded in a ``_compacted_through`` marker; ``__call__``
drops replayed epochs at or below that watermark, so a crash between a
partial write and the streaming-checkpoint commit cannot double-add an
epoch that compaction already absorbed into the base.

At 100 TB: partial-agg states are |tables| x |hours| rows per epoch --
dashboard-scale regardless of event volume; the read-side merge is a
partial agg over those states. This is exactly the mergeable-summaries
property the sketch rollups (agg_hll_rollup) rely on, applied to exact
count/sum.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("hour", T.TimestampType(), True),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("sum_cents", T.LongType(), True),
    ]
)


def _batch_partials(batch_df: DataFrame, ts_field: str, value_field: str) -> DataFrame:
    """Reduce one envelope micro-batch to additive per-(table, hour)
    deltas. Inserts/snapshots add their after-image; deletes subtract
    their before-image; updates do both (value moves between hours if the
    row's timestamp changed)."""
    after_ts = F.element_at(F.col("after"), ts_field).cast("timestamp")
    before_ts = F.element_at(F.col("before"), ts_field).cast("timestamp")
    after_cents = (
        F.element_at(F.col("after"), value_field).cast("decimal(18,2)") * 100
    ).cast("long")
    before_cents = (
        F.element_at(F.col("before"), value_field).cast("decimal(18,2)") * 100
    ).cast("long")

    adds = (
        batch_df.filter(F.col("op").isin("snapshot", "insert", "update"))
        .select(
            "schema_name",
            "table_name",
            F.date_trunc("hour", after_ts).alias("hour"),
            F.lit(1).cast("long").alias("d_rows"),
            F.coalesce(after_cents, F.lit(0)).alias("d_cents"),
        )
    )
    subs = (
        batch_df.filter(F.col("op").isin("delete", "update"))
        .filter(F.col("before").isNotNull())
        .select(
            "schema_name",
            "table_name",
            F.date_trunc("hour", before_ts).alias("hour"),
            F.lit(-1).cast("long").alias("d_rows"),
            (-F.coalesce(before_cents, F.lit(0))).alias("d_cents"),
        )
    )
    return (
        adds.unionByName(subs)
        .groupBy("schema_name", "table_name", "hour")
        .agg(
            F.sum("d_rows").cast("long").alias("n_rows"),
            F.sum("d_cents").cast("long").alias("sum_cents"),
        )
    )


class MaterializedRollup:
    """foreachBatch sink maintaining the hourly rollup incrementally."""

    def __init__(
        self,
        spark: SparkSession,
        rollup_dir: str,
        *,
        ts_field: str = "ts",
        value_field: str = "value",
    ):
        self.spark = spark
        self.rollup_dir = rollup_dir.rstrip("/")
        self.ts_field = ts_field
        self.value_field = value_field

    def _partials_dir(self) -> str:
        return f"{self.rollup_dir}/partials"

    def _marker_path(self) -> str:
        return f"{self.rollup_dir}/_compacted_through"

    def _compacted_through(self) -> int:
        try:
            with open(self._marker_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self._compacted_through():
            # this epoch's contribution already lives inside the compacted
            # base (epoch=-1); re-writing it would double-add on replay
            return
        partials = _batch_partials(batch_df, self.ts_field, self.value_field)
        # epoch-keyed overwrite = at-least-once replay rewrites, never
        # double-adds
        partials.write.mode("overwrite").parquet(
            f"{self._partials_dir()}/epoch={epoch_id}"
        )

    # -- reading ------------------------------------------------------------
    def _read_partials(self) -> DataFrame:
        pdir = self._partials_dir()
        if not os.path.isdir(pdir):
            return self.spark.createDataFrame([], PARTIAL_SCHEMA)
        return (
            self.spark.read.schema(PARTIAL_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(pdir)
        )

    def current(
        self, schema_name: str | None = None, table_name: str | None = None
    ) -> DataFrame:
        """The merged rollup: hour, live row count, exact value sum."""
        df = self._read_partials()
        if schema_name is not None:
            df = df.filter(F.col("schema_name") == schema_name)
        if table_name is not None:
            df = df.filter(F.col("table_name") == table_name)
        return (
            df.groupBy("schema_name", "table_name", "hour")
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("sum_cents").cast("long").alias("sum_cents"),
            )
            .filter(F.col("n_rows") != 0)
            .withColumn(
                "sum_value", (F.col("sum_cents").cast("double") / 100)
            )
        )

    def compact(self) -> None:
        """Fold every epoch partial into one base partial (additive merge
        is order-free). Bounds the read-side file count exactly like
        ``compact_event_log`` bounds the changelog. Records the highest
        epoch folded in the ``_compacted_through`` marker BEFORE deleting
        the epoch directories, so an at-least-once replay of a folded
        epoch (crash between foreachBatch and checkpoint commit) is
        dropped by ``__call__`` instead of double-added."""
        merged = (
            self._read_partials()
            .groupBy("schema_name", "table_name", "hour")
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("sum_cents").cast("long").alias("sum_cents"),
            )
        )
        pdir = self._partials_dir()
        folded = [
            int(d.split("=", 1)[1])
            for d in (os.listdir(pdir) if os.path.isdir(pdir) else [])
            if d.startswith("epoch=")
        ]
        hi = max([e for e in folded if e >= 0], default=self._compacted_through())
        base = f"{self.rollup_dir}/base_next"
        merged.select(*[f.name for f in PARTIAL_SCHEMA.fields]).write.mode(
            "overwrite"
        ).parquet(base)
        import shutil

        with open(self._marker_path(), "w") as f:
            f.write(str(hi))
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        os.makedirs(pdir, exist_ok=True)
        os.replace(base, f"{pdir}/epoch=-1")


def start_rollup(
    envelope_stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    *,
    ts_field: str = "ts",
    value_field: str = "value",
    available_now: bool = True,
):
    """Attach a MaterializedRollup to an envelope stream."""
    sink = MaterializedRollup(
        envelope_stream.sparkSession,
        rollup_dir,
        ts_field=ts_field,
        value_field=value_field,
    )
    writer = envelope_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return sink, writer.start()


from ..catalog import load_table  # noqa: E402  (registered-query deps)
from ..registry import register  # noqa: E402
from . import envelope as _env  # noqa: E402


@register(
    "stream_rollup_maintenance",
    tags=("streaming", "timeseries", "cdc"),
    oracle="""
    WITH fin AS (
      SELECT event_id, ts, try_cast(value AS DECIMAL(18,2)) AS v
      FROM events
      WHERE try_cast(value AS DECIMAL(18,2)) IS NOT NULL
    ),
    final AS (
      SELECT ts, CASE WHEN event_id % 100 = 13 THEN v + 1.00 ELSE v END AS v
      FROM fin WHERE event_id % 100 <> 7
    )
    SELECT date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(v * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
           round(CAST(sum(CAST(v * 100 AS BIGINT)) AS DOUBLE) / 100, 2)
             AS sum_value
    FROM final GROUP BY date_trunc('hour', ts)
    HAVING count(*) <> 0
    """,
)
def stream_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the continuously-maintained hourly rollup through THREE
    epochs exercising every delta kind -- epoch 0 inserts 90% of events,
    epoch 1 inserts the rest, epoch 2 deletes the %100==7 rows and
    bumps the %100==13 rows by +1.00 (update: after-minus-before) --
    then return the merged rollup. Incremental-maintenance correctness
    IS the oracle: after all deltas apply, the maintained aggregate must
    equal the batch aggregate over the final table state. This registers
    the rollup member of the IVM trilogy the same way
    stream_join_view_maintenance registers the join member (and
    tests/test_rollup.py pins the I/O-scaling claim: incremental work is
    bounded by the arriving batch, recompute by history).

    Values route through DECIMAL(18,2) before encoding so non-finite
    doubles drop out (mirrored in the oracle) and the update's +1.00
    happens in exact decimal -- the envelope's string payload then
    round-trips bit-exactly on both engines.

    Scale: each epoch reduces to |hours| additive partial rows (count +
    integer-cents sum); the read-side merge is a partial agg over
    |hours| x |epochs| rows -- dashboard-scale regardless of event
    volume. See the module docstring for replay/compaction semantics."""
    import shutil as _shutil
    import tempfile

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.expr("try_cast(value AS decimal(18,2))").alias("value"),
    ).filter(F.col("value").isNotNull())

    def enc(df, op, lsn_base, before_cols=None):
        return _env.encode(
            df,
            op=op,
            schema_name="public",
            table_name="events",
            pk_cols=["event_id"],
            lsn=F.col("event_id").cast("long") + lsn_base,
            ts=F.col("ts"),
            before_cols=before_cols,
        )

    scratch = tempfile.mkdtemp(prefix="rollup_maint_")
    try:
        sink = MaterializedRollup(spark, scratch)
        sink(enc(e.filter(F.col("event_id") % 10 != 0), "insert", 0), 0)
        sink(enc(e.filter(F.col("event_id") % 10 == 0), "insert", 10_000_000), 1)
        deletes = enc(e.filter(F.col("event_id") % 100 == 7), "delete", 20_000_000)
        updates = enc(
            e.filter(F.col("event_id") % 100 == 13).select(
                "event_id",
                "ts",
                (F.col("value") + F.lit(1.00).cast("decimal(18,2)")).alias("value"),
                F.col("ts").alias("old_ts"),
                F.col("value").alias("old_value"),
            ),
            "update",
            20_000_000,
            before_cols=["old_ts", "old_value"],
        )
        sink(deletes.unionByName(updates), 2)
        # eager: materialize off the scratch store before the finally deletes it
        return (
            sink.current("public", "events")
            .select(
                "hour",
                "n_rows",
                "sum_cents",
                F.round(F.col("sum_value"), 2).alias("sum_value"),
            )
            .localCheckpoint()
        )
    finally:
        _shutil.rmtree(scratch, ignore_errors=True)
