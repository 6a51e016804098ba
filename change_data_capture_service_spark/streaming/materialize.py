"""Continuously-materialized latest-state table (R22 "done right",
incremental form).

``latest_state_view`` recomputes current state from the whole event log;
``MaterializedState`` instead maintains a compacted current-state parquet
incrementally: each micro-batch reduces to its per-key max-LSN events and
MERGEs into the stored state (emulated, no Delta in this image, as
anti-join + union -- the guide's canonical CDC/SCD shape). Work per batch
is O(batch + |state|) with one small shuffle; the event log never has to
be replayed.

Delete handling: tombstones are *kept* in the state table (op='delete'
rows) so late lower-LSN events cannot resurrect a deleted key; readers
filter them via ``current()``. Truncate control events clear all rows at or
below the fence for that table -- and the fence itself is *persisted* as an
op='truncate' control row (key ``_truncate_:<schema>.<table>``), so a late
or replayed event below a truncate seen in an EARLIER batch is still
rejected; an in-batch-only fence would let it resurrect on the next merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import envelope as env

_STATE_COLS = ["key", "op", "schema_name", "table_name", "lsn", "ts", "before", "after"]


class MaterializedState:
    """foreachBatch sink maintaining current-state-per-key incrementally."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")

    # -- reading ------------------------------------------------------------
    def _read_state(self) -> DataFrame:
        live = f"{self.state_dir}/live"
        if not os.path.isdir(live):
            return self.spark.createDataFrame([], env.ENVELOPE_SCHEMA)
        return self.spark.read.schema(env.ENVELOPE_SCHEMA).parquet(live)

    def current(self, schema_name: str | None = None, table_name: str | None = None) -> DataFrame:
        """Live rows (tombstones and truncate-fence control rows filtered)."""
        df = self._read_state().filter(~F.col("op").isin("delete", "truncate"))
        if schema_name is not None:
            df = df.filter(F.col("schema_name") == schema_name)
        if table_name is not None:
            df = df.filter(F.col("table_name") == table_name)
        return df

    # -- the merge ----------------------------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        # 1. reduce the batch to per-key winners (tiny: one row per touched key)
        batch_df = batch_df.filter(F.col("op").isNotNull() & F.col("key").isNotNull())
        winners = (
            batch_df.filter(F.col("op") != "truncate")
            .groupBy("key")
            .agg(
                F.max_by(
                    F.struct(*[c for c in _STATE_COLS if c != "key"]), F.col("lsn")
                ).alias("r")
            )
            .select("key", "r.*")
        )
        stored = self._read_state()
        # stored truncate fences live ON as control rows -- a fence from any
        # earlier batch keeps rejecting late events forever, not just within
        # the batch that carried the truncate
        state = stored.filter(F.col("op") != "truncate")
        fences = (
            stored.filter(F.col("op") == "truncate")
            .select("schema_name", "table_name", "lsn", "ts")
            .unionByName(
                batch_df.filter(F.col("op") == "truncate").select(
                    "schema_name", "table_name", "lsn", "ts"
                )
            )
            .groupBy("schema_name", "table_name")
            .agg(F.max("lsn").alias("trunc_lsn"), F.max("ts").alias("trunc_ts"))
        )

        # 2. MERGE emulation: keep state rows not superseded, union winners
        #    that advance their key's LSN (late lower-LSN events lose)
        w = winners.select(
            F.col("key").alias("w_key"), F.col("lsn").alias("w_lsn")
        )
        kept = (
            state.join(w, state.key == w.w_key, "left")
            .filter(F.col("w_key").isNull() | (F.col("lsn") >= F.col("w_lsn")))
            .select(*_STATE_COLS)
        )
        s = state.select(F.col("key").alias("s_key"), F.col("lsn").alias("s_lsn"))
        advancing = (
            winners.join(s, winners.key == s.s_key, "left")
            .filter(F.col("s_key").isNull() | (F.col("lsn") > F.col("s_lsn")))
            .select(*_STATE_COLS)
        )
        merged = kept.unionByName(advancing)

        # 3. apply truncate fences (drop rows at/below the fence per table;
        #    fences is tiny -- one row per truncated table -- so broadcast)
        t = fences.select(
            F.col("schema_name").alias("t_schema"), F.col("table_name").alias("t_table"),
            "trunc_lsn",
        )
        merged = (
            merged.join(
                F.broadcast(t),
                (merged.schema_name == t.t_schema) & (merged.table_name == t.t_table),
                "left",
            )
            .filter(F.col("trunc_lsn").isNull() | (F.col("lsn") > F.col("trunc_lsn")))
            .select(*_STATE_COLS)
        )
        # persist the fences themselves as control rows (filtered by current())
        controls = fences.select(
            F.lit("truncate").alias("op"),
            "schema_name",
            "table_name",
            F.col("trunc_lsn").alias("lsn"),
            F.col("trunc_ts").alias("ts"),
            F.concat(
                F.lit("_truncate_:"), F.col("schema_name"), F.lit("."), F.col("table_name")
            ).alias("key"),
            F.lit(None).cast(env.PAYLOAD_TYPE).alias("before"),
            F.lit(None).cast(env.PAYLOAD_TYPE).alias("after"),
        ).select(*_STATE_COLS)
        merged = merged.unionByName(controls)

        # 4. atomic swap: write next generation, then promote (the parquet
        #    stand-in for a transactional MERGE commit)
        nxt = f"{self.state_dir}/gen_{epoch_id}"
        merged.write.mode("overwrite").parquet(nxt)
        live = f"{self.state_dir}/live"
        import shutil

        if os.path.isdir(live):
            shutil.rmtree(live)
        os.replace(nxt, live)


def start_materialized(
    envelope_stream: DataFrame, state_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Attach MaterializedState to an envelope stream."""
    sink = MaterializedState(envelope_stream.sparkSession, state_dir)
    writer = (
        envelope_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return sink, writer.start()
