"""Incrementally-maintained JOIN view over two CDC streams.

The reference ships change events to Elasticsearch and leaves joins to
query time (`cmd/es_consumer/main.go` indexes each table separately); any
consumer that needs `orders ⋈ customer` must either join per query or
rebuild the join from scratch per refresh. ``MaterializedJoinView`` is the
incremental-view-maintenance form: it maintains BOTH sides' latest state
AND the equi-join result continuously, recomputing only the join-key
partitions a micro-batch actually touched -- the textbook delta rule for
inner equi-joins (dV = dF ⋈ D ∪ F ⋈ dD, implemented as
delete-affected-keys + re-join-affected-keys so updates and deletes fall
out of the same path as inserts).

Per-batch work is O(batch + |state of affected keys| + |view slice of
affected keys|): the affected-key set is one narrow column from the
batch's winners (plus the PREVIOUS fact rows of updated facts, so a row
whose join key CHANGES vacates its old partner's slice), broadcast into
semi/anti joins against the stores. The full view is never rebuilt.

At 100 TB: store both sides and the view bucketed by the join key --
every semi/anti join and the rebuild join then co-locate on the bucket
spec with zero shuffles (the ``tests/test_bucketing.py`` layout); the
affected-key broadcast is bounded by batch size, not corpus size.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import envelope as env
from . import statefs

_STATE_COLS = ["key", "op", "schema_name", "table_name", "lsn", "ts", "before", "after"]


class MaterializedJoinView:
    """foreachBatch sink maintaining fact-latest, dim-latest, and their
    inner equi-join, all incrementally.

    ``fact_table`` / ``dim_table`` name the envelope streams (matched on
    ``table_name``); ``fact_join_col`` / ``dim_key_col`` are payload field
    names inside the ``after`` map (the dim's join side is its primary
    key, already the envelope key -- passing the column keeps the join
    explicit)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        fact_table: str = "orders",
        dim_table: str = "customer",
        fact_join_col: str = "o_custkey",
        dim_key_col: str = "c_custkey",
    ):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.fs = statefs.for_path(spark, self.state_dir)
        self.fact_table = fact_table
        self.dim_table = dim_table
        self.fact_join_col = fact_join_col
        self.dim_key_col = dim_key_col

    # -- storage ------------------------------------------------------------
    # Generation dirs + an atomically-replaced CURRENT pointer file. The
    # swap order is: (1) write gen_<epoch> in full, (2) atomically replace
    # the pointer, (3) sweep superseded generations. A crash at any point
    # leaves a readable store: before (2) the old generation stays live;
    # after (2) the new one is live and at worst an orphan gen dir
    # remains, which the next successful swap's sweep removes.
    # The three steps route through ``statefs``: bare local paths use
    # fsync+os.replace (rename(2)); scheme'd URIs (file:, hdfs:, s3a:)
    # use the Hadoop FileSystem API with
    # FileContext.rename(..., Rename.OVERWRITE) as the atomic step --
    # so the same sink runs unchanged against an HDFS state_dir.

    def _current(self, name: str) -> str | None:
        raw = self.fs.read_text(f"{self.state_dir}/{name}/CURRENT")
        if raw is None:
            return None
        path = f"{self.state_dir}/{name}/{raw.strip()}"
        return path if self.fs.is_dir(path) else None

    def _read(self, name: str) -> DataFrame:
        cur = self._current(name)
        if cur is None:
            return self.spark.createDataFrame([], env.ENVELOPE_SCHEMA)
        return self.spark.read.schema(env.ENVELOPE_SCHEMA).parquet(cur)

    def _swap_in(self, name: str, df: DataFrame, epoch_id: int) -> None:
        gen = f"gen_{epoch_id}"
        root = f"{self.state_dir}/{name}"
        cur = self._current(name)
        if cur is not None and posixpath.basename(cur) == gen:
            # epoch replay: never overwrite the live generation in place
            gen = f"gen_{epoch_id}_r"
        df.write.mode("overwrite").parquet(f"{root}/{gen}")
        self.fs.write_text_atomic(f"{root}/CURRENT", gen)
        for d in self.fs.list_names(root):
            if d.startswith("gen_") and d != gen:
                self.fs.delete(f"{root}/{d}")

    def view(self) -> DataFrame:
        """The maintained join result: one row per live fact row whose join
        key has a live dim partner; fact payload + dim payload maps."""
        cur = self._current("view")
        if cur is None:
            return self.spark.createDataFrame(
                [], "key string, join_key string, lsn long, after map<string,string>, dim_after map<string,string>"
            )
        return self.spark.read.parquet(cur)

    # -- the delta maintenance ----------------------------------------------
    def _winners(self, batch_df: DataFrame, table: str) -> DataFrame:
        return (
            batch_df.filter(
                (F.col("table_name") == table)
                & F.col("op").isin("insert", "update", "delete")
                & F.col("key").isNotNull()
            )
            .groupBy("key")
            .agg(
                F.max_by(
                    F.struct(*[c for c in _STATE_COLS if c != "key"]), F.col("lsn")
                ).alias("r")
            )
            .select("key", "r.*")
        )

    @staticmethod
    def _merge(state: DataFrame, winners: DataFrame) -> DataFrame:
        """Anti-join/union MERGE: winners advance their key's LSN, late
        lower-LSN events lose (the MaterializedState shape, tombstones
        kept)."""
        w = winners.select(F.col("key").alias("w_key"), F.col("lsn").alias("w_lsn"))
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
        return kept.unionByName(advancing)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        fact_w = self._winners(batch_df, self.fact_table)
        dim_w = self._winners(batch_df, self.dim_table)

        fact_prev = self._read("fact")
        dim_prev = self._read("dim")

        # affected join keys: new fact join keys + the PREVIOUS join key of
        # every touched fact row (a fact whose join key changed must vacate
        # its old slice) + every touched dim key. One narrow column each.
        fj = lambda df: F.element_at(df["after"], self.fact_join_col)
        prev_of_touched = fact_prev.join(
            fact_w.select(F.col("key").alias("t_key")),
            fact_prev.key == F.col("t_key"),
            "left_semi",
        )
        affected = (
            fact_w.select(fj(fact_w).alias("jk"))
            .unionByName(prev_of_touched.select(fj(fact_prev).alias("jk")))
            .unionByName(
                dim_w.select(F.element_at("after", self.dim_key_col).alias("jk"))
            )
            .unionByName(
                dim_w.select(F.element_at("before", self.dim_key_col).alias("jk"))
            )
            .filter(F.col("jk").isNotNull())
            .distinct()
            # eager: must materialize BEFORE the store swap below deletes the
            # previous generation's files this plan reads
            .localCheckpoint()
        )

        fact_state = self._merge(fact_prev, fact_w).localCheckpoint()
        dim_state = self._merge(dim_prev, dim_w).localCheckpoint()
        self._swap_in("fact", fact_state, epoch_id)
        self._swap_in("dim", dim_state, epoch_id)

        # rebuild ONLY the affected slice of the view
        aff = F.broadcast(affected)
        fact_live = fact_state.filter(F.col("op") != "delete")
        dim_live = dim_state.filter(F.col("op") != "delete")
        fact_slice = fact_live.join(
            aff, fj(fact_live) == affected["jk"], "left_semi"
        )
        dim_slice = dim_live.select(
            F.element_at("after", self.dim_key_col).alias("jk"),
            F.col("after").alias("dim_after"),
        ).join(aff, "jk", "left_semi")
        rebuilt = (
            fact_slice.select(
                "key", fj(fact_slice).alias("join_key"), "lsn", "after"
            )
            .join(dim_slice, F.col("join_key") == dim_slice["jk"], "inner")
            .select("key", "join_key", "lsn", "after", "dim_after")
        )
        untouched = self.view().join(
            aff, F.col("join_key") == affected["jk"], "left_anti"
        )
        self._swap_in("view", untouched.unionByName(rebuilt), epoch_id)


def start_join_view(
    envelope_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Attach a MaterializedJoinView to an envelope stream."""
    sink = MaterializedJoinView(envelope_stream.sparkSession, state_dir, **kwargs)
    writer = (
        envelope_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return sink, writer.start()


# registered driver-checked form ------------------------------------------

from ..catalog import load_table  # noqa: E402
from ..registry import register  # noqa: E402


@register(
    "stream_join_view_maintenance",
    tags=("streaming", "join", "cdc"),
    oracle="""
    SELECT 'public.orders:' || CAST(o.o_orderkey AS VARCHAR) AS key,
           CAST(o.o_custkey AS VARCHAR) AS join_key,
           CAST(o.o_orderkey AS BIGINT) AS lsn,
           CAST(round(o.o_totalprice, 2) AS VARCHAR) AS o_total,
           c.c_mktsegment AS c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey <= 2000
    """,
)
def stream_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the incrementally-maintained join view over the orders +
    customer fixtures chopped into two interleaved epochs (customers split
    across BOTH epochs, orders likewise -- so the second epoch exercises
    every delta path: new facts meeting stored dims, new dims unlocking
    stored facts), then return the final view. Incremental-view-
    maintenance correctness IS the oracle: after all deltas apply, the
    maintained view must equal the plain batch join -- the same
    batch-equivalence contract as every X16 streaming operator.

    Scale: per epoch the view recomputes only affected join keys; see the
    module docstring for the bucketed-store layout at 100 TB."""
    import shutil as _shutil
    import tempfile

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).cast("string").alias("o_total"),
        )
    )
    custs = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def env_of(df, table, pk, payload_cols):
        return env.encode(
            df, op="insert", schema_name="public", table_name=table,
            pk_cols=[pk], lsn=F.col(pk).cast("long"),
            ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
        )

    scratch = tempfile.mkdtemp(prefix="join_view_")
    try:
        sink = MaterializedJoinView(spark, scratch)
        # epoch 0: even customers + first half of orders
        e0 = env_of(custs.filter(F.col("c_custkey") % 2 == 0), "customer", "c_custkey", None).unionByName(
            env_of(orders.filter(F.col("o_orderkey") <= 1000), "orders", "o_orderkey", None)
        )
        # epoch 1: odd customers + second half of orders
        e1 = env_of(custs.filter(F.col("c_custkey") % 2 == 1), "customer", "c_custkey", None).unionByName(
            env_of(orders.filter(F.col("o_orderkey") > 1000), "orders", "o_orderkey", None)
        )
        sink(e0, 0)
        sink(e1, 1)
        # eager: materialize off the scratch store before the finally deletes it
        return sink.view().select(
            "key",
            "join_key",
            "lsn",
            F.element_at("after", "o_total").alias("o_total"),
            F.element_at("dim_after", "c_mktsegment").alias("c_mktsegment"),
        ).orderBy("key").localCheckpoint()
    finally:
        _shutil.rmtree(scratch, ignore_errors=True)
