"""Incrementally-maintained join view: delta recomputation must equal the
batch join of both latest states after every micro-batch -- through
inserts, dim updates (fan-out to all fact partners), fact join-key moves
(vacating the old slice), and deletes on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.joinview import (
    MaterializedJoinView,
    start_join_view,
)


def _orders(spark, rows, op):
    """rows: (orderkey, custkey, total, lsn)."""
    df = spark.createDataFrame(
        [(o, c, t) for o, c, t, _ in rows],
        "o_orderkey long, o_custkey long, o_total string",
    )
    lsn = {o: l for o, _, _, l in rows}
    m = F.create_map(*[x for o in lsn for x in (F.lit(o), F.lit(lsn[o]))])
    return env.encode(
        df, op=op, schema_name="public", table_name="orders",
        pk_cols=["o_orderkey"], lsn=m[F.col("o_orderkey")],
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def _custs(spark, rows, op):
    """rows: (custkey, name, lsn)."""
    df = spark.createDataFrame(
        [(c, n) for c, n, _ in rows], "c_custkey long, c_name string"
    )
    lsn = {c: l for c, _, l in rows}
    m = F.create_map(*[x for c in lsn for x in (F.lit(c), F.lit(lsn[c]))])
    return env.encode(
        df, op=op, schema_name="public", table_name="customer",
        pk_cols=["c_custkey"], lsn=m[F.col("c_custkey")],
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def _drain(spark, src, state, ckpt):
    stream = spark.readStream.schema(env.ENVELOPE_SCHEMA).json(src)
    sink, q = start_join_view(stream, state, ckpt)
    q.awaitTermination()
    return sink


def _expected(sink):
    """Ground truth: full batch join of the maintained latest states."""
    fact = sink._read("fact").filter(F.col("op") != "delete")
    dim = sink._read("dim").filter(F.col("op") != "delete")
    j = fact.select(
        "key", F.element_at("after", "o_custkey").alias("jk"), "lsn", "after"
    ).join(
        dim.select(
            F.element_at("after", "c_custkey").alias("jk"),
            F.col("after").alias("dim_after"),
        ),
        "jk",
    )
    return {
        (r["key"], r["jk"], r["after"]["o_custkey"], r["dim_after"]["c_name"])
        for r in j.collect()
    }


def _got(sink):
    return {
        (r["key"], r["join_key"], r["after"]["o_custkey"], r["dim_after"]["c_name"])
        for r in sink.view().collect()
    }


def test_join_view_tracks_batch_join_through_all_change_kinds(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))

    # batch 1: two customers, three orders (cust 1 has two)
    _custs(spark, [(1, "ada", 1), (2, "bob", 2)], "insert").write.mode("append").json(src)
    _orders(
        spark, [(10, 1, "a", 3), (11, 1, "b", 4), (12, 2, "c", 5)], "insert"
    ).write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    assert _got(sink) == _expected(sink)
    assert len(_got(sink)) == 3

    # batch 2: dim update fans out to both of cust 1's orders
    _custs(spark, [(1, "ada2", 10)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = _got(sink)
    assert got == _expected(sink)
    assert {g[3] for g in got if g[1] == "1"} == {"ada2"}

    # batch 3: order 11 moves to customer 2 (must vacate cust 1's slice)
    _orders(spark, [(11, 2, "b2", 20)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = _got(sink)
    assert got == _expected(sink)
    assert {g[0] for g in got if g[1] == "2"} == {
        "public.orders:11",
        "public.orders:12",
    }

    # batch 4: delete order 10; delete customer 2 (orders 11, 12 lose their
    # partner and leave the inner-join view)
    _orders(spark, [(10, 1, "a", 30)], "delete").write.mode("append").json(src)
    _custs(spark, [(2, "bob", 31)], "delete").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = _got(sink)
    assert got == _expected(sink)
    assert got == set()

    # batch 5: customer 2 re-inserted with a higher LSN -- its surviving
    # orders re-enter the view
    _custs(spark, [(2, "bob2", 40)], "insert").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = _got(sink)
    assert got == _expected(sink)
    assert {g[0] for g in got} == {"public.orders:11", "public.orders:12"}


def test_join_view_late_event_loses(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    _custs(spark, [(1, "ada", 1)], "insert").write.mode("append").json(src)
    _orders(spark, [(10, 1, "a", 5)], "insert").write.mode("append").json(src)
    _drain(spark, src, state, ckpt)

    # stale fact update (lower LSN) must not change the view
    _orders(spark, [(10, 99, "stale", 2)], "update").write.mode("append").json(src)
    sink = _drain(spark, src, state, ckpt)
    got = _got(sink)
    assert got == _expected(sink)
    assert [g[1] for g in got] == ["1"]


def test_join_view_random_replay_matches_python_reference(spark, tmp_path):
    """Seeded random op soup over BOTH tables, applied in random batch
    splits through the incremental view, must equal a 25-line dict-replay
    reference join at every drain point."""
    import random

    rng = random.Random(1234)
    fact_ref: dict[int, tuple[int, int]] = {}  # orderkey -> (custkey, lsn)
    dim_ref: dict[int, tuple[str, int]] = {}  # custkey -> (name, lsn)
    ops = []  # (table, op, key, payload, lsn)
    lsn = 1
    for _ in range(150):
        r = rng.random()
        if r < 0.5:
            o = rng.randrange(25)
            c = rng.randrange(8)
            kind = "delete" if (r < 0.08 and o in fact_ref) else (
                "update" if o in fact_ref else "insert"
            )
            ops.append(("orders", kind, o, c, lsn))
            if kind == "delete":
                fact_ref.pop(o, None)
            else:
                fact_ref[o] = (c, lsn)
        else:
            c = rng.randrange(8)
            kind = "delete" if (r > 0.95 and c in dim_ref) else (
                "update" if c in dim_ref else "insert"
            )
            ops.append(("customer", kind, c, f"n{lsn}", lsn))
            if kind == "delete":
                dim_ref.pop(c, None)
            else:
                dim_ref[c] = (f"n{lsn}", lsn)
        lsn += 1

    sink = MaterializedJoinView(spark, str(tmp_path / "state"))
    # random batch boundaries (4-6 batches)
    cuts = sorted(rng.sample(range(1, len(ops)), 4))
    batches, lo = [], 0
    for hi in cuts + [len(ops)]:
        batches.append(ops[lo:hi])
        lo = hi
    for epoch, chunk in enumerate(batches):
        envs = []
        for table, kind, key, payload, l in chunk:
            if table == "orders":
                df = spark.createDataFrame(
                    [(key, payload)], "o_orderkey long, o_custkey long"
                )
                envs.append(_orders_one(df, kind, l))
            else:
                df = spark.createDataFrame(
                    [(key, payload)], "c_custkey long, c_name string"
                )
                envs.append(_custs_one(df, kind, l))
        batch = envs[0]
        for e2 in envs[1:]:
            batch = batch.unionByName(e2)
        sink(batch, epoch)

    expected = {
        (f"public.orders:{o}", str(c), dim_ref[c][0])
        for o, (c, _) in fact_ref.items()
        if c in dim_ref
    }
    got = {
        (r["key"], r["join_key"], r["dim_after"]["c_name"])
        for r in sink.view().collect()
    }
    assert got == expected


def _orders_one(df, op, lsn):
    return env.encode(
        df, op=op, schema_name="public", table_name="orders",
        pk_cols=["o_orderkey"], lsn=F.lit(lsn),
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def _custs_one(df, op, lsn):
    return env.encode(
        df, op=op, schema_name="public", table_name="customer",
        pk_cols=["c_custkey"], lsn=F.lit(lsn),
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def test_join_view_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch can replay a batch after a crash (same epoch_id, same
    rows): applying the identical batch twice must leave the stores and
    the view byte-identical -- replayed winners tie on LSN and lose to the
    stored row, and the affected-slice rebuild recomputes the same rows."""
    sink = MaterializedJoinView(spark, str(tmp_path / "state"))
    b0 = _custs(spark, [(1, "ada", 1)], "insert").unionByName(
        _orders(spark, [(10, 1, "a", 2), (11, 1, "b", 3)], "insert")
    )
    sink(b0, 0)
    b1 = _orders(spark, [(10, 1, "a2", 9)], "update")
    sink(b1, 1)
    before = sorted(
        (r["key"], r["join_key"], r["lsn"], r["after"]["o_total"])
        for r in sink.view().collect()
    )
    sink(b1, 1)  # crash-replay of the same epoch
    after = sorted(
        (r["key"], r["join_key"], r["lsn"], r["after"]["o_total"])
        for r in sink.view().collect()
    )
    assert before == after
    assert {x[3] for x in after if x[0] == "public.orders:10"} == {"a2"}


def test_swap_is_pointer_based_single_generation(spark, tmp_path):
    """The store swap must be crash-safe: exactly one live generation per
    store after each epoch, named by an atomically-replaced CURRENT
    pointer, and an epoch replay must never overwrite the generation the
    pointer currently names (it writes a sibling and re-points)."""
    import os

    sink = MaterializedJoinView(spark, str(tmp_path / "state"))
    b0 = _custs(spark, [(1, "ada", 1)], "insert").unionByName(
        _orders(spark, [(10, 1, "a", 2)], "insert")
    )
    sink(b0, 0)
    for store in ("fact", "dim", "view"):
        root = tmp_path / "state" / store
        gens = [d for d in os.listdir(root) if d.startswith("gen_")]
        assert len(gens) == 1, f"{store}: superseded generations not swept: {gens}"
        assert (root / "CURRENT").read_text().strip() == gens[0]
    live_before = (tmp_path / "state" / "fact" / "CURRENT").read_text().strip()
    sink(b0, 0)  # crash-replay of the same epoch
    root = tmp_path / "state" / "fact"
    gens = [d for d in os.listdir(root) if d.startswith("gen_")]
    assert len(gens) == 1
    assert gens[0] != live_before, "replay overwrote the live generation in place"
    assert (root / "CURRENT").read_text().strip() == gens[0]


def test_registered_streaming_queries_leave_no_scratch_dirs(spark, sf_dir):
    """stream_join_view_maintenance and stream_incremental_dedup allocate
    per-invocation scratch state under the system temp dir; rerunning the
    surface must not accumulate band-store/join-view dirs in /tmp, and the
    returned DataFrame must stay usable after cleanup."""
    import glob
    import tempfile

    from change_data_capture_service_spark.streaming.dedup_stream import (
        stream_incremental_dedup,
    )
    from change_data_capture_service_spark.streaming.joinview import (
        stream_join_view_maintenance,
    )

    tmp = tempfile.gettempdir()

    def leftovers():
        return set(glob.glob(f"{tmp}/join_view_*")) | set(
            glob.glob(f"{tmp}/stream_dedup_*")
        )

    base = leftovers()
    jv = stream_join_view_maintenance(spark, sf_dir)
    dd = stream_incremental_dedup(spark, sf_dir)
    assert jv.count() > 0
    assert dd.count() >= 0  # sf0.001 may have no >=0.8 pairs; usable is the point
    assert jv.limit(1).collect() is not None
    assert leftovers() == base


def test_swap_runs_against_hadoop_file_scheme_path(spark, tmp_path):
    """The same sink must run unchanged when state_dir is a Hadoop
    ``file:``-scheme URI: pointer read/replace/sweep route through the
    Hadoop FileSystem API (FileContext.rename OVERWRITE as the atomic
    step), and the maintained view equals the POSIX-path result.
    Crash-replay invariants hold identically: one live generation, replay
    writes a sibling and re-points."""
    import os

    from change_data_capture_service_spark.streaming import statefs

    state = tmp_path / "hstate"
    sink = MaterializedJoinView(spark, f"file:{state}")
    assert isinstance(sink.fs, statefs.HadoopStateFS)

    b0 = _custs(spark, [(1, "ada", 1), (2, "bob", 2)], "insert").unionByName(
        _orders(spark, [(10, 1, "a", 3), (11, 2, "b", 4)], "insert")
    )
    sink(b0, 0)
    b1 = _custs(spark, [(2, "bobby", 5)], "update").unionByName(
        _orders(spark, [(10, 2, "a2", 6)], "update")
    )
    sink(b1, 1)
    got = {
        (r["key"], r["join_key"], r["dim_after"]["c_name"])
        for r in sink.view().collect()
    }
    assert got == {
        ("public.orders:10", "2", "bobby"),
        ("public.orders:11", "2", "bobby"),
    }
    # generation hygiene on the Hadoop route (inspect via plain os -- the
    # URI is the local tree)
    for store in ("fact", "dim", "view"):
        root = state / store
        gens = [d for d in os.listdir(root) if d.startswith("gen_")]
        assert len(gens) == 1, f"{store}: superseded generations not swept: {gens}"
        assert (root / "CURRENT").read_text().strip() == gens[0]
    live_before = (state / "fact" / "CURRENT").read_text().strip()
    sink(b1, 1)  # crash-replay of the live epoch
    gens = [d for d in os.listdir(state / "fact") if d.startswith("gen_")]
    assert len(gens) == 1 and gens[0] != live_before
    assert (state / "fact" / "CURRENT").read_text().strip() == gens[0]


def test_statefs_primitives_hadoop_vs_posix(spark, tmp_path):
    """statefs backend contract: scheme routing, atomic pointer overwrite,
    dir probe, listing, recursive delete -- identical observable behavior
    on both backends."""
    from change_data_capture_service_spark.streaming import statefs

    assert statefs.is_scheme_path("file:/x") and statefs.is_scheme_path(
        "hdfs://nn/x"
    )
    assert not statefs.is_scheme_path(str(tmp_path))

    hfs = statefs.for_path(spark, f"file:{tmp_path}")
    pfs = statefs.for_path(spark, str(tmp_path))
    assert isinstance(hfs, statefs.HadoopStateFS)
    assert isinstance(pfs, statefs.PosixStateFS)

    ptr = f"file:{tmp_path}/CURRENT"
    assert hfs.read_text(ptr) is None
    hfs.write_text_atomic(ptr, "gen_0")
    hfs.write_text_atomic(ptr, "gen_1")  # overwrite of an existing pointer
    assert hfs.read_text(ptr).strip() == "gen_1"
    assert pfs.read_text(f"{tmp_path}/CURRENT").strip() == "gen_1"
    assert not (tmp_path / "CURRENT.tmp").exists()

    (tmp_path / "gen_1" / "sub").mkdir(parents=True)
    assert hfs.is_dir(f"file:{tmp_path}/gen_1")
    assert not hfs.is_dir(f"file:{tmp_path}/absent")
    assert not hfs.is_dir(ptr)  # a file is not a dir
    assert set(hfs.list_names(f"file:{tmp_path}")) == {"CURRENT", "gen_1"}
    hfs.delete(f"file:{tmp_path}/gen_1")
    assert not (tmp_path / "gen_1").exists()
    hfs.delete(f"file:{tmp_path}/absent")  # best-effort, no raise
