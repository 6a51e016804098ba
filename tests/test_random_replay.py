"""Randomized CDC replay: a seeded random op sequence applied through the
full pipeline must equal a plain dict replay (SURVEY.md §5 strategy (3) at
adversarial scale: interleaved inserts/updates/deletes/truncates over many
keys, multiple drain cycles)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.pipeline import CdcPipeline


def _apply_in_python(ops):
    """Reference semantics in 20 lines of python."""
    state: dict[int, tuple] = {}
    for op, key, payload, lsn in ops:
        if op == "truncate":
            state = {}
        elif op == "delete":
            state.pop(key, None)
        else:  # insert/update: last-writer-wins by log order (lsn ascending)
            state[key] = payload
    return state


def test_random_op_sequence_replays_identically(spark, tmp_path):
    rng = random.Random(42)
    keys = list(range(30))
    ops = []
    lsn = 1
    live = set()
    for _ in range(200):
        r = rng.random()
        if r < 0.02 and ops:
            ops.append(("truncate", None, None, lsn))
            live = set()
        elif r < 0.25 and live:
            k = rng.choice(sorted(live))
            ops.append(("delete", k, None, lsn))
            live.discard(k)
        elif r < 0.6 and live:
            k = rng.choice(sorted(live))
            ops.append(("update", k, (k, f"v{lsn}"), lsn))
        else:
            k = rng.choice(keys)
            ops.append(("insert", k, (k, f"v{lsn}"), lsn))
            live.add(k)
        lsn += 1

    pipe = CdcPipeline(
        spark,
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # register the table in the relation registry (no snapshot in this test)
    pipe.catalog["kv"] = spark.createDataFrame([], "id long, val string").schema

    # write the ops in several chunks with drains in between (multiple
    # micro-batch epochs, resume from checkpoint each time). Envelopes are
    # built in bulk per chunk -- encode() itself is covered elsewhere.
    def chunk_to_envelopes(chunk_ops):
        rows = []
        for op, key, payload, l in chunk_ops:
            if op == "truncate":
                rows.append((op, None, None, l))
            else:
                rows.append((op, key, payload[1] if payload else None, l))
        raw = spark.createDataFrame(rows, "op string, id long, val string, lsn long")
        payload_map = F.map_from_arrays(
            F.array(F.lit("id"), F.lit("val")),
            F.array(F.col("id").cast("string"), F.col("val")),
        )
        return raw.select(
            "op",
            F.lit("public").alias("schema_name"),
            F.lit("kv").alias("table_name"),
            "lsn",
            F.lit("2024-04-01 00:00:00").cast("timestamp").alias("ts"),
            F.when(
                F.col("op") != "truncate",
                F.concat(F.lit("public.kv:"), F.col("id").cast("string")),
            ).alias("key"),
            F.lit(None).cast(env.PAYLOAD_TYPE).alias("before"),
            F.when(F.col("op").isin("insert", "update"), payload_map).alias("after"),
        )

    chunk = len(ops) // 4 + 1
    for i in range(0, len(ops), chunk):
        chunk_to_envelopes(ops[i : i + chunk]).write.mode("append").json(pipe.changelog_dir)
        pipe.run_available()

    want = _apply_in_python(ops)
    got_rows = pipe.latest_state("public", "kv").collect()
    got = {r["id"]: (r["id"], r["val"]) for r in got_rows}
    assert got == want, f"replay diverged: extra={set(got) - set(want)} missing={set(want) - set(got)}"


# ---------------------------------------------------------------------------
# connected_components vs a union-find oracle on random graphs
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from change_data_capture_service_spark.operators.dedup import connected_components


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a sequential union-find on
    arbitrary small graphs -- including chains near the round bound, cycles,
    self-parallel edges, and disconnected pieces."""
    pairs = spark.createDataFrame(edges, ["doc_id_a", "doc_id_b"])
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == _union_find_components(edges)


def test_random_merge_upsert_equals_dict_replay(spark):
    """cdc_merge_upsert semantics under random logs: for ANY split point,
    merging the compacted delta onto the base state must equal replaying
    the whole log in one pass (delete = 'error'-typed final op)."""
    import random as _random

    from pyspark.sql import functions as F

    rng = _random.Random(7)
    rows = []
    for lsn in range(1, 301):
        key = rng.randrange(25)
        op = rng.choice(["signup", "click", "view", "purchase", "error"])
        rows.append((lsn, key, op, float(lsn)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, value double")

    def dict_replay(upto_rows):
        state = {}
        for lsn, key, op, val in sorted(upto_rows):
            if op == "error":
                state.pop(key, None)
            else:
                state[key] = (val, lsn)
        return state

    for split in (50, 150, 250):
        base = (
            df.filter(F.col("event_id") < split)
            .groupBy("user_id")
            .agg(F.max_by("value", "event_id").alias("b_value"), F.max("event_id").alias("b_lsn"))
            .select(F.col("user_id").alias("bu"), "b_value", "b_lsn")
        )
        delta = (
            df.filter(F.col("event_id") >= split)
            .groupBy("user_id")
            .agg(
                F.max_by("event_type", "event_id").alias("op_type"),
                F.max_by("value", "event_id").alias("d_value"),
                F.max("event_id").alias("d_lsn"),
            )
            .select(F.col("user_id").alias("du"), "op_type", "d_value", "d_lsn")
        )
        joined = base.join(delta, F.col("bu") == F.col("du"), "full_outer")
        no_delta = F.col("du").isNull()
        merged = joined.filter(no_delta | (F.col("op_type") != "error")).select(
            F.coalesce(F.col("bu"), F.col("du")).alias("user_id"),
            F.when(no_delta, F.col("b_value")).otherwise(F.col("d_value")).alias("value"),
            F.when(no_delta, F.col("b_lsn")).otherwise(F.col("d_lsn")).alias("lsn"),
        )
        got = {r.user_id: (r.value, r.lsn) for r in merged.collect()}

        # NOTE the deliberate semantic: the merge applies a COMPACTED delta
        # (only each key's final op), so a base key deleted mid-batch but
        # absent from the final compaction... cannot happen: compaction is
        # per-key max_by, every touched key appears exactly once. The
        # replay twin therefore compacts identically:
        want = {}
        base_state = dict_replay([r for r in rows if r[0] < split])
        for k, v in base_state.items():
            want[k] = v
        touched = {}
        for lsn, key, op, val in sorted(r for r in rows if r[0] >= split):
            touched[key] = (op, val, lsn)
        for k, (op, val, lsn) in touched.items():
            if op == "error":
                want.pop(k, None)
            else:
                want[k] = (val, lsn)
        assert got == want, f"split={split}"
