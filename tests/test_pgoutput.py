"""Round-trip tests for the pgoutput binary decode layer against
HAND-CRAFTED byte fixtures built directly from the PostgreSQL protocol
docs (struct.pack literals below, independent of the module's parsers) --
insert / update (with and without old tuple) / delete / truncate, the
'u' unchanged-TOAST placeholder, NULLs, binary-format cells, keepalives,
and the unknown-OID dead-letter path."""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from change_data_capture_service_spark.sources import pgoutput as P

# ---------------------------------------------------------------------------
# Fixture builders: encode pgoutput frames with raw struct.pack (NOT the
# module under test -- it has no encoder, so the parser is exercised
# against independently constructed bytes).
# ---------------------------------------------------------------------------

PG_EPOCH = dt.datetime(2000, 1, 1, tzinfo=dt.timezone.utc)


def us(ts: dt.datetime) -> int:
    return int((ts - PG_EPOCH).total_seconds() * 1_000_000)


def xlog(wal_start: int, inner: bytes, ts: dt.datetime) -> bytes:
    return b"w" + struct.pack(">QQQ", wal_start, wal_start + len(inner), us(ts)) + inner


def cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def relation_msg(oid: int, ns: str, name: str, cols: list[tuple[str, int, bool]]) -> bytes:
    b = b"R" + struct.pack(">i", oid) + cstr(ns) + cstr(name) + b"d"
    b += struct.pack(">h", len(cols))
    for cname, type_oid, is_key in cols:
        b += struct.pack(">B", 1 if is_key else 0) + cstr(cname)
        b += struct.pack(">ii", type_oid, -1)
    return b


def tuple_data(cells: list) -> bytes:
    """cells: None -> 'n', Ellipsis -> 'u', str -> 't', bytes -> 'b'."""
    b = struct.pack(">h", len(cells))
    for c in cells:
        if c is None:
            b += b"n"
        elif c is Ellipsis:
            b += b"u"
        elif isinstance(c, bytes):
            b += b"b" + struct.pack(">i", len(c)) + c
        else:
            enc = str(c).encode()
            b += b"t" + struct.pack(">i", len(enc)) + enc
    return b


def insert_msg(oid: int, cells: list) -> bytes:
    return b"I" + struct.pack(">i", oid) + b"N" + tuple_data(cells)


def update_msg(oid: int, new: list, old: list | None = None, old_kind: bytes = b"O") -> bytes:
    b = b"U" + struct.pack(">i", oid)
    if old is not None:
        b += old_kind + tuple_data(old)
    return b + b"N" + tuple_data(new)


def delete_msg(oid: int, old: list, old_kind: bytes = b"K") -> bytes:
    return b"D" + struct.pack(">i", oid) + old_kind + tuple_data(old)


def truncate_msg(oids: list[int], options: int = 0) -> bytes:
    return b"T" + struct.pack(">iB", len(oids), options) + struct.pack(f">{len(oids)}i", *oids)


def begin_msg(final_lsn: int, ts: dt.datetime, xid: int) -> bytes:
    return b"B" + struct.pack(">QQi", final_lsn, us(ts), xid)


def commit_msg(commit_lsn: int, ts: dt.datetime) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, commit_lsn, commit_lsn + 8, us(ts))


def keepalive(wal_end: int, ts: dt.datetime, reply: bool = False) -> bytes:
    return b"k" + struct.pack(">QQB", wal_end, us(ts), 1 if reply else 0)


TS = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
USERS_OID = 16385
ORDERS_OID = 16402
USERS_COLS = [("id", 23, True), ("email", 25, False), ("bio", 25, False)]


def users_relation() -> bytes:
    return relation_msg(USERS_OID, "public", "users", USERS_COLS)


# ---------------------------------------------------------------------------
# Pure-parser tests (no Spark)
# ---------------------------------------------------------------------------


def test_parse_relation_roundtrip():
    rel = P.parse_relation(users_relation())
    assert rel.relation_id == USERS_OID
    assert (rel.namespace, rel.name) == ("public", "users")
    assert [c.name for c in rel.columns] == ["id", "email", "bio"]
    assert rel.key_columns == ("id",)
    assert rel.columns[0].type_oid == 23 and rel.columns[0].is_key


def test_parse_relation_no_key_falls_back_to_first_column():
    rel = P.parse_relation(relation_msg(1, "s", "t", [("a", 25, False), ("b", 25, False)]))
    assert rel.key_columns == ("a",)


def test_keepalive_parses_and_produces_no_events():
    k = P.parse_keepalive(keepalive(999, TS, reply=True))
    assert k["wal_end"] == 999 and k["reply_requested"]
    assert P.decode_frame(keepalive(999, TS), {}) == []


def test_begin_commit_parse_and_produce_no_events():
    b = P.parse_begin(begin_msg(1000, TS, 42))
    assert b["final_lsn"] == 1000 and b["xid"] == 42 and b["commit_ts"] == TS
    c = P.parse_commit(commit_msg(1000, TS))
    assert c["commit_lsn"] == 1000 and c["end_lsn"] == 1008
    rels = {USERS_OID: P.parse_relation(users_relation())}
    assert P.decode_frame(xlog(10, begin_msg(1000, TS, 42), TS), rels) == []
    assert P.decode_frame(xlog(11, commit_msg(1000, TS), TS), rels) == []


def test_insert_decode_all_cell_kinds():
    """NULL ('n'), unchanged-TOAST ('u'), text ('t'), binary ('b') -- the
    reference's 4-way tag dispatch (replicator.go:346-355)."""
    rels = {USERS_OID: P.parse_relation(users_relation())}
    frame = xlog(500, insert_msg(USERS_OID, ["7", None, Ellipsis]), TS)
    (row,) = P.decode_frame(frame, rels)
    assert row["op"] == "insert"
    assert (row["schema_name"], row["table_name"]) == ("public", "users")
    assert row["lsn"] == 500 and row["ts"] == TS
    assert row["key"] == "public.users:7"
    assert row["before"] is None
    assert row["after"] == {"id": "7", "email": None, "bio": P.UNCHANGED_TOAST}
    # binary cell -> hex string
    frame2 = xlog(501, insert_msg(USERS_OID, ["8", b"\xde\xad", "x"]), TS)
    (row2,) = P.decode_frame(frame2, rels)
    assert row2["after"]["email"] == "dead"


def test_update_with_old_tuple():
    rels = {USERS_OID: P.parse_relation(users_relation())}
    frame = xlog(600, update_msg(USERS_OID, ["7", "new@x", "b"], old=["7", "old@x", "b"]), TS)
    (row,) = P.decode_frame(frame, rels)
    assert row["op"] == "update"
    assert row["before"]["email"] == "old@x"
    assert row["after"]["email"] == "new@x"
    assert row["key"] == "public.users:7"


def test_update_without_old_tuple():
    rels = {USERS_OID: P.parse_relation(users_relation())}
    frame = xlog(601, update_msg(USERS_OID, ["9", "e", "b"]), TS)
    (row,) = P.decode_frame(frame, rels)
    assert row["op"] == "update" and row["before"] is None
    assert row["key"] == "public.users:9"


def test_delete_keys_from_old_tuple():
    rels = {USERS_OID: P.parse_relation(users_relation())}
    frame = xlog(700, delete_msg(USERS_OID, ["7", None, None]), TS)
    (row,) = P.decode_frame(frame, rels)
    assert row["op"] == "delete"
    assert row["after"] is None and row["before"]["id"] == "7"
    assert row["key"] == "public.users:7"


def test_truncate_fans_out_per_relation():
    rels = {
        USERS_OID: P.parse_relation(users_relation()),
        ORDERS_OID: P.parse_relation(relation_msg(ORDERS_OID, "public", "orders", [("id", 23, True)])),
    }
    frame = xlog(800, truncate_msg([USERS_OID, ORDERS_OID], options=1), TS)
    rows = P.decode_frame(frame, rels)
    assert [r["table_name"] for r in rows] == ["users", "orders"]
    assert all(r["op"] == "truncate" and r["lsn"] == 800 for r in rows)


def test_unknown_oid_is_dead_letter_not_drop():
    frame = xlog(900, insert_msg(99999, ["1"]), TS)
    (row,) = P.decode_frame(frame, {})
    assert row["op"] == "unknown" and row["table_name"] == "oid_99999"


def test_null_key_value_uses_no_pk_val_fallback():
    """Reference fallback key when the PK cell is NULL (replicator.go:378)."""
    rels = {USERS_OID: P.parse_relation(users_relation())}
    frame = xlog(901, insert_msg(USERS_OID, [None, "e", "b"]), TS)
    (row,) = P.decode_frame(frame, rels)
    assert row["key"] == "public.users:no_pk_val"


def test_malformed_frames_raise():
    with pytest.raises(P.PgOutputError):
        P.parse_xlogdata(b"z" + b"\x00" * 30)
    with pytest.raises(P.PgOutputError):
        P.decode_frame(xlog(1, b"I" + struct.pack(">i", USERS_OID) + b"Q", TS),
                       {USERS_OID: P.parse_relation(users_relation())})
    with pytest.raises(P.PgOutputError):
        P._parse_tuple_data(struct.pack(">h", 1) + b"z", 0)


# ---------------------------------------------------------------------------
# Spark-side two-pass decode
# ---------------------------------------------------------------------------


def _frame_log() -> list[tuple[int, bytes]]:
    """A realistic interleaved frame log: keepalives, two relations, a
    txn of DML, a truncate, and an unknown-OID insert."""
    orders_rel = relation_msg(ORDERS_OID, "public", "orders", [("oid", 23, True), ("amt", 1700, False)])
    frames = [
        keepalive(10, TS),
        xlog(100, users_relation(), TS),
        xlog(110, orders_rel, TS),
        xlog(120, begin_msg(200, TS, 77), TS),
        xlog(130, insert_msg(USERS_OID, ["1", "a@x", "hello"]), TS),
        xlog(140, insert_msg(USERS_OID, ["2", None, Ellipsis]), TS),
        xlog(150, update_msg(USERS_OID, ["1", "a2@x", "hi"], old=["1", "a@x", "hello"]), TS),
        xlog(160, delete_msg(USERS_OID, ["2", None, None]), TS),
        xlog(170, insert_msg(ORDERS_OID, ["10", "9.99"]), TS),
        xlog(180, commit_msg(200, TS), TS),
        xlog(190, truncate_msg([ORDERS_OID]), TS),
        xlog(195, insert_msg(424242, ["z"]), TS),
        keepalive(200, TS, reply=True),
    ]
    return list(enumerate(frames))


def test_spark_two_pass_decode(spark):
    df = spark.createDataFrame(_frame_log(), P.FRAME_SCHEMA).repartition(4)
    rels = P.collect_relations(df)
    assert set(rels) == {USERS_OID, ORDERS_OID}
    out = P.decode_pgoutput_frames(df, rels).toPandas().sort_values("lsn").reset_index(drop=True)
    assert list(out["op"]) == ["insert", "insert", "update", "delete", "insert", "truncate", "unknown"]
    assert list(out["lsn"]) == [130, 140, 150, 160, 170, 190, 195]
    ins = out.iloc[0]
    assert ins["key"] == "public.users:1" and ins["after"]["bio"] == "hello"
    assert out.iloc[1]["after"]["bio"] == P.UNCHANGED_TOAST
    upd = out.iloc[2]
    assert upd["before"]["email"] == "a@x" and upd["after"]["email"] == "a2@x"
    assert out.iloc[5]["table_name"] == "orders"
    assert out.iloc[6]["op"] == "unknown"
    # ts decodes to the exact microsecond instant on every row
    assert all(t == TS.replace(tzinfo=None) or t == TS for t in out["ts"])


def test_spark_decode_feeds_latest_state(spark):
    """Decoded envelopes compose with the engine's latest-state semantics
    (max_by per key, same plan shape as streaming/sink.latest_state_view):
    the update wins over the insert for key 1; key 2's latest op is the
    delete tombstone."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(_frame_log(), P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).filter("table_name = 'users'")
    latest = (
        out.groupBy("key")
        .agg(F.max_by(F.struct("op", "lsn", "after"), F.col("lsn")).alias("r"))
        .select("key", "r.*")
        .toPandas()
    )
    live = {r["key"]: r for _, r in latest.iterrows()}
    assert live["public.users:1"]["op"] == "update"
    assert live["public.users:1"]["after"]["email"] == "a2@x"
    assert live["public.users:2"]["op"] == "delete"


# ---------------------------------------------------------------------------
# Schema evolution: a mid-stream Relation re-announcement (ALTER TABLE)
# must split the log into regimes -- each DML frame decodes against the
# schema in force AT ITS POSITION, not whichever registration was last.
# The reference silently re-caches (replicator.go:320-336), which mis-zips
# pre-alter frames; the versioned registry is the fix.
# ---------------------------------------------------------------------------

EVO_OID = 17000


def _evolving_log() -> list[tuple[int, bytes]]:
    v1 = relation_msg(EVO_OID, "public", "users", [("id", 20, True), ("name", 25, False)])
    # ALTER TABLE users ADD COLUMN email
    v2 = relation_msg(
        EVO_OID, "public", "users",
        [("id", 20, True), ("name", 25, False), ("email", 25, False)],
    )
    # ALTER TABLE users RENAME name TO full_name
    v3 = relation_msg(
        EVO_OID, "public", "users",
        [("id", 20, True), ("full_name", 25, False), ("email", 25, False)],
    )
    frames = [
        xlog(100, v1, TS),
        xlog(110, insert_msg(EVO_OID, ["1", "ada"]), TS),
        xlog(120, v2, TS),
        xlog(130, insert_msg(EVO_OID, ["2", "bob", "b@x"]), TS),
        xlog(140, v3, TS),
        xlog(150, insert_msg(EVO_OID, ["3", "carol", "c@x"]), TS),
    ]
    return list(enumerate(frames))


def test_mid_stream_relation_widens_envelope(spark):
    """insert -> ALTER ADD COLUMN (new Relation frame) -> insert -> ALTER
    RENAME -> insert: each insert's after-map must carry exactly its
    regime's column names; the union view is the widened envelope."""
    df = spark.createDataFrame(_evolving_log(), P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    assert list(out["op"]) == ["insert", "insert", "insert"]
    assert dict(out.iloc[0]["after"]) == {"id": "1", "name": "ada"}
    assert dict(out.iloc[1]["after"]) == {"id": "2", "name": "bob", "email": "b@x"}
    assert dict(out.iloc[2]["after"]) == {
        "id": "3", "full_name": "carol", "email": "c@x",
    }
    # keys survive every version (id stays the replica identity)
    assert list(out["key"]) == [
        "public.users:1", "public.users:2", "public.users:3",
    ]


def test_versioned_decode_is_partitioning_invariant(spark):
    """The regime resolution rides the seq column, not arrival order, so
    an arbitrarily shuffled frame log decodes identically."""
    df = spark.createDataFrame(_evolving_log(), P.FRAME_SCHEMA)
    a = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    b = (
        P.decode_pgoutput(df.repartition(5))
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    assert list(a["after"]) == list(b["after"])
    assert list(a["key"]) == list(b["key"])


def test_dml_before_any_relation_is_dead_letter(spark):
    """A frame whose OID has no announcement AT OR BEFORE its seq must
    dead-letter (decoding against a future schema would be a guess): the
    last-wins flat registry would wrongly decode it."""
    log = _evolving_log()
    early = xlog(90, insert_msg(EVO_OID, ["0", "eve"]), TS)
    df = spark.createDataFrame([(-1, early)] + log, P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    assert list(out["op"]) == ["unknown", "insert", "insert", "insert"]
    assert out.iloc[0]["table_name"] == f"oid_{EVO_OID}"


def test_relation_versions_registry_shape():
    """Unit shape: three announcements -> three versions; at() resolves
    bisect-style; latest() matches the flat registry."""
    versions = P.RelationVersions()
    for seq, frame in _evolving_log():
        b = frame
        if b[:1] == b"w" and b[25:26] == b"R":
            _, _, _, inner = P.parse_xlogdata(b)
            versions.add(seq, P.parse_relation(inner))
    assert versions.n_versions(EVO_OID) == 3
    assert [c.name for c in versions.at(1).get(EVO_OID).columns] == ["id", "name"]
    assert [c.name for c in versions.at(3).get(EVO_OID).columns] == [
        "id", "name", "email",
    ]
    assert [c.name for c in versions.at(99).get(EVO_OID).columns] == [
        "id", "full_name", "email",
    ]
    assert versions.at(-5).get(EVO_OID) is None
    assert [c.name for c in versions.latest()[EVO_OID].columns] == [
        "id", "full_name", "email",
    ]


# ---------------------------------------------------------------------------
# Schema evolution, the DESTRUCTIVE half: column DROP and ALTER COLUMN TYPE
# both re-send Relation; every later DML frame must decode under the new
# regime, every earlier one under the old. A tuple whose cell count
# contradicts its governing Relation (registry desync -- the reference's
# silent-recache hazard, replicator.go:320-336) must DEAD-LETTER with a
# reason, never mis-zip cells to the wrong column names.
# ---------------------------------------------------------------------------

DROP_OID = 17100


def test_mid_stream_column_drop_decodes_both_regimes(spark):
    """insert(3 cells) -> Relation drops email -> insert(2 cells): each
    regime zips against its own column list; the dropped column survives
    in pre-drop payloads (audit) and simply stops appearing after."""
    v1 = relation_msg(
        DROP_OID, "public", "users",
        [("id", 20, True), ("name", 25, False), ("email", 25, False)],
    )
    v2 = relation_msg(DROP_OID, "public", "users", [("id", 20, True), ("name", 25, False)])
    frames = list(enumerate([
        xlog(100, v1, TS),
        xlog(110, insert_msg(DROP_OID, ["1", "ada", "a@x"]), TS),
        xlog(120, v2, TS),
        xlog(130, insert_msg(DROP_OID, ["2", "bob"]), TS),
        xlog(140, delete_msg(DROP_OID, ["1", None], old_kind=b"K"), TS),
    ]))
    df = spark.createDataFrame(frames, P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    assert list(out["op"]) == ["insert", "insert", "delete"]
    assert dict(out.iloc[0]["after"]) == {"id": "1", "name": "ada", "email": "a@x"}
    assert dict(out.iloc[1]["after"]) == {"id": "2", "name": "bob"}
    # post-drop delete keys against the 2-column regime
    assert out.iloc[2]["key"] == "public.users:1"


def test_mid_stream_column_retype_decodes_and_registry_sees_new_oid(spark):
    """ALTER COLUMN TYPE re-sends Relation with a new type OID for the
    column (Postgres re-announces on any schema change). Values are text
    on the wire either way, so both regimes decode; the versioned registry
    exposes the type change for typed consumers."""
    t1 = relation_msg(DROP_OID + 1, "public", "m", [("id", 20, True), ("v", 23, False)])   # int4
    t2 = relation_msg(DROP_OID + 1, "public", "m", [("id", 20, True), ("v", 1700, False)]) # numeric
    frames = list(enumerate([
        xlog(100, t1, TS),
        xlog(110, insert_msg(DROP_OID + 1, ["1", "42"]), TS),
        xlog(120, t2, TS),
        xlog(130, insert_msg(DROP_OID + 1, ["2", "42.5"]), TS),
    ]))
    df = spark.createDataFrame(frames, P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    assert [dict(a)["v"] for a in out["after"]] == ["42", "42.5"]
    versions = P.collect_relation_versions(df)
    assert versions.n_versions(DROP_OID + 1) == 2
    assert versions.at(1).get(DROP_OID + 1).columns[1].type_oid == 23
    assert versions.at(3).get(DROP_OID + 1).columns[1].type_oid == 1700


def test_arity_mismatch_dead_letters_instead_of_miszipping(spark):
    """A 3-cell insert governed by a 2-column Relation (what a consumer
    holding a STALE pre-ADD relation sees, or any registry desync): the
    decode must refuse to zip and emit a reasoned dead-letter row. The
    reference zips by position here and silently mislabels every cell."""
    rel2 = relation_msg(DROP_OID + 2, "public", "users", [("id", 20, True), ("name", 25, False)])
    frames = list(enumerate([
        xlog(100, rel2, TS),
        xlog(110, insert_msg(DROP_OID + 2, ["1", "ada", "surprise-extra-cell"]), TS),
        xlog(120, insert_msg(DROP_OID + 2, ["2", "bob"]), TS),
    ]))
    df = spark.createDataFrame(frames, P.FRAME_SCHEMA)
    out = P.decode_pgoutput(df).toPandas().sort_values("lsn").reset_index(drop=True)
    assert list(out["op"]) == ["unknown", "insert"]
    bad = out.iloc[0]
    assert bad["table_name"] == "users" and bad["key"] is None
    reason = dict(bad["after"])["_dead_letter_reason"]
    assert "arity_mismatch" in reason and "3 cells" in reason and "2 columns" in reason
    # the short-before Delete/Update 'K' path stays legal (replica identity
    # tuples may carry fewer cells than the relation on some paths)
    short_del = list(enumerate([
        xlog(100, rel2, TS),
        xlog(110, delete_msg(DROP_OID + 2, ["7"], old_kind=b"K"), TS),
    ]))
    d = P.decode_pgoutput(spark.createDataFrame(short_del, P.FRAME_SCHEMA)).toPandas()
    assert list(d["op"]) == ["delete"] and d.iloc[0]["key"] == "public.users:7"


def test_short_old_full_tuple_dead_letters_like_after_tuple(spark):
    """The 'K' exemption must NOT leak to 'O' (REPLICA IDENTITY FULL)
    before-tuples: an old-FULL tuple with fewer cells than the relation is
    a registry desync on the delete/update old-tuple path -- the exact
    hazard the after-tuple guard targets -- and dead-letters rather than
    being positionally mis-zipped into a wrong key."""
    rel2 = relation_msg(DROP_OID + 3, "public", "users", [("id", 20, True), ("name", 25, False)])
    frames = list(enumerate([
        xlog(100, rel2, TS),
        xlog(110, delete_msg(DROP_OID + 3, ["7"], old_kind=b"O"), TS),
        xlog(120, update_msg(DROP_OID + 3, ["7", "ada"], old=["7"], old_kind=b"O"), TS),
        xlog(130, update_msg(DROP_OID + 3, ["8", "bob"], old=["8", "bo"], old_kind=b"O"), TS),
    ]))
    out = (
        P.decode_pgoutput(spark.createDataFrame(frames, P.FRAME_SCHEMA))
        .toPandas().sort_values("lsn").reset_index(drop=True)
    )
    assert list(out["op"]) == ["unknown", "unknown", "update"]
    for i in (0, 1):
        reason = dict(out.iloc[i]["after"])["_dead_letter_reason"]
        assert "arity_mismatch" in reason and "1 cells" in reason
    assert out.iloc[2]["key"] == "public.users:8"  # full-arity 'O' stays legal
