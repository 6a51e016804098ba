"""Property-based pgoutput codec tests (no Spark): encode -> decode must
be the identity over arbitrary column values (NULL cells, unicode, empty
strings, the TOAST placeholder), and the versioned relation registry must
resolve every DML frame to the newest announcement at-or-before its log
position under ARBITRARY interleavings of schema versions and inserts --
the property form of the hand-built ALTER TABLE fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from change_data_capture_service_spark.sources import pgoutput as P

OID = 31337

# text cells as pgoutput ships them: any unicode text, or NULL
_cell = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.just(P.UNCHANGED_TOAST),
)
_colname = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    names=st.lists(_colname, min_size=1, max_size=6, unique=True),
    rows=st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=5),
    lsn0=st.integers(min_value=1, max_value=2**40),
)
def test_insert_roundtrip_is_identity(names, rows, lsn0):
    cols = [(n, 25, i == 0) for i, n in enumerate(names)]
    rel = P.parse_relation(P.encode_relation(OID, "public", "t", cols))
    registry = {OID: rel}
    for i, cells in enumerate(rows):
        cells = (cells + [None] * len(names))[: len(names)]  # width-match
        frame = P.encode_xlogdata(lsn0 + i, P.encode_insert(OID, cells))
        out = P.decode_frame(frame, registry)
        assert len(out) == 1
        ev = out[0]
        assert ev["op"] == "insert"
        assert ev["lsn"] == lsn0 + i
        assert ev["after"] == dict(zip(names, cells))
        # key = schema.table:pk or the no_pk_val fallback when pk is NULL
        if cells[0] is None:
            assert ev["key"] == "public.t:no_pk_val"
        else:
            assert ev["key"] == f"public.t:{cells[0]}"


@settings(max_examples=150, deadline=None)
@given(
    # per position: either a schema announcement (new column count 1..5)
    # or an insert; the reference decode must use the newest announcement
    # at-or-before the insert's position
    script=st.lists(
        st.one_of(
            st.tuples(st.just("rel"), st.integers(min_value=1, max_value=5)),
            st.tuples(st.just("ins"), st.integers(min_value=0, max_value=99)),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_versioned_registry_resolves_regimes(script):
    versions = P.RelationVersions()
    live_width: int | None = None
    expected: list[tuple[int, int | None, int]] = []  # (seq, width@seq, val)
    for seq, (kind, arg) in enumerate(script):
        if kind == "rel":
            cols = [(f"c{i}", 25, i == 0) for i in range(arg)]
            rel = P.parse_relation(P.encode_relation(OID, "public", "t", cols))
            versions.add(seq, rel)
            live_width = arg
        else:
            expected.append((seq, live_width, arg))

    for seq, width, val in expected:
        reg = versions.at(seq)
        rel = reg.get(OID)
        if width is None:
            assert rel is None  # pre-announcement frames dead-letter
            continue
        assert rel is not None
        assert len(rel.columns) == width
        cells = [str(val + i) for i in range(width)]
        frame = P.encode_xlogdata(1000 + seq, P.encode_insert(OID, cells))
        out = P.decode_frame(frame, reg)
        assert out[0]["after"] == {f"c{i}": str(val + i) for i in range(width)}


@settings(max_examples=100, deadline=None)
@given(
    before=st.lists(_cell, min_size=2, max_size=4),
    after=st.lists(_cell, min_size=2, max_size=4),
)
def test_update_delete_roundtrip(before, after):
    width = max(len(before), len(after))
    before = (before + [None] * width)[:width]
    after = (after + [None] * width)[:width]
    cols = [(f"c{i}", 25, i == 0) for i in range(width)]
    rel = P.parse_relation(P.encode_relation(OID, "public", "t", cols))
    registry = {OID: rel}

    upd = P.encode_xlogdata(
        7, b"U" + __import__("struct").pack(">i", OID)
        + b"O" + P.encode_tuple_data(before)
        + b"N" + P.encode_tuple_data(after),
    )
    ev = P.decode_frame(upd, registry)[0]
    assert ev["op"] == "update"
    assert ev["before"] == {f"c{i}": v for i, v in enumerate(before)}
    assert ev["after"] == {f"c{i}": v for i, v in enumerate(after)}

    dele = P.encode_xlogdata(
        8, b"D" + __import__("struct").pack(">i", OID)
        + b"K" + P.encode_tuple_data(before),
    )
    ev = P.decode_frame(dele, registry)[0]
    assert ev["op"] == "delete"
    assert ev["before"] == {f"c{i}": v for i, v in enumerate(before)}
    assert ev["after"] is None
