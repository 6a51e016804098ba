"""The walsender TCP client against an in-process mock Postgres backend --
the live wire path of reference R7 (``replicator.go:186-242``), exercised
end-to-end without a server binary: startup handshake with
``replication=database``, MD5 password auth, IDENTIFY_SYSTEM /
CREATE_REPLICATION_SLOT over the replication grammar, CopyBoth streaming
of XLogData frames built with the SAME pgoutput encoders the byte-fixture
tests use, keepalive reply-required -> Standby Status Update, and the
frames_to_df -> decode_pgoutput bridge that proves the live transport and
the fixture path share every decode byte.

A final skip-marked test dials a real Postgres when $SPARK_GRAFT_PG_DSN
is set (absent in this sandbox)."""

from __future__ import annotations

import hashlib
import os
import socket
import struct
import threading

import pytest

from change_data_capture_service_spark.sources import pgoutput as P
from change_data_capture_service_spark.sources.walsender import (
    WalSenderClient,
    WalSenderError,
    frames_to_df,
    lsn_int,
    lsn_str,
    replicate_batch,
)

OID = 77001


def _keepalive(wal_end: int, reply: bool) -> bytes:
    return b"k" + struct.pack(">qqB", wal_end, 0, 1 if reply else 0)


class MockWalSender:
    """Backend side of the protocol subset, one connection at a time.

    ``script`` is the list of inner frames START_REPLICATION streams as
    CopyData; a reply-required keepalive in the script BLOCKS the stream
    until the client's Standby Status Update arrives (recorded in
    ``status_updates``), which is exactly the liveness contract a real
    walsender enforces before advancing."""

    def __init__(self, script: list[bytes], *, password: str | None = None):
        self.script = script
        self.password = password
        self.status_updates: list[dict] = []
        self.startup_params: dict[str, str] = {}
        self.queries: list[str] = []
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self.error: Exception | None = None

    # ---- backend wire helpers

    def _send(self, conn, tag: bytes, payload: bytes = b"") -> None:
        conn.sendall(tag + struct.pack(">i", len(payload) + 4) + payload)

    def _ready(self, conn) -> None:
        self._send(conn, b"Z", b"I")

    def _row(self, conn, cols: list[str], vals: list[str]) -> None:
        t = struct.pack(">h", len(cols))
        for c in cols:
            t += c.encode() + b"\x00" + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
        self._send(conn, b"T", t)
        d = struct.pack(">h", len(vals))
        for v in vals:
            enc = v.encode()
            d += struct.pack(">i", len(enc)) + enc
        self._send(conn, b"D", d)
        self._send(conn, b"C", b"SELECT 1\x00")

    def _read_msg(self, conn, buf: bytearray) -> tuple[bytes, bytes]:
        while len(buf) < 5:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            buf.extend(chunk)
        tag = bytes(buf[:1])
        (ln,) = struct.unpack(">i", bytes(buf[1:5]))
        while len(buf) < 1 + ln:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            buf.extend(chunk)
        payload = bytes(buf[5 : 1 + ln])
        del buf[: 1 + ln]
        return tag, payload

    # ---- session

    def _serve(self) -> None:
        try:
            conn, _ = self._srv.accept()
            with conn:
                buf = bytearray()
                # startup message: int32 len, int32 proto, params
                while len(buf) < 4:
                    buf.extend(conn.recv(65536))
                (ln,) = struct.unpack(">i", bytes(buf[:4]))
                while len(buf) < ln:
                    buf.extend(conn.recv(65536))
                params = bytes(buf[8:ln]).split(b"\x00")[:-2]
                del buf[:ln]
                it = iter(params)
                self.startup_params = {
                    k.decode(): v.decode() for k, v in zip(it, it)
                }
                if self.password is not None:
                    salt = b"SALT"
                    self._send(conn, b"R", struct.pack(">i", 5) + salt)
                    tag, payload = self._read_msg(conn, buf)
                    assert tag == b"p"
                    got = payload.rstrip(b"\x00").decode()
                    inner = hashlib.md5(
                        (self.password + self.startup_params["user"]).encode()
                    ).hexdigest()
                    want = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
                    if got != want:
                        self._send(conn, b"E", b"SFATAL\x00Mbad password\x00\x00")
                        return
                self._send(conn, b"R", struct.pack(">i", 0))  # AuthOk
                self._send(conn, b"S", b"server_version\x0016.4\x00")
                self._ready(conn)

                while True:
                    tag, payload = self._read_msg(conn, buf)
                    if tag == b"X":
                        return
                    if tag != b"Q":
                        continue
                    sql = payload.rstrip(b"\x00").decode()
                    self.queries.append(sql)
                    if sql == "IDENTIFY_SYSTEM":
                        self._row(
                            conn,
                            ["systemid", "timeline", "xlogpos", "dbname"],
                            ["7000000000000000001", "1", "0/1000000", "app"],
                        )
                        self._ready(conn)
                    elif sql.startswith("CREATE_REPLICATION_SLOT"):
                        self._row(
                            conn,
                            ["slot_name", "consistent_point", "snapshot_name", "output_plugin"],
                            ["cdc_slot", "0/1000000", "snap", "pgoutput"],
                        )
                        self._ready(conn)
                    elif sql.startswith("START_REPLICATION"):
                        self._send(conn, b"W", b"\x00\x00\x00")  # CopyBoth
                        for frame in self.script:
                            self._send(conn, b"d", frame)
                            if frame[0:1] == b"k" and frame[17] == 1:
                                # reply required: block until the standby
                                # status update lands
                                t2, p2 = self._read_msg(conn, buf)
                                assert t2 == b"d" and p2[0:1] == b"r"
                                w, f, a, _ts, _rep = struct.unpack_from(
                                    ">qqqqB", p2, 1
                                )
                                self.status_updates.append(
                                    {"written": w, "flushed": f, "applied": a}
                                )
                        self._send(conn, b"c", b"")  # CopyDone
                        self._send(conn, b"C", b"COPY 0\x00")
                        self._ready(conn)
                    else:
                        self._send(conn, b"E", b"SERROR\x00M42601 syntax\x00\x00")
                        return
        except Exception as e:  # surfaced by the test thread-join
            self.error = e
        finally:
            self._srv.close()

    def __enter__(self) -> "MockWalSender":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> bool:
        self._thread.join(timeout=5)
        if self.error and exc == (None, None, None):
            raise self.error
        return False


def _script() -> list[bytes]:
    rel = P.encode_relation(
        OID, "public", "users", [("id", 20, True), ("name", 25, False)]
    )
    return [
        P.encode_xlogdata(100, rel),
        P.encode_xlogdata(110, P.encode_insert(OID, ["1", "ada"])),
        _keepalive(110, reply=True),
        P.encode_xlogdata(120, P.encode_insert(OID, ["2", "bob"])),
        _keepalive(120, reply=False),
    ]


def test_lsn_text_roundtrip():
    for v in (0, 1, 0x1000000, 0xFFFFFFFF, 0x1_0000_0000, 0xABCD_1234_5678_9ABC):
        assert lsn_int(lsn_str(v)) == v


def test_handshake_identify_create_slot_and_stream():
    """Full client session: MD5 auth, IDENTIFY_SYSTEM, slot creation,
    CopyBoth drain with an automatic standby-status keepalive reply."""
    with MockWalSender(_script(), password="sekrit") as srv:
        with WalSenderClient(
            port=srv.port, user="repl", dbname="app", password="sekrit"
        ) as client:
            ident = client.identify_system()
            assert ident["timeline"] == "1" and ident["xlogpos"] == "0/1000000"
            slot = client.create_replication_slot("cdc_slot")
            assert slot["output_plugin"] == "pgoutput"
            frames = replicate_batch(
                client, "cdc_slot", "cdc_pub", max_frames=10, deadline_s=10
            )
    assert srv.startup_params["replication"] == "database"
    assert srv.startup_params["user"] == "repl"
    assert [q for q in srv.queries if q.startswith("START_REPLICATION")] == [
        "START_REPLICATION SLOT cdc_slot LOGICAL 0/0 "
        "(proto_version '1', publication_names 'cdc_pub')"
    ]
    assert len(frames) == 5  # 3 xlogdata + 2 keepalives
    # the reply-required keepalive was acknowledged with the HIGHEST
    # wal_end received so far (the second xlogdata's end, not the stale
    # keepalive LSN) + 1, per the confirm convention
    rel = P.encode_relation(
        OID, "public", "users", [("id", 20, True), ("name", 25, False)]
    )
    hi = max(100 + len(rel), 110 + len(P.encode_insert(OID, ["1", "ada"])))
    assert srv.status_updates == [
        {"written": hi + 1, "flushed": hi + 1, "applied": hi + 1}
    ]


def test_bad_password_surfaces_as_error():
    with MockWalSender(_script(), password="right") as srv:
        with pytest.raises(WalSenderError, match="bad password"):
            WalSenderClient(
                port=srv.port, user="repl", dbname="app", password="wrong"
            ).connect()
        srv.error = None  # the server-side assert fired by design


def test_live_frames_decode_identically_to_fixtures(spark):
    """The transport/decode seam: frames drained from the mock walsender
    feed decode_pgoutput and yield byte-identical envelopes to the same
    frames built directly as fixtures -- the live path adds transport,
    never a second decode."""
    with MockWalSender(_script()) as srv:
        with WalSenderClient(port=srv.port, user="repl", dbname="app") as client:
            frames = replicate_batch(
                client, "cdc_slot", "cdc_pub", max_frames=10, deadline_s=10
            )
    live = frames_to_df(spark, frames)
    fixture = spark.createDataFrame(list(enumerate(_script())), P.FRAME_SCHEMA)
    a = sorted(map(str, P.decode_pgoutput(live).collect()))
    b = sorted(map(str, P.decode_pgoutput(fixture).collect()))
    assert a == b and len(a) == 2  # two decoded inserts


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PG_DSN"),
    reason="no live Postgres in this sandbox (set SPARK_GRAFT_PG_DSN=host:port:db:user:pass)",
)
def test_against_live_postgres():
    host, port, db, user, pw = os.environ["SPARK_GRAFT_PG_DSN"].split(":")
    with WalSenderClient(
        host=host, port=int(port), user=user, dbname=db, password=pw or None
    ) as client:
        ident = client.identify_system()
        assert "xlogpos" in ident
