"""In-process mock PostgreSQL walsender backend (stdlib only).

Speaks the backend side of the protocol subset
``sources/walsender.py`` implements: startup with
``replication=database``, optional MD5 password challenge, the
replication grammar (IDENTIFY_SYSTEM / CREATE_REPLICATION_SLOT /
START_REPLICATION), and CopyBoth streaming of scripted inner frames,
BLOCKING on reply-required keepalives until the client's Standby Status
Update arrives -- the liveness contract a real walsender enforces.
Lives in the package (not tests/) so examples and user smoke tests can
drive the wire client from an installed wheel."""

from __future__ import annotations

import hashlib
import socket
import struct
import threading


def _keepalive(wal_end: int, reply: bool) -> bytes:
    return b"k" + struct.pack(">qqB", wal_end, 0, 1 if reply else 0)


class MockWalSender:
    """Backend side of the protocol subset, one connection at a time.

    ``script`` is the list of inner frames START_REPLICATION streams as
    CopyData; a reply-required keepalive in the script BLOCKS the stream
    until the client's Standby Status Update arrives (recorded in
    ``status_updates``), which is exactly the liveness contract a real
    walsender enforces before advancing."""

    def __init__(
        self,
        script: list[bytes],
        *,
        password: str | None = None,
        hang_after_script: bool = False,
    ):
        self.script = script
        self.password = password
        # simulate an idle-WAL server: stream the script then go QUIET
        # (no CopyDone), so clients exercise their socket-timeout path
        self.hang_after_script = hang_after_script
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
                # startup message: int32 len, int32 proto, params. recv()
                # returning b'' means the client vanished mid-handshake --
                # bail instead of busy-looping on an empty read forever
                while len(buf) < 4:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf.extend(chunk)
                (ln,) = struct.unpack(">i", bytes(buf[:4]))
                while len(buf) < ln:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf.extend(chunk)
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
                        if self.hang_after_script:
                            # park until the client gives up (Terminate
                            # or a straight close) -- the expected end
                            try:
                                while True:
                                    t2, _ = self._read_msg(conn, buf)
                                    if t2 == b"X":
                                        return
                            except ConnectionError:
                                return
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


__all__ = ["MockWalSender", "_keepalive"]
