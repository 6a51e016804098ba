"""The live Postgres wire path, end to end, with no Postgres installed:

    mock walsender backend (TCP)           <- stands in for the server
      -> WalSenderClient                   (sources/walsender.py: startup,
         IDENTIFY_SYSTEM, slot DDL,         MD5 auth, CopyBoth pump,
         START_REPLICATION)                 standby-status keepalive acks
      -> frames_to_df -> decode_pgoutput   (the SAME two-pass decode the
                                            byte fixtures use)
      -> latest_state compaction           (max_by(lsn) per key)

Point ``WalSenderClient`` at a real server (host/port/user/password) and
everything below the transport line is unchanged -- that is the whole
point of the frame-log seam. The reference does this loop in
``internal/wal/replicator.go``; here the decode and the state view are
distributed Spark plans while the tailer stays a single connection (a
replication slot is inherently serial)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from change_data_capture_service_spark.session import get_spark
from change_data_capture_service_spark.sources import pgoutput as P
from change_data_capture_service_spark.sources.walsender import (
    WalSenderClient,
    frames_to_df,
    replicate_batch,
)
from change_data_capture_service_spark.testing.walsender_mock import (
    MockWalSender,
    _keepalive,
)

OID = 91001


def wal_script() -> list[bytes]:
    """A small WAL: relation announcement, three inserts, an update, a
    delete, interleaved keepalives (one reply-required)."""
    rel = P.encode_relation(
        OID, "public", "accounts", [("id", 20, True), ("owner", 25, False)]
    )
    return [
        P.encode_xlogdata(100, rel),
        P.encode_xlogdata(110, P.encode_insert(OID, ["1", "ada"])),
        P.encode_xlogdata(120, P.encode_insert(OID, ["2", "bob"])),
        _keepalive(120, reply=True),
        P.encode_xlogdata(130, P.encode_insert(OID, ["3", "cyd"])),
        P.encode_xlogdata(
            140, b"U" + OID.to_bytes(4, "big") + b"N" + P.encode_tuple_data(["2", "bea"])
        ),
        P.encode_xlogdata(
            150, b"D" + OID.to_bytes(4, "big") + b"K" + P.encode_tuple_data(["3", None])
        ),
        _keepalive(150, reply=False),
    ]


def main() -> None:
    spark = get_spark(app_name="walsender-live-decode", master="local[4]",
                      shuffle_partitions=4)

    print("1. Dial the walsender (mock backend here; a real host:port in prod),")
    print("   authenticate, create the slot, and drain one replication batch:")
    with MockWalSender(wal_script(), password="sekrit") as srv:
        with WalSenderClient(
            port=srv.port, user="repl", dbname="app", password="sekrit"
        ) as client:
            ident = client.identify_system()
            print(f"   IDENTIFY_SYSTEM -> timeline {ident['timeline']}, "
                  f"xlogpos {ident['xlogpos']}")
            slot = client.create_replication_slot("cdc_slot")
            print(f"   slot {slot['slot_name']} via {slot['output_plugin']}")
            frames = replicate_batch(
                client, "cdc_slot", "cdc_pub", max_frames=20, deadline_s=10
            )
        print(f"   drained {len(frames)} frames; server saw standby acks: "
              f"{srv.status_updates}")

    print("2. The drained frames feed the SAME distributed decode as the")
    print("   byte fixtures (two-pass: broadcast relation registry + "
          "mapInPandas):")
    env = P.decode_pgoutput(frames_to_df(spark, frames))
    env.orderBy("lsn").show(truncate=False)

    print("3. Latest state per key (max_by over the envelope stream):")
    latest = (
        env.filter(F.col("op") != "unknown")
        .groupBy("key")
        .agg(F.max_by(F.struct("op", "after"), "lsn").alias("s"))
        .select("key", F.col("s.op").alias("last_op"), F.col("s.after").alias("after"))
        .filter(F.col("last_op") != "delete")
    )
    latest.orderBy("key").show(truncate=False)
    n = latest.count()
    assert n == 2, f"expected 2 live rows (insert+update survive, delete gone), got {n}"
    print(f"   {n} live rows -- the delete tombstoned id=3, the update won id=2.")


if __name__ == "__main__":
    main()
