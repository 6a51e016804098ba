"""End-to-end quickstart: the full CDC journey on fixture data.

    python examples/quickstart.py

1. configure + build the pipeline (R24)
2. snapshot two tables into the changelog (R1+R5)
3. append insert/update/delete change events (R13-R15)
4. drain the stream into the routed sink with checkpointing (R7-R10, R21-R22)
5. query: latest state (X1), inserts-over-time (X2), and two north-star
   operators over the analytic fixtures
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.config import CdcConfig
from change_data_capture_service_spark.session import get_spark
from change_data_capture_service_spark.streaming import envelope as env

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="cdc-quickstart", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="cdc-quickstart-")

    # 1. config -> pipeline
    cfg = CdcConfig(
        changelog_dir=f"{work}/changelog",
        sink_dir=f"{work}/sink",
        checkpoint_dir=f"{work}/checkpoint",
    )
    pipe = cfg.build_pipeline(spark)

    # 2. snapshot
    users = spark.createDataFrame(
        [(1, "ada", "ada@a.io"), (2, "bob", "bob@b.io")], "id long, name string, email string"
    )
    pipe.snapshot(users, "public", "users", pk_cols=["id"])
    pipe.snapshot(load_table(spark, SF, "region"), "public", "region")

    # 3. change events
    def change(rows, op, lsn):
        return env.encode(
            spark.createDataFrame(rows, "id long, name string, email string"),
            op=op, schema_name="public", table_name="users", pk_cols=["id"],
            lsn=F.lit(lsn), ts=F.current_timestamp(),
        )

    for df in (
        change([(3, "cyd", "cyd@c.io")], "insert", 101),
        change([(2, "rob", "rob@b.io")], "update", 102),
        change([(1, "ada", "ada@a.io")], "delete", 103),
    ):
        df.write.mode("append").json(pipe.changelog_dir)

    # 4. drain with checkpointing
    pipe.run_available()

    print("\n== latest state of public.users (X1 over the event log) ==")
    pipe.latest_state("public", "users").select("id", "name", "email", "lsn").orderBy("id").show()

    # 5. analytics from the registry (same callables the driver grades)
    print("== inserts over time (X2) ==")
    registry.get("inserts_over_time").fn(spark, SF).orderBy("day", "event_type").show(5)

    print("== MinHash near-duplicate pairs (X18) ==")
    registry.get("dedup_minhash_near").fn(spark, SF).orderBy("doc_id_a").show(5)

    print("== cosine top-k neighbors (X19) ==")
    registry.get("knn_cosine_topk").fn(spark, SF).filter(F.col("query_id") == 0).show(5)


if __name__ == "__main__":
    main()
