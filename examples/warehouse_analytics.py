"""Warehouse analytics on replicated data: the queries a CDC consumer
actually runs once change data lands queryable, plus the continuously
maintained rollup that keeps the dashboard cheap.

    python examples/warehouse_analytics.py

1. the TPC-H-shaped suite over the star schema (Q5/Q10/Q13/Q15/Q22)
2. operational dashboards: open-order backlog, RFM segments, supplier
   concentration, YoY growth
3. a change stream drained into the continuous hourly rollup -- the
   incremental twin of recomputing the aggregate from the log

Every query is a registered, oracle-checked operator (COVERAGE.md); this
script only composes them.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from change_data_capture_service_spark import registry
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.session import get_spark
    from change_data_capture_service_spark.streaming import envelope as env
    from change_data_capture_service_spark.streaming.rollup import start_rollup
    from change_data_capture_service_spark.streaming.snapshot import write_snapshot

    spark = get_spark(app_name="warehouse-analytics", master="local[4]",
                      shuffle_partitions=4)
    registry.load_all()

    def run(key: str, n: int = 5) -> None:
        df = registry.get(key).fn(spark, SF_DIR)
        print(f"\n-- {key} ({df.count()} rows) " + "-" * 30)
        df.show(n, truncate=False)

    # 1. the TPC-H-shaped suite
    for key in (
        "tpch_q5_local_supplier",
        "tpch_q10_returned_items",
        "tpch_q13_order_count_dist",
        "tpch_q15_top_supplier",
        "tpch_q22_idle_customers",
    ):
        run(key)

    # 2. operational dashboards
    for key in (
        "orders_open_backlog_daily",
        "customer_rfm_segments",
        "supplier_concentration_hhi",
        "orders_yearly_growth",
    ):
        run(key)

    # 3. the search surface (the queries a reference user runs in Kibana
    #    over the cdc_* indices): explicit terms, typo-tolerant terms,
    #    and terms derived from an exemplar document
    for key in ("search_bm25", "search_fuzzy_match", "search_more_like_this"):
        run(key)

    # 4. continuous rollup fed by a real change stream
    with tempfile.TemporaryDirectory() as work:
        events = load_table(spark, SF_DIR, "events")
        write_snapshot(spark, events, f"{work}/log", schema_name="public",
                       table_name="events", fmt="parquet")
        stream = (
            spark.readStream.schema(env.ENVELOPE_SCHEMA)
            .format("parquet").load(f"{work}/log")
        )
        sink, q = start_rollup(stream, f"{work}/rollup", f"{work}/ckpt")
        q.awaitTermination()
        cur = sink.current("public", "events")
        print(f"\n-- continuous hourly rollup ({cur.count()} hours) " + "-" * 16)
        cur.orderBy(F.col("hour")).show(5, truncate=False)

    spark.stop()
    print("\nwarehouse analytics complete")


if __name__ == "__main__":
    main()
