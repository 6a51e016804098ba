"""CDC -> warehouse, end to end: change streams in, continuously-maintained
join view out, analytics on the view -- the pipeline a consumer of the
reference's Kafka topics actually wants instead of per-query joins over
raw Elasticsearch indices.

    python examples/cdc_warehouse_pipeline.py

1. snapshot epoch: orders + customer arrive as insert envelopes
2. incremental epochs: customer segment moves, order re-keys, deletes --
   each applied by MaterializedJoinView's affected-key delta rule
3. verification: the maintained view == the plain batch join (the IVM
   contract), printed per epoch
4. analytics on the VIEW: revenue by market segment straight off the
   maintained join, no join at query time

Every mechanism here is driver-checked (`stream_join_view_maintenance`)
or multi-batch pytest-pinned (`tests/test_joinview.py`); this script only
narrates the flow.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.session import get_spark
from change_data_capture_service_spark.streaming import envelope as env
from change_data_capture_service_spark.streaming.joinview import MaterializedJoinView

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def envelopes(df, table, pk, op="insert", lsn_offset=0):
    return env.encode(
        df, op=op, schema_name="public", table_name=table, pk_cols=[pk],
        lsn=F.col(pk).cast("long") + F.lit(lsn_offset),
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
    )


def check(sink):
    # content comparison, not row counts: a wrong-pairing bug with equal
    # cardinality must print DIVERGED (same canonicalized-row-set check
    # as tests/test_joinview.py)
    fact = sink._read("fact").filter(F.col("op") != "delete")
    dim = sink._read("dim").filter(F.col("op") != "delete")
    batch_join = fact.select(
        "key", F.element_at("after", "o_custkey").alias("jk")
    ).join(
        dim.select(
            F.element_at("after", "c_custkey").alias("jk"),
            F.element_at("after", "c_mktsegment").alias("seg"),
        ),
        "jk",
    )
    want = {(r["key"], r["jk"], r["seg"]) for r in batch_join.collect()}
    got = {
        (r["key"], r["join_key"], r["dim_after"]["c_mktsegment"])
        for r in sink.view().collect()
    }
    print(f"   maintained view rows = {len(got)}, batch join rows = {len(want)}  "
          f"{'OK' if got == want else 'DIVERGED'}")
    assert got == want


def main() -> None:
    spark = get_spark(app_name="cdc-warehouse-example")
    orders = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") <= 1500)
        .select("o_orderkey", "o_custkey",
                F.round("o_totalprice", 2).cast("string").alias("o_total"))
    )
    custs = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    sink = MaterializedJoinView(spark, tempfile.mkdtemp(prefix="cdc_wh_"))

    print("1. snapshot epoch: full orders + customer state as inserts")
    sink(envelopes(custs, "customer", "c_custkey").unionByName(
        envelopes(orders, "orders", "o_orderkey")), 0)
    check(sink)

    print("2a. incremental epoch: 50 customers change segment (fan-out)")
    moved = custs.filter(F.col("c_custkey") <= 50).withColumn(
        "c_mktsegment", F.lit("MIGRATED"))
    sink(envelopes(moved, "customer", "c_custkey", op="update", lsn_offset=10_000_000), 1)
    check(sink)

    print("2b. incremental epoch: 20 orders re-key to customer 1; 30 orders deleted")
    rekeyed = orders.filter(F.col("o_orderkey") <= 20).withColumn(
        "o_custkey", F.lit(1))
    dels = orders.filter((F.col("o_orderkey") > 20) & (F.col("o_orderkey") <= 50))
    sink(envelopes(rekeyed, "orders", "o_orderkey", op="update", lsn_offset=20_000_000)
         .unionByName(envelopes(dels, "orders", "o_orderkey", op="delete",
                                lsn_offset=20_000_000)), 2)
    check(sink)

    print("3. analytics on the maintained view (no join at query time):")
    (sink.view()
         .groupBy(F.element_at("dim_after", "c_mktsegment").alias("segment"))
         .agg(F.count("*").alias("orders"),
              F.round(F.sum(F.element_at("after", "o_total").cast("double")), 2)
               .alias("revenue"))
         .orderBy(F.col("revenue").desc())
         .show(10, truncate=False))

    print("4. REST fan-out: the same envelopes bulk-upserted into an")
    print("   Elasticsearch-compatible endpoint (in-process mock here;")
    print("   point base_url at a real cluster in deployment):")
    from change_data_capture_service_spark.streaming.es_sink import EsBulkSink
    from change_data_capture_service_spark.testing import MockEs

    with MockEs() as es:
        writer = EsBulkSink(es.url, mode="state")
        writer(envelopes(orders.limit(50), "orders", "o_orderkey"), epoch_id=0)
        writer(envelopes(orders.limit(50), "orders", "o_orderkey"), epoch_id=0)  # replay
        docs = es.snapshot().get("cdc_public_orders", {})
        print(f"   mock index cdc_public_orders holds {len(docs)} docs after a "
              f"replayed epoch (idempotent doc ids -- no duplicates)")
    spark.stop()


if __name__ == "__main__":
    main()
