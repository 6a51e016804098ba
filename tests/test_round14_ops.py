"""Round-9 campaign: parallel exact ranking (operators/ranks.py) and the
entity-grain ntile family that now rides it, plus the round's new
operators' semantic gates.

The headline scale fix: ``customer_rfm_segments`` and
``events_user_ltv_deciles`` were the registry's last documented
single-task global windows (``ntile over Window.orderBy``). They now run
on ``ranks.exact_ntile`` -- range-repartition, per-range row_number,
broadcast offsets -- asserted here to (a) equal the window form row for
row and (b) EXECUTE the rank stage across >1 task on a widened synthetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from change_data_capture_service_spark.operators.ranks import (
    exact_global_row_number,
    exact_ntile,
)


# ---------------------------------------------------------------- ranks


@pytest.mark.parametrize("n,rows", [(4, 23), (10, 10), (10, 9), (3, 1), (7, 700)])
def test_exact_ntile_matches_window_ntile(spark, n, rows):
    """Closed-form tile(rn, N) == Spark's own ntile, across the N%n=0,
    N<n, N=n, and generic regimes."""
    df = spark.range(rows).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("tb")
    )
    order = [F.col("k").desc(), F.col("tb")]
    got = exact_ntile(df, n, order, "t", num_ranges=8)
    want = df.withColumn("t", F.ntile(n).over(Window.orderBy(*order)).cast("int"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_exact_global_row_number_matches_window(spark):
    df = spark.range(997).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("tb")
    )
    order = [F.col("k"), F.col("tb").desc()]
    got = exact_global_row_number(df, order, "rn", num_ranges=16).drop("_N")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_exact_ntile_empty_and_skewed(spark):
    """Empty input yields empty output; a single hot key (every row ties
    on k, broken by tb) still tiles correctly."""
    empty = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("tb"))
    assert exact_ntile(empty, 4, [F.col("k")], "t", num_ranges=4).count() == 0
    hot = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("tb"))
    order = [F.col("k").desc(), F.col("tb")]
    got = exact_ntile(hot, 4, order, "t", num_ranges=8)
    sizes = {r["t"]: r["c"] for r in got.groupBy("t").agg(F.count("*").alias("c")).collect()}
    assert sizes == {1: 250, 2: 250, 3: 250, 4: 250}


def test_exact_rank_stage_runs_multi_task(spark):
    """The rank stage (within-range row_number) must EXECUTE across >1
    task on a widened synthetic -- asserted on the partition ids observed
    at the stage that computes the within-range rank, which is the gate
    the old Window.orderBy(ntile) form fails by construction (WindowExec
    funnels everything to one partition)."""
    df = spark.range(200_000).select(
        (F.col("id") * 7919 % 1_000_003).alias("k"), F.col("id").alias("tb")
    )
    ranked = exact_global_row_number(
        df, [F.col("k").desc(), F.col("tb")], "rn", num_ranges=16
    )
    parts = ranked.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts > 1, "rank stage collapsed to a single task"
    # exactness stays intact at this width: rn is a permutation of 1..N
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.count_distinct("rn").alias("d"),
    ).collect()[0]
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, agg["n"], agg["n"])


def test_rfm_and_ltv_rank_stages_multi_task(spark, tmp_path):
    """The two rewritten registry ops execute their rank stage across >1
    task on a widened fixture (50k customers / 50k users)."""
    import pandas as pd

    fx = str(tmp_path)
    n = 50_000
    orders = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": range(n),
            "o_orderstatus": ["F"] * n,
            "o_totalprice": [float(100 + (i * 17 % 9000)) / 7 for i in range(n)],
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([i % 365 for i in range(n)], unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
            "o_clerk": ["c"] * n,
            "o_shippriority": [0] * n,
            "o_comment": [""] * n,
        }
    )
    orders.to_parquet(fx + "/orders.parquet")
    events = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": range(n),
            "event_type": ["purchase"] * n,
            "value": [float(1 + (i * 31 % 5000)) / 3 for i in range(n)],
            "props": ["{}"] * n,
        }
    )
    events.to_parquet(fx + "/events.parquet")

    from change_data_capture_service_spark.operators.analytics import (
        events_user_ltv_deciles,
    )
    from change_data_capture_service_spark.operators.relational import (
        customer_rfm_segments,
    )

    rfm = customer_rfm_segments(spark, fx)
    parts = rfm.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts > 1
    assert rfm.count() == n
    ltv = events_user_ltv_deciles(spark, fx)
    got = {r["decile"]: r["n_users"] for r in ltv.collect()}
    assert sum(got.values()) == n and len(got) == 10
