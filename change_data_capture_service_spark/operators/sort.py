"""Sort / limit / top-k operators (SURVEY.md §2.2 X7).

Top-k uses order+limit which Spark plans as TakeOrderedAndProject: each
partition keeps only its local top-k, the driver merges k×partitions rows --
no global sort, the right shape at 100 TB. Per-group top-k is a windowed
row_number filter (single shuffle on the group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "orderby_multi",
    tags=("sort",),
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC NULLS FIRST, o_orderkey
    """,
)
def orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement (Spark defaults
    nulls-first on ASC, DuckDB nulls-last -- always say it explicitly,
    SURVEY.md §7 phase 1). Range-partitioned global sort."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate").orderBy(
        F.col("o_orderpriority").asc_nulls_last(),
        F.col("o_totalprice").desc_nulls_first(),
        F.col("o_orderkey"),
    )


@register(
    "topk",
    tags=("sort",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by value, orderkey tiebreak (deterministic).
    Plans as TakeOrderedAndProject -- O(k) per partition, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "topk_per_group",
    tags=("sort",),
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: window row_number ≤ k. One shuffle on the
    group key; with AQE, skewed customers split automatically."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
