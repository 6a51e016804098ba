"""Set operators (SURVEY.md §2.2 X8): UNION ALL / UNION / INTERSECT / EXCEPT.

Semantics matching (SURVEY.md §7 phase 1): Spark ``union`` is bag UNION ALL;
``intersect``/``subtract`` are distinct-set semantics -- paired with DuckDB's
INTERSECT / EXCEPT which are also distinct. ``intersectAll``/``exceptAll``
pair with INTERSECT ALL / EXCEPT ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "union_all",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union: no shuffle at all, partitions simply concatenate."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir))


@register(
    "union_distinct",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: union + distinct (one hash-aggregate shuffle, partial
    dedup map-side first)."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "intersect",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection (planned as left-semi after dedup)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "except_",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct difference: nations with customers but no suppliers
    (planned as left-anti after dedup)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "intersect_all",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity = min of the two sides)."""
    return _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))


@register(
    "except_all",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity subtraction)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))
