"""Scan / projection / filter operators (SURVEY.md §2.2 X3; reference R1).

The reference's only scan is ``SELECT * FROM "schema"."table"`` buffered
whole-table in memory (``internal/wal/replicator.go:102-103``). Here scans
are partitioned parquet reads with Catalyst pushing projections and
predicates into the scan (verified by ``plans.inspect`` in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "snapshot_scan",
    tags=("scan",),
    oracle="SELECT * FROM lineitem",
)
def snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table snapshot scan (reference R1, ``replicator.go:69-184``).
    Unlike the reference's ``ReadAll()`` (O(table) memory on one thread),
    this is a parallel partitioned columnar scan."""
    return load_table(spark, sf_dir, "lineitem")


@register(
    "projection",
    tags=("scan",),
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity
    FROM lineitem
    """,
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection with a computed column. Catalyst prunes the
    scan to the 5 referenced columns (ReadSchema shows only those) -- the
    reference always reads all columns (``replicator.go:114-136``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        "l_quantity",
    )


@register(
    "filter_pred",
    tags=("scan",),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount IN (0.05, 0.06, 0.07)
      AND l_quantity < 24
      AND l_returnflag LIKE 'N%'
      AND l_linestatus IS NOT NULL
      AND (l_tax > 0.02 OR l_quantity >= 10)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate mix: range, IN-list, LIKE, null-check, boolean combo.
    All of these push down to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").isin(0.05, 0.06, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").like("N%")
        & F.col("l_linestatus").isNotNull()
        & ((F.col("l_tax") > 0.02) | (F.col("l_quantity") >= 10))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_shipdate")


@register(
    "sample_hash",
    tags=("scan", "northstar"),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '28'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~16% sample via md5-threshold on the key. Unlike
    df.sample (seed- and partitioning-dependent), a content hash gives the
    SAME sample on any engine, any partition count, any run -- the
    reproducibility property a training-data pipeline needs for held-out
    splits. Pure filter: no shuffle, combines with predicate pushdown."""
    o = load_table(spark, sf_dir, "orders")
    digest = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return o.filter(digest <= "28").select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "sample_stratified",
    tags=("scan", "northstar"),
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '1a' END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (~50% of 'en', ~10% of the rest):
    the language-rebalancing primitive of corpus curation. Same hash trick
    as sample_hash, with the threshold a function of the stratum -- still a
    single shuffle-free scan, unlike sampleBy which is seed-dependent."""
    d = load_table(spark, sf_dir, "documents")
    digest = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    threshold = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("1a"))
    return d.filter(digest < threshold).select("doc_id", "lang")


@register(
    "profile_table",
    tags=("scan",),
    oracle="""
    SELECT 'o_orderkey' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count(o_orderkey) AS BIGINT) AS non_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv,
           CAST(min(o_orderkey) AS DOUBLE) AS min_val,
           CAST(max(o_orderkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT), CAST(count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT), CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the ANALYZE TABLE shape): rowcount, null count,
    exact NDV, min/max for several columns in ONE scan -- the Spark agg
    computes every metric together and unpivots to rows with stack(),
    where the oracle's UNION ALL scans once per column. At 100 TB the
    single-pass shape is the difference between one job and one job per
    column; swap count_distinct for approx_count_distinct when exact NDV
    isn't required."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    agg = o.agg(
        F.count("*").alias("n"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.count_distinct(c).alias(f"ndv_{c}") for c in cols],
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    )
    stack_expr = ", ".join(
        f"'{c}', nn_{c}, ndv_{c}, min_{c}, max_{c}" for c in cols
    )
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS (col, non_null, ndv, min_val, max_val)"
        ),
        "n",
    ).select("col", "n", "non_null", "ndv", "min_val", "max_val")
