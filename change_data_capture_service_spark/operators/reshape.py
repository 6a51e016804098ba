"""Reshape operators: pivot / unpivot (wide<->long). Common OLAP surface
on top of the survey inventory; both expressed so Catalyst plans a single
aggregate/expand -- no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "pivot",
    tags=("reshape",),
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list: at scale an
    unlisted pivot triggers an extra distinct pass over the fact table --
    always enumerate)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@register(
    "unpivot",
    tags=("reshape",),
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) numeric columns to long form via the stack generator
    -- one pass, rows expand x2, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "value"),
    )


@register(
    "pivot_unpivot_roundtrip",
    tags=("reshape", "dialect"),
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    wide AS (
      PIVOT daily ON event_type IN
        ('click', 'view', 'purchase', 'signup', 'error')
      USING sum(n) GROUP BY day
    ),
    long AS (
      UNPIVOT wide ON click, view, purchase, signup, error
      INTO NAME event_type VALUE n
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n
    FROM long WHERE n > 0
    ORDER BY day, event_type
    """,
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT -> UNPIVOT round trip over the (day, event_type) count
    matrix: widen to one column per event type (zero-filled), melt back
    to long form, drop the zero fill -- and the result must equal the
    original grouped relation. The DIALECT-PARITY demonstrator the
    round-10 queue named: Spark expresses the melt with its native
    ``unpivot`` API (ids/values/variable/value), DuckDB with first-class
    PIVOT/UNPIVOT statements -- same algebra, maximally different
    surface syntax, bit-identical output.

    Exactness: counts are exact integers end to end; the zero-fill /
    drop-zero pair makes the round trip lossless on the observed cells;
    deterministic (day, event_type) order.

    Scale: one (day, type)-grain partial agg over the fact scan; the
    pivot matrix is |days| x |types| -- calendar-bounded; the unpivot is
    a rows-x-|types| map-side expansion, no shuffle."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("day", "ts").cast("timestamp").alias("day"), "event_type"
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wide = (
        daily.groupBy("day")
        .pivot("event_type", types)
        .agg(F.coalesce(F.sum("n"), F.lit(0)))
        .na.fill(0, subset=types)
    )
    long = wide.unpivot("day", types, "event_type", "n")
    return (
        long.filter(F.col("n") > 0)
        .select("day", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("day", "event_type")
    )
