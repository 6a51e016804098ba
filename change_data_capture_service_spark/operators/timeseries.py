"""Time-series operators: dense gap-filled resampling over the event
stream. The CDC changelog is a time series; dashboards over it (the
reference's Kibana surface) need zero-filled buckets, not sparse ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "gapfill_hourly",
    tags=("timeseries",),
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    hours AS (
      SELECT b.lo + CAST(r.range AS INT) * INTERVAL 1 HOUR AS hour
      FROM b CROSS JOIN range(0, 8784) r
      WHERE b.lo + CAST(r.range AS INT) * INTERVAL 1 HOUR <= b.hi
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS sv
      FROM events GROUP BY 1
    )
    SELECT CAST(h.hour AS TIMESTAMP) AS hour,
           coalesce(a.n_events, 0) AS n_events,
           CAST(coalesce(a.sv, 0) AS DOUBLE) AS sum_value
    FROM hours h LEFT JOIN agg a ON h.hour = a.hour
    """,
)
def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup: every hour between min(ts) and max(ts)
    appears, zero-filled where no events landed. The dense spine comes from
    sequence()+explode over the 1-row bounds aggregate -- the spine is
    O(hours), always tiny relative to the fact table, so the left join
    broadcasts the AGGREGATED side only when small; either way the fact
    table is touched exactly once. (The oracle generates its spine from a
    constant range() because DuckDB 1.0 lacks lateral range args --
    8784 covers a leap year of hours.)"""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    agg = e.groupBy(hour.alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    bounds = e.agg(F.min(hour).alias("lo"), F.max(hour).alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    return hours.join(agg, "hour", "left").select(
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sv", F.lit(0).cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
