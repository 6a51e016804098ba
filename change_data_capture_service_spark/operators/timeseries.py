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


@register(
    "ohlc_hourly",
    tags=("timeseries",),
    oracle="""
    WITH ranked AS (
      SELECT date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT CAST(hour AS TIMESTAMP) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           max(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           max(value) AS high_value,
           min(value) AS low_value,
           max(CASE WHEN rn_d = 1 THEN value END) AS close_value
    FROM ranked GROUP BY hour
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC rollup (open/high/low/close) over the event stream --
    the hypertable-style time-bucket aggregation (TimescaleDB's
    time_bucket + first/last, public docs). first/last need a total order:
    (ts, event_id) breaks nanosecond ties deterministically.

    ONE partial-agg shuffle: min_by/max_by carry (value, order-key) pairs
    through map-side combine -- no window, no second pass, unlike the
    oracle's two-ranking formulation. The struct comparator orders
    lexicographically on (ts, event_id), so ties resolve identically to
    the oracle's ORDER BY."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    order = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(hour.alias("hour")).agg(
        F.count("*").alias("n"),
        F.min_by("value", order).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max_by("value", order).alias("close_value"),
    )


@register(
    "locf_fill",
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
             sum(CAST(value AS DECIMAL(18,2))) AS sv
      FROM events GROUP BY 1
    )
    SELECT CAST(h.hour AS TIMESTAMP) AS hour,
           CAST(a.sv IS NOT NULL AS BOOLEAN) AS observed,
           CAST(last_value(a.sv IGNORE NULLS) OVER (
                  ORDER BY h.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS locf_value
    FROM hours h LEFT JOIN agg a ON h.hour = a.hour
    """,
)
def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation over the dense hourly
    spine (TimescaleDB's ``locf()``, public docs): hours with no events
    inherit the most recent observed hourly total instead of zero/NULL --
    the right fill for gauge-style series where absence means 'unchanged',
    not 'zero'.

    The carried value is a DECIMAL sum (exact, accumulation-order-free) so
    both engines carry bit-identical numbers. The LOCF window is a global
    ORDER BY over the spine -- O(hours), dashboard-sized, NOT the fact
    table (which reduces first); for per-key series partition the window
    by key and this parallelizes per key."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    hour = F.date_trunc("hour", F.col("ts"))
    agg = e.groupBy(hour.alias("hour")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv")
    )
    bounds = e.agg(F.min(hour).alias("lo"), F.max(hour).alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hours.join(agg, "hour", "left")
        .select(
            "hour",
            F.col("sv").isNotNull().alias("observed"),
            F.last("sv", ignorenulls=True).over(w).cast("double").alias("locf_value"),
        )
    )


@register(
    "active_users_7d",
    tags=("timeseries", "analytics"),
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    )
    SELECT CAST(du.day + CAST(o.range AS INT) * INTERVAL 1 DAY AS TIMESTAMP) AS anchor_day,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_active
    FROM du CROSS JOIN range(0, 7) o
    GROUP BY 1
    """,
)
def active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day: each (day, user) pair votes for
    the 7 anchor days whose trailing window contains it, then a distinct
    count per anchor. The expansion runs on the DISTINCT (day, user) set --
    |users| x |days| at most, tiny next to the event table -- so the fact
    table is scanned once and the 7x fan-out applies post-reduction. The
    standard scale shape for sliding distinct counts; swap the exact
    distinct for approx_count_distinct when |users| per window outgrows
    memory."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id").distinct()
    return (
        du.select("day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"))
        .select(F.expr("day + off * INTERVAL 1 DAY").alias("anchor_day"), "user_id")
        .groupBy("anchor_day")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
