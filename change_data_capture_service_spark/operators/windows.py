"""Window-function operators (SURVEY.md §2.2 X6).

Determinism rule: every ORDER BY inside a window ends with a unique key
(o_orderkey / event_id) so ranks, frames, and offsets are reproducible
across engines. Running/moving float aggregates accumulate in DECIMAL and
cast to DOUBLE, mirrored in the oracles, for bit-stable results.

Registration order is part of the driver contract: the correctness driver
checks keys in registration order under a bounded budget, so the keys
without a CORRECTNESS row yet (cume_dist .. range_interval, unchecked in
r01) register before the seven already proven there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

def _by_cust_price():
    # built lazily: Column exprs need an active SparkContext
    return Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )


@register(
    "win_cume_dist",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS cd,
           round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS pr
    FROM orders
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank per customer (unique-key tiebreak; both are
    exact rationals of row counts, rounded identically in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "win_first_last",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id, event_type,
           first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame (the
    default frame would make last_value = current row -- classic trap)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@register(
    "win_range_frame",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cum_price
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (vs ROWS): peers with equal order keys share one frame
    value, so the cumulative sum is well-defined even when o_orderdate
    ties -- no unique-key tiebreaker needed, unlike every ROWS-frame query
    in this module. Decimal accumulation keeps both engines bit-equal."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("cum_price"),
    )


@register(
    "win_percent_nth",
    tags=("window",),
    oracle="""
    SELECT c_custkey, c_acctbal,
           round(percent_rank() OVER w, 6) AS pr,
           nth_value(c_custkey, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS third_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def win_percent_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + nth_value (full-partition frame). The c_custkey
    tiebreaker makes both deterministic; nth_value needs the explicit
    unbounded frame or rows past the 3rd see NULL."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.nth_value("c_custkey", 3).over(wf).alias("third_cust"),
    )


@register(
    "win_range_interval",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_30d
    FROM orders
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding frame: 30-day trailing revenue per customer.
    Spark's rangeBetween takes numeric offsets, so the ORDER BY key is the
    day number (datediff from epoch) and the frame is (-30, 0) -- exactly
    DuckDB's RANGE INTERVAL 30 DAYS. Same-day orders are frame peers in
    both engines, so the sum is well-defined under date ties."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("rev_30d"),
    )


@register(
    "win_rank",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
    FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per customer by order value."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.rank().over(_by_cust_price()).alias("rnk")
    )


@register(
    "win_dense_rank",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS INT) AS drnk
    FROM orders
    """,
)
def win_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank per customer (no gaps on ties) -- one keyed window
    shuffle with a deterministic tiebreak order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", "o_orderpriority", F.dense_rank().over(w).alias("drnk")
    )


@register(
    "win_row_number",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer in order-date order -- the unique-sequence
    window; (date, orderkey) ordering keeps it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))


@register(
    "win_lag_lead",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS next_ts,
           lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS type_2_back
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the per-user event sequence (the CDC 'previous image'
    lookup the reference stubs out for UPDATE events, ``replicator.go:396``)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.lag("event_type", 2).over(w).alias("type_2_back"),
    )


@register(
    "win_running_sum",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id, value,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS running_value
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user in event order (rows frame).

    Accumulates BIGINT cents inside the window frame instead of
    DECIMAL(18,2): the running total stays exact (cent sums are integers,
    well under 2^53) while the per-row accumulator op is a long add, not
    a 128-bit decimal add -- measured ~15-30%% off the window stage at
    sf0.1. The single /100.0 happens once per output row on the exact
    integer, correctly rounded identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("running_value"),
    )


@register(
    "win_moving_avg",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id, value,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY event_id
                      RANGE BETWEEN 20 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / count(value) OVER (PARTITION BY user_id ORDER BY event_id
                                RANGE BETWEEN 20 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a RANGE frame keyed on the numeric event ordinal
    (decimal-sum / count in both engines => exact)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rangeBetween(-20, 0)
    return e.select(
        "event_id",
        "user_id",
        "value",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("moving_avg"),
    )


@register(
    "win_ntile",
    tags=("window",),
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of customers by balance. Unpartitioned window =
    single-reducer sort; fine for dimension-sized inputs, never for fact
    tables (there you'd ntile within a partition key)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile"))


@register(
    "win_ignore_nulls",
    tags=("window",),
    oracle="""
    WITH x AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             END AS nval
      FROM events WHERE event_id % 7 = 0
    )
    SELECT event_id, user_id, nval,
           CAST(last_value(nval IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS locf_cents,
           CAST(first_value(nval IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS first_cents
    FROM x
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics as a driver-attested batch key:
    last-observation-carried-forward and first-seen value per user over a
    sparsified (every-3rd-NULL) cents column -- the null-skipping frame
    evaluation the locf_fill operator uses at spine grain, pinned here at
    raw event grain. The DataFrame API expresses it as
    ``F.last(col, ignorenulls=True)`` / ``F.first(..., True)``, which
    sidesteps the SQL-text dialect split the differential fuzzer
    documents (Spark parses the trailing SQL:2011 ``IGNORE NULLS``,
    DuckDB 1.0 only the in-argument form). One keyed window, running
    frame -- no second scan, map-side NULL synthesis."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = e.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 3 == 0, F.lit(None))
        .otherwise(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .alias("nval"),
    )
    return x.select(
        "event_id",
        "user_id",
        "nval",
        F.last("nval", ignorenulls=True).over(w).alias("locf_cents"),
        F.first("nval", ignorenulls=True).over(w).alias("first_cents"),
    )
