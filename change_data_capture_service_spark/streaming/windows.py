"""Streaming analytics (SURVEY.md §2.2 X16): tumbling / sliding / session
windows, streaming dedup.

Each operator exists twice, by design:
- a **batch-equivalent** registered query (this module) whose semantics are
  identical to the streaming output once all data has arrived -- this is
  what the DuckDB oracle checks (tumbling = epoch-aligned truncation,
  sliding = the two-anchor expansion, session = gap islands);
- the **actual streaming shape** (``stream_*_query`` builders below) used
  over an unbounded source with watermarks; tests drive them with the file
  source + ``processAllAvailable`` and assert batch/stream equivalence.

This mirrors how Spark itself defines windowed streaming aggregation: the
result of a watermarked window agg, once complete, equals the batch window
agg over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, table_path
from ..registry import register

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # placeholder; swapped for the file's real type
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """events as an unbounded stream (file source; Kafka in production
    carries the same columns via the envelope).

    The streaming file source needs a user-supplied schema, and fixture
    generators have shipped ``ts`` as TIMESTAMP(NANOS) (only readable as raw
    long nanos), TIMESTAMP(MICROS) NTZ, and instant-typed micros. One footer
    read (driver-side, one file) picks the file's real type, then the stream
    normalizes to the catalog contract: instant-typed TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = sf_dir.rstrip("/")
    actual = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(path).schema["ts"].dataType
    )
    fields = [f if f.name != "ts" else T.StructField("ts", actual) for f in EVENTS_RAW_SCHEMA.fields]
    reader = spark.readStream.schema(T.StructType(fields))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # the file source needs a directory; events.parquet is a single file
    df = reader.option("pathGlobFilter", "events.parquet").parquet(path)
    if isinstance(actual, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


# ---------------------------------------------------------------------------
# batch-equivalent oracle-checked queries
# ---------------------------------------------------------------------------


@register(
    "stream_tumbling_count",
    tags=("streaming",),
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour count by event type. ``F.window`` is epoch-aligned,
    so window_start == date_trunc('hour') exactly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


@register(
    "stream_sliding_avg",
    tags=("streaming",),
    oracle="""
    SELECT CAST(date_trunc('hour', e.ts) - (o.off * INTERVAL 1 HOUR) AS TIMESTAMP) AS window_start,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events e
    CROSS JOIN (SELECT 0 AS off UNION ALL SELECT 1) o
    GROUP BY 1
    """,
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h width, 1h slide): every event belongs to exactly
    two windows; Spark's window() expands rows the same way the oracle's
    two-anchor cross join does. Decimal-sum/count => exact avg."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
                "avg_value"
            ),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), "avg_value", "n")
    )


@register(
    "stream_session",
    tags=("streaming",),
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    grouped AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM grouped
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user. ``session_window`` sessions
    are half-open ``[start, last_ts + gap)``: a gap of EXACTLY 30 minutes
    starts a new session, so the oracle's new-session predicate must be
    ``>=`` (a ``>`` oracle silently agrees on most fixtures and diverges the
    first time two events land exactly one gap apart)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_dedup",
    tags=("streaming",),
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) -- the deterministic batch twin of
    streaming ``dropDuplicates`` (which keeps first *arrival*; with an
    ordered source, arrival order = event_id order). min_by aggregation ->
    map-side partial reduction, not a window sort."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.min_by(F.struct("event_id", "ts"), F.col("event_id")).alias("r"))
        .select("user_id", "event_type", "r.event_id", "r.ts")
    )


# ---------------------------------------------------------------------------
# true streaming query builders (watermarked; driven in tests)
# ---------------------------------------------------------------------------


def tumbling_count_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling count: late events beyond the watermark are
    dropped; state for closed windows is evicted (bounded memory on an
    unbounded stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sliding_avg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "avg_value")
    )


def ohlc_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``ohlc_hourly`` rollup: min_by/max_by
    are algebraic aggregates, so the same one-pass OHLC runs incrementally
    under a watermark -- per-window state is four (value, order-key) pairs,
    evicted when the window closes. The continuously-maintained candle
    table a hypertable materializes."""
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.min_by("value", order).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order).alias("close_value"),
        )
        .select(F.col("w.start").alias("hour"), "n", "open_value", "high_value", "low_value", "close_value")
    )


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming dropDuplicates within the watermark horizon: state holds
    one entry per key only until the watermark passes -- the scalable shape
    for unbounded dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


# ---------------------------------------------------------------------------
# stream-stream interval join (X16 extension)
# ---------------------------------------------------------------------------


def interval_join_stream(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a click by the
    same user within the following 30 minutes. Both sides carry watermarks
    so Spark can bound the join state: a buffered click is evicted once the
    purchase-side watermark passes click.ts + 30min -- state is
    O(events in the attribution window), never O(stream). The range
    predicate is the state-eviction contract, not just a filter."""
    c = (
        clicks.withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


# ---------------------------------------------------------------------------
# stream-static enrichment join (X16 extension)
# ---------------------------------------------------------------------------


@register(
    "stream_enrich_join",
    tags=("streaming", "join"),
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join: change events
    decorated with the customer profile they belong to -- the most common
    CDC-consumer pattern (enrich the feed with reference data before it
    lands). The dim side broadcasts; at stream time the same join runs
    per micro-batch with zero state (the static side is a snapshot the
    planner re-broadcasts, no watermark needed)."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return e.join(
        F.broadcast(c), e["user_id"] == c["c_custkey"]
    ).select("event_id", "user_id", "c_name", "c_mktsegment", "value")


def enrich_join_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch of the unbounded side joins the
    static dimension broadcast-side. Stateless by construction -- nothing
    is buffered between batches, so it composes freely with downstream
    windows/sinks; the static side refreshes per batch if its source
    changes (Spark re-lists the files)."""
    return events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"]
    ).select("event_id", "user_id", "c_name", "c_mktsegment", "value")


def left_outer_interval_join_stream(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click appears exactly
    once -- matched rows as soon as the purchase arrives, unmatched rows
    with NULL purchase columns once the purchase-side watermark passes
    click.ts + 30min and Spark can PROVE no match is coming. The null
    emission is watermark-driven state eviction, not an end-of-stream
    sweep: at any point the buffered click state is bounded by the
    attribution window + watermark delay, same as the inner variant."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
        "leftOuter",
    )


@register(
    "stream_topk_windowed",
    tags=("streaming", "window"),
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY window_start ORDER BY n DESC, event_type) AS rnk
      FROM c
    ) t
    WHERE rnk <= 3
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k: the 3 busiest event types per tumbling hour -- the
    trending-now panel over the change stream. Batch-equivalent form of
    ``topk_windowed_stream`` below, same equivalence contract as every
    X16 operator: the streaming output, once all data is drained, equals
    this batch query (asserted in tests/test_streaming.py).

    Scale: the windowed count partial-aggregates to |windows| x |types|
    states before the rank window, and the rank partitions by window
    (parallel over windows, WindowGroupLimit keeps 3 per window map-side
    in Spark 4)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    c = (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    )
    return (
        c.withColumn("rnk", rk.cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "event_type", F.col("n").cast("bigint").alias("n"), "rnk")
    )


def topk_windowed_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """True-streaming half of stream_topk_windowed: watermarked tumbling
    counts per (window, type). Rank-within-window is not expressible as a
    streaming operator (it would re-sort every update), so the stream
    maintains the counts -- bounded state: |open windows| x |types| --
    and the top-k is a trivial batch query over the sink after each
    trigger, exactly how a serving layer reads a continuously-maintained
    leaderboard."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("count").alias("n"),
        )
    )


@register(
    "stream_interval_join",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.user_id AS c_user,
           CAST(c.event_id AS BIGINT) AS click_id,
           c.ts AS click_ts,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``interval_join_stream`` (the stream-stream inner
    interval join): every (click, purchase) pair for the same user where
    the purchase lands within 30 minutes after the click -- the
    attribution JOIN, as opposed to ``attribution_last_touch``'s pick-one
    reduction. Same X16 equivalence contract: the watermarked streaming
    join, once both sides drain, equals this batch query
    (tests/test_streaming.py drives the streaming half).

    Scale: ONE co-partitioned shuffle on user_id for both sides (the
    stream version buffers bounded state instead: a click is evicted once
    the purchase watermark passes click.ts + 30min -- the range predicate
    IS the eviction contract)."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").cast("bigint").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select(
        "c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


@register(
    "stream_interval_join_left",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.user_id AS c_user,
           CAST(c.event_id AS BIGINT) AS click_id,
           c.ts AS click_ts,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``left_outer_interval_join_stream``: every click
    appears at least once -- with its within-30-minutes purchases when
    they exist, with NULL purchase columns when none do (the unconverted
    clicks an attribution report must still count). In the streaming
    half the NULL rows are emitted by watermark-driven state eviction
    (Spark proves no match can still arrive); in this batch form they are
    the ordinary LEFT JOIN non-matches -- the equivalence once both
    streams drain is the X16 contract.

    Scale: same single co-partitioned user_id shuffle as the inner
    variant; the outer side never multiplies rows beyond its matches."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").cast("bigint").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left",
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts")


@register(
    "session_window_native",
    tags=("streaming", "window"),
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM x
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_no
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` operator (the dynamic-gap session
    TVF Structured Streaming uses for stateful session aggregation), run in
    batch and proven equal to the manual lag+cumsum gap-islands
    formulation: Spark defines a session's end as last-event + gap, and a
    strictly-greater-than-gap split -- exactly the islands the oracle
    derives, with session_end = max(ts) + 30min. Having BOTH forms
    oracle-checked pins that the engine's hand-rolled sessionizer
    (``sessionize_batch``) and the built-in operator agree on every
    boundary.

    Scale: session_window aggregates partially per partition then merges
    overlapping candidate sessions in ONE keyed shuffle -- same exchange
    budget as the manual form, with the merge logic in native code."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
