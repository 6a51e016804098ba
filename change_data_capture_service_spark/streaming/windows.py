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


# ---------------------------------------------------------------------------
# stream-stream LEFT SEMI / ANTI interval joins (X71 twins, round 10)
# ---------------------------------------------------------------------------


def left_semi_interval_join_stream(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT SEMI stream-stream interval join: the clicks that DID convert
    (>= 1 purchase by the same user within the following 30 minutes),
    each emitted exactly once with no purchase columns -- the EXISTS form
    of the attribution join, which is what a conversion-rate numerator
    wants (the inner join multiplies a click by its purchase count).
    Structured Streaming supports leftSemi natively for stream-stream
    joins; state bounds are the inner variant's (a buffered click evicts
    once the purchase watermark passes click.ts + 30min)."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
        "leftSemi",
    )


def anti_interval_join_stream(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT ANTI stream-stream interval join, expressed as the left-outer
    join filtered to watermark-evicted non-matches: the clicks that did
    NOT convert within 30 minutes. Structured Streaming does not support
    leftAnti between two streams (checked against the Spark 4 join-type
    matrix), but the OUTER join's NULL rows are emitted precisely when
    the watermark PROVES no match can arrive -- so filtering them is the
    anti join with identical state bounds and eviction timing. Each
    unconverted click appears exactly once."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    # The non-match detector must be a literal marker, not a data column:
    # a matching purchase row whose event_id happened to be NULL would
    # misclassify a converted click as unconverted.
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.lit(1).alias("p_matched"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
            "leftOuter",
        )
        .filter(F.col("p_matched").isNull())
        .select("c_user", "click_id", "click_ts")
    )


@register(
    "stream_interval_join_semi",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.user_id AS c_user,
           CAST(c.event_id AS BIGINT) AS click_id,
           c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_interval_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``left_semi_interval_join_stream``: clicks with at
    least one same-user purchase in the following 30 minutes, emitted
    once each (the conversion-rate numerator; the inner join's row count
    is purchase-weighted and over-counts multi-purchase clicks). X16
    equivalence contract: the watermarked streaming leftSemi join, once
    both sides drain, equals this EXISTS query
    (tests/test_streaming.py::test_stream_semi_anti_interval_joins_equal_batch).

    Scale: one co-partitioned user_id shuffle; the semi join never
    multiplies rows."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left_semi",
    )


@register(
    "stream_interval_join_anti",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.user_id AS c_user,
           CAST(c.event_id AS BIGINT) AS click_id,
           c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_interval_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``anti_interval_join_stream``: the clicks that did
    NOT convert within 30 minutes -- the retargeting audience / funnel
    drop-off list, and the complement of stream_interval_join_semi (the
    two partition the click stream; the equivalence test asserts exactly
    that). In the streaming half these rows are the left-outer join's
    watermark-evicted NULL emissions (stream-stream leftAnti is not in
    Spark's supported matrix; outer + IS NULL is the standard rewrite
    with the same state bounds).

    Scale: one co-partitioned user_id shuffle; anti join never
    multiplies rows."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left_anti",
    )


@register(
    "stream_ewma_anomaly",
    tags=("streaming", "timeseries", "stats"),
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(try_cast(try_cast(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS DECIMAL(38,0))) AS DOUBLE) / 100 AS v
      FROM events
      WHERE ts IS NOT NULL
        AND try_cast(try_cast(value AS DECIMAL(18,2)) * 100 AS BIGINT) IS NOT NULL
      GROUP BY 1, 2
    ),
    per AS (
      SELECT user_id,
             list(v ORDER BY day) AS vs,
             list(day ORDER BY day) AS ds
      FROM daily GROUP BY 1
    ),
    idx AS (
      SELECT user_id, vs, ds, generate_subscripts(vs, 1) AS i FROM per
    )
    SELECT user_id, ds[i] AS day,
           round(vs[i], 6) AS value_dollars,
           floor(list_reduce(list_slice(vs, 1, i),
                             (acc, x) -> 0.5 * x + 0.5 * acc) * 1e6) / 1e6
             AS ewma_dollars,
           floor(CASE WHEN i > 1
                 THEN vs[i] - list_reduce(list_slice(vs, 1, i - 1),
                                          (acc, x) -> 0.5 * x + 0.5 * acc)
                 END * 1e6) / 1e6 AS residual_dollars,
           CASE WHEN i > 1
                THEN abs(vs[i] - list_reduce(list_slice(vs, 1, i - 1),
                                             (acc, x) -> 0.5 * x + 0.5 * acc))
                     > 0.5 * abs(list_reduce(list_slice(vs, 1, i - 1),
                                             (acc, x) -> 0.5 * x + 0.5 * acc))
                ELSE FALSE END AS is_anomaly
    FROM idx
    """,
)
def stream_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily-spend EWMA (alpha = 0.5) with one-step-ahead
    residual anomaly flags: e_1 = v_1, e_d = 0.5 v_d + 0.5 e_(d-1);
    residual_d = v_d - e_(d-1); a day is anomalous when the residual
    exceeds half the forecast in magnitude -- the classic per-key
    EWMA control chart (Roberts 1959), keyed at the user grain. This is
    the BATCH TWIN of ``stateful.ewma_anomaly_stream`` (single-pass
    per-key state via applyInPandasWithState); equivalence once the
    stream drains is pinned in tests/test_streaming.py.

    Exactness: alpha = 0.5 keeps every EWMA weight a power of two, so
    the fold is EXACT binary arithmetic given the inputs; both engines
    evaluate the identical left fold over the identically-ordered daily
    list (Spark ``aggregate`` seeded with the first element over
    slice(2..); DuckDB ``list_reduce``, which seeds the same way), so
    doubles agree bit-for-bit. Daily sums accumulate as DECIMAL cents
    first. Output snapping uses floor(x * 1e6)/1e6, NOT round(x, 6):
    alpha = 0.5 makes many EWMAs EXACT decimal halves at the 7th digit
    (...3125), where Spark's HALF_UP and DuckDB's HALF_EVEN disagree --
    truncation is tie-free on identical doubles.

    Scale: the registered form materializes each user's day list and
    re-folds per prefix -- O(days^2) per key, honest at eval grain
    (fixture: <= 30 days/user). The production path IS the streaming
    twin: O(1) state and O(days) work per key. The two-tier contract is
    the knn_hubness_profile precedent."""
    e = load_table(spark, sf_dir, "events")
    cents = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    daily = (
        e.filter(F.col("ts").isNotNull() & cents.isNotNull())
        .groupBy(
            "user_id", F.date_trunc("day", "ts").cast("timestamp").alias("day")
        )
        .agg(
            (F.sum(cents.cast("decimal(38,0)")).cast("double") / 100).alias("v")
        )
    )
    per = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("arr")
    )
    idx = per.select(
        "user_id",
        F.expr("transform(arr, x -> x.v)").alias("vs"),
        F.posexplode(F.col("arr")).alias("pos", "row"),
    ).select(
        "user_id",
        "vs",
        (F.col("pos") + 1).alias("i"),
        F.col("row.day").alias("day"),
        F.col("row.v").alias("v"),
    )
    ewma_i = F.expr(
        "aggregate(slice(vs, 2, i - 1), element_at(vs, 1), (acc, x) -> 0.5D * x + 0.5D * acc)"
    )
    ewma_prev = F.expr(
        "CASE WHEN i > 1 THEN aggregate(slice(vs, 2, i - 2), element_at(vs, 1), (acc, x) -> 0.5D * x + 0.5D * acc) END"
    )
    return idx.select(
        "user_id",
        "day",
        F.round(F.col("v"), 6).alias("value_dollars"),
        (F.floor(ewma_i * 1e6) / 1e6).alias("ewma_dollars"),
        (F.floor((F.col("v") - ewma_prev) * 1e6) / 1e6).alias("residual_dollars"),
        F.coalesce(
            F.abs(F.col("v") - ewma_prev) > 0.5 * F.abs(ewma_prev), F.lit(False)
        ).alias("is_anomaly"),
    )
