"""Event-analytics operators (SURVEY.md §2.2 extension): ordered funnels,
cohort retention, and robust outlier detection over the ``events`` stream
-- the Kibana-dashboard queries the reference's consumers actually run
against the replicated index.

Scale design:
- the funnel is ONE keyed shuffle: per-user sorted per-stage timestamp
  arrays via collect_list inside a single aggregation, then pure array
  expressions walk the stage dependencies (first click AFTER first view,
  first purchase AFTER that click) -- no self-joins, no window re-sorts;
- cohorts join the per-user first-seen aggregate back to events on the
  same key the aggregate was produced on;
- MAD thresholds are per-type scalars (a handful of rows) -- broadcast,
  the fact table never shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .ranks import exact_ntile


def _first_after(sorted_ts: F.Column, prev: F.Column) -> F.Column:
    """Earliest timestamp in a sorted array strictly after ``prev`` (NULL if
    none / prev is NULL). try_element_at: the filtered array is EMPTY for a
    user who never reaches the next stage, and plain element_at throws
    under ANSI mode instead of returning NULL (latent until a
    view-without-click user exists -- caught by the 1-row corpus sweep)."""
    return F.when(
        prev.isNotNull(),
        F.try_element_at(F.filter(sorted_ts, lambda x: x > prev), F.lit(1)),
    )


@register(
    "funnel_steps",
    tags=("analytics",),
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM t1
    UNION ALL
    SELECT 'click' AS stage, CAST(count(*) AS BIGINT) AS users FROM t2
    UNION ALL
    SELECT 'purchase' AS stage, CAST(count(*) AS BIGINT) AS users FROM t3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: users counted at
    a stage only if it happened strictly AFTER their previous stage (the
    oracle's three dependent self-joins). The engine does it in ONE keyed
    shuffle: per-user sorted timestamp arrays per stage from a single
    aggregation, then array expressions chain the stages -- at 100 TB the
    three-self-join shape re-shuffles the fact table per stage; this
    shuffles it once."""
    e = load_table(spark, sf_dir, "events")

    def stage_ts(t: str) -> F.Column:
        return F.array_sort(
            F.collect_list(F.when(F.col("event_type") == t, F.col("ts")))
        )

    per_user = e.groupBy("user_id").agg(
        stage_ts("view").alias("views"),
        stage_ts("click").alias("clicks"),
        stage_ts("purchase").alias("purchases"),
    )
    t1 = F.try_element_at(F.col("views"), F.lit(1))
    t2 = _first_after(F.col("clicks"), t1)
    t3 = _first_after(F.col("purchases"), t2)
    flags = per_user.select(
        t1.isNotNull().cast("int").alias("s1"),
        t2.isNotNull().cast("int").alias("s2"),
        t3.isNotNull().cast("int").alias("s3"),
    ).agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"), F.sum("s3").alias("n3")
    )
    return flags.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("stage"), F.col("n1").alias("users")),
                F.struct(F.lit("click").alias("stage"), F.col("n2").alias("users")),
                F.struct(F.lit("purchase").alias("stage"), F.col("n3").alias("users")),
            )
        ).alias("r")
    ).select("r.stage", "r.users")


@register(
    "retention_cohorts",
    tags=("analytics",),
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS INT) AS week_n,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    distinct in each subsequent week. The first-seen aggregate and the
    events join share the user_id key, so the join reuses the aggregation's
    partitioning; the output is |cohorts| x |weeks| rows -- dashboard-sized
    regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_n"),
            "user_id",
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "sessionize_batch",
    tags=("analytics", "timeseries"),
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch twin of ``stream_session``,
    ``streaming/windows.py``): per-user sessions split on >30 min
    inactivity gaps, numbered by a running sum over the new-session flag
    -- the classic lag + cumsum shape. Gap arithmetic runs on
    ``unix_micros`` (exact integers) so both engines draw identical
    boundaries; (ts, event_id) tiebreaks nanosecond collisions.

    Scale: both windows partition by user_id -- ONE keyed shuffle, then
    the groupBy reuses the same partitioning (no second exchange). State
    per partition is one user's events; no global sort anywhere."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "event_transitions",
    tags=("analytics",),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix between consecutive event types per
    user (the Markov-chain view of the clickstream; what 'users who view
    then click' dashboards aggregate). lag() over the per-user order gives
    each event its predecessor, then a count per (from, to) pair.

    Scale: one keyed shuffle for the window; the follow-up groupBy reduces
    to |types|^2 rows with map-side combine. No self-join -- the naive
    e1 JOIN e2 ON consecutive formulation shuffles the fact table twice
    and breaks on duplicate timestamps."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    return (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "audience_overlap",
    tags=("analytics",),
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
    """,
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience Jaccard between event types: how much the user
    bases of any two event types overlap (segment-overlap analysis). The
    intersection self-join runs on the DISTINCT (type, user) set keyed by
    user_id -- per-user work is |types|^2 (bounded, small), never
    |events|^2. Per-type sizes are |types| scalar rows, broadcast into
    the final Jaccard projection.

    Scale: the fact table reduces before anything joins; the only shuffle
    of consequence is the distinct. The a < b predicate halves the pair
    space and makes output order-canonical."""
    e = load_table(spark, sf_dir, "events")
    # materialize-once: the reduced distinct set feeds the sizes agg and
    # BOTH self-join sides; unpersisted, each consumer re-scans the fact
    # table (measured 4 planned events scans).
    du = (
        e.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = du.groupBy("event_type").agg(F.count("*").alias("n"))
    a = du.alias("a")
    b = du.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")))
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "anomaly_mad",
    tags=("analytics",),
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS mad, any_value(med.m) AS m
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round(abs(e.value - mad.m) / (1.4826 * mad.mad), 6) AS score
    FROM events e JOIN mad ON e.event_type = mad.event_type
    WHERE mad.mad > 0 AND abs(e.value - mad.m) / (1.4826 * mad.mad) > 3
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type: modified z-score from the median /
    median-absolute-deviation (breakdown point 50%, unlike mean/stddev which
    a single 100 TB-tail value can drag). The per-type median and MAD are
    |types| scalar rows -- both joins BROADCAST them; the fact table never
    shuffles. Exact medians hold to ~billions of rows per group; beyond
    that swap ``percentile`` for ``approx_percentile`` and accept sketch
    tolerance."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - m), 0.5)").alias("mad"),
            F.first("m").alias("m"),
        )
    )
    # mad == 0 (majority of a type at the median) would divide by zero:
    # Spark yields NULL (row dropped), DuckDB yields inf (row kept) -- a
    # silent engine/oracle divergence. Excluding degenerate groups
    # explicitly, identically on both sides, keeps semantics defined.
    score = F.abs(F.col("value") - F.col("m")) / (1.4826 * F.col("mad"))
    return (
        e.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (score > 3))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(score, 6).alias("score"),
        )
    )


@register(
    "activity_streaks",
    tags=("analytics",),
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    islands AS (
      SELECT user_id, day,
             epoch_us(day) - row_number() OVER (PARTITION BY user_id ORDER BY day)
               * 86400000000 AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_len
      FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days,
           max(streak_len) AS best_streak
    FROM streaks GROUP BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands
    on the calendar, the engagement metric next to DAU): distinct active
    days, then the classic day - row_number trick -- consecutive days share
    one anchor value, so a plain count per (user, anchor) measures each
    streak. Day arithmetic runs in exact epoch microseconds so both
    engines draw identical island boundaries.

    Scale: the fact table reduces to DISTINCT (user, day) first (<= users
    x days rows); every later stage -- window, both aggs -- clusters on
    user_id and rides that one keyed shuffle."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        (F.unix_micros(F.col("day")) - F.row_number().over(w) * 86_400_000_000).alias(
            "anchor"
        ),
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.max("streak_len").alias("best_streak"),
    )


@register(
    "events_seasonality",
    tags=("analytics", "timeseries"),
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity matrix (the seasonality heatmap
    behind every traffic dashboard). Spark's dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday, so the engine subtracts one -- the kind of
    off-by-one that silently shifts a heatmap a day if unpinned. Output is
    at most 7 x 24 rows from one partial-agg pass."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "winsorize_stats",
    tags=("analytics", "quality"),
    oracle="""
    WITH pct AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(e.value), 6) AS DOUBLE) AS mean_raw,
           CAST(round(avg(CASE WHEN e.value < p.p05 THEN p.p05
                               WHEN e.value > p.p95 THEN p.p95
                               ELSE e.value END), 6) AS DOUBLE) AS mean_winsor,
           CAST(sum(CASE WHEN e.value < p.p05 OR e.value > p.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped
    FROM events e JOIN pct p ON e.event_type = p.event_type
    GROUP BY e.event_type
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clip to the [p05, p95] band and
    compare against the raw mean -- the robust-stats preprocessing step
    quality pipelines run before thresholding on a heavy-tailed metric.

    Scale shape: exact percentiles reduce to |types| rows in one pass,
    broadcast back onto the fact table (map-side join, no fact shuffle for
    the join), and the clipped aggregate is one more partial-agg pass.
    Swap percentile -> approx_percentile at petabyte scale for a
    single-pass sketch; kept exact here for the bit-stable oracle."""
    e = load_table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.when(F.col("value") < F.col("p05"), F.col("p05")).when(
        F.col("value") > F.col("p95"), F.col("p95")
    ).otherwise(F.col("value"))
    out_of_band = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).cast("double").alias("mean_raw"),
            F.round(F.avg(clipped), 6).cast("double").alias("mean_winsor"),
            F.sum(out_of_band.cast("bigint")).alias("n_clipped"),
        )
    )


@register(
    "iqr_outliers",
    tags=("analytics", "quality"),
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(round(any_value(q.q1), 6) AS DOUBLE) AS q1,
           CAST(round(any_value(q.q3), 6) AS DOUBLE) AS q3,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type (1.5 x IQR beyond the
    quartiles) -- the boxplot rule, complementing anomaly_mad's
    median-based fence with the quartile-based one.

    Same broadcast-scalars shape as anomaly_mad: quartiles reduce to
    |types| rows, broadcast onto the fact table, one conditional-agg pass.
    The fact table is never shuffled by the join."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("q1"), 6).cast("double").alias("q1"),
            F.round(F.first("q3"), 6).cast("double").alias("q3"),
            F.sum(is_out.cast("bigint")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@register(
    "ratio_to_report_daily",
    tags=("analytics", "timeseries"),
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(day AS TIMESTAMP) AS day, event_type,
           CAST(v AS DOUBLE) AS total_value,
           CAST(round(v / sum(v) OVER (PARTITION BY day), 6) AS DOUBLE) AS share_of_day,
           CAST(round(v / sum(v) OVER (), 6) AS DOUBLE) AS share_of_total
    FROM d
    """,
)
def ratio_to_report_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (day, type)'s share of its day and of the
    grand total -- the BI mix-shift metric (Oracle's RATIO_TO_REPORT,
    public SQL). Decimal day cells make every share a division of exact
    sums, so both engines agree to 6 dp.

    Scale: shares are windows over the |days|x|types| ROLLUP, not the
    fact table -- one partial-agg shuffle, then dashboard-sized windows.
    The unpartitioned grand-total window is safe for exactly that reason
    (single-reducer over thousands of rollup rows, never raw events)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    day_w = Window.partitionBy("day")
    all_w = Window.partitionBy()
    return d.select(
        "day",
        "event_type",
        F.col("v").cast("double").alias("total_value"),
        F.round(F.col("v") / F.sum("v").over(day_w), 6).cast("double").alias("share_of_day"),
        F.round(F.col("v") / F.sum("v").over(all_w), 6).cast("double").alias("share_of_total"),
    )


@register(
    "latency_percentiles_hourly",
    tags=("analytics", "timeseries", "agg"),
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(round(quantile_cont(value, 0.50), 6) AS DOUBLE) AS p50,
           CAST(round(quantile_cont(value, 0.95), 6) AS DOUBLE) AS p95,
           CAST(round(quantile_cont(value, 0.99), 6) AS DOUBLE) AS p99,
           CAST(round(max(value), 6) AS DOUBLE) AS p100,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_type = 'view'
    GROUP BY 1
    """,
)
def latency_percentiles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SLO dashboard rollup: p50/p95/p99/max of a metric per hour.
    Exact percentiles here (bit-stable oracle); the operator's scale story
    is the SHAPE -- percentile state accumulates per (hour) group in one
    partial-agg pass, so swapping in approx_percentile's fixed-size
    sketch (or the HLL-style mergeable KLL sketch) changes memory, not
    the plan. Contrast winsorize/iqr, which broadcast per-GROUP fences
    back onto facts; here the percentile IS the output."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    pcts = F.expr("percentile(value, array(0.50, 0.95, 0.99))")
    return e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.round(pcts[0], 6).cast("double").alias("p50"),
        F.round(pcts[1], 6).cast("double").alias("p95"),
        F.round(pcts[2], 6).cast("double").alias("p99"),
        F.round(F.max("value"), 6).cast("double").alias("p100"),
        F.count("*").alias("n"),
    )


@register(
    "trend_linear_fit",
    tags=("analytics", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(CAST(value AS DECIMAL(18,2))) AS y
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             datediff('day', DATE '2000-01-01', CAST(day AS DATE)) AS x, y
      FROM daily
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx
      FROM base GROUP BY 1
    )
    SELECT event_type,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n, 6) AS intercept
    FROM s
    """,
)
def trend_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily revenue: ordinary least squares
    y = slope*x + intercept fitted over (day-index, daily-sum) points --
    the dashboard "trend arrow" query (regr_slope/regr_intercept in
    warehouse SQL dialects).

    Cross-engine determinism: regr_* aggregates accumulate doubles in
    parallel (order-dependent), so the fit is computed closed-form from
    EXACT sums instead -- daily y through DECIMAL, x as integer day index,
    all five OLS sums exact, cast to double only for the final scalar
    arithmetic (identical IEEE expression in both engines).

    Scale: one partial agg reduces the fact table to (type, day) rows;
    the five-sum reduction and the closed-form division see |types| rows.
    Adding regressors = more exact sums, same two-shuffle shape."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("y"))
    base = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2000-01-01").cast("date")).alias("x"),
        "y",
    )
    s = base.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    # nullif'd denominator: a type whose events all land on one day has
    # sxx*n == sx*sx exactly; ANSI mode would throw DIVIDE_BY_ZERO, the
    # oracle's nullif yields NULL -- match it (same guard as rolling_corr_24h).
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        "event_type",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "events_value_zscore_day",
    tags=("analytics", "timeseries"),
    oracle="""
    WITH c AS (
      SELECT event_id, date_trunc('day', ts) AS day, value,
             TRY_CAST(TRY_CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x100
      FROM events
    ),
    s AS (
      SELECT day AS s_day,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x100) AS DOUBLE) AS sx,
             CAST(sum(x100 * x100) AS DOUBLE) AS sxx
      FROM c GROUP BY 1
    )
    SELECT c.event_id, c.day, c.value,
           round((c.x100 - s.sx / s.n)
                 / nullif(sqrt(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)), 0),
                 6) AS zscore
    FROM c JOIN s ON c.day = s.s_day
    """,
)
def events_value_zscore_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-day z-score of every event's value -- the per-row
    standardization step feeding anomaly triage (anomaly_mad is the
    robust-statistics sibling; this is the classical moments version).

    Cross-engine determinism: the fixture's values are exact at two
    decimals, so each value maps losslessly to integer cents (the
    DECIMAL(18,2) cast rounds identically in both engines) and the day's
    count / sum / sum-of-squares are EXACT BIGINT aggregates -- no decimal
    multiply (DuckDB's won't widen past int64/int128 operand storage) and
    no order-dependent float accumulation. The z-score is scale-invariant,
    so it is computed directly in the cents domain with one identical
    IEEE expression per engine; nullif makes a zero-variance day NULL
    instead of an ANSI divide-by-zero.

    Scale: one partial agg reduces facts to |days| stat rows, which
    broadcast back onto the fact scan -- the fact table shuffles zero
    times. (Cents squares bound: sum(x100^2) fits BIGINT while
    day_volume * max_value < ~10^14 "value-squared cents"; past that,
    widen the accumulator to DECIMAL(38,0) on both engines.)"""
    e = load_table(spark, sf_dir, "events")
    x100 = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    c = e.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
        x100.alias("x100"),
    )
    s = c.groupBy(F.col("day").alias("s_day")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x100").cast("double").alias("sx"),
        # squares through DECIMAL(38,0): a 1e15 value is 1e17 cents and
        # its square overflows BIGINT; the decimal accumulator holds to 1e38
        F.sum(F.col("x100").cast("decimal(38,0)") * F.col("x100"))
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    return c.join(F.broadcast(s), F.col("day") == F.col("s_day")).select(
        "event_id",
        "day",
        "value",
        F.round((F.col("x100") - mean) / F.nullif(std, F.lit(0)), 6).alias("zscore"),
    )


@register(
    "events_change_points",
    tags=("analytics", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS y100
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, CAST(y100 AS DOUBLE) / 100 AS daily_value,
             CAST(y100 AS DOUBLE) AS y,
             CAST(count(*) OVER trail AS BIGINT) AS n7,
             CAST(sum(y100) OVER trail AS DOUBLE) AS s7,
             CAST(sum(y100 * y100) OVER trail AS DOUBLE) AS sq7
      FROM daily
      WINDOW trail AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, daily_value,
           round(s7 / n7 / 100, 6) AS baseline_avg,
           round(abs(y - s7 / n7)
                 / nullif(sqrt(sq7 / n7 - (s7 / n7) * (s7 / n7)), 0), 6)
             AS n_sigma,
           CAST(round(abs(y - s7 / n7)
                 / nullif(sqrt(sq7 / n7 - (s7 / n7) * (s7 / n7)), 0), 6) > 2.0
             AS BOOLEAN) AS is_change_point
    FROM w WHERE n7 >= 7
    """,
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window change-point flags on the daily value series: a day
    is flagged when it sits more than 2 sigma from the mean of the prior
    seven days (frame 7 PRECEDING .. 1 PRECEDING -- the day under test is
    excluded from its own baseline). The alerting primitive behind
    "today looks wrong" dashboards; anomaly_mad is the distribution-wide
    robust cut, this is the sequential/trailing one.

    Determinism: daily totals are EXACT integer-cents sums (see
    events_value_zscore_day for why cents, not decimal squares); the
    trailing moments are BIGINT window sums, so the double-valued sigma
    expression is bit-identical across engines; sigma is scale-invariant
    so it's computed in the cents domain; the >2 flag compares the
    ROUNDED ratio so the boolean can't straddle a last-bit difference.
    nullif guards a flat week (sigma 0 -> NULL, not a throw).

    Scale: facts partial-agg to |days| rows; the only unpartitioned
    window runs over that tiny domain. At 100 TB nothing changes -- the
    day domain doesn't grow with data volume (daily cents totals past
    ~10^9 would need a DECIMAL(38,0) square accumulator on both sides)."""
    e = load_table(spark, sf_dir, "events")
    x100 = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(x100).cast("bigint").alias("y100")
    )
    trail = Window.orderBy("day").rowsBetween(-7, -1)
    w = daily.select(
        "day",
        (F.col("y100").cast("double") / 100).alias("daily_value"),
        F.col("y100").cast("double").alias("y"),
        F.count("*").over(trail).cast("bigint").alias("n7"),
        F.sum("y100").over(trail).cast("double").alias("s7"),
        F.sum(F.col("y100") * F.col("y100")).over(trail).cast("double").alias("sq7"),
    ).filter(F.col("n7") >= 7)
    mean7 = F.col("s7") / F.col("n7")
    sigma = F.sqrt(F.col("sq7") / F.col("n7") - mean7 * mean7)
    n_sigma = F.round(F.abs(F.col("y") - mean7) / F.nullif(sigma, F.lit(0)), 6)
    return w.select(
        "day",
        "daily_value",
        F.round(mean7 / 100, 6).alias("baseline_avg"),
        n_sigma.alias("n_sigma"),
        (n_sigma > 2.0).cast("boolean").alias("is_change_point"),
    )


@register(
    "events_props_value_stats",
    tags=("analytics", "cdc"),
    oracle="""
    SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_with_key,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM (
      SELECT event_type,
             TRY_CAST(CASE WHEN json_valid(props)
                           THEN json_extract_string(props, '$.k') END
                      AS BIGINT) AS k
      FROM events
    ) t
    GROUP BY event_type
    """,
)
def events_props_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: extract the integer property
    ``$.k`` from every event's JSON props and aggregate it per event type
    -- what a consumer does with the reference's schemaless ``data``
    payload (``cmd/es_consumer/main.go:23`` deserializes into
    ``map[string]interface{}`` and lets ES aggregate) without ever
    declaring a table schema for the payload.

    Integer domain end to end, so sums are exact on both engines. Scale:
    JSON path extraction is a map-side JVM expression (no UDF, codegen'd);
    the agg shuffles |event_type| partial states."""
    e = load_table(spark, sf_dir, "events")
    # try_cast: user payloads may carry non-numeric $.k -- extract NULL,
    # don't throw under ANSI (the dead-letter principle)
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_key"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


@register(
    "events_hourly_heatmap",
    tags=("analytics", "timeseries"),
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100 / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap with mean value -- the
    capacity-planning / traffic-shape tile on every ops dashboard.

    ISO day numbering (Monday=1) is constructed explicitly on both
    engines (Spark's ``dayofweek`` is Sunday-first, DuckDB's ``isodow``
    is ISO -- the off-by-one is the classic cross-engine trap); the mean
    rides the exact integer-cents sum. One partial agg, 7x24 output rows
    at any scale."""
    e = load_table(spark, sf_dir, "events")
    x100 = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    return (
        e.select(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
            x100.alias("x100"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("x100").cast("double") / 100 / F.count("*"), 6).alias(
                "avg_value"
            ),
        )
    )


@register(
    "sessionize_stats",
    tags=("analytics", "timeseries", "agg"),
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_no,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST((epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0
               AS DOUBLE) AS dur_min
      FROM numbered GROUP BY user_id, session_no
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS DOUBLE)
             AS avg_events,
           CAST(round(quantile_cont(n_events, 0.50), 6) AS DOUBLE) AS p50_events,
           CAST(round(quantile_cont(dur_min, 0.50), 6) AS DOUBLE) AS p50_dur_min,
           CAST(round(quantile_cont(dur_min, 0.95), 6) AS DOUBLE) AS p95_dur_min,
           CAST(round(max(dur_min), 6) AS DOUBLE) AS max_dur_min
    FROM sessions
    """,
)
def sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement summary over sessionize_batch's output: session
    count, mean/median events per session, median/p95/max duration --
    the one-row tile at the top of every product dashboard.

    Durations derive from exact integer microseconds (one double division
    at the end); percentiles are exact and interpolate identically in
    both engines (percentile <-> quantile_cont). Scale: one keyed shuffle
    to sessionize (both windows share the user partitioning), then the
    global stats reduce |sessions| rows through a partial agg."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    numbered = e.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 60_000_000.0
        ).alias("dur_min"),
    )
    return sessions.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.round(F.sum("n_events").cast("double") / F.count("*"), 6)
        .cast("double")
        .alias("avg_events"),
        F.round(F.expr("percentile(n_events, 0.50)"), 6)
        .cast("double")
        .alias("p50_events"),
        F.round(F.expr("percentile(dur_min, 0.50)"), 6)
        .cast("double")
        .alias("p50_dur_min"),
        F.round(F.expr("percentile(dur_min, 0.95)"), 6)
        .cast("double")
        .alias("p95_dur_min"),
        F.round(F.max("dur_min"), 6).cast("double").alias("max_dur_min"),
    )


@register(
    "events_peak_hour_by_type",
    tags=("analytics", "agg"),
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(hod AS INT) AS peak_hour,
           CAST(n AS BIGINT) AS peak_count
    FROM (
      SELECT event_type, hod, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, hod) AS rnk
      FROM hourly
    ) t WHERE rnk = 1
    """,
)
def events_peak_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak traffic hour per event type (max_by over the hourly rollup,
    lowest hour wins ties deterministically on both engines) -- the
    capacity headline each stream's dashboard leads with.

    Scale: two partial aggs, 24 x |types| intermediate rows."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count("*").cast("bigint").alias("n"))
    return hourly.groupBy("event_type").agg(
        F.expr("max_by(hod, struct(n, -hod))").cast("int").alias("peak_hour"),
        F.max("n").cast("bigint").alias("peak_count"),
    )


@register(
    "user_retention_day1_day7",
    tags=("analytics", "agg"),
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS d0
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    flags AS (
      SELECT f.user_id, f.d0,
             max(CASE WHEN datediff('day', f.d0, a.day) = 1 THEN 1 ELSE 0 END)
               AS r1,
             max(CASE WHEN datediff('day', f.d0, a.day) = 7 THEN 1 ELSE 0 END)
               AS r7
      FROM firsts f JOIN activity a ON f.user_id = a.user_id
      GROUP BY f.user_id, f.d0
    )
    SELECT d0 AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(r1) AS BIGINT) AS retained_d1,
           CAST(sum(r7) AS BIGINT) AS retained_d7,
           round(CAST(sum(r1) AS DOUBLE) / count(*), 6) AS d1_rate,
           round(CAST(sum(r7) AS DOUBLE) / count(*), 6) AS d7_rate
    FROM flags GROUP BY d0
    """,
)
def user_retention_day1_day7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-team headline: for each signup-day cohort, what fraction
    of users came back exactly one day and exactly seven days later.
    retention_cohorts is the full weekly triangle; this is the two-number
    summary executives actually read.

    Scale: first-seen and distinct-activity both partial-agg on user_id
    and join on that same key (one partitioning reused end-to-end); the
    flag reduction and cohort rollup see |users| then |days| rows."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0")
    )
    activity = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    offset = F.datediff(F.col("day"), F.col("d0"))
    flags = (
        firsts.join(activity, "user_id")
        .groupBy("user_id", "d0")
        .agg(
            F.max(F.when(offset == 1, 1).otherwise(0)).alias("r1"),
            F.max(F.when(offset == 7, 1).otherwise(0)).alias("r7"),
        )
    )
    return flags.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("r1").cast("bigint").alias("retained_d1"),
        F.sum("r7").cast("bigint").alias("retained_d7"),
        F.round(F.sum("r1").cast("double") / F.count("*"), 6).alias("d1_rate"),
        F.round(F.sum("r7").cast("double") / F.count("*"), 6).alias("d7_rate"),
    )


@register(
    "session_entry_exit_pages",
    tags=("analytics", "agg"),
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    ),
    ranked AS (
      SELECT user_id, session_no, event_type,
             row_number() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM numbered
    ),
    sessions AS (
      SELECT user_id, session_no,
             max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
             max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
      FROM ranked GROUP BY user_id, session_no
    )
    SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
    FROM sessions GROUP BY entry_type, exit_type
    """,
)
def session_entry_exit_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit profile of sessions: which event type opens a session
    and which closes it, counted over every (entry, exit) pair -- the
    landing/abandonment matrix of product analytics (an 'error' exit row
    is the rage-quit signal).

    First/last resolve by min_by/max_by over the (ts, event_id) total
    order -- deterministic under nanosecond collisions on both engines.
    Scale: the sessionizer's single keyed shuffle is reused by the
    session groupBy; the final matrix is |types|^2 rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    numbered = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.expr("min_by(event_type, struct(ts, event_id))").alias("entry_type"),
        F.expr("max_by(event_type, struct(ts, event_id))").alias("exit_type"),
    )
    return sessions.groupBy("entry_type", "exit_type").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )


@register(
    "events_burstiness",
    tags=("analytics", "timeseries", "agg"),
    oracle="""
    WITH per_min AS (
      SELECT event_type, date_trunc('minute', ts) AS minute,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS k,
             CAST(sum(n) AS DOUBLE) AS sx,
             CAST(sum(n * n) AS DOUBLE) AS sxx
      FROM per_min GROUP BY 1
    )
    SELECT event_type,
           CAST(sx AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS n_active_minutes,
           round(sx / k, 6) AS mean_per_min,
           round((sxx / k - (sx / k) * (sx / k))
                 / nullif(sx / k, 0), 6) AS fano_factor
    FROM s
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per stream: the Fano factor (variance/mean of
    per-active-minute counts). ~1 is Poisson-like arrival, >>1 is bursty
    (thundering herds, retry storms), <1 is paced -- the one-number shape
    diagnostic that decides provisioning headroom and backpressure
    settings (maxFilesPerTrigger in this engine's source).

    Exact BIGINT count moments; variance/mean is one identical double
    expression with a nullif guard. Scale: minute-grain partial agg then
    |types| closed-form rows."""
    e = load_table(spark, sf_dir, "events")
    per_min = e.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count("*").cast("bigint").alias("n"))
    s = per_min.groupBy("event_type").agg(
        F.count("*").cast("double").alias("k"),
        F.sum("n").cast("double").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("k")
    return s.select(
        "event_type",
        F.col("sx").cast("bigint").alias("n_events"),
        F.col("k").cast("bigint").alias("n_active_minutes"),
        F.round(mean, 6).alias("mean_per_min"),
        F.round(
            (F.col("sxx") / F.col("k") - mean * mean) / F.nullif(mean, F.lit(0)), 6
        ).alias("fano_factor"),
    )


@register(
    "events_user_ltv_deciles",
    tags=("analytics", "window", "agg"),
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS ltv_cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
      SELECT user_id, ltv_cents,
             CAST(ntile(10) OVER (ORDER BY ltv_cents DESC, user_id) AS INT)
               AS decile
      FROM u
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(ltv_cents) AS BIGINT) AS total_cents,
           round(CAST(sum(ltv_cents) AS DOUBLE) / count(*) / 100.0, 6)
             AS avg_ltv,
           round(CAST(min(ltv_cents) AS DOUBLE) / 100.0, 2) AS min_ltv,
           round(CAST(max(ltv_cents) AS DOUBLE) / 100.0, 2) AS max_ltv
    FROM d GROUP BY decile
    """,
)
def events_user_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value decile table: rank users by total purchase
    value, cut into ten equal bands, and profile each band -- the
    whale-curve summary (what share of revenue the top decile carries)
    that sits behind every monetization dashboard.

    LTV accumulates in exact integer cents; the decile cut is a
    deterministic ntile over (ltv desc, user_id), so band boundaries are
    identical across engines.

    Scale: per-user partial agg first (|users| rows -- the only
    fact-sized shuffle), then the decile cut runs as ``ranks.exact_ntile``
    (range-repartition on the sort key, per-range row_number, broadcast
    offsets) -- exact band edges with no single-reducer sort even at
    10^9 users."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    u = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(cents).cast("bigint").alias("ltv_cents"))
    )
    d = exact_ntile(
        u, 10, [F.col("ltv_cents").desc(), F.col("user_id")], "decile"
    )
    return d.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("ltv_cents").cast("bigint").alias("total_cents"),
        F.round(F.sum("ltv_cents").cast("double") / F.count("*") / 100.0, 6).alias(
            "avg_ltv"
        ),
        F.round(F.min("ltv_cents").cast("double") / 100.0, 2).alias("min_ltv"),
        F.round(F.max("ltv_cents").cast("double") / 100.0, 2).alias("max_ltv"),
    )


@register(
    "time_to_conversion_stats",
    tags=("analytics", "funnel", "agg"),
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
      GROUP BY 1
    ),
    c AS (
      SELECT CAST(date_trunc('day', su.signup_ts) AS TIMESTAMP) AS cohort_day,
             epoch_us(pu.first_purchase_ts) - epoch_us(su.signup_ts) AS gap_us
      FROM su JOIN pu ON su.user_id = pu.user_id
    )
    SELECT cohort_day,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5)
                 / 3600000000.0, 6) AS p50_hours,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9)
                 / 3600000000.0, 6) AS p90_hours
    FROM c GROUP BY cohort_day
    """,
)
def time_to_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel metric: for each signup-day cohort, the
    median and p90 hours from a user's first signup to their first
    subsequent purchase -- the latency companion to funnel_steps (which
    counts who converts, not how fast).

    First-touch timestamps reduce per user before any join; the gap is
    exact integer microseconds; percentiles interpolate over doubles
    derived from those exact gaps and round once.

    Scale: ONE fact scan and one user-keyed partial agg -- signup first
    touch via min(when), first subsequent purchase from a sorted per-user
    purchase-ts array (the funnel_steps array-walk shape; the earlier
    two-branch form scanned the fact table three times re-deriving the
    signup reduction). try_element_at: the filtered array is empty for
    never-converting users (NULL, ANSI-safe)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    first_purchase = F.try_element_at(
        F.filter(F.col("purchases"), lambda x: x >= F.col("signup_ts")), F.lit(1)
    )
    c = (
        per_user.filter(F.col("signup_ts").isNotNull())
        .withColumn("first_purchase_ts", first_purchase)
        .filter(F.col("first_purchase_ts").isNotNull())
        .select(
            F.date_trunc("day", "signup_ts").alias("cohort_day"),
            (
                F.unix_micros(F.col("first_purchase_ts"))
                - F.unix_micros(F.col("signup_ts"))
            ).alias("gap_us"),
        )
    )
    return c.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.5)) / 3600000000.0,
            6,
        ).alias("p50_hours"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.9)) / 3600000000.0,
            6,
        ).alias("p90_hours"),
    )


@register(
    "events_gini_concentration",
    tags=("analytics", "agg", "window"),
    oracle="""
    WITH u AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY cents, user_id) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM u
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(round((2.0 * CAST(sum(i * cents) AS BIGINT)
                       - (max(n) + 1) * max(tot))
                      / (CAST(max(n) AS DOUBLE) * max(tot)), 6) AS DOUBLE)
             AS gini
    FROM r GROUP BY event_type
    """,
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user value concentration within each event
    type: 0 = spend spread evenly across users, ->1 = a few whales carry
    everything -- the one-number inequality summary behind the LTV decile
    table (events_user_ltv_deciles gives the curve, this gives the area).

    Uses the exact rank formulation G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) over cent-scaled BIGINT totals: every term is exact integer
    arithmetic until the single final division, so the boundary is
    bit-identical across engines.

    Scale: the per-user reduction is the only fact-sized shuffle; the rank
    window runs over |users| reduced rows per type. At 100 TB the global
    per-type sort inside the window is the pressure point -- the
    documented swap is quantile-binned partial Ginis (broadcast
    approx-percentile boundaries, the rfm/ltv pattern), trading exactness
    for a parallel cut."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    u = e.groupBy("event_type", "user_id").agg(
        F.sum(cents).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "user_id")
    wa = Window.partitionBy("event_type")
    r = u.select(
        "event_type",
        "cents",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.count("*").over(wa).cast("bigint").alias("n"),
        F.sum("cents").over(wa).cast("bigint").alias("tot"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.round(
            (
                2.0 * F.sum(F.col("i") * F.col("cents")).cast("bigint")
                - (F.max("n") + 1) * F.max("tot")
            )
            / (F.max("n").cast("double") * F.max("tot")),
            6,
        )
        .cast("double")
        .alias("gini"),
    )


@register(
    "events_hourly_autocorr",
    tags=("analytics", "timeseries", "window"),
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type, c AS y,
             lag(c) OVER (PARTITION BY event_type ORDER BY hour) AS x
      FROM h
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM p WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n AS n_pairs,
           CAST(round((n * sxy - sx * sy)
                      / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
                      6) AS DOUBLE) AS autocorr_lag1
    FROM s
    """,
)
def events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly event volume per stream: near 1 =
    smooth/diurnal load (safe to autoscale on a moving average), near 0 =
    memoryless arrivals, negative = oscillating retry storms. With
    events_burstiness (Fano factor) this completes the arrival-process
    profile that sizes micro-batch triggers.

    All five moments accumulate as exact BIGINTs over hourly counts
    (adjacent observed hours pair via one lag window); doubles appear only
    in the final Pearson expression, sqrt being IEEE-exact on both
    engines.

    Scale: the hourly rollup is the fact-sized partial agg; the lag window
    and the moment agg both run on |hours| rows per type and share the
    event_type partitioning -- one reduced-relation shuffle after the
    rollup."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("hour")
    p = h.select(
        "event_type",
        F.col("c").alias("y"),
        F.lag("c").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = p.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    denom = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(denom, F.lit(0)),
            6,
        )
        .cast("double")
        .alias("autocorr_lag1"),
    )


@register(
    "events_entry_paths_topk",
    tags=("analytics", "window"),
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM s WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def events_entry_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-three-event paths across users: the onboarding-flow
    Sankey's source data (which openings actually happen, and how often)
    -- the sequence-mining companion to event_transitions' single-step
    matrix.

    Scale: the rank filter (rn <= 3) is a WindowGroupLimit, so map tasks
    keep only 3 rows per user BEFORE the user-keyed shuffle; path assembly
    sorts the 3-element struct array per user (array_sort on (rn, type)
    -- deterministic, engine-agnostic); path counting partial-aggregates
    to |distinct paths| and top-20 is TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
    p = s.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


@register(
    "attribution_last_touch",
    tags=("analytics", "window"),
    oracle="""
    WITH a AS (
      SELECT user_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
      FROM events
    )
    SELECT coalesce(src, 'direct') AS source,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT)) AS DOUBLE) / 100, 2)
                AS DOUBLE) AS attributed_value
    FROM a WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits the user's
    most recent PRECEDING non-purchase event type ('direct' when the
    purchase is the user's first touch) -- the default attribution model
    of every marketing warehouse, and the business query the funnel/
    transition operators feed.

    Scale: the same single-keyed-shuffle as-of shape as join_asof --
    last(ignorenulls) over the user/time window resolves the touch
    without any self-join, so the fact table shuffles once and no
    |purchases| x |events| range pairing ever forms. Revenue accumulates
    as exact BIGINT cents; one display division at the end."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    src = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        e.select("event_type", cents.alias("cents"), src.alias("src"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("src"), F.lit("direct")).alias("source"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.round(F.sum("cents").cast("double") / 100, 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "events_cumulative_reach",
    tags=("analytics", "window"),
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS first_day
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
             AS cumulative_reach
    FROM d ORDER BY day
    """,
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative reach curve: per day, the users seen for the FIRST time
    and the running total of distinct users ever reached -- the growth
    chart every product review opens with. Computed exactly without any
    distinct-over-window (which neither engine supports): reduce each
    user to a first-seen day, then a plain running sum over the day
    domain.

    Scale: the first-seen reduction is the only fact-sized shuffle
    (min partial-aggregates map-side per user); the day rollup and the
    prefix sum run on |days| rows -- the same reduced-domain
    single-partition window as the backlog sweep-line, thousands of rows
    forever."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_reach"),
    ).orderBy("day")


@register(
    "funnel_attribution_sessions",
    tags=("analytics", "window", "northstar"),
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    ),
    a AS (
      SELECT user_id, session_no, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id, session_no ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
      FROM s
    )
    SELECT coalesce(src, 'direct') AS source,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id || '#' || session_no) AS BIGINT)
             AS n_sessions,
           CAST(round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT)) AS DOUBLE) / 100, 2)
                AS DOUBLE) AS attributed_value
    FROM a WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def funnel_attribution_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain last-touch attribution: each purchase credits the most
    recent non-purchase touch WITHIN ITS OWN 30-minute-gap session
    ('direct' when the purchase opens the session) -- the composition the
    marketing warehouse actually runs, joining the sessionizer's boundary
    logic (sessionize_batch) with last-touch credit assignment
    (attribution_last_touch). Cross-session touches never get credit,
    which is the behavioral difference vs the user-lifetime model.

    Scale: ONE user-keyed shuffle serves the whole query -- the session
    numbering window, the in-session touch window (partitioned by
    (user_id, session_no), a refinement of the same key, so Catalyst
    reuses the exchange and only re-sorts), and the purchase filter are
    all pipelined before the final dim-sized source rollup. Revenue
    accumulates as exact BIGINT cents. The session-count aggregate
    dedups (user, session) pairs per source -- bounded by |sessions|,
    not |events|."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    src = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(ws)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        numbered.withColumn("src", src)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("src"), F.lit("direct")).alias("source"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id", "session_no").cast("bigint").alias("n_sessions"),
            F.round(F.sum(cents).cast("double") / 100, 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "events_user_event_diversity",
    tags=("analytics", "agg"),
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CAST(round(c * ln(c), 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS sum_clnc
      FROM c GROUP BY 1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, n_events, n_types,
           round(ln(n_events) - sum_clnc / n_events, 6) AS type_entropy
    FROM u ORDER BY user_id
    """,
)
def events_user_event_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: Shannon entropy over the user's
    event-type distribution (0 = does one thing; ln(n_types) = uses
    everything equally) -- the engagement-breadth feature every churn and
    LTV model starts from.

    Scale: two partial aggs on the same user-keyed shuffle ((user, type)
    counts, then |users| states). Entropy comes from EXACT counts via
    ln(n) - sum(c ln c)/n; the per-type c*ln(c) terms snap to DECIMAL(9dp)
    before summing so accumulation order cannot flip the 6dp output."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("sum_clnc"),
    )
    return (
        u.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "n_events",
            "n_types",
            F.round(
                F.log(F.col("n_events")) - F.col("sum_clnc") / F.col("n_events"), 6
            ).alias("type_entropy"),
        )
        .orderBy("user_id")
    )


@register(
    "events_daily_new_vs_returning",
    tags=("analytics", "agg"),
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS first_day
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day, e.user_id,
             f.first_day
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT day,
           CAST(count(DISTINCT CASE WHEN day = first_day THEN user_id END)
                AS BIGINT) AS new_users,
           CAST(count(DISTINCT CASE WHEN day > first_day THEN user_id END)
                AS BIGINT) AS returning_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def events_daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives split into first-ever-seen-today vs returning -- the
    growth-vs-retention decomposition on every product dashboard.

    Scale: the first-day rollup is one user-keyed partial agg; it joins
    back on the SAME user key (no extra exchange beyond the day rollup);
    the two conditional distincts share one expand pass. At 100 TB the
    first-day table is the incrementally-maintained dimension this
    recomputation checks against."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("first_day"))
    d = e.select(F.date_trunc("day", "ts").alias("day"), "user_id").join(f, "user_id")
    return (
        d.groupBy("day")
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("new_users"),
            F.count_distinct(
                F.when(F.col("day") > F.col("first_day"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("returning_users"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("day")
    )


@register(
    "events_dau_wau_ratio",
    tags=("analytics", "agg"),
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day,
           CAST(count(DISTINCT CASE WHEN ud.day = d.day THEN ud.user_id END)
                AS BIGINT) AS dau,
           CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau,
           round(CAST(count(DISTINCT CASE WHEN ud.day = d.day
                                          THEN ud.user_id END) AS DOUBLE)
                 / count(DISTINCT ud.user_id), 6) AS stickiness
    FROM days d JOIN ud
      ON ud.day <= d.day AND ud.day >= d.day - INTERVAL 6 DAY
    GROUP BY 1 ORDER BY 1
    """,
)
def events_dau_wau_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and the DAU/WAU stickiness ratio per day
    -- THE engagement-frequency metric ("how many weekly users show up on
    a given day").

    Scale: events first dedupe to (user, day) pairs -- the only
    data-scaled agg; the 7-day containment joins that rollup against the
    tiny distinct-days dim (broadcast, range predicate), expanding each
    user-day into at most 7 day-buckets before the per-day distinct.
    Nothing ever pairs users with users."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    days = ud.select(F.col("day").alias("d")).distinct()
    j = ud.join(
        F.broadcast(days),
        (F.col("day") <= F.col("d"))
        & (F.col("day") >= F.col("d") - F.expr("INTERVAL 6 DAY")),
    )
    return (
        j.groupBy(F.col("d").alias("day"))
        .agg(
            F.count_distinct(F.when(F.col("day") == F.col("d"), F.col("user_id")))
            .cast("bigint")
            .alias("dau"),
            F.count_distinct("user_id").cast("bigint").alias("wau"),
            F.round(
                F.count_distinct(
                    F.when(F.col("day") == F.col("d"), F.col("user_id"))
                ).cast("double")
                / F.count_distinct("user_id"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "events_session_depth_dist",
    tags=("analytics", "window"),
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    ),
    depth AS (
      SELECT user_id, session_no, CAST(count(*) AS BIGINT) AS depth
      FROM s GROUP BY 1, 2
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_sessions
    FROM depth GROUP BY 1 ORDER BY 1
    """,
)
def events_session_depth_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session depth (events per 30-min-gap session): the
    histogram that separates bounce traffic (depth 1-2) from engaged use
    -- the first summary anyone asks of the sessionizer.

    Scale: the session numbering reuses sessionize_batch's single
    user-keyed shuffle; the depth rollup rides the same partitioning and
    the final histogram is |distinct depths| states -- tiny."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    numbered = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("ns"),
    ).select(
        "user_id",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_no"),
    )
    depth = numbered.groupBy("user_id", "session_no").agg(
        F.count("*").cast("bigint").alias("depth")
    )
    return (
        depth.groupBy("depth")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy("depth")
    )


@register(
    "events_lifecycle_stages",
    tags=("analytics", "window"),
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    ),
    lagged AS (
      SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
      FROM uw
    ),
    staged AS (
      SELECT week,
             CASE WHEN prev_week IS NULL THEN 'new'
                  WHEN week = prev_week + INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS stage
      FROM lagged
    ),
    counts AS (
      SELECT week, CAST(count(*) FILTER (WHERE stage = 'new') AS BIGINT) AS n_new,
             CAST(count(*) FILTER (WHERE stage = 'retained') AS BIGINT) AS n_retained,
             CAST(count(*) FILTER (WHERE stage = 'resurrected') AS BIGINT)
               AS n_resurrected,
             CAST(count(*) AS BIGINT) AS n_active
      FROM staged GROUP BY 1
    )
    SELECT c.week, c.n_new, c.n_retained, c.n_resurrected, c.n_active,
           CAST(coalesce(p.n_active, 0) - c.n_retained AS BIGINT) AS n_churned
    FROM counts c
    LEFT JOIN counts p ON p.week = c.week - INTERVAL 7 DAY
    ORDER BY c.week
    """,
)
def events_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: actives decomposed into new (first week
    ever), retained (also active the immediately preceding week), and
    resurrected (returning after a gap), plus churned = last week's
    actives who did not retain -- the canonical startup growth table
    (new + retained + resurrected - churned = net weekly change).

    Scale: ONE user-keyed shuffle produces the distinct user-weeks and
    the lag window; the stage rollup is |weeks| x 3 states, and churn
    derives from the rollup joined to itself shifted one week (dim-scale,
    robust to empty weeks, no second pass over events)."""
    e = load_table(spark, sf_dir, "events")
    uw = e.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    staged = uw.withColumn("prev_week", F.lag("week").over(w)).select(
        "week",
        F.when(F.col("prev_week").isNull(), "new")
        .when(F.col("week") == F.col("prev_week") + F.expr("INTERVAL 7 DAY"), "retained")
        .otherwise("resurrected")
        .alias("stage"),
    )
    counts = staged.groupBy("week").agg(
        F.count_if(F.col("stage") == "new").cast("bigint").alias("n_new"),
        F.count_if(F.col("stage") == "retained").cast("bigint").alias("n_retained"),
        F.count_if(F.col("stage") == "resurrected").cast("bigint").alias("n_resurrected"),
        F.count("*").cast("bigint").alias("n_active"),
    )
    p = counts.select(
        (F.col("week") + F.expr("INTERVAL 7 DAY")).alias("week"),
        F.col("n_active").alias("prev_active"),
    )
    return (
        counts.join(p, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            "n_active",
            (F.coalesce(F.col("prev_active"), F.lit(0)) - F.col("n_retained"))
            .cast("bigint")
            .alias("n_churned"),
        )
        .orderBy("week")
    )


@register(
    "events_bounce_rate_daily",
    tags=("analytics", "window", "agg"),
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
    ),
    g AS (
      SELECT user_id, session_no, min(ts) AS session_start,
             CAST(count(*) AS BIGINT) AS n_events
      FROM s GROUP BY 1, 2
    )
    SELECT date_trunc('day', session_start) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS bounce_rate
    FROM g GROUP BY 1 ORDER BY 1
    """,
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-min-gap sessions that contain exactly
    one event, keyed by session start day -- the engagement-health daily
    the depth distribution (``events_session_depth_dist``) summarizes
    without a time axis. Session boundaries use the same exact
    ``unix_micros`` arithmetic as ``sessionize_batch``.

    Scale: ONE keyed shuffle on user_id feeds both windows and the session
    groupBy (same partitioning, no extra exchange); the day rollup is
    |days|-state."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    g = numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        g.groupBy(F.date_trunc("day", F.col("session_start")).alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            bounce.cast("bigint").alias("n_bounces"),
            F.round(bounce.cast("double") / F.count("*"), 6).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@register(
    "events_weekday_weekend_mix",
    tags=("analytics", "agg"),
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN isodow(ts) <= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekday,
           CAST(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekend,
           round(CAST(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS weekend_share
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def events_weekday_weekend_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday vs weekend traffic mix per event type (is 'purchase' a
    weekend behavior?). ISO day-of-week derived the same way as
    ``shipdate_dow_revenue`` so Sunday lands in the weekend bucket on both
    engines.

    Scale: map-side date arithmetic + ONE |types|-state partial agg."""
    e = load_table(spark, sf_dir, "events")
    dow_iso = (F.dayofweek(F.col("ts")) + 5) % 7 + 1
    wknd = F.sum(F.when(dow_iso >= 6, 1).otherwise(0))
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(dow_iso <= 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_weekday"),
            wknd.cast("bigint").alias("n_weekend"),
            F.round(wknd.cast("double") / F.count("*"), 6).alias("weekend_share"),
        )
        .orderBy("event_type")
    )


@register(
    "events_first_touch_type_share",
    tags=("analytics", "agg"),
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    f AS (SELECT user_id, event_type FROM r WHERE rn = 1)
    SELECT event_type AS first_event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM f), 6) AS share
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def events_first_touch_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition mix: each user's FIRST event type (the first-touch twin
    of ``attribution_last_touch``) and its share of the user base --
    which front door brings people in. (ts, event_id) tiebreaks identical
    timestamps deterministically.

    Scale: no window over the fact table -- ``min_by`` on a (ts, event_id)
    struct collapses to |users| rows in ONE partial agg; the share divides
    by a 1-row broadcast total."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min_by(F.col("event_type"), F.struct("ts", "event_id")).alias(
            "first_event_type"
        )
    )
    per_type = f.groupBy("first_event_type").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    tot = per_type.agg(F.sum("n_users").cast("double").alias("total"))
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "first_event_type",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("total"), 6).alias("share"),
        )
        .orderBy("first_event_type")
    )


@register(
    "events_seasonal_residual_anomaly",
    tags=("analytics", "agg", "timeseries"),
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(isodow(ts) AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    prof AS (
      SELECT dow, hod,
             CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(n) AS BIGINT) AS s1,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM h GROUP BY 1, 2
    )
    SELECT h.hour, h.n,
           round(CAST(p.s1 AS DOUBLE) / p.n_samples, 4) AS expected,
           round((h.n - CAST(p.s1 AS DOUBLE) / p.n_samples)
                 / sqrt((CAST(p.s2 AS DOUBLE)
                         - CAST(p.s1 AS DOUBLE) * p.s1 / p.n_samples)
                        / (p.n_samples - 1)), 4) AS z
    FROM h JOIN prof p ON h.dow = p.dow AND h.hod = p.hod
    WHERE p.n_samples >= 3
      AND CAST(p.s2 AS DOUBLE) * p.n_samples > CAST(p.s1 AS DOUBLE) * p.s1
    ORDER BY abs(round((h.n - CAST(p.s1 AS DOUBLE) / p.n_samples)
                 / sqrt((CAST(p.s2 AS DOUBLE)
                         - CAST(p.s1 AS DOUBLE) * p.s1 / p.n_samples)
                        / (p.n_samples - 1)), 4)) DESC, h.hour
    LIMIT 10
    """,
)
def events_seasonal_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: each hour's traffic is scored
    against the mean/stddev of ITS OWN (iso-dow, hour-of-day) cell -- a
    Tuesday-3pm spike is judged against other Tuesday-3pms, not the global
    mean, which is what makes this usable on strongly diurnal change
    streams where ``anomaly_mad``'s per-type global threshold would flag
    every rush hour. Output is the top-10 hours by |z| (a RANKING, not a
    fixed threshold: with k weekly samples per cell the sample z is
    mathematically bounded by (k-1)/sqrt(k), so any fixed cutoff is either
    dead or saturated until months of history accumulate -- the on-call
    view is 'worst hours first' regardless). Requires >=3 samples and
    nonzero variance. Every moment is an exact BIGINT; the z closed form
    is bit-identical across engines (IEEE ops on exact inputs, identical
    expression shape), and the rank key is the 4-dp ROUNDED |z| with the
    hour as tiebreaker, so ordering cannot flap.

    Scale: the fact scan collapses to |hours| rows in ONE partial agg; the
    168-cell profile is a second tiny agg broadcast back onto the hourly
    rollup. The candidate hour is included in its own profile (documented
    bias, vanishing as weeks accumulate)."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        ((F.dayofweek(F.col("ts")) + 5) % 7 + 1).cast("int").alias("dow"),
        F.hour(F.col("ts")).cast("int").alias("hod"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    prof = h.groupBy("dow", "hod").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_samples")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_samples")
    ) / (F.col("n_samples") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        h.join(F.broadcast(prof), ["dow", "hod"])
        .filter(
            (F.col("n_samples") >= 3)
            & (
                F.col("s2").cast("double") * F.col("n_samples")
                > F.col("s1").cast("double") * F.col("s1")
            )
        )
        .select(
            "hour",
            "n",
            F.round(mean, 4).alias("expected"),
            F.round(z, 4).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), "hour")
        .limit(10)
    )


@register(
    "events_value_psi_weekly",
    tags=("analytics", "quality", "agg"),
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('day', ts)) AS lo,
             date_trunc('day', max(ts)) - INTERVAL 6 DAY AS cur_lo
      FROM events
    ),
    ref AS (
      SELECT e.event_type, e.value FROM events e CROSS JOIN b
      WHERE e.ts < b.lo + INTERVAL 7 DAY
    ),
    cur AS (
      SELECT e.event_type, e.value FROM events e CROSS JOIN b
      WHERE e.ts >= b.cur_lo
    ),
    edges AS (
      SELECT event_type,
             quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS es
      FROM ref GROUP BY 1
    ),
    rb AS (
      SELECT r.event_type,
             len(list_filter(e.es, x -> r.value > x)) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM ref r JOIN edges e USING (event_type) GROUP BY 1, 2
    ),
    cb AS (
      SELECT c.event_type,
             len(list_filter(e.es, x -> c.value > x)) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM cur c JOIN edges e USING (event_type) GROUP BY 1, 2
    ),
    grid AS (
      SELECT DISTINCT event_type, r.range AS bucket
      FROM edges CROSS JOIN range(0, 10) r
    ),
    tot AS (
      SELECT g.event_type, g.bucket,
             coalesce(rb.n, 0) AS rn, coalesce(cb.n, 0) AS cn,
             sum(coalesce(rb.n, 0)) OVER (PARTITION BY g.event_type) AS rtot,
             sum(coalesce(cb.n, 0)) OVER (PARTITION BY g.event_type) AS ctot
      FROM grid g
      LEFT JOIN rb ON g.event_type = rb.event_type AND g.bucket = rb.bucket
      LEFT JOIN cb ON g.event_type = cb.event_type AND g.bucket = cb.bucket
    )
    SELECT event_type,
           CAST(min(rtot) AS BIGINT) AS n_ref,
           CAST(min(ctot) AS BIGINT) AS n_cur,
           round(CAST(sum(CAST(round(
             ((rn + 1.0) / (rtot + 10) - (cn + 1.0) / (ctot + 10))
             * ln(((rn + 1.0) / (rtot + 10)) / ((cn + 1.0) / (ctot + 10))), 6)
             AS DECIMAL(18,6))) AS DOUBLE), 6) AS psi
    FROM tot GROUP BY 1 ORDER BY 1
    """,
)
def events_value_psi_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution, first week vs
    last week, per event type -- THE drift gate every ML feature pipeline
    runs before retraining (PSI > 0.25 = distribution moved, re-fit).
    Decile edges come from the REFERENCE week only (the deployed-model
    convention); both windows bucket against those edges with identical
    strict-> comparisons, Laplace (+1/+10) smoothing keeps empty buckets
    finite, and each bucket's PSI term snaps to 6 dp DECIMAL before the
    sum.

    Scale: exactly TWO fact scans by construction -- the edge-fit pass
    and one combined bucketing pass with conditional window counts (plus
    the 1-row bounds pass); the |types|-row edge table broadcasts and
    persists; the dense bucket grid is |types| x 10 rows forever.
    Bucketing is size(filter(edges, x -> value > x)) -- a JVM array fold
    against the broadcast edges, no per-row Python anywhere."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # two passes over the fact table, by construction: pass A fits the
    # reference-week decile edges, pass B buckets BOTH windows in one scan
    # with conditional counts. The 1-row bounds and |types|-row edges
    # persist -- re-deriving either costs a fact scan per consumer
    # (measured 10 planned scans with branch-per-window groupBys).
    b = e.agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("lo"),
        (F.date_trunc("day", F.max("ts")) - F.expr("INTERVAL 6 DAY")).alias("cur_lo"),
    ).localCheckpoint(eager=False)
    ev = e.crossJoin(F.broadcast(b))
    is_ref = F.col("ts") < F.col("lo") + F.expr("INTERVAL 7 DAY")
    is_cur = F.col("ts") >= F.col("cur_lo")
    edges = (
        ev.filter(is_ref)
        .groupBy("event_type")
        .agg(
            F.percentile(
                "value", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
            ).alias("es")
        )
        .localCheckpoint(eager=False)
    )
    both = (
        ev.filter(is_ref | is_cur)
        .join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            F.size(F.filter(F.col("es"), lambda x: F.col("value") > x)).alias("bucket"),
            is_ref.cast("int").alias("in_ref"),
            is_cur.cast("int").alias("in_cur"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("in_ref").cast("bigint").alias("rn"),
            F.sum("in_cur").cast("bigint").alias("cn"),
        )
    )
    grid = edges.select(
        "event_type", F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("bucket")
    )
    wt = Window.partitionBy("event_type")
    tot = (
        grid.join(both, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            F.coalesce("rn", F.lit(0)).alias("rn"),
            F.coalesce("cn", F.lit(0)).alias("cn"),
        )
        .select(
            "event_type",
            "rn",
            "cn",
            F.sum("rn").over(wt).alias("rtot"),
            F.sum("cn").over(wt).alias("ctot"),
        )
    )
    p = (F.col("rn") + 1.0) / (F.col("rtot") + 10)
    q = (F.col("cn") + 1.0) / (F.col("ctot") + 10)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        tot.groupBy("event_type")
        .agg(
            F.min("rtot").cast("bigint").alias("n_ref"),
            F.min("ctot").cast("bigint").alias("n_cur"),
            F.round(F.sum(term).cast("double"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


@register(
    "events_cohort_ltv_curve",
    tags=("analytics", "agg"),
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    wk AS (
      SELECT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
                  AS INT) AS week_no,
             CAST(sum(TRY_CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS v_c
      FROM events e JOIN f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2, 3
    ),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users FROM f GROUP BY 1),
    curve AS (
      SELECT cohort_week, week_no,
             CAST(sum(v_c) AS BIGINT) AS week_value_c
      FROM wk GROUP BY 1, 2
    )
    SELECT c.cohort_week, c.week_no, s.cohort_users,
           round(CAST(sum(c.week_value_c) OVER (
                   PARTITION BY c.cohort_week ORDER BY c.week_no
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 100 / s.cohort_users, 4) AS cum_ltv_per_user
    FROM curve c JOIN sizes s USING (cohort_week)
    ORDER BY 1, 2
    """,
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase value per user by weeks since
    the cohort's first activity -- the payback-period chart that decides
    acquisition spend (which week does cumulative LTV cross CAC?). All
    value arithmetic is exact integer cents until the final per-user
    division; the cumulative window runs over the |cohorts| x |weeks|
    rollup, never the fact table.

    Scale: first-seen reduction (|users| rows) -> same-key join back ->
    (cohort, week) partial agg; the running sum sees dashboard-sized
    data."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    wk = (
        e.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                    / 7
                )
            )
            .cast("int")
            .alias("week_no"),
        )
        .agg(
            F.sum(F.expr("try_cast(round(value * 100) AS bigint)"))
            .cast("bigint")
            .alias("week_value_c")
        )
    )
    sizes = f.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        wk.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_no",
            "cohort_users",
            F.round(
                F.sum("week_value_c").over(w).cast("double")
                / 100
                / F.col("cohort_users"),
                4,
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_no")
    )


@register(
    "events_value_by_session_position",
    tags=("analytics", "window", "agg"),
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM x
    ),
    pos AS (
      SELECT least(CAST(row_number() OVER (PARTITION BY user_id, session_no
                                           ORDER BY ts, event_id) AS BIGINT),
                   10) AS position,
             value
      FROM s
    )
    SELECT position,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(TRY_CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100 / count(*), 4) AS avg_value
    FROM pos GROUP BY 1 ORDER BY 1
    """,
)
def events_value_by_session_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value by within-session position (1st event, 2nd, ... capped at
    10+): does engagement value build or decay as a session progresses --
    the curve that motivates session-depth optimization vs acquisition.
    Shares the 30-min sessionizer arithmetic; value sums in exact cents.

    Scale: ONE user-keyed shuffle serves the session boundary window, the
    numbering, and (same leading key) the position rank; the final agg is
    10 states."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    pw = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    pos = s.select(
        F.least(F.row_number().over(pw).cast("bigint"), F.lit(10)).alias("position"),
        "value",
    )
    return (
        pos.groupBy("position")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.expr("try_cast(round(value * 100) AS bigint)")).cast("double")
                / 100
                / F.count("*"),
                4,
            ).alias("avg_value"),
        )
        .orderBy("position")
    )


@register(
    "events_propensity_features",
    tags=("analytics", "agg", "northstar"),
    oracle="""
    WITH a AS (SELECT max(ts) AS now_ts FROM events),
    f AS (
      SELECT e.user_id,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(date_diff('second', max(e.ts), a.now_ts) AS BIGINT)
               AS recency_s,
             CAST(date_diff('second', min(e.ts), a.now_ts) AS BIGINT)
               AS tenure_s,
             CAST(sum(CASE WHEN e.event_type = 'purchase'
                           THEN TRY_CAST(round(e.value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS monetary_c,
             CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events e CROSS JOIN a GROUP BY e.user_id, a.now_ts
    )
    SELECT user_id, frequency, recency_s, tenure_s,
           round(CAST(monetary_c AS DOUBLE) / 100, 2) AS monetary,
           n_types,
           round(CAST(n_errors AS DOUBLE) / frequency, 6) AS error_rate
    FROM f ORDER BY user_id
    """,
)
def events_propensity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-grain propensity feature table: recency / frequency / monetary
    / tenure / behavioral breadth / error rate per user -- the standard
    churn- and LTV-model input this engine exists to hand a training
    pipeline (the per-key reduction every feature store materializes).
    Every feature is exact-integer until display; the recency anchor is
    the feed's own max ts (wall-clock in deployment).

    Scale: ONE |users|-grain partial agg over the fact scan with a 1-row
    broadcast anchor -- the same shape as latest_state, so the feature
    refresh co-schedules with state materialization."""
    e = load_table(spark, sf_dir, "events")
    a = e.agg(F.max("ts").alias("now_ts"))
    f = (
        e.crossJoin(F.broadcast(a))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("frequency"),
            (F.unix_seconds(F.max("now_ts")) - F.unix_seconds(F.max("ts")))
            .cast("bigint")
            .alias("recency_s"),
            (F.unix_seconds(F.max("now_ts")) - F.unix_seconds(F.min("ts")))
            .cast("bigint")
            .alias("tenure_s"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("try_cast(round(value * 100) AS bigint)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("monetary_c"),
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
        )
    )
    return (
        f.select(
            "user_id",
            "frequency",
            "recency_s",
            "tenure_s",
            F.round(F.col("monetary_c").cast("double") / 100, 2).alias("monetary"),
            "n_types",
            F.round(F.col("n_errors").cast("double") / F.col("frequency"), 6).alias(
                "error_rate"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "events_churn_training_set",
    tags=("analytics", "agg", "northstar"),
    oracle="""
    WITH a AS (
      SELECT date_trunc('day', max(ts)) - INTERVAL 7 DAY AS cutoff FROM events
    ),
    feat AS (
      SELECT e.user_id,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(date_diff('second', max(e.ts), a.cutoff) AS BIGINT)
               AS recency_s,
             CAST(sum(CASE WHEN e.event_type = 'purchase'
                           THEN TRY_CAST(round(e.value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS monetary_c,
             CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
      FROM events e CROSS JOIN a
      WHERE e.ts < a.cutoff
      GROUP BY e.user_id, a.cutoff
    ),
    label AS (
      SELECT DISTINCT e.user_id FROM events e CROSS JOIN a
      WHERE e.ts >= a.cutoff
    )
    SELECT f.user_id, f.frequency, f.recency_s,
           round(CAST(f.monetary_c AS DOUBLE) / 100, 2) AS monetary,
           f.n_types,
           CAST(l.user_id IS NULL AS BOOLEAN) AS churned
    FROM feat f LEFT JOIN label l ON f.user_id = l.user_id
    ORDER BY f.user_id
    """,
)
def events_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct churn training table: features computed ONLY
    from events BEFORE the cutoff (last 7 days held out), label = 'no
    activity after the cutoff'. The strict temporal split is the whole
    point -- computing any feature over the full window leaks the label
    (the classic feature-leakage bug this construction makes structurally
    impossible), which is why feature stores call this an as-of join
    against the label spine.

    Scale: one pre-cutoff |users|-grain partial agg (the feature pass) +
    one post-cutoff distinct reduction (the label pass), joined on the
    user key they are both already reduced to; the cutoff is a 1-row
    broadcast anchored to the feed (wall-clock in deployment)."""
    e = load_table(spark, sf_dir, "events")
    a = e.agg(
        (F.date_trunc("day", F.max("ts")) - F.expr("INTERVAL 7 DAY")).alias("cutoff")
    )
    ev = e.crossJoin(F.broadcast(a))
    feat = (
        ev.filter(F.col("ts") < F.col("cutoff"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("frequency"),
            (F.unix_seconds(F.max("cutoff")) - F.unix_seconds(F.max("ts")))
            .cast("bigint")
            .alias("recency_s"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("try_cast(round(value * 100) AS bigint)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("monetary_c"),
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
        )
    )
    label = (
        ev.filter(F.col("ts") >= F.col("cutoff"))
        .select(F.col("user_id").alias("l_user"))
        .distinct()
    )
    return (
        feat.join(label, feat.user_id == label.l_user, "left")
        .select(
            "user_id",
            "frequency",
            "recency_s",
            F.round(F.col("monetary_c").cast("double") / 100, 2).alias("monetary"),
            "n_types",
            F.col("l_user").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )


@register(
    "events_ab_lift_ztest",
    tags=("analytics", "stats", "agg"),
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'treatment' ELSE 'control' END
               AS arm,
             CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) >= 15
                       THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY 1, 2
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM assign GROUP BY 1
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 'treatment' THEN n END) AS nt,
             max(CASE WHEN arm = 'treatment' THEN conv END) AS ct,
             max(CASE WHEN arm = 'control' THEN n END) AS nc,
             max(CASE WHEN arm = 'control' THEN conv END) AS cc
      FROM arms
    )
    SELECT CAST(nt AS BIGINT) AS n_treatment, CAST(ct AS BIGINT) AS conv_treatment,
           CAST(nc AS BIGINT) AS n_control, CAST(cc AS BIGINT) AS conv_control,
           round(CAST(ct AS DOUBLE) / nt, 6) AS rate_treatment,
           round(CAST(cc AS DOUBLE) / nc, 6) AS rate_control,
           round(CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc, 6)
             AS abs_lift,
           round(CASE WHEN ct + cc = 0 OR ct + cc = nt + nc THEN NULL
                 ELSE (CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc)
                      / sqrt((CAST(ct + cc AS DOUBLE) / (nt + nc))
                             * (1 - CAST(ct + cc AS DOUBLE) / (nt + nc))
                             * (1.0 / nt + 1.0 / nc)) END, 4) AS z_score
    FROM wide
    """,
)
def events_ab_lift_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: per-user conversion (15+
    purchases in the window -- a threshold that splits this corpus rather
    than saturating, since every fixture user buys at least once) under a
    deterministic user_id-parity assignment, pooled
    two-sample z statistic for the lift -- the canonical A/B dashboard
    row. The pooled-variance closed form runs on exact integer counts, so
    both engines produce the identical statistic; the parity assignment
    stands in for the hash-bucket assignment a real experiment platform
    persists.

    Scale: |users|-grain conversion reduction (map-side combinable), a
    2-row arm rollup, then scalar arithmetic."""
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "treatment")
        .otherwise("control")
        .alias("arm"),
    ).agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 15, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("converted")
    )
    arms = assign.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("conv"))).alias("ct"),
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("arm") == "control", F.col("conv"))).alias("cc"),
    )
    nt, ct, nc, cc = (F.col(c).cast("double") for c in ("nt", "ct", "nc", "cc"))
    pooled = (ct + cc) / (nt + nc)
    # degenerate arms (nobody or everybody converts) have zero pooled
    # variance: z is undefined, NULL on both engines (ANSI division guard)
    z = F.when(
        (ct + cc > 0) & (ct + cc < nt + nc),
        (ct / nt - cc / nc) / F.sqrt(pooled * (1 - pooled) * (1.0 / nt + 1.0 / nc)),
    )
    return wide.select(
        F.col("nt").cast("bigint").alias("n_treatment"),
        F.col("ct").cast("bigint").alias("conv_treatment"),
        F.col("nc").cast("bigint").alias("n_control"),
        F.col("cc").cast("bigint").alias("conv_control"),
        F.round(ct / nt, 6).alias("rate_treatment"),
        F.round(cc / nc, 6).alias("rate_control"),
        F.round(ct / nt - cc / nc, 6).alias("abs_lift"),
        F.round(z, 4).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Round-7 additions (X77): Markov clickstream views + power-user
# concentration.
# ---------------------------------------------------------------------------

_MARKOV_SEQ = """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tr AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, sum(n) AS t FROM tr GROUP BY 1
    )
"""


@register(
    "events_markov_next_event_topk",
    tags=("analytics", "agg"),
    oracle=_MARKOV_SEQ
    + """
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) / t, 6) AS prob,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT tr.from_type, tr.to_type, tr.n, tot.t,
             row_number() OVER (
               PARTITION BY tr.from_type ORDER BY tr.n DESC, tr.to_type ASC
             ) AS rnk
      FROM tr JOIN tot ON tr.from_type = tot.from_type
    ) x
    WHERE rnk <= 3
    """,
)
def events_markov_next_event_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'What happens next': the top-3 next event types from each state of
    the first-order Markov chain (the event_transitions matrix normalized
    row-wise) -- the view product teams read as 'after a view, 62% click'.
    Ranking is by exact transition COUNT (integer, no float ties), with
    to_type as the deterministic tiebreak; probabilities are display
    output.

    Scale: the transition matrix is |types|^2 rows after one keyed window
    pass over the fact table (the event_transitions shape); everything
    downstream is dim-scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    rnk = Window.partitionBy("from_type").orderBy(
        F.col("n").desc(), F.col("to_type").asc()
    )
    return (
        tr.withColumn("t", F.sum("n").over(tot))
        .withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 3)
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("prob"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "events_markov_entropy",
    tags=("analytics", "agg"),
    oracle=_MARKOV_SEQ
    + """
    SELECT tr.from_type,
           CAST(count(*) AS BIGINT) AS n_next_types,
           CAST(max(tot.t) AS BIGINT) AS n_transitions,
           round(max(CAST(tr.n AS DOUBLE) / tot.t), 6) AS top_prob,
           round(-sum(CAST(
             (CAST(tr.n AS DOUBLE) / tot.t) * ln(CAST(tr.n AS DOUBLE) / tot.t)
             AS DECIMAL(20,15))), 6) AS entropy_nats
    FROM tr JOIN tot ON tr.from_type = tot.from_type
    GROUP BY tr.from_type
    """,
)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable each clickstream state is: Shannon entropy (nats)
    of the next-event distribution per from_type, with the modal
    probability alongside. Entropy near 0 = deterministic funnels (one
    dominant next step); near ln(|types|) = users scatter. Each p*ln(p)
    term -- identical double arithmetic on both engines from exact
    integer ratios -- snaps to DECIMAL(20,15) before the cross-type sum,
    so the reduction is order-independent (the supplier_concentration_hhi
    trick).

    Scale: same |types|^2 transition matrix; the entropy fold is
    dim-scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    p = F.col("n").cast("double") / F.col("t")
    return (
        tr.withColumn("t", F.sum("n").over(tot))
        .groupBy("from_type")
        .agg(
            F.count("*").cast("bigint").alias("n_next_types"),
            F.max("t").cast("bigint").alias("n_transitions"),
            F.round(F.max(p), 6).alias("top_prob"),
            F.round(
                -F.sum((p * F.log(p)).cast("decimal(20,15)")), 6
            ).cast("double").alias("entropy_nats"),
        )
    )


@register(
    "events_power_users_pareto",
    tags=("analytics", "agg"),
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n_users,
             sum(cnt) OVER () AS n_events,
             sum(cnt) OVER (ORDER BY cnt DESC, user_id ASC
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM per_user
    )
    SELECT CAST(max(n_users) AS BIGINT) AS n_users,
           CAST(max(n_events) AS BIGINT) AS n_events,
           CAST(ceil(max(n_users) * 0.01) AS BIGINT) AS top1pct_users,
           round(CAST(max(CASE WHEN rn = ceil(n_users * 0.01)
                               THEN cum END) AS DOUBLE) / max(n_events), 6)
             AS top1pct_share,
           round(CAST(max(CASE WHEN rn = ceil(n_users * 0.1)
                               THEN cum END) AS DOUBLE) / max(n_events), 6)
             AS top10pct_share
    FROM ranked
    """,
)
def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic concentration: what share of all events the top 1% and top
    10% most-active users generate (the '1% rule' health check every
    engagement dashboard carries; heavy concentration means bot review,
    flat concentration means broad engagement). Users rank by exact
    event count with user_id tiebreak; shares are integer ratios.

    Scale: the fact table reduces to |users| counts in one partial agg;
    the ranking windows over that reduced relation only."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    ranked = (
        per_user.withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n_users", F.count("*").over(Window.partitionBy()))
        .withColumn("n_events", F.sum("cnt").over(Window.partitionBy()))
    )
    at = lambda q: F.max(
        F.when(
            F.col("rn") == F.ceil(F.col("n_users") * q), F.col("cum")
        )
    )
    return ranked.groupBy().agg(
        F.max("n_users").cast("bigint").alias("n_users"),
        F.max("n_events").cast("bigint").alias("n_events"),
        F.ceil(F.max("n_users") * 0.01).cast("bigint").alias("top1pct_users"),
        F.round(at(0.01).cast("double") / F.max("n_events"), 6).alias("top1pct_share"),
        F.round(at(0.1).cast("double") / F.max("n_events"), 6).alias("top10pct_share"),
    )


@register(
    "events_hourly_activity_entropy",
    tags=("analytics", "agg"),
    oracle="""
    WITH hc AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(n) AS t FROM hc GROUP BY 1
    )
    SELECT hc.event_type,
           CAST(count(*) AS BIGINT) AS n_active_hours,
           CAST(max(tot.t) AS BIGINT) AS n_events,
           round(max(CAST(hc.n AS DOUBLE) / tot.t), 6) AS peak_hour_share,
           round(-sum(CAST(
             (CAST(hc.n AS DOUBLE) / tot.t) * ln(CAST(hc.n AS DOUBLE) / tot.t)
             AS DECIMAL(20,15))), 6) AS entropy_nats
    FROM hc JOIN tot ON hc.event_type = tot.event_type
    GROUP BY hc.event_type
    """,
)
def events_hourly_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal concentration per event type: Shannon entropy of the
    hour-of-day distribution (24 cells). Near ln(24) = traffic spread
    around the clock (global audience or bots); low = a sharp daily peak
    (single-timezone humans) -- the complement of events_peak_hour_by_type
    that one number can't give. Each p*ln(p) term from exact integer
    ratios snaps to DECIMAL(20,15) before the sum (order-independent).

    Scale: ONE |types|x24-state partial agg over the fact scan;
    everything after is dim-scale."""
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = Window.partitionBy("event_type")
    p = F.col("n").cast("double") / F.col("t")
    return (
        hc.withColumn("t", F.sum("n").over(tot))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_active_hours"),
            F.max("t").cast("bigint").alias("n_events"),
            F.round(F.max(p), 6).alias("peak_hour_share"),
            F.round(
                -F.sum((p * F.log(p)).cast("decimal(20,15)")), 6
            ).cast("double").alias("entropy_nats"),
        )
    )


@register(
    "events_sequence_rules_confidence",
    tags=("analytics", "agg"),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    rule_users AS (
      SELECT DISTINCT user_id, event_type AS a, next_type AS b
      FROM seq WHERE next_type IS NOT NULL
    ),
    rules AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n_rule FROM rule_users GROUP BY a, b
    ),
    ante AS (
      SELECT event_type AS a, CAST(count(DISTINCT user_id) AS BIGINT) AS n_a
      FROM events GROUP BY event_type
    ),
    cons AS (
      SELECT event_type AS b, CAST(count(DISTINCT user_id) AS BIGINT) AS n_b
      FROM events GROUP BY event_type
    ),
    total AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events)
    SELECT r.a AS antecedent, r.b AS consequent, r.n_rule,
           round(CAST(r.n_rule AS DOUBLE) / total.n, 6) AS support,
           round(CAST(r.n_rule AS DOUBLE) / ante.n_a, 6) AS confidence,
           round(CAST(r.n_rule AS DOUBLE) * total.n
                 / (CAST(ante.n_a AS DOUBLE) * cons.n_b), 6) AS lift
    FROM rules r
    JOIN ante ON r.a = ante.a
    JOIN cons ON r.b = cons.b
    CROSS JOIN total
    ORDER BY confidence DESC, antecedent, consequent
    LIMIT 20
    """,
)
def events_sequence_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential association rules at USER grain: for each direct
    transition a -> b, the share of all users who exhibit it (support),
    the share of users-with-a who exhibit it (confidence), and the lift
    against the consequent's base rate -- the market-basket rule triple
    applied to event sequences. event_transitions counts transition
    EVENTS; this counts transition USERS, which is what a
    recommendation/journey team acts on (one power user cannot inflate a
    rule). Top-20 by confidence with full deterministic tiebreaks.

    Scale: one user-keyed lead() window (the event_transitions shuffle),
    a distinct-reduction to (user, a, b), then everything is
    |types|^2-grain; antecedent/consequent user counts are |types|-grain
    distinct aggregates. TakeOrdered final."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    rules = (
        seq.select("user_id", "a", "b")
        .distinct()
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_rule"))
    )
    ante = e.groupBy(F.col("event_type").alias("a")).agg(
        F.count_distinct("user_id").cast("bigint").alias("n_a")
    )
    cons = e.groupBy(F.col("event_type").alias("b")).agg(
        F.count_distinct("user_id").cast("bigint").alias("n_b")
    )
    total = e.agg(F.count_distinct("user_id").cast("bigint").alias("n"))
    return (
        rules.join(F.broadcast(ante), "a")
        .join(F.broadcast(cons), "b")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "n_rule",
            F.round(F.col("n_rule").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_rule").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_rule").cast("double")
                * F.col("n")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("confidence").desc(), "antecedent", "consequent")
        .limit(20)
    )


@register(
    "events_retention_matrix",
    tags=("analytics", "agg"),
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
                  AS INT) AS week_no
      FROM events e JOIN f ON e.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      FROM f GROUP BY 1
    )
    SELECT a.cohort_week, a.week_no,
           s.cohort_users,
           CAST(count(*) AS BIGINT) AS n_active,
           round(CAST(count(*) AS DOUBLE) / s.cohort_users, 6) AS retention
    FROM active a JOIN sizes s USING (cohort_week)
    GROUP BY 1, 2, 3
    ORDER BY 1, 2
    """,
)
def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic cohort retention triangle: for each weekly signup
    cohort and each week-of-age, the share of the cohort active that week
    -- THE growth-accounting table (week-0 row is 1.0 by construction;
    reading down a column compares cohort quality, reading across a row
    shows decay). Complements events_cohort_ltv_curve (value per user) and
    events_cohort_repeat_rate (orders) with the activity dimension.

    Scale: first-seen reduction (|users| rows, one partial agg) -> join
    back on user_id (same key the fact table already shuffles on) -> the
    (user, cohort, week) DISTINCT bounds state at one row per user-week
    -> (cohort, week) counts are dashboard-sized. No windows over the
    fact table, cohort sizes broadcast back."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    ).localCheckpoint(eager=False)  # feeds sizes AND the fact join
    active = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                    / 7
                )
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    sizes = f.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    return (
        active.groupBy("cohort_week", "week_no")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_no",
            "cohort_users",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_no")
    )


@register(
    "events_sessionization_sensitivity",
    tags=("analytics", "agg"),
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
             AS BIGINT) AS g
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    ks AS (SELECT unnest([900, 1800, 3600]) AS gap_s),
    breaks AS (
      SELECT k.gap_s,
             CAST(sum(CASE WHEN g.g > k.gap_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_breaks
      FROM ks k CROSS JOIN gaps g
      WHERE g.g IS NOT NULL
      GROUP BY 1
    )
    SELECT CAST(b.gap_s AS INT) AS gap_s,
           CAST(base.n_users + b.n_breaks AS BIGINT) AS n_sessions,
           round(CAST(base.n_events AS DOUBLE)
                 / (base.n_users + b.n_breaks), 6) AS events_per_session
    FROM breaks b CROSS JOIN base
    """,
)
def events_sessionization_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-count sensitivity to the inactivity threshold (15/30/60
    minutes) from ONE pass over the gap stream: sessions(T) = users +
    gaps exceeding T, so the whole sensitivity curve costs one user-keyed
    lag plus a 3-way conditional count -- no re-sessionization per
    threshold (sessionize_batch materializes sessions at one T; this
    tells you whether T even matters before you pick it: a flat curve
    means any threshold works, a steep one means session metrics are
    threshold artifacts).

    Exactness: gaps are the per-timestamp-floored integer seconds of the
    gap-family recipe; session counts are exact integers; one division
    at 6 dp.

    Scale: one user-keyed window pass; the threshold fan-out multiplies
    the tiny conditional-count agg, never the data (the oracle's cross
    join form is for SQL clarity -- Spark computes three conditional
    sums in a single agg)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).localCheckpoint(eager=False)  # gap pass + base counts reuse it
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (F.unix_seconds(F.col("ts")) - F.unix_seconds(F.lag("ts").over(wu)))
        .cast("bigint").alias("g")
    ).filter(F.col("g").isNotNull())
    base = e.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
    )
    breaks = gaps.agg(
        *[
            F.sum(F.when(F.col("g") > t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"b{t}")
            for t in (900, 1800, 3600)
        ]
    )
    wide = base.crossJoin(F.broadcast(breaks))
    rows = [
        wide.select(
            F.lit(t).cast("int").alias("gap_s"),
            (F.col("n_users") + F.col(f"b{t}")).cast("bigint").alias("n_sessions"),
            F.round(
                F.col("n_events").cast("double") / (F.col("n_users") + F.col(f"b{t}")),
                6,
            ).alias("events_per_session"),
        )
        for t in (900, 1800, 3600)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "events_pareto_front_users",
    tags=("analytics", "agg"),
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(sum(coalesce(CAST(try_cast(try_cast(value AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS DECIMAL(38,0)), 0)) AS BIGINT) AS total_cents,
             CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS active_days,
             CAST(max(date_trunc('day', ts)) AS TIMESTAMP) AS last_day
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1
    )
    SELECT u.user_id, u.total_cents, u.active_days, u.last_day
    FROM m u
    WHERE NOT EXISTS (
      SELECT 1 FROM m v
      WHERE v.user_id <> u.user_id
        AND v.total_cents >= u.total_cents
        AND v.active_days >= u.active_days
        AND v.last_day >= u.last_day
        AND (v.total_cents > u.total_cents
             OR v.active_days > u.active_days
             OR v.last_day > u.last_day)
    )
    ORDER BY u.user_id
    """,
)
def events_pareto_front_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE operator: the Pareto front of users over (monetary total,
    active days, recency) -- users no other user beats-or-ties on ALL
    three axes while beating on one (Borzsony, Kossmann & Stocker 2001's
    SKYLINE OF clause). The multi-objective version of the RFM
    segmentation already registered: RFM bins every user; the skyline
    names the undominated frontier a win-back or VIP program actually
    targets. Ties on all three axes dominate neither way (both stay).

    Exactness: all three metrics are exact (DECIMAL cent sums with
    NULL-as-zero coalesce, exact distinct-day counts, max day); dominance
    is pure integer/timestamp comparison -- no floats anywhere.

    Scale: the fact table reduces to |users| metric rows first (the only
    fact-sized shuffle). The dominance anti-join is |users|^2 worst case
    -- honest at entity grain here; at 10^9 users the same anti-join runs
    after the sort-filter-skyline prefilter (order by a monotone score,
    local skylines per range partition, skyline-of-skylines -- the
    skyline is algebraic so local-then-global is exact), which changes
    the candidate count, not this dataflow."""
    e = load_table(spark, sf_dir, "events")
    cents = F.expr("try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)")
    m = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.coalesce(cents.cast("decimal(38,0)"), F.lit(0)))
            .cast("bigint").alias("total_cents"),
            F.count_distinct(F.date_trunc("day", "ts")).cast("bigint").alias("active_days"),
            F.max(F.date_trunc("day", "ts")).cast("timestamp").alias("last_day"),
        )
        .localCheckpoint(eager=False)
    )
    v = m.select(
        F.col("user_id").alias("v_user"),
        F.col("total_cents").alias("v_m"),
        F.col("active_days").alias("v_f"),
        F.col("last_day").alias("v_r"),
    )
    dom = (
        (F.col("v_user") != F.col("user_id"))
        & (F.col("v_m") >= F.col("total_cents"))
        & (F.col("v_f") >= F.col("active_days"))
        & (F.col("v_r") >= F.col("last_day"))
        & (
            (F.col("v_m") > F.col("total_cents"))
            | (F.col("v_f") > F.col("active_days"))
            | (F.col("v_r") > F.col("last_day"))
        )
    )
    return m.join(F.broadcast(v), dom, "left_anti").orderBy("user_id")


@register(
    "events_topk_drift_weekly",
    tags=("analytics", "monitor"),
    oracle="""
    WITH wk AS (
      SELECT date_trunc('week', ts) AS week_start, user_id,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT week_start, user_id,
             row_number() OVER (PARTITION BY week_start
                                ORDER BY n DESC, user_id) AS rnk
      FROM wk
    ),
    top AS (SELECT week_start, user_id FROM rk WHERE rnk <= 10),
    per_week AS (
      SELECT week_start, CAST(count(*) AS BIGINT) AS n_topk FROM top GROUP BY 1
    ),
    seq AS (
      SELECT week_start, n_topk,
             lag(week_start) OVER (ORDER BY week_start) AS prev_week,
             lag(n_topk) OVER (ORDER BY week_start) AS n_prev
      FROM per_week
    ),
    inter AS (
      SELECT s.week_start, CAST(count(p.user_id) AS BIGINT) AS n_common
      FROM seq s
      JOIN top c ON c.week_start = s.week_start
      LEFT JOIN top p ON p.week_start = s.prev_week
                     AND p.user_id = c.user_id
      GROUP BY s.week_start
    )
    SELECT CAST(s.week_start AS TIMESTAMP) AS week_start, s.n_topk,
           CASE WHEN s.prev_week IS NULL THEN NULL
                ELSE round(CAST(i.n_common AS DOUBLE)
                           / (s.n_topk + s.n_prev - i.n_common), 6)
           END AS topk_jaccard_vs_prev,
           CASE WHEN s.prev_week IS NULL THEN NULL
                ELSE CAST(s.n_topk - i.n_common AS BIGINT)
           END AS n_new_entrants
    FROM seq s JOIN inter i ON s.week_start = i.week_start
    ORDER BY s.week_start
    """,
)
def events_topk_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k drift monitor at week grain: the Jaccard overlap between each
    week's top-10 most-active users and the previous week's, plus the
    count of new entrants -- the batch twin of a streaming leaderboard
    drift alarm (a heavy-hitter set that churns 80% week-over-week means
    the workload's hot keys -- and any cache/partition strategy keyed on
    them -- went stale). approx_topk gives the set; this tracks its
    STABILITY over time.

    Exactness: per-week ranks tie-break on user_id so the top-10 set is
    unique on both engines; overlaps and entrant counts are exact
    integers; Jaccard divides integers once at 6dp. The first week emits
    NULL drift columns (no reference set), keeping the panel total
    without a weak 0-row shape.

    Scale: one (week, user) map-side partial agg, one rank window
    partitioned BY WEEK over that reduced relation, then all drift logic
    runs on the |weeks| x 10 top relation -- self-join included."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    wk = e.groupBy(
        F.date_trunc("week", "ts").alias("week_start"), "user_id"
    ).agg(F.count("*").cast("bigint").alias("n"))
    rw = Window.partitionBy("week_start").orderBy(F.col("n").desc(), "user_id")
    top = (
        wk.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 10)
        .select("week_start", "user_id")
        .localCheckpoint(eager=False)  # consumed 3x (per-week, cur, prev)
    )
    per_week = top.groupBy("week_start").agg(
        F.count("*").cast("bigint").alias("n_topk")
    )
    sw = Window.orderBy("week_start")
    seq = per_week.select(
        "week_start", "n_topk",
        F.lag("week_start").over(sw).alias("prev_week"),
        F.lag("n_topk").over(sw).alias("n_prev"),
    )
    cur = top.select(F.col("week_start").alias("cw"), F.col("user_id").alias("cu"))
    prv = top.select(F.col("week_start").alias("pw"), F.col("user_id").alias("pu"))
    inter = (
        seq.join(cur, F.col("cw") == F.col("week_start"))
        .join(
            prv,
            (F.col("pw") == F.col("prev_week")) & (F.col("pu") == F.col("cu")),
            "left",
        )
        .groupBy("week_start")
        .agg(F.count("pu").cast("bigint").alias("n_common"))
    )
    return (
        seq.join(inter, "week_start")
        .select(
            F.col("week_start").cast("timestamp").alias("week_start"),
            "n_topk",
            F.when(
                F.col("prev_week").isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.round(
                    F.col("n_common").cast("double")
                    / (F.col("n_topk") + F.col("n_prev") - F.col("n_common")),
                    6,
                )
            ).alias("topk_jaccard_vs_prev"),
            F.when(
                F.col("prev_week").isNull(), F.lit(None).cast("bigint")
            ).otherwise(
                (F.col("n_topk") - F.col("n_common")).cast("bigint")
            ).alias("n_new_entrants"),
        )
        .orderBy("week_start")
    )


@register(
    "events_type_profile_js_distance",
    tags=("analytics", "stats", "monitor"),
    oracle="""
    WITH c AS (
      SELECT event_type, dayofweek(ts) AS dw,
             CAST(extract(hour FROM ts) AS INT) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1),
    p AS (SELECT c.event_type, dw, hr, n, t FROM c JOIN tot USING (event_type)),
    both_cells AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(floor((CAST(a.n AS DOUBLE) / a.t)
                   * ln(2 * (CAST(a.n AS DOUBLE) / a.t)
                        / (CAST(a.n AS DOUBLE) / a.t + CAST(b.n AS DOUBLE) / b.t))
                   * 1e9) AS BIGINT)
             + CAST(floor((CAST(b.n AS DOUBLE) / b.t)
                   * ln(2 * (CAST(b.n AS DOUBLE) / b.t)
                        / (CAST(a.n AS DOUBLE) / a.t + CAST(b.n AS DOUBLE) / b.t))
                   * 1e9) AS BIGINT) AS u
      FROM p a JOIN p b
        ON a.dw = b.dw AND a.hr = b.hr AND a.event_type < b.event_type
    ),
    only_a AS (
      SELECT a.event_type AS type_a, tb.event_type AS type_b,
             CAST(floor((CAST(a.n AS DOUBLE) / a.t) * ln(2) * 1e9) AS BIGINT) AS u
      FROM p a JOIN tot tb ON a.event_type < tb.event_type
      WHERE NOT EXISTS (
        SELECT 1 FROM c b
        WHERE b.event_type = tb.event_type AND b.dw = a.dw AND b.hr = a.hr
      )
    ),
    only_b AS (
      SELECT ta.event_type AS type_a, b.event_type AS type_b,
             CAST(floor((CAST(b.n AS DOUBLE) / b.t) * ln(2) * 1e9) AS BIGINT) AS u
      FROM p b JOIN tot ta ON ta.event_type < b.event_type
      WHERE NOT EXISTS (
        SELECT 1 FROM c a
        WHERE a.event_type = ta.event_type AND a.dw = b.dw AND a.hr = b.hr
      )
    ),
    terms AS (
      SELECT type_a, type_b, u FROM both_cells
      UNION ALL SELECT type_a, type_b, u FROM only_a
      UNION ALL SELECT type_a, type_b, u FROM only_b
    )
    SELECT type_a, type_b,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(u) AS DOUBLE) / 2 / 1e9, 6) AS js_divergence
    FROM terms GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_type_profile_js_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between event types' (weekday,
    hour) activity profiles (Lin 1991): JS(P||Q) = (KL(P||M) +
    KL(Q||M))/2 with M the midpoint -- symmetric, bounded by ln 2, and
    defined even where supports differ, which is why it is the standard
    distance between usage fingerprints. A pair of streams whose JS
    jumps week-over-week routes differently (caching, partitioning,
    alerting) than streams that co-move; the single-stream dow/hour
    panels (events_hourly_heatmap, cdc_gap_heatmap_hour_dow) can't see
    the PAIRWISE structure.

    Exactness: cell probabilities are ratios of exact integers; each
    cell's JS contribution is one shared double closed form floored to
    integer nano-units BEFORE summation (the engines sum in different
    orders -- integer terms make the sum order-free); disjoint-support
    cells contribute the exact p*ln2 limit; one division/round at the
    end.

    Scale: one (type, dow, hour) partial agg bounds everything at
    |types| x 168 cells; the pair join, anti joins, and the final agg
    run on that attribute-bounded relation."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    c = e.groupBy(
        "event_type",
        F.dayofweek("ts").alias("dw"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count("*").cast("bigint").alias("n")).localCheckpoint(eager=False)
    tot = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("t"))
    p = c.join(tot, "event_type").localCheckpoint(eager=False)
    pa = p.select(
        F.col("event_type").alias("type_a"), "dw", "hr",
        F.col("n").alias("na"), F.col("t").alias("ta"),
    )
    pb = p.select(
        F.col("event_type").alias("type_b"),
        F.col("dw").alias("dwb"), F.col("hr").alias("hrb"),
        F.col("n").alias("nb"), F.col("t").alias("tb"),
    )
    pr_a = F.col("na").cast("double") / F.col("ta")
    pr_b = F.col("nb").cast("double") / F.col("tb")
    both = pa.join(
        pb,
        (F.col("dw") == F.col("dwb"))
        & (F.col("hr") == F.col("hrb"))
        & (F.col("type_a") < F.col("type_b")),
    ).select(
        "type_a", "type_b",
        (
            F.floor(pr_a * F.log(2 * pr_a / (pr_a + pr_b)) * 1e9).cast("bigint")
            + F.floor(pr_b * F.log(2 * pr_b / (pr_a + pr_b)) * 1e9).cast("bigint")
        ).alias("u"),
    )
    types = tot.select(F.col("event_type"), "t")
    only_a = (
        pa.join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .join(
            pb.select("type_b", "dwb", "hrb").withColumnRenamed("type_b", "tb2"),
            (F.col("tb2") == F.col("type_b"))
            & (F.col("dwb") == F.col("dw"))
            & (F.col("hrb") == F.col("hr")),
            "left_anti",
        )
        .select(
            "type_a", "type_b",
            F.floor(pr_a * F.log(F.lit(2.0)) * 1e9).cast("bigint").alias("u"),
        )
    )
    only_b = (
        pb.join(
            types.select(F.col("event_type").alias("type_a")),
            F.col("type_a") < F.col("type_b"),
        )
        .join(
            pa.select("type_a", "dw", "hr").withColumnRenamed("type_a", "ta2"),
            (F.col("ta2") == F.col("type_a"))
            & (F.col("dw") == F.col("dwb"))
            & (F.col("hr") == F.col("hrb")),
            "left_anti",
        )
        .select(
            "type_a", "type_b",
            F.floor(pr_b * F.log(F.lit(2.0)) * 1e9).cast("bigint").alias("u"),
        )
    )
    terms = both.unionByName(only_a).unionByName(only_b)
    return (
        terms.groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.round(F.sum("u").cast("double") / 2 / 1e9, 6).alias("js_divergence"),
        )
        .orderBy("type_a", "type_b")
    )
