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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _first_after(sorted_ts: F.Column, prev: F.Column) -> F.Column:
    """Earliest timestamp in a sorted array strictly after ``prev`` (NULL if
    none / prev is NULL)."""
    return F.when(
        prev.isNotNull(), F.element_at(F.filter(sorted_ts, lambda x: x > prev), 1)
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
    t1 = F.element_at(F.col("views"), 1)
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
