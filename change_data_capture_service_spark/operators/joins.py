"""Join operators (SURVEY.md §2.2 X4). The reference has no joins at all
(SURVEY.md §2.1) -- these are the analytic surface its queryable sink serves.

Scale notes applied throughout:
- dimension tables (region/nation/supplier/customer at dim-scale) are
  broadcast so the fact-side scan never shuffles for them;
- equi-joins on fact tables shuffle on the join key once, and AQE can
  re-plan skew at runtime;
- the as-of join is expressed as union+window (one shuffle, no range
  explosion), the canonical Spark shape for "latest prior event".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "join_inner_equi",
    tags=("join",),
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on the customer key. customer is the small side ->
    Catalyst broadcasts it under AQE; no shuffle of orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "c_name", "c_mktsegment"
    )


@register(
    "join_left",
    tags=("join",),
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying order
    (null-extended right side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_semi",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS: customers with at least one urgent order.
    Semi joins never duplicate or widen the left side -- cheapest existence
    check at scale (right side reduced to distinct keys before the join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers with no finished order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_broadcast",
    tags=("join",),
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension tables: at 100 TB the fact side
    streams through two BroadcastHashJoins with zero shuffle (asserted in
    tests via plans.inspect.uses_broadcast_join)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "join_multi",
    tags=("join", "headline"),
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: revenue by supplier nation in one
    region. Only the FIXED-SIZE dims (nation: 25 rows, region: 5) get
    explicit broadcast hints -- supplier/customer/orders scale with the
    dataset, so they stay shuffle joins and AQE promotes them to broadcast
    at runtime only when they actually fit. lineitem (the 100 TB table)
    shuffles once on l_orderkey. Revenue accumulates in DECIMAL (exact,
    order-independent) then casts to DOUBLE -- same on the oracle side --
    so the hash is stable under parallel accumulation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "join_cross",
    tags=("join",),
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region
    FROM nation n CROSS JOIN region r
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product -- legal only between bounded dims (25x5
    here). The engine never plans an *implicit* cross join: Spark raises
    unless crossJoin is called explicitly, which is the right guardrail at
    scale."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))


@register(
    "join_range",
    tags=("join",),
    oracle="""
    SELECT e1.user_id,
           e1.event_id AS event_id_a,
           e2.event_id AS event_id_b,
           e1.event_type AS type_a,
           e2.event_type AS type_b
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: pairs of events of the same user within one hour.
    The equi-key (user_id) carries the shuffle; the range predicate is
    evaluated post-shuffle, so the explosion is bounded per key -- this is
    the scalable shape (never a raw cross join on the range alone)."""
    e = load_table(spark, sf_dir, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("e1.user_id").alias("user_id"),
            F.col("e1.event_id").alias("event_id_a"),
            F.col("e2.event_id").alias("event_id_b"),
            F.col("e1.event_type").alias("type_a"),
            F.col("e2.event_type").alias("type_b"),
        )
    )


@register(
    "join_asof",
    tags=("join",),
    oracle="""
    SELECT event_id, user_id, ts, last_click_ts
    FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM events
    ) t
    WHERE event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for every purchase, the most recent prior
    click of the same user. Spark lacks a native ASOF JOIN; the scalable
    composition is a single partition-by-key ordered window with
    last(ignorenulls) -- one shuffle, no range explosion, no per-group
    pandas. (Reference parallel: CDC consumers ask "state as of event X",
    the LSN-ordered analogue.)"""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        e.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "join_full",
    tags=("join",),
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal,
           o.n_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
    FULL OUTER JOIN (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join where BOTH sides have unmatched keys (rich customers
    with no orders; ordering customers below the balance cut). Full outer
    can't broadcast either side (every unmatched row of both must surface),
    so it is always a shuffle join -- plan accordingly at scale: filter and
    pre-aggregate both inputs first, as here, so the shuffle carries the
    reduced relations."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "full").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_orders",
    )


@register(
    "join_skew_salted",
    tags=("join", "scale"),
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join, result-identical to the plain join (the
    oracle IS the plain join): the fact side adds a deterministic salt
    ``xxhash64(row) % S``, the build side replicates each key S times via
    posexplode, and the join runs on (key, salt) -- a hot key's rows spread
    over S reducers instead of one.

    This is the manual fallback when AQE skew-join can't trigger (e.g.
    skewed key feeding a window, or a build side too big to broadcast but
    with few hot keys). S=8 here; at 100 TB pick S ~ (hot-key rows /
    target-partition rows). Salting costs S× replication of the build side
    only -- never the fact table."""
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    # deterministic per-row salt on the fact side (row identity, not rand())
    fact = li.select("l_orderkey", "l_linenumber").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int")
    )
    build = o.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return fact.join(build, (fact.l_orderkey == build.o_orderkey) & (fact.salt == build.salt)).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_totalprice"
    )


@register(
    "tpch_q3_shipping",
    tags=("join", "agg", "headline"),
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted to the fixture columns): top-10
    unshipped-revenue orders for one market segment. The classic
    filter-pushdown + broadcast + partial-agg showcase: both date filters
    reach the parquet scans, the filtered customer dim broadcasts, lineitem
    shuffles once on l_orderkey, and the final top-10 is
    TakeOrderedAndProject. Decimal revenue accumulation on both engines."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "join_asof_tolerance",
    tags=("join",),
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM events
    )
    SELECT event_id, user_id, ts,
           CASE WHEN epoch_us(ts) - epoch_us(last_click_ts) <= 3600000000
                THEN last_click_ts END AS attributed_click_ts
    FROM marked WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas ``merge_asof(tolerance=)``
    semantics): each purchase attributes to the most recent prior click of
    the same user ONLY if it happened within the last hour -- stale matches
    become NULL instead of silently attributing to ancient history, which
    is what attribution windows require. Same single keyed-window shape as
    ``join_asof``; the tolerance is a post-window microsecond comparison
    (exact integers both engines), so the plan costs nothing extra."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    last_click = F.last(click_ts, ignorenulls=True).over(w)
    within = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
    ) <= 3_600_000_000
    return (
        e.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(within, F.col("last_click_ts")).alias("attributed_click_ts"),
        )
    )


@register(
    "join_asof_nearest",
    tags=("join",),
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click,
             first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click
      FROM events
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_click IS NULL THEN next_click
             WHEN next_click IS NULL THEN prev_click
             WHEN epoch_us(ts) - epoch_us(prev_click)
                  <= epoch_us(next_click) - epoch_us(ts) THEN prev_click
             ELSE next_click
           END AS nearest_click_ts
    FROM w WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join (pandas ``merge_asof(direction=
    'nearest')``): each purchase matched to the temporally CLOSEST click of
    the same user, before or after -- the right semantic when attributing
    to co-occurring activity rather than strictly-prior causes. Ties break
    backward (<=), and distance compares in exact integer microseconds.

    Scale: completes the as-of family (backward ``join_asof``, bounded
    ``join_asof_tolerance``) with the same single user-keyed ordered
    window shuffle -- the backward and forward candidates come from one
    frame pair over one sort, never a range self-join."""
    e = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    prev_c = F.last(click_ts, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_c = F.first(click_ts, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    us = F.unix_micros
    nearest = (
        F.when(prev_c.isNull(), next_c)
        .when(next_c.isNull(), prev_c)
        .when(us(F.col("ts")) - us(prev_c) <= us(next_c) - us(F.col("ts")), prev_c)
        .otherwise(next_c)
    )
    return (
        e.select("event_id", "user_id", "ts", "event_type", nearest.alias("nearest_click_ts"))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "nearest_click_ts")
    )
