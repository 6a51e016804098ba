"""Round-4 relational suite: the warehouse queries a CDC sink actually
serves once change data lands queryable (the reference's whole point --
``cmd/es_consumer/main.go`` indexes into ``cdc_*`` precisely so Kibana can
run aggregations over them, ``README.md:189-194``). TPC-H-shaped joins and
aggregations over the fixture star schema, plus the operational dashboards
(backlog sweep-line, RFM segmentation, trade balance) a replication
consumer feeds.

Scale notes applied throughout:
- every dim side (region/nation/supplier/customer-filtered) broadcasts, so
  the lineitem/orders scans shuffle at most once on their join key;
- revenue accumulates in DECIMAL on both engines (order-independent exact
  sums; cast to DOUBLE only at the end) -- the hash-stability rule;
- top-k finals are TakeOrderedAndProject, never a global sort;
- the backlog query is the sweep-line rewrite of a day-range join: two
  partial aggs + a prefix sum over the tiny day domain, instead of
  |orders| x |days| range-join rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .ranks import exact_global_row_number, exact_ntile
from .stats import TOTAL_CENTS as _TOTAL_C  # one source of truth for o_totalprice cents

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )


@register(
    "tpch_q5_local_supplier",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume, adapted to fixture columns):
    revenue per nation from orders where the customer and the supplier
    share that nation, one region, one order-year.

    Plan shape: the year filter pushes to the orders scan; customer,
    supplier, nation, region all broadcast (dim-scale); lineitem -- the
    only 100 TB-class table -- shuffles exactly once, on l_orderkey.
    The same-nation predicate rides the broadcast joins map-side, so the
    single shuffle carries only rows that can still qualify."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a two-quarter window -- the churn-risk dashboard.

    Plan shape: returnflag + date filters push to the scans, customer and
    nation broadcast, lineitem shuffles once on l_orderkey, and the final
    top-20 is TakeOrderedAndProject (never a global sort of the agg)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "orders_order_priority",
    tags=("join", "agg", "relational"),
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def orders_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor (priority checking): per priority class, how many
    orders in the window had at least one line item shipped more than 60
    days after the order date -- the late-fulfilment SLA monitor.

    EXISTS compiles to a LEFT SEMI join: the lineitem side is reduced to
    (l_orderkey, l_shipdate) pairs before the shuffle, the semi join
    deduplicates on the build side (no row multiplication however many
    lines are late), and the final agg sees |orders-in-window| rows over
    five priority groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


@register(
    "supplier_wait_stats",
    tags=("join", "agg", "relational"),
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(CAST(sum(datediff('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE)
                      / count(*), 6) AS DOUBLE) AS avg_wait_days,
           CAST(max(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS max_wait_days
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def supplier_wait_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier fulfilment latency: line-item count, mean and max
    order-to-ship wait in days -- the supplier scorecard.

    Integer day arithmetic end to end (datediff -> exact BIGINT sum ->
    one double division at the end), so the mean is bit-identical across
    engines without DECIMAL staging. orders joins lineitem on the fact
    key (one shuffle); supplier broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    wait = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(wait).cast("double") / F.count("*"), 6
            ).cast("double").alias("avg_wait_days"),
            F.max(wait).cast("bigint").alias("max_wait_days"),
        )
    )


@register(
    "part_margin_rank",
    tags=("join", "window", "relational"),
    oracle=f"""
    WITH pr AS (
      SELECT p.p_brand, p.p_partkey, p.p_name,
             sum({_REV}) AS revenue_d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey, p.p_name
    )
    SELECT p_brand, p_partkey, p_name,
           CAST(revenue_d AS DOUBLE) AS revenue, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY p_brand ORDER BY revenue_d DESC, p_partkey) AS rnk
      FROM pr
    ) t
    WHERE rnk <= 3
    """,
)
def part_margin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand: the merchandising league table.

    The rank orders by the EXACT DECIMAL revenue (double ties under
    parallel accumulation would make row_number non-deterministic), with
    p_partkey as the total-order tiebreaker. lineitem pre-aggregates to
    |parts| rows before the window, so the per-brand sort never sees fact
    rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    pr = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.sum(_rev()).alias("revenue_d"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue_d").desc(), "p_partkey")
    return (
        pr.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand", "p_partkey", "p_name",
            F.col("revenue_d").cast("double").alias("revenue"), "rnk",
        )
    )


@register(
    "customer_rfm_segments",
    tags=("agg", "window", "relational"),
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS c_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_d
      FROM orders GROUP BY 1
    ),
    q AS (
      SELECT *,
             ntile(4) OVER (ORDER BY last_order DESC, c_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary_d DESC, c_custkey) AS m_q
      FROM rfm
    )
    SELECT c_custkey, last_order,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary_d AS DOUBLE) AS monetary,
           CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR)
             AS segment
    FROM q
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation over the
    order history -- the classic CRM cut. Each dimension is ntile(4) with
    c_custkey as tiebreaker (deterministic bucket edges on both engines);
    monetary ranks on the exact DECIMAL sum.

    Scale: the per-customer aggregate is the only fact-sized shuffle;
    each quartile cut is ``ranks.exact_ntile`` -- range-repartition on
    the sort key, per-range row_number, per-range counts -> broadcast
    offsets -- so even at 10^9 customers no stage single-partitions the
    dim relation (the window-ntile form this replaced funneled all
    customers through one reducer three times)."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_d"),
    )
    q = exact_ntile(
        rfm, 4, [F.col("last_order").desc(), F.col("c_custkey")], "r_q"
    )
    q = exact_ntile(q, 4, [F.col("frequency").desc(), F.col("c_custkey")], "f_q")
    q = exact_ntile(q, 4, [F.col("monetary_d").desc(), F.col("c_custkey")], "m_q")
    return q.select(
        "c_custkey",
        "last_order",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary_d").cast("double").alias("monetary"),
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    )


@register(
    "nation_trade_balance",
    tags=("join", "agg", "relational"),
    oracle=f"""
    WITH sup AS (
      SELECT n.n_name, sum({_REV}) AS supply_revenue_d
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    cust AS (
      SELECT n.n_name, sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS customer_spend_d
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT coalesce(sup.n_name, cust.n_name) AS n_name,
           CAST(coalesce(sup.supply_revenue_d, 0) AS DOUBLE) AS supply_revenue,
           CAST(coalesce(cust.customer_spend_d, 0) AS DOUBLE) AS customer_spend,
           CAST(coalesce(sup.supply_revenue_d, 0)
                - coalesce(cust.customer_spend_d, 0) AS DOUBLE) AS balance
    FROM sup FULL OUTER JOIN cust ON sup.n_name = cust.n_name
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue its suppliers earn vs what its
    customers spend -- two independent star aggregations full-outer-joined
    on the nation dim.

    Each branch reduces its fact table map-side behind a broadcast dim
    before any shuffle; the outer join runs over <= |nations| rows per
    side. The subtraction stays in DECIMAL until the final cast."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sup = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("sup_name"))
        .agg(F.sum(_rev()).alias("supply_revenue_d"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cust = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cust_name"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("customer_spend_d"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        sup.join(cust, F.col("sup_name") == F.col("cust_name"), "full_outer")
        .select(
            F.coalesce(F.col("sup_name"), F.col("cust_name")).alias("n_name"),
            F.coalesce(F.col("supply_revenue_d"), zero)
            .cast("double")
            .alias("supply_revenue"),
            F.coalesce(F.col("customer_spend_d"), zero)
            .cast("double")
            .alias("customer_spend"),
            (
                F.coalesce(F.col("supply_revenue_d"), zero)
                - F.coalesce(F.col("customer_spend_d"), zero)
            )
            .cast("double")
            .alias("balance"),
        )
    )


@register(
    "orders_open_backlog_daily",
    tags=("agg", "window", "relational", "timeseries"),
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS start_day,
             greatest(CAST(o.o_orderdate AS DATE),
                      CAST(max(l.l_shipdate) AS DATE)) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT start_day AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT end_day AS day, -1 AS delta FROM spans
    ),
    daily AS (
      SELECT day, sum(delta) AS d FROM deltas GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(sum(d) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_orders
    FROM daily
    """,
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: how many orders are placed but not yet
    fully shipped at each day boundary -- the ops "work in progress"
    curve. An order is open on [orderdate, close) where close =
    greatest(orderdate, max(l_shipdate)) -- the clamp makes an order whose
    ship dates precede its order date (the fixture generator draws them
    independently) occupy an empty interval instead of a negative one.

    This is the sweep-line rewrite of the naive day-range join (|orders| x
    |open days| exploded rows): +1 at the start day, -1 at the close day,
    partial-agg the deltas per day, prefix-sum over the day domain. The
    only unpartitioned window runs over |distinct days| rows (thousands,
    forever), after two map-side-combining shuffles. Days with no
    activity carry the prior value implicitly (no row emitted)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.col("o_orderdate").cast("date").alias("start_day"),
            F.greatest(
                F.col("o_orderdate").cast("date"), F.col("last_ship").cast("date")
            ).alias("end_day"),
        )
    )
    deltas = spans.select(F.col("start_day").alias("day"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("end_day").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        F.sum("d").over(w).cast("bigint").alias("open_orders"),
    )


@register(
    "tpch_q7_volume_shipping",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations per
    ship-year, keyed by which side supplied and which consumed.

    The nation-pair disjunction evaluates map-side behind four broadcast
    dims (supplier, customer, and nation twice under different aliases);
    lineitem shuffles once on l_orderkey. At 100 TB the filter kills most
    rows before that single exchange -- the broadcast order is what makes
    the predicate early."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q14_promo_revenue",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT date_trunc('month', l.l_shipdate) AS month,
           CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(sum({_REV}) AS DOUBLE) AS total_revenue,
           round(100 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV}
                                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), extended to a monthly series: the
    share of each month's revenue that came from promo-class parts.

    Both the conditional and unconditional revenue accumulate in the same
    DECIMAL type on both engines (the CASE else-branch is typed, not bare
    0, so neither engine silently widens differently); the percentage is
    one identical double expression over the exact sums. part broadcasts;
    lineitem never shuffles -- the month agg is the only exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
        .select(
            "month",
            "promo_revenue",
            "total_revenue",
            F.round(
                100 * F.col("promo_revenue") / F.col("total_revenue"), 6
            ).alias("promo_share_pct"),
        )
    )


@register(
    "tpch_q18_large_orders",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 220
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the 20 priciest orders whose
    total line quantity exceeds a threshold -- the bulk-buyer audit.

    The HAVING pre-filter reduces lineitem to qualifying orderkeys BEFORE
    any join (classic agg-then-join ordering: the join input is |big
    orders|, not |lineitem|); customer broadcasts; the final top-20 is
    TakeOrderedAndProject on (totalprice, orderkey)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty_d"))
        .filter(F.col("total_qty_d") > 220)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty_d").cast("double").alias("total_qty"),
        )
    )


@register(
    "tpch_q19_disjunctive_filter",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted): an OR-of-ANDs predicate
    spanning both join sides -- the disjunction stress test. A naive
    planner evaluates it post-join; the worthwhile property (asserted in
    tests) is that the single-side conjuncts implied by the OR (brand IN
    (..), size <= 15, quantity <= 30 bounds) still prune at the scans,
    and part still broadcasts, so the residual OR runs map-side on the
    already-thinned join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
    )


def _order_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped (order, brand) relation basket_brand_pairs self-joins:
    lineitem x broadcast(part) -> distinct. Exposed un-checkpointed so the
    broadcast plan gate can see inside what the operator materializes."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )


@register(
    "basket_brand_pairs",
    tags=("join", "agg", "relational", "northstar"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    ORDER BY n_orders DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 brand pairs most often bought in the
    same order -- the co-occurrence mining primitive behind "frequently
    bought together".

    The scale trick is pairing at the BRAND grain, not the item grain:
    (order, brand) dedups first, bounding the self-join blowup at
    C(|brands in order|, 2) <= C(25,2) = 300 pairs per order regardless
    of how many line items the order has. The self-join co-locates on
    l_orderkey (one shuffle each side, same key), and `<` halves the pair
    space; the final top-20 is TakeOrderedAndProject.

    r14: the (order, brand) relation is a lazy localCheckpoint -- it
    feeds BOTH self-join sides, and without the barrier the whole
    lineitem-join-part-distinct subtree was planned (and executed) TWICE
    (the r13 before-plan shows 4 parquet scans; guide §2.4 / the repo's
    multi-consumer-relation rule). An in-row collect_set pair-expansion
    variant was measured and REJECTED: 5.4 executor-CPU-s vs 1.5 for
    this shape at sf0.1 (ObjectHashAggregate set-merge + nested
    transforms cost more than the co-partitioned join they replace)."""
    # consumed by BOTH self-join sides (the plan gate tests the
    # un-checkpointed generator _order_brands, per the repo's
    # checkpoint-hides-operators trap note)
    ob = _order_brands(spark, sf_dir).localCheckpoint(eager=False)
    a = ob.select(F.col("l_orderkey").alias("ok_a"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(
            b,
            (F.col("ok_a") == F.col("ok_b")) & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "customer_order_gaps",
    tags=("window", "agg", "relational"),
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             datediff('day',
                      lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap
      FROM orders
    )
    SELECT o_custkey AS c_custkey,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap) AS DOUBLE) / count(gap), 6) AS avg_gap_days,
           CAST(max(gap) AS BIGINT) AS max_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY 1
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase intervals per customer: mean and max days between
    consecutive orders -- the reorder-cadence feature behind churn and
    next-purchase models (and the sibling of sessionize_batch's gap
    split, at order grain).

    Integer day arithmetic on a (o_orderdate, o_orderkey)-tiebroken lag,
    so both engines draw identical gaps; exact BIGINT sums, one double
    division. One keyed shuffle for the window; the agg reuses the same
    user partitioning."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    return (
        o.select("o_custkey", gap.alias("gap"))
        .filter(F.col("gap").isNotNull())
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.round(F.sum("gap").cast("double") / F.count("gap"), 6).alias(
                "avg_gap_days"
            ),
            F.max("gap").cast("bigint").alias("max_gap_days"),
        )
    )


@register(
    "supplier_concentration_hhi",
    tags=("join", "agg", "relational"),
    oracle=f"""
    WITH sr AS (
      SELECT s.s_nationkey, s.s_suppkey, sum({_REV}) AS r_d
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT s_nationkey, sum(r_d) AS t_d, count(*) AS n_suppliers FROM sr GROUP BY 1
    )
    SELECT n.n_name,
           CAST(tot.n_suppliers AS BIGINT) AS n_suppliers,
           round(CAST(sum(CAST(
             (CAST(sr.r_d AS DOUBLE) / CAST(tot.t_d AS DOUBLE))
             * (CAST(sr.r_d AS DOUBLE) / CAST(tot.t_d AS DOUBLE))
             AS DECIMAL(20,15))) AS DOUBLE), 6) AS hhi
    FROM sr
    JOIN tot ON sr.s_nationkey = tot.s_nationkey
    JOIN nation n ON sr.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, tot.n_suppliers
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within each
    nation -- the supply-risk score (1/n = perfectly spread, 1.0 =
    single-source). Shares come from exact DECIMAL revenue; each squared
    share -- an identical double expression on both engines -- is snapped
    to DECIMAL(20,15) before the cross-supplier sum, so the reduction is
    order-independent (same trick as embedding_centroid_distance).

    Scale: lineitem reduces to |suppliers| rows behind a broadcast dim;
    everything after is dim-scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sr = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(_rev()).alias("r_d"))
    )
    tot = sr.groupBy(F.col("s_nationkey").alias("t_key")).agg(
        F.sum("r_d").alias("t_d"), F.count("*").alias("n_suppliers")
    )
    share = F.col("r_d").cast("double") / F.col("t_d").cast("double")
    return (
        sr.join(F.broadcast(tot), F.col("s_nationkey") == F.col("t_key"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.col("n_suppliers").cast("bigint").alias("n_suppliers"))
        .agg(
            F.round(
                F.sum((share * share).cast("decimal(20,15)")).cast("double"), 6
            ).alias("hhi")
        )
    )


@register(
    "orders_yearly_growth",
    tags=("agg", "window", "relational", "timeseries"),
    oracle="""
    WITH yr AS (
      SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT order_year, CAST(rev_d AS DOUBLE) AS revenue, n_orders,
           round(100 * (CAST(rev_d AS DOUBLE)
                        - CAST(lag(rev_d) OVER (ORDER BY order_year) AS DOUBLE))
                 / CAST(lag(rev_d) OVER (ORDER BY order_year) AS DOUBLE), 6)
             AS yoy_growth_pct
    FROM yr
    """,
)
def orders_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth -- the board-slide query. Yearly
    totals are exact DECIMAL sums; the growth ratio is one identical
    double expression over this year's and last year's exact totals (lag
    over the year axis; first year NULL by construction).

    Scale: facts partial-agg to |years| rows; the unpartitioned lag
    window sees single-digit rows forever."""
    o = load_table(spark, sf_dir, "orders")
    yr = o.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("order_year")
    prev = F.lag("rev_d").over(w)
    return yr.select(
        "order_year",
        F.col("rev_d").cast("double").alias("revenue"),
        "n_orders",
        F.round(
            100
            * (F.col("rev_d").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("yoy_growth_pct"),
    )


@register(
    "tpch_q8_market_share",
    tags=("join", "agg", "relational"),
    oracle=f"""
    WITH flat AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_REV} AS rev_d,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_d
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS nation_revenue,
           CAST(sum(rev_d) AS DOUBLE) AS total_revenue,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_d
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(rev_d) AS DOUBLE), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of the
    product-segment revenue per order-year. The conditional/unconditional
    sums accumulate in the same DECIMAL type (typed else-branch -- the Q14
    rule); the share is one identical double division.

    Scale: part's segment filter prunes at its broadcast build; supplier
    and nation broadcast; lineitem shuffles once on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    nat = F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nat).cast("double").alias("nation_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
                "mkt_share"
            ),
        )
    )


@register(
    "tpch_q13_order_count_dist",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by how
    many orders they placed -- INCLUDING the zero-order customers the
    left join preserves (the classic inner-join-loses-rows trap).

    Scale: the left join shuffles both sides on custkey once; the double
    aggregation reduces to |customers| then |distinct counts| rows --
    each with map-side combine."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    tags=("join", "agg", "window", "relational"),
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_REV}) AS total_rev_d
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev_d AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev_d = (SELECT max(total_rev_d) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue in a
    quarter -- ties kept, exactly as the spec's correlated max demands.
    The max is computed on the EXACT DECIMAL revenue (a double max could
    disagree with the per-row sums it came from), and the filter joins
    the 1-row max back as a broadcast.

    Scale: lineitem's date filter pushes to the scan; one partial-agg
    shuffle to |suppliers| rows; everything after is dim-scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev_d"))
    mx = rev.agg(F.max("total_rev_d").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_d") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev_d").cast("double").alias("total_revenue")
        )
    )


@register(
    "tpch_q22_idle_customers",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted to the fixture's
    dense order history): per nation, the count and account-balance mass
    of customers who are richer than the positive-balance average yet
    placed NO order in the final two years -- the dormant-value segment.
    NOT EXISTS compiles to a LEFT ANTI join; the average is a broadcast
    scalar from exact DECIMAL sums. (The spec's "never ordered" predicate
    is empty on this fixture -- every rich customer has ordered at least
    once -- so the recency cutoff keeps the check non-degenerate.)

    Scale: the date filter prunes the anti join's build side at the scan;
    customer is the probe; the agg sees |idle customers| rows over
    |nations| groups."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("a")
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "supplier_part_coverage",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH catalog AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part)
    SELECT s.s_suppkey, s.s_name,
           CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_distinct_parts,
           round(CAST(count(DISTINCT l.l_partkey) AS DOUBLE)
                 / CAST(catalog.n_parts AS DOUBLE), 6) AS catalog_share
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    CROSS JOIN catalog
    GROUP BY s.s_suppkey, s.s_name, catalog.n_parts
    """,
)
def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage per supplier: how many distinct parts each
    supplier has shipped and what share of the full part catalog that is
    -- the assortment-breadth metric behind sourcing decisions.

    COUNT(DISTINCT) expands to a two-phase exact distinct aggregate
    (dedupe on (suppkey, partkey), then count) -- the plan Catalyst picks
    automatically; the catalog total is a broadcast 1-row scalar. Shuffle
    carries (suppkey, partkey) pairs, bounded by |suppliers| x |parts|."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    catalog = load_table(spark, sf_dir, "part").agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(catalog))
        .groupBy("s_suppkey", "s_name", "n_parts")
        .agg(F.count_distinct("l_partkey").cast("bigint").alias("n_distinct_parts"))
        .select(
            "s_suppkey",
            "s_name",
            "n_distinct_parts",
            F.round(
                F.col("n_distinct_parts").cast("double") / F.col("n_parts").cast("double"),
                6,
            ).alias("catalog_share"),
        )
    )


@register(
    "orders_abc_pareto",
    tags=("agg", "window", "relational"),
    oracle="""
    WITH cr AS (
      SELECT o_custkey AS c_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(rev_d) AS t FROM cr),
    ranked AS (
      SELECT c_custkey, rev_d,
             sum(rev_d) OVER (ORDER BY rev_d DESC, c_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_d
      FROM cr
    )
    SELECT c_custkey,
           CAST(rev_d AS DOUBLE) AS revenue,
           round(CAST(cum_d AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
             AS cum_share,
           CASE WHEN CAST(cum_d AS DOUBLE) / CAST(tot.t AS DOUBLE) <= 0.80
                  THEN 'A'
                WHEN CAST(cum_d AS DOUBLE) / CAST(tot.t AS DOUBLE) <= 0.95
                  THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked CROSS JOIN tot
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue: rank by exact
    DECIMAL revenue, cumulative share against the broadcast total, class
    A = first 80% of revenue, B = next 15%, C = tail -- the 80/20 cut
    behind account-tiering and stock classification.

    Determinism: the running sum orders on (rev_d DESC, c_custkey) over
    exact decimals, so cum_share and the class edges are bit-identical;
    the class compares the same double expression in both engines.

    Scale: facts reduce to |customers| rows first; the unpartitioned
    running sum is a dim-scale sort (at 10^9 customers, band by an
    approx-quantile prefix first -- the output contract survives)."""
    o = load_table(spark, sf_dir, "orders")
    cr = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d")
    )
    tot = cr.agg(F.sum("rev_d").alias("t"))
    w = Window.orderBy(F.col("rev_d").desc(), "c_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    share = F.col("cum_d").cast("double") / F.col("t").cast("double")
    return (
        cr.withColumn("cum_d", F.sum("rev_d").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "c_custkey",
            F.col("rev_d").cast("double").alias("revenue"),
            F.round(share, 6).alias("cum_share"),
            F.when(share <= 0.80, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


# ---------------------------------------------------------------------------
# round-5 TPC-H completion: every remaining dash that the fixture star schema
# can express. Q2/Q11/Q16/Q20 need the partsupp table the fixtures don't
# ship and are out of scope by data model, not by engine capability.
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_order_priority_exists",
    tags=("join", "agg", "relational"),
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted to fixture columns: the
    reference schema's commit/receipt dates don't exist here, so "late" is
    a line item shipped more than 45 days after the order date (fixture
    mean ship lag is ~39 days). Counts a half-year of orders by priority
    where at least one line item was late -- the EXISTS-subquery dash.

    Scale: the EXISTS compiles to a LEFT SEMI join on l_orderkey -- one
    co-located shuffle join, no row multiplication however many line items
    match; the order-date filter prunes the orders scan before the join;
    the priority agg is |priorities| states."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )


@register(
    "tpch_q6_forecast_revenue",
    tags=("agg", "relational"),
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the revenue that would have
    been kept by eliminating small discounts on low-quantity lines in one
    ship-year -- the pure-scan aggregate dash.

    Scale: every predicate (shipdate range, discount band, quantity cap)
    pushes to the parquet scan for row-group skipping; zero joins; the
    aggregate is a single global partial->final pair (one row crosses the
    exchange per task). Revenue multiplies in DECIMAL on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


@register(
    "tpch_q9_product_profit",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INT) AS o_year,
           CAST(round(
             CAST(sum({_REV}) AS DOUBLE)
             - 0.5 * CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))
                              * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE),
             6) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: the reference prices cost
    from partsupp.ps_supplycost, which the fixtures don't ship, so cost is
    half the part's retail price per unit -- the join/agg topology (fact x
    three dims -> nation x year profit rollup) is the operator under test,
    not the costing constant.

    Scale: supplier, nation, and part all broadcast (dim-sized); lineitem
    never shuffles before the (nation, year) agg, which carries two exact
    DECIMAL sums combined into one double at the end. |nations| x |years|
    result rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(_rev()).cast("double")
                - 0.5 * F.sum(cost).cast("double"),
                6,
            ).alias("profit")
        )
    )


@register(
    "tpch_q12_ship_delay_priority",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH d AS (
      SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
                  WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN 'normal'
                  ELSE 'late' END AS delay_bucket,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS high
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT delay_bucket,
           CAST(sum(high) AS BIGINT) AS n_high_priority,
           CAST(sum(1 - high) AS BIGINT) AS n_low_priority
    FROM d GROUP BY delay_bucket
    """,
)
def tpch_q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted: the fixture
    has no ship mode or receipt date, so line items bucket by ship delay
    (<=30 fast, <=60 normal, else late) and each bucket counts
    high-priority vs other orders -- did urgent orders actually ship
    faster? The conditional-count pivot dash.

    Scale: lineitem and orders shuffle once each, co-located on the order
    key; integer day arithmetic; 3 x 2 counter states. At 100 TB both
    sides would be bucketed on the order key and the join is shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 60, "normal").otherwise("late")
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("delay_bucket"), high.alias("high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum("high").cast("bigint").alias("n_high_priority"),
            F.sum(1 - F.col("high")).cast("bigint").alias("n_low_priority"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS sq
      FROM lineitem GROUP BY 1
    )
    SELECT p.p_brand,
           CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / 7.0, 6) AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE 2 * CAST(l.l_quantity * 100 AS BIGINT) * pa.cnt < pa.sq
    GROUP BY 1
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), at brand grain: revenue
    locked in line items whose quantity is below half their part's average
    -- the correlated-aggregate dash, decorrelated into a per-part
    aggregate joined back to the fact table.

    The below-half-average predicate is pure BIGINT arithmetic
    (2 * qty * cnt < sum_qty, quantities exact in integer hundredths), so
    the boundary decision is bit-identical across engines -- no double
    division ever happens.

    Scale: the per-part aggregate and the fact table co-locate on
    l_partkey (one shuffle each, or zero with partkey bucketing); part
    broadcasts for the brand label; |brands| result rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qc = (F.col("l_quantity") * 100).cast("bigint")
    pa = li.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(qc).cast("bigint").alias("sq"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
                F.col("l_partkey") == F.col("pa_partkey"))
        .filter(2 * qc * F.col("cnt") < F.col("sq"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    tags=("join", "window", "relational"),
    oracle="""
    WITH ls AS (
      SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS smax
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    w0 AS (
      SELECT l_orderkey, l_suppkey, smax,
             max(smax) OVER (PARTITION BY l_orderkey) AS omax,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp
      FROM ls
    ),
    w AS (
      SELECT w0.*,
             sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey) AS n_at_max
      FROM w0
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS n_orders_blamed
    FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
    WHERE w.smax = w.omax AND w.n_at_max = 1 AND w.n_supp >= 2
    GROUP BY s.s_name
    ORDER BY n_orders_blamed DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: no receipt
    or commit dates in the fixture, so the blamed supplier of a finished
    multi-supplier order is the UNIQUE supplier whose last ship date is
    the order's latest -- the same "sole straggler" semantics Q21's
    exists/not-exists pair encodes, expressed with windows.

    Scale: per-(order, supplier) max reduces the fact table before any
    window; the three windows share one l_orderkey partitioning (one
    shuffle); supplier broadcasts for names; top-20 is
    TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    ls = (
        load_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    wo = Window.partitionBy("l_orderkey")
    ls = ls.withColumn("omax", F.max("smax").over(wo)).withColumn(
        "n_supp", F.count("*").over(wo)
    )
    ls = ls.withColumn(
        "n_at_max",
        F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0)).over(wo),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ls.filter(
            (F.col("smax") == F.col("omax"))
            & (F.col("n_at_max") == 1)
            & (F.col("n_supp") >= 2)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("n_orders_blamed"))
        .orderBy(F.col("n_orders_blamed").desc(), "s_name")
        .limit(20)
    )


@register(
    "basket_brand_lift",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
    c AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY 1),
    pr AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT pr.brand_a, pr.brand_b, pr.n_ab,
           round(CAST(pr.n_ab AS DOUBLE) / tot.n_orders, 6) AS support,
           round(CAST(pr.n_ab AS DOUBLE) * tot.n_orders
                 / (ca.n * cb.n), 6) AS lift
    FROM pr
    JOIN c ca ON ca.p_brand = pr.brand_a
    JOIN c cb ON cb.p_brand = pr.brand_b
    CROSS JOIN tot
    WHERE pr.n_ab >= 5
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association metrics on top of basket_brand_pairs'
    co-occurrence grain: support and lift for the strongest brand pairs
    (lift > 1 = bought together more than independence predicts) -- the
    scoring half of frequent-itemset mining.

    Scale: identical pair topology as basket_brand_pairs (brand-grain
    dedup bounds the self-join, co-located on l_orderkey); the per-brand
    margins are |brands| rows and the order total is one row, both
    broadcast back onto the |brands|^2-bounded pair relation. All counts
    exact BIGINT; support/lift are single double expressions rounded at
    the end. The reduced basket relation is persisted: five consumers
    (total, margins, both self-join sides) would otherwise each re-derive
    it from the fact table -- measured 5 planned lineitem scans;
    materialize-once is the standard itemset-mining shape (MEMORY_AND_DISK
    -- at 100 TB the reduced relation spills, it never re-scans)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)
    )
    tot = ob.select(F.count_distinct("l_orderkey").cast("bigint").alias("n_orders"))
    c = ob.groupBy("p_brand").agg(F.count("*").cast("bigint").alias("n"))
    a = ob.select(F.col("l_orderkey").alias("ok_a"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("brand_b"))
    pr = (
        a.join(
            b,
            (F.col("ok_a") == F.col("ok_b")) & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    ca = c.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a"))
    cb = c.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pr.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "tpch_q2_min_cost_supplier",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS DOUBLE)
                 / nullif(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
               AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    cand AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.unit_cost,
             min(ps.unit_cost) OVER (PARTITION BY ps.l_partkey) AS best
      FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           CAST(c.l_partkey AS BIGINT) AS p_partkey, p.p_name,
           round(c.unit_cost, 6) AS supply_cost
    FROM cand c
    JOIN eu ON c.l_suppkey = eu.s_suppkey
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE c.unit_cost = c.best
      AND p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p_partkey
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the fixture has no
    partsupp table, so the part-supplier relation derives from observed
    line items -- supply cost is the minimum unit price
    (extendedprice/quantity) a supplier ever charged for the part -- and
    the complaint-free European supplier hunt becomes: for LARGE parts in
    a size band, which ASIA-region supplier offers each at its regional
    minimum cost.

    Unit cost is an IEEE division of two exact BIGINTs (cent-scaled via
    DECIMAL, so both engines see identical integers), making the min and
    the cost-equality predicate bit-identical across engines.

    Scale: the derived partsupp is one (partkey, suppkey) partial agg over
    the fact table; the regional supplier dim broadcasts; the per-part
    regional minimum is one window over the |parts x region suppliers|
    candidate relation, already reduced from line-item grain. At 100 TB
    the ps aggregate is the only fact-sized shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    pc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    qc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    # nullif: a zero-quantity line must contribute NULL (min skips it),
    # not an ANSI divide-by-zero that kills the audit
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(pc.cast("double") / F.nullif(qc, F.lit(0))).alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey).withColumn(
        "best", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    return (
        cand.filter(F.col("unit_cost") == F.col("best"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            "p_name",
            F.round("unit_cost", 6).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@register(
    "tpch_q11_important_stock",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH nat AS (
      SELECT s_suppkey FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    v AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem l JOIN nat ON l.l_suppkey = nat.s_suppkey
      GROUP BY 1
    ),
    tot AS (SELECT sum(value) AS total FROM v)
    SELECT CAST(v.l_partkey AS BIGINT) AS p_partkey,
           CAST(v.value AS DOUBLE) AS value
    FROM v CROSS JOIN tot
    WHERE v.value > tot.total * 0.001
    ORDER BY value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: with no
    partsupp availqty, a part's held value for one nation's suppliers is
    the DECIMAL sum of their line-item extended prices, and the query
    keeps parts whose value exceeds a fixed fraction of the nation's
    total -- the scalar-subquery-threshold dash.

    Scale: one partkey partial agg over the nation-filtered fact slice
    (the nation's supplier list broadcasts as a semi-join); the grand
    total re-aggregates the |parts| rollup, not the fact table, and
    broadcasts back as a 1-row cross join. Value sums stay DECIMAL (exact,
    order-independent) through the threshold comparison; cast to DOUBLE
    only for display."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    v = (
        li.join(F.broadcast(nat), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    tot = v.agg(F.sum("value").alias("total"))
    return (
        v.crossJoin(F.broadcast(tot))
        # value * 1000 > total keeps both operands DECIMAL (a 0.001 float
        # literal would promote the comparison to DOUBLE while the DuckDB
        # oracle's 0.001 stays DECIMAL(4,3) -- boundary values could flip).
        .filter(F.col("value") * F.lit(1000) > F.col("total"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@register(
    "tpch_q16_supplier_count_by_part",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN ok_supp ON ps.l_suppkey = ok_supp.s_suppkey
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the part-supplier
    relation derives from distinct (l_partkey, l_suppkey) pairs in the
    fact table, and Q16's customer-complaint supplier exclusion becomes a
    negative-balance exclusion (the fixture's only supplier-health
    signal). Counts distinct suppliers per (brand, type, size) for the
    filtered part families.

    Scale: the distinct pair reduction is the only fact-sized shuffle and
    carries two keys, never text; the ok-supplier list and the filtered
    part dim both broadcast; count(DISTINCT suppkey) expands to the
    standard two-level partial aggregate over the already-reduced pair
    relation. |brand x type x size| result rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ps = li.distinct()
    ok = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(F.broadcast(ok), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_dominant_suppliers",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS qty_supp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    pt AS (
      SELECT l_partkey, CAST(sum(qty_supp) AS BIGINT) AS qty_total
      FROM pq GROUP BY 1
    ),
    dom AS (
      SELECT DISTINCT pq.l_suppkey
      FROM pq
      JOIN pt ON pq.l_partkey = pt.l_partkey
      JOIN part p ON p.p_partkey = pq.l_partkey
      WHERE 2 * pq.qty_supp > pt.qty_total
        AND p.p_name LIKE 'small %'
    )
    SELECT s.s_name, n.n_name
    FROM dom
    JOIN supplier s ON dom.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_name
    """,
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: without partsupp
    availqty, "holds excess stock of a part" becomes "shipped strictly
    more than half of the part's total 1996 volume" -- the same
    correlated half-of-demand threshold Q20 encodes, decorrelated into a
    per-(part, supplier) aggregate compared against the per-part total.
    Suppliers qualifying on any 'small %' part are listed with their
    nation.

    The dominance predicate is exact BIGINT arithmetic on cent-scaled
    quantities (2 * qty_supp > qty_total) -- no division, so the boundary
    is bit-identical across engines.

    Scale: the date filter prunes at the scan; the (part, supplier)
    aggregate is the one fact-sized shuffle; the per-part total
    re-aggregates that rollup and joins back co-located on l_partkey; the
    part-name filter broadcasts; output is |suppliers|-bounded."""
    qc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", qc.alias("qc"))
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qc").cast("bigint").alias("qty_supp")
    )
    pt = pq.groupBy("l_partkey").agg(
        F.sum("qty_supp").cast("bigint").alias("qty_total")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small %")
    ).select("p_partkey")
    dom = (
        pq.join(pt, "l_partkey")
        .filter(2 * F.col("qty_supp") > F.col("qty_total"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        dom.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "discount_quantity_effect",
    tags=("agg", "relational"),
    oracle=f"""
    WITH b AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS discount_pct,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS qty_cents,
             sum({_REV}) AS rev
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(rev) AS rev_total FROM b)
    SELECT b.discount_pct, b.n_items,
           CAST(round(CAST(b.qty_cents AS DOUBLE) / 100 / b.n_items, 6)
                AS DOUBLE) AS avg_qty,
           CAST(round(CAST(b.rev AS DOUBLE) / CAST(tot.rev_total AS DOUBLE), 6)
                AS DOUBLE) AS revenue_share
    FROM b CROSS JOIN tot
    ORDER BY discount_pct
    """,
)
def discount_quantity_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity dash: per discount level (exact integer
    percent), how many line items, the average quantity (do deeper
    discounts move bigger baskets?), and the level's share of total
    revenue -- the pricing analysis TPC-H Q6 gestures at, done as a full
    distribution instead of one slice.

    Scale: one partial agg with |discount levels| states (~12); the
    revenue total re-aggregates that rollup (1-row broadcast back).
    Quantities and revenue stay exact (BIGINT cents / DECIMAL) until the
    two final display divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("discount_pct")
    ).agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("qty_cents"),
        F.sum(_rev()).alias("rev"),
    )
    tot = b.agg(F.sum("rev").alias("rev_total"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "discount_pct",
            "n_items",
            F.round(F.col("qty_cents").cast("double") / 100 / F.col("n_items"), 6)
            .cast("double")
            .alias("avg_qty"),
            F.round(F.col("rev").cast("double") / F.col("rev_total").cast("double"), 6)
            .cast("double")
            .alias("revenue_share"),
        )
        .orderBy("discount_pct")
    )


@register(
    "orders_seasonal_index",
    tags=("agg", "window", "relational"),
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE) /
                 (CAST(sum(rev) OVER (PARTITION BY yr) AS DOUBLE)
                  / count(*) OVER (PARTITION BY yr)), 6) AS seasonal_index
    FROM m ORDER BY yr, mo
    """,
)
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality index: each month's revenue relative to its
    year's average month -- the demand-planning normalization that makes
    December-vs-March comparable across years.

    Scale: one partial agg to |year x month| rows (the only pass over
    orders), then the window runs on the 12-rows-per-year rollup --
    window cost is dim-scale, never data-scale. Revenue stays DECIMAL
    through the agg; the index is one double division of exact sums."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    wy = Window.partitionBy("yr")
    return (
        m.withColumn(
            "seasonal_index",
            F.round(
                F.col("rev").cast("double")
                / (F.sum("rev").over(wy).cast("double") / F.count("*").over(wy)),
                6,
            ),
        )
        .select("yr", "mo", F.col("rev").cast("double").alias("revenue"), "seasonal_index")
        .orderBy("yr", "mo")
    )


@register(
    "regional_price_dispersion",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH u AS (
      SELECT r.r_name,
             CAST(round(l.l_extendedprice / l.l_quantity, 6)
                  AS DECIMAL(18,6)) AS unit_price
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(unit_price) AS DOUBLE) / count(*), 6) AS avg_unit_price,
           round(sqrt((CAST(sum(CAST(unit_price AS DECIMAL(19,6))
                                * CAST(unit_price AS DECIMAL(19,6)))
                            AS DOUBLE)
                       - CAST(sum(unit_price) AS DOUBLE)
                         * CAST(sum(unit_price) AS DOUBLE) / count(*))
                      / (count(*) - 1)), 6) AS stddev_unit_price
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def regional_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion by supplier region: mean and sample stddev of
    extendedprice/quantity -- the procurement dashboard that shows which
    region's pricing is volatile.

    Scale: supplier/nation/region broadcast onto the fact scan; ONE
    |regions|-state partial agg carries exact DECIMAL moments (unit price
    rounded to 6 dp first, so sum and sum-of-squares are accumulation-
    order-independent across engines); mean and stddev are closed-form
    doubles computed from the exact sums at the end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    u = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
            .cast("decimal(18,6)")
            .alias("up"),
        )
    )
    cnt = F.count("*")
    s1 = F.sum("up").cast("double")
    s2 = F.sum((F.col("up") * F.col("up")).cast("decimal(38,12)")).cast("double")
    return (
        u.groupBy("r_name")
        .agg(
            cnt.cast("bigint").alias("n_lines"),
            F.round(s1 / cnt, 6).alias("avg_unit_price"),
            F.round(F.sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 6).alias(
                "stddev_unit_price"
            ),
        )
        .orderBy("r_name")
    )


@register(
    "part_substitution_candidates",
    tags=("join", "relational"),
    oracle="""
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_brand, a.p_type,
           CAST(a.p_size AS INT) AS size_a, CAST(b.p_size AS INT) AS size_b,
           round(abs(a.p_retailprice - b.p_retailprice), 2) AS price_gap
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND b.p_size = a.p_size + 1
    ORDER BY partkey_a, partkey_b
    """,
)
def part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substitution candidates: part pairs in the same brand+type whose
    sizes are adjacent -- the catalog query behind out-of-stock
    recommendations and assortment rationalization.

    Scale: an equi-join on (brand, type) with the +1-size predicate as a
    join-key component (b.size = a.size + 1 is an equality after the
    rewrite, so this hashes -- never a range or cross join); pair space is
    bounded by parts-per-(brand, type, size), a catalog constant."""
    p = load_table(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("b.p_size") == F.col("a.p_size") + 1),
        )
        .select(
            F.col("a.p_partkey").alias("partkey_a"),
            F.col("b.p_partkey").alias("partkey_b"),
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").cast("int").alias("size_a"),
            F.col("b.p_size").cast("int").alias("size_b"),
            F.round(F.abs(F.col("a.p_retailprice") - F.col("b.p_retailprice")), 2).alias(
                "price_gap"
            ),
        )
        .orderBy("partkey_a", "partkey_b")
    )


@register(
    "orders_priority_sla_breach",
    tags=("join", "agg", "relational"),
    oracle="""
    WITH first_ship AS (
      SELECT l_orderkey, min(l_shipdate) AS first_ship
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE f.first_ship > o.o_orderdate
                                       + INTERVAL 30 DAY) AS BIGINT) AS n_breached,
           round(CAST(count(*) FILTER (WHERE f.first_ship > o.o_orderdate
                                             + INTERVAL 30 DAY) AS DOUBLE)
                 / count(*), 6) AS breach_rate
    FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def orders_priority_sla_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA panel: per order-month and priority, the share of orders whose
    FIRST shipment left more than 30 days after the order date -- the
    fulfillment-health query an ops team pages on.

    Scale: lineitem partial-aggregates to one min-shipdate row per order
    BEFORE the join (map-side combine -- the fact table's width never
    crosses the wire), then joins orders on the shared o_orderkey
    partitioning; the month x priority rollup is dim-scale."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    breached = F.col("first_ship") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    return (
        o.join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"), "o_orderpriority"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.count_if(breached).cast("bigint").alias("n_breached"),
            F.round(F.count_if(breached).cast("double") / F.count("*"), 6).alias(
                "breach_rate"
            ),
        )
        .orderBy("month", "o_orderpriority")
    )


@register(
    "customer_wallet_share",
    tags=("agg", "window", "relational"),
    oracle="""
    WITH s AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey, yr,
           CAST(spend AS DOUBLE) AS spend,
           round(CAST(spend AS DOUBLE) /
                 CAST(sum(spend) OVER (PARTITION BY o_custkey) AS DOUBLE), 6)
             AS share_of_wallet
    FROM s ORDER BY custkey, yr
    """,
)
def customer_wallet_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer-year spend and its share of the customer's lifetime
    spend -- the wallet-trajectory view behind churn-risk scoring (a
    shrinking share in recent years IS the churn signal).

    Scale: orders partial-aggregates to |customers x years| rows in one
    shuffle; the share window partitions by customer over that rollup
    (a handful of rows per key). DECIMAL spend, one double division."""
    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy(
        F.col("o_custkey"), F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    wc = Window.partitionBy("o_custkey")
    return (
        s.withColumn(
            "share_of_wallet",
            F.round(
                F.col("spend").cast("double") / F.sum("spend").over(wc).cast("double"), 6
            ),
        )
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            "yr",
            F.col("spend").cast("double").alias("spend"),
            "share_of_wallet",
        )
        .orderBy("custkey", "yr")
    )


@register(
    "returnflag_rate_by_brand",
    tags=("join", "agg", "relational"),
    oracle=f"""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE l.l_returnflag = 'R') AS BIGINT)
             AS n_returned,
           round(CAST(count(*) FILTER (WHERE l.l_returnflag = 'R') AS DOUBLE)
                 / count(*), 6) AS return_rate,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returned_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1 ORDER BY 1
    """,
)
def returnflag_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned revenue by brand -- the merchandising
    quality panel (a brand whose return rate doubles is a product or
    fulfillment defect surfacing as customer behavior).

    Scale: part broadcasts onto the lineitem scan (dim vs fact); ONE
    |brands|-state partial agg computes count, conditional count, and
    conditional DECIMAL revenue in the same pass -- no second scan for
    the returned slice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.count_if(ret).cast("bigint").alias("n_returned"),
            F.round(F.count_if(ret).cast("double") / F.count("*"), 6).alias(
                "return_rate"
            ),
            F.sum(F.when(ret, _rev()).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("double")
            .alias("returned_revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "supplier_revenue_rank_by_region",
    tags=("join", "agg", "window", "relational"),
    oracle=f"""
    WITH rev AS (
      SELECT r.r_name, s.s_suppkey, s.s_name,
             sum({_REV}) AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2, 3
    )
    SELECT r_name, CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(revenue AS DOUBLE) AS revenue, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY r_name
                                   ORDER BY revenue DESC, s_suppkey) AS rnk
      FROM rev
    ) t
    WHERE rnk <= 5 ORDER BY r_name, rnk
    """,
)
def supplier_revenue_rank_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 suppliers by revenue within each region -- the leaderboard
    variant of the regional revenue rollup, with a deterministic
    (revenue DESC, suppkey) tiebreak.

    Scale: supplier/nation/region broadcast; ONE supplier-grain partial
    agg over the fact scan (DECIMAL revenue); the rank window runs on the
    |suppliers| rollup partitioned by region and Spark 4's
    WindowGroupLimit keeps 5 per region map-side before the exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "s_suppkey", "s_name")
        .agg(F.sum(_rev()).alias("revenue"))
    )
    w = Window.partitionBy("r_name").orderBy(F.col("revenue").desc(), "s_suppkey")
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select(
            "r_name",
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("revenue").cast("double").alias("revenue"),
            "rnk",
        )
        .orderBy("r_name", "rnk")
    )


@register(
    "orders_monthly_momentum",
    tags=("agg", "window", "timeseries", "relational"),
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month,
           round(revenue, 2) AS revenue,
           round(100.0 * (revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 4) AS mom_pct,
           round((revenue
                  + coalesce(lag(revenue, 1) OVER w, 0)
                  + coalesce(lag(revenue, 2) OVER w, 0))
                 / (1 + CASE WHEN lag(revenue, 1) OVER w IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN lag(revenue, 2) OVER w IS NULL THEN 0 ELSE 1 END),
                 2) AS ma3
    FROM m WINDOW w AS (ORDER BY month) ORDER BY month
    """,
)
def orders_monthly_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue momentum: month-over-month % change plus a trailing
    3-month moving average -- the topline finance chart. The MA is written
    as an explicit lag-sum (not ``avg() OVER ROWS 2 PRECEDING``) so both
    engines evaluate the identical closed-form double expression on exact
    DECIMAL-summed monthly totals.

    Scale: the fact scan collapses to |months| rows in ONE partial agg;
    the ordered window then runs on that tiny rollup (single task, fine --
    it is |months| rows regardless of fact size)."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("month")
    l1 = F.lag("revenue", 1).over(w)
    l2 = F.lag("revenue", 2).over(w)
    denom = (
        F.lit(1)
        + F.when(l1.isNull(), 0).otherwise(1)
        + F.when(l2.isNull(), 0).otherwise(1)
    )
    return (
        m.select(
            "month",
            F.round(F.col("revenue"), 2).alias("revenue"),
            F.round(100.0 * (F.col("revenue") - l1) / l1, 4).alias("mom_pct"),
            F.round(
                (F.col("revenue") + F.coalesce(l1, F.lit(0.0)) + F.coalesce(l2, F.lit(0.0)))
                / denom,
                2,
            ).alias("ma3"),
        )
        .orderBy("month")
    )


@register(
    "part_price_band_mix",
    tags=("agg", "relational"),
    oracle="""
    SELECT p_brand,
           CAST(floor(p_retailprice / 100) * 100 AS BIGINT) AS price_band,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(CAST(p_size AS BIGINT)) AS DOUBLE) / count(*), 4)
             AS avg_size
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def part_price_band_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog mix by brand x $100 price band (a merchandising pivot):
    how many SKUs each brand fields per price band and their average size.
    Band edges come from integer floor division, so both engines bucket
    identically with no float-boundary flap.

    Scale: pure map-side projection + ONE |brands x bands|-state partial
    agg; integer sums stay exact."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(
            "p_brand",
            (F.floor(F.col("p_retailprice") / 100) * 100)
            .cast("bigint")
            .alias("price_band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.col("p_size").cast("bigint")).cast("double") / F.count("*"), 4
            ).alias("avg_size"),
        )
        .orderBy("p_brand", "price_band")
    )


@register(
    "customer_repeat_interval_by_segment",
    tags=("window", "agg", "relational"),
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    ),
    j AS (
      SELECT c.c_mktsegment, g.gap
      FROM g JOIN customer c ON g.o_custkey = c.c_custkey
      WHERE g.gap IS NOT NULL
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(CAST(gap AS BIGINT)) AS DOUBLE) / count(*), 4)
             AS avg_gap_days,
           CAST(sum(CASE WHEN gap <= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_week,
           CAST(sum(CASE WHEN gap <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_month
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def customer_repeat_interval_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence by market segment: day gaps between each
    customer's consecutive orders (lag over the per-customer order
    sequence), rolled up to segment-level mean and <=7d / <=30d shares.
    Gaps are exact integer day-diffs, so every aggregate is exact.

    Scale: ONE keyed shuffle on o_custkey for the lag window; the
    customer dim broadcasts onto the gap rows; final agg is
    |segments|-state."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        g.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.round(
                F.sum(F.col("gap").cast("bigint")).cast("double") / F.count("*"), 4
            ).alias("avg_gap_days"),
            F.sum(F.when(F.col("gap") <= 7, 1).otherwise(0))
            .cast("bigint")
            .alias("n_within_week"),
            F.sum(F.when(F.col("gap") <= 30, 1).otherwise(0))
            .cast("bigint")
            .alias("n_within_month"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "shipdate_dow_revenue",
    tags=("agg", "relational"),
    oracle=f"""
    SELECT CAST(isodow(l_shipdate) AS INT) AS dow_iso,
           l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def shipdate_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping revenue by ISO day-of-week x line status (warehouse
    staffing view: does weekend shipping carry real revenue?). Spark's
    ``dayofweek`` is Sunday=1, so it is remapped to ISO Monday=1..Sunday=7
    to match the oracle's ``isodow`` exactly.

    Scale: map-side date arithmetic + ONE 14-state partial agg over the
    fact scan; DECIMAL revenue keeps the sum accumulation-order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    dow_iso = ((F.dayofweek(F.col("l_shipdate")) + 5) % 7 + 1).cast("int")
    return (
        li.groupBy(dow_iso.alias("dow_iso"), "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
        .orderBy("dow_iso", "l_linestatus")
    )


@register(
    "orders_basket_size_dist",
    tags=("agg", "relational"),
    oracle=f"""
    WITH s AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum({_REV}) AS DECIMAL(38,4)) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT n_items,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(rev) AS DOUBLE) / count(*), 2) AS avg_order_revenue
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def orders_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: how many orders have 1, 2, ... line
    items, and the average order revenue at each size -- the histogram
    behind free-shipping-threshold decisions. Revenue stays DECIMAL
    through BOTH aggregation levels; only the final mean is a double.

    Scale: two partial aggs -- |orders|-grain then |sizes|-grain -- both
    map-side combinable; nothing wider than the orderkey shuffle Spark
    already needs for the first group."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(_rev()).cast("decimal(38,4)").alias("rev"),
    )
    return (
        s.groupBy("n_items")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("rev").cast("double") / F.count("*"), 2).alias(
                "avg_order_revenue"
            ),
        )
        .orderBy("n_items")
    )


@register(
    "customer_balance_vs_spend",
    tags=("agg", "join", "relational"),
    oracle="""
    WITH sp AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y_c
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT c.c_mktsegment,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS x_c,
             sp.y_c
      FROM customer c JOIN sp ON c.c_custkey = sp.o_custkey
    ),
    m AS (
      SELECT c_mktsegment,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x_c AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(y_c AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(x_c AS HUGEINT) * y_c) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x_c AS HUGEINT) * x_c) AS DOUBLE) AS sx2,
             CAST(sum(CAST(y_c AS HUGEINT) * y_c) AS DOUBLE) AS sy2
      FROM j GROUP BY 1
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n_customers,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 6) AS corr_balance_spend
    FROM m ORDER BY 1
    """,
)
def customer_balance_vs_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does account balance predict spend? Pearson correlation of
    c_acctbal vs lifetime order total, per market segment. Both inputs are
    quantized to exact integer cents and every moment (sum, sum-of-squares,
    cross-sum) accumulates integrally -- DECIMAL(38,0) on Spark, HUGEINT in
    the oracle -- so the closed-form correlation is bit-identical across
    engines (cites ``agg_corr_manual`` for the generic shape).

    Scale: |customers|-grain partial agg on orders, broadcast customer dim,
    |segments|-state moment agg; no double accumulates anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("x_c"),
    )
    sp = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y_c")
    )
    j = sp.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    m = j.groupBy("c_mktsegment").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("x_c")).cast("double").alias("sx"),
        F.sum(dec("y_c")).cast("double").alias("sy"),
        F.sum(dec("x_c") * F.col("y_c")).cast("double").alias("sxy"),
        F.sum(dec("x_c") * F.col("x_c")).cast("double").alias("sx2"),
        F.sum(dec("y_c") * F.col("y_c")).cast("double").alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return (
        m.select(
            "c_mktsegment",
            n.cast("bigint").alias("n_customers"),
            F.round(
                (n * F.col("sxy") - sx * sy)
                / (
                    F.sqrt(n * F.col("sx2") - sx * sx)
                    * F.sqrt(n * F.col("sy2") - sy * sy)
                ),
                6,
            ).alias("corr_balance_spend"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "part_type_brand_diversity",
    tags=("agg", "relational"),
    oracle="""
    WITH b AS (
      SELECT p_type, p_brand, CAST(count(*) AS BIGINT) AS n
      FROM part GROUP BY 1, 2
    )
    SELECT p_type,
           CAST(count(*) AS BIGINT) AS n_brands,
           CAST(sum(n) AS BIGINT) AS n_parts,
           round(CAST(sum(n * n) AS DOUBLE)
                 / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)),
                 6) AS brand_hhi
    FROM b GROUP BY 1 ORDER BY 1
    """,
)
def part_type_brand_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand diversity within each part type: brand count plus the
    Herfindahl index of brand shares (1/HHI is the effective number of
    competing brands) -- the assortment-concentration twin of
    ``supplier_concentration_hhi`` at catalog grain. All moments are exact
    integers; only the final ratio is a double.

    Scale: two stacked partial aggs (|type x brand| then |type|); the
    second reuses the first's hash partitioning on the leading key."""
    p = load_table(spark, sf_dir, "part")
    b = p.groupBy("p_type", "p_brand").agg(F.count("*").cast("bigint").alias("n"))
    s = F.sum("n").cast("bigint")
    return (
        b.groupBy("p_type")
        .agg(
            F.count("*").cast("bigint").alias("n_brands"),
            s.alias("n_parts"),
            F.round(
                F.sum(F.col("n") * F.col("n")).cast("double")
                / (s.cast("double") * s.cast("double")),
                6,
            ).alias("brand_hhi"),
        )
        .orderBy("p_type")
    )


@register(
    "orders_cohort_repeat_rate",
    tags=("agg", "window", "relational"),
    oracle="""
    WITH f AS (
      SELECT o_custkey, min(o_orderdate) AS first_dt,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT o.o_custkey, min(o.o_orderdate) AS second_dt
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey
                         AND o.o_orderdate > f.first_dt
      GROUP BY 1
    )
    SELECT CAST(year(f.first_dt) AS INT) AS cohort_year,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN s.second_dt IS NOT NULL
                              AND date_diff('day', f.first_dt, s.second_dt) <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_90d,
           round(CAST(sum(CASE WHEN s.second_dt IS NOT NULL
                                    AND date_diff('day', f.first_dt, s.second_dt) <= 90
                               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS repeat_rate_90d,
           round(CAST(sum(f.n_orders) AS DOUBLE) / count(*), 4) AS avg_orders
    FROM f LEFT JOIN s ON f.o_custkey = s.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def orders_cohort_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort repeat rate: customers grouped by first-order
    year; the share that placed a SECOND order within 90 days of the first
    (strictly-later date, so same-day double orders don't count as repeat)
    plus lifetime orders per customer -- the retention table the warehouse
    twin of events ``retention_cohorts``. Day gaps are exact integers.

    Scale: the oracle's two dependent self-joins collapse into ONE
    customer-keyed aggregation engine-side: a sorted order-date array per
    customer (bounded by orders/customer), first = element 1, second =
    first strictly-greater element -- the fact table shuffles once."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderdate")).alias("dts"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    # try_element_at: the filtered array is empty for one-order customers,
    # and plain element_at throws under ANSI mode (the driver's vanilla
    # session) instead of returning NULL.
    first = F.try_element_at(F.col("dts"), F.lit(1))
    second = F.try_element_at(F.filter(F.col("dts"), lambda d: d > first), F.lit(1))
    repeat = F.when(
        second.isNotNull() & (F.datediff(second, first) <= 90), 1
    ).otherwise(0)
    per_cust = per_cust.select(
        F.year(first).cast("int").alias("cohort_year"),
        "n_orders",
        repeat.alias("is_repeat"),
    )
    rep = F.sum("is_repeat")
    return (
        per_cust.groupBy("cohort_year")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            rep.cast("bigint").alias("n_repeat_90d"),
            F.round(rep.cast("double") / F.count("*"), 6).alias("repeat_rate_90d"),
            F.round(F.sum("n_orders").cast("double") / F.count("*"), 4).alias(
                "avg_orders"
            ),
        )
        .orderBy("cohort_year")
    )


@register(
    "brand_discount_elasticity",
    tags=("agg", "join", "relational"),
    oracle="""
    WITH q AS (
      SELECT p.p_brand,
             CAST(round(l.l_discount * 100) AS BIGINT) AS x,
             CAST(round(l.l_quantity * 100) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
      SELECT p_brand,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sx2
      FROM q GROUP BY 1
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_lines,
           round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6)
             AS qty_per_discount_pt,
           round((sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx)
                 / n / 100, 4) AS base_qty
    FROM m ORDER BY 1
    """,
)
def brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response curve per brand: OLS slope of quantity on discount
    level (in discount percentage points x quantity hundredths, both exact
    integers) plus the zero-discount intercept -- does discounting actually
    move volume for this brand? The closed-form slope runs on exact
    integral moments (DECIMAL(38,0) / HUGEINT), so it is bit-identical
    across engines; cites ``customer_balance_vs_spend`` for the moment
    idiom and ``discount_quantity_effect`` for the distribution view.

    Scale: part dim broadcasts onto the fact scan; ONE |brands|-state
    moment agg; nothing else shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    m = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(dec("x")).cast("double").alias("sx"),
            F.sum(dec("y")).cast("double").alias("sy"),
            F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
            F.sum(dec("x") * F.col("x")).cast("double").alias("sx2"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sx2") - sx * sx)
    return (
        m.select(
            "p_brand",
            n.cast("bigint").alias("n_lines"),
            F.round(slope, 6).alias("qty_per_discount_pt"),
            F.round((sy - slope * sx) / n / 100, 4).alias("base_qty"),
        )
        .orderBy("p_brand")
    )


@register(
    "orders_rolling_13wk_revenue",
    tags=("agg", "window", "timeseries", "relational"),
    oracle="""
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS week,
             CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1
    )
    SELECT week,
           round(CAST(rev AS DOUBLE), 2) AS week_revenue,
           round(CAST(sum(rev) OVER (ORDER BY week
                                     ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
                      AS DOUBLE), 2) AS rolling_13wk_revenue,
           CAST(count(*) OVER (ORDER BY week
                               ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
                AS INT) AS weeks_in_window
    FROM wk ORDER BY week
    """,
)
def orders_rolling_13wk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 13-week (fiscal-quarter) revenue: the retail smoothing
    standard that de-noises holiday weeks while staying current --
    reported beside the raw weekly number and the window's actual week
    count so partial leading windows are visible. Revenue stays DECIMAL
    through the rolling sum (exact, order-free); only display values are
    doubles.

    Scale: the fact scan collapses to |weeks| rows in ONE partial agg;
    the rolling frame runs on that tiny ordered rollup."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("week")).agg(
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    w = Window.orderBy("week").rowsBetween(-12, 0)
    return (
        wk.select(
            "week",
            F.round(F.col("rev").cast("double"), 2).alias("week_revenue"),
            F.round(F.sum("rev").over(w).cast("double"), 2).alias(
                "rolling_13wk_revenue"
            ),
            F.count("*").over(w).cast("int").alias("weeks_in_window"),
        )
        .orderBy("week")
    )


@register(
    "orders_price_volume_mix",
    tags=("agg", "relational"),
    oracle="""
    WITH yr AS (
      SELECT o_orderpriority,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(count(*) AS BIGINT) AS q,
             CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS r
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        AND o_orderdate <  TIMESTAMP '2001-01-01'
      GROUP BY 1, 2
    ),
    w AS (
      SELECT o_orderpriority,
             max(CASE WHEN yr = 1999 THEN q END) AS q0,
             max(CASE WHEN yr = 1999 THEN r END) AS r0,
             max(CASE WHEN yr = 2000 THEN q END) AS q1,
             max(CASE WHEN yr = 2000 THEN r END) AS r1
      FROM yr GROUP BY 1
    )
    SELECT o_orderpriority,
           round(r0, 2) AS revenue_1999,
           round(r1, 2) AS revenue_2000,
           round(r1 - r0, 2) AS delta,
           round((q1 - q0) * (r0 / q0), 2) AS volume_effect,
           round((r1 / q1 - r0 / q0) * q1, 2) AS price_effect
    FROM w WHERE q0 IS NOT NULL AND q1 IS NOT NULL
    ORDER BY o_orderpriority
    """,
)
def orders_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of the year-over-year revenue change per
    order priority (1999 -> 2000): volume effect = order-count change at
    old average value, price effect = average-value change at new volume
    -- the two terms reconcile to the delta EXACTLY by construction
    ((q1-q0)p0 + (p1-p0)q1 = q1p1 - q0p0), which is why FP&A uses this
    split. Yearly sums are exact DECIMAL; the effects are closed-form
    doubles on those exact sums.

    Scale: the year filter pushes to the scan; ONE |priorities x 2|-state
    partial agg; everything after is a 5-row pivot."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    yr = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.count("*").cast("bigint").alias("q"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("r"),
    )
    w = yr.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("yr") == 1999, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == 1999, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("yr") == 2000, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == 2000, F.col("r"))).alias("r1"),
    )
    q0, r0, q1, r1 = (F.col(c) for c in ("q0", "r0", "q1", "r1"))
    return (
        w.filter(q0.isNotNull() & q1.isNotNull())
        .select(
            "o_orderpriority",
            F.round(r0, 2).alias("revenue_1999"),
            F.round(r1, 2).alias("revenue_2000"),
            F.round(r1 - r0, 2).alias("delta"),
            F.round((q1 - q0) * (r0 / q0), 2).alias("volume_effect"),
            F.round((r1 / q1 - r0 / q0) * q1, 2).alias("price_effect"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Round-7 additions (X77): returns trend + operational skew.
# ---------------------------------------------------------------------------


@register(
    "lineitem_returns_by_month",
    tags=("relational", "agg"),
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returned_revenue,
           round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN {_REV}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE), 6) AS return_rate
    FROM lineitem
    GROUP BY 1
    """,
)
def lineitem_returns_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate trend: monthly revenue, returned ('R' flag) revenue,
    and the returned share -- the merchandising panel that catches a bad
    product batch as a rising line. Revenue is exact DECIMAL on both
    engines; the rate divides the two exact sums once at the end.

    Scale: single fact scan, |months| partial-agg states, month projects
    map-side from the scan column."""
    li = load_table(spark, sf_dir, "lineitem")
    ret = F.when(F.col("l_returnflag") == "R", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(_rev()).cast("double").alias("revenue"),
            F.sum(ret).cast("double").alias("returned_revenue"),
            F.round(
                F.sum(ret).cast("double") / F.sum(_rev()).cast("double"), 6
            ).alias("return_rate"),
        )
    )


@register(
    "orders_customer_concentration",
    tags=("relational", "agg"),
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(n) AS BIGINT) AS total_orders,
             CAST(max(n) AS BIGINT) AS max_orders,
             CAST(sum(n * n) AS BIGINT) AS sum_sq
      FROM per_cust
    )
    SELECT t.n_customers, t.total_orders, t.max_orders,
           (SELECT CAST(min(o_custkey) AS BIGINT) FROM per_cust
            WHERE n = t.max_orders) AS top_custkey,
           round(CAST(t.max_orders AS DOUBLE) / t.total_orders, 6) AS max_share,
           round(CAST(t.sum_sq AS DOUBLE)
                 / (CAST(t.total_orders AS DOUBLE) * t.total_orders), 6) AS hhi
    FROM tot t
    """,
)
def orders_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand-concentration panel: how unevenly orders spread over
    customers -- the biggest account's share and the Herfindahl index of
    order volume, both from EXACT integers (hhi = sum(n_i^2)/total^2, no
    float accumulation at all), so the reduction order cannot flap the
    hash. High concentration = revenue keyed to few accounts (churn
    risk); it is also the skew signal for partitioning on o_custkey.

    Scale: orders reduce to |customers| counts in one partial agg; the
    skew fold is a 1-row aggregate over that."""
    o = load_table(spark, sf_dir, "orders")
    # |customers|-row reduction consumed by THREE branches (tot, top, and
    # the final projection): lazy-materialize once instead of re-scanning
    # orders per branch
    per_cust = (
        o.groupBy("o_custkey")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = per_cust.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("n").cast("bigint").alias("total_orders"),
        F.max("n").cast("bigint").alias("max_orders"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
    )
    top = (
        per_cust.join(
            F.broadcast(tot.select(F.col("max_orders").alias("mo"))),
            F.col("n") == F.col("mo"),
        )
        .agg(F.min("o_custkey").cast("bigint").alias("top_custkey"))
    )
    return (
        tot.crossJoin(F.broadcast(top))
        .select(
            "n_customers",
            "total_orders",
            "max_orders",
            "top_custkey",
            F.round(
                F.col("max_orders").cast("double") / F.col("total_orders"), 6
            ).alias("max_share"),
            F.round(
                F.col("sum_sq").cast("double")
                / (F.col("total_orders").cast("double") * F.col("total_orders")),
                6,
            ).alias("hhi"),
        )
    )


@register(
    "part_price_index_laspeyres",
    tags=("relational", "timeseries", "agg"),
    oracle="""
    WITH monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
             CAST(sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS sc,
             CAST(sum(try_cast(try_cast(l_quantity AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS qc
      FROM lineitem
      GROUP BY l_partkey, date_trunc('month', l_shipdate)
      HAVING sum(try_cast(try_cast(l_quantity AS DECIMAL(18,2))
                          * 100 AS BIGINT)) > 0
         AND sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                          * 100 AS BIGINT)) >= 0
    ),
    base AS (
      SELECT l_partkey, sc AS sc0, qc AS qc0 FROM monthly
      WHERE month = (SELECT min(month) FROM monthly)
    )
    SELECT m.month,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST((2 * m.sc * 1000000 + m.qc) // (2 * m.qc)
                          AS DECIMAL(38,0)) * b.qc0) AS DOUBLE)
             / CAST(sum(CAST((2 * b.sc0 * 1000000 + b.qc0) // (2 * b.qc0)
                             AS DECIMAL(38,0)) * b.qc0) AS DOUBLE)
             AS laspeyres_index
    FROM monthly m JOIN base b ON m.l_partkey = b.l_partkey
    GROUP BY m.month
    """,
)
def part_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index by ship month: sum(p_t x q_0) / sum(p_0 x
    q_0) over the parts traded in both the base month (the first month
    in the data) and month t, with p = the month's observed unit price
    (extended-price cents over quantity cents) and q_0 the base-month
    quantity weights -- the fixed-basket inflation measure an assortment
    or procurement team tracks (base-quantity weights isolate PRICE
    movement from mix shift, which a raw average price cannot).

    Exactness (hard-won): per-(part, month) price and quantity totals
    are exact integer cents; the micro-unit price is rounded half-up IN
    INTEGER ARITHMETIC -- (2*sc*10^6 + qc) div (2*qc) -- because
    round(double, 6) on a quotient of small integers lands on decimal
    ties constantly and Spark (shortest-repr HALF_UP) and DuckDB (binary
    round-half-even) disagree on ties (observed on 82 of 83 months
    through the double path); basket sums then accumulate
    DECIMAL(38,0)-exactly and the final quotient ships unrounded -- both
    engines divide the identical pair of doubles, so the bit pattern
    matches.
    Zero-quantity part-months are excluded by the HAVING on both engines
    (no unit price exists).

    Scale: lineitem reduces to |parts| x |months| partial states
    map-side; the base month is a |parts|-sized broadcast; the index is
    a |months| rollup. Nothing downstream of the first agg sees fact
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    # cents via the DECIMAL cast (NOT round()*100 -> bigint: Spark's
    # double->bigint cast truncates while DuckDB's rounds, +-1 cent apart
    # on ~7% of part-months through that path)
    sc = F.expr("try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)")
    qc = F.expr("try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)")
    monthly = (
        li.groupBy(
            "l_partkey", F.date_trunc("month", "l_shipdate").alias("month")
        )
        .agg(
            F.sum(sc).cast("bigint").alias("sc"),
            F.sum(qc).cast("bigint").alias("qc"),
        )
        # qc > 0: no unit price without quantity. sc >= 0: a negative
        # monthly price sum (credit/correction months in the hostile-price
        # sweep) has no meaningful unit price either -- and the half-up
        # integer identity below diverges cross-engine for negative sc
        # (Spark `div` truncates toward zero, DuckDB `//` floors), so both
        # engines exclude such part-months symmetrically.
        .filter((F.col("qc") > 0) & (F.col("sc") >= 0))
        .localCheckpoint(eager=False)  # feeds the base lookup and the index
    )
    base_month = monthly.agg(F.min("month").alias("m0"))
    base = (
        monthly.crossJoin(F.broadcast(base_month))
        .filter(F.col("month") == F.col("m0"))
        .select(
            F.col("l_partkey").alias("bk"),
            F.col("sc").alias("sc0"),
            F.col("qc").alias("qc0"),
        )
    )
    j = monthly.join(F.broadcast(base), F.col("l_partkey") == F.col("bk"))
    unit_t = F.expr("CAST((2 * sc * 1000000 + qc) div (2 * qc) AS decimal(38,0))")
    unit_0 = F.expr(
        "CAST((2 * sc0 * 1000000 + qc0) div (2 * qc0) AS decimal(38,0))"
    )
    num = F.sum(unit_t * F.col("qc0")).cast("double")
    den = F.sum(unit_0 * F.col("qc0")).cast("double")
    return j.groupBy("month").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        (num / den).alias("laspeyres_index"),
    )


@register(
    "part_abc_xyz_matrix",
    tags=("relational", "analytics"),
    oracle="""
    WITH base AS (
      SELECT l_partkey,
             try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS BIGINT) AS p,
             try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS BIGINT) AS q,
             date_trunc('month', l_shipdate) AS mon
      FROM lineitem
      WHERE try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS BIGINT) IS NOT NULL
        AND try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS BIGINT) IS NOT NULL
    ), monthly AS (
      SELECT l_partkey, mon, CAST(sum(q) AS DECIMAL(38,0)) AS mq FROM base GROUP BY 1, 2
    ), per_part AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(mq) AS DECIMAL(38,0)) AS sq,
             CAST(sum(mq * mq) AS DECIMAL(38,0)) AS qq
      FROM monthly GROUP BY 1
    ), rev AS (
      SELECT l_partkey, CAST(sum(p) AS DECIMAL(38,0)) AS r FROM base GROUP BY 1
    ), stats AS (
      SELECT p.l_partkey, r, n_months, sq, qq,
             round(sqrt(greatest((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n_months)
                                 / nullif(n_months - 1.0, 0.0), 0.0))
                   / nullif(CAST(sq AS DOUBLE) / n_months, 0.0), 6) AS cv
      FROM per_part p JOIN rev USING (l_partkey)
    ), cls AS (
      SELECT l_partkey, r, cv,
             sum(r) OVER (ORDER BY r DESC, l_partkey) / CAST(sum(r) OVER () AS DOUBLE) AS cum_share
      FROM stats
    ), labeled AS (
      SELECT l_partkey, r,
             CASE WHEN cum_share <= 0.8 THEN 'A' WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN cv IS NULL THEN 'Z' WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz
      FROM cls
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(r) AS DOUBLE) / (SELECT CAST(sum(r) AS DOUBLE) FROM labeled), 6) AS revenue_share
    FROM labeled GROUP BY 1, 2
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC x XYZ inventory classification matrix -- the supply-chain
    segmentation every planning tool ships: ABC ranks parts by cumulative
    revenue share (A <= 80%, B <= 95%, C rest, ordered revenue-desc with
    partkey tiebreak) and XYZ bands demand predictability by the
    coefficient of variation of MONTHLY quantities (X <= 0.5 steady,
    Y <= 1.0, Z erratic or single-month). The 3x3 cell counts + revenue
    shares tell you where cycle counting and safety stock go; orders_
    abc_pareto is the 1-D revenue view, this adds the variability axis.

    Exactness: revenue and monthly-quantity moments are exact
    DECIMAL(38,0) cents/centi-units; CV is one shared closed form
    (variance clamped at 0 against FP negatives, NULL-safe on
    single-month parts which land in Z by definition).

    Scale: two partial aggs reduce the fact table to |parts| and
    (part, month) states; the cumulative-share window runs over the
    PART DOMAIN (dim-scale, range-partitionable prefix sum), never the
    fact rows; the final matrix is a 9-state agg + broadcast total."""
    li = load_table(spark, sf_dir, "lineitem")
    pc = "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    qc = "try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)"
    base = li.select(
        "l_partkey",
        F.expr(pc).alias("p"),
        F.expr(qc).alias("q"),
        F.date_trunc("month", "l_shipdate").alias("mon"),
    ).filter(F.col("p").isNotNull() & F.col("q").isNotNull())
    monthly = base.groupBy("l_partkey", "mon").agg(
        F.sum(F.col("q").cast("decimal(38,0)")).alias("mq")
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum("mq").cast("decimal(38,0)").alias("sq"),
        F.sum(F.col("mq") * F.col("mq")).cast("decimal(38,0)").alias("qq"),
    )
    rev = base.groupBy("l_partkey").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("r")
    )
    stats = per_part.join(rev, "l_partkey")
    nm = F.col("n_months").cast("double")
    mean = F.col("sq").cast("double") / nm
    var = (
        F.col("qq").cast("double")
        - F.col("sq").cast("double") * F.col("sq").cast("double") / nm
    ) / F.nullif(nm - 1, F.lit(0.0))
    cv = F.round(
        F.sqrt(F.greatest(var, F.lit(0.0))) / F.nullif(mean, F.lit(0.0)), 6
    )
    w = Window.orderBy(F.col("r").desc(), F.col("l_partkey"))
    cls = stats.select(
        "l_partkey",
        "r",
        cv.alias("cv"),
        (
            F.sum("r").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
            / F.sum("r").over(Window.partitionBy()).cast("double")
        ).alias("cum_share"),
    )
    abc = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    xyz = (
        F.when(F.col("cv").isNull(), "Z")
        .when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
    )
    labeled = cls.select("l_partkey", "r", abc.alias("abc"), xyz.alias("xyz"))
    tot_r = labeled.agg(F.sum("r").cast("double").alias("tr"))
    return (
        labeled.groupBy("abc", "xyz")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("r").alias("rev"),
        )
        .crossJoin(F.broadcast(tot_r))
        .select(
            "abc",
            "xyz",
            "n_parts",
            F.round(F.col("rev").cast("double") / F.col("tr"), 6).alias(
                "revenue_share"
            ),
        )
    )


@register(
    "part_price_index_paasche_fisher",
    tags=("relational", "timeseries", "agg"),
    oracle="""
    WITH monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
             CAST(sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS sc,
             CAST(sum(try_cast(try_cast(l_quantity AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS qc
      FROM lineitem
      GROUP BY l_partkey, date_trunc('month', l_shipdate)
      HAVING sum(try_cast(try_cast(l_quantity AS DECIMAL(18,2))
                          * 100 AS BIGINT)) > 0
         AND sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                          * 100 AS BIGINT)) >= 0
    ),
    base AS (
      SELECT l_partkey, sc AS sc0, qc AS qc0 FROM monthly
      WHERE month = (SELECT min(month) FROM monthly)
    ),
    j AS (
      SELECT m.month,
             CAST((2 * m.sc * 1000000 + m.qc) // (2 * m.qc) AS DECIMAL(38,0)) AS pt,
             CAST((2 * b.sc0 * 1000000 + b.qc0) // (2 * b.qc0) AS DECIMAL(38,0)) AS p0,
             m.qc AS qt, b.qc0 AS q0
      FROM monthly m JOIN base b ON m.l_partkey = b.l_partkey
    )
    SELECT month, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(pt * q0) AS DOUBLE) / CAST(sum(p0 * q0) AS DOUBLE)
             AS laspeyres_index,
           CAST(sum(pt * qt) AS DOUBLE) / CAST(sum(p0 * qt) AS DOUBLE)
             AS paasche_index,
           sqrt((CAST(sum(pt * q0) AS DOUBLE) / CAST(sum(p0 * q0) AS DOUBLE))
                * (CAST(sum(pt * qt) AS DOUBLE) / CAST(sum(p0 * qt) AS DOUBLE)))
             AS fisher_index
    FROM j GROUP BY month
    """,
)
def part_price_index_paasche_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paasche (current-quantity weights) and Fisher (geometric mean of
    Laspeyres and Paasche) price indices by ship month -- the other two
    classical index formulas beside part_price_index_laspeyres. Laspeyres
    overstates inflation when buyers substitute away from price risers,
    Paasche understates it; Fisher is the "ideal" compromise the pair
    brackets. All three ship here so the substitution-bias GAP is a
    queryable column pair.

    Exactness: identical machinery to the Laspeyres op -- integer-cents
    part-month totals, the half-up INTEGER micro-unit-price identity
    (2*sc*10^6 + qc) div (2*qc) (the double path disagrees on decimal
    ties across engines), DECIMAL(38,0) basket sums, and final quotients
    as unrounded doubles (sqrt is IEEE-correctly-rounded, so Fisher
    matches bit-for-bit too).

    Scale: same as Laspeyres -- |parts| x |months| partial agg, a
    |parts| broadcast base, a |months| rollup; no fact rows past the
    first agg."""
    li = load_table(spark, sf_dir, "lineitem")
    sc = F.expr("try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)")
    qc = F.expr("try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)")
    monthly = (
        li.groupBy(
            "l_partkey", F.date_trunc("month", "l_shipdate").alias("month")
        )
        .agg(
            F.sum(sc).cast("bigint").alias("sc"),
            F.sum(qc).cast("bigint").alias("qc"),
        )
        # same symmetric domain gates as the Laspeyres op (no unit price
        # without quantity; negative sums diverge on integer div semantics)
        .filter((F.col("qc") > 0) & (F.col("sc") >= 0))
        .localCheckpoint(eager=False)  # feeds the base lookup and the index
    )
    base_month = monthly.agg(F.min("month").alias("m0"))
    base = (
        monthly.crossJoin(F.broadcast(base_month))
        .filter(F.col("month") == F.col("m0"))
        .select(
            F.col("l_partkey").alias("bk"),
            F.col("sc").alias("sc0"),
            F.col("qc").alias("qc0"),
        )
    )
    j = monthly.join(F.broadcast(base), F.col("l_partkey") == F.col("bk")).select(
        "month",
        F.expr("CAST((2 * sc * 1000000 + qc) div (2 * qc) AS decimal(38,0))").alias("pt"),
        F.expr("CAST((2 * sc0 * 1000000 + qc0) div (2 * qc0) AS decimal(38,0))").alias("p0"),
        F.col("qc").alias("qt"),
        F.col("qc0").alias("q0"),
    )
    lasp = F.sum(F.col("pt") * F.col("q0")).cast("double") / F.sum(
        F.col("p0") * F.col("q0")
    ).cast("double")
    paas = F.sum(F.col("pt") * F.col("qt")).cast("double") / F.sum(
        F.col("p0") * F.col("qt")
    ).cast("double")
    return j.groupBy("month").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        lasp.alias("laspeyres_index"),
        paas.alias("paasche_index"),
        F.sqrt(lasp * paas).alias("fisher_index"),
    )


@register(
    "part_revenue_gini_lorenz",
    tags=("relational", "stats", "window"),
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem
      GROUP BY 1
      HAVING sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                          * 100 AS BIGINT)) >= 0
    ),
    r AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, l_partkey) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM rev
    )
    SELECT n AS n_parts,
           round((2 * CAST(sum(CAST(rn AS DECIMAL(38,0)) * cents) AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1) * CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE)
                          * CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE), 0),
                 6) AS gini,
           round(CAST(sum(CASE WHEN rn > n - n // 10 THEN CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
                 / nullif(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE), 0), 6)
             AS top_decile_share,
           round(CAST(sum(CASE WHEN rn <= n // 2 THEN CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
                 / nullif(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE), 0), 6)
             AS bottom_half_share
    FROM r GROUP BY n
    """,
)
def part_revenue_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across parts: exact Gini coefficient plus
    two Lorenz-curve landmarks (top-decile share, bottom-half share) --
    the assortment-inequality summary (is revenue a long tail or a
    hit-driven head?) that events_gini_concentration answers for users
    and this answers for the catalog.

    Uses the exact rank formulation G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) over cent-scaled BIGINT totals with (cents, partkey) as
    the total order; every term is exact integer arithmetic
    (DECIMAL(38,0) rank-weighted sums) until the final division.

    Scale: the per-part reduction is the only fact-sized shuffle; the
    global rank comes from ranks.exact_global_row_number -- range-
    repartitioned per-range row_number plus broadcast offsets -- so
    unlike a window-rank Gini there is NO single-task sort of the
    |parts| relation at any width (the rank stage is the same
    multi-task shape test_round14_ops pins for the ntile family)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
        .filter(F.col("cents") >= 0)
    )
    r = exact_global_row_number(
        rev, [F.col("cents"), F.col("l_partkey")], "rn"
    )
    tot = F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
    num = 2 * F.sum(F.col("rn").cast("decimal(38,0)") * F.col("cents")).cast("double")
    out = r.groupBy("_N").agg(
        F.round(
            (num - (F.col("_N").cast("double") + 1) * tot)
            / F.nullif(F.col("_N").cast("double") * tot, F.lit(0.0)),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("rn") > F.col("_N") - F.expr("_N DIV 10"),
                    F.col("cents").cast("decimal(38,0)"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.nullif(tot, F.lit(0.0)),
            6,
        ).alias("top_decile_share"),
        F.round(
            F.sum(
                F.when(
                    F.col("rn") <= F.expr("_N DIV 2"),
                    F.col("cents").cast("decimal(38,0)"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.nullif(tot, F.lit(0.0)),
            6,
        ).alias("bottom_half_share"),
    )
    return out.select(
        F.col("_N").alias("n_parts"), "gini", "top_decile_share", "bottom_half_share"
    )


@register(
    "part_single_source_risk",
    tags=("relational", "join", "agg"),
    oracle="""
    WITH pp AS (
      SELECT l_partkey AS pk,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(sum(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    g AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM pp)
    SELECT CAST(least(n_suppliers, 4) AS INT) AS supplier_band,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS spend_cents,
           round(CAST(sum(cents) AS DOUBLE) / tot, 6) AS spend_share
    FROM pp CROSS JOIN g
    GROUP BY 1, tot
    """,
)
def part_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-concentration risk: parts banded by OBSERVED supplier
    count in the order history (1 = effectively single-sourced, capped at
    4+) with the revenue exposed in each band -- the procurement-risk
    table (a supply shock removes every single-sourced part; the spend
    share in band 1 is the revenue at risk). The supplier-side complement
    of supplier_concentration_hhi (which measures revenue concentration
    ACROSS suppliers; this measures redundancy PER PART).

    Exactness: supplier counts are exact distincts at part grain; spend
    is exact integer cents; one share division at 6 dp.

    Scale: ONE fact pass reduces lineitem at part grain (distinct-count
    + spend in the same partial agg); the band rollup and grand total
    run on the |parts| relation."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    pp = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("n_suppliers"),
        F.sum(cents).cast("bigint").alias("cents"),
    )
    g = pp.agg(F.sum("cents").cast("bigint").alias("tot"))
    return (
        pp.crossJoin(F.broadcast(g))
        .groupBy(
            F.least(F.col("n_suppliers"), F.lit(4)).cast("int").alias("supplier_band"),
            "tot",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("spend_cents"),
        )
        .select(
            "supplier_band", "n_parts", "spend_cents",
            F.round(F.col("spend_cents").cast("double") / F.col("tot"), 6).alias(
                "spend_share"
            ),
        )
    )


@register(
    "supplier_revenue_hhi_by_nation",
    tags=("relational", "agg", "analytics"),
    oracle=f"""
    WITH sup AS (
      SELECT n_name AS nation, s_suppkey,
             CAST(sum({_REV}) AS DECIMAL(38,4)) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(rev) AS DECIMAL(38,4)) AS total,
             CAST(max(rev) AS DECIMAL(38,4)) AS top_rev
      FROM sup GROUP BY 1
    )
    SELECT t.nation, t.n_suppliers,
           round(CAST(t.total AS DOUBLE) / 100, 2) AS total_revenue,
           round(CAST(t.top_rev AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
             AS top_supplier_share,
           round(sum((CAST(s.rev AS DOUBLE) / CAST(t.total AS DOUBLE))
                     * (CAST(s.rev AS DOUBLE) / CAST(t.total AS DOUBLE)))
                 * 10000, 6) AS hhi
    FROM sup s JOIN tot t ON s.nation = t.nation
    WHERE CAST(t.total AS DOUBLE) > 0
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
    """,
)
def supplier_revenue_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within each
    nation: HHI = 10000 * sum of squared revenue shares (the antitrust
    scale where 10000 = monopoly, <1500 ~ unconcentrated), with supplier
    count and the top supplier's share -- the market-structure companion
    to part_revenue_gini_lorenz (Gini measures inequality of the curve;
    HHI weights the HEAD, which is what supply-risk reviews read) and the
    nation-grain rollup of part_single_source_risk.

    Exactness: per-supplier revenue accumulates as exact DECIMAL; shares
    are IEEE divisions of exact operands (identical both engines); the
    share-square sum runs over the |suppliers|-grain relation and is
    rounded 6 dp once.

    Scale: one fact-table shuffle to (nation, supplier) grain with
    broadcast dims; the HHI re-agg is |suppliers| rows to |nations|
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sup = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(F.sum(_rev()).cast("decimal(38,4)").alias("rev"))
        .localCheckpoint(eager=False)
    )
    tot = sup.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("rev").cast("decimal(38,4)").alias("total"),
        F.max("rev").cast("decimal(38,4)").alias("top_rev"),
    )
    share = F.col("rev").cast("double") / F.col("total").cast("double")
    return (
        sup.join(F.broadcast(tot), "nation")
        .filter(F.col("total").cast("double") > 0)
        .groupBy(
            "nation",
            "n_suppliers",
            F.round(F.col("total").cast("double") / 100, 2).alias("total_revenue"),
            F.round(
                F.col("top_rev").cast("double") / F.col("total").cast("double"), 6
            ).alias("top_supplier_share"),
        )
        .agg(F.round(F.sum(share * share) * 10000, 6).alias("hhi"))
        .orderBy("nation")
    )


@register(
    "orders_backlog_aging_buckets",
    tags=("relational", "agg"),
    oracle=f"""
    WITH anchor AS (SELECT max(o_orderdate) AS today FROM orders),
    open_o AS (
      SELECT datediff('day', o_orderdate, today) AS age_days,
             CAST({_TOTAL_C} AS DECIMAL(38,0)) AS cents
      FROM orders, anchor
      WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS open_value,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM open_o
    GROUP BY 1 ORDER BY min(age_days)
    """,
)
def orders_backlog_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging analysis of the OPEN order backlog as of the dataset anchor
    (max order date): orders still in status 'O' bucketed by how long
    they have been open (0-30 / 31-90 / 91-365 / 365+ days) with count
    and tied-up value per bucket -- the receivables-style aging report
    that complements orders_open_backlog_daily: the daily series shows
    backlog LEVEL over time, this shows its AGE COMPOSITION now, which is
    what an ops review escalates on.

    Exactness: ages are exact integer day diffs against a 1-row anchor;
    value accumulates as exact DECIMAL cents (try_cast-total under
    hostile prices); bucket order is pinned by min age, not label sort.

    Scale: anchor is a 1-row broadcast; one filtered pass over orders to
    4 bucket rows -- map-side combinable, no window, no join wider than
    the broadcast."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("today"))
    cents = F.expr(_TOTAL_C).cast("decimal(38,0)")
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff(F.col("today"), F.col("o_orderdate")).alias("age_days"),
            cents.alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        open_o.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("open_value"),
            F.min("age_days").cast("bigint").alias("min_age_days"),
            F.max("age_days").cast("bigint").alias("max_age_days"),
        )
        .orderBy("min_age_days")
    )


@register(
    "orders_priority_mix_shift",
    tags=("relational", "agg", "analytics"),
    oracle=f"""
    WITH yr AS (
      SELECT CAST(min(year(o_orderdate)) AS INT) AS y0,
             CAST(max(year(o_orderdate)) AS INT) AS y1
      FROM orders
    ),
    m AS (
      SELECT o_orderpriority AS pri,
             CAST(sum(CASE WHEN year(o_orderdate) = y0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN year(o_orderdate) = y1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN year(o_orderdate) = y1
                           THEN CAST({_TOTAL_C} AS DECIMAL(38,0)) ELSE 0 END)
               AS DECIMAL(38,0)) AS r1
      FROM orders, yr
      GROUP BY 1
    ),
    t AS (
      SELECT pri, n0, n1, r1,
             CAST(sum(n0) OVER () AS BIGINT) AS t0,
             CAST(sum(n1) OVER () AS BIGINT) AS t1
      FROM m
    )
    SELECT pri AS priority, n0 AS n_first_year, n1 AS n_last_year,
           round(CAST(n0 AS DOUBLE) / t0, 6) AS share_first,
           round(CAST(n1 AS DOUBLE) / t1, 6) AS share_last,
           round(CAST(n1 AS DOUBLE) / t1 - CAST(n0 AS DOUBLE) / t0, 6)
             AS share_shift,
           round((CAST(n1 AS DOUBLE) / t1 - CAST(n0 AS DOUBLE) / t0)
                 * (CAST(r1 AS DOUBLE) / 100), 2) AS revenue_at_shift
    FROM t
    ORDER BY pri
    """,
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix shift between the first and last order year in
    the data: per priority class, its share of orders in each endpoint
    year, the share shift in points, and the last-year order value
    rescaled by that shift (the 'revenue riding the mix change' figure a
    capacity-planning review reads next to orders_price_volume_mix, which
    decomposes PRICE x VOLUME; this decomposes the URGENCY mix -- a
    creeping 1-URGENT share is an SLA cost signal).

    Exactness: endpoint years come from one 1-row min/max anchor; per
    (priority, endpoint) counts and DECIMAL cent sums accumulate in ONE
    conditional pass over orders (no per-year scans); shares are single
    divisions of exact integers; year totals are window sums over the
    |priorities|-grain relation.

    Scale: 1-row broadcast anchor + one map-side-combinable pass to
    |priorities| rows."""
    o = load_table(spark, sf_dir, "orders")
    yr = o.agg(
        F.min(F.year("o_orderdate")).cast("int").alias("y0"),
        F.max(F.year("o_orderdate")).cast("int").alias("y1"),
    )
    cents = F.expr(_TOTAL_C).cast("decimal(38,0)")
    y = F.year("o_orderdate")
    m = (
        o.crossJoin(F.broadcast(yr))
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.sum(F.when(y == F.col("y0"), 1).otherwise(0)).cast("bigint").alias("n0"),
            F.sum(F.when(y == F.col("y1"), 1).otherwise(0)).cast("bigint").alias("n1"),
            F.sum(F.when(y == F.col("y1"), cents).otherwise(F.lit(0)))
            .cast("decimal(38,0)").alias("r1"),
        )
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = m.withColumn("t0", F.sum("n0").over(wall).cast("bigint")).withColumn(
        "t1", F.sum("n1").over(wall).cast("bigint")
    )
    s0 = F.col("n0").cast("double") / F.col("t0")
    s1 = F.col("n1").cast("double") / F.col("t1")
    return t.select(
        F.col("pri").alias("priority"),
        F.col("n0").alias("n_first_year"),
        F.col("n1").alias("n_last_year"),
        F.round(s0, 6).alias("share_first"),
        F.round(s1, 6).alias("share_last"),
        F.round(s1 - s0, 6).alias("share_shift"),
        F.round((s1 - s0) * (F.col("r1").cast("double") / 100), 2).alias(
            "revenue_at_shift"
        ),
    ).orderBy("priority")


@register(
    "customer_supplier_colocation_share",
    tags=("relational", "join", "agg"),
    oracle=f"""
    SELECT cr.r_name AS customer_region,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(CAST(sum({_REV}) AS DOUBLE) / 100, 2) AS revenue,
           round(CAST(sum(CASE WHEN cn.n_nationkey = sn.n_nationkey
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS same_nation_share,
           round(CAST(sum(CASE WHEN cn.n_regionkey = sn.n_regionkey
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS same_region_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
)
def customer_supplier_colocation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade localization panel by customer region: the share of line
    items (and their revenue base) where the supplier sits in the SAME
    nation, and the same region, as the ordering customer -- the
    generalization of TPC-H Q5's 'local supplier' revenue (already
    registered as tpch_q5_local_supplier for one region/year) to an
    all-region, nation-AND-region-grain localization audit: the number a
    supply-chain or data-residency review reads first.

    Exactness: both share numerators are exact integer conditional
    counts; revenue is an exact DECIMAL sum; shares divide once, rounded
    6 dp.

    Scale: the orders->customer side reduces through the orderkey join
    (the one fact-sized shuffle); supplier/nation/region dims broadcast;
    the output is |regions| rows from one partial agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_regionkey").alias("s_rkey")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
    )
    same_nation = F.when(F.col("c_nkey") == F.col("s_nkey"), 1).otherwise(0)
    same_region = F.when(F.col("c_rkey") == F.col("s_rkey"), 1).otherwise(0)
    return (
        j.groupBy(F.col("r_name").alias("customer_region"))
        .agg(
            F.count("*").cast("bigint").alias("n_lineitems"),
            F.round(F.sum(_rev()).cast("double") / 100, 2).alias("revenue"),
            F.round(F.sum(same_nation).cast("double") / F.count("*"), 6).alias(
                "same_nation_share"
            ),
            F.round(F.sum(same_region).cast("double") / F.count("*"), 6).alias(
                "same_region_share"
            ),
        )
        .orderBy("customer_region")
    )


@register(
    "customer_acquisition_propensity",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH bal AS (
      SELECT c_custkey,
             try_cast(try_cast(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS bal_c
      FROM customer
    ),
    avgpos AS (
      SELECT CAST(sum(CASE WHEN bal_c > 0 THEN CAST(bal_c AS DECIMAL(38,0))
                      ELSE 0 END) AS DOUBLE)
             / nullif(sum(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END), 0) AS ab
      FROM bal
    ),
    anchor AS (
      SELECT CAST(date_trunc('day', max(o_orderdate)) AS TIMESTAMP) AS now_d
      FROM orders
    ),
    last_ord AS (
      SELECT o_custkey,
             CAST(date_trunc('day', max(o_orderdate)) AS TIMESTAMP) AS last_d,
             CAST(sum(CAST(try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS rev_c
      FROM orders
      WHERE try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            IS NOT NULL
      GROUP BY 1
    ),
    seg AS (
      SELECT CASE WHEN bal.bal_c IS NULL THEN 'unknown'
                  WHEN CAST(bal.bal_c AS DOUBLE) > avgpos.ab THEN 'high_balance'
                  ELSE 'low_balance' END AS balance_tier,
             CASE WHEN last_ord.o_custkey IS NULL THEN 'never_ordered'
                  WHEN date_diff('day', last_ord.last_d, anchor.now_d) <= 90
                    THEN 'active_90d'
                  WHEN date_diff('day', last_ord.last_d, anchor.now_d) <= 365
                    THEN 'lapsing_1y'
                  ELSE 'dormant' END AS recency_bucket,
             bal.bal_c, last_ord.rev_c
      FROM bal
      LEFT JOIN last_ord ON bal.c_custkey = last_ord.o_custkey
      CROSS JOIN avgpos CROSS JOIN anchor
    )
    SELECT balance_tier, recency_bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(coalesce(bal_c, 0) AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*) / 100, 6) AS avg_balance,
           round(CAST(sum(CAST(coalesce(rev_c, 0) AS DECIMAL(38,0))) AS DOUBLE)
                 / 100, 6) AS total_past_revenue
    FROM seg
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def customer_acquisition_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition/reactivation propensity grid -- the TPC-H Q22 idea
    (positive-balance customers with no recent orders are the
    acquisition pool, ``tpch_q22_idle_customers``) generalized to the
    full (balance tier) x (recency bucket) matrix: high-balance
    never-ordered = acquisition targets; high-balance dormant =
    reactivation targets; low-balance active = the churn-risk floor.
    Cells carry count, mean balance, and accumulated past revenue --
    the sizing numbers a campaign brief needs.

    Exactness: balances and revenues are exact BIGINT cents; the
    positive-balance mean is one division (the Q22 threshold form);
    recency is exact day arithmetic against the corpus max order date
    (deterministic anchor, the cdc_replication_lag convention);
    try_cast totality on both money columns.

    Scale: one custkey-grain partial agg over orders, one broadcast
    1-row anchor + 1-row threshold, a customer-side left join
    co-partitioned on custkey; output is a <= 12-cell grid."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bal_c = F.expr(
        "try_cast(try_cast(c_acctbal AS decimal(18,2)) * 100 AS bigint)"
    )
    bal = c.select("c_custkey", bal_c.alias("bal_c"))
    avgpos = bal.agg(
        (
            F.sum(
                F.when(F.col("bal_c") > 0, F.col("bal_c").cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).cast("double")
            / F.nullif(
                F.sum(F.when(F.col("bal_c") > 0, 1).otherwise(0)), F.lit(0)
            )
        ).alias("ab")
    )
    anchor = o.agg(
        F.date_trunc("day", F.max("o_orderdate")).cast("timestamp").alias("now_d")
    )
    rev_c = F.expr(_TOTAL_C)
    last_ord = (
        o.filter(rev_c.isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.date_trunc("day", F.max("o_orderdate")).cast("timestamp").alias("last_d"),
            F.sum(rev_c.cast("decimal(38,0)")).cast("bigint").alias("rev_c"),
        )
    )
    days = F.datediff(F.col("now_d"), F.col("last_d"))
    seg = (
        bal.join(last_ord, bal["c_custkey"] == last_ord["o_custkey"], "left")
        .crossJoin(F.broadcast(avgpos))
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(F.col("bal_c").isNull(), "unknown")
            .when(F.col("bal_c").cast("double") > F.col("ab"), "high_balance")
            .otherwise("low_balance")
            .alias("balance_tier"),
            F.when(F.col("o_custkey").isNull(), "never_ordered")
            .when(days <= 90, "active_90d")
            .when(days <= 365, "lapsing_1y")
            .otherwise("dormant")
            .alias("recency_bucket"),
            "bal_c",
            "rev_c",
        )
    )
    return (
        seg.groupBy("balance_tier", "recency_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.coalesce(F.col("bal_c"), F.lit(0)).cast("decimal(38,0)"))
                .cast("double")
                / F.count("*")
                / 100,
                6,
            ).alias("avg_balance"),
            F.round(
                F.sum(F.coalesce(F.col("rev_c"), F.lit(0)).cast("decimal(38,0)"))
                .cast("double")
                / 100,
                6,
            ).alias("total_past_revenue"),
        )
        .orderBy("balance_tier", "recency_bucket")
    )


@register(
    "supplier_ship_latency_profile",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH lat AS (
      SELECT s.s_nationkey,
             date_diff('day',
                       CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP),
                       CAST(date_trunc('day', l.l_shipdate) AS TIMESTAMP))
               AS delay_d
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    ),
    named AS (
      SELECT n.n_name AS supplier_nation, lat.delay_d
      FROM lat JOIN nation n ON lat.s_nationkey = n.n_nationkey
    ),
    agg AS (
      SELECT supplier_nation,
             CAST(count(*) AS BIGINT) AS n_lines,
             round(CAST(sum(delay_d) AS DOUBLE) / count(*), 6) AS avg_delay_days,
             CAST(max(delay_d) AS BIGINT) AS max_delay_days,
             round(CAST(sum(CASE WHEN delay_d > 90 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS pct_over_90d
      FROM named GROUP BY 1
    ),
    rk AS (
      SELECT supplier_nation, delay_d,
             CAST(row_number() OVER (PARTITION BY supplier_nation
                                     ORDER BY delay_d) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY supplier_nation) AS BIGINT) AS n
      FROM named
    ),
    q AS (
      -- exact_interp_pct's shared rational closed form (see stats.py):
      -- built-in quantile_cont/percentile are ulp-different across
      -- engines and rem = 50 lands on decimal halves
      SELECT lo.supplier_nation,
             (100 * lo.delay_d
              + ((90 * (lo.n - 1)) % 100) * (hi.delay_d - lo.delay_d)) // 100
               AS p90_d
      FROM rk lo JOIN rk hi
        ON lo.supplier_nation = hi.supplier_nation
       AND lo.rn = (90 * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN (90 * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT agg.supplier_nation, agg.n_lines, agg.avg_delay_days,
           CAST(q.p90_d AS DOUBLE) AS p90_delay_days,
           agg.max_delay_days, agg.pct_over_90d
    FROM agg JOIN q ON agg.supplier_nation = q.supplier_nation
    ORDER BY agg.supplier_nation
    """,
)
def supplier_ship_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per supplier nation: mean, p90, and max
    days from order date to line ship date plus the share of lines over
    a 90-day fulfillment budget -- the supplier-performance panel behind
    tpch_q21_waiting_suppliers (that one names late suppliers; this
    quantifies HOW late each market runs, which is what vendor reviews
    and lead-time buffers are set from).

    Exactness: delays are exact integer day differences on day-truncated
    timestamps; shares and means are single divisions of integer
    aggregates; p90 interpolates the identical integer list both sides
    (the events_interarrival_stats precedent).

    Scale: the lineitem-orders join co-partitions on orderkey; supplier
    and nation broadcast; per-nation partial agg -- 25 output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lat = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .filter(F.col("l_shipdate").isNotNull())
        .join(
            o.select("o_orderkey", "o_orderdate").filter(
                F.col("o_orderdate").isNotNull()
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_nationkey",
            F.datediff(
                F.date_trunc("day", "l_shipdate").cast("timestamp"),
                F.date_trunc("day", "o_orderdate").cast("timestamp"),
            ).alias("delay_d"),
        )
    )
    from .stats import exact_interp_pct_weighted

    named = lat.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select(F.col("n_name").alias("supplier_nation"), "delay_d").localCheckpoint(
        eager=False
    )  # agg + the percentile rank pass both consume it
    agg = named.groupBy("supplier_nation").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.sum("delay_d").cast("double") / F.count("*"), 6).alias(
            "avg_delay_days"
        ),
        F.max("delay_d").cast("bigint").alias("max_delay_days"),
        F.round(
            F.sum(F.when(F.col("delay_d") > 90, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("pct_over_90d"),
    )
    # delay days are a bounded integer domain: interpolate at domain
    # grain (25 nations x ~200 values), never a fact-grain rank window
    q = exact_interp_pct_weighted(named, ["supplier_nation"], "delay_d", 90).select(
        F.col("supplier_nation").alias("qsn"),
        F.col("q_val").cast("double").alias("p90_delay_days"),
    )
    return (
        agg.join(q, agg["supplier_nation"] == q["qsn"])
        .select(
            "supplier_nation", "n_lines", "avg_delay_days",
            "p90_delay_days", "max_delay_days", "pct_over_90d",
        )
        .orderBy("supplier_nation")
    )


@register(
    "part_dead_stock_panel",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH anchor AS (
      SELECT CAST(date_trunc('day', max(l_shipdate)) AS TIMESTAMP) AS now_d
      FROM lineitem
    ),
    last_sale AS (
      SELECT l_partkey,
             CAST(date_trunc('day', max(l_shipdate)) AS TIMESTAMP) AS last_d,
             CAST(sum(CAST(try_cast(try_cast(l_extendedprice AS DECIMAL(18,2))
                  * 100 AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS rev_c
      FROM lineitem
      WHERE try_cast(try_cast(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            IS NOT NULL
      GROUP BY 1
    )
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN ls.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_never_sold,
           CAST(sum(CASE WHEN ls.l_partkey IS NOT NULL
                    AND date_diff('day', ls.last_d, a.now_d) > 180
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dead_180d,
           round(CAST(sum(CASE WHEN ls.l_partkey IS NULL
                          OR date_diff('day', ls.last_d, a.now_d) > 180
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS dead_share,
           round(CAST(sum(CASE WHEN ls.l_partkey IS NOT NULL
                          AND date_diff('day', ls.last_d, a.now_d) > 180
                          THEN CAST(ls.rev_c AS DECIMAL(38,0)) ELSE 0 END)
                 AS DOUBLE) / 100, 6) AS stranded_lifetime_revenue
    FROM part p
    LEFT JOIN last_sale ls ON p.p_partkey = ls.l_partkey
    CROSS JOIN anchor a
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def part_dead_stock_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock / slow-mover panel per brand: parts never sold, parts
    whose LAST ship date is more than 180 days before the corpus
    anchor, the combined dead share, and the lifetime revenue now
    stranded in dead SKUs -- the assortment-pruning view
    (part_abc_xyz_matrix classifies the living; this counts the dead,
    which is what clearance and delisting reviews start from).

    Exactness: recency is exact day arithmetic against the corpus max
    ship date (deterministic anchor); revenues are BIGINT cents through
    DECIMAL(38,0); the never-sold split keys on the join-miss marker,
    not a data column.

    Scale: one partkey-grain partial agg over lineitem co-partitioned
    with the part join; the anchor is a broadcast 1-row aggregate;
    |brands| output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    anchor = li.agg(
        F.date_trunc("day", F.max("l_shipdate")).cast("timestamp").alias("now_d")
    )
    last_sale = (
        li.filter(cents.isNotNull())
        .groupBy("l_partkey")
        .agg(
            F.date_trunc("day", F.max("l_shipdate")).cast("timestamp").alias("last_d"),
            F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("rev_c"),
        )
    )
    days = F.datediff(F.col("now_d"), F.col("last_d"))
    dead = F.col("l_partkey").isNotNull() & (days > 180)
    never = F.col("l_partkey").isNull()
    return (
        p.select("p_partkey", "p_brand")
        .join(last_sale, F.col("p_partkey") == F.col("l_partkey"), "left")
        .crossJoin(F.broadcast(anchor))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum(F.when(never, 1).otherwise(0)).cast("bigint").alias("n_never_sold"),
            F.sum(F.when(dead, 1).otherwise(0)).cast("bigint").alias("n_dead_180d"),
            F.round(
                F.sum(F.when(never | dead, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("dead_share"),
            F.round(
                F.sum(
                    F.when(dead, F.col("rev_c").cast("decimal(38,0)"))
                    .otherwise(F.lit(0).cast("decimal(38,0)"))
                ).cast("double")
                / 100,
                6,
            ).alias("stranded_lifetime_revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "part_price_ladder_by_nation",
    tags=("warehouse", "stats"),
    oracle="""
    WITH px AS (
      SELECT n.n_name AS supplier_nation,
             try_cast(try_cast(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE try_cast(try_cast(l_extendedprice AS DECIMAL(18,2)) * 100
            AS BIGINT) IS NOT NULL
    ),
    rk AS (
      SELECT supplier_nation, cents,
             CAST(row_number() OVER (PARTITION BY supplier_nation
                                     ORDER BY cents) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY supplier_nation) AS BIGINT) AS n
      FROM px
    ),
    q AS (
      -- exact_interp_pct closed form at three rungs (see stats.py)
      SELECT lo.supplier_nation, p.pct,
             (100 * lo.cents
              + ((p.pct * (lo.n - 1)) % 100) * (hi.cents - lo.cents)) // 100
               AS q_c
      FROM (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct) p
      JOIN rk lo ON lo.rn = (p.pct * (lo.n - 1)) // 100 + 1
      JOIN rk hi ON hi.supplier_nation = lo.supplier_nation
       AND hi.rn = CASE WHEN (p.pct * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT supplier_nation,
           round(CAST(max(CASE WHEN pct = 25 THEN q_c END) AS DOUBLE) / 100, 6)
             AS p25_price,
           round(CAST(max(CASE WHEN pct = 50 THEN q_c END) AS DOUBLE) / 100, 6)
             AS p50_price,
           round(CAST(max(CASE WHEN pct = 75 THEN q_c END) AS DOUBLE) / 100, 6)
             AS p75_price,
           round(CAST(max(CASE WHEN pct = 75 THEN q_c END) AS DOUBLE)
                 / nullif(CAST(max(CASE WHEN pct = 25 THEN q_c END)
                          AS DOUBLE), 0), 6) AS ladder_ratio
    FROM q GROUP BY supplier_nation
    ORDER BY supplier_nation
    """,
)
def part_price_ladder_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price ladder per supplier nation: the p25/p50/p75 rungs of line
    extended price plus the p75/p25 ladder ratio -- the market-tiering
    view regional_price_dispersion's CV can't give (two markets with
    equal CV can have very different ladder SHAPES, and the ratio is
    what price-positioning reviews quote). Three exact-interpolation
    quantiles from one rank pass.

    Exactness: cents are exact BIGINT; each rung uses the shared
    exact_interp_pct rational closed form (ulp-safe, tie-free); the
    ladder ratio is one guarded division of interpolated integer cents.

    Scale: the Spark side interpolates at the (nation, cents) DOMAIN
    grain (exact_interp_pcts_weighted -- cents domains are price-range
    bounded), so no fact-grain rank window exists in the plan; all three
    rungs share ONE fact-grain domain reduction and ONE cumulative pass
    (three single-rung calls would re-scan the fact relation per rung);
    the oracle's row-grain rank CTE is the value-equal reference form."""
    from .stats import exact_interp_pcts_weighted

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    px = (
        li.select("l_suppkey", cents.alias("cents"))
        .filter(F.col("cents").isNotNull())
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("supplier_nation"), "cents")
        # single consumer now (the shared domain reduction): no barrier
    )
    rungs = exact_interp_pcts_weighted(
        px, ["supplier_nation"], "cents", [25, 50, 75]
    )
    return rungs.select(
        "supplier_nation",
        F.round(F.col("q_25").cast("double") / 100, 6).alias("p25_price"),
        F.round(F.col("q_50").cast("double") / 100, 6).alias("p50_price"),
        F.round(F.col("q_75").cast("double") / 100, 6).alias("p75_price"),
        F.round(
            F.col("q_75").cast("double")
            / F.nullif(F.col("q_25").cast("double"), F.lit(0.0)),
            6,
        ).alias("ladder_ratio"),
    ).orderBy("supplier_nation")


@register(
    "supplier_workload_balance_monthly",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH loads AS (
      SELECT date_trunc('month', l_shipdate) AS month_start, l_suppkey,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1, 2
    )
    SELECT month_start,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(n_lines) AS BIGINT) AS total_lines,
           round(CAST(max(n_lines) AS DOUBLE)
                 / CAST(sum(n_lines) AS DOUBLE), 6) AS max_share,
           CASE WHEN count(*) = 1 THEN NULL ELSE
           round(sqrt(greatest((CAST(CAST(sum(n_lines * n_lines)
                                     AS DECIMAL(38,0)) AS DOUBLE)
                   - CAST(CAST(sum(n_lines) AS DECIMAL(38,0)) AS DOUBLE)
                     * CAST(CAST(sum(n_lines) AS DECIMAL(38,0)) AS DOUBLE)
                     / count(*))
                 / nullif(count(*) - 1.0, 0.0), 0.0))
                 / nullif(CAST(CAST(sum(n_lines) AS DECIMAL(38,0)) AS DOUBLE)
                          / count(*), 0.0), 6) END AS cv_load
    FROM loads GROUP BY month_start ORDER BY month_start
    """,
)
def supplier_workload_balance_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly workload-balance panel across suppliers: how evenly the
    month's shipment lines spread over the supplier base (count of active
    suppliers, the largest single-supplier share, and the coefficient of
    variation of per-supplier line counts). Concentration ops price
    REVENUE risk (supplier_concentration_hhi); this prices OPERATIONAL
    risk -- a month where one supplier carries 40% of lines is a
    fulfilment bottleneck even at healthy revenue HHI, and the CV trend
    is the load-balancer's drift alarm.

    Exactness: per-supplier loads are exact integer counts; the moment
    sums route through DECIMAL(38,0) (accumulation-order-independent);
    max_share and CV are each one double expression over those integers
    (variance clamped at 0, NULL-safe for single-supplier months),
    rounded once at 6dp.

    Scale: ONE map-side-combinable (month, supplier) partial agg reduces
    the fact table to dim-scale; the balance panel is a second agg over
    that |months|x|suppliers|-bounded relation. No windows, no joins."""
    li = load_table(spark, sf_dir, "lineitem")
    loads = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month_start"),
        "l_suppkey",
    ).agg(F.count("*").cast("bigint").alias("n_lines"))
    n = F.count("*").cast("double")
    s1 = F.sum(F.col("n_lines").cast("decimal(38,0)")).cast("double")
    s2 = F.sum(
        (F.col("n_lines") * F.col("n_lines")).cast("decimal(38,0)")
    ).cast("double")
    return (
        loads.groupBy("month_start")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
            F.round(
                F.max("n_lines").cast("double") / F.sum("n_lines").cast("double"), 6
            ).alias("max_share"),
            # greatest() SKIPS NULLs on both engines, so the n=1 NULL
            # variance would silently become 0.0 -- the single-supplier
            # NULL contract needs this explicit guard (CV of one point
            # is undefined, not zero).
            F.when(F.count("*") == 1, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.sqrt(
                        F.greatest(
                            (s2 - s1 * s1 / n) / F.nullif(n - 1, F.lit(0.0)),
                            F.lit(0.0),
                        )
                    )
                    / F.nullif(s1 / n, F.lit(0.0)),
                    6,
                )
            ).alias("cv_load"),
        )
        .orderBy("month_start")
    )


@register(
    "customer_cohort_quality_decay",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS oy,
             try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS cents
      FROM orders
    ),
    first_year AS (
      SELECT o_custkey, min(oy) AS cohort_year FROM o GROUP BY o_custkey
    ),
    aged AS (
      SELECT f.cohort_year, o.oy - f.cohort_year AS age, o.o_custkey, o.cents
      FROM o JOIN first_year f USING (o_custkey)
    ),
    panel AS (
      SELECT cohort_year, age,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS DECIMAL(38,0)) AS rev
      FROM aged GROUP BY 1, 2
    )
    SELECT cohort_year, age, n_active,
           round(CAST(n_orders AS DOUBLE) / n_active, 6) AS orders_per_customer,
           round(CAST(rev AS DOUBLE) / n_orders / 100, 6) AS avg_order_value,
           round(CAST(rev AS DOUBLE)
                 / nullif(CAST(max(CASE WHEN age = 0 THEN rev END)
                     OVER (PARTITION BY cohort_year) AS DOUBLE), 0.0), 6)
             AS revenue_retention
    FROM panel ORDER BY cohort_year, age
    """,
)
def customer_cohort_quality_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-quality decay: customers grouped by first-order year, then
    per (cohort, age-in-years) the active-customer count, orders per
    active customer, average order value, and revenue retention vs the
    cohort's acquisition year. orders_cohort_repeat_rate answers "did
    they come back"; this answers "how much are they still WORTH" --
    the decay curve a growth review reads cohort quality from, and the
    batch shape of the LTV models events_cohort_ltv_curve fits on the
    event stream.

    Exactness: cohort years and ages are exact integers; revenue sums
    are exact DECIMAL(38,0) cents (NULL-cents rows drop out of sums on
    both engines identically); each ratio divides exact integers once
    and rounds at 6dp; retention's denominator is NULL-guarded (a cohort
    whose acquisition-year revenue is all-NULL yields NULL on both
    sides).

    Scale: the first-order pass and the join back are both keyed by
    o_custkey -- one hash partitioning serves min-agg, join, and the
    (cohort, age) re-agg's map side; the retention window runs over the
    |years|^2/2-row panel, never fact rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("oy"),
        F.expr(
            "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)"
        ).alias("cents"),
    )
    first_year = o.groupBy("o_custkey").agg(F.min("oy").alias("cohort_year"))
    aged = o.join(first_year, "o_custkey").select(
        "cohort_year", (F.col("oy") - F.col("cohort_year")).alias("age"),
        "o_custkey", "cents",
    )
    panel = aged.groupBy("cohort_year", "age").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev"),
    )
    w = Window.partitionBy("cohort_year")
    rev0 = F.max(F.when(F.col("age") == 0, F.col("rev"))).over(w)
    return panel.select(
        "cohort_year", "age", "n_active",
        F.round(F.col("n_orders").cast("double") / F.col("n_active"), 6).alias(
            "orders_per_customer"
        ),
        F.round(F.col("rev").cast("double") / F.col("n_orders") / 100, 6).alias(
            "avg_order_value"
        ),
        F.round(
            F.col("rev").cast("double") / F.nullif(rev0.cast("double"), F.lit(0.0)), 6
        ).alias("revenue_retention"),
    ).orderBy("cohort_year", "age")


@register(
    "customer_rfm_migration_matrix",
    tags=("relational", "analytics"),
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS oy,
             try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS cents
      FROM orders
      WHERE try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT) IS NOT NULL
    ),
    split AS (SELECT max(oy) AS maxy FROM o),
    a AS (
      SELECT o_custkey, CAST(sum(cents) AS DECIMAL(38,0)) AS m
      FROM o CROSS JOIN split WHERE oy < maxy GROUP BY 1
    ),
    b AS (
      SELECT o_custkey, CAST(sum(cents) AS DECIMAL(38,0)) AS m
      FROM o CROSS JOIN split WHERE oy = maxy GROUP BY 1
    ),
    qa AS (
      SELECT o_custkey, m,
             CAST(ntile(4) OVER (ORDER BY m DESC, o_custkey) AS INT) AS q
      FROM a
    ),
    qb AS (
      SELECT o_custkey, m,
             CAST(ntile(4) OVER (ORDER BY m DESC, o_custkey) AS INT) AS q
      FROM b
    ),
    joined AS (
      SELECT coalesce(qa.o_custkey, qb.o_custkey) AS ck,
             coalesce(qa.q, 0) AS q_from,
             coalesce(qb.q, 0) AS q_to,
             CAST(coalesce(qb.m, 0) - coalesce(qa.m, 0) AS DECIMAL(38,0))
               AS delta
      FROM qa FULL OUTER JOIN qb ON qa.o_custkey = qb.o_custkey
    )
    SELECT q_from, q_to,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(delta) AS DOUBLE) / count(*) / 100, 6)
             AS avg_delta_dollars
    FROM joined GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def customer_rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-quartile migration matrix: customers quartiled by exact
    spend in the history BEFORE the latest order year (q_from) and again
    WITHIN it (q_to, quartile 0 = absent), with cohort sizes and average
    spend change per cell -- the segment-transition view CRM reviews
    read on top of customer_rfm_segments' static cut (a static Q1 tells
    you who is valuable; the matrix tells you who is RISING, LAPSING,
    or NEW, which is where retention budgets actually go).

    Exactness: spend is exact DECIMAL(38,0) cents per period; quartile
    edges are ntile(4) ordered (spend DESC, custkey) -- the
    customer_rfm_segments tiebreak convention, deterministic on both
    engines; deltas sum exactly before ONE division/round per cell.

    Scale: both period aggregates hash-partition by custkey (one fact
    pass each side of the split filter); the quartile cuts run via
    ranks.exact_ntile (range-partitioned, never a single-reducer
    window); the matrix is a 25-cell agg over the dim-grain join."""
    from .ranks import exact_ntile

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("oy"),
        F.expr(
            "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)"
        ).alias("cents"),
    ).filter(F.col("cents").isNotNull()).localCheckpoint(eager=False)
    split = o.agg(F.max("oy").alias("maxy"))
    ob = o.join(F.broadcast(split))
    a = (
        ob.filter(F.col("oy") < F.col("maxy"))
        .groupBy("o_custkey")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("m"))
    )
    b = (
        ob.filter(F.col("oy") == F.col("maxy"))
        .groupBy("o_custkey")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("m"))
    )
    qa = exact_ntile(a, 4, [F.col("m").desc(), F.col("o_custkey")], "q").select(
        F.col("o_custkey").alias("ck_a"), F.col("m").alias("m_a"), F.col("q").alias("qf")
    )
    qb = exact_ntile(b, 4, [F.col("m").desc(), F.col("o_custkey")], "q").select(
        F.col("o_custkey").alias("ck_b"), F.col("m").alias("m_b"), F.col("q").alias("qt")
    )
    joined = qa.join(qb, F.col("ck_a") == F.col("ck_b"), "full_outer").select(
        F.coalesce("qf", F.lit(0)).cast("int").alias("q_from"),
        F.coalesce("qt", F.lit(0)).cast("int").alias("q_to"),
        (
            F.coalesce(F.col("m_b"), F.lit(0).cast("decimal(38,0)"))
            - F.coalesce(F.col("m_a"), F.lit(0).cast("decimal(38,0)"))
        ).cast("decimal(38,0)").alias("delta"),
    )
    return (
        joined.groupBy("q_from", "q_to")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(
                F.sum("delta").cast("double") / F.count("*") / 100, 6
            ).alias("avg_delta_dollars"),
        )
        .orderBy("q_from", "q_to")
    )


@register(
    "orders_interorder_hazard_curve",
    tags=("relational", "analytics", "stats"),
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap_days
      FROM orders
    ),
    w AS (
      SELECT CAST(least(gap_days // 7, 52) AS BIGINT) AS gap_weeks
      FROM g WHERE gap_days IS NOT NULL
    ),
    d AS (
      SELECT gap_weeks, CAST(count(*) AS BIGINT) AS n_events
      FROM w GROUP BY 1
    ),
    r AS (
      SELECT gap_weeks, n_events,
             CAST(sum(n_events) OVER (ORDER BY gap_weeks DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
      FROM d
    )
    SELECT gap_weeks, n_events, n_at_risk,
           round(CAST(n_events AS DOUBLE) / n_at_risk, 6) AS hazard
    FROM r ORDER BY gap_weeks
    """,
)
def orders_interorder_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time hazard curve of re-ordering: for each week-since-
    last-order bin (capped at 52), h(k) = (gaps that ended in week k) /
    (gaps that lasted at least week k) -- the life-table hazard
    estimator (Kaplan-Meier's discrete sibling) over inter-order gaps.
    customer_survival_km gives S(t) for churn; the hazard is its
    actionable derivative: the week where h(k) collapses is when a
    win-back campaign should fire, which neither the survival curve nor
    customer_order_gaps' moments read off directly.

    Exactness: gaps are exact integer day differences on a
    (date, orderkey)-tiebroken lag; week bins are integer floor
    division; the at-risk sets come from ONE descending prefix sum over
    the 53-row bin domain; each hazard divides exact integers once.

    Scale: the lag window partitions by customer (fact-grain but
    key-parallel); everything after is a |bins|-grain panel."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("bigint").alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    d = g.select(
        F.least(F.expr("gap_days div 7"), F.lit(52)).cast("bigint").alias("gap_weeks")
    ).groupBy("gap_weeks").agg(F.count("*").cast("bigint").alias("n_events"))
    wr = Window.orderBy(F.col("gap_weeks").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        d.select(
            "gap_weeks", "n_events",
            F.sum("n_events").over(wr).cast("bigint").alias("n_at_risk"),
        )
        .select(
            "gap_weeks", "n_events", "n_at_risk",
            F.round(
                F.col("n_events").cast("double") / F.col("n_at_risk"), 6
            ).alias("hazard"),
        )
        .orderBy("gap_weeks")
    )


@register(
    "part_brand_share_yearly",
    tags=("relational", "analytics"),
    oracle="""
    WITH base AS (
      SELECT CAST(extract(year FROM l_shipdate) AS BIGINT) AS yr, p_brand,
             try_cast(try_cast(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE try_cast(try_cast(l_extendedprice AS DECIMAL(18,2)) * 100
            AS BIGINT) IS NOT NULL
    ),
    by_cell AS (
      SELECT yr, p_brand, CAST(sum(cents) AS DECIMAL(38,0)) AS rev
      FROM base GROUP BY 1, 2
    ),
    shares AS (
      SELECT yr, p_brand,
             round(CAST(rev AS DOUBLE)
                   / CAST(sum(rev) OVER (PARTITION BY yr) AS DOUBLE), 6)
               AS revenue_share
      FROM by_cell
    )
    SELECT yr, p_brand, revenue_share,
           round(revenue_share - lag(revenue_share) OVER (
             PARTITION BY p_brand ORDER BY yr), 6) AS share_change
    FROM shares ORDER BY yr, p_brand
    """,
)
def part_brand_share_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue-share trend: each brand's share of the year's line
    revenue plus its year-over-year share change -- the assortment MIX
    view that absolute-revenue trends hide (a brand can grow revenue
    while losing share in a faster-growing market; merchandising reads
    the share delta, not the dollar delta). Complements
    part_price_index_* (price movement) and orders_price_volume_mix
    (price/volume split) with the mix axis.

    Exactness: per-cell revenue is exact DECIMAL(38,0) cents; the share
    divides the cell by its year total once at 6dp; the YoY delta
    subtracts two already-rounded shares (identical doubles both
    engines) and rounds once more; first observed year per brand emits
    NULL.

    Scale: one fact pass with the part dim broadcast; the share window
    and YoY lag run over the |years| x |brands| panel only."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    base = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("l_shipdate").cast("bigint").alias("yr"),
            "p_brand",
            F.expr(
                "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
            ).alias("cents"),
        )
        .filter(F.col("cents").isNotNull())
    )
    by_cell = base.groupBy("yr", "p_brand").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev")
    )
    wy = Window.partitionBy("yr")
    shares = by_cell.select(
        "yr", "p_brand",
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wy).cast("double"), 6
        ).alias("revenue_share"),
    )
    wb = Window.partitionBy("p_brand").orderBy("yr")
    return shares.select(
        "yr", "p_brand", "revenue_share",
        F.round(
            F.col("revenue_share") - F.lag("revenue_share").over(wb), 6
        ).alias("share_change"),
    ).orderBy("yr", "p_brand")


@register(
    "nation_revenue_shift_share",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS yr,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3
    ),
    yrs AS (SELECT max(yr) AS y2, max(yr) - 1 AS y1 FROM rev),
    p AS (
      SELECT nation, seg,
             CAST(sum(CASE WHEN yr = yrs.y1 THEN cents ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(sum(CASE WHEN yr = yrs.y2 THEN cents ELSE 0 END) AS BIGINT)
               AS r2
      FROM rev CROSS JOIN yrs
      WHERE yr IN (yrs.y1, yrs.y2) GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(r1) AS BIGINT) AS t1, CAST(sum(r2) AS BIGINT) AS t2
      FROM p
    ),
    segt AS (
      SELECT seg, CAST(sum(r1) AS BIGINT) AS s1,
             CAST(sum(r2) AS BIGINT) AS s2
      FROM p GROUP BY seg
    ),
    terms AS (
      SELECT p.nation, p.r1, p.r2,
             CAST(floor(1000.0 * p.r1 * (CAST(tot.t2 AS DOUBLE) / tot.t1 - 1))
                  AS BIGINT) AS nat_u,
             CAST(floor(1000.0 * p.r1
                  * (CAST(segt.s2 AS DOUBLE) / nullif(segt.s1, 0)
                     - CAST(tot.t2 AS DOUBLE) / tot.t1)) AS BIGINT) AS mix_u
      FROM p JOIN segt ON p.seg = segt.seg CROSS JOIN tot
      WHERE segt.s1 > 0
    )
    SELECT nation,
           CAST(sum(r1) AS BIGINT) AS r1_cents,
           CAST(sum(r2) AS BIGINT) AS r2_cents,
           CAST(sum(r2) - sum(r1) AS BIGINT) AS delta_cents,
           round(CAST(sum(nat_u) AS DOUBLE) / 1000, 3) AS national_effect,
           round(CAST(sum(mix_u) AS DOUBLE) / 1000, 3) AS mix_effect,
           round((1000 * (sum(r2) - sum(r1)) - sum(nat_u) - sum(mix_u))
                 / 1000.0, 3) AS competitive_effect
    FROM terms GROUP BY nation ORDER BY nation
    """,
)
def nation_revenue_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition (classic regional-economics identity,
    Dunn 1960) of each nation's year-over-year revenue change for the
    last two order years: actual delta = NATIONAL effect (what growing
    with the grand total would give) + segment-MIX effect (the nation's
    segment portfolio growing at segment rates) + COMPETITIVE residual
    (out/under-performing its own mix). The panel that separates "our
    market grew" from "we won share" -- per nation, with the identity
    delta = national + mix + competitive holding EXACTLY by
    construction.

    Exactness: period revenues are exact integer cents; the national
    and mix terms floor to integer MILLI-CENTS per (nation, segment)
    cell before summing (order-free integer addition -- the theta-fold
    micro-unit discipline), and the competitive term is the integer
    residual, so the identity is exact in the snapped space; one /1000
    presentation division at 3dp. Segments with zero base-year revenue
    contribute through the residual (their growth rate is undefined) --
    documented, matching the oracle's s1 > 0 guard.

    Scale: ONE fact pass to the (nation, segment, year) grain (dims
    broadcast); everything after runs on the |nations| x |segments|
    panel with broadcast totals. No windows, no fact re-scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(F.expr(_TOTAL_C).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=False)  # year fold + period pivot consume it
    )
    yrs = rev.agg(F.max("yr").alias("y2"), (F.max("yr") - 1).alias("y1"))
    p = (
        rev.crossJoin(F.broadcast(yrs))
        .filter((F.col("yr") == F.col("y1")) | (F.col("yr") == F.col("y2")))
        .groupBy("nation", "seg")
        .agg(
            F.sum(F.when(F.col("yr") == F.col("y1"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("r1"),
            F.sum(F.when(F.col("yr") == F.col("y2"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("r2"),
        )
        .localCheckpoint(eager=False)  # totals, segment totals, terms consume it
    )
    tot = p.agg(
        F.sum("r1").cast("bigint").alias("t1"), F.sum("r2").cast("bigint").alias("t2")
    )
    segt = p.groupBy("seg").agg(
        F.sum("r1").cast("bigint").alias("s1"), F.sum("r2").cast("bigint").alias("s2")
    )
    g = F.col("t2").cast("double") / F.col("t1") - 1
    gs = F.col("s2").cast("double") / F.nullif(F.col("s1"), F.lit(0)) - F.col(
        "t2"
    ).cast("double") / F.col("t1")
    terms = (
        p.join(F.broadcast(segt), "seg")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("s1") > 0)
        .select(
            "nation",
            "r1",
            "r2",
            F.floor(1000.0 * F.col("r1") * g).cast("bigint").alias("nat_u"),
            F.floor(1000.0 * F.col("r1") * gs).cast("bigint").alias("mix_u"),
        )
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.sum("r1").cast("bigint").alias("r1_cents"),
            F.sum("r2").cast("bigint").alias("r2_cents"),
            (F.sum("r2") - F.sum("r1")).cast("bigint").alias("delta_cents"),
            F.round(F.sum("nat_u").cast("double") / 1000, 3).alias("national_effect"),
            F.round(F.sum("mix_u").cast("double") / 1000, 3).alias("mix_effect"),
            F.round(
                (
                    1000 * (F.sum("r2") - F.sum("r1"))
                    - F.sum("nat_u")
                    - F.sum("mix_u")
                ).cast("double")
                / 1000.0,
                3,
            ).alias("competitive_effect"),
        )
        .orderBy("nation")
    )


@register(
    "part_substitute_pairs",
    tags=("warehouse", "similarity"),
    oracle="""
    WITH px AS (
      SELECT p_partkey, p_brand, p_type, p_size,
             try_cast(try_cast(p_retailprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
      FROM part
      WHERE try_cast(p_retailprice AS DECIMAL(18,2)) IS NOT NULL
    )
    SELECT a.p_type AS part_type,
           a.p_partkey AS a_key, b.p_partkey AS b_key,
           a.p_brand AS a_brand, b.p_brand AS b_brand,
           CAST(a.p_size AS BIGINT) AS a_size,
           CAST(b.p_size AS BIGINT) AS b_size,
           CAST(abs(a.cents - b.cents) AS BIGINT) AS gap_cents
    FROM px a JOIN px b
      ON a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
     AND a.p_brand <> b.p_brand
     AND abs(a.p_size - b.p_size) <= 1
     AND 100 * abs(a.cents - b.cents) <= 5 * least(a.cents, b.cents)
    ORDER BY gap_cents, a_key, b_key
    LIMIT 50
    """,
)
def part_substitute_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substitution-candidate discovery over the part dimension: pairs of
    DIFFERENT-brand parts of the same type, within one size step and 5%
    of the cheaper price -- the assortment-rationalization shortlist
    (which SKUs compete head-to-head) and the blocking-key pattern of
    entity-resolution fuzzy joins (block on type, band on size, fence on
    price). Top-50 closest-priced pairs, fully tie-broken.

    Exactness: prices compare as exact integer cents with an
    integer-only 5% fence (100*gap <= 5*min -- no float division); the
    ordering (gap, a_key, b_key) is total.

    Scale: a DIM-table self-join blocked on the type equi-key -- the
    pair space is sum over types of |group|^2, never |parts|^2; at a
    1000x part dimension, prefix the block key with the size band
    ((p_type, p_size DIV 2) joined on band +-1) to halve the group
    fan-out. The top-50 is a TakeOrderedAndProject -- nothing beyond
    pairs surviving all four fences ever sorts globally."""
    from ..catalog import spread

    # the part fixture ships one row group -> one partition; spread the
    # PROBE side so the blocked pair space fans across cores (the build
    # side broadcasts regardless). At warehouse scale the dim arrives in
    # many splits and this is a no-op (the spread() contract).
    p = spread(load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").cast("decimal(18,2)").isNotNull()
    ).select(
        "p_partkey", "p_brand", "p_type", "p_size",
        F.expr(
            "try_cast(try_cast(p_retailprice AS decimal(18,2)) * 100 AS bigint)"
        ).alias("cents"),
    )).localCheckpoint(eager=False)  # both sides of the self-join
    a = p.select(*[F.col(c).alias(f"a_{c}") for c in p.columns])
    b = p.select(*[F.col(c).alias(f"b_{c}") for c in p.columns])
    pairs = a.join(
        b,
        (F.col("a_p_type") == F.col("b_p_type"))
        & (F.col("a_p_partkey") < F.col("b_p_partkey"))
        & (F.col("a_p_brand") != F.col("b_p_brand"))
        & (F.abs(F.col("a_p_size") - F.col("b_p_size")) <= 1)
        & (
            100 * F.abs(F.col("a_cents") - F.col("b_cents"))
            <= 5 * F.least("a_cents", "b_cents")
        ),
    ).select(
        F.col("a_p_type").alias("part_type"),
        F.col("a_p_partkey").alias("a_key"),
        F.col("b_p_partkey").alias("b_key"),
        F.col("a_p_brand").alias("a_brand"),
        F.col("b_p_brand").alias("b_brand"),
        F.col("a_p_size").cast("bigint").alias("a_size"),
        F.col("b_p_size").cast("bigint").alias("b_size"),
        F.abs(F.col("a_cents") - F.col("b_cents")).cast("bigint").alias("gap_cents"),
    )
    return pairs.orderBy("gap_cents", "a_key", "b_key").limit(50)


@register(
    "orders_fulfillment_sla_weekly",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH x AS (
      SELECT CAST(date_trunc('week', o.o_orderdate) AS TIMESTAMP) AS week_start,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    )
    SELECT week_start,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CASE WHEN delay_d <= 30 THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS pct_30d,
           round(CAST(sum(CASE WHEN delay_d <= 60 THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS pct_60d,
           round(CAST(sum(CASE WHEN delay_d <= 90 THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS pct_90d,
           round(CAST(sum(CAST(delay_d AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*), 6) AS avg_delay_d
    FROM x GROUP BY week_start ORDER BY week_start
    """,
)
def orders_fulfillment_sla_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly fulfilment-SLA panel: for lines ordered each ISO week, the
    share shipped within 30/60/90 days and the mean order-to-ship delay.
    The demand-side twin of supplier_ship_latency_profile (which slices
    the same delay by SUPPLIER): a falling pct_30d with flat supplier
    profiles means the mix shifted toward slow suppliers, not that any
    supplier degraded. Both engines truncate weeks to Monday, so the
    grain is dialect-stable; week starts emit as TIMESTAMP (the raw-DATE
    hash trap).

    Exactness: delays are integer calendar days on midnight-aligned
    timestamps (identical boundary semantics both engines); shares and
    the DECIMAL-accumulated mean are single divisions rounded at 6dp.

    Scale: one fact-fact equi-join on the order key (co-partitioned
    shuffle, no window), then a map-side-combinable week rollup --
    conditional sums, no percentile state."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    x = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            F.date_trunc("week", "o_orderdate").cast("timestamp").alias("week_start"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_d"),
        )
    )
    nd = F.count("*").cast("double")
    return (
        x.groupBy("week_start")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.when(F.col("delay_d") <= 30, 1).otherwise(0)) / nd, 6
            ).alias("pct_30d"),
            F.round(
                F.sum(F.when(F.col("delay_d") <= 60, 1).otherwise(0)) / nd, 6
            ).alias("pct_60d"),
            F.round(
                F.sum(F.when(F.col("delay_d") <= 90, 1).otherwise(0)) / nd, 6
            ).alias("pct_90d"),
            F.round(
                F.sum(F.col("delay_d").cast("decimal(38,0)")).cast("double") / nd, 6
            ).alias("avg_delay_d"),
        )
        .orderBy("week_start")
    )


@register(
    "supplier_latency_trend_by_nation",
    tags=("warehouse", "stats"),
    oracle="""
    WITH x AS (
      SELECT n.n_name AS supplier_nation,
             CAST(extract(year FROM o.o_orderdate) * 12
                  + extract(month FROM o.o_orderdate) AS BIGINT) AS mi,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS delay_d
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    ),
    m AS (
      SELECT supplier_nation,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(mi AS DECIMAL(38,0))) AS BIGINT) AS sx,
             CAST(sum(CAST(delay_d AS DECIMAL(38,0))) AS BIGINT) AS sy,
             CAST(sum(CAST(mi AS DECIMAL(38,0)) * delay_d) AS BIGINT) AS sxy,
             CAST(sum(CAST(mi AS DECIMAL(38,0)) * mi) AS BIGINT) AS sxx
      FROM x GROUP BY supplier_nation
    )
    SELECT supplier_nation, n AS n_lines,
           round(CAST(sy AS DOUBLE) / n, 6) AS mean_delay_d,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / nullif(CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx, 0), 6)
             AS slope_d_per_month
    FROM m WHERE n >= 2 ORDER BY supplier_nation
    """,
)
def supplier_latency_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is fulfilment latency drifting, and whose suppliers are drifting?
    Per supplier nation: the OLS slope of order-to-ship delay against
    the calendar month index (days of added delay per month) plus the
    mean delay. supplier_ship_latency_profile is the LEVEL snapshot;
    this is its first derivative -- the lead-time drift a capacity
    planner extrapolates, computed over every line (not monthly means,
    so heavy months weigh proportionally).

    Exactness: month index and day delay are exact integers; all five
    OLS moments accumulate in DECIMAL(38,0) (order-free); the slope and
    mean are single closed-form divisions rounded at 6dp.

    Scale: one fact-fact join on the order key plus two broadcast dim
    hops, folded map-side to |nations| moment rows -- the regression
    never materializes points, windows, or sorts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    x = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            F.col("n_name").alias("supplier_nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("mi"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_d"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = x.groupBy("supplier_nation").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec("mi")).cast("bigint").alias("sx"),
        F.sum(dec("delay_d")).cast("bigint").alias("sy"),
        F.sum(dec("mi") * F.col("delay_d")).cast("bigint").alias("sxy"),
        F.sum(dec("mi") * F.col("mi")).cast("bigint").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    return m.filter(F.col("n") >= 2).select(
        "supplier_nation",
        F.col("n").alias("n_lines"),
        F.round(F.col("sy").cast("double") / nd, 6).alias("mean_delay_d"),
        F.round(
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / F.nullif(
                nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"),
                F.lit(0.0),
            ),
            6,
        ).alias("slope_d_per_month"),
    ).orderBy("supplier_nation")


@register(
    "customer_purchase_regularity_by_segment",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_d
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    pc AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(gap_d AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(sum(CAST(gap_d AS DECIMAL(38,0)) * gap_d) AS BIGINT) AS q
      FROM g WHERE gap_d IS NOT NULL GROUP BY o_custkey HAVING count(*) >= 2
    ),
    cv AS (
      SELECT o_custkey,
             CAST(floor(1e6 * sqrt(greatest((q - CAST(s AS DOUBLE) * s / ng)
                                            / (ng - 1), 0.0))
                        * ng / nullif(CAST(s AS DOUBLE), 0)) AS BIGINT) AS cv_u
      FROM pc WHERE s > 0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(cv.cv_u) AS DOUBLE) / count(*) / 1e6, 6) AS avg_cv,
           round(CAST(sum(CASE WHEN cv.cv_u < 500000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS share_regular
    FROM cv JOIN customer c ON cv.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def customer_purchase_regularity_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Purchase-rhythm regularity by market segment: per repeat customer
    (>= 3 orders) the coefficient of variation of inter-order gaps --
    CV < 0.5 is a metronome buyer (subscription-like, forecastable),
    CV >> 1 is bursty -- rolled up to segment grain as the average CV
    and the regular-buyer share. The rhythm complement to
    customer_repeat_interval_by_segment (which prices the LEVEL of the
    gap, not its variability); in RFM terms this is the missing
    'regularity' axis the R/F pair can't see.

    Exactness: gaps are integer days; per-customer moments accumulate in
    DECIMAL(38,0); each customer's CV floors to integer MICRO-UNITS
    before the segment sum (order-free integer addition -- the
    micro-unit snap discipline), then two presentation divisions at 6dp.
    Zero-mean-gap customers (all same-day orders) are excluded by the
    s > 0 guard on both engines.

    Scale: ONE keyed window over the customer-partitioned order stream
    (the natural co-partitioning), a map-side-combinable per-customer
    moment agg, a broadcast dim join, and a |segments|-row panel."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.filter(F.col("o_orderdate").isNotNull()).select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_d"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    pc = (
        g.filter(F.col("gap_d").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("ng"),
            F.sum(dec("gap_d")).cast("bigint").alias("s"),
            F.sum(dec("gap_d") * F.col("gap_d")).cast("bigint").alias("q"),
        )
        .filter(F.col("ng") >= 2)
    )
    ngd = F.col("ng").cast("double")
    cv_u = F.floor(
        1e6
        * F.sqrt(
            F.greatest(
                (F.col("q") - F.col("s").cast("double") * F.col("s") / ngd)
                / (ngd - 1),
                F.lit(0.0),
            )
        )
        * ngd
        / F.nullif(F.col("s").cast("double"), F.lit(0.0))
    ).cast("bigint")
    cv = pc.filter(F.col("s") > 0).select("o_custkey", cv_u.alias("cv_u"))
    return (
        cv.join(F.broadcast(c), cv.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.sum("cv_u").cast("double") / F.count("*") / 1e6, 6).alias(
                "avg_cv"
            ),
            F.round(
                F.sum(F.when(F.col("cv_u") < 500000, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("share_regular"),
        )
        .orderBy("segment")
    )


@register(
    "orders_completion_curve_weekly",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             CAST(ceil(CAST(date_diff('day', o.o_orderdate,
                                      max(l.l_shipdate)) AS DOUBLE) / 7)
                  AS BIGINT) AS weeks_to_complete
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_order),
    wk AS (SELECT CAST(unnest(range(1, 13)) AS BIGINT) AS w)
    SELECT wk.w AS week,
           CAST(sum(CASE WHEN p.weeks_to_complete <= wk.w THEN 1 ELSE 0 END)
                AS BIGINT) AS n_complete,
           round(CAST(sum(CASE WHEN p.weeks_to_complete <= wk.w
                          THEN 1 ELSE 0 END) AS DOUBLE) / tot.n, 6)
             AS complete_share
    FROM wk CROSS JOIN per_order p CROSS JOIN tot
    GROUP BY wk.w, tot.n ORDER BY wk.w
    """,
)
def orders_completion_curve_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-completion burn-down curve: the share of orders FULLY
    shipped (their last line's shipdate) within w weeks of order
    placement, for w = 1..12. orders_fulfillment_sla_weekly prices
    line-level SLAs per calendar week; this is the order-level
    completion CDF the promise-date policy is set from ("95% of orders
    complete within N weeks" is read directly off this curve), and the
    order-grain twin of the life-table view in
    orders_interorder_hazard_curve.

    Exactness: weeks-to-complete is integer ceil arithmetic on calendar
    days; the curve is conditional integer counting against a constant
    12-row week spine (always 12 rows out -- a flag-panel form, never
    filtered to empty); one share division at 6dp.

    Scale: ONE orderkey-co-partitioned fact-fact agg to order grain
    (max shipdate per order), then a broadcast 12-row spine against the
    order-grain relation folded map-side. The curve never sorts. Grain
    contract: the only domain-bounded relation here is the week spine,
    which is a LITERAL `spark.range(1, 13)` -- no fixture change can
    widen it; the final 12-row orderBy is the entire sorted set."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.ceil(
                F.datediff("last_ship", "o_orderdate").cast("double") / 7
            ).cast("bigint").alias("weeks_to_complete")
        )
    )
    tot = per_order.agg(F.count("*").cast("bigint").alias("n"))
    wk = spark.range(1, 13).select(F.col("id").cast("bigint").alias("week"))
    return (
        F.broadcast(wk)
        .crossJoin(per_order)
        .crossJoin(F.broadcast(tot))
        .groupBy("week", "n")
        .agg(
            F.sum(F.when(F.col("weeks_to_complete") <= F.col("week"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_complete")
        )
        .select(
            "week",
            "n_complete",
            F.round(F.col("n_complete").cast("double") / F.col("n"), 6).alias(
                "complete_share"
            ),
        )
        .orderBy("week")
    )


@register(
    "part_sourcing_redundancy_panel",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH sp AS (
      SELECT l_partkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ns
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM sp),
    tiers AS (
      SELECT * FROM (VALUES ('single', 1, 1), ('dual', 2, 2),
                            ('3-4', 3, 4), ('5+', 5, 9223372036854775807))
        t(sourcing_tier, lo, hi)
    ),
    cnt AS (
      SELECT t.sourcing_tier, t.lo,
             CAST(count(sp.l_partkey) AS BIGINT) AS n_parts
      FROM tiers t LEFT JOIN sp ON sp.ns BETWEEN t.lo AND t.hi
      GROUP BY t.sourcing_tier, t.lo
    )
    SELECT c.sourcing_tier, c.n_parts,
           round(CAST(c.n_parts AS DOUBLE) / tot.n_parts, 6) AS part_share
    FROM cnt c CROSS JOIN tot
    ORDER BY c.lo
    """,
)
def part_sourcing_redundancy_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-redundancy tiers over the traded part base: how many
    parts are single-/dual-/multi-sourced (distinct shipping suppliers
    observed per part). The portfolio-level rollup of
    part_single_source_risk (which lists the exposed SKUs; this sizes
    the EXPOSURE CLASSES -- the number a resilience program tracks
    quarter over quarter), and the supply-side mirror of
    graph_degree_tail_alpha's supplier-degree law. The four tiers are a
    CONSTANT spine (left-joined, zero-filled), so the panel always
    emits 4 rows -- an empty tier is the healthy reading ("no
    single-sourced parts"), not a vanished row (the flag-panel
    discipline).

    Exactness: distinct-supplier counts are exact; tier membership is
    an integer BETWEEN; one share division at 6dp.

    Scale: ONE (part, supplier) distinct reduction over the fact table,
    then a broadcast 4-row spine join against the |parts|-grain
    relation; 4 rows out."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("ns")
    )
    tot = sp.agg(F.count("*").cast("bigint").alias("n_parts_total"))
    tiers = spark.createDataFrame(
        [("single", 1, 1), ("dual", 2, 2), ("3-4", 3, 4),
         ("5+", 5, 2**63 - 1)],
        "sourcing_tier string, lo long, hi long",
    )
    cnt = (
        F.broadcast(tiers)
        .join(sp, (F.col("ns") >= F.col("lo")) & (F.col("ns") <= F.col("hi")), "left")
        .groupBy("sourcing_tier", "lo")
        .agg(F.count("l_partkey").cast("bigint").alias("n_parts"))
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "sourcing_tier",
            "n_parts",
            F.round(
                F.col("n_parts").cast("double") / F.col("n_parts_total"), 6
            ).alias("part_share"),
            F.col("lo"),
        )
        .orderBy("lo")
        .drop("lo")
    )


@register(
    "orders_priority_queueing_delay",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH x AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS delay_d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    ),
    dom AS (
      SELECT priority, delay_d, CAST(count(*) AS BIGINT) AS w
      FROM x GROUP BY 1, 2
    ),
    cum AS (
      SELECT priority, delay_d, w,
             CAST(sum(w) OVER (PARTITION BY priority ORDER BY delay_d)
                  AS BIGINT) AS c_end,
             CAST(sum(w) OVER (PARTITION BY priority) AS BIGINT) AS n
      FROM dom
    ),
    q AS (
      SELECT p.pct, c.priority,
             (100 * lo.delay_d + ((p.pct * (lo.n - 1)) % 100)
              * (hi.delay_d - lo.delay_d)) // 100 AS qv
      FROM (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS pct) p
      CROSS JOIN (SELECT DISTINCT priority FROM cum) c
      JOIN cum lo ON lo.priority = c.priority
        AND lo.c_end >= (p.pct * (lo.n - 1)) // 100 + 1
        AND lo.c_end - lo.w < (p.pct * (lo.n - 1)) // 100 + 1
      JOIN cum hi ON hi.priority = c.priority
        AND hi.c_end >= CASE WHEN (p.pct * (lo.n - 1)) % 100 = 0
                             THEN (p.pct * (lo.n - 1)) // 100 + 1
                             ELSE (p.pct * (lo.n - 1)) // 100 + 2 END
        AND hi.c_end - hi.w < CASE WHEN (p.pct * (lo.n - 1)) % 100 = 0
                                   THEN (p.pct * (lo.n - 1)) // 100 + 1
                                   ELSE (p.pct * (lo.n - 1)) // 100 + 2 END
    ),
    t AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS n_lines,
             round(CAST(sum(CAST(delay_d AS DECIMAL(38,0))) AS DOUBLE)
                   / count(*), 6) AS mean_delay_d
      FROM x GROUP BY 1
    )
    SELECT t.priority, t.n_lines, t.mean_delay_d,
           CAST(max(CASE WHEN q.pct = 50 THEN q.qv END) AS BIGINT) AS p50_d,
           CAST(max(CASE WHEN q.pct = 90 THEN q.qv END) AS BIGINT) AS p90_d,
           CAST(max(CASE WHEN q.pct = 99 THEN q.qv END) AS BIGINT) AS p99_d
    FROM t JOIN q ON t.priority = q.priority
    GROUP BY t.priority, t.n_lines, t.mean_delay_d
    ORDER BY t.priority
    """,
)
def orders_priority_queueing_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does priority BUY latency? Per order priority: line-level
    order-to-ship delay mean and exact p50/p90/p99. If 1-URGENT's p99
    matches 5-LOW's, the priority field is decorative and
    orders_priority_sla_breach's alerting thresholds are mis-calibrated
    -- this is the queueing-discipline audit behind that breach
    monitor, on the shared exact-interpolation percentile rails
    (domain-grain: delays are small integers, so the rank pass runs on
    the (priority, delay) DOMAIN, not on lines).

    Exactness: integer day delays; exact_interp_pct_weighted closed
    form; DECIMAL-accumulated mean; one 6dp round each.

    Scale: one orderkey-co-partitioned join, one map-side-combinable
    (priority, delay) domain reduction; percentile windows ride the
    |priorities| x |delay domain| relation."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    x = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_d"),
        )
        .localCheckpoint(eager=False)  # percentile passes + totals consume it
    )
    from .stats import exact_interp_pct_weighted

    qs = None
    for pct, alias in ((50, "p50_d"), (90, "p90_d"), (99, "p99_d")):
        q = exact_interp_pct_weighted(x, ["priority"], "delay_d", pct).select(
            "priority", F.col("q_val").cast("bigint").alias(alias)
        )
        qs = q if qs is None else qs.join(q, "priority")
    t = x.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(
            F.sum(F.col("delay_d").cast("decimal(38,0)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_delay_d"),
    )
    return (
        t.join(qs, "priority")
        .select("priority", "n_lines", "mean_delay_d", "p50_d", "p90_d", "p99_d")
        .orderBy("priority")
    )


@register(
    "lineitem_return_rate_by_brand_year",
    tags=("warehouse", "dq"),
    oracle="""
    WITH x AS (
      SELECT p.p_brand AS brand,
             CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
             try_cast(try_cast(l.l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate IS NOT NULL
    )
    SELECT brand, ship_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ret) AS BIGINT) AS n_returned,
           round(CAST(sum(ret) AS DOUBLE) / count(*), 6) AS return_rate,
           CAST(sum(CASE WHEN ret = 1 THEN CAST(cents AS DECIMAL(38,0))
                    ELSE 0 END) AS BIGINT) AS returned_cents
    FROM x GROUP BY brand, ship_year ORDER BY brand, ship_year
    """,
)
def lineitem_return_rate_by_brand_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate quality panel at (brand, ship-year) grain: line count,
    returned count/share, and returned revenue. The product-quality
    trend the assortment review reads next to part_dead_stock_panel
    (dead stock = demand failure; returns = QUALITY failure): a brand
    whose return rate climbs across years is a supplier-quality
    regression that tpch_q10's customer-level churn view cannot
    attribute. Flag-panel form: every (brand, year) cell with traffic
    emits, zero-return cells included.

    Exactness: the return flag is integer CASE; revenue accumulates in
    DECIMAL(38,0) cents; one share division at 6dp.

    Scale: one fact pass with the part dim broadcast; map-side
    combinable (brand, year) conditional sums -- no windows, no
    percentile state."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    x = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.col("l_shipdate").isNotNull())
        .select(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
            F.expr(
                "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
            ).alias("cents"),
        )
    )
    return (
        x.groupBy("brand", "ship_year")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("ret").cast("bigint").alias("n_returned"),
            F.round(F.sum("ret").cast("double") / F.count("*"), 6).alias(
                "return_rate"
            ),
            F.sum(
                F.when(F.col("ret") == 1, F.col("cents").cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).cast("bigint").alias("returned_cents"),
        )
        .orderBy("brand", "ship_year")
    )


@register(
    "customer_retention_clv_projection",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST({_TOTAL_C} AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    yrs AS (SELECT max(yr) AS y2 FROM o),
    seg AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey, o.yr,
             CAST(sum(CAST(o.cents AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ),
    ret AS (
      SELECT p.segment,
             CAST(count(*) AS BIGINT) AS n_prev,
             CAST(sum(CASE WHEN q.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained
      FROM (SELECT segment, o_custkey FROM seg CROSS JOIN yrs
            WHERE yr = y2 - 1) p
      LEFT JOIN (SELECT segment, o_custkey FROM seg CROSS JOIN yrs
                 WHERE yr = y2) q
        ON p.segment = q.segment AND p.o_custkey = q.o_custkey
      GROUP BY p.segment
    ),
    val AS (
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM seg CROSS JOIN yrs WHERE yr = y2 GROUP BY segment
    )
    SELECT v.segment, v.n_active, r.n_prev, r.n_retained,
           round(CAST(r.n_retained AS DOUBLE) / nullif(r.n_prev, 0), 6)
             AS retention,
           round(CAST(v.cents AS DOUBLE) / v.n_active / 100, 6)
             AS avg_annual_value,
           round(CAST(v.cents AS DOUBLE) / v.n_active / 100
                 * (1
                    + round(CAST(r.n_retained AS DOUBLE)
                            / nullif(r.n_prev, 0), 6)
                    + round(CAST(r.n_retained AS DOUBLE)
                            / nullif(r.n_prev, 0), 6)
                      * round(CAST(r.n_retained AS DOUBLE)
                              / nullif(r.n_prev, 0), 6)),
                 6) AS clv_3yr_projection
    FROM val v JOIN ret r ON v.segment = r.segment
    ORDER BY v.segment
    """,
)
def customer_retention_clv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-discounted customer-value projection per segment (the
    geometric-retention CLV identity CLV = v * sum r^t, the closed form
    behind the classic Gupta-Lehmann approximation, truncated at a
    3-year horizon): measure year-over-year retention r between the
    last two order years, the latest year's average annual value v, and
    project v * (1 + r + r^2). customer_cohort_quality_decay measures
    the realized decay surface; this compresses it into the ONE
    budgeting number per segment, with its two inputs exposed so the
    projection is auditable.

    Exactness: per-(segment, customer, year) revenue accumulates in
    DECIMAL cents; retention and v are single divisions; the projection
    uses the 6dp-ROUNDED retention on both engines (round-then-compose,
    the search-family discipline -- the composition of already-snapped
    values is deterministic).

    Scale: one fact pass to (segment, customer, year) grain (dim
    broadcast), a year-pair semi-join at customer grain, and a
    |segments|-row panel."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.filter(F.col("o_orderdate").isNotNull())
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(F.expr(_TOTAL_C).cast("decimal(38,0)")).cast("bigint").alias("cents")
        )
        .localCheckpoint(eager=False)  # year fold + both period cuts consume it
    )
    y2 = seg.agg(F.max("yr").alias("y2"))
    prev = seg.crossJoin(F.broadcast(y2)).filter(F.col("yr") == F.col("y2") - 1)
    curr = seg.crossJoin(F.broadcast(y2)).filter(F.col("yr") == F.col("y2"))
    # LEFT join + conditional count (not a semi-join + count): a segment
    # whose retention is ZERO must still emit its n_prev row -- the
    # semi-join form would drop it and the panel would silently lose the
    # worst-performing segment (the constant-panel totality class).
    ret = (
        prev.join(
            curr.select("segment", "custkey").withColumn("hit", F.lit(1)),
            ["segment", "custkey"],
            "left",
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_prev"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_retained"),
        )
    )
    val = curr.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("cents"),
    )
    r6 = F.round(
        F.col("n_retained").cast("double") / F.nullif(F.col("n_prev"), F.lit(0)), 6
    )
    v = F.col("cents").cast("double") / F.col("n_active") / 100
    return (
        val.join(ret, "segment")
        .select(
            "segment",
            "n_active",
            "n_prev",
            "n_retained",
            r6.alias("retention"),
            F.round(v, 6).alias("avg_annual_value"),
            F.round(v * (1 + r6 + r6 * r6), 6).alias("clv_3yr_projection"),
        )
        .orderBy("segment")
    )


@register(
    "orders_value_at_risk_shortfall",
    tags=("warehouse", "stats"),
    oracle=f"""
    WITH c AS (
      SELECT {_TOTAL_C} AS cents FROM orders
      WHERE {_TOTAL_C} IS NOT NULL
    ),
    dom AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS w FROM c GROUP BY cents
    ),
    cum AS (
      SELECT cents, w,
             CAST(sum(w) OVER (ORDER BY cents) AS BIGINT) AS c_end,
             CAST(sum(w) OVER () AS BIGINT) AS n
      FROM dom
    ),
    q AS (
      SELECT (100 * lo.cents + ((95 * (lo.n - 1)) % 100)
              * (hi.cents - lo.cents)) // 100 AS q95
      FROM cum lo JOIN cum hi
        ON lo.c_end >= (95 * (lo.n - 1)) // 100 + 1
       AND lo.c_end - lo.w < (95 * (lo.n - 1)) // 100 + 1
       AND hi.c_end >= CASE WHEN (95 * (lo.n - 1)) % 100 = 0
                            THEN (95 * (lo.n - 1)) // 100 + 1
                            ELSE (95 * (lo.n - 1)) // 100 + 2 END
       AND hi.c_end - hi.w < CASE WHEN (95 * (lo.n - 1)) % 100 = 0
                                  THEN (95 * (lo.n - 1)) // 100 + 1
                                  ELSE (95 * (lo.n - 1)) // 100 + 2 END
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(CAST(c.cents AS DECIMAL(38,0))) AS BIGINT) AS s_tail
      FROM c CROSS JOIN q WHERE c.cents >= q.q95
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_orders,
           round(CAST(q.q95 AS DOUBLE) / 100, 6) AS var_95,
           t.n_tail,
           round(CAST(t.s_tail AS DOUBLE) / nullif(t.n_tail, 0) / 100, 6)
             AS expected_shortfall_95
    FROM q CROSS JOIN t
    """,
)
def orders_value_at_risk_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-tail VaR / expected shortfall of order values (the
    Artzner-coherent ES at the 95% cut, applied to EXPOSURE: how big do
    the biggest orders run, and what is the MEAN order size once you
    are in that tail). VaR answers "the 95th-percentile order"; ES is
    the number fulfilment reserves against, because tail means -- not
    tail thresholds -- are what a heavy tail breaks
    (orders_pareto_tail_index fits the LAW; this prices the tail the
    law generates, with both numbers on the same exact-cents rails).

    Exactness: the 95% cut is the shared exact-interpolation closed
    form on the bounded cents DOMAIN; the tail mean is a
    DECIMAL(38,0)-accumulated integer sum over the >= threshold slice
    (ties at the threshold are included on both engines); two /100
    presentation divisions at 6dp.

    Scale: one cents-domain reduction, the domain-grain rank pass, and
    one broadcast-threshold conditional agg over the fact scan -- no
    global sort, no window over raw orders."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_TOTAL_C)
    c = o.select(cents.alias("cents")).filter(F.col("cents").isNotNull()).localCheckpoint(
        eager=False
    )  # percentile pass + tail agg consume it
    from .stats import exact_interp_pct_weighted

    cg = c.withColumn("g", F.lit(1))
    q = exact_interp_pct_weighted(cg, ["g"], "cents", 95).select(
        F.col("q_val").alias("q95")
    )
    t = c.crossJoin(F.broadcast(q)).filter(F.col("cents") >= F.col("q95")).agg(
        F.count("*").cast("bigint").alias("n_tail"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("s_tail"),
    )
    n = c.agg(F.count("*").cast("bigint").alias("n_orders"))
    return (
        n.crossJoin(q)
        .crossJoin(t)
        .select(
            "n_orders",
            F.round(F.col("q95").cast("double") / 100, 6).alias("var_95"),
            "n_tail",
            F.round(
                F.col("s_tail").cast("double")
                / F.nullif(F.col("n_tail").cast("double"), F.lit(0.0))
                / 100,
                6,
            ).alias("expected_shortfall_95"),
        )
    )


@register(
    "orders_revenue_drawdown_profile",
    tags=("warehouse", "timeseries"),
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL AND {_TOTAL_C} IS NOT NULL
      GROUP BY 1
    ),
    dd AS (
      SELECT day, cents,
             CAST(max(cents) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak,
             CAST(max(cents) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - cents AS BIGINT) AS draw
      FROM daily
    ),
    und AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(max(draw) AS BIGINT) AS max_dd,
             CAST(max(peak) AS BIGINT) AS peak_cents,
             CAST(sum(CASE WHEN draw > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_underwater
      FROM dd
    )
    SELECT n_days, n_underwater,
           round(CAST(peak_cents AS DOUBLE) / 100, 6) AS peak_daily_revenue,
           round(CAST(max_dd AS DOUBLE) / 100, 6) AS max_drawdown,
           round(CAST(max_dd AS DOUBLE) / nullif(peak_cents, 0), 6)
             AS max_drawdown_share,
           round(CAST(n_underwater AS DOUBLE) / n_days, 6) AS underwater_share
    FROM und
    """,
)
def orders_revenue_drawdown_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue drawdown profile (the max-drawdown staple applied to
    the revenue run-rate): running peak of daily revenue, the deepest
    peak-to-day drop (absolute and as a share of the peak), and the
    share of days spent below a prior peak. The demand-side health
    number trend monitoring reads next to orders_monthly_momentum: a
    growing business has small drawdowns and low underwater share; a
    deep max drawdown dates the demand shock
    events_changepoint_binary_seg then localizes.

    Exactness: daily revenue is exact DECIMAL-accumulated cents; the
    running peak and drawdowns are integer window arithmetic over the
    calendar-bounded day series; three presentation divisions at 6dp.

    Scale: one day-grain partial agg over the fact scan; the running-max
    window and the fold ride |days| rows. The unpartitioned running-peak
    window is the documented domain-bounded contract (a day spine is
    calendar-bounded); the SERIES_FOLD_MAX_POINTS guard on n_days below
    raises loudly if a fixture change ever turns the windowed relation
    fact-grain instead of silently single-partitioning it."""
    from .timeseries import _fold_capped_n

    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_TOTAL_C)
    daily = (
        o.filter(F.col("o_orderdate").isNotNull() & cents.isNotNull())
        .groupBy(F.date_trunc("day", "o_orderdate").cast("timestamp").alias("day"))
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("cents"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = daily.select(
        "cents",
        F.max("cents").over(w).cast("bigint").alias("peak"),
        (F.max("cents").over(w) - F.col("cents")).cast("bigint").alias("draw"),
    )
    und = dd.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("draw").cast("bigint").alias("max_dd"),
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.sum(F.when(F.col("draw") > 0, 1).otherwise(0)).cast("bigint").alias("n_underwater"),
    )
    return und.select(
        _fold_capped_n(F.col("n_days"), "orders_revenue_drawdown_profile")
        .cast("bigint")
        .alias("n_days"),
        "n_underwater",
        F.round(F.col("peak_cents").cast("double") / 100, 6).alias("peak_daily_revenue"),
        F.round(F.col("max_dd").cast("double") / 100, 6).alias("max_drawdown"),
        F.round(
            F.col("max_dd").cast("double") / F.nullif(F.col("peak_cents"), F.lit(0)), 6
        ).alias("max_drawdown_share"),
        F.round(F.col("n_underwater").cast("double") / F.col("n_days"), 6).alias(
            "underwater_share"
        ),
    )


@register(
    "supplier_hhi_trend_yearly",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH r AS (
      SELECT CAST(extract(year FROM l_shipdate) AS BIGINT) AS yr,
             l_suppkey,
             CAST(sum(CAST(try_cast(try_cast(l_extendedprice
                  AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0)))
                  AS BIGINT) AS cents
      FROM lineitem WHERE l_shipdate IS NOT NULL
      GROUP BY 1, 2
    ),
    h AS (
      SELECT yr,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
               AS sq
      FROM r GROUP BY yr
    )
    SELECT yr AS ship_year, n_suppliers,
           round(CAST(sq AS DOUBLE)
                 / (CAST(total_cents AS DOUBLE) * total_cents), 6) AS hhi,
           round(CAST(sq AS DOUBLE)
                 / (CAST(total_cents AS DOUBLE) * total_cents)
                 - lag(CAST(sq AS DOUBLE)
                       / (CAST(total_cents AS DOUBLE) * total_cents))
                   OVER (ORDER BY yr), 6) AS hhi_delta
    FROM h ORDER BY yr
    """,
)
def supplier_hhi_trend_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration trend: revenue HHI across the supplier base
    per ship year, with the year-over-year delta.
    supplier_revenue_hhi_by_nation is the geographic SNAPSHOT; this is
    the TREND the resilience program actually tracks -- a rising HHI
    says the supply base is consolidating (fewer suppliers carrying
    more revenue), the slow-motion version of the risk
    part_sourcing_redundancy_panel tiers at part grain.

    Exactness: per-(year, supplier) revenue accumulates in DECIMAL
    cents; the HHI's sum of squares accumulates in DECIMAL(38,0)
    (cents^2 exceeds BIGINT at warehouse scale); the share-of-squares
    closed form and its lag delta round once at 6dp -- the delta is a
    difference of identically-computed doubles, deterministic on both
    engines.

    Scale: one (year, supplier) partial agg over the fact scan, then a
    |years|-row panel with a calendar-bounded lag window."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    r = (
        li.filter(F.col("l_shipdate").isNotNull())
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("yr"),
            "l_suppkey",
        )
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("cents"))
    )
    h = r.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq"),
    )
    hhi = F.col("sq").cast("double") / (
        F.col("total_cents").cast("double") * F.col("total_cents")
    )
    w = Window.orderBy("ship_year")
    return (
        h.select(
            F.col("yr").alias("ship_year"),
            "n_suppliers",
            F.round(hhi, 6).alias("hhi"),
            hhi.alias("_h"),
        )
        .withColumn("hhi_delta", F.round(F.col("_h") - F.lag("_h").over(w), 6))
        .drop("_h")
        .orderBy("ship_year")
    )


@register(
    "orders_arpu_monthly",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
               AS month_start,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL AND {_TOTAL_C} IS NOT NULL
      GROUP BY 1
    )
    SELECT month_start, n_orders, n_customers,
           round(CAST(cents AS DOUBLE) / 100, 6) AS revenue,
           round(CAST(cents AS DOUBLE) / n_customers / 100, 6) AS arpu,
           round(CAST(cents AS DOUBLE) / n_orders / 100, 6) AS aov,
           round(CAST(n_orders AS DOUBLE) / n_customers, 6)
             AS orders_per_customer
    FROM m ORDER BY month_start
    """,
)
def orders_arpu_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue-efficiency scorecard: ARPU (revenue per active
    customer), AOV (average order value), and orders-per-customer --
    the three-way decomposition revenue = customers x orders/customer x
    AOV that says WHICH lever moved when orders_yearly_growth moves.
    The dashboard staple every monetization review opens with, at the
    month grain the cohort panels (customer_cohort_quality_decay)
    refine.

    Exactness: revenue accumulates in DECIMAL cents; active customers
    are exact distincts; four single divisions rounded at 6dp.

    Scale: ONE month-grain agg over the fact scan (the distinct
    customer count partial-aggregates per month); |months| rows out,
    no joins, no windows."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_TOTAL_C)
    m = (
        o.filter(F.col("o_orderdate").isNotNull() & cents.isNotNull())
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("timestamp").alias("month_start")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("cents"),
        )
    )
    return m.select(
        "month_start",
        "n_orders",
        "n_customers",
        F.round(F.col("cents").cast("double") / 100, 6).alias("revenue"),
        F.round(F.col("cents").cast("double") / F.col("n_customers") / 100, 6).alias(
            "arpu"
        ),
        F.round(F.col("cents").cast("double") / F.col("n_orders") / 100, 6).alias(
            "aov"
        ),
        F.round(
            F.col("n_orders").cast("double") / F.col("n_customers"), 6
        ).alias("orders_per_customer"),
    ).orderBy("month_start")


@register(
    "customer_nrr_monthly",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH cm AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
               + CAST(extract(month FROM o_orderdate) AS BIGINT) - 1 AS idx,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate IS NOT NULL AND {_TOTAL_C} IS NOT NULL
      GROUP BY 1, 2
    ),
    br AS (
      SELECT coalesce(c.idx, p.idx + 1) AS idx,
             CAST(sum(CASE WHEN p.o_custkey IS NOT NULL
                            AND c.o_custkey IS NOT NULL
                      THEN c.cents ELSE 0 END) AS BIGINT) AS retained_cents,
             CAST(sum(CASE WHEN p.o_custkey IS NULL
                      THEN c.cents ELSE 0 END) AS BIGINT) AS new_cents,
             CAST(sum(CASE WHEN c.o_custkey IS NULL
                      THEN p.cents ELSE 0 END) AS BIGINT) AS churned_cents,
             CAST(sum(CASE WHEN p.o_custkey IS NOT NULL
                            AND c.o_custkey IS NOT NULL
                            AND c.cents > p.cents
                      THEN c.cents - p.cents ELSE 0 END) AS BIGINT)
               AS expansion_cents,
             CAST(sum(CASE WHEN p.o_custkey IS NOT NULL
                            AND c.o_custkey IS NOT NULL
                            AND p.cents > c.cents
                      THEN p.cents - c.cents ELSE 0 END) AS BIGINT)
               AS contraction_cents,
             CAST(sum(CASE WHEN p.o_custkey IS NOT NULL
                            AND c.o_custkey IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN p.o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN c.o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_churned
      FROM cm p FULL OUTER JOIN cm c
        ON p.o_custkey = c.o_custkey AND p.idx + 1 = c.idx
      GROUP BY 1
    ),
    mt AS (SELECT idx, CAST(sum(cents) AS BIGINT) AS total_cents
           FROM cm GROUP BY idx)
    SELECT make_timestamp((br.idx // 12), (br.idx % 12) + 1, 1, 0, 0, 0)
             AS month_start,
           br.n_retained, br.n_new, br.n_churned,
           round(CAST(mt.total_cents AS DOUBLE) / 100, 6) AS prev_revenue,
           round(CAST(br.retained_cents AS DOUBLE) / 100, 6)
             AS retained_revenue,
           round(CAST(br.new_cents AS DOUBLE) / 100, 6) AS new_revenue,
           round(CAST(br.churned_cents AS DOUBLE) / 100, 6)
             AS churned_revenue,
           round(CAST(br.expansion_cents AS DOUBLE) / 100, 6)
             AS expansion_revenue,
           round(CAST(br.contraction_cents AS DOUBLE) / 100, 6)
             AS contraction_revenue,
           round(CAST(br.retained_cents AS DOUBLE) / mt.total_cents, 6)
             AS nrr
    FROM br JOIN mt ON mt.idx = br.idx - 1
    ORDER BY month_start
    """,
)
def customer_nrr_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly net-revenue-retention bridge: for each month with a prior
    month, last month's revenue decomposed into retained / churned, this
    month's into retained / new, and the retained slice further into
    expansion vs contraction per customer -- NRR = retained revenue this
    month from last month's customers / last month's total. The
    subscription-economics staple orders_arpu_monthly's levers feed
    into: ARPU says revenue-per-customer moved, NRR says whether the
    SAME customers grew or you papered over churn with acquisition.
    Count-based cohort retention (retention_cohorts,
    events_retention_matrix) tracks heads; this tracks dollars.

    Exactness: per-(customer, month) revenue accumulates in DECIMAL
    cents; the bridge cells are conditional integer sums over the
    consecutive-month FULL OUTER self-join; the month key is pure
    integer arithmetic (year*12 + month - 1, rebuilt with
    make_timestamp) so no engine date-addition semantics are involved;
    the identity retained = prev_total - churned + expansion -
    contraction holds EXACTLY in cents (pytest-pinned). One division
    per presented column.

    Scale: the self-join is custkey-co-partitioned (one shuffle of the
    (customer, month) rollup, which is already a huge reduction of the
    fact table); month totals reuse the same rollup; |months| rows
    out."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_TOTAL_C)
    idx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    cm = (
        o.filter(F.col("o_orderdate").isNotNull() & cents.isNotNull())
        .groupBy(F.col("o_custkey"), idx.alias("idx"))
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("cents"))
        .localCheckpoint(eager=False)  # three consumers: p, c, month totals
    )
    p = cm.select(
        F.col("o_custkey").alias("p_cust"),
        F.col("idx").alias("p_idx"),
        F.col("cents").alias("p_cents"),
    )
    c = cm.select(
        F.col("o_custkey").alias("c_cust"),
        F.col("idx").alias("c_idx"),
        F.col("cents").alias("c_cents"),
    )
    both = F.col("p_cust").isNotNull() & F.col("c_cust").isNotNull()
    br = (
        p.join(
            c,
            (F.col("p_cust") == F.col("c_cust"))
            & (F.col("p_idx") + 1 == F.col("c_idx")),
            "full_outer",
        )
        .groupBy(
            F.coalesce(F.col("c_idx"), F.col("p_idx") + 1).alias("idx")
        )
        .agg(
            F.sum(F.when(both, F.col("c_cents")).otherwise(0))
            .cast("bigint")
            .alias("retained_cents"),
            F.sum(F.when(F.col("p_cust").isNull(), F.col("c_cents")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(F.when(F.col("c_cust").isNull(), F.col("p_cents")).otherwise(0))
            .cast("bigint")
            .alias("churned_cents"),
            F.sum(
                F.when(
                    both & (F.col("c_cents") > F.col("p_cents")),
                    F.col("c_cents") - F.col("p_cents"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("expansion_cents"),
            F.sum(
                F.when(
                    both & (F.col("p_cents") > F.col("c_cents")),
                    F.col("p_cents") - F.col("c_cents"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("contraction_cents"),
            F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_retained"),
            F.sum(F.when(F.col("p_cust").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("c_cust").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_churned"),
        )
    )
    mt = cm.groupBy("idx").agg(
        F.sum("cents").cast("bigint").alias("total_cents")
    ).select(F.col("idx").alias("mt_idx"), "total_cents")
    return (
        br.join(mt, F.col("mt_idx") == F.col("idx") - 1)
        .select(
            F.expr(
                "make_timestamp(CAST(idx DIV 12 AS INT),"
                " CAST(idx % 12 + 1 AS INT), 1, 0, 0, 0)"
            ).alias("month_start"),
            "n_retained",
            "n_new",
            "n_churned",
            F.round(F.col("total_cents").cast("double") / 100, 6).alias(
                "prev_revenue"
            ),
            F.round(F.col("retained_cents").cast("double") / 100, 6).alias(
                "retained_revenue"
            ),
            F.round(F.col("new_cents").cast("double") / 100, 6).alias("new_revenue"),
            F.round(F.col("churned_cents").cast("double") / 100, 6).alias(
                "churned_revenue"
            ),
            F.round(F.col("expansion_cents").cast("double") / 100, 6).alias(
                "expansion_revenue"
            ),
            F.round(F.col("contraction_cents").cast("double") / 100, 6).alias(
                "contraction_revenue"
            ),
            F.round(
                F.col("retained_cents").cast("double") / F.col("total_cents"), 6
            ).alias("nrr"),
        )
        .orderBy("month_start")
    )




# Wilson z for 95% two-sided lower bounds; z^2 written as the exact
# decimal both engines parse identically (3.8416 = 1.96^2). The ship SLA
# that defines "on time" below: a line is on time when it ships within
# 30 days of its order's placement.
_WILSON_Z = "1.96"
_WILSON_Z2 = "3.8416"
ONTIME_SHIP_DAYS = 30
# One shared expression TEXT for the Wilson lower bound, evaluated over
# exact-integer (n_ontime, n_lines): both engines execute the identical
# IEEE double expression tree, so the raw doubles agree bit-for-bit and
# the 6dp round is tie-free in practice (sqrt outputs never land on
# exact decimal halves).
_WILSON_LB = (
    f"((CAST(n_ontime AS DOUBLE) / n_lines) + {_WILSON_Z2} / (2 * n_lines)"
    f" - {_WILSON_Z} * sqrt(((CAST(n_ontime AS DOUBLE) / n_lines)"
    f" * (1 - (CAST(n_ontime AS DOUBLE) / n_lines)) + {_WILSON_Z2}"
    f" / (4.0 * n_lines)))"
    f" / sqrt(CAST(n_lines AS DOUBLE)))"
    f" / (1 + {_WILSON_Z2} / n_lines)"
)


@register(
    "supplier_ontime_wilson_ranking",
    tags=("warehouse", "monitor"),
    oracle=f"""
    WITH s AS (
      SELECT l.l_suppkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                                <= {ONTIME_SHIP_DAYS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
      GROUP BY l.l_suppkey
    ),
    w AS (
      SELECT l_suppkey, n_lines, n_ontime,
             round(CAST(n_ontime AS DOUBLE) / n_lines, 6) AS ontime_rate,
             round({_WILSON_LB}, 6) AS wilson_lb
      FROM s WHERE n_lines >= 20
    )
    SELECT sup.s_suppkey, sup.s_name, w.n_lines, w.n_ontime,
           w.ontime_rate, w.wilson_lb
    FROM w JOIN supplier sup ON sup.s_suppkey = w.l_suppkey
    ORDER BY w.wilson_lb DESC, sup.s_suppkey LIMIT 25
    """,
)
def supplier_ontime_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier on-time-shipment league table ranked by the Wilson-score
    LOWER BOUND of the on-time rate (shipped within the 30-day
    ONTIME_SHIP_DAYS SLA of order placement), not the raw rate: a supplier with 19/20 on
    time must NOT outrank one with 940/1000 -- the small-sample
    correction every ranking-by-proportion needs (the "how not to sort
    by average rating" staple). Minimum 20 lines to enter; top 25 by
    lower bound. supplier_ship_latency_profile shows each supplier's
    latency DISTRIBUTION; this turns one SLA cut of it into a
    statistically honest ranking.

    Exactness: (on-time, total) counts are exact integers off calendar-
    day arithmetic; the Wilson bound evaluates ONE shared double
    expression text on both engines (identical IEEE tree => identical
    doubles), rounded once at 6dp and ordered by the ROUNDED value with
    a suppkey tiebreak so the top-25 cut is engine-stable.

    Scale: one orderkey-co-partitioned fact-fact join (lineitem x
    orders, both orderkey-keyed), suppkey-grain partial agg, a broadcast
    dim join for the name, TakeOrderedAndProject(25) -- no global
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    s = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate").isNotNull() & F.col("o_orderdate").isNotNull())
        .groupBy("l_suppkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(
                F.when(
                    F.datediff("l_shipdate", "o_orderdate") <= ONTIME_SHIP_DAYS, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ontime"),
        )
        .filter(F.col("n_lines") >= 20)
    )
    w = s.select(
        "l_suppkey",
        "n_lines",
        "n_ontime",
        F.round(F.col("n_ontime").cast("double") / F.col("n_lines"), 6).alias(
            "ontime_rate"
        ),
        F.round(F.expr(_WILSON_LB), 6).alias("wilson_lb"),
    )
    return (
        w.join(F.broadcast(sup), sup["s_suppkey"] == w["l_suppkey"])
        .select("s_suppkey", "s_name", "n_lines", "n_ontime", "ontime_rate", "wilson_lb")
        .orderBy(F.col("wilson_lb").desc(), "s_suppkey")
        .limit(25)
    )


@register(
    "orders_shipment_split_profile",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
               AS month_start,
             CAST(date_diff('day', min(l.l_shipdate), max(l.l_shipdate))
               AS BIGINT) AS span_days,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, date_trunc('month', o.o_orderdate)
    ),
    agg AS (
      SELECT month_start,
             CAST(count(*) AS BIGINT) AS n_orders,
             round(CAST(sum(CASE WHEN span_days = 0 THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*), 6) AS single_window_share,
             round(CAST(sum(span_days) AS DOUBLE) / count(*), 6)
               AS mean_span_days,
             CAST(max(span_days) AS BIGINT) AS max_span_days
      FROM per_order GROUP BY month_start
    ),
    rk AS (
      SELECT month_start, span_days,
             CAST(row_number() OVER (PARTITION BY month_start
                  ORDER BY span_days) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY month_start) AS BIGINT) AS n
      FROM per_order
    ),
    q90 AS (
      SELECT lo.month_start,
             (100 * lo.span_days
              + ((90 * (lo.n - 1)) % 100) * (hi.span_days - lo.span_days))
               // 100 AS p90
      FROM rk lo JOIN rk hi
        ON lo.month_start = hi.month_start
       AND lo.rn = (90 * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN (90 * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT agg.month_start, agg.n_orders, agg.single_window_share,
           agg.mean_span_days, CAST(q90.p90 AS BIGINT) AS p90_span_days,
           agg.max_span_days
    FROM agg JOIN q90 ON q90.month_start = agg.month_start
    ORDER BY agg.month_start
    """,
)
def orders_shipment_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipment-consolidation panel: per order, the SPAN in days between
    its first and last line shipment (0 = the whole order left in one
    window), rolled up per order month -- single-window share, mean and
    exact-interpolated p90 span, worst span. The split-shipment cost
    monitor: orders_completion_curve_weekly times order COMPLETION
    against placement; this measures how FRAGMENTED the fulfillment was
    once it started, which is what consolidation programs (fewer boxes
    per order) move.

    Exactness: span is integer calendar days off an exact min/max per
    order; shares and means are integer sums with one division at 6dp;
    p90 uses the shared exact_interp_pct rational closed form (the
    cdc_gap_heatmap rule).

    Scale: ONE orderkey-co-partitioned fact-fact join reduced to order
    grain, then a month-grain partial agg; the rank window partitions by
    month (calendar-bounded); |months| rows out."""
    from .stats import exact_interp_pct

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .groupBy(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").cast("timestamp").alias(
                "month_start"
            ),
        )
        .agg(
            F.datediff(F.max("l_shipdate"), F.min("l_shipdate"))
            .cast("bigint")
            .alias("span_days")
        )
        .localCheckpoint(eager=False)  # agg + percentile consumers
    )
    agg = per_order.groupBy("month_start").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(
            F.sum(F.when(F.col("span_days") == 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("single_window_share"),
        F.round(F.sum("span_days").cast("double") / F.count("*"), 6).alias(
            "mean_span_days"
        ),
        F.max("span_days").cast("bigint").alias("max_span_days"),
    )
    q90 = exact_interp_pct(per_order, ["month_start"], "span_days", 90).select(
        F.col("month_start").alias("m90"), F.col("q_val").alias("p90_span_days")
    )
    return (
        agg.join(q90, F.col("m90") == F.col("month_start"))
        .select(
            "month_start",
            "n_orders",
            "single_window_share",
            "mean_span_days",
            F.col("p90_span_days").cast("bigint"),
            "max_span_days",
        )
        .orderBy("month_start")
    )


@register(
    "part_type_facet_decomposition",
    tags=("warehouse",),
    oracle="""
    WITH f AS (
      SELECT CAST(g.pos AS BIGINT) AS facet_pos,
             split_part(p_type, ' ', CAST(g.pos AS INT)) AS facet_value,
             p_retailprice
      FROM part
      CROSS JOIN (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS pos) g
      WHERE p_type IS NOT NULL
    ),
    tot AS (
      SELECT facet_pos, CAST(count(*) AS BIGINT) AS n_total
      FROM f GROUP BY facet_pos
    )
    SELECT f.facet_pos, f.facet_value,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(count(*) AS DOUBLE) / tot.n_total, 6) AS facet_share,
           round(CAST(sum(CAST(try_cast(try_cast(f.p_retailprice
                 AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0)))
                 AS DOUBLE) / count(*) / 100, 6) AS avg_retail_price
    FROM f JOIN tot ON tot.facet_pos = f.facet_pos
    GROUP BY f.facet_pos, f.facet_value, tot.n_total
    ORDER BY f.facet_pos, f.facet_value
    """,
)
def part_type_facet_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-attribute facet decomposition: p_type is a 3-token
    composite ('STANDARD ANODIZED BRASS' = grade / finish / material);
    this splits it into its positional facets and profiles each value --
    part counts, within-facet share, exact-cents average retail price.
    The dimensional-modeling staple for composite codes (the attribute
    should have been 3 columns; this query makes it 3 columns), and the
    catalog view part_type_brand_diversity's entropy numbers summarize.

    Exactness: split_part is the identical tokenizer on both engines;
    counts are integers; prices accumulate in DECIMAL cents with one
    division at 6dp.

    Scale: a x3 positional explode of the part DIM (never the fact
    table), one facet-grain partial agg; the per-facet totals ride the
    same reduced relation via a broadcast join."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").isNotNull())
    f = p.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("facet_pos"),
        "p_type",
        "p_retailprice",
    ).select(
        F.col("facet_pos").cast("bigint").alias("facet_pos"),
        F.expr("split_part(p_type, ' ', CAST(facet_pos AS INT))").alias(
            "facet_value"
        ),
        F.expr(
            "try_cast(try_cast(p_retailprice AS decimal(18,2)) * 100 AS bigint)"
        ).alias("cents"),
    )
    agg = f.groupBy("facet_pos", "facet_value").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents_sum"),
    )
    tot = agg.groupBy(F.col("facet_pos").alias("t_pos")).agg(
        F.sum("n_parts").cast("bigint").alias("n_total")
    )
    return (
        agg.join(F.broadcast(tot), F.col("t_pos") == F.col("facet_pos"))
        .select(
            "facet_pos",
            "facet_value",
            "n_parts",
            F.round(F.col("n_parts").cast("double") / F.col("n_total"), 6).alias(
                "facet_share"
            ),
            F.round(
                F.col("cents_sum").cast("double") / F.col("n_parts") / 100, 6
            ).alias("avg_retail_price"),
        )
        .orderBy("facet_pos", "facet_value")
    )


@register(
    "orders_revenue_calendar_heatmap",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH cell AS (
      SELECT CAST(extract(month FROM o_orderdate) AS BIGINT) AS month,
             CAST(dayofweek(o_orderdate) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL AND {_TOTAL_C} IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
             CAST(sum(cents) AS BIGINT) AS tc
      FROM cell
    )
    SELECT cell.month, cell.dw, cell.n_orders,
           round(CAST(cell.cents AS DOUBLE) / 100, 6) AS revenue,
           round(CAST(cell.cents AS DOUBLE) / tot.tc, 6) AS revenue_share,
           round((CAST(cell.cents AS DOUBLE) / cell.n_orders)
                 / (CAST(tot.tc AS DOUBLE) / tot.tn), 6) AS aov_index
    FROM cell CROSS JOIN tot
    ORDER BY cell.month, cell.dw
    """,
)
def orders_revenue_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue calendar heatmap: the (month-of-year x day-of-week) grid
    of order counts, revenue, revenue share, and the AOV INDEX -- each
    cell's average order value relative to the global AOV. The
    seasonality read merchandising actually uses (do weekend December
    orders run bigger or just more numerous?); events_hourly_heatmap
    grids traffic volume, this grids money and basket size.
    orders_seasonal_index is the month-only marginal.

    Exactness: cents accumulate in DECIMAL; the AOV index is a ratio of
    identically-computed doubles, rounded once at 6dp. dw uses the
    shared 0=Sunday DuckDB convention.

    Scale: ONE (month, dw)-grain partial agg over the fact scan (84
    cells max); totals ride the reduced grid via a broadcast 1-row
    cross join."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_TOTAL_C)
    cell = (
        o.filter(F.col("o_orderdate").isNotNull() & cents.isNotNull())
        .groupBy(
            F.month("o_orderdate").cast("bigint").alias("month"),
            (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("cents"),
        )
        .localCheckpoint(eager=False)  # grid + totals consumers
    )
    tot = cell.agg(
        F.sum("n_orders").cast("bigint").alias("tn"),
        F.sum("cents").cast("bigint").alias("tc"),
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "month",
            "dw",
            "n_orders",
            F.round(F.col("cents").cast("double") / 100, 6).alias("revenue"),
            F.round(F.col("cents").cast("double") / F.col("tc"), 6).alias(
                "revenue_share"
            ),
            F.round(
                (F.col("cents").cast("double") / F.col("n_orders"))
                / (F.col("tc").cast("double") / F.col("tn")),
                6,
            ).alias("aov_index"),
        )
        .orderBy("month", "dw")
    )


@register(
    "orders_little_law_check",
    tags=("warehouse", "monitor", "timeseries"),
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS a,
             greatest(CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP),
                      CAST(date_trunc('day', max(l.l_shipdate)) AS TIMESTAMP))
               AS c
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    arr AS (
      SELECT CAST(date_trunc('month', a) AS TIMESTAMP) AS month_start,
             CAST(count(*) AS BIGINT) AS n_arrivals,
             CAST(sum(date_diff('day', a, c)) AS BIGINT) AS cycle_days_sum
      FROM spans GROUP BY 1
    ),
    deltas AS (
      SELECT a AS day, 1 AS d FROM spans
      UNION ALL SELECT c, -1 FROM spans
    ),
    daily AS (SELECT day, CAST(sum(d) AS BIGINT) AS d FROM deltas GROUP BY day),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
               AS TIMESTAMP) AS day FROM b
    ),
    run AS (
      SELECT spine.day,
             CAST(sum(coalesce(daily.d, 0)) OVER (ORDER BY spine.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS backlog
      FROM spine LEFT JOIN daily ON daily.day = spine.day
    ),
    lmon AS (
      SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month_start,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(backlog) AS BIGINT) AS backlog_sum
      FROM run GROUP BY 1
    )
    SELECT arr.month_start, arr.n_arrivals, lmon.n_days,
           round(CAST(arr.n_arrivals AS DOUBLE) / lmon.n_days, 6)
             AS lambda_per_day,
           round(CAST(arr.cycle_days_sum AS DOUBLE) / arr.n_arrivals, 6)
             AS mean_cycle_days,
           round(CAST(lmon.backlog_sum AS DOUBLE) / lmon.n_days, 6)
             AS avg_backlog,
           round((CAST(lmon.backlog_sum AS DOUBLE) / lmon.n_days)
                 / nullif((CAST(arr.n_arrivals AS DOUBLE) / lmon.n_days)
                          * (CAST(arr.cycle_days_sum AS DOUBLE)
                             / arr.n_arrivals), 0), 6) AS littles_ratio
    FROM arr JOIN lmon ON lmon.month_start = arr.month_start
    ORDER BY arr.month_start
    """,
)
def orders_little_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law consistency panel (L = lambda W) per arrival month:
    average open backlog (L, from the dense-day sweep-line), arrival
    rate per day (lambda), mean order cycle time in days (W), and the
    ratio L / (lambda W). In steady state the ratio is 1 by THEOREM
    (Little 1961, distribution-free); sustained drift from 1 means the
    system is filling or draining -- the one-number flow-health check
    that ties orders_open_backlog_daily (L's curve),
    orders_completion_curve_weekly (W's distribution), and the arrival
    panels together. Edge months are partial by construction; the ratio
    is a diagnostic, not an invariant, there.

    Exactness: the sweep-line backlog is integer (+1 at arrival day, -1
    at close day, prefix sum over the dense calendar spine -- zero-fill
    via LEFT join so empty days carry the running value); cycle sums
    are integer calendar days; each presented column divides once at
    6dp, and the ratio divides identically-computed doubles.

    Scale: one orderkey-co-partitioned fact-fact reduction to order
    grain; deltas partial-agg to |days| rows before the single
    calendar-bounded prefix-sum window; |months| rows out."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_trunc("day", "o_orderdate").cast("timestamp").alias("a"),
            F.greatest(
                F.date_trunc("day", "o_orderdate").cast("timestamp"),
                F.date_trunc("day", "last_ship").cast("timestamp"),
            ).alias("c"),
        )
        .localCheckpoint(eager=False)  # arrival stats + two delta consumers
    )
    arr = spans.groupBy(
        F.date_trunc("month", "a").cast("timestamp").alias("month_start")
    ).agg(
        F.count("*").cast("bigint").alias("n_arrivals"),
        F.sum(F.datediff("c", "a")).cast("bigint").alias("cycle_days_sum"),
    )
    deltas = spans.select(F.col("a").alias("day"), F.lit(1).alias("d")).unionAll(
        spans.select(F.col("c").alias("day"), F.lit(-1).alias("d"))
    )
    daily = (
        deltas.groupBy("day")
        .agg(F.sum("d").cast("bigint").alias("d"))
        .localCheckpoint(eager=False)  # bounds fence + spine join
    )
    b = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("sday")
    )
    w = Window.orderBy("sday").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = (
        spine.join(daily, F.col("day") == F.col("sday"), "left")
        .select("sday", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
        .select("sday", F.sum("d").over(w).cast("bigint").alias("backlog"))
    )
    lmon = run.groupBy(
        F.date_trunc("month", "sday").cast("timestamp").alias("l_month")
    ).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("backlog").cast("bigint").alias("backlog_sum"),
    )
    lam = F.col("n_arrivals").cast("double") / F.col("n_days")
    wbar = F.col("cycle_days_sum").cast("double") / F.col("n_arrivals")
    lbar = F.col("backlog_sum").cast("double") / F.col("n_days")
    return (
        arr.join(lmon, F.col("l_month") == F.col("month_start"))
        .select(
            "month_start",
            "n_arrivals",
            "n_days",
            F.round(lam, 6).alias("lambda_per_day"),
            F.round(wbar, 6).alias("mean_cycle_days"),
            F.round(lbar, 6).alias("avg_backlog"),
            F.round(lbar / F.nullif(lam * wbar, F.lit(0.0)), 6).alias(
                "littles_ratio"
            ),
        )
        .orderBy("month_start")
    )


# Constant cost assumptions for the EOQ panel, documented in the
# docstring: ordering cost per purchase order, and annual holding cost
# as a fraction of unit price.
EOQ_ORDER_COST = 100.0
EOQ_HOLDING_RATE = 0.2


@register(
    "lineitem_eoq_panel",
    tags=("warehouse",),
    oracle=f"""
    WITH yr AS (
      SELECT CAST(count(DISTINCT extract(year FROM l_shipdate)) AS BIGINT)
               AS n_years
      FROM lineitem WHERE l_shipdate IS NOT NULL AND l_quantity > 0
    ),
    d AS (
      SELECT p.p_brand,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty,
             CAST(sum(CAST(try_cast(try_cast(l.l_extendedprice
                  AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0)))
               AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL AND l.l_quantity > 0
      GROUP BY p.p_brand
    )
    SELECT d.p_brand, d.n_lines,
           round(d.total_qty / yr.n_years, 6) AS annual_demand,
           round((CAST(d.cents AS DOUBLE) / 100) / d.total_qty, 6)
             AS avg_unit_price,
           round(sqrt(2 * (d.total_qty / yr.n_years) * {EOQ_ORDER_COST}
                      / ({EOQ_HOLDING_RATE}
                         * ((CAST(d.cents AS DOUBLE) / 100) / d.total_qty))),
                 6) AS eoq_units,
           round((d.total_qty / yr.n_years)
                 / sqrt(2 * (d.total_qty / yr.n_years) * {EOQ_ORDER_COST}
                        / ({EOQ_HOLDING_RATE}
                           * ((CAST(d.cents AS DOUBLE) / 100)
                              / d.total_qty))), 6) AS orders_per_year
    FROM d CROSS JOIN yr
    ORDER BY d.p_brand
    """,
)
def lineitem_eoq_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic-order-quantity panel per brand (Harris 1913, the
    inventory-theory staple): EOQ = sqrt(2 D S / H) with annual demand D
    from observed shipments, ordering cost S = 100 (EOQ_ORDER_COST) and
    holding cost H = 20% of the observed average unit price per year
    (EOQ_HOLDING_RATE) -- the assumptions are constants ON PURPOSE (the
    panel's value is the RELATIVE ordering cadence across brands, and
    deployments override the two constants). Completes the inventory
    family: part_abc_xyz_matrix segments by value/variability, the
    dead-stock panel flags what not to reorder, this says HOW MUCH to
    reorder per cycle.

    Exactness: demand accumulates in DECIMAL quantities, revenue in
    DECIMAL cents; the EOQ evaluates one shared IEEE expression text on
    identical inputs, rounded once at 6dp.

    Scale: one brand-grain partial agg over the fact scan with a
    broadcast part join; the year count is a 1-row fence; |brands| rows
    out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull() & (F.col("l_quantity") > 0)
    )
    p = load_table(spark, sf_dir, "part")
    yr = li.agg(
        F.countDistinct(F.year("l_shipdate")).cast("bigint").alias("n_years")
    )
    d = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.sum(
                F.expr(
                    "try_cast(try_cast(l_extendedprice AS decimal(18,2))"
                    " * 100 AS bigint)"
                ).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("cents"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )
    dem = F.col("total_qty") / F.col("n_years")
    price = (F.col("cents").cast("double") / 100) / F.col("total_qty")
    eoq = F.sqrt(2 * dem * EOQ_ORDER_COST / (EOQ_HOLDING_RATE * price))
    return (
        d.crossJoin(F.broadcast(yr))
        .select(
            "p_brand",
            "n_lines",
            F.round(dem, 6).alias("annual_demand"),
            F.round(price, 6).alias("avg_unit_price"),
            F.round(eoq, 6).alias("eoq_units"),
            F.round(dem / eoq, 6).alias("orders_per_year"),
        )
        .orderBy("p_brand")
    )


@register(
    "part_demand_intermittency_profile",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH cal AS (
      SELECT CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT)
               AS months_total
      FROM lineitem WHERE l_shipdate IS NOT NULL
    ),
    pm AS (
      SELECT l_partkey,
             CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS m,
             CAST(sum(CAST(try_cast(try_cast(l_quantity AS DECIMAL(18,2))
                  * 100 AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS q
      FROM lineitem WHERE l_shipdate IS NOT NULL
      GROUP BY 1, 2 HAVING sum(l_quantity) > 0
    ),
    st AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_demand,
             CAST(sum(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS s2
      FROM pm GROUP BY 1 HAVING count(*) >= 2
    ),
    cls AS (
      SELECT st.l_partkey,
             CAST(cal.months_total AS DOUBLE) / st.n_demand AS adi,
             CAST(round((CAST(st.n_demand AS DOUBLE) * st.s2 - st.s1 * st.s1)
                  / (CAST(st.s1 AS DOUBLE) * st.s1), 6) AS DECIMAL(18,6))
               AS cv2,
             -- EXACT integer quadrant cuts: 100*T >= 132*n  <=>  ADI >= 1.32
             -- and 100*(n*s2 - s1^2) >= 49*s1^2  <=>  CV^2 >= 0.49
             CASE WHEN 100 * cal.months_total >= 132 * st.n_demand THEN 1
                  ELSE 0 END AS hi_adi,
             CASE WHEN 100 * (st.n_demand * st.s2 - st.s1 * st.s1)
                       >= 49 * (st.s1 * st.s1) THEN 1 ELSE 0 END AS hi_cv
      FROM st CROSS JOIN cal
    ),
    quad AS (
      SELECT CASE WHEN hi_adi = 0 AND hi_cv = 0 THEN 'smooth'
                  WHEN hi_adi = 1 AND hi_cv = 0 THEN 'intermittent'
                  WHEN hi_adi = 0 AND hi_cv = 1 THEN 'erratic'
                  ELSE 'lumpy' END AS quadrant,
             adi, cv2
      FROM cls
    ),
    spine AS (
      SELECT * FROM (VALUES ('smooth'), ('intermittent'),
                            ('erratic'), ('lumpy')) s(quadrant)
    ),
    agg AS (
      SELECT quadrant, CAST(count(*) AS BIGINT) AS n_parts,
             round(CAST(avg(CAST(round(adi, 6) AS DECIMAL(18,6)))
                   AS DOUBLE), 6) AS mean_adi,
             round(CAST(avg(cv2) AS DOUBLE), 6) AS mean_cv2
      FROM quad GROUP BY quadrant
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM quad)
    SELECT spine.quadrant,
           CAST(coalesce(agg.n_parts, 0) AS BIGINT) AS n_parts,
           round(CAST(coalesce(agg.n_parts, 0) AS DOUBLE) / tot.n, 6)
             AS part_share,
           agg.mean_adi, agg.mean_cv2
    FROM spine LEFT JOIN agg ON agg.quadrant = spine.quadrant
    CROSS JOIN tot
    ORDER BY spine.quadrant
    """,
)
def part_demand_intermittency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand-classification census (Syntetos, Boylan &
    Croston 2005): every part with >= 2 demand months lands in one of
    the four forecastability quadrants -- smooth / intermittent (sparse
    arrivals) / erratic (wild sizes) / lumpy (both) -- by the canonical
    ADI = 1.32 and CV^2 = 0.49 cuts. The demand-planning triage that
    says WHICH forecaster each part deserves (smooth -> the Holt/theta
    family; intermittent/lumpy -> Croston-class methods) and the
    demand-side companion to lineitem_eoq_panel's order sizing and
    part_abc_xyz_matrix's value segmentation.

    Exactness: the quadrant cuts are EXACT integer comparisons -- ADI >=
    1.32 as 100*months_total >= 132*n_demand, CV^2 >= 0.49 cross-
    multiplied as 100*(n*s2 - s1^2) >= 49*s1^2 over DECIMAL(38,0)
    centi-quantity sums -- so no part can flip quadrants on an engine's
    ulp; the presented mean ADI/CV^2 snap to 6dp before order-free
    means; the 4-row spine zero-fills empty quadrants.

    Scale: one (part, month)-grain partial agg over the fact scan, one
    part-grain moment reduction, a 1-row calendar fence, 4 rows out."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    cal = li.agg(
        F.countDistinct(F.date_trunc("month", "l_shipdate"))
        .cast("bigint")
        .alias("months_total")
    )
    pm = (
        li.groupBy(
            "l_partkey",
            F.date_trunc("month", "l_shipdate").cast("timestamp").alias("m"),
        )
        .agg(
            F.sum(
                F.expr(
                    "try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)"
                ).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("q"),
            F.sum("l_quantity").alias("raw_q"),
        )
        .filter(F.col("raw_q") > 0)
    )
    st = (
        pm.groupBy("l_partkey")
        .agg(
            F.count("*").cast("bigint").alias("n_demand"),
            F.sum(F.col("q").cast("decimal(38,0)")).alias("s1"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("s2"),
        )
        .filter(F.col("n_demand") >= 2)
    )
    cls = st.crossJoin(F.broadcast(cal)).select(
        (F.col("months_total").cast("double") / F.col("n_demand")).alias("adi"),
        F.round(
            (F.col("n_demand").cast("double") * F.col("s2").cast("double")
             - F.col("s1").cast("double") * F.col("s1").cast("double"))
            / (F.col("s1").cast("double") * F.col("s1").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("cv2"),
        F.when(100 * F.col("months_total") >= 132 * F.col("n_demand"), 1)
        .otherwise(0)
        .alias("hi_adi"),
        F.when(
            100
            * (
                F.col("n_demand") * F.col("s2")
                - F.col("s1") * F.col("s1")
            )
            >= 49 * (F.col("s1") * F.col("s1")),
            1,
        )
        .otherwise(0)
        .alias("hi_cv"),
    )
    quad = cls.select(
        F.when((F.col("hi_adi") == 0) & (F.col("hi_cv") == 0), F.lit("smooth"))
        .when((F.col("hi_adi") == 1) & (F.col("hi_cv") == 0), F.lit("intermittent"))
        .when((F.col("hi_adi") == 0) & (F.col("hi_cv") == 1), F.lit("erratic"))
        .otherwise(F.lit("lumpy"))
        .alias("quadrant"),
        "adi",
        "cv2",
    ).localCheckpoint(eager=False)  # census + total consumers
    agg = quad.groupBy("quadrant").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.round(
            F.avg(F.round(F.col("adi"), 6).cast("decimal(18,6)")).cast("double"), 6
        ).alias("mean_adi"),
        F.round(F.avg("cv2").cast("double"), 6).alias("mean_cv2"),
    )
    tot = quad.agg(F.count("*").cast("bigint").alias("n"))
    spine = spark.createDataFrame(
        [("smooth",), ("intermittent",), ("erratic",), ("lumpy",)],
        "quadrant string",
    )
    return (
        spine.join(F.broadcast(agg), "quadrant", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "quadrant",
            F.coalesce(F.col("n_parts"), F.lit(0)).cast("bigint").alias("n_parts"),
            F.round(
                F.coalesce(F.col("n_parts"), F.lit(0)).cast("double") / F.col("n"), 6
            ).alias("part_share"),
            "mean_adi",
            "mean_cv2",
        )
        .orderBy("quadrant")
    )


@register(
    "customer_growth_accounting_monthly",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH cm AS (
      SELECT DISTINCT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
               + CAST(extract(month FROM o_orderdate) AS BIGINT) - 1 AS idx
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    fm AS (
      SELECT o_custkey, CAST(min(idx) AS BIGINT) AS first_idx
      FROM cm GROUP BY 1
    ),
    tagged AS (
      SELECT c.idx, c.o_custkey,
             CASE WHEN c.idx = f.first_idx THEN 'new'
                  WHEN p.o_custkey IS NOT NULL THEN 'retained'
                  ELSE 'reactivated' END AS state
      FROM cm c
      JOIN fm f ON f.o_custkey = c.o_custkey
      LEFT JOIN cm p ON p.o_custkey = c.o_custkey AND p.idx = c.idx - 1
    ),
    churn AS (
      SELECT p.idx + 1 AS idx, CAST(count(*) AS BIGINT) AS n_churned
      FROM cm p LEFT JOIN cm c
        ON c.o_custkey = p.o_custkey AND c.idx = p.idx + 1
      WHERE c.o_custkey IS NULL
      GROUP BY 1
    ),
    act AS (
      SELECT idx,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN state = 'reactivated' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_reactivated
      FROM tagged GROUP BY idx
    )
    SELECT make_timestamp((act.idx // 12), (act.idx % 12) + 1, 1, 0, 0, 0)
             AS month_start,
           act.n_active, act.n_new, act.n_retained, act.n_reactivated,
           CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned,
           round(CAST(act.n_retained AS DOUBLE)
                 / nullif(lag(act.n_active) OVER (ORDER BY act.idx), 0), 6)
             AS retention_rate
    FROM act LEFT JOIN churn ON churn.idx = act.idx
    ORDER BY month_start
    """,
)
def customer_growth_accounting_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly customer growth accounting (the Social Capital framework):
    every month's active customers decomposed into new (first month
    ever) / retained (active last month) / reactivated (active before,
    lapsed, back now), plus the churn OUT of last month's actives and
    the month-over-month retention rate. The COUNT bridge whose revenue
    twin is customer_nrr_monthly: NRR's n_new conflates truly-new with
    reactivated -- this panel is where win-back programs read their
    number. The identity active = new + retained + reactivated holds by
    construction (the three states partition the active set), and the
    FLOW identity active = prev_active - churned + new + reactivated
    follows from retained = prev_active - churned; both are pytest-
    pinned.

    Exactness: pure integer counting over the distinct (customer, month)
    relation with the integer month index (no engine date addition); the
    retention division rounds once at 6dp.

    Scale: cm reduces the fact table to distinct (customer, month); the
    first-month, previous-month, and churn joins are all custkey-co-
    partitioned over that rollup; |months| rows out."""
    o = load_table(spark, sf_dir, "orders")
    idx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    cm = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", idx.alias("idx"))
        .distinct()
        .localCheckpoint(eager=False)  # first/prev/churn consumers
    )
    fm = cm.groupBy("o_custkey").agg(F.min("idx").cast("bigint").alias("first_idx"))
    p = cm.select(F.col("o_custkey").alias("p_cust"), F.col("idx").alias("p_idx"))
    tagged = (
        cm.join(fm, "o_custkey")
        .join(
            p,
            (F.col("p_cust") == F.col("o_custkey"))
            & (F.col("p_idx") == F.col("idx") - 1),
            "left",
        )
        .select(
            "idx",
            F.when(F.col("idx") == F.col("first_idx"), F.lit("new"))
            .when(F.col("p_cust").isNotNull(), F.lit("retained"))
            .otherwise(F.lit("reactivated"))
            .alias("state"),
        )
    )
    c2 = cm.select(F.col("o_custkey").alias("c_cust"), F.col("idx").alias("c_idx"))
    churn = (
        cm.join(
            c2,
            (F.col("c_cust") == F.col("o_custkey"))
            & (F.col("c_idx") == F.col("idx") + 1),
            "left_anti",
        )
        .groupBy((F.col("idx") + 1).alias("ch_idx"))
        .agg(F.count("*").cast("bigint").alias("n_churned"))
    )
    act = tagged.groupBy("idx").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when(F.col("state") == "reactivated", 1).otherwise(0))
        .cast("bigint")
        .alias("n_reactivated"),
    )
    w = Window.orderBy("idx")
    return (
        act.join(churn, F.col("ch_idx") == F.col("idx"), "left")
        .withColumn("n_churned", F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint"))
        .withColumn("prev_active", F.lag("n_active").over(w))
        .select(
            F.expr(
                "make_timestamp(CAST(idx DIV 12 AS INT),"
                " CAST(idx % 12 + 1 AS INT), 1, 0, 0, 0)"
            ).alias("month_start"),
            "n_active",
            "n_new",
            "n_retained",
            "n_reactivated",
            "n_churned",
            F.round(
                F.col("n_retained").cast("double")
                / F.nullif(F.col("prev_active"), F.lit(0)),
                6,
            ).alias("retention_rate"),
        )
        .orderBy("month_start")
    )


@register(
    "orders_cohort_revenue_runoff",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH cm AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
               + CAST(extract(month FROM o_orderdate) AS BIGINT) - 1 AS idx,
             CAST(sum(try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS DECIMAL(38,0)) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    coh AS (
      SELECT o_custkey, CAST(min(idx) AS BIGINT) AS cohort_idx
      FROM cm GROUP BY 1
    ),
    mx AS (SELECT CAST(max(idx) AS BIGINT) AS max_idx FROM cm),
    incr AS (
      SELECT c.cohort_idx, cm.idx - c.cohort_idx AS age,
             CAST(sum(cm.cents) AS DECIMAL(38,0)) AS inc_cents
      FROM cm JOIN coh c ON c.o_custkey = cm.o_custkey
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT DISTINCT c.cohort_idx, g.a AS age
      FROM (SELECT DISTINCT cohort_idx FROM coh) c
      CROSS JOIN mx
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(mx.max_idx - c.cohort_idx + 1 AS BIGINT)))
          AS a
      ) g
    ),
    cum AS (
      SELECT s.cohort_idx, s.age,
             CAST(sum(coalesce(i.inc_cents, 0)) OVER (
               PARTITION BY s.cohort_idx ORDER BY s.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DECIMAL(38,0)) AS cum_cents
      FROM spine s LEFT JOIN incr i
        ON i.cohort_idx = s.cohort_idx AND i.age = s.age
    ),
    fac AS (
      SELECT a.age,
             CAST(count(*) AS BIGINT) AS n_cohorts,
             CAST(sum(a.cum_cents) AS DECIMAL(38,0)) AS cum_a,
             CAST(sum(b.cum_cents) AS DECIMAL(38,0)) AS cum_next
      FROM cum a JOIN cum b
        ON b.cohort_idx = a.cohort_idx AND b.age = a.age + 1
      GROUP BY 1
    )
    SELECT age, n_cohorts,
           round(CAST(cum_a AS DOUBLE) / 100, 6) AS cum_revenue,
           round(CAST(cum_next AS DOUBLE) / 100, 6) AS cum_revenue_next,
           round(CAST(cum_next AS DOUBLE) / nullif(CAST(cum_a AS DOUBLE), 0), 6)
             AS dev_factor
    FROM fac ORDER BY age
    """,
)
def orders_cohort_revenue_runoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-revenue runoff triangle with volume-weighted chain-ladder
    development factors (Mack 1993, the actuarial reserving staple,
    applied to the customer-cohort triangle every subscription business
    runs): cohorts = first-order month, ages = months since cohort,
    cumulative revenue per (cohort, age) on a DENSE age spine (ages with
    no orders still carry the running cumulative forward), and per age a
    the chain-ladder factor f_a = sum_c cum(c, a+1) / sum_c cum(c, a)
    over exactly the cohorts old enough to observe age a+1 (the triangle
    boundary). f_a is how much known-cohort revenue still grows between
    ages -- multiplying the factors out projects any cohort's ultimate
    revenue, the actuarial twin of customer_retention_clv_projection's
    geometric model (this one is nonparametric: the data IS the curve).

    Exactness: revenue accumulates in DECIMAL(38,0) cents through the
    dense-spine running sum; the factor is one double division rounded
    at 6dp; triangle-boundary membership is exact integer index
    arithmetic.

    Scale: the fact table reduces to the distinct (customer, month)
    cents rollup; the cohort join is custkey-co-partitioned on that
    rollup; the dense spine is calendar-bounded (sum of cohort spans,
    ~|months|^2/2 rows at any SF -- independent of fact rows); the
    factor join is age-contiguous on the spine. |ages|-1 rows out."""
    o = load_table(spark, sf_dir, "orders")
    idx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    cm = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            idx.alias("idx"),
            F.expr(_TOTAL_C).alias("cents"),
        )
        .groupBy("o_custkey", "idx")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents"))
        .localCheckpoint(eager=False)  # cohort min + increments + max fence
    )
    coh = cm.groupBy("o_custkey").agg(
        F.min("idx").cast("bigint").alias("cohort_idx")
    )
    mx = cm.agg(F.max("idx").cast("bigint").alias("max_idx"))
    incr = (
        cm.join(coh, "o_custkey")
        .groupBy("cohort_idx", (F.col("idx") - F.col("cohort_idx")).alias("age"))
        .agg(F.sum("cents").cast("decimal(38,0)").alias("inc_cents"))
    )
    spine = (
        coh.select("cohort_idx")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "cohort_idx",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("max_idx") - F.col("cohort_idx"))
            ).alias("age"),
        )
    )
    w = Window.partitionBy("cohort_idx").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        spine.join(incr, ["cohort_idx", "age"], "left")
        .select(
            "cohort_idx",
            "age",
            F.sum(F.coalesce(F.col("inc_cents"), F.lit(0)).cast("decimal(38,0)"))
            .over(w)
            .cast("decimal(38,0)")
            .alias("cum_cents"),
        )
        .localCheckpoint(eager=False)  # both sides of the age-contiguous join
    )
    nxt = cum.select(
        F.col("cohort_idx").alias("b_coh"),
        F.col("age").alias("b_age"),
        F.col("cum_cents").alias("cum_next"),
    )
    fac = (
        cum.join(
            nxt,
            (F.col("b_coh") == F.col("cohort_idx"))
            & (F.col("b_age") == F.col("age") + 1),
        )
        .groupBy("age")
        .agg(
            F.count("*").cast("bigint").alias("n_cohorts"),
            F.sum("cum_cents").cast("decimal(38,0)").alias("cum_a"),
            F.sum("cum_next").cast("decimal(38,0)").alias("cum_next"),
        )
    )
    return fac.select(
        "age",
        "n_cohorts",
        F.round(F.col("cum_a").cast("double") / 100, 6).alias("cum_revenue"),
        F.round(F.col("cum_next").cast("double") / 100, 6).alias("cum_revenue_next"),
        F.round(
            F.col("cum_next").cast("double")
            / F.nullif(F.col("cum_a").cast("double"), F.lit(0.0)),
            6,
        ).alias("dev_factor"),
    ).orderBy("age")


# Newsvendor cost assumptions, documented in the docstring: underage
# (lost margin) 4 per unit, overage (holding/salvage loss) 1 per unit
# -> critical ratio 4/(4+1) = 0.8, i.e. the 80th percentile of daily
# demand is the optimal stocking quantity.
NEWSVENDOR_CU = 4
NEWSVENDOR_CO = 1
_NEWSVENDOR_PCT = 100 * NEWSVENDOR_CU // (NEWSVENDOR_CU + NEWSVENDOR_CO)


@register(
    "lineitem_newsvendor_service_panel",
    tags=("warehouse",),
    oracle=f"""
    WITH d AS (
      SELECT p.p_brand, CAST(date_trunc('day', l.l_shipdate) AS DATE) AS dy,
             CAST(sum(try_cast(try_cast(l.l_quantity AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS dem_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL AND l.l_quantity > 0
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT p_brand, dem_c,
             CAST(row_number() OVER (PARTITION BY p_brand ORDER BY dem_c)
               AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n,
             CAST(sum(dem_c) OVER (PARTITION BY p_brand) AS BIGINT) AS s
      FROM d
    ),
    q AS (
      SELECT lo.p_brand, lo.n, lo.s,
             (100 * lo.dem_c
              + (({_NEWSVENDOR_PCT} * (lo.n - 1)) % 100)
                * (hi.dem_c - lo.dem_c)) // 100 AS q_c
      FROM rk lo JOIN rk hi
        ON lo.p_brand = hi.p_brand
       AND lo.rn = ({_NEWSVENDOR_PCT} * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN ({_NEWSVENDOR_PCT} * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    ),
    sv AS (
      SELECT d.p_brand,
             CAST(sum(CASE WHEN d.dem_c <= q.q_c THEN 1 ELSE 0 END)
               AS BIGINT) AS n_met,
             CAST(sum(CASE WHEN d.dem_c > q.q_c THEN d.dem_c - q.q_c
                           ELSE 0 END) AS BIGINT) AS lost_c
      FROM d JOIN q ON q.p_brand = d.p_brand
      GROUP BY 1
    )
    SELECT q.p_brand, q.n AS n_days,
           round(CAST(q.s AS DOUBLE) / q.n / 100, 6) AS mean_daily_demand,
           round(CAST(q.q_c AS DOUBLE) / 100, 6) AS q_star,
           round(CAST(sv.n_met AS DOUBLE) / q.n, 6) AS service_level,
           round(CAST(sv.lost_c AS DOUBLE) / q.n / 100, 6)
             AS mean_lost_sales
    FROM q JOIN sv ON sv.p_brand = q.p_brand
    ORDER BY q.p_brand
    """,
)
def lineitem_newsvendor_service_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking panel per brand (Arrow-Harris-Marschak 1951 /
    the classic critical-fractile model): with underage cost
    NEWSVENDOR_CU = 4 and overage cost NEWSVENDOR_CO = 1 per unit, the
    optimal single-period stock q* is the CR = cu/(cu+co) = 0.8 quantile
    of daily demand -- evaluated here as the exact-interpolation 80th
    percentile of each brand's observed daily shipment quantities, with
    the achieved cycle service level (share of days fully served by q*)
    and the mean unmet demand per day (the empirical E[(D - q*)+] lost-
    sales integral). The demand-uncertainty companion to
    lineitem_eoq_panel: EOQ sizes the replenishment CYCLE, the
    newsvendor fractile sizes the per-cycle BUFFER; both panels are
    relative cross-brand reads with documented cost constants.

    Exactness: daily demand accumulates in integer centi-units; q* uses
    the shared exact-interp rational closed form over integer order
    statistics (the engines' built-in quantiles interpolate with
    ulp-different formulas); service level and lost sales are exact
    integer comparisons/differences against q*, divided once at 6dp.

    Scale: one brand-day partial agg over the fact scan with a broadcast
    part join; the rank window partitions by brand over the |brands| x
    |days| rollup (calendar-bounded, never fact-grain); |brands| rows
    out."""
    from .stats import exact_interp_pct

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull() & (F.col("l_quantity") > 0)
    )
    p = load_table(spark, sf_dir, "part")
    d = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy(
            "p_brand",
            F.date_trunc("day", "l_shipdate").cast("date").alias("dy"),
        )
        .agg(
            F.sum(
                F.expr(
                    "try_cast(try_cast(l_quantity AS decimal(18,2)) * 100"
                    " AS bigint)"
                )
            )
            .cast("bigint")
            .alias("dem_c")
        )
        .localCheckpoint(eager=False)  # percentile + totals + service join
    )
    q = exact_interp_pct(d, ["p_brand"], "dem_c", _NEWSVENDOR_PCT).select(
        "p_brand", F.col("q_val").alias("q_c")
    )
    tot = d.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dem_c").cast("bigint").alias("s"),
    )
    sv = (
        d.join(q, "p_brand")
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("dem_c") <= F.col("q_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_met"),
            F.sum(
                F.when(
                    F.col("dem_c") > F.col("q_c"), F.col("dem_c") - F.col("q_c")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("lost_c"),
        )
    )
    return (
        tot.join(q, "p_brand")
        .join(sv, "p_brand")
        .select(
            "p_brand",
            "n_days",
            F.round(F.col("s").cast("double") / F.col("n_days") / 100, 6).alias(
                "mean_daily_demand"
            ),
            F.round(F.col("q_c").cast("double") / 100, 6).alias("q_star"),
            F.round(F.col("n_met").cast("double") / F.col("n_days"), 6).alias(
                "service_level"
            ),
            F.round(
                F.col("lost_c").cast("double") / F.col("n_days") / 100, 6
            ).alias("mean_lost_sales"),
        )
        .orderBy("p_brand")
    )


@register(
    "nation_part_rca_matrix",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH flow AS (
      SELECT n.n_name AS nation, split_part(p.p_type, ' ', 1) AS facet,
             CAST(sum(try_cast(try_cast(l.l_extendedprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) AS DECIMAL(38,0)) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    nt AS (SELECT nation, CAST(sum(cents) AS DECIMAL(38,0)) AS x_n
           FROM flow GROUP BY 1),
    ft AS (SELECT facet, CAST(sum(cents) AS DECIMAL(38,0)) AS x_t
           FROM flow GROUP BY 1),
    tot AS (SELECT CAST(sum(cents) AS DECIMAL(38,0)) AS x FROM flow),
    spine AS (SELECT nt.nation, ft.facet FROM nt CROSS JOIN ft)
    SELECT s.nation, s.facet,
           round(CAST(coalesce(f.cents, 0) AS DOUBLE) / 100, 6) AS revenue,
           round((CAST(coalesce(f.cents, 0) AS DOUBLE) / CAST(nt.x_n AS DOUBLE))
                 / (CAST(ft.x_t AS DOUBLE) / CAST(tot.x AS DOUBLE)), 6)
             AS rca,
           CAST(CASE WHEN coalesce(f.cents, 0) * tot.x > nt.x_n * ft.x_t
                     THEN 1 ELSE 0 END AS BIGINT) AS specialized
    FROM spine s
    JOIN nt ON nt.nation = s.nation
    JOIN ft ON ft.facet = s.facet
    CROSS JOIN tot
    LEFT JOIN flow f ON f.nation = s.nation AND f.facet = s.facet
    ORDER BY s.nation, s.facet
    """,
)
def nation_part_rca_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revealed comparative advantage matrix (Balassa 1965, the trade-
    economics staple): per (customer nation, part-type facet) the RCA
    index (x_nt / X_n) / (X_t / X) -- the nation's revenue share in the
    facet relative to the facet's global share. RCA > 1 marks the
    facet the nation over-consumes relative to the world mix (flagged
    by EXACT integer cross-multiplication, so no ulp can flip a cell).
    The matrix companion to nation_revenue_shift_share: shift-share
    decomposes GROWTH, RCA reads the LEVEL specialization pattern; the
    facet axis is part_type_facet_decomposition's leading facet.

    Exactness: all four aggregates accumulate in DECIMAL(38,0) cents;
    the index is one double expression rounded at 6dp; the
    specialization flag compares x_nt * X with X_n * X_t in exact
    DECIMAL arithmetic. The (nation x facet) spine zero-fills empty
    cells (the constant-spine totality rule), so RCA 0 cells are
    present rows, not missing ones.

    Scale: one orderkey-co-partitioned fact-fact join with broadcast
    customer/nation/part dims, reduced to the |nations| x |facets|
    grain before the marginals (window-free: the three marginals are
    tiny dim-grain aggs joined back broadcast); 150 rows out at any
    SF."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    flow = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.split(F.col("p_type"), " ").getItem(0).alias("facet"),
        )
        .agg(
            F.sum(
                F.expr(
                    "try_cast(try_cast(l_extendedprice AS decimal(18,2))"
                    " * 100 AS bigint)"
                ).cast("decimal(38,0)")
            ).alias("cents")
        )
        .localCheckpoint(eager=False)  # marginals + spine + cell join
    )
    nt = flow.groupBy("nation").agg(
        F.sum("cents").cast("decimal(38,0)").alias("x_n")
    )
    ft = flow.groupBy("facet").agg(
        F.sum("cents").cast("decimal(38,0)").alias("x_t")
    )
    tot = flow.agg(F.sum("cents").cast("decimal(38,0)").alias("x"))
    cell = F.coalesce(F.col("cents"), F.lit(0)).cast("decimal(38,0)")
    return (
        nt.crossJoin(F.broadcast(ft))
        .crossJoin(F.broadcast(tot))
        .join(flow, ["nation", "facet"], "left")
        .select(
            "nation",
            "facet",
            F.round(cell.cast("double") / 100, 6).alias("revenue"),
            F.round(
                (cell.cast("double") / F.col("x_n").cast("double"))
                / (F.col("x_t").cast("double") / F.col("x").cast("double")),
                6,
            ).alias("rca"),
            F.when(cell * F.col("x") > F.col("x_n") * F.col("x_t"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("specialized"),
        )
        .orderBy("nation", "facet")
    )


@register(
    "customer_clumpiness_panel",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH cd AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS dy
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    win AS (
      SELECT CAST(date_diff('day', min(dy), max(dy)) AS BIGINT) + 2 AS nw
      FROM cd
    ),
    pos AS (
      SELECT c.o_custkey,
             CAST(date_diff('day', (SELECT min(dy) FROM cd), c.dy) AS BIGINT)
               + 1 AS t
      FROM cd c
    ),
    gaps AS (
      SELECT o_custkey,
             t - coalesce(lag(t) OVER (PARTITION BY o_custkey ORDER BY t), 0)
               AS gap
      FROM pos
      UNION ALL
      SELECT p.o_custkey, w.nw - max(p.t) AS gap
      FROM pos p CROSS JOIN win w
      GROUP BY p.o_custkey, w.nw
    ),
    hc AS (
      SELECT g.o_custkey,
             CAST(count(*) AS BIGINT) - 1 AS n_days,
             CAST(sum(CAST((CAST(g.gap AS DOUBLE) / w.nw)
                           * ln(CAST(g.gap AS DOUBLE) / w.nw)
                           AS DECIMAL(20,15))) AS DOUBLE) AS sxlx
      FROM gaps g CROSS JOIN win w
      GROUP BY 1
    ),
    h AS (
      SELECT o_custkey, n_days,
             round(1 + sxlx / ln(CAST(n_days AS DOUBLE) + 1), 6) AS hp
      FROM hc WHERE n_days >= 2
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(h.hp AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*), 6) AS avg_clumpiness,
           round(CAST(sum(h.n_days) AS DOUBLE) / count(*), 6)
             AS avg_active_days
    FROM h JOIN customer c ON c.c_custkey = h.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def customer_clumpiness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase clumpiness per market segment (Zhang, Bradlow & Small
    2015's entropy measure Hp -- the C in their 'RFMC' extension):
    for each customer, the n+1 inter-event intervals of their distinct
    order days inside the panel's global day window (boundary intervals
    included, so a burst at either edge still reads clumpy) are
    normalized to sum to 1, and Hp = 1 + sum(x ln x) / ln(n+1) in
    [0, 1] -- 0 for metronome-regular buying, 1 as all orders collapse
    into one burst. Clumpy customers (binge buyers) are the segment
    whose future value RFM systematically misreads, which is why C
    joined RFM; this panel reads the segment-level mix alongside
    customer_purchase_regularity_by_segment's CV-based view (CV reads
    DISPERSION of gap lengths, Hp reads their TEMPORAL CONCENTRATION
    -- a strict alternation of short/long gaps has high CV but low
    clumpiness).

    Exactness: day positions and gaps are exact integer day arithmetic
    on the shared calendar window; each x ln x term snaps to
    DECIMAL(20,15) before the order-free per-customer sum; per-customer
    Hp rounds once at 6dp and the segment mean sums those ROUNDED
    values in DECIMAL(20,6) (the round-then-compose rule).

    Scale: the fact table reduces to distinct (customer, day); the gap
    window partitions per customer over that rollup; the window fence
    is a broadcast 1-row aggregate; |segments| rows out."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cd = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.date_trunc("day", "o_orderdate").cast("date").alias("dy"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # window fence + positions
    )
    fence = cd.agg(
        F.min("dy").alias("d0"),
        (F.datediff(F.max("dy"), F.min("dy")) + 2).cast("bigint").alias("nw"),
    )
    pos = cd.crossJoin(F.broadcast(fence)).select(
        "o_custkey",
        (F.datediff(F.col("dy"), F.col("d0")) + 1).cast("bigint").alias("t"),
        "nw",
    ).localCheckpoint(eager=False)  # interior gaps + the boundary row
    w = Window.partitionBy("o_custkey").orderBy("t")
    interior = pos.select(
        "o_custkey",
        (F.col("t") - F.coalesce(F.lag("t").over(w), F.lit(0))).alias("gap"),
        "nw",
    )
    boundary = pos.groupBy("o_custkey", "nw").agg(
        (F.col("nw") - F.max("t")).alias("gap")
    ).select("o_custkey", "gap", "nw")
    x = F.col("gap").cast("double") / F.col("nw")
    hc = (
        interior.unionByName(boundary)
        .groupBy("o_custkey")
        .agg(
            (F.count("*") - 1).cast("bigint").alias("n_days"),
            F.sum((x * F.log(x)).cast("decimal(20,15)"))
            .cast("double")
            .alias("sxlx"),
        )
        .filter(F.col("n_days") >= 2)
    )
    h = hc.select(
        "o_custkey",
        "n_days",
        F.round(
            1 + F.col("sxlx") / F.log(F.col("n_days").cast("double") + 1), 6
        ).alias("hp"),
    )
    return (
        h.join(F.broadcast(c), c["c_custkey"] == h["o_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.col("hp").cast("decimal(20,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_clumpiness"),
            F.round(F.sum("n_days").cast("double") / F.count("*"), 6).alias(
                "avg_active_days"
            ),
        )
        .orderBy("segment")
    )


# Shared expression TEXTS for the Bass OLS (both engines evaluate the
# identical IEEE tree over exact-integer sums, so the doubles agree
# bit-for-bit). Column names: nn sx sx2 sx3 sx4 sy sxy sx2y.
_BASS_DET = (
    "(nn * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx3 * sx2)"
    " + sx2 * (sx * sx3 - sx2 * sx2))"
)
_BASS_A = (
    "((sy * (sx2 * sx4 - sx3 * sx3) - sx * (sxy * sx4 - sx3 * sx2y)"
    f" + sx2 * (sxy * sx3 - sx2 * sx2y)) / {_BASS_DET})"
)
_BASS_B = (
    "((nn * (sxy * sx4 - sx2y * sx3) - sy * (sx * sx4 - sx3 * sx2)"
    f" + sx2 * (sx * sx2y - sx2 * sxy)) / {_BASS_DET})"
)
_BASS_C = (
    "((nn * (sx2 * sx2y - sx3 * sxy) - sx * (sx * sx2y - sx2 * sxy)"
    f" + sy * (sx * sx3 - sx2 * sx2)) / {_BASS_DET})"
)
# implied Bass parameters: m from the positive root of c m^2 + b m + a,
# p = a / m, q = -c * m; all guarded on c < 0 and a positive discriminant.
_BASS_GUARD = f"({_BASS_C} < 0 AND {_BASS_B} * {_BASS_B} - 4 * {_BASS_A} * {_BASS_C} > 0)"
_BASS_M = (
    f"((-{_BASS_B} - sqrt({_BASS_B} * {_BASS_B} - 4 * {_BASS_A} * {_BASS_C}))"
    f" / (2 * {_BASS_C}))"
)


@register(
    "customer_bass_diffusion_fit",
    tags=("warehouse", "analytics"),
    oracle=f"""
    WITH fm AS (
      SELECT o_custkey,
             CAST(min(CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
                      + CAST(extract(month FROM o_orderdate) AS BIGINT) - 1)
               AS BIGINT) AS idx
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    mo AS (
      SELECT idx, CAST(count(*) AS BIGINT) AS y FROM fm GROUP BY 1
    ),
    cum AS (
      SELECT idx, y,
             CAST(coalesce(sum(y) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS x
      FROM mo
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS nn,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
               AS DOUBLE) AS sx2,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x) AS DECIMAL(38,0))
               AS DOUBLE) AS sx3,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x * x)
               AS DECIMAL(38,0)) AS DOUBLE) AS sx4,
             CAST(CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
               AS DOUBLE) AS sxy,
             CAST(CAST(sum(CAST(x AS DECIMAL(38,0)) * x * y) AS DECIMAL(38,0))
               AS DOUBLE) AS sx2y,
             CAST(sum(y) AS BIGINT) AS total_adopters
      FROM cum
    )
    SELECT CAST(nn AS BIGINT) AS n_months, total_adopters,
           round({_BASS_A}, 6) AS coef_a,
           round({_BASS_B}, 6) AS coef_b,
           round({_BASS_C}, 6) + 0.0 AS coef_c,
           round(CASE WHEN {_BASS_GUARD} THEN {_BASS_M} END, 6) AS market_m,
           round(CASE WHEN {_BASS_GUARD} THEN {_BASS_A} / {_BASS_M} END, 6)
             AS p_innovation,
           round(CASE WHEN {_BASS_GUARD} THEN -{_BASS_C} * {_BASS_M} END, 6)
             AS q_imitation,
           round(CASE WHEN {_BASS_GUARD}
                      AND {_BASS_A} / {_BASS_M} > 0
                      AND -{_BASS_C} * {_BASS_M} > 0
                 THEN ln((-{_BASS_C} * {_BASS_M}) / ({_BASS_A} / {_BASS_M}))
                      / ({_BASS_A} / {_BASS_M} + -{_BASS_C} * {_BASS_M}) END,
                 6) AS peak_month
    FROM s
    """,
)
def customer_bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion fit of customer acquisition (Bass 1969, via the
    discrete OLS estimation the original paper used): monthly NEW
    customers n_t regress on cumulative adopters N_(t-1) and its square
    -- n_t = a + b N + c N^2 -- and the coefficient roots recover the
    market size m (positive root of c m^2 + b m + a), innovation rate
    p = a/m (adoption from outside influence), imitation rate q = -c m
    (adoption driven by existing adopters), and the implied peak-
    adoption month ln(q/p)/(p+q) relative to launch (negative = the
    peak was at launch, an innovation-dominated rollout). The
    forecasting complement to customer_growth_accounting_monthly: the
    bridge COUNTS transitions, Bass fits WHERE the ceiling is -- m vs
    customers-to-date is the remaining-headroom read.

    Exactness: adopter counts and all eight OLS moments are exact
    integers accumulated in DECIMAL(38,0) (X^4 terms stay under 38
    digits through ~10^8 cumulative adopters; beyond that, center X
    first); the Cramer's-rule solve and the root/parameter algebra
    evaluate ONE shared IEEE expression text on both engines; non-Bass
    shapes (c >= 0 or negative discriminant) yield NULL parameters by
    exact guard instead of complex roots.

    Scale: the fact table reduces to first-order months (custkey
    partial agg), then |months| rows; the prefix window and the OLS
    fold are calendar-bounded; 1 row out."""
    o = load_table(spark, sf_dir, "orders")
    idx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    fm = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", idx.alias("idx"))
        .groupBy("o_custkey")
        .agg(F.min("idx").cast("bigint").alias("idx"))
    )
    mo = fm.groupBy("idx").agg(F.count("*").cast("bigint").alias("y"))
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, -1)
    cum = mo.select(
        "idx",
        "y",
        F.coalesce(F.sum("y").over(w), F.lit(0)).cast("bigint").alias("x"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    s = cum.agg(
        F.count("*").cast("double").alias("nn"),
        F.sum(xd).cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum(xd * F.col("x")).cast("decimal(38,0)").cast("double").alias("sx2"),
        F.sum(xd * F.col("x") * F.col("x")).cast("decimal(38,0)").cast("double").alias("sx3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sx4"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum(xd * F.col("y")).cast("decimal(38,0)").cast("double").alias("sxy"),
        F.sum(xd * F.col("x") * F.col("y"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sx2y"),
        F.sum("y").cast("bigint").alias("total_adopters"),
    )
    return s.select(
        F.col("nn").cast("bigint").alias("n_months"),
        "total_adopters",
        F.round(F.expr(_BASS_A), 6).alias("coef_a"),
        F.round(F.expr(_BASS_B), 6).alias("coef_b"),
        (F.round(F.expr(_BASS_C), 6) + 0.0).alias("coef_c"),
        F.round(
            F.when(F.expr(_BASS_GUARD), F.expr(_BASS_M)), 6
        ).alias("market_m"),
        F.round(
            F.when(F.expr(_BASS_GUARD), F.expr(f"{_BASS_A} / {_BASS_M}")), 6
        ).alias("p_innovation"),
        F.round(
            F.when(F.expr(_BASS_GUARD), F.expr(f"-{_BASS_C} * {_BASS_M}")), 6
        ).alias("q_imitation"),
        F.round(
            F.when(
                F.expr(
                    f"{_BASS_GUARD} AND {_BASS_A} / {_BASS_M} > 0"
                    f" AND -{_BASS_C} * {_BASS_M} > 0"
                ),
                F.expr(
                    f"ln((-{_BASS_C} * {_BASS_M}) / ({_BASS_A} / {_BASS_M}))"
                    f" / ({_BASS_A} / {_BASS_M} + -{_BASS_C} * {_BASS_M})"
                ),
            ),
            6,
        ).alias("peak_month"),
    )


@register(
    "orders_cohort_ultimate_projection",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH cm AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
               + CAST(extract(month FROM o_orderdate) AS BIGINT) - 1 AS idx,
             CAST(sum(try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS DECIMAL(38,0)) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    coh AS (
      SELECT o_custkey, CAST(min(idx) AS BIGINT) AS cohort_idx
      FROM cm GROUP BY 1
    ),
    mx AS (SELECT CAST(max(idx) AS BIGINT) AS max_idx FROM cm),
    incr AS (
      SELECT c.cohort_idx, cm.idx - c.cohort_idx AS age,
             CAST(sum(cm.cents) AS DECIMAL(38,0)) AS inc_cents
      FROM cm JOIN coh c ON c.o_custkey = cm.o_custkey
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT DISTINCT c.cohort_idx, g.a AS age
      FROM (SELECT DISTINCT cohort_idx FROM coh) c
      CROSS JOIN mx
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(mx.max_idx - c.cohort_idx + 1 AS BIGINT)))
          AS a
      ) g
    ),
    cum AS (
      SELECT s.cohort_idx, s.age,
             CAST(sum(coalesce(i.inc_cents, 0)) OVER (
               PARTITION BY s.cohort_idx ORDER BY s.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DECIMAL(38,0)) AS cum_cents
      FROM spine s LEFT JOIN incr i
        ON i.cohort_idx = s.cohort_idx AND i.age = s.age
    ),
    fac AS (
      SELECT a.age,
             CAST(ln(CAST(sum(b.cum_cents) AS DOUBLE)
                     / CAST(sum(a.cum_cents) AS DOUBLE))
               AS DECIMAL(20,15)) AS lf
      FROM cum a JOIN cum b
        ON b.cohort_idx = a.cohort_idx AND b.age = a.age + 1
      GROUP BY a.age
      HAVING sum(a.cum_cents) > 0
    ),
    tail AS (
      -- remaining development from age a to ultimate: exp of the sum of
      -- the snapped log-factors at ages >= a (DECIMAL-snapped ln terms
      -- make the order-free SUM the exact product both engines agree on)
      SELECT c.cohort_idx, mx.max_idx - c.cohort_idx AS cur_age,
             exp(coalesce((SELECT CAST(sum(f.lf) AS DOUBLE) FROM fac f
                           WHERE f.age >= mx.max_idx - c.cohort_idx), 0))
               AS cdf
      FROM (SELECT DISTINCT cohort_idx FROM coh) c CROSS JOIN mx
    )
    SELECT make_timestamp((t.cohort_idx // 12), (t.cohort_idx % 12) + 1,
                          1, 0, 0, 0) AS cohort_month,
           t.cur_age,
           round(CAST(c.cum_cents AS DOUBLE) / 100, 6) AS revenue_to_date,
           round(t.cdf, 6) AS remaining_cdf,
           round(CAST(c.cum_cents AS DOUBLE) / 100 * t.cdf, 6)
             AS ultimate_revenue,
           round(CAST(c.cum_cents AS DOUBLE) / 100 * (t.cdf - 1), 6)
             AS unearned_revenue
    FROM tail t
    JOIN cum c ON c.cohort_idx = t.cohort_idx AND c.age = t.cur_age
    ORDER BY cohort_month
    """,
)
def orders_cohort_ultimate_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder ULTIMATE projection per cohort (the second half of
    Mack 1993 that orders_cohort_revenue_runoff sets up): each cohort's
    revenue-to-date multiplied by its cumulative development factor --
    the product of the volume-weighted age factors it has not yet lived
    through -- gives ultimate revenue and the implied still-to-come
    ('unearned') remainder. The actuarial reserve triangle applied to
    customer economics: young cohorts carry large remaining CDFs, dead
    ones ~1. Factor products are computed as exp(sum of DECIMAL-snapped
    log factors) so both engines multiply in the same order-free
    algebra.

    Exactness: cents through the dense-spine DECIMAL cumulative (shared
    with the runoff key); each ln(factor) snaps to DECIMAL(20,15); the
    per-cohort remaining product is exp of an order-free sum; outputs
    round once at 6dp. The projection column is a MODEL (volume-
    weighted chain ladder), exactly reproducible, not a promise.

    Scale: identical posture to the runoff key (custkey-co-partitioned
    rollup, calendar-bounded spine); the tail sum is |ages| x |cohorts|
    on the factor relation; |cohorts| rows out."""
    o = load_table(spark, sf_dir, "orders")
    idx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    cm = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", idx.alias("idx"), F.expr(_TOTAL_C).alias("cents"))
        .groupBy("o_custkey", "idx")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents"))
        .localCheckpoint(eager=False)
    )
    coh = cm.groupBy("o_custkey").agg(F.min("idx").cast("bigint").alias("cohort_idx"))
    mx = cm.agg(F.max("idx").cast("bigint").alias("max_idx"))
    incr = (
        cm.join(coh, "o_custkey")
        .groupBy("cohort_idx", (F.col("idx") - F.col("cohort_idx")).alias("age"))
        .agg(F.sum("cents").cast("decimal(38,0)").alias("inc_cents"))
    )
    spine = (
        coh.select("cohort_idx")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "cohort_idx",
            "max_idx",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"), F.col("max_idx") - F.col("cohort_idx")
                )
            ).alias("age"),
        )
    )
    w = Window.partitionBy("cohort_idx").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        spine.join(incr, ["cohort_idx", "age"], "left")
        .select(
            "cohort_idx",
            "max_idx",
            "age",
            F.sum(F.coalesce(F.col("inc_cents"), F.lit(0)).cast("decimal(38,0)"))
            .over(w)
            .cast("decimal(38,0)")
            .alias("cum_cents"),
        )
        .localCheckpoint(eager=False)
    )
    nxt = cum.select(
        F.col("cohort_idx").alias("b_coh"),
        F.col("age").alias("b_age"),
        F.col("cum_cents").alias("cum_next"),
    )
    fac = (
        cum.join(
            nxt,
            (F.col("b_coh") == F.col("cohort_idx"))
            & (F.col("b_age") == F.col("age") + 1),
        )
        .groupBy("age")
        .agg(
            F.sum("cum_cents").cast("decimal(38,0)").alias("cum_a"),
            F.sum("cum_next").cast("decimal(38,0)").alias("cum_next"),
        )
        .filter(F.col("cum_a") > 0)
        .select(
            "age",
            F.log(F.col("cum_next").cast("double") / F.col("cum_a").cast("double"))
            .cast("decimal(20,15)")
            .alias("lf"),
        )
    )
    cur = cum.filter(F.col("age") == F.col("max_idx") - F.col("cohort_idx")).select(
        "cohort_idx", F.col("age").alias("cur_age"), "cum_cents"
    )
    tail = (
        cur.join(fac, F.col("age") >= F.col("cur_age"), "left")
        .groupBy("cohort_idx", "cur_age", "cum_cents")
        .agg(F.exp(F.coalesce(F.sum("lf"), F.lit(0)).cast("double")).alias("cdf"))
    )
    rev = F.col("cum_cents").cast("double") / 100
    return tail.select(
        F.expr(
            "make_timestamp(CAST(cohort_idx DIV 12 AS INT),"
            " CAST(cohort_idx % 12 + 1 AS INT), 1, 0, 0, 0)"
        ).alias("cohort_month"),
        "cur_age",
        F.round(rev, 6).alias("revenue_to_date"),
        F.round("cdf", 6).alias("remaining_cdf"),
        F.round(rev * F.col("cdf"), 6).alias("ultimate_revenue"),
        F.round(rev * (F.col("cdf") - 1), 6).alias("unearned_revenue"),
    ).orderBy("cohort_month")


@register(
    "supplier_volume_fano_panel",
    tags=("warehouse", "monitor"),
    oracle="""
    WITH mo AS (
      SELECT l_suppkey,
             CAST(extract(year FROM l_shipdate) AS BIGINT) * 12
               + CAST(extract(month FROM l_shipdate) AS BIGINT) - 1 AS idx,
             CAST(count(*) AS BIGINT) AS x
      FROM lineitem WHERE l_shipdate IS NOT NULL
      GROUP BY 1, 2
    ),
    cal AS (
      SELECT CAST(max(idx) - min(idx) + 1 AS BIGINT) AS n_m FROM mo
    ),
    per AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS active_months,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM mo GROUP BY 1
    )
    SELECT p.l_suppkey AS suppkey, c.n_m AS n_months, p.active_months,
           p.s AS total_lines,
           round(CAST(p.s AS DOUBLE) / c.n_m, 6) AS mean_monthly,
           round((c.n_m * CAST(p.sxx AS DOUBLE) - CAST(p.s AS DOUBLE) * p.s)
                 / (CAST(c.n_m AS DOUBLE) * c.n_m)
                 / nullif(CAST(p.s AS DOUBLE) / c.n_m, 0), 6) AS fano,
           CAST(CASE WHEN c.n_m * p.sxx - CAST(p.s AS DECIMAL(38,0)) * p.s
                          > CAST(c.n_m AS DECIMAL(38,0)) * p.s
                     THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
    FROM per p CROSS JOIN cal c
    ORDER BY p.l_suppkey
    """,
)
def supplier_volume_fano_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, Fano 1947) of each supplier's
    monthly line volume over the DENSE calendar (zero months count --
    excluding them is the classic bias): variance / mean of monthly
    counts, where a Poisson-random workload sits at 1, clumped batching
    reads > 1 (overdispersed -- the supplier gets slammed in bursts),
    and quota-smoothed flow reads < 1. The per-supplier dispersion
    triage next to supplier_workload_balance_monthly's cross-supplier
    balance: balance says WHO is loaded, Fano says HOW LUMPY each one's
    load arrives, which is what staffing actually prices. The
    overdispersion flag is decided by exact integer cross-multiplication
    (n_m * sum_x2 - s^2 > n_m * s), so no supplier flips on a ulp.

    Exactness: monthly counts are exact integers; the dense-calendar
    moments need no spine join (zero months add zero to both s and
    sum_x2 -- only the DIVISOR needs the true month count, a 1-row
    fence); mean and Fano divide once at 6dp.

    Scale: one (supplier, month) partial agg over the fact scan, folded
    supplier-grain; the calendar fence broadcasts; |suppliers| rows
    out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    idx = (
        F.year("l_shipdate").cast("bigint") * 12
        + F.month("l_shipdate").cast("bigint")
        - 1
    )
    mo = li.groupBy("l_suppkey", idx.alias("idx")).agg(
        F.count("*").cast("bigint").alias("x")
    ).localCheckpoint(eager=False)  # calendar fence + per-supplier moments
    cal = mo.agg(
        (F.max("idx") - F.min("idx") + 1).cast("bigint").alias("n_m")
    )
    per = mo.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("active_months"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    nm = F.col("n_m").cast("double")
    sd = F.col("s").cast("double")
    mean = sd / nm
    var = (nm * F.col("sxx").cast("double") - sd * F.col("s")) / (nm * nm)
    return (
        per.crossJoin(F.broadcast(cal))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("n_m").alias("n_months"),
            "active_months",
            F.col("s").alias("total_lines"),
            F.round(mean, 6).alias("mean_monthly"),
            F.round(var / F.nullif(mean, F.lit(0.0)), 6).alias("fano"),
            F.when(
                F.col("n_m") * F.col("sxx")
                - F.col("s").cast("decimal(38,0)") * F.col("s")
                > F.col("n_m").cast("decimal(38,0)") * F.col("s"),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("overdispersed"),
        )
        .orderBy("suppkey")
    )


@register(
    "lineitem_price_stickiness_panel",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH mo AS (
      SELECT p.p_brand,
             CAST(extract(year FROM l.l_shipdate) AS BIGINT) * 12
               + CAST(extract(month FROM l.l_shipdate) AS BIGINT) - 1 AS idx,
             CAST(sum(try_cast(try_cast(l.l_extendedprice AS DECIMAL(18,2))
                      * 100 AS BIGINT) // try_cast(l.l_quantity AS BIGINT))
               AS DECIMAL(38,0)) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL AND l.l_quantity > 0
        AND try_cast(l.l_quantity AS BIGINT) > 0
      GROUP BY 1, 2
    ),
    ch AS (
      SELECT p_brand, idx, s, n,
             lag(s) OVER (PARTITION BY p_brand ORDER BY idx) AS ps,
             lag(n) OVER (PARTITION BY p_brand ORDER BY idx) AS pn,
             lag(idx) OVER (PARTITION BY p_brand ORDER BY idx) AS pidx
      FROM mo
    ),
    fl AS (
      SELECT p_brand,
             CASE WHEN pidx = idx - 1 THEN 1 ELSE 0 END AS adjacent,
             CASE WHEN pidx = idx - 1 AND s * pn <> ps * n THEN 1 ELSE 0 END
               AS changed,
             CASE WHEN pidx = idx - 1 AND s * pn <> ps * n
                  THEN CAST(abs(ln((CAST(s AS DOUBLE) / n)
                                   / (CAST(ps AS DOUBLE) / pn)))
                    AS DECIMAL(20,15)) END AS alc
      FROM ch WHERE ps IS NOT NULL
    )
    SELECT p_brand,
           CAST(sum(adjacent) AS BIGINT) AS n_transitions,
           CAST(sum(changed) AS BIGINT) AS n_changes,
           round(CAST(sum(changed) AS DOUBLE) / nullif(sum(adjacent), 0), 6)
             AS change_freq,
           round(CAST(sum(alc) AS DOUBLE) / nullif(sum(changed), 0), 6)
             AS mean_abs_log_change,
           round(nullif(CAST(sum(adjacent) AS DOUBLE), 0)
                 / nullif(sum(changed), 0), 6) AS implied_duration_months
    FROM fl GROUP BY 1 ORDER BY 1
    """,
)
def lineitem_price_stickiness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-stickiness panel per brand (Bils & Klenow 2004's
    measurement applied to realized unit prices): month-over-month,
    does the brand's mean unit price CHANGE, how OFTEN (change
    frequency over adjacent-month transitions), by how MUCH (mean
    absolute log change over changing months), and the implied price-
    spell duration 1/frequency -- the macro-pricing read that says
    which brands reprice continuously vs hold list prices. Change
    detection compares the exact RATIONAL monthly means by integer
    cross-multiplication (s_t * n_{t-1} vs s_{t-1} * n_t), so equal
    means can never read as a change on a ulp; only ADJACENT calendar
    months count as transitions (a gap is absence, not stickiness).

    Exactness: unit prices floor to integer cents per line before the
    monthly DECIMAL sums (the order-free rule); each |delta log| snaps
    to DECIMAL(20,15); the three ratios divide once at 6dp.

    Scale: one brand-month partial agg with a broadcast part join; the
    lag window rides the |brands| x |months| rollup; |brands| rows
    out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
        & (F.col("l_quantity") > 0)
        & (F.expr("try_cast(l_quantity AS bigint)") > 0)
    )
    p = load_table(spark, sf_dir, "part")
    idx = (
        F.year("l_shipdate").cast("bigint") * 12
        + F.month("l_shipdate").cast("bigint")
        - 1
    )
    unit_c = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
        " DIV try_cast(l_quantity AS bigint)"
    )
    mo = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand", idx.alias("idx"))
        .agg(
            F.sum(unit_c.cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("idx")
    ch = mo.select(
        "p_brand",
        "idx",
        "s",
        "n",
        F.lag("s").over(w).alias("ps"),
        F.lag("n").over(w).alias("pn"),
        F.lag("idx").over(w).alias("pidx"),
    ).filter(F.col("ps").isNotNull())
    adjacent = F.when(F.col("pidx") == F.col("idx") - 1, 1).otherwise(0)
    moved = (F.col("s") * F.col("pn")) != (F.col("ps") * F.col("n"))
    changed = F.when((F.col("pidx") == F.col("idx") - 1) & moved, 1).otherwise(0)
    alc = F.when(
        (F.col("pidx") == F.col("idx") - 1) & moved,
        F.abs(
            F.log(
                (F.col("s").cast("double") / F.col("n"))
                / (F.col("ps").cast("double") / F.col("pn"))
            )
        ).cast("decimal(20,15)"),
    )
    fl = ch.select(
        "p_brand",
        adjacent.alias("adjacent"),
        changed.alias("changed"),
        alc.alias("alc"),
    )
    return (
        fl.groupBy("p_brand")
        .agg(
            F.sum("adjacent").cast("bigint").alias("n_transitions"),
            F.sum("changed").cast("bigint").alias("n_changes"),
            F.round(
                F.sum("changed").cast("double")
                / F.nullif(F.sum("adjacent"), F.lit(0)),
                6,
            ).alias("change_freq"),
            F.round(
                F.sum("alc").cast("double") / F.nullif(F.sum("changed"), F.lit(0)),
                6,
            ).alias("mean_abs_log_change"),
            F.round(
                F.nullif(F.sum("adjacent").cast("double"), F.lit(0.0))
                / F.nullif(F.sum("changed"), F.lit(0)),
                6,
            ).alias("implied_duration_months"),
        )
        .orderBy("p_brand")
    )


@register(
    "lineitem_bullwhip_ratio_panel",
    tags=("warehouse", "analytics"),
    oracle="""
    WITH li AS (
      SELECT p.p_brand, l.l_orderkey,
             try_cast(try_cast(l.l_quantity AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS qc,
             CAST(extract(year FROM l.l_shipdate) AS BIGINT) * 12
               + CAST(extract(month FROM l.l_shipdate) AS BIGINT) - 1
               AS ship_idx
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL AND l.l_quantity > 0
    ),
    ord AS (
      SELECT li.p_brand,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT) * 12
               + CAST(extract(month FROM o.o_orderdate) AS BIGINT) - 1
               AS idx,
             CAST(sum(CAST(li.qc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS x
      FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    shp AS (
      SELECT p_brand, ship_idx AS idx,
             CAST(sum(CAST(qc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS x
      FROM li GROUP BY 1, 2
    ),
    cal AS (
      SELECT CAST(max(idx) - min(idx) + 1 AS BIGINT) AS n_m
      FROM (SELECT idx FROM ord UNION ALL SELECT idx FROM shp)
    ),
    mo AS (
      SELECT p_brand,
             CAST(sum(x) AS DECIMAL(38,0)) AS so,
             CAST(sum(x * x) AS DECIMAL(38,0)) AS soo
      FROM ord GROUP BY 1
    ),
    ms AS (
      SELECT p_brand,
             CAST(sum(x) AS DECIMAL(38,0)) AS ss,
             CAST(sum(x * x) AS DECIMAL(38,0)) AS sss
      FROM shp GROUP BY 1
    )
    SELECT o.p_brand, c.n_m AS n_months,
           round((c.n_m * CAST(o.soo AS DOUBLE) - CAST(o.so AS DOUBLE) * o.so)
                 / (CAST(o.so AS DOUBLE) * o.so), 6) AS cv2_orders,
           round((c.n_m * CAST(s.sss AS DOUBLE) - CAST(s.ss AS DOUBLE) * s.ss)
                 / (CAST(s.ss AS DOUBLE) * s.ss), 6) AS cv2_shipments,
           round(((c.n_m * CAST(o.soo AS DOUBLE) - CAST(o.so AS DOUBLE) * o.so)
                  / (CAST(o.so AS DOUBLE) * o.so))
                 / nullif((c.n_m * CAST(s.sss AS DOUBLE)
                           - CAST(s.ss AS DOUBLE) * s.ss)
                          / (CAST(s.ss AS DOUBLE) * s.ss), 0), 6)
             AS bullwhip_ratio,
           CAST(CASE WHEN (c.n_m * o.soo - o.so * o.so) * (s.ss * s.ss)
                          > (c.n_m * s.sss - s.ss * s.ss) * (o.so * o.so)
                     THEN 1 ELSE 0 END AS BIGINT) AS amplifying
    FROM mo o JOIN ms s ON s.p_brand = o.p_brand CROSS JOIN cal c
    ORDER BY o.p_brand
    """,
)
def lineitem_bullwhip_ratio_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect panel per brand (Lee, Padmanabhan & Whang 1997):
    the ratio of demand-signal variability placed UPSTREAM (monthly
    quantities by ORDER date -- when the demand hit the book) to the
    variability of the fulfilled FLOW (the same quantities by SHIP date),
    each as the squared coefficient of variation over the shared dense
    calendar. Ratio > 1 (the 'amplifying' flag, decided by exact DECIMAL
    cross-multiplication) is the bullwhip signature: order batching and
    shipment scheduling AMPLIFY variability as the signal moves up the
    chain -- the phenomenon safety-stock models must size against,
    and the cross-stage companion to supplier_volume_fano_panel's
    single-stage dispersion read.

    Exactness: quantities accumulate as integer centi-units in
    DECIMAL(38,0); CV^2 = (n * sum_x2 - s^2) / s^2 is scale-free and
    evaluates one shared IEEE expression from exact moments (dense
    calendar: zero months add zero to every sum, only the shared month
    fence divides); the flag cross-multiplies exactly (the product
    (n sum_x2 - s^2) * s'^2 stays under DECIMAL(38,0) through ~100x the
    sf1 volumes; beyond that, rescale qc to whole units first).

    Scale: two (brand, month) partial aggs off one fact scan (the
    order-date leg joins orders orderkey-co-partitioned); |brands| rows
    out."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull() & (F.col("l_quantity") > 0))
        .join(F.broadcast(p), p["p_partkey"] == F.col("l_partkey"))
        .select(
            "p_brand",
            "l_orderkey",
            F.expr(
                "try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)"
            ).alias("qc"),
            (
                F.year("l_shipdate").cast("bigint") * 12
                + F.month("l_shipdate").cast("bigint")
                - 1
            ).alias("ship_idx"),
        )
        .localCheckpoint(eager=False)  # both monthly legs
    )
    ordm = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            "p_brand",
            (
                F.year("o_orderdate").cast("bigint") * 12
                + F.month("o_orderdate").cast("bigint")
                - 1
            ).alias("idx"),
        )
        .agg(F.sum(F.col("qc").cast("decimal(38,0)")).cast("decimal(38,0)").alias("x"))
    )
    shpm = li.groupBy("p_brand", F.col("ship_idx").alias("idx")).agg(
        F.sum(F.col("qc").cast("decimal(38,0)")).cast("decimal(38,0)").alias("x")
    )
    cal = (
        ordm.select("idx")
        .unionAll(shpm.select("idx"))
        .agg((F.max("idx") - F.min("idx") + 1).cast("bigint").alias("n_m"))
    )
    mo = ordm.groupBy("p_brand").agg(
        F.sum("x").cast("decimal(38,0)").alias("so"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("soo"),
    )
    ms = shpm.groupBy(F.col("p_brand").alias("s_brand")).agg(
        F.sum("x").cast("decimal(38,0)").alias("ss"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sss"),
    )
    nm = F.col("n_m").cast("double")
    cv2o = (nm * F.col("soo").cast("double") - F.col("so").cast("double") * F.col("so")) / (
        F.col("so").cast("double") * F.col("so")
    )
    cv2s = (nm * F.col("sss").cast("double") - F.col("ss").cast("double") * F.col("ss")) / (
        F.col("ss").cast("double") * F.col("ss")
    )
    return (
        mo.join(ms, F.col("s_brand") == F.col("p_brand"))
        .crossJoin(F.broadcast(cal))
        .select(
            "p_brand",
            F.col("n_m").alias("n_months"),
            F.round(cv2o, 6).alias("cv2_orders"),
            F.round(cv2s, 6).alias("cv2_shipments"),
            F.round(cv2o / F.nullif(cv2s, F.lit(0.0)), 6).alias("bullwhip_ratio"),
            F.when(
                (F.col("n_m") * F.col("soo") - F.col("so") * F.col("so"))
                * (F.col("ss") * F.col("ss"))
                > (F.col("n_m") * F.col("sss") - F.col("ss") * F.col("ss"))
                * (F.col("so") * F.col("so")),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("amplifying"),
        )
        .orderBy("p_brand")
    )
