"""SQL-API operators: queries expressed as ANSI SQL through spark.sql()
over the engine catalog's temp views -- proving the surface a reference
user would migrate raw SQL onto. Catalyst plans these identically to the
DataFrame API (same optimizer, same physical strategies); correlated
subqueries decorrelate into joins rather than per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import register

# Shared dialect-neutral SQL: the Spark side executes the SAME text the
# DuckDB oracle runs (decimal-accumulated avg keeps the threshold exact on
# both engines).
_CORRELATED_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""

_IN_SUBQUERY_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE c.c_nationkey IN (
  SELECT n.n_nationkey FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
)
AND c.c_custkey NOT IN (SELECT o.o_custkey FROM orders o WHERE o.o_orderstatus = 'F')
"""


@register("subquery_correlated", tags=("sqlapi",), oracle=_CORRELATED_SQL)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders 50% above their customer's
    average). Catalyst decorrelates this into one aggregate + one join --
    the fact table is scanned twice, never per-row. Identical SQL text runs
    on both engines."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_CORRELATED_SQL)


@register("subquery_in", tags=("sqlapi",), oracle=_IN_SUBQUERY_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (ASIA-nation customers with no finalized
    orders). Planned as left-semi and null-aware left-anti joins; the dim
    subquery broadcasts."""
    register_views(spark, sf_dir, ["customer", "nation", "region", "orders"])
    return spark.sql(_IN_SUBQUERY_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice, t.rnk
FROM customer c, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice,
         CAST(row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rnk
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
) t
WHERE c.c_nationkey < 5
"""


@register("join_lateral", tags=("sqlapi", "join"), oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join (each customer's two largest
    orders) -- identical SQL text on both engines. Catalyst rewrites the
    per-row subquery into a decorrelated join + ranked window partitioned
    by the correlation key, so execution is set-at-a-time: ONE shuffle of
    orders on o_custkey with WindowGroupLimit pruning to k rows per key
    map-side, never a re-executed subquery per customer row (the row-at-
    a-time semantics the SQL text literally describes)."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS src,
           event_type AS dst
    FROM events
  ) t
  WHERE src IS NOT NULL AND src <> dst
),
reach(dst, hops) AS (
  SELECT dst, 1 AS hops FROM edges WHERE src = 'signup'
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.dst
  WHERE r.hops < 4
)
SELECT dst AS event_type, CAST(min(hops) AS INT) AS min_hops
FROM reach GROUP BY dst
"""


@register("recursive_reachability", tags=("sqlapi", "graph"), oracle=_RECURSIVE_SQL)
def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE, new surface area the SQL
    migration path needs): minimum-hop reachability from 'signup' over the
    observed event-type transition graph -- the declarative twin of
    graph_pagerank's hand-rolled iteration. The identical SQL text runs on
    both engines; the hop cap bounds the fixpoint on the cyclic graph, and
    the final min() collapses multiple paths deterministically.

    Scale: the edge list reduces to |types|^2 rows behind one keyed window
    pass; each recursive step is a dim-scale self-join. For billion-edge
    graphs the DataFrame loop (graph.py) with checkpointing is the
    workhorse; the CTE form is the interface parity proof."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_RECURSIVE_SQL)


_GROUP_BY_ALL_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""


@register("sqlapi_group_by_all", tags=("sqlapi",), oracle=_GROUP_BY_ALL_SQL)
def sqlapi_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the DuckDB-popularized shorthand Spark
    adopted): every non-aggregate select item becomes a grouping key, and
    the result orders by the full select list -- identical SQL text
    executes on both engines, pinning that the dialects resolve the
    shorthand to the same explicit form."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "sqlapi_parameterized",
    tags=("sqlapi",),
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_totalprice > 1000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sqlapi_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (`spark.sql(text, args={...})`): named parameter
    markers bound server-side instead of string interpolation -- the
    injection-safe form the reference's hand-assembled snapshot SQL
    (``replicator.go:102`` + ``quoteIdent``) needs; Spark binds typed
    literals into the plan so pushdown and constant folding see real
    constants. The oracle inlines the same literals."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :floor
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"cutoff": "1997-01-01 00:00:00", "floor": 1000.0},
    )


# Aggregate FILTER clause (SQL:2003): identical text on both engines.
# count FILTER over an empty set is 0, sum FILTER over an empty set is
# NULL -- the two empty-set semantics the CASE-WHEN rewrite gets subtly
# wrong when a translator maps FILTER to sum(CASE ... ELSE 0) (a 0, not
# the standard's NULL). The differential fuzzer covers the composition
# space of this clause; this key is its pinned, driver-attested exemplar.
_AGG_FILTER_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS final_cents,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            FILTER (WHERE o_orderstatus = 'X') AS BIGINT) AS absent_cents,
       CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
            AS BIGINT) AS open_customers
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sqlapi_agg_filter", tags=("sqlapi",), oracle=_AGG_FILTER_SQL)
def sqlapi_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause parity (SQL:2003 T612), one
    text on both engines: per-priority order counts/revenue split by
    status inside the aggregate, including a deliberately-unsatisfiable
    filter (status 'X' never occurs) pinning the empty-set semantics --
    count -> 0, sum -> NULL. Catalyst plans FILTER aggregates as
    conditional partial aggs (map-side combinable, one scan), identical
    to the CASE form but with the standard's NULL contract."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_AGG_FILTER_SQL)


# QUALIFY dialect pair: DuckDB ships the Snowflake-style QUALIFY clause;
# Spark 4 does not parse it. The two texts below are the SAME logical
# plan -- Catalyst plans the subquery form as Window + Filter, exactly
# what QUALIFY desugars to -- making this key the documented migration
# recipe for QUALIFY-using warehouse SQL landing on this engine.
_QUALIFY_SPARK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey)
              AS BIGINT) AS rnk
  FROM orders
) t
WHERE rnk <= 2
ORDER BY o_custkey, rnk, o_orderkey
"""

_QUALIFY_DUCK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rnk
FROM orders
QUALIFY rnk <= 2
ORDER BY o_custkey, rnk, o_orderkey
"""


@register("sqlapi_qualify_dialect", tags=("sqlapi",), oracle=_QUALIFY_DUCK_SQL)
def sqlapi_qualify_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer, QUALIFY-dialect parity: the oracle runs
    DuckDB's QUALIFY clause, the engine runs the ranked-subquery form
    Spark parses -- identical semantics (QUALIFY is sugar for exactly
    this subquery), pinned by the driver's value hash. Catalyst pushes
    the rnk <= 2 filter into WindowGroupLimit, so the migration costs
    nothing at plan level either (the top-k-per-group plan gate family
    covers the shape).

    Fully tie-broken (price desc, orderkey) rank; BIGINT cast on both
    sides."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_QUALIFY_SPARK_SQL)


# --- DISTINCT ON dialect parity (round 13) -----------------------------
# DuckDB (and Postgres) support `SELECT DISTINCT ON (keys) ... ORDER BY
# keys, tiebreak` -- keep the first row per key group under the ORDER BY.
# Spark has no DISTINCT ON; the standard migration is the ranked
# subquery (or groupBy + max_by when only one column is carried). The
# two texts below are the same logical plan; this key is the documented
# migration recipe for DISTINCT ON-using SQL landing on this engine.
_DISTINCT_ON_SPARK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) t
WHERE rn = 1
ORDER BY o_custkey
"""

_DISTINCT_ON_DUCK_SQL = """
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("sqlapi_distinct_on_dialect", tags=("sqlapi",), oracle=_DISTINCT_ON_DUCK_SQL)
def sqlapi_distinct_on_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's FIRST order (earliest date, orderkey tiebreak),
    DISTINCT ON-dialect parity: the oracle runs DuckDB's
    Postgres-style DISTINCT ON, the engine runs the ranked-subquery
    form Spark parses -- identical semantics (DISTINCT ON is sugar for
    row_number() = 1 under the same ORDER BY), pinned by the driver's
    value hash. Catalyst plans the rn = 1 filter as WindowGroupLimit
    (map-side top-1 truncation), so the migration is also free at plan
    level. The companion recipe to sqlapi_qualify_dialect: QUALIFY
    covers arbitrary ranked filters, DISTINCT ON covers the
    latest/earliest-row-per-key idiom CDC latest-state queries live on.

    Fully tie-broken (date, orderkey); all carried columns are raw table
    columns so both engines hash identical values."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_DISTINCT_ON_SPARK_SQL)


_ASOF_DUCK_SQL = """
WITH clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click' AND ts IS NOT NULL
),
purch AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
"""

_ASOF_SPARK_SQL = """
SELECT event_id, user_id, ts, last_click_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_ts
  FROM events WHERE ts IS NOT NULL
) t
WHERE event_type = 'purchase'
ORDER BY event_id
"""


@register("sqlapi_asof_dialect", tags=("sqlapi",), oracle=_ASOF_DUCK_SQL)
def sqlapi_asof_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join, ASOF-dialect parity: the oracle runs
    DuckDB's native ``ASOF LEFT JOIN`` (the kdb+-lineage syntax
    Postgres lacks and DuckDB added), the engine runs the running-max
    RANGE-window form Spark parses -- for each purchase, the latest
    click at-or-before it from the same user, NULL when none exists
    (the LEFT semantics). The migration recipe both directions: teams
    leaving a native-ASOF engine get the window rewrite, teams arriving
    get the native form; the driver's value hash pins that the two
    texts are the same query. Completes the dialect-recipe catalog:
    QUALIFY (ranked filters), DISTINCT ON (first-row-per-key), ASOF
    (temporal alignment).

    Tie semantics, made identical on purpose: ASOF's c.ts <= p.ts is
    INCLUSIVE, so the Spark window uses a RANGE frame ordered by ts
    alone (a ROWS frame with an id tiebreak would exclude a same-
    timestamp click sorted after the purchase -- the dialect split this
    key exists to document). The aligned value is the click's ts
    itself, so equal-ts click multiplicity cannot introduce
    nondeterminism.

    Scale: one keyed window shuffle (the join_asof composition rule);
    no range explosion, no per-group pandas."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_ASOF_SPARK_SQL)


_PIVOT_DUCK_SQL = """
WITH src AS (
  SELECT 'p' || split_part(o_orderpriority, '-', 1) AS pri,
         CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
         try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_orderdate IS NOT NULL
),
pv AS (
  PIVOT src ON pri USING sum(c) GROUP BY yr
)
SELECT yr,
       round(CAST(coalesce(p1, 0) AS DOUBLE) / 100, 6) AS urgent_revenue,
       round(CAST(coalesce(p2, 0) AS DOUBLE) / 100, 6) AS high_revenue,
       round(CAST(coalesce(p3, 0) AS DOUBLE) / 100, 6) AS medium_revenue,
       round(CAST(coalesce(p4, 0) AS DOUBLE) / 100, 6) AS notspec_revenue,
       round(CAST(coalesce(p5, 0) AS DOUBLE) / 100, 6) AS low_revenue
FROM pv ORDER BY yr
"""

_PIVOT_SPARK_SQL = """
WITH src AS (
  SELECT concat('p', split_part(o_orderpriority, '-', 1)) AS pri,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_orderdate IS NOT NULL
)
SELECT yr,
       round(CAST(coalesce(p1, 0) AS DOUBLE) / 100, 6) AS urgent_revenue,
       round(CAST(coalesce(p2, 0) AS DOUBLE) / 100, 6) AS high_revenue,
       round(CAST(coalesce(p3, 0) AS DOUBLE) / 100, 6) AS medium_revenue,
       round(CAST(coalesce(p4, 0) AS DOUBLE) / 100, 6) AS notspec_revenue,
       round(CAST(coalesce(p5, 0) AS DOUBLE) / 100, 6) AS low_revenue
FROM src
PIVOT (CAST(sum(c) AS BIGINT) FOR pri IN ('p1' AS p1, 'p2' AS p2,
                                          'p3' AS p3, 'p4' AS p4,
                                          'p5' AS p5))
ORDER BY yr
"""


@register("sqlapi_pivot_dialect", tags=("sqlapi",), oracle=_PIVOT_DUCK_SQL)
def sqlapi_pivot_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue by order priority, PIVOT-dialect parity: both
    engines have a NATIVE pivot clause with incompatible syntax --
    DuckDB's statement-level ``PIVOT src ON col USING agg GROUP BY``
    (dynamic columns from data) vs Spark's table-suffix
    ``FROM src PIVOT (agg FOR col IN (...))`` (columns must be
    enumerated, but aliasable inline). The driver's value hash pins
    that the two texts are the same query, which is the migration
    recipe in BOTH directions -- and the recipe documents the two real
    traps: (a) Spark's IN-list is MANDATORY and silently drops
    unlisted categories, so derive a CLOSED key first (here
    'p' || priority digit); (b) both engines emit NULL for empty
    cells, so coalesce before presenting. Completes the dialect
    catalog: QUALIFY, DISTINCT ON, ASOF, PIVOT. The reshape twin
    `pivot_unpivot_roundtrip` proves semantics via the DataFrame API;
    this key proves the SQL-text surface.

    Exactness: cents accumulate exactly inside the pivot aggregate
    (BIGINT on Spark; DuckDB's USING must be a BARE aggregate -- trap
    (c) -- so its sum lands as HUGEINT and casts in the outer select);
    one division + round at 6dp per cell; the year spine is whatever
    years the data has (both engines derive it from the same rows).

    Scale: a pivot is a partial-aggregating groupBy with |categories|
    conditional sums -- one shuffle of (year, 5 cells); |years| rows
    out."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_PIVOT_SPARK_SQL)
