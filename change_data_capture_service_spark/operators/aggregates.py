"""Aggregation operators (SURVEY.md §2.2 X5). The reference has no
aggregations (SURVEY.md §2.1); this is the Kibana-style analytic surface.

Hash-stability: every float aggregate accumulates in DECIMAL (exact and
accumulation-order-independent, so Spark's parallel partial aggregation and
DuckDB's produce bit-identical results) and casts to DOUBLE at the end --
mirrored in each oracle. Averages are computed as decimal-sum / count in
both engines for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..registry import register


def dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


# registered first: its r01 CORRECTNESS row was a harness crash (array
# output), so it re-proves ahead of the module's already-green keys
# whenever aggregates re-enters the driver's bounded check window
@register("agg_approx_percentile", tags=("agg", "approx"))  # rows-only: t-digest sketches differ per engine
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles: constant memory per group (vs exact
    percentile's full value buffer) -- the 100 TB default for quantiles.

    Scalar columns (not an ``array<double>``): checked outputs must be
    sortable by generic canonicalizers. One aggregate still computes a single
    shared sketch per group; the three probes read from it."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50_price"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("p90_price"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 1000)").alias("p99_price"),
    )


@register(
    "agg_sum_avg_minmax_count",
    tags=("agg", "headline"),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           min(l_quantity) AS min_qty,
           max(l_extendedprice) AS max_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_avg_minmax_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide-agg benchmark.
    Filter pushes to the scan; groupBy gets map-side partial aggregation on
    a 4-ish-group key -- the shuffle moves only |groups|×|aggs| bytes per
    partition no matter how big lineitem is."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_count_distinct",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (Spark expands to two-phase
    aggregate; at 100 TB prefer approx_count_distinct -- next query --
    when ±2% error is acceptable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register("agg_approx_count_distinct", tags=("agg", "approx"))  # rows-only: HLL sketches differ per engine
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate: constant memory per group vs the
    exact expand-and-shuffle -- the 100 TB default. No oracle (DuckDB's HLL
    gives different estimates); driver records the rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
    )


@register(
    "agg_groupby_multi",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, year(l_shipdate)
    """,
)
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-column grouping incl. a computed key (ship year)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_rollup",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
    )


@register(
    "agg_cube",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_grouping_sets",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface -- Catalyst plans it as a single
    expand + aggregate, not three scans)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_percentile",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``). Exact percentile holds the group's values -- at
    100 TB use ``approx_percentile`` (t-digest, constant memory) unless the
    exactness is contractual."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
    )


@register(
    "agg_stats_manual",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(
             (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
             / (count(*) - 1), 6) AS var_qty,
           round(sqrt(
             (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
             / (count(*) - 1)), 6) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev via decimal sum-of-squares (the textbook
    two-moment formula). Built-in ``stddev`` uses Welford partials whose
    float result depends on partition boundaries -- fine statistically,
    useless for cross-engine bit-equality; decimal moments are exact in
    both engines, so the derived doubles match."""
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    sum_q = F.sum(q).cast("double")
    sum_q2 = F.sum(q * q).cast("double")
    n = F.count("*")
    var = (sum_q2 - sum_q * sum_q / n) / (n - 1)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
    )


@register(
    "agg_corr_manual",
    tags=("agg",),
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(
             (count(*) * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
             / (sqrt(count(*) * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
                * sqrt(count(*) * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                         * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))),
             6) AS corr_qty_price
    FROM lineitem
    """,
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal moments (same rationale as
    agg_stats_manual: the built-in corr's partial-merge float path is
    partition-order-dependent; moments are exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    n = F.count("*")
    sq, sp = F.sum(q).cast("double"), F.sum(p).cast("double")
    sqq, spp = F.sum(q * q).cast("double"), F.sum(p * p).cast("double")
    sqp = F.sum(q * p).cast("double")
    corr = (n * sqp - sq * sp) / (F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp))
    return li.agg(n.alias("n"), F.round(corr, 6).alias("corr_qty_price"))


@register(
    "agg_having",
    tags=("agg",),
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) -- expressed as filter-after-agg;
    Catalyst keeps it above the aggregate, where it belongs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("total_spent") > 1500000)
    )


@register(
    "agg_filtered",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_tax = 0) AS DOUBLE)
             AS qty_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause): one scan computes many
    differently-predicated aggregates -- at 100 TB this replaces N filtered
    sub-scans with a single pass. Spark expresses FILTER as count_if /
    sum(when(...)); null-skipping sums make the semantics identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.expr("count_if(l_quantity > 25)").alias("n_bulk"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
        .cast("double")
        .alias("rev_discounted"),
        F.sum(F.when(F.col("l_tax") == 0, dec("l_quantity"))).cast("double").alias("qty_taxfree"),
    )


@register(
    "agg_collect_sorted",
    tags=("agg",),
    oracle="""
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv,
           string_agg(o_orderstatus, '' ORDER BY o_orderstatus) AS statuses,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation with deterministic order: collect_list is
    partition-order-dependent in Spark, so the engine always wraps it in
    array_sort before any output -- here flattened to CSV for cross-engine
    hashing. Sort numerically BEFORE casting to string ('10' < '9' as
    text)."""
    o = load_table(spark, sf_dir, "orders")
    keys_csv = F.array_join(
        F.transform(F.array_sort(F.collect_list("o_orderkey")), lambda x: x.cast("string")), ","
    )
    return o.groupBy("o_custkey").agg(
        keys_csv.alias("keys_csv"),
        F.array_join(F.array_sort(F.collect_list("o_orderstatus")), "").alias("statuses"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_minmax_by",
    tags=("agg",),
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax aggregation): the key of the extreme row
    without a self-join or window sort -- a single partial-aggregating pass
    (this is also how latest_state picks the newest version per key).
    Comparator ties would be nondeterministic in BOTH engines; o_totalprice
    is tie-free here (asserted in tests) -- at scale use a unique
    comparator (e.g. shift the key into low-order bits) or pre-reduce."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "agg_histogram",
    tags=("agg",),
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by arithmetic binning: bucket = floor(x/w) is
    a pure map-side expression, so the shuffle carries only (bucket,
    partial count) -- the scalable shape for distribution profiling (vs
    sorting or percentiles). IEEE double division keeps bucket edges
    bit-identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0)
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "agg_bool",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or (universal + existential quantifiers as
    aggregates): data-quality invariants checked in one partially-combined
    pass over the fact table instead of N count-filter scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.expr("count_if(l_tax = 0)").alias("n_taxfree"),
    )


@register(
    "agg_grouping_flags",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags on a rollup: distinguishes 'NULL because subtotal
    row' from 'NULL in the data' -- without it, rollup output is ambiguous
    for nullable group keys. One aggregation pass produces all levels."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n"),
    )


@register(
    "agg_mode",
    tags=("agg",),
    oracle="""
    SELECT user_id, event_type AS modal_type, CAST(c AS BIGINT) AS n
    FROM (
      SELECT user_id, event_type, count(*) AS c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type (most frequent value, lexicographic
    tiebreak) -- SQL's missing MODE() aggregate. Count-then-rank: the
    (user, type) aggregation partial-combines map-side, and the rank
    window runs over |users| x |types| pre-reduced rows, never raw events.
    Deterministic by construction: ties on count resolve to the smallest
    type name in both engines."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), F.col("c").alias("n"))
    )


@register(
    "agg_weighted_avg",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) /
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS DOUBLE) AS wavg_discount_raw,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) /
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS wavg_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted average discount per return flag -- the weighted
    mean every finance dashboard needs and plain avg() silently gets
    wrong. Both weight products and the denominator accumulate in DECIMAL
    (exact, order-free); the single double division happens once at the
    end, identically in both engines. One conditional-agg scan, one
    partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    num = F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double")
    den = F.sum(dec("l_extendedprice")).cast("double")
    return li.groupBy("l_returnflag").agg(
        (num / den).alias("wavg_discount_raw"),
        F.round(num / den, 6).alias("wavg_discount"),
    )


@register(
    "agg_hist_equi_depth",
    tags=("agg", "analytics"),
    oracle="""
    WITH b AS (
      SELECT list_transform(quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                            x -> round(x, 2)) AS bnds
      FROM orders
    )
    SELECT CAST(len(list_filter(b.bnds, x -> o.o_totalprice > x)) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(o.o_totalprice), 2) AS DOUBLE) AS lo,
           CAST(round(max(o.o_totalprice), 2) AS DOUBLE) AS hi
    FROM orders o CROSS JOIN b
    GROUP BY 1
    """,
)
def agg_hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals: ~10% of rows per
    bucket, with each bucket's realized [lo, hi] span -- the histogram
    that stays readable under heavy tails, and the statistics CBOs
    actually collect.

    Scale: this is deliberately NOT ntile() -- a global ntile is a
    single-reducer sort. Boundaries come from one percentile aggregate
    (swap in approx_percentile's sketch at petabyte scale), broadcast to
    every task, and bucket assignment is a map-side array count of
    boundaries below the value; then one partial-agg shuffle of 10 groups.
    Boundaries round to 2 dp on both engines so interpolation ulps can't
    flip a row across a bucket edge."""
    o = load_table(spark, sf_dir, "orders")
    bnds = o.agg(
        F.expr(
            "transform(percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)),"
            " x -> round(x, 2))"
        ).alias("bnds")
    )
    return (
        o.join(F.broadcast(bnds))
        .select(
            F.expr("size(filter(bnds, x -> o_totalprice > x))").cast("int").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("lo"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("hi"),
        )
    )


@register(
    "agg_heavy_hitters",
    tags=("agg", "analytics"),
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT c.user_id, c.n,
           CAST(round(c.n / t.total, 6) AS DOUBLE) AS share
    FROM c CROSS JOIN t
    ORDER BY c.n DESC, c.user_id
    LIMIT 20
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest keys with their traffic share -- the skew probe run
    before choosing join/salting strategy (the exact small-k counterpart
    of a count-min sketch heavy-hitter pass).

    Scale: count per key partial-aggregates to |keys| rows; the grand
    total is a one-row aggregate of THAT rollup (not a second fact pass)
    cross-joined as a broadcast scalar; final top-k is
    TakeOrderedAndProject. Fact table: exactly one scan, one shuffle of
    (key, count) pairs."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total"), 6).cast("double").alias("share"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(20)
    )


@register(
    "agg_hll_rollup",
    tags=("agg", "approx", "timeseries"),
    # rows-only by design: the estimate is a DataSketches HLL artifact with
    # no bit-stable SQL twin; the <2% relative-error bound vs the exact
    # count is pinned in tests/test_round4_ops.py.
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregable distinct counts: build ONE HLL sketch per (day, type)
    partial, then answer per-day distinct users by UNIONING the sketches --
    never re-touching the fact table. This is the sketch algebra every
    100 TB rollup pipeline runs on (persist hourly/daily sketch partials;
    any coarser grain or ad-hoc union of days is a merge of kilobyte
    states), where exact count_distinct would need a full re-shuffle of
    raw user ids per query grain.

    Spark 4 ships Apache DataSketches HLL natively (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate -- public API), so the whole
    operator is JVM aggregates: one partial-agg shuffle to the finest
    grain, then a second tiny merge of |days|x|types| sketch blobs."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    partials = e.groupBy(day, "event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count("*").alias("n"),
    )
    return (
        partials.groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n").alias("n_events"),
        )
        .select("day", "approx_users", "n_events")
    )


MG_CAPACITY, MG_TOPK = 64, 20


@register("approx_topk", tags=("agg", "sketch", "text"))  # rows-only: sketch estimates
def approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters over the document token stream via
    mergeable Misra-Gries summaries (Agarwal et al., "Mergeable
    Summaries", PODS'12 -- the frequent-items sketch DataSketches ships):
    each partition folds its tokens into a capacity-64 summary, summaries
    merge by counter addition + compress, and the merged top-20 is
    reported with deterministic error <= N/64 per count. The sketch twin
    of agg_hll_rollup (distinct-count) and agg_heavy_hitters (exact
    counterpart): same mergeable-partial-aggregate shape, bounded state.

    Per Arrow batch the counting is a vectorized value_counts (no
    per-token Python); only the vocabulary-sized merge loop runs in
    Python, once per batch. Rows-only by design (estimates, not exact
    counts); tests/test_round7_ops.py gates the estimates against the
    exact top-k.

    Scale: state is min(|vocab|, 64) counters per partition regardless of
    token volume; the shuffle carries |partitions| x 64 rows. This is the
    operator that survives when agg_heavy_hitters' exact |vocab|-sized
    state does not (open-vocabulary corpora)."""
    import pandas as pd

    from .dedup import _tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tokens()).alias("tok"))

    def mg_partition(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf["tok"].value_counts().items():  # |batch vocab| iterations
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > MG_CAPACITY:
                # mergeable-summaries compress: subtract the (cap+1)-th
                # largest counter, drop non-positive
                cut = sorted(counts.values(), reverse=True)[MG_CAPACITY]
                counts = {t: n - cut for t, n in counts.items() if n > cut}
        if counts:
            yield pd.DataFrame(
                {"tok": list(counts), "cnt": list(counts.values())}
            )

    summaries = toks.mapInPandas(mg_partition, "tok string, cnt long")
    return (
        summaries.groupBy("tok")
        .agg(F.sum("cnt").cast("bigint").alias("est_count"))
        .orderBy(F.col("est_count").desc(), "tok")
        .limit(MG_TOPK)
    )


@register(
    "part_attr_assoc_cramer",
    tags=("agg", "stats"),
    oracle="""
    WITH c AS (
      SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS n
      FROM part GROUP BY 1, 2
    ),
    m AS (
      SELECT p_brand, p_type, n,
             CAST(sum(n) OVER (PARTITION BY p_brand) AS BIGINT) AS n_row,
             CAST(sum(n) OVER (PARTITION BY p_type) AS BIGINT) AS n_col,
             CAST(sum(n) OVER () AS BIGINT) AS n_tot,
             CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS _r,
             CAST(count(*) OVER (PARTITION BY p_type) AS BIGINT) AS _c
      FROM c
    ),
    chi AS (
      SELECT CAST(sum(CAST(round(
               (n - CAST(n_row AS DOUBLE) * n_col / n_tot)
               * (n - CAST(n_row AS DOUBLE) * n_col / n_tot)
               / (CAST(n_row AS DOUBLE) * n_col / n_tot), 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS chi2,
             CAST(min(n_tot) AS BIGINT) AS n_tot,
             CAST(count(DISTINCT p_brand) AS BIGINT) AS k_rows,
             CAST(count(DISTINCT p_type) AS BIGINT) AS k_cols
      FROM m
    )
    SELECT round(chi2, 4) AS chi2,
           n_tot AS n_parts, k_rows AS n_brands, k_cols AS n_types,
           round(sqrt(chi2 / (n_tot *
                 (CASE WHEN k_rows < k_cols THEN k_rows ELSE k_cols END - 1))),
                 6) AS cramers_v
    FROM chi
    """,
)
def part_attr_assoc_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association between brand and part type: chi-square over
    the observed-vs-independence contingency table, normalized to Cramér's
    V (0 = independent assortment, 1 = brand determines type) -- the
    feature-redundancy screen a training pipeline runs before one-hot
    encoding both columns. Marginals are window sums over the contingency
    rollup (single fact scan, the round-6 rule); each cell's chi term
    snaps to 6 dp DECIMAL before summing, so the statistic is
    accumulation-order-free.

    Scale: ONE |brands x types|-state partial agg; everything after runs
    on that tiny rollup."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    c = p.groupBy("p_brand", "p_type").agg(F.count("*").cast("bigint").alias("n"))
    wr, wc, wt = (
        Window.partitionBy("p_brand"),
        Window.partitionBy("p_type"),
        Window.partitionBy(),
    )
    m = c.select(
        "p_brand",
        "p_type",
        "n",
        F.sum("n").over(wr).cast("bigint").alias("n_row"),
        F.sum("n").over(wc).cast("bigint").alias("n_col"),
        F.sum("n").over(wt).cast("bigint").alias("n_tot"),
    )
    exp = F.col("n_row").cast("double") * F.col("n_col") / F.col("n_tot")
    term = F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 6).cast(
        "decimal(18,6)"
    )
    chi = m.agg(
        F.sum(term).cast("double").alias("chi2"),
        F.min("n_tot").cast("bigint").alias("n_parts"),
        F.count_distinct("p_brand").cast("bigint").alias("n_brands"),
        F.count_distinct("p_type").cast("bigint").alias("n_types"),
    )
    k_min = F.least(F.col("n_brands"), F.col("n_types"))
    return chi.select(
        F.round("chi2", 4).alias("chi2"),
        "n_parts",
        "n_brands",
        "n_types",
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_parts") * (k_min - 1))), 6
        ).alias("cramers_v"),
    )
