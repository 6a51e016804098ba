"""Exact statistical-test operators (round-7 extension): one-way ANOVA,
two-sample Kolmogorov-Smirnov, Mann-Whitney U, and Spearman rank
correlation -- the hypothesis-test layer an analytics engine needs on top
of the moment/quantile aggregates (events_ab_lift_ztest is the z-test
member of this family; these add the variance-decomposition, the
distribution-free, and the rank-based tests).

Cross-engine exactness discipline (registry header rules):
- every sample value routes through ``try_cast(... AS decimal(18,2)) * 100
  -> BIGINT`` cents so non-finite doubles NULL out instead of throwing and
  all accumulation is integer/DECIMAL(38,0), accumulation-order-free;
- rank statistics use DOUBLED average ranks (2*rank is always integral
  under midrank tie handling), so rank sums stay in the integer domain;
- the final test statistic is one shared double-valued closed form over
  those exact aggregates, rounded to 6dp on both engines.

Scale design: every test reduces the fact table to either a per-group
moment row (ANOVA), a per-distinct-value count row (KS, U, Spearman), or
both, before any window runs. The only ordered windows run over the
DISTINCT VALUE DOMAIN (cents values), which is bounded by price/value
range, not by row count -- no global row sort ever happens, which is what
makes these runnable at 10^11 rows (a naive rank() over the fact table
would single-partition the world).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# cents casts: total under NaN/Inf/overflow (NULL, excluded as non-sample)
_PRICE_C = "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
_QTY_C = "try_cast(try_cast(l_quantity AS decimal(18,2)) * 100 AS bigint)"
_VALUE_C = "try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint)"
# public: the one source of truth for o_totalprice cents (relational.py
# imports it for the orders panels)
TOTAL_CENTS = "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)"
_TOTAL_C = TOTAL_CENTS

# Range width (distinct integer values per bucket) for the two-level
# prefix sums below. 2^16 cents = one $655 bucket: a 10^9-distinct-value
# domain compresses to ~15k bucket rows for the level-2 scan while each
# level-1 partition holds at most 2^16 rows.
_RANGE_W = 65536


def _domain_prefix(
    v: DataFrame,
    key: str,
    cols: list[str],
    *,
    with_next_key: bool = False,
) -> DataFrame:
    """Two-level RANGE-PARTITIONED prefix sums over a distinct-value
    domain relation -- the scale form of ``sum(x) OVER (ORDER BY key)``
    that never single-partitions the domain.

    ``v`` must hold ONE row per distinct ``key`` (an integer, e.g. cents)
    with bigint count columns ``cols``. Returns ``v``'s rows plus, for
    each name, ``pre_<name>`` = the EXCLUSIVE prefix sum of that column
    over ascending ``key`` (add the row's own value for the inclusive
    form), and -- when ``with_next_key`` -- ``next_<key>``, the next
    distinct key in global order (NULL on the last row).

    Shape: (1) bucket every row by the order-preserving range id
    ``(key - pmod(key, W)) DIV W`` (exact integer floor-division, valid
    for negative cents); (2) one partial agg to per-bucket totals --
    |domain| / W rows; (3) the EXCLUSIVE bucket-prefix runs as an ordered
    window over THAT bounded relation (a 10^9-value domain is ~15k bucket
    rows -- driver-scale, and broadcast back); (4) the within-bucket
    prefix runs under ``Window.partitionBy(bucket)``, so the wide stage
    executes with one task per bucket, each scanning <= W rows.
    All accumulation is integer (bigint), hence order-free -- the
    two-level regrouping cannot change a single result bit, unlike a
    floating-point sum.
    """
    bkt = F.expr(f"({key} - pmod({key}, {_RANGE_W})) DIV {_RANGE_W}").cast("bigint")
    # Barrier the domain relation: it feeds BOTH the broadcast bucket-totals
    # side and the probe side of the join below, and broadcast + streamed
    # sides never share an exchange (ReuseExchange only pairs shuffle
    # twins), so an un-cut `v` -- typically a fact-grain groupBy -- would
    # execute twice per call. `v` is one row per distinct key by contract
    # (domain-bounded), so the checkpoint is small.
    b = v.withColumn("_bkt", bkt).localCheckpoint(eager=False)
    aggs = [F.sum(c).cast("bigint").alias(f"_t_{c}") for c in cols]
    if with_next_key:
        aggs.append(F.min(key).alias("_bmin"))
    t = b.groupBy("_bkt").agg(*aggs)
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    base_cols = [
        F.coalesce(F.sum(f"_t_{c}").over(wb), F.lit(0))
        .cast("bigint")
        .alias(f"_b_{c}")
        for c in cols
    ]
    if with_next_key:
        base_cols.append(
            F.lead("_bmin").over(Window.orderBy("_bkt")).alias("_next_bmin")
        )
    base = t.select("_bkt", *base_cols)
    j = b.join(F.broadcast(base), "_bkt")
    ww = Window.partitionBy("_bkt").orderBy(key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out_cols = list(v.columns) + [
        (F.col(f"_b_{c}") + F.coalesce(F.sum(c).over(ww), F.lit(0)))
        .cast("bigint")
        .alias(f"pre_{c}")
        for c in cols
    ]
    if with_next_key:
        out_cols.append(
            F.coalesce(
                F.lead(key).over(Window.partitionBy("_bkt").orderBy(key)),
                F.col("_next_bmin"),
            ).alias(f"next_{key}")
        )
    return j.select(*out_cols)


@register(
    "lineitem_price_anova_returnflag",
    tags=("stats", "agg"),
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag AS grp, {_PRICE_C} AS c FROM lineitem
      WHERE {_PRICE_C} IS NOT NULL
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DECIMAL(38,0)) AS s,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS q
      FROM s GROUP BY grp
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS DOUBLE)
               AS sum_s2n,
             CAST(sum(s) AS DOUBLE) AS s_all,
             CAST(sum(q) AS DOUBLE) AS q_all
      FROM g
    )
    SELECT k, n_total,
           round((sum_s2n - s_all * s_all / n_total) / (k - 1)
                 / nullif((q_all - sum_s2n) / (n_total - k), 0), 6) AS f_stat,
           round((sum_s2n - s_all * s_all / n_total)
                 / nullif(q_all - s_all * s_all / n_total, 0), 6) AS eta_sq
    FROM t WHERE n_total > k
    """,
)
def lineitem_price_anova_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of line price across return-flag groups: F =
    (SSB/(k-1)) / (SSW/(N-k)) with SSB/SSW decomposed from per-group
    exact sums -- the "does this categorical split explain price
    variance" test, plus eta-squared (SSB/SST) as the effect size.

    Exactness: per-group (n, sum, sum-of-squares) are BIGINT/DECIMAL(38,0)
    over cents (a cents square at 10^11-row scale overflows BIGINT, hence
    the DECIMAL accumulator -- the totality-campaign recipe); the F
    closed form is one shared double expression over those exact moments.
    Degenerate inputs (all values equal -> SSW = 0) yield NULL via the
    nullif guard instead of a division error on either engine.

    Scale: one map-side-combinable partial agg to |groups| rows (k = 3
    here), then scalar arithmetic on the driver-side single row. There is
    no window and no sort; this is the cheapest test in the family."""
    li = load_table(spark, sf_dir, "lineitem")
    c = F.expr(_PRICE_C)
    s = li.select(F.col("l_returnflag").alias("grp"), c.alias("c")).filter(
        F.col("c").isNotNull()
    )
    g = s.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    t = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"))
        .cast("double")
        .alias("sum_s2n"),
        F.sum("s").cast("double").alias("s_all"),
        F.sum("q").cast("double").alias("q_all"),
    )
    ssb = F.col("sum_s2n") - F.col("s_all") * F.col("s_all") / F.col("n_total")
    ssw = F.col("q_all") - F.col("sum_s2n")
    sst = F.col("q_all") - F.col("s_all") * F.col("s_all") / F.col("n_total")
    return t.filter(F.col("n_total") > F.col("k")).select(
        "k",
        "n_total",
        F.round(
            (ssb / (F.col("k") - 1))
            / F.nullif(ssw / (F.col("n_total") - F.col("k")), F.lit(0)),
            6,
        ).alias("f_stat"),
        F.round(ssb / F.nullif(sst, F.lit(0)), 6).alias("eta_sq"),
    )


@register(
    "events_value_ks_weekend",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_VALUE_C} AS c,
             CAST(dayofweek(ts) IN (0, 6) AS BOOLEAN) AS wkd
      FROM events WHERE {_VALUE_C} IS NOT NULL
    ),
    v AS (
      SELECT c,
             CAST(sum(CASE WHEN wkd THEN 1 ELSE 0 END) AS BIGINT) AS c_we,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE 1 END) AS BIGINT) AS c_wd
      FROM s GROUP BY c
    ),
    cum AS (
      SELECT CAST(sum(c_we) OVER (ORDER BY c) AS BIGINT) AS cum_we,
             CAST(sum(c_wd) OVER (ORDER BY c) AS BIGINT) AS cum_wd,
             CAST(sum(c_we) OVER () AS BIGINT) AS n_we,
             CAST(sum(c_wd) OVER () AS BIGINT) AS n_wd
      FROM v
    )
    SELECT n_we AS n_weekend, n_wd AS n_weekday,
           round(CAST(max(abs(cum_we * n_wd - cum_wd * n_we)) AS DOUBLE)
                 / (CAST(n_we AS DOUBLE) * CAST(n_wd AS DOUBLE)), 6) AS ks_d
    FROM cum
    WHERE n_we > 0 AND n_wd > 0
    GROUP BY n_we, n_wd
    """,
)
def events_value_ks_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between weekend and weekday
    event values: D = max over the pooled support of |F_weekend(x) -
    F_weekday(x)| -- the distribution-free "are these two samples from the
    same distribution" test behind seasonality and drift panels
    (events_value_psi_weekly bins first and loses tail resolution; KS is
    the binning-free companion).

    Exactness: the CDF difference is kept in the INTEGER cross-multiplied
    form |cum_we * n_wd - cum_wd * n_we| (no per-step division), so the
    max is over exact integers; exactly one division happens at the end.
    Weekend membership uses day-of-week integers on both engines (Spark
    dayofweek: Sun=1/Sat=7; DuckDB: Sun=0/Sat=6).

    Scale: events reduce to one row per DISTINCT cents value (bounded by
    the value domain, not row count) with per-group counts; the ordered
    prefix sum runs over that bounded domain in the TWO-LEVEL
    range-partitioned form (_domain_prefix: per-range partial totals
    broadcast back + in-partition scans, one task per 2^16-cent range)
    -- never a global row sort, never a single-task domain scan. The
    integer accumulation makes the regrouping exactly result-preserving.
    Grand totals come from a plain agg (a windowless reduce), not an
    unbounded window."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    s = e.select(
        c.alias("c"), F.dayofweek("ts").isin(1, 7).alias("wkd")
    ).filter(F.col("c").isNotNull())
    v = s.groupBy("c").agg(
        F.sum(F.when(F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("c_we"),
        F.sum(F.when(F.col("wkd"), 0).otherwise(1)).cast("bigint").alias("c_wd"),
    )
    tot = v.agg(
        F.sum("c_we").cast("bigint").alias("n_we"),
        F.sum("c_wd").cast("bigint").alias("n_wd"),
    )
    cum = (
        _domain_prefix(v, "c", ["c_we", "c_wd"])
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("pre_c_we") + F.col("c_we")).cast("bigint").alias("cum_we"),
            (F.col("pre_c_wd") + F.col("c_wd")).cast("bigint").alias("cum_wd"),
            "n_we",
            "n_wd",
        )
    )
    d_num = F.abs(
        F.col("cum_we") * F.col("n_wd") - F.col("cum_wd") * F.col("n_we")
    )
    return (
        cum.filter((F.col("n_we") > 0) & (F.col("n_wd") > 0))
        .groupBy(
            F.col("n_we").alias("n_weekend"), F.col("n_wd").alias("n_weekday")
        )
        .agg(
            F.round(
                F.max(d_num).cast("double")
                / (F.col("n_we").cast("double") * F.col("n_wd").cast("double")),
                6,
            ).alias("ks_d")
        )
    )


@register(
    "events_mannwhitney_purchase_ab",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_VALUE_C} AS c,
             CAST(user_id % 2 = 0 AS BOOLEAN) AS treat
      FROM events
      WHERE event_type = 'purchase' AND {_VALUE_C} IS NOT NULL
    ),
    v AS (
      SELECT c,
             CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT) AS c_c
      FROM s GROUP BY c
    ),
    r AS (
      SELECT c_t, c_c, c_t + c_c AS m,
             CAST(coalesce(sum(c_t + c_c) OVER (
               ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS before
      FROM v
    ),
    agg AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
             CAST(sum(c_c) AS BIGINT) AS n_c,
             CAST(sum(CAST(c_t AS DECIMAL(38,0)) * (2 * before + m + 1))
               AS DECIMAL(38,0)) AS r2_t,
             CAST(sum(CAST(m AS DECIMAL(38,0)) * m * m - m) AS DECIMAL(38,0))
               AS tie3
      FROM r
    )
    SELECT n_t AS n_treat, n_c AS n_control,
           round((CAST(r2_t AS DOUBLE) - CAST(n_t AS DOUBLE) * (n_t + 1)) / 2
                 - CAST(n_t AS DOUBLE) * n_c / 2, 6) AS u_centered,
           round(((CAST(r2_t AS DOUBLE) - CAST(n_t AS DOUBLE) * (n_t + 1)) / 2
                  - CAST(n_t AS DOUBLE) * n_c / 2)
                 / nullif(sqrt(CAST(n_t AS DOUBLE) * n_c / 12
                     * ((n_t + n_c + 1)
                        - CAST(tie3 AS DOUBLE)
                          / (CAST(n_t + n_c AS DOUBLE) * (n_t + n_c - 1)))), 0),
                 6) AS z
    FROM agg WHERE n_t > 0 AND n_c > 0 AND n_t + n_c > 1
    """,
)
def events_mannwhitney_purchase_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test on purchase values between the two
    experiment arms (same deterministic user-parity assignment as
    events_ab_lift_ztest): the nonparametric companion to that z-test --
    it detects distributional shift in spend even when means match.
    Reports U - E[U] (centered) and the tie-corrected normal z.

    Exactness: midrank tie handling keeps DOUBLED rank sums integral --
    for a tied block of m values starting after `before` pooled rows, the
    doubled average rank is 2*before + m + 1, so sum(c_t * that) is an
    exact DECIMAL(38,0); the tie-correction term sum(m^3 - m) likewise.
    The z closed form is one shared double expression, NULL (not a throw)
    when the pooled sample is degenerate (all values tied -> zero
    variance).

    Scale: same per-distinct-value reduction as the KS operator -- counts
    per cents value, then the exclusive prefix sum over the bounded value
    domain in the two-level range-partitioned form (_domain_prefix: one
    task per 2^16-cent range, never a single-task domain scan), then a
    single-row reduce. The fact table is scanned once, never sorted."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    s = e.filter(F.col("event_type") == "purchase").select(
        c.alias("c"), (F.col("user_id") % 2 == 0).alias("treat")
    ).filter(F.col("c").isNotNull())
    v = s.groupBy("c").agg(
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).cast("bigint").alias("c_t"),
        F.sum(F.when(F.col("treat"), 0).otherwise(1)).cast("bigint").alias("c_c"),
    ).withColumn("m", (F.col("c_t") + F.col("c_c")).cast("bigint"))
    r = _domain_prefix(v, "c", ["m"]).select(
        "c_t", "c_c", "m", F.col("pre_m").alias("before")
    )
    agg = r.agg(
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.sum("c_c").cast("bigint").alias("n_c"),
        F.sum(
            F.col("c_t").cast("decimal(38,0)")
            * (2 * F.col("before") + F.col("m") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2_t"),
        F.sum(
            F.col("m").cast("decimal(38,0)") * F.col("m") * F.col("m") - F.col("m")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n_t, n_c = F.col("n_t").cast("double"), F.col("n_c").cast("double")
    u_centered = (
        F.col("r2_t").cast("double") - n_t * (F.col("n_t") + 1)
    ) / 2 - n_t * n_c / 2
    var = (
        n_t
        * n_c
        / 12
        * (
            (F.col("n_t") + F.col("n_c") + 1)
            - F.col("tie3").cast("double")
            / (
                (F.col("n_t") + F.col("n_c")).cast("double")
                * (F.col("n_t") + F.col("n_c") - 1)
            )
        )
    )
    return agg.filter(
        (F.col("n_t") > 0)
        & (F.col("n_c") > 0)
        & (F.col("n_t") + F.col("n_c") > 1)
    ).select(
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_control"),
        F.round(u_centered, 6).alias("u_centered"),
        F.round(u_centered / F.nullif(F.sqrt(var), F.lit(0)), 6).alias("z"),
    )


@register(
    "lineitem_spearman_qty_price",
    tags=("stats", "agg"),
    oracle=f"""
    WITH s AS (
      SELECT {_QTY_C} AS x, {_PRICE_C} AS y FROM lineitem
      WHERE {_QTY_C} IS NOT NULL AND {_PRICE_C} IS NOT NULL
    ),
    rx AS (
      SELECT x, CAST(count(*) AS BIGINT) AS cnt,
             CAST(2 * coalesce(sum(count(*)) OVER (
               ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + count(*) + 1 AS BIGINT) AS r2
      FROM s GROUP BY x
    ),
    ry AS (
      SELECT y, CAST(count(*) AS BIGINT) AS cnt,
             CAST(2 * coalesce(sum(count(*)) OVER (
               ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + count(*) + 1 AS BIGINT) AS r2
      FROM s GROUP BY y
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx.r2) AS DECIMAL(38,0)) AS sx,
             CAST(sum(ry.r2) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(rx.r2 AS DECIMAL(38,0)) * rx.r2) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(ry.r2 AS DECIMAL(38,0)) * ry.r2) AS DECIMAL(38,0)) AS syy,
             CAST(sum(CAST(rx.r2 AS DECIMAL(38,0)) * ry.r2) AS DECIMAL(38,0)) AS sxy
      FROM s JOIN rx ON s.x = rx.x JOIN ry ON s.y = ry.y
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0),
                 6) AS spearman_rho
    FROM m WHERE n > 1
    """,
)
def lineitem_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and line price: Pearson
    over midrank-tied ranks -- the monotonic-association measure that is
    robust to the price outliers a linear correlation chases
    (customer_balance_vs_spend is the Pearson member of the family).

    Exactness: doubled midranks (2*rank always integral) come from the
    per-distinct-value reduction -- for value v with cnt ties after
    `before` smaller rows, 2*avgrank = 2*before + cnt + 1 -- and all five
    Pearson moments accumulate in DECIMAL(38,0); rho is one shared double
    closed form over them, NULL when either variable is constant.

    Scale: ONE fact pass reduces to the (quantity, price) JOINT domain
    (bounded by |qty domain| x |price domain| -- both price-range
    bounded); the marginal rank maps, their two-level range-partitioned
    prefixes (_domain_prefix) and the five Pearson moments are all
    computed at the domain grain with the cell count as an integer
    weight. Summing w-weighted integer products over the joint domain
    IS the per-fact-row sum (integer/DECIMAL accumulation is order-free
    and the regrouping is exact), so no result bit can change. The fact
    table is never globally sorted NOR re-scanned per marginal; a naive
    rank() window over rows would single-partition 10^11 rows and is
    exactly what this shape avoids."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.expr(_QTY_C).alias("x"), F.expr(_PRICE_C).alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    xy = (
        s.groupBy("x", "y")
        .agg(F.count("*").cast("bigint").alias("w"))
        # barrier: both marginal rank maps and the moment agg consume the
        # joint-domain reduction -- un-cut, the fact-grain groupBy would
        # run once per consumer
        .localCheckpoint(eager=False)
    )

    def rank_map(col: str) -> DataFrame:
        cnt = xy.groupBy(col).agg(F.sum("w").cast("bigint").alias("cnt"))
        return _domain_prefix(cnt, col, ["cnt"]).select(
            col,
            (2 * F.col("pre_cnt") + F.col("cnt") + 1)
            .cast("bigint")
            .alias(f"r2_{col}"),
        )

    # the rank maps are |distinct values| rows (domain-bounded): broadcast
    # them so the joint-domain cells never shuffle -- the moment agg stays
    # map-side
    joined = xy.join(F.broadcast(rank_map("x")), "x").join(
        F.broadcast(rank_map("y")), "y"
    )
    wd = F.col("w").cast("decimal(38,0)")
    m = joined.agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(wd * F.col("r2_x")).cast("decimal(38,0)").alias("sx"),
        F.sum(wd * F.col("r2_y")).cast("decimal(38,0)").alias("sy"),
        F.sum(wd * F.col("r2_x") * F.col("r2_x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(wd * F.col("r2_y") * F.col("r2_y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(wd * F.col("r2_x") * F.col("r2_y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    denx = F.sqrt(
        n * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    deny = F.sqrt(
        n * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return m.filter(F.col("n") > 1).select(
        "n",
        F.round(num / F.nullif(denx * deny, F.lit(0)), 6).alias("spearman_rho"),
    )


@register(
    "lineitem_ols_price_on_qty",
    tags=("stats", "agg"),
    oracle=f"""
    WITH s AS (
      SELECT {_QTY_C} AS x, {_PRICE_C} AS y FROM lineitem
      WHERE {_QTY_C} IS NOT NULL AND {_PRICE_C} IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM s
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6)
             AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
                    * CAST(sx AS DOUBLE))
                 / n / 100, 6) AS intercept_dollars,
           round(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / nullif((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0), 6)
             AS r2
    FROM m WHERE n > 1
    """,
)
def lineitem_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple linear regression of line price on quantity: closed-form
    OLS slope, intercept (dollars), and R-squared from the five exact
    moments -- the parametric companion to lineitem_spearman_qty_price
    (rank association) and trend_linear_fit (price on TIME). One formula
    family, three association measures, all oracle-checkable.

    Exactness: all five moments accumulate in DECIMAL(38,0) over cents
    (order-free); slope/intercept/R2 are one shared double closed form,
    NULL via nullif when x or y is constant (vertical/degenerate fit).

    Scale: a single map-side-combinable partial agg to one moment row --
    no window, no join; the cheapest possible plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.expr(_QTY_C).alias("x"), F.expr(_PRICE_C).alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    m = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / F.nullif(var_x, F.lit(0))
    return m.filter(F.col("n") > 1).select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n / 100, 6).alias("intercept_dollars"),
        F.round(
            F.pow(cov_n, 2) / F.nullif(var_x * var_y, F.lit(0)), 6
        ).alias("r2"),
    )


@register(
    "customer_survival_km",
    tags=("stats", "analytics"),
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ),
    horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    spans AS (
      SELECT f.o_custkey,
             CAST(CASE WHEN s.o_orderdate IS NOT NULL
                  THEN date_diff('day', f.o_orderdate, s.o_orderdate)
                  ELSE date_diff('day', f.o_orderdate, horizon.h)
             END AS BIGINT) AS duration,
             CAST(s.o_orderdate IS NOT NULL AS INT) AS event
      FROM ranked f
      LEFT JOIN ranked s ON f.o_custkey = s.o_custkey AND s.rn = 2
      CROSS JOIN horizon
      WHERE f.rn = 1
    ),
    grid AS (
      SELECT duration,
             CAST(sum(event) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM spans GROUP BY duration
    ),
    risk AS (
      SELECT duration, d,
             CAST((SELECT count(*) FROM spans) AS BIGINT)
               - CAST(coalesce(sum(leaving) OVER (
                   ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS n_risk
      FROM grid
    )
    SELECT duration AS duration_days, n_risk, d AS n_events,
           round(exp(sum(ln(1 - CAST(d AS DOUBLE) / n_risk)) OVER (
             ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )), 6) AS survival
    FROM risk WHERE d > 0 AND d < n_risk
    """,
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-second-order: the repeat-
    purchase survival analysis marketing teams run -- S(t) = product over
    event times <= t of (1 - d_i/n_i), where customers who never
    reordered are RIGHT-CENSORED at the data horizon (dropping them, as a
    naive repeat-rate query does, biases retention low; censoring is the
    entire point of the estimator). Emits one row per event time with
    the at-risk count, events, and the survival estimate.

    Exactness: durations, event counts d_i, and at-risk counts n_i are
    exact integers (at-risk = total minus everyone who left strictly
    earlier; deaths and same-day censorings both count as at risk at t,
    the standard convention); the product is computed as
    exp(running-sum of ln terms) with identical expression shape on both
    engines and a 6dp final round (the entropy-family ln precedent).
    Times where everyone at risk dies (d = n_risk, survival 0, ln
    singular) are excluded by the d < n_risk guard on both sides.

    Scale: |customers|-grain first/second-order reduction (one keyed
    window over orders), then every remaining relation is the |distinct
    durations| grid -- day-domain bounded, not data bounded: a 30-year
    horizon is ~11k rows FOREVER, so the ordered windows here scan a
    bounded driver-scale relation by construction (unlike the cents-domain
    ops, which use _domain_prefix). The survival product is additionally a
    FLOAT running sum (exp of cumulative ln), which must accumulate in one
    deterministic order for cross-engine hash parity -- a second reason
    this op keeps the single sequential scan."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    first = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("t0")
    )
    second = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("t1")
    )
    spans = (
        first.join(second, first["o_custkey"] == second["ck2"], "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t1").isNotNull(), F.datediff(F.col("t1"), F.col("t0"))
            )
            .otherwise(F.datediff(F.col("h"), F.col("t0")))
            .cast("bigint")
            .alias("duration"),
            F.col("t1").isNotNull().cast("int").alias("event"),
        )
    )
    grid = spans.groupBy("duration").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("leaving"),
    )
    total = spans.agg(F.count("*").cast("bigint").alias("n_total"))
    wb = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    risk = grid.crossJoin(F.broadcast(total)).select(
        "duration",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(wb), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    surv = F.round(
        F.exp(
            F.sum(F.log(1 - F.col("d").cast("double") / F.col("n_risk"))).over(wc)
        ),
        6,
    )
    return (
        risk.withColumn("survival", surv)
        .filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
        .select(
            F.col("duration").alias("duration_days"),
            "n_risk",
            F.col("d").alias("n_events"),
            "survival",
        )
    )


@register(
    "events_mutual_info_type_dow",
    tags=("stats", "analytics"),
    oracle="""
    WITH cell AS (
      SELECT event_type AS x, dayofweek(ts) AS y, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, dayofweek(ts)
    ),
    mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cell GROUP BY x),
    my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cell GROUP BY y),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
    hx AS (
      SELECT -sum(CAST(cx AS DOUBLE) / n.n * ln(CAST(cx AS DOUBLE) / n.n)) AS hx
      FROM mx CROSS JOIN n
    ),
    hy AS (
      SELECT -sum(CAST(cy AS DOUBLE) / n.n * ln(CAST(cy AS DOUBLE) / n.n)) AS hy
      FROM my CROSS JOIN n
    ),
    terms AS (
      SELECT cell.c, mx.cx, my.cy, n.n
      FROM cell JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
    )
    SELECT any_value(n) AS n,
           round(sum(CAST(c AS DOUBLE) / n
                     * ln(CAST(c AS DOUBLE) * n
                          / (CAST(cx AS DOUBLE) * cy))), 6) AS mi,
           round(sum(CAST(c AS DOUBLE) / n
                     * ln(CAST(c AS DOUBLE) * n
                          / (CAST(cx AS DOUBLE) * cy)))
                 / nullif(least(hx.hx, hy.hy), 0), 6) AS nmi
    FROM terms CROSS JOIN hx CROSS JOIN hy
    GROUP BY hx.hx, hy.hy
    """,
)
def events_mutual_info_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week (nats), plus
    the min-entropy-normalized NMI: the information-theoretic "is
    behaviour day-dependent" test -- zero iff the contingency table
    factorizes, and unlike the chi-square family it is comparable across
    table sizes. (part_attr_assoc_cramer is the chi-square effect size;
    this is its information-theoretic sibling.)

    Exactness: all cell/marginal counts are exact integers from one
    partial agg; MI terms are one shared double expression (ln precedent:
    6dp final round). The marginal entropies H(x)/H(y) fold from the
    MARGINAL tables, never from the joined cell relation (folding there
    would double-count repeated marginal probabilities).

    Scale: events reduce to the |types| x 7 contingency table map-side;
    everything downstream is dim-scale arithmetic. dayofweek integers
    differ across engines only by offset (Spark Sun=1..Sat=7, DuckDB
    Sun=0..6), which MI is invariant to -- the y labels never leave the
    query."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        F.col("event_type").alias("x"), F.dayofweek("ts").alias("y")
    ).agg(F.count("*").cast("bigint").alias("c"))
    cell = cell.localCheckpoint(eager=False)  # 3 consumers of one tiny table
    mx = cell.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    my = cell.groupBy("y").agg(F.sum("c").cast("bigint").alias("cy"))
    n = cell.agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        cell.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
    )
    p = F.col("c").cast("double") / F.col("n")
    mi_term = p * F.log(
        F.col("c").cast("double") * F.col("n")
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    hx = (
        mx.crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    F.col("cx").cast("double")
                    / F.col("n")
                    * F.log(F.col("cx").cast("double") / F.col("n"))
                )
            ).alias("hx")
        )
    )
    hy = (
        my.crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    F.col("cy").cast("double")
                    / F.col("n")
                    * F.log(F.col("cy").cast("double") / F.col("n"))
                )
            ).alias("hy")
        )
    )
    return (
        terms.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .groupBy("hx", "hy")
        .agg(
            F.any_value("n").alias("n"),
            F.round(F.sum(mi_term), 6).alias("mi"),
            F.round(
                F.sum(mi_term)
                / F.nullif(F.least(F.col("hx"), F.col("hy")), F.lit(0)),
                6,
            ).alias("nmi"),
        )
        .select("n", "mi", "nmi")
    )


@register(
    "events_poisson_rate_weekend",
    tags=("stats", "analytics"),
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(dayofweek(ts) IN (0, 6) AS BOOLEAN) AS wkd,
             CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN wkd THEN k ELSE 0 END) AS BIGINT) AS k_we,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE k END) AS BIGINT) AS k_wd,
             CAST(count(DISTINCT CASE WHEN wkd THEN day END) AS BIGINT) AS d_we,
             CAST(count(DISTINCT CASE WHEN NOT wkd THEN day END) AS BIGINT) AS d_wd
      FROM d
    )
    SELECT k_we AS n_weekend, k_wd AS n_weekday,
           d_we AS days_weekend, d_wd AS days_weekday,
           round(CAST(k_we AS DOUBLE) / d_we / 24, 6) AS rate_weekend_hr,
           round(CAST(k_wd AS DOUBLE) / d_wd / 24, 6) AS rate_weekday_hr,
           round((CAST(k_we AS DOUBLE) / d_we / 24
                  - CAST(k_wd AS DOUBLE) / d_wd / 24)
                 / nullif(sqrt(CAST(k_we AS DOUBLE) / (CAST(d_we AS DOUBLE) * 24
                                                       * d_we * 24)
                               + CAST(k_wd AS DOUBLE) / (CAST(d_wd AS DOUBLE) * 24
                                                         * d_wd * 24)), 0), 6) AS z
    FROM agg WHERE d_we > 0 AND d_wd > 0
    """,
)
def events_poisson_rate_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test: hourly event rate on weekend days vs
    weekdays, with the normal-approximation z for the rate difference
    (var(k/t) = k/t^2 under Poisson) -- the COUNT-side companion to
    events_value_ks_weekend's value-side test; together they answer "do
    weekends differ in traffic, in spend, or both". Exposure is the
    number of OBSERVED days of each kind times 24 hours, computed from
    the data itself so both engines see identical denominators.

    Exactness: counts and day tallies are exact integers; the rates and
    z are one shared double closed form, NULL on a degenerate window
    (no events at all -> zero variance).

    Scale: one (day, kind) partial agg -- day-domain sized -- then a
    single-row reduce."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek("ts").isin(1, 7).alias("wkd"),
    ).agg(F.count("*").cast("bigint").alias("k"))
    agg = d.agg(
        F.sum(F.when(F.col("wkd"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("k_we"),
        F.sum(F.when(F.col("wkd"), 0).otherwise(F.col("k")))
        .cast("bigint")
        .alias("k_wd"),
        F.count_distinct(F.when(F.col("wkd"), F.col("day")))
        .cast("bigint")
        .alias("d_we"),
        F.count_distinct(F.when(~F.col("wkd"), F.col("day")))
        .cast("bigint")
        .alias("d_wd"),
    )
    r_we = F.col("k_we").cast("double") / F.col("d_we") / 24
    r_wd = F.col("k_wd").cast("double") / F.col("d_wd") / 24
    var = F.col("k_we").cast("double") / (
        F.col("d_we").cast("double") * 24 * F.col("d_we") * 24
    ) + F.col("k_wd").cast("double") / (
        F.col("d_wd").cast("double") * 24 * F.col("d_wd") * 24
    )
    return agg.filter((F.col("d_we") > 0) & (F.col("d_wd") > 0)).select(
        F.col("k_we").alias("n_weekend"),
        F.col("k_wd").alias("n_weekday"),
        F.col("d_we").alias("days_weekend"),
        F.col("d_wd").alias("days_weekday"),
        F.round(r_we, 6).alias("rate_weekend_hr"),
        F.round(r_wd, 6).alias("rate_weekday_hr"),
        F.round((r_we - r_wd) / F.nullif(F.sqrt(var), F.lit(0)), 6).alias("z"),
    )


@register(
    "events_bootstrap_ci_value",
    tags=("stats", "analytics"),
    oracle="""
    WITH base AS (
      SELECT event_id,
             try_cast(try_cast(value AS decimal(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ), base2 AS (
      SELECT * FROM base WHERE v IS NOT NULL
    ), rep AS (
      SELECT b2.v, g.b,
             CASE WHEN substr(md5(CAST(b2.event_id AS VARCHAR) || ':' || CAST(g.b AS VARCHAR)), 1, 2) <= '5d' THEN 0
                  WHEN substr(md5(CAST(b2.event_id AS VARCHAR) || ':' || CAST(g.b AS VARCHAR)), 1, 2) <= 'bb' THEN 1
                  WHEN substr(md5(CAST(b2.event_id AS VARCHAR) || ':' || CAST(g.b AS VARCHAR)), 1, 2) <= 'ea' THEN 2
                  WHEN substr(md5(CAST(b2.event_id AS VARCHAR) || ':' || CAST(g.b AS VARCHAR)), 1, 2) <= 'fa' THEN 3
                  ELSE 4 END AS w
      FROM base2 b2, generate_series(0, 199) AS g(b)
    ), reps AS (
      SELECT b, round(CAST(sum(w * v) AS DOUBLE) / nullif(sum(w), 0) / 100, 6) AS m
      FROM rep GROUP BY b
    ), ci AS (
      SELECT CAST(count(*) AS BIGINT) AS n_replicates,
             round(quantile_cont(m, 0.025), 6) AS ci_lo,
             round(quantile_cont(m, 0.975), 6) AS ci_hi,
             sum(CAST(m AS DECIMAL(18,6))) AS s1,
             sum(CAST(m AS DECIMAL(18,6)) * CAST(m AS DECIMAL(18,6))) AS s2
      FROM reps
    ), obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_obs,
             round(CAST(sum(v) AS DOUBLE) / nullif(count(*), 0) / 100, 6) AS mean_value
      FROM base2
    )
    SELECT n_obs, mean_value, n_replicates,
           round(CASE WHEN n_replicates > 1
                       AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_replicates) >= 0
                 THEN sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_replicates)
                           / (n_replicates - 1)) END, 6) AS boot_se,
           ci_lo, ci_hi
    FROM obs, ci
    """,
)
def events_bootstrap_ci_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean purchase value --
    the resampling method that actually runs on sharded data (Chamandy et
    al. 2012, "Estimating Uncertainty for Massive Data Streams"): instead
    of drawing n rows WITH replacement per replicate (which needs global
    coordination), every row draws an independent Poisson(1) replication
    weight per replicate, computed here from an md5 prefix of
    (event_id, replicate) so both engines see the SAME pseudo-random
    weights. Thresholds on the first two hex chars approximate the
    Poisson(1) pmf to 1/256 resolution (94/94/47/16/5 of 256 for
    w=0..4+).

    Exactness: cents casts make every replicate sum an exact integer;
    replicate means snap to 6dp before the percentile so interpolation
    runs on identical doubles; the bootstrap SE routes through exact
    DECIMAL sum/sum-of-squares (accumulation-order-free).

    Scale: the explode is CPU-only map-side work (B=200 weight draws per
    row); the shuffle after the partial agg is B rows per partition, and
    the replicate table itself is exactly B rows. No resampled copy of
    the data ever materializes -- this is THE bootstrap shape for 10^11
    rows. Reference has no uncertainty quantification at all."""
    B = 200
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = (
        e.select(F.col("event_id"), F.expr(_VALUE_C).alias("v"))
        .filter(F.col("v").isNotNull())
    )
    rep = base.select(
        "event_id", "v", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b")
    )
    t2 = F.substring(F.md5(F.concat_ws(":", F.col("event_id"), F.col("b"))), 1, 2)
    w = (
        F.when(t2 <= "5d", 0)
        .when(t2 <= "bb", 1)
        .when(t2 <= "ea", 2)
        .when(t2 <= "fa", 3)
        .otherwise(4)
    )
    reps = (
        rep.select("v", "b", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w")).cast("bigint").alias("nw"),
            F.sum((F.col("w") * F.col("v")).cast("decimal(38,0)")).alias("sw"),
        )
        .select(
            "b",
            F.round(
                F.col("sw").cast("double") / F.nullif(F.col("nw"), F.lit(0)) / 100, 6
            ).alias("m"),
        )
    )
    md = F.col("m").cast("decimal(18,6)")
    ci = reps.agg(
        F.count("*").cast("bigint").alias("n_replicates"),
        F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        F.sum(md).alias("s1"),
        F.sum(md * md).alias("s2"),
    )
    obs = base.agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.round(
            F.sum(F.col("v").cast("decimal(38,0)")).cast("double")
            / F.nullif(F.count("*"), F.lit(0))
            / 100,
            6,
        ).alias("mean_value"),
    )
    nrep = F.col("n_replicates").cast("double")
    ssq = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / nrep
    )
    return obs.crossJoin(F.broadcast(ci)).select(
        "n_obs",
        "mean_value",
        "n_replicates",
        F.round(
            F.when(
                (F.col("n_replicates") > 1) & (ssq >= 0), F.sqrt(ssq / (nrep - 1))
            ),
            6,
        ).alias("boot_se"),
        "ci_lo",
        "ci_hi",
    )


@register(
    "events_value_emd_weekend",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH base AS (
      SELECT {_VALUE_C} AS v, dayofweek(ts) IN (0, 6) AS wkd
      FROM events WHERE event_type = 'purchase'
    ), b2 AS (SELECT * FROM base WHERE v IS NOT NULL),
    per_v AS (
      SELECT v,
             CAST(sum(CASE WHEN wkd THEN 1 ELSE 0 END) AS BIGINT) AS c_we,
             CAST(sum(CASE WHEN NOT wkd THEN 1 ELSE 0 END) AS BIGINT) AS c_wd
      FROM b2 GROUP BY v
    ), cum AS (
      SELECT v,
             sum(c_we) OVER (ORDER BY v) AS k_we,
             sum(c_wd) OVER (ORDER BY v) AS k_wd,
             lead(v) OVER (ORDER BY v) AS v_next
      FROM per_v
    ), tot AS (
      SELECT CAST(sum(CASE WHEN wkd THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
             CAST(sum(CASE WHEN NOT wkd THEN 1 ELSE 0 END) AS BIGINT) AS n_wd
      FROM b2
    )
    SELECT n_we, n_wd,
           round(CAST(sum(abs(CAST(k_we AS DECIMAL(38,0)) * n_wd - CAST(k_wd AS DECIMAL(38,0)) * n_we)
                          * CAST(v_next - v AS DECIMAL(38,0))) AS DOUBLE)
                 / (CAST(n_we AS DOUBLE) * n_wd) / 100, 6) AS emd_value
    FROM cum, tot WHERE v_next IS NOT NULL
    GROUP BY n_we, n_wd
    """,
)
def events_value_emd_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the weekend and
    weekday purchase-value distributions: the integral of |F_we - F_wd|
    over the value axis. The KS twin (events_value_ks_weekend) reports
    the WORST pointwise CDF gap; EMD reports the total transport cost in
    VALUE UNITS ("weekend spend distribution sits ~$2.45 away"), which is
    the effect-size number a KS p-value can't give and the metric drift
    monitors prefer for its robustness to single-point wiggles.

    Exactness: per-distinct-cents counts and prefix sums are exact
    integers; each segment contributes |k_we*N_wd - k_wd*N_we| * gap in
    DECIMAL(38,0) (safe to 10^11 rows x 10^6-cent spans), divided once
    at the end.

    Scale: identical shape to the KS operator -- ONE per-distinct-value
    partial agg, then the two-level range-partitioned prefix sum over the
    bounded CENTS DOMAIN (_domain_prefix with next-key stitching: the
    last value of each range reads the following range's first value from
    the broadcast bucket relation), never a global row sort or a
    single-task domain scan."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = e.select(
        F.expr(_VALUE_C).alias("v"),
        F.dayofweek("ts").isin(1, 7).alias("wkd"),
    ).filter(F.col("v").isNotNull())
    per_v = base.groupBy("v").agg(
        F.sum(F.when(F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("c_we"),
        F.sum(F.when(~F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("c_wd"),
    )
    cum = _domain_prefix(per_v, "v", ["c_we", "c_wd"], with_next_key=True).select(
        "v",
        (F.col("pre_c_we") + F.col("c_we")).alias("k_we"),
        (F.col("pre_c_wd") + F.col("c_wd")).alias("k_wd"),
        F.col("next_v").alias("v_next"),
    )
    tot = base.agg(
        F.sum(F.when(F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("n_we"),
        F.sum(F.when(~F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("n_wd"),
    )
    j = cum.crossJoin(F.broadcast(tot)).filter(F.col("v_next").isNotNull())
    term = F.abs(
        F.col("k_we").cast("decimal(38,0)") * F.col("n_wd")
        - F.col("k_wd").cast("decimal(38,0)") * F.col("n_we")
    ) * (F.col("v_next") - F.col("v")).cast("decimal(38,0)")
    return (
        j.groupBy("n_we", "n_wd")
        .agg(F.sum(term).alias("s"))
        .select(
            "n_we",
            "n_wd",
            F.round(
                F.col("s").cast("double")
                / (F.col("n_we").cast("double") * F.col("n_wd"))
                / 100,
                6,
            ).alias("emd_value"),
        )
    )


@register(
    "lineitem_theilsen_price_trend",
    tags=("stats", "relational"),
    oracle=f"""
    WITH m AS (
      SELECT date_trunc('month', l_shipdate) AS mon,
             round(CAST(sum(CAST(p AS DECIMAL(38,0))) AS DOUBLE) / count(*) / 100, 6) AS y
      FROM (SELECT {_PRICE_C} AS p, l_shipdate FROM lineitem) WHERE p IS NOT NULL
      GROUP BY 1
    ), mi AS (
      SELECT y, row_number() OVER (ORDER BY mon) - 1 AS x FROM m
    ), slopes AS (
      SELECT round((b.y - a.y) / (b.x - a.x), 6) AS sl
      FROM mi a JOIN mi b ON a.x < b.x
    ), sl AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             round(quantile_cont(sl, 0.5), 6) AS slope
      FROM slopes
    )
    SELECT CAST(count(*) AS BIGINT) AS n_months, n_pairs, slope,
           round(quantile_cont(round(y - slope * x, 6), 0.5), 6) AS intercept
    FROM mi, sl GROUP BY n_pairs, slope
    """,
)
def lineitem_theilsen_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the monthly mean line-item price: the
    median of all pairwise month-to-month slopes (then median intercept
    given that slope) -- the estimator with a 29% breakdown point, so a
    few promo-crazy or fat-fingered months cannot drag the trend the way
    they drag OLS (lineitem_ols_price_on_qty is the L2 sibling). The
    published way to fit trends on dirty operational data.

    Exactness: monthly means come from exact DECIMAL cents sums; pair
    slopes snap to 6dp before the median, so interpolation runs on
    identical doubles; the scalar slope broadcasts back for the
    intercept pass.

    Scale: pairs form over the MONTH DOMAIN (C(|months|, 2) ~ 3.4k rows
    at 83 months -- bounded by calendar span, not data volume), after
    the fact table has already reduced to |months| partial-agg states.
    A Theil-Sen over raw rows would be O(N^2) and is exactly what this
    construction avoids."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            F.expr(_PRICE_C).alias("p"),
            F.date_trunc("month", "l_shipdate").alias("mon"),
        )
        .filter(F.col("p").isNotNull())
        .groupBy("mon")
        .agg(
            F.round(
                F.sum(F.col("p").cast("decimal(38,0)")).cast("double")
                / F.count("*")
                / 100,
                6,
            ).alias("y")
        )
    )
    wm = Window.orderBy("mon")
    mi = m.select("mon", "y", (F.row_number().over(wm) - 1).alias("x")).localCheckpoint(
        eager=False
    )
    a, b = mi.alias("a"), mi.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.round((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x")), 6).alias(
            "sl"
        )
    )
    sl = slopes.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.expr("percentile(sl, 0.5)"), 6).alias("slope"),
    )
    return (
        mi.crossJoin(F.broadcast(sl))
        .select(
            "n_pairs",
            "slope",
            F.round(F.col("y") - F.col("slope") * F.col("x"), 6).alias("ic"),
        )
        .groupBy("n_pairs", "slope")
        .agg(
            F.count("*").cast("bigint").alias("n_months"),
            F.round(F.expr("percentile(ic, 0.5)"), 6).alias("intercept"),
        )
        .select("n_months", "n_pairs", "slope", "intercept")
    )


@register(
    "lineitem_price_mann_kendall",
    tags=("stats", "relational"),
    oracle=f"""
    WITH m AS (
      SELECT date_trunc('month', l_shipdate) AS mon,
             CAST(sum(CAST(p AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT {_PRICE_C} AS p, l_shipdate FROM lineitem) WHERE p IS NOT NULL GROUP BY 1
    ), pairs AS (
      SELECT sign(CAST(b.s * a.n - a.s * b.n AS DOUBLE)) AS sg
      FROM m a JOIN m b ON a.mon < b.mon
    ), stat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(sg) AS BIGINT) AS s FROM pairs
    ), nrow AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM m)
    SELECT n_months, n_pairs, s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(n_months * (n_months - 1.0) * (2 * n_months + 5) / 18)
                      WHEN s < 0 THEN (s + 1) / sqrt(n_months * (n_months - 1.0) * (2 * n_months + 5) / 18)
                      ELSE 0.0 END, 6) AS z
    FROM nrow, stat
    """,
)
def lineitem_price_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend TEST on the monthly mean line-item price -- the
    nonparametric significance companion to lineitem_theilsen_price_trend
    (Theil-Sen says HOW STEEP, Mann-Kendall says WHETHER the monotone
    trend is real): S = sum over month pairs of sign(mean_j - mean_i),
    z from the exact no-ties variance n(n-1)(2n+5)/18 with the standard
    +/-1 continuity correction. The hydrology-standard pairing for
    trend detection on noisy operational series.

    Exactness: monthly means never materialize as doubles for the
    comparison -- sign(s_j*n_i - s_i*n_j) compares the exact rationals
    by DECIMAL cross-multiplication, so S is an exact integer and z is
    one shared closed form.

    Scale: the fact table reduces to |months| (sum, count) states before
    pairing; the C(|months|, 2) sign pairs live on the calendar domain
    (3,403 rows at 83 months) off a checkpointed month relation."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            F.date_trunc("month", "l_shipdate").alias("mon"),
            F.expr(_PRICE_C).alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .groupBy("mon")
        .agg(
            F.sum(F.col("p").cast("decimal(38,0)")).alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = m.alias("a"), m.alias("b")
    sgn = F.signum(
        (F.col("b.s") * F.col("a.n") - F.col("a.s") * F.col("b.n")).cast("double")
    )
    pairs = a.join(b, F.col("a.mon") < F.col("b.mon")).select(sgn.alias("sg"))
    stat = pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("sg").cast("bigint").alias("s"),
    )
    nrow = m.agg(F.count("*").cast("bigint").alias("n_months"))
    nm = F.col("n_months").cast("double")
    var = nm * (nm - 1) * (2 * nm + 5) / 18
    zed = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return nrow.crossJoin(F.broadcast(stat)).select(
        "n_months", "n_pairs", "s", F.round(zed, 6).alias("z")
    )


@register(
    "orders_kruskal_wallis_priority",
    tags=("stats", "agg"),
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority AS grp, {_TOTAL_C} AS c FROM orders
      WHERE {_TOTAL_C} IS NOT NULL
    ),
    gv AS (
      SELECT grp, c, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1, 2
    ),
    v AS (
      SELECT c, CAST(sum(cnt) AS BIGINT) AS m FROM gv GROUP BY 1
    ),
    r AS (
      SELECT c, m,
             CAST(coalesce(sum(m) OVER (
               ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS before
      FROM v
    ),
    per_grp AS (
      SELECT gv.grp,
             CAST(sum(gv.cnt) AS BIGINT) AS n_g,
             CAST(sum(CAST(gv.cnt AS DECIMAL(38,0)) * (2 * r.before + r.m + 1))
               AS DECIMAL(38,0)) AS r2_g
      FROM gv JOIN r ON gv.c = r.c
      GROUP BY 1
    ),
    ties AS (
      SELECT CAST(sum(CAST(m AS DECIMAL(38,0)) * m * m - m) AS DECIMAL(38,0)) AS tie3,
             CAST(sum(m) AS BIGINT) AS n
      FROM v
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, any_value(t.n) AS n, any_value(t.tie3) AS tie3,
             sum(CAST(r2_g AS DOUBLE) * r2_g / n_g) AS sr
      FROM per_grp CROSS JOIN ties t
    )
    SELECT n, k, CAST(k - 1 AS BIGINT) AS dof,
           round((3.0 * sr / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / nullif(1 - CAST(tie3 AS DOUBLE)
                              / (CAST(n AS DOUBLE) * n * n - n), 0),
                 6) AS h
    FROM agg WHERE n > 1 AND k > 1
    """,
)
def orders_kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five order priorities on total price --
    the k-group generalization of events_mannwhitney_purchase_ab and the
    rank-based (distribution-free) companion to
    lineitem_price_anova_returnflag: does ANY priority class's price
    distribution sit systematically higher, without assuming normality?
    Reports the tie-corrected H (chi-squared with k-1 dof under H0).

    Exactness: midrank handling keeps DOUBLED rank sums integral (a tied
    block of m values after `before` pooled rows has doubled average rank
    2*before + m + 1), so each group's r2_g = 2*R_g is an exact
    DECIMAL(38,0); with H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1) the
    doubled form gives 3*sum(r2_g^2/n_g)/(N(N+1)) - 3(N+1), divided by
    the same tie correction 1 - sum(m^3-m)/(N^3-N) Mann-Whitney uses.
    One shared double closed form at the end, 6 dp both engines; NULL
    (never a throw) when all values tie.

    Scale: one fact pass to (grp, cents) counts; the value-domain
    relation v gets its exclusive prefix sum via the two-level
    range-partitioned _domain_prefix (one task per 2^16-cent range, no
    single-task domain scan); per-group rank sums join gv back to that
    domain relation on the cents key -- |groups x domain| rows at most,
    never a row-level rank."""
    o = load_table(spark, sf_dir, "orders")
    c = F.expr(_TOTAL_C)
    s = o.select(F.col("o_orderpriority").alias("grp"), c.alias("c")).filter(
        F.col("c").isNotNull()
    )
    gv = (
        s.groupBy("grp", "c")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds v, per-group join
    )
    v = gv.groupBy("c").agg(F.sum("cnt").cast("bigint").alias("m"))
    r = _domain_prefix(v, "c", ["m"]).select(
        "c", "m", F.col("pre_m").alias("before")
    )
    per_grp = (
        gv.join(r, "c")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * (2 * F.col("before") + F.col("m") + 1)
            )
            .cast("decimal(38,0)")
            .alias("r2_g"),
        )
    )
    ties = v.agg(
        F.sum(
            F.col("m").cast("decimal(38,0)") * F.col("m") * F.col("m") - F.col("m")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
        F.sum("m").cast("bigint").alias("n"),
    )
    agg = per_grp.crossJoin(F.broadcast(ties)).agg(
        F.count("*").cast("bigint").alias("k"),
        F.first("n").alias("n"),
        F.first("tie3").alias("tie3"),
        F.sum(F.col("r2_g").cast("double") * F.col("r2_g") / F.col("n_g")).alias("sr"),
    )
    n = F.col("n").cast("double")
    h_raw = 3.0 * F.col("sr") / (n * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)
    corr = 1 - F.col("tie3").cast("double") / (n * n * n - F.col("n"))
    return agg.filter((F.col("n") > 1) & (F.col("k") > 1)).select(
        "n",
        "k",
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.round(h_raw / F.nullif(corr, F.lit(0.0)), 6).alias("h"),
    )


@register(
    "events_welch_ttest_weekend",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_VALUE_C} AS c,
             CAST(dayofweek(ts) IN (0, 6) AS BOOLEAN) AS wkd
      FROM events WHERE {_VALUE_C} IS NOT NULL
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN wkd THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN wkd THEN CAST(c AS DECIMAL(38,0)) ELSE 0 END)
               AS DECIMAL(38,0)) AS s1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE CAST(c AS DECIMAL(38,0)) END)
               AS DECIMAL(38,0)) AS s2,
             CAST(sum(CASE WHEN wkd THEN CAST(c AS DECIMAL(38,0)) * c ELSE 0 END)
               AS DECIMAL(38,0)) AS q1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE CAST(c AS DECIMAL(38,0)) * c END)
               AS DECIMAL(38,0)) AS q2
      FROM s
    ),
    d AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               / (n1 - 1) / n1 AS se1,
             (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               / (n2 - 1) / n2 AS se2
      FROM m WHERE n1 > 1 AND n2 > 1
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           round((m1 - m2) / 100, 6) AS mean_diff_dollars,
           round((m1 - m2) / nullif(sqrt(se1 + se2), 0), 6) AS t_stat,
           round((se1 + se2) * (se1 + se2)
                 / nullif(se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1), 0),
                 6) AS dof_welch
    FROM d
    """,
)
def events_welch_ttest_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between weekend and weekday event
    values, with the Welch-Satterthwaite effective degrees of freedom --
    the parametric companion to the distribution-free pair already in the
    registry (events_mannwhitney_purchase_ab ranks, events_value_ks_weekend
    whole-CDF): same question, mean-difference lens.

    Exactness: the six sufficient moments (n, sum, sum-of-squares per
    group) accumulate as exact DECIMAL(38,0) integer cents in ONE partial
    agg; the t statistic and dof are a shared double closed form from
    those exact operands (identical expression shape on both engines),
    rounded at 6 dp, NULL via nullif on degenerate variance.

    Scale: a single map-side-combinable pass over the fact table to one
    moment row -- no window, no join, no shuffle wider than the 6-column
    partial."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    s = e.select(
        c.alias("c"), F.dayofweek("ts").isin(1, 7).alias("wkd")
    ).filter(F.col("c").isNotNull())
    cd = F.col("c").cast("decimal(38,0)")
    m = s.agg(
        F.sum(F.when(F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("wkd"), 0).otherwise(1)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("wkd"), cd).otherwise(F.lit(0))).cast("decimal(38,0)").alias("s1"),
        F.sum(F.when(F.col("wkd"), F.lit(0)).otherwise(cd)).cast("decimal(38,0)").alias("s2"),
        F.sum(F.when(F.col("wkd"), cd * F.col("c")).otherwise(F.lit(0)))
        .cast("decimal(38,0)").alias("q1"),
        F.sum(F.when(F.col("wkd"), F.lit(0)).otherwise(cd * F.col("c")))
        .cast("decimal(38,0)").alias("q2"),
    ).filter((F.col("n1") > 1) & (F.col("n2") > 1))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    se1 = (
        (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1"))
        / (F.col("n1") - 1) / F.col("n1")
    )
    se2 = (
        (F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / F.col("n2"))
        / (F.col("n2") - 1) / F.col("n2")
    )
    return m.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round((m1 - m2) / 100, 6).alias("mean_diff_dollars"),
        F.round((m1 - m2) / F.nullif(F.sqrt(se1 + se2), F.lit(0.0)), 6).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / F.nullif(se1 * se1 / (n1d - 1) + se2 * se2 / (n2d - 1), F.lit(0.0)),
            6,
        ).alias("dof_welch"),
    )


@register(
    "events_chi_square_type_dow",
    tags=("stats", "analytics"),
    oracle="""
    WITH n AS (
      SELECT event_type AS t, CAST(dayofweek(ts) AS INT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    rt AS (SELECT t, CAST(sum(n) AS BIGINT) AS r FROM n GROUP BY 1),
    ct AS (SELECT d, CAST(sum(n) AS BIGINT) AS c FROM n GROUP BY 1),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM n),
    grid AS (
      SELECT rt.t, ct.d, rt.r, ct.c, coalesce(n.n, 0) AS n
      FROM rt CROSS JOIN ct LEFT JOIN n ON n.t = rt.t AND n.d = ct.d
    )
    SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_types,
           CAST(count(DISTINCT d) AS BIGINT) AS n_dows,
           (count(DISTINCT t) - 1) * (count(DISTINCT d) - 1) AS dof,
           CAST(tot AS BIGINT) AS n,
           round(sum(
             CAST((CAST(n AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c)
                  * (CAST(n AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c)
               AS DOUBLE)
             / (CAST(r AS DOUBLE) * c * tot)), 6) AS chi2,
           round(sqrt(sum(
             CAST((CAST(n AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c)
                  * (CAST(n AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c)
               AS DOUBLE)
             / (CAST(r AS DOUBLE) * c * tot))
             / (tot * least(count(DISTINCT t) - 1, count(DISTINCT d) - 1))), 6)
             AS cramers_v
    FROM grid CROSS JOIN g
    GROUP BY tot
    """,
)
def events_chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between event type and
    day-of-week, with Cramer's V effect size -- the contingency-table
    twin of events_mutual_info_type_dow (information-theoretic) and
    part_attr_assoc_cramer (which measures part attributes; this one
    answers "does WHEN an event happens depend on WHAT it is").

    Exactness: the statistic uses the cross-multiplied integer form
    (n_ij*N - r_i*c_j)^2 in DECIMAL(38,0) -- exact until the single
    division by r_i*c_j*N per cell -- summed over the FULL margin grid
    (unobserved cells contribute their expected count, which the
    observed-rows-only shortcut silently drops). Day-of-week ints are
    engine-native on each side (grouping keys only -- never compared
    across engines).

    Scale: one fact pass to the |types x 7| contingency counts (partial
    agg); margins and the grid are k x 7 driver-scale relations joined
    broadcast. Nothing beyond the first agg touches fact-table rows."""
    e = load_table(spark, sf_dir, "events")
    n = (
        e.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type").alias("t"),
            F.dayofweek("ts").cast("int").alias("d"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    ).localCheckpoint(eager=False)  # margins + grid reuse the counts
    rt = n.groupBy("t").agg(F.sum("n").cast("bigint").alias("r"))
    ct = n.groupBy("d").agg(F.sum("n").cast("bigint").alias("c"))
    g = n.agg(F.sum("n").cast("bigint").alias("tot"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(n), ["t", "d"], "left")
        .select("t", "d", "r", "c", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .crossJoin(F.broadcast(g))
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("tot")
        - F.col("r").cast("decimal(38,0)") * F.col("c")
    )
    cell = (num * num).cast("double") / (
        F.col("r").cast("double") * F.col("c") * F.col("tot")
    )
    chi2 = F.sum(cell)
    kmin = F.least(
        F.count_distinct(F.col("t")) - 1, F.count_distinct(F.col("d")) - 1
    )
    return grid.groupBy("tot").agg(
        F.count_distinct(F.col("t")).cast("bigint").alias("n_types"),
        F.count_distinct(F.col("d")).cast("bigint").alias("n_dows"),
        ((F.count_distinct(F.col("t")) - 1) * (F.count_distinct(F.col("d")) - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.col("tot") * kmin)), 6).alias("cramers_v"),
    ).select(
        "n_types", "n_dows", "dof", F.col("tot").cast("bigint").alias("n"),
        "chi2", "cramers_v",
    )


@register(
    "lineitem_brown_forsythe_returnflag",
    tags=("stats", "agg"),
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag AS grp, {_PRICE_C} AS c FROM lineitem
      WHERE {_PRICE_C} IS NOT NULL AND l_returnflag IS NOT NULL
    ),
    gv AS (
      SELECT grp, c, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, c, cnt,
             CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY c) AS BIGINT) AS cm,
             CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n_g
      FROM gv
    ),
    med AS (
      SELECT grp, n_g,
             min(CASE WHEN cm >= (n_g + 1) // 2 THEN c END)
             + min(CASE WHEN cm >= (n_g + 2) // 2 THEN c END) AS med2
      FROM cum GROUP BY 1, 2
    ),
    z AS (
      SELECT gv.grp, med.n_g,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * abs(2 * gv.c - med2))
               AS DECIMAL(38,0)) AS sd,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * abs(2 * gv.c - med2)
                      * abs(2 * gv.c - med2)) AS DECIMAL(38,0)) AS sd2
      FROM gv JOIN med ON gv.grp = med.grp GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
             sum(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n_g) AS sq_over,
             CAST(sum(sd) AS DOUBLE) AS sd_all,
             sum(CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n_g)
               AS within
      FROM z
    )
    SELECT n, k, CAST(k - 1 AS BIGINT) AS dof1, CAST(n - k AS BIGINT) AS dof2,
           round((CAST(n AS DOUBLE) - k) / (k - 1)
                 * (sq_over - sd_all * sd_all / n)
                 / nullif(within, 0), 6) AS w_stat
    FROM agg WHERE k > 1 AND n > k
    """,
)
def lineitem_brown_forsythe_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across return flags: a
    one-way ANOVA on |x - group median| -- the robust "are these groups
    equally SPREAD" gate that should precede
    lineitem_price_anova_returnflag (whose F test assumes it).

    Exactness: group medians come from ORDER STATISTICS over the cents
    domain (lo/hi midrank picks on per-group cumulative counts), never
    from interpolated quantiles -- so the DOUBLED median (lo+hi) is an
    exact integer, |2x - med2| is an exact integer deviation, and the
    per-group deviation sums (sd, sd2) are exact DECIMAL(38,0); the /4
    rescale of doubled deviations cancels in the W ratio. One shared
    double closed form, 6 dp.

    Scale: one fact pass to (grp, cents) counts; the per-group cumulative
    runs over the value-DOMAIN relation partitioned by group (k tasks,
    each over at most |distinct cents| rows -- at extreme domains, ride
    _domain_prefix per group, same recipe as the KS/Kruskal family);
    deviation sums join the counts back to the k-row broadcast medians."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("grp"), F.expr(_PRICE_C).alias("c")
    ).filter(F.col("c").isNotNull() & F.col("grp").isNotNull())
    gv = (
        s.groupBy("grp", "c")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds cum + the deviation join
    )
    wg = Window.partitionBy("grp").orderBy("c")
    cum = gv.select(
        "grp", "c", "cnt",
        F.sum("cnt").over(wg).cast("bigint").alias("cm"),
        F.sum("cnt").over(Window.partitionBy("grp")).cast("bigint").alias("n_g"),
    )
    med = cum.groupBy("grp", "n_g").agg(
        (
            F.min(F.when(F.col("cm") >= F.expr("(n_g + 1) DIV 2"), F.col("c")))
            + F.min(F.when(F.col("cm") >= F.expr("(n_g + 2) DIV 2"), F.col("c")))
        ).alias("med2")
    )
    d2 = F.abs(2 * F.col("c") - F.col("med2"))
    z = (
        gv.join(F.broadcast(med), "grp")
        .groupBy("grp", "n_g")
        .agg(
            F.sum(F.col("cnt").cast("decimal(38,0)") * d2)
            .cast("decimal(38,0)").alias("sd"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * d2 * d2)
            .cast("decimal(38,0)").alias("sd2"),
        )
    )
    agg = z.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(F.col("sd").cast("double") * F.col("sd").cast("double") / F.col("n_g")).alias("sq_over"),
        F.sum("sd").cast("double").alias("sd_all"),
        F.sum(
            F.col("sd2").cast("double")
            - F.col("sd").cast("double") * F.col("sd").cast("double") / F.col("n_g")
        ).alias("within"),
    )
    return agg.filter((F.col("k") > 1) & (F.col("n") > F.col("k"))).select(
        "n", "k",
        (F.col("k") - 1).cast("bigint").alias("dof1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("dof2"),
        F.round(
            (F.col("n").cast("double") - F.col("k")) / (F.col("k") - 1)
            * (F.col("sq_over") - F.col("sd_all") * F.col("sd_all") / F.col("n"))
            / F.nullif(F.col("within"), F.lit(0.0)),
            6,
        ).alias("w_stat"),
    )


# Jarque-Bera domain gate: fourth powers of cents must stay inside
# DECIMAL(38,0) under summation. |c| <= 10^8 cents ($1M per event) keeps
# c^4 <= 10^32, six orders of headroom for the row count.
_JB_CAP = 100_000_000


@register(
    "events_value_jarque_bera",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_VALUE_C} AS c FROM events
      WHERE event_type = 'purchase' AND {_VALUE_C} IS NOT NULL
        AND abs({_VALUE_C}) <= {_JB_CAP}
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS p1,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS p2,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c) AS DECIMAL(38,0)) AS p3,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c * c) AS DECIMAL(38,0)) AS p4
      FROM s
    ),
    c AS (
      SELECT n,
             CAST(p1 AS DOUBLE) / n AS mu,
             CAST(p2 AS DOUBLE) / n - (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n) AS m2,
             CAST(p3 AS DOUBLE) / n
               - 3 * (CAST(p1 AS DOUBLE) / n) * (CAST(p2 AS DOUBLE) / n)
               + 2 * (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n) AS m3,
             CAST(p4 AS DOUBLE) / n
               - 4 * (CAST(p1 AS DOUBLE) / n) * (CAST(p3 AS DOUBLE) / n)
               + 6 * (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n) * (CAST(p2 AS DOUBLE) / n)
               - 3 * (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n)
                   * (CAST(p1 AS DOUBLE) / n) * (CAST(p1 AS DOUBLE) / n) AS m4
      FROM m WHERE n > 3
    )
    SELECT n,
           round(m3 / nullif(sqrt(m2) * m2, 0), 6) AS skewness,
           round(m4 / nullif(m2 * m2, 0) - 3, 6) AS excess_kurtosis,
           round(CAST(n AS DOUBLE) / 6
                 * ((m3 / nullif(sqrt(m2) * m2, 0)) * (m3 / nullif(sqrt(m2) * m2, 0))
                    + (m4 / nullif(m2 * m2, 0) - 3) * (m4 / nullif(m2 * m2, 0) - 3) / 4),
                 6) AS jb_stat
    FROM c
    """,
)
def events_value_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on purchase values: skewness, excess
    kurtosis, and JB = n/6 (S^2 + K^2/4) -- chi-squared(2) under
    normality. The moment-based gate behind every "can I use the
    parametric test" decision (events_welch_ttest_weekend assumes what
    this measures).

    Exactness: the four raw power sums accumulate as exact DECIMAL(38,0)
    integer cents in ONE partial agg (domain-gated to |value| <= $1M so
    the fourth power keeps six orders of DECIMAL headroom over the row
    count -- gate mirrored in the oracle); central moments and the
    statistic are a shared double closed form (sqrt(m2)*m2 instead of
    pow(m2,1.5): sqrt is IEEE-correctly-rounded, pow is not), 6 dp.

    Scale: a single map-side-combinable pass to one 5-column moment row
    -- the same cheapest-possible shape as the OLS/Welch family."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    s = e.filter(F.col("event_type") == "purchase").select(c.alias("c")).filter(
        F.col("c").isNotNull() & (F.abs(F.col("c")) <= _JB_CAP)
    )
    cd = F.col("c").cast("decimal(38,0)")
    m = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(cd).cast("decimal(38,0)").alias("p1"),
        F.sum(cd * F.col("c")).cast("decimal(38,0)").alias("p2"),
        F.sum(cd * F.col("c") * F.col("c")).cast("decimal(38,0)").alias("p3"),
        F.sum(cd * F.col("c") * F.col("c") * F.col("c")).cast("decimal(38,0)").alias("p4"),
    ).filter(F.col("n") > 3)
    mu = F.col("p1").cast("double") / F.col("n")
    p2n = F.col("p2").cast("double") / F.col("n")
    p3n = F.col("p3").cast("double") / F.col("n")
    p4n = F.col("p4").cast("double") / F.col("n")
    m2 = p2n - mu * mu
    m3 = p3n - 3 * mu * p2n + 2 * mu * mu * mu
    m4 = p4n - 4 * mu * p3n + 6 * mu * mu * p2n - 3 * mu * mu * mu * mu
    skew = m3 / F.nullif(F.sqrt(m2) * m2, F.lit(0.0))
    kurt = m4 / F.nullif(m2 * m2, F.lit(0.0)) - 3
    return m.select(
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(F.col("n").cast("double") / 6 * (skew * skew + kurt * kurt / 4), 6).alias("jb_stat"),
    )


@register(
    "events_runs_test_daily",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    med AS (
      SELECT min(CASE WHEN cm >= (n + 1) // 2 THEN cnt END)
             + min(CASE WHEN cm >= (n + 2) // 2 THEN cnt END) AS med2
      FROM (
        SELECT cnt,
               CAST(count(*) OVER (ORDER BY cnt, day) AS BIGINT) AS cm,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
      )
    ),
    signs AS (
      SELECT day, CAST(2 * cnt > med2 AS BOOLEAN) AS above
      FROM daily CROSS JOIN med WHERE 2 * cnt <> med2
    ),
    chg AS (
      SELECT above,
             CASE WHEN above <> lag(above) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS c
      FROM signs
    ),
    runs AS (
      SELECT CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             CAST(1 + sum(c) AS BIGINT) AS r
      FROM chg
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS runs,
           round((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / nullif(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                               / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2 - 1))), 0),
                 6) AS z
    FROM runs WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def events_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily event-count series: are
    above-median and below-median days randomly interleaved, or do they
    clump (trend/seasonality) or alternate (over-dispersion)? The
    sequence-randomness companion to events_value_acf (which measures
    linear correlation; runs are the sign-pattern version).

    Exactness: the median is the DOUBLED order-statistic form (lo+hi on
    cumulative day counts -- exact integers, no interpolation);
    equal-to-median days are excluded per the classic construction; run
    boundaries come from a lag over the day order. Integer counts feed
    one double z closed form at 6 dp.

    Scale: one fact pass to the |days| daily rollup; everything after is
    calendar-bounded (30 years is ~11k rows) -- the cumulative and lag
    windows run on the day domain, a documented bounded-domain single
    task, never on raw events."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # median + sign passes reuse it
    )
    wc = Window.orderBy("cnt", "day")
    ranked = daily.select(
        "cnt",
        F.count("*").over(wc.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint").alias("cm"),
        F.count("*").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("n"),
    )
    med = ranked.agg(
        (
            F.min(F.when(F.col("cm") >= F.expr("(n + 1) DIV 2"), F.col("cnt")))
            + F.min(F.when(F.col("cm") >= F.expr("(n + 2) DIV 2"), F.col("cnt")))
        ).alias("med2")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(2 * F.col("cnt") != F.col("med2"))
        .select("day", (2 * F.col("cnt") > F.col("med2")).alias("above"))
    )
    wd = Window.orderBy("day")
    runs = signs.select(
        "above",
        F.when(
            F.col("above") != F.lag("above").over(wd), F.lit(1)
        ).otherwise(F.lit(0)).alias("chg"),
    ).agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).cast("bigint").alias("n2"),
        (1 + F.sum("chg")).cast("bigint").alias("r"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = n1d + n2d
    e_r = 1.0 + 2.0 * n1d * n2d / nn
    v_r = 2.0 * n1d * n2d * (2.0 * n1d * n2d - nn) / (nn * nn * (nn - 1))
    return runs.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1)
    ).select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("runs"),
        F.round((F.col("r") - e_r) / F.nullif(F.sqrt(v_r), F.lit(0.0)), 6).alias("z"),
    )


@register(
    "events_gap_memory_coefficient",
    tags=("stats", "timeseries"),
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CAST(epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
             AS BIGINT) AS g
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    pairs AS (
      SELECT g,
             lag(g) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gp
      FROM gaps
    ),
    m AS (
      SELECT CAST(count(g) AS BIGINT) AS n_gaps,
             CAST(sum(CAST(g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0)) AS s2
      FROM gaps WHERE g IS NOT NULL
    ),
    pm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sa,
             CAST(sum(CAST(gp AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sb,
             CAST(sum(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0)) AS saa,
             CAST(sum(CAST(gp AS DECIMAL(38,0)) * gp) AS DECIMAL(38,0)) AS sbb,
             CAST(sum(CAST(g AS DECIMAL(38,0)) * gp) AS DECIMAL(38,0)) AS sab
      FROM pairs WHERE g IS NOT NULL AND gp IS NOT NULL
    )
    SELECT n_gaps, n_pairs,
           round((sqrt(CAST(s2 AS DOUBLE) / n_gaps
                       - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps))
                  - CAST(s1 AS DOUBLE) / n_gaps)
                 / nullif(sqrt(CAST(s2 AS DOUBLE) / n_gaps
                               - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps))
                          + CAST(s1 AS DOUBLE) / n_gaps, 0), 6) AS burstiness_b,
           round((CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / nullif(sqrt(CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                          * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)), 0),
                 6) AS memory_coeff
    FROM m CROSS JOIN pm
    """,
)
def events_gap_memory_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi temporal-pattern pair for per-user inter-event gaps:
    burstiness B = (sigma - mu)/(sigma + mu) over all gaps, and the
    memory coefficient M = Pearson r of consecutive gap pairs -- together
    they place the stream on the (B, M) plane that separates human-bursty
    traffic from Poisson and from periodic automation (Goh & Barabasi
    2008). events_burstiness gives the per-minute Fano factor (rate
    view); this is the inter-arrival view with sequence memory, which
    the Fano factor cannot see.

    Exactness: gaps are exact integer seconds from user-keyed lags; all
    five Pearson moments and both gap moments accumulate in
    DECIMAL(38,0); two double closed forms at 6 dp (sqrt is
    IEEE-correctly-rounded).

    Scale: user-keyed windows (lag twice) -- partitioned by user, never
    global; moments are one map-side-combinable agg each."""
    e = load_table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ONE window pass computes the gap and its predecessor (both lags ride
    # the same sort), so the moment agg and the pair agg share the shuffle
    seq = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            (F.unix_seconds(F.col("ts")) - F.unix_seconds(F.lag("ts").over(wg)))
            .cast("bigint").alias("g"),
        )
        .withColumn("gp", F.lag("g").over(wg))
        .localCheckpoint(eager=False)  # moment agg + pair agg reuse it
    )
    gaps = seq.filter(F.col("g").isNotNull())
    pairs = seq.filter(F.col("g").isNotNull() & F.col("gp").isNotNull())
    gd = F.col("g").cast("decimal(38,0)")
    m = gaps.agg(
        F.count("g").cast("bigint").alias("n_gaps"),
        F.sum(gd).cast("decimal(38,0)").alias("s1"),
        F.sum(gd * F.col("g")).cast("decimal(38,0)").alias("s2"),
    )
    pm = pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(gd).cast("decimal(38,0)").alias("sa"),
        F.sum(F.col("gp").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sb"),
        F.sum(gd * F.col("g")).cast("decimal(38,0)").alias("saa"),
        F.sum(F.col("gp").cast("decimal(38,0)") * F.col("gp")).cast("decimal(38,0)").alias("sbb"),
        F.sum(gd * F.col("gp")).cast("decimal(38,0)").alias("sab"),
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    sig = F.sqrt(F.col("s2").cast("double") / F.col("n_gaps") - mu * mu)
    npd = F.col("n_pairs").cast("double")
    r_num = npd * F.col("sab").cast("double") - F.col("sa").cast("double") * F.col("sb").cast("double")
    r_den = F.sqrt(
        npd * F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa").cast("double")
    ) * F.sqrt(
        npd * F.col("sbb").cast("double") - F.col("sb").cast("double") * F.col("sb").cast("double")
    )
    return m.crossJoin(pm).select(
        "n_gaps",
        "n_pairs",
        F.round((sig - mu) / F.nullif(sig + mu, F.lit(0.0)), 6).alias("burstiness_b"),
        F.round(r_num / F.nullif(r_den, F.lit(0.0)), 6).alias("memory_coeff"),
    )


@register(
    "events_cohens_d_weekend",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_VALUE_C} AS c,
             CAST(dayofweek(ts) IN (0, 6) AS BOOLEAN) AS wkd
      FROM events WHERE {_VALUE_C} IS NOT NULL
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN wkd THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN wkd THEN CAST(c AS DECIMAL(38,0)) ELSE 0 END)
               AS DECIMAL(38,0)) AS s1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE CAST(c AS DECIMAL(38,0)) END)
               AS DECIMAL(38,0)) AS s2,
             CAST(sum(CASE WHEN wkd THEN CAST(c AS DECIMAL(38,0)) * c ELSE 0 END)
               AS DECIMAL(38,0)) AS q1,
             CAST(sum(CASE WHEN wkd THEN 0 ELSE CAST(c AS DECIMAL(38,0)) * c END)
               AS DECIMAL(38,0)) AS q2
      FROM s
    ),
    d AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               AS ss1,
             (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               AS ss2
      FROM m WHERE n1 > 1 AND n2 > 1
    ),
    p AS (
      SELECT n1, n2, m1, m2,
             sqrt((ss1 + ss2) / (n1 + n2 - 2)) AS sp
      FROM d
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           round(sp / 100, 6) AS pooled_sd_dollars,
           round((m1 - m2) / nullif(sp, 0), 6) AS cohens_d,
           round((m1 - m2) / nullif(sp, 0)
                 * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
    FROM p
    """,
)
def events_cohens_d_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) between weekend
    and weekday event values, with the Hedges' g small-sample correction
    factor J = 1 - 3/(4N - 9) -- the EFFECT-SIZE companion to
    events_welch_ttest_weekend: a t statistic says whether the difference
    is detectable at this n, d/g say whether it is LARGE, which is the
    number a mixture rebalance or experiment readout actually acts on.

    Exactness: the same six sufficient moments as Welch (n, sum,
    sum-of-squares per group) accumulate as exact DECIMAL(38,0) integer
    cents in ONE partial agg; d, g, and the pooled SD are a shared double
    closed form from those exact operands, rounded at 6 dp, NULL via
    nullif on degenerate variance.

    Scale: one map-side-combinable pass over the fact table to a single
    moment row -- no window, no join; the reduction shape is identical at
    100 TB."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    s = e.select(
        c.alias("c"), F.dayofweek("ts").isin(1, 7).alias("wkd")
    ).filter(F.col("c").isNotNull())
    cd = F.col("c").cast("decimal(38,0)")
    m = s.agg(
        F.sum(F.when(F.col("wkd"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("wkd"), 0).otherwise(1)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("wkd"), cd).otherwise(F.lit(0))).cast("decimal(38,0)").alias("s1"),
        F.sum(F.when(F.col("wkd"), F.lit(0)).otherwise(cd)).cast("decimal(38,0)").alias("s2"),
        F.sum(F.when(F.col("wkd"), cd * F.col("c")).otherwise(F.lit(0)))
        .cast("decimal(38,0)").alias("q1"),
        F.sum(F.when(F.col("wkd"), F.lit(0)).otherwise(cd * F.col("c")))
        .cast("decimal(38,0)").alias("q2"),
    ).filter((F.col("n1") > 1) & (F.col("n2") > 1))
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    ss1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
    )
    ss2 = (
        F.col("q2").cast("double")
        - F.col("s2").cast("double") * F.col("s2").cast("double") / F.col("n2")
    )
    sp = F.sqrt((ss1 + ss2) / (F.col("n1") + F.col("n2") - 2))
    d = (m1 - m2) / F.nullif(sp, F.lit(0.0))
    return m.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(sp / 100, 6).alias("pooled_sd_dollars"),
        F.round(d, 6).alias("cohens_d"),
        F.round(
            d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)), 6
        ).alias("hedges_g"),
    )


@register(
    "lineitem_kendall_tau_qty_price",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT CAST({_QTY_C} // 100 AS BIGINT) AS x,
             CAST({_PRICE_C} // 1000000 AS BIGINT) AS y
      FROM lineitem
      WHERE {_QTY_C} IS NOT NULL AND {_PRICE_C} IS NOT NULL
    ),
    cell AS (
      SELECT x, y, CAST(count(*) AS DECIMAL(38,0)) AS n
      FROM s GROUP BY 1, 2
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END)
               AS DECIMAL(38,0)) AS conc,
             CAST(sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END)
               AS DECIMAL(38,0)) AS disc
      FROM cell a JOIN cell b ON b.x > a.x
    ),
    marg2 AS (
      SELECT
        (SELECT CAST(sum(n) AS DECIMAL(38,0)) FROM cell) AS nn,
        (SELECT CAST(sum(tx * (tx - 1)) AS DECIMAL(38,0)) FROM (
           SELECT CAST(sum(n) AS DECIMAL(38,0)) AS tx FROM cell GROUP BY x)) AS tx2,
        (SELECT CAST(sum(ty * (ty - 1)) AS DECIMAL(38,0)) FROM (
           SELECT CAST(sum(n) AS DECIMAL(38,0)) AS ty FROM cell GROUP BY y)) AS ty2
    )
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / nullif(sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2
                                - CAST(tx2 AS DOUBLE) / 2)
                               * (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2
                                  - CAST(ty2 AS DOUBLE) / 2)), 0),
                 6) AS tau_b
    FROM pairs, marg2
    """,
)
def lineitem_kendall_tau_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between order quantity and a
    $10k-bucketed extended price, computed EXACTLY from the contingency
    table: concordant/discordant pair masses are cell-count products
    summed over ordered cell pairs, and the tie corrections come from the
    row/column marginals -- the standard tau-b-from-contingency identity
    (Kendall 1945; same construction SPSS/R documents for crosstabs).
    Complements lineitem_spearman_qty_price: Spearman ranks VALUES, tau
    ranks PAIRS, and tau-b is the variant that stays honest under the
    heavy ties integer quantities force.

    Exactness: every operand is an exact integer count; pair masses
    accumulate as DECIMAL(38,0) products (no n^2 overflow at any SF); the
    single double division happens once at the end, rounded 6 dp.

    Scale: the fact table reduces to a |qty buckets| x |price buckets|
    contingency (~50 x ~12 cells) in ONE map-side-combinable agg; the
    pair join is cells^2 -- dim-bounded, independent of row count."""
    li = load_table(spark, sf_dir, "lineitem")
    # integer division on BOTH sides: DuckDB's BIGINT // and Spark's DIV
    # both truncate toward zero (verified empirically: -150 op 100 = -1 in
    # each), so buckets agree for any sign; a float '/' + CAST would NOT
    # (DuckDB rounds the double, Spark truncates it)
    s = li.select(
        F.expr(f"CAST({_QTY_C} DIV 100 AS BIGINT)").alias("x"),
        F.expr(f"CAST({_PRICE_C} DIV 1000000 AS BIGINT)").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    cell = s.groupBy("x", "y").agg(
        F.count("*").cast("decimal(38,0)").alias("n")
    ).localCheckpoint(eager=False)
    a = cell.select(F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("n").alias("an"))
    b = cell.select(F.col("x").alias("bx"), F.col("y").alias("by"), F.col("n").alias("bn"))
    pairs = (
        a.join(F.broadcast(b), F.col("bx") > F.col("ax"))
        .agg(
            F.sum(F.when(F.col("by") > F.col("ay"), F.col("an") * F.col("bn")).otherwise(F.lit(0)))
            .cast("decimal(38,0)").alias("conc"),
            F.sum(F.when(F.col("by") < F.col("ay"), F.col("an") * F.col("bn")).otherwise(F.lit(0)))
            .cast("decimal(38,0)").alias("disc"),
        )
    )
    nn = cell.agg(F.sum("n").cast("decimal(38,0)").alias("nn"))
    tx2 = (
        cell.groupBy("x").agg(F.sum("n").cast("decimal(38,0)").alias("tx"))
        .agg(F.sum(F.col("tx") * (F.col("tx") - 1)).cast("decimal(38,0)").alias("tx2"))
    )
    ty2 = (
        cell.groupBy("y").agg(F.sum("n").cast("decimal(38,0)").alias("ty"))
        .agg(F.sum(F.col("ty") * (F.col("ty") - 1)).cast("decimal(38,0)").alias("ty2"))
    )
    nd = F.col("nn").cast("double")
    n0 = nd * (nd - 1) / 2
    den = F.sqrt(
        (n0 - F.col("tx2").cast("double") / 2) * (n0 - F.col("ty2").cast("double") / 2)
    )
    return (
        pairs.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(tx2))
        .crossJoin(F.broadcast(ty2))
        .select(
            F.col("nn").cast("bigint").alias("n"),
            F.col("conc").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            F.round(
                (F.col("conc").cast("double") - F.col("disc").cast("double"))
                / F.nullif(den, F.lit(0.0)),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "orders_friedman_priority_by_year",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH cell AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS pri,
             CAST(sum(CAST({_TOTAL_C} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM orders WHERE {_TOTAL_C} IS NOT NULL
      GROUP BY 1, 2
    ),
    k AS (SELECT CAST(count(DISTINCT pri) AS BIGINT) AS k FROM cell),
    full_blocks AS (
      SELECT yr FROM cell GROUP BY yr
      HAVING count(*) = (SELECT k FROM k)
    ),
    ranked AS (
      SELECT pri,
             CAST(row_number() OVER (
               PARTITION BY yr
               ORDER BY CAST(s AS DOUBLE) / c, pri
             ) AS BIGINT) AS r
      FROM cell WHERE yr IN (SELECT yr FROM full_blocks)
    ),
    rj AS (
      SELECT pri, CAST(sum(r) AS DECIMAL(38,0)) AS rsum
      FROM ranked GROUP BY pri
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(rsum * rsum) AS DECIMAL(38,0)) AS sr2,
             (SELECT CAST(count(*) AS BIGINT) FROM full_blocks) AS n
      FROM rj
    )
    SELECT n AS n_blocks, k AS k_treatments,
           CAST(k - 1 AS BIGINT) AS dof,
           round(12.0 * CAST(sr2 AS DOUBLE) / (n * k * (k + 1))
                 - 3.0 * n * (k + 1), 6) AS q_stat
    FROM agg WHERE n > 0 AND k > 1
    """,
)
def orders_friedman_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of order priority across order-year blocks:
    within each year, the five priorities are ranked by their mean order
    value, and Q = 12/(nk(k+1)) * sum_j R_j^2 - 3n(k+1) tests whether any
    priority consistently out-earns the others across years (Friedman
    1937 -- the repeated-measures, distribution-free companion to the
    one-way Kruskal-Wallis already registered: KW pools all rows, Friedman
    blocks out the year effect first).

    Exactness: cell means are ONE IEEE division of exact DECIMAL cent
    sums by exact counts (identical in both engines); within-block ranks
    are row_number with the (mean, priority) total-order tiebreak; rank
    sums and their squares stay exact DECIMAL; only years holding all k
    treatments enter (blocks must be complete for the statistic to be
    defined). Means are continuous enough that exact rank ties cannot
    occur (equal doubles fall back to the priority tiebreak
    deterministically on both engines).

    Scale: the fact table reduces to a |years| x |priorities| cell grid
    in one partial agg; everything after is dim-bounded."""
    o = load_table(spark, sf_dir, "orders")
    tc = F.expr(_TOTAL_C)
    cell = (
        o.filter(tc.isNotNull())
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(
            F.sum(tc.cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
            F.count("*").cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    k = cell.select(F.countDistinct("pri").cast("bigint").alias("k"))
    full_blocks = (
        cell.groupBy("yr").agg(F.count("*").alias("npri"))
        .crossJoin(F.broadcast(k))
        .filter(F.col("npri") == F.col("k"))
        .select("yr")
    )
    ranked = (
        cell.join(F.broadcast(full_blocks), "yr", "left_semi")
        .withColumn("m", F.col("s").cast("double") / F.col("c"))
        .withColumn(
            "r",
            F.row_number()
            .over(Window.partitionBy("yr").orderBy("m", "pri"))
            .cast("bigint"),
        )
    )
    rj = ranked.groupBy("pri").agg(F.sum("r").cast("decimal(38,0)").alias("rsum"))
    nb = full_blocks.agg(F.count("*").cast("bigint").alias("n"))
    agg = (
        rj.agg(
            F.count("*").cast("bigint").alias("k"),
            F.sum(F.col("rsum") * F.col("rsum")).cast("decimal(38,0)").alias("sr2"),
        )
        .crossJoin(F.broadcast(nb))
        .filter((F.col("n") > 0) & (F.col("k") > 1))
    )
    nd, kd = F.col("n").cast("double"), F.col("k").cast("double")
    return agg.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.round(
            12.0 * F.col("sr2").cast("double") / (nd * kd * (kd + 1))
            - 3.0 * nd * (kd + 1),
            6,
        ).alias("q_stat"),
    )


@register(
    "lineitem_ansari_bradley_returnflag",
    tags=("stats", "analytics"),
    oracle=f"""
    WITH s AS (
      SELECT {_PRICE_C} AS c,
             CAST(l_returnflag = 'R' AS BOOLEAN) AS g1
      FROM lineitem
      WHERE l_returnflag IN ('R', 'A') AND {_PRICE_C} IS NOT NULL
    ),
    v AS (
      SELECT c,
             CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM s GROUP BY c
    ),
    r AS (
      SELECT c1, c2, c1 + c2 AS m,
             CAST(coalesce(sum(c1 + c2) OVER (
               ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS before
      FROM v
    ),
    tot AS (SELECT CAST(sum(m) AS BIGINT) AS nn FROM r),
    sc AS (
      SELECT c1, c2, m,
             CAST(least(2 * before + m + 1,
                        2 * (nn + 1) - (2 * before + m + 1)) AS BIGINT) AS a2
      FROM r, tot
    ),
    agg AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(CAST(c1 AS DECIMAL(38,0)) * a2) AS DECIMAL(38,0)) AS ab2,
             CAST(sum(CAST(m AS DECIMAL(38,0)) * a2) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(m AS DECIMAL(38,0)) * a2 * a2) AS DECIMAL(38,0)) AS s2
      FROM sc
    )
    SELECT n1 AS n_returned, n2 AS n_accepted,
           round(CAST(ab2 AS DOUBLE) / 2, 6) AS ab_stat,
           round((CAST(ab2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(s1 AS DOUBLE) / (n1 + n2))
                 / nullif(sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2 - 1)
                               * (CAST(s2 AS DOUBLE) / (n1 + n2)
                                  - (CAST(s1 AS DOUBLE) / (n1 + n2))
                                    * (CAST(s1 AS DOUBLE) / (n1 + n2)))), 0),
                 6) AS z
    FROM agg WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def lineitem_ansari_bradley_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley rank test for a SCALE (dispersion) difference in
    extended price between returned ('R') and accepted ('A') line items:
    pooled observations get the center-folded score a = min(r, N+1-r) --
    small at both extremes, large in the middle -- so a group whose
    prices are MORE spread out collects a smaller score sum (Ansari &
    Bradley 1960). Completes the two-sample family: location is covered
    by Mann-Whitney/Welch, the whole CDF by KS; this isolates dispersion,
    the Brown-Forsythe question answered without touching moments.

    Tie handling (documented contract): scores are computed ON midranks
    (score-of-average-rank). Doubling keeps everything integral -- a tied
    block of m values after `before` pooled rows has doubled midrank
    2*before + m + 1 and doubled score min(that, 2(N+1) - that), an exact
    BIGINT -- so the score sums accumulate as exact DECIMAL and the
    normal-approximation z (finite-population moments of sampling n1
    scores without replacement) is one shared double closed form, NULL on
    a degenerate pooled sample.

    Scale: per-distinct-cents reduction, then the two-level
    range-partitioned exclusive prefix (_domain_prefix -- never a
    single-task domain sort), then a 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    c = F.expr(_PRICE_C)
    s = li.filter(F.col("l_returnflag").isin("R", "A")).select(
        c.alias("c"), (F.col("l_returnflag") == "R").alias("g1")
    ).filter(F.col("c").isNotNull())
    v = s.groupBy("c").agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("bigint").alias("c2"),
    ).withColumn("m", (F.col("c1") + F.col("c2")).cast("bigint"))
    # barrier: the scored relation feeds both the broadcast total (nn)
    # and the final reduce -- an un-cut `r` would re-run the whole
    # domain-prefix pipeline (and its fact-grain groupBy) once per side
    r = _domain_prefix(v, "c", ["m"]).select(
        "c1", "c2", "m", F.col("pre_m").alias("before")
    ).localCheckpoint(eager=False)
    tot = r.agg(F.sum("m").cast("bigint").alias("nn"))
    sc = r.crossJoin(F.broadcast(tot)).withColumn(
        "a2",
        F.least(
            2 * F.col("before") + F.col("m") + 1,
            2 * (F.col("nn") + 1) - (2 * F.col("before") + F.col("m") + 1),
        ).cast("bigint"),
    )
    agg = sc.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("a2"))
        .cast("decimal(38,0)").alias("ab2"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("a2"))
        .cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("a2") * F.col("a2"))
        .cast("decimal(38,0)").alias("s2"),
    ).filter((F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    mu = F.col("s1").cast("double") / nd
    var_a = F.col("s2").cast("double") / nd - mu * mu
    return agg.select(
        F.col("n1").alias("n_returned"),
        F.col("n2").alias("n_accepted"),
        F.round(F.col("ab2").cast("double") / 2, 6).alias("ab_stat"),
        F.round(
            (F.col("ab2").cast("double") - n1d * mu)
            / F.nullif(F.sqrt(n1d * n2d / (nd - 1) * var_a), F.lit(0.0)),
            6,
        ).alias("z"),
    )


@register(
    "events_type_dow_stdres_cells",
    tags=("stats", "analytics"),
    oracle="""
    WITH n AS (
      SELECT event_type AS t, CAST(dayofweek(ts) AS INT) + 1 AS d,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT t, d, o,
             CAST(sum(o) OVER (PARTITION BY t) AS BIGINT) AS rt,
             CAST(sum(o) OVER (PARTITION BY d) AS BIGINT) AS ct,
             CAST(sum(o) OVER () AS BIGINT) AS nn
      FROM n
    )
    SELECT t AS event_type, d AS dow, o AS observed,
           round(CAST(rt AS DOUBLE) * ct / nn, 6) AS expected,
           round((o - CAST(rt AS DOUBLE) * ct / nn)
                 / nullif(sqrt(CAST(rt AS DOUBLE) * ct / nn
                               * (1 - CAST(rt AS DOUBLE) / nn)
                               * (1 - CAST(ct AS DOUBLE) / nn)), 0),
                 6) AS std_residual
    FROM m
    """,
)
def events_type_dow_stdres_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted standardized residuals for every cell of the event-type x
    day-of-week contingency: r = (O - E) / sqrt(E (1 - rowshare)
    (1 - colshare)) (Haberman 1973) -- the POST-HOC panel for the
    already-registered events_chi_square_type_dow: the omnibus statistic
    says the table is non-independent, the residual map says WHICH
    (type, weekday) cells drive it (|r| > 2 ~ cell-level significance).

    Exactness: observed counts and both marginals are exact integers from
    ONE contingency reduction (marginals are window sums over the
    dim-bounded cell grid, NOT re-scans of the fact table); expected and
    residual are a shared double closed form rounded 6 dp, NULL on a
    degenerate marginal. Day-of-week is pinned to Spark's 1..7 Sunday
    start (DuckDB's 0..6 shifted by +1).

    Scale: one map-side-combinable pass over events to |types| x 7 cells;
    everything downstream is dim-bounded."""
    e = load_table(spark, sf_dir, "events")
    n = e.groupBy(
        F.col("event_type").alias("t"), F.dayofweek("ts").cast("int").alias("d")
    ).agg(F.count("*").cast("bigint").alias("o"))
    m = (
        n.withColumn("rt", F.sum("o").over(Window.partitionBy("t")).cast("bigint"))
        .withColumn("ct", F.sum("o").over(Window.partitionBy("d")).cast("bigint"))
        .withColumn(
            "nn",
            F.sum("o").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).cast("bigint"),
        )
    )
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("nn")
    den = F.sqrt(
        exp
        * (1 - F.col("rt").cast("double") / F.col("nn"))
        * (1 - F.col("ct").cast("double") / F.col("nn"))
    )
    return m.select(
        F.col("t").alias("event_type"),
        F.col("d").alias("dow"),
        F.col("o").alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round((F.col("o") - exp) / F.nullif(den, F.lit(0.0)), 6).alias("std_residual"),
    )


@register(
    "events_changepoint_binary_seg",
    tags=("stats", "timeseries"),
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT day, y,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(sum(y) OVER (ORDER BY day) AS DECIMAL(38,0)) AS cum,
             CAST(sum(y) OVER () AS DECIMAL(38,0)) AS tot,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM d
    ),
    g AS (
      SELECT day, i, n,
             CAST(cum AS DOUBLE) / i AS mean_left,
             (CAST(tot AS DOUBLE) - CAST(cum AS DOUBLE)) / (n - i) AS mean_right,
             sqrt(CAST(i AS DOUBLE) * (n - i) / n)
               * abs(CAST(cum AS DOUBLE) / i
                     - (CAST(tot AS DOUBLE) - CAST(cum AS DOUBLE)) / (n - i))
               AS gstat
      FROM p WHERE i < n
    )
    SELECT CAST(day AS TIMESTAMP) AS split_after_day,
           CAST(i AS BIGINT) AS split_index,
           n AS n_days,
           round(mean_left, 6) AS mean_left,
           round(mean_right, 6) AS mean_right,
           round(gstat, 6) AS g_stat
    FROM g
    ORDER BY gstat DESC, day
    LIMIT 1
    """,
)
def events_changepoint_binary_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on the daily event-count series by
    binary segmentation's first split: over every candidate split t, the
    scaled mean-shift statistic G_t = sqrt(t(n-t)/n) |mean_left -
    mean_right| (the two-sample CUSUM form; Scott & Knott 1974 / the AMOC
    case of binary segmentation) -- returns the argmax split with both
    segment means. Complements events_cusum_drift: CUSUM monitors drift
    ONLINE against a fixed baseline; this finds the single best
    retrospective break, the statistic a backfill/repartition decision
    reads.

    Exactness: daily counts and their prefix sums are exact integers
    (DECIMAL accumulate); each candidate's means are single IEEE
    divisions of exact operands -- identical in both engines -- and the
    argmax tiebreak is (g desc, day asc), deterministic.

    Scale: events reduce to |days| rows in one partial agg; the prefix
    sum and argmax run on that dim-bounded series (a 10-year hourly
    series is ~87k rows -- still one broadcastable relation; the fact
    table is never windowed)."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("y"))
    w = Window.orderBy("day")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = d.select(
        "day",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.sum("y").over(w).cast("decimal(38,0)").alias("cum"),
        F.sum("y").over(wall).cast("decimal(38,0)").alias("tot"),
        F.count("*").over(wall).cast("bigint").alias("n"),
    ).filter(F.col("i") < F.col("n"))
    ml = F.col("cum").cast("double") / F.col("i")
    mr = (F.col("tot").cast("double") - F.col("cum").cast("double")) / (
        F.col("n") - F.col("i")
    )
    g = F.sqrt(F.col("i").cast("double") * (F.col("n") - F.col("i")) / F.col("n")) * F.abs(
        ml - mr
    )
    return (
        p.select(
            F.col("day").cast("timestamp").alias("split_after_day"),
            F.col("i").alias("split_index"),
            F.col("n").alias("n_days"),
            F.round(ml, 6).alias("mean_left"),
            F.round(mr, 6).alias("mean_right"),
            F.round(g, 6).alias("g_stat"),
            g.alias("_g"),
        )
        .orderBy(F.col("_g").desc(), "split_after_day")
        .limit(1)
        .drop("_g")
    )


@register(
    "events_daily_bollinger_breaches",
    tags=("stats", "timeseries"),
    oracle=f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST({_VALUE_C} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS v
      FROM events WHERE ts IS NOT NULL AND {_VALUE_C} IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT day, v,
             CAST(count(*) OVER w AS BIGINT) AS wn,
             CAST(sum(v) OVER w AS DECIMAL(38,0)) AS ws,
             CAST(sum(v * v) OVER w AS DECIMAL(38,0)) AS wq
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    b AS (
      SELECT day, v, wn,
             CAST(ws AS DOUBLE) / wn AS mu,
             sqrt(greatest(CAST(wq AS DOUBLE) / wn
                           - (CAST(ws AS DOUBLE) / wn) * (CAST(ws AS DOUBLE) / wn),
                           0)) AS sigma
      FROM r WHERE wn = 7
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           round(CAST(v AS DOUBLE) / 100, 6) AS value_dollars,
           round(mu / 100, 6) AS band_mean_dollars,
           round((CAST(v AS DOUBLE) - mu) / nullif(sigma, 0), 6) AS z
    FROM b
    WHERE abs(CAST(v AS DOUBLE) - mu) > 2 * sigma
    ORDER BY day
    """,
)
def events_daily_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach days on the daily total event value: a
    trailing 7-day rolling mean +/- 2 rolling (population) sigma band,
    reporting the days whose total lands outside it with the band z-score
    (Bollinger's classic volatility envelope, the ops-dashboard form of
    'is today anomalous vs the recent regime') -- the ROLLING companion
    to the fixed-baseline events_cusum_drift and the seasonal
    events_seasonal_residual_anomaly.

    Exactness: daily totals are exact DECIMAL cent sums; the rolling
    n/sum/sum-of-squares come from an exact-integer ROWS frame (order-free
    accumulation), the mean/sigma/z closed form is shared double
    arithmetic rounded 6 dp, sigma=0 windows NULL out via nullif, and
    only complete 7-day windows qualify (wn = 7 -- the warm-up rows can't
    breach a band they define).

    Scale: one partial agg to |days| rows; the ROWS window runs over the
    dim-bounded daily series, never the fact table."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    d = e.filter(F.col("ts").isNotNull() & c.isNotNull()).groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(c.cast("decimal(38,0)")).cast("decimal(38,0)").alias("v"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    r = d.select(
        "day",
        "v",
        F.count("*").over(w).cast("bigint").alias("wn"),
        F.sum("v").over(w).cast("decimal(38,0)").alias("ws"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("decimal(38,0)").alias("wq"),
    ).filter(F.col("wn") == 7)
    mu = F.col("ws").cast("double") / F.col("wn")
    sigma = F.sqrt(
        F.greatest(
            F.col("wq").cast("double") / F.col("wn") - mu * mu, F.lit(0.0)
        )
    )
    return (
        r.filter(F.abs(F.col("v").cast("double") - mu) > 2 * sigma)
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.round(F.col("v").cast("double") / 100, 6).alias("value_dollars"),
            F.round(mu / 100, 6).alias("band_mean_dollars"),
            F.round(
                (F.col("v").cast("double") - mu) / F.nullif(sigma, F.lit(0.0)), 6
            ).alias("z"),
        )
        .orderBy("day")
    )


@register(
    "customer_revenue_theil_decomposition",
    tags=("stats", "agg"),
    oracle="""
    WITH x AS (
      SELECT c.c_custkey, n.n_name,
             CAST(sum(CAST(try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS xc
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            IS NOT NULL
      GROUP BY 1, 2
      HAVING sum(CAST(try_cast(try_cast(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT) AS DECIMAL(38,0))) > 0
    ),
    g AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(xc AS DECIMAL(38,0))) AS BIGINT) AS sg
      FROM x GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s FROM g
    ),
    tg AS (
      SELECT x.n_name,
             sum(CAST((CAST(x.xc AS DOUBLE) / g.sg)
                 * (ln(CAST(x.xc AS DOUBLE)) - ln(CAST(g.sg AS DOUBLE))
                    + ln(CAST(g.ng AS DOUBLE)))
                 AS DECIMAL(20,15))) AS t_within_g
      FROM x JOIN g ON x.n_name = g.n_name
      GROUP BY 1
    ),
    tpop AS (
      SELECT sum(CAST((CAST(x.xc AS DOUBLE) / tot.s)
                 * (ln(CAST(x.xc AS DOUBLE)) - ln(CAST(tot.s AS DOUBLE))
                    + ln(CAST(tot.n AS DOUBLE)))
                 AS DECIMAL(20,15))) AS t_total
      FROM x CROSS JOIN tot
    ),
    parts AS (
      SELECT sum(CAST((CAST(g.sg AS DOUBLE) / tot.s) * CAST(tg.t_within_g AS DOUBLE)
                 AS DECIMAL(20,15))) AS t_within,
             sum(CAST((CAST(g.sg AS DOUBLE) / tot.s)
                 * (ln(CAST(g.sg AS DOUBLE)) - ln(CAST(tot.s AS DOUBLE))
                    - ln(CAST(g.ng AS DOUBLE)) + ln(CAST(tot.n AS DOUBLE)))
                 AS DECIMAL(20,15))) AS t_between
      FROM g JOIN tg ON g.n_name = tg.n_name CROSS JOIN tot
    )
    SELECT tot.n AS n_customers,
           CAST(round(CAST(tpop.t_total AS DOUBLE), 6) AS DOUBLE) AS theil_total,
           CAST(round(CAST(parts.t_within AS DOUBLE), 6) AS DOUBLE) AS theil_within,
           CAST(round(CAST(parts.t_between AS DOUBLE), 6) AS DOUBLE) AS theil_between
    FROM tot CROSS JOIN tpop CROSS JOIN parts
    """,
)
def customer_revenue_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer order revenue, decomposed
    into WITHIN-nation and BETWEEN-nation components (Theil 1967):
    T = sum_i (x_i/S) ln(x_i/mu); T = sum_g s_g T_g + sum_g s_g
    ln(mu_g/mu) with s_g the group's revenue share. The additive
    decomposition is what Gini (part_revenue_gini_lorenz) cannot give:
    it answers "is revenue inequality a cross-market story or an
    in-market story?" -- the panel behind geo pricing and market-entry
    reviews. Population = customers with positive order revenue.

    Exactness: revenues are exact BIGINT cents (the TOTAL_CENTS total
    cast); every ln term is a closed form over integer aggregates
    written as ln(x) - ln(S) + ln(n) (overflow-free; both engines build
    identical doubles) and snaps to DECIMAL(20,15) before its sum --
    order-free accumulation, the entropy-op recipe. Share weights keep
    terms <= ln(n), inside the DECIMAL(20,15) integer headroom.

    Scale: one custkey-grain partial agg over orders (co-partitioned
    with the customer join), then nation-grain (25-row) relations
    broadcast back for the per-customer term pass -- two fact-scans
    worth of work, no global sort, no driver collect."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.expr(TOTAL_CENTS)
    x = (
        o.filter(cents.isNotNull())
        .groupBy("o_custkey")
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("bigint").alias("xc"))
        .filter(F.col("xc") > 0)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "xc")
        .localCheckpoint(eager=False)  # g, tg, tpop all consume it
    )
    g = x.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum(F.col("xc").cast("decimal(38,0)")).cast("bigint").alias("sg"),
    ).localCheckpoint(eager=False)
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"), F.sum("sg").cast("bigint").alias("s")
    )
    xd = F.col("xc").cast("double")
    tg = (
        x.join(F.broadcast(g), "n_name")
        .groupBy("n_name")
        .agg(
            F.sum(
                (
                    (xd / F.col("sg"))
                    * (F.log(xd) - F.log(F.col("sg").cast("double"))
                       + F.log(F.col("ng").cast("double")))
                ).cast("decimal(20,15)")
            ).alias("t_within_g")
        )
    )
    tpop = (
        x.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (
                    (xd / F.col("s"))
                    * (F.log(xd) - F.log(F.col("s").cast("double"))
                       + F.log(F.col("n").cast("double")))
                ).cast("decimal(20,15)")
            ).alias("t_total")
        )
    )
    sgd = F.col("sg").cast("double")
    parts = (
        g.join(tg, "n_name")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                ((sgd / F.col("s")) * F.col("t_within_g").cast("double"))
                .cast("decimal(20,15)")
            ).alias("t_within"),
            F.sum(
                (
                    (sgd / F.col("s"))
                    * (F.log(sgd) - F.log(F.col("s").cast("double"))
                       - F.log(F.col("ng").cast("double"))
                       + F.log(F.col("n").cast("double")))
                ).cast("decimal(20,15)")
            ).alias("t_between"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(tpop))
        .crossJoin(F.broadcast(parts))
        .select(
            F.col("n").alias("n_customers"),
            F.round(F.col("t_total").cast("double"), 6).alias("theil_total"),
            F.round(F.col("t_within").cast("double"), 6).alias("theil_within"),
            F.round(F.col("t_between").cast("double"), 6).alias("theil_between"),
        )
    )


@register(
    "events_quantile_regression_pinball",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             y
      FROM (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1
      )
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM daily
    ),
    grid AS (SELECT CAST(unnest(range(-20, 21)) AS BIGINT) AS k),
    taus AS (SELECT CAST(unnest([25, 50, 75, 90]) AS BIGINT) AS tau100),
    r AS (
      SELECT g.k, d.t,
             d.y * 1000 * tot.n - g.k * tot.s * d.t AS res
      FROM daily d CROSS JOIN grid g CROSS JOIN tot
    ),
    rk AS (
      SELECT k, t, res,
             CAST(row_number() OVER (PARTITION BY k ORDER BY res, t)
               AS BIGINT) AS rn
      FROM r
    ),
    a AS (
      SELECT rk.k, taus.tau100, rk.res AS icept
      FROM rk CROSS JOIN tot CROSS JOIN taus
      WHERE rk.rn = CAST(ceil(taus.tau100 * tot.n / 100.0) AS BIGINT)
    ),
    loss AS (
      SELECT a.k, a.tau100,
             sum(CAST(CASE WHEN rk.res > a.icept
                      THEN a.tau100 * (rk.res - a.icept)
                      ELSE (100 - a.tau100) * (a.icept - rk.res) END
                 AS DECIMAL(38,0))) AS pl,
             any_value(a.icept) AS icept
      FROM a JOIN rk ON rk.k = a.k
      GROUP BY 1, 2
    ),
    best AS (
      SELECT tau100, k, icept, pl,
             row_number() OVER (PARTITION BY tau100 ORDER BY pl, k) AS brk
      FROM loss
    )
    SELECT CAST(tau100 AS DOUBLE) / 100 AS tau,
           CAST(k AS BIGINT) AS grid_k,
           round(CAST(k AS DOUBLE) * tot.s / (1000 * tot.n), 6) AS slope_per_day,
           round(CAST(icept AS DOUBLE) / (1000 * tot.n), 6) AS intercept,
           round(CAST(pl AS DOUBLE) / (100.0 * 1000 * tot.n * tot.n), 6)
             AS avg_pinball
    FROM best CROSS JOIN tot
    WHERE brk = 1
    ORDER BY tau
    """,
)
def events_quantile_regression_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile regression of the daily event count on time by
    pinball-loss grid search (Koenker & Bassett 1978 check loss): for
    each tau in {{.25, .5, .75, .9}} and each slope candidate on a
    41-point grid (+-2% of the mean level per day, in 0.1% steps), the
    pinball-optimal intercept is the tau-quantile ORDER STATISTIC of the
    detrended residuals; the reported line is the (slope, intercept)
    minimizing total pinball loss. Four growth lines instead of OLS's
    one mean line: the p90 slope vs p50 slope gap says whether PEAK days
    are growing faster than typical days -- the capacity-planning read
    (lineitem_theilsen_price_trend is the robust-median cousin; this
    generalizes to any quantile).

    Exactness: residuals are scaled integers (y*1000n - k*S*t -- exact
    BIGINT, overflow-audited to 1e17 at 10-year/1e9-events-per-day
    grain), the intercept is an exact order statistic (rank =
    ceil(tau*n), (res, t) tie-broken), losses accumulate integer
    check-weights through DECIMAL(38,0), and the only doubles are the
    final unit-conversion divisions, rounded once. Argmin tie-breaks
    (loss, k) ascending.

    Scale: the day grain is calendar-bounded, so the 41-slope x n-day
    relation stays tiny forever; the rank window partitions by slope.
    The fact table contributes ONE day-grain partial agg."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").cast("timestamp").alias("day"))
        .agg(F.count("*").cast("bigint").alias("y"))
        .select(
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
            "y",
        )
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    grid = spark.range(-20, 21).select(F.col("id").cast("bigint").alias("k"))
    taus = spark.createDataFrame([(25,), (50,), (75,), (90,)], "tau100 bigint")
    r = (
        daily.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "t",
            (F.col("y") * 1000 * F.col("n") - F.col("k") * F.col("s") * F.col("t"))
            .alias("res"),
        )
    )
    rk = r.select(
        "k", "t", "res",
        F.row_number().over(Window.partitionBy("k").orderBy("res", "t"))
        .cast("bigint").alias("rn"),
    ).localCheckpoint(eager=False)  # the intercept pick and the loss join both consume it
    a = (
        rk.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(taus))
        .filter(
            F.col("rn")
            == F.ceil(F.col("tau100") * F.col("n") / 100.0).cast("bigint")
        )
        .select("k", "tau100", F.col("res").alias("icept"))
    )
    loss = (
        a.join(rk.select("k", "res"), "k")
        .groupBy("k", "tau100")
        .agg(
            F.sum(
                F.when(
                    F.col("res") > F.col("icept"),
                    F.col("tau100") * (F.col("res") - F.col("icept")),
                )
                .otherwise((100 - F.col("tau100")) * (F.col("icept") - F.col("res")))
                .cast("decimal(38,0)")
            ).alias("pl"),
            F.first("icept").alias("icept"),
        )
    )
    best = loss.select(
        "tau100", "k", "icept", "pl",
        F.row_number().over(Window.partitionBy("tau100").orderBy("pl", "k")).alias("brk"),
    ).filter(F.col("brk") == 1)
    return (
        best.crossJoin(F.broadcast(tot))
        .select(
            (F.col("tau100").cast("double") / 100).alias("tau"),
            F.col("k").cast("bigint").alias("grid_k"),
            F.round(
                F.col("k").cast("double") * F.col("s") / (1000 * F.col("n")), 6
            ).alias("slope_per_day"),
            F.round(F.col("icept").cast("double") / (1000 * F.col("n")), 6)
            .alias("intercept"),
            F.round(
                F.col("pl").cast("double")
                / (100.0 * 1000 * F.col("n") * F.col("n")),
                6,
            ).alias("avg_pinball"),
        )
        .orderBy("tau")
    )


@register(
    "orders_pareto_tail_index",
    tags=("stats", "agg"),
    oracle=f"""
    WITH c AS (
      SELECT {TOTAL_CENTS} AS cents, o_orderkey FROM orders
      WHERE {TOTAL_CENTS} IS NOT NULL AND {TOTAL_CENTS} > 0
    ),
    top AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey)
               AS BIGINT) AS rk
      FROM c QUALIFY rk <= 100
    ),
    xk AS (SELECT cents AS xk_c FROM top WHERE rk = (SELECT max(rk) FROM top)),
    h AS (
      SELECT CAST(max(top.rk) AS BIGINT) AS k,
             sum(CAST(CASE WHEN top.rk < (SELECT max(rk) FROM top)
                 THEN ln(CAST(top.cents AS DOUBLE)) - ln(CAST(xk.xk_c AS DOUBLE))
                 ELSE 0 END AS DECIMAL(20,15))) AS lsum
      FROM top CROSS JOIN xk
    )
    SELECT h.k,
           round(CAST(xk.xk_c AS DOUBLE) / 100, 6) AS threshold_dollars,
           round(CAST(h.lsum AS DOUBLE) / (h.k - 1), 6) AS hill_h,
           round((h.k - 1) / nullif(CAST(h.lsum AS DOUBLE), 0), 6) AS tail_alpha
    FROM h CROSS JOIN xk
    WHERE h.k >= 2
    """,
)
def orders_pareto_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto tail index of order values by the Hill estimator (Hill
    1975) over the top-100 order totals: H = mean of ln(x_i / x_(k)) for
    the k-1 largest observations above the k-th, alpha = 1/H. alpha ~ 1
    is a catastrophically heavy tail (whale orders dominate revenue);
    alpha > 3 is effectively light. The parametric companion to
    orders_abc_pareto (that reads concentration off the empirical curve;
    this fits the tail law that EXTRAPOLATES beyond observed maxima --
    the number revenue-at-risk and stress scenarios are built on).

    Exactness: the top-k cut is deterministic ((cents desc, orderkey)
    rank); each ln term is a difference of lns of exact integer cents,
    snapped to DECIMAL(20,15) before the order-free sum; alpha is one
    guarded division (nullif for the all-equal tail, where H = 0 and the
    index is undefined).

    Scale: TakeOrdered top-100 (no global sort), then 100-row
    arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(TOTAL_CENTS)
    c = o.select(cents.alias("cents"), "o_orderkey").filter(
        cents.isNotNull() & (cents > 0)
    )
    top = (
        c.orderBy(F.col("cents").desc(), "o_orderkey")
        .limit(100)
        .select(
            "cents",
            F.row_number()
            .over(Window.orderBy(F.col("cents").desc(), "o_orderkey"))
            .cast("bigint")
            .alias("rk"),
        )
        .localCheckpoint(eager=False)  # xk and the fold both consume it
    )
    kmax = top.agg(F.max("rk").alias("kk"))
    xk = (
        top.crossJoin(F.broadcast(kmax))
        .filter(F.col("rk") == F.col("kk"))
        .select(F.col("cents").alias("xk_c"))
    )
    h = (
        top.crossJoin(F.broadcast(kmax))
        .crossJoin(F.broadcast(xk))
        .agg(
            F.max("rk").cast("bigint").alias("k"),
            F.sum(
                F.when(
                    F.col("rk") < F.col("kk"),
                    F.log(F.col("cents").cast("double"))
                    - F.log(F.col("xk_c").cast("double")),
                )
                .otherwise(F.lit(0.0))
                .cast("decimal(20,15)")
            ).alias("lsum"),
        )
    )
    return (
        h.crossJoin(F.broadcast(xk))
        .filter(F.col("k") >= 2)
        .select(
            "k",
            F.round(F.col("xk_c").cast("double") / 100, 6).alias("threshold_dollars"),
            F.round(F.col("lsum").cast("double") / (F.col("k") - 1), 6).alias("hill_h"),
            F.round(
                (F.col("k") - 1)
                / F.nullif(F.col("lsum").cast("double"), F.lit(0.0)),
                6,
            ).alias("tail_alpha"),
        )
    )


def exact_interp_pct(df: DataFrame, keys: list, col: str, pct: int) -> DataFrame:
    """Exact linear-interpolation percentile of an INTEGER column per key
    group, truncated back to the integer domain: returns keys + ``q_val``
    (BIGINT) = (100*x_lo + rem*(x_hi - x_lo)) DIV 100 at rank position
    pct*(n-1)/100.

    Exists because the engines' built-in continuous quantiles
    (Spark ``percentile``, DuckDB ``quantile_cont``) evaluate
    mathematically-equal but ulp-DIFFERENT interpolation formulas
    (x_lo*(1-f)+x_hi*f vs x_lo+f*(x_hi-x_lo)) -- observed flapping at
    the 6dp output round -- and because rem = 50 interpolations land on
    exact decimal halves where Spark HALF_UP and DuckDB HALF_EVEN
    disagree. One shared rational closed form over order statistics,
    truncated tie-free, sidesteps both. Mirror the same CTE shape in the
    oracle (see cdc_gap_heatmap_hour_dow).

    Scale: the rank window partitions by the keys; use only on
    key-bounded or domain-bounded relations (the _domain_prefix route
    covers unbounded value domains)."""
    cw = Window.partitionBy(*keys)
    rk = df.select(
        *keys,
        F.col(col).alias("__x"),
        F.row_number().over(cw.orderBy(col)).cast("bigint").alias("__rn"),
        F.count("*").over(cw).cast("bigint").alias("__n"),
    ).localCheckpoint(eager=False)  # both sides of the lo/hi self-join
    lo_rn = F.expr(f"({pct} * (__n - 1)) DIV 100") + 1
    rem = F.expr(f"({pct} * (__n - 1)) % 100")
    lo = rk.filter(F.col("__rn") == lo_rn).select(
        *keys, F.col("__x").alias("__x_lo"), F.col("__n").alias("__n"),
        rem.alias("__rem"),
    )
    hi = rk.select(
        *[F.col(k).alias(f"__h_{k}") for k in keys],
        F.col("__rn").alias("__rn2"),
        F.col("__x").alias("__x_hi"),
    )
    lo_rn_again = F.expr(f"({pct} * (__n - 1)) DIV 100") + 1
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__h_{k}"))
    cond = cond & (
        F.col("__rn2")
        == F.when(F.col("__rem") == 0, lo_rn_again).otherwise(lo_rn_again + 1)
    )
    return lo.join(hi, cond).select(
        *keys,
        F.expr("(100 * __x_lo + __rem * (__x_hi - __x_lo)) DIV 100").alias("q_val"),
    )


def exact_interp_pct_weighted(
    df: DataFrame, keys: list, col: str, pct: int
) -> DataFrame:
    """``exact_interp_pct`` for BOUNDED-DOMAIN integer columns: reduces to
    the (keys, value, count) domain grain first, so the rank pass runs
    over |domain| rows per key instead of fact-grain rows (a day-delay
    domain is ~10^2 values; the fact relation is 10^9 -- this is the
    _domain_prefix discipline applied to percentile interpolation).
    Same output contract: keys + ``q_val`` BIGINT, identical truncated
    rational closed form."""
    return exact_interp_pcts_weighted(df, keys, col, [pct]).withColumnRenamed(
        f"q_{pct}", "q_val"
    )


def exact_interp_pcts_weighted(
    df: DataFrame, keys: list, col: str, pcts: list[int]
) -> DataFrame:
    """Multi-rung ``exact_interp_pct_weighted``: N percentiles of the SAME
    relation share ONE (keys, value, count) domain reduction and ONE
    cumulative-weight pass -- N single-pct calls would re-scan the fact
    relation and re-run the cumulative window N times for rungs that
    differ only in the rank position they pick. Returns keys + ``q_<pct>``
    (BIGINT) per requested pct; each rung evaluates the identical
    truncated rational closed form over the identical cumulative
    relation, so every column is value-equal to its single-pct call."""
    dom = df.groupBy(*keys, col).agg(F.count("*").cast("bigint").alias("__w"))
    cw = Window.partitionBy(*keys)
    cum = dom.select(
        *keys,
        F.col(col).alias("__x"),
        F.col("__w"),
        F.sum("__w").over(cw.orderBy(col)).cast("bigint").alias("__c_end"),
        F.sum("__w").over(cw).cast("bigint").alias("__n"),
    ).localCheckpoint(eager=False)  # every rung's lo and hi picks consume it
    out: DataFrame | None = None
    for pct in pcts:
        lo_pos = F.expr(f"({pct} * (__n - 1)) DIV 100") + 1
        rem = F.expr(f"({pct} * (__n - 1)) % 100")
        hi_pos = F.when(rem == 0, lo_pos).otherwise(lo_pos + 1)
        lo = (
            cum.filter((F.col("__c_end") >= lo_pos) & (F.col("__c_end") - F.col("__w") < lo_pos))
            .select(*keys, F.col("__x").alias("__x_lo"), F.col("__n"), rem.alias("__rem"))
        )
        hi = (
            cum.filter((F.col("__c_end") >= hi_pos) & (F.col("__c_end") - F.col("__w") < hi_pos))
            .select(*[F.col(k).alias(f"__h_{k}") for k in keys], F.col("__x").alias("__x_hi"))
        )
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__h_{k}"))
        pick = lo.join(hi, cond).select(
            *keys,
            F.expr("(100 * __x_lo + __rem * (__x_hi - __x_lo)) DIV 100").alias(
                f"q_{pct}"
            ),
        )
        out = pick if out is None else out.join(pick, list(keys))
    assert out is not None, "pcts must be non-empty"
    return out


@register(
    "events_two_way_eta_squared",
    tags=("stats", "agg"),
    oracle=f"""
    WITH x AS (
      SELECT event_type AS a, dayofweek(ts) AS b,
             {_VALUE_C} AS c
      FROM events
      WHERE ts IS NOT NULL AND {_VALUE_C} IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS q
      FROM x
    ),
    ga AS (
      SELECT a, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS s
      FROM x GROUP BY 1
    ),
    gb AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS s
      FROM x GROUP BY 1
    ),
    gc AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS s
      FROM x GROUP BY 1, 2
    ),
    ss AS (
      SELECT tot.n,
             CAST(tot.q AS DOUBLE)
               - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS sst,
             (SELECT sum(CAST(s AS DOUBLE) * s / n) FROM ga)
               - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ssa,
             (SELECT sum(CAST(s AS DOUBLE) * s / n) FROM gb)
               - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ssb,
             (SELECT sum(CAST(s AS DOUBLE) * s / n) FROM gc)
               - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ssc
      FROM tot
    )
    SELECT n AS n_rows,
           round(ssa / nullif(sst, 0), 6) AS eta2_type,
           round(ssb / nullif(sst, 0), 6) AS eta2_dow,
           round(ssc / nullif(sst, 0), 6) AS eta2_cells,
           round((ssc - ssa - ssb) / nullif(sst, 0), 6) AS eta2_residual_interaction
    FROM ss
    """,
)
def events_two_way_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor variance-explained panel on event value: eta-squared
    for event_type, for day-of-week, for the full (type x dow) cell
    structure, and the cells-minus-mains remainder -- the DESCRIPTIVE
    two-way decomposition (on unbalanced data the remainder is not a
    clean interaction SS, which is why this panel reports
    variance-explained fractions rather than F-tests; the balanced-design
    reading and the Type-I/II/III caveat are documented here
    deliberately). The screening view before committing to a model:
    eta2_cells near eta2_type says dow adds nothing; a large remainder
    says type and dow interact (e.g. purchases spike on weekends
    specifically).

    Exactness: every SS reduces to integer-cents group sums
    (DECIMAL(38,0) accumulation; sums of squares exact BIGINT); the
    eta ratios are shared closed forms, 6dp, nullif-guarded for a
    zero-variance corpus.

    Scale: three partial aggs over one fact scan (type: ~5 groups,
    dow: 7, cells: ~35) -- all dim-bounded."""
    e = load_table(spark, sf_dir, "events")
    c = F.expr(_VALUE_C)
    x = (
        e.filter(F.col("ts").isNotNull() & c.isNotNull())
        .select(
            F.col("event_type").alias("a"),
            (F.dayofweek("ts") - 1).alias("b"),
            c.alias("c"),
        )
        .localCheckpoint(eager=False)  # tot + three group passes consume it
    )
    tot = x.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).cast("bigint").alias("q"),
    )

    def ssq(keys):
        g = x.groupBy(*keys).agg(
            F.count("*").cast("bigint").alias("gn"),
            F.sum(F.col("c").cast("decimal(38,0)")).cast("bigint").alias("gs"),
        )
        return g.agg(
            F.sum(F.col("gs").cast("double") * F.col("gs") / F.col("gn")).alias("w")
        )

    sa, sb, sc_ = ssq(["a"]), ssq(["b"]), ssq(["a", "b"])
    grand = F.col("s").cast("double") * F.col("s") / F.col("n")
    sst = F.col("q").cast("double") - grand
    return (
        tot.crossJoin(F.broadcast(sa.select(F.col("w").alias("wa"))))
        .crossJoin(F.broadcast(sb.select(F.col("w").alias("wb"))))
        .crossJoin(F.broadcast(sc_.select(F.col("w").alias("wc"))))
        .select(
            F.col("n").alias("n_rows"),
            F.round((F.col("wa") - grand) / F.nullif(sst, F.lit(0.0)), 6).alias("eta2_type"),
            F.round((F.col("wb") - grand) / F.nullif(sst, F.lit(0.0)), 6).alias("eta2_dow"),
            F.round((F.col("wc") - grand) / F.nullif(sst, F.lit(0.0)), 6).alias("eta2_cells"),
            F.round(
                ((F.col("wc") - grand) - (F.col("wa") - grand) - (F.col("wb") - grand))
                / F.nullif(sst, F.lit(0.0)),
                6,
            ).alias("eta2_residual_interaction"),
        )
    )


# Defensive grain cap for the single-group PELT fold: the day-grain series
# a PELT run segments is calendar-bounded (a decade of hours is ~87k
# points); a series past this cap means the caller aggregated at the
# wrong grain, and the fold raises loudly instead of silently grinding.
PELT_MAX_POINTS = 500_000


def pelt_segment_series(
    series: DataFrame, ts_col: str, y_col: str, penalty: float | None = None
) -> DataFrame:
    """Exact PELT segmentation (Killick, Fearnhead & Eckley 2012) of a
    time-ordered numeric series under the L2 (mean-shift) cost, returning
    the input rows annotated with segment ids, segment means, and
    changepoint flags. The pruned DP is optimal (same argmin as the
    O(n^2) full scan) while averaging O(n) candidates kept.

    Penalty: caller-supplied, else 2 * sigma_hat^2 * ln(n) with
    sigma_hat from the MAD of first differences (the standard robust
    noise estimate; a floor keeps constant series at one segment).

    Scale contract: the DP is inherently sequential, so it runs on ONE
    executor over the ALREADY-AGGREGATED series (day/hour grain --
    calendar-bounded, capped at PELT_MAX_POINTS with a loud raise); the
    fact table reduces map-side before anything reaches the fold. This
    is the declared-grain pattern of graph_betweenness_brandes."""
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    out_schema = (
        f"{ts_col} timestamp, {y_col} bigint, segment_id bigint, "
        "seg_mean double, is_changepoint bigint"
    )

    def fold(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame(
                columns=[ts_col, y_col, "segment_id", "seg_mean", "is_changepoint"]
            )
        if len(pdf) > PELT_MAX_POINTS:
            raise ValueError(
                f"pelt_segment_series: {len(pdf)} points exceeds "
                f"PELT_MAX_POINTS={PELT_MAX_POINTS}; aggregate to a coarser "
                "grain before segmenting"
            )
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(y)
        if penalty is None:
            d = np.diff(y)
            mad = np.median(np.abs(d - np.median(d))) if len(d) else 0.0
            sigma2 = (mad / 0.6745 / np.sqrt(2.0)) ** 2
            beta = max(2.0 * sigma2 * np.log(max(n, 2)), 1e-9)
        else:
            beta = float(penalty)
        # prefix sums for O(1) segment cost: C(a..b) = S2 - S1^2/len
        c1 = np.concatenate([[0.0], np.cumsum(y)])
        c2 = np.concatenate([[0.0], np.cumsum(y * y)])

        def cost(a, b):  # cost of y[a:b], 0-based half-open
            s1 = c1[b] - c1[a]
            s2 = c2[b] - c2[a]
            return s2 - s1 * s1 / (b - a)

        f = np.full(n + 1, np.inf)
        f[0] = -beta
        prev = np.zeros(n + 1, dtype=np.int64)
        cand = [0]
        for t in range(1, n + 1):
            vals = [f[s] + cost(s, t) + beta for s in cand]
            k = int(np.argmin(vals))  # first index on ties: fewest segments
            f[t] = vals[k]
            prev[t] = cand[k]
            # PELT prune: drop s that can never win again
            cand = [s for s, v in zip(cand, vals) if v - beta <= f[t]]
            cand.append(t)
        # reconstruct boundaries
        bounds = []
        t = n
        while t > 0:
            s = prev[t]
            bounds.append((s, t))
            t = s
        bounds.reverse()
        seg_id = np.zeros(n, dtype=np.int64)
        seg_mean = np.zeros(n, dtype=np.float64)
        is_cp = np.zeros(n, dtype=np.int64)
        for i, (a, b) in enumerate(bounds):
            seg_id[a:b] = i
            seg_mean[a:b] = round((c1[b] - c1[a]) / (b - a), 6)
            if i > 0:
                is_cp[a] = 1
        pdf = pdf[[ts_col, y_col]].copy()
        pdf["segment_id"] = seg_id
        pdf["seg_mean"] = seg_mean
        pdf["is_changepoint"] = is_cp
        return pdf

    return (
        series.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fold(pdf), out_schema)
    )


@register("events_changepoint_pelt", tags=("stats", "timeseries"))
# rows-only by design: PELT's pruned dynamic program has no ANSI-SQL
# twin (the recursion prunes on the evolving optimum); planted-break
# recovery, the constant-series identity, and partition invariants are
# pinned in tests/test_round17_ops.py.
def events_changepoint_pelt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-changepoint segmentation of the daily event-count series via
    exact PELT under the L2 mean-shift cost -- the MULTI-break upgrade of
    events_changepoint_binary_seg (whose AMOC form returns only the
    single best split): every day labeled with its regime's id and mean
    plus a changepoint flag, the panel a capacity-planning or backfill
    review reads regime boundaries from. Penalty auto-tunes to
    2*sigma^2*ln(n) with sigma from the MAD of day-over-day differences.

    Scale: events reduce to |days| in ONE map-side partial agg; the
    sequential DP runs on that calendar-bounded series only (grain
    contract enforced at PELT_MAX_POINTS)."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", "ts").cast("timestamp").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    return pelt_segment_series(d, "day", "n_events").orderBy("day")


@register(
    "events_page_hinkley_panel",
    tags=("stats", "timeseries", "monitor"),
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT day, n_events,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(sum(n_events) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1
      FROM d
    ),
    u AS (
      SELECT day, n_events,
             n_events * 1000000 - (c1 * 1000000) // i AS term_u
      FROM p
    ),
    m AS (
      SELECT day, n_events,
             CAST(sum(term_u) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mt
      FROM u
    )
    SELECT CAST(day AS TIMESTAMP) AS day, n_events,
           round(CAST(mt - min(mt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                 AS DOUBLE) / 1000000, 6) AS ph_pos,
           round(CAST(max(mt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - mt
                 AS DOUBLE) / 1000000, 6) AS ph_neg
    FROM m ORDER BY day
    """,
)
def events_page_hinkley_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift statistics on the daily event-count
    series (Page 1954; Hinkley 1971; the standard online concept-drift
    detector in the stream-mining literature): m_t accumulates each
    day's deviation from the RUNNING mean, PH+ = m_t - min m (alarms on
    upward shifts), PH- = max m - m_t (downward). delta = 0, so the
    panel reports the raw statistics and the consumer applies its own
    lambda. Completes the change-detection trio: CUSUM monitors against
    a FIXED baseline, PELT segments retrospectively, Page-Hinkley
    tracks online against the evolving mean.

    Exactness: daily counts and their prefix sums are exact integers;
    each deviation term floor-scales to integer micro-units
    ((c1 * 1e6) div i -- positive operands, Spark div == DuckDB //),
    so m_t and its running extrema are EXACT integers on both engines;
    one display division/round per column. Bound: |sum(n_events)| *
    1e6 must fit BIGINT (~9.2e12 cumulative events -- decades at
    billion-event days; beyond that, lower the scale factor).

    Scale: events reduce to |days| in one map-side partial agg; all
    four windows run over that calendar-bounded series."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = d.select(
        "day", "n_events",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("i"),
        F.sum("n_events").over(w).cast("bigint").alias("c1"),
    )
    u = p.select(
        "day", "n_events",
        F.expr("n_events * 1000000L - (c1 * 1000000L) div i").alias("term_u"),
    )
    m = u.select(
        "day", "n_events",
        F.sum("term_u").over(w).cast("bigint").alias("mt"),
    )
    return m.select(
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        F.round(
            (F.col("mt") - F.min("mt").over(w)).cast("double") / 1000000, 6
        ).alias("ph_pos"),
        F.round(
            (F.max("mt").over(w) - F.col("mt")).cast("double") / 1000000, 6
        ).alias("ph_neg"),
    ).orderBy("day")


@register(
    "events_ljung_box_daily",
    tags=("stats", "timeseries"),
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM d
    ),
    y AS (
      SELECT day, CAST(n * x - s AS DECIMAL(38,0)) AS y FROM d CROSS JOIN g
    ),
    den AS (SELECT CAST(sum(y * y) AS DECIMAL(38,0)) AS ssq FROM y),
    sp AS (
      SELECT CAST(k.lag AS INT) AS lag,
             CAST(sum(a.y * b.y) AS DECIMAL(38,0)) AS sp
      FROM y a
      JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) AS k(lag) ON TRUE
      JOIN y b ON b.day = a.day - to_days(CAST(k.lag AS INT))
      GROUP BY 1
    ),
    rho AS (
      SELECT lag,
             CAST(sp AS DOUBLE) / nullif(CAST(ssq AS DOUBLE), 0) AS rho
      FROM sp CROSS JOIN den
    ),
    q AS (
      SELECT lag, rho,
             sum(rho * rho / (n - lag)) OVER (ORDER BY lag
               ROWS UNBOUNDED PRECEDING) AS qsum,
             n
      FROM rho CROSS JOIN g
    )
    SELECT lag, round(rho, 6) AS rho,
           round(CAST(n AS DOUBLE) * (n + 2) * qsum, 6) AS q_stat
    FROM q ORDER BY lag
    """,
)
def events_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau panel on the daily event-count series (Ljung
    & Box 1978): per lag k = 1..7 the global-mean autocorrelation rho_k
    and the cumulative Q(k) = n(n+2) * sum_{j<=k} rho_j^2/(n-j) -- the
    joint whiteness test read against chi-square(k). events_value_acf
    gives the per-lag correlogram of the VALUE series; this gives the
    COUNT series plus the single accumulating statistic a residual
    diagnostic actually thresholds.

    Exactness: deviations multiply through by n (y = n*x - S, exact
    integers), so rho_k is ONE double division of exact DECIMAL(38,0)
    sums; Q accumulates over the 7 lag rows in lag ORDER on both engines
    (ordered prefix window -- identical accumulation order, identical
    doubles), rounded once at 6dp. Calendar-lag join: gap days drop the
    affected pairs on both sides identically.

    Scale: one fact-table partial agg to |days|; the lag join and both
    windows run on calendar-bounded relations (|days| x 7 pairs, 7-row
    prefix sum)."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    g = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    y = (
        d.crossJoin(F.broadcast(g))
        .select(
            "day",
            (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)").alias("y"),
        )
        .localCheckpoint(eager=False)  # feeds den + both sides of the lag join
    )
    den = y.agg(F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("ssq"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = y.select(F.col("day").alias("day_a"), F.col("y").alias("ya"))
    b = y.select(F.col("day").alias("day_b"), F.col("y").alias("yb"))
    sp = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("day_b")
            == F.col("day_a") - F.expr("make_interval(0, 0, 0, lag, 0, 0, 0)"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("ya") * F.col("yb")).cast("decimal(38,0)").alias("sp"))
    )
    rho = (
        sp.crossJoin(F.broadcast(den))
        .select(
            "lag",
            (
                F.col("sp").cast("double")
                / F.nullif(F.col("ssq").cast("double"), F.lit(0.0))
            ).alias("rho"),
        )
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return (
        rho.crossJoin(F.broadcast(g))
        .select(
            "lag",
            "rho",
            F.sum(
                F.col("rho") * F.col("rho") / (F.col("n") - F.col("lag"))
            ).over(w).alias("qsum"),
            "n",
        )
        .select(
            "lag",
            F.round("rho", 6).alias("rho"),
            F.round(
                F.col("n").cast("double") * (F.col("n") + 2) * F.col("qsum"), 6
            ).alias("q_stat"),
        )
        .orderBy("lag")
    )


@register(
    "events_turning_points_test",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    d AS (
      SELECT day, cnt,
             cnt - lag(cnt) OVER (ORDER BY day) AS d1,
             lead(cnt) OVER (ORDER BY day) - cnt AS d2
      FROM daily
    ),
    t AS (
      SELECT CAST(sum(CASE WHEN d1 * d2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_turning,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d
    )
    SELECT n_days, n_turning,
           round(2.0 * (n_days - 2) / 3.0, 6) AS expected,
           round((n_turning - 2.0 * (n_days - 2) / 3.0)
                 / nullif(sqrt((16.0 * n_days - 29.0) / 90.0), 0), 6) AS z
    FROM t WHERE n_days >= 3
    """,
)
def events_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test (Kendall's classic nonparametric
    check) on the daily event-count series: count interior days that are
    strict local extrema (the day-over-day differences flip sign), then
    z-score against the iid expectation E = 2(n-2)/3, Var = (16n-29)/90.
    Too FEW turning points = trend/momentum; too MANY = alternating
    over-dispersion. The sign-pattern companion to events_runs_test_daily
    (which tests level crossings, not extrema); plateau days (a zero
    difference) are not turning points by the strict-inequality
    construction -- documented, and tie-free on count data in practice.

    Exactness: differences and the extremum predicate are exact integer
    arithmetic; n_turning and n_days are integers; two closed-form
    doubles rounded once at 6dp.

    Scale: one map-side-combinable day rollup from the fact scan, then
    lag/lead windows over the calendar-bounded day relation and a single
    global fold -- nothing beyond |days| rows after the first agg."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("day")
    d = daily.select(
        "cnt",
        (F.col("cnt") - F.lag("cnt").over(w)).alias("d1"),
        (F.lead("cnt").over(w) - F.col("cnt")).alias("d2"),
    )
    t = d.agg(
        F.sum(F.when(F.col("d1") * F.col("d2") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_turning"),
        F.count("*").cast("bigint").alias("n_days"),
    ).filter(F.col("n_days") >= 3)
    n = F.col("n_days").cast("double")
    exp = 2.0 * (n - 2) / 3.0
    return t.select(
        "n_days",
        "n_turning",
        F.round(exp, 6).alias("expected"),
        F.round(
            (F.col("n_turning") - exp)
            / F.nullif(F.sqrt((16.0 * n - 29.0) / 90.0), F.lit(0.0)),
            6,
        ).alias("z"),
    )


@register(
    "events_grubbs_outlier_daily",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cnt AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS BIGINT) AS q
      FROM daily
    ),
    dev AS (
      SELECT d.day, d.cnt, abs(m.n * d.cnt - m.s) AS adev, m.n, m.s, m.q
      FROM daily d CROSS JOIN m
    ),
    mx AS (SELECT max(adev) AS mx FROM dev)
    SELECT n AS n_days,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_cnt,
           round(sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)), 6) AS sd_cnt,
           round((CAST(mx AS DOUBLE) / n)
                 / nullif(sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)), 0),
                 6) AS g_stat,
           min(day) AS outlier_day,
           CAST(min(cnt) AS BIGINT) AS outlier_cnt
    FROM dev CROSS JOIN mx
    WHERE adev = mx AND n >= 3
    GROUP BY n, s, q, mx
    """,
)
def events_grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs extreme-studentized-deviate statistic (Grubbs 1950) on the
    daily event count: G = max|y - mean| / sd, plus the argmax day and
    its count -- the single-most-anomalous day with its evidence, where
    events_daily_bollinger_breaches flags ALL band crossings. G compares
    against the t-based critical value at the reader's alpha; emitting
    the statistic (not a fixed verdict) keeps the panel
    significance-level-free.

    Exactness: the deviation ranking uses |n*y - s| (exact integers --
    no float compare decides the argmax); ties on the max deviation
    resolve to the earliest day via min(day), with min(cnt) consistent
    because equal |n*y - s| at fixed (n, s) admits at most two cnt
    values and the GROUP BY collapses deterministically; mean/sd/G are
    DECIMAL-moment closed forms rounded at 6dp.

    Scale: one day rollup; moments fold map-side; the argmax pass is a
    broadcast-join filter over the calendar-bounded day relation."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").cast("timestamp").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # moments + argmax both consume it
    )
    m = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).cast("bigint").alias("s"),
        F.sum((F.col("cnt").cast("decimal(38,0)") * F.col("cnt")))
        .cast("bigint")
        .alias("q"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "day", "cnt", "n", "s", "q",
        F.abs(F.col("n") * F.col("cnt") - F.col("s")).alias("adev"),
    )
    mx = dev.agg(F.max("adev").alias("mx"))
    nd = F.col("n").cast("double")
    sd = F.sqrt((F.col("q") - F.col("s").cast("double") * F.col("s") / nd) / (nd - 1))
    return (
        dev.crossJoin(F.broadcast(mx))
        .filter((F.col("adev") == F.col("mx")) & (F.col("n") >= 3))
        .groupBy("n", "s", "q", "mx")
        .agg(F.min("day").alias("outlier_day"), F.min("cnt").cast("bigint").alias("outlier_cnt"))
        .select(
            F.col("n").alias("n_days"),
            F.round(F.col("s").cast("double") / nd, 6).alias("mean_cnt"),
            F.round(sd, 6).alias("sd_cnt"),
            F.round(
                (F.col("mx").cast("double") / nd) / F.nullif(sd, F.lit(0.0)), 6
            ).alias("g_stat"),
            "outlier_day",
            "outlier_cnt",
        )
    )


@register(
    "events_kpss_level_stat",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cnt AS DECIMAL(38,0))) AS BIGINT) AS s
      FROM daily
    ),
    e AS (
      SELECT day, m.n, m.n * cnt - m.s AS es
      FROM daily CROSS JOIN m
    ),
    p AS (
      SELECT n, es,
             CAST(sum(es) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS ps
      FROM e
    ),
    agg AS (
      SELECT n,
             sum(CAST(ps AS DECIMAL(38,0)) * ps) AS ssp,
             sum(CAST(es AS DECIMAL(38,0)) * es) AS sse
      FROM p GROUP BY n
    )
    SELECT n AS n_days,
           round(CAST(ssp AS DOUBLE) / (CAST(n AS DOUBLE)
                 * nullif(CAST(sse AS DOUBLE), 0)), 6) AS kpss_eta,
           CAST(CASE WHEN CAST(ssp AS DOUBLE) / (CAST(n AS DOUBLE)
                 * nullif(CAST(sse AS DOUBLE), 0)) < 0.463
                THEN 1 ELSE 0 END AS BIGINT) AS level_stationary_5pct
    FROM agg WHERE n >= 2
    """,
)
def events_kpss_level_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (Kwiatkowski-Phillips-Schmidt-
    Shin 1992, short-run-variance variant, bandwidth l=0) on the daily
    event count: eta = sum_t S_t^2 / (n^2 * sigma^2) where S_t are
    partial sums of demeaned counts and sigma^2 the plain residual
    variance. The null is STATIONARITY (the mirror of unit-root tests):
    eta above the 5% critical value 0.463 says the level wanders --
    read it next to events_runs_test_daily (sign clumping) and
    events_kpss-complement trend diagnostics before trusting any
    fixed-level alerting threshold on this stream. The l=0 bandwidth is
    the documented simplification: no HAC long-run correction, so eta
    overstates under strong short-run autocorrelation (which
    events_value_acf measures separately).

    Exactness: demeaned residuals are scaled to EXACT integers
    (e'_t = n*y_t - s); partial sums stay integer; both squared sums
    accumulate in DECIMAL(38,0) (order-free); the algebra
    eta = sum(S'^2) / (n * sum(e'^2)) -- the n-scalings cancel to one
    division -- is evaluated once and rounded at 6dp.

    Scale: one day rollup; one prefix-sum window over the
    calendar-bounded day relation; one fold. Nothing fact-grain after
    the first agg."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # moments + residual pass consume it
    )
    m = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).cast("bigint").alias("s"),
    )
    ew = daily.crossJoin(F.broadcast(m)).select(
        "day", "n", (F.col("n") * F.col("cnt") - F.col("s")).alias("es")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = ew.select("n", "es", F.sum("es").over(w).cast("bigint").alias("ps"))
    agg = p.groupBy("n").agg(
        F.sum(F.col("ps").cast("decimal(38,0)") * F.col("ps")).alias("ssp"),
        F.sum(F.col("es").cast("decimal(38,0)") * F.col("es")).alias("sse"),
    )
    eta = F.col("ssp").cast("double") / (
        F.col("n").cast("double") * F.nullif(F.col("sse").cast("double"), F.lit(0.0))
    )
    return agg.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_days"),
        F.round(eta, 6).alias("kpss_eta"),
        F.when(eta < 0.463, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("level_stationary_5pct"),
    )


@register(
    "events_variance_time_ratio",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT cnt,
             (CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1) // 7
               AS blk
      FROM daily
    ),
    wk AS (
      SELECT blk, CAST(sum(cnt) AS BIGINT) AS wsum,
             CAST(count(*) AS BIGINT) AS m
      FROM idx GROUP BY blk HAVING count(*) = 7
    ),
    vd AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cnt AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS BIGINT) AS q
      FROM idx
    ),
    vw AS (
      SELECT CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(CAST(wsum AS DECIMAL(38,0))) AS BIGINT) AS sw,
             CAST(sum(CAST(wsum AS DECIMAL(38,0)) * wsum) AS BIGINT) AS qw
      FROM wk
    )
    SELECT vd.n AS n_days, vw.nw AS n_weeks,
           round((vd.q - CAST(vd.s AS DOUBLE) * vd.s / vd.n)
                 / (vd.n - 1), 6) AS var_daily,
           round((vw.qw - CAST(vw.sw AS DOUBLE) * vw.sw / vw.nw)
                 / nullif(vw.nw - 1, 0), 6) AS var_weekly,
           round(((vw.qw - CAST(vw.sw AS DOUBLE) * vw.sw / vw.nw)
                  / nullif(vw.nw - 1, 0))
                 / nullif(7.0 * ((vd.q - CAST(vd.s AS DOUBLE) * vd.s / vd.n)
                          / (vd.n - 1)), 0), 6) AS vr7
    FROM vd CROSS JOIN vw
    WHERE vd.n >= 2 AND vw.nw >= 2
    """,
)
def events_variance_time_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-time ratio at the weekly scale: VR(7) = Var(non-overlapping
    7-day block sums) / (7 * Var(daily counts)). For an iid daily series
    VR = 1; VR > 1 means positively autocorrelated days (bursts persist
    across the week -- variances aggregate super-linearly, the
    self-similarity signal of the variance-time curve), VR < 1 means
    day-to-day mean reversion. The cross-SCALE companion to
    events_burstiness (Fano at one grain) and events_value_acf (lag
    correlation): one number that says whether weekly capacity can be
    provisioned as 7x daily. Non-overlapping blocks (not Lo-MacKinlay
    overlapping) is the documented variant; trailing partial weeks are
    dropped by the HAVING m = 7 completeness gate.

    Exactness: block assignment is integer row-number arithmetic over
    the day order; both variances are DECIMAL(38,0)-moment closed forms;
    outputs round once at 6dp.

    Scale: one day rollup; the block agg and both moment folds are
    calendar-bounded. The row_number window rides |days| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("day")
    idx = daily.select(
        "cnt",
        ((F.row_number().over(w).cast("bigint") - 1) / F.lit(7))
        .cast("bigint")
        .alias("blk"),
    ).localCheckpoint(eager=False)  # daily moments + block agg consume it
    wk = (
        idx.groupBy("blk")
        .agg(
            F.sum("cnt").cast("bigint").alias("wsum"),
            F.count("*").cast("bigint").alias("m"),
        )
        .filter(F.col("m") == 7)
    )
    vd = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).cast("bigint").alias("s"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt"))
        .cast("bigint")
        .alias("q"),
    )
    vw = wk.agg(
        F.count("*").cast("bigint").alias("nw"),
        F.sum(F.col("wsum").cast("decimal(38,0)")).cast("bigint").alias("sw"),
        F.sum(F.col("wsum").cast("decimal(38,0)") * F.col("wsum"))
        .cast("bigint")
        .alias("qw"),
    )
    var_d = (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    var_w = (
        F.col("qw") - F.col("sw").cast("double") * F.col("sw") / F.col("nw")
    ) / F.nullif((F.col("nw") - 1).cast("double"), F.lit(0.0))
    return (
        vd.crossJoin(vw)
        .filter((F.col("n") >= 2) & (F.col("nw") >= 2))
        .select(
            F.col("n").alias("n_days"),
            F.col("nw").alias("n_weeks"),
            F.round(var_d, 6).alias("var_daily"),
            F.round(var_w, 6).alias("var_weekly"),
            F.round(var_w / F.nullif(7.0 * var_d, F.lit(0.0)), 6).alias("vr7"),
        )
    )


@register(
    "events_median_test_weekend",
    tags=("stats", "analytics"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(dayofweek(date_trunc('day', ts)) IN (0, 6) AS BOOLEAN)
               AS wkd,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    med AS (
      SELECT min(CASE WHEN cm >= (n + 1) // 2 THEN cnt END)
             + min(CASE WHEN cm >= (n + 2) // 2 THEN cnt END) AS med2
      FROM (
        SELECT cnt,
               CAST(count(*) OVER (ORDER BY cnt, day) AS BIGINT) AS cm,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
      )
    ),
    cells AS (
      SELECT
        CAST(sum(CASE WHEN wkd AND 2 * cnt > med2 THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
        CAST(sum(CASE WHEN wkd AND 2 * cnt < med2 THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        CAST(sum(CASE WHEN NOT wkd AND 2 * cnt > med2 THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        CAST(sum(CASE WHEN NOT wkd AND 2 * cnt < med2 THEN 1 ELSE 0 END)
             AS BIGINT) AS d
      FROM daily CROSS JOIN med
    )
    SELECT a AS we_above, b AS we_below, c AS wd_above, d AS wd_below,
           round(CAST(a + b + c + d AS DOUBLE)
                 * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                 * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                 / nullif(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d),
                          0), 6) AS chi2
    FROM cells
    WHERE a + b > 0 AND c + d > 0
    """,
)
def events_median_test_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test for weekend-vs-weekday daily activity: classify
    each day against the grand median of daily counts (exact doubled
    order statistic; equal-to-median days are excluded per the classic
    construction) and chi-square the 2x2 above/below x weekend/weekday
    contingency. The rank-free robust counterpart to
    events_welch_ttest_weekend: medians ignore the burst tails that
    inflate a t-test's variance, so disagreement between the two panels
    is itself the heavy-tail signal. The day grain (not event grain)
    makes this a test of LEVEL difference, the operational question
    behind weekend capacity planning.

    Exactness: the grand median is the lo+hi doubled order statistic on
    cumulative day counts (exact integers, no interpolation -- the
    events_runs_test_daily idiom); cells are integer conditional sums;
    one Pearson chi-square closed form rounded at 6dp.

    Scale: one (day, weekend-flag) rollup from the fact scan; the median
    rank window and the contingency fold ride the calendar-bounded day
    relation."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.dayofweek(F.date_trunc("day", "ts")).isin(1, 7).alias("wkd"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # median rank pass + cells consume it
    )
    cw = Window.orderBy("cnt", "day")
    rk = daily.select(
        "cnt",
        F.count("*").over(cw).cast("bigint").alias("cm"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    med = rk.agg(
        (
            F.min(F.when(F.col("cm") >= F.expr("(n + 1) DIV 2"), F.col("cnt")))
            + F.min(F.when(F.col("cm") >= F.expr("(n + 2) DIV 2"), F.col("cnt")))
        ).alias("med2")
    )
    cells = daily.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(F.col("wkd") & (2 * F.col("cnt") > F.col("med2")), 1).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when(F.col("wkd") & (2 * F.col("cnt") < F.col("med2")), 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when(~F.col("wkd") & (2 * F.col("cnt") > F.col("med2")), 1).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(F.when(~F.col("wkd") & (2 * F.col("cnt") < F.col("med2")), 1).otherwise(0))
        .cast("bigint").alias("d"),
    )
    ad_bc = F.col("a").cast("double") * F.col("d") - F.col("b").cast("double") * F.col("c")
    return cells.filter((F.col("a") + F.col("b") > 0) & (F.col("c") + F.col("d") > 0)).select(
        F.col("a").alias("we_above"),
        F.col("b").alias("we_below"),
        F.col("c").alias("wd_above"),
        F.col("d").alias("wd_below"),
        F.round(
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
            * ad_bc * ad_bc
            / F.nullif(
                (F.col("a") + F.col("b")).cast("double")
                * (F.col("c") + F.col("d"))
                * (F.col("a") + F.col("c"))
                * (F.col("b") + F.col("d")),
                F.lit(0.0),
            ),
            6,
        ).alias("chi2"),
    )


@register(
    "events_permutation_entropy_daily",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tri AS (
      SELECT lag(cnt, 2) OVER (ORDER BY day) AS x0,
             lag(cnt, 1) OVER (ORDER BY day) AS x1,
             cnt AS x2
      FROM daily
    ),
    pat AS (
      SELECT CAST(4 * CASE WHEN x0 <= x1 THEN 1 ELSE 0 END
                  + 2 * CASE WHEN x0 <= x2 THEN 1 ELSE 0 END
                  + CASE WHEN x1 <= x2 THEN 1 ELSE 0 END AS BIGINT) AS code
      FROM tri WHERE x0 IS NOT NULL
    ),
    pc AS (
      SELECT code, CAST(count(*) AS BIGINT) AS c FROM pat GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pc),
    ent AS (
      SELECT CAST(sum(CAST((CAST(c AS DOUBLE) / t.n)
                           * ln(CAST(c AS DOUBLE) / t.n)
                           AS DECIMAL(20,15))) AS DOUBLE) AS sxlx,
             CAST(count(*) AS BIGINT) AS n_patterns
      FROM pc CROSS JOIN tot t
    ),
    modal AS (
      SELECT code AS modal_code, c AS modal_c FROM pc
      ORDER BY c DESC, code LIMIT 1
    )
    SELECT t.n AS n_windows, e.n_patterns,
           round(-e.sxlx, 6) + 0.0 AS h_perm,
           round(-e.sxlx / ln(6.0), 6) + 0.0 AS h_norm,
           m.modal_code,
           round(CAST(m.modal_c AS DOUBLE) / t.n, 6) AS modal_share
    FROM tot t CROSS JOIN ent e CROSS JOIN modal m
    """,
)
def events_permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy of the daily event-count series (Bandt &
    Pompe 2002, embedding dimension 3): each consecutive day triple maps
    to its ordinal pattern -- WHICH of the 6 orderings the three counts
    form, ties broken by position (the standard stable convention) --
    and H = -sum p ln p over the pattern distribution, normalized by
    ln 6. A white-noise series scores ~1, a monotone or strictly
    periodic one collapses toward 0; unlike the spectral/ACF family the
    measure is rank-based (outlier-immune) and needs no detrending --
    the complexity triage that says whether the forecast-baseline family
    has structure to work with at all. The pattern CODE is the 3-bit
    comparison vector (x0<=x1, x0<=x2, x1<=x2): 6 of the 8 codes are
    realizable orderings, the impossible two (101, 010) are cyclic
    contradictions.

    Exactness: patterns come from exact integer comparisons of exact
    counts; each p ln p term snaps to DECIMAL(20,15) before the
    order-free sum; the modal pattern ties break on the code. round()
    preserves IEEE signed zero, so both 6dp outputs normalize -0.0 with
    the + 0.0 rule.

    Scale: the fact table folds to |days| counts; the three lag windows
    ride the calendar-bounded day series (the documented unpartitioned-
    window family); 6-row pattern census, 1 row out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("day")
    tri = daily.select(
        F.lag("cnt", 2).over(w).alias("x0"),
        F.lag("cnt", 1).over(w).alias("x1"),
        F.col("cnt").alias("x2"),
    ).filter(F.col("x0").isNotNull())
    code = (
        4 * F.when(F.col("x0") <= F.col("x1"), 1).otherwise(0)
        + 2 * F.when(F.col("x0") <= F.col("x2"), 1).otherwise(0)
        + F.when(F.col("x1") <= F.col("x2"), 1).otherwise(0)
    ).cast("bigint")
    pc = (
        tri.select(code.alias("code"))
        .groupBy("code")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # entropy + modal + total consumers
    )
    tot = pc.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    ent = pc.crossJoin(F.broadcast(tot)).agg(
        F.sum((p * F.log(p)).cast("decimal(20,15)")).cast("double").alias("sxlx"),
        F.count("*").cast("bigint").alias("n_patterns"),
    )
    modal = (
        pc.orderBy(F.col("c").desc(), "code")
        .limit(1)
        .select(F.col("code").alias("modal_code"), F.col("c").alias("modal_c"))
    )
    return (
        tot.crossJoin(F.broadcast(ent))
        .crossJoin(F.broadcast(modal))
        .select(
            F.col("n").alias("n_windows"),
            "n_patterns",
            (F.round(-F.col("sxlx"), 6) + 0.0).alias("h_perm"),
            (F.round(-F.col("sxlx") / F.log(F.lit(6.0)), 6) + 0.0).alias("h_norm"),
            "modal_code",
            F.round(F.col("modal_c").cast("double") / F.col("n"), 6).alias(
                "modal_share"
            ),
        )
    )


@register(
    "events_seasonal_mann_kendall",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(dayofweek(date_trunc('day', ts)) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    sp AS (
      SELECT a.dw, CAST(sum(sign(b.cnt - a.cnt)) AS BIGINT) AS s_d
      FROM daily a JOIN daily b ON b.dw = a.dw AND a.day < b.day
      GROUP BY 1
    ),
    nn AS (
      SELECT dw, CAST(count(*) AS BIGINT) AS n_d FROM daily GROUP BY 1
    ),
    ties AS (
      SELECT dw, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie3
      FROM (SELECT dw, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY dw, cnt)
      GROUP BY 1
    ),
    agg AS (
      SELECT CAST(sum(sp.s_d) AS BIGINT) AS s,
             CAST(sum(nn.n_d) AS BIGINT) AS n_days,
             CAST(sum(nn.n_d * (nn.n_d - 1) * (2 * nn.n_d + 5)
                      - coalesce(t.tie3, 0)) AS BIGINT) AS var18
      FROM nn JOIN sp ON sp.dw = nn.dw
      LEFT JOIN ties t ON t.dw = nn.dw
    )
    SELECT n_days, s,
           round(CAST(var18 AS DOUBLE) / 18, 6) AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                      WHEN s < 0 THEN (s + 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                      ELSE 0.0 END, 6) + 0.0 AS z,
           CASE WHEN s > 0 THEN 'increasing'
                WHEN s < 0 THEN 'decreasing' ELSE 'none' END AS trend
    FROM agg
    """,
)
def events_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test on daily event counts (Hirsch &
    Slack 1984, the hydrology standard for series with a weekly cycle):
    the MK statistic is computed WITHIN each day-of-week season --
    Mondays compare only against Mondays -- and the seven S_d and their
    variances sum, so the weekly seasonality that would drown the plain
    MK test (every Sunday < every Monday reads as 7 alternating
    'trends') cancels instead. Includes the exact tie correction
    sum t(t-1)(2t+5) per season (daily counts DO tie, unlike the
    monthly-mean sibling lineitem_price_mann_kendall), and the standard
    +/-1 continuity-corrected z.

    Exactness: S accumulates exact integer signs of exact count
    differences; the variance is an exact integer divided once by 18;
    z is one shared closed form rounded at 6dp with the signed-zero
    normalization.

    Scale: the fact table folds to |days| counts; the pair join is
    dow-co-partitioned over the calendar-bounded day series (~(n/7)^2
    pairs per season on ~n=2,500 days -- bounded at any SF); 1 row
    out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "day",
            (F.dayofweek(F.col("day")) - 1).cast("bigint").alias("dw"),
            "cnt",
        )
        .localCheckpoint(eager=False)  # pairs + counts + ties consumers
    )
    a, b = daily.alias("a"), daily.alias("b")
    sp = (
        a.join(b, (F.col("b.dw") == F.col("a.dw")) & (F.col("a.day") < F.col("b.day")))
        .groupBy(F.col("a.dw").alias("dw"))
        .agg(
            F.sum(F.signum((F.col("b.cnt") - F.col("a.cnt")).cast("double")))
            .cast("bigint")
            .alias("s_d")
        )
    )
    nn = daily.groupBy("dw").agg(F.count("*").cast("bigint").alias("n_d"))
    ties = (
        daily.groupBy("dw", "cnt")
        .agg(F.count("*").cast("bigint").alias("t"))
        .groupBy("dw")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie3")
        )
    )
    agg = (
        nn.join(sp, "dw")
        .join(ties, "dw", "left")
        .agg(
            F.sum("s_d").cast("bigint").alias("s"),
            F.sum("n_d").cast("bigint").alias("n_days"),
            F.sum(
                F.col("n_d") * (F.col("n_d") - 1) * (2 * F.col("n_d") + 5)
                - F.coalesce(F.col("tie3"), F.lit(0))
            )
            .cast("bigint")
            .alias("var18"),
        )
    )
    var = F.col("var18").cast("double") / 18
    zed = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        "n_days",
        "s",
        F.round(var, 6).alias("var_s"),
        (F.round(zed, 6) + 0.0).alias("z"),
        F.when(F.col("s") > 0, F.lit("increasing"))
        .when(F.col("s") < 0, F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


# R/S analysis block sizes (dyadic ladder); a scale contributes only the
# complete blocks the series covers.
HURST_SCALES = (8, 16, 32, 64)


@register(
    "events_hurst_rs_estimate",
    tags=("stats", "timeseries"),
    oracle=f"""
    WITH daily AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) AS BIGINT)
               AS rn
      FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    blocks AS (
      SELECT w.w, (d.rn - 1) // w.w AS blk,
             d.rn - ((d.rn - 1) // w.w) * w.w AS k, d.x
      FROM daily d
      CROSS JOIN (SELECT CAST(unnest([{", ".join(str(w) for w in HURST_SCALES)}])
                    AS BIGINT) AS w) w
      CROSS JOIN n
      WHERE (d.rn - 1) // w.w < n.n_days // w.w
    ),
    bs AS (
      SELECT w, blk, CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM blocks GROUP BY 1, 2
    ),
    z AS (
      SELECT b.w, b.blk,
             CAST(b.w * sum(b.x) OVER (PARTITION BY b.w, b.blk ORDER BY b.k)
                  - b.k * s.s AS BIGINT) AS zw
      FROM blocks b JOIN bs s ON s.w = b.w AND s.blk = b.blk
    ),
    rs AS (
      SELECT z.w, z.blk,
             greatest(max(z.zw), 0) - least(min(z.zw), 0) AS rw
      FROM z GROUP BY 1, 2
    ),
    per_block AS (
      SELECT r.w,
             CAST(r.rw AS DOUBLE)
               / sqrt(CAST(b.w * b.sxx - CAST(b.s AS DECIMAL(38,0)) * b.s
                           AS DOUBLE)) AS rs_ratio
      FROM rs r JOIN bs b ON b.w = r.w AND b.blk = r.blk
      WHERE b.w * b.sxx > CAST(b.s AS DECIMAL(38,0)) * b.s
    ),
    per_w AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(rs_ratio AS DECIMAL(20,15))) AS DOUBLE)
               / count(*) AS mean_rs
      FROM per_block GROUP BY 1
    ),
    pts AS (
      SELECT CAST(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(20,15)) AS DOUBLE)
               AS lx,
             CAST(CAST(ln(mean_rs) AS DECIMAL(20,15)) AS DOUBLE) AS ly
      FROM per_w WHERE mean_rs > 0
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(sum(CAST(lx AS DECIMAL(25,15))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(25,15))) AS DOUBLE) AS sy,
             CAST(sum(CAST(lx * ly AS DECIMAL(25,15))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(lx * lx AS DECIMAL(25,15))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n.n_days,
           {", ".join(f"round((SELECT mean_rs FROM per_w WHERE w = {w}), 6) AS rs_{w}" for w in HURST_SCALES)},
           round((fit.np * fit.sxy - fit.sx * fit.sy)
                 / nullif(fit.np * fit.sxx - fit.sx * fit.sx, 0), 6) AS hurst
    FROM n CROSS JOIN fit
    """,
)
def events_hurst_rs_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-count series by rescaled-range
    analysis (Hurst 1951 / Mandelbrot-Wallis 1969): chop the day series
    into complete blocks at the dyadic scales HURST_SCALES, compute each
    block's rescaled range R/S (range of the cumulative mean-deviation
    profile over the population std), average per scale, and read H as
    the log-log OLS slope of mean R/S against block size. H ~ 0.5 is
    memoryless, H > 0.5 long-range persistent (bursts beget bursts --
    the traffic-self-similarity result that reshaped capacity
    planning), H < 0.5 anti-persistent. The long-memory companion to
    the short-lag ACF/PACF family and events_gap_memory_coefficient.

    Exactness: the engines never compare ulp-fragile intermediates --
    the deviation profile is kept in EXACT integers by
    cross-multiplication (Z_k * w = w * cumsum_k - k * block_sum), so
    R * w is an exact integer and R/S = (R * w) / sqrt(w * sum_x2 -
    s^2) evaluates ONE shared double expression per block (the
    variance term is an exact DECIMAL(38,0)); per-block ratios and the
    two ln folds snap to DECIMAL before order-free sums; H is the
    closed-form OLS slope rounded once. Zero-variance blocks are
    excluded exactly (integer compare), and the k = 0 anchor Z_0 = 0
    is included via the greatest/least-with-0 range.

    Scale: the fact table folds to |days| counts; block assignment is
    integer arithmetic on the day rank; the per-(scale, block) windows
    ride the calendar-bounded day series x 4 scales; 1 row out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
        .select(
            "x",
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
        )
        .localCheckpoint(eager=False)  # n fence + 4-scale explode
    )
    n = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    scales = F.explode(
        F.array(*[F.lit(w).cast("bigint") for w in HURST_SCALES])
    ).alias("w")
    blocks = (
        daily.crossJoin(F.broadcast(n))
        .select("x", "rn", "n_days", scales)
        .withColumn("blk", F.expr("(rn - 1) DIV w"))
        .withColumn("k", F.col("rn") - F.col("blk") * F.col("w"))
        .filter(F.col("blk") < F.expr("n_days DIV w"))
        .drop("n_days")
        .localCheckpoint(eager=False)  # block sums + profile windows
    )
    bs = blocks.groupBy("w", "blk").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    wb = Window.partitionBy("w", "blk").orderBy("k")
    z = (
        blocks.join(bs, ["w", "blk"])
        .select(
            "w",
            "blk",
            "s",
            "sxx",
            (
                F.col("w") * F.sum("x").over(wb) - F.col("k") * F.col("s")
            ).cast("bigint").alias("zw"),
        )
    )
    rs = z.groupBy("w", "blk", "s", "sxx").agg(
        (
            F.greatest(F.max("zw"), F.lit(0)) - F.least(F.min("zw"), F.lit(0))
        ).alias("rw")
    )
    ss = F.col("w") * F.col("sxx") - F.col("s").cast("decimal(38,0)") * F.col("s")
    per_block = rs.filter(ss > 0).select(
        "w",
        (F.col("rw").cast("double") / F.sqrt(ss.cast("double"))).alias("rs_ratio"),
    )
    per_w = per_block.groupBy("w").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        (
            F.sum(F.col("rs_ratio").cast("decimal(20,15)")).cast("double")
            / F.count("*")
        ).alias("mean_rs"),
    ).localCheckpoint(eager=False)  # pivot columns + the ln fit
    pts = per_w.filter(F.col("mean_rs") > 0).select(
        F.log(F.col("w").cast("double")).cast("decimal(20,15)").cast("double").alias("lx"),
        F.log("mean_rs").cast("decimal(20,15)").cast("double").alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum(F.col("lx").cast("decimal(25,15)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(25,15)")).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(25,15)")).cast("double").alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(25,15)")).cast("double").alias("sxx"),
    )
    npd = F.col("np").cast("double")
    wide = per_w.groupBy().pivot("w", [str(w) for w in HURST_SCALES]).agg(
        F.first("mean_rs")
    )
    for w in HURST_SCALES:
        wide = wide.withColumnRenamed(str(w), f"_rs_{w}")
    return (
        n.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(wide))
        .select(
            "n_days",
            *[F.round(F.col(f"_rs_{w}"), 6).alias(f"rs_{w}") for w in HURST_SCALES],
            F.round(
                (npd * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.nullif(npd * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)),
                6,
            ).alias("hurst"),
        )
    )


@register(
    "events_allan_variance",
    tags=("stats", "timeseries"),
    oracle=f"""
    WITH daily AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) AS BIGINT)
               AS rn
      FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    bs AS (
      SELECT w.w, (d.rn - 1) // w.w AS blk, CAST(sum(d.x) AS BIGINT) AS s
      FROM daily d
      CROSS JOIN (SELECT CAST(unnest([{", ".join(str(w) for w in HURST_SCALES)}])
                    AS BIGINT) AS w) w
      CROSS JOIN n
      WHERE (d.rn - 1) // w.w < n.n_days // w.w
      GROUP BY 1, 2
    ),
    diffs AS (
      SELECT a.w, CAST((b.s - a.s) * (b.s - a.s) AS DECIMAL(38,0)) AS d2
      FROM bs a JOIN bs b ON b.w = a.w AND b.blk = a.blk + 1
    ),
    av AS (
      SELECT w, CAST(count(*) AS BIGINT) + 1 AS n_blocks,
             CAST(sum(d2) AS DOUBLE)
               / (2.0 * count(*) * w * w) AS avar
      FROM diffs GROUP BY 1
    ),
    pts AS (
      SELECT CAST(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(20,15)) AS DOUBLE)
               AS lx,
             CAST(CAST(ln(avar) AS DECIMAL(20,15)) AS DOUBLE) AS ly
      FROM av WHERE avar > 0
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(sum(CAST(lx AS DECIMAL(25,15))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(25,15))) AS DOUBLE) AS sy,
             CAST(sum(CAST(lx * ly AS DECIMAL(25,15))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(lx * lx AS DECIMAL(25,15))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT av.w, av.n_blocks,
           round(av.avar, 6) AS avar,
           round(sqrt(av.avar), 6) AS adev,
           round((fit.np * fit.sxy - fit.sx * fit.sy)
                 / nullif(fit.np * fit.sxx - fit.sx * fit.sx, 0), 6)
             AS loglog_slope
    FROM av CROSS JOIN fit
    ORDER BY av.w
    """,
)
def events_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance of the daily event-count series at the dyadic
    block scales (Allan 1966, the frequency-stability standard): AVAR(w)
    = mean of squared consecutive block-mean differences / 2. The
    log-log slope across scales IDENTIFIES the noise type the way no
    single-variance read can -- slope -1 is white (uncorrelated) noise
    averaging down as expected, slope 0 is flicker noise (a floor
    that more averaging cannot beat -- the signature of slow drift),
    positive slopes are random-walk drift. The drift-triage companion
    to events_hurst_rs_estimate (H reads long-memory of the SAME
    series; Allan reads WHERE averaging stops helping) and the
    multi-scale upgrade of events_variance_time_ratio.

    Exactness: block sums are exact integers; squared differences
    accumulate in DECIMAL(38,0) ((s_{{i+1}} - s_i)^2 = (w m_{{i+1}} - w
    m_i)^2 keeps the mean difference cross-multiplied exact); AVAR
    divides once by 2(M-1)w^2; the slope snaps each ln to DECIMAL
    before the closed-form OLS.

    Scale: the fact table folds to |days| counts; block sums are a
    calendar-bounded agg per scale; 4 rows out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
        .select(
            "x",
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
        )
        .localCheckpoint(eager=False)
    )
    n = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    scales = F.explode(
        F.array(*[F.lit(w).cast("bigint") for w in HURST_SCALES])
    ).alias("w")
    bs = (
        daily.crossJoin(F.broadcast(n))
        .select("x", "rn", "n_days", scales)
        .withColumn("blk", F.expr("(rn - 1) DIV w"))
        .filter(F.col("blk") < F.expr("n_days DIV w"))
        .groupBy("w", "blk")
        .agg(F.sum("x").cast("bigint").alias("s"))
        .localCheckpoint(eager=False)  # both sides of the consecutive join
    )
    b = bs.select(
        F.col("w").alias("b_w"), F.col("blk").alias("b_blk"), F.col("s").alias("b_s")
    )
    diffs = bs.join(
        b, (F.col("b_w") == F.col("w")) & (F.col("b_blk") == F.col("blk") + 1)
    ).select(
        "w",
        ((F.col("b_s") - F.col("s")) * (F.col("b_s") - F.col("s")))
        .cast("decimal(38,0)")
        .alias("d2"),
    )
    av = diffs.groupBy("w").agg(
        (F.count("*") + 1).cast("bigint").alias("n_blocks"),
        (
            F.sum("d2").cast("double")
            / (2.0 * F.count("*") * F.col("w") * F.col("w"))
        ).alias("avar"),
    ).localCheckpoint(eager=False)  # rows + the ln fit
    pts = av.filter(F.col("avar") > 0).select(
        F.log(F.col("w").cast("double")).cast("decimal(20,15)").cast("double").alias("lx"),
        F.log("avar").cast("decimal(20,15)").cast("double").alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum(F.col("lx").cast("decimal(25,15)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(25,15)")).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(25,15)")).cast("double").alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(25,15)")).cast("double").alias("sxx"),
    )
    npd = F.col("np").cast("double")
    return (
        av.crossJoin(F.broadcast(fit))
        .select(
            "w",
            "n_blocks",
            F.round("avar", 6).alias("avar"),
            F.round(F.sqrt("avar"), 6).alias("adev"),
            F.round(
                (npd * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.nullif(npd * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)),
                6,
            ).alias("loglog_slope"),
        )
        .orderBy("w")
    )


@register(
    "events_extremal_index_runs",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) AS BIGINT)
               AS rn
      FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts)
    ),
    rk AS (
      SELECT x, rn,
             CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS xr,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    thr AS (
      SELECT (100 * lo.x + ((90 * (lo.n - 1)) % 100) * (hi.x - lo.x)) // 100
               AS u
      FROM rk lo JOIN rk hi
        ON lo.xr = (90 * (lo.n - 1)) // 100 + 1
       AND hi.xr = CASE WHEN (90 * (lo.n - 1)) % 100 = 0
                        THEN lo.xr ELSE lo.xr + 1 END
    ),
    exc AS (
      SELECT d.rn,
             CASE WHEN d.x > t.u THEN 1 ELSE 0 END AS e
      FROM daily d CROSS JOIN thr t
    ),
    marks AS (
      SELECT rn, e,
             CASE WHEN e = 1 AND coalesce(lag(e) OVER (ORDER BY rn), 0) = 0
                  THEN 1 ELSE 0 END AS new_cluster
      FROM exc
    ),
    runs AS (
      SELECT rn, e,
             CAST(sum(new_cluster) OVER (ORDER BY rn) AS BIGINT) AS cid
      FROM marks
    ),
    cl AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS len
      FROM runs WHERE e = 1 GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(len) AS BIGINT) AS n_exceed,
             CAST(max(len) AS BIGINT) AS max_len
      FROM cl
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           CAST(t.u AS BIGINT) AS threshold,
           a.n_exceed, a.n_clusters,
           round(CAST(a.n_clusters AS DOUBLE) / nullif(a.n_exceed, 0), 6)
             AS theta,
           round(CAST(a.n_exceed AS DOUBLE) / nullif(a.n_clusters, 0), 6)
             AS mean_cluster_len,
           a.max_len AS max_cluster_len
    FROM agg a CROSS JOIN thr t
    """,
)
def events_extremal_index_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extremal index of the daily event-count series by the runs
    estimator (Leadbetter 1983; the EVT quantity that says whether
    extremes arrive ALONE or in CLUSTERS): exceedances over the exact-
    interp 90th-percentile threshold group into maximal consecutive-day
    runs, and theta = clusters / exceedances in (0, 1] -- theta = 1
    means independent extremes (each overload day is its own incident),
    theta -> 0 means extremes clump (one trigger, multi-day pile-up),
    and 1/theta is the mean incident duration capacity planning should
    budget for. Completes the tail family: Hill/Pareto fit the tail's
    SIZE, VaR/ES price it, Grubbs flags points -- this measures the
    tail's temporal DEPENDENCE, which none of them see.

    Exactness: the threshold is the shared exact-interp rational over
    integer order statistics; exceedance flags, run segmentation (the
    lag + prefix-sum cluster-id recipe), and all counts are exact
    integers; theta divides once at 6dp.

    Scale: the fact table folds to |days| counts; the rank and run
    windows ride the calendar-bounded day series; 1 row out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
        .select(
            "x",
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
        )
        .localCheckpoint(eager=False)  # threshold rank + exceedance scan
    )
    rk = daily.select(
        "x",
        "rn",
        F.row_number().over(Window.orderBy("x", "rn")).cast("bigint").alias("xr"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    lo = rk.filter(F.col("xr") == F.expr("(90 * (n - 1)) DIV 100 + 1")).select(
        F.col("x").alias("x_lo"), F.expr("(90 * (n - 1)) % 100").alias("rem"), "n"
    )
    hi = rk.select(F.col("xr").alias("xr2"), F.col("x").alias("x_hi"))
    thr = lo.join(
        hi,
        F.col("xr2")
        == F.when(
            F.col("rem") == 0, F.expr("(90 * (n - 1)) DIV 100 + 1")
        ).otherwise(F.expr("(90 * (n - 1)) DIV 100 + 2")),
    ).select(
        F.expr("(100 * x_lo + rem * (x_hi - x_lo)) DIV 100").alias("u")
    )
    exc = daily.crossJoin(F.broadcast(thr)).select(
        "rn", F.when(F.col("x") > F.col("u"), 1).otherwise(0).alias("e"), "u"
    )
    wo = Window.orderBy("rn")
    marks = exc.select(
        "rn",
        "e",
        "u",
        F.when(
            (F.col("e") == 1) & (F.coalesce(F.lag("e").over(wo), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("new_cluster"),
    )
    runs = marks.select(
        "rn", "e", "u", F.sum("new_cluster").over(wo).cast("bigint").alias("cid")
    )
    cl = runs.filter(F.col("e") == 1).groupBy("cid", "u").agg(
        F.count("*").cast("bigint").alias("len")
    )
    agg = cl.groupBy("u").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("len").cast("bigint").alias("n_exceed"),
        F.max("len").cast("bigint").alias("max_len"),
    )
    nd = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_days",
        F.col("u").cast("bigint").alias("threshold"),
        "n_exceed",
        "n_clusters",
        F.round(
            F.col("n_clusters").cast("double") / F.nullif(F.col("n_exceed"), F.lit(0)),
            6,
        ).alias("theta"),
        F.round(
            F.col("n_exceed").cast("double") / F.nullif(F.col("n_clusters"), F.lit(0)),
            6,
        ).alias("mean_cluster_len"),
        F.col("max_len").alias("max_cluster_len"),
    )


@register(
    "events_dfa_alpha",
    tags=("stats", "timeseries"),
    oracle=f"""
    WITH daily AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) AS BIGINT)
               AS rn
      FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(x) AS BIGINT) AS total FROM daily),
    prof AS (
      -- integer profile in n-scaled units: Yn_k = n * cumsum_k - k * total
      SELECT d.rn,
             CAST(nn.n_days * sum(d.x) OVER (ORDER BY d.rn)
                  - d.rn * nn.total AS BIGINT) AS yn
      FROM daily d CROSS JOIN n nn
    ),
    blocks AS (
      SELECT w.w, (p.rn - 1) // w.w AS blk,
             p.rn - ((p.rn - 1) // w.w) * w.w AS t, p.yn
      FROM prof p
      CROSS JOIN (SELECT CAST(unnest([{", ".join(str(w) for w in HURST_SCALES)}])
                    AS BIGINT) AS w) w
      CROSS JOIN n
      WHERE (p.rn - 1) // w.w < n.n_days // w.w
    ),
    bs AS (
      SELECT w, blk,
             CAST(sum(CAST(yn AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(yn AS DECIMAL(38,0)) * yn) AS DOUBLE) AS syy,
             CAST(sum(CAST(t AS DECIMAL(38,0)) * yn) AS DOUBLE) AS sty
      FROM blocks GROUP BY 1, 2
    ),
    ss AS (
      SELECT w,
             CAST(greatest(syy - sy * sy / w
                   - (sty - (w * (w + 1) / 2.0) * sy / w)
                     * (sty - (w * (w + 1) / 2.0) * sy / w)
                     / (w * (w + 1) * (2 * w + 1) / 6.0
                        - (w * (w + 1) / 2.0) * (w * (w + 1) / 2.0) / w),
                   0.0) AS DECIMAL(25,6)) AS ssr
      FROM bs
    ),
    fw AS (
      SELECT s.w, CAST(count(*) AS BIGINT) AS n_blocks,
             sqrt(CAST(sum(s.ssr) AS DOUBLE) / count(*) / s.w)
               / any_value(nn.n_days) AS f
      FROM ss s CROSS JOIN n nn GROUP BY s.w
    ),
    pts AS (
      SELECT CAST(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(20,15)) AS DOUBLE)
               AS lx,
             CAST(CAST(ln(f) AS DECIMAL(20,15)) AS DOUBLE) AS ly
      FROM fw WHERE f > 0
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(sum(CAST(lx AS DECIMAL(25,15))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(25,15))) AS DOUBLE) AS sy,
             CAST(sum(CAST(lx * ly AS DECIMAL(25,15))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(lx * lx AS DECIMAL(25,15))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT nn.n_days,
           {", ".join(f"round((SELECT f FROM fw WHERE w = {w}), 6) AS f_{w}" for w in HURST_SCALES)},
           round((fit.np * fit.sxy - fit.sx * fit.sy)
                 / nullif(fit.np * fit.sxx - fit.sx * fit.sx, 0), 6)
             AS dfa_alpha
    FROM n nn CROSS JOIN fit
    """,
)
def events_dfa_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis of the daily event-count series
    (Peng et al. 1994): integrate the mean-centered series into a
    profile, least-squares-detrend it INSIDE each block at the dyadic
    scales, and read alpha as the log-log slope of the residual
    fluctuation F(w) -- alpha ~ 0.5 is uncorrelated, 0.5-1 long-range
    persistent, ~1.5 random-walk-like. The trend-robust sibling of
    events_hurst_rs_estimate: R/S is fooled by deterministic drift
    (it reads trend as memory), DFA subtracts the per-block linear
    trend first, so reading BOTH (and the Allan slope) separates true
    long memory from mere drift -- the three-way triage a capacity
    model needs before it extrapolates.

    Exactness: the profile is kept integer by n-scaling (Yn_k = n *
    cumsum - k * total); per-block OLS moments accumulate in
    DECIMAL(38,0) (St/Stt are the closed-form integer-triangle
    constants); the residual SS evaluates ONE shared IEEE expression,
    floors at 0 against cancellation, and snaps to DECIMAL(25,6)
    before the order-free block mean; ln terms snap before the slope.
    The n-scaling divides back out in F and cancels entirely in alpha.

    Scale: the fact table folds to |days| counts; profile + block
    windows ride the calendar-bounded day series; 1 row out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
        .select(
            "x",
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
        )
        .localCheckpoint(eager=False)
    )
    n = daily.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("total"),
    )
    prof = daily.crossJoin(F.broadcast(n)).select(
        "rn",
        "n_days",
        (
            F.col("n_days") * F.sum("x").over(Window.orderBy("rn"))
            - F.col("rn") * F.col("total")
        )
        .cast("bigint")
        .alias("yn"),
    )
    scales = F.explode(
        F.array(*[F.lit(w).cast("bigint") for w in HURST_SCALES])
    ).alias("w")
    blocks = (
        prof.select("rn", "yn", "n_days", scales)
        .withColumn("blk", F.expr("(rn - 1) DIV w"))
        .withColumn("t", F.col("rn") - F.col("blk") * F.col("w"))
        .filter(F.col("blk") < F.expr("n_days DIV w"))
    )
    ynd = F.col("yn").cast("decimal(38,0)")
    bs = blocks.groupBy("w", "blk").agg(
        F.sum(ynd).cast("double").alias("sy"),
        F.sum(ynd * F.col("yn")).cast("double").alias("syy"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("yn"))
        .cast("double")
        .alias("sty"),
    )
    wd = F.col("w").cast("double")
    st = wd * (wd + 1) / 2.0
    stt = wd * (wd + 1) * (2 * wd + 1) / 6.0
    num = F.col("sty") - st * F.col("sy") / wd
    ssr = F.greatest(
        F.col("syy")
        - F.col("sy") * F.col("sy") / wd
        - num * num / (stt - st * st / wd),
        F.lit(0.0),
    ).cast("decimal(25,6)")
    fw = (
        bs.select("w", ssr.alias("ssr"))
        .groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("n_blocks"),
            F.sum("ssr").cast("double").alias("sssr"),
        )
        .crossJoin(F.broadcast(n.select("n_days")))
        .select(
            "w",
            "n_blocks",
            (
                F.sqrt(F.col("sssr") / F.col("n_blocks") / F.col("w"))
                / F.col("n_days")
            ).alias("f"),
        )
        .localCheckpoint(eager=False)  # pivot + fit
    )
    pts = fw.filter(F.col("f") > 0).select(
        F.log(F.col("w").cast("double")).cast("decimal(20,15)").cast("double").alias("lx"),
        F.log("f").cast("decimal(20,15)").cast("double").alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum(F.col("lx").cast("decimal(25,15)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(25,15)")).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(25,15)")).cast("double").alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(25,15)")).cast("double").alias("sxx"),
    )
    wide = fw.groupBy().pivot("w", [str(w) for w in HURST_SCALES]).agg(F.first("f"))
    for w in HURST_SCALES:
        wide = wide.withColumnRenamed(str(w), f"_f_{w}")
    npd = F.col("np").cast("double")
    return (
        n.select("n_days")
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(wide))
        .select(
            "n_days",
            *[F.round(F.col(f"_f_{w}"), 6).alias(f"f_{w}") for w in HURST_SCALES],
            F.round(
                (npd * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.nullif(npd * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)),
                6,
            ).alias("dfa_alpha"),
        )
    )


@register(
    "events_recurrence_quantification",
    tags=("stats", "timeseries"),
    oracle="""
    WITH daily AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) AS BIGINT)
               AS rn
      FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts)
    ),
    eps AS (
      SELECT (max(x) - min(x)) // 10 AS e,
             CAST(count(*) AS BIGINT) AS n
      FROM daily
    ),
    pr AS (
      SELECT b.rn - a.rn AS diag, a.rn AS i,
             CASE WHEN abs(a.x - b.x) <= e.e THEN 1 ELSE 0 END AS rec
      FROM daily a JOIN daily b ON a.rn < b.rn CROSS JOIN eps e
    ),
    marks AS (
      SELECT diag, i, rec,
             CASE WHEN rec = 1
                  AND coalesce(lag(rec) OVER (PARTITION BY diag ORDER BY i), 0)
                      = 0
                  THEN 1 ELSE 0 END AS new_run
      FROM pr
    ),
    runs AS (
      SELECT diag, i, rec,
             CAST(sum(new_run) OVER (PARTITION BY diag ORDER BY i) AS BIGINT)
               AS rid
      FROM marks
    ),
    lines AS (
      SELECT diag, rid, CAST(count(*) AS BIGINT) AS len
      FROM runs WHERE rec = 1 GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(sum(len) AS BIGINT) AS n_rec,
             CAST(sum(CASE WHEN len >= 2 THEN len ELSE 0 END) AS BIGINT)
               AS n_det,
             CAST(sum(CASE WHEN len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lines,
             CAST(max(len) AS BIGINT) AS l_max
      FROM lines
    )
    SELECT e.n AS n_days, CAST(e.e AS BIGINT) AS epsilon,
           CAST(e.n * (e.n - 1) / 2 AS BIGINT) AS n_pairs,
           a.n_rec,
           round(CAST(a.n_rec AS DOUBLE) / (e.n * (e.n - 1) / 2), 6)
             AS recurrence_rate,
           round(CAST(a.n_det AS DOUBLE) / nullif(a.n_rec, 0), 6)
             AS determinism,
           round(CAST(a.n_det AS DOUBLE) / nullif(a.n_lines, 0), 6)
             AS mean_line_len,
           a.l_max AS max_line_len
    FROM agg a CROSS JOIN eps e
    """,
)
def events_recurrence_quantification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurrence quantification of the daily event-count series
    (Eckmann-Kamphorst-Ruelle 1987 recurrence plots; Zbilut-Webber RQA):
    day pairs recur when their counts sit within epsilon = range/10 of
    each other, and the panel reports the recurrence rate RR plus
    DETERMINISM -- the share of recurrent pairs lying on diagonal line
    segments of length >= 2, i.e. stretches where the series REPLAYS a
    past trajectory shifted by a fixed lag. High DET with modest RR is
    the deterministic-dynamics signature (strict weekly rhythms light
    up lag-7 diagonals); DET near RR means recurrences are isolated
    coincidences. The nonlinear-dynamics complement to the
    ACF/spectral family: correlation measures LINEAR co-movement, DET
    counts literal trajectory repeats at any amplitude.

    Exactness: epsilon is exact integer arithmetic on exact counts;
    recurrence flags, the lag + prefix-sum run segmentation per
    diagonal, and all line-length counts are exact integers; the three
    ratios divide once at 6dp.

    Scale: the fact table folds to |days| counts; the pair frame is
    C(|days|, 2) on the CALENDAR domain (~3M narrow rows at 2,500 days
    -- bounded at any SF); the run windows partition per diagonal;
    1 row out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
        .select(
            "x",
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
        )
        .localCheckpoint(eager=False)  # eps fence + both pair sides
    )
    eps = daily.agg(
        F.expr("(max(x) - min(x)) DIV 10").alias("e"),
        F.count("*").cast("bigint").alias("n"),
    )
    b = daily.select(F.col("rn").alias("j"), F.col("x").alias("xj"))
    pr = (
        daily.crossJoin(F.broadcast(eps))
        .join(b, F.col("rn") < F.col("j"))
        .select(
            (F.col("j") - F.col("rn")).alias("diag"),
            F.col("rn").alias("i"),
            F.when(F.abs(F.col("x") - F.col("xj")) <= F.col("e"), 1)
            .otherwise(0)
            .alias("rec"),
        )
    )
    wd = Window.partitionBy("diag").orderBy("i")
    marks = pr.select(
        "diag",
        "i",
        "rec",
        F.when(
            (F.col("rec") == 1)
            & (F.coalesce(F.lag("rec").over(wd), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    runs = marks.select(
        "diag", "i", "rec", F.sum("new_run").over(wd).cast("bigint").alias("rid")
    )
    lines = runs.filter(F.col("rec") == 1).groupBy("diag", "rid").agg(
        F.count("*").cast("bigint").alias("len")
    )
    agg = lines.agg(
        F.sum("len").cast("bigint").alias("n_rec"),
        F.sum(F.when(F.col("len") >= 2, F.col("len")).otherwise(0))
        .cast("bigint")
        .alias("n_det"),
        F.sum(F.when(F.col("len") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lines"),
        F.max("len").cast("bigint").alias("l_max"),
    )
    return agg.crossJoin(F.broadcast(eps)).select(
        F.col("n").alias("n_days"),
        F.col("e").cast("bigint").alias("epsilon"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("n_pairs"),
        "n_rec",
        F.round(
            F.col("n_rec").cast("double") / (F.col("n") * (F.col("n") - 1) / 2), 6
        ).alias("recurrence_rate"),
        F.round(
            F.col("n_det").cast("double") / F.nullif(F.col("n_rec"), F.lit(0)), 6
        ).alias("determinism"),
        F.round(
            F.col("n_det").cast("double") / F.nullif(F.col("n_lines"), F.lit(0)), 6
        ).alias("mean_line_len"),
        F.col("l_max").alias("max_line_len"),
    )
