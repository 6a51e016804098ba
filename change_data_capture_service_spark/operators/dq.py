"""Data-quality constraint checks over the replicated tables -- the
validation queries a CDC operator runs against the sink to prove the
replica is trustworthy (null/range/uniqueness/referential integrity), in
the spirit of Deequ-style declarative checks (public AWS labs project).

Scale design: all single-table predicates for one table fuse into ONE
conditional-aggregation pass (no per-check scans); referential checks are
anti-joins against dimension keys, which broadcast when small. Output is
|checks| rows -- audit-sized, never per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "dq_constraint_checks",
    tags=("dq", "quality"),
    oracle="""
    SELECT 'orders_null_orderdate' AS check_name,
           CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_total',
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_bad_status',
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer_orphan_nationkey',
           CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the replicated tables: completeness (nulls),
    range, set-membership, key uniqueness, and two referential-integrity
    checks -- one row per check with its violation count (all zero on
    healthy fixtures, which is itself the assertion).

    The four orders predicates run in ONE conditional-agg scan; duplicate
    counting rides a keyed partial agg; the orphan checks are anti-joins
    whose dimension side broadcasts. Adding a check never adds a scan
    unless it adds a table."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    single_pass = orders.agg(
        cnt(F.col("o_orderdate").isNull()).alias("orders_null_orderdate"),
        cnt(F.col("o_totalprice") <= 0).alias("orders_nonpositive_total"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias("orders_bad_status"),
    )
    fused = single_pass.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("check_name"), F.col(c).alias("violations"))
                    for c in (
                        "orders_null_orderdate",
                        "orders_nonpositive_total",
                        "orders_bad_status",
                    )
                ]
            )
        ).alias("r")
    ).select("r.check_name", "r.violations")

    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("violations"))
        .select(F.lit("orders_dup_orderkey").alias("check_name"), "violations")
    )
    orphan_orders = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orders_orphan_custkey").alias("check_name"), "violations")
    )
    orphan_customer = (
        customer.join(
            F.broadcast(nation.select("n_nationkey")),
            customer["c_nationkey"] == F.col("n_nationkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(F.lit("customer_orphan_nationkey").alias("check_name"), "violations")
    )
    return fused.unionByName(dups).unionByName(orphan_orders).unionByName(orphan_customer)


@register(
    "dq_k_anonymity",
    tags=("dq", "quality"),
    oracle="""
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING count(*) < 10
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation, market
    segment): every combination shared by fewer than k=10 customers is a
    re-identification risk and must be generalized or suppressed before
    the table ships in a training set -- the standard privacy gate
    (Sweeney 2002) run as a data-quality check next to the Deequ-style
    constraint audit (``dq_constraint_checks``).

    Scale: one partial aggregate; shuffle volume is the distinct
    quasi-identifier combination count, independent of row count. Wider
    quasi-identifier sets just extend the groupBy key; the HAVING filter
    runs on the reduced side."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("group_size"))
        .filter(F.col("group_size") < 10)
    )


@register(
    "lineitem_price_consistency",
    tags=("dq", "agg", "relational"),
    oracle="""
    WITH u AS (
      SELECT l_partkey,
             TRY_CAST(round(l_extendedprice / l_quantity, 6) AS DECIMAL(18,6))
               AS unit_price
      FROM lineitem WHERE l_quantity > 0
    ),
    p AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             min(unit_price) AS min_price,
             max(unit_price) AS max_price
      FROM u WHERE unit_price IS NOT NULL GROUP BY 1
    )
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_lines,
           CAST(min_price AS DOUBLE) AS min_price,
           CAST(max_price AS DOUBLE) AS max_price,
           round(CAST(max_price AS DOUBLE) / CAST(min_price AS DOUBLE), 6)
             AS spread_ratio
    FROM p
    WHERE n_lines >= 5 AND min_price > 0
    ORDER BY spread_ratio DESC, l_partkey
    LIMIT 20
    """,
)
def lineitem_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-consistency audit: the 20 parts whose observed unit price
    varies most across line items (max/min ratio, >= 5 observations) --
    either legitimate discount laddering or a data-entry defect, and
    either way the first thing a pricing DQ pass flags. Unit prices snap
    to 6 dp DECIMAL before the min/max so the extremes are
    accumulation-order-free; the ratio is one double division at the end.

    Scale: ONE |parts|-grain partial agg over the fact scan,
    TakeOrderedAndProject final."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    # try_cast: a price/quantity pathological enough to overflow the 6-dp
    # DECIMAL (e.g. near-cap price over cent-scale quantity) is a DQ
    # finding, not a reason to crash the DQ query -- it nulls out and is
    # excluded from the min/max
    u = li.select(
        "l_partkey",
        F.expr(
            "try_cast(round(l_extendedprice / l_quantity, 6) AS decimal(18,6))"
        ).alias("unit_price"),
    ).filter(F.col("unit_price").isNotNull())
    p = u.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.min("unit_price").alias("min_price"),
        F.max("unit_price").alias("max_price"),
    )
    return (
        p.filter((F.col("n_lines") >= 5) & (F.col("min_price") > 0))
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            "n_lines",
            F.col("min_price").cast("double").alias("min_price"),
            F.col("max_price").cast("double").alias("max_price"),
            F.round(
                F.col("max_price").cast("double") / F.col("min_price").cast("double"),
                6,
            ).alias("spread_ratio"),
        )
        .orderBy(F.col("spread_ratio").desc(), "l_partkey")
        .limit(20)
    )


# Benford first-digit probabilities log10(1+1/d), shared LITERALS on both
# engines so no runtime log10 (whose last-bit behaviour is
# implementation-defined) enters the hash-compared output
_BENFORD_CASE = (
    "CASE digit WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124"
    " WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642"
    " WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322"
    " WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129"
    " WHEN 9 THEN 0.04575749056067514 END"
)


@register(
    "lineitem_benford_first_digit",
    tags=("dq", "agg"),
    oracle=f"""
    WITH digits AS (
      SELECT CAST(regexp_extract(
               CAST(try_cast(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]', 0) AS VARCHAR) AS d
      FROM lineitem
    ),
    cnt AS (
      SELECT CAST(d AS INT) AS digit, CAST(count(*) AS BIGINT) AS n
      FROM digits WHERE d <> '' GROUP BY d
    ),
    dom AS (SELECT CAST(range AS INT) AS digit FROM range(1, 10)),
    j AS (
      SELECT dom.digit, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n,
             CAST(sum(coalesce(cnt.n, 0)) OVER () AS BIGINT) AS total
      FROM dom LEFT JOIN cnt ON dom.digit = cnt.digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
           round({_BENFORD_CASE}, 6) AS benford_p,
           round(pow(CAST(n AS DOUBLE) - total * ({_BENFORD_CASE}), 2)
                 / (total * ({_BENFORD_CASE})), 6) AS chi2_term
    FROM j WHERE total > 0
    """,
)
def lineitem_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of line prices: observed first-significant-digit
    shares vs the log10(1+1/d) law, with per-digit chi-square terms --
    the fabricated-data / synthetic-feed detector auditors run on
    financial columns (a price feed that fails Benford hard was binned,
    capped, or invented).

    Determinism: the first digit comes from the DECIMAL(18,2) STRING
    rendering (identical on both engines; no float log10 whose ulp
    behaviour could flip a digit near powers of ten), non-finite and
    non-positive prices drop out via try_cast + no-[1-9]-match; the
    Benford probabilities are shared compile-time literals. All nine
    digits always appear (zero-count digits matter to chi-square), via a
    left join against the 1..9 domain.

    Scale: one regexp scan partial-aggregated to <=9 groups -- map-side
    combinable, no shuffle beyond the 9-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.regexp_extract(
        F.expr("CAST(try_cast(l_extendedprice AS decimal(18,2)) AS string)"),
        "[1-9]",
        0,
    )
    cnt = (
        li.select(d.alias("d"))
        .filter(F.col("d") != "")
        .groupBy(F.col("d").cast("int").alias("digit"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    dom = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    j = dom.join(F.broadcast(cnt), "digit", "left").select(
        "digit",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.sum(F.coalesce("n", F.lit(0)))
        .over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .cast("bigint")
        .alias("total"),
    )
    # Spark parses the long literals as DECIMAL; DuckDB as DOUBLE -- pin double
    p = F.expr(_BENFORD_CASE).cast("double")
    return j.filter(F.col("total") > 0).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("obs_share"),
        F.round(p, 6).alias("benford_p"),
        F.round(
            F.pow(F.col("n").cast("double") - F.col("total") * p, 2)
            / (F.col("total") * p),
            6,
        ).alias("chi2_term"),
    )


@register(
    "dq_orders_lineitem_reconciliation",
    tags=("dq", "join"),
    oracle="""
    WITH line_gross AS (
      SELECT l_orderkey,
             CAST(sum(try_cast(try_cast(
               l_extendedprice * (1 - l_discount) * (1 + l_tax)
               AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS lines_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT o.o_orderstatus,
             try_cast(try_cast(o.o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS o_cents,
             g.lines_cents
      FROM orders o LEFT JOIN line_gross g ON o.o_orderkey = g.l_orderkey
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN lines_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lineless,
           CAST(sum(CASE WHEN o_cents = lines_cents THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           round(CAST(sum(abs(o_cents - lines_cents)) AS DOUBLE)
                 / nullif(sum(CASE WHEN lines_cents IS NOT NULL
                              THEN 1 ELSE 0 END), 0) / 100, 2) AS mean_abs_diff,
           round(CAST(max(abs(o_cents - lines_cents)) AS DOUBLE) / 100, 2)
             AS max_abs_diff
    FROM recon GROUP BY o_orderstatus
    """,
)
def dq_orders_lineitem_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: does each order's header total equal
    the sum of its lines' gross charge (extendedprice x (1-discount) x
    (1+tax))? The classic financial-close DQ control -- header-vs-detail
    drift means a failed backfill, a partial CDC apply, or (as in these
    independently-synthesized fixtures) totals that were never derived
    from the lines at all; the per-status report quantifies the gap
    either way, plus orders with NO lines (referential gap).

    Exactness: the per-line gross is one shared double expression (the
    IEEE product is identical on both engines) routed to cents through
    the DECIMAL(18,2) cast -- the registry recipe; a round()*100->BIGINT
    path differs cross-engine because Spark's float->int cast truncates
    while DuckDB's rounds. Header totals go through the same gate; all
    aggregation is integer. NULL-total or overflow rows null out instead
    of throwing.

    Scale: one |orders|-keyed partial agg over lineitem co-located with
    the header join key, one broadcast-free equi-join (both sides
    order-keyed), one |status| rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # cents via the DECIMAL cast (round()*100 -> bigint truncates on Spark
    # but rounds on DuckDB; the decimal cast rounds identically on both)
    gross = F.expr(
        "try_cast(try_cast(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        " AS decimal(18,2)) * 100 AS bigint)"
    )
    line_gross = li.groupBy("l_orderkey").agg(
        F.sum(gross).cast("bigint").alias("lines_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    recon = o.select(
        "o_orderstatus",
        "o_orderkey",
        F.expr(
            "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)"
        ).alias("o_cents"),
    ).join(line_gross, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    diff = F.abs(F.col("o_cents") - F.col("lines_cents"))
    has_lines = F.when(F.col("lines_cents").isNotNull(), 1).otherwise(0)
    return recon.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("lines_cents").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lineless"),
        F.sum(F.when(F.col("o_cents") == F.col("lines_cents"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.round(
            F.sum(diff).cast("double") / F.nullif(F.sum(has_lines), F.lit(0)) / 100,
            2,
        ).alias("mean_abs_diff"),
        F.round(F.max(diff).cast("double") / 100, 2).alias("max_abs_diff"),
    )


@register(
    "orders_rapid_repeat_audit",
    tags=("dq", "relational"),
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS BIGINT) AS cents,
             o_orderdate AS d
      FROM orders
      WHERE try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS BIGINT) IS NOT NULL
    )
    SELECT a.o_custkey AS custkey, a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           round(CAST(a.cents AS DOUBLE) / 100, 2) AS amount_a,
           round(CAST(b.cents AS DOUBLE) / 100, 2) AS amount_b,
           round(CAST(least(a.cents, b.cents) AS DOUBLE) / greatest(a.cents, b.cents), 6) AS amount_ratio,
           CAST(abs(date_diff('day', a.d, b.d)) AS INT) AS days_apart
    FROM base a JOIN base b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    WHERE abs(date_diff('day', a.d, b.d)) <= 30
      AND CAST(least(a.cents, b.cents) AS DOUBLE) / greatest(a.cents, b.cents) >= 0.9
    """,
)
def orders_rapid_repeat_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice audit: pairs of orders from the SAME customer,
    placed within 30 days, whose totals agree within 10% -- the classic
    accounts-payable double-payment screen (exact-amount duplicates are
    the textbook case; real systems flag the near-misses too, because a
    re-keyed invoice rarely matches to the cent). Output is the pair
    evidence an auditor reviews: both keys, both amounts, the ratio, and
    the day gap.

    Exactness: amounts compare as exact cents (least/greatest ratio,
    round 6); the day gap is integer date arithmetic.

    Scale: the self-join is equi-keyed on custkey -- the customer key IS
    the blocking key, so the pair space is sum over customers of
    C(orders-in-window, 2), never orders^2. At 100 TB add (custkey,
    month) to the join key to also bound the per-customer window
    scan; semantics unchanged for the 30-day gate."""
    o = load_table(spark, sf_dir, "orders")
    tc = "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)"
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.expr(tc).alias("cents"),
        F.col("o_orderdate").alias("d"),
    ).filter(F.col("cents").isNotNull())
    a, b = base.alias("a"), base.alias("b")
    ratio = F.least(F.col("a.cents"), F.col("b.cents")).cast("double") / F.greatest(
        F.col("a.cents"), F.col("b.cents")
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(
            (F.abs(F.datediff(F.col("b.d"), F.col("a.d"))) <= 30) & (ratio >= 0.9)
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.round(F.col("a.cents").cast("double") / 100, 2).alias("amount_a"),
            F.round(F.col("b.cents").cast("double") / 100, 2).alias("amount_b"),
            F.round(ratio, 6).alias("amount_ratio"),
            F.abs(F.datediff(F.col("b.d"), F.col("a.d"))).cast("int").alias(
                "days_apart"
            ),
        )
    )


@register(
    "lineitem_quantity_heaping_audit",
    tags=("dq", "stats", "agg"),
    oracle="""
    WITH q AS (
      SELECT try_cast(l_quantity AS BIGINT) AS n
      FROM lineitem
      WHERE try_cast(l_quantity AS BIGINT) IS NOT NULL
        AND try_cast(l_quantity AS BIGINT) > 0
        AND try_cast(l_quantity AS DOUBLE) = try_cast(l_quantity AS BIGINT)
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN n % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS at10,
             CAST(sum(CASE WHEN n % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS at5,
             CAST(sum(CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS at2
      FROM q
    )
    SELECT n_rows,
           round(CAST(at10 AS DOUBLE) / n_rows, 6) AS share_mult10,
           round(CAST(at5 AS DOUBLE) / n_rows, 6) AS share_mult5,
           round(CAST(at2 AS DOUBLE) / n_rows, 6) AS share_mult2,
           round(CAST(at10 AS DOUBLE) / n_rows / 0.1, 6) AS heaping_index10,
           round(CAST(at5 AS DOUBLE) / n_rows / 0.2, 6) AS heaping_index5
    FROM m WHERE n_rows > 0
    """,
)
def lineitem_quantity_heaping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-preference (heaping) audit on order quantities: the share of
    values at multiples of 10/5/2 against the uniform expectation, as
    Whipple-style heaping indices (1.0 = no preference; >>1 = humans
    typed round numbers -- the classic symptom of manual entry, estimated
    counts, or a UI stepper). The round-number twin of
    lineitem_benford_first_digit: Benford checks leading-digit law on
    MAGNITUDE data, heaping checks terminal-digit preference on COUNT
    data -- together they cover the two standard entered-vs-measured
    forensic tests.

    Exactness: integer modular counts only (non-integers are excluded --
    a fractional quantity cannot heap); one division per index at 6 dp.

    Scale: one map-side-combinable pass to a 4-counter row -- the
    cheapest plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.expr("try_cast(l_quantity AS bigint)")
    q = li.select(n.alias("n")).filter(
        F.col("n").isNotNull()
        & (F.col("n") > 0)
        & (F.expr("try_cast(l_quantity AS double)") == F.col("n"))
    )
    m = q.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("n") % 10 == 0, 1).otherwise(0)).cast("bigint").alias("at10"),
        F.sum(F.when(F.col("n") % 5 == 0, 1).otherwise(0)).cast("bigint").alias("at5"),
        F.sum(F.when(F.col("n") % 2 == 0, 1).otherwise(0)).cast("bigint").alias("at2"),
    ).filter(F.col("n_rows") > 0)
    nr = F.col("n_rows").cast("double")
    return m.select(
        "n_rows",
        F.round(F.col("at10") / nr, 6).alias("share_mult10"),
        F.round(F.col("at5") / nr, 6).alias("share_mult5"),
        F.round(F.col("at2") / nr, 6).alias("share_mult2"),
        F.round(F.col("at10") / nr / 0.1, 6).alias("heaping_index10"),
        F.round(F.col("at5") / nr / 0.2, 6).alias("heaping_index5"),
    )


@register(
    "dq_functional_dependency_audit",
    tags=("dq", "audit"),
    oracle="""
    WITH cands AS (
      SELECT 'documents.source->lang' AS fd, source AS x,
             CAST(count(DISTINCT lang) AS BIGINT) AS ndy
      FROM documents GROUP BY source
      UNION ALL
      SELECT 'part.type->brand', p_type,
             CAST(count(DISTINCT p_brand) AS BIGINT)
      FROM part GROUP BY p_type
      UNION ALL
      SELECT 'orders.custkey->priority', CAST(o_custkey AS VARCHAR),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT)
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT 'lineitem.orderkey->suppkey', CAST(l_orderkey AS VARCHAR),
             CAST(count(DISTINCT l_suppkey) AS BIGINT)
      FROM lineitem GROUP BY l_orderkey
      UNION ALL
      SELECT 'customer.nation->segment', CAST(c_nationkey AS VARCHAR),
             CAST(count(DISTINCT c_mktsegment) AS BIGINT)
      FROM customer GROUP BY c_nationkey
    )
    SELECT fd,
           CAST(count(*) AS BIGINT) AS n_lhs_groups,
           CAST(sum(CASE WHEN ndy > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           round(CAST(sum(CASE WHEN ndy > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS violation_share,
           CAST(max(ndy) AS BIGINT) AS max_rhs_distinct,
           CAST(CASE WHEN max(ndy) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS holds
    FROM cands GROUP BY fd ORDER BY fd
    """,
)
def dq_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (the per-candidate core of FD-discovery
    profilers a la Papenbrock et al. 2015, scoped to a configured
    candidate list): for each X -> Y candidate, how many LHS groups exist,
    how many carry >1 distinct RHS value (violations), and whether the
    dependency HOLDS exactly. The audit every schema-inference and
    denormalization decision should read first: a "key" column whose FD
    is violated 0.1% of the time is a silent fan-out bug in every join
    that assumes it.

    Exactness: all counts are exact integers from count(DISTINCT) per
    group; one share division rounded at 6dp.

    Scale: each candidate is ONE map-side-combinable (X, distinct-Y)
    aggregate over its table -- the per-candidate cost is a groupBy on
    the LHS key, and candidates run as a union of independent partial
    aggs (no cross-table join, no window). The LHS-grain relations are
    key-bounded; only the 5-row verdict panel leaves the executors."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = load_table(spark, sf_dir, "documents")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")

    def cand(df, name, x, y):
        return df.groupBy(F.col(x).cast("string").alias("x")).agg(
            F.countDistinct(y).cast("bigint").alias("ndy")
        ).select(F.lit(name).alias("fd"), "x", "ndy")

    cands = (
        cand(d, "documents.source->lang", "source", "lang")
        .unionAll(cand(p, "part.type->brand", "p_type", "p_brand"))
        .unionAll(cand(o, "orders.custkey->priority", "o_custkey", "o_orderpriority"))
        .unionAll(cand(li, "lineitem.orderkey->suppkey", "l_orderkey", "l_suppkey"))
        .unionAll(cand(c, "customer.nation->segment", "c_nationkey", "c_mktsegment"))
    )
    viol = F.sum(F.when(F.col("ndy") > 1, 1).otherwise(0)).cast("bigint")
    return (
        cands.groupBy("fd")
        .agg(
            F.count("*").cast("bigint").alias("n_lhs_groups"),
            viol.alias("n_violating"),
            F.round(
                viol.cast("double") / F.count("*").cast("double"), 6
            ).alias("violation_share"),
            F.max("ndy").cast("bigint").alias("max_rhs_distinct"),
            F.when(F.max("ndy") == 1, F.lit(1)).otherwise(F.lit(0))
            .cast("bigint").alias("holds"),
        )
        .orderBy("fd")
    )


@register(
    "orders_calendar_completeness_audit",
    tags=("dq", "monitor"),
    oracle="""
    WITH b AS (
      SELECT CAST(min(date_trunc('day', o_orderdate)) AS TIMESTAMP) AS lo,
             CAST(max(date_trunc('day', o_orderdate)) AS TIMESTAMP) AS hi
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
               AS TIMESTAMP) AS day
      FROM b
    ),
    obs AS (
      SELECT DISTINCT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day
      FROM orders WHERE o_orderdate IS NOT NULL
    )
    SELECT CAST(dayofweek(spine.day) AS BIGINT) AS dw,
           CAST(count(*) AS BIGINT) AS expected_days,
           CAST(sum(CASE WHEN obs.day IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS observed_days,
           CAST(sum(CASE WHEN obs.day IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS missing_days,
           round(CAST(sum(CASE WHEN obs.day IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS coverage
    FROM spine LEFT JOIN obs ON obs.day = spine.day
    GROUP BY 1 ORDER BY 1
    """,
)
def orders_calendar_completeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-calendar completeness: a full day spine from the first to
    the last order date, per day-of-week -- expected vs observed active
    days, missing-day counts, and coverage share. The ingestion-hole
    detector at BUSINESS grain: cdc_lsn_gap_detection audits WAL
    continuity; this audits whether whole business days are absent from
    the replicated warehouse (a silent partition loss shows up here as
    a dow-skewed coverage drop before any revenue panel moves).

    Exactness: the spine is exact calendar arithmetic (both engines'
    day sequences are inclusive on both ends); counts are integers;
    one coverage division at 6dp. dw uses the shared 0=Sunday DuckDB
    convention.

    Scale: ONE pass over the fact scan reduces to the day-grain distinct
    (lazily checkpointed); the 1-row min/max fence, the calendar-bounded
    spine (|days| rows), and the coverage join all ride that |days|
    relation -- orders is never scanned twice."""
    o = load_table(spark, sf_dir, "orders")
    obs = (
        o.filter(F.col("o_orderdate").isNotNull())
        .select(
            F.date_trunc("day", "o_orderdate").cast("timestamp").alias("obs_day")
        )
        .distinct()
        .localCheckpoint(eager=False)  # fence + coverage-join consumers
    )
    b = obs.agg(
        F.min("obs_day").alias("lo"),
        F.max("obs_day").alias("hi"),
    )
    spine = b.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return (
        spine.join(obs, F.col("obs_day") == F.col("day"), "left")
        .groupBy((F.dayofweek("day") - 1).cast("bigint").alias("dw"))
        .agg(
            F.count("*").cast("bigint").alias("expected_days"),
            F.sum(F.when(F.col("obs_day").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("observed_days"),
            F.sum(F.when(F.col("obs_day").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("missing_days"),
            F.round(
                F.sum(F.when(F.col("obs_day").isNotNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("coverage"),
        )
        .orderBy("dw")
    )


@register(
    "dq_status_consistency_audit",
    tags=("dq", "cdc"),
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderstatus,
             CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_f,
             CAST(sum(CASE WHEN l.l_linestatus = 'O' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_o
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderstatus
    ),
    graded AS (
      SELECT o_orderstatus, n_lines,
             CASE WHEN n_lines = 0 THEN NULL
                  WHEN n_o = 0 THEN 'F'
                  WHEN n_f = 0 THEN 'O'
                  ELSE 'P' END AS expected_status
      FROM per_order
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN n_lines > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_lines,
           CAST(sum(CASE WHEN expected_status = o_orderstatus
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           CAST(sum(CASE WHEN expected_status IS NOT NULL
                          AND expected_status <> o_orderstatus
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(CAST(sum(CASE WHEN expected_status IS NOT NULL
                                AND expected_status <> o_orderstatus
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN n_lines > 0 THEN 1 ELSE 0 END), 0), 6)
             AS violation_share
    FROM graded GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def dq_status_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table status-semantics audit: the order status is a DERIVED
    fact (TPC-H semantics: 'F' = every line fulfilled, 'O' = every line
    open, 'P' = mixed), so a replicated warehouse can CHECK it against
    the line statuses instead of trusting it. Per status: order counts,
    how many orders' line mix agrees with the header, and the violation
    share -- the header/detail divergence a partial replication or an
    out-of-order apply produces (dq_orders_lineitem_reconciliation
    checks the MONEY adds up; this checks the STATE MACHINE agrees).
    Lineless orders are counted but excluded from the violation
    denominator (no lines = no derivable status).

    Exactness: pure integer counting over one orderkey-co-partitioned
    LEFT join; a single share division at 6dp with a nullif guard.

    Scale: ONE fact-fact join (both orderkey-keyed), order-grain
    reduction, |statuses| rows out."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"], "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_f"),
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0))
            .cast("bigint")
            .alias("n_o"),
        )
    )
    expected = (
        F.when(F.col("n_lines") == 0, F.lit(None).cast("string"))
        .when(F.col("n_o") == 0, F.lit("F"))
        .when(F.col("n_f") == 0, F.lit("O"))
        .otherwise(F.lit("P"))
    )
    graded = per_order.select("o_orderstatus", "n_lines", expected.alias("exp"))
    viol = F.sum(
        F.when(F.col("exp").isNotNull() & (F.col("exp") != F.col("o_orderstatus")), 1)
        .otherwise(0)
    )
    with_lines = F.sum(F.when(F.col("n_lines") > 0, 1).otherwise(0))
    return (
        graded.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            with_lines.cast("bigint").alias("n_with_lines"),
            F.sum(F.when(F.col("exp") == F.col("o_orderstatus"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_consistent"),
            viol.cast("bigint").alias("n_violations"),
            F.round(
                viol.cast("double") / F.nullif(with_lines, F.lit(0)), 6
            ).alias("violation_share"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lineitem_linenumber_density_audit",
    tags=("dq",),
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(min(l_linenumber) AS BIGINT) AS min_ln,
             CAST(max(l_linenumber) AS BIGINT) AS max_ln,
             CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN min_ln = 1 AND max_ln = n_lines
                          AND n_distinct = n_lines THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dense,
           CAST(sum(CASE WHEN n_distinct < n_lines THEN 1 ELSE 0 END)
             AS BIGINT) AS n_duplicated,
           CAST(sum(CASE WHEN n_distinct = n_lines
                          AND (min_ln > 1 OR max_ln > n_lines)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_gapped,
           round(CAST(sum(CASE WHEN min_ln = 1 AND max_ln = n_lines
                                AND n_distinct = n_lines THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS dense_share,
           CAST(max(max_ln) AS BIGINT) AS max_linenumber
    FROM per_order
    """,
)
def lineitem_linenumber_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-density audit on the line numbers: within each order,
    l_linenumber should be exactly 1..n (dense, no duplicates, no
    gaps). Duplicates are the at-least-once replay fingerprint at DETAIL
    grain (the lineitem twin of cdc_duplicate_delivery_audit's event
    identity check); gaps are lost-update evidence -- a line was
    delivered, then vanished. One panel row: dense/duplicated/gapped
    order counts and the dense share.

    Exactness: pure integer min/max/distinct counting per order; one
    share division at 6dp.

    Scale: one orderkey-grain partial agg over the fact scan (the
    distinct folds inside the same exchange), then a 1-row fold."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.min("l_linenumber").cast("bigint").alias("min_ln"),
        F.max("l_linenumber").cast("bigint").alias("max_ln"),
        F.countDistinct("l_linenumber").cast("bigint").alias("n_distinct"),
    )
    dense = (
        (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
        & (F.col("n_distinct") == F.col("n_lines"))
    )
    return per_order.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(dense, 1).otherwise(0)).cast("bigint").alias("n_dense"),
        F.sum(F.when(F.col("n_distinct") < F.col("n_lines"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_duplicated"),
        F.sum(
            F.when(
                (F.col("n_distinct") == F.col("n_lines"))
                & ((F.col("min_ln") > 1) | (F.col("max_ln") > F.col("n_lines"))),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gapped"),
        F.round(
            F.sum(F.when(dense, 1).otherwise(0)).cast("double") / F.count("*"), 6
        ).alias("dense_share"),
        F.max("max_ln").cast("bigint").alias("max_linenumber"),
    )
