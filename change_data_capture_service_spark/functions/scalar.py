"""Scalar function surface (SURVEY.md §2.2 X9-X15): string, date, math,
array, struct, JSON, conditional. All built-in ``pyspark.sql.functions`` --
JVM-side, inside whole-stage codegen; no Python in any hot path.

Cross-engine notes baked into the oracles:
- Spark ``ceil``/``floor`` on DOUBLE return BIGINT; DuckDB returns DOUBLE
  -> oracle casts to BIGINT.
- ``datediff``: Spark is datediff(end, start) on dates; DuckDB is
  date_diff('day', start, end) -> cast operands to DATE and flip order.
- libm-dependent fns (ln, pow) can differ in the last ulp between the JVM
  and C libm -> both sides round to 6 decimals.
- Spark DATE results are cast to TIMESTAMP on both sides (pandas dtype
  parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "str_funcs",
    tags=("scalar",),
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_name, 1, 4) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           trim('  ' || p_name || ' ') AS name_trim,
           CAST(length(p_name) AS INT) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           (p_type LIKE '%ECO%') AS is_eco
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/trim/length/replace/split/regexp/like."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.col("p_type").like("%ECO%").alias("is_eco"),
    )


@register(
    "str_funcs2",
    tags=("scalar",),
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_lpad,
           rpad(p_type, 10, '.') AS type_rpad,
           reverse(p_name) AS name_rev,
           translate(p_name, 'aeiou', 'AEIOU') AS name_upvowel,
           CAST(strpos(p_name, 'widget') AS INT) AS widget_pos,
           left(p_name, 3) AS name_left3,
           right(p_name, 3) AS name_right3,
           repeat(p_brand, 2) AS brand_twice
    FROM part
    """,
)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/reverse/translate/instr/left/right/repeat."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_type", 10, ".").alias("type_rpad"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_upvowel"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.substring("p_name", 1, 3).alias("name_left3"),
        F.expr("right(p_name, 3)").alias("name_right3"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    )


@register(
    "date_funcs2",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3_months,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders
    """,
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_day/add_months/dayofweek/dayofyear/quarter. DuckDB dayofweek is
    0=Sunday..6; Spark is 1=Sunday..7 -- oracle uses DuckDB's own dayofweek
    and Spark subtracts 1 to match. add_months clamps to month end in both
    engines (interval month add in DuckDB clamps the same way)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).cast("timestamp").alias("plus_3_months"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@register(
    "map_funcs",
    tags=("scalar",),
    oracle="""
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS k_event_id,
           event_type AS v_event_type,
           2 AS map_size
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access (the envelope payload type, R3):
    build map<string,string>, read entries back out -- output flattened to
    scalars for cross-engine hashing."""
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("event_id"), F.lit("event_type")),
        F.array(F.col("event_id").cast("string"), F.col("event_type")),
    )
    built = e.select("event_id", m.alias("m"))
    return built.select(
        "event_id",
        F.element_at("m", "event_id").alias("k_event_id"),
        F.element_at("m", "event_type").alias("v_event_type"),
        F.size("m").alias("map_size"),
    )


@register(
    "date_funcs",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-06-01') AS INT) AS days_to_y2k5,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add/unix_timestamp over
    order dates (session tz pinned UTC so epoch matches DuckDB's naive)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-06-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k5"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "math_funcs",
    tags=("scalar",),
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 1) AS bal_round,
           abs(c_acctbal - 5000) AS bal_abs_dev,
           CAST(ceil(c_acctbal / 100) AS BIGINT) AS bal_ceil_h,
           CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_floor_h,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           round(ln(abs(c_acctbal) + 1), 6) AS bal_ln,
           round(pow(c_acctbal / 1000, 2), 6) AS bal_pow2,
           c_custkey % 7 AS key_mod7,
           CAST(sign(c_acctbal - 5000) AS DOUBLE) AS bal_sign
    FROM customer
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/pow/mod/sign. sqrt is IEEE
    correctly-rounded (bit-exact both engines); ln/pow round to 6dp."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round("c_acctbal", 1).alias("bal_round"),
        F.abs(F.col("c_acctbal") - 5000).alias("bal_abs_dev"),
        F.ceil(F.col("c_acctbal") / 100).alias("bal_ceil_h"),
        F.floor(F.col("c_acctbal") / 100).alias("bal_floor_h"),
        F.sqrt(F.abs("c_acctbal")).alias("bal_sqrt"),
        F.round(F.log(F.abs(F.col("c_acctbal")) + 1), 6).alias("bal_ln"),
        F.round(F.pow(F.col("c_acctbal") / 1000, 2), 6).alias("bal_pow2"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        F.signum(F.col("c_acctbal") - 5000).alias("bal_sign"),
    )


@register(
    "array_funcs",
    tags=("scalar",),
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(embedding[64] AS DOUBLE) AS last_component,
           CAST(list_min(embedding) AS DOUBLE) AS min_component,
           CAST(list_max(embedding) AS DOUBLE) AS max_component,
           (list_contains(embedding, 0.0)) AS has_zero
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/array_min/array_max/array_contains over the
    embedding column (float32 components cast to double for cross-engine
    dtype parity)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", 64).cast("double").alias("last_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "array_explode",
    tags=("scalar",),
    oracle="""
    SELECT e.vec_id,
           CAST(t.i - 1 AS INT) AS pos,
           CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) AS component
    FROM embeddings e CROSS JOIN range(1, 65) AS t(i)  -- dim = 64, fixed
    WHERE e.vec_id < 20
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode <-> UNNEST WITH ORDINALITY (0-based position). The
    generator multiplies rows ×64 -- at scale always filter/prune before
    exploding (predicate pushed below the generator here)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "component")).select(
        "vec_id", "pos", F.col("component").cast("double").alias("component")
    )


@register(
    "struct_funcs",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           o_custkey AS s_custkey,
           o_totalprice AS s_price,
           (o_totalprice > 100000) AS s_is_big
    FROM orders
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct (the envelope pattern, reference
    ``replicator.go:138-145``) then extract its fields back out -- proving
    struct construction/field-access round-trips losslessly."""
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
            (F.col("o_totalprice") > 100000).alias("is_big"),
        ).alias("s"),
    )
    return nested.select(
        "o_orderkey",
        F.col("s.custkey").alias("s_custkey"),
        F.col("s.price").alias("s_price"),
        F.col("s.is_big").alias("s_is_big"),
    )


@register(
    "json_funcs",
    tags=("scalar",),
    oracle="""
    WITH v AS (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS k_raw,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.missing') END AS miss_raw
      FROM events
    )
    SELECT event_id,
           TRY_CAST(k_raw AS BIGINT) AS k_num,
           k_raw AS k_str,
           (k_raw IS NOT NULL) AS has_k,
           (miss_raw IS NULL) AS missing_is_null
    FROM v
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction over the ``events.props`` JSON string -- the
    engine's envelope codec exercised as a scalar surface (reference decodes
    JSON payloads dynamically, ``cmd/es_consumer/main.go:66-71``)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    # try_cast: props is USER payload; a non-numeric $.k must extract as
    # NULL (the dead-letter principle), not throw under ANSI
    return e.select(
        "event_id",
        k.try_cast("long").alias("k_num"),
        k.alias("k_str"),
        k.isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "case_when",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE + simple CASE."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
    )


@register(
    "coalesce_nullif",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority_clean,
           nullif(o_orderstatus, 'P') AS status_or_null,
           coalesce(CAST(NULL AS DOUBLE), o_totalprice, 0.0) AS price_fallback
    FROM orders
    """,
)
def coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL plumbing: nullif to erase sentinel strings (the reference uses
    the sentinel string "(unchanged)" for TOAST columns,
    ``replicator.go:349-350`` -- nullif is how the engine erases it),
    coalesce to backfill."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unspecified")
        ).alias("priority_clean"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.coalesce(F.lit(None).cast("double"), F.col("o_totalprice"), F.lit(0.0)).alias(
            "price_fallback"
        ),
    )


@register(
    "regex_funcs",
    tags=("scalar",),
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_name, 'red') AS has_red,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) AS INT) AS n_spaces
    FROM part
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike. Note the cross-engine trap:
    Spark regexp_replace is global by default while DuckDB needs the 'g'
    flag -- the oracle carries it explicitly. All JVM-side codegen
    expressions (no UDF)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("red").alias("has_red"),
        F.length(F.regexp_replace("p_name", r"[^ ]", "")).alias("n_spaces"),
    )


@register(
    "hash_funcs",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
           sha256(CAST(o_orderkey AS VARCHAR)) AS key_sha256
    FROM orders
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (md5 / sha2-256) -- the engine-portable hash
    family: unlike xxhash64/city, these agree bit-for-bit across engines,
    which is what makes hash-based sampling and shard assignment
    reproducible between a Spark pipeline and any other stack."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.md5(k).alias("key_md5"),
        F.sha2(k, 256).alias("key_sha256"),
    )


@register(
    "bitwise_funcs",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS set_bit,
           xor(o_orderkey, 21) AS flipped,
           o_orderkey << 2 AS shl,
           o_orderkey >> 1 AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shift/popcount over BIGINT keys -- the primitive
    layer under hash partitioning, bloom membership, and simhash distance."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("set_bit"),
        F.expr("o_orderkey ^ 21").alias("flipped"),
        F.shiftleft(F.col("o_orderkey"), 2).alias("shl"),
        F.shiftright(F.col("o_orderkey"), 1).alias("shr"),
        F.bit_count(F.col("o_orderkey")).alias("popcount"),
    )


@register(
    "generate_series",
    tags=("scalar",),
    oracle="""
    SELECT r.r_regionkey, CAST(gs.range AS BIGINT) AS step
    FROM region r CROSS JOIN range(1, 6) gs
    """,
)
def generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: sequence() + explode -- Spark's lateral
    generate_series. Distributed trait: the sequence explodes per-row on
    the executors, so generating N rows per input row never routes through
    the driver."""
    r = load_table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(1).cast("long"), F.lit(5).cast("long"))).alias("step"),
    )


@register(
    "try_funcs",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_whole,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CAST(o_totalprice / nullif(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) - 1, 0)
                AS DOUBLE) AS per_prio_less_one
    FROM orders
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts: try_cast yields NULL instead of failing the job --
    at 100 TB one malformed row must not kill a stage ('1-URGENT' as a
    whole is not an int; its first char is). Division guards through
    nullif so priority 1 yields NULL, not a divide error."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS int)").alias("prio_whole"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS int)").alias("prio_digit"),
        (F.col("o_totalprice") / F.nullif(F.expr("try_cast(substring(o_orderpriority, 1, 1) AS int) - 1"), F.lit(0)))
        .cast("double")
        .alias("per_prio_less_one"),
    )


@register(
    "array_explode_outer",
    tags=("scalar",),
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, unnest(toks) AS token FROM t WHERE len(toks) > 0
    UNION ALL
    SELECT doc_id, NULL AS token FROM t WHERE len(toks) = 0 OR toks IS NULL
    """,
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with an EMPTY array survive as (key, NULL)
    instead of vanishing -- the difference between 'this doc has no tokens'
    and 'this doc was dropped'. Plain explode silently loses empty docs,
    which at corpus scale is an invisible data-loss bug; a pipeline that
    must account for every input row uses the outer variant -- and NULL
    arrays (null text) survive the same way, not just empty ones. (DuckDB
    has no outer unnest; the oracle reconstructs it with a UNION ALL whose
    second branch must cover len=0 OR NULL -- len(NULL) is NULL, which
    silently drops null-array rows from both branches otherwise.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    return d.select("doc_id", F.explode_outer(toks).alias("token"))


@register(
    "variant_funcs",
    tags=("scalar", "json"),
    oracle="""
    WITH v AS (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS k_raw,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.missing') END AS miss_raw
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           TRY_CAST(k_raw AS BIGINT) AS k_long,
           k_raw AS k_str,
           CAST(TRY_CAST(k_raw AS BIGINT) IS NOT NULL AS BOOLEAN) AS has_k,
           TRY_CAST(miss_raw AS BIGINT) AS missing_long
    FROM v
    """,
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type surface: ``parse_json`` into the binary
    semi-structured VARIANT encoding, typed path extraction with
    ``variant_get`` / ``try_variant_get`` (missing paths -> NULL, like the
    oracle's JSON extraction) -- the open-table-format answer to schemaless
    payloads that replaces string re-parsing per access: parse ONCE,
    extract many times from the binary form.

    Scale: VARIANT stores a parsed binary tree, so repeated extractions
    skip the JSON tokenizer; with parquet variant shredding the column
    prunes like a struct. All JVM-side, codegen'd, zero shuffles."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')").alias("k_long"),
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'string')").alias("k_str"),
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')").isNotNull().alias("has_k"),
        F.expr("try_variant_get(try_parse_json(props), '$.missing', 'long')").alias(
            "missing_long"
        ),
    )
