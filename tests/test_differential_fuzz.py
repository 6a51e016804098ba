"""Property-based differential fuzzing of the relational core: a bounded
seeded random query generator over the fixture schemas, executed on BOTH
engines (Spark SQL and DuckDB) and compared by the driver's
order-insensitive row hash. Extends correctness beyond the 426 fixed
oracles into the COMPOSITION space -- filters x aggregates x joins x
grouping x having x limit, drawn from a dialect-neutral ANSI subset both
engines parse identically (round-9 verdict item 7).

Dialect-neutral grammar rules (each keeps the comparison bit-stable):
- integer aggregates wrap in CAST(... AS BIGINT) (DuckDB sum(int) is
  HUGEINT, Spark is LONG);
- money flows through exact integer cents (decimal cast * 100), never
  raw float sums;
- avg/division never appears -- only exact-integer outputs;
- ORDER BY + LIMIT only over a deterministic total order (every output
  column listed, unique grouping);
- date predicates compare against TIMESTAMP literals (both engines);
- no dayofweek (Sunday=1 in Spark, 0 in DuckDB) -- year/month only.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest

SEEDS = list(range(100))

# (table, categorical cols, numeric-cents expr, date col, int col)
TABLES = {
    "lineitem": {
        "cats": ["l_returnflag", "l_linestatus"],
        "cents": "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "date": "l_shipdate",
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    },
    "orders": {
        "cats": ["o_orderstatus", "o_orderpriority"],
        "cents": "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "date": "o_orderdate",
        "ints": ["o_orderkey", "o_custkey"],
    },
    "events": {
        "cats": ["event_type"],
        "cents": "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "date": "ts",
        "ints": ["event_id", "user_id"],
    },
}

CAT_VALUES = {
    "l_returnflag": ["R", "A", "N"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "event_type": ["click", "view", "purchase", "signup", "error"],
}


def _gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    joined = False
    if table == "lineitem" and rng.random() < 0.4:
        joined = True
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
        cats = meta["cats"] + TABLES["orders"]["cats"]
    else:
        frm = table
        cats = meta["cats"]

    preds = []
    n_preds = rng.randint(0, 2)
    for _ in range(n_preds):
        kind = rng.choice(["cat", "int", "date"])
        if kind == "cat":
            c = rng.choice(cats)
            if rng.random() < 0.5:
                preds.append(f"{c} = '{rng.choice(CAT_VALUES[c])}'")
            else:
                vals = ", ".join(f"'{v}'" for v in rng.sample(CAT_VALUES[c], 2))
                preds.append(f"{c} IN ({vals})")
        elif kind == "int":
            c = rng.choice(meta["ints"])
            op = rng.choice(["<", ">", "<=", ">=", "%"])
            if op == "%":
                preds.append(f"{c} % {rng.randint(2, 7)} = {rng.randint(0, 1)}")
            else:
                preds.append(f"{c} {op} {rng.randint(1, 5000)}")
        else:
            yr = rng.randint(2023, 2026) if table == "events" else rng.randint(1992, 1998)
            preds.append(
                f"{meta['date']} {rng.choice(['<', '>='])} "
                f"TIMESTAMP '{yr}-0{rng.randint(1, 9)}-15 00:00:00'"
            )
    where = (" WHERE " + f" {rng.choice(['AND', 'OR'])} ".join(preds)) if preds else ""

    n_group = rng.randint(0, min(2, len(cats)))
    gcols = rng.sample(cats, n_group)
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    if rng.random() < 0.8:
        aggs.append(f"CAST(sum({meta['cents']}) AS BIGINT) AS s_cents")
    if rng.random() < 0.5:
        aggs.append(f"CAST(min({meta['cents']}) AS BIGINT) AS min_cents")
        aggs.append(f"CAST(max({meta['cents']}) AS BIGINT) AS max_cents")
    if rng.random() < 0.4:
        c = rng.choice(meta["ints"])
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd")
    if rng.random() < 0.3 and not joined:
        # conditional aggregation: CASE inside SUM, identical semantics
        c = rng.choice(cats)
        v = rng.choice(CAT_VALUES[c])
        aggs.append(
            f"CAST(sum(CASE WHEN {c} = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS n_case"
        )

    sel = (", ".join(gcols + aggs)) if gcols else ", ".join(aggs)
    q = f"SELECT {sel} FROM {frm}{where}"
    if gcols:
        q += " GROUP BY " + ", ".join(gcols)
        if rng.random() < 0.4:
            q += f" HAVING count(*) > {rng.randint(0, 3)}"
        if rng.random() < 0.4:
            # deterministic total order: grouping cols are unique per row
            q += " ORDER BY " + ", ".join(gcols) + f" LIMIT {rng.randint(1, 5)}"
    return q


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def _hash(rows, cols) -> str:
    lines = sorted(
        "|".join(_norm(r[c]) for c in sorted(cols)) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    con = duckdb.connect()
    # customer isn't in the single-table grammar but the outer-join
    # grammar's customer_orders shape needs it
    for t in [*TABLES, "customer"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return spark, con


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_fuzz(engines, seed):
    spark, con = engines
    q = _gen_query(random.Random(seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q, scols, ocols)
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q


def _gen_window_query(rng: random.Random) -> str:
    """Window-function template: deterministic analytic queries (every
    window has a unique-key tiebreak; every aggregate is exact-integer)
    over a pre-filtered slice so outputs stay small."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    cat = rng.choice(meta["cats"])
    uniq = {"lineitem": "l_orderkey * 8 + l_linenumber",
            "orders": "o_orderkey",
            "events": "event_id"}[table]
    cents = meta["cents"]
    part = f"PARTITION BY {cat} " if rng.random() < 0.8 else ""
    order = f"ORDER BY {cents} {rng.choice(['ASC', 'DESC'])}, {uniq}"
    w = f"{part}{order}"
    exprs = [f"CAST({uniq} AS BIGINT) AS uk", cat, f"{cents} AS cents"]
    picks = rng.sample(
        [
            f"CAST(row_number() OVER ({w}) AS BIGINT) AS rn",
            f"CAST(rank() OVER ({w}) AS BIGINT) AS rnk",
            f"CAST(dense_rank() OVER ({w}) AS BIGINT) AS drnk",
            f"CAST(sum({cents}) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum",
            f"CAST(lag({cents}, 1) OVER ({w}) AS BIGINT) AS prev_c",
            f"CAST(lead({cents}, 1) OVER ({w}) AS BIGINT) AS next_c",
            f"CAST(count(*) OVER ({part}{order} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS w3",
            f"CAST(min({cents}) OVER ({w} ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS wmin",
        ],
        rng.randint(2, 4),
    )
    mod = rng.randint(13, 41)
    q = (
        f"SELECT {', '.join(exprs + picks)} FROM "
        f"(SELECT * FROM {table} WHERE {uniq} % {mod} = 0 AND {cents} IS NOT NULL) t"
    )
    return q


@pytest.mark.parametrize("seed", SEEDS[:20])
def test_differential_fuzz_windows(engines, seed):
    spark, con = engines
    q = _gen_window_query(random.Random(1000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q, scols, ocols)
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q


def _gen_setop_query(rng: random.Random) -> str:
    """Set-operation template: two filtered projections of the same table
    combined with UNION / UNION ALL / INTERSECT / EXCEPT -- identical
    semantics in both dialects; outputs are exact categorical/bucketed
    pairs so the hash comparison is bit-stable."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    cat = rng.choice(meta["cats"])
    intc = rng.choice(meta["ints"])
    bucket = f"CAST({intc} % {rng.randint(3, 9)} AS BIGINT)"

    def side():
        c = rng.choice(CAT_VALUES[cat])
        op = rng.choice(["=", "<>"])
        extra = ""
        if rng.random() < 0.5:
            extra = f" AND {intc} {rng.choice(['<', '>='])} {rng.randint(100, 3000)}"
        return (
            f"SELECT {cat} AS c, {bucket} AS b FROM {table} "
            f"WHERE {cat} {op} '{c}'{extra}"
        )

    setop = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return f"{side()} {setop} {side()}"


@pytest.mark.parametrize("seed", SEEDS[:15])
def test_differential_fuzz_setops(engines, seed):
    spark, con = engines
    q = _gen_setop_query(random.Random(2000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, sorted(sdf.columns)) == _hash(orows, sorted(ocols_raw)), q


def _gen_outer_join_query(rng: random.Random) -> str:
    """Outer-join NULL-semantics template (round-10 verdict item 7): the
    class where engines diverge most -- predicate placement (ON vs WHERE
    changes an outer join's result), NULL-extended rows in aggregates,
    IS NULL anti-join filters, FULL OUTER key coalescing. Every output
    stays exact-integer; the preserved side's grouping keys are non-NULL
    by construction (or coalesced), so the hash is bit-stable."""
    shape = rng.choice(["orders_lineitem", "customer_orders"])
    if shape == "orders_lineitem":
        left, lkey = "orders", "o_orderkey"
        right, rkey = "lineitem", "l_orderkey"
        gcol = rng.choice(["o_orderstatus", "o_orderpriority"])
        rcents = TABLES["lineitem"]["cents"]
        rfilter = f"l_quantity {rng.choice(['<', '>='])} {rng.randint(5, 45)}"
    else:
        left, lkey = "customer", "c_custkey"
        right, rkey = "orders", "o_custkey"
        gcol = "c_mktsegment"
        rcents = TABLES["orders"]["cents"]
        rfilter = (
            f"o_orderstatus = '{rng.choice(CAT_VALUES['o_orderstatus'])}'"
        )

    jt = rng.choice(["LEFT", "LEFT", "FULL"])  # LEFT twice: the common case
    # predicate placement: ON-clause filter keeps unmatched left rows,
    # WHERE-clause filter drops them -- exercise BOTH deliberately
    on_filter = rng.random() < 0.5
    if on_filter:
        frm = (
            f"{left} {jt} OUTER JOIN {right} "
            f"ON {lkey} = {rkey} AND {rfilter}"
        )
        where = ""
    else:
        frm = f"{left} {jt} OUTER JOIN {right} ON {lkey} = {rkey}"
        # WHERE on the right side must keep the NULL-extended rows to stay
        # an outer join: wrap in (pred OR right_key IS NULL)
        where = f" WHERE ({rfilter} OR {rkey} IS NULL)"

    g = f"coalesce({gcol}, '<null>')" if jt == "FULL" else gcol
    aggs = [
        "CAST(count(*) AS BIGINT) AS n",
        f"CAST(sum(CASE WHEN {rkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_unmatched",
        f"CAST(sum(coalesce({rcents}, 0)) AS BIGINT) AS s_cents",
        f"CAST(count({rkey}) AS BIGINT) AS n_matched_nonnull",
    ]
    if rng.random() < 0.4:
        aggs.append(
            f"CAST(count(DISTINCT {lkey}) AS BIGINT) AS nd_left"
        )
    return (
        f"SELECT {g} AS grp, {', '.join(aggs)} FROM {frm}{where} "
        f"GROUP BY {g}"
    )


@pytest.mark.parametrize("seed", SEEDS[:25])
def test_differential_fuzz_outer_joins(engines, seed):
    spark, con = engines
    q = _gen_outer_join_query(random.Random(3000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q, scols, ocols)
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q


def _gen_setop_over_join_query(rng: random.Random) -> str:
    """Set operations OVER join results (round-10 verdict item 7): the
    second high-divergence class -- duplicate semantics of UNION vs
    UNION ALL interact with join multiplicity, and INTERSECT/EXCEPT are
    SET-semantics (dedup first) on both engines. Sides are key
    projections of joins so multiplicity is real."""
    seg = rng.choice(CAT_VALUES["o_orderstatus"])
    flag = rng.choice(CAT_VALUES["l_returnflag"])
    mod = rng.randint(3, 9)

    def join_side(extra: str) -> str:
        return (
            f"SELECT CAST(o_orderkey % {mod} AS BIGINT) AS b, "
            f"o_orderstatus AS s FROM orders JOIN lineitem "
            f"ON o_orderkey = l_orderkey WHERE {extra}"
        )

    s1 = join_side(f"l_returnflag = '{flag}'")
    s2 = (
        join_side(f"o_orderstatus = '{seg}'")
        if rng.random() < 0.6
        else f"SELECT CAST(o_orderkey % {mod} AS BIGINT) AS b, "
        f"o_orderstatus AS s FROM orders WHERE o_orderstatus = '{seg}'"
    )
    setop = rng.choice(["UNION", "INTERSECT", "EXCEPT", "UNION ALL"])
    if setop == "UNION ALL":
        # join multiplicity makes raw UNION ALL row counts huge and
        # unhashable-by-row: aggregate the bag to (key, multiplicity)
        return (
            f"SELECT b, s, CAST(count(*) AS BIGINT) AS m FROM "
            f"({s1} UNION ALL {s2}) u GROUP BY b, s"
        )
    return f"{s1} {setop} {s2}"


@pytest.mark.parametrize("seed", SEEDS[:25])
def test_differential_fuzz_setops_over_joins(engines, seed):
    spark, con = engines
    q = _gen_setop_over_join_query(random.Random(4000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, sorted(sdf.columns)) == _hash(orows, sorted(ocols_raw)), q


def _gen_window_over_join_query(rng: random.Random) -> str:
    """Windows OVER join results: analytic functions partitioned by a
    dimension column of a fact-dim join -- the class where a planner
    that reorders the join around the window (or loses the join
    multiplicity before partitioning) diverges. Same determinism rules:
    unique-key tiebreaks, exact-integer outputs, pre-filtered slices."""
    flag = rng.choice(CAT_VALUES["l_returnflag"])
    mod = rng.randint(17, 53)
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    uniq = "l_orderkey * 8 + l_linenumber"
    part = rng.choice(["o_orderstatus", "o_orderpriority", "l_returnflag"])
    order = f"ORDER BY cents {rng.choice(['ASC', 'DESC'])}, uk"
    w = f"PARTITION BY {part} {order}"
    picks = rng.sample(
        [
            f"CAST(row_number() OVER ({w}) AS BIGINT) AS rn",
            f"CAST(rank() OVER ({w}) AS BIGINT) AS rnk",
            f"CAST(sum(cents) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND CURRENT ROW) AS BIGINT) AS cum",
            f"CAST(lag(cents, 1) OVER ({w}) AS BIGINT) AS prev_c",
            f"CAST(count(*) OVER ({w} ROWS BETWEEN 1 PRECEDING AND"
            f" 1 FOLLOWING) AS BIGINT) AS w3",
            f"CAST(ntile(4) OVER ({w}) AS BIGINT) AS q4",
        ],
        rng.randint(2, 3),
    )
    base = (
        f"SELECT o_orderstatus, o_orderpriority, l_returnflag, "
        f"{cents} AS cents, CAST({uniq} AS BIGINT) AS uk "
        f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE ({uniq}) % {mod} = 0 AND l_returnflag = '{flag}' "
        f"AND {cents} IS NOT NULL"
    )
    return f"SELECT uk, {part}, cents, {', '.join(picks)} FROM ({base}) j"


@pytest.mark.parametrize("seed", SEEDS[:25])
def test_differential_fuzz_windows_over_joins(engines, seed):
    spark, con = engines
    q = _gen_window_over_join_query(random.Random(5000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q, scols, ocols)
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q


def _gen_agg_filter_query(rng: random.Random) -> str:
    """Aggregate-FILTER template (round-12): `agg(...) FILTER (WHERE p)`
    is the last aggregate-syntax class the fuzzer had not covered --
    both dialects support it, but the empty-filter-set semantics (sum ->
    NULL, count -> 0) and FILTER-vs-CASE equivalence are exactly where a
    translation layer would slip. Determinism rules unchanged:
    exact-integer outputs, unique grouping, no division."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    cat = rng.choice(meta["cats"])
    cents = meta["cents"]
    ic = rng.choice(meta["ints"])

    def pred() -> str:
        kind = rng.choice(["cat", "int", "empty"])
        if kind == "cat":
            c = rng.choice(meta["cats"])
            return f"{c} = '{rng.choice(CAT_VALUES[c])}'"
        if kind == "int":
            return f"{ic} % {rng.randint(2, 9)} = {rng.randint(0, 1)}"
        # deliberately unsatisfiable: pins the empty-set semantics
        return f"{ic} < 0"

    aggs = [
        "CAST(count(*) AS BIGINT) AS n",
        f"CAST(count(*) FILTER (WHERE {pred()}) AS BIGINT) AS nf",
        f"CAST(sum({cents}) FILTER (WHERE {pred()}) AS BIGINT) AS sf",
    ]
    if rng.random() < 0.5:
        aggs.append(
            f"CAST(min({cents}) FILTER (WHERE {pred()}) AS BIGINT) AS mf"
        )
    if rng.random() < 0.4:
        aggs.append(
            f"CAST(count(DISTINCT {ic}) FILTER (WHERE {pred()}) AS BIGINT) AS ndf"
        )
    grouped = rng.random() < 0.7
    sel = ", ".join(([cat] if grouped else []) + aggs)
    q = f"SELECT {sel} FROM {table}"
    if grouped:
        q += f" GROUP BY {cat}"
    return q


@pytest.mark.parametrize("seed", SEEDS[:15])
def test_differential_fuzz_agg_filter(engines, seed):
    spark, con = engines
    q = _gen_agg_filter_query(random.Random(6000 + seed))
    sdf = spark.sql(q)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q, scols, ocols)
    assert len(srows) == len(orows), (q, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q


def _gen_ignore_nulls_window_query(rng: random.Random) -> tuple[str, str]:
    """IGNORE-NULLS + explicit-null-ordering template (round-12): the two
    remaining dialect-divergence classes. A synthetic nullable value
    column (uniq % k -> NULL) feeds lag/lead/first_value/last_value with
    null skipping over deterministic frames, and the window ORDER BY may
    sort by the NULLABLE column with an EXPLICIT NULLS FIRST/LAST (the
    engines' DEFAULTS differ -- DuckDB defaults NULLS LAST ascending,
    Spark NULLS FIRST -- so only explicit ordering is comparable; the
    uniq tiebreak keeps the total order deterministic either way).

    Returns (spark_sql, duck_sql): the ONLY textual difference is the
    IGNORE NULLS placement, which is itself a dialect split -- Spark
    parses `lag(x, 1) IGNORE NULLS OVER (...)` (SQL:2011 trailing form)
    while DuckDB 1.0 parses `lag(x, 1 IGNORE NULLS) OVER (...)`
    (in-argument form) and rejects the trailing one. Both texts come
    from the same random draws, so the semantics comparison is exact."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    cat = rng.choice(meta["cats"])
    cents = meta["cents"]
    uniq = {"lineitem": "l_orderkey * 8 + l_linenumber",
            "orders": "o_orderkey",
            "events": "event_id"}[table]
    mod = rng.randint(13, 41)
    nullk = rng.randint(2, 4)
    base = (
        f"SELECT {cat} AS cat, CAST({uniq} AS BIGINT) AS uk,"
        f" {cents} AS cents,"
        f" CASE WHEN ({uniq}) % {nullk} = 0 THEN NULL ELSE {cents} END AS nval"
        f" FROM {table} WHERE ({uniq}) % {mod} = 0 AND {cents} IS NOT NULL"
    )
    if rng.random() < 0.5:
        order = f"ORDER BY cents {rng.choice(['ASC', 'DESC'])}, uk"
    else:
        order = (
            f"ORDER BY nval {rng.choice(['ASC', 'DESC'])} "
            f"NULLS {rng.choice(['FIRST', 'LAST'])}, uk"
        )
    part = "PARTITION BY cat " if rng.random() < 0.7 else ""
    w = f"{part}{order}"
    run = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    # (fn_call_args, frame, alias): rendered per dialect below
    candidates = [
        ("lag(nval, 1", f"{w}", "lag_in"),
        ("lead(nval, 1", f"{w}", "lead_in"),
        ("first_value(nval", f"{w} {run}", "fv_in"),
        ("last_value(nval", f"{w} {run}", "lv_in"),
    ]
    picks = rng.sample(candidates, rng.randint(2, 3))
    plain = f"CAST(row_number() OVER ({w}) AS BIGINT) AS rn"
    spark_picks, duck_picks = [plain], [plain]
    for call, frame, alias in picks:
        spark_picks.append(
            f"CAST({call}) IGNORE NULLS OVER ({frame}) AS BIGINT) AS {alias}"
        )
        duck_picks.append(
            f"CAST({call} IGNORE NULLS) OVER ({frame}) AS BIGINT) AS {alias}"
        )
    head = f"SELECT uk, cat, nval, "
    tail = f" FROM ({base}) t"
    return (
        head + ", ".join(spark_picks) + tail,
        head + ", ".join(duck_picks) + tail,
    )


@pytest.mark.parametrize("seed", SEEDS[:15])
def test_differential_fuzz_ignore_nulls_windows(engines, seed):
    spark, con = engines
    q_spark, q_duck = _gen_ignore_nulls_window_query(random.Random(7000 + seed))
    sdf = spark.sql(q_spark)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q_duck)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q_spark, scols, ocols)
    assert len(srows) == len(orows), (q_spark, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), (q_spark, q_duck)


def _gen_distinct_on_query(rng: random.Random) -> tuple[str, str]:
    """DISTINCT ON dialect template (round-13, the
    sqlapi_distinct_on_dialect recipe fuzzed): keep the first row per
    key group under a random ORDER BY. DuckDB runs Postgres-style
    `SELECT DISTINCT ON (key) ... ORDER BY key, sort, uk`; Spark runs
    the ranked-subquery desugaring `row_number() = 1` under the SAME
    window order. The uk tiebreak makes the kept row unique, so both
    texts select the identical row set from the same random draws."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    cat = rng.choice(meta["cats"])
    cents = meta["cents"]
    uniq = {"lineitem": "l_orderkey * 8 + l_linenumber",
            "orders": "o_orderkey",
            "events": "event_id"}[table]
    mod = rng.randint(7, 37)
    direction = rng.choice(["ASC", "DESC"])
    base = (
        f"SELECT {cat} AS cat, CAST({uniq} AS BIGINT) AS uk, {cents} AS cents"
        f" FROM {table} WHERE ({uniq}) % {mod} = 0 AND {cents} IS NOT NULL"
    )
    spark_sql = (
        f"SELECT cat, uk, cents FROM ("
        f"SELECT cat, uk, cents,"
        f" row_number() OVER (PARTITION BY cat"
        f" ORDER BY cents {direction}, uk) AS rn"
        f" FROM ({base}) t) r WHERE rn = 1"
    )
    duck_sql = (
        f"SELECT DISTINCT ON (cat) cat, uk, cents FROM ({base}) t"
        f" ORDER BY cat, cents {direction}, uk"
    )
    return spark_sql, duck_sql


@pytest.mark.parametrize("seed", SEEDS[:15])
def test_differential_fuzz_distinct_on(engines, seed):
    spark, con = engines
    q_spark, q_duck = _gen_distinct_on_query(random.Random(9000 + seed))
    sdf = spark.sql(q_spark)
    srows = [r.asDict() for r in sdf.collect()]
    cur = con.execute(q_duck)
    ocols_raw = [d[0] for d in cur.description]
    orows = [dict(zip(ocols_raw, t)) for t in cur.fetchall()]
    scols, ocols = sorted(sdf.columns), sorted(ocols_raw)
    assert scols == ocols, (q_spark, scols, ocols)
    assert len(srows) == len(orows), (q_spark, len(srows), len(orows))
    assert _hash(srows, scols) == _hash(orows, ocols), q_spark
