"""Invariant gates for the round-7 second-batch operators: graph
algorithms (contraction CC, oriented triangle enumeration) and the exact
statistical-test family (ANOVA, KS, Mann-Whitney, Spearman, CUSUM,
Benford, source n-gram overlap).

Cross-engine value parity is covered by test_oracle_parity (all of these
register DuckDB oracles); these tests pin the SEMANTIC properties an
oracle twin cannot: algorithm equivalence on random graphs, agreement
with an independent numpy implementation of the test statistics, and
conservation/bound laws.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table

registry.load_all()


def _df(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir).toPandas()


# ---------------------------------------------------------------- graphs


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cc_contract_matches_union_find(spark, edges):
    """The O(log d) contraction CC and a plain union-find agree on the
    partition (same component sets, min-id representatives) on random
    graphs -- including chain-heavy ones where plain propagation is
    slowest."""
    from change_data_capture_service_spark.operators.graph import _cc_contract

    import pyspark.sql.functions as F

    sdf = spark.createDataFrame(
        [(a, b) for a, b in edges], "src bigint, dst bigint"
    )
    sym = sdf.union(sdf.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {
        (r["node"], r["component"])
        for r in _cc_contract(sym).toPandas().to_dict("records")
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


def test_cc_components_partition_the_substitution_graph(spark, sf_dir):
    p = _df(spark, sf_dir, "graph_connected_components")
    parts = load_table(spark, sf_dir, "part").toPandas()
    # components partition exactly the parts that have at least one
    # substitution neighbour (isolated parts are not graph nodes)
    has_nbr = 0
    by_type = {
        t: set(g["p_size"]) for t, g in parts.groupby("p_type")
    }
    counts = parts.groupby(["p_type", "p_size"]).size().to_dict()
    for (_, r) in parts.iterrows():
        t, s = r["p_type"], r["p_size"]
        if (
            counts.get((t, s), 0) > 1
            or (s - 1) in by_type[t]
            or (s + 1) in by_type[t]
        ):
            has_nbr += 1
    assert p["n_parts"].sum() == has_nbr
    # one type per component, disjoint size ranges within a type
    assert p["component"].is_unique
    for _, grp in p.groupby("p_type"):
        spans = sorted(zip(grp["size_min"], grp["size_max"]))
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi + 1 < b_lo, "adjacent size runs must have merged"


def test_triangles_are_canonical_and_closed(spark, sf_dir):
    t = _df(spark, sf_dir, "graph_triangle_count")
    assert len(t) > 0
    assert (t["brand_a"] < t["brand_b"]).all()
    assert (t["brand_b"] < t["brand_c"]).all()
    assert not t.duplicated().any()
    # every triangle edge is an edge of the thresholded co-occurrence graph
    import duckdb

    con = duckdb.connect()
    from change_data_capture_service_spark.catalog import table_path

    for name in ("lineitem", "part", "orders"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    edges = set(
        map(
            tuple,
            con.execute(
                """
        WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
        thr AS (SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders)
        SELECT a.p_brand, b.p_brand FROM ob a
        JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2 HAVING count(*) >= (SELECT t FROM thr)
        """
            ).fetchall(),
        )
    )
    for _, r in t.iterrows():
        a, b, c = r["brand_a"], r["brand_b"], r["brand_c"]
        assert {(a, b), (b, c), (a, c)} <= edges


# ------------------------------------------------------- test statistics


def test_anova_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "lineitem_price_anova_returnflag").iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    c = (li["l_extendedprice"].round(2) * 100).round().astype("int64")
    groups = [g.to_numpy(dtype=float) for _, g in c.groupby(li["l_returnflag"])]
    n, k = sum(len(g) for g in groups), len(groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n_total"] == n
    assert row["f_stat"] == pytest.approx(f_ref, rel=1e-6)
    assert 0.0 <= row["eta_sq"] <= 1.0


def _midranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # 1-based midrank
        i = j
    return ranks


def test_ks_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "events_value_ks_weekend").iloc[0]
    e = load_table(spark, sf_dir, "events").toPandas()
    c = (e["value"].round(2) * 100).round().astype("int64")
    wkd = e["ts"].dt.dayofweek >= 5  # pandas: Mon=0 .. Sun=6
    a, b = np.sort(c[wkd].to_numpy()), np.sort(c[~wkd].to_numpy())
    support = np.unique(np.concatenate([a, b]))
    d_ref = np.max(
        np.abs(
            np.searchsorted(a, support, "right") / len(a)
            - np.searchsorted(b, support, "right") / len(b)
        )
    )
    assert row["n_weekend"] == len(a) and row["n_weekday"] == len(b)
    assert row["ks_d"] == pytest.approx(d_ref, abs=1e-6)
    assert 0.0 <= row["ks_d"] <= 1.0


def test_mannwhitney_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "events_mannwhitney_purchase_ab").iloc[0]
    e = load_table(spark, sf_dir, "events").toPandas()
    p = e[e["event_type"] == "purchase"]
    c = (p["value"].round(2) * 100).round().astype("int64").to_numpy()
    treat = (p["user_id"] % 2 == 0).to_numpy()
    ranks = _midranks(c.astype(float))
    n_t, n_c = int(treat.sum()), int((~treat).sum())
    r_t = ranks[treat].sum()
    u_t = r_t - n_t * (n_t + 1) / 2
    u_centered_ref = u_t - n_t * n_c / 2
    n = n_t + n_c
    _, counts = np.unique(c, return_counts=True)
    tie3 = float((counts.astype(np.float64) ** 3 - counts).sum())
    var = n_t * n_c / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z_ref = u_centered_ref / math.sqrt(var)
    assert row["n_treat"] == n_t and row["n_control"] == n_c
    assert row["u_centered"] == pytest.approx(u_centered_ref, abs=1e-6)
    assert row["z"] == pytest.approx(z_ref, abs=1e-6)


def test_spearman_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "lineitem_spearman_qty_price").iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    x = (li["l_quantity"].round(2) * 100).round().astype("int64").to_numpy()
    y = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy()
    rx, ry = _midranks(x.astype(float)), _midranks(y.astype(float))
    rho_ref = np.corrcoef(rx, ry)[0, 1]
    assert row["n"] == len(x)
    assert row["spearman_rho"] == pytest.approx(rho_ref, abs=1e-6)
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_cusum_matches_pandas(spark, sf_dir):
    out = _df(spark, sf_dir, "events_cusum_drift").set_index("event_type")
    e = load_table(spark, sf_dir, "events").toPandas()
    e["c"] = (e["value"].round(2) * 100).round().astype("int64")
    e["day"] = e["ts"].dt.floor("D")
    for etype, grp in e.groupby("event_type"):
        daily = grp.groupby("day")["c"].sum().sort_index()
        dev = daily - daily.mean()
        s = dev.cumsum()
        ref = float(s.abs().max()) / 100
        assert out.loc[etype, "n_days"] == len(daily)
        assert out.loc[etype, "max_cusum"] == pytest.approx(ref, abs=1e-4)
        assert out.loc[etype, "peak_day"] == s.abs().idxmax()


def test_benford_shares_and_chi2(spark, sf_dir):
    b = _df(spark, sf_dir, "lineitem_benford_first_digit")
    assert list(b["digit"]) == list(range(1, 10)) or set(b["digit"]) == set(
        range(1, 10)
    )
    assert b["obs_share"].sum() == pytest.approx(1.0, abs=1e-4)
    assert b["benford_p"].sum() == pytest.approx(1.0, abs=1e-4)
    assert (b["chi2_term"] >= 0).all()
    # first digit of uniform-ish synthetic prices should NOT follow
    # Benford: the audit must actually flag this fixture
    assert b["chi2_term"].sum() > 100


def test_source_ngram_overlap_bounds(spark, sf_dir):
    o = _df(spark, sf_dir, "docs_source_ngram_overlap")
    if len(o) == 0:
        pytest.skip("no overlapping sources at this sf")
    assert (o["source_a"] < o["source_b"]).all()
    assert (o["n_common"] >= 1).all()
    assert (o["n_common"] <= o[["n_a", "n_b"]].min(axis=1)).all()
    assert ((o["jaccard"] > 0) & (o["jaccard"] <= 1)).all()


# ------------------------------------------------ round-7b second batch


def test_rollup_maintenance_leaves_no_scratch(spark, sf_dir):
    import glob
    import tempfile

    before = set(glob.glob(f"{tempfile.gettempdir()}/rollup_maint_*"))
    out = _df(spark, sf_dir, "stream_rollup_maintenance")
    after = set(glob.glob(f"{tempfile.gettempdir()}/rollup_maint_*"))
    assert after == before, "registered query must clean its scratch dir"
    assert len(out) > 0
    assert (out["n_rows"] > 0).all()
    # the maintained rollup equals the batch aggregate over the final
    # state -- recomputed here in pandas (delete %100==7, bump %100==13)
    e = load_table(spark, sf_dir, "events").toPandas()
    e["v"] = (e["value"].round(2) * 100).round().astype("int64")
    e = e[e["event_id"] % 100 != 7].copy()
    e.loc[e["event_id"] % 100 == 13, "v"] += 100
    e["hour"] = e["ts"].dt.floor("h")
    ref = e.groupby("hour")["v"].agg(["count", "sum"])
    got = out.set_index("hour").sort_index()
    assert (got["n_rows"] == ref["count"]).all()
    assert (got["sum_cents"] == ref["sum"]).all()


def test_bigram_perplexity_matches_python(spark, sf_dir):
    out = _df(spark, sf_dir, "quality_perplexity_bigram").set_index("doc_id")
    docs = load_table(spark, sf_dir, "documents").toPandas()
    from collections import Counter

    corpus_bg: Counter = Counter()
    vocab = set()
    toks_by_doc = {}
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].lower().split(" ") if t]
        toks_by_doc[r["doc_id"]] = toks
        vocab.update(toks)
        corpus_bg.update(zip(toks, toks[1:]))
    head = Counter()
    for (w1, _), c in corpus_bg.items():
        head[w1] += c
    V = len(vocab)
    import math as _m

    for doc_id, toks in list(toks_by_doc.items())[:50]:
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert doc_id not in out.index
            continue
        ce = -sum(
            _m.log((corpus_bg[b] + 1) / (head[b[0]] + V)) for b in bgs
        ) / len(bgs)
        assert out.loc[doc_id, "n_bigrams"] == len(bgs)
        assert out.loc[doc_id, "cross_entropy"] == pytest.approx(ce, abs=1e-5)


def test_quality_weighted_sample_budget_and_order(spark, sf_dir):
    s = _df(spark, sf_dir, "sample_quality_weighted_tokens")
    if len(s) == 0:
        pytest.skip("no gate survivors at this sf")
    for _, grp in s.groupby("source"):
        grp = grp.sort_values("cum_tokens")
        assert grp["cum_tokens"].iloc[-1] <= 3000
        # cum is the running sum of n_tokens in pick order
        assert (grp["cum_tokens"].diff().dropna() == grp["n_tokens"].iloc[1:]).all()
        # picked docs are quality-sorted (descending, doc_id tiebreak)
        q = list(zip(-grp["quality"], grp["doc_id"]))
        assert q == sorted(q)


def test_reciprocity_bounds(spark, sf_dir):
    r = _df(spark, sf_dir, "knn_graph_reciprocity")
    assert len(r) > 0
    assert (r["n_edges"] == r["n_nodes"] * 10).all()
    assert (r["n_mutual"] <= r["n_edges"]).all()
    assert ((r["reciprocity"] >= 0) & (r["reciprocity"] <= 1)).all()


def test_ols_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "lineitem_ols_price_on_qty").iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    x = (li["l_quantity"].round(2) * 100).round().astype("int64").to_numpy(dtype=float)
    y = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy(dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row["n"] == len(x)
    assert row["slope"] == pytest.approx(slope, rel=1e-4)
    assert row["intercept_dollars"] == pytest.approx(intercept / 100, rel=1e-4)
    assert row["r2"] == pytest.approx(r * r, rel=1e-4, abs=1e-6)


# ------------------------------------------------- round-7b third batch


def test_km_matches_python(spark, sf_dir):
    out = _df(spark, sf_dir, "customer_survival_km")
    o = load_table(spark, sf_dir, "orders").toPandas()
    o = o.sort_values(["o_orderdate", "o_orderkey"])
    horizon = o["o_orderdate"].max()
    spans = []
    for _, grp in o.groupby("o_custkey"):
        dates = grp["o_orderdate"].tolist()
        if len(dates) >= 2:
            spans.append(((dates[1] - dates[0]).days, 1))
        else:
            spans.append(((horizon - dates[0]).days, 0))
    # KM by hand
    from collections import defaultdict

    d = defaultdict(int)
    leave = defaultdict(int)
    for t, e in spans:
        leave[t] += 1
        d[t] += e
    n_risk = len(spans)
    s = 1.0
    ref = {}
    for t in sorted(leave):
        if d[t] > 0 and d[t] < n_risk:
            s *= 1 - d[t] / n_risk
            ref[t] = (n_risk, d[t], s)
        n_risk -= leave[t]
    got = out.set_index("duration_days").sort_index()
    assert set(got.index) == set(ref)
    for t, (nr, dd, sv) in ref.items():
        assert got.loc[t, "n_risk"] == nr
        assert got.loc[t, "n_events"] == dd
        assert got.loc[t, "survival"] == pytest.approx(sv, abs=1e-5)
    # survival is monotone nonincreasing in time
    assert (got["survival"].diff().dropna() <= 1e-12).all()


def test_mutual_info_matches_numpy(spark, sf_dir):
    row = _df(spark, sf_dir, "events_mutual_info_type_dow").iloc[0]
    e = load_table(spark, sf_dir, "events").toPandas()
    x = e["event_type"]
    y = e["ts"].dt.dayofweek
    tab = (
        e.assign(x=x, y=y).groupby(["x", "y"]).size().unstack(fill_value=0).to_numpy()
    )
    n = tab.sum()
    px = tab.sum(1) / n
    py = tab.sum(0) / n
    p = tab / n
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = p * np.log(p / np.outer(px, py))
    mi_ref = np.nansum(terms)
    hx = -np.sum(px * np.log(px))
    hy = -np.sum(py * np.log(py))
    assert row["n"] == n
    assert row["mi"] == pytest.approx(mi_ref, abs=1e-5)
    assert row["nmi"] == pytest.approx(mi_ref / min(hx, hy), abs=1e-4)
    assert 0 <= row["nmi"] <= 1 + 1e-9


def test_reconciliation_conserves_orders(spark, sf_dir):
    r = _df(spark, sf_dir, "dq_orders_lineitem_reconciliation")
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert r["n_orders"].sum() == n_orders
    assert (r["n_exact"] <= r["n_orders"]).all()
    assert (r["n_lineless"] <= r["n_orders"]).all()
    assert (r["max_abs_diff"].fillna(0) >= r["mean_abs_diff"].fillna(0) - 1e-9).all()


def test_kdist_profile_bounds(spark, sf_dir):
    p = _df(spark, sf_dir, "embedding_kdist_profile")
    emb = load_table(spark, sf_dir, "embeddings").count()
    assert p["n"].sum() == emb  # fixtures carry no degenerate vectors
    assert (p["min_kdist"] >= 0).all()
    assert (p["min_kdist"] <= p["avg_kdist"] + 1e-9).all()
    assert (p["avg_kdist"] <= p["max_kdist"] + 1e-9).all()
    assert (p["max_kdist"] <= 2.0).all()


# ------------------------------------------------ round-7b fourth batch


def test_poisson_rate_conserves_counts(spark, sf_dir):
    row = _df(spark, sf_dir, "events_poisson_rate_weekend").iloc[0]
    e = load_table(spark, sf_dir, "events").toPandas()
    assert row["n_weekend"] + row["n_weekday"] == len(e)
    days = e["ts"].dt.floor("D")
    wkd = e["ts"].dt.dayofweek >= 5
    assert row["days_weekend"] == days[wkd].nunique()
    assert row["days_weekday"] == days[~wkd].nunique()
    assert row["rate_weekend_hr"] == pytest.approx(
        row["n_weekend"] / row["days_weekend"] / 24, abs=1e-5
    )
    # z sign agrees with the rate difference
    assert (row["z"] > 0) == (row["rate_weekend_hr"] > row["rate_weekday_hr"])


def test_sequence_rules_bounds(spark, sf_dir):
    r = _df(spark, sf_dir, "events_sequence_rules_confidence")
    assert 0 < len(r) <= 20
    assert ((r["confidence"] > 0) & (r["confidence"] <= 1)).all()
    assert (r["support"] <= r["confidence"] + 1e-9).all()
    assert (r["lift"] > 0).all()
    confs = list(r["confidence"])
    assert confs == sorted(confs, reverse=True)


def test_laspeyres_base_month_is_unity(spark, sf_dir):
    idx = _df(spark, sf_dir, "part_price_index_laspeyres")
    base = idx.sort_values("month").iloc[0]
    # base month compares the basket to itself: exactly 1.0
    assert base["laspeyres_index"] == pytest.approx(1.0, abs=1e-12)
    assert (idx["laspeyres_index"] > 0).all()
    assert (idx["n_parts"] > 0).all()
