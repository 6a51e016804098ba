"""Round-10 operator gates: the rows-only graph keys (label propagation,
Brandes betweenness) pinned against closed-form results on constructed
graphs, plus determinism and fixture invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _both(spark, edges):
    df = spark.createDataFrame(edges, "u string, v string")
    return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge must resolve to two
    communities labeled by each clique's min member; a lone clique
    collapses to its min label."""
    from change_data_capture_service_spark.operators.graph import _label_propagation

    k4a = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    k4b = [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
    got = {
        r["node"]: r["community"]
        for r in _label_propagation(_both(spark, k4a + k4b + [("d", "w")])).collect()
    }
    assert {got[n] for n in "abcd"} == {"a"}
    assert {got[n] for n in "wxyz"} == {"w"}

    lone = {
        r["node"]: r["community"]
        for r in _label_propagation(_both(spark, k4a)).collect()
    }
    assert lone == {c: "a" for c in "abcd"}


def test_lpa_deterministic_and_labels_are_members(spark, sf_dir):
    rows1 = sorted(map(str, registry.get("graph_label_propagation").fn(spark, sf_dir).collect()))
    rows2 = sorted(map(str, registry.get("graph_label_propagation").fn(spark, sf_dir).collect()))
    assert rows1 == rows2
    df = registry.get("graph_label_propagation").fn(spark, sf_dir)
    nodes = {r["node"] for r in df.collect()}
    comms = {r["community"] for r in df.collect()}
    assert comms <= nodes  # every community label is a member node


def test_betweenness_closed_forms(spark):
    """P4 path: ends 0, middles 2. Star K1,5: hub C(5,2)=10, leaves 0.
    Cycle C5: every node 1 (each of the 4 non-incident pairs has 2
    shortest paths... closed form: (n-1)(n-2)/2 - ... for odd cycle C5
    each node lies on exactly 1 pair's unique geodesic -> 1)."""
    from change_data_capture_service_spark.operators.graph import _betweenness

    p4 = [("a", "b"), ("b", "c"), ("c", "d")]
    got = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, p4)).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}, got

    star = [("hub", f"l{i}") for i in range(5)]
    got = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, star)).collect()}
    assert got["hub"] == 10.0
    assert all(got[f"l{i}"] == 0.0 for i in range(5))

    # C5: each node is the interior of exactly ONE distance-2 pair's
    # unique geodesic -> betweenness 1
    c5 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    got = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, c5)).collect()}
    assert got == {c: 1.0 for c in "abcde"}, got


def test_betweenness_split_paths_fractional(spark):
    """Diamond a-b-d / a-c-d: two equal geodesics a..d, so b and c each
    carry 1/2 -- pins the sigma-ratio fractional credit."""
    from change_data_capture_service_spark.operators.graph import _betweenness

    dia = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    got = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, dia)).collect()}
    assert got == {"a": 0.5, "b": 0.5, "c": 0.5, "d": 0.5}, got


def test_betweenness_fixture_invariants(spark, sf_dir):
    rows = registry.get("graph_betweenness_brandes").fn(spark, sf_dir).collect()
    assert rows, "empty betweenness on fixture graph"
    assert all(r["betweenness"] >= 0 for r in rows)


def test_betweenness_grain_contract_oversized_fails_loudly(spark):
    """The |V|^2 exact fold must refuse oversized node sets (grain
    contract, the _kcore discipline) unless the caller opts into
    Brandes-Pich source sampling -- never a silent O(V*E) launch."""
    from change_data_capture_service_spark.operators.graph import _betweenness

    p6 = [(f"n{i}", f"n{i+1}") for i in range(5)]  # 6 nodes
    with pytest.raises(ValueError, match="exact_node_cap"):
        _betweenness(_both(spark, p6), exact_node_cap=4)
    # the sampling path accepts the same graph under the same cap
    got = _betweenness(_both(spark, p6), exact_node_cap=4, sample_sources=3)
    assert got.count() > 0


def test_betweenness_sampling_all_sources_equals_exact(spark):
    """sample_sources >= |V| selects every source with scale 1 -- the
    estimator degenerates to the exact algorithm."""
    from change_data_capture_service_spark.operators.graph import _betweenness

    p4 = [("a", "b"), ("b", "c"), ("c", "d")]
    exact = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, p4)).collect()}
    sampled = {
        r["node"]: r["betweenness"]
        for r in _betweenness(_both(spark, p4), sample_sources=10).collect()
    }
    assert sampled == exact


def test_betweenness_truncated_bfs_raises(spark):
    """A graph whose diameter exceeds max_depth must raise instead of
    sweeping a truncated BFS DAG into silently wrong centralities
    (round-10 ADVICE)."""
    from change_data_capture_service_spark.operators.graph import _betweenness

    p4 = [("a", "b"), ("b", "c"), ("c", "d")]  # diameter 3
    with pytest.raises(ValueError, match="max_depth"):
        _betweenness(_both(spark, p4), max_depth=1)
    # a bound at exactly the diameter completes cleanly
    got = {r["node"]: r["betweenness"] for r in _betweenness(_both(spark, p4), max_depth=3).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}


def test_mmr_skips_near_duplicate_for_diversity(spark):
    """Constructed 2-D vectors: candidates b1 and b2 are near-identical
    and both highly relevant; c is orthogonal to the query (relevance 0)
    and nearly orthogonal to them. Pure ranking returns (b2, b1, c); MMR
    at lambda=0.4 must pick the argmax b2 first, then SKIP b1 (penalized
    by its ~1.0 similarity to b2: 0.4*0.98 - 0.6*1.0 < 0 - 0.6*0.18) in
    favor of c at rank 2 -- the redundancy-skip MMR exists for."""
    import math

    from change_data_capture_service_spark.operators.similarity import mmr_diversify

    def unit(x, y):
        n = math.sqrt(x * x + y * y)
        return [x / n, y / n]

    q = [1.0, 0.0]
    cands = [
        ("b1", unit(0.98, 0.20)),
        ("b2", unit(0.99, 0.18)),  # near-duplicate of b1
        ("c", unit(0.0, 1.0)),     # orthogonal: diverse, zero relevance
    ]

    def cos(a, b):
        return sum(p * r for p, r in zip(a, b))

    rows = [
        (1, name, round(cos(q, v), 6), v, 1.0)
        for name, v in cands
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id string, cosine double, v array<double>, nrm double"
    )
    got = {
        r["mmr_rank"]: r["neighbor_id"]
        for r in mmr_diversify(df, lam=0.4, k=3).collect()
    }
    assert got[1] == "b2" or got[1] == "b1"  # cosine argmax (b2 slightly higher)
    # the near-duplicate of rank-1 must NOT be rank 2
    assert {got[1], got[2]} != {"b1", "b2"}, got
    assert got[2] == "c", got


def test_mmr_fixture_contract(spark, sf_dir):
    """Fixture run: 5 distinct picks per query, contiguous ranks,
    deterministic across runs, rank-1 = the exact cosine argmax."""
    df = registry.get("knn_mmr_diversified").fn(spark, sf_dir)
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append((r["mmr_rank"], r["neighbor_id"]))
    for q, picks in per.items():
        ranks = sorted(p[0] for p in picks)
        assert ranks == list(range(1, len(picks) + 1)), q
        assert len({p[1] for p in picks}) == len(picks), q
    again = sorted(map(str, registry.get("knn_mmr_diversified").fn(spark, sf_dir).collect()))
    assert sorted(map(str, rows)) == again
    # rank 1 equals pure relevance argmax
    exact = registry.get("knn_cosine_topk").fn(spark, sf_dir).collect()
    best = {}
    for r in exact:
        if r["rnk"] == 1:
            best[r["query_id"]] = r["neighbor_id"]
    for q, picks in per.items():
        r1 = dict((rk, nid) for rk, nid in picks)[1]
        assert r1 == best[q], (q, r1, best[q])


def _lineitem_pdf(prices, flags):
    import pandas as pd

    n = len(prices)
    return pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_partkey": range(n),
            "l_suppkey": [1] * n,
            "l_linenumber": [1] * n,
            "l_quantity": [float((i % 5) + 1) for i in range(n)],
            "l_extendedprice": prices,
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": flags,
            "l_linestatus": ["O"] * n,
        }
    ).assign(l_shipdate=__import__("pandas").to_datetime(["2024-01-01"] * n))


def test_ansari_bradley_against_reference_implementation(spark, tmp_path):
    """The operator's (score-of-midrank, finite-population z) contract
    recomputed by a pure-Python reference on a constructed two-group
    sample with deliberate ties -- independent arithmetic, same
    definition."""
    import math

    from change_data_capture_service_spark.operators.stats import (
        lineitem_ansari_bradley_returnflag,
    )

    # group R: tight around 10; group A: spread wide; one cross-group tie at 10.00
    r_prices = [9.99, 10.00, 10.01, 10.00, 9.98]
    a_prices = [1.00, 10.00, 19.00, 2.50, 17.75]
    prices = r_prices + a_prices
    flags = ["R"] * 5 + ["A"] * 5
    _lineitem_pdf(prices, flags).to_parquet(str(tmp_path / "lineitem.parquet"))

    # pure-python reference
    cents = [round(p * 100) for p in prices]
    pooled = sorted(cents)
    n = len(pooled)
    # doubled midrank + doubled score per distinct value
    from collections import Counter

    cnt = Counter(pooled)
    before = 0
    a2 = {}
    for v in sorted(cnt):
        m = cnt[v]
        dm = 2 * before + m + 1
        a2[v] = min(dm, 2 * (n + 1) - dm)
        before += m
    ab2 = sum(a2[c] for c, f in zip(cents, flags) if f == "R")
    s1 = sum(a2[v] * m for v, m in cnt.items())
    s2 = sum(a2[v] * a2[v] * m for v, m in cnt.items())
    n1 = n2 = 5
    mu = s1 / n
    var_a = s2 / n - mu * mu
    z_ref = (ab2 - n1 * mu) / math.sqrt(n1 * n2 / (n - 1) * var_a)

    got = lineitem_ansari_bradley_returnflag(spark, str(tmp_path)).collect()[0]
    assert got["n_returned"] == 5 and got["n_accepted"] == 5
    assert abs(got["ab_stat"] - ab2 / 2) < 1e-9
    assert abs(got["z"] - round(z_ref, 6)) < 1e-9
    # the tight group concentrates mid scores: AB stat above its mean
    assert got["z"] > 0


def test_kendall_tau_against_reference_pair_count(spark, tmp_path):
    """tau-b from the contingency identity vs a brute-force O(n^2) pair
    count over the raw rows -- the definition itself, independently."""
    import itertools
    import math

    from change_data_capture_service_spark.operators.stats import (
        lineitem_kendall_tau_qty_price,
    )

    qty = [1, 1, 2, 3, 3, 3, 4, 5, 2, 1]
    # price picked so y-bucket ($10k) varies: mix below/above 10k/20k
    price = [5000.0, 15000.0, 5000.0, 25000.0, 15000.0, 25000.0,
             35000.0, 35000.0, 15000.0, 5000.0]
    import pandas as pd

    n = len(qty)
    pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_partkey": range(n),
            "l_suppkey": [1] * n,
            "l_linenumber": [1] * n,
            "l_quantity": [float(q) for q in qty],
            "l_extendedprice": price,
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"))

    x = qty
    y = [int(p * 100) // 1000000 for p in price]
    conc = disc = tx = ty = 0
    for (xa, ya), (xb, yb) in itertools.combinations(zip(x, y), 2):
        if xa == xb and ya == yb:
            tx += 1
            ty += 1
        elif xa == xb:
            tx += 1
        elif ya == yb:
            ty += 1
        elif (xa < xb) == (ya < yb):
            conc += 1
        else:
            disc += 1
    n0 = n * (n - 1) / 2
    tau_ref = (conc - disc) / math.sqrt((n0 - (tx)) * (n0 - (ty)))

    got = lineitem_kendall_tau_qty_price(spark, str(tmp_path)).collect()[0]
    assert got["n"] == n
    assert got["concordant"] == conc and got["discordant"] == disc
    assert abs(got["tau_b"] - round(tau_ref, 6)) < 1e-9


def test_friedman_hand_ranked_blocks(spark, tmp_path):
    """Friedman Q on constructed orders where per-(year, priority) means
    force known within-year ranks; the reference recomputes Q from those
    ranks in pure python."""
    import pandas as pd

    from change_data_capture_service_spark.operators.relational import (  # noqa: F401
        tpch_q5_local_supplier,  # ensures module import side effects
    )
    from change_data_capture_service_spark.operators.stats import (
        orders_friedman_priority_by_year,
    )

    # 3 priorities x 4 year-blocks, one order per cell, price = rank driver
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    # within-year rank orders (by ascending price): chosen non-uniform
    prices = {
        1995: {"1-URGENT": 10.0, "2-HIGH": 20.0, "3-MEDIUM": 30.0},  # ranks 1,2,3
        1996: {"1-URGENT": 10.0, "2-HIGH": 20.0, "3-MEDIUM": 30.0},  # ranks 1,2,3
        1997: {"1-URGENT": 30.0, "2-HIGH": 10.0, "3-MEDIUM": 20.0},  # ranks 3,1,2
        1998: {"1-URGENT": 20.0, "2-HIGH": 30.0, "3-MEDIUM": 10.0},  # ranks 2,3,1
    }
    rows = []
    i = 0
    for yr, d in prices.items():
        for p, v in d.items():
            rows.append((i, i, "O", v, f"{yr}-06-01", p))
            i += 1
    pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    ).assign(
        o_orderdate=pd.to_datetime([r[4] for r in rows]).astype("datetime64[us]")
    ).to_parquet(str(tmp_path / "orders.parquet"))
    # rank sums: URGENT 1+1+3+2=7, HIGH 2+2+1+3=8, MEDIUM 3+3+2+1=9
    n_blocks, k = 4, 3
    q_ref = 12 / (n_blocks * k * (k + 1)) * (7**2 + 8**2 + 9**2) - 3 * n_blocks * (k + 1)
    got = orders_friedman_priority_by_year(spark, str(tmp_path)).collect()[0]
    assert got["n_blocks"] == 4 and got["k_treatments"] == 3 and got["dof"] == 2
    assert abs(got["q_stat"] - round(q_ref, 6)) < 1e-9
