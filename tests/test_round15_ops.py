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
