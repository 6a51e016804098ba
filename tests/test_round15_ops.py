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
