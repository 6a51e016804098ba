"""Round-11 operator gates: closed-form checks for the Holt fold pair,
the Theil decomposition identity, quantile-regression pinball geometry,
and the rich-club curve's structural invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_holt_fold_hand_trace(spark):
    """y = [10, 12, 15], alpha = beta = 0.5: l2 = 11, b2 = 0.5, sae2 = 2;
    l3 = 13.25, b3 = 1.375, sae3 = 5.5 -- the dyadic-exact hand trace the
    oracle's recursive CTE must also reproduce (it does; the DuckDB
    list_reduce struct-accumulator form was REJECTED because struct_pack
    mutates accumulator fields sequentially)."""
    from change_data_capture_service_spark.operators.timeseries import _HOLT_SPARK_FOLD

    df = spark.createDataFrame([([10.0, 12.0, 15.0],)], "vs array<double>")
    st = df.select(F.expr(_HOLT_SPARK_FOLD).alias("st")).collect()[0]["st"]
    assert st["l"] == 13.25
    assert st["b"] == 1.375
    assert st["sae"] == 5.5


def test_holt_single_day_series_emits_nothing(spark, tmp_path):
    """A 1-day corpus has no one-step-ahead backtest: both Holt keys must
    return zero rows, not a divide-by-zero row."""
    import shutil

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf"
    d.mkdir()
    for t in ["events"]:
        spark.read.parquet(f"{src}/{t}.parquet").withColumn(
            "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        ).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    for key in ["events_holt_linear_mae", "events_holt_winters_dow_mae"]:
        assert registry.get(key).fn(spark, str(d)).count() == 0, key


def test_theil_decomposition_identity(spark, sf_dir):
    """within + between must reconstruct the independently-computed total
    (additive decomposition, up to the 6dp output grain)."""
    row = registry.get("customer_revenue_theil_decomposition").fn(spark, sf_dir).collect()[0]
    assert row["theil_total"] >= 0
    assert row["theil_within"] >= 0 and row["theil_between"] >= 0
    assert abs(row["theil_total"] - (row["theil_within"] + row["theil_between"])) < 2e-6


def test_quantile_regression_monotone_intercepts(spark, sf_dir):
    """Higher tau lines sit higher: at the best slope per tau, the
    intercept (tau-quantile of residuals) must be nondecreasing in tau
    when slopes agree, and avg_pinball is nonnegative always."""
    rows = registry.get("events_quantile_regression_pinball").fn(spark, sf_dir).collect()
    assert len(rows) == 4
    assert all(r["avg_pinball"] >= 0 for r in rows)
    by_tau = {r["tau"]: r for r in rows}
    assert set(by_tau) == {0.25, 0.5, 0.75, 0.9}
    # p90 line forecast at the series midpoint must be >= p25 line's
    # (quantile lines cannot cross at the pinball optimum's anchor point)
    n_mid = 0.5  # normalized midpoint; slopes are per-day so compare at t=0 anchor + mid
    lo, hi = by_tau[0.25], by_tau[0.9]
    assert hi["intercept"] + hi["slope_per_day"] * n_mid >= lo["intercept"] + lo["slope_per_day"] * n_mid - 1e-6


def test_rich_club_curve_invariants(spark, sf_dir):
    """phi in [0, 1]; N_k strictly decreases as k rises (deg > k nests);
    every k has n_nodes > 1 by construction."""
    rows = registry.get("graph_rich_club_coefficient").fn(spark, sf_dir).collect()
    assert rows
    prev_n = None
    for r in sorted(rows, key=lambda r: r["k"]):
        assert 0.0 <= r["phi"] <= 1.0
        assert r["n_nodes"] > 1
        if prev_n is not None:
            assert r["n_nodes"] <= prev_n
        prev_n = r["n_nodes"]


def test_frame_budget_sums_exactly(spark, sf_dir):
    """Largest-remainder apportionment: allocations must sum EXACTLY to
    FRAME_BUDGET and never exceed a stratum's supply-proportional share
    by more than 1 frame."""
    from change_data_capture_service_spark.operators.multimodal import FRAME_BUDGET

    rows = registry.get("multimodal_stratified_frame_budget").fn(spark, sf_dir).collect()
    assert rows
    assert sum(r["alloc_frames"] for r in rows) == FRAME_BUDGET
    total_frames = sum(r["n_frames"] for r in rows)
    for r in rows:
        ideal = FRAME_BUDGET * r["n_frames"] / total_frames
        assert abs(r["alloc_frames"] - ideal) < 1.0 + 1e-9, (r, ideal)


def test_propensity_grid_partitions_customers(spark, sf_dir):
    """Every customer lands in exactly one (tier, recency) cell: cell
    counts must sum to the customer table row count."""
    from change_data_capture_service_spark.catalog import load_table

    rows = registry.get("customer_acquisition_propensity").fn(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert all(
        r["balance_tier"] in {"high_balance", "low_balance", "unknown"}
        and r["recency_bucket"] in {"active_90d", "lapsing_1y", "dormant", "never_ordered"}
        for r in rows
    )


def test_twonn_recovers_planted_manifold_dimension(spark):
    """TwoNN on a 2-D grid isometrically embedded in 8-D must estimate
    ID near 2; a 1-D line must estimate near 1 -- the estimator's
    defining property (Facco et al. 2017), checked end-to-end through
    the quantized-integer distance path."""
    import random

    from change_data_capture_service_spark.operators.similarity import (
        embedding_intrinsic_dim_twonn,
    )

    rng = random.Random(3)

    def run(points):
        import tempfile

        rows = [(i, [float(x) for x in p], 0) for i, p in enumerate(points)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        d = tempfile.mkdtemp(prefix="twonn_")
        df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        return embedding_intrinsic_dim_twonn(spark, d).collect()[0]

    # 2-D: uniform random points in the first two of 8 dims (TwoNN's
    # model is a Poisson process -- a LATTICE breaks it: equidistant
    # grid neighbors force mu ~ 1 and inflate the estimate)
    plane = [
        [rng.uniform(0, 20), rng.uniform(0, 20), 0, 0, 0, 0, 0, 0]
        for _ in range(400)
    ]
    r2 = run(plane)
    assert 1.4 <= r2["intrinsic_dim"] <= 2.8, r2

    # 1-D: uniform random points along dim 0
    line = [
        [rng.uniform(0, 200), 0, 0, 0, 0, 0, 0, 0] for _ in range(400)
    ]
    r1 = run(line)
    assert 0.6 <= r1["intrinsic_dim"] <= 1.6, r1


def test_hill_tail_index_invariants(spark, sf_dir):
    row = registry.get("orders_pareto_tail_index").fn(spark, sf_dir).collect()[0]
    assert row["k"] == 100
    assert row["hill_h"] > 0
    assert row["tail_alpha"] > 0
    assert abs(row["tail_alpha"] * row["hill_h"] - 1) < 1e-4  # alpha = 1/H


def test_seasonal_strength_bounds(spark, sf_dir):
    row = registry.get("events_seasonal_strength").fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["seasonal_strength"] <= 1.0 + 1e-9
    assert 0 <= row["peak_dw"] <= 6 and 0 <= row["trough_dw"] <= 6
    assert row["peak_dw"] != row["trough_dw"]


def test_distinctive_terms_shape(spark, sf_dir):
    rows = registry.get("docs_distinctive_terms_by_source").fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["score"])
    for src, scores in per.items():
        assert len(scores) <= 5, src
        assert scores == sorted(scores, reverse=True), src


def test_interp_pct_weighted_equals_rowgrain(spark):
    """The domain-grain weighted interpolation must equal the row-grain
    form on random integer data at several percentiles (same truncated
    rational closed form, different plan shape)."""
    import random

    from change_data_capture_service_spark.operators.stats import (
        exact_interp_pct,
        exact_interp_pct_weighted,
    )

    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.randint(0, 40)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v long")
    for pct in (50, 90, 95, 99):
        a = {r["k"]: r["q_val"] for r in exact_interp_pct(df, ["k"], "v", pct).collect()}
        b = {r["k"]: r["q_val"] for r in exact_interp_pct_weighted(df, ["k"], "v", pct).collect()}
        assert a == b, (pct, a, b)


def test_pivot_unpivot_roundtrip_equals_direct_groupby(spark, sf_dir):
    """The PIVOT -> UNPIVOT round trip must reconstruct the direct
    (day, type) grouped relation exactly -- losslessness of the widen/melt
    pair on observed cells."""
    from change_data_capture_service_spark.catalog import load_table

    got = {
        (str(r["day"]), r["event_type"]): r["n"]
        for r in registry.get("pivot_unpivot_roundtrip").fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    direct = {
        (str(r["day"]), r["event_type"]): r["n"]
        for r in e.groupBy(
            F.date_trunc("day", "ts").cast("timestamp").alias("day"), "event_type"
        ).agg(F.count("*").cast("bigint").alias("n")).collect()
    }
    assert got == direct


def test_dead_stock_panel_partitions_parts(spark, sf_dir):
    from change_data_capture_service_spark.catalog import load_table

    rows = registry.get("part_dead_stock_panel").fn(spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    for r in rows:
        assert 0 <= r["dead_share"] <= 1
        assert r["n_never_sold"] + r["n_dead_180d"] <= r["n_parts"]
