"""Round-15 queue-stock gates (keys registered behind the round-14 check
window): chain-ladder ultimate identities, Fano dispersion physics,
price-stickiness accounting, Burrows-Delta symmetry/discrimination, DFA
planted extremes, and RQA planted periodicity.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _rows(spark, sf_dir, key):
    return registry.get(key).fn(spark, sf_dir).collect()


def _write_events(spark, tmp_path, vals, name):
    recs = [
        {
            "event_id": i * 1000 + j,
            "ts": datetime(2024, 1 + i // 28, 1 + i % 28, 12, 0),
            "user_id": 1,
            "event_type": "view",
            "value": None,
            "props": None,
        }
        for i, v in enumerate(vals)
        for j in range(v)
    ]
    df = spark.createDataFrame(
        recs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / name)
    df.write.parquet(f"{out}/events.parquet")
    return out


def test_ultimate_projection_identities(spark, sf_dir):
    """ultimate = to_date * cdf exactly (to rounding); cdf >= 1 always
    (factors >= 1); the OLDEST cohort's cdf is exactly 1 (nothing left
    to develop); unearned = ultimate - to_date."""
    rows = _rows(spark, sf_dir, "orders_cohort_revenue_runoff")
    urows = _rows(spark, sf_dir, "orders_cohort_ultimate_projection")
    assert len(urows) >= 2
    oldest = max(urows, key=lambda r: r["cur_age"])
    assert abs(oldest["remaining_cdf"] - 1.0) < 1e-6
    for r in urows:
        assert r["remaining_cdf"] >= 1 - 1e-9
        assert (
            abs(r["ultimate_revenue"] - r["revenue_to_date"] * r["remaining_cdf"])
            < max(1e-3 * r["ultimate_revenue"], 0.01)
        )
        assert (
            abs(r["unearned_revenue"] - (r["ultimate_revenue"] - r["revenue_to_date"]))
            < max(1e-3 * r["ultimate_revenue"], 0.01)
        )
    # the runoff and projection keys share the triangle: every dev
    # factor >= 1 implies every cdf >= 1, checked above; youngest
    # cohorts carry the largest cdf
    youngest = min(urows, key=lambda r: r["cur_age"])
    assert youngest["remaining_cdf"] >= oldest["remaining_cdf"] - 1e-9
    assert len(rows) >= 1  # runoff companion present


def test_fano_panel_physics(spark, sf_dir):
    """Fano >= 0; the overdispersion flag agrees with fano > 1 wherever
    rounding leaves room; active months never exceed the calendar."""
    rows = _rows(spark, sf_dir, "supplier_volume_fano_panel")
    assert len(rows) >= 5
    for r in rows:
        assert r["fano"] >= 0
        assert 1 <= r["active_months"] <= r["n_months"]
        if abs(r["fano"] - 1.0) > 1e-4:
            assert r["overdispersed"] == (1 if r["fano"] > 1 else 0)
        assert r["mean_monthly"] * r["n_months"] == pytest.approx(
            r["total_lines"], rel=1e-4
        )


def test_price_stickiness_accounting(spark, sf_dir):
    """changes <= transitions; duration = transitions/changes; freq in
    [0, 1]; magnitude positive when any change happened."""
    rows = _rows(spark, sf_dir, "lineitem_price_stickiness_panel")
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["n_changes"] <= r["n_transitions"]
        if r["change_freq"] is not None:
            assert 0 <= r["change_freq"] <= 1
        if r["n_changes"] > 0:
            assert r["mean_abs_log_change"] > 0
            assert r["implied_duration_months"] == pytest.approx(
                r["n_transitions"] / r["n_changes"], rel=1e-4
            )


def test_burrows_delta_properties_and_planted_styles(spark, sf_dir, tmp_path):
    """Delta >= 0 with the full pair matrix present; two planted
    same-style sources score a smaller Delta than a divergent third."""
    rows = _rows(spark, sf_dir, "text_burrows_delta_matrix")
    srcs = {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert r["delta"] >= 0
        assert r["n_terms"] >= 5

    docs = []
    did = 0
    for s, text in (
        ("twin_a", "the cat sat on the mat and the dog ran to the house"),
        ("twin_b", "the dog sat on the rug and the cat ran to the barn"),
        ("alien", "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss"),
    ):
        for k in range(5):
            did += 1
            docs.append(
                {"doc_id": did, "text": text + f" extra{k}", "lang": "en",
                 "source": s, "n_chars": len(text)}
            )
    df = spark.createDataFrame(docs)
    out = str(tmp_path / "styles")
    df.write.parquet(f"{out}/documents.parquet")
    got = {
        tuple(sorted((r["source_a"], r["source_b"]))): r["delta"]
        for r in registry.get("text_burrows_delta_matrix").fn(spark, out).collect()
    }
    twins = got[("twin_a", "twin_b")]
    assert twins < got[("alien", "twin_a")]
    assert twins < got[("alien", "twin_b")]


def test_dfa_alpha_planted_extremes(spark, sf_dir, tmp_path):
    """Fixture alpha is finite; planted i.i.d. counts read alpha near
    0.5 and a long-memory-ish slow sine reads alpha well above it; DFA
    on a pure linear trend stays finite (the detrend absorbs it)."""
    import math

    import numpy as np

    r = _rows(spark, sf_dir, "events_dfa_alpha")[0]
    assert r["f_8"] is not None and r["f_8"] > 0
    assert r["dfa_alpha"] is not None

    rng = np.random.default_rng(17)
    iid = _write_events(
        spark, tmp_path, [int(v) for v in rng.integers(5, 45, 256)], "iid"
    )
    a_iid = registry.get("events_dfa_alpha").fn(spark, iid).collect()[0]["dfa_alpha"]
    assert 0.3 < a_iid < 0.75  # theoretical 0.5 for white noise

    slow = _write_events(
        spark,
        tmp_path,
        [25 + int(20 * math.sin(2 * math.pi * i / 128)) for i in range(256)],
        "slow",
    )
    a_slow = registry.get("events_dfa_alpha").fn(spark, slow).collect()[0]["dfa_alpha"]
    assert a_slow > a_iid + 0.3  # smooth low-frequency structure


def test_rqa_planted_weekly_period(spark, sf_dir, tmp_path):
    """Fixture panel is self-consistent (DET <= 1, identities hold); a
    planted strict 7-day cycle is near-fully deterministic (every lag-7k
    diagonal is one unbroken line), an i.i.d. series much less so."""
    import numpy as np

    r = _rows(spark, sf_dir, "events_recurrence_quantification")[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    assert 0 <= r["recurrence_rate"] <= 1
    if r["determinism"] is not None:
        assert 0 <= r["determinism"] <= 1
        assert r["max_line_len"] >= r["mean_line_len"] - 1e-9

    cyc = _write_events(
        spark, tmp_path, [10 + 10 * (i % 7) for i in range(112)], "cyc"
    )
    g = registry.get("events_recurrence_quantification").fn(spark, cyc).collect()[0]
    assert g["determinism"] > 0.95

    rng = np.random.default_rng(23)
    iid = _write_events(
        spark, tmp_path, [int(v) for v in rng.integers(1, 1000, 112)], "riid"
    )
    gi = registry.get("events_recurrence_quantification").fn(spark, iid).collect()[0]
    assert gi["determinism"] is None or gi["determinism"] < g["determinism"]


def test_bullwhip_panel_consistency(spark, sf_dir):
    """CV^2 legs nonnegative; ratio = cv2_orders / cv2_shipments to
    rounding grain; the amplification flag agrees with ratio > 1
    wherever rounding leaves room."""
    rows = _rows(spark, sf_dir, "lineitem_bullwhip_ratio_panel")
    assert len(rows) >= 2
    for r in rows:
        assert r["cv2_orders"] >= 0 and r["cv2_shipments"] >= 0
        if r["bullwhip_ratio"] is not None and r["cv2_shipments"] > 1e-6:
            assert r["bullwhip_ratio"] == pytest.approx(
                r["cv2_orders"] / r["cv2_shipments"], rel=1e-3
            )
            if abs(r["bullwhip_ratio"] - 1.0) > 1e-4:
                assert r["amplifying"] == (1 if r["bullwhip_ratio"] > 1 else 0)


def test_pivot_dialect_reconciles_to_groupby(spark, sf_dir):
    """The pivoted cells re-aggregate to the plain GROUP BY totals --
    the pivot moved data, never changed it."""
    from change_data_capture_service_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "sqlapi_pivot_dialect")
    assert len(rows) >= 2
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    want = {
        (r["yr"], r["pri"]): r["rev"]
        for r in o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.concat(
                F.lit("p"), F.split(F.col("o_orderpriority"), "-").getItem(0)
            ).alias("pri"),
        )
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "try_cast(try_cast(o_totalprice AS decimal(18,2))"
                        " * 100 AS bigint)"
                    )
                ).cast("double")
                / 100,
                6,
            ).alias("rev")
        )
        .collect()
    }
    cols = {
        "p1": "urgent_revenue", "p2": "high_revenue", "p3": "medium_revenue",
        "p4": "notspec_revenue", "p5": "low_revenue",
    }
    for r in rows:
        for pri, col in cols.items():
            assert r[col] == pytest.approx(want.get((r["yr"], pri), 0.0), abs=0.02)
