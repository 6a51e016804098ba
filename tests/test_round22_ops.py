"""Round-14 wave-1 operator gates: chain-ladder triangle identities,
newsvendor fractile guarantees, RCA marginal identities, and clumpiness
bounds with planted regular-vs-bursty discrimination.
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


def test_cohort_runoff_monotone_and_bounded(spark, sf_dir):
    """Cumulative revenue never shrinks with age (revenue is
    nonnegative), so every development factor >= 1; the cohort count
    shrinks (weakly) as age grows -- the triangle boundary."""
    rows = _rows(spark, sf_dir, "orders_cohort_revenue_runoff")
    assert len(rows) >= 2
    prev_n = None
    for r in rows:
        assert r["cum_revenue_next"] >= r["cum_revenue"] - 1e-6
        if r["dev_factor"] is not None:
            assert r["dev_factor"] >= 1 - 1e-9
        if prev_n is not None:
            assert r["n_cohorts"] <= prev_n
        prev_n = r["n_cohorts"]
    assert rows[0]["age"] == 0


def test_cohort_runoff_age0_covers_first_months(spark, sf_dir):
    """Age-0 cumulative revenue over the factor-eligible cohorts is
    positive and below the full panel revenue."""
    rows = _rows(spark, sf_dir, "orders_cohort_revenue_runoff")
    assert rows[0]["cum_revenue"] > 0
    assert rows[0]["cum_revenue"] <= rows[-1]["cum_revenue_next"] * rows[0]["n_cohorts"]


def test_newsvendor_service_meets_critical_ratio(spark, sf_dir):
    """q* is the CR = 0.8 exact-interp quantile of daily demand, so the
    achieved cycle service level is >= 0.8 minus one day's grain (the
    percentile sits between order statistics); lost sales are 0 exactly
    when service is total."""
    rows = _rows(spark, sf_dir, "lineitem_newsvendor_service_panel")
    assert len(rows) >= 2
    for r in rows:
        assert r["n_days"] >= 1
        grain = 1.0 / r["n_days"]
        assert r["service_level"] >= 0.8 - grain - 1e-9
        assert 0 <= r["service_level"] <= 1
        assert r["mean_lost_sales"] >= 0
        assert r["q_star"] >= 0
        if r["service_level"] == 1.0:
            assert r["mean_lost_sales"] == 0.0


def test_rca_marginal_identity(spark, sf_dir):
    """Revenue-share-weighted RCA sums to 1 per nation (the Balassa
    identity sum_t (x_t/X) * RCA_nt = 1), and the specialized flag
    agrees with rca > 1 wherever rounding leaves room."""
    rows = _rows(spark, sf_dir, "nation_part_rca_matrix")
    assert len(rows) >= 10
    tot = sum(r["revenue"] for r in rows)
    by_facet: dict = {}
    for r in rows:
        by_facet.setdefault(r["facet"], 0.0)
        by_facet[r["facet"]] += r["revenue"]
    for nation in {r["nation"] for r in rows}:
        s = sum(
            (by_facet[r["facet"]] / tot) * r["rca"]
            for r in rows
            if r["nation"] == nation
        )
        assert abs(s - 1.0) < 1e-3, (nation, s)
    for r in rows:
        if abs(r["rca"] - 1.0) > 1e-4:
            assert r["specialized"] == (1 if r["rca"] > 1 else 0)


def test_clumpiness_bounds_and_planted_discrimination(spark, sf_dir, tmp_path):
    """Panel values sit in [0, 1]; a planted metronome customer scores
    near 0 and a planted binge customer near 1, in the right order."""
    rows = _rows(spark, sf_dir, "customer_clumpiness_panel")
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["avg_clumpiness"] <= 1
        assert r["n_customers"] >= 1
        assert r["avg_active_days"] >= 2

    # planted: customer 1 orders on the 1st of every month (regular);
    # customer 2 orders 12 consecutive days then never again (burst)
    rows_in = []
    okey = 0
    for m in range(12):
        okey += 1
        rows_in.append((okey, 1, datetime(2024, 1 + m, 1)))
    for d in range(12):
        okey += 1
        rows_in.append((okey, 2, datetime(2024, 1, 1 + d)))
    orders = spark.createDataFrame(
        [
            {
                "o_orderkey": k,
                "o_custkey": ck,
                "o_orderdate": dt,
                "o_totalprice": 100.0,
                "o_orderpriority": "1-URGENT",
                "o_orderstatus": "O",
            }
            for (k, ck, dt) in rows_in
        ]
    )
    customer = spark.createDataFrame(
        [
            {"c_custkey": 1, "c_mktsegment": "REGULAR", "c_nationkey": 0},
            {"c_custkey": 2, "c_mktsegment": "BURSTY", "c_nationkey": 0},
        ]
    )
    out = str(tmp_path / "planted_sf")
    orders.write.parquet(f"{out}/orders.parquet")
    customer.write.parquet(f"{out}/customer.parquet")
    planted = {
        r["segment"]: r["avg_clumpiness"]
        for r in _rows(spark, out, "customer_clumpiness_panel")
    }
    assert planted["BURSTY"] > planted["REGULAR"]
    assert planted["BURSTY"] > 0.5
    assert planted["REGULAR"] < 0.35


def test_permutation_entropy_bounds_and_planted_series(spark, sf_dir, tmp_path):
    """Panel bounds hold; a strictly increasing planted series collapses
    to one pattern (entropy 0), an alternating one to two patterns."""
    r = _rows(spark, sf_dir, "events_permutation_entropy_daily")[0]
    assert r["n_windows"] >= 10
    assert 1 <= r["n_patterns"] <= 6
    assert 0 <= r["h_norm"] <= 1 + 1e-9
    assert abs(r["h_perm"] - r["h_norm"] * __import__("math").log(6)) < 1e-4
    assert 0 < r["modal_share"] <= 1

    def planted(vals):
        rows = [
            {
                "event_id": i,
                "ts": datetime(2024, 1 + i // 27, 1 + i % 27, 0, 0),
                "user_id": 1,
                "event_type": "view",
                "value": None,
                "props": None,
            }
            for i, v in enumerate(vals)
            for _ in range(v)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        out = str(tmp_path / f"pe_{len(vals)}_{vals[0]}_{vals[-1]}")
        df.write.parquet(f"{out}/events.parquet")
        return registry.get("events_permutation_entropy_daily").fn(spark, out).collect()[0]

    mono = planted(list(range(1, 28)))  # strictly increasing counts
    assert mono["n_patterns"] == 1 and mono["h_perm"] == 0.0
    alt = planted([1 + (i % 2) * 5 for i in range(27)])  # up-down-up-down
    assert alt["n_patterns"] == 2


def test_seasonal_mk_on_fixture_and_planted_trend(spark, sf_dir, tmp_path):
    """Fixture panel is self-consistent (trend names the sign of S,
    variance positive); a planted within-dow increasing series yields
    the maximal S and an 'increasing' call."""
    r = _rows(spark, sf_dir, "events_seasonal_mann_kendall")[0]
    assert r["n_days"] >= 14
    assert r["var_s"] > 0
    expected = "increasing" if r["s"] > 0 else ("decreasing" if r["s"] < 0 else "none")
    assert r["trend"] == expected

    # 6 weeks, count = week index + 1 replicated per day: within every
    # dow season all C(6,2)=15 pairs increase -> S = 7 * 15 = 105
    rows = []
    eid = 0
    for w in range(6):
        for d in range(7):
            for _ in range(w + 1):
                eid += 1
                rows.append(
                    {
                        "event_id": eid,
                        "ts": datetime(2024, 1 + (w * 7 + d) // 28, 1 + (w * 7 + d) % 28, 12, 0),
                        "user_id": 1,
                        "event_type": "view",
                        "value": None,
                        "props": None,
                    }
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "smk")
    df.write.parquet(f"{out}/events.parquet")
    p = registry.get("events_seasonal_mann_kendall").fn(spark, out).collect()[0]
    assert p["s"] == 7 * 15
    assert p["trend"] == "increasing"
    assert p["z"] > 0


def test_yule_k_simpson_closed_form(spark, sf_dir, tmp_path):
    """Fixture bounds + a hand-computable planted corpus: 'a a a b'
    has N=4, f(a)=3, f(b)=1 -> sum f^2 = 10, K = 10^4 * (10-4)/16 =
    3750; D = (3*2 + 0) / (4*3) = 0.5."""
    rows = _rows(spark, sf_dir, "text_yule_k_by_source")
    assert len(rows) >= 2
    for r in rows:
        assert r["vocab"] <= r["n_tokens"]
        assert r["yule_k"] >= 0 and 0 <= r["simpson_d"] <= 1
        # K ~ 1e4 * D for large N (identity up to the -N term)
        if r["n_tokens"] > 1000:
            assert abs(r["yule_k"] / 10000 - r["simpson_d"]) < 0.01

    df = spark.createDataFrame(
        [{"doc_id": 1, "text": "a a a b", "lang": "en", "source": "s",
          "n_chars": 7}]
    )
    out = str(tmp_path / "yule")
    df.write.parquet(f"{out}/documents.parquet")
    r = registry.get("text_yule_k_by_source").fn(spark, out).collect()[0]
    assert r["n_tokens"] == 4 and r["vocab"] == 2
    assert abs(r["yule_k"] - 3750.0) < 1e-6
    assert abs(r["simpson_d"] - 0.5) < 1e-6


def test_bigram_entropy_rate_conditioning_bound(spark, sf_dir, tmp_path):
    """Conditioning never increases entropy: 0 <= H(W2|W1) <= H(W1)
    approximately (the bigram H also bounds below by the unigram H).
    Planted: a fully deterministic chain 'a b a b ...' has entropy
    rate ~0; a two-branch chain has rate ~ln 2."""
    import math

    rows = _rows(spark, sf_dir, "docs_bigram_entropy_rate_by_source")
    assert len(rows) >= 2
    for r in rows:
        assert r["h_bigram"] >= r["h_unigram"] - 1e-6
        assert r["entropy_rate"] >= -1e-6
        assert r["n_bigrams"] <= r["n_tokens"]

    def planted(text, name):
        df = spark.createDataFrame(
            [{"doc_id": 1, "text": text, "lang": "en", "source": "s",
              "n_chars": len(text)}]
        )
        out = str(tmp_path / name)
        df.write.parquet(f"{out}/documents.parquet")
        return registry.get("docs_bigram_entropy_rate_by_source").fn(spark, out).collect()[0]

    det = planted("a b " * 50, "det")  # next token fully determined
    assert det["entropy_rate"] < 0.05
    branch = planted("a b a c " * 50, "branch")  # after 'a': b or c 50/50
    assert abs(branch["entropy_rate"] - math.log(2) / 2) < 0.1


def test_bbit_minhash_estimator_sanity(spark, sf_dir):
    """Full-width minhash beats (or ties) 1-bit on identical pairs at
    high similarity per Li-Koenig; both estimators and exact stay in
    [0, 1]; bands are consistent with their exact means."""
    rows = _rows(spark, sf_dir, "dedup_bbit_minhash_eval")
    assert len(rows) >= 1
    for r in rows:
        assert 0 <= r["avg_exact"] <= 1
        assert 0 <= r["avg_est_full"] <= 1
        assert 0 <= r["avg_est_1bit"] <= 1
        assert r["mae_full"] >= 0 and r["mae_1bit"] >= 0
        lo, hi = r["band"] / 10, (r["band"] + 1) / 10
        assert lo - 1e-9 <= r["avg_exact"] <= (hi if r["band"] < 9 else 1.0) + 1e-9


def test_jl_distortion_band_and_identical_vectors(spark, sf_dir, tmp_path):
    """Fixture ratios bracket 1 with most pairs inside the eps band (the
    JL lemma at k=16, eps=0.4 over 64-dim inputs); identical planted
    vectors are excluded (zero original distance), and a planted
    orthonormal pair's ratio is finite and positive."""
    r = _rows(spark, sf_dir, "embedding_jl_projection_distortion")[0]
    assert r["n_pairs"] >= 10
    assert r["min_ratio"] <= r["avg_ratio"] <= r["max_ratio"]
    assert r["share_within_eps"] >= 0.5
    assert r["min_ratio"] > 0

    import numpy as np

    rng = np.random.default_rng(3)
    vecs = [(i, rng.normal(0, 1, 64).astype("float32").tolist(), 0) for i in range(3)]
    vecs.append((3, vecs[2][1], 0))  # identical to vec 2 -> pair excluded
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / "jl")
    df.write.parquet(f"{out}/embeddings.parquet")
    p = registry.get("embedding_jl_projection_distortion").fn(spark, out).collect()[0]
    assert p["n_pairs"] == 2  # (0,1), (1,2); (2,3) drops as zero-distance
    assert p["min_ratio"] > 0


def test_schema_drift_census_and_planted_variant(spark, sf_dir, tmp_path):
    """Healthy fixture: one dominant variant per type with share 1; a
    planted second key-set shows up as its own row with the right
    first_seen, and invalid JSON lands in '<invalid>' instead of
    dropping."""
    rows = _rows(spark, sf_dir, "cdc_schema_drift_audit")
    assert len(rows) >= 1
    for r in rows:
        assert 0 < r["share"] <= 1
        assert r["first_seen"] <= r["last_seen"]
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-4
        assert sum(r["is_dominant"] for r in rs) >= 1

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 1, "view", None, '{"k": 1}'),
            (2, datetime(2024, 1, 2), 1, "view", None, '{"k": 2}'),
            (3, datetime(2024, 2, 1), 1, "view", None, '{"k": 3, "v2": "x"}'),
            (4, datetime(2024, 2, 2), 1, "view", None, "not json"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "drift")
    ev.write.parquet(f"{out}/events.parquet")
    got = {r["keyset"]: r for r in _rows(spark, out, "cdc_schema_drift_audit")}
    assert set(got) == {"k", "k,v2", "<invalid>"}
    assert got["k"]["is_dominant"] == 1 and got["k"]["n_events"] == 2
    assert got["k,v2"]["first_seen"] == datetime(2024, 2, 1)
    assert got["<invalid>"]["n_keys"] == 0


def test_systematic_sampling_rate_and_composition(spark, sf_dir):
    """The sample rate is ~1/k per source (exact on id-dense frames up
    to boundary grain) and shares reconcile."""
    rows = _rows(spark, sf_dir, "sample_systematic_interval")
    assert len(rows) >= 2
    tot_f = sum(r["n_frame"] for r in rows)
    tot_s = sum(r["n_sample"] for r in rows)
    assert abs(tot_s / tot_f - 0.1) < 0.02  # 1/k overall on the dense id frame
    for r in rows:
        assert 0 <= r["n_sample"] <= r["n_frame"]
        if r["n_sample"] >= 5:
            assert 0.5 < r["mean_chars_ratio"] < 2.0
    assert abs(sum(r["frame_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["sample_share"] for r in rows) - 1.0) < 1e-3


def test_hurst_bounds_and_planted_extremes(spark, sf_dir, tmp_path):
    """Fixture H lands in (0, 1); planted: an i.i.d.-ish alternating
    series reads anti-persistent (H well below 0.5), a strong linear
    trend reads persistent (H near 1)."""
    r = _rows(spark, sf_dir, "events_hurst_rs_estimate")[0]
    assert r["n_days"] >= 16  # the CI fixture is sf0.001 (~30 days)
    for w in (8, 16, 32, 64):
        assert r[f"rs_{w}"] is None or r[f"rs_{w}"] > 0
    assert r["rs_8"] is not None and r["rs_16"] is not None
    assert r["hurst"] is not None and -0.5 < r["hurst"] < 1.5

    def planted(vals, name):
        rows = [
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
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        out = str(tmp_path / name)
        df.write.parquet(f"{out}/events.parquet")
        return registry.get("events_hurst_rs_estimate").fn(spark, out).collect()[0]

    anti = planted([5 + (i % 2) * 10 for i in range(112)], "anti")
    trend = planted([1 + i for i in range(112)], "trend")
    assert anti["hurst"] < 0.35
    assert trend["hurst"] > 0.8
    assert trend["hurst"] > anti["hurst"]


def test_davies_bouldin_separation_orders_fits(spark, tmp_path):
    """Well-separated planted clusters score a LOWER DB index than the
    same data fit with overlapping centers; per-row invariants hold."""
    import numpy as np

    rng = np.random.default_rng(11)

    def corpus(sep, name):
        rows = []
        vid = 0
        for c in range(4):
            center = np.zeros(8)
            center[c] = sep
            for _ in range(25):
                rows.append(
                    (vid, (center + rng.normal(0, 0.05, 8)).astype("float32").tolist(), c)
                )
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = str(tmp_path / name)
        df.write.parquet(f"{out}/embeddings.parquet")
        return registry.get("cluster_davies_bouldin_eval").fn(spark, out, k=4).collect()

    tight = corpus(10.0, "tight")
    loose = corpus(0.5, "loose")
    assert len(tight) == 4
    for r in tight:
        assert r["scatter"] >= 0 and r["nearest_sep"] > 0
        assert r["worst_ratio"] > 0
        assert r["db_index"] == tight[0]["db_index"]  # panel constant
    assert tight[0]["db_index"] < loose[0]["db_index"]
    assert tight[0]["db_index"] < 0.2  # separation 10 vs noise 0.05


def test_asof_dialect_matches_manual_asof(spark, sf_dir):
    """The window-form ASOF equals a hand-computed per-row backward
    lookup on a sample, and every non-null alignment is <= its purchase
    ts (the inclusive contract)."""
    rows = _rows(spark, sf_dir, "sqlapi_asof_dialect")
    assert len(rows) >= 10
    n_null = 0
    for r in rows:
        if r["last_click_ts"] is None:
            n_null += 1
        else:
            assert r["last_click_ts"] <= r["ts"]
    from change_data_capture_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = {}
    for c in e.filter(F.col("event_type") == "click").select("user_id", "ts").collect():
        clicks.setdefault(c["user_id"], []).append(c["ts"])
    for u in clicks:
        clicks[u].sort()
    import bisect

    for r in rows[:50]:
        ts_list = clicks.get(r["user_id"], [])
        i = bisect.bisect_right(ts_list, r["ts"])
        want = ts_list[i - 1] if i else None
        assert r["last_click_ts"] == want, (r, want)


def test_allan_variance_white_noise_slope(spark, sf_dir, tmp_path):
    """Fixture rows are positive with a shared slope column; a planted
    alternating (white-ish) series averages down with slope near -1,
    and a planted linear drift has a POSITIVE slope (random-walk-like
    dominance at long tau)."""
    rows = _rows(spark, sf_dir, "events_allan_variance")
    assert len(rows) >= 1
    for r in rows:
        assert r["avar"] >= 0 and abs(r["adev"] - r["avar"] ** 0.5) < 1e-4
        assert r["loglog_slope"] == rows[0]["loglog_slope"]

    def planted(vals, name):
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
        return registry.get("events_allan_variance").fn(spark, out).collect()

    import numpy as np

    rng = np.random.default_rng(5)
    white = planted([int(v) for v in rng.integers(1, 40, 128)], "white")
    drift = planted([1 + i for i in range(128)], "drift")
    assert white[0]["loglog_slope"] < -0.5  # i.i.d.: avar ~ 1/tau
    assert drift[0]["loglog_slope"] > 0.5  # drift: avar grows with tau


def test_bass_fit_recovers_planted_diffusion(spark, sf_dir, tmp_path):
    """Fixture: coefficients exist and m >= adopters-to-date when the
    guard passes. Planted: a synthetic Bass adoption path (p=.03, q=.4,
    m=1000) fit back within loose tolerance -- the discrete OLS is the
    textbook estimator, biased small-sample but directionally exact."""
    r = _rows(spark, sf_dir, "customer_bass_diffusion_fit")[0]
    assert r["n_months"] >= 12
    if r["market_m"] is not None:
        assert r["market_m"] >= r["total_adopters"] * 0.5

    p_true, q_true, m_true = 0.03, 0.4, 1000.0
    N = 0.0
    rows_in = []
    ck = 0
    for t in range(30):
        n_t = max(0, round((p_true + q_true * N / m_true) * (m_true - N)))
        N += n_t
        for _ in range(int(n_t)):
            ck += 1
            rows_in.append(
                {
                    "o_orderkey": ck,
                    "o_custkey": ck,
                    "o_orderdate": datetime(2020 + t // 12, 1 + t % 12, 15),
                    "o_totalprice": 10.0,
                    "o_orderpriority": "1-URGENT",
                    "o_orderstatus": "O",
                }
            )
    df = spark.createDataFrame(rows_in)
    out = str(tmp_path / "bass")
    df.write.parquet(f"{out}/orders.parquet")
    g = registry.get("customer_bass_diffusion_fit").fn(spark, out).collect()[0]
    assert g["market_m"] is not None
    assert abs(g["market_m"] - m_true) / m_true < 0.15
    assert abs(g["q_imitation"] - q_true) < 0.15
    assert 0 < g["p_innovation"] < 0.1
    assert g["peak_month"] > 0  # imitation-dominated: peak after launch


def test_extremal_index_bounds_and_planted_clustering(spark, sf_dir, tmp_path):
    """theta in (0, 1]; identity n_exceed = theta-denominator holds; a
    planted series whose exceedances come in 4-day blocks reads theta
    ~ 1/4, and an isolated-spike series reads theta = 1."""
    r = _rows(spark, sf_dir, "events_extremal_index_runs")[0]
    assert r["n_exceed"] >= 1 and r["n_clusters"] >= 1
    assert 0 < r["theta"] <= 1
    assert abs(r["mean_cluster_len"] * r["theta"] - 1) < 1e-6
    assert r["max_cluster_len"] >= r["mean_cluster_len"] - 1e-9

    def planted(vals, name):
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
        return registry.get("events_extremal_index_runs").fn(spark, out).collect()[0]

    # 100 days: baseline 1, two isolated 4-day bursts of 50 -> 8
    # exceedances in 2 clusters -> theta 0.25
    burst = [1] * 100
    for s in (10, 60):
        for d in range(4):
            burst[s + d] = 50
    b = planted(burst, "burst")
    assert b["n_clusters"] == 2 and b["n_exceed"] == 8
    assert abs(b["theta"] - 0.25) < 1e-6
    # isolated spikes: every exceedance its own cluster -> theta 1
    iso = [1] * 100
    for s in (10, 30, 50, 70, 90):
        iso[s] = 50
    i = planted(iso, "iso")
    assert i["theta"] == 1.0
