"""Round-8 scale-design gates: the DF-capped exact-jaccard pair family
and the range-partitioned domain-ordered stats windows.

These pin the two 100-TB caveats named in the round-7 verdict:

1. The exact-jaccard pair family (dedup_ngram_jaccard,
   dedup_lsh_tuning_curve, docs_near_dup_band_profile,
   dedup_semantic_minhash_union) now rides _capped_exact_pairs -- the
   CONTAINMENT_DF_CAP treatment extended to its siblings. The pair space
   must be bounded BY CONSTRUCTION under a planted hot shingle
   (df >> cap), while surfaced jaccard values stay EXACT (computed on
   the full shingle sets, hot shingles included).

2. The KS / Mann-Whitney / EMD domain-ordered prefix sums must execute
   with >1 task on a wide value domain (asserted on the EXECUTED plan's
   shuffle partitioning, not wall-clock).

Cross-engine value parity for all registered keys stays covered by
test_oracle_parity; these tests cover what an oracle twin cannot -- the
cost-shape of the plan under adversarial data.
"""

from __future__ import annotations

import pandas as pd
import pytest
import pyspark.sql.functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import TABLE_NAMES, table_path

registry.load_all()


# ------------------------------------------------- capped jaccard family


@pytest.fixture(scope="module")
def boilerplate_fixture(spark, tmp_path_factory):
    """200 docs sharing one boilerplate trigram (df=202 >> JACCARD_DF_CAP)
    plus unique tails, and one genuine near-dup pair (500, 501) whose
    overlap is 4 rare shingles + the hot one. Uncapped, the hot shingle
    alone would form C(202,2) = 20,301 join pairs before any filter."""
    rows = []
    for i in range(200):
        rows.append(
            (i, f"common header line unique{i}a unique{i}b unique{i}c", "en", "t", 0)
        )
    rows.append((500, "common header line alpha beta gamma delta", "en", "t", 0))
    rows.append(
        (501, "common header line alpha beta gamma delta epsilon zeta", "en", "t", 0)
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fx = str(tmp_path_factory.mktemp("jacfix"))
    df.coalesce(1).write.mode("overwrite").parquet(fx + "/documents.parquet")
    return fx


def test_capped_pair_space_bounded_under_hot_shingle(spark, boilerplate_fixture):
    """The candidate space contains ONLY the genuine pair: boilerplate-only
    overlap never forms a pair, so the join is |shingles| x CAP^2-bounded
    instead of df^2 = 202^2 on the hot shingle."""
    from change_data_capture_service_spark.operators.dedup import (
        JACCARD_DF_CAP,
        _capped_exact_pairs,
        _shingled_docs,
    )

    sh = _shingled_docs(spark, boilerplate_fixture)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    hot_df = (
        ex.groupBy("shingle").agg(F.count("*").alias("df")).agg(F.max("df")).collect()
    )[0][0]
    assert hot_df == 202 > JACCARD_DF_CAP  # the fixture is adversarial

    pairs = _capped_exact_pairs(sh).toPandas()
    assert len(pairs) == 1, pairs
    r = pairs.iloc[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (500, 501)
    # exact verify runs on the FULL shingle sets: c counts the hot
    # boilerplate shingle too (5 shared of 7 union), so surfaced values
    # are identical to the uncapped join's
    assert (int(r["c"]), int(r["na"]), int(r["nb"])) == (5, 5, 7)


def test_ngram_jaccard_exact_values_survive_cap(spark, boilerplate_fixture):
    out = registry.get("dedup_ngram_jaccard").fn(spark, boilerplate_fixture).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (500, 501)
    assert abs(float(r["jaccard"]) - round(5 / 7, 6)) < 1e-9


def test_lsh_tuning_curve_bounded_under_hot_shingle(spark, boilerplate_fixture):
    """The planning op you run FIRST on an uncurated corpus must itself be
    safe on boilerplate-heavy input: 4 configs, each scoring exactly the
    one genuine pair."""
    out = (
        registry.get("dedup_lsh_tuning_curve").fn(spark, boilerplate_fixture).toPandas()
    )
    assert len(out) == 4
    assert (out["n_pairs_scored"] == 1).all(), out


def test_band_profile_and_semantic_union_run_on_hot_fixture(
    spark, boilerplate_fixture
):
    """The remaining two family members execute (bounded) on the
    adversarial fixture. semantic union needs embeddings: absent vectors
    for these doc_ids -> inner join drops all pairs -> 0 rows, which is
    the correct (non-crashing) degenerate answer."""
    prof = (
        registry.get("docs_near_dup_band_profile")
        .fn(spark, boilerplate_fixture)
        .toPandas()
    )
    assert prof["n_pairs"].sum() == 1
    # same_source=1 (both docs share source 't'), band floor(5/7*10)/10=0.7
    assert float(prof.iloc[0]["band_lo"]) == 0.7


# ------------------------------------------- range-partitioned domain windows


@pytest.fixture(scope="module")
def wide_domain_fixture(spark, tmp_path_factory):
    """A synthetic events table whose VALUE DOMAIN is 10^6 distinct cents
    values (the regime where a single-task Window.orderBy over the domain
    becomes the bottleneck): one purchase per value, alternating
    weekend/weekday timestamps, alternating user parity."""
    fx = str(tmp_path_factory.mktemp("widefix"))
    n = 1_000_000
    df = spark.range(n).selectExpr(
        "id AS event_id",
        # 2024-01-06 was a Saturday, 2024-01-08 a Monday
        "CASE WHEN id % 2 = 0 THEN timestamp'2024-01-06 12:00:00'"
        " ELSE timestamp'2024-01-08 12:00:00' END AS ts",
        "id AS user_id",
        "'purchase' AS event_type",
        "CAST(id AS DOUBLE) / 100 AS value",  # id cents -> 10^6 distinct
        "'{}' AS props",
    )
    df.coalesce(4).write.mode("overwrite").parquet(fx + "/events.parquet")
    return fx


def test_domain_prefix_window_stage_runs_multi_task(spark, wide_domain_fixture):
    """The two-level prefix sum's wide stage (within-bucket windows) must
    EXECUTE across >1 task on a 10^6-distinct-value domain -- asserted on
    the actual partition ids carrying rows after the window stage (the
    window does not repartition its input, so the observed spread IS the
    window stage's), not on wall-clock."""
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.operators.stats import (
        _RANGE_W,
        _domain_prefix,
        _VALUE_C,
    )

    e = load_table(spark, wide_domain_fixture, "events")
    v = (
        e.select(F.expr(_VALUE_C).alias("c"))
        .filter(F.col("c").isNotNull())
        .groupBy("c")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    n_buckets = 1_000_000 // _RANGE_W + 1  # 16 ranges
    pref = _domain_prefix(v, "c", ["cnt"])
    parts = (
        pref.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1, (
        f"window stage executed on {parts} task(s) -- the domain prefix "
        f"has single-partitioned a {n_buckets}-bucket domain"
    )
    # and the prefix itself is right: spot-check the global maximum
    top = pref.orderBy(F.col("c").desc()).limit(1).collect()[0]
    assert top["pre_cnt"] == 999_999  # exclusive prefix of 10^6 ones


def test_ks_mw_emd_exact_on_wide_domain(spark, wide_domain_fixture):
    """The three converted operators agree with closed-form references on
    the wide-domain fixture (even ids = weekend = even cents values).

    KS: F_we steps at even values, F_wd at odd -- the max CDF gap is
    exactly one step of the 500k-sample CDF, D = 1/500000.
    MW: doubled rank sums have a closed form under the even/odd
    interleave; u_centered = n*n/2 - n/2 - n*n/2 = -n/2 with
    n = 500000 per arm (treat = even user ids = even values).
    EMD: adjacent CDFs differ by 1/500000 over alternating 1-cent gaps;
    integral = (n-1) * (1/n) * 1 cent / 2 ... computed numerically
    with numpy instead of trusting my algebra."""
    import numpy as np

    ks = registry.get("events_value_ks_weekend").fn(spark, wide_domain_fixture)
    r = ks.collect()[0]
    assert (r["n_weekend"], r["n_weekday"]) == (500_000, 500_000)
    assert abs(r["ks_d"] - round(1 / 500_000, 6)) < 1e-9

    mw = registry.get("events_mannwhitney_purchase_ab").fn(
        spark, wide_domain_fixture
    )
    m = mw.collect()[0]
    assert (m["n_treat"], m["n_control"]) == (500_000, 500_000)
    # numpy reference on the same construction
    vals = np.arange(1_000_000)
    ranks = np.argsort(np.argsort(vals)) + 1.0  # no ties -> plain ranks
    r_t = ranks[vals % 2 == 0].sum()
    n_t = n_c = 500_000.0
    u_centered_ref = (r_t - n_t * (n_t + 1) / 2) - n_t * n_c / 2
    assert abs(m["u_centered"] - round(u_centered_ref, 6)) < 1e-6 * abs(
        u_centered_ref
    )

    emd = registry.get("events_value_emd_weekend").fn(spark, wide_domain_fixture)
    e = emd.collect()[0]
    cdf_we = np.cumsum((vals % 2 == 0).astype(np.int64)) / 500_000
    cdf_wd = np.cumsum((vals % 2 == 1).astype(np.int64)) / 500_000
    gaps = np.diff(vals)  # all 1 cent
    emd_ref = float((np.abs(cdf_we - cdf_wd)[:-1] * gaps).sum()) / 100  # dollars
    assert abs(e["emd_value"] - emd_ref) < 1e-4, (e["emd_value"], emd_ref)


# ------------------------------------------------- pagerank fixed point, sf0.01


def test_pagerank_fixed_point_matches_recursive_cte_at_sf0_01(spark):
    """The 10-round synchronous power-iteration fixed point, pinned against
    the recursive-CTE oracle at sf0.01 (10x the default pytest fixture --
    the scale the driver attests at). The engine loop (join + partial agg
    per round, lineage checkpointed every 3 rounds) and the declarative
    recursive CTE must land on the SAME rounded rank vector; a drift in
    damping, iteration count, or dangling-mass handling shows up here
    before it shows up in a driver rotation slot."""
    import duckdb

    from tests.conftest import canonicalize

    sf = "/root/testdata/sf0.01"
    entry = registry.get("graph_pagerank")
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{table_path(sf, name)}')"
            )
        sdf = entry.fn(spark, sf).toPandas()
        odf = con.execute(entry.oracle).fetchdf()
    finally:
        con.close()
    assert canonicalize(sdf) == canonicalize(odf)
    assert abs(sdf["pagerank"].sum() - 1.0) < 1e-3  # probability distribution


# ------------------------------------------------- tuned MinHash knee pick


def test_minhash_tuned_knee_beats_max_recall_config(spark, sf_dir):
    """The curve -> detector loop (round-8 verdict item 8): the knee
    config must (a) qualify on analytic recall, (b) carry the MINIMUM
    expected candidate count among qualifying configs, and (c) on the
    actual fixture pay strictly fewer banded candidate verifications than
    the naive max-recall (64, 2) pick while surfacing the IDENTICAL
    verified >= 0.8 pair set -- equal recall, cheaper."""
    from change_data_capture_service_spark.operators.dedup import (
        TUNED_RECALL_FLOOR,
        _banded_near_pairs,
        _band_entries,
        _lsh_curve,
        _minhash_sig,
        _pick_knee_config,
        _shingled_docs,
    )

    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    curve = _lsh_curve(sh).collect()
    knee = _pick_knee_config(curve)
    assert knee is not None
    kb, kr = knee
    qualifying = [
        r
        for r in curve
        if r["expected_recall_at_08"] is not None
        and r["expected_recall_at_08"] >= TUNED_RECALL_FLOOR
    ]
    assert (64, 2) in {(r["bands"], r["rows_per_band"]) for r in qualifying}
    knee_row = next(r for r in curve if (r["bands"], r["rows_per_band"]) == knee)
    assert all(
        knee_row["expected_candidates"] <= r["expected_candidates"] for r in qualifying
    )

    def actual_candidates(bands, rows_per_band):
        be = _band_entries(
            _minhash_sig(sh, n_perm=bands * rows_per_band), bands, rows_per_band
        )
        a, b = be.alias("a"), be.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    n_knee, n_naive = actual_candidates(kb, kr), actual_candidates(64, 2)
    assert n_knee < n_naive, (n_knee, n_naive)

    pairs_of = lambda df: {
        (r["doc_id_a"], r["doc_id_b"]) for r in df.collect()
    }  # noqa: E731
    assert pairs_of(_banded_near_pairs(sh, kb, kr, 0.8)) == pairs_of(
        _banded_near_pairs(sh, 64, 2, 0.8)
    )


# ----------------------------------------------------- ACF seasonality


def test_acf_detects_a_planted_weekly_cycle(spark, tmp_path):
    """Semantic gate for events_value_acf beyond oracle parity: on a
    synthetic stream with a strong 7-day value cycle, acf at lag 7 must
    dominate the off-cycle lags -- the signal the operator exists to
    surface."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(70):
        v = 1000.0 if d % 7 == 0 else 10.0 + (d % 3)
        rows.append((d, base + datetime.timedelta(days=d), d, "purchase", v, "{}"))
    src = str(tmp_path / "weekly_events")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{src}/events.parquet")

    out = {
        r["lag"]: r["acf"]
        for r in registry.get("events_value_acf").fn(spark, src).collect()
    }
    assert out[7] > 0.8, out
    assert all(out[7] > out[k] + 0.5 for k in (1, 2, 3, 4, 5, 6)), out


# ------------------------------------------- capped-pairs exactness property


def test_capped_pairs_values_exact_under_forced_hot_shingles(spark, monkeypatch):
    """Property pinned for the round-8 one-groupBy rewrite of
    _capped_exact_pairs: with the cap forced tiny (so several shingles go
    hot and the add-back path actually runs), every surfaced pair's
    (c, na, nb) must equal the brute-force full-set values, and the
    surfaced pair set must be exactly the pairs sharing at least one
    NON-hot shingle (hot-only pairs never surface -- the documented
    recall-only bias)."""
    import itertools
    import random

    from change_data_capture_service_spark.operators import dedup as D

    monkeypatch.setattr(D, "JACCARD_DF_CAP", 2)
    rng = random.Random(813)
    vocab = [f"s{i}" for i in range(12)]
    for trial in range(4):
        docs = {
            i: set(rng.sample(vocab, rng.randint(2, 7))) for i in range(10)
        }
        sh = spark.createDataFrame(
            [(i, sorted(s)) for i, s in docs.items()],
            "doc_id long, shingles array<string>",
        )
        got = {
            (r["doc_id_a"], r["doc_id_b"]): (r["c"], r["na"], r["nb"])
            for r in D._capped_exact_pairs(sh).collect()
        }
        df = {}
        for s in vocab:
            df[s] = sum(1 for d in docs.values() if s in d)
        cold = {s for s in vocab if df[s] <= 2}
        assert any(df[s] > 2 for s in vocab), "fixture never went hot; weaken rng"
        want_pairs = {
            (a, b)
            for a, b in itertools.combinations(sorted(docs), 2)
            if docs[a] & docs[b] & cold
        }
        assert set(got) == want_pairs, (trial, set(got) ^ want_pairs)
        for (a, b), (c, na, nb) in got.items():
            assert c == len(docs[a] & docs[b]), (trial, a, b)  # hot INCLUDED
            assert na == len(docs[a]) and nb == len(docs[b])


# ----------------------------------------------- numpy cross-checks (r8 stats)


def test_kruskal_wallis_matches_numpy_reference(spark, sf_dir):
    """Tie-corrected H recomputed from scratch in numpy (midranks via
    scipy-free rankdata) on the same fixture must match the engine's
    closed form to 1e-6."""
    import numpy as np

    from change_data_capture_service_spark.catalog import load_table

    pdf = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS grp",
            "try_cast(try_cast(o_totalprice AS decimal(18,2)) * 100 AS bigint) AS c",
        )
        .where("c IS NOT NULL")
        .toPandas()
    )
    vals = pdf["c"].to_numpy()
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals), dtype=float)
    sv = vals[order]
    i = 0
    pos = 1
    tie3 = 0.0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        m = j - i
        ranks[order[i:j]] = pos + (m - 1) / 2.0
        tie3 += m**3 - m
        pos += m
        i = j
    n = len(vals)
    groups = pdf.assign(rank=ranks).groupby("grp")["rank"]
    h = 12.0 / (n * (n + 1)) * sum(
        g.sum() ** 2 / len(g) for _, g in groups
    ) - 3 * (n + 1)
    h /= 1 - tie3 / (n**3 - n)

    row = registry.get("orders_kruskal_wallis_priority").fn(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["dof"] == pdf["grp"].nunique() - 1
    assert abs(row["h"] - h) < 1e-4, (row["h"], h)


def test_acf_matches_numpy_reference(spark, sf_dir):
    """The n^2-multiplied integer estimator must equal the textbook float
    form computed in numpy on the same daily series."""
    import numpy as np

    from change_data_capture_service_spark.catalog import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "date_trunc('day', ts) AS day",
            "try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint) AS x",
        )
        .where("x IS NOT NULL")
        .groupBy("day")
        .agg(F.sum("x").alias("x"))
        .orderBy("day")
        .toPandas()
    )
    days = daily["day"].to_numpy()
    xs = daily["x"].to_numpy(dtype=float)
    mu = xs.mean()
    den = ((xs - mu) ** 2).sum()
    by_day = dict(zip(days, xs))
    got = {
        r["lag"]: (r["acf"], r["n_pairs"])
        for r in registry.get("events_value_acf").fn(spark, sf_dir).collect()
    }
    one_day = np.timedelta64(1, "D") if days.dtype.kind == "M" else None
    for lag in range(1, 8):
        num = 0.0
        n_pairs = 0
        for d, x in by_day.items():
            prev = d - (one_day * lag if one_day is not None else pd.Timedelta(days=lag))
            if prev in by_day:
                num += (x - mu) * (by_day[prev] - mu)
                n_pairs += 1
        ref = num / den
        acf, np_engine = got[lag]
        assert np_engine == n_pairs, (lag, np_engine, n_pairs)
        assert abs(acf - ref) < 1e-5, (lag, acf, ref)
