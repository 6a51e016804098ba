"""Invariant gates for the round-7 third-batch operators: Poisson-
bootstrap CI, bucketed LSN-gap detection, URL canonicalization dedup,
code-vs-prose profiling, Matryoshka truncation recall, the curation
funnel, the LSH (b, r) tuning curve, quality-gate agreement kappa,
exact Wasserstein-1, Theil-Sen robust trend, and the ABC x XYZ matrix.

Cross-engine value parity is covered by test_oracle_parity (all of
these register DuckDB oracles); these pin the SEMANTIC properties an
oracle twin cannot: the bootstrap weight distribution against the
Poisson(1) pmf and CI coverage of the point estimate, exact recovery
of planted LSN holes / planted duplicates / planted code corpora
against independent python reimplementations, conservation and
monotonicity laws, and numpy cross-checks of the EMD integral and the
median-of-slopes fit.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.catalog import load_table

registry.load_all()


def _df(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir).toPandas()


# ------------------------------------------------- bootstrap CI


def test_bootstrap_ci_brackets_mean_and_weights_are_poisson(spark, sf_dir):
    out = _df(spark, sf_dir, "events_bootstrap_ci_value")
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_replicates"] == 200
    assert r["boot_se"] > 0
    # percentile CI must bracket the observed mean for this (mild) data
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    # and be roughly +-2 SE wide (percentile vs normal agree loosely)
    width = r["ci_hi"] - r["ci_lo"]
    assert 2 * r["boot_se"] < width < 8 * r["boot_se"]


def test_bootstrap_weight_thresholds_match_poisson_pmf():
    # the md5 two-hex-char thresholds encode Poisson(1) at 1/256 grain
    import math

    bands = {0: 0x5E, 1: 0xBC - 0x5E, 2: 0xEB - 0xBC, 3: 0xFB - 0xEB, 4: 0x100 - 0xFB}
    assert sum(bands.values()) == 256
    for k in range(4):
        pmf = math.exp(-1) / math.factorial(k)
        assert abs(bands[k] / 256 - pmf) < 0.005, k


# ------------------------------------------------- LSN gap detection


def test_lsn_gap_detection_recovers_planted_holes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id").toPandas()
    ids = sorted(ev["event_id"].tolist())

    def dropped(i: int) -> bool:
        return hashlib.md5(str(i).encode()).hexdigest()[:2] >= "f8"

    alive = [i for i in ids if not dropped(i)]
    interior = [i for i in ids if dropped(i) and alive[0] < i < alive[-1]]

    out = _df(spark, sf_dir, "cdc_lsn_gap_detection")
    # every hole strictly inside the observed LSN span is found, exactly
    assert int(out["missing_within"].sum() + out["missing_before"].sum()) == len(
        interior
    )
    # bucket spans never overlap and cover only alive LSNs
    out = out.sort_values("bucket").reset_index(drop=True)
    assert (out["lsn_lo"] <= out["lsn_hi"]).all()
    assert (out["present"] <= out["lsn_hi"] - out["lsn_lo"] + 1).all()
    for i in range(1, len(out)):
        assert out.loc[i, "lsn_lo"] > out.loc[i - 1, "lsn_hi"]


# ------------------------------------------------- URL canonical dedup


def test_url_canonical_dedup_conservation(spark, sf_dir):
    out = _df(spark, sf_dir, "docs_url_canonical_dedup")
    assert (out["n_canonical"] <= out["n_distinct_raw"]).all()
    assert (out["n_distinct_raw"] <= out["n_urls"]).all()
    assert out["alias_rate"].between(0, 1).all()
    # the synthesized variants genuinely alias somewhere
    assert (out["alias_rate"] > 0).any()


# ------------------------------------------------- code/prose profile

_CODE_DOC = (
    "import os\n"
    "def main(argv):\n"
    "    total = 0;\n"
    "    for i in range(10):\n"
    "        total += i * 2;\n"
    "    return total\n"
    "class Config:\n"
    "    pass\n"
)
_PROSE_DOC = (
    "The morning light settled over the harbor town.\n"
    "Fishermen hauled their nets while gulls wheeled overhead.\n"
    "Nothing about the day suggested what was to come.\n"
)


def test_code_prose_profile_discriminates_planted_code(spark, tmp_path):
    rows = []
    for i in range(8):
        rows.append((i, _CODE_DOC, "en", "code_src", len(_CODE_DOC)))
    for i in range(8, 16):
        rows.append((i, _PROSE_DOC, "en", "prose_src", len(_PROSE_DOC)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    scratch = str(tmp_path / "corpus")
    spark.createDataFrame(pdf).write.parquet(f"{scratch}/documents.parquet")

    out = _df(spark, scratch, "text_code_prose_profile").set_index("source")
    assert out.loc["code_src", "n_code_like"] == 8
    assert out.loc["prose_src", "n_code_like"] == 0
    assert (
        out.loc["code_src", "avg_code_line_ratio"]
        > out.loc["prose_src", "avg_code_line_ratio"] + 0.5
    )
    assert (
        out.loc["code_src", "avg_symbol_density"]
        > out.loc["prose_src", "avg_symbol_density"]
    )


def test_code_prose_profile_total_on_empty_doc(spark, tmp_path):
    pdf = pd.DataFrame(
        [(0, "", "en", "s", 0), (1, None, "en", "s", 0)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    scratch = str(tmp_path / "corpus2")
    spark.createDataFrame(pdf).write.parquet(f"{scratch}/documents.parquet")
    out = _df(spark, scratch, "text_code_prose_profile")
    assert len(out) == 1  # no crash, NULL-safe denominators


# ------------------------------------------------- truncation recall


def test_truncation_recall_baseline_is_perfect_and_bounded(spark, sf_dir):
    out = _df(spark, sf_dir, "embedding_truncation_recall").set_index("dims")
    assert set(out.index) == {16, 32, 64}
    # the full-dimension run IS the baseline: recall must be exactly 1
    assert out.loc[64, "avg_recall"] == 1.0
    assert out.loc[64, "min_recall"] == 1.0
    assert out["avg_recall"].between(0, 1).all()
    assert (out["min_recall"] <= out["avg_recall"]).all()
    assert (out["n_queries"] == out.loc[64, "n_queries"]).all()
    # untrained-for-truncation embeddings must lose recall when cut 4x
    assert out.loc[16, "avg_recall"] < 1.0


# ------------------------------------------------- curation funnel


def test_curation_funnel_is_monotone_and_conserves(spark, sf_dir):
    out = (
        _df(spark, sf_dir, "docs_curation_funnel")
        .sort_values("stage")
        .reset_index(drop=True)
    )
    assert list(out["stage"]) == [
        "stage0_raw",
        "stage1_lang",
        "stage2_length",
        "stage3_wordlen",
        "stage4_exact_dedup",
    ]
    # cumulative gates: each stage keeps a subset of the previous one
    assert (out["n_docs"].diff().dropna() <= 0).all()
    assert (out["n_tokens"].diff().dropna() <= 0).all()
    assert out.loc[0, "pct_docs"] == 1.0
    assert (out["pct_docs"].between(0, 1)).all()


def test_curation_funnel_dedup_stage_bites_on_planted_dups(spark, tmp_path):
    text = " ".join(["cats dogs runs fast"] * 15)  # 60 toks, mwl 4.0 in-band
    rows = [(i, text, "en", "s", len(text)) for i in range(6)]  # 6 exact dups
    rows += [(10 + i, text + f" unique{i}", "en", "s", 0) for i in range(4)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    scratch = str(tmp_path / "dups")
    spark.createDataFrame(pdf).write.parquet(f"{scratch}/documents.parquet")
    out = _df(spark, scratch, "docs_curation_funnel").set_index("stage")
    assert out.loc["stage3_wordlen", "n_docs"] == 10
    assert out.loc["stage4_exact_dedup", "n_docs"] == 5  # 6 dups -> 1 survivor


# ------------------------------------------------- LSH tuning curve


def test_lsh_tuning_curve_matches_closed_form_and_orders(spark, sf_dir):
    out = _df(spark, sf_dir, "dedup_lsh_tuning_curve").set_index(
        ["bands", "rows_per_band"]
    )
    assert set(out.index) == {(64, 2), (32, 4), (16, 8), (8, 16)}
    # every config scores the same pair population
    assert out["n_pairs_scored"].nunique() == 1
    # probabilities are probabilities
    assert (out["expected_candidates"] <= out["n_pairs_scored"]).all()
    assert out["expected_recall_at_08"].between(0, 1).all()
    # the S-curve monotonicity that makes the knee visible: lowering r
    # (with b*r = 128 fixed) can only ADD candidates and recall
    assert (
        out.loc[(64, 2), "expected_candidates"]
        >= out.loc[(32, 4), "expected_candidates"]
        >= out.loc[(16, 8), "expected_candidates"]
        >= out.loc[(8, 16), "expected_candidates"]
    )
    assert (
        out.loc[(64, 2), "expected_recall_at_08"]
        >= out.loc[(8, 16), "expected_recall_at_08"]
    )


# ------------------------------------------------- gate agreement kappa


def test_gate_kappa_bounds_and_planted_agreement(spark, sf_dir, tmp_path):
    out = _df(spark, sf_dir, "quality_gate_agreement_kappa")
    assert len(out) == 3
    assert (out["observed_agreement"].between(0, 1)).all()
    assert (out["kappa"].dropna().between(-1, 1)).all()

    # planted corpus: half the docs are rich prose that PASSES all gates,
    # half are one-token spam that FAILS all gates -> kappa == 1 pairwise
    good = (
        "the cat and the dog ran to the old barn and it was dark so "
        "they sat by the door and the owl kept watch over the yard "
        "while a cold wind came in from the north and the rain began"
    )
    bad = " ".join(["spam"] * 40)
    rows = [(i, good + f" tail{i}", "en", "s", 0) for i in range(10)]
    rows += [(100 + i, bad, "en", "s", 0) for i in range(10)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    scratch = str(tmp_path / "kappa")
    spark.createDataFrame(pdf).write.parquet(f"{scratch}/documents.parquet")
    planted = _df(spark, scratch, "quality_gate_agreement_kappa")
    assert (planted["kappa"] == 1.0).all()
    assert (planted["observed_agreement"] == 1.0).all()


# ------------------------------------------------- EMD + Theil-Sen


def test_emd_matches_independent_numpy_integral(spark, sf_dir):
    import numpy as np

    out = _df(spark, sf_dir, "events_value_emd_weekend").iloc[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .selectExpr(
            "try_cast(try_cast(value AS decimal(18,2)) * 100 AS bigint) AS v",
            "dayofweek(ts) IN (1, 7) AS wkd",
        )
        .toPandas()
        .dropna(subset=["v"])
    )
    we = np.sort(ev.loc[ev["wkd"], "v"].to_numpy())
    wd = np.sort(ev.loc[~ev["wkd"], "v"].to_numpy())
    grid = np.unique(np.concatenate([we, wd]))
    f1 = np.searchsorted(we, grid, side="right") / len(we)
    f2 = np.searchsorted(wd, grid, side="right") / len(wd)
    emd_ref = float(np.sum(np.abs(f1[:-1] - f2[:-1]) * np.diff(grid))) / 100
    assert out["n_we"] == len(we) and out["n_wd"] == len(wd)
    assert abs(out["emd_value"] - emd_ref) < 1e-4
    assert out["emd_value"] >= 0


def test_theilsen_matches_independent_numpy_median_of_slopes(spark, sf_dir):
    import numpy as np

    out = _df(spark, sf_dir, "lineitem_theilsen_price_trend").iloc[0]
    m = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "date_trunc('month', l_shipdate) AS mon",
            "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) AS p",
        )
        .toPandas()
        .dropna(subset=["p"])
        .groupby("mon")["p"]
        .mean()
        .sort_index()
        .to_numpy()
        / 100.0
    )
    y = np.round(m, 6)
    x = np.arange(len(y))
    slopes = [
        (y[j] - y[i]) / (j - i) for i in range(len(y)) for j in range(i + 1, len(y))
    ]
    slope_ref = float(np.median(np.round(slopes, 6)))
    assert out["n_months"] == len(y)
    assert out["n_pairs"] == len(slopes)
    assert abs(out["slope"] - slope_ref) < 1e-5
    ic_ref = float(np.median(np.round(y - out["slope"] * x, 6)))
    assert abs(out["intercept"] - ic_ref) < 1e-5


# ------------------------------------------------- ABC x XYZ matrix


def test_abc_xyz_matrix_conserves_parts_and_revenue(spark, sf_dir):
    out = _df(spark, sf_dir, "part_abc_xyz_matrix")
    n_parts_total = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert out["n_parts"].sum() == n_parts_total
    assert abs(out["revenue_share"].sum() - 1.0) < 1e-4
    assert set(out["abc"]) <= {"A", "B", "C"}
    assert set(out["xyz"]) <= {"X", "Y", "Z"}
    # ABC is a revenue ranking: A cells must out-earn C cells in total
    by_abc = out.groupby("abc")["revenue_share"].sum()
    if {"A", "C"} <= set(by_abc.index):
        assert by_abc["A"] > by_abc["C"]


# ------------------------------------------------- rapid-repeat + MK


def test_rapid_repeat_audit_pairs_are_valid(spark, sf_dir):
    out = _df(spark, sf_dir, "orders_rapid_repeat_audit")
    assert len(out) > 0
    assert (out["orderkey_a"] < out["orderkey_b"]).all()
    assert out["days_apart"].between(0, 30).all()
    assert out["amount_ratio"].between(0.9, 1.0).all()
    import numpy as np

    assert np.allclose(
        out["amount_ratio"],
        np.round(
            np.minimum(out["amount_a"], out["amount_b"])
            / np.maximum(out["amount_a"], out["amount_b"]),
            6,
        ),
        atol=1e-4,
    )


def test_mann_kendall_matches_independent_python(spark, sf_dir):
    out = _df(spark, sf_dir, "lineitem_price_mann_kendall").iloc[0]
    import math

    from fractions import Fraction

    m = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "date_trunc('month', l_shipdate) AS mon",
            "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) AS p",
        )
        .toPandas()
        .dropna(subset=["p"])
        .groupby("mon")["p"]
        .agg(["sum", "count"])
        .sort_index()
    )
    rates = [Fraction(int(s), int(n)) for s, n in zip(m["sum"], m["count"])]
    s_stat = sum(
        (rates[j] > rates[i]) - (rates[j] < rates[i])
        for i in range(len(rates))
        for j in range(i + 1, len(rates))
    )
    assert out["s"] == s_stat
    n = len(rates)
    var = n * (n - 1) * (2 * n + 5) / 18
    z_ref = (s_stat - (1 if s_stat > 0 else -1 if s_stat < 0 else 0)) / math.sqrt(var) if s_stat != 0 else 0.0
    assert abs(out["z"] - round(z_ref, 6)) < 1e-6
    assert out["n_pairs"] == n * (n - 1) // 2
