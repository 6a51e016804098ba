"""Curation operators: decontamination, incremental dedup, mixture
sampling -- semantic invariants beyond the DuckDB hash parity the driver
checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry

registry.load_all()


def test_decontaminate_flags_only_training_docs(spark, sf_dir):
    rows = registry.get("decontaminate_ngram").fn(spark, sf_dir).collect()
    assert rows, "fixture plants near-dup pairs; some must cross the benchmark split"
    for r in rows:
        assert r["doc_id"] % 20 != 0  # benchmark docs are never flagged
        assert r["n_hit_shingles"] >= 1


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir):
    from change_data_capture_service_spark.plans import inspect as P

    df = registry.get("decontaminate_ngram").fn(spark, sf_dir)
    assert P.uses_broadcast_join(df), "benchmark shingle set must broadcast"


def test_dedup_incremental_is_new_and_unseen(spark, sf_dir):
    df = registry.get("dedup_incremental").fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(r["doc_id"] >= 400 for r in rows)
    # survivors are unique by content
    shas = [r["content_sha"] for r in rows]
    assert len(shas) == len(set(shas))
    # no survivor's content exists in the seen (doc_id < 400) corpus
    from change_data_capture_service_spark.catalog import load_table

    seen = {
        r["s"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(F.sha2("text", 256).alias("s"))
        .collect()
    }
    assert not (set(shas) & seen)


def test_sample_token_mixture_respects_budgets(spark, sf_dir):
    df = registry.get("sample_token_mixture").fn(spark, sf_dir)
    budgets = {"en": 4000, "de": 2000, "es": 2000, "fr": 1500, "zh": 1500}
    per_lang = {
        r["lang"]: r["m"]
        for r in df.groupBy("lang").agg(F.max("cum_tokens").alias("m")).collect()
    }
    assert per_lang, "every lang has sub-budget docs in the fixture"
    for lang, used in per_lang.items():
        assert used <= budgets[lang], f"{lang} overfilled: {used}"
