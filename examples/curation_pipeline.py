"""End-to-end training-corpus curation: the north-star operators chained
the way a 100 TB pre-training data pipeline chains them.

    python examples/curation_pipeline.py

1. exact dedup (hash-groupBy)
2. near-dup clustering: MinHash-LSH pairs -> connected components ->
   keep one representative per cluster
3. quality + language filtering (heuristic scores, stopword lang-ID)
4. deterministic held-out split (md5-threshold sampling), then
   benchmark decontamination of the training split (8-gram overlap)
5. token-budget sequence packing per language stratum
6. range-clustered write of the final corpus

Every stage is a registered, oracle-checked operator (COVERAGE.md); this
script only composes them. Stage counts print as a funnel so the data-loss
profile is visible — at scale the same funnel is the first thing a curation
run reports.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.operators.dedup import connected_components, dedup_minhash_near
from change_data_capture_service_spark.session import get_spark
from change_data_capture_service_spark.sources.files import write_clustered

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="curation-pipeline", master="local[8]", shuffle_partitions=8)
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()

    # 1. exact dedup on content
    docs = docs.dropDuplicates(["text"])
    n1 = docs.count()

    # 2. near-dup clusters (>=0.8 shingle-jaccard) -> drop all but the
    #    min-doc_id representative of each cluster. At 100 TB, PLAN the
    #    LSH config first (the S-curve tuning table says what each
    #    (bands, rows) choice costs in candidate verifications and buys
    #    in recall), then price the candidate join: the band census
    #    predicts its size as sum-of-C(bucket,2) and flags the hot
    #    bucket that would turn it quadratic (a run with a skewed census
    #    stops here, not 3 h in).
    from change_data_capture_service_spark.operators.dedup import (
        dedup_lsh_bucket_stats,
        dedup_lsh_tuning_curve,
    )

    for row in dedup_lsh_tuning_curve(spark, SF).orderBy("rows_per_band").collect():
        print(
            f"LSH plan: b={row.bands:>2} r={row.rows_per_band:>2}  "
            f"expected candidates {row.expected_candidates:>8.1f}  "
            f"recall@0.8 {row.expected_recall_at_08}"
        )

    census = dedup_lsh_bucket_stats(spark, SF)
    n_cand = census.agg(F.sum("candidate_pairs")).collect()[0][0]
    max_bucket = census.agg(F.max("max_bucket")).collect()[0][0]
    print(f"LSH census: {n_cand} candidate pairs, hottest bucket {max_bucket}")

    pairs = dedup_minhash_near(spark, SF).select("doc_id_a", "doc_id_b")
    clusters = connected_components(pairs)
    non_representatives = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = docs.join(non_representatives, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality + language gate (same heuristics as text_quality_score /
    #    text_lang_id, inlined as filters)
    n_tokens = F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
    digit_ratio = F.length(F.regexp_replace("text", "[^0-9]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    docs = docs.filter((F.length("text") > 0) & (n_tokens >= 5) & (digit_ratio < 0.3))
    n3 = docs.count()

    # 3b. repetition + entropy gates (round-4 signals): drop template/spam
    #     shaped docs the length filters miss. Both are doc-keyed
    #     explode/agg operators; here their outputs join back as gates.
    from change_data_capture_service_spark.operators.quality import (
        text_entropy,
        text_repetition,
    )

    rep = text_repetition(spark, SF).filter(
        (F.col("top_word_frac") <= 0.20) & (F.col("dup_bigram_frac") <= 0.90)
    ).select("doc_id")
    ent = text_entropy(spark, SF).filter(F.col("entropy") >= 2.0).select("doc_id")
    docs = docs.join(rep, "doc_id", "left_semi").join(ent, "doc_id", "left_semi")
    n3b = docs.count()

    # 3c. perplexity gate (round-5): score every doc against the corpus's
    #     own unigram LM and drop the worst 5% -- the CCNet-style filter;
    #     the cutoff is a single broadcast scalar from the score relation.
    from change_data_capture_service_spark.operators.quality import (
        quality_perplexity_unigram,
    )

    ppl = quality_perplexity_unigram(spark, SF)
    cutoff = ppl.agg(F.expr("percentile(cross_entropy, 0.95)").alias("p95"))
    keep = (
        ppl.crossJoin(F.broadcast(cutoff))
        .filter(F.col("cross_entropy") <= F.col("p95"))
        .select("doc_id")
    )
    docs = docs.join(keep, "doc_id", "left_semi")
    n3c = docs.count()

    # 4. deterministic ~10% held-out split: same rows on ANY cluster/run
    digest = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    heldout = docs.filter(digest < "1a")
    train = docs.filter(digest >= "1a")
    n4h, n4t = heldout.count(), train.count()

    # 4b. decontaminate: drop training docs sharing any word 8-gram with
    #     the held-out split (the benchmark-overlap check, broadcast side =
    #     the small held-out shingle set)
    def shingles8(df):
        toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        idx = F.sequence(F.lit(0), F.size(toks) - 8)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(8)]
            ),
        )
        return df.filter(F.size(toks) >= 8).select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
        )

    bench_shingles = shingles8(heldout).select("shingle").distinct()
    contaminated = (
        shingles8(train)
        .join(F.broadcast(bench_shingles), "shingle")
        .select("doc_id")
        .distinct()
    )
    train = train.join(contaminated, "doc_id", "left_anti")
    n4c = train.count()

    # 4c. mixture plan (round-5): temperature-scaled source weights over
    #     the SURVIVING training split (alpha=0.5 via sqrt) -- the sampling
    #     plan a trainer consumes next to the packed shards
    tok_counts = train.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")))
        .cast("bigint")
        .alias("n_tokens")
    )
    wts = tok_counts.select(
        "source", "n_tokens", F.sqrt(F.col("n_tokens").cast("double")).alias("w")
    )
    mixture = (
        wts.crossJoin(F.broadcast(wts.agg(F.sum("w").alias("wtot"))))
        .select("source", "n_tokens", F.round(F.col("w") / F.col("wtot"), 4).alias("weight"))
        .orderBy(F.col("weight").desc())
    )

    # 5. pack the training split into 2048-token sequences per language
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.size(F.split(F.trim(F.col("text")), " ")).cast("long")
    packed = train.select(
        "doc_id",
        "lang",
        "text",
        F.floor((F.sum(toks).over(w) - toks) / F.lit(2048.0)).alias("pack_id"),
    )
    n_packs = packed.select("lang", "pack_id").distinct().count()

    # 6. range-clustered write: files own disjoint (lang, pack_id) ranges,
    #    so a trainer reading one shard prunes everything else
    out = tempfile.mkdtemp(prefix="corpus-")
    write_clustered(packed, f"{out}/train", ["lang", "pack_id"], num_files=4)

    print(f"input docs           : {n0}")
    print(f"after exact dedup    : {n1}  (-{n0 - n1})")
    print(f"after near-dup drop  : {n2}  (-{n1 - n2})")
    print(f"after quality gate   : {n3}  (-{n2 - n3})")
    print(f"after rep/entropy    : {n3b}  (-{n3 - n3b})")
    print(f"after perplexity gate: {n3c}  (-{n3b - n3c})")
    print(f"held-out / train     : {n4h} / {n4t}")
    print(f"after decontaminate  : {n4c}  (-{n4t - n4c})")
    print("mixture plan (alpha=0.5):")
    for r in mixture.limit(5).collect():
        print(f"  {r['source']:12s} {r['n_tokens']:>9d} tokens  weight {r['weight']}")
    print(f"packed sequences     : {n_packs} packs of <=2048 tokens")
    print(f"clustered corpus at  : {out}/train")

    # the same attrition profile as ONE registered query (lang ->
    # length -> word-length -> exact-dedup gates from a single scan):
    # what a scheduled 100 TB curation run reports without re-running
    # the whole pipeline above
    from change_data_capture_service_spark.operators.curation import docs_curation_funnel

    print("one-query funnel (docs_curation_funnel):")
    for r in docs_curation_funnel(spark, SF).orderBy("stage").collect():
        print(
            f"  {r['stage']:20s} {r['n_docs']:>5d} docs  "
            f"{r['n_tokens']:>7d} tokens  {r['pct_docs']:>6.1%}"
        )


if __name__ == "__main__":
    main()
