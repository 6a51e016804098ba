"""Retrieval serving end-to-end: lexical rank -> feedback expansion ->
vector diversification -> snippets, the way a RAG retrieval tier chains
the engine's search/similarity operators.

    python examples/retrieval_pipeline.py

1. BM25 top-20 for the seed term query (postings-probe scan shape);
2. pseudo-relevance feedback: expansion terms mined from the top-10
   feedback docs re-rank the corpus (search_prf_expansion) -- the
   recall-repair pass;
3. MMR diversification over the exact cosine shortlist
   (knn_mmr_diversified): redundancy-penalized top-5 per query vector;
4. best-window snippets for the matched docs
   (search_snippet_best_window) -- what the UI renders.

Every stage is a registered, driver-checked operator; this script only
composes them and prints the stage outputs side by side so the effect of
each pass is visible (expansion changes the tail of the ranking, MMR
swaps near-duplicate neighbors for diverse ones).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="retrieval-pipeline", master="local[8]", shuffle_partitions=8)
    registry.load_all()

    seed = registry.get("search_bm25").fn(spark, SF).collect()
    print(f"1. BM25 top-{len(seed)} (seed terms):")
    for r in seed[:5]:
        print(f"   doc {r['doc_id']:>6}  score {r['score']:.4f}  terms {r['n_terms_hit']}")

    prf = registry.get("search_prf_expansion").fn(spark, SF).collect()
    seed_ids = {r["doc_id"] for r in seed}
    new_ids = [r["doc_id"] for r in prf if r["doc_id"] not in seed_ids]
    print(f"\n2. PRF re-rank: {len(prf)} results, {len(new_ids)} docs the seed query missed: {new_ids[:8]}")

    mmr = registry.get("knn_mmr_diversified").fn(spark, SF).collect()
    exact = registry.get("knn_cosine_topk").fn(spark, SF).collect()
    top5 = {}
    for r in exact:
        if r["rnk"] <= 5:
            top5.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    swapped = 0
    for r in mmr:
        if r["neighbor_id"] not in top5.get(r["query_id"], set()):
            swapped += 1
    print(f"\n3. MMR top-5 per query vector: {swapped}/{len(mmr)} picks differ from pure-relevance top-5 (diversity swaps)")

    snips = registry.get("search_snippet_best_window").fn(spark, SF).collect()
    print(f"\n4. snippets for {len(snips)} matching docs; densest windows:")
    for r in sorted(snips, key=lambda r: (-r["n_query_hits"], r["doc_id"]))[:3]:
        print(f"   doc {r['doc_id']:>6}  hits {r['n_query_hits']}  \"{r['snippet'][:90]}...\"")


if __name__ == "__main__":
    main()
