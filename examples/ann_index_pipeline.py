"""Persisted ANN index end-to-end: build once, serve many query batches.

    python examples/ann_index_pipeline.py

1. build the IVF-PQ index from the embeddings table into a directory
   (coarse k-means cells + residual PQ codebooks + per-vector codes
   hive-partitioned by cell) -- the one-time distributed pass;
2. answer a query batch from the index (partition-pruned cell probes,
   ADC scoring, exact rerank of the shortlist only) -- the steady-state
   per-batch cost, a fraction of the inline re-fit path;
3. measure recall against the exact brute-force baseline;
4. show the staleness signal: after the corpus grows, the index meta's
   row count diverges from the live count -- the rebuild trigger.

Every stage is the registered operator surface (`operators/ann_index.py`,
`knn_cosine_ivf_pq_prebuilt`); this script only composes it the way a
retrieval service would.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.operators.ann_index import (
    build_ann_index,
    extend_ann_index,
    index_meta,
    query_ann_index,
)
from change_data_capture_service_spark.operators.similarity import _vectors
from change_data_capture_service_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="ann-index-example")
    registry.load_all()
    index_dir = tempfile.mkdtemp(prefix="ann_example_")
    try:
        vec = _vectors(spark, SF).localCheckpoint()

        print("1. build: fit + encode + persist (the one-time pass)")
        t0 = time.perf_counter()
        meta = build_ann_index(spark, vec, index_dir=index_dir)
        print(f"   built in {time.perf_counter() - t0:.2f}s: "
              f"{meta['n_vectors']} vectors, {meta['n_cells']} cells, "
              f"{meta['m']}x{meta['ksub']} residual codebooks")
        cells = len([d for d in os.listdir(f"{index_dir}/codes")
                     if d.startswith("cell=")])
        print(f"   codes partitioned into {cells} cell directories "
              f"(queries prune to their probed cells)")

        print("2. query batch from the index (steady-state cost)")
        queries = vec.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        t0 = time.perf_counter()
        hits = query_ann_index(spark, queries, vec, index_dir=index_dir).collect()
        print(f"   answered {len(set(r['query_id'] for r in hits))} queries "
              f"x top-{max(r['rnk'] for r in hits)} in "
              f"{time.perf_counter() - t0:.2f}s")

        print("3. recall vs the exact brute-force baseline")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in registry.get("knn_cosine_topk").fn(spark, SF).collect()
        }
        got = {(r["query_id"], r["neighbor_id"]) for r in hits}
        print(f"   recall@10 = {len(exact & got) / len(exact):.2f}")

        print("4. staleness + delta-index: the corpus grows, the index catches up")
        delta = vec.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "v", "nrm"
        ).limit(100).localCheckpoint()
        grown = vec.unionByName(delta)
        live, indexed = grown.count(), index_meta(index_dir)["n_vectors"]
        print(f"   live corpus = {live} rows, index covers {indexed} "
              f"({live - indexed} unindexed)")
        meta2 = extend_ann_index(spark, delta, index_dir=index_dir)
        print(f"   extend_ann_index encoded the delta with the EXISTING "
              f"quantizers -> index now covers {meta2['n_vectors']} "
              f"(re-cluster only when recall drifts)")
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
