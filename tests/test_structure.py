"""Structural guards: the repo-level contracts that nothing else asserts --
examples must at least import (drift in operator signatures breaks them
silently otherwise), and every registered operator documents itself (the
docstring IS the design record the scale review reads)."""

from __future__ import annotations

import importlib.util
import os

from change_data_capture_service_spark import registry

registry.load_all()

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_examples_importable():
    for name in (
        "quickstart",
        "curation_pipeline",
        "replica_operations",
        "warehouse_analytics",
    ):
        path = os.path.join(_ROOT, "examples", f"{name}.py")
        spec = importlib.util.spec_from_file_location(f"examples_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # import-time only; main() never runs
        assert hasattr(mod, "main"), name


def test_every_operator_documents_itself():
    # trivial single-expression ops carry one-liners; the guard is against
    # EMPTY docs, not against brevity
    undocumented = [
        name
        for name, e in registry.entries().items()
        if len((e.fn.__doc__ or "").strip()) < 10
    ]
    assert not undocumented, f"operators missing real docstrings: {undocumented}"


def test_rows_only_set_is_exactly_the_documented_one():
    """COVERAGE.md promises 18 rows-only keys; a new oracle-less key must
    be a deliberate decision, not a forgotten oracle."""
    rows_only = {name for name, e in registry.entries().items() if e.oracle is None}
    assert rows_only == {
        "knn_recall_vs_nprobe_curve",  # ANN recall is probabilistic; monotonicity gate in test_ann_index
        "embedding_pca_pc1",  # iterative eigenproblem; numpy gate in test_northstar
        "multimodal_phash_dedup",  # perceptual hash; planted-pair gate in test_northstar
        "quality_compression_ratio",  # zlib byte output is library-versioned; signal gate in test_quality
        "agg_approx_count_distinct",
        "agg_approx_percentile",
        "dedup_simhash",
        "knn_cosine_ivf",
        "knn_cosine_lsh",
        "knn_cosine_pq",
        "knn_cosine_ivf_pq",
        "knn_cosine_ivf_pq_prebuilt",  # same ANN family; recall+determinism gates in test_ann_index
        "agg_hll_rollup",
        "multimodal_frame_sample",
        "approx_topk",
        "dedup_lsh_bucket_stats",
        "knn_recall_eval",
        "dedup_minhash_estimate_quality",
        "graph_kcore",  # iterative peeling; exact core numbers pinned in test_round14_ops
        "graph_label_propagation",  # iterative LPA; constructed-graph gates in test_round15_ops
        "graph_betweenness_brandes",  # iterative Brandes; closed-form gates in test_round15_ops
        "knn_mmr_diversified",  # greedy rounds; redundancy-skip gate in test_round15_ops
        "ann_index_cell_balance_profile",  # reads an engine-built index artifact; balanced-vs-skewed gate in test_ann_index
        "ann_index_residual_energy_profile",  # reads an engine-built index artifact; tight-vs-diffuse gate in test_round17_ops
        "events_changepoint_pelt",  # pruned DP has no SQL twin; planted-break gates in test_round17_ops
        "graph_ktruss",  # iterative truss peeling (kcore contract); clique/bowtie gates in test_round17_ops
        "sample_kcenter_coreset",  # greedy farthest-point traversal; planted-cluster gates in test_round17_ops
    }, rows_only


def test_catalog_md_is_in_sync_with_registry():
    """CATALOG.md is GENERATED from the registry (scripts/gen_catalog.py);
    an operator that lands without regenerating it fails here, so the
    user-facing catalog can never drift from registry.queries()."""
    import importlib
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    try:
        gen = importlib.import_module("gen_catalog")
    finally:
        sys.path.pop(0)
    with open(os.path.join(root, "CATALOG.md")) as f:
        on_disk = f.read()
    assert on_disk == gen.render(), (
        "CATALOG.md is stale: run `python scripts/gen_catalog.py`"
    )


def test_docstring_constants_match_code():
    """Docstring drift guard (the round-8 ADVICE class): numeric claims
    that restate tuning constants must equal the code. Covers the ANN
    rerank shortlist multiplier (every '<N>*top_k' mention must match the
    single `shortlist = N * top_k` assignment) and the dedup/graph cap
    constants quoted by value anywhere in their modules."""
    import inspect
    import re

    from change_data_capture_service_spark.operators import ann_index, dedup, graph

    src = inspect.getsource(ann_index)
    assign = re.search(r"shortlist = (\d+) \* top_k", src)
    assert assign, "shortlist assignment moved; update this test"
    n = assign.group(1)
    mentions = re.findall(r"(\d+)\s*[*x·]\s*top_k", src)
    assert mentions and set(mentions) == {n}, (
        f"docstrings mention shortlist multipliers {set(mentions)} but code uses {n}"
    )

    # caps restated by value: 'df > <N>' prose in dedup must equal
    # JACCARD_DF_CAP; 'deg(z) <= <N>' style in graph must equal AA_HUB_CAP
    dsrc = inspect.getsource(dedup)
    for m in re.findall(r"df > (\d+)", dsrc):
        assert int(m) == dedup.JACCARD_DF_CAP
    gsrc = inspect.getsource(graph)
    for m in re.findall(r"deg\(z\)[^.\n]{0,20}?(\d{2,})", gsrc):
        assert int(m) == graph.AA_HUB_CAP
