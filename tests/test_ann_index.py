"""Persisted ANN index (operators/ann_index.py): build/query split.

Contract: the prebuilt-index query path must (1) keep the same recall and
rerank-exactness bar as the inline knn_cosine_ivf_pq it mirrors, (2) be
DETERMINISTIC at build time -- two builds over the same corpus produce
byte-identical codebooks/centroids/codes (the reason the codebook sample
is TakeOrdered, not a bare limit), (3) lay codes out partitioned by cell
so probes become partition-pruned scans, and (4) expose staleness via the
meta row count. The registered query must also clean its scratch index.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from change_data_capture_service_spark import registry
from change_data_capture_service_spark.operators.ann_index import (
    build_ann_index,
    index_meta,
    query_ann_index,
)
from change_data_capture_service_spark.operators.similarity import (
    N_QUERIES,
    _vectors,
)


def test_prebuilt_recall_and_rerank_exactness(spark, sf_dir):
    """Same bar as test_knn_ivf_pq_recall_and_rerank_exactness: recall
    >= 0.4 vs the exact engine, every overlapping cosine identical (the
    rerank is unquantized), contiguous per-query ranks."""
    exact_rows = registry.get("knn_cosine_topk").fn(spark, sf_dir).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact_rows}
    rows = registry.get("knn_cosine_ivf_pq_prebuilt").fn(spark, sf_dir).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.4, f"prebuilt IVF-PQ recall collapsed: {recall}"
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9, "rerank not exact"
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), q


def test_build_is_deterministic_byte_identical(spark, sf_dir, tmp_path):
    """Two builds over the same corpus must produce byte-identical
    codebooks, centroids, and codes -- the determinism the ordered
    codebook sample buys (a bare limit is plan-dependent)."""
    vec = _vectors(spark, sf_dir).localCheckpoint()
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_ann_index(spark, vec, index_dir=a)
    build_ann_index(spark, vec, index_dir=b)

    def canon(d, sub, cols):
        return sorted(
            tuple(r[c] for c in cols)
            for r in spark.read.parquet(f"{d}/{sub}").collect()
        )

    assert canon(a, "centroids", ["cell", "centroid"]) == canon(
        b, "centroids", ["cell", "centroid"]
    )
    assert canon(a, "codebooks", ["sub", "code", "centroid"]) == canon(
        b, "codebooks", ["sub", "code", "centroid"]
    )
    code_cols = ["vec_id", "cell", "nrm"] + [f"code_{j}" for j in range(8)]
    assert canon(a, "codes", code_cols) == canon(b, "codes", code_cols)


def test_codes_partitioned_by_cell_and_meta_tracks_staleness(spark, sf_dir, tmp_path):
    """The codes table must be hive-partitioned by cell (probes prune to
    their cells' directories) and the meta row count must equal the
    corpus size at build time, diverging as the corpus grows -- the
    staleness signal."""
    vec = _vectors(spark, sf_dir).localCheckpoint()
    idx = str(tmp_path / "idx")
    meta = build_ann_index(spark, vec, index_dir=idx)

    cell_dirs = glob.glob(f"{idx}/codes/cell=*")
    assert len(cell_dirs) >= 2, "codes not partitioned by cell"
    assert len(cell_dirs) <= meta["n_cells"]
    assert meta["n_vectors"] == vec.count()
    assert index_meta(idx)["n_vectors"] == meta["n_vectors"]

    # pruned probe: filtering to one cell reads only that partition's files
    one = int(os.path.basename(cell_dirs[0]).split("=")[1])
    from change_data_capture_service_spark.plans.inspect import executed_metrics

    codes = spark.read.parquet(f"{idx}/codes").filter(F.col("cell") == one)
    codes.collect()
    m = executed_metrics(codes, ("numFiles",))
    files_in_cell = len(glob.glob(f"{cell_dirs[0]}/*.parquet"))
    total_files = len(glob.glob(f"{idx}/codes/cell=*/*.parquet"))
    assert m["numFiles"] == files_in_cell
    assert m["numFiles"] < total_files


def test_query_without_index_raises_and_registered_cleans_scratch(spark, sf_dir, tmp_path):
    import tempfile

    vec = _vectors(spark, sf_dir).localCheckpoint()
    q = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    try:
        query_ann_index(spark, q, vec, index_dir=str(tmp_path / "missing"))
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass

    before = set(glob.glob(f"{tempfile.gettempdir()}/ann_index_*"))
    df = registry.get("knn_cosine_ivf_pq_prebuilt").fn(spark, sf_dir)
    assert df.count() > 0
    assert set(glob.glob(f"{tempfile.gettempdir()}/ann_index_*")) == before


def test_extend_appends_delta_with_existing_quantizers(spark, sf_dir, tmp_path):
    """Delta-index contract: build on half the corpus, extend with the
    other half -- the extended index must answer queries over the WHOLE
    corpus (neighbors from both halves reachable), quantizer artifacts
    must be untouched (a delta never re-clusters), and meta must track
    the true row count. The split index's recall is measured against the
    same exact baseline as the full build."""
    from change_data_capture_service_spark.operators.ann_index import (
        extend_ann_index,
    )

    vec = _vectors(spark, sf_dir).localCheckpoint()
    mid = vec.agg(F.expr("cast(max(vec_id)/2 as long)")).collect()[0][0]
    first, second = vec.filter(F.col("vec_id") <= mid), vec.filter(F.col("vec_id") > mid)
    idx = str(tmp_path / "idx")
    build_ann_index(spark, first, index_dir=idx)

    import hashlib

    def artifact_hash(sub):
        rows = sorted(map(str, spark.read.parquet(f"{idx}/{sub}").collect()))
        return hashlib.md5("\n".join(rows).encode()).hexdigest()

    cents_before = artifact_hash("centroids")
    books_before = artifact_hash("codebooks")
    meta2 = extend_ann_index(spark, second, index_dir=idx)
    assert artifact_hash("centroids") == cents_before
    assert artifact_hash("codebooks") == books_before
    assert meta2["n_vectors"] == vec.count()
    assert index_meta(idx)["n_vectors"] == vec.count()

    q = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    hits = query_ann_index(spark, q, vec, index_dir=idx).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in hits}
    assert any(n > mid for _, n in got), "no delta-half neighbors reachable"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in registry.get("knn_cosine_topk").fn(spark, sf_dir).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.4, f"extended-index recall collapsed: {recall}"


def test_nprobe_curve_is_monotone_and_pays_off(spark, sf_dir):
    """The serving-config planner must show the trade it exists to
    expose: recall@k non-decreasing in n_probe, and probing more than one
    cell must actually buy recall on the fixture (else the curve is
    flat and the op is vacuous)."""
    rows = (
        registry.get("knn_recall_vs_nprobe_curve")
        .fn(spark, sf_dir)
        .orderBy("n_probe")
        .collect()
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8]
    recalls = [r["avg_recall_at_k"] for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] > recalls[0], recalls
    assert all(r["n_queries"] == rows[0]["n_queries"] for r in rows)


def test_index_dir_positional_swap_raises_typeerror(spark, sf_dir):
    """index_dir is keyword-only everywhere with an isinstance guard: the
    historical API took it in DIFFERENT positions (build: 3rd, query:
    2nd), so a positional swap passed a DataFrame where a path belonged.
    Both the keyword-only signature and the runtime type check must
    fire."""
    import pytest

    from change_data_capture_service_spark.operators.ann_index import (
        extend_ann_index,
    )

    vec = _vectors(spark, sf_dir)
    with pytest.raises(TypeError):
        build_ann_index(spark, vec, "/tmp/nope")  # positional: rejected
    with pytest.raises(TypeError, match="filesystem path"):
        build_ann_index(spark, vec, index_dir=vec)  # DataFrame: clear error
    with pytest.raises(TypeError, match="keyword-only"):
        query_ann_index(spark, vec, vec, index_dir=vec)
    with pytest.raises(TypeError):
        extend_ann_index(spark, vec, vec)


def test_extend_in_batches_equals_extend_in_one(spark, sf_dir, tmp_path):
    """Delta-path equivalence at equal n_probe: starting from the same
    base index (same immutable quantizers), extending with the remainder
    in TWO batches answers exactly what extending in ONE batch answers --
    encode is per-row against frozen artifacts, so batch boundaries and
    append order cannot change a neighbor. This is the end-to-end gate
    for build -> extend -> query beyond the recall test above."""
    from change_data_capture_service_spark.operators.ann_index import (
        extend_ann_index,
    )

    vec = _vectors(spark, sf_dir).localCheckpoint()
    hi = vec.agg(F.max("vec_id")).collect()[0][0]
    t1, t2 = hi // 3, 2 * hi // 3
    base = vec.filter(F.col("vec_id") <= t1)
    mid = vec.filter((F.col("vec_id") > t1) & (F.col("vec_id") <= t2))
    rest = vec.filter(F.col("vec_id") > t2)

    one, two = str(tmp_path / "one"), str(tmp_path / "two")
    build_ann_index(spark, base, index_dir=one)
    build_ann_index(spark, base, index_dir=two)
    extend_ann_index(spark, mid.unionByName(rest), index_dir=one)
    extend_ann_index(spark, mid, index_dir=two)
    extend_ann_index(spark, rest, index_dir=two)
    assert index_meta(one)["n_vectors"] == index_meta(two)["n_vectors"] == vec.count()

    q = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    for n_probe in (2, 6):
        a = sorted(map(str, query_ann_index(spark, q, vec, index_dir=one, n_probe=n_probe).collect()))
        b = sorted(map(str, query_ann_index(spark, q, vec, index_dir=two, n_probe=n_probe).collect()))
        assert a == b


def test_hubness_fold_consumes_ann_index_edges(spark, sf_dir, tmp_path):
    """The 10^9-vector contract of knn_hubness_profile, executed: the SAME
    in-degree fold (hubness_from_edges) consumes query_ann_index batches
    as its edge generator and must agree with the all-pairs profile.

    Exactness setup: full probe (n_probe clamped to n_cells) plus
    top_k=17 makes the 30*top_k ADC shortlist (510) cover the whole
    499-candidate corpus, so the exact rerank sees EVERY candidate --
    the index path degenerates to exact kNN by construction, both sides
    round cosines at 6dp with the same vec_id tiebreak, and the
    resulting per-label profiles must be byte-identical (not merely
    close). At production scale only n_probe/shortlist change; the fold
    is untouched."""
    from change_data_capture_service_spark.operators.similarity import (
        hubness_from_edges,
    )

    vec = _vectors(spark, sf_dir).localCheckpoint()
    idx = str(tmp_path / "hub-idx")
    build_ann_index(spark, vec, index_dir=idx)

    queries = vec.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    hits = query_ann_index(
        spark, queries, vec, index_dir=idx, n_probe=10_000, top_k=17
    )
    edges = hits.filter(F.col("rnk") <= 10).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    got = sorted(
        map(str, hubness_from_edges(vec.select("vec_id", "label"), edges, k=10).collect())
    )
    want = sorted(
        map(str, registry.get("knn_hubness_profile").fn(spark, sf_dir).collect())
    )
    assert got == want


def test_cell_balance_profile_balanced_vs_skewed(spark, tmp_path):
    """Closed-form gate for the rows-only ann_index_cell_balance_profile
    key. Cell-size skew geometry: 16 equal-size well-separated clusters
    must profile near-uniform (max_share ~ 1/16, gini ~ 0); the same
    corpus with 85% of mass in ONE tight cluster must report the
    concentration (max_share >= 0.5, gini far from 0). The numbers a
    serving-config review reads before trusting p50 probe cost as the
    p99."""
    import random

    from change_data_capture_service_spark.operators.ann_index import (
        build_ann_index,
        cell_balance_profile,
    )

    rng = random.Random(7)
    dim = 8

    def corpus(sizes):
        rows, vid = [], 0
        for c, n in enumerate(sizes):
            center = [0.0] * dim
            center[c % dim] = 10.0 * (1 + c // dim)  # well-separated axes
            for _ in range(n):
                v = [center[j] + rng.uniform(-0.05, 0.05) for j in range(dim)]
                nrm = sum(x * x for x in v) ** 0.5
                rows.append((vid, v, nrm))
                vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, v array<double>, nrm double"
        )

    balanced = corpus([40] * 16)
    d1 = str(tmp_path / "bal")
    build_ann_index(spark, balanced, index_dir=d1, n_cells=16)
    b = cell_balance_profile(spark, index_dir=d1).collect()[0]
    assert b["n_vectors"] == 640
    assert b["max_share"] <= 0.15, b
    assert b["gini"] <= 0.25, b

    skewed = corpus([544] + [6] * 16)  # 85% of 640 in cluster 0
    d2 = str(tmp_path / "skew")
    build_ann_index(spark, skewed, index_dir=d2, n_cells=16)
    s = cell_balance_profile(spark, index_dir=d2).collect()[0]
    assert s["n_vectors"] == 640
    assert s["max_share"] >= 0.5, s
    assert s["gini"] > b["gini"], (s, b)
    assert s["cv"] > b["cv"], (s, b)
