"""Persisted ANN index: the IVF-PQ build/query split.

``knn_cosine_ivf_pq`` (similarity.py) fits centroids and codebooks inline
on every call -- fine for a one-shot query, wrong for production, where an
index is a durable artifact serving many query batches (the reference's
analogue is the Elasticsearch index its consumer maintains:
``internal/elasticsearch/client.go:8-15``, ``cmd/es_consumer/main.go:77-95``
-- built once by the ingest path, queried many times). This module splits
the two halves:

``build_ann_index(spark, corpus, index_dir=...)`` -- one distributed pass:

* ``centroids/``  -- the IVF coarse quantizer (cell, centroid), k-means
  with a fixed seed;
* ``codebooks/``  -- residual PQ codebooks (sub, code, centroid), trained
  driver-side on an ORDERED 4096-row sample (deterministic: a bare
  ``limit`` is plan-dependent, so a layout change would silently change
  the codebooks; ``TakeOrdered`` on vec_id pins them);
* ``codes/cell=<i>/`` -- per-vector 8 sub-codes + norm, PARTITIONED BY
  CELL, so a query that probes n_probe cells reads exactly those
  partitions' files (parquet partition pruning) -- the on-disk form of
  IVF's "touch n_probe/n_cells of the corpus";
* ``_ANN_META.json`` -- geometry (n_cells, m, ksub, d_sub) + a row count.

``query_ann_index(spark, queries, corpus, index_dir=...)`` -- the read side:
probe the n_probe nearest cells per query, prune the codes scan to the
union of probed cells, ADC-score (per-query LUTs over the codebooks,
q.v = q.c_cell + q.r decomposition per Jegou et al. 2011 IVFADC, public
paper), shortlist 30*top_k rows, exact-rerank against the corpus (raw vectors live
in the corpus table, not the index -- the index stays ~16 bytes/vector).

``extend_ann_index(spark, new_vectors, index_dir=...)`` -- the delta path:
encode ONLY the new vectors with the existing (immutable) quantizers and
append to the cell partitions; re-cluster only when measured recall
drifts.

Queries cost launch latency + pruned code scan + |shortlist| raw-vector
lookups; the k-means fit, the codebook training, and the full-corpus
encode all happen once at build time. Staleness is observable: the meta
row count vs the live corpus count, and recall is re-measurable any time
via ``knn_recall_eval``'s harness (tests/test_ann_index.py pins it).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .similarity import N_QUERIES, TOP_K, _vectors, _vectors_probe

_M, _KSUB, _DSUB = 8, 16, 8  # 8 subspaces x 16 centroids over 64 dims
_META = "_ANN_META.json"


def _fit_cells_driver(vec: DataFrame, n_cells: int, n_sample: int = 4096) -> list:
    """Seeded k-means++ + 15 vectorized Lloyd iterations on a bounded,
    hash-ordered driver sample -- the coarse-quantizer fit
    ``build_ann_index`` has used since its in-cluster-KMeans replacement
    (quantizer quality needs thousands of rows, not the corpus, and a
    driver fit costs ZERO Spark jobs where ``pyspark.ml`` KMeans runs ~10
    sequential treeAggregate jobs of pure launch latency). r14: extracted
    so the INLINE ANN tiers (knn_cosine_ivf / knn_cosine_ivf_pq) share the
    exact same fit instead of each paying the ml.KMeans job ladder.

    Deterministic: hash-ordered sample (id-ordered prefixes are biased
    when insertion order correlates with content), fixed seeds, position
    tie-breaks. Returns plain ``list[list[float]]`` centroids."""
    import numpy as np

    from pyspark.sql import functions as F  # noqa: F811 - local for clarity

    fit = np.asarray(
        vec.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(n_sample)
        .select("v")
        .toPandas()["v"]
        .tolist(),
        dtype=np.float64,
    )
    n_cells = max(2, min(n_cells, len(fit)))  # tiny corpus: 2 <= k <= points
    # seeded k-means++ init (Arthur & Vassilvitskii 2007, public): random
    # init loses ~0.2 recall@10 vs a spread seeding on clustered data
    rng0 = np.random.default_rng(7)
    first = int(rng0.integers(len(fit)))
    cents0 = fit[first][None, :]
    d2min = ((fit - cents0[0]) ** 2).sum(axis=1)
    while len(cents0) < n_cells:
        probs = d2min / d2min.sum() if d2min.sum() > 0 else None
        nxt = int(rng0.choice(len(fit), p=probs))
        cents0 = np.vstack([cents0, fit[nxt]])
        d2min = np.minimum(d2min, ((fit - fit[nxt]) ** 2).sum(axis=1))
    for _ in range(15):
        d2 = ((fit[:, None, :] - cents0[None, :, :]) ** 2).sum(axis=2)
        assign0 = d2.argmin(axis=1)
        for c in range(n_cells):
            pts = fit[assign0 == c]
            if len(pts):
                cents0[c] = pts.mean(axis=0)
    return [list(map(float, c)) for c in cents0]


def _assign_cells(spark: SparkSession, vec: DataFrame, centroids: list) -> DataFrame:
    """Cell assignment: one JVM argmin over the broadcast centroids (ties
    break by position, same convention as the PQ encode)."""
    cell_dists = (
        "transform(cents, c -> aggregate(zip_with(v, c,"
        " (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x))"
    )
    cents_one = spark.createDataFrame([(centroids,)], "cents array<array<double>>")
    return (
        vec.join(F.broadcast(cents_one))
        .withColumn(
            "cell",
            F.expr(f"int(array_position({cell_dists}, array_min({cell_dists})) - 1)"),
        )
        .select("vec_id", "v", "nrm", "cell")
    )


def _encode_residuals(
    spark: SparkSession, assigned: DataFrame, cent_df: DataFrame, luts: dict
) -> DataFrame:
    """Residual PQ encode: residual vs cell centroid, then the nearest
    residual-codebook centroid per subspace as a JVM argmin over the
    broadcast codebooks. Shared by the initial build and the delta
    extend (a delta must encode with the EXISTING quantizers)."""
    cb = spark.createDataFrame(
        [tuple([luts[j] for j in range(_M)])],
        ", ".join(f"cb_{j} array<array<double>>" for j in range(_M)),
    )
    coded = (
        assigned.join(F.broadcast(cent_df), "cell")
        .withColumn("res", F.expr("zip_with(v, centroid, (x, y) -> x - y)"))
        .join(F.broadcast(cb))
    )
    for j in range(_M):
        dists = (
            f"transform(cb_{j}, c -> aggregate(zip_with(slice(res, {j * _DSUB + 1}, {_DSUB}), c,"
            f" (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x))"
        )
        coded = coded.withColumn(
            f"code_{j}", F.expr(f"int(array_position({dists}, array_min({dists})) - 1)")
        )
    return coded


def _check_index_dir(index_dir) -> str:
    """Positional-swap guard: the three index entry points historically
    took ``index_dir`` in DIFFERENT positions (build: 3rd, query: 2nd),
    an API trap that silently passed a DataFrame where a path belonged.
    ``index_dir`` is now keyword-only everywhere and must be a string
    path."""
    if not isinstance(index_dir, str):
        raise TypeError(
            f"index_dir must be a filesystem path string, got "
            f"{type(index_dir).__name__}; pass it keyword-only, e.g. "
            f"query_ann_index(spark, queries, corpus, index_dir=...)"
        )
    return index_dir.rstrip("/")


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    index_dir: str,
    n_cells: int = 16,
    n_sample: int = 4096,
) -> dict:
    """Fit + encode + persist. ``corpus`` must carry (vec_id, v, nrm) as
    produced by ``similarity._vectors``. Returns the meta dict. The build
    is deterministic for a given corpus: both quantizers (coarse cells
    AND residual codebooks) train driver-side with seeded vectorized
    Lloyd's on the same ordered bounded sample -- quantizer quality needs
    thousands of rows, not the corpus, and a driver fit costs ZERO Spark
    jobs where the in-cluster k-means this replaced ran ~10 sequential
    fit iterations of pure launch latency. Cell assignment of the full
    corpus is one JVM argmin over the broadcast centroids (the same
    expression shape as the PQ encode); argmin ties break by position."""
    import numpy as np

    index_dir = _check_index_dir(index_dir)
    vec = corpus.localCheckpoint()  # assign + sample + encode reuse it

    # deterministic UNBIASED driver-side fit (hash-ordered bounded sample,
    # seeded k-means++ + Lloyd) -- see _fit_cells_driver; shared verbatim
    # with the inline ANN tiers since r14, so inline and persisted
    # quantizers are the SAME artifact for the same corpus
    centroids = _fit_cells_driver(vec, n_cells, n_sample)
    n_cells = len(centroids)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )
    assigned = _assign_cells(spark, vec, centroids)

    # residual codebooks: driver-side vectorized Lloyd's on an ordered sample
    samp = (
        assigned.orderBy("vec_id").limit(n_sample).select("v", "cell").toPandas()
    )
    cents_np = np.asarray(centroids)
    res_sample = np.asarray(samp["v"].tolist(), dtype=np.float64) - cents_np[
        samp["cell"].to_numpy()
    ]
    rng = np.random.default_rng(42)
    luts: dict[int, list[list[float]]] = {}
    for j in range(_M):
        x = res_sample[:, j * _DSUB : (j + 1) * _DSUB]
        cents = x[rng.choice(len(x), size=min(_KSUB, len(x)), replace=False)]
        for _ in range(10):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign_ = d2.argmin(axis=1)
            for c in range(len(cents)):
                pts = x[assign_ == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        luts[j] = [list(map(float, c)) for c in cents]

    coded = _encode_residuals(spark, assigned, cent_df, luts)

    cent_df.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark.createDataFrame(
        [(j, ci, c) for j, cents in luts.items() for ci, c in enumerate(cents)],
        "sub int, code int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    (
        coded.select("vec_id", "nrm", *[f"code_{j}" for j in range(_M)], "cell")
        .write.mode("overwrite")
        .partitionBy("cell")  # queries prune to their probed cells
        .parquet(f"{index_dir}/codes")
    )
    meta = {
        "n_cells": n_cells,
        "m": _M,
        "ksub": _KSUB,
        "d_sub": _DSUB,
        "n_vectors": vec.count(),
    }
    with open(f"{index_dir}/{_META}", "w") as f:
        json.dump(meta, f)
    return meta


def index_meta(index_dir: str) -> dict | None:
    try:
        with open(f"{index_dir.rstrip('/')}/{_META}") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def extend_ann_index(
    spark: SparkSession, new_vectors: DataFrame, *, index_dir: str
) -> dict:
    """Delta-index the staleness gap: encode NEW vectors with the
    EXISTING quantizers (centroids + codebooks are immutable artifacts --
    a delta never re-clusters) and append their codes to the
    cell-partitioned table, bumping the meta row count. Recall on the
    delta degrades only as its distribution drifts from the build-time
    sample, which ``knn_recall_eval``'s harness measures; when it does,
    rebuild. This is the ES-index analogue of incremental indexing vs
    reindex-from-scratch.

    Scale: one encode pass over the delta only (argmin against broadcast
    quantizers, zero shuffles before the partitioned append)."""
    index_dir = _check_index_dir(index_dir)
    meta = index_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(f"no ANN index at {index_dir} (run build_ann_index)")
    cent_rows = sorted(
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    )
    centroids = [list(map(float, c)) for _, c in cent_rows]
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )
    luts: dict[int, list[list[float]]] = {}
    for r in spark.read.parquet(f"{index_dir}/codebooks").collect():
        luts.setdefault(int(r["sub"]), [])
    cb_rows = sorted(
        (int(r["sub"]), int(r["code"]), list(map(float, r["centroid"])))
        for r in spark.read.parquet(f"{index_dir}/codebooks").collect()
    )
    for sub, _code, cent in cb_rows:
        luts[sub].append(cent)

    assigned = _assign_cells(spark, new_vectors, centroids)
    coded = _encode_residuals(spark, assigned, cent_df, luts)
    (
        coded.select("vec_id", "nrm", *[f"code_{j}" for j in range(_M)], "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{index_dir}/codes")
    )
    meta["n_vectors"] = int(meta["n_vectors"]) + new_vectors.count()
    with open(f"{index_dir}/{_META}", "w") as f:
        json.dump(meta, f)
    return meta


def query_ann_index(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    *,
    index_dir: str,
    n_probe: int = 6,
    top_k: int = TOP_K,
) -> DataFrame:
    """Top-k cosine neighbors from the prebuilt index. ``queries`` carries
    (query_id, qv, qnrm); ``corpus`` carries (vec_id, v, nrm) and is read
    ONLY for the exact rerank of the 30*top_k-row shortlist."""
    index_dir = _check_index_dir(index_dir)
    meta = index_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(f"no ANN index at {index_dir} (run build_ann_index)")
    n_probe = min(n_probe, meta["n_cells"])
    # rerank shortlist: the recall lever of the ADC family. Measured at
    # sf0.1 (5k vectors, 6/16 cells probed): recall@10 = 0.32 at 3*k,
    # 0.52 at 10*k, 0.64 at 30*k vs the 0.70 IVF ceiling -- the exact
    # rerank recovers whatever the shortlist retains, and 30*top_k
    # raw-vector lookups per query is ~300 rows against a keyed corpus.
    shortlist = 30 * top_k

    cent_df = spark.read.parquet(f"{index_dir}/centroids")
    cent_rows = spark.read.parquet(f"{index_dir}/codebooks")

    # probe the n_probe nearest cells per query (|queries| x n_cells, tiny)
    cdist2 = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
    )
    qdotc = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("cell"))
    probed = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("dist2", cdist2)
        .withColumn("q_dot_c", qdotc)
        .withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "qnrm", "cell", "q_dot_c")
        .localCheckpoint()  # reused: cell-set collect + ADC join + LUT build
    )
    # the union of probed cells, driver-side (|queries| x n_probe ids):
    # filtering the partitioned codes table on this set is what turns the
    # scan into a partition-pruned read of exactly those cells' files
    cells = [r["cell"] for r in probed.select("cell").distinct().collect()]

    # per-query residual LUTs: q . codebook_centroid partial dots
    part_dot = F.expr(
        f"aggregate(zip_with(slice(qv, sub * {meta['d_sub']} + 1, {meta['d_sub']}),"
        " centroid, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    lut = (
        queries.crossJoin(F.broadcast(cent_rows))
        .withColumn("pd", part_dot)
        .groupBy("query_id", "sub")
        .agg(F.array_sort(F.collect_list(F.struct("code", "pd"))).alias("row"))
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "row"))).alias("subs"))
        .select(
            "query_id",
            F.expr("transform(subs, s -> transform(s.row, r -> r.pd))").alias("lut"),
        )
    )
    probes = probed.join(lut, "query_id")

    codes = spark.read.parquet(f"{index_dir}/codes").filter(F.col("cell").isin(cells))
    code_arr = ", ".join(f"code_{j}" for j in range(meta["m"]))
    adc_res = F.expr(
        f"aggregate(sequence(0, {meta['m'] - 1}), 0D,"
        " (acc, j) -> acc + element_at(element_at(lut, j + 1),"
        f"   int(element_at(array({code_arr}), j + 1)) + 1))"
    )
    scored = (
        codes.join(
            F.broadcast(probes),
            (codes.cell == probes.cell) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "adc_cosine", (F.col("q_dot_c") + adc_res) / (F.col("qnrm") * F.col("nrm"))
        )
        .select("query_id", "vec_id", "qnrm", "adc_cosine")
        .dropDuplicates(["query_id", "vec_id"])
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc_cosine").desc(), F.col("vec_id"))
    short = (
        scored.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= shortlist)
        .select("query_id", "qnrm", "vec_id")
    )

    # exact rerank: only the shortlist touches raw vectors
    rer = (
        short.join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .join(queries.select("query_id", "qv"), "query_id")
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
                )
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register("knn_cosine_ivf_pq_prebuilt", tags=("similarity", "northstar"))
# rows-only by design: ANN recall is probabilistic; the recall-vs-exact
# gate lives in tests/test_ann_index.py, matching knn_cosine_ivf_pq.
def knn_cosine_ivf_pq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ through the persisted-index path: build the index into
    scratch (one distributed encode pass), then answer the standard query
    set by reading it back -- the registered form drives the SAME build
    artifact + pruned-scan + ADC + rerank pipeline a long-lived index
    serves, so the driver check covers the whole production shape, and
    the scratch dir is cleaned like every other per-invocation store."""
    import shutil
    import tempfile

    if _vectors_probe(spark, sf_dir, 2) < 2:  # un-spread guard (r14): no quantizer, no neighbors
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk int"
        )
    scratch = tempfile.mkdtemp(prefix="ann_index_")
    try:
        vec = _vectors(spark, sf_dir).localCheckpoint()
        build_ann_index(spark, vec, index_dir=scratch)
        queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        return (
            query_ann_index(spark, queries, vec, index_dir=scratch)
            .orderBy("query_id", "rnk")
            .localCheckpoint()  # materialize before the finally deletes the index
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register("knn_recall_vs_nprobe_curve", tags=("similarity", "monitor"))
# rows-only by design: ANN recall is probabilistic; the monotonicity and
# ceiling gates live in tests/test_ann_index.py.
def knn_recall_vs_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n_probe operating-curve for the persisted IVF-PQ index:
    recall@k and cells-probed at n_probe in {1, 2, 4, 8} against the
    exact brute-force baseline -- the ANN twin of dedup_lsh_tuning_curve
    (that one prices LSH configs analytically before a signature pass;
    this one prices the QUERY-side latency/recall trade on the index you
    already built, which is how you pick a serving n_probe before going
    to production). Read the knee the same way: the first n_probe whose
    recall stops improving is the serving config; everything beyond it
    pays pruned-partition reads for nothing.

    Scale: ONE build (the expensive distributed encode) serves all four
    probe settings; each query pass reads only its probed cells' parquet
    partitions (n_probe/n_cells of the codes), and the exact baseline is
    |queries| x |corpus| only at fixture scale -- at 100 TB the baseline
    comes from the held-out query sample every ANN deployment keeps. The
    recall join is |queries| x k rows per setting."""
    import shutil
    import tempfile

    from .similarity import knn_cosine_topk

    if _vectors_probe(spark, sf_dir, 2) < 2:  # un-spread guard (r14)
        return spark.createDataFrame(
            [], "n_probe int, n_queries bigint, avg_recall_at_k double"
        )
    scratch = tempfile.mkdtemp(prefix="ann_curve_")
    try:
        vec = _vectors(spark, sf_dir).localCheckpoint()
        build_ann_index(spark, vec, index_dir=scratch)
        queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        exact = (
            knn_cosine_topk(spark, sf_dir)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=False)  # referenced by all four settings
        )
        exact_n = exact.groupBy("query_id").agg(
            F.count("*").cast("double").alias("exact_n")
        )
        outs = []
        for n_probe in (1, 2, 4, 8):
            approx = query_ann_index(
                spark, queries, vec, index_dir=scratch, n_probe=n_probe
            ).select("query_id", "neighbor_id")
            hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            per_q = (
                hits.groupBy("query_id")
                .agg(F.count("*").cast("double").alias("hit_n"))
                .join(exact_n, "query_id")
                .select(
                    "query_id", (F.col("hit_n") / F.col("exact_n")).alias("recall")
                )
            )
            base = exact.select("query_id").distinct()
            outs.append(
                base.join(per_q, "query_id", "left")
                .agg(
                    F.count("*").cast("bigint").alias("n_queries"),
                    F.round(F.avg(F.coalesce(F.col("recall"), F.lit(0.0))), 3).alias(
                        "avg_recall_at_k"
                    ),
                )
                .select(
                    F.lit(n_probe).cast("int").alias("n_probe"),
                    "n_queries",
                    "avg_recall_at_k",
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out.orderBy("n_probe").localCheckpoint()  # before scratch rm
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def cell_balance_profile(spark: SparkSession, *, index_dir) -> DataFrame:
    """Cell-size balance profile of a persisted IVF index: the skew
    numbers that predict query tail latency (a probe into the biggest
    cell costs max_cell/p50_cell times the median probe; at 10^9 vectors
    an unbalanced coarse quantizer IS the p99). One row:
    n_cells_nonempty, n_vectors, min/p50/max cell size, the coefficient
    of variation, the largest-cell share, and the Gini of cell sizes.

    Reads ONLY the codes partition footprint (cell column + count --
    parquet column pruning keeps the scan to partition keys), so the
    profile is cheap enough to run after every extend_ann_index delta.
    The serving-config companion to knn_recall_vs_nprobe_curve: that
    curve picks n_probe, this one tells you whether cell sizes make the
    probe cost uniform."""
    path = _check_index_dir(index_dir)
    sizes = (
        spark.read.parquet(f"{path}/codes")
        .groupBy("cell")
        .agg(F.count("*").cast("bigint").alias("sz"))
        .localCheckpoint(eager=False)  # the profile aggregates it twice
    )
    w = Window.orderBy("sz", "cell")  # n_cells rows: bounded by the quantizer
    ranked = sizes.select(
        "sz", F.row_number().over(w).cast("bigint").alias("i")
    )
    return (
        ranked.agg(
            F.count("*").cast("bigint").alias("n_cells_nonempty"),
            F.sum("sz").cast("bigint").alias("n_vectors"),
            F.min("sz").cast("bigint").alias("min_cell"),
            F.percentile(F.col("sz").cast("double"), F.lit(0.5)).alias("p50"),
            F.max("sz").cast("bigint").alias("max_cell"),
            F.sum(F.col("sz").cast("decimal(38,0)") * F.col("sz"))
            .cast("double").alias("s2"),
            F.sum((2 * F.col("i") - 1) * F.col("sz"))
            .cast("double").alias("gnum"),
        )
        .select(
            "n_cells_nonempty",
            "n_vectors",
            "min_cell",
            F.round("p50", 6).alias("p50_cell"),
            "max_cell",
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("s2") / F.col("n_cells_nonempty")
                        - (F.col("n_vectors").cast("double") / F.col("n_cells_nonempty"))
                        * (F.col("n_vectors").cast("double") / F.col("n_cells_nonempty")),
                        F.lit(0.0),
                    )
                )
                / (F.col("n_vectors").cast("double") / F.col("n_cells_nonempty")),
                6,
            ).alias("cv"),
            F.round(
                F.col("max_cell").cast("double") / F.col("n_vectors"), 6
            ).alias("max_share"),
            F.round(
                F.col("gnum") / (F.col("n_cells_nonempty") * F.col("n_vectors"))
                - (F.col("n_cells_nonempty") + 1).cast("double")
                / F.col("n_cells_nonempty"),
                6,
            ).alias("gini"),
        )
    )


@register("ann_index_cell_balance_profile", tags=("similarity", "monitor"))
# rows-only by design: the profile reads an engine-built index artifact
# (no reference-free SQL twin); balanced-vs-skewed geometry is pinned in
# tests/test_ann_index.py.
def ann_index_cell_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``cell_balance_profile``: build the persisted
    index into scratch (the knn_cosine_ivf_pq_prebuilt discipline), then
    profile its cell-size histogram -- the serving-config panel's missing
    skew axis (round-10 verdict task: recall-vs-nprobe existed, the
    tail-latency predictor did not)."""
    import shutil
    import tempfile

    if _vectors_probe(spark, sf_dir, 2) < 2:  # un-spread guard (r14)
        return spark.createDataFrame(
            [],
            "n_cells_nonempty bigint, n_vectors bigint, min_cell bigint, "
            "p50_cell double, max_cell bigint, cv double, max_share double, "
            "gini double",
        )
    scratch = tempfile.mkdtemp(prefix="ann_balance_")
    try:
        vec = _vectors(spark, sf_dir).localCheckpoint()
        build_ann_index(spark, vec, index_dir=scratch)
        return cell_balance_profile(spark, index_dir=scratch).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def residual_energy_profile(
    spark: SparkSession, corpus: DataFrame, *, index_dir
) -> DataFrame:
    """Residual-energy profile of a persisted IVF index against a corpus:
    per coarse cell, how much vector energy the coarse quantizer does NOT
    capture (mean ||x - c||^2 over mean ||x||^2). This is the number that
    predicts PQ quantization error -- IVFADC encodes the RESIDUAL
    (Jegou, Douze & Schmid 2011, sec. III), so a cell whose residual
    energy ratio is high will quantize badly at a fixed code budget no
    matter how balanced its SIZE is. cell_balance_profile prices probe
    COST skew; this prices probe QUALITY skew.

    Columns: cell, n_vectors, mean_sq_norm, mean_sq_residual,
    residual_energy_ratio (sum||r||^2 / sum||x||^2, NULL-guarded).

    Scale: centroids broadcast; assignment + both energy sums are one
    JVM-side map over the corpus followed by a |cells|-grain agg -- no
    UDF, no corpus shuffle beyond the agg's partial-combine exchange."""
    path = _check_index_dir(index_dir)
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    )
    centroids = [list(map(float, r["centroid"])) for r in cent_rows]
    assigned = _assign_cells(spark, corpus, centroids)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )
    sq = F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")
    rsq = F.expr(
        "aggregate(zip_with(v, centroid, (x, y) -> x - y), 0D,"
        " (acc, x) -> acc + x * x)"
    )
    return (
        assigned.join(F.broadcast(cent_df), "cell")
        .select("cell", sq.alias("sq"), rsq.alias("rsq"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum("sq").alias("ssq"),
            F.sum("rsq").alias("srsq"),
        )
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("ssq") / F.col("n_vectors"), 6).alias("mean_sq_norm"),
            F.round(F.col("srsq") / F.col("n_vectors"), 6).alias("mean_sq_residual"),
            F.round(
                F.col("srsq") / F.nullif(F.col("ssq"), F.lit(0.0)), 6
            ).alias("residual_energy_ratio"),
        )
        .orderBy("cell")
    )


@register("ann_index_residual_energy_profile", tags=("similarity", "monitor"))
# rows-only by design: the profile reads an engine-built index artifact
# (no reference-free SQL twin); tight-vs-diffuse cluster geometry is
# pinned in tests/test_round17_ops.py.
def ann_index_residual_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``residual_energy_profile``: build the persisted
    index into scratch (the knn_cosine_ivf_pq_prebuilt discipline), then
    profile per-cell residual energy against the same corpus -- the
    serving-config panel's quality-skew axis, completing the trio
    recall-vs-nprobe (accuracy), cell-balance (cost), residual-energy
    (quantization quality)."""
    import shutil
    import tempfile

    if _vectors_probe(spark, sf_dir, 2) < 2:  # un-spread guard (r14)
        return spark.createDataFrame(
            [],
            "cell int, n_vectors bigint, mean_sq_norm double, "
            "mean_sq_residual double, residual_energy_ratio double",
        )
    scratch = tempfile.mkdtemp(prefix="ann_resenergy_")
    try:
        vec = _vectors(spark, sf_dir).localCheckpoint()
        build_ann_index(spark, vec, index_dir=scratch)
        return residual_energy_profile(
            spark, vec, index_dir=scratch
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
