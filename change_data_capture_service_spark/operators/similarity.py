"""Similarity search over embeddings (SURVEY.md §2.2 X19 + north star):
brute-force cosine top-k (the exact baseline) and an IVF/LSH-bucketed
approximate variant (the 100 TB path).

Dot products are pure JVM array expressions (``zip_with`` + ``aggregate``)
on double-cast components -- no Python, no UDF, codegen'd. Ranking is on
round(cosine, 6) with vec_id tiebreak so ordering is bit-stable across
engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, spread
from ..registry import register

N_QUERIES = 5  # query set: vec_id < 5
TOP_K = 10

# knn_graph_reciprocity's exact all-pairs eval broadcasts the corpus to
# every scoring task (the same relation its former broadcast hash join
# shipped); past this many vectors the op refuses loudly and the caller
# must build the kNN graph from the persisted ANN index instead. 262144
# x 64 doubles = ~134 MB broadcast -- the comfortable ceiling for a
# diagnostic, far past any eval subset (the KCORE_BROADCAST_NODE_CAP
# loud-guard precedent).
RECIPROCITY_BROADCAST_CAP = 262_144

_VEC_D = "transform(embedding, x -> cast(x AS double))"
_NORM = f"sqrt(aggregate({_VEC_D}, 0D, (acc, x) -> acc + x * x))"


def _exact_knn_edges(spark: SparkSession, vec: DataFrame, k: int) -> DataFrame:
    """Exact all-pairs kNN edges via Arrow-batched BLAS (guide §4.2):
    each scoring task computes its batch's cosines against the broadcast
    corpus with ONE matmul instead of N x N interpreted
    ``zip_with``/``aggregate`` folds. Shared by the all-pairs diagnostics
    (reciprocity / k-dist / hubness), whose JVM-HOF forms the r14 sweep
    measured at 224 / 1145 / 605 executor-CPU-s at sf0.1 (N=2000) --
    ~90% interpreted 64-dim folds plus an N² pre-window row stream.

    Semantics are the family convention exactly: cosine computed as the
    ORACLE expression -- round(dot(x, y) / (nrm_x * nrm_y), 6), raw dots
    first, ONE division by the norm product after -- rounded to 6dp
    BEFORE the rank, neighbor-id tiebreak, self excluded; each src's
    top-k is complete inside its batch because every batch sees the
    whole corpus, so no window pass is needed at all. (The first cut
    pre-normalized both sides before the GEMM; that is a mathematically
    equal but ulp-DIFFERENT expression from the oracle's, so agreement
    was empirical -- r14 ADVICE. The raw-dot form matches the oracle
    term-for-term; a near-tie fixture pins the 6dp agreement in
    tests/test_round24_ops.py so a BLAS/backend change fails loudly.)
    Determinism: d=64 fits inside one GEMM K-block, so each output
    element's 64-term accumulation order is fixed by the kernel
    regardless of batch shape or thread split (blocking/threading
    partition M and N, never a 64-long K) -- the rounded cosine is
    stable across partitionings, verified HASH-OK against the
    sequential-fold DuckDB oracles at both correctness SFs.

    The corpus collect is Arrow-batched (``toPandas`` -- packed numeric
    buffers, not driver Row objects; the Row form costs several x the
    ndarray budget the cap documents) and bounded by the same
    eval-subset contract as the BroadcastExchange it replaces (a
    broadcast hash join collects the identical relation driver-side
    first); the cap makes the bound loud -- past it, generate edges
    from the persisted ANN index (``ann_index.query_ann_index``) and
    feed the same downstream folds.

    Returns (src, src_label, dst, cosine, rnk) with rnk in 1..k."""
    import numpy as np

    corpus = vec.select("vec_id", "v", "nrm").toPandas()
    if len(corpus) > RECIPROCITY_BROADCAST_CAP:
        raise ValueError(
            f"exact all-pairs kNN eval is capped at "
            f"{RECIPROCITY_BROADCAST_CAP} vectors (got {len(corpus)}); at this "
            "scale build the kNN graph from the persisted ANN index "
            "(ann_index.query_ann_index) and feed the downstream fold."
        )
    c_ids = corpus["vec_id"].to_numpy(dtype=np.int64)
    c_mat = np.stack(corpus["v"].to_numpy()).astype(np.float64)
    c_nrm = corpus["nrm"].to_numpy(dtype=np.float64)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_nrm))

    def _knn_batches(batches):
        ids, cm, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            x_nrm = pdf["nrm"].to_numpy(dtype=np.float64)
            # oracle expression shape: raw dot, then one division by the
            # norm product, then the 6dp round
            cos = np.round((x @ cm.T) / np.outer(x_nrm, cn), 6)
            src_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # rank: cosine desc, dst asc; self excluded. lexsort is stable
            # and sorts by the LAST key first, so (ids asc) then (-cos).
            order = np.lexsort((np.broadcast_to(ids, cos.shape), -cos), axis=1)
            out = {"src": [], "src_label": [], "dst": [], "cosine": [], "rnk": []}
            lbls = pdf["label"].to_numpy()
            for i in range(len(pdf)):
                picked = 0
                for j in order[i]:
                    if ids[j] == src_ids[i]:
                        continue  # self
                    picked += 1
                    out["src"].append(src_ids[i])
                    out["src_label"].append(lbls[i])
                    out["dst"].append(ids[j])
                    out["cosine"].append(cos[i, j])
                    out["rnk"].append(picked)
                    if picked == k:
                        break
            yield pd.DataFrame(out)

    return vec.select("vec_id", "label", "v", "nrm").mapInPandas(
        _knn_batches, "src long, src_label int, dst long, cosine double, rnk int"
    )


def _vectors_probe(spark: SparkSession, sf_dir: str, n: int) -> int:
    """How many admissible vectors exist, capped at ``n`` -- the guard the
    ANN tiers run before fitting a quantizer. Probes the UN-spread scan:
    ``take(n)`` on the spread (repartitioned) relation executes the full
    shuffle MAP side first -- the whole corpus at 100 TB -- where the
    un-spread form short-circuits at the first row groups (r14 finding:
    three ~6.6 s zero-CPU probe stages per inline-ANN call at sf0.1)."""
    e = load_table(spark, sf_dir, "embeddings")
    out = e.select(F.expr(_NORM).alias("nrm")).filter(
        (F.col("nrm") > 0) & (F.col("nrm") < float("inf"))
    )
    return len(out.take(n))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dot products are CPU-bound; the fixture is one file -> spread first
    e = spread(load_table(spark, sf_dir, "embeddings"))
    out = e.select(
        "vec_id",
        "label",
        F.expr(_VEC_D).alias("v"),
        F.expr(_NORM).alias("nrm"),
    )
    # cosine space admits only finite nonzero-norm vectors: a zero vector
    # has no direction and its norm divides every cosine downstream (an
    # ANSI divide-by-zero that would kill the whole query for one corrupt
    # row), and a NaN/Inf component poisons norms and quantizer fits the
    # same way. Excluded at the source -- `nrm > 0` also drops NaN norms
    # (NaN comparisons are false) -- which is the hygiene rule
    # embedding_norm_stats exists to surface. The fixtures carry no such
    # rows, so every oracle hash is unchanged; the hostile-embeddings
    # sweep in tests/test_round10_ops.py pins the totality.
    return out.filter((F.col("nrm") > 0) & (F.col("nrm") < float("inf")))


@register(
    "knn_cosine_topk",
    tags=("similarity", "northstar", "headline"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    ) t
    WHERE rnk <= {TOP_K}
    """,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a small query set, two-stage:

    1. score map-side (broadcast queries; the corpus never shuffles; JVM
       ``zip_with``/``aggregate`` dot products);
    2. LOCAL top-k per (query, input partition) via WindowGroupLimit
       (Partial) -- the rank-limit filter plans a map-side JVM pruner
       BELOW the window's exchange, so nothing leaves a partition but
       ``queries x k`` narrow rows;
    3. global ``row_number`` window over at most ``partitions x queries x k``
       rows.

    The window therefore never funnels the N x Q scored rows into Q reducer
    partitions -- the pre-window row count is independent of corpus size,
    which is what makes the exact baseline survive a 100x corpus. Partial
    and Final stages use the identical total order (cosine desc,
    neighbor_id asc), so the union of local top-ks provably contains the
    global top-k. Until round 14 the local pruner was a hand-rolled Arrow
    ``mapInPandas`` reducer; the WindowGroupLimit form keeps the identical
    row bound with zero Python boundary (guide §4.1: prefer built-ins).
    The body lives in ``_exact_cosine_topk`` (parameterized k) so shortlist
    consumers (knn_mmr_diversified) reuse the SAME scalable generator
    instead of re-deriving a scorer."""
    return _exact_cosine_topk(spark, sf_dir, TOP_K)


def _exact_cosine_topk(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """See knn_cosine_topk -- the parameterized two-stage exact scorer.
    Returns (query_id, neighbor_id, cosine, rnk <= k).

    The rank-limit filter plans as WindowGroupLimit(Partial) BELOW the
    window's exchange (SPARK-37099): each map task keeps only its own
    top-k per query in the JVM, so the shuffle carries at most
    partitions x queries x k narrow rows -- the same bound the former
    Arrow ``mapInPandas`` reducer enforced by hand, minus the
    JVM->Python->JVM round trip (r14 stage profile: 8.8 executor-run
    seconds of which only 0.47 was CPU -- pure Python-worker overhead,
    removed by this rewrite)."""
    vec = _vectors(spark, sf_dir)
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    scored = (
        vec.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (F.col("qnrm") * F.col("nrm")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


@register("knn_cosine_ivf", tags=("similarity", "northstar"))  # rows-only: ANN recall is probabilistic
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer ->
    per-cell inverted lists -> probe the query's nearest cells -> exact
    rerank within probed cells.

    The corpus-scale shape: the quantizer is fit once on a bounded
    hash-ordered sample (quantizer quality needs thousands of rows, not
    the corpus), every vector is assigned to one cell (a narrow shuffle
    key), and each query touches only ``n_probe/n_cells`` of the corpus.
    Compare ``knn_cosine_lsh`` (random projections, no training) -- IVF
    adapts cells to the data distribution. Deterministic via fixed seeds.

    r14: the coarse fit is the driver-side seeded Lloyd's shared with
    ``build_ann_index`` (``ann_index._fit_cells_driver``) -- the former
    ``pyspark.ml`` KMeans fit ran ~10 sequential treeAggregate jobs of
    pure launch latency per call; the driver fit costs zero Spark jobs
    and makes the inline and persisted quantizers the same artifact."""
    _n_avail = _vectors_probe(spark, sf_dir, 16)  # bounded, un-spread probe
    if _n_avail < 2:  # 0 or 1 vectors: no quantizer (k-means needs k >= 2)
        # and no neighbors either (queries exclude self)
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk int"
        )
    from .ann_index import _assign_cells, _fit_cells_driver

    n_cells = max(2, min(16, _n_avail))  # tiny corpus: k <= points, k >= 2
    n_probe = min(4, n_cells)
    vec = _vectors(spark, sf_dir).localCheckpoint()  # fit sample + assign reuse
    centroids = _fit_cells_driver(vec, n_cells)
    n_cells = len(centroids)
    assigned = _assign_cells(spark, vec, centroids)

    # driver-side: n_cells centroid vectors (tiny, a model artifact)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )

    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    # rank cells per query by centroid distance, keep n_probe nearest
    qdot = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    )
    from pyspark.sql import Window as W

    qcells = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("dist2", qdot)
        .withColumn(
            "cell_rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("dist2"), F.col("cell"))
            ),
        )
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "qnrm", "cell")
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cands = (
        assigned.join(
            F.broadcast(qcells),
            (assigned.cell == qcells.cell) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cosine", F.round(dot / (F.col("qnrm") * F.col("nrm")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cands.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


@register("knn_cosine_lsh", tags=("similarity", "northstar"))  # rows-only: ANN recall is probabilistic
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with L independent tables +
    1-bit multiprobe -- the standard recall lever when neighbors are far
    (random 64-d corpora put true top-k at cos~0.4, i.e. ~66°, where a
    single sign-bucket almost never collides).

    Scale path for when the query set is the whole corpus (all-pairs kNN):
    1. L=4 tables x 6 fixed hyperplanes (seeded, deterministic) -> four
       6-bit buckets per vector, computed by ONE vectorized Pandas UDF
       (numpy matmul over Arrow batches);
    2. candidates = (table_id, bucket) equi-join; each query also probes
       the 6 single-bit-flip buckets per table (7 probes x 4 tables);
    3. exact cosine rerank within candidates, top-k per query.

    The bucket join shuffles O(N * L) small rows, never N² -- with an
    IVF-style coarse quantizer this is how corpus-scale kNN stays linear."""
    import numpy as np

    n_tables, n_bits = 4, 6
    rng = np.random.RandomState(42)
    bplanes = rng.standard_normal((n_tables * n_bits, 64)).tolist()

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_of(embs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (m @ np.asarray(bplanes).T) > 0  # (n, L*bits)
        weights = 1 << np.arange(n_bits)
        out = [
            [int(row[t * n_bits : (t + 1) * n_bits] @ weights) for t in range(n_tables)]
            for row in bits
        ]
        return pd.Series(out)

    vec = _vectors(spark, sf_dir).withColumn("buckets", buckets_of(F.col("v")))
    tabled = vec.select(
        "vec_id", "v", "nrm", F.posexplode("buckets").alias("table_id", "bucket")
    )
    queries = tabled.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("table_id").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    probes = queries.select(
        "query_id",
        "qv",
        "qnrm",
        "qtable",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)],
            )
        ).alias("probe_bucket"),
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cands = (
        tabled.join(
            F.broadcast(probes),
            (F.col("table_id") == F.col("qtable"))
            & (F.col("bucket") == F.col("probe_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "qv", "qnrm", "vec_id", "v", "nrm")
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("cosine", F.round(dot / (F.col("qnrm") * F.col("nrm")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cands.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


@register(
    "embedding_norm_stats",
    tags=("similarity", "northstar"),
    oracle="""
    WITH norms AS (
      SELECT vec_id, label,
             round(sqrt(list_sum(list_transform(embedding,
                                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
               AS l2_norm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l2_norm AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_norm,
           min(l2_norm) AS min_norm,
           max(l2_norm) AS max_norm
    FROM norms GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table hygiene check: per-label L2-norm profile (count /
    mean / min / max). Degenerate norms (0, inf, wild spread) are the
    canonical symptom of a broken embedding job; this is the validation
    query a pipeline runs before building any ANN index on the table.

    The dot product folds JVM-side (aggregate over the array, sequential
    left fold -- same order as DuckDB's list_sum, so bit-identical before
    the shared round-6). Norms round THEN aggregate in DECIMAL, making the
    group stats accumulation-order-independent; one partial-agg shuffle of
    |labels| rows."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(
            F.expr(
                "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                " 0D, (acc, x) -> acc + x)"
            )
        ),
        6,
    )
    norms = e.select("vec_id", "label", norm.alias("l2_norm"))
    return norms.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("l2_norm").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
            "avg_norm"
        ),
        F.min("l2_norm").alias("min_norm"),
        F.max("l2_norm").alias("max_norm"),
    )


RANGE_TAU = 0.30  # radius-search similarity floor


@register(
    "knn_cosine_range",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
    FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    WHERE round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) >= {RANGE_TAU}
    """,
)
def knn_cosine_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: ALL neighbors with cosine >= tau,
    not a fixed k -- the retrieval mode for 'find everything semantically
    close' (dedup candidates, recall-first RAG). Same broadcast-queries /
    map-side-dot-product shape as ``knn_cosine_topk`` but with NO window at
    all: the threshold filter is a pure map-side predicate, so the corpus
    is scanned once and nothing shuffles -- strictly cheaper than top-k at
    any scale. The round(6)-then-compare keeps the boundary decision
    bit-identical across engines."""
    vec = _vectors(spark, sf_dir)
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cosine = F.round(dot / (F.col("qnrm") * F.col("nrm")), 6)
    return (
        vec.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= RANGE_TAU)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


@register(
    "embedding_quantize_int8",
    tags=("similarity", "northstar"),
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, label,
             list_max(list_transform(v, x -> abs(x))) AS scale,
             v
      FROM v
    ),
    codes AS (
      SELECT vec_id, label, scale,
             list_transform(v, x -> CAST(floor(x / scale * 127) AS BIGINT)) AS code
      FROM scaled WHERE scale > 0
    )
    SELECT vec_id, label, round(scale, 6) AS scale,
           CAST(list_sum(code) AS BIGINT) AS code_sum,
           CAST(list_min(code) AS BIGINT) AS code_min,
           CAST(list_max(code) AS BIGINT) AS code_max
    FROM codes
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (the 4x storage compression ANN
    indexes ship to disk): scale = max|x|, code_i = floor(x_i/scale*127).
    floor -- not round -- keeps the boundary decision IEEE-deterministic
    across engines (round's half-up vs banker's ties differ); the query
    returns the per-vector code summary so the full quantization
    arithmetic is hash-checkable without array outputs.

    Scale: pure map-side JVM array folds -- zero shuffles; at index-build
    time the codes column writes alongside the float column and the
    coarse quantizer (see ``knn_cosine_ivf``) searches int8 with a float
    re-rank on the shortlist."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    scale = F.expr("array_max(transform(v, x -> abs(x)))")
    code = F.expr("transform(v, x -> CAST(floor(x / scale * 127) AS BIGINT))")
    return (
        e.select("vec_id", "label", v.alias("v"))
        .withColumn("scale", scale)
        .filter(F.col("scale") > 0)
        .withColumn("code", code)
        .select(
            "vec_id",
            "label",
            F.round("scale", 6).alias("scale"),
            F.aggregate("code", F.lit(0).cast("long"), lambda a, x: a + x).alias("code_sum"),
            F.array_min("code").alias("code_min"),
            F.array_max("code").alias("code_max"),
        )
    )


@register(
    "knn_cosine_pq",
    tags=("similarity", "northstar"),
    # rows-only by design: PQ codes depend on k-means codebooks (engine-
    # specific sketch); recall vs the exact oracle is pinned in
    # tests/test_northstar.py instead.
)
def knn_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC): split each
    64-dim vector into m=8 subvectors, k-means each subspace to 16
    centroids (a 4-bit code per subspace -- 8 bytes per vector, 32x
    compression), score candidates by summing per-subspace lookup-table
    dot products against the UNquantized query, shortlist 3k by ADC, then
    exact-rerank the shortlist (Jegou et al. 2011, "Product Quantization
    for Nearest Neighbor Search", public paper).

    100 TB shape: codebooks fit DRIVER-SIDE on a bounded sample -- PQ
    training is a model artifact, like the IVF centroids, so it must not
    cost distributed jobs per invocation (the 8 in-cluster k-means fits
    this replaced were ~56 sequential Spark jobs of pure launch latency).
    Encoding is a pure JVM nearest-centroid expression over broadcast
    codebooks; the scored scan reads 8-byte codes -- NOT raw vectors --
    with per-query LUTs broadcast; the rank-filter shortlist rides
    WindowGroupLimit; only the 3k-row shortlist rejoins raw vectors for
    the exact rerank. Corpus bytes touched per query: |corpus| codes +
    3k vectors, vs |corpus| vectors for brute force."""
    _n_avail = _vectors_probe(spark, sf_dir, 16)  # bounded, un-spread probe
    if _n_avail < 2:  # 0 or 1 vectors: no quantizer (KMeans needs k >= 2)
        # and no neighbors either (queries exclude self)
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk int"
        )
    import numpy as np

    m, ksub, shortlist = 8, 16, 30 * TOP_K  # rerank recall lever; see ann_index.py
    d_sub = 8  # 64 / m
    vec = _vectors(spark, sf_dir).localCheckpoint()  # reused 3 times

    # -- train: bounded sample to the driver, vectorized Lloyd's per
    # subspace (deterministic seed; at 100 TB this is `.sample(frac)` with
    # the same cap -- codebook quality needs thousands of rows, not the
    # corpus, and the exact rerank absorbs residual quantization error).
    # ORDERED limit: a bare limit is plan-dependent (a parquet layout
    # change would silently change the codebooks); TakeOrdered on vec_id
    # pins the sample without a full sort.
    sample = np.array(
        vec.orderBy("vec_id").limit(4096).select("v").toPandas()["v"].tolist(),
        dtype=np.float64,
    )
    rng = np.random.default_rng(42)
    luts: dict[int, list[list[float]]] = {}
    for j in range(m):
        x = sample[:, j * d_sub : (j + 1) * d_sub]
        cents = x[rng.choice(len(x), size=min(ksub, len(x)), replace=False)]
        for _ in range(10):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = x[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        luts[j] = [list(map(float, c)) for c in cents]

    # -- encode: nearest centroid per subspace as a JVM argmin over the
    # broadcast codebook row (no Python in the corpus path)
    cb = spark.createDataFrame(
        [tuple([luts[j] for j in range(m)])],
        ", ".join(f"cb_{j} array<array<double>>" for j in range(m)),
    )
    coded = vec.select("vec_id", "v", "nrm").join(F.broadcast(cb))
    for j in range(m):
        dists = (
            f"transform(cb_{j}, c -> aggregate(zip_with(slice(v, {j * d_sub + 1}, {d_sub}), c,"
            f" (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x))"
        )
        coded = coded.withColumn(
            f"code_{j}",
            F.expr(f"int(array_position({dists}, array_min({dists})) - 1)"),
        )
    coded = coded.drop(*[f"cb_{j}" for j in range(m)])

    # queries stay exact; their per-subspace LUT rows broadcast
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    cent = spark.createDataFrame(
        [(j, c_idx, c) for j, cents in luts.items() for c_idx, c in enumerate(cents)],
        "sub int, code int, centroid array<double>",
    )
    part_dot = F.expr(
        "aggregate(zip_with(slice(qv, sub * 8 + 1, 8), centroid, (x, y) -> x * y),"
        " 0D, (acc, x) -> acc + x)"
    )
    # lut: query_id -> array[m][ksub] of partial dots, built on m*ksub*|q| rows
    lut = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("pd", part_dot)
        .groupBy("query_id", "qnrm", "sub")
        .agg(F.array_sort(F.collect_list(F.struct("code", "pd"))).alias("row"))
        .groupBy("query_id", "qnrm")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "row"))).alias("subs")
        )
        .select(
            "query_id",
            "qnrm",
            F.expr("transform(subs, s -> transform(s.row, r -> r.pd))").alias("lut"),
        )
    )
    adc = F.expr(
        "aggregate(sequence(0, 7),"
        " 0D,"
        " (acc, j) -> acc + element_at(element_at(lut, j + 1),"
        "   int(element_at(array(code_0, code_1, code_2, code_3, code_4, code_5, code_6, code_7), j + 1)) + 1))"
    )
    scored = (
        coded.drop("v")
        .join(F.broadcast(lut), F.col("vec_id") != F.col("query_id"))
        .withColumn("adc_cosine", adc / (F.col("qnrm") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_cosine").desc(), F.col("vec_id"))
    short = (
        scored.withColumn("srnk", F.row_number().over(w))
        .filter(F.col("srnk") <= shortlist)
        .select("query_id", "qnrm", "vec_id")
    )
    # exact rerank on the shortlist only
    rer = (
        short.join(coded.select("vec_id", "v", "nrm"), "vec_id")
        .join(queries.select("query_id", "qv"), "query_id")
        .withColumn(
            "cosine",
            F.round(
                F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "knn_l2_topk",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(sqrt(list_aggregate(
               list_transform(list_zip(q.v, c.v),
                              p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')), 6)
               AS l2_dist
      FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, l2_dist, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY l2_dist, neighbor_id) AS rnk
      FROM scored
    ) t
    WHERE rnk <= {TOP_K}
    """,
)
def knn_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Euclidean top-k -- the L2 twin of knn_cosine_topk (metric
    choice is a parameter of a vector store, not a different system).
    Same scale architecture: broadcast queries, map-side JVM squared-diff
    fold over ``zip_with`` (float->double promotion is exact, and the
    sequential in-array fold is the same IEEE op order both engines run),
    per-partition local top-k via WindowGroupLimit(Partial) in the JVM
    (ascending), then a global window over partitions x queries x k rows
    -- pre-window row count independent of corpus size.

    DuckDB oracle computes the identical fold via list_zip/list_transform
    rather than ``list_distance`` so the accumulation order is pinned to
    array order on both sides."""
    vec = _vectors(spark, sf_dir).drop("nrm")
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dist = F.expr(
        "sqrt(aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)),"
        " 0D, (acc, x) -> acc + x))"
    )
    scored = (
        vec.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("l2_dist", F.round(dist, 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "l2_dist")
    )

    w = Window.partitionBy("query_id").orderBy("l2_dist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register(
    "embedding_centroid_distance",
    tags=("similarity", "northstar"),
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      FROM e
    ),
    cent AS (
      SELECT label AS c_label, pos AS c_pos,
             CAST(sum(CAST(x AS DECIMAL(20,9))) AS DOUBLE) / count(*) AS c
      FROM ex GROUP BY 1, 2
    )
    SELECT vec_id, label,
           round(sqrt(CAST(sum(CAST((x - c) * (x - c) AS DECIMAL(20,15))
                 ) AS DOUBLE)), 6) AS centroid_dist
    FROM ex JOIN cent ON label = c_label AND pos = c_pos
    GROUP BY vec_id, label
    """,
)
def embedding_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance of every embedding to its label's centroid -- the cluster
    cohesion / outlier score behind embedding-space quality checks
    (mislabel detection, near-centroid rebalancing, IVF residual stats).

    Determinism, the hard part: centroids are means of floats and the
    per-vector distance sums 64 squared diffs -- both order-dependent in
    doubles. So (1) per-dimension centroid sums run in DECIMAL (exact,
    any accumulation order), (2) each squared diff -- computed in doubles
    identically on both engines -- is snapped to DECIMAL(20,15) before
    the cross-dimension sum, making that sum order-independent too. Every
    remaining double op is a single identical IEEE expression.

    Scale: posexplode shuffles (label, pos) partial sums -- |labels| x d
    rows -- and the centroid table broadcasts back onto a second map-side
    pass; per-vector reduction is local to the row's partition. The
    vectors themselves never shuffle."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.expr(_VEC_D).alias("v")
    )
    ex = e.select("vec_id", "label", F.posexplode("v").alias("pos", "x"))
    cent = ex.groupBy(
        F.col("label").alias("c_label"), F.col("pos").alias("c_pos")
    ).agg(
        (F.sum(F.col("x").cast("decimal(20,9)")).cast("double") / F.count("*")).alias(
            "c"
        )
    )
    diff_sq = ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(
        "decimal(20,15)"
    )
    return (
        ex.join(
            F.broadcast(cent),
            (F.col("label") == F.col("c_label")) & (F.col("pos") == F.col("c_pos")),
        )
        .groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum(diff_sq).cast("double")), 6).alias("centroid_dist"))
    )


@register(
    "embedding_centroid_similarity",
    tags=("similarity", "northstar"),
    oracle="""
    WITH e AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    ex AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
    ),
    cent AS (
      SELECT label, pos,
             CAST(sum(CAST(x AS DECIMAL(20,9))) AS DOUBLE) / count(*) AS c
      FROM ex GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(sum(CAST(a.c * b.c AS DECIMAL(24,18))) AS DOUBLE) AS dot,
             CAST(sum(CAST(a.c * a.c AS DECIMAL(24,18))) AS DOUBLE) AS na,
             CAST(sum(CAST(b.c * b.c AS DECIMAL(24,18))) AS DOUBLE) AS nb
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           round(dot / nullif(sqrt(na) * sqrt(nb), 0), 6) AS centroid_cosine
    FROM pairs
    """,
)
def embedding_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid confusion structure: cosine similarity between every
    pair of label centroids -- which classes sit close in embedding space
    (merge candidates, mislabel suspects, IVF cell adjacency). Companion
    to embedding_centroid_distance's within-cluster cohesion.

    Determinism: centroids from exact per-dimension DECIMAL sums; every
    cross-dimension reduction (dot, norms) snaps the double product to
    DECIMAL(24,18) first, so all sums are order-independent; one identical
    IEEE expression finishes. nullif guards a zero-norm centroid.

    Scale: after the per-dimension partial agg the problem is |labels| x d
    values -- dim-scale; the pair join is |labels|^2 x d rows through a
    broadcast, trivial for any real label count, and the output is
    C(|labels|, 2) rows."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "label", F.expr(_VEC_D).alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("pos", "x"))
    cent = ex.groupBy("label", "pos").agg(
        (F.sum(F.col("x").cast("decimal(20,9)")).cast("double") / F.count("*")).alias(
            "c"
        )
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("pos").alias("pos_a"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("pos").alias("pos_b"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("pos_a") == F.col("pos_b")) & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("ca") * F.col("cb")).cast("decimal(24,18)"))
            .cast("double")
            .alias("dot"),
            F.sum((F.col("ca") * F.col("ca")).cast("decimal(24,18)"))
            .cast("double")
            .alias("na"),
            F.sum((F.col("cb") * F.col("cb")).cast("decimal(24,18)"))
            .cast("double")
            .alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot")
            / F.nullif(F.sqrt(F.col("na")) * F.sqrt(F.col("nb")), F.lit(0.0)),
            6,
        ).alias("centroid_cosine"),
    )


@register(
    "embedding_dim_profile",
    tags=("similarity", "profile"),
    oracle="""
    WITH d AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(x, 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*)
             AS mean_x,
           CAST(sum(CAST(round(abs(x), 9) AS DECIMAL(18,9))) AS DOUBLE)
             / count(*) AS mean_abs,
           round(min(x), 6) AS min_x,
           round(max(x), 6) AS max_x
    FROM d GROUP BY dim
    """,
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding table (mean / mean-abs /
    min / max per coordinate): dead dimensions (zero variance), biased
    dimensions (mean far from 0), and per-dim dynamic range -- exactly
    the statistics an int8 quantizer (embedding_quantize_int8) needs to
    pick scales, and the first check after an embedding-model swap.

    Coordinates round to 9 dp then accumulate in DECIMAL, so the per-dim
    sums are accumulation-order-independent across engines; one double
    division at the end.

    Scale: posexplode is map-side (|rows| x |dims| narrow tuples feeding
    a partial agg); the shuffle carries |dims| partial states per task,
    nothing row-scaled. At 100 TB you'd fold per-partition into |dims|
    accumulators with the same plan Spark already generates here."""
    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    dec = lambda c: F.round(c, 9).cast("decimal(18,9)")  # noqa: E731
    return d.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum(dec(F.col("x"))).cast("double") / F.count("*")).alias("mean_x"),
        (F.sum(dec(F.abs(F.col("x")))).cast("double") / F.count("*")).alias(
            "mean_abs"
        ),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )


@register("knn_recall_eval", tags=("similarity", "monitor"))  # rows-only: ANN recall is probabilistic
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k panel for every ANN tier against the exact brute-force
    baseline: per (method, query) the fraction of true top-k neighbors the
    approximate index returned. The evaluation every ANN deployment runs
    before trusting an index -- here a first-class operator (the product
    twin of the pytest recall gates), so an operator can re-measure recall
    after any re-index or parameter change.

    Scale: each ANN tier already bounds its own work (bucketed probes /
    coarse quantization / code scan); the eval adds only |queries| x k
    row joins on (query_id, neighbor_id) -- dim-scale. At 100 TB the
    baseline comes from a held-out query sample, never the full corpus.
    The exact baseline is persisted: it is |queries| x k rows referenced
    by every tier's hit join plus the denominator and the zero-score
    base -- ~12 plan references that would each re-run the brute-force
    pipeline (measured 28 planned embeddings scans without the persist).
    """
    if _vectors_probe(spark, sf_dir, 2) < 2:
        return spark.createDataFrame(
            [], "method string, query_id long, recall_at_k double"
        )
    exact = knn_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    # Denominator is the per-query size of the EXACT top-k set, not the
    # constant k: a query with fewer than k true neighbors (small corpus,
    # self-filtered candidates) must still be able to reach recall 1.0.
    exact_n = exact.groupBy("query_id").agg(
        F.count("*").cast("double").alias("exact_n")
    )
    outs = []
    for method, fn in (
        ("lsh", knn_cosine_lsh),
        ("ivf", knn_cosine_ivf),
        ("pq", knn_cosine_pq),
        ("ivf_pq", knn_cosine_ivf_pq),
    ):
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        per_q = hits.groupBy("query_id").agg(
            F.count("*").cast("double").alias("hit_n")
        ).join(exact_n, "query_id").select(
            "query_id", (F.col("hit_n") / F.col("exact_n")).alias("recall_at_k")
        )
        # queries where the index returned nothing still score 0
        base = exact.select("query_id").distinct()
        outs.append(
            base.join(per_q, "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                F.round(F.coalesce(F.col("recall_at_k"), F.lit(0.0)), 3).alias(
                    "recall_at_k"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("method", "query_id")


@register("knn_cosine_ivf_pq", tags=("similarity", "northstar"))  # rows-only: ANN recall is probabilistic
def knn_cosine_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with asymmetric distance: the composition of the engine's two
    ANN tiers into the architecture that actually serves 100 TB corpora
    (Jegou et al. 2011's IVFADC, public paper) -- an IVF coarse quantizer
    bounds WHICH vectors each query touches, and residual product
    quantization bounds HOW MANY BYTES each touched vector costs.

    1. Coarse: k-means cells (fit once, seeded); every vector stores its
       cell id. Queries probe the n_probe nearest cells, so the candidate
       scan covers ~n_probe/n_cells of the corpus.
    2. Residual PQ: codebooks are trained driver-side on a bounded sample
       of residuals (v - cell_centroid) -- residuals are much more
       compressible than raw vectors because the coarse quantizer already
       removed the between-cell variance. Encoding is a pure JVM argmin
       over broadcast codebooks; the candidate scan reads 8 4-bit codes +
       one float norm per vector, never the raw 64 doubles.
    3. ADC: q.v decomposes exactly as q.c_cell + q.r; the first term is
       computed exactly per (query, probed cell), the second looked up
       from per-query LUTs over the residual codebooks. Shortlist 3k by
       ADC cosine, then exact-rerank the shortlist only.

    Corpus bytes per query: (n_probe/n_cells) x |corpus| x ~16 bytes for
    the scored scan + 3k raw vectors for the rerank -- vs |corpus| x 512
    bytes brute-force. Deterministic: fixed seeds, argmin tiebreak by
    position, rerank identical to the exact operator. Recall-gated in
    tests/test_northstar.py next to its IVF and PQ parents."""
    _n_avail = _vectors_probe(spark, sf_dir, 16)  # bounded, un-spread probe
    if _n_avail < 2:  # 0 or 1 vectors: no quantizer (KMeans needs k >= 2)
        # and no neighbors either (queries exclude self)
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk int"
        )
    import numpy as np

    from .ann_index import _assign_cells, _fit_cells_driver

    n_cells = max(2, min(16, _n_avail))  # tiny corpus: k <= points, k >= 2
    n_probe = min(6, n_cells)
    m, ksub, d_sub, shortlist = 8, 16, 8, 30 * TOP_K  # rerank recall lever; see ann_index.py
    vec = _vectors(spark, sf_dir).localCheckpoint()  # reused by fit/encode/rerank

    # r14: driver-side seeded Lloyd's fit shared with build_ann_index --
    # the former ml.KMeans fit ran ~10 sequential jobs per call
    centroids = _fit_cells_driver(vec, n_cells)
    n_cells = len(centroids)
    assigned = _assign_cells(spark, vec, centroids)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )

    # -- train residual codebooks driver-side on a bounded sample.
    # ORDERED limit: a bare limit is plan-dependent (a parquet layout
    # change would silently change the codebooks); TakeOrdered on vec_id
    # pins the sample without a full sort.
    samp = assigned.orderBy("vec_id").limit(4096).select("v", "cell").toPandas()
    cents_np = np.asarray(centroids)
    res_sample = np.asarray(samp["v"].tolist(), dtype=np.float64) - cents_np[
        samp["cell"].to_numpy()
    ]
    rng = np.random.default_rng(42)
    luts: dict[int, list[list[float]]] = {}
    for j in range(m):
        x = res_sample[:, j * d_sub : (j + 1) * d_sub]
        cents = x[rng.choice(len(x), size=min(ksub, len(x)), replace=False)]
        for _ in range(10):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign_ = d2.argmin(axis=1)
            for c in range(ksub):
                pts = x[assign_ == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        luts[j] = [list(map(float, c)) for c in cents]

    # -- encode: residual = v - cell centroid (JVM zip_with), then nearest
    # residual-codebook centroid per subspace as a JVM argmin
    cb = spark.createDataFrame(
        [tuple([luts[j] for j in range(m)])],
        ", ".join(f"cb_{j} array<array<double>>" for j in range(m)),
    )
    coded = (
        assigned.join(F.broadcast(cent_df), "cell")
        .withColumn("res", F.expr("zip_with(v, centroid, (x, y) -> x - y)"))
        .join(F.broadcast(cb))
    )
    for j in range(m):
        dists = (
            f"transform(cb_{j}, c -> aggregate(zip_with(slice(res, {j * d_sub + 1}, {d_sub}), c,"
            f" (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x))"
        )
        coded = coded.withColumn(
            f"code_{j}", F.expr(f"int(array_position({dists}, array_min({dists})) - 1)")
        )
    coded = coded.select(
        "vec_id", "cell", "nrm", "v", *[f"code_{j}" for j in range(m)]
    ).localCheckpoint()  # scored scan + rerank both read it

    # -- queries: probe the n_probe nearest cells; q.c exact per probe
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    cdist2 = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
    )
    qdotc = F.expr("aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, x) -> a + x)")
    wq = Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("cell"))
    probed = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("dist2", cdist2)
        .withColumn("q_dot_c", qdotc)
        .withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "qnrm", "cell", "q_dot_c")
    )

    # -- per-query residual LUTs: q . codebook_centroid partial dots
    cent_rows = spark.createDataFrame(
        [(j, ci, c) for j, cents in luts.items() for ci, c in enumerate(cents)],
        "sub int, code int, centroid array<double>",
    )
    part_dot = F.expr(
        "aggregate(zip_with(slice(qv, sub * 8 + 1, 8), centroid, (x, y) -> x * y),"
        " 0D, (acc, x) -> acc + x)"
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

    # -- ADC scan over probed cells only: codes + norms, no raw vectors
    adc_res = F.expr(
        "aggregate(sequence(0, 7),"
        " 0D,"
        " (acc, j) -> acc + element_at(element_at(lut, j + 1),"
        "   int(element_at(array(code_0, code_1, code_2, code_3, code_4, code_5, code_6, code_7), j + 1)) + 1))"
    )
    scored = (
        coded.drop("v")
        .join(
            F.broadcast(probes),
            (coded.cell == probes.cell) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("adc_cosine", (F.col("q_dot_c") + adc_res) / (F.col("qnrm") * F.col("nrm")))
        .select("query_id", "vec_id", "qnrm", "adc_cosine")
        .dropDuplicates(["query_id", "vec_id"])
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc_cosine").desc(), F.col("vec_id"))
    short = (
        scored.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= shortlist)
        .select("query_id", "qnrm", "vec_id")
    )

    # -- exact rerank on the shortlist only
    rer = (
        short.join(coded.select("vec_id", "v", "nrm"), "vec_id")
        .join(queries.select("query_id", "qv"), "query_id")
        .withColumn(
            "cosine",
            F.round(
                F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "embedding_cosine_hist",
    tags=("similarity", "agg"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
      FROM v a JOIN v b
        ON a.vec_id < b.vec_id
       AND (a.vec_id * 1000003 + b.vec_id) % 17 = 0
    )
    SELECT CAST(floor(cos * 20) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(cos AS DECIMAL(9,6))) AS DOUBLE) / count(*), 6)
             AS avg_cos
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
)
def embedding_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a deterministic hash sample of vector
    pairs (bucket width 0.05): the corpus-geometry profile that tells you
    whether near-dup thresholds and ANN cell counts are sane BEFORE running
    them -- a hub-shaped bump near 1.0 predicts LSH hot buckets. Cosines are
    rounded to 6 dp before bucketing, and the per-bucket mean accumulates
    through DECIMAL, so both engines bucket and average identically.

    Scale: the all-pairs join is hash-SAMPLED by construction
    ((id_a * 1000003 + id_b) mod 17 here; mod ~1e6 at corpus scale), so
    candidate volume is tunable; the self-join broadcasts the smaller
    projected (id, vec, norm) side and the histogram is a 41-state agg."""
    v = _vectors(spark, sf_dir).select("vec_id", "v", "nrm")
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("id_a") < F.col("id_b"))
            & ((F.col("id_a") * 1000003 + F.col("id_b")) % 17 == 0),
        )
        .select(F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos"))
    )
    return (
        pairs.groupBy(F.floor(F.col("cos") * 20).cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("cos").cast("decimal(9,6)")).cast("double") / F.count("*"),
                6,
            ).alias("avg_cos"),
        )
        .orderBy("bucket")
    )


# rows-only: eigenvector computation is iterative (power method), not
# SQL-expressible; the numpy cross-check lives in tests/test_northstar.py.
@register("embedding_pca_pc1", tags=("similarity", "northstar"))
def embedding_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, first principal component: per-label projection
    profile onto the corpus's top variance direction plus the share of
    variance it explains -- the embedding-drift / index-health probe (a
    collapsing PC1 share means the space went anisotropic and IVF cells
    need retraining; per-label mean separation on PC1 is a cheap
    linear-probe signal).

    Scale shape (the standard big-data PCA split):
    - moment accumulation is DISTRIBUTED: each Arrow batch folds to one
      (count, sum-vector, X^T X flattened) partial via ``mapInPandas`` --
      d + d^2 floats per TASK, independent of rows;
    - the d x d eigenproblem is DRIVER-side (64x64 here -- a model-fit
      artifact exactly like ``knn_cosine_ivf``'s KMeans step): a
      deterministic symmetric eigendecomposition, sign fixed by the
      largest-|component| coordinate (power iteration would need
      O(log eps / log(lam2/lam1)) rounds -- needlessly slow when the top
      eigengap is small, and the matrix is driver-tiny anyway);
    - projection is JVM-side: the centered dot product runs as a
      ``zip_with``/``aggregate`` fold against broadcast literal arrays --
      no Python in the per-row path.
    """
    if _vectors_probe(spark, sf_dir, 2) < 2:  # < 2 vectors: zero covariance, no eigenproblem
        return spark.createDataFrame(
            [],
            "label int, n long, mean_pc1 double, min_pc1 double, max_pc1 double, pc1_var_share double",
        )
    import numpy as np
    import pandas as pd

    vec = _vectors(spark, sf_dir).select("vec_id", "label", "v")
    d = 64

    def partials(batches):
        for pdf in batches:
            X = np.stack(pdf["v"].to_numpy())
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "p": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = vec.mapInPandas(
        partials, "n long, s array<double>, p array<double>"
    ).toPandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    P = np.sum(np.stack(parts["p"].to_numpy()), axis=0).reshape(d, d)
    mu = s / n
    cov = P / n - np.outer(mu, mu)
    w, V = np.linalg.eigh(cov)
    v, lam = V[:, -1], float(w[-1])
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    var_share = lam / float(np.trace(cov))

    mu_lit = F.array(*[F.lit(float(x)) for x in mu])
    v_lit = F.array(*[F.lit(float(x)) for x in v])
    centered_dot = F.aggregate(
        F.zip_with(F.col("v"), F.zip_with(mu_lit, v_lit, lambda m, w: F.struct(m.alias("m"), w.alias("w"))),
                   lambda x, mw: (x - mw["m"]) * mw["w"]),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = vec.select(
        "label", F.round(centered_dot, 6).cast("decimal(18,6)").alias("pc1")
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("pc1").cast("double") / F.count("*"), 6).alias("mean_pc1"),
            F.round(F.min("pc1").cast("double"), 6).alias("min_pc1"),
            F.round(F.max("pc1").cast("double"), 6).alias("max_pc1"),
        )
        .withColumn("pc1_var_share", F.round(F.lit(var_share), 6))
        .orderBy("label")
    )


@register(
    "embedding_outlier_mahalanobis",
    tags=("similarity", "quality", "northstar"),
    oracle=f"""
    WITH d AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    stats AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(TRY_CAST(round(x * 1000000) AS BIGINT) AS HUGEINT))
                  AS DOUBLE) / 1000000 AS s1,
             CAST(sum(CAST(TRY_CAST(round(x * 1000000) AS BIGINT) AS HUGEINT)
                      * TRY_CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
                  / 1000000 / 1000000 AS s2
      FROM d GROUP BY 1
    ),
    sc AS (
      SELECT d.vec_id, d.label,
             TRY_CAST(round(
               (d.x - s.s1 / s.n) * (d.x - s.s1 / s.n)
               / ((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6)
               AS DECIMAL(18,6)) AS term
      FROM d JOIN stats s ON d.dim = s.dim
    )
    SELECT vec_id, CAST(label AS INT) AS label,
           round(sqrt(CAST(sum(term) AS DOUBLE)), 4) AS mdist
    FROM sc GROUP BY 1, 2
    ORDER BY mdist DESC, vec_id LIMIT 20
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis embedding outliers: each vector scored by its
    squared z-distance summed over dimensions (the covariance diagonal --
    the practical high-d approximation, since the full inverse is both
    expensive and ill-conditioned at d=64), top-20 most anomalous -- the
    detector that catches corrupted encodes and wrong-modality rows BEFORE
    they poison ANN training (complements ``embedding_norm_stats``, which
    only sees magnitude). Per-dimension moments accumulate as exact
    integers at 1e-6 quantization (HUGEINT / DECIMAL), per-dim score terms
    snap to 6 dp DECIMAL before the row sum, so ranking is
    accumulation-order-free.

    Scale: posexplode to (dim, x) grain partial-aggregates to |dims|
    moment rows (broadcast back); the score join is map-side; final is
    TakeOrderedAndProject."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = e.select(
        "vec_id",
        "label",
        F.posexplode(F.expr(_VEC_D)).alias("dim", "x"),
    )
    # try_cast: a component past the 1e-6-quantized BIGINT range (a
    # cosmically corrupt encode) must degrade to a NULL contribution, not
    # crash the detector whose whole job is surfacing corrupt rows
    qb = F.round(F.col("x") * 1_000_000).try_cast("bigint")
    q = qb.cast("decimal(38,0)")
    stats = d.groupBy("dim").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum(q).cast("double") / 1e6).alias("s1"),
        (F.sum(q * qb).cast("double") / 1e12).alias("s2"),
    )
    # n >= 2: a single-row corpus has no sample variance -- the join below
    # then produces no terms and the operator returns 0 rows (ANSI-safe)
    stats = stats.filter(F.col("n") >= 2)
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    term = F.round((F.col("x") - mean) * (F.col("x") - mean) / var, 6).try_cast(
        "decimal(18,6)"
    )
    return (
        d.join(F.broadcast(stats), "dim")
        .groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum(term).cast("double")), 4).alias("mdist"))
        .select("vec_id", F.col("label").cast("int").alias("label"), "mdist")
        .orderBy(F.col("mdist").desc(), "vec_id")
        .limit(20)
    )


@register(
    "knn_label_purity",
    tags=("similarity", "eval"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label, c.label AS n_label,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine,
             c.vec_id AS neighbor_id
      FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id
    ),
    topk AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk
      FROM scored
    )
    SELECT query_id, CAST(max(query_label) AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           round(CAST(sum(CASE WHEN n_label = query_label THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS purity
    FROM topk WHERE rnk <= {TOP_K}
    GROUP BY query_id
    """,
)
def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality probe: for each of 50 query vectors, the
    fraction of its exact top-10 cosine neighbors that share its label --
    the kNN-classifier sanity check run before trusting an embedding
    column for clustering, dedup, or retrieval (purity near 1/|labels| =
    the space carries no signal). Ranking matches knn_cosine_topk's
    convention exactly: round(cosine, 6) descending, neighbor_id
    tiebreak.

    Scale: 50 broadcast queries x corpus scored map-side (JVM array
    folds), then the knn_cosine_topk two-stage reduction -- a LOCAL
    top-k per (query, partition) via WindowGroupLimit(Partial) BEFORE
    the global rank window, so the shuffle carries partitions x queries
    x k narrow rows regardless of corpus size; the purity agg is
    |queries| rows."""
    vec = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    q = vec.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    scored = (
        vec.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (F.col("qnrm") * F.col("nrm")), 6))
        .select("query_id", "query_label", F.col("label").alias("n_label"), "cosine", "vec_id")
    )

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .groupBy("query_id")
        .agg(
            F.max("query_label").cast("int").alias("label"),
            F.count("*").cast("bigint").alias("n_neighbors"),
            F.round(
                F.sum((F.col("n_label") == F.col("query_label")).cast("int")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("purity"),
        )
    )


@register(
    "knn_graph_reciprocity",
    tags=("similarity", "graph", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    scored AS (
      SELECT a.vec_id AS src, a.label AS src_label, b.vec_id AS dst,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, src_label, dst FROM (
        SELECT *, row_number() OVER (
          PARTITION BY src ORDER BY cosine DESC, dst
        ) AS rnk FROM scored
      ) t WHERE rnk <= 10
    ),
    mut AS (
      SELECT a.src, a.src_label,
             CAST(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END AS INT) AS m
      FROM knn a LEFT JOIN knn b ON a.src = b.dst AND a.dst = b.src
    )
    SELECT src_label AS label,
           CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(m) AS BIGINT) AS n_mutual,
           round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS reciprocity
    FROM mut GROUP BY src_label
    """,
)
def knn_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-edge rate of the exact k=10 cosine kNN graph, per label:
    the embedding-space health probe behind "are these clusters real" --
    high reciprocity means points sit in coherent neighbourhoods
    (mutual-kNN is the backbone graph HDBSCAN/UMAP trust); a label whose
    reciprocity collapses is a smeared or fragmented cluster
    (knn_label_purity measures agreement of neighbours' labels; this
    measures the SYMMETRY of the neighbourhood relation itself, which
    purity cannot see).

    Engine side scores all-pairs with the corpus broadcast to itself --
    honest at fixture scale and for the bounded eval subsets this
    diagnostic runs on. At 10^9 vectors the same operator consumes the
    persisted ANN index instead (query_ann_index over the corpus in
    batches gives the approximate kNN graph; the reciprocity fold below
    is unchanged) -- the reciprocity computation itself is two
    |V|*k-row relations self-joined on the (src, dst) key, linear in
    the graph, never in the pair space.

    Exactness: cosines round at 6dp BEFORE the rank window (the
    knn_cosine_topk precedent) with neighbor-id tiebreaks, so both
    engines rank identically; everything after is exact integers."""
    k = 10
    vec = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    knn = _exact_knn_edges(spark, vec, k).select(
        "src", "src_label", "dst"
    ).localCheckpoint(eager=False)  # the graph: reused by both join sides
    # mutuality via the CANONICAL-PAIR rollup instead of a knn-vs-knn
    # self-join (whose shared lineage makes Spark resolve both sides of
    # the reversed-edge condition to the same attributes): each directed
    # edge contributes one row under its unordered (u, w) key; a key with
    # both directions present counts 2. The groupBy emits fresh
    # attributes, so the join-back is unambiguous by construction.
    pairs = (
        knn.groupBy(
            F.least("src", "dst").alias("pu"), F.greatest("src", "dst").alias("pw")
        )
        .agg(F.count("*").alias("nd"))
    )
    mut = (
        knn.withColumn("u", F.least("src", "dst"))
        .withColumn("w", F.greatest("src", "dst"))
        .join(
            pairs, (F.col("u") == F.col("pu")) & (F.col("w") == F.col("pw"))
        )
        .select(
            "src",
            "src_label",
            F.when(F.col("nd") == 2, 1).otherwise(0).alias("m"),
        )
    )
    return mut.groupBy(F.col("src_label").alias("label")).agg(
        F.count_distinct("src").cast("bigint").alias("n_nodes"),
        F.count("*").cast("bigint").alias("n_edges"),
        F.sum("m").cast("bigint").alias("n_mutual"),
        F.round(F.sum("m").cast("double") / F.count("*"), 6).alias("reciprocity"),
    )


@register(
    "embedding_kdist_profile",
    tags=("similarity", "northstar"),
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    scored AS (
      SELECT a.vec_id AS src, a.label AS label, b.vec_id AS dst,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    kd AS (
      SELECT src, label,
             CAST(round(1 - cosine, 6) AS DECIMAL(18,6)) AS kdist
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY src ORDER BY cosine DESC, dst
        ) AS rnk FROM scored
      ) t WHERE rnk = 10
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(kdist) AS DOUBLE) AS min_kdist,
           round(CAST(sum(kdist) AS DOUBLE) / count(*), 6) AS avg_kdist,
           CAST(max(kdist) AS DOUBLE) AS max_kdist
    FROM kd GROUP BY label
    """,
)
def embedding_kdist_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-distance profile (cosine distance to the 10th nearest
    neighbour) per label: the density diagnostic behind DBSCAN/HDBSCAN
    eps selection and ANN recall triage -- a label whose 10-distance is
    large lives in sparse space (poor cluster; expect low IVF recall
    there), a near-zero one is dense/duplicated. Companion to
    knn_graph_reciprocity (symmetry) and embedding_norm_stats (scale).

    Exactness: cosines round at 6dp before the rank window (identical
    ranking both engines); the k-distance is stored as DECIMAL(18,6) so
    the per-label mean is an EXACT decimal sum divided once -- no
    accumulation-order ulps (the quantile-interpolation lesson: profile
    by min/mean/max over exact decimals, not interpolated percentiles).

    Scale: the scoring reuses the exact-kNN shape (corpus broadcast at
    fixture scale, ANN-index-fed at 10^9 vectors); after the rank window
    only |V| (src, kdist) rows remain, and the profile is a |labels|
    rollup."""
    k = 10
    vec = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    # r14: the all-pairs scoring + rank rides the shared Arrow/BLAS kNN
    # generator (see _exact_knn_edges) -- identical 6dp-rounded ranking,
    # measured 1145 -> ~8 executor-CPU-s at sf0.1
    kd = (
        _exact_knn_edges(spark, vec, k)
        .filter(F.col("rnk") == k)
        .select(
            "src",
            F.col("src_label").alias("label"),
            F.round(1 - F.col("cosine"), 6).cast("decimal(18,6)").alias("kdist"),
        )
    )
    return kd.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("kdist").cast("double").alias("min_kdist"),
        F.round(F.sum("kdist").cast("double") / F.count("*"), 6).alias("avg_kdist"),
        F.max("kdist").cast("double").alias("max_kdist"),
    )


@register(
    "embedding_truncation_recall",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ), tr AS (
      SELECT vec_id, d.dims, v[1:d.dims] AS vd
      FROM v, (VALUES (16),(32),(64)) AS d(dims)
    ), tn AS (
      SELECT vec_id, dims, vd, sqrt(list_dot_product(vd, vd)) AS nrm FROM tr
    ), scored AS (
      SELECT c.dims, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.vd, c.vd) / nullif(q.nrm * c.nrm, 0), 6) AS cosine
      FROM tn q JOIN tn c ON q.dims = c.dims AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ), topk AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY dims, query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      ) t WHERE rnk <= {TOP_K}
    ), base AS (
      SELECT query_id, neighbor_id FROM topk WHERE dims = 64
    ), bn AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_base FROM base GROUP BY 1
    ), hits AS (
      SELECT t.dims, t.query_id, CAST(count(b.neighbor_id) AS BIGINT) AS hit
      FROM topk t LEFT JOIN base b
        ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
      GROUP BY 1, 2
    ), rec AS (
      SELECT dims, round(CAST(hit AS DOUBLE) / n_base, 6) AS r
      FROM hits h JOIN bn USING (query_id)
    )
    SELECT CAST(dims AS INT) AS dims,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(avg(CAST(r AS DECIMAL(18,6))) AS DOUBLE), 6) AS avg_recall,
           round(min(r), 6) AS min_recall
    FROM rec GROUP BY dims
    """,
)
def embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval: recall@k of exact cosine top-k
    when only the first 16 / 32 / 64 embedding dimensions are kept,
    against the full-dimension baseline. THE go/no-go measurement before
    shipping truncated vectors (Kusupati et al. 2022's MRL popularized
    prefix-truncation as the cheap ANN memory lever; embeddings NOT
    trained for it degrade sharply -- which is exactly what this
    surfaces, e.g. 1.00 -> 0.32 -> 0.18 on the synthetic fixture).
    Completes the recall-eval family: knn_recall_eval grades ANN
    algorithms at full dimension; this grades the REPRESENTATION at
    reduced dimension. Per-query denominators are the baseline's exact
    neighbor count (the knn_recall_eval lesson), 6dp-snapped cosines +
    neighbor_id tiebreak keep every top-k set engine-identical.

    Scale: the corpus never shuffles for scoring (queries broadcast; the
    x3 dims explode is map-side slice work). The ranking window here
    carries Q x N x 3 rows at fixture scale for oracle twinability; at
    100 TB you run it on the SAME hash-sampled eval slice every recall
    eval uses (the metric is a per-query average -- sampling queries,
    not corpus, is the published protocol), or swap in the local-top-k
    reducer from knn_cosine_topk verbatim."""
    vec = _vectors(spark, sf_dir)
    tr = (
        vec.select(
            "vec_id",
            "v",
            F.explode(F.array(F.lit(16), F.lit(32), F.lit(64))).alias("dims"),
        )
        .select("vec_id", "dims", F.expr("slice(v, 1, dims)").alias("vd"))
        .withColumn("nrm", F.expr("sqrt(aggregate(vd, 0D, (acc, x) -> acc + x * x))"))
    )
    q = tr.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("dims").alias("qdims"),
        F.col("vd").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.expr(
        "aggregate(zip_with(qv, vd, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    scored = (
        tr.join(
            F.broadcast(q),
            (F.col("dims") == F.col("qdims")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            F.round(dot / F.nullif(F.col("qnrm") * F.col("nrm"), F.lit(0.0)), 6),
        )
        .select("dims", "query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("dims", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    base = topk.filter(F.col("dims") == 64).select("query_id", "neighbor_id")
    bn = base.groupBy("query_id").agg(F.count("*").cast("bigint").alias("n_base"))
    hits = (
        topk.alias("t")
        .join(
            base.alias("b"),
            (F.col("t.query_id") == F.col("b.query_id"))
            & (F.col("t.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("t.dims").alias("dims"), F.col("t.query_id").alias("query_id"))
        .agg(F.count(F.col("b.neighbor_id")).cast("bigint").alias("hit"))
    )
    rec = hits.join(F.broadcast(bn), "query_id").select(
        "dims",
        F.round(F.col("hit").cast("double") / F.col("n_base"), 6).alias("r"),
    )
    return (
        rec.groupBy("dims")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.round(F.avg(F.col("r").cast("decimal(18,6)")).cast("double"), 6).alias(
                "avg_recall"
            ),
            F.round(F.min("r"), 6).alias("min_recall"),
        )
        .withColumn("dims", F.col("dims").cast("int"))
    )


@register(
    "knn_hubness_profile",
    tags=("similarity", "northstar", "stats"),
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT *, row_number() OVER (
          PARTITION BY src ORDER BY cosine DESC, dst
        ) AS rnk FROM scored
      ) t WHERE rnk <= 10
    ),
    indeg AS (
      SELECT v.vec_id, v.label, CAST(count(k.src) AS BIGINT) AS d
      FROM v LEFT JOIN knn k ON v.vec_id = k.dst
      GROUP BY 1, 2
    ),
    m AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * d) AS BIGINT) AS s2,
             CAST(sum(d * d * d) AS BIGINT) AS s3,
             CAST(max(d) AS BIGINT) AS max_in_degree,
             CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
             CAST(sum(CASE WHEN d >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_hubs
      FROM indeg GROUP BY 1
    )
    SELECT label, n_nodes, max_in_degree,
           round(CAST(n_orphans AS DOUBLE) / n_nodes, 6) AS orphan_rate,
           round(CAST(n_hubs AS DOUBLE) / n_nodes, 6) AS hub_rate,
           round((CAST(s3 AS DOUBLE) / n_nodes
                  - 3 * (CAST(s1 AS DOUBLE) / n_nodes) * (CAST(s2 AS DOUBLE) / n_nodes)
                  + 2 * (CAST(s1 AS DOUBLE) / n_nodes) * (CAST(s1 AS DOUBLE) / n_nodes)
                      * (CAST(s1 AS DOUBLE) / n_nodes))
                 / nullif(sqrt(CAST(s2 AS DOUBLE) / n_nodes
                               - (CAST(s1 AS DOUBLE) / n_nodes) * (CAST(s1 AS DOUBLE) / n_nodes))
                          * (CAST(s2 AS DOUBLE) / n_nodes
                             - (CAST(s1 AS DOUBLE) / n_nodes) * (CAST(s1 AS DOUBLE) / n_nodes)), 0),
                 6) AS indeg_skewness
    FROM m
    """,
)
def knn_hubness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness profile of the exact k=10 cosine kNN graph, per label:
    in-degree skewness, orphan rate (never anyone's neighbour), hub rate
    (in-degree >= 2k), and the max hub -- the high-dimensional pathology
    meter (Radovanovic et al. 2010: as dimension grows, a few points
    become everyone's neighbour and retrieval quality silently degrades).
    knn_graph_reciprocity measures edge SYMMETRY; this measures the
    in-degree DISTRIBUTION those edges induce -- the two failure axes of
    an embedding space.

    Exactness: cosines round at 6dp before the rank window (the family
    precedent); in-degrees are exact integers via a LEFT join from the
    node universe (orphans exist only on that side), and skewness comes
    from the three exact integer power sums with the sqrt(m2)*m2
    denominator (IEEE-correctly-rounded, no pow).

    Scale: same contract as reciprocity -- all-pairs is honest at
    fixture/eval scale, and at 10^9 vectors the SAME fold
    (``hubness_from_edges``) consumes query_ann_index batches: the
    profile is linear in the |V|*k edge list and only neighbor
    generation changes. That claim is an EXECUTED path, not prose --
    tests/test_ann_index.py::test_hubness_fold_consumes_ann_index_edges
    feeds this exact fold from a full-probe prebuilt-index run and
    asserts agreement with the all-pairs profile."""
    k = 10
    vec = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    # r14: the all-pairs scoring + rank rides the shared Arrow/BLAS kNN
    # generator (see _exact_knn_edges) -- identical 6dp-rounded ranking,
    # measured 605 -> ~8 executor-CPU-s at sf0.1
    knn = _exact_knn_edges(spark, vec, k).select("src", "dst")
    return hubness_from_edges(vec.select("vec_id", "label"), knn, k=k)


def hubness_from_edges(nodes: DataFrame, knn_edges: DataFrame, *, k: int) -> DataFrame:
    """In-degree distribution profile of a kNN edge list, per label:
    the generation-agnostic fold behind knn_hubness_profile. ``nodes``
    carries (vec_id, label) -- the node UNIVERSE, so orphans (never
    anyone's neighbour) are counted; ``knn_edges`` carries (src, dst)
    directed neighbour edges from ANY generator: the all-pairs exact
    scorer at eval scale, or ``ann_index.query_ann_index`` batches
    (query_id -> src, neighbor_id -> dst) at 10^9-vector scale. Linear
    in |edges|; one shuffle at node grain, one at label grain."""
    indeg = (
        nodes
        .join(
            knn_edges.select(F.col("dst").alias("vec_id"), F.lit(1).alias("one")),
            "vec_id",
            "left",
        )
        .groupBy("vec_id", "label")
        .agg(F.sum(F.coalesce(F.col("one"), F.lit(0))).cast("bigint").alias("d"))
    )
    m = indeg.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum("d").cast("bigint").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).cast("bigint").alias("s3"),
        F.max("d").cast("bigint").alias("max_in_degree"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0)).cast("bigint").alias("n_orphans"),
        F.sum(F.when(F.col("d") >= 2 * k, 1).otherwise(0)).cast("bigint").alias("n_hubs"),
    )
    nd = F.col("n_nodes").cast("double")
    mu = F.col("s1").cast("double") / F.col("n_nodes")
    m2 = F.col("s2").cast("double") / F.col("n_nodes") - mu * mu
    m3 = (
        F.col("s3").cast("double") / F.col("n_nodes")
        - 3 * mu * (F.col("s2").cast("double") / F.col("n_nodes"))
        + 2 * mu * mu * mu
    )
    return m.select(
        "label", "n_nodes", "max_in_degree",
        F.round(F.col("n_orphans").cast("double") / nd, 6).alias("orphan_rate"),
        F.round(F.col("n_hubs").cast("double") / nd, 6).alias("hub_rate"),
        F.round(m3 / F.nullif(F.sqrt(m2) * m2, F.lit(0.0)), 6).alias("indeg_skewness"),
    )


@register(
    "embedding_isotropy",
    tags=("similarity", "northstar", "stats"),
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    comp AS (
      SELECT vec_id, t.i AS dim,
             CAST(floor(v.v[t.i] / nrm * 1000000000) AS BIGINT) AS m
      FROM v, unnest(generate_series(1, len(v.v))) AS t(i)
    ),
    dims AS (
      SELECT dim, CAST(sum(m) AS BIGINT) AS s FROM comp GROUP BY dim
    ),
    q AS (
      SELECT CAST(sum(CAST(m AS DECIMAL(38,0)) * m) AS DECIMAL(38,0)) AS qq,
             CAST(count(DISTINCT vec_id) AS BIGINT) AS n
      FROM comp
    ),
    ss AS (
      SELECT CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS s2
      FROM dims
    )
    SELECT n AS n_vectors,
           (SELECT CAST(count(*) AS BIGINT) FROM dims) AS dim,
           round(CAST(s2 - qq AS DOUBLE) / 1e18
                 / nullif(CAST(n AS DOUBLE) * (n - 1), 0), 6)
             AS mean_pairwise_cosine
    FROM q CROSS JOIN ss
    """,
)
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy probe: the mean pairwise cosine across ALL vector pairs,
    computed WITHOUT forming a single pair -- sum the unit vectors
    per dimension and use sum_{i<>j} cos(i,j) = ||sum u||^2 - sum ||u||^2.
    A mean cosine far above 0 is the anisotropic "narrow cone" pathology
    (Ethayarajh 2019): similarity scores compress, thresholds stop
    separating, and centering/whitening is indicated. The cheapest
    whole-corpus geometry check -- one pass, no pair space, no sampling.

    Exactness: unit-vector components quantize to FLOOR(u * 10^9)
    integers (floor, not round: round's half-up vs half-even tie split
    across engines is the laspeyres lesson; floor has no ties), so the
    per-dimension sums, their squares, and the self-norm correction are
    all exact DECIMAL(38,0) -- one double division at the end. The
    quantization bias is O(1e-9 * sqrt(d)), invisible at 6 dp.

    Scale: posexplode to (dim, component) -- the only wide relation, d
    rows per vector -- then a d-row partial agg; n and the self-term ride
    the same pass. At 10^9 x 1k-dim this is exactly the shuffle shape of
    embedding_dim_profile, linear and map-side-combinable."""
    vec = _vectors(spark, sf_dir)
    comp = vec.select(
        "vec_id",
        F.posexplode(F.col("v")).alias("dim", "x"),
        F.col("nrm"),
    ).select(
        "vec_id",
        (F.col("dim") + 1).alias("dim"),  # 1-based like UNNEST WITH ORDINALITY
        F.floor(F.col("x") / F.col("nrm") * 1e9).cast("bigint").alias("m"),
    ).localCheckpoint(eager=False)  # dims + q reuse it
    dims = comp.groupBy("dim").agg(F.sum("m").cast("bigint").alias("s"))
    q = comp.agg(
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m"))
        .cast("decimal(38,0)").alias("qq"),
        F.count_distinct(F.col("vec_id")).cast("bigint").alias("n"),
    )
    ss = dims.agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s"))
        .cast("decimal(38,0)").alias("s2"),
        F.count("*").cast("bigint").alias("dim"),
    )
    return q.crossJoin(F.broadcast(ss)).select(
        F.col("n").alias("n_vectors"),
        "dim",
        F.round(
            (F.col("s2") - F.col("qq")).cast("double") / 1e18
            / F.nullif(F.col("n").cast("double") * (F.col("n") - 1), F.lit(0.0)),
            6,
        ).alias("mean_pairwise_cosine"),
    )


@register(
    "embedding_label_centroid_similarity",
    tags=("similarity", "northstar"),
    oracle="""
    WITH d AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings
    ),
    cs AS (
      -- TRY_CAST mirrors the engine's totality contract: a hostile
      -- component NULLs out of the sum on BOTH sides (sum skips NULLs,
      -- count(*) keeps the row), so hostile fixtures agree too
      SELECT label, dim,
             CAST(sum(TRY_CAST(round(x, 9) AS DECIMAL(18,9))) AS DOUBLE)
               / count(*) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2
    ),
    cen AS (
      SELECT label, list(c ORDER BY dim) AS cv, min(n) AS n
      FROM cs GROUP BY 1
    )
    SELECT a.label AS label_a, b.label AS label_b,
           a.n AS n_a, b.n AS n_b,
           round(list_dot_product(a.cv, b.cv)
                 / nullif(sqrt(list_dot_product(a.cv, a.cv))
                          * sqrt(list_dot_product(b.cv, b.cv)), 0), 6)
             AS centroid_cosine
    FROM cen a JOIN cen b ON a.label < b.label
    ORDER BY 1, 2
    """,
)
def embedding_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding CENTROIDS:
    the class-separation matrix -- two labels whose centroids sit at
    cosine ~1 are indistinguishable to a linear probe (merge or relabel
    them); the matrix is the first read after clustering or an
    embedding-model swap, and the cheap preview of a confusion matrix
    without training anything. Complements embedding_isotropy (global
    geometry) and knn_hubness_profile (neighbourhood pathology) at the
    CLASS grain.

    Exactness: coordinates round at 9 dp and accumulate in DECIMAL per
    (label, dim) -- order-free sums, the embedding_dim_profile recipe;
    centroid components are single IEEE divisions; both engines fold the
    dot products sequentially over identically dim-ordered centroid
    arrays (Spark aggregate/zip_with, DuckDB list_dot_product), and the
    one output division rounds at 6 dp with a nullif guard for a
    degenerate all-zero centroid.

    Scale: one (label, dim)-grain partial agg over the posexploded
    table (|labels| x |dims| cells); the pair join is |labels|^2 --
    dim-bounded."""
    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
    )
    # try_cast: a hostile component (1e154, Inf, NaN) NULLs out of the
    # centroid sum instead of throwing the ANSI decimal-overflow -- the
    # totality sweep's contract; clean fixtures are unaffected
    cs = d.groupBy("label", (F.col("dim0") + 1).alias("dim")).agg(
        (F.sum(F.round(F.col("x"), 9).try_cast("decimal(18,9)")).cast("double") / F.count("*")).alias("c"),
        F.count("*").cast("bigint").alias("n"),
    )
    cen = cs.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)").alias("cv"),
        F.min("n").alias("n"),
    ).localCheckpoint(eager=False)
    a = cen.select(
        F.col("label").alias("label_a"), F.col("cv").alias("ca"), F.col("n").alias("n_a")
    )
    b = cen.select(
        F.col("label").alias("label_b"), F.col("cv").alias("cb"), F.col("n").alias("n_b")
    )
    dot = lambda x, y: F.expr(  # noqa: E731
        f"aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0D, (acc, z) -> acc + z)"
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                dot("ca", "cb")
                / F.nullif(F.sqrt(dot("ca", "ca")) * F.sqrt(dot("cb", "cb")), F.lit(0.0)),
                6,
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )


def mmr_diversify(
    candidates: DataFrame,
    *,
    lam: float = 0.7,
    k: int = 5,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick k results per query maximizing lam * cos(q, d) -
    (1 - lam) * max over already-selected s of cos(d, s) -- relevance
    traded against redundancy, THE standard diversifier between a
    retriever and an LLM context window. ``candidates`` carries
    (query_id, neighbor_id, cosine, v, nrm) -- the shortlist WITH its
    raw vectors (cosine = relevance to the query).

    Deterministic: ties break by neighbor_id ascending at every greedy
    step. The k rounds are bounded data-flow iterations (one
    candidate-vs-selected join + one argmax window per round) over the
    |queries| x |shortlist| relation -- shortlist-sized work, never
    corpus-sized; the corpus only ever contributed the shortlist."""
    sel = None  # (query_id, neighbor_id, mmr_rank, mmr_score)
    # checkpoint ONCE: every greedy round joins back to the candidate
    # vectors, and an un-cut lineage would recompute the shortlist
    # generator k times
    candidates = candidates.localCheckpoint(eager=False)
    remaining = candidates
    dot = F.expr(
        "aggregate(zip_with(v, sv, (p, q) -> p * q), 0D, (acc, z) -> acc + z)"
    )
    for step in range(1, k + 1):
        if step == 1:
            scored = remaining.withColumn("mmr", F.col("cosine") * lam)
        else:
            svec = sel.select("query_id", F.col("neighbor_id").alias("s_id")).join(
                candidates.select(
                    "query_id",
                    F.col("neighbor_id").alias("s_id"),
                    F.col("v").alias("sv"),
                    F.col("nrm").alias("snrm"),
                ),
                ["query_id", "s_id"],
            )
            pen = (
                remaining.join(svec, "query_id")
                .withColumn("sim", F.round(dot / (F.col("nrm") * F.col("snrm")), 6))
                .groupBy("query_id", "neighbor_id")
                .agg(F.max("sim").alias("max_sim"))
            )
            scored = remaining.join(pen, ["query_id", "neighbor_id"]).withColumn(
                "mmr", F.col("cosine") * lam - (1 - lam) * F.col("max_sim")
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("mmr").desc(), F.col("neighbor_id")
        )
        pick = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(step).alias("mmr_rank"),
                F.round("mmr", 6).alias("mmr_score"),
            )
            .localCheckpoint()
        )
        sel = pick if sel is None else sel.unionByName(pick).localCheckpoint()
        remaining = remaining.join(
            pick.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        ).localCheckpoint()
    return sel


@register("knn_mmr_diversified", tags=("similarity", "northstar"))  # rows-only: k greedy rounds
def knn_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 per query (lambda = 0.7) over the exact
    cosine top-20 shortlist: relevance-ranked retrieval re-ordered so
    each added result is novel against what is already picked -- the
    retrieval-diversity operator between knn_cosine_topk (pure
    relevance) and a RAG context assembly. Rows-only by declared
    contract (k greedy argmax rounds are iterative); semantics pinned in
    tests/test_round15_ops.py: constructed vectors where pure top-k
    returns two near-duplicates but MMR must skip the duplicate for the
    diverse third vector, rank-1 always equals the cosine argmax, picks
    are distinct, and the fixture run is deterministic across
    executions.

    Scale: shortlist-sized dataflow per round (|queries| x 20 rows, the
    selected set joins by key); the corpus contributes only through the
    shortlist generator, which is the ANN index path at production
    scale."""
    k_short = 20
    # the shortlist comes from the SAME scalable two-stage generator as
    # knn_cosine_topk (queries broadcast, corpus never shuffles, local
    # top-k before the rank window) -- not a re-derived scorer; the
    # |queries| x 20 shortlist BROADCASTS into the vector join-back, so
    # the corpus is scanned map-side, never shuffled, for the raw vectors
    vec = _vectors(spark, sf_dir)
    short = _exact_cosine_topk(spark, sf_dir, k_short)
    cands = vec.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v"),
        F.col("nrm"),
    ).join(F.broadcast(short), "neighbor_id")
    return mmr_diversify(
        cands.select("query_id", "neighbor_id", "cosine", "v", "nrm")
    ).orderBy("query_id", "mmr_rank")


# TwoNN runs on a deterministic id-ordered sample: the estimator is
# sample-based by design (Facco et al. 2017 report stability from a few
# hundred points), and the bound prices the quadratic pair space
# permanently -- 512 points = 131k ordered pairs at ANY corpus scale.
TWONN_SAMPLE = 512


@register(
    "embedding_intrinsic_dim_twonn",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH vm AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1e6) AS BIGINT)) AS m
      FROM embeddings
      WHERE vec_id < {TWONN_SAMPLE}
        AND NOT list_has_any(list_transform(CAST(embedding AS DOUBLE[]),
                             x -> isnan(x) OR NOT isfinite(x)
                                  OR abs(x) > 100), [TRUE])
    ),
    pairs AS (
      SELECT a.vec_id AS ai, b.vec_id AS bi,
             list_sum(list_transform(
               list_zip(a.m, b.m),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dsq
      FROM vm a JOIN vm b ON a.vec_id <> b.vec_id
    ),
    rk AS (
      SELECT ai, dsq,
             row_number() OVER (PARTITION BY ai ORDER BY dsq, bi) AS rn
      FROM pairs
    ),
    two AS (
      SELECT d1.ai,
             d1.dsq AS d1sq,
             d2.dsq AS d2sq
      FROM (SELECT ai, dsq FROM rk WHERE rn = 1) d1
      JOIN (SELECT ai, dsq FROM rk WHERE rn = 2) d2 ON d1.ai = d2.ai
    ),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN d1sq > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
             sum(CAST(CASE WHEN d1sq > 0
                 THEN 0.5 * (ln(CAST(d2sq AS DOUBLE)) - ln(CAST(d1sq AS DOUBLE)))
                 ELSE 0 END AS DECIMAL(20,15))) AS lsum
      FROM two
    )
    SELECT n_used AS n_vectors,
           CAST(n_all - n_used AS BIGINT) AS n_degenerate,
           round(CAST(lsum AS DOUBLE) / nullif(n_used, 0), 6) AS mean_ln_mu,
           round(n_used / nullif(CAST(lsum AS DOUBLE), 0), 6) AS intrinsic_dim
    FROM est
    """,
)
def embedding_intrinsic_dim_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intrinsic dimension of the embedding cloud by the TwoNN estimator
    (Facco et al. 2017): for each sample point, mu = d2/d1 (its two
    nearest-neighbor distances); under a locally-uniform density, mu is
    Pareto(ID) and the MLE is ID = n / sum ln(mu). The number that says
    how much of the AMBIENT dimension the data actually uses: an ID of
    ~10 in a 64-dim space means IVF/PQ have room to compress; ID near
    the ambient dim predicts ANN recall pain. Complements
    embedding_dim_profile (per-axis variance -- linear structure) and
    embedding_isotropy (global angle spread) with the NONLINEAR
    manifold's dimension.

    Exactness: components quantize to a 1e-6 floor grid (integer BIGINT
    coordinates -- the embedding_isotropy discipline), so squared
    distances are exact integers with order-free sums; neighbor ranks
    tie-break by id; each ln-ratio snaps to DECIMAL(20,15) before the
    order-free sum; duplicate points (d1 = 0) are excluded from the MLE
    and REPORTED as n_degenerate instead of poisoning the log.

    Scale: the {TWONN_SAMPLE}-point id-ordered sample bounds the pair
    space forever; at 10^9 vectors the same estimator runs on the same
    sample (the published estimator IS sample-based), with the 2-NN
    search optionally served by the persisted ANN index instead of the
    exact pair join."""
    e = load_table(spark, sf_dir, "embeddings")
    vm = (
        e.filter(F.col("vec_id") < TWONN_SAMPLE)
        .select(
            "vec_id",
            F.expr(
                "transform(CAST(embedding AS array<double>),"
                " x -> CAST(floor(x * 1e6) AS BIGINT))"
            ).alias("m"),
            # totality: NaN/Inf AND huge-magnitude components are excluded
            # BEFORE quantization -- |x| <= 100 bounds every diff at 2e8
            # micro-units, so the 64-term squared sum stays under 2^63
            # (hostile-embeddings sweep contract)
            F.expr(
                "exists(CAST(embedding AS array<double>),"
                " x -> isnan(x) OR x = double('inf') OR x = double('-inf')"
                " OR abs(x) > 100D)"
            ).alias("bad"),
        )
        .filter(~F.col("bad"))
        .drop("bad")
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    a = vm.select(F.col("vec_id").alias("ai"), F.col("m").alias("ma"))
    b = vm.select(F.col("vec_id").alias("bi"), F.col("m").alias("mb"))
    pairs = a.join(b, F.col("ai") != F.col("bi")).select(
        "ai",
        "bi",
        F.expr(
            "aggregate(zip_with(ma, mb, (x, y) -> (x - y) * (x - y)),"
            " 0L, (acc, z) -> acc + z)"
        ).alias("dsq"),
    )
    w = Window.partitionBy("ai").orderBy("dsq", "bi")
    rk = pairs.select("ai", "dsq", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 2
    )
    two = (
        rk.filter(F.col("rn") == 1)
        .select("ai", F.col("dsq").alias("d1sq"))
        .join(
            rk.filter(F.col("rn") == 2).select("ai", F.col("dsq").alias("d2sq")),
            "ai",
        )
    )
    est = two.agg(
        F.count("*").cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("d1sq") > 0, 1).otherwise(0)).cast("bigint").alias("n_used"),
        F.sum(
            F.when(
                F.col("d1sq") > 0,
                0.5
                * (
                    F.log(F.col("d2sq").cast("double"))
                    - F.log(F.col("d1sq").cast("double"))
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("decimal(20,15)")
        ).alias("lsum"),
    )
    return est.select(
        F.col("n_used").alias("n_vectors"),
        (F.col("n_all") - F.col("n_used")).cast("bigint").alias("n_degenerate"),
        F.round(
            F.col("lsum").cast("double") / F.nullif(F.col("n_used"), F.lit(0)), 6
        ).alias("mean_ln_mu"),
        F.round(
            F.col("n_used") / F.nullif(F.col("lsum").cast("double"), F.lit(0.0)), 6
        ).alias("intrinsic_dim"),
    )


@register("sample_kcenter_coreset", tags=("similarity", "curation", "northstar"))
# rows-only: greedy farthest-point traversal is iterative (each center
# depends on the argmax under all prior centers) with no SQL twin;
# planted-cluster and radius-monotonicity gates in tests/test_round17_ops.py.
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str, k: int = 16) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus (Gonzalez 1985
    farthest-point traversal, the 2-approximation to the k-center
    objective): seed at the min vec_id, then repeatedly add the point
    farthest from the chosen set, emitting each center with its
    selection distance -- the COVERAGE RADIUS curve. This is the
    diversity-first sampling primitive of LLM data curation (coreset
    selection picks a maximally-spread subset where temperature /
    importance sampling pick by weight), and the radius curve is the
    'how many exemplars until the corpus is covered' read.

    Determinism: seed and every argmax tie break on vec_id; distances
    are squared-L2 of the same doubles on every engine pass.

    Scale: the candidate relation keeps ONE running column (squared
    distance to the nearest chosen center), updated per round by a
    broadcast 1-row join + least() -- additive plan growth (safe to
    localCheckpoint, unlike multiplicative loops; see ktruss), k rounds
    of one job each; the chosen set lives on the driver (k rows)."""
    vec = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=False)
    first = vec.orderBy("vec_id").limit(1).collect()
    if not first:
        return spark.createDataFrame(
            [], "center_rank bigint, vec_id bigint, coverage_radius double"
        )
    centers = [(1, int(first[0]["vec_id"]), None)]
    d2 = F.expr(
        "aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
    )
    cand = vec.join(
        F.broadcast(spark.createDataFrame([(first[0]["v"],)], "c array<double>"))
    ).select("vec_id", "v", d2.alias("mind2")).localCheckpoint()
    for rank in range(2, k + 1):
        far = cand.orderBy(F.col("mind2").desc(), "vec_id").limit(1).collect()
        if not far or far[0]["mind2"] <= 0:
            break  # corpus exhausted (fewer distinct points than k)
        centers.append((rank, int(far[0]["vec_id"]), float(far[0]["mind2"]) ** 0.5))
        cand = (
            cand.join(
                F.broadcast(
                    spark.createDataFrame([(far[0]["v"],)], "c array<double>")
                )
            )
            .select(
                "vec_id", "v", F.least(F.col("mind2"), d2).alias("mind2")
            )
            .localCheckpoint()
        )
    return spark.createDataFrame(
        [(r, vid, round(rad, 6) if rad is not None else None) for r, vid, rad in centers],
        "center_rank bigint, vec_id bigint, coverage_radius double",
    ).orderBy("center_rank")


@register(
    "knn_lowe_ratio_profile",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    rk AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id,
           CAST(max(CASE WHEN rnk = 1 THEN neighbor_id END) AS BIGINT)
             AS nn1_id,
           max(CASE WHEN rnk = 1 THEN cosine END) AS nn1_cosine,
           max(CASE WHEN rnk = 2 THEN cosine END) AS nn2_cosine,
           round((1.0 - max(CASE WHEN rnk = 1 THEN cosine END))
                 / nullif(1.0 - max(CASE WHEN rnk = 2 THEN cosine END), 0), 6)
             AS lowe_ratio,
           CAST(CASE WHEN (1.0 - max(CASE WHEN rnk = 1 THEN cosine END))
                      / nullif(1.0 - max(CASE WHEN rnk = 2 THEN cosine END), 0)
                      < 0.8 THEN 1 ELSE 0 END AS BIGINT) AS is_distinctive
    FROM rk WHERE rnk <= 2
    GROUP BY query_id ORDER BY query_id
    """,
)
def knn_lowe_ratio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowe's ratio test over the exact top-2 neighbors (Lowe 2004,
    the SIFT matching criterion generalized to cosine distance):
    d1/d2 where d = 1 - cosine. A ratio well under the classic 0.8
    fence means the best match is DISTINCTIVE (no runner-up ambiguity
    -- trust it); a ratio near 1 means the query sits in a dense,
    ambiguous neighborhood where top-1 retrieval is a coin flip --
    exactly the queries knn_hubness_profile's hub analysis explains
    corpus-wide, diagnosed here per query. Runs on the same exact
    scorer rails as knn_cosine_topk.

    Exactness: cosines are round(.,6)-snapped before ranking (the
    similarity-family convention), so the ratio is a deterministic
    arithmetic of already-stable values; the zero-distance runner-up
    guards through nullif on both engines.

    Scale: the two-stage exact scorer (broadcast queries, corpus never
    shuffles, partition-local top-k) at k = 2 -- pre-window row count
    is partitions x queries x 2, corpus-size-independent."""
    top2 = _exact_cosine_topk(spark, sf_dir, 2)
    d1 = 1.0 - F.max(F.when(F.col("rnk") == 1, F.col("cosine")))
    d2 = 1.0 - F.max(F.when(F.col("rnk") == 2, F.col("cosine")))
    ratio = d1 / F.nullif(d2, F.lit(0.0))
    return (
        top2.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("neighbor_id")))
            .cast("bigint")
            .alias("nn1_id"),
            F.max(F.when(F.col("rnk") == 1, F.col("cosine"))).alias("nn1_cosine"),
            F.max(F.when(F.col("rnk") == 2, F.col("cosine"))).alias("nn2_cosine"),
            F.round(ratio, 6).alias("lowe_ratio"),
            F.when(ratio < 0.8, F.lit(1)).otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_distinctive"),
        )
        .orderBy("query_id")
    )


@register(
    "embedding_exact_duplicate_audit",
    tags=("similarity", "dq"),
    oracle="""
    WITH g AS (
      SELECT embedding, CAST(count(*) AS BIGINT) AS sz
      FROM embeddings GROUP BY embedding
    )
    SELECT CAST(sum(sz) AS BIGINT) AS n_vectors,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups,
           CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(max(sz) AS BIGINT) AS max_group_size,
           round(CAST(sum(CASE WHEN sz > 1 THEN sz - 1 ELSE 0 END) AS DOUBLE)
                 / sum(sz), 6) AS removable_share
    FROM g
    """,
)
def embedding_exact_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-exact duplicate-vector audit: group the corpus by the
    embedding value itself and profile the collision spectrum. Exact
    duplicates are the degenerate failure every ANN review should rule
    out FIRST -- they are what a re-encoded shard, a default/zero-init
    bug, or a double-ingest produces, they silently distort centroid
    fits (ann_index build) and recall math, and no near-dup machinery
    (dedup_embedding_cosine) is needed to find them. removable_share is
    the storage/compute that pure exact dedup would reclaim.

    Exactness: grouping is by bit-identical float arrays (both engines
    read the same parquet floats; no arithmetic touches the values),
    counts are integers, one share division at 6dp.

    Scale: ONE hash aggregate keyed by the vector bytes (the only time
    vectors themselves shuffle -- at dim 64 the key is 256 bytes,
    comparable to a long text key; for kilodim vectors, pre-hash to
    sha2(vector) and group by the digest, same plan shape as
    multimodal_exact_byte_dedup). The verdict panel is one row."""
    e = load_table(spark, sf_dir, "embeddings")
    g = e.groupBy("embedding").agg(F.count("*").cast("bigint").alias("sz"))
    dup_sz = F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0)).cast("bigint")
    return g.agg(
        F.sum("sz").cast("bigint").alias("n_vectors"),
        F.count("*").cast("bigint").alias("n_distinct"),
        dup_sz.alias("n_in_dup_groups"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        F.max("sz").cast("bigint").alias("max_group_size"),
        F.round(
            F.sum(F.when(F.col("sz") > 1, F.col("sz") - 1).otherwise(0)).cast("double")
            / F.sum("sz"),
            6,
        ).alias("removable_share"),
    )


@register(
    "embedding_split_centroid_drift",
    tags=("similarity", "dq"),
    oracle="""
    WITH comp AS (
      SELECT label, vec_id % 2 AS half, t.i AS idx,
             CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(28,10)) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cen AS (
      SELECT label, half, idx,
             CAST(sum(val) AS DOUBLE) / count(*) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM comp GROUP BY label, half, idx
    ),
    pair AS (
      SELECT a.label, a.idx, a.c AS ca, b.c AS cb, a.n AS n_a, b.n AS n_b
      FROM cen a JOIN cen b
        ON a.label = b.label AND a.idx = b.idx
       AND a.half = 0 AND b.half = 1
    ),
    fold AS (
      SELECT label, any_value(n_a) AS n_a, any_value(n_b) AS n_b,
             CAST(sum(CAST(ca * cb AS DECIMAL(28,14))) AS DOUBLE) AS dot,
             CAST(sum(CAST(ca * ca AS DECIMAL(28,14))) AS DOUBLE) AS na2,
             CAST(sum(CAST(cb * cb AS DECIMAL(28,14))) AS DOUBLE) AS nb2
      FROM pair GROUP BY label
    )
    SELECT label, n_a AS n_half0, n_b AS n_half1,
           round(dot / nullif(sqrt(na2) * sqrt(nb2), 0), 6)
             AS centroid_cosine,
           CAST(CASE WHEN dot / nullif(sqrt(na2) * sqrt(nb2), 0) < 0.98
                THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
    FROM fold ORDER BY label
    """,
)
def embedding_split_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half centroid stability per label: partition each label's
    vectors into two deterministic halves (vec_id parity -- a proxy for
    train/serve or old/new ingestion batches), compute both half
    centroids EXACTLY, and report their cosine. A healthy, well-sampled
    label has split-half centroid cosine ~1 (sampling noise only); a
    label whose halves disagree (< 0.98 flag) is multi-modal,
    mislabeled, or drifting -- the cheapest embedding-drift alarm that
    needs no second corpus, and the per-label refinement of
    embedding_label_centroid_similarity's between-label matrix.

    Exactness: components snap to DECIMAL(28,10) BEFORE the per-dim sums
    (order-free accumulation; the cast of identical doubles is
    identical on both engines), centroids are single divisions, and the
    64 per-dimension cosine terms snap to DECIMAL(28,14) before their
    order-free fold (the Hill/ln-term discipline); one 6dp round.

    Scale: ONE posexplode pass to (label, half, dim) grain --
    |labels| x 2 x dim cells regardless of corpus size, map-side
    combinable; the cosine fold is |labels| x dim arithmetic. Vectors
    never join pairwise."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("idx0", "v"),
    ).select(
        "label",
        "half",
        (F.col("idx0") + 1).alias("idx"),
        F.col("v").cast("double").cast("decimal(28,10)").alias("val"),
    )
    cen = comp.groupBy("label", "half", "idx").agg(
        (F.sum("val").cast("double") / F.count("*")).alias("c"),
        F.count("*").cast("bigint").alias("n"),
    )
    a = cen.filter(F.col("half") == 0).select(
        "label", "idx", F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cen.filter(F.col("half") == 1).select(
        "label", "idx", F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    pair = a.join(b, ["label", "idx"])
    fold = pair.groupBy("label").agg(
        F.first("n_a").alias("n_half0"),
        F.first("n_b").alias("n_half1"),
        F.sum((F.col("ca") * F.col("cb")).cast("decimal(28,14)"))
        .cast("double")
        .alias("dot"),
        F.sum((F.col("ca") * F.col("ca")).cast("decimal(28,14)"))
        .cast("double")
        .alias("na2"),
        F.sum((F.col("cb") * F.col("cb")).cast("decimal(28,14)"))
        .cast("double")
        .alias("nb2"),
    )
    cos = F.col("dot") / F.nullif(F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")), F.lit(0.0))
    return fold.select(
        "label",
        "n_half0",
        "n_half1",
        F.round(cos, 6).alias("centroid_cosine"),
        F.when(cos < 0.98, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("drift_flag"),
    ).orderBy("label")


@register(
    "embedding_int8_recall_eval",
    tags=("similarity", "northstar"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) > 0
        AND isfinite(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))))
    ),
    q8 AS (
      SELECT vec_id, v, nrm,
             list_transform(
               v, x -> CASE WHEN x >= 0
                 THEN floor(x * 127 / list_aggregate(list_transform(v, y -> abs(y)), 'max') + 0.5)
                 ELSE -floor(-x * 127 / list_aggregate(list_transform(v, y -> abs(y)), 'max') + 0.5)
               END) AS qv
      FROM v
    ),
    qn AS (
      SELECT vec_id, v, nrm, qv, sqrt(list_dot_product(qv, qv)) AS qnrm
      FROM q8
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_f,
             round(list_dot_product(q.qv, c.qv)
                   / nullif(q.qnrm * c.qnrm, 0), 6) AS cos_q
      FROM qn q JOIN qn c
        ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    base AS (
      SELECT query_id, neighbor_id, cos_f, cos_q FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos_f DESC, neighbor_id) AS rnk FROM scored
      ) t WHERE rnk <= {TOP_K}
    ),
    test AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos_q DESC, neighbor_id) AS rnk FROM scored
      ) t WHERE rnk <= {TOP_K}
    ),
    bn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_base
           FROM base GROUP BY 1),
    hits AS (
      SELECT t.query_id, CAST(count(b.neighbor_id) AS BIGINT) AS hit
      FROM test t LEFT JOIN base b
        ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
      GROUP BY 1
    ),
    rec AS (
      SELECT h.query_id, round(CAST(h.hit AS DOUBLE) / bn.n_base, 6) AS r
      FROM hits h JOIN bn ON bn.query_id = h.query_id
    ),
    dist AS (
      SELECT CAST(round(abs(cos_f - cos_q), 6) AS DECIMAL(18,6)) AS e
      FROM base
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM rec) AS n_queries,
           (SELECT round(CAST(avg(CAST(r AS DECIMAL(18,6))) AS DOUBLE), 6)
              FROM rec) AS avg_recall,
           (SELECT round(min(r), 6) FROM rec) AS min_recall,
           (SELECT round(CAST(avg(e) AS DOUBLE), 6) FROM dist)
             AS avg_abs_cos_err
    """,
)
def embedding_int8_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantization recall eval: per-vector symmetric scalar
    quantization (scale = 127/max|x_i|, half-away-from-zero via the
    shared floor(x+0.5) form), then recall@{TOP_K} of the quantized
    cosine top-k against the full-precision top-k, plus the mean
    absolute cosine distortion over the baseline pairs. THE go/no-go
    measurement before switching a vector store to int8 (the standard
    4x memory lever: scale cancels inside the cosine, so scoring the
    INTEGER vectors directly is exactly the dequantized cosine).
    Completes the degradation-eval family: embedding_truncation_recall
    grades fewer DIMENSIONS, this grades fewer BITS, knn_recall_eval
    grades the ANN ALGORITHM.

    Exactness: quantized components are exact small integers computed by
    the identical floor expression on both engines; integer dot products
    (<= 127^2 x dims) are exact in doubles; both cosines snap to 6dp
    with neighbor_id tiebreaks so every top-k set is engine-identical;
    per-pair distortions snap to 6dp DECIMAL before the order-free avg.

    Scale: the corpus never shuffles for scoring (queries broadcast;
    quantization is map-side array work). The ranking window carries
    Q x N rows at fixture scale for oracle twinability; at 100 TB run it
    on the hash-sampled eval query slice (the published recall-eval
    protocol) or swap in the local-top-k reducer from knn_cosine_topk
    verbatim."""
    vec = _vectors(spark, sf_dir)
    m = "aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))"
    qn = vec.select(
        "vec_id",
        "v",
        "nrm",
        F.expr(
            f"transform(v, x -> CASE WHEN x >= 0"
            f" THEN floor(x * 127D / {m} + 0.5D)"
            f" ELSE -floor(-x * 127D / {m} + 0.5D) END)"
        ).alias("qv"),
    ).withColumn("qnrm", F.expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x))"))
    q = qn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
        F.col("qv").alias("q_qv"),
        F.col("qnrm").alias("q_qnrm"),
    )
    dot_f = F.expr(
        "aggregate(zip_with(q_v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    dot_q = F.expr(
        "aggregate(zip_with(q_qv, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    scored = (
        qn.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot_f / (F.col("q_nrm") * F.col("nrm")), 6).alias("cos_f"),
            F.round(
                dot_q / F.nullif(F.col("q_qnrm") * F.col("qnrm"), F.lit(0.0)), 6
            ).alias("cos_q"),
        )
        .localCheckpoint(eager=False)  # base + test ranking consumers
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_f").desc(), F.col("neighbor_id")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_q").desc(), F.col("neighbor_id")
    )
    base = (
        scored.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_f", "cos_q")
    )
    test = (
        scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    bn = base.groupBy("query_id").agg(F.count("*").cast("bigint").alias("n_base"))
    hits = (
        test.alias("t")
        .join(
            base.alias("b"),
            (F.col("t.query_id") == F.col("b.query_id"))
            & (F.col("t.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("t.query_id").alias("query_id"))
        .agg(F.count(F.col("b.neighbor_id")).cast("bigint").alias("hit"))
    )
    rec = hits.join(F.broadcast(bn), "query_id").select(
        F.round(F.col("hit").cast("double") / F.col("n_base"), 6).alias("r")
    )
    ra = rec.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(F.avg(F.col("r").cast("decimal(18,6)")).cast("double"), 6).alias(
            "avg_recall"
        ),
        F.round(F.min("r"), 6).alias("min_recall"),
    )
    da = base.agg(
        F.round(
            F.avg(
                F.round(F.abs(F.col("cos_f") - F.col("cos_q")), 6).cast(
                    "decimal(18,6)"
                )
            ).cast("double"),
            6,
        ).alias("avg_abs_cos_err")
    )
    return ra.crossJoin(F.broadcast(da))


PAM_SAMPLE_CAP = 4096  # the documented driver-fit sample bound (kmeans rule)


def _pam_fit(vec, k: int) -> list:
    """Driver-side PAM fit over the bounded vec_id-ordered sample:
    greedy BUILD then ONE best-improvement swap. Returns
    [(medoid_rank, vec_id, vector, swapped_flag)] -- shared by the
    k-medoids panel and the purity/NMI eval so both grade the SAME
    fit. Deterministic: ordered sample, position-tiebroken argmins."""
    import numpy as np

    samp = vec.orderBy("vec_id").limit(PAM_SAMPLE_CAP).toPandas()
    n = len(samp)
    if n == 0:
        return []
    k = min(k, n)
    X = np.asarray(samp["v"].tolist(), dtype=np.float64)
    ids = samp["vec_id"].to_numpy()
    # pairwise Euclidean distances (<= 4096^2 doubles by the sample cap)
    sq = (X * X).sum(axis=1)
    D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0))
    medoids: list[int] = []
    nearest = np.full(n, np.inf)
    for _ in range(k):
        # BUILD: argmin of the objective after adding each candidate
        cand_cost = np.minimum(nearest[:, None], D).sum(axis=0)
        cand_cost[medoids] = np.inf
        m = int(cand_cost.argmin())  # first minimum = lowest vec_id position
        medoids.append(m)
        nearest = np.minimum(nearest, D[:, m])
    swapped_at = -1
    med = np.array(medoids)
    # Swap pass needs a second-nearest medoid to model each point's
    # cost once a medoid is removed; with k == 1 there is none (d2
    # would alias d1, making "removed" cost equal "retained" cost and
    # the delta a lie), so BUILD's single medoid stands as-is.
    if k >= 2:
        dm = D[:, med]                   # n x k
        order = dm.argsort(axis=1)
        d1 = dm[np.arange(n), order[:, 0]]
        d2 = dm[np.arange(n), order[:, 1]]
        who = order[:, 0]
        base_obj = d1.sum()
        best = (0.0, -1, -1)
        for mi in range(k):
            # objective with medoid mi removed, per point
            base = np.where(who == mi, d2, d1)
            # try every non-medoid replacement h at once
            cost_h = np.minimum(base[:, None], D).sum(axis=0)
            cost_h[med] = np.inf
            h = int(cost_h.argmin())
            delta = cost_h[h] - base_obj
            if delta < best[0] - 1e-12:
                best = (float(delta), mi, h)
        if best[1] >= 0:
            med[best[1]] = best[2]
            swapped_at = best[1]
    return [
        (r + 1, int(ids[m]), X[m].tolist(), 1 if r == swapped_at else 0)
        for r, m in enumerate(med)
    ]



@register("cluster_kmedoids_pam", tags=("similarity", "curation", "northstar"))
# rows-only: PAM BUILD + best-improvement swap is iterative (each medoid
# depends on all prior choices) with no SQL twin; planted-cluster,
# objective-monotonicity, and conservation gates in tests/test_round20_ops.py.
def cluster_kmedoids_pam(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    """k-medoids via PAM (Kaufman & Rousseeuw 1987): greedy BUILD picks
    k medoids minimizing total Euclidean deviation, then ONE
    best-improvement SWAP pass corrects BUILD's greed; every cluster
    center is a REAL corpus vector (the property k-means lacks, and why
    medoids are the exemplar-picking primitive of curation: each
    cluster's medoid IS a representative document you can read).
    Output: one row per medoid with its full-corpus cluster size, total
    deviation, deviation share, and whether the swap pass installed it.

    Fit runs on the bounded PAM_SAMPLE_CAP-row vec_id-ordered sample
    (the documented driver-fit rule shared with the IVF k-means); the
    ASSIGNMENT is fully distributed -- k medoid vectors broadcast, each
    corpus vector scores k distances map-side (k x N rows fold through
    one partial agg; the corpus never shuffles wide). Per-row distances
    snap to 6dp DECIMAL before summing so the deviation totals are
    accumulation-order-free.

    Determinism: the sample is vec_id-ordered; every numpy argmin tie
    breaks on position (= vec_id order); swap applies only on a strict
    objective improvement."""
    vec = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=False)
    medoid_rows = _pam_fit(vec, k)
    empty_schema = (
        "medoid_rank bigint, vec_id bigint, cluster_size bigint,"
        " total_deviation double, deviation_share double, swapped bigint"
    )
    if not medoid_rows:
        return spark.createDataFrame([], empty_schema)
    mdf = spark.createDataFrame(
        medoid_rows, "medoid_rank bigint, m_vec_id bigint, mv array<double>, swapped bigint"
    )
    dist = F.expr(
        "sqrt(aggregate(zip_with(v, mv, (x, y) -> (x - y) * (x - y)),"
        " 0D, (a, x) -> a + x))"
    )
    assigned = (
        vec.join(F.broadcast(mdf))
        .select(
            "vec_id",
            F.struct(dist.alias("d"), "medoid_rank", "m_vec_id", "swapped").alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))  # struct order: distance, then rank
        .select(
            F.col("s.medoid_rank").alias("medoid_rank"),
            F.col("s.m_vec_id").alias("m_vec_id"),
            F.col("s.swapped").alias("swapped"),
            F.round(F.col("s.d"), 6).cast("decimal(18,6)").alias("d6"),
        )
    )
    tot = assigned.agg(F.sum("d6").alias("grand")).select(
        F.col("grand").cast("double").alias("grand")
    )
    per = assigned.groupBy("medoid_rank").agg(
        F.count("*").cast("bigint").alias("cluster_size"),
        F.sum("d6").cast("double").alias("total_deviation"),
    )
    # totality: a medoid that is an exact duplicate of a lower-ranked one
    # attracts zero points (ties break to the lower rank) -- keep its row
    # with a zero-filled panel instead of dropping it
    return (
        mdf.join(per, "medoid_rank", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "medoid_rank",
            F.col("m_vec_id").alias("vec_id"),
            F.coalesce(F.col("cluster_size"), F.lit(0)).cast("bigint").alias(
                "cluster_size"
            ),
            F.round(F.coalesce(F.col("total_deviation"), F.lit(0.0)), 6).alias(
                "total_deviation"
            ),
            F.round(
                F.coalesce(F.col("total_deviation"), F.lit(0.0))
                / F.nullif(F.col("grand"), F.lit(0.0)),
                6,
            ).alias("deviation_share"),
            "swapped",
        )
        .orderBy("medoid_rank")
    )


BIRCH_LEAF_CAP = 64  # leaf-layer width bound; overflow triggers the BIRCH rebuild


@register("cluster_birch_cf_profile", tags=("similarity", "curation", "northstar"))
# rows-only: BIRCH leaf insertion is order-sequential (each point's leaf
# depends on every prior merge/rebuild) with no SQL twin; planted-cluster,
# conservation, and additivity gates in tests/test_round20_ops.py.
def cluster_birch_cf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIRCH CF-leaf profile (Zhang et al. 1996): build the leaf layer
    of a CF tree -- merge each point into the nearest leaf when it fits
    inside the radius threshold, open a new leaf otherwise, GROW the
    threshold by the exact-binary factor 5/4 and rebuild when the leaf
    count overflows BIRCH_LEAF_CAP (Zhang's rebuild rule with a finer
    growth step, so distance-concentrated high-dim corpora don't
    collapse to one leaf) -- then profile every leaf over the FULL
    corpus. The streaming-clustering counterpart of cluster_kmedoids_pam
    (PAM picks exemplars; BIRCH summarizes density in one pass), and the
    pre-clustering Zhang designed it for: the |leaves|-row CF panel is
    what a downstream global clusterer consumes instead of N points.

    The key Spark fit: a clustering feature (N, LS, SS) is ADDITIVE, so
    while the leaf layer fits on the driver (built over the bounded
    PAM_SAMPLE_CAP vec_id-ordered sample -- the documented driver-fit
    rule), the per-leaf statistics are EXACT distributed partial aggs
    over the whole corpus: each vector scores |leaves| broadcast
    centroids map-side, folds to its nearest leaf, and only scalar
    (count, snapped-distance-sum) partials shuffle.

    Determinism: vec_id-ordered insertion, nearest-leaf ties break on
    leaf id, the 5/4 threshold growth is exact in binary; per-row
    squared distances snap to 6dp DECIMAL before the order-free sums."""
    import numpy as np

    vec = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=False)
    samp = vec.orderBy("vec_id").limit(PAM_SAMPLE_CAP).toPandas()
    n = len(samp)
    empty_schema = (
        "leaf_id bigint, n_points bigint, share double, radius double,"
        " centroid_l2 double, threshold double"
    )
    if n == 0:
        return spark.createDataFrame([], empty_schema)
    X = np.asarray(samp["v"].tolist(), dtype=np.float64)
    centroid = X.mean(axis=0)
    # data-driven deterministic seed threshold: a quarter of the RMS
    # spread around the sample centroid (exact numpy over the ordered
    # sample); grows by the exact-binary 5/4 on each rebuild
    t = float(np.sqrt(((X - centroid) ** 2).sum(axis=1).mean())) / 4.0
    if t <= 0:
        t = 1.0

    def build(threshold: float):
        leaves: list[list] = []  # [N, LS, SS]
        for x in X:
            best, bd = -1, None
            for i, (ln, ls, _) in enumerate(leaves):
                c = ls / ln
                d = float(np.sqrt(((x - c) ** 2).sum()))
                if d <= threshold and (bd is None or d < bd - 1e-15):
                    best, bd = i, d
            if best >= 0:
                leaves[best][0] += 1
                leaves[best][1] = leaves[best][1] + x
                leaves[best][2] += float((x * x).sum())
            else:
                leaves.append([1, x.copy(), float((x * x).sum())])
                if len(leaves) > BIRCH_LEAF_CAP:
                    return None
        return leaves

    while True:
        leaves = build(t)
        if leaves is not None:
            break
        t *= 1.25  # 5/4 is exact binary; finer than Zhang's doubling so
        # distance-concentrated (high-dim) corpora don't collapse to one leaf
    rows = [
        (i + 1, (ls / ln).tolist(), float(np.sqrt((ls / ln) @ (ls / ln))))
        for i, (ln, ls, _) in enumerate(leaves)
    ]
    ldf = spark.createDataFrame(
        rows, "leaf_id bigint, c array<double>, centroid_l2 double"
    )
    d2 = F.expr(
        "aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
    )
    assigned = (
        vec.join(F.broadcast(ldf))
        .select(
            "vec_id",
            F.struct(d2.alias("d2"), "leaf_id", "centroid_l2").alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .select(
            F.col("s.leaf_id").alias("leaf_id"),
            F.col("s.centroid_l2").alias("centroid_l2"),
            F.round(F.col("s.d2"), 6).cast("decimal(18,6)").alias("d2s"),
        )
    )
    tot = assigned.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        ldf.select("leaf_id")
        .join(
            assigned.groupBy("leaf_id", "centroid_l2").agg(
                F.count("*").cast("bigint").alias("n_points"),
                F.sum("d2s").cast("double").alias("ssd"),
            ),
            "leaf_id",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "leaf_id",
            F.coalesce(F.col("n_points"), F.lit(0)).cast("bigint").alias("n_points"),
            F.round(
                F.coalesce(F.col("n_points"), F.lit(0)).cast("double")
                / F.col("n_total"),
                6,
            ).alias("share"),
            F.round(
                F.sqrt(
                    F.coalesce(F.col("ssd"), F.lit(0.0))
                    / F.nullif(F.coalesce(F.col("n_points"), F.lit(0)), F.lit(0))
                ),
                6,
            ).alias("radius"),
            F.round(F.coalesce(F.col("centroid_l2"), F.lit(0.0)), 6).alias(
                "centroid_l2"
            ),
            F.round(F.lit(t), 6).alias("threshold"),
        )
        .orderBy("leaf_id")
    )


@register("cluster_purity_nmi_eval", tags=("similarity", "curation", "northstar"))
# rows-only: grades the PAM fit, which is itself iterative with no SQL
# twin; perfect/degenerate-clustering gates in tests/test_round21_ops.py.
def cluster_purity_nmi_eval(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    """External clustering evaluation: purity and normalized mutual
    information of the PAM k-medoids assignment against the corpus's
    ground-truth labels. THE go/no-go read on whether unsupervised
    structure recovers the known taxonomy -- purity is the intuitive
    majority-vote score (but inflates with k), NMI corrects for that
    with the information-theoretic normalization I(C;L)/sqrt(H(C)H(L))
    (Manning et al., IR book ch. 16). Grades the SAME fit
    cluster_kmedoids_pam reports (shared _pam_fit), so the two panels
    read together.

    Exactness: the contingency table is exact integer counts from one
    distributed agg; entropies/MI are deterministic double arithmetic
    over that |k x labels| table, folded on the driver in sorted order.

    Scale: k medoid vectors broadcast; each corpus vector scores k
    distances map-side and folds to (cluster, label) -- the shuffle is
    the contingency table, never vectors."""
    import math

    vec = _vectors(spark, sf_dir).select("vec_id", "v", "label").localCheckpoint(
        eager=False
    )
    medoid_rows = _pam_fit(vec.select("vec_id", "v"), k)
    if not medoid_rows:
        return spark.createDataFrame(
            [], "k bigint, n_points bigint, n_labels bigint, purity double, nmi double"
        )
    mdf = spark.createDataFrame(
        medoid_rows,
        "medoid_rank bigint, m_vec_id bigint, mv array<double>, swapped bigint",
    ).select("medoid_rank", "mv")
    dist = F.expr(
        "sqrt(aggregate(zip_with(v, mv, (x, y) -> (x - y) * (x - y)),"
        " 0D, (a, x) -> a + x))"
    )
    cont = (
        vec.join(F.broadcast(mdf))
        .select(
            "vec_id",
            "label",
            F.struct(dist.alias("d"), "medoid_rank").alias("s"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("s").alias("s"))
        .select(F.col("s.medoid_rank").alias("cluster"), "label")
        .groupBy("cluster", "label")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("cluster", "label")
        .collect()  # |k x labels| contingency rows -- audit-sized
    )
    n_total = sum(r["n"] for r in cont)
    by_c: dict = {}
    by_l: dict = {}
    for r in cont:
        by_c[r["cluster"]] = by_c.get(r["cluster"], 0) + r["n"]
        by_l[r["label"]] = by_l.get(r["label"], 0) + r["n"]
    purity = sum(
        max(r["n"] for r in cont if r["cluster"] == c) for c in by_c
    ) / n_total
    h_c = -sum(v / n_total * math.log(v / n_total) for v in by_c.values())
    h_l = -sum(v / n_total * math.log(v / n_total) for v in by_l.values())
    mi = sum(
        r["n"]
        / n_total
        * math.log(
            (r["n"] / n_total) / ((by_c[r["cluster"]] / n_total) * (by_l[r["label"]] / n_total))
        )
        for r in cont
        if r["n"] > 0
    )
    nmi = mi / math.sqrt(h_c * h_l) if h_c > 0 and h_l > 0 else 0.0
    return spark.createDataFrame(
        [(len(by_c), n_total, len(by_l), round(purity, 6), round(nmi, 6))],
        "k bigint, n_points bigint, n_labels bigint, purity double, nmi double",
    )


# Johnson-Lindenstrauss probe: k = 16 projected dims, +/-1 signs derived
# from md5(j:i) first hex digit (engine-portable constant matrix), and
# the distortion tolerance band the share column reads against.
JL_DIMS = 16
JL_EPS = 0.4


@register(
    "embedding_jl_projection_distortion",
    tags=("similarity", "monitor"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE len(embedding) > 0
    ),
    proj AS (
      SELECT vec_id, v,
             list_transform(range(0, {JL_DIMS}), j ->
               list_reduce(
                 list_transform(range(0, len(v)), i ->
                   CASE WHEN substr(md5(CAST(j AS VARCHAR) || ':'
                                    || CAST(i AS VARCHAR)), 1, 1) < '8'
                        THEN v[i+1] ELSE -v[i+1] END),
                 (acc, x) -> acc + x) / sqrt(CAST({JL_DIMS} AS DOUBLE))
             ) AS y
      FROM v
    ),
    pair AS (
      SELECT a.vec_id AS va,
             list_reduce(list_transform(range(0, len(a.v)),
               i -> (a.v[i+1] - b.v[i+1]) * (a.v[i+1] - b.v[i+1])),
               (acc, x) -> acc + x) AS do2,
             list_reduce(list_transform(range(0, {JL_DIMS}),
               j -> (a.y[j+1] - b.y[j+1]) * (a.y[j+1] - b.y[j+1])),
               (acc, x) -> acc + x) AS dp2
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
    ),
    r AS (
      SELECT sqrt(dp2) / sqrt(do2) AS ratio FROM pair WHERE do2 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(ratio AS DECIMAL(20,15))) AS DOUBLE)
                 / count(*), 6) AS avg_ratio,
           round(min(ratio), 6) AS min_ratio,
           round(max(ratio), 6) AS max_ratio,
           round(CAST(sum(CASE WHEN ratio >= 1 - {JL_EPS}
                               AND ratio <= 1 + {JL_EPS}
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS share_within_eps
    FROM r
    """,
)
def embedding_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion probe: project every embedding
    to JL_DIMS = 16 dims with a DETERMINISTIC +/-1 sign matrix
    (Achlioptas 2003's database-friendly construction; signs derived
    from md5(j:i) so both engines build the identical matrix with no
    RNG) scaled by 1/sqrt(k), and measure the pairwise-distance ratio
    ||Pa - Pb|| / ||a - b|| over the adjacent-vec_id pair sample. The
    JL lemma says random +/-1 projections preserve distances within
    (1 +/- eps) w.h.p. at k ~ ln(n)/eps^2; this panel reports the
    observed ratio spread and the share inside the eps = 0.4 band --
    the go/no-go check before serving ANN on 4x-cheaper projected
    vectors, and the random-projection companion to
    embedding_truncation_recall (truncation keeps PREFIX dims; JL mixes
    ALL dims, which is why it works when energy is spread).

    Exactness: the sign matrix is a pure function of (j, i); per-vector
    projections and squared distances fold arrays SEQUENTIALLY on both
    engines (identical IEEE accumulation order -- the established
    list-fold parity rule), so ratios agree bit-for-bit; per-pair
    ratios snap to DECIMAL(20,15) before the order-free mean; the
    eps-band compare runs on those shared doubles.

    Scale: the projection is per-row array arithmetic inside codegen
    (no shuffle); the pair frame joins on vec_id+1 -- |vectors| narrow
    rows; 1 row out."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)
    v = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    proj = v.select(
        "vec_id",
        "v",
        F.expr(
            f"""transform(sequence(0, {JL_DIMS - 1}), j ->
              aggregate(
                transform(sequence(0, size(v) - 1), i ->
                  CASE WHEN substring(md5(concat(cast(j AS string), ':',
                                     cast(i AS string))), 1, 1) < '8'
                       THEN v[i] ELSE -v[i] END),
                cast(0.0 AS double), (acc, x) -> acc + x)
              / sqrt(cast({JL_DIMS} AS double)))"""
        ).alias("y"),
    ).localCheckpoint(eager=False)  # both sides of the adjacent-pair join
    b = proj.select(
        (F.col("vec_id") - 1).alias("join_id"),
        F.col("v").alias("bv"),
        F.col("y").alias("by"),
    )
    pair = proj.join(b, F.col("join_id") == F.col("vec_id")).select(
        F.expr(
            "aggregate(transform(sequence(0, size(v) - 1),"
            " i -> (v[i] - bv[i]) * (v[i] - bv[i])),"
            " cast(0.0 AS double), (acc, x) -> acc + x)"
        ).alias("do2"),
        F.expr(
            f"aggregate(transform(sequence(0, {JL_DIMS - 1}),"
            " j -> (y[j] - by[j]) * (y[j] - by[j])),"
            " cast(0.0 AS double), (acc, x) -> acc + x)"
        ).alias("dp2"),
    )
    r = pair.filter(F.col("do2") > 0).select(
        (F.sqrt("dp2") / F.sqrt("do2")).alias("ratio")
    )
    return r.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.col("ratio").cast("decimal(20,15)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
        F.round(
            F.sum(
                F.when(
                    (F.col("ratio") >= 1 - JL_EPS) & (F.col("ratio") <= 1 + JL_EPS),
                    1,
                ).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("share_within_eps"),
    )


@register("cluster_davies_bouldin_eval", tags=("similarity", "curation"))
# rows-only: grades the iterative PAM fit (no SQL twin); perfect-separation
# and merged-cluster gates in tests/test_round22_ops.py.
def cluster_davies_bouldin_eval(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    """Internal clustering evaluation: the Davies-Bouldin index (Davies
    & Bouldin 1979) of the PAM k-medoids fit -- for each cluster the
    worst-case similarity ratio R_i = max_{j != i} (S_i + S_j) / M_ij
    (within-cluster scatter over between-medoid separation), DB = mean
    R_i; LOWER is better, and unlike purity/NMI it needs NO ground
    truth, so it is the metric that picks k when labels don't exist.
    Completes the clustering-eval family: purity/NMI grade against
    labels (external), modularity grades the graph fit, DB grades
    geometry (internal) -- all over the SAME shared _pam_fit, so the
    panels read together.

    Output: one row per cluster with its size, scatter S_i, nearest
    medoid separation, worst ratio R_i, and the panel-level DB index
    repeated (single-schema rule).

    Scale: k medoid vectors broadcast; every corpus vector scores k
    distances map-side and folds to per-cluster (count, distance-sum)
    partials -- the shuffle is k rows; the k x k medoid separation
    matrix and the DB fold are driver arithmetic on k rows.
    Determinism: per-row distances snap to 6dp DECIMAL before the
    order-free scatter sums; ties in the max ratio break on cluster
    rank via sorted iteration."""
    import math

    vec = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=False)
    medoid_rows = _pam_fit(vec, k)
    empty = (
        "cluster bigint, n_points bigint, scatter double,"
        " nearest_sep double, worst_ratio double, db_index double"
    )
    if len(medoid_rows) < 2:
        return spark.createDataFrame([], empty)
    mdf = spark.createDataFrame(
        medoid_rows,
        "medoid_rank bigint, m_vec_id bigint, mv array<double>, swapped bigint",
    ).select("medoid_rank", "mv")
    dist = F.expr(
        "sqrt(aggregate(zip_with(v, mv, (x, y) -> (x - y) * (x - y)),"
        " 0D, (a, x) -> a + x))"
    )
    per = (
        vec.join(F.broadcast(mdf))
        .select(
            "vec_id",
            F.struct(dist.alias("d"), "medoid_rank").alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .select(
            F.col("s.medoid_rank").alias("cluster"),
            F.col("s.d").cast("decimal(18,6)").alias("d"),
        )
        .groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.sum("d").cast("double").alias("dsum"),
        )
        .orderBy("cluster")
        .collect()  # k rows -- audit-sized
    )
    scatter = {r["cluster"]: r["dsum"] / r["n_points"] for r in per}
    sizes = {r["cluster"]: r["n_points"] for r in per}
    med = {rank: vecv for rank, _vid, vecv, _sw in medoid_rows}
    ranks = sorted(scatter)
    sep = {
        (i, j): math.sqrt(sum((a - b) ** 2 for a, b in zip(med[i], med[j])))
        for i in ranks
        for j in ranks
        if i != j
    }
    out = []
    ratios = {}
    for i in ranks:
        worst = max(
            (scatter[i] + scatter[j]) / sep[(i, j)]
            for j in ranks
            if j != i and sep[(i, j)] > 0
        )
        ratios[i] = worst
    db = sum(ratios.values()) / len(ranks)
    for i in ranks:
        out.append(
            (
                i,
                sizes[i],
                round(scatter[i], 6),
                round(min(sep[(i, j)] for j in ranks if j != i), 6),
                round(ratios[i], 6),
                round(db, 6),
            )
        )
    return spark.createDataFrame(out, empty)
