"""Corpus-curation operators beyond dedup (SURVEY.md §2.2 north-star
extension): benchmark decontamination, incremental dedup against an
already-ingested corpus, and token-budget mixture sampling -- the three
jobs a training-data pipeline runs between "raw crawl" and "training set"
that the dedup/text suites don't cover.

Scale design shared by all three:
- the *small* relation (benchmark shingle set, per-lang budget table) is
  broadcast; the corpus never shuffles for it;
- the *large*-vs-large case (incremental dedup) joins 32-byte content
  digests, never document bodies;
- everything is JVM built-ins (split/transform/sequence/window) -- no
  Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..registry import register
from .dedup import TOKENS, _shingles, _tokens

# Benchmark membership for the decontamination demo: every 20th doc plays
# the held-out eval set. Deterministic and engine-independent.
_BENCH_PRED = "doc_id % 20 = 0"

# duckdb-side 8-gram shingles over TOKENS (1-indexed lists; range(a,b) is
# half-open, so i runs 1..len-7 and toks[i+7] reaches the last token)
_ORACLE_8GRAMS = f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 6),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]
             )) AS shingles
      FROM toks WHERE len(toks) >= 8
    )
"""


@register(
    "decontaminate_ngram",
    tags=("curation", "northstar"),
    oracle=_ORACLE_8GRAMS
    + f"""
    , bench AS (
      SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE {_BENCH_PRED}
    ),
    train AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE NOT ({_BENCH_PRED})
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit_shingles
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing any word
    8-gram with the held-out benchmark set, with the count of distinct
    colliding shingles (the Gopher/GPT-3-style n-gram overlap check).

    100 TB shape: the benchmark side is fixed and tiny (eval suites are
    thousands of documents), so its distinct shingle set BROADCASTS; the
    corpus explodes its shingles map-side and hash-joins locally -- the
    corpus is scanned once and never shuffled. Per-doc shingle arrays are
    already distinct, so the per-doc hit count needs no DISTINCT."""
    d = spread(load_table(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", _tokens().alias("toks"))
        .filter(F.size("toks") >= 8)
        .select("doc_id", _shingles(F.col("toks"), 8).alias("shingles"))
    )
    is_bench = F.expr(_BENCH_PRED)
    bench = (
        sh.filter(is_bench)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    train = sh.filter(~is_bench).select("doc_id", F.explode("shingles").alias("shingle"))
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
    )


@register(
    "dedup_incremental",
    tags=("curation", "dedup", "northstar"),
    oracle="""
    WITH hashed AS (
      SELECT doc_id, sha256(text) AS content_sha FROM documents
    ),
    batch AS (
      SELECT content_sha, CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM hashed WHERE doc_id >= 400 GROUP BY content_sha
    )
    SELECT b.doc_id, b.content_sha
    FROM batch b
    WHERE NOT EXISTS (
      SELECT 1 FROM hashed s WHERE s.doc_id < 400 AND s.content_sha = b.content_sha
    )
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: a new ingest batch (doc_id >= 400) deduped
    first within itself (min-doc_id survivor per content hash), then
    anti-joined against the already-ingested corpus (doc_id < 400).

    This is how exact dedup actually runs day-to-day at 100 TB: the seen
    set is a persisted relation of 32-byte digests, each arriving batch
    reduces to its own digest set, and the anti-join shuffles digests only
    -- document bodies never move. (A full-corpus re-dedup per batch, like
    ``dedup_exact`` over everything, re-reads the whole corpus every
    time.)"""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha")
    )
    seen = d.filter(F.col("doc_id") < 400).select("content_sha")
    batch = (
        d.filter(F.col("doc_id") >= 400)
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return batch.join(seen, "content_sha", "left_anti").select("doc_id", "content_sha")


@register(
    "sample_token_mixture",
    tags=("curation", "northstar"),
    oracle=f"""
    WITH counted AS (
      SELECT doc_id, lang,
             CAST(len({TOKENS}) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS pick_order
      FROM documents
    ),
    running AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY pick_order, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens,
             CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 2000 WHEN 'es' THEN 2000
                       ELSE 1500 END AS budget
      FROM counted
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM running WHERE cum_tokens <= budget
    """,
)
def sample_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: fill a per-language token budget
    (the training-mix weights) by taking documents in deterministic
    hash order until each language's budget is exhausted.

    Hash-order pick (md5 of doc_id) gives the same sample on any engine
    and any partitioning -- seed-based sampling cannot. One shuffle on
    lang; the running sum is an in-partition window. At corpus scale the
    stratum key becomes (lang, shard) with per-shard budget slices so no
    partition outgrows an executor -- same sub-sharding as
    ``pack_token_budget``."""
    d = load_table(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        "lang",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("pick_order"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("pick_order", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.expr(
        "CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 2000 WHEN 'es' THEN 2000 "
        "ELSE 1500 END"
    )
    return (
        counted.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@register(
    "dataset_split",
    tags=("curation", "northstar"),
    oracle="""
    WITH assigned AS (
      SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1, 2
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash:
    md5(doc_id) hex prefix thresholds carve ~80/10/10 ('00'..'cb' = 204 of
    256 buckets, 'cc'..'e5' = 26, rest = 26). Hash assignment -- not
    random() and not modulo-on-row-number -- survives re-partitioning,
    re-ingestion, and engine changes: the same document lands in the same
    split forever, which is what leakage-free eval demands.

    The query returns the per-(split, lang) composition audit (the check
    you run before training). Scale: pure map-side assignment, one partial
    agg to |splits| x |langs| rows; never materializes per-row output."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix <= "cb", "train").when(prefix <= "e5", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "decontaminate_exact",
    tags=("curation", "northstar"),
    oracle=f"""
    WITH probes AS (
      SELECT doc_id AS bench_id,
             array_to_string(({TOKENS})[1:6], ' ') AS probe
      FROM documents
      WHERE {_BENCH_PRED} AND len({TOKENS}) >= 6
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits
    FROM documents d JOIN probes p ON position(p.probe IN d.text) > 0
    WHERE NOT (d.{_BENCH_PRED})
    GROUP BY d.doc_id
    """,
)
def decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination: the complement of the 8-gram
    check -- each benchmark document contributes one canonical probe
    string (its first six tokens), and any training document containing a
    probe verbatim is flagged with its hit count. This is the cheap
    first-pass eval-leak scan (string containment, no tokenizer drift)
    run before the shingle-level pass.

    100 TB shape: eval probes are a broadcast list, the corpus side is a
    map-side substring scan (broadcast nested-loop join on contains) --
    one corpus pass, zero corpus shuffle before the per-doc count, which
    partial-aggregates on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    is_bench = F.expr(_BENCH_PRED)
    probes = (
        d.filter(is_bench)
        .select(_tokens().alias("toks"))
        .filter(F.size("toks") >= 6)
        .select(F.array_join(F.slice("toks", 1, 6), " ").alias("probe"))
    )
    train = d.filter(~is_bench).select("doc_id", "text")
    return (
        train.join(F.broadcast(probes), F.col("text").contains(F.col("probe")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_probe_hits"))
    )


@register(
    "sample_reservoir_k",
    tags=("curation", "scan", "northstar"),
    oracle="""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) t
    WHERE rk <= 8
    """,
)
def sample_reservoir_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-group sample: exactly 8 documents per language, chosen
    by hash order -- the deterministic batch equivalent of per-stratum
    reservoir sampling (uniform over the group, stable across reruns and
    engines, unlike fraction-based sampleBy which cannot promise exact k).

    Scale: rank-filter windows compile to WindowGroupLimit in Spark 4 --
    each map task keeps only its local top-8 per lang BEFORE the shuffle,
    so shuffle volume is partitions x groups x k rows, independent of
    corpus size (same physical shape asserted for topk_per_group in
    test_plans.py)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 8)
        .select("doc_id", "lang", F.col("rk").cast("bigint").alias("rk"))
    )


@register(
    "dedup_lines",
    tags=("curation", "dedup", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    ls AS (
      SELECT doc_id,
             unnest(list_transform(range(CAST(ceil(len(toks) / 12.0) AS BIGINT)),
               i -> array_to_string(toks[i*12+1 : (i+1)*12], ' '))) AS line
      FROM toks WHERE len(toks) > 0
    ),
    nd AS (
      SELECT line, count(DISTINCT doc_id) AS n_docs FROM ls GROUP BY line
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN nd.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
           round(CAST(sum(CASE WHEN nd.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS dup_frac
    FROM ls l JOIN nd ON l.line = nd.line
    GROUP BY l.doc_id
    """,
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line deduplication profile (the RefinedWeb / CCNet
    line-dedup pass): segment every document into lines, count how many of
    each document's lines also occur in at least one OTHER document, and
    report the duplicated fraction -- the signal that pass uses to strip
    boilerplate (headers, nav bars, cookie banners) before training.

    The fixture corpus has no newlines, so the line segmenter is a fixed
    12-token window applied identically in both engines; the corpus-wide
    dedup machinery (line -> distinct-doc counts -> per-doc join-back) is
    the real operator.

    Scale: lines are built with JVM array ops (sequence/slice/array_join,
    map-side). The aggregation shuffles one row per LINE (not per token),
    and the join-back is line-keyed equi-join -- at 100 TB you'd swap the
    join key for xxhash64(line) to shuffle 8-byte digests instead of text,
    the same digest-not-body rule as dedup_exact; kept as raw text here so
    the DuckDB oracle is collision-free by construction."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .filter(F.size("toks") > 0)
    )
    lines = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(toks) / 12.0) as int) - 1),"
                " i -> array_join(slice(toks, i*12 + 1, 12), ' '))"
            )
        ).alias("line"),
    )
    n_docs = lines.groupBy("line").agg(F.count_distinct("doc_id").alias("n_docs"))
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    return (
        lines.join(n_docs, "line")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            dup.cast("bigint").alias("n_dup_lines"),
            F.round(dup / F.count("*"), 6).cast("double").alias("dup_frac"),
        )
    )


@register(
    "sample_balanced_lang",
    tags=("curation", "northstar"),
    oracle="""
    SELECT doc_id, lang, rnk FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rnk
      FROM documents
    ) t
    WHERE rnk <= 20
    """,
)
def sample_balanced_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language balanced sample (k=20): the
    equal-representation draw used for eval sets and for capping dominant
    languages in a training mixture. Where sample_stratified keeps a
    per-stratum FRACTION, this keeps a per-stratum COUNT -- the complement
    primitive.

    Determinism: rows rank by the md5 of their key (engine-independent
    content hash, same trick as sample_hash) with doc_id as total-order
    tiebreaker, so the selected set is identical on any engine, partition
    layout, or run -- unlike sampleBy's seeded Bernoulli draw, which
    cannot promise an exact k.

    Scale: one shuffle partitioned by lang; per-group top-k state is k
    rows per reducer (rank-filter pushes the limit into the sort). A
    skewed stratum (one language = half the corpus) rank-sorts only
    hashes, not documents -- and a two-stage local-topk (the
    knn_cosine_topk shape) drops in if even that sort is too hot."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("rnk"))
        .filter(F.col("rnk") <= 20)
    )


@register(
    "sample_temperature_mixture",
    tags=("curation", "northstar", "agg"),
    oracle=f"""
    WITH t AS (
      SELECT source, CAST(sum(len({TOKENS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT source, n_tokens,
             CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS wt
      FROM t
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS nt, sum(wt) AS wtot FROM w
    )
    SELECT w.source, w.n_tokens,
           CAST(round(CAST(w.n_tokens AS DOUBLE) / tot.nt, 6) AS DOUBLE)
             AS raw_share,
           CAST(round(CAST(w.wt AS DOUBLE) / CAST(tot.wtot AS DOUBLE), 6)
                AS DOUBLE) AS temp_share
    FROM w CROSS JOIN tot
    ORDER BY source
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source (alpha = 0.5): the
    standard multilingual/multi-source rebalancing rule w_i proportional
    to p_i^alpha that upsamples small sources without letting the biggest
    one dominate -- the sampling-plan companion to sample_token_mixture
    (which executes a given plan; this derives one).

    alpha is fixed at 0.5 so the power is sqrt(), which IEEE 754 requires
    correctly rounded -- bit-identical across engines where a generic
    pow() is not. Each source's weight snaps to DECIMAL(18,6) before the
    normalizing sum, so the denominator is an exact decimal sum,
    order-independent.

    Scale: token counting partial-aggregates to |sources| rows (the
    fixed-size fold family); the normalizer is a 1-row broadcast.
    Everything after the first agg is dim-scale."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(_tokens())).cast("bigint").alias("n_tokens")
    )
    w = t.select(
        "source",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("wt"),
    )
    tot = w.agg(
        F.sum("n_tokens").cast("bigint").alias("nt"),
        F.sum("wt").alias("wtot"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("nt"), 6)
            .cast("double")
            .alias("raw_share"),
            F.round(F.col("wt").cast("double") / F.col("wtot").cast("double"), 6)
            .cast("double")
            .alias("temp_share"),
        )
        .orderBy("source")
    )


@register(
    "docs_template_lines",
    tags=("curation", "dedup", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    ls AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(CAST(ceil(len(toks) / 12.0) AS BIGINT)),
               i -> array_to_string(toks[i*12+1 : (i+1)*12], ' '))) AS line
      FROM toks WHERE len(toks) > 0
    ),
    nd AS (
      SELECT line, CAST(count(*) AS BIGINT) AS n_docs FROM ls GROUP BY line
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM documents)
    SELECT line, n_docs,
           round(CAST(n_docs AS DOUBLE) / total_docs, 6) AS doc_share
    FROM nd CROSS JOIN tot
    WHERE n_docs >= 3
    ORDER BY n_docs DESC, line
    LIMIT 20
    """,
)
def docs_template_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate line detector: the top-20 lines (12-token
    segments, the shared ``dedup_lines`` segmenter) that appear in the
    most DISTINCT documents, with their corpus coverage -- this is the
    list a RefinedWeb-style line-dedup pass actually strips (cookie
    banners, nav bars, license headers), where ``dedup_lines`` reports the
    per-document damage. The >= 3-docs floor is the standard template
    support threshold.

    Scale: per-doc DISTINCT lines reduce map-side before the line-keyed
    count shuffle (one row per distinct (doc, line)); the final is
    TakeOrderedAndProject over the |distinct lines| rollup and the doc
    total is a 1-row broadcast. At 100 TB the line key becomes
    xxhash64(line) with a representative join-back, same digest rule as
    dedup_exact."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .filter(F.size("toks") > 0)
    )
    lines = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(toks) / 12.0) as int) - 1),"
                " i -> array_join(slice(toks, i*12 + 1, 12), ' '))"
            )
        ).alias("line"),
    ).distinct()
    nd = lines.groupBy("line").agg(F.count("*").cast("bigint").alias("n_docs"))
    tot = load_table(spark, sf_dir, "documents").agg(
        F.count("*").cast("bigint").alias("total_docs")
    )
    return (
        nd.filter(F.col("n_docs") >= 3)
        .crossJoin(F.broadcast(tot))
        .select(
            "line",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("total_docs"), 6).alias(
                "doc_share"
            ),
        )
        .orderBy(F.col("n_docs").desc(), "line")
        .limit(20)
    )


@register(
    "sample_neyman_allocation",
    tags=("curation", "agg", "northstar"),
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(CAST(n_chars AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE) AS s2
      FROM documents GROUP BY 1
    ),
    sd AS (
      SELECT source, nh,
             sqrt((s2 - s1 * s1 / nh) / (nh - 1)) AS sh
      FROM m WHERE nh > 1
    ),
    tot AS (SELECT sum(nh * sh) AS denom, sum(nh) AS n_total FROM sd)
    SELECT s.source, s.nh AS stratum_size,
           round(s.sh, 4) AS stratum_sd,
           round(s.nh * s.sh / t.denom, 6) AS neyman_share,
           CAST(round(1000 * s.nh * s.sh / t.denom) AS BIGINT) AS neyman_n,
           CAST(round(1000 * CAST(s.nh AS DOUBLE) / t.n_total) AS BIGINT)
             AS proportional_n
    FROM sd s CROSS JOIN tot t
    ORDER BY s.source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over sources: each
    stratum's share of a 1000-doc audit budget proportional to N_h x S_h
    (size x within-stratum spread of doc length) -- the survey-sampling
    answer to 'which feeds deserve the most QA eyeballs', vs the naive
    proportional allocation shown beside it. Variance comes from exact
    integral moments (HUGEINT / DECIMAL(38,0)); every downstream value is
    a closed-form double on those exact sums.

    Scale: ONE |sources|-state moment agg over the metadata scan; the
    denominator is a window sum over the |sources|-row rollup (single
    tiny partition, free -- and no second scan)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    dec = F.col("n_chars").cast("decimal(38,0)")
    m = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("nh"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * F.col("n_chars")).cast("double").alias("s2"),
    )
    sd = m.filter(F.col("nh") > 1).select(
        "source",
        "nh",
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nh")) / (F.col("nh") - 1)
        ).alias("sh"),
    )
    w = Window.partitionBy()
    sd = sd.select(
        "source",
        "nh",
        "sh",
        F.sum(F.col("nh") * F.col("sh")).over(w).alias("denom"),
        F.sum("nh").over(w).alias("n_total"),
    )
    share = F.col("nh") * F.col("sh") / F.col("denom")
    return (
        sd.select(
            "source",
            F.col("nh").alias("stratum_size"),
            F.round(F.col("sh"), 4).alias("stratum_sd"),
            F.round(share, 6).alias("neyman_share"),
            F.round(1000 * share).cast("bigint").alias("neyman_n"),
            F.round(1000 * F.col("nh").cast("double") / F.col("n_total"))
            .cast("bigint")
            .alias("proportional_n"),
        )
        .orderBy("source")
    )


# duckdb-side 5-gram shingles over TOKENS (1-indexed; i runs 1..len-4)
_ORACLE_5GRAMS = f"""
    WITH toks AS (
      SELECT source, {TOKENS} AS toks FROM documents
    ),
    sh AS (
      SELECT source,
             list_distinct(list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                 || ' ' || toks[i+3] || ' ' || toks[i+4]
             )) AS shingles
      FROM toks WHERE len(toks) >= 5
    ),
    ss AS (
      SELECT DISTINCT source, unnest(shingles) AS shingle FROM sh
    )
"""


@register(
    "docs_source_ngram_overlap",
    tags=("curation", "dedup", "northstar"),
    oracle=_ORACLE_5GRAMS
    + """
    , cnt AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, ca.n AS n_a, cb.n AS n_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common), 6)
             AS jaccard
    FROM inter i
    JOIN cnt ca ON i.source_a = ca.source
    JOIN cnt cb ON i.source_b = cb.source
    """,
)
def docs_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise word-5-gram Jaccard between corpus SOURCES -- the
    cross-source contamination matrix: which crawls/feeds carry the same
    boilerplate or mirrored content (decontaminate_ngram answers the
    train-vs-benchmark version of the same question; this is the
    source-vs-source audit that decides which feeds to dedup jointly).
    Pairs with zero shared shingles are omitted (inner join on shingle),
    identically on both engines.

    Scale: documents explode to (source, shingle) and REDUCE by distinct
    before any pairing, so the join input is the per-source shingle
    vocabulary, not the corpus. The intersection join keys on shingle;
    each shingle contributes at most C(|sources sharing it|, 2) pairs,
    bounded by the source count squared -- not by corpus size. At
    thousands of sources, block by (shingle hash % B) first and aggregate
    the per-block partial intersections."""
    d = spread(load_table(spark, sf_dir, "documents"))
    ss = (
        d.select("source", _tokens().alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("source", F.explode(_shingles(F.col("toks"), 5)).alias("shingle"))
        .distinct()
        .localCheckpoint(eager=False)  # shingle vocab: reused by cnt + pair join
    )
    cnt = ss.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "shingle")
    b = ss.select(F.col("source").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    ca = cnt.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "sample_quality_weighted_tokens",
    tags=("curation", "quality", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    per_tok AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c,
             CAST(len(tok) AS BIGINT) AS l
      FROM toks GROUP BY doc_id, tok
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS quality,
             CAST(CASE WHEN sum(c) BETWEEN 10 AND 100000
                        AND CAST(sum(l * c) AS DOUBLE) / sum(c) BETWEEN 2 AND 10
                        AND CAST(count(*) AS DOUBLE) / sum(c) > 0.2
                        AND CAST(max(c) AS DOUBLE) / sum(c) < 0.3
                   THEN 1 ELSE 0 END AS INT) AS keep
      FROM per_tok GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.doc_id, d.source, p.n_tokens, p.quality,
             CAST(sum(p.n_tokens) OVER (
               PARTITION BY d.source
               ORDER BY p.quality DESC, d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
      WHERE p.keep = 1
    )
    SELECT doc_id, source, n_tokens, quality, cum_tokens
    FROM ranked WHERE cum_tokens <= 3000
    """,
)
def sample_quality_weighted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted token-budget sampling: fill each source's token
    budget with its BEST documents first -- Gopher-gate survivors ranked
    by unique-token ratio -- instead of hash order
    (sample_token_mixture) or temperature-scaled mass
    (sample_temperature_mixture). This is the "quality-first data buy"
    curation policy: spend the per-source token allowance on documents a
    quality model ranks highest, deterministically.

    Determinism: the rank key is the 6dp-ROUNDED quality ratio (two
    exact integers divided once; rounding before ordering means an
    engine ulp cannot reorder neighbours) with doc_id as the tiebreak;
    the budget fill is an exact integer prefix sum.

    Scale: the per-doc quality pass is the vocabulary-bounded Gopher agg;
    the fill is one |source|-keyed window over gate survivors. At corpus
    scale the stratum key becomes (source, quality-band shard) so no
    partition outgrows an executor -- same sub-sharding as
    pack_token_budget."""
    d = load_table(spark, sf_dir, "documents")
    per_tok = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .withColumn("l", F.length("tok").cast("long"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.max("c").alias("top_count"),
        F.sum(F.col("l") * F.col("c")).alias("sum_len"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    uniq = F.col("n_unique").cast("double") / F.col("n_tokens")
    top = F.col("top_count").cast("double") / F.col("n_tokens")
    scored = per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(uniq, 6).alias("quality"),
        (
            F.col("n_tokens").between(10, 100000)
            & mean_len.between(2, 10)
            & (uniq > 0.2)
            & (top < 0.3)
        ).alias("keep"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", "source")
        .join(scored, "doc_id")
        .filter(F.col("keep"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 3000)
        .select("doc_id", "source", "n_tokens", "quality", "cum_tokens")
    )


@register(
    "docs_curation_funnel",
    tags=("curation", "quality", "northstar"),
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, md5(text) AS digest,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tok,
             CAST(list_sum(list_transform(list_filter(string_split(lower(text), ' '), x -> x <> ''), x -> length(x))) AS BIGINT) AS tot_len
      FROM documents
    ), flagged AS (
      SELECT doc_id, digest, n_tok,
             (lang IN ('en','es','de','fr')) AS f1,
             (lang IN ('en','es','de','fr') AND n_tok >= 30 AND n_tok <= 5000) AS f2,
             (lang IN ('en','es','de','fr') AND n_tok >= 30 AND n_tok <= 5000
              AND CAST(tot_len AS DOUBLE) / nullif(n_tok, 0) >= 3.0
              AND CAST(tot_len AS DOUBLE) / nullif(n_tok, 0) <= 4.6) AS f3
      FROM base
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY digest, f3 ORDER BY doc_id) AS rk FROM flagged
    ), staged AS (
      SELECT n_tok, s.stage, s.keep
      FROM rk, LATERAL (VALUES
        ('stage0_raw', true), ('stage1_lang', f1), ('stage2_length', f2),
        ('stage3_wordlen', f3), ('stage4_exact_dedup', f3 AND rk = 1)) AS s(stage, keep)
    ), agg AS (
      SELECT stage, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM staged WHERE keep GROUP BY stage
    )
    SELECT stage, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / nullif((SELECT n_docs FROM agg WHERE stage = 'stage0_raw'), 0), 6) AS pct_docs
    FROM agg
    """,
)
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline as ONE query: per-stage survivor counts
    (docs and tokens) through language filter -> length gate -> mean-
    word-length gate -> exact dedup, cumulatively -- the attrition
    funnel every pretraining-data report leads with (RefinedWeb fig. 2,
    Dolma, FineWeb all publish exactly this table). Stages compose the
    same primitives the standalone operators expose (sample_balanced_lang's
    lang domain, quality_gopher_rules' word-length band, dedup_exact's
    digest-first-survivor); this op pins the COMPOSITION: every doc is
    flagged once per gate and the stage rows are marginals of one flag
    table, so stageN >= stageN+1 by construction (gate monotonicity is
    pytest-pinned, plus a planted-duplicate test proving stage4 bites).
    Fixture attrition at sf0.01: 500 -> 425 -> 332 -> 233 -> 233 docs.

    Scale: one documents scan computes all flags map-side; the dedup
    rank is the standard 16-byte-digest window (never text); the x5
    stack explode feeds a |stages|-state partial agg, and the raw-count
    anchor is a broadcast 1-row join. Cost ~ one dedup_exact, NOT the
    sum of five standalone passes -- the reason to funnel in-engine
    instead of chaining jobs."""
    d = load_table(spark, sf_dir, "documents")
    tot_len = F.expr(
        "aggregate(filter(split(lower(text), ' '), x -> x <> ''), 0L,"
        " (acc, x) -> acc + length(x))"
    )
    base = d.select(
        "doc_id",
        "lang",
        F.size(_tokens()).alias("n_tok"),
        tot_len.alias("tot_len"),
        F.md5("text").alias("digest"),
    )
    f1 = F.col("lang").isin("en", "es", "de", "fr")
    f2 = f1 & (F.col("n_tok") >= 30) & (F.col("n_tok") <= 5000)
    mwl = F.col("tot_len").cast("double") / F.nullif(F.col("n_tok"), F.lit(0))
    f3 = f2 & (mwl >= 3.0) & (mwl <= 4.6)
    flagged = base.select(
        "doc_id", "digest", "n_tok", f1.alias("f1"), f2.alias("f2"), f3.alias("f3")
    ).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("digest", "f3").orderBy("doc_id")),
    )
    staged = flagged.select(
        "n_tok",
        F.expr(
            "stack(5, 'stage0_raw', true, 'stage1_lang', f1, 'stage2_length', f2,"
            " 'stage3_wordlen', f3, 'stage4_exact_dedup', f3 AND rk = 1)"
            " as (stage, keep)"
        ),
    )
    out = (
        staged.filter(F.col("keep"))
        .groupBy("stage")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("n_tok").cast("bigint")).cast("bigint").alias("n_tokens"),
        )
        # |stages| rows consumed twice (funnel + raw anchor): materialize
        # once so the anchor branch doesn't re-run the scan+flag pipeline
        .localCheckpoint(eager=False)
    )
    raw = out.filter(F.col("stage") == "stage0_raw").select(
        F.col("n_docs").alias("raw_docs")
    )
    return out.crossJoin(F.broadcast(raw)).select(
        "stage",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs").cast("double") / F.nullif(F.col("raw_docs"), F.lit(0)), 6
        ).alias("pct_docs"),
    )


@register(
    "docs_ngram_novelty_curve",
    tags=("curation", "text", "dedup"),
    oracle=f"""
    WITH bounds AS (
      SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
    ),
    d AS (
      SELECT doc_id,
             CAST(least(9, ((doc_id - b.lo) * 10) // (b.hi - b.lo + 1)) AS INT) AS decile,
             {TOKENS} AS toks
      FROM documents CROSS JOIN bounds b
    ),
    sh AS (
      SELECT doc_id, decile,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM d WHERE len(toks) >= 3
    ),
    ex AS (
      SELECT decile, unnest(shingles) AS shingle FROM sh
    ),
    per_decile AS (
      SELECT decile, CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct
      FROM ex GROUP BY 1
    ),
    first_seen AS (
      SELECT shingle, min(decile) AS decile FROM ex GROUP BY 1
    ),
    news AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY 1
    ),
    docs AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1
    )
    SELECT docs.decile, docs.n_docs,
           coalesce(p.n_distinct, 0) AS n_distinct_shingles,
           coalesce(n.n_new, 0) AS n_new_shingles,
           round(CAST(coalesce(n.n_new, 0) AS DOUBLE)
                 / nullif(CAST(p.n_distinct AS DOUBLE), 0), 6) AS novelty_rate
    FROM docs
    LEFT JOIN per_decile p ON docs.decile = p.decile
    LEFT JOIN news n ON docs.decile = n.decile
    ORDER BY 1
    """,
)
def docs_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation curve: split the ingest order (doc_id span) into
    10 value-based deciles and report, per decile, how many distinct
    3-gram shingles appear and how many appear for the FIRST time -- the
    curve that answers "is new data still contributing new content, or
    are we re-crawling the same text?" (the dedup-ROI / diminishing-
    returns diagnostic a 100 TB crawl pipeline runs before paying for the
    next crawl batch; cf. the saturation analyses in the Gopher/
    RefinedWeb data papers).

    Deciles are VALUE-based over the doc_id span (floor((id-lo)*10/span),
    capped at 9), not rank-based: O(1) to compute from two scalars,
    identical in both engines, and -- unlike ntile() -- requiring NO
    global sort of the corpus (rank deciles single-partition 10^9 rows).
    For the fixture's dense ids they coincide with rank deciles.

    Scale: one corpus pass explodes (decile, shingle); first-occurrence
    is a min() partial agg keyed by shingle (vocabulary-bounded, the same
    shuffle key the distinct-per-decile count uses); everything after is
    |deciles| rows. No pair joins, no windows."""
    d0 = spread(load_table(spark, sf_dir, "documents"))
    bounds = d0.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    # integer floor-div (div) matches DuckDB's // exactly, including the
    # negative-id case a double division would round differently
    d = d0.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        F.expr("cast(least(9, ((doc_id - lo) * 10) div (hi - lo + 1)) as int)").alias(
            "decile"
        ),
        _tokens().alias("toks"),
    )
    ex = (
        d.filter(F.size("toks") >= 3)
        .select("decile", F.explode(_shingles(F.col("toks"))).alias("shingle"))
        .localCheckpoint(eager=False)  # feeds per-decile distinct AND first-seen
    )
    per_decile = ex.groupBy("decile").agg(
        F.countDistinct("shingle").cast("bigint").alias("n_distinct")
    )
    news = (
        ex.groupBy("shingle")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").cast("bigint").alias("n_new"))
    )
    docs = d.groupBy("decile").agg(F.count("*").cast("bigint").alias("n_docs"))
    return (
        docs.join(per_decile, "decile", "left")
        .join(news, "decile", "left")
        .select(
            "decile",
            "n_docs",
            F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias("n_distinct_shingles"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new_shingles"),
            F.round(
                F.coalesce("n_new", F.lit(0)).cast("double")
                / F.nullif(F.col("n_distinct").cast("double"), F.lit(0.0)),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


@register(
    "dataset_split_leakage",
    tags=("curation", "dedup", "dq"),
    oracle="""
    WITH assigned AS (
      SELECT doc_id, sha256(text) AS content_sha,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    fam AS (
      SELECT content_sha,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN split = 'val'   THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      FROM assigned GROUP BY 1
    ),
    pairs AS (
      SELECT 'train_val' AS leak_kind, n_train AS n_a, n_val AS n_b FROM fam
      UNION ALL
      SELECT 'train_test', n_train, n_test FROM fam
      UNION ALL
      SELECT 'val_test', n_val, n_test FROM fam
    )
    SELECT leak_kind,
           CAST(sum(CASE WHEN n_a > 0 AND n_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked_families,
           CAST(sum(CASE WHEN n_a > 0 AND n_b > 0 THEN n_b ELSE 0 END) AS BIGINT)
             AS n_contaminated_docs
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
)
def dataset_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit for ``dataset_split``'s hash
    assignment: exact-duplicate TEXT whose copies land in different
    splits. Hash-on-doc_id splitting is deterministic per document but
    NOT per content -- the same text re-crawled under two doc_ids can
    straddle train and eval, which silently inflates eval scores (the
    problem decontaminate_* solves against external benchmarks; this op
    measures it INSIDE the corpus's own split). Reports, per split pair,
    the number of duplicate families spanning both and the number of
    second-side docs contaminated (for train_val: val docs whose exact
    text is also in train).

    Zero on a perfectly deduped corpus -- so the production reading is
    "run dedup_exact first, or split on sha256(text) instead of doc_id";
    nonzero numbers quantify exactly what skipping that costs.

    Scale: one corpus pass to (content_sha, split) flags, partial-agg
    keyed by the digest (the dedup_exact shuffle: 32-byte keys, never
    text); the x3 pair stack and the final 3-row agg run on the family
    relation. Map-side split assignment, no windows, no joins."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix <= "cb", "train").when(prefix <= "e5", "val").otherwise("test")
    )
    fam = (
        d.select(F.sha2("text", 256).alias("content_sha"), split.alias("split"))
        .groupBy("content_sha")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
            .cast("bigint")
            .alias("n_val"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .cast("bigint")
            .alias("n_test"),
        )
    )
    pairs = fam.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("train_val").alias("leak_kind"),
                    F.col("n_train").alias("n_a"),
                    F.col("n_val").alias("n_b"),
                ),
                F.struct(
                    F.lit("train_test").alias("leak_kind"),
                    F.col("n_train").alias("n_a"),
                    F.col("n_test").alias("n_b"),
                ),
                F.struct(
                    F.lit("val_test").alias("leak_kind"),
                    F.col("n_val").alias("n_a"),
                    F.col("n_test").alias("n_b"),
                ),
            )
        ).alias("p")
    ).select("p.leak_kind", "p.n_a", "p.n_b")
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return (
        pairs.groupBy("leak_kind")
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_leaked_families"),
            F.sum(F.when(both, F.col("n_b")).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated_docs"),
        )
        .orderBy("leak_kind")
    )


@register(
    "sample_importance_reweight",
    tags=("curation", "northstar", "agg"),
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT) AS toks
      FROM documents WHERE length(text) > 0 AND source IS NOT NULL
    ),
    s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tokens
      FROM t GROUP BY 1
    ),
    g AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS k
      FROM s
    )
    SELECT source, n_docs, tokens,
           round(CAST(tokens AS DOUBLE) / tot, 6) AS actual_share,
           round(1.0 / k, 6) AS target_share,
           round(CAST(tot AS DOUBLE) / (CAST(k AS DOUBLE) * tokens), 6)
             AS weight,
           CAST(sum(n_docs) OVER () AS BIGINT) AS corpus_docs
    FROM s CROSS JOIN g
    """,
)
def sample_importance_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weights that rebalance the corpus to a UNIFORM-source
    token mixture: weight_s = target_share / actual_share per source --
    the domain-reweighting primitive (every doc in source s carries
    weight_s in the training sampler, so one epoch sees equal token mass
    per source without materializing a resample). The static-target
    sibling of sample_token_mixture (which materializes a sampled mix);
    weights compose with quality scores at sampler time.

    Exactness: token counts are exact integer sums; shares and weights
    are single divisions of exact operands at 6 dp.

    Scale: one pass over documents (JVM regexp token counting) to the
    |sources| grain; everything downstream is a k-row relation -- the
    OVER () total runs on k rows, not the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & F.col("source").isNotNull()
    )
    t = d.select(
        "source",
        F.size(
            F.expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")
        ).cast("bigint").alias("toks"),
    )
    s = t.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("tokens"),
    )
    g = s.agg(
        F.sum("tokens").cast("bigint").alias("tot"),
        F.count("*").cast("bigint").alias("k"),
    )
    j = s.crossJoin(F.broadcast(g))
    corpus = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return j.select(
        "source", "n_docs", "tokens",
        F.round(F.col("tokens").cast("double") / F.col("tot"), 6).alias("actual_share"),
        F.round(F.lit(1.0) / F.col("k"), 6).alias("target_share"),
        F.round(
            F.col("tot").cast("double") / (F.col("k").cast("double") * F.col("tokens")),
            6,
        ).alias("weight"),
        F.sum("n_docs").over(corpus).cast("bigint").alias("corpus_docs"),
    )


@register(
    "docs_dedup_survivor_quality_shift",
    tags=("curation", "dedup", "northstar"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len({TOKENS}) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             md5(text) AS h
      FROM documents
    ),
    surv AS (
      SELECT h, min(doc_id) AS keep FROM d GROUP BY h
    ),
    flag AS (
      SELECT d.*, CAST(d.doc_id = s.keep AS BOOLEAN) AS is_survivor
      FROM d JOIN surv s ON d.h = s.h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_survivor THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           round(1 - CAST(sum(CASE WHEN is_survivor THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS dup_rate,
           round(CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*), 6) AS mean_chars_all,
           round(CAST(sum(CASE WHEN is_survivor THEN CAST(n_chars AS DECIMAL(38,0))
                          ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN is_survivor THEN 1 ELSE 0 END), 0), 6)
             AS mean_chars_survivors,
           round(CAST(sum(CAST(n_tokens AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*), 6) AS mean_tokens_all,
           round(CAST(sum(CASE WHEN is_survivor THEN CAST(n_tokens AS DECIMAL(38,0))
                          ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN is_survivor THEN 1 ELSE 0 END), 0), 6)
             AS mean_tokens_survivors
    FROM flag
    GROUP BY source ORDER BY source
    """,
)
def docs_dedup_survivor_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after composition audit of exact dedup, per source: document
    count vs survivor count (md5-of-text families, min-doc_id
    survivorship -- the dedup_exact/dedup_canonical policy), and how the
    mean length statistics MOVE when duplicates drop -- the
    'did dedup change what my corpus looks like' readout every curation
    run should publish next to its savings number (duplicates are not
    length-neutral: boilerplate is short, mirrored articles are long, so
    dedup shifts the distribution the mixture plan was tuned on).

    Exactness: survivor flags are exact (digest-grain min); char/token
    masses accumulate as DECIMAL; the means divide once, rounded 6 dp,
    NULL-guarded for a hypothetical all-duplicate source.

    Scale: digests shuffle, text does not (the family discipline); one
    (digest)-grain reduce + one source-grain reduce."""
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5("text").alias("h"),
    )
    surv = d.groupBy("h").agg(F.min("doc_id").alias("keep"))
    flag = d.join(surv, "h").withColumn(
        "is_survivor", F.col("doc_id") == F.col("keep")
    )
    sflag = F.when(F.col("is_survivor"), 1).otherwise(0)
    chars_d = F.col("n_chars").cast("decimal(38,0)")
    toks_d = F.col("n_tokens").cast("decimal(38,0)")
    n_surv = F.sum(sflag)
    return (
        flag.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            n_surv.cast("bigint").alias("n_survivors"),
            F.round(1 - n_surv.cast("double") / F.count("*"), 6).alias("dup_rate"),
            F.round(F.sum(chars_d).cast("double") / F.count("*"), 6).alias(
                "mean_chars_all"
            ),
            F.round(
                F.sum(F.when(F.col("is_survivor"), chars_d).otherwise(F.lit(0)))
                .cast("double")
                / F.nullif(n_surv, F.lit(0)),
                6,
            ).alias("mean_chars_survivors"),
            F.round(F.sum(toks_d).cast("double") / F.count("*"), 6).alias(
                "mean_tokens_all"
            ),
            F.round(
                F.sum(F.when(F.col("is_survivor"), toks_d).otherwise(F.lit(0)))
                .cast("double")
                / F.nullif(n_surv, F.lit(0)),
                6,
            ).alias("mean_tokens_survivors"),
        )
        .orderBy("source")
    )


@register(
    "sample_dataset_card",
    tags=("curation", "northstar", "agg"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, lang,
             CAST(len({TOKENS}) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             md5(text) AS h
      FROM documents
    ),
    top_lang AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY lang ORDER BY n DESC, lang LIMIT 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS total_chars,
           round(CAST(sum(CAST(n_tokens AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*), 6) AS mean_tokens,
           round(1 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
             AS exact_dup_rate,
           (SELECT lang FROM top_lang) AS top_lang,
           round((SELECT CAST(n AS DOUBLE) FROM top_lang) / count(*), 6)
             AS top_lang_share
    FROM d
    """,
)
def sample_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the corpus: document/source/language
    counts, exact token and char masses, mean document length, exact
    duplicate rate, and the dominant language with its share -- the
    headline numbers a dataset datasheet publishes (Gebru et al. 2021
    'Datasheets for Datasets'; every public LLM corpus release carries
    exactly this table). The single-row summary that fronts the deeper
    panels already registered (docs_curation_funnel, language mix,
    length profiles).

    Exactness: every field is an exact count, an exact DECIMAL mass, or
    one division thereof; the top language is a count-desc, lang-asc
    deterministic argmax; dup rate = 1 - distinct digests / docs.

    Scale: one corpus pass to the moment row (count-distincts at
    source/lang/digest grain -- digest is the only wide one and is the
    same shuffle dedup_exact already pays); the top-lang probe is a
    |langs|-row reduce."""
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        "lang",
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5("text").alias("h"),
    ).localCheckpoint(eager=False)
    top = (
        d.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("n").alias("top_n"))
    )
    toks_d = F.col("n_tokens").cast("decimal(38,0)")
    chars_d = F.col("n_chars").cast("decimal(38,0)")
    return (
        d.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            F.sum(toks_d).cast("bigint").alias("total_tokens"),
            F.sum(chars_d).cast("bigint").alias("total_chars"),
            F.round(F.sum(toks_d).cast("double") / F.count("*"), 6).alias("mean_tokens"),
            F.round(1 - F.count_distinct("h").cast("double") / F.count("*"), 6).alias(
                "exact_dup_rate"
            ),
        )
        .crossJoin(F.broadcast(top))
        .select(
            "n_docs", "n_sources", "n_langs", "total_tokens", "total_chars",
            "mean_tokens", "exact_dup_rate", "top_lang",
            F.round(F.col("top_n").cast("double") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
        )
    )


@register(
    "docs_length_gini_by_source",
    tags=("curation", "quality"),
    oracle="""
    WITH x AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len
      FROM documents WHERE n_chars IS NOT NULL
    ),
    rk AS (
      SELECT source, len,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY len, doc_id) AS BIGINT) AS i
      FROM x
    ),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(sum(CAST(i AS DECIMAL(38,0)) * len) AS BIGINT) AS si
      FROM rk GROUP BY source
    )
    SELECT source, n_docs,
           round(CAST(s AS DOUBLE) / n_docs, 6) AS mean_chars,
           round((2.0 * si) / (CAST(n_docs AS DOUBLE) * s)
                 - (n_docs + 1.0) / n_docs, 6) AS length_gini
    FROM g WHERE n_docs >= 2 AND s > 0
    ORDER BY source
    """,
)
def docs_length_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source document-length inequality (Gini over n_chars): a
    natural crawl slice has substantial length dispersion (Gini ~0.4-0.6
    under the usual log-normal-ish length law); a source whose length
    Gini COLLAPSES toward 0 is emitting near-identical-length documents
    -- the template-farm / pagination-artifact signature that
    docs_template_lines then confirms at line grain, caught here from
    metadata alone before any text is read. The within-source
    counterpart of part_revenue_gini_lorenz's revenue concentration.

    Exactness: the Gini uses the exact rank formula
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with a fully tie-broken rank
    (len, doc_id) identical on both engines; rank-weighted sums
    accumulate in DECIMAL(38,0); one closed form rounded at 6dp.

    Scale: column-pruned metadata scan (text never reads); the rank
    window partitions BY SOURCE -- per-partition row counts are
    source-bounded, and the formula needs no global sort. Sources with
    one doc or zero total length are excluded on both engines."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    rk = d.select(
        "source",
        F.col("n_chars").cast("bigint").alias("len"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    g = rk.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("len").cast("decimal(38,0)")).cast("bigint").alias("s"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("len"))
        .cast("bigint")
        .alias("si"),
    )
    n = F.col("n_docs").cast("double")
    return (
        g.filter((F.col("n_docs") >= 2) & (F.col("s") > 0))
        .select(
            "source",
            "n_docs",
            F.round(F.col("s").cast("double") / n, 6).alias("mean_chars"),
            F.round(
                (2.0 * F.col("si")) / (n * F.col("s")) - (n + 1.0) / n, 6
            ).alias("length_gini"),
        )
        .orderBy("source")
    )


PACK_BIN_CAPACITY = 2048


@register("pack_context_bins_ffd", tags=("curation", "northstar"))
def pack_context_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window bin packing by First-Fit-Decreasing, parallel per
    source: pack each source's documents (whitespace token counts,
    oversized docs truncated to capacity -- they fill a bin alone) into
    {PACK_BIN_CAPACITY}-token training bins, reporting bins used, the
    ceil(total/capacity) lower bound, and the fill rate. FFD carries the
    classic 11/9 OPT + 6/9 guarantee (Dosa 2007's tight bound for
    Johnson's algorithm), so n_bins/lower_bound is an auditable
    packing-quality number -- pack_token_budget fills ONE budget
    sequentially; this packs the whole corpus into fixed windows, the
    shape sequence-packing trainers actually consume.

    Rows-only by declared contract: FFD is order-sequential within a
    group (no SQL twin); gates in tests/test_round19_ops.py pin
    capacity-respect, the FFD bound against the lower bound, and a
    planted exact-fit corpus packing to its optimum.

    Scale: packing parallelizes BY SOURCE via applyInPandas (each group
    sorts its own doc-size list in one Arrow batch -- groups are
    source-bounded; a 100 TB corpus packs per shard/source exactly like
    this, since bins never span sources in curriculum-cohesive
    packing). Only (source, n_tokens) rows move -- text never
    shuffles."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.least(
            F.size(_tokens()), F.lit(PACK_BIN_CAPACITY)
        ).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["source"].iloc[0]
        sizes = sorted((int(x) for x in pdf["n_tokens"] if x > 0), reverse=True)
        bins: list[int] = []
        for s in sizes:
            for i, used in enumerate(bins):
                if used + s <= PACK_BIN_CAPACITY:
                    bins[i] = used + s
                    break
            else:
                bins.append(s)
        total = sum(sizes)
        lower = -(-total // PACK_BIN_CAPACITY) if total else 0
        fill = (
            round(total / (len(bins) * PACK_BIN_CAPACITY), 6) if bins else None
        )
        return pd.DataFrame(
            [(src, len(sizes), total, len(bins), lower, fill)],
            columns=[
                "source", "n_docs", "total_tokens", "n_bins",
                "lower_bound", "fill_rate",
            ],
        )

    return (
        toks.groupBy("source")
        .applyInPandas(
            _pack,
            "source string, n_docs long, total_tokens long, n_bins long,"
            " lower_bound long, fill_rate double",
        )
        .orderBy("source")
    )


# Systematic sampling interval and the documented mid-interval offset:
# every k-th id starting at k DIV 2 -- the survey-sampling rule that
# spreads selections evenly through the frame.
SYSTEMATIC_K = 10
SYSTEMATIC_OFFSET = SYSTEMATIC_K // 2


@register(
    "sample_systematic_interval",
    tags=("curation", "sampling"),
    oracle=f"""
    WITH frame AS (
      SELECT source, doc_id,
             CAST(CASE WHEN doc_id % {SYSTEMATIC_K} = {SYSTEMATIC_OFFSET}
                       THEN 1 ELSE 0 END AS BIGINT) AS picked,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_frame,
             CAST(sum(picked) AS BIGINT) AS n_sample,
             CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS chars_frame,
             CAST(sum(CAST(picked * n_chars AS DECIMAL(38,0))) AS BIGINT)
               AS chars_sample
      FROM frame GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_frame) AS BIGINT) AS tf,
             CAST(sum(n_sample) AS BIGINT) AS ts
      FROM per
    )
    SELECT p.source, p.n_frame, p.n_sample,
           round(CAST(p.n_frame AS DOUBLE) / t.tf, 6) AS frame_share,
           round(CAST(p.n_sample AS DOUBLE) / nullif(t.ts, 0), 6)
             AS sample_share,
           round(CAST(p.chars_sample AS DOUBLE)
                 / nullif(p.chars_frame, 0)
                 * (CAST(p.n_frame AS DOUBLE) / nullif(p.n_sample, 0)), 6)
             AS mean_chars_ratio
    FROM per p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def sample_systematic_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (interval) sampling audit: pick every SYSTEMATIC_K-th
    document by id with the mid-interval offset (the survey-sampling
    classic -- Madow 1949 -- that spreads selections evenly through the
    frame instead of clustering like Bernoulli draws can), and report
    per source how faithfully the 1/k sample reproduces the frame:
    composition shares side by side, and the sampled-vs-frame mean
    document length ratio (~1 when the id ordering is uncorrelated with
    length; a drifting ratio means ids encode ingest order and the
    interval aliases a periodicity -- the one failure mode systematic
    sampling has). Completes the sampling family: hash (Bernoulli),
    stratified, reservoir, Neyman, temperature -- this is the
    zero-shuffle evenly-spaced member.

    Exactness: membership is exact integer modular arithmetic (no RNG,
    no hash); counts and char totals are exact integers through
    DECIMAL; the three ratios divide once at 6dp with nullif guards
    for empty samples.

    Scale: pure scan + map-side fold to |sources| partials -- the
    selection predicate is modular arithmetic on the id column, so at
    100 TB the sample can even PUSH DOWN to row-group pruning on an
    id-sorted layout; |sources| rows out."""
    d = load_table(spark, sf_dir, "documents")
    frame = d.select(
        "source",
        F.when(F.col("doc_id") % SYSTEMATIC_K == SYSTEMATIC_OFFSET, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("picked"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    per = frame.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_frame"),
        F.sum("picked").cast("bigint").alias("n_sample"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("bigint").alias("chars_frame"),
        F.sum((F.col("picked") * F.col("n_chars")).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("chars_sample"),
    )
    tot = per.agg(
        F.sum("n_frame").cast("bigint").alias("tf"),
        F.sum("n_sample").cast("bigint").alias("ts"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_frame",
            "n_sample",
            F.round(F.col("n_frame").cast("double") / F.col("tf"), 6).alias(
                "frame_share"
            ),
            F.round(
                F.col("n_sample").cast("double") / F.nullif(F.col("ts"), F.lit(0)),
                6,
            ).alias("sample_share"),
            F.round(
                F.col("chars_sample").cast("double")
                / F.nullif(F.col("chars_frame"), F.lit(0)).cast("double")
                * (
                    F.col("n_frame").cast("double")
                    / F.nullif(F.col("n_sample"), F.lit(0)).cast("double")
                ),
                6,
            ).alias("mean_chars_ratio"),
        )
        .orderBy("source")
    )
