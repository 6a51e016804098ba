"""Full-text relevance search (round-4 ES-parity extension).

The reference pipeline's entire purpose is landing change data in
Elasticsearch so it can be SEARCHED (``cmd/es_consumer/main.go`` indexes
into ``cdc_*``; README.md's Kibana walkthrough queries them). This module
is that search surface as a Spark query: BM25 ranking (the Lucene/ES
default similarity, public formula) over the documents corpus.

Scale design: query terms filter at the scan (map-side IN over exploded
tokens), so tf state is |matching (doc, term)| pairs, never the corpus
vocabulary; df and corpus stats reduce to a handful of broadcast scalars;
the final ranking is TakeOrderedAndProject top-k. One fact-table pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import TOKENS, _tokens

# the demo query -- three mid-frequency corpus terms; parameterize in a
# real deployment
_QUERY_TERMS = ["stream", "merge", "window"]
_K1, _B = 1.2, 0.75
_TOP = 20


@register(
    "search_bm25",
    tags=("text", "northstar", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl))
             ) AS score,
             count(*) AS n_terms_hit
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_TOP}
    """,
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_TOP} for a term query -- the ranking Elasticsearch runs
    over the reference's ``cdc_*`` indices (Lucene BM25Similarity, public
    docs; k1={_K1}, b={_B}), expressed as one corpus pass.

    Scale: the term IN-filter lands on the exploded token stream map-side
    (only query-term postings survive -- the moral equivalent of reading
    postings lists); tf partial-aggregates on (doc, term); df is |terms|
    rows and corpus stats are one row, both broadcast back; the top-k is
    TakeOrderedAndProject. Nothing corpus-sized ever shuffles: the tf
    relation is bounded by matching postings, exactly like an inverted
    index probe."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    # postings-bounded and consumed twice (df + scoring): materialize once
    # so the df branch doesn't re-tokenize the corpus (2 scans, not 3 --
    # the stats pass is the irreducible second one)
    tf = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    per_term = (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * F.col("tf")
                * (_K1 + 1)
                / (
                    F.col("tf")
                    + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).cast("double").alias("score"), F.count("*").alias("n_terms_hit"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
    )


@register(
    "search_facets",
    tags=("text", "northstar", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, source, {TOKENS} AS toks FROM documents
    ),
    hits AS (
      SELECT DISTINCT doc_id, lang, source
      FROM (SELECT doc_id, lang, source, unnest(toks) AS tok FROM toks)
      WHERE tok IN ('stream', 'merge', 'window')
    ),
    facets AS (
      SELECT 'lang' AS facet, lang AS bucket, count(*) AS n FROM hits GROUP BY lang
      UNION ALL
      SELECT 'source' AS facet, source AS bucket, count(*) AS n FROM hits GROUP BY source
    )
    SELECT facet, bucket, CAST(n AS BIGINT) AS n
    FROM facets
    ORDER BY facet, n DESC, bucket
    LIMIT 20
    """,
)
def search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search -- the aggregation half of the ES surface (terms
    aggregations over the match set, the counts Kibana renders beside
    results): documents matching any query term, bucketed by lang and by
    source.

    Scale: the match set derives from the same map-side postings probe as
    search_bm25 (term IN-filter on exploded tokens, then a distinct on
    doc ids -- bounded by matching docs); each facet is a partial agg over
    that reduced set, unioned and top-k'd. The corpus is scanned once;
    everything downstream is match-set-sized."""
    d = load_table(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", "lang", "source", F.explode(_tokens()).alias("tok"))
        .filter(F.col("tok").isin(_QUERY_TERMS))
        .select("doc_id", "lang", "source")
        .distinct()
    )
    lang_f = hits.groupBy(F.col("lang").alias("bucket")).agg(F.count("*").alias("n")).select(
        F.lit("lang").alias("facet"), "bucket", "n"
    )
    src_f = hits.groupBy(F.col("source").alias("bucket")).agg(F.count("*").alias("n")).select(
        F.lit("source").alias("facet"), "bucket", "n"
    )
    return (
        lang_f.unionByName(src_f)
        .orderBy("facet", F.col("n").desc(), "bucket")
        .limit(20)
    )


@register(
    "search_phrase",
    tags=("search", "text"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(toks)),
             i -> toks[i] = 'fast' AND toks[i+1] = 'query')) AS BIGINT) AS n_hits
    FROM toks
    WHERE len(list_filter(range(1, len(toks)),
            i -> toks[i] = 'fast' AND toks[i+1] = 'query')) > 0
    """,
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase match ("fast query") with per-document occurrence
    counts -- Elasticsearch ``match_phrase``. Lucene answers this by
    intersecting positional postings of the two terms; on a scan engine
    the strictly better plan is a one-pass bigram test over each
    document's token array: zero shuffles, zero joins, whole-stage
    codegen end to end (the postings-join shape would shuffle every term
    occurrence just to rediscover adjacency that is free in document
    order).

    Scale: embarrassingly parallel map-side filter; at 100 TB the only
    cost is the scan, and a z-ordered or term-bucketed layout prunes
    files before it (write_zordered, sources/files.py). Longer phrases
    extend the lambda, k-term proximity swaps equality for a window
    bound."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", _tokens().alias("toks"))
    # Spark arrays are 0-indexed (DuckDB's are 1-indexed): i in 0..size-2
    # Guard size >= 2: sequence(0, -1) infers a NEGATIVE step and yields
    # [0, -1], whose lambda indexes toks[-1] / toks[0] on short docs and
    # throws INVALID_ARRAY_INDEX under ANSI mode; the oracle's range(1, len)
    # is simply empty there.
    hits = F.when(
        F.size("toks") >= 2,
        F.expr(
            "size(filter(sequence(0, size(toks) - 2),"
            " i -> toks[i] = 'fast' AND toks[i+1] = 'query'))"
        ),
    ).otherwise(F.lit(0))
    return (
        d.select("doc_id", hits.cast("bigint").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


@register(
    "knn_cosine_hybrid",
    tags=("search", "similarity", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {{TOKENS}} AS toks FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    bscore AS (
      SELECT tf.doc_id,
             sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl))
             ) AS score
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    brank AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r
      FROM bscore QUALIFY r <= 50
    ),
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT v, nrm FROM v WHERE vec_id = 0),
    cs AS (
      SELECT c.vec_id AS doc_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM v c CROSS JOIN q WHERE c.vec_id <> 0
    ),
    vrank AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS r
      FROM cs QUALIFY r <= 50
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, vr.doc_id) AS doc_id,
             COALESCE(b.r, 0) AS bm25_rank,
             COALESCE(vr.r, 0) AS vec_rank
      FROM brank b FULL OUTER JOIN vrank vr ON b.doc_id = vr.doc_id
    )
    SELECT doc_id, bm25_rank, vec_rank,
           round((CASE WHEN bm25_rank > 0 THEN 1.0 / (60 + bm25_rank) ELSE 0 END)
               + (CASE WHEN vec_rank  > 0 THEN 1.0 / (60 + vec_rank)  ELSE 0 END),
             6) AS rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT 20
    """.replace("{TOKENS}", TOKENS),
)
def knn_cosine_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 candidates UNION vector candidates, fused
    with reciprocal-rank fusion (RRF, k=60 -- the public Cormack/Clarke
    formula Elasticsearch ships as its hybrid default). This is the query
    the reference's ES users run next once both a text index and a vector
    field exist over the replicated rows: lexical recall catches exact
    terms, the embedding catches paraphrase, RRF needs no score
    calibration between the two.

    The text list is the search_bm25 scorer; the vector list is cosine
    against the vec_id=0 embedding (doc_id joins vec_id -- the
    multimodal_join contract). Each list keeps its top-50 via
    TakeOrderedAndProject BEFORE the rank window, so the row_number runs
    on <=50 rows -- ranks never funnel a corpus-sized relation into one
    reducer. Ranks are exact integers; the fused score is one double
    expression over them, rounded once.

    Scale: BM25 side is postings-bounded (term IN-filter before tf agg,
    broadcast df/stats); vector side is broadcast-query map-side dot
    products; the fusion join is 50x50 rows. Nothing corpus-sized
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    tf = (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .filter(F.col("tok").isin(_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)  # consumed by dfr AND the scoring join
    )
    dfr = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    bscore = (
        tf.join(F.broadcast(dfr), "tok")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * F.col("tf")
                * (_K1 + 1)
                / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    wb = Window.orderBy(F.col("score").desc(), "doc_id")
    brank = (
        bscore.orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
        .withColumn("bm25_rank", F.row_number().over(wb).cast("int"))
        .select("doc_id", "bm25_rank")
    )

    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0D, (acc, x) -> acc + x)"
        )
    )
    # hygiene filter (same rule as similarity._vectors): zero/non-finite
    # norms cannot participate in cosine scoring
    v = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), nrm.alias("nrm")
    ).filter((F.col("nrm") > 0) & (F.col("nrm") < float("inf")))
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot = F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cs = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (F.col("qnrm") * F.col("nrm")), 6).alias("cosine"),
        )
    )
    wv = Window.orderBy(F.col("cosine").desc(), "doc_id")
    vrank = (
        cs.orderBy(F.col("cosine").desc(), "doc_id")
        .limit(50)
        .withColumn("vec_rank", F.row_number().over(wv).cast("int"))
        .select("doc_id", "vec_rank")
    )

    fused = brank.join(vrank, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
        F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
    )
    rrf = F.round(
        F.when(F.col("bm25_rank") > 0, 1.0 / (60 + F.col("bm25_rank"))).otherwise(0.0)
        + F.when(F.col("vec_rank") > 0, 1.0 / (60 + F.col("vec_rank"))).otherwise(0.0),
        6,
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(20)
    )


# fuzzy demo query: a mid-frequency corpus term; edit-distance 1 matches
# its inflections/typos (ES `fuzzy` with fuzziness=1, prefix_length=0)
_FUZZY_Q = "stream"
_FUZZY_D = 1


@register(
    "search_fuzzy_match",
    tags=("text", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    hits AS (
      SELECT doc_id, tok,
             levenshtein(tok, '{_FUZZY_Q}') AS d,
             CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
      WHERE abs(len(tok) - {len(_FUZZY_Q)}) <= {_FUZZY_D}
        AND levenshtein(tok, '{_FUZZY_Q}') <= {_FUZZY_D}
      GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_variants,
           round(CAST(sum(CAST(round(tf * (1.0 - CAST(d AS DOUBLE) / {len(_FUZZY_Q)}), 6)
                                AS DECIMAL(18,6))) AS DOUBLE), 6) AS score
    FROM hits
    GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT {_TOP}
    """,
)
def search_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``fuzzy`` query parity: top-{_TOP} documents containing a token
    within Levenshtein distance {_FUZZY_D} of '{_FUZZY_Q}' (ES fuzziness=1,
    prefix_length=0), scored by edit-distance-discounted term frequency --
    each occurrence contributes 1 - d/|q| (ES's fuzziness boost shape), so
    exact hits dominate one-edit variants at equal tf.

    Exactness: per-(doc, variant) contributions snap to 6 dp DECIMAL
    before the per-doc sum (accumulation-order-free); ties at the top-k
    boundary break on doc_id in both engines.

    Scale: one corpus pass -- the length-band prefilter
    (abs(len(tok)-|q|) <= {_FUZZY_D}, a cheap map-side guard) runs BEFORE
    the levenshtein call on the exploded token stream, the survivors
    partial-aggregate on (doc, token), and the top-k is
    TakeOrderedAndProject. At 100 TB you'd expand the query against the
    distinct-token VOCABULARY first (|V| levenshtein calls instead of one
    per occurrence -- exactly how Lucene walks its term FST) and IN-join
    the variants into the posting probe; the fused form here keeps one
    scan, which wins while |corpus| x band-hit-rate is small."""
    d = load_table(spark, sf_dir, "documents")
    qlen = len(_FUZZY_Q)
    hits = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .filter(F.abs(F.length("tok") - qlen) <= _FUZZY_D)
        .withColumn("d", F.levenshtein(F.col("tok"), F.lit(_FUZZY_Q)))
        .filter(F.col("d") <= _FUZZY_D)
        .groupBy("doc_id", "tok", "d")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    contrib = F.round(
        F.col("tf") * (1.0 - F.col("d").cast("double") / qlen), 6
    ).cast("decimal(18,6)")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_hits"),
            F.count("*").cast("bigint").alias("n_variants"),
            F.round(F.sum(contrib).cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
    )


# MLT demo source document + ES-default-ish knobs (max_query_terms=25,
# min_doc_freq=2); parameterize in a real deployment
_MLT_DOC = 7
_MLT_TERMS = 25
_MLT_MIN_DF = 2


@register(
    "search_more_like_this",
    tags=("text", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks
    ),
    post AS (
      SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      GROUP BY 1, 2
    ),
    src_terms AS (
      SELECT tok, tf AS src_tf FROM post WHERE doc_id = {_MLT_DOC}
    ),
    df AS (
      SELECT p.tok, CAST(count(*) AS BIGINT) AS df
      FROM post p JOIN src_terms s ON p.tok = s.tok
      GROUP BY 1
    ),
    sel AS (
      SELECT s.tok, df.df,
             round(s.src_tf * ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1), 6)
               AS term_score
      FROM src_terms s JOIN df ON s.tok = df.tok CROSS JOIN stats
      WHERE df.df >= {_MLT_MIN_DF}
      ORDER BY term_score DESC, s.tok
      LIMIT {_MLT_TERMS}
    ),
    scored AS (
      SELECT p.doc_id,
             CAST(count(*) AS BIGINT) AS n_terms_hit,
             round(CAST(sum(CAST(round(
               ln((stats.n_docs - sel.df + 0.5) / (sel.df + 0.5) + 1)
               * p.tf * ({_K1} + 1)
               / (p.tf + {_K1} * (1 - {_B} + {_B} * p.dl / stats.avgdl)), 6)
               AS DECIMAL(18,6))) AS DOUBLE), 6) AS score
      FROM post p JOIN sel ON p.tok = sel.tok CROSS JOIN stats
      WHERE p.doc_id <> {_MLT_DOC}
      GROUP BY 1
    )
    SELECT doc_id, n_terms_hit, score FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_TOP}
    """,
)
def search_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``more_like_this`` parity: find the {_TOP} documents most
    similar to doc {_MLT_DOC} by (1) selecting its {_MLT_TERMS} most
    characteristic terms (tf x BM25-idf, min_doc_freq={_MLT_MIN_DF} --
    the MLT term-selection recipe from the ES docs) and (2) BM25-scoring
    the corpus on that derived term query. The related-content /
    find-similar-tickets query every ES deployment runs; completes the
    search family (bm25 = explicit terms, fuzzy = typo-tolerant terms,
    MLT = terms derived from an exemplar document).

    Exactness: term scores and per-(doc, term) BM25 contributions snap to
    6 dp (DECIMAL before the per-doc sum), ties break on token / doc_id,
    so the selected term set and the final ranking are engine-identical.

    Scale: the postings relation (doc, term, tf, dl) partial-aggregates
    from one corpus pass and is consumed THREE times (source terms, df of
    source terms, match scoring) -- materialize-once; df counts only the
    SOURCE document's terms (semi-join against its |terms|-row set, never
    corpus vocabulary); the selected 25-term relation broadcasts into the
    scoring join, so matching reads postings map-side exactly like
    search_bm25; top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    # 1-row relation with TWO consumers (term selection + match scoring):
    # materialize once or each crossJoin re-tokenizes the corpus
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    ).localCheckpoint(eager=False)
    post = (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)  # src terms + df + scoring
    )
    src_terms = post.filter(F.col("doc_id") == _MLT_DOC).select(
        "tok", F.col("tf").alias("src_tf")
    )
    df = (
        post.join(F.broadcast(src_terms.select("tok")), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    sel = (
        src_terms.join(df, "tok")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") >= _MLT_MIN_DF)
        .select("tok", "df", F.round(F.col("src_tf") * idf, 6).alias("term_score"))
        .orderBy(F.col("term_score").desc(), "tok")
        .limit(_MLT_TERMS)
    )
    contrib = F.round(
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
        6,
    ).cast("decimal(18,6)")
    return (
        post.filter(F.col("doc_id") != _MLT_DOC)
        .join(F.broadcast(sel), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            F.round(F.sum(contrib).cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
    )


def _bm25_relevance_ranking(spark: SparkSession, sf_dir: str):
    """Shared eval substrate for search_ndcg_eval / search_mrr_eval: the
    BM25 top-k ranking as (rel, rn) rows over _QUERY_TERMS plus the
    per-doc term-coverage relevance relation -- ONE definition, so both
    metrics provably grade the SAME ranking (they previously hand-copied
    the pipeline; a scoring tweak applied to one would silently diverge
    the other). Same postings-probe shape as search_bm25."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)  # df + scoring + relevance reuse it
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    idf * F.col("tf") * (_K1 + 1)
                    / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
                ),
                6,
            ).alias("score")
        )
    )
    rel = tf.groupBy("doc_id").agg(
        F.count_distinct(F.col("tok")).cast("bigint").alias("rel")
    ).localCheckpoint(eager=False)  # both rankings / both metrics consume it
    ranked = (
        scored.join(rel, "doc_id")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .alias("rn"),
        )
        .localCheckpoint(eager=False)
    )
    return ranked, rel


@register(
    "search_ndcg_eval",
    tags=("search", "northstar", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len(toks)) AS avgdl
      FROM toks
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS tok
        FROM toks
      )
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, dl, tok
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * ({_K1} + 1)
               / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))), 6) AS score
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    rel AS (
      SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS rel FROM tf GROUP BY doc_id
    ),
    ranked AS (
      SELECT r.rel, row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rn
      FROM scored s JOIN rel r ON s.doc_id = r.doc_id
      ORDER BY s.score DESC, s.doc_id LIMIT {_TOP}
    ),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rn
      FROM rel ORDER BY rel DESC, doc_id LIMIT {_TOP}
    ),
    ks AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT CAST(k AS INT) AS k,
           round((SELECT sum((pow(2, rel) - 1) / ln(rn + 1))
                  FROM ranked WHERE rn <= k), 6) AS dcg,
           round((SELECT sum((pow(2, rel) - 1) / ln(rn + 1))
                  FROM ideal WHERE rn <= k), 6) AS idcg,
           round((SELECT sum((pow(2, rel) - 1) / ln(rn + 1))
                  FROM ranked WHERE rn <= k)
                 / nullif((SELECT sum((pow(2, rel) - 1) / ln(rn + 1))
                           FROM ideal WHERE rn <= k), 0), 6) AS ndcg
    FROM ks
    """,
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{{5,10,20}} of the BM25 ranking against a deterministic graded
    relevance label (rel = how many distinct query terms the document
    contains, 0-3) -- the standard ranking-quality evaluation closed over
    engine-computable ground truth, so the metric itself is
    oracle-checkable end to end (search_bm25 produces the ranking; this
    measures it; a scoring regression moves ndcg before anyone reads
    result lists). Natural-log discount (ln instead of log2 -- the
    constant cancels in ndcg and keeps both engines on the same libm
    call).

    Exactness: relevance grades and ranks are exact integers; gains
    2^rel - 1 are exact small doubles; the <= 20-term discounted sums
    round at 6 dp; ndcg divides the two rounded sums with a nullif
    guard.

    Scale: identical postings-probe shape to search_bm25 (query-term
    IN-filter lands map-side; tf is postings-bounded); both rankings cut
    to top-20 before any window ranks them, so the rank windows see
    <= 20 rows -- at wider corpora the cut is TakeOrderedAndProject
    either way."""
    ranked, rel = _bm25_relevance_ranking(spark, sf_dir)
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(_TOP)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), "doc_id"))
            .alias("rn"),
        )
    )
    ks = spark.createDataFrame([(5,), (10,), (20,)], "k int")
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log(F.col("rn") + 1)
    # LEFT joins: an empty ranking (no doc matches any query term) must
    # still yield the three k rows with NULL sums -- the shape the
    # oracle's scalar subqueries produce (caught by the hostile-corpus
    # sweep, where an inner join returned zero rows)
    dcg = (
        ks.join(ranked, ranked["rn"] <= ks["k"], "left")
        .groupBy("k")
        .agg(F.round(F.sum(gain), 6).alias("dcg"))
    )
    idcg = (
        ks.join(ideal, ideal["rn"] <= ks["k"], "left")
        .groupBy("k")
        .agg(F.round(F.sum(gain), 6).alias("idcg"))
    )
    return (
        dcg.join(idcg, "k")
        .select(
            F.col("k").cast("int").alias("k"),
            "dcg",
            "idcg",
            F.round(
                F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0)), 6
            ).alias("ndcg"),
        )
    )


@register(
    "search_mrr_eval",
    tags=("search", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len(toks)) AS avgdl
      FROM toks
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS tok
        FROM toks
      )
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, dl, tok
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * ({_K1} + 1)
               / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))), 6) AS score
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    rel AS (
      SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS rel FROM tf GROUP BY doc_id
    ),
    ranked AS (
      SELECT r.rel, row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rn
      FROM scored s JOIN rel r ON s.doc_id = r.doc_id
      ORDER BY s.score DESC, s.doc_id LIMIT {_TOP}
    )
    SELECT CAST((SELECT count(*) FROM rel WHERE rel = 3) AS BIGINT)
             AS n_fully_relevant,
           CAST(coalesce((SELECT min(rn) FROM ranked WHERE rel = 3), 0) AS BIGINT)
             AS first_relevant_rank,
           round(coalesce(1.0 / nullif((SELECT min(rn) FROM ranked
                                        WHERE rel = 3), 0), 0), 6)
             AS mrr,
           round(CAST((SELECT count(*) FROM ranked WHERE rn <= 10 AND rel >= 2)
                      AS DOUBLE)
                 / nullif(least((SELECT count(*) FROM rel WHERE rel >= 2), 10), 0),
                 6) AS recall_at_10
    """,
)
def search_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and recall@10 of the BM25 ranking under the same deterministic
    term-coverage relevance as search_ndcg_eval: MRR = 1/rank of the
    first fully-relevant document (all three query terms present),
    recall@10 = share of the (capped) rel>=2 pool surfaced in the top
    ten -- the two navigational-search metrics nDCG's graded view
    doesn't report directly.

    Exactness: ranks and pools are exact integers off the same 6dp-
    rounded-score ranking as the BM25/nDCG family; 0 sentinel when no
    fully-relevant doc makes the cut.

    Scale: the search_bm25 postings-probe shape; both metrics read the
    <= 20-row ranked relation and tiny pool counts."""
    ranked, rel = _bm25_relevance_ranking(spark, sf_dir)
    # coalesce: an EMPTY rel relation (no term matches anywhere) sums to
    # NULL in Spark where the oracle's COUNTs give 0 (hostile-corpus sweep)
    pools = rel.agg(
        F.coalesce(F.sum(F.when(F.col("rel") == 3, 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias("n_full"),
        F.coalesce(F.sum(F.when(F.col("rel") >= 2, 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias("n_rel2"),
    )
    firsts = ranked.agg(
        F.min(F.when(F.col("rel") == 3, F.col("rn"))).alias("fr"),
        F.coalesce(
            F.sum(F.when((F.col("rn") <= 10) & (F.col("rel") >= 2), 1).otherwise(0)),
            F.lit(0),
        ).cast("bigint").alias("hit10"),
    )
    return pools.crossJoin(F.broadcast(firsts)).select(
        F.col("n_full").alias("n_fully_relevant"),
        F.coalesce(F.col("fr"), F.lit(0)).cast("bigint").alias("first_relevant_rank"),
        F.round(
            F.coalesce(1.0 / F.nullif(F.col("fr").cast("double"), F.lit(0.0)), F.lit(0.0)),
            6,
        ).alias("mrr"),
        F.round(
            F.col("hit10").cast("double")
            / F.nullif(F.least(F.col("n_rel2"), F.lit(10)).cast("double"), F.lit(0.0)),
            6,
        ).alias("recall_at_10"),
    )


@register(
    "search_prf_expansion",
    tags=("text", "northstar", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks
    ),
    tf0 AS (
      SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, tok
    ),
    df0 AS (SELECT tok, count(*) AS df FROM tf0 GROUP BY tok),
    seed AS (
      SELECT tf0.doc_id,
             sum(ln((stats.n_docs - df0.df + 0.5) / (df0.df + 0.5) + 1)
                 * tf0.tf * ({_K1} + 1)
                 / (tf0.tf + {_K1} * (1 - {_B} + {_B} * tf0.dl / stats.avgdl)))
               AS score
      FROM tf0 JOIN df0 ON tf0.tok = df0.tok CROSS JOIN stats
      GROUP BY tf0.doc_id
      ORDER BY round(score, 6) DESC, tf0.doc_id LIMIT 10
    ),
    exp_terms AS (
      SELECT tok FROM (
        SELECT tok, count(DISTINCT t.doc_id) AS rdf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM toks) t
        JOIN seed ON t.doc_id = seed.doc_id
        WHERE length(tok) >= 4 AND tok NOT IN ('stream', 'merge', 'window')
        GROUP BY tok
      ) ORDER BY rdf DESC, tok LIMIT 5
    ),
    q AS (
      SELECT tok FROM exp_terms
      UNION ALL SELECT unnest(['stream', 'merge', 'window'])
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      WHERE tok IN (SELECT tok FROM q)
      GROUP BY doc_id, tok
    ),
    dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             sum(ln((stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5) + 1)
                 * tf.tf * ({_K1} + 1)
                 / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl)))
               AS score,
             count(*) AS n_terms_hit
      FROM tf JOIN dfx ON tf.tok = dfx.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_TOP}
    """,
)
def search_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-style two-pass
    retrieval, the classic PRF loop ES exposes via significant-terms
    aggregations): pass 1 ranks the corpus by BM25 for the seed query;
    the 5 terms most common across the top-10 feedback docs (distinct-doc
    frequency, length >= 4, seeds excluded, term-asc tiebreak) join the
    query; pass 2 re-ranks with the expanded term set and returns the
    top-{_TOP}. The recall-repair tool when the seed vocabulary misses
    relevant phrasing -- the lexical cousin of knn_cosine_hybrid's RRF.

    Exactness: both passes use the established BM25 closed form (shared
    ln arithmetic, 6-dp output round); term selection and feedback-doc
    selection are exact counts with full deterministic tiebreaks.

    Scale: each pass is the postings-probe shape of search_bm25 (the
    IN-filter lands map-side; only matching postings shuffle); the
    feedback-doc term profile explodes ONLY the 10 feedback docs; the
    expansion vocabulary is a <= 8-term broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks")).localCheckpoint(eager=False)
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )

    def bm25(term_filter, tiebreak_limit):
        tf = (
            toks.select(
                "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
            )
            .join(F.broadcast(term_filter), "tok")
            .groupBy("doc_id", "tok")
            .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
            .localCheckpoint(eager=False)
        )
        dfr = tf.groupBy("tok").agg(F.count("*").alias("df"))
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
        )
        w = (
            idf
            * F.col("tf")
            * (_K1 + 1)
            / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
        )
        # Round to the 6-dp output grain BEFORE the top-k cutoff (the
        # search_bm25 convention): float-sum partial-agg order is
        # nondeterministic, so raw scores within 1e-6 of the cutoff
        # would otherwise flip membership across engines or runs.
        return (
            tf.join(F.broadcast(dfr), "tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(
                F.round(F.sum(w), 6).cast("double").alias("score"),
                F.count("*").alias("n_terms_hit"),
            )
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(tiebreak_limit)
        )

    seeds = spark.createDataFrame([(t,) for t in _QUERY_TERMS], "tok string")
    feedback = bm25(seeds, 10).select("doc_id").localCheckpoint(eager=False)
    exp_terms = (
        toks.join(F.broadcast(feedback), "doc_id")
        .select("doc_id", F.explode("toks").alias("tok"))
        .filter((F.length("tok") >= 4) & ~F.col("tok").isin(_QUERY_TERMS))
        .groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("rdf"))
        .orderBy(F.col("rdf").desc(), "tok")
        .limit(5)
        .select("tok")
    )
    q = exp_terms.unionByName(seeds).localCheckpoint(eager=False)
    return bm25(q, _TOP).select(
        "doc_id",
        "score",  # already 6-dp rounded inside bm25 (pre-cutoff)
        F.col("n_terms_hit").cast("bigint").alias("n_terms_hit"),
    )


@register(
    "search_snippet_best_window",
    tags=("text", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    hits AS (
      SELECT doc_id, toks, CAST(p AS BIGINT) AS p
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM toks)
      WHERE toks[p] IN ('stream', 'merge', 'window')
    ),
    win AS (
      SELECT doc_id, toks, p,
             CAST(count(*) OVER (PARTITION BY doc_id ORDER BY p
                                 RANGE BETWEEN CURRENT ROW AND 19 FOLLOWING)
               AS BIGINT) AS n_in_window
      FROM hits
    ),
    best AS (
      SELECT doc_id, toks, p, n_in_window,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY n_in_window DESC, p) AS rk
      FROM win
    )
    SELECT doc_id,
           p AS best_start,
           n_in_window AS n_query_hits,
           array_to_string(toks[p:p+19], ' ') AS snippet
    FROM best WHERE rk = 1
    ORDER BY doc_id
    """,
)
def search_snippet_best_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-snippet extraction: for every document matching the seed
    query, the 20-token window holding the MOST query-term occurrences
    (earliest window on ties) with its rendered text -- the highlighter
    behind every search UI (Lucene's unified highlighter solves exactly
    this window-maximization). A window starting at a hit is optimal
    without loss of generality (sliding right to the first covered hit
    loses nothing), so candidate starts are hit positions only.

    Exactness: hit positions are exact integers; the per-candidate count
    is a RANGE frame over [p, p+19]; argmax tiebreak (count desc, start
    asc) is total; the snippet renders from the same token array on both
    engines.

    Scale: the corpus explodes map-side and only QUERY-TERM positions
    survive to the shuffle (postings-probe discipline, like search_bm25);
    the RANGE window and argmax run at hit grain, bounded by matches, and
    the snippet join-back touches only matching docs."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks")).localCheckpoint(eager=False)
    hits = toks.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).filter(F.col("tok").isin(_QUERY_TERMS)).select(
        "doc_id", (F.col("p0") + 1).cast("bigint").alias("p")
    )
    wr = Window.partitionBy("doc_id").orderBy("p").rangeBetween(0, 19)
    win = hits.withColumn("n_in_window", F.count("*").over(wr).cast("bigint"))
    wb = Window.partitionBy("doc_id").orderBy(F.col("n_in_window").desc(), "p")
    best = win.withColumn("rk", F.row_number().over(wb)).filter(F.col("rk") == 1)
    return (
        best.join(toks, "doc_id")
        .select(
            "doc_id",
            F.col("p").alias("best_start"),
            F.col("n_in_window").alias("n_query_hits"),
            F.array_join(
                F.slice(F.col("toks"), F.col("p").cast("int"), 20), " "
            ).alias("snippet"),
        )
        .orderBy("doc_id")
    )


@register(
    "search_alpha_dcg_diversity",
    tags=("search", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len(toks)) AS avgdl
      FROM toks
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS tok
        FROM toks
      )
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, dl, tok
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * ({_K1} + 1)
               / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))), 6) AS score
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    rel AS (
      SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS rel
      FROM tf GROUP BY doc_id
    ),
    ranked AS (
      SELECT s.doc_id, r.rel, d.lang,
             CAST(row_number() OVER (ORDER BY s.score DESC, s.doc_id)
               AS BIGINT) AS rn
      FROM scored s
      JOIN rel r ON s.doc_id = r.doc_id
      JOIN documents d ON s.doc_id = d.doc_id
      ORDER BY s.score DESC, s.doc_id LIMIT {_TOP}
    ),
    gains AS (
      SELECT rn,
             (pow(2, rel) - 1) / ln(rn + 1) AS g_plain,
             (pow(2, rel) - 1)
               * pow(0.5, CAST(row_number() OVER (
                   PARTITION BY lang ORDER BY rn) AS BIGINT) - 1)
               / ln(rn + 1) AS g_alpha
      FROM ranked
    ),
    ks AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT CAST(k AS INT) AS k,
           round((SELECT sum(CAST(g_plain AS DECIMAL(20,15)))
                  FROM gains WHERE rn <= k), 6) AS dcg_plain,
           round((SELECT sum(CAST(g_alpha AS DECIMAL(20,15)))
                  FROM gains WHERE rn <= k), 6) AS dcg_alpha,
           round((SELECT sum(CAST(g_alpha AS DECIMAL(20,15)))
                  FROM gains WHERE rn <= k)
                 / nullif((SELECT sum(CAST(g_plain AS DECIMAL(20,15)))
                           FROM gains WHERE rn <= k), 0), 6)
             AS diversity_ratio
    FROM ks
    """,
)
def search_alpha_dcg_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-discounted DCG panel (the alpha-DCG gain model of
    Clarke et al. 2008 at alpha = 0.5, aspects = document language):
    each result's graded gain is discounted by 0.5^(number of
    same-aspect documents ranked above it), so a lang-redundant top-k
    scores below a lang-diverse one at equal relevance. Reported at
    k in {{5, 10, 20}} next to the plain DCG and their ratio -- the
    redundancy penalty in one number. NOT normalized alpha-nDCG: the
    diversity-ideal ranking is NP-hard and the standard greedy ideal is
    estimator-specific, so this panel reports the well-defined
    numerator pair instead (the knn_mmr_diversified evaluation
    counterpart -- MMR is the fixer, this is the meter).

    Exactness: relevance grades and ranks are exact integers; alpha =
    0.5 keeps every discount a power of two; each gain term snaps to
    DECIMAL(20,15) before its order-free sum; the BM25 ranking reuses
    the established 6dp round-then-rank cutoff.

    Scale: postings-probe BM25 (only query-term postings shuffle), a
    {_TOP}-row ranked list, and <= 60 output-side arithmetic rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", _tokens().alias("toks")).localCheckpoint(
        eager=False
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    seeds = spark.createDataFrame([(t,) for t in _QUERY_TERMS], "tok string")
    tf = (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .join(F.broadcast(seeds), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)  # df, scored, rel all consume it
    )
    dfr = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    w = (
        idf * F.col("tf") * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfr), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(w), 6).alias("score"))
    )
    rel = tf.groupBy("doc_id").agg(F.count_distinct("tok").cast("bigint").alias("rel"))
    ranked = (
        scored.join(rel, "doc_id")
        .join(toks.select("doc_id", "lang"), "doc_id")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
        .select(
            "doc_id", "rel", "lang",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .cast("bigint")
            .alias("rn"),
        )
        .localCheckpoint(eager=False)  # three k cuts consume it
    )
    seen = (
        F.row_number().over(Window.partitionBy("lang").orderBy("rn")).cast("bigint") - 1
    )
    gains = ranked.select(
        "rn",
        ((F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log(F.col("rn") + 1)).alias("g_plain"),
        (
            (F.pow(F.lit(2.0), F.col("rel")) - 1)
            * F.pow(F.lit(0.5), seen)
            / F.log(F.col("rn") + 1)
        ).alias("g_alpha"),
    ).localCheckpoint(eager=False)
    ks = spark.createDataFrame([(5,), (10,), (20,)], "k int")
    cut = gains.crossJoin(F.broadcast(ks)).filter(F.col("rn") <= F.col("k"))
    per_k = cut.groupBy("k").agg(
        F.round(F.sum(F.col("g_plain").cast("decimal(20,15)")), 6)
        .cast("double").alias("dcg_plain"),
        F.round(F.sum(F.col("g_alpha").cast("decimal(20,15)")), 6)
        .cast("double").alias("dcg_alpha"),
        F.round(
            F.sum(F.col("g_alpha").cast("decimal(20,15)")).cast("double")
            / F.nullif(
                F.sum(F.col("g_plain").cast("decimal(20,15)")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("diversity_ratio"),
    )
    # LEFT join onto the constant k panel: a corpus with ZERO query-term
    # matches must emit the oracle's three NULL rows, not vanish (the
    # ks CTE always produces its rows -- hostile-corpus sweep catch)
    return ks.join(per_k, "k", "left").select(
        "k", "dcg_plain", "dcg_alpha", "diversity_ratio"
    ).orderBy("k")


_MU = 2000  # Dirichlet smoothing pseudo-count (Zhai & Lafferty's default range)


@register(
    "search_query_likelihood_dirichlet",
    tags=("text", "search"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    stats AS (
      SELECT CAST(sum(len(toks)) AS BIGINT) AS c_len FROM toks
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf,
             CAST(any_value(dl) AS BIGINT) AS dl
      FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM toks)
      WHERE tok IN ('stream', 'merge', 'window')
      GROUP BY doc_id, tok
    ),
    cf AS (
      SELECT tok, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1 + CAST(tf.tf AS DOUBLE) * stats.c_len
                      / ({_MU}.0 * cf.cf))
               + ln({_MU}.0 / (tf.dl + {_MU}.0))
             ) AS score,
             count(*) AS n_terms_hit
      FROM tf JOIN cf ON tf.tok = cf.tok CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_TOP}
    """,
)
def search_query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001;
    the LMDirichletSimilarity Lucene ships next to BM25): per matched
    term, log(1 + tf * |C| / (mu * cf)) + log(mu / (dl + mu)) with
    mu = {_MU}, summed per document -- the language-model ranking family
    member alongside search_bm25 (probabilistic IR) and
    knn_cosine_hybrid (RRF fusion), sharing the same query terms so the
    three rankers are directly comparable on one corpus.

    Exactness: tf, cf, dl, |C| are exact integers; each term score is
    one shared closed double form (round-then-order at 6dp with doc_id
    tiebreak, the search-family convention).

    Scale: identical postings shape to search_bm25 -- the IN-filter
    lands on the exploded stream map-side so only query-term postings
    survive; cf is |terms| rows and the collection length one row, both
    broadcast; TakeOrderedAndProject for the top-{_TOP}."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    stats = toks.agg(F.sum(F.size("toks")).cast("bigint").alias("c_len"))
    tf = (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .filter(F.col("tok").isin(_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"), F.first("dl").cast("bigint").alias("dl"))
        .localCheckpoint(eager=False)  # consumed by cf + scoring
    )
    cf = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("cf"))
    per_term = (
        tf.join(F.broadcast(cf), "tok")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1
                    + F.col("tf").cast("double") * F.col("c_len")
                    / (F.lit(float(_MU)) * F.col("cf"))
                )
                + F.log(F.lit(float(_MU)) / (F.col("dl") + F.lit(float(_MU))))
            ).alias("s"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.round(F.sum("s"), 6).cast("double").alias("score"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TOP)
    )


# The agreement panel below REUSES the two rankers' registered oracle
# texts verbatim (single source of truth: a tuning change to either
# ranker cannot desynchronize this panel's oracle).
from ..registry import _REGISTRY as _REG  # noqa: E402

_BM25_ORACLE = _REG["search_bm25"].oracle
_QL_ORACLE = _REG["search_query_likelihood_dirichlet"].oracle


@register(
    "search_bm25_vs_ql_overlap",
    tags=("text", "search"),
    oracle=f"""
    WITH bm AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rn
      FROM ({_BM25_ORACLE}) b
    ),
    qlr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rn
      FROM ({_QL_ORACLE}) q
    ),
    j AS (
      SELECT bm.doc_id, bm.rn AS rn_bm, qlr.rn AS rn_ql
      FROM bm JOIN qlr ON bm.doc_id = qlr.doc_id
    ),
    u AS (
      SELECT CAST(count(*) AS BIGINT) AS n_union
      FROM (SELECT doc_id FROM bm UNION SELECT doc_id FROM qlr)
    )
    SELECT CAST(count(j.doc_id) AS BIGINT) AS n_common,
           round(CAST(count(j.doc_id) AS DOUBLE) / nullif(u.n_union, 0), 6)
             AS jaccard,
           CAST(coalesce(sum(abs(j.rn_bm - j.rn_ql)), 0) AS BIGINT)
             AS footrule_common,
           CAST(coalesce(max(CASE WHEN j.rn_bm = 1 AND j.rn_ql = 1
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS top1_same
    FROM u LEFT JOIN j ON TRUE
    GROUP BY u.n_union
    """,
)
def search_bm25_vs_ql_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranker-agreement panel between the two lexical rankers this engine
    ships (Lucene-parity BM25 and Dirichlet query likelihood) on their
    shared query: top-{_TOP} overlap count, Jaccard of the two lists,
    Spearman's footrule distance on the common documents, and whether
    they crown the same #1. The eval every ranking migration reads
    before swapping similarities in the search sink: high Jaccard +
    small footrule means the swap is cosmetic; a top1 flip on a large
    overlap means the head is contested exactly where users look. Both
    rankings re-derive from the rankers' OWN registered definitions
    (shared SQL text), so this panel can never drift from them.

    Exactness: both input rankings are already deterministic
    (round-then-order at 6dp, doc_id tiebreak); ranks, the footrule sum,
    and the overlap are exact integers; one Jaccard division at 6dp.
    The constant-relation LEFT JOIN keeps the panel total (one row even
    on a zero-overlap corpus -- the alpha-DCG totality contract).

    Scale: two postings-bounded ranking plans (each documented at its
    own key) producing {_TOP}-row lists; everything here joins and folds
    {_TOP}-row relations."""
    bm = search_bm25(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("bigint")
        .alias("rn_bm"),
    )
    ql = search_query_likelihood_dirichlet(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("bigint")
        .alias("rn_ql"),
    )
    j = bm.join(ql, "doc_id").localCheckpoint(eager=False)
    u = bm.select("doc_id").union(ql.select("doc_id")).distinct().agg(
        F.count("*").cast("bigint").alias("n_union")
    )
    agg = j.agg(
        F.count("*").cast("bigint").alias("n_common"),
        F.coalesce(F.sum(F.abs(F.col("rn_bm") - F.col("rn_ql"))), F.lit(0))
        .cast("bigint")
        .alias("footrule_common"),
        F.coalesce(
            F.max(
                F.when((F.col("rn_bm") == 1) & (F.col("rn_ql") == 1), 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("top1_same"),
    )
    return u.join(agg, F.lit(True), "left").select(
        "n_common",
        F.round(
            F.col("n_common").cast("double") / F.nullif(F.col("n_union"), F.lit(0)),
            6,
        ).alias("jaccard"),
        "footrule_common",
        "top1_same",
    )
