"""Text analysis operators (SURVEY.md §2.2 X20 + north star): term
frequencies, corpus stats, heuristic language-ID, quality scoring, token
counting, and document fingerprinting -- all JVM-side built-ins (split /
explode / regexp / aggregate); no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..registry import register
from .dedup import TOKENS

# Tiny per-language stopword lists for the n-gram/stopword lang-ID
# heuristic. Deliberately literal (shared verbatim by the SQL oracle):
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "ein"],
    "fr": ["le", "la", "et", "un"],
}


def _tokens() -> Column:
    return F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")


@register(
    "text_tokenize_tf",
    tags=("text", "northstar"),
    oracle="""
    SELECT term, CAST(tf AS BIGINT) AS tf
    FROM (
      SELECT u.term AS term, count(*) AS tf
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents) u
      WHERE u.term <> ''
      GROUP BY u.term
    )
    ORDER BY tf DESC, term
    LIMIT 20
    """,
)
def text_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies, top-20. explode -> partial-aggregated count
    -> TakeOrderedAndProject; the shuffle carries (term, partial_count),
    not token instances."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(20)
    )


@register(
    "text_lang_counts",
    tags=("text", "northstar"),
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language: doc and character counts per lang
    label -- one |langs|-state partial aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@register(
    "text_len_stats",
    tags=("text", "northstar"),
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(length(text)) AS INT) AS min_len,
           CAST(max(length(text)) AS INT) AS max_len,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_len,
           CAST(min(length(string_split(text, ' '))) AS INT) AS min_tokens,
           CAST(max(length(string_split(text, ' '))) AS INT) AS max_tokens
    FROM documents
    GROUP BY source
    """,
)
def text_len_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length profile (docs, token/char means and extremes):
    the first-look corpus audit, one partial aggregate."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
        (F.sum(F.length("text")).cast("double") / F.count("*")).alias("avg_len"),
        F.min(ntok).alias("min_tokens"),
        F.max(ntok).alias("max_tokens"),
    )


def _marker_hits(lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(_tokens()), markers))


def _oracle_hits(lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_intersect(list_distinct(list_filter(string_split(lower(text), ' '),"
        f" x -> x <> '')), [{lits}]))"
    )


@register(
    "text_lang_id",
    tags=("text", "northstar"),
    oracle=f"""
    SELECT doc_id,
           CAST({_oracle_hits('en')} AS INT) AS en_hits,
           CAST({_oracle_hits('de')} AS INT) AS de_hits,
           CAST({_oracle_hits('fr')} AS INT) AS fr_hits,
           CASE
             WHEN {_oracle_hits('en')} >= {_oracle_hits('de')}
              AND {_oracle_hits('en')} >= {_oracle_hits('fr')} THEN 'en'
             WHEN {_oracle_hits('de')} >= {_oracle_hits('fr')} THEN 'de'
             ELSE 'fr'
           END AS pred_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (the classic n-gram heuristic reduced to
    distinct-token ∩ marker-list): per-language hit counts + argmax with a
    fixed tie order. Set-intersection of token arrays -- one pass, no
    explode."""
    d = load_table(spark, sf_dir, "documents")
    en, de, fr = (_marker_hits(lang) for lang in ("en", "de", "fr"))
    pred = (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )
    return d.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        pred.alias("pred_lang"),
    )


@register(
    "text_quality_score",
    tags=("text", "northstar"),
    oracle="""
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS INT) AS n_tokens,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / length(string_split(text, ' ')), 6) AS mean_token_len,
           round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
                 / length(text), 6) AS space_ratio,
           round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS digit_ratio,
           round(
             0.4 * least(CAST(length(string_split(text, ' ')) AS DOUBLE) / 50, 1.0)
             + 0.4 * (1 - abs(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                              / length(string_split(text, ' ')) - 5) / 5)
             + 0.2 * (1 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                          / length(text)),
             6) AS quality_score
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count, mean token length, space &
    digit ratios, combined into a bounded score (the length/punct/stopword
    family of pre-training corpus filters). Pure column arithmetic."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens = F.size(F.split(F.col("text"), " "))
    no_space = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    mean_tok = no_space.cast("double") / n_tokens
    space_ratio = (F.length("text") - no_space).cast("double") / F.length("text")
    digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    digit_ratio = digits.cast("double") / F.length("text")
    score = (
        0.4 * F.least(n_tokens.cast("double") / 50, F.lit(1.0))
        + 0.4 * (1 - F.abs(mean_tok - 5) / 5)
        + 0.2 * (1 - digit_ratio)
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(space_ratio, 6).alias("space_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


@register(
    "text_token_count",
    tags=("text", "northstar"),
    oracle="""
    SELECT doc_id,
           CAST(length(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
           CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT)
             AS bpe_ish_tokens
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs | digit runs | single punctuation) -- the cheap
    pre-tokenizer used to budget LLM token counts at corpus scale."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).alias(
            "bpe_ish_tokens"
        ),
    )


@register(
    "text_fuzzy_levenshtein",
    tags=("text", "northstar"),
    oracle="""
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
)
def text_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical part names within the same
    brand (edit distance <= 6). The brand equi-key is the blocking
    structure -- Levenshtein is O(len²) per pair, so at scale the join key
    must bound the candidate set before the distance ever runs.

    r14: the probe side is spread() first -- the part table is one file
    split, so the broadcast join's streamed side (where every within-
    brand pair's Levenshtein runs) executed on ONE task: 16 s wall at
    15.5 executor-CPU-s, i.e. serial. One cheap repartition of the
    20k-row dim buys all cores for the O(pairs x len²) distance work."""
    p = load_table(spark, sf_dir, "part")
    a, b = spread(p).alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand")) & (F.col("a.p_partkey") < F.col("b.p_partkey")))
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") <= 6)
        .select(
            F.col("a.p_partkey").alias("partkey_a"),
            F.col("b.p_partkey").alias("partkey_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "edit_dist",
        )
    )


@register(
    "text_fingerprint",
    tags=("text", "northstar"),
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
                          list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * CAST(31 AS BIGINT) + c) % CAST(1000000007 AS BIGINT)
           ) AS fingerprint
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over characters
    (h = (h*31 + ascii) mod 1e9+7, seed 7): an order-sensitive content
    digest cheap enough to compute at corpus scale and identical across
    engines (unlike xxhash). Left-fold via ``aggregate`` -- sequential
    within a row, embarrassingly parallel across rows."""
    d = spread(load_table(spark, sf_dir, "documents").filter(F.length("text") > 0))
    fp = F.expr(
        "aggregate(transform(split(text, ''), c -> ascii(c)), 7L,"
        " (acc, c) -> (acc * 31 + c) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "pack_token_budget",
    tags=("text", "northstar"),
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(length(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                       - n_tokens) / 2048.0) AS BIGINT) AS pack_id
    FROM t
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed token-budget packs (2048
    here) by contiguous fill -- the operator that turns a dedup'd corpus
    into training batches. pack = floor(preceding-cumulative-tokens /
    budget), a pure window over (lang, doc_id): deterministic, one shuffle
    on the partition key, parallel across strata. At 100 TB you'd partition
    by (lang, shard) so no single window partition exceeds an executor."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens = F.size(F.split(F.trim(F.col("text")), " ")).cast("long")
    t = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(2048.0)).alias("pack_id"),
    )


@register(
    "text_tfidf",
    tags=("text", "northstar"),
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tf, tfidf, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document. Corpus size N comes from a 1-row
    aggregate cross-joined in (broadcast, never a driver collect); document
    frequencies derive FROM the tf relation (one row per (doc, term)
    already), so the corpus is exploded exactly once. Ranking uses
    the ROUNDED score (ln differs in the last ulp across libms -- ranking
    raw doubles could flip near-ties between engines) with the term as the
    deterministic tiebreaker."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("term"))
    # materialize-once: tf feeds the df aggregation AND the scoring join;
    # unpersisted, the df branch re-tokenizes the corpus.
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # df(term) = rows per term in tf (tf is already one row per (doc, term)):
    # no second explode over the corpus, no count_distinct shuffle
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@register(
    "text_zipf_fit",
    tags=("text", "northstar", "agg"),
    oracle=f"""
    WITH tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({TOKENS}) AS tok FROM documents) t
      GROUP BY tok
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk
      FROM tf
    ),
    pts AS (
      SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE rnk <= 100
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(20,15))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(20,15))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(20,15))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(20,15))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
             AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus frequency spectrum: OLS slope of
    log(freq) against log(rank) for the top-100 tokens. Natural text sits
    near slope -1; generated/templated corpora drift -- a one-number
    corpus-health probe (same closed-form-from-exact-sums discipline as
    trend_linear_fit, with each log point snapped to DECIMAL(20,15) so
    the five sums are order-independent).

    Scale: token counts partial-agg map-side (|vocab| states); the top-100
    rank is a WindowGroupLimit-able sort over the vocabulary table, and
    the regression reduces 100 rows. Corpus bytes never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), "tok")
    pts = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    s = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(20,15)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,15)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(20,15)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(20,15)")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "text_vocab_coverage",
    tags=("text", "northstar", "agg"),
    oracle=f"""
    WITH tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({TOKENS}) AS tok FROM documents) t
      GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS total FROM tf),
    ranked AS (
      SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rnk
      FROM tf
    )
    SELECT CAST(rnk AS INT) AS rnk, tok, c AS freq,
           round(CAST(sum(c) OVER (ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(tot.total AS DOUBLE), 6) AS cum_coverage
    FROM ranked CROSS JOIN tot
    WHERE rnk <= 50
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens the
    top-N vocabulary entries cover (the tokenizer-budget question -- "how
    big must the vocab be to cover 95%?"). Cumulative share over the
    rank-ordered frequency table, exact BIGINT sums, one double division
    per row.

    Scale: same |vocab|-bounded shape as text_zipf_fit; the cumulative
    window runs over the top-50 rows only, and the corpus-total is a
    broadcast scalar."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), "tok")
    ranked = tf.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 50)
    total = tf.agg(F.sum("c").alias("total"))
    cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "tok",
            F.col("c").cast("bigint").alias("freq"),
            F.round(
                F.sum("c").over(cum).cast("double") / F.col("total").cast("double"), 6
            ).alias("cum_coverage"),
        )
    )


@register(
    "text_bigram_pmi_topk",
    tags=("text", "northstar", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    bigrams AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM toks, LATERAL unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ),
    bg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
      FROM bigrams GROUP BY 1, 2
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({TOKENS}) AS tok FROM documents) t GROUP BY tok
    ),
    n_bg AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM bg)
    SELECT w1, w2, c_xy,
           round(ln(CAST(c_xy AS DOUBLE) * CAST(n_bg.n AS DOUBLE)
                    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
    FROM bg
    JOIN uni u1 ON bg.w1 = u1.tok
    JOIN uni u2 ON bg.w2 = u2.tok
    CROSS JOIN n_bg
    WHERE c_xy >= 50
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def text_bigram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the 20 highest-PMI bigrams with support >= 50 --
    pointwise mutual information log(P(xy) / (P(x)P(y))) flags token
    pairs that co-occur far more than chance (multi-word expressions,
    templated boilerplate). A curation pipeline uses exactly this to
    spot machine-generated patterns.

    Determinism: all counts exact BIGINT; PMI is one identical double
    expression; (pmi, w1, w2) totally orders the top-k. Scale: bigram and
    unigram tables are vocabulary-bounded partial aggs; the unigram joins
    broadcast (|vocab| entries); the final is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents").select(_tokens().alias("toks"))
    bigrams = (
        d.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(toks) - 2),"
                       " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    # materialize-once: bg is vocabulary-bounded (tiny) but its lineage is a
    # full corpus pass; the grand total and the final scoring both consume it.
    bg = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    uni = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n_bg = bg.agg(F.sum("c_xy").cast("bigint").alias("n"))
    u1 = uni.select(F.col("tok").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("t2"), F.col("c").alias("c2"))
    pmi = F.log(
        F.col("c_xy").cast("double")
        * F.col("n").cast("double")
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    return (
        bg.filter(F.col("c_xy") >= 50)
        .join(F.broadcast(u1), F.col("w1") == F.col("t1"))
        .join(F.broadcast(u2), F.col("w2") == F.col("t2"))
        .crossJoin(F.broadcast(n_bg))
        .select("w1", "w2", "c_xy", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "docs_length_percentiles_by_lang",
    tags=("text", "quality", "agg"),
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(quantile_cont(n_chars, 0.10), 6) AS DOUBLE) AS p10_chars,
           CAST(round(quantile_cont(n_chars, 0.50), 6) AS DOUBLE) AS p50_chars,
           CAST(round(quantile_cont(n_chars, 0.90), 6) AS DOUBLE) AS p90_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def docs_length_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution (p10/p50/p90/min/max of
    chars) -- the cutoff-picking table for language-aware length filters
    (a p10 cut in one language is a p50 cut in another; curation must
    threshold per stratum).

    Exact interpolated percentiles (percentile <-> quantile_cont, same
    definition both engines) over integer chars. One partial-agg shuffle
    of |langs| percentile states."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.10)"), 6).cast("double").alias("p10_chars"),
        F.round(F.expr("percentile(n_chars, 0.50)"), 6).cast("double").alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.90)"), 6).cast("double").alias("p90_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "docs_unique_token_growth",
    tags=("text", "northstar", "agg"),
    oracle=f"""
    WITH firsts AS (
      SELECT tok, min(CAST(doc_id // 100 AS BIGINT)) AS first_bucket
      FROM (SELECT doc_id, unnest({TOKENS}) AS tok FROM documents) t
      GROUP BY tok
    ),
    per_bucket AS (
      SELECT first_bucket, CAST(count(*) AS BIGINT) AS new_types
      FROM firsts GROUP BY first_bucket
    )
    SELECT first_bucket AS bucket,
           new_types,
           CAST(sum(new_types) OVER (ORDER BY first_bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_size
    FROM per_bucket
    """,
)
def docs_unique_token_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct-token count at
    every 100-document checkpoint (by doc_id order) -- the companion of
    text_zipf_fit, and the curve that says whether a corpus keeps paying
    vocabulary for more data or has gone repetitive.

    The cumulative distinct is computed EXACTLY without re-scanning per
    checkpoint: each token contributes once at its first-seen bucket
    (min over an integer), new-type counts partial-agg per bucket, and a
    prefix sum over the handful of buckets yields the curve. Scale: two
    vocabulary-bounded aggs; corpus bytes shuffle never."""
    d = load_table(spark, sf_dir, "documents")
    firsts = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.min(F.floor(F.col("doc_id") / 100)).cast("bigint").alias("first_bucket"))
    )
    per_bucket = firsts.groupBy("first_bucket").agg(
        F.count("*").cast("bigint").alias("new_types")
    )
    w = Window.orderBy("first_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        F.col("first_bucket").alias("bucket"),
        "new_types",
        F.sum("new_types").over(w).cast("bigint").alias("vocab_size"),
    )


@register(
    "text_doc_ttr_hapax",
    tags=("text", "quality"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    cnt AS (
      SELECT doc_id, tok, count(*) AS n
      FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS ttr,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_ratio
    FROM cnt GROUP BY doc_id
    """,
)
def text_doc_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-diversity profile: type-token ratio and the
    within-document hapax share (types occurring exactly once) -- the
    classic diversity pair used to flag template/boilerplate text (low
    TTR) and incoherent scrape noise (very high hapax share), sitting
    between text_repetition (n-gram grain) and text_zipf_fit (corpus
    grain).

    Scale: explode -> (doc, token) partial counts -> per-doc fold; the
    shuffle carries one row per distinct (doc, token), never raw text
    positions, and the second agg reuses the doc_id partitioning."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
    )
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return cnt.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.round(F.count("*").cast("double") / F.sum("n"), 6).alias("ttr"),
        hapax.cast("bigint").alias("n_hapax"),
        F.round(hapax.cast("double") / F.count("*"), 6).alias("hapax_ratio"),
    )


@register(
    "docs_bigram_novelty",
    tags=("text", "curation"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1]))) AS bigram
      FROM toks WHERE len(toks) >= 2
    ),
    first_seen AS (
      SELECT bigram, min(doc_id) AS first_doc FROM bg GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty
    FROM bg b JOIN first_seen f ON b.bigram = f.bigram
    GROUP BY b.doc_id
    """,
)
def docs_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve at bigram grain: for each document (in doc_id
    ingestion order), the share of its distinct bigrams never seen in any
    earlier document -- the diminishing-returns signal dataset curators
    read before adding more of a source (docs_unique_token_growth is the
    corpus-level cumulative twin; this is per-document and join-shaped).

    Scale: distinct bigrams explode map-side (JVM array ops); first-seen
    is a bigram-keyed partial min; the join back is bigram-keyed
    equi-join -- counts and keys shuffle, text bodies never do (at 100 TB
    the join key becomes xxhash64(bigram), the digest-not-body rule)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks")).filter(F.size("toks") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i], toks[i+1]))"
                )
            )
        ).alias("bigram"),
    )
    first_seen = bg.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
    return (
        bg.join(first_seen, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            novel.cast("bigint").alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
        )
    )


@register(
    "text_langid_confusion",
    tags=("text", "monitor"),
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE
               WHEN {_oracle_hits('en')} >= {_oracle_hits('de')}
                AND {_oracle_hits('en')} >= {_oracle_hits('fr')} THEN 'en'
               WHEN {_oracle_hits('de')} >= {_oracle_hits('fr')} THEN 'de'
               ELSE 'fr'
             END AS pred_lang
      FROM documents
    ),
    m AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM m GROUP BY 1)
    SELECT m.lang, m.pred_lang, m.n,
           CAST(round(CAST(m.n AS DOUBLE) / tot.n_lang, 6) AS DOUBLE) AS share
    FROM m JOIN tot ON m.lang = tot.lang
    ORDER BY m.lang, m.pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-marker language-ID heuristic
    against the ground-truth label: per (true, predicted) pair, the count
    and the within-language share (rows for one true language sum to 1,
    so the diagonal IS per-language recall). The evaluation every
    classifier-shaped curation gate needs before its output drives
    sampling -- and it shows exactly where a 3-language heuristic sends
    the languages it cannot name (es/zh docs land on whichever marker set
    fires most).

    Scale: prediction is the same zero-shuffle set-intersection pass as
    text_lang_id; the matrix is one |langs x preds|-state partial agg and
    the per-language totals re-aggregate THAT relation (broadcast join
    back). Nothing fact-sized moves twice."""
    d = load_table(spark, sf_dir, "documents")
    en, de, fr = (_marker_hits(lang) for lang in ("en", "de", "fr"))
    pred = (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )
    m = d.select("lang", pred.alias("pred_lang")).groupBy("lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = m.groupBy("lang").agg(F.sum("n").cast("bigint").alias("n_lang"))
    return (
        m.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_lang"), 6)
            .cast("double")
            .alias("share"),
        )
        .orderBy("lang", "pred_lang")
    )


@register(
    "docs_source_length_profile",
    tags=("text", "agg"),
    oracle="""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) / count(*), 4)
             AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS short_share
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def docs_source_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source x language document-length profile (count, mean, min/max
    chars, share under 100 chars) -- the curation pre-flight that decides
    which crawl sources need a length floor before they enter the training
    mix. Complements ``docs_lang_source_mix`` (counts only) with the length
    dimensions; all aggregates are exact integers until the final ratios.

    Scale: pure metadata scan (text column pruned away) + ONE
    |sources x langs|-state partial agg."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang", "n_chars")
    short = F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("n_chars").cast("bigint")).cast("double") / F.count("*"), 4
            ).alias("avg_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.round(short.cast("double") / F.count("*"), 6).alias("short_share"),
        )
        .orderBy("source", "lang")
    )


@register(
    "docs_language_mix_drift",
    tags=("text", "agg"),
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_src FROM c GROUP BY 1),
    corp AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
    terms AS (
      SELECT c.source, s.n_src,
             CAST(round((CAST(c.n AS DOUBLE) / s.n_src)
                        * ln(CAST(c.n AS DOUBLE) * t.n_total
                             / (CAST(s.n_src AS DOUBLE) * l.n_lang)), 6)
                  AS DECIMAL(18,6)) AS term
      FROM c
      JOIN src s ON c.source = s.source
      JOIN corp l ON c.lang = l.lang
      CROSS JOIN tot t
    )
    SELECT source,
           CAST(min(n_src) AS BIGINT) AS n_docs,
           round(CAST(sum(term) AS DOUBLE), 6) AS kl_vs_corpus
    FROM terms GROUP BY 1 ORDER BY 1
    """,
)
def docs_language_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix drift per source: KL divergence of each source's
    language distribution from the corpus-wide mix -- the curation monitor
    that catches a crawl feed silently going monolingual before it skews
    the training mixture (compare ``docs_lang_source_mix``, which shows
    the raw table; this is the one-number-per-source alarm). All counts
    are exact; each p*ln(p/q) term is snapped to 6 dp DECIMAL before the
    per-source sum, so accumulation order cannot flip the hash.

    Scale: ONE |sources x langs|-state partial agg off the metadata scan
    -- the ONLY pass over the fact table. The marginals (per-source,
    per-lang, grand total) come from window sums over that tiny rollup
    rather than separate groupBys: three groupBys would each re-execute
    the rollup's lineage and re-scan the corpus (measured: 4 file scans
    planned that way); windows over the |sources x langs|-row relation
    cost nothing, including the single-partition global window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )  # drift is defined over LABELED docs; NULL labels would form their
    # own window partitions here but drop from the oracle's joins
    c = d.groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("n"))
    n_src = F.sum("n").over(Window.partitionBy("source")).cast("bigint")
    n_lang = F.sum("n").over(Window.partitionBy("lang")).cast("bigint")
    n_total = F.sum("n").over(Window.partitionBy()).cast("bigint")
    c = c.select(
        "source",
        "n",
        n_src.alias("n_src"),
        n_lang.alias("n_lang"),
        n_total.alias("n_total"),
    )
    term = F.round(
        (F.col("n").cast("double") / F.col("n_src"))
        * F.log(
            F.col("n").cast("double")
            * F.col("n_total")
            / (F.col("n_src").cast("double") * F.col("n_lang"))
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        c.select("source", "n_src", term.alias("term"))
        .groupBy("source")
        .agg(
            F.min("n_src").cast("bigint").alias("n_docs"),
            F.round(F.sum("term").cast("double"), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


@register(
    "text_charset_profile",
    tags=("text", "quality", "agg"),
    oracle="""
    WITH m AS (
      SELECT lang,
             CAST(length(text) AS BIGINT) AS n,
             CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS BIGINT)
               AS n_ascii,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digit
      FROM documents WHERE length(text) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(n_ascii) AS DOUBLE) / sum(n), 6) AS ascii_ratio,
           round(CAST(sum(n_digit) AS DOUBLE) / sum(n), 6) AS digit_ratio,
           CAST(sum(CASE WHEN n_ascii < n THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_non_ascii
    FROM m GROUP BY 1 ORDER BY 1
    """,
)
def text_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-set profile per language label: printable-ASCII and digit
    ratios plus how many docs contain ANY non-ASCII -- the encoding sanity
    check that catches mojibake, a mislabeled zh feed, or a crawler that
    started double-encoding UTF-8. The '[^ -~]' printable-ASCII class is
    the same RE2-compatible pattern on both engines; all counts are exact
    integers.

    Scale: map-side regexp projections + ONE |langs|-state partial agg."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.length("text").cast("bigint")
    n_ascii = F.length(F.regexp_replace("text", "[^ -~]", "")).cast("bigint")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("bigint")
    m = d.select("lang", n.alias("n"), n_ascii.alias("n_ascii"), n_digit.alias("n_digit"))
    return (
        m.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("n_ascii").cast("double") / F.sum("n"), 6).alias(
                "ascii_ratio"
            ),
            F.round(F.sum("n_digit").cast("double") / F.sum("n"), 6).alias(
                "digit_ratio"
            ),
            F.sum(F.when(F.col("n_ascii") < F.col("n"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_non_ascii"),
        )
        .orderBy("lang")
    )


@register(
    "text_code_prose_profile",
    tags=("text", "quality", "northstar"),
    oracle=r"""
    WITH doc AS (
      SELECT source,
             round(CAST(len(list_filter(str_split(text, chr(10)), l -> regexp_matches(l, '[;{}]\s*$|^\s{4,}\S|\b(def|class|import|function|var|return)\b'))) AS DOUBLE)
                   / nullif(CAST(len(str_split(text, chr(10))) AS DOUBLE), 0.0), 6) AS code_ratio,
             round(CAST(length(text) - length(regexp_replace(text, '[{}();=<>\[\]]', '', 'g')) AS DOUBLE)
                   / nullif(CAST(length(text) AS DOUBLE), 0.0), 6) AS sym_density
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(avg(CAST(code_ratio AS DECIMAL(18,6))) AS DOUBLE), 6) AS avg_code_line_ratio,
           round(CAST(avg(CAST(sym_density AS DECIMAL(18,6))) AS DOUBLE), 6) AS avg_symbol_density,
           CAST(sum(CASE WHEN code_ratio > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_code_like
    FROM doc GROUP BY source
    """,
)
def text_code_prose_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose composition per source -- the curation split every
    LLM data pipeline needs before mixing (code wants different dedup
    grains, quality rules, and sampling temperature than prose). Two
    heuristic signals, both language-agnostic and regex-only: the share
    of LINES that look like code (trailing ';'/'{'/'}', >=4-space indent,
    or a keyword from the def/class/import/function/var/return set) and
    the density of code punctuation among all characters. A doc whose
    code-line ratio clears 0.3 counts as code-like.

    The fixture corpus is synthetic prose, so all rates are legitimately
    0 here; the pytest gate plants real code documents beside prose in a
    scratch corpus and pins that they (and only they) are flagged.

    Scale: pure map-side regexp work per document (no tokenize shuffle),
    then ONE |sources|-state partial agg. NULL-safe on empty docs via
    nullif denominators."""
    d = load_table(spark, sf_dir, "documents")
    code_line = "[;{}]\\s*$|^\\s{4,}\\S|\\b(def|class|import|function|var|return)\\b"
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    code_lines = F.size(F.filter(lines, lambda l: l.rlike(code_line)))
    n_chars = F.length("text")
    sym = n_chars - F.length(F.regexp_replace(F.col("text"), "[{}();=<>\\[\\]]", ""))
    doc = d.select(
        "source",
        F.round(
            code_lines.cast("double") / F.nullif(n_lines.cast("double"), F.lit(0.0)), 6
        ).alias("code_ratio"),
        F.round(
            sym.cast("double") / F.nullif(n_chars.cast("double"), F.lit(0.0)), 6
        ).alias("sym_density"),
    )
    return doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(
            F.avg(F.col("code_ratio").cast("decimal(18,6)")).cast("double"), 6
        ).alias("avg_code_line_ratio"),
        F.round(
            F.avg(F.col("sym_density").cast("decimal(18,6)")).cast("double"), 6
        ).alias("avg_symbol_density"),
        F.sum(F.when(F.col("code_ratio") > 0.3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_code_like"),
    )


@register(
    "text_tokenizer_fertility",
    tags=("text", "northstar", "agg"),
    oracle="""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_split_to_array(trim(text), ' ')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT) AS toks,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents WHERE length(text) > 0 AND lang IS NOT NULL
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS words,
           CAST(sum(toks) AS BIGINT) AS tokens,
           round(CAST(sum(toks) AS DOUBLE) / nullif(sum(words), 0), 6)
             AS fertility,
           round(CAST(sum(chars) AS DOUBLE) / nullif(sum(toks), 0), 6)
             AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish tokens per whitespace
    word and characters per token -- the standard multilingual budgeting
    table (a language with fertility 2.3 costs 2.3x the context window
    per word; chars-per-token says how far a byte budget stretches).
    text_token_count gives the per-doc counts; this is the per-language
    planning rollup a mixture design actually consumes
    (sample_token_mixture's weights assume it).

    Exactness: token and word counts are integer sums (corpus-exact);
    the two ratios are single divisions at 6 dp with nullif guards.

    Scale: one pass over documents with per-doc regexp counting (JVM
    regexp_extract_all, no Python), partial-agg to the |langs| grain."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & F.col("lang").isNotNull()
    )
    t = d.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("words"),
        F.size(
            F.expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")
        ).cast("bigint").alias("toks"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("toks").cast("bigint").alias("tokens"),
        F.round(
            F.sum("toks").cast("double") / F.nullif(F.sum("words"), F.lit(0)), 6
        ).alias("fertility"),
        F.round(
            F.sum("chars").cast("double") / F.nullif(F.sum("toks"), F.lit(0)), 6
        ).alias("chars_per_token"),
    )


@register(
    "text_term_burstiness",
    tags=("text", "northstar"),
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest({TOKENS}) AS term FROM documents)
      GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    agg AS (
      SELECT term,
             CAST(sum(tf) AS BIGINT) AS cf,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(CAST(tf AS DECIMAL(38,0)) * tf) AS BIGINT) AS cf2
      FROM tf GROUP BY 1 HAVING count(*) >= 5
    )
    SELECT term, cf, df,
           round(CAST(cf AS DOUBLE) / df, 6) AS burstiness,
           round((CAST(cf2 AS DOUBLE) / nd.n_docs
                  - (CAST(cf AS DOUBLE) / nd.n_docs)
                    * (CAST(cf AS DOUBLE) / nd.n_docs))
                 / (CAST(cf AS DOUBLE) / nd.n_docs), 6) AS vmr
    FROM agg CROSS JOIN nd
    ORDER BY burstiness DESC, term
    LIMIT 30
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness: mean within-document frequency E[tf | tf > 0]
    = cf/df (Church & Gale 1995 -- content words repeat within the
    documents that use them; function words spread evenly) plus the
    variance-to-mean ratio of tf over ALL documents (zeros included;
    VMR = 1 is Poisson, >> 1 is bursty). Top 30 bursty terms at df >= 5.
    The term-level lens the doc-level events_burstiness (Fano factor
    over time) and text_zipf_fit (rank law) don't give: it separates
    topical vocabulary from glue vocabulary, the feature behind
    stopword induction and keyword extraction.

    Exactness: cf, df, sum(tf^2) are exact integers (tf^2 accumulates
    through DECIMAL(38,0)); burstiness and VMR are closed forms over
    those integers -- identical doubles both engines, rounded 6dp;
    deterministic (burstiness desc, term) cutoff.

    Scale: one (doc, term)-grain partial agg over the exploded corpus
    (map-side combine eats the token stream), one term-grain agg, a
    1-row n_docs broadcast, TakeOrderedAndProject for the top-30."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    agg = (
        tf.groupBy("term")
        .agg(
            F.sum("tf").cast("bigint").alias("cf"),
            F.count("*").cast("bigint").alias("df"),
            F.sum(F.col("tf").cast("decimal(38,0)") * F.col("tf"))
            .cast("bigint").alias("cf2"),
        )
        .filter(F.col("df") >= 5)
    )
    cfd = F.col("cf").cast("double")
    mean = cfd / F.col("n_docs")
    return (
        agg.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "cf",
            "df",
            F.round(cfd / F.col("df"), 6).alias("burstiness"),
            F.round(
                (F.col("cf2").cast("double") / F.col("n_docs") - mean * mean)
                / mean,
                6,
            ).alias("vmr"),
        )
        .orderBy(F.col("burstiness").desc(), "term")
        .limit(30)
    )


@register(
    "docs_distinctive_terms_by_source",
    tags=("text", "northstar"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    st AS (SELECT source, CAST(sum(tf) AS BIGINT) AS ts FROM tf GROUP BY 1),
    ct AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ct FROM tf GROUP BY 1),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS tt FROM tf),
    scored AS (
      SELECT tf.source, tf.term, tf.tf,
             round(ln((CAST(tf.tf AS DOUBLE) + 1) / (st.ts + 1))
                   - ln((CAST(ct.ct - tf.tf AS DOUBLE) + 1)
                        / (tot.tt - st.ts + 1)), 6) AS score
      FROM tf
      JOIN st ON tf.source = st.source
      JOIN ct ON tf.term = ct.term
      CROSS JOIN tot
      WHERE tf.tf >= 5
    )
    SELECT source, term, tf, score
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 5
    ORDER BY source, score DESC, term
    """,
)
def docs_distinctive_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source: the 5 terms whose add-one-
    smoothed log-odds ratio between in-source share and rest-of-corpus
    share is highest (tf >= 5) -- the "significant terms" panel behind
    every corpus-drilldown UI (Elasticsearch significant_terms
    aggregations solve exactly this contrast; the smoothed log-ratio is
    its JLH/mutual-information cousin). Where text_term_burstiness
    separates topical from glue vocabulary globally, this names WHICH
    source each topic belongs to -- the first read when a new crawl
    source lands in the mix.

    Exactness: all shares are ratios of exact integer token counts with
    +1 smoothing; the score is one shared two-ln closed form rounded to
    6dp BEFORE the per-source top-5 cutoff (the search_prf_expansion
    lesson: round-then-rank, never rank raw floats), tie-broken by term.

    Scale: one (source, term)-grain partial agg over the exploded
    corpus; source totals and the term-total relation join back at
    vocabulary grain (term totals are a broadcast-sized relation only
    when vocab is small -- at 100 TB this join shuffles on term, the
    same key the tf agg just used, so it reuses the partitioning)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # st, ct, tot, scored all consume it
    )
    st = tf.groupBy("source").agg(F.sum("tf").cast("bigint").alias("ts"))
    ct = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("ct"))
    tot = tf.agg(F.sum("tf").cast("bigint").alias("tt"))
    scored = (
        tf.filter(F.col("tf") >= 5)
        .join(F.broadcast(st), "source")
        .join(ct, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "term",
            "tf",
            F.round(
                F.log((F.col("tf").cast("double") + 1) / (F.col("ts") + 1))
                - F.log(
                    ((F.col("ct") - F.col("tf")).cast("double") + 1)
                    / (F.col("tt") - F.col("ts") + 1)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "term", "tf", "score")
        .orderBy("source", F.col("score").desc(), "term")
    )


# RAKE stopword delimiters: the same deliberately-literal English marker
# set the lang-ID heuristic uses (shared verbatim by the SQL oracle).
_RAKE_STOPS = ("the", "a", "of", "and")


@register(
    "text_rake_keywords",
    tags=("text", "northstar"),
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
    pos AS (
      SELECT doc_id, toks, CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS p
      FROM toks
    ),
    t AS (
      SELECT doc_id, p, toks[p] AS term,
             CASE WHEN toks[p] IN ('the', 'a', 'of', 'and') THEN 1 ELSE 0 END
               AS is_stop
      FROM pos
    ),
    r AS (
      SELECT doc_id, p, term, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY p
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM t
    ),
    member AS (SELECT doc_id, run_id, p, term FROM r WHERE is_stop = 0),
    phrase AS (
      SELECT doc_id, run_id,
             array_to_string(list(term ORDER BY p), ' ') AS phrase,
             CAST(count(*) AS BIGINT) AS n_words
      FROM member GROUP BY 1, 2
    ),
    wstat AS (
      SELECT m.term, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(ph.n_words) AS BIGINT) AS deg
      FROM member m JOIN phrase ph USING (doc_id, run_id)
      GROUP BY m.term
    ),
    wscore AS (
      SELECT term, CAST((deg * 1000000) // freq AS BIGINT) AS s_u FROM wstat
    ),
    inst AS (
      SELECT m.doc_id, m.run_id, CAST(sum(w.s_u) AS BIGINT) AS score_u
      FROM member m JOIN wscore w USING (term) GROUP BY 1, 2
    ),
    fullp AS (
      SELECT ph.phrase, ph.n_words, i.score_u
      FROM phrase ph JOIN inst i USING (doc_id, run_id)
    ),
    grouped AS (
      SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(min(score_u) AS BIGINT) AS score_u
      FROM fullp GROUP BY phrase
    )
    SELECT phrase, n_words, n_occurrences,
           round(CAST(score_u AS DOUBLE) / 1000000, 6) AS rake_score
    FROM grouped
    WHERE n_words BETWEEN 1 AND 4 AND n_occurrences >= 2
    ORDER BY score_u DESC, phrase
    LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010):
    candidate phrases are maximal stopword-delimited token runs; each
    word scores deg(w)/freq(w) (degree = summed length of the phrases
    its occurrences sit in -- co-occurrence favors words that travel in
    long collocations); a phrase scores the sum of its member-word
    scores. Top-20 phrases of 1-4 words seen at least twice -- the
    unsupervised keyword surface on top of text_term_burstiness's
    word-level lens and text_bigram_pmi_topk's fixed-width collocations.

    Exactness: word scores are floor-scaled integer micro-units
    ((deg * 1e6) div freq -- positive operands, so Spark div == DuckDB
    //), phrase scores are exact integer sums of those units, and the
    top-20 cutoff orders by the INTEGER score with a phrase tiebreak;
    the single display division/round happens after the cutoff.

    Scale: the only fact-grain window is the per-document run-id prefix
    sum (partitioned by doc_id -- each doc's token stream is sequential
    by construction); phrases, word stats, and instance scores are all
    (doc, run)- or term-grain partial aggs; the phrase dictionary join
    is vocabulary-bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.posexplode(_tokens()).alias("p", "term"))
    is_stop = F.when(F.col("term").isin(*_RAKE_STOPS), 1).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = toks.select(
        "doc_id", "p", "term", is_stop.alias("is_stop"),
        F.sum(is_stop).over(w).alias("run_id"),
    )
    member = (
        r.filter(F.col("is_stop") == 0)
        .select("doc_id", "run_id", "p", "term")
        .localCheckpoint(eager=False)  # consumed by phrase, wstat, inst
    )
    phrase = (
        member.groupBy("doc_id", "run_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(p, term))),"
                " x -> x.term), ' ')"
            ).alias("phrase"),
            F.count("*").cast("bigint").alias("n_words"),
        )
        .localCheckpoint(eager=False)  # consumed by wstat and the final join
    )
    wstat = (
        member.join(phrase, ["doc_id", "run_id"])
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("n_words").cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select(
        "term", F.expr("(deg * 1000000L) div freq").cast("bigint").alias("s_u")
    )
    inst = (
        member.join(wscore, "term")
        .groupBy("doc_id", "run_id")
        .agg(F.sum("s_u").cast("bigint").alias("score_u"))
    )
    grouped = (
        phrase.join(inst, ["doc_id", "run_id"])
        .groupBy("phrase")
        .agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("score_u").cast("bigint").alias("score_u"),
        )
        .filter(F.col("n_words").between(1, 4) & (F.col("n_occurrences") >= 2))
    )
    return (
        grouped.orderBy(F.col("score_u").desc(), "phrase")
        .limit(20)
        .select(
            "phrase", "n_words", "n_occurrences",
            F.round(F.col("score_u").cast("double") / 1000000, 6).alias("rake_score"),
        )
    )


@register(
    "text_hapax_legomena_share",
    tags=("text", "northstar"),
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS cf
      FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(cf) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_vocab_share,
           round(CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(cf), 6) AS hapax_token_share
    FROM tf GROUP BY source ORDER BY source
    """,
)
def text_hapax_legomena_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per source: vocabulary size, once-occurring
    terms, and their share of vocabulary and of tokens. Under Zipf ~half
    a healthy natural-language vocabulary is hapax (Baayen's LNRE
    regime); a source whose hapax share COLLAPSES is template/boilerplate
    text (the dedup families will find it), and one whose hapax share
    approaches 1 is serial-number/OCR noise (text_garbage_token_panel's
    target) -- the two tails a corpus-health review reads first, next to
    text_zipf_fit's slope at the head.

    Exactness: the shared whitespace-lowercase tokenizer on both
    engines; counts are exact integers; two share divisions at 6dp.

    Scale: one explode + map-side-combinable (source, term) count --
    the text_tokenize_tf shuffle shape; the panel folds the term
    relation per source. No windows, no doc-grain joins."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("cf"))
    )
    hap = F.sum(F.when(F.col("cf") == 1, 1).otherwise(0)).cast("bigint")
    return (
        tf.groupBy("source")
        .agg(
            F.sum("cf").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocab_size"),
            hap.alias("n_hapax"),
            F.round(hap.cast("double") / F.count("*"), 6).alias("hapax_vocab_share"),
            F.round(hap.cast("double") / F.sum("cf"), 6).alias("hapax_token_share"),
        )
        .orderBy("source")
    )


@register(
    "text_garbage_token_panel",
    tags=("text", "quality"),
    oracle="""
    WITH m AS (
      SELECT source,
             length(text) AS len,
             length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_sym,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_dig,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upp
      FROM documents WHERE length(text) > 0
    ),
    per AS (
      SELECT source,
             CAST(floor(1e6 * CAST(n_sym AS DOUBLE) / len) AS BIGINT) AS sym_u,
             CAST(floor(1e6 * CAST(n_dig AS DOUBLE) / len) AS BIGINT) AS dig_u,
             CAST(floor(1e6 * CAST(n_upp AS DOUBLE) / len) AS BIGINT) AS upp_u
      FROM m
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(sym_u) AS DOUBLE) / count(*) / 1e6, 6)
             AS avg_symbol_share,
           round(CAST(sum(dig_u) AS DOUBLE) / count(*) / 1e6, 6)
             AS avg_digit_share,
           round(CAST(sum(upp_u) AS DOUBLE) / count(*) / 1e6, 6)
             AS avg_upper_share,
           CAST(sum(CASE WHEN sym_u > 100000 OR dig_u > 300000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           round(CAST(sum(CASE WHEN sym_u > 100000 OR dig_u > 300000
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS flagged_share
    FROM per GROUP BY source ORDER BY source
    """,
)
def text_garbage_token_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garbage-text detector panel (the OCR-noise / markup-residue
    heuristics of pre-training cleaning pipelines, C4/CCNet family):
    per-document symbol, digit, and uppercase character shares, rolled
    to source grain with a flag rate at the classic fences (>10%
    symbols or >30% digits). Complements quality_gopher_rules (word
    structure) and quality_ccnet_buckets (LM perplexity): character-class
    composition catches base64 blobs, hex dumps, and table debris that
    both of those pass.

    Exactness: char-class counts via identical regex character classes
    on both engines (ASCII classes -- locale-free); per-doc shares floor
    to integer MICRO-UNITS before the source sum (order-free), the
    micro-unit snap discipline; flags compare in integer space.

    Scale: pure per-row column arithmetic (no explode -- counts come
    from regexp_replace length deltas), one map-side-combinable source
    rollup. Docs never shuffle; only their per-class counts do."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ln = F.length("text")
    cls = lambda pat: F.length(F.regexp_replace("text", pat, ""))  # noqa: E731
    per = d.select(
        "source",
        F.floor(1e6 * cls("[A-Za-z0-9 ]").cast("double") / ln).cast("bigint").alias("sym_u"),
        F.floor(1e6 * cls("[^0-9]").cast("double") / ln).cast("bigint").alias("dig_u"),
        F.floor(1e6 * cls("[^A-Z]").cast("double") / ln).cast("bigint").alias("upp_u"),
    )
    flag = F.sum(
        F.when((F.col("sym_u") > 100000) | (F.col("dig_u") > 300000), 1).otherwise(0)
    ).cast("bigint")
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("sym_u").cast("double") / F.count("*") / 1e6, 6).alias(
                "avg_symbol_share"
            ),
            F.round(F.sum("dig_u").cast("double") / F.count("*") / 1e6, 6).alias(
                "avg_digit_share"
            ),
            F.round(F.sum("upp_u").cast("double") / F.count("*") / 1e6, 6).alias(
                "avg_upper_share"
            ),
            flag.alias("n_flagged"),
            F.round(flag.cast("double") / F.count("*"), 6).alias("flagged_share"),
        )
        .orderBy("source")
    )


@register(
    "docs_lang_confusion_matrix",
    tags=("text", "quality"),
    oracle=f"""
    WITH pred AS (
      SELECT lang AS declared,
             CASE
               WHEN {_oracle_hits('en')} >= {_oracle_hits('de')}
                AND {_oracle_hits('en')} >= {_oracle_hits('fr')} THEN 'en'
               WHEN {_oracle_hits('de')} >= {_oracle_hits('fr')} THEN 'de'
               ELSE 'fr'
             END AS detected
      FROM documents
    ),
    tot AS (
      SELECT declared, CAST(count(*) AS BIGINT) AS n_declared
      FROM pred GROUP BY 1
    )
    SELECT p.declared, p.detected,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(count(*) AS DOUBLE) / t.n_declared, 6) AS row_share
    FROM pred p JOIN tot t ON p.declared = t.declared
    GROUP BY p.declared, p.detected, t.n_declared
    ORDER BY p.declared, p.detected
    """,
)
def docs_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix: the text_lang_id
    marker heuristic re-run corpus-wide and cross-tabulated against the
    metadata ``lang`` column, with per-declared-language row shares. The
    LABEL-QUALITY audit of the curation pipeline: a 'de' row mostly
    detected as 'en' means either mislabeled ingestion (fix the source)
    or an under-trained detector (fix the markers) -- and languages the
    detector cannot emit (zh/es here) show exactly which rows fall
    through to the argmax default, the honest picture of a 3-class
    detector on a 5-language corpus. quality_language_purity audits
    marker MIXTURE per doc; this audits the LABELS.

    Exactness: the detector is the same deterministic
    set-intersection/argmax both engines run in text_lang_id; counts
    integer; one row-share division at 6dp.

    Scale: per-doc marker intersection is a map-side array op (no
    explode); the matrix is a map-side-combinable (declared, detected)
    agg with a broadcast row-total join -- at most |langs|^2 rows
    leave the executors."""
    d = load_table(spark, sf_dir, "documents")
    en, de, fr = (_marker_hits(lang) for lang in ("en", "de", "fr"))
    detected = (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )
    pred = d.select(F.col("lang").alias("declared"), detected.alias("detected"))
    tot = pred.groupBy("declared").agg(
        F.count("*").cast("bigint").alias("n_declared")
    )
    return (
        pred.groupBy("declared", "detected")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(F.broadcast(tot), "declared")
        .select(
            "declared",
            "detected",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n_declared"), 6).alias(
                "row_share"
            ),
        )
        .orderBy("declared", "detected")
    )


TEXTRANK_ITERS = 10
TEXTRANK_DAMPING = 0.85
TEXTRANK_MIN_DF = 3
TEXTRANK_TOP = 20


@register("text_textrank_keywords", tags=("text", "graph", "northstar"))
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph -- nodes are content terms (>= 4 chars,
    document frequency >= {TEXTRANK_MIN_DF}), undirected edges connect
    ADJACENT content terms with co-occurrence-count weights normalized
    per node, {TEXTRANK_ITERS} damped ({TEXTRANK_DAMPING}) synchronous
    power-iteration rounds, top-{TEXTRANK_TOP} terms out. The
    graph-centrality upgrade of text_rake_keywords (degree-flavored) and
    text_tfidf (frequency-flavored): TextRank promotes terms that
    co-occur with OTHER well-connected terms, the property neither
    frequency family sees.

    Rows-only by declared contract: the iterative fixed point has no
    bit-stable SQL twin at engine scale (the graph_pagerank precedent);
    closed-form gates in tests/test_round19_ops.py pin a planted-hub
    corpus (the hub term must rank first) and rank-mass sanity.

    Scale: the token stream reduces to a (src, dst) count-weighted edge
    relation bounded by |vocab|^2 locality (adjacent pairs only, df-cap
    pruning the tail); each round is one join + map-side-combinable agg
    on the edge relation, checkpointed every 3 rounds (the
    graph_pagerank loop contract). TakeOrderedAndProject emits the
    top-{TEXTRANK_TOP}."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.posexplode(_tokens()).alias("pos", "term")).filter(
        F.length("term") >= 4
    )
    df_ok = (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= TEXTRANK_MIN_DF)
        .select("term")
    )
    t = toks.join(F.broadcast(df_ok), "term").select("doc_id", "pos", "term")
    w = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        t.select("doc_id", "term", F.lag("term").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("term")))
        .select(F.col("prev").alias("a"), F.col("term").alias("b"))
    )
    und = adj.select("a", "b").unionAll(adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
    counts = und.groupBy(F.col("a").alias("src"), F.col("b").alias("dst")).agg(
        F.count("*").cast("double").alias("c")
    )
    edges = counts.withColumn(
        "p", F.col("c") / F.sum("c").over(Window.partitionBy("src"))
    ).select("src", "dst", "p").localCheckpoint()
    nodes = edges.select(F.col("src").alias("term")).distinct()
    n = nodes.count()  # |content vocab| -- bounded by the df cap
    if n == 0:
        return spark.createDataFrame([], "term string, textrank double")
    ranks = nodes.select("term", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for i in range(TEXTRANK_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["term"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("term"),
            (
                F.lit((1 - TEXTRANK_DAMPING) / n)
                + TEXTRANK_DAMPING * F.col("mass")
            ).alias("rank"),
        )
        if i % 3 == 2:
            ranks = ranks.localCheckpoint()
    return (
        ranks.select("term", F.round("rank", 6).alias("textrank"))
        .orderBy(F.col("textrank").desc(), "term")
        .limit(TEXTRANK_TOP)
    )


@register(
    "docs_vocab_growth_heaps",
    tags=("text", "stats"),
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT term) AS BIGINT) AS vocab
      FROM tok GROUP BY source
    ),
    pts AS (
      SELECT CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(20,15))
                  AS DOUBLE) AS x,
             CAST(CAST(ln(CAST(vocab AS DOUBLE)) AS DECIMAL(20,15))
                  AS DOUBLE) AS y
      FROM tf WHERE n_tokens > 0 AND vocab > 0
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(25,15))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(25,15))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(25,15))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(25,15))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n AS n_sources,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) + 0.0
             AS heaps_beta,
           round(exp((sy - (n * sxy - sx * sy)
                      / nullif(n * sxx - sx * sx, 0) * sx) / n), 6)
             AS heaps_k
    FROM m WHERE n >= 2
    """,
)
def docs_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth (Heaps 1978): regress
    ln(vocab) on ln(tokens) across per-source corpus slices -- V = K n^b
    with the classic b in [0.4, 0.6] for natural language. The
    vocabulary-GROWTH companion to text_zipf_fit (the two laws are dual
    under the LNRE regime text_hapax_legomena_share profiles): a corpus
    whose beta collapses is saturating (template/duplicated text adds
    tokens but no vocabulary), one whose beta nears 1 is unbounded-
    vocabulary noise (serial numbers, hashes).

    Exactness: token/vocab counts are exact integers via the shared
    tokenizer; each ln and each OLS product snaps to DECIMAL before the
    order-free sums (the Hill-estimator discipline); slope and the
    back-transformed K are closed forms rounded at 6dp.

    Scale: one explode + (source, term) reduction (the tokenize_tf
    shuffle shape) folded to |sources| points; the regression is
    |sources|-row arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.countDistinct("term").cast("bigint").alias("vocab"),
        )
    )
    pts = tf.filter((F.col("n_tokens") > 0) & (F.col("vocab") > 0)).select(
        F.log(F.col("n_tokens").cast("double")).cast("decimal(20,15)")
        .cast("double").alias("x"),
        F.log(F.col("vocab").cast("double")).cast("decimal(20,15)")
        .cast("double").alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(25,15)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(25,15)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(25,15)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(25,15)")).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        nd * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return m.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_sources"),
        # + 0.0 normalizes IEEE signed zero: a degenerate corpus can put
        # the rounded slope at -0.0 on one engine and 0.0 on the other
        # (hash-different strings for the same number)
        (F.round(slope, 6) + F.lit(0.0)).alias("heaps_beta"),
        F.round(F.exp((F.col("sy") - slope * F.col("sx")) / nd), 6).alias("heaps_k"),
    )


@register(
    "docs_source_vocab_jaccard",
    tags=("text", "northstar"),
    oracle=f"""
    WITH st AS (
      SELECT DISTINCT source, t.term
      FROM documents, unnest({TOKENS}) AS t(term)
      WHERE source IS NOT NULL
    ),
    sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_terms
      FROM st GROUP BY source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, sa.n_terms AS n_terms_a,
           sb.n_terms AS n_terms_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n_terms + sb.n_terms - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.source_a
    JOIN sz sb ON sb.source = i.source_b
    ORDER BY i.source_a, i.source_b
    """,
)
def docs_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap: the Jaccard similarity of the
    distinct-term sets of every source pair (intersection counted once
    on the term-grain join; union by inclusion-exclusion, never
    materialized). The corpus-mixing planning view:
    docs_distinctive_terms_by_source says what makes each source
    DIFFERENT, this one number per pair says how REDUNDANT two sources
    are before you pay to ingest both -- high vocabulary Jaccard is the
    cheap screen that precedes document-level dedup across sources.

    Exactness: pure integer set counting; one division at 6dp.

    Scale: the (source, term) distinct is one partial agg over the token
    explode; the pair intersection is a TERM-co-partitioned self-join of
    that reduced relation (vocabulary-bounded, never document-bounded);
    |sources|^2 rows out."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    st = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            ).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # sizes + self-join consumers
    )
    sz = st.groupBy("source").agg(F.count("*").cast("bigint").alias("n_terms"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("sa"), F.col("n_terms").alias("n_terms_a"))
    sb = sz.select(F.col("source").alias("sb"), F.col("n_terms").alias("n_terms_b"))
    return (
        inter.join(F.broadcast(sa), F.col("sa") == F.col("source_a"))
        .join(F.broadcast(sb), F.col("sb") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "n_terms_a",
            "n_terms_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_terms_a") + F.col("n_terms_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


MTLD_TTR_THRESHOLD = 0.72  # McCarthy & Jarvis (2010) factor boundary
MTLD_MIN_TOKENS = 10       # below this, MTLD is noise; doc drops from the mean


@register("text_mtld_lexical_diversity", tags=("text", "quality", "northstar"))
# rows-only: MTLD's factor count is an order-sequential traversal of each
# token stream (no SQL twin); repetitive-vs-diverse and length-robustness
# gates in tests/test_round21_ops.py.
def text_mtld_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD lexical diversity per source (McCarthy & Jarvis 2010): walk
    each document's token stream, count a 'factor' every time the
    running type-token ratio sinks below 0.72, add the fractional
    remainder, MTLD = tokens/factors, averaged over the forward and
    backward passes. THE length-robust diversity measure: raw TTR
    (docs_ttr_by_source family) mechanically decays with document
    length, so corpus slices of different lengths can't be compared on
    it -- MTLD's factor normalization removes exactly that bias, which
    is why data-quality pipelines quote it next to the Gopher gates.
    Documents under MTLD_MIN_TOKENS tokens drop from the mean (the
    measure is noise there); a document whose TTR never sinks (all
    tokens distinct) takes MTLD = token count, the standard convention.

    Determinism: the per-doc walk is pure integer/set arithmetic in
    token order; per-doc values snap to 6dp before the order-free
    DECIMAL mean.

    Scale: one Arrow-batched mapInPandas pass over (source, text) --
    each doc walks once per direction, nothing shuffles but the
    (source, mtld) pairs folding into |sources| partials."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )

    def walk(toks) -> float:
        factors = 0.0
        types: set = set()
        count = 0
        ttr = 1.0
        for t in toks:
            count += 1
            types.add(t)
            ttr = len(types) / count
            if ttr < MTLD_TTR_THRESHOLD:
                factors += 1.0
                types.clear()
                count = 0
                ttr = 1.0
        if count > 0 and ttr < 1.0:
            factors += (1.0 - ttr) / (1.0 - MTLD_TTR_THRESHOLD)
        return factors

    def mtld_batches(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for src, text in zip(pdf["source"], pdf["text"]):
                toks = [w for w in (text or "").lower().split(" ") if w]
                n = len(toks)
                if n < MTLD_MIN_TOKENS:
                    continue
                vals = []
                for seq in (toks, toks[::-1]):
                    f = walk(seq)
                    vals.append(n / f if f > 0 else float(n))
                out.append((src, round((vals[0] + vals[1]) / 2, 6),
                            round(len(set(toks)) / n, 6)))
            yield pd.DataFrame(out, columns=["source", "mtld", "ttr"])

    per_doc = d.select("source", "text").mapInPandas(
        mtld_batches, "source string, mtld double, ttr double"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.avg(F.col("mtld").cast("decimal(18,6)")).cast("double"), 6
            ).alias("mean_mtld"),
            F.round(
                F.avg(F.col("ttr").cast("decimal(18,6)")).cast("double"), 6
            ).alias("mean_ttr"),
        )
        .orderBy("source")
    )


@register(
    "text_yule_k_by_source",
    tags=("text", "stats"),
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS f
      FROM tok GROUP BY 1, 2
    ),
    spec AS (
      SELECT source,
             CAST(sum(f) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS m2,
             CAST(sum(CAST(f AS DECIMAL(38,0)) * (f - 1)) AS DECIMAL(38,0))
               AS coll
      FROM tf GROUP BY 1
    )
    SELECT source, n_tokens, vocab,
           round(10000.0 * (CAST(m2 AS DOUBLE) - n_tokens)
                 / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS yule_k,
           round(CAST(coll AS DOUBLE)
                 / nullif(CAST(n_tokens AS DOUBLE) * (n_tokens - 1), 0), 6)
             AS simpson_d
    FROM spec WHERE n_tokens >= 2
    ORDER BY source
    """,
)
def text_yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K and Simpson's repeat-rate D per source
    (Yule 1944; Simpson 1949): K = 10^4 (sum_m m^2 V(m) - N) / N^2 over
    the frequency spectrum and D = sum f(f-1) / (N(N-1)) -- the
    probability two tokens drawn without replacement are the SAME type.
    Both are LENGTH-INVARIANT repeat-rate measures (unlike raw TTR,
    which collapses as N grows), which is why stylometry ranks authors
    by K; K ~ 10^4 * D for large N, and template/boilerplate-heavy
    sources stand out with HIGH K (more repetition) while serial-number
    noise drives K toward 0. The closed-form exact member of the
    lexical-diversity family: MTLD (rows-only, order-sequential) reads
    drift along the document, K reads the corpus-level spectrum with a
    full DuckDB oracle.

    Exactness: the frequency spectrum is exact integers off the shared
    whitespace tokenizer; sum m^2 V(m) == sum_term f^2 accumulates in
    DECIMAL(38,0); K and D are one double division each, rounded at
    6dp.

    Scale: one explode + (source, term) reduction (the tokenize_tf
    shuffle shape) folded source-grain; |sources| rows out."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    spec = tf.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f"))
        .cast("decimal(38,0)")
        .alias("m2"),
        F.sum(F.col("f").cast("decimal(38,0)") * (F.col("f") - 1))
        .cast("decimal(38,0)")
        .alias("coll"),
    )
    n = F.col("n_tokens").cast("double")
    return (
        spec.filter(F.col("n_tokens") >= 2)
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.round(
                10000.0 * (F.col("m2").cast("double") - F.col("n_tokens")) / (n * n),
                6,
            ).alias("yule_k"),
            F.round(
                F.col("coll").cast("double")
                / F.nullif(n * (n - 1), F.lit(0.0)),
                6,
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )


@register(
    "docs_bigram_entropy_rate_by_source",
    tags=("text", "stats"),
    oracle=f"""
    WITH toks AS (
      SELECT source, {TOKENS} AS toks FROM documents
    ),
    uni AS (
      SELECT source, u.term, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT source, unnest(toks) AS term FROM toks) u
      GROUP BY 1, 2
    ),
    unt AS (
      SELECT source, CAST(sum(f) AS BIGINT) AS n FROM uni GROUP BY 1
    ),
    un AS (
      SELECT u.source, t.n,
             CAST(sum(CAST((CAST(u.f AS DOUBLE) / t.n)
                           * ln(CAST(u.f AS DOUBLE) / t.n)
                           AS DECIMAL(20,15))) AS DOUBLE) AS sxlx
      FROM uni u JOIN unt t ON t.source = u.source
      GROUP BY u.source, t.n
    ),
    big AS (
      SELECT source, b.bigram, CAST(count(*) AS BIGINT) AS f
      FROM (
        SELECT source,
               unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM toks WHERE len(toks) >= 2
      ) b
      GROUP BY 1, 2
    ),
    bnt AS (
      SELECT source, CAST(sum(f) AS BIGINT) AS n FROM big GROUP BY 1
    ),
    bn AS (
      SELECT b.source, t.n,
             CAST(sum(CAST((CAST(b.f AS DOUBLE) / t.n)
                           * ln(CAST(b.f AS DOUBLE) / t.n)
                           AS DECIMAL(20,15))) AS DOUBLE) AS sxlx
      FROM big b JOIN bnt t ON t.source = b.source
      GROUP BY b.source, t.n
    )
    SELECT un.source, un.n AS n_tokens, bn.n AS n_bigrams,
           round(-un.sxlx, 6) + 0.0 AS h_unigram,
           round(-bn.sxlx, 6) + 0.0 AS h_bigram,
           round(-bn.sxlx - (-un.sxlx), 6) + 0.0 AS entropy_rate
    FROM un JOIN bn ON bn.source = un.source
    ORDER BY un.source
    """,
)
def docs_bigram_entropy_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram entropy rate per source (Shannon 1951's n-gram ladder,
    rung 2): H(W2 | W1) = H(bigram) - H(unigram) -- the average
    next-token uncertainty given one token of context, in nats. The
    corpus-level information census next to the per-document scoring
    family (quality_perplexity_bigram grades DOCUMENTS under a corpus
    model; this grades the SOURCE's own distribution): low entropy rate
    flags template/boilerplate-dominated sources where context nearly
    determines the next token (cheap tokens for an LM to fit), high
    rate marks genuinely diverse text worth its ingestion budget.

    Exactness: unigram and bigram counts are exact integers (bigrams
    are built INSIDE each document's token array by a JVM-side
    transform over adjacent positions -- never a token-grain join,
    never across documents); each p ln p term snaps to DECIMAL(20,15)
    before the order-free sums; the three outputs round once at 6dp
    with signed-zero normalization.

    Scale: two explode + (source, gram) reductions (the tokenize_tf
    shuffle shape); the per-document bigram construction is array
    arithmetic inside whole-stage codegen; |sources| rows out."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", _tokens().alias("t")).localCheckpoint(
        eager=False
    )  # unigram + bigram explodes
    uni = (
        toks.select("source", F.explode("t").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    ws = Window.partitionBy("source")

    def _ent(df):
        p = F.col("f").cast("double") / F.sum("f").over(ws)
        return df.select(
            "source",
            F.col("f"),
            (p * F.log(p)).cast("decimal(20,15)").alias("xlx"),
        ).groupBy("source").agg(
            F.sum("f").cast("bigint").alias("n"),
            F.sum("xlx").cast("double").alias("sxlx"),
        )

    un = _ent(uni)
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat(t[i-1], ' ', t[i]))"
                )
            ).alias("bigram"),
        )
        .groupBy("source", "bigram")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    bn = _ent(big).select(
        F.col("source").alias("bn_source"),
        F.col("n").alias("n_bigrams"),
        F.col("sxlx").alias("b_sxlx"),
    )
    return (
        un.join(bn, F.col("bn_source") == F.col("source"))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "n_bigrams",
            (F.round(-F.col("sxlx"), 6) + 0.0).alias("h_unigram"),
            (F.round(-F.col("b_sxlx"), 6) + 0.0).alias("h_bigram"),
            (F.round(-F.col("b_sxlx") + F.col("sxlx"), 6) + 0.0).alias(
                "entropy_rate"
            ),
        )
        .orderBy("source")
    )


BURROWS_TOP_N = 50  # most-frequent-word panel size (Burrows used 40-150)


@register(
    "text_burrows_delta_matrix",
    tags=("text", "stats"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({TOKENS}) AS term FROM documents
    ),
    st AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS f
      FROM tok GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, CAST(sum(f) AS BIGINT) AS n FROM st GROUP BY 1
    ),
    topn AS (
      SELECT term FROM (
        SELECT term, CAST(sum(f) AS BIGINT) AS tf FROM st GROUP BY 1
      ) ORDER BY tf DESC, term LIMIT {BURROWS_TOP_N}
    ),
    rel AS (
      SELECT t.source, tp.term,
             CAST(coalesce(s.f, 0) AS DOUBLE) / t.n AS r
      FROM totals t CROSS JOIN topn tp
      LEFT JOIN st s ON s.source = t.source AND s.term = tp.term
    ),
    mz AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(r AS DECIMAL(25,18))) AS DOUBLE) AS sr,
             CAST(sum(CAST(r * r AS DECIMAL(25,18))) AS DOUBLE) AS srr
      FROM rel GROUP BY 1
    ),
    z AS (
      SELECT rel.source, rel.term,
             (rel.r - mz.sr / mz.k)
               / sqrt(mz.srr / mz.k - (mz.sr / mz.k) * (mz.sr / mz.k)) AS z
      FROM rel JOIN mz ON mz.term = rel.term
      WHERE mz.srr / mz.k - (mz.sr / mz.k) * (mz.sr / mz.k) > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(CAST(sum(CAST(abs(a.z - b.z) AS DECIMAL(20,15))) AS DOUBLE)
                 / count(*), 6) AS delta
    FROM z a JOIN z b ON b.term = a.term AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def text_burrows_delta_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair (Burrows 2002, THE
    stylometric distance): z-score each source's relative frequency of
    the corpus's BURROWS_TOP_N most frequent words against the
    across-source mean/std of that word, then Delta = mean |z_a - z_b|
    over the panel. Function-word usage is the authorial fingerprint
    content words can't fake, which is why Delta attributes disputed
    authorship; in a training-data pipeline it reads which sources
    share a register (near-zero Delta = stylistically redundant feeds,
    the style-level companion to docs_source_vocab_jaccard's vocabulary
    overlap). The zero-filled (source, term) spine keeps sources that
    never use a panel word comparable (their z is the negative mean,
    not a dropped row).

    Exactness: counts are exact integers; relative frequencies and
    z-scores evaluate shared double expressions over DECIMAL-snapped
    moment sums; constant terms (zero variance across sources) are
    excluded by the same shared comparison; per-term |z| differences
    snap to DECIMAL(20,15) before the order-free pair mean.

    Scale: one (source, term) reduction; the panel join is
    |sources| x N rows; the pair matrix is term-co-partitioned over
    that tiny relation. C(|sources|, 2) rows out."""
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
        .localCheckpoint(eager=False)  # totals + topn + spine joins
    )
    totals = st.groupBy("source").agg(F.sum("f").cast("bigint").alias("n"))
    topn = (
        st.groupBy("term")
        .agg(F.sum("f").cast("bigint").alias("tf"))
        .orderBy(F.col("tf").desc(), "term")
        .limit(BURROWS_TOP_N)
        .select("term")
    )
    rel = (
        totals.crossJoin(F.broadcast(topn))
        .join(st, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.coalesce(F.col("f"), F.lit(0)).cast("double") / F.col("n")).alias("r"),
        )
        .localCheckpoint(eager=False)  # moments + z rows
    )
    mz = rel.groupBy("term").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("r").cast("decimal(25,18)")).cast("double").alias("sr"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(25,18)"))
        .cast("double")
        .alias("srr"),
    )
    mean = F.col("sr") / F.col("k")
    var = F.col("srr") / F.col("k") - mean * mean
    z = (
        rel.join(mz, "term")
        .filter(var > 0)
        .select(
            "source", "term", ((F.col("r") - mean) / F.sqrt(var)).alias("z")
        )
    )
    b = z.select(
        F.col("source").alias("source_b"),
        F.col("term").alias("b_term"),
        F.col("z").alias("bz"),
    )
    return (
        z.join(
            b,
            (F.col("b_term") == F.col("term"))
            & (F.col("source") < F.col("source_b")),
        )
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(
                F.sum(F.abs(F.col("z") - F.col("bz")).cast("decimal(20,15)"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )
