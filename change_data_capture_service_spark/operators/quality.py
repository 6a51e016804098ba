"""Document-quality and corpus-hygiene operators (round-3 north-star
extension): Gopher-style quality rules, PII redaction, fixed-stride
chunking, corpus n-gram counts, and URL host statistics -- the filters a
training-data pipeline runs between language-ID and mixture sampling.

Scale design shared by the module:
- everything is JVM built-ins (split / explode / regexp / substr): no
  Python in any hot path, whole-stage codegen end to end;
- per-document derivations are embarrassingly parallel (no shuffle);
- the corpus-wide aggregations (n-gram counts, host stats) partial-agg
  map-side and shuffle only (key, count) pairs -- at 100 TB the shuffle
  volume is the distinct-key count, not the corpus size;
- top-k outputs go through orderBy+limit = TakeOrderedAndProject (O(k)
  per partition, no global sort).

PII note: the fixture corpus is synthetic word salad with no real PII, so
``pii_redact`` plants a deterministic contact line per document (derived
from doc_id, identically in the oracle) and then runs the real
email/phone scrub over the combined text. The regexes are the op; the
planted line makes them provably exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import TOKENS, _tokens

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "quality_gopher_rules",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    per_tok AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c, CAST(len(tok) AS BIGINT) AS l
      FROM toks GROUP BY doc_id, tok
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_unique,
             CAST(max(c) AS BIGINT) AS top_count,
             CAST(sum(l * c) AS BIGINT) AS sum_len
      FROM per_tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS mean_word_len,
           round(CAST(n_unique AS DOUBLE) / n_tokens, 6) AS unique_frac,
           round(CAST(top_count AS DOUBLE) / n_tokens, 6) AS top_token_frac,
           CAST(CASE WHEN n_tokens BETWEEN 10 AND 100000
                      AND CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 2 AND 10
                      AND CAST(n_unique AS DOUBLE) / n_tokens > 0.2
                      AND CAST(top_count AS DOUBLE) / n_tokens < 0.3
                 THEN 1 ELSE 0 END AS INT) AS keep
    FROM per_doc
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, public): token
    count bounds, mean word length band, unique-token ratio, and
    most-frequent-token dominance, folded into one keep/drop flag.

    One explode + one (doc_id, token) partial aggregation; every ratio is
    an integer-exact sum divided once at the end (round 6 both engines).
    At 100 TB this is the map-side-heavy shape: the shuffle carries
    (doc_id, token, count), bounded by per-doc vocabulary, not corpus
    bytes."""
    d = load_table(spark, sf_dir, "documents")
    per_tok = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .withColumn("l", F.length("tok").cast("long"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.max("c").alias("top_count"),
        F.sum(F.col("l") * F.col("c")).alias("sum_len"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    uniq = F.col("n_unique").cast("double") / F.col("n_tokens")
    top = F.col("top_count").cast("double") / F.col("n_tokens")
    keep = (
        F.col("n_tokens").between(10, 100000)
        & mean_len.between(2, 10)
        & (uniq > 0.2)
        & (top < 0.3)
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(uniq, 6).alias("unique_frac"),
        F.round(top, 6).alias("top_token_frac"),
        keep.cast("int").alias("keep"),
    )


@register(
    "pii_redact",
    tags=("quality", "northstar"),
    oracle=f"""
    WITH contact AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS full_text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(full_text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(full_text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(full_text, '{_PHONE_RE}')) AS INT) AS n_phones
    FROM contact
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: replace email addresses and phone numbers with typed
    placeholders and count what was removed (the audit trail a curation
    pipeline keeps). Pure JVM regexp_replace/regexp_count -- per-row, no
    shuffle, codegen'd; at 100 TB this runs at scan speed.

    The fixture text has no organic PII, so a deterministic contact line
    (derived from doc_id, identically in both engines) is appended first;
    the scrub then provably matches and removes it."""
    d = load_table(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    c = d.select("doc_id", full.alias("full_text"))
    return c.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("full_text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("redacted"),
        F.regexp_count("full_text", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("full_text", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
    )


@register(
    "chunk_documents",
    tags=("quality", "northstar"),
    oracle="""
    SELECT doc_id,
           CAST((pos - 1) / 150 AS INT) AS chunk_id,
           substr(text, CAST(pos AS INT), 200) AS chunk_text,
           CAST(len(substr(text, CAST(pos AS INT), 200)) AS INT) AS n_chunk_chars
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(len(text), 1), 150)) AS pos
      FROM documents
    )
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride character chunking with overlap (window 200, stride
    150): the standard pre-tokenization split for embedding / training
    sequence pipelines. sequence() + explode + substr, all JVM; output
    rows ~= corpus_chars / stride, produced map-side with no shuffle.
    Chunk boundaries depend only on the text, so re-chunking after an
    upstream refresh is reproducible shard-by-shard."""
    d = load_table(spark, sf_dir, "documents")
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(150))
    )
    chunk = F.substring(F.col("text"), F.col("pos"), 200)
    return (
        d.select("doc_id", "text", pos.alias("pos"))
        .select(
            "doc_id",
            ((F.col("pos") - 1) / 150).cast("int").alias("chunk_id"),
            chunk.alias("chunk_text"),
            F.length(chunk).cast("int").alias("n_chunk_chars"),
        )
    )


@register(
    "ngram_counts",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    grams AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS ngram
      FROM toks WHERE len(toks) >= 2
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n
    FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 100
    """,
)
def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 word bigrams: the vocabulary/contamination
    profiling pass. Explode is map-side; the aggregation partial-combines
    before its single shuffle, so shuffle volume is the distinct-bigram
    count; the final top-k is TakeOrderedAndProject (no global sort).
    element_at is 1-based -- a two-arg transform lambda receives (element,
    index), so the index sequence is generated explicitly instead."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(_tokens().alias("toks")).filter(F.size("toks") >= 2)
    grams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(100)
    )


@register(
    "url_host_stats",
    tags=("quality", "northstar"),
    oracle="""
    WITH urls AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?ref=' || lang AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM urls GROUP BY 1
    """,
)
def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host corpus composition (docs and language spread per source
    host) -- the crawl-mix dashboard query. URL strings are synthesized
    deterministically from (source, doc_id, lang) since the fixture has no
    URL column; the host extraction then uses Spark's real parse_url
    against the oracle's regex. Aggregation partial-combines; output is
    |hosts| rows."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
    )
    return (
        d.select(F.parse_url(url, F.lit("HOST")).alias("host"), "lang")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


@register(
    "text_entropy",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY doc_id, tok
    ),
    tot AS (
      SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id
    )
    SELECT tf.doc_id,
           CAST(any_value(tot.n) AS BIGINT) AS n_tokens,
           CAST(round(-sum((tf.c / tot.n) * ln(tf.c / tot.n)), 6) AS DOUBLE) AS entropy
    FROM tf JOIN tot ON tf.doc_id = tot.doc_id
    GROUP BY tf.doc_id
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level Shannon entropy per document (nats): the gibberish /
    boilerplate detector -- low entropy means a few tokens dominate
    (repeated spam), implausibly high means near-uniform noise. A standard
    quality signal alongside the Gopher rules.

    Scale: explode + two-level agg keyed by doc_id, so every shuffle key
    is the doc -- token counting partial-aggregates map-side, and because
    both aggs and the join share the doc_id key, the planner reuses ONE
    exchange (co-located join, no fact re-shuffle). Per-doc state is the
    doc's vocabulary, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    tot = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        tf.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n").cast("bigint").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 6).cast("double").alias("entropy"),
        )
    )


@register(
    "text_repetition",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    words AS (
      SELECT doc_id, unnest(toks) AS tok, len(toks) AS n FROM toks
    ),
    wc AS (
      SELECT doc_id, tok, any_value(n) AS n, count(*) AS c
      FROM words GROUP BY doc_id, tok
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS g,
             len(toks) - 1 AS ng
      FROM toks WHERE len(toks) >= 2
    ),
    gc AS (
      SELECT doc_id, g, any_value(ng) AS ng, count(*) AS c
      FROM grams GROUP BY doc_id, g
    )
    SELECT wc.doc_id,
           CAST(round(max(wc.c) / any_value(wc.n), 6) AS DOUBLE) AS top_word_frac,
           CAST(round(coalesce(any_value(gd.dup_frac), 0.0), 6) AS DOUBLE)
             AS dup_bigram_frac
    FROM wc
    LEFT JOIN (
      SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) / any_value(ng) AS dup_frac
      FROM gc GROUP BY doc_id
    ) gd ON wc.doc_id = gd.doc_id
    GROUP BY wc.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of tokens
    taken by the single most frequent word, and fraction of bigram slots
    occupied by bigrams that occur more than once (Rae et al. 2021,
    "Scaling Language Models", table A1 -- public paper). High values on
    either flag template/spam text that survives length filters.

    Scale: same one-key (doc_id) explode/agg family as text_entropy --
    all shuffles are keyed by doc, partial-agg combines map-side, and the
    two signal branches join co-located on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks"))
    wc = (
        toks.select("doc_id", F.size("toks").alias("n"), F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.first("n").alias("n"), F.count("*").alias("c"))
    )
    top_word = wc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.first("n"), 6).cast("double").alias("top_word_frac")
    )
    grams = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        (F.size("toks") - 1).alias("ng"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("g"),
    )
    gc = grams.groupBy("doc_id", "g").agg(F.first("ng").alias("ng"), F.count("*").alias("c"))
    dup = gc.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))) / F.first("ng")
        ).alias("dup_frac")
    )
    return top_word.join(dup, "doc_id", "left").select(
        "doc_id",
        "top_word_frac",
        F.round(F.coalesce(F.col("dup_frac"), F.lit(0.0)), 6)
        .cast("double")
        .alias("dup_bigram_frac"),
    )


@register(
    "quality_stopword_ratio",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {TOKENS} AS toks FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> t IN ('a', 'the', 'of', 'and', 'to')))
             AS BIGINT) AS n_stopwords,
           round(CAST(len(list_filter(toks, t -> t IN ('a', 'the', 'of', 'and', 'to')))
                   AS DOUBLE) / nullif(len(toks), 0), 6) AS stopword_ratio
    FROM toks
    """,
)
def quality_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stopword density -- the Gopher/C4 signal that separates
    running prose (stopword-rich) from boilerplate, navigation chrome, and
    keyword-stuffed spam (stopword-poor). Complements quality_gopher_rules'
    structural cuts with a lexical one; a real curation pass thresholds on
    this column per language.

    Scale: pure map-side array math over the same tokenizer every text op
    shares (split + filter, JVM codegen, no UDF) -- zero shuffles, combines
    with scan pushdown. nullif guards the empty-document edge identically
    in both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stops = F.filter(toks, lambda t: t.isin("a", "the", "of", "and", "to"))
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(stops).cast("bigint").alias("n_stopwords"),
        F.round(
            F.size(stops).cast("double") / F.nullif(F.size(toks), F.lit(0)), 6
        ).alias("stopword_ratio"),
    )


@register(
    "docs_token_histogram",
    tags=("quality", "text", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, n_chars, len({TOKENS}) AS n_tokens FROM documents
    )
    SELECT CAST(n_tokens // 25 * 25 AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
    FROM toks GROUP BY 1
    """,
)
def docs_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in 25-token buckets with per-bucket char
    averages -- the corpus-shape profile every curation run starts with
    (length cutoffs for quality filters, packing budgets for training
    sequences, skew check before sharding).

    Determinism: bucket edges and min/max are integer math; avg_chars is
    one double division over exact BIGINT sums. Scale: map-side tokenize +
    partial agg; the shuffle carries |buckets| states (dozens), not
    documents."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return (
        d.select("n_chars", n_tokens.alias("n_tokens"))
        .groupBy(
            (F.floor(F.col("n_tokens") / 25) * 25).cast("bigint").alias("bucket_lo")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
                "avg_chars"
            ),
        )
    )


@register(
    "docs_lang_source_mix",
    tags=("quality", "agg", "northstar"),
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, n_docs, total_chars,
           round(CAST(n_docs AS DOUBLE)
                 / sum(n_docs) OVER (PARTITION BY lang), 6) AS share_of_lang
    FROM c
    """,
)
def docs_lang_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language x source composition of the corpus with within-language
    source shares -- the mixture table a curation run balances against
    (sample_token_mixture consumes exactly these proportions).

    Counts are exact integers; the share is one double division against a
    window sum of BIGINTs (exact, order-independent). Scale: partial agg
    to |lang x source| rows, then a window over that dim-scale table."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    w = Window.partitionBy("lang")
    return c.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6).alias(
            "share_of_lang"
        ),
    )


@register(
    "docs_readability",
    tags=("quality", "text"),
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS n_words,
             len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(ceil(n_words / 12.0) AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / ceil(n_words / 12.0))
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             AS flesch_score
    FROM m WHERE n_words > 0
    """,
)
def docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document -- the readability gate a
    training-data pipeline runs next to the Gopher rules (very low scores
    flag machine-generated or boilerplate text). Syllables are vowel-run
    counts (the standard heuristic); the fixture corpus has no sentence
    punctuation, so sentences use the same fixed 12-token segmenter as
    dedup_lines -- the formula plumbing is the operator under test,
    exactly as that module documents for its line segmenter.

    Scale: regexp_extract_all + split are map-side JVM expressions over
    the text column; zero shuffles, runs at scan speed like the other
    quality gates."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != ""))
    n_syll = F.size(F.expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
    m = d.select(
        "doc_id", n_words.alias("n_words"), n_syll.alias("n_syllables")
    ).filter(F.col("n_words") > 0)
    n_sent = F.ceil(F.col("n_words") / 12.0)
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        F.round(
            206.835
            - 1.015 * (F.col("n_words").cast("double") / n_sent)
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            6,
        ).alias("flesch_score"),
    )


@register(
    "quality_perplexity_unigram",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
    ),
    corpus AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM corpus)
    SELECT tf.doc_id,
           CAST(sum(tf.c) AS BIGINT) AS n_tokens,
           CAST(round(-sum(tf.c * ln(CAST(corpus.cc AS DOUBLE) / n.n))
                      / sum(tf.c), 6) AS DOUBLE) AS cross_entropy
    FROM tf JOIN corpus USING (tok) CROSS JOIN n
    GROUP BY tf.doc_id
    """,
)
def quality_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram language
    model (nats/token): the cheapest perplexity-style quality filter --
    documents far above the corpus norm are noise/gibberish, far below are
    boilerplate -- the signal CCNet/Gopher pipelines compute with a real
    LM, here with the corpus itself as the model so the operator is
    self-contained and oracle-checkable.

    Scale: token counts partial-aggregate at (doc, token) grain, the
    corpus model re-aggregates THAT relation at token grain (vocab-sized,
    never corpus-sized), and the model joins back co-located on the token
    key; the corpus total is a 1-row broadcast. Per-token ln() terms sum
    per doc and round at 1e-6 (the text_entropy precedent: doc-local sums
    are small enough that accumulation order cannot move the 6th
    decimal)."""
    d = load_table(spark, sf_dir, "documents")
    # materialize-once: tf feeds the corpus model, the 1-row total (via the
    # model), and the scoring join -- unpersisted, each branch re-tokenizes
    # the corpus (measured 3 planned document scans).
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    corpus = tf.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cc"))
    n = corpus.agg(F.sum("cc").cast("bigint").alias("n"))
    return (
        tf.join(corpus, "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("c") * F.log(F.col("cc").cast("double") / F.col("n"))
                )
                / F.sum("c"),
                6,
            )
            .cast("double")
            .alias("cross_entropy"),
        )
    )


@register(
    "quality_ccnet_buckets",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
    ),
    corpus AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM corpus),
    ce AS (
      SELECT tf.doc_id,
             CAST(round(-sum(tf.c * ln(CAST(corpus.cc AS DOUBLE) / n.n))
                        / sum(tf.c), 6) AS DOUBLE) AS cross_entropy
      FROM tf JOIN corpus USING (tok) CROSS JOIN n
      GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT d.lang, ce.cross_entropy FROM ce JOIN documents d USING (doc_id)
    ),
    cuts AS (
      SELECT lang,
             round(quantile_cont(cross_entropy, 1.0/3), 6) AS b1,
             round(quantile_cont(cross_entropy, 2.0/3), 6) AS b2
      FROM scored GROUP BY lang
    )
    SELECT s.lang,
           CASE WHEN s.cross_entropy <= c.b1 THEN 'head'
                WHEN s.cross_entropy <= c.b2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(s.cross_entropy AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_cross_entropy
    FROM scored s JOIN cuts c USING (lang)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def quality_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail quality binning: per language, documents
    are split at the tertiles of their unigram cross-entropy (lowest
    third = 'head' = closest to the corpus LM = highest quality -- the
    bucket CCNet trains on first). Builds directly on
    ``quality_perplexity_unigram``'s per-doc score; both engines compute
    the tertile boundaries with the same linear-interpolation quantile
    definition over identical 6-dp-rounded doubles, so bucket edges agree
    exactly, and the per-bucket mean accumulates through DECIMAL.

    Scale: the per-doc score relation (doc-grain -- exactly what CCNet
    materializes) is persisted because both the boundary aggregate and the
    bucket assignment consume it; boundaries are a |langs|-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    corpus = tf.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cc"))
    n = corpus.agg(F.sum("cc").cast("bigint").alias("n"))
    ce = (
        tf.join(corpus, "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(F.col("c") * F.log(F.col("cc").cast("double") / F.col("n")))
                / F.sum("c"),
                6,
            )
            .cast("double")
            .alias("cross_entropy")
        )
    )
    scored = (
        ce.join(d.select("doc_id", "lang"), "doc_id")
        .select("lang", "cross_entropy")
        .localCheckpoint(eager=False)
    )
    # 6-dp snap on the boundaries: the two engines interpolate quantiles
    # with different arithmetic orderings, and a document whose (already
    # 6-dp) score sits ON a tertile boundary would flip buckets on a
    # last-ulp difference (caught by the unicode-corpus sweep's tiny
    # per-language groups)
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("cross_entropy", F.lit(1.0 / 3)), 6).alias("b1"),
        F.round(F.percentile("cross_entropy", F.lit(2.0 / 3)), 6).alias("b2"),
    )
    bucket = (
        F.when(F.col("cross_entropy") <= F.col("b1"), "head")
        .when(F.col("cross_entropy") <= F.col("b2"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("cross_entropy").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_cross_entropy"),
        )
        .orderBy("lang", "bucket")
    )


# rows-only: zlib byte-stream output is library-versioned; the SIGNAL
# (ratio ordering: repetitive compresses further) is gated in pytest.
@register("quality_compression_ratio", tags=("quality", "text", "northstar"))
def quality_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: deflate each document and report
    compressed/raw bytes -- the cheap repetitiveness detector curation
    stacks run beside Gopher rules (template spam and keyboard mash both
    compress abnormally well; near-random noise doesn't compress at all).
    Vectorized zlib over Arrow batches (stdlib, level 6 pinned); the
    per-source rollup is what a crawl triage dashboard shows.

    Scale: map-side mapInPandas (CPU-bound, embarrassingly parallel) ->
    ONE |sources|-state partial agg; ratios snap to 6 dp DECIMAL before
    averaging."""
    import pandas as pd
    import zlib

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def ratios(batches):
        for pdf in batches:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            n = raw.map(len)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": n,
                    "ratio": (comp / n).round(6),
                }
            )
            # empty documents have no meaningful ratio: zlib's empty-stream
            # overhead (~8 bytes over 0) would otherwise inflate avg/max
            # for any source containing empties -- null them out instead
            out.loc[n == 0, "ratio"] = None
            yield out

    r = d.mapInPandas(ratios, "doc_id long, source string, n_bytes long, ratio double")
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("ratio").cast("bigint").alias("n_nonempty"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,6)")).cast("double")
                / F.count("ratio"),
                6,
            ).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
        )
        .orderBy("source")
    )


@register(
    "docs_quality_pass_rate_by_source_lang",
    tags=("quality", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    per_tok AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c, CAST(len(tok) AS BIGINT) AS l
      FROM toks GROUP BY doc_id, tok
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(CASE WHEN sum(c) BETWEEN 10 AND 100000
                        AND CAST(sum(l * c) AS DOUBLE) / sum(c) BETWEEN 2 AND 10
                        AND CAST(count(*) AS DOUBLE) / sum(c) > 0.2
                        AND CAST(max(c) AS DOUBLE) / sum(c) < 0.3
                   THEN 1 ELSE 0 END AS INT) AS keep
      FROM per_tok GROUP BY doc_id
    )
    SELECT d.source, d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(p.keep, 0)) AS BIGINT) AS n_pass,
           round(CAST(sum(coalesce(p.keep, 0)) AS DOUBLE) / count(*), 6)
             AS pass_rate
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    GROUP BY d.source, d.lang
    """,
)
def docs_quality_pass_rate_by_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation slicing grid: Gopher-gate pass rate per (source,
    lang) cell -- which crawl sources and languages are worth keeping at
    current thresholds, and where the gate disproportionately drops a
    language (the fairness review every filtered-corpus report includes).
    Docs too short to tokenize count as fails (coalesce 0), matching the
    gate's intent.

    Scale: the gopher per-doc agg is vocabulary-bounded; the rollup is
    one |sources x langs|-state partial agg."""
    d = load_table(spark, sf_dir, "documents")
    per_tok = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .withColumn("l", F.length("tok").cast("long"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.max("c").alias("top_count"),
        F.sum(F.col("l") * F.col("c")).alias("sum_len"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    uniq = F.col("n_unique").cast("double") / F.col("n_tokens")
    top = F.col("top_count").cast("double") / F.col("n_tokens")
    keep = (
        F.col("n_tokens").between(10, 100000)
        & mean_len.between(2, 10)
        & (uniq > 0.2)
        & (top < 0.3)
    ).cast("int")
    q = per_doc.select("doc_id", keep.alias("keep"))
    return (
        d.select("doc_id", "source", "lang")
        .join(q, "doc_id", "left")
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("keep", F.lit(0))).cast("bigint").alias("n_pass"),
            F.round(
                F.sum(F.coalesce("keep", F.lit(0))).cast("double") / F.count("*"), 6
            ).alias("pass_rate"),
        )
    )


@register(
    "quality_perplexity_bigram",
    tags=("quality", "text", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {{TOKENS}} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM toks WHERE len(toks) >= 2
    ),
    dbg AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
    ),
    cbg AS (
      SELECT bg, CAST(sum(c) AS BIGINT) AS cbb FROM dbg GROUP BY bg
    ),
    cw1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(cbb) AS BIGINT) AS cu
      FROM cbg GROUP BY 1
    ),
    v AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS tok FROM toks)
    )
    SELECT dbg.doc_id,
           CAST(sum(dbg.c) AS BIGINT) AS n_bigrams,
           CAST(round(-sum(dbg.c * ln((CAST(cbg.cbb AS DOUBLE) + 1)
                                      / (cw1.cu + v.v)))
                      / sum(dbg.c), 6) AS DOUBLE) AS cross_entropy
    FROM dbg
    JOIN cbg USING (bg)
    JOIN cw1 ON split_part(dbg.bg, ' ', 1) = cw1.w1
    CROSS JOIN v
    GROUP BY dbg.doc_id
    """.replace("{{TOKENS}}", "{TOKENS}").format(TOKENS=TOKENS),
)
def quality_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own ADD-ONE-smoothed
    bigram model (nats/bigram): P(w2|w1) = (C(w1 w2)+1)/(C(w1 .)+V). The
    bigram member of the perplexity family -- it catches
    scrambled-word-order junk the unigram model scores as perfectly
    normal (same unigram marginals, alien transitions), which is the
    gibberish class CCNet's 5-gram KenLM exists to kill; add-one
    smoothing keeps the model total over unseen transitions without
    shipping an external LM. Documents with < 2 tokens have no bigrams
    and are excluded on both engines.

    Scale: same shape as quality_perplexity_unigram one gram up --
    (doc, bigram) partial counts, a corpus model at BIGRAM-VOCAB grain
    re-aggregated from that relation (the head-word totals C(w1 .) fold
    from the bigram model, not from a second corpus pass), and a
    co-located scoring join on the bigram key; V and nothing else is a
    broadcast scalar. Per-token ln() terms sum per doc and round at 1e-6
    (the text_entropy accumulation-order precedent)."""
    d = load_table(spark, sf_dir, "documents")
    t = _tokens()
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.array_join(F.slice(t, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dbg = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # feeds the model and the scoring join
    )
    # cbg feeds the head-word rollup AND the scoring join: without the
    # barrier the (doc,bigram) -> bigram aggregation executes twice (r14
    # stage profile: the 32 MB dbg checkpoint was re-read three times)
    cbg = (
        dbg.groupBy("bg")
        .agg(F.sum("c").cast("bigint").alias("cbb"))
        .localCheckpoint(eager=False)
    )
    cw1 = (
        cbg.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("cbb").cast("bigint").alias("cu"))
    )
    v = d.select(F.explode(t).alias("tok")).agg(
        F.count_distinct("tok").cast("bigint").alias("v")
    )
    return (
        dbg.join(cbg, "bg")
        .join(cw1, F.substring_index(dbg["bg"], " ", 1) == cw1["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("c")
                    * F.log(
                        (F.col("cbb").cast("double") + 1)
                        / (F.col("cu") + F.col("v"))
                    )
                )
                / F.sum("c"),
                6,
            )
            .cast("double")
            .alias("cross_entropy"),
        )
    )


@register(
    "docs_url_canonical_dedup",
    tags=("quality", "curation", "northstar"),
    oracle="""
    WITH u AS (
      SELECT source,
             'https://' ||
             CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
             '.Example.COM/docs/' || CAST(CAST(floor(doc_id / 100) AS BIGINT) AS VARCHAR) ||
             CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=' || lang
                  WHEN doc_id % 5 = 1 THEN '?id=' || lang
                  ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ), c AS (
      SELECT source, url,
             'https://' ||
             lower(regexp_extract(regexp_replace(regexp_replace(str_split(url, '#')[1], 'utm_[^&]*&?', ''), '[?&]+$', ''), '^https?://([^/]+)', 1)) ||
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(str_split(url, '#')[1], 'utm_[^&]*&?', ''), '[?&]+$', ''), '^https?://[^/]+', ''), '/\\?', '?'), '/+$', '') AS canon
      FROM u
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
           round(1 - CAST(count(DISTINCT canon) AS DOUBLE) / nullif(count(DISTINCT url), 0), 6) AS alias_rate
    FROM c GROUP BY source
    """,
)
def docs_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup -- the FIRST dedup pass of every crawl
    pipeline (cheaper than any content hash: two fetches of the same page
    under cosmetic URL variants never enter the corpus). Canonical form:
    lowercase the host, drop the fragment, strip utm_* tracking params
    (and any dangling '?'/'&'), collapse '/?'->'?' and trailing slashes;
    REAL query params (?id=...) survive, so distinct resources stay
    distinct. URLs are synthesized deterministically from
    (source, doc_id, lang) -- the fixture has no URL column (same
    convention as url_host_stats) -- with the noise dimensions keyed to
    doc_id residues so each (source, century) page exists under several
    cosmetic variants.

    Scale: canonicalization is pure map-side string work; the rollup is
    one |sources|-keyed partial agg. The count_distinct pair makes this
    a two-phase agg on (source, url) -- still shuffles digest-sized rows
    only. At 100 TB you'd hash canon to 16 bytes first; semantics
    identical."""
    d = load_table(spark, sf_dir, "documents")
    host = F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit(".Example.COM/docs/"),
        F.floor(F.col("doc_id") / 100).cast("bigint").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("?utm_source=feed&id="), F.col("lang")),
        )
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("?id="), F.col("lang")))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = d.select("source", url.alias("url"))
    no_frag = F.split(F.col("url"), "#").getItem(0)
    no_utm = F.regexp_replace(no_frag, "utm_[^&]*&?", "")
    no_dangle = F.regexp_replace(no_utm, "[?&]+$", "")
    lhost = F.lower(F.regexp_extract(no_dangle, "^https?://([^/]+)", 1))
    rest = F.regexp_replace(no_dangle, "^https?://[^/]+", "")
    rest = F.regexp_replace(rest, "/\\?", "?")
    rest = F.regexp_replace(rest, "/+$", "")
    canon = F.concat(F.lit("https://"), lhost, rest)
    return (
        u.select("source", "url", canon.alias("canon"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.count_distinct("url").cast("bigint").alias("n_distinct_raw"),
            F.count_distinct("canon").cast("bigint").alias("n_canonical"),
        )
        .select(
            "source",
            "n_urls",
            "n_distinct_raw",
            "n_canonical",
            F.round(
                1
                - F.col("n_canonical").cast("double")
                / F.nullif(F.col("n_distinct_raw"), F.lit(0)),
                6,
            ).alias("alias_rate"),
        )
    )


@register(
    "quality_gate_agreement_kappa",
    tags=("quality", "dq", "northstar"),
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({TOKENS}) AS tok FROM documents) GROUP BY 1, 2
    ), stats AS (
      SELECT doc_id, sum(c) AS n, count(*) AS u, max(c) AS tc,
             sum(len(tok) * c) AS sl,
             sum(CASE WHEN tok IN ('the','a','an','and','or','of','to','in','is','it') THEN c ELSE 0 END) AS sw
      FROM tf GROUP BY 1
    ), ent AS (
      SELECT tf.doc_id, -sum((CAST(c AS DOUBLE)/n)*ln(CAST(c AS DOUBLE)/n)) AS entropy
      FROM tf JOIN (SELECT doc_id, sum(c) AS n FROM tf GROUP BY 1) t USING (doc_id)
      GROUP BY 1
    ), flags AS (
      SELECT s.doc_id,
             (n >= 10 AND n <= 100000 AND CAST(sl AS DOUBLE)/n >= 2 AND CAST(sl AS DOUBLE)/n <= 10
              AND CAST(u AS DOUBLE)/n > 0.2 AND CAST(tc AS DOUBLE)/n < 0.3) AS g_gopher,
             (entropy >= 3.0) AS g_entropy,
             (CAST(sw AS DOUBLE)/n >= 0.05) AS g_stopword
      FROM stats s JOIN ent USING (doc_id)
    ), pairs AS (
      SELECT p.gate_a, p.gate_b, p.a, p.b
      FROM flags, LATERAL (VALUES
        ('gopher', 'entropy', g_gopher, g_entropy),
        ('gopher', 'stopword', g_gopher, g_stopword),
        ('entropy', 'stopword', g_entropy, g_stopword)) AS p(gate_a, gate_b, a, b)
    ), agg AS (
      SELECT gate_a, gate_b, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01
      FROM pairs GROUP BY 1, 2
    )
    SELECT gate_a, gate_b, n_docs,
           round((n11 + (n_docs - n11 - n10 - n01)) / CAST(n_docs AS DOUBLE), 6) AS observed_agreement,
           round(((n11 + (n_docs - n11 - n10 - n01)) / CAST(n_docs AS DOUBLE)
                  - ((n11+n10)/CAST(n_docs AS DOUBLE) * (n11+n01)/CAST(n_docs AS DOUBLE)
                     + (1-(n11+n10)/CAST(n_docs AS DOUBLE)) * (1-(n11+n01)/CAST(n_docs AS DOUBLE))))
                 / nullif(1 - ((n11+n10)/CAST(n_docs AS DOUBLE) * (n11+n01)/CAST(n_docs AS DOUBLE)
                     + (1-(n11+n10)/CAST(n_docs AS DOUBLE)) * (1-(n11+n01)/CAST(n_docs AS DOUBLE))), 0), 6) AS kappa
    FROM agg
    """,
)
def quality_gate_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the quality filters agree? Pairwise Cohen's kappa between three
    independent gate families -- the Gopher composite (length / word-
    length / uniqueness / top-token), a token-entropy threshold, and a
    stopword-ratio threshold -- the meta-analysis a curation team runs
    before stacking filters: near-zero kappa means the gates remove
    DIFFERENT documents (stacking multiplies attrition), high kappa
    means a cheaper gate can substitute for an expensive one. On the
    synthetic fixture the gates are close to independent (kappa ~ 0.01-
    0.11), which is the correct reading, and pytest plants a corpus
    where two gates provably co-fire to pin the high-kappa side.

    Exactness: all four confusion cells are exact integers from one flag
    table; po/pe/kappa are one shared double closed form, NULL when a
    gate is constant on both sides (pe = 1).

    Scale: ONE (doc, token) aggregation feeds every signal (the entropy
    pass reuses the same tf relation), flags are doc-grain, and the x3
    stack explodes scalar booleans into a |gate-pairs|-state partial
    agg. No second tokenize pass, no text shuffle."""
    d = load_table(spark, sf_dir, "documents")
    stop = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # tf feeds stats AND the entropy join
    )
    tot = tf.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    ent = (
        tf.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                -(F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("c").cast("double") / F.col("n"))
            ).alias("entropy")
        )
    )
    stats = tf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("u"),
        F.max("c").cast("bigint").alias("tc"),
        F.sum(F.length("tok") * F.col("c")).cast("bigint").alias("sl"),
        F.sum(F.when(F.col("tok").isin(*stop), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sw"),
    )
    flags = stats.join(ent, "doc_id").select(
        "doc_id",
        (
            (F.col("n") >= 10)
            & (F.col("n") <= 100000)
            & (F.col("sl").cast("double") / F.col("n") >= 2)
            & (F.col("sl").cast("double") / F.col("n") <= 10)
            & (F.col("u").cast("double") / F.col("n") > 0.2)
            & (F.col("tc").cast("double") / F.col("n") < 0.3)
        ).alias("g_gopher"),
        (F.col("entropy") >= 3.0).alias("g_entropy"),
        (F.col("sw").cast("double") / F.col("n") >= 0.05).alias("g_stopword"),
    )
    pairs = flags.select(
        F.expr(
            "stack(3,"
            " 'gopher', 'entropy', g_gopher, g_entropy,"
            " 'gopher', 'stopword', g_gopher, g_stopword,"
            " 'entropy', 'stopword', g_entropy, g_stopword"
            ") as (gate_a, gate_b, a, b)"
        )
    )
    agg = pairs.groupBy("gate_a", "gate_b").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
    )
    n = F.col("n_docs").cast("double")
    n00 = n - F.col("n11") - F.col("n10") - F.col("n01")
    po = (F.col("n11") + n00) / n
    pa = (F.col("n11") + F.col("n10")) / n
    pb = (F.col("n11") + F.col("n01")) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    return agg.select(
        "gate_a",
        "gate_b",
        "n_docs",
        F.round(po, 6).alias("observed_agreement"),
        F.round((po - pe) / F.nullif(1 - pe, F.lit(0.0)), 6).alias("kappa"),
    )


@register(
    "quality_perplexity_vs_gopher_calibration",
    tags=("quality", "northstar", "agg"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c,
             CAST(len(tok) AS BIGINT) AS l
      FROM toks GROUP BY doc_id, tok
    ),
    corpus AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM tf GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM corpus),
    ce AS (
      SELECT tf.doc_id,
             round(-sum(tf.c * ln(CAST(cc AS DOUBLE) / n)) / sum(tf.c), 6)
               AS cross_entropy
      FROM tf JOIN corpus ON tf.tok = corpus.tok CROSS JOIN tot
      GROUP BY tf.doc_id
    ),
    gopher AS (
      SELECT doc_id,
             CASE WHEN sum(c) BETWEEN 10 AND 100000
                   AND CAST(sum(l * c) AS DOUBLE) / sum(c) BETWEEN 2 AND 10
                   AND CAST(count(*) AS DOUBLE) / sum(c) > 0.2
                   AND CAST(max(c) AS DOUBLE) / sum(c) < 0.3
              THEN 1 ELSE 0 END AS keep,
             CAST(sum(c) AS BIGINT) AS n_tokens
      FROM tf GROUP BY doc_id
    )
    SELECT CAST(floor(ce.cross_entropy * 2) AS BIGINT) AS ce_band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(g.keep) AS BIGINT) AS n_keep,
           round(CAST(sum(g.keep) AS DOUBLE) / count(*), 6) AS gopher_pass_rate,
           CAST(sum(g.n_tokens) AS BIGINT) AS tokens
    FROM ce JOIN gopher g ON ce.doc_id = g.doc_id
    GROUP BY 1
    """,
)
def quality_perplexity_vs_gopher_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal calibration: per half-nat band of unigram
    cross-entropy, the Gopher rule gate's pass rate -- do the cheap LM
    signal and the heuristic ruleset AGREE on which documents are
    garbage? A monotone pass-rate curve says either signal suffices; a
    flat one says they measure different failure modes and the pipeline
    needs both (quality_gate_agreement_kappa gives the doc-level
    agreement number; this gives the curve that explains it).

    Exactness: both signals recompute their ops' exact forms from ONE
    shared (doc, token) relation; banding floors the 6dp-ROUNDED
    cross-entropy at half-nat edges (integer band ids, no quantile
    boundary flap); pass rates are exact-count divisions at 6 dp.

    Scale: one explode + one (doc, token) partial agg feeds both signals
    (single corpus scan -- the rollup-window discipline); the corpus LM
    is vocab-bounded; the final rollup is |bands|-sized."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
        .withColumn("l", F.length("tok").cast("bigint"))
        .localCheckpoint(eager=False)  # both signals + the LM reuse it
    )
    corpus = tf.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cc"))
    tot = corpus.agg(F.sum("cc").cast("bigint").alias("n"))
    ce = (
        tf.join(corpus, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(F.col("c") * F.log(F.col("cc").cast("double") / F.col("n")))
                / F.sum("c"),
                6,
            ).alias("cross_entropy")
        )
    )
    gopher = tf.groupBy("doc_id").agg(
        F.when(
            F.sum("c").between(10, 100000)
            & (F.sum(F.col("l") * F.col("c")).cast("double") / F.sum("c")).between(2, 10)
            & (F.count("*").cast("double") / F.sum("c") > 0.2)
            & (F.max("c").cast("double") / F.sum("c") < 0.3),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("keep"),
        F.sum("c").cast("bigint").alias("n_tokens"),
    )
    return (
        ce.join(gopher, "doc_id")
        .groupBy(
            F.floor(F.col("cross_entropy") * 2).cast("bigint").alias("ce_band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            F.round(F.sum("keep").cast("double") / F.count("*"), 6).alias(
                "gopher_pass_rate"
            ),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
        )
    )


@register(
    "chunk_boundary_overlap_audit",
    tags=("quality", "northstar", "agg"),
    oracle="""
    WITH chunks AS (
      SELECT doc_id,
             CAST(len(text) AS BIGINT) AS doc_chars,
             CAST((pos - 1) / 150 AS INT) AS chunk_id,
             CAST(len(substr(text, CAST(pos AS INT), 200)) AS BIGINT) AS n_chunk_chars
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(len(text), 1), 150)) AS pos
        FROM documents
      )
    ),
    per_doc AS (
      SELECT doc_id, max(doc_chars) AS doc_chars,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(n_chunk_chars) AS BIGINT) AS emitted_chars
      FROM chunks GROUP BY doc_id
    )
    SELECT n_chunks,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_chars) AS BIGINT) AS doc_chars,
           CAST(sum(emitted_chars) AS BIGINT) AS emitted_chars,
           CAST(sum(emitted_chars - doc_chars) AS BIGINT) AS overlap_chars,
           round(CAST(sum(emitted_chars) AS DOUBLE)
                 / nullif(sum(doc_chars), 0), 6) AS expansion_ratio
    FROM per_doc GROUP BY n_chunks
    """,
)
def chunk_boundary_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking-cost audit over chunk_documents' exact stride/window
    geometry (window 200, stride 150): per chunks-per-doc band, how many
    characters the chunker EMITS vs the document's own -- the overlap tax
    (emitted - original) is pure duplicated compute/storage downstream
    (every overlapped character is embedded and indexed twice), and the
    expansion ratio is the multiplier a budget owner applies to corpus
    bytes before sizing the embedding job. Full coverage is structural
    (stride tiles every offset), so the audit's conservation law is
    emitted >= doc chars with equality iff one chunk.

    Exactness: all character counts are exact integers off the same
    substring geometry as chunk_documents (mirrored oracle); one ratio
    at 6 dp.

    Scale: sequence+explode map-side (the chunk op's own shape), then a
    |docs| partial agg and a |bands| rollup -- no shuffle carries chunk
    text, only counts."""
    d = load_table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("doc_chars"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(150))
        ).alias("pos"),
        F.col("text"),
    ).select(
        "doc_id",
        "doc_chars",
        F.length(F.expr("substr(text, CAST(pos AS INT), 200)")).cast("bigint").alias(
            "n_chunk_chars"
        ),
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.max("doc_chars").alias("doc_chars"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_chunk_chars").cast("bigint").alias("emitted_chars"),
    )
    return per_doc.groupBy("n_chunks").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_chars").cast("bigint").alias("doc_chars"),
        F.sum("emitted_chars").cast("bigint").alias("emitted_chars"),
        F.sum(F.col("emitted_chars") - F.col("doc_chars")).cast("bigint").alias(
            "overlap_chars"
        ),
        F.round(
            F.sum("emitted_chars").cast("double")
            / F.nullif(F.sum("doc_chars"), F.lit(0)),
            6,
        ).alias("expansion_ratio"),
    )


@register(
    "quality_language_purity",
    tags=("quality", "text"),
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    flags AS (
      SELECT doc_id, source,
             CASE WHEN list_has_any(tk, ['the', 'a', 'of', 'and'])
                  THEN 1 ELSE 0 END
             + CASE WHEN list_has_any(tk, ['der', 'die', 'und', 'ein'])
                    THEN 1 ELSE 0 END
             + CASE WHEN list_has_any(tk, ['le', 'la', 'et', 'un'])
                    THEN 1 ELSE 0 END AS n_langs
      FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_langs >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_marked,
           CAST(sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mixed,
           round(CAST(sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN n_langs >= 1 THEN 1 ELSE 0 END), 0), 6)
             AS mixed_share
    FROM flags GROUP BY source ORDER BY source
    """,
)
def quality_language_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity per source: the share of marker-bearing documents
    that carry stopword markers from TWO OR MORE languages -- the
    code-switching / boilerplate-contamination signal (CCNet and Gopher
    both gate on language purity before perplexity filtering; a source
    with high mixed_share needs segment-level, not document-level,
    language ID). Uses the same deliberately-literal marker lists as
    text_langid (LANG_MARKERS), shared verbatim by the oracle.

    Exactness: presence flags are exact set-intersection tests on the
    shared token arrays; shares are integer ratios with a nullif guard.

    Scale: map-side flag computation inside the scan (no explode -- the
    arrays test against 4-word constant lists), one per-source partial
    agg."""
    from .text import LANG_MARKERS, _tokens as _text_tokens

    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", "source", _text_tokens().alias("tk"))
    n_langs = sum(
        F.when(
            F.arrays_overlap(
                F.col("tk"), F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
            ),
            1,
        ).otherwise(0)
        for lang in ["en", "de", "fr"]
    )
    flags = tk.select("source", n_langs.alias("n_langs"))
    marked = F.sum(F.when(F.col("n_langs") >= 1, 1).otherwise(0))
    mixed = F.sum(F.when(F.col("n_langs") >= 2, 1).otherwise(0))
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            marked.cast("bigint").alias("n_marked"),
            mixed.cast("bigint").alias("n_mixed"),
            F.round(
                mixed.cast("double") / F.nullif(marked, F.lit(0)), 6
            ).alias("mixed_share"),
        )
        .orderBy("source")
    )
