"""Deduplication operators (SURVEY.md §2.2 X18 + north star): exact,
keyed, MinHash-LSH near-dup, SimHash, character-n-gram Jaccard, and
embedding-cosine near-dup -- the dedup toolbox of a 100 TB training-data
pipeline.

Scale design, applied to every near-dup operator here:
1. never all-pairs on the full corpus -- generate candidates via a
   *blocking* structure (LSH band buckets / simhash bands / label blocks)
   whose join key co-locates probable pairs in one shuffle;
2. verify candidates exactly (the candidate set is tiny relative to N²);
3. everything JVM-side built-ins except SimHash's bit arithmetic, which is
   a vectorized Pandas UDF (numpy popcount beats per-row Python ~100x).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, spread
from ..registry import register

# ---------------------------------------------------------------------------
# shared text shingling (JVM-side: split -> transform -> distinct)
# ---------------------------------------------------------------------------

TOKENS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"  # duckdb side


def _tokens() -> Column:
    return F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")


def _shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, built entirely with JVM array
    expressions (sequence/transform/slice) -- no Python in the loop.

    TOTAL by construction: slice never throws and the CASE guard returns
    an empty array for arrays shorter than n. The earlier element_at form
    relied on an upstream size filter -- but Catalyst's subexpression
    elimination can hoist the shingle expression into a merged Filter
    PREDICATE evaluated before that guard, which threw
    INVALID_ARRAY_INDEX under ANSI on short documents (caught by the
    unicode/degenerate corpus sweeps). Expressions that can throw must be
    total; CASE branches are the only evaluation-order guarantee."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread first: shingling is CPU-bound and the fixture is one file
    d = spread(load_table(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", _tokens().alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", _shingles(F.col("toks")).alias("shingles"))
    )


# Document-frequency cap for EXACT-jaccard pair formation (the round-8
# extension of the CONTAINMENT_DF_CAP treatment to its siblings): a shingle
# appearing in more than this many documents is dropped from CANDIDATE
# GENERATION -- the pair space is otherwise sum over shingles of df², and one
# boilerplate shingle in 10^6 docs yields 10^12 join rows before any filter
# can run. With the cap the worst case is |shingles| x CAP² BY CONSTRUCTION,
# not by operator vigilance. Jaccard values for surfaced pairs stay EXACT
# (array_intersect over the FULL shingle sets, hot shingles included), so
# the cap is a recall-only bias: a pair sharing ONLY hot shingles never
# surfaces -- the standard compromise (the banded MinHash path is the
# production detector for those; these exact ops are its diagnostics).
JACCARD_DF_CAP = 64


def _capped_exact_pairs(sh: DataFrame, cap: int | None = None) -> DataFrame:
    """Exact-jaccard pair statistics (doc_id_a, doc_id_b, c, na, nb) over
    the DF-capped candidate space, in the ONE-groupBy shape of the
    original uncapped join (the first capped form routed candidates
    through a dropDuplicates + two full-shingle-array verify joins --
    3 extra stages that benched 3x slower at sf0.1 on a hot-shingle-free
    corpus, pure overhead in the common case):

    1. the global hot-shingle list (df > JACCARD_DF_CAP) is TINY by
       construction (<= occurrences/CAP entries) and broadcasts;
    2. candidate occurrences are the broadcast ANTI-join of the exploded
       stream against it, carrying each doc's FULL shingle count n, so
       one equi-join + groupBy yields c_capped, na, nb directly --
       identical cost to the uncapped form when nothing is hot;
    3. exactness is restored by adding back the HOT-shingle overlap:
       per-doc hot-shingle sets (small arrays, empty for most docs) left-
       join onto the surviving pairs and c = c_capped +
       |hotset_a INTERSECT hotset_b|. Surfaced c/na/nb are therefore
       EXACT (hot shingles included) while candidate formation stays
       bounded at |shingles| x CAP^2.

    ``cap`` defaults to the module's JACCARD_DF_CAP, resolved at CALL
    time (not def time) so tests that monkeypatch the constant keep
    working; containment passes its own CONTAINMENT_DF_CAP."""
    if cap is None:
        cap = JACCARD_DF_CAP
    ex = sh.select(
        "doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("shingle")
    )
    hot = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle")
        .localCheckpoint(eager=False)  # consumed by the anti- AND semi-join
    )
    # materialize-once (r14): exc feeds BOTH self-join sides -- without the
    # barrier the explode + anti-join subtree is planned twice and the
    # planner broadcast one full copy of the exploded stream (the r14
    # before-plan shows the exc subtree at nodes (1)-(10) AND (11)-(20)
    # with node (21) a BroadcastExchange of the whole stream)
    exc = ex.join(F.broadcast(hot), "shingle", "left_anti").localCheckpoint(eager=False)
    a, b = exc.alias("a"), exc.alias("b")
    pairs0 = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(
            F.count("*").alias("c_capped"),
            F.first("a.n").alias("na"),
            F.first("b.n").alias("nb"),
        )
    )
    # materialize-once (r14): hotdoc feeds the ha AND hb join-backs; the
    # un-checkpointed form ran the explode + semi-join + collect_set pass
    # twice (empty or not -- the scans still happen)
    hotdoc = (
        ex.join(F.broadcast(hot), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("hotset"))
        .localCheckpoint(eager=False)
    )
    ha = hotdoc.select(F.col("doc_id").alias("doc_id_a"), F.col("hotset").alias("hs_a"))
    hb = hotdoc.select(F.col("doc_id").alias("doc_id_b"), F.col("hotset").alias("hs_b"))
    empty = F.array().cast("array<string>")
    return (
        pairs0.join(ha, "doc_id_a", "left")
        .join(hb, "doc_id_b", "left")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("c_capped")
                + F.size(
                    F.array_intersect(
                        F.coalesce("hs_a", empty), F.coalesce("hs_b", empty)
                    )
                )
            )
            .cast("long")
            .alias("c"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
        )
    )


# SQL fragment shared by oracles: exact pairwise jaccard via shingle
# explode + equi-join (never an N² cross join -- same shape as the engine's
# verification stage).
_ORACLE_EXACT_JACCARD = f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM toks WHERE len(toks) >= 3
    ),
    ex AS (
      SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS c, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
"""

# The DF-capped twin of _ORACLE_EXACT_JACCARD, mirroring _capped_exact_pairs:
# candidates only from shingles with df <= JACCARD_DF_CAP, exact c/na/nb from
# the FULL shingle sets for surfaced pairs. Ends with the same `pairs` CTE
# (same columns), so downstream oracle suffixes compose unchanged.
_ORACLE_EXACT_JACCARD_CAPPED = f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM toks WHERE len(toks) >= 3
    ),
    ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ),
    ok AS (
      SELECT shingle FROM ex GROUP BY 1 HAVING count(*) <= {JACCARD_DF_CAP}
    ),
    exc AS (
      SELECT ex.doc_id, ex.shingle FROM ex JOIN ok USING (shingle)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT cand.doc_id_a, cand.doc_id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS c,
             len(sa.shingles) AS na, len(sb.shingles) AS nb
      FROM cand
      JOIN sh sa ON sa.doc_id = cand.doc_id_a
      JOIN sh sb ON sb.doc_id = cand.doc_id_b
    )
"""


@register(
    "dedup_exact",
    tags=("dedup", "northstar"),
    oracle="""
    SELECT sha256(text) AS content_sha,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by CONTENT identity: hash-groupBy on sha2(text, 256),
    keeping the lowest doc_id per duplicate group (deterministic survivor).
    One partial-aggregated shuffle, and the shuffle moves 32-byte digests +
    two longs per row -- never the document bodies -- which is the shape
    that survives 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.sha2(F.col("text"), 256).alias("content_sha"), "doc_id").groupBy(
        "content_sha"
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("group_size"),
    )


@register(
    "dedup_keyed",
    tags=("dedup", "northstar"),
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY lang, source ORDER BY doc_id DESC) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    """,
)
def dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup = latest-per-key (the CDC X1 semantic applied to a
    corpus): max_by aggregation, not a window sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.max_by(F.struct("doc_id", "n_chars"), F.col("doc_id")).alias("r"))
        .select(F.col("r.doc_id").alias("doc_id"), "lang", "source", F.col("r.n_chars").alias("n_chars"))
    )


@register(
    "dedup_minhash_near",
    tags=("dedup", "northstar", "headline"),
    oracle=_ORACLE_EXACT_JACCARD
    + """
    SELECT doc_id_a, doc_id_b,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM pairs
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    """,
)
def dedup_minhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs (threshold 0.8 shingle-Jaccard).

    shingle -> 32-permutation MinHash signature (xxhash64 with per-perm
    seed, all JVM expressions) -> 8 bands x 4 rows -> band-bucket equi-join
    for candidates -> exact Jaccard verification on candidates only.

    With b=8, r=4 the miss probability for a true 0.8-pair is
    (1-0.8^4)^8 ~ 1.5%, and for the corpus's actual ~0.99 planted dups
    ~1e-10 -- so the exact-SQL oracle matches. The candidate join shuffles
    only (band_id, band_hash, doc_id) tuples: at 100 TB the all-pairs N²
    never materializes."""
    # materialize-once: the shingle relation feeds candidate generation
    # AND the exact-verify joins; without the persist each consumer
    # re-tokenizes the corpus (measured 4-6 planned document scans).
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    return _banded_near_pairs(sh, BANDS, ROWS_PER_BAND, 0.8)


N_PERM, BANDS, ROWS_PER_BAND = 32, 8, 4


def _minhash_sig(sh: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """n_perm-permutation MinHash signature in a single pass over the
    shingle array, folding an n_perm-wide min-state (measured ~2x faster
    than n_perm independent array_min(transform(...)) passes)."""
    minhash = F.expr(
        f"""
        aggregate(shingles,
                  array_repeat(9223372036854775807L, {n_perm}),
                  (acc, s) -> zip_with(acc,
                                       transform(sequence(0, {n_perm - 1}), k -> xxhash64(k, s)),
                                       (a, h) -> least(a, h)))
        """
    )
    return sh.select("doc_id", minhash.alias("sig"))


def _band_entries(
    sig: DataFrame, bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """bands x rows_per_band banding: band rows carry ONLY (doc_id,
    band_id, band_hash) -- never the shingle arrays: candidate joins
    shuffle 24 bytes/row, not document text. The signature must have been
    built with n_perm >= bands * rows_per_band."""
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )


def _banded_near_pairs(
    sh: DataFrame, bands: int, rows_per_band: int, threshold: float
) -> DataFrame:
    """The full MinHash-LSH near-dup pipeline, parameterized by banding
    config: n_perm = bands * rows_per_band signature -> banded candidate
    equi-join -> exact shingle-Jaccard verification at ``threshold``.
    Candidates shuffle (band_id, band_hash, doc_id) tuples only; full
    shingle arrays ship just for the candidate pairs, so precision is
    exact regardless of config and banding affects recall only.

    `sh` should already be materialize-once (localCheckpoint) -- it feeds
    candidate generation AND both exact-verify joins. The band relation is
    ALSO materialize-once (r14): the candidate self-join plans as a
    broadcast hash join locally, and broadcast vs streamed sides never
    share an exchange, so without the barrier the n_perm-hash signature
    fold (the expensive part) executed once PER SIDE -- the same defect
    class the r14 dedup_simhash fix closed."""
    band_entries = _band_entries(
        _minhash_sig(sh, n_perm=bands * rows_per_band), bands, rows_per_band
    ).localCheckpoint(eager=False)
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    pair_ids = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    candidates = (
        pair_ids.join(sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a")), "doc_id_a")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b")), "doc_id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jacc = inter.cast("double") / union
    return (
        candidates.withColumn("jaccard_raw", jacc)
        .filter(F.col("jaccard_raw") >= threshold)
        .select("doc_id_a", "doc_id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


@register(
    "dedup_incremental_minhash",
    tags=("dedup", "curation", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD
    + """
    SELECT doc_id_b AS new_doc_id, doc_id_a AS seen_doc_id,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM pairs
    WHERE doc_id_a < 400 AND doc_id_b >= 400
      AND CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-duplicate detection against the seen store -- the
    production shape for a continuously-ingesting corpus: an arriving
    batch (doc_id >= 400) is checked against the already-accepted corpus
    (doc_id < 400) WITHOUT ever re-pairing the corpus with itself.

    The seen side persists as its banded signature table (24-byte rows;
    at 100 TB the store is a bucketed table keyed by (band_id, band_hash)
    so each ingest probes, never scans). Candidates come from the
    new-bands x seen-bands equi-join -- cost scales with the BATCH, not
    the corpus -- and exact shingle-Jaccard verification runs on
    candidates only, same contract as ``dedup_minhash_near`` (banding
    miss probability for a true 0.8-pair ~1.5%, ~1e-10 for the planted
    ~0.99 dups, so the exact oracle matches). Complements
    ``dedup_incremental`` (exact digests) with the near-dup tier."""
    # materialize-once: the shingle relation feeds candidate generation
    # AND the exact-verify joins; without the persist each consumer
    # re-tokenizes the corpus (measured 4-6 planned document scans).
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    seen_sh = sh.filter(F.col("doc_id") < 400)
    new_sh = sh.filter(F.col("doc_id") >= 400)
    seen_bands = _band_entries(_minhash_sig(seen_sh)).alias("s")
    new_bands = _band_entries(_minhash_sig(new_sh)).alias("n")
    pair_ids = (
        new_bands.join(
            seen_bands,
            (F.col("n.band_id") == F.col("s.band_id"))
            & (F.col("n.band_hash") == F.col("s.band_hash")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("s.doc_id").alias("seen_doc_id"),
        )
        .dropDuplicates(["new_doc_id", "seen_doc_id"])
    )
    candidates = pair_ids.join(
        new_sh.select(F.col("doc_id").alias("new_doc_id"), F.col("shingles").alias("sh_n")),
        "new_doc_id",
    ).join(
        seen_sh.select(F.col("doc_id").alias("seen_doc_id"), F.col("shingles").alias("sh_s")),
        "seen_doc_id",
    )
    inter = F.size(F.array_intersect("sh_n", "sh_s"))
    union = F.size("sh_n") + F.size("sh_s") - inter
    jacc = inter.cast("double") / union
    return (
        candidates.withColumn("jaccard_raw", jacc)
        .filter(F.col("jaccard_raw") >= 0.8)
        .select("new_doc_id", "seen_doc_id", F.round("jaccard_raw", 6).alias("jaccard"))
    )


@register(
    "dedup_ngram_jaccard",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD_CAPPED
    + """
    SELECT doc_id_a, doc_id_b,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM pairs
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs (threshold 0.5) WITHOUT LSH: candidates
    from the DF-capped shingle equi-join (pairs sharing zero rare
    shingles are never formed -- cost is bounded at |shingles| x
    JACCARD_DF_CAP² by construction, never df² on a boilerplate shingle),
    then exact verification on the full shingle sets. The
    exact-but-scalable baseline the MinHash path approximates; surfaced
    jaccard values are identical to the uncapped join's."""
    # materialize-once: the self-join consumes the shingle relation on
    # BOTH sides, so without a checkpoint the CPU-heavy tokenize+shingle
    # pass runs twice (measured 5x wall-clock on the sf0.1 corpus)
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    pairs = _capped_exact_pairs(sh)
    jacc = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        pairs.withColumn("jaccard_raw", jacc)
        .filter(F.col("jaccard_raw") >= 0.5)
        .select("doc_id_a", "doc_id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


# SimHash geometry, shared by the Spark plan and the generated DuckDB twin.
# 60 bits (15 hex chars of md5 -- the widest hex slice whose unsigned value
# still fits SIGNED BIGINT on both engines), 4 bands x 15 bits, verify at
# Hamming <= 6. Both engines hash the UTF-8 bytes of each token with md5,
# so the per-token bit patterns are identical by construction.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_HAMMING_MAX = 6

_SIMHASH_DUCK_VOTES = ", ".join(
    f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_DUCK_SIG = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END)"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_DUCK_SQL = f"""
    WITH tok AS (
      SELECT doc_id,
             ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
      FROM documents,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
             AS t(tok)
    ),
    votes AS (
      SELECT doc_id, {_SIMHASH_DUCK_VOTES}
      FROM tok GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, CAST({_SIMHASH_DUCK_SIG} AS BIGINT) AS sig FROM votes
    ),
    bands AS (
      SELECT s.doc_id, s.sig, g.band_id,
             (s.sig >> ({SIMHASH_BAND_BITS} * g.band_id))
               & {(1 << SIMHASH_BAND_BITS) - 1} AS band_val
      FROM sig s
      CROSS JOIN (SELECT CAST(unnest(range({SIMHASH_BANDS})) AS BIGINT)
                    AS band_id) g
    )
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {SIMHASH_HAMMING_MAX}
"""


@register("dedup_simhash", tags=("dedup", "northstar"), oracle=_SIMHASH_DUCK_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 60-bit signature per doc (per-bit
    majority vote over md5 token hashes -- all JVM builtins, no Python),
    then 4x15-bit band blocking + Hamming<=6 verification via
    bit_count(xor). Round-13 conversion of the former rows-only key: the
    blake2b Pandas UDF became a conv(substr(md5(token),1,15),16,10)
    signature both engines compute identically, so the driver now
    hash-checks the pairs against the generated DuckDB twin above.

    The 60 vote sums are 60 parallel agg expressions in ONE groupBy (no
    bit explode): the token relation folds map-side to |docs| x 60
    narrow ints, so the only wide thing that ever shuffles is the doc
    signature, never text. Banding note: 4 bands of 15 bits is a
    CANDIDATE generator (a pair at Hamming 6 can in principle spread its
    errors across all 4 bands); both engines apply the identical
    banding, so parity is exact over the candidate set by construction.
    Docs with zero tokens drop out at the explode (no direction => no
    signature), mirroring similarity._vectors' zero-vector rule."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        ).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig_expr = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    sigs = votes.select("doc_id", F.expr(sig_expr).cast("bigint").alias("sig"))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    # materialize-once: the band relation feeds BOTH sides of the
    # candidate self-join; without the lazy checkpoint each side re-plans
    # the full tokenize -> md5 -> 60-agg signature pipeline (r14 stage
    # profile: two ~8-10 executor-second stages for one corpus -- the
    # before-plan shows two Scan parquet + duplicated HashAggregate
    # chains). The checkpointed relation is |docs| x SIMHASH_BANDS narrow
    # rows -- the same multi-consumer rule _shingled_docs already follows.
    bands = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sig", SIMHASH_BAND_BITS * b)
                    .bitwiseAND(F.lit(mask))
                    .cast("bigint")
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    ).localCheckpoint(eager=False)
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


@register(
    "dedup_embedding_cosine",
    tags=("dedup", "northstar"),
    oracle="""
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label AS label,
           round(
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
             6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
          >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: block on ``label`` (the IVF-cell analogue:
    compare only within a block, never across the corpus), exact cosine on
    block pairs, threshold 0.35. All-JVM: zip_with + aggregate for the dot
    product, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.expr("transform(embedding, x -> cast(x AS double))")
    norm = F.sqrt(F.expr(
        "aggregate(transform(embedding, x -> cast(x AS double)), 0D, (acc, x) -> acc + x * x)"
    ))
    # hygiene filter (same rule as similarity._vectors): zero-norm and
    # NaN/Inf-norm vectors have no direction and would turn the cosine
    # division into an ANSI crash for one corrupt row
    docs = e.select("vec_id", "label", vec.alias("v"), norm.alias("nrm")).filter(
        (F.col("nrm") > 0) & (F.col("nrm") < float("inf"))
    )
    a, b = docs.alias("a"), docs.alias("b")
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cosine = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_raw", cosine)
        .filter(F.col("cos_raw") >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("a.label").alias("label"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


@register(
    "dedup_cluster",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , near AS (
      SELECT doc_id_a, doc_id_b FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    ),
    edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM near
      UNION
      SELECT doc_id_b, doc_id_a FROM near
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, least(s, min(d)) AS cluster_id
    FROM reach GROUP BY s
    """,
)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the >=0.8-Jaccard
    pair graph, each doc labeled with its component's min doc_id. Pairs
    alone under-describe dup groups (A~B, B~C but A!~C must still dedup as
    one group); components close that transitivity.

    Distributed algorithm: iterative min-label propagation (the two-phase
    hashmin of GraphX/connected-components papers) -- each round, every
    vertex adopts min(own label, neighbors' labels); rounds = graph
    diameter, and near-dup clusters are shallow (pairs share an LSH
    bucket), so 2-3 rounds in practice, capped defensively. Each round is
    one shuffle of (vertex, label); localCheckpoint truncates the plan so
    lineage doesn't grow O(rounds). The oracle computes the same components
    via a recursive-CTE transitive closure -- fine at oracle scale,
    impossible at 100 TB, which is exactly why the engine iterates."""
    pairs = dedup_minhash_near(spark, sf_dir).select("doc_id_a", "doc_id_b")
    return connected_components(pairs)


def connected_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Min-label propagation over an undirected pair graph: (doc_id_a,
    doc_id_b) pairs in, (doc_id, cluster_id=component min) out. One
    (vertex, label) shuffle per round; rounds bounded by component
    diameter (property-tested against a union-find oracle on random
    graphs in test_random_replay)."""
    fwd = pairs.select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint()  # pairs computed once, reused every round

    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):  # early-exits at convergence; cap is a runaway guard
        nbr = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["doc_id"] == nbr["src"], "left")
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", "cluster_id")


@register(
    "dedup_canonical",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , near AS (
      SELECT doc_id_a, doc_id_b FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    ),
    edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM near
      UNION
      SELECT doc_id_b, doc_id_a FROM near
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    cc AS (
      SELECT s AS doc_id, least(s, min(d)) AS cluster_id
      FROM reach GROUP BY s
    ),
    ranked AS (
      SELECT cc.cluster_id, cc.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY cc.cluster_id
                                ORDER BY d.n_chars DESC, cc.doc_id) AS rn
      FROM cc JOIN documents d ON cc.doc_id = d.doc_id
    )
    SELECT cluster_id,
           max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked GROUP BY cluster_id
    """,
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END STEP: for every near-duplicate cluster, elect one
    canonical representative (longest document wins, lowest doc_id breaks
    ties) and count what gets dropped -- the decision that actually shrinks
    the corpus, downstream of pair finding (``dedup_minhash_near``) and
    component closure (``dedup_cluster``).

    One max_by partial agg over the (doc, cluster, n_chars) rows: the
    struct comparator (n_chars, -doc_id) encodes the election rule, so no
    window re-sort -- at corpus scale the agg reduces map-side to one
    candidate per cluster per task."""
    cc = dedup_cluster(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    member = cc.join(d, "doc_id")
    return member.groupBy("cluster_id").agg(
        F.max_by("doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd"))).alias(
            "keep_doc_id"
        ),
        F.count("*").alias("n_docs"),
        (F.count("*") - 1).alias("n_dropped"),
    )


@register(
    "dedup_rate_by_source",
    tags=("dedup", "northstar", "agg"),
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS digest FROM documents
    ),
    dup AS (
      SELECT digest, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY digest
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dup.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(CAST(sum(CASE WHEN dup.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_rate
    FROM h JOIN dup ON h.digest = dup.digest
    GROUP BY h.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source -- the provenance-quality scorecard
    a crawl pipeline triages with ("which feed is flooding us with
    copies?"). A doc counts as duplicated when its content digest appears
    more than once ANYWHERE in the corpus, attributed back to the source
    that contributed it.

    Scale: same digest-group shape as dedup_exact -- the shuffle carries
    md5 digests, never text; the digest-count table joins back on the
    digest key it was grouped on (co-partitioned, no extra exchange);
    the final agg is |sources| states."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", "source", F.md5("text").alias("digest"))
    dup = h.groupBy("digest").agg(F.count("*").alias("n"))
    flag = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        h.join(dup, "digest")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(flag).cast("bigint").alias("n_dup_docs"),
            F.round(F.sum(flag).cast("double") / F.count("*"), 6).alias("dup_rate"),
        )
    )


LINE_BANDS, LINE_ROWS_PER_BAND = 16, 2  # 32 perms re-banded for the lower-J line grain


@register(
    "dedup_minhash_lines",
    tags=("dedup", "curation", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    ls AS (
      SELECT doc_id,
             list_distinct(list_transform(range(CAST(ceil(len(toks) / 12.0) AS BIGINT)),
               i -> array_to_string(toks[i*12+1 : (i+1)*12], ' '))) AS lines
      FROM toks WHERE len(toks) > 0
    ),
    ex AS (
      SELECT doc_id, len(lines) AS n, unnest(lines) AS line FROM ls
    ),
    pairs AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS c, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.line = b.line AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM pairs
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.7
    """,
)
def dedup_minhash_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-duplicate pairs at LINE grain (threshold 0.7 Jaccard
    over the document's distinct line set) -- the second grain RefinedWeb
    dedups at: shingle-grain MinHash (dedup_minhash_near) catches
    re-worded copies, line-grain catches documents assembled from the
    same boilerplate blocks even when their word n-grams differ. Composes
    dedup_lines' 12-token segmenter with the X18 band-store machinery.

    Line sets diverge faster than 3-gram shingle sets (one changed token
    rewrites a whole 12-token line), so true duplicate pairs sit at lower
    Jaccard (fixture: 0.71-0.78 vs the shingle grain's ~0.99). The 32
    permutations therefore re-band as 16 bands x 2 rows: detection
    probability at J=0.71 is 1-(1-0.71^2)^16 ~ 0.99999, vs ~89% under the
    shingle grain's 8x4 banding -- that re-banding is what keeps the
    exact-SQL oracle reachable. Candidates are still exact-verified, so
    banding affects recall only, never precision.

    Scale: identical posture to dedup_minhash_near -- signatures fold
    JVM-side over the line array, the candidate join shuffles only
    (band_id, band_hash, doc_id) tuples, and exact verification touches
    candidate pairs, never the corpus squared."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("toks")).filter(F.size("toks") > 0)
    # materialize-once: the line-set relation feeds the signature pipeline
    # AND both exact-verify joins (the shingle-grain ops' rule; 4 planned
    # document scans without it)
    lines = toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, cast(ceil(size(toks) / 12.0) as int) - 1),"
                " i -> array_join(slice(toks, i*12 + 1, 12), ' '))"
            )
        ).alias("shingles"),  # _minhash_sig folds over the 'shingles' column
    ).localCheckpoint(eager=False)
    sig = _minhash_sig(lines)
    # r14: bands feed both self-join sides; barrier so the signature fold
    # runs once, not once per side (same class as the _banded_near_pairs fix)
    bands = _band_entries(sig, LINE_BANDS, LINE_ROWS_PER_BAND).localCheckpoint(
        eager=False
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pair_ids = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    candidates = (
        pair_ids.join(
            lines.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("ln_a")),
            "doc_id_a",
        )
        .join(
            lines.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("ln_b")),
            "doc_id_b",
        )
    )
    inter = F.size(F.array_intersect("ln_a", "ln_b"))
    union = F.size("ln_a") + F.size("ln_b") - inter
    jacc = inter.cast("double") / union
    return (
        candidates.withColumn("jaccard_raw", jacc)
        .filter(F.col("jaccard_raw") >= 0.7)
        .select("doc_id_a", "doc_id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


# Structural worst-case bound for containment candidate generation: a
# shingle appearing in more than this many documents (boilerplate headers,
# licence blocks) is dropped from PAIR FORMATION -- otherwise one
# mega-shingle-bucket makes the candidate space quadratic by itself.
# Containment values for surfaced pairs stay EXACT (computed on the full
# shingle sets); the recall trade-off is that a pair sharing ONLY hot
# shingles never surfaces -- the standard containment-dedup compromise,
# same spirit as the banding analysis in dedup_minhash_lines.
CONTAINMENT_DF_CAP = 64


@register(
    "dedup_containment_pairs",
    tags=("dedup", "northstar"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM toks WHERE len(toks) >= 3
    ),
    ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ),
    ok AS (
      SELECT shingle FROM ex GROUP BY 1 HAVING count(*) <= {CONTAINMENT_DF_CAP}
    ),
    exc AS (
      SELECT ex.doc_id, ex.shingle FROM ex JOIN ok USING (shingle)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_id_a, c.doc_id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS c,
             len(sa.shingles) AS na, len(sb.shingles) AS nb
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_id_a
      JOIN sh sb ON sb.doc_id = c.doc_id_b
    )
    SELECT doc_id_a, doc_id_b,
           round(CAST(c AS DOUBLE) / na, 6) AS containment_a,
           round(CAST(c AS DOUBLE) / nb, 6) AS containment_b
    FROM verified
    WHERE CAST(c AS DOUBLE) / na >= 0.8 OR CAST(c AS DOUBLE) / nb >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (|A∩B| / |A|, threshold 0.8): the
    subset-duplicate detector Jaccard misses -- a short doc fully embedded
    in a long one has high containment but low Jaccard because the union
    is dominated by the long doc. Standard second pass next to
    dedup_ngram_jaccard in curation pipelines (quote extraction,
    boilerplate wrappers, truncated re-crawls).

    Scale: the pair space is bounded BY CONSTRUCTION, not by operator
    vigilance -- shingles with document frequency > CONTAINMENT_DF_CAP are
    dropped from candidate generation (one cheap (shingle -> df) pre-agg
    on the same key the pair join shuffles on), so the worst case is
    sum over surviving shingles of df² <= |shingles| x CAP². Containment
    ratios for surfaced pairs are computed EXACTLY on the full shingle
    sets, so the cap affects recall -- a pair sharing only boilerplate
    shingles never surfaces -- never the reported values. Only (doc_id,
    shingle-hash) rows shuffle in candidate generation.

    r14: rides ``_capped_exact_pairs`` -- |A∩B| comes from the candidate
    join's own per-pair count (+ the hot-shingle set correction), exactly
    like the jaccard family, instead of the former dropDuplicates + two
    full-shingle-array join-backs + array_intersect per candidate pair
    (the O(|A|+|B|) per-pair set intersection was THE dedup-family
    hotspot: 4.8 s wall / 40 executor-CPU-s at sf0.1, vs 1.5 s / 13 for
    the identical pair space computed by join counts; same exact values
    by the helper's c = c_capped + |hot_a ∩ hot_b| identity)."""
    # materialize-once: the shingle relation feeds candidate generation
    # AND the hot-set correction joins inside the helper.
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    pairs = _capped_exact_pairs(sh, cap=CONTAINMENT_DF_CAP)
    ca = F.col("c").cast("double") / F.col("na")
    cb = F.col("c").cast("double") / F.col("nb")
    return (
        pairs.filter((ca >= 0.8) | (cb >= 0.8))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


@register("dedup_lsh_bucket_stats", tags=("dedup", "monitor"))  # rows-only: xxhash64 buckets are engine-specific
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH health panel: per band, how many buckets exist, how big the
    biggest is, and how many candidate pairs the band generates
    (sum over buckets of C(size, 2)). THE skew diagnostic for banded
    dedup at scale -- one hot bucket (an empty-doc signature, a
    boilerplate shingle set) turns the candidate join quadratic, and this
    panel is how an operator sees it coming BEFORE launching the pair
    join. Engine-specific xxhash64 bucket values -> rows-only check;
    the containment law (every reported near-dup pair shares >=1 band
    bucket, so candidate pairs bound verified pairs) is pinned in pytest.

    Scale: reuses the exact signature/banding pipeline of
    dedup_minhash_near up to the band entries, then ONE partial agg at
    (band, bucket) grain and a |bands|-row rollup -- the panel costs a
    fraction of the join it de-risks."""
    sh = _shingled_docs(spark, sf_dir)
    bands = _band_entries(_minhash_sig(sh))
    buckets = bands.groupBy("band_id", "band_hash").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    return (
        buckets.groupBy("band_id")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.max("sz").cast("bigint").alias("max_bucket"),
            # sz*(sz-1) is always even so DIV 2 is exact; integer / would
            # promote to DOUBLE and lose exactness past 2^53 -- precisely
            # the hot-bucket skew regime this panel exists to detect.
            F.sum(F.expr("sz * (sz - 1) DIV 2")).cast("bigint").alias("candidate_pairs"),
        )
        .orderBy("band_id")
    )


@register("dedup_minhash_estimate_quality", tags=("dedup", "monitor"))  # rows-only: sig positions are engine-specific
def dedup_minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality panel for the MinHash sketch: for every LSH
    candidate pair, the signature-agreement Jaccard estimate (fraction of
    matching positions across the 32 permutations) next to the EXACT
    shingle Jaccard, with the absolute error. This is how an operator
    validates the sketch's permutation count before trusting the near-dup
    threshold at corpus scale -- expected estimator std at J is
    sqrt(J(1-J)/32) <= 0.09, and the pytest gate pins the measured mean
    absolute error under that envelope.

    Scale: candidates come from the banded join (never all pairs); the
    exact Jaccard joins shingle arrays back for CANDIDATE pairs only --
    the same verify-stage cost profile as dedup_minhash_near itself."""
    # materialize-once: the shingle relation feeds candidate generation
    # AND the exact-verify joins; without the persist each consumer
    # re-tokenizes the corpus (measured 4-6 planned document scans).
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    sig = _minhash_sig(sh)
    # r14: barrier so the 32-perm fold runs once, not once per join side
    bands = _band_entries(sig).localCheckpoint(eager=False)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_id_b"), F.col("sig").alias("sig_b"))
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, m) -> acc + m)"
    ) / F.size("sig_a")
    ja = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    jb = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .join(ja, "doc_id_a")
        .join(jb, "doc_id_b")
        .withColumn("exact_jaccard", F.round(inter / union, 6))
        .select(
            "doc_id_a",
            "doc_id_b",
            "est_jaccard",
            "exact_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("doc_id_a", "doc_id_b")
    )


@register(
    "dedup_family_size_dist",
    tags=("dedup", "agg"),
    oracle="""
    WITH f AS (
      SELECT md5(substr(text, 1, 100)) AS h,
             CAST(count(*) AS BIGINT) AS family_size
      FROM documents GROUP BY 1
    )
    SELECT family_size,
           CAST(count(*) AS BIGINT) AS n_families,
           CAST(family_size * count(*) AS BIGINT) AS n_docs
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def dedup_family_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint family-size histogram: group documents by the
    digest of their first 100 characters (the crawl-dedup trick that
    catches boilerplate openings and templated mirrors exact hashing
    misses), then count families at each size -- the one-glance answer to
    'how duplicated is this crawl?' (size-1 families are unique docs; the
    tail is what prefix-level dedup would collapse). Both engines digest
    with standard MD5 over the identical UTF-8 prefix, so family keys
    agree exactly.

    Scale: the fact table shuffles DIGESTS (16 bytes), never text -- the
    substr+md5 projects map-side; two stacked partial aggs end
    |sizes|-state."""
    d = load_table(spark, sf_dir, "documents")
    f = d.groupBy(F.md5(F.substring(F.col("text"), 1, 100)).alias("h")).agg(
        F.count("*").cast("bigint").alias("family_size")
    )
    return (
        f.groupBy("family_size")
        .agg(F.count("*").cast("bigint").alias("n_families"))
        .select(
            "family_size",
            "n_families",
            (F.col("family_size") * F.col("n_families")).cast("bigint").alias("n_docs"),
        )
        .orderBy("family_size")
    )


@register(
    "dedup_embedding_clusters",
    tags=("dedup", "similarity", "northstar"),
    oracle="""
    WITH RECURSIVE near AS (
      SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
            >= 0.35
    ),
    edges AS (
      SELECT vec_id_a AS s, vec_id_b AS d FROM near
      UNION
      SELECT vec_id_b, vec_id_a FROM near
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, least(s, min(d)) AS cluster_id
    FROM reach GROUP BY s
    """,
)
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate CLUSTERS: connected components over the
    >=0.35-cosine embedding pair graph (``dedup_embedding_cosine``'s
    pairs), each vector labeled with its component's min id -- the
    embedding-space twin of ``dedup_cluster``, and the grain a semantic
    dedup pass actually deletes at (keep one representative per cluster,
    not per pair). Same min-label-propagation engine, same recursive-CTE
    transitive-closure oracle; the blocked (label-bounded) pair join is
    the IVF-cell analogue that keeps the graph build corpus-linear."""
    pairs = dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_id_a").alias("doc_id_a"), F.col("vec_id_b").alias("doc_id_b")
    )
    return connected_components(pairs)


@register(
    "dedup_cluster_stats",
    tags=("dedup", "agg", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , near AS (
      SELECT doc_id_a, doc_id_b FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    ),
    edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM near
      UNION
      SELECT doc_id_b, doc_id_a FROM near
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (
      SELECT s AS doc_id, least(s, min(d)) AS cluster_id
      FROM reach GROUP BY s
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS corpus_docs FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS docs_in_clusters,
           CAST(sum(cluster_size - 1) AS BIGINT) AS dupes_removable,
           CAST(max(cluster_size) AS BIGINT) AS max_cluster_size,
           round(CAST(sum(cluster_size - 1) AS DOUBLE) / min(t.corpus_docs), 6)
             AS corpus_shrink_frac
    FROM sizes CROSS JOIN tot t
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup savings headline: how many near-dup clusters exist, how
    many documents they cover, how many deletions keep-one-per-cluster
    yields, the biggest cluster (the boilerplate-family tripwire), and the
    corpus shrink fraction -- the one-row report a dedup run ends with,
    and the number that decides whether the pass pays for itself at
    100 TB. Composes the iterative component labeling
    (``dedup_cluster``'s min-label propagation) with a |clusters|-grain
    rollup; the oracle recomputes components via the recursive-CTE
    transitive closure.

    Scale: everything after the (bounded) component step is dim-scale."""
    comp = dedup_cluster(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    tot = load_table(spark, sf_dir, "documents").agg(
        F.count("*").cast("bigint").alias("corpus_docs")
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("docs_in_clusters"),
            F.sum(F.col("cluster_size") - 1).cast("bigint").alias("dupes_removable"),
            F.max("cluster_size").cast("bigint").alias("max_cluster_size"),
            F.round(
                F.sum(F.col("cluster_size") - 1).cast("double")
                / F.min("corpus_docs"),
                6,
            ).alias("corpus_shrink_frac"),
        )
    )


@register(
    "dedup_fuzzy_names",
    tags=("dedup", "text"),
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM n a JOIN n b
      ON substr(a.p_name, 1, 3) = substr(b.p_name, 1, 3)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY edit_dist, name_a, name_b
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over the NAME DICTIONARY: candidate pairs of
    distinct part names within edit distance 3, generated by 3-character
    prefix blocking -- the entity-resolution shape (catalog merge, vendor
    master dedup) where you never edit-distance the cross product: the
    dictionary reduces first (64 names here, |distinct names| << |rows|
    always), blocking bounds the pair space, and the O(len^2) distance
    runs only on block survivors. Both engines compute the identical
    classic Levenshtein.

    Scale: distinct-reduce (the only fact-table pass) -> prefix-keyed
    equi-join on the tiny dictionary -> JVM levenshtein on candidates.
    At a billion rows the dictionary is still ~vocabulary-sized; for
    dictionaries that are themselves huge, swap prefix blocks for the
    q-gram LSH the MinHash ops use."""
    n = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = n.select(F.col("p_name").alias("name_a"))
    b = n.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 3) == F.substring("name_b", 1, 3))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("edit_dist") <= 3)
        .orderBy("edit_dist", "name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Round-7 additions: multi-signal dedup diagnostics (X77). The LLM-curation
# questions these answer: do text and embedding signals AGREE on what is a
# duplicate; which member of a family should survive; what does dedup
# actually buy in tokens; and where should the jaccard threshold sit.
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "dedup_semantic_minhash_union",
    tags=("dedup", "similarity", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD_CAPPED
    + f"""
    , j AS (
      SELECT doc_id_a, doc_id_b,
             round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard,
             CAST(c AS DOUBLE) / (na + nb - c) >= 0.8 AS is_text
      FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
    )
    SELECT j.doc_id_a, j.doc_id_b, j.jaccard,
           round({_COS}, 6) AS cosine,
           CASE WHEN j.is_text AND {_COS} >= 0.35 THEN 'both'
                WHEN j.is_text THEN 'text_only'
                WHEN {_COS} >= 0.35 THEN 'embedding_only'
                ELSE 'neither' END AS verdict
    FROM j
    JOIN embeddings a ON a.vec_id = j.doc_id_a
    JOIN embeddings b ON b.vec_id = j.doc_id_b
    WHERE sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(a.embedding AS DOUBLE[]))) > 0
      AND isfinite(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(a.embedding AS DOUBLE[]))))
      AND sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[]))) > 0
      AND isfinite(sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))))
    """,
)
def dedup_semantic_minhash_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-AND-embedding agreement dedup: every shingle-blocked candidate
    pair (exact n-gram jaccard >= 0.5, the dedup_ngram_jaccard universe)
    scored on BOTH signals -- lexical jaccard and embedding cosine -- and
    labeled both / text_only / embedding_only / neither. The curation
    decision this feeds: 'text_only' pairs are templated boilerplate
    (same words, different meaning-bearing content), 'embedding_only'
    pairs are paraphrases lexical dedup misses, 'both' is safe to drop.

    Scale: the pair space is the DF-capped shingle equi-join's
    (_capped_exact_pairs: bounded at |shingles| x JACCARD_DF_CAP², never
    N^2 and never df² on a boilerplate shingle); the two embedding
    lookups are |pairs| broadcast-joins against the vectors relation;
    cosines are JVM array folds on the pair rows only."""
    from .similarity import _vectors

    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)  # both join sides
    pairs = _capped_exact_pairs(sh)
    jacc = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    j = pairs.withColumn("jaccard_raw", jacc).filter(F.col("jaccard_raw") >= 0.5)

    vec = _vectors(spark, sf_dir).select("vec_id", "v", "nrm")
    va = vec.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("va"), F.col("nrm").alias("na_")
    )
    vb = vec.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("vb"), F.col("nrm").alias("nb_")
    )
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cos = dot / (F.col("na_") * F.col("nb_"))
    return (
        j.join(va, j.doc_id_a == va.a_id)
        .join(vb, j.doc_id_b == vb.b_id)
        .withColumn("cosine_raw", cos)
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round("jaccard_raw", 6).alias("jaccard"),
            F.round("cosine_raw", 6).alias("cosine"),
            F.when(
                (F.col("jaccard_raw") >= 0.8) & (F.col("cosine_raw") >= 0.35), "both"
            )
            .when(F.col("jaccard_raw") >= 0.8, "text_only")
            .when(F.col("cosine_raw") >= 0.35, "embedding_only")
            .otherwise("neither")
            .alias("verdict"),
        )
    )


@register(
    "docs_dedup_survivorship_quality",
    tags=("dedup", "quality", "northstar"),
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
             CAST(CASE WHEN sum(c) BETWEEN 10 AND 100000
                        AND CAST(sum(l * c) AS DOUBLE) / sum(c) BETWEEN 2 AND 10
                        AND CAST(count(*) AS DOUBLE) / sum(c) > 0.2
                        AND CAST(max(c) AS DOUBLE) / sum(c) < 0.3
                   THEN 1 ELSE 0 END AS INT) AS keep
      FROM per_tok GROUP BY doc_id
    ),
    fam AS (
      SELECT d.doc_id, md5(substr(d.text, 1, 100)) AS family_h,
             coalesce(p.n_tokens, 0) AS n_tokens, coalesce(p.keep, 0) AS keep
      FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY family_h
               ORDER BY keep DESC, n_tokens DESC, doc_id ASC
             ) AS rn,
             CAST(count(*) OVER (PARTITION BY family_h) AS BIGINT) AS family_size
      FROM fam
    )
    SELECT family_h, family_size,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_doc_id,
           CAST(max(CASE WHEN rn = 1 THEN keep END) AS INT) AS survivor_keep,
           CAST(sum(keep) AS BIGINT) AS n_quality_pass,
           CAST(max(CASE WHEN rn = 1 THEN n_tokens END) AS BIGINT) AS tokens_kept,
           CAST(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_dropped
    FROM ranked
    WHERE family_size >= 2
    GROUP BY family_h, family_size
    """,
)
def docs_dedup_survivorship_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor pick: within each prefix-fingerprint dup
    family (the dedup_family_size_dist grouping, size >= 2), the survivor
    is the member that PASSES the Gopher gate, then the longest, then the
    lowest doc_id -- instead of the naive min-doc_id pick that can keep a
    truncated or mashed copy and drop the clean one. Per family: the
    survivor, whether it passes quality, how many members pass, and the
    token cost of the drop.

    Scale: families shuffle 16-byte digests; the quality join is the
    gopher per-doc aggregate (vocabulary-bounded); the in-family ranking
    windows over family-sized groups."""
    from pyspark.sql import Window

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
    q = per_doc.select("doc_id", "n_tokens", keep.alias("keep"))

    fam = (
        d.select("doc_id", F.md5(F.substring("text", 1, 100)).alias("family_h"))
        .join(q, "doc_id", "left")
        .select(
            "doc_id",
            "family_h",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("keep", F.lit(0)).alias("keep"),
        )
    )
    w = Window.partitionBy("family_h").orderBy(
        F.col("keep").desc(), F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    ranked = fam.withColumn("rn", F.row_number().over(w)).withColumn(
        "family_size", F.count("*").over(Window.partitionBy("family_h"))
    )
    return (
        ranked.filter(F.col("family_size") >= 2)
        .groupBy("family_h", F.col("family_size").cast("bigint").alias("family_size"))
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("survivor_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("keep")))
            .cast("int")
            .alias("survivor_keep"),
            F.sum("keep").cast("bigint").alias("n_quality_pass"),
            F.max(F.when(F.col("rn") == 1, F.col("n_tokens")))
            .cast("bigint")
            .alias("tokens_kept"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_dropped"),
        )
    )


@register(
    "docs_dedup_net_tokens_saved",
    tags=("dedup", "agg"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, sha256(text) AS h,
             CAST(len({TOKENS}) AS BIGINT) AS n_toks
      FROM documents
    ),
    surv AS (
      SELECT h, min(doc_id) AS keep_id FROM t GROUP BY h
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t.n_toks) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN t.doc_id <> s.keep_id THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_docs,
           CAST(sum(CASE WHEN t.doc_id <> s.keep_id THEN t.n_toks ELSE 0 END) AS BIGINT)
             AS dropped_tokens,
           round(CAST(sum(CASE WHEN t.doc_id <> s.keep_id THEN t.n_toks ELSE 0 END) AS DOUBLE)
                 / greatest(sum(t.n_toks), 1), 6) AS pct_tokens_saved
    FROM t JOIN surv s ON t.h = s.h
    GROUP BY t.source
    """,
)
def docs_dedup_net_tokens_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup buys, in the currency that matters for a training
    corpus: tokens. Per source, the docs and tokens that would be dropped
    by content-hash dedup (min-doc_id survivor, the dedup_exact rule) and
    the fraction of the source's token budget that saves.

    Scale: the only shuffle moves 32-byte digests + a long per row; the
    survivor map is |families| rows joined back by digest."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.sha2(F.col("text"), 256).alias("h"),
        F.size(_tokens()).cast("bigint").alias("n_toks"),
    )
    surv = t.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    dropped = F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0)
    dropped_toks = F.when(
        F.col("doc_id") != F.col("keep_id"), F.col("n_toks")
    ).otherwise(F.lit(0))
    return (
        t.join(surv, "h")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.sum(dropped).cast("bigint").alias("dropped_docs"),
            F.sum(dropped_toks).cast("bigint").alias("dropped_tokens"),
            F.round(
                F.sum(dropped_toks).cast("double")
                / F.greatest(F.sum("n_toks"), F.lit(1)),
                6,
            ).alias("pct_tokens_saved"),
        )
    )


@register(
    "docs_near_dup_band_profile",
    tags=("dedup", "agg"),
    oracle=_ORACLE_EXACT_JACCARD_CAPPED
    + """
    , j AS (
      SELECT doc_id_a, doc_id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jac
      FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
    )
    SELECT least(floor(j.jac * 10), 9) / 10 AS band_lo,
           CAST(CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS INT) AS same_source,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM j
    JOIN documents da ON da.doc_id = j.doc_id_a
    JOIN documents db ON db.doc_id = j.doc_id_b
    GROUP BY 1, 2
    """,
)
def docs_near_dup_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where should the near-dup threshold sit: candidate pairs (jaccard
    >= 0.5) histogrammed by jaccard band x same-source flag. A heavy
    same-source 0.9+ band is template boilerplate (dedup aggressively); a
    cross-source 0.5-0.7 mass is syndication (dedup carefully). The
    identical double arithmetic (c/(na+nb-c), floor x10) runs on both
    engines, so band edges agree bit-for-bit.

    Scale: pair space bounded by the DF-capped shingle equi-join
    (_capped_exact_pairs, |shingles| x JACCARD_DF_CAP² worst case); the
    two source lookups broadcast the narrow documents projection; output
    is <= 20 rows forever."""
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)  # both join sides
    pairs = _capped_exact_pairs(sh)
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    j = pairs.withColumn("jac", jac).filter(F.col("jac") >= 0.5)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("src_b"))
    return (
        j.join(F.broadcast(sa), j.doc_id_a == sa.a_id)
        .join(F.broadcast(sb), j.doc_id_b == sb.b_id)
        .groupBy(
            (F.least(F.floor(F.col("jac") * 10), F.lit(9)) / 10).alias("band_lo"),
            # CASE-shaped, not a bare ==: NULL sources must land in the 0
            # bucket on both engines (a raw equality would emit a third
            # NULL group here while the oracle's CASE folds it into ELSE)
            F.when(F.col("src_a") == F.col("src_b"), 1)
            .otherwise(0)
            .cast("int")
            .alias("same_source"),
        )
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


@register(
    "dedup_exact_vs_near_overlap",
    tags=("dedup", "agg"),
    oracle=_ORACLE_EXACT_JACCARD
    + """
    , near AS (
      SELECT doc_id_a, doc_id_b FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    ),
    fam AS (
      SELECT sha256(text) AS h, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    ),
    exact_cnt AS (
      SELECT CAST(coalesce(sum(n * (n - 1) / 2), 0) AS BIGINT) AS exact_pairs
      FROM fam WHERE n >= 2
    ),
    nearx AS (
      SELECT CAST(count(*) AS BIGINT) AS near_pairs,
             CAST(sum(CASE WHEN da.h2 = db.h2 THEN 1 ELSE 0 END) AS BIGINT)
               AS near_and_exact
      FROM near
      JOIN (SELECT doc_id, sha256(text) AS h2 FROM documents) da
        ON da.doc_id = near.doc_id_a
      JOIN (SELECT doc_id, sha256(text) AS h2 FROM documents) db
        ON db.doc_id = near.doc_id_b
    )
    SELECT exact_cnt.exact_pairs, nearx.near_pairs, nearx.near_and_exact,
           CAST(nearx.near_pairs - nearx.near_and_exact AS BIGINT)
             AS near_only_pairs
    FROM exact_cnt, nearx
    """,
)
def dedup_exact_vs_near_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dup adds over exact dedup, in one row: content-hash
    duplicate pairs (sum of C(n,2) over sha families), jaccard>=0.8
    near-dup pairs, their overlap, and the near-ONLY remainder -- the
    marginal value of running the expensive pass. A near_only count of 0
    means exact dedup already catches everything and the minhash stage
    can be skipped for this corpus.

    Scale: exact side shuffles digests; near side is the shingle-blocked
    pair space; the overlap join touches |near_pairs| rows."""
    d = load_table(spark, sf_dir, "documents")
    fam = d.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    ex = fam.filter(F.col("n") >= 2).agg(
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0))
        .cast("bigint")
        .alias("exact_pairs")
    )

    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)  # both join sides
    # r14: barrier the exploded stream too -- the self-join otherwise
    # re-explodes once per side (and can broadcast one full copy)
    exd = sh.select(
        "doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("shingle")
    ).localCheckpoint(eager=False)
    a, b = exd.alias("a"), exd.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count("*").alias("c"), F.first("a.n").alias("na"), F.first("b.n").alias("nb"))
    )
    near = pairs.filter(
        F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.8
    ).select("doc_id_a", "doc_id_b")

    hashes = d.select("doc_id", F.sha2("text", 256).alias("h2"))
    ha = hashes.select(F.col("doc_id").alias("a_id"), F.col("h2").alias("h_a"))
    hb = hashes.select(F.col("doc_id").alias("b_id"), F.col("h2").alias("h_b"))
    nearx = (
        near.join(F.broadcast(ha), near.doc_id_a == ha.a_id)
        .join(F.broadcast(hb), near.doc_id_b == hb.b_id)
        .agg(
            F.count("*").cast("bigint").alias("near_pairs"),
            F.sum(F.when(F.col("h_a") == F.col("h_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("near_and_exact"),
        )
    )
    return ex.crossJoin(F.broadcast(nearx)).select(
        "exact_pairs",
        "near_pairs",
        "near_and_exact",
        (F.col("near_pairs") - F.col("near_and_exact"))
        .cast("bigint")
        .alias("near_only_pairs"),
    )


@register(
    "dedup_lsh_tuning_curve",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD_CAPPED
    + """
    , scored AS (
      SELECT cfg.bands, cfg.rows_per_band,
             CAST(c AS DOUBLE) / (na + nb - c) AS s,
             round(1 - pow(1 - pow(CAST(c AS DOUBLE) / (na + nb - c), cfg.rows_per_band), cfg.bands), 6) AS p
      FROM pairs, (VALUES (64, 2), (32, 4), (16, 8), (8, 16)) AS cfg(bands, rows_per_band)
    )
    SELECT CAST(bands AS INT) AS bands, CAST(rows_per_band AS INT) AS rows_per_band,
           CAST(count(*) AS BIGINT) AS n_pairs_scored,
           round(CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE), 6) AS expected_candidates,
           round(CAST(avg(CASE WHEN s >= 0.8 THEN CAST(p AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS expected_recall_at_08
    FROM scored GROUP BY 1, 2
    """,
)
def dedup_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (bands, rows-per-band) planning table for the MinHash-LSH
    family: for each candidate config, the EXPECTED number of candidate
    pairs and the expected recall among true near-dups (jaccard >= 0.8),
    computed analytically from the S-curve P(candidate) = 1-(1-s^r)^b
    (Leskovec/Rajaraman/Ullman, MMDS ch. 3) over the corpus's OWN exact-
    jaccard pair distribution -- not a simulation, so the numbers are
    deterministic and oracle-twinnable. This is how you pick b x r
    before paying for a signature pass at 100 TB: on the fixture,
    (64, 2) buys nothing over (32, 4) except 4x the candidate
    verifications (101 vs 25 expected), while (8, 16) drops recall to
    0.991 -- the curve makes the knee visible. dedup_lsh_bucket_stats
    audits the chosen config's ACTUAL buckets after the fact; this op
    chooses the config.

    Scale: rides the identical DF-capped pair space as
    dedup_ngram_jaccard (_capped_exact_pairs: bounded at |shingles| x
    JACCARD_DF_CAP², never df² on a boilerplate shingle, never N^2 --
    this matters doubly here because the tuning curve is the op you run
    FIRST on a new corpus, before any dedup has pruned it); the x4
    config explode happens on (s)-scalar pair rows, and each per-pair
    probability snaps to 6dp DECIMAL before the accumulation-order-free
    sum. The cap biases the curve's pair distribution away from
    boilerplate-only pairs -- exactly the pairs banded MinHash would
    also treat via its own bucket-size limits."""
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    return _lsh_curve(sh)


def _lsh_curve(sh: DataFrame) -> DataFrame:
    """The analytic (bands, rows_per_band) S-curve table over the
    DF-capped exact-jaccard pair distribution -- shared by the registered
    planning op ``dedup_lsh_tuning_curve`` and the consumer
    ``dedup_minhash_tuned`` (which picks the knee config from it)."""
    pairs = _capped_exact_pairs(sh)
    s = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    cfg = F.explode(
        F.expr(
            "array(struct(64 as bands, 2 as rows_per_band),"
            " struct(32 as bands, 4 as rows_per_band),"
            " struct(16 as bands, 8 as rows_per_band),"
            " struct(8 as bands, 16 as rows_per_band))"
        )
    ).alias("cfg")
    scored = (
        pairs.select(s.alias("s"))
        .select("s", cfg)
        .select(
            F.col("cfg.bands").alias("bands"),
            F.col("cfg.rows_per_band").alias("rows_per_band"),
            "s",
            F.round(
                1
                - F.pow(
                    1 - F.pow(F.col("s"), F.col("cfg.rows_per_band")),
                    F.col("cfg.bands"),
                ),
                6,
            ).alias("p"),
        )
    )
    return scored.groupBy("bands", "rows_per_band").agg(
        F.count("*").cast("bigint").alias("n_pairs_scored"),
        F.round(F.sum(F.col("p").cast("decimal(18,6)")).cast("double"), 6).alias(
            "expected_candidates"
        ),
        F.round(
            F.avg(F.when(F.col("s") >= 0.8, F.col("p").cast("decimal(18,6)"))).cast(
                "double"
            ),
            6,
        ).alias("expected_recall_at_08"),
    )


# Recall floor for the tuned-config knee pick: among curve configs whose
# expected recall at the 0.8 threshold meets this, take the one with the
# fewest expected candidate verifications (ties broken by fewer bands =
# cheaper signature). 0.999 is the MMDS-style "miss at most 1 in 1000 true
# pairs analytically" bar; the fixture's true pairs all sit at J >= 0.89
# where every qualifying config's per-pair catch probability is >= 0.9996.
TUNED_RECALL_FLOOR = 0.999


def _pick_knee_config(curve_rows) -> tuple[int, int] | None:
    """Knee selection over collected curve rows: cheapest qualifying
    config, deterministic tie-break. Returns None when NO config
    qualifies (then the caller must return an empty result -- mirrored by
    the oracle's empty `chosen` CTE)."""
    ok = [
        r
        for r in curve_rows
        if r["expected_recall_at_08"] is not None
        and r["expected_recall_at_08"] >= TUNED_RECALL_FLOOR
    ]
    if not ok:
        return None
    best = min(ok, key=lambda r: (r["expected_candidates"], r["bands"]))
    return int(best["bands"]), int(best["rows_per_band"])


@register(
    "dedup_minhash_tuned",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD
    + f"""
    , okc AS (
      SELECT shingle FROM ex GROUP BY 1 HAVING count(*) <= {JACCARD_DF_CAP}
    ),
    excc AS (
      SELECT ex.doc_id, ex.shingle FROM ex JOIN okc USING (shingle)
    ),
    candc AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM excc a JOIN excc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    cpairs AS (
      SELECT candc.doc_id_a, candc.doc_id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS c,
             len(sa.shingles) AS na, len(sb.shingles) AS nb
      FROM candc
      JOIN sh sa ON sa.doc_id = candc.doc_id_a
      JOIN sh sb ON sb.doc_id = candc.doc_id_b
    ),
    scored AS (
      SELECT cfg.bands, cfg.rows_per_band,
             CAST(c AS DOUBLE) / (na + nb - c) AS s,
             round(1 - pow(1 - pow(CAST(c AS DOUBLE) / (na + nb - c), cfg.rows_per_band), cfg.bands), 6) AS p
      FROM cpairs, (VALUES (64, 2), (32, 4), (16, 8), (8, 16)) AS cfg(bands, rows_per_band)
    ),
    curve AS (
      SELECT bands, rows_per_band,
             round(CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE), 6) AS expected_candidates,
             round(CAST(avg(CASE WHEN s >= 0.8 THEN CAST(p AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS expected_recall_at_08
      FROM scored GROUP BY 1, 2
    ),
    chosen AS (
      SELECT CAST(bands AS INT) AS bands, CAST(rows_per_band AS INT) AS rows_per_band
      FROM curve WHERE expected_recall_at_08 >= {TUNED_RECALL_FLOOR}
      ORDER BY expected_candidates, bands LIMIT 1
    )
    SELECT p.doc_id_a, p.doc_id_b,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard,
           chosen.bands, chosen.rows_per_band
    FROM pairs p, chosen
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    """,
)
def dedup_minhash_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curve-TUNED MinHash near-dup pairs: the planner
    (``dedup_lsh_tuning_curve``) feeding the detector -- close the loop
    the verdict asked for. Computes the analytic S-curve over the
    corpus's own (DF-capped) exact-jaccard pair distribution, picks the
    KNEE config (expected recall at J>=0.8 of at least
    ``TUNED_RECALL_FLOOR``, then minimum expected candidate
    verifications, ties to fewer bands), and runs the banded MinHash
    pipeline with that config. Output carries the chosen (bands,
    rows_per_band) so downstream audits know which operating point paid
    for the pairs.

    On the fixture the knee is (16, 8): same ~25 expected candidate
    verifications as (32, 4) but recall 0.999995 vs the naive
    max-recall pick (64, 2) which pays 4x the candidates (101) for
    nothing -- exactly the trade the curve exists to expose.

    Scale: the curve rides the DF-capped pair space (bounded at
    |shingles| x JACCARD_DF_CAP², never df²); its 4-row result is the
    ONLY driver-side collect (bounded by the config list, not the data).
    The tuned detection pass then has dedup_minhash_near's posture:
    signatures fold JVM-side, candidates shuffle 24-byte band tuples,
    exact verification touches candidate pairs only. At 100 TB you run
    the curve on a hash-sampled slice and reuse the chosen config for
    the full corpus -- the knee is a property of the similarity
    distribution, not the corpus size."""
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    # bounded collect: exactly one row per candidate config (4), analytic
    curve_rows = _lsh_curve(sh).collect()
    knee = _pick_knee_config(curve_rows)
    if knee is None:
        # no qualifying config => the oracle's `chosen` CTE is empty and
        # its final cross join yields no rows; mirror with an empty result
        schema = "doc_id_a bigint, doc_id_b bigint, jaccard double, bands int, rows_per_band int"
        return spark.createDataFrame([], schema)
    bands, rows_per_band = knee
    return _banded_near_pairs(sh, bands, rows_per_band, 0.8).select(
        "doc_id_a",
        "doc_id_b",
        "jaccard",
        F.lit(bands).cast("int").alias("bands"),
        F.lit(rows_per_band).cast("int").alias("rows_per_band"),
    )


@register(
    "dedup_exact_substring_runs",
    tags=("dedup", "northstar", "curation"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    pos AS (
      SELECT doc_id, toks,
             unnest(range(1, len(toks) - 6)) AS p
      FROM toks WHERE len(toks) >= 8
    ),
    sh AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(toks[p:p+7], ' ')) AS h
      FROM pos
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    dp AS (
      SELECT s.doc_id, s.p,
             CASE WHEN s.p - lag(s.p) OVER (PARTITION BY s.doc_id ORDER BY s.p) > 8
                       OR lag(s.p) OVER (PARTITION BY s.doc_id ORDER BY s.p) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM sh s JOIN dup USING (h)
    ),
    isl AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM dp
    ),
    runs AS (
      SELECT doc_id, island,
             CAST(max(p) - min(p) + 8 AS BIGINT) AS span,
             CAST(count(*) AS BIGINT) AS n_pos
      FROM isl GROUP BY 1, 2
    ),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_runs,
             CAST(sum(span) AS BIGINT) AS dup_token_span,
             CAST(sum(n_pos) AS BIGINT) AS n_dup_positions
      FROM runs GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(per.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
           CAST(coalesce(per.n_runs, 0) AS BIGINT) AS n_runs,
           CAST(coalesce(per.dup_token_span, 0) AS BIGINT) AS dup_token_span,
           round(CAST(coalesce(per.dup_token_span, 0) AS DOUBLE)
                 / nullif(len(t.toks), 0), 6) AS dup_share
    FROM toks t LEFT JOIN per ON t.doc_id = per.doc_id
    ORDER BY t.doc_id
    """,
)
def dedup_exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile per document, suffix-array-free:
    every 8-token shingle POSITION whose shingle text recurs in >= 2
    distinct documents is a duplicated position; consecutive duplicated
    positions merge into maximal runs (interval union of [p, p+7] spans),
    and each document reports its duplicated-token span and share -- the
    per-document form of Lee et al. 2022's exact-substring dedup
    ('Deduplicating Training Data Makes Language Models Better' uses
    50-token matches via suffix arrays; sorted shingle runs recover the
    same maximal-match spans at k-gram resolution with plain dataflow).
    dedup_lines profiles LINE-grain copying, MinHash estimates WHOLE-doc
    similarity; this finds the copied PASSAGES inside otherwise-unique
    docs -- what you trim rather than drop.

    Exactness: positions are exact integers; the duplicate vocabulary is
    keyed on md5 digests (identical both engines); run spans come from
    the islands construction (break when the next duplicated position
    starts past the previous interval's end, p_next - p_prev > 8), so the
    span is the exact interval-union length, over-count-free even when
    runs overlap mid-shingle.

    Scale: the shingle shuffle carries (digest, doc_id, pos) -- 16-byte
    hashes, never text (the dedup-family discipline); the duplicate
    vocabulary reduces by digest before the semi-join back; per-doc
    windows run at duplicated-position grain, bounded by document
    length."""
    d = spread(load_table(spark, sf_dir, "documents"))
    k = 8
    toks = d.select("doc_id", _tokens().alias("toks")).localCheckpoint(eager=False)
    grams = F.when(
        F.size("toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (k - 1)),
            lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = toks.select(
        "doc_id", F.posexplode(grams).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("p"), "h")
    sh = sh.localCheckpoint(eager=False)  # dup vocab + join-back reuse it
    dup = sh.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    ).filter(F.col("nd") >= 2).select("h")
    wp = Window.partitionBy("doc_id").orderBy("p")
    dp = (
        sh.join(dup, "h", "left_semi")
        .withColumn("prev", F.lag("p").over(wp))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("p") - F.col("prev") > k), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    runs = dp.groupBy("doc_id", "island").agg(
        (F.max("p") - F.min("p") + k).cast("bigint").alias("span"),
        F.count("*").cast("bigint").alias("n_pos"),
    )
    per = runs.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_runs"),
        F.sum("span").cast("bigint").alias("dup_token_span"),
        F.sum("n_pos").cast("bigint").alias("n_dup_positions"),
    )
    return (
        toks.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_positions", F.lit(0)).cast("bigint").alias("n_dup_positions"),
            F.coalesce("n_runs", F.lit(0)).cast("bigint").alias("n_runs"),
            F.coalesce("dup_token_span", F.lit(0)).cast("bigint").alias("dup_token_span"),
            F.round(
                F.coalesce("dup_token_span", F.lit(0)).cast("double")
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                6,
            ).alias("dup_share"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_cluster_profile",
    tags=("dedup", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , near AS (
      SELECT doc_id_a, doc_id_b FROM pairs
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    ),
    edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM near
      UNION
      SELECT doc_id_b, doc_id_a FROM near
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (
      SELECT s AS doc_id, least(s, min(d)) AS cluster_id
      FROM reach GROUP BY s
    )
    SELECT c.cluster_id,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(min(d.doc_id) AS BIGINT) AS canonical_doc,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           CAST(min(coalesce(d.n_chars, 0)) AS BIGINT) AS min_chars,
           CAST(max(coalesce(d.n_chars, 0)) AS BIGINT) AS max_chars,
           CAST(sum(coalesce(d.n_chars, 0))
                - arg_min(coalesce(d.n_chars, 0), d.doc_id) AS BIGINT)
             AS chars_removable
    FROM comp c JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.cluster_id
    ORDER BY cluster_size DESC, cluster_id
    """,
)
def dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster near-dup summarization panel -- the drill-down behind
    ``dedup_cluster_stats``' one-row headline: for every near-dup family,
    its size, the keep-one canonical (min doc_id, the ``dedup_canonical``
    policy), how many sources and languages the family spans (cross-source
    families are syndication/boilerplate; single-source families are
    re-crawls), the char-length span inside the family, and the bytes a
    keep-canonical deletion recovers. This is the review table a dedup
    run's owner reads before approving the deletion list.

    Exactness: every column is integer arithmetic over exact counts and
    char totals (NULL char counts coalesce to 0 on both sides);
    keep-cost uses arg_min/min_by on the unique doc_id, so no ties.

    Scale: composes the iterative min-label components (bounded rounds,
    one (vertex, label) shuffle each) with ONE doc_id-keyed join against
    the documents relation and a |clusters|-grain agg; the recursive-CTE
    transitive closure lives only in the oracle."""
    comp = dedup_cluster(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.coalesce("n_chars", F.lit(0)).alias("nc")
    )
    return (
        comp.join(d, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("cluster_size"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("nc").cast("bigint").alias("min_chars"),
            F.max("nc").cast("bigint").alias("max_chars"),
            (F.sum("nc") - F.min_by("nc", "doc_id")).cast("bigint").alias(
                "chars_removable"
            ),
        )
        .orderBy(F.col("cluster_size").desc(), "cluster_id")
    )


def _shingle_sql(k: int) -> str:
    """DuckDB k-gram shingle CTE body for shingle size ``k`` (1-based
    inclusive list slicing, the _ORACLE_EXACT_JACCARD convention)."""
    return (
        f"SELECT doc_id, list_distinct(list_transform("
        f"range(1, len(toks) - {k} + 2), "
        f"i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS shingles "
        f"FROM toks WHERE len(toks) >= {k}"
    )


@register(
    "dedup_shingle_selectivity_curve",
    tags=("dedup", "northstar", "monitor"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS} AS toks FROM documents
    ),
    {", ".join(
        f'''sh{k} AS ({_shingle_sql(k)}),
    ex{k} AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh{k}),
    dfr{k} AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
               FROM ex{k} GROUP BY 1),
    m{k} AS (
      SELECT CAST({k} AS BIGINT) AS shingle_k,
             CAST(count(*) AS BIGINT) AS n_distinct_shingles,
             CAST(sum(df) AS BIGINT) AS n_doc_shingle_pairs,
             CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_shingles,
             round(CAST(sum(df) AS DOUBLE) / nullif(count(*), 0), 6)
               AS avg_docs_per_shingle
      FROM dfr{k}
    ),
    sd{k} AS (
      SELECT CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_docs_sharing
      FROM ex{k} e JOIN dfr{k} d ON e.shingle = d.shingle AND d.df >= 2
    ),
    tt{k} AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM sh{k})'''
        for k in (3, 5, 8)
    )}
    SELECT * FROM (
      {" UNION ALL ".join(
        f'''SELECT m{k}.shingle_k, m{k}.n_distinct_shingles,
               m{k}.n_doc_shingle_pairs, m{k}.n_shared_shingles,
               m{k}.avg_docs_per_shingle,
               round(CAST(sd{k}.n_docs_sharing AS DOUBLE)
                     / nullif(tt{k}.n_docs, 0), 6) AS share_docs_sharing
        FROM m{k}, sd{k}, tt{k}'''
        for k in (3, 5, 8)
      )}
    ) ORDER BY shingle_k
    """,
)
def dedup_shingle_selectivity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-size selectivity curve at k = 3, 5, 8 word-grams: distinct
    shingles, (doc, shingle) postings, shingles shared by >= 2 docs, the
    mean docs-per-shingle collision rate, and the share of shingled docs
    touching any shared shingle. This is the knob the near-dup family's
    FIRST parameter rides on: small k over-collides (false candidate
    pairs explode -- the pair space is sum over shingles of df^2), large
    k under-recalls (one edit breaks every overlapping shingle);
    dedup_lsh_tuning_curve picks (bands, rows) AFTER this picks k.

    Exactness: every column is an exact integer count over per-doc
    DISTINCT shingle sets (identical construction both engines); the
    two ratios divide exact integers once at 6dp, NULL-guarded on empty
    corpora.

    Scale: per k, one (doc, shingle)-grain partial agg and one
    shingle-grain agg -- identical shape to the production MinHash path
    (documents never pair with each other here; df-grain stats are what
    PREDICT the pair blowup before any join runs)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", _tokens().alias("toks")).localCheckpoint(
        eager=False
    )  # three shingle passes consume it
    panels = []
    for k in (3, 5, 8):
        sh = toks.filter(F.size("toks") >= k).select(
            "doc_id", _shingles(F.col("toks"), k).alias("shingles")
        ).localCheckpoint(eager=False)  # ex + doc totals
        ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
        ex = ex.localCheckpoint(eager=False)  # df agg + shared-doc semi join
        dfr = ex.groupBy("shingle").agg(
            F.count("*").cast("bigint").alias("df")
        ).localCheckpoint(eager=False)  # metrics + shared filter
        m = dfr.agg(
            F.lit(k).cast("bigint").alias("shingle_k"),
            F.count("*").cast("bigint").alias("n_distinct_shingles"),
            F.sum("df").cast("bigint").alias("n_doc_shingle_pairs"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_shared_shingles"),
            F.round(
                F.sum("df").cast("double") / F.nullif(F.count("*"), F.lit(0)), 6
            ).alias("avg_docs_per_shingle"),
        )
        sd = (
            ex.join(dfr.filter(F.col("df") >= 2).select("shingle"), "shingle", "left_semi")
            .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs_sharing"))
        )
        tt = sh.agg(F.count("*").cast("bigint").alias("n_docs"))
        panels.append(
            m.crossJoin(sd).crossJoin(tt).select(
                "shingle_k", "n_distinct_shingles", "n_doc_shingle_pairs",
                "n_shared_shingles", "avg_docs_per_shingle",
                F.round(
                    F.col("n_docs_sharing").cast("double")
                    / F.nullif(F.col("n_docs"), F.lit(0)),
                    6,
                ).alias("share_docs_sharing"),
            )
        )
    out = panels[0]
    for p in panels[1:]:
        out = out.unionByName(p)
    return out.orderBy("shingle_k")


@register(
    "dedup_cross_source_matrix",
    tags=("dedup", "northstar"),
    oracle="""
    WITH d AS (
      SELECT sha256(text) AS dig, source
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    fam AS (
      SELECT dig, source, CAST(count(*) AS BIGINT) AS cnt
      FROM d GROUP BY 1, 2
    ),
    big AS (
      SELECT dig FROM fam GROUP BY dig HAVING sum(cnt) > 1
    ),
    f2 AS (SELECT fam.dig, fam.source, fam.cnt FROM fam JOIN big USING (dig)),
    srcs AS (SELECT DISTINCT source FROM d),
    spine AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM srcs a JOIN srcs b ON a.source <= b.source
    ),
    cross_cnt AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_families,
             CAST(sum(a.cnt * b.cnt) AS BIGINT) AS n_doc_pairs
      FROM f2 a JOIN f2 b ON a.dig = b.dig AND a.source < b.source
      GROUP BY 1, 2
    ),
    diag_cnt AS (
      SELECT source AS source_a, source AS source_b,
             CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_families,
             CAST(sum(cnt * (cnt - 1) / 2) AS BIGINT) AS n_doc_pairs
      FROM f2 GROUP BY source
    ),
    cnts AS (SELECT * FROM cross_cnt UNION ALL SELECT * FROM diag_cnt)
    SELECT spine.source_a, spine.source_b,
           CAST(coalesce(cnts.n_families, 0) AS BIGINT) AS n_families,
           CAST(coalesce(cnts.n_doc_pairs, 0) AS BIGINT) AS n_doc_pairs
    FROM spine LEFT JOIN cnts
      ON cnts.source_a = spine.source_a AND cnts.source_b = spine.source_b
    ORDER BY spine.source_a, spine.source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix: for every source pair, how
    many sha256 content families span both (and how many duplicate doc
    PAIRS that implies -- cnt_a x cnt_b across sources, C(cnt, 2)
    within); diagonal rows are within-source duplication. The
    document-level companion to docs_source_vocab_jaccard's
    vocabulary screen: vocabulary overlap says two sources SPEAK alike,
    this says they literally SHIP the same bytes -- the matrix dedup
    planning reads to decide which source to make canonical
    (dataset_split_leakage is the same digest-family evidence cut by
    train/eval split instead of source pair).

    Exactness: pure integer family/pair counting at digest grain.

    Scale: digests, never text, shuffle (the dedup_exact rule); the
    family relation reduces to (digest, source, count) before the
    digest-co-partitioned self-join; |sources|^2 rows out."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    fam = (
        d.select(F.sha2("text", 256).alias("dig"), "source")
        .groupBy("dig", "source")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    tot = fam.groupBy("dig").agg(F.sum("cnt").alias("fam_n"))
    f2 = (
        fam.join(tot.filter(F.col("fam_n") > 1).select("dig"), "dig")
        .localCheckpoint(eager=False)  # cross + diagonal consumers
    )
    a, b = f2.alias("a"), f2.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.dig") == F.col("b.dig"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_families"),
            F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("n_doc_pairs"),
        )
    )
    diag = (
        f2.groupBy(F.col("source").alias("source_a"))
        .agg(
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_families"),
            F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2)
            .cast("bigint")
            .alias("n_doc_pairs"),
        )
        .select(
            "source_a",
            F.col("source_a").alias("source_b"),
            "n_families",
            "n_doc_pairs",
        )
    )
    cnts = cross.unionByName(diag)
    # constant-panel totality (the alpha-DCG lesson): a corpus with NO
    # exact duplicates must still emit the full zero-filled grid, so
    # LEFT-join the counts onto the source-pair spine
    srcs = d.select("source").distinct()
    sa = srcs.select(F.col("source").alias("source_a"))
    sb = srcs.select(F.col("source").alias("source_b"))
    spine = sa.join(F.broadcast(sb), F.col("source_a") <= F.col("source_b"))
    return (
        spine.join(cnts, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce(F.col("n_families"), F.lit(0)).cast("bigint").alias(
                "n_families"
            ),
            F.coalesce(F.col("n_doc_pairs"), F.lit(0)).cast("bigint").alias(
                "n_doc_pairs"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# b-bit minhash eval: P md5-derived permutations (engine-portable, unlike
# the xxhash64 signatures the estimate-quality key is rows-only for),
# b = 1 retained bit per perm.
BBIT_PERMS = 16

_BBIT_DUCK_MINS = ", ".join(
    f"min(('0x' || substr(md5('{p}:' || tok), 1, 15))::BIGINT) AS m{p}"
    for p in range(BBIT_PERMS)
)
_BBIT_DUCK_FULL = " + ".join(
    f"CASE WHEN a.m{p} = b.m{p} THEN 1 ELSE 0 END" for p in range(BBIT_PERMS)
)
_BBIT_DUCK_BIT = " + ".join(
    f"CASE WHEN a.m{p} % 2 = b.m{p} % 2 THEN 1 ELSE 0 END"
    for p in range(BBIT_PERMS)
)


@register(
    "dedup_bbit_minhash_eval",
    tags=("dedup", "monitor"),
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, t.tok
      FROM documents,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
             AS t(tok)
    ),
    sig AS (
      SELECT doc_id, {_BBIT_DUCK_MINS}
      FROM tok GROUP BY doc_id
    ),
    sz AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1
    ),
    pair AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(count(*) AS BIGINT) AS n_int
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok
      GROUP BY 1, 2
    ),
    pj AS (
      SELECT sa.doc_id AS da, sb.doc_id AS db,
             coalesce(p.n_int, 0) AS n_int,
             za.n_tok + zb.n_tok - coalesce(p.n_int, 0) AS n_uni
      FROM sz za JOIN sz zb ON zb.doc_id = za.doc_id + 1
      JOIN sig sa ON sa.doc_id = za.doc_id
      JOIN sig sb ON sb.doc_id = zb.doc_id
      LEFT JOIN pair p ON p.da = za.doc_id AND p.db = zb.doc_id
    ),
    est AS (
      SELECT pj.da, pj.n_int, pj.n_uni,
             CAST(({_BBIT_DUCK_FULL}) AS BIGINT) AS k_full,
             CAST(({_BBIT_DUCK_BIT}) AS BIGINT) AS k_bit
      FROM pj JOIN sig a ON a.doc_id = pj.da JOIN sig b ON b.doc_id = pj.db
    ),
    per AS (
      SELECT least((10 * n_int) // n_uni, 9) AS band,
             CAST(n_int AS DOUBLE) / n_uni AS exact_j,
             CAST(k_full AS DOUBLE) / {BBIT_PERMS} AS est_full,
             greatest(2.0 * k_bit / {BBIT_PERMS} - 1, 0.0) AS est_1bit
      FROM est
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(exact_j AS DECIMAL(20,15))) AS DOUBLE)
                 / count(*), 6) AS avg_exact,
           round(CAST(sum(CAST(est_full AS DECIMAL(20,15))) AS DOUBLE)
                 / count(*), 6) AS avg_est_full,
           round(CAST(sum(CAST(est_1bit AS DECIMAL(20,15))) AS DOUBLE)
                 / count(*), 6) AS avg_est_1bit,
           round(CAST(sum(CAST(abs(est_full - exact_j) AS DECIMAL(20,15)))
                      AS DOUBLE) / count(*), 6) AS mae_full,
           round(CAST(sum(CAST(abs(est_1bit - exact_j) AS DECIMAL(20,15)))
                      AS DOUBLE) / count(*), 6) AS mae_1bit
    FROM per GROUP BY band ORDER BY band
    """,
)
def dedup_bbit_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minhash accuracy panel (Li & Koenig 2010): keep only the
    LOWEST bit of each of BBIT_PERMS=16 minhash permutations and
    estimate Jaccard via the unbiased 1-bit estimator J = 2 * match - 1
    (at b=1 an unrelated pair still matches half its bits by chance --
    the estimator debiases that), side by side with the full-width
    estimator (match share of full min values) and the EXACT token-set
    Jaccard, banded by exact similarity decile over the deterministic
    adjacent-doc-id pair sample. The storage story is the point: 1-bit
    signatures are 64x smaller than 64-bit minhashes, and Li-Koenig
    showed the variance only grows ~2x for the high-similarity pairs
    dedup actually hunts -- this panel shows that tradeoff ON THE
    CORPUS, per band. Unlike dedup_minhash_estimate_quality (rows-only:
    engine-specific xxhash64 signatures), the permutations here are the
    md5-prefix construction both engines compute bit-identically, so
    the whole panel is oracle-checked.

    Exactness: min-hashes are exact integers off the shared 60-bit md5
    prefix; match counts are exact integers over 16 parallel agg
    expressions; exact Jaccard is n_int / n_union off integer set
    sizes; the decile band uses integer cross-multiplication
    ((10 * n_int) DIV n_union), so no pair can change band on a ulp;
    every per-pair double snaps to DECIMAL(20,15) before the band
    means.

    Scale: the token relation folds map-side to |docs| x 16 mins in ONE
    groupBy (the simhash vote shape -- no per-perm explode); the
    adjacent-id pair frame is |docs| rows of narrow signatures; the
    exact-Jaccard join is token-co-partitioned on the distinct token
    relation. 10 rows out."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # signatures + sizes + pair join
    )
    mins = tok.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{p}:"), F.col("tok"))), 1, 15),
                    16,
                    10,
                ).cast("bigint")
            ).alias(f"m{p}")
            for p in range(BBIT_PERMS)
        ]
    ).localCheckpoint(eager=False)  # both sides of the adjacent-pair join
    sz = tok.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_tok"))
    b_tok = tok.select(F.col("doc_id").alias("b_doc"), F.col("tok").alias("b_tok"))
    pair = (
        tok.join(
            b_tok,
            (F.col("b_doc") == F.col("doc_id") + 1)
            & (F.col("b_tok") == F.col("tok")),
        )
        .groupBy(F.col("doc_id").alias("da"), F.col("b_doc").alias("db"))
        .agg(F.count("*").cast("bigint").alias("n_int"))
    )
    za = sz.select(F.col("doc_id").alias("da"), F.col("n_tok").alias("na"))
    zb = sz.select(F.col("doc_id").alias("db"), F.col("n_tok").alias("nb"))
    sa = mins.select(
        F.col("doc_id").alias("da"), *[F.col(f"m{p}").alias(f"a{p}") for p in range(BBIT_PERMS)]
    )
    sb = mins.select(
        F.col("doc_id").alias("db"), *[F.col(f"m{p}").alias(f"b{p}") for p in range(BBIT_PERMS)]
    )
    pj = (
        za.join(zb, F.col("db") == F.col("da") + 1)
        .join(sa, "da")
        .join(sb, "db")
        .join(pair, ["da", "db"], "left")
        .withColumn("n_int", F.coalesce(F.col("n_int"), F.lit(0)))
        .withColumn("n_uni", F.col("na") + F.col("nb") - F.col("n_int"))
    )
    k_full = sum(
        F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        for p in range(BBIT_PERMS)
    ).cast("bigint")
    k_bit = sum(
        F.when(F.col(f"a{p}") % 2 == F.col(f"b{p}") % 2, 1).otherwise(0)
        for p in range(BBIT_PERMS)
    ).cast("bigint")
    per = pj.select(
        F.least(F.expr("(10 * n_int) DIV n_uni"), F.lit(9)).alias("band"),
        (F.col("n_int").cast("double") / F.col("n_uni")).alias("exact_j"),
        (k_full.cast("double") / BBIT_PERMS).alias("est_full"),
        F.greatest(
            2.0 * k_bit.cast("double") / BBIT_PERMS - 1, F.lit(0.0)
        ).alias("est_1bit"),
    )
    dec = lambda c: c.cast("decimal(20,15)")  # noqa: E731
    return (
        per.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.sum(dec(F.col("exact_j"))).cast("double") / F.count("*"), 6).alias("avg_exact"),
            F.round(F.sum(dec(F.col("est_full"))).cast("double") / F.count("*"), 6).alias("avg_est_full"),
            F.round(F.sum(dec(F.col("est_1bit"))).cast("double") / F.count("*"), 6).alias("avg_est_1bit"),
            F.round(
                F.sum(dec(F.abs(F.col("est_full") - F.col("exact_j")))).cast("double")
                / F.count("*"),
                6,
            ).alias("mae_full"),
            F.round(
                F.sum(dec(F.abs(F.col("est_1bit") - F.col("exact_j")))).cast("double")
                / F.count("*"),
                6,
            ).alias("mae_1bit"),
        )
        .orderBy("band")
    )
