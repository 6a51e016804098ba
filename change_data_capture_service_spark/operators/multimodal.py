"""Multimodal columns (SURVEY.md §2.2 X21 + north star): opaque binary
payloads with typed metadata, decode/feature-extract as Arrow-batched
``mapInPandas`` -- the Spark plumbing a 100 TB image/audio/video pipeline
rides on.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features + a clearly-marked ``NotImplementedError``
real path); everything Spark-side -- binary column construction, schema,
partitioning, UDF signature, batch iteration -- is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Import-probe: flips automatically where a real image codec exists. This
# container ships none, so the deterministic fake path runs; deployments
# with Pillow installed get the real decode with no code change.
try:
    import PIL  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except ImportError:
    REAL_DECODERS_AVAILABLE = False


@register(
    "multimodal_join",
    tags=("multimodal", "northstar"),
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           CAST(len(e.embedding) AS INT) AS dim,
           CAST(e.embedding[1] AS DOUBLE) AS first_component
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings: text, categorical, and array<float> columns
    coexisting in one relation -- the mixed-modality row shape."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct -- the storage
    shape for multimodal corpora: payload as ``binary`` (parquet BYTE_ARRAY,
    never parsed by the engine), metadata queryable columns. Here the bytes
    are the utf-8 text (a deterministic stand-in for image bytes)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/fake-image").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_features(
    batches: Iterator[pd.DataFrame], force_fake: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: binary payload -> feature row per doc.

    Real path (taken when Pillow is importable and ``force_fake`` is off):
    decode image bytes, extract pixel features. Fake path (deterministic):
    byte-length + first/last byte + a byte-sum checksum -- enough to prove
    batch shape, schema, and null handling. The fixture-backed registered
    query pins ``force_fake=True`` because its payloads are utf-8 text
    stand-ins, not decodable images."""
    use_real = REAL_DECODERS_AVAILABLE and not force_fake
    for pdf in batches:
        yield (_decode_real if use_real else _decode_fake)(pdf)


def _decode_real(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pillow decode path (same DECODE_SCHEMA as the fake path, derived
    from decoded pixels instead of raw bytes). Unreachable in this
    container (no codec libs -> REAL_DECODERS_AVAILABLE is False); where
    Pillow exists the import-probe flips the flag and this runs with no
    code change."""
    import io

    from PIL import Image

    def feats(b):
        if b is None:
            return (0, -1, -1, -1)
        px = Image.open(io.BytesIO(bytes(b))).convert("L").tobytes()
        if not px:
            return (len(b), -1, -1, -1)
        return (len(b), px[0], px[-1], sum(px) % 1000000007)

    rows = [feats(b) for b in pdf["payload"]]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": [r[0] for r in rows],
            "first_byte": [r[1] for r in rows],
            "last_byte": [r[2] for r in rows],
            "byte_sum_mod": [r[3] for r in rows],
        }
    )


def _decode_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in: byte-length + first/last byte + a byte-sum
    checksum -- enough to prove batch shape, schema, and null handling."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            "first_byte": payloads.map(lambda b: int(b[0]) if b else -1),
            "last_byte": payloads.map(lambda b: int(b[-1]) if b else -1),
            "byte_sum_mod": payloads.map(
                lambda b: int(sum(b) % 1000000007) if b is not None else -1
            ),
        }
    )


DECODE_SCHEMA = "doc_id long, n_bytes int, first_byte int, last_byte int, byte_sum_mod long"


@register(
    "multimodal_extract",
    tags=("multimodal", "northstar"),
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT)
             AS first_byte,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, length(text), 1)) ELSE -1 END AS INT)
             AS last_byte,
           CAST(list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)))
                % 1000000007 AS BIGINT) AS byte_sum_mod
    FROM documents
    WHERE length(text) > 0
    """,
)
def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode/feature-extract pipeline: attach binary payloads, then
    run the Arrow-batched decoder over partitions. The oracle recomputes the
    fake features from the source text (ascii corpus: byte == ascii(char)),
    proving the binary round-trip is lossless."""
    from functools import partial

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # force_fake: fixture payloads are text stand-ins, not decodable images
    return with_binary_payload(docs).mapInPandas(
        partial(decode_features, force_fake=True), DECODE_SCHEMA
    )


@register("multimodal_frame_sample", tags=("multimodal", "northstar"))  # rows-only: synthetic frames
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat each 64-byte
    slice of the payload as a 'frame', emit every 4th frame (stride
    sampling) -- one input row fans out to N frame rows with (doc_id,
    frame_idx, frame_bytes, frame_checksum). The explode happens JVM-side;
    per-frame feature extraction would ride decode_features."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 64)
    payload = with_binary_payload(docs)
    frames = payload.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, CAST(meta.n_bytes / 64 AS INT) - 1),"
                " i -> substring(payload, i * 64 + 1, 64))"
            )
        ).alias("frame_idx", "frame_bytes"),
    ).filter(F.col("frame_idx") % 4 == 0)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame_bytes").alias("frame_len"),
        F.xxhash64("frame_bytes").alias("frame_checksum"),
    )


RESIZE_TARGET = 32  # resized payload width in bytes
RESIZE_SCHEMA = (
    "doc_id long, orig_bytes int, resized_n int, first_byte int, "
    "last_byte int, resized_sum_mod long"
)


def resize_payload(
    batches: Iterator[pd.DataFrame], force_fake: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas resizer: binary payload -> fixed-width payload summary.

    Real path (Pillow importable, ``force_fake`` off): decode, resize to a
    ``RESIZE_TARGET``-wide thumbnail, feature-summarize the pixels. Fake
    path (deterministic, always available): stride-subsample the bytes --
    byte i of the output is input byte ``i * (n // RESIZE_TARGET)`` -- the
    exact arithmetic the oracle replays, so the Arrow round trip is
    provably lossless."""
    use_real = REAL_DECODERS_AVAILABLE and not force_fake
    for pdf in batches:
        yield (_resize_real if use_real else _resize_fake)(pdf)


def _resize_real(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pillow thumbnail path; same RESIZE_SCHEMA from decoded pixels.
    Unreachable in this container (no codecs); flips on automatically via
    the import probe where Pillow exists."""
    import io

    from PIL import Image

    def feats(b):
        if b is None or len(b) < RESIZE_TARGET:
            return (0 if b is None else len(b), -1, -1, -1)
        img = Image.open(io.BytesIO(bytes(b))).convert("L")
        img = img.resize((RESIZE_TARGET, 1))
        px = img.tobytes()
        return (len(b), px[0], px[-1], sum(px) % 1000000007)

    rows = [feats(b) for b in pdf["payload"]]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "orig_bytes": [r[0] for r in rows],
            "resized_n": RESIZE_TARGET,
            "first_byte": [r[1] for r in rows],
            "last_byte": [r[2] for r in rows],
            "resized_sum_mod": [r[3] for r in rows],
        }
    )


def _resize_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    def feats(b):
        b = bytes(b)
        k = len(b) // RESIZE_TARGET
        sampled = [b[i * k] for i in range(RESIZE_TARGET)]
        return (len(b), sampled[0], sampled[-1], sum(sampled) % 1000000007)

    rows = [feats(b) for b in pdf["payload"]]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "orig_bytes": [r[0] for r in rows],
            "resized_n": RESIZE_TARGET,
            "first_byte": [r[1] for r in rows],
            "last_byte": [r[2] for r in rows],
            "resized_sum_mod": [r[3] for r in rows],
        }
    )


@register(
    "multimodal_resize",
    tags=("multimodal", "northstar"),
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS orig_bytes,
           CAST({RESIZE_TARGET} AS INT) AS resized_n,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(ascii(substr(text, 1 + {RESIZE_TARGET - 1} * (length(text) // {RESIZE_TARGET}), 1)) AS INT)
             AS last_byte,
           CAST(list_sum(list_transform(range(0, {RESIZE_TARGET}),
                i -> CAST(ascii(substr(text, 1 + i * (length(text) // {RESIZE_TARGET}), 1)) AS BIGINT)))
                % 1000000007 AS BIGINT) AS resized_sum_mod
    FROM documents
    WHERE length(text) >= {RESIZE_TARGET}
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the multimodal pipeline: fixed-width stride
    subsample of each binary payload through the same Arrow-batched
    ``mapInPandas`` plumbing the real thumbnailer uses (Pillow path behind
    the import probe; deterministic byte path in this container). The
    oracle replays the stride arithmetic over the source text (ascii
    corpus: byte == ascii(char)), so schema, batch shape, and byte-exact
    content are all driver-checkable.

    Scale: embarrassingly parallel -- no shuffle, no state; batch size is
    bounded by Arrow's maxRecordsPerBatch so a partition of 100 MB payloads
    never materializes at once."""
    from functools import partial

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= RESIZE_TARGET
    )
    return with_binary_payload(docs).mapInPandas(
        partial(resize_payload, force_fake=True), RESIZE_SCHEMA
    )


PHASH_BANDS = 4  # 4 x 16-bit bands; pairs agreeing on any band are candidates


def phash64(payloads: pd.Series) -> pd.Series:
    """Difference-hash (dHash) over the first 256 payload bytes: average the
    bytes into an 8x9 grid (the resize step of an image dHash), then emit
    one bit per horizontal neighbor comparison -- 64 bits. On a real image
    the grid is pixel luminance; on the fixture's byte stand-in it is the
    same computation over the same binary column, so the Spark-side
    machinery (vectorized hashing, banding, candidate join, exact verify)
    is exercised end to end. Vectorized numpy; no per-row Python beyond
    the object-dtype unwrap."""
    import numpy as np

    def one(b) -> int:
        if b is None or len(b) == 0:
            return 0
        a = np.frombuffer(bytes(b[:256]), dtype=np.uint8).astype(np.float64)
        cells = np.array_split(a, 72)  # 8 x 9 grid, row-major
        grid = np.array([c.mean() if len(c) else 0.0 for c in cells]).reshape(8, 9)
        bits = (grid[:, 1:] > grid[:, :-1]).ravel()  # 8 x 8 comparisons
        # signed view: Spark longs are int64; the band extraction uses
        # unsigned shifts so the sign bit round-trips losslessly
        return int(np.packbits(bits).view(">i8")[0])

    return payloads.map(one)


@register("multimodal_phash_dedup", tags=("multimodal", "dedup", "northstar"))  # rows-only: perceptual hash has no SQL twin
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over binary payloads: dHash-64
    per payload (Arrow-batched mapInPandas), 4x16-bit band blocking for
    candidates (two hashes within hamming distance 6 of each other agree
    on at least one band with probability ~0.99), exact popcount-hamming
    verification, keep pairs with distance <= 6 -- the image-dedup pass of
    a multimodal curation pipeline, runnable today on the byte stand-in
    and unchanged when a real codec supplies pixel grids.

    Scale: the corpus never all-pairs -- candidates come from the banded
    equi-join on (band_id, band_value), exactly the MinHash-LSH topology
    (``dedup_minhash_near``); the hash relation is 2 longs per doc, and
    hamming verification is JVM-side bit arithmetic on the candidate set
    only."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": phash64(pdf["payload"])})

    hashed = docs.mapInPandas(hash_batches, "doc_id long, phash long")
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_value"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_id", "b.band_value")
    # r14: barrier so the Python dHash pass (mapInPandas over payloads)
    # runs once, not once per self-join side (broadcast and streamed join
    # sides never share an exchange)
    bands = bands.localCheckpoint(eager=False)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 6)
        .select("doc_id_a", "doc_id_b", "hamming")
        .orderBy("doc_id_a", "doc_id_b")
    )


@register(
    "multimodal_size_tiers",
    tags=("multimodal", "agg"),
    oracle="""
    WITH pl AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'text' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents WHERE text IS NOT NULL
    ),
    tiered AS (
      SELECT media_type,
             CAST(CASE WHEN n_bytes < 256 THEN 0
                       WHEN n_bytes < 1024 THEN 1
                       WHEN n_bytes < 4096 THEN 2
                       WHEN n_bytes < 16384 THEN 3
                       ELSE 4 END AS INT) AS tier,
             n_bytes
      FROM pl
    ),
    g AS (SELECT CAST(sum(n_bytes) AS BIGINT) AS tot FROM tiered)
    SELECT media_type, tier,
           CAST(count(*) AS BIGINT) AS n_objects,
           CAST(sum(n_bytes) AS BIGINT) AS bytes,
           CAST(max(n_bytes) AS BIGINT) AS max_bytes,
           round(CAST(sum(n_bytes) AS DOUBLE) / tot, 6) AS storage_share
    FROM tiered CROSS JOIN g
    GROUP BY media_type, tier, tot
    """,
)
def multimodal_size_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage tiering table for a multimodal corpus: object count,
    byte mass, and storage share per (media_type, size tier) with fixed
    power-of-4 tier edges -- the table behind blob-store layout decisions
    (which tiers inline into parquet pages vs externalize to object
    storage; how many row groups a shuffle-free scan of each tier needs).
    The payload is the with_binary_payload stand-in (utf-8 bytes), with a
    deterministic doc_id-keyed media-type assignment, so the PLUMBING --
    binary octet lengths, fixed-edge integer tiering, share-of-total --
    is real and oracle-checked even though the bytes are fakes (the
    decode path's import-probe discipline, applied to storage stats).

    Exactness: byte counts are exact integers; tier edges are integer
    comparisons (no quantile flap); one share division at 6 dp.

    Scale: one pass, partial agg to the (type x 5 tiers) grain; the
    grand total is a broadcast scalar."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pl = d.select(
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("text")).alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )
    tiered = pl.withColumn(
        "tier",
        F.when(F.col("n_bytes") < 256, 0)
        .when(F.col("n_bytes") < 1024, 1)
        .when(F.col("n_bytes") < 4096, 2)
        .when(F.col("n_bytes") < 16384, 3)
        .otherwise(4)
        .cast("int"),
    )
    g = tiered.agg(F.sum("n_bytes").cast("bigint").alias("tot"))
    return (
        tiered.groupBy("media_type", "tier")
        .agg(
            F.count("*").cast("bigint").alias("n_objects"),
            F.sum("n_bytes").cast("bigint").alias("bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "media_type", "tier", "n_objects", "bytes", "max_bytes",
            F.round(F.col("bytes").cast("double") / F.col("tot"), 6).alias(
                "storage_share"
            ),
        )
    )


@register(
    "multimodal_exact_byte_dedup",
    tags=("multimodal", "dedup", "agg"),
    oracle="""
    WITH pl AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'text' END AS media_type,
             md5(text) AS digest,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents WHERE text IS NOT NULL
    ),
    fam AS (
      SELECT media_type, digest,
             CAST(count(*) AS BIGINT) AS copies,
             CAST(min(doc_id) AS BIGINT) AS canonical_doc,
             CAST(max(n_bytes) AS BIGINT) AS n_bytes
      FROM pl GROUP BY 1, 2
    )
    SELECT media_type,
           CAST(count(*) AS BIGINT) AS n_distinct_payloads,
           CAST(sum(copies) AS BIGINT) AS n_objects,
           CAST(sum(copies - 1) AS BIGINT) AS n_redundant,
           CAST(sum((copies - 1) * n_bytes) AS BIGINT) AS reclaimable_bytes,
           round(CAST(sum(copies - 1) AS DOUBLE) / sum(copies), 6)
             AS dup_rate
    FROM fam GROUP BY 1
    """,
)
def multimodal_exact_byte_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-identical payload dedup per media type: content-digest
    grouping, canonical pick (min doc_id), redundant copies, and the
    bytes a content-addressed blob store reclaims -- the EXACT sibling of
    multimodal_phash_dedup (perceptual near-dups need banding; byte dups
    need only a digest groupBy, and they are where most storage actually
    goes in crawled media). Payloads are the with_binary_payload stand-in
    bytes; digests are md5 (engine-portable, the hash_funcs precedent).

    Exactness: counts and byte sums are exact integers off the digest
    grain; one rate division at 6 dp.

    Scale: the shuffle carries (type, digest) -- 16-byte keys, never
    payloads; the family relation is bounded by distinct content. This
    is the map-side-combinable shape dedup_exact documents, applied to
    the binary column."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pl = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("text")).alias("media_type"),
        F.md5(F.encode("text", "UTF-8")).alias("digest"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )
    fam = pl.groupBy("media_type", "digest").agg(
        F.count("*").cast("bigint").alias("copies"),
        F.min("doc_id").cast("bigint").alias("canonical_doc"),
        F.max("n_bytes").cast("bigint").alias("n_bytes"),
    )
    return fam.groupBy("media_type").agg(
        F.count("*").cast("bigint").alias("n_distinct_payloads"),
        F.sum("copies").cast("bigint").alias("n_objects"),
        F.sum(F.col("copies") - 1).cast("bigint").alias("n_redundant"),
        F.sum((F.col("copies") - 1) * F.col("n_bytes")).cast("bigint").alias(
            "reclaimable_bytes"
        ),
        F.round(
            F.sum(F.col("copies") - 1).cast("double") / F.sum("copies"), 6
        ).alias("dup_rate"),
    )


EXIF_SCHEMA = (
    "doc_id long, origin string, width int, height int, orientation int, "
    "has_gps boolean"
)


def extract_exif_like(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas EXIF-style metadata extractor: reads the payload
    HEADER only (first 6 bytes) and emits typed metadata -- the shape of
    a real EXIF/container parse, which never decodes pixel data. The
    field derivations are a deterministic stand-in (this container ships
    no codec libs -- the decode_features contract); a Pillow-equipped
    deployment swaps the body for Image.open(...)._getexif() with the
    same schema and batch shape."""
    for pdf in batches:
        payloads = pdf["payload"]

        def hdr(b):
            if b is None or len(b) < 6:
                return (0, 0, 0, False)
            b = bytes(b)
            return (
                1 + (b[0] * 256 + b[1]) % 4096,
                1 + (b[2] * 256 + b[3]) % 4096,
                b[4] % 8 + 1,
                b[5] % 2 == 1,
            )

        rows = [hdr(b) for b in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "origin": pdf["origin"],
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "orientation": [r[2] for r in rows],
                "has_gps": [r[3] for r in rows],
            }
        )


@register(
    "multimodal_metadata_panel",
    tags=("multimodal", "northstar"),
    oracle="""
    WITH hdr AS (
      SELECT doc_id, source AS origin,
             1 + (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1)))
                 % 4096 AS width,
             1 + (ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1)))
                 % 4096 AS height,
             ascii(substr(text, 5, 1)) % 8 + 1 AS orientation,
             ascii(substr(text, 6, 1)) % 2 = 1 AS has_gps
      FROM documents WHERE octet_length(encode(text)) >= 6
    )
    SELECT origin,
           CAST(count(*) AS BIGINT) AS n_images,
           round(CAST(sum(CAST(width AS DECIMAL(38,0)) * height) AS DOUBLE)
                 / count(*) / 1000000.0, 6) AS avg_megapixels,
           round(CAST(sum(CASE WHEN height > width THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS pct_portrait,
           round(CAST(sum(CASE WHEN has_gps THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS pct_gps,
           CAST(count(DISTINCT orientation) AS BIGINT) AS n_orientations
    FROM hdr GROUP BY origin
    """,
)
def multimodal_metadata_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF-style metadata panel per origin: the Arrow-batched header
    parse (extract_exif_like -- width/height/orientation/GPS from the
    payload header, never the pixel data) aggregated to the corpus-audit
    grain: image counts, mean megapixels, portrait share, GPS share
    (the privacy flag a curation pass strips), orientation variety.
    The round-10 verdict's queue item: multimodal was the thinnest
    north-star family, and this is the first METADATA-grain panel (the
    others profile payload bytes).

    The oracle recomputes the header fields from the source text (ascii
    corpus: byte == ascii(char)), proving the binary round-trip and the
    mapInPandas batch plumbing lossless -- the multimodal_extract
    contract, including its documented ASCII scope (the ENGINE side
    parses payload bytes, the real contract; on multi-byte corpora the
    text-derived oracle diverges by construction, so the unicode parity
    sweep excludes this key like its siblings). All aggregates are integer ratios, pixel products through
    DECIMAL(38,0).

    Scale: the parse reads 6 bytes/row inside one Arrow pass (no shuffle
    before the per-origin partial agg); at 100 TB the payload column
    never moves -- parquet column pruning feeds only (doc_id, payload
    header, origin) to the UDF."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "UTF-8")) >= 6
    )
    payload = with_binary_payload(docs).select(
        "doc_id", "payload", F.col("meta.origin").alias("origin")
    )
    hdr = payload.mapInPandas(extract_exif_like, EXIF_SCHEMA)
    return hdr.groupBy("origin").agg(
        F.count("*").cast("bigint").alias("n_images"),
        F.round(
            F.sum(F.col("width").cast("decimal(38,0)") * F.col("height"))
            .cast("double")
            / F.count("*")
            / 1000000.0,
            6,
        ).alias("avg_megapixels"),
        F.round(
            F.sum(F.when(F.col("height") > F.col("width"), 1).otherwise(0))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("pct_portrait"),
        F.round(
            F.sum(F.when(F.col("has_gps"), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("pct_gps"),
        F.count_distinct("orientation").cast("bigint").alias("n_orientations"),
    )


FRAME_BUDGET = 1000  # total frames a downstream trainer will ingest


@register(
    "multimodal_stratified_frame_budget",
    tags=("multimodal", "curation"),
    oracle=f"""
    WITH fr AS (
      SELECT source AS origin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(octet_length(encode(text)) // 64) AS BIGINT) AS n_frames
      FROM documents
      GROUP BY 1 HAVING sum(octet_length(encode(text)) // 64) > 0
    ),
    tot AS (SELECT CAST(sum(n_frames) AS BIGINT) AS ft FROM fr),
    base AS (
      SELECT fr.origin, fr.n_docs, fr.n_frames,
             ({FRAME_BUDGET} * fr.n_frames) // tot.ft AS alloc0,
             ({FRAME_BUDGET} * fr.n_frames) % tot.ft AS rem
      FROM fr CROSS JOIN tot
    ),
    spare AS (
      SELECT {FRAME_BUDGET} - sum(alloc0) AS r FROM base
    ),
    ranked AS (
      SELECT origin, n_docs, n_frames, alloc0,
             CAST(row_number() OVER (ORDER BY rem DESC, origin) AS BIGINT) AS rk
      FROM base
    )
    SELECT origin, n_docs, n_frames,
           CAST(alloc0 + CASE WHEN rk <= spare.r THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_frames,
           round(CAST(alloc0 + CASE WHEN rk <= spare.r THEN 1 ELSE 0 END
                      AS DOUBLE) / n_frames, 6) AS sampling_rate
    FROM ranked CROSS JOIN spare
    ORDER BY origin
    """,
)
def multimodal_stratified_frame_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified frame-budget allocation: a downstream trainer will
    ingest {FRAME_BUDGET} frames total; each origin stratum gets budget
    proportional to its frame supply (frames = 64-byte payload slices,
    the multimodal_frame_sample grain) by the LARGEST-REMAINDER method
    (Hamilton apportionment): floor allocations first, then the
    leftover +1s go to the largest fractional remainders (origin-asc
    tiebreak). Integer-exact end to end -- no double ever decides an
    allocation, so the budget sums EXACTLY to {FRAME_BUDGET} (the
    property proportional-rounding naively violates). The multimodal
    twin of sample_neyman_allocation: that sizes survey strata by
    variance; this splits a concrete decode budget by supply.

    Scale: per-origin partial agg over payload lengths (column-pruned),
    then dim-grain apportionment arithmetic; nothing fact-sized moves."""
    docs = load_table(spark, sf_dir, "documents")
    fr = (
        docs.groupBy(F.col("source").alias("origin"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.floor(F.octet_length(F.encode("text", "UTF-8")) / 64)
            ).cast("bigint").alias("n_frames"),
        )
        .filter(F.col("n_frames") > 0)
    )
    tot = fr.agg(F.sum("n_frames").cast("bigint").alias("ft"))
    base = fr.crossJoin(F.broadcast(tot)).select(
        "origin",
        "n_docs",
        "n_frames",
        F.expr(f"({FRAME_BUDGET} * n_frames) DIV ft").alias("alloc0"),
        (F.lit(FRAME_BUDGET) * F.col("n_frames") % F.col("ft")).alias("rem"),
    ).localCheckpoint(eager=False)  # spare + ranked both consume it
    spare = base.agg((F.lit(FRAME_BUDGET) - F.sum("alloc0")).alias("r"))
    ranked = base.select(
        "origin", "n_docs", "n_frames", "alloc0",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "origin"))
        .cast("bigint").alias("rk"),
    )
    alloc = F.col("alloc0") + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
    return (
        ranked.crossJoin(F.broadcast(spare))
        .select(
            "origin",
            "n_docs",
            "n_frames",
            alloc.cast("bigint").alias("alloc_frames"),
            F.round(alloc.cast("double") / F.col("n_frames"), 6).alias(
                "sampling_rate"
            ),
        )
        .orderBy("origin")
    )


# The capability matrix the deploy runbook reads: media kind x codec
# library x what the engine uses it for. Mixed by construction: stdlib
# and baked-in rows (wave, numpy) are ALWAYS available, so the pytest
# gate has unconditional truths to pin alongside the env-dependent ones.
CODEC_PROBE_MATRIX = (
    ("image", "PIL", "decode + resize (multimodal_extract/resize real path)"),
    ("image", "cv2", "alternate decode"),
    ("audio", "soundfile", "pcm decode"),
    ("audio", "wave", "wav header parse (stdlib)"),
    ("video", "av", "demux + frame sample"),
    ("video", "cv2", "frame sample"),
    ("tensor", "numpy", "array kernels (Arrow batch floor)"),
)


@register("multimodal_codec_probe_matrix", tags=("multimodal", "monitor"))
# rows-only: the availability column is an EXECUTOR-environment fact with
# no SQL twin; shape/stdlib/consistency gates in tests/test_round20_ops.py.
def multimodal_codec_probe_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-side codec capability matrix: for every (media kind,
    codec library) the multimodal operators can use, whether the library
    imports in the EXECUTOR Python runtime (probed inside a mapInPandas
    batch, NOT on the driver -- cluster deployments routinely have
    different driver and executor environments) and which processing
    path the engine will therefore take ('real' decode vs the
    deterministic fake). The one-query answer to "will
    multimodal_extract decode for real on THIS cluster", and the live
    twin of RUNBOOK.md's deploy checklist.

    Scale: the probe relation is the constant |matrix| rows (7); one
    Arrow batch per partition, no data movement. sf_dir is accepted for
    driver-contract uniformity and deliberately unused."""
    seed = spark.createDataFrame(
        list(CODEC_PROBE_MATRIX), "media_kind string, codec_lib string, purpose string"
    ).coalesce(1)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import importlib.util

        for pdf in batches:
            avail = [
                1 if importlib.util.find_spec(lib) is not None else 0
                for lib in pdf["codec_lib"]
            ]
            pdf = pdf.assign(
                available=pd.Series(avail, index=pdf.index, dtype="int64"),
                active_path=pd.Series(
                    ["real" if a else "fake" for a in avail], index=pdf.index
                ),
            )
            yield pdf

    return seed.mapInPandas(
        probe,
        "media_kind string, codec_lib string, purpose string,"
        " available bigint, active_path string",
    ).orderBy("media_kind", "codec_lib")
