"""Streaming incremental near-duplicate detection: the batch operator
``dedup_incremental_minhash`` (new-vs-store banded MinHash) wired through
``foreachBatch`` with the band store as SINK STATE -- the shape a
continuously-ingesting corpus actually runs.

Each micro-batch of documents:

1. shingles + 32-permutation MinHash signatures + 8x4 band entries are
   computed for the batch only (JVM expressions, operators/dedup.py
   helpers);
2. the batch's bands probe the persisted band store (equi-join on
   (band_id, band_hash)) for cross-batch candidates, and self-join for
   intra-batch candidates (newer doc_id vs older doc_id), so the union of
   all batches' matches equals the all-pairs batch operator regardless of
   how ingestion is chopped into batches -- pinned by the batch-equivalence
   test;
3. candidates are verified with EXACT shingle Jaccard against the shingle
   store (array_intersect on candidates only) and matches land in an
   epoch-keyed partition;
4. the batch's bands and shingles are appended to the stores, also
   epoch-keyed.

Every write is ``overwrite`` into ``epoch=<id>`` -- an at-least-once replay
of a micro-batch rewrites its own partitions byte-identically instead of
duplicating them, the same idempotence discipline as
``streaming/sink.py``'s routed ingest and ``streaming/rollup.py``'s
continuous aggregate.

Scale: the store is (doc_id, band_id, band_hash) 24-byte rows; at 100 TB
it is a bucketed table keyed by (band_id, band_hash) so each batch PROBES
(shuffle of batch-side only under a bucketed store), never scans. Batch
cost is |batch| x bands + candidate verification -- independent of corpus
size. The shingle store is only read for verify-join candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import statefs
from ..operators.dedup import _band_entries, _minhash_sig, _shingles, _tokens

BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band_id", T.IntegerType(), False),
        T.StructField("band_hash", T.LongType(), False),
    ]
)

SHINGLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("shingles", T.ArrayType(T.StringType(), False), False),
    ]
)

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("new_doc_id", T.LongType(), False),
        T.StructField("seen_doc_id", T.LongType(), False),
        T.StructField("jaccard", T.DoubleType(), False),
    ]
)

THRESHOLD = 0.8


def _shingled(batch_df: DataFrame) -> DataFrame:
    return (
        batch_df.select("doc_id", _tokens().alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", _shingles(F.col("toks")).alias("shingles"))
    )


class StreamingMinHashDedup:
    """foreachBatch sink maintaining a banded near-dup index incrementally."""

    def __init__(self, spark: SparkSession, store_dir: str):
        self.spark = spark
        self.store_dir = store_dir.rstrip("/")
        # scheme-routed dir probe: bare local paths stay on os.path, a
        # file:/hdfs:/s3a: store_dir probes through the Hadoop FS API
        self.fs = statefs.for_path(spark, self.store_dir)

    def _dir(self, name: str) -> str:
        return f"{self.store_dir}/{name}"

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        d = self._dir(name)
        if not self.fs.is_dir(d):
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        sh = _shingled(batch_df).localCheckpoint()  # batch-sized; reused 4x
        bands = _band_entries(_minhash_sig(sh))

        seen_bands = self._read("bands", BAND_SCHEMA)
        seen_sh = self._read("shingles", SHINGLE_SCHEMA)

        # replay safety: a re-run epoch must not pair against its own
        # previous (identical) store contribution
        seen_bands = seen_bands.join(
            sh.select("doc_id"), "doc_id", "left_anti"
        )
        seen_sh = seen_sh.join(sh.select("doc_id"), "doc_id", "left_anti")

        n, s = bands.alias("n"), seen_bands.alias("s")
        cross_pairs = (
            n.join(
                s,
                (F.col("n.band_id") == F.col("s.band_id"))
                & (F.col("n.band_hash") == F.col("s.band_hash")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc_id"),
                F.col("s.doc_id").alias("seen_doc_id"),
            )
        )
        a, b = bands.alias("a"), bands.alias("b")
        intra_pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("new_doc_id"),
                F.col("b.doc_id").alias("seen_doc_id"),
            )
        )
        pair_ids = cross_pairs.unionByName(intra_pairs).dropDuplicates(
            ["new_doc_id", "seen_doc_id"]
        )
        all_sh = seen_sh.unionByName(sh)
        candidates = pair_ids.join(
            sh.select(F.col("doc_id").alias("new_doc_id"), F.col("shingles").alias("sh_n")),
            "new_doc_id",
        ).join(
            all_sh.select(
                F.col("doc_id").alias("seen_doc_id"), F.col("shingles").alias("sh_s")
            ),
            "seen_doc_id",
        )
        inter = F.size(F.array_intersect("sh_n", "sh_s"))
        union = F.size("sh_n") + F.size("sh_s") - inter
        matches = (
            candidates.withColumn("jacc", inter.cast("double") / union)
            .filter(F.col("jacc") >= THRESHOLD)
            .select(
                "new_doc_id", "seen_doc_id", F.round("jacc", 6).alias("jaccard")
            )
        )
        # epoch-keyed overwrites: replay rewrites, never duplicates
        matches.write.mode("overwrite").parquet(
            f"{self._dir('matches')}/epoch={epoch_id}"
        )
        bands.write.mode("overwrite").parquet(f"{self._dir('bands')}/epoch={epoch_id}")
        sh.write.mode("overwrite").parquet(f"{self._dir('shingles')}/epoch={epoch_id}")

    def matches(self) -> DataFrame:
        return self._read("matches", MATCH_SCHEMA)


def start_incremental_dedup(
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame of documents (doc_id, text) through the
    incremental near-dup sink. Returns (query, sink)."""
    spark = doc_stream.sparkSession
    sink = StreamingMinHashDedup(spark, store_dir)
    query = (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query, sink


# --------------------------------------------------------------------------
# Registered driver-checkable surface
# --------------------------------------------------------------------------

from ..catalog import load_table  # noqa: E402
from ..operators.dedup import _ORACLE_EXACT_JACCARD  # noqa: E402
from ..registry import register  # noqa: E402


@register(
    "stream_incremental_dedup",
    tags=("dedup", "streaming", "northstar"),
    oracle=_ORACLE_EXACT_JACCARD
    + """
    SELECT doc_id_b AS new_doc_id, doc_id_a AS seen_doc_id,
           round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM pairs
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8
    """,
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the streaming near-dup sink over the documents table chopped
    into two doc_id-ordered epochs, then return the accumulated match
    store. Because cross-batch pairs come from probing the band store and
    intra-batch pairs from the self-join, the union over epochs equals
    the all-pairs batch operator (``dedup_minhash_near``) no matter where
    the batch boundary falls -- which is why this STREAMING operator can
    carry the same exact-Jaccard DuckDB oracle (banding miss probability
    on the fixture's ~0.99 planted dups is ~1e-10; the true-stream
    file-source path and replay idempotence are pinned in
    tests/test_streaming.py).

    Scale: each epoch costs |batch| band rows + candidate verification;
    the store grows by 24-byte band rows; nothing re-pairs the corpus
    with itself."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg((F.max("doc_id") / 2).cast("long").alias("m")).collect()[0]["m"]
    scratch = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        sink = StreamingMinHashDedup(spark, scratch)
        sink(docs.filter(F.col("doc_id") <= mid), 0)
        sink(docs.filter(F.col("doc_id") > mid), 1)
        # eager: materialize off the scratch store before the finally deletes it
        return sink.matches().orderBy("new_doc_id", "seen_doc_id").localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
