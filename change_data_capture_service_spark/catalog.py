"""Engine-side schema catalog and fixture loaders.

The reference keeps a live in-memory relation registry (OID ->
RelationMessage, ``internal/wal/replicator.go:30,320-322``) because pgoutput
tuples are positional. The Spark engine's analogue is an explicit catalog of
``StructType`` per table; batch/stream readers apply it so column pruning and
filter pushdown reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # parquet timestamp[ms] with isAdjustedToUTC=false -> NTZ in Spark 4
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            # parquet timestamp[ms] with isAdjustedToUTC=false -> NTZ in Spark 4
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Declared primary keys. The reference *assumes* PK = first column
# (``replicator.go:341``); the engine instead declares PKs explicitly
# (SURVEY.md §7 risk register, quirk "PK = first column"). lineitem is
# absent deliberately: the fixture contains fully-duplicate rows (a fact
# table with bag semantics), so CDC keying for it would need a surrogate.
PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet is self-describing: no schema inference pass, and Catalyst
    pushes filters/pruning into the scan. The catalog schema is the declared
    contract; tests assert the files match it.

    Fixture generators have shipped ``events.ts`` as TIMESTAMP(NANOS) (illegal
    for Spark's vectorized reader -- read as raw nanos via ``nanosAsLong`` and
    floored to micros) and as TIMESTAMP(MICROS) with isAdjustedToUTC=false
    (read as TIMESTAMP_NTZ). Either way the catalog contract for ``ts`` is
    instant-typed TIMESTAMP: every downstream epoch computation
    (``unix_micros`` in sessionize/as-of tolerance) needs it, and the UTC
    session pin makes NTZ -> LTZ value-preserving, so oracle comparisons stay
    bit-identical with DuckDB's naive reading in both shapes."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    want = SCHEMAS.get(name)
    if want is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        for f in want.fields:
            if isinstance(f.dataType, T.TimestampType) and isinstance(got.get(f.name), T.LongType):
                df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
            elif isinstance(f.dataType, T.TimestampType) and isinstance(
                got.get(f.name), T.TimestampNTZType
            ):
                df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's core count.

    Small single-file inputs arrive as ONE partition (file-split
    granularity), serializing any CPU-heavy per-row derivation (shingling,
    hashing, decoding). One cheap shuffle of the raw rows buys full-core
    parallelism for everything downstream. At 100 TB inputs are thousands
    of splits and this is a no-op decision -- the helper exists for the
    few-files regime."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for SQL-expressed operators."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
