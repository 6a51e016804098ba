"""Batch file-format sources/sinks beyond parquet (csv / json / orc), plus
the JDBC source builder that is the engine's production analogue of the
reference's Postgres snapshot scan (R1).

Parquet remains the canonical format (columnar, statistics, pushdown);
these exist so a user can land the same tables from any common format with
explicit catalog schemas -- never inference in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import SCHEMAS


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True) -> DataFrame:
    """Schema-explicit CSV read (no inference pass: inference = one extra
    full scan at 100 TB, and silently wrong types)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_table_any(spark: SparkSession, path: str, name: str, fmt: str = "parquet") -> DataFrame:
    """Catalog-schema'd read of a fixture-shaped table in any format."""
    schema = SCHEMAS[name]
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return read_csv(spark, path, schema)
    if fmt == "json":
        return read_json(spark, path, schema)
    if fmt == "orc":
        return read_orc(spark, path)
    raise ValueError(f"unsupported format: {fmt}")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")  # must match the reader's header=true
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def jdbc_snapshot_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
):
    """Partitioned JDBC snapshot (reference R1 does ``SELECT *`` through one
    connection and buffers the whole table, ``internal/wal/replicator.go:
    102-103``; this splits the PK range across ``num_partitions`` parallel
    connections, O(partition) memory). Returns the configured reader; call
    ``.load()`` against a live database."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("numPartitions", str(num_partitions))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10):
    """Interleaved-bits (Morton) sort key over numeric columns.

    Each column is min-max scaled to ``[0, 2^bits)`` using a 1-row bounds
    aggregate broadcast against the data (no driver collect), then the
    scaled values' bits interleave: bit b of column i lands at position
    ``b * len(cols) + i``. Sorting by the result clusters rows so every
    output file covers a small HYPER-RECTANGLE of the key space instead of
    a slab -- parquet min/max stats then prune scans for predicates on ANY
    clustered dimension, which single-key range clustering only gives the
    leading key. Pure JVM bit arithmetic (shift/and/or), codegen'd.

    Returns (df_with_bounds, zkey_column); callers drop the helper bound
    columns after sorting."""
    from pyspark.sql import functions as F

    # bit b of column i lands at position b*len(cols)+i in a signed long:
    # past position 62 the key silently corrupts (sign bit / dropped bits)
    # and clustering degrades with no error. Auto-shrink bits to fit.
    max_bits = 62 // len(cols)
    if bits > max_bits:
        bits = max_bits
    if bits < 1:
        raise ValueError(f"zorder_key: too many cluster columns ({len(cols)}) for a 63-bit key")

    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__{c}_min") for c in cols],
        *[F.max(c).cast("double").alias(f"__{c}_max") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        span = F.col(f"__{c}_max") - F.col(f"__{c}_min")
        scaled = (
            F.when(
                span > 0,
                F.floor((F.col(c).cast("double") - F.col(f"__{c}_min")) / span * top),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    return with_bounds, z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    bits: int = 10,
    fmt: str = "parquet",
) -> None:
    """Z-order clustered write: range-partition + sort on the Morton key so
    multi-dimensional predicates prune files.

    ``write_clustered`` (linear range clustering) makes the LEADING key
    prunable and leaves every other dimension spanning the full range per
    file; Z-ordering trades a little leading-key locality for bounded
    per-file spans in every clustered dimension -- with F files, each
    dimension's per-file span shrinks to roughly F^(-1/d) of its range.
    Use it when scans filter on several independent columns (e.g.
    time x tenant, user x score)."""
    with_bounds, z = zorder_key(df, cluster_by, bits=bits)
    keyed = with_bounds.withColumn("__zkey", z)
    out = keyed.repartitionByRange(*([num_files] if num_files else []), "__zkey")
    out = out.sortWithinPartitions("__zkey")
    drop = ["__zkey"] + [f"__{c}_min" for c in cluster_by] + [f"__{c}_max" for c in cluster_by]
    out = out.drop(*drop)
    out.write.format(fmt).mode("overwrite").save(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Range-clustered write: repartitionByRange on the cluster keys, then
    sortWithinPartitions, so each output file owns a disjoint key range and
    rows inside it are ordered.

    Why this matters at 100 TB: parquet row-group min/max statistics only
    prune when values are clustered -- a random layout makes every
    range/equality predicate read every file. After this write, a filter on
    the cluster key skips whole files (checked in test_sources by asserting
    disjoint per-file min/max). This is the poor-man's Z-order: for
    single-key and prefix predicates it equals it; true multi-dim curves
    can plug in by replacing the range partitioner with an interleaved-bits
    sort key."""
    out = df.repartitionByRange(*([num_files] if num_files else []), *cluster_by)
    out = out.sortWithinPartitions(*cluster_by)
    out.write.format(fmt).mode("overwrite").save(path)
