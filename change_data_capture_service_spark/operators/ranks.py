"""Exact global ranking without a single-task sort.

Spark's ``row_number()/ntile()`` over an un-partitioned ``Window.orderBy``
funnels the WHOLE relation through one reducer -- fine on a 60k-row
fixture, a wall at 10^9 customers. This module computes the SAME exact
answers fully parallel:

1. ``repartitionByRange`` on the sort keys -- Spark's sampled
   RangePartitioner draws balanced, CONTIGUOUS key ranges (skew-aware by
   construction: a hot key region just gets more of the sample and
   therefore more partitions around it).
2. ``row_number`` within each range partition (``Window.partitionBy``
   on the captured partition id -- one task per range, |rows|/P each).
3. Per-range row counts -> an exclusive prefix sum over the RANGE-COUNT
   relation (P rows, driver-scale) -> broadcast back. Global row number
   is ``range_offset + within_range_row_number`` by pure integer
   addition, so the re-grouping cannot change a single result bit.
4. ``ntile(n)`` is closed-form from ``(row_number, N)``: with
   ``q = N div n`` and ``r = N mod n`` the first ``r`` tiles take
   ``q+1`` rows and the rest take ``q`` -- the SQL-standard definition
   both Spark and DuckDB implement, so fixture hashes are unchanged.

Exactness requires the composite sort key to be unique per row (callers
pass the entity key as the final tiebreak, same as the window form they
replace). Determinism does NOT depend on where the sampled range bounds
fall -- any contiguous partitioning yields the same global row numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "_rn",
    *,
    num_ranges: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY *order_cols)`` computed across
    ``num_ranges`` parallel tasks (default: session shuffle parallelism).

    Adds columns ``out`` (1-based global row number, bigint) and ``_N``
    (total row count, bigint) -- ``_N`` rides along because every rank
    consumer (ntile, percent_rank) needs it and it falls out of the
    offset relation for free. ``order_cols`` must be a total order
    (unique per row).
    """
    if num_ranges is None:
        num_ranges = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.repartitionByRange(num_ranges, *order_cols)
        # capture the range id BEFORE any later shuffle re-maps it
        .withColumn("_range", F.spark_partition_id())
    )
    within = Window.partitionBy("_range").orderBy(*order_cols)
    d = d.withColumn("_rn1", F.row_number().over(within).cast("bigint"))
    sizes = d.groupBy("_range").agg(F.count("*").cast("bigint").alias("_cnt"))
    wo = Window.orderBy("_range")  # P rows total: driver-scale by design
    offs = sizes.select(
        "_range",
        F.coalesce(
            F.sum("_cnt").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("bigint").alias("_off"),
        F.sum("_cnt").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("bigint").alias("_N"),
    )
    return (
        d.join(F.broadcast(offs), "_range")
        .withColumn(out, (F.col("_off") + F.col("_rn1")).cast("bigint"))
        .drop("_range", "_rn1", "_off")
    )


def exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column],
    out: str,
    *,
    num_ranges: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY *order_cols)`` as an int column ``out``,
    exact and fully parallel (see module docstring). Matches the SQL
    standard tile-size rule byte-for-byte with the window form."""
    ranked = exact_global_row_number(
        df, order_cols, "_grn", num_ranges=num_ranges
    )
    # tile boundaries: q = N div n, r = N mod n; the first r tiles take
    # q+1 rows (covering rows 1..r*(q+1)), the remaining n-r take q.
    # All-integer DIV arithmetic -- exact past 2^53 where float `/` is
    # not. CASE short-circuits, so the ELSE's `DIV q` never sees q=0
    # (q=0 implies N<n implies r*(q+1)=N>=rn -- every row takes the WHEN
    # arm).
    q = _q_sql(n)
    tile = F.expr(
        f"CASE WHEN _grn <= (_N % {n}) * ({q} + 1) "
        f"THEN (_grn + {q}) DIV ({q} + 1) "
        f"ELSE _N % {n} + (_grn - (_N % {n}) * ({q} + 1) + {q} - 1) DIV {q} "
        f"END"
    )
    return ranked.withColumn(out, tile.cast("int")).drop("_grn", "_N")


def _q_sql(n: int) -> str:
    """SQL fragment for q = N div n over the ridden-along ``_N``."""
    return f"(_N DIV {n})"
