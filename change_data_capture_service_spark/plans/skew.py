"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join handling covers joins; skewed *aggregation* keys (one user
producing 10% of all events -- the norm in CDC logs) still hammer one
reducer for non-algebraic shapes. ``salted_agg`` spreads each key over
``n_salts`` partial groups, aggregates, then merges -- turning one hot
reducer into ``n_salts`` even ones at the cost of a second (tiny) shuffle.

Use for aggregations whose per-group state is large (collect_list,
exact-distinct structures). Algebraic aggs (sum/count/min/max) already get
map-side partial aggregation and don't need salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the
    partials per key. Column names must line up: each merge agg reads the
    alias its partial produced.

    Example -- skew-safe exact distinct count::

        salted_agg(events, ["user_id"],
                   partial_aggs=[F.collect_set("event_type").alias("types")],
                   merge_aggs=[F.size(F.array_distinct(F.flatten(F.collect_list("types")))).alias("n_types")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)
