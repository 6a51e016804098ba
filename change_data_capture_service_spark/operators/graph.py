"""Graph operators over log-derived graphs (round-4 extension).

The change log induces graphs: consecutive events per user form a
transition graph over event types (the same edge set event_transitions
reports). PageRank over it ranks states by steady-state visit probability
-- the "which entity dominates the flow" query, and the engine's second
oracle-checked ITERATIVE algorithm alongside dedup_cluster's connected
components.

Scale design: each power-iteration round is one keyed shuffle
(edges join ranks on src, partial-agg on dst). Edges are computed once
and localCheckpoint'd; ranks re-checkpoint every few rounds so lineage
stays O(1) instead of O(rounds). At 100 TB (billions of vertices) the
same loop holds with edges bucketed by src so every round reuses one
co-located join layout -- the GraphX/Pregel shape without the RDD API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DAMPING = 0.85
_ITERS = 10


def _transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted event-type transition edges: (src, dst, p) with p the
    row-normalized transition probability. One lag window per user."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("c"))
    totals = counts.groupBy("src").agg(F.sum("c").alias("t"))
    return counts.join(totals, "src").select(
        "src", "dst", (F.col("c") / F.col("t")).alias("p")
    )


@register(
    "graph_pagerank",
    tags=("graph", "analytics"),
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
             event_type AS dst
      FROM events
    ),
    counts AS (
      SELECT src, dst, count(*) AS c FROM pairs WHERE src IS NOT NULL GROUP BY src, dst
    ),
    edges AS (
      SELECT src, dst, c / sum(c) OVER (PARTITION BY src) AS p FROM counts
    ),
    nodes AS (SELECT DISTINCT src AS node FROM counts),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    ranks AS (
      SELECT 0 AS iter, node, 1.0 / n.n AS rank FROM nodes, n
      UNION ALL
      SELECT r.iter + 1,
             e.dst AS node,
             (1 - {_DAMPING}) / any_value(n.n) + {_DAMPING} * sum(r.rank * e.p) AS rank
      FROM ranks r JOIN edges e ON r.node = e.src CROSS JOIN n
      WHERE r.iter < {_ITERS}
      GROUP BY r.iter, e.dst
    )
    SELECT node AS event_type, CAST(round(rank, 6) AS DOUBLE) AS pagerank
    FROM ranks WHERE iter = {_ITERS}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph: {_ITERS} synchronous
    power-iteration rounds at damping {_DAMPING}, rank_(t+1)(v) =
    (1-d)/N + d * sum over in-edges of rank_t(u) * p(u->v).

    Engine side iterates (one join + partial agg per round, checkpoint
    every 3 rounds so the plan never grows); the oracle expresses the SAME
    fixed-point via a recursive CTE, which works at oracle scale and is
    exactly what a single-node engine cannot do at 10^9 vertices -- the
    reason the distributed loop exists. Every node here has out-edges
    (transition graphs are dense in type space), so no dangling-mass term
    is needed on either side."""
    edges = _transition_edges(spark, sf_dir).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # bounded: |event types|; at vertex scale keep it a crossJoin scalar
    if n == 0:  # empty feed: no graph, return the schema, don't divide by it
        return spark.createDataFrame([], "node string, rank double")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for i in range(_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit((1 - _DAMPING) / n) + _DAMPING * F.col("mass")).alias("rank"),
        )
        if i % 3 == 2:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).cast("double").alias("pagerank"),
    )
