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


def _cc_contract(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components by graph CONTRACTION with pointer jumping:
    each round relabels every current node to the min of its closed
    neighbourhood, pointer-jumps that label table twice (label <-
    label(label(v)), so label chains contract 4x), rewrites the edge set
    through the new labels, and drops self-loops. The graph SHRINKS every
    round -- unlike plain min-label propagation, whose O(diameter) rounds
    make a size-chain graph pathological (a label can point at a local
    minimum and stop moving; this is why dedup.connected_components keeps
    a 50-round cap). Contraction + jumping halves even a
    descending-id chain per round: O(log diameter) rounds, the
    MapReduce large-star/small-star result by different means.

    ``edges`` must be symmetrized (src, dst). Returns (node, component),
    component = min node id of the component (the minimum never relabels
    -- it is the least element of every neighbourhood it appears in --
    and every other node's chain terminates at it). Per round: one
    groupBy over current edges, two small self-joins on the label table,
    one mapping update join, one edge rewrite + distinct; all on
    monotonically shrinking relations, re-checkpointed so lineage stays
    O(1). Equivalence to the plain propagation is property-tested on
    random graphs (tests/test_round11_ops.py)."""
    edges = edges.localCheckpoint()
    mapping = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):  # exits when the graph is fully contracted
        if edges.isEmpty():
            break
        # label(u) = min(u, neighbours) over the CURRENT contracted graph
        lab = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.min("dst").alias("lbl"))
            .select("node", F.least("node", "lbl").alias("lbl"))
        )
        # pointer-jump twice: follow label chains, 4x contraction per round
        for _j in range(2):
            lab = (
                lab.alias("a")
                .join(
                    lab.select(
                        F.col("node").alias("l_node"), F.col("lbl").alias("l_lbl")
                    ).alias("b"),
                    F.col("a.lbl") == F.col("b.l_node"),
                    "left",
                )
                .select("node", F.coalesce("l_lbl", "lbl").alias("lbl"))
            )
        lab = lab.localCheckpoint()
        # fold the round's relabel into the global node -> component map
        mapping = (
            mapping.join(
                lab.select(
                    F.col("node").alias("m_node"), F.col("lbl").alias("m_lbl")
                ),
                mapping["component"] == F.col("m_node"),
                "left",
            )
            .select(
                "node", F.coalesce("m_lbl", "component").alias("component")
            )
            .localCheckpoint()
        )
        # contract: rewrite both endpoints, drop self-loops, dedup
        s = lab.select(F.col("node").alias("src"), F.col("lbl").alias("ls"))
        d = lab.select(F.col("node").alias("dst"), F.col("lbl").alias("ld"))
        edges = (
            edges.join(s, "src")
            .join(d, "dst")
            .filter(F.col("ls") != F.col("ld"))
            .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
            .distinct()
            .localCheckpoint()
        )
    return mapping.select("node", "component")


@register(
    "graph_connected_components",
    tags=("graph", "analytics"),
    oracle="""
    WITH RECURSIVE e AS (
      SELECT a.p_partkey AS pa, b.p_partkey AS pb
      FROM part a JOIN part b
        ON a.p_type = b.p_type
       AND b.p_size BETWEEN a.p_size AND a.p_size + 1
       AND (b.p_size > a.p_size OR a.p_partkey < b.p_partkey)
    ),
    sym AS (
      SELECT pa AS src, pb AS dst FROM e
      UNION ALL SELECT pb, pa FROM e
    ),
    reach AS (
      SELECT DISTINCT src AS node, src AS peer FROM sym
      UNION
      SELECT r.node, s.dst FROM reach r JOIN sym s ON r.peer = s.src
    ),
    comp AS (
      SELECT node, CAST(min(peer) AS BIGINT) AS component
      FROM reach GROUP BY node
    )
    SELECT c.component, CAST(count(*) AS BIGINT) AS n_parts,
           any_value(p.p_type) AS p_type,
           CAST(min(p.p_size) AS INT) AS size_min,
           CAST(max(p.p_size) AS INT) AS size_max
    FROM comp c JOIN part p ON c.node = p.p_partkey
    GROUP BY c.component
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part-substitution graph (same edge rule
    as part_substitution_candidates: same type, size within 1), summarized
    per component -- the "interchangeability families" a procurement
    engine clusters parts into. Components never span types; size ranges
    chain transitively, so each component is a maximal run of adjacent
    sizes within a type.

    Engine side: the pairs join blocks on (type, size-bucket) -- never an
    all-pairs -- then pointer-jumping min-label propagation converges in
    O(log diameter) rounds (the chain topology here is the propagation
    worst case: plain one-hop min-label would need ~|sizes| rounds, the
    jump needs ~7). The oracle expresses the same fixpoint as a recursive
    transitive closure + min -- closure is O(sum of component^2) rows,
    fine at oracle scale and exactly what the distributed loop avoids.

    Scale: |V| = |parts|, |E| bounded by parts x (parts per adjacent size
    bucket); every round is two keyed shuffles over |V| label rows. At
    10^9 parts the same loop runs with labels bucketed on node -- the
    GraphX CC shape without the RDD API."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("pa"),
        F.col("p_type").alias("ta"),
        F.col("p_size").alias("sa"),
    )
    b = p.select(
        F.col("p_partkey").alias("pb"),
        F.col("p_type").alias("tb"),
        F.col("p_size").alias("sb"),
    )
    pairs = a.join(
        b,
        (F.col("ta") == F.col("tb"))
        & F.col("sb").between(F.col("sa"), F.col("sa") + 1)
        & ((F.col("sb") > F.col("sa")) | (F.col("pa") < F.col("pb"))),
    ).select("pa", "pb")
    sym = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).union(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    comp = _cc_contract(sym)
    return (
        comp.join(p, comp["node"] == p["p_partkey"])
        .groupBy("component")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.any_value("p_type").alias("p_type"),
            F.min("p_size").cast("int").alias("size_min"),
            F.max("p_size").cast("int").alias("size_max"),
        )
        .select(
            F.col("component").cast("bigint").alias("component"),
            "n_parts",
            "p_type",
            "size_min",
            "size_max",
        )
    )


# Edge threshold for the brand co-occurrence graph: two brands count as
# linked when bought together in at least this share of orders -- a
# data-proportional bound, so the reduced graph stays comparably dense
# at every scale factor. Single source of truth for the four ops that
# share the graph (triangle count, assortativity, k-core, local
# clustering); their oracles restate it in SQL by necessity.
BRAND_EDGE_SUPPORT = 0.024


def _brand_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reduced brand co-occurrence graph as canonical (u < v) edges.

    Scale: the fact table collapses to the DISTINCT (order, brand) grain
    first (pair space bounded at C(|brands in order|, 2) per order), then
    aggregates to the brand-pair grain before the support filter -- the
    graph ops downstream never see fact rows, only the attribute-bounded
    edge relation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg(
        F.ceil(BRAND_EDGE_SUPPORT * F.count("*")).cast("bigint").alias("t")
    )
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("ok_a"), F.col("p_brand").alias("u"))
    b = ob.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("v"))
    return (
        a.join(b, (F.col("ok_a") == F.col("ok_b")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("n") >= F.col("t"))
        .select("u", "v")
    )


@register(
    "graph_triangle_count",
    tags=("graph", "analytics"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    thr AS (
      SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders
    ),
    e AS (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= (SELECT t FROM thr)
    )
    SELECT e1.u AS brand_a, e1.v AS brand_b, e2.v AS brand_c
    FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3
      ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the brand co-occurrence graph (edge =
    two brands bought together in at least 2.4% of orders -- a
    data-proportional threshold, so the graph stays comparably dense at
    every scale factor): the clustering-structure primitive behind
    community detection and recommendation diversity scoring.

    Engine side uses DEGREE-ORDERED ORIENTATION -- every edge points from
    its lower-(degree, name) endpoint to the higher one, wedges are built
    only from each node's out-neighbours, and a wedge (a, b) is a
    triangle iff the oriented edge a->b exists. Orientation bounds
    out-degree by O(sqrt(|E|)) on any graph, so the wedge join never
    explodes on hub vertices -- the standard skew-proof triangle
    algorithm; a naive lexicographic orientation (the oracle's form, fine
    at oracle scale) lets one low-name hub own O(deg^2) wedges. Both
    enumerate the same canonical (a < b < c) triangle set.

    Scale: the (order, brand) grain bounds the pair space at C(25,2) per
    order; edges aggregate to the brand-pair grain (tiny) before any
    wedge work, so the triangle phase runs on the REDUCED graph no matter
    how many orders feed it."""
    edges = _brand_cooccurrence_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # reduced graph: reused by deg + 3 joins
    deg = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    ).localCheckpoint(eager=False)
    w1 = oriented.select("src", F.col("dst").alias("a"), F.col("deg_dst").alias("da"))
    w2 = oriented.select("src", F.col("dst").alias("b"), F.col("deg_dst").alias("db"))
    # the reduced graph is attribute-grain bounded (<= C(|brands|, 2)
    # edges at ANY data scale), so both wedge-phase joins broadcast --
    # the checkpointed relation has no stats, so the hint is explicit
    wedges = w1.join(F.broadcast(w2), "src").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    closing = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    tri = wedges.join(F.broadcast(closing), ["a", "b"]).select(
        F.array_sort(F.array("src", "a", "b")).alias("t")
    )
    return tri.select(
        F.col("t")[0].alias("brand_a"),
        F.col("t")[1].alias("brand_b"),
        F.col("t")[2].alias("brand_c"),
    )


# Degree cap for the COMMON-NEIGHBOR role in link prediction: paths
# through a hub vertex z cost deg(z)^2 join rows while contributing the
# LEAST information (Adamic-Adar's own 1/ln(deg) downweight exists
# precisely because hub co-neighbors are weak evidence). Capping z's
# degree bounds the path space at |V| x CAP^2 by construction -- the
# graph-side twin of dedup's JACCARD_DF_CAP, with the same recall-only
# bias, mirrored in the oracle.
AA_HUB_CAP = 64


@register(
    "part_link_prediction_adamic_adar",
    tags=("graph", "join", "relational"),
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.pk <> b.pk
    ),
    deg AS (
      SELECT u AS z, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
    ),
    thin AS (
      SELECT e.u, e.v FROM edges e JOIN deg ON e.v = deg.z
      WHERE deg.d <= {AA_HUB_CAP} AND deg.d >= 2
    ),
    paths AS (
      SELECT a.u AS pa, b.u AS pb, a.v AS z
      FROM thin a JOIN thin b ON a.v = b.v AND a.u < b.u
    ),
    scored AS (
      SELECT p.pa, p.pb,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(CAST(round(1.0 / ln(deg.d), 6) AS DECIMAL(18,6)))
               AS DECIMAL(18,6)) AS aa
      FROM paths p JOIN deg ON p.z = deg.z
      GROUP BY 1, 2
    )
    SELECT s.pa AS part_a, s.pb AS part_b, s.n_common,
           round(CAST(s.aa AS DOUBLE), 6) AS aa_score
    FROM scored s
    LEFT JOIN edges e ON s.pa = e.u AND s.pb = e.v
    WHERE e.u IS NULL
    ORDER BY aa_score DESC, part_a, part_b
    LIMIT 20
    """,
)
def part_link_prediction_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the part co-purchase graph: the 20
    part pairs NOT yet bought together whose co-purchase neighborhoods
    overlap most, weighting each shared neighbor z by 1/ln(deg(z))
    (Adamic & Adar 2003) -- "products that will be bought together next",
    the link-prediction member of the graph suite (pagerank ranks nodes,
    connected components clusters them, this predicts the missing edges).

    Exactness: per-path contributions 1/ln(deg) snap to 6 dp DECIMAL
    before the pair sum (accumulation-order-free); top-k ties break on
    the id pair in both engines.

    Scale: edges dedup at the (order, part) grain first (same bound as
    basket_brand_pairs); the path join runs over the THINNED adjacency --
    common-neighbor role restricted to deg(z) in [2, AA_HUB_CAP] -- so
    the path space is bounded at |V| x CAP^2 BY CONSTRUCTION instead of
    sum(deg^2) (one boilerplate hub part otherwise contributes deg^2 =
    billions of join rows at 100 TB while adding the least Adamic-Adar
    mass; same cap discipline as dedup's JACCARD_DF_CAP). The non-edge
    filter is an anti-join against the edge set, and the final top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = li.select(F.col("ok").alias("ok_a"), F.col("pk").alias("u"))
    b = li.select(F.col("ok").alias("ok_b"), F.col("pk").alias("v"))
    edges = (
        a.join(b, (F.col("ok_a") == F.col("ok_b")) & (F.col("u") != F.col("v")))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=False)  # feeds deg, thin, and the anti-join
    )
    deg = edges.groupBy(F.col("u").alias("z")).agg(
        F.count("*").cast("bigint").alias("d")
    ).localCheckpoint(eager=False)
    # thin keeps d: the common-neighbor weight 1/ln(deg(z)) is a function
    # of z alone, and za == zb == z inside every path row, so carrying d
    # through the thinned adjacency lets the wedge rows arrive at the
    # aggregation already weighted -- the r13 shape re-joined `paths`
    # (the LARGEST relation, bounded |V| x CAP^2) against deg to fetch d
    # back, one whole extra sort-merge join + exchange of the wedge set
    # (r14 stage profile: a 26.9 MB shuffle-read stage, ~4 executor-s,
    # removed by this change; guide §2.4 "remove shuffles outright").
    thin = (
        edges.join(deg, edges["v"] == deg["z"])
        .filter((F.col("d") <= AA_HUB_CAP) & (F.col("d") >= 2))
        .select("u", "v", "d")
    )
    pa = thin.select(F.col("u").alias("pa"), F.col("v").alias("za"), "d")
    pb = thin.select(F.col("u").alias("pb"), F.col("v").alias("zb"))
    paths = pa.join(
        pb, (F.col("za") == F.col("zb")) & (F.col("pa") < F.col("pb"))
    ).select("pa", "pb", "d")
    scored = (
        paths
        .groupBy("pa", "pb")
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.sum(F.round(1.0 / F.log(F.col("d")), 6).cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("aa"),
        )
    )
    non_edge = scored.join(
        edges,
        (scored["pa"] == edges["u"]) & (scored["pb"] == edges["v"]),
        "left_anti",
    )
    return non_edge.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        "n_common",
        F.round(F.col("aa").cast("double"), 6).alias("aa_score"),
    ).orderBy(F.col("aa_score").desc(), "part_a", "part_b").limit(20)


@register(
    "graph_degree_assortativity",
    tags=("graph", "stats", "analytics"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    thr AS (
      SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders
    ),
    e AS (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= (SELECT t FROM thr)
    ),
    both_dirs AS (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ),
    deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM both_dirs GROUP BY 1
    ),
    stubs AS (
      SELECT du.d AS x, dv.d AS y
      FROM both_dirs b
      JOIN deg du ON b.u = du.node
      JOIN deg dv ON b.v = dv.node
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM stubs
    )
    SELECT CAST(m / 2 AS BIGINT) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / nullif(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0),
                 6) AS assortativity
    FROM m WHERE m > 0
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the brand co-occurrence graph (Newman
    2002): the Pearson correlation of endpoint degrees over every edge
    stub -- positive = hubs link to hubs (social-network shape), negative
    = hubs link to leaves (hub-and-spoke catalogs). The one-number
    topology summary that says WHICH degree-skew mitigation the other
    graph ops need (hub caps matter exactly when assortativity is
    negative and hubs fan wide).

    Exactness: on the stub list (each undirected edge contributes both
    directions) the x and y marginals coincide, so r needs only three
    DECIMAL(38,0)-exact integer moments (sum d, sum d^2, sum d_u*d_v) and
    one double division, 6 dp.

    Scale: the same reduced brand graph as graph_triangle_count -- the
    fact table collapses to (order, brand) then to the brand-pair grain
    before any graph work; degrees and stub moments are joins on the
    attribute-bounded edge relation (broadcast both ways)."""
    e = _brand_cooccurrence_edges(spark, sf_dir)
    both = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)  # degrees + stub join reuse it
    deg = both.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    ).localCheckpoint(eager=False)
    stubs = (
        both.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("x"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("y"))),
            "v",
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    m = stubs.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(xd * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    ).filter(F.col("m") > 0)
    n_nodes = deg.agg(F.count("*").cast("bigint").alias("nn"))
    r = (
        F.col("m").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / F.nullif(
        F.col("m").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
        F.lit(0.0),
    )
    return m.crossJoin(F.broadcast(n_nodes)).select(
        F.expr("m DIV 2").cast("bigint").alias("n_edges"),
        F.col("nn").alias("n_nodes"),
        F.round(r, 6).alias("assortativity"),
    )


# _kcore's per-pass semi-joins broadcast the alive-node set only while it
# fits comfortably in an executor: above this bound the hint is dropped and
# Spark falls back to a shuffle join (same result, graceful degradation).
# 4M nodes of (long) keys ~ 32 MB serialized -- inside the default 8 GB
# driver/executor headroom with a wide margin, same discipline as
# dedup.JACCARD_DF_CAP: a hard bound in code, not a prose contract.
KCORE_BROADCAST_NODE_CAP = 4_000_000


def _kcore(
    both_dirs: DataFrame,
    max_k: int = 64,
    broadcast_node_cap: int = KCORE_BROADCAST_NODE_CAP,
) -> DataFrame:
    """Core decomposition by iterative peeling over a (u, v) BOTH-DIRECTIONS
    edge relation: for k = 1, 2, ... repeatedly delete nodes with degree
    < k; a node's core number is the last k it survived. Returns (node,
    coreness). Nodes whose neighbors are all removed in the SAME pass go
    edge-less without ever showing a low degree row -- the peel therefore
    tracks the ALIVE node universe explicitly and treats a missing degree
    as 0 (review-caught: the first form derived candidates from the edge
    relation alone and silently dropped simultaneously-orphaned nodes,
    e.g. the middle of a path whose two ends peel together). Survivors of
    the max_k guard report coreness = max_k, a documented CLAMP meaning
    "at least max_k" (not max_k - 1).

    Scale: each peel pass is one degree agg + one semi-join on the
    CURRENT (shrinking) edge set, lineage cut with localCheckpoint per
    pass (the pagerank/reachability discipline -- iterative ops pay
    launch latency per round, never lineage growth). Outer rounds are
    bounded by the graph degeneracy (<= max_k guard); inner fixed-point
    passes by the longest peel chain. On the attribute-grain reduced
    graphs the engine builds (brands, parts), every pass is
    broadcast-sized; on a user-grain graph the broadcast hint is applied
    ONLY while the alive set is under broadcast_node_cap (checked against
    the materialized checkpoint each pass -- alive only shrinks, so once
    small it stays hinted), otherwise the semi-joins run as plain shuffle
    joins instead of OOMing an executor on a forced hint."""
    cur = both_dirs.localCheckpoint()
    alive = cur.select("u").distinct().localCheckpoint()
    n_alive = alive.count()  # cheap: counts the checkpointed materialization
    core = None  # (node, coreness) accumulated per peel level
    k = 1
    while k <= max_k:
        while True:
            counts = cur.groupBy("u").agg(F.count("*").alias("d"))
            deg = (
                alive.join(counts, "u", "left")
                .select("u", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
            )
            low = deg.filter(F.col("d") < k).select("u")
            if low.isEmpty():
                break
            removed = low.withColumn("coreness", F.lit(k - 1).cast("int"))
            core = removed if core is None else core.unionByName(removed)
            core = core.localCheckpoint()
            alive = alive.join(low, "u", "left_anti").localCheckpoint()
            n_alive = alive.count()
            hint = (lambda d: F.broadcast(d)) if n_alive <= broadcast_node_cap else (lambda d: d)
            cur = (
                cur.join(hint(alive), "u", "left_semi")
                .join(
                    hint(alive.select(F.col("u").alias("v"))),
                    "v",
                    "left_semi",
                )
                .localCheckpoint()
            )
        if alive.isEmpty():
            break
        k += 1
    survivors = alive.withColumn(
        # loop left via k > max_k: every remaining node survived peeling at
        # k = max_k, so its true coreness is >= max_k -- report the clamp
        "coreness", F.lit(min(k, max_k)).cast("int") if k > max_k else F.lit(k - 1).cast("int")
    )
    out = survivors if core is None else core.unionByName(survivors)
    return out.select(F.col("u").alias("node"), "coreness")


@register("graph_kcore", tags=("graph", "analytics"))  # rows-only: iterative peeling has no SQL twin
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the brand co-occurrence graph: each
    brand's coreness = the largest k such that it survives in a subgraph
    where every node has degree >= k -- the standard density hierarchy
    (coreness separates the tight co-purchase nucleus from tendrils, and
    is the classic pre-filter for community detection and influence
    seeding; Seidman 1983).

    Rows-only by declared contract: the peeling fixed point is iterative
    (recursive SQL cannot express "recompute degrees after deletion").
    Correctness is pinned by tests/test_round14_ops.py on constructed
    graphs with known core numbers (clique, pendant path, bridge), plus
    the coreness <= degree invariant on the fixture graph.

    Scale: see _kcore -- the registered surface runs it on the SAME
    attribute-grain reduced brand graph as graph_triangle_count, so every
    peel pass is broadcast-sized regardless of fact-table width."""
    e = _brand_cooccurrence_edges(spark, sf_dir)
    both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return _kcore(both).orderBy("node")


@register(
    "graph_local_clustering",
    tags=("graph", "analytics"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    thr AS (
      SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders
    ),
    e AS (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= (SELECT t FROM thr)
    ),
    bd AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM bd GROUP BY 1),
    tri AS (
      SELECT e1.u AS node, CAST(count(*) AS BIGINT) AS t
      FROM bd e1 JOIN bd e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
      GROUP BY 1
    )
    SELECT deg.node, deg.d AS degree,
           CAST(coalesce(tri.t, 0) AS BIGINT) AS triangles,
           round(CASE WHEN deg.d > 1
                 THEN 2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1))
                 ELSE 0 END, 6) AS local_cc
    FROM deg LEFT JOIN tri ON deg.node = tri.node
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per brand node: triangles through the
    node over deg*(deg-1)/2 possible -- the per-node texture behind
    graph_triangle_count's global enumeration (a high-degree node with
    cc~0 is a pure connector; cc~1 is a clique member; the distribution
    separates hub-and-spoke catalogs from community-structured ones).

    Exactness: per-node triangles come from wedges ANCHORED AT THE NODE
    over its own neighbor pairs (x < y canonicalizes the pair, the
    closing edge (x, y) is checked against the undirected edge set) --
    each triangle contributes exactly one wedge per member node, so all
    three members count it once; degrees and counts are exact integers,
    one ratio at 6 dp, degree-1 nodes defined 0. Pinned on a hand-checked
    triangle+pendant graph in test_round14_ops (the first join shape
    keyed wedges on e1.v = e2.u and asymmetrically over- and
    under-counted members -- caught in review, and invisible to the
    oracle because the SQL mirrored the same shape).

    Scale: same reduced brand graph as the triangle op -- all joins run
    on the attribute-grain-bounded edge relation; at general graphs the
    wedge side rides the degree-ordered orientation exactly as
    graph_triangle_count documents."""
    e = _brand_cooccurrence_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # bd + the closing-edge join reuse it
    bd = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    deg = bd.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    w1 = bd.select(F.col("u").alias("node"), F.col("v").alias("x"))
    w2 = bd.select(F.col("u").alias("node"), F.col("v").alias("y"))
    tri = (
        w1.join(F.broadcast(w2), "node")
        .filter(F.col("x") < F.col("y"))
        .join(
            F.broadcast(e.select(F.col("u").alias("x"), F.col("v").alias("y"))),
            ["x", "y"],
        )
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("t"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
            F.round(
                F.when(
                    F.col("d") > 1,
                    2.0 * F.coalesce(F.col("t"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("local_cc"),
        )
    )


@register(
    "graph_edge_jaccard_similarity",
    tags=("graph", "analytics"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    thr AS (
      SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders
    ),
    e AS (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= (SELECT t FROM thr)
    ),
    bd AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM bd GROUP BY 1),
    cn AS (
      SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS c
      FROM e JOIN bd a ON a.u = e.u
             JOIN bd b ON b.u = e.v AND b.v = a.v
      GROUP BY 1, 2
    )
    SELECT e.u, e.v,
           CAST(coalesce(cn.c, 0) AS BIGINT) AS common_neighbors,
           round(CASE WHEN du.d + dv.d - 2 - coalesce(cn.c, 0) > 0
                 THEN CAST(coalesce(cn.c, 0) AS DOUBLE)
                      / (du.d + dv.d - 2 - coalesce(cn.c, 0))
                 ELSE 0 END, 6) AS edge_jaccard
    FROM e
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
    LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
    ORDER BY 1, 2
    """,
)
def graph_edge_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EDGE Jaccard similarity of endpoint neighborhoods on the brand
    co-occurrence graph: for each edge (u, v), |N(u) n N(v)| / |N(u) u
    N(v) \\ {u, v}| -- the local-bridge detector (Satuluri et al. 2011
    use exactly this score for graph sparsification; an edge with
    jaccard ~ 0 connects otherwise-disjoint neighborhoods, i.e. is a
    bridge between communities, while a high score sits inside a dense
    cluster). The edge-grain companion to graph_local_clustering (node
    grain) and the structural input a community-preserving sparsifier
    keeps.

    Exactness: common-neighbor counts come from the wedge join (w is
    adjacent to both endpoints; self-loops cannot occur so no endpoint
    exclusions are needed); the union size is du + dv - 2 - c by
    inclusion-exclusion (each endpoint's set contains the other); one
    rounded division, 0 (not NULL) on the isolated-edge denominator.

    Scale: everything runs on the attribute-reduced edge relation
    (_brand_cooccurrence_edges discipline) -- the wedge join is
    |edges| x max-degree, never fact-sized."""
    e = _brand_cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=False)
    bd = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = bd.groupBy(F.col("u").alias("node")).agg(F.count("*").cast("bigint").alias("d"))
    a = bd.select(F.col("u").alias("eu"), F.col("v").alias("w"))
    b = bd.select(F.col("u").alias("ev"), F.col("v").alias("w2"))
    cn = (
        e.join(a, F.col("u") == F.col("eu"))
        .join(b, (F.col("v") == F.col("ev")) & (F.col("w2") == F.col("w")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    un = F.col("du") + F.col("dv") - 2 - F.col("c0")
    return (
        e.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .join(cn, ["u", "v"], "left")
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)).cast("bigint"))
        .select(
            "u",
            "v",
            F.col("c0").alias("common_neighbors"),
            F.round(
                F.when(un > 0, F.col("c0").cast("double") / un).otherwise(F.lit(0.0)),
                6,
            ).alias("edge_jaccard"),
        )
        .orderBy("u", "v")
    )


def _label_propagation(both_dirs: DataFrame, rounds: int = 4) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007)
    over a symmetrized (u, v) edge relation: every node starts labeled
    with itself; each round it adopts the most frequent label among its
    neighbours, ties broken by MIN label (the determinism knob -- the
    original algorithm breaks ties randomly, which cannot be attested).
    Fixed ``rounds`` synchronous rounds rather than convergence detection:
    synchronous LPA can 2-cycle on bipartite-ish structures, so a bounded
    round count IS the documented semantics, exactness pinned on
    constructed graphs in tests/test_round15_ops.py.

    Scale: each round is one edge-sized join + a (node, label) partial
    agg + a per-node arg-max window on the neighbour-label grain --
    the pagerank shuffle shape; labels re-checkpoint every round so
    lineage stays O(1). The edge relation itself is barriered up front:
    the node seed plus EVERY round's neighbour join consume it, and an
    un-cut caller pipeline (e.g. the brand co-occurrence self-join)
    would re-execute once per round. Isolated nodes keep their own
    label."""
    both_dirs = both_dirs.localCheckpoint(eager=False)
    nodes = both_dirs.select(F.col("u").alias("node")).distinct().localCheckpoint()
    labels = nodes.withColumn("lbl", F.col("node"))
    for _ in range(rounds):
        nb = both_dirs.join(
            labels.select(F.col("node").alias("v"), "lbl"), "v"
        ).select(F.col("u").alias("node"), "lbl")
        freq = nb.groupBy("node", "lbl").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
        best = (
            freq.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint()
        )
    return labels.select("node", F.col("lbl").alias("community"))


@register("graph_label_propagation", tags=("graph", "analytics"))  # rows-only: iterative fixed rounds
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the brand co-occurrence graph by 4-round
    deterministic synchronous label propagation: near-linear community
    structure without a modularity optimization pass -- the standard
    cheap first cut before heavier community methods, and the community
    companion to graph_connected_components (components = reachability;
    LPA splits a connected graph into dense regions).

    Rows-only by declared contract: the per-round most-frequent-neighbour
    fixed point is iterative (recursive SQL cannot re-aggregate neighbour
    label frequencies per round). Semantics pinned by
    tests/test_round15_ops.py on constructed graphs (two cliques joined
    by a bridge split into two communities keyed by their min members;
    a clique collapses to its min label) plus determinism (two runs,
    byte-identical) and the community-label-is-a-member invariant on the
    fixture graph.

    Scale: see _label_propagation -- attribute-reduced graph, one keyed
    shuffle per round."""
    e = _brand_cooccurrence_edges(spark, sf_dir)
    both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return _label_propagation(both).orderBy("node")


# _betweenness is exact all-source Brandes: the (src, node) path relation is
# |V|^2 worst case, so the exact fold is gated to dim-bounded graphs. Above
# this bound the caller must opt into Brandes-Pich source sampling
# (sample_sources=k) or the fold fails LOUDLY instead of silently launching
# an O(V*E) job -- same hard-bound-in-code discipline as
# KCORE_BROADCAST_NODE_CAP. 4096 nodes => <= 16.8M (src, node) rows, well
# inside executor memory at 24 bytes/row.
BETWEENNESS_EXACT_NODE_CAP = 4096


def _betweenness(
    both_dirs: DataFrame,
    max_depth: int = 32,
    exact_node_cap: int = BETWEENNESS_EXACT_NODE_CAP,
    sample_sources: int | None = None,
) -> DataFrame:
    """Exact betweenness centrality via Brandes' algorithm (Brandes 2001)
    run from ALL sources simultaneously as DataFrame passes: a forward
    multi-source BFS accumulating shortest-path counts sigma per
    (source, node) with the level structure of the BFS DAG, then the
    backward dependency sweep delta(v) = sum over DAG successors w of
    (sigma_v / sigma_w) * (1 + delta_w), processed one level at a time
    from the deepest frontier back to the sources. Betweenness(v) =
    sum over sources s != v of delta_s(v), halved because the
    symmetrized relation walks every unordered pair twice.

    Scale: the forward pass is one (frontier join edges) + anti-join +
    partial agg per BFS LEVEL (not per source -- all sources advance in
    the same job), bounded by the graph diameter; the backward pass
    replays the same level count. Every relation carries (src, node)
    pairs -- |V|^2 worst case, the inherent footprint of exact
    betweenness; on the attribute-reduced graphs the engine builds this
    is dim-bounded, and at larger |V| the same fold runs on a sampled
    source set (Brandes-Pich approximation, ``sample_sources=k``): the
    seed relation filters to the k nodes with smallest md5(node) --
    deterministic, approximately uniform -- and per-node dependency sums
    scale by |V|/k (Brandes & Pich 2007 estimator). Exceeding
    ``exact_node_cap`` without opting into sampling raises rather than
    silently launching the |V|^2 job."""
    edges = both_dirs.localCheckpoint()
    nodes = edges.select(F.col("u").alias("node")).distinct().localCheckpoint()
    n_nodes = nodes.count()
    if sample_sources is None:
        if n_nodes > exact_node_cap:
            raise ValueError(
                f"_betweenness: exact all-source Brandes on {n_nodes} nodes "
                f"exceeds exact_node_cap={exact_node_cap} (the (src, node) "
                f"relation is |V|^2); pass sample_sources=k for the "
                f"Brandes-Pich estimate or raise the cap explicitly"
            )
        sources = nodes
        scale = F.lit(1.0)
    else:
        k = min(sample_sources, n_nodes)
        sources = (
            nodes.orderBy(F.md5(F.col("node").cast("string")), "node")
            .limit(k)
            .localCheckpoint()
        )
        scale = F.lit(float(n_nodes) / float(max(k, 1)))
    paths = sources.select(
        F.col("node").alias("src"),
        "node",
        F.lit(0).alias("dist"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint()
    frontier = paths
    depth = 0
    bfs_complete = False
    for level in range(1, max_depth + 1):
        cand = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .groupBy("src", F.col("v").alias("nnode"))
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
            .withColumnRenamed("nnode", "node")
        )
        # checkpoint ONCE before the emptiness probe: isEmpty, the paths
        # union, and the next frontier all consume this relation, and an
        # un-cut 'new' would re-run the level's join+anti-join three times
        new = cand.join(
            paths.select("src", "node"), ["src", "node"], "left_anti"
        ).select("src", "node", F.lit(level).alias("dist"), "sigma").localCheckpoint()
        if new.isEmpty():
            bfs_complete = True
            break
        paths = paths.unionByName(new).localCheckpoint()
        frontier = new
        depth = level
    if not bfs_complete:
        # The loop exhausted max_depth with a non-empty frontier: probe one
        # more level so a diameter-> max_depth graph fails LOUDLY instead of
        # sweeping a truncated BFS DAG into silently wrong centralities.
        more = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select("src", F.col("v").alias("node"))
            .join(paths.select("src", "node"), ["src", "node"], "left_anti")
        )
        if not more.isEmpty():
            raise ValueError(
                f"_betweenness: BFS still expanding at max_depth={max_depth} "
                f"(graph diameter exceeds the bound); raise max_depth -- "
                f"refusing to return centralities from a truncated DAG"
            )
    # backward sweep: deltas finalize level by level, deepest first
    delta = paths.filter(F.col("dist") == depth).withColumn(
        "delta", F.lit(0.0)
    ).localCheckpoint()
    acc = delta
    for level in range(depth - 1, -1, -1):
        cur = paths.filter(F.col("dist") == level)
        succ = delta.select(
            F.col("src").alias("s2"),
            F.col("node").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            cur.join(edges, cur["node"] == edges["u"])
            .join(
                succ,
                (F.col("src") == F.col("s2")) & (F.col("v") == F.col("w")),
            )
            .groupBy("src", "node")
            .agg(
                F.sum(
                    F.col("sigma").cast("double")
                    / F.col("sigma_w")
                    * (1 + F.col("delta_w"))
                ).alias("d")
            )
        )
        delta = (
            cur.join(contrib, ["src", "node"], "left")
            .select(
                "src", "node", "dist", "sigma",
                F.coalesce("d", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )
        acc = acc.unionByName(delta).localCheckpoint()
    return (
        acc.filter(F.col("src") != F.col("node"))
        .groupBy("node")
        .agg(F.round(F.sum("delta") * scale / 2, 6).alias("betweenness"))
    )


@register("graph_betweenness_brandes", tags=("graph", "analytics"))  # rows-only: iterative BFS+sweep
def graph_betweenness_brandes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact betweenness centrality of every brand in the co-occurrence
    graph (Brandes 2001): the share of all-pairs shortest paths passing
    through each node -- THE broker/bottleneck ranking (a high-betweenness
    low-degree brand is a bridge between purchase communities; degree and
    pagerank cannot see that). Completes the centrality set next to
    graph_pagerank (flow), degree (volume), k-core (density position).

    Rows-only by declared contract: forward BFS + backward dependency
    sweep is inherently iterative. Exactness pinned by
    tests/test_round15_ops.py against closed forms on constructed graphs
    (path P4: ends 0, middles 2; star K1,5: hub C(5,2)=10, leaves 0;
    cycle C5: all equal 1) and symmetry/nonnegativity invariants on the
    fixture graph.

    Scale: see _betweenness -- per-LEVEL dataflow, all sources advance
    together; source sampling (Brandes-Pich) is the documented knob at
    large |V|."""
    e = _brand_cooccurrence_edges(spark, sf_dir)
    both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return _betweenness(both).orderBy("node")


@register(
    "graph_rich_club_coefficient",
    tags=("graph", "analytics"),
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    thr AS (
      SELECT CAST(ceil(0.024 * count(*)) AS BIGINT) AS t FROM orders
    ),
    e AS (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= (SELECT t FROM thr)
    ),
    bd AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM bd GROUP BY 1),
    ks AS (
      SELECT CAST(unnest(range(1, (SELECT CAST(max(d) AS INT) FROM deg)))
             AS BIGINT) AS k
    ),
    nk AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
      FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1
    ),
    ek AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
      FROM ks
      JOIN e ON TRUE
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      WHERE du.d > ks.k AND dv.d > ks.k
      GROUP BY 1
    )
    SELECT nk.k AS k, nk.n_nodes,
           CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
           round(CAST(2 * coalesce(ek.n_edges, 0) AS DOUBLE)
                 / (nk.n_nodes * (nk.n_nodes - 1)), 6) AS phi
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    WHERE nk.n_nodes > 1
    ORDER BY k
    """,
)
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) of the brand co-occurrence graph
    (Zhou & Mondragon 2004): for each degree threshold k, the density of
    the subgraph induced by nodes with degree > k -- phi(k) = 2 E_k /
    (N_k (N_k - 1)). A rising phi(k) says the hubs form a club (they
    interconnect far more than chance); flat-or-falling says hub
    traffic routes through the periphery. The global-structure
    companion to graph_degree_assortativity (one correlation) -- this
    is the full curve that number summarizes.

    Exactness: degrees, N_k, and E_k are exact integer counts over the
    thresholded subgraphs; phi is one rounded division. k grid =
    1 .. max_degree - 1, rows emitted only where N_k > 1 (phi defined).

    Scale: everything runs on the attribute-reduced edge relation; the
    k-grid expansion is |edges| x max_degree pairs at worst -- degree-
    bounded, never fact-sized; deg broadcasts into both passes."""
    e = _brand_cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=False)
    bd = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = bd.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    ).localCheckpoint(eager=False)
    ks = (
        deg.agg(F.max("d").cast("int").alias("md"))
        .select(F.explode(F.sequence(F.lit(1), F.col("md") - 1)).alias("k"))
        .select(F.col("k").cast("bigint").alias("k"))
    ).localCheckpoint(eager=False)
    nk = (
        ks.join(deg, F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
    )
    ek = (
        e.join(F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))), "u")
        .join(F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))), "v")
        .crossJoin(ks)
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_nodes") > 1)
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).cast("bigint").alias("n_edges"),
            F.round(
                (2 * F.coalesce("n_edges", F.lit(0))).cast("double")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


def edge_support(edges: DataFrame) -> DataFrame:
    """Triangle support per canonical (u < v) edge within the given edge
    set: the number of common neighbours of u and v. One symmetric
    adjacency self-join keyed on the shared third vertex, then a
    membership semi-check against the canonical edge list -- the same
    wedge-then-close shape as graph_triangle_count, kept at the reduced
    graph's grain."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    uw = sym.select(F.col("u").alias("eu"), F.col("v").alias("w"))
    vw = sym.select(F.col("u").alias("ev"), F.col("v").alias("w2"))
    wedges = (
        edges.join(uw, F.col("u") == F.col("eu"))
        .join(vw, (F.col("v") == F.col("ev")) & (F.col("w") == F.col("w2")))
        .select("u", "v")
    )
    return (
        edges.join(
            wedges.groupBy("u", "v").agg(F.count("*").cast("bigint").alias("support")),
            ["u", "v"],
            "left",
        )
        .select("u", "v", F.coalesce("support", F.lit(0)).alias("support"))
    )


def ktruss_panel(edges: DataFrame, max_k: int = 16) -> list:
    """Truss decomposition by iterative support peeling (Cohen 2008,
    'Trusses: cohesive subgraphs for social network analysis'): the
    k-truss is the maximal subgraph where every edge closes >= k-2
    triangles WITHIN the subgraph. For k = 3, 4, ... peel edges whose
    support drops below k-2 until fixpoint, recording (k, n_edges,
    n_nodes) per surviving truss; stops when the truss empties or max_k
    guards a runaway. Returns a list of row tuples (driver-side: the
    panel is <= max_k rows by construction).

    Scale + a measured trap: each peeling round is the wedge self-join
    over the CURRENT edge relation -- the reduced, attribute-bounded
    graph (brand pairs here), never fact rows. Lineage AND PLAN STATS
    are truncated per round by a scratch-parquet roundtrip, NOT
    localCheckpoint: a checkpoint carries its origin sizeInBytes
    estimate forward, and a MULTIPLICATIVE self-join loop compounds
    those BigInt estimates geometrically until the planner itself OOMs
    computing stats (observed here at ~15 rounds; kcore's semi-join
    peel only ADDS estimates, which is why it can checkpoint). The
    per-round persist is also what a user-grain run wants anyway: real
    file-size stats make the planner's broadcast decisions correct as
    the edge set shrinks."""
    import shutil
    import tempfile

    spark = edges.sparkSession
    scratch = tempfile.mkdtemp(prefix="ktruss_")
    try:
        rows = []
        rnd = 0

        def persist(df, hint_rows=None):
            nonlocal rnd
            rnd += 1
            p = f"{scratch}/r{rnd}"
            if hint_rows is not None:
                # size the write to the (shrinking) edge set: 32 near-empty
                # files per round is pure task overhead on a reduced graph,
                # while a user-grain edge set still fans out at ~100k
                # rows/partition
                df = df.coalesce(max(1, min(32, hint_rows // 100_000 + 1)))
            df.write.parquet(p)
            out = spark.read.parquet(p)
            return out, out.count()

        cur, n_cur = persist(edges)
        for k in range(3, max_k + 1):
            while n_cur > 0:
                nxt, n_next = persist(
                    edge_support(cur)
                    .filter(F.col("support") >= k - 2)
                    .select("u", "v"),
                    hint_rows=n_cur,
                )
                stable = n_next == n_cur
                cur, n_cur = nxt, n_next
                if stable or n_cur == 0:
                    break
            if n_cur == 0:
                break
            n_nodes = (
                cur.select(F.col("u").alias("n"))
                .union(cur.select(F.col("v").alias("n")))
                .distinct()
                .count()
            )
            rows.append((k, n_cur, n_nodes))
        return rows
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register("graph_ktruss", tags=("graph", "analytics"))
# rows-only: iterative truss peeling has no SQL twin (same contract as
# graph_kcore); clique/bowtie closed-form gates in tests/test_round17_ops.py.
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-truss decomposition panel of the brand co-occurrence graph: for
    each k >= 3, the size of the maximal subgraph where every edge sits
    in at least k-2 triangles -- the triangle-reinforced cohesion ladder
    between graph_triangle_count (raw closure) and graph_kcore (degree
    cohesion): a k-core can be held together by one hub, a k-truss
    cannot, which is why truss membership is the standard community-core
    filter on co-purchase graphs."""
    edges = _brand_cooccurrence_edges(spark, sf_dir)
    rows = ktruss_panel(edges)
    schema = "k bigint, n_edges bigint, n_nodes bigint"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema).orderBy("k")


@register(
    "graph_degree_tail_alpha",
    tags=("graph", "stats"),
    oracle="""
    WITH deg AS (
      SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS d
      FROM lineitem GROUP BY l_suppkey
    ),
    top AS (
      SELECT d,
             CAST(row_number() OVER (ORDER BY d DESC, l_suppkey) AS BIGINT)
               AS rk
      FROM deg QUALIFY rk <= 100
    ),
    xk AS (SELECT d AS xk_d FROM top WHERE rk = (SELECT max(rk) FROM top)),
    h AS (
      SELECT CAST(max(top.rk) AS BIGINT) AS k,
             sum(CAST(CASE WHEN top.rk < (SELECT max(rk) FROM top)
                 THEN ln(CAST(top.d AS DOUBLE)) - ln(CAST(xk.xk_d AS DOUBLE))
                 ELSE 0 END AS DECIMAL(20,15))) AS lsum
      FROM top CROSS JOIN xk
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS n_stubs,
             CAST(max(d) AS BIGINT) AS max_degree
      FROM deg
    )
    SELECT s.n_nodes, s.n_stubs, s.max_degree, h.k,
           CAST(xk.xk_d AS BIGINT) AS threshold_degree,
           round(CAST(h.lsum AS DOUBLE) / (h.k - 1), 6) AS hill_h,
           round((h.k - 1) / nullif(CAST(h.lsum AS DOUBLE), 0), 6)
             AS tail_alpha
    FROM s CROSS JOIN h CROSS JOIN xk
    WHERE h.k >= 2
    """,
)
def graph_degree_tail_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution tail index of the supplier-part bipartite
    graph (supplier degree = distinct parts supplied), by the Hill
    estimator over the top-100 degrees -- the scale-free-ness check of
    the graph-analytics suite. alpha near 2 is the Barabasi-Albert
    heavy-tail regime where HUB SUPPLIERS dominate: any per-supplier
    shuffle key (and the wedge counting inside triangle/truss passes)
    inherits that skew, so this one number says whether the
    cdc_hot_key_skew_daily-style mitigations apply to the GRAPH
    operators too. Complements graph_rich_club_coefficient (which asks
    how hubs interconnect; this asks how heavy the hub law is) and
    orders_pareto_tail_index (same estimator, revenue domain).

    Exactness: degrees are exact integer distinct counts; the top-k cut
    is fully tie-broken (degree desc, suppkey); each ln term snaps to
    DECIMAL(20,15) before the order-free sum (the Hill discipline from
    orders_pareto_tail_index); one guarded division.

    Scale: one (supplier, part) distinct agg over the fact table (the
    same reduction the single-source-risk panel rides), TakeOrdered
    top-100, then 100-row arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    deg = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("d")
    ).localCheckpoint(eager=False)  # stats fold + top-k consume it
    top = (
        deg.orderBy(F.col("d").desc(), "l_suppkey")
        .limit(100)
        .select(
            "d",
            F.row_number()
            .over(Window.orderBy(F.col("d").desc(), "l_suppkey"))
            .cast("bigint")
            .alias("rk"),
        )
        .localCheckpoint(eager=False)  # xk + fold consume it
    )
    kmax = top.agg(F.max("rk").alias("km"))
    xk = top.crossJoin(F.broadcast(kmax)).filter(F.col("rk") == F.col("km")).select(
        F.col("d").alias("xk_d")
    )
    h = (
        top.crossJoin(F.broadcast(kmax))
        .crossJoin(F.broadcast(xk))
        .agg(
            F.max("rk").cast("bigint").alias("k"),
            F.sum(
                F.when(
                    F.col("rk") < F.col("km"),
                    (F.log(F.col("d").cast("double")) - F.log(F.col("xk_d").cast("double")))
                    .cast("decimal(20,15)"),
                ).otherwise(F.lit(0).cast("decimal(20,15)"))
            ).alias("lsum"),
        )
    )
    s = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum("d").cast("bigint").alias("n_stubs"),
        F.max("d").cast("bigint").alias("max_degree"),
    )
    return (
        s.crossJoin(F.broadcast(h))
        .crossJoin(F.broadcast(xk))
        .filter(F.col("k") >= 2)
        .select(
            "n_nodes",
            "n_stubs",
            "max_degree",
            "k",
            F.col("xk_d").cast("bigint").alias("threshold_degree"),
            F.round(F.col("lsum").cast("double") / (F.col("k") - 1), 6).alias("hill_h"),
            F.round(
                (F.col("k") - 1) / F.nullif(F.col("lsum").cast("double"), F.lit(0.0)),
                6,
            ).alias("tail_alpha"),
        )
    )


@register("graph_mst_backbone", tags=("graph", "analytics"))
def graph_mst_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-spanning-tree backbone of the brand co-purchase graph by
    distributed Boruvka (Boruvka 1926; the provably parallel MST
    algorithm -- each round every component selects its best incident
    edge, components merge, so rounds are O(log V)): the |brands|-1-edge
    skeleton that keeps every brand connected through its STRONGEST
    co-purchase affinities -- the market-structure backbone chart, and
    the planning graph category-adjacency decisions read (the MST of a
    similarity graph is the classic backbone extraction of Mantegna
    1999's asset-tree construction).

    Rows-only by declared contract: Boruvka's fixed point has no SQL
    twin; closed-form gates in tests/test_round19_ops.py pin a planted
    weighted graph (known MST edge set + total weight), the tree
    invariants |E| = |V| - #components and acyclicity-by-construction,
    and determinism (ties break on the full (w, u, v) lexicographic
    key).

    Scale: rides the ATTRIBUTE-BOUNDED co-occurrence edge relation (the
    graph family contract -- facts collapse to (order, brand) before
    any pair forms). Each Boruvka round is one component-label join +
    one min_by partial agg per component + a component merge via the
    shared _cc_contract (itself O(log) contraction rounds on the
    selected forest, which has <= |components| edges); the loop
    checkpoints per round so lineage stays O(1). At 10^9-node graphs
    the same loop holds: every step is a keyed agg or equi-join on the
    (shrinking) edge/label relations."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("ok_a"), F.col("p_brand").alias("u"))
    b = ob.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("v"))
    edges = (
        a.join(b, (F.col("ok_a") == F.col("ok_b")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    return mst_backbone(edges)


def mst_backbone(edges: DataFrame) -> DataFrame:
    """Distributed Boruvka over canonical (u < v, n) weighted edges --
    MAXIMUM spanning forest on affinity n (equivalently the minimum
    spanning forest on w = -n), deterministic via the full
    (-n, u, v) lexicographic selection key. Returns (u, v, n) MST edges.
    See graph_mst_backbone for the contract."""
    spark = edges.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame([], "u string, v string, n bigint")
    comp = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select("v"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    mst = spark.createDataFrame([], "u string, v string, n bigint")
    for _ in range(32):  # O(log |V|) rounds; 32 covers 2^32 nodes
        lab = edges.join(
            comp.select(F.col("node").alias("u"), F.col("component").alias("cu")), "u"
        ).join(
            comp.select(F.col("node").alias("v"), F.col("component").alias("cv")), "v"
        ).filter(F.col("cu") != F.col("cv"))
        if lab.isEmpty():
            break
        # each component's best incident edge under the TOTAL order
        # (n desc, u asc, v asc) -- both endpoints' components agree on
        # ties, so the selected forest is cycle-free
        selw = (
            lab.select(F.col("cu").alias("c"), "u", "v", "n")
            .union(lab.select(F.col("cv").alias("c"), "u", "v", "n"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("c").orderBy(
                        F.col("n").desc(), F.col("u"), F.col("v")
                    )
                ),
            )
            .filter(F.col("rk") == 1)
            .select("u", "v", "n")
            .distinct()
            .localCheckpoint()
        )
        mst = mst.union(selw).distinct().localCheckpoint()
        # merge components across the selected forest (tiny: <= |components|
        # edges), via the shared contraction CC
        forest = selw.join(
            comp.select(F.col("node").alias("u"), F.col("component").alias("cu")), "u"
        ).join(
            comp.select(F.col("node").alias("v"), F.col("component").alias("cv")), "v"
        ).select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        sym = forest.union(
            forest.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        merged = _cc_contract(sym)  # (node=old component, component=new)
        comp = (
            comp.join(
                merged.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("new_c"),
                ),
                "component",
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("new_c"), F.col("component")).alias("component"),
            )
            .localCheckpoint()
        )
    return mst.orderBy(F.col("n").desc(), "u", "v")


@register("graph_modularity_eval", tags=("graph", "analytics"))
# rows-only: grades the label-propagation fit, which is itself iterative
# with no SQL twin; two-clique / single-clique gates in test_round21_ops.
def graph_modularity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition: Q =
    sum_c [ m_c/m - (d_c / 2m)^2 ] over communities c (within-community
    edge share minus the degree-preserving random expectation). The
    quality number that says whether graph_label_propagation's cheap
    communities are REAL structure (Q well above 0) or noise (Q near 0)
    -- the graph twin of cluster_purity_nmi_eval, grading the SAME LPA
    fit on the brand co-occurrence graph. One row per community plus
    its contribution; read the Q total off the sum (pytest pins the
    clique cases: one clique -> Q = 0, two disjoint cliques -> Q = 1/2).

    Exactness: m, m_c, d_c are exact integer edge/degree sums from one
    keyed agg over the (node -> community) join; each contribution does
    two divisions of identical doubles at 6dp.

    Scale: the LPA fit is the documented per-round keyed shuffle; the
    eval adds one community-keyed partial agg of the attribute-reduced
    edge relation -- |communities| rows out."""
    e = _brand_cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=False)
    both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = _label_propagation(both).select(
        "node", F.col("community").alias("comm")
    ).localCheckpoint(eager=False)
    m = e.count()  # undirected edge count (1-row fence, audit-sized)
    if m == 0:
        return spark.createDataFrame(
            [],
            "community bigint, n_nodes bigint, within_edges bigint,"
            " degree_sum bigint, q_contribution double",
        )
    lu = labels.select(F.col("node").alias("u"), F.col("comm").alias("cu"))
    lv = labels.select(F.col("node").alias("v"), F.col("comm").alias("cv"))
    tagged = e.join(F.broadcast(lu), "u").join(F.broadcast(lv), "v")
    within = (
        tagged.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").cast("bigint").alias("within_edges"))
    )
    deg = (
        both.join(F.broadcast(lu), "u")
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").cast("bigint").alias("degree_sum"))
    )
    nn = labels.groupBy(F.col("comm").alias("community")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    return (
        nn.join(deg, "community", "left")
        .join(within, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("within_edges"), F.lit(0)).cast("bigint").alias(
                "within_edges"
            ),
            F.coalesce(F.col("degree_sum"), F.lit(0)).cast("bigint").alias(
                "degree_sum"
            ),
            F.round(
                F.coalesce(F.col("within_edges"), F.lit(0)).cast("double") / m
                - (
                    F.coalesce(F.col("degree_sum"), F.lit(0)).cast("double")
                    / (2.0 * m)
                )
                ** 2,
                6,
            ).alias("q_contribution"),
        )
        .orderBy("community")
    )
