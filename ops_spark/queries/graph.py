"""Graph queries: iterative algorithms as DataFrame join loops.

The reference ships GraphX (reference: graphx/.../GraphOps.scala —
connectedComponents:433, pageRank:379, pregel:362); SURVEY §1 scopes the
GraphX module out but records that graph ops are "expressible via
joins/iterations". These queries make that concrete AND oracle-checkable:
fixed-iteration PageRank unrolls to plain SQL, and connected components is
a recursive-CTE transitive closure in DuckDB.

Scale posture: both operators (operators/graph.py) cut lineage per round
with localCheckpoint, shuffle only on vertex/edge keys, and converge in
O(log n) rounds (CC) / fixed rounds (PageRank) — the standard iterative
pattern for 100 TB graphs when a Pregel runtime is not available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.operators.graph import connected_components, pagerank, triangle_count
from ops_spark.operators.pregel import MSG, pregel
from ops_spark.queries.registry import register


def _order_part_edges(spark: SparkSession, sf_dir: str, max_order: int) -> DataFrame:
    """Bipartite order↔part co-purchase edges; part ids offset into a
    disjoint range so both sides share one vertex-id space."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= max_order)
    return li.select(
        F.col("l_orderkey").alias("a"),
        (F.col("l_partkey") + F.lit(1000000)).alias("b"),
    ).distinct()


@register(
    "graph_label_propagation",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
      FROM lineitem WHERE l_orderkey <= 100
    ),
    edges AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    l0 AS (SELECT id, id AS label FROM nodes),
    c1 AS (SELECT e.a AS id, l.label, count(*) AS c
           FROM edges e JOIN l0 l ON l.id = e.b GROUP BY 1, 2),
    b1 AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (
               PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM c1)
           WHERE rn = 1),
    l1 AS (SELECT l.id, coalesce(b.label, l.label) AS label
           FROM l0 l LEFT JOIN b1 b USING (id)),
    c2 AS (SELECT e.a AS id, l.label, count(*) AS c
           FROM edges e JOIN l1 l ON l.id = e.b GROUP BY 1, 2),
    b2 AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (
               PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM c2)
           WHERE rn = 1),
    l2 AS (SELECT l.id, coalesce(b.label, l.label) AS label
           FROM l1 l LEFT JOIN b2 b USING (id)),
    c3 AS (SELECT e.a AS id, l.label, count(*) AS c
           FROM edges e JOIN l2 l ON l.id = e.b GROUP BY 1, 2),
    b3 AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (
               PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM c3)
           WHERE rn = 1),
    l3 AS (SELECT l.id, coalesce(b.label, l.label) AS label
           FROM l2 l LEFT JOIN b3 b USING (id))
    SELECT label AS community, count(*) AS n_nodes
    FROM l3 GROUP BY 1
    """,
    description="Label-propagation community detection (GraphFrames "
    "labelPropagation kin; Raghavan et al. 2007) over the bipartite "
    "order-part graph: 3 synchronous rounds, most-frequent-neighbor "
    "label, ties to the smallest label — fully deterministic, so the "
    "oracle unrolls the identical rounds as chained CTEs. Per round: one "
    "edge⋈label equi join, one combinable (vertex,label) count, one "
    "per-vertex window bounded by neighbor-label cardinality.",
    tags=("graph", "iterative", "custom-operator", "llm"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.graph import label_propagation

    edges = _order_part_edges(spark, sf_dir, max_order=100)
    lab = label_propagation(edges, src="a", dst="b", iterations=3)
    return lab.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@register(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
      FROM lineitem WHERE l_orderkey <= 100
    ),
    edges AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS a, id AS b FROM nodes
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    ),
    comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a)
    SELECT comp, count(*) AS n_nodes FROM comp GROUP BY comp
    """,
    description="Connected components (GraphX connectedComponents:433 kin) "
    "over the bipartite order-part graph via pointer-jumping min-label "
    "propagation (O(log diameter) rounds); oracle is a recursive-CTE "
    "transitive closure. Subgraph bounded at 100 orders: component "
    "diameter drives round count, and each extra round is a fixed "
    "per-iteration job cost on tiny fixture data.",
    tags=("graph", "iterative", "custom-operator"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _order_part_edges(spark, sf_dir, max_order=100)
    comp = connected_components(edges, src="a", dst="b")
    return comp.groupBy("comp").agg(F.count("*").alias("n_nodes"))


@register(
    "graph_pagerank",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000 AS dst
      FROM lineitem WHERE l_orderkey <= 500
    ),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS out_deg FROM e GROUP BY src),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    c1 AS (SELECT e.dst AS id, sum(r.rank / d.out_deg) AS contrib
           FROM e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r1 AS (SELECT nodes.id,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * coalesce(c.contrib, 0) AS rank
           FROM nodes LEFT JOIN c1 c ON c.id = nodes.id),
    c2 AS (SELECT e.dst AS id, sum(r.rank / d.out_deg) AS contrib
           FROM e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r2 AS (SELECT nodes.id,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * coalesce(c.contrib, 0) AS rank
           FROM nodes LEFT JOIN c2 c ON c.id = nodes.id),
    c3 AS (SELECT e.dst AS id, sum(r.rank / d.out_deg) AS contrib
           FROM e JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r3 AS (SELECT nodes.id,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * coalesce(c.contrib, 0) AS rank
           FROM nodes LEFT JOIN c3 c ON c.id = nodes.id)
    SELECT id, round(rank, 6) AS rank
    FROM r3
    """,
    description="PageRank, 3 fixed power iterations (GraphX pageRank:379 "
    "kin) over the supplier→part shipment graph as pure DataFrame joins; "
    "oracle is the same recurrence unrolled to SQL.",
    tags=("graph", "iterative", "custom-operator"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + F.lit(1000000)).alias("dst"),
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


@register(
    "graph_triangle_count",
    oracle="""
    WITH co AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey <= 300 AND b.l_orderkey <= 300
    ),
    tri AS (
      SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
      FROM co e1
      JOIN co e2 ON e2.p1 = e1.p2
      JOIN co e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT id, CAST(count(*) AS BIGINT) AS triangles
    FROM (
      SELECT a AS id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    GROUP BY id
    """,
    description="Per-vertex triangle counts (GraphX triangleCount:452 kin) "
    "over the part-part co-purchase graph (parts sharing an order form a "
    "clique). Spark side enumerates via degree-ordered compact-forward "
    "wedges (skew-proof: oriented out-degree is O(sqrt(m))); oracle "
    "enumerates each triangle once as a < b < c. Per-vertex counts are "
    "enumeration-order independent, so both agree exactly.",
    tags=("graph", "custom-operator"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    co = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    return triangle_count(co, src="pa", dst="pb")


@register(
    "graph_sssp",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
      FROM lineitem WHERE l_orderkey <= 60
    ),
    edges AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    walk AS (
      SELECT (SELECT min(id) FROM nodes) AS id, 0 AS d
      UNION
      SELECT e.b AS id, w.d + 1 AS d
      FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.d < 8
    )
    SELECT id, CAST(min(d) AS INT) AS dist FROM walk GROUP BY id
    """,
    description="Single-source shortest paths, 8 BFS supersteps (GraphX "
    "pregel:362 / ShortestPaths kin) over the order-part bipartite graph, "
    "expressed through the GENERIC pregel operator (operators/pregel.py) "
    "— message = dist+1 both directions, inbox min, update least. Fixed "
    "superstep count keeps the run oracle-expressible as a depth-bounded "
    "recursive CTE; vertices unreached within 8 hops are excluded on both "
    "sides. Source = min vertex id (driver pulls one scalar, like an "
    "index-metadata read).",
    tags=("graph", "iterative", "custom-operator"),
)
def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _order_part_edges(spark, sf_dir, max_order=60)
    edges = base.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    vertices = (
        base.select(F.col("a").alias("id"))
        .union(base.select("b"))
        .distinct()
    )
    source = vertices.agg(F.min("id")).head()[0]
    init = vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0)).alias("dist"),
    )
    final = pregel(
        init,
        edges,
        update={"dist": F.least(F.col("dist"), F.col(MSG))},
        agg=F.min(F.col(MSG)),
        msg_to_dst=F.col("src_dist") + 1,
        msg_to_src=F.col("dst_dist") + 1,
        max_iter=8,
    )
    return final.filter(F.col("dist").isNotNull()).select(
        "id", F.col("dist").cast("int").alias("dist")
    )


@register(
    "graph_k_core",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
      FROM lineitem WHERE l_orderkey % 971 < 15
    ),
    e0 AS (SELECT a AS u, b AS v FROM base UNION SELECT b, a FROM base),
    d1 AS (SELECT u, count(*) AS c FROM e0 GROUP BY u),
    k1 AS (SELECT u FROM d1 WHERE c >= 2),
    e1 AS (SELECT e.u, e.v FROM e0 e JOIN k1 x ON e.u = x.u
                                     JOIN k1 y ON e.v = y.u),
    d2 AS (SELECT u, count(*) AS c FROM e1 GROUP BY u),
    k2 AS (SELECT u FROM d2 WHERE c >= 2),
    e2 AS (SELECT e.u, e.v FROM e1 e JOIN k2 x ON e.u = x.u
                                     JOIN k2 y ON e.v = y.u),
    d3 AS (SELECT u, count(*) AS c FROM e2 GROUP BY u),
    k3 AS (SELECT u FROM d3 WHERE c >= 2),
    e3 AS (SELECT e.u, e.v FROM e2 e JOIN k3 x ON e.u = x.u
                                     JOIN k3 y ON e.v = y.u),
    deg AS (SELECT u, count(*) AS c FROM e3 GROUP BY u)
    SELECT u AS id, CAST(c AS BIGINT) AS core_degree
    FROM deg WHERE c >= 2
    """,
    description="k-core decomposition (operators/graph.py:k_core; "
    "Seidman 1983) over the bipartite order-part graph: 3 synchronous "
    "peel rounds at k=2, each removing every vertex whose current "
    "degree is < k plus its edges — the structural fringe filter run "
    "on near-dup similarity graphs before community detection. Fixed "
    "round count makes the peel fully deterministic, so the oracle "
    "unrolls the identical rounds as chained CTEs (the LPA "
    "discipline); the operator also supports peel-to-convergence "
    "(pytest-pinned against NetworkX-style reference peeling).",
    tags=("graph", "iterative", "custom-operator", "llm"),
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.io import load_table
    from ops_spark.operators.graph import k_core

    # modulo subset, not a key-range cut: stays a fixed FRACTION of the
    # corpus at any derived scale (a <=N range degenerates to near-empty
    # under the 100x key multiplication)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 971 < 15
    )
    edges = li.select(
        F.col("l_orderkey").alias("a"),
        (F.col("l_partkey") + F.lit(1000000)).alias("b"),
    ).distinct()
    return k_core(edges, src="a", dst="b", k=2, rounds=3)
