"""Iterative graph operators expressed as DataFrame joins.

The reference ships GraphX (reference: graphx/.../GraphOps.scala —
connectedComponents:433, pregel:362); SURVEY §1 scopes graph processing out
of the core build but notes it is "expressible via joins/iterations". This
module makes that claim concrete with the one graph algorithm a dedup
pipeline actually needs: connected components over the near-duplicate pair
graph, so A~B, B~C dedups {A,B,C} to one survivor even when A!~C.

Algorithm: iterative label propagation to the minimum member id
(large-/small-star simplification). Each round is two equi-joins + a
min-aggregate — all shuffle-friendly; convergence in O(log n) rounds for
typical near-dup graphs (components are tiny cliques). Lineage is cut with
localCheckpoint each round so the plan does not grow with iterations —
required for any iterative DataFrame algorithm at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every vertex; component = min id in the component.

    edges: undirected pair list. Terminates early when labels stop changing.
    """
    verts = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    labels = verts.withColumn("comp", F.col("id")).localCheckpoint()
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    for it in range(max_iterations):
        # each vertex adopts min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        propagated = labels.join(
            neighbor_min, labels.id == neighbor_min.u, "left"
        ).select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping (comp := comp(comp)): halves label-tree depth each
        # round, so convergence is O(log diameter) instead of O(diameter) —
        # neighbor propagation alone needs diameter rounds, which a chain
        # graph exhausts long before max_iterations.
        jump = propagated.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        new_labels = (
            propagated.join(jump, propagated.comp == jump.jid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # cut lineage: plan must not grow per round
        )
        # convergence probe every second round: with pointer jumping the
        # label tree collapses in O(log n) rounds, so the probe (a full
        # join + count job, as expensive as a propagation round on small
        # state) is worth amortizing; at most one extra round runs.
        if it % 2 == 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            if changed == 0:
                return new_labels.select("id", "comp")
        labels = new_labels
    return labels.select("id", "comp")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) after a fixed number of power iterations.

    Classic PageRank (reference: graphx/.../GraphOps.scala pageRank:379,
    PageRank.scala) as pure DataFrame joins: each iteration is
    contributions = edges ⋈ ranks ⋈ out-degree, grouped on dst, then a
    left join back onto the vertex set (vertices without in-edges keep the
    teleport term only; dangling-node mass is not redistributed, matching
    the simple formulation). Lineage is cut per round with localCheckpoint.
    Fixed iteration count (not convergence-tested) keeps the result
    deterministic and oracle-expressible as unrolled SQL.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    graph = e.join(deg, "src").localCheckpoint()  # (src, dst, out_deg)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            graph.join(ranks, graph.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Transitive-closure dedup: keep the minimum id of each duplicate
    component (the correct semantics when near-duplication chains —
    the single-pass alternative in minhash_lsh_dedup drops pair losers
    without closing the transitive chain)."""
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
