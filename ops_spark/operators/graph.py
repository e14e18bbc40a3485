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

from ops_spark.operators.blocks import (
    adopt_tracking,
    free_checkpoint,
    tracked_local_checkpoint,
)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every vertex; component = min id in the component.

    edges: undirected pair list. Terminates early when labels stop changing.
    """
    # Materialize the edge input ONCE: verts and sym both derive from it,
    # and without this an expensive upstream plan (e.g. the prefix-filtered
    # exact-Jaccard pair join feeding transitive dedup) would be evaluated
    # twice — once per eager checkpoint below (measured: the 100× pair plan
    # costs ~54 s per evaluation; this halved llm_transitive_dedup).
    ein = tracked_local_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    verts = (
        ein.select(F.col("u").alias("id"))
        .union(ein.select(F.col("v").alias("id")))
        .distinct()
    )
    labels = tracked_local_checkpoint(verts.withColumn("comp", F.col("id")))
    sym = tracked_local_checkpoint(
        ein.union(ein.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    free_checkpoint(ein)  # labels/sym materialized eagerly above
    from pyspark.sql import Observation

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
            F.col("comp").alias("__prev"),  # pre-round label, for the probe
        )
        # pointer jumping (comp := comp(comp)): halves label-tree depth each
        # round, so convergence is O(log diameter) instead of O(diameter) —
        # neighbor propagation alone needs diameter rounds, which a chain
        # graph exhausts long before max_iterations.
        jump = propagated.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        # convergence probe as a df.observe at the PLAN ROOT, collected as
        # a side effect of the eager localCheckpoint that materializes the
        # round (the k_core discipline) — zero extra jobs, so it runs
        # EVERY round instead of every second one and the loop exits the
        # moment the labels are stable (the former join + limit(1).count()
        # probe cost a full propagation-sized job and was amortized to
        # alternate rounds, running one extra round on average).
        obs = Observation()
        new_labels = tracked_local_checkpoint(  # cut lineage per round
            propagated.join(jump, propagated.comp == jump.jid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))
                ).alias("comp"),
                "__prev",
            )
            .observe(obs, F.count(F.when(F.col("comp") != F.col("__prev"), 1))
                     .alias("changed"))
        )
        if obs.get["changed"] == 0:
            free_checkpoint(labels)
            free_checkpoint(sym)
            return adopt_tracking(new_labels, new_labels.select("id", "comp"))
        # new_labels is materialized (eager checkpoint): the superseded
        # round's RDD blocks can go — released via the JVM RDD handle
        # (DataFrame.unpersist alone would leave localCheckpoint blocks
        # pinned for the session's lifetime).
        free_checkpoint(labels)
        labels = new_labels
    free_checkpoint(sym)
    return adopt_tracking(labels, labels.select("id", "comp"))


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
    if iterations < 1:
        # iterations=0 would return the lazy, un-checkpointed seed derived
        # from `nodes`, whose blocks the free_checkpoint below releases —
        # evaluating that result later would fail (truncated lineage).
        raise ValueError("pagerank requires iterations >= 1")
    from pyspark.sql import Observation

    # Materialize the (possibly expensive) edge input ONCE: nodes, deg and
    # graph all derive from it — un-checkpointed, the upstream plan would
    # execute three times during setup (the connected_components discipline).
    ein = tracked_local_checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    # vertex count rides the nodes checkpoint as an observe — the former
    # standalone nodes.count() job is free
    obs = Observation()
    nodes = tracked_local_checkpoint(
        ein.select(F.col("src").alias("id"))
        .union(ein.select(F.col("dst").alias("id")))
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    n = obs.get["n"]
    deg = ein.groupBy("src").agg(F.count("*").alias("out_deg"))
    graph = tracked_local_checkpoint(ein.join(deg, "src"))  # (src, dst, out_deg)
    free_checkpoint(ein)  # nodes/graph materialized eagerly above
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contribs = (
            graph.join(ranks, graph.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        prev = ranks
        ranks = tracked_local_checkpoint(
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if i > 0:  # round 0's prev is the un-checkpointed seed
            free_checkpoint(prev)
    # the returned ranks checkpoint has truncated lineage (materialized
    # eagerly), so its inputs' pinned RDD blocks are no longer needed
    free_checkpoint(nodes)
    free_checkpoint(graph)
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """(id, triangles) — per-vertex triangle membership counts (GraphX
    parity: reference graphx/.../GraphOps.scala triangleCount:452).

    Degree-ordered compact-forward enumeration: orient every undirected
    edge from the endpoint with smaller (degree, id) to the larger, then a
    triangle is exactly one wedge (u→v, u→w with v ordered before w) whose
    closing edge (v→w) exists in the oriented set. Each triangle is found
    once, and — the scale property — every vertex's out-degree in the
    oriented DAG is O(√m), so wedge enumeration is bounded by m^1.5 total
    work in equi-joins regardless of skew (a celebrity vertex with 10M
    followers contributes in-edges, not wedges). No global sort: the
    orientation compares (degree, id) tuples attached via two equi-joins
    with the degree table.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .filter(F.col("x") < F.col("y"))  # drops self-loops
        .distinct()
    )
    deg = (
        e.select(F.col("x").alias("id"))
        .unionAll(e.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    # Orient by (degree, id): u → v iff (d_u, u) < (d_v, v).
    with_deg = (
        e.join(deg.withColumnRenamed("id", "x").withColumnRenamed("d", "dx"), "x")
        .join(deg.withColumnRenamed("id", "y").withColumnRenamed("d", "dy"), "y")
    )
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oe = with_deg.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(x_first, F.col("dy")).otherwise(F.col("dx")).alias("dv"),
    ).localCheckpoint()  # reused 3× below; cut the self-join lineage
    e1 = oe.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    e2 = oe.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oe.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tri.select(F.explode(F.array("u", "v1", "v2")).alias("id"))
    return corners.groupBy("id").agg(F.count("*").alias("triangles"))


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


def label_propagation(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA, Raghavan
    et al. 2007; the GraphFrames labelPropagation shape) — the clustering
    pass that groups near-duplicate template families after dedup has
    produced similarity edges.

    DETERMINISTIC variant: every round each vertex adopts the most
    frequent label among its NEIGHBORS (ties → smallest label; isolated
    vertices keep their own), synchronously, for a fixed iteration
    count. The paper's asynchronous random-order/random-tie walk is
    irreproducible by design; the synchronous rule makes runs and
    engines agree bit-for-bit. Known property: synchronous LPA can
    oscillate 2-cycles on bipartite structures — with a fixed round
    count the output is still exact and reproducible, which is what a
    conformance-gated pipeline needs.

    Scale contract: per round, one equi join (edges ⋈ labels on the
    vertex key), one map-side-combinable (vertex, label) count, one
    per-vertex window bounded by the vertex's distinct neighbor-label
    count — never corpus-wide. Lineage cut per round via
    localCheckpoint (blocks.py contract).
    """
    from pyspark.sql.window import Window as W

    ein = tracked_local_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    verts = (
        ein.select(F.col("u").alias("id"))
        .union(ein.select(F.col("v").alias("id")))
        .distinct()
    )
    labels = tracked_local_checkpoint(
        verts.withColumn("label", F.col("id"))
    )
    sym = tracked_local_checkpoint(
        ein.union(ein.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    free_checkpoint(ein)
    w = W.partitionBy("u").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("u").alias("bid"), F.col("label").alias("blabel"))
        )
        new_labels = tracked_local_checkpoint(
            labels.join(best, labels.id == best.bid, "left").select(
                "id", F.coalesce("blabel", "label").alias("label")
            )
        )
        free_checkpoint(labels)
        labels = new_labels
    free_checkpoint(sym)
    return adopt_tracking(labels, labels.select("id", "label"))


def k_core(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 2,
    rounds: int | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    GraphX/GraphFrames-adjacent structural filter a similarity graph
    needs before community detection: drop the weakly-connected fringe
    so near-dup clusters are cohesive, not chained through one-off
    pairs).

    Each round removes every vertex whose CURRENT degree is < k along
    with its edges; the maximal k-core is the unique fixed point, so the
    result is deterministic and order-independent. ``rounds=None`` peels
    to convergence, detected INSIDE the peel job itself: a ``df.observe``
    surviving-edge count rides the ROOT of the peeled plan and is
    collected as a side effect of the localCheckpoint that materializes
    it — so convergence costs ZERO extra jobs (one job per round, not a
    count job plus a peel job). Edge-count fixpoint ⟺ vertex fixpoint:
    every vertex in the edge list has degree ≥ 1, so any drop removes
    edges. (The metric sits at the plan root, not on the ``keep`` branch
    — a branch metric is silently lost in the round AQE empty-propagates
    the semi-join.) A fixed ``rounds`` runs exactly that many peels,
    which lets a conformance oracle unroll the identical rounds as
    chained SQL CTEs (the LPA discipline).

    Scale contract, per round: one map-combinable degree count (shuffle
    keyed on the vertex), two semi joins edge⋉survivors (same key — AQE
    reuses the exchange), lineage cut via localCheckpoint so the plan
    never grows with iterations. Peel rounds needed = core number spread,
    typically O(log n) for similarity graphs.

    Returns (id, core_degree): the vertices of the k-core with their
    degree INSIDE the core (all >= k once converged).
    """
    from pyspark.sql import Observation

    ein = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = tracked_local_checkpoint(
        ein.union(ein.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_ne = None
    i = 0
    while True:
        i += 1
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        peeled = sym.join(keep, "u", "leftsemi").join(
            keep.select(F.col("u").alias("v")), "v", "leftsemi"
        )
        obs = None
        if rounds is None:
            obs = Observation()
            peeled = peeled.observe(obs, F.count(F.lit(1)).alias("ne"))
        new_sym = tracked_local_checkpoint(peeled)
        free_checkpoint(sym)
        sym = new_sym
        if obs is not None:
            ne = obs.get["ne"]  # already collected by the eager checkpoint
            if ne == prev_ne or ne == 0:
                break  # fixed point (or empty core): nothing was removed
            prev_ne = ne
        if rounds is not None and i >= rounds:
            break
    out = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("u").alias("id"), "core_degree")
    )
    return adopt_tracking(sym, out)
