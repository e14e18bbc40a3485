"""Generic Pregel: bulk-synchronous vertex programs as DataFrame rounds.

Parity target: GraphX's pregel (reference: graphx/src/main/scala/org/apache/
spark/graphx/GraphOps.scala pregel:362, Pregel.scala) — the general form
behind connectedComponents/pageRank/shortestPaths. The specialized loops in
operators/graph.py stay (they fuse their update logic for fewer joins); this
operator covers the open-ended case: any algorithm a user would have written
against GraphX's API.

Column-expression API (the GraphFrames Pregel shape, rebuilt on public
DataFrame primitives): per superstep,

1. triplets  = edges ⋈ vertex-state(src) ⋈ vertex-state(dst)
2. messages  = msg_to_dst / msg_to_src expressions over the triplet
   (columns: ``edge_*``, ``src_*``, ``dst_*``), nulls dropped
3. inbox     = messages grouped per target vertex under ``agg``
4. new state = ``update`` expressions over old state + ``_msg`` (null when
   the vertex received nothing this round)

Scale posture: every superstep is two equi-joins + one keyed aggregate —
all hash-partitioned on vertex id, AQE-skew-splittable, no driver data path.
Lineage is cut per round with localCheckpoint (mandatory for iterative
DataFrame plans). Convergence: fixed ``max_iter``, with optional early stop
when no vertex state changed (one anti-join probe per round, amortized by
``check_every``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ops_spark.operators.blocks import free_checkpoint, tracked_local_checkpoint

MSG = "_msg"


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    update: dict[str, Column],
    agg: Column,
    msg_to_dst: Column | None = None,
    msg_to_src: Column | None = None,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    check_every: int = 0,
) -> DataFrame:
    """Run a vertex program; returns the final vertex-state DataFrame.

    vertices: (id, *state) — initial state, one row per vertex.
    edges: (src, dst, *edge attrs) — directed; emit both msg_to_dst and
        msg_to_src for undirected semantics.
    msg_to_dst / msg_to_src: message expressions over triplet columns
        ``src_<col>`` / ``dst_<col>`` / ``edge_<col>``; null = no message.
    agg: aggregate over ``F.col(MSG)`` combining a vertex's inbox.
    update: {state_col: expression over old state cols + MSG} applied to
        every vertex each round (MSG is null for an empty inbox — express
        "keep state" with coalesce/least as the algorithm requires).
    check_every: probe for convergence (no state changed) every N rounds;
        0 disables the probe (pure fixed-iteration, fully deterministic
        round count — required when the result feeds an unrolled-SQL oracle).
    """
    if msg_to_dst is None and msg_to_src is None:
        raise ValueError("at least one of msg_to_dst / msg_to_src is required")
    state_cols = [c for c in vertices.columns if c != id_col]
    unknown = set(update) - set(state_cols)
    if unknown:
        raise ValueError(f"update targets unknown state columns: {sorted(unknown)}")

    state = tracked_local_checkpoint(
        vertices.select(F.col(id_col).alias("id"), *state_cols)
    )
    e = tracked_local_checkpoint(
        edges.select(
            F.col(src).alias("edge_src"),
            F.col(dst).alias("edge_dst"),
            *[
                F.col(c).alias(f"edge_{c}")
                for c in edges.columns
                if c not in (src, dst)
            ],
        )
    )

    for it in range(max_iter):
        src_state = state.select(
            F.col("id").alias("edge_src"),
            *[F.col(c).alias(f"src_{c}") for c in state_cols],
        )
        dst_state = state.select(
            F.col("id").alias("edge_dst"),
            *[F.col(c).alias(f"dst_{c}") for c in state_cols],
        )
        triplets = e.join(src_state, "edge_src").join(dst_state, "edge_dst")
        outboxes = []
        if msg_to_dst is not None:
            outboxes.append(
                triplets.select(
                    F.col("edge_dst").alias("id"), msg_to_dst.alias(MSG)
                )
            )
        if msg_to_src is not None:
            outboxes.append(
                triplets.select(
                    F.col("edge_src").alias("id"), msg_to_src.alias(MSG)
                )
            )
        msgs = outboxes[0] if len(outboxes) == 1 else outboxes[0].unionByName(outboxes[1])
        inbox = (
            msgs.filter(F.col(MSG).isNotNull())
            .groupBy("id")
            .agg(agg.alias(MSG))
        )
        new_state = tracked_local_checkpoint(
            state.join(inbox, "id", "left").select(
                "id",
                *[update.get(c, F.col(c)).alias(c) for c in state_cols],
            )
        )
        if check_every and (it + 1) % check_every == 0:
            changed = (
                new_state.alias("n")
                .join(state.alias("o"), "id")
                .filter(
                    " OR ".join(
                        f"NOT (n.{c} <=> o.{c})" for c in state_cols
                    )
                )
                .limit(1)
                .count()
            )
            if changed == 0:
                free_checkpoint(state)
                free_checkpoint(e)
                return new_state
        # new_state is materialized (eager checkpoint); drop the superseded
        # round's pinned RDD blocks (via the JVM handle — plain
        # DataFrame.unpersist leaves localCheckpoint blocks pinned) so long
        # loops don't accrete executor memory.
        free_checkpoint(state)
        state = new_state
    free_checkpoint(e)
    return state
