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

Scale posture: every superstep is equi-joins + one keyed aggregate — all
hash-partitioned on vertex id, AQE-skew-splittable, no driver data path.
Like GraphX's ``tripletFields`` optimization, the operator analyzes which
triplet sides each message expression actually references (a driver-side
resolution probe against an empty frame — no job): when every message reads
only the OPPOSITE side's state (the common vertex-program shape: a vertex
sends a function of its own state along its edges), the 3-way triplets join
collapses to ONE state join over the direction-tagged edge union, and when
the full triplet is genuinely needed, both messages are emitted from a
single execution of the join via ``explode`` instead of a self-union that
would run the join twice. Lineage is cut per round with localCheckpoint
(mandatory for iterative DataFrame plans). Convergence: fixed ``max_iter``
with early exit when no vertex state changed — detected by a ``df.observe``
count riding the round's eager checkpoint (zero extra jobs), so it runs
every round. Early exit never changes the result: a round that changed
nothing is a fixed point, so all remaining rounds would compute the
identical state (deterministic message/update expressions assumed — the
same assumption reproducible vertex programs already make).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ops_spark.operators.blocks import (
    adopt_tracking,
    free_checkpoint,
    tracked_local_checkpoint,
)

MSG = "_msg"


def _resolves(spark, expr: Column, fields) -> bool:
    """Whether ``expr`` analyzes against a frame with exactly ``fields``.

    Driver-only probe over an empty LocalRelation — no Spark job. Used to
    detect which triplet sides a message expression references (GraphX
    tripletFields kin)."""
    from pyspark.sql.types import StructType

    try:
        spark.createDataFrame([], StructType(fields)).select(expr)
        return True
    except Exception:  # noqa: BLE001 — unresolved column / type error
        return False


def _probe_schema(spark, expr: Column, fields):
    """The (name, type) signature ``expr`` produces against ``fields``, or
    None when it does not resolve. Schema-dependent expressions such as
    ``struct('*')``/``colRegex`` resolve against MANY frames but expand
    differently per frame — comparing the resolved output signature across
    frames detects that (ADVICE r11: a bare _resolves probe was fooled)."""
    from pyspark.sql.types import StructType

    try:
        out = spark.createDataFrame([], StructType(fields)).select(expr)
        return [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
    except Exception:  # noqa: BLE001 — unresolved column / type error
        return None


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
    check_every: int | None = None,
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
    check_every: early-exit cadence. The convergence probe rides every
        round's checkpoint as a free ``observe`` count, so the default
        (None) exits at the first round that changed no vertex state —
        provably the final answer for DETERMINISTIC message/update
        expressions (a no-change round is a fixed point, so the remaining
        rounds recompute the identical state). ``0`` = pure
        fixed-iteration: never exit early — the contract for programs
        whose expressions are non-deterministic, where the fixed-point
        argument does not hold. k>0 = consider exiting only every k-th
        round (the historical probe cadence; the observe is free either
        way, so this only constrains WHEN the loop may stop).
        Round COUNT under early exit may be lower than max_iter; the
        returned STATE is identical.
    """
    if msg_to_dst is None and msg_to_src is None:
        raise ValueError("at least one of msg_to_dst / msg_to_src is required")
    state_cols = [c for c in vertices.columns if c != id_col]
    unknown = set(update) - set(state_cols)
    if unknown:
        raise ValueError(f"update targets unknown state columns: {sorted(unknown)}")

    spark = vertices.sparkSession
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

    # tripletFields analysis (driver-only, once): does each message read
    # ONLY the opposite side's state? Then the 3-way triplets join is
    # unnecessary — one state join over the direction-tagged edge union
    # produces every message.
    from pyspark.sql.types import StructField

    from pyspark.sql.types import IntegerType

    e_fields =[StructField(f.name, f.dataType, True) for f in e.schema.fields]
    st_types = {f.name: f.dataType for f in state.schema.fields}
    id_type = state.schema["id"].dataType
    src_fields = [
        StructField(f"src_{c}", st_types[c], True) for c in state_cols
    ]
    dst_fields = [
        StructField(f"dst_{c}", st_types[c], True) for c in state_cols
    ]
    # The frame the one-sided path would actually evaluate messages in:
    # direction tags visible, BOTH side aliases bound to the sender's state.
    one_sided_fields = (
        [
            StructField("__tgt", id_type, True),
            StructField("__nbr", id_type, True),
            StructField("__dir", IntegerType(), False),
        ]
        + e_fields
        + src_fields
        + dst_fields
    )

    def _one_sided_ok(expr: Column | None, fields) -> bool:
        """expr reads only its own side AND produces the same resolved
        output signature in the one-sided joined frame as in the probe
        frame — schema-dependent expressions (struct('*'), colRegex) can
        resolve in both frames yet EXPAND differently where __tgt/__nbr/
        __dir and the doubled side aliases are visible (ADVICE r11); a
        signature mismatch falls back to the triplets join."""
        if expr is None:
            return True
        sig = _probe_schema(spark, expr, fields)
        return sig is not None and sig == _probe_schema(
            spark, expr, one_sided_fields
        )

    one_sided = _one_sided_ok(msg_to_dst, e_fields + src_fields) and _one_sided_ok(
        msg_to_src, e_fields + dst_fields
    )
    if one_sided and msg_to_dst is not None and msg_to_src is not None:
        # the dual-direction path unifies the two message types through one
        # CaseWhen — if coercion cannot unify them (the triplets path
        # catches the analogous array-unification failure), fall back to
        # the triplets shape instead of raising mid-loop (ADVICE r11)
        merged = F.when(F.lit(True), msg_to_dst).otherwise(msg_to_src)
        one_sided = _resolves(spark, merged, one_sided_fields)

    from pyspark.sql import Observation

    # changed-count from the PRE-update frame: compare each update
    # expression against the old column directly inside the observe
    # aggregate, so the checkpointed projection carries only the new state
    # (the former __prev_* mirror doubled every round's pinned block
    # memory for wide-state programs and collided with user columns
    # literally named __prev_<col> — ADVICE r11). Columns without an
    # update expression are copied verbatim and can never differ.
    changed_probe = None
    for c in update:
        delta = ~update[c].eqNullSafe(F.col(c))
        changed_probe = delta if changed_probe is None else (changed_probe | delta)
    if changed_probe is None:  # no update expressions: nothing can change
        changed_probe = F.lit(False)

    for round_no in range(1, max_iter + 1):
        if one_sided:
            # ONE state join: tag each edge with the message direction and
            # flip it so __nbr is the state-carrying side; the neighbor's
            # state is aliased to BOTH src_* and dst_* (each message only
            # reads its own side, proven by the resolution probe above).
            ecols = [F.col(c) for c in e.columns]
            branches = []
            if msg_to_dst is not None:
                branches.append(
                    e.select(
                        F.col("edge_dst").alias("__tgt"),
                        F.col("edge_src").alias("__nbr"),
                        F.lit(0).alias("__dir"),
                        *ecols,
                    )
                )
            if msg_to_src is not None:
                branches.append(
                    e.select(
                        F.col("edge_src").alias("__tgt"),
                        F.col("edge_dst").alias("__nbr"),
                        F.lit(1).alias("__dir"),
                        *ecols,
                    )
                )
            contrib = (
                branches[0]
                if len(branches) == 1
                else branches[0].unionByName(branches[1])
            )
            nbr_state = state.select(
                F.col("id").alias("__nbr"),
                *[F.col(c).alias(f"src_{c}") for c in state_cols],
                *[F.col(c).alias(f"dst_{c}") for c in state_cols],
            )
            joined = contrib.join(nbr_state, "__nbr")
            if msg_to_dst is not None and msg_to_src is not None:
                msg = F.when(F.col("__dir") == 0, msg_to_dst).otherwise(
                    msg_to_src
                )
            else:
                msg = msg_to_dst if msg_to_dst is not None else msg_to_src
            msgs = joined.select(F.col("__tgt").alias("id"), msg.alias(MSG))
        else:
            src_state = state.select(
                F.col("id").alias("edge_src"),
                *[F.col(c).alias(f"src_{c}") for c in state_cols],
            )
            dst_state = state.select(
                F.col("id").alias("edge_dst"),
                *[F.col(c).alias(f"dst_{c}") for c in state_cols],
            )
            triplets = e.join(src_state, "edge_src").join(dst_state, "edge_dst")
            if msg_to_dst is not None and msg_to_src is not None:
                # both messages from ONE execution of the triplets join —
                # the former union of two selects re-ran the join per branch
                try:
                    pair = F.explode(
                        F.array(
                            F.struct(
                                F.col("edge_dst").alias("id"),
                                msg_to_dst.alias(MSG),
                            ),
                            F.struct(
                                F.col("edge_src").alias("id"),
                                msg_to_src.alias(MSG),
                            ),
                        )
                    )
                    msgs = triplets.select(pair.alias("__m")).select(
                        "__m.id", f"__m.{MSG}"
                    )
                except Exception:  # noqa: BLE001 — struct types not unifiable
                    # positional union, NOT unionByName: both branches emit
                    # exactly (id, MSG) by construction, and set-operation
                    # type-widening coerces struct types field-by-position
                    # (ignoring field names) where unionByName and CaseWhen
                    # both reject a field-name mismatch
                    msgs = triplets.select(
                        F.col("edge_dst").alias("id"), msg_to_dst.alias(MSG)
                    ).union(
                        triplets.select(
                            F.col("edge_src").alias("id"),
                            msg_to_src.alias(MSG),
                        )
                    )
            elif msg_to_dst is not None:
                msgs = triplets.select(
                    F.col("edge_dst").alias("id"), msg_to_dst.alias(MSG)
                )
            else:
                msgs = triplets.select(
                    F.col("edge_src").alias("id"), msg_to_src.alias(MSG)
                )
        inbox = (
            msgs.filter(F.col(MSG).isNotNull())
            .groupBy("id")
            .agg(agg.alias(MSG))
        )
        # convergence probe as a df.observe at the plan root, collected as
        # a side effect of the eager localCheckpoint that materializes the
        # round (the connected_components discipline) — zero extra jobs,
        # so it runs EVERY round (the former alternate-round anti-join
        # probe cost a full propagation-sized job per check).
        obs = Observation()
        new_state = tracked_local_checkpoint(
            state.join(inbox, "id", "left")
            .observe(
                obs,
                F.count(F.when(changed_probe, 1)).alias("changed"),
            )
            .select(
                "id",
                *[update.get(c, F.col(c)).alias(c) for c in state_cols],
            )
        )
        free_checkpoint(state)
        state = new_state
        may_exit = check_every is None or (
            check_every > 0 and round_no % check_every == 0
        )
        if may_exit and obs.get["changed"] == 0:
            break
    free_checkpoint(e)
    return adopt_tracking(state, state.select("id", *state_cols))
