"""RDD-block hygiene for iterative DataFrame loops.

``DataFrame.unpersist()`` only uncaches CacheManager entries; it does NOT
free the RDD blocks a ``localCheckpoint()`` pinned (verified empirically on
PySpark 4.1.2: ``sc._jsc.getPersistentRDDs()`` is unchanged after
``df.unpersist()``). Iterative operators (connected components, PageRank,
pregel, the BPE merge loop) therefore must release superseded rounds at the
RDD level, or every round of every loop stays pinned in executor memory for
the session's lifetime.

``tracked_local_checkpoint`` snapshots the persistent-RDD id set around the
checkpoint call and records the delta on the returned DataFrame;
``free_checkpoint`` unpersists exactly those RDDs through their JVM handles
(the same mechanism bench.py's between-query sweep uses).

Safety contract: only free a checkpoint that is SUPERSEDED — localCheckpoint
truncates lineage, so its blocks are the only copy of the data; freeing a
checkpoint that a still-lazy downstream plan references would make that plan
unrecomputable. Eagerly-checkpointed successors are safe because they
materialized before their input is freed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_ops_ckpt_rdd_ids"


def _persistent_ids(spark) -> set[int]:
    try:
        return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}
    except Exception:  # noqa: BLE001 — Connect / restricted gateway: degrade
        return set()


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint()`` that remembers which RDD ids it pinned."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=eager)
    try:
        setattr(out, _ATTR, _persistent_ids(spark) - before)
    except Exception:  # noqa: BLE001 — slotted DataFrame impl: no tracking
        pass
    return out


#: Default input-bytes threshold for materialize_if_large. Chosen so the
#: gate stays INLINE at the fixture scales the driver benches (sf0.1
#: documents ≈ 0.6 MB, events ≈ 2 MB — where r11 measured every candidate
#: checkpoint SLOWER, because duplicated column-pruned passes run
#: concurrently on idle local cores while a checkpoint serializes
#: materialize-then-consume) and CHECKPOINTS at the 100x derived scale and
#: beyond (documents ≈ 15 MB, events ≈ 200 MB — where each duplicated pass
#: is a full corpus scan+explode that no longer hides behind idle cores;
#: at the 100 TB target the trade is not close). The crossover is
#: box-dependent, so it is a conf/env knob, not a constant baked into any
#: plan: production deployments can raise it, but any real corpus sits
#: orders of magnitude above ANY sensible setting, which is why the exact
#: default matters only for keeping fixture benches comparable.
DEFAULT_MATERIALIZE_MIN_BYTES = 8 * 1024 * 1024

_MATERIALIZE_CONF = "spark.ops_spark.materialize.minInputBytes"
_MATERIALIZE_ENV = "OPS_SPARK_MATERIALIZE_MIN_BYTES"

# Catalyst reports defaultSizeInBytes (Long.MaxValue-ish) for leaves it
# cannot size (e.g. a bare LogicalRDD without stats); treat anything that
# large as "unknown", not as evidence of a huge input.
_UNKNOWN_SIZE_FLOOR = 1 << 60


def estimated_input_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate summed over the plan's DISTINCT leaf
    relations — the bytes of the sources feeding this plan, which is what
    a checkpoint-vs-inline decision needs (guide §1.2: the cost of the
    duplicated pass scales with its input). Driver-side plan walk, no
    Spark job: file-source leaves report their on-disk file-size sum
    (times spark.sql.sources.fileCompressionFactor).

    Distinct, not per-reference: an iterative plan (funnel, loops)
    references the SAME source many times, and summing every reference
    would make the gate fire on plan depth rather than on data size —
    the threshold is calibrated against source scale. Leaves are deduped
    by file location when available, falling back to (class, size).
    Returns -1 when no leaf could be sized (Connect / restricted gateway
    / stats-less RDD scans), letting callers fall back to the
    conservative inline path.
    """
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        sizes: dict[str, int] = {}
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            size = int(leaf.stats().sizeInBytes())
            if not (0 <= size < _UNKNOWN_SIZE_FLOOR):
                continue
            try:
                key = leaf.relation().location().rootPaths().toString()
            except Exception:  # noqa: BLE001 — non-file leaf (RDD, local)
                key = f"{leaf.getClass().getName()}:{size}"
            sizes[key] = size
        return sum(sizes.values()) if sizes else -1
    except Exception:  # noqa: BLE001 — estimation must never break a query
        return -1


def materialize_min_bytes(spark) -> int:
    """Resolve the gate threshold: session conf beats env beats default."""
    raw = None
    try:
        raw = spark.conf.get(_MATERIALIZE_CONF, None)
    except Exception:  # noqa: BLE001
        pass
    if raw is None:
        import os

        raw = os.environ.get(_MATERIALIZE_ENV)
    try:
        return int(raw) if raw is not None else DEFAULT_MATERIALIZE_MIN_BYTES
    except ValueError:
        return DEFAULT_MATERIALIZE_MIN_BYTES


def materialize_if_large(df: DataFrame, threshold: int | None = None) -> DataFrame:
    """Size-aware checkpoint-vs-inline gate (guide §5; VERDICT r11 #1).

    A multi-consumer intermediate whose consumers include broadcast builds
    is re-executed per build (AQE exchange reuse does not dedup broadcast
    builds — r11 items 14/15), so WITHOUT materialization the upstream
    pipeline runs N times. At fixture scale that duplication measured
    FASTER than a checkpoint (idle cores absorb the concurrent duplicate
    passes); at corpus scale each duplicate is a full input pass and the
    checkpoint wins by construction. This helper makes the choice from the
    estimated upstream input bytes instead of baking either local-mode or
    cluster assumption into the plan.

    Returns ``tracked_local_checkpoint(df)`` when the estimate meets the
    threshold, ``df`` unchanged when it is below or unknown. Callers can
    ``adopt_tracking``/``free_checkpoint`` the result unconditionally —
    both are no-ops on the inline path.
    """
    thr = threshold if threshold is not None else materialize_min_bytes(df.sparkSession)
    est = estimated_input_bytes(df)
    if est < 0 or est < thr:
        return df
    return tracked_local_checkpoint(df)


def adopt_tracking(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Carry src's tracked checkpoint ids onto a derived dst (e.g. a final
    ``.select()`` over the last round) so callers can free the result."""
    ids = getattr(src, _ATTR, None)
    if ids:
        try:
            setattr(dst, _ATTR, ids)
        except Exception:  # noqa: BLE001
            pass
    return dst


def free_checkpoint(df: DataFrame) -> None:
    """Release the RDD blocks ``tracked_local_checkpoint`` pinned for df.

    No-op (beyond the stock uncache) for untracked DataFrames. Uses
    ``RDD.unpersist(blocking=False)`` on the JVM handle — the only call
    that actually drops localCheckpoint blocks.

    CONSUME BEFORE FREEING: DataFrames returned by the iterative operators
    (connected_components, pagerank, …) carry adopted tracking ids for a
    checkpoint that IS their data — localCheckpoint truncates lineage, so
    calling free_checkpoint on such a result before collecting/writing it
    makes it unrecomputable. Free only after the result is consumed (or
    was re-checkpointed downstream).
    """
    ids = getattr(df, _ATTR, None)
    if not ids:
        return
    try:
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        for k in list(jmap.keys()):
            if int(k) in ids:
                jmap[k].rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — session already stopped: nothing to free
        pass
