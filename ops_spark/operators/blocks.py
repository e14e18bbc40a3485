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
