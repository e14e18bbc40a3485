"""Shuffle-policy layer: the PySpark-native expression of OPS shuffle
management (SURVEY.md §4.3).

The reference fork rebuilds Spark's shuffle as a pipelined, push-based,
per-node pre-merged transfer (reference: OpsPreShuffleWriter.java:66-327,
OpsTransferer.java:149-203, OpsSharedManager.java:201-217,
OpsFetcherIterator.scala:202-236) so reducers read one sequential local
file instead of M×R random fetches, at the cost of map-side combine and
real MapStatus sizes (ShuffleMapTask.scala:80-157,
OpsPreShuffleWriter.java:290-295).

Modern Spark ships those capabilities as first-class features; this layer
turns them on and sizes them:

| OPS mechanism                        | here                               |
|--------------------------------------|------------------------------------|
| push-based pre-merged shuffle        | spark.shuffle.push.* (YARN+ESS)    |
| one sequential read per reducer      | merged-chunk fetch (same confs)    |
| pipelined transfer during map        | push-based shuffle does this       |
| skew problems sidestepped by design  | AQE skew-join splitting            |
| partition-count tuning               | advise_partitions() + AQE coalesce |
| `[OPS]-` phase metric log lines      | stage_shuffle_metrics()            |
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

MiB = 1 << 20
GiB = 1 << 30


def advise_partitions(
    input_bytes: int,
    cluster_cores: int,
    target_partition_bytes: int = 128 * MiB,
    min_partitions: int | None = None,
    shuffle_amplification: float = 1.0,
) -> int:
    """Shuffle partition count sized to data volume, not the 200 default.

    Rule: one partition per ~target_partition_bytes of (amplified) input,
    floored at 2× cluster cores so every core gets work even after AQE
    coalescing. The reference's answer to mis-sized reduce partitions was
    per-node pre-merge; ours is sizing + runtime coalesce.
    """
    min_parts = min_partitions if min_partitions is not None else 2 * cluster_cores
    by_volume = int(input_bytes * shuffle_amplification / target_partition_bytes) + 1
    return max(min_parts, by_volume)


@dataclass
class ShufflePolicy:
    """A reusable bundle of shuffle-related session confs.

    `for_volume` computes the written-in-stone knobs from expected input
    size; `apply` sets them (runtime-settable confs only — AQE re-plans
    per stage, so they take effect on the next action).
    """

    shuffle_partitions: int = 200
    advisory_partition_bytes: int = 64 * MiB
    # Scan-side twin of shuffle sizing: how many bytes of input one scan
    # task reads. Together with executor memory this bounds the working
    # set BEFORE the first shuffle; at 100 TB too-large means scan-task
    # OOM/spill, too-small means task-scheduling overhead dominates.
    scan_partition_bytes: int = 128 * MiB
    skew_factor: int = 5
    skew_threshold_bytes: int = 256 * MiB
    broadcast_threshold_bytes: int = 64 * MiB
    push_based: bool = False  # needs YARN + external shuffle service
    extras: dict[str, str] = field(default_factory=dict)

    @classmethod
    def for_volume(
        cls, input_bytes: int, cluster_cores: int, **overrides
    ) -> "ShufflePolicy":
        return cls(
            shuffle_partitions=advise_partitions(input_bytes, cluster_cores),
            **overrides,
        )

    def confs(self) -> dict[str, str]:
        out = {
            "spark.sql.files.maxPartitionBytes": str(self.scan_partition_bytes),
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                self.advisory_partition_bytes
            ),
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(self.skew_factor),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
                self.skew_threshold_bytes
            ),
            "spark.sql.adaptive.autoBroadcastJoinThreshold": str(
                self.broadcast_threshold_bytes
            ),
        }
        if self.push_based:
            # Magnet / SPARK-30602: mergers pre-merge map outputs per reduce
            # partition — the direct analogue of the OPS worker daemon
            # (reference OpsTransferer.java target-file layout :75-81).
            out.update(
                {
                    "spark.shuffle.push.enabled": "true",
                    "spark.shuffle.service.enabled": "true",
                }
            )
        out.update(self.extras)
        return out

    def apply(self, spark: SparkSession) -> None:
        for k, v in self.confs().items():
            try:
                spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — static confs can't be set post-start
                pass


def spread(df, min_partitions: int | None = None):
    """Repartition only when the plan has fewer partitions than the cluster
    has task slots — i.e. the small-input case where a CPU-heavy stage
    (per-row hashing, shingling, vector math) would otherwise run on a
    handful of cores.

    At scale this is a no-op: a 100 TB scan yields thousands of input
    splits, so the guard never fires and no shuffle is added. When it does
    fire, the shuffled volume is bounded by (current partitions ×
    spark.sql.files.maxPartitionBytes) — by construction small. This is the
    inverse of AQE's coalescing: AQE merges too-many small partitions after
    a shuffle; nothing in stock Spark splits a too-small *scan* before
    CPU-bound narrow work.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def rebalance(df, *cols):
    """AQE-backed output rebalancing (`REBALANCE` hint): splits oversized
    partitions AND coalesces undersized ones at runtime using real map
    statistics — the closest stock-Spark analogue to what the reference
    built per-node pre-merge for (evenly sized reduce-side reads,
    OpsTransferer.java:149-203), but driven by true sizes instead of the
    fork's fabricated MapStatus (OpsPreShuffleWriter.java:290-295).
    Unlike repartition(n), there is no fixed n to mis-guess: use it before
    writes and after skew-producing joins."""
    from pyspark.sql import functions as F  # local: keep module import-light

    return df.hint("rebalance", *[F.col(c) for c in cols])


def observe_rows(df, name: str = "ops_metrics", **metrics):
    """Attach named metrics (collected at zero extra passes during the
    next action) to a DataFrame: the query-level mirror of the
    reference's task-phase accumulators (TaskMetrics.scala:58-65 — theirs
    count shuffle phases, ours count/aggregate rows flowing through a
    plan point). Returns (df, Observation); read observation.get after an
    action materializes df.

    Usage:
        df, obs = observe_rows(df, rows=F.count(F.lit(1)))
        df.write...; obs.get["rows"]
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[expr.alias(k) for k, expr in metrics.items()]), obs


def stage_shuffle_metrics(spark: SparkSession) -> list[dict]:
    """Per-stage shuffle/IO/time metrics from the app status store.

    The modern mirror of the reference's `[OPS]-` phase instrumentation
    (ShuffleMapTask.scala:141-156, TaskMetrics.scala:58-65): per-stage
    shuffle read/write bytes, records, executor time. Reads Spark's
    AppStatusStore via py4j; returns [] if the API shape changes.
    """
    try:
        store = spark._jsparkSession.sparkContext().statusStore()
        jvm = spark._jvm
        gw = spark.sparkContext._gateway  # type: ignore[attr-defined]
        stages = store.stageList(
            jvm.java.util.ArrayList(),  # statuses: all
            False,  # details
            False,  # withSummaries
            gw.new_array(jvm.double, 0),  # quantiles
            jvm.java.util.ArrayList(),  # task statuses
        )
        out = []
        for i in range(stages.size()):
            s = stages.apply(i)
            row = {
                "stage_id": s.stageId(),
                "name": str(s.name()).split("\n")[0][:120],
                "status": str(s.status()),
                "num_tasks": s.numTasks(),
                "executor_run_time_ms": s.executorRunTime(),
                "input_bytes": s.inputBytes(),
                "output_bytes": s.outputBytes(),
                "shuffle_read_bytes": s.shuffleReadBytes(),
                "shuffle_read_records": s.shuffleReadRecords(),
                "shuffle_write_bytes": s.shuffleWriteBytes(),
                "shuffle_write_records": s.shuffleWriteRecords(),
                "memory_bytes_spilled": s.memoryBytesSpilled(),
                "disk_bytes_spilled": s.diskBytesSpilled(),
            }
            try:
                # Remote-vs-local fetch split: the evidence that a shuffle
                # actually crossed executor JVMs (local[...] never has
                # remote reads; local-cluster / real clusters do). Guarded
                # separately — these v1 StageData fields are newer than the
                # base set.
                row["shuffle_remote_bytes_read"] = s.shuffleRemoteBytesRead()
                row["shuffle_local_bytes_read"] = s.shuffleLocalBytesRead()
                row["shuffle_remote_blocks_fetched"] = s.shuffleRemoteBlocksFetched()
                row["shuffle_local_blocks_fetched"] = s.shuffleLocalBlocksFetched()
                row["shuffle_fetch_wait_time_ms"] = s.shuffleFetchWaitTime()
            except Exception:  # noqa: BLE001 — older API shape
                pass
            out.append(row)
        return out
    except Exception:  # noqa: BLE001
        return []


def shuffle_report(spark: SparkSession) -> dict:
    """Aggregate shuffle totals for the session (bench-harness companion)."""
    stages = stage_shuffle_metrics(spark)
    out = {
        "n_stages": len(stages),
        "shuffle_read_bytes": sum(s["shuffle_read_bytes"] for s in stages),
        "shuffle_write_bytes": sum(s["shuffle_write_bytes"] for s in stages),
        "executor_run_time_ms": sum(s["executor_run_time_ms"] for s in stages),
        "input_bytes": sum(s["input_bytes"] for s in stages),
    }
    if any("shuffle_remote_bytes_read" in s for s in stages):
        out["shuffle_remote_bytes_read"] = sum(
            s.get("shuffle_remote_bytes_read", 0) for s in stages
        )
        out["shuffle_local_bytes_read"] = sum(
            s.get("shuffle_local_bytes_read", 0) for s in stages
        )
        out["shuffle_remote_blocks_fetched"] = sum(
            s.get("shuffle_remote_blocks_fetched", 0) for s in stages
        )
    return out
