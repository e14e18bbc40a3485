"""Tuned SparkSession factory.

The reference achieves shuffle efficiency with a custom push-based shuffle
(reference: core/src/main/java/org/apache/spark/shuffle/sort/
OpsPreShuffleWriter.java:66-327, OpsSharedShuffleWriter.java:61-261). Modern
Spark ships the same capabilities as built-ins — AQE runtime re-planning,
partition coalescing, skew-join splitting, push-based shuffle on YARN — so
the session factory's job is to turn them on and size them to the workload.

Scale posture: these defaults are written for a real multi-executor cluster
reading ~100 TB; `local_cores` only adapts the parallelism knobs for the
single-JVM test harness.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Configs that express the OPS shuffle *capability* with modern Spark
# machinery (SURVEY.md §4.3). All are safe on local mode and essential at
# cluster scale.
ADAPTIVE_CONFS: dict[str, str] = {
    # AQE: runtime re-plan from actual map-output statistics — replaces the
    # reference's fabricated MapStatus sizing (OpsPreShuffleWriter.java:290-295)
    # with real sizes.
    "spark.sql.adaptive.enabled": "true",
    # Post-shuffle partition coalescing: the modern answer to "too many tiny
    # reduce partitions" that OPS solved by per-node pre-merge
    # (OpsTransferer.java:149-203).
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Skew-join splitting: OPS loses per-map skew stats entirely (fake
    # MapStatus); we instead detect and split skewed partitions at runtime.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Convert sort-merge join to broadcast at runtime when a side turns out
    # small after filtering.
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
    # Let user-defined Python data sources accept pushed filters
    # (io/pysource.py implements pushFilters — source-side pruning).
    "spark.sql.python.filterPushdown.enabled": "true",
}

BASE_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas_udf / applyInPandas / toPandas (the reference
    # era used pickled rows; Arrow is the modern fast path —
    # reference python/pyspark/worker.py, ArrowEvalPythonExec.scala:69).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet vectorized reader + pushdown are on by default; pin them
    # explicitly since they are part of the capability contract
    # (reference VectorizedParquetRecordReader.java:52, ParquetFilters.scala:43).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Keep ANSI off: the reference (Spark 2.4.3) pre-dates ANSI mode and the
    # DuckDB-oracle fixtures assume permissive SQL semantics.
    "spark.sql.ansi.enabled": "false",
}


def _local_confs(cores: int) -> dict[str, str]:
    """Knobs that depend on local parallelism (single-JVM harness only)."""
    return {
        # ~1 shuffle partition per core locally; AQE coalesces further.
        # On a real cluster this would be sized to total cores × 2-3 or
        # driven by spark.sql.adaptive.advisoryPartitionSizeInBytes.
        "spark.sql.shuffle.partitions": str(max(cores, 4)),
        "spark.default.parallelism": str(max(cores, 4)),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        "spark.ui.enabled": "false",
        # saveAsTable/bucketBy targets (keep the repo clean; metastore +
        # warehouse live in tmp — reference kin: sql/hive metastore catalog)
        "spark.sql.warehouse.dir": os.path.join(
            tempfile.gettempdir(), "ops_spark_warehouse"
        ),
        "spark.driver.extraJavaOptions": "-Dderby.system.home="
        + os.path.join(tempfile.gettempdir(), "ops_spark_derby"),
    }


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the correctness-critical SQL confs to an externally-created
    session. The driver harness builds its OWN SparkSession and calls our
    query builders with it; everything in BASE_CONFS is runtime-settable
    SQLConf, so applying it here makes query results independent of who
    constructed the session (UTC timestamps, non-ANSI semantics, Arrow
    transfer).

    Also applies the shuffle-policy layer (ADAPTIVE_CONFS) and right-sizes
    ``spark.sql.shuffle.partitions`` when it still holds the stock default
    of 200: on a small host 200-task shuffles are pure scheduler overhead,
    and on a real cluster the operator should size to volume
    (plans/shuffle_policy.advise_partitions), not to a constant. Sessions
    that already tuned the value (ours via get_session, or any user's) are
    left untouched."""
    for conf in (BASE_CONFS, ADAPTIVE_CONFS):
        for k, v in conf.items():
            try:
                if spark.conf.get(k, None) != v:
                    spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — locked conf must not kill reads
                pass
    try:
        # "200" can be the never-touched stock default OR a deliberate choice
        # (e.g. ShufflePolicy(shuffle_partitions=200)); the VALUE cannot
        # distinguish them. SQLConf tracks explicit sets — builder confs and
        # spark.conf.set both land in its settings map — so resize only the
        # true default. (N.B. spark.conf.get(key, None) returns None for an
        # unset conf rather than resolving the SQLConf default, so the old
        # `get(key, None) == "200"` guard never fired on vanilla sessions.)
        explicitly_set = True  # conservative: never clobber if undeterminable
        try:
            explicitly_set = bool(
                spark._jsparkSession.sessionState()
                .conf()
                .contains("spark.sql.shuffle.partitions")
            )
        except Exception:  # noqa: BLE001 — no py4j session (connect mode)
            pass
        if not explicitly_set:
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(max(4, min(cores, 64)))
            )
    except Exception:  # noqa: BLE001
        pass


def get_session(
    app_name: str = "ops_spark",
    master: str | None = None,
    cores: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or return) the tuned SparkSession.

    Parameters default to the test-harness contract: ``local[$SPARK_GRAFT_CPUS]``
    (falling back to all cores), AQE on, Arrow on, UTC.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cores}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for conf in (BASE_CONFS, ADAPTIVE_CONFS, _local_confs(cores), extra_confs or {}):
        for k, v in conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_query_memory(spark: SparkSession, quiet: bool = False) -> None:
    """Drop blocks a finished query left pinned (cached tables, iterative
    operators' final localCheckpoint) — the between-query hygiene shared
    by bench.py and the scale harnesses, so every query is measured
    against a lean session instead of inheriting its predecessors'
    residue. RDD-level unpersist is the only call that actually frees
    localCheckpoint blocks (see operators/blocks.py)."""
    import sys

    try:
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.rdd().unpersist(False)
    except Exception as exc:  # noqa: BLE001
        if not quiet:
            print(f"session cleanup skipped: {exc}", file=sys.stderr)


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
