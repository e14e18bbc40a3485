"""Bounded streaming harness: run a Structured Streaming query over fixture
parquet to completion and hand back the result as a batch DataFrame.

Capability parity with the reference's streaming stack (SURVEY.md §2.9):
micro-batch execution (reference MicroBatchExecution.scala:37,
IncrementalExecution.scala:39), file stream source (FileStreamSource.scala),
memory sink (sources/memory.scala), availableNow trigger (the modern form of
Trigger.Once, reference Triggers.scala), checkpointing (HDFSMetadataLog.scala,
CommitLog.scala).

Test methodology: batch-equivalence (SURVEY.md §7 risk notes) — streaming a
bounded fixture must equal the batch query over the same data, which is what
lets streaming queries participate in the DuckDB-oracle gate.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def _staged_dir(sf_dir: str, table: str) -> str:
    """FileStreamSource wants a flat directory of data files. The sf
    fixtures are single parquet FILES; derived datasets (scale_stress)
    are parquet DIRECTORIES — symlink the part files individually, since
    the file source does not recurse through a directory symlink (a
    whole-directory link silently streams ZERO rows)."""
    import hashlib

    # Stable digest, not builtin hash() (PYTHONHASHSEED-salted per process):
    # keeps the staged dir reusable across runs instead of leaking one per
    # process under tmp.
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    staged = os.path.join(
        tempfile.gettempdir(), f"ops_spark_stream_{digest}", table
    )
    os.makedirs(staged, exist_ok=True)
    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(src):
        want = {p for p in os.listdir(src) if p.endswith(".parquet")}
    else:
        want = {f"{table}.parquet"}
    # Drop links from a previous generation of the source (regenerated
    # derived datasets get fresh part-file names; stale links would either
    # break the stream or replay old parts).
    for existing in os.listdir(staged):
        path = os.path.join(staged, existing)
        if existing not in want or not os.path.exists(path):
            os.unlink(path)
    for part in sorted(want):
        link = os.path.join(staged, part)
        target = os.path.join(src, part) if os.path.isdir(src) else src
        if not os.path.exists(link):
            os.symlink(target, link)
    return staged


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a streaming DataFrame (file source).

    ts is stored as parquet TIMESTAMP(MICROS) without timezone, which Spark
    reads as TIMESTAMP_NTZ; the cast below normalizes to TIMESTAMP (LTZ)
    because watermarks reject NTZ. Batch (ops_spark.io.tables.load_table)
    applies the same cast, so batch and streaming agree in type and — with
    the UTC session timezone pinned by ensure_runtime_confs — in value.
    (A true TIMESTAMP(NANOS) fixture would need nanosAsLong=true plus a
    bigint schema and manual DIV-1000 conversion; not supported here.)
    """
    from ops_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # driver-built sessions need UTC pinned
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _staged_dir(sf_dir, "events")
    )
    # Watermarks only accept TIMESTAMP (LTZ); NTZ→LTZ is identity under the
    # UTC session timezone, so event-time semantics match the batch oracle.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents fixture as a streaming DataFrame (file source)."""
    from ops_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    return spark.readStream.schema(DOCS_SCHEMA).parquet(
        _staged_dir(sf_dir, "documents")
    )


def run_bounded(
    stream_df: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    state_partitions: int | None = 4,
    checkpoint: str | None = None,
    stop_when_idle: bool = False,
    sink_path: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to exhaustion; return the memory-sink
    table. availableNow processes everything currently in the source then
    stops — exactly-once via a throwaway checkpoint.

    state_partitions sizes the stateful-operator shuffle (= the number of
    state-store instances; AQE never touches streaming plans, and the
    count is frozen into the checkpoint at first start). It is THE
    streaming scale knob: each state store has fixed per-batch open/commit
    cost, so oversizing dominates wall time on bounded fixtures (32 → 4
    partitions is ~6× on the fixture joins), while undersizing caps
    parallelism and state volume per store on a real cluster — size it to
    expected state rows / target rows-per-store, not to the batch-side
    shuffle default. None = leave the session setting untouched.
    checkpoint overrides the throwaway checkpoint dir — pass one to read
    the query's state back afterwards via the statestore reader.

    stop_when_idle is REQUIRED for stateful operators carrying a
    processing-time timeout (e.g. streaming_lsh_dedup with
    state_ttl_ms): Spark keeps scheduling no-data batches to evaluate
    timeouts, so an availableNow query never terminates on its own.
    The harness then waits until the source is drained AND at least one
    further batch has completed after that point (the no-data batch in
    which eligible timeouts actually fire), then stops the query.

    sink_path switches the sink from memory to an append parquet
    directory. The memory sink cannot RESUME from a checkpoint
    ("does not support recovering"), so multi-run tests that restart
    from one checkpoint (cross-run state: TTL eviction, exactly-once)
    must use a durable sink; the returned DataFrame then reads the
    sink directory with the stream's schema (so an all-empty-batch run
    still returns an empty frame instead of failing inference).
    """
    spark = stream_df.sparkSession
    qname = name or f"bounded_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        writer = (
            stream_df.writeStream.outputMode(output_mode)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                checkpoint or tempfile.mkdtemp(prefix="ops_spark_ckpt_"),
            )
        )
        if sink_path is not None:
            query = writer.format("parquet").start(sink_path)
        else:
            query = writer.format("memory").queryName(qname).start()
        if stop_when_idle:
            import time as _time

            deadline = _time.time() + 300
            idle_since_batch = -1
            while query.isActive and _time.time() < deadline:
                if query.exception() is not None:
                    break  # awaitTermination below re-raises it
                progress = query.lastProgress
                if progress is not None and not query.status.get(
                    "isDataAvailable", True
                ):
                    if idle_since_batch < 0:
                        idle_since_batch = progress["batchId"]
                    elif progress["batchId"] > idle_since_batch:
                        query.stop()  # a post-drain batch ran: timeouts fired
                        break
                _time.sleep(0.2)
            else:
                if query.isActive:
                    query.stop()
        query.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    if sink_path is not None:
        return spark.read.schema(stream_df.schema).parquet(sink_path)
    return spark.table(qname)
