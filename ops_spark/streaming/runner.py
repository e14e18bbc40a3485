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
        for part in os.listdir(src):
            if not part.endswith(".parquet"):
                continue
            link = os.path.join(staged, part)
            if not os.path.exists(link):
                os.symlink(os.path.join(src, part), link)
    else:
        link = os.path.join(staged, f"{table}.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
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
    """
    spark = stream_df.sparkSession
    qname = name or f"bounded_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ops_spark_ckpt_"))
            .start()
        )
        query.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)
