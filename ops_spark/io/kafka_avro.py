"""Kafka and Avro connectors — thin, classpath-gated wrappers.

Capability parity targets (SURVEY.md §2.1):
- Kafka source/sink (reference: external/kafka-0-10-sql/src/main/scala/
  org/apache/spark/sql/kafka010/KafkaSource.scala:73, KafkaSourceProvider.scala)
- Avro file format + from_avro/to_avro (reference: external/avro/src/main/
  scala/org/apache/spark/sql/avro/AvroFileFormat.scala:44)

Availability on this image (probed, not assumed):
- **Kafka**: the ``spark-sql-kafka-0-10`` jar is absent — *blocked-but-
  ready*. Entry points raise an actionable ``ConnectorUnavailable``; the
  moment the jar appears (``--packages org.apache.spark:
  spark-sql-kafka-0-10_2.13:<ver>``) the same code paths light up unchanged.
- **Avro files**: WORK. Spark 4.1 bundles the Avro implementation classes
  inside ``spark-sql``; only the short-name ``format("avro")`` service
  registration lives in the external ``spark-avro`` module. ``read_avro`` /
  ``write_avro`` resolve the short name when registered and fall back to the
  full provider class (``org.apache.spark.sql.avro.AvroFileFormat``), which
  executes fine here.
- **from_avro/to_avro**: hard-gated by Spark on the short-name registration
  (AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE) — blocked-but-ready; probe with
  ``avro_functions_available``.

Scale notes (100 TB posture):
- Kafka reads parallelize by topic-partition; ``minPartitions`` can split
  partitions further for wide clusters. ``maxOffsetsPerTrigger`` bounds
  per-micro-batch volume so state and sink pressure stay flat.
- Avro is a row format: prefer it for interchange/ingest, land analytics
  tables as parquet (columnar pruning + pushdown — io/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.column import Column

KAFKA_PROVIDER_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
AVRO_FORMAT_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


class ConnectorUnavailable(RuntimeError):
    """A connector's data source cannot be resolved in this JVM."""


def _lookup_data_source(spark: SparkSession, name: str) -> bool:
    """Authoritative probe: Spark's own provider lookup (resolves the
    META-INF/services registration, the same path format() takes). A bare
    Class.forName is NOT sufficient — spark-sql 4.1 ships Avro classes
    without registering the short name."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            name, spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        )
        return True
    except Exception:  # noqa: BLE001 — Py4JJavaError(CLASS_NOT_FOUND)
        return False


def kafka_available(spark: SparkSession) -> bool:
    """True when ``format("kafka")`` would resolve (spark-sql-kafka-0-10
    jar registered)."""
    return _lookup_data_source(spark, "kafka")


def _avro_format(spark: SparkSession) -> str | None:
    """The usable Avro format name: the short name when the spark-avro
    module is deployed, else the bundled full provider class, else None."""
    if _lookup_data_source(spark, "avro"):
        return "avro"
    if _lookup_data_source(spark, AVRO_FORMAT_CLASS):
        return AVRO_FORMAT_CLASS
    return None


def avro_available(spark: SparkSession) -> bool:
    """True when Avro FILE read/write works (short name or bundled class)."""
    return _avro_format(spark) is not None


def avro_functions_available(spark: SparkSession) -> bool:
    """True when from_avro/to_avro work — Spark gates these on the
    short-name registration specifically, not on the classes existing."""
    return _lookup_data_source(spark, "avro")


def _require(spark: SparkSession, ok: bool, jar: str) -> None:
    if not ok:
        raise ConnectorUnavailable(
            f"{jar} is not on the JVM classpath; add it via spark.jars.packages "
            "(the wrapper itself is ready — nothing else changes)"
        )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Streaming Kafka source (key/value binary + topic/partition/offset/
    timestamp columns — the fixed Kafka schema).

    ``max_offsets_per_trigger`` is the backpressure knob: it caps rows per
    micro-batch so a backlog replay cannot overwhelm state stores or sinks.
    ``min_partitions`` splits topic-partitions into more Spark tasks when
    the cluster is wider than the topic.
    """
    _require(spark, kafka_available(spark), "spark-sql-kafka-0-10")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded (batch) Kafka read over an offset range — the backfill path."""
    _require(spark, kafka_available(spark), "spark-sql-kafka-0-10")
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
) -> None:
    """Batch Kafka sink: df must carry ``value`` (binary/string) and may
    carry ``key`` / ``partition`` — the Kafka writer contract."""
    spark = df.sparkSession
    _require(spark, kafka_available(spark), "spark-sql-kafka-0-10")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def read_avro(spark: SparkSession, path: str, avro_schema: str | None = None) -> DataFrame:
    """Avro file read; ``avro_schema`` (JSON) pins reader-schema evolution."""
    fmt = _avro_format(spark)
    _require(spark, fmt is not None, "spark-avro")
    reader = spark.read.format(fmt)
    if avro_schema is not None:
        reader = reader.option("avroSchema", avro_schema)
    return reader.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "error") -> None:
    """Avro file write (row-major interchange format — land analytics
    tables as parquet instead; see module docstring)."""
    spark = df.sparkSession
    fmt = _avro_format(spark)
    _require(spark, fmt is not None, "spark-avro")
    df.write.format(fmt).mode(mode).save(path)


def decode_avro(col: Column, json_schema: str, options: dict | None = None) -> Column:
    """``from_avro`` — decode a binary column (e.g. a Kafka ``value``)
    against a writer schema. Spark rejects the call at analysis unless the
    spark-avro short name is registered — probe ``avro_functions_available``
    first."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(col, json_schema, options or {})


def encode_avro(col: Column) -> Column:
    """``to_avro`` — encode any column to Avro binary (Kafka value shape)."""
    from pyspark.sql.avro.functions import to_avro

    return to_avro(col)
