"""Table loading for the test fixtures + general read helpers.

Capability parity: the reference's file-source scan stack
(reference: sql/core/.../execution/DataSourceScanExec.scala:159,
datasources/parquet/ParquetFileFormat.scala:56) is fully subsumed by
``spark.read`` — vectorized parquet, predicate pushdown, partition pruning
all come from Catalyst. This module is deliberately thin: loading stays
declarative so pushdown/pruning survive.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
# (spark.sql.legacy.parquet.nanosAsLong) — normalized to TimestampType here.
# The fixtures carry no sub-microsecond precision (verified), matching the
# DuckDB oracle's microsecond TIMESTAMP view of the same files.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (columnar parquet scan, pushdown-capable)."""
    from ops_spark.session import ensure_runtime_confs

    # The session may be driver-built (vanilla confs); without nanosAsLong
    # the events read throws, and without UTC the oracle TZ drifts.
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # Integer division — epoch nanos exceed 2^53, double `/` loses µs.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as DataFrames keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so queries can use
    ``spark.sql`` (reference entry point: SparkSession.scala:641)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
