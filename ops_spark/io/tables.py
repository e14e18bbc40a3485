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


# Timestamp columns stored as parquet TIMESTAMP(MICROS) without timezone:
# Spark surfaces them as TIMESTAMP_NTZ, the streaming path needs TIMESTAMP
# (LTZ — watermarks reject NTZ), and the DuckDB oracle sees naive micros.
# Normalize batch to TIMESTAMP too so batch and streaming agree in type;
# under the UTC session timezone (BASE_CONFS) the values are identical.
_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (columnar parquet scan, pushdown-capable)."""
    from ops_spark.session import ensure_runtime_confs

    # The session may be driver-built (vanilla confs); without UTC pinned
    # the NTZ→LTZ cast below (and the oracle comparison) would TZ-drift.
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as DataFrames keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so queries can use
    ``spark.sql`` (reference entry point: SparkSession.scala:641).

    Idempotent per (session, sf_dir): each registration is 10 parquet
    footer reads + py4j round trips (~0.5s), and every SQL-entry query
    calls this — a session-scoped marker conf skips the re-read when the
    views already point at the same fixture dir."""
    key = "spark.ops_spark.viewsFor"
    try:
        # the tableExists sweep guards against the marker going stale:
        # if later code dropped ANY fixture view in this session,
        # re-register rather than silently serving a missing view. Ten
        # catalog lookups are py4j round trips only — no parquet footers.
        if spark.conf.get(key, None) == sf_dir and all(
            spark.catalog.tableExists(t) for t in TABLES
        ):
            return
    except Exception:  # noqa: BLE001 — conf read denied: fall through
        pass
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.conf.set(key, sf_dir)
