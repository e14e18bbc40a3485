"""JDBC source/sink via the embedded Derby engine that ships with Spark.

Capability parity: the reference's JDBC relation with partitioned reads
(reference: sql/core/.../datasources/jdbc/JDBCRelation.scala:230 —
partitionColumn/lowerBound/upperBound/numPartitions stride planning) and
JDBC filter pushdown (JDBCRDD compileFilter kin). No external database is
available in the test image, but Spark bundles Derby (its Hive-metastore
backend), so the embedded engine exercises the real JDBC code path:
DriverRegistry, JdbcRelationProvider, partition stride planning, and
WHERE-clause pushdown all behave exactly as they would against
Postgres/MySQL — only the URL differs at deploy time.

Scale note: a partitioned JDBC read plans one task per stride on
partitionColumn; at 100 TB the same options fan the read out across
executors while predicate pushdown keeps each stride's scan server-side.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

# Derby 10.16 registers this driver class from derbytools.jar.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_url(name: str) -> str:
    """Embedded single-process Derby database homed under tmp. The pid in
    the path keeps concurrent test processes from fighting over Derby's
    single-JVM db lock."""
    db = os.path.join(tempfile.gettempdir(), f"ops_spark_derby_db_{os.getpid()}", name)
    return f"jdbc:derby:{db};create=true"


def write_jdbc(df: DataFrame, url: str, table: str) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 4,
) -> DataFrame:
    """Partitioned JDBC scan: numPartitions stride queries over
    [lower, upper) on partition_column (JDBCRelation.scala:230 semantics:
    bounds only shape the strides, they do NOT filter rows)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .load()
    )
