"""Write-path coverage: partitioned / bucketed / multi-format sinks.

Capability parity with the reference's DataFrameWriter surface
(reference: sql/core/.../DataFrameWriter.scala:45,187,202,217,319,408 —
mode/format/partitionBy/bucketBy/sortBy/save/saveAsTable;
datasources/FileFormatWriter.scala for the write jobs; dynamic partition
insert). CSV/JSON/ORC/Text formats mirror §2.1's source list.

Scale notes baked into the helpers:
- partitionBy keys must be low-cardinality (one directory per value; a
  high-cardinality partition key = millions of tiny files).
- bucketBy is the shuffle-elimination tool: two tables bucketed on the
  join key join with ZERO exchanges (tested in tests/test_plans.py).
- always write with a bounded file count: repartition(n, key) before
  partitionBy so each partition directory gets n files, not n_tasks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def scratch_dir(label: str) -> str:
    return tempfile.mkdtemp(prefix=f"ops_spark_{label}_")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Dynamic-partitioned write (one directory tree level per key)."""
    (
        df.repartition(*partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed + sorted managed table: co-locates later joins on bucket_col.

    The write shuffles once on the bucket key; every later join between
    tables bucketed the same way runs shuffle-free (SortMergeJoin reads
    bucket files directly) — the static counterpart of the reference's
    pre-merged shuffle files (OpsFetcherIterator.scala one-local-file read).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the warehouse dir outlives the (tmp-homed) metastore: a leftover
    # location from a previous session blocks CREATE — remove it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table)
    if os.path.exists(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def roundtrip(
    df: DataFrame,
    fmt: str,
    reader_options: dict | None = None,
    writer_options: dict | None = None,
) -> DataFrame:
    """Write df in fmt and read it back with the SAME schema (no inference:
    schema-on-read with an explicit StructType, the scalable discipline)."""
    path = os.path.join(scratch_dir(f"rt_{fmt}"), "data")
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)
    spark: SparkSession = df.sparkSession
    reader: DataFrameReader = spark.read.format(fmt).schema(df.schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE-style small-file compaction — the table-maintenance pass a
    100 TB pipeline runs continuously (streaming sinks and fine-grained
    partitioning mint thousands of KB-sized files; at scale the NameNode/
    listing cost and per-file open overhead dominate reads long before
    the bytes do).

    Rewrites the dataset into ceil(total_bytes / target_bytes) files.
    With sort_by, data is range-repartitioned and sorted within files so
    parquet footer min/max stats make the files SKIPPABLE on that key
    (the poor man's Z-order for a single key; composite keys should use
    the z-order query's interleaving first). The rewrite lands in a
    sibling temp directory and swaps in via two renames — readers never
    observe a half-written dataset, matching FileFormatWriter's
    job-commit discipline at the directory level.

    Returns {files_before, files_after, bytes, n_target_files}.
    """
    import math

    def _files(p: str) -> list[str]:
        out = []
        for root, _, names in os.walk(p):
            out += [
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet") and not n.startswith(".")
            ]
        return out

    before = _files(path)
    total = sum(os.path.getsize(f) for f in before)
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_by]
        out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n)
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_files(path)),
        "bytes": total,
        "n_target_files": n,
    }
