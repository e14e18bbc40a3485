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
    min_file_bytes: int | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> dict:
    """OPTIMIZE-style INCREMENTAL small-file compaction — the
    table-maintenance pass a 100 TB pipeline runs continuously (streaming
    sinks and fine-grained partitioning mint thousands of KB-sized files;
    at scale the NameNode/listing cost and per-file open overhead dominate
    reads long before the bytes do).

    Only files smaller than ``min_file_bytes`` (default: target_bytes/2)
    are read and bin-packed into ceil(small_bytes / target_bytes)
    replacement files; compliant files are left byte-identical under
    their original names, so rewrite I/O is proportional to the
    SMALL-FILE FRACTION, not the table size — the property that makes
    continuous maintenance affordable at 100 TB. Bin-packing is
    per-directory, so partitionBy layouts compact within each partition
    (rows never migrate across partition directories).

    With sort_by, the rewritten rows are range-repartitioned and sorted
    within the new files so parquet footer min/max stats make THOSE
    files skippable on that key; untouched files keep whatever ordering
    they had (full-table clustering is a different, table-sized job).

    With zorder_by=(colA, colB) — Delta/Iceberg's OPTIMIZE ZORDER BY —
    the rewritten rows are clustered on a Morton key instead: each
    numeric column is quantized to 1024 uniform width_bucket cells
    between its min and max (one bounded agg; pure codegen, no UDF),
    the two cell ids bit-interleave (operators/analytics.py:zorder_key),
    and rows range-partition + sort on that key. Every new file then
    covers a bounded sub-RECTANGLE of (A, B), so footer min/max stats
    prune scans filtering on EITHER column — a linear sort only ever
    skips on its leading column. Mutually exclusive with sort_by.

    Swap discipline (crash-correct, single-writer): replacement files
    land in the live directory HIDDEN (dot-prefixed — Spark and this
    function both ignore them), a manifest records the reveal + remove
    lists, the hidden files are renamed visible, the packed originals
    removed, the manifest deleted. Every crash point is recoverable and
    recovery runs automatically at the next call: a manifest present
    means all replacement data was fully written, so the swap ROLLS
    FORWARD (reveal survivors, remove originals); hidden files with no
    manifest are an abandoned attempt whose originals are still intact,
    so they are discarded (ROLL BACK). The dataset path always exists
    and never misses rows; the only reader-visible anomaly is a
    duplicate-row window for a concurrent lister between reveal and
    remove (a table-format manifest — Delta/Iceberg — is the real fix
    for concurrent readers at 100 TB, out of engine scope). Renames are
    assumed POSIX-atomic (local/HDFS semantics, not object stores).

    Returns {files_before, files_after, bytes, rewritten_files,
    rewritten_bytes, untouched_files, n_target_files}.
    """
    import hashlib
    import json
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

    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    if min_file_bytes is None:
        min_file_bytes = target_bytes // 2
    root = path.rstrip("/")

    # ---- recovery from any interrupted previous swap --------------------
    # A manifest means every replacement file for its directory was fully
    # written (the manifest is created only after the hidden renames), so
    # the swap rolls FORWARD; manifest processing must run before orphan
    # cleanup so its hidden files are not mistaken for an abandoned
    # attempt.
    for mroot, _, names in os.walk(root):
        for nm in names:
            if nm.startswith(".compact-") and nm.endswith(".manifest"):
                mp = os.path.join(mroot, nm)
                with open(mp) as fh:
                    m = json.load(fh)
                for hid, vis in m["reveal"]:
                    if os.path.exists(hid):
                        os.rename(hid, vis)
                for f in m["remove"]:
                    if os.path.exists(f):
                        os.remove(f)
                os.remove(mp)
    # Hidden compact files with no manifest: a pre-commit crash — the
    # packed originals are still intact, so roll BACK by discarding them.
    for mroot, _, names in os.walk(root):
        for nm in names:
            if nm.startswith(".compact-") and nm.endswith(".parquet"):
                os.remove(os.path.join(mroot, nm))

    before = _files(root)
    sizes = {f: os.path.getsize(f) for f in before}
    total = sum(sizes.values())

    # group undersized files per directory: partition layouts compact
    # within each partition directory, never across
    by_dir: dict[str, list[str]] = {}
    for f, sz in sizes.items():
        if sz < min_file_bytes:
            by_dir.setdefault(os.path.dirname(f), []).append(f)

    staging = root + ".__compact_tmp"
    shutil.rmtree(staging, ignore_errors=True)
    rewritten_files = 0
    rewritten_bytes = 0
    n_target_total = 0
    for i, (d, small) in enumerate(sorted(by_dir.items())):
        small_bytes = sum(sizes[f] for f in small)
        n = max(1, math.ceil(small_bytes / target_bytes))
        if n >= len(small):
            continue  # packing cannot reduce this directory's file count
        df = spark.read.parquet(*sorted(small))
        if sort_by:
            from pyspark.sql import functions as F

            cols = [F.col(c) for c in sort_by]
            out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
        elif zorder_by:
            from ops_spark.operators.analytics import zorder_cluster

            out = zorder_cluster(df, n, *zorder_by)
        else:
            out = df.repartition(n)
        stage_d = os.path.join(staging, str(i))
        out.write.mode("overwrite").parquet(stage_d)
        # crash-correct swap: hidden files → manifest → reveal → remove →
        # clear manifest (see docstring; recovery above completes or
        # discards any interrupted step)
        tag = hashlib.md5("\n".join(sorted(small)).encode()).hexdigest()[:8]
        reveal: list[tuple[str, str]] = []
        for name in sorted(os.listdir(stage_d)):
            if name.endswith(".parquet") and not name.startswith("."):
                hid = os.path.join(d, f".compact-{tag}-{name}")
                os.rename(os.path.join(stage_d, name), hid)
                reveal.append((hid, os.path.join(d, f"compact-{tag}-{name}")))
        manifest = os.path.join(d, f".compact-{tag}.manifest")
        with open(manifest, "w") as fh:
            json.dump({"reveal": reveal, "remove": small}, fh)
        for hid, vis in reveal:
            os.rename(hid, vis)
        for f in small:
            os.remove(f)
        os.remove(manifest)
        rewritten_files += len(small)
        rewritten_bytes += small_bytes
        n_target_total += n
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(_files(root)),
        "bytes": total,
        "rewritten_files": rewritten_files,
        "rewritten_bytes": rewritten_bytes,
        "untouched_files": len(before) - rewritten_files,
        "n_target_files": n_target_total,
    }
