"""Cost-based optimization: ANALYZE TABLE statistics + CBO join reordering.

Capability parity (SURVEY.md §2 planner surface; reference:
sql/core/src/main/scala/org/apache/spark/sql/execution/command/
AnalyzeTableCommand.scala:28, AnalyzeColumnCommand.scala:33, and
catalyst/optimizer/CostBasedJoinReorder.scala:35).

Why this matters at 100 TB: without table/column statistics the optimizer
only knows file sizes, so multi-way joins run in textual order and broadcast
decisions key on raw bytes. ANALYZE'd rowCount + per-column NDV/min/max let
CostBasedJoinReorder pick the cheapest join tree (small filtered dimensions
first) — on a 6-table star join that is routinely the difference between a
shuffle of the fact table once vs. three times.

Usage shape::

    names = snapshot_tables(spark, sf_dir, {"customer": ["c_nationkey"], ...})
    analyze(spark, names["customer"], columns=["c_nationkey"])
    with cbo(spark):
        df = spark.sql(...)        # CBO + join reorder active
"""

from __future__ import annotations

import contextlib
import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Star-schema detection ranks fact/dimension joins by selectivity.
    "spark.sql.cbo.starSchemaDetection": "true",
}


def snapshot_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: dict[str, list[str]],
    suffix: str | None = None,
) -> dict[str, str]:
    """Persist fixture tables into the session catalog (parquet-backed
    managed tables) so ANALYZE can attach catalog statistics — temp views
    cannot hold them. Returns {fixture_name: catalog_table_name}.

    Idempotent per (sf_dir): the name carries a digest of the fixture dir,
    and existing tables are reused (stats included)."""
    from ops_spark.io import load_table

    import os
    import shutil

    digest = suffix or hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out: dict[str, str] = {}
    for name in tables:
        catalog_name = f"{name}_cbo_{digest}"
        if not spark.catalog.tableExists(catalog_name):
            # The default (in-memory) catalog dies with the session but the
            # warehouse directory persists; clear an orphaned location or
            # saveAsTable fails with LOCATION_ALREADY_EXISTS.
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            stale = os.path.join(warehouse, catalog_name)
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
            load_table(spark, sf_dir, name).write.mode("overwrite").saveAsTable(
                catalog_name
            )
        out[name] = catalog_name
    return out


def analyze(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — table-level
    sizeInBytes/rowCount plus per-column NDV/min/max/null-count histograms
    (the inputs CostBasedJoinReorder costs join trees with)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_row_count_stat(spark: SparkSession, table: str) -> int | None:
    """The catalog rowCount statistic for a scan of ``table`` as the
    optimizer sees it (None until ANALYZE has run)."""
    jstats = (
        spark.table(table)._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    )
    opt = jstats.rowCount()
    return int(str(opt.get())) if opt.isDefined() else None


@contextlib.contextmanager
def cbo(spark: SparkSession, enabled: bool = True) -> Iterator[None]:
    """Scoped CBO toggle; restores prior conf values on exit."""
    prior = {k: spark.conf.get(k, None) for k in CBO_CONFS}
    try:
        for k in CBO_CONFS:
            spark.conf.set(k, "true" if enabled else "false")
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def join_leaf_order(df: DataFrame) -> list[str]:
    """Catalog-table leaf names in optimized-plan order (left-to-right,
    depth-first) — the observable CostBasedJoinReorder rearranges. Leaves
    appear as `Relation spark_catalog.default.<name>[...]` lines."""
    import re

    text = str(df._jdf.queryExecution().optimizedPlan())  # noqa: SLF001
    return re.findall(r"Relation \S*?default\.(\w+)\[", text)
