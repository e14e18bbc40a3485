"""DuckDB-oracle conformance checker.

Re-implements the driver harness's comparison locally so tests catch
mismatches before the round gate: run the Spark builder and the DuckDB
oracle on the same parquet fixtures, sort columns by name, sort rows, and
compare values (exact for non-floats, exact-after-query-side-rounding for
floats, with a small tolerance reported separately so precision drift is
visible before it becomes a hash mismatch).

Mirrors the reference's golden-file methodology (reference:
sql/core/src/test/scala/.../SQLQueryTestSuite.scala:83) with DuckDB as the
result generator instead of checked-in .sql.out files.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from ops_spark.io import TABLES
from ops_spark.queries.registry import Query


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the fixture tables registered as views (the driver
    pre-registers the same set)."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table = a DIRECTORY of part files (the derived
            # 100x datasets); the driver's fixtures are single files.
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def consume(df) -> int:
    """Fully compute EVERY output column of df and return its row count —
    the honest measurement action for benchmarks.

    ``df.count()`` compiles count(1) over the plan, so Catalyst prunes all
    unreferenced columns and ELIMINATES a final left join whose right side
    is aggregate-unique (row count provably preserved) — the entire body
    of an enrichment-shaped query (left join from the entity table onto
    grouped results: neighbor counts, decontamination flags, span
    coverage) silently vanishes from the measurement (observed at 100×:
    geo_radius_count 0.24 s via count() vs 267 s computed). Hashing every
    column into one long defeats pruning and join elimination while
    adding only ~1 cheap expression per row; map/variant columns (which
    the hash expression rejects) ride as JSON/strings.
    """
    from pyspark.sql import functions as F

    cols = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if "map<" in s:
            cols.append(F.to_json(F.col(f.name)))
        elif "variant" in s:
            cols.append(F.col(f.name).cast("string"))
        else:
            cols.append(F.col(f.name))
    try:
        row = (
            df.select(F.xxhash64(*cols).alias("__h"))
            .agg(F.count("__h").alias("n"), F.sum("__h"))
            .first()
        )
        return int(row[0])
    except Exception:  # noqa: BLE001 — unhashable type surprises: degrade
        return df.count()


def complex_output_columns(sdf) -> list[str]:
    """Top-level array/map/struct output columns — unorderable as raw pandas
    cells, so they crash the driver's sort-then-hash canonicalizer. Every
    oracle-tier query must stringify these (array_join / to_json) on BOTH
    sides; rows-only ``x_`` queries may keep them (the driver only counts
    rows there)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # Sort RAW values first — exactly like the driver's canonicalizer —
        # so any unhashable/unorderable cell type (numpy.ndarray from an
        # array<> column, dict from map<>, Row from struct<>) crashes HERE,
        # locally, instead of passing locally and failing the round gate
        # (the round-2 fn_array_extra regression: the old stringify-before-
        # sort order masked exactly this class of drift).
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df


def _values_equal(a: object, b: object, float_tol: float) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if float_tol > 0:
            return abs(fa - fb) <= float_tol * max(1.0, abs(fa), abs(fb))
        return str(a) == str(b)
    return str(a) == str(b)


def compare(
    spark: SparkSession,
    query: Query,
    sf_dir: str,
    float_tol: float = 0.0,
) -> CompareResult:
    """float_tol=0 (default) compares stringified values EXACTLY — the same
    standard as the driver's order-insensitive value hash. Pass a tolerance
    only for debugging, never to declare a query done."""
    if query.oracle is None:
        sdf = query.builder(spark, sf_dir).toPandas()
        return CompareResult(query.name, True, "rows-only (no oracle)", len(sdf), -1)

    sdf = query.builder(spark, sf_dir)
    bad = complex_output_columns(sdf)
    if bad:
        return CompareResult(
            query.name,
            False,
            f"complex-typed output columns {bad}: the driver's canonicalizer "
            "sorts raw pandas cells and crashes on ndarray/dict/Row — "
            "stringify (array_join/to_json) in the query or demote to x_ tier",
        )
    spark_pdf = _normalize(sdf.toPandas())
    con = duckdb_connection(sf_dir)
    oracle_pdf = _normalize(con.execute(query.oracle).fetch_df())
    con.close()

    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            query.name,
            False,
            f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
            len(spark_pdf),
            len(oracle_pdf),
        )
    if list(spark_pdf.columns) != list(oracle_pdf.columns):
        return CompareResult(
            query.name,
            False,
            f"columns: spark={list(spark_pdf.columns)} oracle={list(oracle_pdf.columns)}",
            len(spark_pdf),
            len(oracle_pdf),
        )
    for col in spark_pdf.columns:
        sv, ov = spark_pdf[col].tolist(), oracle_pdf[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b, float_tol):
                return CompareResult(
                    query.name,
                    False,
                    f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}",
                    len(spark_pdf),
                    len(oracle_pdf),
                )
    return CompareResult(query.name, True, "match", len(spark_pdf), len(oracle_pdf))
