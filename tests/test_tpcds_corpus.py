"""TPC-DS corpus battery — parity with the reference's largest in-tree
query corpus (TPCDSQuerySuite.scala:27, sql/core/src/test/resources/
tpcds{,-v2.7.0,-modifiedQueries}/): every one of the 156 published texts
(103 primary + 32 v2.7 variants + 21 modified) must analyze, optimize,
physical-plan AND execute end-to-end over the 24-table TPC-DS schema.

Strictly stronger than the reference suite in one direction, honestly
weaker in another: the reference stops at plan + generated-code
compilation and never runs the plans; this battery RUNS every query to
completion (empty inputs — same as the reference's empty `USING parquet`
tables), which exercises analysis, optimization, physical planning, AQE
re-planning and whatever codegen the empty-input stages compile, but AQE
early-outs may skip compiling some downstream fragments the Scala suite
force-compiles. The corpus is verbatim (see tpcds_corpus.py provenance);
ZERO dialect shims were needed — Spark's ANSI parser takes all 156 texts
as published.
"""

from __future__ import annotations

import pytest

from ops_spark.queries.tpcds_corpus import (
    QUERIES,
    QUERIES_MODIFIED,
    QUERIES_V2_7,
    TPCDS_TABLES,
)


@pytest.fixture(scope="module")
def tpcds_views(spark):
    """The 24 TPC-DS tables as empty temp views (the reference suite's
    setup: schema-only `USING parquet` tables)."""
    for t, schema in TPCDS_TABLES.items():
        spark.createDataFrame([], schema).createOrReplaceTempView(t)
    yield spark
    for t in TPCDS_TABLES:
        spark.catalog.dropTempView(t)


def _sweep(spark, corpus: dict[str, str]) -> list[str]:
    failures = []
    for name, sql in corpus.items():
        try:
            df = spark.sql(sql)
            # physical plan must materialize (analyze/optimize/plan)...
            assert df._jdf.queryExecution().executedPlan() is not None
            # ...and the plan must actually run to completion
            df.collect()
        except Exception as e:  # noqa: BLE001 — collected for the report
            failures.append(f"{name}: {str(e).splitlines()[0][:200]}")
    return failures


def test_tpcds_primary_103(tpcds_views):
    """All 103 primary TPC-DS queries (q1-q99 + q14/q23/q24/q39 a/b)
    plan and execute verbatim."""
    assert len(QUERIES) == 103
    failures = _sweep(tpcds_views, QUERIES)
    assert not failures, f"{len(failures)} failed: {failures}"


def test_tpcds_v2_7_variants(tpcds_views):
    """All 32 TPC-DS v2.7 variant texts plan and execute verbatim."""
    assert len(QUERIES_V2_7) == 32
    failures = _sweep(tpcds_views, QUERIES_V2_7)
    assert not failures, f"{len(failures)} failed: {failures}"


def test_tpcds_modified_queries(tpcds_views):
    """All 21 'modified' TPC-DS texts (the reference's third sweep)
    plan and execute verbatim."""
    assert len(QUERIES_MODIFIED) == 21
    failures = _sweep(tpcds_views, QUERIES_MODIFIED)
    assert not failures, f"{len(failures)} failed: {failures}"


def test_tpcds_schema_is_complete(spark):
    """24 tables, each schema parses, and the big fact tables carry the
    spec's column counts (a truncated DDL would silently weaken every
    planability claim above)."""
    assert len(TPCDS_TABLES) == 24
    widths = {}
    for t, schema in TPCDS_TABLES.items():
        df = spark.createDataFrame([], schema)
        widths[t] = len(df.schema.fields)
    assert widths["store_sales"] == 23
    assert widths["catalog_sales"] == 34
    assert widths["web_sales"] == 34
    assert widths["inventory"] == 4
    assert widths["date_dim"] == 28
