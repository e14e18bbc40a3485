"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ops_spark`` package; this module adapts its
query registry to the driver contract.

Naming: ``Q01``-``Q22`` is the headline TPC-H battery; an ``x_`` prefix
marks rows-only queries (not ANSI-SQL-expressible — sketches, LSH/IVF
approximations, stubbed multimodal decode) which intentionally have no
``oracle_sql()`` entry and are recall/property-tested in ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ops_spark.queries as _q

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _q.get_query("Q01_pricing_summary").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: query.builder for name, query in sorted(_q.all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: query.oracle
        for name, query in sorted(_q.all_queries().items())
        if query.oracle is not None
    }
