"""Registry of named queries with optional DuckDB oracles.

Mirrors the reference's test methodology (SURVEY.md §5): the reference pins
behavior with golden-file SQL corpora (sql/core/src/test/resources/sql-tests/)
and TPC-H/TPC-DS query sets; we pin behavior against a DuckDB oracle running
equivalent ANSI SQL on the same parquet fixtures.

Contract (driver harness):
- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-native implementation.
- ``oracle`` — equivalent DuckDB SQL over pre-registered views, or ``None``
  for non-SQL-expressible ops (driver falls back to a rows-only check).
- Column names/types must agree between both sides (the driver hashes values
  after sorting columns by name), so every computed column is aliased
  identically in both, doubles are rounded identically in both, and integer
  aggregates are cast explicitly (DuckDB sums promote to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return _REGISTRY[name]
