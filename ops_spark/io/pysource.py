"""Python Data Source API (Spark 4): a user-defined source with partition
planning and source-level filter pushdown.

Capability parity: the reference's DataSource V2 read path
(sql/core/.../datasources/v2/DataSourceV2ScanExec.scala, reader factories
+ InputPartition planning) — re-expressed through PySpark's
``pyspark.sql.datasource`` surface, the Python-native descendant of that
API: ``partitions()`` is InputPartition planning, ``pushFilters()`` is
SupportsPushDownFilters.

The source generates deterministic synthetic events from pure arithmetic
on the row id, so any engine can reproduce it exactly (the DuckDB oracle
uses ``range()`` + the same expressions) and generation is embarrassingly
parallel: each InputPartition owns a contiguous id range, no coordination,
no skew. Filter pushdown on ``event_id`` narrows the generated range —
the source-side analog of partition pruning: at 100 TB the pruned rows
are never materialized at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENTS_DDL = "event_id bigint, user_id bigint, etype string, amount double"
_ETYPES = ("view", "click", "purchase")


@dataclass
class _Range(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticEventsReader(DataSourceReader):
    """Range-partitioned deterministic generator with id-filter pushdown."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numpartitions", 8))
        self.lo = 0
        self.hi = self.n_rows  # exclusive

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        """Accept event_id range/equality filters by narrowing generation;
        yield the rest back to Spark for post-scan evaluation."""
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("event_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("event_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("event_id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("event_id",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("event_id",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # unhandled → Spark evaluates it after the scan

    def partitions(self) -> list[_Range]:
        """Contiguous id ranges AFTER pushdown — pruned ids are never
        planned, let alone generated."""
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        span = max(1, (hi - lo + n - 1) // n)
        return [
            _Range(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_Range(lo, lo)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 97,
                _ETYPES[i % 3],
                round((i * 7919 % 10000) / 100.0, 2),
            )


def _gen_row(i: int) -> tuple:
    return (i, i % 97, _ETYPES[i % 3], round((i * 7919 % 10000) / 100.0, 2))


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded micro-batch source: each batch advances the id offset by
    ``chunk`` until ``rows`` ids have been emitted, then reports no new
    data. Offsets are plain dicts — replayable, so checkpoint recovery
    re-reads the identical id range (exactly-once with a deterministic
    generator)."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.chunk = int(options.get("chunk", 100))

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.chunk, self.n_rows)
        return iter([_gen_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter([_gen_row(i) for i in range(int(start["next"]), int(end["next"]))])


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("ops_events").option("rows", N) source —
    batch reader with pushdown AND micro-batch stream reader."""

    @classmethod
    def name(cls) -> str:
        return "ops_events"

    def schema(self) -> str:
        return EVENTS_DDL

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader({k.lower(): v for k, v in self.options.items()})

    def simpleStreamReader(self, schema: StructType) -> SyntheticEventsStreamReader:  # noqa: N802
        return SyntheticEventsStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def register_python_source(spark) -> None:
    # The DataSource class ships to Spark's Python workers via cloudpickle;
    # by-value registration removes the worker-PYTHONPATH assumption
    # (see ops_spark._pickle).
    from ops_spark._pickle import register_self

    register_self(__name__)
    spark.dataSource.register(SyntheticEventsDataSource)
