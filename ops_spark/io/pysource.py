"""Python Data Source API (Spark 4): a user-defined source with partition
planning, source-level filter pushdown, and a two-phase-commit writer.

Capability parity: the reference's DataSource V2 read AND write paths
(sql/core/.../datasources/v2/DataSourceV2ScanExec.scala, reader factories
+ InputPartition planning; WriteToDataSourceV2Exec.scala commit protocol)
— re-expressed through PySpark's ``pyspark.sql.datasource`` surface, the
Python-native descendant of that API: ``partitions()`` is InputPartition
planning, ``pushFilters()`` is SupportsPushDownFilters, and
``JsonlDirWriter`` implements task-stage → driver-commit.

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
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_path: str
    n_rows: int


class JsonlDirWriter(DataSourceWriter):
    """Write path with the V2 two-phase commit protocol (reference:
    datasources/v2/WriteToDataSourceV2Exec.scala commit flow): each task
    writes to a private staged file and returns a commit message; only the
    DRIVER's commit() makes results visible (atomic renames + _SUCCESS),
    and abort() discards stages — a failed/speculated task can never leave
    partial output. Local-FS paths here; on a cluster the same protocol
    targets shared storage."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("ops_events writer requires .option('path', dir)")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _StagedFile:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(staged_path=staged, n_rows=n)

    def commit(self, messages) -> None:
        import glob
        import os
        import shutil

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        total = 0
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)  # atomic on one filesystem
            total += m.n_rows
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))

    def abort(self, messages) -> None:
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("ops_events").option("rows", N) source —
    batch reader with pushdown, micro-batch stream reader, AND a batch
    writer with the two-phase commit protocol."""

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

    def writer(self, schema: StructType, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(dict(self.options.items()), overwrite)


def register_python_source(spark) -> None:
    # The DataSource class ships to Spark's Python workers via cloudpickle;
    # by-value registration removes the worker-PYTHONPATH assumption
    # (see ops_spark._pickle).
    from ops_spark._pickle import register_self

    register_self(__name__)
    spark.dataSource.register(SyntheticEventsDataSource)
