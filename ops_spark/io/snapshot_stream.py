"""The ``ops_snapshot`` Spark data source — snapshot tables through the
standard reader APIs, batch and streaming (Delta's `format("delta")`
UX):

- BATCH: ``spark.read.format("ops_snapshot").option("path", dir)`` with
  ``versionasof`` / ``timestampasof`` time travel; comparison predicates
  reach the scan via Spark 4.1 filter pushdown and prune files from the
  COMMIT-LOG min/max on the driver (zero I/O) before any task launches —
  the same data-skipping read_snapshot's key_range does, now through the
  plain DataFrame filter API.
- STREAMING: the commit log IS a replayable message bus, so a downstream
  pipeline can tail a 100 TB table incrementally instead of re-scanning
  it per run.

Spark-first shape: a Python Data Source (Spark 4 `pyspark.sql.datasource`)
whose stream reader uses COMMIT VERSIONS as offsets. Each micro-batch
covers the commits in (start, end]; its input partitions are exactly the
files those commits ADDED — one partition per immutable data file, read
executor-side via pyarrow and emitted as Arrow record batches (never
driver-materialized). Offsets are replayable: commits and data files are
immutable, so checkpoint recovery re-reads the identical file set —
exactly-once into an idempotent sink.

Change semantics mirror Delta's:

- ``changemode=append`` (default): a commit that REMOVES files (merge,
  delete_where, replace_range, compact, rollback) fails the stream —
  silently re-emitting rewritten rows would double-count downstream.
- ``changemode=ignore_changes``: non-append commits are tolerated and
  their ADDED files are emitted (Delta's ignoreChanges caveat applies:
  rewritten files re-emit their copied rows; dedup downstream on a key).
  Replayed files are read through the deletion vectors as of each
  BATCH's end version, so a backfill that admits a dv commit in the
  same batch never re-emits its deleted rows raw; a dv commit landing
  in a later batch cannot retroactively filter already-emitted rows
  (the standard ignoreChanges caveat — use changemode=cdf for exact
  retractions).
- ``changemode=cdf``: row-level changes (the Delta CDF stream): each
  batch's rows carry ``_change_type`` ('insert' for added files,
  'delete' retractions for the positions a dv commit newly covers) and
  ``_commit_version``. A DV MERGE surfaces as delete+insert pairs
  (split-update representation). Copy-on-write rewrites still fail the
  stream — use snapshots.snapshot_diff across those.
- ``startingversion=N``: begin tailing at commit N (Delta's
  startingVersion) instead of 0. N beyond the current head is fine:
  the offset holds at N-1 until the log catches up, so no batch is
  ever planned with end < start and no commit below N is emitted.
- ``maxfilespertrigger=K``: admission control (Delta's
  maxFilesPerTrigger). Each micro-batch advances the end offset only
  through as many whole commits as fit K work units — added files plus
  dv re-points, each of which costs a whole-file read slice in
  cdf/ignore_changes — so a backlogged tail drains as several bounded
  batches instead of one giant plan.
  Commits are never split (the offset is a version number), and a
  single commit larger than K still admits alone so the stream always
  progresses. Pacing needs the current read position, which the
  driver-side reader learns from initialOffset/partitions/commit; on
  the rare restart path where the first latestOffset runs before
  either (fresh trigger, no replayed batch), that one batch is
  unpaced — pacing resumes at the next trigger.

Schema evolution: every batch projects its files through the schema of
the batch's END version — files written before an evolution null-fill
appended columns, exactly like the batch read path.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FileSlice(InputPartition):
    abs_path: str | None  # None = planned empty batch (no files added)
    schema_json: str
    dv_abs: str | None = None  # deletion-vector blob (absolute), if any
    # CDF-mode fields (changemode=cdf): emit this slice's rows as change
    # rows of the given type, stamped with the commit that produced
    # them. For change="delete", the rows are the positions newly added
    # by dv_abs relative to prev_dv_abs (the file's previous vector).
    change: str | None = None
    commit_version: int | None = None
    prev_dv_abs: str | None = None


# Extra columns changemode=cdf appends to the table schema (the Delta
# CDF reader shape: _change_type + the commit that produced the change).
_CDF_COLS = [("_change_type", "string"), ("_commit_version", "long")]


class SnapshotStreamReader(DataSourceStreamReader):
    """Commit-version offsets over a snapshot table's log."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("ops_snapshot requires .option('path', table_dir)")
        self.path = path
        self.mode = options.get("changemode", "append")
        if self.mode not in ("append", "ignore_changes", "cdf"):
            raise ValueError(f"unsupported changemode: {self.mode}")
        self.start_version = int(options.get("startingversion", 0))
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxfilespertrigger must be >= 1")
        self._cursor: int | None = None  # last planned/committed end

    # -- driver-side planning ------------------------------------------
    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        self._cursor = self.start_version - 1
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:  # noqa: N802 (API name)
        from ops_spark.io.snapshots import _log_entries, _read_commit

        commits, _ = _log_entries(self.path)
        head = commits[-1] if commits else -1
        # startingversion beyond the current head: hold the offset at
        # start-1 so the first real batch begins exactly there once the
        # log catches up (never end < start, never early commits)
        head = max(head, self.start_version - 1)
        if self.max_files is not None and self._cursor is not None:
            files, paced = 0, self._cursor
            for v in range(self._cursor + 1, head + 1):
                c = _read_commit(self.path, v)
                # a dv re-point adds no file but costs a whole-file read
                # slice in cdf/ignore_changes — count it toward the
                # admission budget or a backlog of dv commits would
                # admit unbounded per-batch work
                files += len(c["add"]) + sum(
                    1 for d in (c.get("dv") or {}).values() if d is not None
                )
                if files > self.max_files and paced > self._cursor:
                    break  # admit whole commits only, always >= 1
                paced = v
                if files >= self.max_files:
                    break
            head = paced
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[_FileSlice]:
        from ops_spark.io.snapshots import SnapshotError, _read_commit, _state

        lo, hi = int(start["version"]), int(end["version"])
        self._cursor = max(self._cursor if self._cursor is not None else hi, hi)
        st = _state(self.path, hi)
        if st is None or st.schema_json is None:
            raise SnapshotError(
                f"not a snapshot table with a recorded schema: {self.path}"
            )
        if self.mode == "cdf":
            return self._cdf_partitions(lo, hi, st)
        parts: list[_FileSlice] = []
        for v in range(lo + 1, hi + 1):
            c = _read_commit(self.path, v)
            if (c["remove"] or c.get("dv")) and self.mode == "append":
                raise SnapshotError(
                    f"commit {v} ({c['op']}) removes files or rows "
                    "(deletion vectors); streaming in append mode "
                    "requires append-only commits — restart with "
                    ".option('changemode', 'cdf') to stream row-level "
                    "changes (dv deletes become retraction rows), or "
                    "'ignore_changes' to re-emit rewritten files (and "
                    "dedup downstream)"
                )
            for rel in c["add"]:
                # ignore_changes replays apply the vectors as of the
                # BATCH's end version, so a backfill that admits the dv
                # commit in the same batch never re-emits its deleted
                # rows raw (a dv commit re-adds no file, so downstream
                # dedup would have nothing newer to converge on). A dv
                # commit landing in a LATER batch cannot retroactively
                # filter rows already emitted — the standard
                # ignoreChanges caveat: dedup/retract downstream, or use
                # changemode=cdf for exact retractions.
                d = st.dv.get(rel) if self.mode == "ignore_changes" else None
                parts.append(_FileSlice(
                    os.path.join(self.path, rel),
                    st.schema_json,
                    os.path.join(self.path, d) if d is not None else None,
                ))
        if not parts:  # all-metadata commits: plan one explicit empty slice
            parts.append(_FileSlice(None, st.schema_json))
        return parts

    def _cdf_partitions(self, lo: int, hi: int, st) -> list[_FileSlice]:
        """changemode=cdf — emit row-level CHANGES per commit (the Delta
        CDF-stream shape): added files become 'insert' rows; a dv commit
        becomes 'delete' rows for exactly the positions its blob newly
        covers (new blob minus the file's previous vector — sound
        because every DV writer UNIONS the previous vector, so vectors
        only grow). A DV MERGE surfaces as delete+insert pairs
        (split-update CDF representation — keyed consumers converge).
        Commits that REMOVE files (copy-on-write rewrites, compaction)
        and ROLLBACKS (the only commits that can shrink or clear a
        vector — emitting nothing would silently hide the resurrected
        rows) are not row-exact in a file-sliced stream and fail it —
        use snapshot_diff for version-to-version CDF over those."""
        from ops_spark.io.snapshots import SnapshotError, _read_commit, _state

        # the dv state each commit's deltas are computed AGAINST: fold
        # forward from the batch's start version
        dvmap = dict(_state(self.path, lo).dv) if lo >= 0 else {}
        parts: list[_FileSlice] = []
        wanted: set[str] = set()  # rels each planned slice will read
        for v in range(lo + 1, hi + 1):
            c = _read_commit(self.path, v)
            op = str(c.get("op", ""))
            if c["remove"] or op.startswith("rollback:") or any(
                d is None for d in (c.get("dv") or {}).values()
            ):
                raise SnapshotError(
                    f"commit {v} ({op}) rewrites/removes files or "
                    "restores deletion vectors; the cdf stream mode is "
                    "exact only over appends and vector-growing dv "
                    "commits — read changes across rewrites/rollbacks "
                    "with snapshots.snapshot_diff"
                )
            for rel in c["add"]:
                wanted.add(rel)
                parts.append(_FileSlice(
                    os.path.join(self.path, rel), st.schema_json,
                    change="insert", commit_version=v,
                ))
            for rel, d in (c.get("dv") or {}).items():
                prev = dvmap.get(rel)
                wanted |= {rel, d} | ({prev} if prev is not None else set())
                parts.append(_FileSlice(
                    os.path.join(self.path, rel), st.schema_json,
                    dv_abs=os.path.join(self.path, d),
                    change="delete", commit_version=v,
                    prev_dv_abs=(
                        os.path.join(self.path, prev)
                        if prev is not None else None
                    ),
                ))
                dvmap[rel] = d
        # existence check BEFORE any task launches: a vacuumed historical
        # file/blob surfaces as the clean retention error, not a raw
        # executor FileNotFoundError (same guard as read_snapshot/diff)
        gone = [f for f in sorted(wanted)
                if not os.path.exists(os.path.join(self.path, f))]
        if gone:
            raise SnapshotError(
                f"{len(gone)} files in ({lo}, {hi}] were vacuumed; the "
                "cdf backfill window is bounded by the vacuum retention"
            )
        if not parts:
            parts.append(_FileSlice(None, st.schema_json, change="insert"))
        return parts

    # -- executor-side read (self-contained: no ops_spark imports) -----
    def read(self, partition: _FileSlice):
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # offsets are recomputable from the immutable log; tracking the
        # committed end here only feeds maxfilespertrigger pacing
        v = int(end["version"])
        self._cursor = max(self._cursor if self._cursor is not None else v, v)


def _blob_positions(blob_abs: str, base: str) -> set:
    """The physical row positions a deletion-vector blob holds for ONE
    file (blobs are per-commit and may cover several files). The
    file==base predicate is pushed into the parquet read (row-group
    pruning + late materialization), so a slice touching one file of a
    many-file blob does not materialize the whole vector — the per-file
    fan-out cost is bounded by the file's own positions plus pruned
    row-group metadata."""
    import pyarrow.parquet as pq

    dvt = pq.read_table(
        blob_abs, columns=["pos"], filters=[("file", "=", base)]
    )
    return set(dvt.column("pos").to_pylist())


def _read_slice(partition: _FileSlice):
    """Executor-side file read shared by the batch and stream readers:
    pyarrow record batches projected through the slice's LOGICAL schema
    (files written before a schema evolution null-fill appended columns;
    column-mapped tables store bytes under physical names). CDF slices
    (``change`` set) emit change rows instead: 'insert' = the file's
    rows; 'delete' = ONLY the positions the slice's blob newly covers
    relative to the file's previous vector — both stamped with
    ``_change_type`` / ``_commit_version``."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType as _ST

    target = _ST.fromJson(json.loads(partition.schema_json))
    a_schema = to_arrow_schema(target)
    if partition.change is not None:
        a_out = a_schema
        for nm, t in _CDF_COLS:
            a_out = a_out.append(
                pa.field(nm, pa.string() if t == "string" else pa.int64())
            )
    else:
        a_out = a_schema
    if partition.abs_path is None:
        return iter(())
    tbl = pq.read_table(partition.abs_path)
    base = os.path.basename(partition.abs_path)
    if partition.change == "delete":
        # retraction rows: the blob's positions MINUS the previous
        # vector's (a blob always holds the file's whole vector)
        new_pos = _blob_positions(partition.dv_abs, base)
        prev_pos = (
            _blob_positions(partition.prev_dv_abs, base)
            if partition.prev_dv_abs is not None else set()
        )
        fresh = sorted(new_pos - prev_pos)
        tbl = (
            tbl.take(pa.array(fresh, pa.int64()))
            if fresh else tbl.slice(0, 0)
        )
    elif partition.dv_abs is not None:
        # deletion vector: drop the blob's positions for THIS file.
        # Positions are physical row indices of the whole file, which is
        # exactly what pq.read_table materialized — mask before any
        # projection.
        import numpy as np

        pos = sorted(_blob_positions(partition.dv_abs, base))
        if pos:
            keep = np.ones(tbl.num_rows, dtype=bool)
            keep[np.asarray(pos, dtype=np.int64)] = False
            tbl = tbl.filter(pa.array(keep))
    cols = []
    for field, sf in zip(a_schema, target.fields):
        phys = (sf.metadata or {}).get("ops_physical", field.name)
        if phys in tbl.column_names:
            cols.append(tbl.column(phys).cast(field.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, field.type))
    if partition.change is not None:
        n = tbl.num_rows
        cols.append(pa.array([partition.change] * n, pa.string()))
        cols.append(pa.array([partition.commit_version] * n, pa.int64()))
    out = pa.Table.from_arrays(cols, schema=a_out)
    return iter(out.to_batches())


def _resolve_version(options: dict) -> int | None:
    """versionasof / timestampasof reader options -> explicit version
    (None = latest). Mirrors Delta's mutually exclusive reader options."""
    from ops_spark.io.snapshots import SnapshotError, _version_at_timestamp

    v, ts = options.get("versionasof"), options.get("timestampasof")
    if v is not None and ts is not None:
        raise SnapshotError("pass versionasof OR timestampasof, not both")
    if v is not None:
        return int(v)
    if ts is not None:
        try:
            ts = float(ts)  # epoch-seconds string
        except ValueError:
            pass  # ISO-8601 string: _as_epoch parses it downstream
        return _version_at_timestamp(options["path"], ts)
    return None


class SnapshotBatchReader(DataSourceReader):
    """spark.read.format("ops_snapshot") — batch scan of one version of
    a snapshot table (Delta's reader UX): one input partition per
    immutable live data file, read executor-side via pyarrow.

    Filter pushdown = the commit-log DATA-SKIPPING path: Spark hands the
    scan its comparison predicates (pushFilters, Spark 4.1), files whose
    logged min/max provably cannot match are dropped from the plan on
    the DRIVER — zero I/O — and every filter is returned to Spark for
    exact post-scan evaluation (skipping is a safe over-approximation,
    never a substitute for the predicate)."""

    def __init__(self, options: dict) -> None:
        from ops_spark.io.snapshots import SnapshotError, _state

        path = options.get("path")
        if not path:
            raise ValueError("ops_snapshot requires .option('path', table_dir)")
        if options.get("changemode"):
            # the advertised schema would carry the CDF columns but batch
            # slices never produce them — reject up front instead of
            # failing the scan with an Arrow schema mismatch
            raise ValueError(
                "changemode is a STREAMING option (spark.readStream); a "
                "batch read sees one version — use versionasof/"
                "timestampasof, or snapshots.snapshot_diff for batch CDF"
            )
        self.path = path
        st = _state(path, _resolve_version(options))
        if st is None or st.schema_json is None:
            raise SnapshotError(
                f"not a snapshot table with a recorded schema: {path}"
            )
        self._st = st
        self._bounds: dict[str, list] = {}  # physical col -> [lo, hi]
        # physical col -> exact IN-list value set (intersection across
        # repeated IN filters). Exactness matters for SPARSE lists: the
        # [min,max] hull of IN (lo, hi) keeps every file between the two
        # endpoints; the value set prunes a file unless SOME listed value
        # intersects its logged min/max. Capped to bound driver work —
        # beyond the cap only the hull applies (still correct: pruning is
        # always an over-approximation of the matching file set).
        self._in_sets: dict[str, set] = {}

    _IN_SET_CAP = 256  # values per column; above this, hull-only

    def pushFilters(self, filters):  # noqa: N802 (API name)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        from ops_spark.io.snapshots import _stat_val
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(self._st.schema_json))
        phys = {
            f.name: (f.metadata or {}).get("ops_physical", f.name)
            for f in schema.fields
        }
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1 or attr[0] not in phys:
                continue
            col = phys[attr[0]]
            lo = hi = None
            if isinstance(f, EqualTo):
                lo = hi = _stat_val(f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                lo = _stat_val(f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                hi = _stat_val(f.value)
            elif isinstance(f, In) and f.value:
                vals = [_stat_val(v) for v in f.value]
                if None not in vals:
                    try:
                        lo, hi = min(vals), max(vals)
                    except TypeError:
                        lo = hi = None
                    if lo is not None and len(vals) <= self._IN_SET_CAP:
                        vset = set(vals)
                        if col in self._in_sets:  # AND of INs: intersect
                            vset &= self._in_sets[col]
                        self._in_sets[col] = vset
            if lo is None and hi is None:
                continue
            b = self._bounds.setdefault(col, [None, None])
            # AND-combine: tightest bounds win (comparable types only)
            try:
                if lo is not None and (b[0] is None or lo > b[0]):
                    b[0] = lo
                if hi is not None and (b[1] is None or hi < b[1]):
                    b[1] = hi
            except TypeError:
                pass  # incomparable encodings: keep prior bound
        # every filter still runs in Spark post-scan — pruning is only
        # ever an over-approximation of the matching file set
        return filters

    def partitions(self) -> list[_FileSlice]:
        from ops_spark.io.snapshots import _log_prune_decision

        st = self._st
        files = st.live
        for col, (qlo, qhi) in self._bounds.items():
            files = [
                rel
                for rel in files
                if _log_prune_decision(st.stats.get(rel, {}), col, qlo, qhi)
                is not True
            ]
        for col, vals in self._in_sets.items():
            # exact IN pruning: keep a file only if SOME listed value can
            # fall inside its logged min/max (a file the log can't decide
            # — no stats for col — returns None for every value and stays)
            files = [
                rel
                for rel in files
                if any(
                    _log_prune_decision(st.stats.get(rel, {}), col, v, v)
                    is not True
                    for v in vals
                )
            ]
        return [
            _FileSlice(
                os.path.join(self.path, rel),
                st.schema_json,
                (os.path.join(self.path, st.dv[rel])
                 if st.dv.get(rel) is not None else None),
            )
            for rel in files
        ] or [_FileSlice(None, st.schema_json)]

    def read(self, partition: _FileSlice):
        return _read_slice(partition)


@dataclass
class _StagedPart(WriterCommitMessage):
    # stage-dir-relative path "<stage>/<part>.parquet" (the message must
    # carry the REAL location: Spark may deserialize a different writer
    # instance per batch/side, so the driver cannot assume its own stage
    # uuid matches the executors'); None = empty task
    rel_stage: str | None
    n_rows: int


def _stage_arrow_part(path: str, stage: str, colmap: dict, iterator) -> _StagedPart:
    """Executor-side half of the 2PC write: stream this task's Arrow
    batches into ONE private parquet file under the write's stage dir,
    renaming logical -> physical columns on mapped tables."""
    import pyarrow.parquet as pq

    rel = os.path.join(stage, f"part-{uuid.uuid4().hex}.parquet")
    full = os.path.join(path, rel)
    writer, n = None, 0
    try:
        for batch in iterator:
            if any(colmap.get(c, c) != c for c in batch.schema.names):
                batch = batch.rename_columns(
                    [colmap.get(c, c) for c in batch.schema.names]
                )
            if writer is None:
                os.makedirs(os.path.dirname(full), exist_ok=True)
                writer = pq.ParquetWriter(full, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    if n == 0 and writer is None:
        return _StagedPart(rel_stage=None, n_rows=0)
    return _StagedPart(rel_stage=rel, n_rows=n)


def _move_staged(path: str, staged: list[str], version: int) -> list[str]:
    """Driver-side: move staged parts into data/ under version-unique
    names; returns the committed-relative paths. Every source stage dir
    is removed afterwards. Moved files are utime'd and manifested (see
    snapshots.py's in-flight-protection note) so a concurrent vacuum
    spares them until the commit publishes."""
    import shutil

    from ops_spark.io import snapshots as S

    added = []
    os.makedirs(os.path.join(path, S._DATA), exist_ok=True)
    dirs = set()
    for rel in sorted(staged):
        dirs.add(os.path.dirname(rel))
        base = os.path.basename(rel)
        dst_rel = os.path.join(S._DATA, f"v{version}-{uuid.uuid4().hex[:8]}-{base}")
        os.rename(os.path.join(path, rel), os.path.join(path, dst_rel))
        try:
            os.utime(os.path.join(path, dst_rel))
        except OSError:
            pass
        added.append(dst_rel)
    for d in dirs:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    S._manifest_stage(path, added)
    return added


class SnapshotBatchWriter(DataSourceArrowWriter):
    """df.write.format("ops_snapshot").mode("append"|"overwrite") — the
    V2 two-phase commit mapped onto the snapshot commit log: each task
    streams its Arrow batches into ONE private parquet file under a
    write-scoped stage dir (physical column names on mapped tables) and
    returns a commit message; only the DRIVER's commit() moves the parts
    into data/ and publishes ONE log commit — anchored at the table
    version READ during planning: an append goes through the same
    optimistic-concurrency loop as write_snapshot (a racing append
    rebases instead of failing, anything conflicting raises), an
    overwrite fails fast if ANY commit landed since planning (its
    remove set — the live files it replaces — would be stale, leaving
    the interloper's files alive through the "overwrite"). A
    crashed/speculated task can never leave visible rows. abort()
    discards the stage.

    Tables with CHECK constraints reject this path entirely — append
    AND overwrite (constraint exprs are Catalyst SQL, not evaluable
    inside the Arrow writer, and constraints persist in folded state
    across overwrites, so an unvalidated overwrite would land
    unchecked rows in a still-constrained table). Write via
    io.snapshots.write_snapshot, which enforces them in the write job
    on every mode — Delta likewise enforces CHECK on every write
    path."""

    def __init__(self, options: dict, df_schema: StructType,
                 overwrite: bool) -> None:
        from ops_spark.io.snapshots import (
            SnapshotError,
            _evolve_schema,
            _physical_name,
            _state,
        )

        path = options.get("path")
        if not path:
            raise ValueError("ops_snapshot writer requires .option('path', dir)")
        self.path = path
        self.overwrite = overwrite
        st = _state(path)
        if st is not None and st.constraints:
            raise SnapshotError(
                "table has CHECK constraints; write through "
                "ops_spark.io.snapshots.write_snapshot (the Arrow write "
                "path cannot evaluate them)"
            )
        # the commit anchors HERE: every commit landing between this
        # read and commit() must pass conflict validation (append) or
        # fail the write (overwrite) — never be silently absorbed
        self.base_version = -1 if st is None else st.latest
        self.base_schema_json = st.schema_json if st else None
        if overwrite or st is None:
            out_schema = df_schema
        else:
            out_schema = _evolve_schema(st.schema, df_schema)
        self.schema_json = out_schema.json()
        # logical -> physical rename for THIS df's columns (column mapping)
        by_name = {f.name: f for f in out_schema.fields}
        self.colmap = {
            f.name: _physical_name(by_name[f.name])
            for f in df_schema.fields
        }
        self.stage = f".stage-{uuid.uuid4().hex}"
        self.remove = st.live if (overwrite and st is not None) else []

    # -- executor side --------------------------------------------------
    def write(self, iterator) -> _StagedPart:
        return _stage_arrow_part(self.path, self.stage, self.colmap, iterator)

    # -- driver side ------------------------------------------------------
    def commit(self, messages) -> None:
        import shutil

        from ops_spark.io import snapshots as S

        staged = [m.rel_stage for m in messages if m and m.rel_stage]
        # version anchors at the PLANNING-time base, never the fresh
        # head: a commit that landed mid-write must collide here so the
        # OCC loop (append) validates it or the overwrite fails fast —
        # recomputing from the fresh head would silently absorb it
        # (stale remove set on overwrite, stale schema on append)
        version = self.base_version + 1
        added = _move_staged(self.path, staged, version)
        shutil.rmtree(os.path.join(self.path, self.stage), ignore_errors=True)
        commit = {
            "version": version,
            "op": "overwrite" if self.overwrite else "append",
            "add": added,
            "remove": self.remove,
            "schema": self.schema_json,
            "stats": S._collect_stats(self.path, added),
        }
        try:
            if self.overwrite:
                # fail-fast like write_snapshot: our remove set is the
                # live set AS OF planning; any interloper invalidates it
                S._atomic_commit(self.path, commit)
            else:  # racing appends rebase, like write_snapshot
                version = S._commit_or_rebase(
                    self.path, commit,
                    {"kind": "append",
                     "base_schema_json": self.base_schema_json},
                )
        except S.SnapshotError:
            S._unstage(self.path, added)
            raise
        S._maybe_checkpoint(self.path, version)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, self.stage), ignore_errors=True)


class SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """df.writeStream.format("ops_snapshot") — EXACTLY-ONCE streaming
    appends into the commit log (Delta's streaming sink): every
    micro-batch publishes ONE commit via the 2PC task staging above,
    stamped with ``{"txn": {"app": <txnappid>, "batch": batchId}}``.
    On restart, Spark replays the last unacknowledged batch; before
    committing, the sink scans the log backwards for this app's newest
    txn stamp and SKIPS any batch at or below it — the replay becomes a
    no-op instead of duplicate rows (Delta's txnAppId/txnVersion
    idempotence). Without .option("txnappid", ...) the sink still works
    but a replayed batch can double-append — same caveat as Delta
    without txn options; the checkpoint's WAL makes that window one
    batch wide."""

    def __init__(self, options: dict, df_schema: StructType) -> None:
        from ops_spark.io.snapshots import (
            SnapshotError,
            _evolve_schema,
            _physical_name,
            _state,
        )

        path = options.get("path")
        if not path:
            raise ValueError("ops_snapshot writer requires .option('path', dir)")
        self.path = path
        self.txn_app = options.get("txnappid")
        st = _state(path)
        if st is not None and st.constraints:
            raise SnapshotError(
                "table has CHECK constraints; stream through "
                "io.snapshots.merge_stream (foreachBatch), which enforces "
                "them in the write job"
            )
        out_schema = df_schema if st is None else _evolve_schema(
            st.schema, df_schema
        )
        self.schema_json = out_schema.json()
        by_name = {f.name: f for f in out_schema.fields}
        self.colmap = {
            f.name: _physical_name(by_name[f.name]) for f in df_schema.fields
        }
        self.stage = f".stage-{uuid.uuid4().hex}"
        # each batch commit anchors at the version this sink last SAW
        # (init-time head, then our own last commit): any interloping
        # commit collides and is conflict-validated by the OCC loop
        # instead of being silently absorbed under a stale schema
        self._base_version = -1 if st is None else st.latest
        self._base_schema_json = st.schema_json if st else None

    def write(self, iterator) -> _StagedPart:
        return _stage_arrow_part(self.path, self.stage, self.colmap, iterator)

    def _last_committed_batch(self) -> int | None:
        """Newest txn stamp for this app: scan the log backwards only to
        the newest checkpoint that folded a txn map (O(commits since the
        last checkpoint), typically 1), then answer from the folded map —
        a fresh app on a long-lived table no longer pays O(total commits)
        driver I/O before its first batch. Legacy checkpoints without a
        folded map fall back to the next-older one, finally a full scan."""
        from ops_spark.io import snapshots as S

        commit_vs, ckpt_vs = S._log_entries(self.path)
        base, folded = -1, None
        for cv in sorted(ckpt_vs, reverse=True):
            got = S._checkpoint_txn(self.path, cv)
            if got is not None:
                base, folded = cv, got
                break
        for v in reversed([v for v in commit_vs if v > base]):
            txn = S._read_commit(self.path, v).get("txn")
            if txn and txn.get("app") == self.txn_app:
                return int(txn["batch"])
        if folded is not None and self.txn_app in folded:
            b = folded[self.txn_app]
            return None if b is None else int(b)
        return None

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        import shutil

        from ops_spark.io import snapshots as S

        staged = [m.rel_stage for m in messages if m and m.rel_stage]
        if self.txn_app is not None:
            last = self._last_committed_batch()
            if last is not None and batchId <= last:
                # replayed batch already in the log: exactly-once no-op
                for rel in staged:
                    shutil.rmtree(
                        os.path.join(self.path, os.path.dirname(rel)),
                        ignore_errors=True,
                    )
                return
        version = self._base_version + 1
        added = _move_staged(self.path, staged, version)
        commit = {
            "version": version,
            "op": "append",
            "add": added,
            "remove": [],
            "schema": self.schema_json,
            "stats": S._collect_stats(self.path, added),
        }
        if self.txn_app is not None:
            commit["txn"] = {"app": self.txn_app, "batch": int(batchId)}
        try:
            version = S._commit_or_rebase(
                self.path, commit,
                {"kind": "append",
                 "base_schema_json": self._base_schema_json},
            )
        except S.SnapshotError:
            S._unstage(self.path, added)
            raise
        self._base_version = version  # our own commit is the new anchor
        S._maybe_checkpoint(self.path, version)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        import shutil

        shutil.rmtree(os.path.join(self.path, self.stage), ignore_errors=True)


class SnapshotStreamDataSource(DataSource):
    """The ``ops_snapshot`` format. Batch:
    spark.read.format("ops_snapshot").option("path", dir) with optional
    versionasof / timestampasof time travel and commit-log data skipping
    under filter pushdown; df.write.format("ops_snapshot") commits
    through the same log with two-phase task staging. Streaming:
    readStream over the commit log (version offsets, changemode,
    startingversion, maxfilespertrigger)."""

    @classmethod
    def name(cls) -> str:
        return "ops_snapshot"

    def schema(self) -> StructType:
        from ops_spark.io.snapshots import SnapshotError, _state

        opts = {k.lower(): v for k, v in self.options.items()}
        st = _state(opts["path"], _resolve_version(opts))
        if st is None or st.schema_json is None:
            raise SnapshotError(
                "not a snapshot table with a recorded schema: "
                f"{opts['path']}"
            )
        out = StructType.fromJson(json.loads(st.schema_json))
        if opts.get("changemode") == "cdf":
            from pyspark.sql.types import LongType, StringType, StructField

            for nm, t in _CDF_COLS:
                out = out.add(StructField(
                    nm, StringType() if t == "string" else LongType()
                ))
        return out

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(
            {k.lower(): v for k, v in self.options.items()}
        )

    def writer(self, schema: StructType, overwrite: bool) -> SnapshotBatchWriter:
        return SnapshotBatchWriter(
            {k.lower(): v for k, v in self.options.items()}, schema, overwrite
        )

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        return SnapshotStreamWriter(
            {k.lower(): v for k, v in self.options.items()}, schema
        )

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:  # noqa: N802
        return SnapshotStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def register_snapshot_source(spark) -> None:
    from ops_spark._pickle import register_self

    register_self(__name__)
    spark.dataSource.register(SnapshotStreamDataSource)
