"""Versioned snapshot tables: a minimal commit log over parquet.

The reference has no table format (its tables are bare directories, the
stock Spark 2.4.3 FileFormat layer — `sql/core/.../datasources/`); a
100 TB pipeline cannot live with bare directories: every overwrite is a
data-loss window, every reader races every writer, and there is no way
to reproduce "the corpus as of the run that trained model X". This
module is the smallest commit-log design that fixes those three things
for a SINGLE-WRITER pipeline — the shape Delta/Iceberg formalize — while
staying pure Spark + JSON:

    <table>/
      _log/00000000000.json      one JSON commit per version
      data/v0-<uuid>-part*.parquet   immutable data files, never renamed

- Each commit lists the files it ADDs and REMOVEs (relative paths).
  The live file set of version v = fold of commits 0..v. Data files are
  immutable and uniquely named, so a commit never touches another
  commit's bytes.
- Readers NEVER list data/: they read the log, fold the file set, and
  hand the explicit file list to the parquet scan. A half-staged write
  is invisible by construction — its files are not referenced by any
  commit. (This is also the 100 TB listing story: one small JSON read
  replaces a million-file directory listing.)
- Commits are atomic + exclusive via write-tmp → hard-link(tmp, final):
  link(2) fails if the version already exists, so two racing writers
  cannot both claim a version (POSIX/HDFS semantics; an object store
  needs a conditional-put here — documented, out of engine scope).
- ``rollback`` is a METADATA commit that re-points the live set at an
  older version's files (instant, no data I/O), preserving history —
  the operational "undo" for a bad pipeline run.
- ``vacuum`` deletes data files unreferenced by the retained version
  range; time travel inside the range keeps working, older versions
  raise cleanly.

- Each commit carries per-file min/max stats for its added files
  (``stats``), recorded once at write time — so MERGE's data-skipping
  reads the log, not 10⁵ parquet footers per merge (the Delta
  AddFile.stats / Iceberg manifest-bounds idea).
- DELETION VECTORS (``delete_where(dv=True)``, Delta's DV mode): a
  commit may carry a ``dv`` map re-pointing files at a position blob;
  readers drop those (file, row-position) pairs scan-side via an
  anti-join on parquet ``_metadata`` — broadcast while the blobs stay
  under ``DV_BROADCAST_MAX_BYTES``, a plain AQE-planned anti-join above
  it (a vector of 10⁸ positions must never transit the driver) — so
  point deletes cost the deleted ROWS, not the touched files, and no
  data file is rewritten.
  A removed/rewritten file sheds its vector, so copy-on-write and
  compaction fold vectors away naturally. Every dv commit also records
  each touched file's vector CARDINALITY (``dv_rows``, Delta's
  deletionVector.cardinality) — advisory metadata that lets
  maintenance (``reorg_purge``) pick its rewrite set from the log with
  zero data I/O; legacy commits without it fall back to counting the
  vectors.

- PROTOCOL / FEATURE STAMP (Delta's table-features rule): every commit
  (and checkpoint) whose content a naive reader would silently misread
  is stamped with the reader ``features`` it requires (``dv``,
  ``column_mapping``); folding a stamp outside ``_READER_FEATURES``
  raises ``FeatureUnsupported`` — a table written by a future version
  fails loudly, never returns wrong rows.

Concurrency contract: SINGLE WRITER PER VERSION. Two writers may race;
exactly one claims version N (the hard-link commit), the loser raises
``SnapshotError`` with its staged files un-staged, and may re-read the
log and retry against N+1. Readers are never torn either way. The
atomicity primitives are POSIX ``link(2)``/``rename(2)`` plus
``os.listdir`` of the log directory — local-FS/HDFS semantics ONLY; an
object-store port needs a conditional-put commit and a manifest-based
log listing (out of engine scope, as with compact_parquet).

Scale notes: the log is O(commits) JSON files of O(files-per-commit)
entries. A naive reader folds every commit — O(commits) driver file
reads per read, which the streaming CDC sink (one merge commit per
micro-batch) turns into a real bottleneck within hours. So the log is
CHECKPOINTED, the Delta `_checkpoint.parquet` idea: every
``CHECKPOINT_INTERVAL`` commits the writer folds the state (live set +
per-file stats + schema) into ``_log/<v>.checkpoint.parquet``; a reader
at version v loads the newest checkpoint <= v and replays only the tail
commits — O(interval) log reads regardless of table age. Checkpoints
are pure derived state: corrupt/missing ones fall back to the full
commit replay, and time travel to any un-vacuumed version still works
(commits are never deleted).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"

# Observability counter: footer opens taken by the merge's stats-pruning
# FALLBACK path (legacy commits with no log stats / unencodable types).
# Commits written by this version carry per-file min/max in the log, so a
# merge over them must prune with ZERO footer reads — tests assert on this.
FOOTER_PRUNE_READS = 0

# Fold a checkpoint every N commits (Delta defaults to 10). 0 disables.
CHECKPOINT_INTERVAL = 20

# Observability counter: commit-JSON files opened by state folds. With
# checkpointing, reading a 1000-commit table bumps this by <= INTERVAL,
# not 1000 — tests assert the bound.
LOG_COMMIT_READS = 0


class SnapshotError(RuntimeError):
    pass


class FeatureUnsupported(SnapshotError):
    """A commit/checkpoint requires a reader feature this version does
    not implement — reading on anyway would silently return wrong rows
    (e.g. ignoring an unknown deletion-vector encoding). Delta's
    protocol-version / table-features rule."""


# READER features this version understands (Delta's table-features
# idea): any commit whose semantics a naive reader would silently
# misread is stamped with the feature names required to read it —
# ``dv`` (rows disappear scan-side) and ``column_mapping`` (bytes live
# under physical names). A reader folding a commit (or checkpoint)
# stamped with a name outside this set raises FeatureUnsupported
# instead of returning wrong rows. Write-side-only capabilities
# (constraints, txn stamps, commit_ts, stats) don't gate reads and are
# deliberately NOT stamped — an old reader ignoring them still returns
# exact rows.
_READER_FEATURES = frozenset({"dv", "column_mapping"})


def _check_features(required, where: str) -> None:
    unknown = sorted(set(required or []) - _READER_FEATURES)
    if unknown:
        raise FeatureUnsupported(
            f"{where} requires reader feature(s) {unknown} that this "
            f"version of ops_spark does not implement (supported: "
            f"{sorted(_READER_FEATURES)}); upgrade before reading this "
            "table"
        )


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:011d}.json")


def _read_commits(path: str) -> list[dict]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for nm in sorted(os.listdir(d)):
        if nm.endswith(".json"):
            with open(os.path.join(d, nm)) as fh:
                out.append(json.load(fh))
    for i, c in enumerate(out):
        if c["version"] != i:
            raise SnapshotError(f"commit log has a gap at version {i}")
        _check_features(c.get("features"), f"commit {i}")
    return out


def _live_files(commits: list[dict], version: int) -> list[str]:
    live: set[str] = set()
    for c in commits[: version + 1]:
        live -= set(c["remove"])
        live |= set(c["add"])
    return sorted(live)


class CommitRaceLost(SnapshotError):
    """A concurrent writer claimed the version first (link(2) EEXIST)."""


class ConcurrentWriteConflict(SnapshotError):
    """A concurrent commit logically conflicts with this write — the two
    cannot both be serialized, so the loser must re-read and re-run."""


class LogStore:
    """The claim-version primitive behind the commit protocol, extracted
    as Delta's LogStore abstraction: ``put_if_absent(final, payload)``
    must atomically publish ``payload`` at the commit file's ``final``
    path, raising CommitRaceLost if ANY writer — thread, process, or
    host — already claimed that path. Everything above this interface
    (OCC rebase, conflict checking, checkpointing, readers) is
    storage-agnostic; only the mutual-exclusion mechanism swaps per
    storage system:

    - POSIX local / NFS / HDFS: :class:`LinkLogStore` (the default) —
      link(2)'s atomic EEXIST.
    - S3-class object stores: a conditional put (If-None-Match, which
      S3 now supports natively) — exactly the contract
      :class:`ConditionalPutLogStore` models, with the PUT's
      precondition as the arbiter.
    - Stores without conditional writes: an external arbitration table
      (Delta's DynamoDB LogStore) — ConditionalPutLogStore again, with
      the table's attribute_not_exists put as the arbiter and the
      payload stored IN the entry so an incomplete commit is
      recoverable by any later participant."""

    def put_if_absent(self, final: str, payload: bytes) -> None:
        raise NotImplementedError


class LinkLogStore(LogStore):
    """Default LogStore: write-tmp → fsync → hard-link(tmp, final).
    link(2) fails with EEXIST if the version file already exists, so a
    concurrent writer loses cleanly instead of silently overwriting the
    log. Holds on POSIX local filesystems and NFS; HDFS rename-if-absent
    has the same semantics."""

    def put_if_absent(self, final: str, payload: bytes) -> None:
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            raise CommitRaceLost(
                f"concurrent commit: {os.path.basename(final)} already exists"
            ) from exc
        finally:
            os.unlink(tmp)


class ConditionalPutLogStore(LogStore):
    """Conditional-put LogStore (the S3 If-None-Match / DynamoDB
    arbitration shape): versions are claimed in an external TABLE via an
    atomic put-if-absent (``mapping.setdefault`` here — a Manager dict
    proxy dispatches it as one atomic call, standing in for S3's
    precondition or DynamoDB's attribute_not_exists), and the winning
    entry carries the FULL payload, so a commit that crashed between
    claim and file write is materialized by the next participant that
    touches the version (the DynamoDB LogStore recovery rule) — the log
    never wedges on a half-dead writer.

    ``table`` is any mapping with atomic ``setdefault``: a plain dict
    guarded by the GIL for single-process tests, a
    ``multiprocessing.Manager().dict()`` for cross-process arbitration,
    DynamoDB/S3 in a real deployment."""

    def __init__(self, table) -> None:
        self.table = table

    def put_if_absent(self, final: str, payload: bytes) -> None:
        token = uuid.uuid4().hex
        won_token, won_payload = self.table.setdefault(final, (token, payload))
        if not os.path.exists(final):
            # materialize the WINNER's payload (ours or a crashed
            # claimant's): atomic tmp+rename, content identical no
            # matter who completes it, so last-rename-wins is safe
            tmp = final + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(won_payload)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, final)
        if won_token != token:
            raise CommitRaceLost(
                f"concurrent commit: {os.path.basename(final)} already "
                "claimed in the arbitration table"
            )


_LOG_STORE: LogStore = LinkLogStore()


def set_log_store(store: LogStore | None) -> LogStore:
    """Swap the commit arbitration mechanism (None restores the
    default LinkLogStore). Returns the previous store so callers can
    restore it."""
    global _LOG_STORE
    prev = _LOG_STORE
    _LOG_STORE = store if store is not None else LinkLogStore()
    return prev


def _atomic_commit(path: str, commit: dict) -> None:
    """Exclusive commit through the configured LogStore: exactly one
    writer claims each version; the loser raises CommitRaceLost with
    nothing published. Every commit is stamped with the wall clock
    (``ts``) for timestamp time travel and time-based retention, and
    with the reader ``features`` its content depends on (see
    _READER_FEATURES) so a future reader lacking one fails cleanly
    instead of misreading."""
    import time as _time

    commit.setdefault("ts", _time.time())
    feats = set(commit.get("features") or [])
    if any(v is not None for v in (commit.get("dv") or {}).values()):
        feats.add("dv")
    # schema JSON carrying a physical-name mapping key means files may
    # store bytes under names the logical schema doesn't spell
    if commit.get("schema") and _PHYS_KEY in commit["schema"]:
        feats.add("column_mapping")
    if feats:
        commit["features"] = sorted(feats)
    os.makedirs(_log_dir(path), exist_ok=True)
    final = _commit_path(path, commit["version"])
    _LOG_STORE.put_if_absent(final, json.dumps(commit).encode())


# ops whose commits only move DATA (vs metadata ops like add_constraint,
# whose concurrent landing invalidates rows staged under the old rules)
def _is_data_op(op: str) -> bool:
    return op in ("append", "overwrite", "merge", "delete_where",
                  "delete_dv", "update_where", "compact",
                  "reorg_purge") or op.startswith(
        ("replace_range:", "rollback:")
    )


def _assert_rebase_safe(winner: dict, ours: dict, read_info: dict) -> None:
    """Delta-style logical conflict detection (ConflictChecker shape):
    decide whether OUR commit can land AFTER ``winner`` unchanged. Our
    declared read set is in ``read_info``; anything not provably
    disjoint raises ConcurrentWriteConflict — correctness over optimism.

    - blind APPEND reads nothing, so any concurrent data op with an
      unchanged schema is safe; a schema or constraint change is not
      (our staged files / validated rows assumed the old metadata).
    - MERGE read the table: safe only against (a) pure appends whose
      added files are provably outside our source key range per the
      winner's commit-log stats, and (b) other merges on the SAME key
      with a provably disjoint source range and a disjoint remove set
      (two merges rewriting one spanning file would resurrect the
      loser's stale copies of the winner's rows). Everything else —
      predicate DML, replace, compact, rollback, overwrite — rewrote
      state we may have read: conflict."""
    wop = str(winner.get("op", ""))
    v = winner.get("version")
    w_schema = winner.get("schema")
    if w_schema not in (read_info["base_schema_json"], ours.get("schema")):
        raise ConcurrentWriteConflict(
            f"concurrent commit {v} ({wop}) changed the table schema; "
            "re-read and retry"
        )
    if not _is_data_op(wop):
        raise ConcurrentWriteConflict(
            f"concurrent metadata commit {v} ({wop}); re-read and retry"
        )
    if read_info["kind"] == "append":
        return  # a blind append serializes after any same-schema data op
    # ours is a MERGE
    key, qlo, qhi = read_info["key"], read_info["lo"], read_info["hi"]
    if qlo is None or qhi is None:
        raise ConcurrentWriteConflict(
            f"concurrent commit {v} ({wop}) and this merge's source key "
            "range is unbounded/unencodable; re-read and retry"
        )
    if wop in ("append",) and not winner.get("remove"):
        wstats = winner.get("stats") or {}
        for rel in winner.get("add", []):
            if _log_prune_decision(wstats.get(rel, {}), key, qlo, qhi) is not True:
                raise ConcurrentWriteConflict(
                    f"concurrent append {v} added {rel} with keys not "
                    f"provably outside this merge's {key} range; re-read "
                    "and retry"
                )
        return
    if wop == "merge":
        wkey, wrng = winner.get("merge_key"), winner.get("merge_range")
        if wkey != key or not wrng or wrng[0] is None or wrng[1] is None:
            raise ConcurrentWriteConflict(
                f"concurrent merge {v} on a different/unrecorded key "
                f"({wkey!r}); re-read and retry"
            )
        # a merge "touches" a file by rewriting it (remove) OR by
        # re-pointing its deletion vector (dv): either way the loser's
        # staged rows/blob were computed through the file's pre-winner
        # state and would resurrect the winner's deletes
        w_touch = set(winner.get("remove", [])) | set(winner.get("dv") or {})
        o_touch = set(ours.get("remove", [])) | set(ours.get("dv") or {})
        overlap_rm = w_touch & o_touch
        if overlap_rm:
            raise ConcurrentWriteConflict(
                f"concurrent merge {v} rewrote/re-vectored the same "
                f"file(s) {sorted(overlap_rm)[:3]}; re-read and retry"
            )
        try:
            disjoint = wrng[1] < qlo or wrng[0] > qhi
        except TypeError:
            disjoint = False  # incomparable encodings → assume overlap
        if not disjoint:
            raise ConcurrentWriteConflict(
                f"concurrent merge {v} source range {wrng} overlaps this "
                f"merge's [{qlo}, {qhi}] on {key}; re-read and retry"
            )
        return
    raise ConcurrentWriteConflict(
        f"concurrent commit {v} ({wop}) rewrote table state this merge "
        "may have read; re-read and retry"
    )


def _commit_or_rebase(
    path: str, commit: dict, read_info: dict, max_rebase: int = 20
) -> int:
    """Optimistic concurrency control over _atomic_commit (the Delta
    commit loop): try the version we planned; if a concurrent writer
    claimed it, validate OUR logical read/write set against every commit
    that landed since (_assert_rebase_safe), and when all are provably
    disjoint, re-commit the SAME staged files at the new head + 1 —
    disjoint writers both land instead of one failing. A real conflict
    raises ConcurrentWriteConflict and the caller un-stages. Returns the
    version actually committed."""
    version = commit["version"]
    for _ in range(max_rebase):
        commit["version"] = version
        commit.pop("ts", None)  # stamp COMMIT time, not build time
        try:
            _atomic_commit(path, commit)
            return version
        except CommitRaceLost:
            commit_vs, _ = _log_entries(path)
            head = commit_vs[-1] if commit_vs else -1
            if head < version:
                raise  # version file exists but log lists nothing newer
            for v in range(version, head + 1):
                _assert_rebase_safe(_read_commit(path, v), commit, read_info)
            version = head + 1
    raise ConcurrentWriteConflict(
        f"lost the commit race {max_rebase} times in a row at {path}; "
        "giving up (livelock guard)"
    )


def _checkpoint_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:011d}.checkpoint.parquet")


def _log_entries(path: str) -> tuple[list[int], list[int]]:
    """One listdir of _log/ → (commit versions, checkpoint versions),
    each sorted ascending. The listing is O(commits) directory entries —
    cheap next to O(commits) file OPENS, which is what checkpoints
    remove from the read path."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return [], []
    commits, ckpts = [], []
    for nm in os.listdir(d):
        if nm.endswith(".checkpoint.parquet"):
            ckpts.append(int(nm.split(".")[0]))
        elif nm.endswith(".json"):
            commits.append(int(nm.split(".")[0]))
    return sorted(commits), sorted(ckpts)


def _read_commit(path: str, version: int) -> dict:
    global LOG_COMMIT_READS
    LOG_COMMIT_READS += 1
    with open(_commit_path(path, version)) as fh:
        c = json.load(fh)
    _check_features(c.get("features"), f"commit {version}")
    return c


class _State:
    """Folded table state as of one version: the live file set, every
    known per-file stats entry, the schema, and the CHECK constraints.
    Built from the newest checkpoint <= version plus a replay of only
    the tail commits."""

    __slots__ = (
        "latest", "version", "live", "stats", "schema_json",
        "constraints", "commit_reads", "dv", "dv_rows",
    )

    def __init__(
        self, latest, version, live, stats, schema_json, constraints,
        commit_reads, dv=None, dv_rows=None,
    ):
        self.latest = latest
        self.version = version
        self.live = live  # sorted list[str]
        self.stats = stats  # rel -> {rows, minmax}
        self.schema_json = schema_json
        self.constraints = constraints  # name -> SQL boolean expr
        self.commit_reads = commit_reads
        self.dv = dv or {}  # rel -> deletion-vector blob rel (current)
        # rel -> rows in the file's CURRENT vector (Delta's
        # deletionVector.cardinality): advisory metadata recorded at
        # DV-write time so maintenance decisions (reorg_purge) read the
        # LOG, not the vectors. May be missing for legacy dv commits —
        # consumers fall back to scanning; never load-bearing for
        # correctness, so it is NOT a reader feature.
        self.dv_rows = dv_rows or {}

    @property
    def schema(self):
        from pyspark.sql.types import StructType

        if not self.schema_json:
            return None
        return StructType.fromJson(json.loads(self.schema_json))


def _read_checkpoint(
    path: str, version: int
) -> tuple[set, dict, str | None, dict, dict, dict]:
    """Load a checkpoint's (live set, stats map, schema json,
    constraints, deletion-vector map, dv cardinality map)."""
    import pyarrow.parquet as pq

    t = pq.read_table(_checkpoint_path(path, version))
    meta = t.schema.metadata or {}
    if meta.get(b"features"):
        # a checkpoint can fold state from commits OLDER than any tail
        # replay would revisit, so the feature gate must fire HERE too
        # (and _state re-raises it rather than falling back)
        _check_features(
            json.loads(meta[b"features"].decode()),
            f"checkpoint {version}",
        )
    schema_json = meta.get(b"schema", b"").decode() or None
    constraints = json.loads(meta.get(b"constraints", b"{}").decode() or "{}")
    live: set[str] = set()
    stats: dict[str, dict] = {}
    dv: dict[str, str] = {}
    dv_rows: dict[str, int] = {}
    # pre-DV checkpoints have no "dv" column; they also predate any dv
    # commit, so an empty map is exact, not lossy (same for dv_rows —
    # pre-cardinality checkpoints simply leave consumers on the scan
    # fallback)
    dvs = (t.column("dv").to_pylist() if "dv" in t.column_names
           else [None] * t.num_rows)
    dvr = (t.column("dv_rows").to_pylist() if "dv_rows" in t.column_names
           else [None] * t.num_rows)
    for rel, is_live, rows, mm, d, dn in zip(
        t.column("file").to_pylist(),
        t.column("live").to_pylist(),
        t.column("rows").to_pylist(),
        t.column("minmax").to_pylist(),
        dvs,
        dvr,
    ):
        if is_live:
            live.add(rel)
        if mm is not None:
            stats[rel] = {"rows": rows, "minmax": json.loads(mm)}
        if d is not None:
            dv[rel] = d
            if dn is not None:
                dv_rows[rel] = dn
    return live, stats, schema_json, constraints, dv, dv_rows


def _state(path: str, version: int | None = None) -> _State | None:
    """Fold the log up to ``version`` (default latest). Returns None for
    a path with no commits. Uses the newest checkpoint <= version when
    one exists and is readable; otherwise replays from version 0 — a
    checkpoint is derived state, never load-bearing for correctness."""
    commit_vs, ckpt_vs = _log_entries(path)
    if not commit_vs:
        return None
    latest = commit_vs[-1]
    if commit_vs != list(range(latest + 1)):
        present = set(commit_vs)
        gap = next(i for i in range(latest + 1) if i not in present)
        raise SnapshotError(f"commit log has a gap at version {gap}")
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise SnapshotError(f"no such version: {version}")
    live: set[str] = set()
    stats: dict[str, dict] = {}
    schema_json: str | None = None
    constraints: dict = {}
    dv: dict[str, str] = {}
    dv_rows: dict[str, int] = {}
    start = 0
    for base in reversed([c for c in ckpt_vs if c <= v]):
        try:
            (live, stats, schema_json, constraints, dv,
             dv_rows) = _read_checkpoint(path, base)
            start = base + 1
            break
        except FeatureUnsupported:
            raise  # NOT a fallback case: replaying would misread too
        except Exception:
            # unreadable/corrupt checkpoint: try an older one, finally
            # the full replay — checkpoints only ever accelerate
            live, stats, schema_json, constraints = set(), {}, None, {}
            dv, dv_rows = {}, {}
    reads = 0
    for i in range(start, v + 1):
        c = _read_commit(path, i)
        reads += 1
        live -= set(c["remove"])
        live |= set(c["add"])
        for rel in c["remove"]:  # a rewritten/retired file sheds its DV
            dv.pop(rel, None)
            dv_rows.pop(rel, None)
        for rel, d in (c.get("dv") or {}).items():
            if d is None:  # explicit clear (rollback restoring pre-delete)
                dv.pop(rel, None)
                dv_rows.pop(rel, None)
            else:  # newest blob per file wins (blobs hold the full union)
                dv[rel] = d
                n = (c.get("dv_rows") or {}).get(rel)
                if n is not None:
                    dv_rows[rel] = n
                else:  # legacy dv commit without cardinality: unknown
                    dv_rows.pop(rel, None)
        stats.update(c.get("stats") or {})
        if c.get("schema"):
            schema_json = c["schema"]
        if "constraints" in c:  # full map per constraint-changing commit
            constraints = c["constraints"]
    return _State(
        latest, v, sorted(live), stats, schema_json, constraints, reads, dv,
        dv_rows,
    )


def _write_checkpoint(path: str, version: int) -> None:
    """Fold state at ``version`` into _log/<v>.checkpoint.parquet
    (atomic tmp+rename; content is deterministic for a given version).
    Stats entries whose file was vacuumed AND is no longer live are
    dropped — they can never matter again — so checkpoint size tracks
    the live table, not its whole history."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    st = _state(path, version)
    if st is None:
        return
    live_set = set(st.live)
    files, lives, rows, mm, dvs, dvr = [], [], [], [], [], []
    for rel in sorted(set(st.stats) | live_set):
        if rel not in live_set and not os.path.exists(os.path.join(path, rel)):
            continue
        entry = st.stats.get(rel)
        files.append(rel)
        lives.append(rel in live_set)
        rows.append(None if entry is None else entry.get("rows"))
        mm.append(None if entry is None else json.dumps(entry.get("minmax") or {}))
        dvs.append(st.dv.get(rel))
        dvr.append(st.dv_rows.get(rel))
    table = pa.table(
        {
            "file": pa.array(files, pa.string()),
            "live": pa.array(lives, pa.bool_()),
            "rows": pa.array(rows, pa.int64()),
            "minmax": pa.array(mm, pa.string()),
            "dv": pa.array(dvs, pa.string()),
            "dv_rows": pa.array(dvr, pa.int64()),
        }
    )
    meta = {b"snapshot_version": str(version).encode()}
    if st.schema_json:
        meta[b"schema"] = st.schema_json.encode()
    if st.constraints:
        meta[b"constraints"] = json.dumps(st.constraints).encode()
    # reader features the FOLDED STATE depends on (not the whole
    # history: a table whose vectors were all compacted away needs no
    # dv support to read this checkpoint)
    feats = set()
    if any(d is not None for d in st.dv.values()):
        feats.add("dv")
    if st.schema_json and _PHYS_KEY in st.schema_json:
        feats.add("column_mapping")
    if feats:
        meta[b"features"] = json.dumps(sorted(feats)).encode()
    # fold the whole log's commit stamps so timestampAsOf / time-based
    # vacuum resolve in O(interval) opens instead of replaying the log
    meta[b"commit_ts"] = json.dumps(_fold_commit_ts(path, version)).encode()
    # fold the newest txn stamp per app so a streaming sink's
    # exactly-once replay check never scans past a checkpoint
    meta[b"txn"] = json.dumps(_fold_txn(path, version)).encode()
    table = table.replace_schema_metadata(meta)
    final = _checkpoint_path(path, version)
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.rename(tmp, final)  # atomic; racing writers of the same version
    # would write identical content, so last-rename-wins is safe


def _maybe_checkpoint(path: str, version: int) -> None:
    """Called by every committer after a successful commit. Best-effort
    like Delta's: a failed checkpoint write is retried at the next
    interval and readers fall back to commit replay meanwhile."""
    _retire_stages(path)  # commit published: manifests no longer needed
    if CHECKPOINT_INTERVAL <= 0 or version <= 0:
        return
    if version % CHECKPOINT_INTERVAL != 0:
        return
    try:
        _write_checkpoint(path, version)
    except Exception:
        pass  # derived state only — the next interval writes a fresh one


def history(path: str) -> list[dict]:
    """The commit log, oldest first:
    [{version, op, ts, n_add, n_remove}, …]."""
    return [
        {
            "version": c["version"],
            "op": c["op"],
            "ts": c.get("ts"),
            "n_add": len(c["add"]),
            "n_remove": len(c["remove"]),
        }
        for c in _read_commits(path)
    ]


def _as_epoch(timestamp) -> float:
    """Accept epoch seconds, datetime, or an ISO-8601 string."""
    import datetime

    if isinstance(timestamp, (int, float)):
        return float(timestamp)
    if isinstance(timestamp, datetime.datetime):
        return timestamp.timestamp()
    if isinstance(timestamp, str):
        return datetime.datetime.fromisoformat(timestamp).timestamp()
    raise SnapshotError(f"unsupported timestamp: {timestamp!r}")


def _checkpoint_commit_ts(path: str, version: int) -> list | None:
    """The commit-ts list (index = version, covering 0..version) folded
    into a checkpoint's parquet footer metadata; None for checkpoints
    written before stamps were folded. Footer-only read — no row data."""
    import pyarrow.parquet as pq

    meta = pq.read_schema(_checkpoint_path(path, version)).metadata or {}
    raw = meta.get(b"commit_ts")
    return json.loads(raw.decode()) if raw else None


def _fold_commit_ts(path: str, version: int) -> list:
    """Wall-clock stamps for every commit 0..version (None where a
    legacy commit carries no ``ts``): extend the newest prior
    checkpoint's folded list with only the tail commits — O(interval)
    commit opens on a checkpointed table, O(commits) on a legacy
    un-checkpointed one (and the next checkpoint repays that once)."""
    _, ckpt_vs = _log_entries(path)
    base, ts = -1, []
    for cv in reversed([c for c in ckpt_vs if c <= version]):
        try:
            got = _checkpoint_commit_ts(path, cv)
        except Exception:
            got = None  # unreadable/corrupt checkpoint: fall back older
        if got is not None and len(got) == cv + 1:
            base, ts = cv, list(got)
            break
    for v in range(base + 1, version + 1):
        ts.append(_read_commit(path, v).get("ts"))
    # a checkpoint written BEFORE backfill_commit_ts ran can hold stale
    # None entries; the commit files are the source of truth, so re-read
    # just those. Scoped to the checkpoint-folded PREFIX (tail entries
    # were just read from their commit files — a None there is ground
    # truth), and versions confirmed ts-less are cached so a
    # never-backfilled legacy log doesn't pay O(unstamped commits) of
    # driver I/O on every fold (ADVICE r10). backfill_commit_ts drops
    # the cache for its path.
    key = os.path.abspath(path)
    for v in range(min(base, version) + 1):
        if ts[v] is None and (key, v) not in _KNOWN_TSLESS:
            ts[v] = _read_commit(path, v).get("ts")
            if ts[v] is None:
                _KNOWN_TSLESS.add((key, v))
    return ts


# (table abspath, version) pairs whose commit file is KNOWN to carry no
# ``ts`` — see the stale-None repair in _fold_commit_ts. Process-local;
# a backfill in another process is picked up lazily by
# _version_at_timestamp's error-path re-read.
_KNOWN_TSLESS: set[tuple[str, int]] = set()


def _checkpoint_txn(path: str, version: int) -> dict | None:
    """The newest-txn-per-app map ({app: batch}) folded into a
    checkpoint's footer, covering commits 0..version; None for
    checkpoints written before txn folding (or unreadable ones).
    Footer-only read — no row data."""
    import pyarrow.parquet as pq

    try:
        meta = pq.read_schema(_checkpoint_path(path, version)).metadata or {}
    except Exception:
        return None
    raw = meta.get(b"txn")
    return json.loads(raw.decode()) if raw else None


def _fold_txn(path: str, version: int) -> dict:
    """Newest txn stamp per app over commits 0..version: extend the
    newest prior checkpoint's folded map with only the tail commits —
    the same O(interval) shape as _fold_commit_ts."""
    _, ckpt_vs = _log_entries(path)
    base, txn = -1, {}
    for cv in reversed([c for c in ckpt_vs if c <= version]):
        got = _checkpoint_txn(path, cv)
        if got is not None:
            base, txn = cv, dict(got)
            break
    for v in range(base + 1, version + 1):
        t = _read_commit(path, v).get("txn")
        if t and t.get("app") is not None:
            txn[str(t["app"])] = t.get("batch")
    return txn


def backfill_commit_ts(path: str) -> int:
    """Maintenance utility for PRE-STAMP legacy tables: stamp every
    commit that carries no ``ts`` with its commit FILE's mtime — the
    best wall-clock evidence that exists for a legacy commit — so
    timestampAsOf (which refuses to resolve against a mixed log, see
    _version_at_timestamp) works again. Each rewrite is atomic
    (tmp+rename); a concurrent reader sees the old or the new stamp of
    a commit, both valid JSON. Returns the number of commits stamped.

    The mtime approximates the original commit wall-clock (exact unless
    the file was copied/touched since); run once, then resolution is
    exact going forward because every new commit is stamped at commit
    time."""
    commit_vs, _ = _log_entries(path)
    if not commit_vs:
        raise SnapshotError(f"not a snapshot table: {path}")
    stamped = 0
    for v in commit_vs:
        c = _read_commit(path, v)
        if c.get("ts") is not None:
            continue
        final = _commit_path(path, v)
        c["ts"] = os.stat(final).st_mtime
        tmp = final + f".backfill-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(c, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        stamped += 1
    key = os.path.abspath(path)
    _KNOWN_TSLESS.difference_update(
        {kv for kv in _KNOWN_TSLESS if kv[0] == key}
    )
    return stamped


def _version_at_timestamp(path: str, timestamp) -> int:
    """The newest version committed at or before ``timestamp`` (Delta's
    timestampAsOf rule). Stamps for the whole log are folded into
    checkpoints, so resolution costs O(checkpoint-interval) commit
    opens, never a full replay on a checkpointed table. A log holding
    ANY unstamped (legacy) commit raises — its wall-clock position is
    unknowable, and silently resolving against a mixed log can return
    the wrong version with no error (Delta raises here too); ``version=``
    time travel always remains available."""
    want = _as_epoch(timestamp)
    commit_vs, _ = _log_entries(path)
    if not commit_vs:
        raise SnapshotError(f"not a snapshot table: {path}")
    ts = _fold_commit_ts(path, commit_vs[-1])
    missing = [v for v, t in enumerate(ts) if t is None]
    if missing:
        # a backfill run by ANOTHER process invalidates our ts-less
        # cache silently; re-read the offenders once before raising (the
        # cost lands only on this already-failing path)
        key = os.path.abspath(path)
        for v in missing:
            got = _read_commit(path, v).get("ts")
            if got is not None:
                ts[v] = got
                _KNOWN_TSLESS.discard((key, v))
        missing = [v for v, t in enumerate(ts) if t is None]
    if missing:
        raise SnapshotError(
            f"{len(missing)} commit(s) (first: version {missing[0]}) have "
            "no timestamp stamp; timestampAsOf cannot resolve reliably on "
            "a mixed log — use version= time travel, or run "
            "backfill_commit_ts(path) once to stamp legacy commits from "
            "their commit-file mtimes"
        )
    # exact rule over the in-memory list: max version whose ts <= want
    # (no monotonicity assumption — a clock-skewed log still resolves
    # to the newest qualifying version)
    best = -1
    for v, t in enumerate(ts):
        if t <= want:
            best = v
    if best < 0:
        raise SnapshotError(
            f"no version at or before {timestamp!r}; the table's first "
            f"commit is ts={ts[0]}"
        )
    return best


def latest_version(path: str) -> int:
    commit_vs, _ = _log_entries(path)
    if not commit_vs:
        raise SnapshotError(f"not a snapshot table: {path}")
    return commit_vs[-1]


def _enforce_constraints(df: DataFrame, constraints: dict) -> DataFrame:
    """Inject CHECK-constraint enforcement INTO the write job (the Delta
    CheckConstraintExec idea): a filter over assert_true raises on the
    first violating row during the same scan that stages the data — no
    separate validation pass. SQL CHECK semantics: a constraint that
    evaluates NULL passes. The guard filter keeps every non-violating
    row (assert_true returns NULL), so the staged data is unchanged."""
    if not constraints:
        return df
    from pyspark.sql import functions as F

    guard = None
    for name, expr in sorted(constraints.items()):
        ok = F.coalesce(F.expr(expr), F.lit(True))
        checked = F.assert_true(
            ok,
            F.concat(
                F.lit(f"CHECK constraint '{name}' violated ({expr}); row: "),
                F.to_json(F.struct("*")),
            ),
        ).isNull()  # NULL (i.e. true) for every passing row
        guard = checked if guard is None else (guard & checked)
    return df.filter(guard)


# ---- in-flight-write protection for vacuum -------------------------
# os.rename preserves the mtime a task WROTE a file at, so a big job's
# earliest parts can look hours old by the time the commit publishes —
# racing a default-grace vacuum (ADVICE r10). Two guards compose:
# (1) moved files are utime'd so the orphan-grace clock starts at MOVE
#     time (seconds before the commit), and
# (2) a ``_moved.json`` manifest naming the just-moved files is left in
#     the write's stage dir until the commit publishes; vacuum spares
#     manifested files regardless of mtime, so even a writer with a
#     skewed clock can't lose its about-to-be-committed files. Manifest
#     dirs are retired on commit (_maybe_checkpoint) or unstage; a
#     crashed writer's manifest falls to vacuum's stale-stage sweep
#     once it outlives the grace.

_STAGE_MANIFEST = "_moved.json"
# (abspath(table), thread id) -> this WRITER's manifest dirs. Keyed per
# thread so one committer's retire cannot strip a concurrent
# same-process writer's clock-skew protection mid-flight — each write's
# stage/commit/retire sequence runs on one thread.
_INFLIGHT_STAGES: dict[tuple[str, int], list[str]] = {}


def _stage_key(path: str) -> tuple[str, int]:
    import threading

    return (os.path.abspath(path), threading.get_ident())


def _manifest_stage(path: str, added: list[str]) -> None:
    """Record just-moved (not yet committed) files in a fresh stage-dir
    manifest so a concurrent vacuum spares them by NAME, not mtime.
    Best-effort: on any failure the utime grace still protects."""
    if not added:
        return
    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    try:
        os.makedirs(stage, exist_ok=True)
        tmp = os.path.join(stage, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"files": added}, fh)
        os.replace(tmp, os.path.join(stage, _STAGE_MANIFEST))
        _INFLIGHT_STAGES.setdefault(_stage_key(path), []).append(stage)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)


def _retire_stages(path: str) -> None:
    """Drop this WRITER's (thread's) manifest dirs for ``path`` — called
    once the commit published (files now referenced) or unstaged (files
    gone). Other threads' in-flight manifests are untouched."""
    for stage in _INFLIGHT_STAGES.pop(_stage_key(path), []):
        shutil.rmtree(stage, ignore_errors=True)


def _manifested_files(path: str) -> set[str]:
    """Every file named by ANY on-disk stage manifest (ours or another
    process's) — vacuum's clock-skew-proof in-flight set."""
    out: set[str] = set()
    try:
        names = os.listdir(path)
    except OSError:
        return out
    for nm in names:
        if not nm.startswith(".stage-"):
            continue
        try:
            with open(os.path.join(path, nm, _STAGE_MANIFEST)) as fh:
                out.update(json.load(fh).get("files", []))
        except (OSError, ValueError):
            continue
    return out


def _stage_add(df: DataFrame, path: str, version: int) -> list[str]:
    """Write ``df`` through Spark's own committer into a scratch dir (so
    executor-side task retries stay exactly-once), then move the finished
    parts into data/ under version-unique names. Returns the relative
    paths; nothing is visible to readers until a commit references them.
    Moved files are utime'd (grace clock starts at move, not task write)
    and manifested (see the in-flight-protection note above)."""
    os.makedirs(os.path.join(path, _DATA), exist_ok=True)
    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    try:
        df.write.mode("overwrite").parquet(stage)
    except Exception:
        # e.g. a CHECK-constraint violation raised inside the write job:
        # drop the half-staged scratch dir before propagating
        shutil.rmtree(stage, ignore_errors=True)
        raise
    added = []
    for nm in sorted(os.listdir(stage)):
        if nm.endswith(".parquet") and not nm.startswith("."):
            rel = os.path.join(_DATA, f"v{version}-{uuid.uuid4().hex[:8]}-{nm}")
            os.rename(os.path.join(stage, nm), os.path.join(path, rel))
            try:
                os.utime(os.path.join(path, rel))
            except OSError:
                pass
            added.append(rel)
    shutil.rmtree(stage, ignore_errors=True)
    _manifest_stage(path, added)
    return added


def _unstage(path: str, added: list[str]) -> None:
    for rel in added:  # lost the commit race: un-stage our orphans
        try:
            os.remove(os.path.join(path, rel))
        except OSError:
            pass
    _retire_stages(path)


def _stat_val(v):
    """JSON-safe, ORDER-PRESERVING encoding of a parquet min/max value.
    Only types whose encoding compares like the value are recorded:
    int/float stay numbers, str stays str, date → ISO string (where
    lexicographic order == chronological). Everything else (timestamps —
    tz-awareness differs between footer stats and Spark rows — decimals,
    binary) returns None: that column's stats are simply not logged and
    pruning falls back to the footer for it."""
    import datetime

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v if v == v else None  # never record NaN bounds
    if isinstance(v, str):
        return v
    if isinstance(v, datetime.datetime):
        return None
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def _collect_stats(path: str, added: list[str]) -> dict:
    """Per-file {rows, minmax:{col:[lo,hi]}} for a commit's ``stats`` map,
    read once from the just-written footers AT COMMIT TIME (the writer is
    already touching these files). Later merges then prune from the LOG —
    O(1) JSON already in memory — instead of re-opening every live file's
    footer on the driver, which at CDC posture (10⁵–10⁶ live files) is
    minutes of serial metadata I/O per merge. This is the Delta/Iceberg
    manifest idea: per-file stats live with the metadata, not the data
    (delta: AddFile.stats; iceberg: manifest entry lower/upper bounds).

    Only top-level leaf columns with usable, order-safely-encodable
    min/max are recorded (see _stat_val); anything else is omitted and
    the pruner falls back to that file's footer."""
    import pyarrow.parquet as pq

    stats: dict[str, dict] = {}
    for rel in added:
        try:
            md = pq.ParquetFile(os.path.join(path, rel)).metadata
        except Exception:
            continue  # unreadable footer → no log stats, pruner falls back
        minmax: dict[str, list] = {}
        for idx in range(md.num_columns):
            col = md.schema.column(idx).path
            if "." in col:
                continue  # nested leaf: not addressable as a merge key
            lo = hi = None
            ok = True
            try:
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            except Exception:
                # e.g. pyarrow cannot EXTRACT stats for this physical type
                # (an all-NULL column's footer): no log stats, pruner
                # falls back to the footer / keeps the file
                ok = False
            if not ok or lo is None:
                continue
            jlo, jhi = _stat_val(lo), _stat_val(hi)
            if jlo is not None and jhi is not None:
                minmax[col] = [jlo, jhi]
        stats[rel] = {"rows": md.num_rows, "minmax": minmax}
    return stats


def _log_stats(commits: list[dict]) -> dict:
    """Fold every commit's ``stats`` map into one rel→stats dict. Data
    files are immutable and uniquely named, so stats recorded by ANY
    commit stay valid for the file's whole life (rollback/compact commits
    that re-add old paths inherit them for free)."""
    out: dict[str, dict] = {}
    for c in commits:
        out.update(c.get("stats") or {})
    return out


def _schema_of(commits: list[dict], version: int):
    """The table schema as of ``version``: the latest commit <= version
    that recorded one. Rollback commits record the schema of the version
    they restore (so rolling back a schema-changing overwrite restores
    the OLD schema, not the undone run's); legacy logs whose rollbacks
    recorded none are walked past."""
    from pyspark.sql.types import StructType

    for c in reversed(commits[: version + 1]):
        if c.get("schema"):
            return StructType.fromJson(json.loads(c["schema"]))
    return None


# ---- column mapping (Delta's columnMapping name-mode) ---------------
# A field's PHYSICAL name — what its bytes are called inside parquet
# files — is its logical name unless the field's metadata carries
# _PHYS_KEY. RENAME/DROP COLUMN are then pure metadata commits: rename
# keeps the physical name under a new logical one; drop removes the
# field from the schema while files keep (and readers ignore) the
# column. Once a table has ANY mapped field, every column added later
# gets a FRESH unique physical name, so re-adding a dropped column's
# logical name can never resurrect the dropped bytes.

_PHYS_KEY = "ops_physical"


def _physical_name(field) -> str:
    return (field.metadata or {}).get(_PHYS_KEY, field.name)


def _mapping_active(schema) -> bool:
    return schema is not None and any(
        _PHYS_KEY in (f.metadata or {}) for f in schema.fields
    )


def _physical_schema(schema):
    """The schema as the parquet files spell it (physical names, no
    metadata)."""
    from pyspark.sql.types import StructField, StructType

    return StructType([
        StructField(_physical_name(f), f.dataType, f.nullable)
        for f in schema.fields
    ])


def _to_physical(df: DataFrame, schema) -> DataFrame:
    """Rename a logical DataFrame's columns to their physical names
    before staging. Pass-through (no plan node) on unmapped tables."""
    if schema is None or not _mapping_active(schema):
        return df
    from pyspark.sql import functions as F

    by_name = {f.name: f for f in schema.fields}
    if all(
        _physical_name(by_name[c]) == c for c in df.columns if c in by_name
    ):
        return df
    return df.select(*[
        F.col(c).alias(_physical_name(by_name[c])) if c in by_name else F.col(c)
        for c in df.columns
    ])


# Ceiling for FORCING the deletion-vector anti-join's build side through
# a broadcast: when the applied blobs total at most this many bytes on
# disk, the (file, pos) set is broadcast (no shuffle of the data side —
# the sparse-delete fast path). Bigger vectors fall back to a plain
# anti-join and AQE picks the strategy at runtime — a long-lived table
# with hundreds of millions of deleted positions must never be funneled
# through the driver by an unconditional broadcast hint (VERDICT r10 #1;
# Delta solves the same problem with per-file bitmaps inside the scan).
# Parquet blob bytes under-count in-memory row size ~2-4x, so 8 MB of
# blob is comfortably inside Spark's 10 MB autoBroadcast default.
DV_BROADCAST_MAX_BYTES = 8 * 1024 * 1024


def _dv_applied(spark: SparkSession, path: str, need: dict):
    """The (file, pos) rows that CURRENTLY apply, for files whose dv
    blob is in ``need`` (basename -> blob rel). A blob may contain rows
    for files whose dv was later superseded by a newer blob, so rows
    only apply when they come from the file's OWN mapped blob."""
    from pyspark.sql import functions as F

    dvdf = None
    for b in sorted(set(need.values())):
        part = spark.read.parquet(os.path.join(path, b)) \
            .select("file", "pos").withColumn("__b", F.lit(b))
        dvdf = part if dvdf is None else dvdf.unionByName(part)
    mapdf = spark.createDataFrame(
        list(need.items()), "file string, __b string"
    )
    return dvdf.join(F.broadcast(mapdf), ["file", "__b"]).select("file", "pos")


def _dv_blob_bytes(path: str, need: dict) -> int | None:
    """Total on-disk bytes of the blobs ``need`` references — the
    driver-side size signal for the broadcast gate (one stat(2) per
    distinct blob, no data I/O). None when any blob is unstattable
    (treated as too big: never force a broadcast on unknown size)."""
    total = 0
    for b in sorted(set(need.values())):
        try:
            total += os.path.getsize(os.path.join(path, b))
        except OSError:
            return None
    return total


def _read_files(spark: SparkSession, path: str, files: list[str], schema,
                dv: dict | None = None, with_pos: bool = False):
    """Read data files projected through a version's LOGICAL schema:
    scan with the physical schema (files written before an evolution
    null-fill appended columns; dropped columns are simply not asked
    for), then alias physical -> logical. The alias is a zero-cost
    projection; on unmapped tables it disappears entirely.

    ``dv`` (rel -> deletion-vector blob rel) applies DELETION VECTORS:
    rows whose (file basename, physical row position) appear in the
    file's current blob are dropped scan-side via an anti-join — forced
    broadcast only while the blobs stay under DV_BROADCAST_MAX_BYTES —
    on Spark's parquet ``_metadata.file_path`` / ``row_index`` columns —
    positions are physical, so the filter is exact regardless of the
    logical projection, and no data file is ever rewritten (the Delta
    deletion-vector read shape). ``with_pos=True`` keeps the helper
    columns ``__dv_file`` (basename) / ``__dv_pos`` (row position) for
    callers that need positions (the DV writer itself)."""
    from pyspark.sql import functions as F

    paths = [os.path.join(path, f) for f in files]
    need = {
        os.path.basename(f): dv[f]
        for f in files
        if dv and dv.get(f) is not None
    }
    phys = _physical_schema(schema) if schema is not None else None
    out = (spark.read.parquet(*paths) if phys is None
           else spark.read.schema(phys).parquet(*paths))
    if need or with_pos:
        out = out.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
    if need:
        applied = _dv_applied(spark, path, need)
        size = _dv_blob_bytes(path, need)
        if size is not None and size <= DV_BROADCAST_MAX_BYTES:
            applied = F.broadcast(applied)  # sparse deletes: no shuffle
        # else: plain anti-join; AQE picks the strategy from runtime
        # sizes — huge vectors must not be collected through the driver
        out = out.join(
            applied,
            (out["__dv_file"] == applied["file"])
            & (out["__dv_pos"] == applied["pos"]),
            "left_anti",
        )
    if schema is not None and phys.fieldNames() != schema.fieldNames():
        extras = [c for c in ("__dv_file", "__dv_pos") if c in out.columns]
        out = out.select(
            *[F.col(pf.name).alias(lf.name)
              for pf, lf in zip(phys.fields, schema.fields)],
            *[F.col(c) for c in extras],
        )
    if not with_pos and need:
        out = out.drop("__dv_file", "__dv_pos")
    return out


def _evolve_schema(prev, new):
    """Union of two schemas, previous column order first (the Delta
    schema-evolution rule: new columns append, existing columns must
    keep their type). Raises on a dtype conflict. On a column-mapped
    table, appended fields get fresh unique physical names (see the
    column-mapping note above)."""
    if prev is None:
        return new
    from pyspark.sql.types import StructField, StructType

    by_name = {f.name: f for f in new.fields}
    out = []
    for f in prev.fields:
        nf = by_name.get(f.name)
        if nf is not None and nf.dataType != f.dataType:
            raise SnapshotError(
                f"schema evolution cannot change column '{f.name}' from "
                f"{f.dataType.simpleString()} to {nf.dataType.simpleString()}"
            )
        out.append(f)
    prev_names = {f.name for f in prev.fields}
    appended = [f for f in new.fields if f.name not in prev_names]
    if appended and _mapping_active(prev):
        appended = [
            StructField(
                f.name, f.dataType, f.nullable,
                {**(f.metadata or {}),
                 _PHYS_KEY: f"{f.name}-{uuid.uuid4().hex[:8]}"},
            )
            for f in appended
        ]
    return StructType(out + appended)


def write_snapshot(
    spark: SparkSession, df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new version. mode='append' adds files;
    mode='overwrite' adds files and removes every previously-live file
    (logically — bytes stay for time travel until vacuum). Returns the
    committed version.

    Appending a df with NEW columns evolves the table schema (columns
    append; a dtype change raises): the commit records the UNION schema,
    and reads project older files through it, null-filling the missing
    columns. An overwrite replaces the schema outright.

    A crash before the commit leaves only unreferenced files — invisible
    to every reader, swept by vacuum (see _stage_add).
    """
    if mode not in ("append", "overwrite"):
        raise SnapshotError(f"unsupported mode: {mode}")
    st = _state(path)
    version = 0 if st is None else st.latest + 1
    schema = df.schema
    if mode == "append" and st is not None:
        schema = _evolve_schema(st.schema, df.schema)
    added = _stage_add(
        _to_physical(
            _enforce_constraints(df, st.constraints if st else {}), schema
        ),
        path,
        version,
    )
    removed = st.live if (mode == "overwrite" and st is not None) else []
    commit = {
        "version": version,
        "op": mode,
        "add": added,
        "remove": removed,
        "schema": schema.json(),
        "stats": _collect_stats(path, added),
    }
    try:
        if mode == "append":
            # blind append: reads nothing, so it rebases past any
            # concurrent same-schema data commit instead of failing
            version = _commit_or_rebase(
                path, commit,
                {"kind": "append",
                 "base_schema_json": st.schema_json if st else None},
            )
        else:  # overwrite depends on the live set it replaces: fail-fast
            _atomic_commit(path, commit)
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return version


def append_slices(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    slice_col: str,
    n_slices: int,
) -> int:
    """Commit ``n_slices`` consecutive append versions — version i holding
    exactly the rows with ``slice_col == i`` — staged by ONE Spark job.

    Loop-equivalent, on a FRESH table, of
    ``for i: write_snapshot(spark, df.filter(slice == i).repartition(1),
    path, "append")`` — but the source is scanned once: the staging write
    partitions by ``slice_col`` (one file per non-empty slice), and the
    per-slice commits are O(1) driver-side log appends. The log shape is
    identical — one append commit per slice in ascending slice order, the
    schema WITHOUT the staging column, per-file stats, checkpoints at the
    usual cadence — so reads, time travel, CDF and the streaming tail see
    the same table the loop would build. Two invisible-to-readers
    differences: an empty slice commits zero data files (the loop commits
    one empty file), and within-file row order follows the staging
    shuffle. This is the CDC-backfill fast path: replaying an N-commit
    ingest history costs one job + N log appends instead of N source
    scans and N job launches. Returns the last committed version.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if n_slices < 1:
        raise SnapshotError("append_slices requires n_slices >= 1")
    if slice_col not in df.columns:
        raise SnapshotError(f"slice column not in df: {slice_col}")
    if _state(path) is not None:
        raise SnapshotError(
            f"append_slices targets a fresh table; {path} already has a log"
        )
    schema = T.StructType([f for f in df.schema.fields if f.name != slice_col])
    os.makedirs(os.path.join(path, _DATA), exist_ok=True)
    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    by_slice: dict[int, list[str]] = {}
    try:
        (
            df.repartition(n_slices, F.col(slice_col))
            .write.mode("overwrite")
            .partitionBy(slice_col)
            .parquet(stage)
        )
        for nm in sorted(os.listdir(stage)):
            if not nm.startswith(f"{slice_col}="):
                continue
            val = nm.split("=", 1)[1]
            try:
                idx = int(val)
            except ValueError as exc:
                raise SnapshotError(
                    f"append_slices needs integer slice values in "
                    f"[0, {n_slices}); staged {val!r}"
                ) from exc
            if not 0 <= idx < n_slices:
                raise SnapshotError(
                    f"slice value {idx} outside [0, {n_slices})"
                )
            files = []
            sdir = os.path.join(stage, nm)
            for part in sorted(os.listdir(sdir)):
                if part.endswith(".parquet") and not part.startswith("."):
                    rel = os.path.join(
                        _DATA, f"v{idx}-{uuid.uuid4().hex[:8]}-{part}"
                    )
                    os.rename(os.path.join(sdir, part), os.path.join(path, rel))
                    try:
                        os.utime(os.path.join(path, rel))
                    except OSError:
                        pass
                    files.append(rel)
            by_slice[idx] = files
    except Exception:
        for files in by_slice.values():  # staged but never to-be-committed
            _unstage(path, files)
        shutil.rmtree(stage, ignore_errors=True)
        raise
    shutil.rmtree(stage, ignore_errors=True)
    _manifest_stage(
        path, [f for i in sorted(by_slice) for f in by_slice[i]]
    )
    version = -1
    i = 0
    try:
        for i in range(n_slices):
            added = by_slice.get(i, [])
            commit = {
                "version": version + 1,
                "op": "append",
                "add": added,
                "remove": [],
                "schema": schema.json(),
                "stats": _collect_stats(path, added),
            }
            version = _commit_or_rebase(
                path,
                commit,
                {
                    "kind": "append",
                    "base_schema_json": schema.json() if i else None,
                },
            )
            _maybe_checkpoint(path, version)
    except SnapshotError:
        _unstage(
            path,
            [f for j in range(i, n_slices) for f in by_slice.get(j, [])],
        )
        raise
    return version


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    key_range: tuple[str, object, object] | None = None,
    timestamp=None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). The scan gets
    the explicit live-file list — never a directory listing — so
    concurrent stage/commit activity can't tear a read.

    ``timestamp`` (epoch seconds, datetime, or ISO string — mutually
    exclusive with ``version``) is Delta's timestampAsOf: reads the
    newest version committed at or before that instant ("the corpus as
    of the run that trained model X", addressed by when, not by which).

    ``key_range=(col, lo, hi)`` is the READ-side data-skipping path (the
    Delta/Iceberg "file skipping" a time-keyed 100 TB table lives on):
    files whose commit-log min/max on ``col`` cannot intersect [lo, hi]
    are dropped from the scan BEFORE Spark sees them — driver-side log
    lookups, zero I/O — and the matching ``col BETWEEN lo AND hi`` filter
    is applied on top (pruning is a safe over-approximation, never a
    substitute for the predicate). A None bound is unbounded on that
    side. Files without usable log stats stay in the scan."""
    if timestamp is not None:
        if version is not None:
            raise SnapshotError("pass version OR timestamp, not both")
        version = _version_at_timestamp(path, timestamp)
    st = _state(path, version)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    version = st.version
    files = st.live
    schema = st.schema
    pred = None
    if key_range is not None:
        from pyspark.sql import functions as F

        key, lo, hi = key_range
        cols = [f.name for f in schema.fields] if schema is not None else None
        if cols is not None and key not in cols:
            raise SnapshotError(f"key_range column not in table schema: {key}")
        qlo, qhi = _stat_val(lo), _stat_val(hi)
        stats = st.stats
        pkey = _physical_name(schema[key]) if schema is not None else key
        # same disjointness predicate as the merge's pruning phase; files
        # the log can't decide (None) stay in the scan — no footer
        # fallback on the read path, the predicate below keeps it correct
        files = [
            rel
            for rel in files
            if _log_prune_decision(stats.get(rel, {}), pkey, qlo, qhi)
            is not True
        ]
        if lo is not None:
            pred = F.col(key) >= F.lit(lo)
        if hi is not None:
            p2 = F.col(key) <= F.lit(hi)
            pred = p2 if pred is None else (pred & p2)
    wanted = list(files) + sorted(
        {st.dv[f] for f in files if st.dv.get(f) is not None}
    )
    missing = [f for f in wanted if not os.path.exists(os.path.join(path, f))]
    if missing:
        raise SnapshotError(
            f"version {version} was vacuumed ({len(missing)} files gone); "
            "time travel is bounded by the vacuum retention window"
        )
    if not files:
        # a legal state (e.g. a merge deleted every row, or the key range
        # pruned everything): empty DataFrame with the recorded schema
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise SnapshotError(f"version {version} is empty (no schema recorded)")
    # project through the version's recorded schema: files written before
    # a schema evolution null-fill the appended columns; column-mapped
    # tables scan physical names and alias back to logical
    out = _read_files(spark, path, files, schema, dv=st.dv)
    return out.filter(pred) if pred is not None else out


def add_constraint(spark: SparkSession, path: str, name: str, expr: str) -> int:
    """Delta's ALTER TABLE ADD CONSTRAINT (CHECK): validate every
    EXISTING row against the SQL boolean ``expr`` (one scan — a
    constraint the current data violates is rejected, Delta's rule),
    then commit the constraint as metadata. Every subsequent write
    (append/overwrite/merge/replace_range/update_where) enforces it
    INSIDE the write job and fails before anything commits. SQL CHECK
    semantics: rows where ``expr`` evaluates NULL pass."""
    from pyspark.sql import functions as F

    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    if name in st.constraints:
        raise SnapshotError(f"constraint already exists: {name}")
    if st.live:
        bad = (
            read_snapshot(spark, path)
            .filter(~F.coalesce(F.expr(expr), F.lit(True)))
            .limit(1)
            .collect()
        )
        if bad:
            raise SnapshotError(
                f"existing rows violate CHECK ({expr}), e.g. {bad[0]}"
            )
    version = st.latest + 1
    _atomic_commit(
        path,
        {
            "version": version,
            "op": f"add_constraint:{name}",
            "add": [],
            "remove": [],
            "constraints": {**st.constraints, name: expr},
        },
    )
    _maybe_checkpoint(path, version)
    return version


def drop_constraint(spark: SparkSession, path: str, name: str) -> int:
    """Remove a CHECK constraint (metadata-only commit)."""
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    if name not in st.constraints:
        raise SnapshotError(f"no such constraint: {name}")
    version = st.latest + 1
    remaining = {k: v for k, v in st.constraints.items() if k != name}
    _atomic_commit(
        path,
        {
            "version": version,
            "op": f"drop_constraint:{name}",
            "add": [],
            "remove": [],
            "constraints": remaining,
        },
    )
    _maybe_checkpoint(path, version)
    return version


def _constraint_references(constraints: dict, column: str) -> list[str]:
    """Constraint names whose expression mentions ``column`` as a word —
    conservative (a quoted string containing the word also counts), which
    is the safe direction for blocking a rename/drop."""
    import re as _re

    pat = _re.compile(rf"\b{_re.escape(column)}\b")
    return sorted(n for n, e in constraints.items() if pat.search(e))


def rename_column(spark: SparkSession, path: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN — Delta's columnMapping name-mode: a
    PURE METADATA commit (no data rewrite, no file I/O) that keeps the
    column's PHYSICAL parquet name under the new logical name. Reads of
    any version project physical -> that version's logical names, so
    time travel to pre-rename versions still shows the old name.
    Constraints referencing the column block the rename (their SQL text
    would silently go stale — Delta raises here too)."""
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    schema = st.schema
    if schema is None:
        raise SnapshotError("no schema recorded; cannot rename")
    names = [f.name for f in schema.fields]
    if old not in names:
        raise SnapshotError(f"no such column: {old}")
    if new in names:
        raise SnapshotError(f"column already exists: {new}")
    refs = _constraint_references(st.constraints, old)
    if refs:
        raise SnapshotError(
            f"column {old} is referenced by CHECK constraint(s) {refs}; "
            "drop them first"
        )
    from pyspark.sql.types import StructField, StructType

    out = []
    for f in schema.fields:
        if f.name != old:
            # activate mapping on EVERY field: once any column has moved,
            # implicit physical==logical is no longer safe to assume
            out.append(StructField(
                f.name, f.dataType, f.nullable,
                {**(f.metadata or {}), _PHYS_KEY: _physical_name(f)},
            ))
        else:
            out.append(StructField(
                new, f.dataType, f.nullable,
                {**(f.metadata or {}), _PHYS_KEY: _physical_name(f)},
            ))
    version = st.latest + 1
    _atomic_commit(
        path,
        {
            "version": version,
            "op": f"rename_column:{old}->{new}",
            "add": [],
            "remove": [],
            "schema": StructType(out).json(),
            "stats": {},
        },
    )
    _maybe_checkpoint(path, version)
    return version


def drop_column(spark: SparkSession, path: str, name: str) -> int:
    """ALTER TABLE DROP COLUMN — a PURE METADATA commit: the field
    leaves the logical schema; files keep (and every reader ignores)
    the physical bytes. Time travel to pre-drop versions still shows
    the column. The remaining fields get explicit physical names, so a
    later re-ADD of the same logical name mints a FRESH physical column
    and can never resurrect the dropped data. Constraints referencing
    the column block the drop."""
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    schema = st.schema
    if schema is None:
        raise SnapshotError("no schema recorded; cannot drop")
    names = [f.name for f in schema.fields]
    if name not in names:
        raise SnapshotError(f"no such column: {name}")
    if len(names) == 1:
        raise SnapshotError("cannot drop the only column")
    refs = _constraint_references(st.constraints, name)
    if refs:
        raise SnapshotError(
            f"column {name} is referenced by CHECK constraint(s) {refs}; "
            "drop them first"
        )
    from pyspark.sql.types import StructField, StructType

    out = [
        StructField(
            f.name, f.dataType, f.nullable,
            {**(f.metadata or {}), _PHYS_KEY: _physical_name(f)},
        )
        for f in schema.fields
        if f.name != name
    ]
    version = st.latest + 1
    _atomic_commit(
        path,
        {
            "version": version,
            "op": f"drop_column:{name}",
            "add": [],
            "remove": [],
            "schema": StructType(out).json(),
            "stats": {},
        },
    )
    _maybe_checkpoint(path, version)
    return version


def rollback(spark: SparkSession, path: str, version: int) -> int:
    """Commit a new version whose live set equals ``version``'s — the
    metadata-only undo (no data I/O, history preserved)."""
    st_old = _state(path, version)  # validates table + version bounds
    if st_old is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    st_cur = _state(path)
    new_version = st_cur.latest + 1
    cur = set(st_cur.live)
    want = set(st_old.live)
    # Restore the TARGET version's deletion vectors too: a kept file
    # whose dv changed since re-points at the old blob; one whose dv
    # did not exist then is explicitly cleared (None). Re-added files
    # shed any dv when they were removed, so only a non-None target
    # needs recording for them.
    dv_restore: dict[str, str | None] = {}
    for rel in want:
        tgt = st_old.dv.get(rel)
        now = st_cur.dv.get(rel) if rel in cur else None
        if tgt != now:
            dv_restore[rel] = tgt
    # restore the target version's vector CARDINALITIES alongside (known
    # from its folded state; absent entries leave consumers on the scan
    # fallback, never wrong)
    dv_rows_restore = {
        rel: st_old.dv_rows[rel]
        for rel, tgt in dv_restore.items()
        if tgt is not None and rel in st_old.dv_rows
    }
    # Record the restored version's schema: without it, the schema fold
    # would walk past the rollback to the schema of the very overwrite
    # being UNDONE, and reads of the restored files would project through
    # the wrong schema (restored columns dropped, the bad run's
    # null-filled).
    _atomic_commit(
        path,
        {
            "version": new_version,
            "op": f"rollback:{version}",
            "add": sorted(want - cur),
            "remove": sorted(cur - want),
            **({"dv": dv_restore} if dv_restore else {}),
            **({"dv_rows": dv_rows_restore} if dv_rows_restore else {}),
            **({"schema": st_old.schema_json} if st_old.schema_json else {}),
        },
    )
    _maybe_checkpoint(path, new_version)
    return new_version


def _log_prune_decision(entry: dict, key: str, qlo, qhi) -> bool | None:
    """Decide from a file's LOG stats whether it can be skipped for the
    (encoded, possibly one-sided) key range [qlo, qhi]. Returns True
    (provably disjoint — prune), False (may intersect — keep), or None
    (no usable log stats — the caller picks its fallback). Shared by the
    merge's find-touched pruning and read-side data skipping so the
    disjointness predicate exists exactly once."""
    if entry.get("rows") == 0:  # an empty file can never contain a match
        return True
    mm = entry.get("minmax", {}).get(key)
    if mm is None or (qlo is None and qhi is None):
        return None
    fmin, fmax = mm
    try:
        if (qhi is not None and fmin > qhi) or (qlo is not None and fmax < qlo):
            return True
        return False
    except TypeError:
        return None  # incomparable encodings → caller's fallback


class _Rng:
    """Duck-typed stand-in for the preamble Row: .lo/.hi key range."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi


def _fuse_preamble_max_rows(spark) -> int:
    """Row-count ceiling under which a merge target counts as SMALL: the
    standalone source preamble job exists to feed stats pruning, and
    pruning a table this small cannot pay for that extra source pass —
    the preamble facts ride the touch join as an observation instead.
    Conf knob with a local-friendly default; at any real scale the log
    row totals exceed every sensible setting and the pruning posture is
    kept."""
    try:
        raw = spark.conf.get("spark.ops_spark.merge.fusePreambleMaxRows", None)
        if raw is not None:
            return int(raw)
    except Exception:  # noqa: BLE001
        pass
    return 10_000_000


def _raise_dup_merge_keys(src_keys) -> None:
    """Fetch one duplicate-key example (error path only) and raise."""
    dup = src_keys.filter(F.col("__n") > 1).limit(1).collect()
    raise SnapshotError(
        f"source has duplicate merge keys, e.g. {dup[0][:-1]}"
    )


def _stats_prune(
    path: str,
    files: list[str],
    key: str,
    lo,
    hi,
    log_stats: dict | None = None,
) -> tuple[list[str], int, int]:
    """Data-skipping for the merge's find-touched phase: keep only files
    whose min/max range on ``key`` intersects the source key range
    [lo, hi]. The min/max comes from the COMMIT LOG (``log_stats``,
    recorded at write time by _collect_stats — already in driver memory,
    zero I/O); only files the log carries no usable ``key`` stats for
    (legacy commits, unencodable types) fall back to a driver-side footer
    read. Any file without usable stats anywhere stays a candidate —
    pruning is only ever a safe over-approx. Returns (keep, n_pruned,
    n_footer_reads); footer reads are counted locally (concurrent merges
    must not cross-attribute each other's) and also accumulated into the
    module-wide FOOTER_PRUNE_READS observability counter."""
    global FOOTER_PRUNE_READS
    import pyarrow.parquet as pq

    if lo is None or hi is None:
        return files, 0, 0
    qlo, qhi = _stat_val(lo), _stat_val(hi)
    keep, pruned, footer_reads = [], 0, 0
    for rel in files:
        decision = _log_prune_decision((log_stats or {}).get(rel, {}), key, qlo, qhi)
        if decision is True:
            pruned += 1
            continue
        if decision is False:
            keep.append(rel)
            continue
        footer_reads += 1
        try:
            md = pq.ParquetFile(os.path.join(path, rel)).metadata
            if md.num_rows == 0:
                pruned += 1
                continue
            idx = md.schema.to_arrow_schema().names.index(key)
            fmin = fmax = None
            ok = True
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if ok and fmin is not None and (fmax < lo or fmin > hi):
                pruned += 1
                continue
        except Exception:
            pass  # unreadable stats → keep as candidate
        keep.append(rel)
    FOOTER_PRUNE_READS += footer_reads
    return keep, pruned, footer_reads


def merge_snapshot(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    allow_schema_evolution: bool = False,
    dv: bool = False,
) -> dict:
    """MERGE INTO for snapshot tables — the CDC upsert every continuously
    refreshed corpus needs (Delta/Iceberg MERGE semantics; concurrent
    writers serialize optimistically — see _commit_or_rebase: merges on
    provably disjoint key ranges both land, real conflicts raise):
    target rows whose ``on`` key matches a source row are updated (or
    deleted), source rows matching nothing are inserted, and everything
    lands as ONE atomic commit, so readers see pre-merge or post-merge
    state, never a mix, and time travel to the pre-merge version keeps
    working.

    The 100 TB property is copy-on-write over the TOUCHED FILE FRACTION
    only, found in two phases:
      1. min/max pruning on ``on[0]`` vs the source key range, read from
         the COMMIT LOG's per-file stats (recorded at write time — zero
         I/O; footer fallback only for legacy commits). CDC batches are
         usually range-concentrated on a time/sequence key, so this drops
         most of the table before any scan;
      2. an exact key semi-join over the survivors reading ONLY the key
         columns + input_file_name() (column-pruned scan; the source side
         is a distinct key projection, broadcast-sized for any sane CDC
         batch).
    Files containing no matched key keep their name and bytes; only
    touched files are rewritten through one full-outer join with the
    source. A source key matching zero target rows appears in no file, so
    evaluating NOT MATCHED against the touched subset alone is exact.

    when_matched: 'update' (source row replaces target row) | 'delete'.
    when_not_matched: 'insert' | 'ignore'. Duplicate ``on`` keys in the
    source make the merge ambiguous and raise (Delta's rule). Plain SQL
    equality on the keys — NULL keys never match, like MERGE.

    allow_schema_evolution=True applies Delta's evolution rules: columns
    only in the source APPEND to the table schema (pre-existing rows and
    files null-fill on read), columns the source omits keep their target
    values on matched rows, and a dtype change raises. The commit
    records the evolved schema; time travel to pre-merge versions still
    reads the old schema.

    ``dv=True`` runs the merge in DELETION-VECTOR mode (Delta's DV
    MERGE): touched files keep their bytes — matched rows are
    vector-deleted via one position blob, and the post-merge rows
    (updates taking source values; not-matched inserts) land as NEW
    files in the same commit. Write amplification becomes O(changed
    rows) instead of O(rows in touched files) — where CDC-upsert cost
    actually bites at 100 TB. Copy-on-write (default) remains the
    vector-folding path: a rewrite sheds the file's vector.

    Returns {version, files_live, files_pruned_by_stats,
    footer_fallback_reads, files_rewritten, rows_updated/deleted/
    inserted/copied} — version is -1 when the merge is a provable no-op
    (nothing touched, nothing to insert). footer_fallback_reads is the
    number of driver-side footer opens the pruning phase needed: 0 on a
    table whose commits all carry log stats.
    """
    from pyspark.sql import functions as F

    if when_matched not in ("update", "delete"):
        raise SnapshotError(f"unsupported when_matched: {when_matched}")
    if when_not_matched not in ("insert", "ignore"):
        raise SnapshotError(f"unsupported when_not_matched: {when_not_matched}")
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    target_schema = st.schema  # logical, metadata-carrying (column mapping)
    target_cols = [f.name for f in target_schema.fields]
    missing = [k for k in on if k not in source.columns or k not in target_cols]
    if missing:
        raise SnapshotError(f"merge keys absent from source or target: {missing}")
    if allow_schema_evolution:
        # Delta rule: source-only columns APPEND to the table (old rows
        # null-fill), matched rows keep target values for columns the
        # source omits, dtype changes raise
        out_schema = _evolve_schema(target_schema, source.schema)
    else:
        out_schema = target_schema
        needs_full = when_matched == "update" or when_not_matched == "insert"
        if needs_full and set(source.columns) != set(target_cols):
            raise SnapshotError(
                "update/insert merge needs the full target column set in the "
                f"source; missing {sorted(set(target_cols) - set(source.columns))}"
                " (or pass allow_schema_evolution=True)"
            )
        # dtype check even in strict mode: when/otherwise would silently
        # coerce (source double vs target long → double), staging files
        # whose physical type diverges from the committed target_schema —
        # a committed-but-unreadable latest version. Scope: only columns
        # the merge can WRITE (all of them when updating/inserting; just
        # the keys for delete+ignore, where a coerced key join would also
        # false-match, e.g. double 2.0 against long 2). Compared via
        # simpleString so nested nullability-only differences (array
        # containsNull, struct field nullable) — which cannot diverge
        # physically — don't reject a working merge.
        by_name = {f.name: f for f in source.schema.fields}
        checked = target_cols if needs_full else on
        for cname in checked:
            f = target_schema[cname] if cname in target_cols else None
            sf = by_name.get(cname)
            if (
                f is not None
                and sf is not None
                and sf.dataType.simpleString() != f.dataType.simpleString()
            ):
                raise SnapshotError(
                    f"source column '{cname}' is {sf.dataType.simpleString()} "
                    f"but the target is {f.dataType.simpleString()}; cast the "
                    "source to the target dtype (implicit coercion would commit "
                    "files that diverge from the table schema)"
                )

    live = st.live
    # log stats (and footers) are keyed by the PHYSICAL column name
    phys_key = _physical_name(target_schema[on[0]])

    # ONE source pass for both preamble facts: the ambiguity guard
    # (Delta semantics: >1 source row per key is an error) and the
    # leading-key range for phase-1 stats pruning. The per-key groupBy
    # covers every key, so min/max over the groups == min/max over rows;
    # the dup EXAMPLE is fetched by a second job only on the error path.
    #
    # SMALL-TABLE FUSION (VERDICT r11 #4): when the commit log PROVES the
    # live table small (every live file has a logged row count and the
    # total is under the knob below), phase-1 pruning cannot pay for a
    # standalone source job — a key-column scan of the whole table is
    # trivial — so the preamble facts ride the touch-detection join as a
    # free observation instead (dup guard = max per-key count; lo/hi for
    # the commit's merge_range/OCC read-set, needed only after the scan).
    # Big or stats-less tables keep the standalone job: they are exactly
    # where pre-scan pruning matters, and pruning needs lo/hi FIRST.
    src_keys = source.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    pre_obs = None
    live_rows = [st.stats.get(rel, {}).get("rows") for rel in live]
    # BOTH bounds must hold: rows bound the key-column scan the fusion
    # gives up pruning on; the FILE bound matters independently because
    # pruning's value scales with file count (touch detection opens every
    # candidate) — a 100+-file CDC table keeps the pruning posture even
    # when its row total is modest.
    if live and len(live) <= 32 and all(
        r is not None for r in live_rows
    ) and sum(live_rows) <= _fuse_preamble_max_rows(spark):
        from pyspark.sql import Observation

        pre_obs = Observation()
        src_key_rows = src_keys.observe(
            pre_obs,
            F.max("__n").alias("__mx"),
            F.min(on[0]).alias("lo"),
            F.max(on[0]).alias("hi"),
        ).select(*on)
        rng = None
        candidates, pruned, footer_reads = list(live), 0, 0
    else:
        src_key_rows = source.select(*on).distinct()
        rng = src_keys.agg(
            F.max("__n").alias("__mx"),
            F.min(on[0]).alias("lo"),
            F.max(on[0]).alias("hi"),
        ).first()
        if (rng["__mx"] or 0) > 1:
            _raise_dup_merge_keys(src_keys)
        candidates, pruned, footer_reads = _stats_prune(
            path, live, phys_key, rng.lo, rng.hi, log_stats=st.stats
        )

    # phase 2: exact touch detection — key-column-only scan + semi-join,
    # read through the recorded schema so files predating a schema
    # evolution null-fill an evolved-in key (and correctly never match)
    # instead of failing inference-dependent analysis
    touched: list[str] = []
    n_matched_pre = 0
    dv_matched = None
    if candidates:
        cand_df = _read_files(spark, path, candidates, target_schema,
                              dv=st.dv, with_pos=True)
        by_base = {os.path.basename(f): f for f in live}
        # DV mode: unless the update piece needs target values (schema
        # evolution with source-omitted columns), the key+position rows
        # found here are EVERYTHING _merge_dv needs — persist them so
        # the blob, the update piece and the insert anti-join read the
        # cache instead of re-scanning the touched files.
        needs_t_vals = dv and when_matched == "update" and any(
            f.name in target_cols and f.name not in source.columns
            for f in out_schema.fields
        )
        if dv and not needs_t_vals:
            dv_matched = (
                cand_df.select(*on, "__dv_file", "__dv_pos")
                .join(src_key_rows, on=on, how="leftsemi")
            )
            dv_matched.persist()
            hits = (
                dv_matched.groupBy(F.col("__dv_file").alias("__f"))
                .agg(F.count(F.lit(1)).alias("__n")).collect()
            )
        else:
            # per-file MATCH counts in the same column-pruned pass that
            # finds the touched files: their sum is exactly _merge_dv's
            # matched-row count (matches only occur in touched files),
            # so the DV path never runs a separate count() job over the
            # touched reads
            hits = (
                cand_df.select(*on, F.col("__dv_file").alias("__f"))
                .join(src_key_rows, on=on, how="leftsemi")
                .groupBy("__f").agg(F.count(F.lit(1)).alias("__n")).collect()
            )
        touched = sorted(by_base[r["__f"]] for r in hits)
        n_matched_pre = sum(r["__n"] for r in hits)
    if pre_obs is not None:
        # fused preamble: the facts rode the touch job just collected
        # (candidates == live is non-empty on this path, so it always ran)
        rng = pre_obs.get
        if (rng["__mx"] or 0) > 1:
            if dv_matched is not None:
                dv_matched.unpersist()
            _raise_dup_merge_keys(src_keys)
        rng = _Rng(rng["lo"], rng["hi"])

    version = st.latest + 1
    if dv and touched:
        try:
            return _merge_dv(
                spark, path, st, source, on, when_matched, when_not_matched,
                target_schema, out_schema, touched, pruned, footer_reads,
                phys_key, _stat_val(rng.lo), _stat_val(rng.hi), n_matched_pre,
                matched=dv_matched,
            )
        finally:
            if dv_matched is not None:
                dv_matched.unpersist()
    if dv_matched is not None:  # dv requested but nothing touched
        dv_matched.unpersist()
    t = None
    if touched:
        t = _read_files(spark, path, touched, target_schema, dv=st.dv)
    elif when_not_matched == "ignore":
        return {
            "version": -1, "files_live": len(live),
            "files_pruned_by_stats": pruned, "files_rewritten": 0,
            "footer_fallback_reads": footer_reads,
            "rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0,
            "rows_copied": 0,
        }

    s = source.withColumn("__s", F.lit(1)).alias("s")
    if t is not None:
        t = t.withColumn("__t", F.lit(1)).alias("t")
        cond = None
        for k in on:
            eq = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = eq if cond is None else (cond & eq)
        j = t.join(s, cond, "full_outer")
        t_here = F.col("t.__t").isNotNull()
        s_here = F.col("s.__s").isNotNull()
        action = (
            F.when(t_here & ~s_here, F.lit("copy"))
            .when(t_here & s_here, F.lit(when_matched))
            .otherwise(F.lit(when_not_matched))
        )
        use_s = (t_here & s_here & F.lit(when_matched == "update")) | ~t_here

        takes_source = when_matched == "update" or when_not_matched == "insert"

        def _val(c: str, dtype):
            t_expr = (
                F.col(f"t.{c}") if c in target_cols else F.lit(None).cast(dtype)
            )
            if c not in source.columns:  # source omits it: keep target value
                return t_expr
            if not takes_source:
                # delete+ignore: no surviving row ever takes a source
                # value — referencing s.c would only let when/otherwise
                # COERCE the output type (e.g. a string tombstone payload
                # over a long column) and stage files the committed
                # schema cannot read
                return t_expr
            return F.when(use_s, F.col(f"s.{c}")).otherwise(t_expr)

        merged = j.select(
            *[_val(f.name, f.dataType).alias(f.name) for f in out_schema.fields],
            action.alias("__action"),
        )
    else:  # nothing touched: every source row is an insert
        merged = s.select(
            *[
                (
                    F.col(f.name)
                    if f.name in source.columns
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in out_schema.fields
            ],
            F.lit("insert").alias("__action"),
        )

    from pyspark.sql import Observation

    merged = merged.filter(~F.col("__action").isin("delete", "ignore"))
    # per-action counts ride the staging write as CollectMetrics — the
    # former persist + groupBy(__action).collect() pre-pass executed the
    # whole full-outer join once just for the stats; now the join runs
    # exactly once, inside the write. An all-empty merge stages an empty
    # shell that is unstaged below (the _merge_dv observation dance).
    obs = Observation()
    merged = merged.observe(
        obs,
        F.count(F.when(F.col("__action") == "update", 1)).alias("update"),
        F.count(F.when(F.col("__action") == "insert", 1)).alias("insert"),
        F.count(F.when(F.col("__action") == "copy", 1)).alias("copy"),
    )
    added = _stage_add(
        _to_physical(
            _enforce_constraints(merged.drop("__action"), st.constraints),
            out_schema,
        ),
        path,
        version,
    )
    counts = {k: v for k, v in obs.get.items() if v}
    if not counts:
        _unstage(path, added)  # empty shell: commit contents unchanged
        added = []
    if not counts and not touched:  # empty source, nothing touched
        return {
            "version": -1, "files_live": len(live),
            "files_pruned_by_stats": pruned, "files_rewritten": 0,
            "footer_fallback_reads": footer_reads,
            "rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0,
            "rows_copied": 0,
        }
    # matched-but-dropped rows never reach `counts`; their count is the
    # touch-detection pass's per-file match sum (matches occur only in
    # touched files), so no extra count job runs
    rows_deleted = n_matched_pre if when_matched == "delete" and touched else 0
    qlo, qhi = _stat_val(rng.lo), _stat_val(rng.hi)
    commit = {
        "version": version,
        "op": "merge",
        "add": added,
        "remove": touched,
        "schema": out_schema.json(),
        "stats": _collect_stats(path, added),
        # declared read set: later conflict checks (ours and other
        # writers') prove merge-vs-merge disjointness from the log alone.
        # PHYSICAL key name — stats and files are keyed physically, and
        # a concurrent logical rename is a schema conflict anyway
        "merge_key": phys_key,
        "merge_range": [qlo, qhi],
    }
    try:
        version = _commit_or_rebase(
            path, commit,
            {"kind": "merge", "base_schema_json": st.schema_json,
             "key": phys_key, "lo": qlo, "hi": qhi},
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_live": len(live),
        "files_pruned_by_stats": pruned,
        "footer_fallback_reads": footer_reads,
        "files_rewritten": len(touched),
        "rows_updated": counts.get("update", 0),
        "rows_deleted": rows_deleted,
        "rows_inserted": counts.get("insert", 0),
        "rows_copied": counts.get("copy", 0),
    }


def _merge_dv(
    spark: SparkSession, path: str, st: _State, source: DataFrame,
    on: list[str], when_matched: str, when_not_matched: str,
    target_schema, out_schema, touched: list[str], pruned: int,
    footer_reads: int, phys_key: str, qlo, qhi, n_matched: int,
    matched=None,
) -> dict:
    """The deletion-vector MERGE path: every MATCHED target row's
    physical position goes into one blob (touched files keep their
    bytes), and the post-merge rows — updates carrying source values,
    plus not-matched inserts — are staged as NEW files; ONE commit
    publishes both, flowing through the same OCC loop as copy-on-write
    (a DV re-point counts as touching the file for conflict detection —
    see _assert_rebase_safe). Unchanged rows in touched files are never
    rewritten: rows_copied is 0 by construction.

    ``matched`` is the caller's already-PERSISTED (keys, __dv_file,
    __dv_pos) match set from touch detection — the update piece takes
    every non-key value from the source in this mode, so key+position
    is the whole target contribution and no touched file is read a
    second time. None (schema evolution with source-omitted columns)
    re-reads the touched files for their pre-merge values."""
    from pyspark.sql import functions as F

    version = st.latest + 1
    target_cols = [f.name for f in target_schema.fields]
    own_persist = matched is None
    if matched is None:
        t = _read_files(spark, path, touched, target_schema, dv=st.dv,
                        with_pos=True)
        matched = t.join(source.select(*on).distinct(), on, "leftsemi")
        matched.persist()
    blob = None
    try:
        hits = matched.select(
            F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
        )
        # own_persist: the fallback cache above is not yet materialized,
        # so the narrow path would run its whole build join single-task
        blob, dv_rows = _stage_dv_blob(
            spark, path, st, hits, touched, version, narrow=not own_persist
        )

        pieces = []
        if when_matched == "update":
            tt = matched.drop("__dv_file", "__dv_pos").alias("t")
            s = source.alias("s")
            cond = None
            for k in on:
                eq = F.col(f"t.{k}") == F.col(f"s.{k}")
                cond = eq if cond is None else (cond & eq)
            # dup guard upstream: exactly one source row per matched key,
            # so this inner join re-emits each matched target row once,
            # with source values for source-carried columns
            pieces.append(tt.join(s, cond, "inner").select(*[
                (
                    F.col(f"s.{f.name}") if f.name in source.columns
                    else (
                        F.col(f"t.{f.name}") if f.name in target_cols
                        else F.lit(None).cast(f.dataType)
                    )
                ).alias(f.name)
                for f in out_schema.fields
            ]))
        n_insert = 0
        obs = None
        if when_not_matched == "insert":
            from pyspark.sql import Observation

            ins = source.join(
                matched.select(*on).distinct(), on, "left_anti"
            ).select(*[
                (
                    F.col(f.name) if f.name in source.columns
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in out_schema.fields
            ])
            # count the inserts ON the staging write (CollectMetrics)
            # instead of a separate count() job that recomputes the
            # left_anti join
            obs = Observation()
            pieces.append(ins.observe(obs, F.count(F.lit(1)).alias("n")))
        new_rows = None
        for p in pieces:
            new_rows = p if new_rows is None else new_rows.unionByName(p)

        added: list[str] = []
        try:
            if new_rows is not None:
                added = _stage_add(
                    _to_physical(
                        _enforce_constraints(new_rows, st.constraints),
                        out_schema,
                    ),
                    path,
                    version,
                )
            if obs is not None and added:
                n_insert = int(obs.get["n"])
                if n_insert == 0 and when_matched != "update":
                    # nothing actually inserted and no update piece: the
                    # stage wrote only an empty shell — drop it so the
                    # commit matches the pre-observation behavior
                    _unstage(path, added)
                    added = []
            commit = {
                "version": version,
                "op": "merge",
                "add": added,
                "remove": [],
                "dv": {rel: blob for rel in touched},
                "dv_rows": dv_rows,
                "schema": out_schema.json(),
                "stats": _collect_stats(path, added),
                "merge_key": phys_key,
                "merge_range": [qlo, qhi],
            }
            version = _commit_or_rebase(
                path, commit,
                {"kind": "merge", "base_schema_json": st.schema_json,
                 "key": phys_key, "lo": qlo, "hi": qhi},
            )
        except Exception:
            _unstage(path, added + [blob])
            raise
    finally:
        if own_persist:
            matched.unpersist()
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_live": len(st.live),
        "files_pruned_by_stats": pruned,
        "footer_fallback_reads": footer_reads,
        "files_rewritten": 0,
        "files_dv": len(touched),
        "rows_updated": n_matched if when_matched == "update" else 0,
        "rows_deleted": n_matched if when_matched == "delete" else 0,
        "rows_inserted": n_insert,
        "rows_copied": 0,
    }


def replace_range(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    key: str,
    lo,
    hi,
) -> dict:
    """Delta's ``replaceWhere`` for snapshot tables: atomically replace
    exactly the rows with ``key`` in [lo, hi] by ``df`` — the "re-ingest
    one day/partition of a 100 TB table" operation. A plain overwrite
    rewrites the world; a delete+append pair gives readers a torn
    in-between version. This is ONE commit, classified from the
    commit-log stats (zero data I/O for the decision):

    - files fully INSIDE [lo, hi]: logically removed, bytes untouched
      (time travel still reaches them until vacuum);
    - files fully DISJOINT from [lo, hi]: kept by name — no I/O at all;
    - files OVERLAPPING the boundary (or with no usable log stats):
      rewritten keeping only their rows OUTSIDE [lo, hi] (copy-on-write
      of the boundary fraction — for a range-clustered table that is
      O(files at the two boundaries), not O(table)).

    ``df`` must fall entirely inside [lo, hi] (Delta's replaceWhere
    constraint violation otherwise — rows outside would silently survive
    alongside the files they were supposed to replace). NULL keys are
    outside every range, so files containing them are never dropped
    whole, and null-key rows in ``df`` raise.

    Returns {version, files_removed_whole, files_rewritten, files_kept,
    rows_inserted, rows_retained}.
    """
    from pyspark.sql import functions as F

    if lo is None or hi is None:
        raise SnapshotError("replace_range needs bounded lo and hi")
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    target_schema = st.schema
    if target_schema is None:
        raise SnapshotError("no schema recorded; cannot replace_range")
    cols = [f.name for f in target_schema.fields]
    if key not in cols:
        raise SnapshotError(f"replace key not in table schema: {key}")
    if set(df.columns) != set(cols):
        raise SnapshotError(
            "replace_range df must carry the full table column set; "
            f"missing {sorted(set(cols) - set(df.columns))}"
        )
    # Delta's constraint check: every incoming row inside the range
    outside = df.filter(
        F.col(key).isNull() | (F.col(key) < F.lit(lo)) | (F.col(key) > F.lit(hi))
    ).limit(1).collect()
    if outside:
        raise SnapshotError(
            f"replace_range df has rows outside [{lo}, {hi}] "
            f"(e.g. {key}={outside[0][key]!r}); they would silently "
            "survive alongside the files they were meant to replace"
        )

    qlo, qhi = _stat_val(lo), _stat_val(hi)
    phys_key = _physical_name(target_schema[key])  # stats are physical-keyed
    drop_whole, rewrite, keep = [], [], []
    for rel in st.live:
        entry = st.stats.get(rel, {})
        if entry.get("rows") == 0:
            drop_whole.append(rel)  # empty file: replacing it loses nothing
            continue
        mm = entry.get("minmax", {}).get(phys_key)
        if mm is None or qlo is None or qhi is None:
            rewrite.append(rel)  # undecidable from the log: rewrite is safe
            continue
        fmin, fmax = mm
        try:
            if fmin > qhi or fmax < qlo:
                keep.append(rel)  # disjoint: keep by name, no I/O
            elif fmin >= qlo and fmax <= qhi:
                drop_whole.append(rel)  # fully inside: drop whole
            else:
                rewrite.append(rel)  # boundary overlap: rewrite complement
        except TypeError:
            rewrite.append(rel)

    from pyspark.sql import Observation

    version = st.latest + 1
    # inserted/retained counts ride the staging write as CollectMetrics
    # (one observation per union branch) — the former standalone
    # new.count() + retained.count() jobs re-executed both subplans
    # purely for the stats the write was about to compute anyway
    obs_new = Observation()
    new = df.select(
        *[F.col(c).cast(target_schema[c].dataType) for c in cols]
    ).observe(obs_new, F.count(F.lit(1)).alias("n"))
    obs_ret = None
    if rewrite:
        old = _read_files(spark, path, rewrite, target_schema, dv=st.dv)
        # complement: rows outside [lo, hi]; null keys are retained too
        retained = old.filter(
            F.col(key).isNull()
            | (F.col(key) < F.lit(lo))
            | (F.col(key) > F.lit(hi))
        )
        obs_ret = Observation()
        new = new.unionByName(retained.observe(obs_ret, F.count(F.lit(1)).alias("n")))
    added = _stage_add(
        _to_physical(_enforce_constraints(new, st.constraints), target_schema),
        path,
        version,
    )
    n_inserted = int(obs_new.get["n"])
    n_retained = int(obs_ret.get["n"]) if obs_ret is not None else 0
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": f"replace_range:{key}",
                "add": added,
                "remove": sorted(drop_whole + rewrite),
                "schema": target_schema.json(),
                "stats": _collect_stats(path, added),
            },
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_removed_whole": len(drop_whole),
        "files_rewritten": len(rewrite),
        "files_kept": len(keep),
        "rows_inserted": n_inserted,
        "rows_retained": n_retained,
    }


def _touched_by_predicate(
    spark: SparkSession, path: str, st: _State, cond
) -> tuple[list[str], "DataFrame | None", int, int]:
    """Files of ``st.live`` that contain at least one row matching
    ``cond`` — found with ONE column-pruned scan (Catalyst reads only
    the predicate's columns + file name), the same touch-detection shape
    as the merge's phase 2. The same pass also aggregates per-file
    (total, matched) row counts, so callers never pay a second
    full-table job just for their rows_deleted/rows_updated stats.
    Returns (touched rel paths, the touched-file DataFrame read through
    the table schema or None, total rows in touched files, matched rows
    in touched files)."""
    from pyspark.sql import functions as F

    schema = st.schema
    if schema is None:
        raise SnapshotError("no schema recorded; cannot run predicate DML")
    if not st.live:
        return [], None, 0, 0
    # _metadata-based file identity (input_file_name() refuses plans
    # with a second source, which the DV anti-join legitimately adds)
    df = _read_files(spark, path, st.live, schema, dv=st.dv, with_pos=True)
    by_base = {os.path.basename(f): f for f in st.live}
    per_file = (
        df.groupBy(F.col("__dv_file").alias("__f"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(cond, 1)).alias("__m"),
        )
        # untouched files contribute nothing downstream — filtering them
        # executor-side keeps the driver collect O(touched files), not
        # O(live files) (VERDICT r11 #7; matters at CDC posture where a
        # selective predicate touches a sliver of 10^5-10^6 live files)
        .filter(F.col("__m") > 0)
        .collect()
    )
    touched = sorted(by_base[r["__f"]] for r in per_file)
    if not touched:
        return [], None, 0, 0
    n_rows = sum(r["__n"] for r in per_file)
    n_matched = sum(r["__m"] for r in per_file)
    return (
        touched,
        _read_files(spark, path, touched, schema, dv=st.dv),
        n_rows,
        n_matched,
    )


def _live_rows_from_stats(st: _State, touched: list[str]) -> "int | None":
    """Total LIVE rows in ``touched`` derived from the commit log alone:
    physical rows recorded at write time minus the file's current
    deletion-vector cardinality (the newest blob is always the whole
    vector, so the subtraction is exact). Returns None when any touched
    file lacks log stats (legacy/unreadable footer) — callers fall back
    to a count job for just those reads."""
    total = 0
    for rel in touched:
        rows = (st.stats.get(rel) or {}).get("rows")
        if rows is None:
            return None
        total += rows - st.dv_rows.get(rel, 0)
    return total


def _matched_live(
    spark: SparkSession, path: str, st: _State, cond, keep_cols: list[str]
):
    """ONE column-pruned scan of the live files (through their current
    vectors) caching only the rows matching ``cond``, pruned to
    ``keep_cols`` + (__dv_file, __dv_pos). The per-file match counts are
    collected off the cached set — the job that materializes it — so DV
    DML never re-scans the touched files afterwards: the blob positions,
    the update re-inserts and the merge pieces all read the cache.
    Returns (touched rel paths, persisted matched DataFrame, matched-row
    count). The caller owns the unpersist."""
    from pyspark.sql import functions as F

    df = _read_files(spark, path, st.live, st.schema, dv=st.dv,
                     with_pos=True)
    matched = df.where(cond).select(
        *keep_cols, "__dv_file", "__dv_pos"
    )
    matched.persist()
    per_file = (
        matched.groupBy("__dv_file").agg(F.count(F.lit(1)).alias("__m"))
        .collect()
    )
    by_base = {os.path.basename(f): f for f in st.live}
    touched = sorted(by_base[r["__dv_file"]] for r in per_file)
    n_matched = sum(r["__m"] for r in per_file)
    return touched, matched, n_matched


def delete_where(
    spark: SparkSession, path: str, condition, dv: bool = False
) -> dict:
    """DELETE FROM <table> WHERE <condition> — Delta DELETE semantics as
    one atomic commit. Only files containing at least one matching row
    are touched; every other file keeps its name and bytes. SQL
    three-valued logic: rows where the condition is NULL are NOT
    deleted.

    ``dv=False`` (default) is COPY-ON-WRITE: touched files are rewritten
    with their non-matching rows retained. ``dv=True`` writes DELETION
    VECTORS instead (Delta's DV mode): no data file is rewritten — the
    commit records one position blob (file basename + physical row
    position of every deleted row, UNIONED with the file's previous
    blob so the newest blob is always the whole vector) and readers
    filter scan-side. DV wins when deletes are small and frequent
    (GDPR/point deletes on a 100 TB table: the copy-on-write cost is
    the touched FILES, the DV cost is the deleted ROWS); compaction or
    a later copy-on-write pass folds vectors away naturally (a removed
    file sheds its DV).

    ``condition`` is a SQL boolean expression string (or a Column).
    Returns {version, files_rewritten, files_kept, rows_deleted,
    rows_retained}; version -1 when nothing matches (no commit). In DV
    mode ``files_rewritten`` counts the files that GAINED a vector and
    ``rows_retained`` the rows those files still serve."""
    from pyspark.sql import functions as F

    cond = F.expr(condition) if isinstance(condition, str) else condition
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    if dv:
        # DV regime: matched rows are few by design, so ONE scan caches
        # just their positions; touched-file totals come from the commit
        # log (rows at write time minus current vector cardinality)
        # instead of a second aggregation job over the data.
        if st.schema is None:
            raise SnapshotError("no schema recorded; cannot run predicate DML")
        touched, matched, n_matched = _matched_live(spark, path, st, cond, [])
        try:
            if not touched:
                return {
                    "version": -1, "files_rewritten": 0,
                    "files_kept": len(st.live),
                    "rows_deleted": 0, "rows_retained": 0,
                }
            n_rows = _live_rows_from_stats(st, touched)
            if n_rows is None:  # legacy files without log stats
                n_rows = _read_files(
                    spark, path, touched, st.schema, dv=st.dv
                ).count()
            return _delete_where_dv(
                spark, path, st, matched, touched, st.latest + 1,
                n_rows, n_matched,
            )
        finally:
            matched.unpersist()
    touched, t, n_rows, n_matched = _touched_by_predicate(spark, path, st, cond)
    if not touched:
        return {
            "version": -1, "files_rewritten": 0, "files_kept": len(st.live),
            "rows_deleted": 0, "rows_retained": 0,
        }
    version = st.latest + 1
    # NULL-condition rows are retained (DELETE's WHERE keeps them)
    retained = t.where(~F.coalesce(cond, F.lit(False)))
    added = _stage_add(_to_physical(retained, st.schema), path, version)
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "delete_where",
                "add": added,
                "remove": touched,
                "schema": st.schema_json,
                "stats": _collect_stats(path, added),
            },
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_kept": len(st.live) - len(touched),
        "rows_deleted": n_matched,
        "rows_retained": n_rows - n_matched,
    }


def _stage_dv_blob(
    spark: SparkSession, path: str, st: _State, hits, touched: list[str],
    version: int, narrow: bool = True,
) -> tuple[str, dict]:
    """Union the deleted-position ``hits`` (a (file, pos) DataFrame of
    PHYSICAL row positions) with the touched files' PREVIOUS vectors —
    the newest blob is always a file's whole vector — and stage the
    result as ONE parquet blob through the same path as data files (a
    crash leaves only an unreferenced file; vacuum's orphan grace
    applies). Entirely distributed: positions never land on the driver.
    Returns (blob rel path, {data-file rel: vector cardinality}) — the
    per-file counts (Delta's deletionVector.cardinality) come from one
    small distributed aggregate over the just-staged blob and go into
    the commit so maintenance (reorg_purge) decides from the LOG.
    Shared by delete_where(dv=True), merge_snapshot(dv=True) and
    update_where(dv=True)."""
    from pyspark.sql import functions as F

    need_prev = {
        os.path.basename(r): st.dv[r] for r in touched
        if st.dv.get(r) is not None
    }
    posdf = hits
    if need_prev:
        posdf = posdf.unionByName(_dv_applied(spark, path, need_prev))
    # narrow=True (every standard DV caller): ``hits`` reads an
    # already-MATERIALIZED persisted match set, so coalesce(1) collapses
    # only cached-partition reads plus the previous-vector blob scans
    # (single small parquet files) into one task — no exchange, one AQE
    # stage-job fewer per DV commit. narrow=False (the _merge_dv
    # schema-evolution fallback, whose cache is not yet materialized):
    # repartition(1) keeps the upstream touched-file scan parallel and
    # moves only the (file, pos) hit rows through the exchange.
    one = posdf.coalesce(1) if narrow else posdf.repartition(1)
    added = _stage_add(one, path, version)
    if len(added) != 1:  # one blob per commit: the dv map points at it
        _unstage(path, added)
        raise SnapshotError(f"expected one dv blob, staged {len(added)}")
    # per-file cardinalities via pyarrow on the single just-staged blob —
    # one driver-local column read (the _collect_stats pattern) instead of
    # a whole Spark job (read + groupBy + collect) per DV commit
    from collections import Counter

    import pyarrow.parquet as pq

    by_base = {os.path.basename(r): r for r in touched}
    fcol = pq.read_table(
        os.path.join(path, added[0]), columns=["file"]
    ).column("file")
    counts = {
        by_base[f]: n
        for f, n in Counter(fcol.to_pylist()).items()
        if f in by_base
    }
    return added[0], counts


def _delete_where_dv(
    spark: SparkSession, path: str, st: _State, matched, touched: list[str],
    version: int, n_rows: int, n_matched: int,
) -> dict:
    """The deletion-vector half of delete_where: publish ONE commit
    whose ``dv`` map re-points every touched file at the staged blob
    (_stage_dv_blob folds in the previous vectors). ``matched`` is the
    caller's PERSISTED single-scan match set (positions computed through
    the current vectors, so re-deleting is idempotent) — the blob stages
    straight from the cache; no file is read twice. Row counts arrive
    from the same pass / the commit log — no extra job."""
    from pyspark.sql import functions as F

    hits = matched.select(
        F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
    )
    blob, dv_rows = _stage_dv_blob(spark, path, st, hits, touched, version)
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "delete_dv",
                "add": [],
                "remove": [],
                "dv": {rel: blob for rel in touched},
                "dv_rows": dv_rows,
                "schema": st.schema_json,
            },
        )
    except SnapshotError:
        _unstage(path, [blob])
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_kept": len(st.live) - len(touched),
        "rows_deleted": n_matched,
        "rows_retained": n_rows - n_matched,
    }


def update_where(
    spark: SparkSession, path: str, assignments: dict, condition,
    dv: bool = False,
) -> dict:
    """UPDATE <table> SET col = expr, ... WHERE <condition> — Delta
    UPDATE semantics as one atomic commit over only the files containing
    a matching row. ``assignments`` maps existing column names to SQL
    expression strings (or Columns) evaluated against the pre-update
    row; each value is CAST to the column's recorded dtype, so an
    expression cannot silently diverge the staged files from the table
    schema. Rows where the condition is NULL are not updated.

    ``dv=False`` (default) is COPY-ON-WRITE: touched files are rewritten
    whole. ``dv=True`` is Delta's DV UPDATE: touched files keep their
    bytes — matched rows are vector-deleted via one position blob and
    re-inserted with their new values as NEW files in the same commit,
    so the write cost is O(updated rows), not O(rows in touched files).

    Returns {version, files_rewritten, files_kept, rows_updated,
    rows_copied} (plus files_dv in dv mode, where files_rewritten and
    rows_copied are 0 by construction); version -1 when nothing matches
    (no commit)."""
    from pyspark.sql import functions as F

    cond = F.expr(condition) if isinstance(condition, str) else condition
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    schema = st.schema
    if schema is None:
        raise SnapshotError("no schema recorded; cannot run predicate DML")
    cols = [f.name for f in schema.fields]
    unknown = [c for c in assignments if c not in cols]
    if unknown:
        raise SnapshotError(f"UPDATE SET columns not in table schema: {unknown}")
    if dv:
        # same single-scan shape as delete_where(dv=True): the cached
        # match set (full rows — the SET expressions evaluate against
        # the pre-update row) feeds both the position blob and the
        # re-inserted files; touched files are never read twice
        touched, matched, n_matched = _matched_live(
            spark, path, st, cond, cols
        )
        try:
            if not touched:
                return {
                    "version": -1, "files_rewritten": 0,
                    "files_kept": len(st.live),
                    "rows_updated": 0, "rows_copied": 0,
                }
            return _update_where_dv(
                spark, path, st, assignments, matched, touched,
                st.latest + 1, n_matched,
            )
        finally:
            matched.unpersist()
    touched, t, n_rows, n_matched = _touched_by_predicate(spark, path, st, cond)
    if not touched:
        return {
            "version": -1, "files_rewritten": 0, "files_kept": len(st.live),
            "rows_updated": 0, "rows_copied": 0,
        }
    version = st.latest + 1
    hit = F.coalesce(cond, F.lit(False))

    def _val(name):
        if name not in assignments:
            return F.col(name)
        expr = assignments[name]
        expr = F.expr(expr) if isinstance(expr, str) else expr
        # cast to the RECORDED dtype: a wider expression type would
        # otherwise stage files the committed schema cannot read
        return F.when(hit, expr.cast(schema[name].dataType)).otherwise(
            F.col(name)
        )

    updated = t.select(*[_val(c).alias(c) for c in cols])
    added = _stage_add(
        _to_physical(_enforce_constraints(updated, st.constraints), schema),
        path,
        version,
    )
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "update_where",
                "add": added,
                "remove": touched,
                "schema": st.schema_json,
                "stats": _collect_stats(path, added),
            },
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_kept": len(st.live) - len(touched),
        "rows_updated": n_matched,
        "rows_copied": n_rows - n_matched,
    }


def _update_where_dv(
    spark: SparkSession, path: str, st: _State, assignments: dict, matched,
    touched: list[str], version: int, n_matched: int,
) -> dict:
    """The deletion-vector UPDATE path: matched rows' physical positions
    go into one blob (touched files keep their bytes) and the updated
    rows are staged as new files — the same one-commit shape as
    _merge_dv, with the SET expressions evaluated against the pre-update
    row (applied unconditionally here: only matched rows reach them).
    ``matched`` is the caller's PERSISTED single-scan match set; both
    the blob and the re-inserts read the cache, never the files."""
    from pyspark.sql import functions as F

    schema = st.schema
    cols = [f.name for f in schema.fields]
    blob = None
    hits = matched.select(
        F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
    )
    blob, dv_rows = _stage_dv_blob(spark, path, st, hits, touched, version)

    def _val(name):
        if name not in assignments:
            return F.col(name)
        expr = assignments[name]
        expr = F.expr(expr) if isinstance(expr, str) else expr
        # cast to the RECORDED dtype, like the copy-on-write path
        return expr.cast(schema[name].dataType)

    updated = matched.select(*[_val(c).alias(c) for c in cols])
    added: list[str] = []
    try:
        added = _stage_add(
            _to_physical(
                _enforce_constraints(updated, st.constraints), schema
            ),
            path,
            version,
        )
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "update_where",
                "add": added,
                "remove": [],
                "dv": {rel: blob for rel in touched},
                "dv_rows": dv_rows,
                "schema": st.schema_json,
                "stats": _collect_stats(path, added),
            },
        )
    except Exception:
        _unstage(path, added + [blob])
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_rewritten": 0,
        "files_dv": len(touched),
        "files_kept": len(st.live),
        "rows_updated": n_matched,
        "rows_copied": 0,
    }


def vacuum(
    path: str, retain_last: int = 2, retain_hours: float | None = None,
    orphan_grace_hours: float = 24.0,
) -> dict:
    """Delete data files referenced ONLY by versions outside the
    retention window (plus stale never-committed orphans). The window
    is the last ``retain_last`` versions; ``retain_hours`` (Delta's
    time-based retention, default 168h there) WIDENS it to also keep
    every version committed within that many hours — the two compose as
    a union, so a burst of CDC commits can never vacuum away an
    hour-old version just because many versions followed it.

    ``orphan_grace_hours`` guards the IN-FLIGHT-WRITE race: every
    committer (write_snapshot, merge, the 2PC Arrow writers) moves its
    finished files into data/ — and stages task output under
    ``.stage-*`` — BEFORE publishing the commit, so a file referenced
    by NO commit is either a crashed write's debris or a commit that
    hasn't landed YET. Files/stage-dirs younger than the grace are
    kept (Delta's vacuum likewise only deletes unreferenced files older
    than its retention, default 7 days, for exactly this race). Moved
    files are utime'd at move time (the grace clock never reflects a
    task's write time, hours earlier on a big job) AND named in a
    stage-dir ``_moved.json`` manifest until their commit publishes —
    manifested files are spared regardless of mtime, so a writer with a
    skewed clock can't lose its in-flight files either. Pass 0 to
    force-sweep when no writer can be live (also ignores manifests).
    Files referenced by SOME commit are retired data with a known
    position — the version window above governs them, not the grace.

    Returns {removed_files, removed_bytes, retained_from_version}."""
    import time as _time

    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    keep_from = max(0, st.latest + 1 - retain_last)
    if retain_hours is not None:
        cutoff = _time.time() - retain_hours * 3600.0
        # oldest version still inside the time window, from the folded
        # stamp list (O(interval) opens on a checkpointed table). An
        # unstamped legacy commit has an UNKNOWABLE wall-clock position:
        # treat it as in-window (kept) — deleting what we cannot date
        # would be the unsafe direction.
        ts = _fold_commit_ts(path, st.latest)
        first_in = st.latest + 1
        for v, t in enumerate(ts):
            if t is None or t >= cutoff:
                first_in = v  # oldest in-window or undatable version
                break
        keep_from = min(keep_from, first_in)
    keep: set[str] = set(st.live) | {
        d for d in st.dv.values() if d is not None
    }
    for v in range(keep_from, st.latest):
        sv = _state(path, v)
        keep |= set(sv.live) | {d for d in sv.dv.values() if d is not None}
    ever_referenced: set[str] = set()
    for c in _read_commits(path):
        ever_referenced |= set(c["add"])
        ever_referenced |= {
            d for d in (c.get("dv") or {}).values() if d is not None
        }
    grace_cutoff = _time.time() - orphan_grace_hours * 3600.0
    manifested = (
        _manifested_files(path) if orphan_grace_hours > 0 else set()
    )
    removed_files = 0
    removed_bytes = 0
    data_dir = os.path.join(path, _DATA)
    for nm in sorted(os.listdir(data_dir)):
        rel = os.path.join(_DATA, nm)
        if rel in keep:
            continue
        full = os.path.join(path, rel)
        if rel not in ever_referenced:
            if rel in manifested:
                # named by a live write's stage manifest: its commit is
                # about to publish — spare it even if its mtime looks
                # old (clock-skewed writer)
                continue
            try:
                if os.path.getmtime(full) >= grace_cutoff:
                    continue  # possible in-flight commit: not ours to sweep
            except OSError:
                continue  # raced its own commit/unstage: leave it alone
        try:
            size = os.path.getsize(full)
            os.remove(full)
        except OSError:
            continue
        removed_bytes += size
        removed_files += 1
    for nm in os.listdir(path):  # never-committed staging leftovers
        if nm.startswith(".stage-"):
            full = os.path.join(path, nm)
            try:
                if os.path.getmtime(full) >= grace_cutoff:
                    continue  # a live 2PC write is staging tasks here
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
    return {
        "removed_files": removed_files,
        "removed_bytes": removed_bytes,
        "retained_from_version": keep_from,
    }


def merge_stream(
    stream_df: DataFrame,
    path: str,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    checkpoint: str | None = None,
    allow_schema_evolution: bool = False,
    dv: bool = False,
):
    """Streaming CDC upsert sink — the Delta `foreachBatch + MERGE`
    pattern: every micro-batch merges into the snapshot table, so the
    table is always a consistent upserted view of the stream (not an
    append log the reader must re-deduplicate).

    Exactly-once story: foreachBatch is AT-LEAST-ONCE under failure (a
    batch can replay after a crash between the merge and the checkpoint
    commit), and the upsert merge is IDEMPOTENT for replays — re-merging
    an identical batch updates matched rows to the values they already
    hold and inserts nothing new — so the final table equals the
    exactly-once result. Delete-mode replays are idempotent ONLY with
    when_not_matched='ignore': under the default 'insert', a replayed
    delete batch matches nothing and would be re-INSERTED, resurrecting
    the deleted rows — so that combination raises here. The
    duplicate-key guard still applies per batch: a batch carrying two
    rows for one key is ambiguous and fails the query rather than
    racing itself.

    The first batch on a fresh path bootstraps the table by committing
    an EMPTY version with the batch schema, then merging — so the dup
    guard and the insert path run uniformly from batch one.

    ``dv=True`` runs every batch's merge in deletion-vector mode (see
    merge_snapshot) — the steady-state CDC posture at 100 TB: each
    micro-batch costs its changed rows, with reorg_purge/compaction as
    the periodic vector-folding maintenance.

    Returns the started StreamingQuery (use trigger/availableNow and
    awaitTermination at the call site via the returned handle).
    """
    import tempfile

    if when_matched == "delete" and when_not_matched == "insert":
        raise SnapshotError(
            "merge_stream(when_matched='delete') requires "
            "when_not_matched='ignore': an at-least-once replayed delete "
            "batch matches nothing and would be re-inserted, resurrecting "
            "the rows it deleted"
        )
    spark = stream_df.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not _log_entries(path)[0]:
            write_snapshot(spark, batch_df.limit(0), path)
        merge_snapshot(
            spark,
            path,
            batch_df,
            on,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            allow_schema_evolution=allow_schema_evolution,
            dv=dv,
        )

    ckpt = checkpoint or tempfile.mkdtemp(prefix="ops_spark_merge_stream_ckpt_")
    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    on: list[str],
) -> DataFrame:
    """Change data feed between two versions — row-level changes with
    Delta-CDF semantics, computed WITHOUT change files: the two live
    sets share every file a commit didn't touch (files are immutable),
    so those cancel by name and the diff reads ONLY the churned files.
    After an incremental merge that is the touched fraction, not the
    table — the property that makes "what changed since the run that
    trained model X" affordable at 100 TB.

    Requires ``on`` to be a unique key in both versions (the CDC table
    shape merge maintains). Rows rewritten byte-unchanged (the copy
    rows of a merge) cancel in the key join. Across a schema evolution
    both sides project through the WIDER version's schema, so pre-images
    null-fill columns that did not exist yet.

    Output: the table columns plus __change ∈
    {'insert', 'delete', 'update_pre', 'update_post'} (updates emit the
    pre- and post-image as two rows, like Delta CDF).
    """
    from pyspark.sql import functions as F

    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    for v in (v_from, v_to):
        if not 0 <= v <= st.latest:
            raise SnapshotError(f"no such version: {v}")
    st_to = st if v_to == st.latest else _state(path, v_to)
    st_from = st if v_from == st.latest else _state(path, v_from)
    # share identity is (file, deletion vector): an immutable file whose
    # DV changed between the versions has DIFFERENT visible rows, so it
    # must be read on BOTH sides (its unchanged rows still cancel in the
    # key join; newly DV-deleted rows surface as deletes)
    a = {(rel, st_from.dv.get(rel)) for rel in st_from.live}
    b = {(rel, st_to.dv.get(rel)) for rel in st_to.live}
    schema = (st_to if v_to >= v_from else st_from).schema
    if schema is None:
        raise SnapshotError("no schema recorded; cannot diff")
    cols = [f.name for f in schema.fields]
    missing = [k for k in on if k not in cols]
    if missing:
        raise SnapshotError(f"diff keys absent from table: {missing}")
    payload = [c for c in cols if c not in on]

    def _side(pairs, dvmap):
        files = sorted(rel for rel, _ in pairs)
        need = {r: dvmap.get(r) for r in files}
        # existence check covers the dv BLOBS this side reads too — a
        # vacuumed blob must surface as the same clean retention error
        # as a vacuumed data file, not a raw path-not-found mid-scan
        wanted = files + sorted({d for d in need.values() if d is not None})
        gone = [f for f in wanted if not os.path.exists(os.path.join(path, f))]
        if gone:
            raise SnapshotError(
                f"{len(gone)} churned files were vacuumed; the diff window "
                "is bounded by the vacuum retention"
            )
        if not files:
            return spark.createDataFrame([], schema)
        return _read_files(spark, path, files, schema, dv=need)

    pre = _side(a - b, st_from.dv).withColumn("__p", F.lit(1)).alias("p")
    post = _side(b - a, st_to.dv).withColumn("__q", F.lit(1)).alias("q")
    cond = None
    for k in on:
        eq = F.col(f"p.{k}") == F.col(f"q.{k}")
        cond = eq if cond is None else (cond & eq)
    j = pre.join(post, cond, "full_outer")
    p_here = F.col("p.__p").isNotNull()
    q_here = F.col("q.__q").isNotNull()
    if payload:
        changed = ~(
            F.struct(*[F.col(f"p.{c}") for c in payload]).eqNullSafe(
                F.struct(*[F.col(f"q.{c}") for c in payload])
            )
        )
    else:
        changed = F.lit(False)  # key-only table: a matched key is a copy
    # Both change rows come from ONE execution of the full-outer join:
    # the former pre_rows UNION post_rows was two filters over the same
    # join subtree, which planned (and ran) the churned-file read + join
    # twice per consumer. Each joined row now emits its 0-2 change rows
    # through a single explode — copy rows produce an empty array and
    # vanish inside the generate.
    pre_struct = F.when(
        p_here & (~q_here | (q_here & changed)),
        F.struct(
            *[F.col(f"p.{c}").alias(c) for c in cols],
            F.when(q_here, F.lit("update_pre"))
            .otherwise(F.lit("delete"))
            .alias("__change"),
        ),
    )
    post_struct = F.when(
        q_here & (~p_here | (p_here & changed)),
        F.struct(
            *[F.col(f"q.{c}").alias(c) for c in cols],
            F.when(p_here, F.lit("update_post"))
            .otherwise(F.lit("insert"))
            .alias("__change"),
        ),
    )
    return j.select(
        F.explode(
            F.filter(
                F.array(pre_struct, post_struct), lambda x: x.isNotNull()
            )
        ).alias("__r")
    ).select("__r.*")


def aggregate_snapshot(
    spark: SparkSession,
    path: str,
    group_by: list[str],
    sums: dict[str, str],
    version: int | None = None,
) -> DataFrame:
    """Full grouped aggregate of one version: ``group_by`` columns,
    ``n_rows`` count, and per ``sums`` {out_name: source column} a SUM
    column plus its non-null count ``nn_<out>``. The count is what lets
    incremental maintenance preserve SUM's null semantics exactly: SUM
    is NULL iff zero non-null inputs remain, a fact signed deltas alone
    cannot recover (an all-NULL group and a sums-to-zero group are
    indistinguishable without it). This is the bootstrap (and the
    ground truth) for incremental_aggregate's maintained state."""
    from pyspark.sql import functions as F

    df = read_snapshot(spark, path, version=version)
    return df.groupBy(*group_by).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(src).alias(out) for out, src in sums.items()],
        *[F.count(src).alias(f"nn_{out}") for out, src in sums.items()],
    )


def incremental_aggregate(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    on: list[str],
    group_by: list[str],
    sums: dict[str, str],
    state: DataFrame,
) -> DataFrame:
    """Incremental view maintenance over the change data feed: advance a
    SUM/COUNT aggregate ``state`` (the aggregate_snapshot shape, valid
    as of ``v_from``) to ``v_to`` by applying signed deltas from
    snapshot_diff — post-images and inserts add, pre-images and deletes
    subtract. At CDC posture this reads only the CHURNED files between
    the two versions (snapshot_diff's file-set cancellation), not the
    table: maintaining a 100 TB rollup costs the batch, not the corpus.

    Exact for SUM and COUNT (the self-inverting aggregates; MIN/MAX are
    not maintainable from deltas alone and are deliberately absent) —
    including SUM's null semantics: each sum carries a maintained
    non-null count ``nn_<out>``, and a group whose count reaches zero
    gets SUM = NULL, matching the full recompute (coalescing to 0 there
    would silently diverge an all-NULL group). Group keys join
    null-safely, groups whose row count reaches zero drop, and groups
    whose keys moved between versions settle on both sides. The result
    is a new state frame — same columns as aggregate_snapshot."""
    from pyspark.sql import functions as F

    missing = [f"nn_{out}" for out in sums if f"nn_{out}" not in state.columns]
    if missing:
        raise SnapshotError(
            f"state frame lacks maintained non-null count column(s) "
            f"{missing}: the aggregate state format gained nn_<out> "
            "columns (they carry SUM's null semantics, which signed "
            "deltas alone cannot recover) — re-run aggregate_snapshot at "
            "the state's version to bootstrap a current-format state"
        )
    diff = snapshot_diff(spark, path, v_from, v_to, on=on)
    sign = F.when(
        F.col("__change").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = diff.groupBy(*group_by).agg(
        F.sum(sign).alias("__dn"),
        *[F.sum(sign * F.col(src)).alias(f"__d_{out}") for out, src in sums.items()],
        *[
            F.sum(F.when(F.col(src).isNotNull(), sign).otherwise(F.lit(0)))
            .alias(f"__dnn_{out}")
            for out, src in sums.items()
        ],
    )
    s, d = state.alias("s"), deltas.alias("d")
    cond = None
    for g in group_by:
        eq = F.col(f"s.{g}").eqNullSafe(F.col(f"d.{g}"))
        cond = eq if cond is None else (cond & eq)
    j = s.join(d, cond, "full_outer")
    zero = F.lit(0)

    def _nn(out_c):
        return F.coalesce(F.col(f"s.nn_{out_c}"), zero) + F.coalesce(
            F.col(f"d.__dnn_{out_c}"), zero
        )

    out = j.select(
        *[F.coalesce(F.col(f"s.{g}"), F.col(f"d.{g}")).alias(g) for g in group_by],
        (F.coalesce(F.col("s.n_rows"), zero) + F.coalesce(F.col("d.__dn"), zero))
        .alias("n_rows"),
        *[
            F.when(
                _nn(out_c) > 0,
                F.coalesce(F.col(f"s.{out_c}"), zero)
                + F.coalesce(F.col(f"d.__d_{out_c}"), zero),
            ).alias(out_c)  # zero non-null inputs left → NULL, like SUM
            for out_c in sums
        ],
        *[_nn(out_c).alias(f"nn_{out_c}") for out_c in sums],
    )
    return out.filter(F.col("n_rows") > 0)


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_file_bytes: int | None = None,
    sort_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> dict:
    """OPTIMIZE for snapshot tables: bin-pack the CURRENT version's
    undersized live files into ~target_bytes replacements and publish
    ONE commit (add packed, remove packed-away) — a pure layout change,
    so the data is identical, readers are never torn (they fold the
    log), and time travel still reaches the pre-compaction layout until
    vacuum. Files at or above ``min_file_bytes`` (default
    target_bytes/2) keep their name and bytes: rewrite I/O tracks the
    small-file fraction, exactly like compact_parquet on bare
    directories — this is the commit-log-aware sibling the streaming
    merge sink needs (per-batch merges mint small files continuously).

    ``sort_by`` re-CLUSTERS the packed rows (range-repartition + sort
    within files) on the given columns — every packed file then covers
    a tight ``sort_by`` range, so the per-file min/max recorded into the
    commit's stats makes BOTH the merge's find-touched pruning and
    read-side ``key_range`` skipping effective again after many
    random-key merges have smeared each file across the key space (the
    stats are only as selective as the physical clustering). But a
    linear sort is selective on the LEADING key only; after merges keyed
    on several dimensions, ``zorder_by=(colA, colB)`` — Delta's OPTIMIZE
    ZORDER BY for the commit-log world — clusters along the Morton curve
    (operators/analytics.py:zorder_cluster) so the commit-log stats stay
    selective on BOTH columns at once. Mutually exclusive with sort_by.

    Returns {version, files_before, files_after, rewritten_files,
    rewritten_bytes}; version -1 = nothing worth packing (no commit).
    """
    import math

    if sort_by and zorder_by:
        raise SnapshotError("sort_by and zorder_by are mutually exclusive")
    if min_file_bytes is None:
        min_file_bytes = target_bytes // 2
    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    version = st.latest + 1
    live = st.live
    sizes = {f: os.path.getsize(os.path.join(path, f)) for f in live}
    small = sorted(f for f, sz in sizes.items() if sz < min_file_bytes)
    small_bytes = sum(sizes[f] for f in small)
    n = max(1, math.ceil(small_bytes / target_bytes))
    if n >= len(small):  # packing cannot reduce the file count
        return {
            "version": -1, "files_before": len(live),
            "files_after": len(live), "rewritten_files": 0,
            "rewritten_bytes": 0,
        }
    schema = st.schema
    df = _read_files(spark, path, small, schema, dv=st.dv)
    if sort_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_by]
        df = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    elif zorder_by:
        from ops_spark.operators.analytics import zorder_cluster

        df = zorder_cluster(df, n, *zorder_by)
    else:
        df = df.repartition(n)
    added = _stage_add(_to_physical(df, schema), path, version)
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "compact",
                "add": added,
                "remove": small,
                **({"schema": schema.json()} if schema is not None else {}),
                "stats": _collect_stats(path, added),
            },
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_before": len(live),
        "files_after": len(live) - len(small) + len(added),
        "rewritten_files": len(small),
        "rewritten_bytes": small_bytes,
    }


def reorg_purge(
    spark: SparkSession, path: str, min_deleted_ratio: float = 0.05,
) -> dict:
    """Delta's ``REORG TABLE ... APPLY (PURGE)`` for snapshot tables:
    rewrite ONLY the live files whose deletion-vector fraction reaches
    ``min_deleted_ratio``, dropping their deleted rows and shedding
    their vectors — the periodic maintenance that keeps the DV read tax
    (anti-join work + blob bytes) bounded under a steady point-delete /
    dv-CDC workload WITHOUT paying a full compaction. Lightly-deleted
    files keep their bytes and vectors.

    The rewrite is visible-row-IDENTICAL (purged rows were already
    invisible), so this is a pure layout commit like compact: readers
    are never torn, snapshot_diff across it is empty, and time travel
    still reaches the pre-purge layout until vacuum. Per-file deleted
    counts come from the commit log's vector CARDINALITIES
    (``dv_rows``, recorded at DV-write time — zero data I/O for the
    decision), falling back to one distributed scan of the applied
    vectors only for legacy dv commits written before cardinalities;
    totals from the commit-log stats, with a driver footer read only
    for legacy files the log has no row count for.

    Returns {version, files_purged, rows_dropped, files_kept,
    counts_from ('log' | 'scan')}; version -1 when no file crosses the
    threshold (no commit)."""
    from pyspark.sql import functions as F

    st = _state(path)
    if st is None:
        raise SnapshotError(f"not a snapshot table: {path}")
    need = {
        os.path.basename(f): st.dv[f]
        for f in st.live
        if st.dv.get(f) is not None
    }
    if not need:
        return {"version": -1, "files_purged": 0, "rows_dropped": 0,
                "files_kept": len(st.live), "counts_from": "log"}
    by_base = {os.path.basename(f): f for f in st.live}
    if all(by_base[b] in st.dv_rows for b in need):
        counts_from = "log"
        deleted = {b: st.dv_rows[by_base[b]] for b in need}
    else:  # legacy dv commits without cardinality: count the vectors
        counts_from = "scan"
        deleted = {
            r["file"]: r["n"]
            for r in _dv_applied(spark, path, need)
            .groupBy("file").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def _rows(rel: str) -> int | None:
        entry = st.stats.get(rel)
        if entry is not None and entry.get("rows") is not None:
            return entry["rows"]
        import pyarrow.parquet as pq

        try:
            return pq.ParquetFile(os.path.join(path, rel)).metadata.num_rows
        except Exception:
            return None  # unreadable footer: skip (never purge blind)

    purge, dropped = [], 0
    for base, n_del in sorted(deleted.items()):
        rel = by_base.get(base)
        if rel is None:
            continue
        total = _rows(rel)
        if total and n_del / total >= min_deleted_ratio:
            purge.append(rel)
            dropped += n_del
    if not purge:
        return {"version": -1, "files_purged": 0, "rows_dropped": 0,
                "files_kept": len(st.live), "counts_from": counts_from}
    version = st.latest + 1
    schema = st.schema
    df = _read_files(spark, path, purge, schema, dv=st.dv)
    added = _stage_add(
        _to_physical(df.repartition(len(purge)), schema), path, version
    )
    try:
        _atomic_commit(
            path,
            {
                "version": version,
                "op": "reorg_purge",
                "add": added,
                "remove": purge,  # removed files shed their vectors
                **({"schema": schema.json()} if schema is not None else {}),
                "stats": _collect_stats(path, added),
            },
        )
    except SnapshotError:
        _unstage(path, added)
        raise
    _maybe_checkpoint(path, version)
    return {
        "version": version,
        "files_purged": len(purge),
        "rows_dropped": dropped,
        "files_kept": len(st.live) - len(purge),
        "counts_from": counts_from,
    }
