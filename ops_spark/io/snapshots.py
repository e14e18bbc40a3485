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

Scale notes: the log is O(commits) JSON files of O(files-per-commit)
entries; fold cost is driver-side and tiny next to a 100 TB scan. For
million-commit tables real formats checkpoint the fold — out of scope
here, single pipeline tables see thousands of commits, not millions.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


class SnapshotError(RuntimeError):
    pass


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
    return out


def _live_files(commits: list[dict], version: int) -> list[str]:
    live: set[str] = set()
    for c in commits[: version + 1]:
        live -= set(c["remove"])
        live |= set(c["add"])
    return sorted(live)


def _atomic_commit(path: str, commit: dict) -> None:
    """Exclusive commit: link(2) fails with EEXIST if the version file
    already exists, so a concurrent writer loses cleanly instead of
    silently overwriting the log."""
    os.makedirs(_log_dir(path), exist_ok=True)
    final = _commit_path(path, commit["version"])
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(commit, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise SnapshotError(
            f"concurrent commit: version {commit['version']} already exists"
        ) from exc
    finally:
        os.unlink(tmp)


def history(path: str) -> list[dict]:
    """The commit log, oldest first: [{version, op, n_add, n_remove}, …]."""
    return [
        {
            "version": c["version"],
            "op": c["op"],
            "n_add": len(c["add"]),
            "n_remove": len(c["remove"]),
        }
        for c in _read_commits(path)
    ]


def latest_version(path: str) -> int:
    commits = _read_commits(path)
    if not commits:
        raise SnapshotError(f"not a snapshot table: {path}")
    return commits[-1]["version"]


def write_snapshot(
    spark: SparkSession, df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new version. mode='append' adds files;
    mode='overwrite' adds files and removes every previously-live file
    (logically — bytes stay for time travel until vacuum). Returns the
    committed version.

    Write path: stage through Spark's own committer into a scratch dir
    (so executor-side task retries stay exactly-once), move the finished
    parts into data/ under version-unique names, then publish with one
    exclusive commit. A crash before the commit leaves only unreferenced
    files — invisible to every reader, swept by vacuum.
    """
    if mode not in ("append", "overwrite"):
        raise SnapshotError(f"unsupported mode: {mode}")
    commits = _read_commits(path)
    version = len(commits)
    data_dir = os.path.join(path, _DATA)
    os.makedirs(data_dir, exist_ok=True)

    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    added = []
    for nm in sorted(os.listdir(stage)):
        if nm.endswith(".parquet") and not nm.startswith("."):
            rel = os.path.join(_DATA, f"v{version}-{uuid.uuid4().hex[:8]}-{nm}")
            os.rename(os.path.join(stage, nm), os.path.join(path, rel))
            added.append(rel)
    shutil.rmtree(stage, ignore_errors=True)

    removed = _live_files(commits, version - 1) if (mode == "overwrite" and commits) else []
    try:
        _atomic_commit(
            path,
            {"version": version, "op": mode, "add": added, "remove": removed},
        )
    except SnapshotError:
        for rel in added:  # lost the race: un-stage our orphans
            try:
                os.remove(os.path.join(path, rel))
            except OSError:
                pass
        raise
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). The scan gets
    the explicit live-file list — never a directory listing — so
    concurrent stage/commit activity can't tear a read."""
    commits = _read_commits(path)
    if not commits:
        raise SnapshotError(f"not a snapshot table: {path}")
    if version is None:
        version = commits[-1]["version"]
    if not 0 <= version <= commits[-1]["version"]:
        raise SnapshotError(f"no such version: {version}")
    files = _live_files(commits, version)
    missing = [f for f in files if not os.path.exists(os.path.join(path, f))]
    if missing:
        raise SnapshotError(
            f"version {version} was vacuumed ({len(missing)} files gone); "
            "time travel is bounded by the vacuum retention window"
        )
    if not files:
        raise SnapshotError(f"version {version} is empty")
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def rollback(spark: SparkSession, path: str, version: int) -> int:
    """Commit a new version whose live set equals ``version``'s — the
    metadata-only undo (no data I/O, history preserved)."""
    commits = _read_commits(path)
    if not commits:
        raise SnapshotError(f"not a snapshot table: {path}")
    if not 0 <= version <= commits[-1]["version"]:
        raise SnapshotError(f"no such version: {version}")
    new_version = len(commits)
    cur = set(_live_files(commits, new_version - 1))
    want = set(_live_files(commits, version))
    _atomic_commit(
        path,
        {
            "version": new_version,
            "op": f"rollback:{version}",
            "add": sorted(want - cur),
            "remove": sorted(cur - want),
        },
    )
    return new_version


def vacuum(path: str, retain_last: int = 2) -> dict:
    """Delete data files referenced ONLY by versions older than the last
    ``retain_last`` versions (plus any never-committed stage orphans).
    Returns {removed_files, removed_bytes, retained_from_version}."""
    commits = _read_commits(path)
    if not commits:
        raise SnapshotError(f"not a snapshot table: {path}")
    keep_from = max(0, len(commits) - retain_last)
    keep: set[str] = set()
    for v in range(keep_from, len(commits)):
        keep |= set(_live_files(commits, v))
    removed_files = 0
    removed_bytes = 0
    data_dir = os.path.join(path, _DATA)
    for nm in sorted(os.listdir(data_dir)):
        rel = os.path.join(_DATA, nm)
        if rel not in keep:
            full = os.path.join(path, rel)
            removed_bytes += os.path.getsize(full)
            os.remove(full)
            removed_files += 1
    for nm in os.listdir(path):  # never-committed staging leftovers
        if nm.startswith(".stage-"):
            shutil.rmtree(os.path.join(path, nm), ignore_errors=True)
    return {
        "removed_files": removed_files,
        "removed_bytes": removed_bytes,
        "retained_from_version": keep_from,
    }
