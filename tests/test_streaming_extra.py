"""Streaming MinHash-LSH dedup: batch-equality + cross-batch state.

The streaming operator's contract (streaming/lsh_dedup.py) is that its
emitted pair set is arrival-order independent and equal to the batch
LSH candidate generation filtered by the same signature-agreement
threshold — these tests pin both halves."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _batch_pairs_by_agreement(spark, docs, threshold=0.8):
    """Reference: batch LSH candidates filtered by full-signature
    agreement — computed through the BATCH code path (operators/dedup)."""
    from ops_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    cands = minhash_lsh_candidates(docs)
    sigs = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(docs).collect()
    }
    out = set()
    for r in cands.collect():
        a, b = np.array(sigs[r.id_a]), np.array(sigs[r.id_b])
        if (a == b).mean() >= threshold:
            out.add((r.id_a, r.id_b))
    return out


def test_streaming_lsh_dedup_equals_batch_candidates(spark):
    """Same corpus, same hash family: the streamed pair set must equal
    batch minhash_lsh_candidates ∩ (signature agreement >= 0.8). Also
    checks agreement values are exact signature-match fractions."""
    import ops_spark.queries as q

    q.load_all()
    got_df = q.get_query("x_stream_lsh_dedup").builder(spark, SF_SMOKE)
    got_rows = got_df.collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert all(r.id_a < r.id_b for r in got_rows)
    assert all(0.8 <= r.agreement <= 1.0 for r in got_rows)
    # duplicates collapsed: one row per pair
    assert len(got) == len(got_rows)

    from ops_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    want = _batch_pairs_by_agreement(spark, docs, threshold=0.8)
    assert got == want
    assert len(want) > 0  # fixture has planted near-dups


def test_streaming_lsh_dedup_finds_cross_batch_pairs(spark, tmp_path):
    """State really carries across micro-batches: two parquet files
    streamed one per trigger, the near-dup pair split across them must
    be emitted when the SECOND batch arrives."""
    from ops_spark.streaming.lsh_dedup import streaming_lsh_dedup
    from ops_spark.streaming.runner import run_bounded

    base = "the quick brown fox jumps over the lazy dog again and again "
    doc_a = base * 4
    doc_b = base * 4 + "tail bit"  # J high enough that the k=32
    # signature-agreement estimate (deterministic: fixed seed and text,
    # measured 0.84) clears the 0.8 threshold with margin
    other = "completely unrelated text about spark shuffle partitions " * 4
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": [1, 2], "text": [doc_a, other]}).to_parquet(
        os.path.join(d, "part-0.parquet")
    )
    pd.DataFrame({"doc_id": [3], "text": [doc_b]}).to_parquet(
        os.path.join(d, "part-1.parquet")
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_bounded(streaming_lsh_dedup(stream), "append")
    pairs = {(r.id_a, r.id_b) for r in out.select("id_a", "id_b").distinct().collect()}
    assert (1, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_streaming_lsh_state_caps_and_plateaus(spark, tmp_path):
    """max_bucket_state bounds per-bucket state under a hot (boilerplate)
    bucket: 6 micro-batches of exact-duplicate docs land in the same
    buckets; unbounded state would hold all 12 signatures, the cap must
    plateau it at 3 (verified through the statestore reader, not the
    operator's own accounting) while arrivals still pair against the
    retained FIFO window and evicted docs stop matching."""
    from ops_spark.streaming.lsh_dedup import streaming_lsh_dedup
    from ops_spark.streaming.runner import run_bounded

    text = "the quick brown fox jumps over the lazy dog again and again " * 4
    d, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    os.makedirs(d, exist_ok=True)
    for b in range(6):
        pd.DataFrame(
            {"doc_id": [10 * b + 1, 10 * b + 2], "text": [text, text]}
        ).to_parquet(os.path.join(d, f"part-{b}.parquet"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_bounded(
        streaming_lsh_dedup(stream, max_bucket_state=3),
        "append",
        checkpoint=ckpt,
    )
    pairs = {(r.id_a, r.id_b) for r in out.select("id_a", "id_b").distinct().collect()}
    # batch 2's arrivals still see batch 1's doc in the FIFO window...
    assert (1, 11) in pairs
    # ...but by batch 3 doc 1 is evicted (state entering batch 3 is the
    # last-3 window [2, 11, 12]), so it can no longer match
    assert (1, 21) not in pairs and (2, 21) in pairs
    # the plateau, read back from the checkpointed state itself
    state = spark.read.format("statestore").load(ckpt)
    sizes = [len(r["value"]["groupState"]["ids"]) for r in state.collect()]
    assert sizes and max(sizes) <= 3, sizes


def test_streaming_lsh_state_ttl_evicts_idle_buckets(spark, tmp_path):
    """state_ttl_ms: a bucket idle past the TTL is evicted wholesale, so
    a near-dup arriving after the window finds nothing — while the
    cross-batch test above proves pairs ARE found inside the window.
    Three availableNow runs off one checkpoint: seed doc, an unrelated
    batch after the TTL elapses (processing-time timeouts only fire when
    a batch runs), then the late near-dup."""
    import time

    from ops_spark.streaming.lsh_dedup import streaming_lsh_dedup
    from ops_spark.streaming.runner import run_bounded

    base = "the quick brown fox jumps over the lazy dog again and again "
    doc_a, doc_b = base * 4, base * 4 + "tail bit"
    other = "completely unrelated text about spark shuffle partitions " * 4
    d, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    os.makedirs(d, exist_ok=True)

    sink = str(tmp_path / "sink")

    def run_next(batch_id: int, doc_id: int, text: str):
        pd.DataFrame({"doc_id": [doc_id], "text": [text]}).to_parquet(
            os.path.join(d, f"part-{batch_id}.parquet")
        )
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(d)
        out = run_bounded(
            streaming_lsh_dedup(stream, state_ttl_ms=500),
            "append",
            checkpoint=ckpt,  # resumed each run → durable sink required
            sink_path=sink,
            stop_when_idle=True,  # timeout queries never self-terminate
        )
        return {(r.id_a, r.id_b) for r in out.select("id_a", "id_b").collect()}

    assert run_next(0, 1, doc_a) == set()
    time.sleep(1.2)  # let doc_a's buckets pass their 500 ms TTL
    assert run_next(1, 2, other) == set()  # this batch fires the timeouts
    assert run_next(2, 3, doc_b) == set()  # evicted: the near-dup finds nothing
    state = spark.read.format("statestore").load(ckpt)
    retained = {
        i for r in state.collect() for i in r["value"]["groupState"]["ids"]
    }
    assert 1 not in retained, "doc 1's bucket state survived its TTL"


def test_staged_stream_reads_directory_tables(spark, tmp_path):
    """Guard on the silent-zero staging bug: when a table is a parquet
    DIRECTORY (every derived-at-scale table is), the file-stream staging
    must link its part files — a whole-directory symlink streams 0 rows
    while reporting success, which once voided the entire streaming
    family's 100x evidence."""
    import pandas as pd

    from ops_spark.streaming.runner import _staged_dir, run_bounded

    src = tmp_path / "tbl" / "docs.parquet"
    os.makedirs(src)
    pd.DataFrame({"a": [1, 2]}).to_parquet(src / "part-0.parquet")
    pd.DataFrame({"a": [3]}).to_parquet(src / "part-1.parquet")
    staged = _staged_dir(str(tmp_path / "tbl"), "docs")
    stream = spark.readStream.schema("a bigint").parquet(staged)
    out = run_bounded(stream, "append")
    assert {r.a for r in out.collect()} == {1, 2, 3}


def test_streaming_signature_matches_batch_signature(spark):
    """The numpy/hashlib signature must be BIT-IDENTICAL to the Spark
    expression path (same md5-prefix hashes, same affine permutations) —
    the guarantee the pair-set equality test rests on."""
    from ops_spark.operators.dedup import minhash_signatures, permutation_params
    from ops_spark.streaming.lsh_dedup import _signature

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three",
        "x y",  # < n tokens -> absent in batch, None in streaming
        "tab\tand  double  space separated tokens here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch = {r["__id"]: list(r["__sig"]) for r in minhash_signatures(df).collect()}
    params = permutation_params(32)
    for i, t in enumerate(texts):
        py = _signature(t, params, 3)
        if py is None:
            assert i not in batch
        else:
            assert batch[i] == py


def test_snapshot_table_as_streaming_source(spark, tmp_path):
    """Streaming FROM a snapshot table (io/snapshot_stream.py — Delta's
    table-as-source): commit versions are the offsets, each batch reads
    exactly the files its commits ADDED, and checkpoint recovery is
    exactly-once (a continuation run reads ONLY commits landed since the
    checkpoint — pinned by row counts in a durable sink)."""
    import os

    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    for base in range(0, 300, 100):
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")

    sdf = spark.readStream.format("ops_snapshot").option("path", tbl).load()
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    out = run_bounded(sdf, checkpoint=ckpt, sink_path=sink)
    assert out.count() == 300

    for base in (300, 400):  # two more commits land
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")
    sdf2 = spark.readStream.format("ops_snapshot").option("path", tbl).load()
    out2 = run_bounded(sdf2, checkpoint=ckpt, sink_path=sink)
    assert out2.count() == 500  # +200, not a re-read of the first 300
    assert sorted(r.k for r in out2.collect()) == list(range(500))


def test_snapshot_stream_change_modes_and_starting_version(spark, tmp_path):
    """append mode FAILS on a commit that removes files (re-emitting
    rewritten rows would double-count downstream); ignore_changes
    tolerates it and re-emits the rewritten file's rows (Delta's
    ignoreChanges caveat); startingversion tails from a later commit."""
    import pytest as _pytest

    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    for base in range(0, 200, 100):
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")
    S.delete_where(spark, tbl, "k < 50")  # v2: removes + re-adds

    with _pytest.raises(Exception, match="removes files"):
        run_bounded(
            spark.readStream.format("ops_snapshot").option("path", tbl).load(),
            name="snap_append_fail",
        )

    ic = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "ignore_changes")
        .load()
    )
    out = run_bounded(ic, name="snap_ic")
    # 200 original adds + the 50 retained rows of the rewritten file
    assert out.count() == 250

    sv = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "ignore_changes")
        .option("startingversion", "2")
        .load()
    )
    assert run_bounded(sv, name="snap_sv").count() == 50


def test_snapshot_stream_ignore_changes_applies_vectors(spark, tmp_path):
    """A replay/backfill in ignore_changes mode reads added files
    through the END version's deletion vectors: rows a later dv commit
    deleted are never re-emitted raw (ADVICE r10 — unlike copy-on-write,
    a dv commit re-adds no file, so downstream dedup would have nothing
    newer to converge on)."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    for base in (0, 100):
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)],
            "k long, v string",
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")
    S.delete_where(spark, tbl, "k % 10 = 3", dv=True)  # v2: dv only

    ic = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "ignore_changes")
        .load()
    )
    out = run_bounded(ic, name="snap_ic_dv")
    ks = sorted(x.k for x in out.collect())
    assert len(ks) == 180  # deleted rows NOT replayed
    assert not [k for k in ks if k % 10 == 3]


def test_snapshot_stream_cdf_mode(spark, tmp_path):
    """changemode=cdf streams ROW-LEVEL changes (the Delta CDF-stream
    shape, VERDICT r10 #5): append -> dv-delete -> append replays as
    insert rows, exact delete retractions for the newly-vector-deleted
    positions (not the whole vector again), and more inserts — each
    stamped with _change_type/_commit_version. A dv MERGE surfaces as
    delete+insert pairs; copy-on-write rewrites still fail the
    stream."""
    from collections import Counter

    import pytest as _pytest

    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, f"v{i}") for i in range(lo, hi)], "k long, v string"
    )
    S.write_snapshot(spark, mk(0, 100).coalesce(1), tbl)            # v0
    S.delete_where(spark, tbl, "k % 10 = 3", dv=True)               # v1
    S.write_snapshot(spark, mk(100, 150).coalesce(1), tbl,
                     mode="append")                                 # v2
    S.delete_where(spark, tbl, "k % 10 = 3 or k % 10 = 7", dv=True)  # v3

    cdf = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "cdf")
        .load()
    )
    rows = run_bounded(cdf, name="snap_cdf").collect()
    by = Counter((r["_change_type"], r["_commit_version"]) for r in rows)
    assert by[("insert", 0)] == 100 and by[("insert", 2)] == 50
    assert by[("delete", 1)] == 10  # k%10=3 of v0's file
    # v3 newly deletes ONLY the %7 rows of both files (plus %3 of the
    # v2 file) — the %3 positions of v0's file are already in its
    # previous vector and must NOT retract twice
    d3 = sorted(r.k for r in rows
                if r["_change_type"] == "delete" and r["_commit_version"] == 3)
    assert d3 == sorted(
        [k for k in range(100) if k % 10 == 7]
        + [k for k in range(100, 150) if k % 10 in (3, 7)]
    )
    # net state from the change stream == the table
    inserted = {r.k for r in rows if r["_change_type"] == "insert"}
    deleted = {r.k for r in rows if r["_change_type"] == "delete"}
    assert sorted(inserted - deleted) == sorted(
        x.k for x in S.read_snapshot(spark, tbl).collect()
    )

    # dv MERGE replays as delete+insert pairs
    src = spark.createDataFrame([(5, "UPD"), (999, "NEW")], "k long, v string")
    S.merge_snapshot(spark, tbl, src, on=["k"], dv=True)            # v4
    tail = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "cdf")
        .option("startingversion", "4")
        .load()
    )
    trows = run_bounded(tail, name="snap_cdf_tail").collect()
    got = sorted((r["_change_type"], r.k, r.v) for r in trows)
    assert got == [("delete", 5, "v5"), ("insert", 5, "UPD"),
                   ("insert", 999, "NEW")]

    # copy-on-write rewrites are not expressible file-sliced: fail
    S.delete_where(spark, tbl, "k = 1")                             # v5: CoW
    cow = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "cdf")
        .option("startingversion", "5")
        .load()
    )
    with _pytest.raises(Exception, match="snapshot_diff"):
        run_bounded(cow, name="snap_cdf_cow")


def test_snapshot_stream_cdf_guards(spark, tmp_path):
    """cdf-mode refusal edges: a ROLLBACK that clears/restores vectors
    fails the stream (emitting nothing would silently hide resurrected
    rows — vectors only ever grow on the DML paths); a vacuumed
    historical blob fails at PLAN time with the clean retention error;
    a BATCH read rejects changemode up front (its slices could never
    produce the advertised CDF columns)."""
    import pytest as _pytest

    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import SnapshotStreamReader

    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    S.write_snapshot(spark, df.coalesce(1), tbl)        # v0
    S.delete_where(spark, tbl, "k % 10 = 3", dv=True)   # v1
    S.rollback(spark, tbl, 0)                           # v2: clears the dv

    r = SnapshotStreamReader({"path": tbl, "changemode": "cdf"})
    r.initialOffset()
    with _pytest.raises(S.SnapshotError, match="rollback"):
        r.partitions({"version": 1}, {"version": 2})
    # window below the rollback still plans fine
    assert r.partitions({"version": -1}, {"version": 1})

    # retire the blob (rollback keeps the same data files live, so only
    # the v1 blob leaves): a cdf backfill over v1 must fail cleanly
    S.vacuum(tbl, retain_last=1, retain_hours=0.0, orphan_grace_hours=0.0)
    r2 = SnapshotStreamReader({"path": tbl, "changemode": "cdf"})
    r2.initialOffset()
    with _pytest.raises(S.SnapshotError, match="vacuumed"):
        r2.partitions({"version": 0}, {"version": 1})

    from ops_spark.io.snapshot_stream import SnapshotBatchReader

    with _pytest.raises(ValueError, match="STREAMING option"):
        SnapshotBatchReader({"path": tbl, "changemode": "cdf"})


def test_snapshot_stream_max_files_per_trigger(spark, tmp_path):
    """maxfilespertrigger paces a backlogged tail into bounded batches:
    whole commits only, >= 1 commit per trigger, offsets pinned per
    batch, and the end-to-end row set is identical to unpaced."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import (
        SnapshotStreamReader,
        register_snapshot_source,
    )
    from ops_spark.streaming.runner import run_bounded

    tbl = str(tmp_path / "tbl")
    for base in range(0, 500, 100):  # 5 commits x 1 file each
        df = spark.createDataFrame(
            [(base + i,) for i in range(100)], "k long"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")

    # unit level: 2 files per trigger -> versions advance 2 at a time
    r = SnapshotStreamReader({"path": tbl, "maxfilespertrigger": "2"})
    assert r.initialOffset() == {"version": -1}
    ends = []
    for _ in range(4):
        end = r.latestOffset()
        ends.append(end["version"])
        r.commit(end)
    assert ends == [1, 3, 4, 4]  # 2+2+1 commits, then caught up

    # a single commit larger than the cap still admits alone
    r1 = SnapshotStreamReader({"path": tbl, "maxfilespertrigger": "1"})
    r1.initialOffset()
    assert r1.latestOffset() == {"version": 0}

    # end-to-end: paced stream still delivers every row exactly once
    register_snapshot_source(spark)
    paced = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("maxfilespertrigger", "2")
        .load()
    )
    out = run_bounded(paced, name="snap_paced")
    assert sorted(x.k for x in out.collect()) == list(range(500))

    # dv re-points count toward the admission budget: each costs a
    # whole-file read slice in cdf/ignore_changes, so a dv commit
    # touching 3 files must not ride along free
    tbl2 = str(tmp_path / "tbl2")
    for base in range(0, 300, 100):
        S.write_snapshot(
            spark,
            spark.createDataFrame([(base + i,) for i in range(100)], "k long")
            .coalesce(1),
            tbl2, mode="append",
        )
    S.delete_where(spark, tbl2, "k % 100 = 7", dv=True)  # v3: 3 re-points
    r2 = SnapshotStreamReader({"path": tbl2, "maxfilespertrigger": "2"})
    r2.initialOffset()
    ends2 = []
    for _ in range(4):
        end = r2.latestOffset()
        ends2.append(end["version"])
        r2.commit(end)
    # 1+1=2 -> v1; v2 alone (v3's 3 units overflow); v3 admits alone
    assert ends2 == [1, 2, 3, 3]


def test_snapshot_stream_starting_version_beyond_head(spark, tmp_path):
    """startingversion greater than the current head holds the offset at
    start-1 (never plans end < start) and, once the log catches up,
    emits ONLY commits >= startingversion — commits below it written
    later never leak in (Delta's startingVersion contract)."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import SnapshotStreamReader

    tbl = str(tmp_path / "tbl")
    for base in (0, 100):  # versions 0, 1
        df = spark.createDataFrame([(base + i,) for i in range(10)], "k long")
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")

    r = SnapshotStreamReader({"path": tbl, "startingversion": "4"})
    start = r.initialOffset()
    assert start == {"version": 3}
    assert r.latestOffset() == {"version": 3}  # clamped: no end < start

    for base in (200, 300, 400):  # versions 2, 3, 4 land
        df = spark.createDataFrame([(base + i,) for i in range(10)], "k long")
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")
    end = r.latestOffset()
    assert end == {"version": 4}
    parts = r.partitions(start, end)
    # exactly the ONE file added by commit 4 — nothing below leaked
    assert len(parts) == 1 and "v4-" in parts[0].abs_path


def test_snapshot_batch_datasource(spark, tmp_path):
    """spark.read.format('ops_snapshot'): batch reads match
    read_snapshot, versionasof/timestampasof time travel works, filter
    pushdown prunes files from the commit-log stats (driver-side), and
    column mapping surfaces the renamed logical name."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import (
        SnapshotBatchReader,
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    for base in range(0, 400, 100):  # 4 disjoint-range commits, 1 file each
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")

    out = spark.read.format("ops_snapshot").option("path", tbl).load()
    assert out.count() == 400
    assert sorted(r.k for r in out.collect()) == list(range(400))

    v1 = spark.read.format("ops_snapshot").option("path", tbl) \
        .option("versionasof", "1").load()
    assert v1.count() == 200  # time travel

    ts1 = S.history(tbl)[1]["ts"]
    t1 = spark.read.format("ops_snapshot").option("path", tbl) \
        .option("timestampasof", str(ts1)).load()
    assert t1.count() == 200

    # pushdown pruning: a k <= 150 filter keeps only the 2 intersecting
    # files (unit level — partitions(); end-to-end rows stay exact)
    from pyspark.sql.datasource import LessThanOrEqual

    r = SnapshotBatchReader({"path": tbl})
    assert len(r.partitions()) == 4
    rf = SnapshotBatchReader({"path": tbl})
    back = rf.pushFilters([LessThanOrEqual(("k",), 150)])
    assert list(back)  # every filter still evaluated by Spark post-scan
    assert len(rf.partitions()) == 2
    got = out.filter("k <= 150")
    assert sorted(x.k for x in got.collect()) == list(range(151))

    # column mapping: the batch reader surfaces the renamed name
    S.rename_column(spark, tbl, "k", "ident")
    renamed = spark.read.format("ops_snapshot").option("path", tbl).load()
    assert renamed.columns == ["ident", "v"]
    assert renamed.filter("ident = 42").count() == 1
    # ...and pre-rename versions keep the old name
    old = spark.read.format("ops_snapshot").option("path", tbl) \
        .option("versionasof", "1").load()
    assert old.columns == ["k", "v"]


def test_snapshot_batch_writer(spark, tmp_path):
    """df.write.format('ops_snapshot'): task-staged 2PC into the commit
    log — append creates/extends the table (schema evolution included),
    overwrite replaces it, results are identical to write_snapshot's,
    and the written table round-trips through read_snapshot, the batch
    reader, and time travel. Column-mapped tables stage PHYSICAL names."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")

    d = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    ).repartition(4)
    d.write.format("ops_snapshot").option("path", tbl).mode("append").save()
    assert S.latest_version(tbl) == 0
    assert S.read_snapshot(spark, tbl).count() == 100

    # second append -> version 1; stats recorded so merges can prune
    spark.createDataFrame([(100, "x")], "k long, v string") \
        .write.format("ops_snapshot").option("path", tbl).mode("append").save()
    st = S._state(tbl)
    assert st.latest == 1 and len(st.stats) >= 2

    # schema evolution on append: new column, old rows null-fill
    spark.createDataFrame([(200, "y", 9)], "k long, v string, extra long") \
        .write.format("ops_snapshot").option("path", tbl).mode("append").save()
    cur = S.read_snapshot(spark, tbl)
    assert cur.columns == ["k", "v", "extra"]
    assert cur.where("extra IS NOT NULL").count() == 1

    # overwrite replaces data + schema; old versions stay travelable
    spark.createDataFrame([(1, 2.5)], "a long, b double") \
        .write.format("ops_snapshot").option("path", tbl).mode("overwrite").save()
    assert S.read_snapshot(spark, tbl).columns == ["a", "b"]
    assert S.read_snapshot(spark, tbl, version=1).count() == 101

    # column mapping: writes through the standard API stage PHYSICAL
    # names — rename, append via the writer, read back logically
    t2 = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "k long, v string") \
        .write.format("ops_snapshot").option("path", t2).mode("append").save()
    S.rename_column(spark, t2, "k", "ident")
    spark.createDataFrame([(2, "b")], "ident long, v string") \
        .write.format("ops_snapshot").option("path", t2).mode("append").save()
    got = spark.read.format("ops_snapshot").option("path", t2).load()
    assert sorted((r.ident, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]

    # CHECK constraints reject the Arrow write path with a pointer
    S.add_constraint(spark, t2, "pos", "ident > 0")
    import pytest as _pytest

    with _pytest.raises(Exception, match="write_snapshot"):
        spark.createDataFrame([(3, "c")], "ident long, v string") \
            .write.format("ops_snapshot").option("path", t2).mode("append").save()


def test_snapshot_stream_writer_sink(spark, tmp_path):
    """writeStream.format('ops_snapshot'): each micro-batch lands as ONE
    txn-stamped append commit; a checkpointed continuation appends only
    the new input; a REPLAYED batch id is a no-op (Delta's
    txnAppId/txnVersion idempotence) — no duplicate rows, no commit."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import (
        SnapshotStreamWriter,
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    src, tbl = str(tmp_path / "in"), str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def feed(base):
        spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("k long, v string").parquet(src)
            .writeStream.format("ops_snapshot")
            .option("path", tbl)
            .option("txnappid", "sinkA")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed(0)
    feed(100)
    run()
    assert S.read_snapshot(spark, tbl).count() == 200
    hist = S.history(tbl)
    assert all(h["op"] == "append" for h in hist)

    # continuation from the checkpoint: only the NEW file lands
    feed(200)
    run()
    assert S.read_snapshot(spark, tbl).count() == 300
    assert sorted(r.k for r in S.read_snapshot(spark, tbl).collect()) == list(
        range(300)
    )

    # replay idempotence: committing an ALREADY-LANDED batch id again is
    # a no-op — no new version, no rows (the restart-replay path)
    v_before = S.latest_version(tbl)
    w = SnapshotStreamWriter(
        {"path": tbl, "txnappid": "sinkA"},
        S.read_snapshot(spark, tbl).schema,
    )
    w.commit([], batchId=0)  # far below the newest stamp for sinkA
    assert S.latest_version(tbl) == v_before
    # ...but a DIFFERENT app with the same batch id is independent
    w2 = SnapshotStreamWriter(
        {"path": tbl, "txnappid": "sinkB"},
        S.read_snapshot(spark, tbl).schema,
    )
    w2.commit([], batchId=0)
    assert S.latest_version(tbl) == v_before + 1  # empty append commit


def test_snapshot_stream_projects_through_evolved_schema(spark, tmp_path):
    """A batch projects its files through the schema of the batch's END
    version: files written before a schema evolution null-fill the
    appended column, exactly like the batch read path."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    S.write_snapshot(
        spark, spark.createDataFrame([(1, "a")], "k long, v string"), tbl
    )
    S.write_snapshot(
        spark,
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, w double"),
        tbl,
        mode="append",
    )
    sdf = spark.readStream.format("ops_snapshot").option("path", tbl).load()
    assert [f.name for f in sdf.schema.fields] == ["k", "v", "w"]
    got = {r.k: (r.v, r.w) for r in run_bounded(sdf, name="snap_evo").collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def _arrow_kv(rows):
    """[(k, v), ...] -> one pyarrow RecordBatch matching 'k long, v string'."""
    import pyarrow as pa

    return pa.record_batch({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.string()),
    })


def test_snapshot_batch_writer_constraint_rejects_overwrite(spark, tmp_path):
    """ADVICE r9 (high): a constrained table rejects the Arrow write path
    for OVERWRITE too, not just append — constraints persist in folded
    state across overwrite commits, so letting mode('overwrite') through
    unvalidated would land unchecked rows in a still-constrained table
    (write_snapshot enforces CHECK on every mode; Delta does too)."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    S.write_snapshot(spark, spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    S.add_constraint(spark, tbl, "pos", "k > 0")

    with pytest.raises(Exception, match="write_snapshot"):
        spark.createDataFrame([(-5, "bad")], "k long, v string") \
            .write.format("ops_snapshot").option("path", tbl) \
            .mode("overwrite").save()
    # nothing landed: same version, same rows, constraint still folded
    assert S.latest_version(tbl) == 1
    assert [(r.k, r.v) for r in S.read_snapshot(spark, tbl).collect()] == [(1, "a")]
    assert S._state(tbl).constraints  # still enforced for future writes

    # and write_snapshot overwrite still enforces the constraint itself
    with pytest.raises(Exception, match="CHECK constraint"):
        S.write_snapshot(
            spark, spark.createDataFrame([(-5, "bad")], "k long, v string"),
            tbl, mode="overwrite",
        )


def test_snapshot_batch_writer_interloper_commits(spark, tmp_path):
    """ADVICE r9 (medium): the Arrow writer's commit anchors at the
    PLANNING-time version, so a commit landing between planning and
    commit() is never silently absorbed —
    - overwrite: fails fast (its remove set is the planning-time live
      set; absorbing would leave the interloper's files alive through
      the 'overwrite') and un-stages,
    - append under a schema-CHANGING interloper: ConcurrentWriteConflict
      (committing our stale schema would erase the new column),
    - append under a benign same-schema interloper: rebases — both land.
    """
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import SnapshotBatchWriter

    tbl = str(tmp_path / "tbl")
    kv = "k long, v string"
    d = lambda rows: spark.createDataFrame(rows, kv)  # noqa: E731
    S.write_snapshot(spark, d([(1, "a")]), tbl)
    schema = d([(1, "a")]).schema

    # --- overwrite vs interloper append: fail fast, stage cleaned up
    w = SnapshotBatchWriter({"path": tbl}, schema, overwrite=True)
    msg = w.write(iter([_arrow_kv([(100, "ow")])]))
    S.write_snapshot(spark, d([(2, "interloper")]), tbl, mode="append")
    with pytest.raises(S.CommitRaceLost):
        w.commit([msg])
    assert S.latest_version(tbl) == 1
    got = sorted((r.k, r.v) for r in S.read_snapshot(spark, tbl).collect())
    assert got == [(1, "a"), (2, "interloper")]  # interloper intact

    # --- append vs schema-changing interloper: real conflict
    w2 = SnapshotBatchWriter({"path": tbl}, schema, overwrite=False)
    msg2 = w2.write(iter([_arrow_kv([(3, "stale")])]))
    S.write_snapshot(
        spark,
        spark.createDataFrame([(9, "z", 1.5)], "k long, v string, extra double"),
        tbl, mode="append",
    )
    with pytest.raises(S.ConcurrentWriteConflict, match="schema"):
        w2.commit([msg2])
    cur = S.read_snapshot(spark, tbl)
    assert cur.columns == ["k", "v", "extra"]  # evolved column survived
    assert cur.count() == 3

    # --- append vs benign same-schema interloper: rebase, both land
    evolved = cur.schema
    w3 = SnapshotBatchWriter({"path": tbl}, evolved, overwrite=False)
    import pyarrow as pa

    b3 = pa.record_batch({
        "k": pa.array([50], pa.int64()),
        "v": pa.array(["mine"], pa.string()),
        "extra": pa.array([2.5], pa.float64()),
    })
    msg3 = w3.write(iter([b3]))
    S.write_snapshot(
        spark, spark.createDataFrame([(60, "theirs", 3.5)], cur.schema),
        tbl, mode="append",
    )
    w3.commit([msg3])  # rebases past the benign append
    rows = {r.k: r.v for r in S.read_snapshot(spark, tbl).collect()}
    assert rows[50] == "mine" and rows[60] == "theirs"
    # no unreferenced files anywhere (every loser un-staged)
    referenced = set()
    for c in S._read_commits(tbl):
        referenced |= {os.path.basename(f) for f in c["add"]}
    assert set(os.listdir(os.path.join(tbl, "data"))) <= referenced


def test_snapshot_stream_writer_interloper_commits(spark, tmp_path):
    """ADVICE r9 (medium), sink half: each micro-batch commit anchors at
    the version the sink last saw, so an interloping schema change
    raises ConcurrentWriteConflict instead of being absorbed under the
    sink's stale schema; a benign same-schema append rebases and both
    survive; the sink's own commits advance the anchor (no rebase walk
    over its own history)."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import SnapshotStreamWriter

    tbl = str(tmp_path / "tbl")
    kv = "k long, v string"
    S.write_snapshot(spark, spark.createDataFrame([(1, "a")], kv), tbl)
    w = SnapshotStreamWriter(
        {"path": tbl, "txnappid": "appI"},
        spark.createDataFrame([(1, "a")], kv).schema,
    )
    # batch 0 commits normally
    w.commit([w.write(iter([_arrow_kv([(10, "b0")])]))], batchId=0)
    assert S.latest_version(tbl) == 1

    # benign interloper append between batches: batch 1 rebases past it
    S.write_snapshot(
        spark, spark.createDataFrame([(99, "ext")], kv), tbl, mode="append"
    )
    before = S.LOG_COMMIT_READS
    w.commit([w.write(iter([_arrow_kv([(11, "b1")])]))], batchId=1)
    rows = {r.k: r.v for r in S.read_snapshot(spark, tbl).collect()}
    assert rows[11] == "b1" and rows[99] == "ext"
    # anchor advanced: the rebase walk covered the ONE interloper, not
    # the sink's whole history (txn scan + state fold dominate reads)
    assert S.LOG_COMMIT_READS - before < 20

    # schema-changing interloper: the next batch is a REAL conflict
    S.write_snapshot(
        spark,
        spark.createDataFrame([(7, "w", 0.5)], "k long, v string, extra double"),
        tbl, mode="append",
    )
    with pytest.raises(S.ConcurrentWriteConflict, match="schema"):
        w.commit([w.write(iter([_arrow_kv([(12, "b2")])]))], batchId=2)
    cur = S.read_snapshot(spark, tbl)
    assert cur.columns == ["k", "v", "extra"]  # evolution preserved
    assert 12 not in {r.k for r in cur.collect()}


def test_snapshot_stream_writer_txn_scan_stops_at_checkpoint(spark, tmp_path):
    """ADVICE r9 (low): the exactly-once replay check folds the
    newest-txn-per-app map into checkpoints, so a sink starting on a
    long-lived table reads O(commits since the last checkpoint), not
    O(total commits) — and a stamp BELOW the checkpoint is still found
    (from the folded map), keeping replay idempotence exact."""
    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import SnapshotStreamWriter

    tbl = str(tmp_path / "tbl")
    kv = "k long, v string"
    schema = spark.createDataFrame([(1, "a")], kv).schema
    old = S.CHECKPOINT_INTERVAL
    S.CHECKPOINT_INTERVAL = 5
    try:
        S.write_snapshot(spark, spark.createDataFrame([(0, "seed")], kv), tbl)
        # app 'early' stamps batch 3 at version 1, far below the head
        w_early = SnapshotStreamWriter({"path": tbl, "txnappid": "early"}, schema)
        w_early.commit([w_early.write(iter([_arrow_kv([(1, "e")])]))], batchId=3)
        for i in range(12):  # bury it under 12 commits (checkpoints at 5, 10)
            S.write_snapshot(
                spark, spark.createDataFrame([(100 + i, "x")], kv), tbl,
                mode="append",
            )
        assert S._log_entries(tbl)[1]  # at least one checkpoint exists

        before = S.LOG_COMMIT_READS
        w = SnapshotStreamWriter({"path": tbl, "txnappid": "early"}, schema)
        got = w._last_committed_batch()
        reads = S.LOG_COMMIT_READS - before
        assert got == 3  # found via the checkpoint's folded txn map
        # scan stopped at the newest checkpoint: strictly fewer commit
        # opens than the 14 commits in the log (init's _state replay also
        # starts at the checkpoint, so the TOTAL stays bounded)
        assert reads < 14
        # replay of batch <= 3 is a no-op for 'early'
        v = S.latest_version(tbl)
        w.commit([], batchId=3)
        assert S.latest_version(tbl) == v
        # a fresh app on the same long table: None, still bounded reads
        w2 = SnapshotStreamWriter({"path": tbl, "txnappid": "fresh"}, schema)
        before2 = S.LOG_COMMIT_READS
        assert w2._last_committed_batch() is None
        assert S.LOG_COMMIT_READS - before2 < 14
    finally:
        S.CHECKPOINT_INTERVAL = old


def test_snapshot_batch_reader_in_filter_exact_pruning(spark, tmp_path):
    """VERDICT r9 #7: IN-list pushdown prunes per-file against the
    ACTUAL value set, not just the [min,max] hull — IN (5, 350) over
    four 100-wide files keeps only the two files a listed value can
    fall into, where the hull would keep all four. Rows stay exact
    (every filter is still re-evaluated post-scan)."""
    from pyspark.sql.datasource import EqualTo, In

    import ops_spark.io.snapshots as S
    from ops_spark.io.snapshot_stream import (
        SnapshotBatchReader,
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    tbl = str(tmp_path / "tbl")
    for base in range(0, 400, 100):  # 4 disjoint-range files
        df = spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(100)], "k long, v string"
        )
        S.write_snapshot(spark, df.coalesce(1), tbl, mode="append")

    # sparse IN list spanning the table: hull [5, 350] keeps all 4
    # files; the exact value set prunes the two middle ones
    r = SnapshotBatchReader({"path": tbl})
    back = r.pushFilters([In(("k",), (5, 350))])
    assert list(back)  # Spark still evaluates the IN post-scan
    kept = [p.abs_path for p in r.partitions()]
    assert len(kept) == 2
    assert any("v0-" in p for p in kept) and any("v3-" in p for p in kept)

    # AND of two IN filters intersects the sets: {5,350} ∩ {350,399} = {350}
    r2 = SnapshotBatchReader({"path": tbl})
    r2.pushFilters([In(("k",), (5, 350)), In(("k",), (350, 399))])
    kept2 = [p.abs_path for p in r2.partitions()]
    assert len(kept2) == 1 and "v3-" in kept2[0]

    # contradictory filters (empty intersection) prune EVERYTHING —
    # one explicit empty slice, zero file reads
    r3 = SnapshotBatchReader({"path": tbl})
    r3.pushFilters([In(("k",), (5,)), In(("k",), (350,))])
    parts3 = r3.partitions()
    assert len(parts3) == 1 and parts3[0].abs_path is None

    # IN composes with a comparison bound on the same column
    r4 = SnapshotBatchReader({"path": tbl})
    r4.pushFilters([In(("k",), (5, 350)), EqualTo(("k",), 350)])
    kept4 = [p.abs_path for p in r4.partitions()]
    assert len(kept4) == 1 and "v3-" in kept4[0]

    # end-to-end rows are exact through the DataFrame API
    out = spark.read.format("ops_snapshot").option("path", tbl).load() \
        .filter("k IN (5, 350)")
    assert sorted(x.k for x in out.collect()) == [5, 350]
