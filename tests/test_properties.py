"""Property-based tests over randomized data — the PySpark mirror of the
reference's randomized-expression methodology (reference:
sql/catalyst/src/test/.../RandomDataGenerator.scala, SURVEY §5.5): instead
of golden outputs, each property pins an operator's semantics against an
independent in-Python model on hypothesis-generated inputs.

Kept deliberately small-batch (Spark jobs per example are expensive):
each property draws ONE composite example with many rows, not many tiny
examples — same coverage, two orders of magnitude fewer Spark jobs.
"""

from __future__ import annotations

import itertools

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=12, deadline=None)
@given(rows=_ROWS)
def test_running_sum_matches_accumulate(spark, rows):
    # WindowExec running frame (reference WindowFunctionFrame growing
    # frame) == itertools.accumulate per key on the same ordered list.
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "idx int, k int, v int"
    )
    w = W.partitionBy("k").orderBy("idx")
    got = {
        (r.idx): r.rs
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    model: dict[int, int] = {}
    by_key: dict[int, list] = {}
    for i, (k, v) in enumerate(rows):
        by_key.setdefault(k, []).append((i, v))
    for k, items in by_key.items():
        for (i, _), acc in zip(items, itertools.accumulate(v for _, v in items)):
            model[i] = acc
    assert got == model


@settings(max_examples=10, deadline=None)
@given(
    a=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    b=st.lists(st.integers(0, 30), min_size=0, max_size=60),
)
def test_set_ops_match_multiset_model(spark, a, b):
    # Intersect/Except ALL semantics (reference Optimizer.scala:148-150
    # rewrites) == collections.Counter multiset algebra.
    from collections import Counter

    df_a = spark.createDataFrame([(x,) for x in a] or [(None,)], "v int").filter(
        "v is not null"
    )
    df_b = spark.createDataFrame([(x,) for x in b] or [(None,)], "v int").filter(
        "v is not null"
    )
    ca, cb = Counter(a), Counter(b)
    got_i = sorted(r.v for r in df_a.intersectAll(df_b).collect())
    want_i = sorted((ca & cb).elements())
    assert got_i == want_i
    got_e = sorted(r.v for r in df_a.exceptAll(df_b).collect())
    want_e = sorted((ca - cb).elements())
    assert got_e == want_e
    got_d = sorted(r.v for r in df_a.intersect(df_b).collect())
    assert got_d == sorted(set(a) & set(b))


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(st.integers(0, 1000), min_size=1, max_size=50, unique=True),
    right=st.lists(st.integers(0, 1000), min_size=1, max_size=50, unique=True),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # Our as-of join composition == pandas.merge_asof (backward) on the
    # same frames. The reference has no as-of operator (SURVEY §2.3 gap);
    # this property is its semantic pin.
    from ops_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([(t,) for t in sorted(left)], "ts bigint")
    rdf = spark.createDataFrame(
        [(t, float(t * 2)) for t in sorted(right)], "ts bigint, quote double"
    )
    got = {
        r.ts: r.quote
        for r in asof_join(ldf, rdf, on="ts").collect()
    }
    want_df = pd.merge_asof(
        pd.DataFrame({"ts": sorted(left)}),
        pd.DataFrame({"ts": sorted(right), "quote": [float(t * 2) for t in sorted(right)]}),
        on="ts",
        direction="backward",
    )
    want = {
        int(r.ts): (None if pd.isna(r.quote) else float(r.quote))
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_join_tie_break_picks_greatest_payload(spark):
    # Right rows tied on (by, on) must resolve to the GREATEST payload
    # struct (asof.py docstring contract). Regression: ordering __payload
    # DESC made last() land on the smallest struct instead.
    from ops_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([("a", 10), ("a", 5)], "k string, ts bigint")
    rdf = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 9.0), ("a", 5, 4.0)],
        "k string, ts bigint, quote double",
    )
    got = {r.ts: r.quote for r in asof_join(ldf, rdf, on="ts", by="k").collect()}
    assert got == {5: 9.0, 10: 9.0}


_SERIES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # day offset
        st.integers(min_value=-50, max_value=50),  # value (int -> exact)
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(series=_SERIES)
def test_gap_fill_linear_matches_numpy_interp(spark, series):
    """gap_fill's interior linear interpolation must agree with
    numpy.interp over the observed anchors (edges are locf/nocb by
    contract, so only interior grid points are compared)."""
    from datetime import datetime, timedelta

    import numpy as np

    from ops_spark.operators.timeseries import gap_fill

    base = datetime(2024, 1, 1)
    rows = [
        (1, base + timedelta(days=d, hours=3), float(v)) for d, v in series
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.bucket - base).days: r.linear_e4 for r in gap_fill(df).collect()
    }
    xs = sorted(d for d, _ in series)
    vals = dict(series)
    ref = np.interp(range(min(xs), max(xs) + 1), xs, [vals[x] for x in xs])
    for day, expect in zip(range(min(xs), max(xs) + 1), ref):
        assert got[day] == int(np.floor(expect * 10000.0 + 0.5)), (day, series)


_SCD_CUR = st.lists(
    st.tuples(st.integers(0, 8), st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=8, unique_by=lambda t: t[0],
)
_SCD_UPD = st.lists(
    st.tuples(st.integers(0, 12), st.sampled_from(["a", "b", "c", "d"])),
    min_size=0, max_size=10, unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(cur=_SCD_CUR, upd=_SCD_UPD)
def test_scd2_merge_matches_reference(spark, cur, upd):
    """scd2_merge vs a dict-based reference over random snapshots: every
    key's open row reflects the latest value, changed rows close at the
    update stamp, history rows pass through untouched."""
    from ops_spark.operators.analytics import scd2_merge

    cur_rows = [(k, v, "2020", None) for k, v in cur]
    upd_rows = [(k, v, "2024") for k, v in upd]
    cur_df = spark.createDataFrame(
        cur_rows, "k long, val string, valid_from string, valid_to string"
    )
    upd_df = spark.createDataFrame(upd_rows, "k long, val string, update_ts string")
    got = {
        (r.k, r.val, r.valid_from): r.valid_to
        for r in scd2_merge(cur_df, upd_df, ["k"], ["val"], "update_ts").collect()
    }

    want = {}
    cur_d, upd_d = dict(cur), dict(upd)
    for k, v in cur_d.items():
        if k in upd_d and upd_d[k] != v:
            want[(k, v, "2020")] = "2024"  # closed
            want[(k, upd_d[k], "2024")] = None  # new version
        else:
            want[(k, v, "2020")] = None  # unchanged (or identical update)
    for k, v in upd_d.items():
        if k not in cur_d:
            want[(k, v, "2024")] = None  # brand-new key
    assert got == want


_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 5),  # user
        st.integers(0, 1000),  # time offset seconds
        st.sampled_from(["view", "click", "buy"]),
    ),
    min_size=0, max_size=60, unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=10, deadline=None)
@given(events=_EVENTS)
def test_funnel_matches_reference(spark, events):
    """funnel_steps vs a per-user scan reference on random event streams."""
    from datetime import datetime, timedelta

    from ops_spark.operators.analytics import funnel_steps

    base = datetime(2024, 1, 1)
    rows = [(u, base + timedelta(seconds=s), t) for u, s, t in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3)
        for r in funnel_steps(df, ["view", "click", "buy"]).collect()
    }

    per_user: dict[int, list] = {}
    for u, s, t in sorted(events, key=lambda e: e[1]):
        per_user.setdefault(u, []).append((base + timedelta(seconds=s), t))
    want = {}
    for u, evs in per_user.items():
        t1 = next((ts for ts, t in evs if t == "view"), None)
        if t1 is None:
            continue
        t2 = next((ts for ts, t in evs if t == "click" and ts > t1), None)
        t3 = (
            next((ts for ts, t in evs if t == "buy" and ts > t2), None)
            if t2 is not None
            else None
        )
        want[u] = (t1, t2, t3)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=150, allow_nan=False, width=32),
        min_size=1, max_size=80,
    )
)
def test_histogram_matches_numpy(spark, vals):
    """numeric_histogram vs numpy bucketing (same floor formula)."""
    import numpy as np

    from ops_spark.operators.analytics import numeric_histogram

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r.bucket: r.n for r in numeric_histogram(df, "v", 0.0, 100.0, 10).collect()}
    a = np.array(vals, dtype="float64")
    want: dict[int, int] = {}
    for v in a:
        b = 0 if v < 0 else 11 if v >= 100 else int(np.floor(v / 10.0)) + 1
        want[b] = want.get(b, 0) + 1
    assert got == want


_SCORES = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),  # group
        st.integers(min_value=-50, max_value=50),  # score
    ),
    min_size=1,
    max_size=90,
)


@settings(max_examples=12, deadline=None)
@given(rows=_SCORES)
def test_tertile_buckets_matches_counting_model(spark, rows):
    # tertile_buckets (operators/text.py) == the direct counting model:
    # a row's bucket is decided by how many rows in its group have a
    # score >= its own (ties included), against exact integer thirds.
    from ops_spark.operators.text import tertile_buckets

    df = spark.createDataFrame(
        [(i, g, s) for i, (g, s) in enumerate(rows)],
        "rid long, lang string, score long",
    )
    got = {r.rid: r.bucket for r in tertile_buckets(df, "score", "lang").collect()}
    by_g: dict[str, list] = {}
    for _, (g, s) in enumerate(rows):
        by_g.setdefault(g, []).append(s)
    for rid, (g, s) in enumerate(rows):
        tot = len(by_g[g])
        cum = sum(1 for x in by_g[g] if x >= s)
        want = "head" if 3 * cum <= tot else ("middle" if 3 * cum <= 2 * tot else "tail")
        assert got[rid] == want, (rid, g, s, got[rid], want)
    # every row is bucketed exactly once (the histogram join drops nothing)
    assert len(got) == len(rows)


_DOCS = st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=6),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(docs=_DOCS)
def test_inverted_index_matches_dict_model(spark, docs):
    # inverted_index (operators/retrieval.py) == the obvious dict build:
    # exact df always, postings = first min(df, cap) doc ids ascending.
    from ops_spark.operators.retrieval import inverted_index

    cap = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.term: (r.df, r.postings)
        for r in inverted_index(df, max_postings=cap).collect()
    }
    model: dict[str, list] = {}
    for i, toks in enumerate(docs):
        for t in sorted(set(toks)):
            model.setdefault(t, []).append(i)
    assert set(got) == set(model)
    for t, ids in model.items():
        assert got[t][0] == len(ids)
        assert got[t][1] == ",".join(str(i) for i in ids[:cap])


@settings(max_examples=8, deadline=None)
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=-999, max_value=999),
        min_size=1,
        max_size=25,
    ),
    updates=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=-999, max_value=999),
        max_size=15,
    ),
    deletes=st.sets(st.integers(min_value=0, max_value=60), max_size=10),
)
def test_snapshot_merge_matches_dict_model(spark, tmp_path_factory, base, updates, deletes):
    """merge_snapshot == the obvious dict model, for arbitrary CDC
    batches: an update merge applies dict.update (keys beyond the base
    insert), a delete merge applies dict del on matched keys only —
    across any file layout the staged writes happened to produce."""
    from ops_spark.io.snapshots import merge_snapshot, read_snapshot, write_snapshot

    t = str(tmp_path_factory.mktemp("merge_prop") / "tbl")
    d = lambda m: spark.createDataFrame(  # noqa: E731
        [(k, v) for k, v in sorted(m.items())], "k long, v long"
    )
    write_snapshot(spark, d(base), t)
    model = dict(base)
    if updates:
        merge_snapshot(spark, t, d(updates), on=["k"])
        model.update(updates)
    if deletes:
        merge_snapshot(
            spark,
            t,
            spark.createDataFrame([(k,) for k in sorted(deletes)], "k long"),
            on=["k"],
            when_matched="delete",
            when_not_matched="ignore",
        )
        for k in deletes:
            model.pop(k, None)
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got == model


_SNAP_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.dictionaries(
            st.integers(0, 50), st.integers(-99, 99), min_size=1, max_size=10)),
        st.tuples(st.just("overwrite"), st.dictionaries(
            st.integers(0, 50), st.integers(-99, 99), min_size=1, max_size=10)),
        st.tuples(st.just("merge"), st.dictionaries(
            st.integers(0, 60), st.integers(-99, 99), min_size=1, max_size=8)),
        st.tuples(st.just("delete"), st.sets(
            st.integers(0, 60), min_size=1, max_size=6)),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("rollback"), st.integers(0, 5)),
        st.tuples(st.just("delete_where"), st.integers(0, 6)),
        st.tuples(st.just("update_where"), st.integers(0, 4)),
    ),
    min_size=2,
    max_size=7,
)


@settings(max_examples=6, deadline=None)
@given(ops=_SNAP_OPS, span=st.tuples(st.integers(0, 60), st.integers(0, 60)))
def test_snapshot_op_sequences_match_versioned_model(
    spark, tmp_path_factory, ops, span
):
    """Stateful property over the WHOLE table-format surface: a random
    sequence of append / overwrite / merge-upsert / merge-delete /
    compact(sort_by) / rollback must track a versioned dict model — at
    the latest version, at EVERY historical version (time travel), and
    through a key_range read (log-stats skipping + predicate) whose
    result must equal the filtered model regardless of how the ops
    smeared or re-clustered the files. Append semantics here: duplicate
    keys across appends are avoided by the generator range only for the
    base; merges keep keys unique, so reads compare as dicts built the
    same way the engine unions rows.

    Runs with CHECKPOINT_INTERVAL=2 so every sequence also exercises the
    checkpointed fold: commits land checkpoints mid-sequence and the
    final time-travel sweep reads versions below, at, and above them."""
    import ops_spark.io.snapshots as _snap
    from ops_spark.io.snapshots import (
        compact_snapshot,
        merge_snapshot,
        read_snapshot,
        rollback,
        write_snapshot,
    )

    t = str(tmp_path_factory.mktemp("snap_seq") / "tbl")
    _old_interval = _snap.CHECKPOINT_INTERVAL
    _snap.CHECKPOINT_INTERVAL = 2
    try:
        d = lambda m: spark.createDataFrame(  # noqa: E731
            [(k, v) for k, v in sorted(m.items())], "k long, v long"
        )
        write_snapshot(spark, d({0: 0, 1: 1}), t)
        history = [{0: 0, 1: 1}]  # model state per committed version
        for op, arg in ops:
            model = dict(history[-1])
            if op == "append":
                # keep the multiset a FUNCTION of the key: only append keys
                # not currently present (the table-as-upserted-view shape the
                # merge path maintains)
                fresh = {k: v for k, v in arg.items() if k not in model}
                if not fresh:
                    continue
                write_snapshot(spark, d(fresh), t, mode="append")
                model.update(fresh)
            elif op == "overwrite":
                write_snapshot(spark, d(arg), t, mode="overwrite")
                model = dict(arg)
            elif op == "merge":
                merge_snapshot(spark, t, d(arg), on=["k"])
                model.update(arg)
            elif op == "delete":
                st_ = merge_snapshot(
                    spark,
                    t,
                    spark.createDataFrame([(k,) for k in sorted(arg)], "k long"),
                    on=["k"],
                    when_matched="delete",
                    when_not_matched="ignore",
                )
                if st_["version"] == -1:  # provable no-op: no commit minted
                    continue
                for k in arg:
                    model.pop(k, None)
            elif op == "compact":
                st_ = compact_snapshot(
                    spark, t, target_bytes=1 << 20, min_file_bytes=1 << 20,
                    sort_by=["k"],
                )
                if st_["version"] == -1:
                    continue  # nothing packed: no commit minted
                # layout-only: model state unchanged
            elif op == "rollback":
                v = arg % len(history)
                rollback(spark, t, v)
                model = dict(history[v])
            elif op == "delete_where":
                st_ = _snap.delete_where(spark, t, f"k % 7 = {arg % 7}")
                if st_["version"] == -1:
                    continue  # nothing matched: no commit minted
                model = {k: v for k, v in model.items() if k % 7 != arg % 7}
            elif op == "update_where":
                st_ = _snap.update_where(
                    spark, t, {"v": "v + 1"}, f"k % 5 = {arg % 5}"
                )
                if st_["version"] == -1:
                    continue
                model = {
                    k: (v + 1 if k % 5 == arg % 5 else v)
                    for k, v in model.items()
                }
            history.append(model)

        # latest + every historical version time-travels to its model
        for v, m in enumerate(history):
            got = {r.k: r.v for r in read_snapshot(spark, t, v).collect()}
            assert got == m, f"version {v}"
        # key_range read == filtered model at the latest version
        lo, hi = min(span), max(span)
        want = {k: v for k, v in history[-1].items() if lo <= k <= hi}
        got = {
            r.k: r.v
            for r in read_snapshot(spark, t, key_range=("k", lo, hi)).collect()
        }
        assert got == want
    finally:
        _snap.CHECKPOINT_INTERVAL = _old_interval
