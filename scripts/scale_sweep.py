"""Run EVERY registered query against the 100x derived dataset.

The flagship probes in scale_stress.py answer "do the headline plans
hold"; this sweep answers the broader claim: the WHOLE registered
surface (TPC-H battery, joins, windows, aggregates, text/dedup/
similarity, analytics, streaming-with-static-fixtures) still executes
at ~100x the test fixtures without OOM, plan blowup, or hangs.

Each query gets a wall budget (default 180 s); a watchdog thread calls
``sparkContext.cancelAllJobs()`` on breach so one quadratic-at-scale
query cannot wedge the sweep — breaches are REPORTED, not hidden, since
"needs the approximate tier at this scale" (e.g. exact n-gram Jaccard
on 25-deep near-dup clusters) is itself a documented result.

Round 5 adds CORRECTNESS at scale, not just completion: flagship queries
get a ``verified`` field — either a full DuckDB-oracle value-hash compare
against the derived parquet (small-output queries, the same gate the
driver runs at sf0.01) or engine-independent invariants (exact Jaccard
sampled re-verification + LSH⊆exact containment, transitive-dedup "no
pair survives whole", spatial count/pair algebra, gap-fill row-count
algebra, CC label idempotence via the recursive-CTE oracle).

Run:  python scripts/scale_sweep.py [--out /tmp/ops_scale/sf10]
      [--budget 180] [--only prefix1,prefix2] [--no-verify]
Writes SCALE_SWEEP.json (per-query wall/rows/status + verified).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---- flagship verification -------------------------------------------------
# Small-output queries re-checked with the FULL driver-style DuckDB oracle
# compare at the derived scale (value-hash equality, not just row counts).
ORACLE_VERIFY = [
    "Q01_pricing_summary",
    "Q06_forecast_revenue",
    "Q18_large_volume_customer",
    "agg_stats",
    "an_funnel",
    "dedup_drop_duplicates",
    "graph_connected_components",  # recursive-CTE closure = label idempotence
    "llm_token_count",
]


def _v_oracle(name):
    def run(spark, sf_dir):
        import ops_spark.queries as q
        from ops_spark.conformance import compare

        # float_tol=1e-12 RELATIVE: at 60M rows a double sum's partial/final
        # tree order differs from DuckDB's sequential fold in the last ulp
        # (measured: Q01 sum_base_price 460924177654.99 vs .98 — 2e-14
        # relative). The sf0.01 driver gate stays exact-stringified; the
        # at-scale check tolerates summation-order ulps and nothing more.
        r = compare(spark, q.get_query(name), sf_dir, float_tol=1e-12)
        return bool(r.ok), f"duckdb-oracle {r.detail} rows={r.spark_rows}"

    return run


def _v_jaccard_pairs(spark, sf_dir):
    """Sampled exact re-verification: recompute J for 200 output pairs via
    the independent per-pair Column path (jaccard_shingles over the two
    raw texts — different code path from the posting join) and require
    agreement to the rounding grain plus J >= threshold."""
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.dedup import jaccard_shingles, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    # deterministic pseudo-random 200: hash-order, not head-of-partition
    sample = pairs.orderBy(F.xxhash64("id_a", "id_b")).limit(200)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    checked = (
        sample.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__jv", jaccard_shingles(F.col("__ta"), F.col("__tb")))
    )
    bad = checked.filter(
        (F.abs(F.col("__jv") - F.col("jaccard")) > 5e-7) | (F.col("__jv") < 0.8)
    ).count()
    n = checked.count()
    return bad == 0 and n > 0, f"sampled-reverify n={n} mismatches={bad}"


def _v_jaccard_completeness(spark, sf_dir):
    """LSH ⊆ exact containment: every LSH candidate pair that exact
    verification confirms (J >= t) MUST appear in the prefix-filtered
    exact pair set — the direct guard on the prefix filter's
    exactness-preserving claim (a dropped true pair shows up here)."""
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.dedup import (
        jaccard_shingles,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    lsh_true = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__j", jaccard_shingles(F.col("__ta"), F.col("__tb")))
        .filter(F.col("__j") >= 0.8)
        .select("id_a", "id_b")
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.8).select("id_a", "id_b")
    n_lsh = lsh_true.count()
    missing = lsh_true.join(exact, ["id_a", "id_b"], "left_anti").count()
    n_exact = exact.count()
    recall = round(n_lsh / n_exact, 4) if n_exact else 1.0
    return (
        missing == 0,
        f"lsh_true={n_lsh} exact={n_exact} missing_from_exact={missing} "
        f"lsh_recall={recall}",
    )


def _v_transitive(spark, sf_dir):
    """No qualifying pair may have BOTH endpoints surviving (any pair links
    its endpoints into one component, which keeps exactly one), and every
    dropped doc must touch >= 1 pair."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    surv = q.get_query("llm_transitive_dedup").builder(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).localCheckpoint()
    sa = surv.select(F.col("doc_id").alias("id_a"))
    sb = surv.select(F.col("doc_id").alias("id_b"))
    both = pairs.join(sa, "id_a").join(sb, "id_b").count()
    verts = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    orphan_drops = (
        docs.select("doc_id")
        .join(surv.select("doc_id"), "doc_id", "left_anti")
        .join(verts, "doc_id", "left_anti")
        .count()
    )
    return (
        both == 0 and orphan_drops == 0,
        f"pairs_with_both_surviving={both} dropped_without_edge={orphan_drops}",
    )


def _v_spatial(spark, sf_dir):
    """Cross-operator algebra: Σ per-point neighbor counts == 2 × pairs."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    n_pairs = q.get_query("an_spatial_join").builder(spark, sf_dir).count()
    s = (
        q.get_query("geo_radius_count")
        .builder(spark, sf_dir)
        .agg(F.sum("n_neighbors"))
        .first()[0]
        or 0
    )
    return s == 2 * n_pairs, f"sum_counts={s} pairs={n_pairs}"


def _v_gap_fill(spark, sf_dir):
    """Row-count algebra: output rows == Σ_users (span_days + 1), spans
    computed independently by a plain min/max aggregation."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table

    n_out = q.get_query("ts_gap_fill").builder(spark, sf_dir).count()
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    expected = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("b"))
        .groupBy("user_id")
        .agg(F.datediff(F.max("b"), F.min("b")).alias("span"))
        .agg(F.sum(F.col("span") + 1))
        .first()[0]
    )
    return n_out == expected, f"rows={n_out} expected={expected}"


def _v_stream_lsh_batch_eq(spark, sf_dir):
    """Batch-equality at scale: the streamed candidate pair set must
    EQUAL the batch path's co-bucketed candidates filtered by the same
    full-signature agreement (5·Σeq ≥ 4·k ⇔ mean ≥ 0.8), both computed
    with the identical hash family/seed. Distributed compare — two
    anti-joins — so 125k-doc signature sets never reach the driver
    (the fixture-scale pin in test_streaming_extra collects; this one
    cannot)."""
    from pyspark.sql import functions as F

    import ops_spark.queries as q
    from ops_spark.io import load_table
    from ops_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    got = (
        q.get_query("x_stream_lsh_dedup")
        .builder(spark, sf_dir)
        .select("id_a", "id_b")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    a = sigs.select(F.col("__id").alias("id_a"), F.col("__sig").alias("sa"))
    b = sigs.select(F.col("__id").alias("id_b"), F.col("__sig").alias("sb"))
    eq = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    want = (
        minhash_lsh_candidates(docs)
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__eq", eq)
        .filter(5 * F.col("__eq") >= 4 * F.size("sa"))
        .select("id_a", "id_b")
        .distinct()
    )
    n_want = want.count()
    missing = want.join(got, ["id_a", "id_b"], "left_anti").count()
    extra = got.join(want, ["id_a", "id_b"], "left_anti").count()
    return (
        missing == 0 and extra == 0 and n_want > 0,
        f"pairs={n_want} missing={missing} extra={extra}",
    )


def _v_topk(spark, sf_dir):
    """Cross-operator algebra against the independently-computed count
    query: every point must emit exactly min(n_neighbors, k) top-k rows
    (k=5) — catches a two-phase kNN that drops, duplicates or pads rows
    for either the done or the underfilled partition."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    counts = q.get_query("geo_radius_count").builder(spark, sf_dir)
    per_pt = (
        q.get_query("geo_radius_topk")
        .builder(spark, sf_dir)
        .groupBy("id")
        .agg(F.count("*").alias("got"))
    )
    joined = counts.join(per_pt, "id", "left").select(
        F.least(F.col("n_neighbors"), F.lit(5)).alias("want"),
        F.coalesce("got", F.lit(0)).alias("got"),
    )
    bad = joined.filter(F.col("want") != F.col("got")).count()
    n = joined.count()
    return bad == 0 and n > 0, f"points={n} topk_count_mismatches={bad}"


def _v_knn_recall(spark, sf_dir, n_sample=2000, k=5):
    """MEASURED recall@k at scale (round-5 verdict: the fixture-scale
    recall test is structural, not a number): sample ~2k vectors, compute
    the EXACT top-k for each by brute-force GEMM against the whole
    corpus under the operator's own (sim desc, neighbor asc) tie-break,
    and report the fraction the approximate graph found. Driver-side
    numpy is deliberate here — this is a bounded verification probe
    (n_sample x corpus, chunked), not an operator. If recall < 0.9 the
    knob is n_tables/nbits in x_llm_knn_graph (more tables = more
    OR-amplified candidate buckets)."""
    import numpy as np
    from pyspark.sql import functions as F

    import ops_spark.queries as q
    from ops_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sample_ids = sorted(
        int(r.vec_id)
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id"))
        .limit(n_sample)
        .collect()
    )
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(ids)}
    s_idx = np.array([pos[i] for i in sample_ids], dtype=np.int64)
    exact: dict[int, set] = {}
    for c0 in range(0, len(s_idx), 256):
        chunk = s_idx[c0 : c0 + 256]
        sims = M[chunk] @ M.T
        for row, qi in zip(sims, chunk):
            row[qi] = -np.inf  # a vector is not its own neighbor
            # exact top-k incl. boundary ties, then the operator's key
            kth = -np.partition(-row, k - 1)[k - 1]
            cand = np.nonzero(row >= kth)[0]
            order = cand[np.lexsort((ids[cand], -row[cand]))][:k]
            exact[int(ids[qi])] = {int(ids[j]) for j in order}
    got = (
        q.get_query("x_llm_knn_graph")
        .builder(spark, sf_dir)
        .filter(F.col("vec_id").isin(sample_ids))
        .select("vec_id", "neighbor")
        .collect()
    )
    approx: dict[int, set] = {}
    for r in got:
        approx.setdefault(int(r.vec_id), set()).add(int(r.neighbor))
    hits = sum(len(exact[i] & approx.get(i, set())) for i in exact)
    denom = sum(len(v) for v in exact.values())
    recall = round(hits / denom, 4) if denom else 0.0
    return (
        recall >= 0.9,
        f"measured recall@{k}={recall} n_sample={len(exact)} "
        f"corpus={len(ids)} (knob: n_tables/nbits)",
    )


def _v_ivfpq_recall(spark, sf_dir, k=10):
    """MEASURED recall@k for the IVF-PQ tier at scale: the exact top-k
    for the query battery (vec_id < 5, the registered query's own
    inputs) by chunked brute-force GEMM over the whole corpus, under the
    operator's (sim desc, vec_id asc) tie-break, vs x_llm_ann_ivfpq's
    output. The ADC scan tier only ever sees m-byte PQ codes — the exact
    re-rank of the shortlist must keep recall at the coarse-probe
    ceiling (knobs: nprobe/n_centroids widen the probe set,
    shortlist_factor deepens the re-rank)."""
    import numpy as np
    from pyspark.sql import functions as F

    import ops_spark.queries as q
    from ops_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(ids)}
    qids = sorted(i for i in pos if i < 5)
    exact: dict[int, set] = {}
    sims = M[[pos[i] for i in qids]] @ M.T
    for row, qid in zip(sims, qids):
        kth = -np.partition(-row, k - 1)[k - 1]
        cand = np.nonzero(row >= kth)[0]
        order = cand[np.lexsort((ids[cand], -row[cand]))][:k]
        exact[qid] = {int(ids[j]) for j in order}
    got = q.get_query("x_llm_ann_ivfpq").builder(spark, sf_dir).collect()
    approx: dict[int, set] = {}
    for r in got:
        approx.setdefault(int(r.query_id), set()).add(int(r.vec_id))
    hits = sum(len(exact[i] & approx.get(i, set())) for i in exact)
    denom = sum(len(v) for v in exact.values())
    recall = round(hits / denom, 4) if denom else 0.0
    return (
        recall >= 0.5,
        f"measured recall@{k}={recall} n_queries={len(exact)} "
        f"corpus={len(ids)} (knobs: nprobe/n_centroids/shortlist_factor)",
    )


def _v_nearest_hub_sample(spark, sf_dir, n_sample=500):
    """Sampled EXACT re-verify for the bipartite kNN (its full output —
    one row per point — exceeds the driver-compare row cap at 100×):
    for ~500 hash-picked points, brute-force every point×hub distance
    with the same equirect_km arithmetic but NO grid candidate stage
    (grid completeness is exactly what's under test), rank, and demand
    set equality on (id, neighbor, dist_e6, rank). Hub count is |pts|/500,
    so the probe is n_sample × hubs — bounded, all-Spark."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import ops_spark.queries as q
    from ops_spark.io import load_table
    from ops_spark.operators.geo import equirect_km
    from ops_spark.queries.analytics import _spatial_pts

    pts = _spatial_pts(load_table(spark, sf_dir, "customer"))
    sample = pts.orderBy(F.xxhash64("id")).limit(n_sample).select("id", "lat", "lon")
    hubs = pts.filter(F.col("id") % 500 == 0).select(
        F.col("id").alias("neighbor"),
        F.col("lat").alias("hlat"),
        F.col("lon").alias("hlon"),
    )
    d = equirect_km(F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon"))
    w = Window.partitionBy("id").orderBy("dist_km", "neighbor")
    want = (
        sample.crossJoin(F.broadcast(hubs))
        .filter(F.col("id") != F.col("neighbor"))
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= 800.0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "id",
            "neighbor",
            F.floor(F.col("dist_km") * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("dist_e6"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
    got = (
        q.get_query("geo_nearest_hub")
        .builder(spark, sf_dir)
        .join(sample.select("id"), "id", "leftsemi")
    )
    cols = ["id", "neighbor", "dist_e6", "rank"]
    missing = want.join(got, cols, "left_anti").count()
    extra = got.join(want, cols, "left_anti").count()
    n_want = want.count()
    return (
        missing == 0 and extra == 0 and n_want > 0,
        f"sample_rows={n_want} missing={missing} extra={extra}",
    )


def _v_compact_flags(spark, sf_dir):
    """x_io_compact's own output row carries its invariants (lossless
    checksum, untouched-bytes-identical, incrementality); assert them
    here so the file-layout op has an explicit at-scale verifier instead
    of a verify_skipped slot."""
    import ops_spark.queries as q

    r = q.get_query("x_io_compact").builder(spark, sf_dir).first()
    ok = (
        bool(r.lossless)
        and bool(r.untouched_bytes_identical)
        and r.rewritten_files > 0
        and r.files_after < r.files_before
        and r.untouched_files > 0
    )
    return ok, (
        f"lossless={r.lossless} untouched_identical={r.untouched_bytes_identical} "
        f"files {r.files_before}->{r.files_after} rewritten={r.rewritten_files}"
    )


def _v_zorder_flags(spark, sf_dir):
    """x_io_zorder's output carries the measurable clustering claim:
    per-file footer spans bounded on BOTH dimensions (each packed file a
    sub-rectangle — a linear sort leaves the trailing column ~1.0) plus
    the lossless checksum and a real file-count reduction."""
    import ops_spark.queries as q

    r = q.get_query("x_io_zorder").builder(spark, sf_dir).first()
    ok = (
        bool(r.lossless)
        and r.files_after < r.files_before
        and r.avg_span_x < 0.8
        and r.avg_span_y < 0.8
    )
    return ok, (
        f"lossless={r.lossless} files {r.files_before}->{r.files_after} "
        f"avg_span_x={r.avg_span_x} avg_span_y={r.avg_span_y}"
    )


# ---- round 8 (VERDICT r7 #2a): checksum verifier for over-row-cap oracles ---


def _v_agg_hash(name):
    """Aggregate-checksum verifier for oracle queries whose 100x output
    exceeds the driver-compare row cap: row count + per-column null count
    + the SUM of a 56-bit md5 hash over an engine-canonical string
    rendering, computed NATIVELY in both engines — nothing is collected.
    Canonical forms: exact types cast to string (Spark and DuckDB agree on
    int/decimal/date/bool renderings), doubles quantized
    floor(x*1e6 + 0.5) (house convention — output doubles are
    exact-derived, enforced by the sf0.01 exact-stringify gate),
    timestamps as epoch micros (session TZ pinned UTC on both sides)."""

    def run(spark, sf_dir):
        import ops_spark.queries as q
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from ops_spark.conformance import duckdb_connection

        qq = q.get_query(name)
        df = qq.builder(spark, sf_dir)
        double_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.DoubleType, T.FloatType))
        ]
        # Spark's floor(double) returns LONG and silently wraps past
        # |x*1e6| > 2^63, while DuckDB's floor stays DOUBLE→DECIMAL exact
        # — so double columns whose magnitude can reach the wrap point are
        # excluded from hashing ON BOTH SIDES (null counts still compare)
        # rather than risking a false failure. Decision made once, from
        # the Spark side's measured max.
        unhashable: set[str] = set()
        if double_cols:
            mx = df.agg(
                *[F.max(F.abs(F.col(c))).alias(c) for c in double_cols]
            ).first()
            unhashable = {c for c in double_cols if (mx[c] or 0.0) > 4.0e12}
        aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n_rows")]
        for f in df.schema.fields:
            c = F.col(f.name)
            aggs.append(
                F.count(F.when(c.isNull(), 1)).cast("decimal(38,0)").alias(f"z_{f.name}")
            )
            if f.name in unhashable:
                continue
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                s = F.floor(c * 1e6 + F.lit(0.5)).cast("decimal(38,0)").cast("string")
            elif isinstance(f.dataType, T.TimestampType):
                s = F.unix_micros(c).cast("string")
            else:
                s = c.cast("string")
            h = F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("decimal(38,0)")
            aggs.append(F.sum(h).alias(f"h_{f.name}"))
        srow = {
            k: (None if v is None else int(v))
            for k, v in df.agg(*aggs).first().asDict().items()
        }

        con = duckdb_connection(sf_dir)
        desc = con.execute(f"DESCRIBE SELECT * FROM ({qq.oracle}) AS q").fetchall()
        sel = ["CAST(COUNT(*) AS DECIMAL(38,0)) AS n_rows"]
        for colname, dtype, *_rest in desc:
            qc = f'"{colname}"'
            d = dtype.upper()
            sel.append(
                f"CAST(COUNT(CASE WHEN {qc} IS NULL THEN 1 END) AS DECIMAL(38,0))"
                f' AS "z_{colname}"'
            )
            if colname in unhashable:
                continue
            if d in ("DOUBLE", "FLOAT", "REAL"):
                s = f"CAST(CAST(floor({qc} * 1e6 + 0.5) AS DECIMAL(38,0)) AS VARCHAR)"
            elif d.startswith("TIMESTAMP"):
                s = f"CAST(epoch_us({qc}) AS VARCHAR)"
            else:
                s = f"CAST({qc} AS VARCHAR)"
            sel.append(
                "SUM(CAST(CAST(('0x' || substr(md5(" + s + "),1,14)) AS BIGINT)"
                f' AS DECIMAL(38,0))) AS "h_{colname}"'
            )
        cur = con.execute("SELECT " + ", ".join(sel) + f" FROM ({qq.oracle}) AS q")
        ocols = [dsc[0] for dsc in cur.description]
        orow = {
            k: (None if v is None else int(v))
            for k, v in zip(ocols, cur.fetchone())
        }
        con.close()
        bad = sorted(
            k for k in set(srow) | set(orow) if srow.get(k) != orow.get(k)
        )
        skipped = f" hash_skipped_magnitude={sorted(unhashable)}" if unhashable else ""
        return (
            not bad and srow["n_rows"] > 0,
            f"agg-hash n_rows={srow['n_rows']} fields={len(srow) - 1} "
            f"mismatched={bad[:4]}{skipped}",
        )

    return run


# ---- round 8 (VERDICT r7 #3): invariant verifiers for rows-tier queries -----


def _v_approx_sketch(spark, sf_dir):
    """x_agg_approx: sketches vs exact — HLL++ within 3x its configured
    rsd (2% → 6%), approx median inside the exact p45–p55 envelope,
    n_rows exact."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table

    got = {
        r.l_returnflag: r
        for r in q.get_query("x_agg_approx").builder(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("nd"),
            F.expr(
                "percentile(l_extendedprice, array(0.45, 0.5, 0.55))"
            ).alias("ps"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    msgs = []
    ok = set(got) == set(exact) and len(got) > 0
    for key, e in exact.items():
        g = got.get(key)
        if g is None:
            ok = False
            continue
        rel = abs(g.approx_orders - e.nd) / e.nd
        med_ok = e.ps[0] <= g.approx_median <= e.ps[2]
        if g.n_rows != e.n or rel > 0.06 or not med_ok:
            ok = False
            msgs.append(
                f"{key}: hll_rel={rel:.4f} med_in_p45_p55={med_ok} "
                f"n={g.n_rows}=={e.n}"
            )
    return ok, (
        f"groups={len(exact)} "
        + ("; ".join(msgs) if msgs else "hll<=6% median-in-envelope counts-exact")
    )


def _v_ewma_recursion(spark, sf_dir):
    """x_ts_ewma: the output must satisfy its own defining recursion
    s_t = 0.3·x_t + 0.7·s_{t-1} (s_0 = x_0) row by row under the per-user
    time order — checked DISTRIBUTED with a window lag over the output
    itself (an independent code path from the fold). Tolerance 2e-6
    covers the 6-dp rounding of both terms. Users with duplicate
    timestamps are excluded (their fold order is the array sort's, not
    the window's)."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    out = q.get_query("x_ts_ewma").builder(spark, sf_dir)
    dup_users = (
        out.groupBy("user_id", "ts")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    chk = (
        out.join(dup_users, "user_id", "left_anti")
        .withColumn("prev", F.lag("ewma").over(w))
        .withColumn(
            "want",
            F.when(F.col("prev").isNull(), F.col("value")).otherwise(
                0.3 * F.col("value") + 0.7 * F.col("prev")
            ),
        )
    )
    bad = chk.filter(F.abs(F.col("ewma") - F.col("want")) > 2e-6).count()
    n = chk.count()
    return bad == 0 and n > 0, f"recursion_checked={n} violations={bad}"


def _v_ewma_chunked_eq(spark, sf_dir):
    """x_ts_ewma_chunked ≡ x_ts_ewma at scale: the segment-then-carry form
    must reproduce the single-fold values (the affine-fold exactness
    claim) — distributed full-outer compare keyed on (user, ts); rows with
    tied timestamps compare as per-key SUMS so the two folds' tie
    orderings can't false-alarm."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    a = q.get_query("x_ts_ewma").builder(spark, sf_dir)
    b = q.get_query("x_ts_ewma_chunked").builder(spark, sf_dir)
    ga = a.groupBy("user_id", "ts").agg(
        F.sum("ewma").alias("sa"), F.count("*").alias("na")
    )
    gb = b.groupBy("user_id", "ts").agg(
        F.sum("ewma").alias("sb"), F.count("*").alias("nb")
    )
    j = ga.join(gb, ["user_id", "ts"], "full_outer")
    bad = j.filter(
        F.col("sa").isNull()
        | F.col("sb").isNull()
        | (F.col("na") != F.col("nb"))
        | (F.abs(F.col("sa") - F.col("sb")) > 1e-5)
    ).count()
    n = j.count()
    return bad == 0 and n > 0, f"keys={n} mismatches={bad}"


def _v_bpe_merges(spark, sf_dir):
    """x_llm_bpe_merges: independently re-derive merge #1 — the argmax
    adjacent char pair over the word-frequency table, computed here with a
    slice/transform explode (not the operator's zip_with path) — and
    require exact (left, right, pair_freq) agreement; every row must
    satisfy the structural invariants (dense ranks, merged = left||right,
    positive frequency)."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.text import tokens

    rows = sorted(
        q.get_query("x_llm_bpe_merges").builder(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    structural = (
        [r.rank for r in rows] == list(range(1, len(rows) + 1))
        and all(r.merged == r.left + r.right for r in rows)
        and all(r.pair_freq > 0 for r in rows)
        and len(rows) == 8
    )
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"), lowercase=True)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.filter(F.split(F.col("w"), ""), lambda x: x != "").alias("sym"),
            "freq",
        )
    )
    top = (
        words.filter(F.size("sym") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(sym, 1, size(sym) - 1),"
                    " (x, i) -> struct(x AS l, element_at(sym, i + 2) AS r))"
                )
            ).alias("p"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("freq"))
        .orderBy(F.desc("freq"), "l", "r")
        .first()
    )
    first_ok = (
        rows
        and rows[0].left == top.l
        and rows[0].right == top.r
        and rows[0].pair_freq == top.freq
    )
    return bool(structural and first_ok), (
        f"structural={structural} merge1=({rows[0].left!r},{rows[0].right!r},"
        f"{rows[0].pair_freq}) independent=({top.l!r},{top.r!r},{top.freq})"
    )


def _v_doremi(spark, sf_dir):
    """x_llm_doremi_mixture: recompute the whole mixture in the verifier —
    per-domain loss aggregation via an independent sum/count expression,
    then the EG loop replayed in pure Python per the operator's spec
    (iters=5, eta=1, smoothing=1e-3, step-averaged) — and require EXACT
    weight_e6 agreement plus Σweight_e6 ≈ 1e6 and
    hardest-domain ≥ uniform."""
    import math

    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.text import char_bigram_lm_scores

    got = {
        r.domain: r
        for r in q.get_query("x_llm_doremi_mixture").builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    lm = char_bigram_lm_scores(docs)
    stats = (
        docs.select("doc_id", "source")
        .join(lm, "doc_id")
        .withColumn(
            "loss_e4", F.floor(-F.col("avg_logp") * 1e4 + 0.5).cast("bigint")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("loss_e4").alias("s"))
        .collect()
    )
    doms = sorted(r.source for r in stats)
    by = {r.source: r for r in stats}
    losses = [float(math.floor(by[d].s / by[d].n + 0.5)) for d in doms]
    k = len(doms)
    mean = sum(losses) / k
    rng = (max(losses) - min(losses)) or 1.0
    excess = [(x - mean) / rng for x in losses]
    w = [1.0 / k] * k
    acc = [0.0] * k
    for _ in range(5):
        w = [wi * math.exp(ei) for wi, ei in zip(w, excess)]
        tot = sum(w)
        w = [wi / tot for wi in w]
        acc = [a + wi for a, wi in zip(acc, w)]
    final = [(1.0 - 1e-3) * (a / 5) + 1e-3 / k for a in acc]
    want = {d: int(math.floor(f * 1e6 + 0.5)) for d, f in zip(doms, final)}
    bad = sorted(
        d for d in set(want) | set(got) if got.get(d) is None
        or want.get(d) != got[d].weight_e6
    )
    tot_e6 = sum(r.weight_e6 for r in got.values())
    hardest = doms[max(range(k), key=lambda i: losses[i])]
    hard_ok = hardest in got and got[hardest].weight_e6 >= int(1e6 / k)
    ok = not bad and abs(tot_e6 - 1_000_000) <= k and hard_ok
    return ok, (
        f"domains={k} exact_mismatch={bad[:3]} sum_e6={tot_e6} "
        f"hardest={hardest} upweighted={hard_ok}"
    )


def _v_embedding_clusters(spark, sf_dir):
    """x_llm_embedding_clusters: BIT-IDENTICAL vectors co-cluster (the
    100x derivation replicates embeddings verbatim), cluster_size equals
    the actual per-cluster row count, and the output covers
    corpus+planted exactly once. The planted-pair co-cluster claim is
    only checkable when a planted vector's k=5 nearest CAN include its
    original — at 100x each planted vector has 24 identical planted
    siblings (cos 1.0) that fill its entire top-k before the cos-0.99995
    original, so the kNN graph CORRECTLY cannot bridge the groups; there
    the check becomes per-identical-planted-group cluster consistency
    instead."""
    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table

    out = q.get_query("x_llm_embedding_clusters").builder(spark, sf_dir).localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings")
    n_base = emb.count()
    n_out = out.count()
    size_bad = (
        out.groupBy("cluster_id", "cluster_size")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") != F.col("cluster_size"))
        .count()
    )
    ident_split = (
        emb.select("vec_id", F.hash("embedding").alias("vh"))
        .join(out.select("vec_id", "cluster_id"), "vec_id")
        .groupBy("vh")
        .agg(F.countDistinct("cluster_id").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    # replica multiplicity among the planted source slice (1 at sf0.1,
    # 25 at the 100x derivation)
    rep = (
        emb.filter(F.col("vec_id") < 100)
        .groupBy(F.hash("embedding").alias("vh"))
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    ) or 1
    planted = out.filter(F.col("vec_id") >= 1_000_000)
    if rep < 5:  # planted top-k reaches its original: pairs must co-cluster
        a = out.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("i"), F.col("cluster_id").alias("ca")
        )
        b = planted.select(
            (F.col("vec_id") - 1_000_000).alias("i"),
            F.col("cluster_id").alias("cb"),
        )
        j = a.join(b, "i", "full_outer")
        planted_bad = j.filter(
            F.col("ca").isNull() | F.col("cb").isNull() | (F.col("ca") != F.col("cb"))
        ).count()
        mode = f"planted_split={planted_bad}"
    else:  # identical planted groups must each resolve to ONE cluster
        planted_bad = (
            planted.groupBy(
                F.floor((F.col("vec_id") - 1_000_000) / rep).alias("grp")
            )
            .agg(F.countDistinct("cluster_id").alias("nc"))
            .filter(F.col("nc") > 1)
            .count()
        )
        mode = f"planted_group_split={planted_bad} (rep={rep} >= k, bridge unreachable)"
    ok = (
        planted_bad == 0
        and size_bad == 0
        and ident_split == 0
        and n_out == n_base + 100
    )
    return ok, (
        f"rows={n_out} (want {n_base + 100}) {mode} "
        f"size_mismatch={size_bad} identical_vectors_split={ident_split}"
    )


def _v_planted_dedup(name, max_planted_miss=0):
    """x_llm_semantic_dedup / x_llm_embedding_dedup_lsh: survivor-set
    validity at any scale — unique ids, no two survivors bit-identical
    (identical vectors provably co-cluster/co-bucket, so one must drop),
    one survivor per distinct vector VALUE of the unplanted corpus (the
    100x derivation replicates embeddings verbatim) PLUS one per planted
    pair the blocking legitimately separated. ``max_planted_miss`` is the
    tolerated separations: 0 for the OR-amplified LSH path (4-table
    co-bucket miss probability ~1e-9 for cos 0.9999), 2 for the k-means
    path (a +0.01-perturbed vector CAN straddle a cell boundary — the
    documented approximation of cell-blocked dedup — but the count
    conservation n_out == value_groups + straddled must still hold
    exactly, so a miss can never hide a real dedup failure)."""

    def run(spark, sf_dir):
        import ops_spark.queries as q
        from pyspark.sql import functions as F

        from ops_spark.io import load_table

        out = q.get_query(name).builder(spark, sf_dir).localCheckpoint()
        emb = load_table(spark, sf_dir, "embeddings")
        n_out = out.count()
        n_ids = out.select("vec_id").distinct().count()
        n_groups = emb.select(F.hash("embedding").alias("vh")).distinct().count()
        ident_pairs = (
            emb.select("vec_id", F.hash("embedding").alias("vh"))
            .join(out.select("vec_id"), "vec_id", "leftsemi")
            .groupBy("vh")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        lo = out.filter(F.col("vec_id") < 100).select(F.col("vec_id").alias("i"))
        hi = out.filter(F.col("vec_id") >= 1_000_000).select(
            (F.col("vec_id") - 1_000_000).alias("i")
        )
        both = lo.join(hi, "i", "inner").count()
        ok = (
            n_out == n_ids
            and n_out == n_groups + both
            and ident_pairs == 0
            and both <= max_planted_miss
        )
        return ok, (
            f"survivors={n_out} unique_ids={n_ids} value_groups={n_groups} "
            f"identical_pairs_surviving={ident_pairs} "
            f"planted_both_survive={both} (<= {max_planted_miss} tolerated, "
            "count-conserved)"
        )

    return run


def _v_ann_recall(qname, min_recall, k=10):
    """Measured recall@k vs chunked brute-force GEMM for an ANN tier whose
    output is (query_id, vec_id) — the same probe shape as the IVF-PQ
    verifier, parameterized by query and threshold."""

    def run(spark, sf_dir):
        import numpy as np

        import ops_spark.queries as q
        from pyspark.sql import functions as F

        from ops_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        pdf = emb.select("vec_id", "embedding").toPandas()
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        pos = {int(v): i for i, v in enumerate(ids)}
        qids = sorted(i for i in pos if i < 5)
        exact: dict[int, set] = {}
        sims = M[[pos[i] for i in qids]] @ M.T
        for row, qid in zip(sims, qids):
            kth = -np.partition(-row, k - 1)[k - 1]
            cand = np.nonzero(row >= kth)[0]
            order = cand[np.lexsort((ids[cand], -row[cand]))][:k]
            exact[qid] = {int(ids[j]) for j in order}
        got = q.get_query(qname).builder(spark, sf_dir).collect()
        approx: dict[int, set] = {}
        for r in got:
            approx.setdefault(int(r.query_id), set()).add(int(r.vec_id))
        hits = sum(len(exact[i] & approx.get(i, set())) for i in exact)
        denom = sum(len(v) for v in exact.values())
        recall = round(hits / denom, 4) if denom else 0.0
        return (
            recall >= min_recall,
            f"measured recall@{k}={recall} (floor {min_recall}) "
            f"n_queries={len(exact)} corpus={len(ids)}",
        )

    return run


def _v_multimodal_features(spark, sf_dir):
    """x_llm_multimodal_features: recompute the byte-histogram feature in
    plain numpy from the raw text (an independent re-implementation of
    the documented stub semantics) for ~200 hash-sampled docs and require
    max-abs agreement; row count must equal the documents count."""
    import numpy as np

    import ops_spark.queries as q
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.multimodal import FEATURE_DIM

    out = q.get_query("x_llm_multimodal_features").builder(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_out = out.count()
    sample_ids = [
        r.doc_id
        for r in docs.select("doc_id").orderBy(F.xxhash64("doc_id")).limit(200).collect()
    ]
    texts = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    feats = {
        r.doc_id: np.asarray(r.feature, dtype=np.float64)
        for r in out.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    bad = 0
    for did, txt in texts.items():
        hist = np.zeros(FEATURE_DIM)
        for byte in txt.encode("utf-8"):
            hist[byte % FEATURE_DIM] += 1.0
        if hist.sum():
            hist /= hist.sum()
        g = feats.get(did)
        if g is None or len(g) != FEATURE_DIM or np.abs(g - hist).max() > 1e-6:
            bad += 1
    ok = bad == 0 and n_out == n_docs and len(texts) > 0
    return ok, f"rows={n_out}/{n_docs} sampled={len(texts)} mismatches={bad}"


def _v_simhash_candidates(spark, sf_dir):
    """x_llm_simhash_candidates: SOUNDNESS over the whole output — every
    pair's hamming must equal popcount(xor) of the oracle-verified
    llm_simhash fingerprints and be <= 3 (distributed join, nothing
    collected); COMPLETENESS over a 300-doc sample — every <=3-hamming
    pair among the sample must appear, except pairs whose every shared
    byte-band bucket overflowed the operator's documented max_bucket cap."""
    import itertools

    import ops_spark.queries as q
    from pyspark.sql import functions as F

    fps = q.get_query("llm_simhash").builder(spark, sf_dir).localCheckpoint()
    out = q.get_query("x_llm_simhash_candidates").builder(spark, sf_dir)
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("fa"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("fb"))
    chk = (
        out.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("h2", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
    )
    unsound = chk.filter(
        (F.col("h2") != F.col("hamming")) | (F.col("hamming") > 3)
    ).count()
    n_out = out.count()

    # bucket sizes (independent expression) for the cap-aware completeness
    bands = fps.select(
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(0xFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "bucket")
    )
    bucket_n = {
        (r.band, r.bucket): r.n
        for r in bands.groupBy("band", "bucket").agg(F.count("*").alias("n")).collect()
    }
    sample = fps.orderBy(F.xxhash64("doc_id")).limit(300).collect()
    ids = {r.doc_id for r in sample}
    got_pairs = {
        (r.id_a, r.id_b)
        for r in out.filter(
            F.col("id_a").isin(ids) & F.col("id_b").isin(ids)
        ).collect()
    }
    want, capped = set(), 0
    for r1, r2 in itertools.combinations(sample, 2):
        if bin(r1.simhash ^ r2.simhash).count("1") > 3:
            continue
        pair = (min(r1.doc_id, r2.doc_id), max(r1.doc_id, r2.doc_id))
        shared_ok = any(
            ((r1.simhash >> (8 * i)) & 0xFF) == ((r2.simhash >> (8 * i)) & 0xFF)
            and bucket_n.get((i, (r1.simhash >> (8 * i)) & 0xFF), 0) <= 1000
            for i in range(4)
        )
        if shared_ok:
            want.add(pair)
        else:
            capped += 1
    missing = len(want - got_pairs)
    ok = unsound == 0 and missing == 0 and n_out > 0
    return ok, (
        f"pairs={n_out} hamming_mismatch={unsound} sample_true={len(want)} "
        f"sample_missing={missing} sample_capped_excluded={capped}"
    )


INVARIANT_VERIFIERS = {
    "geo_nearest_hub": _v_nearest_hub_sample,
    "x_io_compact": _v_compact_flags,
    "x_io_zorder": _v_zorder_flags,
    "x_llm_ann_ivfpq": _v_ivfpq_recall,
    # round 8 (VERDICT r7 #3): rows-tier queries lifted from unit-level
    # pins to at-scale sweep verifiers
    "x_agg_approx": _v_approx_sketch,
    "x_ts_ewma": _v_ewma_recursion,
    "x_ts_ewma_chunked": _v_ewma_chunked_eq,
    "x_llm_bpe_merges": _v_bpe_merges,
    "x_llm_doremi_mixture": _v_doremi,
    "x_llm_embedding_clusters": _v_embedding_clusters,
    "x_llm_semantic_dedup": _v_planted_dedup(
        "x_llm_semantic_dedup", max_planted_miss=2
    ),
    "x_llm_embedding_dedup_lsh": _v_planted_dedup("x_llm_embedding_dedup_lsh"),
    "x_llm_ann_lsh_topk": _v_ann_recall("x_llm_ann_lsh_topk", 0.5),
    "x_llm_ivf_topk": _v_ann_recall("x_llm_ivf_topk", 0.5),
    "x_llm_multimodal_features": _v_multimodal_features,
    "x_llm_simhash_candidates": _v_simhash_candidates,
    "llm_ngram_jaccard_pairs": _v_jaccard_pairs,
    "llm_minhash_lsh_dedup": _v_jaccard_completeness,
    "llm_transitive_dedup": _v_transitive,
    "an_spatial_join": _v_spatial,
    # the same Σcounts == 2×pairs algebra verifies BOTH directions; the
    # count query's own output (1 row per point) exceeds the driver-
    # compare row cap at 100×, so this is its at-scale evidence
    "geo_radius_count": _v_spatial,
    "geo_radius_topk": _v_topk,
    "ts_gap_fill": _v_gap_fill,
    "x_llm_knn_graph": _v_knn_recall,
    "x_stream_lsh_dedup": _v_stream_lsh_batch_eq,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.environ.get("OPS_SCALE_DIR", "/tmp/ops_scale/sf10"))
    ap.add_argument("--budget", type=float, default=180.0)
    ap.add_argument("--only", default="", help="comma-separated name prefixes")
    ap.add_argument("--json-out", default=os.path.join(REPO, "SCALE_SWEEP.json"), help="where to write the report (point smoke runs at /tmp so they cannot clobber committed evidence)")
    ap.add_argument("--no-verify", action="store_true", help="skip the flagship verification pass")
    ap.add_argument("--verify-max-rows", type=int, default=500_000, help="every oracle query at or under this output size is auto-verified (driver-compare collects both sides; 500k rows keeps toPandas bounded)")
    args = ap.parse_args()

    import ops_spark.queries as q
    from ops_spark.session import get_session

    q.load_all()
    spark = get_session(app_name="scale_sweep")
    sc = spark.sparkContext

    names = sorted(q.all_queries())
    if args.only:
        prefixes = tuple(p for p in args.only.split(",") if p)
        names = [n for n in names if n.startswith(prefixes)]

    from ops_spark.conformance import consume
    from ops_spark.session import release_query_memory

    results: dict[str, dict] = {}
    for name in names:
        timed_out = threading.Event()
        group = f"sweep:{name}"
        # Per-query JOB GROUP so a timer firing just as a query finishes
        # can only cancel ITS OWN query's jobs — cancelAllJobs() from a
        # late-bound closure could cancel the NEXT query and misreport a
        # healthy query as a timeout (Timer.cancel cannot stop an
        # already-running callback).
        sc.setJobGroup(group, f"scale sweep {name}", interruptOnCancel=True)

        def cancel(ev=timed_out, grp=group) -> None:
            ev.set()
            try:
                sc.cancelJobGroup(grp)
            except Exception:  # noqa: BLE001
                pass

        watchdog = threading.Timer(args.budget, cancel)
        watchdog.daemon = True
        t0 = time.perf_counter()
        try:
            watchdog.start()
            # consume (hash-all-columns), not count(): count(1) lets the
            # optimizer prune the whole enrichment join out of the plan
            n = consume(q.get_query(name).builder(spark, args.out))
            status = "ok"
        except Exception as exc:  # noqa: BLE001
            n = -1
            status = "timeout" if timed_out.is_set() else f"error: {str(exc)[:160]}"
        finally:
            watchdog.cancel()
            sc.setLocalProperty("spark.jobGroup.id", None)  # clear group
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"wall_sec": wall, "rows": n, "status": status}
        if status == "ok" and wall > args.budget:
            # cancelJobGroup only kills ACTIVE jobs — a query that crosses
            # the budget while the driver sits between jobs (AQE stage
            # boundaries, checkpoint actions) runs to completion. Record
            # the breach explicitly instead of letting it pass as a green
            # inside-budget row.
            results[name]["over_budget"] = True
        print(f"sweep {name}: {results[name]}", file=sys.stderr)
        release_query_memory(spark, quiet=True)  # bench-style hygiene

    # ---- verification pass (outside the timed windows) -----------------
    # Tiers: (a) EVERY oracle-bearing query whose at-scale output fits the
    # driver-style compare (<= 500k rows, so toPandas stays bounded; the
    # compare re-runs the Spark query and the DuckDB oracle on the derived
    # parquet and value-hashes both); (b) oracle-bearing queries OVER the
    # row cap get the aggregate-checksum compare (_v_agg_hash: row count +
    # per-column null count + md5-sum, computed natively in both engines —
    # VERDICT r7 #2a); (c) the hand-built invariant verifiers for
    # non-SQL-expressible flagships. After the pass, verify_skipped lists
    # EVERY ok-but-unverified query (VERDICT r7 #2b) — not just
    # top-by-wall ones — so the summary can never read stronger than the
    # evidence.
    ok_names = [n for n in results if results[n]["status"] == "ok"]
    auto_oracle, agg_oracle = set(), set()
    for n in ok_names:
        qq = q.get_query(n)
        if qq.oracle is None:
            continue
        if 0 <= results[n]["rows"] <= args.verify_max_rows:
            auto_oracle.add(n)
        else:
            agg_oracle.add(n)
    verifiers = {n: _v_oracle(n) for n in set(ORACLE_VERIFY) | auto_oracle}
    verifiers.update({n: _v_agg_hash(n) for n in agg_oracle - set(verifiers)})
    verifiers.update(INVARIANT_VERIFIERS)
    n_verified = 0
    if not args.no_verify:
        for name, verify in sorted(verifiers.items()):
            if name not in results or results[name]["status"] != "ok":
                continue
            vt0 = time.perf_counter()
            try:
                vok, detail = verify(spark, args.out)
            except Exception as exc:  # noqa: BLE001
                vok, detail = False, f"verifier error: {str(exc)[:160]}"
            results[name]["verified"] = {
                "ok": vok,
                "detail": detail,
                "wall_sec": round(time.perf_counter() - vt0, 2),
            }
            n_verified += int(vok)
            print(f"verify {name}: {results[name]['verified']}", file=sys.stderr)
            release_query_memory(spark, quiet=True)

    # exhaustive accounting: every ok row either has a verified entry or
    # appears here by name
    verify_skipped = [n for n in ok_names if "verified" not in results[n]]

    ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {
        "verify_skipped": sorted(verify_skipped),
        "n_verified_ok": n_verified,
        "n_verified_failed": sum(
            1
            for r in results.values()
            if "verified" in r and not r["verified"]["ok"]
        ),
        "out_dir": args.out,
        "budget_sec": args.budget,
        "n_queries": len(results),
        "n_ok": ok,
        "n_timeout": sum(1 for r in results.values() if r["status"] == "timeout"),
        "n_over_budget": sum(1 for r in results.values() if r.get("over_budget")),
        "n_error": sum(
            1 for r in results.values() if r["status"].startswith("error")
        ),
        "total_wall_sec": round(sum(r["wall_sec"] for r in results.values()), 1),
        "queries": results,
    }
    line = json.dumps(summary, indent=1, sort_keys=True)
    with open(args.json_out, "w") as fh:
        fh.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
