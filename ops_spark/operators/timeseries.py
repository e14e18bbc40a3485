"""Hypertable-style hierarchical time rollups (continuous aggregates).

The reference has no time-series module; this is the "hypertable rollup"
custom operator a metrics/events pipeline needs, expressed Spark-first.

The scale property is HIERARCHICAL REAGGREGATION: the raw table is scanned
and shuffled exactly once to build the finest resolution; every coarser
level aggregates the (orders-of-magnitude smaller) finest partials using
merge-safe partials — sum of sums, min of mins, count of counts — with
derived metrics (avg) computed only at presentation. At 100 TB of events,
the 1-day rollup therefore costs one pass over 1-hour partials, never a
second scan of the raw data. This is the same partial/final split
HashAggregate uses inside one query (partial → final), applied across
resolutions.

Plan shape (asserted in tests/test_operators.py): each finest-level row is
EXPLODED into one row per resolution (its own bucket plus each coarser
truncation), then a single groupBy(resolution, bucket, dims) merges all
levels at once — one parquet scan and exactly two shuffles regardless of
how many resolutions are requested. The naive union-of-levels formulation
plans a separate scan per level (exchange reuse does not fire across
union branches), which is precisely the shape this avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Merge-safe partials kept at every level.
_PARTIALS = ("cnt", "total", "vmin", "vmax")


def _truncate(ts_col: str, resolution: str):
    return F.date_trunc(resolution, F.col(ts_col))


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: list[str],
    dims: list[str] | None = None,
) -> DataFrame:
    """Multi-resolution rollup of ``value_col`` bucketed by ``ts_col``.

    ``resolutions`` must be ordered finest → coarsest and each coarser unit
    must align to the finer one (minute → hour → day → week...; all
    date_trunc units align). Returns one row per (resolution, bucket,
    *dims) with merge-safe partials + derived ``avg``.
    """
    if not resolutions:
        raise ValueError("at least one resolution required")
    dims = list(dims or [])

    finest = resolutions[0]
    fine = df.groupBy(_truncate(ts_col, finest).alias("bucket"), *dims).agg(
        F.count("*").alias("cnt"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    # One row per (fine bucket × resolution): date_trunc(finest, bucket) is
    # the identity, coarser units truncate further. Input to the explode is
    # already aggregated, so the multiplier applies to partials, not raw.
    memberships = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(res).alias("resolution"),
                    F.date_trunc(res, F.col("bucket")).alias("bucket"),
                )
                for res in resolutions
            ]
        )
    ).alias("lvl")
    return (
        fine.select(memberships, *dims, *_PARTIALS)
        .groupBy(F.col("lvl.resolution").alias("resolution"),
                 F.col("lvl.bucket").alias("bucket"), *dims)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        .select(
            "resolution",
            "bucket",
            *dims,
            *_PARTIALS,
            (F.col("total") / F.col("cnt")).alias("avg"),
        )
    )


def gap_fill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    resolution: str = "day",
) -> DataFrame:
    """Regularize a sparse per-key series onto a dense time grid, filling
    gaps by last-observation-carried-forward AND linear interpolation
    (TimescaleDB time_bucket_gapfill / locf / interpolate, Spark-first).

    Per key: bucket observations (max per bucket — deterministic across
    engines, unlike order-dependent double sums), build the dense grid
    with sequence(min, max, interval), left join observations back, then
    one window pass computes the previous/next observed value and bucket
    via last/first IGNORE NULLS. ``linear_e4`` is the interpolated value
    in floor-rounded 1e-4 units (engine-bit-exact; round()'s halfway rule
    is not portable), falling back to locf/nocb at the edges.

    Scale contract: the grid explode is span/step rows per key, the join
    is an equi join on (key, bucket), and both window specs partition by
    key — state is one key's series, never global. A single pathological
    key with a huge span is bounded by its own span/step, not by corpus
    size; AQE rebalances the post-explode skew.
    """
    bucket = F.date_trunc(resolution, F.col(ts_col))
    obs = df.groupBy(F.col(key_col), bucket.alias("bucket")).agg(
        F.max(value_col).alias("v")
    )
    spans = obs.groupBy(key_col).agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    step = F.expr(f"interval 1 {resolution}")
    grid = spans.select(
        key_col, F.explode(F.sequence("mn", "mx", step)).alias("bucket")
    )
    j = grid.join(obs, [key_col, "bucket"], "left")

    from pyspark.sql.window import Window as W

    back = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_t = F.when(F.col("v").isNotNull(), F.col("bucket"))
    w = (
        j.withColumn("prev_v", F.last("v", ignorenulls=True).over(back))
        .withColumn("prev_t", F.last(obs_t, ignorenulls=True).over(back))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("next_t", F.first(obs_t, ignorenulls=True).over(fwd))
    )
    frac = (
        (F.unix_timestamp("bucket") - F.unix_timestamp("prev_t")).cast("double")
        / (F.unix_timestamp("next_t") - F.unix_timestamp("prev_t")).cast("double")
    )
    interp = F.when(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("next_t") != F.col("prev_t")),
        F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
    )
    linear = F.coalesce(interp, F.col("prev_v"), F.col("next_v"))
    return w.select(
        F.col(key_col),
        F.col("bucket"),
        F.col("v"),
        F.col("prev_v").alias("locf"),
        F.floor(linear * 10000.0 + 0.5).cast("bigint").alias("linear_e4"),
    )


def merge_rollups(a: DataFrame, b: DataFrame, dims: list[str] | None = None) -> DataFrame:
    """Merge two time_rollup outputs into one — the incremental-maintenance
    half of the continuous-aggregate story: yesterday's materialized
    rollup + today's partition's rollup = the updated rollup, WITHOUT
    rescanning history. Valid because every kept column is a merge-safe
    partial (sum of sums, min of mins, max of maxes, count of counts);
    avg re-derives at the end. One union + one groupBy on the bucket keys.
    """
    dims = list(dims or [])
    keys = ["resolution", "bucket", *dims]
    merged = (
        a.select(*keys, *_PARTIALS)
        .unionByName(b.select(*keys, *_PARTIALS))
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return merged.select(
        *keys, *_PARTIALS, (F.col("total") / F.col("cnt")).alias("avg")
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    max_series_len: int | None = 1_000_000,
) -> DataFrame:
    """Per-key exponentially weighted moving average (recursive form
    s_t = alpha*x_t + (1-alpha)*s_{t-1}, s_0 = x_0 — pandas
    ewm(adjust=False) semantics), as a JVM higher-order fold.

    EWMA's recursion makes it inexpressible as a frame-window aggregate;
    instead each key's (ts, value) pairs are collected into one sorted
    array and folded — valid at scale WHEN per-key series fit in memory:
    per-task footprint is O(max series length) doubles, so ~10M points
    per key ≈ 160 MB in one aggregation buffer. One shuffle on the key.

    AUTO-DISPATCH: when any key's series exceeds ``max_series_len``
    (default 1M points ≈ 16 MB/fold buffer), the call transparently runs
    ``ewma_chunked`` (segment-then-carry: bounded per-task memory, ~4
    shuffles, identical results) with segment_len ≈ √longest. The probe
    is one map-side-combinable groupBy(key).count() — a (key, count)
    shuffle, cheap next to the operator's own collect — so a naive
    caller at 100 TB can no longer land on the per-key-memory-bound
    path. Pass ``max_series_len=None`` to skip the probe and force the
    single-shuffle collect-fold.
    """
    if max_series_len is not None:
        longest = (
            df.groupBy(key_col)
            .agg(F.count("*").alias("__n"))
            .agg(F.max("__n"))
            .first()[0]
        ) or 0
        if longest > max_series_len:
            return ewma_chunked(
                df,
                key_col,
                ts_col,
                value_col,
                alpha,
                segment_len=max(4096, int(longest**0.5) + 1),
            )
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
    )

    def fold(arr: Column) -> Column:
        acc0 = F.struct(
            F.array().cast("array<double>").alias("out"),
            F.lit(None).cast("double").alias("s"),
        )

        def step(acc: Column, x: Column) -> Column:
            s = F.when(
                acc["s"].isNull(), x["v"].cast("double")
            ).otherwise(alpha * x["v"] + (1.0 - alpha) * acc["s"])
            return F.struct(
                F.concat(acc["out"], F.array(s)).alias("out"), s.alias("s")
            )

        return F.aggregate(arr, acc0, step, lambda acc: acc["out"])

    from pyspark.sql import Column  # noqa: F401 (type for closures)

    folded = df.groupBy(key_col).agg(pairs.alias("__pairs"))
    exploded = folded.select(
        key_col,
        F.posexplode(F.arrays_zip(F.col("__pairs"), fold(F.col("__pairs")))).alias(
            "i", "z"
        ),
    )
    return exploded.select(
        key_col,
        F.col("z.__pairs.t").alias(ts_col),
        F.col("z.__pairs.v").alias(value_col),
        F.col("z.1").alias("ewma"),
    )


def ewma_chunked(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    segment_len: int = 4096,
) -> DataFrame:
    """``ewma`` with a BOUNDED per-task memory footprint: the plain
    operator collects each key's full series into one array (per-key
    memory = series length), which a 100 TB table with years of per-key
    history can exceed. This variant is the segment-then-carry form:

    1. row_number window assigns each row a per-key position; positions
       chunk into segments of ``segment_len``.
    2. Per (key, segment): fold the segment with ZERO incoming state,
       giving partial values p_i. EWMA's recursion is affine in the
       incoming state, so the true value is p_i + carry·(1-alpha)^(i+1).
    3. Per key: fold the (tiny) segment summaries (A = (1-alpha)^len,
       e = last partial) in segment order to get each segment's incoming
       carry: carry_0 = 0, carry_{k+1} = e_k + carry_k·A_k.
    4. Join carries back and emit p_i + carry·(1-alpha)^(i+1).

    Per-task memory is max(segment_len, n_segments) instead of the full
    series (pick segment_len ≈ sqrt(max series length) to balance).
    Costs ~4 shuffles vs the plain operator's 1 — use it when series
    genuinely exceed executor memory, not as the default. Identical
    results to ``ewma`` (same fold arithmetic, re-associated; exact in
    exact arithmetic, ~1 ulp in floats)."""
    from pyspark.sql import Window

    # order by (ts, value) — the SAME total order array_sort(struct(t,v))
    # gives the plain operator — so duplicate timestamps straddling a
    # segment boundary land deterministically and both variants fold the
    # tied rows in the same order.
    w = Window.partitionBy(key_col).orderBy(ts_col, value_col)
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.floor((F.row_number().over(w) - 1) / segment_len).alias("__seg"),
    )
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("__t").alias("t"), F.col("__v").alias("v")))
    )
    per_seg = base.groupBy("__k", "__seg").agg(pairs.alias("__pairs"))

    def zero_carry_fold(arr):
        # seg 0 keeps the s_0 = x_0 seeding of pandas ewm(adjust=False);
        # later segments fold the full alpha-blend from state 0 so the
        # incoming carry can be applied affinely afterwards.
        acc0 = F.struct(
            F.array().cast("array<double>").alias("out"),
            F.lit(None).cast("double").alias("s"),
        )

        def step(acc, x):
            seeded = F.when(F.col("__seg") == 0, x["v"]).otherwise(
                alpha * x["v"]
            )
            s = F.when(acc["s"].isNull(), seeded).otherwise(
                alpha * x["v"] + (1.0 - alpha) * acc["s"]
            )
            return F.struct(
                F.concat(acc["out"], F.array(s)).alias("out"), s.alias("s")
            )

        return F.aggregate(arr, acc0, step, lambda acc: acc["out"])

    folded = per_seg.select(
        "__k",
        "__seg",
        "__pairs",
        zero_carry_fold(F.col("__pairs")).alias("__p"),
    )
    summaries = folded.select(
        "__k",
        "__seg",
        F.pow(F.lit(1.0 - alpha), F.size("__p")).alias("__A"),
        F.element_at("__p", -1).alias("__e"),
    )
    # per-key carry recursion over the SUMMARIES (n_segments items, not n)
    seg_fold = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("__seg").alias("g"), "__A", "__e"))
        ),
        F.struct(
            F.array().cast("array<double>").alias("carries"),
            F.lit(0.0).alias("c"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["carries"], F.array(acc["c"])).alias("carries"),
            (x["__e"] + acc["c"] * x["__A"]).alias("c"),
        ),
        lambda acc: acc["carries"],
    )
    carries = (
        summaries.groupBy("__k")
        .agg(seg_fold.alias("__carries"))
        .select("__k", F.posexplode("__carries").alias("__seg", "__carry"))
    )
    joined = folded.join(carries, ["__k", "__seg"])
    exploded = joined.select(
        "__k",
        "__carry",
        F.posexplode(F.arrays_zip(F.col("__pairs"), F.col("__p"))).alias("i", "z"),
    )
    return exploded.select(
        F.col("__k").alias(key_col),
        F.col("z.__pairs.t").alias(ts_col),
        F.col("z.__pairs.v").alias(value_col),
        (
            F.col("z.__p")
            + F.col("__carry") * F.pow(F.lit(1.0 - alpha), F.col("i") + 1)
        ).alias("ewma"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Temporal INTERVAL OVERLAP equi-join: every (left, right) pair
    sharing ``key`` whose [start, end] microsecond intervals intersect
    (closed intervals: touch counts). The temporal-correlation shape —
    "which error windows overlapped which deploy windows" — that naive
    SQL writes as a per-key theta join (BroadcastNestedLoop at scale:
    quadratic per key, the skew wall).

    Spark-first plan: each interval explodes to its covered time buckets
    of width ``bucket_us`` (sequence() — bounded fan-out of
    span/bucket + 1 rows), the join runs as a plain HASH equi-join on
    (key, bucket) with the exact overlap predicate as a post-filter, and
    each surviving pair is emitted from exactly ONE bucket — the bucket
    containing the overlap's start (greatest of the two starts) — so no
    distinct/dedup shuffle is ever needed. Cost: |input| × fan-out
    through one shuffle, vs |left|×|right| per key for the nested loop.
    Pick bucket_us ≈ the median interval span: fan-out stays O(1) while
    bucket populations stay small.

    Inputs carry (key, start_col, end_col BIGINT epoch-microseconds) plus
    any payload columns; output is the joined pairs with left payload
    columns prefixed l_/r_ kept as-is plus overlap_us (exact BIGINT).

    Bucket arithmetic note: bucket = cast(us / width AS BIGINT) is exact
    for any positive epoch-us < 2^53 (≈ year 2255) — the double division
    is exactly representable, so the truncation equals integer division.
    """
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_us).cast("bigint"),
                (F.col(end_col) / bucket_us).cast("bigint"),
            )
        ),
    ).alias("l")
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_us).cast("bigint"),
                (F.col(end_col) / bucket_us).cast("bigint"),
            )
        ),
    ).alias("r")
    ls, le = F.col(f"l.{start_col}"), F.col(f"l.{end_col}")
    rs, re_ = F.col(f"r.{start_col}"), F.col(f"r.{end_col}")
    overlap_start = F.greatest(ls, rs)
    pairs = lb.join(
        rb,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l.__bucket") == F.col("r.__bucket"))
        # exact overlap (closed intervals)
        & (ls <= re_) & (rs <= le)
        # canonical-bucket guard: emit the pair ONLY from the bucket
        # holding the overlap start — exactly one bucket qualifies, so
        # no post-join dedup
        & (F.col("l.__bucket") == (overlap_start / bucket_us).cast("bigint")),
    )
    return pairs.select(
        F.col(f"l.{key}").alias(key),
        *[
            F.col(f"l.{c}").alias(f"l_{c}")
            for c in left.columns
            if c != key
        ],
        *[
            F.col(f"r.{c}").alias(f"r_{c}")
            for c in right.columns
            if c != key
        ],
        (F.least(le, re_) - overlap_start).alias("overlap_us"),
    )
