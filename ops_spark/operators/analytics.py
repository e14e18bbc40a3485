"""Warehouse / product-analytics operators: SCD2 merge, funnel, cohort
retention, fixed-bin histograms, and Z-order layout keys.

The reference is a SQL engine, not an analytics library — these are the
composite operators its users hand-write on top (SURVEY §2 covers their
building blocks: joins, windows, aggregates). Re-expressed here as reusable
DataFrame combinators with explicit 100 TB shapes:

- scd2_merge: one equi join + union — the slowly-changing-dimension type-2
  upsert every warehouse runs nightly; no MERGE INTO needed (that's a
  table-format feature, not an engine feature).
- funnel_steps: k-step ordered funnel as k chained (agg → equi-join)
  stages on the user key — never a per-user sort of the whole event log.
- cohort_retention: two aggregations (first-seen, then cohort×offset),
  both map-side combinable.
- numeric_histogram: one groupBy on a codegen bucket expression.
- zorder_key: bit-interleaving as a pure column expression; sorting or
  range-partitioning by it before a write gives multi-dimensional data
  skipping (min/max pruning works on BOTH dimensions), the standard
  layout trick for 100 TB scan-heavy tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    update_ts: str,
    eff_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge.

    ``current`` carries the dimension history (open rows have NULL
    ``end_col``); ``updates`` is the incoming snapshot with an ``update_ts``
    column. Open rows whose tracked attributes changed are closed at the
    update timestamp and a new open version is inserted; brand-new keys are
    inserted; unchanged and already-closed rows pass through.

    One equi join on the business key + a union — the whole merge is a
    single shuffle by key (plus the union's no-op), so it scales as a
    plain join. Null-safe comparison (eqNullSafe) so NULL→value and
    value→NULL transitions count as changes.

    Contract: ``updates`` is a SNAPSHOT — at most one row per business
    key (dedupe an event stream to latest-per-key first; multiple update
    rows for one key would fan out through the join).
    """
    open_rows = current.filter(F.col(end_col).isNull())
    closed_rows = current.filter(F.col(end_col).isNotNull())

    changed_cond = ~F.expr(
        " AND ".join(f"cur.{c} <=> upd.{c}" for c in tracked_cols)
    )
    j = open_rows.alias("cur").join(
        updates.alias("upd"), [F.col(f"cur.{k}") == F.col(f"upd.{k}") for k in key_cols], "full_outer"
    )

    cur_cols = [f"cur.{k}" for k in key_cols] + [f"cur.{c}" for c in tracked_cols]
    upd_cols = [f"upd.{k}" for k in key_cols] + [f"upd.{c}" for c in tracked_cols]
    has_cur = F.col(f"cur.{key_cols[0]}").isNotNull()
    has_upd = F.col(f"upd.{key_cols[0]}").isNotNull()

    # All three merge outcomes come from ONE execution of the full-outer
    # join: the former three-way filter+union re-planned (and re-ran) the
    # join per branch. Each joined row emits its 1-2 output rows through
    # a single explode over conditional structs:
    # 1. open row with no update, or an identical update: unchanged;
    # 2. open row whose tracked values changed: closed at update_ts;
    # 3. changed keys + brand-new keys: a new open-ended version.
    def _branch(cond, cols_src, eff, end):
        return F.when(
            cond,
            F.struct(
                *[F.col(c).alias(c.split(".")[1]) for c in cols_src],
                eff.alias(eff_col),
                end.alias(end_col),
            ),
        )

    null_end = F.lit(None).cast(current.schema[end_col].dataType)
    merged = (
        j.select(
            F.explode(
                F.filter(
                    F.array(
                        _branch(
                            has_cur & (~has_upd | ~changed_cond),
                            cur_cols,
                            F.col(f"cur.{eff_col}"),
                            F.col(f"cur.{end_col}"),
                        ),
                        _branch(
                            has_cur & has_upd & changed_cond,
                            cur_cols,
                            F.col(f"cur.{eff_col}"),
                            F.col(f"upd.{update_ts}"),
                        ),
                        _branch(
                            has_upd & (~has_cur | changed_cond),
                            upd_cols,
                            F.col(f"upd.{update_ts}"),
                            null_end,
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("__r")
        )
        .select("__r.*")
    )
    return closed_rows.select(
        *key_cols, *tracked_cols, eff_col, end_col
    ).unionByName(merged)


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered k-step funnel: per user, the earliest time each step was
    reached AFTER the previous step's time. Returns one row per user with
    t_1..t_k (NULL once the funnel breaks).

    Shape: k chained (filter → groupBy(user).min(ts) → equi join) stages.
    Each stage shuffles only users who survived the previous step — a
    shrinking frontier, never a per-user sort of the full event log.
    """
    if not steps:
        raise ValueError("at least one funnel step required")
    # SIZE-GATED per-step checkpoints (materialize_if_large, VERDICT r11
    # #1): each round references the previous frontier TWICE (inside nxt
    # and as the left side of the join), so without materialization the
    # k-step chain replays every earlier step's filter-aggregate subtree
    # per reference — 20 live event-log scans at k=3 in the r11 fixture
    # audit. At fixture scale that replay measured FASTER (cheap
    # column-pruned aggregates on idle cores — the r11 revert); above the
    # gate each replay is a full event-log pass, so the frontier (one
    # narrow row per surviving user) is checkpointed and the superseded
    # round freed, capping the plan at one event-log scan per step.
    from ops_spark.operators.blocks import free_checkpoint, materialize_if_large

    raw = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    out, prev_ckpt = materialize_if_large(raw), None
    if out is not raw:
        prev_ckpt = out
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(out.select(user_col, f"t_{i-1}"), user_col)
            .filter(F.col("__ts") > F.col(f"t_{i-1}"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
        joined = out.join(nxt, user_col, "left")
        out = materialize_if_large(joined)
        if out is not joined:
            # the new frontier is eagerly materialized — the superseded
            # round's blocks are no longer referenced by anything lazy
            if prev_ckpt is not None:
                free_checkpoint(prev_ckpt)
            prev_ckpt = out
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active period, then
    distinct-user counts per (cohort, periods_since).

    Two aggregations, both map-side combinable: first-seen per user, then
    count per (cohort, offset) over the (user × active-period) pairs. The
    join attaching cohorts to activity is equi on the user key.
    """
    unit_days = {"day": 1, "week": 7}[period]
    bucket = F.date_trunc(period, F.col(ts_col))
    first_seen = events.groupBy(user_col).agg(F.min(bucket).alias("cohort"))
    active = events.select(user_col, bucket.alias("p")).distinct()
    return (
        active.join(first_seen, user_col)
        .withColumn(
            "periods_since",
            # floor(), not a bare bigint cast: Spark's double->bigint cast
            # truncates while other engines round — floor is portable.
            F.floor(F.datediff("p", "cohort") / unit_days).cast("bigint"),
        )
        .groupBy("cohort", "periods_since")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def numeric_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width histogram: bucket index (1..nbins, 0/nbins+1 for
    under/overflow), count, and per-bucket min/max. One codegen bucket
    expression + one groupBy — the profiling primitive for 100 TB numeric
    columns (df.stat's approxQuantile complements it for quantiles).

    Bucket = least(floor((v - lo)/width) + 1, nbins) — the least() clamp
    keeps fp-rounding of width from pushing in-range values into the
    overflow bucket; identical arithmetic is reproducible in any engine
    (width_bucket() exists in Spark 3.5+, but the explicit formula keeps
    the oracle contract exact).
    """
    width = (hi - lo) / nbins
    v = F.col(value_col)
    bucket = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(nbins + 1))
        # least(): when width = (hi-lo)/nbins rounds DOWN in floating
        # point, a value just below hi can floor to nbins — clamp it into
        # the top in-range bucket instead of the overflow bucket.
        .otherwise(
            F.least(
                (F.floor((v - F.lit(lo)) / F.lit(width)) + 1).cast("int"),
                F.lit(nbins),
            )
        )
    )
    return (
        df.select(bucket.alias("bucket"), v.alias("v"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
    )


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns — x in even positions, y in odd.

    Pure codegen (shift/mask/sum), no UDF. Range-partitioning or sorting
    by this key before a write co-locates rows that are close in BOTH
    dimensions, so parquet min/max stats prune on either predicate — the
    standard multi-dimensional layout optimization for scan-heavy tables
    (Delta/Iceberg expose the same idea as OPTIMIZE ZORDER BY).
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_cluster(df, n: int, a: str, b: str):
    """Physically re-cluster ``df`` into ``n`` output partitions along
    the Morton curve over columns (a, b): each column quantizes into
    1024 uniform cells between its observed min/max (one tiny agg — the
    only driver-side state), the cell ids bit-interleave via zorder_key,
    and rows range-partition + sort by that key. Every written file then
    covers a tight rectangle in BOTH dimensions, so per-file min/max
    stats prune on either predicate — Delta/Iceberg's OPTIMIZE ZORDER
    BY. Shared by compact_parquet and compact_snapshot so the clustering
    exists exactly once."""
    from pyspark.sql import functions as F

    st = df.agg(
        F.min(a).alias("alo"), F.max(a).alias("ahi"),
        F.min(b).alias("blo"), F.max(b).alias("bhi"),
    ).first()

    def cell(c, lo, hi):
        if lo is None or hi is None or hi <= lo:
            return F.lit(0)
        # 1024 uniform cells; clamp the max value into the top cell
        return F.least(
            F.floor(
                (F.col(c) - F.lit(lo)) * 1024.0 / (F.lit(hi) - F.lit(lo))
            ).cast("int"),
            F.lit(1023),
        )

    z = zorder_key(cell(a, st.alo, st.ahi), cell(b, st.blo, st.bhi))
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_key_sql(x: str, y: str, bits: int = 10) -> str:
    """The DuckDB/ANSI expression reproducing zorder_key bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
