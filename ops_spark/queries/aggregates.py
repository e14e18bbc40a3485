"""Aggregation operator coverage (SURVEY.md §2.4).

Reference surface being reproduced: HashAggregateExec partial→final planning
(reference: aggregate/HashAggregateExec.scala:40, AggUtils.scala:75,119),
declarative agg functions (catalyst/expressions/aggregate/*.scala), DISTINCT
rewrite (optimizer/RewriteDistinctAggregates), grouping sets / rollup / cube
(Analyzer.scala ResolveGroupingAnalytics:291 → ExpandExec.scala:37), pivot
(Analyzer.scala ResolvePivot:527), exact and approximate percentiles
(Percentile.scala, ApproximatePercentile.scala), HLL++ count-distinct
(HyperLogLogPlusPlus.scala), collect_list/collect_set (collect.scala:137),
and df.stat helpers (DataFrameStatFunctions.scala:71,214,261).

Scale notes: every aggregate here keeps map-side partial aggregation; the
DISTINCT variants plan as Expand + double aggregation (shuffle on
group+distinct keys first) which is the scalable strategy at 100 TB; the
approx sketches exist precisely because exact distinct at that scale is a
full shuffle of the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)                 AS distinct_parts,
           count(DISTINCT l_suppkey)                 AS distinct_supps,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders,
           count(*)                                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Multiple DISTINCT aggregates in one GROUP BY (Expand-based rewrite).",
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_extendedprice), 4) AS std_price,
           round(var_samp(l_extendedprice), 2)    AS var_price,
           round(stddev_pop(l_quantity), 6)       AS stdp_qty,
           round(var_pop(l_quantity), 6)          AS varp_qty,
           round(corr(l_quantity, l_extendedprice), 6)      AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qty_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
    description="Statistical aggregates: stddev/variance (samp+pop), corr, covariance.",
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CentralMomentAgg-family functions (reference CentralMomentAgg.scala:223,
    # Corr.scala, Covariance.scala) — all stream single-pass moments, so they
    # partial-aggregate map-side like sum/count.
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("stdp_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qty_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="ROLLUP hierarchy totals (ExpandExec-based grouping analytics).",
    tags=("aggregate", "grouping-sets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) * 2
             + CAST(grouping(l_linestatus) AS INT) AS gid,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="CUBE with grouping_id disambiguation of null group keys.",
    tags=("aggregate", "grouping-sets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_price")


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="Explicit GROUPING SETS via SQL entry point (parser→ExpandExec).",
    tags=("aggregate", "grouping-sets", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exercises the SQL entry point (reference SparkSession.scala:641 →
    # AstBuilder) rather than the DataFrame DSL.
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Pivot on explicit value list (ResolvePivot → conditional aggs).",
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit value list avoids the extra distinct-values job the reference
    # would otherwise run (pyspark group.py:195) — at 100 TB you always pass
    # the list.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(quantile_cont(l_quantity, 0.25), 4)      AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Exact interpolated percentiles (ObjectHashAggregate path).",
    tags=("aggregate", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact percentile buffers values per group (reference Percentile.scala —
    # ObjectHashAggregateExec.scala:60 path). Scale note: exact percentiles
    # at 100 TB require the full value multiset per group; prefer
    # approx_percentile (see x_agg_approx) unless group cardinality is bounded.
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price"),
        F.round(F.percentile("l_quantity", 0.25), 4).alias("p25_qty"),
    )


@register(
    "x_agg_approx",
    oracle=None,  # sketch internals differ between engines; driver does rows-only
    description="Approximate sketches: HLL++ distinct + approx percentile (t-digest-ish).",
    tags=("aggregate", "approx", "sketch"),
)
def x_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ (reference HyperLogLogPlusPlus.scala, registry
    # FunctionRegistry.scala:273) and ApproximatePercentile.scala:323. The
    # 100 TB path: fixed-size sketches shuffle O(groups × sketch) bytes
    # instead of O(rows).
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list(DISTINCT c_nationkey ORDER BY c_nationkey), ',')
             AS nations,
           count(*) AS n
    FROM customer
    WHERE c_custkey <= 200
    GROUP BY c_mktsegment
    """,
    description="collect_set with deterministic ordering via sort_array.",
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_set order is nondeterministic (reference collect.scala:137 uses
    # a hash set) — sort_array + array_join pins a canonical form. Scale
    # note: collected arrays must be bounded per group (here ≤25 nations).
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.groupBy("c_mktsegment").agg(
        F.array_join(
            F.sort_array(F.collect_set("c_nationkey")).cast("array<string>"), ","
        ).alias("nations"),
        F.count("*").alias("n"),
    )


@register(
    "agg_first_last",
    oracle="""
    SELECT o_orderstatus,
           (min(struct_pack(d := o_orderdate, k := o_orderkey))).k AS first_order,
           (max(struct_pack(d := o_orderdate, k := o_orderkey))).k AS last_order,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="Deterministic first/last per group via lexicographic struct min/max.",
    tags=("aggregate",),
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's First/Last aggregates (First.scala:108, Last.scala:106)
    # are explicitly non-deterministic without ordering; min/max over a
    # (date, key) struct is the deterministic single-pass equivalent —
    # min_by/max_by would still tie-break arbitrarily on duplicate dates.
    orders = _t(spark, sf_dir, "orders")
    ordered = F.struct(F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    return orders.groupBy("o_orderstatus").agg(
        F.min(ordered).getField("k").alias("first_order"),
        F.max(ordered).getField("k").alias("last_order"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "stat_crosstab",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS F,
           sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Contingency table (df.stat.crosstab capability).",
    tags=("aggregate", "stat"),
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    # df.stat.crosstab (reference DataFrameStatFunctions.scala:214) returns a
    # stringly-typed first column; we express the same contingency table with
    # pivot-count to keep types clean for the oracle.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("l_returnflag", "l_returnflag")
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(l_linenumber AS BIGINT)) AS b_and,
           bit_or(CAST(l_linenumber AS BIGINT))  AS b_or,
           bit_xor(CAST(l_linenumber AS BIGINT)) AS b_xor,
           CAST(sum(l_linenumber << 2) AS BIGINT) AS shifted_sum
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY l_returnflag
    """,
    description="Bitwise aggregate functions (bit_and/bit_or/bit_xor, "
    "registry kin FunctionRegistry bitwiseExpressions) + shiftleft "
    "scalar — exercises the long-typed mutable aggregation buffer path.",
    tags=("aggregate", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    ln = F.col("l_linenumber").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(ln).alias("b_and"),
        F.bit_or(ln).alias("b_or"),
        F.bit_xor(ln).alias("b_xor"),
        F.sum(F.shiftleft(F.col("l_linenumber"), 2)).cast("bigint").alias("shifted_sum"),
    )


@register(
    "stat_bitmap_distinct",
    oracle="""
    SELECT CAST((o_custkey - 1) // 32768 + 1 AS BIGINT) AS bucket,
           CAST(count(DISTINCT (o_custkey - 1) % 32768) AS BIGINT) AS n_distinct
    FROM orders
    WHERE o_custkey >= 1
    GROUP BY 1
    """,
    description="Bitmap aggregate family (Spark 3.5 bitmapExpressions kin): "
    "bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg / "
    "bitmap_count compose into exact per-bucket distinct counts with "
    "fixed-size (4 KB) state per bucket — the scalable exact-distinct "
    "pattern (vs unbounded collect_set state). Restricted to ids >= 1: "
    "Spark's bucket/position arithmetic for non-positive ids (v=0 -> "
    "bucket 0, pos 0) does not match DuckDB's truncating // — and bitmap "
    "ids are 1-based by design. Oracle recomputes the arithmetic "
    "symbolically.",
    tags=("aggregate", "bitmap", "sketch"),
)
def stat_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") >= 1)
    return (
        o.select(
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("bucket")
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(pos))")
            .cast("bigint")
            .alias("n_distinct")
        )
    )


@register(
    "ts_rollup_hierarchy",
    oracle="""
    WITH fine AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             CAST(count(*) AS BIGINT) AS cnt, sum(value) AS total,
             min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY 1, 2
    ),
    coarse AS (
      SELECT date_trunc('day', bucket) AS bucket, event_type,
             CAST(sum(cnt) AS BIGINT) AS cnt, sum(total) AS total,
             min(vmin) AS vmin, max(vmax) AS vmax
      FROM fine GROUP BY 1, 2
    ),
    both_levels AS (
      SELECT 'hour' AS resolution, * FROM fine
      UNION ALL
      SELECT 'day' AS resolution, * FROM coarse
    )
    SELECT resolution, bucket, event_type, cnt,
           round(total, 4) AS total, round(vmin, 4) AS vmin,
           round(vmax, 4) AS vmax,
           round(round(total, 4) / cnt, 6) AS avg
    FROM both_levels
    """,
    description="Hypertable-style hierarchical time rollup "
    "(operators/timeseries.py): hour buckets from raw events, day buckets "
    "reaggregated FROM the hour partials (sum-of-sums/min-of-mins — one "
    "raw scan total, the continuous-aggregate pattern at 100 TB); avg "
    "derived at presentation. Oracle mirrors the two-level recurrence.",
    tags=("aggregate", "timeseries", "custom-operator"),
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.timeseries import time_rollup

    ev = _t(spark, sf_dir, "events")
    out = time_rollup(
        ev, "ts", "value", resolutions=["hour", "day"], dims=["event_type"]
    )
    # avg is derived from the ROUNDED total on both sides: double summation
    # order differs between engines, and round(raw_total/cnt) can land on
    # opposite sides of a rounding boundary; round(round(total,4)/cnt) is
    # computed from byte-identical inputs.
    return out.select(
        "resolution",
        "bucket",
        "event_type",
        "cnt",
        F.round("total", 4).alias("total"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
        F.round(F.round("total", 4) / F.col("cnt"), 6).alias("avg"),
    )


@register(
    "stat_approx_topk",
    oracle="""
    SELECT o_orderpriority AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="approx_top_k sketch aggregate (Spark 4 ApproxTopK; "
    "space-saving summary). The fixture domain (5 priorities) is far "
    "below maxItemsTracked, where the sketch is EXACT — so the oracle is "
    "plain GROUP BY counts and the result is exploded to (item, cnt) "
    "rows (the driver compares row sets, dodging sketch tie order).",
    tags=("aggregate", "sketch", "approx"),
)
def stat_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    sk = o.agg(F.expr("approx_top_k(o_orderpriority, 5)").alias("top"))
    return sk.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").cast("bigint").alias("cnt")
    )


@register(
    "ts_gap_fill",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, max(value) AS v
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
      FROM spans
    ), j AS (
      SELECT g.user_id, g.bucket, o.v
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
    ), w AS (
      SELECT user_id, bucket, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM j
    )
    SELECT user_id, bucket, v, prev_v AS locf,
      CAST(floor(coalesce(
        CASE WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t <> prev_t
             THEN prev_v + (next_v - prev_v) *
                  (CAST(CAST(epoch(bucket) AS BIGINT)
                        - CAST(epoch(prev_t) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(epoch(next_t) AS BIGINT)
                          - CAST(epoch(prev_t) AS BIGINT) AS DOUBLE))
        END, prev_v, next_v) * 10000.0 + 0.5) AS BIGINT) AS linear_e4
    FROM w
    """,
    description="Time-series gap fill + locf + linear interpolation "
    "(operators/timeseries.py:gap_fill — TimescaleDB "
    "time_bucket_gapfill/locf/interpolate re-expressed as sequence() grid "
    "+ per-key IGNORE-NULLS windows). Sparse per-user daily 'error' "
    "series densified; interpolated values in floor-e4 micro-units so "
    "both engines agree bit-for-bit.",
    tags=("aggregate", "timeseries", "window", "custom-operator"),
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.timeseries import gap_fill

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return gap_fill(ev, "ts", "user_id", "value", resolution="day")


@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, value,
             sum(value) OVER win AS s,
             sum(value * value) OVER win AS s2,
             count(*) OVER win AS n
      FROM events
      WHERE event_type = 'view'
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, value,
           CAST(floor(CASE WHEN n >= 4 AND (s2 - s * s / n) / (n - 1) > 0
                 THEN (value - s / n)
                      / sqrt((s2 - s * s / n) / (n - 1))
                 ELSE 0.0 END * 100.0 + 0.5) AS BIGINT) AS zscore_e2
    FROM w
    """,
    description="Rolling z-score anomaly detection per user over trailing-7 "
    "'view' events: mean/std built from explicit sum/sum-of-squares window "
    "aggregates (NOT the stddev function, whose Welford accumulation order "
    "is engine-internal) so both engines fold the same frame in the same "
    "order; scores in floor-e2 units. Window state is one user's frame — "
    "scale-safe.",
    tags=("aggregate", "timeseries", "window", "anomaly"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    s = F.sum("value").over(win)
    s2 = F.sum(F.col("value") * F.col("value")).over(win)
    n = F.count("*").over(win)
    var = (s2 - s * s / n) / (n - 1)
    z = F.when((n >= 4) & (var > 0), (F.col("value") - s / n) / F.sqrt(var)).otherwise(
        0.0
    )
    return ev.select(
        "user_id",
        "ts",
        "value",
        F.floor(z * 100.0 + 0.5).cast("bigint").alias("zscore_e2"),
    )


@register(
    "agg_skew_kurt",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus, avg(o_totalprice) AS mu
      FROM orders GROUP BY o_orderstatus
    ), mom AS (
      SELECT o.o_orderstatus,
             avg(pow(o.o_totalprice - m.mu, 2)) AS m2,
             avg(pow(o.o_totalprice - m.mu, 3)) AS m3,
             avg(pow(o.o_totalprice - m.mu, 4)) AS m4
      FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus
      GROUP BY o.o_orderstatus
    )
    SELECT o_orderstatus,
           CAST(floor(m3 / pow(m2, 1.5) * 10000.0 + 0.5) AS BIGINT) AS skew_e4,
           CAST(floor((m4 / (m2 * m2) - 3.0) * 10000.0 + 0.5) AS BIGINT) AS kurt_e4
    FROM mom
    """,
    description="skewness/kurtosis declarative aggregates (reference "
    "CentralMomentAgg.scala — SURVEY §2.4 row): Spark computes POPULATION "
    "moments (m3/m2^1.5, m4/m2²-3), while DuckDB's built-ins are "
    "sample-adjusted, so the oracle recomputes Spark's definition from "
    "explicit two-pass moments; floor-e4 units absorb streaming-vs-two-"
    "pass ulp drift.",
    tags=("aggregate", "stats"),
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.floor(F.skewness("o_totalprice") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("skew_e4"),
        F.floor(F.kurtosis("o_totalprice") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("kurt_e4"),
    )


@register(
    "x_ts_ewma",
    oracle=None,  # the EWMA recursion has no clean single-statement SQL
    # form; semantics are pinned against pandas ewm(adjust=False) in
    # tests/test_operators.py::test_ewma_matches_pandas
    description="Per-user EWMA of event values (operators/timeseries.py:"
    "ewma): the recursive smoother as a JVM higher-order fold over each "
    "key's time-sorted series — one shuffle on the key; per-key series "
    "bound documented (shard long series by time range).",
    tags=("timeseries", "window", "custom-operator"),
)
def x_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.timeseries import ewma

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    out = ewma(ev, "user_id", "ts", "value", alpha=0.3)
    return out.select(
        "user_id", "ts", "value", F.round("ewma", 6).alias("ewma")
    )


@register(
    "x_ts_ewma_chunked",
    oracle=None,  # same non-SQL recursion as x_ts_ewma; equivalence to the
    # single-array fold is pinned in
    # tests/test_operators.py::test_ewma_chunked_matches_plain_ewma
    description="Per-user EWMA via the segment-then-carry form "
    "(operators/timeseries.py:ewma_chunked): bounded per-task memory "
    "max(segment_len, n_segments) instead of the full series — the shape "
    "for multi-year per-key histories at 100 TB. EWMA's recursion is "
    "affine in the incoming state, so segments fold with zero carry and a "
    "tiny per-key fold over segment summaries reconstructs exact values.",
    tags=("timeseries", "window", "custom-operator", "scale"),
)
def x_ts_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.timeseries import ewma_chunked

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    # segment_len far below real series lengths so the carry path executes
    out = ewma_chunked(ev, "user_id", "ts", "value", alpha=0.3, segment_len=16)
    return out.select(
        "user_id", "ts", "value", F.round("ewma", 6).alias("ewma")
    )


@register(
    "ts_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS s,
             CAST(epoch_us(ts) AS BIGINT)
               + CAST(floor(value * 60000000.0 + 0.5) AS BIGINT) AS e
      FROM events WHERE event_type IN ('error', 'click')
    ),
    p AS (
      SELECT a.user_id AS user_id,
             least(a.e, b.e) - greatest(a.s, b.s) AS ov
      FROM iv a JOIN iv b
        ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
      WHERE a.event_type = 'error' AND b.event_type = 'click'
    )
    SELECT user_id, count(*) AS n_overlaps,
           CAST(sum(ov) AS BIGINT) AS total_overlap_us
    FROM p GROUP BY user_id
    """,
    description="Temporal INTERVAL OVERLAP join "
    "(operators/timeseries.py:interval_overlap_join): per-user 'error' "
    "windows [ts, ts + value minutes] intersected with 'click' windows. "
    "Naive SQL is a per-key theta join (nested-loop at scale); the "
    "operator explodes each interval to its covered hour buckets "
    "(bounded sequence() fan-out), hash-joins on (user, bucket), and "
    "emits each pair from exactly ONE bucket — the one holding the "
    "overlap start — so no dedup shuffle exists. Overlap durations are "
    "exact BIGINT microseconds; the oracle is the direct inequality "
    "join (DuckDB IEJoin).",
    tags=("aggregate", "timeseries", "join", "custom-operator"),
)
def ts_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.timeseries import interval_overlap_join

    ev = _t(spark, sf_dir, "events")

    def iv(etype: str) -> DataFrame:
        s = F.unix_micros("ts")
        dur = F.floor(F.col("value") * 60000000.0 + F.lit(0.5)).cast("bigint")
        return ev.filter(F.col("event_type") == etype).select(
            "user_id", s.alias("start_us"), (s + dur).alias("end_us")
        )

    pairs = interval_overlap_join(iv("error"), iv("click"), "user_id")
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum("overlap_us").cast("bigint").alias("total_overlap_us"),
    )
