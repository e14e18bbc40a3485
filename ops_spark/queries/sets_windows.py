"""Set operations (SURVEY.md §2.7) and window functions (§2.5-2.6).

Reference surface: UnionExec (basicPhysicalOperators.scala:565),
Intersect→semi / Except→anti / Distinct→Aggregate rewrites
(Optimizer.scala:148-151), intersectAll/exceptAll (pyspark
dataframe.py:1495,297), WindowExec partition-sorted frame evaluation
(window/WindowExec.scala:81, WindowFunctionFrame.scala), ranking+analytic
functions (windowExpressions.scala, FunctionRegistry.scala:466-475),
ROWS/RANGE frames (pyspark window.py:87-206), top-k
(TakeOrderedAndProjectExec, limit.scala:124).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _order_halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of orders for set-op queries."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 150000).select(
        "o_custkey", "o_orderstatus"
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", "o_orderstatus"
    )
    return a, b


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_totalprice > 150000
    UNION
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="UNION (bag union + distinct aggregate rewrite).",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey, o_orderstatus, count(*) AS n FROM (
      SELECT o_custkey, o_orderstatus
      FROM orders WHERE o_totalprice > 150000
      UNION ALL
      SELECT o_custkey, o_orderstatus
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ) GROUP BY o_custkey, o_orderstatus
    """,
    description="UNION ALL preserving duplicates (verified via count per key).",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.union(b).groupBy("o_custkey", "o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_totalprice > 150000
    INTERSECT
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="INTERSECT → left-semi + distinct rewrite.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.intersect(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_totalprice > 150000
    INTERSECT ALL
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="INTERSECT ALL (multiset intersection, min-multiplicity).",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_totalprice > 150000
    EXCEPT
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="EXCEPT → left-anti + distinct rewrite.",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.distinct().exceptAll(b.distinct())


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_totalprice > 150000
    EXCEPT ALL
    SELECT o_custkey, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="EXCEPT ALL (multiset difference, multiplicity-subtracting).",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _order_halves(spark, sf_dir)
    return a.exceptAll(b)


@register(
    "dedup_drop_duplicates",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    description="dropDuplicates → Aggregate rewrite (Optimizer.scala:122).",
    tags=("setop", "dedup"),
)
def dedup_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
    )


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           CAST(ntile(4)  OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    description="All six ranking window functions over one partition spec.",
    tags=("window", "ranking"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One window spec → one shuffle+sort pass evaluates all six functions
    # (reference WindowExec.scala:81 groups frames per spec). Unique
    # tie-break (c_custkey) keeps rank/ntile deterministic.
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "window_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders WHERE o_custkey <= 100
    """,
    description="ROWS frames: running total + 3-row moving average.",
    tags=("window", "frame"),
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    ob = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(ob.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).alias("running_total"),
        F.round(
            F.avg("o_totalprice").over(ob.rowsBetween(-2, W.currentRow)), 4
        ).alias("moving_avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice,
           count(*) OVER (
             ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS n_similar_size
    FROM part WHERE p_partkey <= 500
    """,
    description="RANGE frame over a numeric ordering (value-based bounds).",
    tags=("window", "frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frames bound by value, not row position (reference
    # WindowFunctionFrame.scala sliding-frame machinery). Unpartitioned
    # window = single-reducer sort: fine for bounded dims, never for fact
    # tables at 100 TB (partition first, as window_ranking does).
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    w = W.orderBy("p_size").rangeBetween(-2, 2)
    return part.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.count("*").over(w).alias("n_similar_size"),
    )


@register(
    "window_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           date_diff('day',
                     lag(o_orderdate) OVER w,
                     o_orderdate)::BIGINT AS days_since_prev
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="lead/lag analytic functions + inter-order gap computation.",
    tags=("window", "analytic"),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
    description="Top-k per group: the scalable pattern (no global sort).",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group top-k via row_number + filter: one shuffle on the group key;
    # at 100 TB, AQE handles group skew. (Global top-k is q3/q10's
    # TakeOrderedAndProject.)
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 3600
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
    """,
    description="Batch sessionization: gap>1h via lag + cumulative sum.",
    tags=("window", "sessionize", "custom-operator"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The lag+cumsum sessionizer — one shuffle on user_id, both window
    # passes share the same partitioning (Catalyst plans a single Exchange).
    # Streaming variant: ops_spark.streaming session_window.
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 100)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # load_table normalizes events.ts to TIMESTAMP (LTZ), but keep the
    # defensive hop: if a caller hands raw-parquet NTZ, NTZ→BIGINT is an
    # illegal cast while NTZ→TIMESTAMP→BIGINT is identity under UTC.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 3600), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER w2   AS second_price,
           first_value(big IGNORE NULLS) OVER w AS first_big,
           last_value(o_totalprice) OVER w2     AS last_price
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big
      FROM orders WHERE o_custkey <= 100
    )
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
      w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    description="Window value functions (windowExpressions.scala:741 kin): "
    "nth_value over the entire frame, first_value with IGNORE NULLS over a "
    "running frame, last_value over the entire frame.",
    tags=("window", "analytic"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    big = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w2).alias("second_price"),
        F.first(big, ignorenulls=True).over(w).alias("first_big"),
        F.last("o_totalprice").over(w2).alias("last_price"),
    )


@register(
    "set_union_by_name_missing",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name, CAST(n_regionkey AS BIGINT) AS region,
           CAST(NULL AS VARCHAR) AS segment
    FROM nation
    UNION ALL
    SELECT c_custkey AS id, c_name AS name, CAST(NULL AS BIGINT) AS region,
           c_mktsegment AS segment
    FROM customer WHERE c_custkey <= 100
    """,
    description="unionByName(allowMissingColumns=True): position-"
    "independent union where each side's missing columns fill with NULL — "
    "the schema-evolution-safe union (positional UNION silently "
    "misaligns). Oracle is the explicit padded UNION ALL.",
    tags=("set", "union"),
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("bigint").alias("region"),
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return n.unionByName(c, allowMissingColumns=True)
