"""Join operator coverage (SURVEY.md §2.3).

Reference surface: JoinSelection strategy (reference:
SparkStrategies.scala:148-235) planning BroadcastHashJoinExec:40,
SortMergeJoinExec:36, ShuffledHashJoinExec:32, BroadcastNestedLoopJoinExec:32,
CartesianProductExec:60 across inner/outer/semi/anti/cross types. Range and
as-of joins are absent as first-class operators in the reference (non-equi
conditions fall to BNLJ) — here they are implemented as compositions that
stay shuffle-friendly at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(big.l_suppkey, s.s_suppkey) AS suppkey,
           s_name, CAST(n_items AS BIGINT) AS n_items
    FROM (
      SELECT l_suppkey, count(*) AS n_items
      FROM lineitem WHERE l_quantity > 45 GROUP BY l_suppkey
    ) big
    FULL OUTER JOIN supplier s ON big.l_suppkey = s.s_suppkey
    """,
    description="Full outer join preserving unmatched rows on both sides.",
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full outer can't broadcast (both sides must be preserved) → planned as
    # sort-merge on the key; that is the correct 100 TB strategy too.
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    big = (
        li.filter(F.col("l_quantity") > 45)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"))
    )
    return big.join(supp, big.l_suppkey == supp.s_suppkey, "full_outer").select(
        F.coalesce(big.l_suppkey, supp.s_suppkey).alias("suppkey"),
        "s_name",
        F.col("n_items").cast("bigint").alias("n_items"),
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n_name, CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust
    FROM (
      SELECT c_nationkey, count(*) AS n_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ) cc
    RIGHT OUTER JOIN nation ON cc.c_nationkey = n_nationkey
    """,
    description="Right outer join keeping all dimension rows.",
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = _t(spark, sf_dir, "nation")
    cc = cust.groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    return cc.join(nation, cc.c_nationkey == nation.n_nationkey, "right_outer").select(
        "n_name", F.coalesce("n_cust", F.lit(0)).cast("bigint").alias("n_cust")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region_a, r2.r_name AS region_b
    FROM region r CROSS JOIN region r2
    WHERE r.r_regionkey < r2.r_regionkey
    """,
    description="Cartesian product with post-filter (CartesianProductExec).",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = _t(spark, sf_dir, "region").alias("a")
    r2 = _t(spark, sf_dir, "region").alias("b")
    return (
        r1.crossJoin(r2)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )


@register(
    "join_non_equi",
    oracle="""
    SELECT p_brand, count(*) AS n_pricier
    FROM part p
    JOIN (SELECT avg(p_retailprice) AS avg_price, p_size
          FROM part GROUP BY p_size) s
      ON p.p_size = s.p_size AND p.p_retailprice > s.avg_price * 1.02
    GROUP BY p_brand
    """,
    description="Theta join: equi key + non-equi residual (range condition).",
    tags=("join", "non-equi"),
)
def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mixed equi+theta condition: Catalyst keeps the equi part as the join
    # key (hash/merge-able) and evaluates the residual as a post-join filter —
    # vastly better at scale than the pure-BNLJ fallback the reference uses
    # for theta-only conditions (BroadcastNestedLoopJoinExec.scala:32).
    part = _t(spark, sf_dir, "part")
    stats = part.groupBy("p_size").agg(F.avg("p_retailprice").alias("avg_price"))
    return (
        part.join(
            F.broadcast(stats),
            (part.p_size == stats.p_size)
            & (part.p_retailprice > stats.avg_price * 1.02),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_pricier"))
    )


@register(
    "join_strategy_hints",
    oracle="""
    SELECT s_name, round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_linestatus = 'F'
    GROUP BY s_name
    """,
    description="Join strategy hints: SHUFFLE_HASH on one side (vs default SMJ/broadcast).",
    tags=("join", "hints"),
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference exposes strategy choice via config
    # (spark.sql.join.preferSortMergeJoin → ShuffledHashJoinExec.scala:32);
    # modern Spark exposes per-join hints. Result is strategy-independent.
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linestatus") == "F")
    supp = _t(spark, sf_dir, "supplier").hint("shuffle_hash")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


@register(
    "join_self",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    description="Self join (alias disambiguation) within region groups.",
    tags=("join", "self"),
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "nation").alias("a")
    b = _t(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id <= 200) e
    ASOF LEFT JOIN
         (SELECT max(o_orderkey) AS o_orderkey, o_custkey,
                 o_orderdate + INTERVAL 28 YEAR AS odate
          FROM orders GROUP BY o_custkey, o_orderdate + INTERVAL 28 YEAR) o
      ON e.user_id = o.o_custkey AND e.ts >= o.odate
    """,
    description="As-of join: latest order at or before each event (per user).",
    tags=("join", "asof", "custom-operator"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — absent in the reference (SURVEY §2.3: non-equi falls to
    BNLJ). operators/asof.py implements it scale-first (union + one
    partitioned window pass — one shuffle of L+R on the by-key, no
    quadratic stage); semantics additionally pinned against
    pandas.merge_asof in tests/test_properties.py.
    """
    from ops_spark.operators.asof import asof_join

    ev = (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") <= 200))
        .select("event_id", "user_id", "ts")
    )
    # Order dates are 1995-2001 while events are 2024 — shift orders +28y so
    # the as-of actually interleaves (pure fixture alignment, same in oracle).
    # Dedup ties (same user, same timestamp) to max orderkey so the match is
    # well-defined on both sides.
    orders = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            (F.col("o_orderdate") + F.expr("INTERVAL 28 YEAR")).alias("ts"),
            "o_orderkey",
        )
        .groupBy("user_id", "ts")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return asof_join(ev, orders, on="ts", by="user_id").select(
        "event_id", "user_id", "ts", F.col("o_orderkey").alias("last_orderkey")
    )


@register(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, count(*) AS n_events
    FROM (SELECT * FROM orders WHERE o_custkey <= 50) o
    JOIN (SELECT * FROM events WHERE user_id <= 50) e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate + INTERVAL 28 YEAR
     AND e.ts <  o.o_orderdate + INTERVAL 28 YEAR + INTERVAL 7 DAY
    GROUP BY o.o_orderkey
    """,
    description="Range (interval) join: events within 7 days of each order.",
    tags=("join", "range", "custom-operator"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range join with an equi anchor: the user_id equi key carries the
    # shuffle; the time-range condition is a residual filter. At 100 TB with
    # no equi key you'd bucketize time into epochs and equi-join on
    # (key, epoch) — see ops_spark.operators.joins.range_join for that path.
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    start = F.col("o_orderdate") + F.expr("INTERVAL 28 YEAR")
    return (
        orders.join(
            ev,
            (ev.user_id == orders.o_custkey)
            & (ev.ts >= start)
            & (ev.ts < start + F.expr("INTERVAL 7 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (SELECT nullif(c_nationkey, 3) AS k, c_acctbal
               FROM customer WHERE c_custkey <= 600),
         s AS (SELECT nullif(s_nationkey, 3) AS k, s_acctbal
               FROM supplier)
    SELECT c.k AS k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor((c.c_acctbal + s.s_acctbal) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100 AS bal
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
    description="Null-safe equality join (<=> / EqualNullSafe; reference "
    "predicates.scala kin): NULL keys MATCH each other instead of "
    "dropping, still planned as a hash join on the null-safe key (no "
    "BNLJ). Oracle uses IS NOT DISTINCT FROM — identical semantics.",
    tags=("join", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 600)
        .select(F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ck"), "c_acctbal")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("sk"), "s_acctbal"
    )
    joined = c.join(s, c["ck"].eqNullSafe(s["sk"]))
    return joined.groupBy(F.col("ck").alias("k")).agg(
        F.count("*").alias("n"),
        # exact integer cents, not round(sum(double), 2): the double sum
        # drifts with partition summation order — found at 100× where this
        # group's 1.5M-pair sum flipped the 2nd decimal between engines
        (
            F.sum(
                F.floor((F.col("c_acctbal") + F.col("s_acctbal")) * 100 + 0.5).cast(
                    "bigint"
                )
            ).cast("double")
            / 100
        ).alias("bal"),
    )
