"""Third TPC-H-style battery: q2, q11, q21 (reference:
sql/core/src/test/resources/tpch/q2.sql, q11.sql, q21.sql), completing the
22-query set modulo fixture-schema substitutions.

The fixtures have no partsupp table, so q2/q11's supply relation is derived
from lineitem: supplier s supplies part p iff a lineitem (p, s) exists, with
unit cost = min(l_extendedprice / l_quantity) over those lineitems — an
exact value pick (no float summation), so the correlated-min comparison is
bit-stable across engines. q21's "kept waiting" predicate substitutes
l_shipdate > o_orderdate + 60 days for the missing receipt/commit dates.

Shapes exercised (mirroring the reference's physical operators):
- q2: correlated per-group min (window over partition key after a
  multi-join star) + deterministic top-100.
- q11: global-scalar-subquery threshold in HAVING (agg → broadcast of a
  1-row aggregate, no second scan of the grouped data).
- q21: EXISTS + NOT EXISTS correlated self-joins on lineitem → left-semi
  then left-anti join, both keyed on l_orderkey so the exchange is planned
  once and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived supply relation: (partkey, suppkey, unit cost).

    min() is an element pick, not a fold — bit-exact in any engine.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))


_SUPPLY_SQL = """
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
"""


@register(
    "Q02_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    regional AS (
      SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand, sp.cost
      FROM supply sp, supplier s, nation n, region r, part p
      WHERE sp.suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        AND p.p_partkey = sp.partkey
        AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           round(cost, 6) AS cost
    FROM regional r1
    WHERE cost = (SELECT min(cost) FROM regional r2
                  WHERE r2.p_partkey = r1.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2: cheapest regional supplier per part "
    "(correlated min via window).",
    tags=("tpch", "join", "subquery", "window"),
)
def Q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Broadcast-join the selective part filter BELOW the supply aggregate:
    # the (partkey, suppkey) groupBy then shuffles only lineitem rows whose
    # part survives (~1/30 here) instead of the whole table — the join is
    # map-side, so the filter costs no extra shuffle. Same result as
    # aggregating first (min per group is unaffected by dropping groups).
    li = _t(spark, sf_dir, "lineitem")
    supply = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    regional = (
        supply.join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # Correlated scalar min rewritten as a window over the correlation key:
    # one shuffle on p_partkey instead of a second aggregate + re-join.
    w = W.partitionBy("p_partkey")
    return (
        regional.withColumn("__min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("__min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("cost", 6).alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "Q11_important_parts",
    oracle="""
    WITH value AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * l_quantity) AS val
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT partkey, round(val, 6) AS val
    FROM value
    WHERE val > (SELECT sum(val) * 0.001 FROM value)
    """,
    description="TPC-H Q11: parts above a global value-share threshold "
    "(scalar subquery in HAVING).",
    tags=("tpch", "agg", "subquery"),
)
def Q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    value = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val"))
    )
    # Global threshold = 1-row aggregate broadcast back over the grouped
    # data — the grouped relation is scanned once (cache-free, no re-agg).
    total = value.agg((F.sum("val") * 0.001).alias("__thresh"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("__thresh"))
        .select("partkey", F.round("val", 6).alias("val"))
    )


_LATE_DAYS = 60


@register(
    "Q21_waiting_suppliers",
    oracle=f"""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders o, nation
    WHERE s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY s_name
    """,
    description="TPC-H Q21: suppliers who alone kept multi-supplier orders "
    "waiting (semi + anti self-joins).",
    tags=("tpch", "join", "semi", "anti"),
)
def Q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS(other supplier) / NOT EXISTS(other LATE supplier) collapse to
    # per-order distinct-supplier counts: a late lineitem l1 qualifies iff
    # its order has > 1 distinct suppliers AND exactly 1 distinct LATE
    # supplier (l1's own supplier is late, so "no OTHER late supplier"
    # == n_late_suppliers == 1). That turns the former
    # join + semi-join + anti-join — THREE lineitem-scale shuffles, the
    # anti side re-running the lineitem x orders join — into ONE
    # lineitem x orders shuffle whose orderkey partitioning is then
    # reused exchange-free by both the per-order aggregation and the
    # join back onto the late rows (AQE coalesces, never re-hashes).
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_LATE_DAYS} DAYS"
    )
    from pyspark.sql.window import Window as W

    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("__late")
    )
    # Both counts ride ONE window over the join output (two collect_sets,
    # same frame -> a single WindowExec): when the orders join runs as a
    # sort-merge join the output is already l_orderkey-partitioned AND
    # -sorted, so the window adds NO exchange and NO sort; when orders
    # broadcasts, the window's one Exchange(l_orderkey) is the only wide
    # op over lineitem in the whole query. Either way the join subtree
    # executes once (the former aggregate-and-join-back formulation
    # evaluated it twice with no exchange reuse).
    w = W.partitionBy("l_orderkey")
    lo = lo.withColumn(
        "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "__n_late",
        F.size(
            F.collect_set(
                F.when(F.col("__late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    waiting = (
        lo.filter(F.col("__late"))
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .join(
            F.broadcast(
                _t(spark, sf_dir, "supplier").join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    return waiting.groupBy("s_name").agg(
        F.count("*").cast("bigint").alias("numwait")
    )
