"""SQL entry-point coverage (SURVEY.md §3.1): the same ANSI SQL text runs
through spark.sql AND as the DuckDB oracle — exercising the full
parse→analyze→optimize pipeline (reference SparkSession.scala:641,
AstBuilder, Analyzer.scala:95, Optimizer.scala) including correlated and
scalar subqueries, which Catalyst decorrelates into joins
(RewriteCorrelatedScalarSubquery:91, RewritePredicateSubquery:175).

Keeping one SQL string for both engines pins us to the dialect-neutral core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ops_spark.io import register_views
from ops_spark.queries.registry import register

SQL_EXISTS = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
  AND c_custkey <= 500
"""

SQL_NOT_IN = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey NOT IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_quantity > 49.5 AND l_discount > 0.09
)
"""

SQL_SCALAR_SUBQUERY = """
SELECT o_orderstatus, count(*) AS n_above
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""

SQL_CORRELATED_SCALAR = """
SELECT c_custkey, c_acctbal,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
WHERE c_custkey <= 200
"""

SQL_CTE = """
WITH nation_rev AS (
  SELECT n_name, sum(c_acctbal) AS bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, round(bal, 2) AS bal
FROM nation_rev
WHERE bal > (SELECT avg(bal) FROM nation_rev)
"""


def _sql_query(sql: str):
    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return builder


for name, sql, desc in [
    ("sql_exists_subquery", SQL_EXISTS, "Correlated EXISTS → left-semi join rewrite."),
    ("sql_not_in_subquery", SQL_NOT_IN, "NOT IN → null-aware anti join."),
    ("sql_scalar_subquery", SQL_SCALAR_SUBQUERY, "Uncorrelated scalar subquery."),
    (
        "sql_correlated_scalar",
        SQL_CORRELATED_SCALAR,
        "Correlated scalar subquery → decorrelated outer join + count.",
    ),
    ("sql_cte", SQL_CTE, "CTE reuse + scalar subquery over the CTE."),
]:
    register(name, oracle=sql, description=desc, tags=("sql", "subquery"))(
        _sql_query(sql)
    )


@register(
    "sql_lateral_view",
    oracle="""
    SELECT o_orderkey, unnest([o_orderstatus, o_orderpriority]) AS attr
    FROM orders WHERE o_orderkey <= 200
    """,
    description="LATERAL VIEW explode (HiveQL generator syntax → GenerateExec; "
    "reference generators.scala:137, SparkSqlParser).",
    tags=("sql", "generator"),
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, attr
        FROM orders
        LATERAL VIEW explode(array(o_orderstatus, o_orderpriority)) t AS attr
        WHERE o_orderkey <= 200
        """
    )


@register(
    "sql_pivot",
    oracle="""
    SELECT c_nationkey,
           round(coalesce(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                              THEN c_acctbal END), 0), 2) AS auto_bal,
           round(coalesce(sum(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN c_acctbal END), 0), 2) AS bldg_bal,
           round(coalesce(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                              THEN c_acctbal END), 0), 2) AS mach_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    description="SQL PIVOT clause (parser surface distinct from "
    "DataFrame groupBy().pivot(); reference ResolvePivot Analyzer.scala"
    ":527) — oracle is the portable CASE-WHEN formulation.",
    tags=("sql", "pivot"),
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey,
               round(coalesce(AUTOMOBILE, 0), 2) AS auto_bal,
               round(coalesce(BUILDING, 0), 2)   AS bldg_bal,
               round(coalesce(MACHINERY, 0), 2)  AS mach_bal
        FROM (SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer)
        PIVOT (sum(c_acctbal)
               FOR c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY'))
        """
    )


@register(
    "sql_unpivot",
    oracle="""
    SELECT n_nationkey, k, v FROM (
      SELECT n_nationkey, 'nation_id' AS k, CAST(n_nationkey AS BIGINT) AS v
      FROM nation
      UNION ALL
      SELECT n_nationkey, 'region_id' AS k, CAST(n_regionkey AS BIGINT) AS v
      FROM nation
    )
    """,
    description="SQL UNPIVOT clause (Spark 3.4+ parser surface over the "
    "Unpivot node; the reference era spells this stack()) — oracle is the "
    "portable UNION ALL formulation.",
    tags=("sql", "unpivot"),
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, k, v
        FROM (SELECT n_nationkey,
                     CAST(n_nationkey AS BIGINT) AS nation_id,
                     CAST(n_regionkey AS BIGINT) AS region_id
              FROM nation)
        UNPIVOT (v FOR k IN (nation_id, region_id))
        """
    )


@register(
    "sql_lateral_join",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1
    )
    WHERE c_custkey <= 300
    """,
    description="LATERAL correlated subquery with ORDER BY ... LIMIT "
    "(Spark 3.2+ LateralJoin -> DecorrelateInnerQuery; reference kin: "
    "2.4 had only LATERAL VIEW generators). Same SQL text runs on both "
    "engines — top-1-order-per-customer decorrelates into a ranked join, "
    "not a per-row re-scan.",
    tags=("sql", "subquery", "lateral"),
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 1
        )
        WHERE c_custkey <= 300
        """
    )


@register(
    "sql_hints",
    oracle="""
    SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    description="Join-strategy + partitioning hints through the SQL parser "
    "(ResolveJoinStrategyHints / ResolveCoalesceHints): BROADCAST pins the "
    "dimension build side, REPARTITION inserts an explicit exchange. "
    "Results are hint-invariant, so the oracle is the same query unhinted; "
    "the plan effect is asserted in tests/test_plans.py.",
    tags=("sql", "hint"),
)
def sql_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(nation), REPARTITION(8) */
               n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
