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


SQL_RECURSIVE_CTE = """
WITH RECURSIVE months(m) AS (
  SELECT 1
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
)
SELECT m AS month_no, count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON month(o_orderdate) = m
GROUP BY m
"""


@register(
    "sql_recursive_cte",
    oracle=SQL_RECURSIVE_CTE,
    description="WITH RECURSIVE (Spark 4.0 UnionLoop; the reference era had "
    "no recursion — SURVEY §2.7 notes set-ops only). Iterative month-series "
    "generation joined back to a fact table; same SQL text runs on DuckDB. "
    "Recursion depth is bounded by the WHERE guard (and Spark's "
    "cteRecursionLevelLimit=100 backstop), so this is driver-safe: each "
    "iteration is a 1-row local scan, the only distributed work is the "
    "final join+agg.",
    tags=("sql", "cte", "recursive"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_RECURSIVE_CTE)


@register(
    "sql_collation",
    oracle="""
    SELECT c_nationkey, count(*) AS n_auto
    FROM (SELECT c_nationkey,
                 CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END AS seg
          FROM customer)
    WHERE lower(seg) = 'automobile'
    GROUP BY c_nationkey
    """,
    description="Case-insensitive string collation (Spark 4.0 COLLATE "
    "UTF8_LCASE; CollationKey-based compare/hash — absent from the "
    "reference's UTF8String binary-only comparisons). The mixed-case column "
    "is compared under UTF8_LCASE so 'AUTOMOBILE' and 'automobile' hash to "
    "one group; the oracle is the portable lower() formulation. Collation "
    "participates in hash partitioning, so grouping on a collated key still "
    "shuffles correctly at scale.",
    tags=("sql", "collation"),
)
def sql_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_auto
        FROM (SELECT c_nationkey,
                     CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                          ELSE c_mktsegment END AS seg
              FROM customer)
        WHERE seg COLLATE UTF8_LCASE = 'automobile'
        GROUP BY c_nationkey
        """
    )


@register(
    "sql_execute_immediate",
    oracle="""
    SELECT r_name, count(*) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    WHERE r_regionkey <= 3
    GROUP BY r_name
    """,
    description="EXECUTE IMMEDIATE with a positional parameter (Spark 4.0 "
    "dynamic SQL; complements the parameterized-SQL query in udfs.py). The "
    "SQL text is composed at runtime and bound with USING — the oracle is "
    "the same statement with the literal inlined.",
    tags=("sql", "dynamic"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT r_name, count(*) AS n_nations
           FROM region JOIN nation ON n_regionkey = r_regionkey
           WHERE r_regionkey <= ? GROUP BY r_name'
        USING 3
        """
    )


@register(
    "sql_scripting",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_big
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
    description="SQL scripting compound (Spark 4.0 BEGIN/DECLARE/SET/END, "
    "SQL/PSM subset): a session variable is populated from a scalar "
    "subquery and referenced by the final statement, whose result the "
    "script returns. The oracle inlines the variable as a scalar subquery. "
    "Control flow runs on the driver; each statement is still a full "
    "Catalyst-planned distributed query.",
    tags=("sql", "scripting"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE threshold DOUBLE DEFAULT 0.0;
          SET threshold = (SELECT avg(o_totalprice) FROM orders);
          SELECT o_orderstatus, count(*) AS n_big
          FROM orders
          WHERE o_totalprice > threshold
          GROUP BY o_orderstatus;
        END
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


@register(
    "sql_group_by_all",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
    FROM nation GROUP BY ALL
    """,
    description="GROUP BY ALL (Spark 3.4+/DuckDB shared dialect): grouping "
    "keys inferred as every non-aggregate SELECT item. Same SQL text runs "
    "on both engines.",
    tags=("sql", "aggregate"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        FROM nation GROUP BY ALL
        """
    )


@register(
    "sql_star_except_order_all",
    oracle="""
    SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
    WHERE c_custkey <= 300 ORDER BY ALL
    """,
    description="SELECT * EXCEPT (...) projection pruning + ORDER BY ALL "
    "(Spark 4.0 parser surface; DuckDB spells the except clause EXCLUDE, "
    "so the oracle lists columns explicitly). The pruned columns must not "
    "reach the scan — ReadSchema is plan-checked in tests.",
    tags=("sql", "projection"),
)
def sql_star_except_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM customer "
        "WHERE c_custkey <= 300 ORDER BY ALL"
    )


@register(
    "sql_lateral_alias",
    oracle="""
    SELECT c_custkey,
           c_acctbal * 1.1 AS boosted,
           boosted - c_acctbal AS delta
    FROM customer WHERE c_custkey <= 400
    """,
    description="Lateral column aliases (Spark 3.4+): a SELECT item "
    "referencing an alias defined earlier in the same list — shared "
    "dialect with DuckDB, so the same SQL text runs on both engines.",
    tags=("sql", "projection"),
)
def sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               c_acctbal * 1.1 AS boosted,
               boosted - c_acctbal AS delta
        FROM customer WHERE c_custkey <= 400
        """
    )


@register(
    "sql_agg_filter_listagg",
    oracle="""
    SELECT n_regionkey,
           count(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even,
           count(*) FILTER (WHERE n_nationkey % 2 = 1) AS n_odd,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
    description="Aggregate FILTER clause (per-aggregate predicates in one "
    "pass — the portable PIVOT-lite) + listagg WITHIN GROUP (Spark 4.0 "
    "ordered string aggregation; DuckDB spells it string_agg ORDER BY). "
    "The ordered listagg is deterministic by construction, unlike bare "
    "collect_list.",
    tags=("sql", "aggregate"),
)
def sql_agg_filter_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_regionkey,
               count(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even,
               count(*) FILTER (WHERE n_nationkey % 2 = 1) AS n_odd,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey
        """
    )


@register(
    "sql_ordered_set_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                      * 100.0 + 0.5) AS BIGINT) AS median_e2,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25_disc
    FROM orders GROUP BY o_orderstatus
    """,
    description="Ordered-set aggregates (SQL:2003 WITHIN GROUP syntax, "
    "Spark 4.0): percentile_cont interpolates (floor-e2 quantized — the "
    "lerp arithmetic is engine-deterministic but emitted as micro-units "
    "for hash safety) and percentile_disc returns an actual data value, "
    "exact on both engines.",
    tags=("sql", "aggregate", "percentile"),
)
def sql_ordered_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                          * 100.0 + 0.5) AS BIGINT) AS median_e2,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25_disc
        FROM orders GROUP BY o_orderstatus
        """
    )
