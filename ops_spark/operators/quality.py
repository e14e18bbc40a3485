"""Data-quality constraint checking (Deequ-lite).

The reference engine has no validation layer; every production pipeline
bolts one on (AWS Deequ, Great Expectations). This is the Spark-first
core: declarative constraints compiled into ONE aggregation pass over the
table (each row-level rule is a conditional count riding the same scan),
plus one grouped count for uniqueness rules and one anti-join count per
referential rule. Nothing is per-rule-per-scan: checking 50 constraints
on 100 TB costs one read.

Report schema: (rule, violations, n_rows, passed) — one row per
constraint, ready for alerting sinks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # row-level violation predicate (NULL-safe: NULL counts as violation
    # unless the rule is about NULLs themselves)
    predicate: Column | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi)
    )


def matches(col: str, regex: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", c.isNull() | ~c.rlike(regex))


def one_of(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"one_of({col})", c.isNull() | ~c.isin(values))


def check_constraints(
    df: DataFrame,
    row_rules: list[Rule] = (),
    unique: list[list[str]] = (),
    foreign_keys: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Validate ``df`` against the given constraints; returns the report.

    - row_rules: one conditional-sum per rule, ALL in one aggregation over
      one scan.
    - unique: each key set costs one groupBy counting keys seen more than
      once (violations = extra occurrences beyond the first).
    - foreign_keys: (col, dim_df, dim_col) — orphan rows counted via a
      left-anti equi join (dim side broadcastable when small).
    """
    spark = df.sparkSession
    n_rows = F.count("*")
    aggs = [n_rows.alias("__n")] + [
        F.sum(r.predicate.cast("long")).alias(f"__v{i}")
        for i, r in enumerate(row_rules)
    ]
    base = df.agg(*aggs).collect()[0]  # 1-row report metadata, not data
    total = base["__n"]

    reports = [
        (r.name, int(base[f"__v{i}"] or 0)) for i, r in enumerate(row_rules)
    ]
    for cols in unique:
        dupes = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(F.sum(F.col("__c") - 1).alias("__d"))
            .collect()[0]["__d"]
        )
        reports.append((f"unique({','.join(cols)})", int(dupes or 0)))
    for col, dim_df, dim_col in foreign_keys:
        orphans = (
            df.select(F.col(col).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                dim_df.select(F.col(dim_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .count()
        )
        reports.append((f"foreign_key({col})", int(orphans)))

    rows = [
        (name, viol, int(total), viol == 0) for name, viol in reports
    ]
    return spark.createDataFrame(
        rows, "rule string, violations bigint, n_rows bigint, passed boolean"
    )
