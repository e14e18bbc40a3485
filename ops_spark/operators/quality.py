"""Data-quality constraint checking (Deequ-lite).

The reference engine has no validation layer; every production pipeline
bolts one on (AWS Deequ, Great Expectations). This is the Spark-first
core: declarative constraints compiled into ONE aggregation pass over the
table — each row-level rule is a conditional count and each uniqueness
rule a count_distinct(struct(keys)) riding the SAME scan (multi-distinct
plans through one Expand, still a single read). Referential rules are one
anti-join count each against a cached projection of just the key columns,
so the fact table is scanned at most twice total (once for the aggregate,
once to populate the key cache) no matter how many rules are checked.

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


def _report_agg(
    df: DataFrame,
    row_rules: list[Rule] = (),
    unique: list[list[str]] = (),
) -> DataFrame:
    """The single-pass report aggregate: n_rows + one conditional sum per
    row rule + one count_distinct(struct(keys)) per uniqueness rule, all
    over ONE scan (multi-distinct rewrites through a single Expand).
    Exposed separately so the one-scan property is plan-testable."""
    aggs = (
        [F.count("*").alias("__n")]
        + [
            F.sum(r.predicate.cast("long")).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        + [
            F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(f"__u{j}")
            for j, cols in enumerate(unique)
        ]
    )
    return df.agg(*aggs)


def check_constraints(
    df: DataFrame,
    row_rules: list[Rule] = (),
    unique: list[list[str]] = (),
    foreign_keys: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Validate ``df`` against the given constraints; returns the report.

    - row_rules: one conditional-sum per rule, ALL in one aggregation over
      one scan.
    - unique: violations = extra occurrences beyond each key's first =
      count(*) - count_distinct(struct(keys)) (the struct makes all-null
      key tuples count as a group, matching a groupBy). Rides the SAME
      aggregation as the row rules — zero extra jobs or scans.
    - foreign_keys: (col, dim_df, dim_col) — orphan rows counted via a
      left-anti equi join (dim side broadcastable when small) against a
      cached projection of the fact keys, so k referential rules cost one
      extra fact scan, not k.
    """
    spark = df.sparkSession
    base = _report_agg(df, row_rules, unique).collect()[0]  # 1-row metadata
    total = base["__n"]

    reports = [
        (r.name, int(base[f"__v{i}"] or 0)) for i, r in enumerate(row_rules)
    ]
    for j, cols in enumerate(unique):
        dupes = int(total) - int(base[f"__u{j}"] or 0)
        reports.append((f"unique({','.join(cols)})", dupes))

    fact_keys = None
    if len(foreign_keys) > 1:
        # one materialization of just the key columns feeds every FK probe
        fact_keys = df.select(
            *sorted({col for col, _, _ in foreign_keys})
        ).persist()
    try:
        for col, dim_df, dim_col in foreign_keys:
            orphans = (
                (fact_keys if fact_keys is not None else df)
                .select(F.col(col).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    dim_df.select(F.col(dim_col).alias("__k")).distinct(),
                    "__k",
                    "left_anti",
                )
                .count()
            )
            reports.append((f"foreign_key({col})", int(orphans)))
    finally:
        if fact_keys is not None:
            fact_keys.unpersist()

    rows = [
        (name, viol, int(total), viol == 0) for name, viol in reports
    ]
    return spark.createDataFrame(
        rows, "rule string, violations bigint, n_rows bigint, passed boolean"
    )
