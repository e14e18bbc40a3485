"""TPC-DS ORACLE battery: every one of the 156 published corpus texts
(103 primary + 32 v2.7 + 21 modified) runs on Spark VERBATIM over a
deterministic, referentially consistent tiny dataset
(ops_spark/queries/tpcds_tinydata.py) and must value-match DuckDB
running the same text (modulo the documented dialect shims in
tpcds_corpus.oracle_text — the Spark side is never edited).

This is strictly stronger than the reference suite's corpus check
(TPCDSQuerySuite: plan + codegen on EMPTY tables, results never
verified): here >100 of the queries return non-empty results and every
cell is compared.

Comparison semantics:
- rows are aligned by a canonical sort key (floats at 6 significant
  digits so Spark's scale-6 decimal AVG and DuckDB's double AVG key
  identically), then verified cell-by-cell;
- decimal/int cells must match EXACTLY (sum/count aggregates are
  decimal-exact in both engines on this data);
- cells where either engine produced a float (AVG-type outputs) match
  within 1e-6 relative — the precision Spark's decimal(_,6) AVG carries;
- DuckDB runs with nulls_first_on_asc_last_on_desc so ORDER BY ...
  LIMIT picks the same rows Spark does around NULL keys.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from ops_spark.queries.tpcds_corpus import (
    QUERIES,
    QUERIES_MODIFIED,
    QUERIES_V2_7,
    TPCDS_TABLES,
    oracle_text,
)
from ops_spark.queries.tpcds_tinydata import cached_dir

CORPORA = [
    ("primary", QUERIES, 103),
    ("v2_7", QUERIES_V2_7, 32),
    ("modified", QUERIES_MODIFIED, 21),
]


def _key(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (float, decimal.Decimal)):
        f = float(v)
        return "NaN" if math.isnan(f) else "%.6g" % f
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return str(v)


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    num = (int, float, decimal.Decimal)
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, num) and isinstance(b, num):
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return math.isnan(fa) and math.isnan(fb)
            return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
        return decimal.Decimal(a) == decimal.Decimal(b)  # exact tier
    return str(a) == str(b)


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    d = cached_dir()
    for t in TPCDS_TABLES:
        spark.read.parquet(f"{d}/{t}.parquet").createOrReplaceTempView(t)
    con = duckdb.connect()
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TPCDS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    yield spark, con
    con.close()
    for t in TPCDS_TABLES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("label,corpus,size", CORPORA,
                         ids=[c[0] for c in CORPORA])
def test_tpcds_oracle_corpus(engines, label, corpus, size):
    spark, con = engines
    assert len(corpus) == size
    failures, nonempty = [], 0
    for name, sql in corpus.items():
        srows = spark.sql(sql).collect()
        orows = con.execute(oracle_text(name, sql)).fetchall()
        s = sorted(srows, key=lambda r: tuple(_key(v) for v in r))
        o = sorted(orows, key=lambda r: tuple(_key(v) for v in r))
        if len(s) != len(o):
            failures.append(f"{name}: rows spark={len(s)} duckdb={len(o)}")
            continue
        if s:
            nonempty += 1
        for rs, ro in zip(s, o):
            if len(rs) != len(ro) or not all(
                _cells_equal(a, b) for a, b in zip(rs, ro)
            ):
                failures.append(f"{name}: row diff spark={tuple(rs)!r:.200} "
                                f"duckdb={tuple(ro)!r:.200}")
                break
    assert not failures, f"{len(failures)}/{size} diverge: {failures[:5]}"
    # the dataset must keep the battery meaningful, not vacuous
    floor = {"primary": 70, "v2_7": 25, "modified": 15}[label]
    assert nonempty >= floor, f"only {nonempty} non-empty results"
