"""Shared Spark-vs-DuckDB comparator for the TPC-DS corpus — used by
tests/test_tpcds_oracle.py (tiny scale, every commit) and
scripts/scale_stress.py --tpcds-oracle (scaled data, round evidence).

Comparison semantics (see test module docstring for the rationale):
rows align on a canonical sort key (floats at 6 significant digits so
Spark's scale-6 decimal AVG and DuckDB's double AVG key identically),
then verify cell-by-cell — decimal/int exactly, float-involved cells at
1e-6 relative, NULL only equal to NULL.
"""

from __future__ import annotations

import datetime
import decimal
import math


def sort_key(v) -> str:
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


def cells_equal(a, b) -> bool:
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


def duckdb_tpcds_connection(data_dir: str):
    """DuckDB connection with the 24 tables as views and Spark's null
    ordering (NULLS FIRST on ASC, LAST on DESC) so ORDER BY ... LIMIT
    picks the same rows."""
    import duckdb

    from ops_spark.queries.tpcds_corpus import TPCDS_TABLES

    con = duckdb.connect()
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TPCDS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{data_dir}/{t}.parquet')"
        )
    return con


def compare_corpus(spark, con, corpus: dict[str, str]) -> dict:
    """Run every query on both engines; return
    {matched, nonempty, failures: [...], per_query: {name: wall_sec}}.
    The Spark side runs the published text VERBATIM; the oracle side
    goes through tpcds_corpus.oracle_text's documented dialect shims."""
    import time

    from ops_spark.queries.tpcds_corpus import oracle_text

    matched = nonempty = 0
    failures: list[str] = []
    per_query: dict[str, float] = {}
    for name, sql in corpus.items():
        t0 = time.perf_counter()
        srows = spark.sql(sql).collect()
        orows = con.execute(oracle_text(name, sql)).fetchall()
        per_query[name] = round(time.perf_counter() - t0, 2)
        s = sorted(srows, key=lambda r: tuple(sort_key(v) for v in r))
        o = sorted(orows, key=lambda r: tuple(sort_key(v) for v in r))
        if len(s) != len(o):
            failures.append(f"{name}: rows spark={len(s)} duckdb={len(o)}")
            continue
        row_bad = next(
            (
                (rs, ro)
                for rs, ro in zip(s, o)
                if len(rs) != len(ro)
                or not all(cells_equal(a, b) for a, b in zip(rs, ro))
            ),
            None,
        )
        if row_bad is not None:
            failures.append(
                f"{name}: row diff spark={tuple(row_bad[0])!r:.200} "
                f"duckdb={tuple(row_bad[1])!r:.200}"
            )
            continue
        matched += 1
        if s:
            nonempty += 1
    return {
        "matched": matched,
        "nonempty": nonempty,
        "failures": failures,
        "per_query": per_query,
    }
