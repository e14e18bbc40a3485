"""Every registered query must match its DuckDB oracle on the smoke fixture.

This is a local pre-flight for the driver's t2 gate (which runs at sf0.01);
run with OPS_SPARK_TEST_SF=/root/testdata/sf0.01 for the full-size check.
"""

from __future__ import annotations

import pytest

import ops_spark.queries as q

q.load_all()
ALL = sorted(q.all_queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    from ops_spark.conformance import compare

    query = q.get_query(name)
    result = compare(spark, query, sf_dir)
    assert result.ok, f"{name}: {result.detail}"
    if query.oracle is not None:
        assert result.spark_rows == result.oracle_rows
