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


@pytest.mark.parametrize(
    "name", [n for n in ALL if not (n.startswith("stream_") or n.startswith("x_"))]
)
def test_oracle_queries_have_no_complex_output_columns(spark, sf_dir, name):
    """The driver's canonicalizer sorts raw pandas cells; numpy.ndarray /
    dict / Row cells crash it (the round-2 ``fn_array_extra`` red row).
    Every oracle-tier query must therefore emit only scalar columns —
    arrays/maps/structs go through array_join / to_json on both sides.
    Streaming queries are covered via compare() in the parity test above
    (building them here would rerun each stream); ``x_`` rows-only queries
    may keep complex columns (the driver only counts their rows)."""
    from ops_spark.conformance import complex_output_columns

    query = q.get_query(name)
    bad = complex_output_columns(query.builder(spark, sf_dir))
    assert not bad, (
        f"{name} outputs complex-typed columns {bad}; stringify them or "
        "demote the query to the x_ rows-only tier"
    )
