"""Query catalog: every implemented operator from SURVEY.md §2 is exposed as
a named (Spark builder, DuckDB oracle SQL) pair via the registry."""

from ops_spark.queries.registry import Query, all_queries, get_query, register


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from ops_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        functions_scalar,
        graph,
        joins,
        llm,
        sets_windows,
        sql_entry,
        streaming,
        tpcds_shapes,
        tpch,
        tpch2,
        tpch3,
        udfs,
    )


__all__ = ["Query", "all_queries", "get_query", "register", "load_all"]
