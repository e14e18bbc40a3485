from ops_spark.io.tables import TABLES, load_table, register_views, tables

__all__ = ["TABLES", "load_table", "register_views", "tables"]
