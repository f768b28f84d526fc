"""SQL-callable function surface (Spark 4 SQL UDFs)."""

from searchengine_spark.functions.sql_udfs import register_sql_functions

__all__ = ["register_sql_functions"]
