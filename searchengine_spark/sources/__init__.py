"""Custom Python Data Sources (Spark 4 DataSource API)."""

from searchengine_spark.sources.jsonl import JsonlDataSource, register_jsonl_source

__all__ = ["JsonlDataSource", "register_jsonl_source"]
