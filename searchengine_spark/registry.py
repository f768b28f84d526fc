"""Central query/oracle registry.

Aggregates every module's QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLES (name -> DuckDB SQL). __spark_entry__.py and
bench.py consume this. Keys missing from ORACLES are non-SQL ops the
driver checks rows-only (e.g. streaming, sketches, ML-backed ANN).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Every module that exports QUERIES/ORACLES. A module listed here but
# failing to import raises at registry time — a silently-vanishing
# query set must never look like "all green" to the driver gate.
_MODULES = (
    "index.queries",
    "index.phrase",
    "relational.tpch",
    "relational.events",
    "relational.advanced",
    "operators.dedup",
    "operators.similarity",
    "operators.multimodal",
    "operators.ann",
    "operators.approx",
    "operators.sampling",
    "operators.skew",
    "operators.upsert",
    "operators.udaf",
    "operators.quantization",
    "operators.mixture",
    "operators.decontamination",
    "operators.moments",
    "operators.heavy_hitters",
    "operators.simhash",
    "text.analysis",
    "text.quality",
    "text.redaction",
    "text.langid",
    "text.chunking",
    "pipeline",
)


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for name in _MODULES:
        mod = importlib.import_module(f"searchengine_spark.{name}")
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
