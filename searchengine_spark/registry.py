"""Central query/oracle registry.

Aggregates every module's QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLES (name -> DuckDB SQL). __spark_entry__.py and
bench.py consume this. Keys missing from ORACLES are non-SQL ops the
driver checks rows-only (e.g. streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from searchengine_spark.index import queries as index_queries

    modules = [index_queries]
    try:
        from searchengine_spark.index import phrase

        modules.append(phrase)
    except ImportError:
        pass
    try:
        from searchengine_spark.relational import tpch

        modules.append(tpch)
    except ImportError:
        pass
    try:
        from searchengine_spark.relational import events

        modules.append(events)
    except ImportError:
        pass
    try:
        from searchengine_spark.relational import advanced

        modules.append(advanced)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import dedup

        modules.append(dedup)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import similarity

        modules.append(similarity)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import multimodal

        modules.append(multimodal)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import ann

        modules.append(ann)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import approx

        modules.append(approx)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import sampling

        modules.append(sampling)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import skew

        modules.append(skew)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import udaf

        modules.append(udaf)
    except ImportError:
        pass
    try:
        from searchengine_spark.operators import simhash

        modules.append(simhash)
    except ImportError:
        pass
    try:
        from searchengine_spark.text import analysis

        modules.append(analysis)
    except ImportError:
        pass
    try:
        from searchengine_spark.text import langid

        modules.append(langid)
    except ImportError:
        pass
    try:
        from searchengine_spark.text import chunking

        modules.append(chunking)
    except ImportError:
        pass
    try:
        from searchengine_spark import pipeline

        modules.append(pipeline)
    except ImportError:
        pass

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
