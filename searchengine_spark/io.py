"""Table loading helpers.

All inputs are parquet directories/files named `<table>.parquet`
under a scale-factor dir (see TESTDATA.md). Reads are plain
`spark.read.parquet` so Catalyst gets full pushdown/pruning; no
schema is imposed (parquet carries it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every known table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out
