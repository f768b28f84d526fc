"""Sink formats: export pipeline outputs as parquet/csv/json and read
back losslessly (the S-family write side)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.pipeline import curate


def test_export_keep_list_all_formats(spark, sf_dir):
    kept = curate(load_table(spark, sf_dir, "documents")).orderBy("doc_id")
    expected = [r.doc_id for r in kept.collect()]
    tmp = tempfile.mkdtemp(prefix="se_sinks_")
    try:
        kept.write.mode("overwrite").parquet(f"{tmp}/keep.parquet")
        kept.write.mode("overwrite").option("header", True).csv(f"{tmp}/keep.csv")
        kept.write.mode("overwrite").json(f"{tmp}/keep.json")

        pq = [r.doc_id for r in spark.read.parquet(f"{tmp}/keep.parquet").orderBy("doc_id").collect()]
        csv = [
            int(r.doc_id)
            for r in spark.read.option("header", True).csv(f"{tmp}/keep.csv").orderBy(F.col("doc_id").cast("bigint")).collect()
        ]
        js = [r.doc_id for r in spark.read.json(f"{tmp}/keep.json").orderBy("doc_id").collect()]
        assert pq == expected
        assert csv == expected
        assert js == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
