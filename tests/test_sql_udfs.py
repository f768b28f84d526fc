"""SQL UDF surface: each SQL function must equal its Column twin
row-for-row, and calls must stay JVM-side (no Python eval node)."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions import register_sql_functions


@pytest.fixture(scope="module")
def funcs(spark):
    register_sql_functions(spark)
    return spark


def test_se_tokenize_matches_column_tokenizer(funcs, sf_dir):
    from searchengine_spark.io import load_table
    from searchengine_spark.text.tokenizer import tokens_column

    docs = load_table(funcs, sf_dir, "documents").limit(200)
    both = docs.select(
        tokens_column("text").alias("col_toks"),
        F.expr("se_tokenize(text)").alias("sql_toks"),
    )
    assert both.filter(F.col("col_toks") != F.col("sql_toks")).count() == 0


def test_se_hash_bucket_matches_column(funcs):
    from searchengine_spark.operators.sampling import hash_bucket

    df = funcs.range(5000).select(F.col("id").cast("string").alias("k"))
    both = df.select(
        hash_bucket(F.col("k"), salt="s").alias("col_b"),
        F.expr("se_hash_bucket(k, 's')").alias("sql_b"),
    )
    assert both.filter(F.col("col_b") != F.col("sql_b")).count() == 0


def test_se_bm25_term_matches_column(funcs):
    from searchengine_spark.index.bm25 import bm25_term_score

    df = funcs.range(1, 500).select(
        (F.col("id") % 7 + 1).alias("tf"),
        (F.log10(F.col("id") + 1)).alias("idf"),
        (F.col("id") % 90 + 10).alias("dl"),
        F.lit(55.5).alias("avgdl"),
    )
    both = df.select(
        bm25_term_score(
            F.col("tf"), F.col("dl"), F.col("avgdl"), F.col("idf"), k1=1.2, b=0.75
        ).alias("col_s"),
        F.expr("se_bm25_term(tf, idf, dl, avgdl, 1.2d, 0.75d)").alias("sql_s"),
    )
    assert both.filter(F.col("col_s") != F.col("sql_s")).count() == 0


def test_se_zorder_key_matches_column(funcs):
    from searchengine_spark.operators.layout import zorder_key

    df = funcs.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("bigint").alias("b")
    )
    both = df.select(
        zorder_key(F.col("a"), F.col("b")).alias("col_z"),
        F.expr("se_zorder_key(a, b)").alias("sql_z"),
    )
    assert both.filter(F.col("col_z") != F.col("sql_z")).count() == 0


def test_sql_udf_stays_in_codegen(funcs):
    """SQL UDF bodies inline into the plan — no BatchEvalPython /
    ArrowEvalPython node may appear (that's the whole point vs
    spark.udf.register)."""
    df = funcs.range(10).select(F.expr("se_hash_bucket(cast(id as string), '')"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "WholeStageCodegen" in plan or "Project" in plan


def test_sql_only_user_can_run_the_text_pipeline(funcs, sf_dir):
    """End-to-end in pure SQL: tokenize + explode + df-count."""
    from searchengine_spark.io import load_table

    load_table(funcs, sf_dir, "documents").createOrReplaceTempView("docs_v")
    # NB: a SQL UDF can't sit directly under a generator (Spark
    # raises UNSUPPORTED_SQL_UDF_USAGE in Generate) — materialize the
    # array in a subquery, then explode the plain column.
    out = funcs.sql(
        """
        SELECT word, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, se_tokenize(text) AS toks FROM docs_v)
        LATERAL VIEW explode(toks) AS word
        GROUP BY word ORDER BY df DESC LIMIT 5
        """
    ).collect()
    assert len(out) == 5 and all(r["df"] > 0 for r in out)
