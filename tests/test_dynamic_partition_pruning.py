"""Dynamic partition pruning: when a fact table is partitioned on the
join key and the dim side carries a selective filter, Spark injects a
runtime subquery that prunes fact partitions BEFORE scanning them —
the partition-layout counterpart of broadcast joins, and a core reason
to partition 100 TB facts by their dominant join/filter key (ship
year here; event date in a log pipeline).
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


@pytest.fixture(scope="module")
def partitioned_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = tempfile.mkdtemp(prefix="se_dpp_")
    li.write.mode("overwrite").partitionBy("ship_year").parquet(out)
    yield spark.read.parquet(out)
    shutil.rmtree(out, ignore_errors=True)


def test_dpp_prunes_fact_partitions(partitioned_lineitem, spark):
    """Join the year-partitioned fact to a filtered dim keyed on the
    partition column: the fact scan must carry a dynamic pruning
    expression (runtime partition filter), not scan all years."""
    years = (
        partitioned_lineitem.select("ship_year")
        .distinct()
        .withColumn("is_recent", F.col("ship_year") >= 1999)
    )
    joined = (
        partitioned_lineitem.join(
            years.filter(F.col("is_recent")).select(F.col("ship_year").alias("jy")),
            partitioned_lineitem.ship_year == F.col("jy"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ship_year").alias("min_year"),
        )
    )
    row = joined.collect()[0]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert row.min_year >= 1999
    # correctness: equals a static filter of the same years
    static = partitioned_lineitem.filter(F.col("ship_year") >= 1999).count()
    assert row.n == static
