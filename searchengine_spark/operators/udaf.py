"""Custom aggregates via Arrow grouped-agg pandas_udf (the UDAF
surface — the reference has none; SURVEY §2.9).

Demonstrated with the Gini coefficient per group (inequality of the
value distribution — a data-curation signal for source balance).
Grouped-agg pandas_udf receives each group's column as one pandas
Series over Arrow; at scale groups are distributed across executors
like any hash aggregation, with the usual caveat that a single
group's values must fit in memory (fine for per-type/per-source
stats; for billions-per-group use an algebraic approximation).

Oracle: the same Gini is SQL-expressible with a rank window —
sum((2i - n - 1) * x_i) / (n * sum(x)) over ascending x — so even
the Python UDAF path gets a DuckDB twin (rounded to 6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from searchengine_spark.io import load_table


# NB: type OBJECT, not the "double" DDL string — string types are
# parsed eagerly and would require an active SparkSession at import.
@F.pandas_udf(DoubleType())
def gini_udaf(values: pd.Series) -> float:
    """Gini coefficient of a non-negative sample (0=equal, ->1=concentrated)."""
    x = values.sort_values().reset_index(drop=True)
    n = len(x)
    if n == 0 or x.sum() == 0:
        return 0.0
    i = pd.RangeIndex(1, n + 1)
    return float(((2 * i - n - 1) * x).sum() / (n * x.sum()))


def q_value_gini_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # A grouped-agg pandas UDF cannot share an agg() with JVM
    # aggregates; the count comes from a second (tiny) aggregation
    # joined on the group key.
    gini = ev.groupBy("event_type").agg(
        F.round(gini_udaf(F.col("value")), 6).alias("gini")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return gini.join(counts, "event_type")


QUERIES = {"udaf_value_gini_by_type": q_value_gini_by_type}

ORACLES = {
    "udaf_value_gini_by_type": """
        WITH ranked AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type,
               round(SUM((2 * i - n - 1) * value) / (MAX(n) * SUM(value)), 6) AS gini,
               COUNT(*) AS n_events
        FROM ranked
        GROUP BY event_type
    """,
}
