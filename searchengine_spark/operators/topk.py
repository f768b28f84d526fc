"""Grouped top-k without a data-scale window sort.

The window idiom (`row_number() OVER (PARTITION BY g ORDER BY v)`,
filter rk <= k) shuffles and SORTS every row of every group — at
100 TB with hot groups that is a giant skewed sort whose output is
then 99.99% discarded. The scalable shape is two-phase, mirroring
how TakeOrderedAndProject works for GLOBAL top-k:

  1. partial top-k per (input partition x group), computed inside an
     Arrow-batched mapInPandas with a bounded heap — each task emits
     at most k rows per group it sees; combined volume shrinks from
     |data| to <= k * n_groups * n_partitions BEFORE any shuffle;
  2. final exact top-k over the tiny survivor set with the ordinary
     window — correct because the global top-k of a group is always
     contained in the union of its per-partition top-k's.

Total order (v DESC, id ASC) makes the result deterministic and lets
the DuckDB oracle state phase-agnostic semantics: the plain window
formulation over the raw table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k rows per group by (order_col DESC, id_col ASC).

    Output: group, id, value, rank (1-based)."""
    cols = [group_col, order_col, id_col]
    slim = df.select(*cols)
    schema = slim.schema

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        [group_col, order_col, id_col],
                        ascending=[True, False, True],
                    )
                    .groupby(group_col, sort=False)
                    .head(k)
                )

    survivors = slim.mapInPandas(partial, schema)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col(order_col),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --------------------------------------------------------------- queries

TOPK_K = 3


def q_top_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 highest-value events per type via the two-phase shape."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", "event_id")
        # NULL ordering differs subtly across engines (and pandas NaN
        # sorting) — exclude them; a NULL value can't be a top value.
        .filter(F.col("value").isNotNull())
    )
    return grouped_topk(ev, "event_type", "value", "event_id", TOPK_K)


QUERIES = {"events_top3_per_type": q_top_events_per_type}

ORACLES = {
    # phase-agnostic semantics: the plain window formulation
    "events_top3_per_type": f"""
        SELECT event_type, event_id, value, CAST(rank AS INT) AS rank
        FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id ASC
                 ) AS rank
          FROM events WHERE value IS NOT NULL
        ) WHERE rank <= {TOPK_K}
    """,
}
