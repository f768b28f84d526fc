"""Winsorized event stats: hand-computed clip on a toy frame."""

import os

from pyspark.sql import functions as F

from searchengine_spark.relational.advanced import q_winsorized_event_stats


def test_winsorize_clips_tails_exactly(spark, tmp_path):
    # 21 values 0..20 in one type: continuous p05 = 1.0, p95 = 19.0.
    # Clipped sum = 210 (raw) - 0 - 20 + 1 + 19 = 210. Two rows clip.
    rows = [
        (i, "2024-01-01 00:00:00", 1, "click", float(v), "{}")
        for i, v in enumerate(range(21))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(os.path.join(tmp_path, "events.parquet"))
    got = q_winsorized_event_stats(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_events"], r["n_clipped"]) == (21, 2)
    assert (r["lo"], r["hi"]) == (1.0, 19.0)
    assert r["clipped_sum"] == 210.0
