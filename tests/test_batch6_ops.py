"""Proximity match, referential-integrity DQ, daily first touch."""

import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.index.phrase import (
    PROX_SLOP,
    build_positional_index,
    proximity_match,
    q_proximity_match,
)
from searchengine_spark.io import load_table
from searchengine_spark.operators.expectations import q_referential_integrity
from searchengine_spark.relational.timeseries import q_daily_first_touch


def test_proximity_planted_distances(spark):
    texts = [
        "alpha beta spark gamma delta window zz",   # dist 3 -> match
        "spark one two three four five six window", # dist 7 -> no match
        "window then immediately spark here",        # dist 3, reversed order
        "spark alone without the other term",        # missing term b
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(4), "text": texts}))
    pos = build_positional_index(df)
    got = {r["doc_id"]: r for r in proximity_match(pos, "spark", "window").collect()}
    assert set(got) == {0, 2}
    assert got[0]["min_distance"] == 3 and got[2]["min_distance"] == 3
    assert all(r["min_distance"] <= PROX_SLOP for r in got.values())


def test_proximity_superset_of_phrase_adjacency(spark, sf_dir):
    rows = q_proximity_match(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["min_distance"] <= PROX_SLOP
        assert r["n_anchor_hits"] >= 1


def test_referential_integrity_counts(spark, sf_dir):
    row = q_referential_integrity(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert row["n_orders"] == orders.count()
    assert row["n_lineitems"] == li.count()
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert row["orphan_lineitems"] == row["n_lineitems"] - joined
    assert row["fk_intact"] == int(
        row["orphan_lineitems"] == 0 and row["childless_orders"] == 0
    )


def test_first_touch_one_row_per_user_day(spark, sf_dir):
    out = q_daily_first_touch(spark, sf_dir)
    assert out.groupBy("user_id", "day_idx").count().filter(
        F.col("count") > 1
    ).count() == 0
    ev = load_table(spark, sf_dir, "events")
    n_user_days = (
        q_daily_first_touch(spark, sf_dir).count()
    )
    # one row per active (user, day)
    from searchengine_spark.event_time import event_time_seconds, exact_floor_div

    expect = (
        ev.select(
            "user_id",
            exact_floor_div(event_time_seconds(ev, "ts"), 86400).alias("d"),
        )
        .distinct()
        .count()
    )
    assert n_user_days == expect


def test_events_stickiness_matches_oracle(spark, sf_dir):
    """DAU/MAU per day: full month of days, ratio in (0, 1]."""
    from pyspark.sql import functions as F

    from searchengine_spark.relational import events as EV
    from tests.helpers import assert_matches_oracle

    df = EV.q_events_stickiness(spark, sf_dir).cache()
    rows = df.collect()
    assert len(rows) >= 28  # the events span a month of days
    assert all(0 < r["stickiness"] <= 1.0 for r in rows)
    assert all(r["dau"] <= r["mau"] for r in rows)
    assert_matches_oracle(
        df,
        EV.ORACLES["events_stickiness"],
        sf_dir,
        name="events_stickiness",
    )
    df.unpersist()


def test_weekday_hour_heatmap_matches_oracle(spark, sf_dir):
    """7x24 load profile with engine-independent integer dow."""
    from pyspark.sql import functions as F

    from searchengine_spark.relational import events as EV
    from tests.helpers import assert_matches_oracle

    df = EV.q_events_weekday_hour_heatmap(spark, sf_dir).cache()
    agg = df.agg(
        F.min("dow"), F.max("dow"), F.min("hour"), F.max("hour"),
        F.count(F.lit(1)),
    ).collect()[0]
    assert (agg[0], agg[1]) == (0, 6) and (agg[2], agg[3]) == (0, 23)
    assert agg[4] >= 160  # ~all of the 168 cells populated
    assert_matches_oracle(
        df,
        EV.ORACLES["events_weekday_hour_heatmap"],
        sf_dir,
        name="events_weekday_hour_heatmap",
    )
    df.unpersist()
