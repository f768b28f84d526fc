"""Salted two-phase aggregation must equal the direct aggregation."""

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.skew import salted_count_sum


def test_salted_agg_matches_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # event_type has only 5 distinct values — exactly the shape that
    # skews at scale.
    salted = {
        r.event_type: (r.n_rows, r.total)
        for r in salted_count_sum(ev, ["event_type"], "value").collect()
    }
    direct = {
        r.event_type: (r.n, float(r.t))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("t"),
        )
        .collect()
    }
    assert salted == direct


def test_salt_actually_spreads(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_groups = (
        ev.withColumn(
            "_salt",
            F.xxhash64("event_type", F.monotonically_increasing_id()) % 16,
        )
        .groupBy("event_type", "_salt")
        .count()
        .count()
    )
    # 5 event types x up to 16 salts (xxhash64 % can be negative too,
    # widening the spread) — must exceed the unsalted 5 groups.
    assert n_groups > 20


def test_replicated_salt_join_matches_plain_and_salts_the_shuffle(spark, sf_dir):
    from searchengine_spark.operators.skew import replicated_salt_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    salted = replicated_salt_join(ev, dim, "event_type", n_salts=8)
    plain = ev.join(dim, "event_type")
    cols = ["event_id", "event_type", "value", "type_weight"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # the demo must actually exercise the salted shuffle topology:
    # a shuffled hash join whose partitioning includes the salt —
    # not a broadcast that hides the point.
    assert "BroadcastHashJoin" not in plan
    assert "_salt" in plan and "ShuffledHashJoin" in plan


def test_replicated_salt_join_no_key_loss_on_salt_gap(spark):
    # A fact row's salt is content-derived; every dim key must still
    # match it because the dim carries ALL salts. 1-row-per-key fact
    # exercises the sparsest case (most salt values unused).
    fact = spark.createDataFrame(
        [(i, f"k{i % 3}", float(i)) for i in range(9)], "id long, k string, v double"
    )
    dim = spark.createDataFrame(
        [(f"k{i}", i * 10) for i in range(3)], "k string, w int"
    )
    from searchengine_spark.operators.skew import replicated_salt_join

    got = replicated_salt_join(fact, dim, "k", n_salts=32).collect()
    assert len(got) == 9
    assert all(r["w"] == int(r["k"][1]) * 10 for r in got)
