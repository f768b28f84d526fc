#!/usr/bin/env python
"""Isolate-reproduce a bench timing (PROGRESS round-5 rule).

Runs each named registry query in its OWN fresh python+JVM process at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), executing via the
same noop sink bench.py uses, and prints one JSON line per query:
{"query": name, "sec": wall, "spark_calib_sec": probe}.

Usage:
    python scripts/isolate_retime.py q1 q2 ... [--repeat 2]

The child warms the table file-indexes and the Python worker pool the
same way bench.py does (so the number isolates the QUERY, not session
startup), and runs bench.py's two-stage Spark calibration probe in the
same session so numbers are comparable across hosts the way the budget
gate compares them.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
name = os.environ["SPARK_GRAFT_QUERY"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F
import __spark_entry__ as entry
from searchengine_spark.session import get_spark
from searchengine_spark.io import load_tables
spark = get_spark("isolate-retime")
for df in load_tables(spark, sf_dir).values():
    try:
        df.count()
    except Exception:
        pass
spark.range(64).repartition(64).mapInPandas(
    lambda it: it, "id long"
).write.format("noop").mode("overwrite").save()
q = entry.queries()[name]
t0 = time.perf_counter()
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
sec = time.perf_counter() - t0
t0 = time.perf_counter()
spark.range(8_000_000).groupBy(
    (F.col("id") * 2654435761 % 65537).alias("k")
).agg(
    F.count("*").alias("c"), F.sum("id").alias("s")
).select(F.sum(F.col("c") * F.col("s"))).collect()
calib = round(time.perf_counter() - t0, 3)
print(json.dumps({"query": name, "sec": round(sec, 3),
                  "spark_calib_sec": calib}))
spark.stop()
"""


def main() -> None:
    repeat = 1
    names = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        for _ in range(repeat):
            env = dict(os.environ, SPARK_GRAFT_REPO=repo, SPARK_GRAFT_QUERY=name)
            r = subprocess.run(
                [sys.executable, "-c", CHILD], env=env, cwd=repo,
                capture_output=True, text=True,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if line:
                print(line[-1])
            else:
                print(json.dumps({"query": name, "error": r.stderr[-400:]}))


if __name__ == "__main__":
    main()
