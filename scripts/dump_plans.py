#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage:
    python scripts/dump_plans.py <outdir> <suffix> name1 name2 ...

Writes <outdir>/<name>_<suffix>.txt for each query. Used by the
optimization rounds to record before/after physical plans
(plans/r13/<query>_{before,after}.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from searchengine_spark.registry import all_queries
    from searchengine_spark.session import get_spark

    spark = get_spark("dump-plans")
    queries = all_queries()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
