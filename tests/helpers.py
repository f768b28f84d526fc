"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from searchengine_spark.io import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for t in TABLES:
            p = table_path(sf_dir, t)
            if not os.path.exists(p):
                continue  # planted-fixture dirs carry only the tables under test
            if os.path.isdir(p):
                # Spark-written table (directory of part files) from a
                # planted fixture — glob the parts for DuckDB.
                p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(run_oracle(oracle_sql, sf_dir))

    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a):
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(a, e))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (x == y)
                    or (math.isclose(x, y, rel_tol=0, abs_tol=0))
                )
            ]
        else:
            mism = a.astype(str) != e.astype(str)
            bad = [
                (i, a.iloc[i], e.iloc[i]) for i in mism[mism].index[:5]
            ]
        assert not bad, f"{name}: column {c} value mismatches (first 5): {bad[:5]}"
