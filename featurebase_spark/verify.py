"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values.

Usage:
    python -m featurebase_spark.verify [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from featurebase_spark.session import TABLES, get_spark, load_tables


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(sorted(v)) if isinstance(v, (list, set)) else str(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or (isinstance(a, float) and math.isnan(a))) and (
        b is None or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    return a == b


def compare_frames(sp: pd.DataFrame, du: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
        return problems
    a, b = _canon(sp), _canon(du)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cells_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {col}: {len(bad)}/{len(av)} cells differ; first at row {i}: "
                f"spark={x!r} duck={y!r}"
            )
    return problems


def run(sf_dir: str, names: list[str] | None = None) -> int:
    from featurebase_spark import queries as Q

    spark = get_spark("verify")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    con = duck_connection(sf_dir)

    todo = names or list(Q.SPARK_QUERIES)
    failures = 0
    for name in todo:
        fn = Q.SPARK_QUERIES[name]
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in Q.ORACLE_SQL:
            print(f"ok?  {name}: rows={len(sp)} (no oracle — rows-only check)")
            continue
        try:
            du = con.sql(Q.ORACLE_SQL[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare_frames(sp, du)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(sp)}")
    print(f"\n{len(todo) - failures}/{len(todo)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    raise SystemExit(run(sf, args or None))
