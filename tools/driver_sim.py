"""Driver-environment simulation: run the FIRST-50 hard-gate keys the
exact way the round driver does — a PLAIN SparkSession (no get_spark
configs beyond __spark_entry__._prepare) and a DuckDB compare of every
key's oracle. Catches configs that only get_spark() sets and any
plain-session streaming/Arrow issues before the driver finds them.

Run: python tools/driver_sim.py [n_keys]
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main(n_keys: int = 50) -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # driver smoke check
    assert m.entry(spark).count() > 0

    qs = m.queries()
    oracles = m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    from featurebase_spark.verify import compare_frames

    names = list(qs)[:n_keys]
    failures = 0
    for name in names:
        try:
            sp = qs[name](spark, SF_DIR).toPandas()
            du = con.sql(oracles[name]).df()
            problems = compare_frames(sp, du)
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(p[:200] for p in problems)}")
        else:
            print(f"PASS {name}")
    print(f"\n{len(names) - failures}/{len(names)} passed (plain session)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 50))
