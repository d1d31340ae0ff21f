"""Per-key steady-state profiler: run each named bench key N times in
one warm session, timing (a) DataFrame build (py4j + analysis) and
(b) execution via the bench's own action (len(collect())), plus one
noop-sink run (guide §1.4) to separate compute from result pickup.

Run: python tools/profile_keys.py key [key ...] [--n 4]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv, args, n = sys.argv[1:], [], 4
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--n"):
            if "=" in a:
                n = int(a.split("=")[-1])
            else:  # space-separated form: consume the value token too
                i += 1
                n = int(argv[i])
        else:
            args.append(a)
        i += 1
    from featurebase_spark.session import get_spark, load_tables
    from featurebase_spark import queries as Q

    spark = get_spark("profile-keys")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    # bench warm section equivalents (untimed there, untimed here)
    Q.SPARK_QUERIES["pql_count"](spark, SF_DIR).collect()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(32).select(_warm("id")).collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").collect()
    needs_bitmap = any(a.startswith(("bitmap", "pql_text_routed", "sql_routed")) for a in args)
    if needs_bitmap:
        Q._bitmap_cat(spark, SF_DIR)
    if any("bucketed" in a for a in args):
        Q._bucketed_tables(spark, SF_DIR)
    if any("prebuilt" in a for a in args):
        Q._trigram_postings(spark, SF_DIR)

    for name in args:
        fn = Q.SPARK_QUERIES[name]
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            rows = len(df.collect())
            t2 = time.perf_counter()
            runs.append((t1 - t0, t2 - t1))
        # one noop-sink run on a warm plan
        spark.sparkContext.setJobDescription(f"{name} noop")
        df = fn(spark, SF_DIR)
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t3
        spark.sparkContext.setJobDescription(None)
        build = "/".join(f"{b:.2f}" for b, _ in runs)
        execu = "/".join(f"{e:.2f}" for _, e in runs)
        print(
            f"{name}: rows={rows} build={build} exec={execu} "
            f"noop={t_noop:.2f} total_first={runs[0][0]+runs[0][1]:.2f} "
            f"total_best={min(b+e for b,e in runs):.2f}"
        )


if __name__ == "__main__":
    main()
