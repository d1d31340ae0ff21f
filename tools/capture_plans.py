"""Capture .explain("formatted") for bench keys into plans/<round>/.

Run: python tools/capture_plans.py <suffix> [key ...]
  suffix: "before" | "after"  → plans/$PLANS_ROUND/<key>_<suffix>.txt
  ($PLANS_ROUND defaults to r14; $PLANS_OUT overrides the whole dir)
  with no keys, captures every key in bench.py's BENCH_QUERIES.

Plan capture runs the same untimed warm/ingest section bench.py runs
(bitmap catalog, bucketed tables, trigram postings) so keys that read
those structures build the same plans the bench times.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import BENCH_QUERIES
    from featurebase_spark.session import get_spark, load_tables
    from featurebase_spark import queries as Q

    keys = sys.argv[2:] or [k for k in BENCH_QUERIES if k in Q.SPARK_QUERIES]
    out_dir = os.environ.get("PLANS_OUT") or os.path.join(
        REPO, "plans", os.environ.get("PLANS_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    # same untimed ingest/warm section as bench.py
    Q._bitmap_cat(spark, SF_DIR)
    Q._bucketed_tables(spark, SF_DIR)
    Q._trigram_postings(spark, SF_DIR)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in keys:
        try:
            df = Q.SPARK_QUERIES[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}"
        # normalize volatile ids so before/after diffs are readable
        txt = re.sub(r"#\d+L?", "#x", txt)
        txt = re.sub(r"plan_id=\d+", "plan_id=x", txt)
        txt = re.sub(r"\[id=#?\d+\]", "[id=#x]", txt)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
