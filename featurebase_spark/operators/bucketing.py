"""Bucketed (co-located) joins — the shuffle-elimination lever for
repeated big⋈big joins at 100 TB.

The reference co-locates by construction: records live in fixed 2^20-id
shards and every per-field fragment of a shard sits on the same node
(fragment.go:30-80), so PQL set-ops never move data. Spark's equivalent
for JOIN keys is bucketed storage: ``bucketBy(n, key)`` at write time
hash-partitions files by key, and a join of two tables bucketed on the
same key with the same bucket count runs WITHOUT either side shuffling
(SortMergeJoin directly over bucket-aligned scans — no Exchange in the
plan; tests assert this).

Use when a dimension is too big to broadcast and the join repeats enough
to amortize the bucketed write (ETL star schemas, repeated fact⋈fact
reconciliation). One-shot joins should let AQE pick the strategy instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    buckets: int = 32,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally
    bucket-sorted) by ``keys``. Sorting by the join key lets SortMergeJoin
    skip the per-task sort too."""
    spark = df.sparkSession
    if mode == "overwrite":
        # drop both the catalog entry and any orphaned location (a managed
        # table dir left by a previous session would fail the save)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        if wh.startswith("file:"):
            wh = wh[5:]
        import shutil

        shutil.rmtree(f"{wh.rstrip('/')}/{name.lower()}", ignore_errors=True)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on
    their bucket keys. With matching bucket specs Catalyst plans a
    zero-Exchange SortMergeJoin; this helper just documents the contract
    (the join itself is a plain ``DataFrame.join``)."""
    return spark.table(left).join(spark.table(right), list(on), how)


def join_has_no_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains no SHUFFLE exchange (a
    BroadcastExchange is allowed — it moves the small side, not the
    bucketed data) — the property bucketing buys. For tests/plan audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and "ShuffleExchange" not in plan
