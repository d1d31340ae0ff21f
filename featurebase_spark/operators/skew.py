"""Skew-handling utilities for 100-TB shapes.

The reference sidesteps key skew structurally: shards are fixed 2^20-record
ranges of _id (shardwidth/helper.go:14), so no data-dependent partitioning
exists to skew. On Spark, groupBy/join hash-partition by KEY VALUE — a hot
key concentrates on one task. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin`` — on by default in session.py) covers
sort-merge joins; these helpers cover the remaining cases explicitly:

- :func:`salted_agg` — two-phase aggregation for decomposable aggregates
  (count/sum/min/max): partial-agg on (keys, salt), final on keys. The hot
  key's partials spread across ``buckets`` tasks.
- :func:`salted_join` — replicate-the-dim salting for a skewed fact⋈dim
  equi-join: the fact side gets a random-ish salt, the dim side is
  exploded ``buckets`` ways, and the join key becomes (key, salt).

Both are pure DataFrame rewrites — results are provably identical to the
unsalted plan (tests assert equality), only the shuffle layout changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def _salt(df: DataFrame, buckets: int):
    # The salt feeds a shuffle key, so it must be DETERMINISTIC under
    # partial recomputation: a stage retry after a shuffle-fetch failure
    # re-evaluates the expression, and a nondeterministic salt
    # (monotonically_increasing_id, rand) could assign rows to different
    # buckets than already-consumed output — duplicating/losing rows.
    # Hash the whole row instead: stable across retries, decorrelated
    # from any single hot key value.
    return F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Optional[dict[str, str]] = None,
    count_alias: Optional[str] = "count",
    buckets: int = 64,
) -> DataFrame:
    """Two-phase (salted) aggregation: COUNT and/or SUMs per key group.

    ``sum_cols`` maps input column → output alias. Identical results to
    ``df.groupBy(keys).agg(...)``; the difference is the first shuffle
    partitions on (keys, salt) so a hot key fans out over ``buckets``
    tasks before the tiny final combine.
    """
    sum_cols = sum_cols or {}
    partial_aggs = []
    final_aggs = []
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__pc"))
        final_aggs.append(F.sum("__pc").cast("long").alias(count_alias))
    for col, alias in sum_cols.items():
        partial_aggs.append(F.sum(col).alias(f"__ps_{alias}"))
        final_aggs.append(F.sum(f"__ps_{alias}").alias(alias))
    partial = (
        df.withColumn("__salt", _salt(df, buckets))
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant fact⋈dim equi-join: dim rows are replicated once per
    salt bucket (dim is small — that's why it's a dim), facts are salted,
    and the join runs on (key, salt). A hot fact key now lands on
    ``buckets`` different reducers instead of one.

    Only meaningful when the dim is too big to broadcast outright but the
    fact side has heavy key skew; with a broadcastable dim, plain
    ``F.broadcast`` is strictly better (no shuffle at all).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salted_facts = facts.withColumn("__salt", _salt(facts, buckets))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias("__salt")
    replicated_dim = dim.select("*", salts)
    out = salted_facts.join(replicated_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")
