"""Exact grouped percentiles (nearest-rank) at scale.

The reference's ``Percentile`` is GLOBAL only (executor.go:3146-3240,
bigger/smaller bisection over one field) and its GroupBy aggregates stop
at count/sum/min/max/distinct — a per-group percentile is a natural
extension every analytics user reaches for. The naive Spark spelling
(``percentile`` window or rank-per-group over raw rows) serializes each
group's ROWS through its partition; this implementation works on the
(group, value) HISTOGRAM instead:

1. ``groupBy(group, value).count()`` — Spark's partial aggregation
   combines map-side, so the shuffle carries one row per DISTINCT
   (group, value), not per input row (for bounded-domain values — BSI
   ints, quantities, scores — that is orders of magnitude smaller);
2. a cumulative window over the histogram (per group, ordered by value:
   input is |distinct values| rows, never corpus rows);
3. nearest-rank pick: the smallest value whose cumulative count reaches
   ``r = ceil(permille·n / 1000)`` — derived with INTEGER arithmetic
   (``(permille·n + 999) div 1000``) on both engines, so the selected
   rank is engine-exact (no float quantile surface at all; the value
   itself is moved verbatim, never computed).

The nearest-rank convention matches the repo's global ``Percentile``
(pql/calls.py) and DuckDB's ``quantile_disc`` at every permille where
ceil-rank and disc-rank agree; oracles replay the rank formula itself,
so the contract never depends on either engine's quantile built-in.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "grouped_percentile",
    "grouped_percentiles",
    "mad_outlier_stats",
]


def grouped_percentile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    permille: int = 500,
    out_col: str = "pct_value",
) -> DataFrame:
    """Exact nearest-rank percentile of ``value_col`` per group:
    the smallest value v such that at least ``ceil(permille·n/1000)``
    of the group's n rows are ≤ v. ``permille=500`` is the median.
    NULL values are excluded (SQL aggregate semantics). Returns one row
    per group: (*group_cols, out_col)."""
    if not (1 <= int(permille) <= 1000):
        raise ValueError(f"permille must be in [1,1000], got {permille}")
    groups = list(group_cols)
    v = F.col(value_col)
    hist = (
        df.where(v.isNotNull())
        .groupBy(*groups, v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups)
    t = hist.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__n", F.sum("__cnt").over(w_tot)
    )
    rank = F.expr(f"({int(permille)} * __n + 999) div 1000")
    picked = t.where(F.col("__cum") >= rank)
    return (
        picked.groupBy(*groups)
        .agg(F.min("__v").alias(out_col))
    )


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    permilles: Sequence[int] = (250, 500, 750, 990),
    prefix: str = "p",
) -> DataFrame:
    """Several exact nearest-rank percentiles per group in ONE histogram
    pass — the profiling shape ("p25/p50/p75/p99 document length per
    source") that naive engines answer with one scan per quantile. The
    (group, value) histogram, its cumulative window, and the final
    group-wise pick are all shared; each extra permille is one more
    conditional ``min`` in the same aggregate, so the plan's shuffle
    count is identical to :func:`grouped_percentile`'s (histogram
    exchange + window + final groupBy) no matter how many quantiles are
    requested. Output columns are ``{prefix}{permille}`` (``p500`` =
    median), each the smallest value whose cumulative count reaches
    ``ceil(permille·n/1000)`` — the same integer-exact rank contract as
    the single-quantile form."""
    ps = [int(p) for p in permilles]
    if not ps:
        raise ValueError("permilles must be non-empty")
    for p in ps:
        if not 1 <= p <= 1000:
            raise ValueError(f"permille must be in [1,1000], got {p}")
    if len(set(ps)) != len(ps):
        raise ValueError(f"duplicate permilles: {ps}")
    groups = list(group_cols)
    v = F.col(value_col)
    hist = (
        df.where(v.isNotNull())
        .groupBy(*groups, v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups)
    t = hist.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__n", F.sum("__cnt").over(w_tot)
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"({p} * __n + 999) div 1000"),
                F.col("__v"),
            )
        ).alias(f"{prefix}{p}")
        for p in ps
    ]
    return t.groupBy(*groups).agg(*aggs)


def mad_outlier_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k_permille: int = 3000,
) -> DataFrame:
    """Robust per-group outlier statistics via MEDIAN ABSOLUTE DEVIATION
    — the data-quality screen that, unlike mean/stddev z-scores, is not
    itself dragged by the outliers it hunts (Hampel; 50% breakdown
    point). Per group: med = nearest-rank median of the value, mad =
    nearest-rank median of |value - med|, and a row is an outlier iff

        |value - med| · 1000  >  k_permille · mad

    cross-multiplied, so the whole contract stays in INTEGER arithmetic
    for integral values — no division, no float, no engine quantile
    built-in (k_permille=3000 is the conventional k=3). When mad = 0
    (more than half the group identical) any deviation at all flags —
    the standard degenerate behavior, documented not hidden.

    Returns one row per group: (*group_cols, med, mad, n_outliers,
    n_rows), all BIGINT.

    Scale shape: both medians ride the grouped_percentile HISTOGRAM
    contract (the shuffles and windows see one row per distinct value,
    never corpus rows); the two stats frames are |groups| rows and
    re-join the log by group key (AQE broadcasts them), so the log
    itself is read twice and shuffled never. NULL groups/values are
    excluded (SQL aggregate semantics)."""
    if k_permille < 0:
        raise ValueError(f"k_permille must be >= 0: {k_permille}")
    groups = list(group_cols)
    v = F.col(value_col)
    # Column-object predicate, not string interpolation: empty groups
    # must not crash (F.expr('') would) and backticked/odd column names
    # must not break quoting.
    pred = v.isNotNull()
    for g in groups:
        pred = pred & F.col(g).isNotNull()
    base = df.where(pred).select(*groups, v.cast("long").alias("__v"))
    med = grouped_percentile(base, groups, "__v", 500, "med")

    def _attach(left: DataFrame, stats: DataFrame) -> DataFrame:
        # empty group list → the stats frame is ONE global row; a keyed
        # join has no keys, so attach it as a 1-row broadcast product
        if groups:
            return left.join(stats, groups)
        return left.crossJoin(F.broadcast(stats))

    dev = _attach(base, med).select(
        *groups, "med", F.abs(F.col("__v") - F.col("med")).alias("__d")
    )
    mad = grouped_percentile(dev, groups, "__d", 500, "mad")
    flagged = _attach(dev, mad)
    return (
        flagged.groupBy(*groups)
        .agg(
            F.min("med").cast("long").alias("med"),
            F.min("mad").cast("long").alias("mad"),
            F.sum(
                F.when(
                    F.col("__d") * 1000 > F.lit(int(k_permille)) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
