"""Point-in-time (as-of) join — attach to each left row the most recent
right row at-or-before it on a shared key. The canonical feature-store /
training-data operation ("what was the user's last observed state when
this label event happened?"), impossible in the reference engine (no
window functions, no inequality joins — SURVEY §2.3) and painful as a
plain SQL join (the naive form is an inequality join that explodes to
|left|·|right| per key before the per-row argmax).

Spark-first shape: ONE hash-partition shuffle on the key. Left and right
rows are unioned into a single stream, sorted per key by (ts, side) so
every right row precedes the left rows it may serve, and a running
``last(payload, ignoreNulls=True)`` window carries the latest right row
forward onto each left row. The payload rides as ONE struct, so all
attached columns come from the SAME right row even when some of its
fields are NULL. Cost is one Exchange + one per-partition sort —
identical to sessionize — regardless of how many right rows precede each
left row; nothing is ever replicated. A hot key funnels through one task
(the inherent window caveat); pre-salt with ``operators.skew`` if one
key dominates.

Semantics match pandas ``merge_asof(direction="backward",
allow_exact_matches=True)`` and DuckDB ``ASOF JOIN``
(``left.ts >= right.ts``): ties on the timestamp match (the right row
"has happened" at its own timestamp). Right rows sharing one (key, ts)
are resolved deterministically by ``tiebreak`` (the LAST row in
(ts, tiebreak) order wins) — pass a pre-deduplicated right side when an
independent-engine contract needs the choice to be engine-agnostic.

Reference capability gap this fills: `executor.go` has no temporal join
of any kind; the closest surface is Row(from=/to=) time filters
(`executor.go:2508-2620`), which select rows but cannot correlate two
event streams.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance_us: Optional[int] = None,
    tiebreak: Optional[str] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains, for each of
    ``value_cols``, the value from the latest ``right`` row with the same
    ``on`` key and ``right_ts`` ≤ ``left_ts`` (NULL when none exists).

    ``tolerance_us``: maximum staleness in microseconds — matches older
    than ``left_ts - tolerance_us`` are treated as absent (NULL), the
    feature-freshness guard a training pipeline needs so a years-stale
    profile row never silently becomes a feature.

    ``tiebreak``: right-side column ordering concurrent right rows at one
    (key, ts); the last one wins. Defaults to the first value column.

    Output columns: all of ``left``'s, plus one ``<col><suffix>`` per
    value column (suffixed even without collision, so the shape is
    stable). Timestamps compare in microseconds (the repo-wide contract:
    second-truncated epochs would mis-order sub-second neighbors).
    """
    value_cols = list(
        value_cols or [c for c in right.columns if c not in (on, right_ts)]
    )
    if not value_cols:
        raise ValueError("asof_join needs at least one value column")
    tiebreak = tiebreak or value_cols[0]
    if tiebreak not in value_cols:
        raise ValueError(f"tiebreak {tiebreak!r} must be one of value_cols")

    def ep(c: str):
        return F.unix_micros(F.col(c).cast("timestamp_ltz"))

    rtypes = dict(right.dtypes)
    payload_t = "struct<__rt:bigint," + ",".join(
        f"{c}:{rtypes[c]}" for c in value_cols
    ) + ">"
    l_stream = left.select(
        F.col(on).alias("__k"),
        ep(left_ts).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal ts
        F.lit(None).cast(payload_t).alias("__p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    # NULL-timestamp right rows match nothing (pandas merge_asof and
    # DuckDB ASOF JOIN semantics). Without this filter a NULL __t sorts
    # NULLS FIRST under the ascending window order and its payload would
    # be carried onto every left row as if it were the oldest match.
    r_stream = right.where(ep(right_ts).isNotNull()).select(
        F.col(on).alias("__k"),
        ep(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            ep(right_ts).alias("__rt"),
            *[F.col(c) for c in value_cols],
        ).cast(payload_t).alias("__p"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__row"),
    )
    # Rights at one (key, ts) resolve deterministically: the greatest
    # tiebreak sorts last, and last(ignoreNulls) keeps it. Left rows have
    # a NULL payload (sorted first within their slot — irrelevant, their
    # __side already orders them after every equal-ts right).
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            F.col("__p").getField(tiebreak).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_stream.unionByName(r_stream).select(
        "__side",
        "__t",
        "__row",
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
    )
    fresh = (
        F.col("__m").isNotNull()
        if tolerance_us is None
        else F.col("__m.__rt") >= (F.col("__t") - F.lit(int(tolerance_us)))
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[
            F.when(fresh, F.col(f"__m.{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
