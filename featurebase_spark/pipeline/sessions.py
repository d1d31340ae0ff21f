"""Event sessionization — a training-data/behavioral-analytics operator the
reference cannot express (no window functions, SURVEY §2.3 "Window
functions: none") but a 100 TB event pipeline needs constantly. Built on
Spark Window per the SURVEY extension goals.

Scale shape: ONE hash-partition shuffle on the user key; both window
passes (gap detection, session numbering) share that partitioning, so
Catalyst plans a single Exchange and sorts once per partition. The
session aggregation then groups by (user, session) — a prefix of the
existing key — with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign each event a session id: a session breaks when the gap from the
    user's previous event exceeds ``gap_minutes``. Returns the input plus
    ``session_id`` (1-based per user, ordered by time)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # gap math in MICROSECONDS: second-truncated epochs mis-split sessions
    # whose gap straddles the threshold by a fraction (and NTZ timestamps
    # refuse a direct long cast; session TZ is pinned UTC)
    ep = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gap = ep - F.lag(ep).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id", F.sum(new_session).over(w)
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: (user, session_id, n_events, t_start, t_end,
    duration_sec)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
            F.floor(
                (
                    F.max(F.unix_micros(F.col(ts_col).cast("timestamp_ltz")))
                    - F.min(F.unix_micros(F.col(ts_col).cast("timestamp_ltz")))
                )
                / F.lit(1_000_000)
            ).alias("duration_sec"),
        )
        .orderBy(user_col, "session_id")
    )
