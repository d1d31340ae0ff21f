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


def funnel(
    df: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_minutes: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed ``steps[0]``,
    then ``steps[1]`` STRICTLY AFTER it, then ``steps[2]`` after that, …
    each within ``horizon_minutes`` of the previous step (unbounded when
    None). The classic product/behavior query the reference's
    bitmap algebra can intersect (users who did A and B) but cannot
    ORDER (A *then* B) — no window or inequality-join machinery
    (SURVEY §2.3).

    Per-user step time = the EARLIEST qualifying event (the standard
    first-touch convention); a user is counted in step i only if counted
    in step i-1. Returns (step, event_type, users) — step is 1-based,
    users is BIGINT and non-increasing.

    Scale shape (r14, guide §1.2/§2.4): ONE pruned scan of the event
    log (``type IN steps`` pushed to the source), ONE hash exchange on
    the user key, then the whole first-touch recursion runs inside that
    partitioning as a chain of unbounded per-user window aggregates —
    ``t_k = min(t) over user where (type = step_k AND t > t_{k-1}
    [AND t <= t_{k-1} + horizon])``. Each t_k references the previous
    window column, so no self-join ever re-reads or re-shuffles events
    (the pre-r14 k-join chain replayed the pruned scan 2(k-1) times).
    A null t_{k-1} nulls the comparison, so non-converting users fall
    out of every later step exactly as the join form dropped them. The
    per-user collapse and the final step counts reuse the same
    partitioning (no extra exchange); the k output rows explode from
    one array, not k replays of the aggregate subtree."""
    ep = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    ev = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("__e"),
            ep.alias("__t"),
        )
    )
    horizon_us = (
        None if horizon_minutes is None else int(horizon_minutes) * 60 * 1_000_000
    )
    w = Window.partitionBy("__u")
    cur = ev
    tcols: list[str] = []
    for i, s in enumerate(steps, start=1):
        cond = F.col("__e") == s
        if tcols:
            prev = F.col(tcols[-1])
            cond = cond & (F.col("__t") > prev)
            if horizon_us is not None:
                cond = cond & (F.col("__t") <= prev + F.lit(horizon_us))
        tc = f"__t{i}"
        cur = cur.withColumn(tc, F.min(F.when(cond, F.col("__t"))).over(w))
        tcols.append(tc)
    per_user = cur.groupBy("__u").agg(
        *[F.max(tc).alias(tc) for tc in tcols]
    )
    counts = per_user.agg(
        *[F.count(tc).alias(f"__c{i}") for i, tc in enumerate(tcols, start=1)]
    )
    return (
        counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("long").alias("step"),
                            F.lit(s).alias("event_type"),
                            F.col(f"__c{i}").cast("long").alias("users"),
                        )
                        for i, s in enumerate(steps, start=1)
                    ]
                )
            ).alias("__r")
        )
        .select("__r.step", "__r.event_type", "__r.users")
        .orderBy("step")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users are cohorted by the Monday-start
    week of their FIRST event; for every later week in which they have
    any event, the (cohort_week, week_offset) cell counts them. The
    growth-accounting query every event warehouse serves daily; the
    reference can intersect time-quantum views per week but cannot
    correlate them per user without N² PQL round trips.

    Scale shape: ONE groupBy(user) computes min(ts) AND the distinct
    active weeks together (``collect_set`` over date_trunc'd weeks —
    bounded by the calendar, not the event count, with map-side partial
    dedup), then the exploded (cohort, offset) pairs — ≤ weeks-per-user
    rows per user — feed one small groupBy. The raw event log shuffles
    once, pre-reduced to per-user week sets.

    Returns (cohort_week DATE, week_offset BIGINT, active_users BIGINT),
    week_offset 0 = the cohort week itself."""
    wk = F.date_trunc("week", F.col(ts_col))
    per_user = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), wk.alias("__w"))
        .groupBy("__u")
        .agg(
            F.min("__w").alias("__cohort"),
            F.collect_set("__w").alias("__weeks"),
        )
    )
    return (
        per_user.select(
            F.col("__cohort").cast("date").alias("cohort_week"),
            F.explode("__weeks").alias("__w"),
        )
        .withColumn(
            "week_offset",
            (
                F.datediff(F.col("__w").cast("date"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition matrix: for every consecutive pair
    of events of the same user (ordered by ``ts_col``, ties broken by
    ``id_col`` so the matrix is deterministic), count (from_type,
    to_type). The "what do users do next" Markov view that drives
    funnel discovery — the funnel/retention tier's third leg, and like
    them inexpressible in the reference's PQL (no per-user ordering;
    SURVEY §2.3 "Window functions: none").

    Scale shape: the ONE user-key exchange every behavioral operator in
    this module shares (sessionize/funnel/retention all hash on the
    user), a single ``lead`` window pass over it, then a groupBy whose
    shuffle is bounded by |event types|² rows — never the event log.

    Returns (from_type, to_type, transitions), one row per observed
    ordered pair."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        df.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
