"""Bucketed interval-overlap join — the range-predicate join Spark has
no native strategy for.

A naive ``a.join(b, (a.s <= b.e) & (b.s <= a.e))`` has no equi-key, so
Catalyst falls back to BroadcastNestedLoopJoin (or CartesianProduct) —
an O(|A|·|B|) comparison that is the canonical 100 TB scale-killer for
temporal analytics (concurrent sessions, ad exposure vs conversion
windows, downtime vs request intervals). The standard distributed fix
(used by Spark range-join hints on Databricks, by PostGIS tile joins,
and by interval trees flattened to grids) is bucketing:

1. chop the timeline into fixed-width buckets;
2. explode every interval into the bucket ids it covers
   (``sequence(floor(s/w), floor(e/w))`` — pure projection, no shuffle);
3. hash-equi-join on the bucket id (+ any extra equi keys);
4. re-check the exact overlap predicate;
5. de-duplicate pairs that share several buckets WITHOUT a distinct
   shuffle: a pair overlapping at all shares the bucket containing
   ``max(s_a, s_b)`` (overlap means ``max(s) <= min(e)``, so that
   bucket is inside both cover ranges) — keep the match only there.

Cost model at scale: exploded rows = Σ ceil(span/width) ≈ |rows| for
width chosen near the median span; join buckets carry only the
intervals ALIVE in that wall-clock bucket, so candidate pairs per
bucket are density², never |table|² — the same pigeonhole shape as the
trigram/Ed-Join posting caps. Width is the knob: too small multiplies
the explode, too large grows per-bucket density; both are visible,
bounded, and tunable per deployment.

Reference parity: the reference has no join of any kind beyond
nested-loop equality (sql3/planner/opnestedloops.go) and no range
join; this is a declared extension per SURVEY §2 goals (behavioral
tier). Public-literature design (grid/tile range join); no reference
code followed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
    suffixes: tuple[str, str] = ("_a", "_b"),
    extra_pred=None,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED intervals
    [start, end] overlap: ``s_a <= e_b AND s_b <= e_a``.

    ``start_col``/``end_col`` name integer (epoch-micros style) columns
    present in BOTH inputs; every output column carries the side's
    suffix. ``bucket_width`` is in the same units. ``extra_pred``
    (optional) is a Column filter applied to the suffixed pair frame
    inside the join stage (e.g. ``col("user_id_a") < col("user_id_b")``
    for a self-join) — pushing it here lets Catalyst evaluate it before
    the exact-overlap math.

    Rows with NULL or inverted (end < start) intervals never match,
    mirroring how the as-of tier drops NULL timestamps.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    la, lb = suffixes
    w = F.lit(int(bucket_width))

    def prep(df: DataFrame, sfx: str) -> DataFrame:
        renamed = df.select(
            [F.col(c).alias(f"{c}{sfx}") for c in df.columns]
        )
        s, e = F.col(f"{start_col}{sfx}"), F.col(f"{end_col}{sfx}")
        return renamed.where(
            s.isNotNull() & e.isNotNull() & (s <= e)
        ).withColumn(
            "__bkt",
            F.explode(F.sequence(F.floor(s / w), F.floor(e / w))),
        )

    a, b = prep(left, la), prep(right, lb)
    sa, ea = F.col(f"{start_col}{la}"), F.col(f"{end_col}{la}")
    sb, eb = F.col(f"{start_col}{lb}"), F.col(f"{end_col}{lb}")
    # keep each overlapping pair ONLY in the bucket of max(s_a, s_b):
    # overlap ⇒ max(s) <= min(e) ⇒ that bucket is covered by both sides,
    # so exactly one joined copy survives — no distinct pass needed
    cond = (
        (sa <= eb)
        & (sb <= ea)
        & (F.col("__bkt") == F.floor(F.greatest(sa, sb) / w))
    )
    out = a.join(b, on=["__bkt"], how="inner").where(cond)
    if extra_pred is not None:
        out = out.where(extra_pred)
    return out.drop("__bkt")


def concurrent_session_pairs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Cross-user concurrent-session analysis: for every unordered pair
    of distinct users, how many of their sessions overlapped in wall
    clock and for how long — (user_a, user_b, n_overlaps, overlap_us).

    Plan shape: the session intervals reuse sessionize's single user
    shuffle and reduce to one integer-interval row per session
    (``(user, session, s_us, e_us)`` — timestamps leave as micros
    immediately, so the pair join carries four longs per row and never
    re-touches event payloads). The self-join is the bucketed
    interval_overlap_join above — hash join on hourly buckets, exact
    predicate re-check, max-start bucket dedup — then one (user_a,
    user_b) aggregation with map-side partials. Overlap duration is
    ``min(e) - max(s)`` in integer micros: exact on both engines.
    """
    from featurebase_spark.pipeline.sessions import sessionize

    ep = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    s = sessionize(
        events.where(
            F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        ),
        user_col,
        ts_col,
        gap_minutes,
    )
    iv = s.groupBy(user_col, "session_id").agg(
        F.min(ep).alias("s_us"), F.max(ep).alias("e_us")
    )
    pairs = interval_overlap_join(
        iv,
        iv,
        "s_us",
        "e_us",
        bucket_width_us,
        extra_pred=F.col(f"{user_col}_a") < F.col(f"{user_col}_b"),
    )
    ov = F.least(F.col("e_us_a"), F.col("e_us_b")) - F.greatest(
        F.col("s_us_a"), F.col("s_us_b")
    )
    return (
        pairs.groupBy(
            F.col(f"{user_col}_a").alias("user_a"),
            F.col(f"{user_col}_b").alias("user_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.sum(ov).cast("long").alias("overlap_us"),
        )
    )
