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

from typing import Union

from pyspark.sql import Column, DataFrame, functions as F

from featurebase_spark.materialize import materialize


def derive_bucket_width(
    left: DataFrame, right: DataFrame, start_col: str, end_col: str
) -> int:
    """Auto-width: the median interval span across both inputs.

    Width ≈ median span keeps the explode factor near 2 buckets/row
    (a median-length interval covers 1-2 buckets) while holding
    per-bucket density to the intervals genuinely alive in one
    median-span window — the knee of the explode-vs-density tradeoff
    described in the module docstring. One small approx-percentile
    job at plan time; falls back to 1 (pure equi-join on start value)
    when every span is zero or the input is empty.
    """
    spans = left.select(
        (F.col(end_col) - F.col(start_col)).alias("__span")
    ).unionAll(
        right.select(
            (F.col(end_col) - F.col(start_col)).alias("__span")
        )
    ).where(F.col("__span") >= 0)
    med = spans.select(
        F.percentile_approx("__span", 0.5, 10_000).alias("m")
    ).first()["m"]
    return max(1, int(med or 0))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: Union[int, str],
    suffixes: tuple[str, str] = ("_a", "_b"),
    extra_pred=None,
    skew: str = "none",
    skew_threshold: int = 100_000,
    salt_factor: int = 16,
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

    ``bucket_width="auto"`` derives the width from the median span
    (:func:`derive_bucket_width`) — one small job at plan time.

    ``skew`` controls hot-bucket handling (a wall-clock window where
    N intervals are simultaneously alive is N² candidate pairs in ONE
    join task — the timeline analogue of a heavy-hitter key):

    - ``"none"`` (default): plain bucket equi-join; AQE's skew-join
      split still applies to the sort-merge path at runtime.
    - ``"salt"``: two-phase split-left/replicate-right inside hot
      buckets only. Phase 1 aggregates per-bucket LEFT counts (small:
      one row per bucket) and broadcasts the buckets over
      ``skew_threshold``. Phase 2 gives each hot-bucket left row ONE
      deterministic salt in [0, salt_factor) and replicates each
      hot-bucket right row to ALL salt_factor salts, joining on
      (bucket, salt). Recall is exactly 100%: a candidate pair meets
      precisely at the left row's single salt value (the right copy
      with that salt always exists), and non-hot buckets ride salt 0
      on both sides — the same pairs survive, spread over
      ``salt_factor`` tasks instead of one. Total work is unchanged
      (the N² candidates are real); replicated rows add
      (salt_factor-1)× explode cost ONLY for rows in hot buckets.
    - ``"error"``: refuse loudly with per-bucket density stats when
      any bucket exceeds ``skew_threshold`` (the heavy-hitters
      sentinel posture — for pipelines that would rather re-bucket
      than absorb a density² stage).
    """
    if skew not in ("none", "salt", "error"):
        raise ValueError(f"skew must be none|salt|error: {skew}")
    if bucket_width == "auto":
        bucket_width = derive_bucket_width(left, right, start_col, end_col)
    if int(bucket_width) <= 0:
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
    join_keys = ["__bkt"]
    # Self-joins (left IS right, the concurrent-sessions shape) have
    # bit-identical per-bucket counts on both sides, so the skew modes'
    # two-sided density union would aggregate the same exploded frame
    # twice for the same answer — compute it once (r13 optimization;
    # guide §1.2 "don't compute things you throw away").
    self_join = left is right

    def side_counts():
        cnt = a.groupBy("__bkt").count()
        if not self_join:
            cnt = cnt.unionAll(b.groupBy("__bkt").count())
        return cnt

    if skew == "error":
        # two-sided, like the salt path: a bucket hot on EITHER side
        # makes that bucket's join task N_a·N_b-heavy, so a right-only
        # hot bucket must trip the sentinel too
        dens = (
            side_counts()
            .groupBy("__bkt").agg(F.max("count").alias("count"))
            .where(F.col("count") > skew_threshold)
            .orderBy(F.desc("count"))
            .limit(5)
            .collect()  # bounded: ≤5 rows of (bucket, count)
        )
        if dens:
            stats = ", ".join(
                f"bucket {r['__bkt']}: {r['count']} rows" for r in dens
            )
            raise ValueError(
                "interval_overlap_join: hot buckets exceed "
                f"skew_threshold={skew_threshold} ({stats}); widen "
                "bucket_width, pre-filter the dense window, or use "
                "skew='salt'"
            )
    elif skew == "salt":
        k = int(salt_factor)
        if k < 2:
            raise ValueError(f"salt_factor must be >= 2: {salt_factor}")
        # Phase 1: per-bucket row counts on EACH side (skew on either
        # side makes the bucket's task N_a·N_b-heavy) — one row per
        # bucket, aggregated map-side; the hot set (count>threshold)
        # is tiny by construction and broadcast to both sides. The
        # lazy localCheckpoint materializes the (small) hot set once:
        # without it the count-aggregate subtree — including the
        # inputs' full lineage — replays inside BOTH sides' joins
        # (r13 plan audit: the salted gate key re-ran sessionize six
        # times; guide §2.4 remove shuffles outright).
        hot = materialize(
            side_counts()
            .where(F.col("count") > skew_threshold)
            .select("__bkt")
            .distinct()
            .withColumn("__hot", F.lit(True))
        )
        # Phase 2: split-left (one deterministic salt per row, hashed
        # from the interval endpoints so re-runs agree) / replicate-
        # right (all k salts) inside hot buckets; salt 0 elsewhere.
        a = a.join(F.broadcast(hot), on="__bkt", how="left").withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.hash(sa, ea), F.lit(k)),
            ).otherwise(F.lit(0)),
        ).drop("__hot")
        b = b.join(F.broadcast(hot), on="__bkt", how="left").withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(k - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        ).drop("__hot")
        join_keys = ["__bkt", "__salt"]
    # keep each overlapping pair ONLY in the bucket of max(s_a, s_b):
    # overlap ⇒ max(s) <= min(e) ⇒ that bucket is covered by both sides,
    # so exactly one joined copy survives — no distinct pass needed
    cond = (
        (sa <= eb)
        & (sb <= ea)
        & (F.col("__bkt") == F.floor(F.greatest(sa, sb) / w))
    )
    out = a.join(b, on=join_keys, how="inner").where(cond)
    if extra_pred is not None:
        out = out.where(extra_pred)
    return out.drop(*join_keys)


def concurrent_session_pairs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    bucket_width_us: int = 3_600_000_000,
    skew: str = "none",
    skew_threshold: int = 100_000,
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
    # ONE session-interval row per (user, session): four longs. The
    # self-join consumes iv on BOTH sides (and the salt mode's density
    # phase twice more per side), so materialize it once — without the
    # lazy localCheckpoint the whole sessionize subtree (scan + user
    # exchange + two window passes + aggregate) replays per consumer:
    # 2× in the plain plan, 6× in the salted one (r13 plan audit;
    # guide §2.4). Lineage-neutral: the materialized rows are exactly
    # the aggregate's output, recomputed fresh per query run.
    iv = materialize(
        s.groupBy(user_col, "session_id").agg(
            F.min(ep).alias("s_us"), F.max(ep).alias("e_us")
        )
    )
    pairs = interval_overlap_join(
        iv,
        iv,
        "s_us",
        "e_us",
        bucket_width_us,
        extra_pred=F.col(f"{user_col}_a") < F.col(f"{user_col}_b"),
        skew=skew,
        skew_threshold=skew_threshold,
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
