"""asof_join / funnel / retention_cohorts — edge semantics the sf oracle
can't isolate: exact-match ties, tolerance, payload atomicity, strict step
ordering, horizon cutoffs, cohort offsets."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):  # noqa: F811
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:10")),
            (2, 10, _ts("2024-01-01 00:00:20")),
            (3, 10, _ts("2024-01-01 00:00:05")),  # before any right row
            (4, 20, _ts("2024-01-01 00:00:30")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:10"), 1.0, "a"),  # exact tie w/ left 1
            (10, _ts("2024-01-01 00:00:15"), 2.0, None),  # NULL field
        ],
        "user_id long, rts timestamp, v double, tag string",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(asof_frames):
    left, right = asof_frames
    from featurebase_spark.operators.asof import asof_join

    out = {
        r["event_id"]: (r["v_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, "user_id", "ts", "rts", ["v", "tag"]
        ).collect()
    }
    assert out[1] == (1.0, "a")  # equal ts matches (inclusive)
    # latest right row wins even though its tag is NULL — the payload is
    # atomic: tag must NOT fall back to the older row's 'a'
    assert out[2] == (2.0, None)
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # key absent from right


def test_asof_tolerance_nulls_stale_matches(asof_frames):
    left, right = asof_frames
    from featurebase_spark.operators.asof import asof_join

    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(
            left, right, "user_id", "ts", "rts", ["v"],
            tolerance_us=4_000_000,
        ).collect()
    }
    # left 2 at :20, latest right at :15 → 5s stale > 4s tolerance
    assert out[2] is None
    assert out[1] == 1.0  # 0s stale


def test_asof_null_right_ts_never_matches(spark):  # noqa: F811
    """r8 ADVICE #1: a right row with a NULL timestamp must match
    NOTHING (pandas merge_asof / DuckDB ASOF JOIN semantics). Before the
    fix it sorted NULLS FIRST under the window order and its payload was
    carried onto every left row as the 'oldest' match."""
    from featurebase_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:10")),
         (2, 10, None)],  # NULL LEFT ts: appears, matches nothing
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, 99.0),  # NULL RIGHT ts: must never attach
         (10, _ts("2024-01-01 00:00:20"), 1.0)],  # after left 1
        "user_id long, rts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(left, right, "user_id", "ts", "rts", ["v"]).collect()
    }
    assert out == {1: None, 2: None}


def test_asof_duplicate_right_ts_tiebreak(spark):  # noqa: F811
    from featurebase_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 00:01:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01 00:00:30"), 7.0),
            (5, _ts("2024-01-01 00:00:30"), 9.0),
        ],
        "user_id long, rts timestamp, v double",
    )
    got = asof_join(left, right, "user_id", "ts", "rts", ["v"]).collect()
    assert got[0]["v_asof"] == 9.0  # greatest tiebreak wins, deterministic


def test_asof_single_exchange_plan(asof_frames):
    """The whole as-of ride shares ONE hash exchange on the key."""
    left, right = asof_frames
    from featurebase_spark.operators.asof import asof_join

    out = asof_join(left, right, "user_id", "ts", "rts", ["v"])
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning(__k") <= 1, p
    assert "Window" in p


@pytest.fixture(scope="module")
def funnel_events(spark):  # noqa: F811
    rows = [
        # u1 completes all three in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-02 00:00:00"),
        # u2: purchase BEFORE view — must not count past step 1
        (2, "purchase", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        # u3: click outside the horizon
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-09 00:00:00"),
        # u4: click only (never viewed) — counts nowhere
        (4, "click", "2024-01-01 00:00:00"),
    ]
    return spark.createDataFrame(
        [(u, e, _ts(t)) for u, e, t in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_strict_order_and_horizon(funnel_events):
    from featurebase_spark.pipeline.sessions import funnel

    got = {
        r["step"]: (r["event_type"], r["users"])
        for r in funnel(
            funnel_events,
            ["view", "click", "purchase"],
            horizon_minutes=7 * 24 * 60,
        ).collect()
    }
    assert got[1] == ("view", 3)  # u1, u2, u3
    assert got[2] == ("click", 1)  # u1 only (u3 out of horizon, u4 no view)
    assert got[3] == ("purchase", 1)  # u1 (u2's purchase predates the view)


def test_funnel_unbounded_horizon(funnel_events):
    from featurebase_spark.pipeline.sessions import funnel

    got = {
        r["step"]: r["users"]
        for r in funnel(
            funnel_events, ["view", "click"], horizon_minutes=None
        ).collect()
    }
    assert got[2] == 2  # u3's 8-day click now qualifies


def test_retention_cohort_offsets(spark):  # noqa: F811
    from featurebase_spark.pipeline.sessions import retention_cohorts

    rows = [
        # u1: first event Mon 2024-01-01 week; active weeks 0 and 2
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        # u2: same cohort week, active only week 0 (two events, one week)
        (2, "2024-01-03 10:00:00"),
        (2, "2024-01-05 10:00:00"),
        # u3: next cohort week, active weeks 0 and 1
        (3, "2024-01-08 10:00:00"),
        (3, "2024-01-14 10:00:00"),  # Sunday — still week of Jan 8
        (3, "2024-01-15 10:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, _ts(t)) for u, t in rows], "user_id long, ts timestamp"
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["active_users"]
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


# ---------------------------------------------------------------------------
# transitions (first-order Markov matrix)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def transition_events(spark):
    rows = [
        # u1: view -> click -> purchase (two transitions)
        (1, 1, "view", "2024-01-01 00:00:00"),
        (2, 1, "click", "2024-01-01 01:00:00"),
        (3, 1, "purchase", "2024-01-01 02:00:00"),
        # u2: same-timestamp tie — event_id breaks it: view(4) then click(5)
        (4, 2, "view", "2024-01-01 00:00:00"),
        (5, 2, "click", "2024-01-01 00:00:00"),
        # u3: single event — no transition
        (6, 3, "view", "2024-01-01 00:00:00"),
        # NULL user / ts / type rows are dropped
        (7, None, "view", "2024-01-01 00:00:00"),
        (8, 4, "view", None),
        (9, 4, None, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_transitions_counts_and_ties(transition_events):
    from featurebase_spark.pipeline.sessions import transitions

    got = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in transitions(transition_events).collect()
    }
    assert got == {("view", "click"): 2, ("click", "purchase"): 1}


def test_transitions_single_user_exchange_plan(transition_events):
    """One hash exchange on the user key feeds the lead window; the
    final pair groupBy is the only other exchange."""
    from featurebase_spark.pipeline.sessions import transitions

    out = transitions(transition_events)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning(user_id") == 1, p
    assert "Window" in p
