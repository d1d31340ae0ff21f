"""Guards the hardcoded view covers embedded in oracle SQL against
drift from the timeviews transcription (pql/timeviews.py) — if the walk
changes, the gate key's oracle comment and range must be revisited."""

from __future__ import annotations

from datetime import datetime

from featurebase_spark.pql.timeviews import parse_pql_time, views_by_time_range


def test_pql_quantum_groupby_cover_matches_oracle_range():
    # the pql_quantum_groupby oracle uses [Jan 8 00:00, Jan 12) — must
    # equal the YMD cover of [2024-01-08T15:30, 2024-01-12)
    vs = views_by_time_range(
        parse_pql_time("2024-01-08T15:30"),
        parse_pql_time("2024-01-12"),
        "YMD",
    )
    assert set(vs) == {"D"}
    assert vs["D"] == [
        datetime(2024, 1, 8), datetime(2024, 1, 9),
        datetime(2024, 1, 10), datetime(2024, 1, 11),
    ]


def test_partial_time_forms_parse_like_the_reference():
    # parsePartialTime forms (time.go:301-410)
    assert parse_pql_time("2019") == datetime(2019, 1, 1)
    assert parse_pql_time("2019-08") == datetime(2019, 8, 1)
    assert parse_pql_time("2019-08-04") == datetime(2019, 8, 4)
    assert parse_pql_time("2019-08-04T14") == datetime(2019, 8, 4, 14)
    assert parse_pql_time("2019-08-04T14:36") == datetime(2019, 8, 4, 14, 36)


def test_add_month_day_29_plus_does_not_double_step():
    # the addMonth quirk: Jan 31 start must yield Feb, not March
    vs = views_by_time_range(
        parse_pql_time("2024-01-31"), parse_pql_time("2024-04"), "YM"
    )
    assert vs["M"] == [
        datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)
    ]
