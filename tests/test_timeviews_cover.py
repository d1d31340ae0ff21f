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


# ---- TestViewsByTimeRange (time_internal_test.go:107-188) — the FULL
# case table, r13 walk. The reference returns view names; our cover is
# a unit→[start] dict — compare as the same name set.

_FMT = {"Y": "%Y", "M": "%Y%m", "D": "%Y%m%d", "H": "%Y%m%d%H"}


def _names(vs) -> set:
    return {
        "F_" + t.strftime(_FMT[unit])
        for unit, starts in vs.items()
        for t in starts
    }


def _cover(frm, to, q) -> set:
    return _names(
        views_by_time_range(parse_pql_time(frm), parse_pql_time(to), q)
    )


def test_views_by_time_range_full_reference_table():
    import itertools

    cases = {
        "Y": ("2000-01-01T00:00", "2002-01-01T00:00", "Y",
              {"F_2000", "F_2001"}),
        "YM": ("2000-11-01T00:00", "2003-03-01T00:00", "YM",
               {"F_200011", "F_200012", "F_2001", "F_2002", "F_200301",
                "F_200302"}),
        "YM31up": ("2001-10-31T00:00", "2003-04-01T00:00", "YM",
                   {"F_200110", "F_200111", "F_200112", "F_2002",
                    "F_200301", "F_200302", "F_200303"}),
        "YM31mid": ("1999-12-31T00:00", "2000-04-01T00:00", "YM",
                    {"F_199912", "F_200001", "F_200002", "F_200003"}),
        # the addMonth day-31 quirk OVER-covers: the whole-year F_2000
        # view enters even though the range starts Jan 31
        "YM31down": ("2000-01-31T00:00", "2001-04-01T00:00", "YM",
                     {"F_2000", "F_200101", "F_200102", "F_200103"}),
        "YMD": ("2000-11-28T00:00", "2003-03-02T00:00", "YMD",
                {"F_20001128", "F_20001129", "F_20001130", "F_200012",
                 "F_2001", "F_2002", "F_200301", "F_200302",
                 "F_20030301"}),
        "YMDH": ("2000-11-28T22:00", "2002-03-01T03:00", "YMDH",
                 {"F_2000112822", "F_2000112823", "F_20001129",
                  "F_20001130", "F_200012", "F_2001", "F_200201",
                  "F_200202", "F_2002030100", "F_2002030101",
                  "F_2002030102"}),
        "M": ("2000-01-01T00:00", "2000-03-01T00:00", "M",
              {"F_200001", "F_200002"}),
        "MD": ("2000-11-29T00:00", "2002-02-03T00:00", "MD",
               {"F_20001129", "F_20001130", "F_200012"}
               | {f"F_2001{m:02d}" for m in range(1, 13)}
               | {"F_200201", "F_20020201", "F_20020202"}),
        "MDH": ("2000-11-29T22:00", "2002-03-02T03:00", "MDH",
                {"F_2000112922", "F_2000112923", "F_20001130",
                 "F_200012"}
                | {f"F_2001{m:02d}" for m in range(1, 13)}
                | {"F_200201", "F_200202", "F_20020301",
                   "F_2002030200", "F_2002030201", "F_2002030202"}),
        "D": ("2000-01-01T00:00", "2000-01-04T00:00", "D",
              {"F_20000101", "F_20000102", "F_20000103"}),
        "DH": ("2000-01-01T22:00", "2000-03-01T02:00", "DH",
               {"F_2000010122", "F_2000010123"}
               | {f"F_200001{d:02d}" for d in range(2, 32)}
               | {f"F_200002{d:02d}" for d in range(1, 30)}
               | {"F_2000030100", "F_2000030101"}),
        "H": ("2000-01-01T00:00", "2000-01-01T02:00", "H",
              {"F_2000010100", "F_2000010101"}),
    }
    for name, (frm, to, q, exp) in cases.items():
        assert _cover(frm, to, q) == exp, name
