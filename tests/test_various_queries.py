"""Mirrors of the reference's TestVariousQueries corpus
(executor_test.go:7430-9081) — the users-index fixture and its pinned
results, driven through the PQL TEXT door so the parser faces the exact
query spellings of the corpus (lowercase call names, bare-word in=[]
lists, quoted sort directives, nested filters).

Fixture = populateTestData (executor_test.go:8561-8663): keyed records
userA..userG with set fields (likes, dinner, likenums), a YM time-quantum
field (places_visited — modeled as array<struct<value,ts>>, the SETQ
shape; per-bit timestamps compile through the view-cover transcription
in pql/timeviews.py), and BSI ints (affinity, net_worth, zip_code).

Result ORDER: the reference returns keyed rows in row-key CREATION
order (the order keys were first imported), which has no analogue in a
relational model — we order by value. Corpus cases whose expected
output depends on creation order (bare limit= over ties) assert the
membership rule and document the divergence; cases with deterministic
order (aggregate-sorted, count-sorted with distinct counts) assert
exactly. The time-field sub-corpus (variousQueriesOnTimeFields,
executor_test.go:7774-7890) sorts its own output, so those assert
exactly.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from featurebase_spark.pql import Index
from featurebase_spark.pql.parser import execute


TS19J = datetime(2019, 1, 1)
TS19A = datetime(2019, 8, 1)
TS20J = datetime(2020, 1, 1)

PV_SCHEMA = (
    "_id string, likenums array<bigint>, likes array<string>, "
    "dinner array<string>, "
    "places_visited array<struct<value:string,ts:timestamp>>, "
    "affinity bigint, net_worth bigint, zip_code bigint"
)


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        ("userA", [1, 7], ["molecula", "icecream"], ["pizza", "chinese"],
         [("toronto", TS19J), ("mombasa", TS20J)], 10, 1, 78739),
        ("userB", [2, 7], ["pilosa", "icecream"],
         ["leftovers", "pizza", "chinese"],
         [("nairobi", TS19J), ("toronto", TS19A), ("toronto", TS20J)],
         -10, 10, 78739),
        ("userC", [3, 7], ["pangolin", "icecream"], None,
         [("paris", TS19J), ("toronto", TS19A)], 5, 100, 19707),
        ("userD", [4, 7], ["zebra", "icecream"], None,
         [("toronto", TS20J), ("sydney", TS20J)], -5, 1000, 19707),
        ("userE", [5], ["toucan", "icecream"], None,
         [("toronto", TS20J), ("nairobi", TS20J)], 0, 10000, 86753),
        ("userF", [6, 7], ["dog", "icecream"], ["chinese"],
         [("austin", TS19J), ("toronto", TS20J)], None, 100000, None),
        ("userG", None, None, None, None, None, None, 78739),
    ]
    df = spark.createDataFrame(rows, PV_SCHEMA)
    return Index(df, quantums={"places_visited": "YM"})


def rows_set(df, *cols):
    if not cols:
        cols = df.columns
    return {tuple(r[c] for c in cols) for r in df.collect()}


def col_set(df):
    return {r[0] for r in df.collect()}


# ---- GroupBy over the YM time-quantum field (executor_test.go:8665) ------


@pytest.mark.parametrize("frm,to,expect", [
    ("2019-01-01T00:00", "2020-12-31T23:59",
     {("nairobi", 2), ("paris", 1), ("austin", 1), ("toronto", 6),
      ("mombasa", 1), ("sydney", 1)}),
    ("2019-01-01T00:00", "2019-02-01T00:00",
     {("nairobi", 1), ("paris", 1), ("austin", 1), ("toronto", 1)}),
    ("2019-01-01T00:00", "2019-12-31T23:59",
     {("nairobi", 1), ("paris", 1), ("austin", 1), ("toronto", 3)}),
])
def test_groupby_places_time_ranges(users, frm, to, expect):
    got = execute(
        users,
        f"GroupBy(Rows(places_visited, from='{frm}', to='{to}'))",
    )
    assert rows_set(got, "places_visited", "count") == expect


def test_groupby_places_filter_not_intersect(users):
    # excludes userC (pangolin AND icecream): paris drops, toronto 3->2
    got = execute(
        users,
        "GroupBy("
        " Rows(places_visited, from='2019-01-01T00:00',"
        "      to='2019-12-31T23:59'),"
        " filter=Not(Intersect(Row(likes='pangolin'),"
        "            Row(likes='icecream'))))",
    )
    assert rows_set(got, "places_visited", "count") == {
        ("nairobi", 1), ("austin", 1), ("toronto", 2)
    }


def test_groupby_places_filter_and_sum_aggregate(users):
    got = execute(
        users,
        "GroupBy("
        " Rows(places_visited, from='2019-01-01T00:00',"
        "      to='2019-12-31T23:59'),"
        " filter=Not(Intersect(Row(likes='pangolin'),"
        "            Row(likes='icecream'))),"
        " aggregate=Sum(field=net_worth))",
    )
    assert rows_set(got, "places_visited", "count", "sum") == {
        ("nairobi", 1, 10), ("austin", 1, 100000), ("toronto", 2, 11)
    }


@pytest.mark.parametrize("frm,to,expect", [
    ("2019-01-01T00:00", "2020-12-31T23:59",
     {"nairobi", "paris", "austin", "toronto", "mombasa", "sydney"}),
    ("2019-01-01T00:00", "2019-12-31T23:59",
     {"nairobi", "paris", "austin", "toronto"}),
    ("2019-01-01T00:00", "2019-02-01T00:00",
     {"nairobi", "paris", "austin", "toronto"}),
])
def test_rows_places_time_ranges(users, frm, to, expect):
    got = execute(
        users, f"Rows(places_visited, from='{frm}', to='{to}')"
    )
    assert col_set(got) == expect


# ---- Count / Distinct family (executor_test.go:8736-8878) ----------------


def test_count_all_includes_fieldless_records(users):
    # userG exists only via zip_code — TrackExistence counts it
    assert execute(users, "Count(All())").first()[0] == 7


def test_count_distinct_likenums(users):
    assert execute(users, "count(Distinct(field=likenums))").first()[0] == 7


def test_distinct_likenums_values(users):
    got = execute(users, "Distinct(field=likenums)")
    assert sorted(col_set(got)) == [1, 2, 3, 4, 5, 6, 7]


def test_count_distinct_likes(users):
    assert execute(users, "Count(Distinct(field=likes))").first()[0] == 7


def test_distinct_affinity_signed_values(users):
    got = execute(users, "Distinct(field=affinity)")
    assert sorted(col_set(got)) == [-10, -5, 0, 5, 10]
    assert execute(users, "Count(Distinct(field=affinity))").first()[0] == 5


def test_distinct_affinity_filtered(users):
    got = execute(users, "Distinct(Row(affinity>=0),field=affinity)")
    assert sorted(col_set(got)) == [0, 5, 10]
    n = execute(
        users, "Count(Distinct(Row(affinity>=0),field=affinity))"
    ).first()[0]
    assert n == 3


@pytest.mark.parametrize("q,expect", [
    ("Distinct(Row(affinity<0),field=likes)",
     {"pilosa", "zebra", "icecream"}),
    ("Distinct(Row(affinity>0),field=likes)",
     {"molecula", "pangolin", "icecream"}),
    ("Distinct(Row(likenums=1),field=likes)", {"molecula", "icecream"}),
    ("Distinct(field=likes)",
     {"molecula", "pilosa", "pangolin", "zebra", "toucan", "dog",
      "icecream"}),
    ("Distinct(All(),field=likes)",
     {"molecula", "pilosa", "pangolin", "zebra", "toucan", "dog",
      "icecream"}),
    ("Distinct(field=likes )",  # trailing-space spelling from the corpus
     {"molecula", "pilosa", "pangolin", "zebra", "toucan", "dog",
      "icecream"}),
])
def test_distinct_row_filters(users, q, expect):
    assert col_set(execute(users, q)) == expect


# ---- GroupBy over set fields (executor_test.go:8879-9006) ----------------


def test_groupby_likes_counts(users):
    got = execute(users, "GroupBy(Rows(field=likes))")
    assert rows_set(got, "likes", "count") == {
        ("molecula", 1), ("pilosa", 1), ("pangolin", 1), ("zebra", 1),
        ("toucan", 1), ("dog", 1), ("icecream", 6),
    }


def test_groupby_having_count(users):
    got = execute(users, "GroupBy(Rows(field=likes), having=Condition(count>5))")
    assert rows_set(got, "likes", "count") == {("icecream", 6)}


def test_groupby_having_sum_with_limit_membership(users):
    """having=Condition(sum>10) keeps {pangolin, zebra, toucan, dog,
    icecream}; the corpus' limit=2 then takes the first two in ROW-KEY
    CREATION order (pangolin, zebra) — creation order has no relational
    analogue, so we assert the having rule exactly and that limit=2
    returns 2 of the passing set (documented ordering divergence; our
    order is by group value)."""
    full = execute(
        users,
        "GroupBy(Rows(field=likes), aggregate=Sum(field=net_worth),"
        " having=Condition(sum>10))",
    )
    passing = rows_set(full, "likes", "count", "sum")
    assert passing == {
        ("pangolin", 1, 100), ("zebra", 1, 1000), ("toucan", 1, 10000),
        ("dog", 1, 100000), ("icecream", 6, 111111),
    }
    limited = execute(
        users,
        "GroupBy(Rows(field=likes), aggregate=Sum(field=net_worth),"
        " limit=2, having=Condition(sum>10))",
    )
    lim = rows_set(limited, "likes", "count", "sum")
    assert len(lim) == 2 and lim <= passing


def test_groupby_filter_row_bsi(users):
    got = execute(
        users, "GroupBy(Rows(field=likes), filter=Row(affinity>-7))"
    )
    assert rows_set(got, "likes", "count") == {
        ("molecula", 1), ("pangolin", 1), ("zebra", 1), ("toucan", 1),
        ("icecream", 4),
    }


def test_groupby_count_distinct_keeps_zero_and_counts_null_zip(users):
    # dog (userF) has no zip_code → aggregate 0, group kept
    got = execute(
        users,
        "GroupBy(Rows(field=likes),"
        " aggregate=Count(Distinct(field=zip_code)))",
    )
    assert rows_set(got, "likes", "count", "aggregate") == {
        ("molecula", 1, 1), ("pilosa", 1, 1), ("pangolin", 1, 1),
        ("zebra", 1, 1), ("toucan", 1, 1), ("dog", 1, 0),
        ("icecream", 6, 3),
    }


def test_groupby_count_distinct_having_sum_reads_aggregate(users):
    # Condition(sum>2) filters the AGGREGATE column of a
    # Count(Distinct(…)) (applyConditionToGroupCounts)
    got = execute(
        users,
        "GroupBy(Rows(field=likes),"
        " aggregate=Count(Distinct(field=zip_code)),"
        " having=Condition(sum>2))",
    )
    assert rows_set(got, "likes", "count", "aggregate") == {
        ("icecream", 6, 3)
    }


def test_groupby_count_distinct_with_outer_filter(users):
    got = execute(
        users,
        "GroupBy(Rows(field=likes), filter=Row(affinity>-11),"
        " aggregate=Count(Distinct(field=zip_code)))",
    )
    assert rows_set(got, "likes", "count", "aggregate") == {
        ("molecula", 1, 1), ("pilosa", 1, 1), ("pangolin", 1, 1),
        ("zebra", 1, 1), ("toucan", 1, 1), ("icecream", 5, 3),
    }


def test_groupby_count_distinct_with_inner_filter(users):
    # the inner Row restricts the DISTINCT side only: pilosa (userB,
    # affinity -10) keeps its group but distinct-counts 0
    got = execute(
        users,
        "GroupBy(Rows(field=likes), filter=Row(affinity>-11),"
        " aggregate=Count(Distinct(Row(affinity>-7), field=zip_code)))",
    )
    assert rows_set(got, "likes", "count", "aggregate") == {
        ("molecula", 1, 1), ("pilosa", 1, 0), ("pangolin", 1, 1),
        ("zebra", 1, 1), ("toucan", 1, 1), ("icecream", 5, 3),
    }


def test_groupby_sort_count_desc_top_group(users):
    got = execute(
        users, 'GroupBy(Rows(field=likes), sort="count desc")'
    ).collect()
    assert (got[0]["likes"], got[0]["count"]) == ("icecream", 6)
    assert {(r["likes"], r["count"]) for r in got[1:]} == {
        (v, 1) for v in
        ("molecula", "pilosa", "pangolin", "zebra", "toucan", "dog")
    }


def test_groupby_sort_aggregate_desc_count_asc_exact(users):
    # sums are all distinct → the full order is deterministic
    got = execute(
        users,
        'GroupBy(Rows(field=likes), aggregate=Sum(field=net_worth),'
        ' sort="aggregate desc, count asc")',
    ).collect()
    assert [(r["likes"], r["count"], r["sum"]) for r in got] == [
        ("icecream", 6, 111111), ("dog", 1, 100000),
        ("toucan", 1, 10000), ("zebra", 1, 1000), ("pangolin", 1, 100),
        ("pilosa", 1, 10), ("molecula", 1, 1),
    ]


def test_groupby_sort_limit_and_offset_exact(users):
    got = execute(
        users,
        'GroupBy(Rows(field=likes), aggregate=Sum(field=net_worth),'
        ' sort="aggregate desc, count asc", limit=3)',
    ).collect()
    assert [(r["likes"], r["sum"]) for r in got] == [
        ("icecream", 111111), ("dog", 100000), ("toucan", 10000)
    ]
    got = execute(
        users,
        'GroupBy(Rows(field=likes), aggregate=Sum(field=net_worth),'
        'sort="aggregate desc, count asc",limit=3,offset=2)',
    ).collect()
    assert [(r["likes"], r["sum"]) for r in got] == [
        ("toucan", 10000), ("zebra", 1000), ("pangolin", 100)
    ]


def test_groupby_bsi_field_with_count_distinct(users):
    got = execute(
        users,
        "GroupBy(Rows(field=affinity),"
        " aggregate=Count(Distinct(field=zip_code)))",
    )
    assert rows_set(got, "affinity", "count", "aggregate") == {
        (-10, 1, 1), (-5, 1, 1), (0, 1, 1), (5, 1, 1), (10, 1, 1)
    }


def test_groupby_dinner_sort_count_desc_limit(users):
    got = execute(
        users, 'GroupBy(Rows(field=dinner), sort="count desc", limit=2)'
    ).collect()
    assert [(r["dinner"], r["count"]) for r in got] == [
        ("chinese", 3), ("pizza", 2)
    ]


def test_topk_dinner_no_k_ranks_all(users):
    # TopK(dinner) — k omitted ranks ALL values (executor.go:2381-2390)
    for q in ("TopK(dinner)", "TopK(field=dinner)"):
        got = execute(users, q).collect()
        assert [(r["dinner"], r["count"]) for r in got] == [
            ("chinese", 3), ("pizza", 2), ("leftovers", 1)
        ], q


# ---- in=[…] forms (executor_test.go:9008-9046) ---------------------------


def test_groupby_rows_in_quantum_field(users):
    for q in (
        "GroupBy(Rows(places_visited, in=[nairobi, toronto]))",
        "GroupBy(Rows(places_visited, in=[nairobi, toronto, neverland]))",
    ):
        got = execute(users, q)
        assert rows_set(got, "places_visited", "count") == {
            ("nairobi", 2), ("toronto", 6)
        }, q


def test_rows_in_quantum_field(users):
    for q in (
        "Rows(places_visited, in=[nairobi, toronto])",
        "Rows(places_visited, in=[nairobi, toronto, neverland])",
    ):
        assert col_set(execute(users, q)) == {"nairobi", "toronto"}, q


def test_rows_and_groupby_in_likenums(users):
    assert col_set(execute(users, "Rows(likenums, in=[4, 5])")) == {4, 5}
    got = execute(users, "GroupBy(Rows(likenums, in=[4, 5]))")
    assert rows_set(got, "likenums", "count") == {(4, 1), (5, 1)}


# ---- time-field edge cases: YMDH (variousQueriesOnTimeFields) ------------


@pytest.fixture(scope="module")
def t_index(spark):
    f1 = [
        ("C1", "R1", datetime(2019, 1, 1)),
        ("C2", "R2", datetime(2019, 8, 1)),
        ("C3", "R3", datetime(2019, 8, 4)),
        ("C4", "R4", datetime(2019, 8, 4, 14)),
        ("C5", "R5", datetime(2019, 8, 4, 14, 36)),
        ("C6", "R6", datetime(2019, 8, 4, 16)),
        ("C7", "R7", datetime(2019, 8, 5)),
        ("C8", "R8", datetime(2019, 12, 1)),
        ("C9", "R9", datetime(2020, 1, 1)),
    ]
    rows = [
        (c, [(r, ts)], [("R", ts)]) for c, r, ts in f1
    ]
    df = spark.createDataFrame(
        rows,
        "_id string, f1 array<struct<value:string,ts:timestamp>>, "
        "f2 array<struct<value:string,ts:timestamp>>",
    )
    return Index(df, quantums={"f1": "YMDH", "f2": "YMDH"})


@pytest.mark.parametrize("frm,to,expect", [
    # from edge cases: 14:36 truncates INTO the hour-14 view — C4
    # (stored at 14:00) matches a from of 14:36
    ("2019-08-04T14:36", "2019-08-04T16:00", {"R4", "R5"}),
    ("2019-08-04T14", "2019-08-04T17:00", {"R4", "R5", "R6"}),
    ("2019-08-04", "2019-08-05", {"R3", "R4", "R5", "R6"}),
    ("2019-08", "2019-12", {"R2", "R3", "R4", "R5", "R6", "R7"}),
    ("2019", "2020",
     {"R1", "R2", "R3", "R4", "R5", "R6", "R7", "R8"}),
])
def test_rows_ymdh_view_edges(t_index, frm, to, expect):
    got = execute(t_index, f"Rows(f1, from='{frm}', to='{to}')")
    assert col_set(got) == expect


@pytest.mark.parametrize("frm,to,expect", [
    ("2019-08-04T14:36", "2019-08-04T16:00", {"C4", "C5"}),
    ("2019-08-04T14", "2019-08-04T17:00", {"C4", "C5", "C6"}),
    ("2019-08-04", "2019-08-05", {"C3", "C4", "C5", "C6"}),
    ("2019-08", "2019-12", {"C2", "C3", "C4", "C5", "C6", "C7"}),
    ("2019", "2020",
     {"C1", "C2", "C3", "C4", "C5", "C6", "C7", "C8"}),
])
def test_row_ymdh_view_edges(t_index, frm, to, expect):
    got = execute(t_index, f"Row(f2='R', from='{frm}', to='{to}')")
    assert col_set(got) == expect


# ---- Count(Distinct) on a timestamp BSI field (executor_test.go:7141) ----


def test_count_distinct_timestamp(spark):
    data = [
        "2010-01-02T12:32:00", "2010-04-20T12:32:00",
        "2011-04-20T12:59:00", "2011-04-20T12:40:00",
        "2011-04-20T12:32:00",
    ]
    rows = [(i, datetime.fromisoformat(d)) for i, d in enumerate(data)]
    rows.append((8, None))  # the empty-shard record (Set(8*SW, set=0))
    idx = Index(spark.createDataFrame(rows, "_id long, ts timestamp"))
    assert execute(idx, "Count(Distinct(field=ts))").first()[0] == 5
    n = execute(
        idx,
        'Count(Distinct(Row(ts > "2011-01-01T00:00:00Z"), field=ts))',
    ).first()[0]
    assert n == 3


# ---- timestamp extremes (variousQueriesOnTimestampFields) ----------------


@pytest.fixture(scope="module")
def ts_extremes(spark):
    # the reference's min/max representable timestamps per granularity
    # (pilosa.MinTimestamp/MaxTimestamp; ns has the narrower int64
    # range). Built JVM-side: year-1 instants cannot round-trip through
    # Python datetimes (the proleptic→hybrid rebase lands in year 0),
    # so assertions CAST to string before collecting.
    df = spark.sql(
        "SELECT * FROM VALUES "
        "('userA', TIMESTAMP '0001-01-01 00:00:01', "
        " TIMESTAMP '1833-11-24 17:31:44'), "
        "('userB', TIMESTAMP '9999-12-31 23:59:59', "
        " TIMESTAMP '2106-02-07 06:28:16') "
        "AS t(_id, unix_sec, unix_nano)"
    )
    return Index(df)


def _str1(df, col):
    from pyspark.sql import functions as F

    return df.select(F.col(col).cast("string")).first()[0]


def test_min_max_on_extreme_timestamps(ts_extremes):
    assert _str1(
        execute(ts_extremes, "Min(unix_sec)"), "min"
    ) == "0001-01-01 00:00:01"
    assert _str1(
        execute(ts_extremes, "Max(unix_sec)"), "max"
    ) == "9999-12-31 23:59:59"
    assert _str1(
        execute(ts_extremes, "Min(unix_nano)"), "min"
    ) == "1833-11-24 17:31:44"
    assert _str1(
        execute(ts_extremes, "Max(unix_nano)"), "max"
    ) == "2106-02-07 06:28:16"


def test_row_equality_on_extreme_timestamps(ts_extremes):
    got = execute(ts_extremes, 'Row(unix_sec="0001-01-01T00:00:01Z")')
    assert col_set(got) == {"userA"}
    got = execute(ts_extremes, 'Row(unix_sec="9999-12-31T23:59:59Z")')
    assert col_set(got) == {"userB"}
    got = execute(
        ts_extremes,
        'Union(Row(unix_nano="2106-02-07T06:28:16Z"),'
        ' Row(unix_sec="0001-01-01T00:00:01Z"))',
    )
    assert col_set(got) == {"userA", "userB"}


def test_extract_and_count_all_extremes(ts_extremes):
    from pyspark.sql import functions as F

    assert execute(ts_extremes, "count(All())").first()[0] == 2
    got = execute(ts_extremes, "extract(All(), Rows(unix_sec))").select(
        "_id", F.col("unix_sec").cast("string")
    )
    assert rows_set(got) == {
        ("userA", "0001-01-01 00:00:01"),
        ("userB", "9999-12-31 23:59:59"),
    }


# ---- TestExecutorTimeRange (executor_test.go:9823-9940) ------------------


@pytest.fixture(scope="module")
def trange(spark):
    # Set(2, f=1, 1999-12-31T00:00) … Set(7, f=1, 2010-01-01T00:00):
    # an INT-valued YMDH quantum field
    rows = [
        (2, [(1, datetime(1999, 12, 31))]),
        (3, [(2, datetime(2000, 1, 1))]),
        (4, [(3, datetime(2000, 1, 2))]),
        (5, [(1, datetime(2001, 1, 1))]),
        (6, [(1, datetime(2006, 1, 1))]),
        (7, [(1, datetime(2010, 1, 1))]),
    ]
    df = spark.createDataFrame(
        rows, "_id long, f array<struct<value:bigint,ts:timestamp>>"
    )
    return Index(df, quantums={"f": "YMDH"})


def test_time_range_on_non_time_field_errors(spark):
    idx = Index(spark.createDataFrame([(1, 1), (2, 1)], "_id long, f long"))
    for q in (
        "Row(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)",
        "Row(f=1, from=1999-12-31T00:00)",
        "Row(f=1, to=2002-01-01T02:00)",
    ):
        with pytest.raises(
            ValueError,
            match=r"not a time-field, 'from' and 'to' are not valid "
            r"options for this field type",
        ):
            execute(idx, q).collect()


@pytest.mark.parametrize("q,expect", [
    ("Row(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)", {2, 5}),
    # from-only: union of views from `from` onward (open-ended ranges
    # compile to a trunc >= predicate, not a walk to the horizon)
    ("Row(f=1, from=1999-12-31T00:00)", {2, 5, 6, 7}),
    ("Row(f=1, to=2002-01-01T02:00)", {2, 5}),
    # no range: union of ALL views (same answer whether the standard
    # view exists or not — both subtests pin it)
    ("Row(f=1)", {2, 5, 6, 7}),
])
def test_time_range_view_unions(trange, q, expect):
    assert col_set(execute(trange, q)) == expect


# ---- single-shard GroupBy(BSI, count-distinct) (executor_test.go:9081) ----


def test_single_shard_groupby_bsi_count_distinct(spark):
    lost = [0, 1, 0, 2, 2, 0, 3, 3, 3, 0]
    jitter = [17, 3, 42, 9, 17, 3, 42, 9, 17, 3]
    idx = Index(spark.createDataFrame(
        [(i + 1, lc, jm) for i, (lc, jm) in enumerate(zip(lost, jitter))],
        "_id long, lostcount long, jittermax long",
    ))
    got = execute(
        idx,
        "GroupBy(Rows(lostcount),"
        " aggregate=Count(Distinct(field=jittermax)))",
    )
    assert rows_set(got, "lostcount", "count", "aggregate") == {
        (0, 4, 3), (1, 1, 1), (2, 2, 2), (3, 3, 3)
    }


# ---- Min/Max over a timestamp BSI field (executor_test.go:9607) -----------


def test_min_max_timestamp_single_value(spark):
    idx = Index(spark.createDataFrame(
        [(10, datetime(2010, 1, 2, 12, 32))], "_id long, ts timestamp"
    ))
    assert execute(idx, "Min(ts)").first()["min"] == datetime(
        2010, 1, 2, 12, 32
    )
    assert execute(idx, "Max(ts)").first()["max"] == datetime(
        2010, 1, 2, 12, 32
    )


# ---- Extract over a quantum field with time (executor_test.go:9708) -------


@pytest.fixture(scope="module")
def segment_idx(spark):
    rows = [
        ("C1", [("R1", datetime(2022, 7, 1))]),
        ("C2", [("R1", datetime(2022, 7, 3))]),
    ]
    df = spark.createDataFrame(
        rows, "_id string, segment array<struct<value:string,ts:timestamp>>"
    )
    return Index(df, quantums={"segment": "D"})


def extract_map(df, field):
    return {r["_id"]: sorted(r[field]) for r in df.collect()}


def test_extract_with_from_time(segment_idx):
    got = execute(
        segment_idx, "Extract(All(), Rows(segment,from=2022-07-03T00:00))"
    )
    # C1's only bit (Jul 1) is outside the range → EMPTY list, record kept
    assert extract_map(got, "segment") == {"C1": [], "C2": ["R1"]}


def test_extract_with_to_time(segment_idx):
    got = execute(
        segment_idx, "Extract(All(), Rows(segment,to=2022-07-02T00:00))"
    )
    assert extract_map(got, "segment") == {"C1": ["R1"], "C2": []}


def test_extract_quantum_no_time_opt(segment_idx):
    got = execute(segment_idx, "Extract(All(), Rows(segment))")
    assert extract_map(got, "segment") == {"C1": ["R1"], "C2": ["R1"]}


# ---- TopK set/mutex/time (executor_test.go:1758-1844) ---------------------

SW = 1 << 20  # shard straddle only; the value is irrelevant here


def test_topk_set_field(spark):
    # baseBits + (0,1): f=0 on {0, SW+2, 1}, f=10 on {2, SW, 2SW, SW+1},
    # f=20 on {SW}
    bits = {0: [0], 1: [0], 2: [10], SW: [10, 20], SW + 1: [10],
            SW + 2: [0], 2 * SW: [10]}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in bits.items()], "_id long, f array<bigint>"
    ))
    got = execute(idx, "TopK(f, k=2)").collect()
    assert [(r["f"], r["count"]) for r in got] == [(10, 4), (0, 3)]


def test_topk_mutex_field(spark):
    # mutex = single-valued: record SW's later f=20 displaces its f=10
    vals = {0: 0, SW + 2: 0, 2: 10, 2 * SW: 10, SW + 1: 10, SW: 20}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in vals.items()], "_id long, fmutex long"
    ))
    got = execute(idx, "TopK(fmutex, k=2)").collect()
    assert [(r["fmutex"], r["count"]) for r in got] == [(10, 3), (0, 2)]


def test_topk_time_range_counts_records_not_bits(spark):
    # record 0 holds f=0 in TWO covered day views (Jan 2 + Jan 3) but
    # contributes ONE to the count — union of the value's view bitmaps
    rows = [
        (0, [(0, datetime(2016, 1, 2)), (1, datetime(2016, 1, 2)),
             (0, datetime(2016, 1, 3))]),
        (1, [(0, datetime(2016, 1, 10))]),
        (100000000, [(2, datetime(2016, 2, 2))]),
        (200000000, [(3, datetime(2015, 1, 2))]),
    ]
    idx = Index(
        spark.createDataFrame(
            rows, "_id long, f array<struct<value:bigint,ts:timestamp>>"
        ),
        quantums={"f": "YMD"},
    )
    got = execute(
        idx, "TopK(f, k=3, from=2016-01-01T00:00, to=2016-01-11T00:00)"
    ).collect()
    assert [(r["f"], r["count"]) for r in got] == [(0, 2), (1, 1)]


# ---- Min/Max ValCount shape (TestExecutor_Execute_MinMaxCountEqual) -------


@pytest.fixture(scope="module")
def minmax_idx(spark):
    f = {0: 3, 1: 3, 2: 4, 3: 5, 4: 5, SW + 1: 3, SW + 2: 5, SW + 3: 5,
         SW + 4: 5, SW + 5: 4, 2 * SW + 1: 3}
    x = {0: 3, 1: 3}
    dec = {0: "5.122", 1: "12.985", 2: "4.234", 3: "12.985"}
    ids = sorted(set(f) | set(x) | set(dec))
    import decimal as _d

    rows = [
        (i, f.get(i), x.get(i),
         _d.Decimal(dec[i]) if i in dec else None)
        for i in ids
    ]
    return Index(spark.createDataFrame(
        rows, "_id long, f long, x long, dec decimal(20,3)"
    ))


def test_min_max_carry_the_equal_count(minmax_idx):
    # ValCount: the extreme AND how many records hold it
    r = execute(minmax_idx, "Min(field=f)").first()
    assert (r["min"], r["count"]) == (3, 4)
    r = execute(minmax_idx, "Min(Row(x=3), field=f)").first()
    assert (r["min"], r["count"]) == (3, 2)
    r = execute(minmax_idx, "Max(field=f)").first()
    assert (r["max"], r["count"]) == (5, 5)


def test_min_max_decimal_valcount(minmax_idx):
    import decimal as _d

    r = execute(minmax_idx, "Min(field=dec)").first()
    assert (r["min"], r["count"]) == (_d.Decimal("4.234"), 1)
    r = execute(minmax_idx, "Min(Row(x=3), field=dec)").first()
    assert (r["min"], r["count"]) == (_d.Decimal("5.122"), 1)
    r = execute(minmax_idx, "Max(field=dec)").first()
    assert (r["max"], r["count"]) == (_d.Decimal("12.985"), 2)
    r = execute(minmax_idx, "Max(Row(x=3), field=dec)").first()
    assert (r["max"], r["count"]) == (_d.Decimal("12.985"), 1)


def test_min_on_empty_filter_is_null_zero(minmax_idx):
    r = execute(minmax_idx, "Min(Row(x=99), field=f)").first()
    assert (r["min"], r["count"]) == (None, 0)


# ---- TopN fill / src (executor_test.go:2087-2192) -------------------------


def test_topn_fill_counts_across_shards(spark):
    bits = {0: [0], 1: [0], 2: [0], SW: [0, 1], SW + 2: [1]}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in bits.items()], "_id long, f array<bigint>"
    ))
    got = execute(idx, "TopN(f, n=1)").collect()
    assert [(r["f"], r["count"]) for r in got] == [(0, 4)]


def test_topn_fill_small(spark):
    bits = {0: [0, 1], 1: [1], SW: [0, 2], SW + 1: [2],
            2 * SW: [0, 3], 2 * SW + 1: [3], 3 * SW: [0, 4],
            3 * SW + 1: [4], 4 * SW: [0]}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in bits.items()], "_id long, f array<bigint>"
    ))
    got = execute(idx, "TopN(f, n=1)").collect()
    assert [(r["f"], r["count"]) for r in got] == [(0, 5)]


def test_topn_positional_src_row_filter(spark):
    # TopN(f, Row(other=100), n=3): the positional Row is the source
    # filter — counts are |Row(f=v) ∩ src|
    rows = {
        0: ([0], None), 1: ([0], None), SW: ([0, 10, 20], 100),
        SW + 1: ([10, 20], 100), SW + 2: ([20], 100),
    }
    idx = Index(spark.createDataFrame(
        [(k, f, o) for k, (f, o) in rows.items()],
        "_id long, f array<bigint>, other long",
    ))
    got = execute(idx, "TopN(f, Row(other=100), n=3)").collect()
    assert [(r["f"], r["count"]) for r in got] == [
        (20, 3), (10, 2), (0, 1)
    ]


# ---- BSI range edges (TestExecutor_Execute_Row_BSIGroupEdge) --------------


def test_invalid_int64_edge_ranges_are_empty(spark):
    idx = Index(spark.createDataFrame([(300, 10)], "_id long, f3 long"))
    for q in (
        "Row(9223372036854775807 < f3 < -9223372036854775808)",
        "Row(9223372036854775807 < f3 < 1000)",
        "Row(-1000 < f3 < -9223372036854775808)",
    ):
        assert execute(idx, q).count() == 0, q
    # sane ranges still work around the same value
    assert execute(idx, "Row(5 < f3 < 15)").count() == 1


# ---- missing-key write/read sequence (TestMissingKeyRegression) -----------


def test_missing_key_write_read_sequence(spark):
    """Mirrors the keyed-field sequence at table level: reads of
    never-written values are empty (not errors), a write in a multi-call
    request is visible to later calls of the SAME request, Difference/
    Not against a missing value behave as complement over existence, and
    Store(Not(Row(f=v)), f=v) inverts a row in place. (The reference's
    per-call true/false wire booleans are presentation; our write calls
    return the transformed table — the observable table states below pin
    the same semantics, including Clear of an unset bit changing
    nothing.)"""
    from featurebase_spark.pql.parser import execute as ex, execute_all

    idx = Index(spark.createDataFrame(
        [("a", ["example"])], "_id string, f array<string>"
    ))
    assert ex(idx, 'Row(f="garbage")').count() == 0
    assert ex(idx, 'Count(Row(f="example"))').first()[0] == 1
    assert col_set(ex(idx, 'Not(Row(f="garbage"))')) == {"a"}
    assert col_set(ex(idx, 'Difference(All(), Row(f="garbage"))')) == {"a"}
    # multi-call: the Set is visible to the Count in the same request
    res = execute_all(idx, 'Set("b", f="boo")\nCount(Row(f="boo"))')
    assert res[-1].first()[0] == 1
    # Store(Not(Row(f="xyzzy")), f="xyzzy") inverts: nobody has xyzzy,
    # so everybody gets it
    t = ex(idx, 'Store(Not(Row(f="xyzzy")), f="xyzzy")')
    assert col_set(ex(Index(t), 'Row(f="xyzzy")')) == {"a"}
    # Clear of an unset bit changes nothing; of a set bit removes it
    seq = execute_all(
        idx, 'Clear("a", f="garbage")\nClear("a", f="example")'
    )
    final = Index(seq[-1])
    assert ex(final, 'Row(f="example")').count() == 0


# ---- Store edges (TestExecutor_Execute_SetRow) ----------------------------


def test_store_into_nonexistent_field_creates_it(spark):
    rows = {3: [10], SW - 1: [10], SW + 1: [10], 5: []}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "_id long, f array<bigint>"
    ))
    from featurebase_spark.pql.parser import execute as ex

    t = ex(idx, "Store(Row(f=10), nonexistent=20)")
    idx2 = Index(t)
    got = sorted(
        r["_id"] for r in ex(idx2, "Row(nonexistent=20)").collect()
    )
    assert got == [3, SW - 1, SW + 1]


def test_store_empty_source_empties_destination(spark):
    rows = {3: [10], SW - 1: [10], SW + 1: [10]}
    idx = Index(spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "_id long, f array<bigint>"
    ))
    from featurebase_spark.pql.parser import execute as ex

    # Row(f=9) matches nothing; storing it REPLACES row 10 with empty
    t = ex(idx, "Store(Row(f=9), f=10)")
    assert ex(Index(t), "Row(f=10)").count() == 0


# ---- Extract over Sort (TestExecutor_Sort, executor_test.go:4298) ---------


@pytest.fixture(scope="module")
def sort_idx(spark):
    rows = [
        (0, 1, True, "h"), (1, -1, False, "xyzzy"), (2, 2, False, "ra"),
        (3, -2, True, "plugh"), (4, 3, False, "wl"), (5, 4, True, "ig"),
    ]
    return Index(spark.createDataFrame(
        rows, "_id long, bsint long, bool boolean, keymutex string"
    ))


def test_extract_sort_limit_offset_preserves_order(sort_idx):
    got = execute(
        sort_idx,
        "Extract(Sort(Row(bsint > 1), field = bsint, limit = 2,"
        " offset = 1), Rows(bsint))",
    ).collect()
    assert [(r["_id"], r["bsint"]) for r in got] == [(4, 3), (5, 4)]


def test_extract_sort_desc_bool(sort_idx):
    got = execute(
        sort_idx,
        "Extract(Sort(Row(bsint < -1), field = bool, limit = 1,"
        " sort-desc = true), Rows(bool))",
    ).collect()
    assert [(r["_id"], r["bool"]) for r in got] == [(3, True)]


def test_extract_sort_string_key(sort_idx):
    got = execute(
        sort_idx,
        "Extract(Sort(All(), field = keymutex, limit = 1), Rows(keymutex))",
    ).collect()
    assert [(r["_id"], r["keymutex"]) for r in got] == [(0, "h")]


# ---- Limit composition (TestExecutor_Execute_Limit) -----------------------


def test_limit_offset_matrix_and_nesting(spark):
    cols = [0, 1, SW + 1]
    idx = Index(spark.createDataFrame(
        [(c, 1) for c in cols] + [(7, None)], "_id long, f long"
    ).where("f IS NOT NULL"))
    for limit in range(5):
        for offset in range(5):
            expect = cols[offset:][:limit]
            got = [
                r["_id"] for r in execute(
                    idx, f"Limit(All(), limit={limit}, offset={offset})"
                ).collect()
            ]
            assert sorted(got) == expect, (limit, offset)
            # nested composition: outer limit over inner offset
            got = [
                r["_id"] for r in execute(
                    idx,
                    f"Limit(Limit(All(), offset={offset}), limit={limit})",
                ).collect()
            ]
            assert sorted(got) == expect, ("nested", limit, offset)


def test_extract_of_limit_without_fields(spark):
    idx = Index(spark.createDataFrame(
        [(0, 1), (1, 1), (SW + 1, 1)], "_id long, f long"
    ))
    got = execute(idx, "Extract(Limit(All(), limit=1))").collect()
    assert [r["_id"] for r in got] == [0]


# ---- int-field extract (variousQueriesOnIntFields) ------------------------


def test_extract_all_int_fields(spark):
    rows = [
        ("userB", -10, -10, 0, 5),
        ("userC", -5, -5, 2, 6),
        ("userD", -4, 0, 3, 7),
        ("userE", -3, 5, 4, 9),
        ("userG", -1, 10, 10, 10),
    ]
    idx = Index(spark.createDataFrame(
        rows,
        "_id string, neg_neg bigint, neg_pos bigint, zero_pos bigint, "
        "pos_pos bigint",
    ))
    got = execute(
        idx,
        "extract(All(), Rows(neg_neg), Rows(neg_pos), Rows(zero_pos),"
        " Rows(pos_pos))",
    )
    assert rows_set(got) == set(rows)
