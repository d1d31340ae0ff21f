"""Golden tests mirrored from the reference's own SQL test corpus
(/root/reference/sql3/test/defs/ — the reference's primary test strategy,
SURVEY §5), executed VERBATIM through the dialect front door
(featurebase_spark.sql.fb_sql).

Each case is (reference SQL, expected value(s)); expected values are taken
from the corresponding ExpRows in the cited defs file. The fixture table
mirrors defs.go's test tables (knownTimestamp() = 2012-11-01T22:08:41Z,
defs.go:221-226).
"""

from __future__ import annotations

import datetime
import re

import pytest

from featurebase_spark.sql import fb_sql
from featurebase_spark.statements import StatementError


@pytest.fixture(scope="module")
def golden_tables(spark):
    # stringscalarfunctions (defs_string_functions.go:6-18)
    spark.createDataFrame(
        [(1, 10, 100, datetime.datetime(2012, 11, 1, 22, 8, 41), "hello")],
        "_id LONG, a LONG, b LONG, ts TIMESTAMP, a_string STRING",
    ).createOrReplaceTempView("stringscalarfunctions")
    # datetimeparttests-style single-row timestamp table
    spark.createDataFrame(
        [(1, datetime.datetime(2012, 11, 1, 22, 8, 41))],
        "_id LONG, ts TIMESTAMP",
    ).createOrReplaceTempView("datetimeparttests")
    # skills (defs_top.go / defs_set_functions.go shape)
    spark.createDataFrame(
        [
            (1, ["Marketing Manager", "SQL"]),
            (2, ["SQL"]),
            (3, ["Marketing Manager"]),
        ],
        "_id LONG, skills ARRAY<STRING>",
    ).createOrReplaceTempView("skills")
    return spark


SCALAR_CASES = [
    # --- defs_string_functions.go
    ("select reverse('this')", "siht"),  # ReverseString
    ("select reverse(reverse('this'))", "this"),  # ReverseReverseString
    ("select reverse(a_string) from stringscalarfunctions", "olleh"),
    ("select substring('testing', 1, 3)", "est"),  # SubstringPositiveIndex
    ("select charindex('is','this is great')", 2),  # CharIndexofSubstring
    ("select charindex('is','this is great',3)", 5),  # ...withPosition
    ("select charindex('abc','this is great',3)", -1),  # ...Notfound
    ("select upper(a_string) from stringscalarfunctions", "HELLO"),
    ("select lower('TEST')", "test"),
    ("select ltrim('  this ')", "this "),
    ("select rtrim(' this  ')", " this"),
    ("select trim('  this  ')", "this"),
    ("select space(3)", "   "),
    ("select len('four')", 4),
    ("select replicate('ab', 2)", "abab"),
    # defs_string_functions.go:640-830 — PREFIX/SUFFIX are the
    # first/last-n-chars pickers, NOT startswith/endswith (the r1-r9
    # boolean mapping was a parity bug, fixed r10)
    ("SELECT PREFIX('string', 3)", "str"),
    ("SELECT PREFIX('string', 0)", ""),
    ("SELECT PREFIX('string', 6)", "string"),
    ("SELECT PREFIX(NULL, 34)", None),
    ("SELECT PREFIX('string', null)", None),
    ("SELECT SUFFIX('string', 3)", "ing"),
    ("SELECT SUFFIX('string', 0)", ""),
    ("SELECT SUFFIX('string', 6)", "string"),
    ("SELECT SUFFIX(NULL, 23)", None),
    ("select ascii(null)", None),
    # STR is SQL-Server fixed-width (defs_string_functions.go:1287+)
    ("select str(123)", "       123"),
    ("select str(12345)", "     12345"),
    ("select str(12345, 5)", "12345"),
    ("select str(12345, 5, 5)", "*****"),
    ("select str(12345.678)", "     12346"),
    ("select str(12345.19, 5)", "12345"),
    ("select str(12345.789, 8, 2)", "12345.79"),
    ("select str(-2345.789, 8, 2)", "-2345.79"),
    ("select str(1234.99, 10, 200)", "**********"),
    # STRINGSPLIT: literal separator, pos<=0 -> first, past end -> ''
    ("select stringsplit('a.b.c', '.', 1)", "b"),
    ("select stringsplit('a,b,c', ',', -2)", "a"),
    ("select stringsplit('a,b,c', ',', 9)", ""),
    ("select stringsplit(null, ',')", None),
    ("select stringsplit('hello', null)", None),
    ("select stringsplit('test,hello', ',', null)", None),
    ("select format('is this %t?', true)", "is this true?"),
    ("select format('%d > %d', 11, 9)", "11 > 9"),
    ("select ascii('A')", 65),
    ("select char(65)", "A"),
    ("select stringsplit('a,b,c', ',', 1)", "b"),
    ("select replaceall('aaa', 'a', 'b')", "bbb"),
    # --- defs_date_functions.go (knownTimestamp = 2012-11-01T22:08:41Z)
    ("select datetimepart('yy', ts) from datetimeparttests", 2012),
    ("select datetimepart('yd', ts) from datetimeparttests", 306),
    ("select datetimepart('m', ts) from datetimeparttests", 11),
    ("select datetimepart('d', ts) from datetimeparttests", 1),
    ("select datetimepart('w', ts) from datetimeparttests", 4),  # Thursday
    ("select datetimepart('wk', ts) from datetimeparttests", 44),  # ISO week
    ("select datetimepart('hh', ts) from datetimeparttests", 22),
    ("select datetimepart('mi', ts) from datetimeparttests", 8),
    ("select datetimepart('s', ts) from datetimeparttests", 41),
    ("select datetimename('m', ts) from datetimeparttests", "November"),
    ("select datetimename('w', ts) from datetimeparttests", "Thursday"),
    ("select datetimename('yy', ts) from datetimeparttests", "2012"),
    ("select date_trunc('yy', ts) from datetimeparttests", "2012"),
    ("select date_trunc('m', ts) from datetimeparttests", "2012-11"),
    ("select date_trunc('d', ts) from datetimeparttests", "2012-11-01"),
    ("select date_trunc('hh', ts) from datetimeparttests", "2012-11-01T22"),
    ("select date_trunc('s', ts) from datetimeparttests", "2012-11-01T22:08:41"),
    (
        "select datetimediff('s', ts, totimestamp(1351807722)) from datetimeparttests",
        1,  # 2012-11-01T22:08:42 is one second later
    ),
]


@pytest.mark.parametrize("sql,expected", SCALAR_CASES, ids=[c[0][:60] for c in SCALAR_CASES])
def test_golden_scalar(golden_tables, sql, expected):
    row = fb_sql(golden_tables, sql).first()
    assert row[0] == expected


def test_golden_top_setcontains(golden_tables):
    # defs_top.go:23
    got = fb_sql(
        golden_tables,
        "select top(1) * from skills where setcontains(skills, 'Marketing Manager');",
    ).collect()
    assert len(got) == 1 and "Marketing Manager" in got[0]["skills"]


def test_golden_setcontains_family(golden_tables):
    # defs_set_functions.go shapes
    rows = fb_sql(
        golden_tables,
        "select _id, setcontains(skills, 'SQL') as c, "
        "setcontainsall(skills, ['Marketing Manager', 'SQL']) as call, "
        "setcontainsany(skills, ['SQL', 'Nope']) as cany "
        "from skills order by _id",
    ).collect()
    assert [(r["c"], r["call"], r["cany"]) for r in rows] == [
        (True, True, True),
        (True, False, True),
        (False, False, False),
    ]


def test_golden_datetimeadd(golden_tables):
    got = fb_sql(
        golden_tables,
        "select datetimeadd('d', 5, ts) from datetimeparttests",
    ).first()[0]
    assert got == datetime.datetime(2012, 11, 6, 22, 8, 41)


# --- defs_binops.go / defs_cast.go -----------------------------------------


@pytest.fixture(scope="module")
def binop_tables(spark):
    spark.createDataFrame(
        [(1, 10, 20)], "_id LONG, a LONG, b LONG"
    ).createOrReplaceTempView("binoptesti_i")
    return spark


BINOP_CASES = [
    # binoptesti_i: a=10, b=20 (defs_binops.go:10-245)
    ("select a != b from binoptesti_i;", True),
    ("select a & b from binoptesti_i;", 0),
    ("select a | b from binoptesti_i;", 30),
    ("select a << b from binoptesti_i;", 10485760),
    ("select a >> b from binoptesti_i;", 0),
    ("select a + b from binoptesti_i;", 30),
    ("select a - b from binoptesti_i;", -10),
    ("select a * b from binoptesti_i;", 200),
    ("select a % b from binoptesti_i;", 10),
    ("select 1 - 1 ;", 0),
    # defs_cast.go
    ("select cast(1 as int)", 1),
    ("select cast(1 as bool)", True),
    ("select cast(0 as bool)", False),
    ("select cast(1 as id)", 1),
    ("select cast(123 as string)", "123"),
    # pass-through expression surface (expression.go: CASE/BETWEEN/IN/LIKE)
    ("select case when 10 > 5 then 'big' else 'small' end", "big"),
    ("select case 2 when 1 then 'one' when 2 then 'two' end", "two"),
    ("select 15 between 10 and 20", True),
    ("select 3 in (1, 2, 3)", True),
    ("select 'hello' like 'hel%'", True),
    ("select 'a' || 'b'", "ab"),
]


@pytest.mark.parametrize("sql,expected", BINOP_CASES, ids=[c[0][:50] for c in BINOP_CASES])
def test_golden_binops_cast(binop_tables, sql, expected):
    assert fb_sql(binop_tables, sql).first()[0] == expected


def test_golden_cast_decimal_scale_only(binop_tables):
    # reference DECIMAL(2) is scale-only (pql/decimal.go) → value 1.00
    import decimal

    got = fb_sql(binop_tables, "select cast(1 as decimal(2))").first()[0]
    assert got == decimal.Decimal("1.00")


def test_int_division_truncates(binop_tables):
    """FIXED in r11 (was a documented divergence r1-r10): reference
    int/int DIVISION TRUNCATES (10/20 = 0, Go nl/nr — defs_binops.go:
    207-218 expects int64(0)); the dialect now rewrites int '/' to DIV
    (expression.go:414-423). Spark's bare `div` keyword still works."""
    assert fb_sql(binop_tables, "select a / b from binoptesti_i").first()[0] == 0
    assert fb_sql(binop_tables, "select b / a from binoptesti_i").first()[0] == 2
    assert fb_sql(binop_tables, "select a div b from binoptesti_i").first()[0] == 0
    # Go % follows the dividend; 10 % 20 = 10 (defs_binops.go:220-229)
    assert fb_sql(binop_tables, "select a % b from binoptesti_i").first()[0] == 10


def test_divide_by_zero_raises(binop_tables):
    """defs_binops.go:24-49: '/0' and '%0' raise 'divisor is equal to
    zero' (NewErrDivideByZero) on literals AND column rows — Spark
    would return NULL."""
    for q in (
        "select 1/0",
        "select a/0 from binoptesti_i",
        "select 1%0",
        "select a%0 from binoptesti_i",
    ):
        with pytest.raises(Exception, match="divisor is equal to zero"):
            fb_sql(binop_tables, q).collect()


def test_int_division_nonzero_literal_stays_bare(binop_tables):
    """A nonzero literal divisor needs no zero guard — WHERE-clause
    modulo keeps its shape (pushdown-friendly), values truncate."""
    got = fb_sql(
        binop_tables, "select a / 4 from binoptesti_i"
    ).first()[0]
    assert got == 2  # 10 DIV 4


# --- defs_join.go: users/orders relational core -----------------------------


@pytest.fixture(scope="module")
def join_tables(spark):
    import decimal

    spark.createDataFrame(
        [(0, "a", 21), (1, "b", 18), (2, "c", 28), (3, "d", 34), (4, "e", 36)],
        "_id LONG, name STRING, age LONG",
    ).createOrReplaceTempView("users")
    spark.createDataFrame(
        [
            (0, 1, decimal.Decimal("9.99")),
            (1, 0, decimal.Decimal("3.99")),
            (2, 2, decimal.Decimal("14.99")),
            (3, 3, decimal.Decimal("5.99")),
            (4, 1, decimal.Decimal("12.99")),
            (5, 2, decimal.Decimal("1.99")),
        ],
        "_id LONG, userid LONG, price DECIMAL(10,2)",
    ).createOrReplaceTempView("jorders")
    return spark


def test_golden_innerjoin_groupby(join_tables):
    # defs_join.go innerjoin-aggregate-groupby (alias-qualified columns)
    import decimal

    rows = fb_sql(
        join_tables,
        "select u._id, sum(o.price) as s from jorders o "
        "inner join users u on o.userid = u._id group by u._id;",
    ).collect()
    got = {r["_id"]: r["s"] for r in rows}
    assert got == {
        0: decimal.Decimal("3.99"),
        1: decimal.Decimal("22.98"),
        2: decimal.Decimal("16.98"),
        3: decimal.Decimal("5.99"),
    }


def test_golden_innerjoin_sum_filter(join_tables):
    # innerjoin-aggregate-groupby-sum-filter: age > 20 → 26.96
    import decimal

    got = fb_sql(
        join_tables,
        "select sum(o.price) from jorders o inner join users u "
        "on o.userid = u._id where u.age > 20;",
    ).first()[0]
    assert got == decimal.Decimal("26.96")
    # ...-sum-double-filter: + price < 10.00 → 11.97
    got = fb_sql(
        join_tables,
        "select sum(o.price) from jorders o inner join users u "
        "on o.userid = u._id where u.age > 20 and o.price < 10.00;",
    ).first()[0]
    assert got == decimal.Decimal("11.97")


def test_golden_join_count_distinct(join_tables):
    # innerjoin-aggregate-groupby-count-distinct-filter: price > 9 → users b,c
    got = fb_sql(
        join_tables,
        "SELECT COUNT(DISTINCT u.name) FROM jorders o JOIN users u "
        "ON o.userid = u._id WHERE o.price > 9;",
    ).first()[0]
    assert got == 2


def test_golden_left_join_null_padding(join_tables):
    # user 'e' (id 4) has no orders → null-padded left row
    # (opnestedloops.go joinTypeLeft null padding)
    rows = fb_sql(
        join_tables,
        "select u._id, o.price from users u left join jorders o "
        "on u._id = o.userid where o._id is null",
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [(4, None)]


def test_golden_null_semantics(join_tables):
    # defs_null.go: IS NULL / IS NOT NULL over present and absent values
    assert fb_sql(join_tables, "select null is null").first()[0] is True
    assert fb_sql(join_tables, "select 1 is null").first()[0] is False
    assert fb_sql(join_tables, "select 1 is not null").first()[0] is True
    # null propagation through binops (expression.go coercion rules)
    assert fb_sql(join_tables, "select 1 + null").first()[0] is None
    assert fb_sql(join_tables, "select null || 'x'").first()[0] is None


def test_golden_having_orderby(join_tables):
    # defs_having.go / defs_orderby.go shapes
    rows = fb_sql(
        join_tables,
        "select userid, count(*) as n from jorders "
        "group by userid having count(*) > 1 order by userid",
    ).collect()
    assert [(r["userid"], r["n"]) for r in rows] == [(1, 2), (2, 2)]


def test_golden_distinct_top(join_tables):
    # defs_distinct.go / defs_top.go
    rows = fb_sql(
        join_tables,
        "select top(2) distinct userid from jorders order by userid",
    ).collect()
    assert [r[0] for r in rows] == [0, 1]


# --- defs_groupby.go / defs_like.go / defs_in.go / defs_between.go ----------


@pytest.fixture(scope="module")
def groupby_table(spark):
    rows = [
        (1, 10, "10", 100, [1, 2]),
        (2, 10, "10", 200, [1, 2]),
        (3, 11, "11", None, [1, 3]),
        (4, 12, "12", None, [2, 3]),
        (5, 12, "12", None, [1, 3]),
        (6, 13, "13", None, [1, 2, 3]),
    ]
    spark.createDataFrame(
        rows, "_id LONG, i1 LONG, s1 STRING, i2 LONG, is1 ARRAY<LONG>"
    ).createOrReplaceTempView("groupby_test")
    return spark


def test_golden_groupby_ordinal(groupby_table):
    # defs_groupby.go: "group by i1 order by 2 asc" (ordinal ORDER BY)
    rows = fb_sql(
        groupby_table,
        "SELECT COUNT(*) as n, i1 FROM groupby_test group by i1 order by 2 asc",
    ).collect()
    assert [(r["n"], r["i1"]) for r in rows] == [
        (2, 10), (1, 11), (2, 12), (1, 13),
    ]


def test_golden_groupby_alias_order(groupby_table):
    # "... i1 as c ... order by c asc" (alias ORDER BY)
    rows = fb_sql(
        groupby_table,
        "SELECT COUNT(*) as n, i1 as c FROM groupby_test group by i1 order by c asc",
    ).collect()
    assert [r["c"] for r in rows] == [10, 11, 12, 13]


def test_golden_groupby_set_field(groupby_table):
    # grouping by a SET field value requires explode (the reference's
    # one-bitmap-per-value GroupBy, executeGroupBy over Rows(is1))
    rows = fb_sql(
        groupby_table,
        "select v as is1, count(*) as n from "
        "(select explode(is1) as v from groupby_test) group by v order by v",
    ).collect()
    assert [(r["is1"], r["n"]) for r in rows] == [(1, 5), (2, 4), (3, 4)]


def test_golden_like_patterns(groupby_table):
    # defs_like.go: % and _ patterns on string fields
    assert fb_sql(groupby_table, "select 'leaf' like '%f_'").first()[0] is False
    assert fb_sql(groupby_table, "select 'leafy' like '%f_'").first()[0] is True
    assert fb_sql(groupby_table, "select 'x' not like '%f_'").first()[0] is True
    rows = fb_sql(
        groupby_table,
        "select _id from groupby_test where s1 like '1_' order by _id",
    ).collect()
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5, 6]  # all '1x' strings


def test_golden_in_list(groupby_table):
    # defs_in.go: IN over literal lists (the only IN form the reference has)
    rows = fb_sql(
        groupby_table,
        "select _id from groupby_test where i1 in (10, 13) order by _id",
    ).collect()
    assert [r[0] for r in rows] == [1, 2, 6]
    rows = fb_sql(
        groupby_table,
        "select _id from groupby_test where s1 not in ('10', '11') order by _id",
    ).collect()
    assert [r[0] for r in rows] == [4, 5, 6]


def test_golden_between(groupby_table):
    # defs_between.go
    rows = fb_sql(
        groupby_table,
        "select _id from groupby_test where i1 between 11 and 12 order by _id",
    ).collect()
    assert [r[0] for r in rows] == [3, 4, 5]
    rows = fb_sql(
        groupby_table,
        "select _id from groupby_test where i1 not between 11 and 12 order by _id",
    ).collect()
    assert [r[0] for r in rows] == [1, 2, 6]


# --- defs_subquery.go / defs_orderby.go --------------------------------------


def test_golden_from_subquery(spark):
    # defs_subquery.go select-count / select-count-distinct
    spark.createDataFrame(
        [(1, "str1"), (2, "str1"), (3, "str2"), (4, "str2"), (5, "str3")],
        "_id LONG, a_string STRING",
    ).createOrReplaceTempView("subquerytable")
    got = fb_sql(
        spark,
        "select sum(mycount) as thecount from (select count(a_string) as mycount, "
        "a_string from subquerytable group BY a_string);",
    ).first()["thecount"]
    assert got == 5
    got = fb_sql(
        spark,
        "select sum(mycount) as thecount from (select count(distinct a_string) as "
        "mycount, a_string from subquerytable group BY a_string);",
    ).first()["thecount"]
    assert got == 3


def test_golden_scalar_subquery(spark):
    # expression.go:1084-1147 scalar subquery (single row enforced)
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "_id LONG, v LONG"
    ).createOrReplaceTempView("scalarsub")
    rows = fb_sql(
        spark,
        "select _id from scalarsub where v > (select avg(v) from scalarsub) "
        "order by _id",
    ).collect()
    assert [r[0] for r in rows] == [3]


def test_golden_orderby_directions(spark):
    # defs_orderby.go: multi-key mixed asc/desc
    spark.createDataFrame(
        [(1, "a", 2), (2, "a", 1), (3, "b", 3), (4, "b", 1)],
        "_id LONG, k STRING, v LONG",
    ).createOrReplaceTempView("ordertest")
    rows = fb_sql(
        spark,
        "select _id from ordertest order by k asc, v desc",
    ).collect()
    assert [r[0] for r in rows] == [1, 2, 3, 4]


def test_golden_rangeq_quantum(spark):
    # defs_timequantum.go shape: RANGEQ is a BOOL 3-arg WHERE pushdown filter
    # (analyzeFunctionRangeQ inbuiltfunctionsquantum.go:8-46); from/to are
    # each nullable but not both
    spark.sql(
        "select * from values"
        " (1, array(named_struct('value', 'a', 'ts', timestamp'2024-01-01 00:00:00'))),"
        " (2, array(named_struct('value', 'b', 'ts', timestamp'2024-06-01 00:00:00')))"
        " as t(_id, tq)"
    ).createOrReplaceTempView("quantumtest")
    rows = fb_sql(
        spark,
        "select _id from quantumtest where rangeq(tq, "
        "timestamp'2024-03-01 00:00:00', timestamp'2024-12-31 00:00:00')",
    ).collect()
    assert [r[0] for r in rows] == [2]
    rows = fb_sql(
        spark,
        "select _id from quantumtest where "
        "rangeq(tq, null, timestamp'2024-03-01 00:00:00')",
    ).collect()
    assert [r[0] for r in rows] == [1]


def test_golden_unary_ops(spark):
    # defs_unops.go: -i, +i, and BITWISE !i (= -11 for 10); != untouched
    spark.sql("select 1 as _id, 10 as i").createOrReplaceTempView("unoptesti")
    r = fb_sql(
        spark, "select -i as a, !i as b, +i as c from unoptesti"
    ).first()
    assert (r["a"], r["b"], r["c"]) == (-10, -11, 10)
    n = fb_sql(spark, "select count(*) as n from unoptesti where i != 3").first()["n"]
    assert n == 1


# --- defs_aggregate.go: COUNT argument analysis + shapes --------------------


@pytest.fixture(scope="module")
def count_test(spark):
    spark.sql(
        "select * from values"
        " (1, 10, 10.0, 100), (2, 10, 10.0, 200), (3, 11, 11.0, CAST(NULL AS INT)),"
        " (4, 12, 12.0, CAST(NULL AS INT)), (5, 12, 12.0, CAST(NULL AS INT)),"
        " (6, 13, 13.0, CAST(NULL AS INT))"
        " as t(_id, i1, d1, i2)"
    ).createOrReplaceTempView("count_test")
    return spark


def test_golden_count_arg_errors(count_test):
    # defs_aggregate.go:29-40 — exact ExpErr substrings
    spark = count_test
    with pytest.raises(ValueError, match=re.escape(
        "count of formal parameters (1) does not match count of actual "
        "parameters (2)"
    )):
        fb_sql(spark, "SELECT COUNT(i1, d1) AS count_rows FROM count_test")
    with pytest.raises(ValueError, match="column reference expected"):
        fb_sql(spark, "SELECT COUNT(1) AS count_rows FROM count_test")


@pytest.mark.parametrize(
    "sql,expected",
    [
        ("SELECT COUNT(*) AS count_rows FROM count_test", 6),
        ("SELECT COUNT(_id) AS count_rows FROM count_test", 6),
        ("SELECT COUNT(*) + 10 - 11 * 2 AS count_rows FROM count_test", -6),
        ("SELECT COUNT(*) AS count_rows FROM count_test WHERE i1 = 10", 2),
        ("SELECT COUNT(*) AS count_rows FROM count_test WHERE i1 != 10", 4),
        ("SELECT COUNT(*) AS count_rows FROM count_test WHERE i1 < 12", 3),
        ("SELECT COUNT(*) AS count_rows FROM count_test WHERE i1 > 12", 1),
    ],
    ids=lambda v: str(v)[:55],
)
def test_golden_count_shapes(count_test, sql, expected):
    assert fb_sql(count_test, sql).first()[0] == expected


def test_golden_count_null_columns(count_test):
    # COUNT(col) skips NULLs: i2 present in 2 rows (defs_aggregate.go:58-67)
    r = fb_sql(
        count_test, "SELECT COUNT(i1) as a, COUNT(i2) as b FROM count_test"
    ).first()
    assert (r["a"], r["b"]) == (6, 2)


# --- defs_views.go: view lifecycle through the statement door ---------------


def test_golden_view_lifecycle(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table viewtable (_id id, a_string string, a_int int)",
           catalog=cat)
    fb_sql(spark, "insert into viewtable (_id, a_string, a_int) values "
           "(1, 'str1', 10), (2, 'str2', 20), (3, 'str3', 30), "
           "(4, 'str2', 40), (5, 'str3', 50)", catalog=cat)
    # create view with a TABLE's name (defs_views.go:24-31)
    with pytest.raises(StatementError, match="table or view 'viewtable' already exists"):
        fb_sql(spark, "create view viewtable as select _id, a_string, a_int "
               "from viewtable", catalog=cat)
    fb_sql(spark, "create view viewonviewtable as select _id, a_string, a_int "
           "from viewtable", catalog=cat)
    # duplicate view (defs_views.go:42-48)
    with pytest.raises(StatementError, match="view 'viewonviewtable' already exists"):
        fb_sql(spark, "create view viewonviewtable as select _id from viewtable",
               catalog=cat)
    # IF NOT EXISTS no-ops (defs_views.go:49-58)
    fb_sql(spark, "create view if not exists viewonviewtable as select _id "
           "from viewtable", catalog=cat)
    assert fb_sql(spark, "select * from viewonviewtable", catalog=cat).count() == 5
    # alter view narrows (defs_views.go:81-110)
    fb_sql(spark, "alter view viewonviewtable as select _id, a_string, a_int "
           "from viewtable where a_int > 20", catalog=cat)
    got = sorted(r["_id"] for r in
                 fb_sql(spark, "select * from viewonviewtable", catalog=cat).collect())
    assert got == [3, 4, 5]
    # drop + drop-if-exists-after-drop (defs_views.go:111-135)
    fb_sql(spark, "drop view viewonviewtable", catalog=cat)
    fb_sql(spark, "drop view if exists viewonviewtable", catalog=cat)
    with pytest.raises(StatementError, match="view 'viewonviewtable' not found"):
        fb_sql(spark, "drop view viewonviewtable", catalog=cat)
    # view with built-in literals (defs_views.go:136-158)
    fb_sql(spark, "create view if not exists viewwithliteral as select _id "
           "from viewtable where a_int < 100", catalog=cat)
    assert fb_sql(spark, "select * from viewwithliteral", catalog=cat).count() == 5
    cat.drop_view("viewwithliteral")
    cat.drop_table("viewtable")


# --- defs_keyed.go: string-keyed table over the statement door --------------


@pytest.fixture(scope="module")
def keyed_cat(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table keyed (_id string, an_int int min 0 max 100, "
           "an_id_set idset, an_id id, a_string string, a_string_set stringset)",
           catalog=cat)
    fb_sql(spark, "insert into keyed values "
           "('one', 11, [11, 12, 13], 101, 'str1', ['a1', 'b1', 'c1']), "
           "('two', 22, [11, 12, 23], 201, 'str2', ['a2', 'b2', 'c2']), "
           "('three', 33, [11, 32, 33], 301, 'str3', ['a3', 'b3', 'c3']), "
           "('four', 44, [41, 42, 43], 401, 'str4', ['a4', 'b4', 'c4'])",
           catalog=cat)
    return cat


def test_golden_keyed_select_all(spark, keyed_cat):
    rows = {r["_id"]: r for r in
            fb_sql(spark, "select * from keyed", catalog=keyed_cat).collect()}
    assert set(rows) == {"one", "two", "three", "four"}
    assert rows["one"]["an_int"] == 11 and rows["one"]["a_string"] == "str1"
    assert sorted(rows["three"]["an_id_set"]) == [11, 32, 33]


def test_golden_keyed_filters(spark, keyed_cat):
    assert fb_sql(spark, "select an_int from keyed where _id = 'two'",
                  catalog=keyed_cat).first()[0] == 22
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select _id from keyed where _id in ('one', 'four')",
        catalog=keyed_cat).collect())
    assert got == ["four", "one"]
    assert fb_sql(spark, "select count(*) as n from keyed where an_int > 22",
                  catalog=keyed_cat).first()["n"] == 2


def test_golden_keyed_setcontains(spark, keyed_cat):
    # SETCONTAINS over idset/stringset on the keyed rows (defs_keyed.go
    # set predicates)
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select _id from keyed where setcontains(an_id_set, 11)",
        catalog=keyed_cat).collect())
    assert got == ["one", "three", "two"]
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select _id from keyed where setcontains(a_string_set, 'a4')",
        catalog=keyed_cat).collect())
    assert got == ["four"]


def test_golden_keyed_upsert(spark, keyed_cat):
    # string-keyed INSERT upserts by _id (defs_keyed_insert.go)
    fb_sql(spark, "insert into keyed (_id, an_int) values ('one', 99)",
           catalog=keyed_cat)
    r = fb_sql(spark, "select an_int, a_string from keyed where _id = 'one'",
               catalog=keyed_cat).first()
    # partial insert: unlisted a_string survives (opinsert.go targetColumns)
    assert (r["an_int"], r["a_string"]) == (99, "str1")
    assert fb_sql(spark, "select count(*) as n from keyed",
                  catalog=keyed_cat).first()["n"] == 4


# --- defs_delete.go: delete shapes over the statement door ------------------


def test_golden_delete_shapes(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table del_t (_id id, i1 int min 0 max 1000)",
           catalog=cat)
    fb_sql(spark, "insert into del_t values " +
           ", ".join(f"({i}, {i})" for i in range(1, 7)), catalog=cat)
    # delete by key (defs_delete.go:47-65)
    fb_sql(spark, "delete from del_t where _id = 1", catalog=cat)
    assert fb_sql(spark, "select _id from del_t where _id = 1",
                  catalog=cat).count() == 0
    # delete with IN list (defs_delete.go:66-83)
    fb_sql(spark, "delete from del_t where _id in (2, 3)", catalog=cat)
    assert fb_sql(spark, "select _id from del_t where _id = 2 or _id = 3",
                  catalog=cat).count() == 0
    # delete with IN-subquery + conjunction (defs_delete.go:85-119)
    fb_sql(spark, "create table sub_query (_id id, i1 int min 0 max 1000)",
           catalog=cat)
    fb_sql(spark, "insert into sub_query values (1,1), (2,2), (3,3), (4,4), "
           "(5,5), (6,6)", catalog=cat)
    fb_sql(spark, "delete from del_t where _id in "
           "(select _id from sub_query where i1 > 3) and i1 > 4", catalog=cat)
    assert sorted(r["_id"] for r in
                  fb_sql(spark, "select _id from del_t", catalog=cat).collect()) == [4]
    # unconditional delete truncates (oppqltruncate.go)
    fb_sql(spark, "delete from del_t", catalog=cat)
    assert fb_sql(spark, "select count(*) as n from del_t",
                  catalog=cat).first()["n"] == 0
    # delete from a missing table errors
    with pytest.raises(StatementError, match="table 'nope_del' not found"):
        fb_sql(spark, "delete from nope_del where _id = 1", catalog=cat)
    cat.drop_table("del_t")
    cat.drop_table("sub_query")


# --- defs_bulkinsert.go: assignment compatibility + transforms --------------


def test_golden_bulkinsert_assignment_compat(spark, tmp_path):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table bulktest (_id string, id_col id, "
           "string_col string, int_col int)", catalog=cat)
    csv = tmp_path / "bulk.csv"
    csv.write_text("1,TEST,-123\n2,TEST2,321\n")
    # passing shape: map types match their targets (defs_bulkinsert.go:26-44)
    fb_sql(spark, f"bulk insert into bulktest (_id, id_col, string_col, int_col) "
           f"map (0 ID, 1 STRING, 2 INT) transform(@1, @0, @1, @2) "
           f"from '{csv}' with format 'CSV' input 'FILE'", catalog=cat)
    got = {r["_id"]: r["int_col"] for r in
           fb_sql(spark, "select _id, int_col from bulktest", catalog=cat).collect()}
    assert got == {"TEST": -123, "TEST2": 321}
    # STRING map source into an INT column (defs_bulkinsert.go:46-61)
    with pytest.raises(StatementError, match=re.escape(
        "an expression of type 'string' cannot be assigned to type 'int'"
    )):
        fb_sql(spark, f"bulk insert into bulktest (_id, id_col, string_col, "
               f"int_col) map (0 ID, 1 STRING, 2 STRING) "
               f"transform(@1, @0, @1, @2) from '{csv}' "
               f"with format 'CSV' input 'FILE'", catalog=cat)
    # ID map source into a STRING column, no transform (defs_bulkinsert.go:63-79)
    with pytest.raises(StatementError, match=re.escape(
        "an expression of type 'id' cannot be assigned to type 'string'"
    )):
        fb_sql(spark, f"bulk insert into bulktest (_id, id_col, string_col) "
               f"map (0 STRING, 1 ID, 2 ID) from '{csv}' "
               f"with format 'CSV' input 'FILE'", catalog=cat)
    cat.drop_table("bulktest")


# --- defs_bool.go: bool upsert transitions through the statement door -------


def test_golden_bool_upsert_transitions(spark):
    """defs_bool.go singleboolfield: every bool→bool/null transition via
    INSERT upserts, exact row states after each step (through the
    bucketed statement door)."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table singleboolfield (_id id, a_bool bool)", catalog=cat)
    fb_sql(spark, "insert into singleboolfield (_id, a_bool) values "
           "(1, true), (2, true), (3, false), (4, false), (5, null), (6, null)",
           catalog=cat)
    got = {r["_id"]: r["a_bool"] for r in spark.table("singleboolfield").collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: None, 6: None}
    # step 2: all other combinations (defs_bool.go:50-85)
    fb_sql(spark, "insert into singleboolfield (_id, a_bool) values "
           "(1, false), (2, null), (3, true), (4, null), (5, false), (6, true)",
           catalog=cat)
    got = {r["_id"]: r["a_bool"] for r in spark.table("singleboolfield").collect()}
    assert got == {1: False, 2: None, 3: True, 4: None, 5: False, 6: True}
    cat.drop_table("singleboolfield")


# --- defs_filterpredicates.go: the per-type predicate matrix ----------------


@pytest.fixture(scope="module")
def filter_predicates(spark):
    spark.sql(
        "select * from values "
        "(1, 10, true,  1, 10.0, '10', timestamp'2001-11-01 22:08:41'), "
        "(2, 20, true,  2, 20.0, '20', timestamp'2002-11-01 22:08:41'), "
        "(3, 30, false, 3, 30.0, '30', timestamp'2003-11-01 22:08:41'), "
        "(4, 40, false, 4, 40.0, '40', timestamp'2004-11-01 22:08:41'), "
        "(5, 50, true,  5, 50.0, '50', timestamp'2005-11-01 22:08:41'), "
        "(6, 60, false, 6, 60.0, '60', timestamp'2006-11-01 22:08:41') "
        "as t(_id, i1, b1, id1, d1, s1, ts1)"
    ).createOrReplaceTempView("filter_predicates")
    return spark


@pytest.mark.parametrize(
    "pred,expected",
    [
        ("_id != 1", [2, 3, 4, 5, 6]),
        ("_id = 1", [1]),
        ("_id > 5", [6]),
        ("_id >= 5", [5, 6]),
        ("_id < 2", [1]),
        ("_id <= 2", [1, 2]),
        ("i1 != 10", [2, 3, 4, 5, 6]),
        ("i1 >= 50", [5, 6]),
        ("b1 = true", [1, 2, 5]),
        ("b1 != true", [3, 4, 6]),
        ("d1 > 40.0", [5, 6]),
        ("s1 = '30'", [3]),
        ("s1 > '40'", [5, 6]),
        ("ts1 < '2003-01-01T00:00:00Z'", [1, 2]),
    ],
    ids=lambda v: str(v)[:30],
)
def test_golden_filter_predicates(filter_predicates, pred, expected):
    got = sorted(
        r["_id"]
        for r in fb_sql(
            filter_predicates,
            f"select _id from filter_predicates where {pred}",
        ).collect()
    )
    assert got == expected


# --- defs_subquery.go: aggregate over grouped FROM-subquery -----------------


def test_golden_subquery_sum_over_group(spark):
    spark.sql(
        "select * from values (1, 'a'), (2, 'a'), (3, 'b'), (4, 'b'), (5, 'c') "
        "as t(_id, a_string)"
    ).createOrReplaceTempView("subquerytable")
    got = fb_sql(
        spark,
        "select sum(mycount) as thecount from (select count(a_string) as "
        "mycount, a_string from subquerytable group BY a_string)",
    ).first()["thecount"]
    assert got == 5
    got = fb_sql(
        spark,
        "select sum(mycount) as thecount from (select count(distinct a_string) "
        "as mycount, a_string from subquerytable group BY a_string)",
    ).first()["thecount"]
    assert got == 3


# --- defs_orderby.go: alias / ordinal / expression ORDER BY -----------------


@pytest.fixture(scope="module")
def order_by_test(spark):
    spark.sql(
        "select * from values (1, 10, 100, 2.5), (2, 30, 300, 1.5), "
        "(3, 20, 200, 3.5) as t(_id, an_int, an_id, a_decimal)"
    ).createOrReplaceTempView("order_by_test")
    return spark


@pytest.mark.parametrize(
    "sql,col,expected",
    [
        # order by another column (defs_orderby.go:40)
        ("select an_int from order_by_test order by an_id asc", "an_int", [10, 20, 30]),
        # order by decimal (defs_orderby.go:55)
        ("select an_int from order_by_test order by a_decimal asc", "an_int", [30, 10, 20]),
        # order by output alias (defs_orderby.go:102)
        ("select an_int as foo from order_by_test order by foo asc", "foo", [10, 20, 30]),
        # order by ordinal (defs_orderby.go:117)
        ("select an_int as foo from order_by_test order by 1 desc", "foo", [30, 20, 10]),
        # order by aliased expression (defs_orderby.go:147)
        ("select an_int + 1 as bar from order_by_test order by bar desc", "bar", [31, 21, 11]),
        # expression alias as secondary key (defs_orderby.go:71)
        (
            "select an_int + 1 as foo from order_by_test "
            "order by foo asc, a_decimal asc",
            "foo",
            [11, 21, 31],
        ),
    ],
    ids=lambda v: str(v)[:45],
)
def test_golden_orderby_forms(order_by_test, sql, col, expected):
    assert [r[col] for r in fb_sql(order_by_test, sql).collect()] == expected


# --- defs_in.go / defs_between.go: membership + range as boolean exprs ------


@pytest.fixture(scope="module")
def in_all_types(spark):
    spark.sql(
        "select * from values "
        "(1, 1, true, 1.23, 3, 'foo', timestamp'2010-11-01 22:08:41'), "
        "(10, 1000, false, 4.56, 7, 'baz', timestamp'2012-11-01 22:08:41') "
        "as t(_id, i1, b1, d1, id1, s1, t1)"
    ).createOrReplaceTempView("in_all_types")
    return spark


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("_id in (1, 10)", [True, True]),
        ("i1 in (1, 1000)", [True, True]),
        ("b1 in (true, false)", [True, True]),
        ("d1 in (1.23, 4.56)", [True, True]),
        ("id1 in (3, 7)", [True, True]),
        ("s1 in ('foo', 'bar')", [True, False]),
        ("_id not in (1, 10)", [False, False]),
        ("s1 not in ('foo', 'bar')", [False, True]),
        ("_id between 1 and 10", [True, True]),
        ("i1 between 1 and 10", [True, False]),
        ("d1 between 1.23 and 4.56", [True, True]),
        ("id1 between 3 and 7", [True, True]),
        ("i1 not between 1 and 10", [False, True]),
    ],
    ids=lambda v: str(v)[:35],
)
def test_golden_in_between_forms(in_all_types, expr, expected):
    rows = fb_sql(
        in_all_types,
        f"select _id, {expr} as p from in_all_types order by _id",
    ).collect()
    assert [r["p"] for r in rows] == expected


# --- defs_inserts.go: insert shapes + error rows ----------------------------


@pytest.fixture()
def insert_cat(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table testinsert (_id id, a int min 0 max 1000, "
           "b int min 0 max 1000, s string, bl bool, d decimal(2) min 0 max 1000, "
           "event stringset, ievent idset)", catalog=cat)
    yield cat
    cat.drop_table("testinsert", if_exists=True)


def test_golden_inserts_shapes(spark, insert_cat):
    cat = insert_cat
    # Insert + Replace of the same key (defs_inserts.go:18-35)
    fb_sql(spark, "insert into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (4, 40, 400, 'foo', false, 10.12, ['A', 'B', 'C'], [1, 2, 3])",
           catalog=cat)
    fb_sql(spark, "replace into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (4, 40, 400, 'foo', false, 10.12, ['A', 'B', 'C'], [1, 2, 3])",
           catalog=cat)
    # multiple tuples (defs_inserts.go:36-44)
    fb_sql(spark, "insert into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (4, 40, 400, 'foo', false, 10.12, ['A', 'B', 'C'], [1, 2, 3]), "
           "(5, 50, 500, 'var', true, 20.24, ['X', 'Y', 'Z'], [4, 5, 6])",
           catalog=cat)
    # nulls (defs_inserts.go:45-54)
    fb_sql(spark, "insert into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (5, null, null, null, null, null, null, null)", catalog=cat)
    fb_sql(spark, "insert into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (6, 1, null, null, null, null, null, null)", catalog=cat)
    # value expressions (defs_inserts.go:55-63)
    fb_sql(spark, "insert into testinsert (_id, a, b, s, bl, d, event, ievent) "
           "values (4, 40*10, 400+1, 'foo' || 'bar', 1 > 2, 10.12 + 3.1, "
           "['A', 'B', 'C'], [1, 2, 3])", catalog=cat)
    got = {r["_id"]: r for r in
           fb_sql(spark, "select * from testinsert", catalog=cat).collect()}
    assert set(got) == {4, 5, 6}
    assert (got[4]["a"], got[4]["b"], got[4]["s"], got[4]["bl"]) == (
        400, 401, "foobar", False)
    assert float(got[4]["d"]) == pytest.approx(13.22)
    assert got[5]["a"] is None and got[5]["s"] is None
    assert got[6]["a"] == 1 and got[6]["b"] is None


INSERT_ERR_CASES = [
    # (sql, expected-substring) — defs_inserts.go:64-154 ExpErr rows
    ("insert into ifoo (a, b) values (1, 2)", "table 'ifoo' not found"),
    ("insert into testinsert (c, b) values (1, 2)", "column 'c' not found"),
    ("insert into testinsert (a, a, b) values (1, 2)", "duplicate column 'a'"),
    ("insert into testinsert (_id, a, b) values (1)",
     "mismatch in the count of expressions and target columns"),
    ("insert into testinsert values (4, 40, 400)",
     "mismatch in the count of expressions and target columns"),
    ("insert into testinsert (a, b) values (1, 2)",
     "insert column list must have '_id' column specified"),
    ("insert into testinsert (_id) values (1)",
     "insert column list must have at least one non '_id' column specified"),
    ("insert into testinsert (_id, a, event) values (4, 40, [101, 150])",
     "an expression of type 'idset' cannot be assigned to type 'stringset'"),
    ("insert into testinsert (_id, a, ievent) values (4, 40, ['POST', 'GET'])",
     "an expression of type 'stringset' cannot be assigned to type 'idset'"),
    ("insert into testinsert (_id, a) values (400, -1)",
     "inserting value into column 'a', row 1, value '-1' out of range"),
    ("insert into testinsert (_id, a) values (400, 1001)",
     "inserting value into column 'a', row 1, value '1001' out of range"),
    ("insert into testinsert (_id, d) values (400, -1.00)",
     "inserting value into column 'd', row 1, value '-1' out of range"),
    ("insert into testinsert (_id, d) values (400, 1001.00)",
     "inserting value into column 'd', row 1, value '1001' out of range"),
]


@pytest.mark.parametrize(
    "sql,err", INSERT_ERR_CASES, ids=[c[0][:55] for c in INSERT_ERR_CASES]
)
def test_golden_inserts_errors(spark, insert_cat, sql, err):
    with pytest.raises(StatementError, match=re.escape(err)):
        fb_sql(spark, sql, catalog=insert_cat)


def test_golden_insert_timestamp_forms(spark):
    # insertTimestampTest (defs_inserts.go:158-199): a string date literal
    # and an epoch-seconds integer land on the same instant
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "CREATE TABLE insertTimestampTest (_id id, time timestamp "
           "timeunit 'ms', ids idset, strings stringset);", catalog=cat)
    fb_sql(spark, "INSERT INTO insertTimestampTest(_id, time, ids, strings) "
           "VALUES (1, '2023-01-01', [6 , 1, 9], ['red', 'blue', 'green']);",
           catalog=cat)
    fb_sql(spark, "INSERT INTO insertTimestampTest(_id, time, ids, strings) "
           "VALUES (2, 1672531200, [6 , 1, 9], ['red', 'blue', 'green']);",
           catalog=cat)
    got = [r[0] for r in
           fb_sql(spark, "select time from insertTimestampTest;",
                  catalog=cat).collect()]
    want = datetime.datetime(2023, 1, 1, 0, 0, 0)
    assert got == [want, want]
    cat.drop_table("inserttimestamptest", if_exists=True)
    cat.drop_table("insertTimestampTest".lower(), if_exists=True)


# --- defs_timestamp_literals.go ---------------------------------------------


def test_golden_timestamp_literals(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table testtimestampliterals (_id id, "
           "a int min 0 max 1000, b int min 0 max 1000, d decimal(2), "
           "ts timestamp, event stringset, ievent idset)", catalog=cat)
    base = ("insert into testtimestampliterals (_id, a, b, d, ts, event, ievent)"
            " values ({_id}, 40, 400, 10.12, {ts}, ['A', 'B', 'C'], [1, 2, 3])")
    # current_timestamp / current_date / epoch 0 / epoch -86400
    # (defs_timestamp_literals.go:18-53)
    fb_sql(spark, base.format(_id=1, ts="current_timestamp"), catalog=cat)
    fb_sql(spark, base.format(_id=2, ts="current_date"), catalog=cat)
    fb_sql(spark, base.format(_id=3, ts="0"), catalog=cat)
    fb_sql(spark, base.format(_id=4, ts="-86400"), catalog=cat)
    got = {r["_id"]: r["yy"] for r in fb_sql(
        spark,
        'select _id, datetimepart(\'yy\', ts) as "yy" '
        "from testtimestampliterals where _id in (3,4)",
        catalog=cat).collect()}
    # 0 -> 1970-01-01, -86400 -> 1969-12-31 (defs_timestamp_literals.go:54-68)
    assert got == {3: 1970, 4: 1969}
    assert fb_sql(spark, "select count(*) as n from testtimestampliterals "
                  "where ts is not null", catalog=cat).first()["n"] == 4
    cat.drop_table("testtimestampliterals")


# --- defs_create_table.go / alterTable error rows ---------------------------


CREATE_ERR_CASES = [
    ("create table foo (_id id, i1 int) keypartitions 0",
     "invalid value '0' for key partitions (should be a number between 1-10000)"),
    ("create table foo (_id id, i1 int) keypartitions 10001",
     "invalid value '10001' for key partitions (should be a number between 1-10000)"),
    ("create table foo (_id id, i1 int) comment 34", "string literal expected"),
    ("create table foo (_id id, i1 int) comment bad", "expected literal, found bad"),
    ("create table bar (_id id, i1 int min 20 max 19)",
     "int field min cannot be greater than max"),
]


@pytest.mark.parametrize(
    "sql,err", CREATE_ERR_CASES, ids=[c[0][35:80] for c in CREATE_ERR_CASES]
)
def test_golden_create_table_errors(spark, sql, err):
    from featurebase_spark.operators.ddl import Catalog

    with pytest.raises(StatementError, match=re.escape(err)):
        fb_sql(spark, sql, catalog=Catalog(spark))


def test_golden_create_table_comment_ok(spark):
    # defs_create_table.go:41-46: a string comment parses and is dropped
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table bar (_id id, i1 int) comment 'this should work'",
           catalog=cat)
    assert "bar" in cat.show_tables()
    cat.drop_table("bar")


def test_golden_alter_table_errors(spark):
    # alterTable (defs_create_table.go:50-82)
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table alter_table_test (_id id, a_int int)", catalog=cat)
    with pytest.raises(StatementError, match="table 'alter_table_test_foo' not found"):
        fb_sql(spark, "alter table alter_table_test_foo add column a_int int",
               catalog=cat)
    with pytest.raises(StatementError, match="duplicate column 'a_int'"):
        fb_sql(spark, "alter table alter_table_test add column a_int int",
               catalog=cat)
    with pytest.raises(StatementError, match="column 'b_int' not found"):
        fb_sql(spark, "alter table alter_table_test drop column b_int",
               catalog=cat)
    cat.drop_table("alter_table_test")


# --- defs_copy.go ------------------------------------------------------------


def test_golden_copy_shapes(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    with pytest.raises(StatementError, match="table or view 'foo' not found"):
        fb_sql(spark, "copy foo to bar;", catalog=cat)  # defs_copy.go:34-40
    fb_sql(spark, "create table copytest (_id id, id_col id, string_col string, "
           "int_col int, bool_col bool)", catalog=cat)
    fb_sql(spark, "insert into copytest values (1, 10, 'foo', 10, false), "
           "(2, 11, 'foo1', 11, true), (3, 12, 'foo2', 12, false), "
           "(4, 13, 'foo3', 13, true)", catalog=cat)
    with pytest.raises(StatementError, match="already exists"):
        fb_sql(spark, "copy copytest to copytest;", catalog=cat)  # :42-47
    fb_sql(spark, "copy copytest to copytesttwo;", catalog=cat)  # :48-56
    src = sorted(map(tuple, fb_sql(spark, "select * from copytest",
                                   catalog=cat).collect()))
    dst = sorted(map(tuple, fb_sql(spark, "select * from copytesttwo",
                                   catalog=cat).collect()))
    assert src == dst and len(dst) == 4
    cat.drop_table("copytest")
    cat.drop_table("copytesttwo")


# --- defs_select.go: hyphenated table names (scanner.go:338-339) -------------


def test_golden_select_hyphenated_table(spark):
    """The reference lexes '-' as an identifier character, so ``un-keyed``
    is a legal table name (defs_select.go "table-with-hyphens"); the Spark
    engine mangles it at the view boundary (schema.spark_view_name)."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table un-keyed (_id id, an_int int min 0 max 100, "
           "an_id id, a_string string, a_string_set stringset)", catalog=cat)
    fb_sql(spark, "insert into un-keyed values "
           "(1, 11, 101, 'str1', ['a1', 'b1', 'c1']), "
           "(2, 22, 201, 'str2', ['a2', 'b2', 'c2']), "
           "(3, 33, 301, 'str3', ['a3', 'b3', 'c3']), "
           "(4, 44, 401, 'str4', ['a4', 'b4', 'c4'])", catalog=cat)
    rows = {r["_id"]: r for r in
            fb_sql(spark, "select * from un-keyed", catalog=cat).collect()}
    assert set(rows) == {1, 2, 3, 4} and rows[2]["a_string"] == "str2"
    # projection spelling (defs_select.go:31)
    assert fb_sql(spark, "select _id, an_int, an_id, a_string, a_string_set "
                  "from un-keyed", catalog=cat).count() == 4
    # select *, extra alias (defs_select.go:52-70)
    r = fb_sql(spark, "select *, an_int AS foo from un-keyed where _id = 1",
               catalog=cat).first()
    assert r["foo"] == 11 and r["an_int"] == 11
    # original spelling survives in SHOW (user-facing surfaces unmangled)
    assert "un-keyed" in cat.show_tables()
    cat.drop_table("un-keyed")


def test_golden_select_keyed_and_between(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table selectkeyed (_id string, an_int int min 0 max 100, "
           "a_string string)", catalog=cat)
    fb_sql(spark, "insert into selectkeyed values ('user1', 11, 'str1'), "
           "('user2', 22, 'str2'), ('user3', 33, 'str3'), ('user4', 44, 'str4')",
           catalog=cat)
    # keyed point lookup (defs_select.go:94-113)
    r = fb_sql(spark, "select * from selectkeyed where _id = 'user1'",
               catalog=cat).first()
    assert (r["_id"], r["an_int"], r["a_string"]) == ("user1", 11, "str1")
    # BETWEEN over the keyed table (defs_select.go:132-147)
    got = sorted((r["_id"], r["an_int"]) for r in fb_sql(
        spark, "select _id,an_int from selectkeyed where an_int between 22 AND 33",
        catalog=cat).collect())
    assert got == [("user2", 22), ("user3", 33)]
    cat.drop_table("selectkeyed")


# --- defs_unkeyed.go ---------------------------------------------------------


def test_golden_unkeyed_selects(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table unkeyed (_id id, an_int int min 0 max 100, "
           "an_id_set idset, an_id id, a_string string, a_string_set stringset)",
           catalog=cat)
    fb_sql(spark, "insert into unkeyed values "
           "(1, 11, [11, 12, 13], 101, 'str1', ['a1', 'b1', 'c1']), "
           "(2, 22, [21, 22, 23], 201, 'str2', ['a2', 'b2', 'c2']), "
           "(3, 33, [31, 32, 33], 301, 'str3', ['a3', 'b3', 'c3']), "
           "(4, 44, [41, 42, 43], 401, 'str4', ['a4', 'b4', 'c4'])", catalog=cat)
    # select-all, both spellings (defs_unkeyed.go:28-52)
    a = fb_sql(spark, "select * from unkeyed", catalog=cat)
    b = fb_sql(spark, "select _id, an_int, an_id_set, an_id, a_string, "
               "a_string_set from unkeyed", catalog=cat)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 4
    # top(2) (defs_unkeyed.go:53-74)
    assert fb_sql(spark, "select top(2) * from unkeyed", catalog=cat).count() == 2
    # where on each scalar field type (defs_unkeyed.go:75-97)
    for cond in ("an_int = 22", "a_string = 'str2'", "an_id = 201"):
        rows = fb_sql(spark, f"select * from unkeyed where {cond}",
                      catalog=cat).collect()
        assert len(rows) == 1 and rows[0]["_id"] == 2, cond
    cat.drop_table("unkeyed")


# --- defs_minmaxnegative.go --------------------------------------------------


def test_golden_minmax_negative(spark):
    """Negative-range int constraints round-trip their STORED values.
    (The reference's own ExpRows here are wrong — its TODO at
    defs_minmaxnegative.go:34-39 says the correct results are the inserted
    values; this mirror asserts the corrected ones.)"""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table minmaxnegatives (_id id, "
           "positive_int int min 10 max 100, negative_int int min -100 max -10)",
           catalog=cat)
    fb_sql(spark, "insert into minmaxnegatives values (1, 11, -11), "
           "(2, 22, -22), (3, 33, -33)", catalog=cat)
    got = sorted(map(tuple, fb_sql(spark, "select * from minmaxnegatives",
                                   catalog=cat).collect()))
    assert got == [(1, 11, -11), (2, 22, -22), (3, 33, -33)]
    # constraint edges: below min / above max of the negative range
    with pytest.raises(StatementError, match=re.escape(
            "value '-101' out of range")):
        fb_sql(spark, "insert into minmaxnegatives (_id, negative_int) "
               "values (4, -101)", catalog=cat)
    with pytest.raises(StatementError, match=re.escape("value '-9' out of range")):
        fb_sql(spark, "insert into minmaxnegatives (_id, negative_int) "
               "values (4, -9)", catalog=cat)
    cat.drop_table("minmaxnegatives")


# --- defs_sql1.go: grouper/joiner corpus (the reference's oldest SQL suite) --


@pytest.fixture(scope="module")
def sql1_cat(spark):
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    # column order alphabetical after _id so `select *` matches the
    # reference's Extract header order (defs_sql1.go:109-146)
    fb_sql(spark, "create table grouper (_id id, age int min 0 max 100, "
           "color string, height int min 0 max 1000, "
           "score int min -1000 max 1000, timestamp timestamp)", catalog=cat)
    rows = [
        (1, 27, "'blue'", 20, -10, "2011-04-02T12:32:00Z"),
        (2, 16, "'blue'", 30, -8, "2011-01-02T12:32:00Z"),
        (3, 19, "'red'", 40, 6, "2012-01-02T12:32:00Z"),
        (4, 27, "'green'", 50, 0, "2013-09-02T12:32:00Z"),
        (5, 16, "'blue'", 60, -2, "2014-01-02T12:32:00Z"),
        (6, 34, "'blue'", 70, 100, "2010-05-02T12:32:00Z"),
        (7, 27, "'blue'", 80, 0, "2016-08-02T12:32:00Z"),
        (8, 16, "null", 90, -13, "2020-01-02T12:32:00Z"),
        (9, 16, "'red'", 100, 80, "2000-03-02T12:32:00Z"),
        (10, 31, "'red'", 110, -2, "2018-01-02T12:32:00Z"),
    ]
    fb_sql(spark, "insert into grouper values " + ", ".join(
        f"({i}, {a}, {c}, {h}, {s}, '{t}')" for i, a, c, h, s, t in rows),
        catalog=cat)
    fb_sql(spark, "create table joiner (_id id, grouperid int min 0 max 1000, "
           "jointype int min -1000 max 1000)", catalog=cat)
    jrows = [(1, 1, 1), (2, 2, 1), (3, 5, 1), (4, 6, 1), (5, 7, 1),
             (6, 3, 2), (7, 8, 2), (8, 9, 2), (9, 1, 3), (10, 2, 3)]
    fb_sql(spark, "insert into joiner values " + ", ".join(
        f"({i}, {g}, {j})" for i, g, j in jrows), catalog=cat)
    fb_sql(spark, "create table delete_me (_id id, unused int)", catalog=cat)
    fb_sql(spark, "insert into delete_me values (1, 1)", catalog=cat)
    yield cat
    for t in ("grouper", "joiner", "delete_me"):
        cat.drop_table(t, if_exists=True)


def test_golden_sql1_projections(spark, sql1_cat):
    cat = sql1_cat
    # select one column — 10 values as a multiset (defs_sql1.go:87-106)
    got = sorted(r["age"] for r in
                 fb_sql(spark, "select age from grouper;", catalog=cat).collect())
    assert got == [16, 16, 16, 16, 19, 27, 27, 27, 31, 34]
    # select * point lookup (defs_sql1.go:107-122)
    r = fb_sql(spark, "select * from grouper where _id=2;", catalog=cat).first()
    assert list(r.asDict())[:5] == ["_id", "age", "color", "height", "score"]
    assert (r["_id"], r["age"], r["color"], r["height"], r["score"]) == (
        2, 16, "blue", 30, -8)
    assert r["timestamp"] == datetime.datetime(2011, 1, 2, 12, 32, 0)
    # full select * (defs_sql1.go:123-147)
    rows = {r["_id"]: r for r in
            fb_sql(spark, "select * from grouper;", catalog=cat).collect()}
    assert len(rows) == 10 and rows[8]["color"] is None
    assert rows[9]["height"] == 100 and rows[10]["score"] == -2


def test_golden_sql1_joins(spark, sql1_cat):
    # DIVERGENCE (documented in COVERAGE.md): the reference binds an
    # unqualified column that exists in BOTH join inputs to the leftmost
    # table (defs_sql1.go:160-195 selects bare `_id`); Spark is
    # ANSI-strict and rejects it as ambiguous, so the mirror qualifies.
    cat = sql1_cat
    assert fb_sql(spark, "select count(*) from grouper g INNER JOIN joiner j "
                  "ON g._id = j.grouperid;", catalog=cat).first()[0] == 10
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select distinct g._id from grouper g INNER JOIN joiner j "
        "ON g._id = j.grouperid;", catalog=cat).collect())
    assert got == [1, 2, 3, 5, 6, 7, 8, 9]
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select g._id from grouper g INNER JOIN joiner j "
        "ON g._id = j.grouperid where g.color = 'red';", catalog=cat).collect())
    assert got == [3, 9]
    got = sorted(r["_id"] for r in fb_sql(
        spark, "select g._id from grouper g INNER JOIN joiner j "
        "ON g._id = j.grouperid where g.color = 'red' and j.jointype = 2;",
        catalog=cat).collect())
    assert got == [3, 9]


def test_golden_sql1_and_expr_permutations(spark, sql1_cat):
    # extract.go AndExpr path permutations (defs_sql1.go:503-533): the same
    # conjunction with predicates in every table order resolves identically
    for where in (
        "g.color = 'red' and j.jointype = 2 and g.age = 16",
        "j.jointype = 2 and g.color = 'red' and g.age = 16",
        "g.color = 'red' and g.age = 16 and j.jointype = 2",
    ):
        got = [r["_id"] for r in fb_sql(
            spark, f"select g._id from grouper g INNER JOIN joiner j "
            f"ON g._id = j.grouperid where {where};", catalog=sql1_cat).collect()]
        assert got == [9], where


def test_golden_sql1_distinct_orderby(spark, sql1_cat):
    cat = sql1_cat
    asc = [r["score"] for r in fb_sql(
        spark, "select distinct score from grouper order by score asc;",
        catalog=cat).collect()]
    assert asc == [-13, -10, -8, -2, 0, 6, 80, 100]
    desc = [r["score"] for r in fb_sql(
        spark, "select distinct score from grouper order by score desc;",
        catalog=cat).collect()]
    assert desc == asc[::-1]
    hs = sorted(r["height"] for r in fb_sql(
        spark, "select distinct height from grouper;", catalog=cat).collect())
    assert hs == [20, 30, 40, 50, 60, 70, 80, 90, 100, 110]


def test_golden_sql1_groupby(spark, sql1_cat):
    got = {r["yrs"]: r["cnt"] for r in fb_sql(
        spark, "select age as yrs, count(*) as cnt from grouper group by age;",
        catalog=sql1_cat).collect()}
    assert got == {16: 4, 19: 1, 27: 3, 31: 1, 34: 1}


def test_golden_sql1_timestamp_filters(spark, sql1_cat):
    cat = sql1_cat
    got = sorted(map(tuple, fb_sql(
        spark, "select age, height from grouper where "
        "timestamp > '2017-09-02T12:32:00Z' and height > 40 "
        "group by age, height;", catalog=cat).collect()))
    assert got == [(16, 90), (31, 110)]
    got = sorted(map(tuple, fb_sql(
        spark, "select age, height from grouper where "
        "timestamp > '2017-09-02T12:32:00Z' or height > 90;",
        catalog=cat).collect()))
    assert got == [(16, 90), (16, 100), (31, 110)]
    for q in (
        "select age, height from grouper where timestamp > "
        "'2017-09-02T12:32:00Z' and timestamp < '2019-09-02T12:32:00Z';",
        "select age, height from grouper where (timestamp > "
        "'2017-09-02T12:32:00Z' and timestamp < '2019-09-02T12:32:00Z');",
    ):
        got = [tuple(r) for r in fb_sql(spark, q, catalog=cat).collect()]
        assert got == [(31, 110)], q
    got = [r["age"] for r in fb_sql(
        spark, "select distinct age from grouper where "
        "timestamp > '2019-09-02T12:32:00Z';", catalog=cat).collect()]
    assert got == [16]


def test_golden_sql1_empty_where_parens(spark, sql1_cat):
    # defs_sql1.go:434-437
    with pytest.raises(ValueError, match=re.escape("expected expression, found")):
        fb_sql(spark, "select age, height from grouper where ();",
               catalog=sql1_cat)


def test_golden_sql1_show(spark, sql1_cat):
    cat = sql1_cat
    names = {r["name"] for r in
             fb_sql(spark, "show tables;", catalog=cat).collect()}
    assert {"grouper", "joiner", "delete_me"} <= names  # ComparePartial
    # r12: the SHOW COLUMNS door serves the reference wire shape
    # (sql_complex_test.go:364-392) — the type column is 'type'
    cols = [(r["name"], r["type"]) for r in
            fb_sql(spark, "show columns from grouper;", catalog=cat).collect()]
    assert [c for c in cols if c[0] != "_id"] == [
        ("age", "int"), ("color", "string"), ("height", "int"),
        ("score", "int"), ("timestamp", "timestamp")]


SQL1_ERR_CASES = [
    ("select * from index_not_found;",
     "table or view 'index_not_found' not found"),
    ("select field_not_found from grouper;", "column 'field_not_found' not found"),
    ("select * from grouper, index_not_found;",
     "table or view 'index_not_found' not found"),
    ("select _id, age, field_not_found from grouper;",
     "column 'field_not_found' not found"),
    ("select age, color, count(*) from grouper group by field_not_found, age, color;",
     "column 'field_not_found' not found"),
    ("select count(*) from grouper inner join joiner on "
     "grouper._id = joiner.field_not_found;",
     "column 'field_not_found' not found"),
]


@pytest.mark.parametrize(
    "sql,err", SQL1_ERR_CASES, ids=[c[0][:55] for c in SQL1_ERR_CASES]
)
def test_golden_sql1_errors(spark, sql1_cat, sql, err):
    # analyzer error phrasing parity (defs_sql1.go:534-556; sql3/errors.go)
    with pytest.raises(ValueError, match=re.escape(err)):
        fb_sql(spark, sql, catalog=sql1_cat)


def test_golden_select_hyphenated_column(spark):
    """'-' is an identifier char in the reference lexer (scanner.go:
    338-339), for COLUMNS too. Expression position emits the column
    backtick-quoted for Spark (physical DataFrame columns keep the
    hyphenated spelling); table position still mangles to the Spark-safe
    view name. Spaced '-' stays subtraction, as in the reference."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table hyphcol (_id id, a-int int min 0 max 100, "
           "b string)", catalog=cat)
    fb_sql(spark, "insert into hyphcol (_id, a-int, b) values "
           "(1, 11, 'x'), (2, 22, 'y')", catalog=cat)
    r = fb_sql(spark, "select _id, a-int, b from hyphcol where a-int > 15",
               catalog=cat).collect()
    assert len(r) == 1 and r[0]["a-int"] == 22
    assert [x["a-int"] for x in fb_sql(
        spark, "select a-int from hyphcol order by a-int desc",
        catalog=cat).collect()] == [22, 11]
    # spaced '-' is still subtraction
    assert fb_sql(spark, "select a-int - 1 as m from hyphcol where _id = 1",
                  catalog=cat).first()["m"] == 10
    assert fb_sql(spark, "select sum(a-int) as s from hyphcol",
                  catalog=cat).first()["s"] == 33
    fb_sql(spark, "delete from hyphcol where a-int > 15", catalog=cat)
    assert spark.table("hyphcol").count() == 1
    cat.drop_table("hyphcol")


# --- defs_keyed.go: string-keyed table, set fields, full PQL battery -------


@pytest.fixture(scope="module")
def keyed_table(spark):
    """defs_keyed.go:6-27 — the 'keyed' table after both srcRows batches
    (6 string-keyed records with IDSET/ID/STRING/STRINGSET fields)."""
    rows = [
        ("one", 11, [11, 12, 13], 101, "str1", ["a1", "b1", "c1"]),
        ("two", 22, [11, 12, 23], 201, "str2", ["a2", "b2", "c2"]),
        ("three", 33, [11, 32, 33], 301, "str3", ["a3", "b3", "c3"]),
        ("four", 44, [41, 42, 43], 401, "str4", ["a4", "b4", "c4"]),
        ("five", 55, [51, 52, 53], 501, "str5", ["a5", "b5", "c5"]),
        ("six", 66, [61, 62, 63], 601, "str6", ["a6", "b6", "c6"]),
    ]
    df = spark.createDataFrame(
        rows,
        "_id string, an_int long, an_id_set array<long>, an_id long, "
        "a_string string, a_string_set array<string>",
    )
    df.createOrReplaceTempView("keyed")
    return df


def test_golden_keyed_select(spark, keyed_table):
    """defs_keyed.go select-all / select-all-with-top /
    select-all-with-where (SQL side, verbatim dialect text)."""
    r = fb_sql(spark, "select * from keyed").collect()
    assert len(r) == 6
    by_id = {x["_id"]: x for x in r}
    assert by_id["two"]["an_id_set"] == [11, 12, 23]
    assert by_id["six"]["a_string_set"] == ["a6", "b6", "c6"]
    # explicit column list is the same result
    r2 = fb_sql(
        spark,
        "select _id, an_int, an_id_set, an_id, a_string, a_string_set "
        "from keyed",
    ).collect()
    assert {x["_id"] for x in r2} == set(by_id)
    # top(2): CompareIncludedIn with ExpRowCount=2
    top = fb_sql(spark, "select top(2) * from keyed").collect()
    assert len(top) == 2 and {x["_id"] for x in top} <= set(by_id)
    # where on int / string / id fields all select record 'two'
    for q in (
        "select * from keyed where an_int = 22",
        "select * from keyed where a_string = 'str2'",
        "select * from keyed where an_id = 201",
    ):
        got = fb_sql(spark, q).collect()
        assert len(got) == 1 and got[0]["_id"] == "two", q


def test_golden_keyed_pql(spark, keyed_table):
    """defs_keyed.go PQLTests, run VERBATIM through the PQL text parser
    over the string-keyed index (executor.go keyed dispatch;
    translate.go key translation is a no-op on Spark — string _id needs
    no id mapping). Expected values are the reference's ExpRows.

    One documented divergence: MinRow/MaxRow's `count` — the reference's
    cross-shard reduce keeps the count of the WINNING SHARD only
    (executor.go:1618-1638 reduceFn carries one PairField through), so
    defs_keyed.go expects count=1 for minrow even though row 11 has 3
    member records; our MinRow returns the GLOBAL count (3), a
    shard-layout-independent superset documented in pql/calls.py. Row
    ids — the stable part — must match exactly."""
    from featurebase_spark.pql import Index
    from featurebase_spark.pql.parser import execute

    # the reference's PQLTests run against the FIRST srcRows batch (the
    # second batch exists only for the SQL tests' ExpRowsPlus1 variants)
    idx = Index(
        keyed_table.where("_id in ('one', 'two', 'three', 'four')")
    )

    def rows(pql):
        return [tuple(r) for r in execute(idx, pql).collect()]

    # minrow/maxrow (defs_keyed.go:113-133): (11, ·) and (43, ·)
    assert rows("MinRow(field=an_id_set)")[0][0] == 11
    assert rows("MaxRow(field=an_id_set)")[0][0] == 43
    # topk (defs_keyed.go:135-146)
    assert rows("TopK(an_id_set, k=2)") == [(11, 3), (12, 2)]
    # rows (defs_keyed.go:162-181)
    assert rows("Rows(field=an_id_set)") == [
        (11,), (12,), (13,), (23,), (32,), (33,), (41,), (42,), (43,),
    ]
    # includescolumn (defs_keyed.go:182-191)
    assert rows("IncludesColumn(Row(an_id_set=12), column='two')") == [
        (True,)
    ]
    # constrow + extract (defs_keyed.go:193-204)
    assert rows("Extract(ConstRow(columns=['two']), Rows(an_id))") == [
        ("two", 201)
    ]
    # fieldvalue (defs_keyed.go:206-216): (33, count 1)
    assert rows("FieldValue(field=an_int, column='three')")[0][0] == 33
    # unionrows (defs_keyed.go:218-226): all 4 records carry a value
    assert rows("Count(UnionRows(Rows(field=an_id_set)))") == [(4,)]


def test_golden_keyed_insert(spark):
    """defs_keyed_insert.go: INSERT with a string _id and every scalar +
    set type; readback must round-trip."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(
        spark,
        "create table testkeyedinsert (_id string, a int min 0 max 1000, "
        "b int min 0 max 1000, s string, bl bool, d decimal(2), "
        "event stringset, ievent idset)",
        catalog=cat,
    )
    fb_sql(
        spark,
        "insert into testkeyedinsert (_id, a, b, s, bl, d, event, ievent) "
        "values ('four', 40, 400, 'foo', false, 10.12, ['A', 'B', 'C'], "
        "[1, 2, 3])",
        catalog=cat,
    )
    r = fb_sql(spark, "select * from testkeyedinsert", catalog=cat).collect()
    assert len(r) == 1
    row = r[0]
    assert row["_id"] == "four" and row["a"] == 40 and row["b"] == 400
    assert row["s"] == "foo" and row["bl"] is False
    assert float(row["d"]) == 10.12
    assert row["event"] == ["A", "B", "C"] and row["ievent"] == [1, 2, 3]
    cat.drop_table("testkeyedinsert")


# --- defs_timequantum.go: SETQ insert typing + RANGEQ analyzer errors ------


def test_golden_timequantum_inserts(spark):
    """defs_timequantum.go:14-120 — the full INSERT matrix for
    time-quantum set columns: plain set literals are valid (stamped
    time.Now(), opinsert.go:172), `{ts, [..]}` tuples stamp the given
    epoch-int or timestamp string, and every mismatch raises the
    reference's EXACT error text. The two rangeq CONTENT cases
    (stringset-rangeq / idset-rangeq) are deliberately not mirrored:
    their ExpRows depend on wall-clock now()-stamped writes and the
    existing-view clamp of `to` (field.go:1063-1110), i.e. on WHEN the
    suite runs — not a stable cross-engine contract."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(
        spark,
        "create table time_quantum_insert (_id id, i1 int min 0 max 1000, "
        "ss1 stringsetq timequantum 'YMD', ids1 idsetq timequantum 'YMD')",
        catalog=cat,
    )
    ok = [
        "insert into time_quantum_insert (_id, i1, ss1, ids1) "
        "values (1, 1, ['1'], [1])",
        "insert into time_quantum_insert (_id, i1, ss1, ids1) "
        "values (1, 1, {1676649734, ['1']}, {1676649734, [1]})",
        "insert into time_quantum_insert(_id, i1, ss1, ids1) "
        "values (1, 3, ['test1'], [1])",
        "insert into time_quantum_insert(_id, i1, ss1, ids1) "
        "values (1, 3, {1676649734, ['test2']}, {1676649734, [2]})",
        "insert into time_quantum_insert(_id, i1, ss1, ids1) "
        "values (1, 3, {'2022-01-01T00:00:00Z', ['test3']}, "
        "{'2022-01-01T00:00:00Z', [3]})",
    ]
    for q in ok:
        fb_sql(spark, q, catalog=cat)
    # the upserted record carries the LAST write's quantum pairs; the
    # SQL surface projects a setq column as its VALUE SET (r13 —
    # defs_set_functions.go 'set-contains-select-list' semantics), the
    # raw (value, ts) entries stay on the storage view
    row = fb_sql(
        spark, "select ss1, ids1 from time_quantum_insert", catalog=cat
    ).first()
    assert row["ss1"] == ["test3"]
    assert row["ids1"] == [3]
    raw = spark.table("time_quantum_insert").first()
    assert raw["ids1"][0]["value"] == 3
    assert str(raw["ids1"][0]["ts"]).startswith("2022-01-01")

    err = [
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, {['1']}, {[1]})",
         "an expression of type 'tuple(stringset)' cannot be assigned "
         "to type 'stringsetq'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, ['1'], {[1]})",
         "an expression of type 'tuple(idset)' cannot be assigned "
         "to type 'idsetq'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, {'notatimestamp', ['1']}, [1])",
         "unable to convert 'notatimestamp' to type 'timestamp'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, ['1'], {'notatimestamp', [1]})",
         "unable to convert 'notatimestamp' to type 'timestamp'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, {'2022-01-01T00:00:00Z', [1]}, {[1]})",
         "an expression of type 'tuple(string, idset)' cannot be "
         "assigned to type 'stringsetq'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, ['1'], {'2022-01-01T00:00:00Z', ['1']})",
         "an expression of type 'tuple(string, stringset)' cannot be "
         "assigned to type 'idsetq'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, '1', {[1]})",
         "an expression of type 'string' cannot be assigned to type "
         "'stringsetq'"),
        ("insert into time_quantum_insert (_id, i1, ss1, ids1) "
         "values (1, 1, ['1'], 1)",
         "an expression of type 'int' cannot be assigned to type "
         "'idsetq'"),
    ]
    for q, msg in err:
        with pytest.raises(StatementError) as ei:
            fb_sql(spark, q, catalog=cat)
        assert msg in str(ei.value), q
    cat.drop_table("time_quantum_insert")


def test_golden_timequantum_rangeq_errors(spark):
    """defs_timequantum.go:122-147 — the RANGEQ analyzer error surface,
    exact texts (typo 'ranqeq' included, inbuiltfunctionsquantum.go)."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(
        spark,
        "create table tq_rangeq (_id id, i1 int min 0 max 1000, "
        "ss1 stringsetq timequantum 'YMD')",
        catalog=cat,
    )
    cases = [
        ("select a._id, a.ss1 from tq_rangeq a "
         "where rangeq(a.ss1, '2022-01-02T00:00:00Z')",
         "'rangeq': count of formal parameters (3) does not match count "
         "of actual parameters (2)"),
        ("select a._id, a.ss1 from tq_rangeq a "
         "where rangeq(a.ss1, null, null)",
         "calling ranqeq() 'from' and 'to' parameters cannot both be "
         "null"),
        ("select a._id, a.ss1, rangeq(a.ss1, '2022-01-02T00:00:00Z', "
         "null) from tq_rangeq a",
         "calling ranqeq() usage invalid"),
    ]
    for q, msg in cases:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q, catalog=cat)
        assert msg in str(ei.value), q
    cat.drop_table("tq_rangeq")


# --- defs_binops.go mixed-type matrices (r9): the 64-matrix type-rule
# corpus — value cases that agree engine-to-engine, plus the reference's
# exact compile errors now raised by sql.py's _binop_type_guard for
# column-op-column expressions (Spark would otherwise silently coerce
# int < string, bool < bool, int = timestamp ...).


@pytest.fixture(scope="module")
def binop_mixed_tables(spark):
    import decimal as _dec

    spark.createDataFrame(
        [(1, 20, _dec.Decimal("12.34"))], "_id LONG, a LONG, d DECIMAL(4,2)"
    ).createOrReplaceTempView("binoptesti_d")
    spark.createDataFrame(
        [(1, True, True, False)], "_id LONG, a BOOLEAN, b BOOLEAN, c BOOLEAN"
    ).createOrReplaceTempView("binoptestb_b")
    spark.createDataFrame(
        [(1, 20, datetime.datetime(2012, 11, 1, 22, 8, 41))],
        "_id LONG, a LONG, ts TIMESTAMP",
    ).createOrReplaceTempView("binoptesti_ts")
    spark.createDataFrame(
        [(1, "foo", "101")], "_id LONG, a STRING, b STRING"
    ).createOrReplaceTempView("binoptests_s")
    spark.createDataFrame(
        [(10, 20)], "_id LONG, b LONG"
    ).createOrReplaceTempView("binoptestid_id")
    spark.createDataFrame(
        [(1, 10, "20")], "_id LONG, a LONG, b STRING"
    ).createOrReplaceTempView("binoptesti_s")
    return spark


BINOP_MIXED_VALUES = [
    # binoptesti_d: a=20, d=12.34 (defs_binops.go:589-760)
    ("select a != d from binoptesti_d;", True),
    ("select a = d from binoptesti_d;", False),
    ("select a <= d from binoptesti_d;", False),
    ("select a >= d from binoptesti_d;", True),
    ("select a < d from binoptesti_d;", False),
    ("select a > d from binoptesti_d;", True),
    # binoptestb_b: a=true b=true c=false (defs_binops.go:1322-1494)
    ("select a != b from binoptestb_b;", False),
    ("select a = b from binoptestb_b;", True),
    ("select a AND b from binoptestb_b;", True),
    ("select a OR b from binoptestb_b;", True),
    ("select a AND c from binoptestb_b;", False),
    ("select a OR c from binoptestb_b;", True),
    # binoptests_s: a='foo' b='101' (defs_binops.go:6916-7045)
    ("select a != b from binoptests_s;", True),
    ("select a = b from binoptests_s;", False),
    # binoptestid_id: _id=10, b=20 (defs_binops.go:2479-2704)
    ("select _id & b from binoptestid_id;", 0),
    ("select _id | b from binoptestid_id;", 30),
    ("select _id << b from binoptestid_id;", 10485760),
    ("select _id >> b from binoptestid_id;", 0),
    ("select _id + b from binoptestid_id;", 30),
    ("select _id - b from binoptestid_id;", -10),
    ("select _id * b from binoptestid_id;", 200),
    ("select _id % b from binoptestid_id;", 10),
]


@pytest.mark.parametrize(
    "sql,expected",
    BINOP_MIXED_VALUES,
    ids=[c[0][:50] for c in BINOP_MIXED_VALUES],
)
def test_golden_binop_mixed_values(binop_mixed_tables, sql, expected):
    assert fb_sql(binop_mixed_tables, sql).first()[0] == expected


def test_golden_binop_decimal_arithmetic(binop_mixed_tables):
    import decimal as _dec

    # 20 + 12.34 = 32.34 / 20 - 12.34 = 7.66 / 20 * 12.34 = 246.80
    # (defs_binops.go pql.NewDecimal(3234,2)/(766,2)/(24680,2))
    for sql, want in [
        ("select a + d from binoptesti_d;", _dec.Decimal("32.34")),
        ("select a - d from binoptesti_d;", _dec.Decimal("7.66")),
        ("select a * d from binoptesti_d;", _dec.Decimal("246.80")),
    ]:
        assert fb_sql(binop_mixed_tables, sql).first()[0] == want


def test_golden_string_concat_value(binop_mixed_tables):
    # 'foo' || '101' = 'foo101' (defs_binops.go:7040, row("foo101"))
    assert (
        fb_sql(
            binop_mixed_tables, "select a || b from binoptests_s;"
        ).first()[0]
        == "foo101"
    )


BINOP_MIXED_ERRORS = [
    # binoptesti_d: bitwise/shift/mod refuse decimal; || refuses int
    ("select a & d from binoptesti_d;",
     "operator '&' incompatible with type 'decimal(2)'"),
    ("select a | d from binoptesti_d;",
     "operator '|' incompatible with type 'decimal(2)'"),
    ("select a << d from binoptesti_d;",
     "operator '<<' incompatible with type 'decimal(2)'"),
    ("select a >> d from binoptesti_d;",
     "operator '>>' incompatible with type 'decimal(2)'"),
    ("select a % d from binoptesti_d;",
     "operator '%' incompatible with type 'decimal(2)'"),
    ("select a || d from binoptesti_d;",
     "operator '||' incompatible with type 'int'"),
    # binoptestb_b: bool has no ordering and no arithmetic
    ("select a <= b from binoptestb_b;",
     "operator '<=' incompatible with type 'bool'"),
    ("select a >= b from binoptestb_b;",
     "operator '>=' incompatible with type 'bool'"),
    ("select a < b from binoptestb_b;",
     "operator '<' incompatible with type 'bool'"),
    ("select a > b from binoptestb_b;",
     "operator '>' incompatible with type 'bool'"),
    ("select a & b from binoptestb_b;",
     "operator '&' incompatible with type 'bool'"),
    ("select a + b from binoptestb_b;",
     "operator '+' incompatible with type 'bool'"),
    ("select a * b from binoptestb_b;",
     "operator '*' incompatible with type 'bool'"),
    # binoptesti_ts: int never equates/compares with timestamp; no
    # timestamp arithmetic; || cites the int (left-first rule)
    ("select a != ts from binoptesti_ts;",
     "types 'int' and 'timestamp' are not equatable"),
    ("select a = ts from binoptesti_ts;",
     "types 'int' and 'timestamp' are not equatable"),
    ("select a <= ts from binoptesti_ts;",
     "types 'int' and 'timestamp' are not equatable"),
    ("select a < ts from binoptesti_ts;",
     "types 'int' and 'timestamp' are not equatable"),
    ("select a & ts from binoptesti_ts;",
     "operator '&' incompatible with type 'timestamp'"),
    ("select a + ts from binoptesti_ts;",
     "operator '+' incompatible with type 'timestamp'"),
    ("select a - ts from binoptesti_ts;",
     "operator '-' incompatible with type 'timestamp'"),
    ("select a * ts from binoptesti_ts;",
     "operator '*' incompatible with type 'timestamp'"),
    ("select a / ts from binoptesti_ts;",
     "operator '/' incompatible with type 'timestamp'"),
    ("select a % ts from binoptesti_ts;",
     "operator '%' incompatible with type 'timestamp'"),
    ("select a || ts from binoptesti_ts;",
     "operator '||' incompatible with type 'int'"),
    # binoptests_s: strings equate and concat but never order or do math
    ("select a <= b from binoptests_s;",
     "operator '<=' incompatible with type 'string'"),
    ("select a < b from binoptests_s;",
     "operator '<' incompatible with type 'string'"),
    ("select a + b from binoptests_s;",
     "operator '+' incompatible with type 'string'"),
    ("select a / b from binoptests_s;",
     "operator '/' incompatible with type 'string'"),
    ("select a % b from binoptests_s;",
     "operator '%' incompatible with type 'string'"),
    # binoptesti_s: int and string are not equatable at all
    ("select a != b from binoptesti_s;",
     "types 'int' and 'string' are not equatable"),
    ("select a = b from binoptesti_s;",
     "types 'int' and 'string' are not equatable"),
    ("select a < b from binoptesti_s;",
     "operator '<' incompatible with type 'string'"),
    # binoptestid_id: id concatenation refused, cites 'id'
    ("select _id || b from binoptestid_id;",
     "operator '||' incompatible with type 'id'"),
]


@pytest.mark.parametrize(
    "sql,err",
    BINOP_MIXED_ERRORS,
    ids=[c[0][:50] for c in BINOP_MIXED_ERRORS],
)
def test_golden_binop_type_errors(binop_mixed_tables, sql, err):
    """The reference's exact binop compile-error texts (defs_binops.go
    ExpErr), raised by the dialect's column-op-column type guard where
    Spark would silently coerce."""
    import re as _re2

    with pytest.raises(ValueError, match=_re2.escape(err)):
        fb_sql(binop_mixed_tables, sql)


def test_binop_guard_leaves_literals_to_spark(binop_mixed_tables):
    """Conservative scope: literal operands keep Spark's coercion
    semantics (ts >= '1993-07-01' style predicates all over the TPC-H
    keys must keep working) — only column-op-column fires the guard."""
    assert (
        fb_sql(
            binop_mixed_tables,
            "select ts >= '2012-01-01' from binoptesti_ts;",
        ).first()[0]
        is True
    )
    # BETWEEN's AND is never treated as a binop
    assert (
        fb_sql(
            binop_mixed_tables,
            "select a between 10 and 30 from binoptesti_d;",
        ).first()[0]
        is True
    )


# --- defs_binops.go set-type matrices (idset / stringset) -------------------


@pytest.fixture(scope="module")
def binop_set_tables(spark):
    spark.createDataFrame(
        [(1, [101, 103], [101, 102])],
        "_id LONG, a ARRAY<LONG>, b ARRAY<LONG>",
    ).createOrReplaceTempView("binoptestids_ids")
    spark.createDataFrame(
        [(1, 10, [101, 102])], "_id LONG, a LONG, b ARRAY<LONG>"
    ).createOrReplaceTempView("binoptesti_ids")
    spark.createDataFrame(
        [(1, 10, ["x", "y"])], "_id LONG, a LONG, b ARRAY<STRING>"
    ).createOrReplaceTempView("binoptesti_ss")
    return spark


def test_golden_idset_equality_values(binop_set_tables):
    # {101,103} vs {101,102} (defs_binops.go:5895): != true, = false
    assert (
        fb_sql(
            binop_set_tables, "select a != b from binoptestids_ids;"
        ).first()[0]
        is True
    )
    assert (
        fb_sql(
            binop_set_tables, "select a = b from binoptestids_ids;"
        ).first()[0]
        is False
    )


BINOP_SET_ERRORS = [
    # idset has no ordering, no arithmetic, no bitwise, no concat
    ("select a <= b from binoptestids_ids;",
     "operator '<=' incompatible with type 'idset'"),
    ("select a < b from binoptestids_ids;",
     "operator '<' incompatible with type 'idset'"),
    ("select a & b from binoptestids_ids;",
     "operator '&' incompatible with type 'idset'"),
    ("select a + b from binoptestids_ids;",
     "operator '+' incompatible with type 'idset'"),
    ("select a / b from binoptestids_ids;",
     "operator '/' incompatible with type 'idset'"),
    # int never equates with a set (defs_binops.go:873-985)
    ("select a != b from binoptesti_ids;",
     "types 'int' and 'idset' are not equatable"),
    ("select a = b from binoptesti_ids;",
     "types 'int' and 'idset' are not equatable"),
    ("select a & b from binoptesti_ids;",
     "operator '&' incompatible with type 'idset'"),
    # stringset behaves the same (defs_binops.go:1097-1210)
    ("select a = b from binoptesti_ss;",
     "types 'int' and 'stringset' are not equatable"),
    ("select a < b from binoptesti_ss;",
     "operator '<' incompatible with type 'stringset'"),
    ("select a + b from binoptesti_ss;",
     "operator '+' incompatible with type 'stringset'"),
]


@pytest.mark.parametrize(
    "sql,err",
    BINOP_SET_ERRORS,
    ids=[c[0][:50] for c in BINOP_SET_ERRORS],
)
def test_golden_binop_set_type_errors(binop_set_tables, sql, err):
    import re as _re3

    with pytest.raises(ValueError, match=_re3.escape(err)):
        fb_sql(binop_set_tables, sql)


# --- defs_string_functions.go analyzer/runtime errors (r10): exact
# arity phrasing (name as written in the query), literal type errors,
# and literal value-range errors --------------------------------------------

STRING_FN_ERROR_CASES = [
    # arity — the analyzer echoes the call name AS WRITTEN
    ("select upper('a', 'b')",
     "'upper': count of formal parameters (1) does not match count of "
     "actual parameters (2)"),
    ("SELECT PREFIX('string')",
     "'PREFIX': count of formal parameters (2) does not match count of "
     "actual parameters (1)"),
    ("SELECT SUFFIX('string')",
     "'SUFFIX': count of formal parameters (2) does not match count of "
     "actual parameters (1)"),
    ("select space()",
     "count of formal parameters (1) does not match count of actual "
     "parameters (0)"),
    ("select len()",
     "count of formal parameters (1) does not match count of actual "
     "parameters (0)"),
    ("select ascii()",
     "count of formal parameters (1) does not match count of actual "
     "parameters (0)"),
    # literal type errors
    ("select reverse(22)", "string expression expected"),
    ("select ascii(32)", "string expression expected"),
    ("select upper(1)", "string expression expected"),
    ("select lower(1234)", "string expression expected"),
    ("select trim(1)", "string expression expected"),
    ("select rtrim(1)", "string expression expected"),
    ("select ltrim(1)", "string expression expected"),
    ("select replaceall('test','e',1)", "string expression expected"),
    ("select replicate(1,2)", "string expression expected"),
    ("select replicate('this','this')", "integer expression expected"),
    ("select charindex('is',23,3)", "string expression expected"),
    ("select charindex(1,'this is great',3)", "string expression expected"),
    ("select charindex('is','this is great','you')",
     "integer expression expected"),
    ("select char('R')", "integer expression expected"),
    ("SELECT PREFIX(1,'string')", "string expression expected"),
    ("SELECT SUFFIX(1,'string')", "string expression expected"),
    # literal value-range errors
    ("select char(-1)", "value '-1' out of range"),
    ("select char(256)", "value '256' out of range"),
    ("select ascii('longer')",
     "[0:0] value 'longer' should be of the length 1"),
    ("select substring('testing', -10, 14)",
     "[0:0] value '-10' out of range"),
    ("select substring('testing', -5)", "[0:0] value '-5' out of range"),
    ("SELECT PREFIX('string', 7)", "[0:0] value '7' out of range"),
    ("SELECT PREFIX('string', -1)", "[0:0] value '-1' out of range"),
    ("SELECT SUFFIX('string', 7)", "[0:0] value '7' out of range"),
    ("SELECT SUFFIX('string', -1)", "[0:0] value '-1' out of range"),
]


@pytest.mark.parametrize(
    "sql,msg", STRING_FN_ERROR_CASES,
    ids=[c[0][:50] for c in STRING_FN_ERROR_CASES],
)
def test_golden_string_fn_errors(golden_tables, sql, msg):
    with pytest.raises(ValueError) as ei:
        fb_sql(golden_tables, sql)
    assert msg in str(ei.value), sql


def test_prefix_suffix_runtime_range_nonliteral(golden_tables):
    """Non-literal n routes through the raise_error guard with the
    same text at evaluation time (EvaluatePrefix range check)."""
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="out of range"):
        fb_sql(
            golden_tables,
            "select prefix(a_string, len(a_string) + 1) "
            "from stringscalarfunctions",
        ).collect()
    got = fb_sql(
        golden_tables,
        "select prefix(a_string, len(a_string)) from stringscalarfunctions",
    ).first()[0]
    assert got == "hello"


# --- defs_date_functions.go analyzer errors (r10) ---------------------------

DATE_FN_ERROR_CASES = [
    ("select datetimepart()",
     "count of formal parameters (2) does not match count of actual "
     "parameters (0)"),
    ("select datetimepart(1, 2)",
     "an expression of type 'int' cannot be passed to a parameter of "
     "type 'string'"),
    ("select datetimepart('1', current_timestamp)",
     "invalid value '1' for parameter 'interval'"),
    ("select totimestamp()",
     "'totimestamp': count of formal parameters (2) does not match "
     "count of actual parameters (0)"),
    ("select totimestamp('a')",
     "an expression of type 'string' cannot be passed to a parameter "
     "of type 'int'"),
    ("select totimestamp(1, 2)",
     "an expression of type 'int' cannot be passed to a parameter of "
     "type 'string'"),
    ("select totimestamp(1, 'x')",
     "invalid value 'x' for parameter 'timeunit'"),
    ("select datetimeadd('x',1,current_timestamp)",
     "invalid value 'x' for parameter 'timeunit'"),
    ("select date_trunc('1', current_timestamp)",
     "invalid value '1' for parameter 'interval'"),
    ("select datetimefromparts(12,32,43,34,34,34)",
     "count of formal parameters (7) does not match count of actual "
     "parameters (6)"),
    ("select datetimefromparts(12,32,43,34,34,34,'foo')",
     "an expression of type 'string' cannot be passed to a parameter "
     "of type 'int'"),
    ("select datetimefromparts(10000,1,1,1,1,1,1)",
     "[0:0] not a valid datetimepart 10000"),
    ("select datetimefromparts(2023,2,29,1,1,1,1)",
     "[0:0] not a valid datetimepart 29"),
    ("select datetimefromparts(2023,13,1,1,1,1,1)",
     "[0:0] not a valid datetimepart 13"),
]


@pytest.mark.parametrize(
    "sql,msg", DATE_FN_ERROR_CASES,
    ids=[c[0][:50] for c in DATE_FN_ERROR_CASES],
)
def test_golden_date_fn_errors(golden_tables, sql, msg):
    with pytest.raises(ValueError) as ei:
        fb_sql(golden_tables, sql)
    assert msg in str(ei.value), sql


def test_golden_fromparts_leap_year_ok(golden_tables):
    import datetime as _dt

    got = fb_sql(
        golden_tables, "select datetimefromparts(2024,2,29,1,2,3,4)"
    ).first()[0]
    assert got == _dt.datetime(2024, 2, 29, 1, 2, 3, 4000)


# --- defs_aggregate.go argument analysis + SQL PERCENTILE (r10) -------------


@pytest.fixture(scope="module")
def percentile_tables(spark):
    # d1 is fldTypeDecimal2 in the reference fixture (defs_aggregate.go:
    # 448-466) — modeling it as DECIMAL(10,2) is what exposes the
    # bisection-midpoint semantics (11.50); f1 keeps a double column to
    # pin the float EXTENSION path (no reference dtype)
    spark.sql(
        "SELECT * FROM VALUES "
        "(1L, 10L, CAST(10 AS DECIMAL(10,2)), 'foo', 10.0D), "
        "(2L, 10L, CAST(10 AS DECIMAL(10,2)), 'foo', 10.0D), "
        "(3L, 11L, CAST(11 AS DECIMAL(10,2)), 'foo', 11.0D), "
        "(4L, 12L, CAST(12 AS DECIMAL(10,2)), 'foo', 12.0D), "
        "(5L, 12L, CAST(12 AS DECIMAL(10,2)), 'foo', 12.0D), "
        "(6L, 13L, CAST(13 AS DECIMAL(10,2)), 'foo', 13.0D) "
        "AS t(_id, i1, d1, s1, f1)"
    ).createOrReplaceTempView("percentile_test_g")
    return spark


AGG_ERROR_CASES = [
    # defs_aggregate.go:467-501 (percentile analysis)
    ("SELECT percentile(*) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT percentile(10, i1) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT percentile(_id, 50) AS x FROM percentile_test_g",
     "_id column cannot be used in aggregate function 'percentile'"),
    ("SELECT percentile(i1, d1) AS x FROM percentile_test_g",
     "literal expression expected"),
    # defs_aggregate.go:236-350 (sum/avg), :576-605 (min/max)
    ("SELECT sum(*) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT sum(_id) AS x FROM percentile_test_g",
     "_id column cannot be used in aggregate function 'sum'"),
    ("SELECT sum(i1, d1) AS x FROM percentile_test_g",
     "count of formal parameters (1) does not match count of actual "
     "parameters (2)"),
    ("SELECT avg(*) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT avg(_id) AS x FROM percentile_test_g",
     "_id column cannot be used in aggregate function 'avg'"),
    ("SELECT avg(i1, d1) AS x FROM percentile_test_g",
     "count of formal parameters (1) does not match count of actual "
     "parameters (2)"),
    ("SELECT min(*) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT max(*) AS x FROM percentile_test_g",
     "column reference expected"),
    ("SELECT min(i1, d1) AS x FROM percentile_test_g",
     "count of formal parameters (1) does not match count of actual "
     "parameters (2)"),
    ("SELECT min(_id) AS x FROM percentile_test_g",
     "_id column cannot be used in aggregate function"),
    ("SELECT max(_id) AS x FROM percentile_test_g",
     "_id column cannot be used in aggregate function"),
]


@pytest.mark.parametrize(
    "sql,msg", AGG_ERROR_CASES, ids=[c[0][:48] for c in AGG_ERROR_CASES]
)
def test_golden_agg_arg_errors(percentile_tables, sql, msg):
    with pytest.raises(ValueError) as ei:
        fb_sql(percentile_tables, sql)
    assert msg in str(ei.value), sql


def test_golden_sql_percentile_values(percentile_tables):
    """defs_aggregate.go:505-553 — the reference's EXACT bisection
    percentile through the SQL door. The decimal case is the r11 parity
    fix: percentile(d1, 50) over {10,10,11,12,12,13} is pinned to
    pql.NewDecimal(1150, 2) = 11.50 — the min/max bisection MIDPOINT, a
    value absent from the data (executePercentile, executor.go:
    1310-1603); percentile_disc would wrongly give 11.00. SUPERSET note:
    the reference rejects percentile with non-pushable filters; here any
    WHERE composes."""
    import decimal

    spark = percentile_tables
    cases = [
        ("SELECT percentile(i1, 50) AS p FROM percentile_test_g", 11),
        ("SELECT percentile(d1, 50) AS p FROM percentile_test_g",
         decimal.Decimal("11.50")),
        ("SELECT percentile(i1, 50) AS p FROM percentile_test_g "
         "WHERE i1 < 13", 11),
        # filtered decimal: {10,10,11,12,12}, n=5, dL=dG=2 → a=b=11 →
        # bisection from [10,12]: mid=11 feasible → 11.00
        ("SELECT percentile(d1, 50) AS p FROM percentile_test_g "
         "WHERE d1 < 13", decimal.Decimal("11.00")),
        # float EXTENSION column keeps nearest-rank percentile_disc
        ("SELECT percentile(f1, 50) AS p FROM percentile_test_g", 11.0),
        # value cases that must NOT be rejected by the arg analysis
        ("SELECT sum(1) AS p FROM percentile_test_g", 6),
        ("SELECT min(1) AS p FROM percentile_test_g", 1),
        ("SELECT sum(i1) AS p FROM percentile_test_g", 68),
        ("SELECT sum(d1 + 5) AS p FROM percentile_test_g",
         decimal.Decimal("98.00")),
    ]
    for q, want in cases:
        got = fb_sql(spark, q).first()[0]
        assert got == want, (q, got)


@pytest.fixture(scope="module")
def var_tables(spark):
    spark.createDataFrame(
        [(1, 10, 10.0, "foo", 10), (2, 10, 10.0, "foo", 11),
         (3, 11, 11.0, "foo", 12), (4, 12, 12.0, "foo", 13),
         (5, 12, 12.0, "foo", 14), (6, 13, 13.0, "foo", 15)],
        "_id long, i1 long, d1 double, s1 string, id1 long",
    ).createOrReplaceTempView("var_test_g")
    return spark


def test_golden_var_corr(var_tables):
    """defs_aggregate.go:760-920 — VAR is POPULATION variance at the
    reference's scale-6 decimal; CORR/VAR argument analysis errors."""
    import decimal as _dec

    spark = var_tables
    for q, want in [
        ("SELECT var(i1) AS v FROM var_test_g", _dec.Decimal("1.222222")),
        ("SELECT var(id1) AS v FROM var_test_g", _dec.Decimal("2.916666")),
        ("SELECT var(d1) AS v FROM var_test_g", _dec.Decimal("1.222222")),
        ("SELECT var(len(s1)) AS v FROM var_test_g", _dec.Decimal("0")),
    ]:
        got = fb_sql(spark, q).first()[0]
        assert got == want, (q, got)
    assert fb_sql(
        spark, "SELECT corr(i1, d1) AS c FROM var_test_g"
    ).first()[0] == _dec.Decimal("1.000000")
    for q, msg in [
        ("SELECT var(*) AS v FROM var_test_g", "column reference expected"),
        ("SELECT var(_id) AS v FROM var_test_g",
         "_id column cannot be used in aggregate function 'var'"),
        ("SELECT var(i1, d1) AS v FROM var_test_g",
         "count of formal parameters (1) does not match count of actual "
         "parameters (2)"),
        ("SELECT corr(*, i1) AS c FROM var_test_g",
         "expected right paren, found ','"),
        ("SELECT corr(i1) AS c FROM var_test_g",
         "count of formal parameters (2) does not match count of actual "
         "parameters (1)"),
        ("SELECT corr(_id, i1) AS c FROM var_test_g",
         "_id column cannot be used in aggregate function 'corr'"),
    ]:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q)
        assert msg in str(ei.value), q


def test_golden_like_type_guard(spark):
    """defs_like.go:24-140 — LIKE/NOT LIKE require a STRING left
    operand; every other reference type raises the exact binop text
    ('NOTLIKE' when negated). Arrays/sets and decimals included."""
    import datetime as _dt
    import decimal as _dec

    spark.createDataFrame(
        [(1, 5, True, _dec.Decimal("1.23"), [1, 2], "foo", ["a"],
          _dt.datetime(2012, 11, 1))],
        "_id LONG, i1 LONG, b1 BOOLEAN, d1 DECIMAL(4,2), "
        "ids1 ARRAY<BIGINT>, s1 STRING, ss1 ARRAY<STRING>, t1 TIMESTAMP",
    ).createOrReplaceTempView("like_all_types_g")
    cases = [
        ("select _id like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'id'"),
        ("select i1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'int'"),
        ("select b1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'bool'"),
        ("select d1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'decimal(2)'"),
        ("select ids1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'idset'"),
        ("select ss1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'stringset'"),
        ("select t1 like '%f_' from like_all_types_g",
         "operator 'LIKE' incompatible with type 'timestamp'"),
        ("select i1 not like '%f_' from like_all_types_g",
         "operator 'NOTLIKE' incompatible with type 'int'"),
        ("select d1 not like '%f_' from like_all_types_g",
         "operator 'NOTLIKE' incompatible with type 'decimal(2)'"),
    ]
    for q, msg in cases:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q)
        assert msg in str(ei.value), q
    # the valid string cases still compile and evaluate
    assert fb_sql(
        spark, "select s1 like 'f%' as m from like_all_types_g"
    ).first()["m"] is True
    assert fb_sql(
        spark, "select s1 not like 'f%' as m from like_all_types_g"
    ).first()["m"] is False


def test_golden_between_range_subscript(spark):
    """defs_between.go:63-224 — BETWEEN subscripts are numeric/
    timestamp only; bool/string/sets raise at compile time (Spark would
    range-compare them). NOT BETWEEN shares the rule; the valid
    decimal/id/timestamp forms still evaluate."""
    import datetime as _dt
    import decimal as _dec

    spark.createDataFrame(
        [(1, True, _dec.Decimal("2.00"), 5, [1, 2], "foo", ["a"],
          _dt.datetime(2012, 11, 1))],
        "_id LONG, b1 BOOLEAN, d1 DECIMAL(4,2), i1 LONG, "
        "ids1 ARRAY<BIGINT>, s1 STRING, ss1 ARRAY<STRING>, t1 TIMESTAMP",
    ).createOrReplaceTempView("between_all_types_g")
    for q, msg in [
        ("select b1 between true and false from between_all_types_g",
         "type 'bool' cannot be used as a range subscript"),
        ("select ids1 between [100] and [456] from between_all_types_g",
         "type 'idset' cannot be used as a range subscript"),
        ("select s1 between 'foo' and 'bar' from between_all_types_g",
         "type 'string' cannot be used as a range subscript"),
        ("select ss1 between ['a'] and ['c'] from between_all_types_g",
         "type 'stringset' cannot be used as a range subscript"),
        ("select b1 not between true and false from between_all_types_g",
         "type 'bool' cannot be used as a range subscript"),
        ("select s1 not between 'foo' and 'bar' from between_all_types_g",
         "type 'string' cannot be used as a range subscript"),
    ]:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q)
        assert msg in str(ei.value), q
    ok = fb_sql(
        spark,
        "select d1 between 1.23 and 4.56 as a, "
        "i1 between 3 and 7 as b, "
        "i1 not between 8 and 9 as c from between_all_types_g",
    ).first()
    assert (ok["a"], ok["b"], ok["c"]) == (True, True, True)


def test_golden_unop_type_guard(spark):
    """defs_unops.go:60-260 — unary -/+ take int/id/decimal, bitwise
    '!' takes int/id only; bool/timestamp/sets raise with the exact
    binop texts. Valid unary forms (incl. '!' bitwise complement on
    int) still evaluate."""
    import datetime as _dt
    import decimal as _dec

    spark.createDataFrame(
        [(1, True, _dec.Decimal("2.00"), 10, [1], ["a"],
          _dt.datetime(2012, 11, 1))],
        "_id LONG, b1 BOOLEAN, d1 DECIMAL(4,2), i1 LONG, "
        "ids1 ARRAY<BIGINT>, ss1 ARRAY<STRING>, t1 TIMESTAMP",
    ).createOrReplaceTempView("unoptest_g")
    for q, msg in [
        ("select -b1 from unoptest_g",
         "operator '-' incompatible with type 'bool'"),
        ("select !b1 from unoptest_g",
         "operator '!' incompatible with type 'bool'"),
        ("select +b1 from unoptest_g",
         "operator '+' incompatible with type 'bool'"),
        ("select !d1 from unoptest_g",
         "operator '!' incompatible with type 'decimal(2)'"),
        ("select -t1 from unoptest_g",
         "operator '-' incompatible with type 'timestamp'"),
        ("select !t1 from unoptest_g",
         "operator '!' incompatible with type 'timestamp'"),
        ("select +t1 from unoptest_g",
         "operator '+' incompatible with type 'timestamp'"),
        ("select -ids1 from unoptest_g",
         "operator '-' incompatible with type 'idset'"),
        ("select !ss1 from unoptest_g",
         "operator '!' incompatible with type 'stringset'"),
        ("select i1 + -b1 from unoptest_g",
         "operator '-' incompatible with type 'bool'"),
    ]:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q)
        assert msg in str(ei.value), q
    ok = fb_sql(
        spark,
        "select -i1 as a, +i1 as b, !i1 as c, -d1 as d, "
        "i1 - i1 as e from unoptest_g",
    ).first()
    assert (ok["a"], ok["b"], ok["c"]) == (-10, 10, -11)
    assert ok["d"] == _dec.Decimal("-2.00") and ok["e"] == 0


def test_golden_flatten_query_hint(spark):
    """defs_groupby.go:282-460 — the WITH (flatten(setcol)) query hint:
    DISTINCT / GROUP BY over a set column operate per ELEMENT, each
    returned as a single-element set; hint errors use the exact texts.
    SUPERSET note: the reference also errors on MIN/MAX/PERCENTILE in
    grouped queries ('aggregate ... not allowed in GROUP BY' — a PQL
    pushdown limitation); here they compute (TPC-H relies on it)."""
    spark.createDataFrame(
        [(1, [1, 2], ["a", "b"]), (2, [3, 4], ["d", "e"]),
         (3, [1, 4], ["a", "d"]), (4, [2, 3], ["b", "c"])],
        "_id long, ids1 array<bigint>, ss1 array<string>",
    ).createOrReplaceTempView("groupby_set_test_g")
    got = fb_sql(
        spark,
        "select distinct ids1 from groupby_set_test_g "
        "with (flatten(ids1))",
    ).collect()
    assert sorted(tuple(r["ids1"]) for r in got) == [(1,), (2,), (3,), (4,)]
    got2 = fb_sql(
        spark,
        "select count(*) as n, ss1 from groupby_set_test_g "
        "with (flatten(ss1)) group by ss1 order by ss1",
    ).collect()
    assert [(r["n"], list(r["ss1"])) for r in got2] == [
        (2, ["a"]), (2, ["b"]), (1, ["c"]), (2, ["d"]), (1, ["e"]),
    ]
    # un-hinted distinct keeps whole-set groups
    plain = fb_sql(
        spark, "select distinct ids1 from groupby_set_test_g"
    ).collect()
    assert len(plain) == 4 and all(len(r["ids1"]) == 2 for r in plain)
    for q, msg in [
        ("select distinct ids1 from groupby_set_test_g "
         "with (flatter(foo))", "unknown query hint 'flatter'"),
        ("select distinct ids1 from groupby_set_test_g "
         "with (flatten(foo))", "column 'foo' not found"),
        ("select distinct ids1 from groupby_set_test_g "
         "with (flatten(foo, bar))",
         "query hint 'flatten' expected 1 parameter(s) (column name), "
         "got 2 parameters"),
    ]:
        with pytest.raises(ValueError) as ei:
            fb_sql(spark, q)
        assert msg in str(ei.value), q
