"""FeatureBase scalar-function library (SURVEY §2.3) — semantics mirrored
from reference golden tests (defs_string_functions.go, defs_date_functions,
defs_set_functions)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

import featurebase_spark.functions as fb


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "hello world", [1, 2, 3], ["a", "b"], datetime.datetime(2024, 3, 15, 10, 30, 45)),
        ],
        "_id LONG, s STRING, ids ARRAY<LONG>, ss ARRAY<STRING>, ts TIMESTAMP",
    )


def one(df, col):
    return df.select(col.alias("x")).first()["x"]


def test_set_functions(df):
    assert one(df, fb.SETCONTAINS("ids", 2)) is True
    assert one(df, fb.SETCONTAINS("ids", 9)) is False
    assert one(df, fb.SETCONTAINSALL("ids", [1, 3])) is True
    assert one(df, fb.SETCONTAINSALL("ids", [1, 9])) is False
    assert one(df, fb.SETCONTAINSANY("ss", ["b", "z"])) is True
    assert one(df, fb.SETCONTAINSANY("ss", ["z"])) is False


def test_set_functions_equalfold_and_null(df):
    """The reference evaluator compares stringset members with
    strings.EqualFold — CASE-INSENSITIVE (stringSetContains,
    inbuiltfunctionsset.go:170-177) — and returns NULL on a NULL arg
    (every Evaluate* returns nil on nil). Pre-r11 array_contains was
    case-sensitive and couldn't take NULL."""
    from pyspark.sql import functions as F

    assert one(df, fb.SETCONTAINS("ss", "B")) is True  # fold hit
    assert one(df, fb.SETCONTAINSALL("ss", ["A", "b"])) is True
    assert one(df, fb.SETCONTAINSANY("ss", ["Z", "B"])) is True
    assert one(df, fb.SETCONTAINS("ss", F.lit(None).cast("string"))) is None
    assert (
        one(df, fb.SETCONTAINS(F.lit(None).cast("array<string>"), "a"))
        is None
    )
    # loop edge cases: ALL over empty test set is vacuously true,
    # ANY over empty is false
    assert one(df, fb.SETCONTAINSALL("ss", F.array())) is True
    assert one(df, fb.SETCONTAINSANY("ss", F.array())) is False


def test_set_functions_sql_emitters(spark):
    import featurebase_spark.sql as S

    def run(expr):
        return spark.sql(f"SELECT {expr} AS x").collect()[0]["x"]

    f = S._FUNCS
    assert run(f["SETCONTAINS"][2](["array('A','b')", "'a'"])) is True
    assert run(f["SETCONTAINS"][2](["array('A','b')", "CAST(NULL AS STRING)"])) is None
    assert run(f["SETCONTAINSALL"][2](["array('A','b')", "array('a','B')"])) is True
    assert run(f["SETCONTAINSANY"][2](["array(1,2)", "array(2,9)"])) is True
    assert run(f["SETCONTAINSANY"][2](["array(1,2)", "array(9)"])) is False


def test_string_functions(df):
    assert one(df, fb.REVERSE("s")) == "dlrow olleh"
    assert one(df, fb.UPPER("s")) == "HELLO WORLD"
    assert one(df, fb.LOWER(F.lit("ABC"))) == "abc"
    assert one(df, fb.CHAR(F.lit(65))) == "A"
    assert one(df, fb.ASCII(F.lit("A"))) == 65
    assert one(df, fb.STRINGSPLIT("s", " ", 1)) == "world"
    # reference SUBSTRING is 0-based (inbuiltfunctionsstring.go)
    assert one(df, fb.SUBSTRING("s", 0, 5)) == "hello"
    assert one(df, fb.SUBSTRING("s", 6)) == "world"
    assert one(df, fb.REPLACEALL("s", "l", "L")) == "heLLo worLd"
    assert one(df, fb.TRIM(F.lit("  x  "))) == "x"
    assert one(df, fb.RTRIM(F.lit("  x  "))) == "  x"
    assert one(df, fb.LTRIM(F.lit("  x  "))) == "x  "
    assert one(df, fb.SUFFIX("s", 5)) == "world"
    assert one(df, fb.PREFIX("s", 5)) == "hello"
    assert one(df, fb.SPACE(3)) == "   "
    assert one(df, fb.LEN("s")) == 11
    assert one(df, fb.REPLICATE(F.lit("ab"), 3)) == "ababab"
    assert one(df, fb.FORMAT("%s-%d", F.lit("x"), F.lit(7))) == "x-7"
    # reference CHARINDEX is 0-based, -1 when absent
    assert one(df, fb.CHARINDEX("world", "s")) == 6
    assert one(df, fb.CHARINDEX("zzz", "s")) == -1
    assert one(df, fb.STR(F.lit(12))) == "        12"  # width-10
    assert one(df, fb.STR(F.lit(12345.789), 8, 2)) == "12345.79"
    assert one(df, fb.STR(F.lit(12345), 5, 5)) == "*****"


def test_date_functions(df):
    # reference part codes + semantics (EvaluateDateTimePart
    # inbuiltfunctionsdate.go:194-276; golden: defs_date_functions.go
    # DATETIMEPARTYY=2012, YD=306 on 2012-11-01T22:08:41)
    assert one(df, fb.DATETIMEPART("yy", "ts")) == 2024
    assert one(df, fb.DATETIMEPART("yd", "ts")) == 75  # day-of-year
    assert one(df, fb.DATETIMEPART("m", "ts")) == 3
    assert one(df, fb.DATETIMEPART("d", "ts")) == 15
    assert one(df, fb.DATETIMEPART("w", "ts")) == 5  # Go Weekday: Friday=5
    assert one(df, fb.DATETIMEPART("wk", "ts")) == 11  # ISO week
    assert one(df, fb.DATETIMEPART("hh", "ts")) == 10
    assert one(df, fb.DATETIMEPART("mi", "ts")) == 30
    assert one(df, fb.DATETIMEPART("s", "ts")) == 45
    assert one(df, fb.DATETIMEPART("ms", "ts")) == 0
    with pytest.raises(ValueError, match="invalid interval"):
        one(df, fb.DATETIMEPART("q", "ts"))
    # DATETIMENAME: Go fmt.Sprint — names for m/w, digit strings otherwise
    assert one(df, fb.DATETIMENAME("m", "ts")) == "March"
    assert one(df, fb.DATETIMENAME("w", "ts")) == "Friday"
    assert one(df, fb.DATETIMENAME("yy", "ts")) == "2024"
    # DATE_TRUNC returns formatted STRINGS (inbuiltfunctionsdate.go:564-642)
    assert one(df, fb.DATE_TRUNC("m", "ts")) == "2024-03"
    assert one(df, fb.DATE_TRUNC("d", "ts")) == "2024-03-15"
    assert one(df, fb.DATE_TRUNC("s", "ts")) == "2024-03-15T10:30:45"
    assert one(df, fb.DATETIMEADD("d", 5, "ts")).day == 20
    # DATETIMEDIFF: calendar yy/m, truncated elapsed otherwise
    ts2 = F.lit("2025-01-10 09:00:00").cast("timestamp")
    assert one(df, fb.DATETIMEDIFF("yy", "ts", ts2)) == 1
    assert one(df, fb.DATETIMEDIFF("m", "ts", ts2)) == 10
    assert one(df, fb.DATETIMEDIFF("d", "ts", ts2)) == 300
    assert one(df, fb.DATETIMEDIFF("d", ts2, "ts")) == -300  # toward zero
    assert one(df, fb.DATETIMEFROMPARTS(2024, 3, 15, 10, 30, 45)) == one(df, F.col("ts"))
    assert one(df, fb.TOTIMESTAMP(F.lit(0), "s")) == datetime.datetime(1970, 1, 1)
    assert one(df, fb.TOTIMESTAMP(F.lit(1_000), "ms")) == datetime.datetime(
        1970, 1, 1, 0, 0, 1
    )


def test_rangeq_quantum(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                [
                    ("a", datetime.datetime(2024, 1, 1)),
                    ("b", datetime.datetime(2024, 6, 1)),
                ],
            )
        ],
        "_id LONG, tq ARRAY<STRUCT<value STRING, ts TIMESTAMP>>",
    )
    got = df.select(
        fb.RANGEQ("tq", from_="2024-03-01", to="2024-12-31").alias("v")
    ).first()["v"]
    assert got == ["b"]


def test_fb_function_registry():
    assert fb.fb_function("setcontains") is fb.SETCONTAINS
    assert fb.fb_function("Upper") is fb.UPPER
    with pytest.raises(KeyError, match="unknown FeatureBase function"):
        fb.fb_function("nope")
