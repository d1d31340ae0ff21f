"""Regression tests for the round-10 ADVICE items (fixed in round 11).

1. (medium) STRINGSPLIT returns NULL — not '' — when the input string or
   separator is NULL and pos > 0 (EvaluateStringSplit returns nil on any
   nil argument, inbuiltfunctionsstring.go:440-512), in BOTH the Column
   wrapper and the SQL emitter.
2. (low) PREFIX/SUFFIX/SUBSTRING range checks use the Go BYTE length
   (octet_length) and slice bytes, like the reference's Go-string
   slicing (inbuiltfunctionsstring.go:390,410,585-589,617-621).
3. (low) ASCII('') literal does not raise at compile time — the
   reference's empty-string early return precedes the len != 1 error
   (EvaluateAscii:350-352); only multi-byte literals error.
4. (low) CHARINDEX with an EXPLICIT start (even 0) goes through the
   guarded path: CHARINDEX(sub, '', 0) raises out-of-range
   (EvaluateCharIndex:777 — pos >= len(s)); only the 2-arg form skips
   the check.
5. (low) multimodal readers pin the Arrow batch conf through one shared
   documented helper; scoped_arrow_batch restores the previous value.
"""

import pytest

import featurebase_spark.functions as fb
import featurebase_spark.sql as S
from featurebase_spark.pipeline import multimodal as MM


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS x").collect()[0]["x"]


# ---- 1. STRINGSPLIT NULL propagation ------------------------------------


def test_stringsplit_null_string_is_null(spark):
    df = spark.createDataFrame([(None, 2)], "s string, p int")
    got = df.select(fb.STRINGSPLIT("s", "-", 2).alias("x")).collect()[0]["x"]
    assert got is None  # was '' before the fix


def test_stringsplit_null_separator_is_null(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a-b-c",)], "s string")
    got = df.select(
        fb.STRINGSPLIT("s", F.lit(None).cast("string"), 1).alias("x")
    ).collect()[0]["x"]
    assert got is None


def test_stringsplit_sql_emitter_null(spark):
    sql = S._FUNCS["STRINGSPLIT"][2](["CAST(NULL AS STRING)", "'-'", "1"])
    assert _one(spark, sql) is None
    sql = S._FUNCS["STRINGSPLIT"][2](["'a-b'", "CAST(NULL AS STRING)", "1"])
    assert _one(spark, sql) is None
    # non-null behavior unchanged: past-the-end is still ''
    sql = S._FUNCS["STRINGSPLIT"][2](["'a-b'", "'-'", "9"])
    assert _one(spark, sql) == ""


# ---- 2. byte-length semantics for PREFIX/SUFFIX/SUBSTRING ----------------


def test_prefix_suffix_byte_length_guard(spark):
    # 'ÿx' is 2 chars but 3 UTF-8 bytes: n=3 is in range (Go len()),
    # n=4 raises — char semantics would reject n=3
    df = spark.createDataFrame([("ÿx",)], "s string")
    assert df.select(fb.PREFIX("s", 3).alias("x")).collect()[0]["x"] == "ÿx"
    assert df.select(fb.SUFFIX("s", 3).alias("x")).collect()[0]["x"] == "ÿx"
    with pytest.raises(Exception, match="value '4' out of range"):
        df.select(fb.PREFIX("s", 4)).collect()
    with pytest.raises(Exception, match="value '4' out of range"):
        df.select(fb.SUFFIX("s", 4)).collect()


def test_prefix_suffix_sql_emitter_byte_guard(spark):
    assert _one(spark, S._FUNCS["PREFIX"][2](["'ÿx'", "3"])) == "ÿx"
    with pytest.raises(Exception, match="value '4' out of range"):
        _one(spark, S._FUNCS["SUFFIX"][2](["'ÿx'", "4"]))


def test_substring_byte_length_guard(spark):
    # byte range [0,3): start=2 valid under bytes, invalid under chars
    df = spark.createDataFrame([("ÿx",)], "s string")
    got = df.select(fb.SUBSTRING("s", 2, 1).alias("x")).collect()[0]["x"]
    assert got == "x"  # byte slice [2:3] is the ASCII 'x'
    with pytest.raises(Exception, match="value '4' out of range"):
        df.select(fb.SUBSTRING("s", 1, 3)).collect()  # end=4 > 3 bytes
    assert (
        _one(spark, S._FUNCS["SUBSTRING"][2](["'ÿx'", "2", "1"])) == "x"
    )
    with pytest.raises(Exception, match="value '4' out of range"):
        _one(spark, S._FUNCS["SUBSTRING"][2](["'ÿx'", "1", "3"]))


def test_substring_ascii_unchanged(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    assert df.select(fb.SUBSTRING("s", 1, 3).alias("x")).collect()[0]["x"] == "ell"


# ---- 3. ASCII('') literal ------------------------------------------------


def test_ascii_empty_literal_compiles():
    S._fn_check("ascii", "ASCII", ["''"])  # must not raise


def test_ascii_multibyte_literal_still_errors():
    with pytest.raises(ValueError, match="should be of the length 1"):
        S._fn_check("ascii", "ASCII", ["'ab'"])


# ---- 4. CHARINDEX explicit start=0 --------------------------------------


def test_charindex_explicit_start_zero_empty_string_raises(spark):
    df = spark.createDataFrame([("",)], "s string")
    with pytest.raises(Exception, match="value '0' out of range"):
        df.select(fb.CHARINDEX("b", "s", 0)).collect()


def test_charindex_two_arg_empty_string_ok(spark):
    # the 2-arg form never evaluates pos, so no range error
    df = spark.createDataFrame([("",)], "s string")
    got = df.select(fb.CHARINDEX("b", "s").alias("x")).collect()[0]["x"]
    assert got == -1


def test_charindex_explicit_start_zero_normal(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    assert df.select(fb.CHARINDEX("b", "s", 0).alias("x")).collect()[0]["x"] == 1


# ---- 5. scoped Arrow batch conf ------------------------------------------


def test_scoped_arrow_batch_restores(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    with MM.scoped_arrow_batch(spark, 16):
        assert spark.conf.get(key) == "16"
    assert spark.conf.get(key, None) == before


def test_readers_share_pin_helper():
    # every reader routes through the single documented helper — no
    # stray session-wide conf.set sites remain
    import inspect

    src = inspect.getsource(MM)
    body = src.split('def _pin_arrow_batch', 1)[1]
    assert 'conf.set(\n        "spark.sql.execution.arrow' in body.split(
        "class scoped_arrow_batch"
    )[0]
    after_helpers = body.split("def _fake_decode", 1)[1]
    assert "maxRecordsPerBatch" not in after_helpers.replace(
        "_pin_arrow_batch", ""
    )
    assert after_helpers.count("_pin_arrow_batch(df.sparkSession") >= 5
