"""Round-13 idk corpus walk, part 3 — idk/csv/csv_test.go (649 LoC,
r12 verdict ask #3): the typed-CSV consumer's out-of-range matrices
(TestIntOpts, TestVariousOORValues, TestTimeLayouts, TestTimestampOOR,
TestFailureConditions) and the custom-header form
(TestCSVCommandCustomHeader). Expectations are the reference's own
checker tables; timestamps compare at MICROSECOND precision (Spark's
TimestampType truncates the reference's nanosecond renders).

n/a: TestStreamFileNames (:273) — concurrent directory-walk dedup of
the csv Source's file channel; Spark's file reader owns listing/dedup.
TestCSVCommand/TestCSVRecordTime's cluster legs (ingest → ranged PQL
over YMDH views) are covered by the time-quantum batteries
(tests/test_executor_walk_matrix.py Range/RowsTime); the read kernels
are mirrored here.
"""

from __future__ import annotations

import datetime as dt
import os
from collections import Counter

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)

from featurebase_spark.sources import read_idk_csv


def _write(tmpdir, name, text):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as fh:
        fh.write(text)
    return p


def col_counter(df, col, conv=lambda v: v):
    return Counter(
        conv(r[col]) if r[col] is not None else None for r in df.collect()
    )


# ---- TestIntOpts (:495) --------------------------------------------------

_INT_OPTS_CSV = (
    "id__ID,negneg__Int_-10_-5,negpos__Int_-10_10,pospos__Int_5_10,"
    "negzero__Int_-10_0,zeropos__Int_0_10,zerozero__Int_0_0\n"
    + "".join(f"{i+1},{v},{v},{v},{v},{v},{v}\n"
              for i, v in enumerate([-20, -10, -5, 0, 5, 10, 20]))
)

_INT_OPTS_EXP = {
    "negneg": [None, -10, -5, None, None, None, None],
    "negzero": [None, -10, -5, 0, None, None, None],
    "negpos": [None, -10, -5, 0, 5, 10, None],
    "zeropos": [None, None, None, 0, 5, 10, None],
    "zerozero": [None, None, None, 0, None, None, None],
    "pospos": [None, None, None, None, 5, 10, None],
}


def test_int_opts_oor_nulls(spark, tmpdir):
    p = _write(tmpdir, "intopts.csv", _INT_OPTS_CSV)
    df = read_idk_csv(spark, p, allow_int_oor=True)
    rows = {r["id"]: r for r in df.collect()}
    for field, exp in _INT_OPTS_EXP.items():
        got = [rows[i + 1][field] for i in range(7)]
        assert got == exp, field


def test_int_oor_refuses_without_flag(spark, tmpdir):
    p = _write(tmpdir, "intoor.csv", "id__ID,pospos__Int_5_10\n0,4\n")
    with pytest.raises(Exception, match="out of range"):
        read_idk_csv(spark, p).collect()
    p = _write(tmpdir, "intoor2.csv", "id__ID,pospos__Int_5_10\n0,11\n")
    with pytest.raises(Exception, match="out of range"):
        read_idk_csv(spark, p).collect()


def test_int_overflow_is_coercion_error(spark, tmpdir):
    """TestFailureConditions intOverflow: a value no int64 holds is a
    conversion failure (halts even though no range was declared)."""
    p = _write(tmpdir, "intof.csv",
               "id__ID,pospos__Int\n0,89273948723984729387492387492987\n")
    with pytest.raises(Exception, match="couldn't convert"):
        read_idk_csv(spark, p).collect()


# ---- TestVariousOORValues (:344) -----------------------------------------

_VARIOUS_CSV = """id__ID,s__String_F_YMDH,ts__Timestamp_s_2006-01-02 15:04:05.999,price__Decimal_2,age__Int_1_120
0,a,0000-01-03 08:00:00.000,0.0,1
1,b,9999-12-31 23:59:60.999,5.44,35
2,b,2019-50-03 08:00:00.000,5.44,120
3,b,2019-01-50 08:00:00.000,5.44,120
4,b,2019-01-03 50:00:00.000,5.44,120
5,a,2019-04-03 00:90:00.000,5.44,129
6,a,2019-04-03 00:00:90.000,5.44,120
5,a,2019-04-03 00:00:00.000,123.123,1
6,a,2019-04-03 00:00:00.000,-1,1
7,a,2019-04-03 00:00:00.000,994492233720368547758.0892233720368547758,100
5,a,2019-04-03 00:00:00.000,2.34,121
6,a,2019-04-03 00:00:00.000,3.44,0
7,a,1500-04-03 00:00:00.000,994492233720368547758.0892233720368547758,2342342
8,a,2019-04-03 00:00:00.000,3.44,100
"""


def test_various_oor_values(spark, tmpdir):
    p = _write(tmpdir, "various.csv", _VARIOUS_CSV)
    df = read_idk_csv(
        spark, p, allow_int_oor=True, allow_decimal_oor=True,
        allow_timestamp_oor=True,
    )
    assert df.count() == 14
    ts = dt.datetime(2019, 4, 3)
    assert col_counter(df, "ts") == Counter(
        [None] * 7 + [ts] * 6 + [dt.datetime(1500, 4, 3)]
    )
    assert col_counter(df, "age") == Counter(
        [1, 35, 120, 120, 120, None, 120, 1, 1, 100, None, None, None, 100]
    )
    assert col_counter(df, "price", float) == Counter(
        [0.0, 5.44, 5.44, 5.44, 5.44, 5.44, 5.44, 123.12, -1.0, None,
         2.34, 3.44, None, 3.44]
    )


# ---- TestTimeLayouts (:416) ----------------------------------------------


@pytest.mark.parametrize("field,header,rows,exp", [
    ("ts1",
     "ts1__Timestamp_s_2006-01-02 15:04:05.999_2030-01-02 15:04:05.999_s",
     ["0,a,99221100"],
     ["2033-02-24 00:29:05.000000"]),
    ("tsnmin",
     "tsnmin__Timestamp_ns_2006-01-02T15:04:05.999999999Z_"
     "1833-11-24T17:31:44.01Z_s",
     ["0,a,1", "1,b,-1"],
     ["1833-11-24 17:31:45.010000", None]),
    ("tsnmax",
     "tsnmax__Timestamp_ns_2006-01-02T15:04:05.999999999Z_"
     "2106-02-07T06:28:16Z_ns",
     ["0,a,1", "1,b,-1000001"],
     [None, "2106-02-07 06:28:15.998999"]),
    ("tssmin",
     "tssmin__Timestamp_s_2006-01-02T15:04:05.999999999Z_"
     "0001-01-01T00:00:01Z_ms",
     ["0,a,1001", "1,b,-1001"],
     ["0001-01-01 00:00:02.000000", None]),
    ("tsmsmax",
     "tsmsmax__Timestamp_ms_2006-01-02T15:04:05.999999999Z_"
     "9999-12-31T23:59:59Z_us",
     ["0,a,1001", "1,b,-1001"],
     [None, "9999-12-31 23:59:58.999000"]),
    ("granconv",
     "granconv__Timestamp_ns_2006-01-02T15:04:05.999999999Z_"
     "2000-02-07T06:28:16Z_s",
     ["0,a,10000000000", "1,b,-1001"],
     [None, "2000-02-07 06:11:35.000000"]),
])
def test_time_layouts(spark, tmpdir, field, header, rows, exp):
    """Timestamps compare as UTC-formatted STRINGS (date_format on the
    JVM): the driver's datetime.fromtimestamp cannot materialize
    year-1/9999 values under a non-UTC OS timezone."""
    body = "\n".join(rows)
    p = _write(tmpdir, f"{field}.csv",
               f"id__ID,s__String_F_YMDH,{header}\n{body}\n")
    df = read_idk_csv(spark, p, allow_timestamp_oor=True)
    import pyspark.sql.functions as F
    got = {r["id"]: r["v"] for r in df.select(
        "id", F.date_format(field, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("v")
    ).collect()}
    assert [got[i] for i in range(len(rows))] == exp, field


# ---- TestTimestampOOR (:536) ---------------------------------------------


def test_timestamp_oor_matrix(spark, tmpdir):
    csv = (
        "id__ID,"
        "ts1__Timestamp_ns_2006-01-02 15:04:05.999,"
        "ts2__Timestamp_s_2006-01-02T15:04:05Z07:00_9998-12-31T15:04:05Z_h,"
        "ts3__Timestamp_s_2006-01-02T15:04:05Z07:00_0002-12-31T15:04:05Z_h,"
        "ts4__Timestamp_s_2006-01-02T15:04:05.999Z\n"
        "0,1833-01-03 08:00:00.000,8500,8500,0001-01-01T00:00:00Z\n"
        "1,1833-11-24 17:31:44.000,8769,-8500,0001-01-01T00:00:01Z\n"
        "2,1833-11-25 17:31:44.000,-99991,0,0001-01-01T00:00:02Z\n"
        "3,2106-02-06 06:28:16.000,0,-99995,9999-12-31T23:59:58Z\n"
        "4,2106-02-07 06:28:16.000,9999,-99999,9999-12-31T23:59:59Z\n"
        "5,2106-02-08 06:28:16.000,99999999999999999999999,"
        "-9999999999999999999999999,9999-12-31T23:59:60Z\n"
    )
    p = _write(tmpdir, "tsoor.csv", csv)
    df = read_idk_csv(spark, p, allow_timestamp_oor=True)
    import pyspark.sql.functions as F
    fields = ["ts1", "ts2", "ts3", "ts4"]
    fmt = "yyyy-MM-dd HH:mm:ss"
    got = {r["id"]: r for r in df.select(
        "id", *[F.date_format(f, fmt).alias(f) for f in fields]
    ).collect()}
    exp = {
        "ts1": [None, "1833-11-24 17:31:44", "1833-11-25 17:31:44",
                "2106-02-06 06:28:16", "2106-02-07 06:28:16", None],
        "ts2": ["9999-12-20 19:04:05", None, "9987-08-05 08:04:05",
                "9998-12-31 15:04:05", None, None],
        "ts3": ["0003-12-20 19:04:05", "0002-01-11 11:04:05",
                "0002-12-31 15:04:05", None, None, None],
        "ts4": [None, "0001-01-01 00:00:01", "0001-01-01 00:00:02",
                "9999-12-31 23:59:58", "9999-12-31 23:59:59", None],
    }
    for field, vals in exp.items():
        assert [got[i][field] for i in range(6)] == vals, field


# ---- TestFailureConditions (:575) ----------------------------------------


@pytest.mark.parametrize("name,csv", [
    ("epoch too small",
     "id__ID,ts1__Timestamp_s_2006-01-02T15:04:05Z07:00_"
     "0000-01-01T00:00:00Z_h\n0,0\n"),
    ("epoch too big",
     "id__ID,ts1__Timestamp_s_2006-01-02T15:04:05Z07:00_"
     "9999-12-31T23:59:60Z_h\n0,0\n"),
])
def test_bad_epoch_halts_even_with_allow(spark, tmpdir, name, csv):
    p = _write(tmpdir, "fail.csv", csv)
    with pytest.raises(Exception):
        read_idk_csv(
            spark, p, allow_int_oor=True, allow_decimal_oor=True,
            allow_timestamp_oor=True, just_do_it=False,
        ).collect()


def test_epoch_just_right_succeeds(spark, tmpdir):
    p = _write(
        tmpdir, "ok.csv",
        "id__ID,ts1__Timestamp_s_2006-01-02T15:04:05Z07:00_"
        "2200-12-31T15:04:05Z_h\n0,0\n",
    )
    df = read_idk_csv(spark, p, allow_int_oor=True,
                      allow_decimal_oor=True, allow_timestamp_oor=True,
                      just_do_it=False)
    assert df.first()["ts1"] == dt.datetime(2200, 12, 31, 15, 4, 5)


@pytest.mark.parametrize("name,csv,match", [
    ("ts string below range",
     "id__ID,ts1__Timestamp_s_2006-01-02 15:04:05.999\n"
     "0,-0001-01-03 08:00:00.000\n", "out of range"),
    ("ts epoch+value overflow",
     "id__ID,ts2__Timestamp_s_2006-01-02T15:04:05Z07:00_"
     "9999-12-31T23:59:59Z_h\n0,2433\n", "out of range"),
    ("decimal overflow",
     "id__ID,price__Decimal_2\n"
     "0,994492233720368547758.0892233720368547758\n", "out of range"),
])
def test_oor_refused_without_matching_flag(spark, tmpdir, name, csv, match):
    p = _write(tmpdir, "noflag.csv", csv)
    with pytest.raises(Exception, match=match):
        read_idk_csv(spark, p, just_do_it=False).collect()


# ---- TestCSVCommandCustomHeader (:127) -----------------------------------


def test_custom_header_list(spark, tmpdir):
    p = _write(
        tmpdir, "custom.csv",
        "ABCD,2019-01-02,70%\nABCD,2019-01-03,20%\nBEDF,2019-01-02,70%\n",
    )
    df = read_idk_csv(
        spark, p,
        headers=["asset_tag__String", "fan_time__RecordTime_2006-01-02"],
    )
    assert df.columns == ["asset_tag", "fan_time"]  # extra column ignored
    got = {(r["asset_tag"], r["fan_time"]) for r in df.collect()}
    assert got == {
        ("ABCD", dt.datetime(2019, 1, 2)),
        ("ABCD", dt.datetime(2019, 1, 3)),
        ("BEDF", dt.datetime(2019, 1, 2)),
    }


# ---- TestCSVCommand read kernel (:82) ------------------------------------


def test_csv_command_read_kernel(spark, tmpdir):
    """The quantum-string + RecordTime header read (the ranged-PQL leg
    is the time-quantum batteries' territory)."""
    p = _write(
        tmpdir, "cmd.csv",
        "id__ID,s__String_F_YMDH,t__RecordTime_2006-01-02T15\n"
        "0,a,2019-01-09T04\n1,a,2019-01-09T05\n3,b,2019-01-09T04\n",
    )
    df = read_idk_csv(spark, p)
    got = {r["id"]: (r["s"], r["t"]) for r in df.collect()}
    assert got[0] == ("a", dt.datetime(2019, 1, 9, 4))
    assert got[3][0] == "b"
