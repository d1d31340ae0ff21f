"""Round-13 idk corpus walk, part 1 — idk/header_test.go
TestHeaderToField (436 LoC), the full typed-header grammar
(r12 verdict ask #3). Mirrored against sources.header_to_field /
split_header / go_time_parse / go_duration_error.

No Spark session needed — the header grammar is pure parsing.
"""

from __future__ import annotations

import datetime as dt

import pytest

from featurebase_spark.sources import (
    go_duration_error,
    go_time_parse,
    header_to_field,
    split_header,
)

RFC3339 = "2006-01-02T15:04:05Z07:00"
RFC3339NANO = "2006-01-02T15:04:05.999999999Z07:00"


def f(header, **exp):
    got = header_to_field(header)
    for k, v in exp.items():
        assert got.get(k) == v, (header, k, got)
    return got


# ---- error cases ---------------------------------------------------------


@pytest.mark.parametrize("header,err", [
    ("", "no field spec in this header"),
    ("__String", "field '__String' has no sourceName"),
    ("blah", "no field spec in this header"),
    ("blah__", "unknown field"),
    ("blah__Ztring", "unknown field"),
    ("a__String_Z", "can't interpret 'Z' for StringField.Mutex for field 'a'"),
    ("myname__Int_7_8.9", "parsing max for"),
    ("myname__Int_blah_7", "parsing min for"),
    ("myname__Decimal_!", "parsing scale for"),
    ("myname__DateInt_2006-01-02_2018-03d-04_D_0", 'cannot parse "d-04"'),
    ("myname__DateInt_2006-01-02_2018-03-04_Ze_0",
     'unknown unit "ze", please choose from d/h/m/s/ms/us/ns'),
    ("myname__DateInt_2006-01-02_2018-03-04_C_127z",
     'parsing custom unit 127z: time: unknown unit "z" in duration "127z"'),
    ("myname__RecordTime_2006-01-02_2018-03d-04_D_0", 'cannot parse "d-04"'),
    ("myname__RecordTime_2006-01-02_2018-03-04_Ze_0", "unknown unit"),
    ("multi__dunder__funder", "unknown field 'funder' for"),
])
def test_header_errors(header, err):
    with pytest.raises(ValueError) as e:
        header_to_field(header)
    assert err in str(e.value), header


# ---- string / bool / id --------------------------------------------------


def test_string_variants():
    f("a__String", kind="string", name="a", dest="a", mutex=False,
      quantum=None, ttl=None)
    f("a__String_F", mutex=False)
    f("a__String_T", mutex=True)
    f("a__String_F_YM", mutex=False, quantum="YM")
    f("a__String_F_YM_30s", quantum="YM", ttl="30s")


def test_string_extra_arg_logs():
    logs = []
    got = header_to_field("a__String_F_YM_30s_Z", logs=logs)
    assert got["ttl"] == "30s"
    assert logs and "ignoring extra arguments to StringField " \
        "a__String_F_YM_30s_Z" in logs[0]


def test_bool_and_id():
    f("z__Bool", kind="bool", name="z", dest="z")
    logs = []
    header_to_field("z__Bool_extra_2", logs=logs)
    assert "ignoring extra arguments to BoolField" in logs[0]
    f("myname__ID", kind="id", mutex=False)
    f("z__ID_T", mutex=True)
    f("z__ID_F_YMD", mutex=False, quantum="YMD")
    f("z__ID_F_YMD_30s", quantum="YMD", ttl="30s")
    logs = []
    header_to_field("z__ID_F_YMD_30s_Z", logs=logs)
    assert "ignoring extra arguments to IDField z__ID_F_YMD_30s_Z" in logs[0]


# ---- int / decimal -------------------------------------------------------


def test_int_variants():
    f("myname__Int", kind="int", min=None, max=None, foreign_index=None)
    f("myname__Int_7", min=7, max=None)
    f("myname__Int_7_7", min=7, max=7)
    f("myname__Int_7_7_findex", min=7, max=7, foreign_index="findex")
    logs = []
    got = header_to_field("myname__Int_7_7_z_", logs=logs)
    assert got["foreign_index"] == "z"
    assert "ignoring extra arguments to IntField" in logs[0]


def test_decimal_variants():
    f("myname__Decimal_7", kind="decimal", scale=7)
    f("myname__Decimal", scale=0)


# ---- arrays --------------------------------------------------------------


def test_array_variants():
    f("myname__StringArray_YMD", kind="stringarray", quantum="YMD")
    f("myname__StringArray_YMD_30s", quantum="YMD", ttl="30s")
    logs = []
    header_to_field("myname__StringArray_YMD_30s_Z", logs=logs)
    assert "ignoring extra arguments to StringArrayField" in logs[0]
    f("myname__IDArray_YMD", kind="idarray", quantum="YMD")
    f("myname__IDArray_YMD_30s", quantum="YMD", ttl="30s")
    logs = []
    header_to_field("myname__IDArray_YMD_30s_Z", logs=logs)
    assert "ignoring extra arguments to IDArrayField" in logs[0]


# ---- dateint / recordtime / timestamp ------------------------------------


def test_dateint_variants():
    f("myname__DateInt", kind="dateint", layout=RFC3339, epoch=None)
    f("myname__DateInt_2006-01-02T15:04:05Z07:00_2018-03-04T15:04:05Z",
      layout=RFC3339, epoch=dt.datetime(2018, 3, 4, 15, 4, 5))
    f("myname__DateInt_2006-01-02T15:04:05Z07:00_2018-03-04T15:04:05Z_D",
      unit="d")
    f("myname__DateInt_2006-01-02T15:04:05Z07:00_2018-03-04T15:04:05Z_C_10h",
      unit="c", custom_unit="10h")
    f("myname__DateInt_2006-01-02_2018-03-04_D_0",
      layout="2006-01-02", epoch=dt.datetime(2018, 3, 4), unit="d")


def test_recordtime_variants():
    f("myname__RecordTime", kind="recordtime", layout=RFC3339)
    got = header_to_field("__RecordTime")  # nameless is legal here
    assert (got["name"], got["dest"], got["layout"]) == ("", "", RFC3339)
    f("myname__RecordTime_2006-01-02", layout="2006-01-02")


def test_timestamp_variants():
    f("purchasedate__Timestamp_ms", kind="timestamp", granularity="ms",
      layout=RFC3339NANO)
    f("purchasedate__Timestamp_s_2006-01-02T15:04:05Z07:00_"
      "2018-03-04T15:04:05Z_ms",
      granularity="s", layout=RFC3339,
      epoch=dt.datetime(2018, 3, 4, 15, 4, 5), unit="ms")


def test_lookuptext_and_unicode():
    f("a__LookupText", kind="lookuptext", name="a")
    f("fldΘnameΘ__String", kind="string", name="fldΘnameΘ",
      dest="fldΘnameΘ")


# ---- dunder / trunder name mapping ---------------------------------------


def test_name_mapping():
    f("multi__dunder__String", name="multi__dunder", dest="multi__dunder")
    f("@rbitrary.name*string!___pilosa-name-string__String",
      name="@rbitrary.name*string!", dest="pilosa-name-string")
    f("dunderful__name__string___pilosa-name-string__String",
      name="dunderful__name__string", dest="pilosa-name-string")
    f("dunderful__name__string___pilosa__name__string__String",
      name="dunderful__name__string", dest="pilosa__name__string")


def test_split_header_validates_dest_name():
    with pytest.raises(ValueError, match="field name must match"):
        split_header("src___Bad-Upper__String")


# ---- go_time_parse / go_duration_error helpers ---------------------------


def test_go_time_parse_offsets():
    got = go_time_parse(RFC3339, "2018-03-04T15:04:05+02:00")
    assert got == dt.datetime(2018, 3, 4, 13, 4, 5)  # normalized to UTC
    got = go_time_parse(RFC3339NANO, "2018-03-04T15:04:05.123456789Z")
    # fraction preserved to µs (Spark timestamps truncate Go's nanos)
    assert got == dt.datetime(2018, 3, 4, 15, 4, 5, 123456)


def test_go_duration_error_texts():
    assert go_duration_error("10h") is None
    assert go_duration_error("1h30m") is None
    assert go_duration_error("0") is None
    assert go_duration_error("127z") \
        == 'time: unknown unit "z" in duration "127z"'
    assert go_duration_error("7") == 'time: missing unit in duration "7"'
    assert go_duration_error("x") == 'time: invalid duration "x"'
