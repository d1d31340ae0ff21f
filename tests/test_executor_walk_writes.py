"""Round-13 executor_test.go walk, part 1 — the write-door batteries
that had no named mirror (r12 verdict ask #1):

- TestExecutor_Execute_ConstRow / ConstRowTrackExistence (:1195-:1233)
- TestExecutor_Execute_Set (:1376-:1500)
- TestExecutor_Execute_SetBool (:1501-:1571)
- TestExecutor_Execute_SetDecimal (:1572-:1628)
- TestExecutor_Execute_OldPQL (:1629-:1642)
- TestExecutor_Execute_SetValue (:1643-:1757)
- TestExecutor_Execute_Existence (:4004-:4061)

Conventions: ``P.execute`` returns the TRANSFORMED table for writes (a
composable plan); the reference's coordinator-visible 'changed' bool is
answered by ``writes.set_changed`` (bounded single-record read). The
reference's reopen/cluster-restart legs are n/a — Spark tables have no
holder to reload.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)
from pyspark.sql import functions as F

from featurebase_spark.operators.writes import set_changed
from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20  # shard straddle only; the value itself is immaterial


def ids(df):
    return {r["_id"] for r in df.collect()}


# ---- ConstRow (:1195, :1215) --------------------------------------------


def test_constrow_intersects_existence(spark):
    """Our Index IS the existence set (a row-oriented table has no
    written-but-nonexistent column), so ConstRow matches the reference's
    TrackExistence: true variant — id 7 was never written and drops
    (executor_test.go:1215-1233). The no-track variant (:1195, returns
    the literal [2,6,7] including never-written 7) is n/a by design:
    every SQL-door table tracks existence."""
    df = spark.createDataFrame([(2, 1), (4, 3), (6, 5)], "_id long, h long")
    got = ids(P.execute(Index(df), "ConstRow(columns=[2,6,7])"))
    assert got == {2, 6}


# ---- Set battery (:1376) -------------------------------------------------


def test_set_changed_flag_sequence(spark):
    """OK subtest: first Set(1, f=11) changes, second doesn't
    (:1390-:1404)."""
    df = spark.createDataFrame([(0, 1)], "_id long, f long")
    idx = Index(df)
    assert set_changed(df, 1, "f", 11)  # record absent → changed
    after = P.execute(idx, "Set(1, f=11)")
    assert not set_changed(after, 1, "f", 11)  # same bit → unchanged
    got = {r["_id"]: r["f"] for r in after.collect()}
    assert got == {0: 1, 1: 11}


def test_set_refusal_texts(spark):
    """ErrInvalidColValueType / ErrInvalidRowValueType (:1405-:1416,
    texts cluster.go:366/575)."""
    df = spark.createDataFrame([(0, 1)], "_id long, f long")
    idx = Index(df)
    with pytest.raises(ValueError, match="unkeyed index"):
        P.execute(idx, 'Set("foo", f=1)')
    with pytest.raises(ValueError, match="cannot create keys on unkeyed field"):
        P.execute(idx, 'Set(2, f="bar")')


def test_set_keyed_index_string_and_integer_keys(spark):
    """RowKeyColumnKey/OK (:1419-:1460): on a keyed index both
    Set("foo", f=11) and Set(2, f=11) land (an integer column key is a
    valid key), and repeating either is a no-change."""
    df = spark.createDataFrame([("z", 1)], "_id string, f long")
    idx = Index(df)
    t1 = P.execute(idx, 'Set("foo", f=11)')
    assert {r["_id"] for r in t1.collect()} == {"z", "foo"}
    assert not set_changed(t1, "foo", "f", 11)
    t2 = P.execute(Index(t1), "Set(2, f=11)")
    got = {r["_id"]: r["f"] for r in t2.collect()}
    assert got == {"z": 1, "foo": 11, "2": 11}
    assert not set_changed(t2, 2, "f", 11)


def test_set_float_column_is_parse_error(spark):
    """Set(2.1, f=1) is a parse error (:1462-:1474)."""
    df = spark.createDataFrame([(0, 1)], "_id long, f long")
    with pytest.raises(ValueError):
        P.execute(Index(df), "Set(2.1, f=1)")


def test_set_float_row_on_keyed_field_refuses(spark):
    """Set(2, f=1.2) on a keyed (string-valued) field → 'invalid value'
    (:1487-:1494)."""
    df = spark.createDataFrame([(0, "a")], "_id long, f string")
    with pytest.raises(ValueError, match="invalid value"):
        P.execute(Index(df), "Set(2, f=1.2)")


# ---- SetBool (:1501) -----------------------------------------------------


@pytest.fixture()
def bool_idx(spark):
    return Index(
        spark.createDataFrame([], "_id long, f boolean"),
        field_types={"f": "bool"},
    )


def test_setbool_basic_sequence(spark, bool_idx):
    """Basic subtest: set true (changed), set true again (unchanged),
    set false (changed); Row(f=false) = {100}, Row(f=true) = {}."""
    t1 = P.execute(bool_idx, "Set(100, f=true)")
    assert not set_changed(t1, 100, "f", True)
    assert set_changed(t1, 100, "f", False)
    t2 = P.execute(Index(t1, field_types={"f": "bool"}), "Set(100, f=false)")
    i2 = Index(t2, field_types={"f": "bool"})
    assert ids(P.execute(i2, "Row(f=false)")) == {100}
    assert ids(P.execute(i2, "Row(f=true)")) == set()


def test_setbool_refuses_string_and_int(bool_idx):
    """Error subtest: Set(100, f="true") and Set(100, f=1) both refuse
    (fieldValidateValue executor.go:7180)."""
    with pytest.raises(ValueError, match='invalid value "true" for bool field'):
        P.execute(bool_idx, 'Set(100, f="true")')
    with pytest.raises(ValueError, match='invalid value 1 for bool field'):
        P.execute(bool_idx, "Set(100, f=1)")


# ---- SetDecimal (:1572) --------------------------------------------------


def test_setdecimal_sequence_and_range_reads(spark):
    df = spark.createDataFrame([], "_id long, f decimal(10,2)")
    idx = Index(df, field_types={"f": "decimal"})
    t1 = P.execute(idx, "Set(1000, f=1.5)")
    assert not set_changed(t1, 1000, "f", 1.5)
    i1 = Index(t1, field_types={"f": "decimal"})
    assert ids(P.execute(i1, "Row(f == 1.5)")) == {1000}
    assert ids(P.execute(i1, "Row(f > 1.4999)")) == {1000}


def test_setdecimal_refuses_string(spark):
    df = spark.createDataFrame([], "_id long, f decimal(10,2)")
    idx = Index(df, field_types={"f": "decimal"})
    with pytest.raises(ValueError):
        P.execute(idx, 'Set(1000, f="1.5")')


# ---- OldPQL (:1629) ------------------------------------------------------


def test_old_pql_setbit_unknown_call(spark):
    df = spark.createDataFrame([(0, 1)], "_id long, f long")
    with pytest.raises(ValueError, match="unknown call: SetBit"):
        P.execute(Index(df), "SetBit(frame=f, row=11, col=1)")


# ---- SetValue (:1643) ----------------------------------------------------


def test_setvalue_bsi_point_reads(spark):
    """OK subtest: Set BSI values, read back per record (our FieldValue
    is the f.Value() analogue)."""
    df = spark.createDataFrame([], "_id long, f long")
    idx = Index(df, field_types={"f": "int"})
    t = P.execute_all(idx, "Set(10, f=25) Set(100, f=10)")[-1]
    i = Index(t, field_types={"f": "int"})
    assert P.execute(i, "FieldValue(field=f, column=10)").first()["value"] == 25
    assert P.execute(i, "FieldValue(field=f, column=100)").first()["value"] == 10


def test_setvalue_column_required(spark):
    df = spark.createDataFrame([], "_id long, f long")
    idx = Index(df, field_types={"f": "int"})
    with pytest.raises(
        ValueError, match="Set\\(\\) column argument 'col' required"
    ):
        P.execute(idx, "Set(f=100)")


def test_setvalue_timestamp_formats(spark):
    """Timestamp subtest: nanosecond-precision and second-precision ISO
    strings both land as the same stored timestamps."""
    df = spark.createDataFrame([], "_id long, f timestamp")
    idx = Index(df, field_types={"f": "timestamp"})
    t = P.execute_all(
        idx,
        "Set(10, f='2000-01-01T00:00:00.000000000Z') "
        "Set(100, f='2000-01-02T00:00:00Z')",
    )[-1]
    got = {r["_id"]: r["f"].isoformat() for r in t.collect()}
    assert got[10].startswith("2000-01-01T00:00:00")
    assert got[100].startswith("2000-01-02T00:00:00")


# ---- Existence (:4004) ---------------------------------------------------


def test_existence_row_and_not(spark):
    """Row/Not with tracked existence; the reopen leg is n/a (no holder
    to reload)."""
    df = spark.createDataFrame([], "_id long, f long")
    idx = Index(df)
    t = P.execute_all(
        idx,
        f"Set(3, f=10) Set({SW + 1}, f=10) Set({SW + 2}, f=20)",
    )[-1]
    i = Index(t)
    assert ids(P.execute(i, "Row(f=10)")) == {3, SW + 1}
    assert ids(P.execute(i, "Not(Row(f=10))")) == {SW + 2}
