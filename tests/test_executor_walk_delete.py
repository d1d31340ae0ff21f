"""Round-13 walk, part 7 — delete_test.go TestExecutor_DeleteRecords
(:20-:278): whole-record Delete through the PQL door — ConstRow ids,
keyed ConstRow, Row / Not(Row) / All() children, cross-shard overlap,
and the FB-1281 invalid-bitmap error propagation ('row call: ' wrap
instead of a panic). DeleteRecordsBigWithRestart's reopen leg is n/a
(no holder to restart); its Delete(Row) kernel is covered by
test_delete_row.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20


def ids(df):
    return {r["_id"] for r in df.collect()}


@pytest.fixture()
def del_idx(spark):
    """The battery's setup(): setfield bits, a sparse BSI, a YMDH time
    field — records {0,1,2,SW,SW+1,SW+2,2SW}."""
    setf = {0: [0], 1: [0], SW + 2: [0, 10], 2: [10], SW: [10, 20],
            2 * SW: [10], SW + 1: [10]}
    bsi = {0: 4, 2: 8}
    tf = {
        0: [(0, dt.datetime(2020, 1, 2, 15, 45)),
            (1, dt.datetime(2019, 1, 2, 16, 45)),
            (1, dt.datetime(2019, 1, 2, 17, 45))],
    }
    cols = sorted(set(setf) | set(bsi) | set(tf))
    df = spark.createDataFrame(
        [(c, setf.get(c), bsi.get(c), tf.get(c)) for c in cols],
        "_id long, setfield array<bigint>, bsi long, "
        "timefield array<struct<value: bigint, ts: timestamp>>",
    )
    return Index(df, field_types={"bsi": "int"},
                 quantums={"timefield": "YMDH"})


def test_delete_constrow(spark, del_idx):
    assert ids(P.execute(del_idx, "Extract(All())")) \
        == {0, 1, 2, SW, SW + 1, SW + 2, 2 * SW}
    t = P.execute(del_idx, f"Delete(ConstRow(columns=[1,2,3,{SW + 1}]))")
    assert ids(P.execute(Index(t), "Extract(All())")) \
        == {0, SW, SW + 2, 2 * SW}


def test_delete_key(spark):
    """DeleteKey: keyed records drop by string ConstRow; their keys
    stop resolving."""
    df = spark.createDataFrame(
        [("one", [("fish", dt.datetime(2019, 1, 2, 17, 45))], None),
         ("two", [("fish", dt.datetime(2019, 1, 3, 17, 45))], None),
         ("A", None, [1]), ("B", None, [2]), ("C", None, [3]),
         ("D", None, [4])],
        "_id string, timefield array<struct<value: string, ts: timestamp>>, "
        "keystuff array<bigint>",
    )
    idx = Index(df, quantums={"timefield": "YMDH"})
    assert ids(P.execute(idx, "Extract(All())")) \
        == {"A", "B", "C", "D", "one", "two"}
    t = P.execute(idx, 'Delete(ConstRow(columns=["A","one"]))')
    assert ids(P.execute(Index(t), "Extract(All())")) \
        == {"B", "C", "D", "two"}


def test_delete_row(spark, del_idx):
    t = P.execute(del_idx, "Delete(Row(setfield=20))")
    assert ids(P.execute(Index(t), "Extract(All())")) \
        == {0, 1, 2, SW + 1, SW + 2, 2 * SW}


def test_delete_not_row(spark, del_idx):
    t = P.execute(del_idx, "Delete(Not(Row(setfield=20)))")
    assert ids(P.execute(Index(t), "Extract(All())")) == {SW}


def test_delete_all(spark, del_idx):
    assert P.execute(del_idx, "Count(All())").first()["count"] == 7
    t = P.execute(del_idx, "Delete(All())")
    assert P.execute(Index(t), "Count(All())").first()["count"] == 0


def test_delete_overlap(spark):
    """DeleteOverlap: rows overlapping across shards — deleting one
    shard-straddling record leaves the rest intact."""
    setf = {0: [0], 1: [0, 1, 2, 3], SW: [0, 2, 4, 6]}
    idx = Index(
        spark.createDataFrame(
            [(c, v) for c, v in setf.items()],
            "_id long, setfield array<bigint>",
        )
    )
    assert ids(P.execute(idx, "Extract(All())")) == {0, 1, SW}
    t = P.execute(idx, f"Delete(ConstRow(columns=[{SW}]))")
    assert ids(P.execute(Index(t), "Extract(All())")) == {0, 1}


def test_delete_with_bitmap_error(spark, del_idx):
    """FB-1281: Delete(Row(setfield > 1)) — a range op on a set field —
    propagates the 'row call: only support …' error instead of
    panicking (delete_test.go:233-240, executor.go:5187-5189)."""
    with pytest.raises(ValueError, match="row call: only support"):
        P.execute(del_idx, "Delete(Row(setfield > 1))")
