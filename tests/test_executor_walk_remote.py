"""Round-13 executor_test.go walk, part 5 —
TestExecutor_Execute_Remote_Row (:3542-:3874), the COORDINATOR-VISIBLE
semantics (r12 verdict ask #1). The distribution mechanics themselves —
which node holds which shard, Import fan-out, holder reloads — are n/a:
Spark's scheduler owns placement, and every mirror here runs the same
logical plan the reference's coordinator merges.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20


def ids(df):
    return {r["_id"] for r in df.collect()}


@pytest.fixture(scope="module")
def remote_idx(spark):
    """The battery's accumulated writes on the main index: f row 10 at
    4 shard-straddling columns + the Remote SetBit f=7, the ranked fn
    field, and the fint/hint BSI fields."""
    f = {1: [10], SW + 1: [10, 7], SW + 2: [10], 3 * SW + 4: [10]}
    fn = {500001: [5, 4], 1500001: [5, 3], 2500001: [5], 3500001: [5],
          1500002: [3], 3500003: [3], 4500001: [4]}
    fint = {0: 1, 1: 2, 2: -2, 3: -1, 4: 4, 10: 0, 100: 0, 1000: 0,
            10000: 0, 100000: 0}
    hint = {0: 1, 1: 2, 2: 3}
    cols = sorted(set(f) | set(fn) | set(fint) | set(hint))
    return Index(
        spark.createDataFrame(
            [(c, f.get(c), fn.get(c), fint.get(c), hint.get(c))
             for c in cols],
            "_id long, f array<bigint>, fn array<bigint>, fint long, "
            "hint long",
        ),
        field_types={"fint": "int", "hint": "int"},
    )


def test_remote_row_and_count(remote_idx):
    assert ids(P.execute(remote_idx, "Row(f=10)")) \
        == {1, SW + 1, SW + 2, 3 * SW + 4}
    assert P.execute(remote_idx, "Count(Row(f=10))").first()["count"] == 4


def test_remote_setbit_visible(remote_idx):
    """'Remote SetBit': the f=7 bit lands and reads back."""
    assert ids(P.execute(remote_idx, "Row(f=7)")) == {SW + 1}


def test_remote_time_field_set_and_ranged_read(spark):
    """'remote with timestamp': Set(SW+1, z=5, 2010-07-08T00:00) under
    a Y quantum is visible to the year-ranged read."""
    idx = Index(
        spark.createDataFrame(
            [], "_id long, z array<struct<value: bigint, ts: timestamp>>"
        ),
        quantums={"z": "Y"},
    )
    t = P.execute(idx, f"Set({SW + 1}, z=5, 2010-07-08T00:00)")
    out = P.execute(
        Index(t, quantums={"z": "Y"}),
        "Row(z=5, from=2010-01-01T00:00, to=2011-01-01T00:00)",
    )
    assert ids(out) == {SW + 1}


def test_remote_topn(remote_idx):
    out = [(r["fn"], r["count"])
           for r in P.execute(remote_idx, "TopN(fn, n=3)").collect()]
    assert out == [(5, 4), (3, 3), (4, 2)]


def test_remote_groupby(remote_idx):
    got = {(r["f"], r["count"])
           for r in P.execute(remote_idx, "GroupBy(Rows(f))").collect()}
    assert got == {(7, 1), (10, 4)}


def test_remote_groupby_timestamps_value_ascending(spark):
    """'json format groupBy on timestamps' (SUP-138): groups come back
    in timestamp-value order."""
    rows = [(8, dt.datetime(2021, 1, 27, 8)),
            (9, dt.datetime(2000, 1, 27, 9)),
            (10, dt.datetime(2000, 1, 27, 10))]
    idx = Index(
        spark.createDataFrame(rows, "_id long, timestamp timestamp"),
        field_types={"timestamp": "timestamp"},
    )
    out = P.execute(idx, "GroupBy(Rows(timestamp))").collect()
    assert [(r["timestamp"], r["count"]) for r in out] == [
        (dt.datetime(2000, 1, 27, 9), 1),
        (dt.datetime(2000, 1, 27, 10), 1),
        (dt.datetime(2021, 1, 27, 8), 1),
    ]


def test_remote_groupby_ints_union_filter_limit(remote_idx):
    out = P.execute(
        remote_idx,
        "GroupBy(Rows(fint), limit=4, "
        "filter=Union(Row(fint < 1), Row(fint > 2)))",
    ).collect()
    assert [(r["fint"], r["count"]) for r in out] == [
        (-2, 1), (-1, 1), (0, 5), (4, 1),
    ]


def test_remote_groupby_ints_offset_regression(remote_idx):
    out = P.execute(remote_idx, "GroupBy(Rows(hint))").collect()
    assert [(r["hint"], r["count"]) for r in out] == [
        (1, 1), (2, 1), (3, 1),
    ]


def test_row_int_assign_condition(spark):
    """Row(gint=2) ≡ Row(gint==2) on a BSI int field."""
    idx = Index(
        spark.createDataFrame(
            [(1000, 1), (2000, 2), (3000, 3)], "_id long, gint long"
        ),
        field_types={"gint": "int"},
    )
    assert ids(P.execute(idx, "Row(gint=2)")) == {2000}
    assert ids(P.execute(idx, "Row(gint==1)")) == {1000}


def test_row_decimal_assign_condition(spark):
    idx = Index(
        spark.createDataFrame(
            [(11, Decimal("1.1")), (22, Decimal("2.2")),
             (33, Decimal("3.3"))],
            "_id long, fdec decimal(20,1)",
        ),
        field_types={"fdec": "decimal"},
    )
    assert ids(P.execute(idx, "Row(fdec=2.2)")) == {22}
    assert ids(P.execute(idx, "Row(fdec==1.1)")) == {11}


def test_row_foreign_key_assign_condition(spark):
    """Row(parentid="two") ≡ Row(parentid=="one") forms on a foreign-
    index BSI field holding parent keys."""
    idx = Index(
        spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")],
            "_id long, parentid string",
        ),
        field_types={"parentid": "int"},
    )
    assert ids(P.execute(idx, 'Row(parentid="two")')) == {2}
    assert ids(P.execute(idx, 'Row(parentid=="one")')) == {1}
