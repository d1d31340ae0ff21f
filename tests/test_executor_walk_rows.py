"""Round-13 executor_test.go walk, part 4 — row-call / regression
batteries (r12 verdict ask #1):

- TestExecutor_Execute_FieldValue (:4066-:4158)
- TestExecutor_Execute_Limit (:4159-:4297)
- TestExecutor_Execute_All (:4406-:4590)
- TestExecutor_Execute_ClearRow (:4591-:4686)
- TestExecutor_Execute_SetRow (:4687-:4889)
- TestExecutor_Execute_Extract (:4940-:5183)
- TestExecutor_Execute_Rows (:5311) / RowsTimeEmpty (:5344)
- TestExecutor_Execute_Shift (:6591-:6678)
- TestExecutor_Execute_IncludesColumn (:6679-:6776)
- TestExecutor_Execute_MinMaxCountEqual (:6777-:6947)
- Test_Executor_Execute_UnionRows (:7264-:7288)
- TestTimelessClearRegression (:7289) / TestMissingKeyRegression (:7332)
- TestExecutor_Execute_DistinctFailure (:6005)

n/a batteries, documented here: TestExecutor_Execute_NoIndex (:6948) —
the cross-index ``index=systems`` name lookup lives in the SQL door's
Catalog; the PQL door takes Index OBJECTS, so there is no name registry
to miss (cross-index Distinct is the DistinctAsRow(source=) API).
TestToRows (:9495) and TestDistinctTimestampToRows (:9646) are wire-
marshalling tests of the proto RowResponse writer — the Spark DataFrame
IS the row representation here. TestReopenCluster (:3949) and
TestExecutor_Execute_MaxMemory (:5244) are process-lifecycle tests with
no Spark analogue.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)
from pyspark.sql import functions as F

from featurebase_spark.operators.writes import clear_changed
from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20


def ids(df):
    return {r["_id"] for r in df.collect()}


def ids_ordered(df):
    return [r["_id"] for r in df.collect()]


# ---- FieldValue (:4066) --------------------------------------------------


@pytest.fixture(scope="module")
def fv_idx(spark):
    return Index(
        spark.createDataFrame(
            [(1, 3, Decimal("12.985")), (2, -4, Decimal("-4.234")),
             (SW + 1, 3, None)],
            "_id long, f long, dec decimal(20,3)",
        ),
        field_types={"f": "int", "dec": "decimal"},
    )


@pytest.fixture(scope="module")
def fv_keyed_idx(spark):
    return Index(
        spark.createDataFrame(
            [("one", 3, Decimal("12.985")), ("two", -4, Decimal("-4.234"))],
            "_id string, f long, dec decimal(20,3)",
        ),
        field_types={"f": "int", "dec": "decimal"},
    )


@pytest.mark.parametrize("q,exp", [
    ("FieldValue(field=f, column=1)", 3),
    ("FieldValue(field=f, column=2)", -4),
    (f"FieldValue(field=f, column={SW + 1})", 3),
    ("FieldValue(field=dec, column=1)", Decimal("12.985")),
    ("FieldValue(field=dec, column=2)", Decimal("-4.234")),
])
def test_fieldvalue_ids(fv_idx, q, exp):
    assert P.execute(fv_idx, q).first()["value"] == exp


@pytest.mark.parametrize("q,exp", [
    ("FieldValue(field=f, column='one')", 3),
    ("FieldValue(field=f, column='two')", -4),
    ("FieldValue(field=dec, column='one')", Decimal("12.985")),
    ("FieldValue(field=dec, column='two')", Decimal("-4.234")),
])
def test_fieldvalue_keys(fv_keyed_idx, q, exp):
    assert P.execute(fv_keyed_idx, q).first()["value"] == exp


def test_fieldvalue_errors(fv_idx, fv_keyed_idx):
    with pytest.raises(ValueError, match="field required"):
        P.execute(fv_idx, "FieldValue()")
    with pytest.raises(ValueError, match="column required"):
        P.execute(fv_idx, "FieldValue(field=dec)")
    with pytest.raises(ValueError, match="column required"):
        P.execute(fv_keyed_idx, "FieldValue(field=f)")


# ---- Limit (:4159) -------------------------------------------------------


@pytest.fixture(scope="module")
def limit_idx(spark):
    cols = [0, 1, SW + 1]
    return Index(
        spark.createDataFrame([(c, [1]) for c in cols],
                              "_id long, f array<bigint>")
    )


LIMIT_COLS = [0, 1, SW + 1]


@pytest.mark.parametrize("limit", range(5))
def test_limit_only(limit_idx, limit):
    got = ids_ordered(P.execute(limit_idx, f"Limit(All(), limit={limit})"))
    assert got == LIMIT_COLS[:limit]


@pytest.mark.parametrize("offset", range(5))
def test_offset_only(limit_idx, offset):
    got = ids_ordered(P.execute(limit_idx, f"Limit(All(), offset={offset})"))
    assert got == LIMIT_COLS[offset:]


@pytest.mark.parametrize("limit", range(0, 5, 2))
@pytest.mark.parametrize("offset", range(0, 5, 2))
def test_limit_offset_nested(limit_idx, limit, offset):
    got = ids_ordered(P.execute(
        limit_idx, f"Limit(Limit(All(), offset={offset}), limit={limit})"
    ))
    assert got == LIMIT_COLS[offset:][:limit]


def test_extract_over_limit_no_fields(limit_idx):
    out = P.execute(limit_idx, "Extract(Limit(All(), limit=1))")
    assert [r["_id"] for r in out.collect()] == [0]
    assert out.columns == ["_id"]


# ---- All (:4406) ---------------------------------------------------------


@pytest.fixture(scope="module")
def all_idx(spark):
    cols = []
    bit_count = 105
    for i in range(bit_count // 2):
        cols.append(i + SW - 2)
    for i in range(bit_count // 2, bit_count - 1):
        cols.append(i + (SW * 2) - bit_count + 5)
    cols.append(3 * SW + 2)
    return Index(
        spark.createDataFrame([(c, [10]) for c in cols],
                              "_id long, f array<bigint>")
    ), sorted(cols)


@pytest.mark.parametrize("q,sl", [
    ("All()", slice(None)),
    ("All(limit=1)", slice(0, 1)),
    ("All(limit=4)", slice(0, 4)),
    ("All(limit=4, offset=4)", slice(4, 8)),
    ("All(limit=4, offset=100)", slice(100, 104)),
    ("All(limit=1, offset=103)", slice(103, 104)),
    ("All(limit=4, offset=103)", slice(103, 107)),
    ("All(limit=4, offset=106)", slice(106, 110)),
    ("All(limit=2, offset=2)", slice(2, 4)),
    ("All(limit=2, offset=102)", slice(102, 104)),
])
def test_all_limit_offset_pages_in_id_order(all_idx, q, sl):
    idx, cols = all_idx
    assert ids_ordered(P.execute(idx, q)) == cols[sl]


def test_all_columnkey(spark):
    idx = Index(
        spark.createDataFrame([(f"c{i}", [10]) for i in range(4)],
                              "_id string, f array<bigint>")
    )
    assert ids_ordered(P.execute(idx, "All(limit=2)")) == ["c0", "c1"]
    assert ids_ordered(P.execute(idx, "All(limit=2, offset=2)")) == ["c2", "c3"]


# ---- ClearRow (:4591) ----------------------------------------------------


def test_clearrow_int_refuses(spark):
    idx = Index(
        spark.createDataFrame([(0, 5)], "_id long, f long"),
        field_types={"f": "int"},
    )
    with pytest.raises(ValueError):
        P.execute(idx, "ClearRow(f=1)")


def test_clearrow_drops_row_from_topn(spark):
    rows = [(c, [v for v in (1, 2, 3)
                 if (v == 1 and c <= 8) or (v == 2 and c <= 7)
                 or (v == 3 and c <= 6)])
            for c in range(2, 9)]
    idx = Index(spark.createDataFrame(rows, "_id long, f array<bigint>"))
    out = [(r["f"], r["count"])
           for r in P.execute(idx, "TopN(f, n=5)").collect()]
    assert out == [(1, 7), (2, 6), (3, 5)]
    cleared = Index(P.execute(idx, "ClearRow(f=2)"))
    out = [(r["f"], r["count"])
           for r in P.execute(cleared, "TopN(f, n=5)").collect()]
    assert out == [(1, 7), (3, 5)]


# ---- SetRow / Store (:4687) ----------------------------------------------


@pytest.fixture()
def store_idx(spark):
    df = spark.createDataFrame(
        [(3, [10], None), (SW - 1, [10], None), (SW + 1, [10], None)],
        "_id long, f array<bigint>, tmp array<bigint>",
    )
    return Index(df)


def test_store_new_row(store_idx):
    assert ids(P.execute(store_idx, "Row(f=10)")) == {3, SW - 1, SW + 1}
    t = P.execute(store_idx, "Store(Row(f=10), tmp=20)")
    assert ids(P.execute(Index(t), "Row(tmp=20)")) == {3, SW - 1, SW + 1}
    # storing into a field which doesn't exist CREATES it
    t2 = P.execute(Index(t), "Store(Row(f=10), nonexistent=20)")
    assert ids(P.execute(Index(t2), "Row(nonexistent=20)")) == {3, SW - 1, SW + 1}


def test_store_no_source(store_idx):
    """Storing an EMPTY row overwrites the destination to empty."""
    t = P.execute(store_idx, "Store(Row(f=9), f=20)")
    assert ids(P.execute(Index(t), "Row(f=20)")) == set()
    t2 = P.execute(Index(t), "Store(Row(f=9), f=10)")
    assert ids(P.execute(Index(t2), "Row(f=10)")) == set()


def test_store_existing_destination(spark):
    df = spark.createDataFrame(
        [(3, [10]), (SW - 1, [10]), (SW + 1, [10, 20]), (1, [20])],
        "_id long, f array<bigint>",
    )
    idx = Index(df)
    assert ids(P.execute(idx, "Row(f=20)")) == {1, SW + 1}
    t = P.execute(idx, "Store(Row(f=10), f=20)")
    assert ids(P.execute(Index(t), "Row(f=20)")) == {3, SW - 1, SW + 1}


def test_store_keyed(spark):
    df = spark.createDataFrame([(1, ["a"])], "_id long, f array<string>")
    idx = Index(df)
    assert ids(P.execute(idx, 'Row(f="a")')) == {1}
    t = P.execute(idx, 'Store(Row(f="a"), f="b")')
    assert ids(P.execute(Index(t), 'Row(f="b")')) == {1}
    t2 = P.execute(Index(t), 'Store(Row(f="a"), nonexistent="c")')
    assert ids(P.execute(Index(t2), 'Row(nonexistent="c")')) == {1}


# ---- Extract (:4940) -----------------------------------------------------


def test_extract_multi_type(spark):
    """The wide typed extract: set/keyset/mutex/keymutex/time/keytime/
    bsint/bsidecimal/timestamp/bool for records 0, 1, 3."""
    ts = dt.datetime
    q = [  # quantum entries: (value, ts)
        (0, [(1, ts(2016, 1, 1))], [("h", ts(2016, 1, 1)),
                                    ("plugh", ts(2018, 1, 1))]),
        (1, [(2, ts(2017, 1, 1))], [("xyzzy", ts(2017, 1, 1))]),
        (3, [(3, ts(2018, 1, 1))], None),
    ]
    base = {
        0: (None, ["h", "plugh"], None, "h", 1, Decimal("0.01"),
            ts(2000, 1, 1, 0, 0, 0), True),
        1: ([0, 3, 4], ["xyzzy"], 0, "xyzzy", -1, Decimal("1.00"),
            ts(2000, 1, 1, 0, 0, 1), False),
        3: (None, None, None, "plugh", 2, Decimal("-1.01"),
            ts(2000, 1, 1, 0, 0, 3), True),
    }
    rows = [
        (c, *base[c], qv, qk)
        for (c, qv, qk) in q
    ]
    df = spark.createDataFrame(
        rows,
        "_id long, set array<bigint>, keyset array<string>, mutex long, "
        "keymutex string, bsint long, bsidecimal decimal(20,2), "
        "timestamp timestamp, bool boolean, "
        "time array<struct<value: bigint, ts: timestamp>>, "
        "keytime array<struct<value: string, ts: timestamp>>",
    )
    idx = Index(df, quantums={"time": "YMDH", "keytime": "YMDH"},
                field_types={"bsint": "int", "bsidecimal": "decimal",
                             "timestamp": "timestamp", "bool": "bool"})
    out = P.execute(
        idx,
        "Extract(All(), Rows(set), Rows(keyset), Rows(mutex), "
        "Rows(keymutex), Rows(time), Rows(keytime), Rows(bsint), "
        "Rows(bsidecimal), Rows(timestamp), Rows(bool))",
    )
    got = {r["_id"]: r for r in out.collect()}
    r0 = got[0]
    assert (r0["set"], sorted(r0["keyset"]), r0["mutex"], r0["keymutex"]) \
        == (None, ["h", "plugh"], None, "h")
    assert (list(r0["time"]), sorted(r0["keytime"]), r0["bsint"]) \
        == ([1], ["h", "plugh"], 1)
    assert (float(r0["bsidecimal"]), r0["bool"]) == (0.01, True)
    r1 = got[1]
    assert (sorted(r1["set"]), r1["keyset"], r1["mutex"], r1["bsint"]) \
        == ([0, 3, 4], ["xyzzy"], 0, -1)
    assert (float(r1["bsidecimal"]), r1["timestamp"].second, r1["bool"]) \
        == (1.00, 1, False)
    r3 = got[3]
    assert (r3["keymutex"], list(r3["time"]), r3["bsint"], r3["bool"]) \
        == ("plugh", [3], 2, True)


# ---- Rows (:5311) / RowsTimeEmpty (:5344) --------------------------------


def test_rows_unkeyed(spark):
    bits = {0: [10], SW + 1: [10], 2: [11, 12], SW + 2: [11, 12], 3: [13]}
    idx = Index(
        spark.createDataFrame([(c, v) for c, v in bits.items()],
                              "_id long, general array<bigint>")
    )

    def rows(q):
        return [r["general"] for r in P.execute(idx, q).collect()]

    assert rows("Rows(general)") == [10, 11, 12, 13]
    assert rows("Rows(field=general)") == [10, 11, 12, 13]
    assert rows("Rows(general, limit=2)") == [10, 11]
    assert rows("Rows(general, previous=10,limit=2)") == [11, 12]
    assert rows("Rows(general, column=2)") == [11, 12]


def test_rows_time_empty(spark):
    idx = Index(
        spark.createDataFrame(
            [], "_id long, x array<struct<value: bigint, ts: timestamp>>"
        ),
        quantums={"x": "YMD"},
    )
    out = P.execute(
        idx, "Rows(x, from=1999-12-31T00:00, to=2002-01-01T03:00)"
    )
    assert out.count() == 0


# ---- Shift (:6591) -------------------------------------------------------


def test_shift_basic_and_nested(spark):
    idx = Index(spark.createDataFrame([(0, [10])], "_id long, general array<bigint>"))
    assert ids(P.execute(idx, "Shift(Row(general=10), n=1)")) == {1}
    assert ids(P.execute(idx, "Shift(Shift(Row(general=10), n=1), n=1)")) == {2}


def test_shift_shard_boundary(spark):
    orig = [1, SW - 1, SW + 1]
    idx = Index(
        spark.createDataFrame([(c, [10]) for c in orig],
                              "_id long, general array<bigint>")
    )
    assert ids(P.execute(idx, "Shift(Row(general=10), n=1)")) \
        == {2, SW, SW + 2}
    assert ids(P.execute(idx, "Shift(Row(general=10), n=2)")) \
        == {3, SW + 1, SW + 3}
    # n defaults to 0 in the reference's Shift() (UintArg default)
    assert ids(P.execute(idx, "Shift(Shift(Row(general=10)))")) == set(orig)


def test_shift_no_create(spark):
    cols = [SW - 2, SW - 1, SW, SW + 2]
    idx = Index(
        spark.createDataFrame([(c, [10]) for c in cols],
                              "_id long, general array<bigint>")
    )
    assert ids(P.execute(idx, "Shift(Row(general=10), n=1)")) \
        == {SW - 1, SW, SW + 1, SW + 3}
    assert ids(P.execute(idx, "Shift(Shift(Row(general=10), n=1), n=1)")) \
        == {SW, SW + 1, SW + 2, SW + 4}


# ---- IncludesColumn (:6679) ----------------------------------------------


@pytest.mark.parametrize("col,exp", [
    (1, True), (2, False), (SW, True), (SW + 1, False),
    (2 * SW, True), (2 * SW + 1, False),
])
def test_includes_column_ids(spark, col, exp):
    idx = Index(
        spark.createDataFrame([(c, [10]) for c in (1, SW, 2 * SW)],
                              "_id long, general array<bigint>")
    )
    out = P.execute(idx, f"IncludesColumn(Row(general=10), column={col})")
    assert out.first()["result"] is exp


def test_includes_column_keys(spark):
    idx = Index(
        spark.createDataFrame([("a", ["ten"]), ("b", ["ten"])],
                              "_id string, general array<string>")
    )
    q = 'IncludesColumn(Row(general="ten"), column="a")'
    assert P.execute(idx, q).first()["result"] is True
    q = 'IncludesColumn(Row(general="ten"), column="zzz")'
    assert P.execute(idx, q).first()["result"] is False


def test_includes_column_errors(spark):
    idx = Index(spark.createDataFrame([(1, [10])], "_id long, general array<bigint>"))
    with pytest.raises(
        ValueError, match="IncludesColumn call must specify a column"
    ):
        P.execute(idx, "IncludesColumn(Row(general=10))")
    with pytest.raises(
        ValueError, match="IncludesColumn call must specify a row query"
    ):
        P.execute(idx, "IncludesColumn(column=1)")


# ---- MinMaxCountEqual (:6777) --------------------------------------------


@pytest.fixture(scope="module")
def mmce_idx(spark):
    f = {0: 3, 1: 3, 2: 4, 3: 5, 4: 5, SW + 1: 3, SW + 2: 5, SW + 3: 5,
         SW + 4: 5, SW + 5: 4, 2 * SW + 1: 3}
    x = {0: [3], 1: [3]}
    dec = {0: Decimal("5.122"), 1: Decimal("12.985"), 2: Decimal("4.234"),
           3: Decimal("12.985")}
    cols = sorted(set(f) | set(x) | set(dec))
    return Index(
        spark.createDataFrame(
            [(c, x.get(c), f.get(c), dec.get(c)) for c in cols],
            "_id long, x array<bigint>, f long, dec decimal(20,3)",
        ),
        field_types={"f": "int", "dec": "decimal"},
    )


def test_mmce_min_counts(mmce_idx):
    r = P.execute(mmce_idx, "Min(field=f)").first()
    assert (r["min"], r["count"]) == (3, 4)
    r = P.execute(mmce_idx, "Min(Row(x=3), field=f)").first()
    assert (r["min"], r["count"]) == (3, 2)


def test_mmce_max_counts(mmce_idx):
    r = P.execute(mmce_idx, "Max(field=f)").first()
    assert (r["max"], r["count"]) == (5, 5)


def test_mmce_decimal(mmce_idx):
    r = P.execute(mmce_idx, "Min(field=dec)").first()
    assert (float(r["min"]), r["count"]) == (4.234, 1)
    r = P.execute(mmce_idx, "Min(Row(x=3), field=dec)").first()
    assert (float(r["min"]), r["count"]) == (5.122, 1)
    r = P.execute(mmce_idx, "Max(field=dec)").first()
    assert (float(r["max"]), r["count"]) == (12.985, 2)


def test_mmce_nonexistent(mmce_idx):
    for q in ("Min(field=fake)", "Max(field=fake)"):
        with pytest.raises(ValueError, match="field not found"):
            P.execute(mmce_idx, q)


# ---- UnionRows (:7264) ---------------------------------------------------


def test_union_rows_topn_child(spark):
    idx = Index(
        spark.createDataFrame(
            [(0, [1]), (1, [2]), (2, [3]), (3, [1, 5])],
            "_id long, s array<bigint>",
        )
    )
    out = P.execute(idx, "Count(UnionRows(TopN(s, n=1)))")
    assert out.first()["count"] == 2
    out = P.execute(idx, "Count(UnionRows(Rows(s)))")
    assert out.first()["count"] == 4


# ---- TimelessClearRegression (:7289) -------------------------------------


def test_timeless_clear_on_time_field(spark):
    """A Set WITHOUT a timestamp on a time field, then Clear of that
    bit → changed=true (the regression was the standard-view bit being
    missed)."""
    idx = Index(
        spark.createDataFrame(
            [], "_id long, stargazer array<struct<value: bigint, ts: timestamp>>"
        ),
        quantums={"stargazer": "YMD"},
    )
    t = P.execute_all(
        idx,
        "Set(511, stargazer=376) "
        "Set(512, stargazer=300, 2017-05-18T00:00)",
    )[-1]
    assert clear_changed(t, 511, "stargazer", 376)
    cleared = P.execute(
        Index(t, quantums={"stargazer": "YMD"}), "Clear(511, stargazer=376)"
    )
    assert not clear_changed(cleared, 511, "stargazer", 376)


# ---- MissingKeyRegression (:7332) ----------------------------------------


def test_missing_key_regression_sequence(spark):
    idx = Index(spark.createDataFrame([], "_id string, f array<string>"))
    # RowGarbage: querying a key never set returns empty, not an error
    assert ids(P.execute(idx, 'Row(f="garbage")')) == set()
    t = P.execute(idx, 'Set("a", f="example")')
    i = Index(t)
    assert P.execute(i, 'Count(Row(f="example"))').first()["count"] == 1
    assert ids(P.execute(i, 'Not(Row(f="garbage"))')) == {"a"}
    assert ids(P.execute(i, 'Difference(All(), Row(f="garbage"))')) == {"a"}
    t = P.execute(i, 'Set("b", f="boo")')
    i = Index(t)
    assert P.execute(i, 'Count(Row(f="boo"))').first()["count"] == 1
    assert P.execute(i, 'Count(Row(f="garbage"))').first()["count"] == 0
    # StoreInvertSelf: Store(Not(Row(f="xyzzy")), f="xyzzy") succeeds
    t = P.execute(i, 'Store(Not(Row(f="xyzzy")), f="xyzzy")')
    i = Index(t)
    assert ids(P.execute(i, 'Row(f="xyzzy")')) == {"a", "b"}
    # SetClear round trip
    t = P.execute(i, 'Set("b", f="plugh")')
    assert clear_changed(t, "b", "f", "plugh")
    t = P.execute(Index(t), 'Clear("b", f="plugh")')
    i = Index(t)
    assert ids(P.execute(i, 'Row(f="plugh")')) == set()
    # ClearMix: clear of a missing key is false, of a present one true
    assert not clear_changed(t, "a", "f", "garbage")
    assert clear_changed(t, "a", "f", "example")


# ---- DistinctFailure (:6005) ---------------------------------------------


def test_distinct_with_sparse_bsi(spark):
    """Distinct over a BSI field where most records carry no value and
    several shards carry none at all."""
    g = {0: [10], 1: [10], SW + 1: [10], 2: [11, 12], SW + 2: [11, 12]}
    v = {0: 10, 1: 100}
    cols = sorted(set(g) | set(v))
    idx = Index(
        spark.createDataFrame(
            [(c, g.get(c), v.get(c)) for c in cols],
            "_id long, general array<bigint>, v long",
        ),
        field_types={"v": "int"},
    )
    out = P.execute(idx, 'Distinct(field="v")')
    assert {r["v"] for r in out.collect()} == {10, 100}
