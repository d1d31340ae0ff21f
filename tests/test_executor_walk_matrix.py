"""Round-13 executor_test.go walk, part 6 — TestExecutor (:56-:1194),
the keyed-variant MATRIX of the core calls (RowID/RowKey ×
ColumnID/ColumnKey for Row, Difference, Intersect, Union, Xor, Count,
Set, Clear, Not), plus Options(shards), the time-Range subtests
(ISO + UnixTimestamp from/to), Range_Deprecated, ClearRow
(Set/Mutex/Time/WithKeys with the changed bool), RowsTime, and the
standard-view regression behind TimeQueriesFullRange. Also
TestExecutor_Execute_Row_BSIGroupEdge (:3290) and
TestExecutor_Execute_Range_BSIGroup_Deprecated (:3377).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)
from pyspark.sql import functions as F

from featurebase_spark.operators.writes import clear_row_changed
from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20


def ids(df):
    return {r["_id"] for r in df.collect()}


def _mk(spark, keyed_cols, keyed_rows, bits):
    """bits: {col_int: [row_int,...]} — translated per variant with
    cN / vN spellings."""
    rows = [
        (
            f"c{c}" if keyed_cols else c,
            [f"v{v}" for v in vs] if keyed_rows else vs,
        )
        for c, vs in bits.items()
    ]
    ct = "string" if keyed_cols else "long"
    vt = "string" if keyed_rows else "bigint"
    return Index(spark.createDataFrame(rows, f"_id {ct}, f array<{vt}>"))


def _lit(v, keyed):
    return f'"v{v}"' if keyed else str(v)


def _col(c, keyed):
    return f"c{c}" if keyed else c


VARIANTS = [(False, False), (False, True), (True, False), (True, True)]
V_IDS = ["RowIDColumnID", "RowKeyColumnID", "RowIDColumnKey",
         "RowKeyColumnKey"]


@pytest.mark.parametrize("keyed_cols,keyed_rows", VARIANTS, ids=V_IDS)
def test_matrix_row(spark, keyed_cols, keyed_rows):
    idx = _mk(spark, keyed_cols, keyed_rows,
              {3: [10], SW + 1: [10, 20], 1000: [100]})
    out = P.execute(idx, f"Row(f={_lit(10, keyed_rows)})")
    assert ids(out) == {_col(3, keyed_cols), _col(SW + 1, keyed_cols)}


@pytest.mark.parametrize("keyed_cols,keyed_rows", VARIANTS, ids=V_IDS)
def test_matrix_setops_and_count(spark, keyed_cols, keyed_rows):
    idx = _mk(spark, keyed_cols, keyed_rows, {
        1: [10, 11], 2: [11], 3: [10], SW + 1: [10], SW + 2: [10, 11],
    })
    l10, l11 = _lit(10, keyed_rows), _lit(11, keyed_rows)
    c = lambda *cs: {_col(x, keyed_cols) for x in cs}  # noqa: E731
    assert ids(P.execute(idx, f"Difference(Row(f={l10}), Row(f={l11}))")) \
        == c(3, SW + 1)
    assert ids(P.execute(idx, f"Intersect(Row(f={l10}), Row(f={l11}))")) \
        == c(1, SW + 2)
    assert ids(P.execute(idx, f"Union(Row(f={l10}), Row(f={l11}))")) \
        == c(1, 2, 3, SW + 1, SW + 2)
    assert ids(P.execute(idx, f"Xor(Row(f={l10}), Row(f={l11}))")) \
        == c(2, 3, SW + 1)
    assert P.execute(idx, f"Count(Row(f={l10}))").first()["count"] == 4


@pytest.mark.parametrize("keyed_cols,keyed_rows", VARIANTS, ids=V_IDS)
def test_matrix_set_clear(spark, keyed_cols, keyed_rows):
    ct = "string" if keyed_cols else "long"
    vt = "string" if keyed_rows else "bigint"
    idx = Index(spark.createDataFrame([], f"_id {ct}, f array<{vt}>"))
    cexpr = f'"{_col(9, True)}"' if keyed_cols else "9"
    t = P.execute(idx, f"Set({cexpr}, f={_lit(7, keyed_rows)})")
    i = Index(t)
    assert ids(P.execute(i, f"Row(f={_lit(7, keyed_rows)})")) \
        == {_col(9, keyed_cols)}
    t = P.execute(i, f"Clear({cexpr}, f={_lit(7, keyed_rows)})")
    assert ids(P.execute(Index(t), f"Row(f={_lit(7, keyed_rows)})")) == set()


@pytest.mark.parametrize("keyed_cols,keyed_rows", VARIANTS, ids=V_IDS)
def test_matrix_not(spark, keyed_cols, keyed_rows):
    idx = _mk(spark, keyed_cols, keyed_rows,
              {3: [10], SW + 1: [10], SW + 2: [20]})
    l10, l20 = _lit(10, keyed_rows), _lit(20, keyed_rows)
    assert ids(P.execute(idx, f"Not(Row(f={l20}))")) \
        == {_col(3, keyed_cols), _col(SW + 1, keyed_cols)}
    if not keyed_rows:
        assert ids(P.execute(idx, "Not(Row(f=0))")) == {
            _col(3, keyed_cols), _col(SW + 1, keyed_cols),
            _col(SW + 2, keyed_cols),
        }
    assert ids(P.execute(
        idx, f"Not(Union(Row(f={l10}), Row(f={l20})))"
    )) == set()


def test_options_shards(spark):
    idx = _mk(spark, False, False, {100: [10], SW: [10], SW * 2: [10]})
    out = P.execute(idx, "Options(Row(f=10), shards=[0, 2])")
    assert ids(out) == {100, SW * 2}


# ---- Range time subtests (:469-:660) -------------------------------------

_RANGE_WRITES = (
    "Set({c2}, f=1, 1999-12-31T00:00) "
    "Set({c3}, f=1, 2000-01-01T00:00) "
    "Set({c4}, f=1, 2000-01-02T00:00) "
    "Set({c5}, f=1, 2000-02-01T00:00) "
    "Set({c6}, f=1, 2001-01-01T00:00) "
    "Set({c7}, f=1, 2002-01-01T02:00) "
    "Set({c2}, f=1, 1999-12-30T00:00) "
    "Set({c2}, f=1, 2002-02-01T00:00) "
    "Set({c2}, f=10, 2001-01-01T00:00)"
)


def _range_idx(spark, keyed_cols=False):
    ct = "string" if keyed_cols else "long"
    idx = Index(
        spark.createDataFrame(
            [], f"_id {ct}, f array<struct<value: bigint, ts: timestamp>>"
        ),
        quantums={"f": "YMDH"},
    )
    names = {f"c{i}": (f'"{w}"' if keyed_cols else str(i))
             for i, w in zip(range(2, 8),
                             ["two", "three", "four", "five", "six",
                              "seven"])}
    t = P.execute_all(idx, _RANGE_WRITES.format(**names))[-1]
    return Index(t, quantums={"f": "YMDH"})


def test_range_iso(spark):
    i = _range_idx(spark)
    q = "Row(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)"
    assert ids(P.execute(i, q)) == {2, 3, 4, 5, 6, 7}
    assert ids(P.execute(i, "Row(f=1, from=1999-12-31T00:00)")) \
        == {2, 3, 4, 5, 6, 7}
    assert ids(P.execute(i, "Row(f=1, to=2002-01-01T02:00)")) \
        == {2, 3, 4, 5, 6}
    t = P.execute(i, "Clear(2, f=1)")
    assert ids(P.execute(Index(t, quantums={"f": "YMDH"}), q)) \
        == {3, 4, 5, 6, 7}


def test_range_keyed_columns(spark):
    i = _range_idx(spark, keyed_cols=True)
    q = "Row(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)"
    assert ids(P.execute(i, q)) == {"two", "three", "four", "five", "six",
                                    "seven"}
    t = P.execute(i, 'Clear("two", f=1)')
    assert ids(P.execute(Index(t, quantums={"f": "YMDH"}), q)) \
        == {"three", "four", "five", "six", "seven"}


def test_range_unix_timestamps(spark):
    """from=/to= as epoch seconds (946598400 = 1999-12-31T00:00Z,
    1009854000 = 2002-01-01T03:00Z)."""
    i = _range_idx(spark)
    q = "Row(f=1, from=946598400, to=1009854000)"
    assert ids(P.execute(i, q)) == {2, 3, 4, 5, 6, 7}
    t = P.execute(i, "Clear(2, f=1)")
    assert ids(P.execute(Index(t, quantums={"f": "YMDH"}), q)) \
        == {3, 4, 5, 6, 7}


def test_range_deprecated_alias_time(spark):
    """Range(f=1, from=, to=) — the deprecated spelling of the same
    ranged read (Range_Deprecated subtests; OldRange/OtherRange forms
    are parse-era relics the modern reference also refuses)."""
    i = _range_idx(spark)
    q = "Range(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)"
    assert ids(P.execute(i, q)) == {2, 3, 4, 5, 6, 7}


# ---- ClearRow subtests (:908-:1040) --------------------------------------

_CR_BITS = {3: [10], SW - 1: [10], SW + 1: [10, 20], 1: [20]}


def test_clearrow_set_with_changed_flags(spark):
    idx = _mk(spark, False, False, _CR_BITS)
    assert ids(P.execute(idx, "Row(f=10)")) == {3, SW - 1, SW + 1}
    assert clear_row_changed(idx.df, "f", 10)
    t = P.execute(idx, "ClearRow(f=10)")
    assert not clear_row_changed(t, "f", 10)  # second clear → false
    i = Index(t)
    assert ids(P.execute(i, "Row(f=10)")) == set()
    assert ids(P.execute(i, "Row(f=20)")) == {1, SW + 1}


def test_clearrow_mutex(spark):
    """Mutex variant: last write wins, so only {3, SW-1} hold 10."""
    mux = {3: 10, SW - 1: 10, SW + 1: 20, 1: 20}
    idx = Index(
        spark.createDataFrame(list(mux.items()), "_id long, f long")
    )
    assert ids(P.execute(idx, "Row(f=10)")) == {3, SW - 1}
    assert clear_row_changed(idx.df, "f", 10)
    t = P.execute(idx, "ClearRow(f=10)")
    assert not clear_row_changed(t, "f", 10)
    i = Index(t)
    assert ids(P.execute(i, "Row(f=10)")) == set()
    assert ids(P.execute(i, "Row(f=20)")) == {1, SW + 1}


def test_clearrow_time(spark):
    i = _range_idx(spark)
    q = "Row(f=1, from=1999-12-31T00:00, to=2003-01-01T03:00)"
    assert ids(P.execute(i, q)) == {2, 3, 4, 5, 6, 7}
    # single-day regression read
    assert ids(P.execute(
        i, "Row(f=1, from=2002-01-01T00:00, to=2002-01-02T00:00)"
    )) == {7}
    assert clear_row_changed(i.df, "f", 1)
    t = P.execute(i, "ClearRow(f=1)")
    i2 = Index(t, quantums={"f": "YMDH"})
    assert ids(P.execute(i2, q)) == set()
    assert ids(P.execute(
        i2, "Row(f=10, from=1999-12-31T00:00, to=2003-01-01T03:00)"
    )) == {2}


def test_clearrow_withkeys_untranslatable_is_false(spark):
    idx = Index(spark.createDataFrame([], "_id long, f array<string>"))
    assert not clear_row_changed(idx.df, "f", "bar")
    t = P.execute(idx, 'ClearRow(f="bar")')
    assert t.count() == 0


# ---- RowsTime (:1041-:1085) ----------------------------------------------


@pytest.fixture(scope="module")
def rows_time_idx(spark):
    idx = Index(
        spark.createDataFrame(
            [], "_id long, f array<struct<value: bigint, ts: timestamp>>"
        ),
        quantums={"f": "YMD"},
    )
    t = P.execute_all(
        idx,
        "Set(9, f=1, 2001-01-01T00:00) "
        "Set(9, f=2, 2002-01-01T00:00) "
        "Set(9, f=3, 2003-01-01T00:00) "
        "Set(9, f=4, 2004-01-01T00:00) "
        f"Set({SW + 9}, f=13, 2003-02-02T00:00)",
    )[-1]
    return Index(t, quantums={"f": "YMD"})


@pytest.mark.parametrize("q,exp", [
    ("Rows(f, from=1999-12-31T00:00, to=2002-01-01T03:00)", {1}),
    ("Rows(f, from=2002-01-01T00:00, to=2004-01-01T00:00)", {2, 3, 13}),
    ("Rows(f, from=1990-01-01T00:00, to=1999-01-01T00:00)", set()),
    ("Rows(f)", {1, 2, 3, 4, 13}),
    ("Rows(f, from=2002-01-01T00:00)", {2, 3, 4, 13}),
    ("Rows(f, to=2003-02-03T00:00)", {1, 2, 3, 13}),
    ("Rows(f, from=2002-01-01T00:00, to=2002-01-02T00:00)", {2}),
])
def test_rows_time(rows_time_idx, q, exp):
    out = P.execute(rows_time_idx, q)
    assert {r["f"] for r in out.collect()} == exp, q


def test_time_full_range_ignores_standard_only_bits(spark):
    """TimeQueriesFullRange regression kernel: bits written WITHOUT a
    timestamp live only in the standard view — a ranged query spanning
    every time view must NOT pick them up."""
    idx = Index(
        spark.createDataFrame(
            [], "_id string, f1 array<struct<value: string, ts: timestamp>>"
        ),
        quantums={"f1": "D"},
    )
    t = P.execute_all(
        idx,
        'Set("C1", f1="R1", 2022-01-10T00:00) '
        'Set("C2", f1="R1", 2022-01-11T00:00) '
        'Set("C3", f1="R1", 2022-01-12T00:00) '
        'Set("C4", f1="R1") Set("C5", f1="R1") Set("C6", f1="R1")',
    )[-1]
    i = Index(t, quantums={"f1": "D"})
    ranged = P.execute(
        i, 'Row(f1="R1", from=2022-01-01T00:00, to=2023-01-01T00:00)'
    )
    assert ids(ranged) == {"C1", "C2", "C3"}
    assert ids(P.execute(i, 'Row(f1="R1")')) \
        == {"C1", "C2", "C3", "C4", "C5", "C6"}


# ---- Row_BSIGroupEdge (:3290) --------------------------------------------


def test_bsi_edge_lt_gt_and_invalid_between(spark):
    idx = Index(
        spark.createDataFrame(
            [(100, 7, None, None), (200, None, -7, None),
             (300, None, None, 10)],
            "_id long, f1 long, f2 long, f3 long",
        ),
        field_types={"f1": "int", "f2": "int", "f3": "int"},
    )
    assert ids(P.execute(idx, "Row(f1 < 10)")) == {100}
    assert ids(P.execute(idx, "Row(f2 > -10)")) == {200}
    mx, mn = 2**63 - 1, -(2**63)
    for a, b in [(mx, mn), (mx, 1000), (-1000, mn)]:
        assert ids(P.execute(idx, f"Row({a} < f3 < {b})")) == set(), (a, b)


# ---- Range_BSIGroup_Deprecated (:3377) -----------------------------------


@pytest.fixture(scope="module")
def range_bsi_idx(spark):
    f = {0: [0], SW + 1: [0]}
    foo = {50: 20, SW: 30, SW + 2: 10, 5 * SW + 100: 20, SW + 1: 60}
    bar = {50: 2000}
    other = {0: 1000}
    edge = {0: 100, 1: -100}
    cols = sorted(set(f) | set(foo) | set(bar) | set(other) | set(edge))
    return Index(
        spark.createDataFrame(
            [(c, f.get(c), foo.get(c), bar.get(c), other.get(c),
              edge.get(c)) for c in cols],
            "_id long, f array<bigint>, foo long, bar long, other long, "
            "edge long",
        ),
        field_types={"foo": "int", "bar": "int", "other": "int",
                     "edge": "int"},
    )


@pytest.mark.parametrize("q,exp", [
    ("Range(foo == 20)", {50, 5 * SW + 100}),
    ("Range(other != null)", {0}),
    ("Range(foo != 20)", {SW, SW + 1, SW + 2}),
    ("Range(other != -20)", {0}),
    ("Range(foo < 20)", {SW + 2}),
    ("Range(foo <= 20)", {50, SW + 2, 5 * SW + 100}),
    ("Range(foo > 20)", {SW, SW + 1}),
    ("Range(foo >= 20)", {50, SW, SW + 1, 5 * SW + 100}),
    ("Range(0 < other < 1000)", set()),
    ("Range(0 <= other <= 1000)", {0}),
    ("Range(foo == 0)", set()),     # below the field min
    ("Range(foo == 200)", set()),   # above the field max
    ("Range(edge < 200)", {0, 1}),
    ("Range(edge > -1200)", {0, 1}),
])
def test_range_bsi_deprecated(range_bsi_idx, q, exp):
    assert ids(P.execute(range_bsi_idx, q)) == exp, q


def test_range_bsi_field_not_found(range_bsi_idx):
    with pytest.raises(ValueError, match="field not found"):
        P.execute(range_bsi_idx, "Range(bad_field >= 20)")
