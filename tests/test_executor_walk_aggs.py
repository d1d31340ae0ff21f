"""Round-13 executor_test.go walk, part 3 — TopN / Min / Max / Sum
batteries (r12 verdict ask #1):

- TestExecutor_Execute_TopN (:1846-:2086) incl. ErrFieldNotFound,
  ErrBSIField, ErrCacheNone
- TestExecutor_Execute_TopN_fill (:2087) / _fill_small (:2114) —
  cross-shard merge correctness (the reference's fill heuristic must
  not under-count; our exact plan must agree)
- TestExecutor_Execute_TopN_Src (:2151)
- TestExecutor_Execute_MinMax (:2192-:2661) — int/decimal/timestamp
  offsets, ColumnID/ColumnKey filter matrices
- TestExecutor_Execute_MinMaxRow (:2662-:2781)
- TestExecutor_Execute_Sum (:2782-:2975)
- TestExecutor_DecimalArgs (:2976-:3006)
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)
from pyspark.sql import functions as F

from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index

SW = 1 << 20


def pairs(df, field):
    return [(r[field], r["count"]) for r in df.collect()]


# ---- TopN (:1846) --------------------------------------------------------


def _topn_idx(spark, keyed_cols=False, keyed_rows=False):
    def k(i):
        return f"c{i}" if keyed_cols else i

    def r(v):
        return {0: "zero", 10: "ten", 20: "twenty"}[v] if keyed_rows else v

    data = {}
    for col, row in [
        (0, 0), (1, 0), (SW, 0), (SW + 2, 0), (5 * SW + 100, 0),
        (0, 10), (SW, 10), (SW, 20),
    ]:
        data.setdefault(k(col), []).append(r(row))
    rows = [(c, sorted(set(v), key=str), [r(0)] if c == k(0) else None)
            for c, v in data.items()]
    t = "string" if keyed_cols else "long"
    ft = "string" if keyed_rows else "bigint"
    return Index(
        spark.createDataFrame(
            rows, f"_id {t}, f array<{ft}>, other array<{ft}>"
        )
    )


def test_topn_rowid_columnid(spark):
    out = P.execute(_topn_idx(spark), "TopN(f, n=2)")
    assert pairs(out, "f") == [(0, 5), (10, 2)]


def test_topn_rowid_columnkey(spark):
    out = P.execute(_topn_idx(spark, keyed_cols=True), "TopN(f, n=2)")
    assert pairs(out, "f") == [(0, 5), (10, 2)]


def test_topn_rowkey_columnkey(spark):
    out = P.execute(
        _topn_idx(spark, keyed_cols=True, keyed_rows=True), "TopN(f, n=2)"
    )
    assert pairs(out, "f") == [("zero", 5), ("ten", 2)]


def test_topn_err_field_not_found(spark):
    idx = Index(spark.createDataFrame([(0, [0, 1])], "_id long, f array<bigint>"))
    with pytest.raises(ValueError, match='field "g" not found'):
        P.execute(idx, "TopN(g, n=2)")


def test_topn_err_bsi_field(spark):
    idx = Index(
        spark.createDataFrame([(0, 5)], "_id long, f long"),
        field_types={"f": "int"},
    )
    with pytest.raises(
        ValueError,
        match="cannot compute TopN\\(\\) on integer, decimal, or "
        'timestamp field: "f"',
    ):
        P.execute(idx, "TopN(f, n=2)")


def test_topn_err_cache_none(spark):
    idx = Index(
        spark.createDataFrame([(0, [0, 1])], "_id long, f array<bigint>"),
        no_cache={"f"},
    )
    with pytest.raises(
        ValueError, match='cannot compute TopN\\(\\), field has no cache: "f"'
    ):
        P.execute(idx, "TopN(f, n=2)")


def test_topn_fill(spark):
    """:2087 — cross-shard counts merge exactly: row 0 has 3 bits in
    shard 0 + 1 in shard 1 = 4."""
    rows = [(0, [0]), (1, [0]), (2, [0]), (SW, [0, 1]), (SW + 2, [1])]
    idx = Index(spark.createDataFrame(rows, "_id long, f array<bigint>"))
    assert pairs(P.execute(idx, "TopN(f, n=1)"), "f") == [(0, 4)]


def test_topn_fill_small(spark):
    """:2114 — a row spread 1-per-shard across 5 shards still beats
    rows with 2 bits in one shard."""
    rows = []
    for s in range(5):
        rows.append((s * SW, [0] + ([1] if s == 0 else [])))
    rows += [(1, [1]), (SW + 1, [2]), (2 * SW + 1, [3]), (3 * SW + 1, [4])]
    # rows: 0 → shards 0..4 (5 bits); 1 → {0,1}; 2 → {SW, SW+1}; …
    rows_fixed = [
        (0, [0, 1]), (SW, [0, 2]), (2 * SW, [0, 3]), (3 * SW, [0, 4]),
        (4 * SW, [0]),
        (1, [1]), (SW + 1, [2]), (2 * SW + 1, [3]), (3 * SW + 1, [4]),
    ]
    idx = Index(spark.createDataFrame(rows_fixed, "_id long, f array<bigint>"))
    assert pairs(P.execute(idx, "TopN(f, n=1)"), "f") == [(0, 5)]


def test_topn_src(spark):
    """:2151 — TopN over a source row: only records in Row(other=100)
    count."""
    f_bits = {0: [0], 1: [0], SW: [0, 10, 20], SW + 1: [10, 20],
              SW + 2: [20]}
    other = {SW: [100], SW + 1: [100], SW + 2: [100]}
    rows = [(c, f_bits.get(c), other.get(c))
            for c in sorted(set(f_bits) | set(other))]
    idx = Index(
        spark.createDataFrame(
            rows, "_id long, f array<bigint>, other array<bigint>"
        )
    )
    out = P.execute(idx, "TopN(f, Row(other=100), n=3)")
    assert pairs(out, "f") == [(20, 3), (10, 2), (0, 1)]


# ---- MinMax (:2192) ------------------------------------------------------


@pytest.mark.parametrize("mn,mx,setval", [
    (10, 20, 11), (-10, 20, 11), (-10, 20, -9), (-20, -10, -11),
])
def test_minmax_int_offsets(spark, mn, mx, setval):
    """WithOffset/Int: the stored value round-trips regardless of the
    field's [min,max] base offset, in all three field-arg spellings."""
    idx = Index(
        spark.createDataFrame([(10, setval)], "_id long, f long"),
        field_types={"f": "int"},
    )
    for q in ("Min(field=f)", 'Min(field="f")', "Min(f)",
              "Max(field=f)", 'Max(field="f")', "Max(f)"):
        r = P.execute(idx, q).first()
        assert (r[0], r["count"]) == (setval, 1), q


@pytest.mark.parametrize("setval,exp", [
    (Decimal("11.50"), 11.50),
    (Decimal("-9.50"), -9.50),
    (Decimal("-11.50"), -11.50),
])
def test_minmax_decimal_offsets(spark, setval, exp):
    """WithOffset/Decimal — with OTHER shards holding no decimal values
    (the z-field records), which must not perturb the result."""
    rows = [(6700000, setval, None)]
    for c in (1, 1234567, 2345678, 3456789, 4567890):
        rows.append((c, None, [0]))
    idx = Index(
        spark.createDataFrame(
            rows, "_id long, f decimal(20,2), z array<bigint>"
        ),
        field_types={"f": "decimal"},
    )
    for q in ("Min(field=f)", "Max(field=f)", "Min(f)", "Max(f)"):
        r = P.execute(idx, q).first()
        assert (float(r[0]), r["count"]) == (exp, 1), q


def test_minmax_timestamp(spark):
    ts = dt.datetime(2000, 1, 11)
    idx = Index(
        spark.createDataFrame([(10, ts)], "_id long, f timestamp"),
        field_types={"f": "timestamp"},
    )
    for q in ("Min(field=f)", 'Min(field="f")', "Min(f)",
              "Max(field=f)", 'Max(field="f")', "Max(f)"):
        r = P.execute(idx, q).first()
        assert (r[0], r["count"]) == (ts, 1), q


@pytest.fixture(scope="module")
def minmax_filter_idx(spark):
    x = {0: [0], 3: [0], SW + 1: [0], 1: [1], SW + 2: [2]}
    f = {0: 20, 1: -5, 2: -5, 3: 10, SW: 30, SW + 2: 40,
         5 * SW + 100: 50, SW + 1: 60}
    rows = [(c, x.get(c), f.get(c)) for c in sorted(set(x) | set(f))]
    return Index(
        spark.createDataFrame(rows, "_id long, x array<bigint>, f long"),
        field_types={"f": "int"},
    )


@pytest.mark.parametrize("filt,exp,cnt", [
    ("", -5, 2), ("Row(x=0)", 10, 1), ("Row(x=1)", -5, 1),
    ("Row(x=2)", 40, 1),
])
def test_minmax_columnid_min_filters(minmax_filter_idx, filt, exp, cnt):
    q = "Min(field=f)" if not filt else f"Min({filt}, field=f)"
    r = P.execute(minmax_filter_idx, q).first()
    assert (r["min"], r["count"]) == (exp, cnt)


@pytest.mark.parametrize("filt,exp,cnt", [
    ("", 60, 1), ("Row(x=0)", 60, 1), ("Row(x=1)", -5, 1),
    ("Row(x=2)", 40, 1),
])
def test_minmax_columnid_max_filters(minmax_filter_idx, filt, exp, cnt):
    q = "Max(field=f)" if not filt else f"Max({filt}, field=f)"
    r = P.execute(minmax_filter_idx, q).first()
    assert (r["max"], r["count"]) == (exp, cnt)


def test_minmax_columnkey_filters(spark):
    """ColumnKey variant — same values on a keyed index."""
    x = {"zero": [0], "three": [0], "sw1": [0], "one": [1], "sw2": [2]}
    f = {"zero": 20, "one": -5, "two": -5, "three": 10, "sw": 30,
         "sw2": 40, "sw3": 50, "sw1": 60}
    rows = [(c, x.get(c), f.get(c)) for c in sorted(set(x) | set(f))]
    idx = Index(
        spark.createDataFrame(rows, "_id string, x array<bigint>, f long"),
        field_types={"f": "int"},
    )
    for q, exp, cnt in [
        ("Min(field=f)", -5, 2), ("Min(Row(x=0), field=f)", 10, 1),
        ("Max(field=f)", 60, 1), ("Max(Row(x=2), field=f)", 40, 1),
    ]:
        r = P.execute(idx, q).first()
        assert (r[0], r["count"]) == (exp, cnt), q


# ---- MinMaxRow (:2662) ---------------------------------------------------


def test_minmaxrow_rowid(spark):
    f = {0: [7000], 3: [50], SW + 1: [10000], 1000: [1], SW + 2: [5000]}
    idx = Index(
        spark.createDataFrame(
            [(c, v) for c, v in f.items()], "_id long, f array<bigint>"
        )
    )
    r = P.execute(idx, "MinRow(field=f)").first()
    assert (r["f"], r["count"]) == (1, 1)
    r = P.execute(idx, "MaxRow(field=f)").first()
    assert (r["f"], r["count"]) == (10000, 1)
    with pytest.raises(ValueError, match="field not found"):
        P.execute(idx, "MinRow(field=fake)")
    with pytest.raises(ValueError, match="field not found"):
        P.execute(idx, "MaxRow(field=fake)")


def test_minmaxrow_rowkey_value_order(spark):
    """RowKey: the reference ranks keyed rows by CREATION ID
    (MinRow = "seven-thousand", created first; MaxRow =
    "five-thousand", created last). A Spark table has no creation
    order — keyed rows rank in VALUE order (the documented keyed-
    ordering divergence, pql/calls.py Rows docstring): MinRow =
    "fifty", MaxRow = "ten-thousand"."""
    f = {0: ["seven-thousand"], 3: ["fifty"], SW + 1: ["ten-thousand"],
         1000: ["one"], SW + 2: ["five-thousand"]}
    idx = Index(
        spark.createDataFrame(
            [(c, v) for c, v in f.items()], "_id long, f array<string>"
        )
    )
    r = P.execute(idx, "MinRow(field=f)").first()
    assert (r["f"], r["count"]) == ("fifty", 1)
    r = P.execute(idx, "MaxRow(field=f)").first()
    assert (r["f"], r["count"]) == ("ten-thousand", 1)


# ---- Sum (:2782) ---------------------------------------------------------


@pytest.fixture(scope="module")
def sum_idx(spark):
    x = {0: [0], SW + 1: [0]}
    foo = {0: 20, SW: 30, SW + 2: 40, 5 * SW + 100: 50, SW + 1: 60}
    bar = {0: 2000}
    other = {0: 1000}
    dec = {0: Decimal("100.001"), SW: Decimal("200.002"),
           SW + 1: Decimal("400.004")}
    cols = sorted(set(x) | set(foo) | set(bar) | set(other) | set(dec))
    rows = [(c, x.get(c), foo.get(c), bar.get(c), other.get(c), dec.get(c))
            for c in cols]
    return Index(
        spark.createDataFrame(
            rows,
            "_id long, x array<bigint>, foo long, bar long, other long, "
            "dec decimal(20,3)",
        ),
        field_types={"foo": "int", "bar": "int", "other": "int",
                     "dec": "decimal"},
    )


def test_sum_integer_all_spellings(sum_idx):
    for q in ("Sum(field=foo)", 'Sum(field="foo")', "Sum(foo)"):
        r = P.execute(sum_idx, q).first()
        assert (r["sum"], r["count"]) == (200, 5), q


def test_sum_with_filter_both_arg_orders(sum_idx):
    for q in ("Sum(Row(x=0), field=foo)", "Sum(foo, Row(x=0))"):
        r = P.execute(sum_idx, q).first()
        assert (r["sum"], r["count"]) == (80, 2), q


def test_sum_nonexistent_field(sum_idx):
    with pytest.raises(ValueError, match="field not found"):
        P.execute(sum_idx, "Sum(field=fake)")


def test_sum_decimal(sum_idx):
    for q in ("Sum(field=dec)", "Sum(dec)"):
        r = P.execute(sum_idx, q).first()
        assert (float(r["sum"]), r["count"]) == (700.007, 3), q
    for q in ("Sum(Row(x=0), field=dec)", "Sum(dec, Row(x=0))"):
        r = P.execute(sum_idx, q).first()
        assert (float(r["sum"]), r["count"]) == (500.005, 2), q


def test_sum_columnkey(spark):
    x = {"zero": [0], "sw1": [0]}
    foo = {"zero": 20, "sw": 30, "sw2": 40, "sw3": 50, "sw1": 60}
    cols = sorted(set(x) | set(foo))
    idx = Index(
        spark.createDataFrame(
            [(c, x.get(c), foo.get(c)) for c in cols],
            "_id string, x array<bigint>, foo long",
        ),
        field_types={"foo": "int"},
    )
    r = P.execute(idx, "Sum(field=foo)").first()
    assert (r["sum"], r["count"]) == (200, 5)
    r = P.execute(idx, "Sum(Row(x=0), field=foo)").first()
    assert (r["sum"], r["count"]) == (80, 2)


# ---- DecimalArgs (:2976) -------------------------------------------------


def test_decimal_args_int_literal_into_decimal_field(spark):
    """Set(0, f=0) — an integer literal lands in a decimal(2) field
    with min/max declared as decimals."""
    idx = Index(
        spark.createDataFrame([], "_id long, f decimal(20,2)"),
        field_types={"f": "decimal"},
    )
    t = P.execute(idx, "Set(0, f=0)")
    got = {r["_id"]: float(r["f"]) for r in t.collect()}
    assert got == {0: 0.0}
