"""Round-13 executor_test.go walk, part 2 — the keyed / distinct
batteries (r12 verdict ask #1):

- TestExecutor_Execute_Extract_Keyed (:5184-:5243)
- TestExecutor_Execute_Rows_Keys (:5712-:5876)
- TestExecutor_GroupByStrings (:5443-:5711)
- TestExecutor_ForeignIndex (:5877-:6004)
- TestExecutor_Execute_CountDistinct (:6968-:7141) + the timestamp
  count-distinct helper (:7141-:7174)
- TestExecutor_BareDistinct (:7175-:7208)
- TestExecutor_Execute_TopNDistinct (:7209-:7263)

DOCUMENTED DIVERGENCE (pql/calls.py Rows docstring, r12): keyed Rows
pages ``previous``/``limit`` in VALUE (lexicographic) order — a Spark
table has no key-creation order, while the reference pages in
translation-ID (creation) order. Cases where the two orders agree are
asserted against the reference's literals; diverging cases assert the
documented value-order result.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

pytestmark = pytest.mark.full  # exhaustive walk: nightly path (r14 test-gate split)
from pyspark.sql import functions as F

from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import (
    Distinct,
    DistinctAsRow,
    Index,
    Intersect,
    Row,
)

SW = 1 << 20


def ids(df):
    return {r["_id"] for r in df.collect()}


def vals(df, col):
    return {r[col] for r in df.collect()}


# ---- Extract_Keyed (:5184) ----------------------------------------------


def test_extract_keyed_set_field(spark):
    """Keyed Extract after a Clear: 'plugh' stays in the output with an
    EMPTY set (existence survives the cleared bit)."""
    df = spark.createDataFrame([], "_id string, set array<bigint>")
    idx = Index(df)
    t = P.execute_all(
        idx,
        'Set("h", set=1) Set("h", set=2) Set("xyzzy", set=2) '
        'Set("plugh", set=1)',
    )[-1]
    t = P.execute(Index(t), 'Clear("plugh", set=1)')
    out = P.execute(Index(t), "Extract(All(), Rows(set))")
    got = {r["_id"]: sorted(r["set"] or []) for r in out.collect()}
    assert got == {"h": [1, 2], "xyzzy": [2], "plugh": []}


# ---- Rows_Keys (:5712) ---------------------------------------------------


@pytest.fixture(scope="module")
def rows_keys_idx(spark):
    rows = []
    for shard in range(10):
        for i in range(shard, shard + 10):
            f = [str(r) for r in range(max(0, i - 2), i + 1)]
            rows.append((str(shard * SW + i), f, 1))
    df = spark.createDataFrame(
        rows, "_id string, f array<string>, f_id long"
    )
    return Index(df)


ALL_KEYS = {str(i) for i in range(19)}


@pytest.mark.parametrize(
    "q,exp",
    [
        # order-insensitive set comparisons (the reference asserts with
        # ElementsMatch) — our value order and the reference's creation
        # order agree on membership
        ("Rows(f)", ALL_KEYS),
        ("Rows(field=f)", ALL_KEYS),  # deprecated named form
        ("Rows(f, limit=2)", {"0", "1"}),
        ("Rows(field=f, limit=2)", {"0", "1"}),
        ('Rows(f, previous="11", limit=2)', {"12", "13"}),
        ('Rows(f, previous="1", limit=0)', set()),
        ('Rows(f, column="1")', {"0", "1"}),
        ('Rows(f, column="2")', {"0", "1", "2"}),
        ('Rows(f, column="3")', {"1", "2", "3"}),
        ('Rows(f, limit=2, column="3")', {"1", "2"}),
        (f'Rows(f, previous="15", column="{SW * 9 + 17}")', {"16", "17"}),
        (f'Rows(f, previous="11", limit=2, column="{SW * 5 + 14}")',
         {"12", "13"}),
        (f'Rows(f, previous="17", limit=5, column="{SW * 9 + 18}")', {"18"}),
        ('Rows(f, previous="18", column="19")', set()),
        ('Rows(f, like="__")', {str(i) for i in range(10, 19)}),
    ],
)
def test_rows_keys_reference_agreeing_cases(rows_keys_idx, q, exp):
    out = P.execute(rows_keys_idx, q)
    assert vals(out, "f") == exp, q


@pytest.mark.parametrize(
    "q,exp",
    [
        # reference (creation-ID order) expects {"16","17","18"} /
        # {"18"} / {} here; VALUE order continues past "18" into
        # "2".."9" — the documented keyed-paging divergence
        ('Rows(f, previous="15")',
         {"16", "17", "18"} | {str(i) for i in range(2, 10)}),
        ('Rows(f, previous="18")', {str(i) for i in range(2, 10)}),
    ],
)
def test_rows_keys_paging_divergence_value_order(rows_keys_idx, q, exp):
    out = P.execute(rows_keys_idx, q)
    assert vals(out, "f") == exp, q


def test_rows_keys_like_refusals(rows_keys_idx):
    """like=7 fails at parse/compile ("parsing:" prefix in the
    reference — the underlying CheckCallInfo wrong-type text is what
    our door raises, test_query_error_mirrors pins the family);
    like="__" on an unkeyed field refuses at translation
    (executor_test.go:5835-5842)."""
    with pytest.raises(ValueError, match="arg 'like' wrong type"):
        P.execute(rows_keys_idx, "Rows(f_id, like=7)")
    with pytest.raises(ValueError, match="translating call"):
        P.execute(rows_keys_idx, 'Rows(f_id, like="__")')


# ---- GroupByStrings (:5443) ----------------------------------------------


@pytest.fixture(scope="module")
def gbs_idx(spark):
    v = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    vv = [1, 2, 2, 3, 3, 3, 4, 4, 4, 4]
    nv = [-1, -2, -2, -3, -3, -3, -4, -4, -4, -4]
    dv = [111, 222, 333, 444, 555, 666, 777, 888, 999, 1000]
    ndv = [-111, -222, -333, -444, -555, -666, -777, -888, -999, -1000]
    rows = [
        (
            f"c{i + 1}",
            ["r1" if i % 2 == 0 else "r2"],
            v[i],
            vv[i],
            nv[i],
            Decimal(dv[i]) / 100,
            Decimal(ndv[i]) / 10,
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "_id string, generals array<string>, v long, vv long, nv long, "
        "dv decimal(20,2), ndv decimal(20,1)",
    )
    return Index(df, field_types={"v": "int", "vv": "int", "nv": "int",
                                  "dv": "decimal", "ndv": "decimal"})


def groups(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_gbs_basic(gbs_idx):
    got = groups(P.execute(gbs_idx, "GroupBy(Rows(generals))"),
                 "generals", "count")
    assert got == {("r1", 5), ("r2", 5)}


def test_gbs_filter_bare_key(gbs_idx):
    got = groups(
        P.execute(gbs_idx, "GroupBy(Rows(generals), filter=Row(generals=r2))"),
        "generals", "count",
    )
    assert got == {("r2", 5)}


def test_gbs_sum_int(gbs_idx):
    got = groups(
        P.execute(gbs_idx, "GroupBy(Rows(generals), aggregate=Sum(field=v))"),
        "generals", "count", "sum",
    )
    assert got == {("r1", 5, 25), ("r2", 5, 30)}


def test_gbs_sum_decimal(gbs_idx):
    got = {
        (r["generals"], r["count"], float(r["sum"]))
        for r in P.execute(
            gbs_idx, "GroupBy(Rows(generals), aggregate=Sum(field=dv))"
        ).collect()
    }
    assert got == {("r1", 5, 27.75), ("r2", 5, 32.20)}


def test_gbs_sum_negative_decimal(gbs_idx):
    got = {
        (r["generals"], r["count"], float(r["sum"]))
        for r in P.execute(
            gbs_idx, "GroupBy(Rows(generals), aggregate=Sum(field=ndv))"
        ).collect()
    }
    assert got == {("r1", 5, -277.5), ("r2", 5, -322.0)}


def test_gbs_having_sum_gt(gbs_idx):
    got = groups(
        P.execute(
            gbs_idx,
            "GroupBy(Rows(generals), aggregate=Sum(field=v), "
            "having=Condition(sum>25))",
        ),
        "generals", "count", "sum",
    )
    assert got == {("r2", 5, 30)}


def test_gbs_having_sum_range(gbs_idx):
    got = groups(
        P.execute(
            gbs_idx,
            "GroupBy(Rows(generals), aggregate=Sum(field=v), "
            "having=Condition(-5<sum<27))",
        ),
        "generals", "count", "sum",
    )
    assert got == {("r1", 5, 25)}


def test_gbs_having_count_empty(gbs_idx):
    out = P.execute(
        gbs_idx,
        "GroupBy(Rows(generals), aggregate=Sum(field=v), "
        "having=Condition(count>5))",
    )
    assert out.count() == 0


def test_gbs_bsi_int_grouping(gbs_idx):
    got = groups(P.execute(gbs_idx, "GroupBy(Rows(v))"), "v", "count")
    assert got == {(i, 1) for i in range(1, 11)}


def test_gbs_vv_sum_having(gbs_idx):
    got = groups(
        P.execute(
            gbs_idx,
            "GroupBy(Rows(vv), aggregate=Sum(field=vv), "
            "having=Condition(count > 2))",
        ),
        "vv", "count", "sum",
    )
    assert got == {(3, 3, 9), (4, 4, 16)}


def test_gbs_nv_limit_is_value_ascending(gbs_idx):
    """limit=2 without sort keeps BSI row (value-ascending) order:
    -4 then -3 (executor_test.go GroupByStrings limit case)."""
    out = P.execute(
        gbs_idx, "GroupBy(Rows(nv), aggregate=Sum(field=nv), limit=2)"
    ).collect()
    assert [(r["nv"], r["count"], r["sum"]) for r in out] == [
        (-4, 4, -16), (-3, 3, -9)
    ]


def test_gbs_nv_having_limit(gbs_idx):
    out = P.execute(
        gbs_idx,
        "GroupBy(Rows(nv), aggregate=Sum(field=nv), "
        "having=Condition(count > 2), limit=2)",
    ).collect()
    assert [(r["nv"], r["count"], r["sum"]) for r in out] == [
        (-4, 4, -16), (-3, 3, -9)
    ]


def test_gbs_two_field(gbs_idx):
    got = groups(
        P.execute(
            gbs_idx,
            "GroupBy(Rows(vv), Rows(nv), aggregate=Sum(field=vv), "
            "having=Condition(count > 2))",
        ),
        "vv", "nv", "count", "sum",
    )
    assert got == {(3, -3, 3, 9), (4, -4, 4, 16)}


# ---- ForeignIndex (:5877) ------------------------------------------------


@pytest.fixture(scope="module")
def fk_indexes(spark):
    parent = Index(
        spark.createDataFrame(
            [("one", [1, SW]), ("two", [1]), ("three", [1]),
             ("twenty-one", [2, SW]), ("twenty-two", [2]),
             ("twenty-three", [2])],
            "_id string, general array<bigint>",
        )
    )
    child = Index(
        spark.createDataFrame(
            [(1, "one", ["one"], ["red"]),
             (2, "two", ["two"], ["blue"]),
             (SW, "one", ["one"], ["blue"]),
             (4, "twenty-one", ["twenty-one"], ["red"])],
            "_id long, parent_id string, parent_set_id array<string>, "
            "color array<string>",
        ),
        # parent_id is the reference's FieldTypeInt + OptFieldForeignIndex
        # (executor_test.go:5885-5888): a BSI field whose values are the
        # PARENT's keys — declared int so it keeps the full BSI op set
        # (!= against a value is legal, unlike set/mutex fields)
        field_types={"parent_id": "int"},
    )
    return parent, child


def test_fk_distinct_both_field_kinds(fk_indexes):
    _, child = fk_indexes
    assert vals(P.execute(child, "Distinct(field=parent_id)"), "parent_id") \
        == {"one", "two", "twenty-one"}
    assert vals(
        P.execute(child, "Distinct(field=parent_set_id)"), "parent_set_id"
    ) == {"one", "two", "twenty-one"}


def test_fk_row_eq_and_neq(fk_indexes):
    _, child = fk_indexes
    assert ids(P.execute(child, 'Row(parent_id=="one")')) == {1, SW}
    assert ids(P.execute(child, 'Row(parent_id!="one")')) == {2, 4}


def test_fk_cross_index_join(fk_indexes):
    """Intersect(Row(general=SW), Distinct(Row(color="blue"),
    index=child, field=parent_id)) on the PARENT → {"one"} — the
    cross-index form via DistinctAsRow(source=child)."""
    parent, child = fk_indexes
    for fk_field in ("parent_id", "parent_set_id"):
        q = Intersect(
            Row("general", "==", SW),
            DistinctAsRow(
                Distinct(field=fk_field, filter=Row("color", "==", "blue")),
                source=child,
            ),
        )
        assert ids(q.ids(parent)) == {"one"}


# ---- CountDistinct (:6968) -----------------------------------------------


@pytest.fixture(scope="module")
def cd_indexes(spark):
    """Three indexes e/s/t with identical data (the reference applies
    the same writeQuery to every schema index)."""

    def mk():
        return Index(
            spark.createDataFrame(
                [
                    (100, ["AntidotePoint", "TwoPoints"], [100], [100], [100]),
                    (101, ["TwoPoints"], [101], None, None),
                    (102, None, [102], None, None),
                ],
                "_id long, type array<string>, equip_id array<bigint>, "
                "site_id array<bigint>, id array<bigint>",
            )
        )

    return mk(), mk(), mk()


def _distinct_of_distincts(cd_indexes):
    e, s, t = cd_indexes
    inner = Intersect(
        DistinctAsRow(
            Distinct(field="equip_id",
                     filter=Intersect(Row("type", "==", "AntidotePoint"))),
            source=e,
        ),
        DistinctAsRow(
            Distinct(field="equip_id",
                     filter=Intersect(Row("type", "==", "TwoPoints"))),
            source=s,
        ),
    )
    return Distinct(field="site_id", filter=inner)


def test_count_distinct_distinct_of_distincts(cd_indexes):
    _, _, t = cd_indexes
    out = _distinct_of_distincts(cd_indexes).to_df(t)
    assert vals(out, "site_id") == {100}


def test_count_distinct_count_wrap(cd_indexes):
    from featurebase_spark.pql.calls import Count

    _, _, t = cd_indexes
    out = Count(_distinct_of_distincts(cd_indexes)).to_df(t)
    assert out.first()["count"] == 1


def test_count_distinct_groupby_wrap(cd_indexes):
    from featurebase_spark.pql.calls import GroupBy, Rows

    _, _, t = cd_indexes
    out = GroupBy(
        [Rows("type")],
        filter=DistinctAsRow(_distinct_of_distincts(cd_indexes), source=t),
    ).to_df(t)
    got = {(r["type"], r["count"]) for r in out.collect()}
    assert got == {("AntidotePoint", 1), ("TwoPoints", 1)}


def test_count_distinct_store_wrap(cd_indexes):
    _, _, t = cd_indexes
    t1 = P.execute(t, 'Store(Distinct(field=equip_id), type="a")')
    assert ids(P.execute(Index(t1), 'Row(type="a")')) == {100, 101, 102}
    t2 = P.execute(
        Index(t1), 'Store(Distinct(Row(type="TwoPoints"), field=equip_id), '
        'type="b")'
    )
    assert ids(P.execute(Index(t2), 'Row(type="b")')) == {100, 101}


def test_count_distinct_timestamp(spark):
    """variousQueriesCountDistinctTimestamp (:7141-:7174): Count of
    distinct timestamp values, with a shard carrying NO timestamp data,
    and the filtered form whose filter empties some shards."""
    data = [
        "2010-01-02T12:32:00", "2010-04-20T12:32:00",
        "2011-04-20T12:59:00", "2011-04-20T12:40:00",
        "2011-04-20T12:32:00",
    ]
    import datetime as dt

    rows = [(i * SW, dt.datetime.fromisoformat(d), None)
            for i, d in enumerate(data)]
    rows.append((8 * SW, None, [0]))
    idx = Index(
        spark.createDataFrame(rows, "_id long, ts timestamp, set array<bigint>"),
        field_types={"ts": "timestamp"},
    )
    assert P.execute(idx, "Count(Distinct(field=ts))").first()["count"] == 5
    out = P.execute(
        idx, 'Count(Distinct(Row(ts > "2011-01-01T00:00:00Z"), field=ts))'
    )
    assert out.first()["count"] == 3


# ---- BareDistinct (:7175) ------------------------------------------------


def test_bare_distinct_bsi(spark):
    idx = Index(
        spark.createDataFrame([(0, 1, 1), (SW, 2, None)],
                              "_id long, ints long, filter long"),
        field_types={"ints": "int"},
    )
    assert vals(P.execute(idx, 'Distinct(field="ints")'), "ints") == {1, 2}


# ---- TopNDistinct (:7209) ------------------------------------------------


def test_topn_distinct_src(spark):
    idx = Index(
        spark.createDataFrame(
            [(100, ["AntidotePoint"], [100], [100], [100])],
            "_id long, type array<string>, equip_id array<bigint>, "
            "site_id array<bigint>, id array<bigint>",
        )
    )
    out = P.execute(
        idx, "TopN(type, Distinct(Row(type=AntidotePoint), field=equip_id))"
    ).collect()
    assert len(out) == 1
    assert out[0]["count"] == 1
