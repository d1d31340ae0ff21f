"""Mirrors of the reference's executor_test.go GroupBy / Rows edge cases
(round-11 verdict ask #7) — the per-call semantics the defs_* corpus
never exercises.

Fixture = the exact ImportBits data of TestExecutor_Execute_GroupBy
(executor_test.go:6033-6260): set fields `general`/`sub` (array columns
here — a record can hold SEVERAL rows of a set field), BSI int `v`, and
record ids straddling a shard boundary (SW) to keep the multi-shard
shape of the original. The pinned semantics:

- Sum aggregate: Count counts only records WITH a value in the
  aggregated field; all-null groups drop (groupByIterator.Next,
  executor.go:8901-8919).
- Count(Distinct): plain Count plus an `aggregate` column; zero-
  aggregate groups are KEPT (coordinator pass, executor.go:3340-3386).
- previous paging: lexicographic group-tuple cursor with odometer
  wrapping across fields (executor_test.go "test wrapping with
  previous" / "previous is last result" / "wrapping multiple").
- sort: comma-separated count/aggregate/sum directives, direction
  defaults to DESC, stable w.r.t. group order (getSorter,
  executor.go:3117-3156).
- error texts: executor.go:3181 (no child), pql/ast.go:810 (negative
  limit), executor.go:4012 ('in' exclusivity), executor.go:3398-3404
  (Condition subjects), executor.go:3146 (sort subjects).
"""

from __future__ import annotations

import pytest

from featurebase_spark.pql import GroupBy, Index, Row, Rows

SW = 1 << 20  # pilosa ShardWidth — only the straddle matters, not the value


@pytest.fixture(scope="module")
def gidx(spark):
    rows = [
        (0, [10], [100, 110], 10),
        (1, [10], [100], 100),
        (2, [11, 12], [110], None),
        (3, None, [100], None),
        (SW + 1, [10], [100], None),
        (SW + 2, [11, 12], None, None),
        (SW + 10, None, None, 100),
    ]
    df = spark.createDataFrame(
        rows, "_id long, general array<bigint>, sub array<bigint>, v long"
    )
    return Index(df)


def groups(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


# ---- basic / filter (executor_test.go "Basic", "Filter") -----------------


def test_basic_two_field(gidx):
    got = groups(
        GroupBy([Rows("general"), Rows("sub")]).to_df(gidx),
        "general", "sub", "count",
    )
    assert got == {(10, 100, 3), (10, 110, 1), (11, 110, 1), (12, 110, 1)}


def test_filter_row(gidx):
    got = groups(
        GroupBy([Rows("general"), Rows("sub")], filter=Row("general", "==", 10))
        .to_df(gidx),
        "general", "sub", "count",
    )
    assert got == {(10, 100, 3), (10, 110, 1)}


# ---- aggregate semantics ("Aggregate", "AggregateCountDistinct*") --------


def test_sum_counts_only_valued_records_and_drops_empty(gidx):
    """Count=2 for (10,100) although the group holds 3 records — SW+1
    has no v; (11,110)/(12,110) vanish entirely (all-null v)."""
    got = groups(
        GroupBy(
            [Rows("general"), Rows("sub")], aggregate=("sum", "v")
        ).to_df(gidx),
        "general", "sub", "count", "sum",
    )
    assert got == {(10, 100, 2, 110), (10, 110, 1, 10)}


def test_count_distinct_keeps_zero_agg_groups(gidx):
    got = groups(
        GroupBy(
            [Rows("general"), Rows("sub")],
            aggregate=("count_distinct", "v"),
        ).to_df(gidx),
        "general", "sub", "count", "aggregate",
    )
    assert got == {
        (10, 100, 3, 2),
        (10, 110, 1, 1),
        (11, 110, 1, 0),
        (12, 110, 1, 0),
    }


def test_count_distinct_with_outer_filter(gidx):
    got = groups(
        GroupBy(
            [Rows("general"), Rows("sub")],
            filter=Row("v", ">", 10),
            aggregate=("count_distinct", "v"),
        ).to_df(gidx),
        "general", "sub", "count", "aggregate",
    )
    assert got == {(10, 100, 1, 1)}


def test_count_distinct_with_inner_distinct_filter(gidx):
    """Count(Distinct(Row(v > 10), field=v)): the inner filter restricts
    only the DISTINCT side; plain counts stay the Basic ones."""
    got = groups(
        GroupBy(
            [Rows("general"), Rows("sub")],
            aggregate=("count_distinct", "v", Row("v", ">", 10)),
        ).to_df(gidx),
        "general", "sub", "count", "aggregate",
    )
    assert got == {
        (10, 100, 3, 1),
        (10, 110, 1, 0),
        (11, 110, 1, 0),
        (12, 110, 1, 0),
    }


# ---- previous paging ("check field offset no limit"/"limit") -------------


def test_previous_single_field(gidx):
    got = groups(
        GroupBy([Rows("general", previous=10)]).to_df(gidx),
        "general", "count",
    )
    assert got == {(11, 2), (12, 2)}


def test_previous_single_field_with_limit(gidx):
    rows = GroupBy([Rows("general", previous=10)], limit=1).to_df(
        gidx
    ).collect()
    assert [(r["general"], r["count"]) for r in rows] == [(11, 2)]


# ---- odometer wrapping (wa/wb/wc fixture, executor_test.go:6204-6250) ----


@pytest.fixture(scope="module")
def widx(spark):
    # wa/wb/wc identical: 0→{0,1,2}, 1→{1}, 2→{0,2}, 3→{3}
    member = {0: [0, 2], 1: [0, 1], 2: [0, 2], 3: [3]}
    rows = [(c, member[c], member[c], member[c]) for c in range(4)]
    df = spark.createDataFrame(
        rows,
        "_id long, wa array<bigint>, wb array<bigint>, wc array<bigint>",
    )
    return Index(df)


def test_wrapping_with_previous(widx):
    """previous=1 on the LAST field only: resume strictly after group
    (0,0,1) in odometer order — (0,0,2) first, then WRAP to (0,1,0)."""
    rows = GroupBy(
        [Rows("wa"), Rows("wb"), Rows("wc", previous=1)], limit=3
    ).to_df(widx).collect()
    got = [(r["wa"], r["wb"], r["wc"], r["count"]) for r in rows]
    assert got == [(0, 0, 2, 2), (0, 1, 0, 1), (0, 1, 1, 1)]


def test_previous_is_last_result_returns_empty(widx):
    rows = GroupBy(
        [
            Rows("wa", previous=3),
            Rows("wb", previous=3),
            Rows("wc", previous=3),
        ],
        limit=3,
    ).to_df(widx).collect()
    assert rows == []


def test_wrapping_multiple_previous(widx):
    """previous on the two trailing fields, none on the first: cursor =
    (first(wa)=0, 2, 2); every (0,2,>2)/(0,3,*) group is empty, so the
    first result wraps all the way to (1,0,0)."""
    rows = GroupBy(
        [Rows("wa"), Rows("wb", previous=2), Rows("wc", previous=2)],
        limit=1,
    ).to_df(widx).collect()
    got = [(r["wa"], r["wb"], r["wc"], r["count"]) for r in rows]
    assert got == [(1, 0, 0, 1)]


def test_tricky_data_limit_skips_empty_first_group(spark):
    """limit=1 must deliver the first NON-EMPTY group in group order —
    (a0,b0) is empty, the answer is (a0,b1)."""
    df = spark.createDataFrame(
        [(1, [0], [1]), (SW + 1, [1], [0])],
        "_id long, a array<bigint>, b array<bigint>",
    )
    rows = GroupBy([Rows("a"), Rows("b")], limit=1).to_df(Index(df)).collect()
    assert [(r["a"], r["b"], r["count"]) for r in rows] == [(0, 1, 1)]


# ---- sort directives (executor_test.go:8947-8983) -------------------------


@pytest.fixture(scope="module")
def likes_idx(spark):
    # 6 people: each likes icecream + one unique thing; worth 10^i
    uniq = [1, 2, 3, 4, 5, 6]  # molecula..dog as numeric rows
    rows = [
        (i, [0, uniq[i]], 10**i) for i in range(6)
    ]  # likes row 0 = icecream
    df = spark.createDataFrame(rows, "_id long, likes array<bigint>, nw long")
    return Index(df)


def test_sort_aggregate_desc_count_asc(likes_idx):
    rows = GroupBy(
        [Rows("likes")],
        aggregate=("sum", "nw"),
        sort="aggregate desc, count asc",
    ).to_df(likes_idx).collect()
    got = [(r["likes"], r["count"], r["sum"]) for r in rows]
    assert got == [
        (0, 6, 111111),
        (6, 1, 100000),
        (5, 1, 10000),
        (4, 1, 1000),
        (3, 1, 100),
        (2, 1, 10),
        (1, 1, 1),
    ]


def test_sort_limit_offset(likes_idx):
    rows = GroupBy(
        [Rows("likes")],
        aggregate=("sum", "nw"),
        sort="aggregate desc, count asc",
        limit=3,
        offset=2,
    ).to_df(likes_idx).collect()
    assert [(r["likes"], r["sum"]) for r in rows] == [
        (5, 10000), (4, 1000), (3, 100),
    ]


def test_sort_direction_defaults_to_desc(likes_idx):
    """getSorter: a directive without asc/desc sorts DESC."""
    a = GroupBy([Rows("likes")], sort="count").to_df(likes_idx).collect()
    b = GroupBy([Rows("likes")], sort="count desc").to_df(
        likes_idx
    ).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert a[0]["count"] == 6


def test_sort_sum_names_aggregate_column(likes_idx):
    rows = GroupBy(
        [Rows("likes")], aggregate=("sum", "nw"), sort="sum asc", limit=1
    ).to_df(likes_idx).collect()
    assert (rows[0]["likes"], rows[0]["sum"]) == (1, 1)


# ---- error surfaces --------------------------------------------------------


def test_no_child_call_error(gidx):
    with pytest.raises(ValueError, match="need at least one child call"):
        GroupBy([]).to_df(gidx)


def test_negative_limit_error(gidx):
    with pytest.raises(
        ValueError, match="value for 'limit' must be positive, but got -1"
    ):
        GroupBy([Rows("general")], limit=-1).to_df(gidx)


def test_rows_in_exclusive_of_column(gidx):
    with pytest.raises(
        ValueError,
        match="Rows call with 'in' does not support other arguments, "
        "but found 'column'",
    ):
        Rows("general", in_=[10, 11], column=3).to_df(gidx)


def test_groupby_rows_in_exclusive_of_like(gidx):
    with pytest.raises(
        ValueError, match="but found 'like'"
    ):
        GroupBy([Rows("general", in_=[10], like="%1")]).to_df(gidx)


def test_having_subject_guard(gidx):
    with pytest.raises(
        ValueError, match="Condition\\(\\) only supports count or sum"
    ):
        GroupBy(
            [Rows("general")],
            aggregate=("count_distinct", "v"),
            having=("aggregate", ">", 0),
        ).to_df(gidx).collect()


def test_sort_subject_guard(gidx):
    with pytest.raises(
        ValueError,
        match="sorting is only supported on count, aggregate, or sum, "
        "not 'banana'",
    ):
        GroupBy([Rows("general")], sort="banana desc").to_df(gidx)


def test_rows_in_restricts_groups(gidx):
    got = groups(
        GroupBy([Rows("general", in_=[10, 12])]).to_df(gidx),
        "general", "count",
    )
    assert got == {(10, 3), (12, 2)}


# ---- TestExecutor_Time_Clear_Quantums (executor_test.go:3890-3948) --------
# Clear on a time-quantum field removes the value from EVERY view; the
# ranged re-read under each quantum then sees exactly the reference's
# surviving records (7 only when the quantum carries hours — its
# 2002-01-01T02:00 bit is inside [from, to) only at H granularity).

_TCQ_POPULATE = (
    "Set(2, f=1, 1999-12-31T00:00) "
    "Set(3, f=1, 2000-01-01T00:00) "
    "Set(4, f=1, 2000-01-02T00:00) "
    "Set(5, f=1, 2000-02-01T00:00) "
    "Set(6, f=1, 2001-01-01T00:00) "
    "Set(7, f=1, 2002-01-01T02:00) "
    "Set(2, f=1, 1999-12-30T00:00) "
    "Set(2, f=1, 2002-02-01T00:00) "
    "Set(2, f=10, 2001-01-01T00:00)"
)
_TCQ_RANGE = "Row(f=1, from=1999-12-31T00:00, to=2002-01-01T03:00)"

_TCQ_CASES = [
    ("Y", {3, 4, 5, 6}),
    ("M", {3, 4, 5, 6}),
    ("D", {3, 4, 5, 6}),
    ("H", {3, 4, 5, 6, 7}),
    ("YM", {3, 4, 5, 6}),
    ("YMD", {3, 4, 5, 6}),
    ("YMDH", {3, 4, 5, 6, 7}),
    ("MD", {3, 4, 5, 6}),
    ("MDH", {3, 4, 5, 6, 7}),
    ("DH", {3, 4, 5, 6, 7}),
]


@pytest.mark.parametrize("quantum,expected", _TCQ_CASES,
                         ids=[c[0] for c in _TCQ_CASES])
def test_time_clear_quantums(spark, quantum, expected):
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    empty = spark.createDataFrame(
        [], "_id long, f array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(empty, quantums={"f": quantum})
    # populate: each write threads its table into the next call
    results = P.execute_all(idx, _TCQ_POPULATE)
    populated = Index(results[-1], quantums={"f": quantum})
    cleared = Index(
        P.execute(populated, "Clear(2, f=1)"), quantums={"f": quantum}
    )
    got = {r["_id"] for r in P.execute(cleared, _TCQ_RANGE).collect()}
    assert got == expected, f"quantum {quantum}: {got}"


def test_time_clear_keeps_other_values(spark):
    # Clear(2, f=1) must leave record 2's f=10 bit intact
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    empty = spark.createDataFrame(
        [], "_id long, f array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(empty, quantums={"f": "YMDH"})
    populated = Index(
        P.execute_all(idx, _TCQ_POPULATE)[-1], quantums={"f": "YMDH"}
    )
    cleared = Index(
        P.execute(populated, "Clear(2, f=1)"), quantums={"f": "YMDH"}
    )
    got = {r["_id"] for r in P.execute(cleared, "Row(f=10)").collect()}
    assert got == {2}


def test_clear_bsi_is_unconditional(spark):
    """Clear on an int/decimal/timestamp (BSI) field ignores the value
    argument — f.ClearValue clears the stored value outright
    (executeClearValueField executor.go:6354-6390). Mutex scalars keep
    the iff-equal rule."""
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(1, 25, "x"), (2, 10, "y")], "_id long, v long, m string"
    )
    idx = Index(df, field_types={"v": "int"})
    # Clear with a NON-matching value still clears the BSI field
    out = P.execute(idx, "Clear(1, v=999)")
    got = {r["_id"]: r["v"] for r in out.collect()}
    assert got == {1: None, 2: 10}
    # mutex scalar: non-matching value is a no-op
    out = P.execute(idx, "Clear(2, m='nope')")
    got = {r["_id"]: r["m"] for r in out.collect()}
    assert got == {1: "x", 2: "y"}


def test_clear_row_refuses_bsi_fields(spark):
    """ClearRow() supports set/time/mutex/bool only
    (executor.go:5991-5996, exact text)."""
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame([(1, 25)], "_id long, v long")
    idx = Index(df, field_types={"v": "int"})
    with pytest.raises(
        ValueError, match=r"ClearRow\(\) is not supported on int field types"
    ):
        P.execute(idx, "ClearRow(v=25)")


def test_set_key_translation_refusals(spark):
    """Set's key-translation refusals (executor_test.go SetValue/Err
    :1702-1713, texts cluster.go:366/575): a string column key on an
    unkeyed (integer-id) index, and a string row value on an unkeyed
    numeric field, both refuse. A string value on a TIMESTAMP BSI
    field is fine (the :1716-1756 Timestamp subtest sets
    f='2000-01-01T00:00:00Z')."""
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(1, 5, None)], "_id long, f long, t timestamp"
    )
    idx = Index(df, field_types={"f": "int"})
    with pytest.raises(ValueError, match="unkeyed index"):
        P.execute(idx, 'Set("bad_column", f=100)')
    with pytest.raises(
        ValueError, match="cannot create keys on unkeyed field"
    ):
        P.execute(idx, 'Set(10, f="hello")')
    out = P.execute(idx, "Set(10, t='2000-01-02T00:00:00Z')")
    got = {r["_id"]: r["t"] for r in out.collect()}
    assert got[10] is not None


def test_row_null_checks_and_set_neq_refusal(spark):
    """Row_BSIGroup null battery (executor_test.go:3044-3172):

    - Row(idset != null) INCLUDES a record whose only bit was cleared —
      the reference's null walk is index-existence minus FIELD
      existence, and ClearBit never resets field existence; our
      NULL-vs-[] distinction models that exactly.
    - Row(idset != 3): set/mutex fields take != only against null
      (executor.go:5189, exact text).
    - Row(tq == null, from=...): a time range with a null check refuses
      (executor.go:5175, exact text).
    """
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    empty = spark.createDataFrame(
        [], "_id long, idset array<bigint>, "
        "tq array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(empty, quantums={"tq": "YM"})
    populated = P.execute_all(
        idx,
        "Set(0, idset=3) Set(1, idset=3) Clear(0, idset=3) "
        "Set(50, tq=5, 2017-01-02T12:34)",
    )[-1]
    cur = Index(populated, quantums={"tq": "YM"})

    nn = {r["_id"] for r in P.execute(cur, "Row(idset != null)").collect()}
    assert nn == {0, 1}, nn  # 0 cleared-but-existing counts as non-null
    null_ids = {r["_id"] for r in P.execute(cur, "Row(idset == null)").collect()}
    assert null_ids == {50}
    tq_nn = {r["_id"] for r in P.execute(cur, "Row(tq != null)").collect()}
    assert tq_nn == {50}
    tq_null = {r["_id"] for r in P.execute(cur, "Row(tq == null)").collect()}
    assert tq_null == {0, 1}

    with pytest.raises(
        ValueError,
        match="only support != for null, not for other values, on "
        "set/mutex fields",
    ):
        P.execute(cur, "Row(idset != 3)").collect()
    with pytest.raises(
        ValueError,
        match="can't use a time range with a check for/against null",
    ):
        P.execute(cur, "Row(tq == null, from=2010-01-01T00:00)").collect()


# ---- Row_BSIGroup range battery (executor_test.go:3007-3300) -------------
# The reference fixture rebuilt at shard scale through the text door:
# foo/bar/other/edge are BSI ints, idset a set, tq a YM time field.

SW_B = 1 << 20


@pytest.fixture(scope="module")
def bsi_idx(spark):
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    empty = spark.createDataFrame(
        [], "_id long, f array<bigint>, foo long, bar long, other long, "
        "edge long, idset array<bigint>, "
        "tq array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(empty, quantums={"tq": "YM"},
                field_types={"foo": "int", "bar": "int",
                             "other": "int", "edge": "int"})
    populated = P.execute_all(
        idx,
        f"Set(0, f=0) Set({SW_B + 1}, f=0) "
        f"Set(50, foo=20) Set(50, bar=2000) Set({SW_B}, foo=30) "
        f"Set({SW_B + 2}, foo=10) Set({5 * SW_B + 100}, foo=20) "
        f"Set({SW_B + 1}, foo=60) Set(0, other=1000) "
        "Set(0, edge=100) Set(1, edge=-100) "
        "Set(0, idset=3) Set(1, idset=3) Clear(0, idset=3) "
        "Set(50, tq=5, 2017-01-02T12:34)",
    )[-1]
    # materialize: the 15-deep lazy write chain (each Set stacks a
    # union + anti-join) would otherwise re-execute per parametrized
    # case — collect once, rebuild as a literal frame
    flat = spark.createDataFrame(populated.collect(), populated.schema)
    return Index(flat, quantums={"tq": "YM"},
                 field_types={"foo": "int", "bar": "int",
                              "other": "int", "edge": "int"})


_BSI_CASES = [
    ("Row(foo == 20)", {50, 5 * SW_B + 100}),
    ("Row(foo = 20)", {50, 5 * SW_B + 100}),       # single-= spelling
    ("Row(idset == 3)", {1}),
    ("Row(other != null)", {0}),
    ("Row(foo != 20)", {SW_B, SW_B + 1, SW_B + 2}),  # nulls excluded
    ("Row(other != -20)", {0}),
    ("Row(foo < 20)", {SW_B + 2}),
    ("Row(foo <= 20)", {50, SW_B + 2, 5 * SW_B + 100}),
    ("Row(foo > 20)", {SW_B, SW_B + 1}),
    ("Row(foo >= 20)", {50, SW_B, SW_B + 1, 5 * SW_B + 100}),
    ("Row(0 <= other <= 1000)", {0}),
    ("Row(foo == 0)", set()),
    ("Row(foo == 200)", set()),
    ("Row(edge < 200)", {0, 1}),
    ("Row(edge > -1000)", {0, 1}),
]


@pytest.mark.parametrize("query,expected", _BSI_CASES,
                         ids=[c[0] for c in _BSI_CASES])
def test_row_bsigroup_battery(bsi_idx, query, expected):
    from featurebase_spark.pql import parser as P

    got = {r["_id"] for r in P.execute(bsi_idx, query).collect()}
    assert got == expected, f"{query}: {got}"


def test_row_bsigroup_field_not_found(bsi_idx):
    from featurebase_spark.pql import parser as P

    with pytest.raises(ValueError, match="field not found"):
        P.execute(bsi_idx, "Row(bad_field >= 20)").collect()


def test_rows_keys_like_semantics(spark):
    """TestExecutor_Execute_Rows_Keys tail cases: like='__' filters
    keys by glob length; like on an UNKEYED field refuses with the
    translating-call surface (there are no keys to match). The paging
    cursor itself is a documented divergence: the reference pages in
    row-id (key-creation) order, this engine in value order."""
    from featurebase_spark.pql import parser as P
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(1, ["0", "5", "10", "15"], 7)],
        "_id long, f array<string>, f_id long",
    )
    idx = Index(df)
    got = {r["f"] for r in P.execute(idx, 'Rows(f, like="__")').collect()}
    assert got == {"10", "15"}
    with pytest.raises(ValueError, match="translating call:"):
        P.execute(idx, 'Rows(f_id, like="__")').collect()
    # like=<int> refuses at arg validation (the reference surfaces it
    # under its 'parsing:' wrap since CheckCallInfo runs inside parse)
    with pytest.raises(ValueError, match="arg 'like' wrong type"):
        P.execute(idx, "Rows(f_id, like=7)")
