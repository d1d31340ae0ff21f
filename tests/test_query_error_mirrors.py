"""Mirror of the reference's TestExecutor_Execute_Query_Error battery
(executor_test.go:5352-5440) — the PQL-door validation surface: arg
prototypes (pql/ast.go:450-732 callInfoByFunc/CheckCallInfo), Rows
field-type refusals (executor.go:4124-4129), field-value validation
(fieldValidateValue executor.go:7150-7200), and the PEG's
bare-identifier field slots.

Every case asserts the reference's exact error substring (the Go test
uses strings.Contains with the same strings). The fixture mirrors the
reference's field set: a plain set field, a BSI int field (declared —
a Spark long column alone cannot be told apart from a mutex field), a
decimal(2) field, a bool field, and a keyed set field.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from featurebase_spark.pql import parser as P
from featurebase_spark.pql.calls import Index, Row, Rows


@pytest.fixture(scope="module")
def qidx(spark):
    df = spark.createDataFrame(
        [
            (0, [1], 5, True, ["a"], Decimal("1.25")),
            (1, [2], -3, False, ["b"], Decimal("-0.50")),
        ],
        "_id long, general array<bigint>, integer long, bool boolean, "
        "keys array<string>, decimal decimal(10,2)",
    )
    return Index(df, field_types={"integer": "int"})


# the (query, expected-substring) table verbatim from
# executor_test.go:5361-5424
CASES = [
    ("GroupBy(Rows())", "missing field in Rows call"),
    ('GroupBy(Rows("true"))', "parsing: parsing:"),
    ("GroupBy(Rows(1))", "parsing: parsing:"),
    ("GroupBy(Rows(general, limit=-1))", "must be positive, but got"),
    ("GroupBy(Rows(general), limit=-1)", "must be positive, but got"),
    ("GroupBy(Rows(general), filter=Rows(general))", "parsing: parsing:"),
    ("GroupBy(Rows(integer), prev=-1)", "unknown arg 'prev'"),
    ("Rows(integer)", "int fields not supported by Rows() query"),
    ("Rows(decimal)", "decimal fields not supported by Rows() query"),
    ("Rows(bool)", "bool fields not supported by Rows() query"),
    ("Row(keys=1)", 'found integer ID 1 on keyed field "keys"'),
    (
        'Rows(keys, in=["a", "b"], column=3)',
        "Rows call with 'in' does not support other arguments",
    ),
    (
        'GroupBy(Rows(keys, in=["a", "b"], column=3))',
        "Rows call with 'in' does not support other arguments",
    ),
    (
        'Rows(keys, in=["a", "b"], like="%sd")',
        "Rows call with 'in' does not support other arguments",
    ),
    (
        'GroupBy(Rows(keys, in=["a", "b"], like="%sd"))',
        "Rows call with 'in' does not support other arguments",
    ),
]


@pytest.mark.parametrize("query,want", CASES, ids=[c[0] for c in CASES])
def test_query_error(qidx, query, want):
    with pytest.raises(Exception) as ei:
        P.execute(qidx, query).collect()
    assert want in str(ei.value), f"{query}: {ei.value}"


# ---- CheckCallInfo arg-prototype mirrors beyond the battery --------------
# (pql/ast.go:668-732 — unknown args, wrong-type args, unknown calls)


def test_unknown_call_no_arg_validation(qidx):
    # PEG parses any call name; CheckCallInfo refuses (ast.go:669-671)
    with pytest.raises(Exception, match="no arg validation for 'Frobnicate'"):
        P.execute(qidx, "Frobnicate(general)")


def test_setop_rejects_any_kwarg(qidx):
    # Intersect/Union/... take only children ("should never have args")
    with pytest.raises(Exception, match="'Intersect': unknown arg 'bogus'"):
        P.execute(qidx, "Intersect(Row(general=1), bogus=2)")


def test_wrong_type_int64_arg(qidx):
    # 'limit' prototype is int64(0) → "wrong type (got string, expected
    # int64)" (ast.go:690-692 reflect.TypeOf equality path)
    with pytest.raises(
        Exception, match=r"arg 'limit' wrong type \(got string, expected int64\)"
    ):
        P.execute(qidx, 'GroupBy(Rows(general), limit="ten")')


def test_wrong_type_string_or_integer_arg(qidx):
    # IncludesColumn 'column' is stringOrInt64 (ast.go:694-701)
    with pytest.raises(
        Exception, match="needed a string or integer value, got bool"
    ):
        P.execute(qidx, "IncludesColumn(Row(general=1), column=true)")


def test_case_insensitive_name_still_validated(qidx):
    # canonicalCaps folds call names before validation (ast.go:651-661)
    with pytest.raises(Exception, match="'GroupBy': unknown arg 'prev'"):
        P.execute(qidx, "groupby(Rows(general), prev=1)")


# ---- API-door twins: the same refusals without the text parser ----------


def test_api_rows_negative_limit(qidx):
    with pytest.raises(ValueError, match="must be positive, but got -2"):
        Rows("general", limit=-2).to_df(qidx)


def test_api_rows_int_field(qidx):
    with pytest.raises(
        ValueError, match=r"int fields not supported by Rows\(\) query"
    ):
        Rows("integer").to_df(qidx)


def test_api_row_keyed_integer_id(qidx):
    with pytest.raises(
        ValueError, match='found integer ID 7 on keyed field "keys"'
    ):
        Row("keys", "==", 7).predicate(qidx)


def test_api_row_negative_set_id(qidx):
    # negative check precedes the keyed check (executor.go:7166-7175)
    with pytest.raises(ValueError, match='negative ID -1 for set field "general"'):
        Row("general", "==", -1).predicate(qidx)


def test_api_row_bool_field_value(qidx):
    with pytest.raises(ValueError, match='invalid value 5 for bool field "bool"'):
        Row("bool", "==", 5).predicate(qidx)


def test_int_field_negative_equality_ok(qidx):
    # a BSI int field accepts any signed value — negative equality
    # must keep working (Row(v == -3) over BSI is legal, defs corpus)
    got = {r["_id"] for r in Row("integer", "==", -3).ids(qidx).collect()}
    assert got == {1}


def test_groupby_int_field_not_refused(qidx):
    # the Rows type guard is executeRows-only: GroupBy(Rows(int-field))
    # works in the reference (groupByIterator handles int fields)
    from featurebase_spark.pql.calls import GroupBy

    out = GroupBy([Rows("integer")]).to_df(qidx).collect()
    assert {r["integer"] for r in out} == {5, -3}


# ---- empty set-op semantics (executor_test.go:1257-1350) -----------------
# Difference()/Intersect() error; Union()/Xor() are the EMPTY row.


def test_empty_difference_errors(qidx):
    with pytest.raises(
        ValueError, match="empty Difference query is currently not supported"
    ):
        P.execute(qidx, "Difference()").collect()


def test_empty_intersect_errors(qidx):
    with pytest.raises(
        ValueError, match="empty Intersect query is currently not supported"
    ):
        P.execute(qidx, "Intersect()").collect()


def test_empty_union_is_empty_row(qidx):
    assert P.execute(qidx, "Union()").collect() == []


def test_empty_xor_is_empty_row(qidx):
    assert P.execute(qidx, "Xor()").collect() == []


# ---- pre-1.0 call names (TestExecutor_Execute_OldPQL, :1629) -------------


def test_old_pql_setbit_unknown_call(qidx):
    # the PEG + CheckCallInfo accept SetBit; the executor's dispatch
    # refuses with the exact text (executor.go:1814)
    with pytest.raises(ValueError, match="unknown call: SetBit"):
        P.execute(qidx, "SetBit(frame=f, row=11, col=1)")


# ---- write-call argument surface (executor.go:5904-6260) -----------------

WRITE_ARG_CASES = [
    ("Set(general=1)", "Set\\(\\) column argument 'col' required"),
    ("Set(5)", "Set\\(\\) argument required: field"),
    (
        "Clear(general=1)",
        r"column argument to Clear\(<COLUMN>, <FIELD>=<ROW>\) required",
    ),
    ("Clear(5)", r"Clear\(\) argument required: field"),
    ("ClearRow()", r"ClearRow\(\) argument required: field"),
    ("Store(Row(general=1))", r"Store\(\) argument required: field"),
]


@pytest.mark.parametrize(
    "query,want", WRITE_ARG_CASES, ids=[c[0] for c in WRITE_ARG_CASES]
)
def test_write_call_arg_errors(qidx, query, want):
    with pytest.raises(ValueError, match=want):
        P.execute(qidx, query)


# ---- MaxWritesPerRequest (TestExecutor_Execute_ErrMaxWritesPerRequest) ---


def test_max_writes_per_request(qidx):
    # the write count refuses BEFORE per-call validation: Set() alone
    # would be a missing-col error, but the reference returns
    # ErrTooManyWrites for the 4-write batch against limit 3
    with pytest.raises(ValueError, match="too many write commands"):
        P.execute_all(qidx, "Set() Clear() Set() Set()", max_writes=3)


def test_max_writes_under_limit_proceeds_to_validation(qidx):
    # 2 writes against limit 3 → the per-call check is next in line
    with pytest.raises(ValueError, match="column argument"):
        P.execute_all(qidx, "Set() Set()", max_writes=3)


# ---- bare Distinct with quoted field (TestExecutor_BareDistinct) ---------


def test_bare_distinct_quoted_field(qidx):
    # Distinct(field="ints") — QUOTED field names are legal in the
    # field= kwarg slot (only the bare positional slot is
    # identifier-only); values sorted ascending
    got = [
        r["general"]
        for r in P.execute(qidx, 'Distinct(field="general")')
        .orderBy("general")
        .collect()
    ]
    assert got == [1, 2]


# ---- review-pass regression pins (r12 session-2 code review) -------------


def test_rows_quoted_field_kwarg_is_legal(qidx):
    # only the POSITIONAL slot is identifier-only; field= takes strings
    # (prototype s_or_var — TestExecutor_BareDistinct spells
    # Distinct(field="ints"))
    got = {
        r["general"]
        for r in P.execute(qidx, 'Rows(field="general")').collect()
    }
    assert got == {1, 2}


def test_set_string_on_quantum_int_field_refuses(spark):
    from featurebase_spark.pql import parser as PP
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [], "_id long, tq array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(df, quantums={"tq": "YMD"})
    with pytest.raises(
        ValueError, match="cannot create keys on unkeyed field"
    ):
        PP.execute(idx, 'Set(1, tq="toronto")')


def test_multi_field_set_timestamp_not_order_dependent(spark):
    # Set(1, qf=1, flat=2, ts): the quantum field takes ts in-bit AND
    # the flat field's event time still lands in time_col
    from featurebase_spark.pql import parser as PP
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [], "_id long, qf array<struct<value:bigint,ts:timestamp>>, "
        "flat bigint, ts timestamp"
    )
    idx = Index(df, time_col="ts", quantums={"qf": "YMD"})
    out = PP.execute(idx, "Set(1, qf=1, flat=2, 2001-01-01T00:00)")
    r = out.collect()[0]
    assert r["flat"] == 2 and r["ts"] is not None
    assert r["qf"][0]["ts"] is not None


def test_quantum_neq_value_refuses(spark):
    from featurebase_spark.pql import parser as PP
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [], "_id long, tq array<struct<value:bigint,ts:timestamp>>"
    )
    idx = Index(df, quantums={"tq": "YMD"})
    with pytest.raises(ValueError, match="only support != for null"):
        PP.execute(idx, "Row(tq != 5)").collect()


def test_idarray_empty_brackets_is_bad_record(spark, tmpdir):
    # reference toUint64Array: '[]' strips to '' and ParseUint('')
    # errors (idk/interfaces.go:1304-1315) — a bad record, while
    # STRINGARRAY '[]' is a legal one-empty-member array
    import os

    from featurebase_spark import sources as SRC

    p = os.path.join(tmpdir, "empty_arr.csv")
    with open(p, "w") as f:
        f.write('id__ID,nums__IDArray\n1,"[]"\n')
    with pytest.raises(Exception, match="couldn't convert"):
        SRC.read_idk_csv(spark, p).collect()
    p2 = os.path.join(tmpdir, "empty_sarr.csv")
    with open(p2, "w") as f:
        f.write('id__ID,tags__StringArray\n1,"[]"\n')
    got = SRC.read_idk_csv(spark, p2).collect()[0]["tags"]
    assert got == [""]
