"""PQL text front-end: parse + execute real PQL strings (grammar
pql/pql.peg; cases modeled on executor_test.go query strings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pql import Index
from featurebase_spark.pql import calls as C
from featurebase_spark.pql.parser import execute, parse, parse_all


@pytest.fixture(scope="module")
def ev(tables):
    return Index(tables["events"], id_col="event_id", time_col="ts")


def test_parse_row_forms():
    r = parse('Row(event_type="click")')
    assert isinstance(r, C.Row) and r.field == "event_type" and r.value == "click"
    r = parse("Row(value > 250)")
    assert r.op == ">" and r.value == 250
    r = parse("Row(10 < value < 20)")
    assert r.between == (11, 19)  # strict bounds tightened to inclusive ints
    r = parse("Row(10 <= value <= 20)")
    assert r.between == (10, 20)
    r = parse("Row(value >< [10, 20])")
    assert r.between == (10, 20)
    r = parse('Row(event_type="click", from="2024-01-05", to="2024-01-20")')
    assert r.from_ == "2024-01-05" and r.to == "2024-01-20"


def test_parse_errors():
    # the PEG parses any call name; the CheckCallInfo mirror refuses
    # with the reference's text (pql/ast.go:669-671)
    with pytest.raises(ValueError, match="no arg validation for 'Bogus'"):
        parse("Bogus(x=1)")
    with pytest.raises(SyntaxError, match="unexpected character"):
        parse("Row(a=@)")
    with pytest.raises(SyntaxError, match="trailing input"):
        parse("All() All()")


def test_execute_count_matches_combinators(ev):
    got = execute(
        ev, 'Count(Intersect(Row(event_type="click"), Row(value > 250)))'
    ).first()["count"]
    exp = ev.df.where((F.col("event_type") == "click") & (F.col("value") > 250)).count()
    assert got == exp


def test_execute_setops_and_not(ev):
    total = ev.df.count()
    n = execute(ev, 'Count(Not(Row(event_type="click")))').first()["count"]
    n_click = ev.df.where(F.col("event_type") == "click").count()
    assert n == total - n_click
    u = execute(
        ev, 'Count(Union(Row(event_type="click"), Row(event_type="signup")))'
    ).first()["count"]
    assert u == ev.df.where(F.col("event_type").isin("click", "signup")).count()
    d = execute(
        ev, 'Count(Difference(Row(event_type="click"), Row(value > 250)))'
    ).first()["count"]
    assert d == ev.df.where(
        (F.col("event_type") == "click") & ~(F.col("value") > 250)
    ).count()


def test_execute_aggregates(ev):
    s = execute(ev, 'Sum(Row(event_type="purchase"), field=value)').first()
    exp = ev.df.where(F.col("event_type") == "purchase").agg(F.sum("value")).first()[0]
    assert s["sum"] == pytest.approx(exp)
    mn = execute(ev, "Min(field=value)").first()["min"]
    assert mn == ev.df.agg(F.min("value")).first()[0]
    p = execute(ev, "Percentile(field=value, nth=50)").first()["percentile"]
    assert p is not None


def test_execute_topn_rows_groupby(ev):
    top = execute(ev, "TopN(event_type, n=2)").collect()
    assert len(top) == 2
    rows = execute(ev, 'Rows(event_type, like="%c%")').collect()
    assert {r["event_type"] for r in rows} == {"click", "purchase"}
    gb = execute(
        ev,
        "GroupBy(Rows(event_type), aggregate=Sum(field=value), "
        'having=Condition(count > 0), sort="sum desc", limit=3)',
    ).collect()
    assert len(gb) == 3 and gb[0]["sum"] >= gb[1]["sum"]
    gcd = execute(
        ev, "GroupBy(Rows(event_type), aggregate=Count(Distinct(field=user_id)))"
    ).collect()
    assert all(r["count"] > 0 for r in gcd)


def test_execute_extract_sort_limit(ev):
    ex = execute(
        ev, "Extract(Row(value > 300), Rows(event_type), Rows(user_id))"
    )
    assert ex.columns == ["event_id", "event_type", "user_id"]
    srt = execute(ev, "Sort(All(), field=value, sort-desc=true, limit=4)").collect()
    vals = [r["value"] for r in srt]
    assert vals == sorted(vals, reverse=True) and len(vals) == 4
    lim = execute(ev, "Limit(All(), limit=5, offset=2)").collect()
    assert [r["_id"] for r in lim] == [2, 3, 4, 5, 6]


def test_execute_point_and_const(ev):
    assert execute(ev, "ConstRow(columns=[3, 1, 2])").count() == 3
    fv = execute(ev, "FieldValue(field=value, column=7)").first()["value"]
    assert fv == ev.df.where(F.col("event_id") == 7).first()["value"]
    inc = execute(ev, 'IncludesColumn(Row(event_type="click"), column=7)').first()[
        "result"
    ]
    assert inc in (True, False)
    sh = execute(ev, "Shift(ConstRow(columns=[1, 2]), n=10)").collect()
    assert sorted(r["_id"] for r in sh) == [11, 12]


def test_execute_time_range(ev):
    got = execute(
        ev, 'Count(Row(event_type="click", from="2024-01-05", to="2024-01-20"))'
    ).first()["count"]
    exp = ev.df.where(
        (F.col("event_type") == "click")
        & (F.col("ts") >= "2024-01-05")
        & (F.col("ts") < "2024-01-20")
    ).count()
    assert got == exp


def test_execute_options_and_arrow_text(ev):
    # Options(shards=) restricts; Arrow returns filtered projection
    n = execute(ev, "Count(Options(Row(event_type='click'), shards=[0]))").first()["count"]
    assert n == execute(ev, "Count(Row(event_type='click'))").first()["count"]  # all ids < 2^20
    arr = execute(ev, "Arrow(Row(value > 400), header=[value])")
    assert arr.columns == ["event_id", "value"]


def test_execute_write_calls_text(spark):
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "_id LONG, s STRING, n LONG"
    )
    idx = Index(df)
    t = execute(idx, "Set(2, s='z')")
    assert {r["_id"]: r["s"] for r in t.collect()}[2] == "z"
    t = execute(idx, "Set(9, n=99)")  # create-if-absent
    assert {r["_id"]: r["n"] for r in t.collect()}[9] == 99
    t = execute(idx, "Clear(1, s='a')")
    assert {r["_id"]: r["s"] for r in t.collect()}[1] is None
    t = execute(idx, "ClearRow(s='a')")
    assert [r["s"] for r in t.orderBy("_id").collect()] == [None, "b", None]
    # Store overwrites the 'w' value-row: members get it; non-members lose
    # it only if they held 'w' (record 3 holds 'a' — untouched)
    t = execute(idx, "Store(ConstRow(columns=[1, 2]), s='w')")
    assert [r["s"] for r in t.orderBy("_id").collect()] == ["w", "w", "a"]
    t = execute(idx, "Delete(Row(n > 15))")
    assert sorted(r["_id"] for r in t.collect()) == [1]


def test_execute_apply_ivy_text(spark):
    """Apply with real ivy programs (dataframe_test.go:91-132 shapes);
    ivy evaluation is RIGHT-associative with no precedence."""
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(0, 10.0), (1, 20.0), (2, 30.0)], "_id LONG, value DOUBLE"
    )
    idx = Index(df)
    got = execute(idx, 'Apply("_ID", "_")')
    assert [r["result"] for r in got.collect()] == [0, 1, 2]
    got = execute(idx, 'Apply(ConstRow(columns=[0, 2]), "_ID+0", "_")')
    assert [r["result"] for r in got.collect()] == [0, 2]
    # right-assoc: 2*value+_ID = 2*(value+_ID)
    got = execute(idx, 'Apply("2*value+_ID")').collect()
    assert [r["result"] for r in got] == [20.0, 42.0, 64.0]
    # reduction
    assert execute(idx, 'Apply("+/value")').first()["result"] == 60.0
    assert execute(idx, 'Apply(ConstRow(columns=[1,2]), "max/value")').first()["result"] == 30.0
    with pytest.raises(SyntaxError):
        execute(idx, 'Apply("barf")')


def test_execute_multi_call_request(spark):
    """One request, many calls (executor.go:183-489 loops query.Calls);
    writes are visible to later calls in the same request."""
    from featurebase_spark.pql.calls import Index
    from featurebase_spark.pql.parser import execute_all

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "_id LONG, s STRING, n LONG"
    )
    idx = Index(df)
    results = execute_all(
        idx,
        'Count(Row(s="a")) Set(4, s="a") Count(Row(s="a"))',
    )
    assert len(results) == 3
    assert results[0].first()["count"] == 2
    assert results[2].first()["count"] == 3  # the Set is visible


def test_groupby_having_range_condition(ev):
    """having=Condition(a < count < b) — the reference's range Condition
    (pql/ast.go:145 stores [low, high])."""
    all_rows = execute(ev, "GroupBy(Rows(event_type))").collect()
    lo, hi = 10, max(r["count"] for r in all_rows) - 1
    got = execute(
        ev, f"GroupBy(Rows(event_type), having=Condition({lo - 1} < count < {hi + 1}))"
    ).collect()
    exp = [r for r in all_rows if lo <= r["count"] <= hi]
    assert sorted(r["event_type"] for r in got) == sorted(
        r["event_type"] for r in exp
    ) and len(got) > 0


def test_apply_reduce_program(spark, tables):
    """Apply's third argument is an ivy reduce program applied to the
    mapped vector (IvyReduce apply.go:50-120): '+/' sums, 'max/ x' with a
    vector name also parses; a map program that already reduces rejects
    the extra argument."""
    import pytest
    from pyspark.sql import functions as F

    from featurebase_spark.pql import calls as C
    from featurebase_spark.pql.parser import execute

    ev = tables["events"]
    idx = C.Index(ev, id_col="event_id")
    got = execute(
        idx, 'Apply(Row(event_type=\'purchase\'), "2*user_id", "+/")'
    ).first()["result"]
    exp = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(2 * F.col("user_id")))
        .first()[0]
    )
    assert got == exp
    got_max = C.Apply("value", filter=None, reduce_op="max/ x").to_df(idx).first()["result"]
    exp_max = ev.agg(F.max("value")).first()[0]
    assert got_max == exp_max
    with pytest.raises(SyntaxError, match="already reduces"):
        C.Apply("+/value", reduce_op="+/").to_df(idx).collect()
    with pytest.raises(SyntaxError, match="unsupported reduce"):
        C.Apply("value", reduce_op="nope").to_df(idx).collect()


# --- pql/pqlpeg_test.go golden mirrors --------------------------------------
# Grammar-acceptance, error, and error-text cases taken verbatim from the
# reference's PEG test suite (TestPEGWorking / TestPEGErrors /
# TestDuplicateArgError; error texts pql/parser.go:16-18).

PEG_ACCEPT = [
    "Set(2, f=10)",
    "Set('foo', f=10)",
    'Set("foo", f=10)',
    "Set(2, f=1, 1999-12-31T00:00)",              # SetTime
    "Set(1, a=4)Set(2, a=4)",                     # DoubleSet
    "Set(1, a=4) \n Set(2, a=4)",                 # DoubleSetNewline
    "Set(1, a=zoom)",                             # SetStringArg
    "Set(1, a=4, b=5)",                           # SetManyArgs
    "Set(1, a=4, bsd=haha)",                      # SetManyMixedArgs
    "Set(1, a=4, 2017-04-03T19:34)",              # SetTimestamp
    "Set(1, a='2017-04-03T19:34:00Z')",           # SetTimestampField
    "Set(1, a='2017-04-03T19:34:00-07:00')",      # SetTimestampTZField
    "Union()",
    "Union(Row(a=1))",
    "Union(Row(a=1), Row(z=44))",
    "TopN(boondoggle)",                           # TopN no args
    "TopN(myfield, n=44)",
    "TopN(myfield, Row(a=47), n=10)",             # TopNBitmap
    'Row(a="zm\'\'e")',                           # double quoted args
    "Row(a='zm\"\"e')",                           # single quoted args
    "Clear(1, a=53)",
    "Clear(1, a=53, b=33)",                       # Clear2args
    "Row(a < 4)", "Row(a > 4)", "Row(a <= 4)", "Row(a >= 4)",
    "Row(a == 4)", "Row(a == null)", "Row(a != 4)", "Row(a != null)",
    "Row(4 < a < 9)", "Row(4 < a <= 9)", "Row(4 <= a < 9)",
    "Row(4 <= a <= 9)",
    "Row(a=4, from=2010-07-04T00:00, to=2010-08-04T00:00)",  # RangeTime
    "Row(a=4, from='2010-07-04T00:00', to=\"2010-08-04T00:00\")",
    "Row(a=4, from='2010-07-04T00:00')",
    "Row(a=4, to=\"2010-08-04T00:00\")",
    "Set(1, my-frame=9)",                         # Dashed Frame
    "Range(blah=1, 2019-04-07T00:00, 2019-08-07T00:00)",  # OldRange
    "Row(a=falsen0)",                             # falsen0 is a string
]


@pytest.mark.parametrize("q", PEG_ACCEPT, ids=[q[:40] for q in PEG_ACCEPT])
def test_peg_accepts(q):
    parse_all(q)  # must not raise


PEG_ERRORS = [
    # (input, required error substring or None) — TestPEGErrors +
    # TestDuplicateArgError, texts from pql/parser.go:16-18
    ("Set", None),                                # SetNoParens
    ("Set(1, a=4, 2017-94-03T19:34)", "string is not a valid timestamp"),
    ("Set(1, 2017-04-03T19:34)", None),           # SetTimestampNoArg
    ("Set(, 1, a=4)", None),                      # SetStartingComma
    ("Row(, a=4)", None),                         # StartinCommaArb
    ("Clear(9)", None),                           # Clear0args
    ("Row(a>4, 2010-07-04T00:00, 2010-08-04T00:00)", None),  # RangeTimeGT
    ("Row(a=4, 2010-07-04T00:00)", None),         # RangeTimeOneStamp
    ("Row(a=9223372036854775808)", "integer is not in signed 64-bit range"),
    ("Row(a=-9223372036854775809)", "integer is not in signed 64-bit range"),
    ("Row(a==foo, a==bar)", "duplicate argument provided: a"),
    ("Row(a=foo, a=bar)", "duplicate argument provided: a"),
    ("Row(a>5, a>6)", "duplicate argument provided: a"),
    ("Row(a=7, a=8)", "duplicate argument provided: a"),
    ("Row(a=[7], a=[7,8])", "duplicate argument provided: a"),
]


@pytest.mark.parametrize(
    "q,sub", PEG_ERRORS, ids=[c[0][:40] for c in PEG_ERRORS]
)
def test_peg_errors(q, sub):
    with pytest.raises(Exception) as ei:
        parse_all(q)
    if sub:
        assert sub in str(ei.value)


def test_set_many_fields_and_timestamp_execute(spark):
    """Multi-field Set + trailing timestamp execute deterministically
    (documented divergence: the reference sets ONE arbitrary field,
    FieldArg iterating a Go map — ast.go:736)."""
    from featurebase_spark.pql import calls as C

    df = spark.createDataFrame(
        [(1, 0, 0, None)], "_id LONG, a LONG, b LONG, ts TIMESTAMP"
    )
    idx = C.Index(df, time_col="ts")
    node = parse("Set(1, a=4, b=5, 2017-04-03T19:34)")
    out = node.to_table(idx)
    r = out.first()
    assert (r["a"], r["b"]) == (4, 5)
    assert r["ts"] is not None and r["ts"].year == 2017


def test_ivy_relational_and_mod_ops(spark):
    """ivy relational operators yield 1/0 vectors composable with
    arithmetic (APL booleans), and mod follows the divisor's sign —
    right-associative precedence-free evaluation throughout."""
    from featurebase_spark.pql.ivy import apply_ivy

    df = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 40)], ["_id", "v"]
    )
    got = {r["_id"]: r["result"]
           for r in apply_ivy(df, "v > 20").collect()}
    assert got == {1: 0, 2: 1, 3: 1}
    # reduction over a relational vector = a count
    assert apply_ivy(df, "+/ v >= 25").first()["result"] == 2
    got = {r["_id"]: r["result"]
           for r in apply_ivy(df, "v mod 7").collect()}
    assert got == {1: 3, 2: 4, 3: 5}
    # right-associative: v == 10 + 15 parses as v == (10 + 15)
    got = {r["_id"]: r["result"]
           for r in apply_ivy(df, "v == 10 + 15").collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_reader_call_as_filter_rejected(spark):
    """Count(Arrow(...)) and other reader-call-as-filter mistakes get a
    clean analyzer error, not an AttributeError."""
    from featurebase_spark.pql.calls import Index
    from featurebase_spark.pql.parser import execute

    df = spark.createDataFrame([(1, "a")], ["_id", "k"])
    with pytest.raises(TypeError, match="does not produce a row set"):
        execute(Index(df), 'Count(Arrow(Row(k="a")))')


def test_parser_fuzz_never_crashes_unstructured():
    """Robustness: arbitrary garbage must raise the parser's typed
    error surface (SyntaxError with the reference's "PQL: ..." texts,
    or ValueError from call building) or parse — never IndexError /
    KeyError / RecursionError / AttributeError. Deterministic pseudo-
    random corpus over PQL-ish fragments + raw bytes."""
    import random

    from featurebase_spark.pql.parser import parse_all

    frags = [
        "Row(", ")", "(", "f=", "42", "'x'", '"y"', ",", "Count",
        "Intersect", "GroupBy", "Rows", "field", "=", "<", ">=", "[",
        "]", "from=", "to=", "null", "true", "-", "1.5e3", " ", "\t",
        "Set", "Delete", "Apply", "ivy", "\\", "*", "!", "§", "😀",
    ]
    rng = random.Random(7)
    crashes = []
    for i in range(2000):
        s = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 12)))
        try:
            parse_all(s)
        except (ValueError, SyntaxError):
            pass
        except Exception as e:  # noqa: BLE001
            crashes.append((s, type(e).__name__, str(e)[:80]))
    assert not crashes, crashes[:5]


# --- pql/pqlpeg_test.go TestPEGWorking / TestPEGErrors (full tables) -------
# Parse-level corpus: every input either parses to the expected call
# count or must refuse — the grammar surface, independent of execution.

PEG_WORKING = [
    ("", 0),
    ("Set(2, f=10)", 1),
    ("Set('foo', f=10)", 1),
    ('Set("foo", f=10)', 1),
    ("Set(2, f=1, 1999-12-31T00:00)", 1),
    ("Set(1, a=4)Set(2, a=4)", 2),
    ("Set(1, a=4) Set(2, a=4)", 2),
    ("Set(1, a=4) \n Set(2, a=4)", 2),
    ("Set(1, a=4)Row(z=ha)", 2),
    ("Set(1, a=4)Row(z=ha)Set(2, z=99)", 3),
    ("Row(q=1, a=4)Set(1, z=9)Row(z=99)", 3),
    ("Set(1, a=zoom)", 1),
    ("Set(1, a=4, b=5)", 1),
    ("Set(1, a=4, bsd=haha)", 1),
    ("Set(1, a=4, 2017-04-03T19:34)", 1),
    ("Set(1, a='2017-04-03T19:34:00Z')", 1),
    ("Set(1, a='2017-04-03T19:34:00-07:00')", 1),
    ("Set(1, a='2017-04-03T19:34:00+07:00')", 1),
    ("Set(1, a='2017-04-03T19:34:00.000000Z')", 1),
    ("Union()", 1),
    ("Union(Row(a=1))", 1),
    ("Union(Row(a=1), Row(z=44))", 1),
    ("Union(Intersect(Row(), Union(Row(), Row())), Row())", 1),
    ("TopN(boondoggle)", 1),
    ("TopN(boon, doggle=9)", 1),
    ("Row(a=\"zm''e\")", 1),
    ("Row(a='zm\"\"e')", 1),
    ("Clear(1, a=53)", 1),
    ("Clear(1, a=53, b=33)", 1),
    ("TopN(myfield, n=44)", 1),
    ("TopN(myfield, Row(a=47), n=10)", 1),
    ("Row(a < 4)", 1),
    ("Row(a > 4)", 1),
    ("Row(a <= 4)", 1),
    ("Row(a >= 4)", 1),
    ("Row(a == 4)", 1),
    ("Row(a == null)", 1),
    ("Row(a != 4)", 1),
    ("Row(a != null)", 1),
    ("Row(4 < a < 9)", 1),
    ("Row(4 < a <= 9)", 1),
    ("Row(4 <= a < 9)", 1),
    ("Row(4 <= a <= 9)", 1),
    ("Row(a=4, from=2010-07-04T00:00, to=2010-08-04T00:00)", 1),
    ("Row(a=4, from='2010-07-04T00:00', to=\"2010-08-04T00:00\")", 1),
    ("Row(a=4, from='2010-07-04T00:00')", 1),
    ("Row(a=4, to=\"2010-08-04T00:00\")", 1),
    ("Set(1, my-frame=9)", 1),
    ("Set(\n1,\nmy-frame\n=9)", 1),
    ("Range(blah=1, 2019-04-07T00:00, 2019-08-07T00:00)", 1),
]


@pytest.mark.parametrize(
    "text,ncalls", PEG_WORKING, ids=[repr(t[0])[:40] for t in PEG_WORKING]
)
def test_peg_working(text, ncalls):
    # pqlpeg_test.go:57-279 — parse succeeds with this call count.
    # Row() / Row(q=1, a=4) parse fine; their refusals (FieldArg) are
    # execution-time, like the reference.
    assert len(parse_all(text)) == ncalls


PEG_ERRORS = [
    "Set",
    "Set(1, a=4, 2017-94-03T19:34)",
    "Set(1, 2017-04-03T19:34)",
    "Set(, 1, a=4)",
    "Row(, a=4)",
    "Clear(9)",
    "Row(a>4, 2010-07-04T00:00, 2010-08-04T00:00)",
    "Row(a=4, 2010-07-04T00:00)",
    "Row(a=9223372036854775808)",
    "Row(a=-9223372036854775809)",
]


@pytest.mark.parametrize("text", PEG_ERRORS, ids=[t[:40] for t in PEG_ERRORS])
def test_peg_errors(text):
    # pqlpeg_test.go:281-327 — every input must refuse
    with pytest.raises(Exception):
        parse_all(text)


def test_row_no_field_executes_to_fieldarg_error():
    # the deferred half of UnionNested: Row() refuses at predicate
    # time with the executor's text (executor.go:5133)
    from featurebase_spark.pql.calls import Row

    with pytest.raises(ValueError, match=r"Row\(\) argument required: field"):
        Row(None).predicate(None)


# --- pql/pqlpeg_test.go TestPQLDeepEquality structural mirrors -------------


def test_deep_equality_unicode_and_structure():
    """Parsed-structure pins from TestPQLDeepEquality
    (pqlpeg_test.go:328-540): unicode field names AND values are legal
    identifiers/strings, positional fields land in the field slot with
    either spelling, Set's trailing bare timestamp binds to ts."""
    r = parse('Row(uniΘcode="Æ漢д ☮♬ ♞🜻💣")')
    assert r.field == "uniΘcode" and r.value == "Æ漢д ☮♬ ♞🜻💣"
    r = parse('Rows(job, previous="💣")')
    assert r.field == "job" and r.previous == "💣"
    t = parse('TopN(stargazer, Row(unicode="Æ漢д ☮♬ ♞🜻💣"), a="∑")')
    assert t.field == "stargazer" and isinstance(t.filter, C.Row)
    k = parse("TopK(myfield, Row(), k=7)")
    assert k.field == "myfield" and k.n == 7 and isinstance(k.filter, C.Row)
    assert parse("TopK(field=myfield, Row(), k=7)").field == "myfield"
    s = parse("Set(1, a=7, 2010-07-08T14:44)")
    assert s.ts == "2010-07-08T14:44"
    assert parse("Rows(field=myfield)").field == "myfield"
