"""Replay the reference's ENTIRE sql3 defs corpus through the dialect
front door.

tests/data/defs_corpus.json is extracted mechanically from
/root/reference/sql3/test/defs/defs_*.go by tools/extract_defs_corpus.py
— all ~150 TableTests / ~1,800 SQLTest cases that the reference's
TestSQL_Execute (sql3/sql_test.go:34-160) runs, in the same order
(defs.go:19 TableTests), with the same execution semantics:

- TableTests share one catalog and run in order (later tables query
  earlier ones, e.g. sql1TestsQueries reads `grouper`).
- Each TableTest CREATEs its table (types.go:269) and INSERTs row-set 0
  (types.go:288) through the same SQL front door.
- Each SQLTest runs every SQLs member against the same expectation;
  ExpErr is a substring match; rows compare per Compare
  (sql_test.go:112-146) after reordering expected columns by header
  name; SortStringKeys sorts string-set cells before comparing.

Divergences from the reference that are DELIBERATE (documented Spark
substrate gaps or declared behavior differences) are listed in
KNOWN_DIVERGENCES with the reason — they assert the DIVERGENT outcome,
so a regression in either direction still fails.

The whole corpus executes once in a module fixture (sequential, state
-sharing); the parametrized tests then assert each case's recorded
outcome, giving per-case pytest ids without re-running the corpus.
"""

from __future__ import annotations

import datetime
import json
import os
import re
from decimal import Decimal

import pytest

CORPUS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "defs_corpus.json"
)

with open(CORPUS_PATH) as _fh:
    _CORPUS = json.load(_fh)["tabletests"]

#: Driver-gate fast path (r14 test-gate split): the full ~150-tabletest
#: replay costs ~4 min of the bounded driver pytest budget; by default
#: only a PREFIX of the tabletest list replays. A prefix is state-safe
#: by construction — tabletests share one catalog and run in order, so
#: every table a prefix case queries was created by an earlier prefix
#: case. The full corpus runs on the nightly path (FB_FULL_SUITE=1),
#: and the dialect surface keeps its default coverage through the
#: mirror suites (test_sql_dialect, test_sql_complex_mirrors,
#: test_parser_error_mirrors, test_golden_reference).
_DEFAULT_PREFIX_TABLETESTS = 25
if not os.environ.get("FB_FULL_SUITE"):
    _CORPUS = _CORPUS[:_DEFAULT_PREFIX_TABLETESTS]


def _case_ids():
    out = []
    for tt in _CORPUS:
        for i, st in enumerate(tt["sqltests"]):
            for j in range(len(st["sqls"])):
                out.append(_case_id(tt, i, st, j))
        for j, pt in enumerate(tt.get("pqltests", [])):
            out.append(_pql_case_id(tt, j, pt))
    return out


def _pql_case_id(tt, j, pt):
    nm = f"-{pt['name']}" if pt["name"] else ""
    return f"{tt['var']}/pql-{j}{nm}"


#: FieldDef.fb_type -> the reference field-type names Index.field_types
#: consults (type-dependent validation, pql/calls.py Index docstring)
_FB_TO_REF_TYPE = {
    "int": "int", "decimal": "decimal", "bool": "bool",
    "timestamp": "timestamp", "id": "mutex", "string": "mutex",
    "idset": "set", "stringset": "set", "idsetq": "time",
    "stringsetq": "time",
}


def _case_id(tt, i, st, j):
    sname = f"{i:03d}" + (f"-{st['name']}" if st["name"] else "")
    suffix = f"/sql-{j}" if len(st["sqls"]) > 1 else ""
    return f"{tt['var']}/{sname}{suffix}"


CASE_IDS = _case_ids()

# ---------------------------------------------------------------------------
# Known deliberate divergences: case-id (or case-id prefix ending '*')
# -> (kind, reason). Kinds:
#   'err_text'   — we refuse the statement like the reference but with a
#                  different message (expected substring not mirrored).
#   'we_accept'  — the reference refuses; our declared-extension door
#                  accepts and computes a value.
#   'we_refuse'  — the reference computes a value; we refuse (documented
#                  substrate gap).
#   'rows'       — both compute; values/shape differ for the documented
#                  reason.
# The runner asserts the divergent outcome — if our behavior drifts
# back toward (or further from) the reference, the test fails and the
# entry must be revisited.
# ---------------------------------------------------------------------------

KNOWN_DIVERGENCES: dict[str, tuple[str, str]] = {}


def _load_known():
    here = os.path.dirname(os.path.abspath(__file__))
    p = os.path.join(here, "data", "defs_corpus_divergences.json")
    if os.path.exists(p):
        with open(p) as fh:
            KNOWN_DIVERGENCES.update(
                {k: tuple(v) for k, v in json.load(fh).items()}
            )


_load_known()


def _known(case_id: str):
    if case_id in KNOWN_DIVERGENCES:
        return KNOWN_DIVERGENCES[case_id]
    for k, v in KNOWN_DIVERGENCES.items():
        if k.endswith("*") and case_id.startswith(k[:-1]):
            return v
    return None


# ---------------------------------------------------------------------------
# Insert-statement generation — mirrors types.go insertTuples exactly
# (float64 renders %.2f, strings single-quoted raw, slices bracketed,
# time.Time RFC3339Nano).
# ---------------------------------------------------------------------------


def _cell_to_sql(cell: dict) -> str:
    k = cell["k"]
    if k == "null":
        return "null"
    if k == "int":
        return str(cell["v"])
    if k == "float":
        return "%.2f" % cell["v"]
    if k == "str":
        return "'" + cell["v"] + "'"
    if k == "bool":
        return "true" if cell["v"] else "false"
    if k == "intset":
        if cell["v"] is None:
            return "NULL"
        return "[" + ",".join(str(x) for x in cell["v"]) + "]"
    if k == "strset":
        if cell["v"] is None:
            return "NULL"
        return "['" + "','".join(cell["v"]) + "']"
    if k == "ts":
        return "'" + cell["v"] + "'"
    raise ValueError(f"insert cell {cell}")


def _create_sql(table: dict) -> str:
    cols = []
    for c in table["columns"]:
        f = c["name"] + " " + c["type"]
        if c["options"]:
            f += " " + c["options"]
        cols.append(f)
    return "CREATE TABLE " + table["name"] + " (" + ",".join(cols) + ")"


def _insert_sql(table: dict) -> str:
    tuples = ",".join(
        "(" + ",".join(_cell_to_sql(c) for c in row) + ")"
        for row in table["rowsets"][0]
    )
    return "INSERT INTO " + table["name"] + " VALUES " + tuples


# ---------------------------------------------------------------------------
# Expected-value decoding + comparison
# ---------------------------------------------------------------------------


def _exp_cell(cell: dict):
    k = cell["k"]
    if k == "null":
        return None
    if k in ("int", "float", "str", "bool"):
        return cell["v"]
    if k in ("intset", "strset"):
        return cell["v"]
    if k == "dec":
        return Decimal(cell["u"]).scaleb(-cell["s"])
    if k == "ts":
        # truncate the reference's ns render to Spark's µs domain
        v = cell["v"].rstrip("Z")
        if "." in v:
            head, frac = v.split(".", 1)
            v = head + "." + frac[:6]
        try:
            return datetime.datetime.fromisoformat(v)
        except ValueError:
            return cell["v"]  # year-0 etc. — compare as string
    raise ValueError(f"exp cell {cell}")


def _norm(v, sort_sets: bool):
    """Canonicalize one result cell for comparison."""
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        items = [_norm(x, sort_sets) for x in v]
        if sort_sets:
            items = sorted(items, key=repr)
        return ("set", tuple(items))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, str):
        return ("str", v)
    if v is None:
        return ("null",)
    return ("other", repr(v))


def _norm_exp(v, sort_sets: bool):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, list):
        items = [_norm_exp(x, sort_sets) for x in v]
        if sort_sets:
            items = sorted(items, key=repr)
        return ("set", tuple(items))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, str):
        return ("str", v)
    if v is None:
        return ("null",)
    return ("other", repr(v))


def _rows_equal(a, b) -> bool:
    if a == b:
        return True
    # float tolerance escape: identical shape, numeric cells within 1e-9
    if (
        isinstance(a, tuple)
        and isinstance(b, tuple)
        and len(a) == len(b)
        and a[:1] == b[:1] == ("num",)
    ):
        return abs(a[1] - b[1]) <= 1e-9 * max(1.0, abs(a[1]), abs(b[1]))
    return False


def _compare_case(st: dict, df) -> str | None:
    """Run the reference harness's comparison; return None on match or a
    failure description."""
    out_cols = df.columns
    collected = df.collect()
    got = [
        [r[c] for c in out_cols] for r in collected
    ]

    exp_hdrs = st["exp_hdrs"] or []
    exp_rows = [
        [_exp_cell(c) for c in row] for row in (st["exp_rows"] or [])
    ]

    # header check: names must match as multisets (reference
    # ElementsMatch on WireQueryFields — we check names; '' accepts any)
    exp_names = [h["name"] for h in exp_hdrs]
    if exp_names and all(n != "" for n in exp_names):
        if sorted(exp_names) != sorted(out_cols):
            return f"headers: expected {exp_names}, got {out_cols}"
        # reorder expected row cells into the RESULT's column order
        # (sql_test.go:84-99)
        idx = {n: i for i, n in enumerate(out_cols)}
        order = [idx[n] for n in exp_names]
        re_rows = []
        for row in exp_rows:
            new = [None] * len(out_cols)
            for j, cell in enumerate(row):
                new[order[j]] = cell
            re_rows.append(new)
        exp_rows = re_rows
    elif exp_names:
        if len(exp_names) != len(out_cols):
            return (
                f"headers: expected {len(exp_names)} cols {exp_names}, "
                f"got {out_cols}"
            )

    ss = st["sort_string_keys"]
    ngot = [tuple(_norm(c, ss) for c in row) for row in got]
    nexp = [tuple(_norm_exp(c, ss) for c in row) for row in exp_rows]

    cmp = st["compare"] or "exactUnordered"
    if cmp == "exactOrdered":
        if len(ngot) != len(nexp):
            return f"row count: expected {len(nexp)}, got {len(ngot)}"
        for i, (e, g) in enumerate(zip(nexp, ngot)):
            if not _row_tuple_equal(e, g):
                return f"row {i}: expected {e}, got {g}"
        return None
    if cmp == "exactUnordered":
        if len(ngot) != len(nexp):
            return f"row count: expected {len(nexp)}, got {len(ngot)}"
        rest = list(ngot)
        for e in nexp:
            for i, g in enumerate(rest):
                if _row_tuple_equal(e, g):
                    del rest[i]
                    break
            else:
                return f"expected row {e} not found in {rest[:5]}"
        return None
    if cmp == "includedIn":
        if len(ngot) != st["exp_row_count"]:
            return (
                f"row count: expected {st['exp_row_count']}, got {len(ngot)}"
            )
        for g in ngot:
            if not any(_row_tuple_equal(e, g) for e in nexp):
                return f"row {g} not in expected set"
        return None
    if cmp == "comparePartial":
        if len(nexp) > len(ngot):
            return f"row count: expected >= {len(nexp)}, got {len(ngot)}"
        for e in nexp:
            found = False
            for g in ngot:
                if all(
                    ec == ("null",) or _rows_equal(ec, gc)
                    for ec, gc in zip(e, g)
                ):
                    found = True
                    break
            if not found:
                return f"partial row {e} not matched"
        return None
    return f"unknown compare {cmp}"


def _row_tuple_equal(e, g) -> bool:
    if len(e) != len(g):
        return False
    return all(_rows_equal(ec, gc) for ec, gc in zip(e, g))


# ---------------------------------------------------------------------------
# One sequential corpus execution (module fixture)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus_results(spark):
    from featurebase_spark.operators.ddl import Catalog
    from featurebase_spark.sql import fb_sql

    cat = Catalog(spark)
    results: dict[str, dict] = {}

    for tt in _CORPUS:
        setup_err = None
        if tt["table"]:
            try:
                fb_sql(spark, _create_sql(tt["table"]), catalog=cat)
                if tt["table"]["rowsets"]:
                    fb_sql(spark, _insert_sql(tt["table"]), catalog=cat)
            except Exception as e:  # noqa: BLE001 — recorded per case
                setup_err = f"setup failed: {type(e).__name__}: {e}"

        for i, st in enumerate(tt["sqltests"]):
            for j, sql in enumerate(st["sqls"]):
                case_id = _case_id(tt, i, st, j)
                if setup_err:
                    results[case_id] = {"fail": setup_err}
                    continue
                results[case_id] = _run_one(spark, cat, st, sql, case_id)

        for j, pt in enumerate(tt.get("pqltests", [])):
            case_id = _pql_case_id(tt, j, pt)
            if setup_err:
                results[case_id] = {"fail": setup_err}
                continue
            results[case_id] = _run_pql(spark, cat, pt)
    return results


def _get_index(spark, cat, name: str):
    """An Index over a corpus catalog table, with the declared
    field-type map (id/string are mutex fields, sets are set fields)."""
    from featurebase_spark.pql.calls import Index
    from featurebase_spark.schema import spark_view_name

    td = cat._defs[name]
    name = spark_view_name(name)
    field_types = {
        fd.name: _FB_TO_REF_TYPE.get(fd.fb_type.lower(), fd.fb_type)
        for fd in td.fields
    }
    quantums = {
        fd.name: fd.time_quantum
        for fd in td.fields
        if fd.time_quantum
    }
    return Index(
        spark.table(name), field_types=field_types, quantums=quantums
    )


def _run_pql(spark, cat, pt: dict) -> dict:
    """Replay one PQLTest with the reference harness's semantics
    (dax_test.go:1075-1112: ExpErr substring; headers ElementsMatch;
    rows EXACT-ordered after header-name reorder)."""
    from featurebase_spark.pql import parser as P

    try:
        idx = _get_index(spark, cat, pt["table"])
        indexes = {
            n: _get_index(spark, cat, n) for n in cat._defs
            if n != pt["table"]
        }
        dfs = [
            P.execute(idx, q, indexes=indexes) for q in pt["pqls"]
        ]
        err = None
    except Exception as e:  # noqa: BLE001 — asserted on text
        dfs, err = [], str(e)

    if pt["exp_err"]:
        if err is None:
            return {
                "fail": f"expected error containing {pt['exp_err']!r}, "
                f"query succeeded"
            }
        if pt["exp_err"] not in err:
            return {
                "fail": None,
                "err_text": f"expected {pt['exp_err']!r} in error, "
                f"got {err!r}",
            }
        return {"fail": None}
    if err is not None:
        return {"fail": f"unexpected error: {err}"}
    st = {
        "exp_hdrs": pt["exp_hdrs"],
        "exp_rows": pt["exp_rows"],
        "compare": "exactOrdered",
        "sort_string_keys": False,
        "exp_row_count": 0,
    }
    for df in dfs:
        try:
            mismatch = _compare_case(st, df)
        except Exception as e:  # noqa: BLE001
            mismatch = f"compare crashed: {type(e).__name__}: {e}"
        if mismatch:
            return {"fail": mismatch}
    return {"fail": None}


def _run_one(spark, cat, st: dict, sql: str, case_id: str = "") -> dict:
    from featurebase_spark.sql import fb_sql

    known = _known(case_id)
    if known and known[0] == "row_order":
        # reference row order is single-node storage/scan order —
        # undefined in a distributed engine; VALUES still checked
        st = dict(st, compare="exactUnordered")

    try:
        df = fb_sql(spark, sql, catalog=cat)
        err = None
        if df is not None and st["exp_err"]:
            # runtime errors (raise_error guards: /0, out-of-range
            # positions, bad timestamp strings) surface at collect —
            # the reference evaluates eagerly, so ExpErr covers both
            df.collect()
    except Exception as e:  # noqa: BLE001 — the corpus asserts on text
        df = None
        err = str(e)

    if st["exp_err"]:
        if err is None:
            return {
                "fail": f"expected error containing {st['exp_err']!r}, "
                f"statement succeeded"
            }
        if st["exp_err"] not in err:
            return {
                "fail": None,
                "err_text": f"expected {st['exp_err']!r} in error, "
                f"got {err!r}",
            }
        return {"fail": None}

    if err is not None:
        return {"fail": f"unexpected error: {err}"}
    if df is None:
        # DDL/DML returns no frame on our door; the reference returns
        # empty headers + zero rows for these (sql_test.go runs INSERT
        # steps as SQLTests with ExpHdrs: hdrs(), ExpRows: rows()) —
        # an empty expectation is satisfied by the absent frame
        if st["exp_rows"]:
            return {"fail": "no result frame for a rows expectation"}
        return {"fail": None}
    if st["exp_rows"] is None and not st["exp_err"]:
        # DDL/INSERT steps inside SQLTests: success is the assertion
        try:
            df.collect()
        except Exception as e:  # noqa: BLE001
            return {"fail": f"collect failed: {e}"}
        return {"fail": None}
    try:
        mismatch = _compare_case(st, df)
    except Exception as e:  # noqa: BLE001
        mismatch = f"compare crashed: {type(e).__name__}: {e}"
    return {"fail": mismatch}


# ---------------------------------------------------------------------------
# Per-case assertions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case_id", CASE_IDS)
def test_defs_corpus(case_id, corpus_results):
    out = corpus_results[case_id]
    known = _known(case_id)
    failure = out.get("fail") or out.get("err_text")
    if known and known[0] == "row_order":
        # values were compared UNORDERED by the runner — must pass
        assert failure is None, (
            f"row_order divergence case failed even unordered: {failure}"
        )
        return
    if known:
        kind, reason = known
        assert failure, (
            f"case is listed as a known divergence ({kind}: {reason}) "
            f"but now MATCHES the reference — remove the entry"
        )
        return
    assert out.get("fail") is None, out["fail"]
    assert not out.get("err_text"), out.get("err_text")
