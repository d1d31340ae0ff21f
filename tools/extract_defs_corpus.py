"""Mechanically extract the reference's ENTIRE sql3 defs test corpus
(/root/reference/sql3/test/defs/defs_*.go — ~1,800 SQLTest cases across
~130 TableTests, the table driven by sql3/sql_test.go TestSQL_Execute)
into a JSON corpus the pytest runner (tests/test_defs_corpus.py) replays
through the dialect front door.

This lifts the golden mirror from the ~350 hand-picked cases of
tests/test_golden_reference.py to the FULL corpus, with the same
execution semantics the reference harness applies (sql_test.go:34-160):

- TableTests run IN ORDER (defs.go:19 TableTests) sharing one catalog —
  later tables query earlier tables (e.g. sql1TestsQueries reads the
  `grouper` table created by sql1TestsGrouper).
- Each TableTest optionally CREATEs its table (types.go:269 createTable)
  and INSERTs row-set 0 (types.go:288 insertInto — the harness's
  InsertInto(t) default).
- Each SQLTest runs every member of SQLs with the same expectation;
  ExpErr is a substring match on the error; result rows compare per
  Compare (exactOrdered / exactUnordered / includedIn / partial,
  sql_test.go:112-146) after reordering expected columns by header name.
- ExpRowsPlus1 / PQLTests are consumed by OTHER reference harnesses
  (DAX cluster runs), not TestSQL_Execute — recorded but not replayed.

The extractor is a small recursive-descent parser over the Go literal
subset the defs files use (helpers sqls/hdrs/hdr/rows/row/srcHdrs/
srcRow/tbl, value constructors int64/float64/bool/string, []int64/
[]string slices, pql.NewDecimal, the time.* constructors, and the
file-local timestamp helpers defs.go:221-253 et al). No Go toolchain
involved; output is tests/data/defs_corpus.json.

Cell encoding in the JSON (tagged, so the runner never guesses types):
  {"k":"int","v":..} {"k":"float","v":..} {"k":"str","v":..}
  {"k":"bool","v":..} {"k":"null"} {"k":"intset","v":[..]|null}
  {"k":"strset","v":[..]|null} {"k":"dec","u":unscaled,"s":scale}
  {"k":"ts","v":"RFC3339Nano"} {"k":"func"}

Run: python tools/extract_defs_corpus.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

DEFS_DIR = "/root/reference/sql3/test/defs"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
    "defs_corpus.json",
)

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
    | (?P<rawstr>`[^`]*`)
    | (?P<str>"(?:\\.|[^"\\])*")
    | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+|\d+)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
    | (?P<punct>[{}()\[\],:;&*+\-])
    """,
    re.X,
)

_GO_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'",
    "a": "\a", "b": "\b", "f": "\f", "v": "\v", "0": "\0",
}


def _decode_go_string(raw: str) -> str:
    body = raw[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _GO_ESCAPES:
                out.append(_GO_ESCAPES[nxt])
                i += 2
                continue
            if nxt in "uU":
                width = 4 if nxt == "u" else 8
                hexs = body[i + 2 : i + 2 + width]
                out.append(chr(int(hexs, 16)))
                i += 2 + width
                continue
            if nxt == "x":
                out.append(chr(int(body[i + 2 : i + 4], 16)))
                i += 4
                continue
        out.append(c)
        i += 1
    return "".join(out)


def tokenize(src: str):
    toks = []
    pos = 0
    n = len(src)
    while pos < n:
        m = TOKEN_RE.match(src, pos)
        if not m:
            # skip characters the value grammar never needs (e.g. '/',
            # '=', '!' inside func bodies we brace-skip anyway)
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind == "rawstr":
            toks.append(("str", val[1:-1], m.start()))
        elif kind == "str":
            toks.append(("str", _decode_go_string(val), m.start()))
        else:
            toks.append((kind, val, m.start()))
    return toks


# ---------------------------------------------------------------------------
# Parser (Go literal subset)
# ---------------------------------------------------------------------------

class P:
    def __init__(self, toks, i=0, src=""):
        self.toks = toks
        self.i = i
        self.src = src

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "", -1)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise SyntaxError(f"expected {val!r}, got {t!r} @tok{self.i}")
        return t


class Call:
    def __init__(self, name, args, chain=None):
        self.name = name
        self.args = args
        self.chain = chain or []  # trailing .Method(args) calls


class Struct:
    def __init__(self, type_name, fields, positional):
        self.type_name = type_name
        self.fields = fields
        self.positional = positional


class Slice:
    def __init__(self, elem_type, items):
        self.elem_type = elem_type
        self.items = items


class Ident:
    def __init__(self, name):
        self.name = name


FUNC_MARK = object()


def skip_balanced(p: P, open_tok: str, close_tok: str):
    depth = 0
    while True:
        t = p.next()
        if t[0] == "eof":
            raise SyntaxError("eof in balanced skip")
        if t[1] == open_tok:
            depth += 1
        elif t[1] == close_tok:
            depth -= 1
            if depth == 0:
                return


def parse_value(p: P):
    left = parse_primary(p)
    # binary '+' (string concat in hdr type exprs, e.g.
    # dax.BaseTypeDecimal + "(4)")
    while p.peek()[1] == "+":
        p.next()
        right = parse_primary(p)
        left = ("concat", left, right)
    return left


def parse_primary(p: P):
    kind, val, _ = p.peek()
    if kind == "str":
        p.next()
        return val
    if kind == "num":
        p.next()
        return float(val) if "." in val or "e" in val or "E" in val else int(val)
    if val == "-":
        p.next()
        k2, v2, _ = p.next()
        if k2 != "num":
            raise SyntaxError(f"expected number after '-', got {v2!r}")
        return -(float(v2) if "." in v2 else int(v2))
    if val == "&":  # address-of a struct literal
        p.next()
        return parse_primary(p)
    if val == "*":  # pointer type inside slice elem (e.g. []*featurebase.X)
        p.next()
        return parse_primary(p)
    if val == "[":  # slice type prefix `[]T{...}` tokenized as [ ] T { ...
        p.next()
        p.expect("]")
        return parse_slice_after_brackets(p)
    if kind == "ident":
        if val == "func":
            # skip the signature parens and the body braces
            p.next()
            skip_balanced(p, "(", ")")
            # return type tokens up to '{'
            while p.peek()[1] != "{":
                p.next()
            skip_balanced(p, "{", "}")
            return FUNC_MARK
        if val == "map":
            # map[K]V{...}
            p.next()
            skip_balanced(p, "[", "]")
            parse_type_tokens(p)
            return parse_struct_body(p, "map")
        p.next()
        if val in ("true", "false"):
            return val == "true"
        if val == "nil":
            return None
        nxt = p.peek()[1]
        if nxt == "(":
            call = parse_call(p, val)
            return call
        if nxt == "{":
            return parse_struct_body(p, val)
        return Ident(val)
    raise SyntaxError(f"unexpected token {p.peek()!r}")


def parse_type_tokens(p: P):
    """Consume a type expression that precedes a composite literal brace,
    handling `interface{}` / nested `[]` / dotted names / `*`."""
    while True:
        kind, val, _ = p.peek()
        if val == "[":
            p.next()
            p.expect("]")
            continue
        if val == "*":
            p.next()
            continue
        if kind == "ident":
            p.next()
            if val == "interface" and p.peek()[1] == "{" and p.peek(1)[1] == "}":
                p.next()
                p.next()
            continue
        return


def parse_slice_after_brackets(p: P):
    # after consuming `[]`: a type then `{` items `}`
    # record elem type name for tagging ([]int64 / []string)
    kind, val, _ = p.peek()
    elem_type = val if kind == "ident" else ""
    parse_type_tokens(p)
    if p.peek()[1] == "(":
        # conversion form: []int64(nil) / []string(nil) — a typed nil
        p.next()
        inner = parse_value(p)
        p.expect(")")
        assert inner is None, inner
        return Slice(elem_type, None)
    p.expect("{")
    items = []
    while p.peek()[1] != "}":
        if p.peek()[1] == "{":  # positional struct literal element
            items.append(parse_struct_body(p, ""))
        else:
            items.append(parse_value(p))
        if p.peek()[1] == ",":
            p.next()
    p.expect("}")
    return Slice(elem_type, items)


def parse_struct_body(p: P, type_name: str):
    p.expect("{")
    fields = {}
    positional = []
    while p.peek()[1] != "}":
        k0, v0, _ = p.peek()
        if (
            k0 in ("ident", "str")
            and p.peek(1)[1] == ":"
        ):
            key = v0
            p.next()
            p.next()
            if p.peek()[1] == "{":
                fields[key] = parse_struct_body(p, "")
            else:
                fields[key] = parse_value(p)
        elif p.peek()[1] == "{":
            positional.append(parse_struct_body(p, ""))
        else:
            positional.append(parse_value(p))
        if p.peek()[1] == ",":
            p.next()
    p.expect("}")
    return Struct(type_name, fields, positional)


# the defs corpus builds exactly two SQL strings via fmt.Sprintf
# (defs_date_functions.go:347,362) — the %d args are either int
# literals or knownTimestamp() component methods; evaluate them from
# the known constant (2012-11-01T22:08:41Z)
_SPRINTF_ARG_VALUES = {
    "knownTimestamp().Year()": 2012,
    "knownTimestamp().Month()": 11,
    "knownTimestamp().Day()": 1,
    "knownTimestamp().Hour()": 22,
    "knownTimestamp().Minute()": 8,
    "knownTimestamp().Second()": 41,
    "knownTimestamp().Nanosecond()/(1000*1000)": 0,
}


def _parse_sprintf(p: P):
    """fmt.Sprintf(fmt, args...) → the formatted string. Args are
    captured as raw source text between top-level commas."""
    fmt_tok = p.next()
    assert fmt_tok[0] == "str", fmt_tok
    args = []
    depth = 0
    start = None
    while True:
        kind, val, off = p.peek()
        if depth == 0 and val in (",", ")"):
            if start is not None:
                raw = re.sub(r"\s+", "", p.src[start:off])
                if raw:
                    args.append(
                        int(raw) if raw.isdigit()
                        else _SPRINTF_ARG_VALUES[raw]
                    )
                start = None
            if val == ")":
                p.next()
                break
            p.next()
            continue
        if start is None:
            start = off
        if val in ("(", "{", "["):
            depth += 1
        elif val in (")", "}", "]"):
            depth -= 1
        p.next()
    out = fmt_tok[1]
    for a in args:
        out = out.replace("%d", str(a), 1)
    return out


def parse_call(p: P, name: str):
    p.expect("(")
    if name == "fmt.Sprintf":
        return _parse_sprintf(p)
    args = []
    while p.peek()[1] != ")":
        if p.peek()[1] == "{":
            args.append(parse_struct_body(p, ""))
        else:
            args.append(parse_value(p))
        if p.peek()[1] == ",":
            p.next()
    p.expect(")")
    chain = []
    while p.peek()[1] == "." if False else False:
        pass
    # trailing .Method() chains arrive as a single dotted ident ONLY when
    # lexed together; time.Unix(0,0).UTC() lexes as time.Unix ( .. ) . UTC ( )
    # — our tokenizer has no lone '.', so detect ident starting with UTC
    while p.peek()[0] == "ident" and p.peek(1)[1] == "(" and p.peek()[1] in (
        "UTC",
    ):
        mname = p.next()[1]
        p.expect("(")
        p.expect(")")
        chain.append(mname)
    return Call(name, args, chain)


# ---------------------------------------------------------------------------
# Evaluation into tagged JSON cells
# ---------------------------------------------------------------------------

import datetime as _dt

_KNOWN_TS = "2012-11-01T22:08:41Z"
_GROUPER_TS = [
    "2011-04-02T12:32:00Z", "2011-01-02T12:32:00Z", "2012-01-02T12:32:00Z",
    "2013-09-02T12:32:00Z", "2014-01-02T12:32:00Z", "2010-05-02T12:32:00Z",
    "2016-08-02T12:32:00Z", "2020-01-02T12:32:00Z", "2000-03-02T12:32:00Z",
    "2018-01-02T12:32:00Z",
]

_FLD_TYPES = {
    "fldTypeID": "id",
    "fldTypeBool": "bool",
    "fldTypeIDSet": "idset",
    "fldTypeIDSetQ": "idsetq",
    "fldTypeInt": "int",
    "fldTypeDecimal2": "decimal(2)",
    "fldTypeString": "string",
    "fldTypeStringSet": "stringset",
    "fldTypeStringSetQ": "stringsetq",
    "fldTypeTimestamp": "timestamp",
}

_DAX_CONSTS = {
    "dax.BaseTypeID": "id",
    "dax.BaseTypeBool": "bool",
    "dax.BaseTypeIDSet": "idset",
    "dax.BaseTypeIDSetQ": "idsetq",
    "dax.BaseTypeInt": "int",
    "dax.BaseTypeDecimal": "decimal",
    "dax.BaseTypeString": "string",
    "dax.BaseTypeStringSet": "stringset",
    "dax.BaseTypeStringSetQ": "stringsetq",
    "dax.BaseTypeTimestamp": "timestamp",
}


def _ts_cell(epoch_s=None, extra_ns=0, iso=None):
    if iso is not None:
        base = _dt.datetime.fromisoformat(iso.replace("Z", "+00:00"))
        ns = 0
        if "." in iso:
            frac = iso.split(".", 1)[1].rstrip("Z+00:")
        epoch_s = int(base.replace(microsecond=0).timestamp())
        extra_ns = base.microsecond * 1000
    total_ns = int(epoch_s) * 10**9 + int(extra_ns)
    secs, ns = divmod(total_ns, 10**9)
    dt = _dt.datetime.fromtimestamp(secs, _dt.timezone.utc)
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if ns:
        s += (".%09d" % ns).rstrip("0")
    return {"k": "ts", "v": s + "Z"}


def _eval_ts_call(c: Call):
    n = c.name
    if n == "time.Unix":
        return _ts_cell(c.args[0], c.args[1])
    if n == "time.UnixMilli":
        return _ts_cell(0, int(c.args[0]) * 10**6)
    if n == "time.UnixMicro":
        return _ts_cell(0, int(c.args[0]) * 10**3)
    if n == "time.Date":
        y, mo, d, h, mi, s, ns = [int(a) for a in c.args[:7]]
        if y < 1:
            # Go's year-0 etc. — unrepresentable in datetime; keep text
            return {"k": "ts", "v": "%04d-%02d-%02dT%02d:%02d:%02dZ"
                    % (y, mo, d, h, mi, s)}
        dt = _dt.datetime(y, mo, d, h, mi, s, tzinfo=_dt.timezone.utc)
        return _ts_cell(int(dt.timestamp()), ns)
    if n == "knownTimestamp":
        return _ts_cell(iso=_KNOWN_TS)
    if n == "knownSubSecondTimestamp":
        return _ts_cell(1351807721, 100200300)
    if n == "knownSubSecondTimestamp2":
        return _ts_cell(1670609094, 300500800)
    if n == "timestampFromString":
        return _ts_cell(iso=c.args[0])
    if n == "grouperTimeX":
        return _ts_cell(iso=_GROUPER_TS[_eval_int(c.args[0]) - 1])
    if n == "expectedCastTime":
        return _ts_cell(1000, 0)
    if n == "earlyMay2022":
        return _ts_cell(iso="2022-05-05T13:00:00Z")
    if n == "lateMay2022":
        return _ts_cell(iso="2022-05-28T13:00:00Z")
    return None


def _eval_int(v):
    if isinstance(v, int):
        return v
    if isinstance(v, tuple) and v and v[0] == "concat":
        # generic '+' — integer addition here (grouperTimeX(0+1))
        return _eval_int(v[1]) + _eval_int(v[2])
    raise ValueError(f"int {v!r}")


def eval_cell(v):
    """One expected-row / source-row cell → tagged JSON dict."""
    if v is None:
        return {"k": "null"}
    if isinstance(v, bool):
        return {"k": "bool", "v": v}
    if isinstance(v, int):
        return {"k": "int", "v": v}
    if isinstance(v, float):
        return {"k": "float", "v": v}
    if isinstance(v, str):
        return {"k": "str", "v": v}
    if v is FUNC_MARK:
        return {"k": "func"}
    if isinstance(v, Slice):
        if v.elem_type == "int64":
            return {
                "k": "intset",
                "v": None if v.items is None else [int(x) for x in v.items],
            }
        if v.elem_type == "string":
            return {
                "k": "strset",
                "v": None if v.items is None else list(v.items),
            }
        raise ValueError(f"slice cell of {v.elem_type}")
    if isinstance(v, Call):
        n = v.name
        if n in ("int64", "uint64", "int", "int32"):
            return {"k": "int", "v": int(v.args[0])}
        if n == "float64":
            return {"k": "float", "v": float(v.args[0])}
        if n == "bool":
            return {"k": "bool", "v": bool(v.args[0])}
        if n == "string":
            return {"k": "str", "v": v.args[0]}
        if n == "pql.NewDecimal":
            return {"k": "dec", "u": int(v.args[0]), "s": int(v.args[1])}
        if n == "time.Time":  # identity conversion, e.g.
            # time.Time(knownTimestamp()) (defs_binops.go:770)
            return eval_cell(v.args[0])
        ts = _eval_ts_call(v)
        if ts is not None:
            return ts
        raise ValueError(f"call cell {n}")
    if isinstance(v, tuple) and v and v[0] == "concat":
        return {"k": "str", "v": eval_str(v)}
    if isinstance(v, Ident):
        # []int64(nil) style — but bare idents in cells shouldn't happen
        raise ValueError(f"ident cell {v.name}")
    raise ValueError(f"cell {v!r}")


def eval_str(v):
    if isinstance(v, str):
        return v
    if isinstance(v, Ident):
        if v.name in _DAX_CONSTS:
            return _DAX_CONSTS[v.name]
        raise ValueError(f"str ident {v.name}")
    if isinstance(v, tuple) and v[0] == "concat":
        return eval_str(v[1]) + eval_str(v[2])
    raise ValueError(f"str {v!r}")


def eval_hdr_type(v):
    if isinstance(v, Ident):
        t = _FLD_TYPES.get(v.name)
        if t is None:
            raise ValueError(f"hdr type ident {v.name}")
        return t
    if isinstance(v, Struct):
        return eval_str(v.fields["Type"])
    raise ValueError(f"hdr type {v!r}")


def eval_hdrs(v):
    if v is None:
        return None
    assert isinstance(v, Call) and v.name == "hdrs", v
    out = []
    for h in v.args:
        assert isinstance(h, Call) and h.name == "hdr", h
        out.append({"name": h.args[0], "type": eval_hdr_type(h.args[1])})
    return out


def eval_rows(v):
    if v is None:
        return None
    assert isinstance(v, Call) and v.name == "rows", v
    out = []
    for r in v.args:
        assert isinstance(r, Call) and r.name == "row", r
        out.append([eval_cell(c) for c in r.args])
    return out


def eval_sqls(v):
    assert isinstance(v, Call) and v.name == "sqls", v
    return list(v.args)


_COMPARE = {
    "CompareExactOrdered": "exactOrdered",
    "CompareExactUnordered": "exactUnordered",
    "CompareIncludedIn": "includedIn",
    "ComparePartial": "comparePartial",
}


def eval_sqltest(s: Struct):
    f = s.fields
    out = {
        "name": f.get("name", ""),
        "sqls": eval_sqls(f["SQLs"]) if "SQLs" in f else [],
        "exp_err": f.get("ExpErr", ""),
        "compare": "",
        "sort_string_keys": bool(f.get("SortStringKeys", False)),
        "exp_row_count": int(f.get("ExpRowCount", 0) or 0),
        "plan_check": "PlanCheck" in f,
    }
    if "Compare" in f:
        out["compare"] = _COMPARE[f["Compare"].name]
    out["exp_hdrs"] = eval_hdrs(f.get("ExpHdrs"))
    out["exp_rows"] = eval_rows(f.get("ExpRows"))
    out["has_rows_plus1"] = "ExpRowsPlus1" in f
    return out


def eval_table(v):
    """tbl(name, srcHdrs(...), srcRows(...)...) → table dict or None."""
    if v is None or isinstance(v, Ident):
        return None
    assert isinstance(v, Call) and v.name == "tbl", v
    name = v.args[0]
    cols_v = v.args[1] if len(v.args) > 1 else None
    if not name or cols_v is None:
        return None
    assert isinstance(cols_v, Call) and cols_v.name == "srcHdrs"
    cols = []
    for h in cols_v.args:
        assert isinstance(h, Call) and h.name == "srcHdr", h
        cols.append(
            {
                "name": h.args[0],
                "type": eval_hdr_type(h.args[1]),
                "options": " ".join(h.args[2:]),
            }
        )
    rowsets = []
    for rs in v.args[2:]:
        if rs is None:
            continue
        assert isinstance(rs, Call) and rs.name == "srcRows", rs
        rowsets.append(
            [[eval_cell(c) for c in r.args] for r in rs.items()]
            if False
            else [[eval_cell(c) for c in r.args] for r in rs.args]
        )
    return {"name": name, "columns": cols, "rowsets": rowsets}


def eval_tabletest(s: Struct, var_name: str, file: str, line: int):
    f = s.fields
    sqltests = []
    st = f.get("SQLTests")
    if isinstance(st, Slice):
        for item in st.items:
            sqltests.append(eval_sqltest(item))
    pqltests = []
    pt = f.get("PQLTests")
    if isinstance(pt, Slice):
        for item in pt.items:
            pf = item.fields
            pq = pf.get("PQLs")
            pqltests.append(
                {
                    "name": pf.get("name", ""),
                    "table": pf.get("Table", ""),
                    "pqls": list(pq.items) if isinstance(pq, Slice) else [],
                    "exp_hdrs": eval_hdrs(pf.get("ExpHdrs")),
                    "exp_rows": eval_rows(pf.get("ExpRows")),
                    "exp_err": pf.get("ExpErr", ""),
                }
            )
    return {
        "var": var_name,
        "name": f.get("name", ""),
        "file": os.path.basename(file),
        "line": line,
        "table": eval_table(f.get("Table")),
        "sqltests": sqltests,
        "pqltests": pqltests,
    }


# ---------------------------------------------------------------------------
# Top-level extraction
# ---------------------------------------------------------------------------

VAR_RE = re.compile(r"^var\s+(\w+)\s*(?:TableTest\s*)?=\s*TableTest\{", re.M)
ALIAS_RE = re.compile(r"^var\s+(\w+)\s+TableTest\s*=\s*(\w+)\s*$", re.M)


def extract_file(path: str):
    src = open(path).read()
    out = {}
    for m in VAR_RE.finditer(src):
        var_name = m.group(1)
        line = src[: m.start()].count("\n") + 1
        # parse from the TableTest{ brace
        brace_pos = m.end() - 1
        sub = src[brace_pos:]
        toks = tokenize(sub)
        p = P(toks, src=sub)
        try:
            struct = parse_struct_body(p, "TableTest")
            out[var_name] = eval_tabletest(struct, var_name, path, line)
        except (SyntaxError, ValueError, AssertionError) as e:
            off = p.peek()[2]
            ctx = src[brace_pos + max(0, off - 80) : brace_pos + off + 80]
            raise SystemExit(
                f"{path}:{line} var {var_name}: {e}\n--- context ---\n{ctx}"
            )
    return out


def extract_order():
    src = open(os.path.join(DEFS_DIR, "defs.go")).read()
    m = re.search(
        r"var TableTests \[\]TableTest = \[\]TableTest\{(.*?)\n\}",
        src,
        re.S,
    )
    body = m.group(1)
    body = re.sub(r"//[^\n]*", "", body)
    return [w.strip() for w in body.split(",") if w.strip()]


def main(out_path: str = DEFAULT_OUT) -> int:
    all_tables = {}
    for fn in sorted(os.listdir(DEFS_DIR)):
        if not fn.endswith(".go") or fn in ("types.go", "defs.go"):
            continue
        all_tables.update(extract_file(os.path.join(DEFS_DIR, fn)))
    order = extract_order()
    missing = [v for v in order if v not in all_tables]
    if missing:
        raise SystemExit(f"unresolved TableTests entries: {missing}")
    corpus = [all_tables[v] for v in order]
    n_cases = sum(len(t["sqltests"]) for t in corpus)
    n_sqls = sum(
        len(s["sqls"]) for t in corpus for s in t["sqltests"]
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "source": "sql3/test/defs (TestSQL_Execute order, defs.go:19)",
                "tabletests": corpus,
            },
            fh,
            indent=0,
            sort_keys=True,
        )
    print(
        f"extracted {len(corpus)} TableTests, {n_cases} SQLTests, "
        f"{n_sqls} SQL statements -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
