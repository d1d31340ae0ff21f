"""FeatureBase scalar-function library → Spark expressions.

Complete mapping of the reference's built-in SQL functions (SURVEY §2.3;
dispatch ``sql3/planner/expressionanalyzercall.go:25-336``, implementations
``inbuiltfunctions{set,string,date,quantum}.go``). Every function is a thin
wrapper over a JVM-side built-in — nothing here leaves whole-stage codegen.

Call either the Python wrappers (``fb.UPPER(col)``) or resolve by
FeatureBase name via :func:`fb_function` (useful for a dialect translator).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --- Set functions (inbuiltfunctionsset.go; PQL pushdown expressionpql.go:28-97)
#
# The reference's EVALUATOR compares string-set members with
# strings.EqualFold — membership is CASE-INSENSITIVE for stringsets
# (stringSetContains, inbuiltfunctionsset.go:170-177) and exact for id
# sets — and returns NULL when EITHER argument is NULL (every Evaluate*
# returns nil on a nil arg). Note the reference's own split brain: the
# PQL pushdown path (field vs literal in WHERE → Row(), expressionpql.go
# :28-97) matches keys EXACTLY; the row-wise evaluator folds case. We
# follow the evaluator, which defines the scalar function. One folded
# comparison serves both element types because int64→string is
# injective; lower() approximates Go's Unicode simple fold (divergent
# only on exotic folds like the Kelvin sign — documented, absent from
# the corpus).


def _fold(c: Column) -> Column:
    return F.lower(c.cast("string"))


def SETCONTAINS(col, value) -> Column:
    """SETCONTAINS(set, v) — case-folded membership; NULL on NULL args
    (EvaluateSetContains — Spark's array_contains(set, NULL) would
    instead fail analysis)."""
    s, v = _c(col), _lit(value)
    hit = F.exists(s, lambda x: _fold(x) == _fold(v))
    return F.when(
        s.isNull() | v.isNull(), F.lit(None).cast("boolean")
    ).otherwise(hit)


def SETCONTAINSALL(col, values) -> Column:
    """SETCONTAINSALL(set, set) — case-folded superset test; vacuously
    true on an empty test set (EvaluateSetContainsAll loop)."""
    s, vs = _c(col), _lit(values)
    hit = F.forall(vs, lambda y: F.exists(s, lambda x: _fold(x) == _fold(y)))
    return F.when(
        s.isNull() | vs.isNull(), F.lit(None).cast("boolean")
    ).otherwise(hit)


def SETCONTAINSANY(col, values) -> Column:
    """SETCONTAINSANY(set, set) — case-folded overlap test; false on an
    empty test set (EvaluateSetContainsAny loop)."""
    s, vs = _c(col), _lit(values)
    hit = F.exists(vs, lambda y: F.exists(s, lambda x: _fold(x) == _fold(y)))
    return F.when(
        s.isNull() | vs.isNull(), F.lit(None).cast("boolean")
    ).otherwise(hit)


# --- String functions (inbuiltfunctionsstring.go:257-860)


def REVERSE(col) -> Column:
    return F.reverse(_c(col))


def _range_err(n: Column, cast_to: str) -> Column:
    return F.raise_error(
        F.concat(
            F.lit("[0:0] value '"), n.cast("string"), F.lit("' out of range")
        )
    ).cast(cast_to)


def CHAR(col) -> Column:
    """Codepoint for n in [0, 255]; out of range raises
    (EvaluateChar — Spark's char() would wrap mod 256)."""
    n = _c(col)
    return F.when(
        n.isNotNull() & ((n < 0) | (n > 255)), _range_err(n, "string")
    ).otherwise(F.char(n))


def ASCII(col) -> Column:
    """First codepoint; the reference requires BYTE length exactly 1
    (EvaluateAscii, Go len())."""
    s = _c(col)
    err = F.raise_error(
        F.concat(
            F.lit("[0:0] value '"), s, F.lit("' should be of the length 1")
        )
    ).cast("bigint")
    return F.when(
        s.isNotNull() & (F.octet_length(s) > 1), err
    ).otherwise(F.ascii(s))


def UPPER(col) -> Column:
    return F.upper(_c(col))


def LOWER(col) -> Column:
    return F.lower(_c(col))


def STRINGSPLIT(col, sep: str, idx: int = 0) -> Column:
    """STRINGSPLIT(s, sep, n) — n-th piece of a LITERAL-separator split
    (Go strings.Split, not regex); n <= 0 picks the first piece, n past
    the end returns ''. NULL in ANY argument returns NULL
    (EvaluateStringSplit:440-512 evaluates each arg and returns nil on
    nil — without the leading guard, split(NULL) would fall through the
    size() comparison to the '' branch)."""
    s = _c(col)
    sp = _lit(sep)
    parts = F.split(s, F.concat(F.lit("\\Q"), sp, F.lit("\\E")), F.lit(-1))
    i = _c(idx) if isinstance(idx, Column) else F.lit(idx)
    return (
        F.when(s.isNull() | sp.isNull() | i.isNull(), F.lit(None).cast("string"))
        .when(i <= 0, F.element_at(parts, 1))
        .when(i < F.size(parts), F.element_at(parts, i.cast("int") + 1))
        .otherwise(F.lit(""))
    )


def _byte_slice(s: Column, pos1: Column, ln: Column) -> Column:
    """Slice UTF-8 BYTES (1-based pos) and decode back — the reference
    slices Go byte strings (``stringArg[a:b]``), so multi-byte inputs
    slice at byte boundaries, not characters. Divergence: a slice that
    splits a multi-byte sequence decodes to U+FFFD here where Go keeps
    the raw invalid bytes; identical for any ASCII input (the entire
    reference corpus)."""
    return F.decode(
        F.call_function("substring", F.encode(s, "UTF-8"), pos1, ln),
        "UTF-8",
    )


def SUBSTRING(col, start: int, length: int | None = None) -> Column:
    """SUBSTRING(s, start[, len]) — reference is 0-based with HARD range
    checks on the Go BYTE length (EvaluateSubstring:362-416): start in
    [0, len(s)), start + len <= len(s); violations raise with the
    offending bound. Slices bytes, like the reference."""
    s = _c(col)
    i = _c(start) if isinstance(start, Column) else F.lit(start)
    blen = F.octet_length(s)
    start_bad = s.isNotNull() & ((i < 0) | (i >= blen))
    if length is None:
        return F.when(start_bad, _range_err(i, "string")).otherwise(
            _byte_slice(s, i + 1, F.lit(2**31 - 1))
        )
    ln = _c(length) if isinstance(length, Column) else F.lit(length)
    end = i + ln
    end_bad = s.isNotNull() & ln.isNotNull() & ((end < i) | (end > blen))
    return (
        F.when(start_bad, _range_err(i, "string"))
        .when(end_bad, _range_err(end, "string"))
        .otherwise(_byte_slice(s, i + 1, ln))
    )


def REPLACEALL(col, search: str, repl: str) -> Column:
    return F.replace(_c(col), _lit(search), _lit(repl))


def TRIM(col) -> Column:
    return F.trim(_c(col))


def RTRIM(col) -> Column:
    return F.rtrim(_c(col))


def LTRIM(col) -> Column:
    return F.ltrim(_c(col))


def SUFFIX(col, n) -> Column:
    """Last ``n`` characters (inbuiltfunctionsstring.go:592-630 — NOT
    endswith; the pre-r10 boolean mapping was wrong). NULL-propagating;
    n < 0 or n > len(s) raises the reference's out-of-range error at
    evaluation time."""
    return _prefix_suffix(_c(col), _c(n) if isinstance(n, Column) else _lit(n), last=True)


def PREFIX(col, n) -> Column:
    """First ``n`` characters (inbuiltfunctionsstring.go:560-590)."""
    return _prefix_suffix(_c(col), _c(n) if isinstance(n, Column) else _lit(n), last=False)


def _prefix_suffix(s: Column, n: Column, last: bool) -> Column:
    # raise_error carries the exact reference text with the offending
    # value; NULL s or n falls through to the NULL-propagating picker.
    # Range check and slice are on Go BYTE length
    # (inbuiltfunctionsstring.go:585-589,617-621 — len()/[:n] on a Go
    # string are bytes), so 'ÿber' has length 5 here, not 4.
    msg = F.concat(
        F.lit("[0:0] value '"), n.cast("string"), F.lit("' out of range")
    )
    blen = F.octet_length(s)
    if last:
        body = _byte_slice(s, blen - n + 1, n)
    else:
        body = _byte_slice(s, F.lit(1), n)
    return F.when(
        s.isNotNull() & ((n < 0) | (n > blen)),
        F.raise_error(msg).cast("string"),
    ).otherwise(body)


def SPACE(n) -> Column:
    return F.repeat(F.lit(" "), _lit(n) if not isinstance(n, int) else n)


def LEN(col) -> Column:
    return F.length(_c(col))


def REPLICATE(col, n: int) -> Column:
    """Repeat; negative n raises (EvaluateReplicate — Spark repeat()
    silently returns '')."""
    nn = _c(n) if isinstance(n, Column) else F.lit(n)
    return F.when(nn < 0, _range_err(nn, "string")).otherwise(
        F.repeat(_c(col), nn.cast("int"))
    )


def FORMAT(fmt: str, *cols) -> Column:
    """Go-verb format: %t (Go boolean) maps to Java's %b."""
    return F.format_string(fmt.replace("%t", "%b"), *[_c(c) for c in cols])


def CHARINDEX(substr, col, start: int | None = None) -> Column:
    """CHARINDEX(sub, s[, start]) — position of sub in s from `start`,
    0-based like the reference (-1 if absent). The 3-arg form range
    checks start against the BYTE length, [0, len(s)) — even start=0
    errors on an empty string (EvaluateCharIndex:777, pos >= len(s)),
    so an explicit start must NOT take the unguarded 2-arg fast path;
    only an omitted start (sentinel None) does."""
    if start is None:
        return F.locate(substr, _c(col)) - 1
    s = _c(col)
    pos = _c(start) if isinstance(start, Column) else F.lit(start)
    sub = _lit(substr) if isinstance(substr, str) else _c(substr)
    found = F.call_function("locate", sub, s, (pos + 1).cast("int")) - 1
    return F.when(
        s.isNotNull() & ((pos < 0) | (pos >= F.octet_length(s))),
        _range_err(pos, "bigint"),
    ).otherwise(found)


def STR(col, length: int = 10, decimals: int = 0) -> Column:
    """SQL-Server-style STR(x, length=10, decimals=0): fixed-width
    right-justified numeric text; overflow renders '*' * length
    (EvaluateStr — the pre-r10 bare CAST lost the width contract)."""
    x = _c(col)
    fmt = F.format_string(f"%{int(length)}.{int(decimals)}f", x.cast("double"))
    return (
        F.when(x.isNull(), F.lit(None).cast("string"))
        .when(F.length(fmt) > int(length), F.lit("*" * int(length)))
        .otherwise(fmt)
    )


# --- Date/time functions (inbuiltfunctionsdate.go)
#
# The reference's interval codes (inbuiltfunctionsdate.go:13-24):
# YY year · YD day-of-year · M month · D day · W weekday (Sunday=0) ·
# WK ISO week · HH hour · MI minute · S second · MS/US/NS fraction parts.

_PART_CODES = ("yy", "yd", "m", "d", "w", "wk", "hh", "mi", "s", "ms", "us", "ns")


def _part(fn: str, part: str) -> str:
    p = part.lower()
    if p not in _PART_CODES:
        raise ValueError(f"{fn}: invalid interval {part!r} (valid: {_PART_CODES})")
    return p


def _frac_micros(col) -> Column:
    """Microseconds within the current second (always non-negative)."""
    return F.pmod(F.unix_micros(_c(col)), F.lit(1_000_000)).cast("long")


def DATETIMEPART(part: str, col) -> Column:
    """DATETIMEPART('yy'|'yd'|'m'|'d'|'w'|'wk'|..., ts) → integer part
    (EvaluateDateTimePart inbuiltfunctionsdate.go:194-276; 'w' is Go
    Weekday, Sunday=0; 'wk' is ISO week; 'ms'/'us'/'ns' are the
    sub-second fraction)."""
    p = _part("DATETIMEPART", part)
    c = _c(col)
    exprs = {
        "yy": F.year(c),
        "yd": F.dayofyear(c),
        "m": F.month(c),
        "d": F.dayofmonth(c),
        "w": F.dayofweek(c) - 1,  # Spark Sunday=1 → Go Sunday=0
        "wk": F.weekofyear(c),  # ISO week, same as Go ISOWeek
        "hh": F.hour(c),
        "mi": F.minute(c),
        "s": F.floor(F.date_part(F.lit("second"), c)),
        "ms": F.floor(_frac_micros(col) / 1000),
        "us": _frac_micros(col),
        "ns": _frac_micros(col) * 1000,  # micro-precision store (×1000)
    }
    return exprs[p].cast("long")


def DATETIMENAME(part: str, col) -> Column:
    """DATETIMENAME — the part as a STRING; like Go's fmt.Sprint it yields
    the month/weekday NAME for 'm'/'w' and digit strings otherwise
    (EvaluateDateTimeName inbuiltfunctionsdate.go:399-477: Month() and
    Weekday() have String() methods)."""
    p = _part("DATETIMENAME", part)
    if p == "m":
        return F.date_format(_c(col), "MMMM")
    if p == "w":
        return F.date_format(_c(col), "EEEE")
    return DATETIMEPART(part, col).cast("string")


def DATE_TRUNC(part: str, col) -> Column:
    """DATE_TRUNC — a truncated timestamp STRING (EvaluateDateTrunc
    inbuiltfunctionsdate.go:564-642 returns Go time.Format text, e.g.
    'm' → '2012-11', 's' → '2012-11-01T22:08:41')."""
    p = _part("DATE_TRUNC", part)
    fmts = {
        "yy": "yyyy",
        "m": "yyyy-MM",
        "d": "yyyy-MM-dd",
        "hh": "yyyy-MM-dd'T'HH",
        "mi": "yyyy-MM-dd'T'HH:mm",
        "s": "yyyy-MM-dd'T'HH:mm:ss",
        "ms": "yyyy-MM-dd'T'HH:mm:ss.SSS",
        "us": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    }
    if p == "ns":  # micro-precision store: pad to 9 digits
        return F.concat(
            F.date_format(_c(col), fmts["us"]), F.lit("000")
        )
    if p not in fmts:
        raise ValueError(f"DATE_TRUNC: invalid interval {part!r}")
    return F.date_format(_c(col), fmts[p])


_ADD_UNITS = {
    "yy": "YEAR",
    "m": "MONTH",
    "d": "DAY",
    "hh": "HOUR",
    "mi": "MINUTE",
    "s": "SECOND",
    "ms": "MILLISECOND",
    "us": "MICROSECOND",
}


def DATETIMEADD(part: str, n, col) -> Column:
    """DATETIMEADD (EvaluateDatetimeAdd inbuiltfunctionsdate.go:478-563).
    Divergence note: Go AddDate normalizes month-end overflow
    (Feb 29 + 1 year → Mar 1) where Spark clamps (→ Feb 28); identical on
    all other inputs."""
    p = _part("DATETIMEADD", part)
    if p == "ns":
        return F.expr(
            f"timestampadd(MICROSECOND, {int(n) // 1000}, {_sql_ref(col)})"
        )
    if p not in _ADD_UNITS:
        raise ValueError(f"DATETIMEADD: invalid interval {part!r}")
    return F.expr(f"timestampadd({_ADD_UNITS[p]}, {int(n)}, {_sql_ref(col)})")


def DATETIMEDIFF(part: str, a, b) -> Column:
    """DATETIMEDIFF(unit, start, end) (EvaluateDatetimeDiff
    inbuiltfunctionsdate.go:643-715): 'yy'/'m' are CALENDAR differences
    (year(end)-year(start), months likewise); the rest are elapsed time
    truncated toward zero."""
    p = _part("DATETIMEDIFF", part)
    sa, sb = _c(a), _c(b)
    if p == "yy":
        return (F.year(sb) - F.year(sa)).cast("long")
    if p == "m":
        return (
            (F.year(sb) - F.year(sa)) * 12 + (F.month(sb) - F.month(sa))
        ).cast("long")
    # NTZ columns (the parquet loader's native type) take the repo-wide
    # UTC-pinned ltz view; plain TIMESTAMP passes through unchanged
    micros = F.unix_micros(sb.cast("timestamp_ltz")) - F.unix_micros(
        sa.cast("timestamp_ltz")
    )
    divisors = {
        "d": 86_400_000_000,
        "hh": 3_600_000_000,
        "mi": 60_000_000,
        "s": 1_000_000,
        "ms": 1_000,
        "us": 1,
    }
    if p == "ns":
        return (micros * 1000).cast("long")
    if p not in divisors:
        raise ValueError(f"DATETIMEDIFF: invalid interval {part!r}")
    # integer division truncating toward zero (Go int64(d/unit)): Spark's
    # % keeps the dividend's sign, so (x - x%d)/d is an exact multiple
    d = F.lit(divisors[p]).cast("long")
    return ((micros - micros % d) / d).cast("long")


def _sql_ref(x) -> str:
    if isinstance(x, str):
        return x
    raise TypeError("expected a column name (SQL expr limitation)")


def DATETIMEFROMPARTS(y, mo, d, h=0, mi=0, s=0, ms=0) -> Column:
    return F.make_timestamp(
        _lit(y), _lit(mo), _lit(d), _lit(h), _lit(mi), _lit(s) + _lit(ms) / 1000.0
    )


def TOTIMESTAMP(col, unit: str = "s") -> Column:
    """TOTIMESTAMP(int, 's'|'ms'|'us'|'µs'|'ns') — epoch int → timestamp
    (ValToTimestamp; unit list IsValidTimeUnit field.go:2551-2558;
    reference timestamp fields store BSI offsets, field.go:192-251)."""
    c = _c(col).cast("long")
    if unit == "s":
        return F.timestamp_seconds(c)
    if unit == "ms":
        return F.timestamp_millis(c)
    if unit in ("us", "µs"):
        return F.timestamp_micros(c)
    if unit == "ns":
        return F.timestamp_micros(F.floor(c / 1000).cast("long"))
    raise ValueError(f"unknown unit {unit}")


def RANGEQ(col, from_=None, to=None):
    """Time-quantum range filter (inbuiltfunctionsquantum.go:8-60): on our
    model a quantum column is array<struct<value,ts>>; RANGEQ returns the
    values whose ts falls in [from, to) — use with Index.time_col filters
    for the flat-table form."""
    c = _c(col)
    cond = lambda x: F.lit(True)  # noqa: E731
    if from_ is not None and to is not None:
        cond = lambda x: (x["ts"] >= F.lit(from_)) & (x["ts"] < F.lit(to))  # noqa: E731
    elif from_ is not None:
        cond = lambda x: x["ts"] >= F.lit(from_)  # noqa: E731
    elif to is not None:
        cond = lambda x: x["ts"] < F.lit(to)  # noqa: E731
    return F.transform(F.filter(c, cond), lambda x: x["value"])


#: FeatureBase name → wrapper, for dialect translation.
FB_FUNCTIONS: dict[str, Callable[..., Column]] = {
    name: obj
    for name, obj in list(globals().items())
    if name.isupper() and callable(obj)
}


def fb_function(name: str) -> Callable[..., Column]:
    """Resolve a FeatureBase function by (case-insensitive) name."""
    try:
        return FB_FUNCTIONS[name.upper()]
    except KeyError:
        raise KeyError(
            f"unknown FeatureBase function {name!r}; known: {sorted(FB_FUNCTIONS)}"
        ) from None
