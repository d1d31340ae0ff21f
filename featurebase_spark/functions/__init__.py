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


def SETCONTAINS(col, value) -> Column:
    """SETCONTAINS(set, v) — membership (one-bitmap-per-value Row in PQL)."""
    return F.array_contains(_c(col), value)


def SETCONTAINSALL(col, values) -> Column:
    """SETCONTAINSALL(set, set) — superset test (PQL Intersect of rows)."""
    return F.size(F.array_except(_lit(values), _c(col))) == 0


def SETCONTAINSANY(col, values) -> Column:
    """SETCONTAINSANY(set, set) — overlap test (PQL Union of rows)."""
    return F.arrays_overlap(_c(col), _lit(values))


# --- String functions (inbuiltfunctionsstring.go:257-860)


def REVERSE(col) -> Column:
    return F.reverse(_c(col))


def CHAR(col) -> Column:
    return F.char(_c(col))


def ASCII(col) -> Column:
    return F.ascii(_c(col))


def UPPER(col) -> Column:
    return F.upper(_c(col))


def LOWER(col) -> Column:
    return F.lower(_c(col))


def STRINGSPLIT(col, sep: str, idx: int = 0) -> Column:
    """STRINGSPLIT(s, sep, n) — n-th piece (0-based, like the reference)."""
    return F.split(_c(col), sep).getItem(idx)


def SUBSTRING(col, start: int, length: int | None = None) -> Column:
    """SUBSTRING(s, start[, len]) — reference is 0-based
    (inbuiltfunctionsstring.go), Spark 1-based: shift here."""
    if length is None:
        return F.substring(_c(col), start + 1, 2**31 - 1)
    return F.substring(_c(col), start + 1, length)


def REPLACEALL(col, search: str, repl: str) -> Column:
    return F.replace(_c(col), _lit(search), _lit(repl))


def TRIM(col) -> Column:
    return F.trim(_c(col))


def RTRIM(col) -> Column:
    return F.rtrim(_c(col))


def LTRIM(col) -> Column:
    return F.ltrim(_c(col))


def SUFFIX(col, suffix: str) -> Column:
    return F.endswith(_c(col), _lit(suffix))


def PREFIX(col, prefix: str) -> Column:
    return F.startswith(_c(col), _lit(prefix))


def SPACE(n) -> Column:
    return F.repeat(F.lit(" "), _lit(n) if not isinstance(n, int) else n)


def LEN(col) -> Column:
    return F.length(_c(col))


def REPLICATE(col, n: int) -> Column:
    return F.repeat(_c(col), n)


def FORMAT(fmt: str, *cols) -> Column:
    return F.format_string(fmt, *[_c(c) for c in cols])


def CHARINDEX(substr, col, start: int = 0) -> Column:
    """CHARINDEX(sub, s[, start]) — position of sub in s from `start`,
    0-based like the reference (-1 if absent); Spark locate is 1-based."""
    return F.locate(substr, _c(col), start + 1) - 1


def STR(col) -> Column:
    return _c(col).cast("string")


# --- Date/time functions (inbuiltfunctionsdate.go:26-720)

_DATE_PARTS = {
    "yy": "year", "year": "year",
    "q": "quarter", "quarter": "quarter",
    "m": "month", "month": "month",
    "d": "day", "day": "day",
    "w": "week", "week": "week",
    "hh": "hour", "hour": "hour",
    "mi": "minute", "minute": "minute",
    "s": "second", "second": "second",
    "ms": "millisecond", "millisecond": "millisecond",
    "ns": "nanosecond", "nanosecond": "nanosecond",
}


def DATETIMEPART(part: str, col) -> Column:
    """DATETIMEPART('yy'|'m'|'d'|..., ts) → integer part."""
    p = _DATE_PARTS[part.lower()]
    if p == "millisecond":
        return (F.date_part(F.lit("second"), _c(col)) * 1000).cast("long")
    if p == "nanosecond":
        return (F.date_part(F.lit("second"), _c(col)) * 1_000_000_000).cast("long")
    return F.date_part(F.lit(p), _c(col)).cast("long")


def DATETIMENAME(part: str, col) -> Column:
    """DATETIMENAME — month/day names etc. as strings."""
    p = _DATE_PARTS[part.lower()]
    fmt = {"month": "MMMM", "day": "d", "year": "yyyy"}.get(p)
    if fmt:
        return F.date_format(_c(col), fmt)
    return DATETIMEPART(part, col).cast("string")


def DATE_TRUNC(part: str, col) -> Column:
    return F.date_trunc(_DATE_PARTS[part.lower()], _c(col))


def DATETIMEADD(part: str, n, col) -> Column:
    unit = _DATE_PARTS[part.lower()].upper()
    return _c(col) + F.expr(f"INTERVAL {int(n)} {unit}")


def DATETIMEDIFF(part: str, a, b) -> Column:
    unit = _DATE_PARTS[part.lower()].upper()
    return F.expr(
        f"timestampdiff({unit}, {_sql_ref(a)}, {_sql_ref(b)})"
    )


def _sql_ref(x) -> str:
    if isinstance(x, str):
        return x
    raise TypeError("DATETIMEDIFF takes column names (SQL expr limitation)")


def DATETIMEFROMPARTS(y, mo, d, h=0, mi=0, s=0, ms=0) -> Column:
    return F.make_timestamp(
        _lit(y), _lit(mo), _lit(d), _lit(h), _lit(mi), _lit(s) + _lit(ms) / 1000.0
    )


def TOTIMESTAMP(col, unit: str = "s") -> Column:
    """TOTIMESTAMP(int, 's'|'ms'|'us'|'ns') — epoch int → timestamp
    (reference timestamp fields store BSI offsets, field.go:192-251)."""
    c = _c(col).cast("long")
    if unit == "s":
        return F.timestamp_seconds(c)
    if unit == "ms":
        return F.timestamp_millis(c)
    if unit == "us":
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
