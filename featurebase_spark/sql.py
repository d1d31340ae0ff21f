"""FeatureBase SQL dialect front door: run reference SQL text on Spark.

The reference's SQL dialect (``sql3/parser/parser.go``) differs from Spark
SQL in a few mechanical ways; :func:`translate` rewrites FeatureBase SQL
text into Spark SQL text, and :func:`fb_sql` executes it. Differences
covered (file:line cites into /root/reference):

- ``SELECT TOP(n) ...`` (parser.go:2376, compileselect.go:309-325)
  → trailing ``LIMIT n`` on the same (sub)query scope.
- Set literals ``['a', 'b']`` (expression.go:2439-2592)
  → ``array('a', 'b')``.
- Scalar functions (inbuiltfunctions{set,string,date}.go; SURVEY §2.3)
  → Spark built-ins, with the same arg order/base conventions as the
  Python wrappers in :mod:`featurebase_spark.functions` (0-based
  SUBSTRING/CHARINDEX/STRINGSPLIT, ``'yy'``-style date-part codes).
- CAST type names (astdatatype.go:10-26): ``ID``→``BIGINT``,
  ``IDSET``→``ARRAY<BIGINT>``, ``STRINGSET``→``ARRAY<STRING>``,
  ``DECIMAL(s)`` (scale-only, pql/decimal.go) → ``DECIMAL(38, s)``.

Everything else (SELECT/WHERE/GROUP BY/HAVING/ORDER BY/LIMIT, joins,
subqueries, CASE/CAST/BETWEEN/IN/LIKE, operators incl. ``||`` concat) is
already common SQL and passes through untouched — Catalyst parses it.

The translation is purely textual (token-level, paren-balanced); it never
needs a full SQL grammar because every dialect difference is local to a
call site or a literal.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["translate", "fb_sql", "fb_sql_plan"]


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<qid>"(?:[^"]|"")*")
    | (?P<num>\d+(?:\.\d*)?|\.\d+)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*(?:-[A-Za-z0-9_]+)*)
    | (?P<op><=|>=|!=|<>|\|\||<<|>>|.)
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokenize(sql: str) -> list[str]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:  # unreachable: the '.' alternative matches anything
            raise ValueError(f"cannot tokenize at {sql[pos:pos+20]!r}")
        tok = m.group(0)
        if tok != ";":  # single-statement front door; ; is noise
            out.append(tok)
        pos = m.end()
    return out


def _is_ws(tok: str) -> bool:
    return tok[:1].isspace()


def _emit_plain(tok: str) -> str:
    """Generic token emission: map '!' (bitwise complement in the
    dialect) to '~', and SQL-standard double-quoted identifiers
    (scanner.go scanQuotedIdent — e.g. ``as "yy"``) to Spark's
    backtick quoting."""
    if tok == "!":
        return "~"
    if tok[:1] == '"' and tok[-1:] == '"' and len(tok) >= 2:
        inner = tok[1:-1].replace('""', '"').replace("`", "``")
        return f"`{inner}`"
    return tok


#: keywords after which a hyphenated identifier is a TABLE reference
_TABLE_POS_KWS = {"FROM", "JOIN", "INTO", "TABLE", "UPDATE"}

#: keywords that END a FROM clause's table list — after one of these a
#: comma separates expressions (ORDER BY a, b), not table references
_FROM_LIST_ENDERS = {
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION",
    "INTERSECT", "EXCEPT", "SELECT", "SET", "VALUES",
}


def _emit_word(tok: str, table_pos: bool = False) -> str:
    """See :func:`_emit_word_ctx` — kept for arg-list emission where no
    token lookahead context exists."""
    return _emit_word_ctx(tok, table_pos=table_pos)


def _emit_word_ctx(
    tok: str, table_pos: bool = False, qualifier: bool = False
) -> str:
    """Emit one identifier/keyword token into Spark SQL. Hyphenated
    identifiers (legal in the reference — scanner.go:338-339 treats '-'
    as an identifier char, so ``un-keyed`` is ONE token, not subtraction)
    are position-sensitive: in table position they rewrite to the
    Spark-safe VIEW name (Spark rejects hyphens in view names); in
    expression position they are COLUMN references, which Spark accepts
    with backtick quoting (the physical DataFrame column keeps the
    hyphenated spelling). Subtraction still works when spaced (``a - b``)
    or against numeric literals (``a -1``), exactly as in the reference
    dialect. ``qualifier``: the identifier is immediately followed by
    '.', i.e. it QUALIFIES a column (``my-tbl.k``) — the reference has
    no struct fields, so a dotted hyphenated identifier is always a
    table reference and rewrites to the view name too."""
    if "-" in tok and (tok[:1].isalpha() or tok[:1] == "_"):
        if table_pos or qualifier:
            from featurebase_spark.schema import spark_view_name

            return spark_view_name(tok)
        return f"`{tok}`"
    return tok


def _strip_str_literal(arg: str) -> Optional[str]:
    arg = arg.strip()
    if len(arg) >= 2 and arg[0] == "'" and arg[-1] == "'":
        return arg[1:-1].replace("''", "'")
    return None


# --------------------------------------------------------------------------
# Function mappings — mirror featurebase_spark.functions semantics exactly
# --------------------------------------------------------------------------

#: Reference interval codes (inbuiltfunctionsdate.go:13-24).
_PART_CODES = ("yy", "yd", "m", "d", "w", "wk", "hh", "mi", "s", "ms", "us", "ns")


def _date_part(fn: str, arg: str, param: str = "interval") -> str:
    lit = _strip_str_literal(arg)
    if lit is None:
        # a non-literal part code can't drive the static SQL rewrite;
        # int literals already raised the analyzer type error upstream
        raise ValueError(
            f"{fn} part must be a string literal, got {arg!r}"
        )
    if lit.lower() not in _PART_CODES:
        # NewErrCallParameterValueInvalid (errors.go:752-756); the
        # part-code parameter is named 'interval' for datetimepart/
        # datetimename/date_trunc and 'timeunit' for datetimeadd/
        # datetimediff/totimestamp (inbuiltfunctionsdate.go:271,392,533)
        raise ValueError(f"invalid value '{lit}' for parameter '{param}'")
    return lit.lower()


_PART_SQL = {
    # EvaluateDateTimePart (inbuiltfunctionsdate.go:194-276); 'w' is Go
    # Weekday (Sunday=0), 'wk' ISO week, ms/us/ns = sub-second fraction
    "yy": "year({t})",
    "yd": "dayofyear({t})",
    "m": "month({t})",
    "d": "day({t})",
    "w": "(dayofweek({t}) - 1)",
    "wk": "weekofyear({t})",
    "hh": "hour({t})",
    "mi": "minute({t})",
    "s": "floor(date_part('second', {t}))",
    "ms": "floor(pmod(unix_micros({t}), 1000000) / 1000)",
    "us": "pmod(unix_micros({t}), 1000000)",
    "ns": "(pmod(unix_micros({t}), 1000000) * 1000)",
}


def _f_datetimepart(a: list[str]) -> str:
    p = _date_part("DATETIMEPART", a[0])
    return f"CAST({_PART_SQL[p].format(t=a[1])} AS BIGINT)"


def _f_datetimename(a: list[str]) -> str:
    # Go fmt.Sprint semantics: month/weekday NAMES, digit strings otherwise
    # (EvaluateDateTimeName inbuiltfunctionsdate.go:399-477)
    p = _date_part("DATETIMENAME", a[0])
    if p == "m":
        return f"date_format({a[1]}, 'MMMM')"
    if p == "w":
        return f"date_format({a[1]}, 'EEEE')"
    return f"CAST({_PART_SQL[p].format(t=a[1])} AS STRING)"


_TRUNC_FMTS = {
    # EvaluateDateTrunc returns formatted STRINGS (inbuiltfunctionsdate.go:
    # 564-642, Go time.Format layouts)
    "yy": "yyyy",
    "m": "yyyy-MM",
    "d": "yyyy-MM-dd",
    "hh": "yyyy-MM-dd'T'HH",
    "mi": "yyyy-MM-dd'T'HH:mm",
    "s": "yyyy-MM-dd'T'HH:mm:ss",
    "ms": "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "us": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def _f_date_trunc(a: list[str]) -> str:
    p = _date_part("DATE_TRUNC", a[0])
    if p == "ns":
        return f"concat(date_format({a[1]}, \"{_TRUNC_FMTS['us']}\"), '000')"
    if p not in _TRUNC_FMTS:
        raise ValueError(f"DATE_TRUNC invalid interval {a[0]}")
    return f'date_format({a[1]}, "{_TRUNC_FMTS[p]}")'


_ADD_UNITS = {
    "yy": "YEAR", "m": "MONTH", "d": "DAY", "hh": "HOUR",
    "mi": "MINUTE", "s": "SECOND", "ms": "MILLISECOND", "us": "MICROSECOND",
}


def _f_datetimeadd(a: list[str]) -> str:
    p = _date_part("DATETIMEADD", a[0], param="timeunit")
    if p == "ns":
        return f"timestampadd(MICROSECOND, CAST(({a[1]}) / 1000 AS BIGINT), {a[2]})"
    if p not in _ADD_UNITS:
        raise ValueError(
            f"invalid value '{_strip_str_literal(a[0])}' "
            f"for parameter 'timeunit'"
        )
    return f"timestampadd({_ADD_UNITS[p]}, {a[1]}, {a[2]})"


_DIFF_DIVISORS = {
    "d": 86_400_000_000, "hh": 3_600_000_000, "mi": 60_000_000,
    "s": 1_000_000, "ms": 1_000, "us": 1,
}


def _f_datetimediff(a: list[str]) -> str:
    # calendar diffs for yy/m, truncate-toward-zero elapsed otherwise
    # (EvaluateDatetimeDiff inbuiltfunctionsdate.go:643-715)
    p = _date_part("DATETIMEDIFF", a[0], param="timeunit")
    s, e = a[1], a[2]
    if p == "yy":
        return f"CAST(year({e}) - year({s}) AS BIGINT)"
    if p == "m":
        return f"CAST((year({e}) - year({s})) * 12 + (month({e}) - month({s})) AS BIGINT)"
    # NTZ columns (the parquet loader's native type) take the repo-wide
    # UTC-pinned ltz view; plain TIMESTAMP casts are no-ops
    micros = (
        f"(unix_micros(CAST({e} AS timestamp_ltz)) - "
        f"unix_micros(CAST({s} AS timestamp_ltz)))"
    )
    if p == "ns":
        return f"CAST({micros} * 1000 AS BIGINT)"
    if p not in _DIFF_DIVISORS:
        raise ValueError(
            f"invalid value '{_strip_str_literal(a[0])}' "
            f"for parameter 'timeunit'"
        )
    d = _DIFF_DIVISORS[p]
    return f"CAST(({micros} - {micros} % {d}) / {d} AS BIGINT)"


def _f_totimestamp(a: list[str]) -> str:
    unit = _strip_str_literal(a[1]) if len(a) > 1 else "s"
    fn = {"s": "timestamp_seconds", "ms": "timestamp_millis",
          "us": "timestamp_micros", "µs": "timestamp_micros"}.get(unit)
    if fn:
        return f"{fn}(CAST({a[0]} AS BIGINT))"
    if unit == "ns":
        return f"timestamp_micros(CAST(floor(CAST({a[0]} AS BIGINT) / 1000) AS BIGINT))"
    raise ValueError(f"invalid value '{unit}' for parameter 'timeunit'")


def _f_datetimefromparts(a: list[str]) -> str:
    a = a + ["0"] * (7 - len(a))
    sec = f"{a[5]} + {a[6]} / 1000.0"
    return f"make_timestamp({a[0]}, {a[1]}, {a[2]}, {a[3]}, {a[4]}, {sec})"


#: FeatureBase function name → (min_args, max_args, emitter(args) -> sql)
_FUNCS: dict[str, tuple[int, int, Callable[[list[str]], str]]] = {
    # set functions (inbuiltfunctionsset.go)
    # evaluator semantics (inbuiltfunctionsset.go): string-set members
    # compare with strings.EqualFold → case-folded match (exact for id
    # sets — int→string is injective so one folded comparison serves
    # both); NULL if either argument is NULL. The reference's PQL
    # pushdown path matches keys exactly — documented split, we follow
    # the evaluator that defines the scalar function.
    "SETCONTAINS": (2, 2, lambda a: _f_setcontains(a)),
    "SETCONTAINSALL": (2, 2, lambda a: _f_setcontains_all(a)),
    "SETCONTAINSANY": (2, 2, lambda a: _f_setcontains_any(a)),
    # string functions (inbuiltfunctionsstring.go:257-860)
    "REVERSE": (1, 1, lambda a: f"reverse({a[0]})"),
    "CHAR": (1, 1, lambda a: _f_char(a)),
    "ASCII": (1, 1, lambda a: _f_ascii(a)),
    "UPPER": (1, 1, lambda a: f"upper({a[0]})"),
    "LOWER": (1, 1, lambda a: f"lower({a[0]})"),
    "STRINGSPLIT": (2, 3, lambda a: _f_stringsplit(a)),
    "SUBSTRING": (2, 3, lambda a: _f_substring(a)),
    "REPLACEALL": (3, 3, lambda a: f"replace({a[0]}, {a[1]}, {a[2]})"),
    "TRIM": (1, 1, lambda a: f"trim({a[0]})"),
    "RTRIM": (1, 1, lambda a: f"rtrim({a[0]})"),
    "LTRIM": (1, 1, lambda a: f"ltrim({a[0]})"),
    "SUFFIX": (2, 2, lambda a: _f_prefix_suffix(a, last=True)),
    "PREFIX": (2, 2, lambda a: _f_prefix_suffix(a, last=False)),
    "SPACE": (1, 1, lambda a: f"repeat(' ', {a[0]})"),
    "LEN": (1, 1, lambda a: f"length({a[0]})"),
    "REPLICATE": (2, 2, lambda a: _f_replicate(a)),
    "FORMAT": (1, 99, lambda a: _f_format(a)),
    "CHARINDEX": (2, 3, lambda a: _f_charindex(a)),
    "STR": (1, 3, lambda a: _f_str(a)),
    # date functions (inbuiltfunctionsdate.go)
    "DATETIMEPART": (2, 2, _f_datetimepart),
    "DATETIMENAME": (2, 2, _f_datetimename),
    "DATE_TRUNC": (2, 2, _f_date_trunc),
    "DATETIMEADD": (3, 3, _f_datetimeadd),
    "DATETIMEDIFF": (3, 3, _f_datetimediff),
    # exactly 7 parts — the reference analyzer rejects partial calls
    # (inbuiltfunctionsdate.go:108-111; the pre-r10 3..7 optionality
    # was a parity bug)
    "DATETIMEFROMPARTS": (7, 7, _f_datetimefromparts),
    "TOTIMESTAMP": (1, 2, _f_totimestamp),
    # POPULATION variance at the reference's scale-6 decimal
    # (defs_aggregate.go:820-920: var(i1)=1.222222 over
    # [10,10,11,12,12,13] — Σ(x-μ)²/n, not the sample /(n-1))
    # (floor = the reference's truncate-toward-zero, valid since
    # variance is non-negative; a bare CAST would round HALF_UP —
    # 17.5/6 must be 2.916666, not 2.916667)
    "VAR": (1, 1, lambda a: (
        f"CAST(floor(var_pop({a[0]}) * 1000000) / 1000000 "
        f"AS DECIMAL(38, 6))")),
    # Pearson correlation at the reference's scale-6 decimal
    # (defs_aggregate.go:768-800: corr(i1,d1)=1.000000); the inner
    # BIGINT cast truncates TOWARD ZERO, matching pql.Decimal for the
    # negative-correlation side where floor would not
    "CORR": (2, 2, lambda a: (
        f"CAST(CAST(corr({a[0]}, {a[1]}) * 1000000 AS BIGINT) / 1000000 "
        f"AS DECIMAL(38, 6))")),
    # FALLBACK percentile emitter — only reached when the dtype-aware
    # _percentile_rewrite pass could not resolve the column (complex
    # scope the reference rejects outright, or a float/double column the
    # reference cannot hold): nearest-rank percentile_disc as a
    # documented EXTENSION. Reference-exact bisection semantics
    # (executor.go:1310-1603, incl. midpoints absent from the data —
    # defs_aggregate.go pins percentile(d1,50)=11.50) are emitted by
    # _percentile_fold_sql for int/decimal/timestamp columns. SUPERSET:
    # the reference rejects non-pushable filters and GROUP BY
    # ('Percentile call that can't be pushed down to PQL'); here both
    # compose.
    "PERCENTILE": (2, 2, lambda a: (
        f"percentile_disc(CAST({a[1]} AS DOUBLE) / 100) "
        f"WITHIN GROUP (ORDER BY {a[0]})")),
    # time-quantum range filter (inbuiltfunctionsquantum.go:8-60): BOOL,
    # exactly 3 args (from/to each nullable, not both), valid as a WHERE
    # pushdown — true iff any entry of the quantum column falls in [from, to)
    "RANGEQ": (3, 3, lambda a: _f_rangeq(a)),
}


def _rt_range_err(val_expr: str, cast_to: str = "STRING") -> str:
    """Runtime '[0:0] value '<v>' out of range' via raise_error — the
    reference raises these at Evaluate time (inbuiltfunctionsstring.go),
    so non-literal arguments must error at evaluation, not compile."""
    return (
        f"CAST(raise_error(concat('[0:0] value ''', "
        f"CAST(({val_expr}) AS STRING), ''' out of range')) AS {cast_to})"
    )


def _fold_sql(x: str) -> str:
    return f"lower(CAST({x} AS STRING))"


def _f_setcontains(a: list[str]) -> str:
    """Case-folded membership, NULL on NULL args (EvaluateSetContains,
    inbuiltfunctionsset.go:10-58 + stringSetContains:170-177 EqualFold)."""
    s, v = a[0], a[1]
    return (
        f"CASE WHEN ({s}) IS NULL OR ({v}) IS NULL THEN "
        f"CAST(NULL AS BOOLEAN) ELSE "
        f"exists({s}, x -> {_fold_sql('x')} = {_fold_sql(f'({v})')}) END"
    )


def _f_setcontains_all(a: list[str]) -> str:
    """Case-folded superset test (EvaluateSetContainsAll:113-165);
    vacuously true on an empty test set."""
    s, vs = a[0], a[1]
    return (
        f"CASE WHEN ({s}) IS NULL OR ({vs}) IS NULL THEN "
        f"CAST(NULL AS BOOLEAN) ELSE "
        f"forall({vs}, y -> exists({s}, x -> "
        f"{_fold_sql('x')} = {_fold_sql('y')})) END"
    )


def _f_setcontains_any(a: list[str]) -> str:
    """Case-folded overlap test (EvaluateSetContainsAny:60-111); false
    on an empty test set."""
    s, vs = a[0], a[1]
    return (
        f"CASE WHEN ({s}) IS NULL OR ({vs}) IS NULL THEN "
        f"CAST(NULL AS BOOLEAN) ELSE "
        f"exists({vs}, y -> exists({s}, x -> "
        f"{_fold_sql('x')} = {_fold_sql('y')})) END"
    )


def _f_char(a: list[str]) -> str:
    """CHAR(n): codepoint for n in [0, 255]; out of range raises
    (EvaluateChar:312-332 — Spark's char() would silently wrap mod 256)."""
    n = a[0]
    return (
        f"CASE WHEN ({n}) IS NOT NULL AND (({n}) < 0 OR ({n}) > 255) "
        f"THEN {_rt_range_err(n)} ELSE char({n}) END"
    )


def _f_ascii(a: list[str]) -> str:
    """ASCII(s): first codepoint, but the reference requires the BYTE
    length to be exactly 1 (EvaluateAscii:334-360, Go len()) — ascii of
    'ÿ' (2 UTF-8 bytes) or 'longer' errors where Spark would silently
    take the first char. Empty string: the reference returns Go ""
    (untyped quirk); here it stays Spark's 0 — documented divergence,
    not in the reference corpus."""
    s = a[0]
    return (
        f"CASE WHEN ({s}) IS NOT NULL AND octet_length({s}) > 1 THEN "
        f"CAST(raise_error(concat('[0:0] value ''', {s}, "
        f"''' should be of the length 1')) AS BIGINT) "
        f"ELSE ascii({s}) END"
    )


def _f_substring(a: list[str]) -> str:
    """0-based SUBSTRING with the reference's range contract
    (EvaluateSubstring:362-416): start must lie in [0, len); with a
    length, end = start + length must lie in [start, len] — violations
    raise with the OFFENDING BOUND in the message (start for the first
    rule, end for the second), unlike Spark's silent clamping. Checks
    and slicing are on Go BYTE length (``stringArgOne[a:b]`` — bytes),
    hence octet_length + encode/substring/decode; a slice splitting a
    multi-byte sequence decodes to U+FFFD where Go keeps raw bytes
    (ASCII — the whole corpus — is identical)."""
    s, i = a[0], a[1]
    start_bad = f"(({i}) < 0 OR ({i}) >= octet_length({s}))"

    def _slice(ln: str) -> str:
        return (
            f"decode(substring(encode({s}, 'UTF-8'), ({i}) + 1, {ln}), "
            f"'UTF-8')"
        )

    if len(a) > 2:
        ln = a[2]
        end = f"(({i}) + ({ln}))"
        return (
            f"CASE WHEN ({s}) IS NOT NULL AND {start_bad} "
            f"THEN {_rt_range_err(i)} "
            f"WHEN ({s}) IS NOT NULL AND ({ln}) IS NOT NULL AND "
            f"({end} < ({i}) OR {end} > octet_length({s})) "
            f"THEN {_rt_range_err(end)} "
            f"ELSE {_slice(ln)} END"
        )
    return (
        f"CASE WHEN ({s}) IS NOT NULL AND {start_bad} "
        f"THEN {_rt_range_err(i)} "
        f"ELSE {_slice('2147483647')} END"
    )


def _f_stringsplit(a: list[str]) -> str:
    """STRINGSPLIT(s, sep, pos=0): LITERAL separator split (Go
    strings.Split — the pre-r10 emit passed sep to Spark's regex
    split), pos <= 0 picks the first part, pos past the end returns ''
    (EvaluateStringSplit:456-505)."""
    s, sep = a[0], a[1]
    parts = f"split({s}, concat('\\\\Q', {sep}, '\\\\E'), -1)"
    if len(a) == 2:
        return f"element_at({parts}, 1)"
    pos = a[2]
    # NULL in ANY argument is NULL (EvaluateStringSplit:440-512) — the
    # leading guard matters because size(split(NULL)) is NULL, which
    # would otherwise fall through the position cases to the '' branch
    return (
        f"CASE WHEN ({s}) IS NULL OR ({sep}) IS NULL OR ({pos}) IS NULL "
        f"THEN CAST(NULL AS STRING) "
        f"WHEN ({pos}) <= 0 THEN element_at({parts}, 1) "
        f"WHEN ({pos}) < size({parts}) THEN "
        f"element_at({parts}, CAST(({pos}) AS INT) + 1) "
        f"ELSE '' END"
    )


def _f_replicate(a: list[str]) -> str:
    """REPLICATE(s, n): negative n raises (EvaluateReplicate:661-692 —
    Spark repeat() silently returns '')."""
    s, n = a[0], a[1]
    return (
        f"CASE WHEN ({n}) < 0 THEN {_rt_range_err(n)} "
        f"ELSE repeat({s}, {n}) END"
    )


def _f_charindex(a: list[str]) -> str:
    """0-based CHARINDEX; the 3-arg start position must lie in
    [0, len(s)) where len is the Go BYTE length — out of range raises,
    even start=0 on '' (EvaluateCharIndex:726-810; only the 2-arg form
    skips the check, because it never evaluates a pos argument)."""
    if len(a) == 2:
        return f"(locate({a[0]}, {a[1]}) - 1)"
    sub, s, pos = a[0], a[1], a[2]
    return (
        f"CASE WHEN ({s}) IS NOT NULL AND ({pos}) IS NOT NULL AND "
        f"(({pos}) < 0 OR ({pos}) >= octet_length({s})) "
        f"THEN {_rt_range_err(pos, 'BIGINT')} "
        f"ELSE (locate({sub}, {s}, ({pos}) + 1) - 1) END"
    )


def _f_format(a: list[str]) -> str:
    """FORMAT with Go verbs (EvaluateFormat): %t (Go boolean) maps to
    Java's %b when the format is a literal; %s/%d are shared."""
    fmt = a[0]
    k, v = _lit_kind(fmt)
    if k == "str":
        fmt = "'" + v.replace("%t", "%b").replace("'", "''") + "'"
    return f"format_string({', '.join([fmt] + a[1:])})"


def _f_str(a: list[str]) -> str:
    """STR(x, length=10, decimals=0): SQL-Server-style fixed-width
    right-justified numeric formatting; values wider than ``length``
    render as '*' * length (EvaluateStr:812-868 — the pre-r10 emit was
    a bare CAST, losing the width/decimals contract entirely). Go and
    Java printf agree on %w.df for the corpus values; half-to-even vs
    half-up rounding can differ on exact .5 midpoints (documented,
    absent from the corpus)."""
    x = a[0]
    w = a[1] if len(a) > 1 else "10"
    d = a[2] if len(a) > 2 else "0"
    fmt = (
        f"format_string(concat('%', CAST({w} AS STRING), '.', "
        f"CAST({d} AS STRING), 'f'), CAST({x} AS DOUBLE))"
    )
    return (
        f"CASE WHEN ({x}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN length({fmt}) > ({w}) THEN repeat('*', {w}) "
        f"ELSE {fmt} END"
    )


def _f_prefix_suffix(a: list[str], last: bool) -> str:
    """Reference PREFIX/SUFFIX semantics (inbuiltfunctionsstring.go:
    560-630, corrected in r10 — the pre-r10 mapping to startswith/
    endswith was WRONG): the first/last ``n`` characters of the string,
    NULL-propagating, with the runtime '[0:0] value ... out of range'
    error when n < 0 or n > len(s). The guard is a CASE over
    raise_error so non-literal arguments error at evaluation time
    exactly like the reference; literal arguments are caught at compile
    time by _fn_literal_guard with the same text. Range check and slice
    are on Go BYTE length (:585-589,617-621 — len()/[:n] are bytes), so
    octet_length guards and encode/substring/decode slices (ASCII
    identical; a multi-byte split decodes to U+FFFD vs Go's raw bytes)."""
    s, n = a[0], a[1]
    b = f"encode({s}, 'UTF-8')"
    if last:
        pick = (
            f"decode(substring({b}, octet_length({s}) - ({n}) + 1, {n}), "
            f"'UTF-8')"
        )
    else:
        pick = f"decode(substring({b}, 1, {n}), 'UTF-8')"
    return (
        f"CASE WHEN ({s}) IS NOT NULL AND "
        f"(({n}) < 0 OR ({n}) > octet_length({s})) THEN "
        f"CAST(raise_error(concat('[0:0] value ''', "
        f"CAST(({n}) AS STRING), ''' out of range')) AS STRING) "
        f"ELSE {pick} END"
    )


def _f_rangeq(a: list[str]) -> str:
    return (
        f"exists({a[0]}, x -> (({a[1]}) IS NULL OR x.ts >= ({a[1]}))"
        f" AND (({a[2]}) IS NULL OR x.ts < ({a[2]})))"
    )


#: per-argument expected type classes for the reference's string-family
#: analyzer errors (defs_string_functions.go corpus). Checked for
#: LITERAL arguments only — column-typed arguments are left to Catalyst
#: (same conservatism as the binop type guard); NULL literals pass
#: (typeIsVoid is accepted by every reference analyzer).
_FN_SIG: dict[str, list[str]] = {
    "REVERSE": ["str"],
    "UPPER": ["str"],
    "LOWER": ["str"],
    "TRIM": ["str"],
    "RTRIM": ["str"],
    "LTRIM": ["str"],
    "ASCII": ["str"],
    "CHAR": ["int"],
    "SPACE": ["int"],
    "LEN": ["str"],
    "REPLICATE": ["str", "int"],
    "REPLACEALL": ["str", "str", "str"],
    "PREFIX": ["str", "int"],
    "SUFFIX": ["str", "int"],
    "CHARINDEX": ["str", "str", "int"],
    "SUBSTRING": ["str", "int", "int"],
    "STRINGSPLIT": ["str", "str", "int"],
}


def _lit_kind(arg: str) -> tuple:
    """(kind, value) for a literal argument text: int / str / null /
    (None, None) for anything non-literal."""
    t = arg.strip()
    if re.fullmatch(r"-?\d+", t):
        return ("int", int(t))
    if (
        len(t) >= 2
        and t[0] == "'"
        and t[-1] == "'"
        and "'" not in t[1:-1].replace("''", "")
    ):
        return ("str", t[1:-1].replace("''", "'"))
    if t.upper() == "NULL":
        return ("null", None)
    return (None, None)


#: date-family per-argument type classes (NewErrParameterTypeMistmatch
#: phrasing, distinct from the string family's short texts)
_FN_SIG_DATE: dict[str, list] = {
    "DATETIMEPART": ["str"],
    "DATETIMENAME": ["str"],
    "DATE_TRUNC": ["str"],
    "DATETIMEADD": ["str", "int"],
    "DATETIMEDIFF": ["str"],
    "TOTIMESTAMP": ["int", "str"],
    "DATETIMEFROMPARTS": ["int"] * 7,
}

#: functions whose arity error reports a formal count other than the
#: minimum (the reference echoes the FULL signature width for the
#: optional-arg calls: totimestamp() says 'formal parameters (2)')
_ARITY_FORMAL = {"TOTIMESTAMP": 2}


def _fromparts_literal_check(lits: list) -> None:
    """isValidDateTimeParts (inbuiltfunctionsdate.go:308-352) replayed
    over all-literal DATETIMEFROMPARTS calls: echoes the FIRST offending
    part in '[0:0] not a valid datetimepart <v>' (year 0-9999, month
    1-12, day per month with the leap-year rule, h/m/s/ms ranges)."""
    if not all(k == "int" for k, _ in lits):
        return
    v = [x for _, x in lits]
    y, mo, d, h, mi, s, ms = v

    def bad(x):
        raise ValueError(f"[0:0] not a valid datetimepart {x}")

    if not 0 <= y <= 9999:
        bad(y)
    if not 1 <= mo <= 12:
        bad(mo)
    days = {1: 31, 3: 31, 5: 31, 7: 31, 8: 31, 10: 31, 12: 31,
            4: 30, 6: 30, 9: 30, 11: 30, 2: 29}[mo]
    if not 1 <= d <= days:
        bad(d)
    leap = y % 4 == 0 and y % 100 != 0 or y % 400 == 0
    if mo == 2 and d == 29 and not leap:
        bad(d)
    if not 0 <= h <= 23:
        bad(h)
    if not 0 <= mi <= 59:
        bad(mi)
    if not 0 <= s <= 59:
        bad(s)
    if not 0 <= ms <= 999:
        bad(ms)


def _fn_check(name_tok: str, up: str, args: list[str]) -> None:
    """Arity (reference phrasing, original-case name) + literal
    type/range errors for one rewritten function call."""
    lo, hi, _ = _FUNCS[up]
    if not (lo <= len(args) <= hi):
        formal = _ARITY_FORMAL.get(up, lo)
        raise ValueError(
            f"'{name_tok}': count of formal parameters ({formal}) does "
            f"not match count of actual parameters ({len(args)})"
        )
    lits = [_lit_kind(a) for a in args]
    sig = _FN_SIG.get(up, [])
    for (kind, _v), want in zip(lits, sig):
        if kind == "int" and want == "str":
            raise ValueError("string expression expected")
        if kind == "str" and want == "int":
            raise ValueError("integer expression expected")
    # literal value-range errors (runtime errors in the reference —
    # raised at compile time here when the values are already known;
    # non-literal arguments get the same texts from the raise_error
    # guards the emitters plant)
    if up == "CHAR" and lits[0][0] == "int" and not (0 <= lits[0][1] <= 255):
        raise ValueError(f"[0:0] value '{lits[0][1]}' out of range")
    if up == "ASCII" and lits[0][0] == "str":
        # > 1, not != 1: EvaluateAscii returns "" for the EMPTY string
        # (inbuiltfunctionsstring.go:350-352 — the empty-string early
        # return precedes the len != 1 error), so only multi-byte
        # literals are compile errors, matching the runtime guard
        if len(lits[0][1].encode("utf-8")) > 1:
            raise ValueError(
                f"[0:0] value '{lits[0][1]}' should be of the length 1"
            )
    if up == "SUBSTRING" and lits[0][0] != "null":
        if lits[1][0] == "int" and lits[1][1] < 0:
            raise ValueError(f"[0:0] value '{lits[1][1]}' out of range")
    if up in ("PREFIX", "SUFFIX") and lits[0][0] != "null":
        k, v = lits[1]
        if k == "int":
            if v < 0 or (lits[0][0] == "str" and v > len(lits[0][1])):
                raise ValueError(f"[0:0] value '{v}' out of range")
    # date family: the analyzer's type errors name BOTH types
    # (NewErrParameterTypeMistmatch — defs_date_functions.go corpus)
    sig_date = _FN_SIG_DATE.get(up, [])
    for (kind, _v), want in zip(lits, sig_date):
        if kind in ("int", "str") and want in ("int", "str") and kind != want:
            a_name = {"int": "int", "str": "string"}[kind]
            w_name = {"int": "int", "str": "string"}[want]
            raise ValueError(
                f"an expression of type '{a_name}' cannot be passed to "
                f"a parameter of type '{w_name}'"
            )
    if up == "DATETIMEFROMPARTS":
        _fromparts_literal_check(lits)
    # STR(x, length?, decimals?) / FORMAT(fmt, args...): the analyzer
    # rejects NULL literals in the optional/variadic positions
    # (analyseFunctionStr / analyseFunctionFormat — 'null literal not
    # allowed'); STR's width/decimals must be integers
    if up in ("STR", "FORMAT"):
        for kind, _v in lits[1:]:
            if kind == "null":
                raise ValueError("[0:0] null literal not allowed")
        if up == "STR":
            for kind, _v in lits[1:]:
                if kind == "str":
                    raise ValueError("integer expression expected")

#: FeatureBase CAST target types (astdatatype.go:10-26) → Spark SQL types.
_CAST_TYPES = {
    "BOOL": "BOOLEAN",
    "ID": "BIGINT",
    "INT": "BIGINT",
    "STRING": "STRING",
    "TIMESTAMP": "TIMESTAMP",
    "IDSET": "ARRAY<BIGINT>",
    "STRINGSET": "ARRAY<STRING>",
}

_CAST_TAIL_RE = re.compile(
    r"(?is)\bAS\s+([A-Za-z_][A-Za-z0-9_]*)(\s*\(\s*(\d+)\s*\))?\s*$"
)


def _rewrite_cast(inner: str) -> str:
    """Map the FeatureBase type name in a rewritten ``CAST(expr AS T)``
    body. Only called for the trailing ``AS <type>`` of a CAST — ordinary
    ``AS alias`` clauses elsewhere are never touched."""
    m = _CAST_TAIL_RE.search(inner)
    if m is None:
        return inner
    name = m.group(1).upper()
    if name == "DECIMAL":
        # reference DECIMAL takes scale only (pql/decimal.go scaled-int64)
        scale = m.group(3) or "0"
        return inner[: m.start()] + f"AS DECIMAL(38, {scale})"
    if name in _CAST_TYPES:
        return inner[: m.start()] + f"AS {_CAST_TYPES[name]}"
    return inner


# --------------------------------------------------------------------------
# Rewriter
# --------------------------------------------------------------------------


#: words before '()' that mean "empty expression group", not a zero-arg
#: function call — these keep the reference's `where ()` compile error
_EMPTY_PAREN_RESERVED = {
    "WHERE", "AND", "OR", "NOT", "ON", "WHEN", "THEN", "ELSE", "SELECT",
    "HAVING", "BY", "IN", "EXISTS", "ALL", "ANY", "SOME", "CASE", "FROM",
    "JOIN", "AS", "BETWEEN", "LIKE", "IS", "UNION", "EXCEPT", "INTERSECT",
    "DISTINCT", "LIMIT", "OFFSET", "VALUES",
}


class _Rewriter:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        # current clause keyword across nested paren scopes (RANGEQ is
        # WHERE-only; parens inside WHERE must not reset the context)
        self._clause = "select"

    def _peek_word(self, j: int) -> Optional[str]:
        """Next non-ws token at or after j, if it exists."""
        while j < len(self.toks) and _is_ws(self.toks[j]):
            j += 1
        return self.toks[j] if j < len(self.toks) else None

    def _prev_word(self, j: int) -> Optional[str]:
        """Previous non-ws token at or before j, if it exists."""
        while j >= 0 and _is_ws(self.toks[j]):
            j -= 1
        return self.toks[j] if j >= 0 else None

    def scope(self, stop: Optional[str]) -> str:
        """Rewrite one query scope (whole statement or a (...) group).

        Consumes up to but NOT including the ``stop`` token. Handles
        TOP(n) → deferred LIMIT for this scope.
        """
        out: list[str] = []
        top_limit: Optional[str] = None
        saw_top_expr = False  # TOP or TOPN present (stmt.TopExpr)
        saw_explicit_limit = False
        in_from_list = False  # inside FROM's table list (through JOIN/ON)
        while self.i < len(self.toks):
            tok = self.toks[self.i]
            if stop is not None and tok == stop:
                break
            if tok == "(":
                prevw = self._prev_word(self.i - 1)
                self.i += 1
                # save/restore the clause context: a projection-embedded
                # subquery containing WHERE must not leave _clause stuck
                # at 'where' for the rest of the OUTER scope (a RANGEQ in
                # the outer projection would then escape the reference's
                # "calling ranqeq() usage invalid" error)
                saved_clause = self._clause
                inner = self.scope(")")
                self._clause = saved_clause
                self.i += 1  # consume ')'
                if not inner.strip():
                    # `where ()` is a compile error in the reference
                    # (defs_sql1.go:434-437); a zero-arg FUNCTION call
                    # (ROW_NUMBER() OVER ... — the window extension) is
                    # not: allow empty parens iff glued to an identifier
                    # that isn't a reserved word
                    is_call = bool(
                        prevw
                        and _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", prevw)
                        and prevw.upper() not in _EMPTY_PAREN_RESERVED
                    )
                    if not is_call:
                        raise ValueError("expected expression, found ')'")
                    out.append("()")
                    continue
                out.append(f"({inner})")
                continue
            if tok == "[":
                self.i += 1
                args = self.args_until("]")
                out.append(f"array({', '.join(args)})")
                continue
            if tok[:1].isalpha() or tok[:1] == "_":
                up = tok.upper()
                nxt = self._peek_word(self.i + 1)
                if up in ("TOP", "TOPN") and nxt == "(":
                    self.i += 1
                    while _is_ws(self.toks[self.i]):
                        self.i += 1
                    self.i += 1  # consume '('
                    n_args = self.args_until(")")
                    if len(n_args) != 1:
                        raise ValueError("TOP(n) takes one argument")
                    # analyzer parity (compileselect.go:672-681): the
                    # top expression must be an INTEGER literal
                    if not _re.fullmatch(r"\s*\d+\s*", n_args[0]):
                        raise ValueError("integer literal expected")
                    saw_top_expr = True
                    # TOPN parses into stmt.TopN (parser.go:2389-2400)
                    # but the planner only inserts PlanOpTop for
                    # stmt.Top (compileselect.go:309-315) — TOPN is a
                    # validated NO-OP: all rows come back
                    # (sql_complex_test.go:2755 SelectTopNStar expects
                    # 3 rows from `select topn(1) *`)
                    if up == "TOP":
                        top_limit = n_args[0]
                    # swallow one trailing space so SELECT TOP(5) x
                    # doesn't become SELECT  x
                    if self.i < len(self.toks) and _is_ws(self.toks[self.i]):
                        self.i += 1
                    continue
                if up in ("SELECT", "WHERE", "GROUP", "ORDER", "HAVING"):
                    self._clause = up.lower()
                if up in _FUNCS and nxt == "(":
                    self.i += 1
                    while _is_ws(self.toks[self.i]):
                        self.i += 1
                    self.i += 1  # consume '('
                    args = self.args_until(")")
                    lo, hi, emit = _FUNCS[up]
                    # arity with the analyzer's phrasing (name as
                    # written — 'PREFIX' vs 'upper' follow the query
                    # text in the reference corpus) + literal
                    # type/range errors
                    _fn_check(tok, up, args)
                    if up == "RANGEQ":
                        if self._clause != "where":
                            # a WHERE-pushdown filter only — invalid in a
                            # projection/order/having position
                            raise ValueError("calling ranqeq() usage invalid")
                        if (
                            args[1].strip().upper() == "NULL"
                            and args[2].strip().upper() == "NULL"
                        ):
                            raise ValueError(
                                "calling ranqeq() 'from' and 'to' "
                                "parameters cannot both be null"
                            )
                    out.append(emit(args))
                    continue
                if up == "CAST" and nxt == "(":
                    self.i += 1
                    while _is_ws(self.toks[self.i]):
                        self.i += 1
                    self.i += 1  # consume '('
                    inner = self.scope(")")
                    self.i += 1  # consume ')'
                    out.append(f"CAST({_rewrite_cast(inner)})")
                    continue
                if up == "LIMIT":
                    saw_explicit_limit = True
                if up == "FROM":
                    in_from_list = True
                elif up in _FROM_LIST_ENDERS:
                    in_from_list = False
                prev = self._prev_word(self.i - 1)
                # table position: right after FROM/JOIN/INTO/..., or
                # after a ',' while still inside the FROM table list
                # (`FROM a, my-tbl` — the reference dialect accepts the
                # hyphenated name there too, scanner.go:338-339)
                out.append(_emit_word_ctx(
                    tok,
                    table_pos=prev is not None
                    and (prev.upper() in _TABLE_POS_KWS
                         or (in_from_list and prev == ",")),
                    qualifier=nxt == ".",
                ))
                self.i += 1
                continue
            # unary '!' is BITWISE complement in the reference dialect
            # (defs_unops.go: !10 = -11; on bool it errors) — Spark's '!'
            # is logical NOT, so map to '~'. '!=' is a single token and
            # never reaches here.
            out.append(_emit_plain(tok))
            self.i += 1
        text = "".join(out)
        # analyzer parity (compileselect.go:668-670): TOP/TOPN and
        # LIMIT in the same SELECT scope is a compile error — message
        # reproduced verbatim, doubled "cannot" included
        if saw_top_expr and saw_explicit_limit:
            raise ValueError(
                "TOP and LIMIT cannot cannot be used at the same time "
                "(TOP will be deprecated in a future release)"
            )
        if top_limit is not None:
            text = text.rstrip()
            text += f" LIMIT {top_limit}"
        return text

    def args_until(self, closer: str) -> list[str]:
        """Rewrite a comma-separated arg list, consuming the closer."""
        args: list[str] = []
        cur: list[str] = []
        while self.i < len(self.toks):
            tok = self.toks[self.i]
            if tok == closer:
                self.i += 1
                break
            if tok == ",":
                args.append("".join(cur).strip())
                cur = []
                self.i += 1
                continue
            if tok == "(":
                self.i += 1
                cur.append(f"({self.scope(')')})")
                self.i += 1
                continue
            if tok == "[":
                self.i += 1
                inner = self.args_until("]")
                cur.append(f"array({', '.join(inner)})")
                continue
            if (tok[:1].isalpha() or tok[:1] == "_"):
                up = tok.upper()
                if up in _FUNCS and self._peek_word(self.i + 1) == "(":
                    self.i += 1
                    while _is_ws(self.toks[self.i]):
                        self.i += 1
                    self.i += 1
                    inner_args = self.args_until(")")
                    lo, hi, emit = _FUNCS[up]
                    _fn_check(tok, up, inner_args)
                    cur.append(emit(inner_args))
                    continue
                if up == "CAST" and self._peek_word(self.i + 1) == "(":
                    self.i += 1
                    while _is_ws(self.toks[self.i]):
                        self.i += 1
                    self.i += 1
                    inner = self.scope(")")
                    self.i += 1
                    cur.append(f"CAST({_rewrite_cast(inner)})")
                    continue
            cur.append(_emit_plain(tok) if not (
                tok[:1].isalpha() or tok[:1] == "_") else _emit_word_ctx(
                    tok, qualifier=self._peek_word(self.i + 1) == "."))
            self.i += 1
        tail = "".join(cur).strip()
        if tail:
            args.append(tail)
        return args


import re as _re


#: aggregate calls whose argument analysis the reference runs at compile
#: time (defs_aggregate.go) — token-level rules only; type-dependent
#: rules (avg over a string column) stay with Catalyst
_AGG_CHECKED = (
    "COUNT", "SUM", "AVG", "MIN", "MAX", "PERCENTILE", "VAR", "CORR",
)


def _check_count_args(toks: list[str]) -> None:
    """Mirror the reference's aggregate argument analysis
    (defs_aggregate.go): COUNT/SUM/AVG/MIN/MAX take exactly one
    argument; ``*`` is valid only for COUNT; ``_id`` is rejected for
    every aggregate but COUNT; COUNT's argument must be ``*`` or a
    column reference (COUNT(1) errors — SUM(1)/MIN(1) are legal value
    cases); PERCENTILE takes (column, literal). Exact reference error
    texts. Runs on the TOKEN stream, so a COUNT(1)-shaped substring
    inside a string literal (one ``str`` token) can never trip it."""
    i, n = 0, len(toks)
    while i < n:
        tok = toks[i]
        up = tok.upper() if (tok[:1].isalpha() or tok[:1] == "_") else ""
        if up in _AGG_CHECKED:
            j = i + 1
            while j < n and _is_ws(toks[j]):
                j += 1
            if j < n and toks[j] == "(":
                depth, j = 1, j + 1
                args: list[list[str]] = [[]]
                while j < n and depth:
                    t = toks[j]
                    if t == "(":
                        depth += 1
                    elif t == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    elif t == "," and depth == 1:
                        args.append([])
                        j += 1
                        continue
                    args[-1].append(t)
                    j += 1
                flat = [
                    "".join(t for t in a if not _is_ws(t)).strip()
                    for a in args
                ]
                if up == "PERCENTILE":
                    _check_percentile_args(tok, flat)
                elif up == "CORR":
                    # corr takes TWO columns (defs_aggregate.go:760-800):
                    # '*' stops the reference's parser at the comma
                    if flat and flat[0] == "*":
                        raise ValueError("expected right paren, found ','")
                    if len(flat) != 2:
                        raise ValueError(
                            f"count of formal parameters (2) does not "
                            f"match count of actual parameters "
                            f"({len(flat)})"
                        )
                    for arg in flat:
                        if arg.lower() == "_id":
                            raise ValueError(
                                f"_id column cannot be used in aggregate "
                                f"function '{tok.lower()}'"
                            )
                else:
                    if len(flat) > 1:
                        raise ValueError(
                            f"count of formal parameters (1) does not "
                            f"match count of actual parameters "
                            f"({len(flat)})"
                        )
                    arg = flat[0]
                    if up == "COUNT":
                        if _re.fullmatch(r"\d+(\.\d+)?", arg):
                            raise ValueError("column reference expected")
                    else:
                        if arg == "*":
                            raise ValueError("column reference expected")
                        if arg.lower() == "_id":
                            raise ValueError(
                                f"_id column cannot be used in aggregate "
                                f"function '{tok.lower()}'"
                            )
                i = j
        i += 1


def _check_percentile_args(name_tok: str, flat: list[str]) -> None:
    """PERCENTILE(column, nth-literal) analysis (defs_aggregate.go:
    467-501): ``*`` / numeric first arg → 'column reference expected';
    ``_id`` rejected; the nth argument must be a LITERAL."""
    if flat and (flat[0] == "*" or _re.fullmatch(r"-?\d+(\.\d+)?", flat[0])):
        raise ValueError("column reference expected")
    if flat and flat[0].lower() == "_id":
        raise ValueError(
            f"_id column cannot be used in aggregate function "
            f"'{name_tok.lower()}'"
        )
    if len(flat) == 2:
        nth = flat[1]
        is_lit = bool(
            _re.fullmatch(r"-?\d+(\.\d+)?", nth)
            or (nth[:1] == "'" and nth[-1:] == "'")
        )
        if not is_lit:
            raise ValueError("literal expression expected")


def translate(sql: str) -> str:
    """FeatureBase SQL text → Spark SQL text."""
    toks = _tokenize(sql)
    _check_count_args(toks)
    rw = _Rewriter(toks)
    return rw.scope(None).strip().rstrip(";")


# --------------------------------------------------------------------------
# Table-valued functions — DECLARED EXTENSION beyond reference parity.
# The reference's TVF scaffolding is disabled (optablevaluedfunction.go:
# 45-47 returns 'tvf not supported'); these give the pipeline operators a
# SQL front door: FROM fb_sessionize(...) / fb_sessions(...) /
# fb_dedup_survivors(...). Documented as extensions in COVERAGE.md.
# --------------------------------------------------------------------------

#: TVF name → (arity, signature shown in errors)
_TVFS: dict[str, tuple[int, str]] = {
    "FB_SESSIONIZE": (4, "(table, user_col, ts_col, gap_minutes)"),
    "FB_SESSIONS": (4, "(table, user_col, ts_col, gap_minutes)"),
    "FB_DEDUP_SURVIVORS": (3, "(table, text_col, id_col)"),
    # deterministic-sampling family (pipeline/sampling.py): split uses
    # binary-exact 3/4-1/8-1/8 train/val/test weights; sample takes the
    # rate as a decimal literal
    "FB_HASH_SPLIT": (3, "(table, id_col, seed)"),
    "FB_HASH_SAMPLE": (4, "(table, id_col, rate, seed)"),
    "FB_DECONTAMINATE": (5, "(table, bench_table, text_col, id_col, ngram)"),
    # exact corpus heavy hitters (pipeline/frequent.py): threshold is
    # share_permille of the total token count, integer-exact
    "FB_HEAVY_HITTERS": (3, "(table, text_col, share_permille)"),
    # group-wise top-k (map-side WindowGroupLimit pruning)
    "FB_TOPK_PER_GROUP": (4, "(table, part_col, order_col, k)"),
    # bloom-pruned exact blocklist filtering (pipeline/blocklist.py)
    "FB_BLOCKLIST_FILTER": (3, "(table, blocklist_table, key_col)"),
    # behavioral tier (pipeline/sessions.py, operators/asof.py): ordered
    # funnel (steps as a quoted CSV literal, horizon 0 = unbounded),
    # weekly retention triangle, and the backward point-in-time join
    "FB_FUNNEL": (
        6, "(table, user_col, type_col, ts_col, steps, horizon_minutes)"
    ),
    "FB_RETENTION": (3, "(table, user_col, ts_col)"),
    "FB_ASOF_JOIN": (5, "(table, right_table, on_col, left_ts, right_ts)"),
    # trigram-accelerated substring search (pipeline/trigram.py): the
    # pattern is a quoted string; a plain literal runs the skip-through
    # probe (like_contains), a pattern with %/_ wildcards routes through
    # the like_match pattern planner (longest-fragment prune + verify)
    "FB_LIKE_SEARCH": (4, "(table, id_col, text_col, literal)"),
    # first-order event-transition matrix (pipeline/sessions.py)
    "FB_TRANSITIONS": (5, "(table, user_col, type_col, ts_col, id_col)"),
    # Ed-Join edit-distance similarity join (pipeline/fuzzy.py)
    "FB_FUZZY_JOIN": (4, "(table, id_col, text_col, max_dist)"),
    # mergeable HLL distinct sketch summary (pipeline/sketches.py)
    "FB_HLL": (3, "(table, key_col, b)"),
    # integer-rank keyword search (pipeline/text.keyword_topk)
    "FB_KEYWORD_SEARCH": (5, "(table, id_col, text_col, terms, k)"),
    # integer-exact BM25 ranking (pipeline/ranking.bm25_topk)
    "FB_BM25": (5, "(table, id_col, text_col, terms, k)"),
    # cross-source n-gram overlap matrix (pipeline/contamination)
    "FB_SOURCE_OVERLAP": (5, "(table, text_col, source_col, ngram, top)"),
    # Count-Min frequency verification shape (pipeline/sketches.py):
    # top-k keys by exact count with their min-cell CMS estimates
    "FB_CMS": (5, "(table, key_col, d, w, k)"),
    # integer-PMI collocations (pipeline/frequent.collocations_pmi_topk)
    "FB_PMI": (4, "(table, text_col, min_count, k)"),
    # cross-user concurrent-session pairs via the bucketed
    # interval-overlap join (operators/intervals.py)
    "FB_SESSION_OVERLAP": (4, "(table, user_col, ts_col, gap_minutes)"),
    # winnowing containment pairs (pipeline/dedup, MOSS sketch)
    "FB_WINNOW": (4, "(table, text_col, id_col, min_shared)"),
    # near-dup pairs closed into components (pipeline/graph): the
    # transitive closure that turns pairwise ~ into dedup clusters
    "FB_DEDUP_COMPONENTS": (4, "(table, text_col, id_col, min_shared)"),
}

_TVF_GUARD = _re.compile(
    r"\b(fb_sessionize|fb_sessions|fb_dedup_survivors|fb_hash_split"
    r"|fb_hash_sample|fb_decontaminate|fb_heavy_hitters"
    r"|fb_topk_per_group|fb_blocklist_filter"
    r"|fb_funnel|fb_retention|fb_asof_join"
    r"|fb_like_search|fb_transitions|fb_fuzzy_join|fb_hll"
    r"|fb_keyword_search|fb_source_overlap|fb_bm25"
    r"|fb_cms|fb_pmi|fb_session_overlap|fb_winnow"
    r"|fb_dedup_components)\b",
    _re.IGNORECASE,
)


def _eval_tvf(spark: SparkSession, name: str, args: list[str], idx: int) -> str:
    """Materialize one TVF call as a temp view; returns the view name.
    Arity/argument errors mirror the reference's compile-error phrasing
    (sql3/errors.go: parameter-count / column-not-found)."""
    arity, sig = _TVFS[name]
    low = name.lower()
    if len(args) != arity:
        raise ValueError(
            f"{low}: count of formal parameters ({arity}) does not match "
            f"count of actual parameters ({len(args)}); expected {low}{sig}"
        )
    table = args[0]
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(f"{low}: table name expected, got {table!r}")
    df = spark.table(table)
    cols = set(df.columns)

    def need_col(c: str, role: str):
        if c not in cols:
            raise ValueError(
                f"{low}: column '{c}' not found in {table} ({role})"
            )

    if name in ("FB_SESSIONIZE", "FB_SESSIONS"):
        from featurebase_spark.pipeline import sessions

        user, ts, gap = args[1], args[2], args[3]
        need_col(user, "user_col")
        need_col(ts, "ts_col")
        if not _re.fullmatch(r"\d+", gap):
            raise ValueError(
                f"{low}: integer literal expected for gap_minutes, got {gap!r}"
            )
        fn = (
            sessions.sessionize
            if name == "FB_SESSIONIZE"
            else sessions.session_stats
        )
        out = fn(df, user, ts, int(gap))
    elif name == "FB_HASH_SPLIT":
        from featurebase_spark.pipeline import sampling

        id_col, seed = args[1], args[2]
        need_col(id_col, "id_col")
        if not _re.fullmatch(r"\d+", seed):
            raise ValueError(
                f"{low}: integer literal expected for seed, got {seed!r}"
            )
        out = sampling.hash_split(
            df, id_col,
            {"train": 0.75, "val": 0.125, "test": 0.125}, int(seed),
        )
    elif name == "FB_HASH_SAMPLE":
        from featurebase_spark.pipeline import sampling

        id_col, rate, seed = args[1], args[2], args[3]
        need_col(id_col, "id_col")
        if not _re.fullmatch(r"\d*\.?\d+", rate):
            raise ValueError(
                f"{low}: numeric literal expected for rate, got {rate!r}"
            )
        if not _re.fullmatch(r"\d+", seed):
            raise ValueError(
                f"{low}: integer literal expected for seed, got {seed!r}"
            )
        out = sampling.hash_sample(df, id_col, float(rate), int(seed))
    elif name == "FB_DECONTAMINATE":
        from featurebase_spark.pipeline import contamination

        bench_tbl, text_col, id_col, ng = args[1], args[2], args[3], args[4]
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", bench_tbl):
            raise ValueError(
                f"{low}: table name expected, got {bench_tbl!r}"
            )
        bench = spark.table(bench_tbl)
        need_col(text_col, "text_col")
        need_col(id_col, "id_col")
        if not _re.fullmatch(r"\d+", ng):
            raise ValueError(
                f"{low}: integer literal expected for ngram, got {ng!r}"
            )
        out = contamination.decontaminate(df, bench, text_col, id_col, int(ng))
    elif name == "FB_HEAVY_HITTERS":
        from featurebase_spark.pipeline import frequent

        text_col, permille = args[1], args[2]
        need_col(text_col, "text_col")
        if not _re.fullmatch(r"\d+", permille):
            raise ValueError(
                f"{low}: integer literal expected for share_permille, "
                f"got {permille!r}"
            )
        out = frequent.heavy_hitter_tokens(
            df, text_col, share_permille=int(permille)
        )
    elif name == "FB_TOPK_PER_GROUP":
        from featurebase_spark.pipeline import sampling

        part_c, order_c, kk = args[1], args[2], args[3]
        need_col(part_c, "part_col")
        need_col(order_c, "order_col")
        if not _re.fullmatch(r"\d+", kk):
            raise ValueError(
                f"{low}: integer literal expected for k, got {kk!r}"
            )
        out = sampling.topk_per_group(df, part_c, order_c, int(kk))
    elif name == "FB_BLOCKLIST_FILTER":
        from featurebase_spark.pipeline import blocklist as _bl

        bl_tbl, key_c = args[1], args[2]
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", bl_tbl):
            raise ValueError(f"{low}: table name expected, got {bl_tbl!r}")
        bl = spark.table(bl_tbl)
        need_col(key_c, "key_col")
        if key_c not in bl.columns:
            raise ValueError(
                f"{low}: column '{key_c}' not found in {bl_tbl} (key_col)"
            )
        out = _bl.blocklist_filter(df, bl, key_c)
    elif name == "FB_FUNNEL":
        from featurebase_spark.pipeline import sessions

        user, typ, ts, steps, horizon = args[1], args[2], args[3], args[4], args[5]
        need_col(user, "user_col")
        need_col(typ, "type_col")
        need_col(ts, "ts_col")
        m = _re.fullmatch(r"'((?:[^']|'')*)'", steps)
        if not m:
            raise ValueError(
                f"{low}: string literal expected for steps (a CSV of "
                f"event types), got {steps!r}"
            )
        step_list = [s.strip() for s in m.group(1).replace("''", "'").split(",") if s.strip()]
        if len(step_list) < 2:
            raise ValueError(
                f"{low}: steps must name at least two event types, "
                f"got {steps!r}"
            )
        if not _re.fullmatch(r"\d+", horizon):
            raise ValueError(
                f"{low}: integer literal expected for horizon_minutes "
                f"(0 = unbounded), got {horizon!r}"
            )
        out = sessions.funnel(
            df, step_list, user, typ, ts,
            horizon_minutes=(int(horizon) or None),
        )
    elif name == "FB_RETENTION":
        from featurebase_spark.pipeline import sessions

        user, ts = args[1], args[2]
        need_col(user, "user_col")
        need_col(ts, "ts_col")
        out = sessions.retention_cohorts(df, user, ts)
    elif name == "FB_ASOF_JOIN":
        from featurebase_spark.operators.asof import asof_join

        r_tbl, on_c, lts, rts = args[1], args[2], args[3], args[4]
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", r_tbl):
            raise ValueError(f"{low}: table name expected, got {r_tbl!r}")
        right = spark.table(r_tbl)
        need_col(on_c, "on_col")
        need_col(lts, "left_ts")
        for c, role in ((on_c, "on_col"), (rts, "right_ts")):
            if c not in right.columns:
                raise ValueError(
                    f"{low}: column '{c}' not found in {r_tbl} ({role})"
                )
        # expose the matched right timestamp too (<right_ts>_asof) so
        # SQL callers can compute staleness without a second join
        out = asof_join(
            df, right, on_c, lts, rts,
            value_cols=[c for c in right.columns if c != on_c],
            tiebreak=next(
                (c for c in right.columns if c not in (on_c, rts)), rts
            ),
        )
    elif name == "FB_LIKE_SEARCH":
        from featurebase_spark.pipeline.trigram import (
            like_contains,
            like_match,
        )

        id_col, text_col, lit = args[1], args[2], args[3]
        need_col(id_col, "id_col")
        need_col(text_col, "text_col")
        m = _re.fullmatch(r"'((?:[^']|'')*)'", lit)
        if not m:
            raise ValueError(
                f"{low}: string literal expected for literal, got {lit!r}"
            )
        literal = m.group(1).replace("''", "'")
        if any(ch in literal for ch in "%_"):
            # a wildcard pattern routes through the full planLike
            # surface (longest-fragment prune + whole-pattern verify)
            out = like_match(df, id_col, text_col, literal)
        else:
            out = like_contains(df, id_col, text_col, literal)
    elif name == "FB_TRANSITIONS":
        from featurebase_spark.pipeline import sessions

        user, typ, ts, id_col = args[1], args[2], args[3], args[4]
        need_col(user, "user_col")
        need_col(typ, "type_col")
        need_col(ts, "ts_col")
        need_col(id_col, "id_col")
        out = sessions.transitions(df, user, typ, ts, id_col)
    elif name == "FB_FUZZY_JOIN":
        from featurebase_spark.pipeline.fuzzy import fuzzy_join

        id_col, text_col, dd = args[1], args[2], args[3]
        need_col(id_col, "id_col")
        need_col(text_col, "text_col")
        if not _re.fullmatch(r"[1-9]\d*", dd):
            raise ValueError(
                f"{low}: positive integer literal expected for max_dist, "
                f"got {dd!r}"
            )
        out = fuzzy_join(df, id_col, text_col, max_dist=int(dd))
    elif name == "FB_HLL":
        from featurebase_spark.pipeline.sketches import hll_summary

        key_c, bb = args[1], args[2]
        need_col(key_c, "key_col")
        if not _re.fullmatch(r"\d+", bb):
            raise ValueError(
                f"{low}: integer literal expected for b, got {bb!r}"
            )
        out = hll_summary(df, key_c, b=int(bb))
    elif name == "FB_KEYWORD_SEARCH":
        from featurebase_spark.pipeline.text import keyword_topk

        id_col, text_col, terms_lit, kk = args[1], args[2], args[3], args[4]
        need_col(id_col, "id_col")
        need_col(text_col, "text_col")
        m = _re.fullmatch(r"'((?:[^']|'')*)'", terms_lit)
        if not m:
            raise ValueError(
                f"{low}: string literal expected for terms (a CSV of "
                f"search terms), got {terms_lit!r}"
            )
        term_list = [
            t.strip()
            for t in m.group(1).replace("''", "'").split(",")
            if t.strip()
        ]
        if not term_list:
            raise ValueError(
                f"{low}: terms must name at least one search term, "
                f"got {terms_lit!r}"
            )
        if not _re.fullmatch(r"[1-9]\d*", kk):
            raise ValueError(
                f"{low}: positive integer literal expected for k, got {kk!r}"
            )
        out = keyword_topk(df, id_col, text_col, term_list, k=int(kk))
    elif name == "FB_BM25":
        from featurebase_spark.pipeline.ranking import bm25_topk

        id_col, text_col, terms_lit, kk = args[1], args[2], args[3], args[4]
        need_col(id_col, "id_col")
        need_col(text_col, "text_col")
        m = _re.fullmatch(r"'((?:[^']|'')*)'", terms_lit)
        if not m:
            raise ValueError(
                f"{low}: string literal expected for terms (a CSV of "
                f"search terms), got {terms_lit!r}"
            )
        term_list = [
            t.strip()
            for t in m.group(1).replace("''", "'").split(",")
            if t.strip()
        ]
        if not term_list:
            raise ValueError(
                f"{low}: terms must name at least one search term, "
                f"got {terms_lit!r}"
            )
        if not _re.fullmatch(r"[1-9]\d*", kk):
            raise ValueError(
                f"{low}: positive integer literal expected for k, got {kk!r}"
            )
        out = bm25_topk(df, id_col, text_col, term_list, k=int(kk))
    elif name == "FB_SOURCE_OVERLAP":
        from featurebase_spark.pipeline.contamination import (
            source_overlap_jaccard,
        )

        text_col, src_col, ng, top = args[1], args[2], args[3], args[4]
        need_col(text_col, "text_col")
        need_col(src_col, "source_col")
        for v, role in ((ng, "ngram"), (top, "top")):
            if not _re.fullmatch(r"[1-9]\d*", v):
                raise ValueError(
                    f"{low}: positive integer literal expected for {role}, "
                    f"got {v!r}"
                )
        out = source_overlap_jaccard(df, text_col, src_col, int(ng), int(top))
    elif name == "FB_CMS":
        from featurebase_spark.pipeline.sketches import cms_topk_with_truth

        key_c, dd, ww, kk = args[1], args[2], args[3], args[4]
        need_col(key_c, "key_col")
        for v, role in ((dd, "d"), (ww, "w"), (kk, "k")):
            if not _re.fullmatch(r"[1-9]\d*", v):
                raise ValueError(
                    f"{low}: positive integer literal expected for {role}, "
                    f"got {v!r}"
                )
        out = cms_topk_with_truth(df, key_c, d=int(dd), w=int(ww), k=int(kk))
    elif name == "FB_PMI":
        from featurebase_spark.pipeline.frequent import collocations_pmi_topk

        text_col, mc, kk = args[1], args[2], args[3]
        need_col(text_col, "text_col")
        for v, role in ((mc, "min_count"), (kk, "k")):
            if not _re.fullmatch(r"[1-9]\d*", v):
                raise ValueError(
                    f"{low}: positive integer literal expected for {role}, "
                    f"got {v!r}"
                )
        out = collocations_pmi_topk(df, text_col, min_count=int(mc), k=int(kk))
    elif name == "FB_SESSION_OVERLAP":
        from featurebase_spark.operators.intervals import (
            concurrent_session_pairs,
        )

        user_c, ts_c, gap = args[1], args[2], args[3]
        need_col(user_c, "user_col")
        need_col(ts_c, "ts_col")
        if not _re.fullmatch(r"[1-9]\d*", gap):
            raise ValueError(
                f"{low}: positive integer literal expected for "
                f"gap_minutes, got {gap!r}"
            )
        out = concurrent_session_pairs(df, user_c, ts_c, int(gap))
    elif name == "FB_WINNOW":
        from featurebase_spark.pipeline.dedup import (
            winnowing_containment_pairs,
        )

        text_col, id_col, ms = args[1], args[2], args[3]
        need_col(text_col, "text_col")
        need_col(id_col, "id_col")
        if not _re.fullmatch(r"[1-9]\d*", ms):
            raise ValueError(
                f"{low}: positive integer literal expected for "
                f"min_shared, got {ms!r}"
            )
        out = winnowing_containment_pairs(
            df, text_col, id_col, min_shared=int(ms)
        )
    elif name == "FB_DEDUP_COMPONENTS":
        from featurebase_spark.pipeline.dedup import (
            winnowing_containment_pairs,
        )
        from featurebase_spark.pipeline.graph import connected_components

        text_col, id_col, ms = args[1], args[2], args[3]
        need_col(text_col, "text_col")
        need_col(id_col, "id_col")
        if not _re.fullmatch(r"[1-9]\d*", ms):
            raise ValueError(
                f"{low}: positive integer literal expected for "
                f"min_shared, got {ms!r}"
            )
        pairs = winnowing_containment_pairs(
            df, text_col, id_col, min_shared=int(ms)
        )
        out = connected_components(
            df.select(id_col), pairs,
            node_col=id_col, src_col="id_a", dst_col="id_b",
            shuffle_partitions=8,  # loop frames = |ids| label rows
        )
    else:
        from featurebase_spark.pipeline import dedup

        text_col, id_col = args[1], args[2]
        need_col(text_col, "text_col")
        need_col(id_col, "id_col")
        out = dedup.dedup_survivors(df, text_col, id_col)
    view = f"__fb_tvf_{idx}"
    out.createOrReplaceTempView(view)
    return view


def _expand_tvfs(spark: SparkSession, sql: str) -> str:
    """Replace every TVF call in the statement with a temp view holding
    its result (the compile step the reference's planner would do if its
    TVFs were enabled). No-op when no TVF name appears."""
    if not _TVF_GUARD.search(sql):
        return sql
    toks = _tokenize(sql)
    out: list[str] = []
    i, n, count = 0, len(toks), 0
    while i < n:
        tok = toks[i]
        up = tok.upper() if (tok[:1].isalpha() or tok[:1] == "_") else ""
        if up in _TVFS:
            j = i + 1
            while j < n and _is_ws(toks[j]):
                j += 1
            if j < n and toks[j] == "(":
                depth, j2 = 1, j + 1
                args: list[str] = []
                cur: list[str] = []
                while j2 < n and depth:
                    t = toks[j2]
                    if t == "(":
                        depth += 1
                    elif t == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    elif t == "," and depth == 1:
                        args.append("".join(cur).strip())
                        cur = []
                        j2 += 1
                        continue
                    cur.append(t)
                    j2 += 1
                if depth:
                    raise ValueError(f"{up.lower()}: unterminated argument list")
                tail = "".join(cur).strip()
                if tail:
                    args.append(tail)
                out.append(_eval_tvf(spark, up, args, count))
                count += 1
                i = j2 + 1
                continue
        out.append(tok)
        i += 1
    return "".join(out)


def _route_group_distinct(
    spark: SparkSession, sql: str, catalog
) -> Optional[DataFrame]:
    """Serve ``SELECT f, COUNT(*) FROM t GROUP BY f [ORDER BY ...]
    [LIMIT n]`` and ``SELECT DISTINCT f FROM t [ORDER BY f] [LIMIT n]``
    from an equality index's fragment value/cardinality columns — the
    reference's PlanOpPQLGroupBy / PlanOpPQLRowsOp lowering (single
    ungrouped field, no WHERE). None → Catalyst scan fallback."""
    toks = [t for t in _tokenize(sql) if not _is_ws(t)]
    if len(toks) < 4 or toks[0].upper() != "SELECT":
        return None
    from pyspark.sql import functions as F

    def field_type(table: str, f: str) -> Optional[str]:
        view = catalog._view(table)
        t = dict(spark.table(view).dtypes).get(f)
        if t is None:
            return None
        return t[6:-1] if t.startswith("array<") else t

    i = 1
    if toks[i].upper() == "DISTINCT":
        # SELECT DISTINCT f FROM t [ORDER BY f [ASC]] [LIMIT n]
        if i + 3 >= len(toks) or toks[i + 2].upper() != "FROM":
            return None
        f, table = toks[i + 1].lower(), toks[i + 3].lower()
        i += 4
        reg = getattr(catalog, "_index_fields", {}).get(table)
        if not reg or reg.get(f) != "eq":
            return None
        ordered = False
        if i < len(toks) and toks[i].upper() == "ORDER":
            if (
                i + 2 >= len(toks)
                or toks[i + 1].upper() != "BY"
                or toks[i + 2].lower() != f
            ):
                return None
            i += 3
            if i < len(toks) and toks[i].upper() == "ASC":
                i += 1
            ordered = True
        limit = None
        if i + 1 < len(toks) and toks[i].upper() == "LIMIT":
            if not toks[i + 1].isdigit():
                return None
            limit = int(toks[i + 1])
            i += 2
        if i != len(toks):
            return None
        ft = field_type(table, f)
        if ft is None:
            return None
        out = (
            catalog._bitmap[table]._indexes[f]
            .select("value")
            .distinct()
            .select(F.col("value").cast(ft).alias(f))
        )
        if ordered:
            out = out.orderBy(f)
        return out.limit(limit) if limit is not None else out

    # SELECT f, COUNT(*) [AS a] FROM t GROUP BY f [ORDER BY ...] [LIMIT n]
    if i + 1 >= len(toks) or toks[i + 1] != ",":
        return None
    f = toks[i].lower()
    i += 2
    if (
        i + 3 >= len(toks)
        or toks[i].upper() != "COUNT"
        or toks[i + 1] != "("
        or toks[i + 2] != "*"
        or toks[i + 3] != ")"
    ):
        return None
    i += 4
    alias = None
    if i + 1 < len(toks) and toks[i].upper() == "AS":
        alias = toks[i + 1]
        if alias[:1] == '"' and alias[-1:] == '"':
            alias = alias[1:-1].replace('""', '"')
        i += 2
    if i + 1 >= len(toks) or toks[i].upper() != "FROM":
        return None
    table = toks[i + 1].lower()
    i += 2
    reg = getattr(catalog, "_index_fields", {}).get(table)
    if not reg or reg.get(f) != "eq":
        return None
    if (
        i + 2 >= len(toks)
        or toks[i].upper() != "GROUP"
        or toks[i + 1].upper() != "BY"
        or toks[i + 2].lower() != f
    ):
        return None
    i += 3
    cname = alias or "count(1)"
    order = None
    if i + 1 < len(toks) and toks[i].upper() == "ORDER" and toks[i + 1].upper() == "BY":
        i += 2
        order = []
        while i < len(toks) and toks[i].upper() != "LIMIT":
            col = toks[i].lower()
            if col == ",":
                i += 1
                continue
            if col not in (f, cname.lower(), "count"):
                return None
            direction = "asc"
            if i + 1 < len(toks) and toks[i + 1].upper() in ("ASC", "DESC"):
                direction = toks[i + 1].lower()
                i += 1
            order.append((f if col == f else cname, direction))
            i += 1
    limit = None
    if i + 1 < len(toks) and toks[i].upper() == "LIMIT":
        if not toks[i + 1].isdigit():
            return None
        limit = int(toks[i + 1])
        i += 2
    if i != len(toks):
        return None
    ft = field_type(table, f)
    if ft is None:
        return None
    out = (
        catalog._bitmap[table]._indexes[f]
        .groupBy("value")
        .agg(F.sum("cardinality").alias("__n"))
        .select(
            F.col("value").cast(ft).alias(f),
            F.col("__n").cast("long").alias(cname),
        )
    )
    if order:
        out = out.orderBy(
            *[
                F.desc(c) if d == "desc" else F.asc(c)
                for c, d in order
            ]
        )
    return out.limit(limit) if limit is not None else out


def _route_simple_agg(
    spark: SparkSession, sql: str, catalog
) -> Optional[DataFrame]:
    """Serve ``SELECT <one agg> FROM <indexed table> [WHERE <and/or of
    simple predicates>]`` from the table's bitmap fragments — the
    reference's actual compile path: sql3 lowers exactly this shape to a
    PQL Count/Sum/Min/Max over fragment bitmaps (compileselect.go →
    PlanOpPQLAggregate). Returns None for anything not fully covered
    (the Catalyst scan path is the fallback and the answers are equal —
    tests assert it). Result schema matches what ``spark.sql`` would
    name (``count(1)``/``sum(f)``/... or the AS alias)."""
    toks = [t for t in _tokenize(sql) if not _is_ws(t)]
    if len(toks) < 4 or toks[0].upper() != "SELECT":
        return None

    i = 1
    agg = toks[i].upper() if i < len(toks) else ""
    if agg not in ("COUNT", "SUM", "MIN", "MAX"):
        return None
    if i + 1 >= len(toks) or toks[i + 1] != "(":
        return None
    arg = toks[i + 2] if i + 2 < len(toks) else None
    if arg is None or (i + 3 >= len(toks)) or toks[i + 3] != ")":
        return None
    i += 4
    alias = None
    if i < len(toks) and toks[i].upper() == "AS":
        alias = toks[i + 1] if i + 1 < len(toks) else None
        if alias is None:
            return None
        if alias[:1] == '"' and alias[-1:] == '"':
            alias = alias[1:-1].replace('""', '"')
        i += 2
    if i >= len(toks) or toks[i].upper() != "FROM":
        return None
    table = toks[i + 1] if i + 1 < len(toks) else None
    i += 2
    if table is None or table.lower() not in getattr(catalog, "_index_fields", {}):
        return None
    table = table.lower()
    reg = catalog._index_fields[table]
    cat = catalog._bitmap[table]

    # WHERE clause → bitmap expression (and/or over field-op-literal)
    expr = None
    if i < len(toks):
        if toks[i].upper() != "WHERE":
            return None
        from featurebase_spark.plans import bitmap_index as B

        pos = [i + 1]

        def parse_or():
            node = parse_and()
            while (
                node is not None
                and pos[0] < len(toks)
                and toks[pos[0]].upper() == "OR"
            ):
                pos[0] += 1
                rhs = parse_and()
                node = B.Or(node, rhs) if rhs is not None else None
            return node

        def parse_and():
            node = parse_leaf()
            while (
                node is not None
                and pos[0] < len(toks)
                and toks[pos[0]].upper() == "AND"
            ):
                pos[0] += 1
                rhs = parse_leaf()
                node = B.And(node, rhs) if rhs is not None else None
            return node

        def parse_leaf():
            if pos[0] < len(toks) and toks[pos[0]] == "(":
                pos[0] += 1
                node = parse_or()
                if (
                    node is None
                    or pos[0] >= len(toks)
                    or toks[pos[0]] != ")"
                ):
                    return None
                pos[0] += 1
                return node
            if pos[0] + 2 >= len(toks):
                return None
            f, op, lit = toks[pos[0]], toks[pos[0] + 1], toks[pos[0] + 2]
            pos[0] += 3
            f = f.lower()
            if op == "=" and f in reg and reg[f] == "eq":
                v = lit[1:-1].replace("''", "'") if lit[:1] == "'" else lit
                return B.Atom(f, v)
            if (
                op in ("=", "!=", "<>", "<", "<=", ">", ">=")
                and f in reg
                and reg[f] == "bsi"
            ):
                try:
                    v = int(lit)
                except ValueError:
                    return None
                o = {"=": "==", "<>": "!="}.get(op, op)
                return B.Cmp(f, o, v)
            return None

        expr = parse_or()
        if expr is None or pos[0] != len(toks):
            return None

    if agg == "COUNT":
        # unfiltered COUNT(*) has no fragment answer (an eq index only
        # covers rows where its field is set) — scan path handles it
        if arg != "*" or expr is None:
            return None
        val = cat.count(expr)
        name = alias or "count(1)"
    else:
        f = arg.lower()
        if f not in reg or reg[f] != "bsi":
            return None
        fn = {"SUM": cat.bsi_sum, "MIN": cat.bsi_min, "MAX": cat.bsi_max}[agg]
        val = fn(f, expr)
        name = alias or f"{agg.lower()}({f})"
    lit = "NULL" if val is None else str(int(val))
    return spark.sql(f"SELECT CAST({lit} AS BIGINT) AS `{name}`")


#: reference binary-operator TYPE RULES (sql3/test/defs/defs_binops.go —
#: the 64-matrix corpus; error texts asserted verbatim there). Spark
#: would silently COERCE most of these (int < string compares by cast,
#: bool < bool works), so without this guard the dialect's behavior
#: drifts from the reference with no error at all. Conservative scope:
#: the guard fires only on a COLUMN-op-COLUMN expression whose two bare
#: identifiers both resolve in the single FROM table — literals keep
#: Spark's coercion semantics (the corpus types those cases via field
#: reads, which a text front door cannot see), and anything qualified,
#: parenthesized, or multi-table is left to Catalyst.
_BINOP_ALLOWED: dict[str, frozenset] = {
    **{op: frozenset({"int", "id"}) for op in ("&", "|", "<<", ">>", "%")},
    **{op: frozenset({"int", "id", "decimal"}) for op in ("+", "-", "*", "/")},
    "||": frozenset({"string"}),
    **{
        op: frozenset({"int", "id", "decimal", "timestamp"})
        for op in ("<", "<=", ">", ">=")
    },
    # AND/OR deliberately absent: the corpus asserts only their VALID
    # bool cases, never an error text — and guarding them would false-
    # positive on BETWEEN x AND y. Catalyst types them.
}
_EQ_OPS = {"=", "!=", "<>"}
_ORDER_OPS = {"<", "<=", ">", ">="}

#: tokens that put the NEXT -/+/! in unary position (expression start)
_UNARY_STARTERS = {
    "SELECT", ",", "(", "WHERE", "AND", "OR", "NOT", "BY", "HAVING",
    "THEN", "ELSE", "WHEN", "=", "!=", "<>", "<", "<=", ">", ">=",
    "+", "-", "*", "/", "%",
}


def _fb_type_name(field) -> Optional[str]:
    """Reference type-system name for a Spark schema field; None for
    types outside the reference's system (guard then stays silent)."""
    from pyspark.sql import types as T

    dt = field.dataType
    if field.name == "_id" and isinstance(
        dt, (T.LongType, T.IntegerType)
    ):
        return "id"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.scale})"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, (T.LongType, T.IntegerType)):
            return "idset"
        if isinstance(dt.elementType, T.StringType):
            return "stringset"
    return None


def _binop_class(tname: str) -> str:
    return "decimal" if tname.startswith("decimal(") else tname


def _binop_type_guard(spark: SparkSession, sql: str) -> None:
    """Raise the reference's binop compile errors for column-op-column
    expressions (defs_binops.go corpus): per-operand 'operator <op>
    incompatible with type <t>' (checked left to right), then the
    cross-class 'types X and Y are not equatable' rule for
    equality/ordering over non-jointly-comparable classes (numeric
    classes int/id/decimal ARE jointly comparable; timestamp only with
    itself)."""
    toks = _tokenize(sql)
    sig = [t for t in toks if not _is_ws(t)]
    # single-table scope only: exactly one FROM, a bare table name, no
    # JOIN / comma-list / subquery
    froms = [i for i, t in enumerate(sig) if t.upper() == "FROM"]
    if len(froms) != 1 or any(t.upper() == "JOIN" for t in sig):
        return
    fi = froms[0]
    if fi + 1 >= len(sig):
        return
    table = sig[fi + 1]
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        return
    # Bail unless the table name is followed by end-of-statement or a
    # clause keyword: 'FROM t1 a, t2 b' (aliased comma list), 'FROM t.s'
    # (qualified), or any alias would otherwise slip a second table's
    # columns into the single-table type scope and raise a spurious
    # binop error on a query Catalyst accepts.
    if fi + 2 < len(sig) and sig[fi + 2].upper() not in (
        "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", ";",
    ):
        return
    try:
        schema = spark.table(table).schema
    except Exception:  # noqa: BLE001 — unknown table: Catalyst's error
        return
    types = {}
    for f in schema.fields:
        tn = _fb_type_name(f)
        if tn:
            types[f.name.lower()] = tn

    def col_type(i: int) -> Optional[str]:
        t = sig[i]
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            return None
        # adjacent '.' means a qualified name or struct access — skip
        if sig[i - 1 : i] == ["."] or sig[i + 1 : i + 2] == ["."]:
            return None
        return types.get(t.lower())

    for i in range(1, len(sig) - 1):
        tok = sig[i]
        op = tok
        if op in ("-", "+", "!") and i >= 1:
            # UNARY position: the token before is an expression starter,
            # not an operand (defs_unops.go:60-260 — unary -/+ take
            # int/id/decimal, bitwise '!' takes int/id only; bool/
            # timestamp/sets/strings raise; Spark would coerce or negate)
            prev = sig[i - 1].upper()
            if prev in _UNARY_STARTERS:
                ut = col_type(i + 1)
                if ut is not None:
                    uc = _binop_class(ut)
                    allowed = (
                        {"int", "id"} if op == "!"
                        else {"int", "id", "decimal"}
                    )
                    if uc not in allowed:
                        raise ValueError(
                            f"operator '{op}' incompatible with "
                            f"type '{ut}'"
                        )
                continue
        if op.upper() == "BETWEEN":
            # BETWEEN subscripts are numeric/timestamp only
            # (defs_between.go:63-224 — bool/string/sets rejected even
            # though they order; Spark would happily range-compare them)
            j = i - 1
            if j >= 1 and sig[j].upper() == "NOT":
                j -= 1
            lt = col_type(j)
            if lt is not None and _binop_class(lt) not in (
                "int", "id", "decimal", "timestamp",
            ):
                raise ValueError(
                    f"type '{lt}' cannot be used as a range subscript"
                )
            continue
        if op.upper() == "LIKE":
            # LIKE/NOT LIKE take a STRING left operand; the right side
            # is the pattern literal, so only the left is typed here
            # (defs_like.go:24-140 — 'NOTLIKE' when negated)
            j = i - 1
            opname = "LIKE"
            if j >= 1 and sig[j].upper() == "NOT":
                opname, j = "NOTLIKE", j - 1
            lt = col_type(j)
            if lt is not None and lt != "string":
                raise ValueError(
                    f"operator '{opname}' incompatible with type '{lt}'"
                )
            continue
        if op not in _BINOP_ALLOWED and op not in _EQ_OPS:
            continue
        lt, rt = col_type(i - 1), col_type(i + 1)
        if lt is None or rt is None:
            continue
        lc, rc = _binop_class(lt), _binop_class(rt)
        if op in _BINOP_ALLOWED:
            allowed = _BINOP_ALLOWED[op]
            for t, c in ((lt, lc), (rt, rc)):
                if c not in allowed:
                    raise ValueError(
                        f"operator '{tok}' incompatible with type '{t}'"
                    )
        if op in _EQ_OPS or op in _ORDER_OPS:
            numeric = {"int", "id", "decimal"}
            jointly = (lc == rc) or (lc in numeric and rc in numeric)
            if not jointly:
                raise ValueError(
                    f"types '{lt}' and '{rt}' are not equatable"
                )


def _int_binop_rewrite(spark: SparkSession, sql: str) -> str:
    """Reference INT arithmetic semantics for ``/`` and ``%``
    (expression.go:414-428): int/int division TRUNCATES (Go ``nl/nr`` —
    10/20 is 0, not Spark's fractional 0.5) and a zero divisor raises
    '[0:0] divisor is equal to zero' (NewErrDivideByZero, errors.go:908;
    defs_binops.go:24-49) where Spark returns NULL.

    Same conservative scope as the binop type guard: operands must be
    bare single tokens — an integer literal, or a column of the single
    FROM table whose reference class is int/id (the reference's ID path
    skips the zero check and would panic, expression.go:484-488; we
    raise the same error — documented superset). A NONZERO literal
    divisor needs no guard, so it emits a bare ``DIV``/``%`` and keeps
    predicate pushdown intact (a CASE-wrapped ``%`` in WHERE would
    block the parquet filter). Truncating division commutes with
    negation (trunc(-x) = -trunc(x); Go ``%`` follows the dividend like
    Spark's), so a preceding unary minus stays correct."""
    toks = _tokenize(sql)
    if not any(t in ("/", "%") for t in toks):
        return sql
    sig_idx = [i for i, t in enumerate(toks) if not _is_ws(t)]
    pos_in_sig = {i: n for n, i in enumerate(sig_idx)}
    sig = [toks[i] for i in sig_idx]
    # column types from the single bare FROM table, if one exists
    types: dict[str, str] = {}
    froms = [n for n, t in enumerate(sig) if t.upper() == "FROM"]
    if len(froms) == 1 and not any(t.upper() == "JOIN" for t in sig):
        fi = froms[0]
        if fi + 1 < len(sig) and _re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_]*", sig[fi + 1]
        ) and (
            fi + 2 >= len(sig)
            or sig[fi + 2].upper()
            in ("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", ";")
        ):
            try:
                for f in spark.table(sig[fi + 1]).schema.fields:
                    tn = _fb_type_name(f)
                    if tn:
                        types[f.name.lower()] = tn
            except Exception:  # noqa: BLE001 — unknown table
                pass

    def int_operand(n: int) -> bool:
        """sig[n] is an int-class operand: integer literal or int/id
        column (not part of a qualified name)."""
        if not 0 <= n < len(sig):
            return False
        t = sig[n]
        if sig[n - 1 : n] == ["."] or sig[n + 1 : n + 2] == ["."]:
            return False
        if _lit_kind(t)[0] == "int":
            return True
        return (
            bool(_re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t))
            and _binop_class(types.get(t.lower(), "")) in ("int", "id")
        )

    out = list(toks)
    for n in range(1, len(sig) - 1):
        op = sig[n]
        if op not in ("/", "%"):
            continue
        if not (int_operand(n - 1) and int_operand(n + 1)):
            continue
        lhs, rhs = sig[n - 1], sig[n + 1]
        sp = "DIV" if op == "/" else "%"
        k, v = _lit_kind(rhs)
        if k == "int" and v != 0:
            expr = f"(({lhs}) {sp} ({rhs}))"
        else:
            expr = (
                f"(CASE WHEN ({rhs}) = 0 THEN CAST(raise_error("
                f"'[0:0] divisor is equal to zero') AS BIGINT) "
                f"ELSE ({lhs}) {sp} ({rhs}) END)"
            )
        li, oi, ri = sig_idx[n - 1], sig_idx[n], sig_idx[n + 1]
        out[li] = expr
        for j in range(li + 1, ri + 1):
            out[j] = ""
        # keep sig consistent for chained scans: the rewritten span is
        # no longer a bare operand, so later ops see a non-identifier
        sig[n - 1] = expr
        sig[n] = ""
        sig[n + 1] = ""
    return "".join(out)


def _percentile_fold_sql(col: str, nth: str, kind: str, prec: int, scale: int) -> str:
    """One SQL aggregate expression replaying executePercentile
    (executor.go:1310-1603) — the reference's bisection whose result may
    be a midpoint ABSENT from the data (defs_aggregate.go pins
    percentile(d1,50) over {10,10,11,12,12,13} = 11.50, not 11.00).

    Shape: the bisection's branches depend only on two order statistics
    (b = sorted[desiredLess], a = sorted[n-1-desiredGreater]), so the
    loop becomes a PURE-ARITHMETIC fold over ``sequence(1, 70)`` (≥ the
    64 halvings a 64-bit span can need) with the group's sorted values
    supplying a and b. int columns use the Go truncating average
    (executor.go:1484-1490 — DIV/% match Go exactly); decimal columns
    run on 10^scale-scaled BIGINTs with the floor average (DivideDecimal
    = big.Int Div, pql/decimal.go:150-161) and unscale at the end;
    timestamp columns (reference: int BSI of epoch units) bisect on
    epoch MICROS — the engine's timestamp resolution — as a documented
    granularity choice. desiredLess/Greater replicate Go's
    ``uint64(float64(n)*nth/100.0)`` with double math and
    truncate-toward-zero casts.

    Memory note: ``collect_list`` buffers each group's values exactly
    like Spark's own percentile_disc buffer — same memory class as the
    previous emitter. The 100-TB path for global percentiles is the PQL
    door (pql.calls.reference_percentile: histogram narrowing, no
    value materialization), mirroring the reference where SQL PERCENTILE
    exists only as a PQL pushdown (expressionagg.go:909-911)."""
    if kind == "decimal" and scale > 0:
        c = f"CAST(({col}) * {10 ** scale} AS BIGINT)"
    elif kind == "timestamp":
        c = f"unix_micros({col})"
    else:
        c = f"CAST({col} AS BIGINT)"
    nthd = f"CAST(({nth}) AS DOUBLE)"
    cnt = f"count({col})"
    dl = f"CAST((CAST({cnt} AS DOUBLE) * {nthd}) / 100.0D AS BIGINT)"
    dg = f"CAST((CAST({cnt} AS DOUBLE) * (100.0D - {nthd})) / 100.0D AS BIGINT)"
    vs = f"array_sort(collect_list({c}))"
    # INTEGER (not INT) — the dialect CAST map rewrites INT to the
    # reference's 64-bit INT; element_at requires a 32-bit index
    b = f"element_at({vs}, CAST({dl} AS INTEGER) + 1)"
    a = f"element_at({vs}, CAST({cnt} - {dg} AS INTEGER))"
    if kind == "decimal":
        # floor average on scaled values (big.Int Div semantics),
        # overflow-safe via arithmetic shifts
        mid = (
            "(shiftright(s.lo, 1) + shiftright(s.hi, 1) "
            "+ shiftright((s.lo & 1) + (s.hi & 1), 1))"
        )
    else:
        mid = (
            "((s.lo DIV 2) + (s.hi DIV 2) "
            "+ (((s.lo % 2) + (s.hi % 2)) DIV 2))"
        )
    fold = (
        f"aggregate(sequence(1, 70), "
        f"named_struct('lo', min({c}), 'hi', max({c}), "
        f"'val', min({c}), 'done', false), "
        f"(s, i) -> IF(s.done OR s.lo >= s.hi, s, "
        f"IF({mid} > {b}, "
        f"named_struct('lo', s.lo, 'hi', {mid} - 1L, 'val', {mid}, "
        f"'done', false), "
        f"IF({mid} < {a}, "
        f"named_struct('lo', {mid} + 1L, 'hi', s.hi, 'val', {mid}, "
        f"'done', false), "
        f"named_struct('lo', s.lo, 'hi', s.hi, 'val', {mid}, "
        f"'done', true)))), "
        f"s -> s.val)"
    )
    if kind == "decimal":
        t = f"DECIMAL({prec},{scale})"
        unscaled = (
            f"CAST(CAST({fold} AS DECIMAL(38,0)) / {10 ** scale} AS {t})"
            if scale > 0
            else f"CAST({fold} AS {t})"
        )
    elif kind == "timestamp":
        t, unscaled = "TIMESTAMP", f"timestamp_micros({fold})"
    else:
        t, unscaled = "BIGINT", fold
    # branch order mirrors the reference: desiredGreater == 0 → max
    # (also covers the both-zero case, executor.go:1443-1467);
    # desiredLess == 0 (with dG != 0) → min; else bisect
    return (
        f"(CASE WHEN {cnt} = 0 THEN CAST(NULL AS {t}) "
        f"WHEN {dg} = 0 THEN CAST(max({col}) AS {t}) "
        f"WHEN {dl} = 0 THEN CAST(min({col}) AS {t}) "
        f"ELSE {unscaled} END)"
    )


def _percentile_rewrite(spark: SparkSession, sql: str) -> str:
    """Rewrite PERCENTILE(col, nth) to the reference-exact bisection fold
    (:func:`_percentile_fold_sql`) when the column's dtype is knowable —
    same conservative scope rule as :func:`_int_binop_rewrite`: one bare
    FROM table, no JOIN (every reference-LEGAL percentile query has this
    shape — sql3 rejects anything it cannot push down to one PQL call,
    expressionagg.go:909-911). int / decimal / timestamp columns rewrite;
    float/double columns (no reference BSI dtype exists) and unresolvable
    scopes keep the nearest-rank percentile_disc EXTENSION emitter in
    translate()."""
    if "percentile" not in sql.lower():
        return sql
    toks = _tokenize(sql)
    _check_count_args(toks)  # arg analysis must fire BEFORE the rewrite
    # (else percentile(_id, 50) would silently rewrite — _id is a column)
    sig_idx = [i for i, t in enumerate(toks) if not _is_ws(t)]
    sig = [toks[i] for i in sig_idx]
    types: dict[str, tuple[str, int, int]] = {}
    froms = [n for n, t in enumerate(sig) if t.upper() == "FROM"]
    if len(froms) == 1 and not any(t.upper() == "JOIN" for t in sig):
        fi = froms[0]
        if fi + 1 < len(sig) and _re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_]*", sig[fi + 1]
        ) and (
            fi + 2 >= len(sig)
            or sig[fi + 2].upper()
            in ("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", ";")
        ):
            try:
                for f in spark.table(sig[fi + 1]).schema.fields:
                    ss = f.dataType.simpleString()
                    if ss in ("tinyint", "smallint", "int", "bigint"):
                        types[f.name.lower()] = ("int", 0, 0)
                    elif ss.startswith("decimal("):
                        p, s = ss[8:-1].split(",")
                        types[f.name.lower()] = ("decimal", int(p), int(s))
                    elif ss == "timestamp":
                        types[f.name.lower()] = ("timestamp", 0, 0)
            except Exception:  # noqa: BLE001 — unknown table
                pass
    if not types:
        return sql
    out = list(toks)
    n = len(sig)
    for k in range(n - 1):
        if sig[k].upper() != "PERCENTILE" or sig[k + 1] != "(":
            continue
        # walk the argument span in RAW token space
        start = sig_idx[k]
        j = sig_idx[k + 1] + 1
        depth, args = 1, [[]]
        while j < len(toks) and depth:
            t = toks[j]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    break
            elif t == "," and depth == 1:
                args.append([])
                j += 1
                continue
            args[-1].append(t)
            j += 1
        if depth or len(args) != 2:
            continue
        col = "".join(args[0]).strip()
        nth = "".join(args[1]).strip()
        info = types.get(col.lower())
        if info is None or not _re.fullmatch(r"-?\d+(\.\d+)?", nth):
            continue
        if not 0 <= float(nth) <= 100.0:
            # the executor's runtime range check (executor.go:1332-1335),
            # raised at compile time since nth is a literal
            raise ValueError(
                f"Percentile(): invalid nth value ({float(nth):f}), "
                f"should be a number between 0 and 100 inclusive"
            )
        kind, prec, scale = info
        expr = _percentile_fold_sql(col, nth, kind, prec, scale)
        out[start] = expr
        for m in range(start + 1, j + 1):
            out[m] = ""
    return "".join(out)


_HINT_RE = _re.compile(
    r"(?is)\bfrom\s+([A-Za-z_][\w]*)\s+with\s*\(\s*"
    r"([A-Za-z_]\w*)\s*\(([^()]*)\)\s*\)"
)


def _apply_query_hints(spark: SparkSession, sql: str) -> str:
    """Reference QUERY HINTS: ``FROM t WITH (flatten(setcol))`` makes
    DISTINCT / GROUP BY over a set column operate per ELEMENT — each
    element becomes its own single-element set (planoptimizer.go:
    819-930, defs_groupby.go:282-460). Compiled as a derived table that
    explodes the set and re-wraps each element (``array(e) AS setcol``),
    so the downstream distinct/groupBy/aggregate sees per-element
    groups through the ordinary Catalyst path — no special grouping
    operator needed. Hint errors use the reference's exact texts."""
    m = _HINT_RE.search(sql)
    if m is None:
        return sql
    table, hint, raw_args = m.group(1), m.group(2), m.group(3)
    if hint.lower() != "flatten":
        raise ValueError(f"unknown query hint '{hint}'")
    args = [a.strip() for a in raw_args.split(",") if a.strip()]
    if len(args) != 1:
        raise ValueError(
            f"query hint 'flatten' expected 1 parameter(s) "
            f"(column name), got {len(args)} parameters"
        )
    col = args[0]
    try:
        cols = spark.table(table).columns
    except Exception:  # noqa: BLE001 — unknown table: Catalyst's error
        return sql
    if col not in cols:
        raise ValueError(f"column '{col}' not found")
    others = ", ".join(f"`{c}`" for c in cols if c != col)
    derived = (
        f"(SELECT {others + ', ' if others else ''}array(__fb_flat) "
        f"AS `{col}` FROM (SELECT *, explode(`{col}`) AS __fb_flat "
        f"FROM {table})) AS {table}"
    )
    out = sql[: m.start()] + f"FROM {derived}" + sql[m.end():]
    # one hint clause per table reference; apply any further hints too
    return _apply_query_hints(spark, out)


def fb_sql(spark: SparkSession, sql: str, catalog=None) -> Optional[DataFrame]:
    """Execute FeatureBase-dialect SQL against registered Spark views —
    the ``POST /sql`` front door (http_handler.go:1440-1530), with
    Catalyst in place of sql3's analyze/compile/optimize pipeline.

    Queries translate to Spark SQL; non-SELECT statements (CREATE/ALTER/
    DROP/INSERT/REPLACE/BULK INSERT/DELETE/SHOW — statement dispatch
    ``executionplanner.go:137-188``) route through
    :mod:`featurebase_spark.statements` to the Catalog/write/source
    implementations. DDL/DML return None (the reference returns empty
    headers); SHOW and queries return a DataFrame. Simple aggregate
    SELECTs over tables with declared bitmap indexes serve from
    fragments (:func:`_route_simple_agg`) — the reference's sql3→PQL
    compile path — with the Catalyst scan as fallback."""
    from featurebase_spark import statements

    if statements.is_statement(sql):
        return statements.execute_statement(spark, sql, catalog)
    if catalog is not None:
        routed = _route_simple_agg(spark, sql, catalog)
        if routed is None:
            routed = _route_group_distinct(spark, sql, catalog)
        if routed is not None:
            return routed
    sql = _expand_tvfs(spark, sql)  # declared extension (TVF front door)
    sql = _apply_query_hints(spark, sql)  # WITH (flatten(col)) hints
    _binop_type_guard(spark, sql)  # defs_binops.go type-rule parity
    sql = _int_binop_rewrite(spark, sql)  # int '/'+'%' truncation + /0
    sql = _percentile_rewrite(spark, sql)  # executePercentile bisection
    if catalog is not None:
        # system tables are SELECT-able, not just SHOW-able
        # (opsystemtable.go registers them as ordinary planner tables)
        _SYS = {
            "fb_tables": catalog.fb_tables,
            "fb_views": catalog.fb_views,
            "fb_databases": catalog.fb_databases,
            "fb_exec_requests": catalog.fb_exec_requests,
            "fb_performance_counters": catalog.fb_performance_counters,
            "fb_database_info": catalog.fb_database_info,
            "fb_cluster_info": catalog.fb_cluster_info,
            "fb_database_nodes": catalog.fb_database_nodes,
            "fb_cluster_nodes": catalog.fb_cluster_nodes,
        }
        for name, fn in _SYS.items():
            if _re.search(rf"\b{name}\b", sql, _re.IGNORECASE):
                fn().createOrReplaceTempView(name)
    from pyspark.errors import AnalysisException

    try:
        return spark.sql(translate(sql))
    except AnalysisException as e:
        # Analyzer errors re-phrased to the reference's compile-error
        # wording (sql3/errors.go: ErrTableOrViewNotFound /
        # ErrColumnNotFound — asserted verbatim by the defs corpus, e.g.
        # defs_sql1.go:534-556). Anything else propagates untouched.
        cls = (
            e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        ) or ""
        params = e.getMessageParameters() or {}

        def _bare(key: str) -> Optional[str]:
            v = params.get(key)
            if v is None:
                return None
            return v.replace("`", "").split(".")[-1]

        if cls == "TABLE_OR_VIEW_NOT_FOUND":
            name = _bare("relationName")
            if name:
                raise ValueError(f"table or view '{name}' not found") from e
        if cls.startswith("UNRESOLVED_COLUMN"):
            name = _bare("objectName")
            if name:
                raise ValueError(f"column '{name}' not found") from e
        raise


def fb_sql_plan(spark: SparkSession, sql: str, formatted: bool = True) -> str:
    """The reference's ``POST /sql?plan=true`` surface
    (http_handler.go:1437-1446): return the query plan without executing.
    Here the plan is Catalyst's — the translated Spark SQL text's
    formatted physical plan (scan pushdown, join strategy, codegen spans
    all visible)."""
    df = spark.sql(translate(sql))
    mode = "formatted" if formatted else "extended"
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
