"""A small ivy-expression compiler for PQL ``Apply`` (apply.go:14-120).

The reference embeds Rob Pike's ivy (an APL dialect) and maps each ivy
program over the per-shard Arrow dataframe, reducing results on the
coordinator (IvyReduce apply.go:50-120; grammar hook pql/pql.peg:11,24-26;
dispatch executor.go:831). Test programs are of the shape ``"_ID+0"``,
``"2*fieldname"``, ``"+/value"`` (dataframe_test.go:91-132).

This module compiles the commonly-used ivy subset straight to Spark
``Column`` expressions — elementwise arithmetic stays inside Tungsten
codegen (no Python in the loop), and reductions (``op/``) become one
Spark aggregate, which IS the map-then-reduce contract of IvyReduce.

Supported subset (documented divergences from full ivy):

- operands: column names (``_ID`` = the record-id column), integer and
  float literals, parenthesized expressions;
- binary operators ``+ - * / ** max min``, RIGHT-associative with no
  precedence — APL/ivy evaluation order (``2*3+1`` = 8);
- unary minus;
- reductions ``+/ */ max/ min/`` over the whole (filtered) column —
  full ivy reduces per vector; here the dataframe column is the vector;
- NOT supported: rationals (ivy's exact ``1/3``; ``/`` here is double
  division), big ints, vectors-of-vectors, user operators. Programs
  outside the subset raise ``SyntaxError`` — the same fail-fast the
  reference gives for bad ivy (dataframe_test.go:126).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

_TOK = re.compile(
    r"""\s*(?:
      (?P<red>[+*]/|max/|min/)
    | (?P<num>\d+\.\d+|\d+)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\*\*|<=|>=|!=|==|[+\-*/()<>]|max|min|mod)
    )""",
    re.VERBOSE,
)

_BINOPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "**": lambda a, b: a.cast("double") ** b,
    "max": F.greatest,
    "min": F.least,
    # ivy relational operators yield 1/0 vectors (APL booleans) —
    # composable with arithmetic (e.g. ``+/ value > 100`` counts)
    "<": lambda a, b: (a < b).cast("long"),
    "<=": lambda a, b: (a <= b).cast("long"),
    ">": lambda a, b: (a > b).cast("long"),
    ">=": lambda a, b: (a >= b).cast("long"),
    "==": lambda a, b: (a == b).cast("long"),
    "!=": lambda a, b: (a != b).cast("long"),
    # ivy mod follows the divisor's sign (Euclidean for positive
    # divisors) — Spark's pmod is exactly that for b > 0
    "mod": F.pmod,
}

_REDUCTIONS = {
    "+/": F.sum,
    "*/": lambda c: F.exp(F.sum(F.log(c))),  # product via log-sum (doubles)
    "max/": F.max,
    "min/": F.min,
}


def _tokenize(src: str) -> list[str]:
    out, i = [], 0
    while i < len(src):
        m = _TOK.match(src, i)
        if not m or m.end() == i:
            raise SyntaxError(f"ivy: unexpected input at {src[i:]!r}")
        i = m.end()
        out.append(m.group().strip())
    return [t for t in out if t]


class _P:
    def __init__(self, toks: list[str], id_col: str, df: DataFrame):
        self.toks = toks
        self.i = 0
        self.id_col = id_col
        self.cols = set(df.columns)

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise SyntaxError("ivy: unexpected end of expression")
        self.i += 1
        return t

    def expr(self) -> Column:
        """Right-associative, precedence-free (APL order): operand, then
        if a binary operator follows, combine with the REST of the input."""
        left = self.operand()
        nxt = self.peek()
        if nxt is not None and nxt in _BINOPS:
            op = self.take()
            right = self.expr()
            return _BINOPS[op](left, right)
        return left

    def operand(self) -> Column:
        t = self.take()
        if t == "(":
            inner = self.expr()
            if self.take() != ")":
                raise SyntaxError("ivy: expected ')'")
            return inner
        if t == "-":
            return -self.operand()
        if re.fullmatch(r"\d+\.\d+", t):
            return F.lit(float(t))
        if re.fullmatch(r"\d+", t):
            return F.lit(int(t))
        if t == "_ID":
            return F.col(self.id_col)
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            if t not in self.cols:
                raise SyntaxError(f"ivy: unknown name {t!r}")
            return F.col(t)
        raise SyntaxError(f"ivy: unexpected token {t!r}")


def compile_ivy(df: DataFrame, src: str, id_col: str = "_id") -> tuple[Column, Optional[str]]:
    """Compile an ivy program to (column expression, reduction name).
    A leading ``op/`` marks a reduction over the whole column."""
    toks = _tokenize(src)
    red = None
    if toks and toks[0] in _REDUCTIONS:
        red = toks[0]
        toks = toks[1:]
    p = _P(toks, id_col, df)
    col = p.expr()
    if p.peek() is not None:
        raise SyntaxError(f"ivy: trailing input {p.peek()!r}")
    return col, red


_RED_PROG = re.compile(r"^\s*([+*]/|max/|min/)\s*([A-Za-z_][A-Za-z0-9_]*)?\s*$")


def reduce_program(
    df: DataFrame,
    map_src: str,
    reduce_src: str,
    id_col: str = "_id",
    alias: str = "result",
) -> DataFrame:
    """``Apply``'s third argument: an ivy REDUCE program applied to the
    concatenation of the per-shard map results (IvyReduce apply.go:50-120
    — each shard maps, the coordinator reduces the combined vector).
    Spark's aggregate IS that contract: partial per partition, merged
    once. Supported reduce programs: ``op/`` optionally followed by a
    name for the mapped vector (``"+/"``, ``"+/ x"``)."""
    col, red = compile_ivy(df, map_src, id_col)
    if red is not None:
        raise SyntaxError(
            "ivy: map program already reduces; drop the reduce argument"
        )
    m = _RED_PROG.match(reduce_src)
    if not m:
        raise SyntaxError(f"ivy: unsupported reduce program {reduce_src!r}")
    return df.agg(_REDUCTIONS[m.group(1)](col).alias(alias))


def apply_ivy(
    df: DataFrame, src: str, id_col: str = "_id", alias: str = "result"
) -> DataFrame:
    """Run an ivy map (and optional reduction) over the (already filtered)
    dataframe — the executor side of PQL ``Apply``. Elementwise programs
    return one row per record (id order, like the reference's per-shard
    concat); reductions return a single row."""
    col, red = compile_ivy(df, src, id_col)
    if red is not None:
        return df.agg(_REDUCTIONS[red](col).alias(alias))
    return df.select(F.col(id_col), col.alias(alias)).orderBy(id_col)
