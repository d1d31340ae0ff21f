"""Oracle output-type hygiene (r7 verdict ask #2).

The driver compares Spark and DuckDB results by hashing canonicalized
cell values.  DuckDB types an uncast ``SUM(bigint)`` as HUGEINT, which
pandas materializes as float64 — so the oracle renders ``4995.0`` while
Spark renders ``4995`` and the hash goes red even though every cell
compares ``==`` (the two-round `mix_temperature_sample` defect).  Guard:

1. no ORACLE_SQL entry may produce a HUGEINT / UHUGEINT / FLOAT
   (float32) output column — use CAST(... AS BIGINT/DOUBLE);
2. ``compare_frames`` (strict mode, the default) must flag an
   int-vs-float column dtype mismatch even when values compare equal.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from featurebase_spark import queries as Q
from featurebase_spark.verify import compare_frames, duck_connection

SF_DIR = "/root/testdata/sf0.001"

BANNED = {"HUGEINT", "UHUGEINT", "FLOAT"}


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


def _banned_cols(rel) -> list[tuple[str, str]]:
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in BANNED
    ]


@pytest.mark.parametrize("name", sorted(Q.ORACLE_SQL))
def test_oracle_output_types_are_hash_stable(con, name):
    # .types binds the relation without executing it, so this is cheap
    # even for the heavyweight oracles.
    rel = con.sql(Q.ORACLE_SQL[name])
    bad = _banned_cols(rel)
    assert not bad, (
        f"oracle {name!r} emits hash-unstable output column types {bad}: "
        f"HUGEINT/UHUGEINT materialize as float64 in pandas (so the "
        f"driver hashes '1.0' vs Spark's '1'); CAST to BIGINT/DOUBLE"
    )


def test_guard_catches_seeded_hugeint(con):
    """The predicate itself must catch the original defect class."""
    rel = con.sql("SELECT SUM(n_chars) AS kept_chars FROM documents")
    assert _banned_cols(rel) == [("kept_chars", "HUGEINT")]


def test_compare_frames_strict_flags_int_vs_float():
    sp = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1, 2], dtype="int64")})
    du = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1.0, 2.0], dtype="float64")})
    strict = compare_frames(sp, du)
    assert any("dtype kind mismatch" in p for p in strict)
    # legacy mode reproduces the old blind spot (documented, not desired)
    assert compare_frames(sp, du, strict_dtypes=False) == []


def test_compare_frames_strict_passes_matching_kinds():
    sp = pd.DataFrame({"v": pd.array([1, 2], dtype="int32")})
    du = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    assert compare_frames(sp, du) == []


def test_not_in_oracles_null_proofed(spark):
    """NOT-IN landmine (r8 verdict "What's wrong #2"): SQL ``NOT IN`` is
    null-aware — ONE NULL in the exclusion subquery empties the whole
    result — while the Spark side of every such key compiles to a
    ``left_anti`` join, which ignores NULLs.  Green today only because
    the testdata exclusion columns are never NULL; this test seeds the
    NULL and proves (a) the bare shapes really do diverge (the landmine
    is real), and (b) the ``IS NOT NULL``-guarded oracle shape matches
    the anti-join on both engines."""
    con = duckdb.connect()
    con.execute("CREATE TABLE big(k BIGINT); INSERT INTO big VALUES (1),(2),(3),(4)")
    con.execute("CREATE TABLE excl(k BIGINT); INSERT INTO excl VALUES (2),(NULL)")

    # (a) the divergence: bare NOT IN over a NULL-bearing set is empty
    bare = con.sql("SELECT k FROM big WHERE k NOT IN (SELECT k FROM excl)")
    assert bare.fetchall() == []

    # (b) guarded NOT IN == Spark left_anti, on both engines
    guarded = con.sql(
        "SELECT k FROM big WHERE k NOT IN "
        "(SELECT k FROM excl WHERE k IS NOT NULL) ORDER BY k"
    ).fetchall()
    big = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    excl = spark.createDataFrame([(2,), (None,)], "k long")
    anti = sorted(
        r.k for r in big.join(excl, "k", "left_anti").collect()
    )
    assert [r[0] for r in guarded] == anti == [1, 3, 4]


def test_registered_not_in_oracles_carry_null_guard():
    """Every ORACLE_SQL entry using a NOT IN *subquery* must null-guard
    the subquery column (or use a null-rejecting predicate on it), so a
    future NULL in real data cannot flip the null-aware NOT IN while
    the Spark anti-join stays put."""
    import re

    offenders = []
    for name, sql in Q.ORACLE_SQL.items():
        for m in re.finditer(r"NOT IN\s*\(\s*SELECT\b", sql, re.IGNORECASE):
            # the subquery text up to its closing paren (no nesting in
            # our oracles' NOT-IN subqueries)
            depth, i = 1, m.end() - len("SELECT") - 0
            start = sql.index("(", m.start())
            i = start + 1
            while depth and i < len(sql):
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
                i += 1
            sub = sql[start:i].upper()
            if "IS NOT NULL" not in sub and "%" not in sub:
                offenders.append((name, sub[:120]))
    assert not offenders, (
        f"NOT-IN subqueries without a null guard: {offenders}"
    )
