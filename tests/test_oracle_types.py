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
