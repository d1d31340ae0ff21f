"""Round-10 ADVICE regressions — one test per advisory item.

1. vocab._merge_step_expr must escape backslashes BEFORE quotes
   (a raw-corpus '\\' symbol otherwise emits a malformed SQL literal).
2. sql._binop_type_guard must not treat 'FROM t1 a, t2 b' (aliased
   comma list) as single-table scope.
3. grouped.mad_outlier_stats must accept empty group_cols and odd
   (space/backtick-hostile) column names — the NULL-group predicate is
   built from Column objects, not interpolated SQL.
4. sql._Rewriter._clause must not stay stuck at 'where' after a
   projection-embedded subquery — an outer-projection RANGEQ still
   raises the reference's 'calling ranqeq() usage invalid'.
"""

from __future__ import annotations

import pytest

from featurebase_spark.operators.grouped import mad_outlier_stats
from featurebase_spark.pipeline.vocab import bpe_learn
from featurebase_spark.sql import fb_sql


def test_bpe_merge_backslash_safe(spark):
    """ADVICE r10 #1: merged symbols containing '\\' must fold
    correctly (escape backslash before quote)."""
    df = spark.createDataFrame([("a\\b a\\b a\\c",)], "text string")
    merges = bpe_learn(df, "text", 2)
    assert merges[0] == ("a", "\\", 3)
    assert merges[1] == ("a\\", "b", 2)


def test_binop_guard_skips_aliased_comma_list(spark):
    """ADVICE r10 #2: 'FROM t1 a, t2 b' is multi-table — the guard
    must bail, not raise a spurious single-table binop error when an
    unqualified column name collides across the two tables."""
    spark.createDataFrame([(1, 10)], "_id LONG, a LONG").createOrReplaceTempView(
        "bga_t1"
    )
    spark.createDataFrame([(1, "x")], "_id LONG, a STRING").createOrReplaceTempView(
        "bga_t2"
    )
    rows = fb_sql(
        spark,
        "select t1.a + t1._id as s from bga_t1 t1, bga_t2 t2 "
        "where t1._id = t2._id",
    ).collect()
    assert [r["s"] for r in rows] == [11]


def test_binop_guard_still_fires_single_table(spark):
    """The conservative bail must not disable the guard for the true
    single-table shape it exists for."""
    spark.createDataFrame(
        [(1, 10, "x")], "_id LONG, a LONG, s STRING"
    ).createOrReplaceTempView("bga_t3")
    with pytest.raises(ValueError, match="not equatable"):
        fb_sql(spark, "select a = s from bga_t3")


def test_mad_outliers_empty_groups_and_odd_names(spark):
    """ADVICE r10 #3: empty group_cols (global stats) and column names
    hostile to string-interpolated predicates both work."""
    df = spark.createDataFrame(
        [(i, i % 3, (i * 7) % 100) for i in range(50)],
        "`odd name` long, g long, v long",
    )
    rows = mad_outlier_stats(df, [], "v").collect()
    assert len(rows) == 1
    assert rows[0]["n_rows"] == 50 and rows[0]["med"] == 42
    by_g = mad_outlier_stats(
        df.withColumnRenamed("g", "g x"), ["g x"], "v"
    ).collect()
    assert sorted((r["g x"], r["n_rows"]) for r in by_g) == [
        (0, 17),
        (1, 17),
        (2, 16),
    ]


def test_rangeq_invalid_after_projection_subquery(spark):
    """ADVICE r10 #4: a subquery's WHERE must not leak clause context —
    RANGEQ in the OUTER projection still raises, and a genuine
    WHERE-clause RANGEQ after a projection subquery still compiles."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(
        spark,
        "create table tq_advice_r10 (_id id, i1 int min 0 max 1000, "
        "ss1 stringsetq timequantum 'YMD')",
        catalog=cat,
    )
    try:
        with pytest.raises(ValueError, match="usage invalid"):
            fb_sql(
                spark,
                "select (select max(a.i1) from tq_advice_r10 a "
                "where a.i1 > 0), "
                "rangeq(b.ss1, '2022-01-02T00:00:00Z', null) "
                "from tq_advice_r10 b",
                catalog=cat,
            )
        fb_sql(
            spark,
            "select b._id from tq_advice_r10 b "
            "where rangeq(b.ss1, '2022-01-02T00:00:00Z', null)",
            catalog=cat,
        )
    finally:
        cat.drop_table("tq_advice_r10")
