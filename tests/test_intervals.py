"""Bucketed interval-overlap join — exact-set equivalence with the
naive range predicate, closed-interval edges, multi-bucket dedup, and
the no-nested-loop plan guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F

from featurebase_spark.operators.intervals import (
    concurrent_session_pairs,
    interval_overlap_join,
)

W = 10  # bucket width for the unit cases


def _iv(spark, rows):
    return spark.createDataFrame(rows, "id long, s_us long, e_us long")


def _pairs(df, extra=None):
    out = interval_overlap_join(df, df, "s_us", "e_us", W, extra_pred=extra)
    return {
        (r["id_a"], r["id_b"])
        for r in out.select("id_a", "id_b").collect()
    }


def test_matches_naive_range_join(spark):
    """The bucketed join enumerates EXACTLY the naive inequality join's
    pair set — intervals of wildly different spans, bucket-straddling
    starts, and duplicates of the same range."""
    rows = [
        (1, 0, 5),
        (2, 3, 42),      # spans 5 buckets
        (3, 40, 41),
        (4, 100, 200),   # far away, long
        (5, 150, 151),
        (6, 7, 9),
        (7, 0, 5),       # duplicate of 1
    ]
    df = _iv(spark, rows)
    got = _pairs(df)
    naive = {
        (a, b)
        for (a, sa, ea) in rows
        for (b, sb, eb) in rows
        if sa <= eb and sb <= ea
    }
    assert got == naive
    # sanity: the naive set contains a multi-bucket overlap and a
    # same-interval duplicate
    assert (2, 3) in naive and (1, 7) in naive


def test_closed_interval_edges(spark):
    """Touching endpoints DO overlap (closed intervals); one-unit apart
    does not — including when the touch sits exactly on a bucket edge."""
    df = _iv(
        spark,
        [(1, 0, 10), (2, 10, 15), (3, 16, 20), (4, 21, 30)],
    )
    got = _pairs(df, extra=F.col("id_a") < F.col("id_b"))
    assert got == {(1, 2)}  # 10 touches 10 (a bucket boundary); 15<16; 20<21


def test_multibucket_pair_emitted_once(spark):
    """Two long intervals sharing many buckets still produce exactly ONE
    joined row (the max-start bucket rule, not a distinct pass)."""
    df = _iv(spark, [(1, 0, 95), (2, 5, 90)])
    out = interval_overlap_join(
        df, df, "s_us", "e_us", W, extra_pred=F.col("id_a") < F.col("id_b")
    )
    rows = out.collect()
    assert len(rows) == 1 and (rows[0]["id_a"], rows[0]["id_b"]) == (1, 2)


def test_null_and_inverted_intervals_never_match(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (2, None, 50), (3, 50, None), (4, 60, 40)],
        "id long, s_us long, e_us long",
    )
    got = _pairs(df, extra=F.col("id_a") < F.col("id_b"))
    assert got == set()  # only id=1 is valid; no self-pairs under <


def test_plan_no_nested_loop(spark, tables):
    """The concurrent-sessions query must plan hash/sort-merge joins on
    the bucket key — never CartesianProduct / BroadcastNestedLoopJoin."""
    out = concurrent_session_pairs(tables["events"])
    p = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
