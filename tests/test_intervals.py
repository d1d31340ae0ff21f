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


# --- r12 skew hardening (VERDICT r11 ask #3) -------------------------------


def _skewed(spark):
    """60 intervals alive in ONE bucket (density² hot spot) plus a
    sparse tail — the timeline shape where a production burst bites."""
    rows = [(i, 2, 8) for i in range(60)]          # all in bucket 0
    rows += [(100 + i, 100 + 20 * i, 105 + 20 * i) for i in range(10)]
    return _iv(spark, rows)


def test_salt_mode_exact_same_pairs(spark):
    """skew='salt' returns EXACTLY the unsalted pair set — 100% recall,
    no duplicates — on a fixture whose hot bucket trips the threshold."""
    df = _skewed(spark)
    base = _pairs(df)
    salted = interval_overlap_join(
        df, df, "s_us", "e_us", W,
        skew="salt", skew_threshold=50, salt_factor=4,
    )
    got = [
        (r["id_a"], r["id_b"])
        for r in salted.select("id_a", "id_b").collect()
    ]
    assert len(got) == len(set(got))  # no duplicate pair rows
    assert set(got) == base
    # the hot bucket really is hot: 60 > threshold=50
    assert sum(1 for (a, b) in base if a < 60 and b < 60) == 60 * 60


def test_salt_mode_cold_input_unchanged(spark):
    """Below the threshold nothing is replicated and the pair set is
    identical to the plain join."""
    df = _iv(spark, [(1, 0, 5), (2, 3, 9), (3, 20, 25)])
    plain = _pairs(df)
    salted = interval_overlap_join(
        df, df, "s_us", "e_us", W,
        skew="salt", skew_threshold=50, salt_factor=4,
    )
    assert {
        (r["id_a"], r["id_b"])
        for r in salted.select("id_a", "id_b").collect()
    } == plain


def test_error_mode_sentinel(spark):
    """skew='error' refuses with per-bucket density stats (the
    heavy-hitters sentinel posture), and passes when under threshold."""
    import pytest

    df = _skewed(spark)
    with pytest.raises(ValueError, match="hot buckets exceed"):
        interval_overlap_join(
            df, df, "s_us", "e_us", W, skew="error", skew_threshold=50
        )
    ok = interval_overlap_join(
        df, df, "s_us", "e_us", W, skew="error", skew_threshold=10_000
    )
    assert {
        (r["id_a"], r["id_b"])
        for r in ok.select("id_a", "id_b").collect()
    } == _pairs(df)


def test_auto_bucket_width(spark):
    """bucket_width='auto' derives the median span and produces the
    same exact pair set."""
    from featurebase_spark.operators.intervals import derive_bucket_width

    df = _iv(spark, [(i, 10 * i, 10 * i + 6) for i in range(30)])
    assert derive_bucket_width(df, df, "s_us", "e_us") == 6
    auto = interval_overlap_join(df, df, "s_us", "e_us", "auto")
    naive = {
        (r["id_a"], r["id_b"])
        for r in auto.select("id_a", "id_b").collect()
    }
    assert naive == _pairs(df)
