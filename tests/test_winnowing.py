"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03) —
the containment-detection guarantee, edge cases, and the scale caps."""

from __future__ import annotations

import pyspark.sql.functions as F

from featurebase_spark.pipeline.dedup import (
    winnowing_containment_pairs,
    winnowing_fingerprint_table,
)

K, W = 4, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_guarantee_shared_run_detected(spark):
    """The paper's guarantee: any two docs sharing >= w+k-1 consecutive
    tokens share at least one fingerprint — here a 7-token run planted
    inside two otherwise-disjoint documents."""
    run = "the quick brown fox jumps over fences"
    df = _docs(
        spark,
        [
            (1, f"alpha beta gamma {run} delta epsilon"),
            (2, f"one two three four five {run} six seven eight nine"),
            (3, "totally unrelated text with no overlap at all here"),
        ],
    )
    fp = winnowing_fingerprint_table(df, k=K, w=W)
    shared = (
        fp.where(F.col("doc_id").isin(1, 2))
        .groupBy("fp")
        .count()
        .where(F.col("count") == 2)
        .count()
    )
    assert shared >= 1
    pairs = winnowing_containment_pairs(df, k=K, w=W, min_shared=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_containment_asymmetric_sizes(spark):
    """A small doc quoted verbatim inside a much larger one is found —
    the case whole-doc resemblance sketches dilute."""
    quote = "to be or not to be that is the question"
    filler = " ".join(f"tok{i}" for i in range(300))
    df = _docs(spark, [(10, quote), (11, f"{filler} {quote} {filler}")])
    pairs = winnowing_containment_pairs(df, k=K, w=W, min_shared=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(10, 11)}


def test_short_and_null_docs(spark):
    """Docs with < k tokens fingerprint the whole token string (so exact
    short duplicates still pair); NULL text rows drop out entirely."""
    df = _docs(
        spark,
        [(1, "tiny doc"), (2, "tiny doc"), (3, None), (4, "other short")],
    )
    fp = winnowing_fingerprint_table(df, k=K, w=W)
    assert fp.where(F.col("doc_id") == 3).count() == 0
    per_doc = {
        r["doc_id"]: r["count"]
        for r in fp.groupBy("doc_id").count().collect()
    }
    assert per_doc == {1: 1, 2: 1, 4: 1}
    pairs = winnowing_containment_pairs(df, k=K, w=W, min_shared=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_sketch_is_subset_and_denser_windows_shrink_it(spark):
    """Selected fingerprints are a subset of the doc's gram hashes, and
    a larger window selects fewer of them (density ~ 2/(w+1))."""
    text = " ".join(f"w{i % 13}x{i % 7}" for i in range(200))
    df = _docs(spark, [(1, text)])
    n_small = winnowing_fingerprint_table(df, k=K, w=2).count()
    n_big = winnowing_fingerprint_table(df, k=K, w=16).count()
    assert 0 < n_big < n_small


def test_max_df_cap_drops_boilerplate_fingerprints(spark):
    """A fingerprint present in more than max_df docs is a stop
    fingerprint: it must not generate pairs (the join-bucket bound)."""
    boiler = "all rights reserved copyright two thousand twenty four"
    rows = [(i, boiler) for i in range(6)]
    df = _docs(spark, rows)
    # six identical docs: every fingerprint has df=6; a cap of 5 drops
    # them all, so no pair survives (the join-bucket bound in action)
    pairs = winnowing_containment_pairs(
        df, k=K, w=W, min_shared=1, max_df=5
    ).count()
    assert pairs == 0
    # with the cap relaxed the boilerplate pairs everything
    pairs_uncapped = winnowing_containment_pairs(
        df, k=K, w=W, min_shared=1, max_df=100
    ).count()
    assert pairs_uncapped == 15  # C(6,2)


def test_plan_zero_shuffle_sketch_and_no_cartesian(spark, tables):
    """The fingerprint sketch is a pure projection (no exchange before
    the explode), and the pair join is a hash join on fp — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    docs = tables["documents"]
    fp = winnowing_fingerprint_table(docs)
    p = fp._jdf.queryExecution().explainString(
        fp.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "hashpartitioning(" not in p, p
    pairs = winnowing_containment_pairs(docs)
    p2 = pairs._jdf.queryExecution().explainString(
        pairs.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoopJoin" not in p2
