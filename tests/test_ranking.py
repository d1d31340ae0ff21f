"""Integer-exact BM25 (pipeline/ranking.py) — formula semantics,
determinism, validation, and the zero-shuffle/TakeOrdered plan shape."""

from __future__ import annotations

import pytest

from featurebase_spark.pipeline.ranking import bm25_topk


def _score_py(tf, dl, n, tdl, df, k1=1200, b=750):
    """Pure-Python replay of one term's integer score."""
    if tf == 0:
        return 0
    idf = (n - df) * 1_000_000 // (df + 1)
    dl_norm = 1000 - b + (b * dl * n) // tdl
    denom = tf * 1000 + k1 * dl_norm // 1000
    return tf * (k1 + 1000) * idf // denom


def test_matches_python_replay(spark):
    rows = [
        (1, "x x x y"),       # tf(x)=3, dl=4
        (2, "x y z z"),       # tf(x)=1
        (3, "y z"),           # no x
        (4, "x"),             # tf=1, shortest doc → higher tf norm
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(df, "doc_id", "text", ["x"], k=10).collect()}
    n, tdl = 4, 4 + 4 + 2 + 1
    dfx = 3
    exp = {
        1: _score_py(3, 4, n, tdl, dfx),
        2: _score_py(1, 4, n, tdl, dfx),
        4: _score_py(1, 1, n, tdl, dfx),
    }
    assert got == exp
    # shorter doc with same tf outranks the longer one (length norm)
    assert got[4] > got[2]
    # higher tf outranks (saturating, but monotone)
    assert got[1] > got[2]


def test_rare_term_outweighs_common(spark):
    """The rational idf preserves the BM25 property that a rare term's
    match is worth more than a ubiquitous one's."""
    rows = [(i, "common rare" if i == 0 else "common pad") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, "doc_id", "text", ["rare", "common"], k=1).collect()
    assert top[0]["doc_id"] == 0


def test_zero_score_dropped_and_tiebreak(spark):
    rows = [(2, "a b"), (1, "a b"), (3, "zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r["doc_id"]
           for r in bm25_topk(df, "doc_id", "text", ["a"], k=10).collect()]
    assert got == [1, 2]  # equal scores → id ASC; non-matching dropped


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [], 5)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["x"], 0)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["it's"], 5)


def test_plan_zero_shuffle_scoring(tables):
    """Corpus scoring never hash-shuffles: the only exchanges are the
    1-row stats aggregate (SinglePartition) and its broadcast; the
    top-k is a TakeOrderedAndProject (per-partition heaps)."""
    docs = tables["documents"]
    plan = (
        bm25_topk(docs, "doc_id", "text", ["vector", "merge"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
