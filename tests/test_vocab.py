"""BPE vocabulary induction (pipeline/vocab.py) — pair statistics,
merge-fold semantics, and the bpe_learn greedy loop vs a pure-Python
replay (the same cross-implementation guard the HLL sketch uses)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.vocab import (
    bpe_learn,
    bpe_pair_counts,
    word_counts,
)


def _py_bpe(texts: list[str], merges: int) -> list[tuple[str, str, int]]:
    """Reference implementation: greedy BPE with lexicographic tiebreak
    and left-to-right non-overlapping merge application."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    segs = {w: [c for c in w] for w in words}
    out = []
    for _ in range(merges):
        pairs: Counter = Counter()
        for w, seg in segs.items():
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] += words[w]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((a, b, n))
        for w, seg in segs.items():
            new, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(seg[i])
                    i += 1
            segs[w] = new
    return out


def test_word_counts(spark):
    df = spark.createDataFrame(
        [("a b  a",), ("b c",), (None,)], "text string"
    )
    got = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert got == {"a": 2, "b": 2, "c": 1}  # empties from '  ' dropped


def test_pair_counts_weighted_by_word_freq(spark):
    # 'abc' ×3, 'bc' ×1 → ab:3, bc:4
    df = spark.createDataFrame(
        [("abc abc",), ("abc bc",)], "text string"
    )
    got = [tuple(r) for r in bpe_pair_counts(df, "text", 10).collect()]
    assert got == [("bc", 4), ("ab", 3)]


def test_pair_counts_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_pair_counts(df, "text", 0)
    with pytest.raises(ValueError):
        bpe_learn(df, "text", 0)


def test_merge_fold_nonoverlapping(spark):
    """'aaa' under merge (a,a) → [aa, a]: left-to-right, the merged
    symbol never re-merges with the next raw char in the same pass."""
    merges = bpe_learn(
        spark.createDataFrame([("aaa",)], "text string"), "text", 1
    )
    assert merges == [("a", "a", 2)]  # 2 adjacent pairs in 'aaa'
    # second merge: segments are [aa, a] → pair (aa, a) count 1
    merges = bpe_learn(
        spark.createDataFrame([("aaa",)], "text string"), "text", 2
    )
    assert merges == [("a", "a", 2), ("aa", "a", 1)]


def test_learn_matches_python_replay(spark, tables):
    """5 greedy merges over real corpus text must equal the pure-Python
    BPE — argmax values, tiebreaks, and application order all agree."""
    docs = tables["documents"].limit(80)
    texts = [r["text"] for r in docs.select("text").collect()
             if r["text"] is not None]
    assert bpe_learn(docs, "text", 5) == _py_bpe(texts, 5)


def test_learn_quote_safe(spark):
    """Merged symbols containing quotes must not break the fold expr."""
    df = spark.createDataFrame([("d'x d'x d'y",)], "text string")
    merges = bpe_learn(df, "text", 2)
    assert merges[0] == ("d", "'", 3)
    assert merges[1] == ("d'", "x", 2)


def test_pair_scan_is_single_shuffle(spark, tables):
    """The pair aggregation shuffles (pair, partial count) only — the
    text column feeds ONE word-count exchange and never reappears."""
    docs = tables["documents"]
    plan = (
        bpe_pair_counts(docs, "text", 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
