"""Trigram-accelerated LIKE (pipeline/trigram.py) — exactness vs the
naive scan, pruning guarantees, and the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.trigram import (
    build_trigram_postings,
    like_contains,
    required_trigrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the big vector table"),
        (2, "big vectors only"),          # contains 'big vector'
        (3, "vector big"),                # all trigrams of 'big vector'? no
        (4, "a bigger vector"),           # 'big vector' trigrams partial
        (5, None),
        (6, "xy"),                        # shorter than a trigram
        (7, "big vector"),                # exact
        (8, "contains big  vector"),      # double space — NOT a match
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_required_trigrams():
    assert required_trigrams("abcd") == ["abc", "bcd"]
    assert required_trigrams("aaaa") == ["aaa"]  # deduped
    assert required_trigrams("ab") == []


def test_matches_naive_scan(docs):
    got = sorted(
        r["doc_id"]
        for r in like_contains(docs, "doc_id", "text", "big vector").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("text").contains("big vector")).collect()
    )
    assert got == want == [1, 2, 7]


def test_short_literal_falls_back(docs):
    got = sorted(
        r["doc_id"]
        for r in like_contains(docs, "doc_id", "text", "xy").collect()
    )
    assert got == [6]


def test_wildcards_rejected(docs):
    with pytest.raises(ValueError):
        like_contains(docs, "doc_id", "text", "big%vector")


def test_postings_distinct_per_doc(docs):
    p = build_trigram_postings(docs, "doc_id", "text")
    # 'aaaa' style repeats collapse: doc 7 'big vector' has 8 distinct
    # trigrams, one posting row each
    n = p.where(F.col("doc_id") == 7).count()
    assert n == len(required_trigrams("big vector")) == 8
    dup = (
        p.groupBy("doc_id", "trigram").count().where(F.col("count") > 1).count()
    )
    assert dup == 0


def test_prebuilt_postings_and_plan(docs):
    """Probe with a prebuilt index under each candidate-join strategy
    (r8 verdict "What's wrong #1"): forced broadcast plants the hint,
    forced shuffle NEVER broadcasts (the 100 TB-safe path for a
    non-selective literal), and the default leaves the choice to AQE's
    runtime size check (which on this tiny corpus lands broadcast)."""
    postings = build_trigram_postings(docs, "doc_id", "text")

    forced = like_contains(
        docs, "doc_id", "text", "big vector", postings=postings,
        broadcast=True,
    )
    p = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert sorted(r["doc_id"] for r in forced.collect()) == [1, 2, 7]

    shuffled = like_contains(
        docs, "doc_id", "text", "big vector", postings=postings,
        broadcast=False,
    )
    assert sorted(r["doc_id"] for r in shuffled.collect()) == [1, 2, 7]
    # post-execution adaptive plan: the semi join must NOT be broadcast
    p = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in p, p
    assert "ShuffledHashJoin" in p or "SortMergeJoin" in p, p

    auto = like_contains(
        docs, "doc_id", "text", "big vector", postings=postings,
    )
    assert sorted(r["doc_id"] for r in auto.collect()) == [1, 2, 7]
    # AQE's runtime stats pick broadcast for the tiny candidate side
    p = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p


def test_no_false_negatives_on_corpus(tables):
    """Sweep several literals on the real documents table: accelerated
    result == naive scan, including 0-hit literals."""
    docs = tables["documents"]
    for lit in ("big vector", "merge batch part", "zzz-not-there"):
        got = (
            like_contains(docs, "doc_id", "text", lit)
            .select("doc_id")
            .collect()
        )
        want = (
            docs.where(F.col("text").contains(lit)).select("doc_id").collect()
        )
        assert sorted(r["doc_id"] for r in got) == sorted(
            r["doc_id"] for r in want
        ), lit


def test_pattern_literals():
    from featurebase_spark.pipeline.trigram import pattern_literals

    assert pattern_literals("abc%def_g") == ["abc", "def", "g"]
    assert pattern_literals("%%__") == []
    assert pattern_literals("plain") == ["plain"]


def test_like_match_wildcards(docs):
    from featurebase_spark.pipeline.trigram import like_match

    cases = [
        "%big_vector%",      # _ matches the space
        "the %vector%",      # anchored prefix + skip
        "%vector",           # suffix
        "xy",                # no wildcard, no prunable fragment
        "%a%",               # fragment too short -> full scan
    ]
    for pat in cases:
        got = sorted(
            r["doc_id"]
            for r in like_match(docs, "doc_id", "text", pat).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in docs.where(F.col("text").like(pat)).collect()
        )
        assert got == want, pat


def test_like_match_backslash_literal(spark):
    """like.go parity (r8 ADVICE #2): every non-wildcard char — backslash
    included — is a literal byte. Under Spark's bare LIKE, '\\' is an
    escape char, so the prune (which treats it literally) and the verify
    could disagree; like_match neutralizes the escape, so a pattern
    containing '\\' matches exactly the texts containing that byte."""
    from featurebase_spark.pipeline.trigram import like_match

    rows = [
        (1, r"path\to\file"),     # contains backslashes
        (2, "path to file"),       # no backslash — must NOT match
        (3, r"xpath\to\filez"),   # contains the fragment inside
        (4, r"path\tofile"),      # missing the second '\'
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in like_match(
            docs, "doc_id", "text", r"%path\to\file%"
        ).collect()
    )
    assert got == [1, 3]
    # anchored form too (no leading %): only the exact-prefix docs
    got = sorted(
        r["doc_id"]
        for r in like_match(docs, "doc_id", "text", r"path\to%").collect()
    )
    assert got == [1, 4]


def test_like_match_corpus(tables):
    from featurebase_spark.pipeline.trigram import like_match

    docs = tables["documents"]
    for pat in ("the %big_vector%", "%merge batch%part%", "row %"):
        got = like_match(docs, "doc_id", "text", pat).count()
        want = docs.where(F.col("text").like(pat)).count()
        assert got == want, pat


def test_probe_fanout_cap_exact(spark):
    """max_probe_trigrams intersects only the k rarest posting lists —
    a weaker necessary condition, identical final rows (verify is
    exact). r12 probe cap, PERF_NOTES 'Round 12'."""
    from featurebase_spark.pipeline.trigram import (
        build_trigram_postings,
        like_contains,
        required_trigrams,
    )

    rows = [
        (i, f"the quick brown fox jumps over lazy dog {i}")
        for i in range(50)
    ] + [(100 + i, "the slow brown cat sits") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lit = "brown fox jumps"
    assert len(required_trigrams(lit)) > 4
    post = build_trigram_postings(df, "doc_id", "text")
    base = {r["doc_id"] for r in
            df.where(F.col("text").contains(lit)).collect()}
    capped = like_contains(
        df, "doc_id", "text", lit, postings=post, max_probe_trigrams=4
    )
    assert {r["doc_id"] for r in capped.collect()} == base
    # uncapped twin agrees too
    full = like_contains(df, "doc_id", "text", lit, postings=post)
    assert {r["doc_id"] for r in full.collect()} == base
