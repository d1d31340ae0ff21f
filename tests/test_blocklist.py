"""pipeline/blocklist.py — bloom-pruned exact blocklist filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.blocklist import (
    blocklist_filter,
    build_bloom_bitmap,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(3000)], "doc_id long, t string"
    ).repartition(8)


@pytest.fixture(scope="module")
def blocked(spark):
    return spark.createDataFrame(
        [(i,) for i in range(0, 3000, 7)], "doc_id long"
    )


def _expected():
    return sorted(i for i in range(3000) if i % 7 != 0)


@pytest.mark.parametrize("m,k", [(1 << 9, 3), (1 << 12, 4), (1 << 18, 5)])
def test_blocklist_exact_at_any_bloom_sizing(corpus, blocked, m, k):
    """Correctness must not depend on the bitmap: an undersized bloom
    (2^9 bits for 429 keys ⇒ saturated, nearly all rows are
    candidates) still yields the exact anti-join."""
    got = sorted(
        r["doc_id"]
        for r in blocklist_filter(
            corpus, blocked, "doc_id", m_bits=m, k_hashes=k
        ).collect()
    )
    assert got == _expected()


def test_blocklist_no_false_negatives_in_bitmap(spark, blocked):
    """Every blocklisted key's k bits are set (the invariant exactness
    rests on): probing the built bitmap with the blocklist itself must
    flag every row as a candidate."""
    m, k = 1 << 14, 4
    bitmap = build_bloom_bitmap(blocked, "doc_id", m, k)
    # re-probe via the operator: blocklist ∖ blocklist = ∅
    out = blocklist_filter(
        blocked.withColumn("x", F.lit(1)), blocked, "doc_id", m, k
    )
    assert out.count() == 0
    assert len(bitmap) == m // 8


def test_blocklist_plan_no_blocklist_shuffle(corpus, blocked):
    """Scale shape: the blocklist side joins only through broadcasts —
    no SortMergeJoin / no exchange of the blocklist relation."""
    out = blocklist_filter(corpus, blocked, "doc_id", 1 << 14, 4)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p  # semi + anti verify


def test_blocklist_empty_blocklist(corpus, spark):
    empty = spark.createDataFrame([], "doc_id long")
    assert blocklist_filter(corpus, empty, "doc_id", 1 << 10, 3).count() \
        == corpus.count()


def test_blocklist_string_keys(spark):
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(500)], "k string, v long"
    )
    bl = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 500, 3)], "k string"
    )
    got = sorted(r["k"] for r in
                 blocklist_filter(df, bl, "k", 1 << 11, 3).collect())
    assert got == sorted(f"k{i}" for i in range(500) if i % 3 != 0)


def test_bitmap_matches_python_xxhash_replica(spark):
    """Cross-check the engine-built bitmap against the repo's bit-exact
    Python xxhash64 replica (operators/writes.py): every key's k salted
    bit positions must be set — the no-false-negative invariant,
    verified hash-for-hash rather than end-to-end."""
    import random

    from featurebase_spark.operators.writes import xxhash64_bytes

    rng = random.Random(99)
    keys = [rng.randrange(10**12) for _ in range(300)]
    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    m, k_hashes = 1 << 13, 4
    bitmap = build_bloom_bitmap(kdf, "doc_id", m, k_hashes)
    signed = (1 << 63)
    for key in keys:
        for i in range(k_hashes):
            h = xxhash64_bytes(f"{i}:{key}".encode())
            # Spark xxhash64 is SIGNED; pmod maps negatives into [0, m)
            hs = h - (1 << 64) if h >= signed else h
            pos = hs % m  # python % == pmod for positive modulus
            assert bitmap[pos // 8] >> (pos % 8) & 1, (key, i)


def test_blocklist_shuffled_verify_matches(corpus, blocked):
    """broadcast_verify=False (hit-heavy escape hatch) must produce the
    identical exact result through shuffled semi/anti joins."""
    a = sorted(r["doc_id"] for r in blocklist_filter(
        corpus, blocked, "doc_id", 1 << 12, 4).collect())
    b = sorted(r["doc_id"] for r in blocklist_filter(
        corpus, blocked, "doc_id", 1 << 12, 4,
        broadcast_verify=False).collect())
    assert a == b == _expected()
