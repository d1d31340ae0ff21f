"""pipeline/frequent.py — exact distributed heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.frequent import (
    heavy_hitter_tokens,
    heavy_hitters,
    local_item_counts,
)


@pytest.fixture(scope="module")
def items(spark):
    # 10_000 items: 'hot' 600x, 'warm' 120x, long tail of uniques
    rows = (
        [("hot",)] * 600
        + [("warm",)] * 120
        + [(f"u{i}",) for i in range(9280)]
    )
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_heavy_hitters_exact_vs_naive(items):
    got = {
        r["item"]: r["freq"]
        for r in heavy_hitters(items, "item", min_share=0.01).collect()
    }
    naive = {
        r["item"]: r["cnt"]
        for r in items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 100)  # ceil(0.01 * 10_000)
        .collect()
    }
    assert got == naive == {"hot": 600, "warm": 120}


def test_heavy_hitters_superset_cut_is_lossless(items):
    """Every threshold must yield EXACTLY the naive answer — the
    pigeonhole candidate cut can over-generate but never under."""
    n = items.count()
    for share in (0.002, 0.005, 0.012, 0.06):
        import math

        thr = max(1, math.ceil(share * n))
        got = {
            (r["item"], r["freq"])
            for r in heavy_hitters(items, "item", share).collect()
        }
        naive = {
            (r["item"], r["cnt"])
            for r in items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= thr)
            .collect()
        }
        assert got == naive, share


def test_heavy_hitters_min_count_contract(items):
    got = {
        r["item"]
        for r in heavy_hitters(items, "item", min_count=121).collect()
    }
    assert got == {"hot"}
    got = {
        r["item"]
        for r in heavy_hitters(items, "item", min_count=120).collect()
    }
    assert got == {"hot", "warm"}


def test_heavy_hitters_partitioning_invariant(items):
    a = sorted(
        (r["item"], r["freq"])
        for r in heavy_hitters(
            items.repartition(1), "item", 0.01
        ).collect()
    )
    b = sorted(
        (r["item"], r["freq"])
        for r in heavy_hitters(
            items.repartition(17), "item", 0.01
        ).collect()
    )
    assert a == b


def test_heavy_hitters_empty_and_validation(spark, items):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", 0.5).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(items, "item", min_share=0.0)


def test_local_item_counts_no_exchange(items):
    """Phase 1 is map-side only: no Exchange in the candidate plan."""
    cand = local_item_counts(items.repartition(8), "item").where(
        F.col("local_count") >= 3
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    body = plan.split("AdaptiveSparkPlan")[-1]
    # the only exchange allowed is the fixture's own repartition
    assert body.count("Exchange") <= 1, body


def test_heavy_hitters_verify_broadcasts_candidates(items):
    plan = (
        heavy_hitters(items, "item", 0.01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_local_item_counts_markers_count_nonempty_partitions(items):
    surv = local_item_counts(items.repartition(6), "item", with_markers=True)
    sentinels = surv.where(F.col("item").isNull()).collect()
    assert len(sentinels) == 6  # 10k rows → every partition non-empty
    assert all(r["local_count"] == -1 for r in sentinels)
    # real rows never collide with the sentinel encoding
    assert surv.where(F.col("item").isNotNull() & (F.col("local_count") < 1)).count() == 0


def test_heavy_hitters_bound_enforced_on_repartitioned_frame(items, monkeypatch):
    """Fabricate the hazard: the frame reports 1 planned partition while
    8 partitions actually hold data — the operator must refuse instead
    of silently cutting candidates with an 8x-too-tight local threshold."""
    try:  # pyspark 4: the concrete class owns the .rdd property
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    many = items.repartition(8)

    class _FakeRDD:
        def getNumPartitions(self):
            return 1

    monkeypatch.setattr(DataFrame, "rdd", property(lambda self: _FakeRDD()))
    with pytest.raises(RuntimeError, match="pigeonhole bound violated"):
        heavy_hitters(many, "item", min_share=0.01)


def test_heavy_hitters_one_pass_matches_two_pass_and_naive(items):
    """The r13 one-pass share_permille path (weighted per-partition cut,
    N from sentinels) must return EXACTLY the legacy two-pass result and
    the naive full count, at several thresholds and partitionings."""
    n = items.count()
    for sp in (1, 12, 60, 200):
        mc = max(1, (sp * n + 999) // 1000)
        one = sorted(
            (r["item"], r["freq"])
            for r in heavy_hitters(items, "item", share_permille=sp).collect()
        )
        two = sorted(
            (r["item"], r["freq"])
            for r in heavy_hitters(
                items, "item", total=n, min_count=mc
            ).collect()
        )
        naive = sorted(
            (r["item"], r["cnt"])
            for r in items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= mc)
            .collect()
        )
        assert one == two == naive, sp
    for parts in (1, 17):
        got = sorted(
            (r["item"], r["freq"])
            for r in heavy_hitters(
                items.repartition(parts), "item", share_permille=12
            ).collect()
        )
        assert got == [("hot", 600), ("warm", 120)], parts


def test_heavy_hitters_one_pass_sentinels_recover_total(items):
    """local_share mode: sentinel rows carry -n_p and sum to the raw row
    count; real rows never collide with the sentinel encoding."""
    surv = local_item_counts(
        items.repartition(6), "item", local_share=(12, 1000)
    )
    rows = surv.collect()
    sentinels = [r for r in rows if r["item"] is None]
    assert sum(-r["local_count"] for r in sentinels) == 10_000
    assert all(r["local_count"] >= 1 for r in rows if r["item"] is not None)
    # the weighted cut bounds per-partition emissions by 1000/sp
    per_part_cap = 1000 // 12 + 1
    assert len(rows) - len(sentinels) <= 6 * per_part_cap


def test_heavy_hitters_one_pass_validation_and_edges(spark, items):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", share_permille=10).count() == 0
    # sp above 1000 → threshold > N → empty, same as the legacy path
    assert heavy_hitters(items, "item", share_permille=1001).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(items, "item", share_permille=0)
    with pytest.raises(ValueError):
        heavy_hitters(items, "item", share_permille=10, min_count=5)


def test_heavy_hitter_tokens_degenerate_permille_zero(spark):
    """sp=0 keeps the legacy derivation: threshold bottoms out at 1, so
    every distinct token qualifies (the TVF door accepts any \\d+)."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "c a")], "doc_id long, text string"
    )
    got = {
        r["token"]: r["freq"]
        for r in heavy_hitter_tokens(docs, "text", share_permille=0).collect()
    }
    assert got == {"a": 3, "b": 1, "c": 1}


def test_heavy_hitter_tokens_matches_python(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a c  a"),  # double space → empty-string token
            (2, "b a d d a"),
            (3, "a e"),
        ],
        "doc_id long, text string",
    )
    # N = 6 + 5 + 2 = 13 tokens incl. one empty; ceil(200*13/1000) = 3
    got = {
        r["token"]: r["freq"]
        for r in heavy_hitter_tokens(
            docs, "text", share_permille=200
        ).collect()
    }
    assert got == {"a": 6}


def test_heavy_hitter_tokens_literal_delimiter_and_null_text(spark):
    """'.' must split literally (string_split semantics), not as a Java
    regex; NULL text must not skew N via size(split(NULL)) = -1."""
    docs = spark.createDataFrame(
        [(1, "a.b.a"), (2, "a.c"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["token"]: r["freq"]
        for r in heavy_hitter_tokens(
            docs, "text", delimiter=".", share_permille=500
        ).collect()
    }
    # N = 3 + 2 = 5 tokens; ceil(500*5/1000) = 3 → only 'a' (freq 3).
    # A regex '.' would have split every char away (all-empty tokens);
    # counting the NULL row would have set N = 4 and threshold 2.
    assert got == {"a": 3}


def test_deterministic_shuffle_stable_and_seeded(spark):
    from featurebase_spark.pipeline.sampling import deterministic_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    ).repartition(7)
    a = [r["doc_id"] for r in deterministic_shuffle(df, seed=1).collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(df, seed=1).collect()]
    c = [r["doc_id"] for r in deterministic_shuffle(df, seed=2).collect()]
    assert a == b  # reproducible across runs/partitionings
    assert a != c  # per-epoch reshuffle by seed
    assert sorted(a) == list(range(500))  # a permutation, nothing lost
    assert a != list(range(500))  # actually shuffled


def test_novel_bigram_ratio_hand_computed(spark):
    """Vocab threshold ceil(300·N/1000), type-level novelty in exact ppm,
    short-doc whole-text fallback."""
    from featurebase_spark.pipeline.frequent import novel_bigram_ratio

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),  # occurrences: "a b"x2, "b a"; distinct 2
            (2, "a b c"),    # "a b", "b c"
            (3, "z"),        # short → whole-text gram "z"
            (4, "a b"),      # "a b"
            (5, None),       # excluded
        ],
        "doc_id long, text string",
    )
    # N = 7 occurrences → thr = (300·7+999)//1000 = 3; only "a b" (4) is
    # in-vocab
    got = {
        r["doc_id"]: (r["n_grams"], r["novel_ppm"])
        for r in novel_bigram_ratio(docs, share_permille=300).collect()
    }
    assert got == {
        1: (2, 500_000),
        2: (2, 500_000),
        3: (1, 1_000_000),
        4: (1, 0),
    }


def test_novel_bigram_ratio_zero_shuffle_scoring(spark):
    """Phase B (scoring) is a pure projection: no Exchange in its plan."""
    from featurebase_spark.pipeline.frequent import novel_bigram_ratio

    docs = spark.createDataFrame(
        [(i, "w x y z") for i in range(20)], "doc_id long, text string"
    )
    out = novel_bigram_ratio(docs, share_permille=500)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
