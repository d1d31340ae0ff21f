"""pipeline/sampling.py + pipeline/contamination.py unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.sampling import (
    hash_sample,
    hash_split,
    hash_uniform_hex,
    hex_threshold,
    temperature_mix,
    temperature_rates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark, tables):
    return tables["documents"]


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.25) == "40000000"
    assert hex_threshold(1.0) == "g"  # accept-all sentinel beats any hex
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_split_disjoint_exhaustive_and_proportioned(docs):
    out = hash_split(docs, "doc_id",
                     {"train": 0.75, "val": 0.125, "test": 0.125}, seed=42)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total  # every row in exactly one split
    # binomial tolerance on 500 docs
    assert abs(counts["train"] / total - 0.75) < 0.08
    assert abs(counts["val"] / total - 0.125) < 0.06
    assert abs(counts["test"] / total - 0.125) < 0.06


def test_hash_split_stable_under_corpus_growth(docs):
    """The property df.sample cannot give: a document's split never
    changes when the corpus grows — assignment depends on the key hash
    alone."""
    subset = docs.where(F.col("doc_id") < 100)
    full = {r["doc_id"]: r["split"]
            for r in hash_split(docs, "doc_id").collect()}
    sub = {r["doc_id"]: r["split"]
           for r in hash_split(subset, "doc_id").collect()}
    assert sub == {k: v for k, v in full.items() if k < 100}


def test_hash_sample_deterministic_and_seed_sensitive(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=1).collect()}
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=2).collect()}
    assert a == b  # re-run identical
    assert a != c  # different seed, different sample
    assert abs(len(a) / docs.count() - 0.3) < 0.08
    # nested rates: a lower-rate sample with the same seed is a subset
    d = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed=1).collect()}
    assert d <= a


def test_temperature_rates_upweight_small_sources(spark):
    """alpha=0.5: the small source's acceptance rate must exceed the
    large source's (the entire point of temperature mixing), and the
    expected kept size should approximate the target fraction."""
    rows = [(i, "big", 100) for i in range(900)] + [
        (i + 1000, "small", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    rates = {r["source"]: r for r in
             temperature_rates(df, "source", "n_chars", 0.5, 0.5).collect()}
    assert rates["small"]["rate"] > rates["big"]["rate"]
    assert 0 < rates["big"]["rate"] < 1
    # weights: w_small=sqrt(10000)=100, w_big=sqrt(90000)=300 → target
    # shares 12500/37500 of the 50000-char budget; the small source needs
    # rate 1.25 → capped at 1.0 and its lost 2500 chars are NOT
    # redistributed (documented), so expected kept = 47500 exactly
    assert rates["small"]["rate"] == 1.0
    assert rates["small"]["rate_hex"] == "g"
    # rate is the frozen threshold / 2^32, so it sits within one
    # threshold quantum (2^-32 ≈ 2.3e-10) of the ideal ratio
    assert abs(rates["big"]["rate"] - 37500 / 90000) < 2e-9
    exp = sum(min(1.0, rates[s]["rate"]) * rates[s]["src_size"]
              for s in rates)
    tot = sum(rates[s]["src_size"] for s in rates)
    assert abs(exp / tot - 0.475) < 2e-9


def test_temperature_mix_is_subset_and_deterministic(docs):
    kept1 = {r["doc_id"] for r in
             temperature_mix(docs, target_frac=0.4).select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in
             temperature_mix(docs, target_frac=0.4).select("doc_id").collect()}
    assert kept1 == kept2
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept1 < all_ids
    assert len(kept1) > 0


def test_contamination_hits_and_decontaminate(spark):
    from featurebase_spark.pipeline.contamination import (
        contamination_hits,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # has gram
            (2, "completely unrelated text with other words here"),
            (3, "prefix quick brown fox jumps over suffix pad pad"),  # has gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    hits = {r["doc_id"]: r["hits"]
            for r in contamination_hits(docs, bench, n=5).collect()}
    assert hits.get(1, 0) >= 1 and hits.get(3, 0) >= 1
    assert 2 not in hits  # zero-hit docs omitted from the sparse frame
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(docs, bench, n=5).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_sampling_plan_no_shuffle(docs):
    """hash_sample / hash_split are pure scan-side projections: the
    physical plan must contain no Exchange at all."""
    for df in (
        hash_sample(docs, "doc_id", 0.5),
        hash_split(docs, "doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_quantize_int8_roundtrip_properties(spark):
    from featurebase_spark.pipeline.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 4.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, codes 0
            (3, [-0.1, 0.1, -0.1, 0.1]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["scale"] == pytest.approx(4.0)
    assert out[1]["qvec"] == [32, -64, 16, 127]  # round(v/4*127)
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0, 0]
    assert all(-127 <= q <= 127 for q in out[3]["qvec"])
    # reconstruction error bounded by scale/254 per element
    for r in (out[1], out[3]):
        s = r["scale"]
        for v, q in zip([1.0, -2.0, 0.5, 4.0] if r is out[1] else
                        [-0.1, 0.1, -0.1, 0.1], r["qvec"]):
            assert abs(q * s / 127 - v) <= s / 254 + 1e-9


def test_pack_sequences_budget_boundaries(spark):
    from featurebase_spark.pipeline.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", 100) for i in range(1, 8)]  # 7 docs x 100 tokens
        + [(10, "t", 250), (11, "t", 250), (12, "t", 250)],
        "doc_id long, source string, n long",
    )
    out = {r["doc_id"]: r["pack_id"]
           for r in pack_sequences(df, "n", budget=300).collect()}
    # source s: before = 0,100,200,300,400,500,600 → packs 0,0,0,1,1,1,2
    assert [out[i] for i in range(1, 8)] == [0, 0, 0, 1, 1, 1, 2]
    # source t: independent numbering per partition
    assert [out[i] for i in (10, 11, 12)] == [0, 0, 1]


def test_pack_sequences_chunked_equals_single_window(spark):
    """Hierarchical prefix sum (the r6 scale fix): chunking a
    pathologically large SINGLE source into many order-aligned chunks
    must yield the exact pack assignment of the one-window formulation —
    the associativity invariance the oracle contract rests on."""
    from featurebase_spark.pipeline.sampling import (
        _order_aligned_chunk,
        pack_sequences,
    )

    rows = [(i, "only", 7 + (i * 13) % 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    multi = {r["doc_id"]: r["pack_id"]
             for r in pack_sequences(df, "n", budget=256,
                                     num_chunks=8).collect()}
    single = {r["doc_id"]: r["pack_id"]
              for r in pack_sequences(df, "n", budget=256,
                                      num_chunks=1).collect()}
    assert multi == single
    # the chunking genuinely splits the source (no silent fallback to
    # one task) ...
    chunks = (
        df.withColumn("__c", _order_aligned_chunk(df, "source", "doc_id", 8))
        .select("__c").distinct().count()
    )
    assert chunks > 1
    # ... and chunk ids are monotone in the (source, order) sort order
    seq = [
        r["__c"]
        for r in df.withColumn(
            "__c", _order_aligned_chunk(df, "source", "doc_id", 8)
        ).orderBy("source", "doc_id").select("__c").collect()
    ]
    assert seq == sorted(seq)


def test_pack_sequences_plan_has_per_chunk_windows(spark):
    """The big window must partition by (source, chunk) — bounded tasks —
    and the cross-chunk offsets must come back via broadcast join."""
    from featurebase_spark.pipeline.sampling import pack_sequences

    rows = [(i, "only", 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = pack_sequences(df, "n", budget=100, num_chunks=8)
    p = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in p.splitlines() if "windowspecdefinition" in l]
    assert any("__chunk" in l for l in win_lines), win_lines
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_stratified_sample_prefilter_matches_full_rank(docs):
    """The hash-threshold pre-filter + escalation loop must be invisible
    in the result: identical selection to the unfiltered window rank,
    even when the oversample factor is pathologically small (forcing the
    escalation path)."""
    from featurebase_spark.pipeline.sampling import stratified_sample

    full = {r["doc_id"] for r in
            stratified_sample(docs, "doc_id", "source", 4, seed=3,
                              oversample=0).select("doc_id").collect()}
    pre = {r["doc_id"] for r in
           stratified_sample(docs, "doc_id", "source", 4, seed=3,
                             oversample=8.0).select("doc_id").collect()}
    # oversample so small the pre-filter keeps ~nothing → every source
    # escalates to a full scan → still exact
    tiny = {r["doc_id"] for r in
            stratified_sample(docs, "doc_id", "source", 4, seed=3,
                              oversample=1e-6).select("doc_id").collect()}
    assert pre == full
    assert tiny == full


def test_stratified_sample_null_ids_terminate(spark):
    """NULL-id rows are unreachable (u < thr is NULL) — the target must
    count only reachable rows or the escalation loop hangs forever
    (r7 ADVICE high #2: confirmed hang with 3 non-null + 5 null ids)."""
    from featurebase_spark.pipeline.sampling import stratified_sample

    rows = [(1, "s"), (2, "s"), (3, "s")] + [(None, "s")] * 5
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", "source", 5).collect()
    )
    assert got == [1, 2, 3]  # all reachable rows, loop terminated

    # r8 ADVICE #4: the oversample<=0 (plain-rank) path must apply the
    # SAME NULL-id exclusion — before the fix it ranked NULL-hash rows
    # (NULLS FIRST → lowest ranks) and the two paths diverged
    full = sorted(
        (r["doc_id"] is None, r["doc_id"] or 0)
        for r in stratified_sample(
            df, "doc_id", "source", 5, oversample=0
        ).collect()
    )
    assert full == [(False, 1), (False, 2), (False, 3)]


def test_stratified_sample_plan_filters_before_window(docs):
    """The rank window's input is the threshold-filtered candidate set:
    the md5-hex filter sits BELOW the Window in the physical plan (the
    window never sees the full corpus)."""
    from featurebase_spark.pipeline.sampling import stratified_sample

    out = stratified_sample(docs, "doc_id", "source", 3, seed=9,
                            materialize=False)
    p = out._jdf.queryExecution().executedPlan().toString()
    lines = p.splitlines()
    win = min(i for i, l in enumerate(lines) if "Window" in l)
    # Catalyst fuses the hex compare into the broadcast-join condition:
    # the md5-vs-__thr predicate must sit BELOW the Window (tree prints
    # children below parents), so the window never sees the full corpus
    thr_lines = [
        i for i, l in enumerate(lines) if "md5" in l and "__thr" in l
    ]
    assert thr_lines and min(thr_lines) > win, p
    # bonus from the prefilter shape: Spark adds a map-side
    # WindowGroupLimit partial rank below the exchange
    assert "WindowGroupLimit" in p


def test_stratified_sample_balanced_and_deterministic(docs):
    from featurebase_spark.pipeline.sampling import stratified_sample

    out = stratified_sample(docs, "doc_id", "source", 3, seed=9,
                            materialize=False)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_sources = docs.select("source").distinct().count()
    assert len(counts) == n_sources
    assert all(v == 3 for v in counts.values())  # every source has >=3 docs
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, "doc_id", "source", 3, seed=9)
         .select("doc_id").collect()}
    assert a == b


def test_topk_per_group_matches_naive_and_prunes_mapside(docs, spark):
    from featurebase_spark.pipeline.sampling import topk_per_group

    out = topk_per_group(docs, "source", "n_chars", 2, desc=True,
                         tiebreak_col="doc_id")
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    naive = {
        (r["source"], r["doc_id"])
        for r in spark.sql("""
            SELECT source, doc_id FROM (
              SELECT source, doc_id, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY n_chars DESC, doc_id) rk
              FROM {d}) WHERE rk <= 2
        """, d=docs).collect()
    }
    assert got == naive
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p and "Partial" in p, p


def test_corpus_mix_plan_integer_contract(spark):
    """Quotas ∝ floor(sqrt(size)·1e4), budget split exactly, 4-epoch cap
    binds for tiny sources, epochs are exact ceil-thousandths."""
    import math

    from featurebase_spark.pipeline.sampling import corpus_mix_plan

    rows = [("big", 10_000), ("mid", 2_500), ("tiny", 4)]
    df = spark.createDataFrame(
        [(s, n) for s, n in rows for _ in (0,)], "source string, n_chars long"
    )
    budget = 8_000
    got = {
        r["source"]: (r["src_size"], r["quota"], r["epochs_x1000"])
        for r in corpus_mix_plan(df, budget, max_epochs_x1000=4000).collect()
    }
    w = {s: math.floor(math.sqrt(n) * 10_000) for s, n in rows}
    tot_w = sum(w.values())
    for s, n in rows:
        quota = min(budget * w[s] // tot_w, 4000 * n // 1000)
        epochs = (quota * 1000 + n - 1) // n
        assert got[s] == (n, quota, epochs), (s, got[s], (n, quota, epochs))
    # the cap actually binds on the tiny source (sanity of the scenario)
    assert got["tiny"][1] == 16 and got["tiny"][2] == 4000


def test_source_overlap_jaccard_matches_naive(spark):
    from featurebase_spark.pipeline.contamination import source_overlap_jaccard

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "s1"),       # grams: "a b c d e","b c d e f"
            (2, "a b c d e g h", "s2"),     # shares "a b c d e" with s1
            (3, "x y", "s3"),               # short doc → whole-text gram
            (4, "x y", "s1"),               # s1∩s3 via short gram
            (5, None, "s2"),                # NULL text ignored
        ],
        "doc_id long, text string, source string",
    )
    got = [
        (r["src_a"], r["src_b"], r["inter"], r["jaccard_ppm"])
        for r in source_overlap_jaccard(docs, "text", "source").collect()
    ]
    # s1 grams: {"a b c d e","b c d e f","x y"} (3); s2: {"a b c d e",
    # "b c d e g","c d e g h"} (3); s3: {"x y"} (1)
    # s1-s2: inter=1, union=5 → 200000; s1-s3: inter=1, union=3 → 333333
    assert ("s1", "s3", 1, 333_333) in got
    assert ("s1", "s2", 1, 200_000) in got
    assert len(got) == 2
    # ordered by overlap desc
    assert got[0][:2] == ("s1", "s3")
