"""Integer-PMI collocations (pipeline/frequent.collocations_pmi_topk)
— hand-computed scaled ratios, the min_count prune, and tie order."""

from __future__ import annotations

from featurebase_spark.pipeline.frequent import collocations_pmi_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_pmi(spark):
    """5 docs of 'a b': c(a,b)=5, c(a)=c(b)=5, N=10 →
    pmi_ppm = 5·10·10^6 // 25 = 2_000_000."""
    df = _docs(spark, ["a b"] * 5)
    rows = collocations_pmi_topk(df, min_count=5, k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["c_xy"], r["pmi_ppm"]) == ("a", "b", 5, 2_000_000)


def test_min_count_prunes_rare_pairs(spark):
    """A pair seen min_count-1 times is dropped before scoring."""
    df = _docs(spark, ["x y"] * 4 + ["a b"] * 5)
    got = {
        (r["w1"], r["w2"])
        for r in collocations_pmi_topk(df, min_count=5, k=10).collect()
    }
    assert got == {("a", "b")}


def test_ranking_prefers_exclusive_pairs(spark):
    """'p q' always together outranks 'c d' where c also floods the
    unigram counts — PMI punishes promiscuous words; ties broken by
    (w1, w2) make the order total."""
    df = _docs(spark, ["p q"] * 5 + ["c d"] * 5 + ["c z"] * 20)
    rows = collocations_pmi_topk(df, min_count=5, k=10).collect()
    assert (rows[0]["w1"], rows[0]["w2"]) == ("p", "q")
    order = [(r["pmi_ppm"], r["w1"], r["w2"]) for r in rows]
    assert order == sorted(order, key=lambda t: (-t[0], t[1], t[2]))
