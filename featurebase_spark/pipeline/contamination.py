"""Benchmark decontamination: flag training documents that share n-gram
spans with an evaluation/benchmark set.

The standard large-pipeline recipe (n-gram collision decontamination, as
used for GPT-3/PaLM-style training sets): build the set of word n-grams
occurring in the benchmark corpus, then mark any training document
containing one or more of them. Exact-match on hashed n-grams — no
similarity threshold, no model.

Scale shape (the part that matters at 100 TB):

- the TRAINING side shingles map-side with the zero-shuffle Arrow
  hasher (:func:`featurebase_spark.pipeline.dedup.shingle_table`) —
  document text never enters an exchange;
- the BENCHMARK side is small by construction (eval sets are thousands
  of documents, not billions) — its distinct shingle hashes broadcast,
  so the probe join is map-side too;
- the only exchange anywhere carries (doc_id) for MATCHED postings — a
  vanishingly small fraction of the corpus.

Equality classes of the hashed shingles match the plain string-shingle
form exactly (dedup.py contract), which is what the DuckDB oracles
compute.

Reference: FeatureBase has no decontamination surface — training-data
extension goal (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from featurebase_spark.materialize import materialize
from featurebase_spark.pipeline.dedup import shingle_table

__all__ = ["contamination_hits", "decontaminate", "source_overlap_jaccard"]


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id, hits) per training document: hits = number of DISTINCT
    benchmark n-grams the document contains (0-hit documents are
    omitted — anti-join them back if a dense flag column is wanted,
    as :func:`decontaminate` does)."""
    doc_sh = shingle_table(docs, text_col, id_col, n)
    bench_sh = (
        shingle_table(bench, text_col, id_col, n).select("shingle").distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """``docs`` with a ``contaminated`` flag (hits >= min_hits); keep
    ``~contaminated`` rows for the clean training set. The flag join is
    a broadcast of the (tiny) contaminated-id set — the corpus side
    stays map-side."""
    hits = contamination_hits(docs, bench, text_col, id_col, n)
    flagged = hits.where(F.col("hits") >= int(min_hits)).select(id_col)
    return docs.join(
        F.broadcast(flagged.withColumn("contaminated", F.lit(True))),
        id_col,
        "left",
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def source_overlap_jaccard(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 5,
    top: int = 25,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard overlap BETWEEN SOURCES — the
    corpus-level contamination/diversity matrix ("how much does source A
    repeat source B?") a mixing decision needs before weighting sources.

    Scale shape: the (source, gram) posting table is deduplicated once,
    then ONE groupBy(gram) collects the per-gram source set (bounded by
    |sources|, e.g. 20 — never corpus-scale) and explodes its sorted
    pairs; the pair aggregation shuffles at most
    |grams| · C(|sources-per-gram|, 2) tiny rows. No pairwise self-join
    of the posting table (the naive form duplicates the corpus
    |sources| times in the exchange).

    Jaccard is emitted in exact parts-per-million (integer division) so
    an independent engine reproduces it bit-for-bit. Returns the ``top``
    most-overlapping pairs: (src_a, src_b, inter, jaccard_ppm), ordered
    by jaccard_ppm DESC then names ASC.

    Word n-grams follow the repo-wide shingle contract
    (dedup.shingle_table equality classes): documents shorter than ``n``
    words contribute their whole text as one gram."""
    from featurebase_spark.pipeline.frequent import word_grams

    # no .distinct() here: collect_set dedups (src, gram) pairs inside
    # the ONE gram shuffle (map-side partial sets), so a separate
    # distinct exchange would be pure overhead. split binds in its own
    # projection so the gram transform slices a bound array instead of
    # re-splitting the text per gram (see frequent.word_grams).
    from featurebase_spark.pipeline import spread_small_input

    sg = (
        spread_small_input(docs.where(F.col(text_col).isNotNull()))
        .select(
            F.col(source_col).alias("src"),
            F.split(F.col(text_col), " ").alias("__w"),
        )
        .select("src", F.explode(word_grams("__w", n)).alias("gram"))
    )
    # ONE pass builds the per-gram source sets; sizes derive from the
    # same sets (each (src, gram) appears exactly once in sg, so
    # exploding the sets counts each source's distinct grams) — the
    # lazy checkpoint stops the extraction + distinct + gram shuffle
    # from replaying for the second consumer
    g = materialize(
        sg.groupBy("gram").agg(
            F.expr("array_sort(collect_set(src))").alias("ss")
        )
    )
    # sizes joins the pair table TWICE (src_a and src_b side); without
    # materialization each broadcast build replays the explode+count
    # pass over the whole gram-set table — the frame is <= |sources|
    # rows, so pinning it costs nothing and halves the g passes
    sizes = materialize(
        g.select(F.explode("ss").alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    pairs = (
        g.where(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, a -> "
                    "transform(filter(ss, b -> b > a), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("src").alias("src_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("src").alias("src_b"), F.col("n_grams").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "CAST(inter * CAST(1000000 AS BIGINT) "
                "div (na + nb - inter) AS BIGINT)"
            ),
        )
        .select("src_a", "src_b", "inter", "jaccard_ppm")
        .orderBy(F.col("jaccard_ppm").desc(), "src_a", "src_b")
        .limit(top)
    )
