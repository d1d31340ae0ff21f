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

from featurebase_spark.pipeline.dedup import shingle_table

__all__ = ["contamination_hits", "decontaminate"]


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
