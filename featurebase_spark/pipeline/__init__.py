"""Large-scale training-data pipeline operators (the 100 TB extension goals
beyond FeatureBase's own surface — BASELINE.json north star):

- :mod:`featurebase_spark.pipeline.text` — language ID, quality scoring,
  token counting, document fingerprinting.
- :mod:`featurebase_spark.pipeline.dedup` — exact, n-gram Jaccard,
  MinHash+LSH, SimHash, embedding-cosine near-dup.
- :mod:`featurebase_spark.pipeline.similarity` — brute-force cosine top-k,
  random-hyperplane LSH bucketed ANN.
- :mod:`featurebase_spark.pipeline.multimodal` — opaque-binary column
  plumbing (decode/resize/frame-sample as Arrow-batched stubs).
- :mod:`featurebase_spark.pipeline.sampling` — deterministic hash-range
  train/val/test splits, keyed sampling, temperature-weighted source
  mixing, fixed-budget sequence packing.
- :mod:`featurebase_spark.pipeline.contamination` — benchmark n-gram
  overlap decontamination.
- :mod:`featurebase_spark.pipeline.frequent` — exact distributed heavy
  hitters (pigeonhole candidate generation + candidate-restricted
  verify; the shuffle never carries the vocabulary).
"""

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Ensure a CPU-heavy per-row stage (shingling, tokenization, signature
    matmuls) runs with the session's full parallelism.

    A small corpus often arrives as ONE parquet file → one input split →
    one core doing all the regexp/explode work while 31 idle. At real
    scale inputs already carry >= parallelism splits and this is a no-op
    (no shuffle added); only under-split inputs pay one small exchange."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
