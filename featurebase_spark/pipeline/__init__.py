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
"""
