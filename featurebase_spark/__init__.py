"""featurebase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of FeatureBase (formerly Pilosa).

Architecture (see SURVEY.md for the full blueprint):

- **Spark SQL / Catalyst is the engine.** FeatureBase's SQL surface maps to
  Spark SQL; its PQL bitmap calculus (Row/Intersect/Union/Count/TopK/GroupBy/
  Extract/...) is provided by :mod:`featurebase_spark.pql` as a combinator API
  that *compiles to DataFrame operations* — pure filter-algebra stays a single
  scan with pushed-down predicates (no shuffle), exactly the plan you want at
  100 TB.
- **No bitmap storage port.** The reference stores every value as a roaring
  bitmap of record IDs (reference: ``roaring/roaring.go``, ``rbf/``); Parquet +
  Catalyst predicate pushdown plays that role here. An optional bitmap-index
  library lives in :mod:`featurebase_spark.plans.bitmap_index`.
- **Ingest** (reference ``idk/``) maps to batch readers and Structured
  Streaming (:mod:`featurebase_spark.sources`, :mod:`featurebase_spark.streaming`).
- **Scale extensions** for training-data pipelines (dedup, similarity search,
  text analysis, multimodal plumbing) live in
  :mod:`featurebase_spark.pipeline`.
"""

from featurebase_spark.session import get_spark, load_tables, TABLES

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
