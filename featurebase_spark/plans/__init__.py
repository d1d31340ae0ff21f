"""Plan-level extensions: the bitmap-index library
(:mod:`featurebase_spark.plans.bitmap_index`) — materialized
(field, value, shard, bitmap) index tables answering filtered counts and
bitmap algebra without scanning the base table, the FeatureBase-flavored
fast path (SURVEY §7 phase 6)."""
