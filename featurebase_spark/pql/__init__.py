"""PQL — FeatureBase's bitmap calculus, re-expressed as a DataFrame compiler.

Reference: the PQL grammar (``/root/reference/pql/pql.peg``) and the
shard-parallel executor (``/root/reference/executor.go``, dispatch table
executor.go:723-835). In the reference every row-call produces a roaring
bitmap of record IDs and set-ops are bitmap AND/OR/ANDNOT/XOR.

Spark-first design decision: a "bitmap" here is *either*
  (a) a boolean predicate ``Column`` over the base table — the preferred
      representation: composing Intersect/Union/Difference/Xor/Not stays a
      SINGLE parquet scan with the whole predicate pushed down / codegen'd,
      no shuffle, no join; at 100 TB this is the difference between one scan
      and N scans + N-1 joins — *or*
  (b) a DataFrame of record IDs (``_id``), used only when predicate form is
      impossible (ConstRow over huge external lists, Shift's ID arithmetic).
Readers (Count/Sum/TopK/GroupBy/Extract/...) then compile to ordinary
filter → groupBy/agg plans that Catalyst optimizes (partial aggregation =
the reference's per-shard map + reduce, executor.go:6449 mapReduce).
"""

from featurebase_spark.pql.calls import (
    All,
    Arrow,
    ConstRow,
    Difference,
    Distinct,
    Extract,
    FieldValue,
    GroupBy,
    IncludesColumn,
    Index,
    Intersect,
    Limit,
    Not,
    Options,
    Percentile,
    Range,
    Row,
    Rows,
    Shift,
    Sort,
    TopK,
    TopN,
    Union,
    UnionRows,
    Xor,
)
from featurebase_spark.pql.calls import Count, Max, MaxRow, Min, MinRow, Sum
from featurebase_spark.pql.calls import Apply, Clear, ClearRow, Delete, Set, Store

__all__ = [
    "Index",
    "Row",
    "Intersect",
    "Union",
    "Difference",
    "Xor",
    "Not",
    "All",
    "ConstRow",
    "UnionRows",
    "Shift",
    "Limit",
    "Count",
    "Sum",
    "Min",
    "Max",
    "MinRow",
    "MaxRow",
    "Distinct",
    "Percentile",
    "TopN",
    "TopK",
    "Rows",
    "GroupBy",
    "Extract",
    "Sort",
    "IncludesColumn",
    "FieldValue",
    "Arrow",
    "Options",
    "Range",
]
