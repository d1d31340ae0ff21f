"""Bitmap-index library: FeatureBase's core storage idea as a *materialized
index table* on Spark.

The reference stores EVERY column value as a roaring bitmap of record IDs,
sharded into 2^20-record fragments ((index, field, view, shard) → bitmap,
fragment.go:30-80, shardwidth/helper.go:14), and answers
Count/Intersect/Union/Difference with vectorized bitmap kernels
(roaring/roaring.go). Here the same idea is a DataFrame:

    index_table(field) = (value, shard, bitmap BINARY, cardinality LONG)

- ``shard = _id >> shard_exp`` — the unit of parallelism, exactly the
  reference's shard (we default to 2^20 too).
- ``bitmap`` — a dense packed bitset over the shard's offset space
  (numpy uint8; roaring's RLE/array containers are an encoding detail —
  at one value per fragment, dense packing is within 2× of roaring for
  the workloads this serves, and numpy popcount is SIMD-vectorized).
- Kernels (AND/OR/ANDNOT/XOR/popcount) run as Arrow-batched pandas UDFs
  joined on ``shard`` — the shard-parallel scatter/gather of
  executor.go:6449 becomes an equi-join + partial aggregation.

Why this exists on Spark at all: a bitmap index table is ~|distinct values|
× |shards| rows of kilobyte blobs — for a 100 TB base table with low-card
fields, that's gigabytes. Counting ``Intersect(Row(a=x), Row(b=y))`` from
the index touches ONLY those blobs: no base-table scan, no shuffle of row
data. It is the low-latency filtered-count niche the reference was built
for; every result is verifiable against the plain-DataFrame path (tests do).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Union as TUnion

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_SHARD_EXP = 20  # reference ShardWidth = 1 << 20 (shardwidth/helper.go:14)


def _pack(offsets: np.ndarray) -> bytes:
    """Offsets within a shard → packed little-endian bitset bytes."""
    if len(offsets) == 0:
        return b""
    width = int(offsets.max()) + 1
    bits = np.zeros(width, dtype=np.uint8)
    bits[offsets] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack(blob: bytes) -> np.ndarray:
    """Packed bitset → offset array."""
    if not blob:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8), bitorder="little")
    return np.flatnonzero(bits).astype(np.int64)


def _popcount(blob: bytes) -> int:
    if not blob:
        return 0
    return int(np.unpackbits(np.frombuffer(blob, dtype=np.uint8), bitorder="little").sum())


def _align(a: bytes, b: bytes) -> tuple[np.ndarray, np.ndarray]:
    n = max(len(a), len(b))
    aa = np.zeros(n, dtype=np.uint8)
    bb = np.zeros(n, dtype=np.uint8)
    aa[: len(a)] = np.frombuffer(a, dtype=np.uint8)
    bb[: len(b)] = np.frombuffer(b, dtype=np.uint8)
    return aa, bb


def bitmap_and(a: bytes, b: bytes) -> bytes:
    aa, bb = _align(a, b)
    return (aa & bb).tobytes()


def bitmap_or(a: bytes, b: bytes) -> bytes:
    aa, bb = _align(a, b)
    return (aa | bb).tobytes()


def bitmap_andnot(a: bytes, b: bytes) -> bytes:
    aa, bb = _align(a, b)
    return (aa & ~bb).tobytes()


def bitmap_xor(a: bytes, b: bytes) -> bytes:
    aa, bb = _align(a, b)
    return (aa ^ bb).tobytes()


INDEX_SCHEMA = StructType(
    [
        StructField("value", StringType(), True),
        StructField("shard", LongType(), False),
        StructField("bitmap", BinaryType(), True),
        StructField("cardinality", LongType(), False),
    ]
)


def build_bitmap_index(
    df: DataFrame,
    field: str,
    id_col: str = "_id",
    shard_exp: int = DEFAULT_SHARD_EXP,
) -> DataFrame:
    """Materialize the (value, shard) → bitmap fragment table for a field.

    One groupBy(value, shard) + applyInPandas pack — the exact shape of the
    reference's ingest-side fragment build (batch/batch.go builds per-shard
    roaring fragments client-side). Set (array) fields explode first.
    Values are stringified for a uniform index schema (the reference's key
    translation plays this role, translate.go).

    Scale: output rows = |values|×|touched shards|; write it partitioned by
    shard (or bucketed by value) and the count path never sees row data.
    """
    width_mask = (1 << shard_exp) - 1
    src = df
    col = F.col(field)
    if dict(df.dtypes)[field].startswith("array"):
        src = df.select(F.explode(field).alias(field), id_col)
        col = F.col(field)
    rows = src.select(
        col.cast("string").alias("value"),
        F.shiftright(F.col(id_col).cast("long"), shard_exp).alias("shard"),
        F.col(id_col).cast("long").bitwiseAND(F.lit(width_mask).cast("long")).alias("offset"),
    ).where(F.col("value").isNotNull())

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        offs = pdf["offset"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "value": [pdf["value"].iloc[0]],
                "shard": [pdf["shard"].iloc[0]],
                "bitmap": [_pack(offs)],
                "cardinality": [len(np.unique(offs))],
            }
        )

    return rows.groupBy("value", "shard").applyInPandas(pack_group, INDEX_SCHEMA)


# ---------------------------------------------------------------------------
# Bitmap expression tree over index tables
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Atom:
    """Row(field=value) resolved against a bitmap index."""

    field: str
    value: object


@dataclass(frozen=True)
class Op:
    kind: str  # and|or|andnot|xor
    children: tuple

    def __post_init__(self):
        if self.kind not in ("and", "or", "andnot", "xor"):
            raise ValueError(self.kind)


def And(*children) -> Op:
    return Op("and", tuple(children))


def Or(*children) -> Op:
    return Op("or", tuple(children))


def AndNot(*children) -> Op:
    return Op("andnot", tuple(children))


def XOr(*children) -> Op:
    return Op("xor", tuple(children))


class BitmapCatalog:
    """Registry of per-field bitmap index tables + the query router.

    The FeatureBase analogy: the holder's fragment store + the executor's
    per-shard kernel dispatch (executor.go:5357-5534), with Spark's shuffle
    layer as the scatter/gather. Build once per field with
    :meth:`index_field`; answer Count/ids of And/Or/AndNot/XOr trees of
    (field = value) atoms from blobs alone.
    """

    def __init__(self, shard_exp: int = DEFAULT_SHARD_EXP):
        self.shard_exp = shard_exp
        self._indexes: dict[str, DataFrame] = {}

    def index_field(
        self, df: DataFrame, field: str, id_col: str = "_id", cache: bool = True
    ) -> DataFrame:
        idx = build_bitmap_index(df, field, id_col, self.shard_exp)
        if cache:
            idx = idx.cache()
        self._indexes[field] = idx
        return idx

    def _atom_frame(self, atom: Atom) -> DataFrame:
        idx = self._indexes[atom.field]
        return idx.where(F.col("value") == F.lit(str(atom.value))).select(
            "shard", "bitmap"
        )

    def _eval(self, node) -> DataFrame:
        """Evaluate to a (shard, bitmap) frame. Combines are full-outer
        joins on shard + a pandas UDF kernel — shard-parallel like the
        reference's per-fragment ops."""
        if isinstance(node, Atom):
            return self._atom_frame(node)
        kernels = {
            "and": (bitmap_and, False),
            "or": (bitmap_or, True),
            "andnot": (bitmap_andnot, None),
            "xor": (bitmap_xor, True),
        }
        kern, keep_missing = kernels[node.kind]
        out = self._eval(node.children[0])
        for i, child in enumerate(node.children[1:]):
            right = self._eval(child).withColumnRenamed("bitmap", "bitmap_r")
            if node.kind == "and":
                joined = out.join(right, "shard", "inner")
            else:
                joined = out.join(right, "shard", "full_outer")

            @F.pandas_udf(BinaryType())
            def combine(a: pd.Series, b: pd.Series) -> pd.Series:
                return pd.Series(
                    [
                        kern(
                            bytes(x) if x is not None else b"",
                            bytes(y) if y is not None else b"",
                        )
                        for x, y in zip(a, b)
                    ]
                )

            out = joined.select(
                "shard", combine(F.col("bitmap"), F.col("bitmap_r")).alias("bitmap")
            )
        return out

    def count(self, node) -> int:
        """Cardinality of the bitmap expression — touches only index blobs
        (reference executeCount over fragment bitmaps, executor.go:5839)."""
        frame = self._eval(node)

        @F.pandas_udf(LongType())
        def pop(b: pd.Series) -> pd.Series:
            return pd.Series([_popcount(bytes(x) if x is not None else b"") for x in b])

        r = frame.select(F.sum(pop(F.col("bitmap"))).alias("n")).first()
        return int(r["n"] or 0)

    def ids(self, node) -> DataFrame:
        """Materialize the record IDs of a bitmap expression (shard-parallel
        unpack — the Extract path back to row space)."""
        frame = self._eval(node)
        exp = self.shard_exp

        def unpack_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for shard, blob in zip(pdf["shard"], pdf["bitmap"]):
                    offs = _unpack(bytes(blob) if blob is not None else b"")
                    if len(offs):
                        out.append((int(shard) << exp) + offs)
                yield pd.DataFrame(
                    {"_id": np.concatenate(out) if out else np.empty(0, dtype=np.int64)}
                )

        return frame.mapInPandas(unpack_part, "_id LONG")

    def topk_values(self, field: str, k: int) -> DataFrame:
        """TopK straight off the index: sum fragment cardinalities per value
        (the reference's TopK merges per-shard count-BSI, executor.go:2357;
        here it's a partial-agg over precomputed cardinalities — no base
        scan, no row shuffle)."""
        idx = self._indexes[field]
        return (
            idx.groupBy("value")
            .agg(F.sum("cardinality").alias("count"))
            .orderBy(F.desc("count"), F.asc("value"))
            .limit(k)
        )
