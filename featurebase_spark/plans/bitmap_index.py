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
class Cmp:
    """Row(field <op> value) resolved against a BSI index — the reference's
    BSI range decomposition (executeRowBSIGroupShard executor.go:5249-5356)."""

    field: str
    op: str  # < <= > >= == !=
    value: int

    def __post_init__(self):
        if self.op not in ("<", "<=", ">", ">=", "==", "!="):
            raise ValueError(self.op)


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


BSI_SCHEMA = StructType(
    [
        StructField("bit", LongType(), False),  # -1 = existence plane
        StructField("shard", LongType(), False),
        StructField("bitmap", BinaryType(), True),
        StructField("cardinality", LongType(), False),
    ]
)


def build_bsi_index(
    df: DataFrame,
    field: str,
    id_col: str = "_id",
    shard_exp: int = DEFAULT_SHARD_EXP,
) -> tuple[DataFrame, int, int]:
    """Bit-sliced integer index: one bitmap per bit of (value - min), plus
    an existence plane (reference BSIData bsi.go:11-64, field.go:827-856;
    we offset-encode instead of sign+magnitude so every plane is a plain
    non-negative bit). Returns (frame, min_value, n_bits).

    Build = one min/max agg pass + one shuffle on shard; inside each shard
    the planes are packed vectorized (numpy) — same shape as the
    reference's client-side fragment build (batch/batch.go).
    """
    width_mask = (1 << shard_exp) - 1
    rows = df.select(
        F.col(field).cast("long").alias("val"),
        F.shiftright(F.col(id_col).cast("long"), shard_exp).alias("shard"),
        F.col(id_col).cast("long").bitwiseAND(F.lit(width_mask).cast("long")).alias("offset"),
    ).where(F.col("val").isNotNull())
    mm = rows.agg(F.min("val").alias("lo"), F.max("val").alias("hi")).first()
    if mm["lo"] is None:
        return df.sparkSession.createDataFrame([], BSI_SCHEMA), 0, 1
    minv = int(mm["lo"])
    span = int(mm["hi"]) - minv
    nbits = max(1, span.bit_length())

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        offs = pdf["offset"].to_numpy(dtype=np.int64)
        vals = pdf["val"].to_numpy(dtype=np.int64) - minv
        shard = int(pdf["shard"].iloc[0])
        out = {
            "bit": [-1],
            "shard": [shard],
            "bitmap": [_pack(offs)],
            "cardinality": [len(np.unique(offs))],
        }
        for b in range(nbits):
            sel = offs[(vals >> b) & 1 == 1]
            out["bit"].append(b)
            out["shard"].append(shard)
            out["bitmap"].append(_pack(sel))
            out["cardinality"].append(len(np.unique(sel)))
        return pd.DataFrame(out)

    return rows.groupBy("shard").applyInPandas(pack_shard, BSI_SCHEMA), minv, nbits


def _aligned_planes(pdf: pd.DataFrame) -> tuple[dict[int, np.ndarray], int]:
    """One shard's BSI rows → {bit: byte-array} aligned to a common width."""
    blobs = {
        int(b): (bytes(m) if m is not None else b"")
        for b, m in zip(pdf["bit"], pdf["bitmap"])
    }
    width = max((len(v) for v in blobs.values()), default=0)
    planes = {}
    for b, blob in blobs.items():
        arr = np.zeros(width, dtype=np.uint8)
        arr[: len(blob)] = np.frombuffer(blob, dtype=np.uint8)
        planes[b] = arr
    return planes, width


def _bsi_cmp_shard(planes: dict[int, np.ndarray], nbits: int, op: str, val2: int) -> np.ndarray:
    """Per-shard BSI comparison via the classic bit-descent (the bitmap
    form of executeRowBSIGroupShard's range decomposition)."""
    exists = planes[-1]
    zero = np.zeros_like(exists)
    if val2 < 0:
        eq, gt, lt = zero, exists, zero
    elif val2 >= (1 << nbits):
        eq, gt, lt = zero, zero, exists
    else:
        eq, gt, lt = exists.copy(), zero.copy(), zero.copy()
        for b in range(nbits - 1, -1, -1):
            bm = planes.get(b, zero)
            if (val2 >> b) & 1:
                lt = lt | (eq & ~bm)
                eq = eq & bm
            else:
                gt = gt | (eq & bm)
                eq = eq & ~bm
    return {
        "==": eq,
        "!=": exists & ~eq,
        "<": lt,
        "<=": lt | eq,
        ">": gt,
        ">=": gt | eq,
    }[op]


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
        self._bsi: dict[str, tuple[DataFrame, int, int]] = {}

    def index_field(
        self, df: DataFrame, field: str, id_col: str = "_id", cache: bool = True
    ) -> DataFrame:
        idx = build_bitmap_index(df, field, id_col, self.shard_exp)
        if cache:
            idx = idx.cache()
        self._indexes[field] = idx
        return idx

    def index_bsi_field(
        self, df: DataFrame, field: str, id_col: str = "_id", cache: bool = True
    ) -> DataFrame:
        """Register an int field as a BSI index (field.go:827-856)."""
        frame, minv, nbits = build_bsi_index(df, field, id_col, self.shard_exp)
        if cache:
            frame = frame.cache()
        self._bsi[field] = (frame, minv, nbits)
        return frame

    def _atom_frame(self, atom: Atom) -> DataFrame:
        # Compare under the same cast('string') rule build_bitmap_index used
        # to store values (Python str(True) = 'True' but Spark renders
        # 'true'; lit().cast keeps the two sides consistent).
        idx = self._indexes[atom.field]
        return idx.where(
            F.col("value") == F.lit(atom.value).cast("string")
        ).select("shard", "bitmap")

    def _cmp_frame(self, node: Cmp) -> DataFrame:
        """Row(f <op> v) from the BSI planes — per-shard bit descent, one
        applyInPandas over the (few) plane rows of each shard."""
        frame, minv, nbits = self._bsi[node.field]
        op, val2 = node.op, int(node.value) - minv

        def cmp_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            planes, _ = _aligned_planes(pdf)
            res = _bsi_cmp_shard(planes, nbits, op, val2)
            return pd.DataFrame(
                {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [res.tobytes()]}
            )

        return frame.groupBy("shard").applyInPandas(
            cmp_shard, "shard LONG, bitmap BINARY"
        )

    def _eval(self, node) -> DataFrame:
        """Evaluate to a (shard, bitmap) frame. Combines are full-outer
        joins on shard + a pandas UDF kernel — shard-parallel like the
        reference's per-fragment ops."""
        if isinstance(node, Atom):
            return self._atom_frame(node)
        if isinstance(node, Cmp):
            return self._cmp_frame(node)
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

    # -- BSI aggregates (executor.go Sum/Min/Max shard paths 2155-2356) ----

    def bsi_sum(self, field: str, filter_node=None) -> int:
        """Sum of a BSI field: Σ_b popcount(plane_b ∩ filter) << b, plus
        min offset × existence count (executeSumCountShard 2155-2217).
        No filter → pure metadata (precomputed cardinalities, zero blob
        reads)."""
        frame, minv, _ = self._bsi[field]
        if filter_node is None:
            r = frame.select(
                F.sum(
                    F.when(
                        F.col("bit") >= 0,
                        F.col("cardinality")
                        * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
                    ).otherwise(F.col("cardinality") * F.lit(minv))
                ).alias("s")
            ).first()
            return int(r["s"] or 0)
        filt = self._eval(filter_node).withColumnRenamed("bitmap", "bitmap_f")
        joined = frame.join(filt, "shard", "inner")

        @F.pandas_udf(LongType())
        def contrib(bm: pd.Series, fm: pd.Series, bit: pd.Series) -> pd.Series:
            out = []
            for b, f, bt in zip(bm, fm, bit):
                n = _popcount(
                    bitmap_and(
                        bytes(b) if b is not None else b"",
                        bytes(f) if f is not None else b"",
                    )
                )
                out.append(n * minv if bt == -1 else n << int(bt))
            return pd.Series(out, dtype="int64")

        r = joined.select(
            F.sum(contrib(F.col("bitmap"), F.col("bitmap_f"), F.col("bit"))).alias("s")
        ).first()
        return int(r["s"] or 0)

    def _bsi_extreme(self, field: str, want_max: bool, filter_node=None):
        """Per-shard BSI bit descent for Min/Max (PivotDescending walk,
        bsi.go:18-64), then a global scalar min/max over shard results."""
        frame, minv, nbits = self._bsi[field]
        if filter_node is not None:
            filt = self._eval(filter_node).withColumnRenamed("bitmap", "bitmap_f")
            src = frame.join(filt, "shard", "inner")
        else:
            src = frame.withColumn("bitmap_f", F.lit(None).cast(BinaryType()))

        def extreme_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            planes, width = _aligned_planes(pdf)
            cand = planes[-1]
            fblob = next((x for x in pdf["bitmap_f"] if x is not None), None)
            if fblob is not None:
                fa = np.zeros(width, dtype=np.uint8)
                fb = np.frombuffer(bytes(fblob), dtype=np.uint8)[:width]
                fa[: len(fb)] = fb
                cand = cand & fa
            if not cand.any():
                return pd.DataFrame({"v": pd.Series([], dtype="int64")})
            zero = np.zeros_like(cand)
            acc = 0
            for b in range(nbits - 1, -1, -1):
                bm = planes.get(b, zero)
                if want_max:
                    t = cand & bm
                    if t.any():
                        cand = t
                        acc |= 1 << b
                else:
                    t = cand & ~bm
                    if t.any():
                        cand = t
                    else:
                        acc |= 1 << b
            return pd.DataFrame({"v": pd.Series([acc + minv], dtype="int64")})

        per_shard = src.groupBy("shard").applyInPandas(extreme_shard, "v LONG")
        r = per_shard.agg((F.max("v") if want_max else F.min("v")).alias("v")).first()
        return None if r["v"] is None else int(r["v"])

    def bsi_max(self, field: str, filter_node=None):
        return self._bsi_extreme(field, True, filter_node)

    def bsi_min(self, field: str, filter_node=None):
        return self._bsi_extreme(field, False, filter_node)

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
