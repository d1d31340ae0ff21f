"""Property/fuzz tests for the bitmap container + BSI kernels — mirroring
the reference's quick-check-style randomized bitmap tests
(roaring/roaring_test.go, roaring/bitmap_slicing_test.go, SURVEY §5.3).
Pure numpy — no Spark session, so hundreds of cases run in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from featurebase_spark.plans.bitmap_index import (
    _bsi_cmp_shard,
    _dense_bits,
    _pack,
    _popcount,
    _unpack,
    bitmap_and,
    bitmap_andnot,
    bitmap_or,
    bitmap_xor,
)

# offsets spanning both container regimes (dense clusters + sparse tails)
offset_sets = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2_000),
        st.integers(min_value=0, max_value=1_000_000),
    ),
    max_size=300,
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.int64)))


@given(offset_sets)
@settings(max_examples=200, deadline=None)
def test_pack_unpack_roundtrip_property(offs):
    blob = _pack(offs)
    assert _unpack(blob).tolist() == offs.tolist()
    assert _popcount(blob) == len(offs)


@given(offset_sets, offset_sets)
@settings(max_examples=200, deadline=None)
def test_kernel_set_algebra_property(a, b):
    A, B = set(a.tolist()), set(b.tolist())
    pa, pb = _pack(a), _pack(b)
    assert set(_unpack(bitmap_and(pa, pb)).tolist()) == A & B
    assert set(_unpack(bitmap_or(pa, pb)).tolist()) == A | B
    assert set(_unpack(bitmap_andnot(pa, pb)).tolist()) == A - B
    assert set(_unpack(bitmap_xor(pa, pb)).tolist()) == A ^ B


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # offset
            st.integers(min_value=0, max_value=1023),  # value (unsigned span)
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["<", "<=", ">", ">=", "==", "!="]),
    st.integers(min_value=-5, max_value=1100),
)
@settings(max_examples=200, deadline=None)
def test_bsi_cmp_matches_python_filter(pairs, op, probe):
    """The per-shard BSI bit-descent must equal a plain comparison filter
    for every operator and probe, including out-of-range probes
    (executeRowBSIGroupShard semantics)."""
    offs = np.asarray([p[0] for p in pairs], dtype=np.int64)
    vals = np.asarray([p[1] for p in pairs], dtype=np.int64)
    nbits = 10
    nbytes = (int(offs.max()) >> 3) + 1
    planes = {-1: _dense_bits(offs, nbytes)}
    for b in range(nbits):
        planes[b] = _dense_bits(offs[(vals >> b) & 1 == 1], nbytes)
    res = _bsi_cmp_shard(planes, nbits, op, probe)
    got = set(
        np.flatnonzero(np.unpackbits(res, bitorder="little")).tolist()
    )
    py = {
        "<": vals < probe, "<=": vals <= probe, ">": vals > probe,
        ">=": vals >= probe, "==": vals == probe, "!=": vals != probe,
    }[op]
    assert got == set(offs[py].tolist())


@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=10, deadline=None)
def test_percentile_search_nearest_rank_property(values, nth):
    """percentile_search == the sorted nearest-rank definition, any ints."""
    import math

    from pyspark.sql import SparkSession

    from featurebase_spark.pql.calls import percentile_search

    spark = SparkSession.getActiveSession()
    if spark is None:  # property file may run standalone
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.shuffle.partitions", "2")
            .getOrCreate()
        )
    df = spark.createDataFrame([(v,) for v in values], "v LONG")
    rank = max(1, math.ceil(nth / 100.0 * len(values)))
    assert percentile_search(df, "v", nth) == sorted(values)[rank - 1]
