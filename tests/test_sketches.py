"""HyperLogLog sketches (pipeline/sketches.py) — merge algebra, exact
register contract, estimate accuracy, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pipeline.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_summary,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 20_000 distinct keys, each duplicated (duplicates must not move
    # any register: max is idempotent)
    return spark.range(20_000).select(
        (F.col("id") % 20_000).alias("k")
    ).unionAll(spark.range(20_000).select(F.col("id").alias("k")))


def test_registers_bounded_and_duplicate_free(keys):
    regs = hll_registers(keys, "k", b=12).collect()
    assert 0 < len(regs) <= 4096
    assert len({r["register"] for r in regs}) == len(regs)
    assert all(1 <= r["max_rho"] <= 61 for r in regs)


def test_merge_equals_whole(keys, spark):
    """Sharded build + merge == single build — the property that makes
    the sketch safe across executors/days/reruns."""
    whole = {
        r["register"]: r["max_rho"]
        for r in hll_registers(keys, "k", b=8).collect()
    }
    a = hll_registers(keys.where(F.col("k") % 3 == 0), "k", b=8)
    b = hll_registers(keys.where(F.col("k") % 3 == 1), "k", b=8)
    c = hll_registers(keys.where(F.col("k") % 3 == 2), "k", b=8)
    merged = {
        r["register"]: r["max_rho"] for r in hll_merge(a, b, c).collect()
    }
    assert merged == whole


def test_estimate_within_hll_bounds(keys):
    """b=12 → relative error ~1.04/sqrt(4096) = 1.6%; assert 3 sigma."""
    row = hll_summary(keys, "k", b=12).collect()[0]
    est = hll_estimate(row["m"], row["zero_registers"], row["denom_scaled"])
    assert abs(est - 20_000) / 20_000 < 0.05, est


def test_low_range_linear_counting(spark):
    """Tiny cardinalities hit the linear-counting correction and land
    very close to exact."""
    df = spark.range(50).select(F.col("id").alias("k"))
    row = hll_summary(df, "k", b=12).collect()[0]
    est = hll_estimate(row["m"], row["zero_registers"], row["denom_scaled"])
    assert abs(est - 50) < 3, est


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    row = hll_summary(df, "k", b=12).collect()[0]
    assert row["used_registers"] == 2


def test_empty_input_estimates_zero(spark):
    """r8 ADVICE #3: zero rows (or all-NULL keys) must yield the
    all-empty-registers summary — denom_scaled = m·2^61, estimate 0 —
    not a NULL that crashes hll_estimate."""
    for df in (
        spark.createDataFrame([], "k long"),
        spark.createDataFrame([(None,), (None,)], "k long"),
    ):
        row = hll_summary(df, "k", b=12).collect()[0]
        m = row["m"]
        assert row["used_registers"] == 0
        assert row["zero_registers"] == m
        assert int(row["denom_scaled"]) == m * (1 << 61)
        est = hll_estimate(m, row["zero_registers"], row["denom_scaled"])
        assert est == 0.0


def test_partial_aggregation_plan(keys):
    """The register build partial-aggregates map-side: the plan has a
    HashAggregate BELOW the register exchange, so the shuffle carries
    at most partitions x 2^b rows."""
    regs = hll_registers(keys, "k", b=12)
    p = regs._jdf.queryExecution().executedPlan().toString()
    lines = p.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(register" in l]
    aggs = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert ex, p
    assert any(i > ex[0] for i in aggs), p  # partial agg under the exchange


def test_b_validation(keys):
    with pytest.raises(ValueError):
        hll_registers(keys, "k", b=10)
    with pytest.raises(ValueError):
        hll_registers(keys, "k", b=20)
    with pytest.raises(ValueError):
        hll_merge()


def test_registers_match_python_md5_replay(spark):
    """Bit-exactness of the register contract against an independent
    pure-Python replay (hashlib.md5 over the decimal string, nibble
    register, 60-bit-tail leading zeros + 1)."""
    import hashlib

    keys = [0, 1, 7, 42, 999_999_999, 2**40 + 3, -5]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["register"]: r["max_rho"]
        for r in hll_registers(df, "k", b=12).collect()
    }
    want: dict = {}
    for k in keys:
        hx = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(hx[:3], 16)
        v = int(hx[3:18], 16)
        rho = 61 if v == 0 else 61 - v.bit_length()
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want
