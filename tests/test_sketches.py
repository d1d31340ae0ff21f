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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from featurebase_spark.pipeline.sketches import (  # noqa: E402
    cms_estimates,
    cms_merge,
    cms_sketch,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key k appears k+1 times, k in 0..99 — a known exact histogram
    return spark.range(100).select(
        F.explode(
            F.sequence(F.lit(0), F.col("id"))
        ).alias("_"),
        F.col("id").alias("k"),
    ).select("k")


def test_cms_never_underestimates(skewed, spark):
    sk = cms_sketch(skewed, "k", d=4, w=256)
    keys = spark.range(100).select(F.col("id").alias("k"))
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimates(sk, keys, "k", d=4, w=256).collect()
    }
    for k in range(100):
        assert est[k] >= k + 1, (k, est[k])


def test_cms_exact_when_wide(skewed, spark):
    """With w far above the key count, collisions are unlikely in every
    one of the d rows simultaneously — the min recovers exact counts."""
    sk = cms_sketch(skewed, "k", d=4, w=65536)
    keys = spark.range(100).select(F.col("id").alias("k"))
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimates(sk, keys, "k", d=4, w=65536).collect()
    }
    assert est == {k: k + 1 for k in range(100)}


def test_cms_merge_equals_whole(skewed):
    """Sharded build + elementwise-sum merge is CELL-IDENTICAL to the
    single build — the invariant that makes per-executor sketches safe."""
    whole = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in cms_sketch(skewed, "k", d=3, w=64).collect()
    }
    a = cms_sketch(skewed.where(F.col("k") % 2 == 0), "k", d=3, w=64)
    b = cms_sketch(skewed.where(F.col("k") % 2 == 1), "k", d=3, w=64)
    merged = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in cms_merge(a, b).collect()
    }
    assert merged == whole


def test_cms_bounds_nulls_and_unseen(spark):
    sk_rows = cms_sketch(
        spark.createDataFrame(
            [(1,), (1,), (None,)], "k int"
        ),
        "k",
        d=4,
        w=32,
    )
    # NULL keys excluded: total count per row is 2, rows bounded by d*w
    per_row = {
        r["row_id"]: r["cnt"]
        for r in sk_rows.groupBy("row_id")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert per_row == {0: 2, 1: 2, 2: 2, 3: 2}
    # an unseen key estimates 0 unless it collides in ALL d rows
    probe = spark.createDataFrame([(999999,)], "k int")
    est = cms_estimates(sk_rows, probe, "k", d=4, w=32).collect()[0]
    assert 0 <= est["cms_est"] <= 2
