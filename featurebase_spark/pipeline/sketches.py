"""Mergeable distinct-count sketches (HyperLogLog) with an EXACT
cross-engine register contract.

The reference serves ``Count(Distinct(...))`` exactly because its keys
are already bitmap-indexed (executor.go executeCount / Distinct); at
100 TB with unbounded keys (URLs, shingles, session ids) the standard
answer is a mergeable HLL sketch: each executor folds its partition
into m = 2^b registers, registers merge with ``max``, and the union of
any number of shards is one more merge — the shape that lets a
1000-executor cluster answer "distinct users per day x country" with a
shuffle bounded by m rows per group, never by the key cardinality.

Determinism contract (what the DuckDB oracle replays bit-for-bit):

- hash = md5 of the key's decimal string — identical hex in every
  engine (the repo's float-free recipe, same as hash_split/sampling);
- register = the first b/4 hex chars as an integer (b in {4,8,12,16});
- rho = leading-zero count of the NEXT 60 bits (15 hex chars) + 1,
  computed with INTEGER ops only: ``61 - bit_length(v)`` via
  ``length(bin(v))`` (both engines print minimal binary), v = 0 → 61;
- the estimator's denominator Σ 2^-rho is carried SCALED by 2^61 so it
  is an exact integer: empty registers contribute 2^61, a register
  with max-rho r contributes 2^(61-r). The sum reaches m·2^61 (2^73
  at b=12), so it rides DECIMAL(38,0) in Spark / HUGEINT in DuckDB —
  the engine-exact integer pair — and crosses the hash gate as a
  STRING.

Only the final float estimate (``hll_estimate``, driver-side, standard
alpha_m bias constant + linear-counting low-range correction per
Flajolet et al. 2007) ever leaves integers, and it never enters an
oracle contract.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_summary",
    "hll_estimate",
    "cms_sketch",
    "cms_merge",
    "cms_estimates",
]

#: bits of tail hashed into rho (15 hex chars — fits BIGINT exactly)
_TAIL_BITS = 60


def _register_and_rho(key, b: int):
    """(register, rho) columns for one key column."""
    if b % 4 or not 4 <= b <= 16:
        raise ValueError(f"b must be a multiple of 4 in [4,16], got {b}")
    nib = b // 4
    hx = F.md5(key.cast("string"))
    reg = F.conv(F.substring(hx, 1, nib), 16, 10).cast("int")
    v = F.conv(F.substring(hx, nib + 1, 15), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(_TAIL_BITS + 1))
        .otherwise(F.lit(_TAIL_BITS + 1) - F.length(F.bin(v)))
        .cast("int")
    )
    return reg, rho


def hll_registers(df: DataFrame, key_col: str, b: int = 12) -> DataFrame:
    """The sketch itself: (register INT, max_rho INT), at most 2^b rows
    out of ANY input size. Spark's partial aggregation folds each input
    partition to ≤ 2^b rows map-side, so the one shuffle carries at
    most partitions·2^b tiny rows — the distributed build is exactly
    the per-shard fold + max-merge HLL deployment shape. NULL keys are
    excluded (COUNT DISTINCT semantics)."""
    reg, rho = _register_and_rho(F.col(key_col), b)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union any number of register frames into one sketch — registers
    merge with ``max``, the associative/commutative/idempotent op that
    makes the sketch safe to combine across shards, days, or reruns."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_summary(df: DataFrame, key_col: str, b: int = 12) -> DataFrame:
    """One exact-integer row describing the sketch: (m, used_registers,
    zero_registers, sum_rho, denom_scaled STRING) where denom_scaled =
    2^61 · Σ_registers 2^-rho — everything the estimator needs, with no
    float anywhere (module docstring)."""
    m = 1 << b
    regs = hll_registers(df, key_col, b)
    two61 = F.lit(str(1 << (_TAIL_BITS + 1))).cast("decimal(38,0)")
    return regs.agg(
        F.lit(m).cast("long").alias("m"),
        F.count(F.lit(1)).alias("used_registers"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("zero_registers"),
        F.sum("max_rho").cast("long").alias("sum_rho"),
        (
            # coalesce: F.sum over ZERO register rows (empty/all-NULL
            # input) is NULL, which would poison the + and violate the
            # contract that each of the m empty registers contributes
            # 2^61 to the denominator (estimate of 0 distinct, not None).
            F.coalesce(
                F.sum(
                    F.expr(
                        f"CAST(shiftleft(1L, {_TAIL_BITS + 1} - max_rho) "
                        "AS DECIMAL(38,0))"
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            )
            + (F.lit(m) - F.count(F.lit(1))).cast("decimal(38,0)") * two61
        )
        .cast("decimal(38,0)")
        .cast("string")
        .alias("denom_scaled"),
    )


def hll_estimate(
    m: int, zero_registers: int, denom_scaled: int | str
) -> float:
    """The HLL cardinality estimate from the exact-integer summary:
    alpha_m · m² / Σ 2^-rho, with the linear-counting low-range
    correction (E ≤ 2.5m and empty registers present → m·ln(m/V)).
    Driver-side float math — deliberately OUTSIDE the oracle contract."""
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    denom = int(denom_scaled)
    e = alpha * m * m * float(1 << (_TAIL_BITS + 1)) / denom
    if e <= 2.5 * m and zero_registers > 0:
        return m * math.log(m / zero_registers)
    return e


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency estimation)
# ---------------------------------------------------------------------------
#
# The mergeable FREQUENCY companion to HLL (Cormode & Muthukrishnan,
# J. Algorithms 2005): d independent hash rows × w counters; an item's
# estimate is the MIN of its d cells — always >= the true count, with
# overestimate bounded by (e/w)·N at probability 1-e^-d. Counters merge
# with elementwise SUM (associative/commutative), so per-shard sketches
# of a 1000-executor scan union into one with a shuffle bounded by d·w
# rows per shard — never the key cardinality. Where the exact
# heavy-hitter operator (pipeline/frequent.py) must see every key, the
# CMS answers "how often does THIS key appear" over unbounded keys in
# O(d·w) state: the point-lookup tier of the frequency story.
#
# Determinism contract (DuckDB replays bit-for-bit): cell hash for row
# i = md5("<i>:<key decimal string>"), first 15 hex chars as a 60-bit
# integer, mod w — integers end-to-end, no float anywhere.


def _cms_bucket(key: Column, row: Column, w: int) -> Column:
    hx = F.md5(F.concat_ws(":", row.cast("string"), key.cast("string")))
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % F.lit(w)


def cms_sketch(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """The sketch table: (row_id INT, bucket INT, cnt LONG), at most d·w
    rows from ANY input size. Each input row explodes into its d cells
    (pure projection); Spark's partial aggregation folds every partition
    to <= d·w cells map-side, so the one shuffle carries
    partitions·d·w tiny rows. NULL keys are excluded."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2: d={d}, w={w}")
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row_id"),
    )
    return (
        keyed.select(
            F.col("row_id").cast("int").alias("row_id"),
            _cms_bucket(F.col("__k"), F.col("row_id"), w)
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches of disjoint shards: counters SUM elementwise —
    cms_merge(cms(A), cms(B)) is cell-identical to cms(A ∪ B), the
    invariant that makes the sketch safe across executors/days/reruns."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_id", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``: (key_col,
    cms_est LONG) with cms_est = min over the key's d cells (missing
    cell = 0). The sketch side is <= d·w rows BY CONSTRUCTION — a bound
    the operator sets, not a data-dependent hope — so broadcasting it
    is safe at any corpus size (contrast the trigram candidate set,
    which needed a fallback); the probe side stays a projection."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row_id"),
    ).select(
        key_col,
        F.col("row_id").cast("int").alias("row_id"),
        _cms_bucket(F.col(key_col), F.col("row_id"), w)
        .cast("int")
        .alias("bucket"),
    )
    joined = probes.join(
        F.broadcast(sketch), ["row_id", "bucket"], "left"
    ).select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("c"))
    return joined.groupBy(key_col).agg(
        F.min("c").cast("long").alias("cms_est")
    )


def cms_topk_with_truth(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    k: int = 20,
) -> DataFrame:
    """The verification shape shared by the ``freq_cms_topk`` key and
    the FB_CMS TVF door: CMS estimates for the k most frequent keys
    NEXT TO their exact counts — (key_col, true_cnt, cms_est), ordered
    (true_cnt DESC, key) so the top-k boundary is a total order.

    One pass over the input: the exact per-key counts materialize once,
    and the sketch derives from THEM as a weighted fold — cell(r, b) =
    Σ true_cnt over keys hashing to (r, b), integer-identical to
    folding the raw rows (each occurrence adds 1 ⟺ each key adds its
    count), so the cells any oracle replays from the rows match
    exactly. The unweighted row form (pipeline/sketches.cms_sketch) is
    unchanged for streaming folds, where rows arrive incrementally."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2: d={d}, w={w}")
    from featurebase_spark.materialize import materialize

    cnt = materialize(
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    keyed = cnt.select(
        F.col(key_col).alias("__k"),
        F.col("true_cnt"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row_id"),
    )
    sk = (
        keyed.select(
            F.col("row_id").cast("int").alias("row_id"),
            _cms_bucket(F.col("__k"), F.col("row_id"), w)
            .cast("int")
            .alias("bucket"),
            "true_cnt",
        )
        .groupBy("row_id", "bucket")
        .agg(F.sum("true_cnt").cast("long").alias("cnt"))
    )
    top = cnt.orderBy(F.desc("true_cnt"), key_col).limit(k)
    est = cms_estimates(sk, top.select(key_col), key_col, d=d, w=w)
    return (
        top.join(est, key_col)
        .select(key_col, "true_cnt", "cms_est")
        .orderBy(F.desc("true_cnt"), key_col)
    )
