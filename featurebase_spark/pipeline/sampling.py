"""Deterministic sampling / splitting / source mixing for training-data
pipelines.

A 100 TB corpus cannot be sampled with ``df.sample`` (per-run RNG: not
reproducible across runs, executors, or engines) or with a global sort +
row_number (a full shuffle). Every operator here derives its decision
from a cryptographic hash of the ROW KEY alone, so:

- the decision is a map-side projection — ZERO shuffles at any scale;
- it is reproducible bit-for-bit across runs, cluster sizes, engines
  (the DuckDB oracles replay it exactly), and data layout;
- membership is stable under corpus growth: adding documents never
  changes the split/sample decision of existing documents (the property
  train/val/test assignment must have in a living corpus).

The uniform variate is the first 8 hex chars of ``md5(seed || ':' ||
key)``, compared AS A HEX STRING against a hex threshold — string
comparison avoids any float conversion, so there is no cross-engine
rounding surface at all for split/sample. Temperature mixing needs
per-source rates (doubles); those are derived from exact integer sums
and DECIMAL-quantized weights (exact, order-independent summation) with
single correctly-rounded IEEE ops in a pinned order, then frozen into an
8-hex-digit threshold per source (``printf('%08x', ...)`` on both
engines), so the accept decision is again a pure string compare.

Reference: FeatureBase has no sampling surface — this is part of the
training-data extension goals (BASELINE.json). The hash-mod technique
is the standard one (e.g. TFDS deterministic splits).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_uniform_hex",
    "hex_threshold",
    "hash_split",
    "hash_sample",
    "temperature_rates",
    "temperature_mix",
]

#: width of the hex prefix used as the uniform variate (8 hex = 32 bits:
#: plenty for sampling rates down to ~2e-10, and small enough that the
#: integer threshold arithmetic is exact in doubles)
_HEX_W = 8
_SPACE = 1 << (4 * _HEX_W)  # 2^32

#: threshold meaning "accept everything": lexicographically above every
#: hex string ('g' > 'f'), avoiding the 9-digit 0x100000000 whose STRING
#: compare would invert ("5abc..." > "100000000")
_ACCEPT_ALL = "g"


def hash_uniform_hex(key: Column, seed: int = 42) -> Column:
    """The deterministic uniform variate for ``key``: first 8 hex chars
    of ``md5(seed || ':' || key)`` (lowercase). Uniform over [0, 2^32)
    when read as hex; compared as a STRING against :func:`hex_threshold`
    so no engine ever converts it to a number."""
    return F.md5(
        F.concat_ws(":", F.lit(int(seed)).cast("string"), key.cast("string"))
    ).substr(1, _HEX_W)


def hex_threshold(rate: float) -> str:
    """``rate`` in [0,1] → the 8-hex-digit exclusive upper bound such
    that ``P[hex < threshold] = floor(rate * 2^32) / 2^32``; rate 1.0
    returns the accept-everything sentinel."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0,1], got {rate}")
    t = int(rate * _SPACE)
    return _ACCEPT_ALL if t >= _SPACE else format(t, f"0{_HEX_W}x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Optional[Mapping[str, float]] = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by
    hash range — a pure projection (zero shuffles, no state), stable
    under corpus growth, identical on any engine that has md5.

    ``weights`` need not sum exactly to 1; they are normalized. Split
    boundaries are cumulative hash thresholds, so each row lands in
    exactly one split and expected proportions match the weights to
    within 2^-32."""
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = hash_uniform_hex(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(hex_threshold(min(acc, 1.0)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    rate: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash.
    Filter-only: pushes to the scan as an ordinary predicate, never
    shuffles, and re-runs (or re-executions of failed tasks) select the
    exact same rows."""
    u = hash_uniform_hex(F.col(id_col), seed)
    return df.where(u < F.lit(hex_threshold(rate)))


def temperature_rates(
    df: DataFrame,
    source_col: str = "source",
    size_col: str = "n_chars",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-source acceptance rates for temperature-weighted mixing:
    source ``s`` with total size ``c_s`` gets target share ∝ c_s^alpha
    (alpha<1 upweights small sources — the standard multilingual /
    multi-corpus mixing rule), scaled so the expected TOTAL kept size is
    ``target_frac`` of the corpus; rates cap at 1 (a source cannot be
    sampled above its own size — the lost mass is NOT redistributed,
    matching the one-shot rule large pipelines use).

    Returns (source, src_size, rate, rate_hex): ``rate_hex`` is the
    frozen threshold :func:`temperature_mix` compares against.

    Cross-engine determinism, piece by piece:
    - per-source sizes are exact integer sums;
    - the weight ``sqrt(c_s)`` is correctly rounded per IEEE-754 (unlike
      ``pow``, which may differ across libm builds — alpha != 0.5 works
      but voids the bit-exact oracle contract);
    - the weight is quantized to DECIMAL(38,12) before the total-weight
      sum, which is then EXACT and order-independent (double summation
      order varies between engines/partitions; decimal summation does
      not);
    - the remaining ops (one divide, two multiplies, one divide, floor)
      are single correctly-rounded IEEE ops in a pinned order.

    One tiny aggregate (|sources| rows) is the only shuffle; the caller
    broadcast-joins the result back, so at 100 TB the probe side never
    moves."""
    sizes = df.groupBy(source_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("src_size")
    )
    if alpha == 0.5:
        w_double = F.sqrt(F.col("src_size").cast("double"))
    else:
        w_double = F.pow(F.col("src_size").cast("double"), F.lit(float(alpha)))
    sized = sizes.withColumn("w", w_double.cast("decimal(38,12)"))
    totals = sized.agg(
        F.sum("src_size").alias("tot_size"),
        F.sum("w").alias("tot_w"),
    )
    joined = sized.crossJoin(F.broadcast(totals))
    # pinned op order — mirror EXACTLY in any oracle:
    #   a = target_frac * tot_size ; b = w / tot_w ; rate = (a * b) / src
    a = F.lit(float(target_frac)) * F.col("tot_size").cast("double")
    b = F.col("w").cast("double") / F.col("tot_w").cast("double")
    rate = F.least(F.lit(1.0), (a * b) / F.col("src_size").cast("double"))
    out = joined.withColumn("rate", rate).withColumn(
        "rate_hex",
        F.when(F.col("rate") >= 1.0, F.lit(_ACCEPT_ALL)).otherwise(
            F.format_string(
                f"%0{_HEX_W}x",
                F.floor(F.col("rate") * F.lit(float(_SPACE))).cast("long"),
            )
        ),
    )
    return out.select(source_col, "src_size", "rate", "rate_hex")


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    part_col: str = "source",
    n_per_part: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Deterministic equal-N per-partition sample (balanced eval/holdout
    construction): within each ``part_col`` group, keep the ``n_per_part``
    rows with the LOWEST key-hash — a uniform draw that is reproducible
    across runs/engines and stable per row (a document's selection never
    depends on which other documents exist in OTHER partitions; within
    its partition, membership shifts only as lower-hash rows arrive —
    the unavoidable property of any fixed-N draw).

    One shuffle on the partition column; rank by the md5-prefix hex with
    the key as tiebreak, so the selected SET is engine-exact."""
    from pyspark.sql import Window

    u = hash_uniform_hex(F.col(id_col), seed)
    w = Window.partitionBy(part_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(n_per_part))
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int = 2048,
    part_col: str = "source",
    order_col: str = "doc_id",
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget PACKS (sequence packing for
    training): within each ``part_col`` partition, documents in
    ``order_col`` order fill packs of ``budget`` tokens by running sum —
    ``pack_id = floor(tokens_before_this_doc / budget)``. Deterministic
    (pure integer arithmetic over a total order) and SQL-replayable.

    Scale shape: ONE shuffle on the partition column; each partition's
    running sum is a window over its own rows — the per-source
    parallelism a real packing job wants (a single global order would
    serialize the corpus through one task). Long documents spanning a
    boundary stay in the pack where they started (the consumer truncates
    or overflows downstream — assignment here must stay a pure
    projection)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0)
    )
    return df.withColumn(
        out_col, F.floor(before / F.lit(int(budget))).cast("long")
    )


def temperature_mix(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    size_col: str = "n_chars",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted deterministic downsampling: keep each row
    iff its key hash falls under its SOURCE's frozen threshold. The
    rates table is tiny (|sources| rows) and broadcast — the probe side
    never shuffles, so the whole operator is scan → broadcast-join →
    filter at any scale."""
    rates = temperature_rates(df, source_col, size_col, alpha, target_frac)
    u = hash_uniform_hex(F.col(id_col), seed)
    return (
        df.join(F.broadcast(rates.select(source_col, "rate_hex")), source_col)
        .where(u < F.col("rate_hex"))
        .drop("rate_hex")
    )
