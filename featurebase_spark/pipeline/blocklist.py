"""Bloom-pruned EXACT blocklist filtering for 100 TB corpora.

"Remove every document whose key appears in a blocklist" (takedowns,
opt-outs, benchmark ids, previously-trained shards) is naively an
anti-join that shuffles the corpus against the blocklist. At scale the
standard fix is a Bloom-filter runtime prune — done here LOSSLESSLY
with the same candidate/verify discipline as
:mod:`featurebase_spark.pipeline.frequent`:

1. **Build (distributed).** The blocklist's k·|keys| bit positions
   (``pmod(xxhash64(i || ':' || key), m)`` per salt i) aggregate into
   64-bit words via ``bit_or`` — a shuffle bounded by m/64 rows, never
   by |blocklist| — and assemble into ONE binary bitmap on the driver
   (m/8 bytes; 1 MiB for m=2^23, driver- and broadcast-trivial).

2. **Probe (pure JVM, broadcast).** The bitmap rides a 1-row broadcast
   crossJoin (the temperature-mix totals shape — no plan-literal bloat,
   shipped once per executor); each corpus row tests its k bits with
   built-in expressions (substring/hex/conv/shiftleft — whole-stage
   codegen, no Python). A row with any bit clear is DEFINITELY not
   blocklisted (no false negatives) and passes straight through without
   ever joining.

3. **Verify (exact, candidate-restricted).** Bloom-positive rows are a
   small superset (false-positive rate ~(1-e^{-kn/m})^k). Their
   distinct keys broadcast INTO a semi-join against the blocklist —
   the blocklist is scanned but never shuffled — and confirmed hits
   broadcast back for the final anti-join. The result is EXACTLY the
   plain anti-join at any bloom sizing; a too-small bitmap only costs
   verify traffic, never correctness — which is why the DuckDB oracle
   can replay the naive ``NOT IN``.

Reference: FeatureBase routes deletes/filters through key→shard bitmap
lookups (executor.go executeDeleteRecords); this is the corpus-side
counterpart when the filter set is itself huge. The probe/verify split
mirrors what Spark's AQE runtime bloom filters do for joins, applied to
the blocklist shape with an exactness guarantee on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["build_bloom_bitmap", "blocklist_filter"]


def _bit_positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k salted-xxhash64 bit positions of ``key`` in [0, m)."""
    return [
        F.pmod(
            F.xxhash64(F.concat(F.lit(f"{i}:"), key.cast("string"))),
            F.lit(int(m_bits)),
        )
        for i in range(int(k_hashes))
    ]


def build_bloom_bitmap(
    keys_df: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> bytes:
    """Distributed Bloom build → one bitmap of m/8 bytes (little-endian
    within each 64-bit word). The aggregation shuffles at most m/64
    (word, or-of-bits) rows regardless of blocklist size; only those
    words reach the driver."""
    m = int(m_bits)
    if m % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m}")
    pos = keys_df.select(
        F.explode(
            F.array(*_bit_positions(F.col(key_col), m, k_hashes))
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )  # bounded: ≤ m/64 rows
    buf = bytearray(m // 8)
    for r in words:
        w, bits = int(r["w"]), int(r["bits"]) & 0xFFFFFFFFFFFFFFFF
        buf[w * 8 : w * 8 + 8] = bits.to_bytes(8, "little")
    return bytes(buf)


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    key_col: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    broadcast_verify: bool = True,
) -> DataFrame:
    """EXACTLY ``df`` minus rows whose ``key_col`` appears in
    ``blocklist`` — plain anti-join semantics, executed as bloom-prune +
    candidate verify (module docstring). Returns ``df``'s columns
    unchanged.

    Sizing assumption for the default broadcast verify: candidates ≈
    true hits + FP_rate·|corpus| must be broadcast-sized — true for the
    takedown/decontamination shape this targets (rare hits, bloom sized
    so FP_rate·|corpus| is small). For HIT-HEAVY workloads (a large
    fraction of the corpus blocklisted) pass ``broadcast_verify=False``:
    the verify becomes ordinary shuffled semi/anti joins — still
    pruned to the candidate set, just without the broadcast bound."""
    spark = df.sparkSession
    bitmap = build_bloom_bitmap(blocklist, key_col, m_bits, k_hashes)
    bf = spark.createDataFrame([(bytearray(bitmap),)], "__bf binary")
    tmp = df.crossJoin(F.broadcast(bf))
    # per-hash bit tests: name each position column, then test its bit
    # with built-ins (substring is 1-based; byte index = pos div 8)
    maybe = F.lit(True)
    for i, p in enumerate(_bit_positions(F.col(key_col), m_bits, k_hashes)):
        c = f"__bp{i}"
        tmp = tmp.withColumn(c, p)
        bit_set = F.expr(
            f"(CAST(conv(hex(substring(__bf, CAST({c} DIV 8 AS INT) + 1, 1)), "
            f"16, 10) AS INT) & shiftleft(1, CAST({c} % 8 AS INT))) != 0"
        )
        maybe = maybe & bit_set
    tmp = tmp.withColumn("__maybe", maybe)
    keep_cols = [F.col(c) for c in df.columns]
    clean = tmp.where(~F.col("__maybe")).select(*keep_cols)
    cand = tmp.where(F.col("__maybe")).select(*keep_cols)
    cand_keys = cand.select(key_col).distinct()
    if broadcast_verify:
        cand_keys = F.broadcast(cand_keys)
    confirmed = (
        blocklist.join(cand_keys, key_col, "left_semi")
        .select(key_col)
        .distinct()
    )
    if broadcast_verify:
        confirmed = F.broadcast(confirmed)
    kept_cand = cand.join(confirmed, key_col, "left_anti")
    return clean.unionByName(kept_cand)
