"""Exact distributed heavy hitters (frequent items) for 100 TB corpora.

The corpus-statistics question every training-data pipeline asks —
"which tokens / hosts / templates dominate?" — is naively a
``groupBy(item).count()`` whose shuffle carries the ENTIRE item
vocabulary (billions of distinct n-grams at corpus scale). This module
answers it EXACTLY with a bounded shuffle using the classic two-phase
candidate/verify pattern (Misra-Gries / SpaceSaving family, done
loss-LESS-ly via the pigeonhole bound):

1. **Candidate generation, map-side only.** Each of the P input
   partitions counts its items locally (an Arrow-batched
   ``mapInPandas`` generator — per-partition finalized aggregation is
   the one shape Spark's partial aggregates cannot express, because a
   partial agg still exchanges its combiners) and emits only items with
   local count ≥ ceil(T / P), where T = ceil(min_share · N) is the
   global frequency threshold. Pigeonhole: any item with global count
   ≥ T has ≥ T/P occurrences in at least one of the P partitions, so
   the union of the per-partition survivors is a SUPERSET of the true
   answer — 100% recall, no approximation. Candidate volume is bounded:
   a partition of n_p items emits ≤ n_p / (T/P) items, so the union is
   ≤ P / min_share rows TOTAL (1e6 for P=1000, min_share=1e-3) —
   driver/broadcast scale, independent of corpus size.

   The integer ``share_permille`` contract (r13) additionally runs
   phase 1 as ONE pass with no prior knowledge of N: each partition
   cuts at the WEIGHTED bound ceil(share · n_p) against its own raw
   row count n_p and reports n_p in a sentinel, so the separate
   N-counting scan disappears and the recall bound needs no partition
   count at all (proof in :func:`heavy_hitters`).

2. **Exact verify, candidate-restricted shuffle.** Re-scan, keep only
   candidate items (broadcast left-semi join), and run the exact
   ``groupBy(item).count()`` — the shuffle now carries at most the
   candidate set instead of the vocabulary. Filter ≥ T. Because phase 1
   is a strict superset at ANY partitioning, the result is EXACT and
   partitioning-independent — the DuckDB oracle replays the plain
   full-vocabulary count and hash-matches.

Reference: FeatureBase's TopN (executor.go:2779-2868) solves the
serving-time variant against pre-built bitmaps; this is the
corpus-construction variant over raw items. The candidate/verify shape
is the published frequent-items pattern (Misra-Gries 1982; Agarwal et
al. mergeable summaries) with the lossy sketch replaced by the exact
pigeonhole cut — possible in a batch engine because we can afford the
second pass, which a one-pass stream cannot.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame, functions as F

from featurebase_spark.materialize import materialize

__all__ = [
    "local_item_counts",
    "heavy_hitters",
    "heavy_hitter_tokens",
    "word_grams",
    "novel_bigram_ratio",
]


def local_item_counts(
    items: DataFrame,
    item_col: str,
    with_markers: bool = False,
    local_share: Optional[tuple] = None,
) -> DataFrame:
    """Per-PARTITION finalized (item, local_count) pairs via one
    Arrow-batched generator pass — no exchange. The generator holds one
    dict entry per DISTINCT item in its partition (the vocabulary slice,
    not the row count); callers cut it down with a threshold filter
    before anything is shuffled or collected.

    ``with_markers``: additionally emit ONE sentinel row per NON-EMPTY
    partition (``item_col`` NULL, ``local_count`` -1; real items are
    never NULL — value_counts drops them — and real counts are ≥ 1).
    Counting the sentinels observes how many partitions actually held
    data, letting :func:`heavy_hitters` ENFORCE its pigeonhole bound
    instead of trusting the planned partition count.

    ``local_share``: an exact rational ``(num, den)`` share. Applies the
    WEIGHTED per-partition pigeonhole cut inside the generator — only
    items with local count ≥ ceil(num·n_p / den) survive, where n_p is
    the partition's own RAW row count — and emits one sentinel per
    non-empty partition carrying that total as ``local_count = -n_p``.
    This is the one-pass form: the caller recovers the corpus total
    N = Σ n_p from the sentinels instead of running a separate counting
    job, and the cut needs no partition count at all (recall proof in
    :func:`heavy_hitters`). Mutually exclusive with ``with_markers``."""
    import pandas as pd

    if local_share is not None and with_markers:
        raise ValueError("local_share and with_markers are exclusive")
    out_schema = f"{item_col} string, local_count long"

    def count_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # vectorized per-batch value_counts (C path), merged once at the
        # end — ~5x faster than a Python Counter over the same stream
        n_raw = 0
        parts = []
        for b in batches:
            n_raw += len(b)
            vc = b[item_col].value_counts(dropna=True)
            if len(vc):
                parts.append(vc)
        if not parts and not (local_share is not None and n_raw):
            return
        if parts:
            total = (
                parts[0]
                if len(parts) == 1
                else pd.concat(parts).groupby(level=0).sum()
            )
        else:
            total = pd.Series(dtype="int64")
        if local_share is not None:
            num, den = local_share
            # integer-exact ceil(num*n_p/den); counts are integers, so
            # c >= num*n_p/den  <=>  c >= ceil(num*n_p/den)
            cut = max(1, (num * n_raw + den - 1) // den)
            total = total[total >= cut]
        out = pd.DataFrame(
            {
                item_col: total.index.to_numpy(dtype=object),
                "local_count": total.to_numpy(dtype="int64"),
            }
        )
        if with_markers or (local_share is not None and n_raw):
            marker = -1 if with_markers else -n_raw
            out = pd.concat(
                [out, pd.DataFrame({item_col: [None], "local_count": [marker]})],
                ignore_index=True,
            )
        yield out

    return items.select(item_col).mapInPandas(count_partition, out_schema)


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_share: float = 0.001,
    total: Optional[int] = None,
    min_count: Optional[int] = None,
    share_permille: Optional[int] = None,
) -> DataFrame:
    """EXACT items with global frequency ≥ ceil(min_share · N) and their
    counts, from a frame of single items (one row per occurrence).

    ``total`` overrides the pre-computed item count N (pass it when the
    caller already knows it — e.g. a sum of per-document token counts —
    to save the counting pass). ``min_count`` pins the absolute
    threshold directly, bypassing the share-of-N derivation — use it
    for bit-exact cross-engine contracts (an oracle should derive the
    same integer with integer arithmetic, e.g. ``ceil(2N/1000)`` as
    ``(2N + 999) // 1000``, never ``ceil(0.002 * N)``: 0.002 is a
    DECIMAL in SQL but a rounded double in Python, and the two ceils
    can disagree at exact multiples). Returns (item, freq) — the result
    is partitioning-independent (see module docstring), so the oracle
    can replay the naive full count.

    ``share_permille`` selects the ONE-PASS candidate phase (r13): the
    threshold is ceil(share_permille · N / 1000) exactly as with
    ``min_count``, but N is recovered from phase 1 itself — each
    partition applies the WEIGHTED pigeonhole cut
    ``local_count ≥ ceil(share_permille · n_p / 1000)`` against its OWN
    raw row count n_p and reports n_p in a sentinel, so the separate
    total-counting job (a full corpus scan) disappears. Recall proof:
    if an item's global count C ≥ ceil(s·N) ≥ s·N (s = sp/1000, all
    exact rationals) and its local count were < s·n_p in EVERY
    partition, then C = Σ c_p < s·Σ n_p = s·N — contradiction; so some
    partition holds c_p ≥ s·n_p, and since c_p is an integer,
    c_p ≥ ceil(s·n_p). The cut never references a partition count, so
    the bound holds under ANY partitioning — the r7 enforcement check
    is unnecessary by construction here. Candidate volume stays bounded:
    each partition emits ≤ n_p/(s·n_p) = 1000/sp items. The final
    verify filter uses the true N-derived threshold, so results are
    identical to the two-pass form (both gate-proven against the naive
    DuckDB count)."""
    if share_permille is not None and (total is not None or min_count is not None):
        raise ValueError("share_permille is exclusive with total/min_count")
    if share_permille is not None and int(share_permille) < 1:
        # sp < 1 would send the weighted cut to 1 (full-vocabulary
        # candidates); callers route that degenerate request through the
        # legacy two-pass path, which behaves identically
        raise ValueError(f"share_permille must be >= 1, got {share_permille}")
    if min_count is None and share_permille is None and not (0.0 < min_share <= 1.0):
        raise ValueError(f"min_share must be in (0,1], got {min_share}")
    if dict(items.dtypes).get(item_col) != "string":
        # phase 1 emits string items (the Arrow schema is fixed); keep
        # the verify join type-consistent by casting once up front
        items = items.withColumn(item_col, F.col(item_col).cast("string"))
    spark = items.sparkSession
    if share_permille is not None:
        sp = int(share_permille)
        # ONE job pulls the weighted-cut candidates AND the per-partition
        # raw totals (bounded: ≤ 1000/sp candidates + 1 sentinel per
        # non-empty partition)
        surv_rows = local_item_counts(
            items, item_col, local_share=(sp, 1000)
        ).collect()
        n = sum(-r[1] for r in surv_rows if r[0] is None)
        if n == 0:
            return (
                items.select(F.col(item_col))
                .where(F.lit(False))
                .withColumn("freq", F.lit(0).cast("long"))
            )
        threshold = max(1, (sp * n + 999) // 1000)
        cand_vals = sorted({r[0] for r in surv_rows if r[0] is not None})
        candidates = spark.createDataFrame(
            [(v,) for v in cand_vals], f"{item_col} string"
        )
        return (
            items.join(F.broadcast(candidates), item_col, "left_semi")
            .groupBy(item_col)
            .agg(F.count(F.lit(1)).alias("freq"))
            .where(F.col("freq") >= F.lit(threshold))
        )
    n = int(total) if total is not None else items.count()
    if n == 0:
        return (
            items.select(F.col(item_col))
            .where(F.lit(False))
            .withColumn("freq", F.lit(0).cast("long"))
        )
    threshold = max(
        1,
        int(min_count) if min_count is not None
        else math.ceil(min_share * n),
    )
    # partition count of the frame phase 1 will actually scan; the
    # pigeonhole bound holds for any P ≥ the real partition count —
    # ENFORCED below (r7 verdict ask #5): phase 1 emits one sentinel per
    # non-empty partition, and we fail loudly if more partitions held
    # data than the bound assumed (e.g. something repartitioned the
    # frame between planning and scanning), instead of silently losing
    # recall to an over-tight local threshold.
    p = max(1, items.rdd.getNumPartitions())
    local_thr = max(1, math.ceil(threshold / p))
    surv_rows = (
        local_item_counts(items, item_col, with_markers=True)
        .where(
            (F.col("local_count") >= F.lit(local_thr))
            | F.col(item_col).isNull()
        )
        .select(item_col)
        # one job pulls sentinels AND candidates (both driver-bound and
        # bounded: ≤ P/min_share candidates + P sentinels), so phase 1
        # scans the corpus exactly once with no persist to leak
        .collect()
    )
    observed = sum(1 for r in surv_rows if r[0] is None)
    if observed > p:
        raise RuntimeError(
            f"heavy_hitters pigeonhole bound violated: phase 1 saw "
            f"{observed} non-empty partitions but the local threshold "
            f"ceil({threshold}/{p})={local_thr} assumed ≤ {p}; the "
            f"candidate cut can no longer guarantee 100% recall"
        )
    cand_vals = sorted({r[0] for r in surv_rows if r[0] is not None})
    spark = items.sparkSession
    candidates = spark.createDataFrame(
        [(v,) for v in cand_vals], f"{item_col} string"
    )
    exact = (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= F.lit(threshold))
    )
    return exact


def heavy_hitter_tokens(
    docs: DataFrame,
    text_col: str = "text",
    min_share: float = 0.001,
    delimiter: str = " ",
    share_permille: Optional[int] = None,
) -> DataFrame:
    """Heavy-hitter TOKENS of a document corpus: split on ``delimiter``
    (identical to SQL ``string_split`` — empty strings from repeated
    delimiters are counted, matching the oracle), then
    :func:`heavy_hitters` over the exploded stream. The total token
    count comes from a cheap map-side ``sum(size(split(..)))`` so the
    exploded frame is only ever scanned by the two bounded phases.

    ``share_permille`` selects the integer-exact threshold contract:
    items with freq ≥ ceil(share_permille · N / 1000), derived with
    pure integer arithmetic so a SQL oracle reproduces it exactly."""
    # F.split's delimiter is a Java REGEX while the contract (and the
    # string_split oracle) is a literal delimiter — quote it with
    # Pattern.quote semantics so '.', '|' etc. don't silently diverge.
    quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    toks = F.split(F.col(text_col), quoted)
    # NULL text: size(split(NULL)) is -1 (would skew the threshold's N)
    # while explode(NULL) emits nothing — drop NULLs before BOTH.
    from featurebase_spark.pipeline import spread_small_input

    docs = spread_small_input(docs.where(F.col(text_col).isNotNull()))
    items = docs.select(F.explode(toks).alias("token"))
    if share_permille is not None and int(share_permille) >= 1:
        # one-pass (r13): N = sum(size(split(..))) over non-NULL docs is
        # by construction the exploded token-row count, so phase 1's
        # sentinels recover it and the dedicated counting scan disappears
        return heavy_hitters(
            items, "token", share_permille=int(share_permille)
        )
    n = int(
        docs.select(F.sum(F.size(toks)).alias("n")).collect()[0]["n"] or 0
    )
    if share_permille is not None:
        # degenerate sp < 1 keeps the legacy derivation (threshold
        # bottoms out at 1 — every distinct token qualifies)
        mc = max(1, (int(share_permille) * n + 999) // 1000)
        return heavy_hitters(items, "token", total=n, min_count=mc)
    return heavy_hitters(items, "token", min_share, total=n)


def word_grams(words_col, n: int) -> Column:
    """Word n-gram ARRAY expression under the repo-wide shingle contract
    (pipeline/dedup.shingle_table, pipeline/contamination): documents
    shorter than ``n`` words contribute their whole text as one gram.
    Pure built-in higher-order functions — zero-shuffle, no UDF.

    ``words_col`` must be a PRE-SPLIT words column (select
    ``split(text, ' ')`` into its own projection first): lambda bodies
    re-evaluate their argument expressions per element, so embedding
    ``split`` inside the transform re-tokenizes the text once PER GRAM
    — O(len²) where a bound column reference is O(len·n)."""
    w = F.col(words_col) if isinstance(words_col, str) else words_col
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(w, " ")))


def novel_bigram_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    share_permille: int = 1,
) -> DataFrame:
    """Corpus-LM novelty score per document: the share (exact integer
    ppm) of the document's DISTINCT word n-grams that are NOT in the
    corpus's frequent-gram vocabulary (grams with global occurrence
    count ≥ ceil(share_permille · N / 1000)). A high score means the
    document's phrasing is unlike the corpus — the cheap, fully
    deterministic stand-in for an n-gram-LM perplexity filter (the
    KenLM role in C4/Gopher-style pipelines) that needs no model
    artifact and no floats.

    Scale shape: the vocabulary is built by :func:`heavy_hitters`
    (pigeonhole candidate/verify — the shuffle carries ≤ P·1000/
    share_permille candidates, never the vocabulary) and is BOUNDED by
    1000/share_permille items, so it rides into phase B as an array
    literal in a ZERO-SHUFFLE projection: per document,
    ``array_intersect(distinct grams, vocab)`` — no explode, no join,
    no exchange. Total gram count N comes from a map-side
    ``sum(size(...))``.

    Returns (id, n_grams, novel_ppm) — all BIGINT;
    ``novel_ppm = (n_grams - seen) · 10^6 div n_grams`` over distinct
    grams (type-level novelty, the standard for quality filters)."""
    from featurebase_spark.pipeline import spread_small_input

    docs = spread_small_input(docs.where(F.col(text_col).isNotNull()))
    # the gram extraction (split + window slices) is the expensive part
    # and FOUR consumers need it (total count, both heavy-hitter phases,
    # the scoring projection); checkpoint the per-doc gram arrays once
    # instead of re-deriving them from text in every job. The split
    # binds in its own projection so the transform lambda slices a
    # bound array instead of re-splitting per gram (see word_grams).
    prep = materialize(
        docs.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
        ).select(F.col(id_col), word_grams("__w", n).alias("__grams"))
    )
    # one-pass (r13): the gram total N = sum(size(__grams)) is exactly
    # the exploded row count (size ≥ 1 by the whole-text fallback), so
    # heavy_hitters' sentinel totals replace the dedicated counting job
    # — phase 1's scan is also what materializes the lazy checkpoint
    grams = prep.select(F.explode("__grams").alias("gram"))
    if int(share_permille) >= 1:
        hh = heavy_hitters(grams, "gram", share_permille=int(share_permille))
    else:  # degenerate: threshold bottoms out at 1 (legacy derivation)
        total = int(
            prep.select(F.sum(F.size("__grams")).alias("n")).collect()[0]["n"]
            or 0
        )
        mc = max(1, (int(share_permille) * total + 999) // 1000)
        hh = heavy_hitters(grams, "gram", total=total, min_count=mc)
    vocab = [r[0] for r in hh.collect()]
    vocab_lit = (
        F.array(*[F.lit(v) for v in sorted(vocab)])
        if vocab
        else F.array().cast("array<string>")
    )
    dg = F.array_distinct(F.col("__grams"))
    return (
        prep.select(
            F.col(id_col),
            F.size(dg).cast("long").alias("n_grams"),
            F.size(F.array_intersect(dg, vocab_lit)).cast("long").alias("__seen"),
        )
        # distinct-gram count is ≥ 1 by the whole-text fallback, so the
        # integer division is total
        .select(
            id_col,
            "n_grams",
            F.expr(
                "CAST((n_grams - __seen) * CAST(1000000 AS BIGINT) "
                "div n_grams AS BIGINT)"
            ).alias("novel_ppm"),
        )
    )


def collocations_pmi_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information — the
    classic phrase-mining signal (Church & Hanks 1990), with the PMI
    ratio carried as an EXACT scaled integer instead of a log:

        pmi_ppm = count(w1 w2) · N · 10^6  div  (count(w1) · count(w2))

    a strictly monotone transform of PMI for fixed N (log dropped, the
    same rationale as the BM25 idf rational, pipeline/ranking.py), so
    the ranking is identical and the DuckDB oracle replays it with
    HUGEINT // — Spark ``DECIMAL(38,0) div`` == DuckDB ``//``, the
    repo's proven integer-division pair. Magnitudes: at N = 10^13
    corpus tokens the numerator peaks ~10^32, inside DECIMAL(38,0).

    Scale shape: one shuffle for the bigram counts, one for the unigram
    counts — both map-side combined and bounded by VOCABULARY (which
    grows ~log with the corpus), never by the token stream; the
    ``min_count`` filter lands before the two unigram joins, so the
    join input is the rare-pair-pruned bigram table. Top-k is
    TakeOrderedAndProject (per-partition heaps ship k rows each).
    Ordering is total: (pmi_ppm DESC, w1, w2)."""
    if min_count < 1 or k < 1:
        raise ValueError(f"need min_count, k >= 1: {min_count}, {k}")
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.split(F.col(text_col), " ").alias("__w")
    )
    pairs = (
        toks.where(F.size("__w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 1), "
                    "i -> struct(__w[i-1] AS w1, __w[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    cb = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    cu = (
        toks.select(F.explode("__w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    n_row = cu.agg(F.sum("c_t").alias("__n"))
    scored = (
        cb.join(cu.select(F.col("t").alias("w1"), F.col("c_t").alias("c_x")), "w1")
        .join(cu.select(F.col("t").alias("w2"), F.col("c_t").alias("c_y")), "w2")
        .crossJoin(F.broadcast(n_row))  # 1-row totals (established pattern)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.expr(
                "CAST((CAST(c_xy AS DECIMAL(38,0)) * CAST(__n AS DECIMAL(38,0))"
                " * 1000000) div (CAST(c_x AS DECIMAL(38,0)) *"
                " CAST(c_y AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("pmi_ppm"),
        )
    )
    return scored.orderBy(F.desc("pmi_ppm"), "w1", "w2").limit(k)
