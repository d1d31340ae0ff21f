"""BPE-style vocabulary induction over a corpus.

The first step of training a tokenizer on 100 TB of text is exactly two
aggregations: (1) the word-frequency table, (2) adjacent symbol-pair
counts weighted by word frequency — then a greedy merge loop that only
ever touches the (bounded) word table again. The reference engine has
no tokenizer surface at all; this module provides the Spark-first shape
of the classic BPE algorithm (Sennrich et al., ACL 2016 — public):

- :func:`word_counts` — one ``groupBy(word)`` shuffle; map-side partial
  aggregation collapses the corpus to its vocabulary before anything
  moves. This is the ONLY pass that ever reads full text; every merge
  step below works on the word table (|distinct words| rows — millions,
  not terabytes — the same corpus→vocabulary reduction every real BPE
  trainer performs).
- :func:`bpe_pair_counts` — character-pair statistics, a pure
  projection + one bounded ``groupBy(pair)`` over the word table.
- :func:`bpe_learn` — ``k`` greedy merges; each step is one aggregate
  (argmax pair, a 1-row collect) and one Catalyst ``aggregate()`` fold
  that re-segments every word (no UDF, no Python per row). Driver state
  is the merge list (``k`` entries) — nothing corpus-sized.

Determinism contract: ties on pair count break lexicographically
(smallest pair wins), so the learned merge sequence is reproducible on
any engine and any partitioning — property-tested against a pure-Python
replay (tests/test_vocab.py), the same pattern that guards the HLL
sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from featurebase_spark.materialize import materialize

__all__ = ["word_counts", "bpe_pair_counts", "bpe_learn"]


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) — whitespace words, empties dropped. One shuffle,
    map-side combined."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, top: int = 20
) -> DataFrame:
    """The ``top`` adjacent CHARACTER pairs across the corpus, weighted
    by word frequency — BPE's step-one statistic (the first merge
    candidate list). Returns (pair, cnt) ordered cnt DESC, pair ASC.

    Shape: word table (bounded) → per-word pair array (projection) →
    explode → one pair-key shuffle with map-side partial sums → top via
    TakeOrderedAndProject. Raw text is never re-read or shuffled."""
    if int(top) < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    w = word_counts(df, text_col)
    pairs = w.where(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substr(word, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(int(top))
    )


def _merge_step_expr(a: str, b: str) -> str:
    """Catalyst fold replacing every adjacent (a, b) symbol pair in the
    ``seg`` array column with the merged symbol a||b (left-to-right,
    non-overlapping — the classic BPE application order)."""
    # backslash first, THEN quote — symbols are raw corpus characters,
    # so '\' must become '\\' before quote-escaping or the emitted
    # Spark SQL string literal is malformed ('\' would escape the
    # closing quote).
    qa = a.replace("\\", "\\\\").replace("'", "\\'")
    qb = b.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "aggregate(seg, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = '{qa}' "
        f"AND x = '{qb}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')), "
        "concat(acc, array(x))))"
    )


def bpe_learn(
    df: DataFrame, text_col: str, merges: int = 10
) -> list[tuple[str, str, int]]:
    """Learn ``merges`` greedy BPE merges; returns
    ``[(left, right, count), ...]`` in merge order.

    Each step: one aggregate over the current segmentation of the word
    table (pair → Σ word-count), argmax with the lexicographic
    tiebreak, then one projection re-segmenting every word. The word
    table is checkpointed per step so step ``i+1`` never replays steps
    ``1..i`` (the lineage would otherwise grow quadratically)."""
    if int(merges) < 1:
        raise ValueError(f"merges must be >= 1, got {merges}")
    w = materialize(
        word_counts(df, text_col).select(
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substr(word, i, 1))").alias("seg"),
            "cnt",
        )
    )

    out: list[tuple[str, str, int]] = []
    for _ in range(int(merges)):
        best = (
            w.where(F.size("seg") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(seg) - 1), "
                        "i -> struct(element_at(seg, i) AS a, "
                        "element_at(seg, CAST(i AS INT) + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        out.append((a, b, n))
        w = materialize(
            w.select(F.expr(_merge_step_expr(a, b)).alias("seg"), "cnt")
        )
    return out
