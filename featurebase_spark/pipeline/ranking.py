"""Integer-exact BM25 document ranking.

The reference has exact keyword retrieval but no relevance model
(``like.go`` filter steps select documents; nothing orders them by
aboutness — SURVEY §2.3's function inventory has no scoring surface).
This module adds the standard BM25 ranking function in a form this
repo's oracle discipline demands: **no float ever enters the score**,
so the ranking is bit-identical on any engine/version (the r6/r7
divergence class — double summation order, libm ``ln`` differences —
cannot occur).

Two deviations from textbook BM25, both documented and monotone:

- ``k1``/``b`` arrive milli-scaled (1200/750 = the classic 1.2/0.75)
  and all normalizations are exact integer division — Spark
  ``DECIMAL(38,0) div`` == DuckDB ``HUGEINT //`` (the repo's proven
  engine-version-proof arithmetic).
- the log-damped idf ``ln(1 + (N-df+0.5)/(df+0.5))`` is replaced by its
  rational argument ``(N-df)·10^6 div (df+1)`` — a strictly monotone
  transform of df, so per-term orderings are preserved; cross-term sums
  weight rare terms more sharply than the log form (documented
  contract, not an approximation error).

Scale shape: scoring is a ZERO-SHUFFLE projection over the corpus scan
(one parsed array-filter per query term — no UDF, no explode), the
corpus statistics (N, Σdl, per-term df) are ONE aggregate row broadcast
back, and the top-k is a TakeOrderedAndProject: per-partition heaps
ship k rows each at any corpus size. Two passes over the text, nothing
global ever sorts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_topk"]

_D = "DECIMAL(38,0)"


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-``k`` documents by integer-exact BM25 (module docstring).

    Per document with token length ``dl`` (whitespace tokens) and
    per-term frequency ``tf``::

        idf_scaled = (N - df) * 10^6            div (df + 1)
        dl_norm    = 1000 - b + (b * dl * N)    div total_dl      [milli]
        denom      = tf * 1000 + (k1 * dl_norm) div 1000          [milli]
        term_score = tf * (k1 + 1000) * idf_scaled div denom
        score      = Σ term_score                                  [BIGINT]

    Output: ``(id_col, *extra_cols, score)``, ordered score DESC then
    id ASC (deterministic total order), zero-score documents dropped.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for t in terms:
        if "'" in t or "\\" in t:
            raise ValueError(f"term may not contain quotes/backslashes: {t!r}")
    k1, b = int(k1_milli), int(b_milli)

    toks = f"split({text_col}, ' ')"
    s = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.expr(f"size({toks})").cast("long").alias("__dl"),
        *[
            F.expr(f"size(filter({toks}, x -> x = '{t}'))")
            .cast("long")
            .alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # ONE corpus-stats row: N, total token mass, per-term document freq
    stats = s.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__tdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = s.crossJoin(F.broadcast(stats))

    dl_norm = (
        f"({1000 - b} + CAST(CAST({b} AS {_D}) * __dl * __n AS {_D}) "
        f"div CAST(__tdl AS {_D}))"
    )
    score = None
    for i in range(len(terms)):
        idf = (
            f"(CAST((__n - __df{i}) AS {_D}) * 1000000 "
            f"div CAST(__df{i} + 1 AS {_D}))"
        )
        denom = (
            f"(CAST(__tf{i} AS {_D}) * 1000 "
            f"+ CAST({k1} AS {_D}) * {dl_norm} div 1000)"
        )
        term = (
            f"CAST(CAST(__tf{i} AS {_D}) * {k1 + 1000} * {idf} "
            f"div {denom} AS BIGINT)"
        )
        score = term if score is None else f"({score} + {term})"
    return (
        scored.select(
            id_col,
            *extra_cols,
            F.expr(score).alias("score"),
        )
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(int(k))
    )
