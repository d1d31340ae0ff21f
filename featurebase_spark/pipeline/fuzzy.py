"""Edit-distance similarity join (Ed-Join style) at corpus scale.

"Find every pair of strings within Levenshtein distance d" — entity
resolution over names/titles/URLs, near-key matching before dedup — is
naively an all-pairs O(n²) scan. The public Ed-Join / SSJoin family
(Xiao et al. VLDB'08; Chaudhuri et al. ICDE'06) prunes it exactly with
q-gram prefix filtering, which maps cleanly onto DataFrame ops:

1. **Gram sets (map-side).** Each string emits its DISTINCT q-grams
   with pure Catalyst expressions (the trigram extractor generalized).
   One edit operation destroys at most q gram TYPES, so
   ``ed(a,b) <= d`` implies ``|G(a) ∩ G(b)| >= max(|G(a)|,|G(b)|) − q·d``.

2. **Rarity prefix (the exactness-preserving prune).** Under ANY global
   total order of grams, two sets with overlap >= T must intersect
   within their (|G|−T+1)-prefixes; with T >= |G| − q·d that prefix is
   at most q·d+1 grams. Ordering grams by ascending document frequency
   (ties by gram text — deterministic) makes those prefixes the RAREST
   grams, so posting lists stay short exactly where the self-join would
   explode. The df table is a bounded aggregate (gram vocabulary, not
   corpus rows).

3. **Candidates + verify.** The prefix postings self-join on gram
   (id_a < id_b, distinct), then the REAL ``levenshtein`` runs only on
   candidate pairs. Strings whose gram-set is too small for the
   theorem's guarantee (|G| <= q·d: very short or highly repetitive)
   route through an explicit side leg — length-windowed against the
   whole corpus — so the result is EXACTLY the brute-force join at any
   input; that is why the DuckDB oracle can replay the naive
   ``levenshtein(a,b) <= d`` cross join.

Reference tie-in: FeatureBase's LIKE machinery (like.go) matches
patterns exactly; fuzzy matching has no reference counterpart and is
declared an extension (SURVEY §2 training-pipeline goals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from featurebase_spark.materialize import materialize

__all__ = ["gram_sets", "fuzzy_join"]


def gram_sets(df: DataFrame, id_col: str, text_col: str, q: int = 2) -> DataFrame:
    """(id, gram) rows — one per DISTINCT q-gram per string (set
    semantics, required by the type-count bound). Strings shorter than
    q emit nothing (handled by the caller's short-string leg)."""
    t = F.col(text_col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (q - 1), F.lit(0))),
            lambda i: t.substr(i, F.lit(q)),
        )
    )
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def fuzzy_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 2,
    broadcast_verify: bool = True,
) -> DataFrame:
    """EXACTLY every pair (id_a < id_b) with
    ``levenshtein(text_a, text_b) <= max_dist`` — brute-force semantics,
    executed as rarity-prefix candidate generation + candidate-restricted
    verify (module docstring). Returns (id_a, id_b, text_a, text_b,
    dist). NULL texts are excluded.

    ``broadcast_verify`` assumes the candidate-pair set is
    broadcast-sized (true for the entity-resolution shape: near-pairs
    are rare). Pass False to verify through shuffled joins instead."""
    d, qq = int(max_dist), int(q)
    if d < 1:
        raise ValueError(f"max_dist must be >= 1, got {d}")
    if qq < 2:
        raise ValueError(f"q must be >= 2, got {qq}")
    prefix_len = qq * d + 1
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    )
    grams = gram_sets(base, "__id", "__t", qq)
    # per-string gram-set size; |G| <= q*d voids the prefix guarantee.
    # A whole-partition window count shares the __id exchange with the
    # rank window below instead of self-joining grams against its own
    # aggregate (which replayed the gram explode once per join side).
    eligible = grams.withColumn(
        "__g", F.count(F.lit(1)).over(Window.partitionBy("__id"))
    ).where(F.col("__g") > qq * d)
    # global gram rarity (bounded by the gram vocabulary) drives the
    # total order; ties broken by gram text so the prefix is unique
    rarity = eligible.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    ranked = eligible.join(rarity, "gram").withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("__id").orderBy("__df", "gram")
        ),
    )
    # the prefix postings feed BOTH sides of the self-join AND the
    # short-string anti-join; localCheckpoint materializes the ranked
    # subtree once (≤ prefix_len rows per string) instead of replaying
    # the gram/df/window pipeline three times
    prefix = materialize(
        ranked.where(F.col("__rk") <= prefix_len).select("__id", "gram")
    )
    left = prefix.select(F.col("__id").alias("id_a"), "gram")
    right = prefix.select(F.col("__id").alias("id_b"), "gram")
    # duplicates (pairs sharing several prefix grams, bounded by
    # prefix_len) ride to the single distinct after the union — the
    # per-leg distincts only added an extra full exchange each
    cand = (
        left.join(right, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # side leg: strings outside the theorem (len < q, or |G| <= q*d) pair
    # with ANY string within the length window — tiny for real corpora,
    # explicitly exact. The anti-join probes the prefix postings as-is
    # (existence check; the hash build collapses duplicates without a
    # dedup shuffle), and |len_a − len_b| <= d runs as a length-band
    # EQUI-join (explode the 2d+1 candidate lengths on the broadcast
    # side) instead of a nested-loop inequality join over the corpus.
    shorties = base.join(prefix.select("__id"), "__id", "left_anti").select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta")
    )
    short_cand = (
        F.broadcast(
            shorties.withColumn(
                "__lb",
                F.explode(
                    F.sequence(F.length("__ta") - d, F.length("__ta") + d)
                ),
            )
        )
        .join(
            base.select(F.col("__id").alias("id_b"), F.col("__t").alias("__tb")),
            F.col("__lb") == F.length("__tb"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    pairs = cand.unionByName(short_cand).distinct()
    if broadcast_verify:
        pairs = F.broadcast(pairs)
    a = base.select(F.col("__id").alias("id_a"), F.col("__t").alias("text_a"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__t").alias("text_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )
