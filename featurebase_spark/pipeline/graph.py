"""Distributed connected components — dedup cluster resolution.

Near-duplicate detection (MinHash LSH, winnowing containment, fuzzy
joins) emits PAIRS; turning pairs into dedup decisions needs the
transitive closure: if A~B and B~C, then {A,B,C} is ONE cluster and one
canonical survivor should represent it. The reference reaches the same
point through its groupBy/Distinct machinery only for single-hop
relations (executor.go GroupBy/Distinct have no iterative closure); a
component resolver is the standard missing piece every corpus-dedup
pipeline bolts on (cf. the large-star/small-star MapReduce formulation,
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14).

Algorithm: min-label propagation with POINTER JUMPING (path doubling).
Each node carries a component label (the smallest node id it has seen);
every round does

1. neighbor relax: ``comp'(u) = min(comp(u), min over neighbors v of
   comp(v))`` — one join of the symmetrized edge list against the label
   frame plus one groupBy, both keyed on a single long id;
2. pointer jump: ``comp''(u) = min(comp'(u), comp'(comp'(u)))`` — one
   self-join of the label frame. Because labels are themselves node
   ids, jumping halves the pointer-chain depth every round, so
   convergence is O(log diameter) rounds instead of O(diameter) — the
   difference between 20 and a million shuffles on a chain-shaped
   100 TB graph.

Every shuffle carries two longs per node; text/payloads never enter the
loop. Labels are localCheckpoint-ed each round so round i+1's plan does
not replay rounds 1..i (lineage would otherwise grow linearly and the
py4j plan quadratically). The fixpoint test is exact: COUNT of labels
that changed this round — when it reaches zero the labels ARE the
component minima (monotone non-increasing, bounded below by the true
minimum, and a fixpoint of the relax step satisfies the local minimum
condition everywhere, which on a connected subgraph forces the global
minimum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def _symmetrize(e: DataFrame, s: str, t: str) -> DataFrame:
    """Both orientations of every edge in ONE pass over the edge
    subtree: explode each row into (s,t) and (t,s). A two-leg union
    instantiates the edge DERIVATION once per leg — for the dedup
    callers that derivation is the whole pair pipeline (posting
    self-join + pair aggregate, or minhash → LSH → verify), so the
    symmetrized frame's materialization computed it twice (r14;
    guide §1.2 don't compute twice). The explode doubles rows inside
    the same stage instead — identical output, half the subtree."""
    return e.select(
        F.explode(
            F.array(
                F.struct(F.col(s), F.col(t)),
                F.struct(F.col(t).alias(s), F.col(s).alias(t)),
            )
        ).alias("__e")
    ).select(f"__e.{s}", f"__e.{t}")


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 64,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Component label (= MIN node id in the component) for every node.

    ``nodes`` — one column ``node_col`` (isolated nodes allowed; they
    become their own component). ``edges`` — undirected pairs in
    ``src_col``/``dst_col``; duplicates and orientation don't matter
    (the loop symmetrizes and min() absorbs repeats). Returns
    ``(node_col, component)``, both the node id type.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds — with pointer jumping that bound allows
    diameters up to ~2^max_iter, so hitting it means a bug, not a big
    graph.

    ``shuffle_partitions`` scopes ``spark.sql.shuffle.partitions`` for
    the loop's jobs (restored on exit) — the same sizing rule as
    streaming.state_partitions: the loop frames hold two longs per
    node/edge, so partition count should track |nodes|, not the
    session's corpus-sized default (a 5k-node closure on 32-wide
    shuffles spends most of its time scheduling empty tasks). Leave
    None at production scale.

    ``checkpoint_dir`` selects DURABILITY for the per-round lineage
    truncation. Default (None) uses ``localCheckpoint``, which stores
    the label blocks on EXECUTORS: lineage is truncated, so losing a
    single executor mid-closure makes those blocks unrecoverable and
    fails the whole job — fine on local[32], the wrong posture for a
    multi-hour 100-TB closure on preemptible machines. Passing a
    fault-tolerant path (HDFS/S3; sets the context's checkpoint dir if
    unset) switches rounds on the ``checkpoint_every`` cadence to
    RELIABLE ``df.checkpoint()`` — blocks land in storage, so the loop
    restarts a lost task from the last reliable round instead of dying;
    off-cadence rounds still localCheckpoint to keep plan growth
    bounded without paying a storage write every round. Both paths run
    the identical algebra — labels are bit-for-bit the same (tested).
    """
    if int(max_iter) < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if int(checkpoint_every) < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    spark = nodes.sparkSession
    if shuffle_partitions is not None:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(shuffle_partitions)))
        try:
            return connected_components(
                nodes, edges, node_col, src_col, dst_col, max_iter, None,
                checkpoint_dir, checkpoint_every,
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    if checkpoint_dir is not None:
        # idempotent: only set the context checkpoint dir if absent —
        # it is context-global, so never clobber a caller's choice
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(checkpoint_dir)
    n = F.col(node_col)
    all_nodes = nodes.where(n.isNotNull()).select(n.alias("node")).distinct()
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .where(F.col("s").isNotNull() & F.col("t").isNotNull())
    )
    sym = (
        _symmetrize(e, "s", "t")
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    # the edge list is reused every round: reliable-checkpoint it when a
    # dir is given (losing its executor blocks would also kill the loop)
    sym = (
        sym.checkpoint(eager=False)
        if checkpoint_dir is not None
        else sym.localCheckpoint(eager=False)
    )

    all_nodes = all_nodes.localCheckpoint(eager=False)
    # the loop only ever changes labels of nodes that HAVE an edge —
    # isolated nodes are their own component by definition and would
    # ride every round's joins/checkpoints as dead weight (in a dedup
    # corpus most docs pair with nothing: here the label frame shrinks
    # ~9× at the bench SF, and at 100 TB the loop shuffles track the
    # duplicate surface, not the corpus). They rejoin once at the end
    # (r13; guide §2.3 shuffle fewer bytes).
    lab = all_nodes.join(
        sym.select(F.col("s").alias("node")).distinct(), "node", "left_semi"
    )
    lab = lab.select("node", F.col("node").alias("comp"))
    lab = lab.localCheckpoint(eager=False)
    for i in range(int(max_iter)):
        nbr = (
            sym.join(lab.withColumnRenamed("node", "t"), "t")
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        relaxed = (
            lab.join(nbr, "node", "left")
            .select(
                "node",
                F.col("comp").alias("comp0"),
                F.least(
                    "comp", F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
        )
        jump_map = relaxed.select(
            F.col("node").alias("comp"), F.col("comp").alias("jumped")
        )
        new_comp = F.least("comp", F.coalesce("jumped", "comp"))
        # the chg flag rides INSIDE the checkpointed frame, so the
        # fixpoint test is a scan of already-materialized rows — no
        # extra join job per round
        new_lab = relaxed.join(jump_map, "comp", "left").select(
            "node",
            new_comp.alias("comp"),
            (new_comp != F.col("comp0")).alias("chg"),
        )
        reliable = checkpoint_dir is not None and i % int(checkpoint_every) == 0
        # LAZY checkpoint + count as the materializing action: the count
        # computes every partition (no limit/short-circuit — a partial
        # first job would leave checkpoint blocks unmaterialized behind
        # a truncated lineage), so one job both persists the round's
        # labels AND returns the fixpoint count — the eager form paid a
        # second scheduler round-trip per round to re-scan the
        # materialized rows (r14; guide §1.2 don't compute twice)
        new_lab = (
            new_lab.checkpoint(eager=False)
            if reliable
            else new_lab.localCheckpoint(eager=False)
        )
        changed = new_lab.where("chg").count()
        lab = new_lab.select("node", "comp")
        if changed == 0:
            # isolated nodes rejoin as their own component (comp NULL
            # after the left join ⇔ the node had no edge)
            return all_nodes.join(lab, "node", "left").select(
                F.col("node").alias(node_col),
                F.coalesce("comp", "node").alias("component"),
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
