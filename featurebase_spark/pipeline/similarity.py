"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring what a 100 TB vector corpus needs:

- **Brute-force cosine top-k** — the exact baseline. One scan; the dot
  product is a JVM-side ``aggregate`` fold over ``zip_with`` (no Python in
  the loop), and top-k is TakeOrdered (per-partition heap + driver merge of
  k rows, NOT a global sort).
- **Random-hyperplane LSH (SRP)** — the scale path. A fixed seeded set of
  hyperplanes maps each vector to a sign-bit bucket key; queries probe only
  their own (or neighboring) buckets. Bucketing is a deterministic
  projection — build once, reuse for every query; at scale you'd persist it
  partitioned by bucket key so probes prune to a handful of partitions.
  An IVF variant is the same shape with learned centroids instead of random
  planes.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Strictly-sequential fold dot product (deterministic accumulation
    order, unlike a shuffled SUM over exploded elements)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return dot(ad, bd) / (norm(ad) * norm(bd))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard storage/
    bandwidth reducer for large embedding corpora (4 bytes → 1 byte per
    dim): ``scale = max(|v|)``, ``q_i = round(v_i / scale * 127)``.
    Reconstruction is ``q_i * scale / 127``.

    Pure per-row Catalyst expressions (transform / array_max / round) —
    zero shuffle at any scale, and fully deterministic: every element
    casts to DOUBLE before the divide so no engine does float32
    arithmetic, making the quantized codes replayable bit-exactly on an
    independent engine. All-zero vectors quantize to all zeros (scale 0
    kept, not NaN)."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") / scale * F.lit(127.0), 0).cast(
                "long"
            ),
        )
    )
    return df.withColumn("scale", scale).withColumn(out_col, q)


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``.
    Ties broken by id ascending. Rounding (default 6 dp) makes the score
    stable across engines for oracle comparison."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    sim = cosine(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def make_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seeded stdlib PRNG —
    no numpy dependency in the plan, reproducible across runs/clusters)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket key: one bit per hyperplane
    (sign of the dot product), packed into a long. Pure JVM expression."""
    key = F.lit(0).cast("long")
    v = vec.cast("array<double>")
    for i, p in enumerate(planes):
        bit = F.when(dot(v, F.lit(p).cast("array<double>")) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        key = key.bitwiseOR(F.shiftleft(bit.cast("long"), i))
    return key


def hyperplane_lsh(
    df: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
) -> DataFrame:
    """Assign every vector an SRP bucket: (id, bucket, vec). At scale,
    write this out partitioned/bucketed by ``bucket`` so ANN probes become
    partition-pruned scans."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_planes, seed)
    return df.select(
        F.col(id_col),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
        F.col(vec_col),
    )


def ann_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    max_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors whose SRP bucket is within
    ``max_hamming`` bits of the query's bucket (multi-probe LSH), then exact
    cosine + top-k inside that reduced candidate set.

    With n_planes=8 and max_hamming=1, candidates ≈ (9/256) of the corpus —
    a ~28× scan reduction that holds at any scale because bucketing is a
    plain filter (partition-prunable when bucketed storage is used)."""
    qv = [float(x) for x in query_vec]
    planes = make_hyperplanes(len(qv), n_planes, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(qv, p)) >= 0:
            qbucket |= 1 << i
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    hamming = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbucket)))
    cand = bucketed.where(hamming <= max_hamming)
    q = F.lit(qv).cast("array<double>")
    sim = cosine(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        cand.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --- IVF (inverted-file) ANN: learned centroids instead of random planes


def ivf_train(
    df: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    iters: int = 5,
    sample_limit: int = 20_000,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train IVF centroids with a few Lloyd iterations over a bounded
    driver-side sample (standard IVF practice: the coarse quantizer is
    trained on a sample, then assignment is distributed). Deterministic:
    seeded init, fixed iteration count, ties to lower index."""
    import numpy as np

    rows = df.select(vec_col).limit(sample_limit).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        sims = X @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) + 1e-12)
    return [c.tolist() for c in cents]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Assign every vector to its nearest (max cosine) centroid — one
    Arrow-batched pandas UDF doing a numpy matmul per batch (C cells ×
    batch rows; no per-row Python). At scale, persist partitioned by
    ``cell`` so probes prune to nprobe partitions."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64).T  # dim × cells

    @F.pandas_udf(IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.asarray([list(v) for v in vecs], dtype=np.float64)
        X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        return pd.Series(np.argmax(X @ C, axis=1).astype(np.int32))

    return df.withColumn(cell_col, nearest(F.col(vec_col)))


def ivf_pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The composed billion-scale ANN stack (FAISS's IVF-PQ shape): IVF
    cell pruning picks nprobe/n_cells of the corpus, then ADC over PQ
    codes ranks candidates without reading full vectors. At 100 TB:
    partition-prune on cell, then an m-byte-per-row scan — both stages
    already verified independently (sim_ann_ivf_topk /
    sim_ann_pq_adc_topk oracles)."""
    import numpy as np

    qv = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) + 1e-12)
    sims = np.asarray(centroids, dtype=np.float64) @ qn
    probe = [int(i) for i in np.argsort(-sims, kind="stable")[:nprobe]]
    cand = ivf_assign(df, centroids, vec_col).where(F.col("cell").isin(probe))
    coded = pq_encode(cand, codebooks, vec_col)
    return pq_adc_topk(coded, query_vec, codebooks, k, id_col, vec_col)


# --- Product quantization (PQ): sub-vector codebooks + asymmetric
# --- distance — the memory-bound ANN tier (codes are m bytes per vector)


def make_pq_codebooks(
    dim: int, m: int = 8, ks: int = 16, seed: int = 11, scale: float = 0.125
) -> list[list[list[float]]]:
    """Seeded deterministic PQ codebooks: ``m`` subspaces of ``dim/m``
    dims, ``ks`` codewords each — data-independent constants (the
    make_hyperplanes pattern) so an independent engine can replay
    encode/ADC exactly. ``pq_train`` (Lloyd) is the quality path; these
    pinned books are the verification path."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = random.Random(seed)
    sub = dim // m
    return [
        [[rng.gauss(0.0, scale) for _ in range(sub)] for _ in range(ks)]
        for _ in range(m)
    ]


def pq_train(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    seed: int = 11,
    iters: int = 5,
    sample_limit: int = 20_000,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks per subspace with a few Lloyd iterations over a
    bounded driver-side sample (standard PQ practice — codebooks are tiny
    and training is sample-based; encoding is the distributed part)."""
    import numpy as np

    rows = df.select(vec_col).limit(sample_limit).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        cents = Xs[rng.choice(len(Xs), size=min(ks, len(Xs)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = Xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([c.tolist() for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode every vector to ``m`` small codes (nearest codeword per
    subspace, L2, ties to the lower code — np.argmin's first-occurrence).
    One Arrow-batched pandas UDF, numpy distance matrices per subspace —
    map-side, zero shuffle; at scale the code column is what you persist
    (m bytes/vector instead of 4·dim)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        X = np.asarray([list(v) for v in vecs], dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * sub : (s + 1) * sub]
            d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, enc(F.col(vec_col)))


def pq_adc_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k over PQ codes: the
    driver precomputes the m×ks lookup table of squared distances from
    the query's subvectors to every codeword; each row's approximate
    distance is then a pure JVM fold over its m codes into the literal
    LUT (``F.aggregate`` + ``element_at`` — no Python, no shuffle, no
    vector column read). This is the memory-bandwidth-bound ANN shape:
    at 100 TB the scan touches m-byte codes, not 4·dim-byte vectors."""
    lut_flat: list[float] = []
    m = len(codebooks)
    ks = len(codebooks[0])
    sub = len(codebooks[0][0])
    q = [float(x) for x in query_vec]
    for s in range(m):
        qs = q[s * sub : (s + 1) * sub]
        for c in range(ks):
            w = codebooks[s][c]
            d = 0.0
            for i in range(sub):
                d += (qs[i] - w[i]) * (qs[i] - w[i])
            lut_flat.append(d)
    codes = F.col(code_col)
    lut = F.lit(lut_flat).cast("array<double>")
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(lut, (s * ks + F.element_at(codes, s + 1) + 1).cast("int")),
    )
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    encoded = df if code_col in df.columns else pq_encode(df, codebooks, vec_col, code_col)
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """IVF probe: pick the ``nprobe`` centroids nearest the query
    (driver-side, C is tiny), scan only those cells, exact cosine + top-k
    inside. Scan fraction ≈ nprobe / n_cells at any corpus size."""
    import numpy as np

    qv = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qv = qv / (np.linalg.norm(qv) + 1e-12)
    sims = np.asarray(centroids, dtype=np.float64) @ qv
    # stable sort: ties go to the lower cell id — the deterministic order
    # an oracle (ORDER BY dot DESC, cid ASC) reproduces exactly
    probe = [int(i) for i in np.argsort(-sims, kind="stable")[:nprobe]]
    cand = ivf_assign(df, centroids, vec_col).where(F.col("cell").isin(probe))
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    sim = cosine(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        cand.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
