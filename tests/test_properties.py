"""Property/fuzz tests for the bitmap container + BSI kernels — mirroring
the reference's quick-check-style randomized bitmap tests
(roaring/roaring_test.go, roaring/bitmap_slicing_test.go, SURVEY §5.3).
Pure numpy — no Spark session, so hundreds of cases run in seconds."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from featurebase_spark.plans.bitmap_index import (
    _bsi_cmp_shard,
    _dense_bits,
    _pack,
    _popcount,
    _unpack,
    bitmap_and,
    bitmap_andnot,
    bitmap_or,
    bitmap_xor,
)

# offsets spanning both container regimes (dense clusters + sparse tails)
offset_sets = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2_000),
        st.integers(min_value=0, max_value=1_000_000),
    ),
    max_size=300,
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.int64)))


@given(offset_sets)
@settings(max_examples=200, deadline=None)
def test_pack_unpack_roundtrip_property(offs):
    blob = _pack(offs)
    assert _unpack(blob).tolist() == offs.tolist()
    assert _popcount(blob) == len(offs)


@given(offset_sets, offset_sets)
@settings(max_examples=200, deadline=None)
def test_kernel_set_algebra_property(a, b):
    A, B = set(a.tolist()), set(b.tolist())
    pa, pb = _pack(a), _pack(b)
    assert set(_unpack(bitmap_and(pa, pb)).tolist()) == A & B
    assert set(_unpack(bitmap_or(pa, pb)).tolist()) == A | B
    assert set(_unpack(bitmap_andnot(pa, pb)).tolist()) == A - B
    assert set(_unpack(bitmap_xor(pa, pb)).tolist()) == A ^ B


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # offset
            st.integers(min_value=0, max_value=1023),  # value (unsigned span)
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["<", "<=", ">", ">=", "==", "!="]),
    st.integers(min_value=-5, max_value=1100),
)
@settings(max_examples=200, deadline=None)
def test_bsi_cmp_matches_python_filter(pairs, op, probe):
    """The per-shard BSI bit-descent must equal a plain comparison filter
    for every operator and probe, including out-of-range probes
    (executeRowBSIGroupShard semantics)."""
    offs = np.asarray([p[0] for p in pairs], dtype=np.int64)
    vals = np.asarray([p[1] for p in pairs], dtype=np.int64)
    nbits = 10
    nbytes = (int(offs.max()) >> 3) + 1
    planes = {-1: _dense_bits(offs, nbytes)}
    for b in range(nbits):
        planes[b] = _dense_bits(offs[(vals >> b) & 1 == 1], nbytes)
    res = _bsi_cmp_shard(planes, nbits, op, probe)
    got = set(
        np.flatnonzero(np.unpackbits(res, bitorder="little")).tolist()
    )
    py = {
        "<": vals < probe, "<=": vals <= probe, ">": vals > probe,
        ">=": vals >= probe, "==": vals == probe, "!=": vals != probe,
    }[op]
    assert got == set(offs[py].tolist())


def _spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # property file may run standalone
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.shuffle.partitions", "2")
            .getOrCreate()
        )
    return spark


@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=10, deadline=None)
def test_percentile_search_nearest_rank_property(values, nth):
    """percentile_search == the sorted nearest-rank definition, any ints."""
    import math

    from featurebase_spark.pql.calls import percentile_search

    df = _spark().createDataFrame([(v,) for v in values], "v LONG")
    rank = max(1, math.ceil(nth / 100.0 * len(values)))
    assert percentile_search(df, "v", nth) == sorted(values)[rank - 1]


# --- Float/decimal percentile vs DuckDB quantile_disc -----------------------
# The reference's Percentile is BSI (int-only); the float path is a declared
# extension whose exactness claim these tests lock against an independent
# engine. DuckDB's quantile_disc uses the same nearest-rank definition
# (verified: index == ceil(q*n)), so a direct comparison is a hard oracle.
# max_iters is deliberately driven low in some cases: correctness must hold
# for ANY iteration budget because the candidate-resolution step restores
# exactness from count(<=lo) regardless of how tight the bracket got.


def _duckdb_quantile_disc(values, nth):
    import duckdb

    return duckdb.sql(
        "SELECT quantile_disc(x, ?::DOUBLE) FROM (SELECT unnest(?::DOUBLE[]) x)",
        params=[nth / 100.0, list(values)],
    ).fetchone()[0]


def _check_float_percentile(values, nth, max_iters):
    from featurebase_spark.pql.calls import percentile_search

    df = _spark().createDataFrame([(float(v),) for v in values], "v DOUBLE")
    got = percentile_search(df, "v", nth, max_iters=max_iters)
    want = _duckdb_quantile_disc(values, nth)
    assert got == want, (sorted(values), nth, max_iters, got, want)


finite_doubles = st.floats(
    allow_nan=False,
    allow_infinity=False,
    allow_subnormal=True,
    width=64,
)


@given(
    st.lists(finite_doubles, min_size=1, max_size=30),
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=12),
)
@settings(max_examples=12, deadline=None)
def test_percentile_float_matches_duckdb_quantile_disc(values, nth, iters):
    """Arbitrary finite doubles (incl. subnormals, huge exponents, -0.0)
    at any iteration budget — the bracket search plus candidate resolution
    must equal DuckDB quantile_disc exactly."""
    _check_float_percentile(values, nth, max_iters=iters)


@pytest.mark.full  # ~2.5 min hypothesis battery: nightly path
@given(
    st.lists(
        st.sampled_from([0.25, 0.5, 1.0]), min_size=2, max_size=24
    ),  # heavy-tie pool
    st.lists(st.integers(min_value=-3, max_value=3), min_size=0, max_size=8),
    st.integers(min_value=1, max_value=99),
)
@settings(max_examples=12, deadline=None)
def test_percentile_float_ties_at_bracket_edges(base, ulp_steps, nth):
    """Massed duplicates plus ulp-adjacent neighbors of the tied value:
    the bracket endpoints land ON tie clusters, the regime where an
    off-by-one in count(<=lo) bookkeeping or a (lo, hi] boundary slip
    would surface. Adjacent doubles also exercise the cannot-split-further
    early exit."""
    import math as m

    anchor = base[0]
    values = list(base) + [
        m.nextafter(anchor, m.inf if s >= 0 else -m.inf) if s != 0 else anchor
        for s in ulp_steps
        for _ in range(1)
    ]
    # step k ulps away so some candidates differ only in the last bits
    vals = []
    for v, s in zip(values, list(ulp_steps) + [0] * len(values)):
        x = v
        for _ in range(abs(s)):
            x = m.nextafter(x, m.inf if s > 0 else -m.inf)
        vals.append(x)
    _check_float_percentile(vals, nth, max_iters=80)


@given(
    st.lists(
        st.one_of(
            st.floats(
                min_value=5e-324, max_value=1e-308, allow_subnormal=True, width=64
            ),
            st.sampled_from([0.0, -0.0, 5e-324, -5e-324]),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=10, deadline=None)
def test_percentile_float_subnormals(values, nth):
    """All-subnormal distributions: (hi-lo) underflows the relative-width
    stop condition's scale guard, and midpoints round to the endpoints —
    exactness must come from candidate resolution alone."""
    _check_float_percentile(values, nth, max_iters=80)


# --- JPEG codec properties (pure numpy, no Spark) ---------------------------


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_blocky_gray_roundtrip_exact_property(bh, bw, seed):
    """ANY per-8x8-block-constant gray image round-trips pixel-exactly
    through baseline JPEG with the flat Q=8 table — the invariant the
    multimodal_jpeg_decode oracle is built on, over random block grids."""
    import numpy as np

    from featurebase_spark.pipeline.media_codecs import (
        FLAT_QUANT8,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed % 2**31)
    blocks = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    dec = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT8))
    assert np.array_equal(dec[:, :, 0], img)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_arbitrary_gray_bounded_error_property(h, w, seed, restarts):
    """Arbitrary gray content (any size, incl. non-multiple-of-8 edges,
    with and without restart markers) decodes with small bounded error
    under flat Q=8 — every quantized coefficient is off by ≤4."""
    import numpy as np

    from featurebase_spark.pipeline.media_codecs import (
        FLAT_QUANT8,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    payload = encode_jpeg(
        img, quant=FLAT_QUANT8, restart_interval=2 if restarts else 0
    )
    dec = decode_jpeg(payload)
    assert dec.shape == (h, w, 1)
    assert int(np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()) <= 16


# --- r6: deterministic-sampling cross-engine parity ------------------------


@given(
    st.lists(
        st.one_of(
            st.integers(-2**62, 2**62),
            # exclude NUL (DuckDB VARCHAR rejects it) and surrogates
            # (not UTF-8-encodable); everything else round-trips
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\x00",
                    blacklist_categories=("Cs",),
                ),
                min_size=0, max_size=40,
            ),
        ),
        min_size=1, max_size=60, unique=True,
    ),
    st.integers(0, 2**31),
    st.floats(0.0, 1.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_hash_uniform_matches_duckdb_md5_property(keys, seed, rate):
    """The sampling family's whole cross-engine contract is that
    ``md5(seed || ':' || CAST(key AS VARCHAR))`` produces the same hex
    in Spark and DuckDB, and the threshold compare partitions keys
    identically. Replay the decision in DuckDB for random keys/seeds/
    rates and require exact agreement (Python's hashlib stands in for
    Spark's md5 — same algorithm, verified equal in the gate keys)."""
    import hashlib

    import duckdb

    from featurebase_spark.pipeline.sampling import hex_threshold

    thr = hex_threshold(rate)
    con = duckdb.connect()
    for k in keys:
        ks = str(k)  # Spark CAST(long AS STRING) == str for integers
        py_hex = hashlib.md5(f"{seed}:{ks}".encode()).hexdigest()[:8]
        duck_hex = con.execute(
            "SELECT substr(md5(? || ':' || ?), 1, 8)", [str(seed), ks]
        ).fetchone()[0]
        assert py_hex == duck_hex
        assert (py_hex < thr) == (duck_hex < thr)
    con.close()


@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_progressive_equals_baseline_property(h, w, seed, color):
    """For ANY image content, the progressive scan script (spectral
    selection + successive approximation, EOB runs, AC refinement
    correction bits) must decode to EXACTLY the same pixels as the
    baseline encoding — both carry the same quantized coefficients."""
    from featurebase_spark.pipeline import media_codecs as MC

    rng = np.random.default_rng(seed)
    if color:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    else:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    base = MC.decode_jpeg(MC.encode_jpeg(img))
    prog = MC.decode_jpeg(MC.encode_jpeg(img, progressive=True))
    assert np.array_equal(base, prog)


@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_noninterleaved_equals_interleaved_property(h, w, seed):
    """Scan layout must never change decoded pixels: non-interleaved
    (one SOS per component) == interleaved for random color content,
    including 4:2:0 where per-component block grids differ."""
    from featurebase_spark.pipeline import media_codecs as MC

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for kw in ({}, {"subsample": True}):
        a = MC.decode_jpeg(MC.encode_jpeg(img, **kw))
        b = MC.decode_jpeg(MC.encode_jpeg(img, interleaved=False, **kw))
        assert np.array_equal(a, b), kw


# ---------------------------------------------------------------------------
# Temperature-mix threshold: the r6→r7 integer-exact contract
# ---------------------------------------------------------------------------

def _w_int_py(s: int) -> int:
    """Python emulation of the engine weight freeze: one correctly-
    rounded sqrt + one correctly-rounded multiply + floor. math and
    numpy float64 execute the identical IEEE ops the engines do."""
    import math

    return math.floor(math.sqrt(float(s)) * 10000.0)


def _thr_py(sizes: dict, tf_num: int = 5000, tf_den: int = 10000) -> dict:
    """Pure-Python-int replay of temperature_rates' threshold: after the
    weight freeze there is NO floating-point op — sums, the ppb share,
    and the final ratio are exact integer arithmetic."""
    tot_size = sum(sizes.values())
    w = {k: _w_int_py(v) for k, v in sizes.items()}
    tot_w = sum(w.values())
    out = {}
    for k, s in sizes.items():
        share = max(1, (s * 10**9) // tot_size)
        out[k] = (tf_num * w[k] * (1 << 32) * 10**9) // (
            tf_den * tot_w * share
        )
    return out


@given(st.integers(min_value=1, max_value=2**53))
@settings(max_examples=300, deadline=None)
def test_weight_freeze_bit_identical_across_engines_property(s):
    """The ONLY engine-executed float op left in the mix contract:
    w_int = floor(sqrt(s)*1e4). sqrt and multiply are correctly rounded
    per IEEE-754, so DuckDB, numpy, and libm must agree BIT-EXACTLY —
    stronger than any ulp tolerance."""
    import duckdb

    py = _w_int_py(s)
    np64 = int(np.floor(np.sqrt(np.float64(s)) * np.float64(10000.0)))
    du = duckdb.sql(
        f"SELECT CAST(floor(sqrt(CAST({s} AS DOUBLE)) * 10000.0) AS BIGINT)"
    ).fetchone()[0]
    assert py == np64 == du


@given(
    st.lists(
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=10000),
)
@settings(max_examples=60, deadline=None)
def test_temperature_threshold_integer_exact_vs_duckdb_property(
    sizes, tf_num
):
    """The full threshold derivation is engine-version-proof: a pure
    Python int replay must equal DuckDB's HUGEINT replay for arbitrary
    source sizes and target fractions. (The r6 driver divergence came
    from decimal<->double conversion differences between DuckDB builds —
    a class of perturbation that cannot touch integer '//'.)"""
    import duckdb

    table = {f"s{i}": v for i, v in enumerate(sizes)}
    expect = _thr_py(table, tf_num=tf_num)
    rows = ", ".join(f"('{k}', {v})" for k, v in table.items())
    got = dict(
        duckdb.sql(
            "WITH sizes(source, src_size) AS (VALUES " + rows + "), "
            "sized AS (SELECT source, src_size, CAST(floor(sqrt(CAST("
            "src_size AS DOUBLE)) * 10000.0) AS BIGINT) AS w_int FROM sizes), "
            "tot AS (SELECT SUM(src_size) AS tot_size, SUM(w_int) AS tot_w "
            "        FROM sized) "
            "SELECT source, "
            f"({tf_num}::HUGEINT * CAST(w_int AS HUGEINT) * "
            "4294967296::HUGEINT * 1000000000::HUGEINT) // "
            "(10000::HUGEINT * CAST(tot_w AS HUGEINT) * "
            " GREATEST(1::HUGEINT, (CAST(src_size AS HUGEINT) * 1000000000) "
            "          // CAST(tot_size AS HUGEINT))) "
            "FROM sized, tot"
        ).fetchall()
    )
    assert got == expect


def test_temperature_threshold_survives_ulp_perturbation():
    """The measured r6 failure class: the driver's engine produced a
    rate differing by ~5e-13 relative (thousands of ulps). Emulate an
    adversarial engine by perturbing the OLD contract's intermediate
    double (the derived rate) by ±1..±4096 ulp: the old hex freeze
    flips for many size tables, while the new integer threshold — which
    consumes no such double — is invariant by construction (recomputed
    under every perturbation; the perturbed value has nowhere to
    enter)."""
    import math

    flips = 0
    for trial in range(500):
        # deterministic pseudo-random size tables (no RNG in contract)
        sizes = {
            f"s{i}": 1 + (trial * 2654435761 + i * 40503) % 10**9
            for i in range(1 + trial % 8)
        }
        tot = sum(sizes.values())
        w = {k: math.sqrt(float(v)) for k, v in sizes.items()}
        tot_w = sum(w.values())
        base_new = _thr_py(sizes)
        for k, s in sizes.items():
            rate = min(1.0, (0.5 * tot) * (w[k] / tot_w) / s)
            old_hex = math.floor(rate * 2**32)
            for ulps in (-4096, -1, 1, 4096):
                pert = math.nextafter(
                    rate, math.inf if ulps > 0 else -math.inf
                )
                for _ in range(abs(ulps) - 1):
                    pert = math.nextafter(
                        pert, math.inf if ulps > 0 else -math.inf
                    )
                if math.floor(min(1.0, pert) * 2**32) != old_hex:
                    flips += 1
                # the new contract re-derived under the same perturbed
                # environment: identical, because the threshold is a
                # function of integers only
                assert _thr_py(sizes) == base_new
    # the old contract really was fragile at this perturbation scale
    assert flips > 0


@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1,
             max_size=60),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_heavy_hitter_pigeonhole_superset_property(counts, p, thr):
    """The candidate cut heavy_hitters relies on, as pure math: for ANY
    split of an item's occurrences across p partitions, an item with
    global count ≥ T has ≥ ceil(T/p) occurrences in SOME partition —
    so the per-partition cut can never drop a true heavy hitter."""
    import math
    import random

    rng = random.Random(p * 1_000_003 + thr)
    local_thr = max(1, math.ceil(thr / p))
    for item_id, c in enumerate(counts):
        # adversarial-ish random split of c occurrences into p parts
        parts = [0] * p
        for _ in range(c):
            parts[rng.randrange(p)] += 1
        if c >= thr:
            assert max(parts) >= local_thr, (c, thr, p, parts)


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
             max_size=200),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_grouped_percentile_rank_formula_cross_engine_property(
    vals, permille
):
    """The nearest-rank formula grouped_percentile and its oracle share:
    smallest v with cumulative count ≥ (permille·n + 999) // 1000 —
    DuckDB's replay must equal the Python sort for arbitrary multisets
    and permilles (integer arithmetic: no engine surface)."""
    import duckdb

    svals = sorted(vals)
    r = (permille * len(svals) + 999) // 1000
    want = svals[max(r, 1) - 1]
    rows = ", ".join(f"({v})" for v in vals)
    got = duckdb.sql(
        f"WITH x(v) AS (VALUES {rows}), "
        "c AS (SELECT v, COUNT(*) AS cnt FROM x GROUP BY v), "
        "t AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, "
        "      SUM(cnt) OVER () AS n FROM c) "
        f"SELECT MIN(v) FROM t WHERE cum >= ({permille} * n + 999) // 1000"
    ).fetchone()[0]
    assert got == want
