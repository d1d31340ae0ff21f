"""Bitmap-index library vs the plain DataFrame path — every answer from
index blobs must equal the scan-based answer (the reference's contract:
PQL over fragments ≡ SQL over rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.plans.bitmap_index import (
    And,
    AndNot,
    Atom,
    BitmapCatalog,
    Or,
    XOr,
    _pack,
    _popcount,
    _unpack,
    bitmap_and,
    bitmap_andnot,
    bitmap_or,
    bitmap_xor,
)

import numpy as np


def test_pack_unpack_roundtrip():
    offs = np.array([0, 1, 7, 8, 63, 64, 1000], dtype=np.int64)
    blob = _pack(offs)
    assert _unpack(blob).tolist() == offs.tolist()
    assert _popcount(blob) == 7
    assert _unpack(b"").tolist() == []
    assert _popcount(b"") == 0


def test_kernels_match_set_algebra():
    a = _pack(np.array([1, 2, 3, 100]))
    b = _pack(np.array([2, 3, 4]))
    assert _unpack(bitmap_and(a, b)).tolist() == [2, 3]
    assert _unpack(bitmap_or(a, b)).tolist() == [1, 2, 3, 4, 100]
    assert _unpack(bitmap_andnot(a, b)).tolist() == [1, 100]
    assert _unpack(bitmap_xor(a, b)).tolist() == [1, 4, 100]
    # unequal lengths / empty operands
    assert _unpack(bitmap_and(a, b"")).tolist() == []
    assert _unpack(bitmap_or(b"", b)).tolist() == [2, 3, 4]


def test_container_encoding_choice_and_size():
    """Roaring's container choice (VERDICT r1 #3, run containers r5): a
    sparse fragment costs ~4 bytes/bit (array), a CONSECUTIVE range
    costs 8 bytes/run (RLE), and only run-free dense populations pay the
    2^exp/8-byte bitset."""
    from featurebase_spark.plans.bitmap_index import _ARRAY, _DENSE, _RUN

    sparse = _pack(np.array([1_000_000], dtype=np.int64))
    assert sparse[0] == _ARRAY and len(sparse) == 5  # tag + one uint32
    consec = _pack(np.arange(0, 4096, dtype=np.int64))
    assert consec[0] == _RUN and len(consec) == 9  # one (start, len) pair
    dense = _pack(np.arange(0, 8192, 2, dtype=np.int64))  # no runs
    assert dense[0] == _DENSE and len(dense) == 1 + (8191 // 8) + 1
    # break-even boundary both ways
    assert _unpack(sparse).tolist() == [1_000_000]
    assert _popcount(consec) == 4096
    assert _popcount(dense) == 4096


@pytest.mark.parametrize("kern,op", [
    (bitmap_and, "&"), (bitmap_or, "|"),
    (bitmap_andnot, "-"), (bitmap_xor, "^"),
])
def test_kernels_mixed_container_forms(kern, op):
    """Every kernel must be correct across dense×dense, dense×array,
    array×dense, array×array — roaring's per-pair dispatch."""
    rng = np.random.RandomState(7)
    dense_set = np.unique(rng.randint(0, 2000, 900))        # dense-encoded
    sparse_set = np.unique(rng.randint(0, 2_000_000, 50))   # array-encoded
    for sa in (dense_set, sparse_set):
        for sb in (dense_set[10:], sparse_set[5:]):
            got = set(_unpack(kern(_pack(sa), _pack(sb))).tolist())
            A, B = set(sa.tolist()), set(sb.tolist())
            exp = {"&": A & B, "|": A | B, "-": A - B, "^": A ^ B}[op]
            assert got == exp


def test_sparse_fragments_bounded_at_full_shard_width(spark):
    """shard_exp=20 (the reference's real width): records spread over 100
    shards with a 3-value field must produce ~5-byte fragments, not
    128 KB dense blobs."""
    ids = [(i << 20) + (i * 37 % 1024) for i in range(100)]
    df = spark.createDataFrame(
        [(i, f"v{n % 3}") for n, i in enumerate(ids)], "_id LONG, f STRING"
    )
    c = BitmapCatalog(shard_exp=20)
    idx = c.index_field(df, "f")
    frags = idx.collect()
    assert len(frags) == 100  # one (value, shard) fragment per record here
    max_bytes = max(len(bytes(r["bitmap"])) for r in frags)
    assert max_bytes <= 8, f"sparse fragment blew up to {max_bytes} bytes"
    assert c.count(Atom("f", "v0")) == sum(1 for n in range(100) if n % 3 == 0)
    got = sorted(r["_id"] for r in c.ids(Atom("f", "v1")).collect())
    assert got == sorted(i for n, i in enumerate(ids) if n % 3 == 1)


def test_catalog_save_load_roundtrip(spark, tables, tmp_path):
    ev = tables["events"]
    c = BitmapCatalog(shard_exp=8)
    c.index_field(ev, "event_type", id_col="event_id")
    c.index_bsi_field(
        ev.withColumn("iv", F.col("value").cast("long")), "iv", id_col="event_id"
    )
    from featurebase_spark.plans.bitmap_index import Cmp

    want_cnt = c.count(Atom("event_type", "click"))
    want_sum = c.bsi_sum("iv", Atom("event_type", "click"))
    c.save(str(tmp_path / "bmidx"))
    c2 = BitmapCatalog.load(spark, str(tmp_path / "bmidx"))
    assert c2.shard_exp == 8
    assert c2.count(Atom("event_type", "click")) == want_cnt
    assert c2.bsi_sum("iv", Atom("event_type", "click")) == want_sum
    assert c2.count(Cmp("iv", ">", 100)) == c.count(Cmp("iv", ">", 100))


def test_tree_eval_single_shuffle_plan(tables):
    """The whole And/Or tree must evaluate in ONE groupBy(shard) pass —
    leaf union + one FlatMapGroupsInPandas, not one join per operand."""
    ev = tables["events"]
    c = BitmapCatalog(shard_exp=8)
    c.index_field(ev, "event_type", id_col="event_id")
    c.index_field(ev, "user_id", id_col="event_id")
    node = Or(
        And(Atom("event_type", "click"), Atom("user_id", 12)),
        AndNot(Atom("event_type", "view"), Atom("user_id", 7)),
    )
    plan = c._eval(node)._jdf.queryExecution().executedPlan().toString()
    # exactly one tree-eval pass (the other FlatMapGroupsInPandas nodes in
    # the lineage are the index BUILD, pack_group — materialized once)
    assert plan.count("eval_shard") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


@pytest.fixture(scope="module")
def cat(tables):
    c = BitmapCatalog(shard_exp=8)  # small shards → exercises multi-shard merge
    ev = tables["events"]
    c.index_field(ev, "event_type", id_col="event_id")
    c.index_field(ev, "user_id", id_col="event_id")
    return c


def test_index_count_atom(cat, tables):
    ev = tables["events"]
    got = cat.count(Atom("event_type", "click"))
    exp = ev.where(F.col("event_type") == "click").count()
    assert got == exp


def test_index_count_and_or(cat, tables):
    ev = tables["events"]
    a, b = Atom("event_type", "click"), Atom("user_id", 12)
    assert cat.count(And(a, b)) == ev.where(
        (F.col("event_type") == "click") & (F.col("user_id") == 12)
    ).count()
    assert cat.count(Or(a, b)) == ev.where(
        (F.col("event_type") == "click") | (F.col("user_id") == 12)
    ).count()
    assert cat.count(AndNot(a, b)) == ev.where(
        (F.col("event_type") == "click") & ~(F.col("user_id") == 12)
    ).count()
    assert cat.count(XOr(a, b)) == ev.where(
        (F.col("event_type") == "click") != (F.col("user_id") == 12)
    ).count()


def test_index_nested_expression(cat, tables):
    ev = tables["events"]
    expr = And(
        Or(Atom("event_type", "click"), Atom("event_type", "view")),
        Atom("user_id", 7),
    )
    exp = ev.where(
        F.col("event_type").isin("click", "view") & (F.col("user_id") == 7)
    ).count()
    assert cat.count(expr) == exp


def test_index_ids_roundtrip(cat, tables):
    ev = tables["events"]
    got = sorted(r["_id"] for r in cat.ids(Atom("event_type", "signup")).collect())
    exp = sorted(
        r["event_id"]
        for r in ev.where(F.col("event_type") == "signup").select("event_id").collect()
    )
    assert got == exp


def test_index_topk(cat, tables):
    ev = tables["events"]
    got = [(r["value"], r["count"]) for r in cat.topk_values("event_type", 3).collect()]
    exp = [
        (r["event_type"], r["cnt"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(3)
        .collect()
    ]
    assert got == exp


def test_index_on_bool_field(spark):
    """Boolean atoms: Python str(True)='True' but the index stores Spark
    cast('string')='true' — lookup must use the Spark casting rule."""
    df = spark.createDataFrame(
        [(0, True), (1, False), (2, True), (3, None)], "_id LONG, flag BOOLEAN"
    )
    c = BitmapCatalog(shard_exp=8)
    c.index_field(df, "flag")
    assert c.count(Atom("flag", True)) == 2
    assert c.count(Atom("flag", False)) == 1
    assert sorted(r["_id"] for r in c.ids(Atom("flag", True)).collect()) == [0, 2]


def test_index_on_set_field(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["b"]), (2, None), (300, ["a"])],
        "_id LONG, tags ARRAY<STRING>",
    )
    c = BitmapCatalog(shard_exp=8)
    c.index_field(df, "tags")
    assert c.count(Atom("tags", "a")) == 2
    assert c.count(Atom("tags", "b")) == 2
    assert sorted(r["_id"] for r in c.ids(Atom("tags", "a")).collect()) == [0, 300]


# --- BSI (bit-sliced integer) index: Cmp / Sum / Min / Max ------------------


@pytest.fixture(scope="module")
def bsi_cat(tables):
    c = BitmapCatalog(shard_exp=8)
    ev = tables["events"]
    c.index_field(ev, "event_type", id_col="event_id")
    c.index_bsi_field(ev.withColumn("ivalue", F.col("value").cast("long")),
                      "ivalue", id_col="event_id")
    return c


@pytest.mark.parametrize("op", ["<", "<=", ">", ">=", "==", "!="])
def test_bsi_cmp_matches_scan(bsi_cat, tables, op):
    from featurebase_spark.plans.bitmap_index import Cmp

    ev = tables["events"].withColumn("ivalue", F.col("value").cast("long"))
    for v in (150, 0, 10_000_000):  # mid / below-range / above-range
        got = bsi_cat.count(Cmp("ivalue", op, v))
        exp = ev.where(
            F.expr(f"ivalue {'=' if op == '==' else op} {v}")
            & F.col("ivalue").isNotNull()
        ).count()
        assert got == exp, (op, v)


def test_bsi_cmp_composes_with_atoms(bsi_cat, tables):
    from featurebase_spark.plans.bitmap_index import Cmp

    ev = tables["events"].withColumn("ivalue", F.col("value").cast("long"))
    expr = And(Atom("event_type", "click"), Cmp("ivalue", ">", 150))
    exp = ev.where((F.col("event_type") == "click") & (F.col("ivalue") > 150)).count()
    assert bsi_cat.count(expr) == exp


def test_bsi_sum(bsi_cat, tables):
    from featurebase_spark.plans.bitmap_index import Cmp

    ev = tables["events"].withColumn("ivalue", F.col("value").cast("long"))
    assert bsi_cat.bsi_sum("ivalue") == (
        ev.agg(F.sum("ivalue")).first()[0] or 0
    )
    got = bsi_cat.bsi_sum("ivalue", Atom("event_type", "click"))
    exp = ev.where(F.col("event_type") == "click").agg(F.sum("ivalue")).first()[0]
    assert got == int(exp or 0)
    got = bsi_cat.bsi_sum("ivalue", Cmp("ivalue", "<", 100))
    exp = ev.where(F.col("ivalue") < 100).agg(F.sum("ivalue")).first()[0]
    assert got == int(exp or 0)


def test_bsi_min_max(bsi_cat, tables):
    ev = tables["events"].withColumn("ivalue", F.col("value").cast("long"))
    assert bsi_cat.bsi_max("ivalue") == ev.agg(F.max("ivalue")).first()[0]
    assert bsi_cat.bsi_min("ivalue") == ev.agg(F.min("ivalue")).first()[0]
    got = bsi_cat.bsi_max("ivalue", Atom("event_type", "signup"))
    exp = ev.where(F.col("event_type") == "signup").agg(F.max("ivalue")).first()[0]
    assert got == exp
    got = bsi_cat.bsi_min("ivalue", Atom("event_type", "signup"))
    exp = ev.where(F.col("event_type") == "signup").agg(F.min("ivalue")).first()[0]
    assert got == exp


def test_bsi_negative_values(spark):
    from featurebase_spark.plans.bitmap_index import Cmp

    df = spark.createDataFrame(
        [(0, -50), (1, -3), (2, 0), (3, 7), (300, 900), (301, None)],
        "_id LONG, x LONG",
    )
    c = BitmapCatalog(shard_exp=8)
    c.index_bsi_field(df, "x")
    assert c.bsi_sum("x") == -50 - 3 + 0 + 7 + 900
    assert c.bsi_min("x") == -50 and c.bsi_max("x") == 900
    assert c.count(Cmp("x", "<", 0)) == 2
    assert c.count(Cmp("x", ">=", 0)) == 3
    assert c.count(Cmp("x", "==", -3)) == 1
    assert c.count(Cmp("x", "!=", -3)) == 4  # nulls excluded, like the reference


# --- Router: PQL call trees → bitmap expressions ----------------------------


def test_router_routes_and_matches_scan(bsi_cat, tables):
    from featurebase_spark.plans.router import route_count, to_bitmap_expr
    from featurebase_spark.pql import calls as C

    ev = tables["events"]
    idx = C.Index(
        ev.withColumn("ivalue", F.col("value").cast("long")),
        id_col="event_id",
    )
    shapes = [
        C.Row("event_type", "==", "click"),
        C.Intersect(C.Row("event_type", "==", "click"), C.Row("ivalue", ">", 150)),
        C.Union(C.Row("event_type", "==", "view"), C.Row("event_type", "==", "signup")),
        C.Difference(C.Row("ivalue", ">=", 100), C.Row("event_type", "==", "click")),
        C.Xor(C.Row("event_type", "==", "click"), C.Row("ivalue", "<", 50)),
    ]
    for call in shapes:
        assert to_bitmap_expr(bsi_cat, call) is not None, call
        routed = route_count(bsi_cat, C.Count(call))
        scanned = route_count(
            # empty catalog → forces the scan fallback
            type(bsi_cat)(shard_exp=8), C.Count(call), idx=idx
        )
        assert routed == scanned, call


def test_router_routes_aggregates_and_topk(bsi_cat, tables):
    from featurebase_spark.plans.router import route_call
    from featurebase_spark.pql import calls as C

    ev = tables["events"]
    idx = C.Index(
        ev.withColumn("ivalue", F.col("value").cast("long")), id_col="event_id"
    )
    empty = type(bsi_cat)(shard_exp=8)
    for call in (
        C.Sum("ivalue", filter=C.Row("event_type", "==", "click")),
        C.Min("ivalue"),
        C.Max("ivalue", filter=C.Row("event_type", "==", "view")),
    ):
        routed = route_call(bsi_cat, call)
        scanned = route_call(empty, call, idx=idx)
        assert routed == scanned, call
    top_routed = route_call(bsi_cat, C.TopK("event_type", 3)).collect()
    top_scanned = C.TopK("event_type", 3).to_df(idx).collect()
    assert [(r["value"], r["count"]) for r in top_routed] == [
        (str(r["event_type"]), r["count"]) for r in top_scanned
    ]


def test_router_falls_back_on_uncovered_shapes(bsi_cat, tables):
    from featurebase_spark.plans.router import to_bitmap_expr
    from featurebase_spark.pql import calls as C

    # unindexed field / LIKE-ish / time-range / Not → not index-covered
    assert to_bitmap_expr(bsi_cat, C.Row("props", "==", "x")) is None
    assert to_bitmap_expr(bsi_cat, C.Row("event_type", "==", "c", from_="2024-01-01")) is None
    assert to_bitmap_expr(bsi_cat, C.Not(C.Row("event_type", "==", "c"))) is None
    assert (
        to_bitmap_expr(
            bsi_cat,
            C.Intersect(C.Row("event_type", "==", "c"), C.Row("props", "==", "x")),
        )
        is None
    )


def test_incremental_index_update(spark):
    """update_field merges delta fragments by OR on (value, shard) —
    counts/ids after the merge equal a from-scratch rebuild."""
    base = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(50)], "_id LONG, f STRING"
    )
    delta = spark.createDataFrame(
        [(i, f"v{i % 4}") for i in range(50, 80)], "_id LONG, f STRING"
    )
    inc = BitmapCatalog(shard_exp=4)  # many shards → real multi-shard merge
    inc.index_field(base, "f")
    inc.update_field(delta, "f")
    full = BitmapCatalog(shard_exp=4)
    full.index_field(base.unionByName(delta), "f")
    for v in ("v0", "v1", "v2", "v3"):
        assert inc.count(Atom("f", v)) == full.count(Atom("f", v)), v
        got = sorted(r["_id"] for r in inc.ids(Atom("f", v)).collect())
        exp = sorted(r["_id"] for r in full.ids(Atom("f", v)).collect())
        assert got == exp, v


def test_router_percentile_from_bsi_planes(bsi_cat, tables):
    """Percentile answered entirely from BSI plane counts — the
    reference's own executePercentile strategy — equals the scan path."""
    from featurebase_spark.plans.router import route_call
    from featurebase_spark.pql import calls as C

    ev = tables["events"]
    idx = C.Index(
        ev.withColumn("ivalue", F.col("value").cast("long")), id_col="event_id"
    )
    for nth in (10, 50, 90, 100):
        routed = route_call(bsi_cat, C.Percentile("ivalue", nth))
        scanned = C.Percentile("ivalue", nth).to_df(idx).first()["percentile"]
        assert routed == scanned, nth
    routed = route_call(
        bsi_cat,
        C.Percentile("ivalue", 75, filter=C.Row("event_type", "==", "click")),
    )
    scanned = (
        C.Percentile("ivalue", 75, filter=C.Row("event_type", "==", "click"))
        .to_df(idx)
        .first()["percentile"]
    )
    assert routed == scanned


def test_bsi_minmax_single_pass(bsi_cat, tables):
    ev = tables["events"].withColumn("iv", F.col("value").cast("long"))
    mn, mx = bsi_cat.bsi_minmax("ivalue", Atom("event_type", "click"))
    assert mn == bsi_cat.bsi_min("ivalue", Atom("event_type", "click"))
    assert mx == bsi_cat.bsi_max("ivalue", Atom("event_type", "click"))
    mn2, mx2 = bsi_cat.bsi_minmax("ivalue")
    exp = ev.agg(F.min("iv"), F.max("iv")).first()
    assert (mn2, mx2) == (exp[0], exp[1])


def test_router_fallback_scalar_contract(bsi_cat, tables):
    """Fallback keeps the routed contract (ADVICE r2): Percentile's
    non-coverable-filter fallback returns the SCALAR, and Sum fallback
    does not int()-truncate a non-integral scan result."""
    from featurebase_spark.plans.router import route_call
    from featurebase_spark.pql import calls as C

    ev = tables["events"]
    idx = C.Index(
        ev.withColumn("ivalue", F.col("value").cast("long")), id_col="event_id"
    )
    # props is unindexed → filter not coverable → scan fallback
    filt = C.Row("event_type", "==", "click")
    uncov = C.Intersect(filt, C.Row("props", "==", "x"))
    got = route_call(bsi_cat, C.Percentile("ivalue", 50, filter=uncov), idx=idx)
    exp = (
        C.Percentile("ivalue", 50, filter=uncov).to_df(idx).first()["percentile"]
    )
    assert got == exp and not hasattr(got, "collect")
    # Sum over the FLOAT field 'value' is not BSI-indexed → fallback; the
    # exact (non-truncated) scan answer must come back
    sum_got = route_call(bsi_cat, C.Sum(field="value", filter=filt), idx=idx)
    sum_exp = C.Sum(field="value", filter=filt).to_df(idx).first()[0]
    assert sum_got == sum_exp and isinstance(sum_got, float)


def test_driver_serving_path_matches_distributed(spark, tables, tmp_path):
    """The driver fragment-cache serving path (small persisted index,
    n_shards <= DRIVER_SHARD_LIMIT) returns exactly what the distributed
    scatter/gather returns, for counts, BSI aggregates and min/max —
    and a reloaded catalog knows its shard count."""
    from featurebase_spark.plans.bitmap_index import Cmp

    ev = tables["events"].withColumn("iv", F.col("value").cast("long"))
    c = BitmapCatalog(shard_exp=8)
    c.index_field(ev, "event_type", id_col="event_id")
    c.index_field(ev, "user_id", id_col="event_id")
    c.index_bsi_field(ev, "iv", id_col="event_id")
    c.save(str(tmp_path / "bm_served"))
    cat = BitmapCatalog.load(spark, str(tmp_path / "bm_served"))
    assert cat.n_shards is not None and cat.n_shards >= 1
    assert cat._driver_ok("auto")

    click = Atom("event_type", "click")
    trees = [
        And(click, Atom("user_id", 12)),
        Or(click, Atom("user_id", 12)),
        AndNot(click, Cmp("iv", ">", 100)),
        XOr(Atom("user_id", 7), Cmp("iv", "<=", 50)),
        Cmp("iv", "==", 120),
    ]
    assert cat.counts(trees, mode="driver") == cat.counts(
        trees, mode="distributed"
    )
    assert cat.bsi_sum("iv", click, mode="driver") == cat.bsi_sum(
        "iv", click, mode="distributed"
    )
    assert cat.bsi_sum("iv", None, mode="driver") == cat.bsi_sum(
        "iv", None, mode="distributed"
    )
    assert cat.bsi_minmax("iv", click, mode="driver") == cat.bsi_minmax(
        "iv", click, mode="distributed"
    )
    assert cat.bsi_min("iv", mode="driver") == cat.bsi_min(
        "iv", mode="distributed"
    )
    assert cat.bsi_max("iv", click, mode="driver") == cat.bsi_max(
        "iv", click, mode="distributed"
    )


def test_fragment_cache_hot_serving(spark, tables, tmp_path):
    """Repeated queries over the same leaves serve from the driver
    fragment LRU — no further storage scans (the reference's row cache,
    cache.go:19-45) — and eviction keeps the cache bounded."""
    ev = tables["events"]
    c = BitmapCatalog(shard_exp=8)
    c.index_field(ev, "event_type", id_col="event_id")
    c.save(str(tmp_path / "bm_cache"))
    cat = BitmapCatalog.load(spark, str(tmp_path / "bm_cache"))

    calls = {"n": 0}
    orig = cat._leaves_frame

    def counting(leaves):
        calls["n"] += 1
        return orig(leaves)

    cat._leaves_frame = counting
    a = Atom("event_type", "click")
    first = cat.count(a)
    assert calls["n"] == 1
    for _ in range(3):
        assert cat.count(a) == first
    assert calls["n"] == 1  # pure cache hits — zero Spark jobs
    # eviction: a tiny cap forces the old entry out
    cat.frag_cache_cap = 1
    cat.count(Atom("event_type", "view"))
    assert len(cat._frag_cache) == 1  # click evicted, view resident


def test_driver_cache_invalidated_on_update(spark, tmp_path):
    """Incremental update_field must invalidate the driver fragment cache
    for the touched field — a cached count would otherwise serve
    pre-update fragments."""
    base = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(50)], "_id LONG, f STRING"
    )
    c = BitmapCatalog(shard_exp=4)
    c.index_field(base, "f")
    c.save(str(tmp_path / "bm_upd"))
    cat = BitmapCatalog.load(spark, str(tmp_path / "bm_upd"))
    before = cat.count(Atom("f", "v0"))  # populates the driver cache
    delta = spark.createDataFrame(
        [(i, "v0") for i in range(50, 60)], "_id LONG, f STRING"
    )
    cat.update_field(delta, "f", cache=False)
    assert cat.count(Atom("f", "v0")) == before + 10


def test_atom_identity_canonicalized(cat, tables):
    """Atom('user_id', 12) and Atom('user_id', '12') match the SAME
    fragments (values are stored cast-to-string), so they must BE the
    same leaf — distinct Python identities used to survive dedup, and
    the exclusive CASE tag in _leaves_frame handed the shared fragment
    rows to only the first, silently zeroing (and cache-poisoning) the
    second (ADVICE r3)."""
    ev = tables["events"]
    assert Atom("user_id", 12) == Atom("user_id", "12")
    assert Atom("flag", True).value == "true"  # Spark's CAST rendering
    exp = ev.where(F.col("user_id") == 12).count()
    assert exp > 0
    # both spellings in ONE batch: each must count the full fragment set,
    # on the distributed path and the driver-cache path alike
    for mode in ("distributed", "driver"):
        got = cat.counts([Atom("user_id", 12), Atom("user_id", "12")], mode=mode)
        assert got == [exp, exp], mode
    # and mixed spellings inside one tree
    assert cat.count(Or(Atom("user_id", 12), Atom("user_id", "12"))) == exp


def test_run_container_roundtrip_and_kernels():
    """Roaring RUN containers (roaring/containers_*.go RLE): consecutive
    id ranges collapse to (start, len) pairs — chosen whenever cheaper
    than array AND dense — with O(runs) popcount and correct kernel
    results across mixed container types."""
    import itertools

    import numpy as np

    import featurebase_spark.plans.bitmap_index as B

    run = B._pack(np.arange(1000))
    assert run[0] == B._RUN and len(run) == 9  # 1 run = 8 bytes + tag
    assert B._popcount(run) == 1000
    assert np.array_equal(B._unpack(run), np.arange(1000))
    two = B._pack(np.concatenate([np.arange(500), np.arange(9000, 9300)]))
    assert two[0] == B._RUN and B._popcount(two) == 800
    # spread offsets do NOT pick the run form
    assert B._pack(np.arange(0, 100000, 2))[0] != B._RUN
    arr = B._pack(np.array([1, 3, 999, 5000]))
    dense = B._pack(np.arange(0, 3000, 2))
    for x, y in itertools.product([run, arr, dense], repeat=2):
        ox = set(B._unpack(x).tolist())
        oy = set(B._unpack(y).tolist())
        assert set(B._unpack(B.bitmap_and(x, y)).tolist()) == ox & oy
        assert set(B._unpack(B.bitmap_or(x, y)).tolist()) == ox | oy
        assert set(B._unpack(B.bitmap_andnot(x, y)).tolist()) == ox - oy
        assert set(B._unpack(B.bitmap_xor(x, y)).tolist()) == ox ^ oy
