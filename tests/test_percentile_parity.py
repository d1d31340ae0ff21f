"""Percentile parity with the reference's bisection semantics — the r11
wrong-answer fix.

executePercentile (executor.go:1310-1603) does NOT return a nearest-rank
order statistic: it bisects the value domain and returns the first
midpoint v with count(<v) <= desiredLess and count(>v) <= desiredGreater
— possibly a value ABSENT from the data. The reference's own SQL corpus
pins this: percentile(d1, 50) over {10,10,11,12,12,13} expects
pql.NewDecimal(1150, 2) = 11.50, the min/max midpoint
(defs_aggregate.go:505-553) — pre-r11 we returned percentile_disc's
11.00, a silent divergence behind a green int-only golden.

The loop has a second surprise this file pins: when the bracket
collapses (min >= max) before a midpoint qualifies, the LAST midpoint is
returned even though it was REJECTED by its count probe — the Go code
falls out of `for minLessthanMax()` with possibleNthVal still set
(executor.go:1546-1576). Median of {0,1,1,1} is therefore 0.

Cross-check strategy: `go_reference` below is a literal transcription of
the Go loop (count probes and all); every distributed path — PQL scan
(reference_percentile), bitmap router (_index_percentile), SQL door fold
(_percentile_fold_sql) — must match it value-for-value, including on
randomized multisets with negative values (Go truncating division at
negative midpoints differs from floor).
"""

from __future__ import annotations

import decimal
import random

import pytest
from pyspark.sql import functions as F

from featurebase_spark.pql import Index
from featurebase_spark.pql import calls as C
from featurebase_spark.pql.calls import (
    _bisect_replay,
    _go_trunc_mid,
    reference_percentile,
)
from featurebase_spark.sql import fb_sql


def go_reference(vals, nth):
    """Literal transcription of executePercentile's scalar loop
    (executor.go:1404-1576) for cross-checking — counts done brute-force
    on the in-memory list, exactly as the reference counts bitmaps."""
    n = len(vals)
    if n == 0:
        return None
    dl = int((float(n) * nth) / 100.0)
    dg = int((float(n) * (100.0 - nth)) / 100.0)
    mn, mx = min(vals), max(vals)
    if dg != 0 and dl == 0:
        return mn
    if dg == 0:
        return mx
    lo, hi, val = mn, mx, mn
    while lo < hi:
        val = _go_trunc_mid(lo, hi)
        if sum(1 for v in vals if v < val) > dl:
            hi = val - 1
            continue
        if sum(1 for v in vals if v > val) > dg:
            lo = val + 1
            continue
        break
    return val


NTHS = (0, 1, 10, 25, 50, 75, 90, 99, 100, 33.3)


def test_arithmetic_replay_equals_go_loop_exhaustively():
    """The order-statistic replay (_bisect_replay over a = s[n-1-dG],
    b = s[dL]) is NOT an approximation of the Go loop — it is provably
    the same function. 3000 random multisets x 10 nths, spans up to
    2^40, negatives included."""
    rng = random.Random(11)
    for _ in range(3000):
        n = rng.randint(1, 40)
        span = rng.choice([3, 10, 100, 10**6, 2**40])
        vals = [rng.randint(-span, span) for _ in range(n)]
        s = sorted(vals)
        for nth in NTHS:
            dl = int((float(n) * nth) / 100.0)
            dg = int((float(n) * (100.0 - nth)) / 100.0)
            if dg != 0 and dl == 0:
                sim = s[0]
            elif dg == 0:
                sim = s[-1]
            else:
                sim = _bisect_replay(
                    s[0], s[-1], s[n - 1 - dg], s[dl], _go_trunc_mid
                )
            assert sim == go_reference(vals, nth), (vals, nth)


# the pinned exemplars: (values, nth, expected) — each diverges from
# nearest-rank, so a regression to percentile_disc fails loudly
EXEMPLARS = [
    ([10, 10, 11, 12, 12, 13], 50, 11),  # defs int case (coincides)
    ([-10, 10], 50, 0),  # midpoint absent from the data
    ([0, 10], 50, 5),  # midpoint absent from the data
    ([0, 1, 1, 1], 50, 0),  # REJECTED-midpoint fall-out (executor.go:1576)
    ([-9, -3], 50, -6),  # negative truncating average
    ([5], 50, 5),  # single value: dG=0 -> max
    ([7, 7, 7], 0, 7),  # nth=0 -> min
    ([1, 2, 3], 100, 3),  # nth=100 -> max
]


def test_pql_scan_path_matches_go_loop(spark):
    for vals, nth, want in EXEMPLARS:
        assert go_reference(vals, nth) == want, (vals, nth)  # self-check
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "_id long, v long"
        )
        got = C.Percentile("v", nth).to_df(Index(df)).first()["percentile"]
        assert got == want, (vals, nth, got)


def test_pql_scan_path_randomized(spark):
    rng = random.Random(23)
    rows, checks = [], []
    # one DataFrame, many (dataset, nth) checks via per-dataset filters —
    # keeps the Spark-job count reasonable
    for ds in range(6):
        n = rng.randint(2, 25)
        vals = [rng.randint(-1000, 1000) for _ in range(n)]
        rows += [(ds, i, v) for i, v in enumerate(vals)]
        checks.append((ds, vals))
    df = spark.createDataFrame(rows, "ds int, _id long, v long")
    for ds, vals in checks:
        sub = df.where(F.col("ds") == ds)
        for nth in (25, 50, 90):
            got = reference_percentile(sub, "v", float(nth))
            assert got == go_reference(vals, float(nth)), (vals, nth)


def test_pql_decimal_path_floor_midpoint(spark):
    """Decimal fields replay DivideDecimal's floor average at the field
    scale (pql/decimal.go:150-161): the defs pin — 11.50, absent from
    the data."""
    df = spark.sql(
        "SELECT * FROM VALUES (1L, CAST(10 AS DECIMAL(10,2))), "
        "(2L, CAST(10 AS DECIMAL(10,2))), (3L, CAST(11 AS DECIMAL(10,2))), "
        "(4L, CAST(12 AS DECIMAL(10,2))), (5L, CAST(12 AS DECIMAL(10,2))), "
        "(6L, CAST(13 AS DECIMAL(10,2))) AS t(_id, d)"
    )
    got = C.Percentile("d", 50).to_df(Index(df)).first()["percentile"]
    assert got == decimal.Decimal("11.50")
    # negative decimals: scaled {-1050, 1050}, floor mid = 0 -> 0.00
    df2 = spark.sql(
        "SELECT * FROM VALUES (1L, CAST(-10.50 AS DECIMAL(6,2))), "
        "(2L, CAST(10.50 AS DECIMAL(6,2))) AS t(_id, d)"
    )
    got2 = C.Percentile("d", 50).to_df(Index(df2)).first()["percentile"]
    assert got2 == decimal.Decimal("0.00")


def test_pql_nth_validation_errors(spark):
    df = spark.createDataFrame([(1, 2)], "_id long, v long")
    with pytest.raises(ValueError, match=r"invalid nth value \(101\.000000\)"):
        C.Percentile("v", 101).to_df(Index(df))
    with pytest.raises(ValueError, match=r"invalid nth value \(-1\.000000\)"):
        C.Percentile("v", -1).to_df(Index(df))
    with pytest.raises(ValueError, match="Percentile\\(\\): nth required"):
        C.Percentile("v", None).to_df(Index(df))


def test_sql_door_fold_matches_go_loop(spark):
    """The SQL door's pure-arithmetic fold (_percentile_fold_sql) equals
    the Go loop, including negatives and the fall-out case. Grouped
    percentile REFUSES on the door since r13 (defs_groupby.go:209-213
    "aggregate 'PERCENTILE()' not allowed in GROUP BY" — the former
    grouped superset lives on as operators/grouped.grouped_percentile,
    the gated grouped_percentile_median key); the per-group folds are
    exercised here through single-group WHERE queries."""
    rows = []
    groups = {
        "a": [0, 1, 1, 1],  # fall-out -> 0
        "b": [-10, 10],  # absent midpoint -> 0
        "c": [10, 10, 11, 12, 12, 13],  # defs -> 11
        "d": [-9, -3, 7],  # odd n -> unique median -5? (go: check below)
    }
    for g, vals in groups.items():
        rows += [(g, v) for v in vals]
    spark.createDataFrame(rows, "g string, v long").createOrReplaceTempView(
        "pctl_parity_t"
    )
    with pytest.raises(
        ValueError, match=r"aggregate 'PERCENTILE\(\)' not allowed in GROUP BY"
    ):
        fb_sql(
            spark,
            "SELECT g, percentile(v, 50) AS p FROM pctl_parity_t "
            "GROUP BY g",
        )
    for g, vals in groups.items():
        got_g = fb_sql(
            spark,
            f"SELECT percentile(v, 50) AS p FROM pctl_parity_t "
            f"WHERE g = '{g}'",
        ).first()["p"]
        assert got_g == go_reference(vals, 50.0), (g, vals, got_g)
    # global (the only reference-legal shape) + WHERE superset
    one = fb_sql(
        spark,
        "SELECT percentile(v, 50) AS p FROM pctl_parity_t WHERE g = 'b'",
    ).first()["p"]
    assert one == 0
    # literal out-of-range nth raises the executor's runtime text at
    # compile time
    with pytest.raises(ValueError, match=r"invalid nth value \(101\.000000\)"):
        fb_sql(spark, "SELECT percentile(v, 101) AS p FROM pctl_parity_t")


def test_sql_door_empty_input_is_null(spark):
    spark.createDataFrame([], "v long").createOrReplaceTempView("pctl_empty_t")
    assert (
        fb_sql(spark, "SELECT percentile(v, 50) AS p FROM pctl_empty_t")
        .first()["p"]
        is None
    )


def test_sql_door_timestamp_bisection(spark):
    """Timestamp percentile bisects epoch MICROS (the engine's timestamp
    resolution; the reference bisects the field's epoch-unit ints) —
    midpoint of two timestamps is their average instant."""
    spark.sql(
        "SELECT * FROM VALUES (TIMESTAMP '2020-01-01 00:00:00'), "
        "(TIMESTAMP '2020-01-03 00:00:00') AS t(ts)"
    ).createOrReplaceTempView("pctl_ts_t")
    got = fb_sql(
        spark, "SELECT percentile(ts, 50) AS p FROM pctl_ts_t"
    ).first()["p"]
    assert str(got) == "2020-01-02 00:00:00"


def test_router_bitmap_path_matches_scan(spark):
    """The bitmap-routed percentile replays the SAME loop with count
    probes (the reference's literal strategy) — equal to the scan path on
    a divergence-rich dataset."""
    from featurebase_spark.plans.bitmap_index import BitmapCatalog
    from featurebase_spark.plans.router import route_call

    vals = [0, 1, 1, 1, -10, 10, 64, 1000]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "_id long, v long"
    )
    cat = BitmapCatalog()
    cat.index_bsi_field(df, "v")
    idx = Index(df)
    for nth in (0, 25, 50, 75, 100):
        routed = route_call(cat, C.Percentile("v", nth))
        scanned = C.Percentile("v", nth).to_df(idx).first()["percentile"]
        assert routed == scanned == go_reference(vals, float(nth)), nth
