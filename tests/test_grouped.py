"""operators/grouped.py — exact grouped nearest-rank percentiles."""

from __future__ import annotations

import math

import pytest

from featurebase_spark.operators.grouped import grouped_percentile


@pytest.fixture(scope="module")
def df(spark):
    rows = []
    for g, vals in (
        ("a", list(range(1, 101))),            # 1..100
        ("b", [5] * 50 + [9] * 50),            # heavy ties
        ("c", [42]),                           # singleton
        ("d", [7, None, 3, None, 9]),          # nulls excluded
    ):
        rows += [(g, v) for v in vals]
    return spark.createDataFrame(rows, "g string, v long")


def _naive(vals, permille):
    vals = sorted(v for v in vals if v is not None)
    r = (permille * len(vals) + 999) // 1000
    return vals[max(r, 1) - 1]


@pytest.mark.parametrize("permille", [1, 100, 250, 500, 900, 999, 1000])
def test_grouped_percentile_matches_naive(df, permille):
    got = {r["g"]: r["pct_value"]
           for r in grouped_percentile(df, ["g"], "v", permille).collect()}
    data = {
        "a": list(range(1, 101)),
        "b": [5] * 50 + [9] * 50,
        "c": [42],
        "d": [7, 3, 9],
    }
    want = {g: _naive(vs, permille) for g, vs in data.items()}
    assert got == want, permille


def test_grouped_percentile_median_ties(df):
    got = {r["g"]: r["pct_value"]
           for r in grouped_percentile(df, ["g"], "v", 500).collect()}
    assert got["b"] == 5  # rank 50 of 100 → the tied low value
    assert got["c"] == 42
    assert got["d"] == 7  # nulls excluded: sorted [3,7,9], rank 2


def test_grouped_percentile_histogram_plan(df):
    """The windows run over the HISTOGRAM, not raw rows: the plan
    aggregates (group, value) BEFORE any Window."""
    out = grouped_percentile(df, ["g"], "v", 500)
    p = out._jdf.queryExecution().executedPlan().toString()
    lines = p.splitlines()
    win = min(i for i, l in enumerate(lines) if "Window" in l)
    aggs = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    # children print below parents: an aggregate must sit under the window
    assert any(i > win for i in aggs), p


def test_grouped_percentile_validation(df):
    with pytest.raises(ValueError):
        grouped_percentile(df, ["g"], "v", 0)
    with pytest.raises(ValueError):
        grouped_percentile(df, ["g"], "v", 1001)


def test_grouped_percentiles_multi_matches_single(df):
    """Every column of the one-pass multi form equals the single form."""
    from featurebase_spark.operators.grouped import grouped_percentiles

    ps = (250, 500, 750, 990)
    multi = {r["g"]: r for r in grouped_percentiles(df, ["g"], "v", ps).collect()}
    for p in ps:
        single = {r["g"]: r["pct_value"]
                  for r in grouped_percentile(df, ["g"], "v", p).collect()}
        for g, want in single.items():
            assert multi[g][f"p{p}"] == want, (g, p)


def test_grouped_percentiles_shared_pass_plan(df):
    """Adding quantiles must not add exchanges: the 4-quantile plan has
    exactly as many Exchange operators as the 1-quantile plan."""
    from featurebase_spark.operators.grouped import grouped_percentiles

    p1 = (
        grouped_percentile(df, ["g"], "v", 500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    p4 = (
        grouped_percentiles(df, ["g"], "v", (250, 500, 750, 990))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p4.count("Exchange") == p1.count("Exchange"), (p1, p4)
    assert p4.count("Window") == p1.count("Window")


def test_grouped_percentiles_validation(df):
    from featurebase_spark.operators.grouped import grouped_percentiles

    with pytest.raises(ValueError):
        grouped_percentiles(df, ["g"], "v", ())
    with pytest.raises(ValueError):
        grouped_percentiles(df, ["g"], "v", (500, 500))
    with pytest.raises(ValueError):
        grouped_percentiles(df, ["g"], "v", (0,))


# ---------------------------------------------------------------------------
# MAD outlier statistics
# ---------------------------------------------------------------------------

from featurebase_spark.operators.grouped import mad_outlier_stats  # noqa: E402


def test_mad_hand_computed(spark):
    """g: values 1..7 plus outlier 100 → med=4 (rank ceil(8/2)=4), devs
    {3,2,1,0,1,2,3,96} sorted {0,1,1,2,2,3,3,96} → mad=2 (rank 4);
    only 96 > 3·2=6 flags (cross-multiplied 96000 > 6000)."""
    df = spark.createDataFrame(
        [("g", v) for v in [1, 2, 3, 4, 5, 6, 7, 100]], "g string, v long"
    )
    r = mad_outlier_stats(df, ["g"], "v", 3000).collect()[0]
    assert (r["med"], r["mad"], r["n_outliers"], r["n_rows"]) == (4, 2, 1, 8)


def test_mad_zero_degenerate_flags_any_deviation(spark):
    """More than half identical → mad=0: every non-median value flags
    (documented degenerate behavior of the MAD screen)."""
    df = spark.createDataFrame(
        [("g", v) for v in [5, 5, 5, 5, 5, 9, 2]], "g string, v long"
    )
    r = mad_outlier_stats(df, ["g"], "v", 3000).collect()[0]
    assert (r["med"], r["mad"], r["n_outliers"], r["n_rows"]) == (5, 0, 2, 7)


def test_mad_null_groups_and_values_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), (None, 7), ("g", 3)], "g string, v long"
    )
    rows = mad_outlier_stats(df, ["g"], "v", 3000).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 2
