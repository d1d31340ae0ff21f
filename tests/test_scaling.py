"""Scaling-curve evidence for the size-independence claims (r4 verdict
task 8): the routed-serving and O(touched-bucket) keys must stay flat
across the generated 100× data range (sf0.001 → sf0.1)."""

from __future__ import annotations

import os

import pytest

from featurebase_spark.scaling import GROWTH_BOUND, SCALING_KEYS, SF_DIRS, measure


@pytest.mark.full  # timing battery (up to ~18 min with its contention
# retry): a wall-clock flatness assert inside a bounded parallel gate
# produces spurious reds — nightly path (r14 test-gate split)
@pytest.mark.skipif(
    not all(os.path.isdir(d) for d in SF_DIRS),
    reason="generated testdata scale factors not present",
)
def test_routed_and_touched_write_keys_flat_over_100x(spark):
    """bitmap_index_count / bitmap_index_maintenance /
    statement_insert_touched_buckets / pql_text_routed_serving: best-of-N
    wall time grows ≤ GROWTH_BOUND while the data grows 100× — the local
    proof that serving never rescans the base table and writes stay
    O(touched buckets)."""
    result = measure(spark, repeats=3)
    bad = {k: v for k, v in result["keys"].items() if not v["flat"]}
    if bad:
        # timing test: one retry for the failing keys only — a parallel
        # test run saturating every core inflates single measurements
        # far beyond the flatness signal (min-of-3 absorbs jitter, not
        # sustained contention). The retry runs more repeats: with six
        # timed keys a full-suite run occasionally trips one on pure
        # scheduler noise (r7: stream_windowed_counts adds timer-bound
        # streaming triggers to the set)
        retry = measure(spark, keys=sorted(bad), repeats=5)
        bad = {k: v for k, v in retry["keys"].items() if not v["flat"]}
    assert not bad, f"keys grew beyond {GROWTH_BOUND}x over 100x data: {bad}"
    assert set(result["keys"]) == set(SCALING_KEYS)
