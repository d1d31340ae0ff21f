"""Skew utilities (operators/skew.py): salted plans must produce results
identical to the plain plans — only the shuffle layout differs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 90% of rows
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows, "_id LONG, k STRING, v DOUBLE")


def test_salted_agg_equals_plain(skewed):
    plain = {
        (r["k"],): (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["s"])
        for r in salted_agg(
            skewed, ["k"], sum_cols={"v": "s"}, count_alias="n", buckets=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k11", "K11")], "k STRING, label STRING"
    )
    plain = sorted(
        (r["_id"], r["label"])
        for r in skewed.join(dim, "k", "inner").select("_id", "label").collect()
    )
    salted = sorted(
        (r["_id"], r["label"])
        for r in salted_join(skewed, dim, "k", buckets=4)
        .select("_id", "label")
        .collect()
    )
    assert salted == plain


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k STRING, label STRING")
    got = salted_join(skewed, dim, "k", buckets=4, how="left")
    assert got.count() == skewed.count()
    assert got.where(F.col("label").isNull()).count() == skewed.where(
        F.col("k") != "hot"
    ).count()


def test_salted_join_rejects_bad_how(spark, skewed):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, skewed, "k", how="full")
