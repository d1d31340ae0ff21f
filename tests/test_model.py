"""CREATE MODEL / PREDICT (operators/model.py) — we implement the
semantics the reference only scaffolds (compilecreatemodel.go:17-95,
oppredict.go:1-253)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.operators.model import ModelCatalog


def test_create_model_validation():
    mc = ModelCatalog()
    mc.create_model("m", "y", ["x"])
    with pytest.raises(ValueError, match="exists"):
        mc.create_model("m", "y", ["x"])
    mc.create_model("m", "y", ["x"], if_not_exists=True)  # no-op
    with pytest.raises(ValueError, match="MODELTYPE"):
        mc.create_model("m2", "y", ["x"], model_type="random_forest")
    with pytest.raises(ValueError, match="feature"):
        mc.create_model("m3", "y", [])


def test_single_feature_exact_recovery(spark):
    # y = 3x - 5 exactly → coefficients recovered exactly
    df = spark.createDataFrame(
        [(float(x), 3.0 * x - 5.0) for x in range(100)], "x DOUBLE, y DOUBLE"
    )
    mc = ModelCatalog()
    mc.create_model("lin", "y", ["x"])
    m = mc.train("lin", df)
    assert m.coef["x"] == pytest.approx(3.0, abs=1e-9)
    assert m.coef["_intercept"] == pytest.approx(-5.0, abs=1e-9)
    pred = mc.predict("lin", df).select(
        F.max(F.abs(F.col("prediction") - F.col("y"))).alias("err")
    ).first()["err"]
    assert pred < 1e-8


def test_single_feature_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 100.0), (3.0, None)], "x DOUBLE, y DOUBLE"
    )
    mc = ModelCatalog()
    mc.create_model("lin", "y", ["x"])
    m = mc.train("lin", df)
    assert m.coef["x"] == pytest.approx(2.0, abs=1e-9)
    assert m.coef["_intercept"] == pytest.approx(0.0, abs=1e-9)


def test_multi_feature_recovery(spark):
    # y = 2a - 3b + 7
    rows = [
        (float(a), float(b), 2.0 * a - 3.0 * b + 7.0)
        for a in range(20)
        for b in range(5)
    ]
    df = spark.createDataFrame(rows, "a DOUBLE, b DOUBLE, y DOUBLE")
    mc = ModelCatalog()
    mc.create_model("m2", "y", ["a", "b"])
    m = mc.train("m2", df)
    assert m.coef["a"] == pytest.approx(2.0, abs=1e-6)
    assert m.coef["b"] == pytest.approx(-3.0, abs=1e-6)
    assert m.coef["_intercept"] == pytest.approx(7.0, abs=1e-6)


def test_predict_before_train_errors(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x DOUBLE, y DOUBLE")
    mc = ModelCatalog()
    mc.create_model("m", "y", ["x"])
    with pytest.raises(ValueError, match="not trained"):
        mc.predict("m", df).collect()
