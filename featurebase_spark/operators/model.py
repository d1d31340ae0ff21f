"""CREATE MODEL / PREDICT — FeatureBase's ML statement surface.

Reference: ``CREATE MODEL … MODELTYPE 'linear_regression'`` parses and
stores metadata (compilecreatemodel.go:17-95, opcreatemodel.go) and
``PREDICT`` exists as a plan op (oppredict.go:1-253) — but training and
inference are NOT implemented there (scaffolding only). We implement the
declared semantics for real, Spark-first:

- **Training** is closed-form OLS computed in ONE distributed aggregation
  pass: accumulate the normal-equation moments (X'X, X'y) as sums —
  k(k+1)/2 + k + 2 scalar aggregates — then solve the tiny k×k system on
  the driver. No iteration, no MLlib dependency, no per-row Python; at
  100 TB this is a single map-side-combined agg over the feature columns.
- **Inference** is a pure JVM expression column: ``β₀ + Σ βᵢ·xᵢ`` — fully
  codegen'd, usable inside any further query.

For single-feature models the moments are accumulated in exact DECIMAL
(order-independent) and solved with the classic slope/intercept formula,
making coefficients bit-deterministic and oracle-comparable
(DuckDB ``regr_slope``-style CTE math over the same decimal sums).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Model:
    name: str
    target: str
    features: tuple
    model_type: str = "linear_regression"
    coef: Optional[dict] = None  # feature -> β, plus "_intercept"

    def prediction_expr(self) -> Column:
        if self.coef is None:
            raise ValueError(f"model {self.name} is not trained")
        expr = F.lit(float(self.coef["_intercept"]))
        for f in self.features:
            expr = expr + F.lit(float(self.coef[f])) * F.col(f).cast("double")
        return expr


def _fit_single_exact(df: DataFrame, target: str, feat: str, scale: int) -> dict:
    """k=1 closed form over exact decimal moments (order-independent sums →
    deterministic coefficients)."""
    d = f"decimal(38,{scale})"
    x = F.col(feat).cast(d)
    y = F.col(target).cast(d)
    m = df.where(F.col(feat).isNotNull() & F.col(target).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast(f"decimal(38,{2 * scale})")).alias("sxy"),
        F.sum((x * x).cast(f"decimal(38,{2 * scale})")).alias("sxx"),
    ).first()
    n = float(m["n"])
    sx, sy = float(m["sx"]), float(m["sy"])
    sxy, sxx = float(m["sxy"]), float(m["sxx"])
    denom = n * sxx - sx * sx
    slope = 0.0 if denom == 0 else (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n if n else 0.0
    return {feat: slope, "_intercept": intercept}


def _fit_multi(df: DataFrame, target: str, features: Sequence[str]) -> dict:
    """General k: one agg pass for the normal-equation moments, numpy solve
    of the (k+1)×(k+1) system on the driver."""
    from functools import reduce

    cols = ["__one"] + list(features)
    notnull = reduce(
        lambda a, b: a & b,
        [F.col(f).isNotNull() for f in features],
        F.col(target).isNotNull(),
    )
    src = df.where(notnull).select(
        F.lit(1.0).alias("__one"),
        *[F.col(f).cast("double").alias(f) for f in features],
        F.col(target).cast("double").alias("__y"),
    )
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"xx_{a}__{b}"))
        aggs.append(F.sum(F.col(a) * F.col("__y")).alias(f"xy_{a}"))
    m = src.agg(*aggs).first()
    k = len(cols)
    xtx = np.zeros((k, k))
    xty = np.zeros(k)
    for i, a in enumerate(cols):
        for j in range(i, k):
            v = float(m[f"xx_{a}__{cols[j]}"] or 0.0)
            xtx[i, j] = xtx[j, i] = v
        xty[i] = float(m[f"xy_{a}"] or 0.0)
    beta = np.linalg.lstsq(xtx, xty, rcond=None)[0]
    out = {"_intercept": float(beta[0])}
    for f, b in zip(features, beta[1:]):
        out[f] = float(b)
    return out


class ModelCatalog:
    """CREATE MODEL / PREDICT registry (opcreatemodel.go / oppredict.go)."""

    def __init__(self):
        self._models: dict[str, Model] = {}

    def create_model(
        self,
        name: str,
        target: str,
        features: Sequence[str],
        model_type: str = "linear_regression",
        if_not_exists: bool = False,
    ) -> Model:
        if name in self._models:
            if if_not_exists:
                return self._models[name]
            raise ValueError(f"model {name} exists")
        if model_type != "linear_regression":
            # same restriction as the reference (compilecreatemodel.go:57)
            raise ValueError(f"unsupported MODELTYPE {model_type!r}")
        if not features:
            raise ValueError("model needs at least one feature column")
        m = Model(name, target, tuple(features), model_type)
        self._models[name] = m
        return m

    def drop_model(self, name: str) -> None:
        self._models.pop(name, None)

    def train(self, name: str, df: DataFrame, exact_scale: int = 4) -> Model:
        m = self._models[name]
        if len(m.features) == 1:
            m.coef = _fit_single_exact(df, m.target, m.features[0], exact_scale)
        else:
            m.coef = _fit_multi(df, m.target, m.features)
        return m

    def predict(
        self, name: str, df: DataFrame, output_col: str = "prediction"
    ) -> DataFrame:
        """PREDICT (oppredict.go): input rows + a prediction column."""
        return df.withColumn(output_col, self._models[name].prediction_expr())
