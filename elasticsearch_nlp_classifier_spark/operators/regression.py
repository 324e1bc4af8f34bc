"""ES ML data-frame-analytics ``regression`` — linear-model analog.

ES's regression analytics trains gradient-boosted trees (proprietary
ml-cpp); this module provides the same *workflow surface* — train on
rows where the dependent variable is present, predict for every row,
report R²/MSE — with a documented linear model (OLS, optional ridge
λ), which is the honest distributed-analytics equivalent:

- **training is two passes of DataFrame aggregation**: the Gram matrix
  ``XᵀX`` (d×d) and moment vector ``Xᵀy`` accumulate as per-partition
  partial sums inside one Arrow-batched ``mapInPandas`` (a d²+d-sized
  row per batch — never the data), summed driver-side, solved with
  ``numpy.linalg.solve`` (+ λI for ridge).  Model state is d+1 doubles
  — the same footprint class as NB priors;
- **prediction is a broadcast dot product** — pure JVM ``zip_with`` /
  ``aggregate`` over the feature array, whole-stage codegen, no Python
  in the scoring path;
- **simple (1-feature) regression** additionally has a closed form
  (slope = cov/var) computed with plain ``sum``/``avg`` built-ins —
  that path is SQL-oracle-checkable against DuckDB's ``regr_slope`` /
  ``regr_intercept`` / ``regr_r2``.

At 100 TB: training touches every row once (map-side partials, one
tiny reduce), prediction is embarrassingly parallel; d (feature count)
is the only quadratic term and it is a small constant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_linear", "predict_linear", "fit_simple", "regression_eval"]


def fit_linear(
    df: DataFrame,
    features_col: str,
    label_col: str,
    ridge_lambda: float = 0.0,
    fit_intercept: bool = True,
) -> dict:
    """OLS/ridge over ``features array<numeric>`` → ``{"beta":
    [..], "intercept": b, "n": rows}``.  One data pass."""
    src = df.where(F.col(label_col).isNotNull()).select(
        F.col(features_col).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["x"].to_numpy()).astype(np.float64)
            if fit_intercept:
                X = np.hstack([X, np.ones((len(X), 1))])
            y = pdf["y"].to_numpy(dtype=np.float64)
            yield pd.DataFrame({
                "xtx": [(X.T @ X).ravel().tolist()],
                "xty": [(X.T @ y).tolist()],
                "n": [len(X)],
            })

    probe = src.select("x").first()
    if probe is None or probe[0] is None:
        raise ValueError("no training rows")
    d_probe = len(probe[0]) + (1 if fit_intercept else 0)
    rows = src.mapInPandas(
        partials, schema="xtx array<double>, xty array<double>, n long"
    ).collect()
    if not rows:
        raise ValueError("no training rows")
    xtx = np.zeros((d_probe, d_probe))
    xty = np.zeros(d_probe)
    n = 0
    for r in rows:
        xtx += np.asarray(r["xtx"]).reshape(d_probe, d_probe)
        xty += np.asarray(r["xty"])
        n += r["n"]
    if ridge_lambda > 0:
        reg = np.eye(d_probe) * ridge_lambda
        if fit_intercept:
            reg[-1, -1] = 0.0  # never regularize the intercept
        xtx = xtx + reg
    beta = np.linalg.solve(xtx, xty)
    if fit_intercept:
        return {"beta": beta[:-1].tolist(),
                "intercept": float(beta[-1]), "n": n}
    return {"beta": beta.tolist(), "intercept": 0.0, "n": n}


def predict_linear(
    df: DataFrame,
    model: dict,
    features_col: str,
    out_col: str = "prediction",
) -> DataFrame:
    """Broadcast dot product — JVM-only scoring."""
    beta = F.array(*[F.lit(float(b)) for b in model["beta"]])
    return df.withColumn(
        out_col,
        F.aggregate(
            F.zip_with(
                F.col(features_col), beta,
                lambda x, b: x.cast("double") * b,
            ),
            F.lit(float(model["intercept"])),
            lambda acc, v: acc + v,
        ),
    )


def fit_simple(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Closed-form simple regression as ONE aggregation —
    ``(slope, intercept, r2, n)``, the SQL-twin path
    (DuckDB ``regr_slope``/``regr_intercept``/``regr_r2``)."""
    src = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    a = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    slope = cov / varx
    return a.select(
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
        F.col("n").cast("long").alias("n"),
    )


def regression_eval(
    df: DataFrame, label_col: str, pred_col: str = "prediction"
) -> DataFrame:
    """(mse_r6, mae_r6, r2_r6, n) of predictions vs labels."""
    src = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("double").alias("y"),
        F.col(pred_col).cast("double").alias("p"),
    )
    a = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((F.col("y") - F.col("p")) ** 2).alias("mse"),
        F.avg(F.abs(F.col("y") - F.col("p"))).alias("mae"),
        F.avg("y").alias("my"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    vary = F.col("myy") - F.col("my") * F.col("my")
    return a.select(
        F.round("mse", 6).alias("mse_r6"),
        F.round("mae", 6).alias("mae_r6"),
        F.round(F.lit(1.0) - F.col("mse") / vary, 6).alias("r2_r6"),
        F.col("n").cast("long").alias("n"),
    )
