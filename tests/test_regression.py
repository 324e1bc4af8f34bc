"""ES data-frame-analytics regression analog: normal-equation OLS vs
numpy lstsq, ridge shrinkage, closed-form simple regression vs DuckDB
regr_*, JVM prediction path, eval metrics."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.regression import (
    fit_linear,
    fit_simple,
    predict_linear,
    regression_eval,
)

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


@pytest.fixture(scope="module")
def synth(spark):
    """y = 3*x0 - 2*x1 + 0.5 + deterministic noise."""
    n = 2000
    rows = []
    for i in range(n):
        x0 = (i * 37 % 100) / 10.0
        x1 = (i * 61 % 50) / 5.0
        noise = ((i * 97 % 21) - 10) / 100.0
        rows.append((i, [x0, x1], 3.0 * x0 - 2.0 * x1 + 0.5 + noise))
    return spark.createDataFrame(
        rows, "id long, features array<double>, y double"
    ).repartition(8).cache()


def test_ols_matches_numpy(synth):
    model = fit_linear(synth, "features", "y")
    pdf = synth.toPandas()
    X = np.stack(pdf.features.to_numpy())
    X1 = np.hstack([X, np.ones((len(X), 1))])
    want, *_ = np.linalg.lstsq(X1, pdf.y.to_numpy(), rcond=None)
    np.testing.assert_allclose(model["beta"], want[:2], atol=1e-8)
    assert model["intercept"] == pytest.approx(want[2], abs=1e-8)
    assert model["n"] == 2000


def test_ridge_shrinks_norm(synth):
    ols = fit_linear(synth, "features", "y")
    ridge = fit_linear(synth, "features", "y", ridge_lambda=1000.0)
    assert (np.linalg.norm(ridge["beta"])
            < np.linalg.norm(ols["beta"]))


def test_predict_jvm_matches_manual(synth):
    model = fit_linear(synth, "features", "y")
    got = predict_linear(synth, model, "features").toPandas()
    X = np.stack(got.features.to_numpy())
    want = X @ np.asarray(model["beta"]) + model["intercept"]
    np.testing.assert_allclose(got.prediction.to_numpy(), want,
                               atol=1e-9)
    ev = regression_eval(
        predict_linear(synth, model, "features"), "y"
    ).first()
    assert ev.r2_r6 > 0.999
    assert ev.mse_r6 < 0.01


def test_simple_regression_matches_duckdb(spark):
    ev = spark.read.parquet(EVENTS)
    got = fit_simple(ev, "user_id", "value").toPandas()
    want = duckdb.sql(f"""
        SELECT round(regr_slope(y, x), 6) AS slope,
               round(regr_intercept(y, x), 6) AS intercept,
               round(regr_r2(y, x), 6) AS r2,
               count(*)::BIGINT AS n
        FROM (SELECT user_id::DOUBLE AS x, value::DOUBLE AS y
              FROM read_parquet('{EVENTS}')
              WHERE user_id IS NOT NULL AND value IS NOT NULL)
    """).df()
    assert got.n.iloc[0] == want.n.iloc[0]
    assert got.slope.iloc[0] == pytest.approx(want.slope.iloc[0],
                                              abs=2e-6)
    assert got.intercept.iloc[0] == pytest.approx(
        want.intercept.iloc[0], abs=2e-6)
    assert got.r2.iloc[0] == pytest.approx(want.r2.iloc[0], abs=2e-6)


def test_no_training_rows_raises(spark):
    df = spark.createDataFrame(
        [], "id long, features array<double>, y double"
    )
    with pytest.raises(ValueError):
        fit_linear(df, "features", "y")
