"""Learning-to-rank rescorer: feature logging, pointwise training,
window rescoring — model math pinned to numpy, ranking to a manual
twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    ltr_features,
    ltr_rescore,
    train_ltr,
)

DOCS = [
    (1, "spark data engine fast", 9.0, 2.0),
    (2, "data frames and data tables", 1.0, 8.0),
    (3, "spark data streaming", 7.0, 3.0),
    (4, "data storage formats", 2.0, 9.0),
    (5, "spark catalyst data planner", 8.0, 1.0),
    (6, "unrelated gardening tips", 5.0, 5.0),
]


@pytest.fixture(scope="module")
def parts(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, title string, stars double, age double"
    )
    idx = build_logical_index(df, text_col="title",
                              analyzer="simple_code")
    q = spark.createDataFrame([(1, "spark data")],
                              "query_id int, query_text string")
    feats = ltr_features(idx, q, df, ["stars", "age"], window=10,
                         analyzer="simple_code").cache()
    feats.count()
    return df, idx, q, feats


def test_features_shape(spark, parts):
    _, _, _, feats = parts
    rows = feats.collect()
    assert all(len(r.features) == 3 for r in rows)   # score, stars, age
    assert {r.doc_id for r in rows} == {1, 2, 3, 4, 5}  # 'spark data' hits


def test_train_matches_numpy_lstsq(spark, parts):
    _, _, _, feats = parts
    # judgments: grade = stars-heavy preference
    j = spark.createDataFrame(
        [(1, 1, 3.0), (1, 3, 2.0), (1, 5, 3.0), (1, 2, 0.0), (1, 4, 0.0)],
        "query_id int, doc_id long, grade double",
    )
    model = train_ltr(feats, j)
    X = np.array([r.features for r in feats.join(
        j, ["query_id", "doc_id"]).orderBy("doc_id").collect()])
    y = np.array([r.grade for r in feats.join(
        j, ["query_id", "doc_id"]).orderBy("doc_id").collect()])
    Xi = np.hstack([X, np.ones((len(X), 1))])
    beta = np.linalg.lstsq(Xi, y, rcond=None)[0]
    got = np.array(model["beta"] + [model["intercept"]])
    assert np.allclose(got, beta, atol=1e-8)


def test_rescore_matches_manual_dot(spark, parts):
    _, _, _, feats = parts
    model = {"beta": [0.0, 1.0, -1.0], "intercept": 0.5}
    got = ltr_rescore(feats, model, k=5).collect()
    manual = sorted(
        ((r.doc_id, 0.5 + r.features[1] - r.features[2])
         for r in feats.collect()),
        key=lambda t: (-round(t[1], 9), t[0]),
    )
    assert [(r.doc_id, pytest.approx(r.ltr_score)) for r in got] == \
        [(d, pytest.approx(s)) for d, s in manual]
    # stars-minus-age ranks doc 1 (9-2) over doc 2 (1-8)
    assert got[0].doc_id in (1, 5)


def test_rescore_touches_window_only(spark, parts):
    df, idx, q, _ = parts
    narrow = ltr_features(idx, q, df, ["stars"], window=2,
                          analyzer="simple_code")
    out = ltr_rescore(narrow, {"beta": [0.0, 1.0], "intercept": 0.0},
                      k=10).collect()
    assert len(out) == 2  # rescoring never resurrects beyond the window
