"""int8-quantized kNN (ES int8_hnsw analog) with exact float rerank."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.quantize import (
    int8_knn_topk,
    quantize_int8,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.cache()


def test_quantize_int8_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [127.0, 0.0, -127.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.id: r for r in quantize_int8(df).collect()}
    assert rows[1].qvec == [127, -64, 32]
    assert abs(rows[1].scale - 1.0 / 127.0) < 1e-12
    assert rows[2].qvec == [0, 0, 0] and rows[2].scale == 1.0
    assert rows[3].qvec == [127, 0, -127]
    assert rows[1].sq == 127 ** 2 + 64 ** 2 + 32 ** 2


def test_int8_knn_matches_brute(emb, spark):
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = int8_knn_topk(emb, q, k=5, rerank=4).collect()
    want = cosine_topk(emb, q, k=5).collect()
    # cosine_topk excludes self-matches; int8_knn doesn't — drop self
    got_f = [(r.query_id, r.vec_id) for r in got if r.vec_id != r.query_id]
    # per-query: int8+rerank recovers the exact float ranking prefix
    for qid in (0, 1, 2):
        g = [v for (qq, v) in got_f if qq == qid]
        w = [r.vec_id for r in want if r.query_id == qid][: len(g)]
        assert g == w


def test_int8_knn_precomputed_table(emb, spark):
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    qtab = quantize_int8(emb).cache()
    a = int8_knn_topk(emb, q, k=5, quantized=qtab).collect()
    b = int8_knn_topk(emb, q, k=5).collect()
    assert [(r.vec_id, r.cos_r6) for r in a] == [(r.vec_id, r.cos_r6) for r in b]


def test_quantize_plan_is_jvm(emb):
    plan = quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_int8_self_match_rank1(emb):
    q = emb.where(F.col("vec_id") == 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = int8_knn_topk(emb, q, k=3).collect()
    assert top[0].vec_id == 4 and top[0].cos_r6 == 1.0
