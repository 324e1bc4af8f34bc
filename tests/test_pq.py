"""Product-quantization ANN (operators/pq.py): encode determinism,
lossless-codebook exactness, and recall vs the brute oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train_codebooks,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_pq_encode_shape_and_determinism(spark, emb):
    books = pq_train_codebooks(emb, dim=64, m=8, n_codes=16, iters=3)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(emb, books).cache()
    first = codes.orderBy("vec_id").limit(5).collect()
    again = pq_encode(emb, books).orderBy("vec_id").limit(5).collect()
    assert [r["codes"] for r in first] == [r["codes"] for r in again]
    assert all(len(r["codes"]) == 8 for r in first)
    assert all(0 <= c < 16 for r in first for c in r["codes"])


def test_adc_exact_with_lossless_codebook(spark):
    """If every subvector value is a codebook centroid, quantization is
    lossless and ADC == exact inner product → ranks match brute."""
    rng = np.random.default_rng(7)
    m, sub, n_codes = 4, 2, 8
    vocab = rng.normal(size=(m, n_codes, sub))
    rows = []
    for i in range(60):
        v = np.concatenate([vocab[j][rng.integers(n_codes)]
                            for j in range(m)])
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    # train with enough codes to cover the vocabulary exactly
    books = pq_train_codebooks(df, dim=m * sub, m=m, n_codes=n_codes,
                               iters=15, normalize=False)
    codes = pq_encode(df, books, normalize=False)
    q = [(0, np.asarray(rows[0][1]))]
    got = pq_adc_topk(codes, q, books, k=5, normalize=False).collect()
    # exact IP ranking computed in numpy (float32 storage of the
    # vectors is the common truth both paths read)
    X = np.stack([np.asarray(r[1], dtype=np.float32).astype(np.float64)
                  for r in rows])
    ip = X @ X[0]
    order = sorted(
        (i for i in range(60) if i != 0),
        key=lambda i: (-round(ip[i], 9), i),
    )[:5]
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == order


def test_pq_recall_and_rerank(spark, emb):
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    brute = cosine_topk(emb, queries, k=10)
    want = {
        (r["query_id"], r["vec_id"]) for r in brute.collect()
    }
    books = pq_train_codebooks(emb, dim=64, m=16, n_codes=32, iters=5)
    codes = pq_encode(emb, books).cache()
    q = [(r["query_id"], np.asarray(r["query_vec"]))
         for r in queries.collect()]
    adc = pq_adc_topk(codes, q, books, k=10)
    got = {(r["query_id"], r["vec_id"]) for r in adc.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
    # exact re-rank of a deeper ADC window recovers most of the rest
    rer = pq_adc_topk(codes, q, books, k=10,
                      rerank=emb, rerank_depth=100)
    got2 = {(r["query_id"], r["vec_id"]) for r in rer.collect()}
    recall2 = len(got2 & want) / len(want)
    assert recall2 >= recall
    assert recall2 >= 0.8, recall2
    # re-ranked scores are exact cosine -> the overlap rows agree with
    # brute to float tolerance
    bs = {(r["query_id"], r["vec_id"]): r["cos"] for r in brute.collect()}
    for r in rer.collect():
        key = (r["query_id"], r["vec_id"])
        if key in bs:
            assert abs(r["score"] - bs[key]) < 1e-9


# --- IVF-PQ composite (coarse quantizer + residual PQ) ----------------

def test_ivfpq_index_shape_and_determinism(spark, emb):
    from elasticsearch_nlp_classifier_spark.operators.pq import (
        ivfpq_build,
    )

    cents, books, codes = ivfpq_build(
        emb, dim=64, n_cells=8, m=8, n_codes=16, iters=3
    )
    assert cents.shape == (8, 64)
    assert books.shape == (8, 16, 8)
    rows = codes.orderBy("vec_id").limit(5).collect()
    _, _, codes2 = ivfpq_build(
        emb, dim=64, n_cells=8, m=8, n_codes=16, iters=3
    )
    rows2 = codes2.orderBy("vec_id").limit(5).collect()
    assert [(r["cid"], r["codes"]) for r in rows] == \
        [(r["cid"], r["codes"]) for r in rows2]
    assert all(0 <= r["cid"] < 8 for r in rows)
    assert all(len(r["codes"]) == 8 for r in rows)


def test_ivfpq_recall_and_probe_monotonicity(spark, emb):
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk
    from elasticsearch_nlp_classifier_spark.operators.pq import (
        ivfpq_build, ivfpq_topk,
    )

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    want = {(r["query_id"], r["vec_id"])
            for r in cosine_topk(emb, queries, k=10).collect()}
    cents, books, codes = ivfpq_build(
        emb, dim=64, n_cells=8, m=16, n_codes=32, iters=5
    )
    codes = codes.cache()
    q = [(r["query_id"], np.asarray(r["query_vec"]))
         for r in queries.collect()]
    # all-cells probe + exact rerank == PQ rerank recall bound
    full = ivfpq_topk(codes, q, cents, books, k=10, n_probe=8,
                      rerank=emb, rerank_depth=100)
    got_full = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    recall_full = len(got_full & want) / len(want)
    assert recall_full >= 0.8, recall_full
    # fewer probes scan less and can only lose candidates, never gain
    # wrong ones: results still come from the probed cells only, and
    # recall at n_probe=4 stays useful
    part = ivfpq_topk(codes, q, cents, books, k=10, n_probe=4,
                      rerank=emb, rerank_depth=100)
    got_part = {(r["query_id"], r["vec_id"]) for r in part.collect()}
    recall_part = len(got_part & want) / len(want)
    assert recall_part >= 0.5, recall_part
    assert recall_full >= recall_part


def test_ivfpq_rerank_scores_are_exact_cosine(spark, emb):
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk
    from elasticsearch_nlp_classifier_spark.operators.pq import (
        ivfpq_build, ivfpq_topk,
    )

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    brute = {(r["query_id"], r["vec_id"]): r["cos"]
             for r in cosine_topk(emb, queries, k=10).collect()}
    cents, books, codes = ivfpq_build(
        emb, dim=64, n_cells=8, m=16, n_codes=32, iters=5
    )
    q = [(r["query_id"], np.asarray(r["query_vec"]))
         for r in queries.collect()]
    rer = ivfpq_topk(codes, q, cents, books, k=10, n_probe=8,
                     rerank=emb, rerank_depth=100)
    for r in rer.collect():
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert abs(r["score"] - brute[key]) < 1e-9
