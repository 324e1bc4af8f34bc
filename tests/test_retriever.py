"""Retriever tree API: standard / knn leaves, rrf / linear /
text_similarity_reranker compound nodes."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query.retriever import (
    RetrieverContext,
    retrieve,
)


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = build_logical_index(docs, text_col="text", analyzer="simple_code",
                              doc_id_col="doc_id")
    idx.postings.cache().count()
    return RetrieverContext(index=idx, docs=docs, embeddings=emb,
                            analyzer="simple_code")


@pytest.fixture(scope="module")
def qvec(ctx):
    row = ctx.embeddings.where(F.col("vec_id") == 7).collect()[0]
    return [float(x) for x in row.embedding]


def test_standard_matches_bm25(ctx, spark):
    from elasticsearch_nlp_classifier_spark.query import bm25_topk

    spec = {"standard": {"query": {"match": {"text": "data value table"}}}}
    got = retrieve(spec, ctx, k=10).collect()
    q = spark.createDataFrame([(0, "data value table")],
                              "query_id int, query_text string")
    want = bm25_topk(ctx.index, q, k=10, analyzer="simple_code").collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert [round(r.score, 6) for r in got] == [round(r.score, 6) for r in want]


def test_standard_prefilter(ctx):
    spec = {"standard": {
        "query": {"match": {"text": "data value table"}},
        "filter": [{"term": {"lang": "en"}}],
    }}
    out = retrieve(spec, ctx, k=10)
    langs = {r.lang for r in out.join(ctx.docs, "doc_id").select("lang").collect()}
    assert langs <= {"en"}
    assert out.count() > 0


def test_knn_exact(ctx, qvec):
    spec = {"knn": {"field": "embedding", "query_vector": qvec, "k": 5}}
    out = retrieve(spec, ctx, k=5).collect()
    assert len(out) == 5
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # query vector IS vec 7's embedding → vec 7 itself wins at cos≈1
    assert out[0].doc_id == 7 and out[0].score > 0.999
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_knn_filter(ctx, qvec):
    spec = {"knn": {"field": "embedding", "query_vector": qvec, "k": 5,
                    "filter": [{"range": {"vec_id": {"lt": 50}}}]}}
    out = retrieve(spec, ctx, k=5).collect()
    assert all(r.doc_id < 50 for r in out)


def test_rrf_fuses_lexical_and_vector(ctx, qvec):
    spec = {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": {"match": {"text": "data value table"}}}},
            {"knn": {"field": "embedding", "query_vector": qvec, "k": 20}},
        ],
        "rank_window_size": 20,
        "rank_constant": 60,
    }}}
    out = retrieve(spec, ctx, k=10).collect()
    assert len(out) == 10
    lex = {r.doc_id for r in retrieve(
        {"standard": {"query": {"match": {"text": "data value table"}}}},
        ctx, k=20).collect()}
    vec = {r.doc_id for r in retrieve(
        {"knn": {"field": "embedding", "query_vector": qvec, "k": 20}},
        ctx, k=20).collect()}
    got = {r.doc_id for r in out}
    assert got <= (lex | vec)
    # RRF math: every fused score is a sum of 1/(60+rank) terms
    for r in out:
        assert 0 < r.score <= 2 / 61


def test_linear_minmax(ctx, qvec):
    spec = {"linear": {
        "retrievers": [
            {"retriever": {"standard": {"query": {"match": {"text": "data value table"}}}},
             "weight": 2.0, "normalizer": "minmax"},
            {"retriever": {"knn": {"field": "embedding", "query_vector": qvec, "k": 20}},
             "weight": 1.0, "normalizer": "minmax"},
        ],
        "rank_window_size": 20,
    }}
    out = retrieve(spec, ctx, k=10).collect()
    assert len(out) == 10
    assert all(0.0 <= r.score <= 3.0 + 1e-9 for r in out)
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_reranker(ctx, qvec):
    spec = {"text_similarity_reranker": {
        "retriever": {"standard": {"query": {"match": {"text": "data value table"}}}},
        "rank_window_size": 20,
        "query_vector": qvec,
    }}
    out = retrieve(spec, ctx, k=5).collect()
    assert len(out) == 5
    # reranked purely by cosine: scores descend and are in [-1, 1]
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in scores)
    # the winner set came from the lexical window
    window = {r.doc_id for r in retrieve(
        {"standard": {"query": {"match": {"text": "data value table"}}}},
        ctx, k=20).collect()}
    assert {r.doc_id for r in out} <= window


def test_bad_specs(ctx):
    with pytest.raises(ValueError):
        retrieve({"nope": {}}, ctx)
    with pytest.raises(ValueError):
        retrieve({"standard": {"query": {"wildcard": {"text": "x*"}}}}, ctx)
    with pytest.raises(ValueError):
        retrieve({"standard": {"query": {"match": {"text": "x"}},
                               "filter": [{"fuzzy": {"text": "x"}}]}}, ctx)
