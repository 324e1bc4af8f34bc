"""Query-DSL JSON compiler: every node row-identical to the direct
operator call it dispatches to."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    RetrieverContext,
    bm25_topk,
    bool_query_topk,
    boosting_topk,
    constant_score_topk,
    dis_max_topk,
    es_search,
    multi_match_topk,
)

DOCS = [
    (1, "spark data engine", "fast spark engine docs", 3),
    (2, "data tables and data frames", "columnar data layout", 7),
    (3, "query planner", "catalyst optimizes the query", 1),
    (4, "spark streaming data", "micro batch engine", 5),
    (5, "storage formats", "parquet orc avro", 2),
]


@pytest.fixture(scope="module")
def ctx(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, title string, body string, stars int"
    )
    idx = build_logical_index(df, text_col="title",
                              analyzer="simple_code")
    idx.postings = idx.postings.cache(); idx.postings.count()
    return RetrieverContext(
        index=idx,
        docs=df,
        analyzer="simple_code",
        text_field="title",
        extra={"indexes": {
            "title": idx,
            "body": build_logical_index(df, text_col="body",
                                        analyzer="simple_code"),
        }},
    )


def _rows(df):
    return [(r.rank, r.doc_id, round(r.score, 9)) for r in df.collect()]


def test_match(spark, ctx):
    got = es_search({"query": {"match": {"title": "spark data"}}},
                    ctx, k=5)
    q = spark.createDataFrame([(0, "spark data")],
                              "query_id int, query_text string")
    want = bm25_topk(ctx.index, q, k=5, analyzer="simple_code")
    assert [d for _, d, _ in _rows(got)] == \
        [r.doc_id for r in want.collect()]


def test_match_all_size(spark, ctx):
    got = es_search({"query": {"match_all": {}}, "size": 3}, ctx)
    assert _rows(got) == [(1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0)]


def test_bool(spark, ctx):
    body = {"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "should": [{"match": {"title": {"query": "spark", "boost": 2.0}}}],
        "must_not": [{"match": {"title": "streaming"}}],
    }}}
    got = es_search(body, ctx, k=5)
    want = bool_query_topk(ctx.index, must=["data"],
                           should=[("spark", 2.0)],
                           must_not=["streaming"], k=5,
                           analyzer="simple_code")
    assert _rows(got) == _rows(want)


def test_dis_max(spark, ctx):
    body = {"query": {"dis_max": {
        "queries": [{"match": {"title": "spark"}},
                    {"match": {"title": "query"}}],
        "tie_breaker": 0.3}}}
    got = es_search(body, ctx, k=5)
    want = dis_max_topk(ctx.index, ["spark", "query"], tie_breaker=0.3,
                        k=5, analyzer="simple_code")
    assert _rows(got) == _rows(want)


def test_constant_score_and_boosting(spark, ctx):
    got = es_search({"query": {"constant_score": {
        "filter": {"match": {"title": "data"}}, "boost": 1.5}}}, ctx, k=5)
    want = constant_score_topk(ctx.index, "data", boost=1.5, k=5,
                               analyzer="simple_code")
    assert _rows(got) == _rows(want)

    got = es_search({"query": {"boosting": {
        "positive": {"match": {"title": "data"}},
        "negative": {"match": {"title": "streaming"}},
        "negative_boost": 0.2}}}, ctx, k=5)
    want = boosting_topk(ctx.index, "data", "streaming",
                         negative_boost=0.2, k=5,
                         analyzer="simple_code")
    assert _rows(got) == _rows(want)


def test_multi_match_with_caret_boost(spark, ctx):
    body = {"query": {"multi_match": {
        "query": "spark engine", "fields": ["title^2", "body"],
        "type": "most_fields"}}}
    got = es_search(body, ctx, k=5)
    want = multi_match_topk(ctx.extra["indexes"], "spark engine",
                            field_boosts={"title": 2.0},
                            mode="most_fields", k=5,
                            analyzer="simple_code")
    assert _rows(got) == _rows(want)


def test_function_score_field_value_factor(spark, ctx):
    body = {"query": {"function_score": {
        "query": {"match": {"title": "data"}},
        "field_value_factor": {"field": "stars", "factor": 1.0,
                               "modifier": "log1p"},
        "boost_mode": "multiply"}}}
    got = _rows(es_search(body, ctx, k=5))
    # doc 2 (stars 7, two 'data' hits) must outrank doc 4 (stars 5)
    assert got[0][1] == 2
    assert {d for _, d, _ in got} == {1, 2, 4}  # the 'data' matchers


def test_unsupported_nodes_raise(spark, ctx):
    with pytest.raises(ValueError, match="unsupported query node"):
        es_search({"query": {"fuzzy": {"title": "spark"}}}, ctx)
    with pytest.raises(ValueError, match="sub-clause"):
        es_search({"query": {"bool": {"must": [
            {"range": {"stars": {"gte": 2}}}]}}}, ctx)
    with pytest.raises(ValueError, match="query"):
        es_search({}, ctx)


def test_nested_bool_must_equals_flat(spark, ctx):
    """A bool wrapped in a must is score-identical to the flat bool
    (r3 verdict #3: nested bodies used to raise)."""
    flat = _rows(es_search({"query": {"bool": {"must": [
        {"match": {"title": "spark"}}]}}}, ctx, k=5))
    nested = _rows(es_search({"query": {"bool": {"must": [
        {"bool": {"must": [{"match": {"title": "spark"}}]}}]}}},
        ctx, k=5))
    assert nested == flat


def test_nested_bool_filter_wrapping_should_group(spark, ctx):
    """The commonest pasted shape: a filter wrapping a should group —
    predicate-only (score comes from the must alone)."""
    body = {"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "filter": [{"bool": {"should": [
            {"match": {"title": "spark"}},
            {"match": {"title": "query"}}]}}]}}}
    got = _rows(es_search(body, ctx, k=5))
    # docs with 'data' AND ('spark' OR 'query') in title: 1, 4
    assert sorted(d for _, d, _ in got) == [1, 4]
    flat_data = _rows(es_search({"query": {"bool": {"must": [
        {"match": {"title": "data"}}]}}}, ctx, k=5))
    scores = {d: s for _, d, s in flat_data}
    for _, d, s in got:
        assert s == scores[d]  # filter context adds zero score


def test_nested_bool_should_adds_score_and_counts_one(spark, ctx):
    body = {"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "should": [{"bool": {"must": [
            {"match": {"title": "spark"}},
            {"match": {"title": "engine"}}]}}]}}}
    got = {d: s for _, d, s in _rows(es_search(body, ctx, k=5))}
    assert set(got) == {1, 2, 4}     # all 'data' docs match
    data_s = {d: s for _, d, s in _rows(es_search(
        {"query": {"bool": {"must": [{"match": {"title": "data"}}]}}},
        ctx, k=5))}
    sub_s = {d: s for _, d, s in _rows(es_search(
        {"query": {"bool": {"must": [{"match": {"title": "spark"}},
                                     {"match": {"title": "engine"}}]}}},
        ctx, k=5))}
    # only doc 1 has spark AND engine: its score is the sum of frames
    assert got[1] == round(data_s[1] + sub_s[1], 9)
    assert got[2] == data_s[2] and got[4] == data_s[4]

    # a matched nested should counts 1 toward minimum_should_match
    msm2 = {"query": {"bool": {
        "should": [{"match": {"title": "data"}},
                   {"bool": {"must": [{"match": {"title": "query"}}]}}],
        "minimum_should_match": 2}}}
    assert _rows(es_search(msm2, ctx, k=5)) == []


def test_nested_bool_must_not_excludes(spark, ctx):
    body = {"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "must_not": [{"bool": {"must": [
            {"match": {"title": "spark"}},
            {"match": {"title": "streaming"}}]}}]}}}
    got = _rows(es_search(body, ctx, k=5))
    # doc 4 ('spark streaming data') matches the nested must_not
    assert sorted(d for _, d, _ in got) == [1, 2]


def test_leaf_must_not_excludes_with_optional_base(spark, ctx):
    """Round-5 regression (ADVICE r4, dsl.py _bool_frame): leaf
    must_not must exclude at LEVEL scope even when the leaf base frame
    is optional (leaf shoulds only, no leaf must/filter) and the level
    also has nested must members.  Before the fix, doc 4 ('spark
    streaming data') survived via the nested must despite matching the
    leaf must_not."""
    body = {"query": {"bool": {
        "must": [{"bool": {"must": [{"match": {"title": "data"}}]}}],
        "should": [{"match": {"title": "engine"}}],
        "must_not": [{"match": {"title": "streaming"}}]}}}
    got = _rows(es_search(body, ctx, k=5))
    assert sorted(d for _, d, _ in got) == [1, 2]


def test_nested_bool_depth_three(spark, ctx):
    body = {"query": {"bool": {"must": [{"bool": {"must": [
        {"bool": {"should": [{"match": {"title": "planner"}}]}}]}}]}}}
    got = _rows(es_search(body, ctx, k=5))
    assert [d for _, d, _ in got] == [3]


def test_wrong_field_raises_not_silently_rescored(spark, ctx):
    # ctx.index is built over "title"; a pasted body naming another
    # field must raise, never score against title (ADVICE r2)
    with pytest.raises(ValueError, match="built over 'title'"):
        es_search({"query": {"bool": {"must": [
            {"match": {"body": "spark"}}]}}}, ctx)
    with pytest.raises(ValueError, match="built over 'title'"):
        es_search({"query": {"match": {"body": "spark"}}}, ctx)
    with pytest.raises(ValueError, match="built over 'title'"):
        es_search({"query": {"dis_max": {"queries": [
            {"match": {"body": "spark"}}]}}}, ctx)


def test_unhonorable_boost_raises(spark, ctx):
    # per-clause boosts are honored in should; anywhere the compiler
    # would have to DROP one, it raises instead
    with pytest.raises(ValueError, match="boost"):
        es_search({"query": {"bool": {"must": [
            {"match": {"title": {"query": "spark", "boost": 2.0}}}]}}},
            ctx)
    with pytest.raises(ValueError, match="boost"):
        es_search({"query": {"dis_max": {"queries": [
            {"match": {"title": {"query": "spark", "boost": 2.0}}}]}}},
            ctx)
    # should-clause boost still works (honored by bool_query_topk)
    got = es_search({"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "should": [{"match": {"title": {"query": "spark",
                                        "boost": 2.0}}}]}}}, ctx, k=5)
    assert got.count() > 0
    # filter-context boost is inert in ES too: accepted, not dropped
    got = es_search({"query": {"bool": {
        "must": [{"match": {"title": "data"}}],
        "filter": [{"term": {"title": {"value": "spark",
                                       "boost": 3.0}}}]}}}, ctx, k=5)
    assert got.count() > 0


def test_indices_boost_multiplies_and_validates(spark, ctx):
    from elasticsearch_nlp_classifier_spark.query import (
        indices_boost_topk,
    )

    docs = ctx.docs
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    lo = build_logical_index(docs.where("doc_id <= 3"), text_col="title",
                             analyzer="simple_code")
    hi = build_logical_index(docs.where("doc_id > 3"), text_col="title",
                             analyzer="simple_code")
    flat = indices_boost_topk({"lo": lo, "hi": hi},
                              {"lo": 1.0, "hi": 1.0},
                              "data", k=10, analyzer="simple_code")
    x2 = indices_boost_topk({"lo": lo, "hi": hi},
                            {"lo": 1.0, "hi": 2.0},
                            "data", k=10, analyzer="simple_code")
    f = {r.doc_id: r.score for r in flat.collect()}
    b = {r.doc_id: r.score for r in x2.collect()}
    assert set(f) == set(b)
    for d in f:
        expect = f[d] * (2.0 if d > 3 else 1.0)
        assert b[d] == pytest.approx(expect, abs=1e-9)

    with pytest.raises(ValueError, match="boosts"):
        indices_boost_topk({"lo": lo}, {"other": 1.0}, "data")
