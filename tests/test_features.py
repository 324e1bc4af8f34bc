"""Feature-scoring query family (query/features.py): rank_feature,
distance_feature, pinned, script_score, combined_fields — plus the
match_bool_prefix term-expansion query.  Covers the semantics the
DuckDB oracle entries don't pin: alternate rank_feature functions,
missing pinned ids, empty queries, weight sensitivity."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query.features import (
    bool_rank_feature_topk,
    combined_fields_topk,
    combined_index,
    distance_feature_topk,
    geometric_mean_pivot,
    pinned_topk,
    rank_feature_score,
    rank_feature_topk,
    script_score_topk,
)

DOCS = [
    (0, "alpha beta gamma", "web", 10.0),
    (1, "alpha alpha beta", "web", 100.0),
    (2, "gamma delta", "news", 1000.0),
    (3, "beta beta beta alpha", "web", 1.0),
    (4, "unrelated words only", "news", 50.0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id bigint, text string, src string, pop double"
    ).cache()


@pytest.fixture(scope="module")
def index(docs):
    return build_logical_index(
        docs, text_col="text", analyzer="simple_code", doc_id_col="doc_id"
    )


def test_geometric_mean_pivot_exact(docs):
    vals = [10.0, 100.0, 1000.0, 1.0, 50.0]
    want = math.exp(sum(math.log(v) for v in vals) / len(vals))
    assert geometric_mean_pivot(docs, "pop") == pytest.approx(want, rel=1e-12)


def test_rank_feature_functions(docs):
    # saturation: f/(f+pivot), monotone in f
    top = rank_feature_topk(docs, "pop", pivot=50.0, k=5).toPandas()
    assert list(top.doc_id) == [2, 1, 4, 0, 3]
    sat = top.set_index("doc_id").score
    assert sat[2] == pytest.approx(1000.0 / 1050.0)
    # log: ln(scaling+f)
    lg = rank_feature_topk(docs, "pop", function="log", scaling=1.0,
                           k=5).toPandas().set_index("doc_id").score
    assert lg[1] == pytest.approx(math.log(101.0))
    # sigmoid: f^e/(f^e+p^e)
    sg = rank_feature_topk(docs, "pop", function="sigmoid", pivot=50.0,
                           exponent=0.6, k=5).toPandas()
    s1 = sg.set_index("doc_id").score[1]
    assert s1 == pytest.approx(100**0.6 / (100**0.6 + 50**0.6))
    with pytest.raises(ValueError):
        rank_feature_score(F.lit(1.0), function="nope")
    with pytest.raises(ValueError):
        rank_feature_score(F.lit(1.0), function="saturation", pivot=None)


def test_bool_rank_feature_adds_boost(index, docs):
    base = bool_rank_feature_topk(
        index, docs, "alpha", "pop", pivot=50.0, boost=0.0, k=5
    ).toPandas().set_index("doc_id").score
    boosted = bool_rank_feature_topk(
        index, docs, "alpha", "pop", pivot=50.0, boost=2.0, k=5
    ).toPandas().set_index("doc_id").score
    # only alpha docs match; boost adds 2*sat(pop) on top of BM25
    assert set(base.index) == {0, 1, 3}
    for d, pop in [(0, 10.0), (1, 100.0), (3, 1.0)]:
        assert boosted[d] - base[d] == pytest.approx(
            2.0 * pop / (pop + 50.0), rel=1e-9
        )


def test_distance_feature_shape(docs):
    top = distance_feature_topk(
        docs, F.col("pop"), origin=100.0, pivot=10.0, k=5
    ).toPandas()
    assert top.doc_id.iloc[0] == 1  # exact hit: score = boost
    assert top.score.iloc[0] == pytest.approx(1.0)
    got = top.set_index("doc_id").score
    assert got[4] == pytest.approx(10.0 / 60.0)


def test_pinned_order_and_missing_ids(index, docs):
    out = pinned_topk(
        index, "alpha beta", [3, 999, 0], k=5,
        corpus_ids=docs.select("doc_id"),
    ).toPandas()
    # pins first in list order, missing id dropped, organic follows
    assert list(out.doc_id[:2]) == [3, 0]
    assert list(out.pinned[:2]) == [True, True]
    assert out.score[:2].isna().all()
    rest = out[~out.pinned]
    assert 999 not in set(out.doc_id)
    assert set(rest.doc_id) == {1}  # doc 1 is the only unpinned match
    assert rest.score.notna().all()


def test_script_score_transforms(index, docs):
    plain = script_score_topk(
        index, "alpha", docs.select("doc_id", "pop"),
        lambda s: s, k=5,
    ).toPandas().set_index("doc_id").score
    doubled = script_score_topk(
        index, "alpha", docs.select("doc_id", "pop"),
        lambda s: s * F.lit(2.0) + F.col("f_pop"), k=5,
    ).toPandas().set_index("doc_id").score
    for d, pop in [(0, 10.0), (1, 100.0), (3, 1.0)]:
        assert doubled[d] == pytest.approx(2.0 * plain[d] + pop, rel=1e-9)


def test_combined_fields_merges_stats(spark, docs):
    f_text = build_logical_index(
        docs, text_col="text", analyzer="simple_code", doc_id_col="doc_id"
    )
    f_src = build_logical_index(
        docs, text_col="src", analyzer="simple_code", doc_id_col="doc_id"
    )
    idx = combined_index({"text": f_text, "src": f_src},
                         weights={"src": 2.0})
    m = {(r.doc_id, r.term): (r.tf, r.dl)
         for r in idx.postings.collect()}
    # doc 0: text 'alpha beta gamma' (dl 3*1) + src 'web' (dl 1*2) = 5
    assert m[(0, "alpha")] == (1.0, 5.0)
    assert m[(0, "web")] == (2.0, 5.0)   # tf weighted by 2
    # df counts containment in any field once per doc
    df = {r.term: r.df for r in idx.term_stats.collect()}
    assert df["web"] == 3 and df["alpha"] == 3
    # querying the weighted field ranks src-matching docs
    top = combined_fields_topk(
        {"text": f_text, "src": f_src}, "web", weights={"src": 2.0}, k=5
    ).toPandas()
    assert set(top.doc_id) == {0, 1, 3}


def test_match_bool_prefix(spark, tmp_path_factory):
    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        match_bool_prefix_topk,
    )

    docs = spark.createDataFrame(
        [(0, "spark runs fast"), (1, "sparkle fast"), (2, "slow snail"),
         (3, "fast spartan")],
        "doc_id bigint, text string",
    )
    out = str(tmp_path_factory.mktemp("mbpix") / "idx")
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code", block_size=4
    )
    got = match_bool_prefix_topk(
        index, "fast spar", k=10, analyzer="simple_code"
    ).toPandas()
    # 'fast' OR spar* -> docs 0,1,3 (any order/position); 2 never
    assert set(got.doc_id) == {0, 1, 3}
    empty = match_bool_prefix_topk(index, "", k=10)
    assert empty.count() == 0
