"""Term-expansion query family: prefix/wildcard ranked queries,
more-like-this, did-you-mean suggestions (ES more_like_this / prefix /
wildcard / term-suggester surfaces)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query.mlt import (
    mlt_terms,
    more_like_this,
    prefix_topk,
    suggest_terms,
    wildcard_topk,
)
from elasticsearch_nlp_classifier_spark.query.wand import (
    topk_from_pairs,
    wand_topk,
)

DOCS = [
    (0, "sparkle sparkling spark sparks shine"),
    (1, "spark jobs run on clusters"),
    (2, "sparkle and glitter and shine"),
    (3, "unrelated text entirely"),
    (4, "spark spark sparkle sparks"),
    (5, "the sparkling water brand"),
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = str(tmp_path_factory.mktemp("mltidx") / "idx")
    return build_physical_index(
        docs, out, text_col="text", analyzer="simple_code", block_size=4,
    )


def test_prefix_topk_expands_dictionary(index):
    got = prefix_topk(index, "spark", k=10).toPandas()
    # every doc containing a spark* term ranks; doc 3 never does
    assert 3 not in set(got.doc_id)
    assert {0, 1, 4} <= set(got.doc_id)
    # equals WAND over the explicit expansion set
    exp = sorted(
        r["term"] for r in index.term_stats.where(
            F.col("term").startswith("spark")
        ).collect()
    )
    want = topk_from_pairs(index, [(0, t) for t in exp], {0: 10}).toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)


def test_wildcard_topk(index):
    got = wildcard_topk(index, "spark?", k=10).toPandas()
    # 'sparks' matches spark?; 'spark' (5 chars) and 'sparkle' (7) don't
    exp = sorted(
        r["term"] for r in index.term_stats.where(
            F.col("term").rlike("^spark.$")
        ).collect()
    )
    assert exp == ["sparks"]
    want = topk_from_pairs(index, [(0, t) for t in exp], {0: 10}).toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)


def test_suggest_terms_orders_by_dist_then_df(index):
    got = suggest_terms(index, "sparkz", n=3).toPandas()
    # distance 1: 'spark' (df 3) and 'sparks' (df 2) -> df DESC
    assert got.term.tolist()[:2] == ["spark", "sparks"]
    assert got.dist.tolist()[:2] == [1, 1]


def test_mlt_terms_and_query(index):
    terms = mlt_terms(index, 2, max_query_terms=2)
    # doc 2 = sparkle glitter shine (+stoplist-free 'and'); glitter is
    # rarest (df 1) -> highest idf, tf 1 each except 'and' (tf 2)
    assert "glitter" in terms

    out = more_like_this(index, 2, k=3, max_query_terms=4).toPandas()
    assert 2 not in set(out.doc_id)          # self excluded
    assert len(out) <= 3
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    # doc 0 shares sparkle+shine -> should be the nearest neighbour
    assert out.doc_id.iloc[0] == 0


def test_mlt_include_self_ranks_source_first(index):
    out = more_like_this(
        index, 2, k=3, max_query_terms=4, include_self=True
    ).toPandas()
    assert out.doc_id.iloc[0] == 2


def test_regexp_topk_anchored_expansion(index):
    from elasticsearch_nlp_classifier_spark.query.mlt import regexp_topk

    got = regexp_topk(index, "spark(s|le)?", k=10).toPandas()
    # expansion = {spark, sparks, sparkle}; 'sparkling' excluded by the
    # implicit full anchor (Lucene regexp semantics)
    exp = ["spark", "sparkle", "sparks"]
    want = topk_from_pairs(index, [(0, t) for t in exp], {0: 10}).toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)
    # doc 5 matches only via 'sparkling' -> must NOT rank
    assert 5 not in set(got.doc_id)


def test_completion_suggest_weight_then_term(index):
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        completion_suggest,
    )

    got = completion_suggest(index, "spark", n=10).toPandas()
    # weights are doc freqs; order weight DESC then term ASC
    dfs = {
        r["term"]: r["df"]
        for r in index.term_stats.where(
            F.col("term").startswith("spark")
        ).collect()
    }
    want = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got.term, got.weight)) == want
    assert list(got.columns) == ["term", "weight"]
