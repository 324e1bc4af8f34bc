"""Compound query types (dis_max / multi_match / constant_score /
boosting) cross-checked against independent compositions of the
already-oracled bm25_topk path."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    bm25_topk,
    boosting_topk,
    constant_score_topk,
    dis_max_topk,
    multi_match_topk,
)

DOCS = [
    (1, "spark shuffle join partition", "web"),
    (2, "spark broadcast join small table", "web"),
    (3, "partition pruning parquet scan", "wiki"),
    (4, "naive bayes classifier text", "wiki"),
    (5, "text tokenizer stopword stemmer", "book"),
    (6, "join join join everywhere", "book"),
    (7, "completely unrelated content here", "web"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id bigint, text string, source string"
    )
    return build_logical_index(docs, text_col="text", analyzer="simple_code",
                               doc_id_col="doc_id")


def _scores(idx, text):
    q = bm25_topk(
        idx,
        idx.postings.sparkSession.createDataFrame(
            [(1, text)], "query_id int, query_text string"
        ),
        k=100, analyzer="simple_code",
    )
    return {r.doc_id: r.score for r in q.collect()}


def test_dis_max_max_plus_tiebreak(idx):
    qa, qb = "spark join", "text classifier"
    sa, sb = _scores(idx, qa), _scores(idx, qb)
    got = {r.doc_id: r.score
           for r in dis_max_topk(idx, [qa, qb], tie_breaker=0.3, k=100,
                                 analyzer="simple_code").collect()}
    want = {}
    for d in set(sa) | set(sb):
        vals = [sa.get(d, 0.0), sb.get(d, 0.0)]
        want[d] = max(vals) + 0.3 * (sum(vals) - max(vals))
    assert set(got) == set(want)
    for d, v in got.items():
        assert v == pytest.approx(want[d], rel=1e-12)


def test_dis_max_zero_tiebreak_is_pure_max(idx):
    qa, qb = "spark join", "join everywhere"
    sa, sb = _scores(idx, qa), _scores(idx, qb)
    got = {r.doc_id: r.score
           for r in dis_max_topk(idx, [qa, qb], k=100,
                                 analyzer="simple_code").collect()}
    for d, v in got.items():
        assert v == pytest.approx(max(sa.get(d, 0.0), sb.get(d, 0.0)),
                                  rel=1e-12)


def test_multi_match_best_and_most_fields(spark, idx):
    docs = spark.createDataFrame(
        DOCS, "doc_id bigint, text string, source string"
    )
    idx_src = build_logical_index(docs, text_col="source",
                                  analyzer="simple_code",
                                  doc_id_col="doc_id")
    q = "web spark join"
    st = _scores(idx, q)
    ss = {d: 2.0 * v for d, v in _scores(idx_src, q).items()}
    best = {r.doc_id: r.score
            for r in multi_match_topk({"text": idx, "source": idx_src}, q,
                                      field_boosts={"source": 2.0},
                                      mode="best_fields", tie_breaker=0.1,
                                      k=100, analyzer="simple_code").collect()}
    most = {r.doc_id: r.score
            for r in multi_match_topk({"text": idx, "source": idx_src}, q,
                                      field_boosts={"source": 2.0},
                                      mode="most_fields",
                                      k=100, analyzer="simple_code").collect()}
    for d in set(st) | set(ss):
        vals = [v for v in (st.get(d), ss.get(d)) if v is not None]
        assert best[d] == pytest.approx(
            max(vals) + 0.1 * (sum(vals) - max(vals)), rel=1e-12)
        assert most[d] == pytest.approx(sum(vals), rel=1e-12)

    with pytest.raises(ValueError, match="unknown multi_match mode"):
        multi_match_topk({"text": idx}, q, mode="cross_fields")


def test_constant_score(idx):
    got = constant_score_topk(idx, "spark stemmer", boost=2.5, k=100,
                              analyzer="simple_code").collect()
    # docs 1, 2 (spark) and 5 (stemmer) match; all score exactly 2.5,
    # ranked by doc_id
    assert [(r.rank, r.doc_id, r.score) for r in got] == [
        (1, 1, 2.5), (2, 2, 2.5), (3, 5, 2.5)
    ]


def test_boosting_demotes_not_excludes(idx):
    pos, neg = "spark join", "broadcast"
    base = _scores(idx, pos)
    got = {r.doc_id: r.score
           for r in boosting_topk(idx, pos, neg, negative_boost=0.4, k=100,
                                  analyzer="simple_code").collect()}
    assert set(got) == set(base)          # demoted, never dropped
    assert got[2] == pytest.approx(base[2] * 0.4, rel=1e-12)  # has broadcast
    for d in got:
        if d != 2:
            assert got[d] == pytest.approx(base[d], rel=1e-12)


def test_explain_score_matches_bm25(spark, idx):
    from elasticsearch_nlp_classifier_spark.query.bm25 import explain_score

    base = _scores(idx, "spark join zzznothere")
    ex = explain_score(idx, "spark join zzznothere", doc_id=1,
                       analyzer="simple_code").collect()
    by_term = {r.term: r for r in ex}
    assert set(by_term) == {"spark", "join", "zzznothere"}
    assert by_term["zzznothere"].matched is False
    assert by_term["zzznothere"].tf is None and by_term["zzznothere"].contrib is None
    got = sum(r.contrib for r in ex if r.matched)
    assert got == pytest.approx(base[1], rel=1e-12)


def test_synonym_filters(spark):
    from elasticsearch_nlp_classifier_spark.analyzer.synonyms import (
        canonicalize_tokens, expand_query_terms, expand_tokens,
    )

    df = spark.createDataFrame([(["fast", "car", "slow"],)], "toks array<string>")
    canon = df.select(
        canonicalize_tokens(F.col("toks"),
                            {"fast": "quick", "slow": "quick"}).alias("t")
    ).head().t
    assert canon == ["quick", "car", "quick"]
    exp = df.select(
        expand_tokens(F.col("toks"), {"fast": ["quick", "rapid"]}).alias("t")
    ).head().t
    assert exp == ["fast", "quick", "rapid", "car", "slow"]
    assert expand_query_terms(["fast", "car"], {"fast": ["quick"]}) == [
        "car", "fast", "quick"
    ]
    # no-op dictionaries pass tokens through
    assert df.select(canonicalize_tokens(F.col("toks"), {}).alias("t")
                     ).head().t == ["fast", "car", "slow"]


def test_union_indexes_equals_single(spark):
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index, union_indexes,
    )

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string, source string")
    whole = build_logical_index(docs, text_col="text",
                                analyzer="simple_code", doc_id_col="doc_id")
    halves = [
        build_logical_index(docs.where(F.col("doc_id") % 2 == p),
                            text_col="text", analyzer="simple_code",
                            doc_id_col="doc_id")
        for p in (0, 1)
    ]
    merged = union_indexes(halves)
    assert merged.corpus_stats == whole.corpus_stats
    a, b = _scores(whole, "spark join table"), _scores(merged, "spark join table")
    assert set(a) == set(b)
    for d in a:
        assert b[d] == pytest.approx(a[d], rel=1e-12)

    with pytest.raises(ValueError, match="at least one index"):
        union_indexes([])
