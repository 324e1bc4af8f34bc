"""Per-field similarity modules (LMDirichlet / LMJelinekMercer / DFI /
boolean / scripted) vs a plain-Python float64 twin implementing the same
published Lucene formulas — rank- and score-identical on a small corpus.
"""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import similarity_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "the the the quick quick fox fox fox fox"),
    (5, "sphinx of black quartz judge my vow"),
    (6, "fox"),
    (7, "quick brown dogs and lazy foxes judge the sphinx"),
]


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    idx = build_logical_index(df, analyzer="simple_code")
    idx.postings = idx.postings.cache()
    idx.postings.count()
    return idx


def _twin_stats():
    toks = {d: c.lower().split() for d, c in DOCS}
    tf = {d: Counter(t) for d, t in toks.items()}
    dl = {d: len(t) for d, t in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    ttf = Counter()
    for c in tf.values():
        ttf.update(c)
    sum_ttf = sum(dl.values())
    return tf, dl, df, ttf, sum_ttf, len(DOCS)


def _twin_scores(terms, per_term):
    """score(d) = Σ_t per_term(tf, dl, t) over t present in d."""
    tf, dl, df, ttf, sum_ttf, n = _twin_stats()
    out = {}
    for d in tf:
        s = 0.0
        hit = False
        for t in terms:
            if tf[d][t] > 0:
                hit = True
                s += per_term(tf[d][t], dl[d], t)
        if hit:
            out[d] = s
    return out


def _ranked(scores, k=10):
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _engine(spark, index, **kw):
    q = spark.createDataFrame(
        [(1, "the quick fox")], "query_id int, query_text string"
    )
    rows = similarity_topk(
        index, q, k=10, analyzer="simple_code", **kw
    ).collect()
    return [(r.doc_id, r.score) for r in rows]


def _assert_match(engine_rows, twin):
    assert [d for d, _ in engine_rows] == [d for d, _ in twin]
    for (d1, s1), (d2, s2) in zip(engine_rows, twin):
        assert s1 == pytest.approx(s2, abs=1e-9), (d1, d2)


def test_lm_dirichlet_matches_twin(spark, index):
    tf, dl, df, ttf, sum_ttf, n = _twin_stats()
    mu = 2000.0

    def per_term(f, d_len, t):
        p = (ttf[t] + 1.0) / (sum_ttf + 1.0)
        raw = math.log(1 + f / (mu * p)) + math.log(mu / (d_len + mu))
        return max(0.0, raw)

    twin = _ranked(_twin_scores(["the", "quick", "fox"], per_term))
    _assert_match(_engine(spark, index, similarity="lm_dirichlet"), twin)


def test_lm_jelinek_mercer_matches_twin(spark, index):
    tf, dl, df, ttf, sum_ttf, n = _twin_stats()
    lam = 0.1

    def per_term(f, d_len, t):
        p = (ttf[t] + 1.0) / (sum_ttf + 1.0)
        return math.log(1 + ((1 - lam) * f / d_len) / (lam * p))

    twin = _ranked(_twin_scores(["the", "quick", "fox"], per_term))
    _assert_match(
        _engine(spark, index, similarity="lm_jelinek_mercer"), twin
    )


@pytest.mark.parametrize("measure", ["standardized", "saturated",
                                     "chisquared"])
def test_dfi_matches_twin(spark, index, measure):
    tf, dl, df, ttf, sum_ttf, n = _twin_stats()

    def per_term(f, d_len, t):
        expected = (ttf[t] + 1.0) * d_len / (sum_ttf + 1.0)
        if f <= expected:
            return 0.0
        if measure == "standardized":
            m = (f - expected) / math.sqrt(expected)
        elif measure == "saturated":
            m = (f - expected) ** 2 / (f + expected)
        else:
            m = (f - expected) ** 2 / expected
        return math.log2(m + 1)

    twin = _ranked(_twin_scores(["the", "quick", "fox"], per_term))
    _assert_match(
        _engine(spark, index, similarity="dfi", measure=measure), twin
    )


def test_dfi_common_term_scores_zero(spark, index):
    """'the' in doc 4 (tf=3, dl=9) is at/below its independence
    expectation in the hot doc → contributes 0, not negative."""
    q = spark.createDataFrame([(1, "the")],
                              "query_id int, query_text string")
    rows = similarity_topk(index, q, analyzer="simple_code",
                           similarity="dfi").collect()
    assert all(r.score >= 0.0 for r in rows)
    # every doc containing 'the' is still a hit (ES returns matches
    # even at score 0)
    n_the = index.postings.where(F.col("term") == "the").count()
    assert len(rows) == n_the


def test_boolean_similarity_counts_matched_terms(spark, index):
    engine = _engine(spark, index, similarity="boolean")
    twin = _ranked(_twin_scores(["the", "quick", "fox"],
                                lambda f, d, t: 1.0))
    _assert_match(engine, twin)


def test_scripted_similarity_sql_expression(spark, index):
    """Painless-analog: classic TF-IDF as a SQL expression."""
    script = "sqrt(tf) * (1.0 + ln(n_docs / (df + 1.0)))"
    tf, dl, df, ttf, sum_ttf, n = _twin_stats()

    def per_term(f, d_len, t):
        return math.sqrt(f) * (1.0 + math.log(n / (df[t] + 1.0)))

    twin = _ranked(_twin_scores(["the", "quick", "fox"], per_term))
    _assert_match(
        _engine(spark, index, similarity="scripted", script=script), twin
    )


def test_scripted_requires_script(spark, index):
    with pytest.raises(ValueError, match="script"):
        _engine(spark, index, similarity="scripted")


def test_unknown_similarity_rejected(spark, index):
    with pytest.raises(ValueError, match="unknown similarity"):
        _engine(spark, index, similarity="bm42")


def test_plan_has_no_python_and_broadcasts(spark, index):
    q = spark.createDataFrame([(1, "quick fox")],
                              "query_id int, query_text string")
    plan = similarity_topk(
        index, q, analyzer="simple_code", similarity="lm_dirichlet"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
