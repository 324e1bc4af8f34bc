"""Positional postings + phrase matching (reference surface:
`TermVectorQuery.java:60-76` requests per-token positions; fixture
`TermVectorTokensTest.java:16-55` carries a 0-based `position` per
token — the payload that gates phrase queries)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import (
    build_logical_index,
    term_vectors,
)
from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query import match_phrase


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown quick brown quick brown"),
    (2, "brown quick and the fox is lazy"),
    (3, "the quick red fox"),
    (4, "entirely unrelated words here"),
    (5, ""),
    (6, "quick"),
    (7, "one quick brown fox and another quick brown fox"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").cache()


@pytest.fixture(scope="module")
def pos_index(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    return build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True, block_size=4,
    )


def test_logical_positions_invariants(docs):
    idx = build_logical_index(
        docs, "text", "simple_code", with_positions=True
    )
    p = idx.postings
    # tf == number of positions, positions strictly increasing
    bad = p.where(
        (F.size("positions") != F.col("tf"))
        | (F.size("positions") !=
           F.size(F.array_distinct("positions")))
    ).count()
    assert bad == 0
    row = {
        r["term"]: list(r["positions"])
        for r in p.where(F.col("doc_id") == 0).collect()
    }
    assert row["the"] == [0, 6]
    assert row["quick"] == [1]
    assert row["dog"] == [8]


def test_physical_roundtrip_with_positions(spark, docs, pos_index):
    logical = build_logical_index(
        docs, "text", "simple_code", with_positions=True
    ).postings
    decoded = pos_index.logical_postings()
    a = {(r["doc_id"], r["term"]): (r["tf"], r["dl"], list(r["positions"]))
         for r in logical.collect()}
    b = {(r["doc_id"], r["term"]): (r["tf"], r["dl"], list(r["positions"]))
         for r in decoded.collect()}
    assert a == b
    assert pos_index.has_positions


def test_match_phrase_basic(pos_index):
    got = {r["doc_id"]: r["n_matches"]
           for r in match_phrase(pos_index, "quick brown",
                                 analyzer="simple_code").collect()}
    assert got == {0: 1, 1: 3, 7: 2}


def test_match_phrase_three_terms(pos_index):
    got = {r["doc_id"]: r["n_matches"]
           for r in match_phrase(pos_index, "quick brown fox",
                                 analyzer="simple_code").collect()}
    assert got == {0: 1, 7: 2}


def test_match_phrase_non_adjacent_rejected(pos_index):
    # docs 0 and 3 contain both "the" and "fox" but never adjacent;
    # doc 2 has "... and the fox is ..." — the only true phrase hit.
    # doc 1 has "brown quick" (reversed) — order matters.
    got = {r["doc_id"]: r["n_matches"] for r in
           match_phrase(pos_index, "the fox",
                        analyzer="simple_code").collect()}
    assert got == {2: 1}
    rev = {r["doc_id"] for r in
           match_phrase(pos_index, "brown quick",
                        analyzer="simple_code").collect()}
    assert rev == {1, 2}  # doc1 interior reversals + doc2 "brown quick"


def test_match_phrase_single_term(pos_index):
    got = {r["doc_id"]: r["n_matches"]
           for r in match_phrase(pos_index, "quick",
                                 analyzer="simple_code").collect()}
    assert got == {0: 1, 1: 3, 2: 1, 3: 1, 6: 1, 7: 2}


def test_match_phrase_absent_term(pos_index):
    assert match_phrase(pos_index, "quick zebra",
                        analyzer="simple_code").count() == 0


def test_term_vectors_carry_positions(docs):
    idx = build_logical_index(
        docs, "text", "simple_code", with_positions=True
    )
    tv = term_vectors(idx, doc_ids=[0]).collect()[0]
    by_term = {t["term"]: t for t in tv["terms"]}
    assert list(by_term["the"]["positions"]) == [0, 6]
    assert by_term["the"]["tf"] == 2


def test_non_positional_index_refuses_phrase(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("noposidx") / "idx")
    ix = build_physical_index(docs, out, text_col="text",
                              analyzer="simple_code")
    assert not ix.has_positions
    with pytest.raises(ValueError):
        match_phrase(ix, "quick brown", analyzer="simple_code")


# --- span_near (Lucene ordered SpanNearQuery semantics) ---------------------

import re as _re


def _toks(text):
    return _re.findall(r"[a-z0-9]+", text.lower())


def _span_near_spec(text, terms, slop):
    """Exhaustive spec: count start positions p0 of terms[0] for which
    strictly-increasing positions of the remaining terms exist with
    (last - p0) - (n-1) <= slop."""
    toks = _toks(text)
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not pos[t] for t in terms):
        return 0

    def ok_from(prev, rest):
        if not rest:
            return prev
        cands = [p for p in pos[rest[0]] if p > prev]
        best = None
        for c in cands:
            last = ok_from(c, rest[1:])
            if last is not None and (best is None or last < best):
                best = last
        return best

    n = 0
    for p0 in pos[terms[0]]:
        last = ok_from(p0, terms[1:])
        if last is not None and (last - p0) - (len(terms) - 1) <= slop:
            n += 1
    return n


@pytest.mark.parametrize("phrase,slop", [
    ("quick brown", 0),
    ("quick fox", 0),
    ("quick fox", 1),
    ("the fox", 2),
    ("the quick fox", 1),
    ("quick brown fox", 0),
    ("brown the", 3),
])
def test_span_near_matches_spec(pos_index, phrase, slop):
    from elasticsearch_nlp_classifier_spark.query import span_near

    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_near(pos_index, phrase, slop=slop,
                           analyzer="simple_code").collect()
    }
    terms = _toks(phrase)
    want = {
        did: _span_near_spec(text, terms, slop)
        for did, text in DOCS
        if _span_near_spec(text, terms, slop) > 0
    }
    assert got == want


def test_span_near_slop0_equals_match_phrase(pos_index):
    from elasticsearch_nlp_classifier_spark.query import span_near

    a = sorted(match_phrase(pos_index, "quick brown fox",
                            analyzer="simple_code").collect())
    b = sorted(span_near(pos_index, "quick brown fox", slop=0,
                         analyzer="simple_code").collect())
    assert a == b


def test_match_phrase_prefix_expands_last_token(pos_index):
    from elasticsearch_nlp_classifier_spark.query import match_phrase_prefix

    got = {
        r["doc_id"]: r["n_matches"]
        for r in match_phrase_prefix(
            pos_index, "quick br", analyzer="simple_code"
        ).collect()
    }
    # 'quick brown' adjacency: docs 0 (1x), 1 (3x), 7 (2x); doc 3 has
    # 'quick red' (no br* follows), doc 2 has 'brown quick' (wrong order)
    assert got == {0: 1, 1: 3, 7: 2}


def test_match_phrase_prefix_single_prefix_counts_positions(pos_index):
    from elasticsearch_nlp_classifier_spark.query import match_phrase_prefix

    got = {
        r["doc_id"]: r["n_matches"]
        for r in match_phrase_prefix(
            pos_index, "qui", analyzer="simple_code"
        ).collect()
    }
    # single-prefix phrase: n_matches = occurrences of any qui* term
    assert got[1] == 3 and got[6] == 1 and got[7] == 2
    assert 4 not in got


def test_match_phrase_prefix_missing_exact_slot_empty(pos_index):
    from elasticsearch_nlp_classifier_spark.query import match_phrase_prefix

    out = match_phrase_prefix(
        pos_index, "zzzabsent qui", analyzer="simple_code"
    )
    assert out.count() == 0
