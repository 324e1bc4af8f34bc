"""significant_terms alternative heuristics (chi_square /
mutual_information / gnd / percentage) vs a plain-Python twin of the
documented contingency-table formulas."""

import math
from collections import Counter

import pytest

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import significant_terms

# foreground = "incident" docs; 'fire'/'flood' should be significant
DOCS = [
    (1, 1, "fire fire flood evacuation downtown"),
    (2, 1, "flood warning river fire rescue"),
    (3, 1, "fire damage insurance claim flood"),
    (4, 1, "earthquake fire drill flood zone"),
    (5, 0, "sunny picnic park weekend music"),
    (6, 0, "music festival park crowd sunny"),
    (7, 0, "market prices grocery weekend deals"),
    (8, 0, "football match weekend score park"),
    (9, 0, "fire station open day tour"),
    (10, 0, "library quiet study weekend"),
]


@pytest.fixture(scope="module")
def parts(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, is_incident int, content string"
    )
    idx = build_logical_index(df, analyzer="simple_code")
    fg = df.where("is_incident = 1").select("doc_id")
    return idx, fg


def _twin(heuristic, min_doc_count=2, size=10):
    toks = {d: set(c.split()) for d, f, c in DOCS}
    fg_ids = {d for d, f, _ in DOCS if f}
    nf, nd = float(len(fg_ids)), float(len(DOCS))
    fg_df = Counter(t for d in fg_ids for t in toks[d])
    bg_df = Counter(t for d in toks for t in toks[d])
    out = []
    for t, f in fg_df.items():
        if f < min_doc_count:
            continue
        b = bg_df[t]
        fg_rate, bg_rate = f / nf, b / nd
        positive = fg_rate > bg_rate
        n11, n01, n10 = float(f), float(b - f), nf - f
        n00 = (nd - nf) - (b - f)
        if heuristic == "chi_square":
            den = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
            s = (nd * (n11 * n00 - n01 * n10) ** 2 / den
                 if positive and den > 0 else 0.0)
        elif heuristic == "mutual_information":
            def mi_term(nxy, row, col):
                return (nxy / nd) * math.log2(nxy * nd / (row * col)) \
                    if nxy > 0 else 0.0
            s = (mi_term(n11, n11 + n10, n11 + n01)
                 + mi_term(n01, n01 + n00, n11 + n01)
                 + mi_term(n10, n11 + n10, n10 + n00)
                 + mi_term(n00, n01 + n00, n10 + n00))
            s = s if positive else 0.0
        elif heuristic == "gnd":
            den = math.log(nd) - min(math.log(b), math.log(nf))
            s = math.exp(-(max(math.log(b), math.log(nf))
                           - math.log(f)) / den) if den > 0 else 0.0
        elif heuristic == "percentage":
            s = f / b
        else:
            raise AssertionError(heuristic)
        s = round(s, 6)
        if s > 0:
            out.append((t, f, b, s))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:size]


@pytest.mark.parametrize("heuristic", ["chi_square", "mutual_information",
                                       "gnd", "percentage"])
def test_heuristic_matches_twin(spark, parts, heuristic):
    idx, fg = parts
    got = [
        (r.term, r.fg_df, r.bg_df, r.score)
        for r in significant_terms(
            fg, idx.postings, size=10, heuristic=heuristic
        ).collect()
    ]
    assert got == _twin(heuristic)


def test_chi_square_ranks_incident_terms_first(spark, parts):
    idx, fg = parts
    top = [r.term for r in significant_terms(
        fg, idx.postings, size=3, heuristic="chi_square").collect()]
    assert "flood" in top  # in every fg doc, no bg doc


def test_unknown_heuristic_rejected(spark, parts):
    idx, fg = parts
    with pytest.raises(ValueError, match="heuristic"):
        significant_terms(fg, idx.postings, heuristic="tfidf").collect()
