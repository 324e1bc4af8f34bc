"""Char-offset tracking: the term-vector ``offsets`` flag
(`TermVectorQuery.java:60-76`, golden span shape
`TermVectorTokensTest.java:16-55`) and the OpenNLP ``tokenizePos``
interface parity (`ATokenizer.java:55-71`, golden
`TabTokenizerTest.java`)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.analyzer.chain import (
    ANALYZERS,
    Analyzer,
    get_analyzer,
)
from elasticsearch_nlp_classifier_spark.index.build import (
    build_logical_index,
    term_vectors,
)
from elasticsearch_nlp_classifier_spark.query.highlight import (
    highlight_from_offsets,
)

TEXTS = [
    "def tokenize(text): return text.split()",
    "The spark engine builds fast indexes!!",
    "#hashtag @handle https://x.co/page plain words",
    "Pen\tPineapple\tApple\tPen",
    "",
    "MiXeD CaSe Identifiers_42 and numbers 123 456",
]


@pytest.mark.parametrize("name", sorted(ANALYZERS))
def test_offsets_token_sequence_matches_tokenize(name):
    an = get_analyzer(name)
    for text in TEXTS:
        toks = an.tokenize(text)
        triples = an.tokenize_with_offsets(text)
        assert [t for t, _, _ in triples] == toks, (name, text)


@pytest.mark.parametrize("name", sorted(ANALYZERS))
def test_offsets_spans_are_sane(name):
    an = get_analyzer(name)
    for text in TEXTS:
        for t, s, e in an.tokenize_with_offsets(text):
            assert 0 <= s <= e <= len(text), (name, text, t, s, e)


def test_split_stage_spans_slice_original_text():
    # split-only chains (no lowercase/stop/stem): the span IS the token
    for split in ("simple", "code", "tab", "twitter"):
        an = Analyzer(split=split, use_lowercase=False,
                      use_stopwords=False, use_stemming=False)
        for text in TEXTS:
            for t, s, e in an.tokenize_with_offsets(text):
                assert text[s:e] == t, (split, text)
    # simple_code lowers: the span is the token up to case
    an = get_analyzer("simple_code")
    for text in TEXTS:
        for t, s, e in an.tokenize_with_offsets(text):
            assert text[s:e].lower() == t


def test_stemmed_token_keeps_surface_span():
    an = Analyzer(split="simple")  # lowercase+stopwords+stem
    text = "Earthquakes shaking buildings"
    triples = an.tokenize_with_offsets(text)
    assert triples[0][0] == "earthquak"           # stemmed token
    s, e = triples[0][1], triples[0][2]
    assert text[s:e] == "Earthquakes"             # original surface span


def test_clean_twitter_hash_strip_advances_start():
    an = Analyzer(split="twitter", use_clean_twitter=True,
                  use_stopwords=False, use_stemming=False)
    text = "#Fire at @place http://x.co now"
    triples = an.tokenize_with_offsets(text)
    toks = [t for t, _, _ in triples]
    assert toks == an.tokenize(text)
    t0, s0, e0 = triples[0]
    assert t0 == "fire" and text[s0:e0] == "Fire"  # '#' stripped, span +1


def test_shingle_and_edge_ngram_offsets():
    an = get_analyzer("simple_code_shingle2")
    text = "alpha beta gamma"
    triples = an.tokenize_with_offsets(text)
    assert [t for t, _, _ in triples] == ["alpha beta", "beta gamma"]
    assert triples[0][1:] == (0, 10)   # first constituent start..last end
    assert triples[1][1:] == (6, 16)

    an = get_analyzer("simple_code_edge")
    triples = an.tokenize_with_offsets("beta")
    # every gram keeps the SOURCE token's span (Lucene EdgeNGramFilter)
    assert all((s, e) == (0, 4) for _, s, e in triples)
    assert [t for t, _, _ in triples] == ["b", "be", "bet", "beta"]


def test_tokenize_pos_tab_golden():
    """`TabTokenizerTest.java` tokenizePos golden."""
    an = get_analyzer("tab")
    spans = an.tokenize_pos("Pen\tPineapple\tApple\tPen")
    assert spans == [(0, 3), (4, 13), (14, 19), (20, 23)]


def test_tokenize_pos_degenerate_span_on_transformed_token():
    """ATokenizer.tokenizePos searches the FINAL token verbatim and
    emits the degenerate (pos+1, pos+1) span on a miss — reference
    parity, quirks included (`ATokenizer.java:55-71`)."""
    an = Analyzer(split="simple", use_stopwords=False, use_stemming=False)
    spans = an.tokenize_pos("Spark rocks")
    # "spark" (lowered) is not found verbatim in "Spark rocks"
    assert spans[0] == (1, 1)
    assert spans[1] == (6, 11)  # "rocks" found verbatim


def test_term_vectors_offsets_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")],
        "doc_id bigint, text string",
    )
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code", with_offsets=True)
    tv = {r["doc_id"]: r["terms"]
          for r in term_vectors(idx).collect()}
    alpha = next(t for t in tv[1] if t["term"] == "alpha")
    assert alpha["tf"] == 2
    assert list(alpha["positions"]) == [0, 2]
    assert list(alpha["start_offsets"]) == [0, 11]
    assert list(alpha["end_offsets"]) == [5, 16]
    beta2 = next(t for t in tv[2] if t["term"] == "beta")
    assert (list(beta2["start_offsets"]),
            list(beta2["end_offsets"])) == ([0], [4])


@pytest.mark.parametrize("ts", [False, True])
@pytest.mark.parametrize("pos", [False, True])
@pytest.mark.parametrize("off", [False, True])
@pytest.mark.parametrize("pay", [False, True])
def test_term_vector_flag_combinations(spark, ts, pos, off, pay):
    """All 2⁴ flag combinations of the term-vector request — the
    reference's own test matrix (`TermVectorQueryTest.java:70-95`).
    ``payloads`` is observably inert (no payloads indexed — ES omits
    the field then too)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id bigint, text string"
    )
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code", with_offsets=True)
    tv = term_vectors(idx, term_statistics=ts, positions=pos,
                      offsets=off, payloads=pay)
    row = tv.collect()[0]["terms"]
    got_fields = set(row[0].asDict())
    want = {"term", "tf"}
    if ts:
        want |= {"df", "ttf"}
    if pos:
        want |= {"positions"}
    if off:
        want |= {"start_offsets", "end_offsets"}
    assert got_fields == want
    alpha = next(t for t in row if t["term"] == "alpha")
    assert alpha["tf"] == 2
    if ts:
        assert alpha["df"] == 1 and alpha["ttf"] == 2
    if pos:
        assert list(alpha["positions"]) == [0, 2]
    if off:
        assert list(alpha["start_offsets"]) == [0, 11]


def test_term_vector_flags_raise_without_payload(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id bigint, text string"
    )
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code")  # no payloads
    with pytest.raises(ValueError, match="positions=True"):
        term_vectors(idx, positions=True)
    with pytest.raises(ValueError, match="offsets=True"):
        term_vectors(idx, offsets=True)


def test_physical_offsets_payload_roundtrip(spark, tmp_path):
    """off_vb/len_vb in the compressed block layout: full decode of a
    with_offsets physical index reproduces the logical postings'
    per-occurrence (position, start, end) exactly (the integrity bar
    every other payload meets)."""
    import pandas as pd

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta alpha gamma{i % 3} beta alpha") for i in
         range(40)],
        "doc_id bigint, text string",
    )
    idx = build_physical_index(
        docs, str(tmp_path / "offidx"), text_col="text",
        analyzer="simple_code", block_size=4, with_offsets=True,
    )
    assert idx.has_offsets and idx.has_positions
    dec = idx.logical_postings().toPandas()
    logical = build_logical_index(
        docs, text_col="text", analyzer="simple_code",
        with_offsets=True,
    ).postings.toPandas()

    def canon(pdf):
        pdf = pdf.copy()
        for c in ("positions", "start_offsets", "end_offsets"):
            pdf[c] = pdf[c].map(lambda a: tuple(int(x) for x in a))
        return pdf.sort_values(["doc_id", "term"]).reset_index(drop=True)

    d, w = canon(dec), canon(logical)
    pd.testing.assert_frame_equal(
        d[["doc_id", "term", "tf", "positions", "start_offsets",
           "end_offsets"]],
        w[["doc_id", "term", "tf", "positions", "start_offsets",
           "end_offsets"]],
        check_dtype=False,
    )
    # manifests account for the two extra payload columns
    import json as _json
    import os as _os

    total = 0
    for mf in _os.listdir(f"{idx.path}/manifests"):
        with open(f"{idx.path}/manifests/{mf}") as f:
            total += _json.load(f)["payload_bytes"]
    assert total > 0


def test_highlight_from_offsets(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha beta ALPHA end"), (2, "nothing to see")],
        "doc_id bigint, text string",
    )
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code", with_offsets=True)
    hits = docs.select("doc_id", "text")
    out = {r["doc_id"]: r["highlight"]
           for r in highlight_from_offsets(
               idx, hits, "alpha", text_col="text",
               analyzer="simple_code").collect()}
    # stored offsets mark the ORIGINAL surface forms, any case
    assert out[1] == "<em>Alpha</em> beta <em>ALPHA</em> end"
    assert out[2] is None