"""P7 query-string compiler goldens (grammar: field:value, AND/OR/NOT,
phrases, prefix wildcard, parens, bare default-field terms)."""

import pytest

from elasticsearch_nlp_classifier_spark.functions import (
    QueryStringError,
    compile_query_string,
)


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "python", "the quick brown fox", "org1/repoA"),
            (2, "java", "lazy dogs sleep", "org1/repoB"),
            (3, "python", "quick quick slow", "org2/repoA"),
            (4, "go", "hello world", "org2/repoC"),
            (5, None, "null lang row", "org3/repoD"),
        ],
        "id int, lang string, content string, repo string",
    ).cache()


def ids(tbl, qs, default_field="content"):
    col = compile_query_string(qs, default_field)
    return sorted(r.id for r in tbl.where(col).select("id").collect())


def test_field_term(tbl):
    assert ids(tbl, "lang:python") == [1, 3]


def test_and_or_not(tbl):
    assert ids(tbl, "lang:python AND quick") == [1, 3]
    assert ids(tbl, "lang:java OR lang:go") == [2, 4]
    assert ids(tbl, "NOT lang:python") == [2, 4]  # null lang -> filtered
    assert ids(tbl, "lang:python quick") == [1, 3]  # implicit AND


def test_parens(tbl):
    assert ids(tbl, "(lang:java OR lang:go) AND NOT hello") == [2]


def test_phrase_and_prefix(tbl):
    assert ids(tbl, 'content:"hello world"') == [4]
    assert ids(tbl, "repo:org2*") == [3, 4]


def test_bare_term_contains(tbl):
    assert ids(tbl, "quick") == [1, 3]


def test_match_all_empty():
    from pyspark.sql import functions as F

    col = compile_query_string("")
    assert str(col) == str(F.lit(True))


def test_errors():
    with pytest.raises(QueryStringError):
        compile_query_string("(unclosed AND x")
    with pytest.raises(QueryStringError):
        compile_query_string("a ) b")


# --- analyzed text-field mode (ES text-mapping semantics; reference
# termQuery("text","disaster") matches the analyzed token:
# ScanAndScrollIteratorTest.java:20, ElasticsearchDataset.java:42) ----

def aids(tbl, qs):
    col = compile_query_string(
        qs, default_field="content", text_fields={"content"},
        analyzer="simple_code",
    )
    return sorted(r.id for r in tbl.where(col).select("id").collect())


def test_analyzed_term_matches_token_not_whole_string(tbl):
    # plain mode: content:quick is equality -> no doc equals "quick"
    assert ids(tbl, "content:quick") == []
    # analyzed mode: token membership
    assert aids(tbl, "content:quick") == [1, 3]
    # case folding through the analyzer
    assert aids(tbl, "content:QUICK") == [1, 3]


def test_analyzed_phrase_is_token_run(tbl):
    assert aids(tbl, 'content:"quick brown fox"') == [1]
    assert aids(tbl, 'content:"brown quick"') == []  # order matters
    assert aids(tbl, 'content:"quick quick"') == [3]


def test_analyzed_prefix_and_multitoken_or(tbl):
    assert aids(tbl, "content:qui*") == [1, 3]
    # multi-token value ORs its tokens (ES default_operator)
    assert aids(tbl, "content:hello+sleep") == [2, 4]


def test_analyzed_mixed_with_keyword_fields(tbl):
    assert aids(tbl, "lang:python AND content:quick") == [1, 3]
    assert aids(tbl, "NOT content:quick AND repo:org1*") == [2]


def test_range_queries(tbl):
    assert ids(tbl, "id:[2 TO 4]") == [2, 3, 4]
    assert ids(tbl, "id:{2 TO 4}") == [3]
    assert ids(tbl, "id:[2 TO 4}") == [2, 3]
    assert ids(tbl, "id:[4 TO *]") == [4, 5]
    assert ids(tbl, "id:[* TO *]") == [1, 2, 3, 4, 5]
    # lexicographic range on a string field ('go' < 'java' -> excluded)
    assert ids(tbl, "lang:[java TO python]") == [1, 2, 3]


def test_range_composes(tbl):
    assert ids(tbl, "id:[2 TO 4] AND lang:python") == [3]
    assert ids(tbl, "NOT id:[2 TO 5]") == [1]


def test_require_prohibit_operators(tbl):
    assert ids(tbl, "+lang:python") == [1, 3]
    assert ids(tbl, "-lang:python") == [2, 4]   # Lucene prohibit = NOT
    assert ids(tbl, "quick -lang:java") == [1, 3]
    assert ids(tbl, "+quick +slow") == [3]


def test_fuzzy_value(tbl):
    # 'jav' ~1 'java'; 'pithon' ~1 'python'
    assert ids(tbl, "lang:jav~1") == [2]
    assert ids(tbl, "lang:pithon~1") == [1, 3]
    assert ids(tbl, "lang:pithon~") == [1, 3]   # bare ~ defaults to 2


def test_boost_is_parsed_and_ignored_in_filter(tbl):
    assert ids(tbl, "lang:python^2") == [1, 3]
    assert ids(tbl, "lang:python^2 OR lang:go^0.5") == [1, 3, 4]


def test_analyzed_fuzzy(tbl):
    col = compile_query_string(
        "content:quik~1", text_fields={"content"}, analyzer="simple_code"
    )
    assert sorted(r.id for r in tbl.where(col).select("id").collect()) \
        == [1, 3]


# ---------------------------------------------------------------------------
# simple_query_string — the lenient end-user grammar
# ---------------------------------------------------------------------------

from elasticsearch_nlp_classifier_spark.functions import (  # noqa: E402
    compile_simple_query_string,
)


def sids(tbl, qs, **kw):
    kw.setdefault("fields", ["content"])
    kw.setdefault("text_fields", {"content"})
    col = compile_simple_query_string(qs, **kw)
    return sorted(r.id for r in tbl.where(col).select("id").collect())


def test_sqs_default_or(tbl):
    # whitespace = OR by default (ES default_operator=OR)
    assert sids(tbl, "quick hello") == [1, 3, 4]


def test_sqs_default_and(tbl):
    assert sids(tbl, "quick fox", default_operator="and") == [1]


def test_sqs_plus_is_and_pipe_is_or(tbl):
    assert sids(tbl, "quick + fox") == [1]
    assert sids(tbl, "fox | world") == [1, 4]
    # + binds tighter than |
    assert sids(tbl, "fox + quick | world") == [1, 4]


def test_sqs_negation_and_parens(tbl):
    assert sids(tbl, "quick + -fox") == [3]
    assert sids(tbl, "(fox | dogs) + -lazy") == [1]


def test_sqs_phrase_prefix_fuzzy(tbl):
    assert sids(tbl, '"quick brown"') == [1]
    assert sids(tbl, "qui*") == [1, 3]
    assert sids(tbl, "quik~1") == [1, 3]


def test_sqs_phrase_slop(tbl):
    # "quick fox"~0: not adjacent in doc 1 ("quick brown fox") -> no hit
    assert sids(tbl, '"quick fox"') == []
    assert sids(tbl, '"quick fox"~0') == []
    assert sids(tbl, '"quick fox"~1') == [1]
    # anchored greedy must consider the second anchor in doc 3
    # ("quick quick slow"): "quick slow"~0 matches at anchor 2
    assert sids(tbl, '"quick slow"~0') == [3]


def test_sqs_negated_phrase(tbl):
    assert sids(tbl, 'quick + -"quick brown"') == [3]


def test_sqs_multi_field(tbl):
    got = sids(
        tbl, "python | world",
        fields=["lang", "content"], text_fields={"content"},
    )
    assert got == [1, 3, 4]


def test_sqs_never_raises_on_garbage(tbl):
    # unbalanced parens / quotes / stray operators: degrade, don't raise
    assert sids(tbl, ")(((") == [1, 2, 3, 4, 5]  # nothing usable -> match all
    assert sids(tbl, 'fox AND') == [1]  # AND is just a term here (no match) OR'd
    assert sids(tbl, '"unterminated fox') == []  # phrase to EOF
    assert sids(tbl, "| | fox") == [1]
    assert sids(tbl, "quick )") == [1, 3]


def test_sqs_empty_is_match_all(tbl):
    assert sids(tbl, "") == [1, 2, 3, 4, 5]
    assert sids(tbl, "   ") == [1, 2, 3, 4, 5]


def test_wrapper_query_decodes_and_compiles(tbl):
    import base64

    from elasticsearch_nlp_classifier_spark.functions import (
        compile_wrapper_query,
    )

    b64 = base64.b64encode(b"lang:python AND quick").decode()
    col = compile_wrapper_query(b64, "content")
    assert sorted(r.id for r in tbl.where(col).collect()) == [1, 3]
