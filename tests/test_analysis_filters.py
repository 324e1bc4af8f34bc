"""ES analysis token filters (shingle / edge_ngram / ngram /
asciifolding) — JVM Column vs plain-Python twin parity — and the
search_as_you_type query over shingle subfields."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.analyzer.chain import get_analyzer
from elasticsearch_nlp_classifier_spark.analyzer.filters import (
    ascii_fold_col,
    ascii_fold_str,
    edge_ngram_list,
    edge_ngram_tokens_col,
    ngram_list,
    ngram_tokens_col,
    shingle_list,
    shingle_tokens_col,
)
from elasticsearch_nlp_classifier_spark.analyzer.spark_udfs import analyze

TOK_ROWS = [
    (0, ["the", "quick", "brown", "fox"]),
    (1, ["a"]),
    (2, []),
    (3, ["xx", "yy"]),
    (4, ["longidentifier", "b2", "c"]),
]


@pytest.fixture(scope="module")
def toks_df(spark):
    return spark.createDataFrame(
        TOK_ROWS, "id int, toks array<string>"
    ).cache()


@pytest.mark.parametrize("n", [2, 3])
def test_shingle_col_matches_python(toks_df, n):
    got = {r.id: r.out for r in toks_df.select(
        "id", shingle_tokens_col(F.col("toks"), n).alias("out")).collect()}
    for i, toks in TOK_ROWS:
        assert got[i] == shingle_list(toks, n), (i, n)


@pytest.mark.parametrize("mn,mx", [(1, 10), (2, 3), (3, 4)])
def test_edge_ngram_col_matches_python(toks_df, mn, mx):
    got = {r.id: r.out for r in toks_df.select(
        "id", edge_ngram_tokens_col(F.col("toks"), mn, mx).alias("out")
    ).collect()}
    for i, toks in TOK_ROWS:
        assert got[i] == edge_ngram_list(toks, mn, mx), (i, mn, mx)


@pytest.mark.parametrize("mn,mx", [(2, 3), (1, 2), (3, 3)])
def test_ngram_col_matches_python(toks_df, mn, mx):
    got = {r.id: r.out for r in toks_df.select(
        "id", ngram_tokens_col(F.col("toks"), mn, mx).alias("out")
    ).collect()}
    for i, toks in TOK_ROWS:
        assert sorted(got[i]) == sorted(ngram_list(toks, mn, mx)), (i, mn, mx)


def test_ascii_fold_col_matches_python(spark):
    rows = [(0, "café Über señor"), (1, "naïve Łukasz"), (2, "plain"),
            (3, "ÀÉÎÕÜ")]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {r.id: r.out for r in df.select(
        "id", ascii_fold_col(F.col("s")).alias("out")).collect()}
    for i, s in rows:
        assert got[i] == ascii_fold_str(s)
    assert ascii_fold_str("café") == "cafe"
    assert ascii_fold_str("señor") == "senor"


def test_shingle_analyzer_jvm_python_parity(spark):
    texts = [
        "Data value TABLE scan", "one", "", "a b c d e",
        "hash-join merge_sort 42 rows",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    for name in ("simple_code_shingle2", "simple_code_shingle3",
                 "simple_code_edge"):
        a = get_analyzer(name)
        got = {r.id: r.out for r in df.select(
            "id", analyze("text", name).alias("out")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == a.tokenize(t), (name, t)


def test_search_as_you_type_prefers_in_order(spark, tmp_path):
    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        match_bool_prefix_topk,
        search_as_you_type_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "data value table scan"),       # in-order "data value"
            (1, "value data table scan"),       # same tokens, scrambled
            (2, "data vacuum"),                 # prefix-only match
            (3, "unrelated words entirely"),
        ],
        "doc_id bigint, text string",
    )
    base = build_physical_index(
        docs, str(tmp_path / "b"), text_col="text",
        analyzer="simple_code", block_size=4,
    )
    sh2 = build_physical_index(
        docs, str(tmp_path / "s2"), text_col="text",
        analyzer="simple_code_shingle2", block_size=4,
    )
    got = [
        (r.doc_id, r.rank)
        for r in search_as_you_type_topk(
            base, sh2, "data val", k=4, analyzer="simple_code",
        ).collect()
    ]
    ids = [d for d, _ in got]
    # doc 0 must outrank doc 1: only it prefix-matches the trailing
    # 2-gram shingle "data val*"
    assert ids.index(0) < ids.index(1)
    assert 3 not in ids

    # compositional exactness: equals base + shingle bool_prefix scores
    b = {r.doc_id: r.score for r in match_bool_prefix_topk(
        base, "data val", k=100, analyzer="simple_code").collect()}
    s = {r.doc_id: r.score for r in match_bool_prefix_topk(
        sh2, "data val", k=100,
        analyzer="simple_code_shingle2").collect()}
    want = {d: b.get(d, 0.0) + s.get(d, 0.0) for d in set(b) | set(s)}
    got_scores = {
        r.doc_id: r.score
        for r in search_as_you_type_topk(
            base, sh2, "data val", k=4, analyzer="simple_code",
        ).collect()
    }
    for d, sc in got_scores.items():
        assert sc == pytest.approx(want[d]), d
