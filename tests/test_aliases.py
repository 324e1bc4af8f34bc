"""ES index aliases: union resolution, filtered-alias scoring (filter
is query context — idf/avgdl stay global), atomic _aliases cutover."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.index.aliases import AliasRegistry
from elasticsearch_nlp_classifier_spark.query.bm25 import bm25_topk

DOCS = [
    (0, "spark index engine", "en"),
    (1, "spark queries fast", "en"),
    (2, "engine spark internals", "de"),
    (3, "index layout notes", "de"),
    (4, "spark spark spark", "en"),
    (5, "unrelated prose here", "fr"),
]

Q = pd.DataFrame({"query_id": [0], "query_text": ["spark index"]})


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id bigint, text string, lang string"
    ).cache()


@pytest.fixture(scope="module")
def halves(spark, docs):
    d1 = docs.where("doc_id % 2 = 0")
    d2 = docs.where("doc_id % 2 = 1")
    mk = lambda d: build_logical_index(d, "text", "simple_code")  # noqa
    return mk(d1), mk(d2)


def _rows(df):
    return [(r.doc_id, round(r.score, 9)) for r in df.collect()]


def test_alias_union_equals_single_index(spark, docs, halves):
    ix1, ix2 = halves
    reg = AliasRegistry()
    reg.put_alias("all", [ix1, ix2])
    q = spark.createDataFrame(Q)
    got = _rows(reg.search("all", q, k=10))
    whole = build_logical_index(docs, "text", "simple_code")
    want = _rows(bm25_topk(whole, q, k=10, analyzer="simple_code"))
    assert got == want


def test_filtered_alias_keeps_global_stats(spark, docs, halves):
    ix1, ix2 = halves
    reg = AliasRegistry()
    allowed = docs.where("lang = 'en'").select("doc_id")
    reg.put_alias("en_only", [ix1, ix2], doc_filter=allowed)
    q = spark.createDataFrame(Q)
    got = dict(_rows(reg.search("en_only", q, k=10)))
    whole = build_logical_index(docs, "text", "simple_code")
    full = dict(_rows(bm25_topk(whole, q, k=10, analyzer="simple_code")))
    en_ids = {0, 1, 4}
    assert set(got) == {d for d in full if d in en_ids}
    for d, s in got.items():
        # per-doc score identical to the UNfiltered index's score:
        # the filter must not perturb idf/avgdl
        assert s == pytest.approx(full[d])


def test_update_aliases_is_atomic(halves):
    ix1, ix2 = halves
    reg = AliasRegistry()
    reg.put_alias("a", [ix1])
    with pytest.raises(KeyError):
        reg.update_aliases([
            {"add": {"alias": "b", "indexes": [ix2]}},
            {"remove": {"alias": "nope"}},  # fails -> NOTHING applies
        ])
    assert reg.aliases() == ["a"]  # "b" was not half-applied
    with pytest.raises(ValueError):
        reg.update_aliases([{"add": {"alias": "c", "indexes": []}}])
    with pytest.raises(ValueError):
        reg.update_aliases([{"frobnicate": {"alias": "a"}}])


def test_alias_cutover_swaps_atomically(spark, halves):
    ix1, ix2 = halves
    reg = AliasRegistry()
    reg.put_alias("live", [ix1])
    q = spark.createDataFrame(Q)
    before = {d for d, _ in _rows(reg.search("live", q, k=10))}
    assert before <= {0, 2, 4}
    # reindex cutover: repoint in ONE action list
    reg.update_aliases([
        {"remove": {"alias": "live"}},
        {"add": {"alias": "live", "indexes": [ix2]}},
    ])
    after = {d for d, _ in _rows(reg.search("live", q, k=10))}
    assert after <= {1, 3, 5}
    assert reg.aliases() == ["live"]
