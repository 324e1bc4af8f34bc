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


# --- rollover (ILM hot-phase primitive) --------------------------------------


def test_rollover_conditions_and_atomic_cutover(spark, docs):
    from elasticsearch_nlp_classifier_spark.index.rollover import (
        RolloverTarget,
        rollover,
    )

    mk = lambda d: build_logical_index(d, "text", "simple_code")  # noqa
    gen1_docs = docs.where("doc_id <= 3")      # 4 docs
    gen2_docs = docs.where("doc_id > 3")       # 2 docs

    reg = AliasRegistry()
    t = RolloverTarget("logs", reg)
    name1 = t.add_generation(mk(gen1_docs), created_ts=1000.0)
    assert name1 == "logs-000001"
    assert set(reg.aliases()) == {"logs", "logs-write"}

    # below every threshold -> no-op, but new_index is still projected
    r = rollover(t, {"max_docs": 10, "max_age_s": 3600}, lambda: None,
                 now_s=1500.0)
    assert r["rolled_over"] is False and r["new_index"] == "logs-000002"
    assert r["conditions"] == {"max_docs": False, "max_age_s": False}
    assert len(t.generations) == 1

    # dry_run never mutates even when a condition holds
    r = rollover(t, {"max_docs": 4}, lambda: mk(gen2_docs),
                 now_s=1500.0, dry_run=True)
    assert r["conditions"]["max_docs"] is True and not r["rolled_over"]
    assert len(t.generations) == 1

    # real rollover: doc-count condition met
    r = rollover(t, {"max_docs": 4}, lambda: mk(gen2_docs), now_s=2000.0)
    assert r == {
        "old_index": "logs-000001", "new_index": "logs-000002",
        "rolled_over": True, "dry_run": False,
        "conditions": {"max_docs": True},
    }
    # write alias -> newest generation only; read alias -> all docs
    w, _ = reg.resolve("logs-write")
    assert w.corpus_stats["doc_count"] == 2
    rd, _ = reg.resolve("logs")
    assert rd.corpus_stats["doc_count"] == 6
    # read alias search sees docs from both generations
    q = spark.createDataFrame(Q)
    hit_ids = {r_.doc_id for r_ in reg.search("logs", q, k=10).collect()}
    assert {0, 4} <= hit_ids and 1 in hit_ids

    # age-based rollover on the new generation
    r = rollover(t, {"max_age_s": 100}, lambda: mk(gen1_docs),
                 now_s=2500.0)
    assert r["rolled_over"] and r["new_index"] == "logs-000003"
    assert [g[0] for g in t.generations] == [
        "logs-000001", "logs-000002", "logs-000003"]


def test_rollover_requires_a_generation(spark):
    from elasticsearch_nlp_classifier_spark.index.rollover import (
        RolloverTarget,
        rollover,
    )

    t = RolloverTarget("empty", AliasRegistry())
    with pytest.raises(ValueError, match="no\\s+generations"):
        rollover(t, {}, lambda: None, now_s=0.0)
