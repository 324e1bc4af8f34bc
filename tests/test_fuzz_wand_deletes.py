"""Property-fuzz block-max WAND exactness under accumulating tombstone
epochs, vs an independent pure-Python BM25 evaluator.

`test_deletes_fuzzy.py` pins ONE delete set against the engine's own
brute path; here the mirror is NOT the engine (Lucene-BM25 formula
re-implemented over plain dicts from the module docstring,
`query/bm25.py:8-12`), deletes accumulate over three epochs, and every
epoch checks a fresh batch of random multi-term queries rank- and
score-identically (k=10, score desc / doc_id asc tie-break,
`query/wand.py:313-314`).  Corpus stats deliberately keep counting
tombstoned docs (Lucene pre-compaction semantics) — the mirror
freezes N/df/dl/avgdl over the FULL corpus and only restricts the
candidate set, so a WAND implementation that re-derived stats from
live docs, or pruned with a stale θ against masked tombstones, would
mismatch."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from elasticsearch_nlp_classifier_spark.analyzer import get_analyzer
from elasticsearch_nlp_classifier_spark.index.blocks import (
    PhysicalIndex,
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.index.deletes import delete_docs
from elasticsearch_nlp_classifier_spark.query.wand import wand_topk

N_DOCS = 1500
K1, B = 1.2, 0.75
VOCAB = ([f"w{i}" for i in range(40)]
         + ["import", "def", "return", "spark", "index", "query"])


def _mk_corpus(rng):
    rows = []
    for i in range(N_DOCS):
        n = rng.randint(3, 30)
        # zipf-ish skew so some terms are hot (exercises salted terms)
        words = [VOCAB[min(int(rng.expovariate(0.12)), len(VOCAB) - 1)]
                 for _ in range(n)]
        rows.append((i, " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    rng = random.Random(20260825)
    rows = _mk_corpus(rng)
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path_factory.mktemp("wandfuzz") / "idx")
    build_physical_index(docs, path, text_col="text",
                         analyzer="simple_code", block_size=16)
    index = PhysicalIndex(path, spark)

    # independent mirror state from the same tokenization (analyzer
    # parity is pinned elsewhere; the SCORING here is re-derived from
    # the documented formula, not the engine)
    tok = get_analyzer("simple_code").tokenize
    tf = {}
    dl = {}
    for doc_id, text in rows:
        terms = tok(text)
        dl[doc_id] = len(terms)
        m = {}
        for t in terms:
            m[t] = m.get(t, 0) + 1
        tf[doc_id] = m
    df = {}
    for m in tf.values():
        for t in m:
            df[t] = df.get(t, 0) + 1
    n = sum(1 for v in dl.values() if v > 0)
    avgdl = sum(dl.values()) / n
    return index, rng, tf, df, dl, n, avgdl


def _mirror_topk(query, live, tf, df, dl, n, avgdl, k=10):
    qterms = sorted(set(
        get_analyzer("simple_code").tokenize(query)))  # dups count once
    scores = {}
    for d in live:
        s = 0.0
        hit = False
        for t in qterms:
            f = tf[d].get(t)
            if not f or t not in df:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f / (f + K1 * (1 - B + B * dl[d] / avgdl))
        if hit:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]


def _rand_query(rng):
    n = rng.randint(1, 4)
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def test_fuzz_wand_exact_across_delete_epochs(spark, env):
    index, rng, tf, df, dl, n, avgdl = env
    live = set(range(N_DOCS))
    mismatches = []
    for epoch in range(4):
        if epoch:
            dead = rng.sample(sorted(live), 120)
            delete_docs(index, dead)
            live -= set(dead)
        queries = [(qi, _rand_query(rng)) for qi in range(12)]
        qpdf = spark.createDataFrame(queries,
                                     "query_id int, query_text string")
        got = wand_topk(index, qpdf, k=10,
                        analyzer="simple_code").collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(
                (r.rank, r.doc_id, r.score))
        for qi, qtext in queries:
            want = _mirror_topk(qtext, live, tf, df, dl, n, avgdl)
            have = sorted(by_q.get(qi, []))
            if len(have) != len(want) or any(
                hr != wr or hd != wd or abs(hs - ws) > 1e-9
                for (hr, hd, hs), (wr, wd, ws) in zip(have, want)
            ):
                mismatches.append((epoch, qtext, have[:3], want[:3]))
    assert not mismatches, (
        f"{len(mismatches)} query/epoch mismatches; first: "
        f"{mismatches[0]}")


def test_fuzz_pit_wand_sees_frozen_epochs(spark, env):
    """pit_search through snapshots taken between the epochs above:
    results must equal the mirror restricted to that snapshot's live
    set, not the current one."""
    from elasticsearch_nlp_classifier_spark.index.deletes import (
        deleted_array,
    )
    from elasticsearch_nlp_classifier_spark.index.pit import (
        open_pit,
        pit_search,
    )

    index, rng, tf, df, dl, n, avgdl = env
    # fresh deletes on top of whatever the first test left behind
    pit_before = open_pit(index)
    live_before = set(range(N_DOCS)) - {
        int(x) for x in deleted_array(index)}
    extra = rng.sample(sorted(live_before), 100)
    delete_docs(index, extra)

    q = "import spark w1"
    got = [(r.rank, r.doc_id, r.score)
           for r in pit_search(pit_before, q, k=10,
                               analyzer="simple_code").collect()]
    want = _mirror_topk(q, live_before, tf, df, dl, n, avgdl)
    assert [(d) for _, d, _ in got] == [d for _, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
    # current (non-PIT) search must exclude the new epoch too
    got_now = {r.doc_id
               for r in wand_topk(
                   index,
                   spark.createDataFrame([(0, q)],
                                         "query_id int, query_text string"),
                   k=10, analyzer="simple_code").collect()}
    assert not (got_now & set(extra))
