"""Bigram-LM perplexity scoring, BPE training/encoding, RRF hybrid
fusion, and terms-agg sub-aggregations."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
    word_histogram,
)
from elasticsearch_nlp_classifier_spark.operators.lm import (
    bigram_counts,
    bigram_logprob,
    perplexity_filter,
)
from elasticsearch_nlp_classifier_spark.query.rrf import (
    hybrid_search_topk,
    rrf_fuse,
)

# ------------------------------------------------------------ bigram LM

LM_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the cat"),
    (3, "zx qq vv zz yy"),          # gibberish: no repeated transitions
    (4, "the"),                      # too short: no transitions
]


def _brute_logprob(texts, alpha=0.5):
    """Plain-python twin of bigram_logprob (self-trained)."""
    toks = {i: t.lower().split() for i, t in texts}
    uni, bi = {}, {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, ws in toks.items():
        trans = list(zip(ws, ws[1:]))
        if not trans:
            continue
        lps = [
            math.log((bi.get(p, 0) + alpha) / (uni[p[0]] + alpha * v))
            for p in trans
        ]
        out[i] = sum(lps) / len(lps)
    return out


def test_bigram_logprob_matches_brute(spark):
    docs = spark.createDataFrame(LM_DOCS, "doc_id bigint, text string")
    got = {r.id: (r.n_transitions, r.avg_logp, r.ppl)
           for r in bigram_logprob(docs).collect()}
    want = _brute_logprob(LM_DOCS)
    assert set(got) == set(want)            # doc 4 (no transitions) absent
    for i, lp in want.items():
        n, alp, ppl = got[i]
        assert alp == pytest.approx(lp, rel=1e-12)
        assert ppl == pytest.approx(math.exp(-lp), rel=1e-12)
    # natural repetition scores better than gibberish
    assert got[2][1] > got[3][1]

    uni, bi = bigram_counts(docs)
    assert dict(bi.where("t1 = 'the' and t2 = 'cat'").collect()[0].asDict())[
        "c"] == 3


def test_perplexity_filter(spark):
    docs = spark.createDataFrame(LM_DOCS, "doc_id bigint, text string")
    lp = {r.id: r.ppl for r in bigram_logprob(docs).collect()}
    cut = sorted(lp.values())[1]  # keep the 2 best-scoring docs
    kept = perplexity_filter(docs, max_ppl=cut).toPandas()
    assert sorted(kept.doc_id) == sorted(
        [i for i, p in lp.items() if p <= cut])


# ------------------------------------------------------------------ BPE

def test_train_bpe_published_example():
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(hist, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", END)]
    assert encode_word("lowest", {p: i for i, p in enumerate(merges)}) == [
        "l", "o", "w", "est" + END
    ]
    # unseen characters survive as singletons
    assert encode_word("??", {p: i for i, p in enumerate(merges)}) == [
        "?", "?", END
    ]


def test_bpe_encode_spark(spark):
    texts = [
        (1, "low lower newest"),
        (2, "newest newest widest low"),
    ]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    hist = [(r.word, r.c) for r in word_histogram(docs).collect()]
    # histogram matches a plain Counter
    from collections import Counter

    want_hist = Counter(w for _, t in texts for w in t.split())
    assert dict(hist) == dict(want_hist)

    merges = train_bpe(hist, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()}
    for i, t in texts:
        want = [tok for w in t.split() for tok in encode_word(w, ranks)]
        assert got[i] == want
        # lossless: concatenated tokens spell the words back
        assert "".join(got[i]).replace(END, " ").strip() == t


# ------------------------------------------------------------------ RRF

def test_rrf_fuse_hand_computed(spark):
    r1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "rank bigint, doc_id bigint"
    )
    r2 = spark.createDataFrame(
        [(1, 30), (2, 40)], "rank bigint, doc_id bigint"
    )
    got = {r.doc_id: (r.rank, r.score)
           for r in rrf_fuse([r1, r2], weights=[1.0, 2.0],
                             rank_constant=60, k=10).collect()}
    want = {
        10: 1 / 61,
        20: 1 / 62,
        30: 1 / 63 + 2 / 61,
        40: 2 / 62,
    }
    for d, s in want.items():
        assert got[d][1] == pytest.approx(s, rel=1e-12)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert order == [30, 40, 10, 20]

    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights must match"):
        rrf_fuse([r1], weights=[1.0, 2.0])


def test_hybrid_search_topk(spark):
    from elasticsearch_nlp_classifier_spark.index import build_logical_index

    docs = spark.createDataFrame(
        [
            (1, "spark join shuffle"),
            (2, "spark broadcast join"),
            (3, "unrelated text entirely"),
        ],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "doc_id bigint, embedding array<double>",
    )
    idx = build_logical_index(docs, text_col="text", analyzer="simple_code",
                              doc_id_col="doc_id")
    res = hybrid_search_topk(
        idx, emb, "spark join", [1.0, 0.05, 0.0], k=3,
        window=3, analyzer="simple_code", id_col="doc_id",
    ).collect()
    ranks = {r.doc_id: r.rank for r in res}
    # docs 1/2 lead both retrievers; doc 3 matches neither lexically nor
    # by vector and can only appear via its (low) vector rank
    assert ranks[1] < ranks[3] and ranks[2] < ranks[3]


def test_terms_agg_subs(spark):
    from elasticsearch_nlp_classifier_spark.query.aggs import terms_agg_subs

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("b", 7), ("b", 9), (None, 1)],
        "k string, v int",
    )
    got = terms_agg_subs(
        df, "k", {"avg_v": F.avg("v"), "max_v": F.max("v")}, size=10
    ).collect()
    assert [(r.key, r.doc_count, r.avg_v, r.max_v) for r in got] == [
        ("b", 3, 7.0, 9), ("a", 2, 15.0, 20)
    ]

# ------------------------------------------------------- phrase suggest

def test_phrase_suggest_corrects_typos(spark):
    from elasticsearch_nlp_classifier_spark.query import phrase_suggest

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(100, "a dog ran in the park")],
        "doc_id bigint, text string",
    )
    top = phrase_suggest(docs, "teh cat szt", k=3).collect()
    assert top[0].suggestion == "the cat sat"
    # the (typo'd) input phrase is itself a scored candidate, outranked
    all_sugs = [r.suggestion for r in
                phrase_suggest(docs, "teh cat", k=25).collect()]
    assert "the cat" in all_sugs and "teh cat" in all_sugs
    assert all_sugs.index("the cat") < all_sugs.index("teh cat")

    # clean input: the original phrase wins (LM likes it, zero penalty)
    clean = phrase_suggest(docs, "the cat sat", k=1).collect()
    assert clean[0].suggestion == "the cat sat"

    # single token: start-unigram prior beats the error penalty
    one = phrase_suggest(docs, "teh", k=2).collect()
    assert one[0].suggestion == "the"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="1-8 tokens"):
        phrase_suggest(docs, "")
