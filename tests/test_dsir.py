"""DSIR importance resampling vs a plain-Python twin of the documented
spec (hashed-unigram log-ratio weights, seeded Gumbel top-k)."""

import hashlib
import math
import re
from collections import Counter

import pytest

from elasticsearch_nlp_classifier_spark.operators import (
    dsir_select,
    dsir_weights,
)

TARGETY = [
    "wildfire evacuation route closed",
    "flood warning river rescue teams",
    "earthquake damage fire crews",
    "storm flood fire emergency response",
]
RAWY = [
    "cake recipe butter sugar flour",
    "football score weekend match",
    "garden tips roses spring",
    "stock market prices fall",
]
RAW = [(i, t) for i, t in enumerate(
    TARGETY + RAWY + ["fire flood emergency update",
                      "picnic park sunny music"]
)]
TARGET = [(100 + i, t) for i, t in enumerate(TARGETY)]

N_BUCKETS = 64
ALPHA = 1.0


def _u(s, salt):
    return int(hashlib.md5((s + salt).encode()).hexdigest()[:15], 16) \
        / float(1 << 60)


def _bucket(tok):
    return int(_u(tok, "dsir") * N_BUCKETS)


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _twin_weights():
    raw_c = Counter(_bucket(t) for _, txt in RAW for t in _toks(txt))
    tgt_c = Counter(_bucket(t) for _, txt in TARGET for t in _toks(txt))
    rt, tt = sum(raw_c.values()), sum(tgt_c.values())
    lr = {
        b: math.log((tgt_c.get(b, 0) + ALPHA) / (tt + ALPHA * N_BUCKETS))
        - math.log((raw_c[b] + ALPHA) / (rt + ALPHA * N_BUCKETS))
        for b in raw_c
    }
    return {
        i: sum(lr[_bucket(t)] for t in _toks(txt))
        for i, txt in RAW
    }


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_weights_match_twin(spark, frames):
    raw, tgt = frames
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(raw, tgt, n_buckets=N_BUCKETS,
                              alpha=ALPHA).collect()
    }
    want = _twin_weights()
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_targety_docs_outweigh_rawy_docs(spark, frames):
    raw, tgt = frames
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(raw, tgt, n_buckets=N_BUCKETS).collect()
    }
    targety = [w[i] for i in range(4)]          # the target docs
    rawy = [w[i] for i in range(4, 8)]          # off-distribution docs
    assert min(targety) > max(rawy)
    assert w[8] > w[9]                           # fire/flood > picnic


def test_select_is_deterministic_and_ranked(spark, frames):
    raw, tgt = frames
    a = dsir_select(raw, tgt, k=5, n_buckets=N_BUCKETS).collect()
    b = dsir_select(raw, tgt, k=5, n_buckets=N_BUCKETS).collect()
    assert [(r.doc_id, r.gumbel_key) for r in a] == \
        [(r.doc_id, r.gumbel_key) for r in b]
    keys = [r.gumbel_key for r in a]
    assert keys == sorted(keys, reverse=True)
    # gumbel key = logweight + deterministic seeded noise
    for r in a:
        g = -math.log(-math.log(_u(str(r.doc_id), "dsir_gumbel") + 1e-18))
        assert r.gumbel_key == pytest.approx(r.dsir_logweight + g,
                                             abs=1e-9)


def test_select_prefers_target_distribution(spark, frames):
    raw, tgt = frames
    top = {r.doc_id for r in
           dsir_select(raw, tgt, k=4, n_buckets=N_BUCKETS).collect()}
    # Gumbel noise is ~O(1); the planted weight gap is larger, so the
    # four target-like docs dominate the selection
    assert len(top & {0, 1, 2, 3, 8}) >= 3
