"""Property-fuzz the ES 8.x retriever-tree compiler — round 4.

Random trees (standard / knn leaves, optional term/range filters,
composed to depth ≤2 by rrf / linear / text_similarity_reranker
nodes with random windows, weights, normalizers and rank constants)
are executed by `query/retriever.retrieve` and INDEPENDENTLY by a
pure-Python mirror of the documented semantics (BM25 from the scoring
spec, float64 cosine, per-node ranking/rounding conventions); per
case the ranked doc_id sequence must match and scores agree to 1e-6.
Completes the fuzz family: DSL, nested bool, ES|QL, aggs,
query_string, and now retriever trees."""

from __future__ import annotations

import math
import random
import re

import pytest

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    RetrieverContext,
    retrieve,
)

N_CASES = 80
K = 10
VOCAB = ["data", "spark", "index", "query", "engine", "value", "build",
         "merge", "token", "block", "score", "shard"]
DIM = 8


def _tok(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


def _mk_rows(rng: random.Random, n=300):
    docs, embs = [], []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(4, 10))]
        grp = rng.randint(0, 4)
        stars = rng.randint(0, 100)
        docs.append((i, " ".join(words), grp, stars))
        if rng.random() < 0.9:  # some docs have no embedding
            vec = [rng.randint(-8, 8) / 4.0 for _ in range(DIM)]
            if not any(vec):
                vec[0] = 0.25
            embs.append((i, vec, grp))
    return docs, embs


@pytest.fixture(scope="module")
def ret_env(spark):
    rng = random.Random(90210)
    docs_rows, emb_rows = _mk_rows(rng)
    docs = spark.createDataFrame(
        docs_rows, "doc_id bigint, text string, grp int, stars int"
    ).cache()
    embs = spark.createDataFrame(
        emb_rows, "vec_id bigint, embedding array<float>, grp int"
    ).cache()
    docs.count(), embs.count()
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code")
    idx.postings = idx.postings.cache()
    idx.postings.count()
    idx.corpus_stats  # freeze
    ctx = RetrieverContext(index=idx, docs=docs, embeddings=embs,
                           analyzer="simple_code", text_field="text")
    return ctx, docs_rows, emb_rows


# -------------------------------------------------- python reference

class _Ref:
    def __init__(self, docs_rows, emb_rows):
        self.docs = {d: (t, g, s) for d, t, g, s in docs_rows}
        self.emb = {d: (v, g) for d, v, g in emb_rows}
        self.tf, self.dl = {}, {}
        for d, (t, _g, _s) in self.docs.items():
            toks = _tok(t)
            if not toks:
                continue
            self.dl[d] = len(toks)
            m = self.tf.setdefault(d, {})
            for tk in toks:
                m[tk] = m.get(tk, 0) + 1
        self.df = {}
        for m in self.tf.values():
            for tk in m:
                self.df[tk] = self.df.get(tk, 0) + 1
        self.n = len(self.dl)
        self.avgdl = sum(self.dl.values()) / self.n

    def _passes(self, flt, cols) -> bool:
        kind, body = next(iter(flt.items()))
        if kind == "term":
            f, v = next(iter(body.items()))
            return cols.get(f) == v
        if kind == "range":
            f, spec = next(iter(body.items()))
            x = cols.get(f)
            ok = True
            for op, v in spec.items():
                ok = ok and {"gte": x >= v, "gt": x > v,
                             "lte": x <= v, "lt": x < v}[op]
            return ok
        raise AssertionError(kind)

    def _bm25(self, d, t) -> float | None:
        f = self.tf.get(d, {}).get(t, 0)
        if not f:
            return None
        idf = math.log(1 + (self.n - self.df[t] + 0.5)
                       / (self.df[t] + 0.5))
        return idf * f / (f + 1.2 * (0.25 + 0.75
                                     * self.dl[d] / self.avgdl))

    def _cos(self, vec, qv) -> float:
        dot = sum(a * b for a, b in zip(vec, qv))
        na = math.sqrt(sum(a * a for a in vec))
        nb = math.sqrt(sum(b * b for b in qv))
        return dot / (na * nb)

    def run(self, spec, k) -> list[tuple[int, float]]:
        kind, body = next(iter(spec.items()))
        if kind == "standard":
            text = body["query"]["match"]["text"]
            toks = sorted(set(_tok(text)))
            allowed = None
            if "filter" in body:
                allowed = {d for d, (t, g, s) in self.docs.items()
                           if self._passes(body["filter"],
                                           {"grp": g, "stars": s})}
            scores = {}
            for d in self.tf:
                if allowed is not None and d not in allowed:
                    continue
                s = 0.0
                hit = False
                for t in toks:
                    c = self._bm25(d, t)
                    if c is not None:
                        s += c
                        hit = True
                if hit:
                    scores[d] = s
            ranked = sorted(scores.items(),
                            key=lambda kv: (-round(kv[1], 9), kv[0]))
            return ranked[:k]
        if kind == "knn":
            qv = body["query_vector"]
            kk = int(body.get("k", k))
            cand = []
            for d, (v, g) in self.emb.items():
                if "filter" in body and not self._passes(
                        body["filter"], {"grp": g}):
                    continue
                cand.append((d, self._cos(v, qv)))
            # engine ranks raw cosine desc, id asc (cosine_topk)
            cand.sort(key=lambda kv: (-kv[1], kv[0]))
            return cand[:kk]
        if kind == "rrf":
            window = int(body.get("rank_window_size", max(k, 10)))
            weights = body.get("weights") \
                or [1.0] * len(body["retrievers"])
            rc = int(body.get("rank_constant", 60))
            fused = {}
            for w, child in zip(weights, body["retrievers"]):
                for r, (d, _s) in enumerate(self.run(child, window), 1):
                    fused[d] = fused.get(d, 0.0) + w / (rc + r)
            ranked = sorted(fused.items(),
                            key=lambda kv: (-round(kv[1], 12), kv[0]))
            return ranked[:k]
        if kind == "linear":
            window = int(body.get("rank_window_size", max(k, 10)))
            total = {}
            for child in body["retrievers"]:
                w = float(child.get("weight", 1.0))
                ranked = self.run(child["retriever"], window)
                if child.get("normalizer") == "minmax" and ranked:
                    vals = [s for _, s in ranked]
                    lo, hi = min(vals), max(vals)
                    ranked = [(d, 1.0 if hi == lo
                               else (s - lo) / (hi - lo))
                              for d, s in ranked]
                for d, s in ranked:
                    total[d] = total.get(d, 0.0) + w * s
            ranked = sorted(total.items(),
                            key=lambda kv: (-round(kv[1], 9), kv[0]))
            return ranked[:k]
        if kind == "text_similarity_reranker":
            window = int(body.get("rank_window_size", 10))
            head = self.run(body["retriever"], window)
            qv = body["query_vector"]
            scored = []
            for d, _s in head:
                if d in self.emb:
                    scored.append((d, self._cos(self.emb[d][0], qv)))
                else:
                    scored.append((d, -1.0))  # engine's coalesce(-1.0)
            scored.sort(key=lambda kv: (-round(kv[1], 9), kv[0]))
            return scored[:k]
        raise AssertionError(kind)


# ------------------------------------------------------- generator

def _gen_filter(rng, for_knn=False):
    if rng.random() < 0.5:
        return {"term": {"grp": rng.randint(0, 4)}}
    if for_knn:
        return {"range": {"grp": {"gte": rng.randint(0, 3)}}}
    return {"range": {"stars": {
        rng.choice(["gte", "lt"]): rng.randint(20, 80)}}}


def _gen_leaf(rng):
    if rng.random() < 0.5:
        body = {"query": {"match": {"text": " ".join(
            rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))}}}
        if rng.random() < 0.4:
            body["filter"] = _gen_filter(rng)
        return {"standard": body}
    body = {"query_vector": [rng.randint(-8, 8) / 4.0
                             for _ in range(DIM)]}
    if rng.random() < 0.3:
        body["k"] = rng.choice([5, 15, 25])
    if rng.random() < 0.4:
        body["filter"] = _gen_filter(rng, for_knn=True)
    return {"knn": body}


def _gen_tree(rng, depth=0):
    if depth >= 2 or rng.random() < 0.35:
        return _gen_leaf(rng)
    kind = rng.choice(["rrf", "rrf", "linear", "reranker"])
    if kind == "rrf":
        nc = rng.randint(2, 3)
        body = {"retrievers": [_gen_tree(rng, depth + 1)
                               for _ in range(nc)]}
        if rng.random() < 0.5:
            body["rank_window_size"] = rng.choice([10, 20, 50])
        if rng.random() < 0.4:
            body["rank_constant"] = rng.choice([1, 10, 60])
        if rng.random() < 0.4:
            body["weights"] = [rng.choice([0.5, 1.0, 2.0])
                               for _ in range(nc)]
        return {"rrf": body}
    if kind == "linear":
        nc = rng.randint(2, 3)
        body = {"retrievers": [
            {"retriever": _gen_tree(rng, depth + 1),
             "weight": rng.choice([0.5, 1.0, 2.0]),
             "normalizer": rng.choice(["none", "minmax"])}
            for _ in range(nc)]}
        if rng.random() < 0.5:
            body["rank_window_size"] = rng.choice([10, 20, 50])
        return {"linear": body}
    return {"text_similarity_reranker": {
        "retriever": _gen_tree(rng, depth + 1),
        "query_vector": [rng.randint(-8, 8) / 4.0 for _ in range(DIM)],
        "rank_window_size": rng.choice([10, 20, 40]),
    }}


def test_fuzz_retriever_trees_vs_python_reference(spark, ret_env):
    ctx, docs_rows, emb_rows = ret_env
    ref = _Ref(docs_rows, emb_rows)
    rng = random.Random(60606)
    mismatches = []
    nonempty = 0
    for i in range(N_CASES):
        tree = _gen_tree(rng)
        got = [(r["doc_id"], r["score"])
               for r in retrieve(tree, ctx, K).collect()]
        want = ref.run(tree, K)
        nonempty += bool(want)
        ok = len(got) == len(want) and all(
            gd == wd and abs(gs - ws) <= 1e-6
            for (gd, gs), (wd, ws) in zip(got, want)
        )
        if not ok:
            mismatches.append((i, tree, got[:5], want[:5]))
    assert not mismatches, (
        f"{len(mismatches)}/{N_CASES} retriever mismatches; first: "
        f"{mismatches[0]}"
    )
    assert nonempty >= N_CASES * 3 // 4, nonempty
