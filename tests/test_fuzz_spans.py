"""Property-fuzz the span/intervals family — round 4.

Random span queries (span_or / span_first / span_not / span_near /
unordered intervals / span_containing / span_within / span_multi with
random terms, slops, windows, pre/post and patterns) run against a
positional physical index, and a pure-Python mirror of each
operator's documented semantics (greedy-minimal chains, anchor
algebra, wildcard rewrites) computes the expected ``(doc_id,
n_matches)`` map from the raw token-position lists; maps must be
equal per case.  The sixth and final fuzz harness — every non-trivial
query surface now has one."""

from __future__ import annotations

import random
import re

import pytest

from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query import (
    intervals_match,
    span_containing,
    span_first,
    span_multi,
    span_not,
    span_or,
    span_within,
)
from elasticsearch_nlp_classifier_spark.query.phrase import span_near

N_CASES = 90
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "w1", "w2"]


def _tok(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


@pytest.fixture(scope="module")
def span_env(spark, tmp_path_factory):
    rng = random.Random(13131)
    rows = [
        (i, " ".join(rng.choice(VOCAB)
                     for _ in range(rng.randint(3, 14))))
        for i in range(150)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path_factory.mktemp("fuzzspan") / "idx")
    idx = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True, block_size=8,
    )
    pos = {}
    for d, t in rows:
        m = {}
        for p, tk in enumerate(_tok(t)):
            m.setdefault(tk, []).append(p)
        pos[d] = m
    vocab = sorted({tk for m in pos.values() for tk in m})
    return idx, pos, vocab


# ---------------------------------------------------- python mirror

def _greedy_chain_count(slots, m):
    """span_near: count slot-0 starts whose greedy in-order chain fits
    the slop window; returns list of (start, last)."""
    out = []
    for p in m.get(slots[0], []):
        prev, ok = p, True
        for t in slots[1:]:
            nxt = [q for q in m.get(t, []) if q > prev]
            if not nxt:
                ok = False
                break
            prev = nxt[0]
        if ok:
            out.append((p, prev))
    return out


def _ref(case, pos, vocab):
    kind = case[0]
    res = {}
    for d, m in pos.items():
        n = 0
        if kind == "or":
            slots = sorted(set(case[1]))
            n = sum(len(m.get(t, [])) for t in slots)
        elif kind == "first":
            _, t, end = case
            n = sum(1 for p in m.get(t, []) if p + 1 <= end)
        elif kind == "not":
            _, inc, exc, pre, post = case
            if inc == exc:
                n = 0
            elif m.get(inc):
                n = sum(
                    1 for p in m[inc]
                    if not any(p - pre <= q <= p + post
                               for q in m.get(exc, []))
                )
        elif kind == "near":
            _, slots, slop = case
            if all(m.get(t) for t in set(slots)):
                n = sum(1 for p0, last in _greedy_chain_count(slots, m)
                        if last - p0 - (len(slots) - 1) <= slop)
        elif kind == "intervals":
            _, slots, max_gaps = case
            k = len(slots)
            if all(m.get(t) for t in slots):
                if k == 1:
                    n = len(m[slots[0]])
                else:
                    anchors = sorted({q for t in slots
                                      for q in m[t]})
                    for p in anchors:
                        nxt = []
                        for t in slots:
                            cand = [q for q in m[t] if q >= p]
                            if not cand:
                                nxt = None
                                break
                            nxt.append(cand[0])
                        if nxt is not None and \
                                max(nxt) - p - (k - 1) <= max_gaps:
                            n += 1
        elif kind in ("containing", "within"):
            _, a1, a2, slop, little = case
            if a1 != a2 and m.get(a1) and m.get(a2) and m.get(little):
                spans = []
                for p in m[a1]:
                    nxt = [q for q in m[a2] if q > p]
                    if nxt and nxt[0] - p - 1 <= slop:
                        spans.append((p, nxt[0]))
                if kind == "containing":
                    n = sum(1 for p, q in spans
                            if any(p <= r <= q for r in m[little]))
                else:
                    n = sum(1 for r in m[little]
                            if any(p <= r <= q for p, q in spans))
        elif kind == "multi":
            _, pattern, cap = case
            if pattern.endswith("*") and not any(
                    c in pattern[:-1] for c in "*?"):
                terms = [t for t in vocab
                         if t.startswith(pattern[:-1].lower())]
            else:
                rx = "^" + "".join(
                    ".*" if c == "*" else "." if c == "?" else
                    c if c.isalnum() else "\\" + c
                    for c in pattern.lower()) + "$"
                terms = [t for t in vocab if re.match(rx, t)]
            terms = sorted(terms)[:cap]
            n = sum(len(m.get(t, [])) for t in terms)
        if n > 0:
            res[d] = n
    return res


def _run_engine(case, idx):
    kw = dict(analyzer="simple_code")
    kind = case[0]
    if kind == "or":
        return span_or(idx, case[1], **kw)
    if kind == "first":
        return span_first(idx, case[1], case[2], **kw)
    if kind == "not":
        return span_not(idx, case[1], case[2], pre=case[3],
                        post=case[4], **kw)
    if kind == "near":
        return span_near(idx, " ".join(case[1]), slop=case[2], **kw)
    if kind == "intervals":
        return intervals_match(idx, " ".join(case[1]),
                               max_gaps=case[2], ordered=False, **kw)
    if kind == "containing":
        return span_containing(idx, (case[1], case[2], case[3]),
                               case[4], **kw)
    if kind == "within":
        return span_within(idx, case[4], (case[1], case[2], case[3]),
                           **kw)
    if kind == "multi":
        return span_multi(idx, case[1], max_expansions=case[2])
    raise AssertionError(kind)


def _gen_case(rng):
    kind = rng.choice(["or", "first", "not", "near", "near",
                       "intervals", "intervals", "containing",
                       "within", "multi"])
    pick = lambda: rng.choice(VOCAB)  # noqa: E731
    if kind == "or":
        return ("or", [pick() for _ in range(rng.randint(1, 3))])
    if kind == "first":
        return ("first", pick(), rng.randint(1, 8))
    if kind == "not":
        return ("not", pick(), pick(), rng.randint(0, 2),
                rng.randint(0, 2))
    if kind == "near":
        n = rng.randint(2, 3)
        return ("near", [pick() for _ in range(n)], rng.randint(0, 4))
    if kind == "intervals":
        n = rng.randint(1, 3)
        slots = rng.sample(VOCAB, n)  # engine requires distinct terms
        return ("intervals", slots, rng.randint(0, 4))
    if kind in ("containing", "within"):
        a1, a2 = rng.sample(VOCAB, 2)
        return (kind, a1, a2, rng.randint(0, 4), pick())
    pattern = rng.choice(["alph*", "w*", "*eta", "?eta", "gam?a",
                          "z*", "x*"])
    return ("multi", pattern, rng.choice([2, 5, 50]))


def test_fuzz_spans_vs_python_reference(spark, span_env):
    idx, pos, vocab = span_env
    rng = random.Random(24242)
    mismatches = []
    nonempty = 0
    for i in range(N_CASES):
        case = _gen_case(rng)
        got = {r["doc_id"]: r["n_matches"]
               for r in _run_engine(case, idx).collect()}
        want = _ref(case, pos, vocab)
        nonempty += bool(want)
        if got != want:
            diff = {d: (got.get(d), want.get(d))
                    for d in set(got) ^ set(want)
                    | {d for d in set(got) & set(want)
                       if got[d] != want[d]}}
            mismatches.append((i, case, dict(list(diff.items())[:5])))
    assert not mismatches, (
        f"{len(mismatches)}/{N_CASES} span mismatches; first: "
        f"{mismatches[0]}"
    )
    assert nonempty >= N_CASES // 2, nonempty
