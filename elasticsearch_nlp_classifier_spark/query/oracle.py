"""Brute-force float64 BM25 oracle — pure pandas, no index structures.

Implements the exact scoring spec of `bm25.py` (same formula, same
constants, same tie-break) over raw (doc_id, tokens) lists.  Used by the
parity suite: engine top-k must be rank-identical with scores equal to
atol 1e-9 (SURVEY §5.2 item 3).
"""

from __future__ import annotations

import math

import pandas as pd

from ..analyzer.chain import Analyzer

K1 = 1.2
B = 0.75


def bm25_oracle(
    docs_tokens: dict[int, list[str]],
    queries: list[dict],
    analyzer: Analyzer,
) -> pd.DataFrame:
    """queries: [{query_id, query_text, k}] → (query_id, rank, doc_id, score)."""
    # corpus stats
    tfs: dict[int, dict[str, int]] = {}
    dls: dict[int, int] = {}
    df: dict[str, int] = {}
    for doc_id, toks in docs_tokens.items():
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        if counts:
            tfs[doc_id] = counts
            dls[doc_id] = len(toks)
            for t in counts:
                df[t] = df.get(t, 0) + 1
    n = len(tfs)
    avgdl = (sum(dls.values()) / n) if n else 1.0

    rows = []
    for q in queries:
        qterms = sorted(set(analyzer.tokenize(q["query_text"])))
        scores: dict[int, float] = {}
        for t in qterms:
            if t not in df:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for doc_id, counts in tfs.items():
                tf = counts.get(t)
                if tf:
                    contrib = idf * tf / (
                        tf + K1 * (1 - B + B * dls[doc_id] / avgdl)
                    )
                    scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc_id, score) in enumerate(ranked[: q.get("k", 10)], 1):
            rows.append(
                {"query_id": q["query_id"], "rank": rank,
                 "doc_id": doc_id, "score": score}
            )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
