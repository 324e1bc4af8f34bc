"""Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.
2016) — the vocabulary-building step of an LLM data pipeline.

The scalable decomposition: BPE training never needs the corpus, only
the WORD HISTOGRAM (word -> count).  The histogram is the distributed
part — one explode + one map-side-combined groupBy over 100 TB — and it
collapses to |vocab| rows (10^6-ish), small enough to train merges on
the driver exactly like the reference single-node trainers do.  Encoding
then broadcasts the merge ranks back out and runs per UNIQUE word per
Arrow batch (factorize first — no per-row re-encode of repeated words).

Determinism: merge selection breaks count ties by pair lexicographic
order; training is a pure function of the histogram.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .textstats import words_col

END = "</w>"  # end-of-word marker, per the published algorithm


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, c) corpus word counts — the only distributed stage of
    BPE training (one explode + one partial-aggregated shuffle)."""
    return (
        docs.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    )


def train_bpe(
    histogram: list[tuple[str, int]],
    n_merges: int,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Greedy BPE merges over a (word, count) histogram.  Driver-side by
    design (the histogram is vocabulary-sized, not corpus-sized); the
    ``max_words`` cap keeps the tail out — counts below the cap cannot
    influence the top merges in practice, and the cap is deterministic
    (count DESC, word ASC)."""
    hist = sorted(histogram, key=lambda wc: (-wc[1], wc[0]))[:max_words]
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], int(c)) for w, c in hist if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for symbols, c in words:
            for i in range(len(symbols) - 1):
                pair_counts[(symbols[i], symbols[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for symbols, _c in words:
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == a and symbols[i + 1] == b:
                    symbols[i: i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges (lowest rank first) to one word; returns subword
    tokens with the trailing ``</w>`` folded into the last token."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_i, best_rank = -1, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        symbols[best_i: best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>) — whole-doc BPE token stream.
    The merge table rides the closure (broadcast by Spark); each Arrow
    batch encodes every UNIQUE word once (pandas factorize) and maps
    results back, so repeated words cost a dict hit."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(ArrayType(StringType())))
    def enc(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(ws):
            out = []
            for w in ws:
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.append(toks)
            return out

        return words.map(one)

    w = words_col(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.flatten(enc(w)).alias("bpe_tokens"),
    )
