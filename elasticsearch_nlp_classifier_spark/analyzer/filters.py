"""ES analysis token filters — shingle, edge_ngram, ngram, asciifolding
— as composable expressions over ``array<string>`` token columns.

These are the analysis components behind ES's autocomplete surfaces:
``search_as_you_type`` fields index shingle subfields (``._2gram`` /
``._3gram``), completion/prefix indexes use ``edge_ngram``, and
``asciifolding`` normalizes Latin accents before matching.  The
reference's users configure them through the stock client's index
mappings (`utils/elasticsearch/ESClient.java`).

Dual implementation, like the analyzer chains themselves:

- ``*_col``  — pure Catalyst higher-order expressions (transform /
  slice / flatten / sequence) that stay inside whole-stage codegen, for
  index builds and query-side analysis at scale;
- ``*_list`` — plain-Python twins for tests and DuckDB oracle
  generation (parity pinned by ``test_analyzer_filters``).

Registered combinations (``chain.ANALYZERS``): ``simple_code_shingle2``
/ ``simple_code_shingle3`` tokenize with the oracle-replicable
``simple_code`` splitter and then shingle — both also present in
``spark_udfs.JVM_TOKEN_EXPRS`` so physical-index builds over shingle
subfields never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "shingle_tokens_col", "edge_ngram_tokens_col", "ngram_tokens_col",
    "ascii_fold_col", "shingle_list", "edge_ngram_list", "ngram_list",
    "ascii_fold_str",
]


def shingle_tokens_col(toks: Column, n: int, sep: str = " ") -> Column:
    """ES ``shingle`` filter: all ``n``-token word-grams in order,
    joined with ``sep`` (ES's ``token_separator``).  ``size < n``
    yields no shingles (ES with ``output_unigrams=false``)."""
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - n + 1),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), sep)
    )


def edge_ngram_tokens_col(
    toks: Column, min_gram: int = 1, max_gram: int = 10,
) -> Column:
    """ES ``edge_ngram`` filter: for each token, its prefixes of length
    ``min_gram..min(max_gram, len)`` — the classic autocomplete index
    expansion.  Tokens shorter than ``min_gram`` emit nothing."""
    return F.flatten(F.transform(
        toks,
        lambda t: F.transform(
            F.when(
                F.length(t) >= min_gram,
                F.sequence(
                    F.lit(min_gram), F.least(F.lit(max_gram), F.length(t))
                ),
            ).otherwise(F.array().cast("array<int>")),
            lambda g: t.substr(F.lit(1), g),
        ),
    ))


def ngram_tokens_col(
    toks: Column, min_gram: int = 2, max_gram: int = 3,
) -> Column:
    """ES ``ngram`` filter: every character n-gram of each token with
    length in ``[min_gram, max_gram]``, in (position, length) order —
    substring-match indexing."""
    def grams_of(t):
        lens = F.when(
            F.length(t) >= min_gram,
            F.sequence(F.lit(min_gram), F.least(F.lit(max_gram),
                                                F.length(t))),
        ).otherwise(F.array().cast("array<int>"))
        return F.flatten(F.transform(
            F.when(
                F.length(t) >= min_gram,
                F.sequence(F.lit(1), F.length(t) - min_gram + 1),
            ).otherwise(F.array().cast("array<int>")),
            lambda i: F.filter(
                F.transform(
                    lens,
                    lambda g: F.when(
                        i + g - 1 <= F.length(t), t.substr(i, g)
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        ))

    return F.flatten(F.transform(toks, grams_of))


# asciifolding's Latin-1 supplement / Latin-A core — the overwhelming
# bulk of real usage; full ICU folding needs tables this environment
# doesn't ship.  Built from explicit pairs so src/dst can never drift.
_FOLD_PAIRS = [
    ("àáâãäåā", "a"), ("çćč", "c"), ("èéêëēě", "e"), ("ìíîïī", "i"),
    ("ñń", "n"), ("òóôõöøō", "o"), ("ùúûüū", "u"), ("ýÿ", "y"),
    ("ž", "z"), ("š", "s"), ("ł", "l"),
    ("ÀÁÂÃÄÅĀ", "A"), ("ÇĆČ", "C"), ("ÈÉÊËĒĚ", "E"), ("ÌÍÎÏĪ", "I"),
    ("ÑŃ", "N"), ("ÒÓÔÕÖØŌ", "O"), ("ÙÚÛÜŪ", "U"), ("Ý", "Y"),
    ("Ž", "Z"), ("Š", "S"), ("Ł", "L"),
]
_FOLD_SRC = "".join(src for src, _ in _FOLD_PAIRS)
_FOLD_DST = "".join(dst * len(src) for src, dst in _FOLD_PAIRS)


def ascii_fold_col(c: Column) -> Column:
    """ES ``asciifolding`` (char filter form): map accented Latin-1/-A
    letters to ASCII before tokenization.  One JVM ``translate`` —
    apply to the raw text column ahead of ``analyze``."""
    return F.translate(c, _FOLD_SRC, _FOLD_DST)


# ---------------------------------------------------------------------------
# plain-Python twins (tests + oracle generation)
# ---------------------------------------------------------------------------


def shingle_list(toks: list[str], n: int, sep: str = " ") -> list[str]:
    return [sep.join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def edge_ngram_list(
    toks: list[str], min_gram: int = 1, max_gram: int = 10,
) -> list[str]:
    return [
        t[:g]
        for t in toks
        for g in range(min_gram, min(max_gram, len(t)) + 1)
    ]


def ngram_list(
    toks: list[str], min_gram: int = 2, max_gram: int = 3,
) -> list[str]:
    return [
        t[i:i + g]
        for t in toks
        for i in range(len(t) - min_gram + 1)
        for g in range(min_gram, max_gram + 1)
        if i + g <= len(t)
    ]


_FOLD_MAP = str.maketrans(_FOLD_SRC, _FOLD_DST)


def ascii_fold_str(s: str) -> str:
    return s.translate(_FOLD_MAP)
