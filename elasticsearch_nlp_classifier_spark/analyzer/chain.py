"""Analyzer chains: split -> [cleanTwitter] -> [lowercase] -> [stopwords]
-> [stem], mirroring the reference's switchable pipeline
(`utils/tokenize/NLPTokenizer.java:67-82`; default config :31-40 =
twitter split + lowercase + stopwords + stemming).

Three split modes:

- ``twitter``  — TweetMotif twokenize (`twokenizer.py`)
- ``simple``   — OpenNLP ``SimpleTokenizer`` semantics: maximal runs of
  letters, maximal runs of digits, runs of one repeated "other" char
  (`NLPTokenizer.java:84-95` non-twitter branch)
- ``code``     — source-code analyzer for the corpus table: identifier /
  number / operator-run tokens (ours; the corpus is code, not tweets)
- ``simple_code`` — lowercase + ``[a-z0-9]+`` extraction; intentionally
  expressible in both Spark SQL and DuckDB so driver oracle queries can
  replicate it exactly.

Everything is exposed (a) as plain-Python functions for tests/oracles and
(b) as a vectorized pandas batch function for the Spark UDF wrapper in
``spark_udfs.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .porter2 import stem_cached
from .stopwords import STOPWORDS, remove_stopwords
from .twokenizer import twokenize

# OpenNLP SimpleTokenizer: tokens are maximal same-class runs where class
# ∈ {letter, digit, other}; "other" runs only group the SAME character.
_SIMPLE = re.compile(r"[^\W\d_]+|\d+|(\S)\1*")

# Code tokens: identifiers (incl. underscore), numbers, repeated-op runs.
_CODE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|(\S)\1*")

_SIMPLE_CODE = re.compile(r"[a-z0-9]+")

_HANDLE = re.compile(r"^@")
_URL = re.compile(r"^\w+://", re.UNICODE)




def simple_split(text: str) -> list[str]:
    return [m.group(0) for m in _SIMPLE.finditer(text)]


def code_split(text: str) -> list[str]:
    return [m.group(0) for m in _CODE.finditer(text)]


def simple_code_split(text: str) -> list[str]:
    return _SIMPLE_CODE.findall(text.lower())


def tab_split(text: str) -> list[str]:
    """`utils/tokenize/TabTokenizer.java:7-11`."""
    return text.split("\t")


def _finditer_pos(pattern: re.Pattern, text: str, lower: bool = False):
    return [
        ((m.group(0).lower() if lower else m.group(0)),
         m.start(), m.end())
        for m in pattern.finditer(text)
    ]


def simple_split_pos(text):
    return _finditer_pos(_SIMPLE, text)


def code_split_pos(text):
    return _finditer_pos(_CODE, text)


def simple_code_split_pos(text):
    """Offsets twin of :func:`simple_code_split`: token sequence
    IDENTICAL by construction (both match ``[a-z0-9]+`` on the LOWERED
    text — including non-ASCII uppercase that lowers into ASCII, e.g.
    U+212A KELVIN SIGN → 'k'), spans index the ORIGINAL text.  In the
    common case ``lower()`` preserves length, so lowered match spans are
    original-text spans directly; when it expands characters ('İ' →
    'i̇') a lowered→original char-index map keeps spans pointing at the
    originating characters."""
    low = text.lower()
    if len(low) == len(text):
        return [(m.group(0), m.start(), m.end())
                for m in _SIMPLE_CODE.finditer(low)]
    back: list[int] = []
    parts: list[str] = []
    for i, ch in enumerate(text):
        cl = ch.lower()
        parts.append(cl)
        back.extend([i] * len(cl))
    low = "".join(parts)
    return [(m.group(0), back[m.start()], back[m.end() - 1] + 1)
            for m in _SIMPLE_CODE.finditer(low)]


def tab_split_pos(text):
    out, pos = [], 0
    for t in text.split("\t"):
        out.append((t, pos, pos + len(t)))
        pos += len(t) + 1
    return out


def _scan_spans(text: str, tokens: list[str]):
    """(token, start, end) via sequential verbatim scan — for splitters
    whose tokens are in-order substrings of the input (twokenize: its
    transforms only split, never rewrite characters).  Same mechanism
    as the reference's `ATokenizer.tokenizePos`
    (`ATokenizer.java:55-71`) but over SPLIT-stage tokens, where a miss
    is impossible rather than a degenerate span."""
    out, pos = [], 0
    for t in tokens:
        start = text.find(t, pos)
        if start < 0:  # defensive: never true for verbatim splitters
            out.append((t, pos, pos))
            continue
        out.append((t, start, start + len(t)))
        pos = start + len(t)
    return out


def twokenize_pos(text):
    return _scan_spans(text, twokenize(text))


def clean_twitter(tokens: list[str]) -> list[str]:
    """Drop @handles and scheme:// URLs, strip one leading '#'
    (`NLPTokenizer.java:97-105`)."""
    return [
        _HASH_SUB(t) for t in tokens
        if not _HANDLE.match(t) and not _URL.match(t)
    ]


def _HASH_SUB(t: str) -> str:
    return t[1:] if t.startswith("#") else t


_SPLITTERS = {
    "twitter": twokenize,
    "simple": simple_split,
    "code": code_split,
    "simple_code": simple_code_split,
    "tab": tab_split,
}

_SPLITTERS_POS = {
    "twitter": twokenize_pos,
    "simple": simple_split_pos,
    "code": code_split_pos,
    "simple_code": simple_code_split_pos,
    "tab": tab_split_pos,
}


@dataclass(frozen=True)
class Analyzer:
    """A configured tokenizer chain. Immutable; safe to ship to executors.

    ``token_filter`` names an optional terminal ES-style token filter
    (``TOKEN_FILTERS``: shingle2/shingle3/edge_ngram — the autocomplete
    analysis components; ``analyzer/filters.py`` holds the Column
    twins)."""

    split: str = "twitter"
    use_clean_twitter: bool = False
    use_lowercase: bool = True
    use_stopwords: bool = True
    use_stemming: bool = True
    token_filter: str = ""

    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        tokens = _SPLITTERS[self.split](text)
        if self.use_clean_twitter:
            tokens = clean_twitter(tokens)
        if self.use_lowercase:
            tokens = [t.lower() for t in tokens]
        if self.use_stopwords:
            tokens = remove_stopwords(tokens)
        if self.use_stemming:
            tokens = [stem_cached(t) for t in tokens]
        if self.token_filter:
            tokens = TOKEN_FILTERS[self.token_filter](tokens)
        return tokens

    def tokenize_with_offsets(
        self, text: str | None
    ) -> list[tuple[str, int, int]]:
        """(token, start_offset, end_offset) — char spans of each
        surviving token in the ORIGINAL text, tracked through the whole
        chain (the Lucene/ES behavior behind the term-vector
        ``offsets`` flag, `TermVectorQuery.java:60-76`; golden spans in
        `TermVectorTokensTest.java:16-55`): spans are fixed at the
        SPLIT stage; lowercase/stem rewrite the token but keep its
        span; cleanTwitter's ``#`` strip advances start by 1; dropped
        tokens (handles, URLs, stopwords, punct runs) drop their spans.
        Token sequence is identical to :meth:`tokenize` (pinned in
        tests)."""
        if text is None:
            return []
        triples = _SPLITTERS_POS[self.split](text)
        if self.use_clean_twitter:
            out = []
            for t, s, e in triples:
                if _HANDLE.match(t) or _URL.match(t):
                    continue
                if t.startswith("#"):
                    t, s = t[1:], s + 1
                out.append((t, s, e))
            triples = out
        if self.use_lowercase:
            triples = [(t.lower(), s, e) for t, s, e in triples]
        if self.use_stopwords:
            from .stopwords import keep_token

            triples = [x for x in triples if keep_token(x[0])]
        if self.use_stemming:
            triples = [(stem_cached(t), s, e) for t, s, e in triples]
        if self.token_filter:
            triples = _FILTER_SPANS[self.token_filter](triples)
        return triples

    def tokenize_pos(self, text: str | None) -> list[tuple[int, int]]:
        """OpenNLP-interface span parity (`ATokenizer.java:55-71`):
        spans of the FINAL analyzed tokens found by sequential verbatim
        search in the original text — including the reference's
        degenerate ``(pos+1, pos+1)`` span when a lowered/stemmed token
        no longer appears verbatim ("might get confused by a stemmer",
        its own docstring).  Golden: `TabTokenizerTest.java`
        tokenizePos.  Use :meth:`tokenize_with_offsets` for the
        Lucene-faithful offsets the index stores."""
        if text is None:
            return []
        spans, pos = [], 0
        for token in self.tokenize(text):
            start = text.find(token, pos)
            if start >= pos:
                spans.append((start, start + len(token)))
                pos = start + len(token)
            else:
                spans.append((pos + 1, pos + 1))
        return spans

    def tokenize_fields(self, *texts: str | None) -> list[str]:
        """Multi-field tokenize+concat (`ATokenizer.java:36-43`)."""
        out: list[str] = []
        for t in texts:
            if t:
                out.extend(self.tokenize(t))
        return out


# The reference's default chain (`NLPTokenizer.java:31-40`).
DEFAULT = Analyzer(split="twitter")
# The cleanTwitter variant used in the reference's tokenizer golden test.
CLEAN_TWITTER = Analyzer(split="twitter", use_clean_twitter=True)
# Analyzer for the source-code corpus (index build default).
CODE = Analyzer(split="code", use_stopwords=True, use_stemming=False)
# Oracle-replicable analyzer (DuckDB-expressible; no stopwords/stem).
SIMPLE_CODE = Analyzer(
    split="simple_code", use_lowercase=False,
    use_stopwords=False, use_stemming=False,
)

def _shingle2(toks: list[str]) -> list[str]:
    from .filters import shingle_list

    return shingle_list(toks, 2)


def _shingle3(toks: list[str]) -> list[str]:
    from .filters import shingle_list

    return shingle_list(toks, 3)


def _edge_ngram(toks: list[str]) -> list[str]:
    from .filters import edge_ngram_list

    return edge_ngram_list(toks, 1, 10)


TOKEN_FILTERS = {
    "shingle2": _shingle2,
    "shingle3": _shingle3,
    "edge_ngram": _edge_ngram,
}


def _shingle_spans(triples, n: int, sep: str = " "):
    """Lucene ShingleFilter offsets: a shingle spans from its first
    constituent's start to its last constituent's end."""
    return [
        (sep.join(t for t, _, _ in triples[i:i + n]),
         triples[i][1], triples[i + n - 1][2])
        for i in range(len(triples) - n + 1)
    ]


def _edge_ngram_spans(triples, min_gram: int = 1, max_gram: int = 10):
    """Lucene EdgeNGramTokenFilter keeps the SOURCE token's offsets for
    every gram."""
    return [
        (t[:g], s, e)
        for t, s, e in triples
        for g in range(min_gram, min(max_gram, len(t)) + 1)
    ]


_FILTER_SPANS = {
    "shingle2": lambda tr: _shingle_spans(tr, 2),
    "shingle3": lambda tr: _shingle_spans(tr, 3),
    "edge_ngram": _edge_ngram_spans,
}

ANALYZERS: dict[str, Analyzer] = {
    "default": DEFAULT,
    "clean_twitter": CLEAN_TWITTER,
    "code": CODE,
    "simple_code": SIMPLE_CODE,
    "simple": Analyzer(split="simple"),
    "tab": Analyzer(
        split="tab", use_lowercase=False,
        use_stopwords=False, use_stemming=False,
    ),
    # search_as_you_type subfield analyzers (._2gram / ._3gram) and the
    # edge_ngram autocomplete expansion, over the oracle-replicable
    # simple_code splitter
    "simple_code_shingle2": Analyzer(
        split="simple_code", use_lowercase=False, use_stopwords=False,
        use_stemming=False, token_filter="shingle2",
    ),
    "simple_code_shingle3": Analyzer(
        split="simple_code", use_lowercase=False, use_stopwords=False,
        use_stemming=False, token_filter="shingle3",
    ),
    "simple_code_edge": Analyzer(
        split="simple_code", use_lowercase=False, use_stopwords=False,
        use_stemming=False, token_filter="edge_ngram",
    ),
}


def get_analyzer(name: str) -> Analyzer:
    return ANALYZERS[name]


#: the char class of `stopwords._PUNCT_RUN` — a token is a punct run
#: iff its first char is one of these AND the token is that char
#: repeated; ``t.count(t[0]) == len(t)`` tests the repetition at C
#: speed ('_' needs the full test: '_foo'/'___' are both single CODE
#: tokens via the identifier branch, and only the latter is a run)
_PUNCT_CHARS = frozenset("!\"#$%&'()*+,./:;<=>?@[]^_`{|}~-")


def batch_tokenize_with_offsets(an: Analyzer, texts):
    """Vectorized batch twin of :meth:`Analyzer.tokenize_with_offsets`
    — identical (token, start, end) output, pinned by parity tests —
    for the regex-split chains the index build uses (``code``,
    ``simple_code``; no cleanTwitter/stemming/token_filter).  Returns
    ``(doc_idx, terms, starts, ends, n_per_doc)`` numpy arrays, or
    ``None`` when this chain needs the per-doc path.

    Why: the per-doc chain pays ~5 Python passes per document (split
    comprehension, tuple builds, lowercase rebuild, stopword filter);
    at an offsets build over millions of docs that Python time is the
    whole stage.  Here the batch does ONE ``finditer`` over a
    ``"\\n"``-joined superstring (no token can span the separator —
    every split alternative excludes whitespace), slices tokens from a
    once-lowered copy, and maps spans back to per-doc offsets with
    ``searchsorted`` — per-token Python work drops to two C-level
    slicing comprehensions."""
    import numpy as np

    if (an.use_clean_twitter or an.use_stemming or an.token_filter
            or an.split not in ("code", "simple", "simple_code")):
        return None
    texts = ["" if t is None else t for t in texts]
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), np.int64, n_docs)
    bounds = np.concatenate(([0], np.cumsum(lens + 1)))  # doc i at bounds[i]
    big = "\n".join(texts)

    if an.split == "simple_code":
        # tokens are defined on the LOWERED text (`simple_code_split`);
        # spans are only original-text-valid when lower() preserves
        # length (ASCII and almost all of Unicode) — else the per-doc
        # path's char-index back-map handles it
        low = big.lower()
        # capital sigma is the one length-preserving char where Python's
        # whole-string lower() is context-sensitive ('Σ'→'ς' word-final,
        # 'σ' otherwise) while the per-doc chain lowers token-wise →
        # 'σ' always; fall back so index- and query-time terms agree
        if len(low) != len(big) or "Σ" in big:
            return None
        spans = [m.span() for m in _SIMPLE_CODE.finditer(low)]
        src = low
    else:
        pattern = _CODE if an.split == "code" else _SIMPLE
        spans = [m.span() for m in pattern.finditer(big)]
        if an.use_lowercase:
            low = big.lower()
            # token-wise lower() (the chain's own semantics) never
            # changes offsets; whole-string lower is just the fast way
            # to get every lowered token in one call — unless 'Σ' is
            # present, whose whole-string lowering is context-sensitive
            # ('ς' word-final vs token-wise 'σ'); then src=None routes
            # every token through the per-token .lower() slice below
            src = (low if len(low) == len(big) and "Σ" not in big
                   else None)
        else:
            src = big
    if not spans:
        z = np.empty(0, dtype=np.int64)
        return z, [], z, z, np.zeros(n_docs, dtype=np.int64)
    se = np.asarray(spans, dtype=np.int64)
    if src is None:
        terms = [big[a:b].lower() for a, b in spans]
    else:
        terms = [src[a:b] for a, b in spans]

    if an.use_stopwords:
        lowered = an.use_lowercase or an.split == "simple_code"
        keep = np.fromiter(
            ((t if lowered else t.lower()) not in STOPWORDS
             and not (t[0] in _PUNCT_CHARS and t.count(t[0]) == len(t))
             for t in terms),
            dtype=bool, count=len(terms),
        )
        if not keep.all():
            se = se[keep]
            terms = [t for t, k in zip(terms, keep) if k]
    if not len(terms):
        z = np.empty(0, dtype=np.int64)
        return z, [], z, z, np.zeros(n_docs, dtype=np.int64)

    doc_idx = np.searchsorted(bounds, se[:, 0], side="right") - 1
    starts = se[:, 0] - bounds[doc_idx]
    ends = se[:, 1] - bounds[doc_idx]
    n_per_doc = np.bincount(doc_idx, minlength=n_docs)
    return doc_idx, terms, starts, ends, n_per_doc
