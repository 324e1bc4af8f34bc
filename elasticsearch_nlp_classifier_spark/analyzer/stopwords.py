"""English stopword list + punctuation-run filter.

Same semantics as the reference's `utils/tokenize/Stopwords.java:14-39`:
a 127-word list (public domain, https://gist.github.com/sebleier/554280 —
the NLTK english stopword list, cited as the source inside the
reference's own `src/main/resources/stopwords.txt`), matched
case-insensitively, plus removal of tokens that are a run of one repeated
ASCII punctuation character, plus empty tokens.
"""

from __future__ import annotations

import re

STOPWORDS: frozenset[str] = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their
theirs themselves what which who whom this that these those am is are was
were be been being have has had having do does did doing a an the and but
if or because as until while of at by for with about against between into
through during before after above below to from up down in out on off
over under again further then once here there when where why how all any
both each few more most other some such no nor not only own same so than
too very s t can will just don should now
""".split())

_PUNCT_RUN = re.compile(r"^([!\"#$%&'()*+,./:;<=>?@\[\]^_`{|}~-])\1*$")


def is_stopword(token: str) -> bool:
    return token.lower() in STOPWORDS


def keep_token(t: str) -> bool:
    """The survival predicate of ``remove_stopwords`` for one token —
    shared with the offset-tracking chain so (token, span) pairs drop
    together (`Stopwords.java:14-39` semantics)."""
    return bool(t) and t.lower() not in STOPWORDS \
        and not _PUNCT_RUN.match(t)


def remove_stopwords(tokens: list[str]) -> list[str]:
    """Drop stopwords (case-insensitive), punctuation runs, and empties."""
    return [t for t in tokens if keep_token(t)]
