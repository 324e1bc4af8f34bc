"""Twitter-aware tokenizer — Python re-expression of the TweetMotif
"twokenize" protocol used by the reference
(`src/main/java/vendor/twittertokenizer/Twokenizer.java`, itself a port of
the Apache-2.0 twokenize; the algorithm is public).

Protocol: squeeze whitespace -> pad edge punctuation with spaces -> find
"protected" spans (emoticons, URLs, entities, times, decimals,
comma-numbers, punctuation runs, abbreviations, separators, decorations,
embedded apostrophes) -> split the unprotected gaps on spaces -> re-zip ->
split trailing contractions (n't 've 'll 'd 're 's 'm) -> drop empties.
"""

from __future__ import annotations

import re

_CONTRACTIONS = re.compile(r"(?i)^(\w+)(n't|'ve|'ll|'d|'re|'s|'m)$")
_WHITESPACE = re.compile(r"\s+")

_punct_chars = "['“\".?!,:;]"
_punct_seq = _punct_chars + "+"
_entity = "&(amp|lt|gt|quot);"

# URLs
_url_start1 = r"(https?://|www\.)"
_common_tlds = r"(com|co\.uk|org|net|info|ca|ly)"
_url_start2 = r"[A-Za-z0-9\.-]+?\." + _common_tlds + r"(?=[/ \W])"
_url_body = r"[^ \t\r\n<>]*?"
_url_extra_crap_before_end = "(" + _punct_chars + "|" + _entity + ")+?"
_url_end = r"(\.\.+|[<>]|\s|$)"
_url = (
    r"\b(" + _url_start1 + "|" + _url_start2 + ")" + _url_body
    + "(?=(" + _url_extra_crap_before_end + ")?" + _url_end + ")"
)

# Numeric
_time_like = r"\d+:\d+"
_num_num = r"\d+\.\d+"
_number_with_commas = r"(\d+,)+?\d{3}(?=([^,]|$))"

# Edge punctuation (smart quotes etc.)
_edge_punct_chars = "'\"“”‘’<>«»{}\\(\\)\\[\\]"
_edge_punct = "[" + _edge_punct_chars + "]"
_not_edge_punct = "[a-zA-Z0-9]"
_EDGE_PUNCT_LEFT = re.compile(r"(\s|^)(" + _edge_punct + "+)(" + _not_edge_punct + ")")
_EDGE_PUNCT_RIGHT = re.compile("(" + _not_edge_punct + ")(" + _edge_punct + r"+)(\s|$)")

# Abbreviations
_boundary_not_dot = "($|\\s|[“\"?!,:;]|" + _entity + ")"
_aa1 = r"([A-Za-z]\.){2,}(?=" + _boundary_not_dot + ")"
_aa2 = r"[^A-Za-z]([A-Za-z]\.){1,}[A-Za-z](?=" + _boundary_not_dot + ")"
_standard_abbreviations = r"\b([Mm]r|[Mm]rs|[Mm]s|[Dd]r|[Ss]r|[Jj]r|[Rr]ep|[Ss]en|[Ss]t)\."
_arbitrary_abbrev = "(" + _aa1 + "|" + _aa2 + "|" + _standard_abbreviations + ")"

_separators = "(--+|―)"
_decorations = "[♫]+"
_things_that_split_words = r"[^\s\.,]"
_embedded_apostrophe = _things_that_split_words + "+'" + _things_that_split_words + "+"

# Emoticons
_normal_eyes = "[:=]"
_wink = "[;]"
_nose_area = "(|o|O|-)"
_happy_mouths = r"[D\)\]]"
_sad_mouths = r"[\(\[]"
_tongue = "[pP]"
_other_mouths = r"[doO/\\]"
_emoticon = (
    "(" + _normal_eyes + "|" + _wink + ")" + _nose_area
    + "(" + _tongue + "|" + _other_mouths + "|" + _sad_mouths + "|" + _happy_mouths + ")"
)

_PROTECTED = re.compile(
    "("
    + _emoticon + "|"
    + _url + "|"
    + _entity + "|"
    + _time_like + "|"
    + _num_num + "|"
    + _number_with_commas + "|"
    + _punct_seq + "|"
    + _arbitrary_abbrev + "|"
    + _separators + "|"
    + _decorations + "|"
    + _embedded_apostrophe
    + ")"
)


def _split_edge_punct(text: str) -> str:
    text = _EDGE_PUNCT_LEFT.sub(r"\1\2 \3", text)
    return _EDGE_PUNCT_RIGHT.sub(r"\1 \2\3", text)


def _split_token(token: str) -> list[str]:
    m = _CONTRACTIONS.match(token)
    if m:
        return [m.group(1).strip(), m.group(2).strip()]
    return [token.strip()]


def twokenize(text: str) -> list[str]:
    """Tokenize ``text`` per the twokenize protocol."""
    text = _WHITESPACE.sub(" ", text).strip()
    text = _split_edge_punct(text)
    n = len(text)

    # Protected ("bad") spans must not be split further.
    bad_spans: list[tuple[int, int]] = [
        m.span() for m in _PROTECTED.finditer(text) if m.start() != m.end()
    ]

    # Gap ("good") regions between protected spans, split on single spaces.
    indices = [0]
    for s, e in bad_spans:
        indices.append(s)
        indices.append(e)
    indices.append(n)

    zipped: list[str] = []
    n_goods = len(indices) // 2
    for i in range(n_goods):
        good = text[indices[2 * i]: indices[2 * i + 1]]
        zipped.extend(good.strip().split(" "))
        if i < len(bad_spans):
            zipped.append(text[bad_spans[i][0]: bad_spans[i][1]])

    out: list[str] = []
    for token in zipped:
        for t in _split_token(token):
            if t:
                out.append(t)
    return out
