"""Porter2 (Snowball English) stemmer — pure-Python, loop-free per token.

Re-implements the published Snowball "english" algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), the same
algorithm OpenNLP's ``SnowballStemmer(ENGLISH)`` runs in the reference
(`utils/tokenize/NLPTokenizer.java:18,115-121`).  Parity goldens from the
reference tests (`NLPTokenizerTest.java:27-43`,
`JsonDocumentStreamTest.java:50-58`): earthquakes->earthquak,
different->differ, cities->citi, everyone->everyon, burning->burn,
ablaze->ablaz, goodbye->goodby, pineapple->pineappl, apple->appl.

For Spark use, :func:`stem` is wrapped in a per-batch memo cache
(:func:`stem_cached`) inside the analyzer pandas UDF — token frequency is
Zipfian, so the cache hit rate is very high and the per-batch cost is
amortized to near-zero for common tokens.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # marked consonant-y is uppercase 'Y'
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [  # (suffix, replacement, required-preceding-char-set or None)
    ("ization", "ize", None), ("ational", "ate", None),
    ("ousness", "ous", None), ("iveness", "ive", None),
    ("fulness", "ful", None), ("biliti", "ble", None),
    ("lessli", "less", None), ("tional", "tion", None),
    ("entli", "ent", None), ("ation", "ate", None), ("alism", "al", None),
    ("aliti", "al", None), ("ousli", "ous", None), ("iviti", "ive", None),
    ("fulli", "ful", None), ("enci", "ence", None), ("anci", "ance", None),
    ("abli", "able", None), ("izer", "ize", None), ("ator", "ate", None),
    ("alli", "al", None), ("bli", "ble", None),
    ("ogi", "og", frozenset("l")), ("li", "", _LI_ENDING),
]

_STEP3 = [  # (suffix, replacement, needs_r2)
    ("ational", "ate", False), ("tional", "tion", False),
    ("alize", "al", False), ("icate", "ic", False), ("iciti", "ic", False),
    ("ative", "", True), ("ical", "ic", False), ("ness", "", False),
    ("ful", "", False),
]

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _mark_ys(word: str) -> str:
    """Uppercase y's that function as consonants (initial, or after vowel)."""
    chars = list(word)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _VOWELS):
            chars[i] = "Y"
    return "".join(chars)


def _r1_r2(word: str) -> tuple[int, int]:
    """Start offsets of regions R1 and R2 (len(word) when absent)."""
    n = len(word)
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 6 if word.startswith("commun") else 5
    else:
        r1 = n
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
            and word[-3] not in _VOWELS
        )
    return False


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem(word: str) -> str:
    """Porter2 stem of a (typically lowercase) token."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    word = _mark_ys(word)
    r1, r2 = _r1_r2(word)

    # --- Step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # --- Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _has_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # --- Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # --- Step 1c: y/Y -> i if preceded by non-vowel which is not first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # --- Step 2 (suffix must lie in R1)
    for suf, repl, prev in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if prev is None or (
                    len(word) > len(suf)
                    and word[-len(suf) - 1] in prev
                ):
                    word = word[: -len(suf)] + repl
            break

    # --- Step 3 (suffix in R1; 'ative' additionally in R2)
    for suf, repl, needs_r2 in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if not needs_r2 or len(word) - len(suf) >= r2:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 4 (suffix in R2; 'ion' needs preceding s/t)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf != "ion" or (
                    len(word) > 3 and word[-4] in "st"
                ):
                    word = word[: -len(suf)]
            break

    # --- Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    """Memoized :func:`stem` — effective under Zipfian token distributions."""
    out = _CACHE.get(word)
    if out is None:
        out = stem(word)
        if len(_CACHE) < 1_000_000:
            _CACHE[word] = out
    return out
