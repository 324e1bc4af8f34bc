"""Property-fuzz the query-string compiler (P7) — round 4.

Random ASTs over the documented grammar (AND/OR/NOT/parens, +/-
prefixes, field equality, quoted equality, prefix, fuzzy, numeric
ranges with mixed/unbounded/exclusive bounds, bare default-field
containment, and analyzed-text term/phrase/prefix/fuzzy) are rendered
to query strings for the engine and INDEPENDENTLY evaluated by a
pure-Python Kleene-logic (three-valued, null-aware) interpreter of the
documented semantics; per-case the matched doc_id sets must be equal.
This gates the compiler's long tail the way the DSL/ES|QL/aggs fuzz
harnesses gate theirs."""

from __future__ import annotations

import random
import re

import pytest

from elasticsearch_nlp_classifier_spark.functions.query_string import (
    compile_query_string,
)

N_CASES = 120
CATS = [f"cat{i}" for i in range(8)]
WORDS = [f"w{i}" for i in range(12)]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _tok(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


# --------------------------------------------------- Kleene combinators

def _k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _k_not(a):
    return None if a is None else (not a)


# ------------------------------------------------------------ AST

def _gen_leaf(rng: random.Random):
    kind = rng.choice([
        "term_eq", "term_eq", "quoted_eq", "prefix", "fuzzy", "range",
        "bare", "text_term", "text_term", "text_phrase", "text_prefix",
        "text_fuzzy",
    ])
    if kind in ("term_eq", "quoted_eq", "bare"):
        v = rng.choice(CATS + ["nosuch"])
        return (kind, v)
    if kind == "prefix":
        return (kind, rng.choice(["cat", "cat1", "x"]))
    if kind == "fuzzy":
        return (kind, rng.choice(CATS), rng.choice([1, 2, None]))
    if kind == "range":
        lo = rng.choice([None, rng.randint(0, 400)])
        hi = rng.choice([None, rng.randint(100, 600)])
        return (kind, lo, hi, rng.random() < 0.5, rng.random() < 0.5)
    if kind == "text_term":
        return (kind, rng.choice(WORDS + ["nosuchword"]),
                rng.random() < 0.25)  # optional ignored ^boost
    if kind == "text_phrase":
        n = rng.randint(2, 3)
        return (kind, [rng.choice(WORDS) for _ in range(n)])
    if kind == "text_prefix":
        return (kind, rng.choice(["w", "w1", "zz"]))
    return ("text_fuzzy", rng.choice(WORDS), rng.choice([1, 2]))


def _gen_ast(rng: random.Random, depth=0):
    r = rng.random()
    if depth < 3 and r < 0.45:
        op = rng.choice(["and", "and", "or", "or", "not"])
        if op == "not":
            return ("not", _gen_ast(rng, depth + 1))
        return (op, _gen_ast(rng, depth + 1), _gen_ast(rng, depth + 1),
                rng.random() < 0.5)  # explicit keyword vs juxtaposition
    leaf = _gen_leaf(rng)
    r2 = rng.random()
    if r2 < 0.12 and leaf[0] in ("term_eq", "bare", "text_term"):
        return ("prohibit", leaf)
    if r2 < 0.2 and leaf[0] in ("term_eq", "bare", "text_term"):
        return ("require", leaf)
    return leaf


def _render(ast) -> str:
    k = ast[0]
    if k == "and":
        joiner = " AND " if ast[3] else " "
        return f"({_render(ast[1])}{joiner}{_render(ast[2])})"
    if k == "or":
        return f"({_render(ast[1])} OR {_render(ast[2])})"
    if k == "not":
        return f"NOT ({_render(ast[1])})"
    if k == "prohibit":
        return "-" + _render(ast[1])
    if k == "require":
        return "+" + _render(ast[1])
    if k == "term_eq":
        return f"cat:{ast[1]}"
    if k == "quoted_eq":
        return f'cat:"{ast[1]}"'
    if k == "prefix":
        return f"cat:{ast[1]}*"
    if k == "fuzzy":
        return f"cat:{ast[1]}~{'' if ast[2] is None else ast[2]}"
    if k == "range":
        _, lo, hi, lo_inc, hi_inc = ast
        lo_s = "*" if lo is None else str(lo)
        hi_s = "*" if hi is None else str(hi)
        return (f"n:{'[' if lo_inc else '{'}{lo_s} TO {hi_s}"
                f"{']' if hi_inc else '}'}")
    if k == "bare":
        return ast[1]
    if k == "text_term":
        return f"text:{ast[1]}" + ("^2" if ast[2] else "")
    if k == "text_phrase":
        return 'text:"' + " ".join(ast[1]) + '"'
    if k == "text_prefix":
        return f"text:{ast[1]}*"
    if k == "text_fuzzy":
        return f"text:{ast[1]}~{ast[2]}"
    raise AssertionError(k)


def _eval(ast, row):
    """Three-valued evaluation of one AST over one row, per the
    compiler's documented null/ANSI semantics."""
    cat, n, text = row["cat"], row["n"], row["text"]
    # the engine's analyze() coalesces null text to '' (pinned by the
    # plan: lower(coalesce(text, ''))), so every analyzed-text op sees
    # an EMPTY token list for null text — False, never unknown
    toks = _tok(text) if text is not None else []
    k = ast[0]
    if k == "and":
        return _k_and(_eval(ast[1], row), _eval(ast[2], row))
    if k == "or":
        return _k_or(_eval(ast[1], row), _eval(ast[2], row))
    if k in ("not", "prohibit"):
        return _k_not(_eval(ast[1], row))
    if k == "require":
        return _eval(ast[1], row)
    if k in ("term_eq", "quoted_eq"):
        return None if cat is None else cat == ast[1]
    if k == "prefix":
        return None if cat is None else cat.startswith(ast[1])
    if k == "fuzzy":
        nmax = 2 if ast[2] is None else ast[2]
        return None if cat is None else _lev(cat, ast[1]) <= nmax
    if k == "range":
        _, lo, hi, lo_inc, hi_inc = ast
        if lo is None and hi is None:
            return n is not None
        if n is None:
            return None
        ok = True
        if lo is not None:
            ok = ok and (n >= lo if lo_inc else n > lo)
        if hi is not None:
            ok = ok and (n <= hi if hi_inc else n < hi)
        return ok
    if k == "bare":
        return None if cat is None else ast[1] in cat
    if k == "text_term":
        return ast[1].lower() in toks
    if k == "text_phrase":
        phrase = [t for w in ast[1] for t in _tok(w)]
        np_ = len(phrase)
        return any(toks[i:i + np_] == phrase
                   for i in range(len(toks) - np_ + 1))
    if k == "text_prefix":
        p = ast[1].lower()
        return any(t.startswith(p) for t in toks)
    if k == "text_fuzzy":
        return any(_lev(t, ast[1].lower()) <= ast[2] for t in toks)
    raise AssertionError(k)


@pytest.fixture(scope="module")
def qs_frame(spark):
    rng = random.Random(40404)
    rows = []
    for i in range(400):
        cat = None if rng.random() < 0.06 else rng.choice(CATS)
        n = None if rng.random() < 0.06 else rng.randint(0, 600)
        text = None if rng.random() < 0.06 else " ".join(
            rng.choice(WORDS) for _ in range(rng.randint(3, 9)))
        rows.append((i, cat, n, text))
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, cat string, n bigint, text string"
    ).cache()
    sdf.count()
    return sdf, rows


def test_fuzz_query_string_vs_python_reference(spark, qs_frame):
    sdf, rows = qs_frame
    keys = ("doc_id", "cat", "n", "text")
    dict_rows = [dict(zip(keys, r)) for r in rows]
    rng = random.Random(777123)
    mismatches = []
    nonempty = 0
    for i in range(N_CASES):
        ast = _gen_ast(rng)
        qs = _render(ast)
        cond = compile_query_string(
            qs, default_field="cat", text_fields={"text"},
            analyzer="simple_code",
        )
        got = {r["doc_id"] for r in
               sdf.where(cond).select("doc_id").collect()}
        want = {r["doc_id"] for r in dict_rows
                if _eval(ast, r) is True}
        nonempty += bool(want)
        if got != want:
            mismatches.append((i, qs, sorted(got ^ want)[:10]))
    assert not mismatches, (
        f"{len(mismatches)}/{N_CASES} query_string mismatches; "
        f"first: {mismatches[0]}"
    )
    assert nonempty >= N_CASES // 2, nonempty
