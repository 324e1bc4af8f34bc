"""Lucene query-string mini-language -> Column compiler (P7).

The reference forwards a user-supplied condition string to ES's
``queryStringQuery`` (`v2/datasets/ElasticsearchDataset.java:31-33`).
Grammar we support (SURVEY §7.3 — deliberately restricted):

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := unary (AND unary)*          # bare juxtaposition = AND
    unary    := NOT unary | '+' unary | '-' unary | primary
    primary  := '(' expr ')' | field ':' value | field ':' range | value
    range    := ('[' | '{') bound TO bound (']' | '}')
    value    := quoted phrase | bare term
                  [trailing * wildcard] [~n fuzzy] [^n boost]

Semantics: ``field:value`` is an equality test (termQuery, P4);
``field:"a phrase"`` a phrase equality; ``field:pre*`` a prefix match;
``field:[a TO b]`` / ``{a TO b}`` an inclusive/exclusive range
(numeric bounds compare numerically, ``*`` = unbounded);
``field:term~1`` a fuzzy match (``levenshtein`` ≤ n); ``-term`` is
Lucene's prohibit operator (NOT), ``+term`` its require operator
(plain AND here — every clause is required in filter context).  A
``^boost`` suffix is parsed and *ignored*: boosts only affect ranked
scoring, and this compiler produces a boolean filter (the ranked path
is ``query/bm25.py``/``query/wand.py``).  A bare term (no field)
matches the default field via substring containment.  Produces a
single Catalyst Column — fully pushdown- and codegen-friendly (no
UDFs).

**Analyzed text fields** (``text_fields=...``): ES analyzes both sides
for text-mapped fields — the reference's ``termQuery("text",
"disaster")`` matches the *analyzed token* inside the field
(`ScanAndScrollIteratorTest.java:20`, `ElasticsearchDataset.java:42`),
not the raw string.  Fields listed in ``text_fields`` compile to
token-level predicates over ``analyze(field)``:

- ``text:disaster``   → ``array_contains(analyze(text), 'disaster')``
  (multi-token values OR their tokens, ES default_operator behavior)
- ``text:"a phrase"`` → consecutive-subsequence match of the analyzed
  phrase tokens (positions via the token array itself)
- ``text:pre*``       → any analyzed token with the (lowercased) prefix

All still pure Catalyst expressions (JVM analyzers stay in codegen).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"[^"]*") |
        (?P<range>[^\s()":]+:[\[{][^\]}]*[\]}]) |
        (?P<word>[^\s()"]+)
    )""",
    re.VERBOSE,
)

_RANGE = re.compile(r"^(?P<f>[^:]+):(?P<open>[\[{])(?P<body>.*)(?P<close>[\]}])$")
_FUZZY = re.compile(r"^(?P<t>.+?)~(?P<n>\d?)$")
_BOOST = re.compile(r"^(?P<t>.+?)\^\d+(\.\d+)?$")


class QueryStringError(ValueError):
    pass


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise QueryStringError(f"cannot lex at: {s[pos:]!r}")
            break
        pos = m.end()
        out.append(m.group().strip())
    return out


class _Parser:
    def __init__(
        self,
        tokens: list[str],
        default_field: str,
        text_fields: set[str] | None = None,
        analyzer: str = "simple_code",
    ):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.text_fields = text_fields or set()
        self.analyzer = analyzer

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise QueryStringError("unexpected end of query string")
        self.i += 1
        return t

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise QueryStringError(f"trailing tokens at {self.peek()!r}")
        return col

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.peek() == "OR":
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.unary()
        while self.peek() not in (None, "OR", ")"):
            if self.peek() == "AND":
                self.next()
            left = left & self.unary()
        return left

    def unary(self) -> Column:
        t = self.peek()
        if t == "NOT":
            self.next()
            return ~self.unary()
        # Lucene require/prohibit prefix operators
        if t is not None and len(t) > 1 and t[0] in "+-" and t not in ("(", ")"):
            self.toks[self.i] = t[1:]
            inner = self.unary()
            return ~inner if t[0] == "-" else inner
        return self.primary()

    def primary(self) -> Column:
        t = self.next()
        if t == "(":
            col = self.or_expr()
            if self.next() != ")":
                raise QueryStringError("expected ')'")
            return col
        m = _RANGE.match(t)
        if m:
            return self._range(
                m["f"], m["body"], m["open"] == "[", m["close"] == "]"
            )
        if ":" in t and not t.startswith('"'):
            field, _, value = t.partition(":")
            if value == "" and self.peek() and self.peek().startswith('"'):
                value = self.next()
            return self._match(field, value)
        return self._match(self.default_field, t, contains=True)

    def _range(
        self, field: str, body: str, lo_inc: bool, hi_inc: bool
    ) -> Column:
        parts = re.split(r"\s+TO\s+", body.strip())
        if len(parts) != 2:
            raise QueryStringError(f"malformed range: {body!r}")
        lo_s, hi_s = parts

        def bound(s: str):
            if s == "*":
                return None
            try:
                return float(s) if "." in s else int(s)
            except ValueError:
                return s  # lexicographic bound

        lo, hi = bound(lo_s), bound(hi_s)
        c = F.col(field)
        conds = []
        if lo is not None:
            conds.append(c >= F.lit(lo) if lo_inc else c > F.lit(lo))
        if hi is not None:
            conds.append(c <= F.lit(hi) if hi_inc else c < F.lit(hi))
        if not conds:
            return c.isNotNull()  # [* TO *]: exists
        out = conds[0]
        for extra in conds[1:]:
            out = out & extra
        return out

    def _match(self, field: str, value: str, contains: bool = False) -> Column:
        b = _BOOST.match(value)
        if b and not value.startswith('"'):
            value = b["t"]  # boost parsed, ignored in filter context
        if field in self.text_fields:
            return self._match_analyzed(field, value)
        if value.startswith('"') and value.endswith('"'):
            return F.col(field) == F.lit(value[1:-1])
        fz = _FUZZY.match(value)
        if fz:
            n = int(fz["n"] or 2)
            return (
                F.levenshtein(F.col(field).cast("string"), F.lit(fz["t"]))
                <= n
            )
        if value.endswith("*"):
            return F.col(field).cast("string").startswith(value[:-1])
        if contains:
            return F.col(field).contains(value)
        return F.col(field) == F.lit(value)

    def _match_analyzed(self, field: str, value: str) -> Column:
        from ..analyzer.chain import get_analyzer
        from ..analyzer.spark_udfs import analyze

        toks_col = analyze(field, self.analyzer)
        fz = _FUZZY.match(value) if not value.startswith('"') else None
        if fz:
            n = int(fz["n"] or 2)
            probe = fz["t"].lower()
            return F.exists(
                toks_col,
                lambda t: F.levenshtein(t, F.lit(probe)) <= n,
            )
        if value.startswith('"') and value.endswith('"'):
            phrase = get_analyzer(self.analyzer).tokenize(value[1:-1])
            if not phrase:
                return F.lit(False)
            if len(phrase) == 1:
                return F.array_contains(toks_col, phrase[0])
            n = len(phrase)
            lit_phrase = F.array(*[F.lit(t) for t in phrase])
            # any 1-based start i whose n-token slice equals the phrase
            starts = F.when(
                F.size(toks_col) >= n,
                F.sequence(F.lit(1), F.size(toks_col) - n + 1),
            ).otherwise(F.array().cast("array<int>"))
            return F.exists(
                starts, lambda i: F.slice(toks_col, i, n) == lit_phrase
            )
        if value.endswith("*"):
            prefix = value[:-1].lower()
            return F.exists(toks_col, lambda t: t.startswith(prefix))
        q_toks = get_analyzer(self.analyzer).tokenize(value)
        if not q_toks:
            return F.lit(False)
        cond = F.array_contains(toks_col, q_toks[0])
        for t in q_toks[1:]:
            cond = cond | F.array_contains(toks_col, t)
        return cond


def compile_query_string(
    s: str,
    default_field: str = "content",
    text_fields: set[str] | None = None,
    analyzer: str = "simple_code",
) -> Column:
    """Compile a query-string condition into a boolean Column.

    ``matchAllQuery`` (P8) is the empty string -> lit(True).
    ``text_fields`` marks fields with analyzed-term (ES text-mapping)
    semantics — see module docstring."""
    tokens = _lex(s)
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, default_field, text_fields, analyzer).parse()
