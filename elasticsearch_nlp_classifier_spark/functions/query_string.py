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


# ---------------------------------------------------------------------------
# simple_query_string — ES's fault-tolerant user-facing grammar
# ---------------------------------------------------------------------------

_SQS_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<or>\|) |
        (?P<and>\+) |
        (?P<quoted>-?"[^"]*"(?:~\d+)?) |
        (?P<word>[^\s()|+]+)
    )""",
    re.VERBOSE,
)


def _sqs_lex(s: str) -> list[str]:
    """Lenient lexer: anything unlexable is skipped (never raises —
    the defining contract of ``simple_query_string`` vs ``query_string``).
    An unterminated quote swallows the rest of the input as a phrase,
    matching Lucene ``SimpleQueryParser``'s consume-to-EOF behavior."""
    out, pos = [], 0
    while pos < len(s):
        if s[pos] == '"' and s.find('"', pos + 1) == -1:
            body = s[pos + 1:].strip()
            if body:
                out.append('"' + body + '"')
            break
        m = _SQS_TOKEN.match(s, pos)
        if not m or m.end() == pos:
            pos += 1  # skip the offending char, keep going
            continue
        pos = m.end()
        out.append(m.group().strip())
    return out


class _SimpleParser:
    """ES ``simple_query_string`` (Lucene ``SimpleQueryParser``) over a
    list of fields.  Grammar (all operators optional, input never
    rejected):

        query   := or_expr
        or_expr := and_expr ('|' and_expr)*
        and_expr:= unary (('+' | juxtaposition) unary)*
        unary   := '-' unary | primary
        primary := '(' query ')' | '"phrase"'[~slop] | term['*'][~fuzz]

    Juxtaposition (whitespace) combines with ``default_operator``
    (ES default: OR).  ``+`` is AND and binds tighter than ``|``.
    A clause matches a document when it matches ANY of ``fields``
    (ES's per-field dis_max, collapsed to boolean in filter context).
    ``"a b"~n`` is phrase slop: the analyzed tokens in order within a
    window of ``len + n`` positions (anchored-greedy chain — exact for
    existence).  Everything compiles to one Catalyst expression tree.
    """

    def __init__(
        self,
        tokens: list[str],
        fields: list[str],
        text_fields: set[str] | None,
        analyzer: str,
        default_operator: str,
    ):
        self.toks = tokens
        self.i = 0
        self.fields = fields
        self.default_and = default_operator.lower() == "and"
        # reuse the query_string matchers for per-field clause tests
        self._m = _Parser([], fields[0], text_fields, analyzer)
        from ..analyzer.chain import get_analyzer

        self._tokenize = get_analyzer(analyzer).tokenize
        self.analyzer = analyzer

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Column:
        col = self.or_expr()
        while self.peek() is not None:  # stray ')' etc.: lenient skip
            self.next()
            nxt = self.or_expr()
            col = col if nxt is None else (
                nxt if col is None else col | nxt
            )
        return F.lit(True) if col is None else col

    def or_expr(self) -> Column | None:
        left = self.and_expr()
        while self.peek() == "|":
            self.next()
            right = self.and_expr()
            if right is not None:
                left = right if left is None else left | right
        return left

    def and_expr(self) -> Column | None:
        left = None
        explicit_and = False
        while self.peek() not in (None, "|", ")"):
            if self.peek() == "+":
                self.next()
                explicit_and = True
                continue
            clause = self.unary()
            if clause is None:
                continue
            if left is None:
                left = clause
            elif explicit_and or self.default_and:
                left = left & clause
            else:
                left = left | clause
            explicit_and = False
        return left

    def unary(self) -> Column | None:
        t = self.peek()
        if t == "(":
            self.next()
            inner = self.or_expr()
            if self.peek() == ")":
                self.next()
            return inner
        if t is not None and len(t) > 1 and t[0] == "-" and not t.startswith('"'):
            self.toks[self.i] = t[1:]
            inner = self.unary()
            return None if inner is None else ~inner
        return self.clause(self.next())

    def clause(self, t: str) -> Column | None:
        if t in ("(", ")", "|", "+", "-"):
            return None  # bare operator with nothing to apply to
        slop = 0
        if t.startswith('"'):
            m = re.match(r'^(".*")~(\d+)$', t, re.DOTALL)
            if m:
                t, slop = m.group(1), int(m.group(2))
        cols = [self._field_clause(f, t, slop) for f in self.fields]
        cols = [c for c in cols if c is not None]
        if not cols:
            return None
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out

    def _field_clause(self, field: str, value: str, slop: int) -> Column | None:
        if (
            slop > 0
            and field in self._m.text_fields
            and value.startswith('"')
            and value.endswith('"')
        ):
            toks = self._tokenize(value[1:-1])
            if not toks:
                return None
            if len(toks) == 1:
                from ..analyzer.spark_udfs import analyze

                return F.array_contains(analyze(field, self.analyzer), toks[0])
            return _sloppy_phrase(field, toks, slop, self.analyzer)
        return self._m._match(field, value, contains=False)


def _sloppy_phrase(
    field: str, toks: list[str], slop: int, analyzer: str
) -> Column:
    """Ordered sloppy-phrase test over the analyzed token array: does an
    in-order occurrence of ``toks`` exist with window width at most
    ``len(toks) + slop``?  Anchored-greedy chain — anchor at each
    occurrence of the first token, then repeatedly take each next
    token's earliest position strictly after the previous one; greedy
    minimizes the end position, so existence is decided exactly.  Pure
    JVM higher-order expressions (zero UDF)."""
    from ..analyzer.spark_udfs import analyze

    w = analyze(field, analyzer)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)))

    def pos_of(tok: str):  # 1-based positions of tok in w
        return F.filter(idx, lambda i: F.element_at(w, i) == F.lit(tok))

    def chain(p, remaining: list[str]):
        if not remaining:
            return p
        nxt = F.array_min(F.filter(pos_of(remaining[0]), lambda q: q > p))
        return chain(nxt, remaining[1:])

    budget = F.lit(len(toks) + slop - 1)
    anchors = pos_of(toks[0])
    end = lambda p: chain(p, toks[1:])  # noqa: E731
    return F.exists(
        anchors,
        lambda p: end(p).isNotNull() & (end(p) - p <= budget),
    )


def compile_simple_query_string(
    s: str,
    fields: list[str] | tuple[str, ...] = ("content",),
    text_fields: set[str] | None = None,
    analyzer: str = "simple_code",
    default_operator: str = "or",
) -> Column:
    """ES ``simple_query_string``: the end-user-safe query grammar
    (``+ | - "..." * ~N ( )``) that NEVER raises on malformed input —
    bad syntax degrades to terms or is skipped, exactly the property ES
    guarantees so that raw user text can be passed through.  Matches
    any of ``fields``; fields in ``text_fields`` use analyzed-token
    semantics (tokens, phrases, prefixes, fuzzy — see ``_Parser``).

    Reference surface: the same `RestHighLevelClient` the reference
    hands its users (`utils/elasticsearch/ESClient.java`)
    exposes `QueryBuilders.simpleQueryStringQuery`; this is that query
    re-expressed as one Catalyst boolean expression (codegen-friendly,
    no UDFs).  Empty/blank input = match-all, like ES.
    """
    tokens = _sqs_lex(s)
    if not tokens:
        return F.lit(True)
    return _SimpleParser(
        tokens, list(fields), text_fields, analyzer, default_operator
    ).parse()


def compile_wrapper_query(
    b64: str,
    default_field: str = "content",
    text_fields: set[str] | None = None,
    analyzer: str = "simple_code",
) -> Column:
    """ES ``wrapper`` query: a base64-encoded query smuggled through
    typed client APIs (`QueryBuilders.wrapperQuery` on the reference's
    stock client).  ES wraps raw query-DSL JSON; this engine's textual
    query form is the query string, so the payload is a base64
    query-string — decoded and compiled through
    :func:`compile_query_string` unchanged."""
    import base64

    s = base64.b64decode(b64.encode("ascii")).decode("utf-8")
    return compile_query_string(s, default_field, text_fields, analyzer)
