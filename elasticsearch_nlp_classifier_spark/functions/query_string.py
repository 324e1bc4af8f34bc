"""Lucene query-string mini-language -> Column compiler (P7).

The reference forwards a user-supplied condition string to ES's
``queryStringQuery`` (`v2/datasets/ElasticsearchDataset.java:31-33`).
Grammar we support (SURVEY §7.3 — deliberately restricted):

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := unary (AND unary)*          # bare juxtaposition = AND
    unary    := NOT unary | primary
    primary  := '(' expr ')' | field ':' value | value
    value    := quoted phrase | bare term (with trailing * wildcard)

Semantics: ``field:value`` is an equality test (termQuery, P4);
``field:"a phrase"`` a phrase equality; ``field:pre*`` a prefix match;
a bare term (no field) matches the default field via substring
containment.  Produces a single Catalyst Column — fully pushdown- and
codegen-friendly (no UDFs).
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
        (?P<word>[^\s()"]+)
    )""",
    re.VERBOSE,
)


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
    def __init__(self, tokens: list[str], default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

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
        if self.peek() == "NOT":
            self.next()
            return ~self.unary()
        return self.primary()

    def primary(self) -> Column:
        t = self.next()
        if t == "(":
            col = self.or_expr()
            if self.next() != ")":
                raise QueryStringError("expected ')'")
            return col
        if ":" in t and not t.startswith('"'):
            field, _, value = t.partition(":")
            if value == "" and self.peek() and self.peek().startswith('"'):
                value = self.next()
            return self._match(field, value)
        return self._match(self.default_field, t, contains=True)

    def _match(self, field: str, value: str, contains: bool = False) -> Column:
        if value.startswith('"') and value.endswith('"'):
            return F.col(field) == F.lit(value[1:-1])
        if value.endswith("*"):
            return F.col(field).cast("string").startswith(value[:-1])
        if contains:
            return F.col(field).contains(value)
        return F.col(field) == F.lit(value)


def compile_query_string(s: str, default_field: str = "content") -> Column:
    """Compile a query-string condition into a boolean Column.

    ``matchAllQuery`` (P8) is the empty string -> lit(True)."""
    tokens = _lex(s)
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, default_field).parse()
