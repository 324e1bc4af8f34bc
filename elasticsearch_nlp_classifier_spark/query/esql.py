"""ES|QL → DataFrame compiler.

ES|QL (`POST /_query`, ES 8.11+) is Elasticsearch's piped query
language — the successor surface to the query DSL the reference drives
through its `RestHighLevelClient`
(`utils/elasticsearch/ESClient.java`); a migrating user's
dashboards and alert rules are written in it:

    FROM events
    | WHERE event_type == "click" AND value > 0
    | EVAL day = DATE_TRUNC(1 day, ts)
    | STATS n = COUNT(*), total = SUM(value) BY day, user_id
    | SORT total DESC
    | LIMIT 10

This module is a recursive-descent compiler from that language to a
*logical DataFrame plan* — every command maps to declarative Spark
operations (``filter`` / ``withColumn`` / ``groupBy().agg`` / ``join``
/ ``orderBy`` / ``limit``), every expression to a Catalyst ``Column``.
There is deliberately **no UDF anywhere**: the compiled plan is 100%
JVM-side, whole-stage-codegen-able, and Catalyst sees through it
(filter pushdown to the parquet scan, column pruning from KEEP/STATS,
broadcast for ENRICH).  At 100 TB the compiled query behaves exactly
like the hand-written DataFrame program — the compiler adds zero
runtime cost.

Supported commands (the practical core of the language):

- source:      ``FROM idx[, idx2]`` (union by name), ``ROW a = 1, ...``
- filtering:   ``WHERE <expr>``
- projection:  ``EVAL c = <expr>, ...``, ``KEEP c1, c2``, ``DROP c``,
               ``RENAME old AS new``
- aggregation: ``STATS [name =] AGG(...) [, ...] [BY [name =] expr, ...]``
               and ``INLINESTATS ...`` (same grammar; aggregates are
               appended as columns, rows survive — executed as a
               broadcast join-back of the aggregated BY groups, so the
               main relation never shuffles)
- shaping:     ``SORT c [ASC|DESC] [NULLS FIRST|LAST]``, ``LIMIT n``,
               ``MV_EXPAND c``
- parsing:     ``DISSECT c "%{a} %{b}"``, ``GROK c "%{WORD:a} ..."``
- lookup:      ``ENRICH policy ON field [WITH f1, f2]`` — broadcast
               left join against a registered enrich table (ES executes
               the same way: the enrich index is replicated to every
               node).
- full text:   ``MATCH(field, "text")`` / ``MATCH_PHRASE(field, "text")``
               / ``QSTR("query string"[, default_field])`` in WHERE —
               both sides run the same JVM analyzer as the index build,
               so query-time and index-time terms agree by construction.
- analysis:    ``CHANGE_POINT value ON key [AS type_name, stat_name]``
               (mean-shift detection over the piped series; emits the
               replayable Welch-t statistic, not ES's ml p-value) and
               ``FORK (branch) (branch) ...`` (each parenthesized
               sub-pipeline runs over the incoming relation; results
               union by name with a ``_fork`` discriminator).

Expression surface: arithmetic, comparison, ``AND/OR/NOT``, ``IN``,
``LIKE`` (ES|QL wildcard ``*``/``?``), ``RLIKE``, ``IS [NOT] NULL``,
``::type`` casts, duration literals (``1 hour``), ``CASE``, and the
scalar / multivalue / date / aggregate function tables below.

Scale notes: STATS is one hash aggregation (partial map-side combine
for all listed aggs except the exact MEDIAN/PERCENTILE family); SORT
is a global sort — ES|QL itself bounds result shaping the same way
(its SORT requires a following LIMIT for large results, and so should
callers here); ENRICH broadcasts the policy table, matching ES's
replicated enrich-index execution.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["esql", "EsqlError"]


class EsqlError(ValueError):
    """Parse or compile error, with position context."""


#: analyzer for the full-text functions (MATCH / MATCH_PHRASE / QSTR):
#: the engine's default code-text chain, JVM-expressed end-to-end
#: (JVM_TOKEN_EXPRS) so the compiled plan stays UDF-free.
_TEXT_ANALYZER = "simple_code"


# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<op>::|==|!=|<=|>=|=~|->|[|,()\[\]<>=+\-*/%.])
  | (?P<ident>`[^`]+`|[A-Za-z_@][A-Za-z0-9_.*@]*)
    """,
    re.VERBOSE,
)

_DURATION_UNITS = {
    "millisecond": "milliseconds", "milliseconds": "milliseconds", "ms": "milliseconds",
    "second": "seconds", "seconds": "seconds", "sec": "seconds", "s": "seconds",
    "minute": "minutes", "minutes": "minutes", "min": "minutes",
    "hour": "hours", "hours": "hours", "h": "hours",
    "day": "days", "days": "days", "d": "days",
    "week": "weeks", "weeks": "weeks", "w": "weeks",
    "month": "months", "months": "months", "mo": "months",
    "year": "years", "years": "years", "y": "years",
}

_DURATION_SECONDS = {
    "milliseconds": 0.001, "seconds": 1, "minutes": 60, "hours": 3600,
    "days": 86400, "weeks": 604800,
}


class _Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind, self.text = kind, text

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.kind}:{self.text}"


def _lex(s: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise EsqlError(f"ES|QL: cannot tokenize at: {s[i:i+24]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(_Tok(kind, m.group()))
    return toks


def _unquote(t: str) -> str:
    body = t[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t"}.get(m.group(1), m.group(1)), body)


# ----------------------------------------------------- expression parser


class _Expr:
    """Parses one ES|QL expression from a token stream into a Column."""

    def __init__(self, toks: list[_Tok], pos: int = 0, stats: bool = False):
        self.toks, self.i, self.stats = toks, pos, stats

    # --- stream helpers
    def peek(self, off: int = 0) -> _Tok | None:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> _Tok:
        if self.i >= len(self.toks):
            raise EsqlError("ES|QL: unexpected end of expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        t = self.peek()
        if t is not None and t.text.upper() == text.upper():
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> None:
        if not self.accept(text):
            got = self.peek().text if self.peek() else "<end>"
            raise EsqlError(f"ES|QL: expected {text!r}, got {got!r}")

    # --- grammar
    def parse(self) -> Column:
        return self._or()

    def _or(self) -> Column:
        left = self._and()
        while self.accept("OR"):
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self.accept("AND"):
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self.accept("NOT"):
            return ~self._not()
        return self._cmp()

    def _cmp(self) -> Column:
        left = self._add()
        t = self.peek()
        if t is None:
            return left
        op = t.text.upper()
        if op in ("==", "!=", "<", "<=", ">", ">="):
            self.i += 1
            right = self._add()
            return {
                "==": left == right, "!=": left != right,
                "<": left < right, "<=": left <= right,
                ">": left > right, ">=": left >= right,
            }[op]
        if op == "LIKE":
            self.i += 1
            pat = self.next()
            if pat.kind != "str":
                raise EsqlError("ES|QL: LIKE needs a string pattern")
            # ES|QL wildcard: * = any run, ? = one char.
            rx = "(?s)^" + re.escape(_unquote(pat.text)).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            return left.rlike(rx)
        if op == "RLIKE":
            self.i += 1
            pat = self.next()
            if pat.kind != "str":
                raise EsqlError("ES|QL: RLIKE needs a string pattern")
            return left.rlike("^(?:" + _unquote(pat.text) + ")$")
        if op == "IN":
            self.i += 1
            self.expect("(")
            vals = [self._or()]
            while self.accept(","):
                vals.append(self._or())
            self.expect(")")
            return left.isin(*vals)
        if op == "IS":
            self.i += 1
            neg = self.accept("NOT")
            self.expect("NULL")
            return left.isNotNull() if neg else left.isNull()
        return left

    def _add(self) -> Column:
        left = self._mul()
        while True:
            t = self.peek()
            if t is not None and t.text in ("+", "-"):
                self.i += 1
                right = self._mul()
                left = left + right if t.text == "+" else left - right
            else:
                return left

    def _mul(self) -> Column:
        left = self._unary()
        while True:
            t = self.peek()
            if t is not None and t.text in ("*", "/", "%"):
                self.i += 1
                right = self._unary()
                left = {"*": left * right, "/": left / right, "%": left % right}[t.text]
            else:
                return left

    def _unary(self) -> Column:
        if self.accept("-"):
            return -self._unary()
        if self.accept("+"):
            return self._unary()
        return self._postfix()

    def _postfix(self) -> Column:
        c = self._primary()
        while True:
            t = self.peek()
            if t is not None and t.text == "::":
                self.i += 1
                ty = self.next().text.lower()
                c = c.cast({"integer": "int", "keyword": "string", "text": "string",
                            "datetime": "timestamp"}.get(ty, ty))
            else:
                return c

    def _primary(self) -> Column:
        t = self.next()
        if t.text == "(":
            inner = self._or()
            self.expect(")")
            return inner
        if t.kind == "str":
            return _tagged_lit(_unquote(t.text))
        if t.kind == "num":
            # duration literal: NUMBER UNIT  (e.g. "1 hour", "90 minutes")
            nxt = self.peek()
            if nxt is not None and nxt.kind == "ident" and nxt.text.lower() in _DURATION_UNITS:
                unit = _DURATION_UNITS[self.next().text.lower()]
                return F.expr(f"INTERVAL '{t.text}' {unit[:-1]}")
            return _tagged_lit(
                float(t.text) if "." in t.text or "e" in t.text.lower() else int(t.text))
        if t.kind == "ident":
            up = t.text.upper()
            if up == "TRUE":
                return F.lit(True)
            if up == "FALSE":
                return F.lit(False)
            if up == "NULL":
                return F.lit(None)
            nxt = self.peek()
            if nxt is not None and nxt.text == "(":
                return self._call(t.text)
            name = t.text[1:-1] if t.text.startswith("`") else t.text
            return F.col(name)
        raise EsqlError(f"ES|QL: unexpected token {t.text!r}")

    def _args(self) -> list:
        """Call arguments; supports `*` (COUNT(*)) and duration literals."""
        self.expect("(")
        args: list = []
        if self.accept(")"):
            return args
        while True:
            if self.peek() is not None and self.peek().text == "*" and \
                    self.peek(1) is not None and self.peek(1).text in (",", ")"):
                self.i += 1
                args.append("*")
            else:
                args.append(self._or())
            if self.accept(")"):
                return args
            self.expect(",")

    def _call(self, name: str) -> Column:
        fn = name.upper()
        if self.stats and fn in _AGG_NAMES:
            return _agg_fn(fn, self)
        # literal-argument forms handled before generic arg parsing
        if fn in ("DATE_TRUNC", "BUCKET"):
            return self._call_bucketlike(fn)
        if fn == "DATE_FORMAT":
            self.expect("(")
            pat = self.next()
            self.expect(",")
            col = self._or()
            self.expect(")")
            return F.date_format(col, _unquote(pat.text))
        if fn == "DATE_EXTRACT":
            self.expect("(")
            part = self.next()
            self.expect(",")
            col = self._or()
            self.expect(")")
            return _date_extract(_unquote(part.text), col)
        if fn in ("MATCH", "MATCH_PHRASE"):
            # ES|QL full-text functions (8.17+).  MATCH = any analyzed
            # query token appears in the analyzed field (the ES match
            # query's default OR operator); MATCH_PHRASE = the query's
            # token run appears contiguously and in order.  Both sides
            # go through the same JVM tokenizer chain as the index
            # build, so there is no query/index analyzer drift — and no
            # UDF, so the predicate stays inside whole-stage codegen.
            self.expect("(")
            fld = self.next()
            if fld.kind != "ident":
                raise EsqlError(f"ES|QL: {fn} needs a field name")
            self.expect(",")
            q = self.next()
            if q.kind != "str":
                raise EsqlError(f"ES|QL: {fn} needs a quoted query string")
            self.expect(")")
            from ..analyzer.spark_udfs import analyze

            fcol = F.col(fld.text.strip("`"))
            qlit = F.lit(_unquote(q.text))
            if fn == "MATCH":
                return F.arrays_overlap(
                    analyze(fcol, _TEXT_ANALYZER),
                    analyze(qlit, _TEXT_ANALYZER),
                )
            # phrase: compare space-joined token runs with sentinel
            # spaces so token boundaries can't false-match substrings
            # ("rror handl" never matches "error handling").
            hay = F.concat(
                F.lit(" "),
                F.array_join(analyze(fcol, _TEXT_ANALYZER), " "),
                F.lit(" "),
            )
            needle = F.concat(
                F.lit(" "),
                F.array_join(analyze(qlit, _TEXT_ANALYZER), " "),
                F.lit(" "),
            )
            return hay.contains(needle)
        if fn == "QSTR":
            # QSTR("lucene query string"[, default_field]): delegates to
            # the engine's query-string compiler (P7) with the named
            # default field treated as an analyzed text field.
            self.expect("(")
            q = self.next()
            if q.kind != "str":
                raise EsqlError("ES|QL: QSTR needs a quoted query string")
            default_field = "content"
            if self.accept(","):
                d = self.next()
                default_field = (
                    _unquote(d.text) if d.kind == "str"
                    else d.text.strip("`")
                )
            self.expect(")")
            from ..functions.query_string import compile_query_string

            return compile_query_string(
                _unquote(q.text),
                default_field=default_field,
                text_fields={default_field},
                analyzer=_TEXT_ANALYZER,
            )
        args = self._args()
        builder = _FUNCS.get(fn)
        if builder is None:
            raise EsqlError(f"ES|QL: unknown function {name!r}")
        return builder(args)

    def _call_bucketlike(self, fn: str) -> Column:
        """DATE_TRUNC(1 day, ts) / BUCKET(col, width-or-duration)."""
        self.expect("(")
        if fn == "DATE_TRUNC":
            n, unit = self._duration_parts()
            self.expect(",")
            col = self._or()
            self.expect(")")
            if n != 1:
                raise EsqlError("ES|QL: DATE_TRUNC supports 1-unit intervals")
            spark_unit = {"milliseconds": "millisecond", "seconds": "second",
                          "minutes": "minute", "hours": "hour", "days": "day",
                          "weeks": "week", "months": "month", "years": "year"}[unit]
            return F.date_trunc(spark_unit, col)
        # BUCKET(col, numeric width) or BUCKET(col, duration)
        col = self._or()
        self.expect(",")
        t = self.peek()
        if t is not None and t.kind == "num" and self.peek(1) is not None \
                and self.peek(1).kind == "ident" \
                and self.peek(1).text.lower() in _DURATION_UNITS:
            n, unit = self._duration_parts()
            self.expect(")")
            if unit in ("months", "years"):
                raise EsqlError("ES|QL: BUCKET calendar units: use DATE_TRUNC")
            width = int(n * _DURATION_SECONDS[unit])
            secs = F.floor(F.unix_timestamp(col) / width) * width
            return F.to_timestamp(F.from_unixtime(secs))
        width = self._or()
        self.expect(")")
        return F.floor(col / width) * width

    def _duration_parts(self) -> tuple[float, str]:
        t = self.next()
        if t.kind != "num":
            raise EsqlError("ES|QL: expected a duration like '1 hour'")
        u = self.next()
        unit = _DURATION_UNITS.get(u.text.lower())
        if unit is None:
            raise EsqlError(f"ES|QL: unknown duration unit {u.text!r}")
        return float(t.text), unit


def _date_extract(part: str, col: Column) -> Column:
    p = part.lower()
    table = {
        "year": F.year, "month": F.month, "day": F.dayofmonth,
        "hour": F.hour, "minute": F.minute, "second": F.second,
        "dayofweek": F.dayofweek, "dayofyear": F.dayofyear,
        "week": F.weekofyear, "quarter": F.quarter,
    }
    if p not in table:
        raise EsqlError(f"ES|QL: DATE_EXTRACT part {part!r} unsupported")
    return table[p](col)


def _need(args: list, n: int, name: str) -> list:
    if len(args) != n:
        raise EsqlError(f"ES|QL: {name} takes {n} argument(s), got {len(args)}")
    return args


def _sort_nulls_last(c: Column) -> Column:
    return c


_FUNCS = {
    # math
    "ABS": lambda a: F.abs(*_need(a, 1, "ABS")),
    "CEIL": lambda a: F.ceil(*_need(a, 1, "CEIL")),
    "FLOOR": lambda a: F.floor(*_need(a, 1, "FLOOR")),
    "SQRT": lambda a: F.sqrt(*_need(a, 1, "SQRT")),
    "EXP": lambda a: F.exp(*_need(a, 1, "EXP")),
    "LOG10": lambda a: F.log10(*_need(a, 1, "LOG10")),
    "LOG": lambda a: F.log(*a) if len(a) == 2 else F.log(a[0]),
    "POW": lambda a: F.pow(*_need(a, 2, "POW")),
    "ROUND": lambda a: F.round(a[0], int(_lit_val(a[1]))) if len(a) == 2 else F.round(a[0]),
    "GREATEST": lambda a: F.greatest(*a),
    "LEAST": lambda a: F.least(*a),
    "PI": lambda a: F.lit(3.141592653589793),
    "SIGNUM": lambda a: F.signum(*_need(a, 1, "SIGNUM")),
    # string
    "LENGTH": lambda a: F.length(*_need(a, 1, "LENGTH")),
    "TO_UPPER": lambda a: F.upper(*_need(a, 1, "TO_UPPER")),
    "TO_LOWER": lambda a: F.lower(*_need(a, 1, "TO_LOWER")),
    "TRIM": lambda a: F.trim(*_need(a, 1, "TRIM")),
    "LTRIM": lambda a: F.ltrim(*_need(a, 1, "LTRIM")),
    "RTRIM": lambda a: F.rtrim(*_need(a, 1, "RTRIM")),
    "CONCAT": lambda a: F.concat(*a),
    "SUBSTRING": lambda a: F.substring(
        a[0], int(_lit_val(a[1])),
        int(_lit_val(a[2])) if len(a) == 3 else 2 ** 31 - 1),
    "REPLACE": lambda a: F.regexp_replace(a[0], _lit_str(a[1]), _lit_str(a[2])),
    "SPLIT": lambda a: F.split(a[0], re.escape(_lit_str(a[1]))),
    "LEFT": lambda a: F.substring(a[0], 1, int(_lit_val(a[1]))),
    "RIGHT": lambda a: _right(a),
    "STARTS_WITH": lambda a: F.startswith(*_need(a, 2, "STARTS_WITH")),
    "ENDS_WITH": lambda a: F.endswith(*_need(a, 2, "ENDS_WITH")),
    "LOCATE": lambda a: _locate(a),
    "REVERSE": lambda a: F.reverse(*_need(a, 1, "REVERSE")),
    "REPEAT": lambda a: F.repeat(a[0], int(_lit_val(a[1]))),
    "HASH": lambda a: F.sha2(a[1].cast("string"), 256) if len(a) == 2 else F.sha2(a[0].cast("string"), 256),
    "MD5": lambda a: F.md5(*_need(a, 1, "MD5")),
    "SHA1": lambda a: F.sha1(*_need(a, 1, "SHA1")),
    # conversion / null handling
    "TO_STRING": lambda a: a[0].cast("string"),
    "TO_INTEGER": lambda a: a[0].cast("int"),
    "TO_INT": lambda a: a[0].cast("int"),
    "TO_LONG": lambda a: a[0].cast("long"),
    "TO_DOUBLE": lambda a: a[0].cast("double"),
    "TO_BOOLEAN": lambda a: a[0].cast("boolean"),
    "TO_DATETIME": lambda a: a[0].cast("timestamp"),
    "COALESCE": lambda a: F.coalesce(*a),
    "CASE": lambda a: _case(a),
    # multivalue (arrays)
    "MV_COUNT": lambda a: F.size(*_need(a, 1, "MV_COUNT")),
    "MV_MIN": lambda a: F.array_min(*_need(a, 1, "MV_MIN")),
    "MV_MAX": lambda a: F.array_max(*_need(a, 1, "MV_MAX")),
    "MV_SUM": lambda a: F.aggregate(a[0], F.lit(0.0), lambda acc, x: acc + x),
    "MV_AVG": lambda a: F.aggregate(a[0], F.lit(0.0), lambda acc, x: acc + x) / F.size(a[0]),
    "MV_DEDUPE": lambda a: F.array_distinct(*_need(a, 1, "MV_DEDUPE")),
    "MV_SORT": lambda a: F.array_sort(a[0]),
    "MV_FIRST": lambda a: F.element_at(a[0], 1),
    "MV_LAST": lambda a: F.element_at(a[0], -1),
    "MV_CONCAT": lambda a: F.array_join(a[0], _lit_str(a[1])),
    "MV_SLICE": lambda a: F.slice(a[0], int(_lit_val(a[1])) + 1,
                                  int(_lit_val(a[2])) - int(_lit_val(a[1])) + 1),
    "MV_CONTAINS": lambda a: F.array_contains(a[0], a[1]),
    # date (non-literal-arg forms; DATE_TRUNC/FORMAT/EXTRACT special-cased)
    "NOW": lambda a: F.current_timestamp(),
    "DATE_DIFF": lambda a: _date_diff(a),
}


def _right(a: list) -> Column:
    n = int(_lit_val(a[1]))
    return F.substring(a[0], -n, n)


def _locate(a: list) -> Column:
    # ES|QL LOCATE(string, substring[, start]) — 1-based, 0 = absent.
    sub = _lit_str(a[1])
    return F.locate(sub, a[0], int(_lit_val(a[2]))) if len(a) == 3 else F.locate(sub, a[0])


def _case(a: list) -> Column:
    if len(a) < 2:
        raise EsqlError("ES|QL: CASE needs cond, value pairs")
    pairs, default = (a[:-1], a[-1]) if len(a) % 2 == 1 else (a, F.lit(None))
    c = F.when(pairs[0], pairs[1])
    for i in range(2, len(pairs), 2):
        c = c.when(pairs[i], pairs[i + 1])
    return c.otherwise(default)


def _date_diff(a: list) -> Column:
    unit = _lit_str(a[0]).lower()
    secs = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    if unit not in secs:
        raise EsqlError(f"ES|QL: DATE_DIFF unit {unit!r} unsupported")
    return F.floor((F.unix_timestamp(a[2]) - F.unix_timestamp(a[1])) / secs[unit]).cast("long")


def _tagged_lit(v) -> Column:
    """F.lit carrying its python value, so literal-only argument
    positions (ROUND precision, SPLIT delimiter, ...) can be read back
    without round-tripping through Column reprs."""
    c = F.lit(v)
    c._esql_lit = v
    return c


def _lit_val(c):
    if isinstance(c, (int, float, str)):
        return c
    v = getattr(c, "_esql_lit", None)
    if v is None:
        raise EsqlError(f"ES|QL: expected a literal argument, got {c!r}")
    return v


def _lit_str(c) -> str:
    v = _lit_val(c)
    if not isinstance(v, str):
        raise EsqlError(f"ES|QL: expected a string literal, got {v!r}")
    return v


# ----------------------------------------------------------- aggregates

def _agg_fn(fn: str, p: "_Expr") -> Column:
    args = p._args()
    star = bool(args) and isinstance(args[0], str) and args[0] == "*"
    if fn == "COUNT":
        return F.count(F.lit(1)) if (star or not args) else F.count(args[0])
    if fn == "COUNT_DISTINCT":
        return F.countDistinct(*args)
    if star:
        raise EsqlError(f"ES|QL: {fn}(*) is not valid")
    if fn == "SUM":
        return F.sum(args[0])
    if fn == "AVG":
        return F.avg(args[0])
    if fn == "MIN":
        return F.min(args[0])
    if fn == "MAX":
        return F.max(args[0])
    if fn == "MEDIAN":
        return F.percentile(args[0], F.lit(0.5))
    if fn == "PERCENTILE":
        return F.percentile(args[0], F.lit(float(_lit_val(args[1])) / 100.0))
    if fn == "MEDIAN_ABSOLUTE_DEVIATION":
        raise EsqlError("ES|QL: use operators.mad for MAD (needs two passes)")
    if fn == "VALUES":
        return F.array_sort(F.collect_set(args[0]))
    if fn == "TOP":
        n = int(_lit_val(args[1]))
        order = _lit_str(args[2]).lower() if len(args) > 2 else "desc"
        arr = F.array_sort(F.collect_list(args[0]))
        if order == "desc":
            arr = F.reverse(arr)
        return F.slice(arr, 1, n)
    if fn == "WEIGHTED_AVG":
        return F.sum(args[0] * args[1]) / F.sum(args[1])
    raise EsqlError(f"ES|QL: unknown aggregate {fn!r}")


_AGG_NAMES = {
    "COUNT", "COUNT_DISTINCT", "SUM", "AVG", "MIN", "MAX", "MEDIAN",
    "PERCENTILE", "VALUES", "TOP", "WEIGHTED_AVG",
    "MEDIAN_ABSOLUTE_DEVIATION",
}


# ------------------------------------------------------ command parsing

def _stats_parts(body: list[_Tok]):
    """Shared STATS/INLINESTATS grammar: named aggregates, optional
    top-level BY with named key expressions."""
    by_at, depth = None, 0
    for i, t in enumerate(body):
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.text.upper() == "BY":
            by_at = i
            break
    agg_toks = body[:by_at] if by_at is not None else body
    by_toks = body[by_at + 1:] if by_at is not None else []
    aggs = [_named_expr(part, in_stats=True)
            for part in _split_commas(agg_toks)]
    keys = ([_named_expr(part) for part in _split_commas(by_toks)]
            if by_toks else [])
    return aggs, keys


def _split_pipes(toks: list[_Tok]) -> list[list[_Tok]]:
    out, cur, depth = [], [], 0
    for t in toks:
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        if t.text == "|" and depth == 0:
            out.append(cur)
            cur = []
        else:
            cur.append(t)
    out.append(cur)
    return [c for c in out if c]


def _split_commas(toks: list[_Tok]) -> list[list[_Tok]]:
    out, cur, depth = [], [], 0
    for t in toks:
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        if t.text == "," and depth == 0:
            out.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        out.append(cur)
    return out


def _named_expr(toks: list[_Tok], in_stats: bool = False) -> tuple[str, Column]:
    """``name = expr`` or bare ``expr`` (named by its source text)."""
    name = None
    body = toks
    if len(toks) >= 2 and toks[0].kind == "ident" and toks[1].text == "=":
        name = toks[0].text.strip("`")
        body = toks[2:]
    p = _Expr(body, stats=in_stats)
    col = p.parse()
    if p.i != len(body):
        raise EsqlError(
            f"ES|QL: trailing tokens after expression: "
            f"{' '.join(t.text for t in body[p.i:])!r}")
    if name is None:
        name = " ".join(t.text for t in body)
    return name, col


_DISSECT_RE = re.compile(r"%\{([A-Za-z0-9_@.]*)\}")

_GROK_TYPES = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "NUMBER": r"-?\d+(?:\.\d+)?",
    "INT": r"-?\d+",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "LOGLEVEL": r"[A-Za-z]+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
}


def _dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """ES DISSECT pattern → anchored regex + capture names.  Keys
    capture lazily; literal separators are matched exactly."""
    names: list[str] = []
    rx, last = "^", 0
    for m in _DISSECT_RE.finditer(pattern):
        rx += re.escape(pattern[last:m.start()])
        key = m.group(1)
        if key == "" or key.startswith("?"):
            rx += r".*?"
        else:
            names.append(key)
            rx += r"(.*?)"
        last = m.end()
    rx += re.escape(pattern[last:]) + "$"
    return rx, names


_GROK_RE = re.compile(r"%\{(\w+):([A-Za-z0-9_@.]+)(?::\w+)?\}")


def _grok_regex(pattern: str) -> tuple[str, list[str]]:
    names: list[str] = []
    rx, last = "^", 0
    for m in _GROK_RE.finditer(pattern):
        rx += re.escape(pattern[last:m.start()])
        typ, key = m.group(1), m.group(2)
        sub = _GROK_TYPES.get(typ)
        if sub is None:
            raise EsqlError(f"ES|QL: unknown GROK pattern %{{{typ}}}")
        names.append(key)
        rx += f"({sub})"
        last = m.end()
    rx += re.escape(pattern[last:]) + "$"
    return rx, names


# --------------------------------------------------------------- driver

def esql(
    query: str,
    tables: dict[str, DataFrame] | None = None,
    spark: SparkSession | None = None,
    enrich_policies: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Compile and bind an ES|QL pipeline.

    ``tables`` maps index names to DataFrames (FROM resolves here
    first, then falls back to ``spark.table``).  ``enrich_policies``
    maps policy names to ``(policy_df, match_field)`` for ENRICH.
    Returns the lazily-planned DataFrame — nothing executes here.
    """
    toks = _lex(query)
    stages = _split_pipes(toks)
    if not stages:
        raise EsqlError("ES|QL: empty query")
    df = _source(stages[0], tables or {}, spark)
    for st in stages[1:]:
        df = _apply(df, st, enrich_policies or {}, tables or {})
    return df


def _source(toks: list[_Tok], tables, spark) -> DataFrame:
    head = toks[0].text.upper()
    if head == "FROM":
        names = [t.text for t in toks[1:] if t.kind == "ident" and t.text.upper() != "METADATA"]
        if not names:
            raise EsqlError("ES|QL: FROM needs at least one index")
        dfs = []
        for n in names:
            if n in tables:
                dfs.append(tables[n])
            elif spark is not None:
                dfs.append(spark.table(n))
            else:
                raise EsqlError(f"ES|QL: unknown index {n!r}")
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        return df
    if head == "ROW":
        if spark is None:
            for t in tables.values():
                spark = t.sparkSession
                break
        if spark is None:
            raise EsqlError("ES|QL: ROW needs a SparkSession")
        one = spark.range(1).drop("id")
        for part in _split_commas(toks[1:]):
            name, col = _named_expr(part)
            one = one.withColumn(name, col)
        return one
    raise EsqlError(f"ES|QL: query must start with FROM or ROW, got {head!r}")


def _apply(df: DataFrame, toks: list[_Tok], enrich_policies,
           tables=None) -> DataFrame:
    cmd = toks[0].text.upper()
    body = toks[1:]

    if cmd == "WHERE":
        p = _Expr(body)
        cond = p.parse()
        if p.i != len(body):
            raise EsqlError("ES|QL: trailing tokens in WHERE")
        return df.filter(cond)

    if cmd == "EVAL":
        for part in _split_commas(body):
            name, col = _named_expr(part)
            df = df.withColumn(name, col)
        return df

    if cmd == "STATS":
        aggs, keys = _stats_parts(body)
        agg_cols = [c.alias(n) for n, c in aggs]
        if keys:
            return df.groupBy(*[c.alias(n) for n, c in keys]).agg(*agg_cols)
        return df.agg(*agg_cols)

    if cmd == "INLINESTATS":
        # INLINESTATS agg [BY keys] (ES 8.x preview): same grammar as
        # STATS but the aggregates are APPENDED as columns — every input
        # row survives, annotated with its group's aggregate values.
        # Physical plan: hash-aggregate the (small) BY-groups relation,
        # broadcast it, left-join back — the main relation never
        # shuffles, and distinct/percentile aggregates work where a
        # window translation would reject them.  Same-named existing
        # columns are replaced (ES's behavior for result columns).
        aggs, keys = _stats_parts(body)
        agg_cols = [c.alias(n) for n, c in aggs]
        clobber = [n for n, _ in aggs if n in df.columns]
        if keys:
            # materialize expression keys on the main relation so the
            # join-back is a plain name equi-join (BY day = TRUNC(...))
            for n, c in keys:
                df = df.withColumn(n, c)
            gb = df.groupBy(*[n for n, _ in keys]).agg(*agg_cols)
            return df.drop(*clobber).join(
                F.broadcast(gb), [n for n, _ in keys], "left")
        gb = df.agg(*agg_cols).withColumn("__j", F.lit(1))
        return (
            df.drop(*clobber).withColumn("__j", F.lit(1))
            .join(F.broadcast(gb), "__j", "left")
            .drop("__j")
        )

    if cmd == "SORT":
        orders = []
        for part in _split_commas(body):
            p = _Expr(part)
            col = p.parse()
            desc = False
            nulls = None
            while p.peek() is not None:
                w = p.next().text.upper()
                if w == "DESC":
                    desc = True
                elif w == "ASC":
                    desc = False
                elif w == "NULLS":
                    nulls = p.next().text.upper()
                else:
                    raise EsqlError(f"ES|QL: bad SORT modifier {w!r}")
            if desc:
                col = col.desc_nulls_first() if nulls == "FIRST" else col.desc_nulls_last()
            else:
                col = col.asc_nulls_last() if nulls == "LAST" else col.asc_nulls_first()
            orders.append(col)
        return df.orderBy(*orders)

    if cmd == "LIMIT":
        if len(body) != 1 or body[0].kind != "num":
            raise EsqlError("ES|QL: LIMIT takes one integer")
        return df.limit(int(body[0].text))

    if cmd == "KEEP":
        cols: list[str] = []
        for part in _split_commas(body):
            pat = part[0].text
            if "*" in pat:
                rx = re.compile("^" + pat.replace("*", ".*") + "$")
                cols.extend(c for c in df.columns if rx.match(c) and c not in cols)
            else:
                cols.append(pat.strip("`"))
        return df.select(*cols)

    if cmd == "DROP":
        names = [part[0].text.strip("`") for part in _split_commas(body)]
        return df.drop(*names)

    if cmd == "RENAME":
        for part in _split_commas(body):
            # "old AS new"
            if len(part) == 3 and part[1].text.upper() == "AS":
                df = df.withColumnRenamed(part[0].text.strip("`"), part[2].text.strip("`"))
            # 8.x also allows "new = old"
            elif len(part) == 3 and part[1].text == "=":
                df = df.withColumnRenamed(part[2].text.strip("`"), part[0].text.strip("`"))
            else:
                raise EsqlError("ES|QL: RENAME needs 'old AS new'")
        return df

    if cmd == "MV_EXPAND":
        name = body[0].text.strip("`")
        return df.withColumn(name, F.explode_outer(F.col(name)))

    if cmd in ("DISSECT", "GROK"):
        src = body[0].text.strip("`")
        pat_tok = body[1]
        if pat_tok.kind != "str":
            raise EsqlError(f"ES|QL: {cmd} needs a string pattern")
        pattern = _unquote(pat_tok.text)
        rx, names = (_dissect_regex if cmd == "DISSECT" else _grok_regex)(pattern)
        for i, n in enumerate(names, start=1):
            val = F.regexp_extract(F.col(src), rx, i)
            df = df.withColumn(n, F.when(val == "", None).otherwise(val))
        return df

    if cmd == "ENRICH":
        policy = body[0].text
        if policy not in enrich_policies:
            raise EsqlError(f"ES|QL: unknown enrich policy {policy!r}")
        pol_df, match_field = enrich_policies[policy]
        i = 1
        on_field = match_field
        with_cols: list[str] | None = None
        while i < len(body):
            w = body[i].text.upper()
            if w == "ON":
                on_field = body[i + 1].text.strip("`")
                i += 2
            elif w == "WITH":
                with_cols = [p[0].text.strip("`") for p in _split_commas(body[i + 1:])]
                break
            else:
                raise EsqlError(f"ES|QL: bad ENRICH clause {body[i].text!r}")
        keep = with_cols or [c for c in pol_df.columns if c != match_field]
        right = pol_df.select(F.col(match_field).alias("__enrich_key"), *keep)
        # ES replicates the enrich index to every node; broadcast is the
        # same physical strategy.
        out = df.join(F.broadcast(right), df[on_field] == F.col("__enrich_key"), "left")
        return out.drop("__enrich_key")

    if cmd == "LOOKUP":
        # LOOKUP JOIN <lookup_index> ON <field> (ES 8.18+): left join
        # against a lookup-mode index on a same-named key.  ES requires
        # the lookup index to fit its lookup replication model; the
        # physical twin is a broadcast hash join, so the main relation
        # never shuffles.
        if not body or body[0].text.upper() != "JOIN":
            raise EsqlError("ES|QL: expected LOOKUP JOIN")
        name = body[1].text
        if tables is None or name not in tables:
            raise EsqlError(f"ES|QL: unknown lookup index {name!r}")
        if len(body) < 4 or body[2].text.upper() != "ON":
            raise EsqlError("ES|QL: LOOKUP JOIN needs ON <field>")
        key = body[3].text.strip("`")
        right = tables[name]
        if key not in right.columns:
            raise EsqlError(f"ES|QL: lookup index {name!r} has no "
                            f"field {key!r}")
        # ES semantics: lookup fields are added; same-named non-key
        # fields take the lookup value — drop the left copies first.
        clobber = [c for c in right.columns
                   if c != key and c in df.columns]
        return df.drop(*clobber).join(F.broadcast(right), key, "left")

    if cmd == "CHANGE_POINT":
        # CHANGE_POINT value ON key [AS type_name, stat_name]
        # (ES 8.18+): mean-shift detection over the piped series.  The
        # detector is the engine's exact max-|Welch-t| split
        # (aggs.change_point_agg — deterministic and SQL-replayable;
        # ES wraps ml detectors with p-values, which this engine
        # deliberately pins to a documented statistic instead, so the
        # second output column is the t statistic, default ``t_stat``).
        # Output = every input row, with the two columns set on the
        # change-point row (the first bucket of the post-change
        # segment) and null elsewhere — ES's output shape.
        from .aggs import change_point_agg

        if not body:
            raise EsqlError("ES|QL: CHANGE_POINT needs a value column")
        value = body[0].text.strip("`")
        key = "@timestamp"
        type_name, stat_name = "type", "t_stat"
        i = 1
        while i < len(body):
            w = body[i].text.upper()
            if w == "ON":
                key = body[i + 1].text.strip("`")
                i += 2
            elif w == "AS":
                type_name = body[i + 1].text.strip("`")
                if i + 2 < len(body) and body[i + 2].text == ",":
                    stat_name = body[i + 3].text.strip("`")
                    i += 4
                else:
                    i += 2
            else:
                raise EsqlError(
                    f"ES|QL: bad CHANGE_POINT clause {body[i].text!r}")
        cp = (
            change_point_agg(df, key, value)
            .select(
                F.col("key").alias("__cp_key"),
                F.col("t_stat_r6").alias("__cp_t"),
            )
            .withColumn("__j", F.lit(1))
        )
        # left join on a constant key: series too short for a change
        # point (<4 buckets) yields an empty cp relation and the rows
        # pass through with null annotation columns, matching ES.
        out = (
            df.withColumn("__j", F.lit(1))
            .join(F.broadcast(cp), "__j", "left")
            .drop("__j")
        )
        is_cp = F.col(key) == F.col("__cp_key")
        return (
            out.withColumn(type_name, F.when(is_cp, F.lit("step_change")))
            .withColumn(stat_name, F.when(is_cp, F.col("__cp_t")))
            .drop("__cp_key", "__cp_t")
        )

    if cmd == "FORK":
        # FORK (branch) (branch) ... (ES 8.19+): each parenthesized
        # sub-pipeline runs over the incoming relation; results union
        # by name (missing columns null-filled) with a ``_fork``
        # discriminator ("fork1", "fork2", ... in branch order).  The
        # incoming plan is shared — Spark computes it once per branch
        # consumer or from cache; no data is duplicated driver-side.
        branches: list[list[_Tok]] = []
        cur: list[_Tok] = []
        depth = 0
        for t in body:
            if t.text == "(":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    branches.append(cur)
                    continue
                if depth < 0:
                    raise EsqlError("ES|QL: unbalanced ')' in FORK")
            if depth >= 1:
                cur.append(t)
            else:
                raise EsqlError(
                    f"ES|QL: FORK expects parenthesized branches, "
                    f"got {t.text!r}")
        if depth != 0:
            raise EsqlError("ES|QL: unbalanced '(' in FORK")
        if len(branches) < 2:
            raise EsqlError("ES|QL: FORK needs at least two branches")
        outs = []
        for n, br in enumerate(branches, start=1):
            sub = df
            for st in _split_pipes(br):
                sub = _apply(sub, st, enrich_policies, tables)
            outs.append(sub.withColumn("_fork", F.lit(f"fork{n}")))
        merged = outs[0]
        for o in outs[1:]:
            merged = merged.unionByName(o, allowMissingColumns=True)
        return merged

    if cmd == "SAMPLE":
        # SAMPLE <probability> [<seed>]: seeded Bernoulli row sample.
        # ES|QL samples nondeterministically; a seed makes reruns
        # reproducible here (F.rand is per-partition seeded).
        prob = float(body[0].text)
        if not 0.0 < prob <= 1.0:
            raise EsqlError("ES|QL: SAMPLE probability must be in (0, 1]")
        seed = int(body[1].text) if len(body) > 1 else 42
        return df.where(F.rand(seed) < F.lit(prob))

    raise EsqlError(f"ES|QL: unknown command {cmd!r}")
