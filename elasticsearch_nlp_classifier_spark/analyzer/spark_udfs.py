"""Arrow-vectorized Spark surface of the analyzer chains.

Exposes each named analyzer as a scalar ``pandas_udf`` producing
``array<string>``.  Batches arrive as Arrow-backed ``pd.Series``; the
chain runs with compiled regexes + a process-wide stem memo cache
(Zipfian token distribution → high hit rate), so per-token cost stays
amortized-constant.  No row-at-a-time Python UDFs anywhere
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .chain import ANALYZERS, Analyzer


def _make_batch_fn(analyzer: Analyzer):
    def batch(series: pd.Series) -> pd.Series:
        tok = analyzer.tokenize
        return series.map(lambda s: tok(s) if s is not None else [])

    return batch


_UDF_CACHE: dict[str, object] = {}


def analyze_udf(name: str = "default"):
    """pandas_udf ``string -> array<string>`` for the named analyzer."""
    udf = _UDF_CACHE.get(name)
    if udf is None:
        fn = _make_batch_fn(ANALYZERS[name])
        udf = pandas_udf(fn, ArrayType(StringType()))
        _UDF_CACHE[name] = udf
    return udf


def analyze(col: Column | str, analyzer: str = "default") -> Column:
    """``analyze(col)`` → tokens column via the named analyzer chain.

    Analyzers with a pure-built-in expression equivalent (``code``,
    ``simple_code``) compile to JVM expressions inside whole-stage
    codegen — no Python worker in the plan at all; the rest run as the
    vectorized pandas UDF.  Expression/chain parity is pinned by
    ``test_code_jvm_python_parity`` / ``test_simple_code_jvm_python_
    parity`` over the synthetic corpus."""
    c = F.col(col) if isinstance(col, str) else col
    jvm = JVM_TOKEN_EXPRS.get(analyzer)
    if jvm is not None:
        return jvm(c)
    return analyze_udf(analyzer)(c)


def analyze_fields(cols: list[Column | str], analyzer: str = "default") -> Column:
    """Multi-field tokenize+concat in declared field order
    (reference `ATokenizer.java:36-43`)."""
    parts = [analyze(c, analyzer) for c in cols]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def simple_code_tokens(col: Column | str) -> Column:
    """The oracle-replicable analyzer as *pure built-in* expressions —
    lowercase + split on non-alphanumeric runs, empties dropped.  Stays
    inside whole-stage codegen (no Python at all); DuckDB equivalent:
    ``regexp_split_to_array(lower(x), '[^a-z0-9]+')`` + unnest + filter.
    """
    c = F.col(col) if isinstance(col, str) else col
    # null -> '' so the JVM path agrees with the pandas chain (None ->
    # []); without it size(tokens) is -1/null for null docs
    c = F.coalesce(c, F.lit(""))
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")


# Java regex equivalents of the CODE chain (`chain.py`): identifier /
# number / same-char operator-run split, then lowercase, then stopword +
# punctuation-run removal.  `(?U)` (UNICODE_CHARACTER_CLASS) makes Java
# `\d`/`\S` match Python's Unicode semantics, so the JVM and pandas
# paths agree beyond ASCII too (pinned by the parity tests' non-ASCII
# cases).
_CODE_SPLIT_RE = r"(?U)[A-Za-z_][A-Za-z0-9_]*|\d+|(\S)\1*"
_PUNCT_RUN_RE = r"^([!\"#$%&'()*+,./:;<=>?@\[\]^_`{|}~-])\1*$"


def code_tokens(col: Column | str) -> Column:
    """The source-code analyzer (``code`` chain: split → lowercase →
    stopwords/punct-runs, no stemming) as pure built-in expressions.

    The whole chain stays inside whole-stage codegen: one
    ``regexp_extract_all`` split, a ``transform(lower)``, and a
    ``filter`` whose stopword test compiles to an ``InSet`` hash probe.
    This is the index build's hot path — the pandas-UDF chain spends
    most of its time building per-row Python token lists, which is both
    ~5× slower per core and memory-bandwidth-bound at high parallelism
    (32 workers of object churn stop scaling long before the CPUs do).
    """
    from .stopwords import STOPWORDS

    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))  # null-doc parity with the pandas chain
    toks = F.regexp_extract_all(c, F.lit(_CODE_SPLIT_RE), 0)
    lowered = F.transform(toks, F.lower)
    stop = sorted(STOPWORDS)
    return F.filter(
        lowered,
        lambda t: (~t.isin(stop)) & (~t.rlike(_PUNCT_RUN_RE)),
    )


def _shingled_simple_code(n: int):
    def expr(col: Column | str) -> Column:
        from .filters import shingle_tokens_col

        return shingle_tokens_col(simple_code_tokens(col), n)

    return expr


def _edge_simple_code(col: Column | str) -> Column:
    from .filters import edge_ngram_tokens_col

    return edge_ngram_tokens_col(simple_code_tokens(col), 1, 10)


# Analyzers whose full chain is expressible as built-in JVM expressions.
JVM_TOKEN_EXPRS = {
    "simple_code": simple_code_tokens,
    "code": code_tokens,
    "simple_code_shingle2": _shingled_simple_code(2),
    "simple_code_shingle3": _shingled_simple_code(3),
    "simple_code_edge": _edge_simple_code,
}
