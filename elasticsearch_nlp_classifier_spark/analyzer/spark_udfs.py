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
    """``analyze(col)`` → tokens column via the named analyzer chain."""
    return analyze_udf(analyzer)(F.col(col) if isinstance(col, str) else col)


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
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")
