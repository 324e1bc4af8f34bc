"""Web-text cleaning: HTML stripping and Unicode normalization — the
ingest-side scrub every web-scale corpus runs before quality/dedup.

``strip_html`` is pure JVM regexp chains (codegen, RE2-compatible
patterns so the DuckDB oracle replays them verbatim: no backreferences
or lookarounds).  ``normalize_unicode`` is an Arrow-batched pandas UDF
around ``unicodedata.normalize`` — per-string work is inherent (like a
codec), and NFC/NFKC here matches DuckDB's ``nfc_normalize`` for the
oracle.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# entity -> replacement, applied in order (amp LAST so "&amp;lt;" does
# not double-decode)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def strip_html(text_col: Column | str) -> Column:
    """HTML → visible text: drop script/style subtrees, strip tags,
    decode the common entities, collapse whitespace.  Regex subset is
    RE2-safe (non-greedy, no backreferences), so Java and DuckDB agree
    byte-for-byte."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_unicode(
    df: DataFrame, text_col: str = "text", form: str = "NFC",
) -> DataFrame:
    """Replace ``text_col`` with its Unicode-``form`` normalization
    (NFC default: canonical composition — 'e'+U+0301 → 'é').  Narrow
    Arrow-batched pass; NFKC additionally folds compatibility forms
    (ligatures, full-width chars) — the usual LLM-pipeline choice."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None else None
        )

    return df.withColumn(text_col, norm(F.col(text_col)))


def clean_web_docs(
    df: DataFrame, text_col: str = "text", form: str = "NFC",
) -> DataFrame:
    """strip_html + normalize_unicode in one pass (both narrow)."""
    return normalize_unicode(
        df.withColumn(text_col, strip_html(text_col)), text_col, form
    )
