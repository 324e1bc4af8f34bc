"""PII detection and redaction over a text column.

Standard scrubbing pass in an LLM training-data pipeline: find and
mask emails, IPv4 addresses and phone-shaped numbers before the corpus
leaves the ingest stage.  Everything here is JVM ``regexp_*``
expressions — whole-stage codegen, no Python in the row path — and
every pattern is written to the common Java-regex ∩ RE2 subset so the
DuckDB oracle can run the identical pattern.

Scale shape: narrow map over the scan, zero shuffles; the filter form
(``pii_stats``-based thresholds) pushes straight onto the parquet
scan's projected ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_stats", "redact_pii"]

#: pattern → replacement token.  Java-regex ∩ RE2 subset: ASCII char
#: classes, bounded quantifiers, \b word boundaries — identical
#: semantics in Spark and DuckDB.  Order matters: emails first so the
#: phone pass can't eat digit runs inside an already-masked span.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    # +15551234567 international or 555-123-4567 dashed US form
    ("phone",
     r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
     "<PHONE>"),
]


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc PII hit counts: ``(id, n_email, n_ipv4, n_phone,
    n_pii)`` — the filter/reporting form (e.g. drop docs with
    ``n_pii > k`` instead of redacting)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    out = df.select(F.col(id_col).alias("id"), *counts)
    total: Column = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS),
        F.lit(0).cast("bigint"),
    )
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None,
) -> DataFrame:
    """Mask every PII span with its type token (``<EMAIL>``/``<IP>``/
    ``<PHONE>``), applied in PII_PATTERNS order as one chained
    ``regexp_replace`` expression tree."""
    out_col = out_col or text_col
    c = F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out_col, c)
