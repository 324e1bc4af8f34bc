"""Document chunking: split long docs into token windows with overlap.

The standard pre-tokenization step of an LLM training pipeline —
context windows are fixed, documents are not.  Each document becomes
``max(0, ceil((n_tok - overlap) / stride))`` chunks (``stride =
max_tokens - overlap``); chunk ``i`` covers tokens
``[i·stride, i·stride + max_tokens)``.  Empty documents produce no
chunks; the final chunk is allowed to be short (no padding here —
that's the trainer's job).

Pure JVM expressions: whitespace split once, ``sequence`` for chunk
ids, ``posexplode`` + ``slice`` for the windows — a narrow map +
explode, zero shuffles, and the output explodes at most
``n_tok / stride`` rows per doc, so partition sizes stay proportional
to input bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, chunk_id, chunk_text, n_tokens)`` — overlapping token
    windows over a whitespace tokenization (the SQL-replicable
    splitter; feed an analyzed column for model-specific tokens)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    n_chunks = F.ceil(
        (F.size("_toks") - F.lit(overlap)) / F.lit(float(stride))
    ).cast("int")
    out = (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .withColumn("_n", F.greatest(F.lit(1), n_chunks))
        .select(
            "id", "_toks",
            F.posexplode(F.sequence(F.lit(0), F.col("_n") - 1))
            .alias("chunk_id", "_i"),
        )
    )
    window = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, max_tokens
    )
    return out.select(
        "id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("bigint").alias("n_tokens"),
    )
