"""Bloom-filter incremental dedup: filter a new crawl/snapshot against
a HISTORICAL corpus without shuffling either side.

The cross-snapshot shape of exact dedup: ingest pipelines re-crawl the
web monthly, and "is this page already in the last N snapshots" must
not cost a join against 10^12 historical rows.  The standard answer
(CommonCrawl/CCNet practice) is a Bloom filter over the history's
content digests:

1. **build** — one narrow pass over history: per partition a numpy
   bitmap of the k hash-bit positions (Kirsch-Mitzenmacher double
   hashing from one JVM ``xxhash64``), partition bitmaps OR-merged.
   The bitmap is megabytes per billion items at fpp~1% — model-state
   sized, like NB priors or IVF centroids.
2. **scan** — one narrow pass over the new batch with the bitmap
   broadcast: vectorized bit tests drop every definitely-new row.
3. **verify** — Bloom positives (true dups + false positives) are the
   ONLY rows that touch history: a semi-join keyed on the digest (so
   shuffle volume is bounded by the positive count, not the corpus)
   with a content-equality condition on top, so neither Bloom fpp NOR
   a 64-bit digest collision can drop a genuinely new row.  Output is
   therefore EXACT.

At 10^12-item scale the single driver bitmap becomes a sharded bloom
(hash-prefix → shard); the operator takes ``n_bits`` so the caller
sizes state explicitly.  Reference surface: the repo's exact-dedup
contract (content sha equality) extended across snapshots —
``upsertDocument``-style idempotent ingest
(/root/reference/src/main/java/com/jamesmcguigan/nlp/utils/elasticsearch/actions/UpsertDocument.java)
needs exactly this "seen before?" predicate at ingest time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["build_content_bloom", "bloom_seen_udf",
           "dedup_against_history"]

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = h1 + i*h2.
    One int64 hash in, k positions out — all vectorized."""
    h = h.astype(np.uint64)
    h1 = h
    # cheap second hash: multiply-xorshift of the first
    h2 = (h * _MIX) ^ (h >> np.uint64(31))
    h2 = h2 | np.uint64(1)  # odd, so strides cover the table
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits))


def build_content_bloom(
    df: DataFrame,
    content_col: str = "content",
    n_bits: int = 1 << 23,
    k: int = 7,
) -> np.ndarray:
    """uint8 bitmap (n_bits/8 bytes) over ``xxhash64(content)`` of every
    row.  One narrow pass: each partition builds its own bitmap and
    emits it as one row; the driver ORs the ≤num_partitions bitmaps.
    (At 10^12 items, shard this by hash prefix; the per-shard build is
    this same function over a hash-range filter.)"""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    hashed = df.select(
        F.xxhash64(F.coalesce(F.col(content_col).cast("string"),
                              F.lit(""))).alias("h")
    )

    n_bytes = n_bits // 8

    def per_partition(batches):
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = _positions(pdf["h"].to_numpy(), n_bits, k).ravel()
            np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    parts = hashed.mapInPandas(per_partition, "bm binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out


def bloom_seen_udf(bitmap: np.ndarray, n_bits: int, k: int = 7):
    """Vectorized membership test column: True = possibly in history
    (needs exact verify), False = DEFINITELY new."""
    bm = np.asarray(bitmap, dtype=np.uint8)

    @pandas_udf("boolean")
    def seen(h: pd.Series) -> pd.Series:
        pos = _positions(h.to_numpy(), n_bits, k)      # (n, k)
        bits = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return seen


def dedup_against_history(
    new_df: DataFrame,
    history_df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_bits: int = 1 << 23,
    k: int = 7,
    bitmap: np.ndarray | None = None,
) -> DataFrame:
    """Rows of ``new_df`` whose content does NOT appear in
    ``history_df`` — exact, with history touched only by Bloom
    positives.  Pass a prebuilt ``bitmap`` to amortize the build across
    batches (the streaming-ingest shape)."""
    if bitmap is None:
        bitmap = build_content_bloom(history_df, content_col, n_bits, k)
    seen = bloom_seen_udf(bitmap, n_bits, k)
    h = F.xxhash64(F.coalesce(F.col(content_col).cast("string"),
                              F.lit("")))
    new_h = new_df.withColumn("_h", h)
    candidates = new_h.where(seen(F.col("_h")))       # bloom positives
    hist = history_df.select(
        h.alias("_hh"), F.col(content_col).alias("_hc")
    )
    # exact verify: equi-join on the digest (bounds shuffle volume —
    # history rows only move if their digest matches a Bloom positive)
    # PLUS content equality, so a 64-bit digest collision cannot drop a
    # genuinely new document; left_semi dedups repeated history rows
    true_dups = candidates.join(
        hist,
        (F.col("_h") == F.col("_hh"))
        & (F.coalesce(F.col(content_col).cast("string"), F.lit(""))
           == F.coalesce(F.col("_hc").cast("string"), F.lit(""))),
        "left_semi",
    ).select(F.col(id_col).alias("_dup_id"))
    return (
        new_h.join(true_dups, new_h[id_col] == F.col("_dup_id"),
                   "left_anti")
        .drop("_h")
    )
