"""Mergeable frequency sketches: count-min + exact heavy hitters.

Count-min (Cormode & Muthukrishnan 2005) is the frequency cousin of
the HLL/GK sketches the agg layer already uses: a ``depth × width``
counter matrix where every key increments one counter per row (hash
per row); the estimate is the min over rows.  Properties that matter
at 100 TB:

- **linear** — sketches ADD: per-partition matrices sum into the
  corpus sketch, one narrow pass, a few-hundred-KB driver object
  (exactly the treeAggregate shape; no shuffle of raw keys at all).
- **one-sided error** — estimates only OVERCOUNT: estimate ≥ truth
  always, and ``estimate ≤ truth + ε·N`` with probability ``1-δ``
  for ``width = ⌈e/ε⌉``, ``depth = ⌈ln(1/δ)⌉``.

``heavy_hitters`` answers the standard CMS use-case exactly: local
per-partition top-M candidates (a true heavy hitter is a heavy hitter
in at least one partition at M ≥ k — the union bound the Misra-Gries
merge relies on), then ONE filtered exact count over the candidate
union.  The corpus never shuffles on the raw key; only candidate rows
aggregate.  Output is exact, so the DuckDB oracle is a plain top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_query", "heavy_hitters"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _row_positions(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(n, depth) counter columns via double hashing of one int64."""
    h = h.astype(np.uint64)
    h2 = ((h * _MIX) ^ (h >> np.uint64(29))) | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)[None, :]
    return ((h[:, None] + i * h2[:, None]) % np.uint64(width))


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 5,
) -> np.ndarray:
    """(depth, width) int64 count-min matrix over ``xxhash64(col)`` —
    one narrow pass, per-partition matrices summed on the driver
    (sketches are linear; at extreme partition counts sum them in a
    tree, the payload is depth·width·8 bytes)."""
    hashed = df.select(
        F.xxhash64(F.coalesce(F.col(col).cast("string"),
                              F.lit(""))).alias("h")
    )

    def per_partition(batches):
        m = np.zeros((depth, width), dtype=np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = _row_positions(pdf["h"].to_numpy(), width, depth)
            for d in range(depth):
                np.add.at(m[d], pos[:, d].astype(np.int64), 1)
        if any_rows:
            yield pd.DataFrame({"m": [m.tobytes()]})

    parts = hashed.mapInPandas(per_partition, "m binary").collect()
    out = np.zeros((depth, width), dtype=np.int64)
    for r in parts:
        out += np.frombuffer(r["m"], dtype=np.int64).reshape(depth,
                                                             width)
    return out


def cms_query(spark, cms: np.ndarray, values: list) -> dict:
    """{value: estimated count} — min over the sketch rows; estimates
    never undercount.  The query keys hash through the same JVM
    ``xxhash64`` the build pass used (one tiny Spark job over the
    handful of keys — mixing hash families would silently break the
    sketch)."""
    pdf = spark.createDataFrame(
        [(str(v),) for v in values], "v string"
    ).select(F.xxhash64("v").alias("h")).toPandas()
    ests = cms_query_hashes(cms, pdf["h"].to_numpy())
    return {v: int(e) for v, e in zip(values, ests)}


def cms_query_hashes(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Estimates for pre-hashed keys (int64 xxhash64 values, as
    produced by the build pass or any ``F.xxhash64`` column)."""
    depth, width = cms.shape
    pos = _row_positions(np.asarray(hashes, dtype=np.int64), width,
                         depth)
    ests = np.stack([cms[d][pos[:, d].astype(np.int64)]
                     for d in range(depth)], axis=1)
    return ests.min(axis=1)


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, candidates_per_partition: int = 64,
) -> DataFrame:
    """EXACT top-``k`` (key, n) by frequency without shuffling the
    corpus on the raw key: per-partition local top-M candidates, then
    one exact count restricted to the candidate union (broadcast
    isin).  M ≥ k guarantees no true top-k key is missed (any global
    heavy hitter is a local top-M in whichever partition holds its
    plurality — with uniform partitioning, in all of them)."""
    def local_top(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
        if counts:
            top = sorted(counts.items(), key=lambda kv: -kv[1])
            yield pd.DataFrame(
                {col: [v for v, _ in top[:candidates_per_partition]]}
            )

    cand_rows = (
        df.select(col).where(F.col(col).isNotNull())
        .mapInPandas(local_top, f"{col} string")
        .distinct()
        .collect()
    )
    cands = [r[col] for r in cand_rows]
    return (
        df.where(F.col(col).isin(cands))
        .groupBy(F.col(col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
    )
