"""Deduplication operators for large-scale training-data pipelines.

All shapes chosen for 100 TB behavior:

- exact:        one hash-shuffle on the content digest
- minhash LSH:  per-row signatures (vectorized pandas UDF) -> band
                explode -> bucket shuffle -> candidate pairs -> exact
                verify; never an all-pairs comparison
- simhash:      64-bit signature + 16-bit band blocking for hamming<=r
- n-gram jaccard: shingle-explode + equi-join on shingle, pair counts ->
                jaccard; bounded by shingle-bucket sizes, not n^2 (and
                SQL-expressible — the DuckDB oracle replicates it 1:1)
- embedding cosine: see similarity.py (brute + LSH variants)

'Remove' semantics here are keep-first: a row is a duplicate if it pairs
with any lower-id row (no transitive closure — at petabyte scale the
closure is a separate iterative job; pairs are the stable primitive).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Drop rows whose content sha256 was already seen (keep min id)."""
    h = F.sha2(F.col(content_col).cast("string"), 256)
    keep = (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def exact_dup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(sha256, n_dups, keep_id) for groups with >1 member."""
    h = F.sha2(F.col(content_col).cast("string"), 256)
    return (
        df.withColumn("sha", h)
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def _word_shingles(text: str, k: int) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]


def _base_hashes(shingles: list[str]) -> np.ndarray:
    """Deterministic 64-bit base hash per shingle (md5 prefix)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in shingles
        ],
        dtype=np.uint64,
    )


def _base_hashes_vec(shingles: pd.Series) -> np.ndarray:
    """Vectorized deterministic 64-bit hash for a shingle batch
    (pandas' cython siphash with a fixed key — stable across runs
    and processes)."""
    return pd.util.hash_pandas_object(
        shingles, index=False, hash_key="0123456789abcdef"
    ).to_numpy(np.uint64)


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<bigint>) — vectorized per Arrow batch."""
    a, b = _minhash_params(n_hashes, seed)

    @pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        # Whole-batch vectorization: every shingle of the batch is
        # hashed once (cython, not per-row Python), the permutation
        # matrix M[u, i] = (a_i·h_u + b_i) mod p is computed once per
        # *unique* shingle, and each row's signature is a fancy-index
        # + min over its own shingle codes.
        row_shingles = [_word_shingles(t or "", shingle_k) for t in texts]
        flat = [s for sh in row_shingles for s in sh]
        if not flat:
            return pd.Series([[0] * n_hashes for _ in row_shingles])
        codes, uniques = pd.factorize(pd.Series(flat), sort=False)
        h = _base_hashes_vec(pd.Series(uniques))  # (n_unique,)
        m = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        out = []
        pos = 0
        empty = [0] * n_hashes
        for sh in row_shingles:
            if not sh:
                out.append(empty)
                continue
            c = codes[pos: pos + len(sh)]
            pos += len(sh)
            out.append(m[c].min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with the exact
    shingle jaccard: (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.array(*[
                    F.slice("signature", i * rows_per_band + 1, rows_per_band)
                    for i in range(bands)
                ]),
                lambda band: F.xxhash64(F.concat_ws(",", F.transform(band, lambda x: x.cast("string")))),
            )
        ).alias("band", "bucket"),
    )
    cands = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    jac = ngram_jaccard_for_pairs(df, cands, text_col, id_col, shingle_k)
    return jac.where(F.col("jaccard") >= threshold)


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct word-k-shingles — built-ins only, so the
    DuckDB oracle can reproduce it exactly."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with word-k-gram jaccard >= threshold, via shingle
    equi-join (bounded by shingle co-occurrence, not n^2)."""
    sh = shingle_table(df, text_col, id_col, k).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("l")
        .join(sh.alias("r"),
              (F.col("l.shingle") == F.col("r.shingle"))
              & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_for_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Exact jaccard for given candidate (id_a, id_b) pairs.

    The candidate set is LSH-small; shingles are computed ONCE for just
    the candidate docs (broadcast semi-join on the id set), cached, and
    reused for both join sides and the size table — never three full
    corpus re-tokenizations."""
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        shingle_table(df, text_col, id_col, k)
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .cache()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed("id", "id_a")
    b = sh.withColumnRenamed("id", "id_b")
    inter = (
        pairs.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left").na.fill({"inter": 0})
        .join(sizes.withColumnRenamed("id", "id_a")
              .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash bigint) — weighted token-hash bit voting."""

    @pandas_udf(LongType())
    def sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            uniq, counts = np.unique(np.array(toks), return_counts=True)
            h = _base_hashes(uniq.tolist())
            bitmat = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :])
                      & np.uint64(1)).astype(np.int64)
            votes = ((bitmat * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for bpos in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) with hamming <= max_hamming, blocked on
    16-bit simhash bands (any pair within hamming<=3 shares at least one
    of 4 bands — pigeonhole)."""
    sigs = simhash_signatures(df, text_col, id_col).cache()
    banded = sigs.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.bucket")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
