"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      — exact brute-force baseline: broadcast the query
  vectors, score every corpus vector with built-in higher-order
  functions (zip_with + aggregate — JVM-side, no Python), window top-k.
  This is the correctness oracle and stays SQL-expressible for DuckDB.
- ``lsh_cosine_topk``  — the scale path: random-hyperplane signatures
  (deterministic seed), multi-table band blocking, exact re-rank within
  candidate buckets.  Probe cost ~ bucket sizes, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    # compute in float64 even for float32 embeddings (cross-engine
    # reproducibility: float32 products differ from DuckDB's path)
    a64 = F.transform(a, lambda x: x.cast("double"))
    b64 = F.transform(b, lambda x: x.cast("double"))
    return _dot(a64, b64) / (_norm(a64) * _norm(b64))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    min_similarity: float | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) exact top-k; excludes self-matches
    when query_id equals a corpus vec_id.

    ``min_similarity`` is ES kNN's ``similarity`` cutoff: candidates
    below it are dropped before ranking, so a query may legitimately
    return fewer than ``k`` hits — a relevance floor, not a different
    ordering.  It filters inside the scan projection (before the top-k
    shuffle), so a tight cutoff SHRINKS the ranked set at scale."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            cosine(F.col(vec_col), F.col("qv")).alias("cos"),
        )
    )
    if min_similarity is not None:
        scored = scored.where(F.col("cos") >= F.lit(float(min_similarity)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def lsh_signatures(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Adds array<int> 'bands_sig': per-band integers from sign bits of
    random hyperplane projections (one matmul per Arrow batch)."""
    planes = _hyperplanes(dim, n_bits, seed)
    bits_per_band = n_bits // bands

    @pandas_udf(ArrayType(IntegerType()))
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_bits)
        # whole-batch band packing: one reshape + matmul (no per-row
        # Python loop — round-1 finding)
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        packed = bits.reshape(len(m), bands, bits_per_band) @ weights
        return pd.Series(list(packed.astype(np.int32)))

    return df.withColumn("bands_sig", sig(F.col(vec_col)))


def lsh_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    n_bits: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """(query_id, qv, <id_col>, <vec_col>) — corpus vectors sharing >=1
    LSH band with the query.  Exposed separately so the exact-rerank
    stage can be oracle-checked in SQL from a materialized candidate
    set (the hyperplane family itself is recall-tested in pytest)."""
    e = lsh_signatures(embeddings, vec_col, dim, n_bits, bands, seed)
    q = lsh_signatures(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
        ),
        "qv", dim, n_bits, bands, seed,
    )
    eb = e.select(
        id_col, vec_col,
        F.posexplode("bands_sig").alias("band", "bucket"),
    )
    qb = q.select(
        "query_id", "qv", F.posexplode("bands_sig").alias("band", "bucket")
    )
    return (
        eb.join(F.broadcast(qb), ["band", "bucket"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", "qv", id_col, vec_col)
        .distinct()
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing >=1 LSH
    band with the query, re-ranked exactly."""
    cands = lsh_candidates(
        embeddings, queries, dim, n_bits, bands, id_col, vec_col,
        query_id_col, query_vec_col, seed,
    )
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )


def _ivf_seed_centroids(
    embeddings: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> np.ndarray:
    """Deterministic seed centroids: the n_cells corpus vectors with the
    smallest xxhash64(id) — order-stable across partitionings/runs
    (Date/rand-free), collected to the driver (n_cells rows, tiny)."""
    rows = (
        embeddings.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h", "v")
        .limit(n_cells)
        .collect()
    )
    return np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_train_centroids(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction_pct: int = 100,
) -> np.ndarray:
    """Spherical k-means centroids (unit rows, (n_cells, dim)) for an
    IVF index — plain DataFrame aggregations, no MLlib.

    Each Lloyd iteration is (1) one Arrow-batched matmul pass assigning
    every training vector to its max-cosine cell and (2) one
    explode→groupBy(cell, pos) mean computing new cell centroids
    JVM-side; only the (n_cells × dim) centroid table ever reaches the
    driver — legitimate model state, same footprint class as NB priors.

    100 TB shape: training does NOT need the full corpus — pass
    ``train_fraction_pct`` to subsample deterministically
    (xxhash64(id) mod 100 < pct) before iterating; assignment of the
    full corpus afterwards is a single embarrassing-parallel pass."""
    train = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    if train_fraction_pct < 100:
        train = train.where(
            F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(100))
            < train_fraction_pct
        )
    train = train.cache()
    cents = _unit(_ivf_seed_centroids(train, "id", "v", n_cells))

    for _ in range(iters):
        assigned = ivf_assign(train, cents, "v").select(
            "cid", F.posexplode("v").alias("pos", "val")
        )
        sums = (
            assigned.groupBy("cid", "pos")
            .agg(F.sum(F.col("val").cast("double")).alias("s"))
            .collect()
        )
        new = cents.copy()
        by_cid: dict[int, np.ndarray] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], np.zeros(dim))[r["pos"]] = r["s"]
        for cid, vec in by_cid.items():
            if np.linalg.norm(vec) > 0:
                new[cid] = vec
        cents = _unit(new)  # empty cells keep their previous centroid
    train.unpersist()
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    n_probe: int = 1,
) -> DataFrame:
    """Adds ``cid`` (int, n_probe=1) or ``cids`` (array<int>, the
    n_probe max-cosine cells in order) — one whole-batch matmul against
    the broadcast centroid matrix per Arrow batch."""
    cu = _unit(np.asarray(centroids, dtype=np.float64)).T  # (dim, cells)

    if n_probe == 1:
        @pandas_udf(IntegerType())
        def cell(vecs: pd.Series) -> pd.Series:
            m = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
            return pd.Series((m @ cu).argmax(axis=1).astype(np.int32))

        return df.withColumn("cid", cell(F.col(vec_col)))

    @pandas_udf(ArrayType(IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        m = _unit(np.stack(vecs.to_numpy()).astype(np.float64))
        sims = m @ cu
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    return df.withColumn("cids", cells(F.col(vec_col)))


def ivf_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, qv, <id_col>, <vec_col>) — corpus vectors living in
    any of the query's n_probe nearest IVF cells.  Exposed separately
    (mirrors ``lsh_candidates``) so the exact-rerank stage can be
    oracle-checked in SQL from a materialized candidate set."""
    corpus = ivf_assign(embeddings, centroids, vec_col, n_probe=1)
    q = ivf_assign(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
        ),
        centroids, "qv", n_probe=n_probe,
    ).select("query_id", "qv", F.explode("cids").alias("cid"))
    return (
        corpus.join(F.broadcast(q), "cid")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", "qv", id_col, vec_col)
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k (the second ANN scale path next to LSH):
    probe the n_probe max-cosine cells per query, exact re-rank within
    them.  Probe cost ~ n_probe/n_cells of the corpus per query, and
    the cell assignment is reusable across query batches (build once,
    query many — pass precomputed ``centroids``)."""
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, dim, n_cells, iters, id_col, vec_col
        )
    cands = ivf_candidates(
        embeddings, queries, centroids, n_probe, id_col, vec_col,
        query_id_col, query_vec_col,
    )
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )


def embedding_cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine (brute pairwise;
    LSH-bucketed variant: run lsh_signatures and join on bands first)."""
    l = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    r = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    dim: int | None = None,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    id_a < id_b and cos >= threshold.

    ``method='lsh'`` (the scale path): candidates = pairs sharing >=1
    random-hyperplane band, then exact cosine verify — work bounded by
    bucket collisions, never n².  ``method='brute'`` is the exact
    all-pairs reference (JVM ``zip_with`` dot products), fine at test
    SF and the oracle for the LSH variant's recall tests."""
    if method == "brute":
        return embedding_cosine_dup_pairs(
            embeddings, threshold, id_col, vec_col
        )
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    sigs = lsh_signatures(embeddings, vec_col, dim, n_bits, bands, seed)
    banded = sigs.select(
        id_col, F.posexplode("bands_sig").alias("band", "bucket")
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    pairs = cand.join(a, "id_a").join(b, "id_b")
    scored = pairs.withColumn("cos", cosine(F.col("va"), F.col("vb")))
    return scored.where(F.col("cos") >= threshold).select(
        "id_a", "id_b", "cos"
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the
    embedding space (spherical k-means cells — reuse
    ``ivf_train_centroids``), then compare **only within a cell**:
    ``(id_a, id_b, cos)`` with ``id_a < id_b`` and ``cos >= threshold``.

    This is the scalable shape of embedding dedup for web-scale
    corpora (Abbas et al., "SemDeDup", 2023): the all-pairs comparison
    is restricted to k-means cells, so cost is Σ|cell|² instead of n²,
    and each cell's self-join co-locates on one shuffle key (``cid``).
    Near-duplicate pairs that straddle a cell boundary are missed by
    construction — the paper's (accepted) recall trade-off; raise
    ``n_cells`` for smaller cells and cheaper joins, lower it for
    higher recall.  Deterministic given the seeded centroids."""
    assigned = ivf_assign(embeddings, centroids, vec_col, n_probe=1)
    a = assigned.select(
        "cid", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        "cid", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    iters: int = 5,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Keep-first semantic dedup: drop every row whose embedding is
    within ``threshold`` cosine of a lower-id row in the same k-means
    cell; returns the surviving rows of ``embeddings``.  One broadcast
    anti-join against the (sparse) duplicate-id set."""
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, dim, n_cells, iters, id_col, vec_col
        )
    pairs = semantic_dedup_pairs(
        embeddings, centroids, threshold, id_col, vec_col
    )
    dups = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(dups, id_col, "left_anti")


def cosine_topk_filtered(
    embeddings: DataFrame,
    allowed_ids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES kNN-with-filter semantics: the filter applies DURING search
    (pre-filter), so the top-k always holds k matching docs — never the
    post-filtered remnant of an unfiltered top-k.  ``allowed_ids`` is
    one id column; the restriction is a semi-join pushed below the
    scoring (AQE broadcasts it when it is small — the usual case for a
    selective filter; an unselective huge id set degrades to a shuffle
    semi-join rather than an executor-OOM broadcast), then the standard
    exact top-k."""
    fcol = allowed_ids.columns[0]
    allowed = allowed_ids.select(F.col(fcol).alias(id_col))
    return cosine_topk(
        embeddings.join(allowed, id_col, "left_semi"),
        queries, k=k, id_col=id_col, vec_col=vec_col,
    )
