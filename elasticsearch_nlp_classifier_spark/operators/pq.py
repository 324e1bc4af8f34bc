"""Product quantization (PQ) for embedding search at 100 TB scale.

Brute cosine reads ``4·dim`` bytes per vector per query; IVF prunes
which vectors are read but each is still full width.  PQ attacks the
*width*: split the vector into ``m`` subspaces, k-means each subspace
to ``n_codes`` centroids, and store each vector as ``m`` small codes
(``m`` bytes at ``n_codes<=256``) — a 64-dim float vector becomes 8
bytes, a 32× compression, and the ADC (asymmetric distance computation)
scan scores a vector with ``m`` table lookups instead of ``dim``
multiplies.  This is the FAISS ``PQx``/``IVFxPQy`` design (Jégou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Distribution shape:

- **Training** runs on a bounded deterministic sample (codebooks are
  model state, like NB priors / IVF centroids): FAISS practice — PQ
  codebooks need ~100k training vectors regardless of corpus size.
- **Encoding** is the distributed pass: one Arrow-batched
  distances+argmin matmul per subspace per batch, embarrassingly
  parallel, output is the tiny codes table.
- **ADC scan** is a mapInPandas over the codes table only (the
  original vectors are never read): per batch one LUT gather + sum per
  query.  Optional exact re-rank joins the top-``rerank_depth``
  candidates back to the full vectors — the standard recall recovery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pq_train_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_build",
    "ivfpq_topk",
]


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 65536,
    normalize: bool = True,
    seed: int = 42,
) -> np.ndarray:
    """(m, n_codes, dim//m) float64 codebooks, trained with per-subspace
    Lloyd k-means on a deterministic hash-ordered sample of at most
    ``sample_n`` vectors.  ``normalize=True`` unit-normalizes training
    vectors so ADC inner product == cosine (the encode/query sides must
    use the same flag)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sample = (
        embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        .orderBy(F.xxhash64(F.col("id").cast("string")), F.col("id"))
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    if normalize:
        X = _l2_normalize(X)
    return _train_books_on(X, m, n_codes, iters, seed)


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(id_col, codes array<int>) — nearest-codebook-entry id per
    subspace; one vectorized distance matmul per subspace per Arrow
    batch.  The output table is the PQ index: ``m`` small ints per
    vector."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape
    # ||x - c||^2 = ||x||^2 - 2 x·c + ||c||^2; per subspace only the
    # last two terms depend on c
    c_sq = (books ** 2).sum(axis=2)  # (m, n_codes)

    @pandas_udf(ArrayType(IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        if normalize:
            X = _l2_normalize(X)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            Xj = X[:, j * sub: (j + 1) * sub]
            scores = 2.0 * (Xj @ books[j].T) - c_sq[j][None, :]
            codes[:, j] = scores.argmax(axis=1)
        return pd.Series(list(codes))

    return embeddings.select(
        F.col(id_col).alias(id_col), enc(F.col(vec_col)).alias("codes")
    )


def _exact_rerank(top, rerank, q_ids, Q, k, id_col, vec_col):
    """Shared rerank tail: re-score the candidate (query_id, vec_id)
    pairs in ``top`` with exact cosine against the full vectors and
    return the final (query_id, rank, vec_id, score) top-k."""
    from .similarity import cosine

    spark = top.sparkSession
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": q_ids,
                      "qv": [list(map(float, v)) for v in Q]})
    )
    exact = (
        top.select("query_id", "vec_id")
        .join(rerank.select(F.col(id_col).alias("vec_id"), vec_col),
              "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "vec_id",
            cosine(F.col(vec_col), F.col("qv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    normalize: bool = True,
    rerank: DataFrame | None = None,
    rerank_depth: int = 50,
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, score) — ADC top-k: per query the
    inner-product lookup table ``lut[j, c] = q_j · codebook[j, c]`` is
    precomputed (m × n_codes floats, driver-side — queries are the
    small side by definition) and each code row scores with ``m``
    gathers + a sum.  ``normalize=True`` makes scores cosine.

    With ``rerank=`` the top ``rerank_depth`` ADC candidates re-score
    exactly against the full vectors (broadcast candidate semi-join) —
    ADC error then only affects which candidates enter the window, the
    returned ordering is exact cosine."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape
    q_ids = [int(q) for q, _ in queries]
    Q = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    if normalize:
        Q = _l2_normalize(Q)
    # luts: (n_q, m, n_codes)
    luts = np.einsum("qjs,jcs->qjc", Q.reshape(len(Q), m, sub), books)

    depth = rerank_depth if rerank is not None else k

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            outs = []
            for qi, qid in enumerate(q_ids):
                # gather lut[j, C[:, j]] per subspace and sum
                s = luts[qi][np.arange(m)[None, :], C].sum(axis=1)
                outs.append(pd.DataFrame({
                    "query_id": qid,
                    "vec_id": pdf[id_col].to_numpy(),
                    "score": s,
                }))
            yield pd.concat(outs, ignore_index=True)

    scored = codes.mapInPandas(
        scan, "query_id bigint, vec_id bigint, score double"
    ).where(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("vec_id")
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= depth)
    )
    if rerank is None:
        return top.select("query_id", "rank", "vec_id", "score")
    return _exact_rerank(top, rerank, q_ids, Q, k, id_col, vec_col)


# --- IVF-PQ: coarse quantizer + residual PQ (FAISS "IVFx,PQy") -------
#
# The billion-scale layout: an IVF coarse quantizer prunes WHICH codes
# are scanned (n_probe/n_cells of the corpus) and PQ compresses WHAT is
# scanned (m bytes per vector).  Vectors are encoded as the PQ codes of
# their RESIDUAL against the assigned cell centroid — residuals cluster
# near zero, so the same codebook budget spends its resolution where
# the data is (Jégou et al. 2011, §IV "IVFADC").
#
# Score decomposition that makes ADC work unchanged:
#     q · x  =  q · c(x)  +  q · r(x)
#            =  qc[cid]   +  Σ_j lut[j, code_j]
# One extra per-cell constant next to the same m table lookups.
#
# 100 TB shape: the codes table is written partitioned by ``cid`` so a
# query batch probing p of C cells reads p/C of the files (partition
# pruning does the candidate selection before any compute); encode is
# one matmul per subspace per Arrow batch; only centroids + codebooks
# (model state, ~n_cells*dim + m*n_codes*sub floats) live driver-side.


def _train_books_on(X: np.ndarray, m: int, n_codes: int, iters: int,
                    seed: int) -> np.ndarray:
    """Per-subspace Lloyd k-means on an in-memory sample (shared by
    pq_train_codebooks and ivfpq_build)."""
    sub = X.shape[1] // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        Xj = X[:, j * sub: (j + 1) * sub]
        uniq = np.unique(Xj, axis=0)
        if len(uniq) >= n_codes:
            cents = uniq[rng.permutation(len(uniq))[:n_codes]].copy()
        else:
            reps = np.resize(uniq, (n_codes, sub)).astype(np.float64)
            cents = reps + rng.normal(0, 1e-6, reps.shape)
        for _ in range(iters):
            d = ((Xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(n_codes):
                pts = Xj[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[j] = cents
    return books


def ivfpq_build(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 65536,
    seed: int = 42,
):
    """Train the coarse quantizer + residual codebooks and encode the
    corpus.  Returns ``(centroids, books, codes)`` where ``codes`` is a
    DataFrame ``(id_col, cid int, codes array<int>)`` — the complete
    IVF-PQ index (write it ``partitionBy("cid")`` for pruned scans).

    Training state is bounded: centroids via the distributed
    spherical-k-means in similarity.py, codebooks on a deterministic
    hash-ordered sample of residuals (FAISS practice: ~100k vectors
    train a PQ regardless of corpus size)."""
    from .similarity import ivf_train_centroids

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    cents = ivf_train_centroids(
        embeddings, dim, n_cells=n_cells, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    cu = cents.T  # unit rows from ivf_train_centroids

    sample = (
        embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id").cast("string")), F.col("id"))
        .limit(sample_n)
        .collect()
    )
    X = _l2_normalize(
        np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    )
    resid = X - cents[(X @ cu).argmax(axis=1)]
    books = _train_books_on(resid, m, n_codes, iters=max(iters, 8),
                            seed=seed)

    sub = dim // m
    c_sq = (books ** 2).sum(axis=2)  # (m, n_codes)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )

    enc_schema = StructType([
        StructField("cid", IntegerType()),
        StructField("codes", ArrayType(IntegerType())),
    ])

    @pandas_udf(enc_schema)
    def enc(vecs: pd.Series) -> pd.DataFrame:
        Xb = _l2_normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        cid = (Xb @ cu).argmax(axis=1)
        R = Xb - cents[cid]
        codes = np.empty((len(Xb), m), dtype=np.int32)
        for j in range(m):
            Rj = R[:, j * sub: (j + 1) * sub]
            codes[:, j] = (2.0 * (Rj @ books[j].T)
                           - c_sq[j][None, :]).argmax(axis=1)
        return pd.DataFrame({"cid": cid.astype(np.int32),
                             "codes": list(codes)})

    codes = embeddings.select(
        F.col(id_col).alias(id_col), enc(F.col(vec_col)).alias("e")
    ).select(id_col, F.col("e.cid").alias("cid"),
             F.col("e.codes").alias("codes"))
    return cents, books, codes


def ivfpq_topk(
    codes: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    rerank: DataFrame | None = None,
    rerank_depth: int = 50,
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, score) — ADC scan restricted to each
    query's ``n_probe`` max-cosine cells: score = qc[cid] + m LUT
    gathers on the residual codes.  The cell filter is pushed into the
    scan as ``cid IN (union of probed cells)`` so a cid-partitioned
    codes table prunes files before any Python runs; the per-query
    probe mask is then applied batch-side.  Optional exact re-rank as
    in :func:`pq_adc_topk`."""
    cents = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape
    q_ids = [int(q) for q, _ in queries]
    Q = _l2_normalize(
        np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    )
    qc = Q @ cents.T                          # (n_q, n_cells)
    probes = np.argsort(-qc, axis=1, kind="stable")[:, :n_probe]
    luts = np.einsum("qjs,jcs->qjc", Q.reshape(len(Q), m, sub), books)
    probed_union = sorted({int(c) for row in probes for c in row})

    depth = rerank_depth if rerank is not None else k

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            cid = pdf["cid"].to_numpy().astype(np.int64)
            ids = pdf[id_col].to_numpy()
            outs = []
            for qi, qid in enumerate(q_ids):
                mask = np.isin(cid, probes[qi])
                if not mask.any():
                    continue
                s = (qc[qi][cid[mask]]
                     + luts[qi][np.arange(m)[None, :], C[mask]].sum(axis=1))
                outs.append(pd.DataFrame({
                    "query_id": qid, "vec_id": ids[mask], "score": s,
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = (
        codes.where(F.col("cid").isin(probed_union))
        .mapInPandas(scan, "query_id bigint, vec_id bigint, score double")
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("vec_id")
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= depth)
    )
    if rerank is None:
        return top.select("query_id", "rank", "vec_id", "score")
    return _exact_rerank(top, rerank, q_ids, Q, k, id_col, vec_col)
