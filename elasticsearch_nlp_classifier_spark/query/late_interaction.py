"""ES 8.16+ ``rank_vectors`` late-interaction scoring (ColBERT maxsim).

ES's ``rank_vectors`` field stores *many* vectors per document (e.g.
per-token embeddings) and scores with ``maxSimDotProduct``:

    score(q, d) = Σ_{qv ∈ q} max_{dv ∈ d} (qv · dv)

(Khattab & Zaharia 2020, ColBERT).  The intended ES usage is two-stage:
a cheap first-stage retriever (single-vector kNN / BM25) followed by a
maxsim rescore of the candidate window — mirrored here by
``maxsim_rerank_ivf``.

Spark-first shape
-----------------
The score is a **pure Catalyst expression** — nested higher-order
functions (``aggregate`` over query vectors, ``array_max`` +
``transform`` over doc vectors, ``zip_with`` dot product), all inside
whole-stage codegen; no Python touches the hot loop:

- ``maxsim_topk``    — broadcast the (small) query side against every
  document: the exact brute baseline, O(|docs|·|q|·|d|·dim) — the
  oracle path, quarantined to small candidate sets at scale;
- ``maxsim_rerank_ivf`` — mean-pool each side to one vector, retrieve
  ``n_candidates`` per query through the IVF ANN index (probe cost
  ``n_probe/n_cells`` of the corpus), then exact-maxsim only the
  candidates.  This is the 100 TB path: the corpus-sized stage is the
  pooled single-vector ANN; the expensive late interaction runs on
  O(queries × candidates) rows.

Determinism: scores rounded to 6 decimals, ties break by doc id ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["split_vectors", "maxsim_topk", "maxsim_rerank_ivf"]


def split_vectors(
    df: DataFrame, vec_col: str, n_chunks: int, out_col: str = "vecs"
) -> DataFrame:
    """Derive a multi-vector column by slicing ``vec_col`` into
    ``n_chunks`` equal chunks (cast to double) — a deterministic
    stand-in for per-token embeddings in tests/benchmarks."""
    d = F.size(F.col(vec_col)) / n_chunks
    return df.withColumn(
        out_col,
        F.transform(
            F.sequence(F.lit(1), F.lit(n_chunks)),
            lambda c: F.transform(
                F.slice(
                    F.col(vec_col),
                    ((c - 1) * d + 1).cast("int"),
                    d.cast("int"),
                ),
                lambda x: x.cast("double"),
            ),
        ),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _maxsim(qvecs, dvecs):
    return F.aggregate(
        qvecs,
        F.lit(0.0).cast("double"),
        lambda acc, qv: acc
        + F.array_max(F.transform(dvecs, lambda dv: _dot(qv, dv))),
    )


def maxsim_topk(
    docs_mv: DataFrame,
    queries_mv: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    vecs_col: str = "vecs",
    query_id_col: str = "query_id",
    query_vecs_col: str = "qvecs",
) -> DataFrame:
    """Exact maxsim top-k: ``(query_id, rank, doc_id, score_r6)``.
    Brute scan over every document per query — the oracle baseline."""
    q = F.broadcast(
        queries_mv.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vecs_col).alias("qvecs"),
        )
    )
    scored = (
        docs_mv.select(
            F.col(id_col).alias("doc_id"), F.col(vecs_col).alias("dvecs")
        )
        .crossJoin(q)
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id", "doc_id",
            F.round(_maxsim(F.col("qvecs"), F.col("dvecs")), 6)
            .alias("score_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_r6"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_r6")
        .orderBy("query_id", "rank")
    )


def _mean_pool(vecs):
    """Element-wise mean of an array<array<double>> — one JVM reduce."""
    n = F.size(vecs)
    summed = F.aggregate(
        vecs,
        F.transform(F.element_at(vecs, 1), lambda _: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    return F.transform(summed, lambda x: x / n)


def maxsim_rerank_ivf(
    docs_mv: DataFrame,
    queries_mv: DataFrame,
    dim: int | None = None,
    k: int = 10,
    n_candidates: int = 50,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "doc_id",
    vecs_col: str = "vecs",
    query_id_col: str = "query_id",
    query_vecs_col: str = "qvecs",
) -> DataFrame:
    """Two-stage ES idiom: pooled-vector IVF ANN retrieves
    ``n_candidates`` per query, exact maxsim rescores only those.
    Same output shape as ``maxsim_topk``."""
    from ..operators.similarity import ivf_cosine_topk

    docs_pooled = docs_mv.select(
        F.col(id_col).alias("vec_id"),
        _mean_pool(F.col(vecs_col)).alias("embedding"),
    )
    if dim is None:
        # pooled dim = chunk dim, cheaply read off one row
        dim = len(docs_pooled.select("embedding").first()[0])
    q_pooled = queries_mv.select(
        F.col(query_id_col).alias("query_id"),
        _mean_pool(F.col(query_vecs_col)).alias("query_vec"),
    )
    cands = ivf_cosine_topk(
        docs_pooled, q_pooled, dim=dim, k=n_candidates,
        n_cells=n_cells, n_probe=n_probe,
    ).select("query_id", F.col("vec_id").alias("doc_id"))

    joined = (
        cands.join(
            docs_mv.select(
                F.col(id_col).alias("doc_id"),
                F.col(vecs_col).alias("dvecs"),
            ),
            "doc_id",
        )
        .join(
            F.broadcast(
                queries_mv.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(query_vecs_col).alias("qvecs"),
                )
            ),
            "query_id",
        )
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id", "doc_id",
            F.round(_maxsim(F.col("qvecs"), F.col("dvecs")), 6)
            .alias("score_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_r6"), F.asc("doc_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_r6")
        .orderBy("query_id", "rank")
    )
