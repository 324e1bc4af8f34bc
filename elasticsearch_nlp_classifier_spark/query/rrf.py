"""Reciprocal-rank fusion (RRF) — hybrid lexical+vector search, the
retrieval pattern ES ships as ``rank: {rrf: ...}`` (available to any
user of the reference's stock client,
`utils/elasticsearch/ESClient.java`; the engine supplies both
retrievers natively: WAND BM25 + ANN cosine).

    rrf_score(d) = Σ_over_rankings  weight_r / (rank_constant + rank_r(d))

Docs appearing in only some rankings simply skip the missing terms
(standard RRF).  Ties break on doc_id ASC, matching every other ranked
operator in this engine.

Scale shape: each input ranking is already top-``window`` (bounded —
k·|queries| rows), so fusion is a unionByName of tiny frames + one hash
aggregation + one bounded window.  The expensive parts (BM25 WAND scan,
ANN probe) stay in their own optimized operators; fusion adds no
corpus-sized work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rrf_fuse(
    rankings: list[DataFrame],
    weights: list[float] | None = None,
    rank_constant: int = 60,
    k: int = 10,
) -> DataFrame:
    """Fuse ranked frames — each ``(rank, doc_id)`` (extra columns
    ignored) — into ``(rank, doc_id, score)`` by weighted RRF."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    weights = weights or [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("weights must match rankings")
    parts = [
        r.select(
            "doc_id",
            (F.lit(float(w))
             / (F.lit(float(rank_constant)) + F.col("rank")))
            .alias("rrf"),
        )
        for r, w in zip(rankings, weights)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    fused = union.groupBy("doc_id").agg(F.sum("rrf").alias("score"))
    w = Window.orderBy(F.desc(F.round("score", 12)), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("rank").cast("bigint").alias("rank"),
                "doc_id", "score")
    )


def hybrid_search_topk(
    index,
    embeddings: DataFrame,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    window: int = 50,
    rank_constant: int = 60,
    weights: tuple[float, float] = (1.0, 1.0),
    analyzer: str = "code",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lexical (BM25) + vector (cosine) hybrid: run both retrievers to
    depth ``window``, fuse with RRF, return the top ``k``."""
    from ..operators.similarity import cosine_topk
    from .bm25 import bm25_topk

    spark = embeddings.sparkSession
    q = spark.createDataFrame(
        [(0, query_text)], "query_id int, query_text string"
    )
    lex = bm25_topk(index, q, k=window, analyzer=analyzer).select(
        "rank", "doc_id"
    )
    # query_id -1: cosine_topk drops rows where vec id == query id
    # (self-match guard); -1 never collides with a corpus doc_id
    vec = cosine_topk(
        embeddings,
        spark.createDataFrame([(-1, [float(x) for x in query_vec])],
                              "query_id bigint, query_vec array<double>"),
        k=window, id_col=id_col, vec_col=vec_col,
    ).select("rank", F.col("vec_id").alias("doc_id"))
    return rrf_fuse([lex, vec], weights=list(weights),
                    rank_constant=rank_constant, k=k)
