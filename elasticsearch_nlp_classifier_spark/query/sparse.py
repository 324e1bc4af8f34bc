"""ES ``sparse_vector`` / ``text_expansion`` retrieval: learned-sparse
scoring (ELSER-style) over a feature-postings table.

Modern ES stores per-document sparse feature vectors — token → weight
maps emitted by a sparse encoder — in a ``sparse_vector`` field and
scores ``sparse_vector``/``text_expansion`` queries as the dot product
``Σ_f q(f) · d(f)``.  The reference's users get this surface from the
same stock client (`utils/elasticsearch/ESClient.java`).

Spark-first shape: the document side is a long **feature-postings
relation** ``(doc_id, feature, weight)`` — exactly an inverted index
with float payloads, so everything the term index does for scale
(hash-partition by feature, prune to query features before any work)
applies verbatim:

- the query's (tiny) feature map broadcasts,
- the postings scan prunes with ``feature IN (...)`` (pushdown —
  a feature-bucketed parquet layout skips irrelevant files exactly
  like the term index's ``tb`` partitions),
- one hash aggregation per doc sums the products,
- TakeOrdered produces top-k.  Work is bounded by Σ df(query features),
  never corpus size.

No learned encoder ships in this environment, so
:func:`text_expansion_features` provides the deterministic expansion
analog — tf·ln(1 + N/df) term weights from the corpus itself (the
oracle replays it in SQL).  Any real encoder output with the same
``(doc_id, feature, weight)`` shape drops in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["text_expansion_features", "sparse_vector_topk"]


def text_expansion_features(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "simple_code",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sparse-expansion weights from the corpus itself:
    ``weight(d, t) = tf(d, t) · ln(1 + N / df(t))`` — the classic
    tf·idf surrogate for a learned sparse encoder (documented stand-in;
    a real model's output table drops in with the same schema).

    Plan: one tokenize + (doc_id, term) hash agg for tf, one term agg
    for df (both map-side combined), broadcast the vocabulary-sized df
    relation back onto the postings.  Returns
    ``(doc_id, feature, weight)``."""
    from ..index.build import build_logical_index

    ix = build_logical_index(
        docs, text_col=text_col, analyzer=analyzer, doc_id_col=doc_id_col
    )
    n_docs = ix.corpus_stats["doc_count"]
    return (
        ix.postings.join(
            F.broadcast(ix.term_stats.select("term", "df")), "term"
        )
        .select(
            "doc_id",
            F.col("term").alias("feature"),
            (
                F.col("tf").cast("double")
                * F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df"))
            ).alias("weight"),
        )
    )


def sparse_vector_topk(
    features: DataFrame,
    query_weights: dict[str, float],
    k: int = 10,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """ES ``sparse_vector`` query: top-``k`` docs by
    ``Σ_f q(f) · d(f)`` over a ``(doc_id, feature, weight)`` relation.

    The query map broadcasts; ``feature.isin(...)`` prunes the postings
    scan before the join (predicate pushdown — with a feature-bucketed
    table this skips row groups / files, the sparse twin of the term
    index's block pruning); one per-doc hash aggregation; TakeOrdered
    ``(score DESC, doc_id ASC)``.  Returns ``(doc_id, rank, score_r9)``
    — ties broken by doc_id like the dense ANN operators."""
    spark = features.sparkSession
    if not query_weights:
        return spark.createDataFrame(
            [], f"{doc_id_col} bigint, rank int, score_r9 double"
        )
    q = spark.createDataFrame(
        [(f, float(w)) for f, w in sorted(query_weights.items())],
        "feature string, q_weight double",
    )
    feats = list(query_weights)
    scored = (
        features.where(F.col("feature").isin(feats))
        .join(F.broadcast(q), "feature")
        .groupBy(doc_id_col)
        .agg(
            F.sum(F.col("weight") * F.col("q_weight")).alias("score")
        )
    )
    top = (
        scored.orderBy(
            F.round("score", 9).desc(), F.asc(doc_id_col)
        )
        .limit(k)
    )
    w = Window.orderBy(F.round("score", 9).desc(), F.asc(doc_id_col))
    return top.select(
        doc_id_col,
        F.row_number().over(w).alias("rank"),
        F.round("score", 9).alias("score_r9"),
    )
