"""ES ``_rank_eval``: ranking-quality metrics for a batch of queries —
precision@k, recall@k, MRR and nDCG@k per query, from a ranked results
table and a graded judgments table.

The reference measures its classifier with a single accuracy number
(`ElasticsearchTest.java` asserts hit counts; Kaggle scores the
submission) but offers no search-quality harness; ES exposes one as
``POST _rank_eval``.  This is that API over DataFrames: everything is
joins + window functions over the (small) per-query top-k — the corpus
never appears, so cost is O(queries × k) regardless of index size.

Tables:

- results    (query_id, doc_id, rank)   rank 1-based, ≤ k rows/query
- judgments  (query_id, doc_id, grade)  grade ≥ 1 = relevant (graded
  relevance feeds nDCG; precision/recall/MRR binarize at grade > 0)

Metric definitions match ES's documented ones:

- precision@k = |relevant in top-k| / k  (ES divides by k, not by
  retrieved count, when ``k`` docs were requested)
- recall@k    = |relevant in top-k| / |relevant|
- MRR         = 1 / rank of the first relevant hit (0 if none)
- nDCG@k      = Σ (2^grade − 1)/log2(rank+1)  ÷  same over the ideal
  (grade-desc) ordering of that query's judgments, top-k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query metric row: ``(query_id, precision_k, recall_k, mrr,
    ndcg_k)``.  Queries with no judged-relevant docs score 0 on all
    metrics (ES emits 0, not null).

    Plan shape: one broadcast-sized join of top-k results to judgments
    on (query, doc), two per-query aggs, one window over judgments for
    the ideal DCG — every relation is O(queries × k)."""
    q, d, r, g = query_col, doc_col, rank_col, grade_col
    topk = results.where(F.col(r) <= k)
    joined = (
        topk.join(judgments, [q, d], "left")
        .withColumn("_g", F.coalesce(F.col(g), F.lit(0)).cast("double"))
    )
    got = joined.groupBy(q).agg(
        (F.sum((F.col("_g") > 0).cast("int")) / F.lit(k)).alias("precision_k"),
        F.max(
            F.when(F.col("_g") > 0, 1.0 / F.col(r)).otherwise(F.lit(0.0))
        ).alias("mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("_g")) - 1.0)
            / F.log2(F.col(r) + F.lit(1.0))
        ).alias("_dcg"),
        F.sum((F.col("_g") > 0).cast("bigint")).alias("_hits"),
    )
    w = Window.partitionBy(q).orderBy(
        F.desc(g), F.asc(d)  # deterministic ideal ordering
    )
    ideal = (
        judgments.where(F.col(g) > 0)
        .withColumn("_ir", F.row_number().over(w))
        .where(F.col("_ir") <= k)
        .groupBy(q)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(g).cast("double")) - 1.0)
                / F.log2(F.col("_ir") + F.lit(1.0))
            ).alias("_idcg"),
        )
    )
    n_rel = judgments.where(F.col(g) > 0).groupBy(q).agg(
        F.count(F.lit(1)).alias("_nrel")
    )
    return (
        got.join(ideal, q, "left")
        .join(n_rel, q, "left")
        .select(
            F.col(q),
            F.round("precision_k", 6).alias("precision_k"),
            F.round(
                F.when(
                    F.coalesce(F.col("_nrel"), F.lit(0)) > 0,
                    F.col("_hits") / F.col("_nrel"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_k"),
            F.round("mrr", 6).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0,
                    F.col("_dcg") / F.col("_idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_k"),
        )
    )
