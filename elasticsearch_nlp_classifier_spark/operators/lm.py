"""Statistical n-gram language-model quality scoring — the KenLM-style
perplexity filter of large-scale data pipelines (CCNet, Gopher): train
bigram counts on the corpus, score every document by its average bigram
log-probability (add-alpha smoothed), and filter the low-probability
tail as noise/outliers.

    logP(w_i | w_{i-1}) = ln( (c(w_{i-1}, w_i) + α) / (c(w_{i-1}) + αV) )
    avg_logp(d) = mean over d's transitions;  ppl(d) = exp(-avg_logp)

Everything is built-in expressions (codegen end to end, SQL-expressible
for the DuckDB oracle).  Scale shape: counting is explode + one
partial-aggregated groupBy each; scoring joins doc transitions against
the bigram table — a shuffle join on (t1, t2) in general, broadcast
when the model is trimmed (``min_count``), then one groupBy(doc).  No
UDFs, no driver-side state beyond the two scalar stats (V, which is an
aggregate the plan computes once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import words_col


def _transitions(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, t1, t2) — one row per adjacent token pair."""
    w = words_col(F.col(text_col))
    n = F.size(w)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("t1"),
            F.element_at(w, i + 1).alias("t2"),
        ),
    )
    return (
        docs.where(n >= 2)
        .select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", "p.t1", "p.t2")
    )


def bigram_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts (term, c), bigram counts (t1, t2, c)).  Bigrams
    below ``min_count`` are trimmed (model-size lever: a trimmed model
    broadcasts; unseen bigrams fall back to the α smoothing mass)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(words_col(F.col(text_col))).alias("term"),
    )
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    bi = (
        _transitions(docs, text_col, id_col)
        .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    return uni, bi


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(id, n_transitions, avg_logp, ppl) per doc with >= 1 transition.
    ``model`` defaults to counts trained on ``docs`` itself (the usual
    self-scoring outlier filter); pass held-out counts to score against
    a reference corpus."""
    uni, bi = model if model is not None else bigram_counts(
        docs, text_col, id_col
    )
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    trans = _transitions(docs, text_col, id_col)
    a = float(alpha)
    scored = (
        trans.join(bi, ["t1", "t2"], "left")
        .withColumnRenamed("c", "c_bi")
        .join(uni.select(F.col("term").alias("t1"),
                         F.col("c").alias("c_uni")), "t1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(a))
                / (F.coalesce(F.col("c_uni"), F.lit(0))
                   + F.lit(a) * F.col("v"))
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.avg("logp").alias("avg_logp"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )


def perplexity_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float = 1e6,
    alpha: float = 0.5,
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Keep docs whose perplexity is <= ``max_ppl`` (docs too short to
    score — under 2 tokens — are dropped, same contract as the quality
    gate's length floor)."""
    sc = bigram_logprob(docs, text_col, id_col, alpha, model)
    keep = sc.where(F.col("ppl") <= max_ppl).select(
        F.col("id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
