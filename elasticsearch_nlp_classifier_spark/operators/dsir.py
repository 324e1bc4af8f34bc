"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pretraining documents from a huge raw corpus so
their distribution matches a small high-quality target corpus.

Published method, re-expressed relationally:

1. hash every token into ``n_buckets`` (the paper's hashed n-gram
   feature space — a vocabulary never materializes);
2. estimate bucket distributions ``p_target`` and ``p_raw`` from the
   two corpora (add-α smoothing keeps unseen buckets finite);
3. per-doc importance log-weight = Σ_tokens log(p_target[b]/p_raw[b]) —
   docs that look like the target score high;
4. sample WITHOUT replacement ∝ weight via Gumbel-top-k
   (key = logweight + Gumbel(0,1)); the Gumbel draw comes from the
   engine's portable md5-uniform hash, so selection is deterministic,
   reproducible across cluster sizes, and replayable in ANSI SQL for
   the correctness oracle.

Scale shape: two token-count aggregations sized by ``n_buckets`` (the
distributions broadcast — they are KB-sized), one per-doc weight
aggregation over the raw corpus's exploded tokens with map-side
combine, and a TakeOrdered for the top-k.  The raw corpus is scanned
twice (once for p_raw, once for weights) and never joined against
itself; at 100 TB both passes are embarrassingly parallel.

Tokens use the JVM ``simple_code`` analyzer (lower + [a-z0-9]+ runs) so
the whole pipeline stays codegen and the DuckDB twin tokenizes
identically.  Bucketing uses 60-bit md5 (`sampling.hash_uniform`) —
portable, engine-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform

__all__ = ["dsir_bucket_counts", "dsir_weights", "dsir_select"]


def _tokens(text_col: str) -> Column:
    from ..analyzer.spark_udfs import simple_code_tokens

    return simple_code_tokens(text_col)


def _bucket(tok: Column, n_buckets: int) -> Column:
    return F.floor(
        hash_uniform(tok, salt="dsir") * F.lit(float(n_buckets))
    ).cast("int")


def dsir_bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int,
) -> DataFrame:
    """(bucket, cnt) token counts over the hashed feature space — one
    explode + hash aggregation, n_buckets rows out."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .select(_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """(id_col, dsir_logweight) per raw doc.

    ``log p(bucket)`` uses add-``alpha`` smoothing over ``n_buckets``:
    ``ln((cnt + α) / (total + α·B))``.  The per-bucket log-ratio table
    (≤ n_buckets rows) broadcasts into the raw corpus's exploded-token
    aggregation — no corpus-sized shuffle beyond the per-doc combine.
    """
    tgt = dsir_bucket_counts(target, text_col, n_buckets)
    rawc = dsir_bucket_counts(raw, text_col, n_buckets)
    t_total = tgt.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = rawc.agg(F.sum("cnt")).collect()[0][0] or 0
    denom_t = float(t_total) + alpha * n_buckets
    denom_r = float(r_total) + alpha * n_buckets

    ratio = (
        tgt.withColumnRenamed("cnt", "t_cnt")
        .join(rawc.withColumnRenamed("cnt", "r_cnt"), "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log((F.coalesce("t_cnt", F.lit(0)) + F.lit(alpha))
                      / F.lit(denom_t))
                - F.log((F.coalesce("r_cnt", F.lit(0)) + F.lit(alpha))
                        / F.lit(denom_r))
            ).alias("log_ratio"),
        )
    )
    # a bucket absent from BOTH corpora has log-ratio ln(denom_r/denom_t)
    default_lr = math.log(denom_r / denom_t)
    return (
        raw.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
        .select(id_col, _bucket(F.col("tok"), n_buckets).alias("bucket"))
        .join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("log_ratio", F.lit(default_lr)))
            .alias("dsir_logweight")
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: str = "dsir_gumbel",
) -> DataFrame:
    """Top-``k`` raw docs by Gumbel-perturbed importance weight —
    DSIR's sample-without-replacement step, deterministic via the
    seeded md5-uniform draw: ``key = logweight - ln(-ln(u(doc_id)))``.

    Returns ``(id_col, dsir_logweight, gumbel_key)`` ordered key DESC
    (tie → id ASC).  Docs with zero tokens never appear (no weight row
    — matching the paper's tokenized-input domain)."""
    w = dsir_weights(raw, target, text_col=text_col, id_col=id_col,
                     n_buckets=n_buckets, alpha=alpha)
    u = hash_uniform(F.col(id_col), salt=seed)
    # u ∈ [0,1); ln(-ln(u)) is finite only for u ∈ (0,1) — clamp BOTH
    # ends (a float u within ~2⁻⁵³ of 1 rounds to exactly 1.0, where
    # -ln(-ln(u)) is NULL in Spark and the doc would silently vanish
    # from the ranking) so the expression is total and replayable
    u = F.least(F.greatest(u, F.lit(1e-18)), F.lit(1.0 - 1e-16))
    g = -F.log(-F.log(u))
    return (
        w.withColumn("gumbel_key", F.col("dsir_logweight") + g)
        .orderBy(F.desc(F.round("gumbel_key", 9)), F.asc(id_col))
        .limit(int(k))
    )
