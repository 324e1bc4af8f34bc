"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation set (the GPT-3 appendix-C / PaLM
protocol — a training doc is contaminated if any length-n word shingle
collides with an eval item; n≈13 for natural text, lower for short
fields).

Scale shape: eval sets are tiny next to a 100 TB corpus (10^4–10^6
items), so the eval shingle table is BROADCAST — the corpus side is one
narrow shingle explode feeding a broadcast hash join, then one partial
aggregated groupBy (doc_id, eval_id).  No corpus-sized shuffle anywhere;
cost is O(corpus tokens) map work.  If the eval side ever outgrows
broadcast, drop the hint and the same plan shuffles on the shingle key.

Shingling reuses :func:`~.dedup.shingle_table` verbatim, so the DuckDB
oracle replicates the whole operator 1:1 in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
    n: int = 13,
) -> DataFrame:
    """Per (doc, eval item) collision report:
    ``(id, eval_id, n_collisions, eval_ngrams, overlap_frac)`` —
    one row per pair with at least one shared n-gram.

    ``overlap_frac`` is collisions / |eval item n-grams| (how much of
    the eval item the training doc covers — the quantity leakage
    studies threshold on)."""
    doc_sh = shingle_table(docs, text_col, id_col, n)
    ev_sh = shingle_table(eval_docs, eval_text_col, eval_id_col, n) \
        .withColumnRenamed("id", "eval_id")
    ev_sizes = ev_sh.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("eval_ngrams")
    )
    hits = (
        doc_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy("id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )
    return hits.join(F.broadcast(ev_sizes), "eval_id").select(
        "id", "eval_id", "n_collisions", "eval_ngrams",
        (F.col("n_collisions") / F.col("eval_ngrams")).alias("overlap_frac"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
    n: int = 13,
    min_collisions: int = 1,
) -> DataFrame:
    """Drop every training doc with >= ``min_collisions`` n-gram
    collisions against any eval item (one broadcast-able anti-join —
    the contaminated id set is small by construction)."""
    bad = (
        ngram_contamination(
            docs, eval_docs, text_col, id_col, eval_text_col, eval_id_col, n
        )
        .groupBy("id")
        .agg(F.sum("n_collisions").alias("total"))
        .where(F.col("total") >= min_collisions)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(bad, id_col, "left_anti")
