"""Per-field similarity modules — ES's pluggable scoring beyond BM25.

ES lets a mapping pick the Lucene similarity used for a text field
(`"similarity": {"type": "LMDirichlet", "mu": 2000}` …).  The reference
inherits that surface through its stock `RestHighLevelClient`
(`utils/elasticsearch/ESClient.java`); the BM25 default is
`query/bm25.py` — this module adds the rest of the menu over the SAME
logical index (postings / term_stats / corpus_stats), so switching
similarity never rebuilds or reshuffles anything:

- ``lm_dirichlet``       — Lucene ``LMDirichletSimilarity`` (mu=2000)
- ``lm_jelinek_mercer``  — Lucene ``LMJelinekMercerSimilarity`` (λ=0.1)
- ``dfi``                — Lucene ``DFISimilarity`` (standardized /
                           saturated / chisquared independence measures)
- ``boolean``            — Lucene ``BooleanSimilarity`` (score = boost
                           per matched term)
- ``scripted``           — ES scripted similarity: any SQL expression
                           over ``tf, dl, df, ttf, n_docs, avgdl,
                           sum_ttf`` (the Painless ``score`` script's
                           variable set), evaluated JVM-side

Formulas follow the published Lucene implementations (all public
algorithm; Zhai & Lafferty 2004 for the LM pair, Kocabaş & Dinçer 2011
for DFI):

    p(t|C)        = (ttf + 1) / (sum_ttf + 1)          # LMStats
    LMDirichlet   = max(0, ln(1 + tf/(mu·p)) + ln(mu/(dl+mu)))
    LMJM          = ln(1 + ((1-λ)·tf/dl) / (λ·p))
    DFI: expected = (ttf + 1) · dl / (sum_ttf + 1)
         score    = 0                         if tf ≤ expected
                  = log2(measure + 1)         otherwise
         standardized = (tf-e)/sqrt(e); saturated = (tf-e)²/(tf+e);
         chisquared   = (tf-e)²/e

Scale shape is identical to ``bm25_topk``: analyzed query terms are a
broadcast probe into the postings relation (corpus never shuffles for
the probe), one hash aggregation per (query_id, doc_id), and a per-query
top-k window.  Everything is whole-stage-codegen arithmetic — no UDFs.

Ranking is (score DESC, doc_id ASC), float64, duplicate query terms
count once — the same determinism contract as the BM25 path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..index.build import LogicalIndex
from .bm25 import analyze_queries

#: defaults mirror ES's module defaults
DEFAULT_MU = 2000.0
DEFAULT_LAMBDA = 0.1

_MEASURES = ("standardized", "saturated", "chisquared")


def _collection_prob(sum_ttf: float) -> Column:
    """Lucene LMStats.collectionProbability: (ttf+1)/(sum_ttf+1)."""
    return (F.col("ttf") + F.lit(1.0)) / F.lit(float(sum_ttf) + 1.0)


def _contrib(similarity: str, stats: dict, *, mu: float, lam: float,
             measure: str, script: str | None) -> Column:
    """Per-(query term, posting) score contribution column.

    Operates over columns ``tf`` (double), ``dl`` (double), ``df``,
    ``ttf`` from the postings⋈term_stats join.
    """
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    if similarity == "lm_dirichlet":
        p = _collection_prob(stats["sum_ttf"])
        raw = (
            F.log(F.lit(1.0) + tf / (F.lit(mu) * p))
            + F.log(F.lit(mu) / (dl + F.lit(mu)))
        )
        return F.greatest(raw, F.lit(0.0))  # Lucene clamps at 0
    if similarity == "lm_jelinek_mercer":
        p = _collection_prob(stats["sum_ttf"])
        return F.log(
            F.lit(1.0) + (F.lit(1.0 - lam) * tf / dl) / (F.lit(lam) * p)
        )
    if similarity == "dfi":
        if measure not in _MEASURES:
            raise ValueError(f"independence measure {measure!r} not in "
                             f"{_MEASURES}")
        expected = (
            (F.col("ttf") + F.lit(1.0)) * dl
            / F.lit(float(stats["sum_ttf"]) + 1.0)
        )
        if measure == "standardized":
            m = (tf - expected) / F.sqrt(expected)
        elif measure == "saturated":
            m = (tf - expected) * (tf - expected) / (tf + expected)
        else:  # chisquared
            m = (tf - expected) * (tf - expected) / expected
        return F.when(
            tf <= expected, F.lit(0.0)
        ).otherwise(F.log2(m + F.lit(1.0)))
    if similarity == "boolean":
        return F.lit(1.0)
    if similarity == "scripted":
        if not script:
            raise ValueError("scripted similarity needs a script= SQL "
                             "expression over tf/dl/df/ttf/n_docs/avgdl/"
                             "sum_ttf")
        return F.expr(script).cast("double")
    raise ValueError(f"unknown similarity {similarity!r} — pick from "
                     "lm_dirichlet | lm_jelinek_mercer | dfi | boolean "
                     "| scripted (BM25 lives in query/bm25.py)")


def similarity_topk(
    index: LogicalIndex,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "code",
    similarity: str = "lm_dirichlet",
    mu: float = DEFAULT_MU,
    lam: float = DEFAULT_LAMBDA,
    measure: str = "standardized",
    script: str | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) under the chosen similarity.

    ``queries`` is ``(query_id, query_text)``; scoring sums per-term
    contributions over the doc's matched query terms exactly like the
    BM25 path, so every similarity shares one physical plan shape.
    For ``scripted``, ``script`` is a SQL expression over the columns
    ``tf, dl, df, ttf`` plus the literals ``n_docs, avgdl, sum_ttf``
    (exposed as columns on the probe side).
    """
    stats = index.corpus_stats
    qterms = analyze_queries(queries, analyzer).join(
        index.term_stats, "term"
    )
    if similarity == "scripted":
        # expose corpus constants as columns so scripts can use them
        qterms = (
            qterms.withColumn("n_docs", F.lit(float(stats["doc_count"])))
            .withColumn("avgdl", F.lit(float(stats["avgdl"]) or 1.0))
            .withColumn("sum_ttf", F.lit(float(stats["sum_ttf"])))
        )
    probe_cols = [c for c in qterms.columns if c != "term"]
    scored = (
        index.postings.join(
            F.broadcast(qterms.select("term", *probe_cols)), "term"
        )
        .withColumn(
            "contrib",
            _contrib(similarity, stats, mu=mu, lam=lam,
                     measure=measure, script=script),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
        # boolean/DFI can score a doc 0 on every matched term; ES still
        # returns the hit (it matched), so keep zero-score docs
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )
