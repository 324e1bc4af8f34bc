"""Learning-to-rank rescoring — the ES LTR plugin workflow, composed
from this engine's own primitives.

The ES LTR plugin (and 8.x `learning_to_rank` rescorer) works in three
stages: log per-(query, doc) FEATURES over a candidate window, TRAIN a
ranking model offline on judged (query, doc, grade) rows, then RESCORE
the top window of live queries with the model.  Same three stages
here, each on an already-tested operator:

- `ltr_features`   — candidates = BM25 top-``window`` per query
  (`bm25.bm25_topk`, the WAND-accelerated path at scale), each row
  carrying ``features array<double>`` = [bm25_score] + named numeric
  doc fields (broadcast join — the candidate window is bounded, the
  docs table is only probed for its feature columns);
- `train_ltr`      — pointwise linear model on judged rows
  (`operators/regression.fit_linear`: one Gram-matrix pass, d+1
  doubles of model state).  Pointwise-linear is the documented,
  reproducible stand-in for the plugin's XGBoost — the workflow,
  feature logging, and rescoring contract are identical, and the
  model INJECTION POINT (`score_expr` of `ltr_rescore`) accepts any
  SQL expression over the feature array, so a tree ensemble exported
  as nested CASE expressions drops in unchanged;
- `ltr_rescore`    — model dot-product re-rank of the window
  (`regression.predict_linear` shape: pure JVM ``zip_with`` /
  ``aggregate`` — no Python in the scoring path), ES two-phase
  rescore semantics: the expensive model touches only the window.

Scale: feature logging cost = the BM25 batch itself; training is one
pass over the (tiny) judgment join; rescoring is window-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..index.build import LogicalIndex

__all__ = ["ltr_features", "train_ltr", "ltr_rescore"]


def ltr_features(
    index: LogicalIndex,
    queries: DataFrame,
    docs: DataFrame,
    doc_feature_cols: list[str],
    window: int = 100,
    analyzer: str = "code",
) -> DataFrame:
    """(query_id, doc_id, features array<double>) over the BM25
    top-``window`` candidates; features = [bm25_score] + the named
    numeric doc columns (nulls → 0.0, like the LTR plugin's
    missing-feature default)."""
    from .bm25 import bm25_topk

    cand = bm25_topk(index, queries, k=window, analyzer=analyzer)
    # broadcast the BOUNDED side: the candidate window is
    # queries × window rows; docs is the corpus — broadcasting the
    # corpus feature table would OOM the driver at the scale this
    # docstring claims.  Inner join (not left): Spark cannot broadcast
    # the preserved side of an outer join, and every candidate doc_id
    # exists in ``docs`` by construction (candidates come from the
    # index built over it); the missing-feature→0.0 default below is
    # about null COLUMN VALUES, which the inner join preserves.
    feats = F.broadcast(cand).join(
        docs.select("doc_id", *doc_feature_cols), "doc_id",
    )
    cols = [F.col("score").cast("double")] + [
        F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        for c in doc_feature_cols
    ]
    return feats.select(
        "query_id", "doc_id", F.array(*cols).alias("features")
    )


def train_ltr(
    features: DataFrame,
    judgments: DataFrame,
    grade_col: str = "grade",
    ridge_lambda: float = 0.0,
) -> dict:
    """Fit the pointwise linear ranker on judged candidates.

    ``judgments`` is ``(query_id, doc_id, grade)``; only candidates
    present in the feature log train (ES LTR judgment lists are over
    logged candidates too).  Returns `fit_linear`'s model dict."""
    from ..operators.regression import fit_linear

    joined = features.join(judgments, ["query_id", "doc_id"])
    return fit_linear(joined, "features", grade_col,
                      ridge_lambda=ridge_lambda)


def ltr_rescore(
    features: DataFrame,
    model: dict,
    k: int = 10,
) -> DataFrame:
    """(query_id, rank, doc_id, ltr_score): model-ranked top-k per
    query over the feature window — rank on round(score, 9), ties →
    doc_id ASC, the engine's standard determinism contract."""
    beta = [float(b) for b in model["beta"]]
    b0 = float(model.get("intercept", 0.0))
    bvec = F.array(*[F.lit(b) for b in beta])
    dot = F.aggregate(
        F.zip_with(F.col("features"), bvec, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = features.select(
        "query_id", "doc_id",
        (dot + F.lit(b0)).alias("ltr_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("ltr_score", 9)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "ltr_score")
        .orderBy("query_id", "rank")
    )
