"""Multinomial Naive Bayes — the reference's classifier layer
(`v1/classifier/OpenNLPClassifier.java:26-110`, NAIVEBAYES doccat), as
pure DataFrame aggregations from the same term-frequency aggregates the
index build uses (SURVEY §2.4 A8/A9).

Engine spec (documented; the pandas oracle implements it identically):

    prior(c)      = ln(docs_c / docs_total)
    ll(c, t)      = ln((count(c,t) + α) / (total_c + α·V))      α = 1.0
    default(c)    = ln(α / (total_c + α·V))                     # unseen-in-c
    score(d, c)   = prior(c) + Σ_{t ∈ d ∩ V} tf(d,t) · ll*(c,t)
    prediction(d) = argmax_c score(d,c), ties → class name ASC

Tokens absent from the training vocabulary V are ignored.  The k-fold
split is the reference's deterministic ``_id % k`` script query
(`OpenNLPClassifierES.java:31-33`).

Scale shape: the model is tiny (|V|·|classes| rows) → pivoted to a
per-term class-weight array and broadcast; scoring is ONE shuffle
(groupBy doc) producing per-class partial sums as columns, and the
argmax is array arithmetic — no per-class row expansion, no window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from ..analyzer.spark_udfs import analyze_fields

ALPHA = 1.0


@dataclass
class NBModel:
    priors: DataFrame       # (label, log_prior, default_ll)
    likelihood: DataFrame   # (label, term, ll)
    vocab: DataFrame        # (term)
    vocab_size: int
    labels: list[str]


def _doc_tokens(
    docs: DataFrame,
    text_cols: list[str],
    analyzer: str,
    id_col: str,
) -> DataFrame:
    """(id, term, cnt) — multi-field tokenize+concat (T8) then tf."""
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(analyze_fields(text_cols, analyzer)).alias("term"),
        )
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_nb(
    docs: DataFrame,
    text_cols: list[str],
    label_col: str,
    analyzer: str = "default",
    id_col: str = "id",
    alpha: float = ALPHA,
) -> NBModel:
    """Train on rows whose label is present and non-empty (P9,
    `FilteredJsonDocumentStream.java:30-47`)."""
    labeled = docs.where(
        F.col(label_col).isNotNull() & (F.col(label_col) != "")
    )
    lab = labeled.select(F.col(id_col).alias("_id"),
                         F.col(label_col).alias("label"))
    # Tokenize with the label carried through — Σ_d tf(d,t) grouped by
    # class is the same count as grouping the raw token stream by
    # (label, term), without a per-doc agg or an id join (one shuffle,
    # map-side combined, instead of two shuffles + a join).
    term_counts = (
        labeled.select(
            F.col(label_col).alias("label"),
            F.explode(analyze_fields(text_cols, analyzer)).alias("term"),
        )
        .groupBy("label", "term")
        .agg(F.count(F.lit(1)).alias("count"))
    ).cache()

    vocab = term_counts.select("term").distinct().cache()
    v = vocab.count()

    class_totals = term_counts.groupBy("label").agg(
        F.sum("count").alias("total")
    )
    doc_counts = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = labeled.count()

    priors = (
        doc_counts.join(class_totals, "label", "left")
        .na.fill({"total": 0})
        .select(
            "label",
            F.log(F.col("n_docs") / F.lit(float(n_total))).alias("log_prior"),
            F.log(
                F.lit(alpha)
                / (F.col("total") + F.lit(alpha) * F.lit(float(v)))
            ).alias("default_ll"),
            "total",
        )
    ).cache()

    likelihood = (
        term_counts.join(priors.select("label", "total"), "label")
        .select(
            "label",
            "term",
            F.log(
                (F.col("count") + F.lit(alpha))
                / (F.col("total") + F.lit(alpha) * F.lit(float(v)))
            ).alias("ll"),
        )
    ).cache()

    labels = [r["label"] for r in priors.select("label").orderBy("label").collect()]
    return NBModel(priors.drop("total"), likelihood, vocab, v, labels)


def predict_nb(
    model: NBModel,
    docs: DataFrame,
    text_cols: list[str],
    analyzer: str = "default",
    id_col: str = "id",
    keep_scores: bool = False,
    tie_round: int | None = None,
) -> DataFrame:
    """(id, prediction [, score]) — argmax_c of the documented score.

    ``tie_round``: round scores to N decimals before the argmax —
    cross-engine determinism knob for oracle comparisons (float64 sums
    accumulate in engine-specific order)."""
    # Scale shape: ONE shuffle (groupBy doc), no window, no per-class
    # row expansion.  Per-term class weights are pivoted into an array
    # in label order and broadcast; per-doc scores are an element-wise
    # array aggregation; argmax = array_position of array_max (first
    # match → smallest label, the reference's tie-break).
    labels = model.labels
    k = len(labels)
    pr = {
        r["label"]: (float(r["log_prior"]), float(r["default_ll"]))
        for r in model.priors.collect()
    }

    deltas = (
        model.likelihood
        .join(model.priors.select("label", "default_ll"), "label")
        .withColumn("delta", F.col("ll") - F.col("default_ll"))
        .groupBy("term")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("label", "delta"))
            ).alias("m")
        )
        .select(
            "term",
            F.array(*[
                F.coalesce(F.col("m")[F.lit(c)], F.lit(0.0)) for c in labels
            ]).alias("dvec"),
        )
    )

    toks = _doc_tokens(docs, text_cols, analyzer, id_col)
    per_doc = (
        toks.join(F.broadcast(deltas), "term")  # vocab filter included
        .groupBy("_id")
        .agg(
            F.sum("cnt").alias("known_cnt"),
            *[
                F.sum(F.col("cnt") * F.col("dvec")[i]).alias(f"_s{i}")
                for i in range(k)
            ],
        )
    )

    all_ids = docs.select(F.col(id_col).alias("_id"))
    base = all_ids.join(per_doc, "_id", "left").na.fill(
        {"known_cnt": 0, **{f"_s{i}": 0.0 for i in range(k)}}
    )
    scores = F.array(*[
        F.lit(pr[c][0])
        + F.col("known_cnt") * F.lit(pr[c][1])
        + F.col(f"_s{i}")
        for i, c in enumerate(labels)
    ])
    rank_scores = (
        F.transform(scores, lambda s: F.round(s, tie_round))
        if tie_round is not None else scores
    )
    base = base.withColumn("_scores", scores).withColumn(
        "_best", F.array_position(rank_scores, F.array_max(rank_scores))
    )
    out = base.select(
        F.col("_id").alias(id_col),
        F.element_at(
            F.array(*[F.lit(c) for c in labels]), F.col("_best").cast("int")
        ).alias("prediction"),
        F.element_at("_scores", F.col("_best").cast("int")).alias("score"),
    )
    return out if keep_scores else out.drop("score")


def accuracy(
    docs: DataFrame, predictions: DataFrame, label_col: str, id_col: str = "id"
) -> float:
    """A6 (`OpenNLPClassifier.java:93-110`)."""
    joined = docs.select(id_col, label_col).join(predictions, id_col)
    row = joined.agg(
        F.avg(
            (F.col(label_col) == F.col("prediction")).cast("double")
        ).alias("acc")
    ).collect()[0]
    return float(row["acc"]) if row["acc"] is not None else float("nan")


def kfold_validation(
    docs: DataFrame,
    text_cols: list[str],
    label_col: str,
    k: int = 3,
    analyzer: str = "default",
    id_col: str = "id",
) -> dict:
    """X1/X3/A10: deterministic id%k folds, train on k-1, mean accuracy
    (`OpenNLPClassifierES.java:20-58`)."""
    labeled = docs.where(
        F.col(label_col).isNotNull() & (F.col(label_col) != "")
    ).cache()
    accs = []
    for fold in range(k):
        train = labeled.where(F.pmod(F.col(id_col), F.lit(k)) != fold)
        test = labeled.where(F.pmod(F.col(id_col), F.lit(k)) == fold)
        model = train_nb(train, text_cols, label_col, analyzer, id_col)
        preds = predict_nb(model, test, text_cols, analyzer, id_col)
        accs.append(accuracy(test, preds, label_col, id_col))
    return {"fold_accuracies": accs, "mean_accuracy": sum(accs) / k}


def enrich(
    docs: DataFrame,
    predictions: DataFrame,
    target_col: str,
    id_col: str = "id",
) -> DataFrame:
    """J2 + P11: left-join predictions, write only where changed
    (null-safe, missing → ''), mirroring
    `OpenNLPEnricher.java:96-112` / `OpenNLPMultiEnricher.java:142-168`.
    Returns the update set (id, <target_col>) — the MERGE source."""
    pred = predictions.withColumnRenamed("prediction", "_pred")
    joined = docs.select(id_col, target_col).join(pred, id_col, "left")
    changed = joined.where(
        F.col("_pred").isNotNull()
        & ~F.coalesce(F.col(target_col), F.lit("")).eqNullSafe(F.col("_pred"))
    )
    return changed.select(id_col, F.col("_pred").alias(target_col))


def multi_enrich(
    docs: DataFrame,
    text_cols: list[str],
    target_cols: list[str],
    analyzer: str = "default",
    id_col: str = "id",
) -> DataFrame:
    """J3: one model per target over a single cached scan
    (`OpenNLPMultiEnricher.java:93-163`), predictions combined into one
    per-doc update row; Spark DAG reuse replaces the reference's
    MultiplexIterators."""
    docs = docs.cache()
    out = None
    for target in target_cols:
        model = train_nb(docs, text_cols, target, analyzer, id_col)
        preds = predict_nb(model, docs, text_cols, analyzer, id_col)
        upd = enrich(docs, preds, target, id_col).withColumnRenamed(
            target, f"pred_{target}"
        )
        out = upd if out is None else out.join(upd, id_col, "full_outer")
    return out
