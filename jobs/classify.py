#!/usr/bin/env python
"""Classifier job — spark-submit entrypoint mirroring the reference's
three classifier mains (SURVEY §3.1-3.2).  ``--algorithm`` is the
reference's ``TrainingParameters.ALGORITHM_PARAM`` switch
(`OpenNLPClassifier.java:27-36`: NAIVEBAYES default, MAXENT /
PERCEPTRON alternatives):

    # k-fold validation (OpenNLPClassifierES.main)
    spark-submit --py-files engine.zip jobs/classify.py kfold \
        --input <corpus> --text-cols content --label lang --k 3 \
        --algorithm maxent

    # train + save (OpenNLPClassifier.save)
    spark-submit ... jobs/classify.py train \
        --input <corpus> --text-cols content --label lang --model /m

    # enrich: predict + update-if-changed set (OpenNLPMultiEnricher)
    spark-submit ... jobs/classify.py enrich \
        --input <corpus> --text-cols content --label lang --model /m \
        --output /updates
"""

from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# propagate to forked Python UDF workers (they see PYTHONPATH, not the
# driver's sys.path; --py-files plays this role on a real cluster)
os.environ["PYTHONPATH"] = _ROOT + (
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else ""
)


def _train(docs, args, text_cols):
    from elasticsearch_nlp_classifier_spark.classifier import (
        train_maxent, train_maxent_qn, train_nb, train_perceptron,
    )

    if args.algorithm == "naivebayes":
        return train_nb(docs, text_cols, args.label,
                        analyzer=args.analyzer, id_col=args.id_col)
    if args.algorithm == "maxent":
        return train_maxent(docs, text_cols, args.label, dim=args.dim,
                            iterations=args.iterations,
                            analyzer=args.analyzer, id_col=args.id_col)
    if args.algorithm == "maxent_qn":
        return train_maxent_qn(docs, text_cols, args.label, dim=args.dim,
                               iterations=args.iterations,
                               analyzer=args.analyzer, id_col=args.id_col)
    return train_perceptron(docs, text_cols, args.label, dim=args.dim,
                            epochs=args.epochs,
                            analyzer=args.analyzer, id_col=args.id_col)


def _predict(model, docs, args, text_cols):
    from elasticsearch_nlp_classifier_spark.classifier import (
        predict_linear, predict_nb,
    )

    if args.algorithm == "naivebayes":
        return predict_nb(model, docs, text_cols,
                          analyzer=args.analyzer, id_col=args.id_col)
    return predict_linear(model, docs, text_cols,
                          analyzer=args.analyzer, id_col=args.id_col)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["kfold", "train", "enrich"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--text-cols", required=True,
                    help="comma-separated text columns (T8 concat order)")
    ap.add_argument("--label", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--analyzer", default="code")
    ap.add_argument("--algorithm", default="naivebayes",
                    choices=["naivebayes", "maxent", "maxent_qn", "perceptron"],
                    help="the reference's ALGORITHM_PARAM switch")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--dim", type=int, default=4096,
                    help="hashed feature buckets (linear trainers)")
    ap.add_argument("--iterations", type=int, default=25,
                    help="GD iterations (maxent)")
    ap.add_argument("--epochs", type=int, default=5,
                    help="parameter-mixing epochs (perceptron)")
    ap.add_argument("--model", default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    text_cols = args.text_cols.split(",")

    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.classifier import (
        accuracy, enrich, kfold_validation,
    )
    from elasticsearch_nlp_classifier_spark.session import get_spark
    from elasticsearch_nlp_classifier_spark.sources import (
        load_linear_model, load_model, read_corpus, save_linear_model,
        save_model,
    )

    spark = get_spark(app_name=f"{args.algorithm}-{args.mode}")
    docs = read_corpus(spark, args.input)

    if args.mode == "kfold":
        if args.algorithm == "naivebayes":
            res = kfold_validation(
                docs, text_cols, args.label, k=args.k,
                analyzer=args.analyzer, id_col=args.id_col,
            )
            accs = res["fold_accuracies"]
        else:  # same _id % k folds (P6) for the linear trainers
            accs = []
            for fold in range(args.k):
                tr = docs.where(
                    F.pmod(F.col(args.id_col), F.lit(args.k)) != fold)
                te = docs.where(
                    F.pmod(F.col(args.id_col), F.lit(args.k)) == fold)
                model = _train(tr, args, text_cols)
                preds = _predict(model, te, args, text_cols)
                accs.append(accuracy(te, preds, args.label, args.id_col))
        for i, a in enumerate(accs):
            print(f"fold {i}: accuracy {a:.6f}")
        print(f"mean accuracy: {sum(accs) / len(accs):.6f}")
    elif args.mode == "train":
        if not args.model:
            ap.error("--model required for train")
        model = _train(docs, args, text_cols)
        if args.algorithm == "naivebayes":
            save_model(model, args.model)
            print(f"saved model ({model.vocab_size} terms, "
                  f"{len(model.labels)} classes) to {args.model}")
        else:
            save_linear_model(model, args.model)
            print(f"saved {args.algorithm} model (dim {model.dim}, "
                  f"{len(model.labels)} classes) to {args.model}")
    else:  # enrich
        if not args.model or not args.output:
            ap.error("--model and --output required for enrich")
        model = (load_model(spark, args.model)
                 if args.algorithm == "naivebayes"
                 else load_linear_model(args.model))
        preds = _predict(model, docs, args, text_cols)
        updates = enrich(docs, preds, args.label, id_col=args.id_col)
        updates.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} updates "
              f"to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
