#!/usr/bin/env python
"""NB classifier job — spark-submit entrypoint mirroring the
reference's three classifier mains (SURVEY §3.1-3.2):

    # k-fold validation (OpenNLPClassifierES.main)
    spark-submit --py-files engine.zip jobs/classify.py kfold \
        --input <corpus> --text-cols content --label lang --k 3

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["kfold", "train", "enrich"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--text-cols", required=True,
                    help="comma-separated text columns (T8 concat order)")
    ap.add_argument("--label", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--analyzer", default="code")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--model", default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    text_cols = args.text_cols.split(",")

    from elasticsearch_nlp_classifier_spark.classifier import (
        enrich, kfold_validation, predict_nb, train_nb,
    )
    from elasticsearch_nlp_classifier_spark.sources import (
        load_model, read_corpus, save_model,
    )
    from elasticsearch_nlp_classifier_spark.session import get_spark

    spark = get_spark(app_name=f"nb-{args.mode}")
    docs = read_corpus(spark, args.input)

    if args.mode == "kfold":
        res = kfold_validation(
            docs, text_cols, args.label, k=args.k,
            analyzer=args.analyzer, id_col=args.id_col,
        )
        for i, a in enumerate(res["fold_accuracies"]):
            print(f"fold {i}: accuracy {a:.6f}")
        print(f"mean accuracy: {res['mean_accuracy']:.6f}")
    elif args.mode == "train":
        if not args.model:
            ap.error("--model required for train")
        model = train_nb(docs, text_cols, args.label,
                         analyzer=args.analyzer, id_col=args.id_col)
        save_model(model, args.model)
        print(f"saved model ({model.vocab_size} terms, "
              f"{len(model.labels)} classes) to {args.model}")
    else:  # enrich
        if not args.model or not args.output:
            ap.error("--model and --output required for enrich")
        model = load_model(spark, args.model)
        preds = predict_nb(model, docs, text_cols,
                           analyzer=args.analyzer, id_col=args.id_col)
        updates = enrich(docs, preds, args.label, id_col=args.id_col)
        updates.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} updates "
              f"to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
