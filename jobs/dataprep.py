#!/usr/bin/env python
"""Training-data preparation job — spark-submit entrypoint for the
full pipeline (quality gate → PII redaction → dedup chain → chunking
→ split), with per-stage lineage in {output}/lineage.jsonl:

    spark-submit --py-files engine.zip jobs/dataprep.py \
        --input /data/documents.parquet --output /data/prepared \
        --max-tokens 2048 --overlap 64 --near-dup-threshold 0.7 \
        --paragraph-dedup
"""

from __future__ import annotations

import argparse
import json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--paragraph-dedup", action="store_true")
    ap.add_argument("--train-frac", type=float, default=0.95)
    ap.add_argument("--eval-set", default=None,
                    help="parquet of (eval_id, text) to decontaminate "
                         "against (n-gram collision)")
    ap.add_argument("--decontaminate-n", type=int, default=13)
    ap.add_argument("--target-mix", default=None,
                    help='JSON dict of group -> weight, e.g. '
                         '\'{"web": 0.6, "code": 0.4}\'')
    ap.add_argument("--mix-group-col", default="source")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="bigram-LM perplexity cut (omit to skip)")
    ap.add_argument("--pack-seq-len", type=int, default=None,
                    help="write per-split packing maps at this length")
    args = ap.parse_args()

    from elasticsearch_nlp_classifier_spark.plans import run_dataprep
    from elasticsearch_nlp_classifier_spark.session import get_spark

    spark = get_spark(app_name="dataprep")
    docs = spark.read.parquet(args.input)
    eval_docs = (spark.read.parquet(args.eval_set)
                 if args.eval_set else None)
    out = run_dataprep(
        docs, args.output,
        text_col=args.text_col, id_col=args.id_col,
        max_tokens=args.max_tokens, overlap=args.overlap,
        near_dup_threshold=args.near_dup_threshold,
        paragraph_dedup=args.paragraph_dedup,
        splits={"train": args.train_frac, "val": 1 - args.train_frac},
        eval_docs=eval_docs, decontaminate_n=args.decontaminate_n,
        target_mix=json.loads(args.target_mix) if args.target_mix else None,
        mix_group_col=args.mix_group_col,
        max_ppl=args.max_ppl,
        pack_seq_len=args.pack_seq_len,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
