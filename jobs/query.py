#!/usr/bin/env python
"""BM25 query job — spark-submit entrypoint for top-k search against a
built index.

    spark-submit --master <master> --py-files engine.zip jobs/query.py \
        --index /path/to/index --query "tokenize stream error" [-k 10] \
        [--analyzer code] [--queries-file qs.txt]

``--queries-file``: one query per line (query_id = line number) — the
whole batch runs as ONE Spark job (block-max WAND over the pruned
block scan).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--analyzer", default="code")
    args = ap.parse_args()
    if not args.query and not args.queries_file:
        ap.error("one of --query / --queries-file is required")

    import pandas as pd

    from elasticsearch_nlp_classifier_spark.index.blocks import PhysicalIndex
    from elasticsearch_nlp_classifier_spark.query.wand import wand_topk
    from elasticsearch_nlp_classifier_spark.session import get_spark

    spark = get_spark(app_name="bm25-query")
    index = PhysicalIndex(args.index, spark)

    if args.queries_file:
        with open(args.queries_file) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    else:
        texts = [args.query]
    qpdf = pd.DataFrame(
        {"query_id": range(1, len(texts) + 1), "query_text": texts}
    )

    t0 = time.time()
    out = wand_topk(index, qpdf, k=args.k, analyzer=args.analyzer)
    rows = out.collect()
    wall = time.time() - t0
    for r in rows:
        print(f"{r['query_id']}\t{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")
    print(f"# {len(texts)} queries in {wall:.3f}s "
          f"({wall * 1000 / len(texts):.1f} ms/query)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
