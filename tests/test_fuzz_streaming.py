"""Property-fuzz the incremental (Structured Streaming) indexer:
RANDOM micro-batch splits == one batch build.

`test_streaming.py` pins one fixed 70/50 split; the north rule's
incremental-build claim should not depend on where the batch boundary
falls.  Each seed cuts the (key-ordered) corpus at random points into
3-4 ordered chunks, drops them into the watched directory one at a
time with a fresh `incremental_index_stream` run each (restart from
checkpoint every chunk — the daily-ingest shape), and the final
multi-segment index must match the one-shot batch build on corpus
stats, per-term stats, and WAND top-k (rank + 1e-9 score)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from elasticsearch_nlp_classifier_spark.corpus import gen_corpus_pdf
from elasticsearch_nlp_classifier_spark.corpus.doc_ids import (
    assign_doc_ids,
)
from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query.wand import wand_topk
from elasticsearch_nlp_classifier_spark.streaming import (
    StreamingPhysicalIndex,
    incremental_index_stream,
)

N = 150
QUERY = pd.DataFrame({"query_id": [1, 2, 3],
                      "query_text": ["import def self",
                                     "the error test",
                                     "return value index"]})


@pytest.fixture(scope="module")
def batch_index(spark, tmp_path_factory):
    pdf = gen_corpus_pdf(N)
    docs = assign_doc_ids(spark.createDataFrame(pdf))
    out = str(tmp_path_factory.mktemp("fsb") / "idx")
    return build_physical_index(
        docs, out, text_col="content", analyzer="code",
        block_size=16, salt_threshold=50)


@pytest.mark.parametrize("seed", [5, 6])
def test_fuzz_random_splits_match_batch(spark, batch_index, seed,
                                        tmp_path_factory):
    rng = random.Random(seed)
    pdf = gen_corpus_pdf(N).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    n_chunks = rng.randint(3, 4)
    cuts = sorted(rng.sample(range(10, N - 10), n_chunks - 1))
    bounds = [0] + cuts + [N]
    chunks = [pdf.iloc[bounds[i]:bounds[i + 1]]
              for i in range(n_chunks)]
    assert all(len(c) for c in chunks)

    src = tmp_path_factory.mktemp(f"fss{seed}")
    idx_dir = str(tmp_path_factory.mktemp(f"fsi{seed}") / "idx")
    for bi, chunk in enumerate(chunks):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(
            str(src / f"batch{bi}.parquet"))
        q = incremental_index_stream(
            spark, f"{src}/*.parquet/", idx_dir, analyzer="code",
            block_size=16, salt_threshold=50)
        q.awaitTermination()

    streamed = StreamingPhysicalIndex(idx_dir, spark)
    s, b = streamed.corpus_stats, batch_index.corpus_stats
    assert s["doc_count"] == b["doc_count"] == N
    assert s["sum_ttf"] == b["sum_ttf"]
    got_ts = {r["term"]: (r["df"], r["ttf"])
              for r in streamed.term_stats.collect()}
    want_ts = {r["term"]: (r["df"], r["ttf"])
               for r in batch_index.term_stats.collect()}
    assert got_ts == want_ts

    got = wand_topk(streamed, QUERY, k=10).collect()
    want = wand_topk(batch_index, QUERY, k=10).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in got] == \
        [(r["query_id"], r["rank"], r["doc_id"]) for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9
