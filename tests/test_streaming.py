"""Incremental (Structured Streaming) index: two micro-batches ==
one batch build, exactly-once segment writes, compaction parity."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.corpus import gen_corpus_pdf
from elasticsearch_nlp_classifier_spark.corpus.doc_ids import assign_doc_ids
from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query.wand import wand_topk
from elasticsearch_nlp_classifier_spark.streaming import (
    StreamingPhysicalIndex,
    compact_segments,
    incremental_index_stream,
)

QUERY = __import__("pandas").DataFrame(
    {"query_id": [1, 2], "query_text": ["import def self", "the error test"]}
)


@pytest.fixture(scope="module")
def corpus_batches(spark, tmp_path_factory):
    """Two batches whose concatenation order equals global key order:
    batch 1 repos sort before batch 2 repos."""
    pdf = gen_corpus_pdf(120)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    b1, b2 = pdf.iloc[:70], pdf.iloc[70:]
    src = tmp_path_factory.mktemp("stream_src")
    spark.createDataFrame(b1).coalesce(1).write.parquet(
        str(src / "batch1.parquet")
    )
    return spark, str(src), b2


@pytest.fixture(scope="module")
def streamed(corpus_batches, tmp_path_factory):
    spark, src, b2 = corpus_batches
    idx_dir = str(tmp_path_factory.mktemp("stream_idx") / "idx")

    # micro-batch 1
    q = incremental_index_stream(
        spark, f"{src}/*.parquet/", idx_dir, analyzer="code",
        block_size=16, salt_threshold=50,
    )
    q.awaitTermination()
    # drop batch 2 into the watched dir, resume from checkpoint
    spark.createDataFrame(b2).coalesce(1).write.parquet(
        f"{src}/batch2.parquet"
    )
    q = incremental_index_stream(
        spark, f"{src}/*.parquet/", idx_dir, analyzer="code",
        block_size=16, salt_threshold=50,
    )
    q.awaitTermination()
    return StreamingPhysicalIndex(idx_dir, spark)


@pytest.fixture(scope="module")
def batch_index(spark, tmp_path_factory):
    pdf = gen_corpus_pdf(120)
    docs = assign_doc_ids(spark.createDataFrame(pdf))
    out = str(tmp_path_factory.mktemp("batch_idx") / "idx")
    return build_physical_index(
        docs, out, text_col="content", analyzer="code",
        block_size=16, salt_threshold=50,
    )


def test_two_segments_written(streamed):
    segs = streamed.blocks.select("segment").distinct().collect()
    assert {r["segment"] for r in segs} == {0, 1}


def test_stats_match_batch_build(streamed, batch_index):
    assert streamed.corpus_stats["doc_count"] == 120
    s, b = streamed.corpus_stats, batch_index.corpus_stats
    assert s["sum_ttf"] == b["sum_ttf"]
    assert s["sum_doc_freq"] == b["sum_doc_freq"]
    got = {
        r["term"]: (r["df"], r["ttf"])
        for r in streamed.term_stats.collect()
    }
    want = {
        r["term"]: (r["df"], r["ttf"])
        for r in batch_index.term_stats.collect()
    }
    assert got == want


def test_streaming_query_matches_batch(streamed, batch_index):
    got = wand_topk(streamed, QUERY, k=10).collect()
    want = wand_topk(batch_index, QUERY, k=10).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in got] == [
        (r["query_id"], r["rank"], r["doc_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9


def test_compaction_parity(streamed, batch_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact") / "idx")
    compact = compact_segments(streamed, out, block_size=16,
                               salt_threshold=50)
    assert "segment" not in compact.blocks.columns
    got = wand_topk(compact, QUERY, k=10).collect()
    want = wand_topk(batch_index, QUERY, k=10).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in got] == [
        (r["query_id"], r["rank"], r["doc_id"]) for r in want
    ]


def test_replay_is_idempotent(streamed):
    """Re-delivering a segment overwrites only that segment partition."""
    spark = streamed.spark
    before = streamed.blocks.count()
    seg0 = streamed.blocks.where(F.col("segment") == 0)
    n0 = seg0.count()
    # simulate a replay of batch 0's write
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        seg0.withColumn("segment", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("segment", "tb")
        .parquet(f"{streamed.path}/blocks")
    )
    after = streamed.blocks.count()
    assert after == before
    assert streamed.blocks.where(F.col("segment") == 0).count() == n0


# --- streaming exact dedup (stateful dropDuplicates family) ----------

def test_stream_dedup_across_batches(spark, tmp_path_factory):
    from elasticsearch_nlp_classifier_spark.streaming import (
        dedup_stream_job,
    )

    src = str(tmp_path_factory.mktemp("sd_src"))
    out = str(tmp_path_factory.mktemp("sd_out") / "dd")
    schema = "id BIGINT, content STRING"
    b1 = [(0, "alpha text"), (1, "bravo text"), (2, "alpha text")]
    b2 = [(3, "bravo text"), (4, "charlie text"), (5, "charlie text")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        f"{src}/b1.parquet")
    q = dedup_stream_job(spark, f"{src}/*.parquet/", out, schema)
    q.awaitTermination()
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        f"{src}/b2.parquet")
    q = dedup_stream_job(spark, f"{src}/*.parquet/", out, schema)
    q.awaitTermination()

    got = spark.read.parquet(f"{out}/data")
    rows = {(r["id"], r["content"]) for r in got.collect()}
    contents = sorted(r[1] for r in rows)
    # one survivor per distinct content, across AND within batches
    assert contents == ["alpha text", "bravo text", "charlie text"]
    # keep-FIRST-arrival: batch-1 copies win over batch-2 re-posts
    assert {r[0] for r in rows} <= {0, 1, 2, 4, 5}
    assert 3 not in {r[0] for r in rows}

    # replay with the same checkpoint: no new rows appear
    q = dedup_stream_job(spark, f"{src}/*.parquet/", out, schema)
    q.awaitTermination()
    assert spark.read.parquet(f"{out}/data").count() == 3


def test_stream_dedup_watermark_bounded_state(spark, tmp_path_factory):
    from elasticsearch_nlp_classifier_spark.streaming import (
        dedup_stream_job,
    )

    src = str(tmp_path_factory.mktemp("sdw_src"))
    out = str(tmp_path_factory.mktemp("sdw_out") / "dd")
    schema = "id BIGINT, ts TIMESTAMP, content STRING"
    rows = [
        (0, "2024-01-01 00:00:00", "alpha"),
        (1, "2024-01-01 00:01:00", "alpha"),   # dup within window
        (2, "2024-01-01 00:02:00", "bravo"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, _, c in rows], "id BIGINT, content STRING"
    )
    ts = {i: t for i, t, _ in rows}
    from pyspark.sql import functions as F2
    df = df.withColumn(
        "ts",
        F2.to_timestamp(
            F2.udf(lambda i: ts[i])(F2.col("id"))
        ),
    ).select("id", "ts", "content")
    df.coalesce(1).write.parquet(f"{src}/b1.parquet")
    q = dedup_stream_job(
        spark, f"{src}/*.parquet/", out, schema,
        ts_col="ts", watermark="10 minutes",
    )
    q.awaitTermination()
    got = spark.read.parquet(f"{out}/data")
    assert sorted(r["content"] for r in got.collect()) == ["alpha", "bravo"]
