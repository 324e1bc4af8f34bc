"""Bloom-filter incremental dedup (operators/bloom.py): exactness
under false positives, bitmap determinism + merge, batch amortization."""

import numpy as np
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.bloom import (
    bloom_seen_udf,
    build_content_bloom,
    dedup_against_history,
)

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    hist = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    bm = build_content_bloom(hist, "text", n_bits=1 << 16, k=5)
    seen = bloom_seen_udf(bm, 1 << 16, k=5)
    got = hist.select(
        seen(F.xxhash64(F.coalesce(F.col("text").cast("string"),
                                   F.lit("")))).alias("s")
    ).collect()
    assert all(r["s"] for r in got)  # every inserted item reports seen


def test_dedup_against_history_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist = docs.where(F.col("doc_id") < 250)
    # new batch: 50 re-crawled pages (same content, new ids) + the rest
    recrawl = hist.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    fresh = docs.where(F.col("doc_id") >= 250)
    new = fresh.unionByName(recrawl)
    out = dedup_against_history(new, hist, "text", "doc_id")
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every re-crawl dropped, every fresh doc kept
    assert not any(i >= 10_000 for i in got)
    assert got == {r["doc_id"] for r in fresh.select("doc_id").collect()}
    # schema passes through unchanged
    assert out.columns == new.columns


def test_exact_even_with_tiny_saturated_bloom(spark):
    """An undersized bloom (fpp → 1) makes every row a candidate — the
    verify join must keep the output exact anyway."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist = docs.where(F.col("doc_id") < 100)
    new = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    out = dedup_against_history(new, hist, "text", "doc_id",
                                n_bits=64, k=7)
    assert out.count() == new.count()  # nothing in new is in history


def test_bitmap_deterministic_and_or_mergeable(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") < 100)
    b = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    both = docs.where(F.col("doc_id") < 200)
    bm_a = build_content_bloom(a, "text", n_bits=1 << 16)
    bm_a2 = build_content_bloom(a, "text", n_bits=1 << 16)
    bm_b = build_content_bloom(b, "text", n_bits=1 << 16)
    bm_ab = build_content_bloom(both, "text", n_bits=1 << 16)
    assert np.array_equal(bm_a, bm_a2)              # deterministic
    assert np.array_equal(bm_a | bm_b, bm_ab)       # shard-mergeable


def test_prebuilt_bitmap_amortizes_across_batches(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist = docs.where(F.col("doc_id") < 250)
    bm = build_content_bloom(hist, "text")
    b1 = docs.where((F.col("doc_id") >= 250) & (F.col("doc_id") < 300))
    dup = hist.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 20_000
    )
    out = dedup_against_history(
        b1.unionByName(dup), hist, "text", "doc_id", bitmap=bm
    )
    assert out.count() == b1.count()
