"""Corpus generator: determinism, sha256 ingest invariant (BASELINE.json
input_hint), and distributed doc_id == row_number oracle."""

import pandas as pd

from elasticsearch_nlp_classifier_spark.corpus import (
    assign_doc_ids,
    doc_ids_oracle,
    gen_corpus_pdf,
    gen_row,
    verify_ingest,
)


def test_gen_row_deterministic():
    a, b = gen_row(17), gen_row(17)
    assert a == b
    assert set(a) == {"repo", "path", "commit", "lang", "content"}
    assert len(a["commit"]) == 40


def test_gen_corpus_unique_key():
    pdf = gen_corpus_pdf(300)
    assert not pdf.duplicated(subset=["repo", "path", "commit"]).any()
    n_tokens = pdf["content"].str.split().str.len()
    assert (n_tokens >= 30).all() and (n_tokens <= 400).all()


def test_spark_matches_pandas_generator(spark, corpus_sf_tiny):
    got = (
        corpus_sf_tiny["docs"]
        .select("repo", "path", "commit", "lang", "content")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = (
        gen_corpus_pdf(200)
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_sha256_ingest_verification(spark, corpus_sf_tiny):
    docs = spark.read.parquet(f"{corpus_sf_tiny['path']}/corpus_docs.parquet")
    res = verify_ingest(
        spark, docs, f"{corpus_sf_tiny['path']}/corpus_manifest.parquet"
    )
    assert res["ok"], res
    assert res["total"] == 200

    # corrupting one row must be detected
    from pyspark.sql import functions as F

    corrupted = docs.withColumn(
        "content",
        F.when(F.col("path").contains("file_3."), F.lit("TAMPERED"))
        .otherwise(F.col("content")),
    )
    res2 = verify_ingest(
        spark, corrupted, f"{corpus_sf_tiny['path']}/corpus_manifest.parquet"
    )
    assert not res2["ok"]


def test_doc_ids_match_row_number_oracle(spark, corpus_sf_tiny):
    docs = spark.read.parquet(f"{corpus_sf_tiny['path']}/corpus_docs.parquet")
    got = (
        assign_doc_ids(docs, num_partitions=8)
        .select("repo", "path", "commit", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        doc_ids_oracle(docs)
        .select("repo", "path", "commit", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["doc_id"].tolist() == list(range(1, 201))
