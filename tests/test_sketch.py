"""Count-min sketch + exact heavy hitters (operators/sketch.py)."""

import numpy as np
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.sketch import (
    cms_build,
    cms_query,
    heavy_hitters,
)

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts_and_bound_holds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cms = cms_build(docs, "lang", width=2048, depth=5)
    true = {r["lang"]: r["n"] for r in docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    est = cms_query(spark, cms, list(true))
    n_total = sum(true.values())
    eps = np.e / 2048
    for v, t in true.items():
        assert est[v] >= t                      # one-sided error
        assert est[v] <= t + eps * n_total + 1  # CM bound (w=2048)


def test_cms_is_linear_mergeable(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") < 250)
    b = docs.where(F.col("doc_id") >= 250)
    cms_a = cms_build(a, "lang")
    cms_b = cms_build(b, "lang")
    cms_all = cms_build(docs, "lang")
    assert np.array_equal(cms_a + cms_b, cms_all)


def test_heavy_hitters_exact_vs_groupby(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [(r["key"], r["n"]) for r in
           heavy_hitters(docs, "lang", k=3).collect()]
    want = [(r["lang"], r["n"]) for r in
            docs.where(F.col("lang").isNotNull())
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("lang")).limit(3).collect()]
    assert got == want
