"""ES index sorting + early-terminating sorted top-k: result parity
with a plain orderBy().limit(), and the partition-pruning contract
(untouched buckets never reach the scan)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import (
    build_sorted_index,
    sorted_topk,
)


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    rows = [(i, float((i * 37) % 101), f"d{i}") for i in range(400)]
    rows += [(1000 + j, None, "null-row") for j in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, score double, t string")
    path = str(tmp_path_factory.mktemp("sorted_idx") / "by_score")
    edges = build_sorted_index(df, "score", path, buckets=8)
    return df, path, edges


def test_boundaries_ascending_deterministic(spark, layout, tmp_path_factory):
    df, path, edges = layout
    assert edges == sorted(edges)
    p2 = str(tmp_path_factory.mktemp("sorted_idx2") / "by_score")
    assert build_sorted_index(df, "score", p2, buckets=8) == edges


@pytest.mark.parametrize("desc", [False, True])
def test_topk_matches_global_order(spark, layout, desc):
    df, path, _ = layout
    got = sorted_topk(spark, path, "score", k=25, desc=desc).collect()
    key = F.col("score").desc_nulls_last() if desc \
        else F.col("score").asc_nulls_last()
    want = df.orderBy(key, F.col("doc_id").asc()).limit(25).collect()
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]


def test_topk_with_filter_walks_past_sparse_buckets(spark, layout):
    df, path, _ = layout
    flt = F.col("score") >= 80.0  # only the top ~20% qualifies
    got = sorted_topk(spark, path, "score", k=10, desc=False,
                      where=flt).collect()
    want = (
        df.where(flt).orderBy(F.col("score").asc(), F.col("doc_id").asc())
        .limit(10).collect()
    )
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]


def test_early_termination_prunes_partitions(spark, layout):
    _, path, _ = layout
    plan = sorted_topk(spark, path, "score", k=5)._jdf \
        .queryExecution().executedPlan().toString()
    import re
    m = re.search(r"sort_bucket.*?IN \(([^)]*)\)", plan) or \
        re.search(r"sort_bucket\#\d+\) IN \(([^)]*)\)", plan)
    assert "PartitionFilters" in plan
    # k=5 of 400 rows across 8 buckets -> exactly one bucket read
    n_src = spark.read.parquet(path)
    per_bucket = {r.sort_bucket: r["count"] for r in
                  n_src.groupBy("sort_bucket").count().collect()}
    assert min(per_bucket.values()) >= 5  # so 1 bucket suffices
    if m:
        assert len(m.group(1).split(",")) == 1


def test_nulls_sort_last_and_never_pad(spark, layout):
    df, path, _ = layout
    got = sorted_topk(spark, path, "score", k=404, desc=True).collect()
    assert len(got) == 404
    assert [r.score for r in got[:400]] == \
        sorted((r.score for r in got[:400]), reverse=True)
    assert [r.score for r in got[-4:]] == [None] * 4


def test_sorted_topk_with_match_gate(spark, layout):
    """ES query+sort+size: a doc-id set (e.g. match-filter hits) gates
    the walk; result == filter-then-global-sort."""
    df, path, _ = layout
    allowed = df.where(F.col("doc_id") % 3 == 0).select("doc_id")
    got = sorted_topk(spark, path, "score", k=15, desc=True,
                      allowed=allowed).collect()
    want = (
        df.join(allowed, "doc_id", "left_semi")
        .orderBy(F.col("score").desc_nulls_last(), F.col("doc_id").asc())
        .limit(15).collect()
    )
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]
    assert all(r.doc_id % 3 == 0 for r in got)
