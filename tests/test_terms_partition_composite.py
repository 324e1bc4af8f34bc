"""Batch-5 surface: terms-agg partition pagination, composite agg
histogram/date_histogram sources, kNN similarity cutoff."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import cosine_topk
from elasticsearch_nlp_classifier_spark.query import composite_agg
from elasticsearch_nlp_classifier_spark.query.aggs import terms_agg


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [(i, f"k{i % 37}", float(i % 50),
             dt.datetime(2024, 1, 1 + (i % 5), i % 24))
            for i in range(500)]
    return spark.createDataFrame(
        rows, "id long, key string, v double, ts timestamp"
    ).cache()


# --- terms partition --------------------------------------------------------

def test_terms_partitions_disjoint_and_exhaustive(spark, keyed):
    full = {r.key: r.doc_count
            for r in terms_agg(keyed, "key", size=1000).collect()}
    seen = {}
    for i in range(4):
        part = terms_agg(keyed, "key", size=1000,
                         partition=(i, 4)).collect()
        for r in part:
            assert r.key not in seen, "partitions must be disjoint"
            seen[r.key] = r.doc_count
    assert seen == full  # collectively exhaustive, same counts


def test_terms_partition_deterministic(spark, keyed):
    a = terms_agg(keyed, "key", size=1000, partition=(1, 4)).collect()
    b = terms_agg(keyed, "key", size=1000, partition=(1, 4)).collect()
    assert a == b


def test_terms_partition_validates(spark, keyed):
    with pytest.raises(ValueError, match="partition"):
        terms_agg(keyed, "key", partition=(4, 4)).collect()


# --- composite histogram sources -------------------------------------------

def test_composite_histogram_source_keys(spark, keyed):
    out = composite_agg(
        keyed, [{"field": "v", "histogram": 10.0}], size=100
    ).collect()
    assert [r.v for r in out] == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert sum(r.doc_count for r in out) == 500


def test_composite_date_histogram_pagination_stitches(spark, keyed):
    srcs = [{"name": "day", "field": "ts", "date_histogram": "day"},
            {"name": "hour_v", "field": "v", "histogram": 25.0}]
    pages, after = [], None
    while True:
        page = composite_agg(keyed, srcs, size=3, after=after).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1]["day"], page[-1]["hour_v"])
    whole = composite_agg(keyed, srcs, size=10_000).collect()
    assert pages == whole
    # keys strictly ascending lexicographically
    ks = [(r.day, r.hour_v) for r in pages]
    assert ks == sorted(ks) and len(set(ks)) == len(ks)


def test_composite_source_spec_validates(spark, keyed):
    with pytest.raises(ValueError, match="histogram"):
        composite_agg(keyed, [{"field": "v"}]).collect()
    with pytest.raises(ValueError, match="interval"):
        composite_agg(keyed, [{"field": "v", "histogram": 0}]).collect()


# --- kNN similarity cutoff --------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_knn_cutoff_is_a_floor_not_a_reorder(spark, vectors):
    q = vectors.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    full = cosine_topk(vectors, q, k=10).collect()
    cut = cosine_topk(vectors, q, k=10, min_similarity=0.5).collect()
    assert all(r.cos >= 0.5 for r in cut)
    kept = [(r.query_id, r.vec_id) for r in full if r.cos >= 0.5]
    assert [(r.query_id, r.vec_id) for r in cut] == kept
    # random 8-dim vectors: a 0.5 floor must cut below k for some query
    assert len(cut) < len(full)


# --- terms order by sub-agg metric ------------------------------------------

def test_terms_order_by_metric(spark, keyed):
    from elasticsearch_nlp_classifier_spark.query import terms_agg_subs

    got = terms_agg_subs(
        keyed, "key", {"max_v": F.max("v")}, size=5,
        order_by="max_v", order_dir="desc",
    ).collect()
    # rows sorted by the metric, not doc_count
    vals = [r.max_v for r in got]
    assert vals == sorted(vals, reverse=True)
    # _key ordering mode
    by_key = terms_agg_subs(
        keyed, "key", {"max_v": F.max("v")}, size=5,
        order_by="_key", order_dir="asc",
    ).collect()
    ks = [r.key for r in by_key]
    assert ks == sorted(ks)


def test_terms_order_by_unknown_metric_rejected(spark, keyed):
    from elasticsearch_nlp_classifier_spark.query import terms_agg_subs

    with pytest.raises(ValueError, match="order_by"):
        terms_agg_subs(keyed, "key", {"m": F.max("v")},
                       order_by="nope").collect()


# --- dense histogram --------------------------------------------------------

def test_histogram_extended_bounds_zero_fill(spark, keyed):
    from elasticsearch_nlp_classifier_spark.query import histogram_agg

    # v in [0, 50); bounds force empty buckets either side
    got = histogram_agg(keyed, "v", 10.0, min_doc_count=0,
                        extended_bounds=(-30.0, 80.0)).collect()
    keys = [r.key for r in got]
    assert keys == [-30.0, -20.0, -10.0, 0.0, 10.0, 20.0, 30.0,
                    40.0, 50.0, 60.0, 70.0, 80.0]
    counts = {r.key: r.doc_count for r in got}
    assert counts[-30.0] == 0 and counts[80.0] == 0
    assert sum(counts.values()) == 500


def test_histogram_extended_bounds_respects_min_doc_count(spark, keyed):
    from elasticsearch_nlp_classifier_spark.query import histogram_agg

    got = histogram_agg(keyed, "v", 10.0, min_doc_count=1,
                        extended_bounds=(-30.0, 80.0)).collect()
    assert all(r.doc_count >= 1 for r in got)
    assert [r.key for r in got] == [0.0, 10.0, 20.0, 30.0, 40.0]
