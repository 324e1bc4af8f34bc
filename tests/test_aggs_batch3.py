"""rate / moving_fn / cumulative_cardinality / variable_width_histogram
/ categorize_text / frequent_item_sets / nested+reverse_nested / parent
aggs against hand-computed and plain-Python replicas."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import (
    categorize_text_agg,
    cumulative_cardinality_agg,
    date_histogram_agg,
    frequent_item_sets_agg,
    moving_fn_agg,
    nested_terms_agg,
    parent_agg,
    rate_agg,
    reverse_nested_agg,
    variable_width_histogram_agg,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


def test_rate_agg_units(spark):
    ev = _events(spark, [
        (1, T0, "a"), (2, T0 + dt.timedelta(minutes=5), "a"),
        (3, T0 + dt.timedelta(hours=1), "b"),
    ])
    b = date_histogram_agg(ev, "ts", "hour")
    out = {r["key_ts"]: r["rate"]
           for r in rate_agg(b, "hour", "minute").collect()}
    assert out[T0] == pytest.approx(2 / 60.0)
    assert out[T0 + dt.timedelta(hours=1)] == pytest.approx(1 / 60.0)
    with pytest.raises(ValueError):
        rate_agg(b, "hour", "day")   # rate unit above the histogram
    with pytest.raises(ValueError):
        rate_agg(b, "month")         # calendar-variable bucket


def test_moving_fn_palette(spark):
    b = spark.createDataFrame(
        [(T0 + dt.timedelta(hours=h), c)
         for h, c in enumerate([4, 1, 3, 9, 2])],
        "key_ts timestamp, doc_count bigint",
    )
    mx = [r["moving_max"] for r in
          moving_fn_agg(b, "max", window=3).orderBy("key_ts").collect()]
    assert mx == [4.0, 4.0, 4.0, 9.0, 9.0]
    # shift=-1 excludes the current bucket (ES's default window)
    mn = [r["moving_min"] for r in
          moving_fn_agg(b, "min", window=2, shift=-1)
          .orderBy("key_ts").collect()]
    assert mn == [None, 4.0, 1.0, 1.0, 3.0]
    sd = [r["moving_stdDev"] for r in
          moving_fn_agg(b, "stdDev", window=5)
          .orderBy("key_ts").collect()]
    import statistics
    assert sd[-1] == pytest.approx(statistics.pstdev([4, 1, 3, 9, 2]))
    with pytest.raises(ValueError):
        moving_fn_agg(b, "median")


def test_cumulative_cardinality(spark):
    d = dt.timedelta(days=1)
    ev = _events(spark, [
        (1, T0, "a"), (2, T0, "a"),          # day 0: users {1,2}
        (1, T0 + d, "a"), (3, T0 + d, "a"),  # day 1: new user 3
        (2, T0 + 2 * d, "a"),                # day 2: nothing new
        (4, T0 + 3 * d, "a"), (1, T0 + 3 * d, "a"),
    ])
    out = cumulative_cardinality_agg(ev, "user_id", "ts", "day")
    got = [(r["doc_count"], r["cumulative_cardinality"])
           for r in out.orderBy("key_ts").collect()]
    assert got == [(2, 2), (2, 3), (1, 3), (2, 4)]


def test_variable_width_histogram_clusters(spark):
    # three clouds near the equal-width seeds; k=3 separates exactly
    vals = [1, 2, 3, 500, 501, 502, 1000, 1001]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    out = variable_width_histogram_agg(df, "x", buckets=3).collect()
    assert [(r["min"], r["max"], r["doc_count"]) for r in out] == [
        (1.0, 3.0, 3), (500.0, 502.0, 3), (1000.0, 1001.0, 2),
    ]
    assert out[0]["key"] == pytest.approx(2.0)     # centroid = mean
    assert out[1]["key"] == pytest.approx(501.0)
    # a cluster whose seed captures nothing keeps its centroid and
    # emits no bucket (the far cloud is bimodal-merged, not invented)
    skew = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 100, 101, 102, 1000]], "x bigint"
    )
    out2 = variable_width_histogram_agg(skew, "x", buckets=3).collect()
    assert [(r["min"], r["max"], r["doc_count"]) for r in out2] == [
        (1.0, 102.0, 6), (1000.0, 1000.0, 1),
    ]
    # all-null field -> empty frame, stable schema
    nulls = spark.createDataFrame([(None,), (None,)], "x bigint")
    empty = variable_width_histogram_agg(nulls, "x", buckets=2)
    assert empty.count() == 0
    assert empty.columns == ["key", "min", "max", "doc_count"]


def test_categorize_text_templates(spark):
    df = spark.createDataFrame(
        [("Job 17 failed after 3 retries",),
         ("Job 42 failed after 11 retries",),
         ("disk usage at 93 percent",),
         (None,)],
        "msg string",
    )
    got = {r["key"]: r["doc_count"]
           for r in categorize_text_agg(df, "msg").collect()}
    assert got["job %{NUM} failed after %{NUM} retries"] == 2
    assert got["disk usage at %{NUM} percent"] == 1
    assert got[""] == 1   # null doc -> empty template


def test_frequent_item_sets(spark):
    rows = [(["milk", "bread"],)] * 6 + [(["milk"],)] * 2 + \
        [(["beer", "bread"],)] * 1 + [(["milk", "milk", "bread"],)]
    df = spark.createDataFrame(rows, "items array<string>")
    out = frequent_item_sets_agg(df, "items", minimum_support=0.2,
                                 size=10).collect()
    got = {tuple(r["items"]): (r["support"], r["doc_count"])
           for r in out}
    # 10 rows total; milk in 9, bread in 8, {bread,milk} in 7
    assert got[("milk",)] == (0.9, 9)
    assert got[("bread",)] == (0.8, 8)
    assert got[("bread", "milk")] == (0.7, 7)   # duplicate items deduped
    assert ("beer",) not in got                  # support 0.1 < 0.2
    # ordered by doc_count desc
    assert [r["doc_count"] for r in out] == [9, 8, 7]


def test_nested_and_reverse_nested(spark):
    ev = _events(spark, [
        (1, T0, "click"), (1, T0, "click"), (1, T0, "view"),
        (2, T0, "click"),
    ])
    nested = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type")).alias("events")
    )
    n = {r["key"]: r["doc_count"] for r in
         nested_terms_agg(nested, "events", "event_type").collect()}
    assert n == {"click": 3, "view": 1}   # element counts
    r = {x["key"]: x["parent_count"] for x in
         reverse_nested_agg(nested, "events", "event_type",
                            "user_id").collect()}
    assert r == {"click": 2, "view": 1}   # parent counts


def test_parent_agg(spark):
    parents = spark.createDataFrame(
        [(10,), (20,), (30,)], "pk bigint"
    )
    children = spark.createDataFrame(
        [(10, "x", 5.0), (10, "x", 9.0), (10, "y", 2.0),
         (20, "x", 7.0), (30, "y", 1.0), (99, "x", 8.0)],
        "fk bigint, tag string, v double",
    )
    out = {r["key"]: r["doc_count"] for r in parent_agg(
        parents, children, "pk", "fk", "tag",
        child_filter=F.col("v") >= 2.0,
    ).collect()}
    # x: parents 10,20 (99 is orphaned); y: only 10 (30's child filtered)
    assert out == {"x": 2, "y": 1}
