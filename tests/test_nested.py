"""ES nested query semantics (functions/filters.py): same-element
conjunction vs the object-field false positive, inner_hits offsets."""

from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.functions import (
    nested_inner_hits,
    nested_query,
)


def _df(spark):
    # user 1: an 'error' with low value AND a high-value 'click' —
    # the object-field (flat AND) false-positive case
    # user 2: one element that is BOTH 'error' and high-value → match
    # user 3: empty array; user 4: null array
    rows = [
        (1, [("error", 5.0), ("click", 99.0)]),
        (2, [("view", 1.0), ("error", 80.0)]),
        (3, []),
        (4, None),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id bigint, events array<struct<event_type:string,value:double>>",
    )


def test_nested_requires_same_element(spark):
    df = _df(spark)
    pred = lambda e: (e["event_type"] == F.lit("error")) & (e["value"] > 50)  # noqa: E731
    got = sorted(
        r["doc_id"] for r in df.where(nested_query("events", pred)).collect()
    )
    assert got == [2]  # user 1 would match a flat AND — must NOT here
    # the flat-AND false positive, for contrast
    flat = df.where(
        nested_query("events", lambda e: e["event_type"] == F.lit("error"))
        & nested_query("events", lambda e: e["value"] > 50)
    )
    assert sorted(r["doc_id"] for r in flat.collect()) == [1, 2]


def test_nested_null_and_empty_do_not_match(spark):
    df = _df(spark)
    got = df.where(nested_query("events", lambda e: F.lit(True))).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]


def test_inner_hits_positions(spark):
    df = _df(spark)
    pred = lambda e: e["value"] > 50  # noqa: E731
    hits = nested_inner_hits(df, "events", pred).collect()
    got = sorted((r["doc_id"], r["offset"], r["hit"]["event_type"])
                 for r in hits)
    assert got == [(1, 1, "click"), (2, 1, "error")]
