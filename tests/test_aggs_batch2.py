"""percentile_ranks / ip_range / global aggs + cross_fields
multi_match, pinned against plain-Python replicas."""

import ipaddress

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    cross_fields_topk,
    global_agg,
    ip_numeric,
    ip_range_agg,
    percentile_ranks_agg,
    terms_agg,
)


def test_percentile_ranks(spark):
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["value"]: r["rank"] for r in
           percentile_ranks_agg(df, "v", [10.0, 50.0, 99.5, 0.5])
           .collect()}
    assert out[10.0] == pytest.approx(10.0)
    assert out[50.0] == pytest.approx(50.0)
    assert out[99.5] == pytest.approx(99.0)
    assert out[0.5] == pytest.approx(0.0)


IPS = ["10.0.0.1", "10.0.0.200", "10.0.1.5", "192.168.1.1",
       "172.16.0.9", "10.0.0.199", None]


def test_ip_numeric(spark):
    df = spark.createDataFrame([(i,) for i in IPS if i], "ip string")
    got = {r["ip"]: r["n"] for r in df.select(
        "ip", ip_numeric(F.col("ip")).alias("n")).collect()}
    for ip in got:
        assert got[ip] == int(ipaddress.IPv4Address(ip))


def test_ip_range_agg(spark):
    df = spark.createDataFrame([(i,) for i in IPS], "ip string")
    out = {r["key"]: r["doc_count"] for r in ip_range_agg(
        df, "ip",
        [(None, "10.0.0.200"), ("10.0.0.200", "10.0.2.0"),
         ("172.16.0.0", None)],
    ).collect()}
    live = [ipaddress.IPv4Address(i) for i in IPS if i]
    assert out["*-10.0.0.200"] == sum(
        1 for a in live if a < ipaddress.IPv4Address("10.0.0.200"))
    assert out["10.0.0.200-10.0.2.0"] == sum(
        1 for a in live
        if ipaddress.IPv4Address("10.0.0.200") <= a
        < ipaddress.IPv4Address("10.0.2.0"))
    assert out["172.16.0.0-*"] == sum(
        1 for a in live if a >= ipaddress.IPv4Address("172.16.0.0"))


def test_global_agg_escapes_filter(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)],
        "id bigint, g string")
    filtered = df.where(F.col("g") == "a")
    # a terms agg over the filtered frame sees only 'a'...
    assert {r["key"] for r in terms_agg(filtered, "g").collect()} == {"a"}
    # ...the global bucket escapes back to the whole index
    out = {r["key"]: r["doc_count"]
           for r in global_agg(df, lambda s: terms_agg(s, "g")).collect()}
    assert out == {"a": 10, "b": 10}


DOCS = [
    # split-name scenario: cross_fields should rank doc 0 (full match
    # split across fields) at the top; best_fields favors same-field
    (0, "john", "smith"),
    (1, "john john", "jones"),
    (2, "peter", "smith smith"),
    (3, "john smith", "unrelated"),
    (4, "alpha", "beta"),
]


@pytest.fixture(scope="module")
def field_indexes(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, first string,"
                                     " last string").cache()
    return {
        "first": build_logical_index(df, text_col="first",
                                     analyzer="simple_code",
                                     doc_id_col="doc_id"),
        "last": build_logical_index(df, text_col="last",
                                    analyzer="simple_code",
                                    doc_id_col="doc_id"),
    }


def test_cross_fields_scores_split_match(field_indexes):
    rows = cross_fields_topk(field_indexes, "john smith", k=5,
                             analyzer="simple_code").collect()
    ranked = [r["doc_id"] for r in rows]
    # docs 0 and 3 contain both terms (split or same-field) — both must
    # outrank every single-term doc
    both = {0, 3}
    singles = {1, 2}
    pos = {d: i for i, d in enumerate(ranked)}
    assert all(pos[b] < pos[s] for b in both for s in singles
               if b in pos and s in pos)
    assert 4 not in pos  # no query term at all
    # scores are finite and descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cross_fields_blended_idf_uses_max_df(field_indexes):
    """The blended df for 'smith' is max(df_first, df_last) =
    max(1, 2) = 2 — a per-field idf would give the 'first'-field
    occurrence a higher idf than the blend."""
    import math

    rows = {r["doc_id"]: r["score"] for r in cross_fields_topk(
        field_indexes, "smith", k=5, analyzer="simple_code").collect()}
    n = 5
    idf_blend = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
    # doc 3: 'smith' tf=1 in first (dl=2, avgdl_first=7/5)
    k1, b = 1.2, 0.75
    avgdl_first = 7 / 5
    contrib = idf_blend * 1 / (1 + k1 * (1 - b + b * 2 / avgdl_first))
    assert rows[3] == pytest.approx(contrib, rel=1e-9)
