"""URL/domain curation operators (operators/domains.py)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.domains import (
    domain_quota,
    domain_stats,
    extract_domain,
    filter_blocked_domains,
    registered_domain,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (0, "https://example.com/a"),
        (1, "https://Sub.Example.COM:8443/path?q=1"),
        (2, "http://user:pw@deep.a.b.example.org/x"),
        (3, "ftp://files.example.net"),
        (4, "not a url at all"),
        (5, None),
        (6, "https://example.com/b#frag"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_extract_domain(urls):
    got = {r["doc_id"]: r["d"] for r in
           urls.select("doc_id", extract_domain("url").alias("d")).collect()}
    assert got[0] == "example.com"
    assert got[1] == "sub.example.com"       # port stripped, lowercased
    assert got[2] == "deep.a.b.example.org"  # userinfo stripped
    assert got[3] == "files.example.net"
    assert got[4] == "" and got[5] == ""     # no match / null -> ''
    assert got[6] == "example.com"


def test_registered_domain(urls):
    got = {r["doc_id"]: r["d"] for r in urls.select(
        "doc_id", registered_domain("url").alias("d")).collect()}
    assert got[1] == "example.com"
    assert got[2] == "example.org"
    assert got[4] == ""


def test_filter_blocked_domains_list_and_df(spark, urls):
    kept = filter_blocked_domains(urls, "url", ["example.com"])
    assert set(r["doc_id"] for r in kept.collect()) == {1, 2, 3, 4, 5}
    bl = spark.createDataFrame([("EXAMPLE.com",), ("files.example.net",)],
                               "domain string")
    kept2 = filter_blocked_domains(urls, "url", bl)
    assert set(r["doc_id"] for r in kept2.collect()) == {1, 2, 4, 5}
    assert kept2.columns == urls.columns     # helper cols dropped


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [(i, f"https://d{i % 3}.com/x", 10 * (i + 1)) for i in range(9)],
        "doc_id bigint, url string, n_chars bigint",
    )
    got = {r["domain"]: (r["doc_count"], r["total_chars"])
           for r in domain_stats(df, "url", size_col="n_chars").collect()}
    assert got["d0.com"] == (3, 10 + 40 + 70)
    assert set(got) == {"d0.com", "d1.com", "d2.com"}


def test_domain_quota_caps_per_domain(spark):
    df = spark.createDataFrame(
        [(i, f"https://d{i % 2}.com/x") for i in range(100)],
        "doc_id bigint, url string",
    )
    out = domain_quota(df, "url", 7, id_col="doc_id")
    counts = (
        out.groupBy(extract_domain("url").alias("d")).count().collect()
    )
    assert all(r["count"] == 7 for r in counts)
    # deterministic: same rows every run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               domain_quota(df, "url", 7, id_col="doc_id").collect())
    assert a == b
    # under-cap domains pass through untouched
    small = domain_quota(df.limit(5), "url", 7, id_col="doc_id")
    assert small.count() == 5
