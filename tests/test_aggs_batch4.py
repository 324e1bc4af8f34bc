"""Agg batch 4: random_sampler, ip_prefix, geohash_grid, change_point,
bucket_correlation, bucket_count_ks_test — plus the _terms_enum API and
runtime fields.  Each pinned against an independent plain-Python spec."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import (
    bucket_correlation_agg,
    bucket_count_ks_test_agg,
    change_point_agg,
    geohash_grid_agg,
    ip_prefix_agg,
    random_sampler_agg,
    random_sampler_counts,
    terms_enum,
    with_runtime_fields,
)


# ------------------------------------------------------------- random_sampler


def _hash_u(i, salt=""):
    return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:15], 16) / 2**60


@pytest.fixture(scope="module")
def people(spark):
    rows = [(i, "en" if i % 3 else "de", float(i % 17)) for i in range(600)]
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, score double"
    ).cache()


def test_random_sampler_is_the_deterministic_hash_draw(people):
    got = sorted(
        r.doc_id for r in random_sampler_agg(people, 0.25, "s1").collect()
    )
    want = sorted(i for i in range(600) if _hash_u(i, "s1") < 0.25)
    assert got == want


def test_random_sampler_counts_scale(people):
    got = {r.key: (r.sampled_count, r.doc_count)
           for r in random_sampler_counts(people, 0.5, "lang", "s2").collect()}
    sample = [i for i in range(600) if _hash_u(i, "s2") < 0.5]
    for lang in ("en", "de"):
        n = sum(1 for i in sample if (("en" if i % 3 else "de") == lang))
        assert got[lang] == (n, round(n / 0.5))


# ----------------------------------------------------------------- ip_prefix


def test_ip_prefix_buckets(spark):
    rows = [
        (1, "10.0.0.1"), (2, "10.0.0.200"), (3, "10.0.1.7"),
        (4, "10.0.255.255"), (5, "192.168.3.4"), (6, "192.168.200.1"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id int, ip string")
    got = {r.key: r.doc_count for r in ip_prefix_agg(df, "ip", 16).collect()}
    assert got == {"10.0.0.0/16": 4, "192.168.0.0/16": 2}
    got24 = {r.key: r.doc_count for r in ip_prefix_agg(df, "ip", 24).collect()}
    assert got24 == {
        "10.0.0.0/24": 2, "10.0.1.0/24": 1, "10.0.255.0/24": 1,
        "192.168.3.0/24": 1, "192.168.200.0/24": 1,
    }


def test_ip_prefix_rejects_bad_length(spark):
    df = spark.createDataFrame([(1, "1.2.3.4")], "id int, ip string")
    with pytest.raises(ValueError):
        ip_prefix_agg(df, "ip", 0)


# --------------------------------------------------------------- geohash_grid


def _ref_geohash(lat, lon, precision):
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, out, even = 0, 0, [], True
    while len(out) < precision:
        iv = lon_i if even else lat_i
        v = lon if even else lat
        mid = (iv[0] + iv[1]) / 2
        if v >= mid:
            ch = ch * 2 + 1
            iv[0] = mid
        else:
            ch = ch * 2
            iv[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alpha[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_key_matches_canonical_bisection(spark):
    rng = np.random.RandomState(11)
    pts = [(i, float(rng.uniform(-89, 89)), float(rng.uniform(-179, 179)))
           for i in range(80)]
    df = spark.createDataFrame(pts, "id int, lat double, lon double")
    for p in (1, 3, 5):
        got = {
            r.id: r.gh
            for r in df.select(
                "id",
                __import__(
                    "elasticsearch_nlp_classifier_spark.query.geo",
                    fromlist=["geohash_key"],
                ).geohash_key(F.col("lat"), F.col("lon"), p).alias("gh"),
            ).collect()
        }
        for i, lat, lon in pts:
            assert got[i] == _ref_geohash(lat, lon, p), (i, lat, lon, p)


def test_geohash_grid_agg_counts(spark):
    # two tight clusters -> two buckets at precision 4
    pts = (
        [(i, 48.8584 + i * 1e-5, 2.2945 + i * 1e-5) for i in range(7)]
        + [(100 + i, 40.6892 + i * 1e-5, -74.0445 + i * 1e-5)
           for i in range(3)]
    )
    df = spark.createDataFrame(pts, "id int, lat double, lon double")
    got = [(r.key, r.doc_count)
           for r in geohash_grid_agg(
               df, F.col("lat"), F.col("lon"), precision=4).collect()]
    assert got == [
        (_ref_geohash(48.8584, 2.2945, 4), 7),
        (_ref_geohash(40.6892, -74.0445, 4), 3),
    ]


# --------------------------------------------------------------- change_point


def _welch(xs, k):
    a, b = np.array(xs[:k], float), np.array(xs[k:], float)
    return (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )


@pytest.mark.parametrize("series", [
    [5, 6, 5, 7, 6, 5, 20, 21, 19, 22, 20, 21],     # clear step up
    [10, 11, 9, 10, 2, 3, 2, 1, 3, 2],              # step down
    [1, 2, 1, 2, 1, 2, 1, 2],                       # no real change
])
def test_change_point_matches_numpy_argmax(spark, series):
    rows = [(i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = change_point_agg(df, "k", "v").collect()[0]
    n = len(series)
    best = max(
        range(2, n - 1),
        key=lambda k: (round(abs(_welch(series, k)), 9), -k),
    )
    assert got.key == best
    assert got.t_stat_r6 == pytest.approx(round(_welch(series, best), 6))
    assert got.left_mean_r6 == pytest.approx(
        round(float(np.mean(series[:best])), 6))
    assert got.right_mean_r6 == pytest.approx(
        round(float(np.mean(series[best:])), 6))


# --------------------------------------------------- bucket_correlation / ks


def test_bucket_correlation_vs_numpy(spark):
    counts = [10, 25, 40, 30, 15, 5]
    ind = {0: 0.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 0.0}  # bucket 5 missing -> 0
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "key int, doc_count bigint"
    )
    got = bucket_correlation_agg(df, "key", "doc_count", ind).collect()[0]
    dense = [ind.get(i, 0.0) for i in range(6)]
    want = float(np.corrcoef(counts, dense)[0, 1])
    assert got.correlation_r6 == pytest.approx(round(want, 6), abs=1e-6)


def _ks(counts, fractions):
    ca = np.cumsum(counts) / np.sum(counts)
    ce = np.cumsum(fractions) / np.sum(fractions)
    return float(np.max(np.abs(ca - ce)))


def test_ks_test_uniform_and_fractions(spark):
    counts = [5, 30, 10, 5, 50]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "key int, doc_count bigint"
    )
    got = bucket_count_ks_test_agg(df, "key", "doc_count").collect()[0]
    assert got.d_statistic_r6 == pytest.approx(
        round(_ks(counts, [1.0] * 5), 6))
    fr = [0.1, 0.2, 0.4, 0.2, 0.1]
    got2 = bucket_count_ks_test_agg(
        df, "key", "doc_count", fractions=fr).collect()[0]
    assert got2.d_statistic_r6 == pytest.approx(round(_ks(counts, fr), 6))


# ------------------------------------------------- terms_enum / runtime fields


def test_terms_enum_pages_the_dictionary(spark, tmp_path):
    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )

    docs = spark.createDataFrame(
        [(0, "alpha alder apple beta"), (1, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    ix = build_physical_index(
        docs, str(tmp_path / "te_idx"), text_col="text",
        analyzer="simple_code",
    )
    assert [r.term for r in terms_enum(ix, "al", size=10).collect()] == [
        "alder", "alpha"]
    assert [r.term for r in terms_enum(ix, "", size=3).collect()] == [
        "alder", "alpha", "apple"]
    assert [r.term for r in terms_enum(
        ix, "AL", size=10, case_insensitive=True).collect()] == [
        "alder", "alpha"]


def test_runtime_fields_filter_and_agg(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 2.0), (2, 30.0, 3.0), (3, 50.0, 5.0)],
        "id int, price double, qty double",
    )
    rt = with_runtime_fields(
        df, {"total": "price * qty", "cheap": F.col("price") < 40}
    )
    assert sorted(r.id for r in rt.where("cheap").collect()) == [1, 2]
    assert rt.agg(F.sum("total")).collect()[0][0] == pytest.approx(360.0)


# ---------------------------------------------- moving_percentiles / geo_line


def test_moving_percentiles_vs_numpy(spark):
    vals = [10.0, 2.0, 7.0, 4.0, 9.0, 1.0, 6.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v double"
    )
    from elasticsearch_nlp_classifier_spark.query.aggs import (
        moving_percentiles_agg,
    )

    for p in (0.5, 0.9, 0.0, 1.0):
        got = {r.key: r[1] for r in moving_percentiles_agg(
            df, "k", "v", window=3, percentile=p).collect()}
        for i in range(len(vals)):
            w = vals[max(0, i - 2):i + 1]
            want = round(float(np.percentile(w, p * 100,
                                             method="linear")), 6)
            assert got[i] == pytest.approx(want), (i, p)


def test_geo_line_orders_and_caps(spark):
    rows = [
        # (key, t, lat, lon)
        ("a", 3, 10.0, 3.0), ("a", 1, 10.0, 1.0), ("a", 2, 10.0, 2.0),
        ("b", 1, -5.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, lat double, lon double")
    from elasticsearch_nlp_classifier_spark.query.aggs import geo_line_agg

    got = [(r.key, r.seq, r.lon_r6, r.lat_r6) for r in geo_line_agg(
        df, "k", "t", F.col("lat"), F.col("lon")
    ).orderBy("key", "seq").collect()]
    assert got == [
        ("a", 1, 1.0, 10.0), ("a", 2, 2.0, 10.0), ("a", 3, 3.0, 10.0),
        ("b", 1, 9.0, -5.0),
    ]
    capped = geo_line_agg(df, "k", "t", F.col("lat"), F.col("lon"), size=2)
    assert capped.where("key = 'a'").count() == 2
    assert [r.seq for r in capped.where("key = 'a'")
            .orderBy("seq").collect()] == [1, 2]
