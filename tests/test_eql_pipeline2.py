"""EQL sequence detection + bucket_script/bucket_selector/normalize/
percentiles_bucket pipeline aggs, pinned against plain-Python specs."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import (
    bucket_script_agg,
    bucket_selector_agg,
    date_histogram_agg,
    eql_sequence,
    normalize_agg,
    percentiles_bucket_agg,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


EVENTS = [
    # (user, ts, type) — user 1: fail, fail, ok within 3 min (match)
    (1, _ts(0), "login_fail"),
    (1, _ts(1), "login_fail"),
    (1, _ts(2), "login_ok"),
    # user 2: fail, ok, fail — only one fail precedes the ok
    (2, _ts(0), "login_fail"),
    (2, _ts(1), "login_ok"),
    (2, _ts(2), "login_fail"),
    # user 3: complete chain but spread over 30 min (maxspan kills it)
    (3, _ts(0), "login_fail"),
    (3, _ts(10), "login_fail"),
    (3, _ts(30), "login_ok"),
    # user 4: two anchors both completing
    (4, _ts(0), "login_fail"),
    (4, _ts(1), "login_fail"),
    (4, _ts(2), "login_fail"),
    (4, _ts(3), "login_ok"),
    # user 5: never succeeds
    (5, _ts(0), "login_fail"),
    (5, _ts(1), "login_fail"),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "user_id bigint, ts timestamp, event_type string"
    ).cache()


def _steps():
    return [
        F.col("event_type") == "login_fail",
        F.col("event_type") == "login_fail",
        F.col("event_type") == "login_ok",
    ]


def test_eql_sequence_matches(events):
    got = {r["user_id"]: r["n_matches"] for r in eql_sequence(
        events, "user_id", _steps(), maxspan_s=600).collect()}
    # user 1: anchor at t0 chains t1,t2 -> 1 anchor; anchor at t1 has
    # no later second fail -> invalid. user 4: anchors t0 (t1,t3) and
    # t1 (t2,t3) both complete -> 2.  user 3 killed by maxspan.
    assert got == {1: 1, 4: 2}


def test_eql_sequence_no_maxspan(events):
    got = {r["user_id"]: r["n_matches"] for r in eql_sequence(
        events, "user_id", _steps()).collect()}
    assert got == {1: 1, 3: 1, 4: 2}


def test_eql_single_step(events):
    got = {r["user_id"]: r["n_matches"] for r in eql_sequence(
        events, "user_id", [F.col("event_type") == "login_ok"]).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_eql_strict_order(events, spark):
    # simultaneous events do NOT chain (strictly increasing ts)
    df = spark.createDataFrame(
        [(9, _ts(0), "a"), (9, _ts(0), "b")],
        "user_id bigint, ts timestamp, event_type string")
    got = eql_sequence(
        df, "user_id",
        [F.col("event_type") == "a", F.col("event_type") == "b"],
    ).collect()
    assert got == []


@pytest.fixture(scope="module")
def buckets(spark):
    rows = [(dt.datetime(2024, 1, d, 0, 0), d * 10, d * 2.0)
            for d in range(1, 6)]
    return spark.createDataFrame(
        rows, "key_ts timestamp, doc_count bigint, total double").cache()


def test_bucket_script_and_selector(buckets):
    out = bucket_script_agg(
        buckets, F.col("total") / F.col("doc_count"), "ratio")
    got = {r["key_ts"].day: r["ratio"] for r in out.collect()}
    assert all(v == pytest.approx(0.2) for v in got.values())
    kept = bucket_selector_agg(out, F.col("doc_count") >= 30)
    assert {r["key_ts"].day for r in kept.collect()} == {3, 4, 5}


def test_normalize_methods(buckets):
    vals = [10, 20, 30, 40, 50]
    s = sum(vals)
    out = {r["key_ts"].day: r["normalized"] for r in normalize_agg(
        buckets, "doc_count", "percent_of_sum").collect()}
    for d, v in zip(range(1, 6), vals):
        assert out[d] == pytest.approx(v / s, abs=1e-6)
    z = {r["key_ts"].day: r["normalized"] for r in normalize_agg(
        buckets, "doc_count", "z-score").collect()}
    import statistics
    m = statistics.mean(vals)
    sd = statistics.pstdev(vals)
    for d, v in zip(range(1, 6), vals):
        assert z[d] == pytest.approx((v - m) / sd, abs=1e-6)
    r01 = {r["key_ts"].day: r["normalized"] for r in normalize_agg(
        buckets, "doc_count", "rescale_0_1").collect()}
    assert r01[1] == 0.0 and r01[5] == 1.0
    with pytest.raises(ValueError):
        normalize_agg(buckets, "doc_count", "nope")


def test_percentiles_bucket(buckets):
    out = {r["percent"]: r["value"] for r in percentiles_bucket_agg(
        buckets, "doc_count", (25.0, 50.0, 75.0)).collect()}
    assert out[50.0] == 30.0
    assert out[25.0] == 20.0
    assert out[75.0] == 40.0


def test_date_histogram_feeds_pipeline(spark):
    # integration: real parent agg -> script -> selector chain
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + i // 3, 8, i % 3), 1.0)
         for i in range(9)],
        "ts timestamp, v double")
    b = date_histogram_agg(ev, "ts", "day")
    out = bucket_selector_agg(
        bucket_script_agg(b, F.col("doc_count") * 2, "dbl"),
        F.col("dbl") >= 6)
    assert all(r["dbl"] == 6.0 for r in out.collect())


def test_eql_until_voids_interrupted_sequences(spark):
    from elasticsearch_nlp_classifier_spark.query import eql_sequence

    rows = [
        # user 1: view -> purchase, clean        -> matches
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "purchase"),
        # user 2: view -> click -> purchase      -> voided by until
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:30:00", "click"),
        (2, "2024-01-01 11:00:00", "purchase"),
        # user 3: click BEFORE the anchor doesn't void
        (3, "2024-01-01 09:00:00", "click"),
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 11:00:00", "purchase"),
        # user 4: first anchor voided, SECOND view anchors a clean run
        (4, "2024-01-01 08:00:00", "view"),
        (4, "2024-01-01 08:30:00", "click"),
        (4, "2024-01-01 09:00:00", "view"),
        (4, "2024-01-01 10:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.user_id: r.n_matches for r in eql_sequence(
        ev, "user_id",
        [F.col("event_type") == "view", F.col("event_type") == "purchase"],
        until=F.col("event_type") == "click",
    ).collect()}
    assert got == {1: 1, 3: 1, 4: 1}

    # without until, user 2 matches and user 4 has both anchors
    got2 = {r.user_id: r.n_matches for r in eql_sequence(
        ev, "user_id",
        [F.col("event_type") == "view", F.col("event_type") == "purchase"],
    ).collect()}
    assert got2 == {1: 1, 2: 1, 3: 1, 4: 2}


# --- eql_sample (unordered correlation) ------------------------------------

def test_eql_sample_requires_all_steps(spark, events):
    from elasticsearch_nlp_classifier_spark.query import eql_sample

    got = eql_sample(
        events, "user_id",
        [F.col("event_type") == "login_fail",
         F.col("event_type") == "login_ok"],
    ).collect()
    # users 1-4 have both types (order irrelevant: user 2 counts even
    # though its last fail is after the ok); user 5 never has login_ok
    assert [r.user_id for r in got] == [1, 2, 3, 4]


def test_eql_sample_ignores_order_and_span(spark, events):
    from elasticsearch_nlp_classifier_spark.query import eql_sample

    # sequence with maxspan kills user 3; sample keeps it
    seq = eql_sequence(events, "user_id", _steps(), maxspan_s=300.0)
    assert 3 not in {r.user_id for r in seq.collect()}
    samp = eql_sample(
        events, "user_id",
        [F.col("event_type") == "login_fail",
         F.col("event_type") == "login_ok"],
    )
    assert 3 in {r.user_id for r in samp.collect()}


def test_eql_sample_latest_representative(spark, events):
    from elasticsearch_nlp_classifier_spark.query import eql_sample

    row = {
        r.user_id: r
        for r in eql_sample(
            events, "user_id",
            [F.col("event_type") == "login_fail",
             F.col("event_type") == "login_ok"],
        ).collect()
    }[2]
    # user 2: fails at minute 0 and 2, ok at minute 1 — latest wins
    assert row.ts_0 == _ts(2).replace(tzinfo=dt.timezone.utc).timestamp()
    assert row.ts_1 == _ts(1).replace(tzinfo=dt.timezone.utc).timestamp()


def test_eql_sample_size_cap_key_asc(spark, events):
    from elasticsearch_nlp_classifier_spark.query import eql_sample

    got = eql_sample(
        events, "user_id", [F.col("event_type") == "login_fail"],
        size=2,
    ).collect()
    assert [r.user_id for r in got] == [1, 2]
