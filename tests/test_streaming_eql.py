"""Streaming EQL sequence detection == batch eql_sequence on the same
finite stream, including out-of-order delivery across micro-batches."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import eql_sequence
from elasticsearch_nlp_classifier_spark.streaming.eql import (
    eql_sequence_stream,
)

SCHEMA = "user_id bigint, ts timestamp, event_type string"
STEPS = ["login_fail", "login_fail", "login_ok"]
MAXSPAN = 300.0  # 5 minutes


def _ev(user, minute, etype):
    return (user, dt.datetime(2024, 1, 1, 12, 0) +
            dt.timedelta(minutes=minute), etype)


EVENTS = [
    # user 1: one completing anchor (fail@0 -> fail@1 -> ok@2)
    _ev(1, 0, "login_fail"), _ev(1, 1, "login_fail"),
    _ev(1, 2, "login_ok"),
    # user 2: ok precedes the second fail -> no chain
    _ev(2, 0, "login_fail"), _ev(2, 1, "login_ok"),
    _ev(2, 2, "login_fail"),
    # user 3: chain completes but blows maxspan
    _ev(3, 0, "login_fail"), _ev(3, 10, "login_fail"),
    _ev(3, 30, "login_ok"),
    # user 4: two completing anchors
    _ev(4, 0, "login_fail"), _ev(4, 1, "login_fail"),
    _ev(4, 2, "login_fail"), _ev(4, 3, "login_ok"),
]


def _run_stream(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{i}.parquet"
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet/")
    )
    name = f"eqlstream_{abs(id(tmp_path))}"
    q = (
        eql_sequence_stream(stream, "user_id", STEPS,
                            maxspan_s=MAXSPAN, watermark="5 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return (
        spark.sql(f"SELECT * FROM {name}")
        .where(F.col("entity") != "99").collect()
    )


def _batch_counts(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    steps = [F.col("event_type") == s for s in STEPS]
    return {
        r.user_id: r.n_matches
        for r in eql_sequence(df, "user_id", steps,
                              maxspan_s=MAXSPAN).collect()
    }


SENTINELS = [[_ev(99, 100_000, "noise")], [_ev(99, 200_000, "noise")]]


def test_stream_matches_batch_in_order(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [EVENTS[:6], EVENTS[6:]] + SENTINELS)
    counts = {}
    for r in got:
        counts[int(r.entity)] = counts.get(int(r.entity), 0) + 1
    assert counts == _batch_counts(spark)  # {1: 1, 4: 2}


def test_stream_matches_batch_out_of_order(spark, tmp_path):
    # completions arrive BEFORE their anchors (within the watermark)
    late_first = [
        [_ev(1, 2, "login_ok"), _ev(4, 3, "login_ok")],
        [_ev(1, 0, "login_fail"), _ev(1, 1, "login_fail"),
         _ev(4, 0, "login_fail"), _ev(4, 1, "login_fail"),
         _ev(4, 2, "login_fail")] + EVENTS[3:9],
    ] + SENTINELS
    got = _run_stream(spark, tmp_path, late_first)
    counts = {}
    for r in got:
        counts[int(r.entity)] = counts.get(int(r.entity), 0) + 1
    assert counts == _batch_counts(spark)


def test_stream_emits_anchor_and_end(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [EVENTS] + SENTINELS)
    base = dt.datetime(2024, 1, 1, 12, 0,
                       tzinfo=dt.timezone.utc).timestamp()
    u1 = [r for r in got if r.entity == "1"]
    assert len(u1) == 1
    assert u1[0].anchor_ts == base
    assert u1[0].end_ts == base + 120.0
    for r in got:
        assert 0.0 <= r.end_ts - r.anchor_ts <= MAXSPAN


def test_stream_requires_maxspan(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    with pytest.raises(ValueError, match="maxspan"):
        eql_sequence_stream(df, "user_id", STEPS, maxspan_s=None)
    with pytest.raises(ValueError, match="step"):
        eql_sequence_stream(df, "user_id", [], maxspan_s=10.0)
