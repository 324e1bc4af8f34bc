"""ES _transform API: pivot / latest / continuous sync ticks."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.plans.transform import (
    latest_transform,
    pivot_transform,
    read_transform_dest,
    run_continuous,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, "u1", "click", 10.0, _ts(1, 9)),
        (2, "u1", "view", 4.0, _ts(1, 10)),
        (3, "u2", "click", 6.0, _ts(2, 8)),
        (4, "u2", "click", 2.0, _ts(2, 9)),
        (5, "u3", "error", 1.0, _ts(3, 1)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, etype string, value double, ts timestamp"
    )


def test_pivot_terms(ev):
    out = pivot_transform(
        ev,
        group_by={"user_id": "terms"},
        aggregations={"n": ("value_count", "event_id"), "total": ("sum", "value"),
                      "kinds": ("cardinality", "etype")},
    ).orderBy("user_id").collect()
    assert [(r.user_id, r.n, r.total, r.kinds) for r in out] == [
        ("u1", 2, 14.0, 2), ("u2", 2, 8.0, 1), ("u3", 1, 1.0, 1),
    ]


def test_pivot_date_histogram_and_histogram(ev):
    out = pivot_transform(
        ev,
        group_by={"day": ("date_histogram", "ts", 86400),
                  "vb": ("histogram", "value", 5.0)},
        aggregations={"n": ("value_count", "event_id")},
    ).orderBy("day", "vb").collect()
    days = [(r.day % 86400 == 0, r.vb, r.n) for r in out]
    assert all(d[0] for d in days)
    assert [(r.vb, r.n) for r in out] == [(0.0, 1), (10.0, 1), (0.0, 1), (5.0, 1), (0.0, 1)]


def test_latest(ev):
    out = latest_transform(ev, ["user_id"], "ts", tiebreak="event_id")
    got = {r.user_id: (r.event_id, r.etype) for r in out.collect()}
    assert got == {"u1": (2, "view"), "u2": (4, "click"), "u3": (5, "error")}
    assert set(out.columns) == {"user_id", "event_id", "etype", "value", "ts"}


def test_latest_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "u", _ts(1)), (2, "u", _ts(1))], "event_id long, u string, ts timestamp"
    )
    out = latest_transform(df, ["u"], "ts", tiebreak="event_id").collect()
    assert out[0].event_id == 2


def test_latest_no_python_udf(ev):
    plan = latest_transform(ev, ["user_id"], "ts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    # single hash aggregation — no window exchange-sort
    assert "Window" not in plan


def test_continuous_two_ticks(spark, ev, tmp_path):
    dest = str(tmp_path / "tx")
    gb = {"user_id": "terms"}
    aggs = {"n": ("value_count", "event_id"), "total": ("sum", "value"),
            "avg_v": ("avg", "value")}

    m1 = run_continuous(spark, ev, dest, gb, aggs, sync_field="ts")
    assert m1["changed_keys"] == 3 and m1["rows"] == 3

    # new events for u1 only, later than the checkpoint
    more = spark.createDataFrame(
        [(6, "u1", "click", 100.0, _ts(5)), (7, "u4", "view", 9.0, _ts(5))],
        ev.schema,
    )
    full = ev.unionByName(more)
    m2 = run_continuous(spark, full, dest, gb, aggs, sync_field="ts")
    assert m2["changed_keys"] == 2  # u1 + u4 only

    got = {r.user_id: (r.n, r.total) for r in read_transform_dest(spark, dest).collect()}
    # identical to a full batch recompute
    want = {r.user_id: (r.n, r.total)
            for r in pivot_transform(full, gb, aggs).collect()}
    assert got == want
    assert got["u1"] == (3, 114.0) and got["u4"] == (1, 9.0)

    # idle tick: no delta → no work
    m3 = run_continuous(spark, full, dest, gb, aggs, sync_field="ts")
    assert m3["changed_keys"] == 0


def test_continuous_exactness_of_avg(spark, tmp_path):
    """avg is not partial-mergeable; the changed-keys recompute must
    still be exact because it re-reads the full history per key."""
    dest = str(tmp_path / "tx2")
    first = spark.createDataFrame(
        [(1, "k", 10.0, _ts(1))], "id long, k string, v double, ts timestamp"
    )
    run_continuous(spark, first, dest, {"k": "terms"}, {"a": ("avg", "v")}, "ts")
    both = first.unionByName(spark.createDataFrame(
        [(2, "k", 20.0, _ts(2))], first.schema))
    run_continuous(spark, both, dest, {"k": "terms"}, {"a": ("avg", "v")}, "ts")
    assert read_transform_dest(spark, dest).collect()[0].a == 15.0
