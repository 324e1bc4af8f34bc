"""As-of join and range join (operators/timejoin.py)."""

from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import (
    asof_join,
    range_join,
)


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.to_timestamp("t")).drop("t")


def test_asof_join_latest_at_or_before(spark):
    clicks = _ts(spark, [
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 12:00:00", 7),
        (3, "2024-01-01 09:00:00", 8),   # before any quote for user 8
    ], "id bigint, t string, user bigint")
    quotes = _ts(spark, [
        ("2024-01-01 09:30:00", 7, 100.0),
        ("2024-01-01 10:00:00", 7, 110.0),  # ties at-or-before include ==
        ("2024-01-01 11:59:00", 7, 120.0),
        ("2024-01-01 10:00:00", 8, 999.0),
    ], "t string, user bigint, px double")
    out = {r["id"]: r["r_px"] for r in asof_join(
        clicks, quotes, "ts", by="user", right_cols=["px"]
    ).collect()}
    assert out == {1: 110.0, 2: 120.0, 3: None}


def test_asof_join_tolerance_and_empty_right(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", 7)],
               "id bigint, t string, user bigint")
    right = _ts(spark, [("2024-01-01 08:00:00", 7, 5.0)],
                "t string, user bigint, px double")
    hit = asof_join(left, right, "ts", by="user").collect()[0]["r_px"]
    assert hit == 5.0
    missed = asof_join(left, right, "ts", by="user",
                       tolerance="30 minutes").collect()[0]["r_px"]
    assert missed is None  # 2h-old quote outside the 30m lookback
    none = asof_join(left, right.where(F.lit(False)), "ts",
                     by="user").collect()[0]["r_px"]
    assert none is None


def test_range_join_containment(spark):
    pts = _ts(spark, [
        (1, "2024-01-01 10:30:00", 7),
        (2, "2024-01-01 23:00:00", 7),   # in no interval
        (3, "2024-01-01 10:30:00", 8),   # wrong key for s1
    ], "id bigint, t string, user bigint")
    iv = spark.createDataFrame([
        ("s1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 7),
        ("s2", "2024-01-01 10:30:00", "2024-01-01 10:31:00", 7),
        ("s3", "2024-01-01 09:00:00", "2024-01-01 12:00:00", 8),
    ], "name string, st string, en string, user bigint").select(
        "name", F.to_timestamp("st").alias("start"),
        F.to_timestamp("en").alias("end"), "user",
    )
    got = sorted(
        (r["id"], r["iv_name"])
        for r in range_join(pts, iv, "ts", "start", "end",
                            by="user", bin_seconds=600).collect()
    )
    # point 1: inside s1 AND at s2's closed start; point 3: inside s3
    assert got == [(1, "s1"), (1, "s2"), (3, "s3")]
    # half-open end: a point exactly at an interval end is excluded
    edge = _ts(spark, [(9, "2024-01-01 11:00:00", 7)],
               "id bigint, t string, user bigint")
    assert range_join(edge, iv, "ts", "start", "end",
                      by="user").count() == 0


def test_range_join_exact_across_bin_sizes(spark):
    """Binning is a rewrite, not an approximation: results identical
    for any bin width."""
    import random

    rng = random.Random(7)
    pts = _ts(spark, [
        (i, f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00", 1)
        for i in range(50)
    ], "id bigint, t string, user bigint")
    iv = spark.createDataFrame([
        (j, f"2024-01-01 {rng.randrange(20):02d}:00:00",
         f"2024-01-01 {rng.randrange(20, 24):02d}:00:00", 1)
        for j in range(10)
    ], "j bigint, st string, en string, user bigint").select(
        "j", F.to_timestamp("st").alias("start"),
        F.to_timestamp("en").alias("end"), "user",
    )
    a = sorted((r["id"], r["iv_j"]) for r in range_join(
        pts, iv, "ts", "start", "end", by="user", bin_seconds=60
    ).collect())
    b = sorted((r["id"], r["iv_j"]) for r in range_join(
        pts, iv, "ts", "start", "end", by="user", bin_seconds=7200
    ).collect())
    assert a == b and len(a) > 0


def test_asof_join_self_source_lineage(spark):
    """Both sides filtered from ONE DataFrame share Catalyst expr ids;
    the operator must re-alias so the cogroup keeps the right side's
    columns (regression: right group arrived without its ts column)."""
    ev = _ts(spark, [
        (1, "2024-01-01 10:00:00", 7, "click"),
        (2, "2024-01-01 09:00:00", 7, "view"),
        (3, "2024-01-01 09:30:00", 7, "view"),
    ], "event_id bigint, t string, user bigint, kind string")
    clicks = ev.where(F.col("kind") == "click").select(
        "event_id", "ts", "user")
    views = ev.where(F.col("kind") == "view").select(
        "ts", "user", F.col("event_id").alias("view_event"))
    out = asof_join(clicks, views, "ts", by="user",
                    right_cols=["view_event"]).collect()
    assert out[0]["r_view_event"] == 3  # 09:30 view, not the 09:00 one
