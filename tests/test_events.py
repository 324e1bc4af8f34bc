"""Event-time analytics: batch windowed/session aggregation vs DuckDB,
streaming watermark late-data semantics, and the applyInPandasWithState
sessionizer pinned row-identical to the batch sessionizer."""

import time

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.streaming import (
    sessionize_events,
    sessionize_events_stateful,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"
EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_windowed_counts_batch_vs_duckdb(events):
    got = (
        windowed_event_counts(events, "10 minutes")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        SELECT (floor(epoch(ts) / 600) * 600)::BIGINT AS window_start,
               event_type, count(*)::BIGINT AS n_events,
               round(sum(value), 6) AS sum_value_r6
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessionize_batch_vs_duckdb(events):
    got = (
        sessionize_events(events, "30 minutes")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH e AS (SELECT user_id, epoch(ts) AS s, value
                   FROM read_parquet('{SF}/events.parquet')),
        brk AS (SELECT user_id, s, value,
                       CASE WHEN s - lag(s) OVER (PARTITION BY user_id
                                                  ORDER BY s) >= 1800
                            THEN 1 ELSE 0 END AS b FROM e),
        g AS (SELECT user_id, s, value,
                     sum(b) OVER (PARTITION BY user_id ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) AS sess
              FROM brk)
        SELECT user_id, floor(min(s))::BIGINT AS session_start,
               floor(max(s))::BIGINT AS session_end,
               count(*)::BIGINT AS n_events,
               round(sum(value), 6) AS sum_value_r6
        FROM g GROUP BY user_id, sess
        ORDER BY user_id, session_start
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _write_file(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(path)
    time.sleep(0.05)  # distinct mtimes -> deterministic file order


T0 = pd.Timestamp("2024-03-01 10:00:00")


def _ev(i, minutes, user=1, etype="click", value=1.0):
    ts = (T0 + pd.Timedelta(minutes=minutes)).to_pydatetime()
    return (i, ts, user, etype, value, "{}")


def test_stream_windowed_drops_late_data(spark, tmp_path):
    """A row arriving after its window was finalized+emitted must be
    dropped, never re-emitting the window (append-mode contract).

    Spark uses the PREVIOUS batch's watermark to filter late rows and
    the current one to evict state (SPARK-40925), so the late row is
    staged one batch AFTER the batch whose eviction emitted its window.
    """
    src = str(tmp_path / "src")
    out = f"late_wc_{id(tmp_path)}"
    # batch 0: two windows' worth of events (10:00-10:10, 10:10-10:20)
    _write_file(spark, [_ev(0, 1), _ev(1, 5), _ev(2, 12)], f"{src}/f0.parquet")
    # batch 1: watermark pusher at 12:00 -> eviction wm 11:30 next batch
    _write_file(spark, [_ev(3, 120)], f"{src}/f1.parquet")
    # batch 2: fresh row; eviction wm 11:30 finalizes+emits both windows
    _write_file(spark, [_ev(4, 150)], f"{src}/f2.parquet")
    # batch 3: late row at 10:06 — its window is closed (late-filter wm
    # is now 11:30) -> guaranteed drop; plus a fresh row
    _write_file(spark, [_ev(5, 6), _ev(6, 160)], f"{src}/f3.parquet")

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet/")
    )
    q = (
        windowed_event_counts(stream, "10 minutes", watermark="30 minutes")
        .writeStream.format("memory").queryName(out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {out}").collect()
    w0 = int(T0.timestamp())
    got = {}
    for r in rows:
        # no window may be emitted twice (the late row must not have
        # re-opened state for the closed 10:00 window)
        assert r["window_start"] not in got, rows
        got[r["window_start"]] = r["n_events"]
    # 10:00-10:10 finalized with its 2 on-time rows, late row dropped;
    # 10:10-10:20 finalized with 1 row
    assert got[w0] == 2
    assert got[w0 + 600] == 1


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch session_window on the
    same events, once the watermark flushes all real sessions."""
    src = str(tmp_path / "src")
    rows = [
        # user 1: two sessions (gap 40 min > 30)
        _ev(0, 0), _ev(1, 10), _ev(2, 20), _ev(3, 60), _ev(4, 75),
        # user 2: one session
        _ev(5, 5, user=2), _ev(6, 25, user=2),
    ]
    _write_file(spark, rows[:4], f"{src}/f0.parquet")
    _write_file(spark, rows[4:], f"{src}/f1.parquet")
    # two sentinel batches push the watermark far past every session+gap
    _write_file(spark, [_ev(90, 10_000, user=99)], f"{src}/f2.parquet")
    _write_file(spark, [_ev(91, 20_000, user=99)], f"{src}/f3.parquet")

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet/")
    )
    out = f"sess_{id(tmp_path)}"
    q = (
        sessionize_events_stateful(stream, "30 minutes",
                                   watermark="30 minutes")
        .writeStream.format("memory").queryName(out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql(f"SELECT * FROM {out}")
        .where(F.col("user_id") != 99)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    batch = (
        sessionize_events(
            spark.createDataFrame(rows, EVENT_SCHEMA), "30 minutes"
        )
        .where(F.col("user_id") != 99)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)
