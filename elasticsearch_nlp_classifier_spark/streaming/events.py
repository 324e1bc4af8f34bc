"""Event-time analytics: tumbling-window aggregation and gap-based
sessionization, batch AND streaming from the same logical plan.

The reference has no event pipeline (batch-only, SURVEY §2.8); these are
the "beyond the reference" operators a large-scale ingest pipeline needs
over an append-only event stream (the driver's ``events`` table shape:
event_id, ts, user_id, event_type, value, props):

- ``windowed_event_counts`` — tumbling event-time windows.  On a batch
  DataFrame it is a plain groupBy; on a streaming DataFrame the SAME
  function adds a watermark so state for closed windows is evicted and
  late rows beyond the watermark are dropped (the batch form is the
  oracle for the stream form, and is itself DuckDB-oracled).
- ``sessionize_events`` — per-user gap sessions via the native
  ``F.session_window`` (merges as new events arrive; works batch and
  streaming).  One shuffle on user_id — the canonical sessionization
  shape at any scale.
- ``sessionize_events_stateful`` — the same semantics as a CUSTOM
  stateful operator over ``applyInPandasWithState`` with event-time
  timeouts: per-user open-session state, sessions emitted when the
  watermark passes last_ts + gap.  This is the template for stateful
  logic ``session_window`` can't express (e.g. value-dependent gaps);
  pytest pins it row-identical to the batch sessionizer.

Scale notes: windowed counts shuffle once on (window, event_type) with
map-side partial aggregation; streaming state is bounded by
watermark-evicted open windows / open sessions per user, never history.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _utc(df: DataFrame) -> DataFrame:
    # epoch extraction must agree with the (tz-naive) DuckDB oracle
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start epoch-seconds, event_type, n_events, sum_value_r6)
    per tumbling event-time window.  Streaming inputs get a watermark:
    rows later than it are dropped and closed-window state is freed."""
    src = _utc(events)
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r6",
        )
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(user_id, session_start, session_end epoch-seconds, n_events,
    sum_value_r6) gap-based sessions: a session ends when the user is
    idle for ``gap``.  Built on the native ``F.session_window`` (state
    merges incrementally under streaming; plain groupBy under batch)."""
    src = _utc(events)
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
            F.max(ts_col).alias("_last_ts"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start"))
            .alias("session_start"),
            F.unix_timestamp(F.col("_last_ts")).alias("session_end"),
            "n_events",
            "sum_value_r6",
        )
    )


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value_r6", DoubleType()),
])
# open-session accumulator per user
_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("sum_value", DoubleType()),
])


def _gap_to_us(gap: str) -> int:
    n, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(n) * mult * 1_000_000


def sessionize_events_stateful(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap sessionization as a custom ``applyInPandasWithState``
    operator with event-time timeouts — same output contract as
    ``sessionize_events``, but the per-group logic is arbitrary Python
    over Arrow batches, so it generalizes to session rules the built-in
    can't express.  A session is EMITTED (append mode) when the event
    -time watermark passes its last event + gap; open sessions stay in
    (bounded, per-user) state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _gap_to_us(gap)

    def close(state_row: tuple) -> pd.DataFrame:
        start_us, last_us, n, sv = state_row
        return pd.DataFrame({
            "session_start": [start_us // 1_000_000],
            "session_end": [last_us // 1_000_000],
            "n_events": [n],
            "sum_value_r6": [round(sv, 6)],
        })

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        out: list[pd.DataFrame] = []
        if state.hasTimedOut:
            out.append(close(state.get))
            state.remove()
        else:
            rows: Any = pd.concat(list(pdfs)).sort_values(ts_col)
            ts_us = (
                rows[ts_col].astype("datetime64[us]").astype("int64")
                .to_numpy()
            )  # epoch micros regardless of pandas ns/us unit
            vals = rows["value"].to_numpy()
            cur = list(state.get) if state.exists else None
            # session ranges are half-open [start, last+gap), matching
            # the built-in session_window: a row at exactly last+gap
            # opens a NEW session
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if cur is not None and t - cur[1] >= gap_us:
                    out.append(close(tuple(cur)))
                    cur = None
                if cur is None:
                    cur = [t, t, 0, 0.0]
                cur[0] = min(cur[0], t)  # in-watermark late arrival
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += float(v)
            if cur is not None:
                # wake up when the watermark passes last event + gap; a
                # timeout at/behind the current watermark is illegal —
                # that session is already closeable, emit it now
                timeout_ms = cur[1] // 1000 + gap_us // 1000
                if timeout_ms <= state.getCurrentWatermarkMs():
                    out.append(close(tuple(cur)))
                    state.remove()
                else:
                    state.update(tuple(cur))
                    state.setTimeoutTimestamp(timeout_ms)
        for pdf in out:
            pdf.insert(0, "user_id", key[0])
            yield pdf

    src = _utc(events).withWatermark(ts_col, watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
