"""Streaming EQL sequence detection — the batch ``query/eql.py``
operator as a watermark-correct Structured Streaming stateful op.

ES runs EQL over indices at rest; a threat-hunting pipeline wants the
same ``sequence by entity [step1][step2]... with maxspan`` rule over a
LIVE event stream, emitting a match the moment it becomes decidable.
This is the canonical ``applyInPandasWithState`` shape (same template
as ``streaming/events.sessionize_events_stateful``):

- per-entity state holds one sorted timestamp array per step — only
  events inside the ``maxspan`` + allowed-lateness horizon, so state is
  bounded by the entity's event rate × maxspan, never history;
- an anchor (step-0 event) is DECIDED only once the event-time
  watermark passes ``anchor + maxspan`` — every event that could still
  complete (or not) its chain has then arrived, so out-of-order and
  late events inside the watermark can never retract an emitted match
  or un-miss a miss (the exactness argument for streaming == batch);
- decision = the batch operator's greedy in-order chain
  (next_i = first ts_i strictly after prev — the span_near argument),
  run on the tiny per-entity arrays with numpy searchsorted;
- event-time timeouts re-wake idle entities exactly when their oldest
  pending anchor becomes decidable; entities with no pending work
  drop their state entirely.

Emitted rows: ``(by, anchor_ts, end_ts)`` epoch seconds — one row per
matching anchor, EQL's own emission model (events may be shared across
sequences).  Pytest pins per-entity emitted-match counts equal to the
batch ``eql_sequence`` on the same finite stream.

``maxspan_s`` is REQUIRED here (unlike batch): it is what bounds both
decidability and state.  An unbounded streaming sequence would need
infinite lateness horizon — reject it loudly rather than buffer
forever.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["eql_sequence_stream"]

_OUT = StructType([
    StructField("entity", StringType()),
    StructField("anchor_ts", DoubleType()),
    StructField("end_ts", DoubleType()),
])

_STATE = StructType([
    StructField("tss", ArrayType(ArrayType(LongType()))),
])


def _greedy_chain(anchor_us: int, arrays: list[np.ndarray]) -> int | None:
    """Chain end (epoch µs) for an anchor, or None — the batch
    operator's greedy rule: each step takes the FIRST timestamp
    strictly after the previous step's."""
    prev = anchor_us
    for a in arrays:
        i = int(np.searchsorted(a, prev, side="right"))
        if i >= len(a):
            return None
        prev = int(a[i])
    return prev


def eql_sequence_stream(
    events: DataFrame,
    by: str,
    step_types: list[str],
    maxspan_s: float,
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming ``eql_sequence``: emit ``(entity, anchor_ts, end_ts)``
    per completed chain, append mode, exactly once per anchor.

    ``step_types`` are the ``[ t where event_type == s ]`` clauses (the
    common EQL step shape; arbitrary-predicate steps would ride the
    same state machine with a pre-projected step-id column).
    """
    if not step_types:
        raise ValueError("eql_sequence_stream needs at least one step")
    if maxspan_s is None or maxspan_s <= 0:
        raise ValueError(
            "streaming EQL requires a positive maxspan_s — it bounds "
            "both match decidability and per-entity state"
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(step_types)
    span_us = int(maxspan_s * 1_000_000)

    def decide(tss: list[np.ndarray], wm_us: int):
        """(emit rows, new state arrays): decide anchors with
        anchor+maxspan < watermark, prune the horizon."""
        out_a, out_e = [], []
        anchors = tss[0]
        decidable = anchors[anchors + span_us < wm_us]
        pending = anchors[anchors + span_us >= wm_us]
        for a in decidable.tolist():
            end = a if k == 1 else _greedy_chain(a, tss[1:])
            if end is not None and end - a <= span_us:
                out_a.append(a / 1e6)
                out_e.append(end / 1e6)
        horizon = wm_us - span_us
        new_tss = [pending] + [a[a >= horizon] for a in tss[1:]]
        return out_a, out_e, new_tss

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            tss = [np.array(a, dtype=np.int64) for a in state.get[0]]
            out_a, out_e, tss = decide(tss, wm_us)
        else:
            rows = pd.concat(list(pdfs))
            ts_us = (
                rows[ts_col].astype("datetime64[us]").astype("int64")
                .to_numpy()
            )
            types = rows[type_col].to_numpy()
            if state.exists:
                tss = [np.array(a, dtype=np.int64) for a in state.get[0]]
            else:
                tss = [np.array([], dtype=np.int64) for _ in range(k)]
            for i, s in enumerate(step_types):
                new = ts_us[types == s]
                if len(new):
                    tss[i] = np.sort(np.concatenate([tss[i], new]))
            out_a, out_e, tss = decide(tss, wm_us)

        if len(tss[0]):
            # wake when the oldest pending anchor becomes decidable
            state.update(([a.tolist() for a in tss],))
            state.setTimeoutTimestamp(
                (int(tss[0][0]) + span_us) // 1000 + 1
            )
        elif any(len(a) for a in tss[1:]):
            # no anchors: keep non-anchor steps until they age out of
            # the horizon, then the next timeout clears the state
            state.update(([a.tolist() for a in tss],))
            state.setTimeoutTimestamp(wm_us // 1000 + span_us // 1000 + 1)
        elif state.exists:
            state.remove()

        if out_a:
            yield pd.DataFrame({
                "entity": [str(key[0])] * len(out_a),
                "anchor_ts": out_a,
                "end_ts": out_e,
            })

    src = events
    # Precondition, not a side effect: the epoch arithmetic below needs
    # a UTC session zone (session.get_spark pins it).  Mutating the
    # session config here would silently change every other
    # timezone-sensitive query in the session — raise instead.
    tz = src.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"eql_sequence_stream requires spark.sql.session.timeZone="
            f"UTC (got {tz!r}) — sessions from session.get_spark pin "
            "it; set it at session build time, not per-operator"
        )
    return (
        src.withColumn("_k", F.col(by).cast("string"))
        # NTZ sources (plain parquet timestamps) carry no zone; the
        # session zone is pinned UTC above so the cast is the identity
        # mapping the batch operator's epoch cast uses
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy("_k")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
