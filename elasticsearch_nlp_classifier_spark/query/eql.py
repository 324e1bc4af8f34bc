"""EQL-style event sequence detection over an event stream table.

ES ships EQL (`/_eql/search`) for threat-hunting-style queries:

    sequence by user_id with maxspan=10m
      [ auth where event_type == "login_fail" ]
      [ auth where event_type == "login_fail" ]
      [ auth where event_type == "login_ok" ]

i.e. per entity, ordered step predicates within a time budget.  The
reference's users reach EQL through the same hosted cluster
(`utils/elasticsearch/ESClient.java`).

This re-expression is the positional-intervals machinery transplanted
from token positions to event timestamps (`query/spans.py` /
`phrase.py:span_near` share the shape):

1. ONE scan classifies each event against every step predicate
   (``sum(CASE)``-style projection — a k-step sequence never costs k
   scans);
2. per (entity, step) the matching timestamps collect into an array —
   a single hash aggregation, the only shuffle; per-entity state is
   bounded by that entity's event count, the same bound ES's
   sequence state machine carries;
3. the greedy in-order chain runs as a JVM higher-order expression:
   for each step-0 anchor, ``next_i = array_min(filter(ts_i, q -> q >
   prev))`` — greedy minimizes the chain end for a fixed anchor, so it
   decides anchor-validity exactly (the span_near argument);
   ``maxspan`` bounds ``chain_end − anchor``.

Returned ``n_matches`` counts anchors (step-0 events) that complete a
chain — EQL's own emission model (one sequence per anchor, events may
be shared across sequences) rather than a combinatorial cross
product.

Scale: the wide stage carries (entity, step, ts-array) rows.  A
pathological single entity with millions of events bounds one task;
cap it upstream with a per-entity event limit if the domain allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["eql_sequence", "eql_sample"]


def eql_sequence(
    events: DataFrame,
    by: str,
    steps: list[Column],
    ts_col: str = "ts",
    maxspan_s: float | None = None,
    until: Column | None = None,
) -> DataFrame:
    """(by, n_matches): entities whose event stream contains the step
    predicates in timestamp order (strictly increasing), optionally
    within ``maxspan_s`` seconds from first to last step.

    ``steps`` are arbitrary Column predicates over the event row —
    the EQL ``[ where ... ]`` clauses.  ``until`` is EQL's sequence
    terminator: an event matching it strictly between the anchor and
    the chain's end voids that sequence (ES: "sequences expire when
    the until event occurs").  Its timestamps ride the same single
    scan + hash agg as the steps — no extra pass."""
    if not steps:
        raise ValueError("eql_sequence needs at least one step")
    t = F.col(ts_col).cast("timestamp").cast("double")
    k = len(steps)

    cols = [steps[i].alias(f"_s{i}") for i in range(k)]
    if until is not None:
        cols.append(until.alias("_u"))
    proj = events.select(F.col(by), t.alias("_t"), *cols)
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(f"_s{i}"), F.col("_t")))
        ).alias(f"ts_{i}")
        for i in range(k)
    ]
    if until is not None:
        aggs.append(
            F.array_sort(
                F.collect_list(F.when(F.col("_u"), F.col("_t")))
            ).alias("ts_u")
        )
    per_entity = proj.groupBy(by).agg(*aggs)

    if k == 1:
        res = per_entity.select(
            by, F.size("ts_0").cast("bigint").alias("n_matches")
        ).where(F.col("n_matches") > 0)
        return res

    def _after(prev):
        return lambda q: q > prev

    def chain_end(anchor):
        prev = anchor
        for i in range(1, k):
            prev = F.array_min(F.filter(F.col(f"ts_{i}"), _after(prev)))
        return prev

    def _valid(anchor):
        end = chain_end(anchor)
        ok = end.isNotNull()
        if maxspan_s is not None:
            ok = ok & ((end - anchor) <= F.lit(float(maxspan_s)))
        if until is not None:
            ok = ok & ~F.exists(
                F.col("ts_u"), lambda u: (u > anchor) & (u < end)
            )
        return ok

    return (
        per_entity.withColumn(
            "n_matches",
            F.size(F.filter(F.col("ts_0"), _valid)).cast("bigint"),
        )
        .where(F.col("n_matches") > 0)
        .select(by, "n_matches")
    )


def eql_sample(
    events: DataFrame,
    by: str,
    steps: list[Column],
    ts_col: str = "ts",
    size: int = 10,
) -> DataFrame:
    """ES EQL ``sample``: unordered correlation — entities whose event
    stream matches EVERY step filter, with one representative event
    timestamp per filter (``sample by host [any where a][any where b]``
    — steps may match in any order, no maxspan).

    Returns ``(by, ts_0 … ts_{k-1})`` for up to ``size`` entities,
    key-ASC.  Engine determinism spec: the representative per step is
    the LATEST matching event timestamp (ES picks per-shard by ingest
    recency, which is not reproducible; latest-event-wins is this
    engine's pinned, replayable choice).

    Plan: the same one-scan shape as ``eql_sequence`` — every step
    predicate evaluates in a single projection, one hash aggregation
    per entity computes ``max(CASE WHEN step_i THEN ts END)``, and the
    all-steps-present filter is a null check on the aggregates.  No
    per-step scans, no joins; the wide stage carries one row per
    entity.
    """
    if not steps:
        raise ValueError("eql_sample needs at least one step")
    t = F.col(ts_col).cast("timestamp").cast("double")
    k = len(steps)
    proj = events.select(
        F.col(by), t.alias("_t"),
        *[steps[i].alias(f"_s{i}") for i in range(k)],
    )
    agg = proj.groupBy(by).agg(*[
        F.max(F.when(F.col(f"_s{i}"), F.col("_t"))).alias(f"ts_{i}")
        for i in range(k)
    ])
    cond = F.lit(True)
    for i in range(k):
        cond = cond & F.col(f"ts_{i}").isNotNull()
    return (
        agg.where(cond)
        .orderBy(F.col(by).asc())
        .limit(int(size))
        .select(by, *[f"ts_{i}" for i in range(k)])
    )
