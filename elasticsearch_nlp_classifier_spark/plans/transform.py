"""ES ``_transform`` API: pivot / latest transforms, batch + continuous.

ES transforms (`PUT _transform/<id>`) materialize an entity-centric
index from an event-centric one — the cluster the reference drives
through `utils/elasticsearch/ESClient.java` runs them as
background jobs with two flavors:

- **pivot**: ``group_by`` (terms / histogram / date_histogram) +
  ``aggregations`` → one row per group, re-run continuously;
- **latest**: newest document per ``unique_key`` ordered by ``sort``.

Spark-first mapping:

- pivot           = ONE hash aggregation (``groupBy().agg``) — partial
                    map-side combine, a single shuffle on the group
                    keys; at 100 TB that is the optimal plan, no
                    windowing needed.
- latest          = ``max_by(struct(sort, tiebreak), payload)`` — also
                    one hash aggregation.  Deliberately *not* a window
                    (`row_number() OVER`): a window must shuffle-sort
                    every event per key; max_by keeps one struct per
                    key per partition and merges — the same answer at
                    a fraction of the shuffle.
- continuous mode = checkpointed incremental recompute
                    (``run_continuous``): each sync tick reads only
                    rows with ``sync_field > checkpoint``, recomputes
                    *only the group keys present in the delta* (ES's
                    own continuous-transform optimization), and merges
                    them over the previous output by key.  Cost per
                    tick scales with the delta, not the corpus.

``group_by`` spec values: ``"terms"`` (raw column), ``("histogram",
width)`` (numeric bucket floor), ``("date_histogram", interval_s)``
(epoch-second bucket floor — calendar intervals beyond fixed seconds
belong to DATE_TRUNC upstream).

``aggregations`` spec values: ``(op, column)`` with op in
``value_count | sum | avg | min | max | cardinality`` — the subset ES
allows in transforms that is mergeable under incremental recompute
(cardinality is exact here, not HLL; swap in the sketch module's HLL
for approximate-at-scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "pivot_transform",
    "latest_transform",
    "run_continuous",
    "read_transform_dest",
]

_AGG_OPS = {
    "value_count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "cardinality": lambda c: F.countDistinct(c),
}


def _group_cols(group_by: dict) -> list[Column]:
    cols = []
    for name, spec in group_by.items():
        if spec == "terms" or (isinstance(spec, (list, tuple)) and spec[0] == "terms"):
            src = name if spec == "terms" else spec[1]
            cols.append(F.col(src).alias(name))
        elif isinstance(spec, (list, tuple)) and spec[0] == "histogram":
            width = spec[2] if len(spec) > 2 else spec[1]
            src = spec[1] if len(spec) > 2 else name
            cols.append((F.floor(F.col(src) / F.lit(width)) * F.lit(width)).alias(name))
        elif isinstance(spec, (list, tuple)) and spec[0] == "date_histogram":
            interval = spec[2] if len(spec) > 2 else spec[1]
            src = spec[1] if len(spec) > 2 else name
            secs = F.floor(F.unix_timestamp(F.col(src)) / interval) * interval
            cols.append(secs.cast("long").alias(name))
        else:
            raise ValueError(f"transform: bad group_by spec {name}={spec!r}")
    return cols


def _agg_cols(aggregations: dict) -> list[Column]:
    cols = []
    for name, (op, src) in aggregations.items():
        fn = _AGG_OPS.get(op)
        if fn is None:
            raise ValueError(f"transform: unsupported aggregation {op!r} "
                             f"(mergeable set: {sorted(_AGG_OPS)})")
        cols.append(fn(F.col(src)).alias(name))
    return cols


def pivot_transform(
    df: DataFrame, group_by: dict, aggregations: dict,
) -> DataFrame:
    """ES pivot transform preview/batch run: one hash aggregation.

    >>> pivot_transform(events,
    ...     group_by={"user_id": "terms",
    ...               "day": ("date_histogram", "ts", 86400)},
    ...     aggregations={"n": ("value_count", "event_id"),
    ...                   "total": ("sum", "value")})
    """
    return df.groupBy(*_group_cols(group_by)).agg(*_agg_cols(aggregations))


def latest_transform(
    df: DataFrame,
    unique_key: list[str],
    sort: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """ES latest transform: the newest row per ``unique_key`` by
    ``sort`` (ties broken by ``tiebreak`` descending, for a
    deterministic winner — ES itself breaks ties by ingest order,
    which a distributed engine must pin explicitly).

    Single ``max_by`` hash aggregation; no per-key shuffle-sort.
    """
    payload = [c for c in df.columns if c not in unique_key]
    order = F.struct(F.col(sort), *([F.col(tiebreak)] if tiebreak else []))
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__latest")
    out = df.groupBy(*unique_key).agg(row)
    return out.select(*unique_key, *[F.col(f"__latest.{c}").alias(c) for c in payload])


# ------------------------------------------------------------ continuous

def _ckpt_path(dest_dir: str) -> str:
    return os.path.join(dest_dir, "_transform_checkpoint.json")


def read_transform_dest(spark: SparkSession, dest_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(dest_dir, "dest.parquet"))


def run_continuous(
    spark: SparkSession,
    source: DataFrame,
    dest_dir: str,
    group_by: dict,
    aggregations: dict,
    sync_field: str = "ts",
) -> dict:
    """One sync tick of an ES continuous pivot transform.

    Reads the checkpoint, filters the source to ``sync_field >
    checkpoint`` (at scale: partition pruning on a time-partitioned
    table makes this a delta scan), recomputes ONLY group keys present
    in the delta — against the *full* source restricted to those keys,
    exactly ES's changed-entities recompute — and merges the result
    over the previous output by key.  Returns tick metrics.

    The recompute-changed-keys-from-full-source strategy keeps every
    aggregation exact (avg/cardinality are not incrementally mergeable
    from partials without extra state) while bounding work to
    ``|changed keys|`` — the same contract ES documents.
    """
    dest = os.path.join(dest_dir, "dest.parquet")
    ckpt_file = _ckpt_path(dest_dir)
    last_sync = None
    if os.path.exists(ckpt_file):
        with open(ckpt_file) as fh:
            last_sync = json.load(fh)["last_sync"]

    delta = source
    if last_sync is not None:
        delta = source.filter(F.col(sync_field).cast("string") > F.lit(last_sync))

    key_names = list(group_by)
    changed_keys = delta.select(*[c.alias(n) for c, n in
                                  zip(_group_cols(group_by), key_names)]).distinct()
    n_changed = changed_keys.count()

    if n_changed == 0:
        return {"changed_keys": 0, "last_sync": last_sync, "rows": None}

    # full-source rows restricted to changed keys (broadcast when small
    # — the common continuous-tick case; Catalyst/AQE handles the flip)
    keyed = source.select(
        "*", *[c.alias(f"__k_{n}") for c, n in zip(_group_cols(group_by), key_names)]
    )
    bc = F.broadcast(changed_keys) if n_changed <= 100_000 else changed_keys
    cond = [keyed[f"__k_{n}"].eqNullSafe(bc[n]) for n in key_names]
    relevant = keyed.join(bc, cond, "left_semi").drop(*[f"__k_{n}" for n in key_names])

    fresh = pivot_transform(relevant, group_by, aggregations)

    if last_sync is None or not os.path.exists(dest):
        merged = fresh
    else:
        prev = spark.read.parquet(dest)
        anti = [prev[n].eqNullSafe(bc[n]) for n in key_names]
        keep = prev.join(bc, anti, "left_anti")
        merged = keep.unionByName(fresh)

    # merged reads dest; stage through tmp so the overwrite never
    # clobbers its own input mid-scan
    tmp = dest + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(dest)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    new_sync_row = source.agg(F.max(F.col(sync_field).cast("string"))).collect()[0][0]
    with open(ckpt_file, "w") as fh:
        json.dump({"last_sync": new_sync_row}, fh)
    rows = spark.read.parquet(dest).count()
    return {"changed_keys": n_changed, "last_sync": new_sync_row, "rows": rows}
