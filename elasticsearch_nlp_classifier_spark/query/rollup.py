"""ES Rollup (`_rollup`) analog: pre-aggregated time buckets that
answer date-histogram/metric queries without touching raw events.

ES's rollup jobs continuously condense an event index into per-bucket
summary docs (date_histogram groups + terms groups + metric
min/max/sum/value_count); rollup search then answers aggregations from
the summary index.  Same design here, lakehouse-shaped:

- **build** — one hash aggregation: ``date_trunc(unit) × dims`` →
  MERGEABLE partials (count, sum, min, max per metric).  Averages are
  NOT stored (not mergeable) — they re-derive as sum/count at query
  time, exactly ES's rule that rollups store only composable metrics.
- **query** — re-aggregate the partials at any coarser granularity or
  dim subset: sums/counts add, mins/maxes fold — a bucket-sized scan
  instead of the raw corpus.  Results are EXACT (not approximate) for
  any query whose time range aligns to rollup-bucket boundaries and
  whose grouping is a subset of the rollup dims; the helper refuses
  finer granularity than the rollup stores (ES behavior).

100 TB shape: the rollup table is smaller than raw by the events-per-
bucket factor (typically 10^3-10^6×); it partitions by the truncated
timestamp for range pruning, and re-aggregation shuffles one row per
(raw bucket, dims) — bucket-count bounded, corpus-size independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_rollup", "rollup_query", "ROLLUP_UNITS"]

#: coarse-to-fine calendar ladder; a rollup at unit u answers queries
#: at u or any unit coarser than u
ROLLUP_UNITS = ["minute", "hour", "day", "week", "month", "quarter",
                "year"]


def build_rollup(
    events: DataFrame,
    ts_col: str,
    dims: list[str],
    metrics: list[str],
    unit: str = "hour",
) -> DataFrame:
    """The rollup job's one aggregation pass.  Output columns:
    ``bucket_ts``, ``<dims...>``, ``doc_count``, and per metric ``m``:
    ``m_sum / m_min / m_max / m_count`` (null-skipping value_count,
    like ES)."""
    if unit not in ROLLUP_UNITS:
        raise ValueError(f"unit {unit!r} not in {ROLLUP_UNITS}")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for m in metrics:
        aggs += [
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
            F.count(m).alias(f"{m}_count"),
        ]
    return (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts"),
                 *[F.col(d) for d in dims])
        .agg(*aggs)
    )


def rollup_query(
    rollup: DataFrame,
    unit: str,
    rollup_unit: str,
    dims: list[str],
    metrics: list[str],
) -> DataFrame:
    """Answer a date_histogram(+dims) aggregation FROM the rollup:
    re-truncate ``bucket_ts`` to the (coarser-or-equal) query ``unit``,
    fold the partials.  Emits per metric ``m``: ``m_sum / m_min /
    m_max / m_count / m_avg`` (avg derived sum/count — never stored).

    Raises if the query wants finer time resolution than the rollup
    holds (ES rejects such rollup searches too)."""
    if ROLLUP_UNITS.index(unit) < ROLLUP_UNITS.index(rollup_unit):
        raise ValueError(
            f"rollup stores {rollup_unit!r} buckets; cannot answer a "
            f"finer {unit!r} histogram"
        )
    aggs = [F.sum("doc_count").alias("doc_count")]
    for m in metrics:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
            F.sum(f"{m}_count").alias(f"{m}_count"),
        ]
    out = (
        rollup.groupBy(
            F.date_trunc(unit, F.col("bucket_ts")).alias("key_ts"),
            *[F.col(d) for d in dims],
        )
        .agg(*aggs)
    )
    for m in metrics:
        out = out.withColumn(
            f"{m}_avg", F.col(f"{m}_sum") / F.col(f"{m}_count")
        )
    return out
