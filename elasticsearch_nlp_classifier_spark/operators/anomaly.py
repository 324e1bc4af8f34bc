"""ES ML anomaly detection (``_ml`` anomaly jobs) — batch analog.

ES's anomaly jobs bucket a time series (``bucket_span``), apply a
*detector* (``count``, ``mean(field)``, ``sum``, ``min``, ``max``),
optionally split by a field (``by_field_name``), model the bucket
values, and emit 0-100 ``record_score``s for unusual buckets.  The
reference's hosted cluster exposes these jobs to every client (same
service surface as `utils/elasticsearch/ESClient.java`).

This module re-expresses the batch shape with a documented,
deterministic scoring spec (ES's online mixture model is proprietary
C++ state; ours is published robust statistics):

1. bucketize: ``bucket_start = floor(epoch(ts)/span)*span`` (BIGINT
   epoch seconds — timezone-free);
2. detector metric per (by, bucket); for the ``count`` detector empty
   buckets inside each split's [min, max] range are **dense-filled
   with 0** (ES semantics — silence is an anomaly too);
3. baseline per split: exact median and MAD (median absolute
   deviation) of the bucket metrics;
4. robust z ``= |x − median| / (1.4826·MAD + 1e-9)`` and
   ``record_score = 100·(1 − exp(−z²/2))`` — monotone in z, 0-100,
   ≈0 for typical buckets, →100 for extreme ones.

Spark-first shape: one partial-aggregated shuffle to bucket metrics
(rows ≈ #buckets × #splits, never #events), a per-split baseline
aggregation (tiny) broadcast back, dense-fill via per-split
``sequence``/``explode`` — O(buckets) rows.  At 100 TB the only
event-sized stage is the first map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anomaly_detect"]

_DETECTORS = {"count", "sum", "mean", "min", "max"}


def anomaly_detect(
    events: DataFrame,
    detector: str = "count",
    field: str | None = None,
    ts_col: str = "ts",
    by_field: str | None = None,
    bucket_span_s: int = 3600,
    min_score: float = 0.0,
) -> DataFrame:
    """Score every time bucket: ``(by?, bucket_start, metric_r6,
    typical_r6, record_score_r6)`` with ``record_score_r6 >=
    min_score``, ordered by score desc then bucket.

    ``detector``: 'count' (dense zero-filled) or 'sum'/'mean'/'min'/
    'max' over ``field`` (observed buckets only).
    """
    if detector not in _DETECTORS:
        raise ValueError(f"unknown detector {detector!r}")
    if detector != "count" and field is None:
        raise ValueError(f"detector {detector!r} needs field=")

    by = by_field
    grp = [by] if by else []
    span = int(bucket_span_s)

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / span) * span
    ).cast("long").alias("bucket_start")

    agg = {
        "count": F.count(F.lit(1)),
        "sum": F.sum(field) if field else None,
        "mean": F.avg(field) if field else None,
        "min": F.min(field) if field else None,
        "max": F.max(field) if field else None,
    }[detector]
    keep = [field] if field else []
    m = (
        events.select(*grp, *keep, bucket)
        .groupBy(*grp, "bucket_start")
        .agg(agg.cast("double").alias("metric"))
    )

    if detector == "count":
        # dense-fill: every span-aligned bucket in each split's range
        rng = m.groupBy(*grp).agg(
            F.min("bucket_start").alias("mn"),
            F.max("bucket_start").alias("mx"),
        )
        dense = rng.select(
            *grp,
            F.explode(
                F.sequence("mn", "mx", F.lit(span))
            ).alias("bucket_start"),
        )
        m = (
            dense.join(m, [*grp, "bucket_start"], "left")
            .select(
                *grp, "bucket_start",
                F.coalesce("metric", F.lit(0.0)).alias("metric"),
            )
        )

    med = m.groupBy(*grp).agg(
        F.expr("percentile(metric, 0.5)").alias("typical")
    )
    dev = (
        m.join(F.broadcast(med), grp) if grp
        else m.crossJoin(F.broadcast(med))
    ).withColumn("absdev", F.abs(F.col("metric") - F.col("typical")))
    mad = dev.groupBy(*grp).agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    scored = (
        dev.join(F.broadcast(mad), grp) if grp
        else dev.crossJoin(F.broadcast(mad))
    ).withColumn(
        "z",
        F.col("absdev") / (F.lit(1.4826) * F.col("mad") + F.lit(1e-9)),
    ).withColumn(
        "record_score_r6",
        F.round(
            F.lit(100.0)
            * (F.lit(1.0) - F.exp(-(F.col("z") * F.col("z")) / F.lit(2.0))),
            6,
        ),
    )
    return (
        scored.where(F.col("record_score_r6") >= min_score)
        .select(
            *grp, "bucket_start",
            F.round("metric", 6).alias("metric_r6"),
            F.round("typical", 6).alias("typical_r6"),
            "record_score_r6",
        )
        .orderBy(
            F.desc("record_score_r6"),
            *grp, F.asc("bucket_start"),
        )
    )
