"""Streaming exact deduplication (Structured Streaming stateful op).

Batch dedup (``operators/dedup.py``) answers "is this content already
in the corpus"; the streaming form answers it **across micro-batches as
data arrives** — the shape an ingest pipeline needs: content digests
held in the state store, first arrival wins, duplicates never reach the
sink.  This is Spark's built-in stateful ``dropDuplicates`` family, so
state is checkpointed (exactly-once under replay) and, with a
watermark, old digests are evicted instead of growing forever.

Two state policies:

- ``dedup_stream(df)`` — global keep-first: state = every digest ever
  seen.  Right when the corpus is bounded (a backfill) or digests are
  small relative to executor state.
- ``dedup_stream(df, ts_col=..., watermark=...)`` — bounded state via
  ``dropDuplicatesWithinWatermark``: a duplicate arriving within the
  watermark window of its first copy is dropped; state older than the
  watermark is evicted.  Right for unbounded feeds where re-posts
  cluster in time (the common web-crawl case) — the 100 TB-safe
  default, because state is O(events per watermark window), not
  O(corpus).

``dedup_stream_job`` wires either policy to a parquet sink with a
checkpoint — replays are idempotent, mirroring
``streaming/incremental.py``'s exactly-once contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["dedup_stream", "dedup_stream_job"]


def dedup_stream(
    stream_df: DataFrame,
    content_col: str = "content",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first-arriving row per content sha256; see module
    docstring for the two state policies."""
    out = stream_df.withColumn(
        "_sha", F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)
    )
    if ts_col is not None and watermark is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["_sha"]).drop("_sha")
    return out.dropDuplicates(["_sha"]).drop("_sha")


def dedup_stream_job(
    spark: SparkSession,
    src_glob: str,
    out_dir: str,
    schema: str,
    content_col: str = "content",
    ts_col: str | None = None,
    watermark: str | None = None,
):
    """File-source → stateful dedup → parquet sink, one micro-batch per
    trigger (availableNow).  The checkpoint under ``{out_dir}/_chk``
    carries both the source offsets and the digest state, so a
    kill-and-rerun resumes without emitting duplicates OR re-emitting
    already-sunk rows."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    deduped = dedup_stream(stream, content_col, ts_col, watermark)
    return (
        deduped.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/_chk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
