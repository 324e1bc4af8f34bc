"""Streaming percolation: match stored queries against a document
stream (ES-style alerting at ingest).

ES percolates each document once, at index time, against the stored
query registry; the streaming twin is a per-micro-batch percolate —
every batch's new documents run through the same broadcast
reverse-index join (``query/percolate.py``) and matched ``(doc_id,
query_id)`` alert rows are appended to a parquet alert log.  No
cross-batch state is needed (a doc is matched against the registry
exactly when it arrives), so this runs in ``foreachBatch`` with
exactly-once output via the checkpointed batch id: each batch writes
to an idempotent ``batch_id=N`` partition directory, making replays
overwrite instead of duplicate.

Scale shape: per batch identical to batch percolate — one narrow
tokenize, one broadcast join, one partial-aggregated groupBy.  The
registry DataFrame is captured once and re-broadcast per batch (cheap:
registries are query-sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["percolate_alerts_stream", "read_alerts"]


def percolate_alerts_stream(
    spark: SparkSession,
    input_dir: str,
    registered: DataFrame,
    alerts_dir: str,
    schema: str = "doc_id bigint, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "code",
    available_now: bool = True,
):
    """Start the alerting stream over a growing parquet directory;
    returns the ``StreamingQuery`` (caller owns ``awaitTermination``).
    Alert rows land under ``{alerts_dir}/batch_id=N/``."""
    from ..query.percolate import percolate

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        alerts = percolate(batch_df, registered, text_col=text_col,
                           id_col=id_col, analyzer=analyzer)
        # idempotent per-batch dir: a replayed batch overwrites itself
        alerts.write.mode("overwrite").parquet(
            f"{alerts_dir}/batch_id={batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{alerts_dir}/_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_alerts(spark: SparkSession, alerts_dir: str) -> DataFrame:
    """All alert rows emitted so far (union of batch partitions)."""
    return spark.read.option("basePath", alerts_dir).parquet(
        f"{alerts_dir}/batch_id=*"
    ).drop("batch_id")
