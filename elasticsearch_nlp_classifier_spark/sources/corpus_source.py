"""Corpus source — the engine-side stand-in for the reference's
scan-and-scroll reader (S2, `ScanAndScrollIterator.java:32-103`).

The reference pages a whole ES index through a cursor with async
double-buffering; on Spark that entire mechanism dissolves into a
partitioned parallel scan with Catalyst pushdown: callers apply
``.where`` / ``.select`` and both reach the parquet/Iceberg reader
(predicate pushdown + column pruning), replacing the reference's
server-side query + ``_source`` filtering (P1,
`ScanAndScrollIterator.java:96-97`).

Per SURVEY §7 the sandbox has no Iceberg runtime jar: a name with no
path separator is treated as an Iceberg table (``spark.table``), a path
as parquet with the identical schema.  All downstream engine code is
agnostic to which one backed the DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the source-code corpus table ``(repo, path, commit, lang,
    content)`` from an Iceberg table name or a parquet path."""
    looks_like_path = os.sep in source or source.endswith(".parquet")
    if looks_like_path:
        return spark.read.parquet(source)
    return spark.table(source)
