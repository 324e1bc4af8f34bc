"""CSV source/sink (S1/S7).

S1 — `Tweets.fromCSV` (`utils/data/Tweets.java:27-49`) parses the
Kaggle train/test CSV with RFC4180 quoting into beans whose nullable
string fields default to ``""`` (`utils/data/Tweet.java:12-26`).
Spark's CSV parser is RFC4180 by default; the ``""`` default is an
explicit ``coalesce`` so downstream filters (P9 empty-label) behave
identically.

S7 — `Tweets.toSubmissionCSV` (`utils/data/Tweets.java:51-68`) writes
``(id, target)`` pairs in EXCEL dialect (header, comma, CRLF-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# `Tweet.java:12-26`: id int, everything else string (missing -> "").
TWEETS_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("keyword", StringType(), True),
        StructField("location", StringType(), True),
        StructField("text", StringType(), True),
        StructField("target", StringType(), True),
    ]
)


def read_tweets_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header + RFC4180 quotes + multiline fields; nullable string
    columns coerced to ``""`` like the reference beans."""
    df = spark.read.csv(
        path,
        header=True,
        schema=TWEETS_SCHEMA,
        quote='"',
        escape='"',
        multiLine=True,
        mode="PERMISSIVE",
    )
    fills = {
        f.name: "" for f in TWEETS_SCHEMA.fields
        if isinstance(f.dataType, StringType)
    }
    return df.na.fill(fills)


def write_submission_csv(
    df: DataFrame, path: str, id_col: str = "id", target_col: str = "target"
) -> None:
    """S7: ``(id, target)`` submission file with header.  One file per
    partition — ``coalesce(1)`` only at submission scale (thousands of
    rows, like the reference's 3,263), never on big outputs."""
    (
        df.select(F.col(id_col).alias("id"),
                  F.col(target_col).alias("target"))
        .coalesce(1)
        .write.mode("overwrite")
        .csv(path, header=True)
    )
