"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime coalesce +
skew-join backstop), Arrow transfers on, sane shuffle partition count.
On a real cluster these come from spark-submit conf; locally this is the
single place tests/jobs get a session from.

Sandbox-specific knobs (RAM-backed spark.local.dir, RawLocalFileSystem,
page-backing pre-touch) are OPT-IN via ``SPARK_GRAFT_SANDBOX=1`` — the
bench harness and test suite set it; a plain library user gets stock
Spark behavior (disk local dir, checksummed local writes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: glibc/Arrow allocator settings that keep worker memory RESIDENT.
#: This VM (Firecracker, `page_reporting_order=11`) unbacks freed guest
#: pages >=8 MB: any allocator that returns memory to the OS makes the
#: next touch fault through to the host, which stalls memory-bound work
#: by 10-50x in bursts.  Pinning glibc to never trim and to satisfy
#: large allocations from the (reused, already-backed) heap — and Arrow
#: to the system allocator so it obeys — keeps steady-state allocation
#: on backed pages.  On a real cluster these are harmless and match
#: long-lived-executor practice (allocators that cache pages).
WORKER_ALLOC_ENV = {
    "MALLOC_TRIM_THRESHOLD_": "-1",          # never return heap to OS
    "MALLOC_MMAP_THRESHOLD_": "1073741824",  # big allocs from heap, not mmap
    "MALLOC_ARENA_MAX": "2",
    "ARROW_DEFAULT_MEMORY_POOL": "system",   # obey glibc settings above
}


def _sandbox() -> bool:
    return os.environ.get("SPARK_GRAFT_SANDBOX", "") == "1"


def get_spark(
    master: str | None = None,
    app_name: str = "elasticsearch-nlp-classifier-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    fat_rows: bool = False,
) -> SparkSession:
    """``fat_rows=True`` restores the 64 MB Arrow per-batch byte cap
    (and a smaller records cap) for jobs whose rows are MB-scale —
    multimodal media payloads — where the narrow-row ``maxBytesPerBatch``
    sentinel below would otherwise allow multi-GB Arrow batches to reach
    a Python worker.  The multimodal operators pass it for you
    (``operators/multimodal.media_session_conf``)."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    cores = master[master.find("[") + 1: master.find("]")] if "[" in master else "32"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(8, int(cores))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Disable the JVM->Python per-ROW batch-bytes check: Spark 4.x's
        # BatchedPythonArrowInput calls ArrowWriter.sizeInBytes() after
        # EVERY appended row unless maxBytesPerBatch is the Int.MaxValue
        # sentinel, and sizeInBytes walks the whole vector tree
        # (setValueCount + getBufferSizeFor per field) — measured ~10 µs
        # of allocation churn per row, 19x slower than the transfer
        # itself on a 26M-row narrow frame, and it worsens with
        # concurrency (GC pressure), flattening multi-core scaling of
        # every mapInArrow/mapInPandas stage.  With the sentinel set,
        # batches are bounded by maxRecordsPerBatch above (10k rows):
        # exact, small batches for the engine's narrow hot-path frames.
        # Jobs carrying fat binary rows (multimodal media tables) should
        # restore a byte cap via extra_conf or lower maxRecordsPerBatch
        # — see operators/multimodal.py.
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str((1 << 31) - 1))
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        # task-commit renames (parallel, v2) instead of a serial
        # driver-side loop at job commit (v1): a dynamic-partition index
        # write produces O(tasks × buckets) files, and renaming them one
        # by one on the driver is pure Amdahl serial time at any scale
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        # plan strings are built for the UI/event log on EVERY job
        # submission; a long pipeline (stacked dataprep stages, each
        # with large analyzer expressions) stringifies to GBs and OOMs
        # the driver inside StringConcat.toString — cap it (truncated
        # plan text, full execution) instead of inheriting the
        # effectively-unbounded default
        .config("spark.sql.maxPlanStringLength", str(1 << 20))
    )
    if _sandbox():
        # Shuffle/spill scratch: executors on a real cluster own fast
        # local NVMe; this sandbox's virtual disk throttles in bursts.
        # RAM-backed /dev/shm keeps shuffle I/O off the virtual disk.
        # Override with SPARK_GRAFT_LOCAL_DIR.
        local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
        if local_dir is None and os.path.isdir("/dev/shm"):
            local_dir = "/dev/shm/spark-local"
        if local_dir:
            b = b.config("spark.local.dir", local_dir)
            # Shuffle bytes land in RAM-backed tmpfs here, so lz4'ing
            # them is CPU spent compressing memory-to-memory copies —
            # measured 14% off the 32-core index build with zero effect
            # at 8 cores.  On a real cluster (NVMe/network shuffle)
            # compression pays and the stock default stays on; this
            # rides the same sandbox gate as the RAM local dir itself.
            b = b.config("spark.shuffle.compress", "false")
            b = b.config("spark.shuffle.spill.compress", "false")
        # No native Hadoop libs in the sandbox, so ChecksumFileSystem
        # falls back to SHELLING OUT (fork+exec of chmod/ls) per file
        # create — forking a multi-GB JVM from 32 task threads convoys
        # on the kernel.  Bypassing the checksum wrapper halves file
        # creations; real deployments (HDFS/S3A) never hit this path.
        b = b.config("spark.hadoop.fs.file.impl",
                     "org.apache.hadoop.fs.RawLocalFileSystem")
        # Keep the JVM heap BACKED for the process lifetime: Xms=Xmx +
        # AlwaysPreTouch faults every heap page in once at startup and
        # G1 never uncommits.  Without this, G1 heap shrink frees pages
        # that free-page-reporting unbacks — later allocation-heavy
        # stages (tokenize, shuffle) re-fault them through the host and
        # stall 10-50x.  Matches production guidance for long-lived
        # executors (fixed heap).
        java_opts = (
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch "
            "-XX:-ShrinkHeapInSteps -XX:G1PeriodicGCInterval=0"
        )
        prev = os.environ.get("SPARK_GRAFT_EXTRA_JAVA_OPTS", "")
        b = b.config("spark.driver.extraJavaOptions",
                     (java_opts + " " + prev).strip())
        for k, v in WORKER_ALLOC_ENV.items():
            b = b.config(f"spark.executorEnv.{k}", v)
            # local mode: python workers fork from the driver-side
            # daemon, which inherits the driver process env
            os.environ.setdefault(k, v)
    if fat_rows:
        b = b.config("spark.sql.execution.arrow.maxBytesPerBatch",
                     str(64 * 1024 * 1024))
        b = b.config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
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
