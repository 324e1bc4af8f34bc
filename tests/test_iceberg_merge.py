"""Live-Iceberg MERGE path, gated on a runtime jar being present
(VERDICT r4 #8).

No Iceberg runtime ships in this sandbox, so `merge_updates_iceberg`
is otherwise only text/parse-pinned.  This test makes the path
self-proving the day a jar appears: it looks for an
iceberg-spark-runtime jar (``ICEBERG_SPARK_JAR`` env var, then
``$SPARK_HOME/jars`` / pyspark's bundled jars dir), and when found
runs the SAME `sources/merge_contract.py` steps the parquet-emulation
test runs — against a real hadoop-catalog Iceberg table, in a
subprocess (an Iceberg session needs its own extensions conf; the
suite's shared JVM can't be reconfigured in place)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_JAR")
    if env and os.path.exists(env):
        return env
    roots = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars"))
    except ImportError:
        pass
    for r in roots:
        hits = glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


_DRIVER = """
import sys
from pyspark.sql import SparkSession
from elasticsearch_nlp_classifier_spark.sources import (
    merge_updates_iceberg,
)
from elasticsearch_nlp_classifier_spark.sources.merge_contract import (
    run_merge_contract,
)

jar, warehouse = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.lake",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.lake.type", "hadoop")
    .config("spark.sql.catalog.lake.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
TABLE = "lake.db.docs"

run_merge_contract(
    spark,
    create_table=lambda df: df.writeTo(TABLE).create(),
    merge=lambda upd, cols: merge_updates_iceberg(
        spark, TABLE, upd, "doc_id", cols),
    read_table=lambda: spark.table(TABLE),
)
spark.stop()
print("ICEBERG_CONTRACT_OK")
"""


@pytest.mark.skipif(_find_iceberg_jar() is None,
                    reason="no iceberg-spark-runtime jar available "
                           "in this environment")
def test_iceberg_merge_contract(tmp_path):
    jar = _find_iceberg_jar()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, jar, str(tmp_path / "wh")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ICEBERG_CONTRACT_OK" in proc.stdout
