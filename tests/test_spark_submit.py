"""spark-submit --py-files smoke test (the north rule's deployment
shape: ``spark-submit --py-files engine.zip jobs/build_index.py``).

The job script is copied OUT of the repo into a temp dir before
submission, so its ``sys.path.insert(parent_of_job)`` points at the
temp dir, not the repo — the ``elasticsearch_nlp_classifier_spark``
import can only resolve through the ``--py-files`` zip, proving the
package is fully shippable (no repo-relative file access at runtime).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "elasticsearch_nlp_classifier_spark"


def _build_engine_zip(zpath: str) -> None:
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_build_index(tmp_path):
    from elasticsearch_nlp_classifier_spark.corpus.generator import (
        gen_corpus_pdf,
    )

    zpath = str(tmp_path / "engine.zip")
    _build_engine_zip(zpath)

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.Table.from_pandas(gen_corpus_pdf(200)), corpus)

    job = str(tmp_path / "build_index.py")
    shutil.copy(os.path.join(REPO, "jobs", "build_index.py"), job)

    out_idx = str(tmp_path / "index")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # only --py-files may supply the pkg
    env.update({
        "SPARK_GRAFT_SANDBOX": "1",
        "SPARK_GRAFT_CPUS": "4",
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    })
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zpath,
         job, "--input", corpus, "--output", out_idx,
         "--assign-doc-ids", "--analyzer", "simple_code"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])

    with open(os.path.join(out_idx, "corpus_stats.json")) as f:
        stats = json.load(f)
    assert stats["doc_count"] == 200
    assert stats["sum_ttf"] > 0
    # per-bucket manifests (the resume/lineage contract) were written
    mdir = os.path.join(out_idx, "manifests")
    assert any(f.startswith("bucket_") for f in os.listdir(mdir))
