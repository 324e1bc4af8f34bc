"""Index snapshot/restore (index/snapshot.py): manifest integrity,
tamper detection, restore equivalence."""

import os

import pytest

from elasticsearch_nlp_classifier_spark.index.blocks import (
    PhysicalIndex,
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.index.snapshot import (
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from elasticsearch_nlp_classifier_spark.query.wand import wand_topk


@pytest.fixture(scope="module")
def idx(spark, corpus_sf_tiny, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snapidx") / "phys")
    return build_physical_index(corpus_sf_tiny["docs"], out,
                                block_size=16)


def _top(spark, index):
    q = spark.createDataFrame([(0, "import tokenize stream")],
                              ["query_id", "query_text"])
    return [(r["doc_id"], round(r["score"], 9))
            for r in wand_topk(index, q, k=5).collect()]


def test_snapshot_restore_roundtrip(spark, idx, tmp_path):
    repo = str(tmp_path / "repo")
    man = snapshot_index(idx.path, repo, "snap1")
    assert man["files"] and all(
        len(m["sha256"]) == 64 for m in man["files"].values()
    )
    assert verify_snapshot(repo, "snap1") == []
    # snapshots are immutable
    with pytest.raises(FileExistsError):
        snapshot_index(idx.path, repo, "snap1")

    target = str(tmp_path / "restored")
    restore_index(repo, "snap1", target)
    restored = PhysicalIndex(target, spark)
    assert _top(spark, restored) == _top(spark, idx)


def test_snapshot_tamper_detected_and_restore_refused(spark, idx,
                                                      tmp_path):
    repo = str(tmp_path / "repo2")
    snapshot_index(idx.path, repo, "s")
    # flip bytes in one repository file
    snap_dir = os.path.join(repo, "s")
    victim = None
    for dirpath, _, names in os.walk(snap_dir):
        for n in names:
            if n.endswith(".parquet"):
                victim = os.path.join(dirpath, n)
                break
        if victim:
            break
    with open(victim, "r+b") as f:
        f.seek(0)
        f.write(b"\xde\xad\xbe\xef")
    problems = verify_snapshot(repo, "s")
    assert any("sha mismatch" in p for p in problems)
    with pytest.raises(IOError):
        restore_index(repo, "s", str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never"))
