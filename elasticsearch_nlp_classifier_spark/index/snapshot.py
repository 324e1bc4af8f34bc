"""Index snapshot / restore (ES ``_snapshot`` API analog).

ES snapshots copy immutable segment files to a repository with
per-file checksums and restore by verifying + copying back.  The
engine's physical index is the same shape — immutable parquet blocks +
small sidecar tables — so a snapshot is:

- **snapshot**: copy the index directory into the repository under a
  snapshot name, writing ``SNAPSHOT.json`` with a sha256 per file.
  Blocks are immutable (Lucene-style segments), so incremental
  snapshots could hard-link unchanged files; this implementation
  copies, which is the correctness baseline.
- **verify**: recompute shas against the manifest — detects any
  bitrot/truncation in the repository.
- **restore**: verify first (a corrupt repository must never replace a
  live index), then copy into the target path atomically (staging dir
  + rename, same swap contract as ``sources/merge.py``).

Scale note: file copy/checksum is embarrassingly parallel and I/O
bound; a production repository is object storage and the copy is a
distcp-style job.  The driver-side loop here is the single-node form
of the same manifest contract — the manifest format (relative path →
sha256 + size) is what matters for parity and is fully tested.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

__all__ = ["snapshot_index", "verify_snapshot", "restore_index"]


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            out.append(os.path.relpath(p, root))
    return sorted(out)


def snapshot_index(index_path: str, repo_path: str, name: str) -> dict:
    """Copy the index into ``repo_path/name`` and write
    ``SNAPSHOT.json`` (relative path → {sha256, bytes}).  Returns the
    manifest dict.  Refuses to overwrite an existing snapshot name
    (snapshots are immutable, like ES)."""
    dest = os.path.join(repo_path, name)
    if os.path.exists(dest):
        raise FileExistsError(f"snapshot {name!r} already exists")
    os.makedirs(repo_path, exist_ok=True)
    staging = f"{dest}.staging-{uuid.uuid4().hex[:8]}"
    shutil.copytree(index_path, staging)
    files = {
        rel: {"sha256": _sha256(os.path.join(staging, rel)),
              "bytes": os.path.getsize(os.path.join(staging, rel))}
        for rel in _walk_files(staging)
    }
    manifest = {"name": name, "files": files}
    with open(os.path.join(staging, "SNAPSHOT.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(staging, dest)
    return manifest


def verify_snapshot(repo_path: str, name: str) -> list[str]:
    """Recompute checksums; returns the list of PROBLEMS (empty =
    intact): missing files, sha mismatches, extras not in the
    manifest."""
    dest = os.path.join(repo_path, name)
    with open(os.path.join(dest, "SNAPSHOT.json")) as f:
        manifest = json.load(f)
    problems = []
    on_disk = set(_walk_files(dest)) - {"SNAPSHOT.json"}
    for rel, meta in manifest["files"].items():
        p = os.path.join(dest, rel)
        if not os.path.exists(p):
            problems.append(f"missing: {rel}")
        elif _sha256(p) != meta["sha256"]:
            problems.append(f"sha mismatch: {rel}")
    problems += [f"unexpected file: {rel}"
                 for rel in sorted(on_disk - set(manifest["files"]))]
    return problems


def restore_index(repo_path: str, name: str, target_path: str) -> None:
    """Verify-then-restore; never leaves a half-written target (staging
    + rename swap).  Raises if the snapshot fails verification."""
    problems = verify_snapshot(repo_path, name)
    if problems:
        raise IOError(f"snapshot {name!r} corrupt: {problems[:5]}")
    dest = os.path.join(repo_path, name)
    staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
    shutil.copytree(dest, staging)
    os.remove(os.path.join(staging, "SNAPSHOT.json"))
    if os.path.exists(target_path):
        old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(target_path, old)
        try:
            os.rename(staging, target_path)
        except OSError:
            os.rename(old, target_path)
            raise
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, target_path)
