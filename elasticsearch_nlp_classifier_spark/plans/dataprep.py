"""End-to-end training-data preparation pipeline.

Composes the engine's pipeline operators into the standard LLM
data-prep sequence, with per-stage lineage metrics (rows in/out, wall
seconds) appended to ``{out_dir}/lineage.jsonl`` — the same
observability contract as the index builder (``index/blocks.py``
lineage), so a 100 TB run is debuggable stage by stage:

1. **quality gate** — Gopher shape/repetition thresholds
2. **PII redaction** — emails/IPs/phones masked in place
3. **paragraph dedup** (optional) — corpus-wide boilerplate strip
4. **exact dedup** — sha256 keep-first
5. **near dedup** — MinHash-LSH pairs → connected components →
   keep one doc per cluster
6. **chunking** — overlapping token windows sized for the trainer
7. **split** — deterministic hash split (train/val/…)

Stage boundaries are materialization points only where an iterative
algorithm needs one (the component closure); everything else stays one
lazy plan per stage so Catalyst fuses adjacent narrow stages.  Each
stage's count() is the lineage metric — at production scale you'd
sample or read it from the sink's metrics instead of forcing an extra
pass; here the counts double as the pipeline's acceptance checks.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["run_dataprep"]


def _log(out_dir: str, stage: str, **metrics) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/lineage.jsonl", "a") as f:
        f.write(json.dumps({"stage": stage, **metrics}) + "\n")


def run_dataprep(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 256,
    overlap: int = 16,
    near_dup_threshold: float = 0.7,
    splits: dict[str, float] | None = None,
    paragraph_dedup: bool = False,
    quality_thresholds: dict | None = None,
) -> dict:
    """Run the pipeline and write one parquet dataset per split under
    ``{out_dir}/{split}``.  Returns the lineage records (also appended
    to ``lineage.jsonl``)."""
    from ..operators import (
        chunk_documents,
        dedup_by_clusters,
        dedup_paragraphs,
        exact_dedup,
        gopher_quality,
        hash_split,
        minhash_lsh_pairs,
        redact_pii,
    )

    splits = splits or {"train": 0.95, "val": 0.05}
    records = []

    def stage(name: str, fn, df: DataFrame, n_in: int) -> tuple:
        t0 = time.time()
        out = fn(df)
        n_out = out.count()
        rec = {"stage": name, "rows_in": n_in, "rows_out": n_out,
               "wall_s": round(time.time() - t0, 2)}
        _log(out_dir, **rec)
        records.append(rec)
        return out, n_out

    n = docs.count()
    _log(out_dir, stage="input", rows_in=n, rows_out=n, wall_s=0.0)

    def _quality(df):
        q = gopher_quality(df, text_col, id_col,
                           thresholds=quality_thresholds)
        keep = q.where("gopher_pass").select(id_col)
        return df.join(keep, id_col, "left_semi")

    cur, n = stage("quality_gate", _quality, docs, n)
    cur, n = stage("pii_redact",
                   lambda d: redact_pii(d, text_col), cur, n)
    if paragraph_dedup:
        def _para(d):
            deduped = dedup_paragraphs(d, text_col, id_col)
            rest = d.drop(text_col).withColumnRenamed(id_col, "id")
            out = deduped.join(rest, "id").withColumnRenamed("id", id_col)
            return out.where(F.length(text_col) > 0)
        cur, n = stage("paragraph_dedup", _para, cur, n)
    cur, n = stage("exact_dedup",
                   lambda d: exact_dedup(d, text_col, id_col), cur, n)

    def _near(d):
        d = d.cache()
        pairs = minhash_lsh_pairs(d, text_col, id_col,
                                  threshold=near_dup_threshold)
        return dedup_by_clusters(d, pairs, id_col)

    cur, n = stage("near_dedup", _near, cur, n)
    cur, n = stage(
        "chunk",
        lambda d: chunk_documents(d, max_tokens, overlap, text_col,
                                  id_col),
        cur, n,
    )
    cur = hash_split(cur, splits, id_col="id", salt="dataprep")
    t0 = time.time()
    counts = {}
    for name in splits:
        part = cur.where(F.col("split") == name).drop("split")
        part.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        counts[name] = part.count()
    rec = {"stage": "split_write", "rows_in": n,
           "rows_out": sum(counts.values()),
           "wall_s": round(time.time() - t0, 2), **{
               f"rows_{k}": v for k, v in counts.items()}}
    _log(out_dir, **rec)
    records.append(rec)
    return {"records": records, "splits": counts}
