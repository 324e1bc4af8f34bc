"""End-to-end training-data preparation pipeline.

Composes the engine's pipeline operators into the standard LLM
data-prep sequence, with per-stage lineage metrics (rows in/out, wall
seconds) appended to ``{out_dir}/lineage.jsonl`` — the same
observability contract as the index builder (``index/blocks.py``
lineage), so a 100 TB run is debuggable stage by stage:

1. **quality gate** — Gopher shape/repetition thresholds
2. **perplexity filter** (optional) — corpus bigram-LM outlier cut
3. **PII redaction** — emails/IPs/phones masked in place
4. **paragraph dedup** (optional) — corpus-wide boilerplate strip
4b. **span dedup** (optional) — repeated token-k-gram excision
    (Lee et al. exact-substring shape, keep-first)
5. **exact dedup** — sha256 keep-first
6. **near dedup** — MinHash-LSH pairs → connected components →
   keep one doc per cluster
7. **decontamination** (optional) — n-gram collision vs an eval set
8. **domain mix** (optional) — resample to target group weights
9. **chunking** — overlapping token windows sized for the trainer
10. **split** — deterministic hash split (train/val/…)
11. **packing map** (optional) — concat-and-chunk sequence assignments
    written per split (``{out_dir}/{split}_packing``)

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
    span_dedup_k: int | None = None,
    quality_thresholds: dict | None = None,
    eval_docs: DataFrame | None = None,
    decontaminate_n: int = 13,
    target_mix: dict[str, float] | None = None,
    mix_group_col: str = "source",
    max_ppl: float | None = None,
    pack_seq_len: int | None = None,
    resumable: bool = False,
) -> dict:
    """Run the pipeline and write one parquet dataset per split under
    ``{out_dir}/{split}``.  Returns the lineage records (also appended
    to ``lineage.jsonl``).

    ``resumable=True`` materializes every stage to
    ``{out_dir}/_stages/<name>`` with a completion manifest written
    AFTER the parquet commit; a rerun with the same ``out_dir`` skips
    every completed stage (lineage records it as ``resumed``) and
    recomputes from the first missing one — the index builder's
    kill-and-rerun contract (``index/blocks.py`` per-bucket manifests)
    extended to the data-prep DAG.  Off by default: checkpointing
    trades the fused lazy plan for per-stage parquet round-trips, the
    right trade on a multi-hour 100 TB run and the wrong one on a
    laptop-sized pass."""
    from ..operators import (
        chunk_documents,
        decontaminate,
        dedup_by_clusters,
        dedup_paragraphs,
        exact_dedup,
        remove_repeated_spans,
        repeated_kgram_spans,
        gopher_quality,
        hash_split,
        minhash_lsh_pairs,
        pack_mapping,
        perplexity_filter,
        redact_pii,
        resample_to_mix,
    )

    splits = splits or {"train": 0.95, "val": 0.05}
    records = []

    def stage(name: str, fn, df: DataFrame, n_in: int) -> tuple:
        ckpt = f"{out_dir}/_stages/{name}"
        manifest = f"{ckpt}/_stage_manifest.json"
        if resumable and os.path.exists(manifest):
            with open(manifest) as f:
                prev = json.load(f)
            out = docs.sparkSession.read.parquet(ckpt)
            rec = {"stage": name, "rows_in": prev["rows_in"],
                   "rows_out": prev["rows_out"], "wall_s": 0.0,
                   "resumed": True}
            _log(out_dir, **rec)
            records.append(rec)
            return out, prev["rows_out"]
        t0 = time.time()
        out = fn(df)
        if resumable:
            out.write.mode("overwrite").parquet(ckpt)
            out = docs.sparkSession.read.parquet(ckpt)
        n_out = out.count()
        rec = {"stage": name, "rows_in": n_in, "rows_out": n_out,
               "wall_s": round(time.time() - t0, 2)}
        if resumable:
            # manifest AFTER the parquet commit = the completion marker
            with open(manifest, "w") as f:
                json.dump(rec, f)
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
    if max_ppl is not None:
        cur, n = stage(
            "perplexity_filter",
            lambda d: perplexity_filter(d, text_col, id_col,
                                        max_ppl=max_ppl),
            cur, n,
        )
    cur, n = stage("pii_redact",
                   lambda d: redact_pii(d, text_col), cur, n)
    if paragraph_dedup:
        def _para(d):
            deduped = dedup_paragraphs(d, text_col, id_col)
            rest = d.drop(text_col).withColumnRenamed(id_col, "id")
            out = deduped.join(rest, "id").withColumnRenamed("id", id_col)
            return out.where(F.length(text_col) > 0)
        cur, n = stage("paragraph_dedup", _para, cur, n)
    if span_dedup_k:
        def _spans(d):
            d = d.cache()
            spans = repeated_kgram_spans(d, text_col, id_col,
                                         k=span_dedup_k)
            rest = d.drop(text_col).withColumnRenamed(id_col, "id")
            cut = remove_repeated_spans(d, spans, text_col, id_col)
            return (cut.withColumnRenamed(id_col, "id")
                    .join(rest, "id").withColumnRenamed("id", id_col))

        cur, n = stage("span_dedup", _spans, cur, n)
    cur, n = stage("exact_dedup",
                   lambda d: exact_dedup(d, text_col, id_col), cur, n)

    def _near(d):
        d = d.cache()
        pairs = minhash_lsh_pairs(d, text_col, id_col,
                                  threshold=near_dup_threshold)
        return dedup_by_clusters(d, pairs, id_col)

    cur, n = stage("near_dedup", _near, cur, n)
    if eval_docs is not None:
        cur, n = stage(
            "decontaminate",
            lambda d: decontaminate(d, eval_docs, text_col, id_col,
                                    n=decontaminate_n),
            cur, n,
        )
    if target_mix:
        cur, n = stage(
            "domain_mix",
            lambda d: resample_to_mix(d, mix_group_col, target_mix,
                                      id_col=id_col),
            cur, n,
        )
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
    if pack_seq_len:
        # pack each split's chunks into fixed-length training sequences;
        # chunk order key = (doc id, chunk_id) packed into one int64
        # (chunk_id < 2^20 — chunk counts per doc are bounded by the
        # chunker's max_tokens floor long before that)
        t0 = time.time()
        pack_rows = {}
        for name in splits:
            part = cur.sparkSession.read.parquet(f"{out_dir}/{name}")
            keyed = part.select(
                (F.col("id") * F.lit(1 << 20)
                 + F.col("chunk_id")).alias("pack_id"),
                "chunk_text",
            )
            mapping = pack_mapping(keyed, text_col="chunk_text",
                                   id_col="pack_id", seq_len=pack_seq_len)
            mapping.write.mode("overwrite").parquet(
                f"{out_dir}/{name}_packing"
            )
            pack_rows[name] = mapping.count()
        rec = {"stage": "packing_map", "rows_in": sum(counts.values()),
               "rows_out": sum(pack_rows.values()),
               "wall_s": round(time.time() - t0, 2),
               **{f"rows_{k}": v for k, v in pack_rows.items()}}
        _log(out_dir, **rec)
        records.append(rec)
    return {"records": records, "splits": counts}
