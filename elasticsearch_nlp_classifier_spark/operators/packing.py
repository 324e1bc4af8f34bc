"""Sequence packing for LLM training: lay tokenized documents end to
end (a separator token between docs, GPT-style concat-and-chunk) and
cut the stream into fixed-length training sequences.

The deliverable is the PACKING MAP — one row per (document slice ->
sequence) assignment::

    (seq_id, id, doc_off, seq_off, n_toks)

``doc_off`` = slice start within the document, ``seq_off`` = slice
start within the sequence.  Downstream writers join the map against the
token store to materialize arrays; keeping the map separate from the
payload is what scales (the map is ~1 row per doc, the payload join is
a narrow co-partitioned pass).

Scale shape: the only global dependency is an exclusive prefix-sum of
token counts in doc order.  A plain ``row_number()``/``sum() over
(order by id)`` window collapses to ONE task, so it is computed the
same way ``corpus/doc_ids.py`` numbers documents: range-repartition by
id, per-partition sums (one tiny collect), broadcast offsets, then a
running cumsum inside ``mapInPandas``.  Everything after the prefix-sum
is narrow codegen (sequence explode + arithmetic).  Equality with the
single-task window oracle is pinned in tests and by the DuckDB twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import token_count


def _prefix_sum(counts: DataFrame, id_col: str, val_col: str) -> DataFrame:
    """counts(id, val) -> (id, val, offset) with offset = exclusive
    cumulative sum of val in id order, computed distributed (no global
    window)."""
    n_parts = counts.sparkSession.sparkContext.defaultParallelism * 4
    parted = (
        counts.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .cache()
    )
    part_sums = (
        parted.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.sum(val_col).alias("s"))
        .orderBy("_pid")
        .collect()
    )
    starts: dict[int, int] = {}
    acc = 0
    for row in part_sums:
        starts[row["_pid"]] = acc
        acc += row["s"]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields
    ) + ", offset bigint"

    def run(pdf_iter):
        from pyspark import TaskContext

        pos = starts.get(TaskContext.get().partitionId(), 0)
        for pdf in pdf_iter:
            vals = pdf[val_col].to_numpy()
            ends = vals.cumsum() + pos
            pos = int(ends[-1]) if len(ends) else pos
            pdf = pdf.copy()
            pdf["offset"] = (ends - vals).astype("int64")
            yield pdf

    return parted.mapInPandas(run, schema)


def pack_mapping(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    sep_tokens: int = 1,
) -> DataFrame:
    """(seq_id, id, doc_off, seq_off, n_toks) — whitespace-token packing
    map at ``seq_len``, docs in ``id_col`` order, ``sep_tokens``
    separator slots after each doc.  Empty docs are skipped."""
    counts = (
        docs.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).cast("bigint").alias("n_toks"),
        )
        .where(F.col("n_toks") > 0)
        .withColumn("n_eff", F.col("n_toks") + F.lit(sep_tokens))
    )
    offs = _prefix_sum(counts, "id", "n_eff")
    L = F.lit(seq_len)
    first_seq = F.floor(F.col("offset") / L)
    last_seq = F.floor((F.col("offset") + F.col("n_toks") - 1) / L)
    exploded = offs.select(
        "id", "n_toks", "offset",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * L
    slice_start = F.greatest(F.col("offset"), seq_start)
    slice_end = F.least(F.col("offset") + F.col("n_toks"), seq_start + L)
    return exploded.select(
        "seq_id", "id",
        (slice_start - F.col("offset")).alias("doc_off"),
        (slice_start - seq_start).alias("seq_off"),
        (slice_end - slice_start).alias("n_toks"),
    )


def pack_tokens(
    docs: DataFrame,
    mapping: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    sep: str = "<|sep|>",
    pad: str = "<|pad|>",
) -> DataFrame:
    """Materialize (seq_id, tokens array<string>) from the packing map:
    join map -> doc tokens (co-partitioned on id), slice each doc's
    contribution, then assemble per sequence ordered by seq_off, with
    separator/pad slots filled in.  Exactly ``seq_len`` tokens per row."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        .alias("toks"),
    )
    slices = (
        mapping.join(toks, "id")
        .select(
            "seq_id", "seq_off",
            F.slice("toks", F.col("doc_off").cast("int") + 1,
                    F.col("n_toks").cast("int")).alias("piece"),
        )
    )
    assembled = (
        slices.groupBy("seq_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq_off", "piece")))
             .alias("ps"))
        .select(
            "seq_id",
            F.aggregate(
                "ps",
                F.array().cast("array<string>"),
                # pad the gap (separator slots) before each piece
                lambda acc, s: F.concat(
                    acc,
                    F.array_repeat(F.lit(sep),
                                   (s["seq_off"] - F.size(acc)).cast("int")),
                    s["piece"],
                ),
            ).alias("body"),
        )
        .select(
            "seq_id",
            F.concat(
                F.col("body"),
                F.array_repeat(F.lit(pad),
                               F.lit(seq_len) - F.size("body")),
            ).alias("tokens"),
        )
    )
    return assembled
