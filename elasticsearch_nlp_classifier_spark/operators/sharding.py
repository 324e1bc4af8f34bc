"""Deterministic global shuffle + shard writing for training data.

The last step of an LLM data pipeline is materialising the corpus as
N shard files in a *randomized but reproducible* order (data loaders
stream shards sequentially, so any residual ordering — by source, by
crawl date, by domain — becomes curriculum bias).  Two requirements a
naive ``df.orderBy(rand())`` fails:

* **determinism** — re-running the job must produce byte-identical
  shards (``rand()`` is partition-order dependent; a content hash is
  not);
* **no global sort at scale** — a total order over 100 TB is a full
  range-exchange; but shard assignment + *within-shard* order only
  needs one hash partition exchange, with each shard sorted
  independently (``repartition(n, shard).sortWithinPartitions``) —
  Spark plans exactly one shuffle and no global merge.

The draw is the engine's portable md5-60bit hash
(``sampling.hash_uniform``), so shard membership and order are
replayable in ANSI SQL for the correctness oracle, and stable under
re-partitioning, retries, and cluster size.

``pos`` is the within-shard rank; downstream loaders can seek/resume
on it.  A uniform hash balances shard sizes to ±O(√(n/N)); the skew a
key-ordered write would create cannot occur because the draw is
content-id-based, not value-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_uniform

__all__ = ["shard_assignment", "global_shuffle", "write_shards"]


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
) -> DataFrame:
    """Adds ``shard`` (0..n_shards-1) and ``pos`` (within-shard rank in
    the deterministic shuffled order).  One hash-partition exchange;
    the rank window partitions by ``shard`` so no global sort exists
    in the plan."""
    u = hash_uniform(id_col, seed)
    with_shard = df.withColumn(
        "shard", F.floor(u * F.lit(n_shards)).cast("int")
    ).withColumn("_u", u)
    w = Window.partitionBy("shard").orderBy(
        F.col("_u").asc(), F.col(id_col).asc()
    )
    return (
        with_shard.withColumn(
            "pos", (F.row_number().over(w) - F.lit(1)).cast("bigint")
        ).drop("_u")
    )


def global_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: str = "shuffle",
) -> DataFrame:
    """The corpus in deterministic pseudo-random order (hash of the id,
    tie → id).  This IS a total order — use it for bounded outputs or
    small corpora; at scale prefer :func:`shard_assignment`, which
    never materialises a global order."""
    return df.orderBy(hash_uniform(id_col, seed).asc(), F.col(id_col).asc())


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
) -> None:
    """Materialise shards as ``shard=K`` parquet partitions, each file
    internally in the deterministic shuffled order.  Plan: ONE shuffle
    (``repartition`` on the shard key) + per-partition sort — no global
    ordering stage; N output tasks write N shards in parallel."""
    out = shard_assignment(df, n_shards, id_col=id_col, seed=seed)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
