"""ES index sorting (`index.sort.field`) + early-terminating sorted
top-k.

ES/Lucene lets a mapping declare a sort field; segments store docs in
that order, so a `sort: [field]` query collects k hits from the front
of each segment and STOPS — it never scores or even visits the rest
(`track_total_hits: false` early termination).  The reference inherits
this through its hosted cluster; this module is the Spark-native
re-expression:

- **build**: one pass computes exact, deterministic range-bucket
  boundaries over the sort column (an exact `percentile` aggregate on
  the pruned single column — never a full-row global sort), then the
  table writes as parquet partitioned by ``sort_bucket`` with rows
  sorted within each bucket (so parquet row-group min/max stats are
  tight too).  One hash-free exchange, reproducible bucket edges —
  unlike ``repartitionByRange``, whose sampled boundaries change run
  to run.
- **query**: ``sorted_topk`` walks buckets in sort order, reading ONE
  partition-pruned bucket at a time (the bucket filter is a partition
  directory filter — untouched buckets are never listed, opened, or
  scanned) and stops as soon as the running match count reaches k:
  Lucene's early termination, expressed as partition pruning.  With a
  selective row filter it keeps walking until k matches accumulate,
  exactly like Lucene's sorted collector.

At 100 TB the win is the same as ES's: a `sort+limit` query touches
O(k/selectivity) rows instead of the corpus.  A plain
``df.orderBy(f).limit(k)`` in Spark is already a TakeOrdered (no full
sort), but it still SCANS every row; the sorted layout turns the scan
itself into O(buckets-needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_sorted_index", "sorted_topk"]


def build_sorted_index(
    df: DataFrame,
    sort_field: str,
    path: str,
    buckets: int = 16,
) -> list[float]:
    """Write ``df`` as a range-bucketed, within-bucket-sorted parquet
    layout at ``path``; returns the bucket boundaries (ascending).

    Bucket b holds rows with ``boundary[b-1] < v <= boundary[b]``
    (half-open, nulls land in the LAST bucket like ES's sort missing
    _last).  Boundaries are exact percentiles of the sort column —
    deterministic for a deterministic input, so rebuilds are
    byte-comparable and resumable tooling can trust the layout.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    probs = [i / buckets for i in range(1, buckets)]
    row = df.agg(
        F.percentile(F.col(sort_field), F.array(*[F.lit(p) for p in probs]))
        .alias("bs")
    ).collect()[0]
    bounds = [float(b) for b in (row["bs"] or [])]
    # strictly increasing edges only (duplicates collapse buckets)
    edges: list[float] = []
    for b in bounds:
        if not edges or b > edges[-1]:
            edges.append(b)

    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(
            F.col(sort_field) > F.lit(e), 1
        ).otherwise(0)
    bucket = F.when(
        F.col(sort_field).isNull(), F.lit(len(edges))
    ).otherwise(bucket)

    (
        df.withColumn("sort_bucket", bucket.cast("int"))
        .repartition("sort_bucket")
        .sortWithinPartitions("sort_bucket", sort_field)
        .write.mode("overwrite")
        .partitionBy("sort_bucket")
        .parquet(path)
    )
    return edges


def sorted_topk(
    spark: SparkSession,
    path: str,
    sort_field: str,
    k: int,
    desc: bool = False,
    where: Column | None = None,
    allowed: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` rows by ``sort_field`` (ties → ``id_col`` asc) from a
    `build_sorted_index` layout, reading only the bucket partitions
    needed — Lucene early termination as partition pruning.

    ``where`` gates rows with a pushdown-friendly Column predicate;
    ``allowed`` gates with a doc-id SET (one ``id_col`` column) via a
    broadcast semi-join — the ES idiom ``query + sort + size`` where a
    match query restricts candidates but ranking is a field sort, and
    the collector still early-terminates per segment.  Either way the
    walk keeps reading buckets until k gated matches accumulate.

    The driver walk costs one count per touched bucket; each count is
    a partition-pruned, column-pruned scan.  The final result re-reads
    just the touched buckets.  Nulls sort last and are never returned
    before k non-null matches exist (ES ``missing: _last``).
    """
    src = spark.read.parquet(path)
    all_buckets = sorted(
        r.sort_bucket for r in src.select("sort_bucket").distinct().collect()
    )
    order = list(reversed(all_buckets)) if desc else all_buckets

    def gate(df: DataFrame) -> DataFrame:
        if where is not None:
            df = df.where(where)
        if allowed is not None:
            df = df.join(
                F.broadcast(allowed.select(id_col).distinct()),
                id_col, "left_semi",
            )
        return df

    taken: list[int] = []
    n = 0
    for b in order:
        taken.append(b)
        part = gate(src.where(F.col("sort_bucket") == b))
        n += part.where(F.col(sort_field).isNotNull()).count()
        if n >= k:
            break

    out = gate(src.where(F.col("sort_bucket").isin(taken)))
    key = F.col(sort_field).desc_nulls_last() if desc \
        else F.col(sort_field).asc_nulls_last()
    return (
        out.orderBy(key, F.col(id_col).asc())
        .limit(int(k))
        .drop("sort_bucket")
    )
