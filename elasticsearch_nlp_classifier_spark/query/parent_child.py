"""ES parent/child (join-field) query surface over two relations.

ES models 1:N parent/child with a `join` field inside one index and
answers `has_child` / `has_parent` / `parent_id` queries plus the
`children` agg with block-join-like runtime joins.  The reference's
users get all of this through the stock `RestHighLevelClient`
(`utils/elasticsearch/ESClient.java`).  Relationally the
same data is two tables with a foreign key — exactly what Spark joins
are for, so each query maps to ONE semi/equi join that Catalyst is
free to broadcast or shuffle-hash:

- ``has_child``   — parents with ≥ min_children (≤ max_children)
  matching children: filter children → count per parent (map-side
  combined, one row per parent survives) → semi-join to parents.
  The child table is never exploded per parent.
- ``has_parent``  — children whose parent matches: filter parents →
  semi-join children on the key (matching-parent side is usually the
  small one → AQE broadcasts it).
- ``parent_id``   — children of one parent: a pushed-down equality
  filter, no join at all.
- ``children_agg``— parent buckets with child doc_counts: aggregate
  the children by parent key FIRST (child-table-sized shuffle becomes
  parent-count-sized), then join the bucket keys.

Score modes: ES's default ``score_mode=none`` (filter context) is what
these implement; scored modes would sum/max child scores per parent —
a one-line change to the aggregation, omitted until a caller needs it.

At 100 TB: all shapes aggregate-before-join, so the wide stages carry
parent-cardinality rows; a skewed parent (one order with millions of
lineitems) is bounded by the count aggregation, never materialised as
a join explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["has_child", "has_parent", "parent_id_query", "children_agg"]


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_filter: Column,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """ES ``has_child`` (score_mode none): parent rows having at least
    ``min_children`` (and at most ``max_children``) children matching
    ``child_filter``."""
    counts = (
        children.where(child_filter)
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(F.count(F.lit(1)).alias("_nc"))
        .where(F.col("_nc") >= F.lit(min_children))
    )
    if max_children is not None:
        counts = counts.where(F.col("_nc") <= F.lit(max_children))
    return parents.join(counts.select(parent_key), parent_key, "semi")


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_filter: Column,
) -> DataFrame:
    """ES ``has_parent``: child rows whose parent matches
    ``parent_filter``.  The filtered-parent side is aggregated to its
    keys before the semi-join."""
    keys = (
        parents.where(parent_filter)
        .select(F.col(parent_key).alias(child_key))
        .distinct()
    )
    return children.join(keys, child_key, "semi")


def parent_id_query(
    children: DataFrame, child_key: str, parent_id,
) -> DataFrame:
    """ES ``parent_id``: children of one specific parent — a plain
    pushed-down equality filter (shows up in ``PushedFilters`` on a
    parquet scan, no join)."""
    return children.where(F.col(child_key) == F.lit(parent_id))


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    bucket_field: str,
    child_filter: Column | None = None,
) -> DataFrame:
    """ES ``children`` agg under a parent ``terms`` bucket: for each
    value of the parent's ``bucket_field``, the number of (matching)
    child docs.  Children aggregate by parent key first, so the join
    input is one row per parent, then bucket totals are a second
    parent-sized aggregation.  Returns ``(key, doc_count)`` ordered by
    count desc / key asc like the terms agg."""
    ch = children if child_filter is None else children.where(child_filter)
    per_parent = ch.groupBy(F.col(child_key).alias(parent_key)).agg(
        F.count(F.lit(1)).alias("_nc")
    )
    return (
        parents.select(parent_key, bucket_field)
        .join(per_parent, parent_key)
        .groupBy(F.col(bucket_field).alias("key"))
        .agg(F.sum("_nc").cast("bigint").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )


def parent_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    bucket_field: str,
    child_filter: Column | None = None,
) -> DataFrame:
    """ES ``parent`` agg (the reverse of :func:`children_agg`): bucket
    the (matching) CHILD docs by ``bucket_field`` and report, per
    bucket, how many distinct PARENT docs own at least one such child.

    Scale shape: the child side collapses to distinct (parent ref,
    bucket) pairs before anything joins — the semi-join against the
    parent table and the final count both run at parent cardinality,
    never at child cardinality.  Returns ``(key, doc_count)`` ordered
    count desc / key asc."""
    ch = children if child_filter is None else children.where(child_filter)
    pairs = ch.select(
        F.col(child_key).alias(parent_key),
        F.col(bucket_field).alias("key"),
    ).distinct()
    return (
        pairs.join(parents.select(parent_key).distinct(), parent_key)
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )
