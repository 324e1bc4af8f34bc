"""ES search-surface conveniences: field collapsing, search_after
pagination, composite aggregation.

All three are thin Catalyst plans over an already-scored hit set or a
raw table — no Python in the row path, each with a direct SQL twin for
the oracle gate.

Scale notes:

* ``collapse_topk`` — one shuffle on the collapse key (window top-1
  per group), then ``TakeOrderedAndProject`` for the global cut; never
  a global sort.
* ``search_after`` — keyset pagination: a *filter* on the sort key
  tuple instead of ES's from+size deep-paging (which must materialize
  ``from+size`` rows per shard at any depth; the keyset filter pushes
  down and reads forward only).  This is the shape that survives
  paging through a 100 TB result set.
* ``composite_agg`` — ES's scalable bucket pagination: buckets ordered
  by the full source-key tuple, ``after`` continues from a key tuple,
  one partial-aggregated groupBy + the same keyset filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["collapse_topk", "collapse_inner_hits", "search_after",
           "composite_agg", "sliced_scan"]


def collapse_topk(
    hits: DataFrame,
    collapse_field: str,
    sort_field: str = "score",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES field collapsing: keep only the best hit per
    ``collapse_field`` value (by ``sort_field`` desc, tie → id asc),
    then return the global top-``k`` of the collapsed set.

    Returns ``(rank, key, id, sort_value)``."""
    w_g = Window.partitionBy(collapse_field).orderBy(
        F.desc(F.round(F.col(sort_field), 9)), F.asc(id_col)
    )
    best = (
        hits.where(F.col(collapse_field).isNotNull())
        .withColumn("_rn", F.row_number().over(w_g))
        .where(F.col("_rn") == 1)
    )
    w = Window.orderBy(
        F.desc(F.round(F.col(sort_field), 9)), F.asc(id_col)
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            F.col(collapse_field).alias("key"),
            F.col(id_col).alias("id"),
            F.col(sort_field).cast("double").alias("sort_value"),
        )
    )


def search_after(
    hits: DataFrame,
    after: tuple | None,
    sort_field: str = "score",
    id_col: str = "doc_id",
    size: int = 10,
) -> DataFrame:
    """ES ``search_after`` keyset pagination over a scored hit set:
    the next ``size`` hits strictly after the ``(sort_value, id)``
    cursor in (sort desc, id asc) order.  ``after=None`` is the first
    page.  Returns ``(id, sort_value)`` — the last row is the next
    cursor.

    The cursor comparison is one boolean filter (pushes down; no
    offset materialization at any depth)."""
    s = F.round(F.col(sort_field), 9)
    if after is not None:
        a_sort, a_id = after
        cursor: Column = (s < F.lit(round(float(a_sort), 9))) | (
            (s == F.lit(round(float(a_sort), 9)))
            & (F.col(id_col) > F.lit(a_id))
        )
        hits = hits.where(cursor)
    return (
        hits.orderBy(s.desc(), F.col(id_col).asc())
        .limit(size)
        .select(
            F.col(id_col).alias("id"),
            F.col(sort_field).cast("double").alias("sort_value"),
        )
    )


def _composite_source(src) -> tuple[str, Column]:
    """(output name, key Column) for one composite source.

    ``src`` is a plain field name (terms source) or an ES-style spec
    dict: ``{"field": f, "histogram": interval}`` buckets numerics to
    ``floor(v / interval) * interval``; ``{"field": f,
    "date_histogram": unit}`` truncates to the calendar unit and keys
    by epoch seconds (a sortable, engine-portable bucket key).  An
    optional ``"name"`` overrides the output column name like ES's
    named sources."""
    if isinstance(src, str):
        return src, F.col(src)
    name = src.get("name", src["field"])
    f = F.col(src["field"])
    if "histogram" in src:
        iv = float(src["histogram"])
        if iv <= 0:
            raise ValueError("histogram interval must be positive")
        return name, (F.floor(f / F.lit(iv)) * F.lit(iv)).cast("double")
    if "date_histogram" in src:
        return name, (
            F.date_trunc(src["date_histogram"], f)
            .cast("timestamp").cast("long")
        )
    raise ValueError(
        "composite source spec needs 'histogram' or 'date_histogram' "
        f"(got {sorted(src)})"
    )


def composite_agg(
    df: DataFrame,
    sources: list,
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` agg: multi-source buckets ``(key_1 ... key_n,
    doc_count)`` in full key-tuple ascending order, paginated with an
    ``after`` key tuple.  The pagination cursor is a keyset filter on
    the bucket key, so each page is one partial-aggregated groupBy +
    TakeOrdered — no state carried between pages.

    Sources may be plain field names (terms sources) or ES-style
    ``histogram`` / ``date_histogram`` spec dicts
    (`_composite_source`) — mixed freely, exactly like ES composites
    over ``[{terms}, {date_histogram}]``."""
    keys = [_composite_source(s) for s in sources]
    out = df
    for _, key_col in keys:
        out = out.where(key_col.isNotNull())
    names = [n for n, _ in keys]
    agg = out.groupBy(
        *[key_col.alias(n) for n, key_col in keys]
    ).agg(F.count(F.lit(1)).alias("doc_count"))
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after tuple must match sources")
        # lexicographic 'strictly greater than cursor'
        cond = F.lit(False)
        for i in range(len(keys), 0, -1):
            c = F.col(names[i - 1]) > F.lit(after[i - 1])
            for j in range(i - 1):
                c = c & (F.col(names[j]) == F.lit(after[j]))
            cond = cond | c
        agg = agg.where(cond)
    return (
        agg.orderBy(*[F.asc(n) for n in names])
        .limit(size)
        .select(*names, F.col("doc_count").cast("bigint"))
    )


def sliced_scan(
    df: DataFrame,
    slice_id: int,
    max_slices: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES sliced scroll (``"slice": {"id": i, "max": m}``): partition a
    scan into ``max_slices`` disjoint, collectively-exhaustive slices
    so independent consumers can drain one index in parallel.  Same
    hash-the-id contract as ES (doc _id hashed mod max); here it is a
    scan-side filter (`xxhash64 % m == i`), so every slice is one
    pushed-down pass — no global sort, no offset pagination, and the
    slice assignment is deterministic across retries."""
    if not 0 <= slice_id < max_slices:
        raise ValueError(f"slice_id {slice_id} not in [0, {max_slices})")
    h = F.xxhash64(F.col(id_col))
    return df.where(F.pmod(h, F.lit(max_slices)) == F.lit(slice_id))


def collapse_inner_hits(
    hits: DataFrame,
    collapse_field: str,
    sort_field: str = "score",
    k: int = 10,
    inner_size: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES field collapsing WITH ``inner_hits``: the global top-``k``
    collapsed groups (ranked by each group's best hit), each carrying
    its own top-``inner_size`` hits as an ordered array of
    ``(id, sort_value)`` structs.

    One window pass ranks hits within groups; group representatives and
    inner hits come out of the SAME ranked relation (rows with
    ``_rn <= inner_size`` aggregate into the array, row ``_rn = 1`` is
    the representative), so the corpus is scanned once and the shuffle
    carries only rows that can appear in some group's inner list.

    Returns ``(rank, key, id, sort_value, inner_hits)``."""
    w_g = Window.partitionBy(collapse_field).orderBy(
        F.desc(F.round(F.col(sort_field), 9)), F.asc(id_col)
    )
    ranked = (
        hits.where(F.col(collapse_field).isNotNull())
        .withColumn("_rn", F.row_number().over(w_g))
        .where(F.col("_rn") <= inner_size)
    )
    grouped = ranked.groupBy(F.col(collapse_field).alias("key")).agg(
        F.max(F.when(F.col("_rn") == 1, F.col(id_col))).alias("id"),
        F.max(F.when(F.col("_rn") == 1,
                     F.col(sort_field).cast("double"))).alias("sort_value"),
        F.array_sort(
            F.collect_list(F.struct(
                F.col("_rn").alias("rn"),
                F.col(id_col).alias("id"),
                F.round(F.col(sort_field), 6).cast("double")
                .alias("sort_value"),
            ))
        ).alias("inner_hits"),
    )
    w = Window.orderBy(F.desc(F.round(F.col("sort_value"), 9)),
                       F.asc("id"))
    return (
        grouped.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "key", "id", "sort_value",
            F.transform(
                "inner_hits",
                lambda s: F.struct(s["id"].alias("id"),
                                   s["sort_value"].alias("sort_value")),
            ).alias("inner_hits"),
        )
    )


def indices_boost_topk(
    indexes: dict[str, object],
    boosts: dict[str, float],
    query_text: str,
    k: int = 10,
    analyzer: str = "code",
) -> DataFrame:
    """ES ``indices_boost``: a multi-index search where hits from some
    indices count more (``"indices_boost": [{"idx_a": 1.0},
    {"idx_b": 2.0}]``) — recency tiering's classic knob (boost the hot
    index over the archive).

    Scoring follows the engine's multi-index contract
    (`index/build.union_indexes`): BM25 idf/avgdl come from the MERGED
    global statistics, and each doc's aggregated score multiplies its
    index's boost BEFORE any top-k cut (ES applies indices_boost
    during scoring — a post-truncation multiply would make a
    low-unboosted/high-boosted doc unreachable).  The provenance map
    is a plan-level union of the per-index doc_id sets carrying a
    constant boost column — no content rescan; the join against it is
    bounded by the match set, not the corpus.  The final cut is a
    distributed ``orderBy().limit(k)`` (TakeOrderedAndProject:
    per-partition top-k, driver merge of k·partitions rows), never a
    global one-partition window over the match set.

    Returns ``(rank, doc_id, score)`` — rank on round(score, 9), ties
    → doc_id ASC.
    """
    from ..index.build import union_indexes
    from .bm25 import bm25_scores

    if set(indexes) != set(boosts):
        raise ValueError("boosts must name exactly the given indexes")
    ix_list = list(indexes.values())
    merged = union_indexes(ix_list)
    spark = ix_list[0].postings.sparkSession
    prov = None
    for name, ix in indexes.items():
        part = ix.doc_lengths.select(
            "doc_id", F.lit(float(boosts[name])).alias("_boost")
        )
        prov = part if prov is None else prov.unionByName(part)
    q = spark.createDataFrame([(0, query_text)],
                              "query_id int, query_text string")
    scored = (
        bm25_scores(merged, q, analyzer=analyzer)
        .join(prov, "doc_id")
        .select("doc_id", (F.col("score") * F.col("_boost")).alias("score"))
    )
    topk = (
        scored.withColumn("_r", F.round("score", 9))
        .orderBy(F.desc("_r"), F.asc("doc_id"))
        .limit(int(k))
    )
    w = Window.orderBy(F.desc("_r"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
    )
