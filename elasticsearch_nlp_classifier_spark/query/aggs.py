"""ES-style aggregations over the engine's tables and indexes.

The reference delegates every search to a hosted ElasticSearch cluster
(``utils/elasticsearch/ESClient.java`` builds a stock
``RestHighLevelClient`` — the full ES search surface, aggregations
included, is what its users have available).  This module re-expresses
the core ES aggregation families as Catalyst plans:

=================  =========================================  ==========
ES aggregation     Spark plan                                 shuffles
=================  =========================================  ==========
terms              groupBy(key).count → TakeOrdered(size)     1 partial
histogram          floor(v/interval)*interval groupBy         1 partial
date_histogram     date_trunc(unit) groupBy                   1 partial
range              CASE bucket label groupBy                  1 partial
filters            one pass, sum(CASE) per named filter       0 wide
stats/extended     single agg row (moments)                   0 wide
percentiles        exact ``percentile`` / approx t-digest-ish 1
cardinality        exact countDistinct / HLL++ approx         1
top_hits           row_number window per bucket               1
significant_terms  fg vs bg df join + JLH score               2
=================  =========================================  ==========

Scale notes (100 TB):

* every bucketing agg is a hash aggregate with **map-side partial
  combine** — the shuffle carries one row per (partition, bucket), not
  per input row; bucket-count, not data-size, bounds the wide stage.
* top-N over buckets is ``orderBy(...).limit(n)`` → Spark's
  ``TakeOrderedAndProject`` (per-partition heaps + driver merge of
  n·partitions rows), never a global sort.
* ``cardinality`` maps to ``approx_count_distinct`` — Spark's HLL++ is
  the same sketch family ES uses, mergeable across partitions with a
  fixed few-KB state per group.
* ``percentiles_approx`` uses Spark's mergeable quantile sketch
  (Greenwald-Khanna); the exact variant is for oracles / small groups.
* ``significant_terms`` joins per-term foreground counts against the
  corpus-wide ``term_stats`` table — both sides already aggregated, so
  the join is bucket-sized, and the foreground side is typically small
  enough that AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "terms_agg",
    "histogram_agg",
    "date_histogram_agg",
    "range_agg",
    "date_range_agg",
    "filters_agg",
    "missing_agg",
    "value_count_agg",
    "stats_agg",
    "extended_stats_agg",
    "percentiles_agg",
    "cardinality_agg",
    "top_hits_agg",
    "significant_terms",
    "derivative_agg",
    "cumulative_sum_agg",
    "moving_avg_agg",
    "serial_diff_agg",
    "stats_bucket_agg",
    "max_bucket_agg",
    "min_bucket_agg",
    "bucket_sort_agg",
    "rare_terms_agg",
    "multi_terms_agg",
    "adjacency_matrix_agg",
    "auto_date_histogram_agg",
    "significant_text",
    "weighted_avg_agg",
    "top_metrics_agg",
    "median_absolute_deviation_agg",
    "sampler_agg",
    "diversified_sampler_agg",
    "string_stats_agg",
    "boxplot_agg",
    "matrix_stats_agg",
    "t_test_agg",
    "scripted_metric_agg",
    "percentile_ranks_agg",
    "ip_numeric",
    "ip_range_agg",
    "global_agg",
    "bucket_script_agg",
    "bucket_selector_agg",
    "normalize_agg",
    "percentiles_bucket_agg",
    "rate_agg",
    "moving_fn_agg",
    "cumulative_cardinality_agg",
    "variable_width_histogram_agg",
    "categorize_text_agg",
    "frequent_item_sets_agg",
    "nested_terms_agg",
    "reverse_nested_agg",
]


def terms_agg(
    df: DataFrame,
    field: str,
    size: int = 10,
    include: str | list | None = None,
    exclude: str | list | None = None,
    partition: tuple[int, int] | None = None,
) -> DataFrame:
    """ES ``terms`` bucket agg: top-``size`` values of ``field`` by
    doc_count (tie → key ascending, matching ES's deterministic order).

    ``include``/``exclude`` follow ES's two forms: an anchored regex
    string (``"sw.*"``) or an explicit value list.  Both are scan-side
    filters on the key — they prune BEFORE the aggregation, so an
    include list never pays for the excluded long tail (same placement
    ES gives its IncludeExclude filter: at collection time, not on the
    final buckets).

    ``partition=(i, num_partitions)`` is ES's high-cardinality
    pagination (``"include": {"partition": i, "num_partitions": P}``):
    the key space is hash-split into P disjoint, collectively
    exhaustive slices and only slice ``i`` is aggregated — the way ES
    walks a million-term field without one giant response.  Engine
    hash spec: the portable md5-uniform draw (`operators/sampling`),
    ``slice = floor(u(key) · P)`` — deterministic, engine-independent
    (same arithmetic replays in ANSI SQL), applied at collection time
    like include/exclude.

    Returns columns ``(key, doc_count)``.
    """
    keyed = df.where(F.col(field).isNotNull())
    key = F.col(field).cast("string")
    if include is not None:
        keyed = keyed.where(
            key.isin([str(v) for v in include]) if isinstance(include, list)
            else key.rlike(f"^(?:{include})$"))
    if exclude is not None:
        keyed = keyed.where(
            ~key.isin([str(v) for v in exclude]) if isinstance(exclude, list)
            else ~key.rlike(f"^(?:{exclude})$"))
    if partition is not None:
        from ..operators.sampling import hash_uniform

        i, num = int(partition[0]), int(partition[1])
        if not (0 <= i < num):
            raise ValueError("partition must be (i, num) with 0 <= i < num")
        keyed = keyed.where(
            F.floor(hash_uniform(key, salt="terms_part")
                    * F.lit(float(num))) == F.lit(i)
        )
    return (
        keyed.groupBy(F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def terms_agg_subs(
    df: DataFrame, field: str, subs: dict[str, Column], size: int = 10,
    order_by: str | None = None, order_dir: str = "desc",
) -> DataFrame:
    """ES ``terms`` agg with SUB-AGGREGATIONS: top-``size`` buckets by
    doc_count (tie → key ASC), each carrying named metric
    sub-aggregations computed over the bucket's docs, e.g.::

        terms_agg_subs(df, "lang",
                       {"avg_chars": F.avg("n_chars"),
                        "max_chars": F.max("n_chars")})

    ``order_by`` is ES's metric bucket ordering (``"order":
    {"max_chars": "desc"}``): rank buckets by a named sub-agg (or
    ``"_key"``) instead of doc_count; tie → key ASC always.  Ordering
    happens on the already-aggregated bucket rows, so it changes only
    the TakeOrdered key, never the scan.

    One hash aggregation computes doc_count and every sub-metric
    together (partial/final, map-side combined) — buckets and metrics
    never require a second scan, exactly how ES computes sub-aggs in
    one collector pass.  Returns ``(key, doc_count, <sub names...>)``.
    """
    if order_dir not in ("asc", "desc"):
        raise ValueError("order_dir must be 'asc' or 'desc'")
    aggs = [F.count(F.lit(1)).alias("doc_count")] + [
        c.alias(name) for name, c in subs.items()
    ]
    if order_by is None:
        order_by = "doc_count"
    elif order_by != "_key" and order_by != "doc_count" \
            and order_by not in subs:
        raise ValueError(f"order_by {order_by!r} is not a sub-agg name, "
                         "'doc_count', or '_key'")
    if order_by == "_key":
        ordering = [F.col("key").asc() if order_dir == "asc"
                    else F.col("key").desc()]
    else:
        c = F.col(order_by)
        ordering = [c.asc() if order_dir == "asc" else c.desc(),
                    F.col("key").asc()]
    return (
        df.where(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("key"))
        .agg(*aggs)
        .orderBy(*ordering)
        .limit(size)
    )


def histogram_agg(
    df: DataFrame, field: str, interval: float,
    min_doc_count: int = 1,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """ES ``histogram``: fixed-width numeric buckets keyed by
    ``floor(value / interval) * interval``.  Returns ``(key, doc_count)``
    sorted by key (ES histogram order).

    ``extended_bounds=(lo, hi)`` with ``min_doc_count=0`` is ES's
    dense-histogram contract: every bucket in the snapped
    ``[floor(lo/iv)·iv, floor(hi/iv)·iv]`` range appears, empty ones
    with ``doc_count = 0`` (chart axes / downstream pipeline aggs need
    gap-free bucket tables).  The zero-fill joins a ``sequence()``
    spine of bucket keys — O(buckets), generated JVM-side, never a
    scan of anything corpus-sized — against the aggregated buckets.
    """
    key = (F.floor(F.col(field) / F.lit(interval)) * F.lit(interval))
    agg = (
        df.where(F.col(field).isNotNull())
        .groupBy(key.cast("double").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if extended_bounds is not None:
        lo, hi = (float(x) for x in extended_bounds)
        if hi < lo:
            raise ValueError("extended_bounds must be (lo, hi) with "
                             "lo <= hi")
        import math as _math

        lo_k = _math.floor(lo / interval)
        hi_k = _math.floor(hi / interval)
        spine = (
            df.sparkSession.range(1)
            .select(F.explode(F.sequence(
                F.lit(int(lo_k)), F.lit(int(hi_k))
            )).alias("_k"))
            .select((F.col("_k") * F.lit(interval))
                    .cast("double").alias("key"))
        )
        agg = (
            spine.join(agg, "key", "full_outer")
            .select("key",
                    F.coalesce("doc_count", F.lit(0)).alias("doc_count"))
        )
    return (
        agg.where(F.col("doc_count") >= min_doc_count)
        .orderBy("key")
    )


def date_histogram_agg(
    df: DataFrame, ts_field: str, unit: str = "day",
) -> DataFrame:
    """ES ``date_histogram`` with a calendar interval (``hour``/``day``/
    ``week``/``month``...): buckets by ``date_trunc``.  Returns
    ``(key_ts, doc_count)`` sorted by bucket."""
    return (
        df.where(F.col(ts_field).isNotNull())
        .groupBy(F.date_trunc(unit, F.col(ts_field)).alias("key_ts"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("key_ts")
    )


def range_agg(
    df: DataFrame, field: str, ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """ES ``range`` agg: half-open buckets ``[from, to)``; ``None`` is
    unbounded.  Bucket label mirrors ES ("a-b", "*-b", "a-*").  One
    CASE-expression pass — docs falling in no range are dropped, docs in
    overlapping ranges count once per range (ES semantics) via one
    ``sum(CASE)`` column per range, so still a single scan."""
    def _lbl(lo, hi):
        return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"

    def _pred(lo, hi) -> Column:
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col(field) >= F.lit(lo))
        if hi is not None:
            p = p & (F.col(field) < F.lit(hi))
        return p & F.col(field).isNotNull()

    counts = df.agg(*[
        F.sum(F.when(_pred(lo, hi), 1).otherwise(0)).alias(_lbl(lo, hi))
        for lo, hi in ranges
    ])
    # unpivot the single row into (key, doc_count) bucket rows
    labels = [_lbl(lo, hi) for lo, hi in ranges]
    stack = ", ".join(f"'{l}', `{l}`" for l in labels)
    return counts.selectExpr(
        f"stack({len(labels)}, {stack}) as (key, doc_count)"
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def filters_agg(df: DataFrame, named: dict[str, Column]) -> DataFrame:
    """ES ``filters`` agg: one named bucket per predicate, all counted
    in a single scan (``sum(CASE)`` per filter — no per-filter pass)."""
    counts = df.agg(*[
        F.sum(F.when(pred, 1).otherwise(0)).alias(name)
        for name, pred in named.items()
    ])
    labels = list(named)
    stack = ", ".join(f"'{l}', `{l}`" for l in labels)
    return counts.selectExpr(
        f"stack({len(labels)}, {stack}) as (key, doc_count)"
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def missing_agg(df: DataFrame, field: str) -> DataFrame:
    """ES ``missing`` agg: how many docs lack a value for ``field``
    (null; '' counts as missing too for string fields, matching the
    reference's empty-string-as-default CSV convention).  One
    ``sum(CASE)`` over the scan."""
    c = F.col(field)
    miss = c.isNull() | (c.cast("string") == F.lit(""))
    return df.agg(
        F.sum(F.when(miss, 1).otherwise(0)).cast("bigint")
        .alias("doc_count")
    )


def value_count_agg(df: DataFrame, field: str) -> DataFrame:
    """ES ``value_count`` agg: number of non-null values extracted for
    the field (not distinct — plain count)."""
    return df.agg(F.count(field).cast("bigint").alias("value_count"))


def date_range_agg(
    df: DataFrame, ts_field: str,
    ranges: list[tuple[str | None, str | None]],
) -> DataFrame:
    """ES ``date_range`` agg: half-open ``[from, to)`` buckets over a
    timestamp field; bounds are ISO strings, ``None`` unbounded.  Same
    single-scan ``sum(CASE)`` shape as :func:`range_agg` (ES's
    date_range IS range with date parsing)."""
    def _lbl(lo, hi):
        return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"

    def _pred(lo, hi) -> Column:
        c = F.col(ts_field)
        p = c.isNotNull()
        if lo is not None:
            p = p & (c >= F.to_timestamp(F.lit(lo)))
        if hi is not None:
            p = p & (c < F.to_timestamp(F.lit(hi)))
        return p

    counts = df.agg(*[
        F.sum(F.when(_pred(lo, hi), 1).otherwise(0)).alias(_lbl(lo, hi))
        for lo, hi in ranges
    ])
    labels = [_lbl(lo, hi) for lo, hi in ranges]
    stack = ", ".join(f"'{l}', `{l}`" for l in labels)
    return counts.selectExpr(
        f"stack({len(labels)}, {stack}) as (key, doc_count)"
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def stats_agg(df: DataFrame, field: str) -> DataFrame:
    """ES ``stats``: count/min/max/avg/sum in one partial-aggregated
    pass."""
    c = F.col(field)
    return df.where(c.isNotNull()).agg(
        F.count(c).alias("count"),
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        F.round(F.avg(c), 6).alias("avg"),
        F.sum(c).cast("double").alias("sum"),
    )


def extended_stats_agg(df: DataFrame, field: str) -> DataFrame:
    """ES ``extended_stats``: stats + sum_of_squares + population
    variance/std-dev (ES reports the population moments)."""
    c = F.col(field).cast("double")
    return df.where(c.isNotNull()).agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.round(F.avg(c), 6).alias("avg"),
        F.round(F.sum(c), 6).alias("sum"),
        F.round(F.sum(c * c), 6).alias("sum_of_squares"),
        F.round(F.var_pop(c), 6).alias("variance"),
        F.round(F.stddev_pop(c), 6).alias("std_deviation"),
    )


def percentiles_agg(
    df: DataFrame, field: str,
    percents: tuple[float, ...] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    exact: bool = True,
) -> DataFrame:
    """ES ``percentiles``.  ``exact=True`` uses Spark's exact
    ``percentile`` (linear interpolation — matches DuckDB
    ``quantile_cont``; holds the group in memory, oracle/small-data
    path).  ``exact=False`` uses ``percentile_approx`` — a mergeable
    sketch, the 100 TB path (ES itself is approximate: t-digest).

    Returns one row per percent: ``(percent, value)``."""
    c = F.col(field).cast("double")
    fracs = [p / 100.0 for p in percents]
    if exact:
        vals = df.agg(F.percentile(c, F.array(*[F.lit(f) for f in fracs]))
                      .alias("v")).select("v")
    else:
        vals = df.agg(
            F.percentile_approx(c, F.array(*[F.lit(f) for f in fracs]),
                                10_000).alias("v")
        ).select("v")
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in percents]).alias("percent"),
        F.col("v").alias("value"),
    )
    return (
        vals.select(F.explode(pairs).alias("pv"))
        .select(
            F.col("pv.percent").alias("percent"),
            F.round(F.col("pv.value"), 6).alias("value"),
        )
        .orderBy("percent")
    )


def cardinality_agg(
    df: DataFrame, field: str, exact: bool = False, rsd: float = 0.01,
) -> DataFrame:
    """ES ``cardinality``: distinct-count of ``field``.  Default is the
    HLL++ sketch (``approx_count_distinct`` — same sketch family ES
    uses; constant memory, mergeable).  ``exact=True`` is the oracle
    path (full distinct shuffle)."""
    c = F.col(field)
    agg = (F.countDistinct(c) if exact
           else F.approx_count_distinct(c, rsd))
    return df.agg(agg.cast("bigint").alias("value"))


def top_hits_agg(
    df: DataFrame, bucket_field: str, sort_field: str,
    size: int = 3, ascending: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``top_hits`` sub-agg under a ``terms`` bucket: the top
    ``size`` docs per bucket by ``sort_field`` (tie → ``id_col`` asc).

    One shuffle on the bucket key; the window's ``row_number`` keeps a
    running top-k per partition-local group — no global sort.  Returns
    ``(key, rank, id, sort_value)``."""
    s = F.asc(sort_field) if ascending else F.desc(sort_field)
    w = Window.partitionBy(bucket_field).orderBy(s, F.asc(id_col))
    return (
        df.where(F.col(bucket_field).isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
        .select(
            F.col(bucket_field).alias("key"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col(id_col).alias("id"),
            F.col(sort_field).cast("double").alias("sort_value"),
        )
    )


#: significance heuristics menu — ES lets `significant_terms` swap JLH
#: for chi_square / mutual_information / gnd / percentage
SIGNIFICANCE_HEURISTICS = (
    "jlh", "chi_square", "mutual_information", "gnd", "percentage",
)


def _significance_score(heuristic: str, n_fg: int, n_docs: int):
    """Score Column over (fg_df, bg_df) bucket rows.

    Engine spec (documented here, replayed identically in the SQL
    oracles).  With the ES default ``background_is_superset=true`` the
    two sets are first made disjoint, giving the 2×2 contingency table
    over (in-foreground?, has-term?)::

        n11 = fg_df            n01 = bg_df - fg_df
        n10 = n_fg - fg_df     n00 = (N - n_fg) - (bg_df - fg_df)

    - ``jlh``                (ES default): (fg_rate - bg_rate) *
                             (fg_rate / bg_rate), positives only
    - ``chi_square``         N·(n11·n00 - n01·n10)² /
                             ((n11+n01)(n11+n10)(n01+n00)(n10+n00)),
                             0 when any margin is empty; positives only
                             (fg_rate > bg_rate — ES
                             ``include_negatives=false``)
    - ``mutual_information`` Σ_cells (n/N)·log2(n·N / (rowΣ·colΣ))
                             (0-count cells contribute 0); positives
                             only
    - ``gnd``                Google Normalized Distance between
                             term-presence and foreground-membership:
                             g = (max(ln bg_df, ln n_fg) - ln fg_df) /
                             (ln N - min(ln bg_df, ln n_fg));
                             score = exp(-g) (similarity ∈ (0, 1])
    - ``percentage``         fg_df / bg_df
    """
    fg, bg = F.col("fg_df").cast("double"), F.col("bg_df").cast("double")
    nf, nd = float(n_fg), float(n_docs)
    fg_rate = fg / F.lit(nf)
    bg_rate = bg / F.lit(nd)
    positive = fg_rate > bg_rate
    if heuristic == "jlh":
        return F.when(
            positive, (fg_rate - bg_rate) * (fg_rate / bg_rate)
        ).otherwise(F.lit(0.0))
    n11, n01 = fg, bg - fg
    n10 = F.lit(nf) - fg
    n00 = F.lit(nd - nf) - (bg - fg)
    n = F.lit(nd)
    if heuristic == "chi_square":
        denom = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
        chi = n * (n11 * n00 - n01 * n10) * (n11 * n00 - n01 * n10) / denom
        return F.when(positive & (denom > 0), chi).otherwise(F.lit(0.0))
    if heuristic == "mutual_information":
        def term(nxy, row, col):
            return F.when(
                nxy > 0, (nxy / n) * F.log2(nxy * n / (row * col))
            ).otherwise(F.lit(0.0))
        mi = (
            term(n11, n11 + n10, n11 + n01)
            + term(n01, n01 + n00, n11 + n01)
            + term(n10, n11 + n10, n10 + n00)
            + term(n00, n01 + n00, n10 + n00)
        )
        return F.when(positive, mi).otherwise(F.lit(0.0))
    if heuristic == "gnd":
        num = F.greatest(F.log(bg), F.log(F.lit(nf))) - F.log(fg)
        den = F.log(F.lit(nd)) - F.least(F.log(bg), F.log(F.lit(nf)))
        return F.when(den > 0, F.exp(-num / den)).otherwise(F.lit(0.0))
    if heuristic == "percentage":
        return fg / bg
    raise ValueError(f"unknown significance heuristic {heuristic!r} — "
                     f"pick from {SIGNIFICANCE_HEURISTICS}")


def significant_terms(
    foreground: DataFrame, postings: DataFrame,
    doc_id_col: str = "doc_id", size: int = 10,
    min_doc_count: int = 2,
    n_docs: int | None = None,
    heuristic: str = "jlh",
) -> DataFrame:
    """ES ``significant_terms``: terms over-represented in a foreground
    doc set vs the whole corpus.  ``heuristic`` picks the significance
    score exactly like ES's per-agg heuristic object — ``jlh`` (the ES
    default)::

        score = (fg_rate - bg_rate) * (fg_rate / bg_rate)

    with ``fg_rate = fg_df / fg_docs``, ``bg_rate = df / n_docs`` —
    or ``chi_square`` / ``mutual_information`` / ``gnd`` /
    ``percentage`` (formulas: `_significance_score`).  Terms scoring 0
    (incl. fg_rate ≤ bg_rate for the positives-only heuristics) are
    excluded — ES only reports positively significant terms.

    ``foreground`` is any DataFrame with ``doc_id_col`` (e.g. the hits
    of a query); ``postings`` is the logical index's ``(doc_id, term,
    tf)`` table.  Plan: semi-join postings to the foreground ids
    (broadcast — a foreground is query-result-sized), aggregate df per
    term on each side, join the two bucket-sized aggregates.  Returns
    ``(term, fg_df, bg_df, score)`` top-``size`` by score desc, term
    asc.

    Pass ``n_docs`` (e.g. the index's ``corpus_stats["doc_count"]``)
    to skip the corpus-wide distinct count — at scale that count is a
    full postings scan the index already paid for at build time.
    """
    fg_ids = foreground.select(F.col(doc_id_col).alias("doc_id")).distinct()
    n_fg = fg_ids.count()
    if n_docs is None:
        n_docs = postings.select("doc_id").distinct().count()
    if n_fg == 0:
        return postings.sparkSession.createDataFrame(
            [], "term string, fg_df bigint, bg_df bigint, score double"
        )
    fg_df = (
        postings.join(F.broadcast(fg_ids), "doc_id", "left_semi")
        .groupBy("term").agg(F.countDistinct("doc_id").alias("fg_df"))
    )
    bg_df = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("bg_df")
    )
    return (
        fg_df.join(bg_df, "term")
        .where(F.col("fg_df") >= min_doc_count)
        .withColumn(
            "score",
            F.round(_significance_score(heuristic, n_fg, n_docs), 6),
        )
        .where(F.col("score") > 0)
        .orderBy(F.desc(F.round("score", 9)), F.asc("term"))
        .limit(size)
        .select("term",
                F.col("fg_df").cast("bigint").alias("fg_df"),
                F.col("bg_df").cast("bigint").alias("bg_df"),
                "score")
    )


# --- pipeline aggregations -------------------------------------------
#
# ES pipeline aggs (derivative, cumulative_sum, moving_fn, serial_diff,
# *_bucket, bucket_sort) post-process the BUCKET LIST of a parent
# aggregation — they never see raw documents.  That defines their scale
# shape: the input DataFrame here is an already-reduced bucket table
# (one row per date_histogram/terms bucket), so an unpartitioned window
# ordered by the bucket key holds O(buckets) state — thousands of rows
# at 100 TB, not billions.  The corpus-sized reduction already happened
# in the parent agg with map-side partial combine.


def derivative_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts",
) -> DataFrame:
    """ES ``derivative``: value minus the previous bucket's value in
    bucket-key order; first bucket yields NULL (ES omits it)."""
    w = Window.orderBy(key_col)
    return buckets.withColumn(
        "derivative",
        (F.col(value_col) - F.lag(value_col, 1).over(w)).cast("double"),
    )


def cumulative_sum_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts",
) -> DataFrame:
    """ES ``cumulative_sum`` over bucket order."""
    w = Window.orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.withColumn(
        "cumulative_sum", F.sum(value_col).over(w).cast("double")
    )


def moving_avg_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts", window: int = 3,
) -> DataFrame:
    """ES ``moving_fn`` with ``MovingFunctions.unweightedAvg`` over the
    trailing ``window`` buckets (current included, partial windows
    averaged over the buckets present — ES shift=0 semantics over
    ``window`` values ending at the previous bucket is one lag away;
    this is the common current-inclusive form)."""
    w = Window.orderBy(key_col).rowsBetween(-(window - 1), 0)
    return buckets.withColumn(
        "moving_avg", F.avg(value_col).over(w).cast("double")
    )


def serial_diff_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts", lag: int = 1,
) -> DataFrame:
    """ES ``serial_diff``: value minus the value ``lag`` buckets back."""
    w = Window.orderBy(key_col)
    return buckets.withColumn(
        "serial_diff",
        (F.col(value_col) - F.lag(value_col, lag).over(w)).cast("double"),
    )


def stats_bucket_agg(
    buckets: DataFrame, value_col: str = "doc_count",
) -> DataFrame:
    """ES ``stats_bucket``: min/max/avg/sum/count over the sibling
    buckets' metric — one row."""
    return buckets.agg(
        F.count(F.lit(1)).alias("count"),
        F.min(value_col).cast("double").alias("min"),
        F.max(value_col).cast("double").alias("max"),
        F.avg(value_col).cast("double").alias("avg"),
        F.sum(value_col).cast("double").alias("sum"),
    )


def max_bucket_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts",
) -> DataFrame:
    """ES ``max_bucket``: the bucket key(s) holding the maximum metric
    (ES reports a key LIST on ties; one row per tied key here, key
    order) plus the value."""
    top = buckets.agg(F.max(value_col).alias("_m"))
    return (
        buckets.join(F.broadcast(top), F.col(value_col) == F.col("_m"))
        .select(F.col(key_col).alias("key"),
                F.col(value_col).cast("double").alias("value"))
        .orderBy("key")
    )


def min_bucket_agg(
    buckets: DataFrame, value_col: str = "doc_count",
    key_col: str = "key_ts",
) -> DataFrame:
    """ES ``min_bucket`` — see :func:`max_bucket_agg`."""
    bot = buckets.agg(F.min(value_col).alias("_m"))
    return (
        buckets.join(F.broadcast(bot), F.col(value_col) == F.col("_m"))
        .select(F.col(key_col).alias("key"),
                F.col(value_col).cast("double").alias("value"))
        .orderBy("key")
    )


def bucket_sort_agg(
    buckets: DataFrame, sort_col: str, size: int,
    ascending: bool = False, from_: int = 0,
) -> DataFrame:
    """ES ``bucket_sort``: re-order the parent's buckets by a metric
    and truncate (from/size page).  TakeOrdered shape — per-partition
    heaps, no global sort — when from_=0."""
    key = F.asc(sort_col) if ascending else F.desc(sort_col)
    if from_ == 0:
        return buckets.orderBy(key).limit(size)
    return (
        buckets.withColumn(
            "_rn", F.row_number().over(Window.orderBy(key))
        )
        .where((F.col("_rn") > from_) & (F.col("_rn") <= from_ + size))
        .drop("_rn")
    )


def rare_terms_agg(
    df: DataFrame, field: str, max_doc_count: int = 1,
) -> DataFrame:
    """ES ``rare_terms``: the long tail — buckets whose doc_count is at
    most ``max_doc_count``, key order.  Same one-shuffle hash agg as
    ``terms``; ES uses a CuckooFilter to bound memory because its
    per-shard collectors can't spill — Spark's hash aggregate spills,
    so the exact form is the right plan here."""
    return (
        df.where(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") <= max_doc_count)
        .orderBy("key")
    )


def multi_terms_agg(
    df: DataFrame, fields: list[str], size: int = 10,
) -> DataFrame:
    """ES ``multi_terms``: buckets keyed by a field TUPLE, top-``size``
    by doc_count (tie → keys ascending).  One composite-key hash agg —
    never a join of per-field aggs."""
    keys = [F.col(f).alias(f"key_{f}") for f in fields]
    cond = F.lit(True)
    for f in fields:
        cond = cond & F.col(f).isNotNull()
    return (
        df.where(cond)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"),
                 *[F.asc(f"key_{f}") for f in fields])
        .limit(size)
    )


def adjacency_matrix_agg(
    df: DataFrame, named: dict[str, Column],
) -> DataFrame:
    """ES ``adjacency_matrix``: doc_count for every named filter and
    every pairwise intersection (key "a&b", names sorted — ES's key
    format).  Single scan: one ``sum(CASE)`` per filter and per pair;
    with n filters that is n(n+1)/2 counter columns, the same
    collector budget ES allocates.  Empty buckets are dropped (ES
    behavior)."""
    names = sorted(named)
    cols = {}
    for i, a in enumerate(names):
        cols[a] = F.sum(F.when(named[a], 1).otherwise(0))
        for b in names[i + 1:]:
            cols[f"{a}&{b}"] = F.sum(
                F.when(named[a] & named[b], 1).otherwise(0)
            )
    counts = df.agg(*[c.alias(k) for k, c in cols.items()])
    stack = ", ".join(f"'{k}', `{k}`" for k in cols)
    return (
        counts.selectExpr(
            f"stack({len(cols)}, {stack}) as (key, doc_count)"
        )
        .select("key", F.col("doc_count").cast("bigint").alias("doc_count"))
        .where(F.col("doc_count") > 0)
    )


def auto_date_histogram_agg(
    df: DataFrame, ts_field: str, target_buckets: int = 10,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the coarsest calendar interval
    from ES's ladder (minute→hour→day→week→month→quarter→year) whose
    bucket count fits ``target_buckets``.  Two jobs: a min/max probe
    (aggregate-only, no shuffle of data rows) chooses the interval
    deterministically, then the normal date_trunc hash agg runs once —
    never one-agg-per-candidate-interval.  Returns
    ``(key_ts, doc_count, interval)``."""
    bounds = df.select(
        F.min(ts_field).alias("lo"), F.max(ts_field).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        out = date_histogram_agg(df, ts_field, "day")
        return out.withColumn("interval", F.lit("day"))
    span_s = (bounds["hi"] - bounds["lo"]).total_seconds()
    ladder = [
        ("minute", 60), ("hour", 3600), ("day", 86400),
        ("week", 7 * 86400), ("month", 30 * 86400),
        ("quarter", 91 * 86400), ("year", 365 * 86400),
    ]
    interval = ladder[-1][0]
    for name, secs in ladder:
        if span_s / secs + 1 <= target_buckets:
            interval = name
            break
    out = date_histogram_agg(df, ts_field, interval)
    return out.withColumn("interval", F.lit(interval))


def significant_text(
    foreground: DataFrame, postings: DataFrame,
    doc_id_col: str = "doc_id", size: int = 10,
    min_doc_count: int = 2,
    n_docs: int | None = None,
) -> DataFrame:
    """ES ``significant_text``: significant_terms re-derived from the
    text itself rather than from indexed term buckets.  Because this
    engine's postings ARE the analyzed text (one row per distinct
    (doc, term)), the free-text form and the term form coincide — ES
    needs a separate agg only because its significant_terms requires
    fielddata the text field doesn't have.  Kept as an explicit alias
    so the ES surface maps 1:1."""
    return significant_terms(
        foreground, postings, doc_id_col, size, min_doc_count, n_docs
    )


def weighted_avg_agg(
    df: DataFrame, value_col: str, weight_col: str,
) -> DataFrame:
    """ES ``weighted_avg``: Σ(v·w)/Σ(w) over rows where both sides are
    non-null (ES skips a doc missing either).  One agg row, map-side
    combined."""
    ok = F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    return df.where(ok).agg(
        (F.sum(F.col(value_col) * F.col(weight_col))
         / F.sum(weight_col)).alias("weighted_avg")
    )


def top_metrics_agg(
    df: DataFrame, metric_col: str, sort_col: str,
    size: int = 1, ascending: bool = False,
) -> DataFrame:
    """ES ``top_metrics``: the metric value(s) from the top-``size``
    docs by ``sort_col`` (ES tie-breaks are unspecified; here fully
    deterministic via metric as secondary key).  TakeOrdered shape."""
    keys = (
        [F.asc(sort_col), F.asc(metric_col)] if ascending
        else [F.desc(sort_col), F.asc(metric_col)]
    )
    return (
        df.where(F.col(sort_col).isNotNull())
        .orderBy(*keys)
        .limit(size)
        .select(F.col(sort_col).alias("sort"),
                F.col(metric_col).alias("metric"))
    )


def median_absolute_deviation_agg(
    df: DataFrame, field: str, exact: bool = True,
) -> DataFrame:
    """ES ``median_absolute_deviation``: median(|x - median(x)|).
    Exact form = two percentile aggs (the second over the residuals —
    a two-pass plan, each map-side combined); ``exact=False`` uses the
    mergeable Greenwald-Khanna sketch like ES's TDigest variant."""
    pct = (F.percentile if exact
           else (lambda c, p: F.percentile_approx(c, p, 10_000)))
    med = df.where(F.col(field).isNotNull()).agg(
        pct(F.col(field), F.lit(0.5)).alias("m")
    ).collect()[0]["m"]
    return (
        df.where(F.col(field).isNotNull())
        .select(F.abs(F.col(field) - F.lit(med)).alias("r"))
        .agg(pct(F.col("r"), F.lit(0.5)).alias("mad"))
    )


def sampler_agg(
    df: DataFrame, size: int, sort_field: str,
    ascending: bool = False, id_col: str = "doc_id",
) -> DataFrame:
    """ES ``sampler`` bucket agg: restrict sub-aggregations to the
    ``size`` best-scoring docs (``shard_size``).  ES samples per shard
    by ``_score``; here the sample is the deterministic global top-k by
    ``sort_field`` (tie → ``id_col`` asc) so results are reproducible
    across partitionings — a TakeOrdered, no global sort
    materialization.  Returns the sampled rows: run any other agg in
    this module on them (sampler in ES is a container bucket)."""
    s = F.asc(sort_field) if ascending else F.desc(sort_field)
    return df.orderBy(s, F.asc(id_col)).limit(size)


def diversified_sampler_agg(
    df: DataFrame, size: int, sort_field: str, diversify_field: str,
    max_docs_per_value: int = 1,
    ascending: bool = False, id_col: str = "doc_id",
) -> DataFrame:
    """ES ``diversified_sampler``: like ``sampler`` but at most
    ``max_docs_per_value`` docs share one ``diversify_field`` value —
    de-biases the sample from a dominant key (one giant domain/lang
    flooding the bucket).  One shuffle on the diversify key for the
    per-value ``row_number`` window, then the same TakeOrdered as
    ``sampler``.  Skew note: the window partitions by the diversify
    key, so a pathological single-value skew is bounded by that key's
    partition — at 100 TB pre-filter with a per-partition partial
    top-(max_docs_per_value) if one value dominates."""
    s = F.asc(sort_field) if ascending else F.desc(sort_field)
    w = Window.partitionBy(diversify_field).orderBy(s, F.asc(id_col))
    return (
        df.withColumn("_dsr", F.row_number().over(w))
        .where(F.col("_dsr") <= max_docs_per_value)
        .drop("_dsr")
        .orderBy(s, F.asc(id_col))
        .limit(size)
    )


def string_stats_agg(
    df: DataFrame, field: str, with_entropy: bool = True,
) -> DataFrame:
    """ES ``string_stats`` metric agg: count / min_length / max_length /
    avg_length, plus (``show_distribution``-style) the Shannon entropy
    of the field's **character** distribution across all values.

    Plan shape: the length stats are one map-side-combined agg over the
    scan; the entropy pass explodes characters but aggregates them
    map-side too, so the wide stage carries one row per *distinct
    character* per partition (alphabet-sized, not data-sized).  Entropy
    uses the one-pass identity ``H = log2(N) − (Σ nᵢ·log2 nᵢ)/N`` so no
    second total-count job is needed.  Both single-row sides meet in a
    trivial cross join.
    """
    c = F.col(field)
    base = df.where(c.isNotNull()).agg(
        F.count(c).alias("count"),
        F.min(F.length(c)).cast("bigint").alias("min_length"),
        F.max(F.length(c)).cast("bigint").alias("max_length"),
        F.round(F.avg(F.length(c)), 6).alias("avg_length"),
    )
    if not with_entropy:
        return base
    chars = (
        df.where(c.isNotNull())
        .select(F.explode(F.split(c, "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    ent = chars.agg(
        F.round(
            F.log2(F.sum("n"))
            - F.sum(F.col("n") * F.log2("n")) / F.sum("n"),
            6,
        ).alias("entropy")
    )
    return base.crossJoin(ent)


def boxplot_agg(df: DataFrame, field: str, exact: bool = True) -> DataFrame:
    """ES ``boxplot`` metric agg: min / q1 / q2 / q3 / max.

    ``exact=True`` → Spark's exact ``percentile`` (linear
    interpolation, matches DuckDB ``quantile_cont``) for the
    oracle/small-group path; ``exact=False`` → the mergeable
    Greenwald-Khanna sketch (``percentile_approx``), the 100 TB path
    (ES itself computes boxplot from a TDigest).  One agg row either
    way, map-side combined."""
    c = F.col(field).cast("double")
    pct = (F.percentile if exact
           else (lambda x, p: F.percentile_approx(x, p, 10_000)))
    return df.where(c.isNotNull()).agg(
        F.min(c).alias("min"),
        F.round(pct(c, F.lit(0.25)), 6).alias("q1"),
        F.round(pct(c, F.lit(0.5)), 6).alias("q2"),
        F.round(pct(c, F.lit(0.75)), 6).alias("q3"),
        F.max(c).alias("max"),
    )


def matrix_stats_agg(df: DataFrame, fields: list[str]) -> DataFrame:
    """ES ``matrix_stats`` agg over numeric fields: per-field moments
    (mean, population variance, method-of-moments skewness
    ``m3/m2^1.5`` and kurtosis ``m4/m2²``) plus the pairwise
    population covariance / Pearson correlation matrix.

    Like ES, only docs where **every** requested field is present
    enter the matrix.  Plan: ONE hash aggregate computes all power
    sums (Σx, Σx², Σx³, Σx⁴ per field, Σxy per pair) map-side
    combined — a single scan and a single constant-width shuffle row
    regardless of data size; the O(k²) matrix assembly happens on the
    collected 1-row result (k = |fields|, driver work is k² floats).

    Returns one row per ordered pair ``field_a <= field_b``:
    ``(field_a, field_b, count, covariance, correlation, mean,
    variance, skewness, kurtosis)`` — the moment columns are non-null
    on diagonal rows only, mirroring ES's per-field/per-pair split.
    """
    ok = None
    for f in fields:
        cond = F.col(f).isNotNull()
        ok = cond if ok is None else (ok & cond)
    base = df.where(ok)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for f in fields:
        c = F.col(f).cast("double")
        aggs += [
            F.sum(c).alias(f"s1_{f}"),
            F.sum(c * c).alias(f"s2_{f}"),
            F.sum(c * c * c).alias(f"s3_{f}"),
            F.sum(c * c * c * c).alias(f"s4_{f}"),
        ]
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double"))
                .alias(f"sp_{a}_{b}")
            )
    row = base.agg(*aggs).collect()[0].asDict()

    n = row["n"] or 0.0
    out = []

    def moments(f):
        m = row[f"s1_{f}"] / n
        m2 = row[f"s2_{f}"] / n - m * m
        m3 = row[f"s3_{f}"] / n - 3 * m * row[f"s2_{f}"] / n + 2 * m**3
        m4 = (row[f"s4_{f}"] / n - 4 * m * row[f"s3_{f}"] / n
              + 6 * m * m * row[f"s2_{f}"] / n - 3 * m**4)
        return m, m2, m3, m4

    for i, a in enumerate(fields):
        ma, v_a, m3a, m4a = moments(a)
        out.append((a, a, int(n), round(v_a, 6), 1.0, round(ma, 6),
                    round(v_a, 6),
                    round(m3a / v_a**1.5, 6) if v_a > 0 else None,
                    round(m4a / v_a**2, 6) if v_a > 0 else None))
        for b in fields[i + 1:]:
            mb, v_b, _, _ = moments(b)
            cov = row[f"sp_{a}_{b}"] / n - ma * mb
            corr = (cov / (v_a * v_b) ** 0.5
                    if v_a > 0 and v_b > 0 else None)
            out.append((a, b, int(n), round(cov, 6),
                        round(corr, 6) if corr is not None else None,
                        None, None, None, None))
    return df.sparkSession.createDataFrame(
        out,
        "field_a string, field_b string, count bigint, covariance double,"
        " correlation double, mean double, variance double,"
        " skewness double, kurtosis double",
    )


def t_test_agg(
    df: DataFrame, field: str, cond_a: Column, cond_b: Column,
    typ: str = "heteroscedastic",
) -> DataFrame:
    """ES ``t_test`` metric agg between the two populations selected by
    ``cond_a`` / ``cond_b`` (ES's filter form).  Returns the
    t-statistic and degrees of freedom — ``heteroscedastic`` = Welch's
    t with Welch–Satterthwaite df (ES's default), ``homoscedastic`` =
    pooled-variance Student's t.  (ES reports the p-value, which is
    the Student-t CDF of this statistic at this df — a driver-side
    scalar lookup, no distributed work; scipy isn't vendored here so
    the statistic/df pair is the output.)

    One scan, one agg row: each population's n/mean/sample-variance
    comes from conditional aggregates (``avg(CASE WHEN ...)``), all
    map-side combined — never two scans or a self-join.
    """
    if typ not in ("heteroscedastic", "homoscedastic"):
        raise ValueError(f"unknown t_test type {typ!r}")
    c = F.col(field).cast("double")
    xa = F.when(cond_a, c)
    xb = F.when(cond_b, c)
    r = df.agg(
        F.count(xa).cast("double").alias("na"),
        F.avg(xa).alias("ma"),
        F.var_samp(xa).alias("va"),
        F.count(xb).cast("double").alias("nb"),
        F.avg(xb).alias("mb"),
        F.var_samp(xb).alias("vb"),
    )
    na, ma, va = F.col("na"), F.col("ma"), F.col("va")
    nb, mb, vb = F.col("nb"), F.col("mb"), F.col("vb")
    if typ == "heteroscedastic":
        se2 = va / na + vb / nb
        t = (ma - mb) / F.sqrt(se2)
        dof = (se2 * se2) / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
    else:
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        t = (ma - mb) / F.sqrt(sp2 * (1 / na + 1 / nb))
        dof = na + nb - 2
    return r.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(t, 6).alias("t_value"),
        F.round(dof, 6).alias("degrees_of_freedom"),
    )


def scripted_metric_agg(
    df: DataFrame,
    key_col: str,
    map_fn,
    reduce_fn,
    finalize_fn,
    state_fields: list[str],
    out_schema: str,
    n_shards: int = 4,
):
    """ES ``scripted_metric`` agg: user-defined map/combine/reduce per
    bucket.  ``map_fn(pdf) -> dict`` folds a pandas chunk of one
    bucket's rows into a partial state (the ES ``map_script`` +
    ``combine_script`` — per-shard work); ``reduce_fn(states) -> dict``
    merges the per-shard states (``reduce_script``);
    ``finalize_fn(state) -> dict`` shapes the output row.

    The same mergeability contract ES imposes applies: ``map_fn``'s
    state must be combinable by ``reduce_fn`` regardless of how rows
    were sharded.  To keep that contract honest (and the operator
    100 TB-shaped), each bucket's rows are split into ``n_shards``
    chunks that are mapped independently and then reduced — a bucket
    never folds in one monolithic pass, so a non-mergeable script
    fails loudly at any scale, not just on a real cluster.

    Plan: one shuffle on ``key_col`` (``applyInPandas`` group
    exchange); per-bucket state is ``|state_fields|`` scalars.
    """
    import pandas as pd

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        key = pdf[key_col].iloc[0]
        chunks = [
            pdf.iloc[i::n_shards] for i in range(n_shards)
        ]
        states = [map_fn(c) for c in chunks if len(c)]
        final = finalize_fn(reduce_fn(states))
        return pd.DataFrame([{key_col: key, **final}])

    return (
        df.groupBy(key_col)
        .applyInPandas(run, f"{key_col} string, {out_schema}")
    )


def percentile_ranks_agg(
    df: DataFrame, field: str, values: list[float],
) -> DataFrame:
    """ES ``percentile_ranks``: for each given value, the percentage
    of observed values ≤ it.  (ES interpolates on a TDigest; the exact
    definition here is the empirical CDF ×100, which is what the
    sketch estimates.)  One ``sum(CASE)`` scan for ALL requested
    values — never one pass per value.  Returns ``(value, rank)``."""
    c = F.col(field).cast("double")
    base = df.where(c.isNotNull())
    counts = base.agg(
        F.count(c).cast("double").alias("_n"),
        *[F.sum(F.when(c <= F.lit(float(v)), 1).otherwise(0))
          .cast("double").alias(f"_le_{i}")
          for i, v in enumerate(values)],
    )
    stack = ", ".join(
        f"cast({float(v)} as double), `_le_{i}`" for i, v in enumerate(values)
    )
    return counts.selectExpr(
        "_n", f"stack({len(values)}, {stack}) as (value, le)"
    ).select(
        "value",
        F.round(F.lit(100.0) * F.col("le") / F.col("_n"), 6).alias("rank"),
    )


def ip_numeric(ip: Column) -> Column:
    """Dotted-quad IPv4 string → uint32 as bigint (pure JVM split +
    fold — the ordering ES's ip type sorts/ranges by)."""
    parts = F.split(ip, r"\.")
    return (
        parts.getItem(0).cast("bigint") * F.lit(16777216)
        + parts.getItem(1).cast("bigint") * F.lit(65536)
        + parts.getItem(2).cast("bigint") * F.lit(256)
        + parts.getItem(3).cast("bigint")
    )


def ip_range_agg(
    df: DataFrame, ip_field: str,
    ranges: list[tuple[str | None, str | None]],
) -> DataFrame:
    """ES ``ip_range`` agg: half-open ``[from, to)`` buckets in IP
    order.  Addresses compare as their uint32 value (exactly ES's ip
    ordering); one ``sum(CASE)`` scan covers every bucket."""
    import ipaddress

    n = ip_numeric(F.col(ip_field))

    def _lbl(lo, hi):
        return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"

    def _pred(lo, hi) -> Column:
        p = F.col(ip_field).isNotNull()
        if lo is not None:
            p = p & (n >= F.lit(int(ipaddress.IPv4Address(lo))))
        if hi is not None:
            p = p & (n < F.lit(int(ipaddress.IPv4Address(hi))))
        return p

    counts = df.agg(*[
        F.sum(F.when(_pred(lo, hi), 1).otherwise(0)).alias(_lbl(lo, hi))
        for lo, hi in ranges
    ])
    labels = [_lbl(lo, hi) for lo, hi in ranges]
    stack = ", ".join(f"'{lbl}', `{lbl}`" for lbl in labels)
    return counts.selectExpr(
        f"stack({len(labels)}, {stack}) as (key, doc_count)"
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def global_agg(source: DataFrame, agg_fn) -> DataFrame:
    """ES ``global`` bucket agg: sub-aggregations computed over the
    WHOLE index, ignoring the surrounding query's filter — callers
    hand the unfiltered source and any agg from this module.  Exists
    for 1:1 surface parity; it is deliberately just ``agg_fn(source)``
    (the search filter never wraps the source, mirroring how ES's
    global bucket escapes the query scope)."""
    return agg_fn(source)


def bucket_script_agg(
    buckets: DataFrame, script, out_col: str = "value",
) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a per-bucket expression over
    sibling metrics (``script`` is a Column or a fn(DataFrame) →
    Column — the analog of the painless params map).  Pure projection
    over the bucket-sized table: zero additional shuffles."""
    col = script(buckets) if callable(script) else script
    return buckets.withColumn(out_col, col.cast("double"))


def bucket_selector_agg(buckets: DataFrame, predicate) -> DataFrame:
    """ES ``bucket_selector``: drop buckets failing the predicate
    (Column or fn(DataFrame) → Column).  A filter over the bucket
    table — never re-touches the corpus."""
    p = predicate(buckets) if callable(predicate) else predicate
    return buckets.where(p)


def normalize_agg(
    buckets: DataFrame, value_col: str, method: str = "percent_of_sum",
    key_col: str = "key_ts", out_col: str = "normalized",
) -> DataFrame:
    """ES ``normalize`` pipeline agg.  Methods: ``percent_of_sum``,
    ``mean`` (0-1 rescale ES calls 'mean'… of range), ``rescale_0_1``,
    ``z-score``.  One unpartitioned window over the BUCKET table —
    O(buckets) state, the corpus reduction already happened in the
    parent agg."""
    v = F.col(value_col).cast("double")
    w = Window.orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    if method == "percent_of_sum":
        out = v / F.sum(v).over(w)
    elif method == "rescale_0_1":
        out = (v - F.min(v).over(w)) / (F.max(v).over(w) - F.min(v).over(w))
    elif method == "z-score":
        out = (v - F.avg(v).over(w)) / F.stddev_pop(v).over(w)
    elif method == "mean":
        out = v / F.avg(v).over(w)
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    return buckets.withColumn(out_col, F.round(out, 6))


def percentiles_bucket_agg(
    buckets: DataFrame, value_col: str,
    percents: tuple[float, ...] = (25.0, 50.0, 75.0),
) -> DataFrame:
    """ES ``percentiles_bucket``: exact percentiles of a metric ACROSS
    the sibling buckets (ES documents this one as exact, unlike the
    TDigest percentiles agg — the bucket list is small by
    construction).  Returns one row per percent."""
    c = F.col(value_col).cast("double")
    fracs = [p / 100.0 for p in percents]
    vals = buckets.agg(
        F.percentile(c, F.array(*[F.lit(f) for f in fracs])).alias("v")
    )
    rows = []
    for i, p in enumerate(percents):
        rows.append(f"cast({float(p)} as double), element_at(v, {i + 1})")
    return vals.selectExpr(
        f"stack({len(percents)}, {', '.join(rows)}) as (percent, value)"
    ).select("percent", F.round("value", 6).alias("value"))


def rate_agg(
    buckets: DataFrame, unit: str, rate_unit: str = "second",
    value_col: str = "doc_count",
) -> DataFrame:
    """ES ``rate`` agg inside a ``date_histogram``: the bucket's metric
    re-expressed per ``rate_unit`` — value / (bucket length in rate
    units).  Fixed-length units only (ES requires rate_unit ≤ the
    histogram interval); calendar-variable buckets (month+) are
    refused like ES refuses a rate above the histogram unit.

    Pure per-bucket arithmetic — zero extra shuffles over the parent
    histogram."""
    ms = {
        "second": 1_000, "minute": 60_000, "hour": 3_600_000,
        "day": 86_400_000, "week": 604_800_000,
    }
    if unit not in ms or rate_unit not in ms:
        raise ValueError(f"fixed-length units only, got {unit}/{rate_unit}")
    if ms[rate_unit] > ms[unit]:
        raise ValueError("rate_unit must not exceed the histogram unit")
    factor = ms[unit] / ms[rate_unit]
    return buckets.withColumn(
        "rate", (F.col(value_col).cast("double") / F.lit(factor))
    )


def moving_fn_agg(
    buckets: DataFrame, fn: str = "max", window: int = 3,
    shift: int = 0, value_col: str = "doc_count",
    key_col: str = "key_ts",
) -> DataFrame:
    """ES ``moving_fn`` with the stock ``MovingFunctions`` palette
    (min/max/sum/unweightedAvg/stdDev) over a sliding window of
    sibling buckets.  The frame covers the ``window`` buckets ending
    at the current one, moved right by ``shift`` (shift=0 is the
    current-inclusive trailing window — same convention as
    :func:`moving_avg_agg`; ES's exclude-current default is shift=-1).

    O(buckets) window state — the corpus reduction already happened in
    the parent histogram."""
    fns = {
        "min": F.min, "max": F.max, "sum": F.sum,
        "unweightedAvg": F.avg, "stdDev": F.stddev_pop,
    }
    if fn not in fns:
        raise ValueError(f"unknown moving_fn {fn!r}")
    w = Window.orderBy(key_col).rowsBetween(shift - window + 1, shift)
    return buckets.withColumn(
        f"moving_{fn}", fns[fn](F.col(value_col)).over(w).cast("double")
    )


def cumulative_cardinality_agg(
    df: DataFrame, field: str, ts_field: str, unit: str = "day",
) -> DataFrame:
    """ES ``cumulative_cardinality``: distinct ``field`` values seen in
    the histogram up to and including each bucket (net-new user
    counting).

    Scale shape: ONE aggregation on the key (its first bucket), one
    bucket-sized count, and a window over the bucket table — never a
    distinct-per-prefix explosion, never more than one pass over the
    corpus per side."""
    firsts = (
        df.where(F.col(ts_field).isNotNull() & F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.min(F.date_trunc(unit, F.col(ts_field))).alias("key_ts"))
        .groupBy("key_ts")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    w = Window.orderBy("key_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        date_histogram_agg(df, ts_field, unit)
        .join(firsts, "key_ts", "left")
        .withColumn(
            "cumulative_cardinality",
            F.sum(F.coalesce(F.col("_new"), F.lit(0)))
            .over(w).cast("bigint"),
        )
        .drop("_new")
    )


def variable_width_histogram_agg(
    df: DataFrame, field: str, buckets: int = 4, iters: int = 10,
) -> DataFrame:
    """ES ``variable_width_histogram``: 1-D clustering of a numeric
    field into ``buckets`` buckets.  ES's streaming one-pass collector
    is shard-order-dependent; this is the deterministic re-expression —
    Lloyd's k-means seeded with equal-width centroids
    ``min + (i+0.5)·(max−min)/k``, fixed ``iters`` rounds, ties to the
    lower centroid.  Integer-valued fields make every step exact FP
    arithmetic (sums of ints, one divide), so results are
    engine-reproducible bit-for-bit.

    Scale shape: each round is ONE map-side-combined aggregation over
    the cached value column (k rows out); the centroid table lives on
    the driver (k values).  Returns (key, min, max, doc_count) ordered
    by centroid, ES's bucket shape."""
    vals = df.where(F.col(field).isNotNull()).select(
        F.col(field).cast("double").alias("x")
    )
    vals = vals.cache()
    lo, hi = vals.agg(F.min("x"), F.max("x")).first()
    if lo is None:
        return vals.select(
            F.lit(0.0).alias("key"), F.lit(0.0).alias("min"),
            F.lit(0.0).alias("max"), F.lit(0).cast("bigint")
            .alias("doc_count"),
        ).limit(0)
    cents = [lo + (i + 0.5) * (hi - lo) / buckets for i in range(buckets)]

    def assign(c):
        # argmin over the centroid list; ties -> lower index
        best_i, best_d = F.lit(0), F.abs(F.col("x") - F.lit(c[0]))
        for i in range(1, len(c)):
            d = F.abs(F.col("x") - F.lit(c[i]))
            best_i = F.when(d < best_d, F.lit(i)).otherwise(best_i)
            best_d = F.when(d < best_d, d).otherwise(best_d)
        return best_i

    for _ in range(iters):
        upd = dict(
            vals.groupBy(assign(cents).alias("i"))
            .agg(F.avg("x").alias("c")).collect()
        )
        nxt = [upd.get(i, cents[i]) for i in range(buckets)]
        if nxt == cents:
            break
        cents = nxt
    out = (
        vals.groupBy(assign(cents).alias("i"))
        .agg(
            F.min("x").alias("min"), F.max("x").alias("max"),
            F.count(F.lit(1)).alias("doc_count"),
        )
    )
    key = F.lit(None).cast("double")
    for i, c in enumerate(cents):
        key = F.when(F.col("i") == i, F.lit(float(c))).otherwise(key)
    return (
        out.select(
            key.alias("key"), "min", "max",
            F.col("doc_count").cast("bigint").alias("doc_count"),
        ).orderBy("key")
    )


def categorize_text_agg(
    df: DataFrame, text_col: str | Column, size: int = 10,
) -> DataFrame:
    """ES ``categorize_text``: semi-structured (log) messages grouped
    by token template.  Deterministic spec: lowercase, split on
    non-alphanumeric runs, any digit-bearing token becomes the
    ``%{NUM}`` placeholder, the template is the space-joined result.
    Returns the top ``size`` templates (doc_count DESC, key ASC).

    One map-side-combined hash aggregation; the template expression is
    pure codegen (split + transform + array_join)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    tmpl = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(t.rlike("[0-9]"), F.lit("%{NUM}")).otherwise(t),
        ),
        " ",
    )
    return (
        df.groupBy(tmpl.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def frequent_item_sets_agg(
    df: DataFrame, items_col: str | Column,
    minimum_support: float = 0.1, size: int = 10,
) -> DataFrame:
    """ES ``frequent_item_sets`` (sizes 1 and 2): itemsets appearing in
    at least ``minimum_support`` of the rows.  Apriori over pairs: the
    per-row item array is deduplicated, singles are one hash agg, pairs
    are a self-equi-join on the row id bounded by true co-occurrence
    (never |rows|² — a pair only materializes where both items share a
    row).  Returns (items array ASC-sorted, support, doc_count) ordered
    by doc_count DESC / items ASC."""
    c = F.col(items_col) if isinstance(items_col, str) else items_col
    total = df.count()
    # row id MUST be assigned before the explode (inside the same
    # select a generator re-evaluates it per OUTPUT element) and the
    # frame cached so both self-join sides see the same ids
    base = df.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.array_distinct(c).alias("_items"),
    ).cache()
    ex = base.select(
        "_rid", F.explode("_items").alias("item")
    ).where(F.col("item").isNotNull())
    floor_n = minimum_support * total
    singles = (
        ex.groupBy("item").agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") >= floor_n)
    )
    # apriori prune: only frequent singles can form a frequent pair
    exf = ex.join(F.broadcast(singles.select("item")), "item")
    l, r = exf.alias("l"), exf.alias("r")
    pairs = (
        l.join(r, (F.col("l._rid") == F.col("r._rid"))
               & (F.col("l.item") < F.col("r.item")))
        .groupBy(F.col("l.item").alias("a"), F.col("r.item").alias("b"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") >= floor_n)
        .select(F.array("a", "b").alias("items"), "doc_count")
    )
    out = singles.select(
        F.array("item").alias("items"), "doc_count"
    ).unionByName(pairs)
    return (
        out.select(
            "items",
            F.round(F.col("doc_count") / F.lit(float(total)), 6)
            .alias("support"),
            F.col("doc_count").cast("bigint").alias("doc_count"),
        )
        .orderBy(F.desc("doc_count"), F.asc("items"))
        .limit(size)
    )


def nested_terms_agg(
    df: DataFrame, nested_col: str, key_field: str, size: int = 10,
) -> DataFrame:
    """ES ``nested`` agg + ``terms`` sub-agg: switch context to the
    array-of-struct elements and bucket THEM (doc_count = matching
    nested docs, not parents).  One explode + one hash agg — parents
    without elements contribute nothing and are never widened."""
    return (
        df.select(F.explode(nested_col).alias("_e"))
        .groupBy(F.col(f"_e.{key_field}").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def reverse_nested_agg(
    df: DataFrame, nested_col: str, key_field: str, id_col: str,
    size: int = 10,
) -> DataFrame:
    """ES ``reverse_nested`` under a nested terms bucket: per nested
    key, the number of PARENT docs owning at least one such element.
    The explode is collapsed to distinct (parent, key) pairs before
    the count, so the wide stage carries parent-cardinality rows."""
    return (
        df.select(F.col(id_col), F.explode(nested_col).alias("_e"))
        .select(id_col, F.col(f"_e.{key_field}").alias("key"))
        .distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("parent_count"))
        .orderBy(F.desc("parent_count"), F.asc("key"))
        .limit(size)
    )


def random_sampler_agg(
    df: DataFrame, probability: float, seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``random_sampler`` bucket agg: include each doc independently
    with ``probability`` and run sub-aggregations on the sample, whose
    counts the caller scales by ``1/probability`` (ES does this
    automatically; :func:`random_sampler_counts` is that composition).

    The draw is the engine's deterministic md5-uniform
    (``operators/sampling.py``), so the sample is reproducible across
    partitionings/retries AND replayable in ANSI SQL — unlike ES's
    per-shard RNG.  Pure scan-side filter: at 100 TB this is the
    cheapest agg container there is (no shuffle, pushdown-friendly)."""
    from ..operators.sampling import hash_uniform

    return df.where(hash_uniform(id_col, seed) < F.lit(probability))


def random_sampler_counts(
    df: DataFrame, probability: float, key_field: str, seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """``random_sampler`` + terms doc_count, scaled to full-population
    estimates like ES reports them: ``doc_count = sampled / p``
    (rounded to bigint).  One sampled hash agg."""
    return (
        random_sampler_agg(df, probability, seed, id_col)
        .groupBy(F.col(key_field).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("sampled_count"),
            F.round(F.count(F.lit(1)) / F.lit(probability))
            .cast("bigint").alias("doc_count"),
        )
    )


def ip_prefix_agg(
    df: DataFrame, ip_field: str, prefix_length: int,
) -> DataFrame:
    """ES ``ip_prefix`` agg: bucket IPv4 addresses by their
    ``/prefix_length`` network.  The address folds to uint32
    (:func:`ip_numeric`), masks with shift arithmetic, and renders back
    to the dotted-quad network key — one hash aggregation, all JVM
    integer math."""
    if not 0 < prefix_length <= 32:
        raise ValueError("prefix_length must be in (0, 32]")
    shift = 32 - prefix_length
    n = ip_numeric(F.col(ip_field))
    net = F.shiftleft(F.shiftright(n, shift), shift)
    key = F.concat_ws(
        ".",
        (F.shiftright(net, 24) % 256).cast("string"),
        (F.shiftright(net, 16) % 256).cast("string"),
        (F.shiftright(net, 8) % 256).cast("string"),
        (net % 256).cast("string"),
    )
    return (
        df.where(F.col(ip_field).isNotNull())
        .groupBy(
            F.concat(key, F.lit(f"/{prefix_length}")).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def change_point_agg(
    buckets: DataFrame, key_col: str, value_col: str,
) -> DataFrame:
    """ES ``change_point`` sibling agg (the core mean-shift detector):
    over a key-ordered bucket series, find the split that maximizes the
    absolute Welch t-statistic between the left and right segments —
    the returned ``key`` is the first bucket of the right (post-change)
    segment, ES's ``change_point.bucket.key``.

    Deterministic and exact: every split with at least 2 buckets on
    each side is scored from prefix sums (one pass of window functions
    over the BUCKET table — the corpus reduction already happened in
    the parent agg, so this is O(buckets) however big the data was);
    ties break to the earliest key.  ES wraps several detectors with
    ml-model p-values; this engine pins the documented, replayable
    statistic instead (the SQL oracle recomputes it bit-for-bit).

    Returns one row: (key, t_stat_r6, left_mean_r6, right_mean_r6).
    """
    w_ord = Window.orderBy("key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    v = F.col(value_col).cast("double")
    b = (
        buckets.select(
            F.col(key_col).alias("key"),
            v.alias("v"),
        )
        .withColumn("rn", F.row_number().over(Window.orderBy("key")))
        .withColumn("cs", F.sum("v").over(w_ord))
        .withColumn("cs2", F.sum(F.col("v") * F.col("v")).over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("s", F.sum("v").over(w_all))
        .withColumn("s2", F.sum(F.col("v") * F.col("v")).over(w_all))
    )
    n1 = F.col("rn").cast("double")
    n2 = (F.col("n") - F.col("rn")).cast("double")
    m1 = F.col("cs") / n1
    m2 = (F.col("s") - F.col("cs")) / n2
    var1 = (F.col("cs2") - n1 * m1 * m1) / (n1 - 1)
    var2 = (F.col("s2") - F.col("cs2") - n2 * m2 * m2) / (n2 - 1)
    t = (m1 - m2) / F.sqrt(var1 / n1 + var2 / n2)
    scored = (
        # change point = FIRST bucket of the right segment, so take the
        # next key BEFORE filtering splits (the row after the last
        # valid split exists but is itself no valid split)
        b.withColumn(
            "cp_key", F.lead("key", 1).over(Window.orderBy("key"))
        )
        .where((F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 2))
        .select(
            F.col("cp_key").alias("key"),
            t.alias("t"),
            m1.alias("m1"),
            m2.alias("m2"),
        )
    )
    return (
        # rank on the ROUNDED statistic: prefix-sum float noise must not
        # decide ties between genuinely equal splits (alternating series
        # produce exact |t| ties whose unrounded windows differ at 1e-16)
        scored.orderBy(F.round(F.abs(F.col("t")), 9).desc(), F.asc("key"))
        .limit(1)
        .select(
            "key",
            F.round("t", 6).alias("t_stat_r6"),
            F.round("m1", 6).alias("left_mean_r6"),
            F.round("m2", 6).alias("right_mean_r6"),
        )
    )


def bucket_correlation_agg(
    buckets: DataFrame, key_col: str, count_col: str,
    indicator: dict[object, float],
) -> DataFrame:
    """ES ``bucket_correlation`` pipeline agg (``count_correlation``
    function): Pearson correlation between the bucket doc_counts and a
    caller-supplied indicator vector keyed by bucket.  The indicator is
    a tiny driver-side map — it broadcast-joins onto the bucket table
    (buckets missing from the map contribute 0, like ES's dense vector
    form).  One ``corr`` aggregate over O(buckets) rows."""
    spark = buckets.sparkSession
    ind = spark.createDataFrame(
        [(k, float(x)) for k, x in indicator.items()],
        f"{key_col} {buckets.schema[key_col].dataType.simpleString()}, _ind double",
    )
    joined = (
        buckets.join(F.broadcast(ind), key_col, "left")
        .select(
            F.col(count_col).cast("double").alias("_c"),
            F.coalesce("_ind", F.lit(0.0)).alias("_i"),
        )
    )
    return joined.agg(
        F.round(F.corr("_c", "_i"), 6).alias("correlation_r6")
    )


def bucket_count_ks_test_agg(
    buckets: DataFrame, key_col: str, count_col: str,
    fractions: list[float] | None = None,
) -> DataFrame:
    """ES ``bucket_count_ks_test`` sibling agg: the Kolmogorov-Smirnov
    statistic between the bucket doc_count distribution and an expected
    one — ``fractions`` (per ordered bucket, like ES's parameter) or
    uniform when omitted.  D = max_k |ECDF_actual(k) − ECDF_expected(k)|
    via one cumulative window over the bucket table; the p-value ladder
    ES adds on top is ml-plugin territory — the statistic is the
    replayable contract here.  Returns one row (d_statistic_r6)."""
    w_ord = Window.orderBy("key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = buckets.select(
        F.col(key_col).alias("key"),
        F.col(count_col).cast("double").alias("c"),
    ).withColumn("rn", F.row_number().over(Window.orderBy("key")))
    if fractions is not None:
        spark = buckets.sparkSession
        fr = spark.createDataFrame(
            [(i + 1, float(f)) for i, f in enumerate(fractions)],
            "rn int, f double",
        )
        b = b.join(F.broadcast(fr), "rn", "left").withColumn(
            "f", F.coalesce("f", F.lit(0.0))
        )
    else:
        b = b.withColumn("f", F.lit(1.0))
    b = (
        b.withColumn("ca", F.sum("c").over(w_ord) / F.sum("c").over(w_all))
        .withColumn("ce", F.sum("f").over(w_ord) / F.sum("f").over(w_all))
    )
    return b.agg(
        F.round(F.max(F.abs(F.col("ca") - F.col("ce"))), 6)
        .alias("d_statistic_r6")
    )


def moving_percentiles_agg(
    buckets: DataFrame, key_col: str, value_col: str,
    window: int, percentile: float = 0.5,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg: a sliding-window
    percentile over the parent histogram's metric (window = this bucket
    and the ``window-1`` before it; buckets before the window fills
    report the percentile of what exists, like ES).

    Exact linear-interpolation percentile (R-7 / ``quantile_cont``
    semantics — the oracle replays it with ``list_sort`` + the same
    interpolation): the window's values collect into an array (bounded
    by ``window``, an O(buckets·window) frame over the already-reduced
    bucket table), sort JVM-side, interpolate with ``element_at``.
    ES uses a merged TDigest per window; the exact form is the stronger
    contract and identical for small windows."""
    if not 0.0 <= percentile <= 1.0:
        raise ValueError("percentile must be in [0, 1]")
    w = Window.orderBy("key").rowsBetween(-(window - 1), 0)
    b = buckets.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("v"),
    )
    arr = F.sort_array(F.collect_list("v").over(w))
    n = F.size(arr)
    idx = (n - 1).cast("double") * F.lit(float(percentile))
    lo = F.floor(idx).cast("int")
    frac = idx - lo.cast("double")
    # try_element_at: lo+2 overruns the array when frac == 0 (ANSI mode
    # would throw); the coalesce makes that term a no-op
    val = (
        F.try_element_at(arr, lo + 1) * (F.lit(1.0) - frac)
        + F.coalesce(
            F.try_element_at(arr, lo + 2), F.try_element_at(arr, lo + 1)
        ) * frac
    )
    return b.select(
        "key", F.round(val, 6).alias(f"p{int(percentile * 100)}_r6")
    )


def geo_line_agg(
    df: DataFrame, key_col: str, sort_col: str,
    lat: Column, lon: Column, size: int = 10000,
) -> DataFrame:
    """ES ``geo_line`` agg in relational form: per bucket, the points
    ordered by ``sort_col`` (ascending, the track order) capped at
    ``size`` — one row per line vertex ``(key, seq, lon_r6, lat_r6)``
    instead of a GeoJSON blob (same information, hashable/joinable).

    One hash aggregation collecting ``(sort, lon, lat)`` structs with
    map-side combine, JVM ``sort_array`` + ``slice`` for the cap, then
    posexplode — the shuffle carries at most ``size`` points per key
    ... a skewed track is bounded by the cap exactly as in ES."""
    pts = F.sort_array(
        F.collect_list(F.struct(
            F.col(sort_col).alias("s"), lon.alias("x"), lat.alias("y"),
        ))
    )
    capped = F.slice(pts, 1, size)
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(capped.alias("_pts"))
        .select("key", F.posexplode("_pts").alias("seq", "_p"))
        .select(
            "key",
            (F.col("seq") + 1).cast("bigint").alias("seq"),
            F.round(F.col("_p.x"), 6).alias("lon_r6"),
            F.round(F.col("_p.y"), 6).alias("lat_r6"),
        )
    )
