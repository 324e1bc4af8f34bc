"""URL/domain operators for web-corpus curation.

Every large-scale training-data pipeline filters by source domain
(blocklists, per-domain quotas, domain-level quality priors) before any
content-level work — it is the cheapest high-precision filter there is
and it runs on metadata, not text.  These ops keep the corpus on the
scan side throughout:

- ``extract_domain``: pure JVM regex projection (no UDF, no shuffle).
- ``domain_stats``: one partial-aggregated groupBy on the domain key —
  shuffle carries one row per (partition, domain).
- ``filter_blocked_domains``: broadcast anti-join against the (always
  tiny relative to the corpus) blocklist — the corpus never shuffles.
- ``domain_quota``: per-domain cap via deterministic hash-rank — keeps
  at most ``n`` docs per domain WITHOUT a global sort; rank is a window
  over the domain key only, and domains under the cap never spill.

The regexes are RE2-safe (no backtracking constructs) so the DuckDB
correctness oracle evaluates the identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "extract_domain",
    "registered_domain",
    "domain_stats",
    "filter_blocked_domains",
    "domain_quota",
    "DOMAIN_RX",
]

#: host part of a URL: scheme://[user@]HOST[:port]/...  (RE2-safe)
DOMAIN_RX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def extract_domain(url_col: Column | str) -> Column:
    """Lowercased host extracted from a URL column ('' if no match)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(F.coalesce(c, F.lit("")), DOMAIN_RX, 1))


def registered_domain(url_col: Column | str) -> Column:
    """Last-two-labels approximation of the registered domain
    (``a.b.example.com`` → ``example.com``).  A faithful public-suffix
    match needs the PSL table — at scale, broadcast-join the PSL and
    take the longest suffix match; the two-label fallback is the
    standard approximation when the PSL is not loaded."""
    host = extract_domain(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def domain_stats(
    df: DataFrame, url_col: str, size_col: str | None = None,
) -> DataFrame:
    """(domain, doc_count[, total_chars]) per extracted domain — the
    per-domain census used for quota decisions and quality priors."""
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).cast("bigint")
                    .alias("total_chars"))
    return (
        df.groupBy(extract_domain(url_col).alias("domain"))
        .agg(*aggs)
    )


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocked: DataFrame | list[str],
) -> DataFrame:
    """Drop rows whose extracted domain is on the blocklist.

    Accepts the blocklist as a DataFrame with a ``domain`` column
    (broadcast anti-join — blocklists are O(100k) rows vs a 100 TB
    corpus) or a small Python list (compiled to one ``isin`` filter on
    the scan, no join at all)."""
    dom = extract_domain(url_col)
    if isinstance(blocked, list):
        return df.where(~dom.isin([b.lower() for b in blocked]))
    b = blocked.select(F.lower(F.col("domain")).alias("domain")).distinct()
    return (
        df.withColumn("_dom", dom)
        .join(F.broadcast(b), F.col("_dom") == F.col("domain"), "left_anti")
        .drop("_dom")
    )


def domain_quota(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Keep at most ``max_per_domain`` docs per domain, selected by a
    deterministic per-row hash rank (uniform, reproducible — not
    first-seen, which would bias toward crawl order).

    One window over the domain key; with map-side partial rank this is
    a single shuffle on ``domain``.  Skewed mega-domains are exactly the
    rows the cap discards, so the skew is self-limiting: the window
    only needs the top ``max_per_domain`` hash ranks per domain and
    Spark's rank-limit pushdown keeps per-key state bounded."""
    from .sampling import hash_uniform

    w = Window.partitionBy("_dom").orderBy(F.asc("_rv"), F.asc(id_col))
    return (
        df.withColumn("_dom", extract_domain(url_col))
        .withColumn("_rv", hash_uniform(F.col(id_col), salt=salt))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_domain)
        .drop("_dom", "_rv", "_rk")
    )
