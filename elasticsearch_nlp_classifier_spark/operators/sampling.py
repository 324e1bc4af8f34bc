"""Deterministic sampling & dataset-split operators for training
pipelines.

At 100 TB you cannot split train/dev/test with ``df.randomSplit`` (RNG
is seeded per partition → the assignment changes whenever the file
layout, partition count, or scan order changes).  Every operator here
derives its randomness from a cryptographic hash of the ROW ID + a
caller salt, so assignment is:

- deterministic (same row → same split, forever, on any cluster),
- reshard-stable (independent of partitioning / file order),
- incremental-friendly (new rows hash into splits at the same rates
  without reshuffling old ones),
- oracle-checkable (the identical md5 arithmetic runs in ANSI SQL).

All the *scale-path* operators are pure Catalyst expressions — zero
shuffle, zero UDF.  The exact-count variants (which need a per-stratum
rank) are flagged as such in their docstrings.

Hash → uniform: ``u = conv(substr(md5(id || salt), 1, 15), 16, 10) /
2^60`` — 60 bits of md5, exact in a signed 64-bit integer in both
Spark and DuckDB (same trick as ``textstats.rolling_fingerprint``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_DENOM = float(1 << 60)


def hash_uniform(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform-[0,1) draw from a row id (pure expression)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h / F.lit(_HASH_DENOM)


def hash_uniform_sql(id_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_uniform` (for correctness oracles)."""
    return (
        f"(('0x' || substr(md5(cast({id_expr} AS VARCHAR) || '{salt}'), "
        f"1, 15))::BIGINT / {int(_HASH_DENOM)}.0)"
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash thresholding.

    ``weights`` maps split name → relative weight (normalized).  Rows
    land in splits in dict order by cumulative threshold.  Zero
    shuffle; at any scale this is a projection on the scan.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    u = hash_uniform(id_col, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_split_sql(
    weights: dict[str, float], id_expr: str = "doc_id", salt: str = "split"
) -> str:
    """DuckDB CASE expression twin of :func:`hash_split`."""
    total = float(sum(weights.values()))
    u = hash_uniform_sql(id_expr, salt)
    parts, cum = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        parts.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    ``fractions`` is either one fraction for every stratum or a map
    stratum-value → fraction (missing strata keep 0).  Shuffle-free:
    the per-stratum threshold compiles to a CASE over the stratum
    column; sampling stays exact-in-expectation and reshard-stable.
    This is the 100 TB path — use :func:`stratified_exact_n` only when
    hard per-stratum counts are required.
    """
    u = hash_uniform(id_col, salt)
    if isinstance(fractions, dict):
        thr = None
        for k, frac in fractions.items():
            cond = F.col(strata_col) == F.lit(k)
            thr = (
                F.when(cond, F.lit(frac))
                if thr is None
                else thr.when(cond, F.lit(frac))
            )
        thr = thr.otherwise(F.lit(0.0)) if thr is not None else F.lit(0.0)
    else:
        thr = F.lit(float(fractions))
    return df.filter(u < thr)


def stratified_exact_n(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Exactly ``n`` rows per stratum, chosen by hash order.

    Needs a per-stratum rank → ONE shuffle keyed by the stratum column.
    Caveat for very large strata: the key can be hot (all rows of one
    language flow to one reducer for ranking); AQE skew-split does not
    apply to windows.  Prefer :func:`stratified_sample` at scale, or
    pre-aggregate candidate pools with it before exact ranking.
    """
    from pyspark.sql import Window

    u = hash_uniform(id_col, salt).alias("__u")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("__u").asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__u", u)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__u", "__rk")
    )


def uniform_top_n(
    df: DataFrame, n: int, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """A deterministic global uniform sample of exactly ``n`` rows
    (without replacement): global top-n by hash value.

    Executes as TakeOrderedAndProject — each partition keeps its local
    top-n, the driver merges ``n × partitions`` candidates — no global
    sort, no full shuffle.  Safe for n up to ~millions.
    """
    return df.orderBy(
        hash_uniform(id_col, salt).asc(), F.col(id_col).asc()
    ).limit(n)


def resample_to_mix(
    df: DataFrame,
    group_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample to a TARGET DOMAIN MIX (the data-mixture step of LLM
    pipelines): keep per-group acceptance rates such that the output's
    group distribution matches ``target_weights``, maximizing retained
    rows without upsampling.

    Math: with group sizes n_g and normalized targets p_g, the largest
    achievable output is N = min_g n_g / p_g (the scarcest group is
    kept whole); each group's acceptance rate is r_g = p_g·N / n_g.
    Rows pass if ``hash_uniform(id) < r_g`` — deterministic and
    reshard-stable like every sampler here.  Groups absent from
    ``target_weights`` are dropped.

    Scale shape: one map-side-combined counts aggregation (|groups|
    rows, collected), then a broadcast join of the rate table and a
    hash-threshold filter on the scan — the corpus itself never
    shuffles.  Expected (not exact) counts per group; the exact-count
    variant is ``stratified_exact_n``.
    """
    total = float(sum(target_weights.values()))
    if total <= 0:
        raise ValueError("target_weights must sum to a positive number")
    p = {g: w / total for g, w in target_weights.items()}
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    present = {g: p[g] for g in p if counts.get(g) and p[g] > 0}
    if not present:
        return df.limit(0)
    n_out = min(counts[g] / pg for g, pg in present.items())
    rates = [(g, min(1.0, pg * n_out / counts[g]))
             for g, pg in present.items()]
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        rates, f"{group_col} string, _rate double"
    )
    return (
        df.join(F.broadcast(rate_df), group_col)
        .where(hash_uniform(id_col, salt) < F.col("_rate"))
        .drop("_rate")
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-controlled train/val/test split: near-duplicate CLUSTERS
    never straddle splits.

    A plain hash split puts two near-identical documents on opposite
    sides of the train/eval boundary — the classic contamination bug
    that inflates eval scores on web-scale corpora (the reason
    The Pile / RefinedWeb dedup *before* splitting).  Here every doc's
    split is decided by the hash of its duplicate-cluster
    REPRESENTATIVE (the component's min id from
    ``dedup.dup_clusters`` — any near-dup pair source: MinHash,
    SimHash, embedding cosine); docs in no pair hash on their own id,
    which is the same thing (they are singleton clusters), so the
    assignment degrades exactly to :func:`hash_split` when ``pairs``
    is empty.

    Scale shape: the cluster closure is the existing O(log² n)
    large-star/small-star job; its output is member-sized (≪ corpus),
    so attaching representatives is one broadcast-able left join, and
    the split itself stays a scan-side projection."""
    from .dedup import dup_clusters

    clusters = dup_clusters(pairs)  # (id, cluster_id = component min)
    rep = clusters.select(
        F.col("id").alias(id_col), F.col("cluster_id").alias("_rep")
    )
    tagged = df.join(F.broadcast(rep), id_col, "left").withColumn(
        "_rep", F.coalesce("_rep", F.col(id_col))
    )
    out = hash_split(tagged, weights, id_col="_rep", salt=salt,
                     out_col=out_col)
    return out.drop("_rep")
