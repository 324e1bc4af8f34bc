"""Deduplication operators for large-scale training-data pipelines.

All shapes chosen for 100 TB behavior:

- exact:        one hash-shuffle on the content digest
- minhash LSH:  per-row signatures (vectorized pandas UDF) -> band
                explode -> bucket shuffle -> candidate pairs -> exact
                verify; never an all-pairs comparison
- simhash:      64-bit signature + 16-bit band blocking for hamming<=r
- n-gram jaccard: shingle-explode + equi-join on shingle, pair counts ->
                jaccard; bounded by shingle-bucket sizes, not n^2 (and
                SQL-expressible — the DuckDB oracle replicates it 1:1)
- embedding cosine: see similarity.py (brute + LSH variants)

'Remove' semantics here are keep-first: a row is a duplicate if it pairs
with any lower-id row.  Pairs are the stable per-job primitive; the
transitive closure is the separate iterative job ``dup_clusters``
(alternating large-star/small-star connected components), and
``dedup_by_clusters`` applies the keep-one-per-component policy.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Drop rows whose content sha256 was already seen (keep min id)."""
    h = F.sha2(F.col(content_col).cast("string"), 256)
    keep = (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def dedup_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Paragraph-level exact dedup across the whole corpus: split each
    doc on ``sep``, keep only the globally-first occurrence of every
    distinct paragraph (first = min ``(id, paragraph position)``), and
    reassemble the surviving paragraphs in original order.

    The fine-grained cousin of doc-level exact dedup — boilerplate
    (headers, license blocks, navigation chrome) repeats across
    documents that are not duplicates of each other, and this strips it
    corpus-wide in two hash shuffles:

    1. ``posexplode(split(text))`` → ``(id, pos, para)`` — narrow.
    2. keep = ``min_by((id, pos))`` per ``xxhash64(para)`` group —
       one partial-aggregated shuffle on the 64-bit hash, carrying one
       row per distinct paragraph.
    3. semi-join survivors back (broadcast-or-shuffle by AQE) and
       ``array_join(sort by pos)`` per doc — second shuffle on ``id``.

    Returns ``(id, text)`` with deduped text; docs whose every
    paragraph was seen earlier come back with empty text (the caller's
    length filter drops them — same contract as quality filtering).
    Empty/whitespace paragraphs are kept verbatim (they're structure,
    not content)."""
    import re as _re

    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            # split() takes a regex; sep is a literal separator
            F.split(F.coalesce(F.col(text_col), F.lit("")),
                    _re.escape(sep))
        ).alias("pos", "para"),
    )
    keyed = paras.withColumn("h", F.xxhash64("para"))
    # first global occurrence: min (id, pos) pair per paragraph hash,
    # packed into one struct min (single map-side-combined aggregate)
    keep = (
        keyed.groupBy("h")
        .agg(F.min(F.struct("id", "pos")).alias("first"))
        .select("h", F.col("first.id").alias("id"),
                F.col("first.pos").alias("pos"))
    )
    kept = keyed.join(keep, ["h", "id", "pos"], "left_semi")
    rebuilt = (
        kept.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "para")))
             .alias("ps"))
        .select(
            "id",
            F.array_join(F.transform("ps", lambda s: s["para"]), sep)
            .alias(text_col),
        )
    )
    # docs that lost every paragraph still appear (empty text)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select("id", F.coalesce(F.col(text_col), F.lit(""))
                .alias(text_col))
    )


def exact_dup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(sha256, n_dups, keep_id) for groups with >1 member."""
    h = F.sha2(F.col(content_col).cast("string"), 256)
    return (
        df.withColumn("sha", h)
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )





def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, hs array<bigint>) — per-doc array of distinct 64-bit word-k-
    shingle hashes, computed ENTIRELY by JVM built-ins (split → slice →
    concat_ws → xxhash64 → array_distinct).  No Python string work: the
    only thing that crosses the Arrow boundary downstream is int64
    arrays.  Same shingling contract as ``shingle_table`` (tested)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(shingles, lambda s: F.xxhash64(s))
        ).alias("hs"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<bigint>) — shingle+hash in JVM codegen,
    permutation min-reduce vectorized per Arrow batch.

    The pandas UDF sees only int64 hash arrays.  Per batch: one
    factorize over the flattened hash stream, then the permutation
    table is applied in CHUNKS of 16 hash functions with a
    ``minimum.reduceat`` per chunk — peak transient is
    ``n_shingles × 16 × 8B`` instead of the old ``n_unique × 64 × 8B``
    matrix (hundreds of MB per batch, which churned freshly-mapped
    pages — the round-1 bottleneck) and there is no per-row Python
    loop."""
    a, b = _minhash_params(n_hashes, seed)
    mersenne = np.uint64(_MERSENNE)

    @pandas_udf(ArrayType(LongType()))
    def sig(hs: pd.Series) -> pd.Series:
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64,
                           count=len(hs))
        total = int(lens.sum())
        out = np.zeros((len(hs), n_hashes), dtype=np.int64)
        if total:
            flat = np.concatenate([np.asarray(x, dtype=np.int64)
                                   for x in hs if len(x)])
            uniq, codes = np.unique(flat.astype(np.uint64),
                                    return_inverse=True)
            nz = lens > 0
            starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            sig_nz = np.empty((int(nz.sum()), n_hashes), dtype=np.int64)
            for c0 in range(0, n_hashes, 16):
                c1 = min(c0 + 16, n_hashes)
                m = (uniq[:, None] * a[None, c0:c1] + b[None, c0:c1]) \
                    % mersenne
                sig_nz[:, c0:c1] = np.minimum.reduceat(
                    m[codes], starts, axis=0
                ).astype(np.int64)
            out[nz] = sig_nz
        return pd.Series(list(out))

    return shingle_hashes(df, text_col, id_col, shingle_k).select(
        "id", sig(F.col("hs")).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with the exact
    shingle jaccard: (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    # cache: the self-join reads ``banded`` twice — uncached, the whole
    # signature UDF would run once per join side
    # xxhash64 hashes array<bigint> natively (catalyst HashExpression
    # recurses into array elements) — no per-band string building
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(
                    F.slice("signature", i * rows_per_band + 1,
                            rows_per_band)
                )
                for i in range(bands)
            ])
        ).alias("band", "bucket"),
    ).cache()
    cands = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    jac = ngram_jaccard_for_pairs(df, cands, text_col, id_col, shingle_k)
    return jac.where(F.col("jaccard") >= threshold)


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct word-k-shingles — built-ins only, so the
    DuckDB oracle can reproduce it exactly."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with word-k-gram jaccard >= threshold, via shingle
    equi-join (bounded by shingle co-occurrence, not n^2)."""
    sh = shingle_table(df, text_col, id_col, k).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("l")
        .join(sh.alias("r"),
              (F.col("l.shingle") == F.col("r.shingle"))
              & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_for_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Exact jaccard for given candidate (id_a, id_b) pairs.

    The candidate set is LSH-small; shingles are computed ONCE for just
    the candidate docs (broadcast semi-join on the id set), cached, and
    reused for both join sides and the size table — never three full
    corpus re-tokenizations."""
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        shingle_table(df, text_col, id_col, k)
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .cache()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed("id", "id_a")
    b = sh.withColumnRenamed("id", "id_b")
    inter = (
        pairs.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left").na.fill({"inter": 0})
        .join(sizes.withColumnRenamed("id", "id_a")
              .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )


def repeated_kgram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """Exact repeated-substring detection at token granularity (the
    span-level cousin of doc/paragraph dedup — 'Deduplicating Training
    Data Makes Language Models Better', Lee et al. 2022, approximated
    with fixed-k token grams instead of a suffix array): every token
    k-gram that occurs more than once corpus-wide is a duplicated span;
    the globally-first occurrence (min ``(id, pos)``) is kept, every
    other occurrence is reported for removal.  Overlapping/adjacent
    spans within a doc are merged, so the output is a minimal set of
    disjoint ``(doc_id, span_start, span_end)`` token intervals
    (half-open).

    Scale shape (100 TB): one hash shuffle on the 64-bit k-gram hash
    (the same cost class as minhash banding — shuffle rows = total
    token count, partial-aggregated), one broadcast-or-shuffle join
    back, and one window on ``doc_id`` for interval merge (per-doc span
    counts are small; the window state is bounded by spans-per-doc, not
    corpus size).  A true suffix array finds variable-length repeats;
    fixed-k catches every repeat of length >= k — the standard
    large-scale approximation."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = df.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "h")
    )
    first = occ.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("first")
    )
    dups = (
        occ.join(first, "h")
        .where(
            ~((F.col("id") == F.col("first.id"))
              & (F.col("pos") == F.col("first.pos")))
        )
        .select("id", F.col("pos").alias("s"),
                (F.col("pos") + F.lit(k)).alias("e"))
    )
    # merge overlapping/adjacent [s, e) intervals per doc: an interval
    # starts a new island when s > max(e) of everything before it
    w_prev = (
        Window.partitionBy("id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("id").orderBy("s", "e")
    islands = (
        dups.withColumn("prev_max_e", F.max("e").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_all))
    )
    return (
        islands.groupBy(F.col("id").alias(id_col), "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(id_col, "span_start", "span_end")
    )


def remove_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`repeated_kgram_spans`: rebuild each doc's text with
    the duplicated token intervals cut out.  Docs with no spans pass
    through untouched (and never shuffle — the spans side is the small
    one, so the join is broadcast-or-AQE and only span-carrying docs
    enter the rebuild).

    Returns ``(id_col, text_col)`` for every input row."""
    has = spans.select(F.col(id_col).alias("id")).distinct()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    ).join(has, "id", "left_semi")
    sp = spans.select(
        F.col(id_col).alias("id"), "span_start", "span_end"
    )
    # token is dropped if it falls inside ANY span; count memberships
    kept = (
        toks.alias("t")
        .join(sp.alias("p"), F.col("t.id") == F.col("p.id"), "left")
        .withColumn(
            "in_span",
            F.when(
                (F.col("pos") >= F.col("span_start"))
                & (F.col("pos") < F.col("span_end")),
                1,
            ).otherwise(0),
        )
        .groupBy(F.col("t.id").alias("id"), "pos", "tok")
        .agg(F.max("in_span").alias("drop"))
        .where(F.col("drop") == 0)
    )
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_new_text")
        )
    )
    # a span-carrying doc that lost EVERY token has no rebuilt row —
    # it must come back empty, not fall through to its original text
    edited = has.join(rebuilt, "id", "left").select(
        "id", F.coalesce("_new_text", F.lit("")).alias("_new_text")
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .join(edited, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("_new_text"), F.col("_t")).alias(text_col),
        )
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash bigint) — weighted token-hash bit voting.

    Tokenize + per-token hash run as JVM built-ins (split → xxhash64);
    the pandas UDF receives int64 hash arrays only and computes the
    whole batch's bit votes with one ``add.reduceat`` — no per-row
    Python loop (round-1 finding)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("hs"),
    )

    @pandas_udf(LongType())
    def sim(hs: pd.Series) -> pd.Series:
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64,
                           count=len(hs))
        out = np.zeros(len(hs), dtype=np.int64)
        if lens.sum():
            flat = np.concatenate([
                np.asarray(x, dtype=np.int64) for x in hs if len(x)
            ]).astype(np.uint64)
            uniq, codes = np.unique(flat, return_inverse=True)
            # ±1 contribution per bit per unique hash, int16 is plenty
            bitmat = (
                ((uniq[:, None] >> np.arange(bits, dtype=np.uint64)[None, :])
                 & np.uint64(1)).astype(np.int16) * 2 - 1
            )
            nz = lens > 0
            starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            votes = np.add.reduceat(
                bitmat[codes].astype(np.int64), starts, axis=0
            )
            sig = (
                (votes > 0).astype(np.uint64)
                << np.arange(bits, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
            out[nz] = sig.astype(np.int64)
        return pd.Series(out)

    return hashed.select("id", sim(F.col("hs")).alias("simhash"))


def dup_clusters(pairs: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: (id, cluster_id)
    where cluster_id is the minimum id in the pair-graph's connected
    component.  Pairs are the stable per-job primitive (module
    docstring); this is the separate iterative closure job that turns
    them into actionable keep/drop groups.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is one shuffle (groupBy node), and the edge diameter halves
    geometrically, so convergence is O(log^2 n) rounds even for
    pathological chain graphs, vs O(diameter) for naive min-label
    propagation.  At convergence every node's neighbor set is exactly
    {component min}, which IS the cluster id.

    100 TB shape: per round, one `groupBy(u)` aggregation emitting
    (neighbor -> min) edges — linear shuffle volume in |E|, never
    materializing components on the driver.  Each round's result is
    ``localCheckpoint``-ed to truncate lineage (iterative plans
    otherwise grow exponentially), and the convergence test is a
    count() action on the changed-edge set.
    """
    # undirected edge list, self-loops dropped, as (u, v)
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # large-star: for each u, connect every neighbor > u to
        # m = min(N(u) ∪ {u}).  Symmetrize first so both endpoints see
        # the full neighbor set.
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nbr = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m"),
            F.collect_set("v").alias("vs"),
        )
        large = nbr.select(
            F.explode(F.filter("vs", lambda x: x > F.col("u"))).alias("u"),
            F.col("m").alias("v"),
        ).where(F.col("u") != F.col("v")).distinct()
        large = large.localCheckpoint(eager=True)

        # small-star: orient edges high->low ((u,v) with u>v), connect
        # every neighbor <= u to m = min(N(u) ∪ {u}).
        lo = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        nbr2 = lo.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m"),
            F.collect_set("v").alias("vs"),
        )
        small = (
            nbr2.select(
                F.explode(
                    F.array_union("vs", F.array(F.col("u")))
                ).alias("u"),
                F.col("m").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged when small-star is a fixpoint: every edge already
        # points at the component min, i.e. the edge sets match.
        changed = (
            small.exceptAll(edges).limit(1).count()
            + edges.exceptAll(small).limit(1).count()
        )
        edges = small
        if changed == 0:
            break

    # star graph: u's single neighbor is the component min.  Include the
    # roots themselves (v side) as their own cluster members.
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = edges.select(
        F.col("v").alias("id"), F.col("v").alias("cluster_id")
    ).distinct()
    return members.unionByName(roots).distinct()


def dedup_by_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one canonical row (min id) per duplicate cluster; rows in no
    pair pass through.  One broadcast-able anti-join against the
    non-canonical member set (|members| << |corpus| at web scale)."""
    clusters = dup_clusters(pairs)
    drop = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) with hamming <= max_hamming, blocked on
    16-bit simhash bands (any pair within hamming<=3 shares at least one
    of 4 bands — pigeonhole)."""
    sigs = simhash_signatures(df, text_col, id_col).cache()
    banded = sigs.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.bucket")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
