"""Feature-hashed TF-IDF document embeddings (the "hashing trick").

A training-data pipeline needs cheap, vocabulary-free document vectors
— for clustering-based dedup (SemDeDup-style), ANN retrieval, and
domain-mix diagnostics — without materialising a term→index dictionary
(at 100 TB the vocabulary itself is a large distributed table).
Weinberger et al. 2009 ("Feature Hashing for Large Scale Multitask
Learning") replaces the dictionary with a hash: term *t* contributes
``ξ(t) · w(t)`` to dimension ``h(t) mod d``, with a ±1 sign hash
``ξ`` that makes the estimate unbiased.

Everything here is pure Catalyst expressions — no Python in the path:

1. postings ``(doc_id, term, tf)`` come from the engine's fused
   tokenize (one narrow pass, no token shuffle);
2. ``df(term)`` is one partial-combined aggregate; idf joins back via
   a broadcast (vocabulary-sized side);
3. bucket/sign hashes are the engine's portable md5-60bit expression
   (``operators/sampling.py``), so the whole embedding is replayable
   in ANSI SQL for the correctness oracle;
4. the dense vector assembles per doc with ``map_from_entries`` +
   one ``transform(sequence(0, d-1), ...)`` — a single hash aggregate
   keyed by ``(doc_id)``; the shuffle carries ≤ d entries per doc.

idf uses the smooth form ``ln((N + 1)/(df + 1)) + 1`` (scikit-learn's
smoothed variant), and vectors are optionally L2-normalised so dot
products are cosine similarities — ready to feed ``operators/
similarity.py`` / ``operators/pq.py`` ANN paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hashed_tfidf", "HASH_SALT_BUCKET",
           "HASH_SALT_SIGN"]

HASH_SALT_BUCKET = "fh_b"
HASH_SALT_SIGN = "fh_s"


def hash_bucket(term: Column, n: int, salt: str) -> Column:
    """Portable term→bucket hash: 60 md5 bits mod ``n`` — identical
    arithmetic is expressible in DuckDB/ANSI SQL (see
    ``sampling.hash_uniform_sql``), which keeps every feature-hashing
    operator oracle-checkable."""
    h = F.conv(
        F.substring(F.md5(F.concat(term, F.lit(salt))), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(n))


def hashed_tfidf(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzer: str = "simple_code",
    normalize: bool = True,
) -> DataFrame:
    """(doc_id, embedding array<double>) — feature-hashed TF-IDF
    vectors.  Docs with no tokens get no row (like an empty posting
    list).  ``normalize=True`` L2-normalises so ``Σ aᵢbᵢ`` is cosine
    similarity."""
    from ..index import build_logical_index

    idx = build_logical_index(
        docs, text_col=text_col, analyzer=analyzer, doc_id_col=doc_id_col
    )
    posts = idx.postings.select(
        F.col("doc_id").alias(doc_id_col), "term", "tf"
    )
    n_docs = idx.corpus_stats["doc_count"]

    stats = idx.term_stats.select(
        "term",
        (F.log((F.lit(float(n_docs) + 1.0))
               / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
         ).alias("idf"),
    )
    # vocabulary-sized side → broadcast
    weighted = posts.join(F.broadcast(stats), "term").select(
        doc_id_col,
        hash_bucket(F.col("term"), dim, HASH_SALT_BUCKET).alias("j"),
        (F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("term"),
                                       F.lit(HASH_SALT_SIGN))), 1, 15),
                    16, 10,
                ).cast("bigint"),
                F.lit(2),
            ) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
         * F.col("tf") * F.col("idf")).alias("w"),
    )
    cells = weighted.groupBy(doc_id_col, "j").agg(
        F.sum("w").alias("v")
    )
    vec = (
        cells.groupBy(doc_id_col)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("j", "v"))).alias("m"))
        .select(
            doc_id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("bigint")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )
    if normalize:
        norm = F.sqrt(F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x * x
        ))
        vec = vec.select(
            doc_id_col,
            F.transform(
                "embedding", lambda x: x / norm
            ).alias("embedding"),
        )
    return vec
