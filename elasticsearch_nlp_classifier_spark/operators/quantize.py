"""int8 scalar quantization for kNN — ES 8.12's ``int8_hnsw`` /
``quantized`` dense-vector index analog.

ES quantizes dense vectors to int8 at index time (4× smaller, SIMD
int dot products) and re-scores the shortlist on the float originals.
Same contract here, Spark-first:

- ``quantize_int8``: per-vector symmetric scalar quantization —
  ``scale = max|v| / 127``, ``q_i = round(v_i / scale)`` — plus the
  precomputed int-norm ``sq = Σ q_i²``.  Pure JVM higher-order
  expressions (transform / aggregate); no Python in the pass.
- ``int8_knn_topk``: approximate scores from the int8 vectors
  (``cos ≈ Σ q_i·d_i / (√Σq² · √Σd²)`` — the per-vector scales cancel
  in cosine up to quantization error), shortlist ``rerank × k``,
  then exact float rerank of the shortlist only.

At 100 TB the quantized table is the one that gets scanned (4 bytes →
1 byte per dim); the float originals are touched only for the bounded
shortlist join — the same read-amplification win ES gets from keeping
float vectors off the HNSW hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["quantize_int8", "int8_knn_topk",
           "corpus_dim_means", "quantize_binary", "bbq_knn_topk"]


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qvec array<int>, scale double, sq double): symmetric int8
    quantization with the squared int norm precomputed."""
    v = F.col(vec_col).cast("array<double>")
    maxabs = F.aggregate(v, F.lit(0.0),
                         lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(1.0))
    qvec = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    out = embeddings.select(
        F.col(id_col).alias("id"),
        qvec.alias("qvec"),
        scale.alias("scale"),
    )
    sq = F.aggregate(
        F.transform(F.col("qvec"), lambda q: (q * q).cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    return out.withColumn("sq", sq)


def _int_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def int8_knn_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    quantized: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos_r6): int8-scored shortlist of
    ``rerank × k`` per query, exact float cosine rerank on the
    shortlist.  Pass a precomputed ``quantized`` table (from
    ``quantize_int8``) to skip re-quantizing the corpus."""
    qtab = quantized if quantized is not None \
        else quantize_int8(embeddings, id_col, vec_col)
    qq = quantize_int8(queries, query_id_col, query_vec_col).select(
        F.col("id").alias("query_id"), F.col("qvec").alias("q_qvec"),
        F.col("sq").alias("q_sq"),
    )
    approx = (
        qtab.crossJoin(F.broadcast(qq))
        .select(
            "query_id", "id",
            (_int_dot(F.col("qvec"), F.col("q_qvec"))
             / (F.sqrt(F.col("sq")) * F.sqrt(F.col("q_sq"))))
            .alias("acos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("acos", 9)),
                                               F.asc("id"))
    shortlist = approx.withColumn("arank", F.row_number().over(w)) \
        .where(F.col("arank") <= rerank * k).select("query_id", "id")

    # exact rerank: join shortlist back to float vectors (bounded rows)
    emb = embeddings.select(F.col(id_col).alias("id"),
                            F.col(vec_col).cast("array<double>").alias("v"))
    qv = queries.select(F.col(query_id_col).alias("query_id"),
                        F.col(query_vec_col).cast("array<double>").alias("qv"))
    dot = F.aggregate(F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(F.col("v"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    nq = F.sqrt(F.aggregate(F.transform(F.col("qv"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    exact = (
        shortlist.join(emb, "id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos", dot / (nv * nq))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc(F.round("cos", 9)),
                                                F.asc("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"),
                F.col("id").alias("vec_id"), F.round("cos", 6).alias("cos_r6"))
    )


# ---------------------------------------------------------------------------
# BBQ-style 1-bit quantization (ES 8.16 "better binary quantization"
# dense-vector analog, simplified): centroid-centered sign bits packed
# 64 dims per int64 word.  32× smaller than float32; candidate scoring
# is XOR + popcount — whole-stage-codegen JVM arithmetic (bitwiseXOR +
# bit_count over zip_with), no Python anywhere in the scan.  Like ES,
# the bit table only PRUNES: the shortlist is re-scored on the float
# originals, so the final ranks/scores are exact cosine (the DuckDB
# oracle is the plain brute-force ranking).
#
# At 100 TB the packed table is 1 bit/dim — a 768-dim corpus scans at
# 96 bytes/vector instead of 3 KiB, and the float vectors are touched
# only for the rerank×k shortlist join per query.


def corpus_dim_means(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[float]:
    """Per-dimension corpus means (the centering vector) — ONE
    dim-sized aggregation; the result is broadcast into the packing
    expression as literals."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    v = F.col(vec_col).cast("array<double>")
    row = embeddings.select(
        *[F.avg(F.element_at(v, i + 1)).alias(f"m{i}") for i in range(dim)]
    ).first()
    return [float(row[i] or 0.0) for i in range(dim)]


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def quantize_binary(
    embeddings: DataFrame,
    means: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bits array<bigint>): sign bits of the mean-centered vector,
    64 per word, little-endian within the word (dim j -> bit j%64 of
    word j//64).  Pure codegen — a sum of conditional bit literals per
    word."""
    dim = len(means)
    nwords = (dim + 63) // 64
    v = F.col(vec_col).cast("array<double>")
    words = []
    for w in range(nwords):
        terms = None
        for j in range(min(64, dim - w * 64)):
            i = w * 64 + j
            t = F.when(F.element_at(v, i + 1) > F.lit(means[i]),
                       F.lit(_signed64(1 << j)).cast("bigint")) \
                 .otherwise(F.lit(0).cast("bigint"))
            terms = t if terms is None else terms + t
        words.append(terms)
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.array(*words).alias("bits"),
    )


def _hamming(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))
                   .cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def bbq_knn_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    quantized: DataFrame | None = None,
    means: list[float] | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos_r6): hamming-distance shortlist of
    ``rerank × k`` per query over the packed bit table (queries are
    packed against the SAME corpus centering vector), exact float
    cosine rerank on the shortlist only.  Pass ``quantized`` +
    ``means`` (from ``quantize_binary`` / ``corpus_dim_means``) to
    reuse a prebuilt bit table.

    Signature resolution is ``dim`` bits, so scale the rerank window
    inversely with dimensionality: 768-dim production embeddings rank
    well at ``rerank=4-8`` (where ES's BBQ operates), while the 64-dim
    test fixtures need ``rerank≈30`` to pin the exact top-k."""
    if means is None:
        means = corpus_dim_means(embeddings, vec_col)
    btab = quantized if quantized is not None \
        else quantize_binary(embeddings, means, id_col, vec_col)
    qb = quantize_binary(queries, means, query_id_col, query_vec_col) \
        .select(F.col("id").alias("query_id"), F.col("bits").alias("q_bits"))
    approx = (
        btab.crossJoin(F.broadcast(qb))
        .select("query_id", "id",
                _hamming(F.col("bits"), F.col("q_bits")).alias("ham"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ham"), F.asc("id"))
    shortlist = approx.withColumn("arank", F.row_number().over(w)) \
        .where(F.col("arank") <= rerank * k).select("query_id", "id")

    emb = embeddings.select(F.col(id_col).alias("id"),
                            F.col(vec_col).cast("array<double>").alias("v"))
    qv = queries.select(F.col(query_id_col).alias("query_id"),
                        F.col(query_vec_col).cast("array<double>").alias("qv"))
    dot = F.aggregate(F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(F.col("v"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    nq = F.sqrt(F.aggregate(F.transform(F.col("qv"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    exact = (
        shortlist.join(emb, "id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos", dot / (nv * nq))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc(F.round("cos", 9)),
                                                F.asc("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"),
                F.col("id").alias("vec_id"), F.round("cos", 6).alias("cos_r6"))
    )
