"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2 +
training-data pipeline ops) over the driver testdata; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for the value-hash correctness
gate.  Text queries use the ``simple_code`` analyzer (lowercase +
``[a-z0-9]+`` extraction) because it is exactly expressible in both
engines; the full reference analyzer chain (twitter split + stopwords +
Porter2) is parity-tested in ``tests/`` against the reference's own
golden token arrays instead.

Float-safety conventions for the hash compare: every float column is
``round(x, 6)``; every ranking orders by ``round(score, 9) DESC, id``;
NB scores are never emitted (argmax only).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --- shared SQL fragments (DuckDB dialect) ---------------------------------

_TOKS = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
)"""

_TF = _TOKS + """,
posts AS (SELECT doc_id, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM posts GROUP BY 1, 2)"""

_BM25_BASE = _TF + """,
dl AS (SELECT doc_id, len(w)::BIGINT AS dl FROM toks WHERE len(w) > 0),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
corpus AS (SELECT count(*)::BIGINT AS n,
                  sum(dl)::DOUBLE / count(*) AS avgdl FROM dl)"""

# one _graph/explore significance wave from seed 'data' (JLH score,
# vertices_per_hop=5, min_doc_count=2) — shared by the vertices and
# edges oracle entries
_GRAPH_WAVE = _TF + """,
seed_docs AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'data'),
n_fg AS (SELECT count(*)::DOUBLE AS n FROM seed_docs),
n_all AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
fg AS (SELECT term, count(*)::BIGINT AS fg_count
       FROM tf JOIN seed_docs USING (doc_id)
       GROUP BY 1 HAVING count(*) >= 2),
bg AS (SELECT term, count(*)::BIGINT AS bg_count FROM tf GROUP BY 1),
g_scored AS (
  SELECT f.term, fg_count, bg_count,
         CASE WHEN fg_count / (SELECT n FROM n_fg)
                   > bg_count / (SELECT n FROM n_all)
         THEN (fg_count / (SELECT n FROM n_fg)
               - bg_count / (SELECT n FROM n_all))
              * ((fg_count / (SELECT n FROM n_fg))
                 / (bg_count / (SELECT n FROM n_all)))
         ELSE 0.0 END AS score
  FROM fg f JOIN bg USING (term)
  WHERE f.term <> 'data'),
wave AS (SELECT term, fg_count, bg_count, score FROM g_scored
         ORDER BY round(score, 9) DESC, term ASC LIMIT 5)"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _logical_index(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.index import build_logical_index

    docs = _docs(spark, sf_dir)
    return build_logical_index(
        docs, text_col="text", analyzer="simple_code", doc_id_col="doc_id"
    )


def _docs_with_dups(spark, sf_dir):
    """documents + 5 planted exact duplicates (ids +10000) — replicated
    verbatim in the oracle SQL."""
    docs = _docs(spark, sf_dir)
    dups = docs.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    return docs.unionByName(dups)


_DUPS_SQL = """
docs_dup AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 5
)"""

# two planted copies -> triangle components for the closure oracle
_DUPS3_SQL = """
docs_dup AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 5
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 5
)"""


# --- queries ----------------------------------------------------------------

def q_a1_term_freq(spark, sf_dir):
    idx = _logical_index(spark, sf_dir)
    return idx.postings.select(
        "doc_id", "term", F.col("tf").cast("bigint").alias("tf")
    )


def q_a2_a3_term_stats(spark, sf_dir):
    idx = _logical_index(spark, sf_dir)
    return idx.term_stats.select(
        "term",
        F.col("df").cast("bigint").alias("df"),
        F.col("ttf").cast("bigint").alias("ttf"),
    )


def q_a4_field_stats(spark, sf_dir):
    idx = _logical_index(spark, sf_dir)
    return idx.postings.agg(
        F.countDistinct("doc_id").alias("doc_count"),
        F.sum("tf").cast("bigint").alias("sum_ttf"),
        F.count(F.lit(1)).alias("sum_doc_freq"),
        F.round(F.sum("tf") / F.countDistinct("doc_id"), 6).alias("avgdl"),
    )


def q_a5_vocabulary(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.index import vocabulary

    return vocabulary(_logical_index(spark, sf_dir))


def q_a7_bm25_topk(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.query import bm25_topk

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000, analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_a7_bm25_skewed_term(spark, sf_dir):
    """Single hottest-term query (max-df term in the corpus) — the skew
    probe."""
    from elasticsearch_nlp_classifier_spark.query import bm25_topk

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "the")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000, analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def _nb_model(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.classifier import train_nb

    docs = _docs(spark, sf_dir)
    return train_nb(
        docs, ["text"], "lang", analyzer="simple_code", id_col="doc_id"
    ), docs


def q_a8_nb_likelihood(spark, sf_dir):
    model, _ = _nb_model(spark, sf_dir)
    return model.likelihood.select(
        "label", "term", F.round("ll", 6).alias("ll_r6")
    )


def q_a9_nb_predict(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.classifier import predict_nb

    model, docs = _nb_model(spark, sf_dir)
    return predict_nb(
        model, docs, ["text"], analyzer="simple_code", id_col="doc_id",
        tie_round=9,
    ).select("doc_id", "prediction")


def q_a6_accuracy(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.classifier import predict_nb

    model, docs = _nb_model(spark, sf_dir)
    preds = predict_nb(
        model, docs, ["text"], analyzer="simple_code", id_col="doc_id",
        tie_round=9,
    )
    joined = docs.select("doc_id", "lang").join(preds, "doc_id")
    return joined.agg(
        F.round(
            F.avg((F.col("lang") == F.col("prediction")).cast("double")), 6
        ).alias("accuracy")
    )


def _linear_split(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(
        F.col("lang").isNotNull() & (F.col("lang") != "")
    )
    train = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) != 0)
    test = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    return train, test


def _linear_predict_query(spark, sf_dir, algorithm):
    """MAXENT / PERCEPTRON trainer parity (`OpenNLPClassifier.java:
    27-36` — the reference's non-NB trainer menu).  Training is
    iterative (not SQL-expressible); the trained weights and the test
    features are MATERIALIZED and the oracle replays the distributed
    predict stage (join + per-class sums + rounded argmax, ties →
    label ASC) in DuckDB."""
    from elasticsearch_nlp_classifier_spark.classifier import (
        predict_linear, train_maxent, train_perceptron,
    )
    from elasticsearch_nlp_classifier_spark.classifier.linear import (
        hashed_features,
    )

    from elasticsearch_nlp_classifier_spark.classifier import (
        train_maxent_qn,
    )

    train, test = _linear_split(spark, sf_dir)
    dim = 1024
    if algorithm == "maxent":
        model = train_maxent(train, ["text"], "lang", dim=dim,
                             iterations=10, id_col="doc_id")
    elif algorithm == "maxent_qn":
        model = train_maxent_qn(train, ["text"], "lang", dim=dim,
                                iterations=6, id_col="doc_id")
    else:
        model = train_perceptron(train, ["text"], "lang", dim=dim,
                                 epochs=4, id_col="doc_id")
    scratch = _oracle_scratch()
    hashed_features(test, ["text"], dim, id_col="doc_id").write.mode(
        "overwrite").parquet(f"{scratch}/{algorithm}_feats.parquet")
    model.weights_df(spark).write.mode("overwrite").parquet(
        f"{scratch}/{algorithm}_weights.parquet")
    return predict_linear(model, test, ["text"], id_col="doc_id")


def q_maxent_predict(spark, sf_dir):
    return _linear_predict_query(spark, sf_dir, "maxent")


def q_maxent_qn_predict(spark, sf_dir):
    return _linear_predict_query(spark, sf_dir, "maxent_qn")


def q_perceptron_predict(spark, sf_dir):
    return _linear_predict_query(spark, sf_dir, "perceptron")


def q_x1_kfold_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("fold", F.pmod(F.col("doc_id"), F.lit(3)).cast("bigint"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fold")
    )


def q_p_filters(spark, sf_dir):
    """P2/P3/P4/P9/P11-shaped predicate stack."""
    from elasticsearch_nlp_classifier_spark.functions import (
        exists,
        must,
        must_not,
        non_empty_label,
        term_query,
    )

    docs = _docs(spark, sf_dir)
    cond = must(
        exists("lang"),
        non_empty_label("lang"),
        must_not(term_query("source", "src0")),
        F.col("n_chars") > 200,
    )
    return docs.where(cond).select("doc_id", "lang", "source")


def q_p12_json_path(spark, sf_dir):
    """P12 — ESJsonPath dotted-key resolution (`ESJsonPath.java:28-52`,
    `ESJsonPathTest.java:54-84`): literal top-level key preferred over
    nested traversal, nested fallback when no literal key exists,
    scalars coerced to strings, ``""`` default on miss.  The raw-JSON
    column is synthesized from `documents` so both engines extract
    from equivalent documents."""
    from elasticsearch_nlp_classifier_spark.functions import es_json_path

    docs = _docs(spark, sf_dir)
    j = F.to_json(F.struct(
        F.col("doc_id"),
        F.col("lang").alias("meta.lang"),
        F.struct(F.col("source").alias("lang")).alias("meta"),
        F.struct(F.col("source").alias("lang")).alias("nested"),
        F.col("n_chars").alias("n"),
    )).alias("doc")
    return (
        docs.select("doc_id", j)
        .select(
            "doc_id",
            es_json_path("doc", "meta.lang").alias("lit_first"),
            es_json_path("doc", "nested.lang").alias("nested_fb"),
            es_json_path("doc", "n").alias("n_str"),
            es_json_path("doc", "missing.key").alias("miss"),
        )
        .orderBy("doc_id")
    )


def q_p7_query_string(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.functions import compile_query_string

    docs = _docs(spark, sf_dir)
    col = compile_query_string(
        '(lang:en OR lang:de) AND NOT source:src3 AND n_chars:2*',
        default_field="text",
    )
    return docs.where(col).select("doc_id")


def q_p5_match_filter(spark, sf_dir):
    """P5 matchQuery-as-filter: docs containing ANY analyzed query
    token (`ElasticsearchTest.java:57`)."""
    from elasticsearch_nlp_classifier_spark.query import match_filter

    idx = _logical_index(spark, sf_dir)
    return match_filter(idx, "data value zzz_absent", analyzer="simple_code")


def q_o1_topk(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "n_chars")
    )


def q_s4_term_vectors(spark, sf_dir):
    """_mtermvectors surface: per-term stats for a probe doc set."""
    idx = _logical_index(spark, sf_dir)
    probe = idx.postings.where(F.col("doc_id") < 3)
    return probe.join(idx.term_stats, "term").select(
        "doc_id", "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.col("ttf").cast("bigint").alias("ttf"),
    )


def q_s4_term_vectors_offsets(spark, sf_dir):
    """_mtermvectors with the ``offsets`` flag (the last term-vector
    contract piece, `TermVectorQuery.java:60-76`; golden span shape
    `TermVectorTokensTest.java:16-55`): per-occurrence (position,
    start_offset, end_offset) char spans from the offsets index,
    exploded to scalar rows for the hash compare.  Offsets are fixed at
    the analyzer's split stage over the ORIGINAL text
    (`analyzer/chain.Analyzer.tokenize_with_offsets`)."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.index.build import term_vectors

    docs = _docs(spark, sf_dir)
    idx = build_logical_index(
        docs, text_col="text", analyzer="simple_code",
        doc_id_col="doc_id", with_offsets=True,
    )
    tv = term_vectors(idx, doc_ids=list(range(40)))
    flat = tv.select("doc_id", F.explode("terms").alias("t")) \
        .select("doc_id", "t.*")
    occ = flat.select(
        "doc_id", "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.col("ttf").cast("bigint").alias("ttf"),
        "start_offsets", "end_offsets",
        F.posexplode("positions").alias("i", "pos"),
    )
    return occ.select(
        "doc_id", "term", "tf", "df", "ttf",
        F.col("pos").cast("bigint").alias("pos"),
        F.element_at("start_offsets", F.col("i") + 1)
        .cast("bigint").alias("start_offset"),
        F.element_at("end_offsets", F.col("i") + 1)
        .cast("bigint").alias("end_offset"),
    )


def q_dedup_exact(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators import exact_dup_groups

    d = _docs_with_dups(spark, sf_dir)
    return exact_dup_groups(d, "text", "doc_id").select(
        "sha", F.col("n_dups").cast("bigint").alias("n_dups"), "keep_id"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators import ngram_jaccard_pairs

    d = _docs_with_dups(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.8)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r6"))


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, now FULL-oracled: the output contract
    is 'every pair with word-5-shingle jaccard >= 0.8' (candidates are
    verified with the exact jaccard, and the 16x4 banding's miss
    probability at j=0.8 is ~2e-4/pair), so the all-pairs SQL jaccard IS
    the end-to-end oracle — stronger than a banding-stage replay."""
    from elasticsearch_nlp_classifier_spark.operators import minhash_lsh_pairs

    d = _docs_with_dups(spark, sf_dir)
    return minhash_lsh_pairs(d, "text", "doc_id", threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r6")
    )


def q_nested_query(spark, sf_dir):
    """ES nested query + inner_hits over an array-of-struct field
    (per-user event arrays): match users with SOME event satisfying
    event_type='error' AND value>50 on the SAME element, count the
    matching elements.  The predicate runs as a Catalyst `exists`
    higher-order function — no explode for non-matching parents."""
    from elasticsearch_nlp_classifier_spark.functions import (
        nested_inner_hits, nested_query,
    )

    ev = _events(spark, sf_dir)
    nested = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("event_id", "event_type", "value"))
        ).alias("events")
    )
    pred = lambda e: (e["event_type"] == F.lit("error")) & (e["value"] > 50)  # noqa: E731
    hits = nested_inner_hits(nested, "events", pred, id_col="user_id")
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def q_update_delete_by_query(spark, sf_dir):
    """ES _update_by_query + _delete_by_query against a scratch copy of
    the docs table (atomic-swap parquet MERGE emulation): short docs
    get lang='short', very long docs are deleted; the oracle replays
    both as one CASE + WHERE."""
    import shutil as _sh

    from elasticsearch_nlp_classifier_spark.sources import (
        delete_by_query, update_by_query,
    )

    tbl = f"{_oracle_scratch()}/docs_byquery.parquet"
    _sh.rmtree(tbl, ignore_errors=True)
    _docs(spark, sf_dir).write.mode("overwrite").parquet(tbl)
    update_by_query(spark, tbl, F.col("n_chars") < 150,
                    {"lang": F.lit("short")})
    delete_by_query(spark, tbl, F.col("n_chars") >= 450)
    return spark.read.parquet(tbl).select("doc_id", "lang")


def q_dedup_incremental(spark, sf_dir):
    """Cross-snapshot dedup via a history Bloom filter + exact verify
    (operators/bloom.py): new batch = fresh docs + 50 re-crawled copies
    under new ids; history is only ever joined on the Bloom positives.
    Output is exact (the verify join absorbs false positives), so the
    oracle is a plain content anti-join."""
    from elasticsearch_nlp_classifier_spark.operators import (
        dedup_against_history,
    )

    docs = _docs(spark, sf_dir)
    hist = docs.where(F.col("doc_id") < 250)
    recrawl = docs.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    new = docs.where(F.col("doc_id") >= 250).unionByName(recrawl)
    out = dedup_against_history(new, hist, "text", "doc_id")
    return out.select("doc_id", "lang")


def _oracle_scratch() -> str:
    import tempfile

    p = os.path.join(tempfile.gettempdir(), "spark_graft_oracle")
    os.makedirs(p, exist_ok=True)
    return p


def _linear_predict_sql(algorithm: str) -> str:
    from elasticsearch_nlp_classifier_spark.classifier.linear import (
        predict_sql,
    )

    return predict_sql(
        "{SCRATCH}/" + f"{algorithm}_feats.parquet",
        "{SCRATCH}/" + f"{algorithm}_weights.parquet",
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs.  The signature hash family (xxhash64) is
    not DuckDB-expressible, so signatures are MATERIALIZED to parquet
    and the oracle independently re-derives banding (HUGEINT div/mod),
    the band self-join, xor+bit_count hamming, and the distinct+
    threshold semantics from them."""
    from elasticsearch_nlp_classifier_spark.operators import (
        simhash_near_dup_pairs,
    )
    from elasticsearch_nlp_classifier_spark.operators.dedup import (
        simhash_signatures,
    )

    d = _docs_with_dups(spark, sf_dir)
    simhash_signatures(d, "text", "doc_id").write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/simhash_sigs.parquet"
    )
    return simhash_near_dup_pairs(d, "text", "doc_id", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    )


def q_ann_cosine_topk(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=5)
    # re-rank on rounded score for cross-engine float safety
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "vec_id",
            F.round("cos", 6).alias("cos_r6"),
        )
    )


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN.  The hyperplane family is seeded numpy (not
    SQL-expressible; recall-vs-brute is pytest-gated), so the candidate
    set is MATERIALIZED to parquet and the oracle independently
    re-scores + re-ranks it with exact cosine in SQL — the rerank/topk
    stage gets a real hash-match check."""
    from elasticsearch_nlp_classifier_spark.operators import lsh_candidates

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = lsh_candidates(emb, queries, dim=64, n_bits=32, bands=8).cache()
    cands.select("query_id", "vec_id").write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/ann_lsh_cands.parquet"
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import cosine

    scored = cands.select(
        "query_id", "vec_id",
        cosine(F.col("embedding"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"),
            "vec_id", F.round("cos", 6).alias("cos_r6"),
        )
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup PAIRS -> duplicate CLUSTERS (connected components via
    alternating large-star/small-star).  Edges come from the fully
    SQL-expressible ngram-jaccard pair op, so the DuckDB oracle can
    independently re-derive the same graph and close it with a
    recursive CTE — an end-to-end hash-match on the closure itself.
    Two planted copies of each of docs 0..4 give triangle components
    {i, i+10000, i+20000} exercising transitivity."""
    from elasticsearch_nlp_classifier_spark.operators import (
        dup_clusters, ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") < 5)
    d = docs.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 10_000)
    ).unionByName(base.withColumn("doc_id", F.col("doc_id") + 20_000))
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.8)
    return dup_clusters(pairs).select("id", "cluster_id")


def q_ann_ivf(spark, sf_dir):
    """IVF ANN (the second scale path next to LSH): spherical-k-means
    cells, probe the 4 nearest of 8 cells per query, exact re-rank.
    The centroid training is seeded numpy/DataFrame iteration (not
    SQL-expressible; recall-vs-brute is pytest-gated), so the candidate
    set is MATERIALIZED to parquet and the oracle independently
    re-scores + re-ranks it with exact cosine in SQL."""
    from elasticsearch_nlp_classifier_spark.operators import (
        ivf_candidates, ivf_train_centroids,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import cosine

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ivf_train_centroids(emb, dim=64, n_cells=8, iters=3)
    cands = ivf_candidates(emb, queries, cents, n_probe=4).cache()
    cands.select("query_id", "vec_id").write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/ann_ivf_cands.parquet"
    )
    scored = cands.select(
        "query_id", "vec_id",
        cosine(F.col("embedding"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"),
            "vec_id", F.round("cos", 6).alias("cos_r6"),
        )
    )


def q_ann_pq(spark, sf_dir):
    """PQ/ADC ANN (the compressed scale path next to IVF/LSH —
    Jégou et al. 2011): per-subspace k-means codebooks, vectors stored
    as m small codes, ADC table-lookup scan, exact cosine re-rank of
    the top candidates.  Codebook training is seeded numpy (not
    SQL-expressible; losslessness + recall are pytest-gated in
    test_pq.py), so the depth-50 ADC candidate set is MATERIALIZED to
    parquet and the oracle independently re-scores + re-ranks it with
    exact cosine in SQL — same contract shape as ann_ivf/ann_lsh."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators import (
        pq_adc_topk, pq_encode, pq_train_codebooks,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        cosine,
    )

    emb = _emb(spark, sf_dir)
    books = pq_train_codebooks(emb, dim=64, m=16, n_codes=32, iters=5)
    codes = pq_encode(emb, books)
    q = [(r["vec_id"], np.asarray(r["embedding"]))
         for r in emb.where(F.col("vec_id") < 3).collect()]
    cands = pq_adc_topk(codes, q, books, k=50).select(
        "query_id", "vec_id"
    ).cache()
    cands.write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/ann_pq_cands.parquet"
    )
    qdf = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "vec_id",
            cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"),
            "vec_id", F.round("cos", 6).alias("cos_r6"),
        )
    )


def q_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composite ANN (FAISS IVFADC): coarse quantizer prunes
    which codes are scanned, residual-PQ codes compress what is
    scanned.  Training is seeded numpy/DataFrame iteration (pytest
    recall/monotonicity gates in test_pq.py); the depth-50 candidate
    set from the pruned ADC scan is MATERIALIZED and the oracle
    re-scores + re-ranks it with exact cosine in SQL."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators import (
        ivfpq_build, ivfpq_topk,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        cosine,
    )

    emb = _emb(spark, sf_dir)
    cents, books, codes = ivfpq_build(
        emb, dim=64, n_cells=8, m=16, n_codes=32, iters=5
    )
    q = [(r["vec_id"], np.asarray(r["embedding"]))
         for r in emb.where(F.col("vec_id") < 3).collect()]
    cands = ivfpq_topk(codes, q, cents, books, k=50, n_probe=4).select(
        "query_id", "vec_id"
    ).cache()
    cands.write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/ann_ivfpq_cands.parquet"
    )
    qdf = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "vec_id",
            cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"),
            "vec_id", F.round("cos", 6).alias("cos_r6"),
        )
    )


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_events_windowed(spark, sf_dir):
    """Tumbling event-time window aggregation (the batch plan; the
    identical logical plan runs under Structured Streaming with a
    watermark — pytest covers the late-data drop semantics)."""
    from elasticsearch_nlp_classifier_spark.streaming import (
        windowed_event_counts,
    )

    return windowed_event_counts(_events(spark, sf_dir), "10 minutes")


def q_events_sessionize(spark, sf_dir):
    """Gap-based per-user sessionization via native session_window
    (batch form; streaming + applyInPandasWithState forms are
    pytest-pinned to this output)."""
    from elasticsearch_nlp_classifier_spark.streaming import (
        sessionize_events,
    )

    return sessionize_events(_events(spark, sf_dir), "30 minutes")


def q_text_token_counts(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators.textstats import (
        bpe_ish_token_count, token_count,
    )

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("bigint").alias("n_bpe"),
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact brute method (the SQL
    oracle); the LSH scale path is recall-tested in pytest."""
    from elasticsearch_nlp_classifier_spark.operators import (
        cosine_near_dup_pairs,
    )

    emb = _emb(spark, sf_dir)
    pairs = cosine_near_dup_pairs(emb, threshold=0.4, method="brute")
    return pairs.select(
        "id_a", "id_b", F.round("cos", 6).alias("cos_r6")
    )


def q_text_rolling_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash fingerprint — a JVM ``aggregate``
    fold over md5-prefix word values, with an exact DuckDB twin
    (``list_reduce``), so this is now a full hash-match oracle entry."""
    from elasticsearch_nlp_classifier_spark.operators import (
        document_fingerprints,
    )

    docs = _docs(spark, sf_dir)
    return document_fingerprints(docs, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "rolling_fp"
    )


def q_match_phrase(spark, sf_dir):
    """T9-adjacent: positional postings (varbyte position gaps in the
    block layout) + exact phrase match — reference surface
    `TermVectorQuery.java:60-76` position arrays."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import match_phrase

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="phrase_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True,
    )
    return match_phrase(index, "data value", analyzer="simple_code")


def q_p7_query_string_analyzed(spark, sf_dir):
    """P7 analyzed-text-field mode: ``text:token`` matches the analyzed
    token (reference `ScanAndScrollIteratorTest.java:20`), phrases are
    token runs, prefixes match any token."""
    from elasticsearch_nlp_classifier_spark.functions import (
        compile_query_string,
    )

    docs = _docs(spark, sf_dir)
    col = compile_query_string(
        '(text:data OR text:valu*) AND NOT text:"data value"',
        default_field="text", text_fields={"text"}, analyzer="simple_code",
    )
    return docs.where(col).select("doc_id")


def q_s8_merge_updates(spark, sf_dir):
    """S8 MERGE sink: enrich -> atomic overwrite-by-join merge into a
    parquet table -> re-read (`BulkUpdateQueue.java:27-169`'s
    apply-batch-atomically contract, emulated without a table-format
    jar).  Returns the merged table's (doc_id, lang)."""
    import shutil
    import tempfile

    from elasticsearch_nlp_classifier_spark.sources import merge_updates

    tbl = tempfile.mkdtemp(prefix="merge_tbl_") + "/documents"
    os.makedirs(tbl)
    shutil.copy(f"{sf_dir}/documents.parquet", f"{tbl}/part-0.parquet")
    updates = q_j2_enrich_updates(spark, sf_dir)
    merge_updates(spark, tbl, updates, "doc_id", {"lang": "new_lang"})
    return spark.read.parquet(tbl).select("doc_id", "lang")


def q_text_quality(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators.textstats import quality_stats

    docs = _docs(spark, sf_dir)
    q = quality_stats(docs, "text")
    return q.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("punct_ratio", 6).alias("punct_ratio_r6"),
        F.round("alpha_ratio", 6).alias("alpha_ratio_r6"),
        F.round("quality_score", 6).alias("quality_r6"),
    )


def q_text_fingerprints(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("sha256"))


def q_j2_enrich_updates(spark, sf_dir):
    """Update-if-changed (J2+P11): NB lang prediction vs existing lang."""
    from elasticsearch_nlp_classifier_spark.classifier import enrich, predict_nb

    model, docs = _nb_model(spark, sf_dir)
    preds = predict_nb(
        model, docs, ["text"], analyzer="simple_code", id_col="doc_id",
        tie_round=9,
    )
    return enrich(docs, preds, "lang", id_col="doc_id").select(
        "doc_id", F.col("lang").alias("new_lang")
    )


def q_a7_bm25_wand(spark, sf_dir):
    """The flagship physical path: varbyte block index + block-max WAND,
    checked against the SAME brute-force SQL oracle as a7_bm25_topk —
    the compressed/pruned path is exact by construction."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.wand import wand_topk

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="wand_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code"
    )
    import pandas as pd

    q = pd.DataFrame({"query_id": [1], "query_text": ["data value table"]})
    scored = wand_topk(index, q, k=50, analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_s5_term_vector_multiset(spark, sf_dir):
    """S5: re-inflate per-doc token multiset — each term repeated tf
    times (`TermVectorTokens.java:38-68`)."""
    idx = _logical_index(spark, sf_dir)
    probe = idx.postings.where(F.col("doc_id") < 3)
    return probe.select(
        "doc_id", "term",
        F.explode(F.sequence(F.lit(1).cast("bigint"),
                             F.col("tf").cast("bigint"))).alias("copy_i"),
    )


def q_s6_term_vector_distinct(spark, sf_dir):
    """S6: distinct per-doc terms (`TermVectorDocTokens.java:19-31`)."""
    idx = _logical_index(spark, sf_dir)
    return idx.postings.where(F.col("doc_id") < 3).select("doc_id", "term")


def q_x2_kfold_shuffle(spark, sf_dir):
    """X2: shuffle-based k-fold as a deterministic multiplicative hash
    (`OpenNLPClassifierTweet.java:59-80`'s Collections.shuffle, made
    reproducible — SURVEY §2.6)."""
    docs = _docs(spark, sf_dir)
    fold = F.pmod(
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296),
        F.lit(3),
    ).cast("bigint")
    return (
        docs.withColumn("fold", fold)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fold")
    )


def q_a10_kfold_accuracy(spark, sf_dir):
    """A10/X1/X3: per-fold NB accuracy, deterministic id%k folds
    (`OpenNLPClassifierES.java:20-58`)."""
    from elasticsearch_nlp_classifier_spark.classifier import (
        accuracy, predict_nb, train_nb,
    )

    docs = _docs(spark, sf_dir).where(
        F.col("lang").isNotNull() & (F.col("lang") != "")
    )
    rows = []
    for fold in range(3):
        train = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) != fold)
        test = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == fold)
        model = train_nb(train, ["text"], "lang",
                         analyzer="simple_code", id_col="doc_id")
        preds = predict_nb(model, test, ["text"], analyzer="simple_code",
                           id_col="doc_id", tie_round=9)
        rows.append((fold, round(accuracy(test, preds, "lang", "doc_id"), 6)))
    return spark.createDataFrame(rows, "fold bigint, acc_r6 double")


def q_text_lang_id(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.operators.textstats import lang_id

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_mm_feature_extract(spark, sf_dir):
    """Multimodal decode, VALUE-checked (r2's last rows-only entry,
    closed): closed-form payloads (`synthetic_media_closed_form` —
    every pixel/sample is integer arithmetic over (doc_id, coords),
    real-encoded to BMP/WAV/Y4M containers) go through the REAL
    pure-numpy decode (operators/codecs.py) and feature extraction;
    the oracle recomputes the same decoded-content statistics from the
    closed form in SQL, no byte parsing.  Any decode error — header
    field, BMP row padding, BGR↔RGB order, LE int16 samples, Y4M plane
    layout — diverges the means and fails the hash.  Checked stats per
    kind: image (mean R, mean G, mean B), audio (duration, rms,
    abs-mean), video (frames, overall mean, mean |frame diff|) —
    float64 stats cast through float32 (the stored feature dtype) on
    BOTH sides so the compare is exact."""
    from elasticsearch_nlp_classifier_spark.operators.multimodal import (
        extract_features, synthetic_media_closed_form,
    )

    media = synthetic_media_closed_form(spark, n=64)
    feats = extract_features(media)
    pick = {
        "image": (3, 4, 5),   # 1-based: mean R, mean G, mean B
        "audio": (1, 2, 5),   # duration, rms, abs-mean
        "video": (1, 5, 7),   # n frames, overall mean, mean |diff|
    }
    v = {}
    for j in range(3):
        expr = None
        for kind, idx in pick.items():
            e = F.element_at("features", idx[j])
            expr = F.when(F.col("kind") == kind, e) if expr is None \
                else expr.when(F.col("kind") == kind, e)
        v[j] = F.round(expr.cast("double"), 6)
    return feats.select(
        "doc_id", "kind",
        F.size("features").cast("bigint").alias("dim"),
        v[0].alias("v1_r6"), v[1].alias("v2_r6"), v[2].alias("v3_r6"),
    )


def q_quality_shape(spark, sf_dir):
    """Gopher-style per-row shape metrics (Rae et al. 2021 §A1.1) —
    pure Catalyst expressions, twin SQL in the oracle."""
    from elasticsearch_nlp_classifier_spark.operators.quality import (
        shape_stats,
    )

    docs = _docs(spark, sf_dir)
    s = shape_stats(docs, "text")
    return s.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round("mean_word_len", 6).alias("mean_word_len_r6"),
        F.round("alpha_word_frac", 6).alias("alpha_word_frac_r6"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio_r6"),
        F.round("dup_line_frac", 6).alias("dup_line_frac_r6"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac_r6"),
    )


def q_quality_repetition(spark, sf_dir):
    """Gopher n-gram repetition metrics — ONE (doc, gram)-keyed shuffle
    with map-side combine; DuckDB twin in the oracle."""
    from elasticsearch_nlp_classifier_spark.operators.quality import (
        ngram_repetition_stats,
    )

    docs = _docs(spark, sf_dir)
    r = ngram_repetition_stats(docs, "text", "doc_id")
    return r.select(
        "doc_id",
        F.round("top2gram_char_frac", 6).alias("top2gram_char_frac_r6"),
        F.round("dup8gram_char_frac", 6).alias("dup8gram_char_frac_r6"),
    )


def q_sample_hash_split(spark, sf_dir):
    """Deterministic md5 train/dev/test assignment — reshard-stable,
    shuffle-free (the randomSplit replacement at scale)."""
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        hash_split,
    )

    docs = _docs(spark, sf_dir)
    return hash_split(
        docs, {"train": 0.8, "dev": 0.1, "test": 0.1}, id_col="doc_id"
    ).select("doc_id", "split")


def q_sample_stratified(spark, sf_dir):
    """Per-language deterministic stratified sample (hash threshold)."""
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _docs(spark, sf_dir)
    return stratified_sample(
        docs, {"en": 0.5, "de": 0.25}, strata_col="lang", id_col="doc_id"
    ).select("doc_id", "lang")


def q_qs_range_prohibit(spark, sf_dir):
    """Query-string width: range + prohibit operators compiled to one
    Catalyst filter (`field:[a TO b}`, `-field:v`)."""
    from elasticsearch_nlp_classifier_spark.functions import (
        compile_query_string,
    )

    docs = _docs(spark, sf_dir)
    col = compile_query_string(
        "doc_id:[100 TO 300} -lang:en", default_field="text"
    )
    return docs.where(col).select("doc_id", "lang")


def q_fuzzy_bm25(spark, sf_dir):
    """ES fuzziness: vocabulary expansion (levenshtein ≤ 1, capped 50
    by (distance, term)) + the WAND core; same contract in SQL."""
    import tempfile

    import pandas as pd

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.fuzzy import fuzzy_topk

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="fuzzy_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code"
    )
    q = pd.DataFrame({"query_id": [1], "query_text": ["table"]})
    scored = fuzzy_topk(index, q, k=50, max_edits=1,
                        analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_fuzzy_auto(spark, sf_dir):
    """ES fuzziness AUTO: per-token edit allowance from token length
    (of→0, tble→1, dataset→2) — short tokens exact, long ones typo-
    tolerant."""
    import tempfile

    import pandas as pd

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.fuzzy import fuzzy_topk

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="fuzzy_auto_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code"
    )
    q = pd.DataFrame({"query_id": [1], "query_text": ["of tble dataset"]})
    scored = fuzzy_topk(index, q, k=50, max_edits="AUTO",
                        analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_wand_deletes(spark, sf_dir):
    """Tombstoned BM25: delete a fixed id set, WAND must rank live docs
    only while stats stay as-built (Lucene liveDocs contract)."""
    import tempfile

    import pandas as pd

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.index.deletes import delete_docs
    from elasticsearch_nlp_classifier_spark.query.wand import wand_topk

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="del_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code"
    )
    delete_docs(index, docs.where(F.col("doc_id") % 7 == 0)
                .select("doc_id"))
    q = pd.DataFrame({"query_id": [1], "query_text": ["data value table"]})
    scored = wand_topk(index, q, k=50, analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def _physical_index(spark, sf_dir):
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="qix_") + "/idx"
    return build_physical_index(
        docs, out, text_col="text", analyzer="simple_code"
    )


def _rank10(scored):
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_mlt_topk(spark, sf_dir):
    """ES more_like_this: the source doc's top tf·idf terms re-queried
    through WAND, source excluded; full SQL twin in the oracle."""
    from elasticsearch_nlp_classifier_spark.query.mlt import more_like_this

    index = _physical_index(spark, sf_dir)
    out = more_like_this(index, 0, k=10, max_query_terms=10)
    return _rank10(out.select("doc_id", "score"))


def q_prefix_bm25(spark, sf_dir):
    """Lucene prefix query: dictionary expansion (term ASC cap) + WAND."""
    from elasticsearch_nlp_classifier_spark.query.mlt import prefix_topk

    index = _physical_index(spark, sf_dir)
    return _rank10(prefix_topk(index, "tab", k=50).select("doc_id", "score"))


def q_suggest_terms(spark, sf_dir):
    """ES term suggester: levenshtein candidates ranked
    (dist ASC, df DESC, term ASC)."""
    from elasticsearch_nlp_classifier_spark.query.mlt import suggest_terms

    index = _physical_index(spark, sf_dir)
    return suggest_terms(index, "dat", n=5).select(
        "term", F.col("dist").cast("bigint").alias("dist"),
        F.col("df").cast("bigint").alias("df"),
    )


def q_agg_terms(spark, sf_dir):
    """ES terms agg: top buckets by doc_count (tie → key asc)."""
    from elasticsearch_nlp_classifier_spark.query import terms_agg

    return terms_agg(_docs(spark, sf_dir), "lang", size=5)


def q_agg_histogram(spark, sf_dir):
    """ES histogram agg: fixed-interval numeric buckets."""
    from elasticsearch_nlp_classifier_spark.query import histogram_agg

    return histogram_agg(_docs(spark, sf_dir), "n_chars", 100.0)


def q_agg_pipeline(spark, sf_dir):
    """ES pipeline aggs over a date_histogram parent: derivative,
    cumulative_sum, moving_avg(3) and serial_diff(2) — all windows over
    the BUCKET table (O(buckets) state; the corpus reduction happened in
    the parent agg).  Reference surface: the stock RestHighLevelClient
    exposes the full pipeline-agg family next to the bucket aggs this
    module already covers."""
    from elasticsearch_nlp_classifier_spark.query import (
        cumulative_sum_agg, date_histogram_agg, derivative_agg,
        moving_avg_agg, serial_diff_agg,
    )

    buckets = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    out = serial_diff_agg(
        moving_avg_agg(
            cumulative_sum_agg(derivative_agg(buckets)), window=3
        ),
        lag=2,
    )
    return out.select(
        F.unix_timestamp("key_ts").cast("bigint").alias("key_epoch"),
        "doc_count",
        F.round("derivative", 6).alias("derivative"),
        F.round("cumulative_sum", 6).alias("cumulative_sum"),
        F.round("moving_avg", 6).alias("moving_avg"),
        F.round("serial_diff", 6).alias("serial_diff"),
    )


def q_agg_bucket_stats(spark, sf_dir):
    """ES sibling-bucket pipeline aggs: stats_bucket over the hourly
    date_histogram plus the max_bucket/min_bucket keys, emitted as one
    row for the cross-engine hash."""
    from elasticsearch_nlp_classifier_spark.query import (
        date_histogram_agg, max_bucket_agg, min_bucket_agg,
        stats_bucket_agg,
    )

    buckets = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    buckets = buckets.cache()
    stats = stats_bucket_agg(buckets)
    mx = max_bucket_agg(buckets).agg(
        F.min(F.unix_timestamp("key")).cast("bigint").alias("max_key"),
        F.min("value").alias("max_value"),
    )
    mn = min_bucket_agg(buckets).agg(
        F.min(F.unix_timestamp("key")).cast("bigint").alias("min_key"),
        F.min("value").alias("min_value"),
    )
    return stats.crossJoin(mx).crossJoin(mn).select(
        "count", "min", "max",
        F.round("avg", 6).alias("avg"), "sum",
        "max_key", "max_value", "min_key", "min_value",
    )


def q_heavy_hitters(spark, sf_dir):
    """Exact top-k frequency WITHOUT a raw-key shuffle: per-partition
    local candidates + one filtered exact count (the CMS/Misra-Gries
    candidate pattern; the count-min sketch itself is pytest-gated —
    linearity + one-sided-error bound)."""
    from elasticsearch_nlp_classifier_spark.operators import (
        heavy_hitters,
    )

    return heavy_hitters(_docs(spark, sf_dir), "lang", k=5)


def q_asof_join(spark, sf_dir):
    """As-of join (kdb aj / DuckDB ASOF JOIN / Flink temporal join):
    each click event joined to the user's latest view event at-or-
    before it.  Cogrouped pandas merge_asof per user key; the oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from elasticsearch_nlp_classifier_spark.operators import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "ts", "user_id", F.col("event_id").alias("view_event"),
    )
    out = asof_join(clicks, views, "ts", by="user_id",
                    right_cols=["view_event"])
    return out.select("event_id", "user_id",
                      F.col("r_view_event").alias("view_event"))


def q_range_join(spark, sf_dir):
    """Interval containment join via the binning rewrite: click events
    inside [view.ts, view.ts + 30 min) windows of the same user.
    Exact for any bin width (pytest-pinned); the oracle is the plain
    inequality join."""
    from elasticsearch_nlp_classifier_spark.operators import range_join

    ev = _events(spark, sf_dir)
    pts = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    iv = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
        "user_id",
    )
    out = range_join(pts, iv, "ts", "start", "end", by="user_id",
                     bin_seconds=900)
    return out.select("event_id", "user_id",
                      F.col("iv_view_event").alias("view_event"))


def q_rollup_query(spark, sf_dir):
    """ES _rollup analog: events pre-aggregated to hourly partials
    (count/sum/min/max per metric), then a DAY histogram by event_type
    answered entirely FROM the rollup — exact vs the direct aggregation
    the oracle runs on raw events, because the stored partials are
    mergeable and day boundaries align to hour buckets."""
    from elasticsearch_nlp_classifier_spark.query import (
        build_rollup, rollup_query,
    )

    ev = _events(spark, sf_dir).withColumn(
        # 2-decimal metric → exact integer cents, so the two-level
        # partial merge is bit-identical to the oracle's direct sum
        # (float addition order would otherwise flip the last ulp)
        "value_c", F.round(F.col("value") * 100).cast("bigint")
    )
    ru = build_rollup(ev, "ts", dims=["event_type"],
                      metrics=["value_c"], unit="hour")
    out = rollup_query(ru, unit="day", rollup_unit="hour",
                       dims=["event_type"], metrics=["value_c"])
    return out.select(
        F.unix_timestamp("key_ts").cast("bigint").alias("key_epoch"),
        "event_type", "doc_count",
        F.col("value_c_sum").cast("bigint").alias("value_sum_c"),
        F.col("value_c_min").cast("bigint").alias("value_min_c"),
        F.col("value_c_max").cast("bigint").alias("value_max_c"),
        F.col("value_c_count").cast("bigint").alias("value_count"),
        F.round("value_c_avg", 6).alias("value_avg_c"),
    )


def q_agg_metrics_extras(spark, sf_dir):
    """ES weighted_avg + top_metrics + median_absolute_deviation (exact
    percentile form) over events, emitted as one row."""
    from elasticsearch_nlp_classifier_spark.query import (
        median_absolute_deviation_agg, top_metrics_agg,
        weighted_avg_agg,
    )

    ev = _events(spark, sf_dir)
    wa = weighted_avg_agg(ev, "value", "user_id")
    tm = top_metrics_agg(ev, "user_id", "value", size=1).select(
        F.col("sort").alias("top_sort"),
        F.col("metric").cast("bigint").alias("top_metric"),
    )
    mad = median_absolute_deviation_agg(ev, "value")
    return (
        wa.crossJoin(tm).crossJoin(mad)
        .select(F.round("weighted_avg", 6).alias("weighted_avg"),
                F.round("top_sort", 6).alias("top_sort"), "top_metric",
                F.round("mad", 6).alias("mad"))
    )


def q_agg_rare_terms(spark, sf_dir):
    """ES rare_terms: the doc_count<=1 long tail of n_chars values."""
    from elasticsearch_nlp_classifier_spark.query import rare_terms_agg

    return rare_terms_agg(_docs(spark, sf_dir), "n_chars",
                          max_doc_count=1)


def q_agg_multi_terms(spark, sf_dir):
    """ES multi_terms: composite (lang, source) buckets, top 10 by
    doc_count with full key tie-break (deterministic page)."""
    from elasticsearch_nlp_classifier_spark.query import multi_terms_agg

    return multi_terms_agg(_docs(spark, sf_dir), ["lang", "source"],
                           size=10)


def q_agg_adjacency(spark, sf_dir):
    """ES adjacency_matrix over three named filters: singles + pairwise
    intersections in one scan, empty buckets dropped."""
    from elasticsearch_nlp_classifier_spark.query import (
        adjacency_matrix_agg,
    )

    docs = _docs(spark, sf_dir)
    return adjacency_matrix_agg(docs, {
        "short": F.col("n_chars") < 200,
        "long": F.col("n_chars") >= 400,
        "en": F.col("lang") == "en",
    })


def q_agg_auto_date_histogram(spark, sf_dir):
    """ES auto_date_histogram: coarsest calendar interval from the ES
    ladder fitting 10 buckets, chosen by a min/max probe then one
    date_trunc agg."""
    from elasticsearch_nlp_classifier_spark.query import (
        auto_date_histogram_agg,
    )

    out = auto_date_histogram_agg(_events(spark, sf_dir), "ts",
                                  target_buckets=10)
    return out.select(
        F.unix_timestamp("key_ts").cast("bigint").alias("key_epoch"),
        "doc_count", "interval",
    )


def q_agg_date_histogram(spark, sf_dir):
    """ES date_histogram agg (calendar hour buckets); key emitted as
    epoch seconds for the cross-engine hash."""
    from elasticsearch_nlp_classifier_spark.query import (
        date_histogram_agg,
    )

    out = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    return out.select(
        F.unix_timestamp("key_ts").cast("bigint").alias("key_epoch"),
        "doc_count",
    )


def q_agg_range(spark, sf_dir):
    """ES range agg: half-open [from, to) buckets, one scan."""
    from elasticsearch_nlp_classifier_spark.query import range_agg

    return range_agg(_docs(spark, sf_dir), "n_chars",
                     [(None, 100.0), (100.0, 300.0), (300.0, None)])


def q_agg_extended_stats(spark, sf_dir):
    """ES extended_stats: count/min/max/avg/sum + population moments."""
    from elasticsearch_nlp_classifier_spark.query import (
        extended_stats_agg,
    )

    out = extended_stats_agg(_events(spark, sf_dir), "value")
    # corpus-wide float sums round at 4 (not 6): the distributed
    # summation order costs ~1e-7 relative vs the oracle's serial sum
    return out.select(
        "count", F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"), F.round("avg", 4).alias("avg"),
        F.round("sum", 2).alias("sum"),
        F.round("sum_of_squares", 1).alias("sum_of_squares"),
        F.round("variance", 4).alias("variance"),
        F.round("std_deviation", 4).alias("std_deviation"),
    )


def q_agg_percentiles(spark, sf_dir):
    """ES percentiles (exact path — linear interpolation, the same
    estimator as the oracle's quantile_cont; the approx/t-digest path
    is pytest-bounded against this one)."""
    from elasticsearch_nlp_classifier_spark.query import percentiles_agg

    out = percentiles_agg(_events(spark, sf_dir), "value",
                          percents=(5.0, 50.0, 95.0))
    return out.select("percent", F.round("value", 4).alias("value"))


def q_agg_cardinality(spark, sf_dir):
    """ES cardinality agg (exact path for the oracle; the HLL++ sketch
    path is pytest-bounded within 5% of this)."""
    from elasticsearch_nlp_classifier_spark.query import cardinality_agg

    return cardinality_agg(_events(spark, sf_dir), "user_id", exact=True)


def q_agg_top_hits(spark, sf_dir):
    """ES top_hits sub-agg: top-2 docs per lang bucket by n_chars."""
    from elasticsearch_nlp_classifier_spark.query import top_hits_agg

    return top_hits_agg(_docs(spark, sf_dir), "lang", "n_chars", size=2)


def q_agg_significant_terms(spark, sf_dir):
    """ES significant_terms with the JLH score over the en-language
    foreground vs the whole-corpus background."""
    from elasticsearch_nlp_classifier_spark.query import (
        significant_terms,
    )

    docs = _docs(spark, sf_dir)
    idx = _logical_index(spark, sf_dir)
    fg = docs.where(F.col("lang") == "en").select("doc_id")
    return significant_terms(fg, idx.postings, size=10)


def q_agg_significant_chi_square(spark, sf_dir):
    """significant_terms with the chi_square heuristic (ES's
    alternative significance score) — same foreground as the JLH
    entry."""
    from elasticsearch_nlp_classifier_spark.query import (
        significant_terms,
    )

    docs = _docs(spark, sf_dir)
    idx = _logical_index(spark, sf_dir)
    fg = docs.where(F.col("lang") == "en").select("doc_id")
    return significant_terms(fg, idx.postings, size=10,
                             heuristic="chi_square")


def q_agg_significant_gnd(spark, sf_dir):
    """significant_terms with the Google-normalized-distance
    heuristic."""
    from elasticsearch_nlp_classifier_spark.query import (
        significant_terms,
    )

    docs = _docs(spark, sf_dir)
    idx = _logical_index(spark, sf_dir)
    fg = docs.where(F.col("lang") == "en").select("doc_id")
    return significant_terms(fg, idx.postings, size=10,
                             heuristic="gnd")


def _graph_parts(spark, sf_dir):
    from elasticsearch_nlp_classifier_spark.query import graph_explore

    docs = _docs(spark, sf_dir)
    idx = _logical_index(spark, sf_dir)
    n_docs = docs.select("doc_id").distinct().count()
    return graph_explore(
        idx.postings, idx.term_stats, n_docs,
        seed_terms=["data"], hops=1, vertices_per_hop=5,
        min_doc_count=2,
    )


def q_graph_explore_vertices(spark, sf_dir):
    """ES _graph/explore: one significance wave out from seed term
    'data' — top-5 JLH-scored co-occurring vertices."""
    verts, _ = _graph_parts(spark, sf_dir)
    return verts


def q_graph_explore_edges(spark, sf_dir):
    """ES _graph/explore: doc-overlap edges seed→wave-1 vertices."""
    _, edges = _graph_parts(spark, sf_dir)
    return edges


def q_ml_outlier_detection(spark, sf_dir):
    """ES data-frame-analytics outlier_detection: per-row kNN ensemble
    (kth-NN dist, mean kNN dist, LOF, LDOF, min-max ensemble score)
    over the embeddings table — exact kNN baseline (the IVF approximate
    path is the scale route, pinned by recall tests)."""
    from elasticsearch_nlp_classifier_spark.operators import (
        outlier_scores,
    )

    return outlier_scores(_emb(spark, sf_dir), k=5)


def q_ml_anomaly_count(spark, sf_dir):
    """ES ML anomaly detection, count detector split by event_type:
    hourly buckets (dense zero-fill), robust median/MAD baseline,
    0-100 record scores."""
    from elasticsearch_nlp_classifier_spark.operators import (
        anomaly_detect,
    )

    return anomaly_detect(
        _events(spark, sf_dir), detector="count",
        by_field="event_type", bucket_span_s=3600,
    )


def q_ml_regression_simple(spark, sf_dir):
    """ES data-frame-analytics regression (linear analog), simple
    closed form: value ~ user_id over events — one aggregation,
    slope/intercept/r2 twin of DuckDB's regr_* functions."""
    from elasticsearch_nlp_classifier_spark.operators import fit_simple

    return fit_simple(_events(spark, sf_dir), "user_id", "value")


def q_rank_vectors_maxsim(spark, sf_dir):
    """ES 8.16 rank_vectors (ColBERT late interaction): per-doc
    multi-vectors (embedding split into 8 chunks), maxSimDotProduct
    top-5 per query — pure nested-HOF Catalyst expression."""
    from elasticsearch_nlp_classifier_spark.query import (
        maxsim_topk,
        split_vectors,
    )

    mv = split_vectors(_emb(spark, sf_dir), "embedding", 8).select(
        "vec_id", "vecs"
    )
    queries = mv.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("vecs").alias("qvecs")
    )
    return maxsim_topk(mv, queries, k=5, id_col="vec_id")


def q_span_near(spark, sf_dir):
    """Lucene ordered SpanNearQuery: terms in order within a slop
    window over the positional block index."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import span_near

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="span_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True,
    )
    return span_near(index, "data value", slop=2, analyzer="simple_code")


def q_percolate(spark, sf_dir):
    """ES percolator: stored queries matched against every document
    (broadcast reverse-index join, one aggregation)."""
    from elasticsearch_nlp_classifier_spark.query import (
        percolate,
        register_queries,
    )

    docs = _docs(spark, sf_dir)
    reg = register_queries(
        spark,
        [(1, "data value"), (2, "table"), (3, "data data")],
        analyzer="simple_code", operator="and",
    )
    return percolate(docs, reg, analyzer="simple_code")


def q_percolate_scored(spark, sf_dir):
    """Scored percolation: matching stored queries ranked per doc by
    the BM25 contract against the corpus stats."""
    from elasticsearch_nlp_classifier_spark.query import (
        percolate_scored,
        register_queries,
    )

    docs = _docs(spark, sf_dir)
    idx = _logical_index(spark, sf_dir)
    reg = register_queries(
        spark,
        [(1, "data value"), (2, "table"), (3, "data data")],
        analyzer="simple_code", operator="and",
    )
    out = percolate_scored(docs, reg, idx, analyzer="simple_code")
    return out.select("doc_id", "query_id", "matched_terms",
                      F.round("score", 6).alias("score_r6"))


def q_pii_stats(spark, sf_dir):
    """PII detection counts over docs with deterministically planted
    emails/IPs/phones (JVM regexp_count; oracle runs the identical
    RE2-safe patterns)."""
    from elasticsearch_nlp_classifier_spark.operators import pii_stats

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" mail me: user@example.com"))
            .when(F.col("doc_id") % 3 == 1,
                  F.lit(" host 10.1.2.3 up"))
            .otherwise(F.lit(" call 555-123-4567 or +4915112345678")),
        ),
    )
    return pii_stats(docs)


def q_pii_redact(spark, sf_dir):
    """PII redaction: masked text with type tokens, chained
    regexp_replace (oracle: DuckDB regexp_replace with 'g')."""
    from elasticsearch_nlp_classifier_spark.operators import redact_pii

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" mail me: user@example.com"))
            .when(F.col("doc_id") % 3 == 1,
                  F.lit(" host 10.1.2.3 up"))
            .otherwise(F.lit(" call 555-123-4567 or +4915112345678")),
        ),
    )
    return redact_pii(docs).select(
        F.col("doc_id").alias("id"), F.col("text").alias("redacted")
    )


def q_dedup_paragraphs(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (boilerplate removal):
    every doc gets a shared HEADER/FOOTER paragraph planted; only the
    globally-first occurrence of each distinct paragraph survives."""
    from elasticsearch_nlp_classifier_spark.operators import (
        dedup_paragraphs,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat_ws("\n\n", F.lit("SHARED HEADER"), F.col("text"),
                    F.lit("SHARED FOOTER")),
    )
    return dedup_paragraphs(docs)


def q_bool_query(spark, sf_dir):
    """ES bool query, ranked: scored must + boosted should, single
    broadcast clause join + one aggregation."""
    from elasticsearch_nlp_classifier_spark.query import bool_query_topk

    idx = _logical_index(spark, sf_dir)
    out = bool_query_topk(
        idx, must=["data"], should=[("value", 2.0)],
        analyzer="simple_code", k=10,
    )
    return out.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))


def q_highlight(spark, sf_dir):
    """ES highlighting: one fragment around the first match, terms
    wrapped in <em> tags (pure JVM expressions)."""
    from elasticsearch_nlp_classifier_spark.query import highlight

    docs = _docs(spark, sf_dir)
    return highlight(
        docs, "data value", analyzer="simple_code",
        fragment_size=150, lead=40,
    ).select("doc_id", "highlight")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic near-dup pairs: k-means-cell-restricted
    exact cosine (cost Σ|cell|², never n²).  Centroid training is
    seeded numpy iteration (not SQL-expressible), so the cell
    assignment is MATERIALIZED and the oracle re-derives the
    within-cell pairs + exact cosine independently in SQL."""
    from elasticsearch_nlp_classifier_spark.operators import (
        semantic_dedup_pairs,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        ivf_assign,
        ivf_train_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = ivf_train_centroids(emb, dim=64, n_cells=8, iters=3)
    ivf_assign(emb, cents, "embedding").select(
        "vec_id", "cid"
    ).write.mode("overwrite").parquet(
        f"{_oracle_scratch()}/semdedup_cells.parquet"
    )
    pairs = semantic_dedup_pairs(emb, cents, threshold=0.4)
    return pairs.select(
        "id_a", "id_b", F.round("cos", 6).alias("cos_r6")
    )


def q_collapse(spark, sf_dir):
    """ES field collapsing: best hit per lang bucket, global top-3."""
    from elasticsearch_nlp_classifier_spark.query import collapse_topk

    return collapse_topk(_docs(spark, sf_dir), "lang", "n_chars", k=3)


def q_collapse_inner(spark, sf_dir):
    """ES field collapsing with inner_hits: top-3 lang groups, each
    carrying its own top-2 hits; one window pass, corpus scanned once.
    inner_hits serialize to an ordered `id:sort_value|...` string so
    the independent engines compare the nested payload exactly."""
    from elasticsearch_nlp_classifier_spark.query import collapse_inner_hits

    out = collapse_inner_hits(_docs(spark, sf_dir), "lang", "n_chars",
                              k=3, inner_size=2)
    inner = F.array_join(
        F.transform(
            "inner_hits",
            lambda s: F.concat_ws(
                ":", s["id"].cast("string"),
                s["sort_value"].cast("string")),
        ), "|")
    return out.select("rank", "key", "id", "sort_value",
                      inner.alias("inner_hits_s"))


def q_search_after(spark, sf_dir):
    """ES search_after keyset pagination: page 2 (rows 11-20) of the
    (n_chars desc, doc_id asc) order — cursor filter, no offset scan.
    The oracle's OFFSET form is the semantic twin at page depth 1."""
    from elasticsearch_nlp_classifier_spark.query import search_after

    hits = _docs(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    p1 = search_after(hits, None, "score", "doc_id", size=10).collect()
    cursor = (p1[-1]["sort_value"], p1[-1]["id"])
    return search_after(hits, cursor, "score", "doc_id", size=10)


def q_composite_agg(spark, sf_dir):
    """ES composite agg: page 2 of (event_type, user_id) buckets in
    key order via the after-key cursor."""
    from elasticsearch_nlp_classifier_spark.query import composite_agg

    ev = _events(spark, sf_dir)
    p1 = composite_agg(ev, ["event_type", "user_id"], size=10).collect()
    after = (p1[-1]["event_type"], p1[-1]["user_id"])
    return composite_agg(ev, ["event_type", "user_id"], size=10,
                         after=after)


def q_doc_chunks(spark, sf_dir):
    """LLM-pipeline chunking: overlapping 32-token windows (stride 28)
    over whitespace tokens — pure JVM sequence/posexplode/slice."""
    from elasticsearch_nlp_classifier_spark.operators import (
        chunk_documents,
    )

    return chunk_documents(_docs(spark, sf_dir), 32, 4)


def q_function_score(spark, sf_dir):
    """ES function_score (field_value_factor, ln1p, boost_mode=sum):
    BM25 relevance blended with a document-length prior."""
    from elasticsearch_nlp_classifier_spark.query import (
        bm25_topk,
        function_score,
    )

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000,
                       analyzer="simple_code").select("doc_id", "score")
    hits = scored.join(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), "doc_id"
    )
    fs = function_score(hits, "n_chars", factor=0.001, modifier="ln1p",
                        boost_mode="sum")
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    return (
        fs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(F.col("rank").cast("bigint").alias("rank"), "doc_id",
                F.round("score", 6).alias("score_r6"))
    )


def q_rescore_phrase(spark, sf_dir):
    """ES rescore: WAND BM25 top-50 window re-scored with exact-phrase
    match counts (1×bm25 + 2×n_matches), re-ranked top-10."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import rescore_phrase

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="rescore_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True,
    )
    res = rescore_phrase(index, "data value", window_size=50, k=10,
                         query_weight=1.0, rescore_weight=2.0,
                         analyzer="simple_code")
    return res.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))


def q_dis_max(spark, sf_dir):
    """ES dis_max over two match sub-queries, tie_breaker=0.3 — one
    postings scan, per-(doc, sub-query) hash agg, max+tie combine."""
    from elasticsearch_nlp_classifier_spark.query import dis_max_topk

    idx = _logical_index(spark, sf_dir)
    res = dis_max_topk(idx, ["data value table", "key hash merge"],
                       tie_breaker=0.3, k=10, analyzer="simple_code")
    return res.select("rank", "doc_id", F.round("score", 6).alias("score_r6"))


def q_multi_match(spark, sf_dir):
    """ES multi_match best_fields over (text, source^2.0) with
    tie_breaker=0.2 — one scan per field index, dis_max combine."""
    from elasticsearch_nlp_classifier_spark.index import build_logical_index
    from elasticsearch_nlp_classifier_spark.query import multi_match_topk

    docs = _docs(spark, sf_dir)
    idx_text = build_logical_index(docs, text_col="text",
                                   analyzer="simple_code",
                                   doc_id_col="doc_id")
    idx_source = build_logical_index(docs, text_col="source",
                                     analyzer="simple_code",
                                     doc_id_col="doc_id")
    res = multi_match_topk(
        {"text": idx_text, "source": idx_source},
        "src7 data value",
        field_boosts={"source": 2.0},
        mode="best_fields", tie_breaker=0.2, k=10, analyzer="simple_code",
    )
    return res.select("rank", "doc_id", F.round("score", 6).alias("score_r6"))


def q_constant_score(spark, sf_dir):
    """ES constant_score: filter-context match, fixed boost score."""
    from elasticsearch_nlp_classifier_spark.query import constant_score_topk

    idx = _logical_index(spark, sf_dir)
    res = constant_score_topk(idx, "data value", boost=1.5, k=10,
                              analyzer="simple_code")
    return res.select("rank", "doc_id", F.round("score", 6).alias("score_r6"))


def q_boosting(spark, sf_dir):
    """ES boosting query: positive match scored, negative matches
    demoted by negative_boost=0.4 (not excluded)."""
    from elasticsearch_nlp_classifier_spark.query import boosting_topk

    idx = _logical_index(spark, sf_dir)
    res = boosting_topk(idx, positive="data value table",
                        negative="slow batch", negative_boost=0.4,
                        k=10, analyzer="simple_code")
    return res.select("rank", "doc_id", F.round("score", 6).alias("score_r6"))


def q_lm_bigram_score(spark, sf_dir):
    """KenLM-style bigram-LM quality scoring (self-trained, add-0.5
    smoothing): per-doc avg log-prob + perplexity — built-ins only,
    two count shuffles + one scoring join."""
    from elasticsearch_nlp_classifier_spark.operators import bigram_logprob

    docs = _docs(spark, sf_dir)
    sc = bigram_logprob(docs, "text", "doc_id", alpha=0.5)
    return sc.select(
        "id",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.round("avg_logp", 6).alias("avg_logp_r6"),
        F.round("ppl", 6).alias("ppl_r6"),
    )


def q_bpe_word_histogram(spark, sf_dir):
    """BPE training's distributed stage: the corpus word histogram (one
    explode + one map-side-combined groupBy).  The driver-side merge
    loop + encode are pytest-gated (iterative, not SQL)."""
    from elasticsearch_nlp_classifier_spark.operators import word_histogram

    docs = _docs(spark, sf_dir)
    return word_histogram(docs, "text").select(
        "word", F.col("c").cast("bigint").alias("c")
    )


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+vector retrieval: BM25 top-50 and cosine top-50
    (query = embedding of vec 0) fused by reciprocal-rank fusion
    (rank_constant 60).  Both input rankings re-ranked on round(·,9)
    for cross-engine stability; fusion is a union of two bounded
    frames + one hash agg."""
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk
    from elasticsearch_nlp_classifier_spark.query import bm25_topk, rrf_fuse

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000, analyzer="simple_code")
    wl = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    lex = (
        scored.withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= 50).select("rank", "doc_id")
    )
    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    # query_id -1 dodges cosine_topk's self-match exclusion so vec 0
    # ranks first (cos = 1), matching the SQL twin
    qdf = spark.createDataFrame(
        [(-1, [float(x) for x in qvec])],
        "query_id bigint, query_vec array<double>",
    )
    cos = cosine_topk(emb, qdf, k=10_000_000)
    wv = Window.orderBy(F.desc(F.round("cos", 9)), F.asc("vec_id"))
    vec = (
        cos.withColumn("rank", F.row_number().over(wv))
        .where(F.col("rank") <= 50)
        .select("rank", F.col("vec_id").alias("doc_id"))
    )
    fused = rrf_fuse([lex, vec], rank_constant=60, k=10)
    return fused.select("rank", "doc_id",
                        F.round("score", 6).alias("score_r6"))


def q_agg_terms_subs(spark, sf_dir):
    """ES terms agg with metric sub-aggregations (one collector pass:
    doc_count + every sub-metric in a single hash aggregation)."""
    from elasticsearch_nlp_classifier_spark.query.aggs import terms_agg_subs

    docs = _docs(spark, sf_dir)
    out = terms_agg_subs(
        docs, "lang",
        {"avg_chars": F.avg("n_chars"), "max_chars": F.max("n_chars")},
        size=10,
    )
    return out.select(
        "key",
        F.col("doc_count").cast("bigint").alias("doc_count"),
        F.round("avg_chars", 6).alias("avg_chars_r6"),
        F.col("max_chars").cast("bigint").alias("max_chars"),
    )


def q_web_clean(spark, sf_dir):
    """Web-text cleaning: docs wrapped in deterministic HTML chrome
    (tags + script + entities + a combining-accent suffix) must come
    back as NFC-normalized visible text.  strip_html is RE2-safe JVM
    regex (replayed verbatim in the oracle); NFC via unicodedata ==
    DuckDB nfc_normalize."""
    from elasticsearch_nlp_classifier_spark.operators import clean_web_docs

    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<div class=x><p>"), F.col("text"),
            F.lit("</p><script>var a=1;</script>&amp; cafe\u0301</div>"),
        ).alias("text"),
    )
    return clean_web_docs(wrapped).select("doc_id", "text")


def q_explain_bm25(spark, sf_dir):
    """ES _explain API: per-term BM25 breakdown for one (query, doc)
    pair, including non-matching clauses (matched=false, null posting
    stats).  Doc filter pushed into the postings scan."""
    from elasticsearch_nlp_classifier_spark.query.bm25 import explain_score

    idx = _logical_index(spark, sf_dir)
    ex = explain_score(idx, "data value zzzunseen", doc_id=5,
                       analyzer="simple_code")
    return ex.select(
        "term", "matched",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("dl").cast("bigint").alias("dl"),
        F.col("df").cast("bigint").alias("df"),
        F.round("idf", 6).alias("idf_r6"),
        F.round("tf_hat", 6).alias("tf_hat_r6"),
        F.round("contrib", 6).alias("contrib_r6"),
    )


def q_synonym_match(spark, sf_dir):
    """Synonym token filter (canonicalize mode, index-time): docs
    matching 'quick' after {fast,slow} => quick rewriting — pure
    higher-order expressions on the token array."""
    from elasticsearch_nlp_classifier_spark.analyzer.synonyms import (
        canonicalize_tokens,
    )
    from elasticsearch_nlp_classifier_spark.operators.textstats import (
        words_col,
    )

    docs = _docs(spark, sf_dir)
    canon = {"fast": "quick", "slow": "quick"}
    toks = canonicalize_tokens(words_col(F.col("text")), canon)
    return docs.where(F.array_contains(toks, "quick")).select("doc_id")


def q_multi_index_bm25(spark, sf_dir):
    """Multi-index search (ES alias over indices): the corpus split
    into two disjoint indexes by doc_id parity, searched through
    union_indexes with MERGED global stats — rank- and score-identical
    to the single-index BM25 (the oracle is the same BM25 SQL)."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index, union_indexes,
    )
    from elasticsearch_nlp_classifier_spark.query import bm25_topk

    docs = _docs(spark, sf_dir)
    ix_even = build_logical_index(docs.where(F.col("doc_id") % 2 == 0),
                                  text_col="text", analyzer="simple_code",
                                  doc_id_col="doc_id")
    ix_odd = build_logical_index(docs.where(F.col("doc_id") % 2 == 1),
                                 text_col="text", analyzer="simple_code",
                                 doc_id_col="doc_id")
    merged = union_indexes([ix_even, ix_odd])
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = bm25_topk(merged, q, k=10_000_000, analyzer="simple_code")
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(F.col("rank").cast("bigint").alias("rank"), "doc_id",
                F.round("score", 6).alias("score_r6"))
    )


def q_phrase_suggest(spark, sf_dir):
    """ES phrase suggester over the corpus bigram LM: candidates from a
    distributed vocabulary scan (levenshtein<=2, top-3 per position),
    phrases re-ranked by start-unigram + bigram LM + per-edit channel
    prior.  Re-ranked on round(score,9) for cross-engine stability."""
    from elasticsearch_nlp_classifier_spark.query import phrase_suggest

    docs = _docs(spark, sf_dir)
    out = phrase_suggest(docs, "valu tabl", max_candidates=3, max_edits=2,
                         k=10_000, alpha=0.5, error_rate=0.2)
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("suggestion"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(F.col("rank").cast("bigint").alias("rank"), "suggestion",
                F.round("score", 6).alias("score_r6"))
    )


def q_resample_mix(spark, sf_dir):
    """Domain-mix resampling to target lang weights {en:.5, fr:.25,
    de:.25} (es/zh dropped): per-group acceptance rates from one tiny
    counts agg, applied as a broadcast join + md5-hash threshold on the
    scan — the corpus never shuffles."""
    from elasticsearch_nlp_classifier_spark.operators import resample_to_mix

    docs = _docs(spark, sf_dir)
    kept = resample_to_mix(
        docs, "lang", {"en": 0.5, "fr": 0.25, "de": 0.25},
        id_col="doc_id", salt="mix",
    )
    return kept.select("doc_id", "lang")


def q_knn_filtered(spark, sf_dir):
    """ES kNN-with-filter: restriction (docs with lang='en') applies
    BEFORE scoring — a semi-join under the top-k, so every result
    matches the filter (never a post-filtered remnant)."""
    from elasticsearch_nlp_classifier_spark.operators import (
        cosine_topk_filtered,
    )

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    allowed = docs.where(F.col("lang") == "en").select("doc_id")
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_filtered(emb, allowed, queries, k=5)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"),
                "vec_id", F.round("cos", 6).alias("cos_r6"))
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C n-gram collision):
    eval set = every 41st document, report per (doc, eval item) word-6-
    gram collisions + coverage fraction.  Broadcast eval shingles; one
    narrow corpus shingle explode — no corpus-sized shuffle."""
    from elasticsearch_nlp_classifier_spark.operators import (
        ngram_contamination,
    )

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % 41 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    rep = ngram_contamination(docs, ev, n=6)
    return rep.select(
        "id", "eval_id",
        F.col("n_collisions").cast("bigint").alias("n_collisions"),
        F.col("eval_ngrams").cast("bigint").alias("eval_ngrams"),
        F.round("overlap_frac", 6).alias("overlap_r6"),
    )


def q_pack_mapping(spark, sf_dir):
    """LLM-training sequence packing map (concat-and-chunk at L=64,
    1 separator slot per doc): (seq_id, id, doc_off, seq_off, n_toks).
    The doc-order prefix-sum runs distributed (range repartition +
    per-partition offsets — no single-task global window); the SQL twin
    is the window form."""
    from elasticsearch_nlp_classifier_spark.operators import pack_mapping

    docs = _docs(spark, sf_dir)
    return pack_mapping(docs, seq_len=64, sep_tokens=1).select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "id",
        F.col("doc_off").cast("bigint").alias("doc_off"),
        F.col("seq_off").cast("bigint").alias("seq_off"),
        F.col("n_toks").cast("bigint").alias("n_toks"),
    )


def q_regexp_bm25(spark, sf_dir):
    """Lucene regexp query: anchored dictionary-probe expansion
    (`term rlike '^(?:pat)$'`, cap 50 by term ASC) + the WAND core —
    same family as prefix/wildcard (`RestHighLevelClient` surface,
    `utils/elasticsearch/ElasticsearchService.java`)."""
    from elasticsearch_nlp_classifier_spark.query.mlt import regexp_topk

    index = _physical_index(spark, sf_dir)
    return _rank10(
        regexp_topk(index, "dat[a-z]*", k=50).select("doc_id", "score")
    )


def q_suggest_completion(spark, sf_dir):
    """ES completion suggester: prefix-matched vocabulary ranked by
    weight (df) DESC, term ASC — dictionary-only probe."""
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        completion_suggest,
    )

    index = _physical_index(spark, sf_dir)
    return completion_suggest(index, "s", n=5)


def q_match_phrase_prefix(spark, sf_dir):
    """ES match_phrase_prefix: exact slots + last-token prefix
    expansion (cap 50 by term ASC), adjacency over positional
    postings; n_matches counts distinct valid starts."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.phrase import (
        match_phrase_prefix,
    )

    docs = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="mpp_ix_") + "/idx"
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True,
    )
    return match_phrase_prefix(index, "data val", analyzer="simple_code")


def q_match_bool_prefix(spark, sf_dir):
    """ES match_bool_prefix: bool-should of the analyzed tokens, last
    token expanded as a prefix (cap 50 by term ASC) — pure OR scoring
    through the shared WAND core."""
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        match_bool_prefix_topk,
    )

    index = _physical_index(spark, sf_dir)
    out = match_bool_prefix_topk(
        index, "data val", k=50, analyzer="simple_code"
    )
    return _rank10(out.select("doc_id", "score"))


def q_rank_feature(spark, sf_dir):
    """ES rank_feature inside a bool query: BM25(match) + boost *
    saturation(n_chars) with the default exact-geometric-mean pivot."""
    from elasticsearch_nlp_classifier_spark.query.features import (
        bool_rank_feature_topk,
    )

    index = _logical_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = bool_rank_feature_topk(
        index, docs, "data value table", "n_chars",
        k=50, analyzer="simple_code",
    )
    return _rank10(out.select("doc_id", "score"))


def q_distance_feature(spark, sf_dir):
    """ES distance_feature: boost * pivot / (pivot + |value-origin|)."""
    from elasticsearch_nlp_classifier_spark.query.features import (
        distance_feature_topk,
    )

    docs = _docs(spark, sf_dir)
    out = distance_feature_topk(
        docs, F.col("n_chars"), origin=300.0, pivot=50.0, k=50
    )
    return _rank10(out.select("doc_id", "score"))


def q_pinned_query(spark, sf_dir):
    """ES pinned query: listed ids first in list order (missing ids
    dropped), organic BM25 follows with pins removed."""
    from elasticsearch_nlp_classifier_spark.query.features import (
        pinned_topk,
    )

    index = _logical_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = pinned_topk(
        index, "data value table", [7, 3, 999_999], k=10,
        analyzer="simple_code", corpus_ids=docs.select("doc_id"),
    )
    return out.select(
        "rank", "doc_id", "pinned", F.round("score", 6).alias("score_r6")
    )


def q_script_score(spark, sf_dir):
    """ES script_score: _score replaced by
    ln(1+_score) * (1 + doc.n_chars/1000)."""
    from elasticsearch_nlp_classifier_spark.query.features import (
        script_score_topk,
    )

    index = _logical_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = script_score_topk(
        index, "data value table", docs.select("doc_id", "n_chars"),
        lambda s: F.log1p(s)
        * (F.lit(1.0) + F.col("f_n_chars") / F.lit(1000.0)),
        k=50, analyzer="simple_code",
    )
    return _rank10(out.select("doc_id", "score"))


def q_combined_fields(spark, sf_dir):
    """ES combined_fields: term-centric BM25F-lite over text (w=1) and
    source (w=2) merged into one synthetic field."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.features import (
        combined_fields_topk,
    )

    docs = _docs(spark, sf_dir)
    fi = {
        "text": build_logical_index(
            docs, text_col="text", analyzer="simple_code",
            doc_id_col="doc_id",
        ),
        "source": build_logical_index(
            docs, text_col="source", analyzer="simple_code",
            doc_id_col="doc_id",
        ),
    }
    out = combined_fields_topk(
        fi, "data value src3", weights={"source": 2.0},
        k=50, analyzer="simple_code",
    )
    return _rank10(out.select("doc_id", "score"))


def q_decay_score(spark, sf_dir):
    """ES function_score gauss decay (origin/scale/decay reference
    math) composed over BM25 hits — decay value from n_chars."""
    from elasticsearch_nlp_classifier_spark.query import bm25_topk
    from elasticsearch_nlp_classifier_spark.query.rescore import decay_score

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000, analyzer="simple_code")
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    hits = scored.join(docs, "doc_id")
    decayed = decay_score(
        hits, "n_chars", origin=200.0, scale=100.0, decay=0.5, fn="gauss"
    )
    return _rank10(decayed.select("doc_id", "score"))


def q_random_score(spark, sf_dir):
    """ES function_score random_score: deterministic per-doc
    uniform-[0,1) (seeded md5) added to the BM25 score — reproducible
    across engines, so the oracle recomputes it exactly."""
    from elasticsearch_nlp_classifier_spark.query import bm25_topk
    from elasticsearch_nlp_classifier_spark.query.rescore import random_score

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = bm25_topk(idx, q, k=10_000_000, analyzer="simple_code")
    rnd = random_score(scored, seed="rs", boost_mode="sum")
    return _rank10(rnd.select("doc_id", "score"))


def q_msearch(spark, sf_dir):
    """ES _msearch: one batched WAND pass over N independent queries —
    per-query top-10, one index scan for the whole batch."""
    import pandas as pd

    from elasticsearch_nlp_classifier_spark.query.wand import wand_topk

    index = _physical_index(spark, sf_dir)
    q = pd.DataFrame({
        "query_id": [1, 2],
        "query_text": ["data value table", "hash join merge"],
    })
    scored = wand_topk(index, q, k=50, analyzer="simple_code")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank2", F.row_number().over(w))
        .where(F.col("rank2") <= 10)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("rank2").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_agg_date_range(spark, sf_dir):
    """ES date_range agg: half-open ISO-bounded buckets over events.ts."""
    from elasticsearch_nlp_classifier_spark.query import date_range_agg

    return date_range_agg(
        _events(spark, sf_dir), "ts",
        [(None, "2024-01-10 00:00:00"),
         ("2024-01-10 00:00:00", "2024-01-20 00:00:00"),
         ("2024-01-20 00:00:00", None)],
    )


def q_agg_filters(spark, sf_dir):
    """ES filters agg: named predicate buckets in one sum(CASE) scan."""
    from elasticsearch_nlp_classifier_spark.query import filters_agg

    docs = _docs(spark, sf_dir)
    return filters_agg(docs, {
        "short": F.col("n_chars") < 100,
        "en": F.col("lang") == "en",
        "long_de": (F.col("n_chars") >= 300) & (F.col("lang") == "de"),
    })


def q_agg_missing(spark, sf_dir):
    """ES missing + value_count aggs over a field with planted nulls
    (doc_id % 7 == 0 → null, declared identically in the oracle)."""
    from elasticsearch_nlp_classifier_spark.query import (
        missing_agg,
        value_count_agg,
    )

    d = _docs(spark, sf_dir).withColumn(
        "kw",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    return missing_agg(d, "kw").crossJoin(value_count_agg(d, "kw"))


def q_domain_stats(spark, sf_dir):
    """Per-domain census over synthesized URLs (domain extracted by the
    RE2-safe host regex — the pipeline's cheapest curation key)."""
    from elasticsearch_nlp_classifier_spark.operators.domains import (
        domain_stats,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "url",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/docs/"),
                 F.col("doc_id").cast("string")),
    )
    return domain_stats(docs, "url", size_col="n_chars")


def q_domain_quota(spark, sf_dir):
    """Blocklist filter + per-domain quota (deterministic hash rank,
    cap 10/domain) — the domain-curation pair every web pipeline runs
    before content-level work."""
    from elasticsearch_nlp_classifier_spark.operators.domains import (
        domain_quota,
        filter_blocked_domains,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "url",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/docs/"),
                 F.col("doc_id").cast("string")),
    )
    kept = filter_blocked_domains(
        docs, "url",
        ["src1.example.com", "src3.example.com"],
    )
    return domain_quota(kept, "url", 10, id_col="doc_id").select("doc_id")


def q_dedup_spans(spark, sf_dir):
    """Exact repeated-substring (token 5-gram) span detection with
    keep-first semantics and per-doc interval merge — the span-level
    dedup from Lee et al. 2022, fixed-k approximation."""
    from elasticsearch_nlp_classifier_spark.operators.dedup import (
        repeated_kgram_spans,
    )

    docs = _docs_with_dups(spark, sf_dir)
    out = repeated_kgram_spans(docs, "text", "doc_id", k=5)
    return out.select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
    )


def q_agg_sampler(spark, sf_dir):
    """ES sampler bucket agg: deterministic top-`shard_size` sample by a
    sort field (tie → doc_id asc); sub-aggs run on the sample."""
    from elasticsearch_nlp_classifier_spark.query import sampler_agg

    return sampler_agg(
        _docs(spark, sf_dir), 20, "n_chars", id_col="doc_id"
    ).select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


def q_agg_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: sampler with at most `max_docs_per_value`
    docs per diversify-field value (de-biases a dominant lang)."""
    from elasticsearch_nlp_classifier_spark.query import (
        diversified_sampler_agg,
    )

    return diversified_sampler_agg(
        _docs(spark, sf_dir), 20, "n_chars", "lang",
        max_docs_per_value=2, id_col="doc_id",
    ).select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


def q_reindex_subset(spark, sf_dir):
    """ES `_reindex` with a source query: rebuild the index from the
    docs table restricted to `n_chars >= 200`; term_stats of the new
    index must equal direct tokenization of the filtered corpus."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index import reindex

    out = tempfile.mkdtemp(prefix="reix_") + "/idx"
    ix = reindex(
        _docs(spark, sf_dir), out,
        query=F.col("n_chars") >= 200,
        text_col="text", analyzer="simple_code",
    )
    return ix.term_stats.select(
        "term",
        F.col("df").cast("bigint").alias("df"),
        F.col("ttf").cast("bigint").alias("ttf"),
    )


def q_terms_set(spark, sf_dir):
    """ES ``terms_set`` query: docs where at least 2 of the 3 given
    terms occur (distinct-matched-terms count, ES semantics)."""
    from elasticsearch_nlp_classifier_spark.functions import terms_set_query
    from elasticsearch_nlp_classifier_spark.index import tokenize_docs

    tok = tokenize_docs(_docs(spark, sf_dir), "text", "simple_code",
                        "doc_id")
    return tok.where(
        terms_set_query(F.col("tokens"), ["data", "value", "table"], 2)
    ).select("doc_id")


def q_rank_eval(spark, sf_dir):
    """ES ``_rank_eval``: precision@k / recall@k / MRR / nDCG@k per
    query over a deterministic ranked-results + graded-judgments pair
    derived from the documents table (query = lang, ranking = n_chars
    desc, grade = doc_id % 4)."""
    from elasticsearch_nlp_classifier_spark.query import rank_eval

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    results = (
        docs.select(
            F.col("lang").alias("query_id"),
            "doc_id",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 10)
    )
    judgments = docs.select(
        F.col("lang").alias("query_id"),
        "doc_id",
        (F.col("doc_id") % 4).cast("double").alias("grade"),
    )
    return rank_eval(results, judgments, k=10)



_POS_IX_CACHE: dict = {}


def _pos_physical_index(spark, sf_dir):
    """Positional physical index over documents, built once per
    (session, sf_dir) — the span/intervals family shares it."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )

    key = (id(spark), sf_dir)
    if key not in _POS_IX_CACHE:
        out = tempfile.mkdtemp(prefix="spanfam_ix_") + "/idx"
        _POS_IX_CACHE[key] = build_physical_index(
            _docs(spark, sf_dir), out, text_col="text",
            analyzer="simple_code", with_positions=True,
        )
    return _POS_IX_CACHE[key]


def q_span_or(spark, sf_dir):
    """Lucene SpanOrQuery: union of term-span occurrences per doc."""
    from elasticsearch_nlp_classifier_spark.query import span_or

    ix = _pos_physical_index(spark, sf_dir)
    return span_or(ix, ["data", "value"], analyzer="simple_code")


def q_span_first(spark, sf_dir):
    """Lucene SpanFirstQuery: 'data' spans ending within the first 3
    positions."""
    from elasticsearch_nlp_classifier_spark.query import span_first

    ix = _pos_physical_index(spark, sf_dir)
    return span_first(ix, "data", end=3, analyzer="simple_code")


def q_span_not(spark, sf_dir):
    """Lucene SpanNotQuery: 'data' occurrences with no 'table' within
    1 position before/after."""
    from elasticsearch_nlp_classifier_spark.query import span_not

    ix = _pos_physical_index(spark, sf_dir)
    return span_not(ix, "data", "table", pre=1, post=1,
                    analyzer="simple_code")


def q_intervals_unordered(spark, sf_dir):
    """ES intervals query (match rule, unordered, max_gaps=2): both
    terms within a window of at most 2 extra positions."""
    from elasticsearch_nlp_classifier_spark.query import intervals_match

    ix = _pos_physical_index(spark, sf_dir)
    return intervals_match(ix, "table value", max_gaps=2, ordered=False,
                           analyzer="simple_code")


def q_span_containing(spark, sf_dir):
    """Lucene SpanContainingQuery: ordered (data .. value, slop<=2)
    spans that contain a 'table' occurrence.  Big spans enumerate
    greedy-minimally per anchor (query/spans.py:span_containing)."""
    from elasticsearch_nlp_classifier_spark.query import span_containing

    ix = _pos_physical_index(spark, sf_dir)
    return span_containing(ix, ("data", "value", 2), "table",
                           analyzer="simple_code")


def q_span_within(spark, sf_dir):
    """Lucene SpanWithinQuery: 'table' occurrences inside an ordered
    (data .. value, slop<=3) span."""
    from elasticsearch_nlp_classifier_spark.query import span_within

    ix = _pos_physical_index(spark, sf_dir)
    return span_within(ix, "table", ("data", "value", 3),
                       analyzer="simple_code")


def q_span_multi(spark, sf_dir):
    """ES span_multi (SpanMultiTermQueryWrapper): prefix 'val*'
    expanded against the term dictionary, unioned as term spans."""
    from elasticsearch_nlp_classifier_spark.query import span_multi

    ix = _pos_physical_index(spark, sf_dir)
    return span_multi(ix, "val*")


def q_simple_query_string(spark, sf_dir):
    """ES simple_query_string: the lenient user-facing grammar
    (`QueryBuilders.simpleQueryStringQuery` on the reference's client).
    `data + valu* | table + -"data value"` = (data AND valu*) OR
    (table AND NOT adjacent-phrase "data value")."""
    from elasticsearch_nlp_classifier_spark.functions import (
        compile_simple_query_string,
    )

    docs = _docs(spark, sf_dir)
    col = compile_simple_query_string(
        'data + valu* | table + -"data value"',
        fields=["text"], text_fields={"text"}, analyzer="simple_code",
    )
    return docs.where(col).select("doc_id")


def q_sqs_phrase_slop(spark, sf_dir):
    """simple_query_string sloppy phrase: '"data value"~1' — ordered
    occurrence within a 3-position window (anchored-greedy chain)."""
    from elasticsearch_nlp_classifier_spark.functions import (
        compile_simple_query_string,
    )

    docs = _docs(spark, sf_dir)
    col = compile_simple_query_string(
        '"data value"~1',
        fields=["text"], text_fields={"text"}, analyzer="simple_code",
    )
    return docs.where(col).select("doc_id")


def q_agg_string_stats(spark, sf_dir):
    """ES string_stats agg over documents.text (length stats + char
    Shannon entropy)."""
    from elasticsearch_nlp_classifier_spark.query import string_stats_agg

    return string_stats_agg(_docs(spark, sf_dir), "text")


def q_agg_boxplot(spark, sf_dir):
    """ES boxplot agg over documents.n_chars (exact quantiles —
    matches DuckDB quantile_cont)."""
    from elasticsearch_nlp_classifier_spark.query import boxplot_agg

    return boxplot_agg(_docs(spark, sf_dir), "n_chars", exact=True)


def q_agg_matrix_stats(spark, sf_dir):
    """ES matrix_stats agg over three lineitem measures (scaled to
    integer-valued doubles so every power sum is exact in IEEE-754 and
    the moment formulas replay bit-identically in SQL)."""
    from elasticsearch_nlp_classifier_spark.query import matrix_stats_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_quantity").cast("double").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("double").alias("y"),
        F.round(F.col("l_tax") * 100, 0).cast("double").alias("z"),
    )
    return matrix_stats_agg(li, ["x", "y", "z"])


def q_agg_t_test(spark, sf_dir):
    """ES t_test agg (Welch): documents.n_chars, lang='en' vs the
    rest."""
    from elasticsearch_nlp_classifier_spark.query import t_test_agg

    docs = _docs(spark, sf_dir)
    return t_test_agg(docs, "n_chars", F.col("lang") == "en",
                      F.col("lang") != "en", typ="heteroscedastic")


def q_agg_scripted_metric(spark, sf_dir):
    """ES scripted_metric agg: per-event_type RMS of value via
    user map/combine/reduce scripts (mergeability enforced by
    sharded folding)."""
    from elasticsearch_nlp_classifier_spark.query import (
        scripted_metric_agg,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    def map_fn(pdf):
        return {"ss": float((pdf["value"] ** 2).sum()), "n": int(len(pdf))}

    def reduce_fn(states):
        return {"ss": sum(s["ss"] for s in states),
                "n": sum(s["n"] for s in states)}

    def finalize(st):
        return {"rms": round((st["ss"] / st["n"]) ** 0.5, 6)}

    return scripted_metric_agg(
        events.select("event_type", "value"), "event_type",
        map_fn, reduce_fn, finalize,
        state_fields=["ss", "n"], out_schema="rms double",
    ).withColumnRenamed("event_type", "key")


def _cust_geo(spark, sf_dir):
    """customer rows with deterministic synthetic coordinates — pure
    integer modular arithmetic so the identical derivation runs in the
    SQL oracle."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.select(
        F.col("c_custkey"),
        ((F.col("c_custkey") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 73 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def q_geo_grid(spark, sf_dir):
    """ES geotile_grid agg (Web-Mercator z/x/y buckets) over synthetic
    customer coordinates."""
    from elasticsearch_nlp_classifier_spark.query import geotile_grid_agg

    g = _cust_geo(spark, sf_dir)
    return geotile_grid_agg(g, F.col("lat"), F.col("lon"),
                            precision=4, size=20)


def q_geo_distance_rings(spark, sf_dir):
    """ES geo_distance agg: haversine ring buckets around (0, 0)."""
    from elasticsearch_nlp_classifier_spark.query import geo_distance_agg

    g = _cust_geo(spark, sf_dir)
    return geo_distance_agg(
        g, F.col("lat"), F.col("lon"), 0.0, 0.0,
        [(None, 2000.0), (2000.0, 8000.0), (8000.0, None)],
    )


def q_agg_geohash_grid(spark, sf_dir):
    """ES geohash_grid agg (base-32 Niemeyer cells, arithmetic
    interleave — query/geo.py:geohash_key) over the same synthetic
    customer coordinates as geo_grid."""
    from elasticsearch_nlp_classifier_spark.query import geohash_grid_agg

    g = _cust_geo(spark, sf_dir)
    return geohash_grid_agg(g, F.col("lat"), F.col("lon"),
                            precision=3, size=20)


def q_agg_random_sampler(spark, sf_dir):
    """ES random_sampler agg: deterministic md5-uniform doc sample at
    p=0.5, per-lang counts scaled back to population estimates."""
    from elasticsearch_nlp_classifier_spark.query import (
        random_sampler_counts,
    )

    return random_sampler_counts(
        _docs(spark, sf_dir), 0.5, "lang", seed="rs1"
    )


def q_agg_ip_prefix(spark, sf_dir):
    """ES ip_prefix agg over a runtime-field IPv4 address (also
    exercises runtime_mappings — query/api.py:with_runtime_fields):
    ip = 10.(doc_id%4).(doc_id%256).9, bucketed at /20."""
    from elasticsearch_nlp_classifier_spark.query import (
        ip_prefix_agg,
        with_runtime_fields,
    )

    docs = with_runtime_fields(
        _docs(spark, sf_dir),
        {"ip": "concat('10.', cast(doc_id % 4 as string), '.', "
               "cast(doc_id % 256 as string), '.9')"},
    )
    return ip_prefix_agg(docs, "ip", 20)


def q_agg_change_point(spark, sf_dir):
    """ES change_point sibling agg: the max-|Welch-t| mean-shift split
    over the daily event-count series (key = first post-change day)."""
    from elasticsearch_nlp_classifier_spark.query import change_point_agg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    out = change_point_agg(daily, "day", "doc_count")
    return out.select(
        F.date_format("key", "yyyy-MM-dd").alias("day"),
        "t_stat_r6", "left_mean_r6", "right_mean_r6",
    )


def q_agg_bucket_correlation(spark, sf_dir):
    """ES bucket_correlation pipeline agg: Pearson corr between per-lang
    doc_counts and a fixed indicator vector."""
    from elasticsearch_nlp_classifier_spark.query import (
        bucket_correlation_agg,
    )

    buckets = (
        _docs(spark, sf_dir)
        .groupBy(F.col("lang").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    ind = {"en": 1.0, "de": 0.5, "fr": 0.0}
    return bucket_correlation_agg(buckets, "key", "doc_count", ind)


def q_agg_ks_test(spark, sf_dir):
    """ES bucket_count_ks_test sibling agg: KS D-statistic of the
    per-event-type count distribution vs uniform."""
    from elasticsearch_nlp_classifier_spark.query import (
        bucket_count_ks_test_agg,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buckets = (
        ev.groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return bucket_count_ks_test_agg(buckets, "key", "doc_count")


def q_search_as_you_type(spark, sf_dir):
    """ES search_as_you_type: multi_match bool_prefix over the base
    field + its ._2gram shingle subfield (an index built with the
    simple_code_shingle2 JVM analyzer — analyzer/filters.py), summed
    most_fields-style.  Frames cover the whole corpus at this SF, so
    the SQL twin is exact."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query.mlt import (
        search_as_you_type_topk,
    )

    key = (id(spark), sf_dir, "sayt2")
    if key not in _POS_IX_CACHE:
        out = tempfile.mkdtemp(prefix="sayt_ix_") + "/idx"
        _POS_IX_CACHE[key] = build_physical_index(
            _docs(spark, sf_dir), out, text_col="text",
            analyzer="simple_code_shingle2",
        )
    sh2 = _POS_IX_CACHE[key]
    base = _physical_index(spark, sf_dir)
    out = search_as_you_type_topk(
        base, sh2, "data val", k=10, analyzer="simple_code",
        window=100000,
    )
    return out.select(
        F.col("rank").cast("bigint").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score_r6"),
    )


def q_analysis_shingles(spark, sf_dir):
    """ES shingle token filter (the ._2gram subfield's analysis): per-
    doc 2-shingle term frequencies via the pure-JVM expression chain."""
    docs = _docs(spark, sf_dir)
    from elasticsearch_nlp_classifier_spark.analyzer.spark_udfs import (
        analyze,
    )

    return (
        docs.select(
            "doc_id",
            F.explode(analyze("text", "simple_code_shingle2"))
            .alias("shingle"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def q_agg_moving_percentiles(spark, sf_dir):
    """ES moving_percentiles pipeline agg: sliding-window (3) exact
    p50 with quantile_cont interpolation over daily event counts."""
    from elasticsearch_nlp_classifier_spark.query.aggs import (
        moving_percentiles_agg,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    out = moving_percentiles_agg(daily, "day", "doc_count",
                                 window=3, percentile=0.5)
    return out.select(
        F.date_format("key", "yyyy-MM-dd").alias("day"), "p50_r6"
    )


def q_agg_geo_line(spark, sf_dir):
    """ES geo_line agg (relational form): per bucket, the first 12
    track points in sort order as (key, seq, lon, lat) rows."""
    from elasticsearch_nlp_classifier_spark.query.aggs import geo_line_agg

    g = _cust_geo(spark, sf_dir).withColumn(
        "grp", (F.col("c_custkey") % 5).cast("bigint")
    )
    return geo_line_agg(
        g, "grp", "c_custkey", F.col("lat"), F.col("lon"), size=12
    )


def q_split_cluster_safe(spark, sf_dir):
    """Leakage-controlled split: near-duplicate clusters never straddle
    train/val/test (operators/sampling.py:cluster_safe_split).  Exact-
    content pairs over triple-planted dups give triangle components;
    each doc hashes on its component representative."""
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") < 5)
    d = docs.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 10_000)
    ).unionByName(base.withColumn("doc_id", F.col("doc_id") + 20_000))
    h = F.sha2(F.col("text").cast("string"), 256)
    a = d.select(F.col("doc_id").alias("id_a"), h.alias("_h"))
    b = d.select(F.col("doc_id").alias("id_b"), h.alias("_h"))
    pairs = a.join(b, "_h").where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )
    out = cluster_safe_split(
        d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "split")


def q_alias_search(spark, sf_dir):
    """ES filtered alias over two indexes: BM25 through the alias —
    union-merged global stats, filter (lang='en') applied as query
    context BEFORE the top-k cut, never perturbing idf/avgdl
    (index/aliases.py)."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.index.aliases import (
        AliasRegistry,
    )

    docs = _docs(spark, sf_dir)
    mk = lambda d: build_logical_index(d, "text", "simple_code")  # noqa
    reg = AliasRegistry()
    reg.put_alias(
        "en_docs",
        [mk(docs.where("doc_id % 2 = 0")), mk(docs.where("doc_id % 2 = 1"))],
        doc_filter=docs.where("lang = 'en'").select("doc_id"),
    )
    q = spark.createDataFrame(
        [(0, "data value table")], "query_id int, query_text string"
    )
    out = reg.search("en_docs", q, k=10, analyzer="simple_code")
    return out.select(
        F.col("rank").cast("bigint").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score_r6"),
    )


def q_sparse_vector(spark, sf_dir):
    """ES sparse_vector / text_expansion query: top-10 by
    sum(q_weight * doc_weight) over a feature-postings relation —
    doc weights are the deterministic tf*ln(1+N/df) expansion analog
    (query/sparse.py; a learned encoder's table drops in unchanged)."""
    from elasticsearch_nlp_classifier_spark.query import (
        sparse_vector_topk,
        text_expansion_features,
    )

    feats = text_expansion_features(
        _docs(spark, sf_dir), "text", analyzer="simple_code"
    )
    return sparse_vector_topk(
        feats, {"data": 2.0, "value": 1.0, "slow": 1.5}, k=10
    )


def q_terms_enum(spark, sf_dir):
    """ES _terms_enum: first 8 dictionary terms with prefix 's' from
    the physical index's term_stats (vocabulary scan, no postings)."""
    from elasticsearch_nlp_classifier_spark.query import terms_enum

    ix = _physical_index(spark, sf_dir)
    return terms_enum(ix, "s", size=8)


def q_feat_hash_embed(spark, sf_dir):
    """Feature-hashed TF-IDF embeddings (hashing trick, Weinberger et
    al. 2009) — emitted as dense (doc_id, j, val) cells so the full
    vector replays in SQL."""
    from elasticsearch_nlp_classifier_spark.operators import hashed_tfidf

    vec = hashed_tfidf(_docs(spark, sf_dir), dim=16)
    return vec.select(
        "doc_id", F.posexplode("embedding").alias("j", "v")
    ).select("doc_id", F.col("j").cast("bigint").alias("j"),
             F.round("v", 6).alias("val"))


def q_shard_assignment(spark, sf_dir):
    """Deterministic training-shard shuffle: (doc_id, shard, pos) with
    hash-ordered within-shard positions."""
    from elasticsearch_nlp_classifier_spark.operators import (
        shard_assignment,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    return shard_assignment(docs, 4).select("doc_id", "shard", "pos")



def q_has_child(spark, sf_dir):
    """ES has_child (join-field): orders with >=2 lineitems of
    quantity >= 45 — child counts aggregate before the semi-join."""
    from elasticsearch_nlp_classifier_spark.query import has_child

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return has_child(
        o, li, "o_orderkey", "l_orderkey",
        F.col("l_quantity") >= 45, min_children=2,
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_has_parent(spark, sf_dir):
    """ES has_parent: lineitems whose parent order totals > 400000."""
    from elasticsearch_nlp_classifier_spark.query import has_parent

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return has_parent(
        o, li, "o_orderkey", "l_orderkey",
        F.col("o_totalprice") > 400000.0,
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def q_agg_children(spark, sf_dir):
    """ES children agg: matching-child doc_count bucketed by the
    parent's order status."""
    from elasticsearch_nlp_classifier_spark.query import children_agg

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return children_agg(
        o, li, "o_orderkey", "l_orderkey", "o_orderstatus",
        child_filter=F.col("l_quantity") >= 25,
    )


def q_mget(spark, sf_dir):
    """ES _mget: per-requested-id found/missing in one broadcast
    pass (nulls coalesced so the hash compare is type-stable)."""
    from elasticsearch_nlp_classifier_spark.query import mget

    docs = _docs(spark, sf_dir)
    out = mget(docs, [0, 1, 2, 3, 10_000_000], id_col="doc_id")
    return out.select(
        "doc_id", "found",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang_c"),
        F.coalesce(F.col("n_chars"), F.lit(-1)).alias("n_chars_c"),
    )



def q_agg_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks over documents.n_chars (empirical CDF x100,
    one sum(CASE) scan for all requested values)."""
    from elasticsearch_nlp_classifier_spark.query import (
        percentile_ranks_agg,
    )

    return percentile_ranks_agg(_docs(spark, sf_dir), "n_chars",
                                [100.0, 300.0, 500.0])


def q_agg_ip_range(spark, sf_dir):
    """ES ip_range agg over synthetic dotted-quad IPs derived from
    events (integer modular arithmetic — replayed verbatim in SQL);
    the operator itself parses the string back to uint32 order."""
    from elasticsearch_nlp_classifier_spark.query import ip_range_agg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.concat_ws(
            ".", F.lit("10"),
            (F.col("user_id") % 256).cast("string"),
            ((F.col("user_id") / 256).cast("bigint") % 256).cast("string"),
            (F.col("event_id") % 256).cast("string"),
        ).alias("ip")
    )
    return ip_range_agg(
        ev, "ip",
        [(None, "10.64.0.0"), ("10.64.0.0", "10.192.0.0"),
         ("10.192.0.0", None)],
    )


def q_cross_fields(spark, sf_dir):
    """ES multi_match mode=cross_fields over (text, source): blended
    max-df idf, per-(doc, term) best field contribution, term sum."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import cross_fields_topk

    docs = _docs(spark, sf_dir)
    idx_text = build_logical_index(docs, text_col="text",
                                   analyzer="simple_code",
                                   doc_id_col="doc_id")
    idx_source = build_logical_index(docs, text_col="source",
                                     analyzer="simple_code",
                                     doc_id_col="doc_id")
    res = cross_fields_topk(
        {"text": idx_text, "source": idx_source},
        "src7 data value", k=10, analyzer="simple_code",
    )
    return res.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))


def q_eql_sequence(spark, sf_dir):
    """EQL-style sequence detection (`/_eql/search` `sequence by ...
    with maxspan`): per user, view -> click -> purchase in strict
    timestamp order within 2 days.  One scan classifies events against
    all steps, one hash agg collects per-(entity, step) ts arrays, and
    the greedy in-order chain runs as JVM higher-order expressions."""
    from elasticsearch_nlp_classifier_spark.query import eql_sequence

    ev = _events(spark, sf_dir)
    steps = [F.col("event_type") == t
             for t in ("view", "click", "purchase")]
    return eql_sequence(ev, "user_id", steps, maxspan_s=172800.0)


def q_eql_until(spark, sf_dir):
    """EQL sequence with an `until` terminator: view -> purchase within
    2 days, voided when a 'click' lands strictly between anchor and
    chain end (ES: sequences expire on the until event)."""
    from elasticsearch_nlp_classifier_spark.query import eql_sequence

    ev = _events(spark, sf_dir)
    return eql_sequence(
        ev, "user_id",
        [F.col("event_type") == "view", F.col("event_type") == "purchase"],
        maxspan_s=172800.0,
        until=F.col("event_type") == "click",
    )


def q_eql_sample(spark, sf_dir):
    """EQL sample: unordered per-user correlation of view+purchase+click
    with latest-event-per-filter representatives (engine determinism
    spec), first 20 users key-ASC."""
    from elasticsearch_nlp_classifier_spark.query import eql_sample

    ev = _events(spark, sf_dir)
    return eql_sample(
        ev, "user_id",
        [F.col("event_type") == "view",
         F.col("event_type") == "purchase",
         F.col("event_type") == "click"],
        size=20,
    )


def q_agg_bucket_pipeline2(spark, sf_dir):
    """ES bucket_script + normalize(percent_of_sum) + bucket_selector
    pipeline aggs over an hourly date_histogram parent — projections,
    one bucket-table window, and a filter; the corpus reduction
    happened in the parent agg."""
    from elasticsearch_nlp_classifier_spark.query import (
        bucket_script_agg, bucket_selector_agg, date_histogram_agg,
        normalize_agg,
    )

    b = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    b = bucket_script_agg(b, F.col("doc_count") * 2.0, "dbl")
    b = normalize_agg(b, "doc_count", "percent_of_sum", out_col="pct")
    b = bucket_selector_agg(b, F.col("doc_count") >= 2)
    return b.select(
        F.unix_timestamp("key_ts").cast("bigint").alias("key_epoch"),
        "doc_count", F.round("dbl", 6).alias("dbl"),
        F.round("pct", 6).alias("pct"),
    )


def q_agg_percentiles_bucket(spark, sf_dir):
    """ES percentiles_bucket: exact interpolated percentiles of
    doc_count ACROSS the hourly sibling buckets."""
    from elasticsearch_nlp_classifier_spark.query import (
        date_histogram_agg, percentiles_bucket_agg,
    )

    b = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    return percentiles_bucket_agg(b, "doc_count", (25.0, 50.0, 75.0, 99.0))


def q_agg_rate_moving_fn(spark, sf_dir):
    """ES rate (per-minute over hourly buckets) + moving_fn max(3)
    over the same date_histogram parent."""
    from elasticsearch_nlp_classifier_spark.query import (
        date_histogram_agg, moving_fn_agg, rate_agg,
    )

    b = date_histogram_agg(_events(spark, sf_dir), "ts", "hour")
    out = moving_fn_agg(
        rate_agg(b, "hour", rate_unit="minute"), fn="max", window=3,
        value_col="rate",
    )
    return out.select(
        "key_ts", "doc_count", F.round("rate", 6).alias("rate"),
        F.round("moving_max", 6).alias("moving_max"),
    )


def q_agg_cumulative_cardinality(spark, sf_dir):
    """ES cumulative_cardinality: distinct users seen through each
    daily bucket (first-seen trick — one key agg + bucket window,
    never a distinct-per-prefix pass)."""
    from elasticsearch_nlp_classifier_spark.query import (
        cumulative_cardinality_agg,
    )

    return cumulative_cardinality_agg(
        _events(spark, sf_dir), "user_id", "ts", "day"
    )


def q_agg_variable_width_histogram(spark, sf_dir):
    """ES variable_width_histogram over n_chars: deterministic Lloyd
    k-means (equal-width seeds, 10 rounds, ties to lower centroid) —
    integer inputs make every step exact FP, so the unrolled-SQL twin
    reproduces it bit-for-bit."""
    from elasticsearch_nlp_classifier_spark.query import (
        variable_width_histogram_agg,
    )

    out = variable_width_histogram_agg(
        _docs(spark, sf_dir), "n_chars", buckets=4, iters=10
    )
    return out.select(
        F.round("key", 6).alias("key"), "min", "max", "doc_count"
    )


def q_agg_categorize_text(spark, sf_dir):
    """ES categorize_text over log-ish event lines: digit-bearing
    tokens collapse to %{NUM}, templates bucketed."""
    from elasticsearch_nlp_classifier_spark.query import (
        categorize_text_agg,
    )

    ev = _events(spark, sf_dir)
    line = F.concat_ws(" ", "event_type", "props")
    return categorize_text_agg(ev, line, size=10)


def q_agg_frequent_item_sets(spark, sf_dir):
    """ES frequent_item_sets (sizes 1-2) over per-doc {lang, source}
    item arrays — apriori-pruned co-occurrence join."""
    from elasticsearch_nlp_classifier_spark.query import (
        frequent_item_sets_agg,
    )

    docs = _docs(spark, sf_dir)
    items = F.array("lang", "source")
    out = frequent_item_sets_agg(
        docs, items, minimum_support=0.004, size=1_000_000
    )
    # string-joined itemsets so the hash compare is scalar; the cut
    # re-applies the same (doc_count DESC, key ASC) order on strings
    return (
        out.select(
            F.array_join("items", ",").alias("items"),
            "support", "doc_count",
        )
        .orderBy(F.desc("doc_count"), F.asc("items"))
        .limit(10)
    )


def q_agg_nested_reverse(spark, sf_dir):
    """ES nested agg + terms sub-agg + reverse_nested: element counts
    AND parent counts per event_type over per-user event arrays."""
    from elasticsearch_nlp_classifier_spark.query import (
        nested_terms_agg, reverse_nested_agg,
    )

    ev = _events(spark, sf_dir)
    nested = ev.groupBy("user_id").agg(
        F.collect_list(
            F.struct("event_id", "event_type", "value")
        ).alias("events")
    )
    n = nested_terms_agg(nested, "events", "event_type", size=10)
    r = reverse_nested_agg(
        nested, "events", "event_type", "user_id", size=10
    )
    return n.join(r, "key").orderBy(F.desc("doc_count"), F.asc("key"))


def q_agg_parent(spark, sf_dir):
    """ES parent agg: per lineitem return flag, distinct orders owning
    at least one such (quantity >= 30) lineitem."""
    from elasticsearch_nlp_classifier_spark.query import parent_agg

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return parent_agg(
        o, li, "o_orderkey", "l_orderkey", "l_returnflag",
        child_filter=F.col("l_quantity") >= 30,
    )


def q_esql_stats(spark, sf_dir):
    """ES|QL `POST /_query` pipeline (WHERE → EVAL → STATS BY) compiled
    to a pure-Catalyst DataFrame plan by query/esql.py — zero UDFs, so
    the filter pushes to the parquet scan and the agg is one hash
    aggregation with map-side combine."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return esql(
        'FROM events '
        '| WHERE event_type IN ("click", "view") AND value > 0 '
        "| EVAL day_s = TO_LONG(DATE_TRUNC(1 day, ts)) "
        "| STATS n = COUNT(*), total = ROUND(SUM(value), 6), "
        "mx = ROUND(MAX(value), 6) BY day_s, event_type",
        {"events": ev},
    )


def q_esql_docs(spark, sf_dir):
    """ES|QL string/multivalue surface (LIKE, SPLIT → MV_COUNT, BUCKET)
    over the documents table."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return esql(
        "FROM documents "
        '| WHERE text LIKE "*data*" AND lang IS NOT NULL '
        '| EVAL nw = MV_COUNT(SPLIT(text, " ")), lang_up = TO_UPPER(lang), '
        "cb = BUCKET(n_chars, 200) "
        "| STATS docs = COUNT(*), avg_nw = ROUND(AVG(nw), 6) BY lang_up, cb",
        {"documents": docs},
    )


def q_esql_lookup_join(spark, sf_dir):
    """ES|QL LOOKUP JOIN (8.18+): left broadcast join against a
    lookup-mode index on a same-named key — the main relation never
    shuffles; joined fields clobber same-named left fields like ES."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = spark.createDataFrame(
        [("en", "English", 1), ("de", "German", 2), ("fr", "French", 3)],
        "lang string, lang_name string, pri int",
    )
    return esql(
        "FROM documents | LOOKUP JOIN langs ON lang "
        '| EVAL nm = COALESCE(lang_name, "other") '
        "| STATS docs = COUNT(*), mx = MAX(n_chars) BY nm, pri "
        "| SORT nm",
        {"documents": docs, "langs": langs},
    )


def q_esql_enrich(spark, sf_dir):
    """ES|QL ENRICH (broadcast lookup join — the same physical strategy
    as ES's node-replicated enrich index) + COALESCE + STATS."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pol = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive"),
         ("purchase", "transactional")],
        "event_type string, kind string",
    )
    return esql(
        "FROM events | ENRICH kinds ON event_type WITH kind "
        '| EVAL k = COALESCE(kind, "other") | STATS n = COUNT(*) BY k',
        {"events": ev},
        enrich_policies={"kinds": (pol, "event_type")},
    )


def q_esql_dissect(spark, sf_dir):
    """ES|QL DISSECT structured extraction (compiled to
    regexp_extract) feeding a grouped aggregation."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return esql(
        "FROM events "
        '| EVAL s = CONCAT(event_type, "-", TO_STRING(user_id)) '
        '| DISSECT s "%{et}-%{uid}" '
        "| STATS n = COUNT(*), users = COUNT_DISTINCT(uid) BY et",
        {"events": ev},
    )


def q_esql_match(spark, sf_dir):
    """ES|QL MATCH() full-text function (8.17+) in WHERE: any analyzed
    query token in the analyzed field — same JVM tokenizer chain on
    both sides, zero UDFs in the compiled plan."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return esql(
        'FROM documents | WHERE MATCH(text, "data value") '
        "| KEEP doc_id | SORT doc_id",
        {"documents": docs},
    )


def q_esql_qstr(spark, sf_dir):
    """ES|QL QSTR() (query-string function): delegates to the P7
    compiler with the named default field analyzed."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return esql(
        'FROM documents | WHERE QSTR("lang:en AND data", text) '
        "| KEEP doc_id | SORT doc_id",
        {"documents": docs},
    )


def q_esql_change_point(spark, sf_dir):
    """ES|QL CHANGE_POINT command (8.18+) over the daily event-count
    series: all rows pass through, the detected mean-shift row carries
    (type, t_stat) — same Welch-t detector as agg_change_point."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return esql(
        "FROM events "
        "| EVAL day_s = TO_LONG(DATE_TRUNC(1 day, ts)) "
        "| STATS n = COUNT(*) BY day_s "
        "| CHANGE_POINT n ON day_s "
        "| WHERE type IS NOT NULL "
        "| KEEP day_s, type, t_stat",
        {"events": ev},
    )


def q_esql_fork(spark, sf_dir):
    """ES|QL FORK command (8.19+): two branch pipelines over the same
    relation, unioned by name with the _fork discriminator."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return esql(
        "FROM events | FORK "
        '(WHERE event_type == "click" | STATS n = COUNT(*)) '
        "(STATS total = ROUND(SUM(value), 6))",
        {"events": ev},
    )


def q_esql_inlinestats(spark, sf_dir):
    """ES|QL INLINESTATS: per-group aggregates appended to every row
    (broadcast join-back of the aggregated BY groups — the events
    relation never shuffles)."""
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return esql(
        "FROM events "
        "| INLINESTATS gn = COUNT(*), gtotal = ROUND(SUM(value), 6) "
        "BY event_type "
        "| KEEP event_id, event_type, gn, gtotal",
        {"events": ev},
    )


def q_msearch_sizes(spark, sf_dir):
    """ES _msearch via the library API (query/api.py:msearch): N ranked
    searches as one batched BM25 job with per-search sizes respected;
    query_id = request position."""
    from elasticsearch_nlp_classifier_spark.query import msearch

    idx = _logical_index(spark, sf_dir)
    out = msearch(
        idx,
        [{"query": "data value table", "size": 5},
         {"query": "import stream", "size": 10}],
        analyzer="simple_code",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_transform_pivot(spark, sf_dir):
    """ES pivot _transform (terms + date_histogram group_by with the
    mergeable agg set) — one hash aggregation, plans/transform.py."""
    from elasticsearch_nlp_classifier_spark.plans.transform import (
        pivot_transform,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = pivot_transform(
        ev,
        group_by={"user_id": "terms", "day": ("date_histogram", "ts", 86400)},
        aggregations={"n": ("value_count", "event_id"),
                      "total": ("sum", "value"),
                      "card": ("cardinality", "event_type")},
    )
    return out.select(
        "user_id", "day", "n", F.round("total", 6).alias("total_r6"), "card"
    )


def q_transform_latest(spark, sf_dir):
    """ES latest _transform: newest event per user via one max_by hash
    aggregation (no window shuffle-sort)."""
    from elasticsearch_nlp_classifier_spark.plans.transform import (
        latest_transform,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = latest_transform(ev, ["user_id"], "ts", tiebreak="event_id")
    return out.select(
        "user_id", "event_id", "event_type",
        F.round("value", 6).alias("value_r6"),
        F.unix_timestamp(F.col("ts")).alias("ts_s"),
    )


def q_transform_continuous(spark, sf_dir):
    """Continuous pivot transform: two checkpointed sync ticks (first
    half of the event stream, then the rest) whose merged destination
    must equal a full batch recompute — the oracle IS that full
    recompute, so this gates the incremental path's exactness."""
    import shutil

    from elasticsearch_nlp_classifier_spark.plans.transform import (
        read_transform_dest,
        run_continuous,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dest = os.path.join(_oracle_scratch(), "transform_continuous")
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    cut = ev.agg(
        F.percentile_approx(F.unix_timestamp(F.col("ts")), 0.5)
    ).collect()[0][0]
    gb = {"user_id": "terms"}
    aggs = {"n": ("value_count", "event_id"), "total": ("sum", "value"),
            "avg_v": ("avg", "value")}
    run_continuous(spark, ev.where(F.unix_timestamp(F.col("ts")) <= cut),
                   dest, gb, aggs, sync_field="ts")
    run_continuous(spark, ev, dest, gb, aggs, sync_field="ts")
    out = read_transform_dest(spark, dest)
    return out.select(
        "user_id", "n", F.round("total", 6).alias("total_r6"),
        F.round("avg_v", 6).alias("avg_r6"),
    )


def q_retriever_rrf(spark, sf_dir):
    """ES 8.x retriever tree: rrf{standard(match) + knn(cosine)} —
    query/retriever.py composes the WAND-BM25 and ANN leaves and fuses
    with reciprocal-rank; the oracle re-derives both rankings and the
    fusion in SQL."""
    from elasticsearch_nlp_classifier_spark.query.retriever import (
        RetrieverContext,
        retrieve,
    )

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
    ctx = RetrieverContext(index=_logical_index(spark, sf_dir), docs=docs,
                           embeddings=emb, analyzer="simple_code")
    spec = {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": {"match": {"text": "data value table"}}}},
            {"knn": {"field": "embedding", "query_vector": qvec, "k": 20}},
        ],
        "rank_window_size": 20,
        "rank_constant": 60,
    }}}
    out = retrieve(spec, ctx, k=10)
    return out.select("rank", "doc_id", F.round("score", 9).alias("score_r9"))


def q_ann_int8(spark, sf_dir):
    """int8 scalar-quantized kNN (ES int8_hnsw analog): quantized
    shortlist (4× smaller scan) + exact float rerank.  The rerank
    window makes the end result EXACTLY the brute float top-k, so the
    oracle is the same brute cosine SQL — an end-to-end exactness gate
    on the quantized path."""
    from elasticsearch_nlp_classifier_spark.operators.quantize import (
        int8_knn_topk,
    )

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return int8_knn_topk(emb, q, k=5, rerank=8)


def q_ann_bbq(spark, sf_dir):
    """BBQ-style 1-bit quantized kNN (ES 8.16 binary-quantization
    analog): centroid-centered sign bits packed 64/int64 word, XOR +
    popcount hamming shortlist (pure codegen — 32× smaller scan), exact
    float cosine rerank.  As with ann_int8, the rerank window makes the
    end result EXACTLY the brute float top-k, so the oracle is the same
    brute cosine SQL — an end-to-end exactness gate on the 1-bit
    path."""
    from elasticsearch_nlp_classifier_spark.operators.quantize import (
        bbq_knn_topk,
    )

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return bbq_knn_topk(emb, q, k=5, rerank=30)


def q_ingest_pipeline(spark, sf_dir):
    """ES ingest pipeline (PUT _ingest/pipeline body) compiled to one
    Catalyst projection chain: rename / set / gsub / conditional
    uppercase / dissect / convert / script processors over the
    documents table, with the on_failure marker.  Zero shuffle, zero
    Python — the pipeline is fused into the scan like ES runs it on the
    ingest node."""
    from elasticsearch_nlp_classifier_spark.sources.ingest import (
        apply_ingest_pipeline,
    )

    docs = _docs(spark, sf_dir)
    pipeline = {
        "description": "contract ingest pipeline",
        "processors": [
            {"rename": {"field": "source", "target_field": "origin"}},
            {"set": {"field": "kind", "value": "doc"}},
            {"gsub": {"field": "text", "pattern": r"\s+",
                      "replacement": " ", "target_field": "text_norm"}},
            {"uppercase": {"field": "lang", "target_field": "lang_uc",
                           "if": "n_chars > 200"}},
            {"dissect": {"field": "origin", "pattern": "src%{src_num}"}},
            {"convert": {"field": "src_num", "type": "integer",
                         "target_field": "src_num_int"}},
            {"script": {"target_field": "route",
                        "source": "concat(lang, '-', origin)"}},
        ],
    }
    out = apply_ingest_pipeline(docs, pipeline,
                                failure_marker="ingest_failed")
    return out.select("doc_id", "kind", "lang_uc", "text_norm", "route",
                      "src_num_int", "ingest_failed")


#: query-side polygon for the geo_shape contract entry (GeoJSON
#: (lon, lat) vertex order) — shared by the Spark query and the
#: generated SQL twin so both test the same edges.
GEO_SHAPE_POLYGON = [
    (-100.0, -50.0), (50.0, -60.0), (120.0, 40.0), (0.0, 80.0),
    (-150.0, 30.0),
]


def q_geo_shape(spark, sf_dir):
    """ES geo_shape polygon query (relation: within) over synthetic
    customer points: even-odd ray casting unrolled to one CASE per
    polygon edge — a pure-codegen scan predicate
    (`query/geo.py:geo_polygon_contains`); the oracle replays the
    identical edges via `geo_polygon_sql`."""
    from elasticsearch_nlp_classifier_spark.query import geo_shape_query

    g = _cust_geo(spark, sf_dir)
    return geo_shape_query(g, "lat", "lon", GEO_SHAPE_POLYGON) \
        .select("c_custkey")


def q_agg_terms_filtered(spark, sf_dir):
    """ES terms agg with include (anchored regex) + exclude (value
    list) — both prune at collection time, before the aggregation."""
    from elasticsearch_nlp_classifier_spark.query.aggs import terms_agg

    docs = _docs(spark, sf_dir)
    return terms_agg(docs, "source", size=10,
                     include="src[0-3]", exclude=["src2"])


def q_ltr_rescore(spark, sf_dir):
    """ES LTR plugin workflow: log features over the BM25 window,
    train a pointwise linear ranker on deterministic judgments,
    rescore the window.  Features + trained weights are MATERIALIZED
    and the oracle replays the rescore (dot + rank) in DuckDB."""
    from elasticsearch_nlp_classifier_spark.query import (
        ltr_features, ltr_rescore, train_ltr,
    )

    idx = _logical_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    feats = ltr_features(idx, q, docs, ["n_chars"], window=50,
                         analyzer="simple_code")
    judgments = docs.select(
        F.lit(1).alias("query_id"), "doc_id",
        (F.col("doc_id") % 4).cast("double").alias("grade"),
    )
    model = train_ltr(feats, judgments, ridge_lambda=0.1)
    scratch = _oracle_scratch()
    feats.write.mode("overwrite").parquet(f"{scratch}/ltr_feats.parquet")
    spark.createDataFrame(
        [(model["beta"], model["intercept"])],
        "beta array<double>, intercept double",
    ).write.mode("overwrite").parquet(f"{scratch}/ltr_weights.parquet")
    out = ltr_rescore(feats, model, k=10)
    return out.select(
        "query_id", F.col("rank").cast("bigint").alias("rank"),
        "doc_id", F.round("ltr_score", 6).alias("score_r6"),
    )


def q_es_dsl_search(spark, sf_dir):
    """ES _search body (Query-DSL JSON) compiled and executed — same
    bool query as the bool_query entry, arriving as JSON; the oracle is
    literally the bool_query SQL."""
    from elasticsearch_nlp_classifier_spark.query import (
        RetrieverContext, es_search,
    )

    ctx = RetrieverContext(index=_logical_index(spark, sf_dir),
                           docs=_docs(spark, sf_dir),
                           analyzer="simple_code")
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"match": {"text": {"query": "value", "boost": 2.0}}}],
    }}, "size": 10}
    out = es_search(body, ctx)
    return out.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))


def q_es_dsl_nested_bool(spark, sf_dir):
    """Nested bool-inside-bool (r3 verdict #3 — the commonest pasted
    body shape): a filter wrapping a should group, a nested-bool
    should adding score, a nested-bool must_not excluding.  Semantics
    (dsl._bool_frame): match set = 'data' AND ('value' OR 'table') AND
    NOT ('error' AND 'retry'); score = bm25(data) + (bm25(batch) +
    bm25(slow) when both present); the filter group adds 0."""
    from elasticsearch_nlp_classifier_spark.query import (
        RetrieverContext, es_search,
    )

    ctx = RetrieverContext(index=_logical_index(spark, sf_dir),
                           docs=_docs(spark, sf_dir),
                           analyzer="simple_code")
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "filter": [{"bool": {"should": [
            {"match": {"text": "value"}},
            {"match": {"text": "table"}}]}}],
        "should": [{"bool": {"must": [
            {"match": {"text": "batch"}},
            {"match": {"text": "slow"}}]}}],
        "must_not": [{"bool": {"must": [
            {"match": {"text": "error"}},
            {"match": {"text": "retry"}}]}}],
    }}, "size": 10}
    out = es_search(body, ctx)
    return out.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): select raw docs
    whose hashed-unigram distribution matches the en-language target
    slice; deterministic Gumbel-top-50."""
    from elasticsearch_nlp_classifier_spark.operators import dsir_select

    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("lang") == "en")
    out = dsir_select(docs, target, k=50, n_buckets=256)
    return out.select(
        "doc_id",
        F.round("dsir_logweight", 6).alias("lw_r6"),
        F.round("gumbel_key", 6).alias("key_r6"),
    )


def q_agg_terms_order_metric(spark, sf_dir):
    """ES terms agg ordered by a sub-agg metric ("order":
    {"avg_chars": "desc"}) instead of doc_count."""
    from elasticsearch_nlp_classifier_spark.query import terms_agg_subs

    docs = _docs(spark, sf_dir)
    return terms_agg_subs(
        docs, "lang",
        {"avg_chars": F.round(F.avg("n_chars"), 6)},
        size=10, order_by="avg_chars", order_dir="desc",
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"),
             "avg_chars")


def q_agg_histogram_dense(spark, sf_dir):
    """ES histogram with extended_bounds + min_doc_count=0: gap-free
    bucket table, empty buckets zero-filled from a sequence spine."""
    from elasticsearch_nlp_classifier_spark.query import histogram_agg

    ev = _events(spark, sf_dir)
    return histogram_agg(
        ev, "value", 50.0, min_doc_count=0,
        extended_bounds=(-200.0, 700.0),
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def q_sorted_index_topk(spark, sf_dir):
    """ES index sorting: build the range-bucketed sorted layout on
    n_chars, then answer sort+limit with early termination (only the
    needed bucket partitions are scanned)."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index import (
        build_sorted_index, sorted_topk,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    path = os.path.join(tempfile.gettempdir(),
                        "spark_graft_oracle", "sorted_nchars")
    build_sorted_index(docs, "n_chars", path, buckets=8)
    return (
        sorted_topk(spark, path, "n_chars", k=20, desc=True)
        .select("doc_id", "n_chars")
    )


def q_indices_boost(spark, sf_dir):
    """ES indices_boost: the corpus split into two indexes (even/odd
    doc_id), odd boosted 2x; BM25 stats stay merged-global so the only
    difference from a7 is the per-index multiplier."""
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import (
        indices_boost_topk,
    )

    docs = _docs(spark, sf_dir)
    mk = lambda pred: build_logical_index(  # noqa: E731
        docs.where(pred), text_col="text", analyzer="simple_code",
        doc_id_col="doc_id",
    )
    out = indices_boost_topk(
        {"even": mk(F.col("doc_id") % 2 == 0),
         "odd": mk(F.col("doc_id") % 2 == 1)},
        {"even": 1.0, "odd": 2.0},
        "data value", k=10, analyzer="simple_code",
    )
    return out.select(
        F.col("rank").cast("bigint").alias("rank"), "doc_id",
        F.round("score", 6).alias("score_r6"),
    )


def q_sorted_query_topk(spark, sf_dir):
    """ES query + sort + size with early termination: a match filter
    gates the sorted-layout walk (broadcast semi-join), ranking is the
    field sort — only the needed bucket partitions are read."""
    import tempfile

    from elasticsearch_nlp_classifier_spark.index import (
        build_sorted_index, sorted_topk,
    )
    from elasticsearch_nlp_classifier_spark.query import match_filter

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    path = os.path.join(tempfile.gettempdir(),
                        "spark_graft_oracle", "sorted_nchars_q")
    build_sorted_index(docs, "n_chars", path, buckets=8)
    idx = _logical_index(spark, sf_dir)
    hits = match_filter(idx, "data", analyzer="simple_code")
    return (
        sorted_topk(spark, path, "n_chars", k=20, desc=True,
                    allowed=hits)
        .select("doc_id", "n_chars")
    )


def q_agg_terms_partition(spark, sf_dir):
    """ES terms agg partition pagination (include.partition /
    num_partitions): slice 0 of 3 of the key space, md5-hash-split at
    collection time."""
    from elasticsearch_nlp_classifier_spark.query.aggs import terms_agg

    docs = _docs(spark, sf_dir)
    return terms_agg(docs, "source", size=20, partition=(0, 3))


def q_composite_datehist(spark, sf_dir):
    """ES composite agg with a date_histogram source (+ terms source):
    page 2 via the after-key cursor, buckets keyed by day epoch."""
    from elasticsearch_nlp_classifier_spark.query import composite_agg

    ev = _events(spark, sf_dir)
    srcs = [
        {"name": "day_epoch", "field": "ts", "date_histogram": "day"},
        "event_type",
    ]
    p1 = composite_agg(ev, srcs, size=10).collect()
    after = (p1[-1]["day_epoch"], p1[-1]["event_type"])
    return composite_agg(ev, srcs, size=10, after=after)


def q_knn_cutoff(spark, sf_dir):
    """ES kNN `similarity` cutoff: exact cosine top-10 with candidates
    below 0.1 dropped before ranking (queries may return < k hits)."""
    from elasticsearch_nlp_classifier_spark.operators import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk(emb, queries, k=10, min_similarity=0.1)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("vec_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "vec_id",
            F.round("cos", 6).alias("cos_r6"),
        )
    )


def _geo_shape_oracle() -> str:
    from elasticsearch_nlp_classifier_spark.query import geo_polygon_sql

    pred = geo_polygon_sql("lat", "lon", GEO_SHAPE_POLYGON)
    return f"""
            WITH g AS (
              SELECT c_custkey,
                     ((c_custkey * 37) % 18000) / 100.0 - 90.0 AS lat,
                     ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS lon
              FROM customer
            )
            SELECT c_custkey FROM g WHERE {pred}"""


def _sim_topk_query(spark, sf_dir, **kw):
    """Shared shape for the similarity-module entries: top-10 for
    'data value table' under a non-BM25 similarity, rounded like a7."""
    from elasticsearch_nlp_classifier_spark.query import similarity_topk

    idx = _logical_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(1, "data value table")], "query_id int, query_text string"
    )
    scored = similarity_topk(
        idx, q, k=10_000_000, analyzer="simple_code", **kw
    )
    w = Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score_r6"),
        )
    )


def q_sim_lm_dirichlet(spark, sf_dir):
    """Lucene LMDirichletSimilarity (mu=2000) top-10."""
    return _sim_topk_query(spark, sf_dir, similarity="lm_dirichlet")


def q_sim_lm_jelinek_mercer(spark, sf_dir):
    """Lucene LMJelinekMercerSimilarity (lambda=0.1) top-10."""
    return _sim_topk_query(spark, sf_dir, similarity="lm_jelinek_mercer")


def q_sim_dfi(spark, sf_dir):
    """Lucene DFISimilarity (standardized measure) top-10."""
    return _sim_topk_query(spark, sf_dir, similarity="dfi",
                           measure="standardized")


def q_sim_scripted(spark, sf_dir):
    """ES scripted similarity: classic sqrt-tf·idf as a SQL script."""
    return _sim_topk_query(
        spark, sf_dir, similarity="scripted",
        script="sqrt(tf) * (1.0 + ln(n_docs / (df + 1.0)))",
    )


# shared CTE tail for the similarity-module oracles: per-term collection
# stats (ttf) + corpus token total on top of _BM25_BASE
_SIM_BASE = _BM25_BASE + """,
tstats AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
           FROM tf GROUP BY 1),
corpus_lm AS (SELECT sum(dl)::BIGINT AS sum_ttf FROM dl),
qt AS (SELECT DISTINCT unnest(list_filter(
         string_split_regex(lower('data value table'), '[^a-z0-9]+'),
         x -> x <> '')) AS term)"""

_SIM_TAIL = """
scores AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM scores
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked
WHERE rank <= 10"""

_SIM_LM_DIRICHLET_SQL = _SIM_BASE + """,
contrib AS (
  SELECT tf.doc_id,
         greatest(0.0,
           ln(1 + tf.tf / (2000.0 * (ts.ttf + 1.0)
                           / ((SELECT sum_ttf FROM corpus_lm) + 1.0)))
           + ln(2000.0 / (dl.dl + 2000.0))) AS c
  FROM tf JOIN qt USING (term)
  JOIN tstats ts USING (term)
  JOIN dl USING (doc_id)
),""" + _SIM_TAIL

_SIM_LM_JM_SQL = _SIM_BASE + """,
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (0.9 * tf.tf / dl.dl)
                / (0.1 * (ts.ttf + 1.0)
                   / ((SELECT sum_ttf FROM corpus_lm) + 1.0))) AS c
  FROM tf JOIN qt USING (term)
  JOIN tstats ts USING (term)
  JOIN dl USING (doc_id)
),""" + _SIM_TAIL

_SIM_DFI_SQL = _SIM_BASE + """,
contrib AS (
  SELECT tf.doc_id,
         CASE WHEN tf.tf <= e.expected THEN 0.0
              ELSE log2((tf.tf - e.expected) / sqrt(e.expected) + 1.0)
         END AS c
  FROM tf JOIN qt USING (term)
  JOIN tstats ts USING (term)
  JOIN dl USING (doc_id),
  LATERAL (SELECT (ts.ttf + 1.0) * dl.dl
                  / ((SELECT sum_ttf FROM corpus_lm) + 1.0)
           AS expected) e
),""" + _SIM_TAIL

_SIM_SCRIPTED_SQL = _SIM_BASE + """,
contrib AS (
  SELECT tf.doc_id,
         sqrt(tf.tf) * (1.0 + ln((SELECT n FROM corpus)::DOUBLE
                                 / (ts.df + 1.0))) AS c
  FROM tf JOIN qt USING (term)
  JOIN tstats ts USING (term)
  JOIN dl USING (doc_id)
),""" + _SIM_TAIL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents table."""
    return q_a7_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        "a1_term_freq": q_a1_term_freq,
        "a2_a3_term_stats": q_a2_a3_term_stats,
        "a4_field_stats": q_a4_field_stats,
        "a5_vocabulary": q_a5_vocabulary,
        "a7_bm25_topk": q_a7_bm25_topk,
        "a7_bm25_skewed_term": q_a7_bm25_skewed_term,
        "sim_lm_dirichlet": q_sim_lm_dirichlet,
        "sim_lm_jelinek_mercer": q_sim_lm_jelinek_mercer,
        "sim_dfi": q_sim_dfi,
        "sim_scripted": q_sim_scripted,
        "a8_nb_likelihood": q_a8_nb_likelihood,
        "a9_nb_predict": q_a9_nb_predict,
        "a6_accuracy": q_a6_accuracy,
        "maxent_predict": q_maxent_predict,
        "maxent_qn_predict": q_maxent_qn_predict,
        "perceptron_predict": q_perceptron_predict,
        "x1_kfold_counts": q_x1_kfold_counts,
        "p_filters": q_p_filters,
        "p12_json_path": q_p12_json_path,
        "p7_query_string": q_p7_query_string,
        "p5_match_filter": q_p5_match_filter,
        "o1_topk": q_o1_topk,
        "s4_term_vectors": q_s4_term_vectors,
        "s4_term_vectors_offsets": q_s4_term_vectors_offsets,
        "dedup_exact": q_dedup_exact,
        "dedup_incremental": q_dedup_incremental,
        "update_delete_by_query": q_update_delete_by_query,
        "nested_query": q_nested_query,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivfpq": q_ann_ivfpq,
        "events_windowed": q_events_windowed,
        "events_sessionize": q_events_sessionize,
        "text_token_counts": q_text_token_counts,
        "text_quality": q_text_quality,
        "text_fingerprints": q_text_fingerprints,
        "j2_enrich_updates": q_j2_enrich_updates,
        "a7_bm25_wand": q_a7_bm25_wand,
        "s5_term_vector_multiset": q_s5_term_vector_multiset,
        "s6_term_vector_distinct": q_s6_term_vector_distinct,
        "x2_kfold_shuffle": q_x2_kfold_shuffle,
        "a10_kfold_accuracy": q_a10_kfold_accuracy,
        "text_lang_id": q_text_lang_id,
        "mm_feature_extract": q_mm_feature_extract,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "text_rolling_fingerprint": q_text_rolling_fingerprint,
        "match_phrase": q_match_phrase,
        "p7_query_string_analyzed": q_p7_query_string_analyzed,
        "s8_merge_updates": q_s8_merge_updates,
        "quality_shape": q_quality_shape,
        "quality_repetition": q_quality_repetition,
        "sample_hash_split": q_sample_hash_split,
        "sample_stratified": q_sample_stratified,
        "qs_range_prohibit": q_qs_range_prohibit,
        "fuzzy_bm25": q_fuzzy_bm25,
        "fuzzy_auto": q_fuzzy_auto,
        "wand_deletes": q_wand_deletes,
        "mlt_topk": q_mlt_topk,
        "prefix_bm25": q_prefix_bm25,
        "suggest_terms": q_suggest_terms,
        "span_near": q_span_near,
        "percolate": q_percolate,
        "pii_stats": q_pii_stats,
        "pii_redact": q_pii_redact,
        "dedup_paragraphs": q_dedup_paragraphs,
        "agg_terms": q_agg_terms,
        "agg_histogram": q_agg_histogram,
        "agg_date_histogram": q_agg_date_histogram,
        "agg_pipeline": q_agg_pipeline,
        "agg_bucket_stats": q_agg_bucket_stats,
        "agg_rare_terms": q_agg_rare_terms,
        "agg_metrics_extras": q_agg_metrics_extras,
        "rollup_query": q_rollup_query,
        "asof_join": q_asof_join,
        "heavy_hitters": q_heavy_hitters,
        "range_join": q_range_join,
        "agg_multi_terms": q_agg_multi_terms,
        "agg_adjacency": q_agg_adjacency,
        "agg_auto_date_histogram": q_agg_auto_date_histogram,
        "agg_range": q_agg_range,
        "agg_extended_stats": q_agg_extended_stats,
        "agg_percentiles": q_agg_percentiles,
        "agg_cardinality": q_agg_cardinality,
        "agg_top_hits": q_agg_top_hits,
        "agg_significant_terms": q_agg_significant_terms,
        "agg_significant_chi_square": q_agg_significant_chi_square,
        "agg_significant_gnd": q_agg_significant_gnd,
        "graph_explore_vertices": q_graph_explore_vertices,
        "graph_explore_edges": q_graph_explore_edges,
        "ml_outlier_detection": q_ml_outlier_detection,
        "ml_anomaly_count": q_ml_anomaly_count,
        "rank_vectors_maxsim": q_rank_vectors_maxsim,
        "ml_regression_simple": q_ml_regression_simple,
        "agg_date_range": q_agg_date_range,
        "agg_filters": q_agg_filters,
        "agg_missing": q_agg_missing,
        "agg_sampler": q_agg_sampler,
        "agg_diversified_sampler": q_agg_diversified_sampler,
        "reindex_subset": q_reindex_subset,
        "terms_set": q_terms_set,
        "rank_eval": q_rank_eval,
        "regexp_bm25": q_regexp_bm25,
        "suggest_completion": q_suggest_completion,
        "match_phrase_prefix": q_match_phrase_prefix,
        "decay_score": q_decay_score,
        "random_score": q_random_score,
        "msearch": q_msearch,
        "domain_stats": q_domain_stats,
        "domain_quota": q_domain_quota,
        "dedup_spans": q_dedup_spans,
        "bool_query": q_bool_query,
        "highlight": q_highlight,
        "semantic_dedup": q_semantic_dedup,
        "collapse": q_collapse,
        "search_after": q_search_after,
        "composite_agg": q_composite_agg,
        "doc_chunks": q_doc_chunks,
        "function_score": q_function_score,
        "rescore_phrase": q_rescore_phrase,
        "decontaminate": q_decontaminate,
        "pack_mapping": q_pack_mapping,
        "dis_max": q_dis_max,
        "multi_match": q_multi_match,
        "constant_score": q_constant_score,
        "boosting": q_boosting,
        "lm_bigram_score": q_lm_bigram_score,
        "bpe_word_histogram": q_bpe_word_histogram,
        "hybrid_rrf": q_hybrid_rrf,
        "agg_terms_subs": q_agg_terms_subs,
        "resample_mix": q_resample_mix,
        "knn_filtered": q_knn_filtered,
        "phrase_suggest": q_phrase_suggest,
        "explain_bm25": q_explain_bm25,
        "synonym_match": q_synonym_match,
        "multi_index_bm25": q_multi_index_bm25,
        "web_clean": q_web_clean,
        "span_or": q_span_or,
        "span_first": q_span_first,
        "span_not": q_span_not,
        "intervals_unordered": q_intervals_unordered,
        "span_containing": q_span_containing,
        "span_within": q_span_within,
        "span_multi": q_span_multi,
        "simple_query_string": q_simple_query_string,
        "sqs_phrase_slop": q_sqs_phrase_slop,
        "agg_geohash_grid": q_agg_geohash_grid,
        "agg_random_sampler": q_agg_random_sampler,
        "agg_ip_prefix": q_agg_ip_prefix,
        "agg_change_point": q_agg_change_point,
        "agg_bucket_correlation": q_agg_bucket_correlation,
        "agg_ks_test": q_agg_ks_test,
        "terms_enum": q_terms_enum,
        "sparse_vector": q_sparse_vector,
        "search_as_you_type": q_search_as_you_type,
        "analysis_shingles": q_analysis_shingles,
        "agg_moving_percentiles": q_agg_moving_percentiles,
        "agg_geo_line": q_agg_geo_line,
        "alias_search": q_alias_search,
        "split_cluster_safe": q_split_cluster_safe,
        "agg_string_stats": q_agg_string_stats,
        "agg_boxplot": q_agg_boxplot,
        "agg_matrix_stats": q_agg_matrix_stats,
        "agg_t_test": q_agg_t_test,
        "agg_scripted_metric": q_agg_scripted_metric,
        "geo_grid": q_geo_grid,
        "geo_distance_rings": q_geo_distance_rings,
        "feat_hash_embed": q_feat_hash_embed,
        "shard_assignment": q_shard_assignment,
        "has_child": q_has_child,
        "has_parent": q_has_parent,
        "agg_children": q_agg_children,
        "mget": q_mget,
        "agg_percentile_ranks": q_agg_percentile_ranks,
        "agg_ip_range": q_agg_ip_range,
        "cross_fields": q_cross_fields,
        "eql_sequence": q_eql_sequence,
        "eql_until": q_eql_until,
        "eql_sample": q_eql_sample,
        "agg_bucket_pipeline2": q_agg_bucket_pipeline2,
        "agg_percentiles_bucket": q_agg_percentiles_bucket,
        "agg_rate_moving_fn": q_agg_rate_moving_fn,
        "agg_cumulative_cardinality": q_agg_cumulative_cardinality,
        "agg_variable_width_histogram": q_agg_variable_width_histogram,
        "agg_categorize_text": q_agg_categorize_text,
        "agg_frequent_item_sets": q_agg_frequent_item_sets,
        "agg_nested_reverse": q_agg_nested_reverse,
        "agg_parent": q_agg_parent,
        "match_bool_prefix": q_match_bool_prefix,
        "rank_feature": q_rank_feature,
        "distance_feature": q_distance_feature,
        "pinned_query": q_pinned_query,
        "script_score": q_script_score,
        "combined_fields": q_combined_fields,
        "esql_stats": q_esql_stats,
        "esql_docs": q_esql_docs,
        "esql_enrich": q_esql_enrich,
        "esql_dissect": q_esql_dissect,
        "transform_pivot": q_transform_pivot,
        "transform_latest": q_transform_latest,
        "transform_continuous": q_transform_continuous,
        "retriever_rrf": q_retriever_rrf,
        "ann_int8": q_ann_int8,
        "ann_bbq": q_ann_bbq,
        "ingest_pipeline": q_ingest_pipeline,
        "geo_shape": q_geo_shape,
        "collapse_inner": q_collapse_inner,
        "esql_lookup_join": q_esql_lookup_join,
        "msearch_sizes": q_msearch_sizes,
        "esql_match": q_esql_match,
        "esql_qstr": q_esql_qstr,
        "esql_change_point": q_esql_change_point,
        "esql_fork": q_esql_fork,
        "esql_inlinestats": q_esql_inlinestats,
        "agg_terms_filtered": q_agg_terms_filtered,
        "agg_terms_partition": q_agg_terms_partition,
        "sorted_index_topk": q_sorted_index_topk,
        "sorted_query_topk": q_sorted_query_topk,
        "indices_boost": q_indices_boost,
        "agg_terms_order_metric": q_agg_terms_order_metric,
        "dsir_select": q_dsir_select,
        "es_dsl_search": q_es_dsl_search,
        "es_dsl_nested_bool": q_es_dsl_nested_bool,
        "ltr_rescore": q_ltr_rescore,
        "percolate_scored": q_percolate_scored,
        "agg_histogram_dense": q_agg_histogram_dense,
        "composite_datehist": q_composite_datehist,
        "knn_cutoff": q_knn_cutoff,
    }
    # Round-5 grading rotation (VERDICT r4 #5): the driver grades the
    # FIRST 50 entries; rounds 1-4 graded a stable head subset, leaving
    # 182 entries repo-oracle-only.  Surface a disjoint, never-graded
    # 50 first (ES|QL, retrievers, spans/intervals, EQL, transforms,
    # the agg long tail, plus this round's p12) so the driver record
    # covers them; everything else keeps its order and stays green via
    # jobs/check_oracle.py over all entries.
    rotation = ['p12_json_path', 'match_phrase', 'p7_query_string_analyzed', 's8_merge_updates', 'bool_query', 'highlight', 'collapse', 'search_after', 'composite_agg', 'function_score', 'dis_max', 'multi_match', 'constant_score', 'boosting', 'span_near', 'span_or', 'span_not', 'intervals_unordered', 'span_containing', 'span_multi', 'simple_query_string', 'sqs_phrase_slop', 'eql_sequence', 'eql_until', 'eql_sample', 'esql_stats', 'esql_docs', 'esql_enrich', 'esql_dissect', 'esql_lookup_join', 'esql_match', 'esql_inlinestats', 'transform_pivot', 'transform_latest', 'transform_continuous', 'retriever_rrf', 'agg_terms', 'agg_histogram', 'agg_date_histogram', 'agg_pipeline', 'agg_percentiles', 'agg_cardinality', 'agg_top_hits', 'agg_significant_terms', 'agg_rare_terms', 'agg_scripted_metric', 'semantic_dedup', 'web_clean', 'has_child', 'ingest_pipeline']
    assert all(n in q for n in rotation), sorted(set(rotation) - set(q))
    rest = {k: v for k, v in q.items() if k not in set(rotation)}
    return {**{k: q[k] for k in rotation}, **rest}



# --- DuckDB oracles ----------------------------------------------------------

def _vwh_sql(buckets: int = 4, iters: int = 10) -> str:
    """Unrolled deterministic-Lloyd twin of
    variable_width_histogram_agg: equal-width seeds, ``iters``
    assignment/update rounds (empty clusters keep their centroid,
    ties to the lower index).  Integer inputs make every step exact
    FP, so the twin is bit-identical."""
    parts = [
        "v AS (SELECT n_chars::DOUBLE AS x FROM documents "
        "WHERE n_chars IS NOT NULL)",
        "mm AS (SELECT min(x) AS lo, max(x) AS hi FROM v)",
        f"c0 AS (SELECT t.i, lo + (t.i + 0.5) * (hi - lo) / {buckets} AS c"
        f" FROM mm, (SELECT unnest(range({buckets})) AS i) t)",
    ]
    for k in range(iters):
        parts.append(
            f"a{k} AS (SELECT x, (SELECT i FROM c{k} "
            f"ORDER BY abs(x - c), i LIMIT 1) AS i FROM v)"
        )
        parts.append(
            f"c{k + 1} AS (SELECT p.i, coalesce(m.c, p.c) AS c FROM c{k} p "
            f"LEFT JOIN (SELECT i, avg(x) AS c FROM a{k} GROUP BY 1) m "
            f"USING (i))"
        )
    parts.append(
        f"afin AS (SELECT x, (SELECT i FROM c{iters} "
        f"ORDER BY abs(x - c), i LIMIT 1) AS i FROM v)"
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT round(c.c, 6) AS key, min(a.x) AS min, max(a.x) AS max,
       count(*)::BIGINT AS doc_count
FROM afin a JOIN c{iters} c USING (i)
GROUP BY c.c ORDER BY key"""
    )


_RATE_MOVING_SQL = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS key_ts, count(*)::BIGINT AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
r AS (SELECT key_ts, doc_count, doc_count::DOUBLE / 60.0 AS rate FROM b)
SELECT key_ts, doc_count, round(rate, 6) AS rate,
       round(max(rate) OVER (ORDER BY key_ts
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_max
FROM r"""

_CUMCARD_SQL = """
WITH b AS (
  SELECT date_trunc('day', ts) AS key_ts, count(*)::BIGINT AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
f AS (
  SELECT user_id, min(date_trunc('day', ts)) AS key_ts FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1
),
n AS (SELECT key_ts, count(*)::BIGINT AS nn FROM f GROUP BY 1)
SELECT b.key_ts, b.doc_count,
       sum(coalesce(n.nn, 0)) OVER (ORDER BY b.key_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS cumulative_cardinality
FROM b LEFT JOIN n USING (key_ts)"""

_CATEGORIZE_SQL = """
WITH t AS (
  SELECT array_to_string(
    list_transform(
      list_filter(string_split_regex(
        lower(concat_ws(' ', event_type, props)), '[^a-z0-9]+'),
        x -> x <> ''),
      x -> CASE WHEN regexp_matches(x, '[0-9]') THEN '%{NUM}' ELSE x END),
    ' ') AS key
  FROM events
)
SELECT key, count(*)::BIGINT AS doc_count FROM t GROUP BY 1
ORDER BY doc_count DESC, key ASC LIMIT 10"""

_FREQ_ITEMS_SQL = """
WITH ex AS (
  SELECT DISTINCT doc_id, item FROM (
    SELECT doc_id, unnest([lang, source]) AS item FROM documents)
  WHERE item IS NOT NULL
),
tot AS (SELECT count(*)::DOUBLE AS n FROM documents),
singles AS (
  SELECT item, count(*)::BIGINT AS doc_count FROM ex GROUP BY 1
  HAVING count(*) >= 0.004 * (SELECT n FROM tot)
),
exf AS (SELECT ex.* FROM ex JOIN singles USING (item)),
pairs AS (
  SELECT l.item AS a, r.item AS b, count(*)::BIGINT AS doc_count
  FROM exf l JOIN exf r ON l.doc_id = r.doc_id AND l.item < r.item
  GROUP BY 1, 2 HAVING count(*) >= 0.004 * (SELECT n FROM tot)
),
allsets AS (
  SELECT item AS items, doc_count FROM singles
  UNION ALL
  SELECT a || ',' || b AS items, doc_count FROM pairs
)
SELECT items, round(doc_count / (SELECT n FROM tot), 6) AS support,
       doc_count
FROM allsets ORDER BY doc_count DESC, items ASC LIMIT 10"""

_NESTED_REVERSE_SQL = """
WITH n AS (
  SELECT event_type AS key, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
),
r AS (
  SELECT key, count(*)::BIGINT AS parent_count FROM (
    SELECT DISTINCT user_id, event_type AS key FROM events)
  GROUP BY 1
)
SELECT n.key, n.doc_count, r.parent_count FROM n JOIN r USING (key)
ORDER BY doc_count DESC, key ASC"""

_PARENT_AGG_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o_orderkey, l_returnflag AS key
  FROM lineitem WHERE l_quantity >= 30
),
p AS (SELECT DISTINCT o_orderkey FROM orders)
SELECT key, count(*)::BIGINT AS doc_count
FROM pairs JOIN p USING (o_orderkey)
GROUP BY 1 ORDER BY doc_count DESC, key ASC"""

_NB_SQL_BASE = _TF + """,
labeled AS (SELECT doc_id, lang AS label FROM documents
            WHERE lang IS NOT NULL AND lang <> ''),
term_counts AS (
  SELECT l.label, tf.term, sum(tf.tf)::BIGINT AS cnt
  FROM tf JOIN labeled l USING (doc_id) GROUP BY 1, 2
),
vocab AS (SELECT DISTINCT term FROM term_counts),
v AS (SELECT count(*)::BIGINT AS v FROM vocab),
class_totals AS (SELECT label, sum(cnt)::BIGINT AS total
                 FROM term_counts GROUP BY 1),
doc_counts AS (SELECT label, count(*)::BIGINT AS n_docs FROM labeled GROUP BY 1),
n_total AS (SELECT count(*)::BIGINT AS n FROM labeled),
priors AS (
  SELECT d.label,
         ln(d.n_docs / (SELECT n FROM n_total)::DOUBLE) AS log_prior,
         ln(1.0 / (ct.total + (SELECT v FROM v))) AS default_ll,
         ct.total AS total
  FROM doc_counts d JOIN class_totals ct USING (label)
),
likelihood AS (
  SELECT tc.label, tc.term,
         ln((tc.cnt + 1.0) / (p.total + (SELECT v FROM v))) AS ll
  FROM term_counts tc JOIN priors p USING (label)
)"""

_NB_PREDICT_SQL = _NB_SQL_BASE + """,
known AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf
          JOIN vocab USING (term)),
known_len AS (SELECT doc_id, sum(tf)::BIGINT AS known_cnt
              FROM known GROUP BY 1),
all_docs AS (SELECT doc_id FROM documents),
seen AS (
  SELECT k.doc_id, l.label,
         sum(k.tf * (l.ll - p.default_ll)) AS seen_part
  FROM known k JOIN likelihood l USING (term)
  JOIN priors p ON p.label = l.label
  GROUP BY 1, 2
),
scores AS (
  SELECT a.doc_id, p.label,
         p.log_prior
         + coalesce(kl.known_cnt, 0) * p.default_ll
         + coalesce(s.seen_part, 0.0) AS score
  FROM all_docs a
  CROSS JOIN priors p
  LEFT JOIN known_len kl ON kl.doc_id = a.doc_id
  LEFT JOIN seen s ON s.doc_id = a.doc_id AND s.label = p.label
),
pred AS (
  SELECT doc_id, label AS prediction,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(score, 9) DESC, label ASC) AS rn
  FROM scores
)"""

_BM25_SQL = _BM25_BASE + """,
qt AS (SELECT DISTINCT unnest(list_filter(
         string_split_regex(lower('{QUERY}'), '[^a-z0-9]+'),
         x -> x <> '')) AS term),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))
           * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM corpus)))
           AS c
  FROM tf
  JOIN qt USING (term)
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
),
scores AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC) AS rank,
         round(score, 6) AS score_r6
  FROM scores
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

# word-5-shingle twin of _SHINGLES_SQL (minhash verify contract)
_SHINGLES5_SQL = """
toks_d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
  FROM docs_dup
),
sh0 AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 5
         THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
         ELSE [array_to_string(w, ' ')] END) AS shingle
  FROM toks_d
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle <> ''),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)"""

_SHINGLES_SQL = """
toks_d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
  FROM docs_dup
),
sh0 AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
         THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
         ELSE [array_to_string(w, ' ')] END) AS shingle
  FROM toks_d
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle <> ''),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)"""


def _nb_fold_acc_sql(fold: int) -> str:
    """Per-fold NB train/test/accuracy — the _NB_SQL_BASE machinery
    parameterized by the reference's deterministic id%k fold split."""
    return f"""(WITH {_TF},
labeled AS (SELECT doc_id, lang AS label FROM documents
            WHERE lang IS NOT NULL AND lang <> ''),
train AS (SELECT * FROM labeled WHERE doc_id % 3 <> {fold}),
test  AS (SELECT * FROM labeled WHERE doc_id % 3 = {fold}),
term_counts AS (
  SELECT t.label, tf.term, sum(tf.tf)::BIGINT AS cnt
  FROM tf JOIN train t USING (doc_id) GROUP BY 1, 2
),
vocab AS (SELECT DISTINCT term FROM term_counts),
v AS (SELECT count(*)::BIGINT AS v FROM vocab),
class_totals AS (SELECT label, sum(cnt)::BIGINT AS total
                 FROM term_counts GROUP BY 1),
doc_counts AS (SELECT label, count(*)::BIGINT AS n_docs FROM train GROUP BY 1),
n_total AS (SELECT count(*)::BIGINT AS n FROM train),
priors AS (
  SELECT d.label,
         ln(d.n_docs / (SELECT n FROM n_total)::DOUBLE) AS log_prior,
         ln(1.0 / (ct.total + (SELECT v FROM v))) AS default_ll,
         ct.total AS total
  FROM doc_counts d JOIN class_totals ct USING (label)
),
likelihood AS (
  SELECT tc.label, tc.term,
         ln((tc.cnt + 1.0) / (p.total + (SELECT v FROM v))) AS ll
  FROM term_counts tc JOIN priors p USING (label)
),
known AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf
          JOIN vocab USING (term) JOIN test USING (doc_id)),
known_len AS (SELECT doc_id, sum(tf)::BIGINT AS known_cnt
              FROM known GROUP BY 1),
seen AS (
  SELECT k.doc_id, l.label,
         sum(k.tf * (l.ll - p.default_ll)) AS seen_part
  FROM known k JOIN likelihood l USING (term)
  JOIN priors p ON p.label = l.label
  GROUP BY 1, 2
),
scores AS (
  SELECT a.doc_id, p.label,
         p.log_prior
         + coalesce(kl.known_cnt, 0) * p.default_ll
         + coalesce(s.seen_part, 0.0) AS score
  FROM test a
  CROSS JOIN priors p
  LEFT JOIN known_len kl ON kl.doc_id = a.doc_id
  LEFT JOIN seen s ON s.doc_id = a.doc_id AND s.label = p.label
),
pred AS (
  SELECT doc_id, label AS prediction,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(score, 9) DESC, label ASC) AS rn
  FROM scores
)
SELECT {fold}::BIGINT AS fold,
       round(avg(CASE WHEN p.prediction = d.label
                      THEN 1.0 ELSE 0.0 END), 6) AS acc_r6
FROM pred p JOIN test d USING (doc_id) WHERE p.rn = 1)"""


def _lang_id_sql() -> str:
    """Marker-word argmax language ID — generated from the SAME
    LANG_MARKERS table the Spark operator uses (single source of
    truth; ties break by language code ASC)."""
    from elasticsearch_nlp_classifier_spark.operators.textstats import (
        LANG_MARKERS,
    )

    codes = sorted(LANG_MARKERS)
    hit_cols = ",\n         ".join(
        "len(list_intersect(w, [{}]))::BIGINT AS {}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[c]), c
        )
        for c in codes
    )
    mx = "greatest({})".format(", ".join(codes))
    tie_chain = "\n       ".join(
        f"WHEN {c} = {mx} THEN '{c}'" for c in codes
    )
    return f"""
WITH words AS (
  SELECT doc_id, text,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS w
  FROM documents
),
hits AS (
  SELECT doc_id, text,
         {hit_cols}
  FROM words
)
SELECT doc_id,
       CASE
       WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
       WHEN {mx} = 0 THEN 'und'
       {tie_chain}
       END AS lang_pred
FROM hits"""


def _rolling_fp_oracle() -> str:
    from elasticsearch_nlp_classifier_spark.operators.textstats import (
        rolling_fingerprint_sql,
    )

    return (
        f"SELECT doc_id, {rolling_fingerprint_sql('text')} AS rolling_fp "
        "FROM documents"
    )


_QUALITY_SHAPE_SQL = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     x -> x <> '') AS words,
         list_filter(string_split(coalesce(text, ''), chr(10)),
                     x -> trim(x) <> '') AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         coalesce(list_sum(list_transform(words, w -> length(w))), 0)
           AS wchars,
         len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
           AS alpha_w,
         length(t) - length(replace(t, '#', '')) AS n_hash,
         len(regexp_extract_all(t, '(\\.\\.\\.|…)')) AS n_ell,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         coalesce(list_sum(list_transform(lines, ln -> length(ln))), 0)
           AS lchars,
         coalesce(list_sum(list_transform(list_distinct(lines),
             d -> (len(list_filter(lines, ln -> ln = d)) - 1)
                  * length(d))), 0) AS dchars
  FROM base
)
SELECT doc_id, n_words::BIGINT AS n_words,
       round(CASE WHEN n_words > 0 THEN wchars * 1.0 / n_words
                  ELSE 0 END, 6) AS mean_word_len_r6,
       round(CASE WHEN n_words > 0 THEN alpha_w * 1.0 / n_words
                  ELSE 0 END, 6) AS alpha_word_frac_r6,
       round(CASE WHEN n_words > 0 THEN (n_hash + n_ell) * 1.0 / n_words
                  ELSE 0 END, 6) AS symbol_word_ratio_r6,
       round(CASE WHEN n_lines > 0 THEN (n_lines - n_dlines) * 1.0 / n_lines
                  ELSE 0 END, 6) AS dup_line_frac_r6,
       round(CASE WHEN lchars > 0 THEN dchars * 1.0 / lchars
                  ELSE 0 END, 6) AS dup_line_char_frac_r6
FROM m"""

# fuzzy expansion twin: qt = indexed terms with levenshtein <= 1 of
# 'table', capped 50 by (distance, term) — same cap order as
# query/fuzzy.py
_BM25_TAIL = _BM25_SQL[_BM25_SQL.index("contrib AS ("):]
_FUZZY_BM25_SQL = _BM25_BASE + """,
qt AS (
  SELECT term FROM (
    SELECT term, levenshtein(term, 'table') AS d
    FROM stats WHERE abs(length(term) - 5) <= 1
  ) WHERE d <= 1 ORDER BY d, term LIMIT 50
),
""" + _BM25_TAIL

# fuzziness AUTO twin: per-token allowance by length (of: 0 edits,
# tble: 1, dataset: 2), each expansion capped 50 by (dist, term)
_FUZZY_AUTO_SQL = _BM25_BASE + """,
qt AS (
  (SELECT term FROM (
     SELECT term, levenshtein(term, 'of') AS d
     FROM stats WHERE abs(length(term) - 2) <= 0
   ) WHERE d <= 0 ORDER BY d, term LIMIT 50)
  UNION
  (SELECT term FROM (
     SELECT term, levenshtein(term, 'tble') AS d
     FROM stats WHERE abs(length(term) - 4) <= 1
   ) WHERE d <= 1 ORDER BY d, term LIMIT 50)
  UNION
  (SELECT term FROM (
     SELECT term, levenshtein(term, 'dataset') AS d
     FROM stats WHERE abs(length(term) - 7) <= 2
   ) WHERE d <= 2 ORDER BY d, term LIMIT 50)
),
""" + _BM25_TAIL

# match_bool_prefix twin: full tokens OR last-token dictionary
# expansion (term ASC, cap 50) — same rewrite as query/mlt.py
_MBP_SQL = _BM25_BASE + """,
exp AS (SELECT term FROM stats WHERE term LIKE 'val%'
        ORDER BY term LIMIT 50),
qt AS (SELECT 'data' AS term UNION SELECT term FROM exp),
""" + _BM25_TAIL

# search_as_you_type twin: base-field bool_prefix score + the ._2gram
# shingle subfield's bool_prefix score (query "data val" analyzed by
# the shingle2 chain = ONE trailing shingle -> pure prefix expansion
# 'data val%'), summed most_fields-style (query/mlt.py:
# search_as_you_type_topk; per-field frames are full here).
_SAYT_SQL = _BM25_BASE + """,
exp AS (SELECT term FROM stats WHERE term LIKE 'val%'
        ORDER BY term LIMIT 50),
qt AS (SELECT 'data' AS term UNION SELECT term FROM exp),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))
           * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM corpus)))
           AS c
  FROM tf JOIN qt USING (term) JOIN stats s USING (term)
  JOIN dl USING (doc_id)
),
base AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1),
shw AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
              ELSE CAST([] AS VARCHAR[]) END AS w2
  FROM toks
),
dl2 AS (SELECT doc_id, len(w2)::BIGINT AS dl FROM shw WHERE len(w2) > 0),
posts2 AS (SELECT doc_id, unnest(w2) AS term FROM shw),
tf2 AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM posts2 GROUP BY 1, 2),
stats2 AS (SELECT term, count(*)::BIGINT AS df FROM tf2 GROUP BY 1),
corpus2 AS (SELECT count(*)::BIGINT AS n,
                   sum(dl)::DOUBLE / count(*) AS avgdl FROM dl2),
qt2 AS (SELECT term FROM stats2 WHERE term LIKE 'data val%'
        ORDER BY term LIMIT 50),
contrib2 AS (
  SELECT tf2.doc_id,
         ln(1 + ((SELECT n FROM corpus2) - s.df + 0.5) / (s.df + 0.5))
           * tf2.tf
           / (tf2.tf + 1.2 * (0.25 + 0.75 * dl2.dl
                              / (SELECT avgdl FROM corpus2)))
           AS c
  FROM tf2 JOIN qt2 USING (term) JOIN stats2 s USING (term)
  JOIN dl2 USING (doc_id)
),
shsc AS (SELECT doc_id, sum(c) AS score FROM contrib2 GROUP BY 1),
comb AS (
  SELECT coalesce(b.doc_id, s.doc_id) AS doc_id,
         coalesce(b.score, 0.0) + coalesce(s.score, 0.0) AS score
  FROM base b FULL OUTER JOIN shsc s USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM comb
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked
WHERE rank <= 10"""

# BM25 full score set (no top-k cut) for the feature-scoring twins
_BM25_SCORES = _BM25_SQL[: _BM25_SQL.index("ranked AS (")].replace(
    "{QUERY}", "data value table"
)

# rank_feature twin: BM25 + saturation(n_chars) with the exact
# geometric-mean pivot (query/features.py spec)
_RANK_FEATURE_SQL = _BM25_SCORES + """
gm AS (SELECT exp(avg(ln(n_chars::DOUBLE))) AS p
       FROM documents WHERE n_chars > 0),
feat AS (SELECT doc_id,
                n_chars::DOUBLE / (n_chars::DOUBLE + (SELECT p FROM gm))
                  AS f
         FROM documents),
fin AS (
  SELECT s.doc_id, s.score + coalesce(f.f, 0.0) AS score
  FROM scores s LEFT JOIN feat f USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM fin
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

_DISTANCE_FEATURE_SQL = """
WITH scored AS (
  SELECT doc_id,
         1.0 * 50.0 / (50.0 + abs(n_chars::DOUBLE - 300.0)) AS score
  FROM documents WHERE n_chars IS NOT NULL
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM scored
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

# pinned twin: pins first in list order (missing ids dropped), organic
# BM25 follows with pins removed; pinned rows carry NULL score
_PINNED_SQL = _BM25_SCORES + """
pins AS (
  SELECT p.doc_id, p.pin_order
  FROM (VALUES (7, 0), (3, 1), (999999, 2)) AS p(doc_id, pin_order)
  WHERE p.doc_id IN (SELECT doc_id FROM documents)
),
un AS (
  SELECT doc_id, TRUE AS pinned, pin_order, NULL::DOUBLE AS score
  FROM pins
  UNION ALL
  SELECT doc_id, FALSE AS pinned, NULL::INT AS pin_order, score
  FROM scores WHERE doc_id NOT IN (7, 3, 999999)
),
ranked AS (
  SELECT doc_id, pinned, score,
         row_number() OVER (
           ORDER BY pinned DESC, pin_order ASC NULLS LAST,
                    round(score, 9) DESC NULLS LAST, doc_id ASC) AS rank
  FROM un
)
SELECT rank::BIGINT AS rank, doc_id, pinned, round(score, 6) AS score_r6
FROM ranked WHERE rank <= 10"""

# script_score twin: ln(1+_score) * (1 + n_chars/1000)
_SCRIPT_SCORE_SQL = _BM25_SCORES + """
fin AS (
  SELECT s.doc_id,
         ln(1.0 + s.score) * (1.0 + d.n_chars::DOUBLE / 1000.0) AS score
  FROM scores s LEFT JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM fin
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

# combined_fields twin: BM25F-lite merge of text (w=1) and source
# (w=2) — tf' = Σ w_f·tf_f, dl' = Σ w_f·dl_f, df' over the merged
# relation (query/features.py spec)
_COMBINED_FIELDS_SQL = """
WITH toks_t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
         '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
toks_s AS (
  SELECT doc_id, list_filter(string_split_regex(lower(source),
         '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
p_t AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM
        (SELECT doc_id, unnest(w) AS term FROM toks_t) GROUP BY 1, 2),
p_s AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM
        (SELECT doc_id, unnest(w) AS term FROM toks_s) GROUP BY 1, 2),
dl AS (
  SELECT doc_id, sum(dlp) AS dl FROM (
    SELECT doc_id, 1.0 * len(w) AS dlp FROM toks_t WHERE len(w) > 0
    UNION ALL
    SELECT doc_id, 2.0 * len(w) AS dlp FROM toks_s WHERE len(w) > 0
  ) GROUP BY 1
),
tfm AS (
  SELECT doc_id, term, sum(tfp) AS tf FROM (
    SELECT doc_id, term, 1.0 * tf AS tfp FROM p_t
    UNION ALL
    SELECT doc_id, term, 2.0 * tf AS tfp FROM p_s
  ) GROUP BY 1, 2
),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tfm GROUP BY 1),
corpus AS (SELECT count(*)::BIGINT AS n,
                  sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
qt AS (SELECT DISTINCT unnest(list_filter(
         string_split_regex(lower('data value src3'), '[^a-z0-9]+'),
         x -> x <> '')) AS term),
contrib AS (
  SELECT t.doc_id,
         ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))
           * t.tf
           / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / (SELECT avgdl FROM corpus)))
           AS c
  FROM tfm t
  JOIN qt USING (term)
  JOIN stats s USING (term)
  JOIN dl d USING (doc_id)
),
scores AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM scores
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

# tombstone twin: scores over the as-built stats (Lucene pre-merge
# contract), live docs only enter the ranking
_WAND_DELETES_SQL = _BM25_SQL.replace("{QUERY}", "data value table").replace(
    "FROM scores\n)", "FROM scores WHERE doc_id % 7 <> 0\n)"
)

# more-like-this twin: source doc 0's top-10 terms by
# round(tf·idf, 9) DESC, term ASC; source excluded from the ranking
_MLT_SQL = (_BM25_BASE + """,
mlt AS (
  SELECT tf.term,
         round(tf.tf * ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                              / (s.df + 0.5)), 9) AS ms
  FROM tf JOIN stats s USING (term)
  WHERE tf.doc_id = 0
),
qt AS (SELECT term FROM mlt ORDER BY ms DESC, term ASC LIMIT 10),
""" + _BM25_TAIL).replace(
    "FROM scores\n)", "FROM scores WHERE doc_id <> 0\n)"
)

# prefix-query twin: dictionary expansion term ASC, cap 50
_PREFIX_SQL = _BM25_BASE + """,
qt AS (SELECT term FROM stats WHERE term LIKE 'tab%'
       ORDER BY term LIMIT 50),
""" + _BM25_TAIL

# regexp-query twin: anchored RE2 over the dictionary, term ASC cap 50
_REGEXP_SQL = _BM25_BASE + """,
qt AS (SELECT term FROM stats
       WHERE regexp_matches(term, '^(?:dat[a-z]*)$')
       ORDER BY term LIMIT 50),
""" + _BM25_TAIL

# gauss-decay function_score twin: BM25('data value table') × the ES
# reference decay curve on n_chars (origin 200, scale 100, decay 0.5)
_DECAY_SQL = _BM25_BASE + """,
qt AS (SELECT DISTINCT unnest(list_filter(
         string_split_regex(lower('data value table'), '[^a-z0-9]+'),
         x -> x <> '')) AS term),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))
           * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM corpus)))
           AS c
  FROM tf
  JOIN qt USING (term)
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
),
scores AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1),
dist AS (
  SELECT doc_id, greatest(abs(n_chars - 200.0) - 0.0, 0.0) AS d
  FROM documents
),
decayed AS (
  SELECT s.doc_id,
         s.score * exp(-(dist.d * dist.d)
                       / (2.0 * (-(100.0 * 100.0) / (2.0 * ln(0.5)))))
           AS score
  FROM scores s JOIN dist USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC) AS rank,
         round(score, 6) AS score_r6
  FROM decayed
)
SELECT rank::BIGINT AS rank, doc_id, score_r6 FROM ranked WHERE rank <= 10"""

# msearch twin: per-query BM25 ranking over a 2-query batch
_MSEARCH_SQL = _BM25_BASE + """,
queries(query_id, qtext) AS (
  VALUES (1, 'data value table'), (2, 'hash join merge')
),
qt AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(
           string_split_regex(lower(qtext), '[^a-z0-9]+'),
           x -> x <> '')) AS term
  FROM queries
),
contrib AS (
  SELECT qt.query_id, tf.doc_id,
         ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))
           * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM corpus)))
           AS c
  FROM tf
  JOIN qt USING (term)
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
),
scores AS (SELECT query_id, doc_id, sum(c) AS score
           FROM contrib GROUP BY 1, 2),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC)
           AS rank,
         round(score, 6) AS score_r6
  FROM scores
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score_r6
FROM ranked WHERE rank <= 10"""

_SUGGEST_SQL = f"""
WITH {_TF},
stats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT term, levenshtein(term, 'dat')::BIGINT AS dist, df
FROM stats
WHERE abs(length(term) - 3) <= 2 AND levenshtein(term, 'dat') <= 2
ORDER BY dist ASC, df DESC, term ASC LIMIT 5"""


def _cluster_split_case() -> str:
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        hash_split_sql,
    )

    return hash_split_sql(
        {"train": 0.8, "val": 0.1, "test": 0.1}, id_expr="r", salt="split"
    )


def _geohash_grid_oracle() -> str:
    """agg_geohash_grid twin: the SAME unrolled interleave arithmetic
    (query/geo.py:geohash_key_sql) over the synthetic customer coords —
    cell ordinates are floor() of exact integer-derived doubles, so the
    keys agree bit-for-bit."""
    from elasticsearch_nlp_classifier_spark.query.geo import geohash_key_sql

    lat = "(((c_custkey * 37) % 18000) / 100.0 - 90.0)"
    lon = "(((c_custkey * 73) % 36000) / 100.0 - 180.0)"
    gh = geohash_key_sql(lat, lon, 3)
    return f"""
        WITH k AS (SELECT {gh} AS key FROM customer)
        SELECT key, count(*)::BIGINT AS doc_count
        FROM k GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 20"""


def _hash_u(id_expr: str, salt: str) -> str:
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        hash_uniform_sql,
    )

    return hash_uniform_sql(id_expr, salt)


def _hash_split_case() -> str:
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        hash_split_sql,
    )

    return hash_split_sql(
        {"train": 0.8, "dev": 0.1, "test": 0.1}, "doc_id", "split"
    )


def _quality_repetition_sql() -> str:
    from elasticsearch_nlp_classifier_spark.operators.quality import (
        repetition_stats_sql,
    )

    return repetition_stats_sql()


def oracle_sql() -> dict[str, str]:
    from elasticsearch_nlp_classifier_spark.operators.domains import (
        DOMAIN_RX as _DOMAIN_RX_SQL,
    )

    sqls = {
        "a1_term_freq": f"WITH {_TF} SELECT doc_id, term, tf FROM tf",
        "a2_a3_term_stats": f"""
            WITH {_TF}
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
            FROM tf GROUP BY term""",
        "a4_field_stats": f"""
            WITH {_TF}
            SELECT count(DISTINCT doc_id)::BIGINT AS doc_count,
                   sum(tf)::BIGINT AS sum_ttf,
                   count(*)::BIGINT AS sum_doc_freq,
                   round(sum(tf)::DOUBLE / count(DISTINCT doc_id), 6) AS avgdl
            FROM tf""",
        "a5_vocabulary": f"""
            WITH {_TF} SELECT DISTINCT term FROM tf ORDER BY term""",
        "a7_bm25_topk": "WITH " + _BM25_SQL.replace("{QUERY}", "data value table"),
        "sim_lm_dirichlet": "WITH " + _SIM_LM_DIRICHLET_SQL,
        "sim_lm_jelinek_mercer": "WITH " + _SIM_LM_JM_SQL,
        "sim_dfi": "WITH " + _SIM_DFI_SQL,
        "sim_scripted": "WITH " + _SIM_SCRIPTED_SQL,
        "match_bool_prefix": "WITH " + _MBP_SQL,
        "search_as_you_type": "WITH " + _SAYT_SQL,
        "analysis_shingles": f"""
            WITH {_TOKS},
            sh AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(w) >= 2
                       THEN [w[i] || ' ' || w[i+1]
                             for i in range(1, len(w))]
                       ELSE CAST([] AS VARCHAR[]) END) AS shingle
              FROM toks
            )
            SELECT doc_id, shingle, count(*)::BIGINT AS tf
            FROM sh GROUP BY 1, 2""",
        "agg_rate_moving_fn": _RATE_MOVING_SQL,
        "agg_cumulative_cardinality": _CUMCARD_SQL,
        "agg_variable_width_histogram": _vwh_sql(4, 10),
        "agg_categorize_text": _CATEGORIZE_SQL,
        "agg_frequent_item_sets": _FREQ_ITEMS_SQL,
        "agg_nested_reverse": _NESTED_REVERSE_SQL,
        "agg_parent": _PARENT_AGG_SQL,
        "rank_feature": "WITH " + _RANK_FEATURE_SQL,
        "distance_feature": _DISTANCE_FEATURE_SQL,
        "pinned_query": "WITH " + _PINNED_SQL,
        "script_score": "WITH " + _SCRIPT_SCORE_SQL,
        "combined_fields": _COMBINED_FIELDS_SQL,
        "a7_bm25_skewed_term": "WITH " + _BM25_SQL.replace("{QUERY}", "the"),
        "a8_nb_likelihood": f"""
            WITH {_NB_SQL_BASE}
            SELECT label, term, round(ll, 6) AS ll_r6 FROM likelihood""",
        "a9_nb_predict": f"""
            WITH {_NB_PREDICT_SQL}
            SELECT doc_id, prediction FROM pred WHERE rn = 1""",
        "a6_accuracy": f"""
            WITH {_NB_PREDICT_SQL}
            SELECT round(avg(CASE WHEN p.prediction = d.lang
                                  THEN 1.0 ELSE 0.0 END), 6) AS accuracy
            FROM pred p JOIN documents d USING (doc_id) WHERE p.rn = 1""",
        # maxent/perceptron: training is iterative (not SQL); the
        # oracle replays the distributed predict stage from the
        # materialized test features + long-format weights
        "maxent_predict": _linear_predict_sql("maxent"),
        "maxent_qn_predict": _linear_predict_sql("maxent_qn"),
        "perceptron_predict": _linear_predict_sql("perceptron"),
        "x1_kfold_counts": """
            SELECT (doc_id % 3)::BIGINT AS fold, count(*)::BIGINT AS n
            FROM documents GROUP BY 1 ORDER BY 1""",
        "p_filters": """
            SELECT doc_id, lang, source FROM documents
            WHERE lang IS NOT NULL AND lang <> ''
              AND NOT source = 'src0' AND n_chars > 200""",
        "p12_json_path": """
            WITH j AS (
              SELECT doc_id,
                     json_object(
                       'doc_id', doc_id,
                       'meta.lang', lang,
                       'meta', json_object('lang', source),
                       'nested', json_object('lang', source),
                       'n', n_chars) AS doc
              FROM documents)
            SELECT doc_id,
                   COALESCE(json_extract_string(doc, '$."meta.lang"'),
                            json_extract_string(doc, '$.meta.lang'),
                            '') AS lit_first,
                   COALESCE(json_extract_string(doc, '$."nested.lang"'),
                            json_extract_string(doc, '$.nested.lang'),
                            '') AS nested_fb,
                   COALESCE(json_extract_string(doc, '$."n"'), '') AS n_str,
                   COALESCE(json_extract_string(doc, '$."missing.key"'),
                            json_extract_string(doc, '$.missing.key'),
                            '') AS miss
            FROM j ORDER BY doc_id""",
        "p7_query_string": """
            SELECT doc_id FROM documents
            WHERE (lang = 'en' OR lang = 'de')
              AND NOT source = 'src3'
              AND CAST(n_chars AS VARCHAR) LIKE '2%'""",
        "p5_match_filter": f"""
            WITH {_TF}
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('data', 'value', 'zzz_absent')""",
        "o1_topk": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10""",
        "s4_term_vectors": f"""
            WITH {_TF},
            stats AS (SELECT term, count(*)::BIGINT AS df,
                             sum(tf)::BIGINT AS ttf
                      FROM tf GROUP BY 1)
            SELECT tf.doc_id, tf.term, tf.tf, s.df, s.ttf
            FROM tf JOIN stats s USING (term) WHERE tf.doc_id < 3""",
        # offsets recomputed independently by the gap-cumsum identity:
        # text == gaps[1]·toks[1]·gaps[2]·…·toks[n]·gaps[n+1], so
        # start_i = Σ_{j≤i}(|gap_j|+|tok_j|) − |tok_i| — a window
        # cumsum over the unnested token stream, no offset API used
        "s4_term_vectors_offsets": f"""
            WITH {_TF},
            stats AS (SELECT term, count(*)::BIGINT AS df,
                             sum(tf)::BIGINT AS ttf
                      FROM tf GROUP BY 1),
            lists AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS tk,
                     string_split_regex(lower(text), '[a-z0-9]+') AS gaps
              FROM documents WHERE doc_id < 40
            ),
            occ AS (
              SELECT doc_id, unnest(tk) AS term,
                     generate_subscripts(tk, 1) AS i, gaps
              FROM lists
            ),
            spans AS (
              SELECT doc_id, term, (i - 1)::BIGINT AS pos,
                     (SUM(length(gaps[i]) + length(term)) OVER
                        (PARTITION BY doc_id ORDER BY i))::BIGINT
                       AS cum,
                     length(term) AS tl
              FROM occ
            )
            SELECT s.doc_id, s.term, t.tf, st.df, st.ttf, s.pos,
                   (s.cum - s.tl)::BIGINT AS start_offset,
                   s.cum AS end_offset
            FROM spans s
            JOIN tf t ON t.doc_id = s.doc_id AND t.term = s.term
            JOIN stats st ON st.term = s.term""",
        "dedup_exact": f"""
            WITH {_DUPS_SQL}
            SELECT sha256(text) AS sha, count(*)::BIGINT AS n_dups,
                   min(doc_id) AS keep_id
            FROM docs_dup GROUP BY 1 HAVING count(*) > 1""",
        # nested-element semantics coincide with row semantics here
        # because the array elements ARE the event rows; the Spark side
        # proves the array-of-struct exists/posexplode path
        "nested_query": """
            SELECT user_id, count(*)::BIGINT AS n_hits
            FROM events
            WHERE event_type = 'error' AND value > 50
            GROUP BY 1""",
        "update_delete_by_query": """
            SELECT doc_id,
                   CASE WHEN n_chars < 150 THEN 'short' ELSE lang END
                     AS lang
            FROM documents
            WHERE NOT coalesce(n_chars >= 450, FALSE)""",
        # bloom + verify output is EXACT, so the oracle is the plain
        # content anti-join the operator's fpp never changes
        "dedup_incremental": """
            WITH hist AS (
              SELECT text FROM documents WHERE doc_id < 250
            ),
            new AS (
              SELECT doc_id, lang, text FROM documents
              WHERE doc_id >= 250
              UNION ALL
              SELECT doc_id + 10000, lang, text FROM documents
              WHERE doc_id < 50
            )
            SELECT n.doc_id, n.lang FROM new n
            WHERE NOT EXISTS (
              SELECT 1 FROM hist h WHERE h.text = n.text
            )""",
        "dedup_ngram_jaccard": f"""
            WITH {_DUPS_SQL}, {_SHINGLES_SQL}
            SELECT id_a, id_b,
                   round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard_r6
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8""",
        # minhash's output CONTRACT (all pairs with 5-shingle jaccard
        # >= 0.8; exact verify inside) is SQL — full end-to-end oracle
        "dedup_minhash_lsh": f"""
            WITH {_DUPS_SQL}, {_SHINGLES5_SQL}
            SELECT id_a, id_b,
                   round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard_r6
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8""",
        # banding + hamming + distinct replayed in SQL from the
        # materialized signatures (hash family pytest-gated)
        "dedup_simhash": f"""
            WITH sigs AS (
              SELECT id, simhash,
                     (simhash::HUGEINT + CASE WHEN simhash < 0
                        THEN 18446744073709551616::HUGEINT
                        ELSE 0::HUGEINT END) AS us
              FROM read_parquet('{{SCRATCH}}/simhash_sigs.parquet/*.parquet')
            ),
            banded AS (
              SELECT id, simhash, b.band,
                CASE b.band
                  WHEN 0 THEN (us % 65536)
                  WHEN 1 THEN ((us // 65536) % 65536)
                  WHEN 2 THEN ((us // 4294967296) % 65536)
                  ELSE ((us // 281474976710656) % 65536) END AS bucket
              FROM sigs, (VALUES (0), (1), (2), (3)) b(band)
            ),
            pairs AS (
              SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                     bit_count(xor(l.simhash, r.simhash))::BIGINT AS hamming
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            )
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""",
        # pair graph re-derived in SQL, closure via recursive CTE —
        # end-to-end oracle on the connected-components semantics
        "dedup_clusters": f"""
            WITH RECURSIVE {_DUPS3_SQL}, {_SHINGLES_SQL},
            dpairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
            ),
            dedges AS (
              SELECT id_a AS src, id_b AS dst FROM dpairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM dpairs
            ),
            reach(id, lbl) AS (
              SELECT src, src FROM dedges
              UNION
              SELECT e.src, r.lbl
              FROM dedges e JOIN reach r ON r.id = e.dst
            )
            SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id""",
        # exact rerank replayed in SQL from the materialized IVF
        # candidate set (centroid training pytest-gated)
        "ann_ivf": """
            WITH c AS (
              SELECT query_id, vec_id
              FROM read_parquet('{SCRATCH}/ann_ivf_cands.parquet/*.parquet')
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM c
              JOIN embeddings e USING (vec_id)
              JOIN q ON q.query_id = c.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        # exact rerank replayed in SQL from the materialized depth-50
        # ADC candidate set (PQ codebook training pytest-gated)
        "ann_pq": """
            WITH c AS (
              SELECT query_id, vec_id
              FROM read_parquet('{SCRATCH}/ann_pq_cands.parquet/*.parquet')
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM c
              JOIN embeddings e USING (vec_id)
              JOIN q ON q.query_id = c.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        # exact rerank replayed in SQL from the materialized depth-50
        # pruned-scan candidate set (IVF-PQ training pytest-gated)
        "ann_ivfpq": """
            WITH c AS (
              SELECT query_id, vec_id
              FROM read_parquet('{SCRATCH}/ann_ivfpq_cands.parquet/*.parquet')
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM c
              JOIN embeddings e USING (vec_id)
              JOIN q ON q.query_id = c.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        # exact rerank replayed in SQL from the materialized LSH
        # candidate set (hyperplane family pytest-gated)
        "ann_lsh": """
            WITH c AS (
              SELECT query_id, vec_id
              FROM read_parquet('{SCRATCH}/ann_lsh_cands.parquet/*.parquet')
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM c
              JOIN embeddings e USING (vec_id)
              JOIN q ON q.query_id = c.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        "events_windowed": """
            SELECT (floor(epoch(ts) / 600) * 600)::BIGINT AS window_start,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value_r6
            FROM events GROUP BY 1, 2""",
        # gap sessions: lag + cumulative break-count == session_window
        # semantics (half-open [start, last+gap): a row exactly gap
        # after the last one opens a new session)
        "events_sessionize": """
            WITH e AS (SELECT user_id, epoch(ts) AS s, value FROM events),
            brk AS (
              SELECT user_id, s, value,
                     CASE WHEN s - lag(s) OVER (PARTITION BY user_id
                                                ORDER BY s) >= 1800
                          THEN 1 ELSE 0 END AS b
              FROM e
            ),
            g AS (
              SELECT user_id, s, value,
                     sum(b) OVER (PARTITION BY user_id ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) AS sess
              FROM brk
            )
            SELECT user_id,
                   floor(min(s))::BIGINT AS session_start,
                   floor(max(s))::BIGINT AS session_end,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value_r6
            FROM g GROUP BY user_id, sess""",
        "text_token_counts": """
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> ''))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text,
                       '(''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+)',
                       1))::BIGINT AS n_bpe
            FROM documents""",
        "text_quality": _QUALITY_SQL,
        "text_fingerprints": """
            SELECT doc_id, sha256(text) AS sha256 FROM documents""",
        "j2_enrich_updates": f"""
            WITH {_NB_PREDICT_SQL}
            SELECT d.doc_id, p.prediction AS new_lang
            FROM pred p JOIN documents d USING (doc_id)
            WHERE p.rn = 1
              AND NOT coalesce(d.lang, '') = p.prediction""",
        # the compressed/WAND path is exact -> same oracle as brute force
        "a7_bm25_wand": "WITH "
        + _BM25_SQL.replace("{QUERY}", "data value table"),
        "s5_term_vector_multiset": f"""
            WITH {_TF}
            SELECT doc_id, term,
                   unnest(generate_series(1, tf)) AS copy_i
            FROM tf WHERE doc_id < 3""",
        "s6_term_vector_distinct": f"""
            WITH {_TF}
            SELECT DISTINCT doc_id, term FROM tf WHERE doc_id < 3""",
        "x2_kfold_shuffle": """
            SELECT ((doc_id * 2654435761) % 4294967296) % 3 AS fold,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1 ORDER BY 1""",
        "a10_kfold_accuracy": " UNION ALL ".join(
            _nb_fold_acc_sql(f) for f in range(3)
        ),
        "text_lang_id": _lang_id_sql(),
        "dedup_embedding_cosine": """
            WITH pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                       / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cos, 6) AS cos_r6
            FROM pairs WHERE cos >= 0.4""",
        "text_rolling_fingerprint": _rolling_fp_oracle(),
        "match_phrase": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT p0.doc_id, count(*)::BIGINT AS n_matches
            FROM pos p0
            JOIN pos p1 ON p0.doc_id = p1.doc_id AND p1.pos = p0.pos + 1
            WHERE p0.term = 'data' AND p1.term = 'value'
            GROUP BY 1""",
        "p7_query_string_analyzed": f"""
            WITH {_TOKS}
            SELECT doc_id FROM toks
            WHERE (list_contains(w, 'data')
                   OR len(list_filter(w, x -> x LIKE 'valu%')) > 0)
              AND len([i for i in range(1, len(w))
                       if w[i] = 'data' AND w[i+1] = 'value']) = 0""",
        "s8_merge_updates": f"""
            WITH {_NB_PREDICT_SQL},
            upd AS (
              SELECT d.doc_id, p.prediction AS new_lang
              FROM pred p JOIN documents d USING (doc_id)
              WHERE p.rn = 1
                AND NOT coalesce(d.lang, '') = p.prediction
            )
            SELECT d.doc_id, coalesce(u.new_lang, d.lang) AS lang
            FROM documents d LEFT JOIN upd u USING (doc_id)""",
        "quality_shape": _QUALITY_SHAPE_SQL,
        "quality_repetition": _quality_repetition_sql(),
        "sample_hash_split": f"""
            SELECT doc_id,
                   {_hash_split_case()} AS split
            FROM documents""",
        "sample_stratified": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_hash_u('doc_id', 'sample')} <
                  CASE lang WHEN 'en' THEN 0.5
                            WHEN 'de' THEN 0.25 ELSE 0.0 END""",
        "qs_range_prohibit": """
            SELECT doc_id, lang FROM documents
            WHERE doc_id >= 100 AND doc_id < 300 AND NOT (lang = 'en')""",
        "fuzzy_bm25": "WITH " + _FUZZY_BM25_SQL,
        "fuzzy_auto": "WITH " + _FUZZY_AUTO_SQL,
        "wand_deletes": "WITH " + _WAND_DELETES_SQL,
        "regexp_bm25": "WITH " + _REGEXP_SQL,
        "decay_score": "WITH " + _DECAY_SQL,
        "msearch": "WITH " + _MSEARCH_SQL,
        "random_score": "WITH " + _BM25_SQL.replace(
            "{QUERY}", "data value table"
        ).replace(
            "round(score, 9)",
            f"round(score + {_hash_u('doc_id', 'rs')}, 9)",
        ).replace(
            "round(score, 6)",
            f"round(score + {_hash_u('doc_id', 'rs')}, 6)",
        ),
        "suggest_completion": f"""
            WITH {_TF},
            stats AS (SELECT term, count(*)::BIGINT AS df
                      FROM tf GROUP BY 1)
            SELECT term, df AS weight FROM stats WHERE term LIKE 's%'
            ORDER BY weight DESC, term ASC LIMIT 5""",
        "match_phrase_prefix": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            ),
            exp AS (
              SELECT DISTINCT term FROM pos WHERE term LIKE 'val%'
              ORDER BY term LIMIT 50
            )
            SELECT p0.doc_id, count(DISTINCT p0.pos)::BIGINT AS n_matches
            FROM pos p0
            JOIN pos p1 ON p0.doc_id = p1.doc_id AND p1.pos = p0.pos + 1
            WHERE p0.term = 'data' AND p1.term IN (SELECT term FROM exp)
            GROUP BY 1""",
        "agg_date_range": """
            WITH c AS (
              SELECT
                sum(CASE WHEN ts IS NOT NULL
                         AND ts < TIMESTAMP '2024-01-10 00:00:00'
                    THEN 1 ELSE 0 END) AS b1,
                sum(CASE WHEN ts >= TIMESTAMP '2024-01-10 00:00:00'
                         AND ts < TIMESTAMP '2024-01-20 00:00:00'
                    THEN 1 ELSE 0 END) AS b2,
                sum(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                    THEN 1 ELSE 0 END) AS b3
              FROM events)
            SELECT '*-2024-01-10 00:00:00' AS key,
                   b1::BIGINT AS doc_count FROM c
            UNION ALL
            SELECT '2024-01-10 00:00:00-2024-01-20 00:00:00', b2::BIGINT
            FROM c
            UNION ALL
            SELECT '2024-01-20 00:00:00-*', b3::BIGINT FROM c""",
        "agg_filters": """
            WITH c AS (
              SELECT
                sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS k1,
                sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS k2,
                sum(CASE WHEN n_chars >= 300 AND lang = 'de'
                    THEN 1 ELSE 0 END) AS k3
              FROM documents)
            SELECT 'short' AS key, k1::BIGINT AS doc_count FROM c
            UNION ALL SELECT 'en', k2::BIGINT FROM c
            UNION ALL SELECT 'long_de', k3::BIGINT FROM c""",
        "agg_missing": """
            SELECT sum(CASE WHEN kw IS NULL OR kw = ''
                       THEN 1 ELSE 0 END)::BIGINT AS doc_count,
                   count(kw)::BIGINT AS value_count
            FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN NULL
                              ELSE lang END AS kw
                  FROM documents)""",
        "domain_stats": f"""
            SELECT lower(regexp_extract(
                     'https://' || source || '.example.com/docs/'
                       || doc_id::VARCHAR,
                     '{_DOMAIN_RX_SQL}', 1)) AS domain,
                   count(*)::BIGINT AS doc_count,
                   sum(n_chars)::BIGINT AS total_chars
            FROM documents GROUP BY 1""",
        "dedup_spans": f"""
            WITH {_DUPS_SQL},
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS w
              FROM docs_dup
            ),
            occ AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w) - 3)]
                       ELSE [] END) AS g,
                     unnest(CASE WHEN len(w) >= 5
                       THEN range(0, len(w) - 4) ELSE [] END) AS pos
              FROM toks
            ),
            ranked AS (
              SELECT doc_id, pos, g,
                     row_number() OVER (PARTITION BY g
                                        ORDER BY doc_id, pos) AS rn
              FROM occ
            ),
            dups AS (
              SELECT doc_id, pos AS s, pos + 5 AS e
              FROM ranked WHERE rn > 1
            ),
            m AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pme
              FROM dups
            ),
            isl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN pme IS NULL OR s > pme
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e) AS island
              FROM m
            )
            SELECT doc_id, min(s)::BIGINT AS span_start,
                   max(e)::BIGINT AS span_end
            FROM isl GROUP BY doc_id, island""",
        "domain_quota": f"""
            WITH u AS (
              SELECT doc_id,
                     lower(regexp_extract(
                       'https://' || source || '.example.com/docs/'
                         || doc_id::VARCHAR,
                       '{_DOMAIN_RX_SQL}', 1)) AS domain
              FROM documents),
            f AS (SELECT * FROM u
                  WHERE domain NOT IN ('src1.example.com',
                                       'src3.example.com')),
            r AS (SELECT doc_id,
                         row_number() OVER (
                           PARTITION BY domain
                           ORDER BY {_hash_u('doc_id', 'quota')} ASC,
                                    doc_id ASC) AS rk
                  FROM f)
            SELECT doc_id FROM r WHERE rk <= 10""",
        "mlt_topk": "WITH " + _MLT_SQL,
        "prefix_bm25": "WITH " + _PREFIX_SQL,
        "suggest_terms": _SUGGEST_SQL,
        "span_near": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT p0.doc_id,
                   count(DISTINCT p0.pos)::BIGINT AS n_matches
            FROM pos p0
            JOIN pos p1 ON p0.doc_id = p1.doc_id AND p1.pos > p0.pos
                       AND p1.pos - p0.pos - 1 <= 2
            WHERE p0.term = 'data' AND p1.term = 'value'
            GROUP BY 1""",
        "percolate": f"""
            WITH {_TOKS},
            dterms AS (
              SELECT DISTINCT doc_id, unnest(w) AS term FROM toks
            ),
            reg(query_id, term, n_terms) AS (VALUES
              (1, 'data', 2), (1, 'value', 2),
              (2, 'table', 1), (3, 'data', 1)
            )
            SELECT doc_id, query_id::BIGINT AS query_id,
                   count(*)::BIGINT AS matched_terms
            FROM dterms JOIN reg USING (term)
            GROUP BY doc_id, query_id, n_terms
            HAVING count(*) >= n_terms""",
        "percolate_scored": f"""
            WITH {_BM25_BASE},
            reg(query_id, term, msm) AS (VALUES
              (1, 'data', 2), (1, 'value', 2),
              (2, 'table', 1), (3, 'data', 1)
            ),
            contrib AS (
              SELECT tf.doc_id, r.query_id, r.msm,
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus))) AS c
              FROM tf
              JOIN reg r USING (term)
              JOIN stats s USING (term)
              JOIN dl USING (doc_id)
            )
            SELECT doc_id, query_id::BIGINT AS query_id,
                   count(*)::BIGINT AS matched_terms,
                   round(sum(c), 6) AS score_r6
            FROM contrib GROUP BY doc_id, query_id, msm
            HAVING count(*) >= msm""",
        "pii_stats": """
            WITH d AS (
              SELECT doc_id AS id,
                     text || CASE doc_id % 3
                       WHEN 0 THEN ' mail me: user@example.com'
                       WHEN 1 THEN ' host 10.1.2.3 up'
                       ELSE ' call 555-123-4567 or +4915112345678'
                     END AS text
              FROM documents
            )
            SELECT id,
              len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'
              ))::BIGINT AS n_email,
              len(regexp_extract_all(text,
                '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'
              ))::BIGINT AS n_ipv4,
              len(regexp_extract_all(text,
                '\\+[0-9]{7,15}\\b|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b'
              ))::BIGINT AS n_phone,
              (len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
               + len(regexp_extract_all(text,
                '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
               + len(regexp_extract_all(text,
                '\\+[0-9]{7,15}\\b|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b'))
              )::BIGINT AS n_pii
            FROM d""",
        "pii_redact": """
            WITH d AS (
              SELECT doc_id AS id,
                     text || CASE doc_id % 3
                       WHEN 0 THEN ' mail me: user@example.com'
                       WHEN 1 THEN ' host 10.1.2.3 up'
                       ELSE ' call 555-123-4567 or +4915112345678'
                     END AS text
              FROM documents
            )
            SELECT id,
              regexp_replace(regexp_replace(regexp_replace(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                '<EMAIL>', 'g'),
                '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                '<IP>', 'g'),
                '\\+[0-9]{7,15}\\b|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b',
                '<PHONE>', 'g') AS redacted
            FROM d""",
        "dedup_paragraphs": """
            WITH d AS (
              SELECT doc_id,
                     'SHARED HEADER' || E'\\n\\n' || text || E'\\n\\n'
                     || 'SHARED FOOTER' AS text
              FROM documents
            ),
            paras AS (
              SELECT doc_id AS id,
                     unnest(string_split(text, E'\\n\\n')) AS para,
                     unnest(range(len(string_split(text, E'\\n\\n'))))
                     AS pos
              FROM d
            ),
            keep AS (
              SELECT para,
                     min(struct_pack(id := id, pos := pos)) AS first
              FROM paras GROUP BY para
            ),
            kept AS (
              SELECT p.id, p.pos, p.para
              FROM paras p JOIN keep k
                ON p.para = k.para AND p.id = k.first.id
                   AND p.pos = k.first.pos
            )
            SELECT d.doc_id AS id,
                   coalesce(string_agg(kept.para, E'\\n\\n'
                                       ORDER BY kept.pos), '') AS text
            FROM d LEFT JOIN kept ON d.doc_id = kept.id
            GROUP BY d.doc_id""",
        "agg_terms": """
            SELECT lang AS key, count(*)::BIGINT AS doc_count
            FROM documents WHERE lang IS NOT NULL
            GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 5""",
        "agg_sampler": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars
            FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20""",
        "agg_diversified_sampler": """
            WITH ranked AS (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (
                        PARTITION BY lang
                        ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents)
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars
            FROM ranked WHERE rn <= 2
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20""",
        "terms_set": f"""
            WITH {_TF}
            SELECT doc_id FROM tf
            WHERE term IN ('data', 'value', 'table')
            GROUP BY doc_id HAVING count(DISTINCT term) >= 2""",
        "rank_eval": """
            WITH res AS (
              SELECT lang AS query_id, doc_id,
                     row_number() OVER (
                        PARTITION BY lang
                        ORDER BY n_chars DESC, doc_id ASC) AS rank
              FROM documents),
            topk AS (SELECT * FROM res WHERE rank <= 10),
            jud AS (SELECT lang AS query_id, doc_id,
                           (doc_id % 4)::DOUBLE AS grade FROM documents),
            joined AS (
              SELECT t.query_id, t.rank, coalesce(j.grade, 0) AS g
              FROM topk t LEFT JOIN jud j USING (query_id, doc_id)),
            got AS (
              SELECT query_id,
                     sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) / 10.0
                        AS precision_k,
                     max(CASE WHEN g > 0 THEN 1.0 / rank ELSE 0 END) AS mrr,
                     sum((pow(2.0, g) - 1) / log2(rank + 1.0)) AS dcg,
                     sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)::BIGINT AS hits
              FROM joined GROUP BY 1),
            ideal AS (
              SELECT query_id,
                     sum((pow(2.0, grade) - 1) / log2(ir + 1.0)) AS idcg
              FROM (
                SELECT query_id, grade,
                       row_number() OVER (
                          PARTITION BY query_id
                          ORDER BY grade DESC, doc_id ASC) AS ir
                FROM jud WHERE grade > 0)
              WHERE ir <= 10 GROUP BY 1),
            nrel AS (SELECT query_id, count(*)::BIGINT AS nrel
                     FROM jud WHERE grade > 0 GROUP BY 1)
            SELECT g.query_id,
                   round(g.precision_k, 6) AS precision_k,
                   round(CASE WHEN coalesce(n.nrel, 0) > 0
                              THEN g.hits / n.nrel ELSE 0 END, 6) AS recall_k,
                   round(g.mrr, 6) AS mrr,
                   round(CASE WHEN coalesce(i.idcg, 0) > 0
                              THEN g.dcg / i.idcg ELSE 0 END, 6) AS ndcg_k
            FROM got g
            LEFT JOIN ideal i USING (query_id)
            LEFT JOIN nrel n USING (query_id)""",
        "reindex_subset": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(
                        string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x <> '') AS w
              FROM documents WHERE n_chars >= 200),
            posts AS (SELECT doc_id, unnest(w) AS term FROM toks),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM posts GROUP BY 1, 2)
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
            FROM tf GROUP BY term""",
        "agg_histogram": """
            SELECT (floor(n_chars / 100.0) * 100.0)::DOUBLE AS key,
                   count(*)::BIGINT AS doc_count
            FROM documents WHERE n_chars IS NOT NULL GROUP BY 1""",
        "agg_date_histogram": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS key_epoch,
                   count(*)::BIGINT AS doc_count
            FROM events GROUP BY 1""",
        "heavy_hitters": """
            SELECT lang AS key, count(*)::BIGINT AS n
            FROM documents WHERE lang IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, key ASC LIMIT 5""",
        # DuckDB's native ASOF JOIN replays the cogrouped merge_asof
        "asof_join": """
            WITH clicks AS (
              SELECT event_id, ts, user_id FROM events
              WHERE event_type = 'click'
            ),
            views AS (
              SELECT event_id AS view_event, ts, user_id FROM events
              WHERE event_type = 'view'
            )
            SELECT c.event_id, c.user_id, v.view_event
            FROM clicks c
            ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts""",
        "range_join": """
            WITH clicks AS (
              SELECT event_id, ts, user_id FROM events
              WHERE event_type = 'click'
            ),
            iv AS (
              SELECT event_id AS view_event, ts AS start_ts,
                     ts + INTERVAL 30 MINUTE AS end_ts, user_id
              FROM events WHERE event_type = 'view'
            )
            SELECT c.event_id, c.user_id, iv.view_event
            FROM clicks c JOIN iv
              ON c.user_id = iv.user_id
             AND c.ts >= iv.start_ts AND c.ts < iv.end_ts""",
        # the oracle aggregates RAW events directly — proving the
        # rollup's two-level partial merge is exact, not approximate
        "rollup_query": """
            WITH e AS (
              SELECT ts, event_type,
                     round(value * 100)::BIGINT AS value_c
              FROM events WHERE ts IS NOT NULL
            )
            SELECT epoch(date_trunc('day', ts))::BIGINT AS key_epoch,
                   event_type,
                   count(*)::BIGINT AS doc_count,
                   sum(value_c)::BIGINT AS value_sum_c,
                   min(value_c)::BIGINT AS value_min_c,
                   max(value_c)::BIGINT AS value_max_c,
                   count(value_c)::BIGINT AS value_count,
                   round(sum(value_c)::DOUBLE / count(value_c), 6)
                     AS value_avg_c
            FROM e
            GROUP BY 1, 2""",
        "agg_metrics_extras": """
            WITH wa AS (
              SELECT round(sum(value * user_id) / sum(user_id), 6)
                       AS weighted_avg
              FROM events
              WHERE value IS NOT NULL AND user_id IS NOT NULL
            ),
            tm AS (
              SELECT round(value, 6) AS top_sort,
                     user_id::BIGINT AS top_metric
              FROM events WHERE value IS NOT NULL
              ORDER BY value DESC, user_id ASC LIMIT 1
            ),
            med AS (
              SELECT quantile_cont(value, 0.5) AS m FROM events
              WHERE value IS NOT NULL
            ),
            mad AS (
              SELECT round(quantile_cont(abs(value - med.m), 0.5), 6)
                       AS mad
              FROM events, med WHERE value IS NOT NULL
            )
            SELECT wa.weighted_avg, tm.top_sort, tm.top_metric, mad.mad
            FROM wa, tm, mad""",
        "agg_rare_terms": """
            SELECT n_chars AS key, count(*)::BIGINT AS doc_count
            FROM documents
            GROUP BY 1 HAVING count(*) <= 1""",
        "agg_multi_terms": """
            SELECT lang AS key_lang, source AS key_source,
                   count(*)::BIGINT AS doc_count
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
            GROUP BY 1, 2
            ORDER BY doc_count DESC, key_lang ASC, key_source ASC
            LIMIT 10""",
        "agg_adjacency": """
            WITH c AS (
              SELECT
                sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS s,
                sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS l,
                sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS e,
                sum(CASE WHEN lang = 'en' AND n_chars < 200
                    THEN 1 ELSE 0 END) AS es,
                sum(CASE WHEN lang = 'en' AND n_chars >= 400
                    THEN 1 ELSE 0 END) AS el,
                sum(CASE WHEN n_chars >= 400 AND n_chars < 200
                    THEN 1 ELSE 0 END) AS ls
              FROM documents
            )
            SELECT key, doc_count::BIGINT AS doc_count FROM (
              SELECT 'short' AS key, s AS doc_count FROM c
              UNION ALL SELECT 'long', l FROM c
              UNION ALL SELECT 'en', e FROM c
              UNION ALL SELECT 'en&short', es FROM c
              UNION ALL SELECT 'en&long', el FROM c
              UNION ALL SELECT 'long&short', ls FROM c
            ) WHERE doc_count > 0""",
        "agg_auto_date_histogram": """
            WITH b AS (
              SELECT min(ts) AS lo, max(ts) AS hi FROM events
            ),
            iv AS (
              SELECT CASE
                WHEN epoch(hi - lo) / 60 + 1 <= 10 THEN 'minute'
                WHEN epoch(hi - lo) / 3600 + 1 <= 10 THEN 'hour'
                WHEN epoch(hi - lo) / 86400 + 1 <= 10 THEN 'day'
                WHEN epoch(hi - lo) / 604800 + 1 <= 10 THEN 'week'
                WHEN epoch(hi - lo) / 2592000 + 1 <= 10 THEN 'month'
                WHEN epoch(hi - lo) / 7862400 + 1 <= 10 THEN 'quarter'
                ELSE 'year' END AS interval
              FROM b
            )
            SELECT epoch(date_trunc(iv.interval, ts))::BIGINT
                     AS key_epoch,
                   count(*)::BIGINT AS doc_count,
                   iv.interval AS interval
            FROM events, iv
            GROUP BY 1, 3""",
        "agg_pipeline": """
            WITH b AS (
              SELECT epoch(date_trunc('hour', ts))::BIGINT AS key_epoch,
                     count(*)::BIGINT AS doc_count
              FROM events GROUP BY 1
            )
            SELECT key_epoch, doc_count,
                   round((doc_count
                          - lag(doc_count, 1) OVER w)::DOUBLE, 6)
                     AS derivative,
                   round(sum(doc_count) OVER (ORDER BY key_epoch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::DOUBLE, 6) AS cumulative_sum,
                   round(avg(doc_count) OVER (ORDER BY key_epoch
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                     )::DOUBLE, 6) AS moving_avg,
                   round((doc_count
                          - lag(doc_count, 2) OVER w)::DOUBLE, 6)
                     AS serial_diff
            FROM b WINDOW w AS (ORDER BY key_epoch)""",
        "agg_bucket_stats": """
            WITH b AS (
              SELECT epoch(date_trunc('hour', ts))::BIGINT AS key_epoch,
                     count(*)::BIGINT AS doc_count
              FROM events GROUP BY 1
            ),
            s AS (
              SELECT count(*)::BIGINT AS count,
                     min(doc_count)::DOUBLE AS min,
                     max(doc_count)::DOUBLE AS max,
                     round(avg(doc_count)::DOUBLE, 6) AS avg,
                     sum(doc_count)::DOUBLE AS sum
              FROM b
            ),
            mx AS (
              SELECT min(key_epoch)::BIGINT AS max_key,
                     min(doc_count)::DOUBLE AS max_value
              FROM b WHERE doc_count = (SELECT max(doc_count) FROM b)
            ),
            mn AS (
              SELECT min(key_epoch)::BIGINT AS min_key,
                     min(doc_count)::DOUBLE AS min_value
              FROM b WHERE doc_count = (SELECT min(doc_count) FROM b)
            )
            SELECT s.count, s.min, s.max, s.avg, s.sum,
                   mx.max_key, mx.max_value, mn.min_key, mn.min_value
            FROM s, mx, mn""",
        "agg_range": """
            SELECT '*-100.0' AS key,
                   sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)::BIGINT
                   AS doc_count FROM documents
            UNION ALL
            SELECT '100.0-300.0',
                   sum(CASE WHEN n_chars >= 100 AND n_chars < 300
                       THEN 1 ELSE 0 END)::BIGINT FROM documents
            UNION ALL
            SELECT '300.0-*',
                   sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT
            FROM documents""",
        "agg_extended_stats": """
            SELECT count(value)::BIGINT AS count,
                   round(min(value), 6) AS min, round(max(value), 6) AS max,
                   round(avg(value), 4) AS avg, round(sum(value), 2) AS sum,
                   round(sum(value * value), 1) AS sum_of_squares,
                   round(var_pop(value), 4) AS variance,
                   round(stddev_pop(value), 4) AS std_deviation
            FROM events WHERE value IS NOT NULL""",
        "agg_percentiles": """
            SELECT 5.0 AS percent,
                   round(quantile_cont(value, 0.05), 4) AS value FROM events
            UNION ALL
            SELECT 50.0, round(quantile_cont(value, 0.50), 4) FROM events
            UNION ALL
            SELECT 95.0, round(quantile_cont(value, 0.95), 4) FROM events""",
        "agg_cardinality": """
            SELECT count(DISTINCT user_id)::BIGINT AS value FROM events""",
        "agg_top_hits": """
            SELECT lang AS key, rank, doc_id AS id,
                   n_chars::DOUBLE AS sort_value
            FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
              FROM documents WHERE lang IS NOT NULL
            ) WHERE rank <= 2""",
        "agg_significant_terms": f"""
            WITH {_TF},
            fg_ids AS (SELECT DISTINCT doc_id FROM documents
                       WHERE lang = 'en'),
            n_fg AS (SELECT count(*)::DOUBLE AS n FROM fg_ids),
            n_all AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
            fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df
                   FROM tf JOIN fg_ids USING (doc_id) GROUP BY 1),
            bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df
                   FROM tf GROUP BY 1),
            scored AS (
              SELECT term, fg_df, bg_df,
                     round((fg_df / (SELECT n FROM n_fg)
                            - bg_df / (SELECT n FROM n_all))
                           * ((fg_df / (SELECT n FROM n_fg))
                              / (bg_df / (SELECT n FROM n_all))), 6)
                     AS score
              FROM fg JOIN bg USING (term) WHERE fg_df >= 2
            )
            SELECT term, fg_df, bg_df, score FROM scored
            WHERE score > 0
            ORDER BY score DESC, term ASC LIMIT 10""",
        "agg_significant_chi_square": f"""
            WITH {_TF},
            fg_ids AS (SELECT DISTINCT doc_id FROM documents
                       WHERE lang = 'en'),
            n_fg AS (SELECT count(*)::DOUBLE AS n FROM fg_ids),
            n_all AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
            fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df
                   FROM tf JOIN fg_ids USING (doc_id) GROUP BY 1),
            bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df
                   FROM tf GROUP BY 1),
            cells AS (
              SELECT term, fg_df, bg_df,
                     fg_df::DOUBLE AS n11,
                     bg_df::DOUBLE - fg_df AS n01,
                     (SELECT n FROM n_fg) - fg_df AS n10,
                     ((SELECT n FROM n_all) - (SELECT n FROM n_fg))
                       - (bg_df::DOUBLE - fg_df) AS n00
              FROM fg JOIN bg USING (term) WHERE fg_df >= 2
            ),
            scored AS (
              SELECT term, fg_df, bg_df,
                     round(CASE WHEN
                         fg_df / (SELECT n FROM n_fg)
                           > bg_df / (SELECT n FROM n_all)
                         AND (n11+n01)*(n11+n10)*(n01+n00)*(n10+n00) > 0
                       THEN (SELECT n FROM n_all)
                            * (n11*n00 - n01*n10) * (n11*n00 - n01*n10)
                            / ((n11+n01)*(n11+n10)*(n01+n00)*(n10+n00))
                       ELSE 0.0 END, 6) AS score
              FROM cells
            )
            SELECT term, fg_df, bg_df, score FROM scored
            WHERE score > 0
            ORDER BY round(score, 9) DESC, term ASC LIMIT 10""",
        "agg_significant_gnd": f"""
            WITH {_TF},
            fg_ids AS (SELECT DISTINCT doc_id FROM documents
                       WHERE lang = 'en'),
            n_fg AS (SELECT count(*)::DOUBLE AS n FROM fg_ids),
            n_all AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
            fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df
                   FROM tf JOIN fg_ids USING (doc_id) GROUP BY 1),
            bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df
                   FROM tf GROUP BY 1),
            scored AS (
              SELECT term, fg_df, bg_df,
                     round(CASE WHEN
                         ln((SELECT n FROM n_all))
                           - least(ln(bg_df::DOUBLE),
                                   ln((SELECT n FROM n_fg))) > 0
                       THEN exp(-(greatest(ln(bg_df::DOUBLE),
                                           ln((SELECT n FROM n_fg)))
                                  - ln(fg_df::DOUBLE))
                                / (ln((SELECT n FROM n_all))
                                   - least(ln(bg_df::DOUBLE),
                                           ln((SELECT n FROM n_fg)))))
                       ELSE 0.0 END, 6) AS score
              FROM fg JOIN bg USING (term) WHERE fg_df >= 2
            )
            SELECT term, fg_df, bg_df, score FROM scored
            WHERE score > 0
            ORDER BY round(score, 9) DESC, term ASC LIMIT 10""",
        "graph_explore_vertices": f"""
            WITH {_GRAPH_WAVE}
            SELECT term, 1::INTEGER AS hop, fg_count, bg_count,
                   round(score, 6) AS score_r6
            FROM wave""",
        "graph_explore_edges": f"""
            WITH {_GRAPH_WAVE}
            SELECT 'data' AS source, tf.term AS target,
                   count(DISTINCT tf.doc_id)::BIGINT AS overlap
            FROM tf JOIN seed_docs USING (doc_id)
            JOIN wave w ON tf.term = w.term
            GROUP BY 1, 2
            HAVING count(DISTINCT tf.doc_id) >= 2""",
        "ml_outlier_detection": """
            WITH dists AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                     sqrt(list_sum([
                       (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
                       * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
                       FOR i IN generate_series(1, len(a.embedding))
                     ])) AS dist
              FROM embeddings a JOIN embeddings b
                ON a.vec_id <> b.vec_id
            ),
            knn AS (
              SELECT * FROM (
                SELECT vec_id, nbr_id, dist,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY dist ASC, nbr_id ASC) AS rank
                FROM dists
              ) WHERE rank <= 5
            ),
            base AS (SELECT vec_id, max(dist) AS kth_dist,
                            avg(dist) AS mean_dist
                     FROM knn GROUP BY 1),
            reach AS (SELECT k.vec_id,
                             greatest(k.dist, o.kth_dist) AS reach
                      FROM knn k JOIN base o ON k.nbr_id = o.vec_id),
            lrd AS (SELECT vec_id,
                           1.0 / greatest(avg(reach), 1e-12) AS lrd
                    FROM reach GROUP BY 1),
            lofv AS (
              SELECT k.vec_id, avg(lo.lrd) / any_value(p.lrd) AS lof
              FROM knn k JOIN lrd lo ON k.nbr_id = lo.vec_id
              JOIN lrd p ON k.vec_id = p.vec_id
              GROUP BY k.vec_id
            ),
            nbr_pairs AS (
              SELECT x.vec_id, x.nbr_id AS a, y.nbr_id AS b
              FROM knn x JOIN knn y USING (vec_id)
              WHERE x.nbr_id < y.nbr_id
            ),
            inner_d AS (
              SELECT p.vec_id, avg(d.dist) AS inner_mean
              FROM nbr_pairs p
              JOIN dists d ON d.vec_id = p.a AND d.nbr_id = p.b
              GROUP BY 1
            ),
            m AS (
              SELECT b.vec_id,
                     round(b.kth_dist, 6) AS kth_dist_r6,
                     round(b.mean_dist, 6) AS mean_dist_r6,
                     round(l.lof, 6) AS lof_r6,
                     round(b.mean_dist
                           / greatest(i.inner_mean, 1e-12), 6)
                       AS ldof_r6
              FROM base b JOIN lofv l USING (vec_id)
              JOIN inner_d i USING (vec_id)
            ),
            ex AS (SELECT min(kth_dist_r6) AS k0, max(kth_dist_r6) AS k1,
                          min(mean_dist_r6) AS m0, max(mean_dist_r6) AS m1,
                          min(lof_r6) AS l0, max(lof_r6) AS l1,
                          min(ldof_r6) AS d0, max(ldof_r6) AS d1
                   FROM m)
            SELECT vec_id, kth_dist_r6, mean_dist_r6, lof_r6, ldof_r6,
                   round((
                     (CASE WHEN k1 > k0
                      THEN (kth_dist_r6 - k0) / (k1 - k0)
                      ELSE 0.0 END)
                   + (CASE WHEN m1 > m0
                      THEN (mean_dist_r6 - m0) / (m1 - m0)
                      ELSE 0.0 END)
                   + (CASE WHEN l1 > l0
                      THEN (lof_r6 - l0) / (l1 - l0)
                      ELSE 0.0 END)
                   + (CASE WHEN d1 > d0
                      THEN (ldof_r6 - d0) / (d1 - d0)
                      ELSE 0.0 END)) / 4.0, 6) AS outlier_score_r6
            FROM m, ex""",
        "ml_anomaly_count": """
            WITH m0 AS (
              SELECT event_type,
                     (floor(epoch(ts) / 3600) * 3600)::BIGINT
                       AS bucket_start,
                     count(*)::DOUBLE AS metric
              FROM events GROUP BY 1, 2
            ),
            rng AS (SELECT event_type, min(bucket_start) AS mn,
                           max(bucket_start) AS mx
                    FROM m0 GROUP BY 1),
            dense AS (SELECT event_type,
                             unnest(generate_series(mn, mx, 3600))
                               AS bucket_start
                      FROM rng),
            m AS (SELECT d.event_type, d.bucket_start,
                         coalesce(m0.metric, 0.0) AS metric
                  FROM dense d
                  LEFT JOIN m0 USING (event_type, bucket_start)),
            med AS (SELECT event_type, median(metric) AS typical
                    FROM m GROUP BY 1),
            dev AS (SELECT m.event_type, m.bucket_start, m.metric,
                           med.typical,
                           abs(m.metric - med.typical) AS absdev
                    FROM m JOIN med USING (event_type)),
            mad AS (SELECT event_type, median(absdev) AS mad
                    FROM dev GROUP BY 1)
            SELECT dev.event_type, dev.bucket_start,
                   round(dev.metric, 6) AS metric_r6,
                   round(dev.typical, 6) AS typical_r6,
                   round(100.0 * (1.0 - exp(
                     -((dev.absdev / (1.4826 * mad.mad + 1e-9))
                       * (dev.absdev / (1.4826 * mad.mad + 1e-9)))
                     / 2.0)), 6) AS record_score_r6
            FROM dev JOIN mad USING (event_type)""",
        "rank_vectors_maxsim": """
            WITH chunked AS (
              SELECT vec_id,
                     [ embedding[(c-1)*8+1 : c*8]::DOUBLE[]
                       FOR c IN generate_series(1, 8) ] AS vecs
              FROM embeddings
            ),
            q AS (SELECT vec_id AS query_id, vecs AS qvecs
                  FROM chunked WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, d.vec_id AS doc_id,
                     round(list_sum(list_transform(q.qvecs,
                       qv -> list_max(list_transform(d.vecs,
                               dv -> list_dot_product(qv, dv))))), 6)
                       AS score_r6
              FROM chunked d CROSS JOIN q
              WHERE d.vec_id <> q.query_id
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score_r6 DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score_r6
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank""",
        "ml_regression_simple": """
            SELECT round(regr_slope(y, x), 6) AS slope,
                   round(regr_intercept(y, x), 6) AS intercept,
                   round(regr_r2(y, x), 6) AS r2,
                   count(*)::BIGINT AS n
            FROM (SELECT user_id::DOUBLE AS x, value::DOUBLE AS y
                  FROM events
                  WHERE user_id IS NOT NULL AND value IS NOT NULL)""",
        "bool_query": f"""
            WITH {_BM25_BASE},
            clause(term, clause, boost) AS (VALUES
              ('data', 'must', 1.0), ('value', 'should', 2.0)),
            per_term AS (
              SELECT tf.doc_id, c.clause,
                     c.boost * ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                                  / (s.df + 0.5))
                     * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                / (SELECT avgdl FROM corpus))) AS contrib
              FROM tf JOIN clause c USING (term)
              JOIN stats s USING (term) JOIN dl USING (doc_id)
            ),
            agg AS (
              SELECT doc_id, sum(contrib) AS score,
                     count(CASE WHEN clause = 'must' THEN 1 END) AS n_must
              FROM per_term GROUP BY doc_id
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM agg WHERE n_must = 1
            ORDER BY rank LIMIT 10""",
        "highlight": """
            WITH d AS (
              SELECT doc_id, coalesce(text, '') AS text,
                     least(nullif(strpos(lower(coalesce(text, '')),
                                         'data'), 0),
                           nullif(strpos(lower(coalesce(text, '')),
                                         'value'), 0)) AS first
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN first IS NOT NULL THEN
                     regexp_replace(
                       substring(text, greatest(1, first - 40), 150),
                       '\\b(data|value)\\b', '<em>\\1</em>', 'gi')
                   END AS highlight
            FROM d""",
        "semantic_dedup": """
            WITH cells AS (
              SELECT * FROM
              read_parquet('{SCRATCH}/semdedup_cells.parquet/*.parquet')
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[])
                       / (sqrt(list_dot_product(ea.embedding::DOUBLE[],
                                                ea.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(eb.embedding::DOUBLE[],
                                                  eb.embedding::DOUBLE[])))
                     AS cos
              FROM cells a JOIN cells b
                ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN embeddings ea ON ea.vec_id = a.vec_id
              JOIN embeddings eb ON eb.vec_id = b.vec_id
            )
            SELECT id_a, id_b, round(cos, 6) AS cos_r6
            FROM pairs WHERE cos >= 0.4""",
        "collapse": """
            WITH best AS (
              SELECT lang AS key, doc_id AS id,
                     n_chars::DOUBLE AS sort_value,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY round(n_chars, 9) DESC, doc_id ASC) AS rn
              FROM documents WHERE lang IS NOT NULL
            )
            SELECT row_number() OVER (ORDER BY round(sort_value, 9) DESC,
                                      id ASC)::BIGINT AS rank,
                   key, id, sort_value
            FROM best WHERE rn = 1 ORDER BY rank LIMIT 3""",
        "search_after": """
            SELECT doc_id AS id, n_chars::DOUBLE AS sort_value
            FROM documents
            ORDER BY round(n_chars, 9) DESC, doc_id ASC
            LIMIT 10 OFFSET 10""",
        "composite_agg": """
            SELECT event_type, user_id, count(*)::BIGINT AS doc_count
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10 OFFSET 10""",
        "doc_chunks": """
            WITH t AS (
              SELECT doc_id AS id,
                     list_filter(string_split_regex(coalesce(text, ''),
                                                    '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            n AS (
              SELECT id, toks,
                     greatest(1, ceil((len(toks) - 4) / 28.0)::INT)
                     AS n_chunks
              FROM t WHERE len(toks) > 0
            ),
            c AS (
              SELECT id, toks, unnest(range(n_chunks)) AS chunk_id
              FROM n
            )
            SELECT id, chunk_id::BIGINT AS chunk_id,
                   array_to_string(
                     toks[chunk_id * 28 + 1 : chunk_id * 28 + 32], ' ')
                   AS chunk_text,
                   len(toks[chunk_id * 28 + 1 : chunk_id * 28 + 32])
                   ::BIGINT AS n_tokens
            FROM c""",
        "function_score": f"""
            WITH {_BM25_BASE},
            qterms(term) AS (VALUES ('data'), ('value')),
            bm AS (
              SELECT tf.doc_id,
                     sum(ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                    / (SELECT avgdl FROM corpus))))
                     AS score
              FROM tf JOIN qterms USING (term)
              JOIN stats s USING (term) JOIN dl USING (doc_id)
              GROUP BY tf.doc_id
            ),
            fs AS (
              SELECT bm.doc_id,
                     bm.score + ln(1 + d.n_chars * 0.001) AS score
              FROM bm JOIN documents d USING (doc_id)
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM fs ORDER BY rank LIMIT 10""",
        "rescore_phrase": f"""
            WITH {_BM25_BASE},
            qterms(term) AS (VALUES ('data'), ('value')),
            bm AS (
              SELECT tf.doc_id,
                     sum(ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                    / (SELECT avgdl FROM corpus))))
                     AS bm25
              FROM tf JOIN qterms USING (term)
              JOIN stats s USING (term) JOIN dl USING (doc_id)
              GROUP BY tf.doc_id
            ),
            win AS (
              SELECT doc_id, bm25,
                     row_number() OVER (ORDER BY round(bm25, 9) DESC,
                                        doc_id ASC) AS prim
              FROM bm
            ),
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            ),
            ph AS (
              SELECT p0.doc_id, count(*)::DOUBLE AS n_matches
              FROM pos p0
              JOIN pos p1 ON p0.doc_id = p1.doc_id
                         AND p1.pos = p0.pos + 1
              WHERE p0.term = 'data' AND p1.term = 'value'
              GROUP BY 1
            ),
            resc AS (
              SELECT w2.doc_id,
                     1.0 * w2.bm25
                     + 2.0 * coalesce(ph.n_matches, 0) AS score
              FROM win w2 LEFT JOIN ph USING (doc_id)
              WHERE w2.prim <= 50
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM resc ORDER BY rank LIMIT 10""",
        "dis_max": "WITH " + _BM25_BASE + """,
            qs(qidx, q) AS (VALUES (0, 'data value table'),
                                   (1, 'key hash merge')),
            qt AS (
              SELECT DISTINCT qidx,
                     unnest(list_filter(
                       string_split_regex(lower(q), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
              FROM qs
            ),
            contrib AS (
              SELECT tf.doc_id, qt.qidx,
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus))) AS c
              FROM tf JOIN qt USING (term) JOIN stats s USING (term)
              JOIN dl USING (doc_id)
            ),
            perq AS (SELECT doc_id, qidx, sum(c) AS qscore
                     FROM contrib GROUP BY 1, 2),
            scores AS (
              SELECT doc_id,
                     max(qscore) + 0.3 * (sum(qscore) - max(qscore)) AS score
              FROM perq GROUP BY 1
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM scores ORDER BY rank LIMIT 10""",
        "multi_match": "WITH " + _BM25_BASE + """,
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('src7 data value'), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            tscore AS (
              SELECT tf.doc_id, sum(
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus)))) AS fscore
              FROM tf JOIN qt USING (term) JOIN stats s USING (term)
              JOIN dl USING (doc_id)
              GROUP BY 1
            ),
            stoks AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(source), '[^a-z0-9]+'),
                x -> x <> '') AS w
              FROM documents
            ),
            stf AS (
              SELECT doc_id, unnest(w) AS term, 1::BIGINT AS tf,
                     len(w)::BIGINT AS dl
              FROM stoks
            ),
            sstats AS (SELECT term, count(*)::BIGINT AS df
                       FROM stf GROUP BY 1),
            scorpus AS (
              SELECT count(*)::BIGINT AS n, avg(dl)::DOUBLE AS avgdl
              FROM (SELECT doc_id, max(dl) AS dl FROM stf GROUP BY 1)
            ),
            sscore AS (
              SELECT stf.doc_id, 2.0 * sum(
                     ln(1 + ((SELECT n FROM scorpus) - ss.df + 0.5)
                            / (ss.df + 0.5))
                       * stf.tf
                       / (stf.tf + 1.2 * (0.25 + 0.75 * stf.dl
                          / (SELECT avgdl FROM scorpus)))) AS fscore
              FROM stf JOIN qt USING (term) JOIN sstats ss USING (term)
              GROUP BY 1
            ),
            uni AS (SELECT * FROM tscore UNION ALL SELECT * FROM sscore),
            scores AS (
              SELECT doc_id,
                     max(fscore) + 0.2 * (sum(fscore) - max(fscore)) AS score
              FROM uni GROUP BY 1
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM scores ORDER BY rank LIMIT 10""",
        "constant_score": "WITH " + _TF + """,
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('data value'), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            matched AS (
              SELECT DISTINCT doc_id FROM tf JOIN qt USING (term)
            )
            SELECT row_number() OVER (ORDER BY doc_id ASC)::BIGINT AS rank,
                   doc_id, 1.5 AS score_r6
            FROM matched ORDER BY rank LIMIT 10""",
        "boosting": "WITH " + _BM25_BASE + """,
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('data value table'), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            nt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('slow batch'), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            pos AS (
              SELECT tf.doc_id, sum(
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus)))) AS score
              FROM tf JOIN qt USING (term) JOIN stats s USING (term)
              JOIN dl USING (doc_id)
              GROUP BY 1
            ),
            neg AS (SELECT DISTINCT doc_id FROM tf JOIN nt USING (term)),
            scores AS (
              SELECT p.doc_id,
                     p.score * CASE WHEN n.doc_id IS NULL
                                    THEN 1.0 ELSE 0.4 END AS score
              FROM pos p LEFT JOIN neg n USING (doc_id)
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM scores ORDER BY rank LIMIT 10""",
        "lm_bigram_score": """
            WITH toksl AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
              FROM documents
            ),
            unic AS (
              SELECT term, count(*)::BIGINT AS c
              FROM (SELECT unnest(w) AS term FROM toksl) GROUP BY 1
            ),
            vv AS (SELECT count(*)::BIGINT AS v FROM unic),
            trans AS (
              -- parallel unnests of equal length zip row-wise in DuckDB
              SELECT doc_id, unnest(w[1:len(w) - 1]) AS t1,
                     unnest(w[2:len(w)]) AS t2
              FROM toksl WHERE len(w) >= 2
            ),
            bic AS (SELECT t1, t2, count(*)::BIGINT AS c
                    FROM trans GROUP BY 1, 2),
            lp AS (
              SELECT tr.doc_id,
                     ln((coalesce(b.c, 0) + 0.5)
                        / (u.c + 0.5 * (SELECT v FROM vv))) AS logp
              FROM trans tr
              LEFT JOIN bic b ON b.t1 = tr.t1 AND b.t2 = tr.t2
              JOIN unic u ON u.term = tr.t1
            )
            SELECT doc_id AS id, count(*)::BIGINT AS n_transitions,
                   round(avg(logp), 6) AS avg_logp_r6,
                   round(exp(-avg(logp)), 6) AS ppl_r6
            FROM lp GROUP BY 1""",
        "bpe_word_histogram": """
            SELECT word, count(*)::BIGINT AS c
            FROM (
              SELECT unnest(list_filter(
                string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS word
              FROM documents
            ) GROUP BY 1""",
        "hybrid_rrf": "WITH " + _BM25_BASE + """,
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('data value table'), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            lscore AS (
              SELECT tf.doc_id, sum(
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus)))) AS score
              FROM tf JOIN qt USING (term) JOIN stats s USING (term)
              JOIN dl USING (doc_id)
              GROUP BY 1
            ),
            lexr AS (
              SELECT doc_id, row_number() OVER (
                ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
              FROM lscore
            ),
            qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
            vscore AS (
              SELECT e.vec_id AS doc_id,
                     list_dot_product(e.embedding::DOUBLE[], qv.v::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(qv.v::DOUBLE[],
                                                  qv.v::DOUBLE[]))) AS cos
              FROM embeddings e, qv
            ),
            vecr AS (
              SELECT doc_id, row_number() OVER (
                ORDER BY round(cos, 9) DESC, doc_id ASC) AS rank
              FROM vscore
            ),
            uni AS (
              SELECT doc_id, 1.0 / (60 + rank) AS rrf FROM lexr
              WHERE rank <= 50
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rank) AS rrf FROM vecr
              WHERE rank <= 50
            ),
            fused AS (SELECT doc_id, sum(rrf) AS score FROM uni GROUP BY 1)
            SELECT row_number() OVER (ORDER BY round(score, 12) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM fused ORDER BY rank LIMIT 10""",
        "agg_terms_subs": """
            SELECT lang AS key, count(*)::BIGINT AS doc_count,
                   round(avg(n_chars), 6) AS avg_chars_r6,
                   max(n_chars)::BIGINT AS max_chars
            FROM documents WHERE lang IS NOT NULL
            GROUP BY 1
            ORDER BY doc_count DESC, key ASC LIMIT 10""",
        "web_clean": """
            WITH wrapped AS (
              SELECT doc_id, '<div class=x><p>' || text ||
                     '</p><script>var a=1;</script>&amp; cafe' ||
                     chr(769) || '</div>' AS t
              FROM documents
            ),
            s1 AS (SELECT doc_id, regexp_replace(t,
                     '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
                   FROM wrapped),
            s2 AS (SELECT doc_id, regexp_replace(t,
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, regexp_replace(t,
                     '(?s)<[^>]*>', ' ', 'g') AS t FROM s2),
            s4 AS (SELECT doc_id,
                     replace(replace(replace(replace(replace(replace(t,
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&#39;', chr(39)), '&nbsp;', ' '),
                       '&amp;', '&') AS t
                   FROM s3)
            SELECT doc_id,
                   nfc_normalize(trim(regexp_replace(t, '\\s+', ' ', 'g')))
                     AS text
            FROM s4""",
        "explain_bm25": "WITH " + _BM25_BASE + """,
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('data value zzzunseen'),
                                   '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            hit AS (
              SELECT tf.term, tf.tf, dl.dl
              FROM tf JOIN dl USING (doc_id)
              WHERE tf.doc_id = 5
            ),
            ex AS (
              SELECT qt.term,
                     hit.tf IS NOT NULL AS matched,
                     hit.tf, hit.dl, s.df,
                     ln(1 + ((SELECT n FROM corpus)
                             - coalesce(s.df, 0) + 0.5)
                        / (coalesce(s.df, 0) + 0.5)) AS idf,
                     hit.tf / (hit.tf + 1.2 * (0.25 + 0.75 * hit.dl
                       / (SELECT avgdl FROM corpus))) AS tf_hat
              FROM qt
              LEFT JOIN hit USING (term)
              LEFT JOIN stats s USING (term)
            )
            SELECT term, matched, tf, dl, df,
                   round(idf, 6) AS idf_r6,
                   round(tf_hat, 6) AS tf_hat_r6,
                   round(idf * tf_hat, 6) AS contrib_r6
            FROM ex ORDER BY term""",
        "synonym_match": """
            SELECT doc_id FROM (
              SELECT doc_id, list_transform(
                list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> ''),
                t -> CASE WHEN t = 'fast' THEN 'quick'
                          WHEN t = 'slow' THEN 'quick'
                          ELSE t END) AS toks
              FROM documents
            ) WHERE list_contains(toks, 'quick')""",
        # union of two disjoint half-indexes with merged stats ==
        # single-index BM25: same SQL twin as a7_bm25_topk
        "multi_index_bm25":
            "WITH " + _BM25_SQL.replace("{QUERY}", "data value table"),
        "phrase_suggest": """
            WITH toksl AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
              FROM documents
            ),
            unic AS (
              SELECT term, count(*)::BIGINT AS c
              FROM (SELECT unnest(w) AS term FROM toksl) GROUP BY 1
            ),
            vv AS (SELECT count(*)::BIGINT AS v, sum(c)::DOUBLE AS total
                   FROM unic),
            trans AS (
              SELECT unnest(w[1:len(w) - 1]) AS t1,
                     unnest(w[2:len(w)]) AS t2
              FROM toksl WHERE len(w) >= 2
            ),
            bic AS (SELECT t1, t2, count(*)::BIGINT AS c
                    FROM trans GROUP BY 1, 2),
            inp(pos, itok) AS (VALUES (0, 'valu'), (1, 'tabl')),
            cand AS (
              SELECT pos, itok, term, c,
                     levenshtein(term, itok)::BIGINT AS dist
              FROM unic, inp
              WHERE abs(length(term) - length(itok)) <= 2
                AND levenshtein(term, itok) <= 2
            ),
            top3 AS (
              SELECT pos, term, dist FROM (
                SELECT pos, term, dist, row_number() OVER (
                  PARTITION BY pos
                  ORDER BY dist ASC, c DESC, term ASC) AS rk
                FROM cand
              ) WHERE rk <= 3
            ),
            -- the original token is always a candidate (distance 0)
            cands AS (
              SELECT pos, term, min(dist) AS dist FROM (
                SELECT pos, term, dist FROM top3
                UNION ALL
                SELECT pos, itok AS term, 0::BIGINT AS dist FROM inp
              ) GROUP BY 1, 2
            ),
            cwc AS (
              SELECT cands.pos, cands.term, cands.dist,
                     coalesce(unic.c, 0) AS c
              FROM cands LEFT JOIN unic USING (term)
            ),
            phrases AS (
              SELECT a.term AS w1, b.term AS w2,
                     ln((a.c + 0.5) / ((SELECT total FROM vv)
                        + 0.5 * (SELECT v FROM vv)))
                     + ln((coalesce(bc.c, 0) + 0.5)
                          / (a.c + 0.5 * (SELECT v FROM vv)))
                     + (a.dist + b.dist) * ln(0.2) AS score
              FROM cwc a JOIN cwc b ON a.pos = 0 AND b.pos = 1
              LEFT JOIN bic bc ON bc.t1 = a.term AND bc.t2 = b.term
            )
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      (w1 || ' ' || w2) ASC)::BIGINT AS rank,
                   w1 || ' ' || w2 AS suggestion,
                   round(score, 6) AS score_r6
            FROM phrases ORDER BY rank LIMIT 5""",
        "resample_mix": f"""
            WITH cnt AS (SELECT lang AS g, count(*)::BIGINT AS n
                         FROM documents GROUP BY 1),
            tgt(g, p) AS (VALUES ('en', 0.5), ('fr', 0.25), ('de', 0.25)),
            j AS (SELECT tgt.g, p, n FROM tgt JOIN cnt USING (g)
                  WHERE n > 0),
            nout AS (SELECT min(n / p) AS no FROM j),
            rates AS (SELECT g, least(1.0, p * (SELECT no FROM nout) / n)
                        AS r FROM j)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN rates ON rates.g = d.lang
            WHERE {_hash_u("d.doc_id", "mix")} < rates.r""",
        "knn_filtered": """
            WITH allowed AS (SELECT doc_id FROM documents
                             WHERE lang = 'en'),
            q AS (
              SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 2
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[],
                                                  q.qv::DOUBLE[]))) AS cos
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.query_id
                AND e.vec_id IN (SELECT doc_id FROM allowed)
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        "decontaminate": """
            WITH dt AS (
              SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                         x -> x <> '') AS w
              FROM documents
            ),
            dsh0 AS (
              SELECT doc_id, unnest(CASE WHEN len(w) >= 6
                     THEN [array_to_string(w[i:i+5], ' ')
                           for i in range(1, len(w)-4)]
                     ELSE [array_to_string(w, ' ')] END) AS shingle
              FROM dt
            ),
            dsh AS (SELECT DISTINCT doc_id, shingle FROM dsh0
                    WHERE shingle <> ''),
            esh AS (SELECT doc_id AS eval_id, shingle FROM dsh
                    WHERE doc_id % 41 = 0),
            esz AS (SELECT eval_id, count(*)::BIGINT AS eval_ngrams
                    FROM esh GROUP BY 1),
            hits AS (
              SELECT d.doc_id AS id, e.eval_id,
                     count(*)::BIGINT AS n_collisions
              FROM dsh d JOIN esh e USING (shingle)
              GROUP BY 1, 2
            )
            SELECT id, eval_id, n_collisions, eval_ngrams,
                   round(n_collisions::DOUBLE / eval_ngrams, 6) AS overlap_r6
            FROM hits JOIN esz USING (eval_id)""",
        "pack_mapping": """
            WITH toks AS (
              SELECT doc_id AS id,
                     len(list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> ''))::BIGINT AS nt
              FROM documents
            ),
            nz AS (SELECT * FROM toks WHERE nt > 0),
            offs AS (
              SELECT id, nt,
                     coalesce(sum(nt + 1) OVER (ORDER BY id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS off
              FROM nz
            ),
            ex AS (
              SELECT id, nt, off,
                     unnest(range(off // 64, (off + nt - 1) // 64 + 1))
                       AS seq_id
              FROM offs
            )
            SELECT seq_id::BIGINT AS seq_id, id,
                   (greatest(off, seq_id * 64) - off)::BIGINT AS doc_off,
                   (greatest(off, seq_id * 64) - seq_id * 64)::BIGINT
                     AS seq_off,
                   (least(off + nt, seq_id * 64 + 64)
                    - greatest(off, seq_id * 64))::BIGINT AS n_toks
            FROM ex""",
        "span_or": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT doc_id, count(*)::BIGINT AS n_matches
            FROM pos WHERE term IN ('data', 'value')
            GROUP BY 1""",
        "span_first": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT doc_id, count(*)::BIGINT AS n_matches
            FROM pos WHERE term = 'data' AND pos + 1 <= 3
            GROUP BY 1""",
        "span_not": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT i.doc_id, count(*)::BIGINT AS n_matches
            FROM pos i
            WHERE i.term = 'data' AND NOT EXISTS (
              SELECT 1 FROM pos e
              WHERE e.doc_id = i.doc_id AND e.term = 'table'
                AND e.pos BETWEEN i.pos - 1 AND i.pos + 1)
            GROUP BY 1""",
        "intervals_unordered": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            ),
            anchors AS (
              SELECT DISTINCT doc_id, pos FROM pos
              WHERE term IN ('table', 'value')
            ),
            v AS (
              SELECT a.doc_id, a.pos,
                (SELECT min(p.pos) FROM pos p
                 WHERE p.doc_id = a.doc_id AND p.term = 'table'
                   AND p.pos >= a.pos) AS nt,
                (SELECT min(p.pos) FROM pos p
                 WHERE p.doc_id = a.doc_id AND p.term = 'value'
                   AND p.pos >= a.pos) AS nv
              FROM anchors a
            )
            SELECT doc_id, count(*)::BIGINT AS n_matches
            FROM v
            WHERE nt IS NOT NULL AND nv IS NOT NULL
              AND greatest(nt, nv) - pos - 1 <= 2
            GROUP BY 1""",
        "span_containing": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            ),
            big AS (
              SELECT a.doc_id, a.pos AS p,
                (SELECT min(b.pos) FROM pos b
                 WHERE b.doc_id = a.doc_id AND b.term = 'value'
                   AND b.pos > a.pos) AS q
              FROM pos a WHERE a.term = 'data'
            ),
            valid AS (
              SELECT doc_id, p, q FROM big
              WHERE q IS NOT NULL AND q - p - 1 <= 2
            )
            SELECT v.doc_id, count(*)::BIGINT AS n_matches
            FROM valid v
            WHERE EXISTS (
              SELECT 1 FROM pos l
              WHERE l.doc_id = v.doc_id AND l.term = 'table'
                AND l.pos BETWEEN v.p AND v.q)
            GROUP BY 1""",
        "span_within": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            ),
            big AS (
              SELECT a.doc_id, a.pos AS p,
                (SELECT min(b.pos) FROM pos b
                 WHERE b.doc_id = a.doc_id AND b.term = 'value'
                   AND b.pos > a.pos) AS q
              FROM pos a WHERE a.term = 'data'
            ),
            valid AS (
              SELECT doc_id, p, q FROM big
              WHERE q IS NOT NULL AND q - p - 1 <= 3
            )
            SELECT l.doc_id, count(*)::BIGINT AS n_matches
            FROM pos l
            WHERE l.term = 'table' AND EXISTS (
              SELECT 1 FROM valid v
              WHERE v.doc_id = l.doc_id AND l.pos BETWEEN v.p AND v.q)
            GROUP BY 1""",
        "span_multi": f"""
            WITH {_TOKS},
            pos AS (SELECT doc_id, unnest(w) AS term FROM toks)
            SELECT doc_id, count(*)::BIGINT AS n_matches
            FROM pos WHERE term LIKE 'val%'
            GROUP BY 1""",
        "simple_query_string": f"""
            WITH {_TOKS}
            SELECT doc_id FROM toks
            WHERE (list_contains(w, 'data')
                   AND len(list_filter(w, x -> x LIKE 'valu%')) > 0)
               OR (list_contains(w, 'table')
                   AND len([i for i in range(1, len(w))
                            if w[i] = 'data' AND w[i+1] = 'value']) = 0)""",
        "sqs_phrase_slop": f"""
            WITH {_TOKS},
            pos AS (
              SELECT doc_id, unnest(w) AS term,
                     unnest(range(len(w))) AS pos
              FROM toks
            )
            SELECT DISTINCT a.doc_id
            FROM pos a JOIN pos b USING (doc_id)
            WHERE a.term = 'data' AND b.term = 'value'
              AND b.pos > a.pos AND b.pos - a.pos <= 2""",
        "agg_geohash_grid": _geohash_grid_oracle(),
        "agg_random_sampler": f"""
            SELECT lang AS key,
                   count(*)::BIGINT AS sampled_count,
                   CAST(round(count(*) / 0.5) AS BIGINT) AS doc_count
            FROM documents
            WHERE {_hash_u('doc_id', 'rs1')} < 0.5
            GROUP BY 1""",
        "agg_ip_prefix": """
            WITH ips AS (
              SELECT '10.' || CAST(doc_id % 4 AS VARCHAR) || '.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.9' AS ip
              FROM documents
            ),
            n AS (
              SELECT CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                   + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                   + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                   + CAST(string_split(ip, '.')[4] AS BIGINT) AS v
              FROM ips
            ),
            net AS (SELECT (v >> 12) << 12 AS m FROM n)
            SELECT CAST(m >> 24 AS VARCHAR) || '.'
                   || CAST((m >> 16) % 256 AS VARCHAR) || '.'
                   || CAST((m >> 8) % 256 AS VARCHAR) || '.'
                   || CAST(m % 256 AS VARCHAR) || '/20' AS key,
                   count(*)::BIGINT AS doc_count
            FROM net GROUP BY 1""",
        "agg_change_point": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS day,
                     CAST(count(*) AS DOUBLE) AS v
              FROM events GROUP BY 1
            ),
            b AS (
              SELECT day, v,
                     row_number() OVER (ORDER BY day) AS rn,
                     sum(v) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cs,
                     sum(v * v) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cs2,
                     count(*) OVER () AS n,
                     sum(v) OVER () AS s,
                     sum(v * v) OVER () AS s2,
                     lead(day) OVER (ORDER BY day) AS cp_day
              FROM daily
            ),
            sc AS (
              SELECT cp_day,
                     (cs / rn - (s - cs) / (n - rn)) / sqrt(
                       ((cs2 - rn * (cs / rn) * (cs / rn)) / (rn - 1)) / rn
                       + ((s2 - cs2 - (n - rn) * ((s - cs) / (n - rn))
                           * ((s - cs) / (n - rn))) / (n - rn - 1))
                         / (n - rn)) AS t,
                     cs / rn AS m1,
                     (s - cs) / (n - rn) AS m2
              FROM b WHERE rn >= 2 AND rn <= n - 2
            )
            SELECT strftime(cp_day, '%Y-%m-%d') AS day,
                   round(t, 6) AS t_stat_r6,
                   round(m1, 6) AS left_mean_r6,
                   round(m2, 6) AS right_mean_r6
            FROM sc
            ORDER BY round(abs(t), 9) DESC, cp_day ASC LIMIT 1""",
        "agg_bucket_correlation": """
            WITH buckets AS (
              SELECT lang AS key, CAST(count(*) AS DOUBLE) AS c
              FROM documents GROUP BY 1
            ),
            ind(key, i) AS (
              VALUES ('en', 1.0), ('de', 0.5), ('fr', 0.0)
            )
            SELECT round(corr(b.c, coalesce(ind.i, 0.0)), 6)
                     AS correlation_r6
            FROM buckets b LEFT JOIN ind USING (key)""",
        "agg_ks_test": """
            WITH buckets AS (
              SELECT event_type AS key, CAST(count(*) AS DOUBLE) AS c
              FROM events GROUP BY 1
            ),
            b AS (
              SELECT key, c, 1.0 AS f,
                     sum(c) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) / sum(c) OVER () AS ca,
                     sum(1.0) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) / sum(1.0) OVER () AS ce
              FROM buckets
            )
            SELECT round(max(abs(ca - ce)), 6) AS d_statistic_r6
            FROM b""",
        "terms_enum": f"""
            WITH {_TOKS},
            v AS (SELECT DISTINCT unnest(w) AS term FROM toks)
            SELECT term FROM v WHERE term LIKE 's%'
            ORDER BY term LIMIT 8""",
        "agg_moving_percentiles": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS day,
                     CAST(count(*) AS DOUBLE) AS v
              FROM events GROUP BY 1
            ),
            win AS (
              SELECT day,
                     list_sort(list(v) OVER (ORDER BY day ROWS BETWEEN
                       2 PRECEDING AND CURRENT ROW)) AS arr
              FROM daily
            ),
            ix AS (
              SELECT day, arr,
                     (len(arr) - 1)::DOUBLE * 0.5 AS idx
              FROM win
            ),
            v AS (
              SELECT day,
                     arr[CAST(floor(idx) AS INT) + 1]
                       * (1.0 - (idx - floor(idx)))
                     + coalesce(arr[CAST(floor(idx) AS INT) + 2],
                                arr[CAST(floor(idx) AS INT) + 1])
                       * (idx - floor(idx)) AS p50
              FROM ix
            )
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   round(p50, 6) AS p50_r6
            FROM v""",
        "split_cluster_safe": f"""
            WITH {_DUPS3_SQL},
            rep AS (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY text) AS r
              FROM docs_dup
            )
            SELECT doc_id, {_cluster_split_case()} AS split
            FROM rep""",
        "alias_search": "WITH " + _BM25_BASE + """,
            qt AS (SELECT DISTINCT unnest(list_filter(
                     string_split_regex(lower('data value table'),
                                        '[^a-z0-9]+'),
                     x -> x <> '')) AS term),
            contrib AS (
              SELECT tf.doc_id,
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                          / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus)))
                       AS c
              FROM tf JOIN qt USING (term) JOIN stats s USING (term)
              JOIN dl USING (doc_id)
              WHERE tf.doc_id IN
                    (SELECT doc_id FROM documents WHERE lang = 'en')
            ),
            scores AS (SELECT doc_id, sum(c) AS score
                       FROM contrib GROUP BY 1),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY round(score, 9) DESC,
                                        doc_id ASC) AS rank,
                     round(score, 6) AS score_r6
              FROM scores
            )
            SELECT rank::BIGINT AS rank, doc_id, score_r6
            FROM ranked WHERE rank <= 10""",
        "agg_geo_line": """
            WITH g AS (
              SELECT c_custkey, c_custkey % 5 AS grp,
                     ((c_custkey * 37) % 18000) / 100.0 - 90.0 AS lat,
                     ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS lon
              FROM customer
            ),
            r AS (
              SELECT grp AS key,
                     row_number() OVER (PARTITION BY grp
                                        ORDER BY c_custkey) AS seq,
                     lon, lat
              FROM g
            )
            SELECT key, seq::BIGINT AS seq,
                   round(lon, 6) AS lon_r6, round(lat, 6) AS lat_r6
            FROM r WHERE seq <= 12""",
        "sparse_vector": f"""
            WITH {_BM25_BASE},
            feats AS (
              SELECT tf.doc_id, tf.term AS feature,
                     tf.tf::DOUBLE * ln(1.0 + (SELECT n FROM corpus)::DOUBLE
                                        / stats.df) AS weight
              FROM tf JOIN stats ON tf.term = stats.term
            ),
            q(feature, q_weight) AS (
              VALUES ('data', 2.0::DOUBLE), ('value', 1.0::DOUBLE),
                     ('slow', 1.5::DOUBLE)
            ),
            scored AS (
              SELECT doc_id, sum(weight * q_weight) AS score
              FROM feats JOIN q USING (feature)
              GROUP BY 1
            ),
            top AS (
              SELECT doc_id, round(score, 9) AS score_r9
              FROM scored
              ORDER BY round(score, 9) DESC, doc_id ASC LIMIT 10
            )
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_r9 DESC, doc_id ASC)
                     ::INT AS rank,
                   score_r9
            FROM top""",
        "agg_string_stats": """
            WITH base AS (
              SELECT count(*)::BIGINT AS count,
                     min(length(text))::BIGINT AS min_length,
                     max(length(text))::BIGINT AS max_length,
                     round(avg(length(text)), 6) AS avg_length
              FROM documents WHERE text IS NOT NULL
            ),
            chars AS (
              SELECT unnest(string_split(text, '')) AS ch
              FROM documents WHERE text IS NOT NULL
            ),
            cnt AS (
              SELECT ch, count(*)::DOUBLE AS n FROM chars
              WHERE ch <> '' GROUP BY 1
            ),
            ent AS (
              SELECT round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6)
                     AS entropy
              FROM cnt
            )
            SELECT * FROM base, ent""",
        "agg_boxplot": """
            SELECT min(n_chars)::DOUBLE AS min,
                   round(quantile_cont(n_chars, 0.25), 6) AS q1,
                   round(quantile_cont(n_chars, 0.5), 6) AS q2,
                   round(quantile_cont(n_chars, 0.75), 6) AS q3,
                   max(n_chars)::DOUBLE AS max
            FROM documents WHERE n_chars IS NOT NULL""",
        "agg_matrix_stats": """
            WITH src AS (
              SELECT l_quantity::DOUBLE AS x,
                     round(l_discount * 100, 0)::DOUBLE AS y,
                     round(l_tax * 100, 0)::DOUBLE AS z
              FROM lineitem
            ),
            s AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(x) AS s1x, sum(x*x) AS s2x,
                     sum(x*x*x) AS s3x, sum(x*x*x*x) AS s4x,
                     sum(y) AS s1y, sum(y*y) AS s2y,
                     sum(y*y*y) AS s3y, sum(y*y*y*y) AS s4y,
                     sum(z) AS s1z, sum(z*z) AS s2z,
                     sum(z*z*z) AS s3z, sum(z*z*z*z) AS s4z,
                     sum(x*y) AS spxy, sum(x*z) AS spxz, sum(y*z) AS spyz
              FROM src
            ),
            m AS (
              SELECT *,
                     s1x/n AS mx, s1y/n AS my, s1z/n AS mz,
                     s2x/n - (s1x/n)*(s1x/n) AS vx,
                     s2y/n - (s1y/n)*(s1y/n) AS vy,
                     s2z/n - (s1z/n)*(s1z/n) AS vz
              FROM s
            )
            SELECT 'x' AS field_a, 'x' AS field_b, n::BIGINT AS count,
                   round(vx, 6) AS covariance, 1.0 AS correlation,
                   round(mx, 6) AS mean, round(vx, 6) AS variance,
                   round((s3x/n - 3*mx*s2x/n + 2*power(mx,3))
                         / power(vx, 1.5), 6) AS skewness,
                   round((s4x/n - 4*mx*s3x/n + 6*mx*mx*s2x/n
                          - 3*power(mx,4)) / power(vx, 2), 6) AS kurtosis
            FROM m
            UNION ALL
            SELECT 'x', 'y', n::BIGINT, round(spxy/n - mx*my, 6),
                   round((spxy/n - mx*my) / power(vx*vy, 0.5), 6),
                   NULL, NULL, NULL, NULL FROM m
            UNION ALL
            SELECT 'x', 'z', n::BIGINT, round(spxz/n - mx*mz, 6),
                   round((spxz/n - mx*mz) / power(vx*vz, 0.5), 6),
                   NULL, NULL, NULL, NULL FROM m
            UNION ALL
            SELECT 'y', 'y', n::BIGINT, round(vy, 6), 1.0,
                   round(my, 6), round(vy, 6),
                   round((s3y/n - 3*my*s2y/n + 2*power(my,3))
                         / power(vy, 1.5), 6),
                   round((s4y/n - 4*my*s3y/n + 6*my*my*s2y/n
                          - 3*power(my,4)) / power(vy, 2), 6) FROM m
            UNION ALL
            SELECT 'y', 'z', n::BIGINT, round(spyz/n - my*mz, 6),
                   round((spyz/n - my*mz) / power(vy*vz, 0.5), 6),
                   NULL, NULL, NULL, NULL FROM m
            UNION ALL
            SELECT 'z', 'z', n::BIGINT, round(vz, 6), 1.0,
                   round(mz, 6), round(vz, 6),
                   round((s3z/n - 3*mz*s2z/n + 2*power(mz,3))
                         / power(vz, 1.5), 6),
                   round((s4z/n - 4*mz*s3z/n + 6*mz*mz*s2z/n
                          - 3*power(mz,4)) / power(vz, 2), 6) FROM m""",
        "agg_t_test": """
            WITH s AS (
              SELECT count(CASE WHEN lang = 'en' THEN 1 END)::DOUBLE AS na,
                     avg(CASE WHEN lang = 'en' THEN n_chars END) AS ma,
                     var_samp(CASE WHEN lang = 'en' THEN n_chars END) AS va,
                     count(CASE WHEN lang <> 'en' THEN 1 END)::DOUBLE AS nb,
                     avg(CASE WHEN lang <> 'en' THEN n_chars END) AS mb,
                     var_samp(CASE WHEN lang <> 'en' THEN n_chars END) AS vb
              FROM documents
            )
            SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
                   round((ma - mb) / sqrt(va/na + vb/nb), 6) AS t_value,
                   round(((va/na + vb/nb) * (va/na + vb/nb))
                         / (power(va/na, 2)/(na-1)
                            + power(vb/nb, 2)/(nb-1)), 6)
                     AS degrees_of_freedom
            FROM s""",
        "agg_scripted_metric": """
            SELECT event_type AS key,
                   round(sqrt(sum(value * value) / count(*)), 6) AS rms
            FROM events GROUP BY 1""",
        "geo_grid": """
            WITH g AS (
              SELECT ((c_custkey * 37) % 18000) / 100.0 - 90.0 AS lat,
                     ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS lon
              FROM customer
            ),
            t AS (
              SELECT floor((lon + 180.0) / 360.0 * 16.0) AS x0,
                     floor((1.0 - ln(tan(radians(
                               greatest(least(lat, 85.05112878),
                                        -85.05112878)))
                            + 1.0 / cos(radians(
                               greatest(least(lat, 85.05112878),
                                        -85.05112878)))) / pi())
                           / 2.0 * 16.0) AS y0
              FROM g
            ),
            k AS (
              SELECT '4/' || least(x0, 15)::BIGINT::VARCHAR || '/'
                     || greatest(least(y0, 15), 0)::BIGINT::VARCHAR AS key
              FROM t
            )
            SELECT key, count(*)::BIGINT AS doc_count
            FROM k GROUP BY 1
            ORDER BY doc_count DESC, key ASC LIMIT 20""",
        "geo_distance_rings": """
            WITH g AS (
              SELECT ((c_custkey * 37) % 18000) / 100.0 - 90.0 AS lat,
                     ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS lon
              FROM customer
            ),
            d AS (
              SELECT 2.0 * 6371.0 * asin(sqrt(
                       power(sin(radians(lat) / 2.0), 2)
                       + cos(radians(lat)) * 1.0
                         * power(sin(radians(lon) / 2.0), 2))) AS dist
              FROM g
            )
            SELECT '*-2000.0' AS key,
                   count(CASE WHEN dist < 2000.0 THEN 1 END)::BIGINT
                     AS doc_count FROM d
            UNION ALL
            SELECT '2000.0-8000.0',
                   count(CASE WHEN dist >= 2000.0 AND dist < 8000.0
                         THEN 1 END)::BIGINT FROM d
            UNION ALL
            SELECT '8000.0-*',
                   count(CASE WHEN dist >= 8000.0 THEN 1 END)::BIGINT
            FROM d""",
        "feat_hash_embed": f"""
            WITH {_TF},
            stats AS (
              SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
            ),
            nd AS (
              SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf
            ),
            w AS (
              SELECT tf.doc_id,
                     ('0x' || substr(md5(tf.term || 'fh_b'), 1, 15))::BIGINT % 16 AS j,
                     (CASE WHEN ('0x' || substr(md5(tf.term || 'fh_s'), 1, 15))::BIGINT % 2 = 0
                           THEN 1.0 ELSE -1.0 END)
                     * tf.tf * (ln((nd.n + 1.0) / (stats.df + 1.0)) + 1.0)
                       AS wt
              FROM tf JOIN stats USING (term), nd
            ),
            cells AS (
              SELECT doc_id, j, sum(wt) AS v FROM w GROUP BY 1, 2
            ),
            dims AS (SELECT unnest(range(16)) AS j),
            docs_t AS (SELECT DISTINCT doc_id FROM tf),
            dense AS (
              SELECT d.doc_id, dims.j, coalesce(c.v, 0.0) AS v
              FROM docs_t d CROSS JOIN dims
              LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.j = dims.j
            ),
            nrm AS (
              SELECT doc_id, sqrt(sum(v * v)) AS nrm
              FROM dense GROUP BY 1
            )
            SELECT d.doc_id, d.j::BIGINT AS j,
                   round(d.v / n.nrm, 6) AS val
            FROM dense d JOIN nrm n USING (doc_id)""",
        "shard_assignment": f"""
            WITH u AS (
              SELECT doc_id, (('0x' || substr(md5(cast(doc_id AS VARCHAR) || 'shard'), 1, 15))::BIGINT / 1152921504606846976.0) AS u
              FROM documents
            )
            SELECT doc_id,
                   cast(floor(u * 4) AS INT) AS shard,
                   (row_number() OVER (
                      PARTITION BY cast(floor(u * 4) AS INT)
                      ORDER BY u ASC, doc_id ASC) - 1)::BIGINT AS pos
            FROM u""",
        "has_child": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              WHERE l_quantity >= 45
              GROUP BY 1 HAVING count(*) >= 2)""",
        "has_parent": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders
              WHERE o_totalprice > 400000.0)""",
        "agg_children": """
            WITH pc AS (
              SELECT l_orderkey AS o_orderkey,
                     count(*)::BIGINT AS nc
              FROM lineitem WHERE l_quantity >= 25 GROUP BY 1
            )
            SELECT o.o_orderstatus AS key,
                   sum(pc.nc)::BIGINT AS doc_count
            FROM orders o JOIN pc USING (o_orderkey)
            GROUP BY 1""",
        "mget": """
            WITH req(doc_id) AS (VALUES (0), (1), (2), (3), (10000000))
            SELECT req.doc_id,
                   d.doc_id IS NOT NULL AS found,
                   coalesce(d.lang, '') AS lang_c,
                   coalesce(d.n_chars, -1)::BIGINT AS n_chars_c
            FROM req LEFT JOIN documents d USING (doc_id)""",
        "agg_percentile_ranks": """
            WITH c AS (
              SELECT count(n_chars)::DOUBLE AS n,
                     sum(CASE WHEN n_chars <= 100 THEN 1 ELSE 0
                         END)::DOUBLE AS le0,
                     sum(CASE WHEN n_chars <= 300 THEN 1 ELSE 0
                         END)::DOUBLE AS le1,
                     sum(CASE WHEN n_chars <= 500 THEN 1 ELSE 0
                         END)::DOUBLE AS le2
              FROM documents WHERE n_chars IS NOT NULL
            )
            SELECT 100.0::DOUBLE AS value,
                   round(100.0 * le0 / n, 6) AS rank FROM c
            UNION ALL
            SELECT 300.0::DOUBLE, round(100.0 * le1 / n, 6) FROM c
            UNION ALL
            SELECT 500.0::DOUBLE, round(100.0 * le2 / n, 6) FROM c""",
        "agg_ip_range": """
            WITH ips AS (
              SELECT '10.' || (user_id % 256)::VARCHAR || '.'
                     || ((user_id // 256) % 256)::VARCHAR || '.'
                     || (event_id % 256)::VARCHAR AS ip
              FROM events
            ),
            parsed AS (
              SELECT string_split(ip, '.')[1]::BIGINT * 16777216
                     + string_split(ip, '.')[2]::BIGINT * 65536
                     + string_split(ip, '.')[3]::BIGINT * 256
                     + string_split(ip, '.')[4]::BIGINT AS n
              FROM ips WHERE ip IS NOT NULL
            )
            SELECT '*-10.64.0.0' AS key,
                   count(CASE WHEN n < 10*16777216 + 64*65536
                         THEN 1 END)::BIGINT AS doc_count FROM parsed
            UNION ALL
            SELECT '10.64.0.0-10.192.0.0',
                   count(CASE WHEN n >= 10*16777216 + 64*65536
                              AND n < 10*16777216 + 192*65536
                         THEN 1 END)::BIGINT FROM parsed
            UNION ALL
            SELECT '10.192.0.0-*',
                   count(CASE WHEN n >= 10*16777216 + 192*65536
                         THEN 1 END)::BIGINT FROM parsed""",
        "cross_fields": f"""
            WITH {_BM25_BASE},
            stoks AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(source), '[^a-z0-9]+'),
                x -> x <> '') AS w
              FROM documents
            ),
            sposts AS (SELECT doc_id, unnest(w) AS term FROM stoks),
            stf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                    FROM sposts GROUP BY 1, 2),
            sdl AS (SELECT doc_id, len(w)::BIGINT AS dl FROM stoks
                    WHERE len(w) > 0),
            sstats AS (SELECT term, count(*)::BIGINT AS df
                       FROM stf GROUP BY 1),
            scorpus AS (SELECT count(*)::BIGINT AS n,
                               sum(dl)::DOUBLE / count(*) AS avgdl
                        FROM sdl),
            qt AS (
              SELECT DISTINCT unnest(list_filter(
                string_split_regex(lower('src7 data value'),
                                   '[^a-z0-9]+'),
                x -> x <> '')) AS term
            ),
            blend AS (
              SELECT qt.term,
                     greatest(coalesce(s1.df, 0),
                              coalesce(s2.df, 0)) AS df
              FROM qt LEFT JOIN stats s1 USING (term)
                      LEFT JOIN sstats s2 USING (term)
            ),
            nmax AS (
              SELECT greatest((SELECT n FROM corpus),
                              (SELECT n FROM scorpus)) AS n
            ),
            bidf AS (
              SELECT term,
                     ln(1 + ((SELECT n FROM nmax) - df + 0.5)
                            / (df + 0.5)) AS idf
              FROM blend
            ),
            c1 AS (
              SELECT tf.doc_id, tf.term,
                     b.idf * tf.tf
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                        / (SELECT avgdl FROM corpus))) AS contrib
              FROM tf JOIN bidf b USING (term) JOIN dl USING (doc_id)
            ),
            c2 AS (
              SELECT stf.doc_id, stf.term,
                     b.idf * stf.tf
                     / (stf.tf + 1.2 * (0.25 + 0.75 * sdl.dl
                        / (SELECT avgdl FROM scorpus))) AS contrib
              FROM stf JOIN bidf b USING (term) JOIN sdl USING (doc_id)
            ),
            uni AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
            best AS (SELECT doc_id, term, max(contrib) AS bc
                     FROM uni GROUP BY 1, 2),
            scores AS (SELECT doc_id, sum(bc) AS score
                       FROM best GROUP BY 1)
            SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                      doc_id ASC)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score_r6
            FROM scores ORDER BY rank LIMIT 10""",
        # mm_feature_extract: closed-form payloads (every pixel/sample
        # = integer arithmetic over (doc_id, coords)) are real-encoded
        # to BMP/WAV/Y4M and REALLY decoded by the engine; the oracle
        # recomputes the decoded-content statistics from the closed
        # form — no byte parsing, but any decode bug (padding, channel
        # order, endianness, plane layout) diverges the means.  Stats
        # pass through a REAL (float32) cast on both sides because the
        # stored feature dtype is float32.
        "mm_feature_extract": """
            WITH ids AS (SELECT i FROM generate_series(0, 63) t(i)),
            img AS (
              SELECT i, 16 + 4*(i % 5) AS w, 12 + 4*(i % 4) AS h
              FROM ids WHERE i % 3 = 0
            ),
            img_px AS (
              SELECT img.i, c.c,
                     ((17*x.x + 29*y.y + 43*c.c + 7*img.i) % 256)::DOUBLE
                       AS v
              FROM img
              CROSS JOIN generate_series(0, 31) AS x(x)
              CROSS JOIN generate_series(0, 27) AS y(y)
              CROSS JOIN generate_series(0, 2) AS c(c)
              WHERE x.x < img.w AND y.y < img.h
            ),
            img_out AS (
              SELECT i AS doc_id, 'image' AS kind, 16::BIGINT AS dim,
                round(CAST(avg(CASE WHEN c=0 THEN v END) AS REAL)
                      ::DOUBLE, 6) AS v1_r6,
                round(CAST(avg(CASE WHEN c=1 THEN v END) AS REAL)
                      ::DOUBLE, 6) AS v2_r6,
                round(CAST(avg(CASE WHEN c=2 THEN v END) AS REAL)
                      ::DOUBLE, 6) AS v3_r6
              FROM img_px GROUP BY i
            ),
            aud AS (
              SELECT i, 400 + 80*(i % 7) AS ns FROM ids WHERE i % 3 = 1
            ),
            aud_s AS (
              SELECT aud.i, aud.ns,
                     (((2654435761 * t.t + 97*aud.i) % 65536)
                      - 32768)::DOUBLE / 32768.0 AS x
              FROM aud
              CROSS JOIN generate_series(0, 879) AS t(t)
              WHERE t.t < aud.ns
            ),
            aud_out AS (
              SELECT i AS doc_id, 'audio' AS kind, 16::BIGINT AS dim,
                round(CAST(any_value(ns)::DOUBLE / 8000.0 AS REAL)
                      ::DOUBLE, 6) AS v1_r6,
                round(CAST(sqrt(avg(x*x)) AS REAL)::DOUBLE, 6) AS v2_r6,
                round(CAST(avg(abs(x)) AS REAL)::DOUBLE, 6) AS v3_r6
              FROM aud_s GROUP BY i
            ),
            vid AS (
              SELECT i, 3 + (i % 3) AS nf FROM ids WHERE i % 3 = 2
            ),
            vid_px AS (
              SELECT vid.i, vid.nf, t.t, y.y, x.x,
                     ((7*x.x + 11*y.y + 13*t.t + 5*vid.i) % 256)::DOUBLE
                       AS v
              FROM vid
              CROSS JOIN generate_series(0, 4) AS t(t)
              CROSS JOIN generate_series(0, 7) AS y(y)
              CROSS JOIN generate_series(0, 15) AS x(x)
              WHERE t.t < vid.nf
            ),
            vid_diff AS (
              SELECT a.i, avg(abs(a.v - b.v)) AS d
              FROM vid_px a JOIN vid_px b
                ON a.i = b.i AND a.t = b.t + 1 AND a.y = b.y
               AND a.x = b.x
              GROUP BY a.i
            ),
            vid_out AS (
              SELECT p.i AS doc_id, 'video' AS kind, 16::BIGINT AS dim,
                round(CAST(any_value(p.nf)::DOUBLE AS REAL)::DOUBLE, 6)
                  AS v1_r6,
                round(CAST(avg(p.v) AS REAL)::DOUBLE, 6) AS v2_r6,
                round(CAST(any_value(d.d) AS REAL)::DOUBLE, 6) AS v3_r6
              FROM vid_px p JOIN vid_diff d ON d.i = p.i
              GROUP BY p.i
            )
            SELECT * FROM img_out
            UNION ALL SELECT * FROM aud_out
            UNION ALL SELECT * FROM vid_out""",
        # greedy in-order chain: t1 = min click after anchor view,
        # t2 = min purchase after that t1; count anchors whose chain
        # completes within maxspan (EQL's one-sequence-per-anchor model)
        "eql_sequence": """
            WITH e AS (SELECT user_id, epoch(ts) AS t, event_type
                       FROM events),
            s0 AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
            s1 AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
            s2 AS (SELECT user_id, t FROM e
                   WHERE event_type = 'purchase'),
            c1 AS (
              SELECT s0.user_id, s0.t AS t0, min(s1.t) AS t1
              FROM s0 JOIN s1 ON s1.user_id = s0.user_id
                             AND s1.t > s0.t
              GROUP BY 1, 2
            ),
            c2 AS (
              SELECT c1.user_id, c1.t0, min(s2.t) AS t2
              FROM c1 JOIN s2 ON s2.user_id = c1.user_id
                             AND s2.t > c1.t1
              GROUP BY 1, 2
            )
            SELECT user_id, count(*)::BIGINT AS n_matches
            FROM c2 WHERE t2 - t0 <= 172800.0
            GROUP BY 1""",
        "eql_sample": """
            WITH e AS (SELECT user_id, epoch(ts) AS t, event_type
                       FROM events),
            agg AS (
              SELECT user_id,
                     max(CASE WHEN event_type = 'view' THEN t END)
                       AS ts_0,
                     max(CASE WHEN event_type = 'purchase' THEN t END)
                       AS ts_1,
                     max(CASE WHEN event_type = 'click' THEN t END)
                       AS ts_2
              FROM e GROUP BY 1
            )
            SELECT user_id, ts_0, ts_1, ts_2 FROM agg
            WHERE ts_0 IS NOT NULL AND ts_1 IS NOT NULL
              AND ts_2 IS NOT NULL
            ORDER BY user_id ASC LIMIT 20""",
        "eql_until": """
            WITH e AS (SELECT user_id, epoch(ts) AS t, event_type
                       FROM events),
            s0 AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
            s1 AS (SELECT user_id, t FROM e
                   WHERE event_type = 'purchase'),
            u AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
            c1 AS (
              SELECT s0.user_id, s0.t AS t0, min(s1.t) AS t1
              FROM s0 JOIN s1 ON s1.user_id = s0.user_id
                             AND s1.t > s0.t
              GROUP BY 1, 2
            ),
            ok AS (
              SELECT user_id, t0, t1 FROM c1
              WHERE t1 - t0 <= 172800.0
                AND NOT EXISTS (
                  SELECT 1 FROM u
                  WHERE u.user_id = c1.user_id
                    AND u.t > c1.t0 AND u.t < c1.t1)
            )
            SELECT user_id, count(*)::BIGINT AS n_matches
            FROM ok GROUP BY 1""",
        "agg_bucket_pipeline2": """
            WITH b AS (
              SELECT epoch(date_trunc('hour', ts))::BIGINT AS key_epoch,
                     count(*)::BIGINT AS doc_count
              FROM events WHERE ts IS NOT NULL GROUP BY 1
            )
            SELECT key_epoch, doc_count,
                   round(doc_count * 2.0, 6) AS dbl,
                   round(round(doc_count
                         / sum(doc_count) OVER (), 6), 6) AS pct
            FROM b QUALIFY doc_count >= 2""",
        "agg_percentiles_bucket": """
            WITH b AS (
              SELECT date_trunc('hour', ts) AS key_ts,
                     count(*)::DOUBLE AS doc_count
              FROM events WHERE ts IS NOT NULL GROUP BY 1
            )
            SELECT p.percent, round(q.v[p.i], 6) AS value
            FROM (SELECT quantile_cont(doc_count,
                           [0.25, 0.5, 0.75, 0.99]) AS v FROM b) q,
                 (VALUES (25.0::DOUBLE, 1), (50.0::DOUBLE, 2),
                         (75.0::DOUBLE, 3), (99.0::DOUBLE, 4))
                   AS p(percent, i)""",
        "esql_stats": """
            SELECT epoch(date_trunc('day', ts))::BIGINT AS day_s,
                   event_type,
                   count(*)::BIGINT AS n,
                   round(sum(value), 6) AS total,
                   round(max(value), 6) AS mx
            FROM events
            WHERE event_type IN ('click', 'view') AND value > 0
            GROUP BY 1, 2""",
        "esql_docs": """
            WITH f AS (
              SELECT upper(lang) AS lang_up,
                     (floor(n_chars / 200))::BIGINT * 200 AS cb,
                     len(string_split(text, ' '))::INT AS nw
              FROM documents
              WHERE text LIKE '%data%' AND lang IS NOT NULL
            )
            SELECT lang_up, cb, count(*)::BIGINT AS docs,
                   round(avg(nw), 6) AS avg_nw
            FROM f GROUP BY 1, 2""",
        "esql_enrich": """
            WITH pol(event_type, kind) AS (VALUES
              ('click', 'interactive'), ('view', 'passive'),
              ('purchase', 'transactional'))
            SELECT coalesce(pol.kind, 'other') AS k, count(*)::BIGINT AS n
            FROM events LEFT JOIN pol USING (event_type)
            GROUP BY 1""",
        "esql_dissect": """
            WITH s AS (
              SELECT event_type || '-' || user_id::VARCHAR AS s
              FROM events
            )
            SELECT regexp_extract(s, '^(.*?)-(.*?)$', 1) AS et,
                   count(*)::BIGINT AS n,
                   count(DISTINCT regexp_extract(s, '^(.*?)-(.*?)$', 2))::BIGINT
                     AS users
            FROM s GROUP BY 1""",
        "msearch_sizes": " UNION ALL ".join(
            f"SELECT {qid} AS query_id, rank, doc_id, score_r6 "
            f"FROM (WITH "
            + _BM25_SQL.replace("{QUERY}", q).replace(
                "rank <= 10", f"rank <= {size}")
            + ")"
            for qid, (q, size) in enumerate(
                [("data value table", 5), ("import stream", 10)])
        ),
        "esql_match": f"""
            WITH {_TF}
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('data', 'value') ORDER BY doc_id""",
        "esql_qstr": f"""
            WITH {_TF}
            SELECT DISTINCT d.doc_id
            FROM documents d JOIN tf USING (doc_id)
            WHERE d.lang = 'en' AND tf.term = 'data'
            ORDER BY d.doc_id""",
        "esql_change_point": """
            WITH daily AS (
              SELECT epoch(date_trunc('day', ts))::BIGINT AS day_s,
                     CAST(count(*) AS DOUBLE) AS v
              FROM events GROUP BY 1
            ),
            b AS (
              SELECT day_s, v,
                     row_number() OVER (ORDER BY day_s) AS rn,
                     sum(v) OVER (ORDER BY day_s ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cs,
                     sum(v * v) OVER (ORDER BY day_s ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cs2,
                     count(*) OVER () AS n,
                     sum(v) OVER () AS s,
                     sum(v * v) OVER () AS s2,
                     lead(day_s) OVER (ORDER BY day_s) AS cp_day
              FROM daily
            ),
            sc AS (
              SELECT cp_day,
                     (cs / rn - (s - cs) / (n - rn)) / sqrt(
                       ((cs2 - rn * (cs / rn) * (cs / rn)) / (rn - 1)) / rn
                       + ((s2 - cs2 - (n - rn) * ((s - cs) / (n - rn))
                           * ((s - cs) / (n - rn))) / (n - rn - 1))
                         / (n - rn)) AS t
              FROM b WHERE rn >= 2 AND rn <= n - 2
            )
            SELECT cp_day AS day_s, 'step_change' AS type,
                   round(t, 6) AS t_stat
            FROM sc
            ORDER BY round(abs(t), 9) DESC, cp_day ASC LIMIT 1""",
        "esql_fork": """
            SELECT 'fork1' AS _fork, count(*)::BIGINT AS n,
                   NULL::DOUBLE AS total
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT 'fork2', NULL::BIGINT, round(sum(value), 6)
            FROM events""",
        "esql_inlinestats": """
            SELECT e.event_id, e.event_type,
                   g.gn, g.gtotal
            FROM events e
            JOIN (SELECT event_type, count(*)::BIGINT AS gn,
                         round(sum(value), 6) AS gtotal
                  FROM events GROUP BY 1) g USING (event_type)""",
        "transform_pivot": """
            SELECT user_id,
                   (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day,
                   count(event_id)::BIGINT AS n,
                   round(sum(value), 6) AS total_r6,
                   count(DISTINCT event_type)::BIGINT AS card
            FROM events GROUP BY 1, 2""",
        "transform_latest": """
            WITH r AS (
              SELECT user_id, event_id, event_type, value,
                     floor(epoch(ts))::BIGINT AS ts_s,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            SELECT user_id, event_id, event_type,
                   round(value, 6) AS value_r6, ts_s
            FROM r WHERE rn = 1""",
        "transform_continuous": """
            SELECT user_id, count(event_id)::BIGINT AS n,
                   round(sum(value), 6) AS total_r6,
                   round(avg(value), 6) AS avg_r6
            FROM events GROUP BY 1""",
        "retriever_rrf": "WITH " + _BM25_SCORES + """
            lex AS (
              SELECT doc_id, row_number() OVER (
                       ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
              FROM scores
            ),
            q7 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                   WHERE vec_id = 7),
            cosed AS (
              SELECT e.vec_id AS doc_id,
                     list_dot_product(e.embedding::DOUBLE[], q7.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q7.qv, q7.qv))) AS cosv
              FROM embeddings e CROSS JOIN q7
            ),
            vec AS (
              SELECT doc_id, row_number() OVER (
                       ORDER BY round(cosv, 9) DESC, doc_id ASC) AS rank
              FROM cosed
            ),
            parts AS (
              SELECT doc_id, 1.0 / (60 + rank) AS rrf FROM lex
              WHERE rank <= 20
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rank) AS rrf FROM vec
              WHERE rank <= 20
            ),
            fused AS (SELECT doc_id, sum(rrf) AS score FROM parts
                      GROUP BY 1),
            fin AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY round(score, 12) DESC,
                                        doc_id ASC) AS rank,
                     round(score, 9) AS score_r9
              FROM fused
            )
            SELECT rank::BIGINT AS rank, doc_id, score_r9
            FROM fin WHERE rank <= 10""",
        "ann_int8": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS cos
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        "ann_bbq": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS cos
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 5""",
        "ingest_pipeline": """
            SELECT doc_id,
                   'doc' AS kind,
                   CASE WHEN n_chars > 200 THEN upper(lang) END AS lang_uc,
                   regexp_replace(text, '\s+', ' ', 'g') AS text_norm,
                   concat(lang, '-', source) AS route,
                   CAST(regexp_extract(source, '^src(.*?)$', 1) AS INT)
                     AS src_num_int,
                   FALSE AS ingest_failed
            FROM documents""",
        "geo_shape": _geo_shape_oracle(),
        "esql_lookup_join": """
            WITH langs(lang, lang_name, pri) AS (
              VALUES ('en', 'English', 1), ('de', 'German', 2),
                     ('fr', 'French', 3)
            ),
            joined AS (
              SELECT d.*, l.lang_name, l.pri
              FROM documents d LEFT JOIN langs l ON d.lang = l.lang
            )
            SELECT coalesce(lang_name, 'other') AS nm, pri,
                   count(*)::BIGINT AS docs, max(n_chars) AS mx
            FROM joined GROUP BY nm, pri
            ORDER BY nm""",
        "collapse_inner": """
            WITH ranked AS (
              SELECT lang AS key, doc_id AS id, n_chars::DOUBLE AS sv,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY round(n_chars, 9) DESC, doc_id ASC) AS rn
              FROM documents WHERE lang IS NOT NULL
            ),
            grouped AS (
              SELECT key,
                     max(CASE WHEN rn = 1 THEN id END) AS id,
                     max(CASE WHEN rn = 1 THEN sv END) AS sort_value,
                     string_agg(CAST(id AS VARCHAR) || ':'
                                || CAST(round(sv, 6) AS VARCHAR),
                                '|' ORDER BY rn) AS inner_hits_s
              FROM ranked WHERE rn <= 2 GROUP BY key
            )
            SELECT row_number() OVER (ORDER BY round(sort_value, 9) DESC,
                                      id ASC)::BIGINT AS rank,
                   key, id, sort_value, inner_hits_s
            FROM grouped ORDER BY rank LIMIT 3""",
        "agg_terms_filtered": """
            SELECT source AS key, count(*)::BIGINT AS doc_count
            FROM documents
            WHERE source IS NOT NULL
              AND regexp_full_match(source, 'src[0-3]')
              AND source NOT IN ('src2')
            GROUP BY source
            ORDER BY doc_count DESC, key ASC
            LIMIT 10""",
        "sorted_index_topk": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20""",
        "sorted_query_topk": f"""
            WITH {_TF},
            hits AS (SELECT DISTINCT doc_id FROM tf
                     WHERE term = 'data')
            SELECT d.doc_id, d.n_chars
            FROM documents d JOIN hits USING (doc_id)
            ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 20""",
        "indices_boost": f"""
            WITH {_BM25_BASE},
            qt AS (SELECT DISTINCT unnest(list_filter(
                     string_split_regex(lower('data value'),
                                        '[^a-z0-9]+'),
                     x -> x <> '')) AS term),
            contrib AS (
              SELECT tf.doc_id,
                     ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                            / (s.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (SELECT avgdl FROM corpus))) AS c
              FROM tf JOIN qt USING (term)
              JOIN stats s USING (term)
              JOIN dl USING (doc_id)
            ),
            boosted AS (
              SELECT doc_id,
                     sum(c) * (CASE WHEN doc_id % 2 = 1
                               THEN 2.0 ELSE 1.0 END) AS score
              FROM contrib GROUP BY doc_id
            ),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY round(score, 9) DESC,
                                        doc_id ASC) AS rank,
                     round(score, 6) AS score_r6
              FROM boosted
            )
            SELECT rank::BIGINT AS rank, doc_id, score_r6
            FROM ranked WHERE rank <= 10""",
        "dsir_select": f"""
            WITH toks_raw AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '')) AS tok
              FROM documents
            ),
            b_raw AS (
              SELECT doc_id,
                     floor({_hash_u('tok', 'dsir')} * 256.0)::INT
                       AS bucket
              FROM toks_raw
            ),
            rawc AS (SELECT bucket, count(*)::BIGINT AS r_cnt
                     FROM b_raw GROUP BY 1),
            tgt AS (
              SELECT bucket, count(*)::BIGINT AS t_cnt
              FROM b_raw
              JOIN (SELECT DISTINCT doc_id FROM documents
                    WHERE lang = 'en') USING (doc_id)
              GROUP BY 1
            ),
            tot AS (SELECT (SELECT sum(r_cnt) FROM rawc)::DOUBLE
                             AS r_total,
                           (SELECT coalesce(sum(t_cnt), 0)
                            FROM tgt)::DOUBLE AS t_total),
            ratio AS (
              SELECT r.bucket,
                     ln((coalesce(t.t_cnt, 0) + 1.0)
                        / ((SELECT t_total FROM tot) + 256.0))
                     - ln((r.r_cnt + 1.0)
                          / ((SELECT r_total FROM tot) + 256.0))
                       AS log_ratio
              FROM rawc r LEFT JOIN tgt t ON r.bucket = t.bucket
            ),
            w AS (
              SELECT doc_id, sum(log_ratio) AS lw
              FROM b_raw JOIN ratio USING (bucket)
              GROUP BY 1
            ),
            keyed AS (
              SELECT doc_id, lw,
                     lw - ln(-ln(least(greatest(
                                 {_hash_u('doc_id', 'dsir_gumbel')},
                                 1e-18), 1 - 1e-16))) AS gk
              FROM w
            )
            SELECT doc_id, round(lw, 6) AS lw_r6, round(gk, 6) AS key_r6
            FROM keyed
            ORDER BY round(gk, 9) DESC, doc_id ASC LIMIT 50""",
        "agg_terms_order_metric": """
            SELECT lang AS key, count(*)::BIGINT AS doc_count,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents WHERE lang IS NOT NULL
            GROUP BY lang
            ORDER BY round(avg(n_chars), 6) DESC, key ASC
            LIMIT 10""",
        "agg_histogram_dense": """
            WITH agg AS (
              SELECT floor(value / 50.0) * 50.0 AS key,
                     count(*)::BIGINT AS doc_count
              FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            spine AS (SELECT (x * 50.0)::DOUBLE AS key
                      FROM generate_series(-4, 14) t(x))
            SELECT s.key, coalesce(a.doc_count, 0)::BIGINT AS doc_count
            FROM spine s LEFT JOIN agg a USING (key)
            ORDER BY s.key""",
        "agg_terms_partition": f"""
            SELECT source AS key, count(*)::BIGINT AS doc_count
            FROM documents
            WHERE source IS NOT NULL
              AND floor({_hash_u('source', 'terms_part')} * 3.0) = 0
            GROUP BY source
            ORDER BY doc_count DESC, key ASC
            LIMIT 20""",
        "composite_datehist": """
            SELECT epoch(date_trunc('day', ts))::BIGINT AS day_epoch,
                   event_type, count(*)::BIGINT AS doc_count
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10 OFFSET 10""",
        "knn_cutoff": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank,
                     round(cos, 6) AS cos_r6
              FROM scored WHERE cos >= 0.1
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id, cos_r6
            FROM ranked WHERE rank <= 10""",
    }
    # the DSL compiler entry — its OWN derivation from the documented
    # bool semantics (not an alias of bool_query's SQL), so the JSON
    # compiler path is independently gated; the broad grammar is
    # additionally fuzz-gated by tests/test_fuzz_compilers.py (120
    # generated bodies vs a test-side SQL translator)
    sqls["es_dsl_search"] = f"""
        WITH {_BM25_BASE},
        clause(term, clause, boost) AS (
          VALUES ('data', 'must', 1.0), ('value', 'should', 2.0)
        ),
        per AS (
          SELECT tf.doc_id, c.clause,
                 c.boost
                 * ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                          / (s.df + 0.5))
                 * tf.tf
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                    / (SELECT avgdl FROM corpus))) AS contrib
          FROM clause c
          JOIN tf ON tf.term = c.term
          JOIN stats s ON s.term = c.term
          JOIN dl ON dl.doc_id = tf.doc_id
        ),
        agg AS (
          SELECT doc_id, sum(contrib) AS score,
                 count(CASE WHEN clause = 'must' THEN 1 END) AS nm
          FROM per GROUP BY 1
        ),
        ok AS (SELECT doc_id, score FROM agg WHERE nm = 1)
        SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                  doc_id ASC)::BIGINT AS rank,
               doc_id, round(score, 6) AS score_r6
        FROM ok ORDER BY rank LIMIT 10"""
    # nested bool-inside-bool: its own derivation of the composed
    # semantics (leaf frame + filter semi-join + should left-join +
    # must_not anti-join), independent of the engine's join algebra;
    # the grammar tail is fuzz-gated by
    # tests/test_fuzz_compilers.py::test_fuzz_nested_bool_vs_reference
    sqls["es_dsl_nested_bool"] = f"""
        WITH {_BM25_BASE},
        contrib AS (
          SELECT tf.doc_id, tf.term,
                 ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                        / (s.df + 0.5))
                 * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                    / (SELECT avgdl FROM corpus))) AS c
          FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
          WHERE tf.term IN ('data', 'value', 'table', 'batch', 'slow',
                            'error', 'retry')
        ),
        base AS (
          SELECT doc_id, c AS score FROM contrib WHERE term = 'data'
        ),
        filt AS (
          SELECT DISTINCT doc_id FROM tf
          WHERE term IN ('value', 'table')
        ),
        subshould AS (
          SELECT doc_id, sum(c) AS s FROM contrib
          WHERE term IN ('batch', 'slow')
          GROUP BY 1 HAVING count(DISTINCT term) = 2
        ),
        mustnot AS (
          SELECT doc_id FROM tf WHERE term IN ('error', 'retry')
          GROUP BY 1 HAVING count(DISTINCT term) = 2
        ),
        scored AS (
          SELECT b.doc_id, b.score + coalesce(ss.s, 0) AS score
          FROM base b
          JOIN filt f USING (doc_id)
          LEFT JOIN subshould ss USING (doc_id)
          WHERE b.doc_id NOT IN (SELECT doc_id FROM mustnot)
        )
        SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                  doc_id ASC)::BIGINT AS rank,
               doc_id, round(score, 6) AS score_r6
        FROM scored ORDER BY rank LIMIT 10"""
    sqls["ltr_rescore"] = """
        WITH f AS (SELECT * FROM
                   read_parquet('{SCRATCH}/ltr_feats.parquet/*.parquet')),
        w AS (SELECT * FROM
              read_parquet('{SCRATCH}/ltr_weights.parquet/*.parquet')),
        scored AS (
          SELECT f.query_id, f.doc_id,
                 (SELECT intercept FROM w)
                 + list_dot_product(f.features::DOUBLE[],
                                    (SELECT beta FROM w)::DOUBLE[]) AS s
          FROM f
        ),
        ranked AS (
          SELECT query_id, doc_id, s,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY round(s, 9) DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, rank::BIGINT AS rank, doc_id,
               round(s, 6) AS score_r6
        FROM ranked WHERE rank <= 10"""
    scratch = _oracle_scratch()
    return {k: v.replace("{SCRATCH}", scratch) for k, v in sqls.items()}


_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> ''))::BIGINT AS n_tok,
         length(text)::BIGINT AS n_char,
         (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha,
         len(list_intersect(
           list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '')),
           ['the','and','of','to','is','in','that','it','for','with']
         ))::BIGINT AS stop_hits
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tok,
         CASE WHEN n_char > 0 THEN n_punct / n_char::DOUBLE ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_char > 0 THEN n_alpha / n_char::DOUBLE ELSE 0.0 END AS alpha_ratio,
         CASE WHEN n_tok > 0 THEN stop_hits / least(n_tok, 10)::DOUBLE ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END AS len_ok
  FROM base
)
SELECT doc_id, n_tok AS n_tokens,
       round(punct_ratio, 6) AS punct_ratio_r6,
       round(alpha_ratio, 6) AS alpha_ratio_r6,
       round(0.25 * len_ok
             + 0.25 * (1.0 - least(punct_ratio * 4, 1.0))
             + 0.25 * least(alpha_ratio * 1.5, 1.0)
             + 0.25 * least(stop_ratio, 1.0), 6) AS quality_r6
FROM ratios"""
