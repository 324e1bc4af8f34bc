"""Training-data pipeline operators over the driver testdata
(documents/embeddings at sf0.001) + planted duplicates, cross-checked
against DuckDB / numpy oracles."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import (
    cosine_topk,
    exact_dedup,
    exact_dup_groups,
    extract_features,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    synthetic_media,
)
from elasticsearch_nlp_classifier_spark.operators.textstats import (
    document_fingerprints,
    lang_id,
    quality_stats,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """documents + planted exact dups + near dups (one word changed)."""
    exact = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)
    near = (
        docs.where("doc_id between 5 and 9")
        .withColumn("doc_id", F.col("doc_id") + 20_000)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" zzyzx")),
        )
    )
    return docs.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(docs_with_dups):
    base = docs_with_dups.count()
    dd = exact_dedup(docs_with_dups, "text", "doc_id")
    assert dd.count() == base - 5
    groups = exact_dup_groups(docs_with_dups, "text", "doc_id").toPandas()
    assert len(groups) == 5
    assert (groups.n_dups == 2).all()
    assert (groups.keep_id < 10_000).all()  # keep-first


def test_minhash_lsh_finds_planted_near_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(
        docs_with_dups, "text", "doc_id", threshold=0.5
    ).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # exact dups (jaccard 1.0) and appended-word near dups must surface
    for i in range(5):
        assert (i, i + 10_000) in found
    for i in range(5, 10):
        assert (i, i + 20_000) in found
    assert (pairs.jaccard >= 0.5).all()


def test_ngram_jaccard_matches_duckdb(spark, docs_with_dups):
    got = (
        ngram_jaccard_pairs(docs_with_dups, "text", "doc_id", k=3, threshold=0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pdf = docs_with_dups.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql("""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS w
          FROM docs
        ), sh0 AS (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 3
                 THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                 ELSE [array_to_string(w, ' ')] END) AS shingle
          FROM toks
        ), sh AS (
          SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle <> ''
        ), sizes AS (
          SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id a, r.doc_id b, count(*) i
          FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a AS id_a, b AS id_b,
               i::DOUBLE / (sa.n + sb.n - i) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.4
        ORDER BY id_a, id_b
    """).df()
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    np.testing.assert_allclose(got.jaccard, want.jaccard, atol=1e-12)


def test_simhash_near_dups(docs_with_dups):
    pairs = simhash_near_dup_pairs(
        docs_with_dups, "text", "doc_id", max_hamming=3
    ).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for i in range(5):  # identical text -> hamming 0
        assert (i, i + 10_000) in found
    exact_rows = pairs[(pairs.id_a < 5) & (pairs.id_b >= 10_000)]
    assert (exact_rows.hamming == 0).all()


def test_cosine_topk_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = cosine_topk(emb, queries, k=5).toPandas()

    pdf = emb.toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    ids = pdf.vec_id.to_numpy()
    for qid in got.query_id.unique():
        qv = m[ids == qid][0]
        cos = (m @ qv) / (norms * np.linalg.norm(qv))
        cos[ids == qid] = -np.inf
        order = np.lexsort((ids, -cos))[:5]
        want_ids = ids[order].tolist()
        got_ids = got[got.query_id == qid].vec_id.tolist()
        assert got_ids == want_ids, qid


def test_lsh_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = cosine_topk(emb, queries, k=10).toPandas()
    approx = lsh_cosine_topk(emb, queries, dim=64, k=10, n_bits=32, bands=8).toPandas()
    recalls = []
    for qid in brute.query_id.unique():
        b = set(brute[brute.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.5  # 8 bands of 4 bits: recall>>0


def test_lang_id_on_real_language_samples(spark):
    samples = spark.createDataFrame(
        [
            ("en", "the cat sat on the mat and it was happy with that"),
            ("de", "der hund ist nicht mit der katze und das ist gut"),
            ("fr", "le chat est dans la maison et il ne dort pas"),
            ("es", "el perro es un animal y las casas son grandes para todos"),
            ("zh", "这是一个测试文档 机器学习 数据"),
            ("und", "qwvz xkjh zzz"),
        ],
        "lang string, text string",
    )
    got = samples.select("lang", lang_id(F.col("text")).alias("pred")).collect()
    for r in got:
        assert r.pred == r.lang, (r.lang, r.pred)


def test_textstats(spark, docs):
    # synthetic corpus text is English-ish token soup -> must label en/und
    out = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("pred_lang"),
        token_count(F.col("text")).alias("n_tok"),
    )
    preds = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert preds <= {"en", "und"}

    q = quality_stats(docs, "text").select(
        "doc_id", "n_tokens", "quality_score"
    ).toPandas()
    assert ((q.quality_score >= 0) & (q.quality_score <= 1)).all()

    fp = document_fingerprints(docs, "text", "doc_id").toPandas()
    assert fp.sha256.nunique() == len(fp)  # all distinct texts
    assert fp.rolling_fp.nunique() == len(fp)


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 32)
    feats = extract_features(media).toPandas()
    assert len(feats) == 32
    assert all(len(f) == 16 for f in feats.features)
    # deterministic: same payload -> same features
    feats2 = extract_features(media).toPandas()
    assert feats.features.map(tuple).tolist() == feats2.features.map(tuple).tolist()

    from elasticsearch_nlp_classifier_spark.operators import frame_sample_plan

    plan = frame_sample_plan(media, every_nth=24).toPandas()
    assert (plan.frame_idx % 24 == 0).all()
    assert len(plan) > 0

    from elasticsearch_nlp_classifier_spark.operators.multimodal import real_decode

    # executor-side NotImplementedError surfaces as a PythonException
    with pytest.raises(Exception, match="no image/audio codec libraries"):
        extract_features(media, decode_with=real_decode).count()


def test_cosine_near_dup_lsh_recall_vs_brute(spark):
    """LSH near-dup path must recover (nearly) all brute-force pairs at
    the working threshold; every returned pair is exact-verified."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators import (
        cosine_near_dup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    # plant 10 near-dups: tiny perturbations of the first 10 vectors
    near = base[:10] + 0.02 * rng.standard_normal((10, 16)).astype(np.float32)
    vecs = np.vstack([base, near])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    brute = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(emb, 0.95, method="brute").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            emb, 0.95, method="lsh", dim=16, n_bits=32, bands=16
        ).collect()
    }
    assert lsh <= brute            # no false positives (exact verify)
    assert len(brute) >= 10
    assert len(lsh) / len(brute) >= 0.9   # recall
