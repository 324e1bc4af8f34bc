"""Gopher-style quality filters + deterministic sampling operators.

Cross-engine bar: the n-gram repetition metrics and the hash-split
assignment run the IDENTICAL arithmetic in DuckDB (the driver oracle);
here we pin hand-computable goldens and the determinism/reshard
invariants that make these operators safe at scale."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.quality import (
    gopher_quality,
    ngram_repetition_stats,
    repetition_stats_sql,
    shape_stats,
)
from elasticsearch_nlp_classifier_spark.operators.sampling import (
    hash_split,
    hash_split_sql,
    hash_uniform,
    hash_uniform_sql,
    stratified_exact_n,
    stratified_sample,
    uniform_top_n,
)

DOCS = [
    (0, "the cat sat on the mat and then the cat sat again"),
    (1, "dup line\ndup line\ndup line\nunique line"),
    (2, "a b a b a b a b a b a b"),
    (3, "### ### ### code ### with ### many ### hashes"),
    (4, "- bullet one\n- bullet two\n- bullet three\nplain"),
    (5, ""),
    (6, "perfectly normal prose with the usual words and a few more "
        "tokens to pass the minimum length gate for quality checks"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").cache()


def test_shape_stats_goldens(docs):
    rows = {
        r["doc_id"]: r
        for r in shape_stats(docs, "text").collect()
    }
    # doc 1: 4 lines, 3 identical -> 2/4 beyond-first duplicates
    assert rows[1]["dup_line_frac"] == pytest.approx(0.5)
    # duplicate chars: 'dup line' (8 chars) twice beyond first = 16,
    # total = 8*3 + 11 = 35
    assert rows[1]["dup_line_char_frac"] == pytest.approx(16 / 35)
    # doc 4: 3 of 4 lines start with a bullet
    assert rows[4]["bullet_line_frac"] == pytest.approx(0.75)
    # doc 3: six '###' runs = 18 hash chars over 10 words
    assert rows[3]["symbol_word_ratio"] == pytest.approx(18 / 10)
    # empty doc: all ratios defined as 0
    assert rows[5]["n_words"] == 0
    assert rows[5]["dup_line_frac"] == 0.0


def test_ngram_repetition_goldens(docs):
    rows = {
        r["doc_id"]: r
        for r in ngram_repetition_stats(docs, "text", "doc_id").collect()
    }
    # doc 2: words = a b ×6 (12 words, 12 chars). bigrams: 'a b' ×6,
    # 'b a' ×5 -> top bigram covers 6*2=12 of 12 word chars
    assert rows[2]["top2gram_char_frac"] == pytest.approx(1.0)
    # 8-grams of doc 2: 'a b a b a b a b' style, 5 of them, all
    # distinct? stream: positions 1..5 -> gram alternates starting
    # a/b -> 2 distinct, repeated 3 and 2 times -> dup chars
    # (3-1)*8 + (2-1)*8 = 24 over 12 word chars -> 2.0 (upper-bound
    # per-occurrence contract, overlaps counted)
    assert rows[2]["dup8gram_char_frac"] == pytest.approx(2.0)
    # empty doc present with zeros
    assert rows[5]["top2gram_char_frac"] == 0.0


def test_repetition_matches_duckdb(spark, docs):
    got = (
        ngram_repetition_stats(docs, "text", "doc_id")
        .select(
            "doc_id",
            F.round("top2gram_char_frac", 6).alias("topf"),
            F.round("dup8gram_char_frac", 6).alias("dupf"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = (
        con.sql(repetition_stats_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["topf"].tolist() == pytest.approx(
        want["top2gram_char_frac_r6"].tolist()
    )
    assert got["dupf"].tolist() == pytest.approx(
        want["dup8gram_char_frac_r6"].tolist()
    )


def test_gopher_gate(docs):
    rows = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_quality(docs, "text", "doc_id").collect()
    }
    assert rows[6] is True          # normal prose passes
    assert rows[2] is False         # pure repetition fails
    assert rows[3] is False         # symbol soup fails
    assert rows[5] is False         # empty fails the length gate


# --- sampling ---------------------------------------------------------------


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id").cache()


def test_hash_uniform_matches_duckdb(spark, ids):
    got = (
        ids.select("doc_id", hash_uniform("doc_id", "s").alias("u"))
        .limit(50)
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", got[["doc_id"]])
    want = con.sql(
        f"SELECT doc_id, {hash_uniform_sql('doc_id', 's')} AS u FROM t"
    ).df()
    assert got["u"].tolist() == pytest.approx(want["u"].tolist(), abs=0)


def test_hash_split_proportions_and_determinism(ids):
    w = {"train": 0.8, "dev": 0.1, "test": 0.1}
    out = hash_split(ids, w, id_col="doc_id")
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert counts["train"] == pytest.approx(1600, abs=80)
    assert counts["dev"] == pytest.approx(200, abs=50)
    # reshard stability: same assignment after an arbitrary repartition
    re = hash_split(ids.repartition(13), w, id_col="doc_id")
    a = out.select("doc_id", "split").toPandas().set_index("doc_id")["split"]
    b = re.select("doc_id", "split").toPandas().set_index("doc_id")["split"]
    assert (a.sort_index() == b.sort_index()).all()


def test_hash_split_sql_twin(spark, ids):
    w = {"train": 0.8, "test": 0.2}
    got = hash_split(ids, w, id_col="doc_id").select("doc_id", "split")
    pdf = got.toPandas()
    con = duckdb.connect()
    con.register("t", pdf[["doc_id"]])
    want = con.sql(
        f"SELECT doc_id, {hash_split_sql(w, 'doc_id')} AS split FROM t"
    ).df()
    assert pdf.sort_values("doc_id")["split"].tolist() == \
        want.sort_values("doc_id")["split"].tolist()


def test_stratified_sample_and_exact(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    samp = stratified_sample(df, {"en": 0.5, "de": 0.1}, "lang", "doc_id")
    c = {r["lang"]: r["n"] for r in
         samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert c.get("en", 0) == pytest.approx(300, abs=60)
    assert c.get("de", 0) == pytest.approx(30, abs=25)

    ex = stratified_exact_n(df, 25, "lang", "doc_id")
    ce = {r["lang"]: r["n"] for r in
          ex.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert ce == {"en": 25, "de": 25}
    # deterministic: same 25 ids on re-run
    ids1 = sorted(ex.toPandas().doc_id)
    ids2 = sorted(stratified_exact_n(df, 25, "lang", "doc_id")
                  .toPandas().doc_id)
    assert ids1 == ids2


def test_uniform_top_n(ids):
    s1 = uniform_top_n(ids, 100).toPandas().doc_id.tolist()
    s2 = uniform_top_n(ids, 100).toPandas().doc_id.tolist()
    assert len(s1) == 100 and s1 == s2
    # a different salt draws a different sample
    s3 = uniform_top_n(ids, 100, salt="other").toPandas().doc_id.tolist()
    assert set(s3) != set(s1)


def test_resample_to_mix(spark):
    import pyspark.sql.functions as F

    from elasticsearch_nlp_classifier_spark.operators import resample_to_mix

    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "fr") for i in range(100)]
        + [(2000 + i, "de") for i in range(60)]
        + [(3000 + i, "zh") for i in range(50)]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    kept = resample_to_mix(docs, "lang", {"en": 0.5, "fr": 0.25, "de": 0.25})
    counts = {r.lang: r.n for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # scarcest group relative to target: de (60 / .25 = 240 = n_out min)
    # -> kept whole; en rate = .5*240/400 = .3, fr rate = .25*240/100 = .6
    assert counts["de"] == 60
    assert "zh" not in counts                     # not in target -> dropped
    assert abs(counts["en"] - 120) < 40           # hash-binomial around 120
    assert abs(counts["fr"] - 60) < 30
    # deterministic: identical output on re-run
    again = {r.lang: r.n for r in
             resample_to_mix(docs, "lang",
                             {"en": 0.5, "fr": 0.25, "de": 0.25})
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert again == counts

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        resample_to_mix(docs, "lang", {"en": 0.0})


def test_cosine_topk_filtered_prefilter_semantics(spark):
    from elasticsearch_nlp_classifier_spark.operators import (
        cosine_topk_filtered,
    )

    # vecs 1..3 are closest to the query but EXCLUDED by the filter;
    # a post-filter of an unfiltered top-3 would come back near-empty
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 10.0]) for i in range(1, 9)],
        "vec_id bigint, embedding array<double>",
    )
    allowed = spark.createDataFrame([(i,) for i in (4, 5, 6, 7, 8)],
                                    "id bigint")
    q = spark.createDataFrame([(-1, [1.0, 0.0])],
                              "query_id bigint, query_vec array<double>")
    out = cosine_topk_filtered(emb, allowed, q, k=3).collect()
    assert [r.vec_id for r in out] == [4, 5, 6]   # k full matches, in-filter


# ------------------------------------------------------- cluster_safe_split


def test_cluster_safe_split_keeps_clusters_together(spark):
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id bigint, text string"
    )
    # chain component {0,1,2} and pair {10, 11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {r.doc_id: r.split for r in cluster_safe_split(
        docs, pairs, {"train": 0.5, "test": 0.5}).collect()}
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    # members hash on the representative: doc 1/2 get doc 0's draw
    base = {r.doc_id: r.split for r in hash_split(
        docs, {"train": 0.5, "test": 0.5}).collect()}
    assert got[0] == base[0]
    assert got[10] == base[10]
    # singletons are untouched relative to plain hash_split
    for i in set(range(40)) - {0, 1, 2, 10, 11}:
        assert got[i] == base[i]


def test_cluster_safe_split_empty_pairs_is_hash_split(spark):
    from elasticsearch_nlp_classifier_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(20)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {r.doc_id: r.split for r in cluster_safe_split(
        docs, pairs, {"a": 0.3, "b": 0.7}).collect()}
    want = {r.doc_id: r.split for r in hash_split(
        docs, {"a": 0.3, "b": 0.7}).collect()}
    assert got == want
