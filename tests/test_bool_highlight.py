"""ES bool query (scored must/should + filter context + must_not) and
highlighting, pinned against DuckDB / hand-computed goldens."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    bool_query_topk,
    highlight,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"

_BM25_SQL = f"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM read_parquet('{DOCS}')
),
posts AS (SELECT doc_id, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM posts GROUP BY 1, 2),
dl AS (SELECT doc_id, len(w)::BIGINT AS dl FROM toks WHERE len(w) > 0),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
corpus AS (SELECT count(*)::BIGINT AS n,
                  sum(dl)::DOUBLE / count(*) AS avgdl FROM dl)
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def index(docs):
    return build_logical_index(docs, text_col="text",
                               analyzer="simple_code",
                               doc_id_col="doc_id")


def _oracle_bool(clauses_sql, having_sql, must_not_sql, k=10):
    return duckdb.sql(f"""
        WITH {_BM25_SQL},
        clause(term, clause, boost) AS (VALUES {clauses_sql}),
        per_term AS (
          SELECT tf.doc_id, c.clause, c.boost,
                 c.boost * ln(1 + ((SELECT n FROM corpus) - s.df + 0.5)
                              / (s.df + 0.5))
                 * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                            / (SELECT avgdl FROM corpus))) AS contrib
          FROM tf JOIN clause c USING (term)
          JOIN stats s USING (term) JOIN dl USING (doc_id)
        ),
        agg AS (
          SELECT doc_id, sum(contrib) AS score,
                 count(CASE WHEN clause = 'must' THEN 1 END) AS n_must,
                 count(CASE WHEN clause = 'should' THEN 1 END) AS n_should,
                 count(CASE WHEN clause = 'filter' THEN 1 END) AS n_filter
          FROM per_term GROUP BY doc_id
        ),
        ok AS (
          SELECT * FROM agg WHERE {having_sql}
          {must_not_sql}
        )
        SELECT row_number() OVER (ORDER BY round(score, 9) DESC,
                                  doc_id ASC)::BIGINT AS rank,
               doc_id, round(score, 6) AS score_r6
        FROM ok ORDER BY rank LIMIT {k}
    """).df()


def _got(df):
    return (df.select("rank", "doc_id",
                      F.round("score", 6).alias("score_r6"))
            .toPandas().sort_values("rank").reset_index(drop=True))


def test_bool_must_plus_should_boost(index):
    got = _got(bool_query_topk(
        index, must=["data"], should=[("value", 2.0)],
        analyzer="simple_code", k=10,
    ))
    want = _oracle_bool(
        "('data','must',1.0), ('value','should',2.0)",
        "n_must = 1", "")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bool_filter_context_scores_zero(index):
    got = _got(bool_query_topk(
        index, should=[("value", 1.0)], filter_terms=["data"],
        analyzer="simple_code", k=10,
    ))
    want = _oracle_bool(
        "('value','should',1.0), ('data','filter',0.0)",
        "n_filter = 1", "")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and filter-only matches (no should hit) score exactly 0 but pass
    got0 = bool_query_topk(index, filter_terms=["data"],
                           analyzer="simple_code", k=5)
    assert all(r["score"] == 0.0 for r in got0.collect())


def test_bool_must_not_excludes(index):
    base = {r["doc_id"] for r in bool_query_topk(
        index, must=["data"], analyzer="simple_code", k=1000).collect()}
    excl = {r["doc_id"] for r in bool_query_topk(
        index, must=["data"], must_not=["value"],
        analyzer="simple_code", k=1000).collect()}
    removed = base - excl
    assert excl <= base and removed
    has_value = {
        r["doc_id"]
        for r in index.postings.where(F.col("term") == "value")
        .select("doc_id").collect()
    }
    assert removed == base & has_value
    assert not (excl & has_value)


def test_bool_minimum_should_match(spark, index):
    got2 = {r["doc_id"] for r in bool_query_topk(
        index, should=[("data", 1.0), ("value", 1.0), ("table", 1.0)],
        minimum_should_match=2, analyzer="simple_code", k=10_000,
    ).collect()}
    tfp = index.postings.where(
        F.col("term").isin(["data", "value", "table"])
    ).groupBy("doc_id").agg(F.countDistinct("term").alias("n"))
    want2 = {r["doc_id"] for r in tfp.where("n >= 2").collect()}
    assert got2 == want2


# --- highlighting -------------------------------------------------------------

HL_DOCS = [
    (0, "The quick brown fox. Data is stored in the data table now."),
    (1, "no relevant words at all"),
    (2, "DATA at the very start"),
    (3, None),
]


def test_highlight_goldens(spark):
    df = spark.createDataFrame(HL_DOCS, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["highlight"]
        for r in highlight(df, "data table", analyzer="simple_code",
                           fragment_size=1000, lead=1000).collect()
    }
    assert out[0] == ("The quick brown fox. <em>Data</em> is stored in "
                      "the <em>data</em> <em>table</em> now.")
    assert out[1] is None
    assert out[2] == "<em>DATA</em> at the very start"
    assert out[3] is None


def test_highlight_fragment_window(spark):
    long_text = ("x " * 200) + "needle here" + (" y" * 200)
    df = spark.createDataFrame([(0, long_text)],
                               "doc_id bigint, text string")
    row = highlight(df, "needle", analyzer="simple_code",
                    fragment_size=60, lead=10).collect()[0]
    assert "<em>needle</em>" in row["highlight"]
    assert len(row["highlight"]) <= 60 + len("<em></em>") * 2


def test_highlight_vs_duckdb(spark, docs):
    got = (
        highlight(docs, "data value", analyzer="simple_code",
                  fragment_size=150, lead=40)
        .select("doc_id", "highlight")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH d AS (
          SELECT doc_id, coalesce(text, '') AS text,
                 least(nullif(strpos(lower(coalesce(text,'')), 'data'), 0),
                       nullif(strpos(lower(coalesce(text,'')), 'value'), 0)
                 ) AS first
          FROM read_parquet('{DOCS}')
        )
        SELECT doc_id,
               CASE WHEN first IS NOT NULL THEN
                 regexp_replace(
                   substring(text, greatest(1, first - 40), 150),
                   '\\b(data|value)\\b', '<em>\\1</em>', 'gi')
               END AS highlight
        FROM d ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
