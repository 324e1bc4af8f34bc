"""Percolator (reverse search), PII redaction, and paragraph-level
dedup — each pinned against DuckDB or an exhaustive in-process spec."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import (
    PII_PATTERNS,
    dedup_paragraphs,
    pii_stats,
    redact_pii,
)
from elasticsearch_nlp_classifier_spark.query import (
    percolate,
    register_queries,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


# --- percolator --------------------------------------------------------------

def test_percolate_and_semantics_vs_duckdb(spark, docs):
    qs = [(1, "data value"), (2, "table"), (3, "zzz_nonexistent_term"),
          (4, "data data data")]  # dup terms collapse -> 1 required
    reg = register_queries(spark, qs, analyzer="simple_code",
                           operator="and")
    got = (
        percolate(docs, reg, analyzer="simple_code")
        .toPandas().sort_values(["doc_id", "query_id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_distinct(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''))) AS term
          FROM read_parquet('{DOCS}')
        ),
        reg(query_id, term, n_terms) AS (VALUES
          (1, 'data', 2), (1, 'value', 2), (2, 'table', 1),
          (3, 'zzz_nonexistent_term', 1), (4, 'data', 1)
        )
        SELECT doc_id, query_id::BIGINT AS query_id,
               count(*)::BIGINT AS matched_terms
        FROM toks JOIN reg USING (term)
        GROUP BY doc_id, query_id, n_terms
        HAVING count(*) >= n_terms
        ORDER BY doc_id, query_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_percolate_or_and_msm(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha only here"), (2, "delta")],
        "doc_id bigint, text string",
    )
    reg_or = register_queries(spark, [(1, "alpha beta")],
                              analyzer="simple_code", operator="or")
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, reg_or,
                              analyzer="simple_code").collect()}
    assert got == {(0, 1), (1, 1)}

    reg_m2 = register_queries(spark, [(1, "alpha beta delta")],
                              analyzer="simple_code", operator="or",
                              min_should_match=2)
    got2 = {r["doc_id"]
            for r in percolate(docs, reg_m2,
                               analyzer="simple_code").collect()}
    assert got2 == {0}


# --- PII redaction ------------------------------------------------------------

PII_DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk or call 555-123-4567"),
    (1, "server at 192.168.0.1 and backup at 10.0.0.255."),
    (2, "intl +4915112345678 twice: +4915112345678"),
    (3, "no pii here, just 1234 and a.b sentences."),
    (4, None),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id bigint, text string")


def test_pii_stats_vs_duckdb(spark, pii_df):
    got = (pii_stats(pii_df).toPandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PII_DOCS)
    cols = ", ".join(
        f"len(regexp_extract_all(coalesce(text,''), '{pat}'))::BIGINT"
        f" AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    want = con.sql(
        f"SELECT id, {', '.join('n_' + n for n, _, _ in PII_PATTERNS)}, "
        f"({total})::BIGINT AS n_pii "
        f"FROM (SELECT id, {cols} FROM d) ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_redact_pii_masks_all(pii_df):
    out = {r["doc_id"]: r["text"]
           for r in redact_pii(pii_df).collect()}
    assert out[0] == "contact me at <EMAIL> or call <PHONE>"
    assert out[1] == "server at <IP> and backup at <IP>."
    assert out[2] == "intl <PHONE> twice: <PHONE>"
    assert out[3] == PII_DOCS[3][1]
    assert out[4] == ""
    # redacted text has zero remaining PII hits
    again = pii_stats(redact_pii(pii_df))
    assert again.agg(F.sum("n_pii")).collect()[0][0] == 0


# --- paragraph dedup ----------------------------------------------------------

PARA_DOCS = [
    (0, "LICENSE HEADER\n\nunique zero content\n\nfooter text"),
    (1, "LICENSE HEADER\n\nunique one content\n\nfooter text"),
    (2, "unique two content\n\nLICENSE HEADER"),
    (3, "LICENSE HEADER\n\nfooter text"),
    (4, "all original paragraphs\n\nnothing shared"),
]


def test_dedup_paragraphs_vs_duckdb(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id bigint, text string")
    got = (dedup_paragraphs(df).toPandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PARA_DOCS)
    want = con.sql("""
        WITH paras AS (
          SELECT doc_id AS id,
                 unnest(string_split(text, E'\\n\\n')) AS para,
                 unnest(range(len(string_split(text, E'\\n\\n')))) AS pos
          FROM d
        ),
        keep AS (
          SELECT para, min(struct_pack(id := id, pos := pos)) AS first
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
        GROUP BY d.doc_id ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by_id = dict(zip(got["id"], got["text"]))
    # doc 0 keeps everything; doc 1 loses header+footer; doc 3 empty
    assert by_id[0] == PARA_DOCS[0][1]
    assert by_id[1] == "unique one content"
    assert by_id[3] == ""
    assert by_id[4] == PARA_DOCS[4][1]


# --- streaming percolation (alerting) ------------------------------------------

def test_percolate_alerts_stream_matches_batch(spark, tmp_path_factory):
    """Two micro-batches of docs percolated at ingest == batch
    percolate of the full set; replay (same batch id) does not
    duplicate alerts."""
    from elasticsearch_nlp_classifier_spark.streaming import (
        percolate_alerts_stream,
        read_alerts,
    )

    src = tmp_path_factory.mktemp("alert_src")
    alerts_dir = str(tmp_path_factory.mktemp("alerts") / "log")
    all_docs = spark.read.parquet(DOCS)
    b1 = all_docs.where("doc_id < 250")
    b2 = all_docs.where("doc_id >= 250")
    reg = register_queries(
        spark, [(1, "data value"), (2, "table")],
        analyzer="simple_code", operator="and",
    )

    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    q = percolate_alerts_stream(
        spark, f"{src}/*.parquet/", reg, alerts_dir,
        analyzer="simple_code",
    )
    q.awaitTermination()
    b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
    q2 = percolate_alerts_stream(
        spark, f"{src}/*.parquet/", reg, alerts_dir,
        analyzer="simple_code",
    )
    q2.awaitTermination()

    got = sorted(
        (r["doc_id"], r["query_id"], r["matched_terms"])
        for r in read_alerts(spark, alerts_dir).collect()
    )
    want = sorted(
        (r["doc_id"], r["query_id"], r["matched_terms"])
        for r in percolate(all_docs, reg,
                           analyzer="simple_code").collect()
    )
    assert got == want and len(got) > 0


def test_percolate_scored_matches_manual(spark):
    """Scored percolation == manual BM25-contract computation; gating
    identical to the unscored operator."""
    import math

    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import (
        percolate, percolate_scored, register_queries,
    )

    rows = [(1, "alpha beta beta gamma"), (2, "alpha delta"),
            (3, "beta beta beta"), (4, "epsilon zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code")
    reg = register_queries(spark, [(1, "alpha beta"), (2, "beta")],
                           analyzer="simple_code", operator="and")
    plain = {(r.doc_id, r.query_id)
             for r in percolate(docs, reg,
                                analyzer="simple_code").collect()}
    scored = percolate_scored(docs, reg, idx,
                              analyzer="simple_code").collect()
    assert {(r.doc_id, r.query_id) for r in scored} == plain

    # manual check for (doc 1, query 1): terms alpha (tf1) + beta (tf2)
    n, avgdl = 4, (4 + 2 + 3 + 2) / 4.0
    def idf(df_):
        return math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    def tf_hat(tf, dl):
        return tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    want = idf(2) * tf_hat(1, 4) + idf(2) * tf_hat(2, 4)
    got = {(r.doc_id, r.query_id): r.score for r in scored}[(1, 1)]
    assert got == pytest.approx(want, abs=1e-9)
    # higher-tf doc outranks for the single-term query
    order = sorted(((r.score, r.doc_id) for r in scored
                    if r.query_id == 2), reverse=True)
    assert order and order[0][1] == 3  # beta tf=3 wins query 'beta'
