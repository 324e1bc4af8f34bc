"""S1/S7 CSV source/sink, S11 model persistence, corpus source."""

import os

import pytest

from elasticsearch_nlp_classifier_spark.classifier import (
    predict_nb,
    train_nb,
)
from elasticsearch_nlp_classifier_spark.sources import (
    load_model,
    read_corpus,
    read_tweets_csv,
    save_model,
    write_submission_csv,
)

CSV = (
    "id,keyword,location,text,target\n"
    '1,quake,,"line one\nline two",1\n'
    '2,,"SF, CA","He said ""hi"" — with, commas",0\n'
    "3,fire,London,plain text no quotes,\n"
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "train.csv"
    p.write_text(CSV)
    return str(p)


def test_read_tweets_csv_rfc4180(spark, csv_path):
    """S1 parity: embedded newline, quoted comma, doubled-quote escape,
    missing values -> '' (`Tweets.java:27-49`, `Tweet.java:12-26`)."""
    rows = {r["id"]: r for r in read_tweets_csv(spark, csv_path).collect()}
    assert len(rows) == 3
    assert rows[1]["text"] == "line one\nline two"
    assert rows[1]["location"] == ""          # missing -> ""
    assert rows[2]["location"] == "SF, CA"    # quoted comma
    assert rows[2]["text"] == 'He said "hi" — with, commas'
    assert rows[3]["target"] == ""            # empty label preserved as ""


def test_submission_csv_roundtrip(spark, tmp_path, csv_path):
    """S7: (id, target) with header (`Tweets.java:51-68`)."""
    df = read_tweets_csv(spark, csv_path).selectExpr(
        "id", "coalesce(nullif(target, ''), '0') AS target"
    )
    out = str(tmp_path / "submission")
    write_submission_csv(df, out)
    back = spark.read.csv(out, header=True)
    assert back.columns == ["id", "target"]
    assert back.count() == 3


def test_model_save_load_same_predictions(spark, tmp_path):
    """S11: saved+loaded model predicts identically
    (`OpenNLPClassifier.java:42-54`)."""
    docs = spark.createDataFrame(
        [
            (1, "earthquake fire disaster flood", "1"),
            (2, "sunny happy picnic park", "0"),
            (3, "storm surge flood warning", "1"),
            (4, "birthday cake party fun", "0"),
            (5, "fire flood panic", None),
        ],
        "id int, text string, target string",
    )
    model = train_nb(docs, ["text"], "target", analyzer="simple_code")
    path = str(tmp_path / "model")
    save_model(model, path)
    loaded = load_model(spark, path)
    assert loaded.vocab_size == model.vocab_size
    assert loaded.labels == model.labels

    want = predict_nb(model, docs, ["text"], analyzer="simple_code")
    got = predict_nb(loaded, docs, ["text"], analyzer="simple_code")
    assert sorted(map(tuple, want.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_read_corpus_parquet_path(spark, tmp_path):
    src = spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "import os")],
        "repo string, path string, commit string, lang string, content string",
    )
    p = str(tmp_path / "corpus.parquet")
    src.write.parquet(p)
    assert read_corpus(spark, p).count() == 1
    assert os.sep in p


def test_merge_updates_applies_batch_atomically(spark, tmp_path):
    """S8 MERGE emulation (`BulkUpdateQueue.java:27-169` apply-batch
    contract): only matched rows' update columns change; everything
    else is byte-identical; unmatched update ids are ignored.  The
    steps live in `sources/merge_contract.py`, SHARED with the
    jar-gated live-Iceberg test (test_iceberg_merge.py) so the two
    sinks' semantics cannot fork."""
    from elasticsearch_nlp_classifier_spark.sources import merge_updates
    from elasticsearch_nlp_classifier_spark.sources.merge_contract import (
        run_merge_contract,
    )

    tbl = str(tmp_path / "docs")
    run_merge_contract(
        spark,
        create_table=lambda df: df.write.parquet(tbl),
        merge=lambda upd, cols: merge_updates(
            spark, tbl, upd, "doc_id", cols),
        read_table=lambda: spark.read.parquet(tbl),
    )


def test_update_by_query(spark, tmp_path):
    """ES _update_by_query: set-expressions applied to matching rows
    only; expressions can read the current row; null predicate = not
    matched."""
    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.sources import update_by_query

    tbl = str(tmp_path / "docs_ubq")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "doc_id long, lang string, n long",
    ).write.parquet(tbl)

    n = update_by_query(
        spark, tbl, F.col("n") >= 20,
        {"lang": F.upper("lang"), "n": F.col("n") + 1},
    )
    assert n == 1  # doc 3's null n -> predicate null -> NOT matched
    got = {r["doc_id"]: (r["lang"], r["n"])
           for r in spark.read.parquet(tbl).collect()}
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", None)}


def test_delete_by_query(spark, tmp_path):
    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.sources import delete_by_query

    tbl = str(tmp_path / "docs_dbq")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "doc_id long, n long"
    ).write.parquet(tbl)
    n = delete_by_query(spark, tbl, F.col("n") >= 20)
    assert n == 1
    kept = sorted(r["doc_id"] for r in spark.read.parquet(tbl).collect())
    assert kept == [1, 3]  # null predicate -> row survives (ES semantics)


def test_iceberg_merge_sql_text_pinned(spark):
    """The untestable-in-sandbox Iceberg branch can't rot silently:
    the exact MERGE INTO text is pinned, and Spark's SQL parser accepts
    it as a MergeIntoTable plan (a syntax drift would ParseException
    here long before any cluster run)."""
    from elasticsearch_nlp_classifier_spark.sources import (
        iceberg_merge_sql,
    )

    sql = iceberg_merge_sql(
        "lake.docs", "updates_v", "doc_id",
        {"lang": "new_lang", "pred_target": "prediction"},
    )
    assert sql == (
        "MERGE INTO lake.docs t USING updates_v s "
        "ON t.doc_id = s.doc_id "
        "WHEN MATCHED THEN UPDATE SET "
        "t.lang = coalesce(s.new_lang, t.lang), "
        "t.pred_target = coalesce(s.prediction, t.pred_target)"
    )
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert "MergeIntoTable" in plan.toString()


def test_merge_updates_iceberg_submits_and_cleans_view(spark):
    """merge_updates_iceberg registers the batch view, submits the
    statement (fails at ANALYSIS here — no Iceberg catalog — which
    proves the SQL reached Spark), and drops the view either way."""
    import pytest as _pytest

    from elasticsearch_nlp_classifier_spark.sources import (
        merge_updates_iceberg,
    )

    upd = spark.createDataFrame([(1, "x")], "doc_id long, new_lang string")
    before = {v.name for v in spark.catalog.listTables()}
    with _pytest.raises(Exception) as ei:
        merge_updates_iceberg(spark, "no_such_catalog.t", upd,
                              "doc_id", {"lang": "new_lang"})
    assert "no_such_catalog" in str(ei.value)  # analysis, not parse
    assert {v.name for v in spark.catalog.listTables()} == before


def test_read_corpus_dispatch(spark, tmp_path):
    """Path-vs-table dispatch of the corpus source (S2): a path reads
    parquet; a bare name resolves through the catalog (the Iceberg
    branch on a real deployment)."""
    from elasticsearch_nlp_classifier_spark.sources.corpus_source import (
        read_corpus,
    )

    p = str(tmp_path / "corpus_src.parquet")
    df = spark.createDataFrame(
        [("r", "a.py", "c1", "py", "x = 1")],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    df.write.parquet(p)
    assert read_corpus(spark, p).count() == 1
    df.createOrReplaceTempView("corpus_tbl_view")
    try:
        assert read_corpus(spark, "corpus_tbl_view").count() == 1
    finally:
        spark.catalog.dropTempView("corpus_tbl_view")
