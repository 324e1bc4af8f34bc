"""ES ingest-pipeline processor semantics, pinned per processor."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.sources.ingest import (
    apply_ingest_pipeline,
    compile_ingest_pipeline,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello World  ", "a,b,a", "2024-03-01T10:00:00", "src7", "42"),
            (2, None, "x,y", "bad-date", "src12", "not-a-number"),
        ],
        "id bigint, txt string, csv string, when string, origin string, "
        "num string",
    )


def rows(df_):
    return {r.id: r.asDict() for r in df_.collect()}


def test_set_rename_remove(df):
    out = rows(compile_ingest_pipeline(df, [
        {"set": {"field": "kind", "value": "doc"}},
        {"rename": {"field": "origin", "target_field": "src"}},
        {"remove": {"field": "csv"}},
        {"set": {"field": "copied", "copy_from": "src"}},
    ]))
    assert out[1]["kind"] == "doc" and out[1]["src"] == "src7"
    assert out[1]["copied"] == "src7"
    assert "csv" not in out[1] and "origin" not in out[1]


def test_set_override_false_keeps_existing(df):
    out = rows(compile_ingest_pipeline(df, [
        {"set": {"field": "txt", "value": "FILLED", "override": False}},
    ]))
    assert out[1]["txt"] == "  Hello World  "  # non-null kept
    assert out[2]["txt"] == "FILLED"           # null filled


def test_string_processors_and_targets(df):
    out = rows(compile_ingest_pipeline(df, [
        {"trim": {"field": "txt"}},
        {"lowercase": {"field": "txt", "target_field": "txt_lc"}},
        {"gsub": {"field": "txt", "pattern": "o", "replacement": "0"}},
        {"split": {"field": "csv", "separator": ","}},
        {"join": {"field": "csv", "separator": "|",
                  "target_field": "csv_joined"}},
    ]))
    assert out[1]["txt"] == "Hell0 W0rld"
    assert out[1]["txt_lc"] == "hello world"
    assert out[1]["csv"] == ["a", "b", "a"]
    assert out[1]["csv_joined"] == "a|b|a"


def test_conditional_if_row_level(df):
    out = rows(compile_ingest_pipeline(df, [
        {"uppercase": {"field": "origin", "target_field": "origin_uc",
                       "if": "id = 1"}},
    ]))
    assert out[1]["origin_uc"] == "SRC7"
    assert out[2]["origin_uc"] is None  # processor skipped for this row


def test_convert_and_failure_marker(df):
    out = rows(compile_ingest_pipeline(df, [
        {"convert": {"field": "num", "type": "integer",
                     "target_field": "num_i"}},
    ], failure_marker="failed"))
    assert out[1]["num_i"] == 42 and out[1]["failed"] is False
    assert out[2]["num_i"] is None and out[2]["failed"] is True


def test_date_multi_format_and_failure(df):
    out = rows(compile_ingest_pipeline(df, [
        {"date": {"field": "when",
                  "formats": ["yyyy-MM-dd'T'HH:mm:ss", "yyyy/MM/dd"]}},
    ], failure_marker="failed"))
    assert out[1]["@timestamp"].year == 2024 and out[1]["failed"] is False
    assert out[2]["@timestamp"] is None and out[2]["failed"] is True


def test_dissect_extracts_literal_separated_fields(spark):
    df2 = spark.createDataFrame(
        [(1, "GET /index.html 200")], "id bigint, line string")
    out = rows(compile_ingest_pipeline(df2, [
        {"dissect": {"field": "line",
                     "pattern": "%{verb} %{path} %{status}"}},
        {"convert": {"field": "status", "type": "integer"}},
    ]))
    assert out[1]["verb"] == "GET" and out[1]["path"] == "/index.html"
    assert out[1]["status"] == 200


def test_append_dedup_and_script(df):
    out = rows(compile_ingest_pipeline(df, [
        {"append": {"field": "tags", "value": ["a", "b"]}},
        {"append": {"field": "tags", "value": "a",
                    "allow_duplicates": False}},
        {"script": {"target_field": "id2", "source": "id * 10"}},
    ]))
    assert out[1]["tags"] == ["a", "b"] and out[1]["id2"] == 10


def test_ignore_missing_and_strictness(df):
    # strict: missing field raises at compile time
    with pytest.raises(ValueError, match="missing"):
        compile_ingest_pipeline(df, [{"trim": {"field": "nope"}}])
    # lenient: processor skipped
    out = rows(compile_ingest_pipeline(df, [
        {"trim": {"field": "nope", "ignore_missing": True}},
    ]))
    assert set(out) == {1, 2}
    with pytest.raises(ValueError, match="unsupported"):
        compile_ingest_pipeline(df, [{"frobnicate": {"field": "txt"}}])


def test_fail_processor_marks_rows(df):
    out = rows(apply_ingest_pipeline(
        df, {"processors": [{"fail": {"if": "id = 2",
                                      "message": "reject"}}]},
        failure_marker="failed"))
    assert out[1]["failed"] is False and out[2]["failed"] is True


def test_pipeline_is_pure_codegen(df):
    out = compile_ingest_pipeline(df, [
        {"gsub": {"field": "txt", "pattern": "o", "replacement": "0"}},
        {"script": {"target_field": "id2", "source": "id * 10"}},
        {"dissect": {"field": "origin", "pattern": "src%{n}"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # zero Python in the ingest path
    # zero shuffle: a pipeline is a projection chain
    assert "Exchange" not in plan


def test_simulate_matches_real_pipeline(spark):
    from elasticsearch_nlp_classifier_spark.sources import (
        apply_ingest_pipeline, simulate_ingest_pipeline,
    )

    pipeline = {"description": "demo", "processors": [
        {"set": {"field": "env", "value": "prod"}},
        {"lowercase": {"field": "host"}},
        {"convert": {"field": "code", "type": "integer"}},
    ]}
    docs = [{"host": "WEB-01", "code": "200"},
            {"host": "Db-02", "code": "500"}]
    got = simulate_ingest_pipeline(spark, pipeline, docs)
    assert got[0]["env"] == "prod" and got[0]["host"] == "web-01"
    assert got[1]["code"] == 500
    # simulate IS the real path: same rows as running the pipeline
    import pandas as pd
    real = apply_ingest_pipeline(
        spark.createDataFrame(pd.DataFrame(docs)), pipeline,
        failure_marker="_ingest_error",
    ).collect()
    assert [r.asDict(recursive=True) for r in real] == got
    assert all(g["_ingest_error"] is False for g in got)


def test_simulate_empty_docs(spark):
    from elasticsearch_nlp_classifier_spark.sources import (
        simulate_ingest_pipeline,
    )

    assert simulate_ingest_pipeline(spark, {"processors": []}, []) == []
