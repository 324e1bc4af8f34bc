"""Declarative YAML pipeline (v2 layer, finished): validation error
paths per `DatasetConfigTest.java:19-136` and an end-to-end
build+query+train+enrich run."""

import pytest

from elasticsearch_nlp_classifier_spark.plans import (
    SpecError,
    load_pipeline,
    run_pipeline,
)


def test_invalid_dataset_type():
    with pytest.raises(SpecError, match="invalid type"):
        load_pipeline("datasets:\n  d:\n    type: sqlite\n    path: /x\n")


def test_missing_path():
    with pytest.raises(SpecError, match="path/table required"):
        load_pipeline("datasets:\n  d:\n    type: parquet\n")


def test_invalid_field_type():
    with pytest.raises(SpecError, match="invalid type 'decimal'"):
        load_pipeline(
            "datasets:\n  d:\n    type: csv\n    path: /x\n"
            "    fields: {a: decimal}\n"
        )


def test_unknown_task_and_dataset():
    with pytest.raises(SpecError, match="invalid task"):
        load_pipeline(
            "datasets: {d: {type: parquet, path: /x}}\n"
            "tasks:\n  - task: explode\n    dataset: d\n"
        )
    with pytest.raises(SpecError, match="unknown dataset"):
        load_pipeline(
            "datasets: {d: {type: parquet, path: /x}}\n"
            "tasks:\n  - task: train\n    dataset: other\n"
        )


def test_field_type_mapping():
    spec = load_pipeline(
        "datasets:\n  d:\n    type: csv\n    path: /x\n"
        "    fields: {id: integer, y: numeric, text: text,\n"
        "             tags: list_categorical, target: binary}\n"
    )
    schema = spec.datasets["d"].schema()
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert kinds == {
        "id": "int", "y": "double", "text": "string",
        "tags": "array<string>", "target": "int",
    }


def test_run_pipeline_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "import os sys error", "py"),
            (2, "public static void main", "java"),
            (3, "def tokenize stream", "py"),
            (4, "println static import", "java"),
        ],
        "doc_id long, content string, lang string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    yml = f"""
datasets:
  corpus:
    type: parquet
    path: {src}
tasks:
  - task: build_index
    dataset: corpus
    text_col: content
    analyzer: simple_code
    output: {tmp_path}/idx
  - task: query
    dataset: corpus
    index: {tmp_path}/idx
    query: import static
    analyzer: simple_code
    k: 3
  - task: train
    dataset: corpus
    text_cols: [content]
    label: lang
    analyzer: simple_code
    model: {tmp_path}/model
  - task: enrich
    dataset: corpus
    text_cols: [content]
    label: lang
    analyzer: simple_code
    model: {tmp_path}/model
    output: {tmp_path}/updates
"""
    results = run_pipeline(spark, yml)
    assert [r["task"] for r in results] == [
        "build_index", "query", "train", "enrich"
    ]
    hits = results[1]["rows"]
    assert 0 < len(hits) <= 3
    assert results[2]["vocab_size"] > 0
    # model predicts training langs perfectly on this tiny corpus ->
    # enrich writes no updates
    assert spark.read.parquet(f"{tmp_path}/updates").count() == 0


def test_json_dataset_end_to_end(spark, tmp_path):
    """S10: JSON dataset source with declared schema, driven through
    the pipeline (the reference drafts this as the whats-cooking
    dataset: `config/datasets/whats-cooking.yaml:1-12`,
    `v2/config/DatasetType.java:3-6`)."""
    import json as _json

    rows = [
        {"id": 1, "cuisine": "greek",
         "ingredients": ["feta", "olive", "tomato"],
         "desc": "feta olive tomato salad"},
        {"id": 2, "cuisine": "mexican",
         "ingredients": ["tortilla", "beans", "salsa"],
         "desc": "tortilla beans salsa wrap"},
        {"id": 3, "cuisine": "greek",
         "ingredients": ["olive", "lamb"],
         "desc": "olive lamb skewer"},
    ]
    src = tmp_path / "cooking.json"
    src.write_text("\n".join(_json.dumps(r) for r in rows))
    yml = f"""
datasets:
  cooking:
    type: json
    path: {src}
    fields:
      id: integer
      cuisine: categorical
      ingredients: list_categorical
      desc: text
tasks:
  - task: build_index
    dataset: cooking
    text_col: desc
    analyzer: simple_code
    doc_id_col: id
    output: {tmp_path}/jidx
  - task: query
    dataset: cooking
    index: {tmp_path}/jidx
    query: olive salad
    analyzer: simple_code
    k: 3
"""
    results = run_pipeline(spark, yml)
    assert results[0]["task"] == "build_index"
    hits = results[1]["rows"]
    assert [h["doc_id"] for h in hits][0] == 1  # both terms -> top hit
    # declared schema respected (list_categorical -> array<string>)
    from elasticsearch_nlp_classifier_spark.plans.jobspec import (
        load_pipeline,
    )
    spec = load_pipeline(yml)
    df = spec.datasets["cooking"].load(spark)
    assert dict(df.dtypes)["ingredients"] == "array<string>"
    assert df.count() == 3
