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


def test_dataprep_pipeline_end_to_end(spark, tmp_path):
    """Full data-prep run over docs + planted exact/near dups: dup rows
    removed, chunks bounded, splits disjoint+exhaustive, lineage
    written per stage, and no doc straddles train/val."""
    import json

    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.plans import run_dataprep

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = docs.where("doc_id < 3").withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    near = docs.where("doc_id between 3 and 5").withColumn(
        "doc_id", F.col("doc_id") + 20_000
    ).withColumn("text", F.concat("text", F.lit(" tail")))
    full = docs.unionByName(exact).unionByName(near)

    out_dir = str(tmp_path / "prep")
    res = run_dataprep(
        full, out_dir, max_tokens=32, overlap=4,
        near_dup_threshold=0.5,
        # permissive gate: the synthetic docs are short
        quality_thresholds={"min_words": 1, "min_mean_word_len": 0.0,
                            "max_symbol_word_ratio": 1.0,
                            "min_alpha_word_frac": 0.0},
    )
    stages = [r["stage"] for r in res["records"]]
    assert stages == ["quality_gate", "pii_redact", "exact_dedup",
                      "near_dedup", "chunk", "split_write"]
    by = {r["stage"]: r for r in res["records"]}
    # planted exact dups removed (keep-first)
    assert (by["exact_dedup"]["rows_in"]
            - by["exact_dedup"]["rows_out"]) >= 3
    # planted near dups clustered away
    assert (by["near_dedup"]["rows_in"]
            - by["near_dedup"]["rows_out"]) >= 3
    # lineage file mirrors the records
    lines = [json.loads(l) for l in
             open(f"{out_dir}/lineage.jsonl")]
    assert [l["stage"] for l in lines] == ["input"] + stages

    train = spark.read.parquet(f"{out_dir}/train")
    val = spark.read.parquet(f"{out_dir}/val")
    assert train.count() + val.count() == by["chunk"]["rows_out"]
    assert train.where("n_tokens > 32").count() == 0
    # split by doc id -> no document leaks across splits
    t_ids = {r["id"] for r in train.select("id").distinct().collect()}
    v_ids = {r["id"] for r in val.select("id").distinct().collect()}
    assert not (t_ids & v_ids)
    # kept canonical ids, dropped planted copies
    assert not any(i >= 10_000 for i in t_ids | v_ids)


def test_dataprep_full_llm_pipeline(spark, tmp_path):
    """All optional stages on: perplexity filter, decontamination,
    domain mixing, and per-split packing maps."""
    import json

    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.plans import run_dataprep

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # eval set = doc 7's text verbatim -> decontamination must drop it
    eval_docs = docs.where("doc_id = 7").select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    out_dir = str(tmp_path / "prep2")
    res = run_dataprep(
        docs, out_dir, max_tokens=32, overlap=0,
        near_dup_threshold=0.5,
        quality_thresholds={"min_words": 1, "min_mean_word_len": 0.0,
                            "max_symbol_word_ratio": 1.0,
                            "min_alpha_word_frac": 0.0},
        eval_docs=eval_docs, decontaminate_n=6,
        target_mix={"src0": 0.5, "src1": 0.25, "src2": 0.25},
        mix_group_col="source",
        max_ppl=1e9,
        pack_seq_len=16,
        span_dedup_k=8,
    )
    stages = [r["stage"] for r in res["records"]]
    assert stages == [
        "quality_gate", "perplexity_filter", "pii_redact", "span_dedup",
        "exact_dedup", "near_dedup", "decontaminate", "domain_mix",
        "chunk", "split_write", "packing_map",
    ]
    # span dedup rewrites text but never drops rows by itself
    by_s = {r["stage"]: r for r in res["records"]}
    assert by_s["span_dedup"]["rows_out"] == by_s["span_dedup"]["rows_in"]
    by = {r["stage"]: r for r in res["records"]}
    assert by["decontaminate"]["rows_out"] < by["decontaminate"]["rows_in"]

    # packing maps written per split, sequences bounded by seq_len
    for name in ("train", "val"):
        chunks = spark.read.parquet(f"{out_dir}/{name}")
        pk = spark.read.parquet(f"{out_dir}/{name}_packing")
        per_seq = pk.groupBy("seq_id").agg(
            F.sum("n_toks").alias("s")).collect()
        assert all(r.s <= 16 for r in per_seq)
        # every chunk's tokens are fully assigned
        want = chunks.agg(F.sum("n_tokens")).collect()[0][0] or 0
        got = pk.agg(F.sum("n_toks")).collect()[0][0] or 0
        assert got == want
    # doc 7 (the eval item) never reaches the output
    t_ids = {r["id"] for r in spark.read.parquet(f"{out_dir}/train")
             .select("id").distinct().collect()}
    v_ids = {r["id"] for r in spark.read.parquet(f"{out_dir}/val")
             .select("id").distinct().collect()}
    assert 7 not in (t_ids | v_ids)
    # only targeted sources survive the mix
    lines = [json.loads(l) for l in open(f"{out_dir}/lineage.jsonl")]
    assert [l["stage"] for l in lines] == ["input"] + stages


def test_dataprep_resumable_skips_completed_stages(spark, tmp_path):
    """resumable=True: stage checkpoints + completion manifests — a
    rerun with the same out_dir resumes every completed stage; deleting
    a later stage's manifest recomputes from there while earlier stages
    stay resumed.  Outputs identical across cold and resumed runs."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.plans import run_dataprep

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    kw = dict(
        max_tokens=32, overlap=4, near_dup_threshold=0.5,
        quality_thresholds={"min_words": 1, "min_mean_word_len": 0.0,
                            "max_symbol_word_ratio": 1.0,
                            "min_alpha_word_frac": 0.0},
        resumable=True,
    )
    out_dir = str(tmp_path / "prep_r")
    res1 = run_dataprep(docs, out_dir, **kw)
    train1 = sorted(
        r.chunk_text
        for r in spark.read.parquet(f"{out_dir}/train").collect()
    )
    assert not any(r.get("resumed") for r in res1["records"])

    # full rerun: every checkpointed stage resumes, output unchanged
    res2 = run_dataprep(docs, out_dir, **kw)
    staged = [r for r in res2["records"]
              if r["stage"] not in ("input", "split_write")]
    assert staged and all(r.get("resumed") for r in staged)
    train2 = sorted(
        r.chunk_text
        for r in spark.read.parquet(f"{out_dir}/train").collect()
    )
    assert train2 == train1

    # kill-and-rerun from the middle: drop the chunk stage's manifest
    _os.remove(f"{out_dir}/_stages/chunk/_stage_manifest.json")
    res3 = run_dataprep(docs, out_dir, **kw)
    by_stage = {r["stage"]: r for r in res3["records"]}
    assert by_stage["exact_dedup"].get("resumed")
    assert not by_stage["chunk"].get("resumed")
    train3 = sorted(
        r.chunk_text
        for r in spark.read.parquet(f"{out_dir}/train").collect()
    )
    assert train3 == train1
