"""Declarative YAML job spec — the finished version of the reference's
v2 pipeline layer.

The reference declares datasets + tasks in YAML
(`config/datasets/*.yaml`, `config/pipelines/**`) and loads them
through Jackson beans with reflective extractor classes
(`v2/config/YamlParser.java:34-56`,
`v2/config/ControllerConfig.java:33-49`) — but the controller is an
empty TODO (`v2/controller/Controller.java:19-21`) and the extractor
classnames reference classes that don't exist.  We keep the good idea
(declarative spec, validated at load — error paths mirrored from
`v2/config/DatasetConfigTest.java:19-136`) and drop the reflection:
every task maps to a plain engine function.

Field types are the reference's `DatasetField` enum
(`v2/config/DatasetField.java:3-10`) mapped per SURVEY §1.2:
binary/integer -> int, numeric -> double, text/categorical -> string,
list_categorical -> array<string>.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DATASET_TYPES = {"parquet", "iceberg", "csv", "json"}
FIELD_TYPES = {
    "binary": IntegerType(),
    "integer": IntegerType(),
    "numeric": DoubleType(),
    "text": StringType(),
    "categorical": StringType(),
    "list_categorical": ArrayType(StringType()),
}
TASK_TYPES = {"build_index", "query", "train", "enrich", "kfold",
              "export_csv"}


class SpecError(ValueError):
    pass


@dataclass
class DatasetSpec:
    name: str
    type: str
    path: str
    fields: dict[str, str] = field(default_factory=dict)

    def validate(self) -> None:
        if not self.name:
            raise SpecError("dataset name must be non-empty")
        if self.type not in DATASET_TYPES:
            raise SpecError(
                f"dataset {self.name}: invalid type {self.type!r} "
                f"(expected one of {sorted(DATASET_TYPES)})"
            )
        if not self.path:
            raise SpecError(f"dataset {self.name}: path/table required")
        for col, t in self.fields.items():
            if t not in FIELD_TYPES:
                raise SpecError(
                    f"dataset {self.name}: field {col}: invalid type {t!r}"
                )

    def schema(self) -> StructType | None:
        if not self.fields:
            return None
        return StructType(
            [StructField(c, FIELD_TYPES[t], True)
             for c, t in self.fields.items()]
        )

    def load(self, spark: SparkSession) -> DataFrame:
        if self.type == "parquet":
            return spark.read.parquet(self.path)
        if self.type == "iceberg":
            return spark.table(self.path)
        schema = self.schema()
        if self.type == "csv":
            r = spark.read.options(header=True, quote='"', escape='"',
                                   multiLine=True)
            return (r.schema(schema) if schema else r).csv(self.path)
        r = spark.read
        return (r.schema(schema) if schema else r).json(self.path)


@dataclass
class TaskSpec:
    task: str
    dataset: str
    params: dict

    def validate(self, datasets: dict[str, DatasetSpec]) -> None:
        if self.task not in TASK_TYPES:
            raise SpecError(
                f"invalid task {self.task!r} "
                f"(expected one of {sorted(TASK_TYPES)})"
            )
        if self.dataset not in datasets:
            raise SpecError(
                f"task {self.task}: unknown dataset {self.dataset!r}"
            )


@dataclass
class PipelineSpec:
    datasets: dict[str, DatasetSpec]
    tasks: list[TaskSpec]


def load_pipeline(path_or_text: str) -> PipelineSpec:
    """Parse + validate; raises SpecError on any invalid declaration
    (error-path behavior mirroring `DatasetConfigTest.java:19-136`)."""
    import os

    import yaml

    text = path_or_text
    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
    raw = yaml.safe_load(text)
    if not isinstance(raw, dict) or "datasets" not in raw:
        raise SpecError("pipeline spec needs a 'datasets' mapping")

    datasets = {}
    for name, d in (raw.get("datasets") or {}).items():
        ds = DatasetSpec(
            name=name,
            type=str(d.get("type", "")),
            path=str(d.get("path", d.get("table", ""))),
            fields=d.get("fields") or {},
        )
        ds.validate()
        datasets[name] = ds

    tasks = []
    for t in raw.get("tasks") or []:
        t = dict(t)
        spec = TaskSpec(
            task=str(t.pop("task", "")),
            dataset=str(t.pop("dataset", "")),
            params=t,
        )
        spec.validate(datasets)
        tasks.append(spec)
    return PipelineSpec(datasets, tasks)


def run_pipeline(spark: SparkSession, path_or_text: str) -> list[dict]:
    """Execute every task in declaration order; returns one result dict
    per task (counts / paths / metrics)."""
    spec = load_pipeline(path_or_text)
    results: list[dict] = []
    for t in spec.tasks:
        docs = spec.datasets[t.dataset].load(spark)
        p = t.params
        if t.task == "build_index":
            from ..index.blocks import build_physical_index

            id_col = p.get("doc_id_col", "doc_id")
            if id_col != "doc_id":
                docs = docs.withColumnRenamed(id_col, "doc_id")
            build_physical_index(
                docs, p["output"],
                text_col=p.get("text_col", "content"),
                analyzer=p.get("analyzer", "code"),
                with_positions=bool(p.get("with_positions", False)),
            )
            results.append({"task": t.task, "output": p["output"]})
        elif t.task == "query":
            import pandas as pd

            from ..index.blocks import PhysicalIndex
            from ..query.wand import wand_topk

            index = PhysicalIndex(p["index"], spark)
            qpdf = pd.DataFrame(
                {"query_id": [1], "query_text": [p["query"]]}
            )
            out = wand_topk(index, qpdf, k=int(p.get("k", 10)),
                            analyzer=p.get("analyzer", "code"))
            results.append({"task": t.task, "rows": out.collect()})
        elif t.task == "train":
            from ..classifier import train_nb
            from ..sources import save_model

            model = train_nb(
                docs, list(p["text_cols"]), p["label"],
                analyzer=p.get("analyzer", "code"),
                id_col=p.get("id_col", "doc_id"),
            )
            save_model(model, p["model"])
            results.append({"task": t.task, "model": p["model"],
                            "vocab_size": model.vocab_size})
        elif t.task == "enrich":
            from ..classifier import enrich, predict_nb
            from ..sources import load_model

            model = load_model(spark, p["model"])
            preds = predict_nb(
                model, docs, list(p["text_cols"]),
                analyzer=p.get("analyzer", "code"),
                id_col=p.get("id_col", "doc_id"),
            )
            updates = enrich(docs, preds, p["label"],
                             id_col=p.get("id_col", "doc_id"))
            updates.write.mode("overwrite").parquet(p["output"])
            results.append({"task": t.task, "output": p["output"]})
        elif t.task == "kfold":
            from ..classifier import kfold_validation

            res = kfold_validation(
                docs, list(p["text_cols"]), p["label"],
                k=int(p.get("k", 3)),
                analyzer=p.get("analyzer", "code"),
                id_col=p.get("id_col", "doc_id"),
            )
            results.append({"task": t.task, **res})
        elif t.task == "export_csv":
            from ..sources import write_submission_csv

            write_submission_csv(
                docs, p["output"],
                id_col=p.get("id_col", "id"),
                target_col=p.get("target_col", "target"),
            )
            results.append({"task": t.task, "output": p["output"]})
    return results
