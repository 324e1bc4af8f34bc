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


def _guarded(df: DataFrame, proc: dict, field: str, new: Column) -> Column:
    """Apply the processor's ``if`` condition: rows failing it keep the
    old value (or null for new fields).

    When the processor RETYPES an existing column (e.g. an in-place
    guarded ``convert``), ES's per-doc dynamic typing (skipped docs
    keep the old string, converted docs hold the new type) has no
    relational equivalent; the documented narrowing here is that
    skipped rows carry their old value into the new column type via
    ``try_cast`` — representable values survive, unrepresentable ones
    become null.  Never an ANSI runtime error: a plain ``otherwise(
    old)`` would let Spark insert a strict implicit cast on the old
    branch and abort the whole job on the first malformed row."""
    cond = proc.get("if")
    if cond is None:
        return new
    if field not in df.columns:
        return F.when(F.expr(cond), new).otherwise(F.lit(None))
    old = F.col(field)
    old_t = df.schema[field].dataType
    new_t = df.select(new.alias("_t")).schema[0].dataType  # analysis only
    if new_t.simpleString() != old_t.simpleString():
        old = old.try_cast(new_t)
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
    marking rows where a ``convert``/``date`` lost a non-null value or
    a ``fail`` processor fired (ES's on_failure routing key).  The
    marker is MATERIALIZED as a working column immediately after each
    failure-contributing processor, not composed lazily: a lazy
    expression would (a) break when a later ``remove`` drops a column
    it references, and (b) read post-conversion values for in-place
    converts, silently under-reporting failures."""
    marker_col = "__ingest_failed__" if failure_marker else None

    def _note_failure(d: DataFrame, lost: Column) -> DataFrame:
        if marker_col is None:
            return d
        base = F.col(marker_col) if marker_col in d.columns \
            else F.lit(False)
        return d.withColumn(
            marker_col, base | F.coalesce(lost, F.lit(False)))

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
            df = df.withColumn(field, _guarded(df, p, field, val))

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
            if p.get("if") is not None:
                # a processor its `if` skipped never ran, so it cannot
                # fail (ES conditional semantics)
                lost = F.coalesce(F.expr(p["if"]), F.lit(False)) & lost
            df = _note_failure(df, lost)  # before `field` is overwritten
            df = df.withColumn(target, _guarded(df, p, target, new))

        elif ptype == "gsub":
            if not _require(cols, p["field"], p, "gsub"):
                continue
            field = p["field"]
            new = F.regexp_replace(F.col(field), p["pattern"],
                                   p["replacement"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(df, p, target, new))

        elif ptype in ("lowercase", "uppercase", "trim"):
            if not _require(cols, p["field"], p, ptype):
                continue
            field = p["field"]
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[ptype]
            target = p.get("target_field", field)
            df = df.withColumn(target,
                               _guarded(df, p, target, fn(F.col(field))))

        elif ptype == "split":
            if not _require(cols, p["field"], p, "split"):
                continue
            field = p["field"]
            new = F.split(F.col(field), p["separator"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(df, p, target, new))

        elif ptype == "join":
            if not _require(cols, p["field"], p, "join"):
                continue
            field = p["field"]
            new = F.array_join(F.col(field), p["separator"])
            target = p.get("target_field", field)
            df = df.withColumn(target, _guarded(df, p, target, new))

        elif ptype == "append":
            field = p["field"]
            vals = p["value"] if isinstance(p["value"], list) else [p["value"]]
            add = F.array(*[F.lit(v) for v in vals])
            base = (F.coalesce(F.col(field), F.array())
                    if field in cols else F.array())
            new = F.concat(base, add)
            if p.get("allow_duplicates", True) is False:
                new = F.array_distinct(new)
            df = df.withColumn(field, _guarded(df, p, field, new))

        elif ptype == "date":
            if not _require(cols, p["field"], p, "date"):
                continue
            field = p["field"]
            target = p.get("target_field", "@timestamp")
            fmts = p.get("formats", ["yyyy-MM-dd'T'HH:mm:ss"])
            parsed = F.coalesce(
                *[F.try_to_timestamp(F.col(field), F.lit(f)) for f in fmts])
            lost = F.col(field).isNotNull() & parsed.isNull()
            if p.get("if") is not None:
                # skipped-by-`if` processors cannot fail (see convert)
                lost = F.coalesce(F.expr(p["if"]), F.lit(False)) & lost
            df = _note_failure(df, lost)  # before `field` is overwritten
            df = df.withColumn(target, _guarded(df, p, target, parsed))

        elif ptype == "dissect":
            if not _require(cols, p["field"], p, "dissect"):
                continue
            for f2, c in _dissect_pattern(p["pattern"],
                                          F.col(p["field"])).items():
                df = df.withColumn(f2, _guarded(df, p, f2, c))

        elif ptype == "script":
            # Painless analog that stays JVM-side: any SQL expression
            # over the row, bound to target_field
            df = df.withColumn(
                p["target_field"],
                _guarded(df, p, p["target_field"], F.expr(p["source"])))

        elif ptype == "fail":
            cond = p.get("if")
            marker = F.when(F.expr(cond), F.lit(True)) if cond \
                else F.lit(True)
            df = _note_failure(df, marker)

        else:
            raise ValueError(f"unsupported processor type: {ptype}")

    if failure_marker:
        if marker_col in df.columns:
            df = df.withColumnRenamed(marker_col, failure_marker)
        else:
            df = df.withColumn(failure_marker, F.lit(False))
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
