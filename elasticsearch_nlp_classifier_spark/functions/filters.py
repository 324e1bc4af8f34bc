"""Predicate surface P1–P12 (SURVEY §2.2) — the ES Query-DSL predicates
the reference pushes server-side, as DataFrame filter helpers.

These are deliberately thin: each returns a Column (or DataFrame for
projection), keeping everything inside Catalyst/codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, fields: list[str]) -> DataFrame:
    """P1 — `_source` field filtering -> column pruning."""
    return df.select(*fields)


def must(*conds: Column) -> Column:
    """P2 — bool.must (conjunction)."""
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def must_not(cond: Column) -> Column:
    """P2 — bool.mustNot."""
    return ~cond


def exists(field: str) -> Column:
    """P3 — existsQuery."""
    return F.col(field).isNotNull()


def term_query(field: str, value) -> Column:
    """P4 — exact value match on an unanalyzed field."""
    return F.col(field) == F.lit(value)


def term_query_analyzed(tokens_col, value: str) -> Column:
    """P4 (content form) — term present in the analyzed token array."""
    return F.array_contains(tokens_col, value)


def match_any(tokens_col, query_tokens: list[str]) -> Column:
    """P5 — unranked matchQuery: any analyzed query token present."""
    return F.arrays_overlap(
        tokens_col, F.array(*[F.lit(t) for t in query_tokens])
    )


def kfold_filter(id_col: str, k: int, fold: int, train: bool = True) -> Column:
    """P6/X1 — deterministic `_id % k` fold split
    (`OpenNLPClassifierES.java:31-33`)."""
    cond = F.pmod(F.col(id_col), F.lit(k)) == F.lit(fold)
    return ~cond if train else cond


def match_all() -> Column:
    """P8."""
    return F.lit(True)


def non_empty_label(field: str) -> Column:
    """P9 — drop missing/'' labels before training."""
    return F.col(field).isNotNull() & (F.col(field) != "")


def changed_value(existing: str, new: str) -> Column:
    """P11 — update-if-changed, null-safe missing->''
    (`OpenNLPEnricher.java:109-112`)."""
    return ~F.coalesce(F.col(existing), F.lit("")).eqNullSafe(F.col(new))


def nested_query(path, predicate) -> Column:
    """ES ``nested`` query: match the parent document when AT LEAST ONE
    element of the array-of-struct field satisfies the inner predicate
    — crucially, all inner conditions must hold on the SAME element
    (ES's whole point: a flat `a AND b` over separate elements is the
    object-field false positive nested exists to prevent).

    ``path`` is the array column (name or Column), ``predicate`` a
    function struct-element -> boolean Column.  Stays entirely in
    Catalyst (`exists` higher-order function) — no explode, no shuffle,
    no row multiplication.

    Null/empty arrays don't match (ES semantics)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.coalesce(F.exists(c, predicate), F.lit(False))


def nested_inner_hits(
    df: DataFrame, path, predicate, id_col: str = "doc_id",
) -> DataFrame:
    """ES ``nested`` + ``inner_hits``: one row per MATCHING nested
    element, with its position (`_nested.offset`).  posexplode +
    element filter — row count bounded by matching elements, and the
    parent filter (`nested_query`) runs first so non-matching parents
    never explode."""
    c = F.col(path) if isinstance(path, str) else path
    return (
        df.where(nested_query(c, predicate))
        .select(F.col(id_col), F.posexplode(c).alias("offset", "hit"))
        .where(predicate(F.col("hit")))
    )


def terms_set_query(
    tokens_col, terms: list[str], minimum_should_match: int | None = None,
) -> Column:
    """ES ``terms_set``: match when at least ``minimum_should_match``
    DISTINCT terms from ``terms`` occur in the analyzed token array
    (default: all of them).  ``array_intersect`` dedups both sides —
    exactly ES's distinct-matched-terms count — and stays in codegen.
    Null arrays don't match (ES semantics)."""
    msm = len(terms) if minimum_should_match is None else minimum_should_match
    hits = F.size(F.array_intersect(
        tokens_col, F.array(*[F.lit(t) for t in terms])
    ))
    return F.coalesce(hits >= F.lit(msm), F.lit(False))


def ids_query(id_col: str, ids: list) -> Column:
    """ES ``ids`` query: member-of-set on the document id — compiles to
    an ``isin`` that Catalyst pushes into the scan (In/InSet filter)."""
    return F.col(id_col).isin(ids)
