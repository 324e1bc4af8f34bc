"""ES ``_reindex``: rebuild an index from its source documents with new
settings — different analyzer, a source ``query`` filter, an optional
per-document ``script`` transform, ``max_docs``.

The reference recreates its ES index from the Kaggle CSVs whenever the
mapping/analyzer changes (`ElasticsearchDataset.java` ingests the raw
dataset; analyzer choice lives index-side) — the ES-native way to do
that without re-ingesting is ``POST _reindex``.  In this engine the
"_source store" IS the documents table (parquet/Iceberg), so reindex
reads it back, applies the query/script/max_docs pipeline declaratively
(Catalyst pushes the filter into the source scan — verified in
``test_reindex_filter_pushdown``) and runs the normal checkpointed
physical build at the destination.

ES semantic notes carried over:

- ``dest`` settings are NOT copied from the source index: the analyzer
  / positions / layout arguments here fully define the new index, like
  an ES dest index created beforehand.
- ``script`` runs before indexing and sees the source row; here it is
  either a ``{col: Column}`` dict (``withColumns``) or a
  ``DataFrame -> DataFrame`` callable for multi-column rewrites.
- ``max_docs`` in ES takes an unspecified subset; a distributed engine
  needs a deterministic one, so we take the first ``max_docs`` by
  ``doc_id`` (a TakeOrdered — no global sort materialization).

At 100 TB this is exactly the index build's cost profile: one source
scan (filter+projection pushed down), the tokenize/agg/encode pipeline,
no extra shuffle added by the reindex wrapper itself.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .blocks import PhysicalIndex, build_physical_index


def reindex(
    docs: DataFrame,
    dest_path: str,
    *,
    query: Column | str | None = None,
    script: dict[str, Column] | Callable[[DataFrame], DataFrame] | None = None,
    max_docs: int | None = None,
    doc_id_col: str = "doc_id",
    text_col: str = "content",
    analyzer: str = "code",
    with_positions: bool = False,
    **build_kw,
) -> PhysicalIndex:
    """Rebuild a physical index at ``dest_path`` from the source
    ``docs`` table under new settings.  Returns the new
    :class:`PhysicalIndex` (checkpointed/resumable like any build).

    ``query`` is a boolean ``Column`` (e.g. from
    ``compile_query_string``) or a SQL predicate string."""
    src = docs
    if query is not None:
        src = src.where(F.expr(query) if isinstance(query, str) else query)
    if script is not None:
        if callable(script):
            src = script(src)
        else:
            src = src.withColumns(script)
    if max_docs is not None:
        # deterministic subset: first max_docs by doc id (TakeOrdered)
        src = src.orderBy(doc_id_col).limit(int(max_docs))
    if doc_id_col != "doc_id":
        src = src.withColumnRenamed(doc_id_col, "doc_id")
    return build_physical_index(
        src,
        dest_path,
        text_col=text_col,
        analyzer=analyzer,
        with_positions=with_positions,
        **build_kw,
    )
