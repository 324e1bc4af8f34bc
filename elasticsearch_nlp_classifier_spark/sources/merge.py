"""MERGE-style partial-update sink (S8).

The reference's ``BulkUpdateQueue``
(`utils/elasticsearch/update/BulkUpdateQueue.java:27-169`) applies
batches of per-doc partial updates atomically against the ES index.
On a lakehouse that is ``MERGE INTO`` (Iceberg/Delta); no table-format
runtime jar ships in this sandbox, so this module emulates the same
contract against a parquet table directory:

- **overwrite-by-join**: new table = current rows left-join the update
  set; update columns are ``coalesce(update, current)`` — rows absent
  from the update set are byte-identical to before.
- **atomic swap**: the merged table is fully written to a staging dir
  first, then swapped in with two directory renames — readers see the
  old or the new table, never a partial write (the apply-batch-
  atomically contract of ``BulkUpdateQueue.flush``).
- At real scale the same plan runs as Iceberg ``MERGE`` (copy-on-write
  rewrites only matched files; the join below is what the engine
  executes under the hood).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_updates(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    id_col: str,
    update_cols: dict[str, str],
) -> int:
    """Apply ``updates`` to the parquet table at ``table_path``.

    ``update_cols`` maps target column -> source column in ``updates``
    (e.g. ``{"lang": "new_lang"}``).  Returns the number of target rows
    that matched an update row.  Unmatched update rows are ignored
    (update-only MERGE, like the reference's partial-update batches —
    no inserts)."""
    current = spark.read.parquet(table_path)
    upd = updates.select(
        F.col(id_col),
        *[F.col(src).alias(f"__new_{tgt}") for tgt, src in update_cols.items()],
    )
    n_matched = current.join(upd, id_col, "left_semi").count()
    # no broadcast hint: AQE picks broadcast for small update batches;
    # a TB-scale update set correctly falls back to a shuffle join
    merged = current.join(upd, id_col, "left").select(
        *[
            (
                F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in current.columns
        ]
    )
    _atomic_overwrite(merged, table_path)
    return n_matched


def iceberg_merge_sql(
    table: str,
    updates_view: str,
    id_col: str,
    update_cols: dict[str, str],
) -> str:
    """The exact ``MERGE INTO`` statement the Iceberg path executes —
    rendered separately so its TEXT is unit-pinned
    (tests/test_sources.py) even though no Iceberg runtime jar exists
    in this sandbox to run it.  Update-only (no WHEN NOT MATCHED),
    matching the parquet emulation's contract above."""
    # coalesce: a null source value keeps the old target value — the
    # partial-update contract of merge_updates and the reference's
    # BulkUpdateQueue (an absent field never nulls the doc's field); a
    # bare `t.x = s.x` MERGE would overwrite with NULL and fork the two
    # paths' semantics (round-5 fix, pinned by the shared contract in
    # merge_contract.py)
    sets = ", ".join(
        f"t.{tgt} = coalesce(s.{src}, t.{tgt})"
        for tgt, src in sorted(update_cols.items())
    )
    return (
        f"MERGE INTO {table} t USING {updates_view} s "
        f"ON t.{id_col} = s.{id_col} "
        f"WHEN MATCHED THEN UPDATE SET {sets}"
    )


def merge_updates_iceberg(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    id_col: str,
    update_cols: dict[str, str],
) -> None:
    """The live-Iceberg twin of :func:`merge_updates`: register the
    update batch as a temp view and submit the rendered ``MERGE INTO``
    (copy-on-write rewrite of matched files, atomic snapshot commit —
    the ``BulkUpdateQueue.flush`` contract at lakehouse scale).
    Requires an Iceberg-enabled session; the statement text itself is
    pinned by tests independent of the runtime."""
    view = f"__merge_src_{uuid.uuid4().hex[:8]}"
    updates.createOrReplaceTempView(view)
    try:
        spark.sql(iceberg_merge_sql(table, view, id_col, update_cols))
    finally:
        spark.catalog.dropTempView(view)


def _atomic_overwrite(df: DataFrame, table_path: str) -> None:
    """Write ``df`` to a staging dir, then swap it in with two renames —
    readers see the old or the new table, never a partial write."""
    staging = f"{table_path}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(table_path, old)
    try:
        os.rename(staging, table_path)
    except OSError:
        os.rename(old, table_path)  # roll back the swap
        raise
    shutil.rmtree(old, ignore_errors=True)


def update_by_query(
    spark: SparkSession,
    table_path: str,
    predicate,
    set_exprs: dict,
) -> int:
    """ES ``_update_by_query``: apply ``set_exprs`` (target column ->
    Column expression, evaluated against the current row) to every row
    matching ``predicate``; all other rows pass through byte-identical.
    Same atomic-swap contract as :func:`merge_updates`.  Returns the
    matched-row count (ES's ``updated``).

    Reference surface: ``UpdateRequest``-per-hit loops in
    `utils/elasticsearch/update/BulkUpdateQueue.java` driven by a query
    — on a lakehouse this is one scan + conditional projection, never a
    per-doc round trip."""
    current = spark.read.parquet(table_path)
    hit = F.coalesce(predicate, F.lit(False))
    n_matched = current.where(hit).count()
    updated = current.select(*[
        (F.when(hit, set_exprs[c]).otherwise(F.col(c)).alias(c)
         if c in set_exprs else F.col(c))
        for c in current.columns
    ])
    _atomic_overwrite(updated, table_path)
    return n_matched


def delete_by_query(
    spark: SparkSession,
    table_path: str,
    predicate,
) -> int:
    """ES ``_delete_by_query``: drop every row matching ``predicate``
    (null predicate = not matched, ES semantics); atomic swap; returns
    the deleted count.  The index-level cousin is
    ``index/deletes.py``'s tombstones — this one rewrites the source
    table itself (Iceberg ``DELETE WHERE`` at real scale)."""
    current = spark.read.parquet(table_path)
    hit = F.coalesce(predicate, F.lit(False))
    n_deleted = current.where(hit).count()
    _atomic_overwrite(current.where(~hit), table_path)
    return n_deleted
