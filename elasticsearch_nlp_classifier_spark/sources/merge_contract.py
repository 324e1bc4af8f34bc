"""The S8 MERGE behavioral contract as SHARED executable steps.

Both merge sinks — the parquet emulation (:func:`merge.merge_updates`)
and the live-Iceberg path (:func:`merge.merge_updates_iceberg`) — must
implement the same ``BulkUpdateQueue.java:27-169`` apply-batch
semantics: only matched rows' update columns change, unmatched update
ids are ignored (update-only, no inserts), a null source value keeps
the old target value (partial updates never null a field), and
untouched rows survive byte-identical.  This module is that contract
ONCE, parameterized over the storage backend, so the parquet test and
the (jar-gated) Iceberg test cannot drift apart: a semantics change
must edit this file, which both tests execute.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SEED_ROWS = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
SEED_SCHEMA = "doc_id long, lang string, n long"


def run_merge_contract(
    spark: SparkSession,
    create_table: Callable[[DataFrame], None],
    merge: Callable[[DataFrame, dict], Optional[int]],
    read_table: Callable[[], DataFrame],
) -> None:
    """Drive one backend through the contract; assert-fails on any
    divergence.  ``merge`` may return the matched-row count (asserted
    when not None — Iceberg's SQL MERGE does not report one)."""
    create_table(spark.createDataFrame(SEED_ROWS, SEED_SCHEMA))

    updates = spark.createDataFrame(
        [(2, "B2"), (99, "ghost")], "doc_id long, new_lang string"
    )
    n = merge(updates, {"lang": "new_lang"})
    if n is not None:
        assert n == 1, n  # only doc 2 matched; id 99 ignored
    got = {
        r["doc_id"]: (r["lang"], r["n"]) for r in read_table().collect()
    }
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("c", 30)}, got

    # a null-source update value leaves the target value untouched
    upd2 = spark.createDataFrame(
        [(1, None), (3, "C3")], "doc_id long, new_lang string"
    )
    n2 = merge(upd2, {"lang": "new_lang"})
    if n2 is not None:
        assert n2 == 2, n2
    got2 = {r["doc_id"]: r["lang"] for r in read_table().collect()}
    assert got2 == {1: "a", 2: "B2", 3: "C3"}, got2

    # idempotent re-apply: same batch again changes nothing
    merge(upd2, {"lang": "new_lang"})
    got3 = {
        r["doc_id"]: (r["lang"], r["n"]) for r in read_table().collect()
    }
    assert got3 == {1: ("a", 10), 2: ("B2", 20), 3: ("C3", 30)}, got3
