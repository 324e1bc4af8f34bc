"""ES index aliases: named views over one or more indexes, with
optional filters — and the atomic ``_aliases`` action API.

ES users point applications at aliases, not indexes: an alias fans a
search out across several indexes (``logs-*`` patterns), restricts it
with a stored filter (tenant isolation), and can be repointed
atomically during reindex cutovers (`POST /_aliases` applies its action
list all-or-nothing).  The reference's client exposes all of this
(`utils/elasticsearch/ESClient.java`).

Engine mapping:

- an alias resolves to the plan-level union of its member indexes with
  globally-merged BM25 statistics (``index/build.py:union_indexes`` —
  the multi-index scoring contract, oracle ``multi_index_bm25``);
- a **filter alias** stores a doc_id relation; searches semi-join the
  postings against it BEFORE scoring, while idf/avgdl stay the FULL
  index's stats — exactly ES's filtered-alias semantics (the filter is
  query context, it never changes index statistics);
- ``update_aliases`` validates its whole action list, then swaps the
  registry dict in one assignment — atomic cutover, a reader mid-swap
  sees wholly old or wholly new state (the GIL-side analog of ES's
  cluster-state commit).

Scale shape: aliases are driver-side metadata; the only distributed
cost a filter adds is one broadcast semi-join on the already
query-pruned postings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import LogicalIndex, union_indexes

__all__ = ["AliasRegistry"]


@dataclass(frozen=True)
class _Alias:
    indexes: tuple[LogicalIndex, ...]
    doc_filter: DataFrame | None = None  # (doc_id) relation, or None


@dataclass
class AliasRegistry:
    _aliases: dict[str, _Alias] = field(default_factory=dict)

    # -- the _aliases API -------------------------------------------------
    def put_alias(
        self,
        name: str,
        indexes: list[LogicalIndex],
        doc_filter: DataFrame | None = None,
    ) -> None:
        """``PUT /<index>/_alias/<name>`` (with optional filter)."""
        self.update_aliases([
            {"add": {"alias": name, "indexes": indexes,
                     "filter": doc_filter}},
        ])

    def delete_alias(self, name: str) -> None:
        self.update_aliases([{"remove": {"alias": name}}])

    def update_aliases(self, actions: list[dict]) -> None:
        """``POST /_aliases``: apply add/remove actions atomically —
        the action list validates first, and the registry swaps in one
        assignment, so a failed action leaves NOTHING applied and a
        concurrent reader never sees a half-applied cutover."""
        staged = dict(self._aliases)
        for act in actions:
            if len(act) != 1 or next(iter(act)) not in ("add", "remove"):
                raise ValueError(f"malformed alias action: {act!r}")
            kind, body = next(iter(act.items()))
            name = body.get("alias")
            if not name:
                raise ValueError(f"alias action missing 'alias': {act!r}")
            if kind == "add":
                idx = body.get("indexes") or []
                if not idx:
                    raise ValueError(f"add action needs indexes: {name}")
                staged[name] = _Alias(
                    indexes=tuple(idx), doc_filter=body.get("filter")
                )
            else:
                if name not in staged:
                    raise KeyError(f"no such alias: {name}")
                del staged[name]
        self._aliases = staged  # single-assignment commit

    def aliases(self) -> list[str]:
        return sorted(self._aliases)

    # -- reads through an alias -------------------------------------------
    def resolve(self, name: str) -> tuple[LogicalIndex, DataFrame | None]:
        """The alias's union index (merged global stats) + its filter."""
        a = self._aliases[name]
        return union_indexes(list(a.indexes)), a.doc_filter

    def search(
        self, name: str, queries, k: int = 10,
        analyzer: str = "simple_code",
    ) -> DataFrame:
        """BM25 top-k through the alias.  The filter (if any) restricts
        the postings by a broadcast semi-join BEFORE scoring and before
        the top-k cut; term/corpus statistics remain the full union's —
        ES filtered-alias scoring exactly."""
        from ..query.bm25 import bm25_topk

        union, doc_filter = self.resolve(name)
        if doc_filter is None:
            return bm25_topk(union, queries, k=k, analyzer=analyzer)
        stats = union.corpus_stats  # force: stats from the UNFILTERED union
        filtered = LogicalIndex(
            postings=union.postings.join(
                F.broadcast(doc_filter.select("doc_id")), "doc_id",
                "left_semi",
            ),
            term_stats=union.term_stats,
            doc_lengths=union.doc_lengths,
            _corpus_stats=stats,
        )
        return bm25_topk(filtered, queries, k=k, analyzer=analyzer)
