"""ES rollover (the ILM hot-phase primitive) over index generations.

``POST /<alias>/_rollover`` is how ES bounds the size of its write
index: when the current generation satisfies ANY condition (doc count,
age, size), a new generation ``<name>-NNNNNN+1`` is created, the WRITE
alias moves to it atomically, and the READ alias keeps spanning every
generation.  The reference's enrichment loop writes through exactly
this kind of alias indirection (its ES cluster owns the policy).

Spark-first analog: generations are this engine's immutable index
builds; the read alias resolves through ``union_indexes`` (merged
global stats, BM25-correct across generations — `index/aliases.py`),
and the cutover reuses ``AliasRegistry.update_aliases``'s
validate-then-single-assignment commit, so a reader never observes a
half-rolled state.  At 100 TB this is the pattern that keeps index
builds incremental: the hot generation stays small enough to rebuild
or compact cheaply while queries see one logical index.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from .aliases import AliasRegistry

__all__ = ["RolloverTarget", "evaluate_rollover_conditions", "rollover"]


@dataclass
class RolloverTarget:
    """A rollover-managed logical index: ordered generations plus the
    two aliases ES maintains (`<name>` reads, `<name>-write` writes)."""
    name: str
    registry: AliasRegistry
    generations: list[tuple[str, object, float]] = field(
        default_factory=list)  # (gen_name, index, created_ts)

    @property
    def write_alias(self) -> str:
        return f"{self.name}-write"

    def add_generation(self, index, created_ts: float) -> str:
        n = 1
        if self.generations:
            m = re.search(r"-(\d+)$", self.generations[-1][0])
            n = int(m.group(1)) + 1 if m else len(self.generations) + 1
        gen_name = f"{self.name}-{n:06d}"
        self.generations.append((gen_name, index, created_ts))
        self._commit_aliases()
        return gen_name

    def _commit_aliases(self) -> None:
        """Both aliases cut over in ONE atomic update_aliases call."""
        self.registry.update_aliases([
            {"add": {"alias": self.name,
                     "indexes": [ix for _, ix, _ in self.generations]}},
            {"add": {"alias": self.write_alias,
                     "indexes": [self.generations[-1][1]]}},
        ])


def evaluate_rollover_conditions(
    index,
    created_ts: float,
    conditions: dict,
    now_s: float,
    doc_count: Callable[[object], int] | None = None,
) -> dict[str, bool]:
    """Per-condition verdicts, ES response shape (``max_docs`` /
    ``max_age_s`` / ``max_postings``).  ``doc_count`` defaults to the
    index's own corpus stats — metadata, not a scan."""
    out: dict[str, bool] = {}
    if "max_docs" in conditions:
        dc = (doc_count(index) if doc_count
              else index.corpus_stats["doc_count"])
        out["max_docs"] = dc >= conditions["max_docs"]
    if "max_age_s" in conditions:
        out["max_age_s"] = (now_s - created_ts) >= conditions["max_age_s"]
    if "max_postings" in conditions:
        out["max_postings"] = (
            index.corpus_stats["sum_doc_freq"] >= conditions["max_postings"])
    return out


def rollover(
    target: RolloverTarget,
    conditions: dict,
    make_index: Callable[[], object],
    now_s: float,
    dry_run: bool = False,
) -> dict:
    """``POST /<alias>/_rollover``: evaluate ``conditions`` against the
    CURRENT write generation; when any holds (or ``conditions`` is
    empty — ES's unconditional rollover), build the next generation via
    ``make_index`` and cut both aliases over atomically.

    Returns the ES response shape: ``{old_index, new_index,
    rolled_over, dry_run, conditions}`` (``new_index`` is the name the
    next generation would get, even on dry runs, like ES)."""
    if not target.generations:
        raise ValueError(f"rollover target '{target.name}' has no "
                         "generations — add_generation first")
    old_name, old_idx, created = target.generations[-1]
    verdicts = evaluate_rollover_conditions(
        old_idx, created, conditions, now_s)
    should = (not conditions) or any(verdicts.values())
    m = re.search(r"-(\d+)$", old_name)
    next_name = f"{target.name}-{int(m.group(1)) + 1:06d}" if m \
        else f"{target.name}-000002"
    resp = {
        "old_index": old_name,
        "new_index": next_name,
        "rolled_over": False,
        "dry_run": dry_run,
        "conditions": verdicts,
    }
    if dry_run or not should:
        return resp
    gen_name = target.add_generation(make_index(), now_s)
    resp["new_index"] = gen_name
    resp["rolled_over"] = True
    return resp
