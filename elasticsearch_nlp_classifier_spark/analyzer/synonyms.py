"""Synonym token filter — the ES analysis-chain feature
(``synonym``/``synonym_graph``) available on any index the reference's
client writes to (its own chain — reference
`src/main/java/com/jamesmcguigan/nlp/utils/tokenize/NLPTokenizer.java` —
stops at stopwords+stemming; this completes the standard filter set),
in its two standard modes:

- **canonicalize** (contraction, ``a, b => c``): rewrite every synonym
  to its canonical form.  Applied at INDEX time (and identically at
  query time) it makes all synonyms match each other while keeping one
  postings entry per group — the cheap mode at scale.
- **expand** (``a => a, b, c``): replace a token with its whole group.
  Applied at QUERY time only, it widens a match without reindexing.

Both are pure Catalyst higher-order expressions over a token array (a
broadcast-free CASE chain for the dictionary sizes analyzers use;
SQL-expressible for the oracle).  For dictionaries too large to inline
(>~10^3 entries) use an explode + broadcast-join rewrite instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_tokens(
    tokens: Column, canon: dict[str, str]
) -> Column:
    """Map each token to its canonical synonym (identity when absent)."""
    if not canon:
        return tokens

    def one(t: Column) -> Column:
        expr = None
        for src, dst in sorted(canon.items()):
            cond = t == F.lit(src)
            expr = (F.when(cond, F.lit(dst)) if expr is None
                    else expr.when(cond, F.lit(dst)))
        return expr.otherwise(t)

    return F.transform(tokens, one)


def expand_tokens(tokens: Column, groups: dict[str, list[str]]) -> Column:
    """Replace each token with its synonym group (flattened, original
    kept first); tokens without a group pass through."""
    if not groups:
        return tokens

    def one(t: Column) -> Column:
        expr = None
        for src, alts in sorted(groups.items()):
            out = [src] + [a for a in alts if a != src]
            cond = t == F.lit(src)
            val = F.array(*[F.lit(x) for x in out])
            expr = (F.when(cond, val) if expr is None
                    else expr.when(cond, val))
        return expr.otherwise(F.array(t))

    return F.flatten(F.transform(tokens, one))


def expand_query_terms(
    terms: list[str], groups: dict[str, list[str]]
) -> list[str]:
    """Driver-side query-time expansion: the analyzed query term list
    widened by synonym groups (deduped, sorted — deterministic)."""
    out = set()
    for t in terms:
        out.add(t)
        out.update(groups.get(t, ()))
    return sorted(out)
