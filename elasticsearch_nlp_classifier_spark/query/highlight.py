"""ES-style highlighting: snippet extraction with match markup.

The ES ``highlight`` API returns, per hit, text fragments with query
matches wrapped in ``<em>`` tags.  This re-expresses the common form
(unified highlighter, one fragment, analyzed term matching) as pure
JVM expressions — ``lower``/``locate``/``substring``/
``regexp_replace`` inside whole-stage codegen, no Python in the row
path, and every step has a DuckDB twin for the oracle.

Semantics:

1. The query is analyzed with the same chain as the index (so
   highlighting agrees with what matched).
2. Fragment = ``fragment_size`` chars of the original text starting
   ``lead`` chars before the first term occurrence
   (case-insensitive; ES centers fragments on match boundaries the
   same way).
3. Every whole-word, case-insensitive occurrence of any query term
   inside the fragment is wrapped in ``pre_tag``/``post_tag``.

Scale shape: a narrow map over the hits — no shuffle, no join; in a
real query pipeline this runs after the top-k cut, so it touches k
rows, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["highlight"]


def highlight(
    hits: DataFrame,
    query: str,
    text_col: str = "text",
    analyzer: str = "code",
    fragment_size: int = 150,
    lead: int = 40,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Add a ``highlight`` column to ``hits``: one fragment of
    ``text_col`` around the first query-term match, all term
    occurrences wrapped in tags.  Rows whose text contains no query
    term get a null highlight (ES omits the highlight field there).
    """
    from ..analyzer.chain import get_analyzer

    terms = sorted(set(get_analyzer(analyzer).tokenize(query)))
    if not terms:
        return hits.withColumn("highlight", F.lit(None).cast("string"))
    for t in terms:
        if not t.isalnum():
            raise ValueError(f"non-alphanumeric analyzed term {t!r}")

    text = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(text)
    # first case-insensitive occurrence across all terms (locate is
    # 1-based; 0 = not found)
    positions = [F.locate(t, low) for t in terms]
    first = F.least(*[F.when(p > 0, p) for p in positions]) \
        if len(positions) > 1 else F.when(positions[0] > 0, positions[0])
    start = F.greatest(F.lit(1), first - F.lit(lead))
    fragment = F.substring(text, start, fragment_size)
    pattern = "(?i)\\b(" + "|".join(terms) + ")\\b"
    marked = F.regexp_replace(fragment, pattern,
                              pre_tag + "$1" + post_tag)
    return hits.withColumn(
        "highlight", F.when(first.isNotNull(), marked)
    )
