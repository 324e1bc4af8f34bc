from .bm25 import analyze_queries, bm25_topk, match_filter  # noqa: F401
from .oracle import bm25_oracle  # noqa: F401
from .phrase import match_phrase, positional_postings  # noqa: F401
from .wand import wand_topk  # noqa: F401
from .fuzzy import fuzzy_expand, fuzzy_topk  # noqa: F401
from .wand import topk_from_pairs  # noqa: F401
from .mlt import (  # noqa: F401
    mlt_terms,
    more_like_this,
    prefix_topk,
    suggest_terms,
    wildcard_topk,
)
