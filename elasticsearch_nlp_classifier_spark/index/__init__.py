from .build import LogicalIndex, build_logical_index, term_vector_tokens, term_vectors, tokenize_docs, union_indexes, vocabulary  # noqa: F401
from .deletes import compact, delete_docs, deleted_array, deleted_df, live_docs  # noqa: F401
from .blocks import PhysicalIndex, build_physical_index, index_stats  # noqa: F401
from .reindex import reindex  # noqa: F401
from .sorted_index import build_sorted_index, sorted_topk  # noqa: F401
