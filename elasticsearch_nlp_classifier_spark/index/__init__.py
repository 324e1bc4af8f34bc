from .build import LogicalIndex, build_logical_index, term_vector_tokens, term_vectors, tokenize_docs, vocabulary  # noqa: F401
