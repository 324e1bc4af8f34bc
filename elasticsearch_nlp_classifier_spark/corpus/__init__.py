from .doc_ids import assign_doc_ids, doc_ids_oracle  # noqa: F401
from .fixtures import QUERIES, gen_tweets_pdf, queries_pdf  # noqa: F401
from .generator import (  # noqa: F401
    CORPUS_SCHEMA,
    gen_corpus_df,
    gen_corpus_pdf,
    gen_row,
    verify_ingest,
    write_corpus,
)
