"""PySpark-native inverted-index + BM25 + Naive Bayes engine.

From-scratch re-implementation of the query and data-processing
capabilities of JamesMcGuigan/elasticsearch-nlp-classifier (reference at
/root/reference), rebuilt Spark-first:

- ``analyzer``   : the reference tokenizer chain (Twokenizer split,
                   cleanTwitter, lowercase, stopwords, Porter2 stemming)
                   as vectorized pandas UDFs.
- ``corpus``     : deterministic synthetic source-code corpus generator
                   (FIXTURES.md F1/F2/F3) + sha256 ingest verification.
- ``index``      : inverted-index build — exploded postings, term/field
                   stats, varbyte-compressed docID-delta posting blocks
                   with block-max metadata, salted merge, checkpoints.
- ``query``      : BM25 top-k (DataFrame brute-force and block-max WAND
                   over the compressed index) + query-string compiler.
- ``classifier`` : multinomial Naive Bayes (train / predict / k-fold /
                   enrich), pure DataFrame aggregations.
- ``operators``  : training-data pipeline ops (dedup, similarity search,
                   text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
