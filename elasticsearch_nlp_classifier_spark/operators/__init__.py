from .dedup import (  # noqa: F401
    dedup_by_clusters,
    dedup_paragraphs,
    dup_clusters,
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    remove_repeated_spans,
    repeated_kgram_spans,
    shingle_table,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from .bloom import (  # noqa: F401
    bloom_seen_udf,
    build_content_bloom,
    dedup_against_history,
)
from .chunk import chunk_documents  # noqa: F401
from .sketch import cms_build, cms_query, heavy_hitters  # noqa: F401
from .timejoin import asof_join, range_join  # noqa: F401
from .pq import (  # noqa: F401
    ivfpq_build,
    ivfpq_topk,
    pq_adc_topk,
    pq_encode,
    pq_train_codebooks,
)
from .domains import (  # noqa: F401
    domain_quota,
    domain_stats,
    extract_domain,
    filter_blocked_domains,
    registered_domain,
)
from .bpe import bpe_encode, train_bpe, word_histogram  # noqa: F401
from .decontaminate import decontaminate, ngram_contamination  # noqa: F401
from .lm import bigram_logprob, perplexity_filter  # noqa: F401
from .packing import pack_mapping, pack_tokens  # noqa: F401
from .webclean import clean_web_docs, normalize_unicode, strip_html  # noqa: F401
from .multimodal import (  # noqa: F401
    extract_features,
    extract_frames,
    frame_sample_plan,
    resize_images,
    synthetic_media,
)
from .anomaly import anomaly_detect  # noqa: F401
from .regression import (  # noqa: F401
    fit_linear,
    fit_simple,
    predict_linear,
    regression_eval,
)
from .outliers import knn_table, outlier_scores  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_filtered,
    embedding_cosine_dup_pairs,
    ivf_candidates,
    ivf_cosine_topk,
    ivf_train_centroids,
    lsh_candidates,
    lsh_cosine_topk,
    semantic_dedup,
    semantic_dedup_pairs,
)
from .textstats import (  # noqa: F401
    bpe_ish_token_count,
    document_fingerprints,
    lang_id,
    quality_stats,
    token_count,
)
from .quality import (  # noqa: F401
    gopher_quality,
    ngram_repetition_stats,
    repetition_stats_sql,
    shape_stats,
)
from .redact import PII_PATTERNS, pii_stats, redact_pii  # noqa: F401
from .sampling import (  # noqa: F401
    cluster_safe_split,
    hash_split,
    hash_split_sql,
    hash_uniform,
    hash_uniform_sql,
    resample_to_mix,
    stratified_exact_n,
    stratified_sample,
    uniform_top_n,
)
from .feathash import hash_bucket, hashed_tfidf  # noqa: F401
from .sharding import (  # noqa: F401
    global_shuffle,
    shard_assignment,
    write_shards,
)
from .dsir import dsir_bucket_counts, dsir_select, dsir_weights  # noqa: F401
