from .bm25 import (  # noqa: F401
    analyze_queries,
    bm25_topk,
    bool_query_topk,
    match_filter,
)
from .compound import (  # noqa: F401
    boosting_topk,
    constant_score_topk,
    dis_max_topk,
    multi_match_topk,
)
from .highlight import highlight  # noqa: F401
from .rrf import hybrid_search_topk, rrf_fuse  # noqa: F401
from .suggest_phrase import phrase_suggest  # noqa: F401
from .oracle import bm25_oracle  # noqa: F401
from .percolate import (  # noqa: F401
    percolate,
    percolate_scored,
    register_queries,
)
from .rescore import function_score, rescore_phrase  # noqa: F401
from .search import (  # noqa: F401
    collapse_inner_hits,
    collapse_topk,
    composite_agg,
    search_after,
    sliced_scan,
)
from .phrase import match_phrase, positional_postings, span_near  # noqa: F401
from .wand import wand_topk  # noqa: F401
from .fuzzy import fuzzy_expand, fuzzy_topk  # noqa: F401
from .wand import topk_from_pairs  # noqa: F401
from .aggs import (  # noqa: F401
    adjacency_matrix_agg,
    auto_date_histogram_agg,
    bucket_sort_agg,
    cardinality_agg,
    cumulative_sum_agg,
    date_histogram_agg,
    date_range_agg,
    derivative_agg,
    diversified_sampler_agg,
    sampler_agg,
    extended_stats_agg,
    filters_agg,
    histogram_agg,
    max_bucket_agg,
    median_absolute_deviation_agg,
    min_bucket_agg,
    missing_agg,
    moving_avg_agg,
    percentiles_agg,
    multi_terms_agg,
    range_agg,
    rare_terms_agg,
    serial_diff_agg,
    significant_terms,
    significant_text,
    stats_agg,
    stats_bucket_agg,
    terms_agg,
    top_hits_agg,
    top_metrics_agg,
    value_count_agg,
    weighted_avg_agg,
)
from .graph import graph_explore  # noqa: F401
from .late_interaction import (  # noqa: F401
    maxsim_rerank_ivf,
    maxsim_topk,
    split_vectors,
)
from .rank_eval import rank_eval  # noqa: F401
from .rollup import (  # noqa: F401
    build_rollup,
    rollup_query,
)
from .mlt import (  # noqa: F401
    completion_suggest,
    mlt_terms,
    more_like_this,
    prefix_topk,
    regexp_topk,
    suggest_terms,
    wildcard_topk,
)
from .phrase import match_phrase_prefix  # noqa: F401
from .rescore import decay_score, random_score  # noqa: F401
from .spans import (  # noqa: F401
    intervals_match,
    span_containing,
    span_first,
    span_multi,
    span_not,
    span_or,
    span_within,
)
from .aggs import (  # noqa: F401
    boxplot_agg,
    matrix_stats_agg,
    scripted_metric_agg,
    string_stats_agg,
    t_test_agg,
)
from .geo import (  # noqa: F401
    geo_bounding_box_query,
    geo_bounds_agg,
    geo_centroid_agg,
    geo_distance_agg,
    geo_distance_query,
    geohash_grid_agg,
    geohash_key,
    geohash_key_sql,
    geo_polygon_contains,
    geo_polygon_sql,
    geo_shape_query,
    geotile_grid_agg,
    haversine_km,
)
from .aggs import (  # noqa: F401
    bucket_correlation_agg,
    bucket_count_ks_test_agg,
    change_point_agg,
    ip_prefix_agg,
    random_sampler_agg,
    random_sampler_counts,
)
from .api import terms_enum, with_runtime_fields  # noqa: F401
from .parent_child import (  # noqa: F401
    children_agg,
    has_child,
    has_parent,
    parent_id_query,
)
from .api import (  # noqa: F401
    analyze_api,
    count_api,
    profile_search,
    field_caps,
    mget,
    msearch,
    render_search_template,
    validate_query,
)
from .aggs import (  # noqa: F401
    global_agg,
    ip_numeric,
    ip_range_agg,
    percentile_ranks_agg,
)
from .compound import cross_fields_topk  # noqa: F401
from .aggs import (  # noqa: F401
    bucket_script_agg,
    bucket_selector_agg,
    normalize_agg,
    percentiles_bucket_agg,
)
from .eql import eql_sample, eql_sequence  # noqa: F401
from .aggs import (  # noqa: F401
    categorize_text_agg,
    cumulative_cardinality_agg,
    frequent_item_sets_agg,
    moving_fn_agg,
    nested_terms_agg,
    rate_agg,
    reverse_nested_agg,
    variable_width_histogram_agg,
)
from .parent_child import parent_agg  # noqa: F401
from .sparse import (  # noqa: F401
    sparse_vector_topk,
    text_expansion_features,
)
from .esql import esql, EsqlError  # noqa: F401
from .retriever import RetrieverContext, retrieve  # noqa: F401
from .similarity_modules import similarity_topk  # noqa: F401
from .aggs import terms_agg_subs  # noqa: F401
from .dsl import compile_query_node, es_search  # noqa: F401
from .rescore import decay_score_geo  # noqa: F401
from .ltr import ltr_features, ltr_rescore, train_ltr  # noqa: F401
from .search import indices_boost_topk  # noqa: F401
