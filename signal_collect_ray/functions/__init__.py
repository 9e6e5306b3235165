from signal_collect_ray.functions.aggregations import (
    profile_columns,
    sum_of_states,
    product_of_states,
    count_vertices,
    sample_vertex_ids,
    top_k,
    grouped_top_k,
    exact_quantiles_int,
    grouped_quantiles_int,
    id_state_map,
    map_reduce,
    foreach_vertex,
    for_vertex_with_id,
    multi_aggregate,
    rollup_aggregate,
)
from signal_collect_ray.functions.text import (
    LanguageId,
    QualityScore,
    TokenCount,
    Fingerprint,
    RepetitionScore,
    ChunkDocuments,
    PiiScrub,
    EntropyScore,
    analyze_documents,
    curate_corpus,
    tfidf_top_terms,
    top_bigrams,
    unigram_logprob,
    bigram_logprob,
)
from signal_collect_ray.functions.models import (
    LinearTextClassifier,
    classify_documents,
    synthetic_weights,
)
from signal_collect_ray.functions.sketches import (
    approx_distinct,
    approx_distinct_by_key,
    bloom_build,
    bloom_contains,
    bloom_drop_ids,
    heavy_hitters,
    cm_build,
    cm_estimate,
)
from signal_collect_ray.functions.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    jaccard_verify,
    dedup_minhash,
    ngram_jaccard_pairs,
    simhash_signatures,
    duplicated_ngram_fraction,
    dedup_paragraphs,
)
from signal_collect_ray.functions.windows import (
    sessionize,
    tumbling_window,
    sliding_window,
    running_totals,
)
from signal_collect_ray.functions.analytics import (
    inter_event_gaps,
    cohort_retention,
    cooccurring_event_pairs,
    week_floor_us,
    gini_concentration,
    time_decayed_sum,
)
from signal_collect_ray.functions.joins import (
    asof_join,
    broadcast_join,
    hash_join,
    interval_join,
)
from signal_collect_ray.functions.sampling import hash_sample, stratified_sample
from signal_collect_ray.functions.similarity import (
    knn_brute_force,
    lsh_buckets,
    embedding_dedup_cosine,
    vector_mean_by_key,
    pca_top_component,
    pca_project,
    kmeans_lloyd,
)
from signal_collect_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    synthesize_media_table,
    media_from_documents,
    MediaFeatureExtractor,
    extract_media_features,
)

__all__ = [
    "sum_of_states", "product_of_states", "count_vertices",
    "sample_vertex_ids", "top_k", "grouped_top_k", "rollup_aggregate",
    "exact_quantiles_int", "grouped_quantiles_int",
    "id_state_map", "map_reduce",
    "foreach_vertex", "for_vertex_with_id", "multi_aggregate",
    "LanguageId", "QualityScore", "TokenCount", "Fingerprint",
    "RepetitionScore", "ChunkDocuments", "PiiScrub", "EntropyScore",
    "analyze_documents", "curate_corpus", "tfidf_top_terms",
    "top_bigrams", "unigram_logprob", "bigram_logprob",
    "LinearTextClassifier", "classify_documents", "synthetic_weights",
    "approx_distinct", "approx_distinct_by_key",
    "bloom_build", "bloom_contains", "bloom_drop_ids", "heavy_hitters",
    "cm_build", "cm_estimate", "pca_top_component", "pca_project", "kmeans_lloyd",
    "profile_columns",
    "dedup_exact", "minhash_lsh_candidates", "jaccard_verify",
    "dedup_minhash", "ngram_jaccard_pairs", "simhash_signatures",
    "duplicated_ngram_fraction", "dedup_paragraphs",
    "sessionize", "tumbling_window", "sliding_window", "running_totals",
    "inter_event_gaps", "cohort_retention", "cooccurring_event_pairs",
    "week_floor_us", "gini_concentration", "time_decayed_sum",
    "asof_join", "broadcast_join", "hash_join", "interval_join",
    "hash_sample", "stratified_sample",
    "knn_brute_force", "lsh_buckets", "embedding_dedup_cosine",
    "vector_mean_by_key",
    "MEDIA_SCHEMA", "synthesize_media_table", "media_from_documents",
    "MediaFeatureExtractor", "extract_media_features",
]
