from .aggregate import (  # noqa: F401
    adjacent_pairs,
    bucketed_group_transform,
    funnel,
    retention_cohorts,
    conversation_policy_filter,
    cumulative_to_delta,
    dedup_exact,
    dedup_exact_sorted,
    delta_to_cumulative,
    grouped_agg,
    grouped_count,
    grouped_quantile,
    grouped_sum,
    grouped_top_k,
    histogram_agg,
    recombine,
    recombine_multiline,
    recombine_salted,
    recombine_sorted,
    sessionize,
    sliding_window_agg,
    stratified_sample,
)
from .enrich import (  # noqa: F401
    AttributesStage,
    LookupEnricher,
    RedactionStage,
    ResourceStamper,
    SchemaRenameStage,
)
from .join import (  # noqa: F401
    asof_join,
    bucketed_hash_join,
    native_join,
    range_join,
)
from .tailsampling import (  # noqa: F401
    tail_sample,
    tail_sample_decisions,
)
from .parse import (  # noqa: F401
    ContainerParser,
    CsvParser,
    GrokParser,
    JsonArrayParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    ScopeParser,
    SeverityParser,
    SyslogParser,
    TimeParser,
    TraceParser,
    UriParser,
    reassemble_container_partials,
    make_tool_log_parser,
)
from .route import (  # noqa: F401
    Route,
    RouteIdStage,
    split_match_all,
    split_match_once,
    write_routed,
)
from .sample import (  # noqa: F401
    HashBucketStage,
    ProbabilisticSampler,
    budget_sample,
    deterministic_shuffle,
    weighted_sample,
)
from .metrics import (  # noqa: F401
    aggregate_on_attribute_value,
    aggregate_on_attributes,
    copy_metric,
    extract_count_metric,
    extract_sum_metric,
)
from .transform import FilterStage, KeepStage, TransformStage  # noqa: F401
from .dedup import (  # noqa: F401
    MinHasher,
    SimHasher,
    cluster_keep_best,
    dedup_against,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_verify,
    simhash_pairs,
)
from .multimodal import (  # noqa: F401
    FrameSampler,
    ImageDecoder,
    ImageFeatureExtractor,
    synth_image_table,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_build,
    ivf_build_partitioned,
    ivf_query,
    ivf_query_partitioned,
    ivf_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from .sketch import (  # noqa: F401
    HLL,
    approx_distinct,
    approx_distinct_grouped,
    approx_top_k,
)
from .textstats import Fingerprint, LanguageId, QualityScore, TokenCount  # noqa: F401
from .relevance import (  # noqa: F401
    BM25Scorer,
    bm25,
    corpus_stats,
    tfidf_keywords,
    token_df,
)
from .cluster import (  # noqa: F401
    cluster_sizes,
    kmeans_assign,
    kmeans_fit,
    seed_centroids,
)
from .window import WindowSpec, grouped_window  # noqa: F401
from .classifier import (  # noqa: F401
    HashedLinearScorer,
    classify_docs,
    deterministic_weights,
)
from .lmscore import (  # noqa: F401
    DualNgramScorer,
    NgramScorer,
    build_ngram_model,
    dsir_select,
    lm_familiarity,
)
from .textfilters import (  # noqa: F401
    C4DocFilter,
    LineFilter,
    TextNormalizer,
    c4_filter,
    chunk_documents,
    dedup_lines,
)
