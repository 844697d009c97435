from .aggregate import (  # noqa: F401
    dedup_exact,
    delta_to_cumulative,
    grouped_agg,
    grouped_count,
    grouped_sum,
    histogram_agg,
    recombine,
)
from .enrich import AttributesStage, LookupEnricher, ResourceStamper  # noqa: F401
from .parse import (  # noqa: F401
    CsvParser,
    GrokParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    SeverityParser,
    TimeParser,
    make_tool_log_parser,
)
from .route import (  # noqa: F401
    Route,
    RouteIdStage,
    split_match_all,
    split_match_once,
    write_routed,
)
from .sample import HashBucketStage, ProbabilisticSampler  # noqa: F401
from .transform import FilterStage, KeepStage, TransformStage  # noqa: F401
from .dedup import (  # noqa: F401
    MinHasher,
    SimHasher,
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
from .similarity import brute_force_topk, ivf_topk  # noqa: F401
from .textstats import Fingerprint, LanguageId, QualityScore, TokenCount  # noqa: F401
