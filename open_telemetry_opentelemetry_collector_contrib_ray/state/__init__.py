from .checkpoint import run_resumable, shard_complete, shard_inputs  # noqa: F401
from .lineage import (  # noqa: F401
    LineageRecorder,
    counts_from_lineage,
    summarize_lineage,
)
