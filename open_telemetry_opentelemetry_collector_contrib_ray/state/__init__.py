from .checkpoint import run_resumable, shard_complete, shard_inputs  # noqa: F401
from .dbstorage import DbStorage  # noqa: F401
from .lineage import (  # noqa: F401
    LineageRecorder,
    counts_from_lineage,
    summarize_lineage,
)
from .epochs import dedup_epoch, dedup_state_view, list_epochs  # noqa: F401
from .incremental import incremental_dedup  # noqa: F401
