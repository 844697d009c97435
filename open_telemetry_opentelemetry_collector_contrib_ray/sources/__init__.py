from .transcripts import (  # noqa: F401
    TOOL_CATALOG,
    ensure_transcripts,
    read_transcripts,
    synth_transcripts,
    transcripts_path,
)
