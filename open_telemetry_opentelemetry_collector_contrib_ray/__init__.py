"""Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the data-processing capabilities of
the OpenTelemetry Collector Contrib (reference: /root/reference,
`michaelsafyan/open-telemetry.opentelemetry-collector-contrib`) as an
idiomatic `ray.data.Dataset` pipeline: parse -> enrich -> route ->
aggregate over Parquet tables of multi-turn conversation transcripts.

Nothing here is a port: the reference is a push-based Go engine over
mutable nested pdata batches; this engine is a lazy, streaming,
columnar Arrow engine.  See SURVEY.md for the semantic mapping.
"""

__version__ = "0.1.0"

import os as _os

# polars sizes its Rust thread pool to ALL cores per process; under Ray's
# one-process-per-cpu worker model that oversubscribes the node 32x.  One
# thread per worker is correct — parallelism comes from Ray tasks.  Must
# be set before the first polars import anywhere in the process.
if _os.environ.get("GRAFT_POLARS_CAP", "1") == "1":
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")

from . import functions, pipelines, sources, stages, state  # noqa: F401
