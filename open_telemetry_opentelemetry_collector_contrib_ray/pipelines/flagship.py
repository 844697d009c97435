"""The flagship parse -> enrich -> route -> aggregate pipeline.

End-to-end analog of a collector service pipeline (SURVEY.md §3.1):
filelog receiver + stanza parsers -> transform/attributes processors ->
routing connector -> count connector + file exporter, re-expressed as
one lazy Ray Data plan:

    read_parquet (transcripts)
      -> map_batches(RegexParser)        # stanza regex_parser, on_error=send
      -> map_batches(SeverityParser)     # severity enum mapping
      -> map_batches(LookupEnricher)     # k8sattributes-style broadcast lookup
      -> map_batches(TransformStage)     # OTTL statements
      -> map_batches(RouteIdStage)       # routingconnector match_once
      -> write_parquet(partition_cols=[route_id])   # fileexporter group_by
      &  grouped_count(...)              # countconnector per-sink counts

Everything streams; nothing materializes the full corpus.
"""

from __future__ import annotations

from ..sources.transcripts import TOOL_CATALOG, read_transcripts
from ..stages.enrich import LookupEnricher
from ..stages.parse import SeverityParser, make_tool_log_parser
from ..stages.route import Route, RouteIdStage
from ..stages.transform import TransformStage

# FIXTURES.md F3 routing table (priority order; first match wins)
FLAGSHIP_ROUTES = [
    Route("errors", 'attributes["status"] == "error"'),
    Route("slow", 'role == "tool" and attributes["latency_ms"] > 500'),
    Route("timeouts", 'IsMatch(text, "(?i)timeout")'),
]

FLAGSHIP_STATEMENTS = [
    'set(attributes["text_len"], Len(text))',
    'set(attributes["latency_bucket"], "high") where attributes["latency_ms"] > 1000',
    'set(attributes["latency_bucket"], "low") where attributes["latency_ms"] <= 1000',
    'set(attributes["is_tool_turn"], role == "tool")',
]


class FlagshipStage:
    """All five per-batch stages fused into one callable: parse ->
    severity -> enrich -> transform -> route.

    One map_batches operator instead of five: fewer per-batch function
    hops and intermediate table rebuilds.  Still a class so the compiled
    regexes / catalog arrays / compiled statements build once per worker
    (task-pool) or per actor (pass ``concurrency=`` to map_batches for an
    actor pool — the geoip/k8sattributes pattern for heavyweight assets;
    this catalog is small enough for task mode)."""

    def __init__(self, lookup=None):
        self.stages = [
            make_tool_log_parser(),
            SeverityParser(parse_from="attr_level"),
            LookupEnricher(
                lookup or TOOL_CATALOG,
                key_col="tool",
                defaults={"tool_category": "other", "owner": "unknown", "risk_level": 0},
            ),
            TransformStage(FLAGSHIP_STATEMENTS, error_mode="ignore"),
            RouteIdStage(FLAGSHIP_ROUTES, default="default"),
        ]

    def __call__(self, batch):
        for stage in self.stages:
            batch = stage(batch)
        return batch


def build_flagship(sf_dir: str, parallelism_hint: int | None = None):
    """The routed dataset (lazy) with all stages applied."""
    ds = read_transcripts(sf_dir)
    return ds.map_batches(FlagshipStage(), batch_format="pyarrow")


def flagship_sink_counts(sf_dir: str):
    """Per-sink x role record counts (countconnector conformance surface)."""
    from ..stages.aggregate import grouped_count

    ds = build_flagship(sf_dir)
    return grouped_count(ds, ["route_id", "role"], alias="n")


def run_flagship(sf_dir: str, out_dir: str, lineage: bool = True):
    """Full pipeline with routed partitioned sink + per-batch lineage
    sidecars; returns (out_dir, lineage_dir).  Per-sink counts come free
    from the lineage (counts_from_lineage) — one pass over the data."""
    from ..state.lineage import LineageRecorder

    ds = read_transcripts(sf_dir)
    stage = FlagshipStage()
    lineage_dir = out_dir + "_lineage"
    fn = LineageRecorder(stage, lineage_dir) if lineage else stage
    ds = ds.map_batches(fn, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["route_id"], compression="zstd")
    return out_dir, lineage_dir


def run_flagship_resumable(sf_dir: str, out_root: str, n_shards: int = 8):
    """Checkpoint-resumable flagship: input parquet files are sharded;
    each shard runs the full pipeline into its own atomically-renamed
    directory with a manifest + lineage — a rerun skips finished shards
    (north rule: resumable from checkpoint with per-partition lineage)."""
    import os

    import ray.data as rd

    from ..sources.transcripts import ensure_transcripts
    from ..state.checkpoint import run_resumable
    from ..state.lineage import LineageRecorder, summarize_lineage

    path = ensure_transcripts(sf_dir)
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))

    def run_shard(shard_files: list[str], tmp_dir: str) -> dict:
        lineage_dir = os.path.join(tmp_dir, "_lineage")
        ds = rd.read_parquet(shard_files)
        ds = ds.map_batches(LineageRecorder(FlagshipStage(), lineage_dir),
                            batch_format="pyarrow")
        ds.write_parquet(os.path.join(tmp_dir, "data"), partition_cols=["route_id"], compression="zstd")
        return summarize_lineage(lineage_dir)

    return run_resumable(files, out_root, run_shard, n_shards=n_shards)


def sink_counts_from_output(out_dir: str):
    """countconnector counts computed FROM the routed sink: a
    column-pruned read-back of (route_id via hive partition, role) —
    avoids re-executing the whole DAG just to count it."""
    import ray.data as rd

    from ..stages.aggregate import grouped_count

    ds = rd.read_parquet(out_dir, columns=["role", "route_id"])
    return grouped_count(ds, ["route_id", "role"], alias="n")
