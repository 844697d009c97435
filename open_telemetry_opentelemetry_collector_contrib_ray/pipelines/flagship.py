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


def build_flagship(sf_dir: str, parallelism_hint: int | None = None):
    """The routed dataset (lazy) with all stages applied."""
    ds = read_transcripts(sf_dir)
    ds = ds.map_batches(make_tool_log_parser(), batch_format="pyarrow")
    ds = ds.map_batches(SeverityParser(parse_from="attr_level"), batch_format="pyarrow")
    # enrichment is a stateful actor-pool stage: catalog loaded once per actor
    ds = ds.map_batches(
        LookupEnricher,
        fn_constructor_kwargs=dict(
            lookup=TOOL_CATALOG,
            key_col="tool",
            defaults={"tool_category": "other", "owner": "unknown", "risk_level": 0},
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    ds = ds.map_batches(TransformStage(FLAGSHIP_STATEMENTS, error_mode="ignore"),
                        batch_format="pyarrow")
    ds = ds.map_batches(RouteIdStage(FLAGSHIP_ROUTES, default="default"),
                        batch_format="pyarrow")
    return ds


def flagship_sink_counts(sf_dir: str):
    """Per-sink x role record counts (countconnector conformance surface)."""
    from ..stages.aggregate import grouped_count

    ds = build_flagship(sf_dir)
    return grouped_count(ds, ["route_id", "role"], alias="n")


def run_flagship(sf_dir: str, out_dir: str):
    """Full pipeline with routed partitioned sink; returns output dir."""
    ds = build_flagship(sf_dir)
    ds.write_parquet(out_dir, partition_cols=["route_id"])
    return out_dir
