"""Generate golden test fixtures (FIXTURES.md F5 layout).

tests/golden/<case>/{input.parquet, routes.json, expected/<sink>.parquet,
expected_counts.json}

Expected outputs are produced by a SLOW ROW-WISE reference interpreter
(independent of the vectorized engine — mirrors how the reference's
golden YAML fixtures pin behavior, pkg/golden/golden.go:93-124), so a
vectorization bug cannot silently bless itself.

Run once; outputs are committed.  Deterministic (seeded corpus slice).
"""

from __future__ import annotations

import json
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts import (  # noqa: E402
    synth_transcripts,
)

GOLDEN_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "golden")

TOOL_LINE = re.compile(
    r"^(\S+) ([A-Z]+) tool=(\w+) status=(\w+) latency_ms=(\d+) msg=(.*)$")

ROUTES = [
    ("errors", "status == error"),
    ("slow", "tool and latency > 500"),
    ("timeouts", "text ~ (?i)timeout"),
]


def reference_route(row: dict) -> str:
    """Row-wise interpreter for the flagship routing table (F3)."""
    m = TOOL_LINE.match(row["text"]) if row["role"] == "tool" and row["text"] else None
    status = m.group(4) if m else None
    lat = int(m.group(5)) if m else None
    if status == "error":
        return "errors"
    if row["role"] == "tool" and lat is not None and lat > 500:
        return "slow"
    if row["text"] and re.search("(?i)timeout", row["text"]):
        return "timeouts"
    return "default"


def make_case_routing(case: str = "routing_2k") -> str:
    case_dir = os.path.join(GOLDEN_ROOT, case)
    os.makedirs(os.path.join(case_dir, "expected"), exist_ok=True)
    table = synth_transcripts(2_000)
    pq.write_table(table, os.path.join(case_dir, "input.parquet"))
    with open(os.path.join(case_dir, "routes.json"), "w") as f:
        json.dump([{"name": n, "condition_doc": c} for n, c in ROUTES], f, indent=1)

    rows = table.to_pylist()
    by_sink: dict[str, list[dict]] = {}
    counts: dict[str, dict[str, int]] = {}
    for row in rows:
        sink = reference_route(row)
        by_sink.setdefault(sink, []).append(
            {"conv_id": row["conv_id"], "turn_idx": row["turn_idx"], "text": row["text"]})
        counts.setdefault(sink, {}).setdefault(row["role"], 0)
        counts[sink][row["role"]] += 1
    for sink, sink_rows in by_sink.items():
        sink_rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
        pq.write_table(
            pa.Table.from_pylist(sink_rows,
                                 schema=pa.schema([("conv_id", pa.string()),
                                                   ("turn_idx", pa.int32()),
                                                   ("text", pa.string())])),
            os.path.join(case_dir, "expected", f"{sink}.parquet"))
    with open(os.path.join(case_dir, "expected_counts.json"), "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
    return case_dir


def make_case_dedup(case: str = "dedup_2k") -> str:
    """logdedup golden: identical (conv_id, role, text) -> one
    representative + log_count + first/last observed ts, computed with a
    plain python dict interpreter."""
    case_dir = os.path.join(GOLDEN_ROOT, case)
    os.makedirs(case_dir, exist_ok=True)
    table = synth_transcripts(2_000)
    pq.write_table(table, os.path.join(case_dir, "input.parquet"))
    groups: dict = {}
    for row in table.to_pylist():
        k = (row["conv_id"], row["role"], row["text"])
        g = groups.get(k)
        if g is None:
            groups[k] = {"log_count": 1, "first_observed": row["ts"],
                         "last_observed": row["ts"],
                         "representative_turn_idx": row["turn_idx"]}
        else:
            g["log_count"] += 1
            g["first_observed"] = min(g["first_observed"], row["ts"])
            g["last_observed"] = max(g["last_observed"], row["ts"])
            g["representative_turn_idx"] = min(g["representative_turn_idx"],
                                               row["turn_idx"])
    rows = [{"conv_id": k[0], "role": k[1], "text": k[2], **v}
            for k, v in groups.items()]
    rows.sort(key=lambda r: (r["conv_id"], r["representative_turn_idx"]))
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(case_dir, "expected_dedup.parquet"))
    return case_dir


if __name__ == "__main__":
    print(make_case_routing())
    print(make_case_dedup())
