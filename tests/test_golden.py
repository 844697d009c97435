"""Golden-file tests (FIXTURES.md F5): run the vectorized engine over a
committed input parquet and compare row-for-row against expected sink
parquet produced by the independent row-wise reference interpreter
(tools/make_golden.py) — the plogtest.CompareLogs analog
(/root/reference/pkg/pdatatest/plogtest/logs.go:18): sort by
(conv_id, turn_idx), exact on everything else."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "routing_2k")


def _engine_sinks():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.flagship import (
        FLAGSHIP_ROUTES,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        make_tool_log_parser,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
        RouteIdStage,
    )

    ds = rd.read_parquet(os.path.join(GOLDEN, "input.parquet"))
    ds = ds.map_batches(make_tool_log_parser(), batch_format="pyarrow")
    ds = ds.map_batches(RouteIdStage(FLAGSHIP_ROUTES, default="default"),
                        batch_format="pyarrow")
    df = ds.to_pandas()
    return {sink: g[["conv_id", "turn_idx", "text"]]
                 .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            for sink, g in df.groupby("route_id")}


def test_golden_routed_row_equality():
    got = _engine_sinks()
    expected_sinks = [f[:-8] for f in os.listdir(os.path.join(GOLDEN, "expected"))
                      if f.endswith(".parquet")]
    assert set(got) == set(expected_sinks)
    for sink in expected_sinks:
        exp = pq.read_table(os.path.join(GOLDEN, "expected", f"{sink}.parquet")) \
            .to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(got[sink], exp, check_dtype=False)


def test_golden_per_sink_counts():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.flagship import (
        FLAGSHIP_ROUTES,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        make_tool_log_parser,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
        RouteIdStage,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        grouped_count,
    )

    ds = rd.read_parquet(os.path.join(GOLDEN, "input.parquet"))
    ds = ds.map_batches(make_tool_log_parser(), batch_format="pyarrow")
    ds = ds.map_batches(RouteIdStage(FLAGSHIP_ROUTES, default="default"),
                        batch_format="pyarrow")
    got = grouped_count(ds, ["route_id", "role"], alias="n").to_pandas()
    got_map = {(r.route_id, r.role): int(r.n) for r in got.itertuples()}
    with open(os.path.join(GOLDEN, "expected_counts.json")) as f:
        exp = json.load(f)
    exp_map = {(sink, role): n for sink, roles in exp.items()
               for role, n in roles.items()}
    assert got_map == exp_map


def test_golden_dedup_equality():
    """logdedup golden (processor/logdedupprocessor/processor_test.go:153-171
    analog): engine dedup output == python dict interpreter output."""
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        dedup_exact,
    )

    case = os.path.join(os.path.dirname(__file__), "golden", "dedup_2k")
    ds = rd.read_parquet(os.path.join(case, "input.parquet"))
    got = dedup_exact(ds, ["conv_id", "role", "text"]).to_pandas()
    exp = pq.read_table(os.path.join(case, "expected_dedup.parquet")).to_pandas()
    key = ["conv_id", "role", "text"]
    cols = key + ["log_count", "first_observed", "last_observed",
                  "representative_turn_idx"]
    got = got[cols].sort_values(key).reset_index(drop=True)
    exp = exp[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
