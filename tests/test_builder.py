import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
    STEP_REGISTRY,
    build_pipeline,
    register_step,
)


def test_config_pipeline_end_to_end():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["tool", "user", "tool"],
        "text": ["2023-01-01T00:00:00Z ERROR tool=calc status=error latency_ms=900 msg=x",
                 "hello", "bad line"],
        "tool": ["calc", "", "calc"],
    }))
    steps = [
        {"type": "regex_parser",
         "pattern": r"^(?P<ts>\S+) (?P<level>[A-Z]+) tool=(?P<tool_name>\w+) "
                    r"status=(?P<status>\w+) latency_ms=(?P<latency_ms>\d+) msg=(?P<msg>.*)$",
         "if": 'role == "tool"'},
        {"type": "severity_parser", "parse_from": "attr_level"},
        {"type": "transform", "statements": ['set(attributes["n"], Len(text))'],
         "error_mode": "ignore"},
        {"type": "router", "routes": [["errors", 'attributes["status"] == "error"']]},
    ]
    out = build_pipeline(ds, steps).to_pandas().sort_values(["conv_id", "turn_idx"])
    assert list(out.route_id) == ["errors", "default", "default"]
    assert out.severity_number.tolist()[0] == 17
    assert out.parse_failure.tolist() == [False, False, True]


def test_register_custom_step():
    import ray.data as rd

    @register_step("add_constant")
    def _factory(cfg):
        def stage(t: pa.Table) -> pa.Table:
            return t.append_column(cfg["name"], pa.repeat(pa.scalar(cfg["value"]), t.num_rows))
        return stage

    assert "add_constant" in STEP_REGISTRY
    ds = rd.from_arrow(pa.table({"x": [1, 2]}))
    out = build_pipeline(ds, [{"type": "add_constant", "name": "k", "value": "v"}])
    assert out.to_pandas().k.tolist() == ["v", "v"]


def test_bench_smoke_subprocess():
    """The driver runs bench.py every round — keep its contract green."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001",
               RAY_GRAFT_CPUS="4", GRAFT_BENCH_HEADLINE_ONLY="1",
               GRAFT_BENCH_REPEAT="1")
    out = subprocess.run([sys.executable, "/root/repo/bench.py"], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "sec" and rec["turns"] == 2000
    assert rec["value"] > 0 and rec["turns_per_sec"] > 0


def test_builder_tail_steps_container_syslog_flatten_recombine():
    import pyarrow as pa
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    # container + syslog parser steps
    ds = rd.from_arrow(pa.table({"conv_id": ["c1", "c1"],
                                 "turn_idx": pa.array([0, 1], pa.int32()),
                                 "text": [
        '{"log":"hello\n","stream":"stdout","time":"2024-01-01T00:00:01Z"}',
        "2024-01-01T00:00:02.000000000Z stderr F world"]}))
    out = build_pipeline(ds, [{"type": "container_parser"}]).to_pandas()
    assert list(out.attr_log) == ["hello", "world"]

    sy = rd.from_arrow(pa.table({"text": [
        "<34>Oct 11 22:14:15 h su[1]: m"]}))
    out = build_pipeline(sy, [{"type": "syslog_parser"}]).to_pandas()
    assert out.attr_hostname[0] == "h"

    # flatten: JSON-string field expands, parent dropped
    js = rd.from_arrow(pa.table({
        "attr_nested": ['{"a": 1, "b": {"c": 2}}', None]}))
    out = build_pipeline(js, [{"type": "flatten",
                               "field": 'attributes["nested"]'}]).to_pandas()
    assert "attr_nested" not in out.columns
    assert out.attr_a[0] == 1 and out.attr_b[0] == '{"c": 2}'

    # recombine as a declarative DatasetStep
    conv = rd.from_arrow(pa.table({
        "conv_id": ["x", "x", "y"],
        "turn_idx": pa.array([1, 0, 0], pa.int32()),
        "text": ["second", "first", "only"]}))
    out = build_pipeline(conv, [{"type": "recombine",
                                 "combine_with": " "}]).to_pandas()
    got = dict(zip(out.conv_id, out.combined))
    assert got == {"x": "first second", "y": "only"}


def test_builder_metric_and_multiline_steps():
    import pyarrow as pa
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    # metric context statements + extract_count through the config surface
    mt = pa.table({
        "metric_name": ["h", "h"],
        "metric_type": ["Histogram", "Gauge"],
        "metric_aggregation_temporality": ["cumulative", None],
        "value_double": pa.array([None, 3.0], pa.float64()),
        "count": pa.array([7, None], pa.int64()),
    })
    out = build_pipeline(rd.from_arrow(mt), [
        {"type": "metric_transform", "context": "metric",
         "statements": ['convert_gauge_to_sum("delta", true)']},
        {"type": "extract_count_metric", "monotonic": True},
    ]).to_pandas()
    assert "h_count" in set(out.metric_name)
    assert set(out[out.metric_name == "h"].metric_type) == {"Histogram", "Sum"}

    # multiline recombine via config
    lines = rd.from_items([
        {"source": "s", "seq": 0, "text": "BEGIN a"},
        {"source": "s", "seq": 1, "text": "b"},
        {"source": "s", "seq": 2, "text": "BEGIN c"},
    ])
    got = build_pipeline(lines, [
        {"type": "recombine_multiline", "source_identifier": "source",
         "order_col": "seq", "is_first_entry": 'IsMatch(text, "^BEGIN")',
         "combine_with": " "},
    ]).to_pandas()
    got = got.sort_values("entry_idx")
    assert list(got.combined) == ["BEGIN a b", "BEGIN c"]
