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
