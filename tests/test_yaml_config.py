"""Collector-style YAML config front-end (pipelines/config.py)."""

import os

import pyarrow.parquet as pq
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.config import (
    load_config,
    run_config,
)

YAML = r"""
receivers:
  generate/small:
    count: 500
processors:
  regex_parser/tool:
    pattern: '^(?P<ts>\S+) (?P<level>[A-Z]+) tool=(?P<tool_name>\w+) status=(?P<status>\w+) latency_ms=(?P<latency_ms>\d+) msg=(?P<msg>.*)$'
    if: 'role == "tool"'
  severity_parser/level:
    parse_from: attr_level
  router/status:
    routes:
      - [errors, 'attributes["status"] == "error"']
    default: ok
exporters:
  collect: {}
  parquet/out:
    path: null   # filled by the test
    partition_cols: [route_id]
service:
  pipelines:
    logs:
      receivers: [generate/small]
      processors: [regex_parser/tool, severity_parser/level, router/status]
      exporters: [collect]
"""


def test_yaml_collect_pipeline():
    out = run_config(YAML)
    ds = out["logs"]["collect"]
    df = ds.to_pandas()
    assert len(df) == 500
    assert set(df.route_id.unique()) <= {"errors", "ok"}
    # parsed tool rows carry severity from the level capture (the corpus
    # plants a few malformed tool lines by design -> parse_failure rows)
    tool = df[df.role == "tool"]
    ok = tool[~tool.parse_failure]
    assert len(ok) > 0.9 * len(tool)
    assert ok.severity_number.notna().all()
    assert tool[tool.parse_failure].severity_number.isna().all()


def test_yaml_parquet_exporter(tmp_path):
    cfg = load_config(YAML)
    cfg["exporters"]["parquet/out"]["path"] = str(tmp_path / "routed")
    cfg["service"]["pipelines"]["logs"]["exporters"] = ["parquet/out"]
    out = run_config(cfg)
    path = out["logs"]["parquet/out"]
    # partitioned by route_id, reference fileexporter group_by layout
    parts = [d for d in os.listdir(path) if d.startswith("route_id=")]
    assert parts
    total = sum(
        pq.read_metadata(os.path.join(path, d, f)).num_rows
        for d in parts for f in os.listdir(os.path.join(path, d)))
    assert total == 500


def test_yaml_errors_are_loud():
    with pytest.raises(KeyError, match="not declared"):
        run_config("""
receivers: {}
service:
  pipelines:
    logs: {receivers: [parquet/x], processors: [], exporters: [collect]}
""")
    with pytest.raises(KeyError, match="no service.pipelines"):
        run_config("receivers: {}\n")
    with pytest.raises(KeyError, match="unknown pipeline step"):
        run_config("""
receivers:
  generate/g: {count: 10}
processors:
  nosuchstep/x: {}
service:
  pipelines:
    logs: {receivers: [generate/g], processors: [nosuchstep/x], exporters: [collect]}
""")


def test_jsonl_csv_text_receivers_and_sinks(tmp_path):
    import json

    import ray.data

    # seed a jsonl file and a raw-text log file
    jl = tmp_path / "in.jsonl"
    jl.write_text("\n".join(json.dumps({"conv_id": f"c{i}", "text": f"m{i}"})
                            for i in range(5)) + "\n")
    tx = tmp_path / "raw.log"
    tx.write_text("alpha line\nbeta line\n")
    cfg = f"""
receivers:
  jsonl/in: {{path: {jl}}}
  text/raw: {{path: {tx}}}
exporters:
  jsonl/out: {{path: {tmp_path}/out_jsonl}}
  csv/out: {{path: {tmp_path}/out_csv}}
  collect: {{}}
service:
  pipelines:
    j:
      receivers: [jsonl/in]
      exporters: [jsonl/out, csv/out, collect]
    t:
      receivers: [text/raw]
      exporters: [collect]
"""
    res = run_config(cfg)
    assert res["j"]["collect"].count() == 5
    assert ray.data.read_json(str(tmp_path / "out_jsonl")).count() == 5
    assert ray.data.read_csv(str(tmp_path / "out_csv")).count() == 5
    rows = res["t"]["collect"].to_pandas()
    assert sorted(rows["text"]) == ["alpha line", "beta line"]


def test_cli_main_runs_config(tmp_path):
    """python -m <pkg> --config ... (the collector-binary analog) —
    exercised in-process via main(argv) against the session Ray."""
    from open_telemetry_opentelemetry_collector_contrib_ray.__main__ import main

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("""
receivers:
  parquet/events:
    table: events
    columns: [event_id, event_type]
processors:
  keep/clicks:
    condition: 'event_type == "click"'
exporters:
  parquet/out:
    path: %s
service:
  pipelines:
    logs:
      receivers: [parquet/events]
      processors: [keep/clicks]
      exporters: [parquet/out]
""" % (tmp_path / "out"))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--config", str(cfg),
                   "--data-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    import json

    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["pipeline"] == "logs" and "path" in line
    import pyarrow.dataset as pads

    t = pads.dataset(line["path"]).to_table()
    assert t.num_rows > 0
    assert set(t.column("event_type").to_pylist()) == {"click"}


def test_yaml_filelog_receiver(tmp_path):
    (tmp_path / "a.log").write_text(
        "2024-01-01T00:00:00Z ERROR boom\n    at f (line 1)\n"
        "2024-01-01T00:00:01Z INFO ok\n")
    yaml = f"""
receivers:
  filelog/in:
    include: '{tmp_path}/*.log'
    line_start_pattern: '^\\d{{4}}-\\d{{2}}-\\d{{2}}T'
    include_file_record_number: true
exporters:
  collect: {{}}
service:
  pipelines:
    logs:
      receivers: [filelog/in]
      processors: []
      exporters: [collect]
"""
    out = run_config(yaml)
    df = out["logs"]["collect"].to_pandas()
    assert len(df) == 2
    assert df["attr_log.file.record_number"].tolist() == [1, 2]
    assert df.text.iloc[0].endswith("at f (line 1)")


def test_yaml_otlp_wire_format_exporters_and_receivers(tmp_path):
    """fileexporter format:proto + the traces/metrics JSON signals
    through the YAML surface: write with one pipeline config, read back
    with another, row counts survive the wire."""
    import pyarrow as pa
    import ray.data

    # logs -> framed protobuf sink -> read-back
    cfg_w = f"""
receivers:
  generate/g: {{count: 200}}
exporters:
  otlp_proto/out: {{path: {tmp_path}/pb, resource_cols: [role]}}
service:
  pipelines:
    w: {{receivers: [generate/g], exporters: [otlp_proto/out]}}
"""
    run_config(cfg_w)
    cfg_r = f"""
receivers:
  otlp_proto/in: {{path: {tmp_path}/pb}}
service:
  pipelines:
    r: {{receivers: [otlp_proto/in], exporters: [collect]}}
"""
    assert run_config(cfg_r)["r"]["collect"].count() == 200

    # spans -> TracesData JSON sink -> read-back
    spans = pa.table({
        "trace_id": [f"{i:032x}" for i in range(1, 9)],
        "span_id": [f"{i:016x}" for i in range(1, 9)],
        "name": [f"op{i}" for i in range(8)],
        "kind": pa.array([1 + i % 5 for i in range(8)], pa.int64()),
        "start_ts": pa.array([1_700_000_000_000_000 + i for i in range(8)],
                             pa.int64()),
        "end_ts": pa.array([1_700_000_000_000_500 + i for i in range(8)],
                           pa.int64()),
        "env": ["prod"] * 8})
    pq_dir = tmp_path / "spans.parquet"
    ray.data.from_arrow(spans).write_parquet(str(pq_dir))
    cfg_tw = f"""
receivers:
  parquet/spans: {{table: spans}}
exporters:
  otlp_traces_json/out: {{path: {tmp_path}/tj, resource_cols: [env]}}
service:
  pipelines:
    tw: {{receivers: [parquet/spans], exporters: [otlp_traces_json/out]}}
"""
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.config import (
        load_config,
    )

    cfg = load_config(cfg_tw)
    # parquet receiver resolves {data_dir}/{table}.parquet
    run_config(cfg, data_dir=str(tmp_path), pipeline="tw")
    cfg_tr = f"""
receivers:
  otlp_traces_json/in: {{path: {tmp_path}/tj}}
service:
  pipelines:
    tr: {{receivers: [otlp_traces_json/in], exporters: [collect]}}
"""
    back = run_config(cfg_tr)["tr"]["collect"].to_pandas()
    assert len(back) == 8 and (back["env"] == "prod").all()

    # metric datapoints -> MetricsData JSON sink -> read-back
    dps = pa.table({
        "metric_name": ["m"] * 6, "metric_type": ["Sum"] * 6,
        "metric_is_monotonic": [True] * 6,
        "time_unix_nano": pa.array(
            [1_700_000_000_000_000_000 + i for i in range(6)], pa.int64()),
        "value_int": pa.array(list(range(6)), pa.int64())})
    ray.data.from_arrow(dps).write_parquet(str(tmp_path / "dps.parquet"))
    cfg_mw = f"""
receivers:
  parquet/dps: {{table: dps}}
exporters:
  otlp_metrics_json/out: {{path: {tmp_path}/mj}}
service:
  pipelines:
    mw: {{receivers: [parquet/dps], exporters: [otlp_metrics_json/out]}}
"""
    run_config(load_config(cfg_mw), data_dir=str(tmp_path), pipeline="mw")
    cfg_mr = f"""
receivers:
  otlp_metrics_json/in: {{path: {tmp_path}/mj}}
service:
  pipelines:
    mr: {{receivers: [otlp_metrics_json/in], exporters: [collect]}}
"""
    mback = run_config(cfg_mr)["mr"]["collect"].to_pandas()
    assert len(mback) == 6
    assert sorted(mback["value_int"]) == list(range(6))
    assert (mback["metric_type"] == "Sum").all()
