"""OTLP/JSON-lines codec round-trip (sources/otlpjson.py).

Reference contract: fileexporter `format: json` writes one OTLP
LogsData JSON line per consumed batch (optionally compressed), and the
collector can unmarshal those lines (plog JSON marshaler)."""

import gzip
import json
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpjson import (
    read_otlp_json,
    write_otlp_json,
)
from open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts import (
    synth_transcripts,
)

KEY = ["conv_id", "turn_idx"]
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values(KEY).reset_index(drop=True)


@pytest.mark.parametrize("compression", [None, "gzip", "zstd"])
def test_roundtrip(tmp_path, compression):
    t = synth_transcripts(400, seed=7)
    out = str(tmp_path / "otlp")
    manifest = write_otlp_json(
        ray.data.from_arrow(t), out, resource_cols=["conv_id"],
        compression=compression, batch_size=128)
    assert sum(m["rows"] for m in manifest) == 400
    ext = {"gzip": ".jsonl.gz", "zstd": ".jsonl.zst"}.get(compression, ".jsonl")
    assert all(m["path"].endswith(ext) for m in manifest)

    back = read_otlp_json(out).to_pandas()
    got, exp = _norm(back), _norm(t.to_pandas())
    # int32 turn_idx comes back int64 (OTLP intValue is 64-bit); values equal
    got["turn_idx"] = got["turn_idx"].astype("int64")
    exp["turn_idx"] = exp["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_wire_shape_is_otlp(tmp_path):
    t = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "text": ["hello", "world", None],
        "latency_ms": pa.array([5, None, 9], pa.int64()),
        "ok": [True, False, None],
        "score": [0.5, 1.5, None],
        "ts": pa.array([1_700_000_000_000_000] * 3).cast(pa.timestamp("us")),
        "severity_number": pa.array([9, 17, None], pa.int32()),
    })
    out = str(tmp_path / "wire")
    write_otlp_json(ray.data.from_arrow(t), out, resource_cols=["conv_id"],
                    severity_number_col="severity_number")
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert files
    lines = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    rls = [rl for doc in lines for rl in doc["resourceLogs"]]
    by_conv = {rl["resource"]["attributes"][0]["value"]["stringValue"]: rl
               for rl in rls}
    assert set(by_conv) == {"c1", "c2"}
    recs = by_conv["c1"]["scopeLogs"][0]["logRecords"]
    assert len(recs) == 2
    r0 = next(r for r in recs if r.get("body", {}).get("stringValue") == "hello")
    attrs = {kv["key"]: kv["value"] for kv in r0["attributes"]}
    # proto3 JSON: int64 as decimal string; double as number; bool as bool
    assert attrs["latency_ms"] == {"intValue": "5"}
    assert attrs["ok"] == {"boolValue": True}
    assert attrs["score"] == {"doubleValue": 0.5}
    assert r0["timeUnixNano"] == str(1_700_000_000_000_000 * 1000)
    assert r0["severityNumber"] == 9 and r0["severityText"] == "INFO"
    # null cells omit the attribute entirely (pdata map semantics)
    r1 = next(r for r in recs if r is not r0)
    assert "latency_ms" not in {kv["key"] for kv in r1.get("attributes", [])}


def test_writer_is_retry_idempotent(tmp_path):
    t = synth_transcripts(100, seed=3)
    out = str(tmp_path / "idem")
    m1 = write_otlp_json(ray.data.from_arrow(t), out, batch_size=40)
    m2 = write_otlp_json(ray.data.from_arrow(t), out, batch_size=40)
    # identical content -> identical names -> no duplicate files
    assert sorted(m["path"] for m in m1) == sorted(m["path"] for m in m2)
    assert read_otlp_json(out).count() == 100


def test_gzip_lines_parse_standalone(tmp_path):
    t = synth_transcripts(60, seed=5)
    out = str(tmp_path / "gz")
    write_otlp_json(ray.data.from_arrow(t), out, compression="gzip",
                    batch_size=30)
    f = next(p for p in os.listdir(out) if p.endswith(".jsonl.gz"))
    with gzip.open(os.path.join(out, f), "rt") as fh:
        doc = json.loads(fh.readline())
    assert "resourceLogs" in doc


def test_writer_rotation_max_megabytes(tmp_path):
    # fileexporter rotation knob (config.go Rotation.MaxMegabytes): one
    # batch splits into several files, each under the cap, no row lost
    t = synth_transcripts(200, seed=9)
    out = str(tmp_path / "rot")
    manifest = write_otlp_json(ray.data.from_arrow(t), out,
                               batch_size=200, max_megabytes=0.01)
    assert len(manifest) > 1
    assert sum(m["rows"] for m in manifest) == 200
    for m in manifest:
        # sized by UTF-8 bytes with envelope headroom: strictly under cap
        assert os.path.getsize(m["path"]) <= 0.01 * 1024 * 1024
    assert read_otlp_json(out).count() == 200


def test_traces_json_roundtrip_gzip(tmp_path):
    import glob

    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpjson import (
        OtlpTracesJsonReaderStage, OtlpTracesJsonWriter)
    t = pa.table({
        "trace_id": ["0af7651916cd43dd8448eb211c80319c", None],
        "span_id": ["b7ad6b7169203331", "00f067aa0ba902b7"],
        "parent_span_id": [None, "b7ad6b7169203331"],
        "name": ["parent", "child"], "kind": [2, 3],
        "start_ts": [1546300800000000, 1546300800000500],
        "end_ts": [1546300800123456, 1546300800000900],
        "status_code": [0, 2], "status_message": [None, "boom"],
        "n": [1, 2], "env": ["prod", "prod"]})
    d = str(tmp_path)
    OtlpTracesJsonWriter(d, resource_cols=["env"], compression="gzip")(t)
    files = glob.glob(d + "/*.jsonl.gz")
    assert len(files) == 1
    out = OtlpTracesJsonReaderStage()(
        {"bytes": [open(files[0], "rb").read()], "path": [files[0]]})
    rows = sorted(out.to_pylist(), key=lambda r: r["span_id"])
    child, parent = rows[0], rows[1]
    assert parent["trace_id"] == "0af7651916cd43dd8448eb211c80319c"
    assert "trace_id" not in child or child["trace_id"] is None
    assert child["parent_span_id"] == "b7ad6b7169203331"
    assert child["status_code"] == 2 and child["status_message"] == "boom"
    assert parent["status_code"] == 0 and parent["kind"] == 2
    assert child["end_ts"] == 1546300800000900
    assert parent["n"] == 1 and child["n"] == 2 and parent["env"] == "prod"


def test_traces_json_matches_proto_decode():
    # the two wire formats must invert to the same flat rows
    import glob
    import tempfile

    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpjson import (
        OtlpTracesJsonReaderStage, OtlpTracesJsonWriter)
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_traces_data, encode_traces_data)
    rows = [{"trace_id": f"{i:032x}", "span_id": f"{i:016x}",
             "name": f"s{i}", "kind": 1 + i % 5,
             "start_ts": 1546300800000000 + i,
             "end_ts": 1546300800000000 + i * 2,
             "status_code": i % 3, "tool": f"t{i % 2}",
             "env": "prod" if i % 2 == 0 else "stage"}
            for i in range(8)]
    via_proto = decode_traces_data(
        encode_traces_data(rows, resource_cols=["env"]))
    d = tempfile.mkdtemp()
    OtlpTracesJsonWriter(d, resource_cols=["env"])(
        pa.table({k: [r.get(k) for r in rows] for k in rows[0]}))
    f = glob.glob(d + "/*.jsonl")[0]
    via_json = OtlpTracesJsonReaderStage()(
        {"bytes": [open(f, "rb").read()], "path": [f]}).to_pylist()
    key = lambda r: r["span_id"]  # noqa: E731
    for a, b in zip(sorted(via_proto, key=key), sorted(via_json, key=key)):
        assert a == b


def test_metrics_json_roundtrip_matches_proto_decode():
    # Gauge + monotonic Sum datapoints through both wire formats must
    # invert to the same flat rows
    import glob
    import tempfile

    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpjson import (
        OtlpMetricsJsonReaderStage, OtlpMetricsJsonWriter)
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_metrics_data, encode_metrics_data)
    rows = []
    for i in range(6):
        rows.append({"metric_name": "lat", "metric_type": "Gauge",
                     "metric_unit": "ms",
                     "time_unix_nano": 1_700_000_000_000_000_000 + i,
                     "value_double": i * 0.5, "shard": i % 2,
                     "env": "prod"})
        rows.append({"metric_name": "calls", "metric_type": "Sum",
                     "metric_unit": "1", "metric_is_monotonic": True,
                     "metric_aggregation_temporality": "cumulative",
                     "time_unix_nano": 1_700_000_000_000_000_000 + i,
                     "value_int": i * 3, "shard": i % 2, "env": "prod"})
    via_proto = decode_metrics_data(
        encode_metrics_data(rows, resource_cols=["env"]))
    d = tempfile.mkdtemp()
    cols = sorted({k for r in rows for k in r})
    OtlpMetricsJsonWriter(d, resource_cols=["env"], compression="zstd")(
        pa.table({k: [r.get(k) for r in rows] for k in cols}))
    f = glob.glob(d + "/*.jsonl.zst")[0]
    via_json = OtlpMetricsJsonReaderStage()(
        {"bytes": [open(f, "rb").read()], "path": [f]}).to_pylist()
    key = lambda r: (r["metric_name"], r["time_unix_nano"])  # noqa: E731
    assert len(via_proto) == len(via_json) == 12
    drop_none = lambda r: {k: v for k, v in r.items()  # noqa: E731
                           if v is not None}  # DataFrame pads absent keys
    for a, b in zip(sorted(via_proto, key=key), sorted(via_json, key=key)):
        assert drop_none(a) == drop_none(b)


def test_hist_json_roundtrip_zero_buckets():
    import tempfile

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpjson import (
        OtlpMetricsJsonReaderStage, write_otlp_hist_json)
    rows = [{"tool": "search", "le": "100", "n": 3},
            {"tool": "search", "le": "inf", "n": 1},
            {"tool": "calc", "le": "500", "n": 7}]
    path = tempfile.mkdtemp() + "/h.jsonl"
    write_otlp_hist_json(rows, path, metric_name="tool_latency",
                         key_cols=["tool"], bounds=[100, 500], unit="ms")
    back = OtlpMetricsJsonReaderStage()(
        {"bytes": [open(path, "rb").read()], "path": [path]}).to_pylist()
    got = {(r["tool"], r["le"]): r["n"] for r in back}
    # zero buckets materialize on decode, like the proto codec
    assert got == {("search", "100"): 3, ("search", "500"): 0,
                   ("search", "inf"): 1, ("calc", "100"): 0,
                   ("calc", "500"): 7, ("calc", "inf"): 0}
    assert all(r["metric_name"] == "tool_latency"
               and r["metric_type"] == "Histogram"
               and r["metric_unit"] == "ms" for r in back)
