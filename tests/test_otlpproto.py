"""OTLP protobuf wire-format round-trip (sources/otlpproto.py).

Reference contract: fileexporter `format: proto` writes each marshaled
LogsData framed by a 4-byte big-endian length
(exporter/fileexporter/file_writer.go:45-50); logs.proto/common.proto
field numbers are the public opentelemetry-proto schema."""

import struct

import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
    decode_logs_data,
    encode_logs_data,
    read_otlp_proto,
    write_otlp_proto,
)
from open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts import (
    synth_transcripts,
)


def test_encode_decode_all_value_types():
    rows = [
        {"ts": 1_700_000_000_000_000, "text": "hello", "severity_number": 9,
         "severity_text": "INFO", "attr_s": "x", "attr_i": -5,
         "attr_f": 2.5, "attr_b": True, "env": "prod"},
        {"ts": None, "text": None, "attr_s": None, "env": "prod"},
    ]
    buf = encode_logs_data(rows, resource_cols=["env"])
    back = decode_logs_data(buf)
    assert len(back) == 2
    r = back[0]
    assert r["text"] == "hello" and r["ts"] == 1_700_000_000_000_000
    assert r["severity_number"] == 9 and r["severity_text"] == "INFO"
    assert r["attr_s"] == "x" and r["attr_i"] == -5
    assert r["attr_f"] == 2.5 and r["attr_b"] is True
    assert r["env"] == "prod"            # resource attr re-flattened
    assert back[1].get("text") is None


def test_proto_roundtrip_matches_input(tmp_path, ray_session):
    t = synth_transcripts(300, seed=4)
    out = str(tmp_path / "proto")
    manifest = write_otlp_proto(ray.data.from_arrow(t), out, batch_size=100,
                                resource_cols=["role"])
    assert sum(m["rows"] for m in manifest) == 300
    # framing: every file starts with a 4-byte BE length covering the rest
    with open(manifest[0]["path"], "rb") as f:
        head = f.read(4)
        (ln,) = struct.unpack(">I", head)
        assert ln == len(f.read())

    back = read_otlp_proto(out).to_pandas()
    assert len(back) == 300
    src = t.to_pandas()
    a = back.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (a["text"].fillna("") == b["text"].fillna("")).all()
    assert (a["role"] == b["role"]).all()
    assert (pd.to_datetime(a["ts"]) == pd.to_datetime(b["ts"])).all()


def test_proto_writer_is_retry_idempotent(tmp_path):
    # a retried task deterministically replays the same file names: a
    # fresh writer instance (what a task retry deserializes) over the
    # same batch sequence overwrites, never duplicates
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        OtlpProtoWriter,
    )

    t = synth_transcripts(80, seed=6)
    out = str(tmp_path / "idem")
    w1 = OtlpProtoWriter(out)
    m1 = [w1(t.slice(0, 40))["path"][0].as_py(),
          w1(t.slice(40, 40))["path"][0].as_py()]
    w2 = OtlpProtoWriter(out)  # simulated retry replay
    m2 = [w2(t.slice(0, 40))["path"][0].as_py(),
          w2(t.slice(40, 40))["path"][0].as_py()]
    assert m1 == m2 and len(set(m1)) == 2
    assert sum(len(decode_logs_data(open(p, "rb").read()[4:]))
               for p in set(m1)) == 80


def test_identical_batches_do_not_collapse(tmp_path, ray_session):
    # two byte-identical batches must yield two files and a manifest
    # that agrees with the on-disk row count (ADVICE: content-hash-only
    # names silently dropped trailing duplicates on read-back)
    t = synth_transcripts(60, seed=6).slice(0, 40)
    tt = pa.concat_tables([t, t]).combine_chunks()
    out = str(tmp_path / "dup")
    m = write_otlp_proto(ray.data.from_arrow(tt), out, batch_size=40)
    paths = [r["path"] for r in m]
    assert len(paths) == len(set(paths))
    assert sum(r["rows"] for r in m) == 80
    assert read_otlp_proto(out).count() == 80


def test_truncated_frame_raises(tmp_path, ray_session):
    t = synth_transcripts(20, seed=7)
    out = str(tmp_path / "trunc")
    m = write_otlp_proto(ray.data.from_arrow(t), out, batch_size=20)
    p = m[0]["path"]
    data = open(p, "rb").read()
    with open(p, "wb") as f:          # cut the last 10 payload bytes
        f.write(data[:-10])
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        OtlpProtoReaderStage,
    )

    with pytest.raises(ValueError, match="truncated"):
        OtlpProtoReaderStage()({"bytes": [open(p, "rb").read()]})


def test_metrics_proto_roundtrip_unit():
    """encode_metrics_data ∘ decode_metrics_data = identity over the
    flat metric-table shape (Gauge + Sum, int and double points,
    temporality/monotonic, resource + datapoint attributes)."""
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_metrics_data,
        encode_metrics_data,
    )

    rows = [
        {"metric_name": "lat", "metric_type": "Gauge", "metric_unit": "ms",
         "time_unix_nano": 1_700_000_000_000_000_000, "value_double": 1.5,
         "attr_tool": "search", "svc": "a"},
        {"metric_name": "calls", "metric_type": "Sum",
         "metric_aggregation_temporality": "cumulative",
         "metric_is_monotonic": True,
         "time_unix_nano": 1_700_000_000_000_000_001, "value_int": -7,
         "attr_tool": "email", "svc": "a"},
        {"metric_name": "calls", "metric_type": "Sum",
         "metric_aggregation_temporality": "delta",
         "metric_is_monotonic": False,
         "value_int": 12, "svc": "b"},
    ]
    buf = encode_metrics_data(rows, resource_cols=["svc"])
    back = decode_metrics_data(buf)
    assert len(back) == 3
    by_name = {}
    for r in back:
        by_name.setdefault((r["metric_name"], r.get("svc")), []).append(r)
    g = by_name[("lat", "a")][0]
    assert g["metric_type"] == "Gauge" and g["value_double"] == 1.5
    assert g["metric_unit"] == "ms" and g["attr_tool"] == "search"
    assert g["time_unix_nano"] == 1_700_000_000_000_000_000
    s = by_name[("calls", "a")][0]
    assert s["metric_type"] == "Sum" and s["value_int"] == -7
    assert s["metric_aggregation_temporality"] == "cumulative"
    assert s["metric_is_monotonic"] is True
    s2 = by_name[("calls", "b")][0]
    assert s2["value_int"] == 12
    assert s2["metric_aggregation_temporality"] == "delta"
    assert s2["metric_is_monotonic"] is False


def test_metrics_proto_histogram_rows_raise():
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        encode_metrics_data,
    )

    with pytest.raises(NotImplementedError):
        encode_metrics_data([{"metric_name": "h", "metric_type": "Histogram",
                              "count": 3}])


def test_histogram_proto_roundtrip_unit():
    """Sparse le-rows -> HistogramDataPoint (packed fixed64 counts +
    packed double bounds, zero-filled) -> rows again."""
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_histograms_data,
        encode_histograms_data,
    )

    rows = [{"tool": "a", "le": "100", "n": 3},
            {"tool": "a", "le": "inf", "n": 1},
            {"tool": "b", "le": "500", "n": 7}]
    buf = encode_histograms_data(rows, metric_name="lat",
                                 key_cols=["tool"], bounds=[100, 500],
                                 unit="ms")
    back = decode_histograms_data(buf)
    assert len(back) == 6  # 2 tools x 3 buckets, zeros filled
    got = {(r["tool"], r["le"]): r["n"] for r in back}
    assert got == {("a", "100"): 3, ("a", "500"): 0, ("a", "inf"): 1,
                   ("b", "100"): 0, ("b", "500"): 7, ("b", "inf"): 0}
    r0 = back[0]
    assert r0["metric_name"] == "lat" and r0["metric_type"] == "Histogram"
    assert r0["metric_unit"] == "ms"
    assert r0["metric_aggregation_temporality"] == "cumulative"


def test_traces_roundtrip_all_fields():
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_traces_data, encode_traces_data)
    rows = [{"trace_id": "0af7651916cd43dd8448eb211c80319c",
             "span_id": "b7ad6b7169203331",
             "parent_span_id": "00f067aa0ba902b7",
             "trace_state": "congo=t61rcWkgMzE",
             "name": "/api/call", "kind": 3,
             "start_ts": 1546300800000000, "end_ts": 1546300800123456,
             "status_code": 2, "status_message": "boom",
             "tool": "search", "n": 7, "score": 0.5, "env": "prod"}]
    back = decode_traces_data(encode_traces_data(rows,
                                                 resource_cols=["env"]))
    assert len(back) == 1
    for k, v in rows[0].items():
        assert back[0][k] == v, k


def test_traces_proto3_defaults():
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_traces_data, encode_traces_data)
    # kind=0 / status_code=0 / empty ids omit on the wire and restore
    # as defaults; absent optional strings stay absent
    rows = [{"trace_id": None, "span_id": None, "name": "x", "kind": 0,
             "start_ts": None, "end_ts": None, "status_code": 0}]
    buf = encode_traces_data(rows)
    back = decode_traces_data(buf)
    assert back[0]["kind"] == 0 and back[0]["status_code"] == 0
    assert "trace_id" not in back[0] and "status_message" not in back[0]
    # the wire holds only the name field inside the span
    assert b"/x" not in buf  # sanity: no stray encoding


def test_traces_resource_grouping():
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_traces_data, encode_traces_data)
    rows = [{"span_id": f"{i:016x}", "name": f"s{i}",
             "env": "prod" if i % 2 == 0 else "stage"} for i in range(6)]
    buf = encode_traces_data(rows, resource_cols=["env"])
    back = decode_traces_data(buf)
    assert sorted(r["span_id"] for r in back) == \
        sorted(r["span_id"] for r in rows)
    assert all(r["env"] == ("prod" if int(r["span_id"], 16) % 2 == 0
                            else "stage") for r in back)
