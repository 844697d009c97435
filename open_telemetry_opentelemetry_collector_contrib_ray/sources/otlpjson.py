"""OTLP/JSON-lines file codec — the fileexporter's default wire format.

The reference fileexporter marshals each consumed `plog.Logs` batch as
ONE line of OTLP JSON (`plog.JSONMarshaler`,
/root/reference/exporter/fileexporter/file_exporter.go + marshaling in
config.go:24-52 `format: json`), optionally zstd-compressed, and the
collector (or `pkg/golden`) can unmarshal those lines back.  Batch
re-expression:

- `write_otlp_json(ds, out_dir, ...)`: a `map_batches` stage serializes
  each Arrow batch to one OTLP `LogsData` JSON line — records grouped
  into `resourceLogs` by the configured resource columns — and writes
  one `.jsonl[.gz|.zst]` file per batch.  File names derive from a
  content hash, so Ray task retries overwrite instead of duplicating
  (idempotent sink).  Returns a manifest list [{path, rows}].
- `read_otlp_json(path_or_dir)`: file-parallel read
  (`ray.data.read_binary_files`) → per-file decompress + line-parse →
  flat Arrow columns, inverse of the writer (resource attrs re-stamped
  per record, `attributes` list → typed columns, `timeUnixNano` →
  timestamp[us]).

Value typing follows the OTLP JSON mapping: proto64-bit ints render as
decimal strings under `intValue`; doubles under `doubleValue`; bools
under `boolValue`; strings under `stringValue`; null cells omit the
attribute (absent key), matching pdata map semantics.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from typing import Iterable

import numpy as np
import pyarrow as pa

_SEV_TEXT = {1: "TRACE", 5: "DEBUG", 9: "INFO", 13: "WARN", 17: "ERROR", 21: "FATAL"}


def _any_value(v):
    """Python scalar -> OTLP AnyValue JSON object (proto3 JSON mapping)."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, (int, np.integer)):
        return {"intValue": str(int(v))}
    if isinstance(v, (float, np.floating)):
        return {"doubleValue": float(v)}
    return {"stringValue": str(v)}


def _from_any_value(obj: dict):
    if "stringValue" in obj:
        return obj["stringValue"]
    if "intValue" in obj:
        return int(obj["intValue"])
    if "doubleValue" in obj:
        return float(obj["doubleValue"])
    if "boolValue" in obj:
        return bool(obj["boolValue"])
    if "arrayValue" in obj:
        return [_from_any_value(x) for x in obj["arrayValue"].get("values", [])]
    return None


def _open_out(path: str, compression: str | None):
    if compression == "gzip":
        return gzip.open(path, "wb", compresslevel=4)
    if compression == "zstd":
        raw = open(path, "wb")
        return pa.CompressedOutputStream(raw, "zstd")
    return open(path, "wb")


def _read_bytes(data: bytes, path: str) -> bytes:
    # sniff magic bytes, not extensions: the Arrow filesystem layer under
    # ray.data.read_binary_files already auto-decompresses .gz ('detect')
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:4] == b"\x28\xb5\x2f\xfd":
        buf = pa.CompressedInputStream(pa.BufferReader(data), "zstd")
        return buf.read()
    return data


class OtlpJsonWriter:
    """map_batches stage: one OTLP LogsData JSON line per batch, one
    output file per batch, content-hash file names (retry-idempotent).

    max_megabytes mirrors the fileexporter rotation knob
    (exporter/fileexporter/config.go Rotation.MaxMegabytes): a batch
    whose serialized payload would exceed the cap splits into multiple
    files, each under the cap (>=1 record per file)."""

    def __init__(self, out_dir: str, *, body_col: str = "text",
                 time_col: str = "ts", resource_cols: Iterable[str] = (),
                 severity_number_col: str | None = None,
                 severity_text_col: str | None = None,
                 compression: str | None = None,
                 max_megabytes: float | None = None,
                 scope_name: str = "open_telemetry_opentelemetry_collector_contrib_ray"):
        self.out_dir = out_dir
        self.body_col = body_col
        self.time_col = time_col
        self.resource_cols = list(resource_cols)
        self.sev_num_col = severity_number_col
        self.sev_text_col = severity_text_col
        self.compression = compression
        self.max_megabytes = max_megabytes
        self.scope_name = scope_name
        os.makedirs(out_dir, exist_ok=True)

    def _record_json(self, t: pa.Table) -> list[str]:
        """One compact OTLP logRecord JSON string per row.  Byte-for-byte
        what json.dumps(separators=(',', ':')) would emit for the dict
        form, but rendered column-at-a-time: the typed dispatch happens
        once per COLUMN (from the Arrow schema) and each scalar costs a
        single C-level format/json.dumps call, not a dict build + a
        serializer walk."""
        n = t.num_rows
        special = {self.body_col, self.time_col, self.sev_num_col,
                   self.sev_text_col, *self.resource_cols}
        attr_cols = [c for c in t.column_names if c not in special]
        frag_cols = []
        for c in attr_cols:
            col = t.column(c)
            key = json.dumps(c)
            vals = col.to_pylist()
            if pa.types.is_boolean(col.type):
                frags = [None if v is None else
                         '{"key":%s,"value":{"boolValue":%s}}'
                         % (key, "true" if v else "false") for v in vals]
            elif pa.types.is_integer(col.type):
                frags = [None if v is None else
                         '{"key":%s,"value":{"intValue":"%d"}}' % (key, v)
                         for v in vals]
            elif pa.types.is_floating(col.type):
                frags = [None if v is None else
                         '{"key":%s,"value":{"doubleValue":%s}}'
                         % (key, json.dumps(float(v))) for v in vals]
            else:
                frags = [None if v is None else
                         '{"key":%s,"value":{"stringValue":%s}}'
                         % (key, json.dumps(str(v))) for v in vals]
            frag_cols.append(frags)
        body = (t.column(self.body_col).to_pylist()
                if self.body_col in t.column_names else [None] * n)
        if self.time_col in t.column_names:
            ts = t.column(self.time_col).cast(pa.timestamp("us")) \
                  .cast(pa.int64()).to_pylist()
        else:
            ts = [None] * n
        sev_n = (t.column(self.sev_num_col).to_pylist()
                 if self.sev_num_col and self.sev_num_col in t.column_names
                 else [None] * n)
        sev_t = (t.column(self.sev_text_col).to_pylist()
                 if self.sev_text_col and self.sev_text_col in t.column_names
                 else [None] * n)
        recs = []
        for i in range(n):
            parts = []
            if ts[i] is not None:
                parts.append('"timeUnixNano":"%d"' % (ts[i] * 1000))
            sn = sev_n[i]
            if sn is not None:
                st = sev_t[i] if sev_t[i] is not None \
                    else _SEV_TEXT.get(int(sn), "")
                parts.append('"severityNumber":%d' % int(sn))
                parts.append('"severityText":%s' % json.dumps(st))
            elif sev_t[i] is not None:
                parts.append('"severityText":%s' % json.dumps(sev_t[i]))
            if body[i] is not None:
                parts.append('"body":{"stringValue":%s}'
                             % json.dumps(str(body[i])))
            attrs = [fc[i] for fc in frag_cols if fc[i] is not None]
            if attrs:
                parts.append('"attributes":[%s]' % ",".join(attrs))
            recs.append("{%s}" % ",".join(parts))
        return recs

    @staticmethod
    def _any_value_json(v) -> str:
        if isinstance(v, bool):
            return '{"boolValue":%s}' % ("true" if v else "false")
        if isinstance(v, (int, np.integer)):
            return '{"intValue":"%d"}' % int(v)
        if isinstance(v, (float, np.floating)):
            return '{"doubleValue":%s}' % json.dumps(float(v))
        return '{"stringValue":%s}' % json.dumps(str(v))

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        if self.max_megabytes is not None and t.num_rows > 1:
            # size by UTF-8 BYTES (not chars) and leave headroom for the
            # resourceLogs/scopeLogs envelope (one scope header per
            # resource group); serialize ONCE and slice the records into
            # _write_one — no second serialization pass
            cap = int(self.max_megabytes * 1024 * 1024)
            recs = self._record_json(t)
            env = 4096 + 256 * max(1, len(self.resource_cols))
            budget = max(cap - env, 1)
            cum = np.cumsum([len(r.encode()) + 1 for r in recs])
            if cum[-1] > budget:
                parts, start, base = [], 0, 0
                n = t.num_rows
                while start < n:
                    end = int(np.searchsorted(cum, base + budget, side="right"))
                    end = min(n, max(end, start + 1))
                    parts.append(self._write_one(t.slice(start, end - start),
                                                 recs[start:end]))
                    base = cum[end - 1]
                    start = end
                return pa.concat_tables(parts)
            return self._write_one(t, recs)
        return self._write_one(t)

    def _write_one(self, t: pa.Table, recs: list[str] | None = None) -> pa.Table:
        if recs is None:
            recs = self._record_json(t)
        scope = '{"scope":{"name":%s},"logRecords":[' % json.dumps(
            self.scope_name)
        if self.resource_cols:
            import pandas as pd

            # first-occurrence group codes (what dict.setdefault produced),
            # vectorized: factorize each key column, combine, re-factorize
            n = t.num_rows
            codes = np.zeros(n, dtype=np.int64)
            key_vals = []
            for c in self.resource_cols:
                arr = t.column(c).to_pandas()
                key_vals.append(arr)
                ci, _ = pd.factorize(arr, use_na_sentinel=False)
                codes = codes * (ci.max() + 1) + ci
            gcodes, _ = pd.factorize(codes)
            order = np.argsort(gcodes, kind="stable")
            sorted_codes = gcodes[order]
            starts = np.flatnonzero(np.r_[True, np.diff(sorted_codes) != 0])
            ends = np.r_[starts[1:], n]
            resource_logs = []
            for s, e in zip(starts, ends):
                idxs = order[s:e]
                first = int(idxs[0])
                res_attrs = ",".join(
                    '{"key":%s,"value":%s}'
                    % (json.dumps(c), self._any_value_json(kv.iloc[first]))
                    for c, kv in zip(self.resource_cols, key_vals)
                    if kv.iloc[first] is not None)
                resource_logs.append(
                    '{"resource":{"attributes":[%s]},"scopeLogs":[%s%s]}]}'
                    % (res_attrs, scope,
                       ",".join(recs[int(i)] for i in idxs)))
        else:
            resource_logs = ['{"resource":{},"scopeLogs":[%s%s]}]}'
                             % (scope, ",".join(recs))]
        line = ('{"resourceLogs":[%s]}'
                % ",".join(resource_logs)).encode() + b"\n"
        digest = hashlib.md5(line).hexdigest()[:16]
        ext = {"gzip": ".jsonl.gz", "zstd": ".jsonl.zst"}.get(self.compression, ".jsonl")
        path = os.path.join(self.out_dir, f"logs-{digest}{ext}")
        tmp = path + ".tmp"
        with _open_out(tmp, self.compression) as f:
            f.write(line)
        os.replace(tmp, path)  # atomic: a retried task rewrites the same name
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_json(ds, out_dir: str, **kw) -> list[dict]:
    """Write `ds` as OTLP JSON lines under out_dir; returns the manifest
    [{path, rows}].  One file per batch; `batch_size` bounds line size."""
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpJsonWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()  # tiny: one row per written file


def _parse_lines(data: bytes, path: str, time_col: str, body_col: str) -> list[dict]:
    rows = []
    for line in _read_bytes(data, path).splitlines():
        if not line.strip():
            continue
        doc = json.loads(line)
        for rl in doc.get("resourceLogs", []):
            res = {kv["key"]: _from_any_value(kv["value"])
                   for kv in rl.get("resource", {}).get("attributes", [])}
            for sl in rl.get("scopeLogs", []):
                for rec in sl.get("logRecords", []):
                    row = dict(res)
                    if "timeUnixNano" in rec:
                        row[time_col] = int(rec["timeUnixNano"]) // 1000
                    if "severityNumber" in rec:
                        row["severity_number"] = int(rec["severityNumber"])
                    if "severityText" in rec:
                        row["severity_text"] = rec["severityText"]
                    if "body" in rec:
                        row[body_col] = _from_any_value(rec["body"])
                    for kv in rec.get("attributes", []):
                        row[kv["key"]] = _from_any_value(kv["value"])
                    rows.append(row)
    return rows


class OtlpJsonReaderStage:
    """map_batches over read_binary_files output: bytes -> flat rows."""

    def __init__(self, time_col: str = "ts", body_col: str = "text"):
        self.time_col = time_col
        self.body_col = body_col

    def __call__(self, batch: dict) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        for data, path in zip(batch["bytes"], batch["path"]):
            rows.extend(_parse_lines(bytes(data), str(path),
                                     self.time_col, self.body_col))
        if not rows:
            return pa.table({})
        df = pd.DataFrame(rows)
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.replace_schema_metadata(None)  # pandas metadata is unhashable
        # for Ray's schema dedup and carries no information here
        if self.time_col in t.column_names:
            idx = t.column_names.index(self.time_col)
            t = t.set_column(idx, self.time_col,
                             t.column(self.time_col).cast(pa.int64())
                             .cast(pa.timestamp("us")))
        return t


def read_otlp_json(path: str, *, time_col: str = "ts", body_col: str = "text"):
    """Read OTLP JSON-lines files (dir or file) into a flat Dataset.
    File-parallel, mirrors the reference's per-file ingest concurrency
    (/root/reference/pkg/stanza/fileconsumer/config.go:36
    max_concurrent_files)."""
    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)
    return ds.map_batches(OtlpJsonReaderStage(time_col, body_col),
                          batch_format="numpy", batch_size=4)


# ------------------------------------------------ traces signal (JSON)
# fileexporter JSON marshals every signal through pdata's protojson:
# camelCase fields, hex-string ids, string-encoded uint64 nanos
# (exporter/fileexporter/marshaller.go; ptrace/json.go).  Flat span
# rows use the same column shape as sources/otlpproto.py's trace codec.

_SPAN_FIELDS = ("trace_id", "span_id", "parent_span_id", "trace_state",
                "name", "kind", "start_ts", "end_ts", "status_code",
                "status_message")


def _span_json(r: dict, skip: set) -> dict:
    span: dict = {}
    if r.get("trace_id"):
        span["traceId"] = r["trace_id"]
    if r.get("span_id"):
        span["spanId"] = r["span_id"]
    if r.get("trace_state"):
        span["traceState"] = r["trace_state"]
    if r.get("parent_span_id"):
        span["parentSpanId"] = r["parent_span_id"]
    if r.get("name"):
        span["name"] = r["name"]
    if r.get("kind"):
        span["kind"] = int(r["kind"])
    for key, col in (("startTimeUnixNano", "start_ts"),
                     ("endTimeUnixNano", "end_ts")):
        if r.get(col) is not None:
            span[key] = str(int(r[col]) * 1000)
    attrs = [{"key": k, "value": _any_value(v)} for k, v in r.items()
             if k not in skip and v is not None]
    if attrs:
        span["attributes"] = attrs
    status = {}
    if r.get("status_message"):
        status["message"] = r["status_message"]
    if r.get("status_code"):
        status["code"] = int(r["status_code"])
    if status:
        span["status"] = status
    return span


class OtlpTracesJsonWriter:
    """map_batches stage: one TracesData JSON line per batch, grouped
    into resourceSpans by the configured resource columns (same framing
    and naming conventions as OtlpJsonWriter)."""

    def __init__(self, out_dir: str, *, resource_cols: Iterable[str] = (),
                 compression: str | None = None,
                 scope_name: str = "open_telemetry_opentelemetry_collector_contrib_ray"):
        self.out_dir = out_dir
        self.resource_cols = list(resource_cols)
        self.compression = compression
        self.scope_name = scope_name
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        skip = set(self.resource_cols) | set(_SPAN_FIELDS)
        groups: dict[tuple, list[dict]] = {}
        for r in t.to_pylist():
            key = tuple(r.get(c) for c in self.resource_cols)
            groups.setdefault(key, []).append(_span_json(r, skip))
        resource_spans = []
        for key, spans in groups.items():
            res_attrs = [{"key": c, "value": _any_value(v)}
                         for c, v in zip(self.resource_cols, key)
                         if v is not None]
            resource_spans.append({
                "resource": {"attributes": res_attrs} if res_attrs else {},
                "scopeSpans": [{"scope": {"name": self.scope_name},
                                "spans": spans}]})
        line = json.dumps({"resourceSpans": resource_spans},
                          separators=(",", ":")).encode() + b"\n"
        digest = hashlib.md5(line).hexdigest()[:16]
        ext = {"gzip": ".jsonl.gz",
               "zstd": ".jsonl.zst"}.get(self.compression, ".jsonl")
        path = os.path.join(self.out_dir, f"traces-{digest}{ext}")
        tmp = path + ".tmp"
        with _open_out(tmp, self.compression) as f:
            f.write(line)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_traces_json(ds, out_dir: str, **kw) -> list[dict]:
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpTracesJsonWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()


class OtlpTracesJsonReaderStage:
    """map_batches over read_binary_files output: TracesData JSON lines
    -> flat span rows (inverse of OtlpTracesJsonWriter)."""

    def __call__(self, batch) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        paths = batch.get("path")
        for i, data in enumerate(batch["bytes"]):
            raw = _read_bytes(bytes(data),
                              str(paths[i]) if paths is not None else "")
            for ln in raw.splitlines():
                if not ln.strip():
                    continue
                doc = json.loads(ln)
                for rs in doc.get("resourceSpans", []):
                    res = {a["key"]: _from_any_value(a["value"])
                           for a in rs.get("resource", {})
                           .get("attributes", [])}
                    for ss in rs.get("scopeSpans", []):
                        for sp in ss.get("spans", []):
                            row = dict(res)
                            row.update({"kind": 0, "status_code": 0})
                            if "traceId" in sp:
                                row["trace_id"] = sp["traceId"]
                            if "spanId" in sp:
                                row["span_id"] = sp["spanId"]
                            if "parentSpanId" in sp:
                                row["parent_span_id"] = sp["parentSpanId"]
                            if "traceState" in sp:
                                row["trace_state"] = sp["traceState"]
                            if "name" in sp:
                                row["name"] = sp["name"]
                            if "kind" in sp:
                                row["kind"] = int(sp["kind"])
                            if "startTimeUnixNano" in sp:
                                row["start_ts"] = \
                                    int(sp["startTimeUnixNano"]) // 1000
                            if "endTimeUnixNano" in sp:
                                row["end_ts"] = \
                                    int(sp["endTimeUnixNano"]) // 1000
                            for a in sp.get("attributes", []):
                                row[a["key"]] = _from_any_value(a["value"])
                            st = sp.get("status", {})
                            if "message" in st:
                                row["status_message"] = st["message"]
                            if "code" in st:
                                row["status_code"] = int(st["code"])
                            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False) \
                       .replace_schema_metadata(None)


def read_otlp_traces_json(path: str):
    import ray.data as rd

    files = rd.read_binary_files(path, include_paths=True,
                                 file_extensions=["jsonl", "gz", "zst"])
    return files.map_batches(OtlpTracesJsonReaderStage(),
                             batch_format="numpy")


# ----------------------------------------------- metrics signal (JSON)
# pmetric's protojson mapping (pdata/pmetric/json.go): camelCase,
# uint64 nanos + int64 asInt as decimal STRINGS, asDouble as a JSON
# number, enum aggregationTemporality as its int value, isMonotonic as
# a bool.  Flat datapoint rows use the same column convention as
# sources/otlpproto.py's metrics codec (stages/metrics.py shape):
# metric_* identity columns + value_double/value_int + time_unix_nano.

from .otlpproto import (_METRIC_ID_COLS, _TEMPORALITY,  # noqa: E402
                        _TEMPORALITY_INV, _bound_label)


def _metric_dp_json(r: dict, time_col: str, skip: set) -> dict:
    dp: dict = {}
    st = r.get("start_time_unix_nano")
    if st is not None:
        dp["startTimeUnixNano"] = str(int(st))
    ts = r.get(time_col)
    if ts is not None:
        dp["timeUnixNano"] = str(int(ts))
    vd, vi = r.get("value_double"), r.get("value_int")
    if vd is not None:
        dp["asDouble"] = float(vd)
    elif vi is not None:
        dp["asInt"] = str(int(vi))
    attrs = [{"key": k, "value": _any_value(v)} for k, v in r.items()
             if k not in skip and v is not None]
    if attrs:
        dp["attributes"] = attrs
    return dp


def _metrics_data_json(rows: list[dict], *, time_col: str,
                       resource_cols: list[str], scope_name: str) -> dict:
    """Flat Gauge/Sum datapoint rows -> one MetricsData JSON document
    (inverse of the reader; JSON twin of otlpproto.encode_metrics_data)."""
    skip = (set(resource_cols) | set(_METRIC_ID_COLS)
            | {time_col, "start_time_unix_nano", "value_double",
               "value_int"})
    groups: dict[tuple, dict[tuple, list[dict]]] = {}
    for r in rows:
        mtype = r.get("metric_type") or "Gauge"
        if mtype not in ("Gauge", "Sum"):
            raise NotImplementedError(
                f"metrics JSON encode supports Gauge/Sum; {mtype!r} rows "
                "use write_otlp_hist_json's sparse per-bucket shape")
        rkey = tuple(r.get(c) for c in resource_cols)
        ident = tuple(r.get(c) for c in _METRIC_ID_COLS)
        groups.setdefault(rkey, {}).setdefault(ident, []).append(
            _metric_dp_json(r, time_col, skip))
    resource_metrics = []
    for rkey, metrics in groups.items():
        ms = []
        for ident, dps in metrics.items():
            name, desc, unit, mtype, temp, mono = ident
            m: dict = {"name": str(name or "")}
            if desc is not None:
                m["description"] = str(desc)
            if unit is not None:
                m["unit"] = str(unit)
            if (mtype or "Gauge") == "Gauge":
                m["gauge"] = {"dataPoints": dps}
            else:
                body = {"dataPoints": dps,
                        "aggregationTemporality": _TEMPORALITY.get(
                            str(temp or "cumulative").lower(), 2)}
                if mono:
                    body["isMonotonic"] = True
                m["sum"] = body
            ms.append(m)
        res_attrs = [{"key": c, "value": _any_value(v)}
                     for c, v in zip(resource_cols, rkey) if v is not None]
        resource_metrics.append({
            "resource": {"attributes": res_attrs} if res_attrs else {},
            "scopeMetrics": [{"scope": {"name": scope_name},
                              "metrics": ms}]})
    return {"resourceMetrics": resource_metrics}


class OtlpMetricsJsonWriter:
    """map_batches stage: one MetricsData JSON line per batch
    (Gauge/Sum NumberDataPoint rows), same framing and naming
    conventions as OtlpJsonWriter."""

    def __init__(self, out_dir: str, *, time_col: str = "time_unix_nano",
                 resource_cols: Iterable[str] = (),
                 compression: str | None = None,
                 scope_name: str = "open_telemetry_opentelemetry_collector_contrib_ray"):
        self.out_dir = out_dir
        self.time_col = time_col
        self.resource_cols = list(resource_cols)
        self.compression = compression
        self.scope_name = scope_name
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        doc = _metrics_data_json(t.to_pylist(), time_col=self.time_col,
                                 resource_cols=self.resource_cols,
                                 scope_name=self.scope_name)
        line = json.dumps(doc, separators=(",", ":")).encode() + b"\n"
        digest = hashlib.md5(line).hexdigest()[:16]
        ext = {"gzip": ".jsonl.gz",
               "zstd": ".jsonl.zst"}.get(self.compression, ".jsonl")
        path = os.path.join(self.out_dir, f"metrics-{digest}{ext}")
        tmp = path + ".tmp"
        with _open_out(tmp, self.compression) as f:
            f.write(line)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_metrics_json(ds, out_dir: str, **kw) -> list[dict]:
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpMetricsJsonWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()


def write_otlp_hist_json(rows: list[dict], out_path: str, *,
                         metric_name: str, key_cols: Iterable[str],
                         bounds: Iterable[float], le_col: str = "le",
                         count_col: str = "n", unit: str | None = None,
                         temporality: str = "cumulative",
                         resource_cols: Iterable[str] = (),
                         compression: str | None = None,
                         scope_name: str =
                         "open_telemetry_opentelemetry_collector_contrib_ray") -> str:
    """Sparse per-bucket rows (histogram_agg output: one row per
    (keys..., le)) -> one MetricsData JSON line with a single Histogram
    metric; JSON twin of otlpproto.encode_histograms_data.  Driver-side
    helper: histogram results are already tiny aggregates."""
    key_cols, bounds = list(key_cols), [float(b) for b in bounds]
    resource_cols = list(resource_cols)
    labels = [_bound_label(b) for b in bounds] + ["inf"]
    lab_idx = {v: i for i, v in enumerate(labels)}
    groups: dict[tuple, dict[tuple, list[int]]] = {}
    for r in rows:
        rkey = tuple(r.get(c) for c in resource_cols)
        kv = tuple(r.get(c) for c in key_cols)
        counts = groups.setdefault(rkey, {}).setdefault(
            kv, [0] * len(labels))
        counts[lab_idx[str(r[le_col])]] += int(r[count_col])
    resource_metrics = []
    for rkey, dps in groups.items():
        points = []
        for kv, counts in sorted(dps.items(), key=lambda x: repr(x[0])):
            dp = {"count": str(sum(counts)),
                  "bucketCounts": [str(c) for c in counts],
                  "explicitBounds": bounds}
            attrs = [{"key": c, "value": _any_value(v)}
                     for c, v in zip(key_cols, kv) if v is not None]
            if attrs:
                dp["attributes"] = attrs
            points.append(dp)
        m: dict = {"name": metric_name}
        if unit is not None:
            m["unit"] = unit
        m["histogram"] = {"dataPoints": points,
                          "aggregationTemporality": _TEMPORALITY.get(
                              str(temporality).lower(), 2)}
        res_attrs = [{"key": c, "value": _any_value(v)}
                     for c, v in zip(resource_cols, rkey) if v is not None]
        resource_metrics.append({
            "resource": {"attributes": res_attrs} if res_attrs else {},
            "scopeMetrics": [{"scope": {"name": scope_name},
                              "metrics": [m]}]})
    line = json.dumps({"resourceMetrics": resource_metrics},
                      separators=(",", ":")).encode() + b"\n"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with _open_out(tmp, compression) as f:
        f.write(line)
    os.replace(tmp, out_path)
    return out_path


def _decode_metric_json(m: dict, res: dict, time_col: str,
                        le_col: str, count_col: str) -> list[dict]:
    meta: dict = {"metric_name": m.get("name", "")}
    if "description" in m:
        meta["metric_description"] = m["description"]
    if "unit" in m:
        meta["metric_unit"] = m["unit"]
    rows: list[dict] = []
    for kind in ("gauge", "sum"):
        if kind not in m:
            continue
        body = m[kind]
        meta["metric_type"] = kind.capitalize()
        if kind == "sum":
            temp = _TEMPORALITY_INV.get(
                int(body.get("aggregationTemporality", 0)))
            if temp is not None:
                meta["metric_aggregation_temporality"] = temp
            meta["metric_is_monotonic"] = bool(body.get("isMonotonic",
                                                        False))
        for dp in body.get("dataPoints", []):
            row = dict(res)
            row.update(meta)
            if "startTimeUnixNano" in dp:
                row["start_time_unix_nano"] = int(dp["startTimeUnixNano"])
            if "timeUnixNano" in dp:
                row[time_col] = int(dp["timeUnixNano"])
            if "asDouble" in dp:
                row["value_double"] = float(dp["asDouble"])
            elif "asInt" in dp:
                row["value_int"] = int(dp["asInt"])
            for a in dp.get("attributes", []):
                row[a["key"]] = _from_any_value(a["value"])
            rows.append(row)
    if "histogram" in m:
        body = m["histogram"]
        meta["metric_type"] = "Histogram"
        temp = _TEMPORALITY_INV.get(
            int(body.get("aggregationTemporality", 0)))
        if temp is not None:
            meta["metric_aggregation_temporality"] = temp
        for dp in body.get("dataPoints", []):
            bounds = [float(b) for b in dp.get("explicitBounds", [])]
            counts = [int(c) for c in dp.get("bucketCounts", [])]
            labels = [_bound_label(b) for b in bounds] + ["inf"]
            attrs = {a["key"]: _from_any_value(a["value"])
                     for a in dp.get("attributes", [])}
            for lab, cnt in zip(labels, counts):
                row = dict(res)
                row.update(attrs)
                row.update(meta)
                row[le_col] = lab
                row[count_col] = cnt
                rows.append(row)
    return rows


class OtlpMetricsJsonReaderStage:
    """map_batches over read_binary_files output: MetricsData JSON lines
    -> flat datapoint rows (Gauge/Sum) or sparse le-rows (Histogram);
    inverse of OtlpMetricsJsonWriter / write_otlp_hist_json."""

    def __init__(self, time_col: str = "time_unix_nano",
                 le_col: str = "le", count_col: str = "n"):
        self.time_col = time_col
        self.le_col = le_col
        self.count_col = count_col

    def __call__(self, batch) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        paths = batch.get("path")
        for i, data in enumerate(batch["bytes"]):
            raw = _read_bytes(bytes(data),
                              str(paths[i]) if paths is not None else "")
            for ln in raw.splitlines():
                if not ln.strip():
                    continue
                doc = json.loads(ln)
                for rm in doc.get("resourceMetrics", []):
                    res = {a["key"]: _from_any_value(a["value"])
                           for a in rm.get("resource", {})
                           .get("attributes", [])}
                    for sm in rm.get("scopeMetrics", []):
                        for m in sm.get("metrics", []):
                            rows.extend(_decode_metric_json(
                                m, res, self.time_col,
                                self.le_col, self.count_col))
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False) \
                       .replace_schema_metadata(None)


def read_otlp_metrics_json(path: str, time_col: str = "time_unix_nano"):
    import ray.data as rd

    files = rd.read_binary_files(path, include_paths=True,
                                 file_extensions=["jsonl", "gz", "zst"])
    return files.map_batches(OtlpMetricsJsonReaderStage(time_col),
                             batch_format="numpy")


# otlpjsonconnector signal-detection regexes, verbatim from the
# reference (connector/otlpjsonconnector/factory.go:18-20) — RE2 and
# Arrow share this syntax, so the match semantics are identical.
OTLPJSON_SIGNAL_PATTERNS = {
    "logs": r'^\{\s*"resourceLogs"\s*:\s*\[',
    "metrics": r'^\{\s*"resourceMetrics"\s*:\s*\[',
    "traces": r'^\{\s*"resourceSpans"\s*:\s*\[',
}


def classify_otlpjson(ds, text_col: str = "text", out_col: str = "signal"):
    """otlpjsonconnector analog (connector/otlpjsonconnector — each log
    body holding an embedded OTLP/JSON payload is routed to the
    matching signal pipeline; anything else is an invalid payload):
    map-only Arrow regex classification appending ``out_col`` in
    {"logs", "metrics", "traces", "invalid"}.  Decode of the selected
    signal is the existing OTLP JSON reader family (sources/otlpjson
    readers / write_routed for the per-signal split sink)."""
    import pyarrow.compute as _pc

    def classify(t: pa.Table) -> pa.Table:
        s = _pc.fill_null(_pc.cast(t.column(text_col), pa.string()), "")
        sig = pa.array(["invalid"] * t.num_rows, pa.string())
        for name, pat in OTLPJSON_SIGNAL_PATTERNS.items():
            m = _pc.match_substring_regex(s, pat)
            sig = _pc.if_else(m, pa.scalar(name, pa.string()), sig)
        return t.append_column(out_col, sig)

    return ds.map_batches(classify, batch_format="pyarrow")
