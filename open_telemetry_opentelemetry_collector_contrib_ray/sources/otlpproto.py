"""OTLP protobuf wire format for logs — hand-rolled encoder/decoder.

The reference fileexporter's ``format: proto`` mode writes each
marshaled request framed by a 4-byte big-endian length
(exporter/fileexporter/file_writer.go:45-50); the message schema is the
PUBLIC opentelemetry-proto ``logs/v1/logs.proto`` (LogsData →
ResourceLogs → ScopeLogs → LogRecord, common.proto AnyValue/KeyValue).
The schema is fixed and shallow, so this encodes/decodes it directly
with stdlib varint + struct — no generated code, no proto runtime.

Flat-table mapping matches the JSON writer (otlpjson.py): one row per
LogRecord; ``time_col`` (us) → time_unix_nano, ``body_col`` → body,
``attr_*``-style extra columns → record attributes, ``resource_cols``
→ Resource attributes (one ResourceLogs per distinct resource tuple).
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Iterable

import pyarrow as pa

# ------------------------------------------------------------ primitives


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _sf(field: int, s: str) -> bytes:
    return _ld(field, s.encode())


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _iter_fields(buf: bytes):
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = bytes(buf[pos:pos + ln])
            pos += ln
        elif wire == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# --------------------------------------------------------- common.proto


def _any_value(v) -> bytes:
    # AnyValue: string=1, bool=2, int=3, double=4, bytes=7
    if isinstance(v, bool):
        return _key(2, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        return _sf(1, v)
    if isinstance(v, int):
        return _key(3, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)
    if isinstance(v, float):
        return _key(4, 1) + struct.pack("<d", v)
    if isinstance(v, (bytes, bytearray)):
        return _ld(7, bytes(v))
    return _sf(1, str(v))


def _from_any_value(buf: bytes):
    for field, wire, v in _iter_fields(buf):
        if field == 1:
            return v.decode()
        if field == 2:
            return bool(v)
        if field == 3:
            return v - (1 << 64) if v >= (1 << 63) else v
        if field == 4:
            return struct.unpack("<d", struct.pack("<Q", v))[0]
        if field == 7:
            return v
    return None


def _kv(k: str, v) -> bytes:
    # KeyValue: key=1 string, value=2 AnyValue
    return _sf(1, k) + _ld(2, _any_value(v))


def _kv_decode(buf: bytes) -> tuple[str, object]:
    k, val = "", None
    for field, _w, v in _iter_fields(buf):
        if field == 1:
            k = v.decode()
        elif field == 2:
            val = _from_any_value(v)
    return k, val


# ------------------------------------------------------------ logs.proto


def encode_logs_data(rows: list[dict], *, body_col: str = "text",
                     time_col: str = "ts", resource_cols: Iterable[str] = (),
                     scope_name: str =
                     "open_telemetry_opentelemetry_collector_contrib_ray") -> bytes:
    """Flat rows -> one LogsData message (no framing)."""
    resource_cols = list(resource_cols)
    skip = set(resource_cols) | {body_col, time_col,
                                 "severity_number", "severity_text"}
    groups: dict[tuple, list[bytes]] = {}
    for r in rows:
        rec = bytearray()
        ts = r.get(time_col)
        if ts is not None:
            # time_unix_nano = 1 (fixed64); table timestamps are us.
            # Integer arithmetic only — float .timestamp() has ~0.24 us
            # resolution at 2020s epochs and would corrupt microseconds.
            if isinstance(ts, (int, float)):
                ns = int(ts) * 1000
            elif hasattr(ts, "value"):  # pandas.Timestamp: exact ns
                ns = int(ts.value)
            else:  # datetime.datetime
                from datetime import datetime, timedelta, timezone

                base = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
                epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
                ns = ((base - epoch) // timedelta(microseconds=1)) * 1000
            rec += _key(1, 1) + struct.pack("<Q", ns)
        if r.get("severity_number") is not None:
            rec += _key(2, 0) + _varint(int(r["severity_number"]))
        if r.get("severity_text") is not None:
            rec += _sf(3, str(r["severity_text"]))
        if r.get(body_col) is not None:
            rec += _ld(5, _any_value(r[body_col]))  # body = 5
        for k, v in r.items():
            if k in skip or v is None:
                continue
            rec += _ld(6, _kv(k, v))  # attributes = 6
        key = tuple(r.get(c) for c in resource_cols)
        groups.setdefault(key, []).append(bytes(rec))
    scope = _ld(1, _sf(1, scope_name))  # ScopeLogs.scope.name
    out = bytearray()
    for key, recs in groups.items():
        res = b"".join(_ld(1, _kv(c, v))  # Resource.attributes = 1
                       for c, v in zip(resource_cols, key) if v is not None)
        sl = scope + b"".join(_ld(2, rec) for rec in recs)  # log_records = 2
        rl = _ld(1, res) + _ld(2, sl)  # ResourceLogs.resource/scope_logs
        out += _ld(1, rl)  # LogsData.resource_logs = 1
    return bytes(out)


def decode_logs_data(buf: bytes, *, body_col: str = "text",
                     time_col: str = "ts") -> list[dict]:
    """One LogsData message -> flat rows (inverse of encode_logs_data)."""
    rows: list[dict] = []
    for f1, _w, rl in _iter_fields(buf):
        if f1 != 1:
            continue
        res_attrs: dict = {}
        scope_logs = []
        for f2, _w2, v2 in _iter_fields(rl):
            if f2 == 1:  # resource
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _kv_decode(v3)
                        res_attrs[k] = v
            elif f2 == 2:
                scope_logs.append(v2)
        for sl in scope_logs:
            for f3, _w3, v3 in _iter_fields(sl):
                if f3 != 2:  # log_records
                    continue
                row = dict(res_attrs)
                for f4, w4, v4 in _iter_fields(v3):
                    if f4 == 1:
                        row[time_col] = v4 // 1000  # ns -> us
                    elif f4 == 2:
                        row["severity_number"] = v4
                    elif f4 == 3:
                        row["severity_text"] = v4.decode()
                    elif f4 == 5:
                        row[body_col] = _from_any_value(v4)
                    elif f4 == 6:
                        k, v = _kv_decode(v4)
                        row[k] = v
                rows.append(row)
    return rows


# --------------------------------------------------------------- stages


class OtlpProtoWriter:
    """map_batches sink stage: one 4-byte-BE-length-framed LogsData
    message per batch (file_writer.go framing).  File names combine the
    content hash with the task id and a per-task batch ordinal: a
    retried task deterministically replays the same names (idempotent),
    while two byte-identical batches in different tasks — or in the
    same task — never collide into one file.  Emits a manifest row per
    file."""

    def __init__(self, out_dir: str, *, body_col: str = "text",
                 time_col: str = "ts", resource_cols: Iterable[str] = (),
                 scope_name: str =
                 "open_telemetry_opentelemetry_collector_contrib_ray"):
        self.out_dir = out_dir
        self.body_col = body_col
        self.time_col = time_col
        self.resource_cols = list(resource_cols)
        self.scope_name = scope_name
        self._seq = 0
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        msg = encode_logs_data(t.to_pylist(), body_col=self.body_col,
                               time_col=self.time_col,
                               resource_cols=self.resource_cols,
                               scope_name=self.scope_name)
        framed = struct.pack(">I", len(msg)) + msg
        digest = hashlib.md5(framed).hexdigest()[:16]
        try:
            import ray

            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        scope = hashlib.md5(tid.encode()).hexdigest()[:8]
        path = os.path.join(self.out_dir,
                            f"logs-{digest}-{scope}-{self._seq:04d}.binpb")
        self._seq += 1
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(framed)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_proto(ds, out_dir: str, **kw) -> list[dict]:
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpProtoWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()  # tiny: one row per written file


class OtlpProtoReaderStage:
    """map_batches over read_binary_files output: framed bytes -> rows."""

    def __init__(self, time_col: str = "ts", body_col: str = "text"):
        self.time_col = time_col
        self.body_col = body_col

    def __call__(self, batch: dict) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        for data in batch["bytes"]:
            buf = bytes(data)
            pos = 0
            while pos + 4 <= len(buf):
                (ln,) = struct.unpack_from(">I", buf, pos)
                pos += 4
                if pos + ln > len(buf):
                    raise ValueError(
                        f"truncated OTLP proto frame: header claims {ln} "
                        f"bytes, {len(buf) - pos} remain")
                rows.extend(decode_logs_data(buf[pos:pos + ln],
                                             body_col=self.body_col,
                                             time_col=self.time_col))
                pos += ln
        df = pd.DataFrame(rows)
        if self.time_col in df.columns:
            df[self.time_col] = pd.to_datetime(df[self.time_col], unit="us")
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)


def read_otlp_proto(path: str, time_col: str = "ts", body_col: str = "text"):
    import ray.data as rd

    files = rd.read_binary_files(path, file_extensions=["binpb"])
    return files.map_batches(OtlpProtoReaderStage(time_col, body_col),
                             batch_format="numpy")


# --------------------------------------------------------- metrics.proto
# (opentelemetry-proto metrics/v1/metrics.proto: MetricsData →
# ResourceMetrics → ScopeMetrics → Metric{gauge|sum} →
# NumberDataPoint.  Histogram/ExponentialHistogram/Summary rows in this
# engine use the flat per-bucket `le`-row shape, not a proto message —
# they raise NotImplementedError here by design.)

_TEMPORALITY = {"delta": 1, "cumulative": 2}
_TEMPORALITY_INV = {1: "delta", 2: "cumulative"}
_METRIC_ID_COLS = ("metric_name", "metric_description", "metric_unit",
                   "metric_type", "metric_aggregation_temporality",
                   "metric_is_monotonic")


def _number_dp(r: dict, time_col: str, skip: set) -> bytes:
    """NumberDataPoint: start_time=2/time=3 fixed64 ns, as_double=4,
    as_int=6 (sfixed64), attributes=7."""
    dp = bytearray()
    st = r.get("start_time_unix_nano")
    if st is not None:
        dp += _key(2, 1) + struct.pack("<Q", int(st))
    ts = r.get(time_col)
    if ts is not None:
        dp += _key(3, 1) + struct.pack("<Q", int(ts))
    vd, vi = r.get("value_double"), r.get("value_int")
    if vd is not None:
        dp += _key(4, 1) + struct.pack("<d", float(vd))
    elif vi is not None:
        dp += _key(6, 1) + struct.pack("<q", int(vi))
    for k, v in r.items():
        if k in skip or v is None:
            continue
        dp += _ld(7, _kv(k, v))
    return bytes(dp)


def encode_metrics_data(rows: list[dict], *,
                        time_col: str = "time_unix_nano",
                        resource_cols: Iterable[str] = (),
                        scope_name: str =
                        "open_telemetry_opentelemetry_collector_contrib_ray") -> bytes:
    """Flat datapoint rows -> one MetricsData message (no framing).
    Row shape = the engine's metric-table convention (stages/metrics.py):
    metric_* identity columns + value_double/value_int + time_unix_nano
    (ns) + attribute columns."""
    resource_cols = list(resource_cols)
    skip = (set(resource_cols) | set(_METRIC_ID_COLS)
            | {time_col, "start_time_unix_nano", "value_double",
               "value_int"})
    groups: dict[tuple, dict[tuple, list[bytes]]] = {}
    for r in rows:
        mtype = r.get("metric_type") or "Gauge"
        if mtype not in ("Gauge", "Sum"):
            raise NotImplementedError(
                f"metrics.proto encode supports Gauge/Sum; {mtype!r} rows "
                "use the engine's flat per-bucket le-row shape")
        rkey = tuple(r.get(c) for c in resource_cols)
        ident = tuple(r.get(c) for c in _METRIC_ID_COLS)
        groups.setdefault(rkey, {}).setdefault(ident, []).append(
            _number_dp(r, time_col, skip))
    scope = _ld(1, _sf(1, scope_name))
    out = bytearray()
    for rkey, metrics in groups.items():
        res = b"".join(_ld(1, _kv(c, v))
                       for c, v in zip(resource_cols, rkey) if v is not None)
        ms = bytearray()
        for ident, dps in metrics.items():
            name, desc, unit, mtype, temp, mono = ident
            m = bytearray(_sf(1, str(name or "")))
            if desc is not None:
                m += _sf(2, str(desc))
            if unit is not None:
                m += _sf(3, str(unit))
            points = b"".join(_ld(1, dp) for dp in dps)
            if (mtype or "Gauge") == "Gauge":
                m += _ld(5, points)                      # Metric.gauge
            else:
                body = bytearray(points)
                body += _key(2, 0) + _varint(
                    _TEMPORALITY.get(str(temp or "cumulative").lower(), 2))
                if mono:
                    body += _key(3, 0) + _varint(1)
                m += _ld(7, bytes(body))                 # Metric.sum
            ms += _ld(2, bytes(m))                       # ScopeMetrics.metrics
        sm = scope + bytes(ms)
        rm = _ld(1, res) + _ld(2, sm)
        out += _ld(1, rm)                                # resource_metrics
    return bytes(out)


def _decode_number_dp(buf: bytes, time_col: str) -> dict:
    row: dict = {}
    for f, w, v in _iter_fields(buf):
        if f == 2:
            row["start_time_unix_nano"] = v
        elif f == 3:
            row[time_col] = v
        elif f == 4:
            row["value_double"] = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif f == 6:
            row["value_int"] = v - (1 << 64) if v >= (1 << 63) else v
        elif f == 7:
            k, val = _kv_decode(v)
            row[k] = val
    return row


def decode_metrics_data(buf: bytes, *,
                        time_col: str = "time_unix_nano") -> list[dict]:
    """One MetricsData message -> flat datapoint rows (inverse of
    encode_metrics_data)."""
    rows: list[dict] = []
    for f1, _w, rm in _iter_fields(buf):
        if f1 != 1:
            continue
        res_attrs: dict = {}
        scopes = []
        for f2, _w2, v2 in _iter_fields(rm):
            if f2 == 1:
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _kv_decode(v3)
                        res_attrs[k] = v
            elif f2 == 2:
                scopes.append(v2)
        for sm in scopes:
            for f3, _w3, metric in _iter_fields(sm):
                if f3 != 2:
                    continue
                meta: dict = {"metric_name": None}
                data = []
                for f4, _w4, v4 in _iter_fields(metric):
                    if f4 == 1:
                        meta["metric_name"] = v4.decode()
                    elif f4 == 2:
                        meta["metric_description"] = v4.decode()
                    elif f4 == 3:
                        meta["metric_unit"] = v4.decode()
                    elif f4 == 5:
                        meta["metric_type"] = "Gauge"
                        data.append(v4)
                    elif f4 == 7:
                        meta["metric_type"] = "Sum"
                        data.append(v4)
                for body in data:
                    temp = mono = None
                    if meta["metric_type"] == "Sum":
                        # proto3 scalar defaults are absent on the wire:
                        # a Sum without field 3 IS is_monotonic=false
                        mono = False
                    dps = []
                    for f5, _w5, v5 in _iter_fields(body):
                        if f5 == 1:
                            dps.append(v5)
                        elif f5 == 2 and meta["metric_type"] == "Sum":
                            temp = _TEMPORALITY_INV.get(v5)
                        elif f5 == 3 and meta["metric_type"] == "Sum":
                            mono = bool(v5)
                    for dp in dps:
                        row = dict(res_attrs)
                        row.update(meta)
                        if temp is not None:
                            row["metric_aggregation_temporality"] = temp
                        if mono is not None:
                            row["metric_is_monotonic"] = mono
                        row.update(_decode_number_dp(dp, time_col))
                        rows.append(row)
    return rows


class OtlpMetricsProtoWriter(OtlpProtoWriter):
    """Framed MetricsData sink (same naming/framing as the logs writer)."""

    def __init__(self, out_dir: str, *, time_col: str = "time_unix_nano",
                 resource_cols: Iterable[str] = (),
                 scope_name: str =
                 "open_telemetry_opentelemetry_collector_contrib_ray"):
        super().__init__(out_dir, time_col=time_col,
                         resource_cols=resource_cols, scope_name=scope_name)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        msg = encode_metrics_data(t.to_pylist(), time_col=self.time_col,
                                  resource_cols=self.resource_cols,
                                  scope_name=self.scope_name)
        framed = struct.pack(">I", len(msg)) + msg
        digest = hashlib.md5(framed).hexdigest()[:16]
        try:
            import ray

            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        scope = hashlib.md5(tid.encode()).hexdigest()[:8]
        path = os.path.join(self.out_dir,
                            f"metrics-{digest}-{scope}-{self._seq:04d}.binpb")
        self._seq += 1
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(framed)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_metrics_proto(ds, out_dir: str, **kw) -> list[dict]:
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpMetricsProtoWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()


class OtlpMetricsProtoReaderStage:
    """map_batches over read_binary_files output: framed MetricsData
    bytes -> flat datapoint rows."""

    def __init__(self, time_col: str = "time_unix_nano"):
        self.time_col = time_col

    def __call__(self, batch: dict) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        for data in batch["bytes"]:
            buf = bytes(data)
            pos = 0
            while pos + 4 <= len(buf):
                (ln,) = struct.unpack_from(">I", buf, pos)
                pos += 4
                if pos + ln > len(buf):
                    raise ValueError(
                        f"truncated OTLP proto frame: header claims {ln} "
                        f"bytes, {len(buf) - pos} remain")
                rows.extend(decode_metrics_data(buf[pos:pos + ln],
                                                time_col=self.time_col))
                pos += ln
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False) \
                       .replace_schema_metadata(None)


def read_otlp_metrics_proto(path: str, time_col: str = "time_unix_nano"):
    import ray.data as rd

    files = rd.read_binary_files(path, file_extensions=["binpb"])
    return files.map_batches(OtlpMetricsProtoReaderStage(time_col),
                             batch_format="numpy")


# --------------------------------------------- metrics.proto: Histogram
# (the engine's canonical histogram shape is one row per (keys..., le)
# with a per-bucket count — histogram_agg's output; this codec maps
# that shape onto HistogramDataPoint: bucket_counts packed fixed64,
# explicit_bounds packed double, count = sum of buckets.)


def _bound_label(b: float) -> str:
    f = float(b)
    return str(int(f)) if f.is_integer() else str(f)


def encode_histograms_data(rows: list[dict], *, metric_name: str,
                           key_cols: Iterable[str], bounds: Iterable[float],
                           le_col: str = "le", count_col: str = "n",
                           unit: str | None = None,
                           temporality: str = "cumulative",
                           resource_cols: Iterable[str] = (),
                           scope_name: str =
                           "open_telemetry_opentelemetry_collector_contrib_ray") -> bytes:
    """Sparse per-bucket rows -> one MetricsData message with a single
    Histogram metric, one HistogramDataPoint per distinct key tuple
    (missing buckets are zero)."""
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
    scope = _ld(1, _sf(1, scope_name))
    out = bytearray()
    for rkey, dps in groups.items():
        res = b"".join(_ld(1, _kv(c, v))
                       for c, v in zip(resource_cols, rkey) if v is not None)
        body = bytearray()
        for kv, counts in sorted(dps.items(), key=lambda x: repr(x[0])):
            dp = bytearray()
            dp += _key(4, 1) + struct.pack("<Q", sum(counts))   # count
            dp += _ld(6, b"".join(struct.pack("<Q", c)          # bucket_counts
                                  for c in counts))
            dp += _ld(7, b"".join(struct.pack("<d", b)          # bounds
                                  for b in bounds))
            for c, v in zip(key_cols, kv):
                if v is not None:
                    dp += _ld(9, _kv(c, v))                     # attributes
            body += _ld(1, bytes(dp))                           # data_points
        body += _key(2, 0) + _varint(
            _TEMPORALITY.get(str(temporality).lower(), 2))
        m = bytearray(_sf(1, metric_name))
        if unit is not None:
            m += _sf(3, unit)
        m += _ld(9, bytes(body))                                # Metric.histogram
        rm = _ld(1, res) + _ld(2, scope + _ld(2, bytes(m)))
        out += _ld(1, rm)
    return bytes(out)


def decode_histograms_data(buf: bytes, *, le_col: str = "le",
                           count_col: str = "n") -> list[dict]:
    """Inverse of encode_histograms_data: one row per (attributes, le)
    bucket INCLUDING zero buckets; metric identity carried on each row."""
    rows: list[dict] = []
    for f1, _w, rm in _iter_fields(buf):
        if f1 != 1:
            continue
        res_attrs: dict = {}
        scopes = []
        for f2, _w2, v2 in _iter_fields(rm):
            if f2 == 1:
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _kv_decode(v3)
                        res_attrs[k] = v
            elif f2 == 2:
                scopes.append(v2)
        for sm in scopes:
            for f3, _w3, metric in _iter_fields(sm):
                if f3 != 2:
                    continue
                name = unit = None
                hists = []
                for f4, _w4, v4 in _iter_fields(metric):
                    if f4 == 1:
                        name = v4.decode()
                    elif f4 == 3:
                        unit = v4.decode()
                    elif f4 == 9:
                        hists.append(v4)
                for body in hists:
                    temp = None
                    dps = []
                    for f5, _w5, v5 in _iter_fields(body):
                        if f5 == 1:
                            dps.append(v5)
                        elif f5 == 2:
                            temp = _TEMPORALITY_INV.get(v5)
                    for dp in dps:
                        attrs: dict = {}
                        counts: list[int] = []
                        bounds: list[float] = []
                        for f6, w6, v6 in _iter_fields(dp):
                            if f6 == 6:
                                counts = [v for (v,) in struct.iter_unpack(
                                    "<Q", v6)]
                            elif f6 == 7:
                                bounds = [v for (v,) in struct.iter_unpack(
                                    "<d", v6)]
                            elif f6 == 9:
                                k, v = _kv_decode(v6)
                                attrs[k] = v
                        labels = [_bound_label(b) for b in bounds] + ["inf"]
                        for lab, cnt in zip(labels, counts):
                            row = dict(res_attrs)
                            row.update(attrs)
                            row["metric_name"] = name
                            row["metric_type"] = "Histogram"
                            if unit is not None:
                                row["metric_unit"] = unit
                            if temp is not None:
                                row["metric_aggregation_temporality"] = temp
                            row[le_col] = lab
                            row[count_col] = cnt
                            rows.append(row)
    return rows


# ------------------------------------------------- trace.proto: spans
# opentelemetry-proto trace/v1/trace.proto: TracesData.resource_spans=1
# -> ResourceSpans{resource=1, scope_spans=2} -> ScopeSpans{scope=1,
# spans=2} -> Span{trace_id=1, span_id=2, trace_state=3,
# parent_span_id=4, name=5, kind=6, start/end_time_unix_nano=7/8
# (fixed64), attributes=9, status=15{message=2, code=3}}.  Flat span
# rows use 32/16-hex id strings (TraceParser's normalized shape) and
# microsecond timestamps; proto3 absent-default fields are omitted on
# encode and restored as defaults on decode.

_SPAN_WELL_KNOWN = ("trace_id", "span_id", "parent_span_id",
                    "trace_state", "name", "kind", "start_ts", "end_ts",
                    "status_code", "status_message")


def encode_traces_data(rows: list[dict], *,
                       resource_cols: Iterable[str] = (),
                       scope_name: str =
                       "open_telemetry_opentelemetry_collector_contrib_ray") -> bytes:
    """Flat span rows -> one TracesData message (no framing)."""
    resource_cols = list(resource_cols)
    skip = set(resource_cols) | set(_SPAN_WELL_KNOWN)
    groups: dict[tuple, list[bytes]] = {}
    for r in rows:
        rec = bytearray()
        tid = r.get("trace_id")
        if tid:
            rec += _ld(1, bytes.fromhex(tid))
        sid = r.get("span_id")
        if sid:
            rec += _ld(2, bytes.fromhex(sid))
        if r.get("trace_state"):
            rec += _sf(3, str(r["trace_state"]))
        pid = r.get("parent_span_id")
        if pid:
            rec += _ld(4, bytes.fromhex(pid))
        if r.get("name"):
            rec += _sf(5, str(r["name"]))
        if r.get("kind"):
            rec += _key(6, 0) + _varint(int(r["kind"]))
        for field, col in ((7, "start_ts"), (8, "end_ts")):
            ts = r.get(col)
            if ts is not None:
                rec += _key(field, 1) + struct.pack("<Q", int(ts) * 1000)
        for k, v in r.items():
            if k in skip or v is None:
                continue
            rec += _ld(9, _kv(k, v))  # attributes = 9
        code, msg_s = r.get("status_code"), r.get("status_message")
        if code or msg_s:
            status = bytearray()
            if msg_s:
                status += _sf(2, str(msg_s))
            if code:
                status += _key(3, 0) + _varint(int(code))
            rec += _ld(15, bytes(status))
        key = tuple(r.get(c) for c in resource_cols)
        groups.setdefault(key, []).append(bytes(rec))
    scope = _ld(1, _sf(1, scope_name))  # ScopeSpans.scope.name
    out = bytearray()
    for key, recs in groups.items():
        res = b"".join(_ld(1, _kv(c, v))
                       for c, v in zip(resource_cols, key) if v is not None)
        ss = scope + b"".join(_ld(2, rec) for rec in recs)  # spans = 2
        rs = _ld(1, res) + _ld(2, ss)
        out += _ld(1, rs)  # TracesData.resource_spans = 1
    return bytes(out)


def decode_traces_data(buf: bytes) -> list[dict]:
    """One TracesData message -> flat span rows (inverse of
    encode_traces_data; absent proto3 defaults restore as kind=0,
    status_code=0, empty ids -> None)."""
    rows: list[dict] = []
    for f1, _w, rs in _iter_fields(buf):
        if f1 != 1:
            continue
        res_attrs: dict = {}
        scope_spans = []
        for f2, _w2, v2 in _iter_fields(rs):
            if f2 == 1:
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _kv_decode(v3)
                        res_attrs[k] = v
            elif f2 == 2:
                scope_spans.append(v2)
        for ss in scope_spans:
            for f3, _w3, v3 in _iter_fields(ss):
                if f3 != 2:  # spans
                    continue
                row = dict(res_attrs)
                row.update({"kind": 0, "status_code": 0})
                for f4, w4, v4 in _iter_fields(v3):
                    if f4 == 1:
                        row["trace_id"] = v4.hex()
                    elif f4 == 2:
                        row["span_id"] = v4.hex()
                    elif f4 == 3:
                        row["trace_state"] = v4.decode()
                    elif f4 == 4:
                        row["parent_span_id"] = v4.hex()
                    elif f4 == 5:
                        row["name"] = v4.decode()
                    elif f4 == 6:
                        row["kind"] = v4
                    elif f4 == 7:
                        row["start_ts"] = v4 // 1000
                    elif f4 == 8:
                        row["end_ts"] = v4 // 1000
                    elif f4 == 9:
                        k, v = _kv_decode(v4)
                        row[k] = v
                    elif f4 == 15:
                        for f5, _w5, v5 in _iter_fields(v4):
                            if f5 == 2:
                                row["status_message"] = v5.decode()
                            elif f5 == 3:
                                row["status_code"] = v5
                rows.append(row)
    return rows


class OtlpTracesProtoWriter(OtlpProtoWriter):
    """Framed TracesData sink (same naming/framing as the logs writer)."""

    def __init__(self, out_dir: str, *, resource_cols: Iterable[str] = (),
                 scope_name: str =
                 "open_telemetry_opentelemetry_collector_contrib_ray"):
        super().__init__(out_dir, resource_cols=resource_cols,
                         scope_name=scope_name)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        msg = encode_traces_data(t.to_pylist(),
                                 resource_cols=self.resource_cols,
                                 scope_name=self.scope_name)
        framed = struct.pack(">I", len(msg)) + msg
        digest = hashlib.md5(framed).hexdigest()[:16]
        try:
            import ray

            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        scope = hashlib.md5(tid.encode()).hexdigest()[:8]
        path = os.path.join(self.out_dir,
                            f"traces-{digest}-{scope}-{self._seq:04d}.binpb")
        self._seq += 1
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(framed)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})


def write_otlp_traces_proto(ds, out_dir: str, **kw) -> list[dict]:
    batch_size = kw.pop("batch_size", 8192)
    manifest = ds.map_batches(OtlpTracesProtoWriter(out_dir, **kw),
                              batch_format="pyarrow", batch_size=batch_size)
    return manifest.take_all()


class OtlpTracesProtoReaderStage:
    """map_batches over read_binary_files output: framed TracesData
    bytes -> flat span rows."""

    def __call__(self, batch: dict) -> pa.Table:
        import pandas as pd

        rows: list[dict] = []
        for data in batch["bytes"]:
            buf = bytes(data)
            pos = 0
            while pos + 4 <= len(buf):
                (ln,) = struct.unpack_from(">I", buf, pos)
                pos += 4
                if pos + ln > len(buf):
                    raise ValueError(
                        f"truncated OTLP proto frame: header claims {ln} "
                        f"bytes, {len(buf) - pos} remain")
                rows.extend(decode_traces_data(buf[pos:pos + ln]))
                pos += ln
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False) \
                       .replace_schema_metadata(None)


def read_otlp_traces_proto(path: str):
    import ray.data as rd

    files = rd.read_binary_files(path, file_extensions=["binpb"])
    return files.map_batches(OtlpTracesProtoReaderStage(),
                             batch_format="numpy")
