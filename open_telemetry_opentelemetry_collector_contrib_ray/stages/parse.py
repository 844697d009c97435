"""Parse stages: stanza-parser semantics over Arrow batches.

Reference semantics (not code):
- ParserOperator scaffold — parse_from/parse_to, on_error modes
  (send/drop, +quiet), skip-if predicate:
  /root/reference/pkg/stanza/operator/helper/parser.go:20-32,101-190.
- regex parser with named capture groups:
  pkg/stanza/operator/parser/regex/parser.go:30-62.
- severity text->24-level enum mapping:
  pkg/stanza/adapter/converter.go:166-220.
- time parser strptime/epoch layouts: pkg/stanza/operator/helper/time.go:19-42.

Execution model: every parser is a callable usable in
``Dataset.map_batches(fn_or_cls, batch_format="pyarrow")``.  Regex /
grok patterns compile ONCE (class __init__ == once per actor; plain
function closures compile at construction on the driver and ship
pickled).  A failed parse never throws per-row: on_error="send" keeps
the row and flags ``parse_failure`` (feeding lineage metrics),
"drop" removes it — mirroring the reference's modes.
"""

from __future__ import annotations

import json
import re
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ast import parse_condition
from ..functions.grok import expand_grok

ON_ERROR_MODES = ("send", "send_quiet", "drop", "drop_quiet", "propagate")


def _mask_or_none(condition: str | None):
    return parse_condition(condition) if condition else None


def _scatter(values: pa.Array, indices: pa.Array, n: int, typ: pa.DataType) -> pa.Array:
    """Place values[i] at position indices[i] in a length-n null array."""
    import numpy as np

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    pos = np.asarray(indices, dtype=np.int64)
    # build a take-index: null (-1 via mask) everywhere except selected rows
    take_idx = np.full(n, -1, dtype=np.int64)
    take_idx[pos] = np.arange(len(pos))
    take = pa.array(take_idx, mask=(take_idx < 0))
    return pc.take(values, take)


class RegexParser:
    """Named-capture regex parse of one string column into attr_* columns.

    parse_from: source column (default "text" == OTTL body).
    Matches stanza regex_parser (parser.go:30-62): named groups become
    attributes; non-matching rows follow on_error.
    """

    def __init__(
        self,
        pattern: str,
        parse_from: str = "text",
        prefix: str = "attr_",
        on_error: str = "send",
        if_condition: str | None = None,
        types: dict[str, pa.DataType] | None = None,
    ):
        if on_error not in ON_ERROR_MODES:
            raise ValueError(f"on_error must be one of {ON_ERROR_MODES}")
        self.pattern = pattern
        self.names = list(re.compile(pattern).groupindex)
        if not self.names:
            raise ValueError("pattern needs named capture groups")
        self.parse_from = parse_from
        self.prefix = prefix
        self.on_error = on_error
        self.skip_unless = _mask_or_none(if_condition)
        self.types = types or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        apply_mask = None
        idx = None
        if self.skip_unless is not None:
            # run the regex ONLY on rows the if-condition selects, then
            # scatter results back — on mixed corpora this cuts regex work
            # to the matching fraction (e.g. only tool turns)
            apply_mask = pc.fill_null(self.skip_unless(batch), False)
            if isinstance(apply_mask, pa.ChunkedArray):
                apply_mask = apply_mask.combine_chunks()
            idx = pc.indices_nonzero(apply_mask)
            sub = pc.take(src, idx)
            struct_sub = pc.extract_regex(sub, self.pattern)
            matched_sub = pc.is_valid(struct_sub)
            matched = _scatter(matched_sub, idx, batch.num_rows, pa.bool_())
            matched = pc.fill_null(matched, False)
        else:
            struct_sub = pc.extract_regex(src, self.pattern)  # null where no match
            matched = pc.is_valid(struct_sub)
        out = batch
        for name in self.names:
            vals = pc.struct_field(struct_sub, name)
            typ = self.types.get(name)
            if typ is not None:
                vals = pc.cast(vals, typ, safe=False)
            if idx is not None:
                vals = _scatter(vals, idx, batch.num_rows, vals.type)
            col = self.prefix + name
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, vals)
            else:
                out = out.append_column(col, vals)
        failure = pc.invert(matched)
        if apply_mask is not None:
            # rows the if-condition skipped are not failures
            failure = pc.and_(failure, apply_mask)
        if "parse_failure" in out.column_names:
            failure = pc.or_(failure, pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"), "parse_failure", failure)
        else:
            out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(pc.fill_null(failure, False)))
        elif self.on_error == "propagate":
            if pc.any(failure).as_py():
                raise ValueError(f"{pc.sum(failure).as_py()} rows failed to parse")
        return out


class GrokParser(RegexParser):
    """Grok-expression parse (ExtractGrokPatterns analog,
    ref pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:17-89).
    Grok -> regex expansion happens here, once, not per batch."""

    def __init__(self, grok_pattern: str, definitions: dict[str, str] | None = None,
                 named_captures_only: bool = True, **kw):
        super().__init__(expand_grok(grok_pattern, definitions, named_captures_only), **kw)


class JsonParser:
    """JSON body -> attr_* columns (stanza json_parser analog)."""

    def __init__(self, parse_from: str = "text", prefix: str = "attr_",
                 on_error: str = "send", keys: list[str] | None = None):
        self.parse_from = parse_from
        self.prefix = prefix
        self.on_error = on_error
        self.keys = keys  # known keys -> stable schema; None = infer from batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from).combine_chunks() if \
            isinstance(batch.column(self.parse_from), pa.ChunkedArray) else batch.column(self.parse_from)
        py = src.to_pylist()
        parsed: list[dict | None] = []
        for s in py:
            if s is None:
                parsed.append(None)
                continue
            try:
                v = json.loads(s)
                parsed.append(v if isinstance(v, dict) else None)
            except (ValueError, TypeError):
                parsed.append(None)
        keys = self.keys
        if keys is None:
            seen: dict[str, None] = {}
            for d in parsed:
                if d:
                    for k in d:
                        seen.setdefault(k)
            keys = list(seen)
        out = batch
        n = len(py)
        for k in keys:
            vals = [d.get(k) if d else None for d in parsed]
            try:
                arr = pa.array(vals)
                if pa.types.is_null(arr.type):  # all-failed batch: stable schema
                    arr = arr.cast(pa.string())
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                arr = pa.array([None if v is None else (v if isinstance(v, str) else json.dumps(v))
                                for v in vals], type=pa.string())
            col = self.prefix + k
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, arr)
            else:
                out = out.append_column(col, arr)
        failure = pa.array([d is None for d in parsed], type=pa.bool_())
        if "parse_failure" in out.column_names:
            failure = pc.or_(failure, pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"), "parse_failure", failure)
        else:
            out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(failure))
        return out


class JsonArrayParser:
    """JSON-array line -> columns (stanza jsonarray_parser analog,
    pkg/stanza/operator/parser/jsonarray/parser.go:29-90): with a
    ``header`` the array values map positionally onto named attr_*
    columns; without one the parsed list lands in a single column.
    Nested objects stringify (the reference does the same — "nested
    objects handled as a string")."""

    def __init__(self, parse_from: str = "text", header: list[str] | str | None = None,
                 prefix: str = "attr_", to: str = "parsed",
                 on_error: str = "send"):
        if isinstance(header, str):
            header = header.split(",")
        self.header = header
        self.parse_from = parse_from
        self.prefix = prefix
        self.to = to
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        py = batch.column(self.parse_from).to_pylist()
        parsed: list[list | None] = []
        for s in py:
            if s is None:
                parsed.append(None)
                continue
            try:
                v = json.loads(s)
                parsed.append(v if isinstance(v, list) else None)
            except (ValueError, TypeError):
                parsed.append(None)

        def norm(v):
            if v is None or isinstance(v, (str, int, float, bool)):
                return v
            return json.dumps(v)

        out = batch
        if self.header is not None:
            bad = [v is not None and len(v) != len(self.header) for v in parsed]
            for i, k in enumerate(self.header):
                vals = [norm(v[i]) if (v is not None and not b) else None
                        for v, b in zip(parsed, bad)]
                try:
                    arr = pa.array(vals)
                    if pa.types.is_null(arr.type):  # all-failed batch:
                        arr = arr.cast(pa.string())  # keep a stable schema
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    arr = pa.array([None if x is None else str(x) for x in vals],
                                   type=pa.string())
                out = out.append_column(self.prefix + k, arr)
            failure = pa.array([(v is None) or b for v, b in zip(parsed, bad)],
                               type=pa.bool_())
        else:
            vals = [None if v is None else [norm(x) for x in v] for v in parsed]
            try:
                arr = pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                arr = pa.array(
                    [None if v is None else [None if x is None else str(x) for x in v]
                     for v in vals], type=pa.list_(pa.string()))
            out = out.append_column(self.prefix + self.to, arr)
            failure = pa.array([v is None for v in parsed], type=pa.bool_())
        if "parse_failure" in out.column_names:
            failure = pc.or_(failure, pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", failure)
        else:
            out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(failure))
        return out


class TraceParser:
    """stanza trace_parser analog (pkg/stanza/operator/helper/trace.go):
    validates/normalizes hex trace_id (32 hex chars), span_id (16) and
    trace_flags (2) from attr columns into canonical lowercase columns;
    invalid values null out and flag parse_failure."""

    _SPECS = {"trace_id": 32, "span_id": 16, "trace_flags": 2}

    def __init__(self, trace_id_from: str = "attr_trace_id",
                 span_id_from: str = "attr_span_id",
                 flags_from: str = "attr_trace_flags"):
        self.sources = {"trace_id": trace_id_from, "span_id": span_id_from,
                        "trace_flags": flags_from}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        bad = pa.array(np.zeros(batch.num_rows, dtype=bool))
        for name, width in self._SPECS.items():
            src = self.sources[name]
            if src not in batch.column_names:
                continue
            col = pc.utf8_lower(pc.cast(batch.column(src), pa.string()))
            ok = pc.match_substring_regex(col, f"^[0-9a-f]{{{width}}}$")
            valid = pc.fill_null(ok, False)
            vals = pc.if_else(valid, col, pa.nulls(batch.num_rows, pa.string()))
            # a present-but-invalid value is a parse failure; absent is not
            bad = pc.or_(bad, pc.and_(pc.is_valid(batch.column(src)),
                                      pc.invert(valid)))
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, vals)
            else:
                out = out.append_column(name, vals)
        if "parse_failure" in out.column_names:
            bad = pc.or_(bad, pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", bad)
        else:
            out = out.append_column("parse_failure", bad)
        return out


class ScopeParser:
    """stanza scope_name parser analog (pkg/stanza/operator/parser/scope):
    copies a field into the entry's scope_name."""

    def __init__(self, parse_from: str):
        self.parse_from = parse_from

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch.column(self.parse_from), pa.string())
        if "scope_name" in batch.column_names:
            return batch.set_column(batch.column_names.index("scope_name"),
                                    "scope_name", vals)
        return batch.append_column("scope_name", vals)


class UriParser:
    """stanza uri_parser analog (pkg/stanza/operator/parser/uri):
    splits a URI field into scheme/host/port/path/query attr columns
    plus a query-parameter map column.  Malformed URIs flag
    parse_failure (on_error=send semantics)."""

    def __init__(self, parse_from: str = "text", prefix: str = "attr_",
                 on_error: str = "send"):
        self.parse_from = parse_from
        self.prefix = prefix
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from urllib.parse import parse_qsl, urlparse

        py = batch.column(self.parse_from).to_pylist()
        scheme, host, port, path, query, params, bad = [], [], [], [], [], [], []
        for s in py:
            try:
                u = urlparse(s or "")
                ok = bool(u.scheme or u.netloc or u.path)
                scheme.append(u.scheme or None)
                host.append(u.hostname)
                port.append(u.port)
                path.append(u.path or None)
                query.append(u.query or None)
                params.append(dict(parse_qsl(u.query)) if u.query else None)
                bad.append(not ok)
            except ValueError:
                for col in (scheme, host, port, path, query, params):
                    col.append(None)
                bad.append(True)
        out = batch
        p = self.prefix
        for name, arr in [("scheme", pa.array(scheme, pa.string())),
                          ("host", pa.array(host, pa.string())),
                          ("port", pa.array(port, pa.int64())),
                          ("path", pa.array(path, pa.string())),
                          ("query", pa.array(query, pa.string())),
                          ("query_params",
                           pa.array(params, pa.map_(pa.string(), pa.string())))]:
            out = out.append_column(p + name, arr)
        failure = pa.array(bad, pa.bool_())
        if "parse_failure" in out.column_names:
            failure = pc.or_(failure, pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", failure)
        else:
            out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(failure))
        return out


class KeyValueParser:
    """k=v pair parse (stanza key_value_parser analog,
    pkg/stanza/operator/parser/keyvalue/parser.go:42-47) — vectorized
    for the common "all keys known" case via one regex per key; batches
    containing quotes fall back to the exact parseutils.SplitString
    semantics (quotes protect either delimiter and strip)."""

    def __init__(self, keys: list[str], parse_from: str = "text", prefix: str = "attr_",
                 kv_sep: str = "=", pair_sep: str = " "):
        self.keys = keys
        self.parse_from = parse_from
        self.prefix = prefix
        self.kv_sep = kv_sep
        self.pair_sep = pair_sep
        sep = re.escape(kv_sep)
        stop = re.escape(pair_sep)
        self.patterns = {
            k: f"(?:^|{stop}){re.escape(k)}{sep}(?P<v>[^{stop}]*)" for k in keys
        }

    def _quoted_rows(self, src: pa.Array) -> dict[str, pa.Array]:
        """parseutils path: best-effort per row (a malformed pair skips
        that pair, a malformed row yields all-null, per stanza on_error)."""
        from ..functions.registry import _parseutils_split
        cols: dict[str, list] = {k: [] for k in self.keys}
        for s in src.to_pylist():
            parsed: dict[str, str] = {}
            if s is not None:
                try:
                    for pair in _parseutils_split(s, self.pair_sep):
                        k, sep, v = pair.partition(self.kv_sep)
                        if sep:
                            parsed[k.strip()] = v.strip()
                except ValueError:
                    pass  # unterminated quote: record parses to nothing
            for k in self.keys:
                cols[k].append(parsed.get(k))
        return {k: pa.array(v, type=pa.string()) for k, v in cols.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        out = batch
        has_quote = pc.any(pc.fill_null(
            pc.match_substring_regex(src, "[\"']"), False)).as_py()
        quoted = self._quoted_rows(src) if has_quote else None
        for k, pat in self.patterns.items():
            if quoted is not None:
                vals = quoted[k]
            else:
                struct = pc.extract_regex(src, pat)
                vals = pc.struct_field(struct, "v")
            col = self.prefix + k
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, vals)
            else:
                out = out.append_column(col, vals)
        return out


class CsvParser:
    """Delimited text -> named columns (stanza csv_parser analog)."""

    def __init__(self, header: list[str], parse_from: str = "text",
                 prefix: str = "attr_", delimiter: str = ","):
        self.header = header
        self.parse_from = parse_from
        self.prefix = prefix
        self.delimiter = delimiter

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        parts = pc.split_pattern(src, self.delimiter, max_splits=len(self.header) - 1)
        lens = pc.list_value_length(parts)
        out = batch
        for i, name in enumerate(self.header):
            ok = pc.fill_null(pc.greater(lens, i), False)
            safe = pc.if_else(ok, parts, pa.nulls(len(parts), parts.type))
            vals = pc.list_flatten(pc.list_slice(safe, i, i + 1))
            if len(vals) != len(parts):
                # ragged rows: fall back to padded python path
                py = parts.to_pylist()
                vals = pa.array([r[i] if r is not None and len(r) > i else None for r in py],
                                type=pa.string())
            out = out.append_column(self.prefix + name, vals)
        return out


# Severity mapping — the standard OTel severity model (24 levels), as used by
# the stanza converter (converter.go:166-220).  Text aliases -> number.
SEVERITY_NUMBER = {
    "trace": 1, "trace2": 2, "trace3": 3, "trace4": 4,
    "debug": 5, "debug2": 6, "debug3": 7, "debug4": 8,
    "info": 9, "info2": 10, "info3": 11, "info4": 12,
    "notice": 10,
    "warn": 13, "warning": 13, "warn2": 14, "warn3": 15, "warn4": 16,
    "error": 17, "err": 17, "error2": 18, "error3": 19, "error4": 20,
    "fatal": 21, "critical": 21, "crit": 21, "fatal2": 22, "fatal3": 23, "fatal4": 24,
    "emergency": 24, "emerg": 24, "severe": 17,
}
SEVERITY_TEXT = {
    1: "TRACE", 2: "TRACE2", 3: "TRACE3", 4: "TRACE4",
    5: "DEBUG", 6: "DEBUG2", 7: "DEBUG3", 8: "DEBUG4",
    9: "INFO", 10: "INFO2", 11: "INFO3", 12: "INFO4",
    13: "WARN", 14: "WARN2", 15: "WARN3", 16: "WARN4",
    17: "ERROR", 18: "ERROR2", 19: "ERROR3", 20: "ERROR4",
    21: "FATAL", 22: "FATAL2", 23: "FATAL3", 24: "FATAL4",
}


def _expand_severity_value(v) -> list[str]:
    """One custom-mapping value -> lookup keys, per the stanza builder
    (severity_builder.go:166-226): a literal (str/int), an HTTP-range
    alias '2xx'..'5xx' (builder.go:94-103, 205-212), or a
    {'min': a, 'max': b} dict — ranges expand to one string key per
    integer (builder.go:187-196 expandRange)."""
    http = {"2xx": (200, 299), "3xx": (300, 399),
            "4xx": (400, 499), "5xx": (500, 599)}
    if isinstance(v, str) and v.lower() in http:
        lo, hi = http[v.lower()]
        return [str(i) for i in range(lo, hi + 1)]
    if isinstance(v, dict) and "min" in v and "max" in v:
        lo, hi = int(v["min"]), int(v["max"])
        if lo > hi:
            lo, hi = hi, lo
        return [str(i) for i in range(lo, hi + 1)]
    if isinstance(v, bool):
        raise ValueError("bool is not a severity value")
    if isinstance(v, int):
        return [str(v)]
    if isinstance(v, str):
        return [v.lower()]
    raise ValueError(f"unsupported severity mapping value {v!r}")


class SeverityParser:
    """Map a severity-text column to the 24-level enum via dictionary lookup
    (pc.index_in + take — no per-row python).

    mapping: optional custom map {severity_name: value | [values]} per the
    stanza severity builder (severity_builder.go:118-146): each value is
    a literal, an HTTP-class alias ('2xx'..'5xx'), or {'min','max'} range;
    ranges expand to per-integer string keys exactly like expandRange.
    Custom entries overlay the builtin preset (getBuiltinMapping,
    severity_builder.go:16-84): 'none' starts empty; 'otel'/'aliases'
    map the canonical level names plus the numeric strings '1'..'24';
    'default' additionally recognizes warning*/err* (the reference's
    default branch) and this engine's extra aliases (notice/critical/
    emergency/severe)."""

    def __init__(self, parse_from: str = "attr_level",
                 out_number: str = "severity_number", out_text: str = "severity_text",
                 mapping: dict | None = None, preset: str = "default",
                 overwrite_text: bool = True):
        """overwrite_text (severity_builder.go:117, severity.go Parse):
        True -> severity_text is the CANONICAL level name (this engine's
        default — every oracle asserts canonical text); False -> the
        reference's default: severity_text keeps the raw input string,
        matched or not."""
        self.parse_from = parse_from
        self.out_number = out_number
        self.out_text = out_text
        self.overwrite_text = overwrite_text
        if preset not in ("default", "otel", "aliases", "none"):
            raise ValueError(f"unknown severity preset {preset!r}")
        if preset == "none":
            table = {}
        elif preset in ("otel", "aliases"):
            # canonical names only (no warning/err/notice aliases) +
            # numeric strings, severity_builder.go:20-71
            table = {k: v for k, v in SEVERITY_NUMBER.items()
                     if SEVERITY_TEXT[v].lower() == k}
            table.update({str(i): i for i in range(1, 25)})
        else:
            table = dict(SEVERITY_NUMBER)
            table.update({str(i): i for i in range(1, 25)})
        for sev_name, values in (mapping or {}).items():
            num = SEVERITY_NUMBER.get(str(sev_name).lower())
            if num is None:
                raise ValueError(f"unknown severity level {sev_name!r}")
            if not isinstance(values, (list, tuple)):
                values = [values]
            for v in values:
                for key in _expand_severity_value(v):
                    table[key] = num
        keys = list(table)
        self._keys = pa.array(keys, type=pa.string())
        self._nums = pa.array([table[k] for k in keys], type=pa.int32())
        canon = [SEVERITY_TEXT[table[k]] for k in keys]
        self._texts = pa.array(canon, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.parse_from not in batch.column_names:
            return batch
        raw = batch.column(self.parse_from).cast(pa.string())
        src = pc.utf8_lower(raw)
        idx = pc.index_in(src, value_set=self._keys)
        nums = pc.take(self._nums, idx)
        texts = pc.take(self._texts, idx) if self.overwrite_text else raw
        out = batch
        for col, arr in ((self.out_number, nums), (self.out_text, texts)):
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, arr)
            else:
                out = out.append_column(col, arr)
        return out


class TimeParser:
    """strptime / gotime / epoch time parse into a timestamp column
    (stanza time parser layouts — helper/time.go:19-42).

    layout_type "strptime" covers the full ctimefmt directive table
    (fractional seconds, numeric offsets, month names) via the
    vectorized regex core in stages/timeparse.py; "gotime" takes a Go
    reference-time layout; "epoch" takes layout s/ms/us/ns/s.ms/s.us/
    s.ns (helper/time.go epoch branch).  The legacy epoch_s/epoch_ms/
    epoch_us/epoch_ns names remain as aliases."""

    _EPOCH_ALIASES = {"epoch_s": "s", "epoch_ms": "ms",
                      "epoch_us": "us", "epoch_ns": "ns"}

    def __init__(self, parse_from: str, layout_type: str = "strptime",
                 layout: str = "%Y-%m-%dT%H:%M:%SZ", out: str = "time"):
        if layout_type in self._EPOCH_ALIASES:
            layout_type, layout = "epoch", self._EPOCH_ALIASES[layout_type]
        if layout_type not in ("strptime", "gotime", "epoch"):
            raise ValueError(layout_type)
        self.parse_from = parse_from
        self.layout_type = layout_type
        self.layout = layout
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.parse_from not in batch.column_names:
            return batch
        from .timeparse import parse_time_column

        ts = parse_time_column(batch.column(self.parse_from),
                               self.layout_type, self.layout)
        if self.out in batch.column_names:
            return batch.set_column(batch.column_names.index(self.out), self.out, ts)
        return batch.append_column(self.out, ts)


CRI_RE = (r"^(?P<cri_time>\S+) (?P<stream>stdout|stderr) "
          r"(?P<logtag>[PF]) ?(?P<log>.*)$")


class ContainerParser:
    """Container log-format parse (stanza `container` parser analog —
    the reference's heavy-parse benchmark scenario, testbed
    log_test.go:70-114): auto-detects docker json-file lines
    (``{"log":...,"stream":...,"time":...}``) vs containerd/cri-o CRI
    lines (``<rfc3339> stdout|stderr P|F msg``) per row and extracts
    log/stream/time (+ logtag for CRI).

    Partial-line (logtag=P) reassembly composes with the recombine stage
    (group by source, ordered stitch) — not done here, matching stanza
    where recombine is a separate operator."""

    def __init__(self, parse_from: str = "text", prefix: str = "attr_",
                 on_error: str = "send"):
        self.parse_from = parse_from
        self.prefix = prefix
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        is_docker = pc.starts_with(pc.fill_null(src, ""), "{")
        n = batch.num_rows
        # CRI path (vectorized regex on all rows; docker rows won't match)
        cri = pc.extract_regex(src, CRI_RE)
        cri_ok = pc.is_valid(cri)
        # docker path: batch the json lines through Arrow's C++ JSON reader
        # (one ndjson parse for the whole subset instead of per-row loads)
        d_idx_arr = pc.indices_nonzero(pc.fill_null(is_docker, False))
        d_log = [None] * n
        d_stream = [None] * n
        d_time = [None] * n
        d_ok = [False] * n
        if len(d_idx_arr):
            import io

            import pyarrow.json as pajson

            sub = pc.take(src, d_idx_arr)
            payload = "\n".join(s.replace("\n", "\\n") for s in sub.to_pylist())
            positions = d_idx_arr.to_pylist()
            try:
                jt = pajson.read_json(
                    io.BytesIO(payload.encode()),
                    parse_options=pajson.ParseOptions(
                        explicit_schema=pa.schema([("log", pa.string()),
                                                   ("stream", pa.string()),
                                                   ("time", pa.string())]),
                        unexpected_field_behavior="ignore"))
                logs = jt.column("log").to_pylist() if "log" in jt.column_names else [None] * len(positions)
                streams = jt.column("stream").to_pylist() if "stream" in jt.column_names else [None] * len(positions)
                times = jt.column("time").to_pylist() if "time" in jt.column_names else [None] * len(positions)
                for j, i in enumerate(positions):
                    d_log[i] = (logs[j] or "").rstrip("\n")
                    d_stream[i] = streams[j]
                    d_time[i] = times[j]
                    d_ok[i] = True
            except pa.ArrowInvalid:
                # a malformed json line poisons the block parse: fall back row-wise
                for j, i in enumerate(positions):
                    try:
                        rec = json.loads(sub[j].as_py())
                        d_log[i] = rec.get("log", "").rstrip("\n")
                        d_stream[i] = rec.get("stream")
                        d_time[i] = rec.get("time")
                        d_ok[i] = True
                    except (ValueError, TypeError):
                        pass
        d_ok_arr = pa.array(d_ok)
        log = pc.if_else(d_ok_arr, pa.array(d_log, pa.string()),
                         pc.struct_field(cri, "log"))
        stream = pc.if_else(d_ok_arr, pa.array(d_stream, pa.string()),
                            pc.struct_field(cri, "stream"))
        time_s = pc.if_else(d_ok_arr, pa.array(d_time, pa.string()),
                            pc.struct_field(cri, "cri_time"))
        logtag = pc.if_else(d_ok_arr, pa.repeat(pa.scalar("F"), n),
                            pc.struct_field(cri, "logtag"))
        out = batch
        for name, arr in [("log", log), ("stream", stream),
                          ("log_time", time_s), ("logtag", logtag)]:
            out = out.append_column(self.prefix + name, arr)
        failure = pc.invert(pc.or_(pc.fill_null(cri_ok, False), d_ok_arr))
        out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(failure))
        return out


def reassemble_container_partials(ds, source_cols=("attr_stream",),
                                  order_col: str = "attr_log_time",
                                  log_col: str = "attr_log",
                                  tag_col: str = "attr_logtag"):
    """Reassemble CRI partial lines (logtag=P ... then F) into full log
    records — stanza container parser's recombine step
    (pkg/stanza/operator/parser/container joins partials per source).

    Partitioning contract: rows for one (source...) stream are grouped by
    the shuffle and stitched in ``order_col`` order; each maximal run of
    P-lines followed by an F-line becomes one record.  A trailing run
    with no F flushes as-is (the reference's force-flush timeout analog).
    """
    import numpy as np
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(source_cols)

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized pass over every stream in the bucket: after the
        # (keys, order) sort, a global running count of full lines gives a
        # segment id whose (keys, seg) pairs are unique per segment — no
        # per-key reset needed because the count is nondecreasing and
        # increments after every full line inside a key.
        g = g.sort_values(keys + [order_col], kind="stable")
        is_full = (g[tag_col] != "P").to_numpy()
        seg = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            seg[1:] = np.cumsum(is_full[:-1])
        g = g.assign(__seg=seg)
        g[log_col] = g[log_col].fillna("")
        gb = g.groupby(keys + ["__seg"], sort=False)
        out = pd.DataFrame({
            order_col: gb[order_col].first(),
            log_col: gb[log_col].agg("".join),
            "n_partials": gb.size(),
        }).reset_index().drop(columns="__seg")
        return out

    return bucketed_group_transform(ds, keys, stitch)


class SyslogParser(RegexParser):
    """RFC3164-ish syslog parse (stanza syslog parser analog):
    ``<pri>Mon dd hh:mm:ss host app[pid]: msg``."""

    def __init__(self, **kw):
        super().__init__(
            r"^<(?P<priority>\d+)>(?P<syslog_ts>\w{3} [ \d]\d \d{2}:\d{2}:\d{2}) "
            r"(?P<hostname>\S+) (?P<appname>[\w.-]+)(?:\[(?P<pid>\d+)\])?: ?(?P<message>.*)$",
            **kw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        if self.prefix + "priority" in out.column_names:
            pri = pc.cast(out.column(self.prefix + "priority"), pa.int64(), safe=False)
            # severity = pri % 8, facility = pri // 8 (RFC5424 §6.2.1)
            out = out.append_column(self.prefix + "facility", pc.divide(pri, 8))
            out = out.append_column(self.prefix + "syslog_severity",
                                    pc.subtract(pri, pc.multiply(pc.divide(pri, 8), 8)))
        return out


_SYSLOG_SEVERITY_TEXT = ("emerg", "alert", "crit", "err", "warning",
                         "notice", "info", "debug")

_PRI_RE = re.compile(r"^<(\d{1,3})>")
_5424_HEADER_RE = re.compile(
    r"^(\d{1,3}) (\S+) (\S+) (\S+) (\S+) (\S+)(?: |$)")


def _unescape_sd_value(v: str) -> str:
    """go-syslog rfc5424 PARAM-VALUE: only \\", \\] and \\\\ escape."""
    if "\\" not in v:
        return v
    return (v.replace('\\"', '"').replace("\\]", "]")
            .replace("\\\\", "\\"))


def _parse_sd(t: str) -> tuple[dict | None, str | None]:
    """STRUCTURED-DATA [SP MSG] tail of an RFC5424 line.  Returns
    (sd-map-or-None, message-or-None); message whitespace is preserved
    verbatim (go-syslog machine semantics — see the octet-counting
    preserve-space case in stanza syslog data.go:330-360)."""
    if t == "-":
        return None, None
    if t.startswith("- "):
        return None, t[2:]
    if not t.startswith("["):
        raise ValueError("expecting a structured data section or nilvalue")
    sd: dict[str, dict[str, str]] = {}
    i, n = 0, len(t)
    while i < n and t[i] == "[":
        j = i + 1
        while j < n and t[j] not in " ]":
            j += 1
        sd_id = t[i + 1:j]
        if not sd_id:
            raise ValueError("expecting a structured data element id")
        params: dict[str, str] = {}
        i = j
        while i < n and t[i] == " ":
            i += 1  # SP before each SD-PARAM
            j = i
            while j < n and t[j] != "=":
                j += 1
            if j >= n or j + 1 >= n or t[j + 1] != '"':
                raise ValueError("expecting a structured data param value")
            name = t[i:j]
            k = j + 2
            buf: list[str] = []
            while k < n and t[k] != '"':
                if t[k] == "\\" and k + 1 < n:
                    buf.append(t[k:k + 2])
                    k += 2
                else:
                    buf.append(t[k])
                    k += 1
            if k >= n:
                raise ValueError("unterminated structured data param value")
            params[name] = _unescape_sd_value("".join(buf))
            i = k + 1
        if i >= n or t[i] != "]":
            raise ValueError("expecting a structured data element end")
        sd[sd_id] = params
        i += 1
    if i == n:
        return sd, None
    if t[i] != " ":
        raise ValueError("unexpected data after structured data section")
    return sd, t[i + 1:]


class Rfc5424SyslogParser:
    """RFC5424 syslog parse with the stanza syslog parser's field
    mapping and framing modes (pkg/stanza/operator/parser/syslog/
    parser.go:94-111,151-171 over go-syslog/v4 rfc5424):

    - ``enable_octet_counting``: RFC6587 ``MSGLEN SP MSG`` frames
      (parser.go:292-315; ``max_octets`` truncates the counted body).
    - ``non_transparent_framing_trailer``: "LF" or "NUL" RFC6587
      trailer stripped before parsing (parser.go:317-328).
    - ``allow_skip_pri_header``: a line with no ``<pri>`` prefix parses
      with an implicit ``<0>`` and drops priority/severity/facility
      from the output (parser.go:88-92,118-128).

    Output columns (``prefix`` + name): priority/facility/
    syslog_severity/version int64, severity_text, syslog_ts, hostname,
    appname, proc_id, msg_id, message strings (nilvalue ``-`` -> null,
    matching toSafeMap's pointer-delete), structured_data as
    map<str, map<str, str>>.  Rows that fail follow ``on_error``.
    """

    def __init__(self, parse_from: str = "text", prefix: str = "attr_",
                 on_error: str = "send",
                 enable_octet_counting: bool = False,
                 max_octets: int = 0,
                 non_transparent_framing_trailer: str | None = None,
                 allow_skip_pri_header: bool = False):
        if on_error not in ON_ERROR_MODES:
            raise ValueError(f"on_error must be one of {ON_ERROR_MODES}")
        if enable_octet_counting and non_transparent_framing_trailer:
            raise ValueError("octet_counting and non_transparent_framing "
                             "cannot be enabled at the same time")
        if non_transparent_framing_trailer not in (None, "LF", "NUL"):
            raise ValueError("invalid non_transparent_framing_trailer")
        self.parse_from = parse_from
        self.prefix = prefix
        self.on_error = on_error
        self.enable_octet_counting = enable_octet_counting
        self.max_octets = max_octets
        self.trailer = non_transparent_framing_trailer
        self.allow_skip_pri = allow_skip_pri_header

    def _parse_one(self, s: str) -> dict:
        if self.enable_octet_counting:
            m = re.match(r"^(\d+) ", s)
            if not m:
                raise ValueError("expecting an octet count")
            ln = int(m.group(1))
            if self.max_octets and ln > self.max_octets:
                raise ValueError("message too long")
            s = s[m.end():m.end() + ln]
        elif self.trailer is not None:
            s = s.rstrip("\n" if self.trailer == "LF" else "\x00")
        skip_pri = False
        pm = _PRI_RE.match(s)
        if pm:
            pri = int(pm.group(1))
            if pri > 191:
                raise ValueError("expecting a priority value in [0,191]")
            rest = s[pm.end():]
        elif self.allow_skip_pri and not self.enable_octet_counting:
            skip_pri, pri, rest = True, 0, s
        else:
            raise ValueError(
                "expecting a priority value within angle brackets")
        hm = _5424_HEADER_RE.match(rest)
        if not hm:
            raise ValueError("expecting an RFC5424 header")
        version = int(hm.group(1))
        if version < 1:
            raise ValueError("expecting a version value in the range 1-999")
        ts, host, app, proc, msgid = (
            None if g == "-" else g for g in hm.groups()[1:])
        sd, msg = _parse_sd(rest[hm.end():])
        out = {"version": version, "syslog_ts": ts, "hostname": host,
               "appname": app, "proc_id": proc, "msg_id": msgid,
               "message": msg, "structured_data": sd}
        if not skip_pri:
            out["priority"] = pri
            out["facility"] = pri // 8
            out["syslog_severity"] = pri % 8
            out["severity_text"] = _SYSLOG_SEVERITY_TEXT[pri % 8]
        return out

    _INT_COLS = ("priority", "facility", "syslog_severity", "version")
    _STR_COLS = ("severity_text", "syslog_ts", "hostname", "appname",
                 "proc_id", "msg_id", "message")

    # vectorized fast path: plain framing, single SD element without
    # escaped characters (the overwhelming shape); everything else
    # falls back to the faithful per-row scanner
    _FAST_RE = (r"^<(?P<pri>\d{1,3})>(?P<ver>[1-9]\d{0,2}) (?P<ts>\S+) "
                r"(?P<host>\S+) (?P<app>\S+) (?P<proc>\S+) "
                r"(?P<msgid>\S+) (?:-|\[(?P<sdid>[^\] \\\"]+)"
                r"(?P<params>(?: [^=\] ]+=\"[^\"\\]*\")*)\])"
                r"(?: (?P<msg>.*))?$")
    _PARAM_RE = re.compile(r' ([^=\] ]+)="([^"\\]*)"')

    @staticmethod
    def _nilnull(arr: pa.Array) -> pa.Array:
        return pc.if_else(pc.equal(arr, "-"),
                          pa.scalar(None, pa.string()), arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_arr = batch.column(self.parse_from)
        if isinstance(src_arr, pa.ChunkedArray):
            src_arr = src_arr.combine_chunks()
        n = len(src_arr)
        plain = (not self.enable_octet_counting and self.trailer is None
                 and not self.allow_skip_pri)
        arrs: dict[str, pa.Array] = {}
        if plain:
            # one RE2 pass; every derived column stays in Arrow
            st = pc.extract_regex(pc.cast(src_arr, pa.string()),
                                  self._FAST_RE)
            pri = pc.cast(pc.struct_field(st, "pri"), pa.int64(),
                          safe=False)
            valid = pc.and_kleene(pc.is_valid(st),
                                  pc.less_equal(pri, 191))
            valid_np = pc.fill_null(valid, False) \
                .to_numpy(zero_copy_only=False).astype(bool)
            fac = pc.divide(pri, 8)
            sev = pc.subtract(pri, pc.multiply(fac, 8))
            sev_text = pc.take(pa.array(_SYSLOG_SEVERITY_TEXT),
                               pc.if_else(valid, sev, 0))
            arrs = {"priority": pri, "facility": fac,
                    "syslog_severity": sev,
                    "version": pc.cast(pc.struct_field(st, "ver"),
                                       pa.int64(), safe=False),
                    "severity_text": sev_text,
                    "syslog_ts": self._nilnull(pc.struct_field(st, "ts")),
                    "hostname": self._nilnull(pc.struct_field(st, "host")),
                    "appname": self._nilnull(pc.struct_field(st, "app")),
                    "proc_id": self._nilnull(pc.struct_field(st, "proc")),
                    "msg_id": self._nilnull(pc.struct_field(st, "msgid"))}
            # RE2 non-participating groups extract as "" — a message is
            # genuinely empty only when the line ends with the SP
            # separator; otherwise MSG was absent (nil in go-syslog)
            msg = pc.struct_field(st, "msg")
            absent = pc.and_(pc.equal(msg, ""),
                             pc.invert(pc.ends_with(
                                 pc.cast(src_arr, pa.string()),
                                 pattern=" ")))
            arrs["message"] = pc.if_else(absent,
                                         pa.scalar(None, pa.string()), msg)
            sdids = pc.struct_field(st, "sdid").to_pylist()
            params = pc.struct_field(st, "params").to_pylist()
            sds: list = [
                {sdid: dict(self._PARAM_RE.findall(pblob))}
                if sdid else None
                for sdid, pblob in zip(sdids, params)]
            slow_idx = np.flatnonzero(~valid_np)
        else:
            valid_np = np.zeros(n, bool)
            sds = [None] * n
            slow_idx = np.arange(n)
        bad = ~valid_np
        if len(slow_idx):
            # faithful per-row scanner for rows the fast shape misses
            src = src_arr.to_pylist()
            patch: dict[str, dict[int, object]] = {
                k: {} for k in self._INT_COLS + self._STR_COLS}
            for i in slow_idx:
                s = src[i]
                try:
                    if s is None:
                        raise ValueError("null body")
                    rec = self._parse_one(s)
                except ValueError:
                    continue
                bad[i] = False
                for k in self._INT_COLS + self._STR_COLS:
                    patch[k][i] = rec.get(k)
                sds[i] = rec.get("structured_data")
            mask = pa.array(np.isin(np.arange(n), slow_idx) & ~bad)

            def patched(name: str, typ) -> pa.Array:
                base = arrs.get(name)
                vals = patch[name]
                if base is None:
                    py = [vals.get(i) for i in range(n)]
                    return pa.array(py, typ)
                if not vals:
                    return pc.if_else(pa.array(valid_np), base,
                                      pa.scalar(None, typ))
                repl = pa.array([vals.get(i) for i in sorted(vals)], typ)
                base = pc.if_else(pa.array(valid_np),
                                  pc.cast(base, typ),
                                  pa.scalar(None, typ))
                return pc.replace_with_mask(base, mask, repl)

            cols2 = {k: patched(k, pa.int64()) for k in self._INT_COLS}
            cols2.update({k: patched(k, pa.string())
                          for k in self._STR_COLS})
        else:
            cols2 = {k: pc.cast(arrs[k], pa.int64())
                     for k in self._INT_COLS}
            cols2.update({k: arrs[k] for k in self._STR_COLS})
        out = batch
        p = self.prefix
        for k in self._INT_COLS:
            out = out.append_column(p + k, cols2[k])
        for k in self._STR_COLS:
            out = out.append_column(p + k, cols2[k])
        out = out.append_column(
            p + "structured_data",
            pa.array(sds, pa.map_(pa.string(),
                                  pa.map_(pa.string(), pa.string()))))
        failure = pa.array(bad, pa.bool_())
        if "parse_failure" in out.column_names:
            failure = pc.or_(failure,
                             pc.fill_null(out.column("parse_failure"), False))
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", failure)
        else:
            out = out.append_column("parse_failure", failure)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(failure))
        return out


def make_tool_log_parser(on_error: str = "send") -> RegexParser:
    """The flagship transcript parser: tool log lines -> typed attributes.

    Only runs on role=="tool" rows (skip-if, like stanza's transformer
    `if` predicate — helper/transformer.go:30,55-60)."""
    return RegexParser(
        r"^(?P<log_ts>\S+) (?P<level>[A-Z]+) tool=(?P<tool_name>\w+) "
        r"status=(?P<status>\w+) latency_ms=(?P<latency_ms>\d+) msg=(?P<msg>.*)$",
        parse_from="text",
        on_error=on_error,
        if_condition='role == "tool"',
        types={"latency_ms": pa.int64()},
    )


class JournaldParser:
    """journalctl ``-o json`` export entries -> structured columns
    (the stanza journald input's parseJournalEntry, reference
    pkg/stanza/operator/input/journald/input.go:209-262).  The exec
    half (spawning journalctl with cursor/unit/grep flags) is live
    environment I/O outside a batch engine; its JSON-lines output
    arrives through any text source (file, tcp/stdin replay seam) and
    THIS stage is the parse half:

    - ``ts`` = __REALTIME_TIMESTAMP microseconds as timestamp[us]
      (input.go:216-230; missing/non-numeric -> parse_failure),
    - ``cursor`` = __CURSOR (the checkpoint token, input.go:248-257;
      missing -> parse_failure),
    - MESSAGE given as a journald byte ARRAY is converted to a string
      (convert_message_bytes, input.go:232-243),
    - ``keys`` body fields surface as ``attr_<key>`` string columns.

    Per-row json.loads loop — the JsonParser precedent (no vectorized
    JSON kernel in this stack); journald exports are control-plane
    sized, not the 100 TB data path."""

    def __init__(self, parse_from: str = "text",
                 keys: tuple = ("MESSAGE", "PRIORITY", "SYSLOG_IDENTIFIER",
                                "_SYSTEMD_UNIT", "_HOSTNAME"),
                 prefix: str = "attr_", convert_message_bytes: bool = True,
                 on_error: str = "send"):
        self.parse_from = parse_from
        self.keys = list(keys)
        self.prefix = prefix
        self.convert_message_bytes = convert_message_bytes
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        py = src.to_pylist()
        n = len(py)
        ts = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        cursor: list[str | None] = [None] * n
        attrs: dict[str, list] = {k: [None] * n for k in self.keys}
        failure = np.zeros(n, dtype=bool)
        for i, s in enumerate(py):
            try:
                body = json.loads(s) if s is not None else None
            except (ValueError, TypeError):
                body = None
            if not isinstance(body, dict):
                failure[i] = True
                continue
            try:
                ts[i] = int(body["__REALTIME_TIMESTAMP"])
            except (KeyError, ValueError, TypeError):
                failure[i] = True
                continue
            cur = body.get("__CURSOR")
            if not isinstance(cur, str):
                failure[i] = True
                continue
            cursor[i] = cur
            msg = body.get("MESSAGE")
            if self.convert_message_bytes and isinstance(msg, list):
                body["MESSAGE"] = bytes(
                    int(b) for b in msg
                    if isinstance(b, (int, float))).decode(
                        "utf-8", errors="replace")
            for k in self.keys:
                v = body.get(k)
                if v is not None:
                    attrs[k][i] = v if isinstance(v, str) else json.dumps(v)
        ts_arr = pa.array(
            [None if failure[i] else int(ts[i]) for i in range(n)],
            pa.int64()).cast(pa.timestamp("us"))
        out = batch.append_column("ts", ts_arr)
        out = out.append_column("cursor", pa.array(cursor, pa.string()))
        for k in self.keys:
            out = out.append_column(self.prefix + k,
                                    pa.array(attrs[k], pa.string()))
        fail = pa.array(failure)
        if "parse_failure" in out.column_names:
            fail = pc.or_(pc.fill_null(out.column("parse_failure"), False),
                          fail)
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", fail)
        else:
            out = out.append_column("parse_failure", fail)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(out.column("parse_failure")))
        return out


_WINEVT_SEV = {"1": "FATAL", "2": "ERROR", "3": "WARN", "4": "INFO"}
_WINEVT_RENDERED = {"Critical": "FATAL", "Error": "ERROR",
                    "Warning": "WARN", "Information": "INFO"}


class WindowsEventParser:
    """Windows Event Log XML records -> structured columns (the stanza
    windows input's EventXML/formattedBody contract, reference
    pkg/stanza/operator/input/windows/xml.go:15-120).  The live
    EvtSubscribe half is Windows API I/O; rendered event XML arrives
    through any text source and THIS stage is the parse:

    - System>TimeCreated@SystemTime (RFC3339Nano) -> ``ts``
      timestamp[us] (null on absence — the reference substitutes
      time.Now(), which a deterministic batch engine must not),
    - System fields -> ``provider_name``, ``event_id`` (int),
      ``record_id`` (int), ``computer``, ``channel``, ``level``,
    - RenderingInfo>Message -> ``message``,
    - severity per parseSeverity (xml.go:46-72): RenderingInfo>Level
      (Critical/Error/Warning/Information) wins, else numeric
      System>Level 1-4 -> FATAL/ERROR/WARN/INFO, else DEFAULT,
    - EventData Data elements -> ``event_data`` JSON (named ->
      object, unnamed -> array — parseEventData parity),
    - malformed XML / missing System -> parse_failure.

    stdlib ElementTree per row (the JsonParser loop precedent);
    namespaces are stripped so schema-qualified and bare events parse
    alike."""

    def __init__(self, parse_from: str = "text", on_error: str = "send"):
        self.parse_from = parse_from
        self.on_error = on_error

    @staticmethod
    def _strip(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET
        from datetime import datetime, timezone

        src = batch.column(self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        py = src.to_pylist()
        n = len(py)
        cols = {k: [None] * n for k in
                ("provider_name", "computer", "channel", "level",
                 "message", "severity_text", "event_data")}
        event_id = [None] * n
        record_id = [None] * n
        ts_us = [None] * n
        failure = np.zeros(n, dtype=bool)
        for i, s in enumerate(py):
            try:
                root = ET.fromstring(s) if s else None
            except ET.ParseError:
                root = None
            if root is None:
                failure[i] = True
                continue
            tags = {self._strip(c.tag): c for c in root}
            system = tags.get("System")
            if system is None:
                failure[i] = True
                continue
            sysel = {self._strip(c.tag): c for c in system}
            prov = sysel.get("Provider")
            if prov is not None:
                cols["provider_name"][i] = prov.get("Name")
            for name, col in (("Computer", "computer"),
                              ("Channel", "channel"), ("Level", "level")):
                el = sysel.get(name)
                if el is not None and el.text is not None:
                    cols[col][i] = el.text
            for name, out in (("EventID", event_id),
                              ("EventRecordID", record_id)):
                el = sysel.get(name)
                if el is not None and el.text:
                    try:
                        out[i] = int(el.text)
                    except ValueError:
                        pass
            tc = sysel.get("TimeCreated")
            if tc is not None and tc.get("SystemTime"):
                raw = tc.get("SystemTime").replace("Z", "+00:00")
                try:
                    dt = datetime.fromisoformat(raw)
                    ts_us[i] = int(dt.astimezone(timezone.utc)
                                   .timestamp() * 1_000_000)
                except ValueError:
                    pass
            rendered_level = None
            ri = tags.get("RenderingInfo")
            if ri is not None:
                riel = {self._strip(c.tag): c for c in ri}
                msg = riel.get("Message")
                if msg is not None:
                    cols["message"][i] = msg.text
                lv = riel.get("Level")
                if lv is not None:
                    rendered_level = lv.text
            if rendered_level:
                cols["severity_text"][i] = _WINEVT_RENDERED.get(
                    rendered_level, "DEFAULT")
            else:
                cols["severity_text"][i] = _WINEVT_SEV.get(
                    cols["level"][i], "DEFAULT")
            ed = tags.get("EventData")
            if ed is not None:
                named, unnamed = {}, []
                for c in ed:
                    if self._strip(c.tag) != "Data":
                        continue
                    if c.get("Name"):
                        named[c.get("Name")] = c.text
                    else:
                        unnamed.append(c.text)
                cols["event_data"][i] = json.dumps(
                    named if named else unnamed, sort_keys=True)
        out = batch
        out = out.append_column("ts", pa.array(ts_us, pa.int64())
                                .cast(pa.timestamp("us")))
        out = out.append_column("event_id", pa.array(event_id, pa.int64()))
        out = out.append_column("record_id", pa.array(record_id, pa.int64()))
        for k in ("provider_name", "computer", "channel", "level",
                  "message", "severity_text", "event_data"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        fail = pa.array(failure)
        if "parse_failure" in out.column_names:
            fail = pc.or_(pc.fill_null(out.column("parse_failure"), False),
                          fail)
            out = out.set_column(out.column_names.index("parse_failure"),
                                 "parse_failure", fail)
        else:
            out = out.append_column("parse_failure", fail)
        if self.on_error.startswith("drop"):
            out = out.filter(pc.invert(out.column("parse_failure")))
        return out
