"""OTTL-lite function registry: converters (pure) + editors (mutating).

Re-expresses the reference's function library
(/root/reference/pkg/ottl/ottlfuncs/, ~80 documented functions — see
pkg/ottl/ottlfuncs/README.md:46-60) as vectorized Arrow kernels.  Each
function takes the whole column (batch) at once instead of one record;
editors additionally honor the statement's ``where`` mask, which is the
columnar equivalent of OTTL executing a statement only on records whose
condition matched (pkg/ottl/parser.go:31 Statement.Execute).

User extension surface (mirrors the reference's custom-function map,
pkg/ottl/LANGUAGE.md:21-38): ``register_converter`` /
``register_editor`` decorators add entries; ``register_row_converter``
wraps a plain python row function for non-vectorizable logic.
"""

from __future__ import annotations

import fnmatch
import hashlib
import json
import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ast import ExprContext, Literal, Node, Path, as_array
from .grok import compile_grok, expand_grok

_REGISTRY: dict[str, tuple[str, Callable]] = {}


def register_converter(name: str):
    def deco(fn):
        _REGISTRY[name] = ("converter", fn)
        return fn

    return deco


def register_editor(name: str):
    def deco(fn):
        _REGISTRY[name] = ("editor", fn)
        return fn

    return deco


def register_row_converter(name: str, fn: Callable[..., Any]):
    """Fallback path for non-vectorizable user functions: fn(*scalar_args) per row."""

    @register_converter(name)
    def _wrapped(ctx: ExprContext, args: list[Node], _fn=fn):
        cols = [as_array(a.eval(ctx), ctx.n).to_pylist() for a in args]
        return pa.array([_fn(*vals) for vals in zip(*cols)] if cols else
                        [_fn() for _ in range(ctx.n)])


def get_function(name: str) -> tuple[str, Callable]:
    if name not in _REGISTRY:
        raise KeyError(f"unknown OTTL function {name!r}")
    return _REGISTRY[name]


def registered_functions() -> list[str]:
    return sorted(_REGISTRY)


# ------------------------------------------------------------ helpers


def _ev(ctx, node):
    return node.eval(ctx)


def _ev_arr(ctx, node):
    v = as_array(node.eval(ctx), ctx.n)
    return v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v


def _ev_scalar(node, ctx) -> Any:
    v = node.eval(ctx)
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        raise TypeError("expected a literal argument")
    return v


def _str(arr):
    return arr if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) \
        else arr.cast(pa.string())


def _map_prefix(node: Node) -> str:
    """attributes -> attr_, resource[.attributes] -> res_, cache -> cache_."""
    if not isinstance(node, Path):
        raise TypeError("expected a map path (attributes / resource / cache)")
    s = node.segments
    if s[0] == "attributes":
        return "attr_"
    if s[0] == "resource":
        return "res_"
    if s[0] == "cache":
        return "cache_"
    raise TypeError(f"not a map path: {'.'.join(s)}")


def _go_repl(repl: str) -> str:
    """Go/RE2 $1-style replacement -> RE2 rewrite \\1 style used by Arrow."""
    return re.sub(r"\$(\d+)", r"\\\1", repl)


# ------------------------------------------------------------ string converters


@register_converter("Concat")
def _concat(ctx, args):
    # Concat([parts...], delimiter) — ref func_concat.go
    parts = args[0].eval(ctx)
    if not isinstance(parts, list):
        raise TypeError("Concat expects a list first argument")
    delim = _ev_scalar(args[1], ctx) if len(args) > 1 else ""
    arrs = [_str(as_array(p, ctx.n)) for p in parts]
    return pc.binary_join_element_wise(*arrs, delim)


@register_converter("Split")
def _split(ctx, args):
    return pc.split_pattern(_str(_ev_arr(ctx, args[0])), _ev_scalar(args[1], ctx))


@register_converter("Substring")
def _substring(ctx, args):
    start = _ev_scalar(args[1], ctx)
    length = _ev_scalar(args[2], ctx)
    return pc.utf8_slice_codeunits(_str(_ev_arr(ctx, args[0])), start, start + length)


@register_converter("ConvertCase")
def _convert_case(ctx, args):
    arr = _str(_ev_arr(ctx, args[0]))
    mode = _ev_scalar(args[1], ctx)
    if mode == "lower":
        return pc.utf8_lower(arr)
    if mode == "upper":
        return pc.utf8_upper(arr)
    if mode == "snake":
        py = arr.to_pylist()
        out = [None if s is None else re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", s).lower().replace("-", "_").replace(" ", "_") for s in py]
        return pa.array(out, type=pa.string())
    if mode == "camel":
        # strcase.ToCamel ("foo_bar" -> "FooBar"; e2e_test.go:369-373)
        py = arr.to_pylist()
        out = [None if s is None else
               "".join(w[:1].upper() + w[1:]
                       for w in re.split(r"[_\- ]+", s) if w)
               for s in py]
        return pa.array(out, type=pa.string())
    raise ValueError(f"ConvertCase mode {mode!r}")


@register_converter("Trim")
def _trim(ctx, args):
    chars = _ev_scalar(args[1], ctx) if len(args) > 1 else " "
    return pc.utf8_trim(_str(_ev_arr(ctx, args[0])), chars)


@register_converter("Len")
def _len(ctx, args):
    arr = _ev_arr(ctx, args[0])
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return pc.utf8_length(arr)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        return pc.list_value_length(arr)
    if pa.types.is_map(arr.type):
        # Go len() of a map — entry count from the offsets (no
        # list_value_length kernel for map in this pyarrow)
        off = arr.offsets.to_numpy(zero_copy_only=False)
        lens = pa.array(np.diff(off).astype(np.int32))
        return pc.if_else(pc.is_null(arr),
                          pa.nulls(len(arr), pa.int32()), lens)
    if pa.types.is_struct(arr.type):
        # struct-encoded map: Go len(map) counts PRESENT entries, so
        # count non-null fields per row; null rows stay null
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = pa.nulls(len(arr), pa.int32()) if arr.type.num_fields == 0 \
            else None
        if n is None:
            acc = np.zeros(len(arr), dtype=np.int32)
            for i in range(arr.type.num_fields):
                acc += pc.is_valid(arr.field(i)).to_numpy(
                    zero_copy_only=False).astype(np.int32)
            n = pa.array(acc, pa.int32())
        return pc.if_else(pc.is_null(arr), pa.nulls(len(arr), pa.int32()), n)
    if pa.types.is_null(arr.type):
        return pa.nulls(len(arr), pa.int32())
    return pc.binary_length(arr)


@register_converter("Format")
def _format(ctx, args):
    # Format(fmt, [args...]) — ref func_format.go (Sprintf); row loop (rare in hot paths)
    fmt = _ev_scalar(args[0], ctx)
    vals = args[1].eval(ctx)
    if not isinstance(vals, list):
        raise TypeError("Format expects a list second argument")
    cols = [as_array(v, ctx.n).to_pylist() for v in vals]
    return pa.array([fmt % tuple(row) for row in zip(*cols)], type=pa.string())


# ------------------------------------------------------------ type converters / checks


def _coerce_float(arr: pa.Array) -> pa.Array:
    """String -> float64 with invalid values as NULL, per row (vectorized
    pd.to_numeric coerce).  safe=False casts RAISE on bad strings, which
    would revert the statement for the whole batch under error_mode
    ignore; per-row nulling keeps results independent of batch splits
    (engine convention — Time() already nulls via error_is_null)."""
    import pandas as pd

    f = pd.to_numeric(arr.to_pandas(), errors="coerce")
    return pa.array(f, type=pa.float64(), from_pandas=True)


@register_converter("Int")
def _int(ctx, args):
    arr = _ev_arr(ctx, args[0])
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return pc.cast(pc.trunc(_coerce_float(arr)), pa.int64(), safe=False)
    if pa.types.is_floating(arr.type):
        return pc.cast(pc.trunc(arr), pa.int64(), safe=False)
    return arr.cast(pa.int64())


@register_converter("Double")
def _double(ctx, args):
    arr = _ev_arr(ctx, args[0])
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return _coerce_float(arr)
    return pc.cast(arr, pa.float64(), safe=False)


@register_converter("String")
def _string(ctx, args):
    raw = args[0].eval(ctx)
    if isinstance(raw, list):
        # pdata slice rendering (e2e: String([1,2,3]) -> "[1,2,3]"):
        # JSON-compact with Go bool casing
        def r(v):
            if isinstance(v, Node):
                v = _ev_scalar(v, ctx)
            if isinstance(v, pa.Scalar):
                v = v.as_py()
            return v
        return pa.scalar(json.dumps([r(v) for v in raw],
                                    separators=(",", ":")), pa.string())
    arr = as_array(raw, ctx.n)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type):
        return pc.strftime(arr, format="%Y-%m-%dT%H:%M:%S.%fZ")
    if pa.types.is_boolean(arr.type):
        return pc.if_else(arr, "true", "false")
    return arr.cast(pa.string())


@register_converter("IsMatch")
def _is_match(ctx, args):
    return pc.match_substring_regex(_str(_ev_arr(ctx, args[0])), _ev_scalar(args[1], ctx))


def _type_check(pred):
    def fn(ctx, args):
        arr = _ev_arr(ctx, args[0])
        ok = pred(arr.type)
        return pc.and_(pc.is_valid(arr), pa.array([ok] * ctx.n, type=pa.bool_()))

    return fn


_REGISTRY["IsString"] = ("converter", _type_check(lambda t: pa.types.is_string(t) or pa.types.is_large_string(t)))
_REGISTRY["IsInt"] = ("converter", _type_check(pa.types.is_integer))
_REGISTRY["IsDouble"] = ("converter", _type_check(pa.types.is_floating))
_REGISTRY["IsBool"] = ("converter", _type_check(pa.types.is_boolean))
_REGISTRY["IsMap"] = ("converter", _type_check(lambda t: pa.types.is_struct(t) or pa.types.is_map(t)))
_REGISTRY["IsList"] = ("converter", _type_check(lambda t: pa.types.is_list(t) or pa.types.is_large_list(t)))


# ------------------------------------------------------------ hash converters


def _hex_digest(algo: str):
    def fn(ctx, args):
        py = _str(_ev_arr(ctx, args[0])).to_pylist()
        h = getattr(hashlib, algo)
        return pa.array(
            [None if s is None else h(s.encode()).hexdigest() for s in py],
            type=pa.string(),
        )

    return fn


_REGISTRY["SHA256"] = ("converter", _hex_digest("sha256"))
_REGISTRY["SHA1"] = ("converter", _hex_digest("sha1"))
_REGISTRY["SHA512"] = ("converter", _hex_digest("sha512"))  # func_sha512.go
_REGISTRY["MD5"] = ("converter", _hex_digest("md5"))


@register_converter("FNV")
def _fnv(ctx, args):
    # FNV-1a 64-bit (ref func_fnv.go uses 64-bit sum); row loop — use for
    # small/cold paths; the sampler stage has a vectorized variant.
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        h = 0xCBF29CE484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out.append(h - (1 << 64) if h >= (1 << 63) else h)
    return pa.array(out, type=pa.int64())


def hex_encode(v):
    """func_hex.go: hex of the value's BINARY representation — bool one
    byte, ints 8 big-endian bytes (int64; wider Python ints mask to 64
    bits instead of raising struct.error), floats the 8 IEEE-754 bytes,
    strings/bytes their raw bytes (e2e_test.go:502-523 expectations)."""
    import struct

    if v is None:
        return None
    if isinstance(v, bool):
        return format(int(v), "02x")
    if isinstance(v, int):
        return struct.pack(">Q", v & 0xFFFFFFFFFFFFFFFF).hex()
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v).encode().hex()


@register_converter("Hex")
def _hex(ctx, args):
    arr = _ev_arr(ctx, args[0])
    return pa.array([hex_encode(v) for v in arr.to_pylist()],
                    type=pa.string())


@register_converter("MD5Number")
def _md5_number(ctx, args):
    """Lower 64 bits of md5 as uint64-in-int64 — matches DuckDB md5_number_lower
    (little-endian of the first 8 digest bytes) for oracle parity."""
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
        else:
            v = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            out.append(v)
    return pa.array(out, type=pa.uint64())


# ------------------------------------------------------------ time converters

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d)")
_DUR_NS = {"ns": 1.0, "us": 1e3, "µs": 1e3, "μs": 1e3, "ms": 1e6,
           "s": 1e9, "m": 6e10, "h": 3.6e12, "d": 8.64e13}
_DUR_TERM_RE = re.compile(r"(\d+(?:\.\d*)?|\.\d+)([a-zµμ]+)")


def parse_duration_ns(s: str) -> int:
    """Go time.ParseDuration grammar (func_duration.go delegates to it):
    optional leading sign, bare "0", one or more <number><unit> terms
    with optional fractions; units ns/us/µs/μs/ms/s/m/h (plus "d"=24h,
    an extension the reference does not accept).  Result in int ns."""
    orig, neg = s, False
    if s and s[0] in "+-":
        neg = s[0] == "-"
        s = s[1:]
    if s == "0":
        return 0
    if not s:
        raise ValueError(f"invalid duration {orig!r}")
    total = 0.0
    while s:
        m = _DUR_TERM_RE.match(s)
        if not m:
            raise ValueError(f"invalid duration {orig!r}")
        unit = m.group(2)
        if unit not in _DUR_NS:
            raise ValueError(
                f"unknown unit {unit!r} in duration {orig!r}")
        total += float(m.group(1)) * _DUR_NS[unit]
        s = s[m.end():]
    return int(-total if neg else total)


def parse_duration_us(s: str) -> int:
    """Legacy micros entry point (truncates toward zero, like Go's
    Duration.Microseconds)."""
    return int(parse_duration_ns(s) / 1000)


def _dur_to_us(v) -> int:
    """Duration argument -> int micros: accepts a Go duration string or
    the duration scalar another converter (Duration, Time arithmetic)
    produced."""
    import datetime

    if isinstance(v, pa.Scalar):
        v = v.as_py()
    if isinstance(v, datetime.timedelta):
        return (v.days * 86_400_000_000 + v.seconds * 1_000_000
                + v.microseconds)
    return parse_duration_us(v)


@register_converter("Duration")
def _duration(ctx, args):
    """Duration(str) -> duration[ns] — ref func_duration.go wraps
    time.ParseDuration, whose result is int nanoseconds."""
    return pa.scalar(parse_duration_ns(_ev_scalar(args[0], ctx)),
                     pa.duration("ns"))


@register_converter("Time")
def _time(ctx, args):
    """Time(target, format[, location[, locale]]) — ref func_time.go:
    ctime directives via timeutils.ParseStrptime.  The full directive
    table (fractional %L/%f/%s, offsets %z/%i/%j/%k, month names,
    am/pm) parses through the vectorized core in stages/timeparse.py;
    location only supports offset-bearing inputs / UTC (no tzdata in
    this environment) and locale is not supported."""
    from ..stages.timeparse import parse_time_column

    fmt = _ev_scalar(args[1], ctx)
    return parse_time_column(_str(_ev_arr(ctx, args[0])), "strptime", fmt)


def _time_ns(arr) -> pa.Array:
    """Normalize a time value to int64 UNIX NANOS regardless of the
    column's timestamp unit (a timestamp[ns] column cast straight to
    int64 is nanos while Time()'s output is micros — unit-blind casts
    silently mix the two; UnixNano on a ns column even overflows)."""
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.timestamp("ns", tz=arr.type.tz)).cast(pa.int64())
    # non-timestamp ints keep the engine's legacy micros convention
    return pc.multiply(arr.cast(pa.int64()), 1_000)


@register_converter("UnixSeconds")
def _unix_seconds(ctx, args):
    return pc.divide(_time_ns(_ev_arr(ctx, args[0])), 1_000_000_000)


@register_converter("UnixMilli")
def _unix_milli(ctx, args):
    return pc.divide(_time_ns(_ev_arr(ctx, args[0])), 1_000_000)


@register_converter("UnixMicro")
def _unix_micro(ctx, args):
    return pc.divide(_time_ns(_ev_arr(ctx, args[0])), 1_000)


@register_converter("UnixNano")
def _unix_nano(ctx, args):
    return _time_ns(_ev_arr(ctx, args[0]))


@register_converter("TruncateTime")
def _truncate_time(ctx, args):
    arr = _ev_arr(ctx, args[0])
    us = _dur_to_us(_ev_scalar(args[1], ctx))
    # work in the array's own unit so the cast back is lossless
    step = us
    if pa.types.is_timestamp(arr.type):
        step = us * {"s": 1, "ms": 1, "us": 1, "ns": 1000}[arr.type.unit] \
            if arr.type.unit == "ns" else us // {
                "s": 1_000_000, "ms": 1_000, "us": 1}[arr.type.unit]
        step = max(step, 1)
    ints = arr.cast(pa.int64())
    return pc.multiply(pc.divide(ints, step), step).cast(arr.type)


for _name, _kern in [("Hour", "hour"), ("Minute", "minute"), ("Second", "second"),
                     ("Day", "day"), ("Month", "month"), ("Year", "year")]:
    def _mk(kern):
        def fn(ctx, args):
            return getattr(pc, kern)(_ev_arr(ctx, args[0])).cast(pa.int64())
        return fn
    _REGISTRY[_name] = ("converter", _mk(_kern))


# duration components over a duration value (internally microseconds):
# Hours/Minutes/Seconds return float64, Milliseconds/Microseconds/
# Nanoseconds return int64 — matching Go time.Duration accessors used by
# func_hours.go, func_minutes.go, func_seconds.go, func_milliseconds.go,
# func_microseconds.go, func_nanoseconds.go
def _dur_as_ns(arr) -> pa.Array:
    """Normalize a duration value to int64 NANOS regardless of the
    array's duration unit (unit-blind int64 casts silently mix units —
    same hazard as _time_ns); bare ints keep the engine's legacy
    micros convention."""
    if isinstance(arr, pa.Scalar):
        arr = pa.array([arr.as_py()], type=arr.type)
    if pa.types.is_duration(arr.type):
        return arr.cast(pa.duration("ns")).cast(pa.int64())
    return pc.multiply(arr.cast(pa.int64()), 1_000)


def _mk_dur(div: float, as_float: bool):
    def fn(ctx, args):
        ns = _dur_as_ns(_ev_arr(ctx, args[0]))
        if as_float:
            return pc.divide(pc.cast(ns, pa.float64()), div)
        return pc.divide(ns, int(div))
    return fn


for _name, _div, _f in [("Hours", 3.6e12, True), ("Minutes", 6e10, True),
                        ("Seconds", 1e9, True), ("Milliseconds", 1e6, False),
                        ("Microseconds", 1e3, False),
                        ("Nanoseconds", 1.0, False)]:
    _REGISTRY[_name] = ("converter", _mk_dur(_div, _f))


# ------------------------------------------------------------ parse converters


@register_converter("ExtractPatterns")
def _extract_patterns(ctx, args):
    # named capture groups -> struct (ref func_extract_patterns.go)
    return pc.extract_regex(_str(_ev_arr(ctx, args[0])), _ev_scalar(args[1], ctx))


@register_converter("ExtractGrokPatterns")
def _extract_grok(ctx, args):
    """ExtractGrokPatterns(target, pattern, namedCapturesOnly=true,
    patternDefinitions={}) — ref func_extract_grok_patterns.go (elastic
    go-grok): ECS bracket captures ([url][port]) emit dotted field
    names, :int/:float/:bool suffixes convert the capture."""
    from .ast import MapLiteral

    pattern = _ev_scalar(args[1], ctx)
    named_only = _opt_scalar(args, 2, ctx, True)
    defs = None
    if len(args) > 3 and args[3] is not None:
        node = args[3]
        if isinstance(node, MapLiteral):
            defs = {k: _ev_scalar(v, ctx) for k, v in node.items}
        else:
            v = node.eval(ctx)
            if isinstance(v, dict):
                defs = {k: str(x) for k, x in v.items()}
            elif v is not None:
                raise TypeError("patternDefinitions must be a map literal")
    regex, fields = compile_grok(pattern, definitions=defs,
                                 named_captures_only=named_only)
    st = pc.extract_regex(_str(_ev_arr(ctx, args[0])), regex)
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    if all(safe == disp and typ is None for safe, disp, typ in fields):
        return st
    arrays, names = [], []
    for safe, display, typ in fields:
        f = st.field(safe)
        if typ in ("int", "long"):
            f = f.cast(pa.int64())
        elif typ in ("float", "double"):
            f = f.cast(pa.float64())
        elif typ in ("bool", "boolean"):
            f = pc.equal(f, "true")
        arrays.append(f)
        names.append(display)
    return pa.StructArray.from_arrays(arrays, names=names,
                                      mask=pc.is_null(st))


@register_converter("ParseJSON")
def _parse_json(ctx, args):
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        try:
            v = json.loads(s)
            # objects -> map, arrays -> slice (func_parse_json.go handles
            # both); scalars are not a valid ParseJSON target
            out.append(v if isinstance(v, (dict, list)) else None)
        except (ValueError, TypeError):
            out.append(None)
    try:
        return pa.array(out)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # heterogeneous values: stringify to map<string,string>
        norm = [None if d is None else {k: json.dumps(v) if not isinstance(v, str) else v
                                        for k, v in d.items()} for d in out]
        return pa.array(norm, type=pa.map_(pa.string(), pa.string()))


def _opt_scalar(args, i, ctx, default):
    """args[i] if present and not nil (a named-arg hole) else default."""
    if len(args) <= i:
        return default
    v = _ev_scalar(args[i], ctx)
    return default if v is None else v


def _split_quoted(s: str, sep: str) -> list[str]:
    """Split on sep OUTSIDE double quotes (stanza keyvalue semantics —
    pkg/stanza keyvalue parser protects quoted sections)."""
    out, cur, inq = [], [], False
    i = 0
    while i < len(s):
        c = s[i]
        if c == '"':
            inq = not inq
            cur.append(c)
            i += 1
        elif not inq and s.startswith(sep, i):
            out.append("".join(cur))
            cur = []
            i += len(sep)
        else:
            cur.append(c)
            i += 1
    out.append("".join(cur))
    return out


def _parseutils_split(s: str, delimiter: str) -> list[str]:
    """parseutils.SplitString (parser.go:16-62): split on delimiter
    outside quotes.  Both '"' and "'" quote; quote chars strip from the
    output; a backslash keeps the NEXT char from terminating a quote
    (and is itself kept); empty segments from leading/trailing/repeated
    delimiters are dropped; an unterminated quote errors."""
    result: list[str] = []
    cur: list[str] = []
    quote = ""  # "" = not inside quotes
    escaped = False
    i, n = 0, len(s)
    while i < n:
        if quote == "" and s.startswith(delimiter, i):
            if cur:  # leading/trailing/repeated delimiter: ignore
                result.append("".join(cur))
                cur = []
            i += len(delimiter)
            continue
        c = s[i]
        if not escaped:
            if quote == "" and c in ('"', "'"):
                quote = c
                i += 1
                continue
            if c == quote:
                quote = ""
                i += 1
                continue
            escaped = c == "\\"
        else:
            escaped = False
        cur.append(c)
        i += 1
    if quote != "":
        raise ValueError("never reached the end of a quoted value")
    if cur:
        result.append("".join(cur))
    return result


def _parseutils_kv_pairs(pairs: list[str], delimiter: str) -> dict:
    """parseutils.ParseKeyValuePairs (parser.go:65-82): SplitN(2) on the
    delimiter, TrimSpace both sides, error on a pair with no delimiter."""
    parsed = {}
    for p in pairs:
        k, sep, v = p.partition(delimiter)
        if not sep:
            raise ValueError(
                f"cannot split {p!r} into 2 items, got 1 item(s)")
        parsed[k.strip()] = v.strip()
    return parsed


@register_converter("ParseKeyValue")
def _parse_kv(ctx, args):
    """ParseKeyValue(target, delimiter="=", pair_delimiter=" ") — ref
    func_parse_key_value.go: pairs split quote-aware via
    parseutils.SplitString (quotes strip; either delimiter may appear
    inside a quoted section), then each pair splits on the FIRST
    delimiter with both sides trimmed.  Empty target, unterminated
    quotes and pairs without the delimiter error (error_mode applies
    per record)."""
    kv_sep = _opt_scalar(args, 1, ctx, "=")
    pair_sep = _opt_scalar(args, 2, ctx, " ")
    if kv_sep == "":
        raise ValueError("delimiter cannot be set to an empty string")
    if pair_sep == "":
        raise ValueError("pair delimiter cannot be set to an empty string")
    if kv_sep == pair_sep:
        raise ValueError(
            f"pair delimiter {pair_sep!r} cannot be equal to delimiter "
            f"{kv_sep!r}")
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        if s == "":
            raise ValueError("cannot parse from empty target")
        out.append(_parseutils_kv_pairs(_parseutils_split(s, pair_sep),
                                        kv_sep))
    return pa.array(out, type=pa.map_(pa.string(), pa.string()))


@register_converter("ParseCSV")
def _parse_csv(ctx, args):
    """ParseCSV(target, header, delimiter=",", headerDelimiter=<delim>,
    mode="strict") — ref func_parse_csv.go: the HEADER splits on
    headerDelimiter (defaulting to the value delimiter), the row on
    delimiter; strict mode errors on a field-count mismatch."""
    header = _ev_scalar(args[1], ctx)
    delim = _opt_scalar(args, 2, ctx, ",")
    hdelim = _opt_scalar(args, 3, ctx, delim)
    mode = _opt_scalar(args, 4, ctx, "strict")
    if mode not in ("strict", "lazyQuotes", "ignoreQuotes"):
        raise ValueError(f"ParseCSV mode {mode!r}")
    names = header.split(hdelim)
    arr = _str(_ev_arr(ctx, args[0]))
    # quote-aware modes go through csv.reader row-wise IF any row
    # actually contains a quote; the vectorized split is the hot path
    # (ignoreQuotes by definition never treats quotes specially)
    has_quote = mode != "ignoreQuotes" and pc.any(
        pc.fill_null(pc.match_substring(arr, '"'), False)).as_py()
    if has_quote:
        import csv as _csv
        import io

        def raw_fields(s: str) -> list[str]:
            # delimiter split respecting quotes (to locate each field's
            # raw text; Go errors on a bare quote in a non-quoted field)
            out, cur, inq = [], [], False
            for ch in s:
                if ch == '"':
                    inq = not inq
                    cur.append(ch)
                elif ch == delim and not inq:
                    out.append("".join(cur))
                    cur = []
                else:
                    cur.append(ch)
            out.append("".join(cur))
            return out

        py = arr.to_pylist()
        cols: list[list] = [[] for _ in names]
        for s in py:
            if s is None:
                for c in cols:
                    c.append(None)
                continue
            if mode == "strict":
                for rf in raw_fields(s):
                    if '"' in rf and not rf.startswith('"'):
                        raise ValueError(
                            "ParseCSV strict: bare quote in non-quoted "
                            "field")  # encoding/csv ErrBareQuote
            try:
                row = next(_csv.reader(io.StringIO(s), delimiter=delim,
                                       quotechar='"',
                                       strict=(mode == "strict"),
                                       skipinitialspace=False),
                           [])
            except _csv.Error as e:
                raise ValueError(f"ParseCSV strict: {e}") from e
            if len(row) != len(names):
                # parseutils.MapCSVHeaders errors on a count mismatch
                # in EVERY mode (csv.go:73-76)
                raise ValueError(
                    f"ParseCSV: wrong number of fields: expected "
                    f"{len(names)}, found {len(row)}")
            for i, c in enumerate(cols):
                c.append(row[i] if i < len(row) else None)
        return pc.make_struct(*[pa.array(c, pa.string()) for c in cols],
                              field_names=names)
    # full split (no max_splits glue) so BOTH too-few and too-many
    # field rows are caught, like MapCSVHeaders — every mode
    full = pc.split_pattern(arr, delim)
    counts = pc.list_value_length(full)
    bad = pc.any(pc.and_(pc.is_valid(counts),
                         pc.not_equal(counts, len(names)))).as_py()
    if bad:
        raise ValueError("ParseCSV: wrong number of fields")
    parts = pc.split_pattern(arr, delim, max_splits=len(names) - 1)
    fields = [pc.list_element(pc.list_slice(parts, i, i + 1, return_fixed_size_list=True), 0)
              for i in range(len(names))]
    return pc.make_struct(*fields, field_names=names)


@register_converter("UUID")
def _uuid(ctx, args):
    import uuid

    return pa.array([str(uuid.uuid4()) for _ in range(ctx.n)], type=pa.string())


def _xml_full(e) -> dict:
    """xmlElement.intoMap shape (func_parse_xml.go:108-137): keys tag /
    attributes / content / children, recursively."""
    d: dict = {"tag": e.tag}
    if e.attrib:
        d["attributes"] = dict(e.attrib)
    content = (e.text or "").strip() + "".join(
        (c.tail or "").strip() for c in e)
    if content:
        d["content"] = content
    kids = [_xml_full(c) for c in e]
    if kids:
        d["children"] = kids
    return d


@register_converter("ParseXML")
def _parse_xml(ctx, args):
    """XML string -> nested map {tag, attributes, content, children}
    (ref func_parse_xml.go).  Malformed -> null (on_error handles it).
    Output Arrow type is inferred from the rows (nested struct); rows
    whose documents disagree structurally fall back to null."""
    import xml.etree.ElementTree as ET

    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        try:
            out.append(_xml_full(ET.fromstring(s)))
        except ET.ParseError:
            out.append(None)
    return pa.array(out)


def _xml_simplified(e):
    """parseElement (func_parse_simplified_xml.go:52-107): attributes
    and extraneous text dropped; repeated child tags collapse to a
    slice; a childless element contributes its text."""
    tags: dict[str, int] = {}
    for c in e:
        tags[c.tag] = tags.get(c.tag, 0) + 1
    d: dict = {}
    for c in e:
        if len(c):
            v = _xml_simplified(c)
        else:
            v = (c.text or "").strip()
        if tags[c.tag] > 1:
            d.setdefault(c.tag, []).append(v)
        else:
            d[c.tag] = v
    return d


@register_converter("ParseSimplifiedXML")
def _parse_simplified_xml(ctx, args):
    """XML string -> simplified nested map without attributes or
    extraneous text (ref func_parse_simplified_xml.go)."""
    import xml.etree.ElementTree as ET

    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        try:
            root = ET.fromstring(s)
            leaf = _xml_simplified(root) if len(root) \
                else (root.text or "").strip()
            out.append({root.tag: leaf})
        except ET.ParseError:
            out.append(None)
    return pa.array(out)


@register_converter("Sort")
def _sort_converter(ctx, args):
    """Sort(target, order) — per-row ascending/descending sort of a list
    value (ref func_sort.go:30-75; mixed primitive types compare after
    string/float coercion there, here within the list's Arrow type).
    Vectorized via polars list.sort; pylist fallback.  A LITERAL list
    argument (Sort([3, 6, 9], "desc"), e2e_test.go:755-800) sorts once
    with the reference's coercion ladder — all-bool as bools, otherwise
    all-numeric as doubles, otherwise everything as strings — and
    broadcasts."""
    order = _ev_scalar(args[1], ctx) if len(args) > 1 else "asc"
    if order not in ("asc", "desc"):
        raise ValueError(f"Sort order must be asc|desc, got {order!r}")
    raw = args[0].eval(ctx)
    if isinstance(raw, list):
        norm = []
        for v in raw:
            if isinstance(v, (pa.Array, pa.ChunkedArray)) and len(v) == 1:
                v = v[0]
            if isinstance(v, pa.Scalar):
                v = v.as_py()
            norm.append(v)

        def gostr(v):
            # Go renders bools lowercase; strconv keeps 2.2 as "2.2"
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        vals = [v for v in norm if v is not None]
        if all(isinstance(v, bool) for v in vals):
            key = bool
        elif all(isinstance(v, (int, float)) and not isinstance(v, bool)
                 for v in vals):
            key = float
        else:
            key = gostr  # mixed: compare string renderings (func_sort.go)
        out = sorted(vals, key=key, reverse=(order == "desc"))
        try:
            full = pa.array([out] * max(ctx.n, 1))
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # heterogeneous result: the columnar model stores the Go
            # string renderings (original pvalues have no Arrow type)
            full = pa.array([[gostr(v) for v in out]] * max(ctx.n, 1),
                            type=pa.list_(pa.string()))
        return full if ctx.n else full.slice(0, 0)  # typed empty on 0-row
    arr = as_array(raw, ctx.n)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_fixed_size_list(t):
        arr = arr.cast(pa.list_(t.value_type))
        t = arr.type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        raise TypeError("Sort target is not a list")
    try:
        import polars as pl

        s = pl.from_arrow(arr)
        return s.list.sort(descending=(order == "desc")).to_arrow()
    except ImportError:  # pragma: no cover
        py = arr.to_pylist()
        return pa.array(
            [None if v is None
             else sorted(v, reverse=(order == "desc")) for v in py], type=t)


@register_converter("ToKeyValueString")
def _to_key_value_string(ctx, args):
    """ToKeyValueString(target, delimiter="=", pair_delimiter=" ",
    sort_output=false) — ref func_to_key_value_string.go.  Target is a
    map path (attributes/resource/cache — joined from its promoted
    columns, fully vectorized) or a map-typed expression (row loop)."""
    delim = _opt_scalar(args, 1, ctx, "=")
    pair_delim = _opt_scalar(args, 2, ctx, " ")
    sort_output = bool(_opt_scalar(args, 3, ctx, False))
    if delim == pair_delim:
        raise ValueError("pair delimiter cannot equal delimiter")

    def q(s: str) -> str:
        # func_to_key_value_string.go quotes any key/value containing
        # either delimiter (the e2e k2="v2=v3" case)
        return f'"{s}"' if (delim in s or pair_delim in s) else s

    tgt = args[0]
    if isinstance(tgt, Path):
        prefix = _map_prefix(tgt)
        cols = [c for c in ctx.table.column_names if c.startswith(prefix)]
        if sort_output:
            cols = sorted(cols)
        parts = []
        for c in cols:
            key = c[len(prefix):]
            v = _str(as_array(ctx.get_col(c), ctx.n))
            needs_q = pc.or_(pc.match_substring(v, delim),
                             pc.match_substring(v, pair_delim))
            quoted = pc.binary_join_element_wise(
                pa.repeat(pa.scalar('"'), ctx.n), v,
                pa.repeat(pa.scalar('"'), ctx.n), "")
            v = pc.if_else(pc.fill_null(needs_q, False), quoted, v)
            parts.append(pc.binary_join_element_wise(
                pa.repeat(pa.scalar(q(key) + delim), ctx.n), v, ""))
        if not parts:
            return pa.repeat(pa.scalar(""), ctx.n)
        return pc.binary_join_element_wise(*parts, pair_delim,
                                           null_handling="skip")
    py = _ev_arr(ctx, tgt).to_pylist()
    out = []
    for d in py:
        if d is None:
            out.append(None)
            continue
        items = d.items() if isinstance(d, dict) else d
        if sort_output:
            items = sorted(items)
        out.append(pair_delim.join(f"{q(k)}{delim}{q(str(v))}"
                                   for k, v in items))
    return pa.array(out, type=pa.string())


@register_converter("SliceToMap")
def _slice_to_map(ctx, args):
    """SliceToMap(target, [key_path...], [value_path...]) — ref
    func_slice_to_map.go:40-80: a slice of maps becomes a map keyed by
    the element's key_path value; value is the whole element or its
    value_path.  Inherently nested-value work: row loop."""
    key_path = args[1].eval(ctx)
    value_path = args[2].eval(ctx) if len(args) > 2 else None
    if not isinstance(key_path, list) or not key_path:
        raise ValueError("key path must contain at least one element")

    def extract(d, path):
        for seg in path:
            if not isinstance(d, dict) or seg not in d:
                raise KeyError(seg)
            d = d[seg]
        return d

    py = _ev_arr(ctx, args[0]).to_pylist()
    out = []
    for row in py:
        if row is None:
            out.append(None)
            continue
        m = {}
        ok = True
        for elem in row:
            if isinstance(elem, (list, tuple)):
                elem = dict(elem)
            if not isinstance(elem, dict):
                ok = False
                break
            try:
                k = extract(elem, key_path)
                v = elem if value_path is None else extract(elem, value_path)
            except KeyError:
                ok = False
                break
            if not isinstance(k, str):
                ok = False
                break
            m[k] = v if isinstance(v, str) else json.dumps(v)
        out.append(m if ok else None)
    return pa.array(out, type=pa.map_(pa.string(), pa.string()))


@register_converter("Now")
def _now(ctx, args):
    """Now() -> current timestamp (func_now.go).  Honors GRAFT_FIXED_NOW
    (epoch microseconds) so deterministic pipelines/tests can pin the
    clock — the engine's batch model otherwise avoids wall time."""
    import os as _os
    import time as _time

    fixed = _os.environ.get("GRAFT_FIXED_NOW")
    us = int(fixed) if fixed else int(_time.time() * 1e6)
    return pa.scalar(us, pa.timestamp("us"))


@register_converter("Unix")
def _unix(ctx, args):
    """Unix(seconds, [nanoseconds]) -> timestamp (func_unix.go)."""
    sec = _ev_arr(ctx, args[0]).cast(pa.int64())
    us = pc.multiply(sec, 1_000_000)
    if len(args) > 1:
        ns = _ev_arr(ctx, args[1]).cast(pa.int64())
        us = pc.add(us, pc.divide(ns, 1_000))
    return us.cast(pa.timestamp("us"))


def _id_from_bytes(args, ctx, width: int, what: str):
    vals = args[0].eval(ctx)
    if isinstance(vals, (bytes, bytearray)):
        # OTTL bytes literal (grammar.go Bytes: TraceID(0x0102...))
        b = list(vals)
    elif isinstance(vals, list):
        b = [int(_ev_scalar(v, ctx) if isinstance(v, Node) else v)
             for v in vals] \
            if vals and isinstance(vals[0], Node) else [int(v) for v in vals]
    else:
        raise TypeError(f"{what} expects a byte list or 0x literal")
    if len(b) != width:
        raise ValueError(f"{what.lower()}s must be {width} bytes")
    return pa.scalar(bytes(b).hex(), pa.string())


@register_converter("TraceID")
def _trace_id_fn(ctx, args):
    """TraceID([bytes...]) -> 32-hex-char id (func_trace_id.go:34-40;
    this engine's columnar id representation is lowercase hex)."""
    return _id_from_bytes(args, ctx, 16, "TraceID")


@register_converter("SpanID")
def _span_id_fn(ctx, args):
    """SpanID([bytes...]) -> 16-hex-char id (func_span_id.go)."""
    return _id_from_bytes(args, ctx, 8, "SpanID")


@register_converter("IsRootSpan")
def _is_root_span(ctx, args):
    """IsRootSpan() — true when parent_span_id is empty/null
    (func_is_root_span.go:28-32)."""
    col = ctx.get_col("parent_span_id")
    if col is None:
        return pa.array([True] * ctx.n, pa.bool_())
    arr = as_array(col, ctx.n)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    empty = pc.or_(pc.is_null(arr),
                   pc.equal(pc.cast(arr, pa.string()), ""))
    return pc.fill_null(empty, True)


# --- XML edit family (ref func_get_xml.go / func_insert_xml.go /
# func_remove_xml.go use a full XPath engine; this engine supports the
# ElementTree XPath subset: relative paths, //descendant, [@attr='v']
# predicates, plus absolute paths rooted at the document element and a
# trailing /@attr for attribute removal).  XML is inherently per-row.


def _et_parse(s):
    import xml.etree.ElementTree as ET

    try:
        return ET.fromstring(s)
    except ET.ParseError:
        return None


def _et_str(e) -> str:
    """Serialize like the reference (func_get_xml.go uses encoding/xml):
    empty elements render as <b></b>, never the <b /> short form."""
    import xml.etree.ElementTree as ET

    return ET.tostring(e, encoding="unicode", short_empty_elements=False)


def _et_query(root, xpath):
    if xpath.startswith("//"):
        return root.findall("." + xpath)
    if xpath.startswith("/"):
        head, sep, rest = xpath[1:].partition("//")
        parts = [p for p in head.split("/") if p]
        if not parts or parts[0] != root.tag:
            return []
        if sep:  # absolute prefix + descendant axis, e.g. /a//b
            anchors = [root] if len(parts) == 1 else \
                root.findall("./" + "/".join(parts[1:]))
            out = []
            for a in anchors:
                out.extend(a.findall(".//" + rest))
            return out
        if len(parts) == 1:
            return [root]
        return root.findall("./" + "/".join(parts[1:]))
    return root.findall(xpath)


@register_converter("GetXML")
def _get_xml(ctx, args):
    """Serialized concatenation of elements matched by the XPath."""
    import xml.etree.ElementTree as ET

    xpath = _ev_scalar(args[1], ctx)
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        root = None if s is None else _et_parse(s)
        if root is None:
            out.append(None)
            continue
        out.append("".join(
            _et_str(e) for e in _et_query(root, xpath)))
    return pa.array(out, type=pa.string())


@register_converter("InsertXML")
def _insert_xml(ctx, args):
    """Insert a sub-document into every element matched by the XPath,
    returning the edited document."""
    import copy as _copy
    import xml.etree.ElementTree as ET

    xpath = _ev_scalar(args[1], ctx)
    subs = _str(_ev_arr(ctx, args[2])).to_pylist()
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s, sub in zip(py, subs):
        root = None if s is None else _et_parse(s)
        subroot = None if sub is None else _et_parse(sub)
        if root is None or subroot is None:
            out.append(None)
            continue
        for e in _et_query(root, xpath):
            e.append(_copy.deepcopy(subroot))
        out.append(_et_str(root))
    return pa.array(out, type=pa.string())


@register_converter("ConvertAttributesToElementsXML")
def _convert_attrs_to_elements_xml(ctx, args):
    """Attributes of matched elements become last child elements
    (func_convert_attributes_to_elements_xml.go:43-60; default = every
    element's attributes)."""
    import xml.etree.ElementTree as ET

    xpath = _ev_scalar(args[1], ctx) if len(args) > 1 else None
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        root = None if s is None else _et_parse(s)
        if root is None:
            out.append(None)
            continue
        targets = list(root.iter()) if not xpath else _et_query(root, xpath)
        for e in targets:
            for k, v in sorted(e.attrib.items()):
                child = ET.SubElement(e, k)
                child.text = v
            e.attrib.clear()
        out.append(_et_str(root))
    return pa.array(out, type=pa.string())


@register_converter("ConvertTextToElementsXML")
def _convert_text_to_elements_xml(ctx, args):
    """Wrap extraneous text nodes (text inside elements that also have
    children) in a dedicated element
    (func_convert_text_to_elements_xml.go:46-60; default element name
    "value", default scope the whole document)."""
    import xml.etree.ElementTree as ET

    xpath = _ev_scalar(args[1], ctx) if len(args) > 1 else None
    elem_name = _ev_scalar(args[2], ctx) if len(args) > 2 else "value"
    py = _str(_ev_arr(ctx, args[0])).to_pylist()

    def fix(e):
        if len(e) and e.text and e.text.strip():
            w = ET.Element(elem_name)
            w.text = e.text.strip()
            e.text = None
            e.insert(0, w)
        for c in list(e):
            if c.tail and c.tail.strip():
                w = ET.Element(elem_name)
                w.text = c.tail.strip()
                c.tail = None
                e.insert(list(e).index(c) + 1, w)
            fix(c)

    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        root = _et_parse(s)
        if root is not None:
            roots = [root]
        else:
            # multi-root fragment (the reference's xmlquery parses a
            # document node): wrap, operate, serialize the children
            wrapped = _et_parse(f"<d>{s}</d>")
            if wrapped is None:
                out.append(None)
                continue
            roots = list(wrapped)
        targets = []
        for r in roots:
            targets.extend([r] if not xpath else _et_query(r, xpath))
        for e in targets:
            fix(e)
        out.append("".join(_et_str(r) for r in roots))
    return pa.array(out, type=pa.string())


@register_converter("RemoveXML")
def _remove_xml(ctx, args):
    """Remove every element (or /@attribute) matched by the XPath,
    returning the edited document."""
    import xml.etree.ElementTree as ET

    xpath = _ev_scalar(args[1], ctx)
    attr = None
    if "/@" in xpath:
        xpath, _, attr = xpath.rpartition("/@")
    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        root = None if s is None else _et_parse(s)
        if root is None:
            out.append(None)
            continue
        matched = _et_query(root, xpath)
        if attr is not None:
            for e in matched:
                e.attrib.pop(attr, None)
        else:
            parents = {c: p for p in root.iter() for c in p}
            for e in matched:
                if e in parents:
                    parents[e].remove(e)
        out.append(_et_str(root))
    return pa.array(out, type=pa.string())


# ------------------------------------------------------------ misc converters


@register_converter("Base64Decode")
def _base64_decode(ctx, args):
    import base64

    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        try:
            out.append(base64.b64decode(s, validate=True).decode("utf-8", "replace"))
        except Exception:
            out.append(None)
    return pa.array(out, type=pa.string())


@register_converter("Decode")
def _decode(ctx, args):
    # Decode(target, encoding) — ref func_decode.go (base64 variants / hex)
    enc = _ev_scalar(args[1], ctx)
    import base64
    import binascii

    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    out = []
    for s in py:
        if s is None:
            out.append(None)
            continue
        try:
            if enc in ("base64", "base64-standard"):
                out.append(base64.b64decode(s, validate=True).decode("utf-8", "replace"))
            elif enc == "base64url":
                out.append(base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)).decode("utf-8", "replace"))
            elif enc == "hex":
                out.append(binascii.unhexlify(s).decode("utf-8", "replace"))
            elif enc in ("us-ascii", "utf-8"):
                out.append(s)
            else:
                out.append(None)
        except Exception:
            out.append(None)
    return pa.array(out, type=pa.string())


_URL_STR_FIELDS = ("url.original", "url.domain", "url.scheme", "url.path",
                   "url.fragment", "url.extension", "url.user_info",
                   "url.username", "url.password", "url.query")


@register_converter("URL")
def _url(ctx, args):
    """URL(target) -> semconv url.* component struct — ref func_url.go:
    parseutils.ParseURI(value, semconvCompliant=true) via the net/url
    port in functions/gourl.py.  original/domain/scheme/path are always
    present (possibly empty, uri.go:56-60); the rest are null when the
    URI lacks them.  Empty input errors (func_url.go:39-41); error_mode
    applies per record."""
    from .gourl import parse_uri

    py = _str(_ev_arr(ctx, args[0])).to_pylist()
    fields: dict[str, list] = {k: [] for k in _URL_STR_FIELDS}
    ports: list = []
    for s in py:
        if s == "":
            raise ValueError("url cannot be empty")
        m = parse_uri(s, semconv=True) if s is not None else {}
        for k in _URL_STR_FIELDS:
            fields[k].append(m.get(k) if s is not None else None)
        ports.append(m.get("url.port"))
    arrays = [pa.array(fields[k], pa.string()) for k in _URL_STR_FIELDS]
    arrays.append(pa.array(ports, pa.int64()))
    return pc.make_struct(*arrays,
                          field_names=list(_URL_STR_FIELDS) + ["url.port"])


# Ordered browser-family rules in the uap-core style (the PUBLIC
# ua-parser project's priority ordering: forks and embedded tokens
# before the engines they embed — Edge/OPR before Chrome, CriOS/FxiOS
# before Safari, Version/..Safari after everything Chrome-like).
# Compact hand-written subset, not a copy of uap-core's regexes.yaml.
_UA_RULES: list[tuple[str, str | None]] = [
    (r"(?P<f>Googlebot|bingbot|Baiduspider|YandexBot|DuckDuckBot|Slurp|"
     r"facebookexternalhit)(?:[/ ](?P<v1>\d+)(?:\.(?P<v2>\d+))?)?", None),
    (r"(?:Edge|Edg|EdgiOS|EdgA)/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?",
     "Edge"),
    (r"OPR/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", "Opera"),
    (r"Opera[/ ](?P<v1>\d+)(?:\.(?P<v2>\d+))?", "Opera"),
    (r"SamsungBrowser/(?P<v1>\d+)(?:\.(?P<v2>\d+))?", "Samsung Internet"),
    (r"YaBrowser/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?",
     "Yandex Browser"),
    (r"Vivaldi/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", "Vivaldi"),
    (r"CriOS/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?",
     "Chrome Mobile iOS"),
    (r"FxiOS/(?P<v1>\d+)(?:\.(?P<v2>\d+))?", "Firefox iOS"),
    (r"Chromium/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", "Chromium"),
    (r"Chrome/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?(?:\.\d+)?"
     r"(?: Mobile)? Safari", "Chrome"),
    (r"Chrome/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", "Chrome"),
    (r"Firefox/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", "Firefox"),
    (r"Version/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?"
     r"(?: Mobile(?:/\w+)?) Safari/", "Mobile Safari"),
    (r"Version/(?P<v1>\d+)(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))? .*Safari/",
     "Safari"),
    (r"MSIE (?P<v1>\d+)(?:\.(?P<v2>\d+))?", "IE"),
    (r"Trident/.*rv:(?P<v1>\d+)(?:\.(?P<v2>\d+))?", "IE"),
    (r"(?P<f>curl|Wget|python-requests|Go-http-client|okhttp|"
     r"Apache-HttpClient|Java|aiohttp|libwww-perl)[/ ](?P<v1>\d+)"
     r"(?:\.(?P<v2>\d+))?(?:\.(?P<v3>\d+))?", None),
]

_UA_OS_RULES: list[tuple[str, str | None]] = [
    (r"Windows NT (?P<v1>\d+)\.(?P<v2>\d+)", "Windows"),
    (r"iPhone OS (?P<v1>\d+)[._](?P<v2>\d+)", "iOS"),
    (r"CPU OS (?P<v1>\d+)[._](?P<v2>\d+)", "iOS"),
    (r"Mac OS X (?P<v1>\d+)[._](?P<v2>\d+)(?:[._](?P<v3>\d+))?", "Mac OS X"),
    (r"Android (?P<v1>\d+)(?:\.(?P<v2>\d+))?", "Android"),
    (r"(?P<f>Linux|CrOS|Ubuntu|FreeBSD)", None),
]


def _ua_apply_rules(col, rules):
    """First-matching-rule extraction, one vectorized RE2 pass per rule."""
    n = len(col)
    fam = np.full(n, None, dtype=object)
    ver = np.full(n, None, dtype=object)
    unmatched = np.ones(n, dtype=bool)
    for pattern, family in rules:
        if not unmatched.any():
            break
        struct = pc.extract_regex(col, pattern)
        valid = pc.is_valid(struct).to_numpy(zero_copy_only=False)
        sel = valid & unmatched
        if not sel.any():
            continue
        names = {f.name for f in struct.type}
        f_arr = (pc.struct_field(struct, "f").to_numpy(zero_copy_only=False)
                 if "f" in names else None)
        vs = [pc.struct_field(struct, g).to_numpy(zero_copy_only=False)
              for g in ("v1", "v2", "v3") if g in names]
        idx = np.nonzero(sel)[0]
        for i in idx:
            fam[i] = family if family is not None else f_arr[i]
            # unmatched optional groups come back as "" from extract_regex
            parts = [v[i] for v in vs if v[i]]
            ver[i] = ".".join(parts) if parts else None
        unmatched &= ~sel
    return fam, ver, unmatched


@register_converter("UserAgent")
def _user_agent(ctx, args):
    """UserAgent(target) -> struct{user_agent.name, user_agent.version,
    user_agent.original} — EXACTLY func_useragent.go:40-46's semconv
    key set (merge_maps of the result promotes attr_user_agent.* like
    the reference writes user_agent.* attributes).  Ordered rule table,
    vectorized one RE2 pass per rule; unmatched family is "Other" like
    ua-parser.  OS detection is the separate extension converter
    UserAgentOS."""
    arr = _str(_ev_arr(ctx, args[0]))
    col = pc.fill_null(arr, "")
    fam, ver, unmatched = _ua_apply_rules(col, _UA_RULES)
    fam[unmatched] = "Other"
    isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
    fam[isnull] = None
    return pc.make_struct(
        pa.array(fam, pa.string()), pa.array(ver, pa.string()), arr,
        field_names=["user_agent.name", "user_agent.version",
                     "user_agent.original"])


@register_converter("UserAgentOS")
def _user_agent_os(ctx, args):
    """Extension (no reference analog): OS family + version string from
    a user-agent, same rule-table machinery as UserAgent."""
    arr = _str(_ev_arr(ctx, args[0]))
    col = pc.fill_null(arr, "")
    osf, osv, os_unmatched = _ua_apply_rules(col, _UA_OS_RULES)
    oss = np.full(len(col), None, dtype=object)
    for i in np.nonzero(~os_unmatched)[0]:
        oss[i] = f"{osf[i]} {osv[i]}" if osv[i] else osf[i]
    return pa.array(oss, pa.string())


for _name, _kern in [("Sqrt", "sqrt"), ("Abs", "abs"), ("Ceil", "ceil"),
                     ("Floor", "floor"), ("Round", "round")]:
    def _mk_math(kern):
        def fn(ctx, args):
            return getattr(pc, kern)(pc.cast(_ev_arr(ctx, args[0]), pa.float64(),
                                             safe=False))
        return fn
    _REGISTRY[_name] = ("converter", _mk_math(_kern))


@register_converter("Log")
def _log(ctx, args):
    return pc.ln(pc.cast(_ev_arr(ctx, args[0]), pa.float64(), safe=False))


# ------------------------------------------------------------ editors


def _combine_masks(mask, extra):
    if mask is None:
        return extra
    if extra is None:
        return mask
    return pc.and_(mask, extra)


@register_editor("set")
def _set(ctx: ExprContext, args: list[Node], mask):
    target = args[0]
    if not isinstance(target, Path):
        raise TypeError("set target must be a path")
    value = args[1].eval(ctx)
    ctx.set_col(target.column, value, mask)


@register_editor("delete_key")
def _delete_key(ctx, args, mask):
    prefix = _map_prefix(args[0])
    key = args[1].eval(ctx)
    col = prefix + str(key)
    if col not in ctx.table.column_names:
        return
    if mask is None:
        ctx.drop_cols([col])
    else:
        existing = ctx.table.column(col)
        ctx.set_col(col, pc.if_else(mask, pa.nulls(ctx.n, existing.type), existing))


@register_editor("delete_matching_keys")
def _delete_matching_keys(ctx, args, mask):
    prefix = _map_prefix(args[0])
    pat = re.compile(str(args[1].eval(ctx)))
    for col in list(ctx.table.column_names):
        if col.startswith(prefix) and pat.search(col[len(prefix):]):
            if mask is None:
                ctx.drop_cols([col])
            else:
                existing = ctx.table.column(col)
                ctx.set_col(col, pc.if_else(mask, pa.nulls(ctx.n, existing.type), existing))


@register_editor("keep_keys")
def _keep_keys(ctx, args, mask):
    prefix = _map_prefix(args[0])
    keep = {prefix + str(k) for k in args[1].eval(ctx)}
    drop = [c for c in ctx.table.column_names if c.startswith(prefix) and c not in keep]
    if mask is None:
        ctx.drop_cols(drop)
    else:
        for col in drop:
            existing = ctx.table.column(col)
            ctx.set_col(col, pc.if_else(mask, pa.nulls(ctx.n, existing.type), existing))


@register_editor("keep_matching_keys")
def _keep_matching_keys(ctx, args, mask):
    prefix = _map_prefix(args[0])
    pat = re.compile(str(args[1].eval(ctx)))
    drop = [c for c in ctx.table.column_names
            if c.startswith(prefix) and not pat.search(c[len(prefix):])]
    if mask is None:
        ctx.drop_cols(drop)
    else:
        for col in drop:
            existing = ctx.table.column(col)
            ctx.set_col(col, pc.if_else(mask, pa.nulls(ctx.n, existing.type), existing))


def _apply_repl_function(ctx, args, fi: int, repl: str) -> str:
    """Optional `function` + `replacementFormat` args of replace_pattern
    / replace_all_patterns (func_replace_pattern.go:60-96): the named
    converter applies to the REPLACEMENT value (e2e:
    replace_pattern(..., "@", SHA256) -> sha256("@") + rest), then
    replacementFormat's single %s receives the converted value."""
    if len(args) > fi:
        node = args[fi]
        name = node.segments[0] if (isinstance(node, Path)
                                    and len(node.segments) == 1) else None
        if name is not None:
            if name not in _REGISTRY or _REGISTRY[name][0] != "converter":
                raise ValueError(
                    f"replace function {name!r} is not a converter")
            out = _REGISTRY[name][1](ctx, [Literal(repl)])
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            if isinstance(out, pa.Array):
                if len(out) == 0:
                    # 0-row block: no rows to replace; any scalar works
                    return repl
                repl = str(out[0].as_py())
            else:
                repl = str(out.as_py() if isinstance(out, pa.Scalar) else out)
    if len(args) > fi + 1:
        fmt = _ev_scalar(args[fi + 1], ctx)
        if fmt is not None:
            if fmt.count("%s") != 1:
                raise ValueError(
                    "replacementFormat must contain exactly one %s")
            repl = fmt.replace("%s", repl)
    return repl


@register_editor("replace_pattern")
def _replace_pattern(ctx, args, mask):
    target = args[0]
    if not isinstance(target, Path):
        raise TypeError("replace_pattern target must be a path")
    arr = ctx.get_col(target.column)
    if arr is None:
        return
    repl = _apply_repl_function(ctx, args, 3, str(args[2].eval(ctx)))
    out = pc.replace_substring_regex(_str(arr), pattern=str(args[1].eval(ctx)),
                                     replacement=_go_repl(repl))
    ctx.set_col(target.column, out, mask)


@register_editor("replace_match")
def _replace_match(ctx, args, mask):
    target = args[0]
    if not isinstance(target, Path):
        raise TypeError("replace_match target must be a path")
    arr = ctx.get_col(target.column)
    if arr is None:
        return
    glob = str(args[1].eval(ctx))
    repl = str(args[2].eval(ctx))
    hit = pc.match_like(_str(arr), glob.replace("*", "%").replace("?", "_"))
    m = _combine_masks(mask, pc.fill_null(hit, False))
    ctx.set_col(target.column, pa.repeat(pa.scalar(repl), ctx.n), m)


@register_editor("replace_all_patterns")
def _replace_all_patterns(ctx, args, mask):
    prefix = _map_prefix(args[0])
    mode = str(args[1].eval(ctx))  # "key" | "value"
    pat = str(args[2].eval(ctx))
    repl = _go_repl(_apply_repl_function(ctx, args, 4,
                                         str(args[3].eval(ctx))))
    for col in list(ctx.table.column_names):
        if not col.startswith(prefix):
            continue
        if mode == "value":
            arr = ctx.table.column(col)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                ctx.set_col(col, pc.replace_substring_regex(arr, pattern=pat, replacement=repl), mask)
        else:  # key rename ($1-style backrefs already converted to \1 by _go_repl)
            key = col[len(prefix):]
            new = re.sub(pat, repl, key)
            if new != key:
                ctx.table = ctx.table.rename_columns(
                    [prefix + new if c == col else c for c in ctx.table.column_names])


@register_editor("replace_all_matches")
def _replace_all_matches(ctx, args, mask):
    prefix = _map_prefix(args[0])
    glob = str(args[1].eval(ctx))
    repl = str(args[2].eval(ctx))
    like = glob.replace("*", "%").replace("?", "_")
    for col in list(ctx.table.column_names):
        if col.startswith(prefix):
            arr = ctx.table.column(col)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                hit = pc.fill_null(pc.match_like(arr, like), False)
                ctx.set_col(col, pa.repeat(pa.scalar(repl), ctx.n), _combine_masks(mask, hit))


@register_editor("truncate_all")
def _truncate_all(ctx, args, mask):
    prefix = _map_prefix(args[0])
    limit = int(args[1].eval(ctx))
    for col in list(ctx.table.column_names):
        if col.startswith(prefix):
            arr = ctx.table.column(col)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                ctx.set_col(col, pc.utf8_slice_codeunits(arr, 0, limit), mask)


@register_editor("limit")
def _limit(ctx, args, mask):
    prefix = _map_prefix(args[0])
    n = int(args[1].eval(ctx))
    priority = [prefix + str(k) for k in (args[2].eval(ctx) if len(args) > 2 else [])]
    cols = [c for c in ctx.table.column_names if c.startswith(prefix)]
    keep = [c for c in priority if c in cols]
    for c in cols:
        if len(keep) >= n:
            break
        if c not in keep:
            keep.append(c)
    ctx.drop_cols([c for c in cols if c not in keep])


@register_editor("merge_maps")
def _merge_maps(ctx, args, mask):
    """merge_maps(attributes, <struct/map expr>, "insert"|"update"|"upsert")
    — ref func_merge_maps.go; writes each source field to its promoted column."""
    prefix = _map_prefix(args[0])
    src = as_array(args[1].eval(ctx), ctx.n)
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    strategy = str(args[2].eval(ctx)) if len(args) > 2 else "upsert"
    if pa.types.is_struct(src.type):
        fields = {f.name: pc.struct_field(src, f.name) for f in src.type}
    elif pa.types.is_map(src.type):
        keys = set()
        py = src.to_pylist()
        for d in py:
            if d:
                keys.update(k for k, _ in (d.items() if isinstance(d, dict) else d))
        fields = {}
        for k in sorted(keys):
            fields[k] = pa.array(
                [dict(d or {}).get(k) for d in py], type=pa.string())
    else:
        raise TypeError(f"merge_maps source must be struct/map, got {src.type}")
    for name, arr in fields.items():
        col = prefix + name
        current = ctx.get_col(col)
        m = mask
        if strategy == "insert" and current is not None:
            m = _combine_masks(m, pc.is_null(current))
        elif strategy == "update":
            if current is None:
                continue
            m = _combine_masks(m, pc.is_valid(current))
        # also never overwrite with null from a non-matching source row
        m = _combine_masks(m, pc.is_valid(arr))
        ctx.set_col(col, arr, m)


@register_editor("append")
def _append(ctx, args, mask):
    target = args[0]
    if not isinstance(target, Path):
        raise TypeError("append target must be a path")
    col = target.column
    value = args[1].eval(ctx)
    current = ctx.get_col(col)
    if current is None:
        ctx.set_col(col, value, mask)
        return
    cur = _str(current.combine_chunks() if isinstance(current, pa.ChunkedArray) else current)
    val = _str(as_array(value, ctx.n))
    ctx.set_col(col, pc.binary_join_element_wise(cur, val, ""), mask)


@register_editor("flatten")
def _flatten(ctx, args, mask):
    # flat columnar model: attributes are already flat columns — no-op
    return


# ------------------------------------------------- metric-context editors
# Flattened-table analogs of the transformprocessor metric functions
# (processor/transformprocessor/internal/metrics/): one row = one
# datapoint carrying its metric-level fields as metric_* columns.


def _and_mask(mask, cond):
    cond = pc.fill_null(cond, False)
    return cond if mask is None else pc.and_(pc.fill_null(mask, False), cond)


@register_editor("convert_sum_to_gauge")
def _convert_sum_to_gauge(ctx, args, mask):
    """func_convert_sum_to_gauge.go:17-30 — only Sum metrics convert;
    gauges carry no temporality/monotonicity, so those fields null out."""
    t = ctx.get_col("metric_type")
    if t is None:
        return
    m = _and_mask(mask, pc.equal(t, "Sum"))
    ctx.set_col("metric_type", "Gauge", m)
    for c in ("metric_aggregation_temporality", "metric_is_monotonic"):
        if ctx.get_col(c) is not None:
            ctx.set_col(c, pa.nulls(ctx.n, type=ctx.get_col(c).type), m)


@register_editor("convert_gauge_to_sum")
def _convert_gauge_to_sum(ctx, args, mask):
    """func_convert_gauge_to_sum.go:18-42 — args (aggregation_temporality
    'cumulative'|'delta', is_monotonic bool); only Gauge metrics convert."""
    temp = args[0].eval(ctx)
    if temp not in ("cumulative", "delta"):
        raise ValueError(f"unknown aggregation temporality: {temp!r}")
    mono = bool(args[1].eval(ctx))
    t = ctx.get_col("metric_type")
    if t is None:
        return
    m = _and_mask(mask, pc.equal(t, "Gauge"))
    ctx.set_col("metric_type", "Sum", m)
    ctx.set_col("metric_aggregation_temporality", temp, m)
    ctx.set_col("metric_is_monotonic", mono, m)


@register_editor("scale_metric")
def _scale_metric(ctx, args, mask):
    """func_scale.go:25-57 — multiply every datapoint value by the
    factor; optional second arg replaces the unit.  Scales value_double /
    value_int plus histogram sum/min/max columns when present."""
    factor = float(args[0].eval(ctx))
    for c in ("value_double", "sum", "min", "max"):
        col = ctx.get_col(c)
        if col is not None and pa.types.is_floating(col.type):
            ctx.set_col(c, pc.multiply(col, factor), mask)
    vi = ctx.get_col("value_int")
    if vi is not None:
        scaled = pc.cast(pc.round(pc.multiply(pc.cast(vi, pa.float64()), factor)),
                         pa.int64())
        ctx.set_col("value_int", scaled, mask)
    if len(args) > 1:
        ctx.set_col("metric_unit", str(args[1].eval(ctx)), mask)
