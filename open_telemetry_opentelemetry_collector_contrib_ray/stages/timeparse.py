"""Reference-parity time parsing (stanza time parser / timeutils).

The reference parses timestamps three ways (pkg/stanza/operator/helper/
time.go, internal/coreinternal/timeutils):

- ``strptime`` — ctime directives translated to Go layouts
  (timeutils/internal/ctimefmt/ctimefmt.go:25-66),
- ``gotime`` — native Go reference-time layouts,
- ``epoch`` — s/ms/us/ns/s.ms/s.us/s.ns integer, float or string
  (helper/time.go epoch branch).

Arrow's ``pc.strptime`` covers only plain C directives — no fractional
seconds, no numeric offsets, no month-name case folding — so this
module compiles a ctime format into ONE RE2 regex with named component
groups, extracts every row vectorized with ``pc.extract_regex``, and
assembles epoch microseconds in numpy (days-from-civil).  The hot path
stays zero-loop; rows that fail the regex yield null.

Timezone abbreviations (%Z / Go "MST") resolve through a fixed
offset table — the reference resolves them against a loaded IANA
location (timeutils parser_test.go "with-timezone" cases expect
MST=-07, HST=-10); container images here ship no tzdata, so the table
covers the abbreviations those tables use plus the US set.

Results are naive UTC instants (``timestamp("us")``): offset-bearing
inputs normalize to UTC; offset-less inputs are taken as UTC (the
reference's time.Local — this sandbox runs UTC).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ctimefmt.go:25-66 ctimeSubstitutes, inverted where parsing needs it
_MONTHS_ABBR = ("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
                "sep", "oct", "nov", "dec")
_MONTHS_FULL = ("january", "february", "march", "april", "may", "june",
                "july", "august", "september", "october", "november",
                "december")

# %Z / Go "MST": fixed abbreviation -> offset minutes
_TZ_ABBR = {"UTC": 0, "GMT": 0, "Z": 0,
            "EST": -5 * 60, "EDT": -4 * 60, "CST": -6 * 60,
            "CDT": -5 * 60, "MST": -7 * 60, "MDT": -6 * 60,
            "PST": -8 * 60, "PDT": -7 * 60, "HST": -10 * 60,
            "AKST": -9 * 60, "AKDT": -8 * 60, "BST": 60,
            "CET": 60, "CEST": 2 * 60, "IST": 5 * 60 + 30,
            "JST": 9 * 60, "AEST": 10 * 60}

# directive -> (regex fragment, component key or None)
_DIRECTIVE_RE: dict[str, tuple[str, str | None]] = {
    "%Y": (r"(?P<Y>\d{4})", "Y"),
    "%y": (r"(?P<y>\d{2})", "y"),
    "%m": (r"(?P<m>\d{2})", "m"),
    "%o": (r"(?P<m>\s?\d{1,2})", "m"),
    "%q": (r"(?P<m>\d{1,2})", "m"),
    "%b": (r"(?P<bm>[A-Za-z]{3})", "bm"),
    "%h": (r"(?P<bm>[A-Za-z]{3})", "bm"),
    "%B": (r"(?P<Bm>[A-Za-z]+)", "Bm"),
    "%d": (r"(?P<d>\d{2})", "d"),
    "%e": (r"(?P<d>\s?\d{1,2})", "d"),
    "%g": (r"(?P<d>\d{1,2})", "d"),
    "%a": (r"[A-Za-z]{3}", None),
    "%A": (r"[A-Za-z]+", None),
    "%H": (r"(?P<H>\d{2})", "H"),
    "%l": (r"(?P<I>\d{1,2})", "I"),
    "%I": (r"(?P<I>\d{2})", "I"),
    "%p": (r"(?P<p>[APap][Mm])", "p"),
    "%P": (r"(?P<p>[apAP][mM])", "p"),
    "%M": (r"(?P<M>\d{2})", "M"),
    "%S": (r"(?P<S>\d{2})", "S"),
    "%Z": (r"(?P<Z>[A-Za-z]{1,5})", "Z"),
    "%z": (r"(?P<z>Z|[+-]\d{4})", "z"),
    "%w": (r"(?P<z>Z|[+-]\d{6})", "z"),
    "%i": (r"(?P<z>Z|[+-]\d{2})", "z"),
    "%j": (r"(?P<z>Z|[+-]\d{2}:\d{2})", "z"),
    "%k": (r"(?P<z>Z|[+-]\d{2}:\d{2}:\d{2})", "z"),
    "%n": ("\n", None),
    "%t": ("\t", None),
    "%%": ("%", None),
}

# composite directives expand first (ctimefmt.go)
_COMPOSITE = {
    "%D": "%m/%d/%Y", "%x": "%m/%d/%Y", "%F": "%Y-%m-%d",
    "%T": "%H:%M:%S", "%X": "%H:%M:%S", "%r": "%I:%M:%S %P",
    "%R": "%H:%M", "%c": "%a %b %d %H:%M:%S %Y",
}

_FRAC = ("%L", "%f", "%s")


def validate_ctime(fmt: str) -> None:
    """ctimefmt Validate: fractional directives need a '.'/',' prefix,
    no stray decimals, no unknown directives (ctimefmt.go:129-150)."""
    if re.search(r"\d", re.sub(r"%.", "", fmt)):
        raise ValueError("format string should not contain decimals")
    if re.search(r"[^.,]%[Lfs]", fmt):
        raise ValueError("invalid fractional seconds directive: must be "
                         "preceded with '.' or ','")
    for m in re.finditer(r"%.", fmt):
        d = m.group(0)
        if (d not in _DIRECTIVE_RE and d not in _COMPOSITE
                and d not in _FRAC):
            raise ValueError(
                f"unsupported ctimefmt.ToNative() directive: {d}")


def ctime_to_regex(fmt: str) -> str:
    """Compile a ctime format into one anchored RE2 pattern with named
    groups (Y y m bm Bm d H I p M S frac z Z)."""
    validate_ctime(fmt)
    for k, v in _COMPOSITE.items():
        fmt = fmt.replace(k, v)
    out: list[str] = ["^"]
    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == "%" and i + 1 < n:
            d = fmt[i:i + 2]
            if d in _FRAC:
                # the '.'/',' literal just emitted moves inside the
                # optional group: Go treats a trailing ".999" fraction
                # as omittable
                sep = out.pop()
                out.append(f"(?:{sep}(?P<frac>\\d{{1,9}}))?")
            else:
                out.append(_DIRECTIVE_RE[d][0])
            i += 2
            continue
        out.append(re.escape(fmt[i]))
        i += 1
    out.append("$")
    return "".join(out)


# Go layout token -> ctime directive, longest-match order
_GO_TOKENS: list[tuple[str, str]] = [
    ("2006", "%Y"), ("January", "%B"), ("Monday", "%A"),
    ("Jan", "%b"), ("Mon", "%a"),
    ("Z07:00:00", "%k"), ("-07:00:00", "%k"), ("-070000", "%w"),
    ("Z07:00", "%j"), ("-07:00", "%j"), ("Z0700", "%z"), ("-0700", "%z"),
    ("-07", "%i"),
    ("15:04:05", "%H:%M:%S"), ("15", "%H"),
    ("01", "%m"), ("02", "%d"), ("03", "%I"), ("04", "%M"), ("05", "%S"),
    ("06", "%y"), ("_2", "%e"), ("PM", "%p"), ("pm", "%P"),
    ("MST", "%Z"),
    ("1", "%q"), ("2", "%g"), ("3", "%l"), ("4", "%M"), ("5", "%S"),
    ("%", "%%"),
]


def gotime_to_ctime(layout: str) -> str:
    """Translate a Go reference-time layout into ctime directives
    (the inverse of ctimefmt's substitution table)."""
    out: list[str] = []
    i, n = 0, len(layout)
    while i < n:
        # fractional: . or , followed by a run of 9s or 0s
        m = re.match(r"[.,](9+|0+)", layout[i:])
        if m:
            digits = len(m.group(1))
            out.append(layout[i])
            out.append("%L" if digits <= 3 else
                       "%f" if digits <= 6 else "%s")
            i += m.end()
            continue
        for tok, d in _GO_TOKENS:
            if layout.startswith(tok, i):
                out.append(d)
                i += len(tok)
                break
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


def validate_gotime(layout: str) -> None:
    """timeutils ValidateGotime: a fraction run must follow '.'/','."""
    m = re.search(r"([^.,0-9])(999+|000+)", layout)
    if m:
        raise ValueError(
            f"invalid fractional seconds directive: "
            f"'{m.group(1)}{m.group(2)}'. must be preceded with '.' or ','")
    validate_ctime(gotime_to_ctime(layout))


_EPOCH_DIV = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9,
              "s.ms": None, "s.us": None, "s.ns": None}


def _days_from_civil(y: np.ndarray, m: np.ndarray,
                     d: np.ndarray) -> np.ndarray:
    """Howard Hinnant's days_from_civil, vectorized (int64 days since
    1970-01-01)."""
    y = y - (m <= 2)
    era = np.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = (m + 9) % 12
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _parse_with_regex(src: pa.Array, fmt: str,
                      default_year: int = 1970) -> pa.Array:
    pattern = ctime_to_regex(fmt)
    groups = set(re.findall(r"\(\?P<(\w+)>", pattern))
    st = pc.extract_regex(pc.cast(src, pa.string()), pattern)
    n = len(st)
    valid = pc.is_valid(st).to_numpy(zero_copy_only=False)

    def col_int(name: str, default: int) -> np.ndarray:
        if name not in groups:
            return np.full(n, default, np.int64)
        vals = pc.utf8_trim_whitespace(pc.struct_field(st, name))
        arr = pc.cast(vals, pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        return np.where(valid, np.nan_to_num(arr.astype(np.float64)),
                        default).astype(np.int64)

    year = col_int("Y", default_year)
    if "y" in groups:
        yy = col_int("y", 0)
        year = np.where(valid, np.where(yy >= 69, 1900 + yy, 2000 + yy),
                        default_year)
    month = col_int("m", 1)
    for g, table in (("bm", _MONTHS_ABBR), ("Bm", _MONTHS_FULL)):
        if g in groups:
            names = pc.ascii_lower(pc.struct_field(st, g))
            idx = pc.index_in(names, pa.array(table)) \
                .to_numpy(zero_copy_only=False)
            month = np.where(valid,
                             np.nan_to_num(idx.astype(np.float64),
                                           nan=0) + 1,
                             1).astype(np.int64)
    day = col_int("d", 1)
    hour = col_int("H", 0)
    if "I" in groups:
        hour = col_int("I", 0) % 12
        if "p" in groups:
            pm = pc.equal(pc.ascii_lower(pc.struct_field(st, "p")), "pm") \
                .to_numpy(zero_copy_only=False)
            hour = hour + np.where(valid & (pm == True), 12, 0)  # noqa: E712
    minute = col_int("M", 0)
    sec = col_int("S", 0)

    frac_us = np.zeros(n, np.int64)
    if "frac" in groups:
        fr = pc.struct_field(st, "frac")
        digits = pc.fill_null(pc.utf8_length(fr), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        fv = pc.cast(pc.fill_null(fr, "0"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # scale an f-digit fraction to microseconds, truncating past us
        scale = np.float_power(10.0, 6 - digits)
        frac_us = np.trunc(fv * scale).astype(np.int64)

    off_min = np.zeros(n, np.int64)
    if "z" in groups:
        z = pc.fill_null(pc.struct_field(st, "z"), "Z").to_pylist()
        off = np.zeros(n, np.int64)
        for i, s in enumerate(z):
            if not s or s == "Z":
                continue
            sign = -1 if s[0] == "-" else 1
            t = s[1:].replace(":", "")
            hh = int(t[:2])
            mm = int(t[2:4]) if len(t) >= 4 else 0
            off[i] = sign * (hh * 60 + mm)
        off_min = off
    if "Z" in groups and "z" not in groups:
        # a numeric %z offset wins over the %Z label when both parse
        # (Go time.Parse: the name is just a label then)
        zn = pc.ascii_upper(pc.fill_null(pc.struct_field(st, "Z"), "UTC"))
        abbr = list(_TZ_ABBR)
        idx = pc.index_in(zn, pa.array(abbr)).to_numpy(zero_copy_only=False)
        offs = np.array([_TZ_ABBR[a] for a in abbr] + [0], np.int64)
        off_min = offs[np.where(np.isnan(idx.astype(np.float64)),
                                len(abbr), idx).astype(np.int64)]

    days = _days_from_civil(year, month, day)
    us = ((days * 86400 + hour * 3600 + minute * 60 + sec
           - off_min * 60) * 1_000_000 + frac_us)
    return pc.if_else(pa.array(valid),
                      pa.array(us, pa.int64()).cast(pa.timestamp("us")),
                      pa.scalar(None, pa.timestamp("us")))


# Arrow strptime handles these directly; anything else takes the regex
_ARROW_OK = {"%Y", "%m", "%d", "%H", "%M", "%S", "%y", "%j", "%U", "%W"}


def parse_time_column(src, layout_type: str, layout: str,
                      default_year: int = 1970) -> pa.Array:
    """One string/number column -> timestamp("us") array (null on
    per-row parse failure), per the stanza layout_type semantics."""
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if layout_type == "gotime":
        validate_gotime(layout)
        return _parse_with_regex(src, gotime_to_ctime(layout),
                                 default_year)
    if layout_type == "strptime":
        directives = set(re.findall(r"%.", layout))
        if directives <= _ARROW_OK:
            # Arrow's strptime is the fast path but is lenient where Go
            # is strict (a 2-digit year satisfies its %Y); one extra RE2
            # full-match pass restores Go's digit-count strictness at
            # ~1/4 the cost of the extract_regex slow path.
            s = pc.cast(src, pa.string())
            ts = pc.strptime(s, format=layout, unit="us",
                             error_is_null=True)
            strict = pc.match_substring_regex(s, ctime_to_regex(layout))
            return pc.if_else(pc.fill_null(strict, False), ts,
                              pa.scalar(None, pa.timestamp("us")))
        return _parse_with_regex(src, layout, default_year)
    if layout_type == "epoch":
        return _parse_epoch(src, layout)
    raise ValueError(f"unsupported layout_type {layout_type!r}")


def _parse_epoch(src: pa.Array, layout: str) -> pa.Array:
    """helper/time.go epoch branch: s/ms/us/ns plus fractional
    s.ms/s.us/s.ns, from string, int or float columns."""
    if layout not in _EPOCH_DIV:
        raise ValueError(f"invalid epoch layout {layout!r}")
    if layout in ("s.ms", "s.us", "s.ns"):
        # fractional seconds: keep string exactness when possible
        if pa.types.is_string(src.type) or pa.types.is_large_string(src.type):
            secs = pc.cast(pc.replace_substring_regex(src, r"\..*$", ""),
                           pa.int64(), safe=False)
            frac = pc.replace_substring_regex(src, r"^[^.]*\.?", "")
            frac = pc.if_else(pc.equal(frac, ""), "0", frac)
            digits = pc.utf8_length(frac).to_numpy(zero_copy_only=False)
            fv = pc.cast(frac, pa.int64(), safe=False) \
                .to_numpy(zero_copy_only=False)
            frac_us = np.trunc(
                fv * np.float_power(10.0, 6 - digits)).astype(np.int64)
            us = (secs.to_numpy(zero_copy_only=False) * 1_000_000
                  + frac_us)
            return pa.array(us, pa.int64()).cast(pa.timestamp("us"))
        f = pc.cast(src, pa.float64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        secs = np.trunc(f)
        us = (secs * 1_000_000 + np.round((f - secs) * 1e6)) \
            .astype(np.int64)
        return pa.array(us, pa.int64()).cast(pa.timestamp("us"))
    div = _EPOCH_DIV[layout]
    if pa.types.is_floating(src.type):
        vals = pc.cast(src, pa.float64()).to_numpy(zero_copy_only=False)
        us = np.round(vals * (1_000_000 / div)).astype(np.int64)
        return pa.array(us, pa.int64()).cast(pa.timestamp("us"))
    ints = pc.cast(src, pa.int64(), safe=False)
    if div <= 10**6:
        us = pc.multiply(ints, 10**6 // div)
    else:
        us = pc.divide(ints, div // 10**6)
    return pc.cast(us, pa.timestamp("us"))


def set_timestamp_year(ts: pa.Array, now_us: int) -> pa.Array:
    """timeutils.SetTimestampYear (parser.go): a year-less timestamp
    takes the current year, unless that puts it more than 7 days in the
    future — then the previous year.  ``now_us`` is supplied by the
    caller (epoch microseconds), keeping the engine deterministic."""
    import datetime as _dt

    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    now = _dt.datetime.fromtimestamp(now_us / 1e6, _dt.timezone.utc)
    out = []
    for v in ts.to_pylist():
        if v is None:
            out.append(None)
            continue
        d = v.replace(year=now.year)
        if (d - now.replace(tzinfo=None)) > _dt.timedelta(days=7):
            d = d.replace(year=now.year - 1)
        out.append(d)
    return pa.array(out, pa.timestamp("us"))
