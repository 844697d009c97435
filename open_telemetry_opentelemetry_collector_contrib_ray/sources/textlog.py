"""filelogreceiver analog: plain text log files -> parsed Dataset.

The reference tails files and runs lines through a stanza operator DAG
(/root/reference/receiver/filelogreceiver/filelog.go:19-21 over
pkg/stanza/fileconsumer).  Batch re-expression: `ray.data.read_text`
over the log files (file-parallel), then the same parser stages as any
other source.  Deterministic synthetic log files stand in for tailed
input (no external data)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .transcripts import LEVEL_P, LEVELS, TOOLS, _sentences

LOG_CACHE = "/tmp/graft_textlogs"


def synth_log_file(n_lines: int = 5_000, seed: int = 21, n_files: int = 4) -> str:
    """Deterministic syslog-ish files; ~3% malformed lines.  Returns dir."""
    out_dir = os.path.join(LOG_CACHE, f"n{n_lines}-s{seed}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    rng = np.random.Generator(np.random.PCG64(seed))
    lvl = LEVELS[rng.choice(len(LEVELS), size=n_lines, p=LEVEL_P)]
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n_lines)]
    lat = rng.integers(1, 5000, size=n_lines)
    ts_us = 1_700_000_000_000_000 + np.cumsum(rng.integers(0, 1_000_000, size=n_lines))
    ts = pd.to_datetime(ts_us, unit="us", utc=True).strftime("%Y-%m-%dT%H:%M:%SZ")
    msg = _sentences(rng, n_lines, 2, 8)
    lines = (pd.Series(np.asarray(ts, dtype=object))
             + " " + lvl + " tool=" + tool.astype(str)
             + " status=" + np.where(np.isin(lvl, ["ERROR", "FATAL"]), "error", "ok")
             + " latency_ms=" + lat.astype(str)
             + " msg=" + msg.astype(str)).to_numpy(dtype=object)
    bad = rng.random(n_lines) < 0.03
    lines[bad] = "corrupt " + msg[bad]
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    per = (n_lines + n_files - 1) // n_files
    for i in range(n_files):
        chunk = lines[i * per:(i + 1) * per]
        if len(chunk):
            with open(os.path.join(out_dir + ".tmp", f"app-{i:02d}.log"), "w") as f:
                f.write("\n".join(chunk) + "\n")
    open(os.path.join(out_dir + ".tmp", "_SUCCESS"), "w").close()
    try:
        os.rename(out_dir + ".tmp", out_dir)
    except OSError:
        import shutil

        shutil.rmtree(out_dir + ".tmp", ignore_errors=True)
    return out_dir


def synth_container_log_file(n_lines: int = 4_000, seed: int = 33,
                             n_files: int = 4) -> str:
    """Deterministic mixed docker-json / CRI container log files
    (the reference's heavy-parse benchmark input shape,
    testbed log_test.go:70-114)."""
    import json

    out_dir = os.path.join(LOG_CACHE, f"container-n{n_lines}-s{seed}")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    rng = np.random.Generator(np.random.PCG64(seed))
    ts_us = 1_700_000_000_000_000 + np.cumsum(rng.integers(1, 500_000, size=n_lines))
    ts = pd.to_datetime(ts_us, unit="us", utc=True).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    stream = np.where(rng.random(n_lines) < 0.8, "stdout", "stderr")
    msg = _sentences(rng, n_lines, 3, 10)
    docker = rng.random(n_lines) < 0.5
    partial = rng.random(n_lines) < 0.1
    lines = []
    for i in range(n_lines):
        if docker[i]:
            lines.append(json.dumps({"log": msg[i] + "\n", "stream": str(stream[i]),
                                     "time": ts[i]}))
        else:
            tag = "P" if partial[i] else "F"
            lines.append(f"{ts[i]} {stream[i]} {tag} {msg[i]}")
    bad = rng.random(n_lines) < 0.02
    for i in np.flatnonzero(bad):
        lines[i] = "corrupt " + str(msg[i])
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    per = (n_lines + n_files - 1) // n_files
    for i in range(n_files):
        chunk = lines[i * per:(i + 1) * per]
        if chunk:
            with open(os.path.join(out_dir + ".tmp", f"ctr-{i:02d}.log"), "w") as f:
                f.write("\n".join(chunk) + "\n")
    open(os.path.join(out_dir + ".tmp", "_SUCCESS"), "w").close()
    try:
        os.rename(out_dir + ".tmp", out_dir)
    except OSError:
        import shutil

        shutil.rmtree(out_dir + ".tmp", ignore_errors=True)
    return out_dir


def read_log_lines(log_dir: str):
    """ray.data.read_text over the log files; one `text` column per line."""
    import ray.data as rd

    files = sorted(os.path.join(log_dir, f) for f in os.listdir(log_dir)
                   if f.endswith(".log"))
    return rd.read_text(files)


# ---------------------------------------------------------------------------
# fileconsumer-parity reader (pkg/stanza/fileconsumer + pkg/stanza/split,
# trim, decode, matcher, attrs, internal/header).
#
# Ray-Data re-expression: the FILE is the parallel unit (exactly the
# reference's model — each file is consumed sequentially by one reader),
# so `read_binary_files(include_paths=True)` feeds a vectorized
# map_batches stage that decompresses, decodes, splits and trims each
# file and emits one row per log entry.  At 100 TB this parallelizes by
# file count; a single multi-GB file with plain newline splitting should
# use `read_log_lines` (block-streamed) instead — multiline/header
# semantics are inherently file-scoped, as in the reference.
# ---------------------------------------------------------------------------

def _newline_split(s: str, flush_at_eof: bool) -> list[str]:
    """NewlineSplitFunc port (split.go:139-176): split on \\n, strip one
    trailing \\r, trailing partial only emitted when flushing at EOF."""
    tokens: list[str] = []
    pos = 0
    n = len(s)
    while True:
        i = s.find("\n", pos)
        if i < 0:
            if pos < n and flush_at_eof:
                tokens.append(s[pos:])
            return tokens
        tok = s[pos:i]
        if tok.endswith("\r"):
            tok = tok[:-1]
        tokens.append(tok)
        pos = i + 1


def _line_start_split(s: str, rx, omit_pattern: bool,
                      flush_at_eof: bool) -> list[str]:
    """LineStartSplitFunc port (split.go:58-111), including the
    buffer-advance behavior: content before the first match is its own
    token (never lost), each token runs from one match start to the
    next, and the scan for the next match starts one byte past the
    previous match end (the reference's secondLocOfset quirk)."""
    tokens: list[str] = []
    pos = 0
    n = len(s)
    while True:
        m = rx.search(s, pos)
        if m is None:
            if pos < n and flush_at_eof:
                tokens.append(s[pos:])
            return tokens
        if m.start() > pos:
            # preamble / garbage before the start pattern
            tokens.append(s[pos:m.start()])
            pos = m.start()
            continue
        nxt = rx.search(s, m.end() + 1)
        if nxt is None:
            if flush_at_eof:
                tokens.append(s[m.end():] if omit_pattern else s[pos:])
            return tokens
        tokens.append(s[m.end():nxt.start()] if omit_pattern
                      else s[pos:nxt.start()])
        pos = nxt.start()


def _line_end_split(s: str, rx, omit_pattern: bool,
                    flush_at_eof: bool) -> list[str]:
    """LineEndSplitFunc port (split.go:113-137): tokens end at each
    pattern match; the tail after the last match flushes at EOF."""
    tokens: list[str] = []
    pos = 0
    n = len(s)
    while True:
        m = rx.search(s, pos)
        if m is None:
            if pos < n and flush_at_eof:
                tokens.append(s[pos:])
            return tokens
        tokens.append(s[pos:m.start()] if omit_pattern else s[pos:m.end()])
        pos = m.end()


_TRIM_CUTSET = "\r\n\t "


def _trim_token(tok: str, preserve_leading: bool,
                preserve_trailing: bool) -> str:
    """trim.Config.Func port (pkg/stanza/trim/trim.go): default trims
    both edges of the Go cutset \\r\\n\\t space (NOT full unicode)."""
    if not preserve_leading:
        tok = tok.lstrip(_TRIM_CUTSET)
    if not preserve_trailing:
        tok = tok.rstrip(_TRIM_CUTSET)
    return tok


def _truncate_bytes(tok: str, max_bytes: int) -> str:
    """Truncate to max_bytes of UTF-8 on a codepoint boundary
    (reader.Config MaxLogSize analog; the batch translation truncates
    rather than erroring the whole file)."""
    b = tok.encode("utf-8")
    if len(b) <= max_bytes:
        return tok
    return b[:max_bytes].decode("utf-8", errors="ignore")


def order_files(paths: list[str], ordering_criteria: dict | None):
    """matcher.OrderingCriteria port (fileconsumer/matcher): `regex`
    with named groups + a `sort_by` list ({sort_type:
    numeric|alphabetical|timestamp|mtime, regex_key, ascending,
    layout}), applied sequentially as stable sorts (the LAST entry is
    the primary key, as in the reference), then `top_n`."""
    if not ordering_criteria:
        return paths
    import re as _re

    crit = dict(ordering_criteria)
    rx = _re.compile(crit["regex"]) if crit.get("regex") else None
    paths = list(paths)
    if rx is not None:
        paths = [p for p in paths if rx.search(os.path.basename(p))]

    for sb in crit.get("sort_by", ()):
        st = sb.get("sort_type", "alphabetical")
        reverse = not sb.get("ascending", True)
        if st == "mtime":
            paths.sort(key=os.path.getmtime, reverse=reverse)
            continue
        key_name = sb.get("regex_key", "value")

        def extract(p):
            m = rx.search(os.path.basename(p)) if rx else None
            return m.group(key_name) if m else ""

        if st == "numeric":
            paths.sort(key=lambda p: int(extract(p) or 0), reverse=reverse)
        elif st == "timestamp":
            import datetime as _dt

            layout = sb.get("layout", "%Y%m%d")
            paths.sort(key=lambda p: _dt.datetime.strptime(
                extract(p), layout), reverse=reverse)
        else:
            paths.sort(key=extract, reverse=reverse)
    top_n = crit.get("top_n")
    return paths[:top_n] if top_n else paths


class FileSplitter:
    """Per-file decompress -> decode -> split -> trim -> attrs stage
    (the whole stanza fileconsumer reader path as one vectorized
    map_batches actor; regexes and sub-pipeline compile once here, not
    per batch).

    Emits one row per log entry: `text` (string; `body` bytes when
    encoding="nop"), the attrs.Resolver columns
    (attr_log.file.name/path[_resolved]), optional
    attr_log.file.record_number, plus any header-derived attributes.
    """

    def __init__(self, *, encoding: str = "utf-8",
                 line_start_pattern: str | None = None,
                 line_end_pattern: str | None = None,
                 omit_pattern: bool = False,
                 flush_at_eof: bool = True,
                 preserve_leading_whitespaces: bool = False,
                 preserve_trailing_whitespaces: bool = False,
                 max_log_size: int = 1 << 20,
                 include_file_name: bool = True,
                 include_file_path: bool = False,
                 include_file_name_resolved: bool = False,
                 include_file_path_resolved: bool = False,
                 include_file_record_number: bool = False,
                 compression: str = "auto",
                 header: dict | None = None):
        import re as _re

        if line_start_pattern and line_end_pattern:
            raise ValueError("only one of line_start_pattern or "
                             "line_end_pattern can be set")  # split.go:55
        if encoding == "nop" and (line_start_pattern or line_end_pattern):
            raise ValueError("line patterns require a real encoding "
                             "(split.go nop guard)")
        self.encoding = encoding
        # Go compiles "(?m)" + pattern (split.go:39,48)
        self.start_rx = _re.compile("(?m)" + line_start_pattern) \
            if line_start_pattern else None
        self.end_rx = _re.compile("(?m)" + line_end_pattern) \
            if line_end_pattern else None
        self.omit = omit_pattern
        self.flush = flush_at_eof
        self.pl = preserve_leading_whitespaces
        self.pt = preserve_trailing_whitespaces
        self.max_log_size = max_log_size
        self.attr_flags = (include_file_name, include_file_path,
                           include_file_name_resolved,
                           include_file_path_resolved)
        self.record_number = include_file_record_number
        self.compression = compression
        self.header_rx = None
        self.header_steps = None
        if header:
            self.header_rx = _re.compile(header["pattern"])
            self.header_steps = header.get("metadata_operators", [])

    def _decompress(self, raw: bytes, path: str) -> bytes:
        comp = self.compression
        if comp == "auto":
            # magic-byte sniff ONLY: upstream readers (Arrow's
            # open_input_stream under ray read_binary_files) already
            # auto-decompress by .gz extension, so an extension test
            # would double-decompress
            comp = "gzip" if raw[:2] == b"\x1f\x8b" else ""
        if comp in ("", "none", None):
            return raw
        if comp == "gzip":
            import gzip

            return gzip.decompress(raw)
        if comp == "zstd":
            raise NotImplementedError(
                "zstd input needs the zstandard module")
        raise ValueError(f"unknown compression {comp!r}")

    def _split(self, s: str) -> list[str]:
        if self.start_rx is not None:
            toks = _line_start_split(s, self.start_rx, self.omit, self.flush)
        elif self.end_rx is not None:
            toks = _line_end_split(s, self.end_rx, self.omit, self.flush)
        else:
            toks = _newline_split(s, self.flush)
        return [_truncate_bytes(_trim_token(t, self.pl, self.pt),
                                self.max_log_size) for t in toks]

    def _header_attrs(self, tokens: list[str]) -> tuple[dict, int]:
        """internal/header analog: leading tokens matching
        header_pattern run through the metadata_operators sub-pipeline;
        their attr_* outputs attach to every entry of the file and the
        header lines are consumed."""
        if self.header_rx is None:
            return {}, 0
        n_hdr = 0
        while n_hdr < len(tokens) and self.header_rx.search(tokens[n_hdr]):
            n_hdr += 1
        if n_hdr == 0:
            return {}, 0
        import pyarrow as pa

        from ..pipelines.builder import STEP_REGISTRY, DatasetStep

        t = pa.table({"text": pa.array(tokens[:n_hdr], pa.string())})
        for cfg in self.header_steps:
            stage = STEP_REGISTRY[cfg["type"]](cfg)
            if isinstance(stage, DatasetStep):
                raise ValueError("header metadata_operators must be "
                                 "per-batch steps")
            t = stage(t)
        attrs: dict[str, object] = {}
        for col in t.column_names:
            if col.startswith("attr_"):
                vals = [v for v in t.column(col).to_pylist() if v is not None]
                if vals:
                    attrs[col] = vals[-1]  # last header line wins
        return attrs, n_hdr

    def __call__(self, batch):
        import pyarrow as pa

        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        texts: list[str] = []
        cols: dict[str, list] = {}
        name_f, path_f, namer_f, pathr_f = self.attr_flags
        for attr_on, key in ((name_f, "attr_log.file.name"),
                             (path_f, "attr_log.file.path"),
                             (namer_f, "attr_log.file.name_resolved"),
                             (pathr_f, "attr_log.file.path_resolved")):
            if attr_on:
                cols[key] = []
        if self.record_number:
            cols["attr_log.file.record_number"] = []
        header_cols: dict[str, list] = {}
        row_files: list[int] = []

        for fi, (path, raw) in enumerate(zip(paths, blobs)):
            data = self._decompress(raw, path)
            if self.encoding == "nop":
                toks = [data[i:i + self.max_log_size]
                        for i in range(0, len(data), self.max_log_size)]
            else:
                toks = self._split(data.decode(self.encoding))
            attrs, n_hdr = self._header_attrs(toks) \
                if self.encoding != "nop" else ({}, 0)
            toks = toks[n_hdr:]
            base = os.path.basename(path)
            resolved = os.path.abspath(os.path.realpath(path))
            for i, tok in enumerate(toks):
                texts.append(tok)
                row_files.append(fi)
                if name_f:
                    cols["attr_log.file.name"].append(base)
                if path_f:
                    cols["attr_log.file.path"].append(path)
                if namer_f:
                    cols["attr_log.file.name_resolved"].append(
                        os.path.basename(resolved))
                if pathr_f:
                    cols["attr_log.file.path_resolved"].append(resolved)
                if self.record_number:
                    cols["attr_log.file.record_number"].append(i + 1)
                for k, v in attrs.items():
                    header_cols.setdefault(k, [None] * (len(texts) - 1))
                    header_cols[k].append(v)
            for k in header_cols:
                if len(header_cols[k]) < len(texts):
                    header_cols[k].extend(
                        [None] * (len(texts) - len(header_cols[k])))

        out: dict[str, object] = {}
        if self.encoding == "nop":
            out["body"] = pa.array(texts, pa.binary())
        else:
            out["text"] = pa.array(texts, pa.string())
        for k, v in cols.items():
            typ = pa.int64() if k.endswith("record_number") else pa.string()
            out[k] = pa.array(v, typ)
        for k, v in header_cols.items():
            out[k] = pa.array(v, pa.string())
        return pa.table(out)


def read_log_files(include, *, exclude=(), ordering_criteria=None,
                   parallelism: int = -1, **splitter_kw):
    """fileconsumer front door: glob include/exclude + ordering
    criteria (driver-side metadata only), then file-parallel
    read_binary_files -> FileSplitter.  See FileSplitter for the
    per-file knobs (encoding, line_start/end_pattern, trim, attrs,
    header, compression, max_log_size)."""
    import glob as _glob

    import ray.data as rd

    if isinstance(include, str):
        include = [include]
    paths: list[str] = []
    for pat in include:
        paths.extend(_glob.glob(pat))
    excluded = set()
    for pat in (exclude if not isinstance(exclude, str) else [exclude]):
        excluded.update(_glob.glob(pat))
    paths = sorted(p for p in set(paths) - excluded if os.path.isfile(p))
    paths = order_files(paths, ordering_criteria)
    if not paths:
        raise FileNotFoundError(f"no files match {include!r}")
    ds = rd.read_binary_files(paths, include_paths=True,
                              override_num_blocks=max(len(paths), 1)
                              if parallelism == -1 else parallelism)
    return ds.map_batches(FileSplitter(**splitter_kw),
                          batch_format="pyarrow")


def synth_multiline_log_file(n_entries: int = 4_000, seed: int = 47,
                             n_files: int = 6) -> str:
    """Deterministic multiline app logs: each entry starts with a
    timestamped header line; ERROR/FATAL entries carry 1-4 indented
    stack-frame continuation lines.  Every line ends with a global
    per-file `seq=N` so the DuckDB oracle can replay entry reassembly
    deterministically (ORDER BY seq, not file order).  Half the files
    are gzipped to exercise the decompress path.  Returns dir."""
    out_dir = os.path.join(LOG_CACHE, f"ml-n{n_entries}-s{seed}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    import gzip

    rng = np.random.Generator(np.random.PCG64(seed))
    lvl = LEVELS[rng.choice(len(LEVELS), size=n_entries, p=LEVEL_P)]
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n_entries)]
    n_frames = np.where(np.isin(lvl, ["ERROR", "FATAL"]),
                        rng.integers(1, 5, size=n_entries), 0)
    ts_us = 1_700_000_000_000_000 + np.cumsum(
        rng.integers(0, 1_000_000, size=n_entries))
    ts = pd.to_datetime(ts_us, unit="us", utc=True).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    msg = _sentences(rng, n_entries, 2, 6)
    per = (n_entries + n_files - 1) // n_files
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, n_entries)
        if lo >= hi:
            continue
        seq = 0
        lines: list[str] = []
        for j in range(lo, hi):
            seq += 1
            lines.append(f"{ts[j]} {lvl[j]} tool={tool[j]} "
                         f"msg={msg[j]} seq={seq}")
            for k in range(n_frames[j]):
                seq += 1
                lines.append(f"    at {tool[j]}.step_{k} "
                             f"(line {100 + (j + k) % 900}) seq={seq}")
        path = os.path.join(out_dir + ".tmp", f"svc-{i:02d}.log")
        body = ("\n".join(lines) + "\n").encode()
        if i % 2:
            with open(path + ".gz", "wb") as raw:
                with gzip.GzipFile(fileobj=raw, mode="wb",
                                   compresslevel=1, mtime=0) as f:
                    f.write(body)
        else:
            with open(path, "wb") as f:
                f.write(body)
    open(os.path.join(out_dir + ".tmp", "_SUCCESS"), "w").close()
    try:
        os.rename(out_dir + ".tmp", out_dir)
    except OSError:
        import shutil

        shutil.rmtree(out_dir + ".tmp", ignore_errors=True)
    return out_dir


def synth_journald_export(seed: int = 21) -> str:
    """Deterministic journalctl ``-o json`` export fixture derived from
    the synth_log_file lines (same corpus both sides of the oracle):
    one JSON object per line with __REALTIME_TIMESTAMP / __CURSOR /
    MESSAGE / PRIORITY / _SYSTEMD_UNIT; severity levels map to syslog
    priorities (FATAL->2 ERROR->3 WARN->4 INFO->6 TRACE/DEBUG->7),
    malformed source lines get priority 6.  Returns the file path."""
    import json as _json
    import re as _re

    log_dir = synth_log_file(seed=seed)
    out_dir = os.path.join(LOG_CACHE, f"journald-s{seed}")
    out_path = os.path.join(out_dir, "export.json")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_path
    prio = {"FATAL": 2, "ERROR": 3, "WARN": 4, "INFO": 6,
            "DEBUG": 7, "TRACE": 7}
    pat = _re.compile(r"^\S+ ([A-Z]+) ")
    lines = []
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".log"):
            with open(os.path.join(log_dir, f)) as fh:
                lines.extend(fh.read().splitlines())
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    with open(os.path.join(out_dir + ".tmp", "export.json"), "w") as f:
        for i, line in enumerate(lines):
            m = pat.match(line)
            p = prio.get(m.group(1), 6) if m else 6
            f.write(_json.dumps({
                "__REALTIME_TIMESTAMP": str(1_700_000_000_000_000 + i),
                "__CURSOR": f"s=graft;i={i:x}",
                "MESSAGE": line,
                "PRIORITY": str(p),
                "_SYSTEMD_UNIT": "graft-app.service",
            }, sort_keys=True) + "\n")
    open(os.path.join(out_dir + ".tmp", "_SUCCESS"), "w").close()
    try:
        os.rename(out_dir + ".tmp", out_dir)
    except OSError:
        pass
    return out_path


def synth_wineventlog(seed: int = 21) -> str:
    """Deterministic Windows Event Log rendered-XML fixture (one
    single-line <Event> per synth_log_file line): Level from the
    severity word (FATAL->1 ERROR->2 WARN->3 INFO->4, DEBUG/TRACE->5 =
    DEFAULT, malformed->4), EventRecordID = line index, SystemTime =
    base + index microseconds.  Returns the file path."""
    import re as _re
    from xml.sax.saxutils import escape as _esc

    log_dir = synth_log_file(seed=seed)
    out_dir = os.path.join(LOG_CACHE, f"winevt-s{seed}")
    out_path = os.path.join(out_dir, "events.xml.log")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_path
    lvl = {"FATAL": 1, "ERROR": 2, "WARN": 3, "INFO": 4,
           "DEBUG": 5, "TRACE": 5}
    pat = _re.compile(r"^\S+ ([A-Z]+) ")
    lines = []
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".log"):
            with open(os.path.join(log_dir, f)) as fh:
                lines.extend(fh.read().splitlines())
    base_us = 1_700_000_000_000_000
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    with open(os.path.join(out_dir + ".tmp", "events.xml.log"), "w") as f:
        for i, line in enumerate(lines):
            m = pat.match(line)
            level = lvl.get(m.group(1), 4) if m else 4
            us = base_us + i
            sec, micro = divmod(us, 1_000_000)
            import datetime as _dt

            stamp = _dt.datetime.fromtimestamp(
                sec, _dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
            f.write(
                '<Event xmlns="http://schemas.microsoft.com/win/2004/08/'
                'events/event"><System><Provider Name="graft-app"/>'
                f'<EventID>{1000 + level}</EventID>'
                f'<Level>{level}</Level>'
                f'<TimeCreated SystemTime="{stamp}.{micro:06d}Z"/>'
                f'<EventRecordID>{i}</EventRecordID>'
                '<Channel>Application</Channel>'
                '<Computer>graft-host</Computer></System>'
                f'<EventData><Data Name="msg">{_esc(line)}</Data>'
                '</EventData></Event>\n')
    open(os.path.join(out_dir + ".tmp", "_SUCCESS"), "w").close()
    try:
        os.rename(out_dir + ".tmp", out_dir)
    except OSError:
        pass
    return out_path
