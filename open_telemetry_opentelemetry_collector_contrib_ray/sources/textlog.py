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
