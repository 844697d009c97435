"""Deterministic synthetic transcript corpus (the primary input table).

Shape is fixed by BASELINE.json input_hint / FIXTURES.md F1:

    conv_id:  string        "conv-%06d"
    turn_idx: int32         dense 0..k-1 within a conversation
    role:     string        {"system","user","assistant","tool"}
    text:     string        tool rows are parseable log lines (grok/regex target)
    tool:     string        tool name or "" for non-tool turns
    ts:       timestamp[us] monotone (non-strict) within a conversation

The generator is seeded and fully deterministic (numpy PCG64) so the
same corpus can be reproduced in any process — the DuckDB oracle and
the Ray pipeline read the same Parquet files from a shared cache dir.

Edge cases baked in (FIXTURES.md F6): ~3% malformed tool log lines
(regex non-match -> parse_failure path), empty texts, multi-KB texts,
unicode, duplicate consecutive tool lines (logdedup fixture), one hot
conversation holding ~10% of all turns (skew/salting fixture), rows
with identical ts but distinct turn_idx.

This plays the role of the reference's load generator
(`testbed/testbed/data_providers.go`) + golden fixtures
(`pkg/pdatatest/plogtest/testdata/`): synthetic, deterministic input
with known expected behavior.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed (no wall clock)

TOOLS = np.array(["search", "python", "browser", "calculator", "database", "email"])
LEVELS = np.array(["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"])
LEVEL_P = np.array([0.05, 0.15, 0.45, 0.20, 0.12, 0.03])

# F2 enrichment lookup table (k8sattributes / geoip analog).  "shell" is
# deliberately ABSENT from the catalog to exercise insert-default semantics.
TOOL_CATALOG = {
    "search": {"tool_category": "retrieval", "owner": "team-search", "risk_level": 1},
    "python": {"tool_category": "code", "owner": "team-runtime", "risk_level": 2},
    "browser": {"tool_category": "web", "owner": "team-web", "risk_level": 2},
    "calculator": {"tool_category": "code", "owner": "team-runtime", "risk_level": 0},
    "database": {"tool_category": "retrieval", "owner": "team-data", "risk_level": 3},
    "email": {"tool_category": "comms", "owner": "team-apps", "risk_level": 3},
}

_VOCAB = (
    "the quick brown fox jumps over lazy dog while system processes stream of telemetry "
    "records through pipeline stages parsing enriching routing aggregating each turn with "
    "careful attention to order and timing because conversations unfold across many turns "
    "agents call tools observe results retry on failure summarize findings report metrics "
    "latency throughput errors warnings collected batched exported downstream for analysis "
    "model answers question user asks about data quality tokens language scores duplicate "
    "content fingerprints shingles hashes buckets bands candidates verified neighbors"
).split()
_UNICODE_SNIPPETS = ["naïve café résumé", "日本語のテキスト", "données télémétrie", "Привет мир"]

# sf-dir basename -> approximate number of turns (FIXTURES.md scales)
_SF_TURNS = {"sf0.001": 2_000, "sf0.01": 60_000, "sf0.1": 600_000,
             "sf1": 6_000_000, "sf10": 60_000_000}
_CHUNK_TURNS = 6_000_000  # generate giant corpora in seeded chunks (memory cap)

CACHE_ROOT = os.environ.get("GRAFT_TRANSCRIPTS_DIR", "/tmp/graft_transcripts")


def _sentences(rng: np.random.Generator, n: int, min_w: int = 4, max_w: int = 18) -> np.ndarray:
    """n deterministic lorem-ish sentences from the fixed vocab.

    Fully vectorized: sample a (n, max_w) word matrix, blank the tail of
    each row beyond its length, join via pandas str.cat — no python loop
    (the loop version cost ~17µs/row; this is ~1µs/row)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = rng.integers(min_w, max_w + 1, size=n)
    idx = rng.integers(0, len(_VOCAB), size=(n, max_w))
    vocab = pa.array(_VOCAB, type=pa.string())
    keep = np.arange(max_w)[None, :] < lens[:, None]
    empty = pa.repeat(pa.scalar(""), n)
    cols = []
    for j in range(max_w):
        words_j = pc.take(vocab, pa.array(idx[:, j]))
        cols.append(pc.if_else(pa.array(keep[:, j]), words_j, empty))
    # keep-mask is a prefix per row, so blanks only trail: join then rtrim
    joined = pc.utf8_rtrim_whitespace(pc.binary_join_element_wise(*cols, " "))
    return joined.to_numpy(zero_copy_only=False)


def synth_transcripts(n_turns: int, seed: int = SEED, id_prefix: str = "") -> pa.Table:
    """Build the transcript table deterministically.
    Pure function of (n_turns, seed, id_prefix)."""
    rng = np.random.Generator(np.random.PCG64(seed))

    # --- conversation sizes: lognormal (zipf-ish tail) + one hot conversation (~10%)
    hot_turns = max(8, n_turns // 10)
    rest = n_turns - hot_turns
    sizes = []
    acc = 0
    while acc < rest:
        chunk = np.maximum(2, rng.lognormal(2.5, 0.9, size=4096).astype(np.int64))
        sizes.append(chunk)
        acc += int(chunk.sum())
    sizes = np.concatenate(sizes)
    cut = np.searchsorted(np.cumsum(sizes), rest) + 1
    sizes = sizes[:cut]
    sizes[-1] = max(2, rest - int(sizes[:-1].sum()))
    # hot conversation inserted at a fixed position
    sizes = np.concatenate([sizes[: len(sizes) // 2], [hot_turns], sizes[len(sizes) // 2 :]])
    n_convs = len(sizes)
    n = int(sizes.sum())

    conv_num = np.repeat(np.arange(n_convs), sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    conv_ids = np.char.add(f"conv-{id_prefix}", np.char.zfill(np.arange(n_convs).astype(str), 6))
    conv_id = conv_ids[conv_num]

    # --- roles: turn0 system; then user/assistant alternating; ~45% of assistant
    # slots become tool turns (agents call tools mid-conversation)
    role = np.where(turn_idx % 2 == 1, "user", "assistant")
    role = np.where(turn_idx == 0, "system", role)
    asst = (turn_idx > 0) & (turn_idx % 2 == 0)
    tool_mask = asst & (rng.random(n) < 0.45)
    # ~20% of tool turns chain into the following row (two consecutive tool
    # calls in one conversation) -> enables the logdedup duplicate fixture
    chain = np.zeros(n, dtype=bool)
    chain[1:] = tool_mask[:-1] & (rng.random(n - 1) < 0.2) & (turn_idx[1:] > 0)
    tool_mask = tool_mask | chain
    role = np.where(tool_mask, "tool", role).astype(object)

    tool = np.where(tool_mask, TOOLS[rng.integers(0, len(TOOLS), size=n)], "").astype(object)
    # a few tool turns use an uncataloged tool -> enrichment default path
    uncat = tool_mask & (rng.random(n) < 0.04)
    tool = np.where(uncat, "shell", tool).astype(object)

    # --- timestamps: conv start offset by conv index, steps 0..30s (some 0 => equal ts)
    steps = rng.integers(0, 30_000_000, size=n)
    steps[rng.random(n) < 0.02] = 0  # identical-ts edge case
    conv_start = BASE_TS_US + conv_num.astype(np.int64) * 3_600_000_000
    cum = np.cumsum(steps)
    cum = cum - np.repeat(cum[starts], sizes)  # per-conv cumulative offsets, first = 0
    ts_us = conv_start + cum

    # --- text
    text = _sentences(rng, n).astype(object)
    # keyword injections for routing conditions
    kw = rng.random(n)
    text[kw < 0.02] = text[kw < 0.02] + " timeout while waiting for upstream"
    mask_u = (kw >= 0.02) & (kw < 0.03)
    text[mask_u] = text[mask_u] + " " + rng.choice(_UNICODE_SNIPPETS, size=int(mask_u.sum()))
    text[(kw >= 0.995)] = ""  # empty-text edge case
    big = (kw >= 0.992) & (kw < 0.995)
    text[big] = text[big] + " " + " ".join(["padding"] * 600)  # multi-KB rows

    # tool rows: "<RFC3339> <LEVEL> tool=<t> status=<ok|error> latency_ms=<n> msg=<free>"
    t_idx = np.flatnonzero(tool_mask)
    lvl = LEVELS[rng.choice(len(LEVELS), size=len(t_idx), p=LEVEL_P)]
    status = np.where(np.isin(lvl, ["ERROR", "FATAL"]), "error", "ok")
    lat = rng.integers(1, 2000, size=len(t_idx))
    # heavy tail of latencies on some rows
    slow = rng.random(len(t_idx)) < 0.05
    lat[slow] = rng.integers(2000, 30_000, size=int(slow.sum()))
    ts_str = pd.to_datetime(ts_us[t_idx], unit="us", utc=True).strftime("%Y-%m-%dT%H:%M:%SZ")
    msg = _sentences(rng, len(t_idx), 2, 8)
    tool_text = (
        pd.Series(np.asarray(ts_str, dtype=object))
        + " " + lvl
        + " tool=" + tool[t_idx].astype(str)
        + " status=" + status
        + " latency_ms=" + lat.astype(str)
        + " msg=" + msg.astype(str)
    ).to_numpy(dtype=object)
    # ~3% malformed tool lines (regex non-match -> on_error "send" path keeps row)
    bad = rng.random(len(t_idx)) < 0.03
    tool_text[bad] = "corrupted " + msg[bad]
    text[t_idx] = tool_text

    # duplicate consecutive tool lines within a conversation (logdedup fixture):
    # where row i and i-1 are both tool rows of the same conv, sometimes copy text
    prev_same = np.zeros(n, dtype=bool)
    prev_same[1:] = tool_mask[1:] & tool_mask[:-1] & (conv_num[1:] == conv_num[:-1])
    dup = prev_same & (rng.random(n) < 0.5)
    di = np.flatnonzero(dup)
    text[di] = text[di - 1]
    tool[di] = tool[di - 1]

    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        }
    )


def transcripts_path(sf_dir: str) -> str:
    """Cache directory holding the transcript parquet files for an sf dir."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(CACHE_ROOT, base)


def ensure_transcripts(sf_dir: str, files_hint: int | None = None) -> str:
    """Generate (once, atomically) the transcript corpus matching an sf dir.

    Returns the directory containing part-*.parquet files.  Multiple
    files (~64Ki rows each) so ray.data.read_parquet gets natural read
    parallelism; rows are written in (conv_id, turn_idx) order so each
    conversation is contiguous in one file (locality for per-conv ops).
    """
    base = os.path.basename(os.path.normpath(sf_dir))
    n_turns = _SF_TURNS.get(base)
    if n_turns is None:  # e.g. a raw path: scale from its lineitem if present, else default
        n_turns = 60_000
    out_dir = transcripts_path(sf_dir)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{base}-", dir=CACHE_ROOT)
    rows_per_file = 65_536
    n_chunks = max(1, (n_turns + _CHUNK_TURNS - 1) // _CHUNK_TURNS)
    fileno = 0
    for c in range(n_chunks):
        chunk_rows = min(_CHUNK_TURNS, n_turns - c * _CHUNK_TURNS)
        prefix = f"{c:02d}-" if n_chunks > 1 else ""
        table = synth_transcripts(chunk_rows, seed=SEED + c, id_prefix=prefix)
        nfiles = files_hint or max(1, (table.num_rows + rows_per_file - 1) // rows_per_file)
        step = (table.num_rows + nfiles - 1) // nfiles
        for i in range(nfiles):
            piece = table.slice(i * step, step)
            if piece.num_rows:
                pq.write_table(piece, os.path.join(tmp, f"part-{fileno:05d}.parquet"))
                fileno += 1
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # concurrent generator won the race; keep theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def transcript_files(sf_dir: str) -> list[str]:
    """Sorted parquet file list of the (cached) transcript corpus — the
    stable physical units the locality-aware (``*_sorted``) operators
    partition by."""
    path = ensure_transcripts(sf_dir)
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """ray.data.read_parquet over the (cached) transcript corpus for sf_dir."""
    import ray.data as rd

    return rd.read_parquet(transcript_files(sf_dir), columns=columns)
