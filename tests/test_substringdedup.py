"""Exact substring dedup (stages/substringdedup.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.substringdedup import (
    WindowEmitter,
    dedup_substrings,
    duplicate_windows,
)

DUP = "the quick brown fox jumps over the lazy dog again and again tonight"
DOCS = [
    (0, f"alpha beta {DUP} gamma delta epsilon zeta eta theta iota kappa"),
    (1, f"one two three four five six seven eight nine ten {DUP}"),
    (2, "totally unique words nothing repeats here at all frankly speaking "
        "mountain river ocean forest desert valley canyon plateau"),
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": [t for _, t in DOCS]}))


def _brute_force(docs, w):
    import re

    tok = re.compile(r"[a-z0-9_]+")
    wins = {}
    occ = []
    for did, text in docs:
        toks = tok.findall(text.lower())
        for p in range(len(toks) - w + 1):
            key = " ".join(toks[p:p + w])
            wins.setdefault(key, []).append((did, p))
            occ.append((did, p, key))
    dup = {k for k, v in wins.items() if len(v) >= 2}
    return sorted((d, p) for d, p, k in occ if k in dup)


def test_duplicate_windows_match_brute_force():
    w = 8
    got = duplicate_windows(_ds(), w=w, keep_keeper=False).to_pandas()
    got = sorted(map(tuple, got[["doc_id", "pos"]].itertuples(index=False)))
    assert got == _brute_force(DOCS, w)
    assert got  # the planted duplicate must actually be detected


def test_keeper_is_global_min_occurrence():
    w = 8
    df = duplicate_windows(_ds(), w=w).to_pandas()
    # the planted DUP appears in doc 0 (earlier) and doc 1: every keeper
    # occurrence must be in doc 0 for windows fully inside DUP
    keepers = df[df.keeper]
    non = df[~df.keeper]
    assert (keepers.doc_id == 0).all()
    assert set(non.doc_id) == {1}


def test_cut_removes_duplicate_keeps_one_copy():
    out = dedup_substrings(_ds, w=8).to_pandas().sort_values("doc_id")
    t0, t1, t2 = out.text.tolist()
    assert DUP in t0                      # keeper copy intact
    assert "quick brown fox" not in t1    # non-keeper copy removed
    assert "one two three four five six seven eight nine ten" in t1
    assert t2 == DOCS[2][1]               # untouched doc unchanged
    # no cross-doc duplicated windows remain
    again = duplicate_windows(
        ray.data.from_pandas(out[["doc_id", "text"]]), w=8,
        keep_keeper=False).to_pandas()
    assert len(again) == 0 or len(set(again["doc_id"])) <= 1


def test_cut_join_strategy_equals_broadcast():
    a = dedup_substrings(_ds, w=8, strategy="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup_substrings(_ds, w=8, strategy="join").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "text"]].equals(b[["doc_id", "text"]])


def test_cut_auto_strategy_switches_past_threshold():
    # max_driver_cuts=0: any cut position trips the auto-switch to the
    # join path; output must equal the broadcast path either way
    a = dedup_substrings(_ds, w=8, strategy="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup_substrings(_ds, w=8, strategy="auto",
                         max_driver_cuts=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    c = dedup_substrings(_ds, w=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)  # auto default -> broadcast
    assert a[["doc_id", "text"]].equals(b[["doc_id", "text"]])
    assert a[["doc_id", "text"]].equals(c[["doc_id", "text"]])


def test_window_emitter_short_docs_and_empties():
    t = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "text": ["one two", None]})
    out = WindowEmitter(w=8)(t)
    assert out.num_rows == 0
    assert out.schema.field("h").type == pa.uint64()


def test_within_doc_repeats_count_as_duplicates():
    text = "x1 x2 x3 x4 x5 x6 x7 x8 filler " + "x1 x2 x3 x4 x5 x6 x7 x8"
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([5], pa.int64()),
                                       "text": [text]}))
    df = duplicate_windows(ds, w=8).to_pandas()
    assert set(df.pos) == {0, 9}
    assert df[df.keeper].pos.item() == 0
