"""Sequence packing (stages/packing.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.packing import (
    pack_bins,
    pack_sequences,
)


def _brute_pack(tokens, capacity):
    bins, fill, b = [], None, -1
    for t in tokens:
        if fill is None or fill + t > capacity:
            b += 1
            fill = t
        else:
            fill += t
        bins.append(b)
    return bins


def test_pack_bins_hand_cases():
    assert list(pack_bins(np.array([3, 3, 3]), 6)) == [0, 0, 1]
    assert list(pack_bins(np.array([10, 1, 1]), 6)) == [0, 1, 1]  # oversize solo
    assert list(pack_bins(np.array([6, 6]), 6)) == [0, 1]  # exact fits
    assert list(pack_bins(np.array([], dtype=np.int64), 6)) == []


def test_pack_bins_matches_brute_force():
    rng = np.random.RandomState(9)
    for _ in range(50):
        toks = rng.randint(1, 40, size=rng.randint(1, 60))
        cap = int(rng.randint(8, 80))
        assert list(pack_bins(toks, cap)) == _brute_pack(toks, cap)


def test_pack_sequences_groups_independent():
    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "a", "b", "b"]),
        "tok": pa.array([4, 4, 4, 5, 5, 4, 5, 5], pa.int64()),
    })
    out = pack_sequences(ray.data.from_arrow(t), capacity=9,
                         token_col="tok").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # source a docs (0,1,2,5) tokens 4: bins [0,0,1,1]; offsets [0,4,0,4]
    a = out[out.source == "a"].sort_values("doc_id")
    assert list(a["bin_id"]) == [0, 0, 1, 1]
    assert list(a["bin_offset"]) == [0, 4, 0, 4]
    # source b docs (3,4,6,7) tokens 5: 5+5>9 -> each bin holds one
    b = out[out.source == "b"].sort_values("doc_id")
    assert list(b["bin_id"]) == [0, 1, 2, 3]
    assert list(b["bin_offset"]) == [0, 0, 0, 0]
