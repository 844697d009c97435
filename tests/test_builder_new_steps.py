"""Declarative steps for the round-2 session-3 ops (window/skew_join/bpe)."""
import numpy as np
import pandas as pd
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
    build_pipeline)


def _mk(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def test_window_step():
    df = pd.DataFrame({"k": [0, 0, 0, 1, 1], "o": [1, 2, 3, 1, 2],
                       "v": [10, 20, 30, 5, 7]})
    out = build_pipeline(_mk(df), [
        {"type": "window", "keys": ["k"], "order_by": ["o"],
         "specs": [{"kind": "row_number", "out": "rn"},
                   {"kind": "lag", "col": "v", "out": "pv"}]},
    ]).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    assert out["pv"].fillna(-1).tolist() == [-1, 10, 20, -1, 5]


def test_skew_join_step():
    left = pd.DataFrame({"k": [7] * 50 + [1, 2], "lv": range(52)})
    right = pd.DataFrame({"k": [7, 1, 3], "rv": [70, 10, 30]})
    out = build_pipeline(_mk(left), [
        {"type": "skew_join", "right": _mk(right, 2), "on": ["k"],
         "hot_keys": [7], "n_salt": 4},
    ]).to_pandas()
    assert len(out) == 51  # 50 hot + k=1; k=2 unmatched
    assert (out.loc[out["k"] == 7, "rv"] == 70).all()


def test_bpe_count_step():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.bpe import (
        bpe_train, word_frequencies)

    df = pd.DataFrame({"text": ["low lower", "newest widest"]})
    wt = word_frequencies(_mk(df, 1))
    merges = bpe_train(wt, 6)
    out = build_pipeline(_mk(df, 1), [
        {"type": "bpe_count", "merges": [list(m) for m in merges]},
    ]).to_pandas()
    assert (out["n_bpe_tokens"] > 0).all()
