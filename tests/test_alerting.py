import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.alerting import (
    cusum_changes, threshold_alerts)


def _run(fn, rows, **kw):
    ds = rd.from_arrow(pa.table(rows))
    out = fn(ds, by="k", value_col="v", ts_col="ts", **kw).to_pandas()
    return out.sort_values(["k", "ts"]).reset_index(drop=True)


def test_hysteresis_latches_inside_band():
    # set at >=10, clear at <=2; 5 is inside the band both before and
    # after the crossing — state must LATCH, not follow the value
    out = _run(threshold_alerts,
               {"k": [1] * 6, "ts": list(range(6)),
                "v": [5, 12, 5, 1, 5, 11]}, hi=10, lo=2)
    assert list(out["alert_state"]) == [-1, 1, 1, -1, -1, 1]
    assert list(out["alert_fired"]) == [0, 1, 0, 0, 0, 1]


def test_hysteresis_series_start_clear_and_isolated():
    out = _run(threshold_alerts,
               {"k": [1, 1, 2, 2], "ts": [0, 1, 0, 1],
                "v": [11, 5, 5, 5]}, hi=10, lo=2)
    # series 2 never crosses: stays clear even though series 1 alerts
    assert list(out["alert_state"]) == [1, 1, -1, -1]
    assert list(out["alert_fired"]) == [1, 0, 0, 0]


def test_hysteresis_boundary_inclusive():
    out = _run(threshold_alerts,
               {"k": [1, 1], "ts": [0, 1], "v": [10, 2]}, hi=10, lo=2)
    assert list(out["alert_state"]) == [1, -1]


def test_hysteresis_requires_band():
    with pytest.raises(ValueError):
        threshold_alerts(rd.from_arrow(pa.table({"k": [1], "ts": [0],
                                                 "v": [1]})),
                         by="k", value_col="v", hi=2, lo=2)


def _cusum_ref(vals, k, h):
    s, out = 0, []
    for v in vals:
        s = max(0, s + (v - k))
        out.append((s, int(s > h)))
    return out


def test_cusum_matches_sequential_recursion():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 20, size=200).tolist()
    keys = rng.integers(0, 5, size=200).tolist()
    out = _run(cusum_changes,
               {"k": keys, "ts": list(range(200)), "v": vals},
               target_k=9, threshold_h=15)
    for key in sorted(set(keys)):
        g = out[out["k"] == key]
        exp = _cusum_ref(list(g["v"]), 9, 15)
        assert list(zip(g["cusum"], g["is_change"])) == exp


def test_cusum_resets_at_zero_floor():
    out = _run(cusum_changes,
               {"k": [1] * 4, "ts": [0, 1, 2, 3], "v": [1, 1, 50, 8]},
               target_k=10, threshold_h=30)
    # the two low points must not build negative debt: s = 0,0,40,38
    assert list(out["cusum"]) == [0, 0, 40, 38]
    assert list(out["is_change"]) == [0, 0, 1, 1]


def test_cusum_int64_exact_large_values():
    big = 10**12
    out = _run(cusum_changes,
               {"k": [1, 1], "ts": [0, 1], "v": [big, big]},
               target_k=0, threshold_h=0)
    assert list(out["cusum"]) == [big, 2 * big]
    assert out["cusum"].dtype == np.int64
