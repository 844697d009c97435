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


def test_burn_rate_multiwindow_rule():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.alerting import (
        burn_rate_alerts,
    )

    # bucket=10us, short=2 buckets, long=4 buckets, slo 0.9 (budget .1)
    # svc a: buckets 0,1 healthy; buckets 2,3 all-bad -> at bucket 3
    # short window (2,3) ratio 1.0 burn 10; long window (0..3) ratio
    # 0.5 burn 5 -> alert.  At bucket 2: short (1,2) ratio .5 burn 5,
    # long (0,1,2) ratio 1/3 burn 3.33 -> alert at threshold 2; at
    # bucket 1 ratio 0 -> no alert.
    rows = []
    for bkt, bad in [(0, 0), (1, 0), (2, 1), (3, 1)]:
        rows.append(("a", bkt * 10 + 1, bad))
    t = pa.table({"svc": pa.array([r[0] for r in rows], pa.string()),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "bad": pa.array([r[2] for r in rows], pa.int64())})
    out = {r["bucket"]: r for r in burn_rate_alerts(
        rd.from_arrow(t), ["svc"], slo_target=0.9,
        short_us=20, long_us=40, bucket_us=10,
        burn_threshold=2.0).take_all()}
    assert out[0]["alert"] is False and out[1]["alert"] is False
    assert out[2]["alert"] is True
    assert out[3]["alert"] is True
    assert out[3]["n_long"] == 4 and out[3]["bad_long"] == 2
    assert out[3]["burn_short"] == (1.0 / 1.0) / (1.0 - 0.9) * 1.0
    # sparse gap: a bucket far away must NOT see the old window
    t2 = pa.table({"svc": pa.array(["a", "a"], pa.string()),
                   "ts": pa.array([1, 100001], pa.int64()),
                   "bad": pa.array([1, 0], pa.int64())})
    out2 = {r["bucket"]: r for r in burn_rate_alerts(
        rd.from_arrow(t2), ["svc"], slo_target=0.9,
        short_us=20, long_us=40, bucket_us=10).take_all()}
    assert out2[10000]["bad_long"] == 0


def test_burn_rate_key_isolation_and_validation():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.alerting import (
        burn_rate_alerts,
    )

    # key b's bad events must not leak into a's windows even at
    # adjacent composite codes
    t = pa.table({"svc": pa.array(["a", "b"], pa.string()),
                  "ts": pa.array([11, 11], pa.int64()),
                  "bad": pa.array([0, 1], pa.int64())})
    out = {r["svc"]: r for r in burn_rate_alerts(
        rd.from_arrow(t), ["svc"], short_us=20, long_us=40,
        bucket_us=10).take_all()}
    assert out["a"]["bad_long"] == 0 and out["b"]["bad_long"] == 1
    with pytest.raises(ValueError, match="slo_target"):
        burn_rate_alerts(None, ["svc"], slo_target=1.0)
    with pytest.raises(ValueError, match="short_us"):
        burn_rate_alerts(None, ["svc"], short_us=50, long_us=20)
