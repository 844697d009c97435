"""Fixed-grid forward-fill resample (stages/resample.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
    resample_ffill,
)

US = 1_000_000


def _ds(rows):
    import ray.data as rd
    k, ts, v = zip(*rows)
    return rd.from_arrow(pa.table({
        "k": pa.array(k),
        "ts": pa.array(np.array(ts, dtype="int64"),
                       pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(v, pa.float64()),
    })).repartition(3)


def test_resample_ffill_basic_and_staleness():
    # series a: obs at t=5s and t=125s; series b: first obs only at
    # 170s, plus a later 190s point that fixes the corpus max
    ds = _ds([("a", 5 * US, 1.0), ("a", 125 * US, 2.0),
              ("b", 170 * US, 9.0), ("b", 190 * US, 9.5)])
    out = resample_ffill(ds, by="k", step_us=60 * US).to_pandas() \
        .sort_values(["k", "grid_ts"]).reset_index(drop=True)
    # bounds: min=5s -> grid floor 0s, max=190s -> steps 0,60,120,180
    assert len(out) == 8
    a = out[out["k"] == "a"]["value"].tolist()
    b = out[out["k"] == "b"]["value"].tolist()
    assert np.isnan(a[0]) and a[1:] == [1.0, 1.0, 2.0]  # ffill across gap
    assert all(np.isnan(x) for x in b[:3]) and b[3] == 9.0  # staleness

    # grid timestamps are the floored step multiples
    g = out[out["k"] == "a"]["grid_ts"].astype("int64").tolist()
    assert g == [0, 60 * US, 120 * US, 180 * US]


def test_resample_ffill_same_ts_ties_take_max():
    # two observations of one series at the SAME microsecond: the
    # pre-asof reduce must pick the max regardless of block order
    ds = _ds([("a", 0, 3.0), ("a", 0, 7.0), ("a", 0, 5.0)])
    out = resample_ffill(ds, by="k", step_us=60 * US).to_pandas()
    assert out["value"].tolist() == [7.0]


def test_resample_ffill_explicit_bounds_and_exact_grid_match():
    # observation exactly ON a grid point is included (allow-exact asof)
    ds = _ds([("a", 60 * US, 4.0)])
    out = resample_ffill(ds, by="k", step_us=60 * US,
                         start_us=0, end_us=180 * US).to_pandas() \
        .sort_values("grid_ts").reset_index(drop=True)
    vals = out["value"].tolist()
    assert np.isnan(vals[0]) and vals[1:] == [4.0, 4.0, 4.0]
    assert len(out) == 4


def test_resample_lerp_hand_values():
    import numpy as np
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        resample_lerp,
    )

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "ts": pa.array([100, 300, 400, 250], pa.timestamp("us")),
        "value": pa.array([10.0, 30.0, 10.0, 5.0], pa.float64()),
    })
    out = resample_lerp(rd.from_arrow(t), "k", step_us=100,
                        start_us=0, end_us=400, n_buckets=2)
    rows = {(r["k"], r["grid_ts"].timestamp() * 1e6 if hasattr(
        r["grid_ts"], "timestamp") else r["grid_ts"]): r["value"]
        for r in out.take_all()}
    got = {(k, int(ts)): v for (k, ts), v in rows.items()}
    import math
    # a: t=0 before first -> null; t=100 exact hit 10; t=200 midpoint 20
    # t=300 exact 30; t=400 exact 10
    def _isnull(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    assert _isnull(got[("a", 0)])
    assert got[("a", 100)] == 10.0
    assert got[("a", 200)] == 20.0
    assert got[("a", 300)] == 30.0
    assert got[("a", 400)] == 10.0
    # b: single obs at 250 -> all grid points null except none on-grid
    for ts in (0, 100, 200, 300, 400):
        assert _isnull(got[("b", ts)])


def test_resample_lerp_ties_reduce_to_max():
    import math
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        resample_lerp,
    )

    t = pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "ts": pa.array([0, 0, 200], pa.timestamp("us")),
        "value": pa.array([1.0, 9.0, 9.0], pa.float64()),
    })
    out = resample_lerp(rd.from_arrow(t), "k", step_us=100,
                        start_us=0, end_us=200, n_buckets=2)
    got = {int(r["grid_ts"].timestamp() * 1e6): r["value"]
           for r in out.take_all()}
    assert got[0] == 9.0 and got[100] == 9.0 and got[200] == 9.0


def test_ohlc_downsample_bars():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        ohlc_downsample,
    )

    # window 100us; key a window 0: ts 10,20,30 values 5,9,2 ->
    # open 5 high 9 low 2 close 2; window 100: single point
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"], pa.string()),
        "event_id": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "ts": pa.array([10, 20, 30, 120, 50], pa.int64()),
        "value": pa.array([5, 9, 2, 7, 1], pa.int64()),
    })
    out = {(r["k"], r["window_start"]):
           (r["open"], r["high"], r["low"], r["close"], r["n"])
           for r in ohlc_downsample(
               rd.from_arrow(t), ["k"], ts_col="ts",
               tie_cols=["event_id"], window_us=100).take_all()}
    assert out[("a", 0)] == (5, 9, 2, 2, 3)
    assert out[("a", 100)] == (7, 7, 7, 7, 1)
    assert out[("b", 0)] == (1, 1, 1, 1, 1)


def test_ohlc_tie_break_deterministic():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        ohlc_downsample,
    )

    # equal ts: open/close decided by the tie column
    t = pa.table({
        "k": pa.array(["a", "a"], pa.string()),
        "event_id": pa.array([2, 1], pa.int64()),
        "ts": pa.array([10, 10], pa.int64()),
        "value": pa.array([100, 7], pa.int64()),
    })
    r = ohlc_downsample(rd.from_arrow(t), ["k"], ts_col="ts",
                        tie_cols=["event_id"],
                        window_us=100).take_all()[0]
    assert (r["open"], r["close"]) == (7, 100)


def test_seasonal_residuals_same_bucket_last_period():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        seasonal_residuals,
    )

    # bucket=10, period=30 (lag 3 buckets): bucket 0 sum 5 -> baseline
    # for bucket 3 (sum 9, residual 4); bucket 4 has no bucket-1 ->
    # null; other key isolated
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"], pa.string()),
        "ts": pa.array([1, 5, 31, 35, 1], pa.int64()),
        "v": pa.array([2, 3, 9, 0, 7], pa.int64()),
    })
    out = {(r["k"], r["bucket"]): (r["baseline"], r["residual"])
           for r in seasonal_residuals(
               rd.from_arrow(t), ["k"], value_col="v",
               period_us=30, bucket_us=10).take_all()}
    assert out[("a", 0)] == (None, None)
    assert out[("a", 3)] == (5, 4)
    assert out[("b", 0)] == (None, None)


def test_seasonal_residuals_validation():
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        seasonal_residuals,
    )

    with pytest.raises(ValueError, match="multiple"):
        seasonal_residuals(None, ["k"], period_us=25, bucket_us=10)


def test_time_weighted_average_step_integral():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        time_weighted_average,
    )

    # window 100: key a samples (ts,v) = (0,10),(60,40),(80,100):
    # integral 10*60 + 40*20 = 1400 over span 80 -> 17.5; single-sample
    # window -> null twa
    t = pa.table({
        "k": pa.array(["a"] * 3 + ["a"], pa.string()),
        "ts": pa.array([0, 60, 80, 150], pa.int64()),
        "v": pa.array([10, 40, 100, 5], pa.int64()),
    })
    out = {r["window_start"]: r for r in time_weighted_average(
        rd.from_arrow(t), ["k"], value_col="v", window_us=100).take_all()}
    assert out[0]["twa"] == 1400.0 / 80.0
    assert out[0]["span_us"] == 80 and out[0]["n"] == 3
    assert out[100]["twa"] is None or out[100]["twa"] != out[100]["twa"]
    # burst robustness: arithmetic mean of (10,40,100) is 50, TWA 17.5
    assert out[0]["twa"] < 50


def test_lag_align_pairs_and_acf():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
        lag_align,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.robust import (
        grouped_pearson,
    )

    # bucket=10: key a sums per bucket: b0=3, b1=6, b2=9, b4=1 (gap b3)
    t = pa.table({
        "k": pa.array(["a"] * 5, pa.string()),
        "ts": pa.array([1, 11, 15, 21, 41], pa.int64()),
        "v": pa.array([3, 2, 4, 9, 1], pa.int64()),
    })
    pairs = {r["bucket"]: (r["v"], r["v_lag"]) for r in lag_align(
        rd.from_arrow(t), ["k"], value_col="v", lag_buckets=1,
        bucket_us=10).take_all()}
    # b1 pairs with b0, b2 with b1; b4 has no b3 -> absent
    assert pairs == {1: (6, 3), 2: (9, 6)}
    # ACF over a perfectly linear series = 1
    t2 = pa.table({"k": pa.array(["z"] * 6),
                   "ts": pa.array([0, 10, 20, 30, 40, 50], pa.int64()),
                   "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    aligned = lag_align(rd.from_arrow(t2), ["k"], value_col="v",
                        lag_buckets=1, bucket_us=10)
    r = grouped_pearson(aligned, ["k"], "v", "v_lag").take_all()[0]["r"]
    assert abs(r - 1.0) < 1e-12
