import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.resample import (
    ewma_smooth,
)


def _run(keys, ts, vals, **kw):
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "v": pa.array(vals, pa.int64()),
    })
    out = ewma_smooth(rd.from_arrow(t), by="k", value_col="v",
                      n_buckets=4, **kw)
    rows = sorted(out.take_all(), key=lambda r: (r["k"], r["ts"]))
    return [(r["ewma_num"], r["ewma_den"], r["is_anom"]) for r in rows]


def test_ewma_weights_and_partial_history():
    # one series, H=2: weights lag1=2, lag2=1
    got = _run([1, 1, 1, 1], [0, 1, 2, 3], [10, 20, 30, 31], horizon=2)
    assert got[0] == (0, 0, False)                 # no history
    assert got[1] == (10 * 2, 2, 20 * 2 > 2 * 20)  # v*den > 2*num? 40>40 F
    assert got[2] == (20 * 2 + 10, 3, 30 * 3 > 2 * 50)  # 90 > 100 -> False
    assert got[3] == (30 * 2 + 20, 3, 31 * 3 > 2 * 80)  # 93 > 160 -> False


def test_ewma_anomaly_fires_on_spike():
    got = _run([1, 1, 1], [0, 1, 2], [10, 10, 100], horizon=4)
    assert got[2][2] is True or got[2][2] == True  # noqa: E712
    assert got[1][2] in (False, np.False_)


def test_series_isolated_and_order_by_ts():
    got = _run([2, 1, 1], [5, 1, 0], [7, 50, 10], horizon=8)
    # key=1 ordered by ts: 10 then 50 -> second row sees num=10*128,den=128
    assert got[0] == (0, 0, False)            # (1, ts=0)
    assert got[1] == (10 * 128, 128, 50 * 128 > 2 * 10 * 128)  # True
    assert got[2] == (0, 0, False)            # (2, ts=5) own series


def test_horizon_validation():
    with pytest.raises(ValueError):
        _run([1], [0], [1], horizon=0)
