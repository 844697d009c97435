import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
    counter_increase,
)


def _ds(rows):
    k, ts, v = zip(*rows)
    return rd.from_arrow(pa.table({
        "k": pa.array(k, pa.string()),
        "ts": pa.array(ts, pa.int64()),
        "v": pa.array(v, pa.int64())}))


def test_reset_detection_and_rate():
    # a: 5 ->8 (+3), reset to 2 (+2), ->4 (+2), reset to 1 (+1) = 8
    rows = [("a", 0, 5), ("a", 10, 8), ("a", 20, 2), ("a", 30, 4),
            ("a", 40, 1), ("b", 0, 7), ("b", 50, 9)]
    out = {r["k"]: r for r in counter_increase(
        _ds(rows), ["k"], "v", ts_col="ts").take_all()}
    assert out["a"]["increase"] == 8 and out["a"]["span_us"] == 40
    assert out["a"]["rate"] == 8 * 1_000_000.0 / 40
    assert out["b"]["increase"] == 2
    assert out["a"]["n_points"] == 5


def test_single_point_null_rate():
    out = counter_increase(_ds([("a", 5, 100)]), ["k"], "v").take_all()
    assert out[0]["increase"] == 0 and out[0]["span_us"] == 0
    assert out[0]["rate"] is None or np.isnan(out[0]["rate"])


def test_windowed_boundaries_isolate():
    # window 100: first point of each window contributes nothing
    rows = [("a", 0, 1), ("a", 50, 4), ("a", 100, 10), ("a", 150, 12)]
    out = {r["window_start"]: r["increase"] for r in counter_increase(
        _ds(rows), ["k"], "v", window_us=100).take_all()}
    assert out == {0: 3, 100: 2}


def test_plain_diff_vs_reset_semantics():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        cumulative_to_delta,
    )

    rows = [("a", 0, 10), ("a", 10, 3)]
    # cumulative_to_delta surfaces the negative delta; counter_increase
    # treats it as a reset
    ctd = cumulative_to_delta(_ds(rows), ["k"], "v", order_col="ts") \
        .to_pandas().sort_values("ts")
    assert list(ctd["delta"].fillna(0)) == [0, -7]
    ci = counter_increase(_ds(rows), ["k"], "v").take_all()[0]
    assert ci["increase"] == 3
