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


def test_clamped_running_sum_floor_zero():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        clamped_running_sum,
    )

    # a: +5, -10 (clamps to 0), +3 -> [5, 0, 3]; sequential replay check
    rows = [("a", 1, 5), ("a", 2, -10), ("a", 3, 3),
            ("b", 1, -4), ("b", 2, 2)]
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "d": pa.array([r[2] for r in rows], pa.int64())})
    out = {(r["k"], r["ts"]): r["balance"] for r in clamped_running_sum(
        rd.from_arrow(t), ["k"], "d").take_all()}
    assert [out[("a", i)] for i in (1, 2, 3)] == [5, 0, 3]
    assert [out[("b", i)] for i in (1, 2)] == [0, 2]
    # randomized parity vs the sequential recurrence
    import numpy as np

    rng = np.random.RandomState(9)
    d = rng.randint(-5, 6, 200)
    t2 = pa.table({"k": pa.array(["z"] * 200),
                   "ts": pa.array(range(200), pa.int64()),
                   "d": pa.array(d, pa.int64())})
    got = [r["balance"] for r in clamped_running_sum(
        rd.from_arrow(t2), ["k"], "d").take_all()]
    b, exp = 0, []
    for x in d:
        b = max(b + int(x), 0)
        exp.append(b)
    assert got == exp
