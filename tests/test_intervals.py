import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.intervals import (
    distinct_until_changed,
    merge_intervals,
    sequence_gaps,
)


def _iv(rows):
    return pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                     "start": pa.array([r[1] for r in rows], pa.int64()),
                     "end": pa.array([r[2] for r in rows], pa.int64())})


def _merge(rows, **kw):
    out = merge_intervals(rd.from_arrow(_iv(rows)), ["k"], n_buckets=4,
                          **kw)
    return sorted((r["k"], r["start"], r["end"], r["n_merged"])
                  for r in out.take_all())


def test_merge_overlap_touch_and_contained():
    got = _merge([(1, 0, 10), (1, 5, 20),    # overlap
                  (1, 20, 30),               # touching (min_gap=0)
                  (1, 40, 50), (1, 42, 44),  # contained
                  (1, 60, 70)])
    assert got == [(1, 0, 30, 3), (1, 40, 50, 2), (1, 60, 70, 1)]


def test_merge_min_gap_bridges_small_holes():
    got = _merge([(1, 0, 10), (1, 13, 20)], min_gap=5)
    assert got == [(1, 0, 20, 2)]
    got0 = _merge([(1, 0, 10), (1, 13, 20)])
    assert got0 == [(1, 0, 10, 1), (1, 13, 20, 1)]


def test_merge_keys_isolated_and_running_max():
    # the running-max matters: (0,100) covers (5,10); (20,30) is inside
    got = _merge([(1, 0, 100), (1, 5, 10), (1, 20, 30),
                  (2, 5, 10), (2, 20, 30)])
    assert got == [(1, 0, 100, 3), (2, 5, 10, 1), (2, 20, 30, 1)]


def test_sequence_gaps_threshold_and_duplicates():
    t = pa.table({"k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                  "ts": pa.array([0, 10, 10, 100, 0, 3], pa.int64())})
    out = sequence_gaps(rd.from_arrow(t), ["k"], min_gap=20, n_buckets=4)
    got = sorted((r["k"], r["gap_start"], r["gap_end"], r["gap"])
                 for r in out.take_all())
    assert got == [(1, 10, 100, 90)]
    out2 = sequence_gaps(rd.from_arrow(t), ["k"], min_gap=2, n_buckets=4)
    got2 = sorted((r["k"], r["gap_start"], r["gap_end"])
                  for r in out2.take_all())
    assert got2 == [(1, 0, 10), (1, 10, 100), (2, 0, 3)]


def test_distinct_until_changed_null_aware():
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 5, 1], pa.int64()),
        "state": pa.array(["up", "up", None, None, "up", "up"],
                          pa.string()),
    })
    out = distinct_until_changed(rd.from_arrow(t), ["k"], "o", ["state"],
                                 n_buckets=4)
    got = sorted((r["k"], r["o"], r["state"]) for r in out.take_all())
    # kept: k1 first, up->null at o=3, null->up at o=5, k2 first
    assert got == [(1, 1, "up"), (1, 3, None), (1, 5, "up"),
                   (2, 1, "up")]


def test_distinct_until_changed_multi_column():
    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "o": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([1, 1, 1], pa.int64()),
        "b": pa.array([5, 5, 6], pa.int64()),
    })
    out = distinct_until_changed(rd.from_arrow(t), ["k"], "o", ["a", "b"],
                                 n_buckets=2)
    assert sorted(r["o"] for r in out.take_all()) == [1, 3]


def test_out_of_order_depth_basics():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.intervals import (
        out_of_order_depth,
    )

    # arrival order 1..5; event times: 100, 50 (late by 50), 200,
    # 150 (late by 50), 300
    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"], pa.string()),
        "event_id": pa.array([1, 2, 3, 4, 5, 1], pa.int64()),
        "ts": pa.array([100, 50, 200, 150, 300, 10], pa.int64()),
    })
    out = {(r["k"], r["event_id"]): (r["depth_us"], r["late"])
           for r in out_of_order_depth(
               rd.from_arrow(t), ["k"], ts_col="ts").take_all()}
    assert out[("a", 1)] == (0, False)   # first arrival
    assert out[("a", 2)] == (50, True)   # behind hwm=100
    assert out[("a", 3)] == (0, False)   # new hwm
    assert out[("a", 4)] == (50, True)   # behind hwm=200
    assert out[("a", 5)] == (0, False)
    assert out[("b", 1)] == (0, False)   # per-key isolation
