import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
    ThetaSketch,
    _splitmix64,
    theta_sketch,
)


def _h(lo, hi):
    return _splitmix64(np.arange(lo, hi, dtype=np.uint64))


def test_exact_below_k():
    sk = ThetaSketch(256).add_hashes(_h(0, 100))
    assert sk.theta == 1.0 and sk.estimate() == 100.0
    # duplicates don't inflate
    sk.add_hashes(_h(0, 100))
    assert sk.estimate() == 100.0


def test_estimate_within_rse_bound():
    for n in (5_000, 50_000):
        sk = ThetaSketch(1024).add_hashes(_h(0, n))
        assert abs(sk.estimate() - n) <= 4 / np.sqrt(1024) * n


def test_merge_tree_invariance():
    parts = [ThetaSketch(256).add_hashes(_h(i * 1000, (i + 1) * 1000))
             for i in range(8)]
    left = ThetaSketch(256)
    for p in parts:
        left.merge(p)
    pair = parts[0].union(parts[1])
    for p in parts[2:]:
        pair = pair.union(p)
    assert np.array_equal(left.hashes, pair.hashes)


def test_union_and_intersection():
    a = ThetaSketch(1024).add_hashes(_h(0, 10_000))
    b = ThetaSketch(1024).add_hashes(_h(5_000, 15_000))
    u = a.union(b).estimate()
    i = a.intersect_estimate(b)
    assert abs(u - 15_000) <= 0.2 * 15_000
    assert abs(i - 5_000) <= 0.3 * 5_000


def test_disjoint_intersection_is_zero():
    a = ThetaSketch(256).add_hashes(_h(0, 10_000))
    b = ThetaSketch(256).add_hashes(_h(100_000, 110_000))
    assert a.intersect_estimate(b) == 0.0


def test_roundtrip_and_distributed_build():
    a = ThetaSketch(128).add_hashes(_h(0, 3000))
    back = ThetaSketch.from_bytes(a.to_bytes(), 128)
    assert np.array_equal(a.hashes, back.hashes)
    ds = rd.from_arrow(pa.table({
        "x": pa.array(np.arange(3000, dtype=np.int64) % 1000)}))
    sk = theta_sketch(ds, "x", k=2048)  # 1000 distinct < k -> exact
    assert sk.estimate() == 1000.0
