import numpy as np
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
    QDigest,
    qdigest_build,
)


def _within_bound(vals, d, q):
    # the eps-approximate-quantile guarantee: the returned value's rank
    # INTERVAL [count(< v), count(<= v)] must intersect qn +- eps*n —
    # rank_le alone overshoots by the atom mass on discrete heavy hitters
    sv = np.sort(vals)
    v = d.quantile(q)
    r_le = np.searchsorted(sv, v, side="right")
    r_lt = np.searchsorted(sv, v, side="left")
    t, e = np.ceil(q * len(vals)), d.eps * len(vals)
    return r_le >= t - e - 1 and r_lt <= t + e + 1


def test_qdigest_exact_when_uncompressed():
    # k > n  =>  threshold floor(n/k) = 0, nothing collapses: exact
    vals = np.arange(1000)
    d = QDigest(bits=10, k=100000).add_values(vals)
    for q in (0.1, 0.5, 0.9, 1.0):
        assert d.quantile(q) == int(np.ceil(q * 1000)) - 1


def test_qdigest_bound_uniform_and_skewed():
    rng = np.random.RandomState(3)
    for vals in (rng.randint(0, 1 << 14, 50000),
                 rng.zipf(1.3, 50000).clip(0, (1 << 14) - 1),
                 np.full(10000, 42)):
        d = QDigest(bits=14, k=256)
        for chunk in np.array_split(vals, 23):
            d.merge(QDigest(bits=14, k=256).add_values(chunk))
        assert len(d.ids) <= 4 * d.k * d.bits  # size stays sketched
        for q in (0.05, 0.5, 0.95):
            assert _within_bound(vals, d, q)


def test_qdigest_merge_any_tree_same_bound():
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 1 << 12, 30000)
    parts = [QDigest(bits=12, k=128).add_values(c)
             for c in np.array_split(vals, 8)]
    left = parts[0]
    for p in parts[1:]:
        left = left.merge(p)
    parts2 = [QDigest(bits=12, k=128).add_values(c)
              for c in np.array_split(vals, 8)]
    import functools
    mid = functools.reduce(
        lambda a, b: a.merge(b),
        [functools.reduce(lambda a, b: a.merge(b), parts2[i:i + 2])
         for i in range(0, 8, 2)])
    assert left.n == mid.n == len(vals)
    for d in (left, mid):
        for q in (0.25, 0.75):
            assert _within_bound(vals, d, q)


def test_qdigest_rejects_out_of_universe():
    with pytest.raises(ValueError):
        QDigest(bits=8, k=16).add_values(np.array([256]))
    with pytest.raises(ValueError):
        QDigest(bits=8, k=16).add_values(np.array([-1]))


def test_qdigest_build_over_dataset(sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    d = qdigest_build(ds, "value", bits=16, k=512, scale=100.0)
    vals = np.floor(np.array([r["value"] for r in ds.take_all()])
                    * 100.0).astype(np.int64)
    assert d.n == len(vals)
    for q in (0.5, 0.95):
        assert _within_bound(vals, d, q)
