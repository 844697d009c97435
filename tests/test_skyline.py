import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.skyline import (
    skyline,
    skyline_mask,
)


def _brute_skyline(X):
    n = len(X)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (X[j] >= X[i]).all() and (X[j] > X[i]).any():
                keep[i] = False
                break
    return keep


def test_mask_matches_brute_force_random():
    rng = np.random.RandomState(7)
    X = rng.randint(0, 12, size=(300, 3)).astype(np.float64)
    got = skyline_mask(X, chunk=32)  # force multi-chunk archive path
    assert (got == _brute_skyline(X)).all()


def test_mask_keeps_exact_duplicates():
    X = np.array([[5.0, 5.0], [5.0, 5.0], [4.0, 6.0], [4.0, 4.0]])
    got = skyline_mask(X)
    assert got.tolist() == [True, True, True, False]


def test_mask_anti_correlated_keeps_all():
    # strictly decreasing second dim as first rises: nothing dominated
    X = np.column_stack([np.arange(50.0), -np.arange(50.0)])
    assert skyline_mask(X, chunk=8).all()


def test_skyline_dataset_directions_and_merge():
    t = pa.table({
        "id": pa.array(list(range(6)), pa.int64()),
        "size": pa.array([10, 10, 8, 12, 12, 1], pa.int64()),
        "price": pa.array([5.0, 4.0, 1.0, 9.0, 9.0, 0.5], pa.float64()),
    })
    # maximize size, minimize price.  (10,5) dominated by (10,4);
    # (12,9) twins both kept; (8,1) and (1,0.5) on the frontier.
    ds = rd.from_arrow(t).repartition(3)  # force the two-phase merge
    out = skyline(ds, ["size", "price"], ["max", "min"])
    ids = sorted(r["id"] for r in out.take_all())
    assert ids == [1, 2, 3, 4, 5]


def test_skyline_max_candidates_guard():
    import pytest

    t = pa.table({
        "a": pa.array(list(range(100)), pa.int64()),
        "b": pa.array(list(range(100, 0, -1)), pa.int64()),
    })
    ds = rd.from_arrow(t)
    # the guard now fires from candidate-count metadata BEFORE the
    # repartition(1) gather, i.e. eagerly inside skyline() itself
    with pytest.raises(ValueError, match="max_candidates"):
        skyline(ds, ["a", "b"], ["max", "max"], max_candidates=10)


def test_mask_archive_tiling_anti_correlated():
    # archive grows to ~n while chunk=16: forces many archive tiles and
    # the early-break path; anti-correlated input keeps every row
    n = 300
    X = np.column_stack([np.arange(float(n)), -np.arange(float(n))])
    assert skyline_mask(X, chunk=16).all()
    # and a dominated tail dies across tile boundaries
    Y = np.vstack([X, X - 1.0])
    got = skyline_mask(Y, chunk=16)
    assert got[:n].all() and not got[n:].any()


def test_skyline_validates_args():
    import pytest

    with pytest.raises(ValueError):
        skyline(None, ["a"], ["max", "min"])
    # bad direction surfaces from inside the Ray task wrapped in
    # RayTaskError, so match the broad exception type
    with pytest.raises(Exception, match="direction"):
        skyline(rd.from_arrow(pa.table({
            "a": pa.array([1], pa.int64())})), ["a"], ["up"]).take_all()
