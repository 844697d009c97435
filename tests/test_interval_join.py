import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.join import (
    interval_overlap_join,
)


def _ds(rows, cols=("k", "id", "s", "e")):
    arrs = {c: pa.array([r[i] for r in rows],
                        pa.string() if c == "k" else pa.int64())
            for i, c in enumerate(cols)}
    return rd.from_arrow(pa.table(arrs))


def _pairs(out):
    return sorted((r["id_a"], r["id_b"]) for r in out.take_all())


def _brute(L, R):
    return sorted((l[1], r[1]) for l in L for r in R
                  if l[0] == r[0] and l[2] < r[3] and r[2] < l[3])


def test_overlap_join_matches_brute_force():
    L = [("u", 1, 0, 50), ("u", 2, 100, 250), ("u", 3, 240, 260),
         ("v", 4, 0, 1000)]
    R = [("u", 10, 40, 120), ("u", 11, 255, 300), ("u", 12, 50, 60),
         ("v", 13, 999, 1001), ("w", 14, 0, 10)]
    out = interval_overlap_join(_ds(L), _ds(R), key_cols=["k"],
                                bucket_us=64)
    assert _pairs(out) == _brute(L, R)


def test_overlap_join_dedups_multi_bucket_pairs():
    # one long x one long interval covering many shared buckets: the
    # canonical-bucket rule must emit the pair EXACTLY once
    L = [("u", 1, 0, 1000)]
    R = [("u", 2, 10, 900)]
    out = interval_overlap_join(_ds(L), _ds(R), key_cols=["k"],
                                bucket_us=16)
    assert _pairs(out) == [(1, 2)]


def test_overlap_join_half_open_and_grid_edges():
    # touching intervals [0,100) and [100,200) do NOT overlap; an end
    # exactly on a grid line does not replicate into the next bucket
    L = [("u", 1, 0, 100)]
    R = [("u", 2, 100, 200), ("u", 3, 99, 101)]
    out = interval_overlap_join(_ds(L), _ds(R), key_cols=["k"],
                                bucket_us=100)
    assert _pairs(out) == [(1, 3)]


def test_overlap_join_span_guard():
    import pytest

    L = [("u", 1, 0, 10_000_000)]
    with pytest.raises(Exception, match="max_span_buckets"):
        interval_overlap_join(_ds(L), _ds(L), key_cols=["k"],
                              bucket_us=10,
                              max_span_buckets=100).take_all()
