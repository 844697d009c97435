import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.sort import (
    global_sort_ranks,
    range_partition_ids,
    sample_splits,
)


def _ranked(tbl, **kw):
    out = global_sort_ranks(rd.from_arrow(tbl), "v", tiebreak=["id"],
                            n_buckets=4, **kw)
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    return [r["rank"] for r in rows]


def _expect(vals, ids):
    order = sorted(range(len(vals)), key=lambda i: (vals[i], ids[i]))
    rank = [0] * len(vals)
    for r, i in enumerate(order):
        rank[i] = r
    return rank


def test_global_rank_matches_argsort():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, 400).tolist()  # heavy ties
    ids = list(range(400))
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    # several blocks so partitions genuinely span blocks
    ds_tbls = [tbl.slice(i * 80, 80) for i in range(5)]
    ds = rd.from_arrow(ds_tbls)
    out = global_sort_ranks(ds, "v", tiebreak=["id"], n_parts=8,
                            n_buckets=4)
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    assert [r["rank"] for r in rows] == _expect(vals, ids)


def test_equal_keys_never_straddle_partitions():
    splits = np.array([5, 5, 9], dtype=np.int64)
    ids = range_partition_ids(np.array([4, 5, 5, 6, 9, 10]), splits)
    # all 5s identical partition; 9 goes right of the 9-split
    assert ids[1] == ids[2]
    assert list(ids) == [0, 2, 2, 2, 3, 3]


def test_single_partition_and_constant_column():
    tbl = pa.table({"id": pa.array([3, 1, 2], pa.int64()),
                    "v": pa.array([7, 7, 7], pa.int64())})
    # _ranked returns ranks in id order: ties broken by id -> id1 rank0
    assert _ranked(tbl, n_parts=4) == [0, 1, 2]
    assert _ranked(tbl, n_parts=1) == [0, 1, 2]


def test_sample_splits_are_sorted_unique_and_bounded():
    tbl = pa.table({"v": pa.array(list(range(1000)) * 2, pa.int64())})
    sp = sample_splits(rd.from_arrow(tbl), "v", n_parts=8)
    assert len(sp) <= 7
    assert np.all(np.diff(sp) > 0)
    # splits must come from observed values
    assert all(0 <= s < 1000 for s in sp)


def test_rank_is_dense_and_complete():
    rng = np.random.default_rng(11)
    vals = rng.integers(-100, 100, 257).tolist()
    tbl = pa.table({"id": pa.array(range(257), pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    ranks = _ranked(tbl, n_parts=6)
    assert sorted(ranks) == list(range(257))


def test_sample_pool_cap_decimation_path():
    # force the decimation branch with a tiny synthetic pool cap by
    # many blocks; ranks must still be exact (splits are approximate,
    # ranks never are)
    rng = np.random.default_rng(21)
    vals = rng.integers(0, 10_000, 600).tolist()
    tbl = pa.table({"id": pa.array(range(600), pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow([tbl.slice(i * 30, 30) for i in range(20)])
    out = global_sort_ranks(ds, "v", tiebreak=["id"], n_parts=7,
                            n_buckets=4)
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    assert [r["rank"] for r in rows] == _expect(vals, [*range(600)])
