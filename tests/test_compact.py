import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from open_telemetry_opentelemetry_collector_contrib_ray.stages.compact import (
    compact_parquet,
    plan_bins,
)

TMP = "/tmp/graft_compact_test"


def _mk_files(n, rows_each=100):
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(f"{TMP}/in")
    for i in range(n):
        t = pa.table({"id": pa.array(
            range(i * rows_each, (i + 1) * rows_each), pa.int64())})
        pq.write_table(t, f"{TMP}/in/f{i:03d}.parquet")
    return f"{TMP}/in", f"{TMP}/out"


def test_plan_bins_greedy_and_oversized():
    bins = plan_bins([("a", 10), ("b", 10), ("c", 10), ("d", 25)], 25)
    assert bins == [["a", "b"], ["c"], ["d"]]
    assert plan_bins([("a", 5), ("b", 5), ("c", 5)], 25) == \
        [["a", "b", "c"]]
    # single oversized file gets its own bin, never split
    assert plan_bins([("x", 100)], 10) == [["x"]]


def test_compact_preserves_rows_and_reduces_files():
    ind, outd = _mk_files(12)
    size = os.path.getsize(f"{ind}/f000.parquet")
    stats = compact_parquet(ind, outd, target_bytes=size * 4 + 1,
                            compression="snappy").take_all()
    outs = sorted(os.listdir(outd))
    assert 1 < len(outs) < 12
    total = sum(pq.read_table(f"{outd}/{f}").num_rows for f in outs)
    assert total == 12 * 100
    assert sum(r["rows"] for r in stats) == 12 * 100
    assert sum(r["n_files_in"] for r in stats) == 12
    # all ids survive exactly once
    ids = sorted(sum((pq.read_table(f"{outd}/{f}").column("id").to_pylist()
                      for f in outs), []))
    assert ids == list(range(1200))


def test_compact_resume_skips_existing():
    ind, outd = _mk_files(6)
    size = os.path.getsize(f"{ind}/f000.parquet")
    compact_parquet(ind, outd, target_bytes=size * 3 + 1).take_all()
    n0 = len(os.listdir(outd))
    stats = compact_parquet(ind, outd, target_bytes=size * 3 + 1,
                            skip_existing=True).take_all()
    assert all(r["skipped"] == 1 for r in stats)
    assert len(os.listdir(outd)) == n0
