import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.cdc import (
    cdc_merge,
)


def _merge(base, changes, **kw):
    out = cdc_merge(rd.from_arrow(base), rd.from_arrow(changes),
                    keys=["k"], seq_col="seq", n_buckets=4, **kw)
    return {r["k"]: r["v"] for r in out.take_all()}


def test_cdc_upsert_delete_insert_untouched():
    base = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array([10, 20, 30, 40], pa.int64())})
    changes = pa.table({
        "k": pa.array([1, 1, 2, 5, 5], pa.int64()),
        "v": pa.array([11, 12, 0, 50, 51], pa.int64()),
        "seq": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "op": pa.array(["U", "U", "D", "U", "U"], pa.string()),
    })
    got = _merge(base, changes)
    # k=1 latest upsert wins; k=2 deleted; k=3/4 untouched; k=5 inserted
    assert got == {1: 12, 3: 30, 4: 40, 5: 51}


def test_cdc_delete_then_reinsert():
    base = pa.table({"k": pa.array([7], pa.int64()),
                     "v": pa.array([70], pa.int64())})
    changes = pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "v": pa.array([0, 71], pa.int64()),
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["D", "U"], pa.string()),
    })
    assert _merge(base, changes) == {7: 71}
    # reversed sequence: the delete is latest and wins
    changes2 = pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "v": pa.array([71, 0], pa.int64()),
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["U", "D"], pa.string()),
    })
    assert _merge(base, changes2) == {}


def test_cdc_empty_changelog_keeps_base():
    base = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([10, 20], pa.int64())})
    changes = pa.table({"k": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64()),
                        "seq": pa.array([], pa.int64()),
                        "op": pa.array([], pa.string())})
    assert _merge(base, changes) == {1: 10, 2: 20}
