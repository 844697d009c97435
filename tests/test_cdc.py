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


# ---- table_diff ----

from open_telemetry_opentelemetry_collector_contrib_ray.stages.cdc import (  # noqa: E402
    scd2_history, table_diff)


def _diff(left, right):
    out = table_diff(rd.from_arrow(left), rd.from_arrow(right),
                     keys=["k"], compare_cols=["c", "s"], n_buckets=4)
    return out.to_pandas().sort_values("k").reset_index(drop=True)


def test_table_diff_statuses_and_flags():
    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "c": pa.array([10, 20, 30, 40], pa.int64()),
                     "s": ["a", "b", "c", "d"]})
    right = pa.table({"k": pa.array([1, 2, 3, 5], pa.int64()),
                      "c": pa.array([10, 21, 30, 50], pa.int64()),
                      "s": ["a", "b", "z", "e"]})
    d = _diff(left, right)
    assert list(d["k"]) == [1, 2, 3, 4, 5]
    assert list(d["status"]) == ["same", "changed", "changed", "removed",
                                 "added"]
    assert list(d["chg_c"]) == [0, 1, 0, 0, 0]
    assert list(d["chg_s"]) == [0, 0, 1, 0, 0]


def test_table_diff_null_aware_compare():
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "c": pa.array([None, 5], pa.int64()),
                     "s": ["x", None]})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "c": pa.array([None, 5], pa.int64()),
                      "s": ["x", "now"]})
    d = _diff(left, right)
    # null == null is SAME (IS DISTINCT FROM semantics), null vs value
    # is a change
    assert list(d["status"]) == ["same", "changed"]
    assert list(d["chg_s"]) == [0, 1]


def test_table_diff_identical_snapshots_all_same():
    t = pa.table({"k": pa.array(range(50), pa.int64()),
                  "c": pa.array(range(50), pa.int64()),
                  "s": [f"v{i}" for i in range(50)]})
    d = _diff(t, t)
    assert set(d["status"]) == {"same"}
    assert int(d["chg_c"].sum()) == 0


# ---- scd2_history ----


def _hist(changes, **kw):
    out = scd2_history(rd.from_arrow(changes), keys=["k"], seq_col="seq",
                       payload=["v"], n_buckets=4, **kw)
    return out.to_pandas().sort_values(["k", "valid_from"]) \
        .reset_index(drop=True)


def test_scd2_versions_and_current_flag():
    ch = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                   "seq": pa.array([10, 20, 30, 5], pa.int64()),
                   "v": pa.array([100, 200, 300, 50], pa.int64()),
                   "op": ["U", "U", "U", "U"]})
    h = _hist(ch)
    assert list(h["valid_from"]) == [10, 20, 30, 5]
    assert list(h["valid_to"].fillna(-1)) == [20, 30, -1, -1]
    assert list(h["is_current"]) == [0, 0, 1, 1]


def test_scd2_trailing_delete_closes_last_version():
    ch = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "seq": pa.array([10, 20], pa.int64()),
                   "v": pa.array([100, 0], pa.int64()),
                   "op": ["U", "D"]})
    h = _hist(ch)
    # one version row, closed by the delete, and NO current row
    assert len(h) == 1
    assert list(h["valid_to"]) == [20]
    assert list(h["is_current"]) == [0]


def test_scd2_mid_history_delete_and_reinsert():
    ch = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "seq": pa.array([10, 20, 30], pa.int64()),
                   "v": pa.array([100, 0, 300], pa.int64()),
                   "op": ["U", "D", "U"]})
    h = _hist(ch)
    assert list(h["valid_from"]) == [10, 30]
    assert list(h["valid_to"].fillna(-1)) == [20, -1]
    assert list(h["is_current"]) == [0, 1]
