import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.state import (
    DbStorage,
    incremental_dedup,
)


def _ds(pairs):
    return rd.from_arrow(pa.table({
        "k": pa.array([p[0] for p in pairs], pa.string()),
        "v": pa.array([p[1] for p in pairs], pa.int64())}))


def test_cross_run_drop_and_persist(tmp_path):
    p = str(tmp_path / "seen.sqlite")
    with DbStorage(p) as st:
        r1 = incremental_dedup(_ds([("a", 1), ("b", 2), ("a", 3)]),
                               st, ["k"])
        # within-run dups NOT collapsed; nothing previously seen
        assert sorted(x["v"] for x in r1.take_all()) == [1, 2, 3]
        r2 = incremental_dedup(_ds([("a", 4), ("c", 5)]), st, ["k"])
        assert sorted(x["v"] for x in r2.take_all()) == [5]
    # store survives reopen (the restart contract)
    with DbStorage(p) as st:
        r3 = incremental_dedup(_ds([("c", 6), ("d", 7)]), st, ["k"])
        assert sorted(x["v"] for x in r3.take_all()) == [7]


def test_multi_column_keys_and_guard(tmp_path):
    import pytest

    with DbStorage(str(tmp_path / "s.sqlite")) as st:
        ds = rd.from_arrow(pa.table({
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([10, 11, 12], pa.int64())}))
        out = incremental_dedup(ds, st, ["a", "b"])
        assert out.count() == 3
        # (x,1) now seen; (x,2)/(y,1) too
        ds2 = rd.from_arrow(pa.table({
            "a": pa.array(["x", "y"], pa.string()),
            "b": pa.array([1, 9], pa.int64()),
            "v": pa.array([13, 14], pa.int64())}))
        out2 = incremental_dedup(ds2, st, ["a", "b"])
        assert [r["v"] for r in out2.take_all()] == [14]
        with pytest.raises(ValueError, match="max_store_hashes"):
            incremental_dedup(_ds([("q", 1)]).rename_columns(
                {"k": "a", "v": "b"}).map_batches(
                    lambda t: t.append_column(
                        "v", pa.array([0] * t.num_rows, pa.int64())),
                    batch_format="pyarrow"),
                st, ["a", "b"], max_store_hashes=2)


def test_empty_run_keeps_store(tmp_path):
    with DbStorage(str(tmp_path / "s.sqlite")) as st:
        incremental_dedup(_ds([("a", 1)]), st, ["k"])
        out = incremental_dedup(_ds([]), st, ["k"])
        assert out.count() == 0
        # a subsequent run still remembers 'a'
        out2 = incremental_dedup(_ds([("a", 2), ("b", 3)]), st, ["k"])
        assert [r["v"] for r in out2.take_all()] == [3]
