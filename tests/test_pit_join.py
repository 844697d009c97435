import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.cdc import (
    point_in_time_join,
    scd2_history,
)


def _dims(rows):
    # rows: (k, bal, valid_from, valid_to)
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "bal": pa.array([r[1] for r in rows], pa.int64()),
        "valid_from": pa.array([r[2] for r in rows], pa.int64()),
        "valid_to": pa.array([r[3] for r in rows], pa.float64()),
    })


def _facts(rows):
    # rows: (fact_id, k, ts)
    return pa.table({
        "fact_id": pa.array([r[0] for r in rows], pa.int64()),
        "k": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
    })


def _run(facts, dims):
    out = point_in_time_join(rd.from_arrow(facts), rd.from_arrow(dims),
                             keys=["k"], ts_col="ts", payload=["bal"],
                             n_buckets=4)
    rows = sorted(out.take_all(), key=lambda r: r["fact_id"])
    return [(r["bal"], r["valid_from"]) for r in rows]


def test_basic_interval_semantics():
    dims = _dims([(1, 100, 10, 20.0), (1, 200, 20, None)])
    facts = _facts([(0, 1, 9),    # before first version -> null
                    (1, 1, 10),   # inclusive start of v1
                    (2, 1, 19),   # still v1
                    (3, 1, 20),   # exclusive end -> v2
                    (4, 1, 999)])  # open current version
    assert _run(facts, dims) == [(None, None), (100, 10), (100, 10),
                                 (200, 20), (200, 20)]


def test_gap_after_close_and_missing_key():
    # version closed at 30 with no successor (delete) -> gap after 30
    dims = _dims([(5, 50, 10, 30.0)])
    facts = _facts([(0, 5, 29), (1, 5, 30), (2, 5, 31), (3, 6, 15)])
    assert _run(facts, dims) == [(50, 10), (None, None), (None, None),
                                 (None, None)]


def test_composed_with_scd2_history():
    ch = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "seq": pa.array([10, 20, 30, 5], pa.int64()),
        "bal": pa.array([100, 200, 0, 7], pa.int64()),
        "op": pa.array(["U", "U", "D", "U"], pa.string()),
    })
    hist = scd2_history(rd.from_arrow(ch), keys=["k"], seq_col="seq",
                        payload=["bal"], n_buckets=2)
    facts = _facts([(0, 1, 15), (1, 1, 25), (2, 1, 35), (3, 2, 100)])
    out = point_in_time_join(rd.from_arrow(facts.combine_chunks()),
                             hist, keys=["k"], ts_col="ts",
                             payload=["bal"], n_buckets=2)
    rows = sorted(out.take_all(), key=lambda r: r["fact_id"])
    got = [(r["bal"], r["valid_from"]) for r in rows]
    # 35 falls after the delete closed [20,30) -> null
    assert got == [(100, 10), (200, 20), (None, None), (7, 5)]


def test_string_payload_and_fact_columns_survive():
    dims = pa.table({
        "k": pa.array([1], pa.int64()),
        "name": pa.array(["alpha"], pa.string()),
        "valid_from": pa.array([0], pa.int64()),
        "valid_to": pa.array([None], pa.float64()),
    })
    facts = pa.table({
        "fact_id": pa.array([1, 2], pa.int64()),
        "k": pa.array([1, 9], pa.int64()),
        "ts": pa.array([5, 5], pa.int64()),
        "note": pa.array(["a", "b"], pa.string()),
    })
    out = point_in_time_join(rd.from_arrow(facts), rd.from_arrow(dims),
                             keys=["k"], ts_col="ts", payload=["name"],
                             n_buckets=2)
    rows = sorted(out.take_all(), key=lambda r: r["fact_id"])
    assert [r["note"] for r in rows] == ["a", "b"]
    assert [r["name"] for r in rows] == ["alpha", None]
    assert [r["ts"] for r in rows] == [5, 5]
