import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.profile import (
    profile_table)


def _profile(t, **kw):
    out = profile_table(rd.from_arrow(t), **kw).to_pandas()
    return out.set_index("col").sort_index()


def test_profile_counts_nulls_ranges_lengths():
    t = pa.table({
        "i": pa.array([3, None, 7, 7], pa.int64()),
        "s": pa.array(["ab", "c", None, "de"], pa.string()),
        "f": pa.array([1.5, 1.5, None, 2.0], pa.float64())})
    p = _profile(t)
    assert p.loc["i", "n"] == 4 and p.loc["i", "n_null"] == 1
    assert p.loc["i", "min_i"] == 3 and p.loc["i", "max_i"] == 7
    assert p.loc["i", "n_distinct"] == 2
    assert p.loc["s", "sum_len"] == 5
    assert p.loc["s", "n_distinct"] == 3
    assert p.loc["f", "n_distinct"] == 2
    # non-int columns have no range, non-string no length
    assert pa.compute.is_null(pa.scalar(p.loc["s", "min_i"])).as_py() or \
        p.isna().loc["s", "min_i"]
    assert p.isna().loc["i", "sum_len"]


def test_profile_distinct_exact_across_blocks():
    # the same values recur in every block: exact distinct must dedup
    # globally, not per block
    t = pa.table({"x": pa.array(list(range(10)) * 40, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    out = profile_table(ds).to_pandas()
    assert int(out["n_distinct"][0]) == 10
    assert int(out["n"][0]) == 400


def test_profile_column_subset_and_order():
    t = pa.table({"a": [1], "b": ["x"], "c": [2.0]})
    p = profile_table(rd.from_arrow(t), columns=["c", "a"]).to_pandas()
    assert sorted(p["col"]) == ["a", "c"]
    assert list(p.columns) == ["col", "n", "n_null", "n_distinct",
                               "min_i", "max_i", "sum_len"]


def test_profile_approx_distinct_within_rse():
    t = pa.table({"x": pa.array(range(5000), pa.int64())})
    p = _profile(t, distinct="approx")
    nd = int(p.loc["x", "n_distinct"])
    assert abs(nd - 5000) <= 0.05 * 5000  # p=12 -> ~1.6% rse, 3 sigma


def test_profile_unknown_mode_raises():
    with pytest.raises(ValueError):
        profile_table(rd.from_arrow(pa.table({"x": [1]})),
                      distinct="magic")
