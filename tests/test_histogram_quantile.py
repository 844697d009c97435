import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.metrics import (
    histogram_quantile,
)


def _hist(rows):
    k, le, n = zip(*rows)
    return rd.from_arrow(pa.table({
        "k": pa.array(k, pa.string()),
        "le": pa.array(le, pa.string()),
        "n": pa.array(n, pa.int64())}))


def _promql_ref(buckets, q):
    # straight port of promql bucketQuantile for the test oracle
    cum = np.cumsum([c for _, c in buckets]).astype(float)
    ubs = [u for u, _ in buckets]
    total = cum[-1]
    rank = q * total
    b = next(i for i, c in enumerate(cum) if c >= rank)
    if b == len(buckets) - 1 and np.isinf(ubs[-1]):
        return ubs[-2]
    start = ubs[b - 1] if b > 0 else 0.0
    cprev = cum[b - 1] if b > 0 else 0.0
    cnt = cum[b] - cprev
    return start + (ubs[b] - start) * ((rank - cprev) / cnt)


def test_matches_promql_reference_dense():
    buckets = [(100.0, 30), (500.0, 50), (1000.0, 15), (np.inf, 5)]
    ds = _hist([("a", "100.0", 30), ("a", "500.0", 50),
                ("a", "1000.0", 15), ("a", "inf", 5)])
    out = histogram_quantile(ds, [0.5, 0.9, 0.99], ["k"]).to_pandas()
    for q in (0.5, 0.9, 0.99):
        got = float(out[(out["q"] == q)]["value"].iloc[0])
        assert got == _promql_ref(buckets, q), q


def test_inf_bucket_returns_highest_finite_bound():
    ds = _hist([("a", "100.0", 1), ("a", "inf", 99)])
    out = histogram_quantile(ds, [0.9], ["k"]).to_pandas()
    assert float(out["value"].iloc[0]) == 100.0


def test_densification_matches_full_edge_math():
    # sparse histogram (empty 500 bucket absent): with edges supplied,
    # interpolation start is the true previous BOUND (500), not the
    # previous present bound (100)
    ds = _hist([("a", "100.0", 50), ("a", "1000.0", 50)])
    sparse = histogram_quantile(ds, [0.75], ["k"]).to_pandas()
    dense = histogram_quantile(ds, [0.75], ["k"],
                               edges=[100, 500, 1000, 5000]).to_pandas()
    # sparse: start=100, width 900 -> 100 + 900*0.5 = 550
    assert float(sparse["value"].iloc[0]) == 550.0
    # dense (promql over full buckets): start=500 -> 500 + 500*0.5 = 750
    assert float(dense["value"].iloc[0]) == 750.0


def test_multiple_keys_vectorized():
    rows = [("a", "100.0", 10), ("a", "inf", 0),
            ("b", "100.0", 2), ("b", "500.0", 6), ("b", "inf", 2)]
    rows = [r for r in rows if r[2] > 0]
    out = histogram_quantile(_hist(rows), [0.5], ["k"]).to_pandas()
    out = out.set_index("k")["value"]
    assert float(out["a"]) == 50.0  # 0 + 100 * (5/10)
    assert float(out["b"]) == 100.0 + 400.0 * ((5.0 - 2.0) / 6.0)


def test_validates_q_range():
    import pytest

    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantile(None, [1.5], ["k"])
