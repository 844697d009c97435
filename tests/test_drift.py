import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
    psi_drift,
)


def _run(vals_a, vals_b, edges):
    tbl = pa.table({
        "v": pa.array(list(vals_a) + list(vals_b), pa.float64()),
        "w": pa.array([0] * len(vals_a) + [1] * len(vals_b), pa.int64()),
    })
    ds = rd.from_arrow([tbl.slice(i * 3, 3)
                        for i in range((tbl.num_rows + 2) // 3)])
    return psi_drift(ds, "v", "w", edges)


def test_identical_distributions_near_zero_psi():
    vals = [1, 5, 5, 12, 20, 20, 30] * 3
    out = _run(vals, vals, [10, 25])
    total = sum(out.column("contrib").to_pylist())
    assert abs(total) < 1e-12
    assert out.num_rows == 3


def test_hand_computed_psi_with_smoothing():
    # base: 4 in bin0; cur: 4 in bin1; edges [10] -> 2 bins
    out = _run([1, 2, 3, 4], [11, 12, 13, 14], [10])
    p = np.array([(4 + 1) / 6, (0 + 1) / 6])
    q = np.array([(0 + 1) / 6, (4 + 1) / 6])
    exp = (p - q) * np.log(p / q)
    got = out.column("contrib").to_pylist()
    assert np.allclose(got, exp, atol=1e-12)
    assert out.column("c_base").to_pylist() == [4, 0]
    assert out.column("c_cur").to_pylist() == [0, 4]


def test_bin_edges_inclusive_right():
    # bin_id = number of edges <= v: v=10 with edge 10 -> bin 1
    out = _run([10.0], [9.999], [10])
    assert out.column("c_base").to_pylist() == [0, 1]
    assert out.column("c_cur").to_pylist() == [1, 0]


def test_bad_edges_raise():
    with pytest.raises(ValueError):
        _run([1], [1], [5, 5])


def test_benford_counts_and_expectations():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        benford_audit,
    )
    vals = [1, 19, 123, 2, 25, 3, 999, 0, -7]  # 0 and -7 excluded
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow([tbl.slice(i * 3, 3) for i in range(3)])
    out = benford_audit(ds, "v")
    c = out.column("c").to_pylist()
    assert c == [3, 2, 1, 0, 0, 0, 0, 0, 1]  # digits 1..9
    assert sum(c) == 7
    bp = out.column("benford_p").to_pylist()
    assert abs(bp[0] - math.log10(2)) < 1e-12
    assert abs(sum(bp) - 1.0) < 1e-12
    chi = out.column("chi2_contrib").to_pylist()
    exp1 = math.log10(2) * 7
    assert abs(chi[0] - (3 - exp1) ** 2 / exp1) < 1e-12


def test_two_proportion_ztest_hand_computed():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        two_proportion_ztest,
    )
    # arm0: 3/6 convert; arm1: 1/4 convert
    w = [0] * 6 + [1] * 4
    f = [1, 1, 1, 0, 0, 0, 1, 0, 0, 0]
    tbl = pa.table({"w": pa.array(w, pa.int64()),
                    "f": pa.array(f, pa.int64())})
    ds = rd.from_arrow([tbl.slice(i * 2, 2) for i in range(5)])
    out = two_proportion_ztest(ds, "w", "f")
    r = out.to_pylist()[0]
    assert (r["n0"], r["n1"], r["conv0"], r["conv1"]) == (6, 4, 3, 1)
    p = 4 / 10
    z = (0.5 - 0.25) / math.sqrt(p * (1 - p) * (1 / 6 + 1 / 4))
    assert abs(r["z"] - z) < 1e-12


def test_two_proportion_ztest_degenerate_null():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        two_proportion_ztest,
    )
    tbl = pa.table({"w": pa.array([0, 1], pa.int64()),
                    "f": pa.array([0, 0], pa.int64())})
    out = two_proportion_ztest(rd.from_arrow(tbl), "w", "f")
    assert out.to_pylist()[0]["z"] is None


def test_grouped_ks_statistic_exact():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        grouped_ks_statistic,
    )

    # key a: side0={1,2,3}, side1={4,5,6} -> disjoint, KS=1
    # key b: identical samples -> KS=0
    # key c: side0={1,2}, side1={2,3}: at v=1 |1*2-0*2|=2; v=2
    # |2*2-1*2|=2; v=3 |4-4|=0 -> numer 2, ks=2/4=0.5
    # key d: one side empty -> null
    rows = []
    for v in (1, 2, 3):
        rows.append(("a", v, 0))
    for v in (4, 5, 6):
        rows.append(("a", v, 1))
    for v in (7, 8):
        rows += [("b", v, 0), ("b", v, 1)]
    rows += [("c", 1, 0), ("c", 2, 0), ("c", 2, 1), ("c", 3, 1)]
    rows += [("d", 9, 0)]
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                  "v": pa.array([r[1] for r in rows], pa.int64()),
                  "side": pa.array([r[2] for r in rows], pa.int64())})
    out = {r["k"]: r for r in grouped_ks_statistic(
        rd.from_arrow(t), ["k"], "v", "side").take_all()}
    assert out["a"]["ks"] == 1.0
    assert out["b"]["ks"] == 0.0
    assert out["c"]["ks"] == 0.5 and out["c"]["ks_numer"] == 2
    assert out["d"]["ks"] is None
    # scipy-style sanity on a random pair
    import numpy as np

    rng = np.random.RandomState(5)
    x = rng.randint(0, 50, 80)
    y = rng.randint(10, 60, 60)
    rows2 = [("z", int(v), 0) for v in x] + [("z", int(v), 1) for v in y]
    t2 = pa.table({"k": pa.array([r[0] for r in rows2]),
                   "v": pa.array([r[1] for r in rows2], pa.int64()),
                   "side": pa.array([r[2] for r in rows2], pa.int64())})
    got = grouped_ks_statistic(rd.from_arrow(t2), ["k"], "v",
                               "side").take_all()[0]["ks"]
    # brute force ECDF sup over pooled values
    vals = np.unique(np.concatenate([x, y]))
    f0 = np.searchsorted(np.sort(x), vals, side="right") / len(x)
    f1 = np.searchsorted(np.sort(y), vals, side="right") / len(y)
    assert abs(got - np.abs(f0 - f1).max()) < 1e-12


def test_grouped_mannwhitney_auc():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        grouped_mannwhitney,
    )

    # a: side1 strictly above side0 -> AUC 1; b: identical -> 0.5 via
    # ties; c: hand case side0={1,3}, side1={2,3}: pairs (1<2)=1,
    # (1<3)=1, (3,2)=0, (3,3)=tie 0.5 -> U1=2.5, AUC=2.5/4
    rows = [("a", 1, 0), ("a", 2, 0), ("a", 5, 1), ("a", 6, 1),
            ("b", 4, 0), ("b", 4, 1),
            ("c", 1, 0), ("c", 3, 0), ("c", 2, 1), ("c", 3, 1),
            ("d", 9, 0)]
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                  "v": pa.array([r[1] for r in rows], pa.int64()),
                  "side": pa.array([r[2] for r in rows], pa.int64())})
    out = {r["k"]: r for r in grouped_mannwhitney(
        rd.from_arrow(t), ["k"], "v", "side").take_all()}
    assert out["a"]["auc"] == 1.0 and out["a"]["u2"] == 8
    assert out["b"]["auc"] == 0.5
    assert out["c"]["auc"] == 2.5 / 4 and out["c"]["u2"] == 5
    assert out["d"]["auc"] is None
    # scipy-formula parity on random data (U via pair counting)
    rng = np.random.RandomState(7)
    x = rng.randint(0, 30, 40)
    y = rng.randint(5, 35, 50)
    rows2 = [("z", int(v), 0) for v in x] + [("z", int(v), 1) for v in y]
    t2 = pa.table({"k": pa.array([r[0] for r in rows2]),
                   "v": pa.array([r[1] for r in rows2], pa.int64()),
                   "side": pa.array([r[2] for r in rows2], pa.int64())})
    got = grouped_mannwhitney(rd.from_arrow(t2), ["k"], "v",
                              "side").take_all()[0]
    u1 = sum((yy > xx) + 0.5 * (yy == xx) for xx in x for yy in y)
    assert got["u2"] == int(2 * u1)
    assert got["auc"] == u1 / (len(x) * len(y))


def test_grouped_welch_ttest():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        grouped_welch_ttest,
    )

    # hand case: side0 = [1,2,3] (m=2, v=1), side1 = [4,6,8] (m=6, v=4)
    # se2 = 1/3 + 4/3 = 5/3; t = 4/sqrt(5/3); df per Welch formula
    rows = [("a", v, 0) for v in (1, 2, 3)] + \
           [("a", v, 1) for v in (4, 6, 8)] + \
           [("b", 5, 0), ("b", 6, 1)]  # n<2 per side -> null
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                  "v": pa.array([r[1] for r in rows], pa.int64()),
                  "side": pa.array([r[2] for r in rows], pa.int64())})
    out = {r["k"]: r for r in grouped_welch_ttest(
        rd.from_arrow(t), ["k"], "v", "side").take_all()}
    se2 = 1.0 / 3 + 4.0 / 3
    exp_t = 4.0 / np.sqrt(se2)
    exp_df = se2 * se2 / ((1 / 3) ** 2 / 2 + (4 / 3) ** 2 / 2)
    assert abs(out["a"]["t"] - exp_t) < 1e-9
    assert abs(out["a"]["df"] - exp_df) < 1e-9
    assert out["b"]["t"] is None and out["b"]["df"] is None
    # scipy-formula parity on random data
    rng = np.random.RandomState(11)
    x = rng.randint(0, 100, 30)
    y = rng.randint(20, 120, 40)
    rows2 = [("z", int(v), 0) for v in x] + [("z", int(v), 1) for v in y]
    t2 = pa.table({"k": pa.array([r[0] for r in rows2]),
                   "v": pa.array([r[1] for r in rows2], pa.int64()),
                   "side": pa.array([r[2] for r in rows2], pa.int64())})
    got = grouped_welch_ttest(rd.from_arrow(t2), ["k"], "v",
                              "side").take_all()[0]
    v0, v1 = x.var(ddof=1), y.var(ddof=1)
    se2 = v0 / len(x) + v1 / len(y)
    assert abs(got["t"] - (y.mean() - x.mean()) / np.sqrt(se2)) < 1e-8


def test_grouped_fano_factor():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        grouped_fano_factor,
    )

    # bursty: all 8 events in one bucket of a 4-bucket span
    # counts = [8,0,0,0]: mean 2, var = (64 - 64/4)/4 = 12, F = 6
    # uniform: one event per bucket: var 0 -> F 0
    rows = [("burst", 0)] * 8 + [("burst", 35)] + \
           [("flat", i * 10) for i in range(4)]
    # the lone ts=35 event makes the span 4 buckets; recompute:
    # counts [8,0,0,1]: N=9, sq=65, B=4 -> mean 2.25,
    # var = (65 - 81/4)/4 = 11.1875, F = 4.9722..
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                  "ts": pa.array([r[1] for r in rows], pa.int64())})
    out = {r["k"]: r for r in grouped_fano_factor(
        rd.from_arrow(t), ["k"], bucket_us=10).take_all()}
    assert out["burst"]["n_buckets_span"] == 4
    assert abs(out["burst"]["fano"] - (65 - 81 / 4) / 4 / 2.25) < 1e-9
    assert out["flat"]["fano"] == 0.0


def test_chi_square_contingency_cells():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.drift import (
        chi_square_contingency,
    )

    # 2x2: [[10, 20], [30, 40]]
    rows = [("a", "x")] * 10 + [("a", "y")] * 20 + \
           [("b", "x")] * 30 + [("b", "y")] * 40
    t = pa.table({"r": pa.array([p[0] for p in rows], pa.string()),
                  "c": pa.array([p[1] for p in rows], pa.string())})
    out = {(r["r"], r["c"]): r for r in chi_square_contingency(
        rd.from_arrow(t), "r", "c").take_all()}
    cell = out[("a", "x")]
    assert cell["obs"] == 10 and cell["row_total"] == 30
    assert cell["expected"] == 30.0 * 40.0 / 100.0
    assert cell["chi2_contrib"] == (10 - 12.0) ** 2 / 12.0
    # absent cell emitted with obs 0
    rows2 = [("a", "x"), ("b", "y")]
    t2 = pa.table({"r": pa.array([p[0] for p in rows2], pa.string()),
                   "c": pa.array([p[1] for p in rows2], pa.string())})
    out2 = {(r["r"], r["c"]): r["obs"] for r in chi_square_contingency(
        rd.from_arrow(t2), "r", "c").take_all()}
    assert out2[("a", "y")] == 0 and len(out2) == 4
