"""Distribution drift: Population Stability Index between two windows.

The standard production-ML / data-quality drift check: bin a numeric
column with FIXED edges, compare the bin distribution of a baseline
window against a current window, and score

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

(PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action).  Bin
probabilities are Laplace-smoothed — p_i = (c_i + 1) / (n + B) with B =
number of bins — so empty bins are well-defined without an epsilon
fudge and the whole statistic is exactly replayable in SQL.

Scale shape: bin assignment is one map-side searchsorted against the
broadcast edge array; what shuffles is a CONSTANT-SIZE partial — one
(window, bin) count row per batch — so drift over 100 TB costs one
column-pruned pass.  Output is per-bin rows (counts, smoothed p/q, the
PSI contribution); the total is the sum of ``contrib``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def psi_drift(ds, value_col: str, window_col: str,
              edges: Sequence[int | float]):
    """PSI between window 0 (baseline) and window 1 (current) of
    ``ds`` — ``window_col`` must be 0/1 int.  ``edges`` are ascending
    interior bin edges: bin_id = number of edges <= value, giving
    len(edges)+1 bins covering the whole line.  Returns one row per
    bin: ``bin_id, c_base, c_cur, p_base, p_cur, contrib`` (all bins
    emitted, including empty ones)."""
    from .aggregate import grouped_agg

    edges_arr = np.asarray(list(edges), dtype=np.float64)
    if np.any(np.diff(edges_arr) <= 0):
        raise ValueError("edges must be strictly ascending")
    n_bins = len(edges_arr) + 1

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = t.column(window_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = np.searchsorted(edges_arr, v, side="right")
        key = w * n_bins + b
        cnt = np.bincount(key, minlength=2 * n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"win": pa.array(nz // n_bins, pa.int64()),
                         "bin_id": pa.array(nz % n_bins, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["win", "bin_id"], [("sum", "c", "c")],
                         combine="driver").to_pandas()
    c = np.zeros((2, n_bins), dtype=np.int64)
    c[counts["win"].to_numpy(), counts["bin_id"].to_numpy()] = \
        counts["c"].to_numpy()
    n = c.sum(axis=1)
    p = (c[0] + 1.0) / (n[0] + n_bins)
    q = (c[1] + 1.0) / (n[1] + n_bins)
    contrib = (p - q) * np.log(p / q)
    return pa.table({
        "bin_id": pa.array(np.arange(n_bins), pa.int64()),
        "c_base": pa.array(c[0], pa.int64()),
        "c_cur": pa.array(c[1], pa.int64()),
        "p_base": pa.array(p, pa.float64()),
        "p_cur": pa.array(q, pa.float64()),
        "contrib": pa.array(contrib, pa.float64())})


_BENFORD_P = np.log10(1.0 + 1.0 / np.arange(1, 10))


def benford_audit(ds, value_col: str):
    """First-digit (Benford's law) audit of a positive integer column —
    the classic fabricated-data / unit-mixup detector: naturally
    occurring multi-scale quantities have first-digit frequencies
    log10(1 + 1/d); a flat or spiked profile flags synthetic or
    corrupted values.

    One map-side pass: first digit by decimal string slice (exact,
    SQL-identical), 9-bucket count partials (constant size) shuffle,
    nothing else moves.  Non-positive values are EXCLUDED (Benford is
    defined on positive magnitudes).  Output: one row per digit 1..9
    with observed count, observed probability, Benford expectation and
    the chi-square contribution (obs - exp_count)^2 / exp_count.
    """
    import pyarrow.compute as pc

    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        pos = t.filter(pc.greater(v, pa.scalar(0)))
        s = pc.cast(pos.column(value_col), pa.string())
        d1 = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cnt = np.bincount(d1, minlength=10)[1:10]
        nz = np.flatnonzero(cnt)
        return pa.table({"digit": pa.array(nz + 1, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["digit"], [("sum", "c", "c")],
                         combine="driver").to_pandas()
    c = np.zeros(9, dtype=np.int64)
    c[counts["digit"].to_numpy() - 1] = counts["c"].to_numpy()
    n = c.sum()
    exp_c = _BENFORD_P * n
    obs_p = c / n if n else np.zeros(9)
    chi2 = (c - exp_c) ** 2 / exp_c if n else np.zeros(9)
    return pa.table({
        "digit": pa.array(np.arange(1, 10), pa.int64()),
        "c": pa.array(c, pa.int64()),
        "obs_p": pa.array(obs_p, pa.float64()),
        "benford_p": pa.array(_BENFORD_P, pa.float64()),
        "chi2_contrib": pa.array(chi2, pa.float64())})


def two_proportion_ztest(ds, variant_col: str, flag_col: str):
    """A/B experiment readout: pooled two-proportion z-test between
    variant 0 and variant 1 over a 0/1 success flag (one row per
    UNIT — dedupe to units upstream).

        z = (r0 - r1) / sqrt(p*(1-p) * (1/n0 + 1/n1)),  p pooled.

    One map-side pass of four-int partials (n, successes per variant),
    zero data shuffle; the float expression is fixed-order, so the
    result replays exactly in SQL.  Returns one row: n0, n1, conv0,
    conv1, rate0, rate1, z (z is null when either arm is empty or the
    pooled rate is degenerate 0 or 1)."""
    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        w = t.column(variant_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = t.column(flag_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "n0": pa.array([int((w == 0).sum())], pa.int64()),
            "n1": pa.array([int((w == 1).sum())], pa.int64()),
            "conv0": pa.array([int(f[w == 0].sum())], pa.int64()),
            "conv1": pa.array([int(f[w == 1].sum())], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .sum(["n0", "n1", "conv0", "conv1"])
    n0, n1 = int(agg["sum(n0)"]), int(agg["sum(n1)"])
    c0, c1 = int(agg["sum(conv0)"]), int(agg["sum(conv1)"])
    cols = {
        "n0": pa.array([n0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "conv0": pa.array([c0], pa.int64()),
        "conv1": pa.array([c1], pa.int64()),
        "rate0": pa.array([c0 / n0 if n0 else None], pa.float64()),
        "rate1": pa.array([c1 / n1 if n1 else None], pa.float64()),
    }
    if n0 and n1 and 0 < c0 + c1 < n0 + n1:
        p = (c0 + c1) / (n0 + n1)
        z = (c0 / n0 - c1 / n1) / np.sqrt(
            p * (1 - p) * (1 / n0 + 1 / n1))
        cols["z"] = pa.array([float(z)], pa.float64())
    else:
        cols["z"] = pa.array([None], pa.float64())
    return pa.table(cols)
