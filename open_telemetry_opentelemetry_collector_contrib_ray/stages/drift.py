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
