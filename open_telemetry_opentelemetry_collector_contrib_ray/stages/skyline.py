"""Distributed Pareto skyline (maximal-vector) computation.

The skyline of a table under per-column directions ("max"/"min") is
the set of rows not DOMINATED by any other row: ``b`` dominates ``a``
iff ``b`` is at-least-as-good on every dimension and strictly better
on at least one.  Exact duplicates (equal on every dimension) never
dominate each other, so all of them survive — matching the SQL
``NOT EXISTS (... all >= ... AND one strict)`` formulation.  Classic
use: multi-objective candidate selection (cheapest-but-largest parts,
best quality-vs-length documents, fastest-vs-smallest model configs).

Scale shape (the standard two-phase distributed skyline, e.g.
Borzsony/Kossmann/Stocker "The Skyline Operator", ICDE 2001 —
block-nested-loop phase distributed):

1. LOCAL phase — every block computes its own skyline with a
   vectorized sort + archive sweep (below).  Dominated rows die where
   they live; only each block's Pareto frontier leaves the node.  On
   correlated data (the common case) a block's frontier is a tiny
   fraction of the block.
2. MERGE phase — the union of local frontiers is itself guaranteed to
   contain the global skyline (dominance is transitive: any dominated
   point is dominated by some skyline point).  The candidate union is
   repartitioned to ONE block and the same kernel runs once more.  A
   ``max_candidates`` guard raises rather than silently OOMing when
   the data is so anti-correlated that the frontier itself is huge —
   at that point the answer is not a "skyline" in any useful sense.

The per-block kernel is exact and avoids O(n^2) memory: rows are
lexsorted best-first (a dominator always sorts before its victims),
then swept in chunks against the running frontier archive; the archive
axis is ALSO tiled, so every numpy broadcast temporary is at most
``chunk x chunk x d`` bools (~12 MB at the defaults for d=3) no matter
how large the archive grows — an anti-correlated input can make the
archive millions of rows without inflating kernel memory.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def skyline_mask(X: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Boolean keep-mask of the Pareto skyline of ``X`` (2-D float64 or
    int64, ALL-MAX orientation: larger is better on every column).
    Exact; duplicates of a skyline point are all kept."""
    n, d = X.shape
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    # best-first lexicographic order: np.lexsort sorts ascending with
    # the LAST key primary, so negate and pass dims reversed.
    order = np.lexsort(tuple(-X[:, j] for j in range(d - 1, -1, -1)))
    archive = np.empty((0, d), dtype=X.dtype)
    for s in range(0, n, chunk):
        idx = order[s:s + chunk]
        C = X[idx]
        dom = np.zeros(len(C), dtype=bool)
        # archive sweep, tiled along the archive axis: peak temporary is
        # chunk x chunk x d regardless of archive size.  Rows already
        # dominated drop out of later tiles' compares.
        for a in range(0, len(archive), chunk):
            alive = np.flatnonzero(~dom)
            if not len(alive):
                break
            A = archive[a:a + chunk]
            Ca = C[alive]
            ge = (A[None, :, :] >= Ca[:, None, :]).all(-1)
            gt = (A[None, :, :] > Ca[:, None, :]).any(-1)
            dom[alive] |= (ge & gt).any(1)
        # intra-chunk: ge[i, j] <=> C[j] >= C[i] on all dims.  In the
        # best-first order a dominator always precedes its victim, and
        # transitivity makes checking against ALL chunk rows (even
        # dominated ones) still exact.
        ge = (C[:, None, :] <= C[None, :, :]).all(-1)
        gt = (C[:, None, :] < C[None, :, :]).any(-1)
        dom |= (ge & gt).any(1)
        surv = ~dom
        keep[idx[surv]] = True
        archive = np.concatenate([archive, C[surv]])
    return keep


def _oriented(t: pa.Table, cols: Sequence[str],
              directions: Sequence[str]) -> np.ndarray:
    mats = []
    for c, direc in zip(cols, directions):
        v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        if direc == "min":
            v = -v
        elif direc != "max":
            raise ValueError(f"direction must be 'max' or 'min': {direc!r}")
        mats.append(v)
    return np.column_stack(mats)


def skyline(ds, cols: Sequence[str], directions: Sequence[str],
            chunk: int = 2048, max_candidates: int = 2_000_000):
    """Pareto skyline of ``ds`` over ``cols`` with per-column
    ``directions`` ("max" keeps larger, "min" keeps smaller).  Returns
    a Dataset of the full input rows that survive.  Values are compared
    as float64 (exact for int64 magnitudes < 2^53 and for parquet
    doubles, which are already float64)."""
    cols = list(cols)
    directions = list(directions)
    if len(cols) != len(directions):
        raise ValueError("cols and directions must have equal length")

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(skyline_mask(_oriented(t, cols, directions),
                                              chunk=chunk)))

    # Materialize the (small, already-pruned) local frontiers so the
    # max_candidates guard can fire from block METADATA — before the
    # repartition(1) would gather the oversized union into one block.
    # The frontier lives in the (spillable) object store, never in a
    # single worker heap, until the guard has passed.
    cands = ds.map_batches(local, batch_format="pyarrow").materialize()
    n_cand = cands.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"skyline candidate union has {n_cand} rows "
            f"(> max_candidates={max_candidates}); the frontier is "
            "too anti-correlated for a single-block merge")
    # batch_size=None = whole block; after repartition(1) the merge
    # kernel sees the entire candidate union at once (tiled internally,
    # so kernel memory stays chunk x chunk x d).
    return cands.repartition(1).map_batches(local, batch_format="pyarrow",
                                            batch_size=None)
