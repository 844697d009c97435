"""Distributed KMeans over an embedding column (Lloyd's algorithm as a
map-reduce: assignment is embarrassingly parallel, the update step
reduces k x dim partial sums — kilobytes — never vectors).

Used standalone for corpus clustering (topic bucketing, IVF coarse
quantizer training — stages/similarity.py trains its own; this is the
general surface) and for diversity-aware sampling of training data.

Scale notes (100 TB path):
* assignment: ``map_batches`` with the centroid matrix broadcast via
  ``ray.put`` once — zero-copy FixedSizeList -> numpy per batch, one
  (n x k) distance matrix per batch, argmin.
* update: each batch emits ONE (k x dim sums, k counts) partial; the
  driver adds a few kilobytes per batch.  No shuffle at any point.
* iterations stream the dataset once each; keep iters small (5-20) or
  sample the fit set — standard practice.

Determinism: initial centroids are the embeddings of the k smallest
ids (exact input floats, no RNG), so the first assignment is exactly
replayable in SQL (``list_distance`` + argmin via row_number) — the
``kmeans_assign`` query is oracle-checked on that step.  Iterated
centroids accumulate float sums in batch order; convergence tests use
planted well-separated blobs where assignment is order-insensitive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _to_mat(col: pa.ChunkedArray | pa.Array, dtype=np.float64) -> np.ndarray:
    # float64 default: the oracle (DuckDB list_distance over DOUBLE[])
    # computes in float64 — a float32 round here can flip argmin on
    # near-equidistant points despite the elementwise-distance care
    """Zero-copy list<float> / fixed_size_list<float> -> (n, d) matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=dtype)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _sq_dists(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances, elementwise formula (same op shape
    as SQL list_distance: per-dim diff, square, sum) — not the matmul
    expansion, so near-tie argmins agree with the oracle."""
    n, k = x.shape[0], cents.shape[0]
    x64 = x.astype(np.float64)
    c64 = cents.astype(np.float64)
    out = np.empty((n, k), dtype=np.float64)
    for j in range(k):
        diff = x64 - c64[j]
        out[:, j] = np.einsum("ij,ij->i", diff, diff)
    return out


def seed_centroids(ds, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic init: embeddings of the k smallest ids (pruned
    parquet read upstream is the caller's job; this just filters)."""
    tbl = pa.concat_tables(
        ray.get(ds.map_batches(
            lambda t: t.filter(pc.less(t.column(id_col), k))
                       .select([id_col, vec_col]),
            batch_format="pyarrow").to_arrow_refs()))
    tbl = tbl.sort_by(id_col)
    if tbl.num_rows != k:
        raise ValueError(f"need ids 0..{k-1} present, got {tbl.num_rows}")
    return _to_mat(tbl.column(vec_col))


class _Assign:
    """Stateless assignment stage: centroids live in the object store
    (ray.put once), resolved per worker in __init__."""

    def __init__(self, cents_ref, vec_col: str, out_col: str,
                 exact: bool = True):
        self.cents = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) \
            else cents_ref
        self.vec_col, self.out_col = vec_col, out_col
        self.exact = exact
        if not exact:
            self.c32 = np.ascontiguousarray(self.cents, dtype=np.float32)
            self.c32_sq = np.einsum("ij,ij->i", self.c32, self.c32)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(self.out_col, pa.array([], pa.int64()))
        if self.exact:
            x = _to_mat(t.column(self.vec_col))
            assign = np.argmin(_sq_dists(x, self.cents), axis=1)  # ties -> lowest id
        else:
            # float32 matmul expansion: half the memory traffic of the
            # float64 elementwise path — the bulk-assignment mode where
            # bitwise near-tie replayability doesn't matter
            x = _to_mat(t.column(self.vec_col), dtype=np.float32)
            d = -2.0 * (x @ self.c32.T) + self.c32_sq[None, :]
            assign = np.argmin(d, axis=1)
        return t.append_column(self.out_col, pa.array(assign.astype(np.int64)))


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  out_col: str = "cluster_id", exact: bool = True):
    """Append the nearest-centroid id to every row (one streaming map).

    exact=True (default): float64 elementwise distances — argmin is
    bitwise-replayable by the DuckDB list_distance oracle even on
    near-equidistant points.  exact=False: float32 matmul distances,
    ~2x less memory traffic — the 100-TB bulk-assignment path when
    near-tie determinism vs an external replay doesn't matter."""
    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    # plain task, not an actor pool: per-batch setup is one zero-copy
    # ray.get of the broadcast centroids (+ a k x d float32 copy in
    # bulk mode) — actor startup costs more than it saves (the round-3
    # probe-stage A/B, applied here: kmeans_assign 3.8 -> ~1.4 s warm
    # at sf0.1/32cpu)
    def assign(t: pa.Table) -> pa.Table:
        return _Assign(ref, vec_col, out_col, exact)(t)

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit(ds, k: int, iters: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id", init: np.ndarray | None = None,
               sample_mod: int | None = None):
    """See _kmeans_fit.  sample_mod=M fits on the deterministic
    ~1/M hash-sample of ids (the 100 TB pattern: train the quantizer on
    a sample, assign the full corpus with kmeans_assign) — iteration
    passes then stream only the sample."""
    if sample_mod and sample_mod > 1:
        m = int(sample_mod)
        if init is None:
            # seeds come from the FULL dataset (the sample may not
            # contain ids 0..k-1)
            init = seed_centroids(ds, k, vec_col, id_col)

        def keep(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            # cheap deterministic slice: multiplicative hash of the id
            # splitmix-style mix (wrapping multiply + xor-shift) so the
            # LOW bits are mixed too — a bare multiplicative hash is an
            # identity map mod small powers of two (stride sample, not
            # a uniform one)
            ids = t.column(id_col).cast(pa.int64()) \
                   .to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ids * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(29)
            return t.filter(pa.array(h % np.uint64(m) == 0))

        fit_ds = ds.map_batches(keep, batch_format="pyarrow")
    else:
        fit_ds = ds
    return _kmeans_fit(fit_ds, k, iters, vec_col, id_col, init)


def _kmeans_fit(ds, k: int, iters: int = 5, vec_col: str = "embedding",
                id_col: str = "vec_id", init: np.ndarray | None = None):
    """Lloyd iterations: each pass streams the dataset once, emitting a
    single (k x dim float64 sums, k int64 counts) partial row per batch;
    the driver folds partials (kilobytes each).  Empty clusters keep
    their previous centroid (standard Lloyd fallback).

    Returns (centroids float32 (k, d), inertia float)."""
    cents = (init if init is not None
             else seed_centroids(ds, k, vec_col, id_col)).astype(np.float32)
    dim = cents.shape[1]
    inertia = float("inf")
    for _ in range(iters):
        ref = ray.put(cents)

        class Partial:
            def __init__(self):
                self.cents = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                x = _to_mat(t.column(vec_col))
                if x.shape[0] == 0:
                    z = np.zeros((k, dim))
                    return pa.table({
                        "sums": pa.array([z.ravel().tolist()]),
                        "counts": pa.array([[0] * k]),
                        "inertia": pa.array([0.0])})
                d = _sq_dists(x, self.cents)
                assign = np.argmin(d, axis=1)
                sums = np.zeros((k, dim), dtype=np.float64)
                np.add.at(sums, assign, x.astype(np.float64))
                counts = np.bincount(assign, minlength=k).astype(np.int64)
                return pa.table({
                    "sums": pa.array([sums.ravel().tolist()]),
                    "counts": pa.array([counts.tolist()]),
                    "inertia": pa.array([float(d[np.arange(len(assign)), assign].sum())])})

        rows = ds.map_batches(Partial, batch_format="pyarrow",
                              concurrency=(1, 8)).take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for r in rows:
            sums += np.asarray(r["sums"], dtype=np.float64).reshape(k, dim)
            counts += np.asarray(r["counts"], dtype=np.int64)
            inertia += r["inertia"]
        if counts.sum() == 0:
            raise ValueError(
                "kmeans fit set is empty (over-aggressive sample_mod or "
                "an empty input dataset)")
        nz = counts > 0
        new = cents.astype(np.float64).copy()
        new[nz] = sums[nz] / counts[nz, None]
        cents = new.astype(np.float32)
    return cents, inertia


def cluster_sizes(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Assignment + per-cluster counts (exact ints — the oracle-checked
    surface).  Counts combine per batch before the tiny groupby."""
    from .aggregate import grouped_count

    assigned = kmeans_assign(ds, centroids, vec_col=vec_col)
    return grouped_count(
        assigned.map_batches(lambda t: t.select(["cluster_id"]),
                             batch_format="pyarrow"),
        ["cluster_id"], alias="n", combine="driver")
