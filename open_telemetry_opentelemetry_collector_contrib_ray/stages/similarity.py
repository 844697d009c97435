"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: the exact baseline — broadcast query matrix, numpy
  matmul per batch, per-batch local top-k partials, global merge of the
  (tiny) partials.  The scale path for "scan everything once".
- ivf_topk: IVF-style two-stage search — k-means-ish centroids sampled
  and refined on a small sample (driver), every vector assigned to its
  nearest centroid ONCE (a partitioned write in real use), queries probe
  only the n_probe closest lists.  Probing touches a fraction of the
  corpus at a small recall cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_mat(col) -> np.ndarray:
    """(n, d) float64 matrix from a fixed-width list column, zero-copy
    from the Arrow buffer (flatten + reshape) — never via Python lists.
    Null rows become zero vectors (flatten() DROPS nulls, so a naive
    reshape would misalign every following row)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 1))
    if arr.null_count:
        import pyarrow.compute as pc

        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        sub = arr.drop_null()
        m = len(sub)
        if m == 0:
            return np.zeros((n, 1))
        flat = sub.flatten()
        if len(flat) % m:
            raise ValueError("ragged embedding column")
        d = len(flat) // m
        out = np.zeros((n, d), dtype=np.float64)
        out[np.nonzero(valid)[0]] = np.asarray(
            flat.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(m, d)
        return out
    flat = arr.flatten()
    if len(flat) % n == 0 and len(flat) > 0:
        vals = flat.to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(vals.reshape(n, len(flat) // n),
                                    dtype=np.float64)
    # ragged fallback (not expected for embedding columns)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     exclude_ids: set | None = None):
    """Exact cosine top-k for each query row.  Returns Dataset(query_idx,
    vec_id, sim, rank).  queries: (nq, dim) array, broadcast to every task.
    Per-batch partial top-k keeps the shuffle tiny: k rows per query per
    batch instead of the full score matrix."""
    import ray

    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    qref = ray.put(qn)
    excl = exclude_ids or set()

    def score(batch: pa.Table) -> pa.Table:
        # plain task: the broadcast query matrix reads zero-copy from
        # the local object store; an actor pool here only adds startup
        q = ray.get(qref)
        ids = np.asarray(batch.column(id_col))
        mat = _to_mat(batch.column(emb_col))
        if mat.size == 0:
            return pa.table({"query_idx": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        keep = ~np.isin(ids, list(excl)) if excl else np.ones(len(ids), bool)
        ids, mat = ids[keep], mat[keep]
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = (mat / norms) @ q.T  # (n, nq)
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        qi, vi, sv = [], [], []
        for qidx in range(sims.shape[1]):
            sel = part[:, qidx]
            qi.extend([qidx] * len(sel))
            vi.extend(ids[sel])
            sv.extend(sims[sel, qidx])
        return pa.table({"query_idx": pa.array(qi, pa.int32()),
                         id_col: pa.array(vi),
                         "sim": pa.array(sv, pa.float64())})

    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, id_col)


def _merge_topk(partials, k: int, id_col: str):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True])
        # boundary-replicated IVF lists can score the same vector for the
        # same query from two probed lists — keep one copy before ranking
        g = g.drop_duplicates(subset=id_col).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    from .aggregate import arrow_out

    return partials.groupby("query_idx").map_groups(arrow_out(merge),
                                                    batch_format="pandas")


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_bits: int = 10,
             n_tables: int = 12, id_col: str = "vec_id",
             emb_col: str = "embedding", exclude_ids: set | None = None,
             seed: int = 13):
    """LSH-bucketed approximate cosine top-k (random-hyperplane SimHash,
    Charikar STOC'02): ``n_tables`` independent ``n_bits`` signatures; a
    vector is a candidate for a query iff they share a FULL signature in
    at least one table; exact cosine runs only on candidates.

    Scale shape: the hyperplane tensor + query signatures broadcast once
    (ray.put); every batch prunes LOCALLY against the query signature
    set (sorted-array searchsorted probe per table) and ships at most k
    candidate rows per query per batch — no shuffle, no index build.
    Recall rises with n_tables, pruning sharpness with n_bits.  The
    third scale path next to IVF (clustered routing) and PQ (compressed
    scan)."""
    import ray

    nq, d = queries.shape
    rng = np.random.RandomState(seed)
    H = rng.normal(size=(n_tables, d, n_bits))
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)
    # per table: sorted signature keys + the query ids in that order —
    # precomputed ONCE into the broadcast so the per-batch task is pure
    # probe work (a plain task pool; a stateful actor pool here would
    # pay actor-startup latency for setup that is already free)
    tables = []
    for t in range(n_tables):
        qsig = ((qn @ H[t]) > 0) @ pow2
        order = np.argsort(qsig, kind="stable")
        tables.append((qsig[order], order))
    qref = ray.put((qn, H, tables))
    excl = exclude_ids or set()

    def score(batch: pa.Table) -> pa.Table:
        bqn, bH, btables = ray.get(qref)  # zero-copy local object store
        empty = pa.table({"query_idx": pa.array([], pa.int32()),
                          id_col: pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        ids = np.asarray(batch.column(id_col))
        mat = _to_mat(batch.column(emb_col))
        if mat.size == 0:
            return empty
        if excl:
            keep = ~np.isin(ids, list(excl))
            ids, mat = ids[keep], mat[keep]
            if not len(ids):
                return empty
        xn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        pair_r, pair_q = [], []
        for t in range(n_tables):
            sig = ((xn @ bH[t]) > 0) @ pow2  # (n,)
            skeys, qorder = btables[t]
            left = np.searchsorted(skeys, sig, side="left")
            right = np.searchsorted(skeys, sig, side="right")
            cnt = right - left
            hit = np.nonzero(cnt)[0]
            if not len(hit):
                continue
            lens = cnt[hit]
            starts = left[hit]
            total = int(lens.sum())
            prev = np.cumsum(lens) - lens
            offs = np.arange(total) - np.repeat(prev, lens) \
                + np.repeat(starts, lens)
            pair_r.append(np.repeat(hit, lens))
            pair_q.append(qorder[offs])
        if not pair_r:
            return empty
        R = np.concatenate(pair_r).astype(np.int64)
        Q = np.concatenate(pair_q).astype(np.int64)
        uniq = np.unique(R * nq + Q)  # same pair via several tables
        R, Q = uniq // nq, uniq % nq
        sims = np.einsum("ij,ij->i", xn[R], bqn[Q])
        # per-query partial top-k inside the batch bounds the shuffle
        order = np.lexsort((-sims, Q))
        Qs, Rs, Ss = Q[order], R[order], sims[order]
        gs = np.flatnonzero(np.r_[True, np.diff(Qs) != 0])
        glen = np.diff(np.r_[gs, len(Qs)])
        pos = np.arange(len(Qs)) - np.repeat(gs, glen)
        m = pos < k
        return pa.table({"query_idx": pa.array(Qs[m].astype(np.int32)),
                         id_col: pa.array(ids[Rs[m]]),
                         "sim": pa.array(Ss[m], pa.float64())})

    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, id_col)


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 15,
                    seed: int = 5) -> np.ndarray:
    """Spherical k-means on a driver-side sample (the IVF training step):
    assignment by cosine, centroids re-normalized each iteration — the
    matching objective for cosine-similarity search.  On isotropic
    vectors (the IVF worst case) recall is fundamentally probe-limited
    either way; real embedding distributions cluster and benefit more."""
    rng = np.random.RandomState(seed)
    s = sample.astype(np.float64)
    s = s / np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-12)
    idx = rng.choice(len(s), size=min(n_centroids, len(s)), replace=False)
    c = s[idx].copy()
    for _ in range(iters):
        assign = (s @ c.T).argmax(1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                v = s[m].sum(0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def ivf_build(ds, n_centroids: int = 16, emb_col: str = "embedding",
              sample_size: int = 2048, replicate_eps: float = 0.0,
              max_assign: int = 4, id_col: str = "vec_id"):
    """IVF index build (the one-time cost): train centroids on a sample,
    assign every vector to its nearest list, MATERIALIZE the assigned
    dataset (in real use: a partitioned parquet write by list_id so
    queries read only probed lists).  Returns (assigned_ds, unit_centroids).

    replicate_eps > 0 turns on SPANN-style boundary replication (Chen et
    al., NeurIPS 2021): a vector is ALSO assigned to every list whose
    centroid similarity is within eps of its best one (capped at
    max_assign lists).  Boundary vectors — the ones IVF pruning loses —
    then live in all the lists a nearby query would probe.  Measured on
    this corpus's isotropic 64-dim vectors (the IVF worst case, no
    cluster structure): probe 4/16 recall@10 0.62 -> 0.68 at eps=0.05
    (1.24x storage) -> 0.78 at eps=0.10 (2.0x); see BASELINE.md.
    Query-side: _merge_topk dedups per (query, vector)."""
    import ray

    # limit() rows arrive in task-completion order; centroids must not
    # depend on scheduling
    sample_rows = ds.limit(sample_size).to_pandas().sort_values(id_col) \
        .reset_index(drop=True)
    sample = np.stack(sample_rows[emb_col].to_numpy()).astype(np.float64)
    cents = train_centroids(sample, n_centroids)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    cref = ray.put(cn)
    eps, cap = float(replicate_eps), int(max_assign)

    # plain task, not an actor pool: ray.get of a broadcast is a
    # zero-copy local read, and actor startup costs ~1-2 s/pool
    # (round-3 A/B, BASELINE.md probe-stage table)
    def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            mat = _to_mat(batch.column(emb_col))
            if mat.size == 0:
                return batch.append_column("list_id", pa.array([], pa.int32()))
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = (mat / norms) @ c.T  # (n, n_lists)
            if eps <= 0.0:
                assign = sims.argmax(1).astype(np.int32)
                return batch.append_column("list_id", pa.array(assign))
            # multi-assign: lists within eps of the best, capped at `cap`
            kk = min(cap, sims.shape[1])
            top = np.argsort(-sims, axis=1)[:, :kk]          # (n, kk)
            top_sims = np.take_along_axis(sims, top, axis=1)
            member = top_sims >= (top_sims[:, :1] - eps)     # best always in
            row_idx, which = np.nonzero(member)
            lists = top[row_idx, which].astype(np.int32)
            out = batch.take(pa.array(row_idx))
            return out.append_column("list_id", pa.array(lists))

    assigned = ds.map_batches(assign, batch_format="pyarrow").materialize()
    return assigned, cn


def _routed_topk(pruned, qn: np.ndarray, probes: np.ndarray, k: int,
                 id_col: str, emb_col: str, exclude_ids: set | None):
    """Score each list ONLY against the queries that probed it (per-query
    probe routing).  Without this, a batch of queries unions its probe
    sets and every query scores every probed list — at nq queries x
    n_probe lists that is an nq-fold blowup of useless work.  `pruned`
    must carry a list_id column."""
    import ray

    probe_of: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for lid in row:
            probe_of.setdefault(int(lid), []).append(qi)
    qref = ray.put(qn)
    pref = ray.put({lid: np.asarray(v, dtype=np.int64)
                    for lid, v in probe_of.items()})
    excl = exclude_ids or set()

    # plain task (see ivf_build.assign): per-batch ray.get of the
    # broadcast probe tables is a local zero-copy read
    def routed_score(batch: pa.Table) -> pa.Table:
            q = ray.get(qref)
            routes = ray.get(pref)
            empty = pa.table({"query_idx": pa.array([], pa.int32()),
                              id_col: pa.array([], pa.int64()),
                              "sim": pa.array([], pa.float64())})
            if batch.num_rows == 0:
                return empty
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            lids = batch.column("list_id").to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
            mat = _to_mat(batch.column(emb_col))
            keep = ~np.isin(ids, list(excl)) if excl else np.ones(len(ids), bool)
            ids, lids, mat = ids[keep], lids[keep], mat[keep]
            if not len(ids):
                return empty
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            unit = mat / norms
            qi_out, vi_out, sv_out = [], [], []
            for lid in np.unique(lids):
                qidx = routes.get(int(lid))
                if qidx is None:
                    continue
                rows = lids == lid
                sub_ids = ids[rows]
                sims = unit[rows] @ q[qidx].T  # (n_rows, nq_probing)
                kk = min(k, len(sub_ids))
                part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
                for j, qg in enumerate(qidx):
                    sel = part[:, j]
                    qi_out.extend([qg] * len(sel))
                    vi_out.extend(sub_ids[sel])
                    sv_out.extend(sims[sel, j])
            return pa.table({"query_idx": pa.array(qi_out, pa.int32()),
                             id_col: pa.array(vi_out),
                             "sim": pa.array(sv_out, pa.float64())})

    partials = pruned.map_batches(routed_score, batch_format="pyarrow")
    return _merge_topk(partials, k, id_col)


def ivf_query(assigned, cn: np.ndarray, queries: np.ndarray, k: int = 10,
              n_probe: int = 4, id_col: str = "vec_id",
              emb_col: str = "embedding", exclude_ids: set | None = None):
    """Query a prebuilt IVF index: prune to the union of probed lists,
    then route each list's rows only to the queries probing it."""
    import pyarrow.compute as pc

    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
    probe_arr = pa.array(sorted(set(probes.reshape(-1).tolist())), pa.int32())
    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("list_id"), value_set=probe_arr)),
        batch_format="pyarrow")
    return _routed_topk(pruned, qn, probes, k, id_col, emb_col, exclude_ids)


def ivf_build_partitioned(ds, out_dir: str, n_centroids: int = 16,
                          emb_col: str = "embedding", sample_size: int = 2048,
                          replicate_eps: float = 0.0, max_assign: int = 4):
    """The real IVF scale path: persist the assigned vectors PARTITIONED BY
    list_id (one directory per inverted list) so queries physically read
    only the probed lists.  Returns unit centroids (also saved)."""
    import numpy as _np

    assigned, cn = ivf_build(ds, n_centroids=n_centroids, emb_col=emb_col,
                             sample_size=sample_size,
                             replicate_eps=replicate_eps, max_assign=max_assign)
    # few large files per list: probing cost is per-file open, not per-row
    assigned.write_parquet(out_dir, partition_cols=["list_id"],
                           min_rows_per_file=200_000)
    _np.save(out_dir + "/centroids.npy", cn)
    return cn


def ivf_query_partitioned(out_dir: str, queries: np.ndarray, k: int = 10,
                          n_probe: int = 4, id_col: str = "vec_id",
                          emb_col: str = "embedding",
                          exclude_ids: set | None = None):
    """Query a partitioned IVF index: list directories outside the probe
    set are never read from storage."""
    import os

    import numpy as _np
    import ray.data as rd

    cn = _np.load(out_dir + "/centroids.npy")
    qn = queries / _np.maximum(_np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    probes = _np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
    import glob as _glob

    lists = sorted(set(probes.reshape(-1).tolist()))
    files = []
    for i in lists:
        files.extend(_glob.glob(os.path.join(out_dir, f"list_id={i}", "*.parquet")))
    # hive partitioning restores the list_id column for per-query routing
    pruned = rd.read_parquet(files)
    if "list_id" not in pruned.schema().names:
        import pyarrow.compute as _pc

        def stamp(t, _files=files):  # pragma: no cover - hive usually present
            raise RuntimeError("list_id partition column missing from read")
        pruned = pruned.map_batches(stamp, batch_format="pyarrow")
    return _routed_topk(pruned, qn, probes, k, id_col, emb_col, exclude_ids)


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
             n_probe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
             sample_size: int = 2048, exclude_ids: set | None = None,
             replicate_eps: float = 0.0, max_assign: int = 4):
    """IVF approximate top-k: build (once) + query.  For repeated query
    batches, call ivf_build once and ivf_query per batch."""
    assigned, cn = ivf_build(ds, n_centroids=n_centroids, emb_col=emb_col,
                             sample_size=sample_size,
                             replicate_eps=replicate_eps, max_assign=max_assign)
    return ivf_query(assigned, cn, queries, k=k, n_probe=n_probe, id_col=id_col,
                     emb_col=emb_col, exclude_ids=exclude_ids)


# ----------------------------------------------------- product quantization


def pq_train(ds, m: int = 8, ksub: int = 32, emb_col: str = "embedding",
             sample_size: int = 4096, iters: int = 15,
             seed: int = 7, id_col: str = "vec_id") -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (unit-normalized) vector into m subspaces and run Lloyd k-means per
    subspace on a driver-side sample.  Returns (m, ksub, d/m) float64.

    This is THE storage scale path for embedding search: d float64
    dims collapse to m uint8 codes (64-dim f64 -> 8 bytes = 64x), so a
    100 TB embedding column scans as ~1.6 TB of codes."""
    s = _pq_sample(ds, sample_size, id_col, emb_col)
    rng = np.random.RandomState(seed)
    d = s.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    # a sample smaller than ksub can only support len(sample) centroids
    ksub = min(ksub, len(s))
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        books[j] = _lloyd(s[:, j * dsub:(j + 1) * dsub], ksub, iters, rng)
    return books


def _pq_sample(ds, sample_size: int, id_col: str, emb_col: str) -> np.ndarray:
    # sort the collected sample: limit() rows arrive in task-completion
    # order, and codebooks must not depend on scheduling
    rows = ds.limit(sample_size).to_pandas().sort_values(id_col) \
        .reset_index(drop=True)
    s = np.stack(rows[emb_col].to_numpy()).astype(np.float64)
    return s / np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-12)


def _lloyd(x: np.ndarray, ksub: int, iters: int, rng,
           init: np.ndarray | None = None) -> np.ndarray:
    """Plain L2 Lloyd; cold start = seeded sample choice, warm start
    (``init``) continues from given centroids (never increases the
    quantization objective — the OPQ monotonicity hook)."""
    if init is None:
        idx = rng.choice(len(x), size=ksub, replace=False)
        c = x[idx].copy()
    else:
        c = init.copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for g in range(len(c)):
            mask = assign == g
            if mask.any():
                c[g] = x[mask].mean(0)
    return c


def _pq_reconstruct(Xr: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Quantize-then-reconstruct each rotated vector against its
    subspace codebooks (the q(x) of the OPQ objective)."""
    m, ksub, dsub = books.shape
    Y = np.empty_like(Xr)
    for j in range(m):
        x = Xr[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        d2 = -2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        Y[:, j * dsub:(j + 1) * dsub] = c[d2.argmin(1)]
    return Y


def opq_train(ds, m: int = 8, ksub: int = 32, emb_col: str = "embedding",
              sample_size: int = 4096, iters: int = 15, opq_iters: int = 8,
              seed: int = 7, id_col: str = "vec_id"):
    """Optimized Product Quantization (Ge et al., CVPR 2013 §4, the
    non-parametric alternation): learn an orthonormal rotation R
    jointly with the codebooks by alternating (1) PQ codebook training
    on the rotated sample — Lloyd WARM-STARTED from the previous
    round's codebooks, so the joint objective ||s R − q(s R)||_F² never
    increases — and (2) the orthogonal-Procrustes solve R = U Vᵀ of
    svd(sᵀ Y).  Round 1 (R = I, cold-start Lloyd, same seeded RNG
    sequence) reproduces ``pq_train`` exactly, so the final sample
    quantization error is ≤ plain PQ's by construction (the
    ``opq_check`` invariant).  Returns ``(R, books)``; encode with
    ``pq_encode(rotate_embeddings(ds, R), books)`` and search with
    rotated queries ``q @ R``.  Rotation helps ANISOTROPIC / clustered
    embeddings; on isotropic vectors it converges near identity gain
    (NOTES.md round-3 analysis) — which is exactly what the invariant
    tolerates (≤, not <)."""
    s = _pq_sample(ds, sample_size, id_col, emb_col)
    rng = np.random.RandomState(seed)
    d = s.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ksub = min(ksub, len(s))
    dsub = d // m
    R = np.eye(d)
    books: np.ndarray | None = None
    for _ in range(max(1, opq_iters)):
        Xr = s @ R
        new = np.empty((m, ksub, dsub))
        for j in range(m):
            new[j] = _lloyd(Xr[:, j * dsub:(j + 1) * dsub], ksub, iters,
                            rng, init=None if books is None else books[j])
        books = new
        Y = _pq_reconstruct(Xr, books)
        U, _, Vt = np.linalg.svd(s.T @ Y)
        R = U @ Vt
    # final codebook refresh under the final R (the alternation ends on
    # a codebook step so books match the returned rotation)
    Xr = s @ R
    for j in range(m):
        books[j] = _lloyd(Xr[:, j * dsub:(j + 1) * dsub], ksub, iters,
                          rng, init=books[j])
    return R, books


def rotate_embeddings(ds, R: np.ndarray, emb_col: str = "embedding"):
    """Map-only: replace the embedding column with x @ R (R broadcast
    once via ray.put).  Orthonormal R preserves norms, so downstream
    unit-normalization commutes with the rotation."""
    import ray

    rref = ray.put(np.ascontiguousarray(R))

    def rot(batch: pa.Table) -> pa.Table:
        mat = _to_mat(batch.column(emb_col))
        if mat.size == 0:
            return batch
        out = mat @ ray.get(rref)
        d = out.shape[1]
        flat = pa.array(out.reshape(-1), pa.float64())
        idx = batch.column_names.index(emb_col)
        return batch.set_column(
            idx, emb_col, pa.FixedSizeListArray.from_arrays(flat, d))

    return ds.map_batches(rot, batch_format="pyarrow")


def pq_quantization_mse(ds, books: np.ndarray, R: np.ndarray | None = None,
                        emb_col: str = "embedding") -> float:
    """Corpus-wide mean squared quantization error ||xn R − q(xn R)||²
    (xn unit-normalized) — kilobyte per-batch (sum, count) partials."""
    import ray

    refs = ray.put((books, R))

    def partial(batch: pa.Table) -> pa.Table:
        b, rot = ray.get(refs)
        mat = _to_mat(batch.column(emb_col))
        if mat.size == 0:
            return pa.table({"se": pa.array([0.0]),
                             "n": pa.array([0], pa.int64())})
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        if rot is not None:
            mat = mat @ rot
        err = mat - _pq_reconstruct(mat, b)
        return pa.table({"se": pa.array([float((err * err).sum())]),
                         "n": pa.array([len(mat)], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .sum(["se", "n"])
    return agg["sum(se)"] / max(agg["sum(n)"], 1)


def pq_encode(ds, codebooks: np.ndarray, id_col: str = "vec_id",
              emb_col: str = "embedding"):
    """Map-only encode: each vector's m subspaces argmin against their
    codebook -> one uint8 code each.  Output (id, codes list<uint8>) —
    the compressed index that replaces the float column at scan time."""
    import ray

    cref = ray.put(codebooks)
    m, ksub, dsub = codebooks.shape

    # plain task (see ivf_build.assign): broadcast codebooks read
    # zero-copy per batch; actor startup is pure overhead here
    def encode(batch: pa.Table) -> pa.Table:
            books = ray.get(cref)
            mat = _to_mat(batch.column(emb_col))
            n = len(mat)
            if n == 0 or mat.size == 0:
                return pa.table({id_col: batch.column(id_col).slice(0, 0),
                                 "codes": pa.array(
                                     [], pa.list_(pa.uint8(), m))})
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                x = mat[:, j * dsub:(j + 1) * dsub]
                c = books[j]
                # ||x-c||^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
                d2 = -2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
                codes[:, j] = d2.argmin(1).astype(np.uint8)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            return pa.table({
                id_col: batch.column(id_col),
                "codes": pa.FixedSizeListArray.from_arrays(flat, m)})

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
            k: int = 10, rerank_ds=None, rerank_factor: int = 5,
            id_col: str = "vec_id", emb_col: str = "embedding",
            exclude_ids: set | None = None):
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each
    query precomputes an (m, ksub) LUT of subspace squared distances,
    every batch of codes scores as m LUT gathers + a sum — no floats
    read from storage.  With `rerank_ds`, the ADC shortlist
    (rerank_factor * k per query) is re-scored EXACTLY against the raw
    vectors of just those ids (a broadcast-id semi-filter pass), the
    standard two-stage recall fix for quantization distortion."""
    import ray

    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    m, ksub, dsub = codebooks.shape
    luts = np.empty((len(qn), m, ksub))
    for j in range(m):
        qsub = qn[:, j * dsub:(j + 1) * dsub]          # (nq, dsub)
        c = codebooks[j]                               # (ksub, dsub)
        luts[:, j, :] = ((qsub[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    lref = ray.put(luts)
    excl = exclude_ids or set()
    shortlist = (rerank_factor * k) if rerank_ds is not None else k

    # plain task (see ivf_build.assign)
    def scan(batch: pa.Table) -> pa.Table:
            luts = ray.get(lref)
            ids = np.asarray(batch.column(id_col))
            col = batch.column("codes")
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            n = len(ids)
            if n == 0:
                return pa.table({"query_idx": pa.array([], pa.int32()),
                                 id_col: pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            codes = np.asarray(col.flatten()).reshape(n, m)
            keep = ~np.isin(ids, list(excl)) if excl else \
                np.ones(n, dtype=bool)
            ids, codes = ids[keep], codes[keep]
            if not len(ids):
                return pa.table({"query_idx": pa.array([], pa.int32()),
                                 id_col: pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            # dist (nq, n) = sum_j LUT[q, j, codes[:, j]]
            dist = np.zeros((luts.shape[0], len(ids)))
            for j in range(m):
                dist += luts[:, j, codes[:, j]]
            kk = min(shortlist, len(ids))
            part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(dist.shape[0], dtype=np.int32), kk)
            vi = ids[part.reshape(-1)]
            # report as similarity so _merge_topk's desc sort ranks
            # nearest first (unit vectors: ||a-b||^2 = 2 - 2 cos)
            sv = 1.0 - np.take_along_axis(dist, part, axis=1).reshape(-1) / 2.0
            return pa.table({"query_idx": pa.array(qi),
                             id_col: pa.array(vi),
                             "sim": pa.array(sv, pa.float64())})

    partials = codes_ds.map_batches(scan, batch_format="pyarrow")
    if rerank_ds is None:
        return _merge_topk(partials, k, id_col)
    # exact rerank: shortlist ids -> broadcast set -> one semi-filtered
    # exact pass over the raw vectors (reads only the shortlist rows
    # when the storage layout can push the id filter down)
    short = _merge_topk(partials, shortlist, id_col).to_pandas()
    id_set = set(short[id_col].tolist())
    sref = ray.put(pa.array(sorted(id_set)))

    def semi_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column(id_col),
                                     value_set=ray.get(sref)))

    cand = rerank_ds.map_batches(semi_filter, batch_format="pyarrow")
    return brute_force_topk(cand, queries, k=k, id_col=id_col,
                            emb_col=emb_col, exclude_ids=exclude_ids)


def ann_self_check(approx_ds, ds, queries: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   exclude_ids: set | None = None):
    """Per-query invariant rows for an approximate top-k result — the
    driver-visible self-validation of an op SQL cannot express.

    Returns ONE arrow row per query, ALL-INTEGER so the value hash is
    batch-layout-independent: ``k_returned``; ``brute_hits`` (overlap
    with an exact brute-force top-k run in the same plan — the recall
    numerator, floors pinned in pytest); ``max_sim_diff_e12`` — every
    approximate ``sim`` recomputed as an INDEPENDENT exact cosine from
    the raw vectors of just the returned ids (a tiny semi-filter pass),
    max |diff| scaled by 1e12 and truncated.  IVF/LSH/PQ-with-rerank all
    score candidates with true cosines, so the expected value is 0 (the
    recompute agrees to the last few ulps; anything >= 1e-12 is a real
    scoring bug, not BLAS blocking noise).  Cost: one extra exact scan —
    a correctness artifact, priced only at test scale (the approximate
    result itself is the production path)."""
    import pyarrow.compute as pc
    import ray

    ap = approx_ds.to_pandas()                     # nq * k rows — tiny
    nq = len(queries)
    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)

    # independent exact sims for every returned id (vectors fetched via
    # a broadcast-id semi-filter; never a corpus materialization)
    wanted = sorted(set(ap[id_col].tolist()))
    wref = ray.put(pa.array(wanted))

    def grab(batch: pa.Table) -> pa.Table:
        keys = ray.get(wref)
        return batch.filter(pc.is_in(batch.column(id_col), value_set=keys))

    sub = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    mat = np.asarray(sub[emb_col].tolist(), dtype=np.float64)
    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = (mat / norms) @ qn.T                    # (n_wanted, nq)
    row_of = {v: i for i, v in enumerate(sub[id_col].tolist())}
    exact = np.array([sims[row_of[v], q]
                      for v, q in zip(ap[id_col], ap["query_idx"])])
    ap = ap.assign(_diff=np.abs(ap["sim"].to_numpy() - exact))

    brute = brute_force_topk(ds, queries, k=k, id_col=id_col,
                             emb_col=emb_col,
                             exclude_ids=exclude_ids).to_pandas()
    btop = brute.groupby("query_idx")[id_col].apply(set)
    out = []
    for q in range(nq):
        g = ap[ap["query_idx"] == q]
        bset = btop.get(q, set())
        diff = float(g["_diff"].max()) if len(g) else 0.0
        out.append({
            "query_idx": q,
            "k_returned": len(g),
            "brute_hits": int(g[id_col].isin(bset).sum()),
            "max_sim_diff_e12": int(diff * 1e12),  # truncate: ulp-level
            # recompute noise (~1e-16) reads 0, a real bug (>=1e-12) >= 1
        })
    import pandas as pd

    o = pd.DataFrame(out)
    return pa.table({
        "query_idx": pa.array(o["query_idx"], pa.int32()),
        "k_returned": pa.array(o["k_returned"], pa.int64()),
        "brute_hits": pa.array(o["brute_hits"], pa.int64()),
        "max_sim_diff_e12": pa.array(o["max_sim_diff_e12"], pa.int64()),
    })
