"""Mergeable sketch aggregates: approximate heavy hitters + distinct counts.

The scale pattern (Aggregation guide): emit ONE serialized sketch per
batch inside map_batches, merge the (tiny) sketches in a second stage —
sketches are designed to be mergeable, so the shuffle moves kilobytes
regardless of input size.

- SpaceSaving (Metwally et al.'s deterministic heavy-hitter summary):
  capacity-bounded counter map; merge = counter addition + re-prune.
  Guarantee: any key with true count > N/capacity is retained, and
  estimates overshoot by at most the minimum evicted count.
- HyperLogLog (Flajolet et al.): 2^p registers of leading-zero maxima;
  merge = element-wise max; ~1.04/sqrt(2^p) relative error.

Both serialize to plain python structures (dict / bytes) inside an Arrow
binary column so they flow through the object store like any block.
"""

from __future__ import annotations

import hashlib
import pickle

import numpy as np
import pyarrow as pa


def _hash64(values: list) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    md5 = hashlib.md5
    for i, v in enumerate(values):
        out[i] = int.from_bytes(md5(str(v).encode()).digest()[8:16], "little")
    return out


# ----------------------------------------------------------- space-saving


def _ss_add(counters: dict, key, inc: int, capacity: int):
    if key in counters:
        counters[key] += inc
    elif len(counters) < capacity:
        counters[key] = inc
    else:
        m_key = min(counters, key=counters.get)
        m = counters.pop(m_key)
        counters[key] = m + inc  # overestimates by at most m


def _ss_merge(a: dict, b: dict, capacity: int) -> dict:
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    if len(out) > capacity:
        keep = sorted(out.items(), key=lambda kv: -kv[1])[:capacity]
        out = dict(keep)
    return out


def approx_top_k(ds, col: str, k: int = 10, capacity: int = 256):
    """Approximate top-k heavy hitters of a column.

    Per-batch SpaceSaving summaries (vectorized pre-count per batch, then
    bounded counter update) -> driver merge -> top-k.  Returns a pyarrow
    Table (key, est_count) sorted desc.  Exact for any key whose count
    exceeds N/capacity."""

    def summarize(batch: pa.Table) -> pa.Table:
        gb = batch.group_by([col]).aggregate([([], "count_all")])
        counters: dict = {}
        keys = gb.column(col).to_pylist()
        counts = gb.column("count_all").to_pylist()
        for key, cnt in zip(keys, counts):
            _ss_add(counters, key, cnt, capacity)
        return pa.table({"sketch": pa.array([pickle.dumps(counters)], pa.binary())})

    import ray

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    merged: dict = {}
    for row in parts:
        merged = _ss_merge(merged, pickle.loads(row["sketch"]), capacity)
    top = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return pa.table({col: pa.array([t[0] for t in top]),
                     "est_count": pa.array([t[1] for t in top], pa.int64())})


# ----------------------------------------------------------- hyperloglog


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        rank = np.zeros(len(h), dtype=np.uint8)
        remaining = rest
        mask = np.uint64(1) << np.uint64(63)
        val = remaining.copy()
        lz = np.full(len(h), 64 - self.p, dtype=np.uint8)
        nz = val != 0
        if nz.any():
            # position of highest set bit via float log2 (exact for < 2^53
            # after shifting; use bit-length via np.log2 on float is risky —
            # compute with a loop over 64 bits vectorized by halving)
            v = val[nz]
            pos = np.zeros(len(v), dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                big = v >= (np.uint64(1) << np.uint64(shift))
                pos[big] += shift
                v = np.where(big, v >> np.uint64(shift), v)
            lz_nz = (63 - pos).astype(np.uint8)
            lz[nz] = np.minimum(lz_nz, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one HLL per batch, merged on the
    driver (the mergeable-sketch tree-reduce)."""

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .sample import hash64

        h = HLL(p)
        # SQL count(DISTINCT) excludes NULL; vectorized non-oracle hash
        valid = batch.filter(pc.is_valid(batch.column(col)))
        if valid.num_rows:
            h.add_hashes(hash64(valid.column(col)))
        return pa.table({"sketch": pa.array([h.registers.tobytes()], pa.binary())})

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        other = HLL(p)
        other.registers = np.frombuffer(row["sketch"], dtype=np.uint8).copy()
        acc.merge(other)
    return acc.estimate()


# ------------------------------------------------- bottom-k quantile sample


def approx_quantile(ds, value_col: str, id_col: str,
                    qs=(0.5, 0.95, 0.99), k: int = 4096,
                    keys=None) -> "pa.Table":
    """Approximate quantiles from a DETERMINISTIC mergeable uniform
    sample: keep the k rows whose md5(id) is smallest (bottom-k by
    hash = a uniform without-replacement sample of the rows, stable
    across runs/retries); merge = concat + re-truncate to the k
    smallest.  Rank error is O(1/sqrt(k)) (~1.6% at k=4096).

    This is the 100 TB path for quantiles over a group too large for
    grouped_quantile's one-bucket-per-group contract: the shuffle moves
    at most k (hash, value) pairs per batch regardless of group size.
    With `keys`, returns one row per group (each group independently
    sampled, so skew cannot starve small groups).
    """
    import pyarrow.compute as pc

    keys = list(keys or [])

    def summarize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({**{kc: pa.array([], batch.column(kc).type)
                                for kc in keys},
                             "sketch": pa.array([], pa.binary())})
        h = _hash64(batch.column(id_col).to_pylist())
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if keys:
            import pandas as pd

            kf = batch.select(keys).to_pandas()
            kf["__h"], kf["__v"] = h, v
            rows_k, rows_s = {kc: [] for kc in keys}, []
            for kv, sub in kf.groupby(keys, sort=False, dropna=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                sub = sub.nsmallest(k, "__h")
                for kc, val in zip(keys, kv):
                    # pandas surfaces null keys as NaN; Arrow wants None
                    rows_k[kc].append(None if pd.isna(val) else val)
                rows_s.append(pickle.dumps(
                    (sub["__h"].to_numpy(), sub["__v"].to_numpy())))
            return pa.table({**{kc: pa.array(rows_k[kc]) for kc in keys},
                             "sketch": pa.array(rows_s, pa.binary())})
        order = np.argsort(h, kind="stable")[:k]
        return pa.table({"sketch": pa.array(
            [pickle.dumps((h[order], v[order]))], pa.binary())})

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    acc: dict[tuple, tuple] = {}
    for row in parts:
        kv = tuple(row[kc] for kc in keys)
        h, v = pickle.loads(row["sketch"])
        if kv in acc:
            h = np.concatenate([acc[kv][0], h])
            v = np.concatenate([acc[kv][1], v])
        order = np.argsort(h, kind="stable")[:k]
        acc[kv] = (h[order], v[order])
    out = {kc: [] for kc in keys}
    qcols: dict[str, list] = {f"p{int(q * 100):02d}": [] for q in qs}
    # None keys sort last (a bare sorted() raises TypeError on None vs str)
    for kv in sorted(acc, key=lambda t: tuple((v is None, v) for v in t)):
        _, v = acc[kv]
        sv = np.sort(v)
        for q in qs:
            idx = max(int(np.ceil(q * len(sv))) - 1, 0)
            qcols[f"p{int(q * 100):02d}"].append(sv[idx])
        for kc, val in zip(keys, kv):
            out[kc].append(val)
    return pa.table({**{kc: pa.array(out[kc]) for kc in keys},
                     **{c: pa.array(qcols[c]) for c in qcols}})


def approx_distinct_grouped(ds, keys, col: str, p: int = 12):
    """Per-group approximate COUNT(DISTINCT col) — the 100 TB path when
    exact grouped count-distinct (one shuffled row per distinct pair)
    is too wide: each batch collapses to ONE 2^p-byte HLL register set
    per key it saw, only (key, sketch) rows shuffle, and sketches merge
    per key (register-wise max — associative, so any combine tree
    works).  Standard error ~1.04/sqrt(2^p) (~1.6% at p=12).

    Returns one row per key: keys + `approx_distinct` (int64)."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(keys)

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key_types = {kc: batch.column(kc).type for kc in keys}
        # SQL count(DISTINCT x) ignores NULL x — so must the sketch
        batch = batch.filter(pc.is_valid(batch.column(col)))
        if batch.num_rows == 0:
            return pa.table({**{kc: batch.column(kc).slice(0, 0)
                                for kc in keys},
                             "sketch": pa.array([], pa.binary())})
        # ArrowDtype round-trip keeps int keys int (plain to_pandas
        # floats an int64 column that contains any null)
        kf = batch.select(keys).to_pandas(types_mapper=pd.ArrowDtype)
        # no oracle sees this hash -> vectorized Rust hash64, not the
        # per-row md5 loop (10M rows = 10M Python calls otherwise)
        from .sample import hash64

        kf["__h"] = hash64(batch.column(col))
        out_keys: dict = {kc: [] for kc in keys}
        sketches = []
        for kv, sub in kf.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            h = HLL(p)
            h.add_hashes(sub["__h"].to_numpy(dtype=np.uint64))
            for kc, v in zip(keys, kv):
                out_keys[kc].append(None if pd.isna(v) else v)
            sketches.append(h.registers.tobytes())
        return pa.table({**{kc: pa.array(out_keys[kc], type=key_types[kc])
                            for kc in keys},
                         "sketch": pa.array(sketches, pa.binary())})

    parts = ds.map_batches(summarize, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in g.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            acc = HLL(p)
            for b in sub["sketch"]:
                other = HLL(p)
                other.registers = np.frombuffer(b, dtype=np.uint8).copy()
                acc.merge(other)
            rows.append((*kv, int(round(acc.estimate()))))
        return pd.DataFrame(rows, columns=keys + ["approx_distinct"])

    return bucketed_group_transform(parts, keys, merge)


# ----------------------------------------------------------- count-min


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al. 2014) — derives
    the second hash of the Kirsch–Mitzenmacher double-hashing scheme from
    the first without touching the data again."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30)))
             * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27)))
             * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return (z ^ (z >> np.uint64(31))).astype(np.uint64)


class CMS:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a d x w int64
    counter matrix.  add = +count at h_i(key) mod w in every row i;
    estimate = min over rows (NEVER an underestimate — every counter a
    key touches holds its true count plus non-negative collision mass);
    merge = element-wise sum (associative, any combine tree).  Row
    hashes are h_i = a + i*b mod w with (a, b) = (hash64(key),
    splitmix64(a)) — the Kirsch–Mitzenmacher construction."""

    def __init__(self, w: int = 1024, d: int = 4):
        self.w, self.d = w, d
        self.m = np.zeros((d, w), dtype=np.int64)

    def _rows(self, a: np.ndarray) -> list:
        b = _splitmix64(a)
        out = []
        with np.errstate(over="ignore"):
            for i in range(self.d):
                out.append(((a + np.uint64(i) * b)
                            % np.uint64(self.w)).astype(np.int64))
        return out

    def add_hashed(self, a: np.ndarray, counts: np.ndarray):
        for i, idx in enumerate(self._rows(a)):
            np.add.at(self.m[i], idx, counts)

    def estimate_hashed(self, a: np.ndarray) -> np.ndarray:
        est = None
        for i, idx in enumerate(self._rows(a)):
            e = self.m[i][idx]
            est = e if est is None else np.minimum(est, e)
        return est

    def merge(self, other: "CMS") -> "CMS":
        self.m += other.m
        return self


def cms_counts(ds, col: str, w: int = 1024, d: int = 4) -> CMS:
    """Build one corpus-wide CMS over `col`: each batch pre-counts its
    keys (np.unique-style group_by) and collapses to ONE d*w*8-byte
    matrix; the constant-size partials merge by addition on the driver
    (kilobytes per batch regardless of input size — tree-reduce through
    an extra map stage if batch count ever makes even that wide)."""

    def summarize(batch: pa.Table) -> pa.Table:
        from .sample import hash64

        gb = batch.group_by([col]).aggregate([([], "count_all")])
        c = CMS(w, d)
        c.add_hashed(hash64(gb.column(col)),
                     gb.column("count_all").to_numpy())
        return pa.table({"sketch": pa.array([c.m.tobytes()], pa.binary())})

    acc = CMS(w, d)
    for row in ds.map_batches(summarize, batch_format="pyarrow").take_all():
        o = CMS(w, d)
        o.m = np.frombuffer(row["sketch"], dtype=np.int64).reshape(d, w).copy()
        acc.merge(o)
    return acc


class QDigest:
    """q-digest (Shrivastava et al. 2004): a deterministic mergeable
    quantile summary over the integer universe [0, 2**bits).

    Nodes are heap-numbered dyadic ranges (root=1, leaf for value v is
    v + 2**bits); compression collapses any (children + parent) group
    whose total is <= floor(n/k) into the parent, bottom-up, so size
    stays O(k * bits) while rank queries answer within
    eps*n = bits/k * n of the true rank — a WORST-CASE bound, unlike
    the probabilistic HLL/CMS guarantees.  merge = per-node count
    addition + one compress (associative up to structure; the error
    bound is preserved under any merge tree, which is what makes it a
    Ray-reduce-friendly partial).

    State is two sorted int64 arrays (ids, counts) + n; every step —
    add (np.unique), compress (one vectorized pass per level), rank
    scan (lexsort + cumsum) — is numpy, no per-node Python.
    """

    def __init__(self, bits: int = 20, k: int = 256):
        self.bits, self.k = bits, k
        self.ids = np.zeros(0, np.int64)
        self.cnt = np.zeros(0, np.int64)
        self.n = 0

    # -- construction ------------------------------------------------
    def add_values(self, vals: np.ndarray):
        vals = np.asarray(vals, np.int64)
        if not len(vals):
            return self
        if vals.min() < 0 or vals.max() >= (1 << self.bits):
            raise ValueError("value outside the digest universe")
        leaves, counts = np.unique(vals + (1 << self.bits),
                                   return_counts=True)
        self._absorb(leaves, counts.astype(np.int64))
        self.n += int(len(vals))
        self.compress()
        return self

    def _absorb(self, ids: np.ndarray, cnt: np.ndarray):
        ids = np.concatenate([self.ids, ids])
        cnt = np.concatenate([self.cnt, cnt])
        u, inv = np.unique(ids, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        self.ids, self.cnt = u, s

    def merge(self, other: "QDigest") -> "QDigest":
        if (other.bits, other.k) != (self.bits, self.k):
            raise ValueError("incompatible digests")
        self._absorb(other.ids, other.cnt)
        self.n += other.n
        self.compress()
        return self

    # -- compression -------------------------------------------------
    def compress(self):
        thr = self.n // self.k
        if thr <= 0 or not len(self.ids):
            return self
        ids, cnt = self.ids, self.cnt
        for d in range(self.bits, 0, -1):
            lvl = np.int64(1) << d
            sel = (ids >= lvl) & (ids < (lvl << 1))
            if not sel.any():
                continue
            ch_ids, ch_cnt = ids[sel], cnt[sel]
            rest_ids, rest_cnt = ids[~sel], cnt[~sel].copy()
            par = ch_ids >> 1
            upar, inv = np.unique(par, return_inverse=True)
            ch_sum = np.zeros(len(upar), np.int64)
            np.add.at(ch_sum, inv, ch_cnt)
            pos = np.searchsorted(rest_ids, upar)
            safe = np.minimum(pos, max(len(rest_ids) - 1, 0))
            has = (pos < len(rest_ids)) & (len(rest_ids) > 0)
            if len(rest_ids):
                has &= rest_ids[safe] == upar
            par_cnt = np.where(has, rest_cnt[safe] if len(rest_ids)
                               else 0, 0)
            collapse = (ch_sum + par_cnt) <= thr
            keep = ~collapse[inv]
            upd = has & collapse
            if upd.any():
                np.add.at(rest_cnt, pos[upd], ch_sum[upd])
            new = collapse & ~has
            ids = np.concatenate([rest_ids, ch_ids[keep], upar[new]])
            cnt = np.concatenate([rest_cnt, ch_cnt[keep], ch_sum[new]])
            order = np.argsort(ids, kind="stable")
            ids, cnt = ids[order], cnt[order]
        live = cnt > 0
        self.ids, self.cnt = ids[live], cnt[live]
        return self

    # -- queries -----------------------------------------------------
    def _ranges(self):
        depth = np.floor(np.log2(self.ids)).astype(np.int64)
        shift = self.bits - depth
        hi = ((self.ids + 1) << shift) - 1 - (np.int64(1) << self.bits)
        return depth, hi

    def quantile(self, q: float) -> int:
        """Smallest node max whose prefix mass reaches ceil(q*n), nodes
        scanned in (hi asc, deeper-first) order.  Guarantee: the true
        rank of the returned value is >= ceil(q*n) - eps*n and
        <= ceil(q*n) + eps*n with eps = bits/k."""
        if not len(self.ids):
            raise ValueError("empty digest")
        depth, hi = self._ranges()
        order = np.lexsort((-depth, hi))
        cum = np.cumsum(self.cnt[order])
        target = max(int(np.ceil(q * self.n)), 1)
        i = min(int(np.searchsorted(cum, target)), len(cum) - 1)
        return int(hi[order][i])

    @property
    def eps(self) -> float:
        return self.bits / self.k

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.bits, self.k, self.n,
                             self.ids, self.cnt))

    @classmethod
    def from_bytes(cls, b: bytes) -> "QDigest":
        bits, k, n, ids, cnt = pickle.loads(b)
        d = cls(bits, k)
        d.n, d.ids, d.cnt = n, ids, cnt
        return d


def qdigest_build(ds, col: str, bits: int = 20, k: int = 256,
                  scale: float = 1.0) -> QDigest:
    """One corpus-wide q-digest over ``floor(col * scale)``: each batch
    builds its own digest (np.unique + compress, already O(k*bits)
    bytes) and the constant-size partials merge on the driver — same
    kilobytes-per-batch contract as cms_counts, so the reduce is
    size-bounded at any corpus scale."""

    def summarize(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        v = np.floor(v.astype(np.float64) * scale).astype(np.int64)
        d = QDigest(bits, k)
        d.add_values(v)
        return pa.table({"sketch": pa.array([d.to_bytes()], pa.binary())})

    acc = QDigest(bits, k)
    for row in ds.map_batches(summarize, batch_format="pyarrow").take_all():
        acc.merge(QDigest.from_bytes(row["sketch"]))
    return acc


class ThetaSketch:
    """KMV / theta sketch (Beyer 2007; the Apache DataSketches theta
    family): keep the k smallest distinct 64-bit hashes; theta = the
    k-th smallest / 2^64 and the estimate is (k-1)/theta once
    saturated, exact below k.  Unlike HLL, retaining the SAMPLE of
    hashes makes SET OPERATIONS first-class: union = merge-and-trim,
    intersection = the shared hashes below min(theta) scaled by
    1/theta — an unbiased distinct-intersection estimator HLL cannot
    provide (inclusion–exclusion on HLL compounds error).  Mergeable:
    per-batch partials are <= k*8 bytes regardless of input size.
    """

    __slots__ = ("k", "hashes")
    _M = float(1 << 64)

    def __init__(self, k: int = 256, hashes: np.ndarray | None = None):
        self.k = int(k)
        self.hashes = (np.empty(0, np.uint64) if hashes is None
                       else np.asarray(hashes, np.uint64))

    def add_hashes(self, h: np.ndarray) -> "ThetaSketch":
        self.hashes = np.unique(np.concatenate(
            [self.hashes, np.asarray(h, np.uint64)]))[:self.k]
        return self

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        assert self.k == other.k
        return self.add_hashes(other.hashes)

    @property
    def theta(self) -> float:
        if len(self.hashes) < self.k:
            return 1.0
        # k-th smallest retained hash defines the sampling threshold
        return float(self.hashes[self.k - 1]) / self._M

    def estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        return ThetaSketch(self.k, self.hashes).merge(other)

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        th = min(self.theta, other.theta)
        cut = np.uint64(int(th * self._M)) if th < 1.0 else None
        a, b = self.hashes, other.hashes
        if cut is not None:
            a, b = a[a < cut], b[b < cut]
        common = np.intersect1d(a, b, assume_unique=True)
        return len(common) / th

    def to_bytes(self) -> bytes:
        return self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int) -> "ThetaSketch":
        return cls(k, np.frombuffer(data, np.uint64))


def theta_sketch(ds, col: str, k: int = 256) -> ThetaSketch:
    """Distributed theta-sketch build: each batch emits one <= k*8-byte
    partial (its k smallest hashes of the int64 column, SplitMix64 —
    version-stable, unlike library hashes); the driver merge-trims the
    partials streaming.  The column's values never leave their block."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        sk = ThetaSketch(k).add_hashes(
            _splitmix64(v.view(np.uint64)))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.large_binary())})

    acc = ThetaSketch(k)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for raw in b.column("sk"):
            acc.merge(ThetaSketch.from_bytes(raw.as_py(), k))
    return acc
