"""Cross-RUN incremental dedup over the dbstorage backend.

The stanza fileconsumer pattern — "remember what previous runs already
consumed" (file.go known-offsets load/save, persisted through a storage
extension) — generalized from file offsets to RECORD IDENTITY: a
64-bit key-hash set persists in the sqlite ``DbStorage`` between runs,
and a new run drops rows whose key any previous run already emitted.
This is the batch form of a streaming pipeline's exactly-once dedup
across restarts, and the daily-increment form of corpus dedup (today's
crawl against all previous crawls) without re-reading old data.

Scale shape: the seen-set is hashes only (8 B/key — 1e8 keys = 800 MB,
not corpus bytes).  The filter is MAP-SIDE (sorted-array searchsorted
against one ray.put broadcast); new hashes reduce through per-batch
DISTINCT partials before one driver merge.  ``max_store_hashes``
guards the driver/store honestly — past it, shard the store by hash
range (one DbStorage key per range, the partitioned-manifest idiom)
and run one incremental_dedup per shard.

Caveats, stated: identity is a 64-bit hash (collision odds n²/2⁶⁵ —
~3e-4 at 1e8 keys); the polars hash64 kernel is deterministic per
polars version, so a store is valid for the pipeline environment that
wrote it (pin the environment with the store — the same contract as
any persisted shuffle layout).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa


def incremental_dedup(ds, store, key_cols: Sequence[str],
                      store_key: str = "seen_hashes",
                      max_store_hashes: int = 50_000_000):
    """Drop rows whose key hash is in ``store`` (previous runs), then
    persist the union of old + this run's new key hashes back.  Returns
    the filtered (materialized) Dataset; within-run duplicates are NOT
    collapsed — compose with ``dedup_exact`` when needed."""
    import ray

    from ..stages.sample import hash64

    keys = list(key_cols)
    raw = store.get(store_key)
    prev = np.frombuffer(raw, dtype=np.uint64) if raw else \
        np.array([], dtype=np.uint64)  # stored sorted

    pref = ray.put(prev)

    def drop_seen(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        seen = ray.get(pref)
        h = hash64(t, keys)
        if len(seen):
            idx = np.searchsorted(seen, h)
            idx[idx == len(seen)] = 0
            keep = seen[idx] != h
            if not keep.all():
                t = t.filter(pa.array(keep))
        return t

    out = ds.map_batches(drop_seen, batch_format="pyarrow").materialize()

    # collect this run's DISTINCT new hashes: per-batch distinct
    # partials (uint64 rows only), one driver merge
    def hash_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        return pa.table({"h": pa.array(np.unique(hash64(t, keys)))})

    parts = [ray.get(r) for r in out.map_batches(
        hash_partial, batch_format="pyarrow").materialize().to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if parts:
        new = np.unique(np.concatenate(
            [np.asarray(p.column("h")).astype(np.uint64) for p in parts]))
        merged = np.union1d(prev, new)
    else:
        merged = prev
    if len(merged) > max_store_hashes:
        raise ValueError(
            f"seen-hash store would hold {len(merged)} keys "
            f"(> max_store_hashes={max_store_hashes}); shard the store "
            "by hash range (one store key per range)")
    store.set(store_key, np.ascontiguousarray(merged).tobytes())
    return out
