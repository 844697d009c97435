"""Sample-split range partitioning + exact global sort / global ranks.

The distributed total-order primitive (the TeraSort shape): when a
pipeline genuinely needs a global order — percentile rank columns,
sorted output files with disjoint key ranges, order-sensitive exports —
a single ``Dataset.sort`` is an opaque all-to-all.  This stage makes
the classic three-step structure explicit and cheap:

1. **Sample pass** (column-pruned, kilobyte partials): every batch
   emits an evenly-strided sample of its sort-key values; the driver
   pools them and picks ``n_parts - 1`` split points at even sample
   quantiles.  Splits are drawn BETWEEN distinct values, so all rows
   with an equal key land in the same range partition (ties never
   straddle a boundary — required for exact ranks).
2. **Count pass** (column-pruned, kilobyte partials): exact row count
   per range partition -> driver prefix sum = each partition's global
   rank offset.
3. **One shuffle**: rows move once, hash-partitioned by range-partition
   id (each range partition lands whole inside one bucket); inside a
   bucket one vectorized sort + per-partition cumcount, plus the
   broadcast offset, yields the exact global ``rank``.

At 100 TB the two metadata passes read ONE column each and ship only
samples/counts; the data moves exactly once.  Known caveat (documented,
inherent to range partitioning): a single key value with more rows than
a worker's heap makes a fat partition — pick a higher-cardinality key
or a composite key expression in that case.

Reference parity: this replaces the reference collector's implicit
"sorted file export" (fileexporter writes in arrival order; the stanza
pipeline has no total-order op) with the standard distributed-sort
construction, and gives SQL ``row_number() OVER (ORDER BY ...)``
semantics as an oracle-checkable column.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

_RPART = "__rpart"


def sample_splits(ds, col: str, n_parts: int,
                  per_batch: int = 64) -> np.ndarray:
    """ONE column-pruned pass: evenly-strided per-batch samples of
    ``col`` (<= per_batch values each, kilobyte partials) pooled on the
    driver; returns ``n_parts - 1`` ascending split values taken at
    even quantiles of the pooled sorted sample (deduplicated, so the
    returned array may be shorter when the key is low-cardinality)."""

    def sample(t: pa.Table) -> pa.Table:
        v = np.sort(t.column(col).to_numpy(zero_copy_only=False))
        if len(v) > per_batch:
            idx = np.linspace(0, len(v) - 1, per_batch).astype(np.int64)
            v = v[idx]
        return pa.table({"v": pa.array(v)})

    # stream per-batch samples to the driver with a hard pool cap: at
    # 1M-block scale the naive pool is 64M values — instead, once the
    # pool would exceed the cap, stride-decimate it (keeps the pooled
    # sample an (approximately) uniform subsample, which is all split
    # selection needs)
    cap = max(4096 * n_parts, 1 << 20)
    chunks: list[np.ndarray] = []
    total = 0
    for b in ds.select_columns([col]) \
               .map_batches(sample, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        chunks.append(b.column("v").to_numpy(zero_copy_only=False))
        total += len(chunks[-1])
        if total > 2 * cap:
            pool = np.concatenate(chunks)
            idx = np.linspace(0, len(pool) - 1, cap).astype(np.int64)
            chunks, total = [np.sort(pool)[idx]], cap
    pooled = np.sort(np.concatenate(chunks or [np.array([], np.int64)]))
    if len(pooled) == 0 or n_parts <= 1:
        return pooled[:0]
    idx = (np.arange(1, n_parts) * len(pooled)) // n_parts
    return np.unique(pooled[idx])


def range_partition_ids(values: np.ndarray, splits: np.ndarray) -> np.ndarray:
    """Partition id per value: number of splits <= value (side='right'),
    so every occurrence of an equal value gets the SAME partition."""
    return np.searchsorted(splits, values, side="right").astype(np.int64)


def global_sort_ranks(ds, col: str,
                      tiebreak: Sequence[str] = (),
                      n_parts: int = 32,
                      rank_col: str = "rank",
                      n_buckets: int = 32):
    """Append an exact 0-based global ``rank`` column ordering by
    ``(col, *tiebreak)`` — see the module docstring for the three-step
    shape.  ``(col, *tiebreak)`` should be unique per row for a
    deterministic total order.  Returns a Dataset with the input
    columns plus ``rank_col``; row order across blocks is arbitrary
    (the rank column IS the order — sort-free consumers downstream
    filter/join on it)."""
    import pandas as pd

    from .aggregate import bucketed_group_transform, grouped_agg

    tiebreak = list(tiebreak)
    splits = sample_splits(ds, col, n_parts)

    def add_part(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        return t.append_column(_RPART,
                               pa.array(range_partition_ids(v, splits),
                                        pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow")

    # exact per-partition counts (column-pruned second metadata pass)
    counts = grouped_agg(parted.select_columns([_RPART]), [_RPART],
                         [("count", None, "n")], combine="driver") \
        .to_pandas().sort_values(_RPART)
    offsets = np.zeros(len(splits) + 1, dtype=np.int64)
    np.add.at(offsets, counts[_RPART].to_numpy(), counts["n"].to_numpy())
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])

    def rank(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([_RPART, col] + tiebreak, kind="mergesort") \
             .reset_index(drop=True)
        within = g.groupby(_RPART, sort=False).cumcount().to_numpy()
        g[rank_col] = offsets[g[_RPART].to_numpy()] + within
        return g.drop(columns=_RPART)

    return bucketed_group_transform(parted, [_RPART], rank,
                                    n_buckets=n_buckets)
