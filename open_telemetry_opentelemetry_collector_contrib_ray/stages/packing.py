"""Sequence packing: greedy whole-document bin packing into fixed
token-capacity training contexts.

LLM pretraining pipelines concatenate documents into fixed-length
context windows ("sample packing", e.g. GPT/T5 data loaders); the
batch-side operation is: within a stream, walk documents in a
deterministic order and start a new bin whenever the next document
would overflow the token capacity (oversize documents get a solo
bin — splitting is the tokenizer's job downstream).

Ray-Data-first shape: packing is sequential WITHIN a stream but
embarrassingly parallel ACROSS streams, so the stream key
(`group_col`, e.g. `source`) is the partition key — one bucketed
shuffle co-locates each stream (stages/aggregate.py
bucketed_group_transform), then bins are assigned per stream with a
per-BIN searchsorted loop over the prefix-sum (O(#bins) python steps,
each vectorized — not O(#docs)).  That matches production practice:
packing is done per shard/stream, never globally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_bins(tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Greedy whole-item bin ids for items in the given order.

    A bin closes when the next item would push its fill past
    `capacity`; an item larger than `capacity` occupies a bin alone."""
    n = len(tokens)
    bins = np.zeros(n, dtype=np.int64)
    if n == 0:
        return bins
    prefix = np.cumsum(tokens.astype(np.int64))
    i = b = 0
    base = 0
    while i < n:
        j = int(np.searchsorted(prefix, base + capacity, side="right"))
        if j <= i:  # oversize item: solo bin
            j = i + 1
        bins[i:j] = b
        base = int(prefix[j - 1])
        b += 1
        i = j
    return bins


def pack_sequences(ds, capacity: int, token_col: str,
                   group_col: str = "source", order_cols=("doc_id",),
                   n_buckets: int = 64):
    """Assign each row a `bin_id` (per group) and `bin_offset` (token
    offset of the row inside its bin).  Rows shuffle ONCE by
    hash(group); each bucket is processed with one vectorized pandas
    pass across all its groups."""
    from .aggregate import bucketed_group_transform

    order = list(order_cols)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order, kind="stable") \
            .reset_index(drop=True)
        toks = g[token_col].to_numpy()
        bins = np.empty(len(g), dtype=np.int64)
        for _, idx in g.groupby(group_col, sort=False).indices.items():
            bins[idx] = pack_bins(toks[idx], capacity)
        g["bin_id"] = bins
        # token offset inside the bin: cumsum within (group, bin) minus
        # the row's own tokens
        csum = g.groupby([group_col, "bin_id"], sort=False)[token_col] \
            .cumsum().to_numpy()
        g["bin_offset"] = (csum - toks).astype(np.int64)
        return g

    return bucketed_group_transform(ds, [group_col], fn,
                                    n_buckets=n_buckets)
