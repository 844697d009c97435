"""Change-data-capture merge: apply a changelog to a snapshot.

The lakehouse ``MERGE INTO`` / compaction primitive: given a base
snapshot and a stream of keyed change rows (each carrying a sequence
number and an op — upsert or delete), produce the new snapshot where

- the HIGHEST-sequence change per key wins,
- a winning delete removes the key,
- keys with no changes keep their base row,
- changelog keys absent from the base insert.

Ray-Data-first shape: base rows are tagged with sequence -infinity and
unioned with the changes; ONE bucketed co-partition by key then picks
each key's max-sequence row with a vectorized sort + groupby-tail
inside the bucket (no per-key Python, no driver materialization).  At
100 TB this is the standard one-shuffle compaction: both inputs move
once, output is partitionable by the same key hash for the next
incremental merge.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

_BASE_SEQ = -(1 << 62)


def cdc_merge(base, changes, keys: Sequence[str], seq_col: str,
              op_col: str = "op", delete_op: str = "D",
              n_buckets: int = 64):
    """Merge ``changes`` into ``base`` (see module docstring).

    ``base`` columns define the output schema (minus nothing);
    ``changes`` must carry the same payload columns plus ``seq_col``
    and ``op_col``.  Sequence values must be > _BASE_SEQ and unique
    per key (ties would make the winner order-dependent).
    """
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(keys)
    payload = [c for c in base.schema().names if c not in keys]

    def tag_base(t: pa.Table) -> pa.Table:
        return (t.append_column(seq_col,
                                pa.array(np.full(t.num_rows, _BASE_SEQ),
                                         pa.int64()))
                .append_column(op_col,
                               pa.array(["U"] * t.num_rows, pa.string())))

    def norm_changes(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keys + payload}
        cols[seq_col] = pa.compute.cast(t.column(seq_col), pa.int64())
        cols[op_col] = pa.compute.cast(t.column(op_col), pa.string())
        return pa.table(cols)

    both = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(norm_changes, batch_format="pyarrow"))

    def pick(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(keys + [seq_col], kind="stable")
        last = g.groupby(keys, sort=False, dropna=False).tail(1)
        keep = last[last[op_col] != delete_op]
        return keep[keys + payload].reset_index(drop=True)

    return bucketed_group_transform(both, keys, pick, n_buckets=n_buckets)
