"""Joins, Ray-Data-first.

The reference has no general relational joins (SURVEY.md §2.8) — only
broadcast lookup enrich (LookupEnricher) and stream-stream pairing on a
shared key (adjacent_pairs).  A complete data-processing engine needs
the large✕large case too, so this module provides the explicit
partitioned hash join:

    add bucket = hash(key) % B to both sides  ->  one shuffle each
    groupby(bucket) over the union            ->  pandas merge per bucket

This is the portable pattern (works on any Ray version, any key type,
and makes the partitioning assumption explicit — B and the hash are the
documented contract; salt hot keys upstream if a bucket overflows).
`Dataset.join` (hash-partitioned) exists in this Ray version and can be
swapped in; the explicit form is kept as the primary implementation so
the shuffle behavior is inspectable and portable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _md5_lower64


def bucketed_hash_join(left, right, on: Sequence[str], how: str = "inner",
                       n_buckets: int = 32, suffix: str = "_r"):
    """Join two Datasets on key columns via explicit hash co-partitioning.

    Both sides are tagged (side, bucket) and unioned; ONE shuffle
    co-locates each bucket; a pandas merge joins inside the bucket.
    Returns a Dataset with left columns + right non-key columns
    (clashes suffixed)."""
    on = list(on)

    left_cols = left.schema().names
    right_cols = right.schema().names
    clash = (set(left_cols) & set(right_cols)) - set(on)

    # pad both sides to one union schema (missing cols -> nulls) so union()
    # sees a single schema; the merge step selects each side's real columns
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag(side: str, own_schema: pa.Schema, other_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = t.column(on[0]).cast(pa.string())
            if len(on) > 1:
                parts = []
                sep = pa.repeat(pa.scalar("\x1f"), t.num_rows)
                for k in on:
                    parts.extend([t.column(k).cast(pa.string()), sep])
                key = pc.binary_join_element_wise(*parts[:-1], "")
            b = (_md5_lower64(key.to_pylist()) % np.uint64(n_buckets)).astype(np.int32)
            cols = {c: (t.column(c) if c in t.column_names else pa.nulls(t.num_rows))
                    for c in all_cols}
            cols["__bucket"] = pa.array(b)
            cols["__side"] = pa.repeat(pa.scalar(side), t.num_rows)
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag("l", None, right_cols), batch_format="pyarrow").union(
        right.map_batches(tag("r", None, left_cols), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][left_cols]
        rg = g[g["__side"] == "r"][right_cols]
        return lg.merge(rg, on=on, how=how, suffixes=("", suffix))

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")
