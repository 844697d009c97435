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

from .sample import bucket_column


def _pa_schema(ds) -> pa.Schema:
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(sch.names, sch.types)))


def bucketed_hash_join(left, right, on: Sequence[str], how: str = "inner",
                       n_buckets: int = 32, suffix: str = "_r"):
    """Join two Datasets on key columns via explicit hash co-partitioning.

    Both sides are tagged (side, bucket) and unioned; ONE shuffle
    co-locates each bucket; a pandas merge joins inside the bucket.
    Returns a Dataset with left columns + right non-key columns
    (clashes suffixed).

    Sizing contract: one bucket = one reduce task holding BOTH sides'
    bucket slices in memory — size n_buckets to ~total_join_bytes /
    256 MB (and at least the cluster's core count) so no single bucket
    exceeds a worker heap; salt hot keys upstream if one key dominates
    a bucket."""
    on = list(on)

    left_cols = left.schema().names
    right_cols = right.schema().names

    # pad both sides to one union schema (missing cols -> TYPED nulls, so
    # every block carries the identical schema and union() never degrades
    # to schema-less RefBundles); the merge step selects each side's real
    # columns
    types: dict[str, pa.DataType] = {}
    for f in list(_pa_schema(left)) + list(_pa_schema(right)):
        types.setdefault(f.name, f.type)
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: (t.column(c).cast(types[c]) if c in t.column_names
                        else pa.nulls(t.num_rows, type=types[c]))
                    for c in all_cols}
            # hash AFTER the cast to the unified key types: an int32 key on
            # one side must bucket identically to the int64 twin on the other
            b = bucket_column(pa.table({k: cols[k] for k in on}), n_buckets, on)
            cols["__bucket"] = b
            cols["__side"] = pa.array(np.full(t.num_rows, side == "l"), pa.bool_())
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")) \
        .repartition(n_buckets)  # coalesce: Ray's sort shuffle degrades on many tiny blocks

    def merge(g: pd.DataFrame) -> pd.DataFrame:  # noqa: D401
        lg = g[g["__side"]][left_cols]
        rg = g[~g["__side"]][right_cols]
        return lg.merge(rg, on=on, how=how, suffixes=("", suffix))

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


def native_join(left, right, on: Sequence[str], how: str = "inner",
                num_partitions: int = 32, suffix: str = "_r"):
    """Ray Data's built-in hash-shuffle join (Dataset.join) — the same
    co-partitioning idea as bucketed_hash_join executed by Ray's join
    operator.  Prefer this when both sides are large and the Ray version
    provides it; bucketed_hash_join stays as the portable, inspectable
    fallback (and the one that supports arbitrary key types uniformly).
    Benchmark note (BASELINE.md): measured head-to-head on the
    orders x customer join at sf0.1 per round so the default stays
    evidence-based."""
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=tuple(on), right_suffix=suffix)
