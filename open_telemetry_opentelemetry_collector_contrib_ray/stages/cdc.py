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


def point_in_time_join(facts, dims, keys: Sequence[str], ts_col: str,
                       payload: Sequence[str],
                       valid_from: str = "valid_from",
                       valid_to: str = "valid_to",
                       n_buckets: int = 64):
    """Temporal dimension lookup: attach to every fact row the dim
    VERSION valid at the fact's timestamp — ``valid_from <= ts <
    valid_to`` (half-open, open current versions have null valid_to).
    Facts whose key has no version covering ts (before the first
    version, or in a gap after a delete closed one) keep typed-null
    payload.  The consumer of `scd2_history`: point-in-time-correct
    enrichment for ML feature backfill / as-was reporting.

    Scale shape: both inputs move ONCE through a bucketed co-partition
    by key; inside a bucket ONE vectorized ``merge_asof`` (backward on
    the version start) resolves every fact against every key at once,
    then expired matches (``valid_to <= ts``) are nulled.  Only keys +
    ts + payload columns shuffle.  ``ts_col`` and ``valid_from`` must
    be non-null int64-castable.

    Output = all fact columns + ``payload`` + ``valid_from`` (the
    matched version's identity, null when unmatched).
    """
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys, payload = list(keys), list(payload)
    fs, ds_ = facts.schema(), dims.schema()
    fact_types = dict(zip(fs.names, fs.types))
    dim_types = dict(zip(ds_.names, ds_.types))
    fact_extra = [c for c in fs.names if c not in keys]
    dim_cols = payload + [valid_from, valid_to]

    def _null(n: int, name: str, types: dict) -> pa.Array:
        return pa.nulls(n, types[name])

    def tag_facts(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keys + fact_extra}
        cols["__t"] = pa.compute.cast(t.column(ts_col), pa.int64())
        for c in dim_cols:
            cols[c] = _null(t.num_rows, c, dim_types)
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_dims(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keys}
        for c in fact_extra:
            cols[c] = _null(t.num_rows, c, fact_types)
        cols["__t"] = pa.compute.cast(t.column(valid_from), pa.int64())
        for c in dim_cols:
            cols[c] = t.column(c)
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    both = facts.map_batches(tag_facts, batch_format="pyarrow").union(
        dims.map_batches(tag_dims, batch_format="pyarrow"))

    def _recast(s: "pd.Series", typ) -> "pd.Series":
        if pa.types.is_integer(typ):
            return s.astype("Int64")
        if pa.types.is_floating(typ):
            return s.astype("float64")
        return s.astype(object).where(s.notna(), None)

    def pit(g: "pd.DataFrame") -> "pd.DataFrame":
        f = g[g["__side"] == 0].sort_values("__t", kind="mergesort")
        d = g[g["__side"] == 1].sort_values("__t", kind="mergesort")
        m = pd.merge_asof(
            f[keys + fact_extra + ["__t"]].reset_index(drop=True),
            d[keys + ["__t"] + dim_cols].reset_index(drop=True),
            on="__t", by=keys, direction="backward")
        expired = m[valid_to].notna() & (m[valid_to] <= m["__t"])
        for c in payload + [valid_from]:
            m[c] = _recast(m[c].mask(expired), dim_types[c])
        # the union's dim-side nulls widened int fact columns to float
        # in the pandas bucket — restore the fact schema's types
        for c in fact_extra:
            m[c] = _recast(m[c], fact_types[c])
        return m[keys + fact_extra + payload + [valid_from]] \
            .reset_index(drop=True)

    return bucketed_group_transform(both, keys, pit, n_buckets=n_buckets)


def table_diff(left, right, keys: Sequence[str],
               compare_cols: Sequence[str], n_buckets: int = 64):
    """Keyed reconciliation of two snapshots (data-diff / audit).

    Emits one row per key present in either side: the key columns, a
    ``status`` of ``added`` (right only) / ``removed`` (left only) /
    ``changed`` (both sides, any compare column differs, null-aware) /
    ``same``, and one int64 ``chg_<col>`` flag per compare column (1
    only when both sides have the key and that column differs).  The
    validation twin of `cdc_merge`: run it after a merge to prove the
    produced snapshot against an independently-built one.

    Keys must be unique per side (these are snapshots, not logs).
    Scale shape: both inputs move ONCE through a bucketed co-partition
    by key; each bucket runs one vectorized outer merge + null-aware
    column compares — only keys + compare columns ever shuffle, and the
    output is one row per key (the reconciliation report), never wider
    than the inputs.
    """
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys, cmp_cols = list(keys), list(compare_cols)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(keys + cmp_cols)
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side), pa.int8()))
        return f

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def diff(g: "pd.DataFrame") -> "pd.DataFrame":
        l = g[g["__side"] == 0][keys + cmp_cols]
        r = g[g["__side"] == 1][keys + cmp_cols]
        m = l.merge(r, on=keys, how="outer", suffixes=("__l", "__r"),
                    indicator=True)
        present_both = (m["_merge"] == "both").to_numpy()
        status = np.where(m["_merge"] == "right_only", "added",
                          np.where(m["_merge"] == "left_only", "removed",
                                   "same")).astype(object)
        out = {k: m[k] for k in keys}
        chg_any = np.zeros(len(m), dtype=bool)
        for c in cmp_cols:
            a, b = m[f"{c}__l"], m[f"{c}__r"]
            eq = (a == b) | (a.isna() & b.isna())
            f = (~eq.to_numpy()) & present_both
            chg_any |= f
            out[f"chg_{c}"] = f.astype(np.int64)
        status[present_both & chg_any] = "changed"
        out["status"] = status
        return pd.DataFrame(out)[keys + ["status"]
                                 + [f"chg_{c}" for c in cmp_cols]]

    return bucketed_group_transform(both, keys, diff, n_buckets=n_buckets)


def scd2_history(changes, keys: Sequence[str], seq_col: str,
                 payload: Sequence[str], op_col: str = "op",
                 delete_op: str = "D", n_buckets: int = 64):
    """Slowly-changing-dimension type-2 history from a changelog.

    Every upsert becomes one VERSION row: keys + payload +
    ``valid_from`` (its own sequence) + ``valid_to`` (the sequence of
    the key's NEXT change of any op — null while the version is still
    open) + ``is_current`` (int64; a version is current iff nothing
    superseded it, so a trailing delete closes the last version and
    leaves the key with no current row).  Delete rows close intervals
    but emit nothing themselves.

    Sequence values must be unique per key.  ONE bucketed co-partition
    by key; inside a bucket the successor lookup is a single vectorized
    groupby-shift(-1) over all keys at once.
    """
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys, payload = list(keys), list(payload)

    def hist(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(keys + [seq_col], kind="mergesort") \
             .reset_index(drop=True)
        nxt = g.groupby(keys, sort=False, dropna=False)[seq_col].shift(-1)
        g = g.assign(valid_from=g[seq_col], valid_to=nxt,
                     is_current=nxt.isna().astype(np.int64))
        g = g[g[op_col] != delete_op]
        return g[keys + payload
                 + ["valid_from", "valid_to", "is_current"]] \
            .reset_index(drop=True)

    return bucketed_group_transform(changes, keys, hist,
                                    n_buckets=n_buckets)
