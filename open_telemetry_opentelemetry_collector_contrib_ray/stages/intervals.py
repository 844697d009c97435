"""Keyed interval & sequence algebra: coalesce, gaps, change-points.

Three classic "islands and gaps" operators over per-key ordered data —
the downtime/uptime arithmetic every monitoring pipeline needs and the
reference collector leaves to its backend:

- ``merge_intervals``: coalesce overlapping/adjacent [start, end)
  intervals per key into maximal islands (alert windows -> outage
  spans, session fragments -> sessions).
- ``sequence_gaps``: find holes longer than a threshold in a per-key
  event stream (missed heartbeats), emitting one row per gap with its
  bounds.
- ``distinct_until_changed``: compress a state stream to its change
  points (keep a row only when the value differs from the key's
  previous row) — the streaming-state twin of SCD2 compaction.

All three are exactly vectorized across ALL keys inside ONE bucketed
co-partition (grouped shift / running-max prefix scans — no per-key
Python), and all are integer-exact, so each is bit-replayable by a SQL
window oracle.  Only (key, ts/bounds, value) columns ever shuffle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def merge_intervals(ds, keys: Sequence[str], start_col: str = "start",
                    end_col: str = "end", min_gap: int = 0,
                    n_buckets: int = 64):
    """Coalesce per-key intervals: two intervals belong to one island
    when the next start <= previous running max end + ``min_gap``
    (min_gap=0 merges touching intervals; >0 also bridges small gaps).
    Output: keys + ``start`` (island min), ``end`` (island max end),
    ``n_merged`` (input intervals absorbed).  Half-open or closed
    semantics are the caller's convention — the rule is pure integer
    comparison either way."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(keys)

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(keys + [start_col, end_col], kind="mergesort") \
             .reset_index(drop=True)
        gb = g.groupby(keys, sort=False, dropna=False)
        # running max end per key, shifted one row within the key: the
        # furthest coverage BEFORE this interval
        run_end = gb[end_col].cummax()
        prev_end = run_end.groupby(gb.ngroup().to_numpy()).shift(1)
        new_island = prev_end.isna() | (g[start_col] > prev_end + min_gap)
        island = new_island.cumsum()
        out = g.assign(__island=island).groupby(
            keys + ["__island"], sort=False, dropna=False).agg(
            start=(start_col, "min"), end=(end_col, "max"),
            n_merged=(start_col, "size")).reset_index() \
            .drop(columns="__island")
        out["n_merged"] = out["n_merged"].astype(np.int64)
        return out

    return bucketed_group_transform(ds, keys, merge, n_buckets=n_buckets)


def sequence_gaps(ds, keys: Sequence[str], ts_col: str = "ts",
                  min_gap: int = 1, n_buckets: int = 64):
    """Holes in a per-key event stream: one output row per consecutive
    pair of events more than ``min_gap`` apart — keys + ``gap_start``
    (the earlier ts), ``gap_end`` (the later ts), ``gap`` (the
    difference).  Duplicate timestamps produce zero-length steps and
    never flag.  The missed-heartbeat detector."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(keys)

    def gaps(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(keys + [ts_col], kind="mergesort") \
             .reset_index(drop=True)
        prev = g.groupby(keys, sort=False, dropna=False)[ts_col].shift(1)
        gap = g[ts_col] - prev
        hit = gap.notna() & (gap > min_gap)
        out = g.loc[hit, keys].copy()
        out["gap_start"] = prev[hit].astype(np.int64)
        out["gap_end"] = g.loc[hit, ts_col].astype(np.int64)
        out["gap"] = gap[hit].astype(np.int64)
        return out.reset_index(drop=True)

    return bucketed_group_transform(ds, keys, gaps, n_buckets=n_buckets)


def distinct_until_changed(ds, keys: Sequence[str],
                           order_cols: Sequence[str] | str,
                           value_cols: Sequence[str],
                           n_buckets: int = 64):
    """Compress a per-key state stream to its CHANGE POINTS: ordered by
    ``order_cols`` (give enough columns for a deterministic total order
    per key) within each key, keep a row iff any of ``value_cols``
    differs (null-aware: null -> value and value -> null both count)
    from the key's previous row; every key's first row is kept.  The
    inverse of forward-fill — turns sampled state into an SCD-style
    changelog."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys, value_cols = list(keys), list(value_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)

    def compress(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(keys + order_cols, kind="mergesort") \
             .reset_index(drop=True)
        gb = g.groupby(keys, sort=False, dropna=False)
        first = gb.cumcount().to_numpy() == 0
        changed = np.zeros(len(g), dtype=bool)
        for c in value_cols:
            prev = gb[c].shift(1)
            eq = (g[c] == prev) | (g[c].isna() & prev.isna())
            changed |= ~eq.to_numpy()
        return g[first | changed].reset_index(drop=True)

    return bucketed_group_transform(ds, keys, compress,
                                    n_buckets=n_buckets)


def out_of_order_depth(ds, key_cols: Sequence[str], ts_col: str = "ts",
                       arrival_col: str = "event_id",
                       n_buckets: int = 64):
    """Late-data / ingest-order audit — the batch form of streaming
    WATERMARK lateness: per key in ARRIVAL order (``arrival_col``, the
    ingest sequence, distinct from event time), each record's
    ``depth_us`` is how far its event time sits behind the key's
    event-time high-water mark among earlier arrivals
    (``max(0, prev_running_max_ts - ts)``; a key's first arrival and
    every new high-water mark read 0), plus a ``late`` flag.  This is
    what sizes a streaming pipeline's allowed-lateness window and
    quantifies ingest reordering at 100 TB.  Int64-exact; ONE bucketed
    co-partition, grouped cummax/shift vectorized across keys."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(key_cols)

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [arrival_col], kind="mergesort") \
             .reset_index(drop=True)
        gb = g.groupby(keys, sort=False, dropna=False)
        ts = g[ts_col].astype("int64")
        prev_max = ts.groupby([g[k] for k in keys],
                              sort=False).cummax().groupby(
            [g[k] for k in keys], sort=False).shift(1)
        d = (prev_max - ts).clip(lower=0).fillna(0).astype("int64")
        g["depth_us"] = d
        g["late"] = d > 0
        return g

    return bucketed_group_transform(ds, keys, depth, n_buckets=n_buckets)
