"""SQL window functions over partitioned groups, Ray-Data-first.

The reference engine has no window functions (its per-record model can't
see neighbors); a training-data pipeline needs them constantly —
per-user event ordering, inter-event deltas, peer ranking, trailing
aggregates.  This module generalizes the `bucketed_group_transform`
idiom (stages/aggregate.py): ONE hash shuffle co-locates each partition
key in a bucket, then every window function for every key in the bucket
computes in a single vectorized pandas pass — never one Python call per
key, never a global sort.

Scale notes:
- Rows shuffle once regardless of how many window specs are requested.
- Rank/dense_rank/percent_rank/cume_dist are computed from boundary
  masks on the bucket-sorted frame (no per-key rank() calls).
- moving_* frames are ``ROWS BETWEEN frame-1 PRECEDING AND CURRENT
  ROW`` and use pandas' Cython groupby-rolling.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import pandas as pd

__all__ = ["WindowSpec", "grouped_window"]

_KINDS = frozenset({
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "lag", "lead", "first_value", "last_value", "nth_value", "running_sum",
    "running_count", "moving_sum", "moving_avg", "moving_min",
    "moving_max", "time_sum", "time_avg", "time_min", "time_max",
    "time_count",
})


@dataclass(frozen=True)
class WindowSpec:
    """One window column: ``<kind>(col) OVER (PARTITION BY keys ORDER BY
    order_cols [ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW])``.

    kind      one of _KINDS
    col       value column (unused for row_number/rank family)
    out       output column name (defaults to kind or kind_col)
    offset    lag/lead distance (>=1); nth_value's 1-based n
    default   lag/lead fill for out-of-partition rows (None -> null)
    frame     moving_* trailing row count INCLUDING the current row
    range_us  time_* trailing window in microseconds, inclusive both
              ends: rows with ts in [t - range_us, t].  The first
              order column is the time axis; tie rows (equal ts) enter
              the frame in order-column position order (append a unique
              id to order_cols for determinism) — SQL RANGE frames
              instead include ALL peers; replay with a self-join +
              tiebreak, not a RANGE window (see the event_trailing
              oracle).
    """
    kind: str
    col: str | None = None
    out: str | None = None
    offset: int = 1
    default: object = None
    frame: int = 3
    range_us: int = 3_600_000_000

    def out_name(self) -> str:
        if self.out:
            return self.out
        return f"{self.kind}_{self.col}" if self.col else self.kind


def _order_boundaries(g: pd.DataFrame, keys: list[str],
                      orders: list[str], rn: np.ndarray) -> np.ndarray:
    """True where the ORDER-tuple differs from the previous row (or the
    partition starts).  Nulls compare equal (SQL peer semantics)."""
    changed = rn == 0
    for c in orders:
        s = g[c]
        prev = s.shift(1)
        sn = s.isna().to_numpy(dtype=bool)
        pn = prev.isna().to_numpy(dtype=bool)
        # raw inequality: nullable dtypes yield NA (fill False), numpy
        # NaN/NaT yield True — both get overridden by the null logic:
        # exactly-one-side-null = boundary, both-null = peers
        ne = s.ne(prev).fillna(False).to_numpy(dtype=bool)
        ne |= sn ^ pn
        ne &= ~(sn & pn)
        changed = changed | ne
    return changed


def grouped_window(ds, keys: Sequence[str], order_cols: Sequence[str],
                   specs: Sequence[WindowSpec], n_buckets: int = 64):
    """Append every spec's window column.  `order_cols` should be a
    TOTAL order (append a unique id) when row_number/lag/lead output
    must be deterministic; the rank family is tie-stable either way."""
    from .aggregate import bucketed_group_transform

    keys, orders = list(keys), list(order_cols)
    specs = list(specs)
    for s in specs:
        if s.kind not in _KINDS:
            raise ValueError(f"unknown window kind {s.kind!r}")
        if s.kind not in ("row_number", "rank", "dense_rank",
                          "percent_rank", "cume_dist", "running_count",
                          "time_count") and s.col is None:
            raise ValueError(f"{s.kind} needs a value column")
        if s.kind in ("lag", "lead", "nth_value") and s.offset < 1:
            raise ValueError(f"{s.kind} offset must be >= 1")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + orders, kind="stable").reset_index(drop=True)
        # dropna=False: a NULL partition key is its own partition (SQL
        # semantics); the default silently yields NaN cumcounts that cast
        # to INT64_MIN garbage for the null-key rows
        gb = g.groupby(keys, sort=False, dropna=False)
        rn = gb.cumcount().to_numpy()
        need_rank = any(s.kind in ("rank", "dense_rank", "percent_rank",
                                   "cume_dist") for s in specs)
        if need_rank:
            changed = _order_boundaries(g, keys, orders, rn)
            # rank: 1+rn at each boundary, forward-filled across peers
            # (partitions always start at a boundary, so ffill is safe)
            rank = pd.Series(
                np.where(changed, rn + 1.0, np.nan)).ffill().to_numpy()
            cs = np.cumsum(changed)
            start_cs = pd.Series(
                np.where(rn == 0, cs - 1.0, np.nan)).ffill().to_numpy()
            dense = cs - start_cs
            n_part = gb[keys[0]].transform("size").to_numpy().astype(np.int64)
            if any(s.kind == "cume_dist" for s in specs):
                nxt = np.empty(len(g), dtype=bool)
                nxt[:-1] = changed[1:]
                nxt[-1] = True
                # rows <= this order-tuple within the partition = the
                # last peer's 1-based position, back-filled over peers
                le = pd.Series(
                    np.where(nxt, rn + 1.0, np.nan)).bfill().to_numpy()
        for s in specs:
            out = s.out_name()
            if s.kind == "row_number":
                g[out] = (rn + 1).astype("int64")
            elif s.kind == "rank":
                g[out] = rank.astype("int64")
            elif s.kind == "dense_rank":
                g[out] = dense.astype("int64")
            elif s.kind == "percent_rank":
                g[out] = np.where(n_part > 1, (rank - 1.0) / (n_part - 1),
                                  0.0)
            elif s.kind == "cume_dist":
                g[out] = le / n_part
            elif s.kind in ("lag", "lead"):
                off = s.offset if s.kind == "lag" else -s.offset
                v = gb[s.col].shift(off)
                g[out] = v if s.default is None else v.fillna(s.default)
            elif s.kind == "first_value":
                g[out] = gb[s.col].transform("first")
            elif s.kind == "last_value":
                g[out] = gb[s.col].transform("last")
            elif s.kind == "nth_value":
                # positional ROWS frame (unbounded preceding .. current
                # row) over the TOTAL order, like row_number/lag/lead:
                # null until the partition's n-th order row is reached.
                # SQL's default RANGE frame also includes order-peers of
                # the current row — replay with an explicit ROWS frame
                # (+ unique tiebreaker), as tests/test_window.py does.
                # Series.where keeps the column dtype (NaT for
                # datetimes) where np.where would fail to promote.
                v = g[s.col].where(rn == s.offset - 1)
                g[out] = v.groupby(gb.ngroup(), sort=False).ffill()
            elif s.kind == "running_sum":
                g[out] = gb[s.col].cumsum()
            elif s.kind == "running_count":
                g[out] = (rn + 1).astype("int64")
            elif s.kind.startswith("time_"):
                agg = {"avg": "mean"}.get(s.kind[5:], s.kind[5:])
                ts = g[orders[0]]
                if not pd.api.types.is_datetime64_any_dtype(ts):
                    ts = pd.to_datetime(ts, unit="us")
                col = s.col if s.col is not None else orders[0]
                # a NULL time has no frame -> null result (pandas
                # time-rolling refuses NaT outright); valid rows stay
                # contiguous per group because the key sort above puts
                # NaT last within each partition
                valid = ts.notna().to_numpy(dtype=bool)
                vals = np.full(len(g), np.nan)
                if valid.any():
                    gv = g[valid]
                    w = pd.DataFrame({"__ts": ts.to_numpy()[valid],
                                      "__v": gv[col].to_numpy()})
                    for i, k in enumerate(keys):
                        w[f"__k{i}"] = gv[k].to_numpy()
                    r = w.groupby([f"__k{i}" for i in range(len(keys))],
                                  sort=False, dropna=False) \
                        .rolling(pd.Timedelta(microseconds=s.range_us),
                                 on="__ts", closed="both")["__v"].agg(agg)
                    # time-rolling indexes by (keys..., __ts) — __ts
                    # ties make the labels non-unique, so align
                    # positionally: g is key-sorted and sort=False keeps
                    # first-appearance group order, so r is already in
                    # the valid subset's row order
                    vals[valid] = r.to_numpy()
                if agg == "count" or (agg in ("sum", "min", "max") and
                                      pd.api.types.is_integer_dtype(g[col])):
                    # nullable Int64 keeps one arrow schema whether or
                    # not the bucket saw null timestamps
                    g[out] = pd.array(vals, dtype="Float64").astype("Int64")
                else:
                    g[out] = vals
            else:  # moving_*
                agg = s.kind.removeprefix("moving_")
                agg = {"avg": "mean"}.get(agg, agg)
                r = gb[s.col].rolling(s.frame, min_periods=1).agg(agg)
                # g is key-sorted, so group results concatenate back in
                # ascending original-index order; sort_index() restores
                # row alignment regardless
                g[out] = r.reset_index(level=list(range(len(keys))),
                                       drop=True).sort_index()
                if agg in ("sum", "min", "max") and \
                        pd.api.types.is_integer_dtype(g[s.col]):
                    g[out] = g[out].astype("int64")
        return g

    return bucketed_group_transform(ds, keys, run, n_buckets)
