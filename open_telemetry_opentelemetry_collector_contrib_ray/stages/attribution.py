"""Marketing-attribution over event streams, Ray-Data-first.

Attributes each CONVERSION event (e.g. `purchase`) to a TOUCH event
(e.g. `view`/`click`/`signup`) by the same user inside a lookback
window:

- model="last":  the latest touch strictly before the conversion
  (ties at the same timestamp break to the larger event id);
- model="first": the earliest touch at-or-after the window start and
  strictly before the conversion (ties break to the smaller event id).

Scale shape: ONE bucketed co-partition of conversions + touches by
user (`bucketed_group_transform`); inside each bucket both sides sort
once and a vectorized `pandas.merge_asof` (backward for last-touch,
forward-from-window-start for first-touch) resolves every conversion
without per-user Python loops.  Only (user, ts, type, id) tuples
shuffle — payload columns never ship.  This is "beyond the reference"
training/analytics functionality in the funnel/retention family
(stages/aggregate.py funnel), with SQL-window oracle twins.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def attribute_conversions(ds, conversion_type: str,
                          touch_types: Sequence[str],
                          window_us: int,
                          model: str = "last",
                          user_col: str = "user_id",
                          ts_col: str = "ts",
                          type_col: str = "event_type",
                          id_col: str = "event_id",
                          n_buckets: int = 64):
    """One attributed row per conversion event.

    Output columns: conv_id, user_id (typed as the inputs), conv_ts,
    touch_id / touch_type / touch_ts (null when no qualifying touch —
    "unattributed" conversions are kept, LEFT-join semantics).
    Window semantics: touch_ts in [conv_ts - window_us, conv_ts), the
    half-open lookback SQL states as ``t.ts >= c.ts - w AND t.ts < c.ts``.
    """
    if model not in ("last", "first"):
        raise ValueError(f"unknown attribution model: {model!r}")
    from .aggregate import bucketed_group_transform

    touch_set = list(touch_types)

    def prune(t: pa.Table) -> pa.Table:
        # only the 4 needed columns of conversion/touch rows shuffle
        m = pc.or_(pc.equal(t.column(type_col), conversion_type),
                   pc.is_in(t.column(type_col),
                            value_set=pa.array(touch_set)))
        return t.select([user_col, ts_col, type_col, id_col]).filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        is_conv = g[type_col] == conversion_type
        conv = g[is_conv].sort_values([ts_col, id_col],
                                      kind="mergesort").reset_index(drop=True)
        touch = g[~is_conv].sort_values([ts_col, id_col],
                                        kind="mergesort").reset_index(drop=True)
        conv = conv.rename(columns={id_col: "conv_id", ts_col: "conv_ts"}) \
                   .drop(columns=[type_col])
        touch = touch.rename(columns={id_col: "touch_id",
                                      type_col: "touch_type",
                                      ts_col: "touch_ts"})
        if conv.empty:
            out = conv.assign(touch_id=pd.Series(dtype="Int64"),
                              touch_type=pd.Series(dtype=object),
                              touch_ts=pd.Series(dtype="datetime64[us]"))
            return out[["conv_id", user_col, "conv_ts",
                        "touch_id", "touch_type", "touch_ts"]]
        tol = pd.Timedelta(window_us, unit="us")
        if model == "last":
            # latest touch with touch_ts < conv_ts and
            # touch_ts >= conv_ts - window: backward asof, exact excluded;
            # right sorted (ts, id) ascending -> equal-ts tie = max id
            m = pd.merge_asof(conv.sort_values("conv_ts", kind="mergesort"),
                              touch, left_on="conv_ts", right_on="touch_ts",
                              by=user_col, direction="backward",
                              allow_exact_matches=False, tolerance=tol)
        else:
            # earliest touch with touch_ts >= conv_ts - window: forward
            # asof from the window start (equal-ts tie = min id), then
            # require touch_ts < conv_ts (half-open upper bound)
            conv2 = conv.sort_values("conv_ts", kind="mergesort").copy()
            conv2["__wstart"] = (conv2["conv_ts"] - tol) \
                .astype(conv2["conv_ts"].dtype)  # keep the input's unit
            conv2 = conv2.sort_values("__wstart", kind="mergesort")
            m = pd.merge_asof(conv2, touch, left_on="__wstart",
                              right_on="touch_ts", by=user_col,
                              direction="forward", allow_exact_matches=True)
            bad = ~(m["touch_ts"] < m["conv_ts"])
            m.loc[bad, ["touch_id", "touch_type", "touch_ts"]] = \
                [pd.NA, None, pd.NaT]
            m = m.drop(columns="__wstart")
        m["touch_id"] = m["touch_id"].astype("Int64")  # no float NaN coercion
        return m[["conv_id", user_col, "conv_ts",
                  "touch_id", "touch_type", "touch_ts"]]

    return bucketed_group_transform(pruned, [user_col], attribute,
                                    n_buckets=n_buckets)


def attribute_weighted(ds, conversion_type: str,
                       touch_types: Sequence[str],
                       window_us: int,
                       model: str = "time_decay",
                       half_life_us: int = 86_400_000_000,
                       user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type",
                       id_col: str = "event_id",
                       n_buckets: int = 64):
    """Weighted multi-touch attribution over the half-open lookback
    [conv_ts - window, conv_ts); one row per (conversion, touch) pair,
    unattributed conversions kept once with typed-null touch + weight.

    - model="time_decay": raw weight 2**-(delta // half_life_us) —
      halves every half-life BUCKET (integer exponent, so every raw
      weight, their per-conversion sum, and the normalized share
      weight = raw / sum are float64-EXACT and order-independent;
      the identical integer-exponent rule replays in SQL as
      ``1.0 / (1 << (delta_us // half_life))``).  Requires
      ``window_us // half_life_us < 63``: past that the SQL BIGINT
      shift overflows while np.ldexp merely underflows (and at
      n >= 1075 every raw weight would hit 0.0, turning shares into
      0/0 NaN), so the bound is VALIDATED here rather than letting
      the two sides drift apart.
    - model="position" (U-shaped): touches ordered by (touch_ts,
      touch_id); k=1 -> 1.0, k=2 -> 0.5 each, k>=3 -> first 0.4,
      last 0.4, middles 0.2/(k-2).

    Same ONE co-partition-by-user shape as `attribute_linear`; only
    (user, ts, type, id) tuples shuffle."""
    if model not in ("time_decay", "position"):
        raise ValueError(f"unknown attribution model: {model!r}")
    if model == "time_decay":
        if half_life_us <= 0:
            raise ValueError(f"half_life_us must be > 0: {half_life_us}")
        n_max = window_us // half_life_us
        if n_max >= 63:
            raise ValueError(
                f"window_us // half_life_us = {n_max} >= 63: the "
                "integer-exponent decay rule no longer replays as a "
                "BIGINT shift (1 << n overflows) — use a larger "
                "half_life or a smaller window")
    from .aggregate import bucketed_group_transform

    touch_set = list(touch_types)

    def prune(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(t.column(type_col), conversion_type),
                   pc.is_in(t.column(type_col),
                            value_set=pa.array(touch_set)))
        return t.select([user_col, ts_col, type_col, id_col]).filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    out_cols = ["conv_id", user_col, "conv_ts",
                "touch_id", "touch_type", "touch_ts", "weight"]

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        is_conv = g[type_col] == conversion_type
        conv = g[is_conv].rename(
            columns={id_col: "conv_id", ts_col: "conv_ts"}) \
            .drop(columns=[type_col])
        touch = g[~is_conv].rename(
            columns={id_col: "touch_id", type_col: "touch_type",
                     ts_col: "touch_ts"})
        m = conv.merge(touch, on=user_col, how="inner")
        tol = pd.Timedelta(window_us, unit="us")
        in_win = (m["touch_ts"] < m["conv_ts"]) \
            & (m["touch_ts"] >= m["conv_ts"] - tol)
        mw = m[in_win].copy()
        if model == "time_decay":
            delta_us = (mw["conv_ts"].to_numpy(dtype="datetime64[us]")
                        .astype(np.int64)
                        - mw["touch_ts"].to_numpy(dtype="datetime64[us]")
                        .astype(np.int64))
            n = delta_us // half_life_us
            raw = np.ldexp(1.0, -n.astype(np.int64))
            mw["__raw"] = raw
            s = mw.groupby("conv_id", sort=False)["__raw"].transform("sum")
            mw["weight"] = mw["__raw"].to_numpy() / s.to_numpy()
            mw = mw.drop(columns="__raw")
        else:  # position
            mw = mw.sort_values(["conv_id", "touch_ts", "touch_id"],
                                kind="mergesort")
            grp = mw.groupby("conv_id", sort=False)
            k = grp["touch_id"].transform("size").to_numpy()
            pos = grp.cumcount().to_numpy() + 1
            w = np.where(k == 1, 1.0,
                         np.where(k == 2, 0.5,
                                  np.where((pos == 1) | (pos == k), 0.4,
                                           0.2 / np.maximum(k - 2, 1))))
            mw["weight"] = w
        missing = conv[~conv["conv_id"].isin(mw["conv_id"])].copy()
        missing["touch_id"] = pd.Series(dtype="Int64")
        missing["touch_type"] = None
        missing["touch_ts"] = pd.NaT
        missing["weight"] = np.nan
        out = pd.concat([mw, missing], ignore_index=True)
        out["touch_id"] = out["touch_id"].astype("Int64")
        return out[out_cols]

    return bucketed_group_transform(pruned, [user_col], attribute,
                                    n_buckets=n_buckets)


def attribute_linear(ds, conversion_type: str,
                     touch_types: Sequence[str],
                     window_us: int,
                     user_col: str = "user_id",
                     ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id",
                     n_buckets: int = 64):
    """Linear multi-touch attribution: EVERY touch in the half-open
    lookback [conv_ts - window, conv_ts) shares the conversion's
    credit equally — weight 1/k with k the conversion's qualifying
    touch count.  One row per (conversion, touch) pair; unattributed
    conversions kept once with null touch columns and null weight.

    Same one-co-partition shape as `attribute_conversions`; inside a
    bucket the pair expansion is ONE vectorized user-merge bounded by
    the window (each user's conversions x in-window touches — the
    inherent output size of the multi-touch model itself)."""
    from .aggregate import bucketed_group_transform

    touch_set = list(touch_types)

    def prune(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(t.column(type_col), conversion_type),
                   pc.is_in(t.column(type_col),
                            value_set=pa.array(touch_set)))
        return t.select([user_col, ts_col, type_col, id_col]).filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    out_cols = ["conv_id", user_col, "conv_ts",
                "touch_id", "touch_type", "touch_ts", "weight"]

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        is_conv = g[type_col] == conversion_type
        conv = g[is_conv].rename(
            columns={id_col: "conv_id", ts_col: "conv_ts"}) \
            .drop(columns=[type_col])
        touch = g[~is_conv].rename(
            columns={id_col: "touch_id", type_col: "touch_type",
                     ts_col: "touch_ts"})
        m = conv.merge(touch, on=user_col, how="inner")
        tol = pd.Timedelta(window_us, unit="us")
        in_win = (m["touch_ts"] < m["conv_ts"]) \
            & (m["touch_ts"] >= m["conv_ts"] - tol)
        mw = m[in_win].copy()
        k = mw.groupby("conv_id", sort=False)["touch_id"] \
            .transform("size")
        mw["weight"] = 1.0 / k
        missing = conv[~conv["conv_id"].isin(mw["conv_id"])].copy()
        missing["touch_id"] = pd.Series(dtype="Int64")
        missing["touch_type"] = None
        missing["touch_ts"] = pd.NaT
        missing["weight"] = np.nan
        out = pd.concat([mw, missing], ignore_index=True)
        out["touch_id"] = out["touch_id"].astype("Int64")
        return out[out_cols]

    return bucketed_group_transform(pruned, [user_col], attribute,
                                    n_buckets=n_buckets)
