"""Stateful alerting over ordered series — hysteresis + CUSUM.

The collector's alerting story is threshold OTTL conditions
(/root/reference/processor/filterprocessor/, stanza `filter`) — pure
per-row predicates.  Real monitoring pipelines need the two classic
STATEFUL detectors on top:

* **hysteresis** (Prometheus/Alertmanager `for`/resolve semantics,
  Nagios soft/hard states): an alert LATCHES when the value crosses a
  high-water mark and only clears below a low-water mark, so values
  oscillating inside the (lo, hi) band don't flap.
* **CUSUM** (Page 1954): the cumulative-sum change-point statistic
  ``s_t = max(0, s_{t-1} + (x_t - k))`` that accumulates evidence of a
  sustained upward mean shift and flags when it exceeds ``h``.

Both look sequential; both are exactly vectorizable, which is what
makes them one-shuffle batch operators instead of per-row actor state:

* the hysteresis state is "the SIGN OF THE LAST BAND CROSSING" — a
  grouped forward-fill of the nonzero crossing markers (+1 above hi,
  -1 below lo), default clear before any crossing.
* the CUSUM max-recursion telescopes: with ``P_t = Σ_{j<=t}(x_j - k)``
  (inclusive prefix sum), ``s_t = P_t - min(0, min_{j<=t} P_j)`` — a
  grouped cumsum and a grouped running-min.

All arithmetic is int64 on pre-scaled integer values (cents, micros),
so the distributed result is BIT-equal to a SQL window replay
regardless of block arrival order.  Scale shape: ONE bucketed
co-partition by series key (`bucketed_group_transform`); inside a
bucket everything is pandas groupby cumsum/cummin/ffill across ALL
keys at once — no per-key Python, and only (key, ts, order, value)
tuples ever shuffle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .aggregate import bucketed_group_transform


def threshold_alerts(ds, by: Sequence[str] | str, value_col: str,
                     ts_col: str = "ts", order_cols: Sequence[str] = (),
                     hi: int = 0, lo: int = 0, n_buckets: int = 64):
    """Latched high/low-water alerting per series.

    Appends two int64 columns: ``alert_state`` (+1 alerting, -1 clear)
    and ``alert_fired`` (1 exactly on the rows where the state flips
    clear -> alerting).  A row with ``value >= hi`` sets the state, a
    row with ``value <= lo`` clears it, anything inside the band keeps
    the previous state; every series starts clear.  ``value_col`` must
    be integer (scale floats upstream).
    """
    if not lo < hi:
        raise ValueError("need lo < hi for a hysteresis band")
    keys = [by] if isinstance(by, str) else list(by)
    order = [ts_col, *order_cols]

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*keys, *order], kind="mergesort") \
             .reset_index(drop=True)
        v = g[value_col].to_numpy()
        marker = np.where(v >= hi, 1.0, np.where(v <= lo, -1.0, np.nan))
        grp = g.assign(__m=marker).groupby(keys, sort=False)
        state = grp["__m"].ffill().fillna(-1.0).astype(np.int64)
        prev = state.groupby([g[k] for k in keys], sort=False) \
                    .shift(1).fillna(-1.0).astype(np.int64)
        return g.assign(
            alert_state=state,
            alert_fired=((state == 1) & (prev == -1)).astype(np.int64))

    return bucketed_group_transform(ds, keys, run, n_buckets=n_buckets)


def cusum_changes(ds, by: Sequence[str] | str, value_col: str,
                  ts_col: str = "ts", order_cols: Sequence[str] = (),
                  target_k: int = 0, threshold_h: int = 0,
                  n_buckets: int = 64):
    """One-sided (upward) CUSUM change detection per series.

    Appends ``cusum`` (the int64 statistic s_t) and ``is_change``
    (1 where s_t > threshold_h).  ``target_k`` is the reference value
    subtracted per observation (set it to the in-control mean plus the
    usual slack k = delta/2); ``value_col`` must be integer.
    """
    keys = [by] if isinstance(by, str) else list(by)
    order = [ts_col, *order_cols]

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*keys, *order], kind="mergesort") \
             .reset_index(drop=True)
        d = g[value_col].to_numpy().astype(np.int64) - np.int64(target_k)
        grp = g.assign(__d=d).groupby(keys, sort=False)["__d"]
        p = grp.cumsum().to_numpy()
        runmin = pd.Series(p).groupby([g[k] for k in keys], sort=False) \
                             .cummin().to_numpy()
        s = p - np.minimum(runmin, 0)
        return g.assign(cusum=s,
                        is_change=(s > np.int64(threshold_h))
                        .astype(np.int64))

    return bucketed_group_transform(ds, keys, run, n_buckets=n_buckets)
