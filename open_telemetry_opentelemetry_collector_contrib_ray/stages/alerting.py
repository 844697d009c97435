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


def burn_rate_alerts(ds, key_cols, ts_col: str = "ts",
                     bad_col: str = "bad", slo_target: float = 0.99,
                     short_us: int = 3_600_000_000,
                     long_us: int = 21_600_000_000,
                     bucket_us: int = 60_000_000,
                     burn_threshold: float = 2.0, n_buckets: int = 64):
    """Multiwindow, multi-burn-rate SLO alerting (the Google SRE
    workbook ch.5 rule): per key, bucket events to ``bucket_us``
    minutes, evaluate at every OBSERVED bucket the trailing error
    ratio over a SHORT and a LONG window, normalize by the error
    budget — burn = (bad_W / n_W) / (1 - slo_target) — and alert when
    BOTH windows exceed ``burn_threshold`` (the long window gates
    noise, the short window ends the alert quickly once the burn
    stops).

    Exactness: window sums are int64 via the composite-key prefix-sum
    trick (ONE searchsorted per window over (key_code * STRIDE +
    bucket) — no per-key Python, no dense bucket materialization, so a
    sparse 100 TB series stays sparse); the two float expressions are
    fixed-order and mirrored by the SQL oracle's RANGE-window replay.
    Returns keys + bucket + n/bad short/long sums + burn rates +
    alert."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(key_cols)
    wb_s = short_us // bucket_us
    wb_l = long_us // bucket_us
    if wb_s <= 0 or wb_l <= 0 or wb_s > wb_l:
        raise ValueError("need 0 < short_us <= long_us, both >= bucket_us")
    budget = 1.0 - slo_target
    if budget <= 0:
        raise ValueError(f"slo_target must be < 1: {slo_target}")

    def evaluate(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64")
        g = g.assign(bucket=ts // bucket_us)
        agg = g.groupby(keys + ["bucket"], sort=False).agg(
            n=(bad_col, "size"), bad=(bad_col, "sum")).reset_index()
        agg = agg.sort_values(keys + ["bucket"],
                              kind="mergesort").reset_index(drop=True)
        if len(keys) > 1:
            code = pd.factorize(pd.Series(
                list(zip(*(agg[k] for k in keys)))), sort=False)[0]
        else:
            code = pd.factorize(agg[keys[0]], sort=False)[0]
        b = agg["bucket"].to_numpy(dtype=np.int64)
        b0 = b.min() if len(b) else 0
        br = b - b0
        stride = (br.max() if len(br) else 0) + wb_l + 2
        comp = code.astype(np.int64) * stride + br
        n = agg["n"].to_numpy(dtype=np.int64)
        bad = agg["bad"].to_numpy(dtype=np.int64)
        cn, cb = np.cumsum(n), np.cumsum(bad)

        def window(wb):
            j = np.searchsorted(comp, comp - (wb - 1), side="left")
            wn = cn - np.where(j > 0, cn[np.maximum(j - 1, 0)], 0)
            wbad = cb - np.where(j > 0, cb[np.maximum(j - 1, 0)], 0)
            return wn, wbad

        ns, bs = window(wb_s)
        nl, bl = window(wb_l)
        burn_s = (bs.astype(np.float64) / ns.astype(np.float64)) / budget
        burn_l = (bl.astype(np.float64) / nl.astype(np.float64)) / budget
        agg["n_short"], agg["bad_short"] = ns, bs
        agg["n_long"], agg["bad_long"] = nl, bl
        agg["burn_short"], agg["burn_long"] = burn_s, burn_l
        agg["alert"] = (burn_s > burn_threshold) & (burn_l > burn_threshold)
        return agg.drop(columns=["n", "bad"])

    return bucketed_group_transform(ds, keys, evaluate,
                                    n_buckets=n_buckets)
