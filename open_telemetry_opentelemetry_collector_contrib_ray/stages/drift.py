"""Distribution drift: Population Stability Index between two windows.

The standard production-ML / data-quality drift check: bin a numeric
column with FIXED edges, compare the bin distribution of a baseline
window against a current window, and score

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

(PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action).  Bin
probabilities are Laplace-smoothed — p_i = (c_i + 1) / (n + B) with B =
number of bins — so empty bins are well-defined without an epsilon
fudge and the whole statistic is exactly replayable in SQL.

Scale shape: bin assignment is one map-side searchsorted against the
broadcast edge array; what shuffles is a CONSTANT-SIZE partial — one
(window, bin) count row per batch — so drift over 100 TB costs one
column-pruned pass.  Output is per-bin rows (counts, smoothed p/q, the
PSI contribution); the total is the sum of ``contrib``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def psi_drift(ds, value_col: str, window_col: str,
              edges: Sequence[int | float]):
    """PSI between window 0 (baseline) and window 1 (current) of
    ``ds`` — ``window_col`` must be 0/1 int.  ``edges`` are ascending
    interior bin edges: bin_id = number of edges <= value, giving
    len(edges)+1 bins covering the whole line.  Returns one row per
    bin: ``bin_id, c_base, c_cur, p_base, p_cur, contrib`` (all bins
    emitted, including empty ones)."""
    from .aggregate import grouped_agg

    edges_arr = np.asarray(list(edges), dtype=np.float64)
    if np.any(np.diff(edges_arr) <= 0):
        raise ValueError("edges must be strictly ascending")
    n_bins = len(edges_arr) + 1

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = t.column(window_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = np.searchsorted(edges_arr, v, side="right")
        key = w * n_bins + b
        cnt = np.bincount(key, minlength=2 * n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"win": pa.array(nz // n_bins, pa.int64()),
                         "bin_id": pa.array(nz % n_bins, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["win", "bin_id"], [("sum", "c", "c")],
                         combine="driver").to_pandas()
    c = np.zeros((2, n_bins), dtype=np.int64)
    c[counts["win"].to_numpy(), counts["bin_id"].to_numpy()] = \
        counts["c"].to_numpy()
    n = c.sum(axis=1)
    p = (c[0] + 1.0) / (n[0] + n_bins)
    q = (c[1] + 1.0) / (n[1] + n_bins)
    contrib = (p - q) * np.log(p / q)
    return pa.table({
        "bin_id": pa.array(np.arange(n_bins), pa.int64()),
        "c_base": pa.array(c[0], pa.int64()),
        "c_cur": pa.array(c[1], pa.int64()),
        "p_base": pa.array(p, pa.float64()),
        "p_cur": pa.array(q, pa.float64()),
        "contrib": pa.array(contrib, pa.float64())})


_BENFORD_P = np.log10(1.0 + 1.0 / np.arange(1, 10))


def benford_audit(ds, value_col: str):
    """First-digit (Benford's law) audit of a positive integer column —
    the classic fabricated-data / unit-mixup detector: naturally
    occurring multi-scale quantities have first-digit frequencies
    log10(1 + 1/d); a flat or spiked profile flags synthetic or
    corrupted values.

    One map-side pass: first digit by decimal string slice (exact,
    SQL-identical), 9-bucket count partials (constant size) shuffle,
    nothing else moves.  Non-positive values are EXCLUDED (Benford is
    defined on positive magnitudes).  Output: one row per digit 1..9
    with observed count, observed probability, Benford expectation and
    the chi-square contribution (obs - exp_count)^2 / exp_count.
    """
    import pyarrow.compute as pc

    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        pos = t.filter(pc.greater(v, pa.scalar(0)))
        s = pc.cast(pos.column(value_col), pa.string())
        d1 = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cnt = np.bincount(d1, minlength=10)[1:10]
        nz = np.flatnonzero(cnt)
        return pa.table({"digit": pa.array(nz + 1, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["digit"], [("sum", "c", "c")],
                         combine="driver").to_pandas()
    c = np.zeros(9, dtype=np.int64)
    c[counts["digit"].to_numpy() - 1] = counts["c"].to_numpy()
    n = c.sum()
    exp_c = _BENFORD_P * n
    obs_p = c / n if n else np.zeros(9)
    chi2 = (c - exp_c) ** 2 / exp_c if n else np.zeros(9)
    return pa.table({
        "digit": pa.array(np.arange(1, 10), pa.int64()),
        "c": pa.array(c, pa.int64()),
        "obs_p": pa.array(obs_p, pa.float64()),
        "benford_p": pa.array(_BENFORD_P, pa.float64()),
        "chi2_contrib": pa.array(chi2, pa.float64())})


def two_proportion_ztest(ds, variant_col: str, flag_col: str):
    """A/B experiment readout: pooled two-proportion z-test between
    variant 0 and variant 1 over a 0/1 success flag (one row per
    UNIT — dedupe to units upstream).

        z = (r0 - r1) / sqrt(p*(1-p) * (1/n0 + 1/n1)),  p pooled.

    One map-side pass of four-int partials (n, successes per variant),
    zero data shuffle; the float expression is fixed-order, so the
    result replays exactly in SQL.  Returns one row: n0, n1, conv0,
    conv1, rate0, rate1, z (z is null when either arm is empty or the
    pooled rate is degenerate 0 or 1)."""
    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        w = t.column(variant_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = t.column(flag_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "n0": pa.array([int((w == 0).sum())], pa.int64()),
            "n1": pa.array([int((w == 1).sum())], pa.int64()),
            "conv0": pa.array([int(f[w == 0].sum())], pa.int64()),
            "conv1": pa.array([int(f[w == 1].sum())], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .sum(["n0", "n1", "conv0", "conv1"])
    n0, n1 = int(agg["sum(n0)"]), int(agg["sum(n1)"])
    c0, c1 = int(agg["sum(conv0)"]), int(agg["sum(conv1)"])
    cols = {
        "n0": pa.array([n0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "conv0": pa.array([c0], pa.int64()),
        "conv1": pa.array([c1], pa.int64()),
        "rate0": pa.array([c0 / n0 if n0 else None], pa.float64()),
        "rate1": pa.array([c1 / n1 if n1 else None], pa.float64()),
    }
    if n0 and n1 and 0 < c0 + c1 < n0 + n1:
        p = (c0 + c1) / (n0 + n1)
        z = (c0 / n0 - c1 / n1) / np.sqrt(
            p * (1 - p) * (1 / n0 + 1 / n1))
        cols["z"] = pa.array([float(z)], pa.float64())
    else:
        cols["z"] = pa.array([None], pa.float64())
    return pa.table(cols)


def grouped_ks_statistic(ds, key_cols, value_col: str, side_col: str,
                         n_buckets: int = 64):
    """Two-sample Kolmogorov-Smirnov statistic per key, EXACT: with
    samples of sizes n0/n1 (``side_col`` in {0,1}), the KS sup-distance
    evaluated at the pooled distinct values is

        KS = max over v of |c0(v)·n1 − c1(v)·n0| / (n0·n1)

    where c_s(v) = #{side-s samples ≤ v} — the numerator and sizes are
    int64 (ties handled correctly by evaluating AFTER each distinct
    value), so the max is exact and the single closing division is the
    only float.  The standard exact drift test beside PSI's binned
    score.  Keys with an empty side yield typed-null ks.  ONE bucketed
    co-partition; cumulative sums vectorized across keys."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(key_cols)

    def ks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [value_col], kind="mergesort") \
             .reset_index(drop=True)
        gb = g.groupby(keys, sort=False)
        side = g[side_col].astype("int64")
        is1 = (side == 1).astype("int64")
        is0 = 1 - is1
        c0 = is0.groupby([g[k] for k in keys], sort=False).cumsum()
        c1 = is1.groupby([g[k] for k in keys], sort=False).cumsum()
        n0 = is0.groupby([g[k] for k in keys], sort=False) \
            .transform("sum")
        n1 = is1.groupby([g[k] for k in keys], sort=False) \
            .transform("sum")
        # evaluate only at the LAST row of each distinct value run
        # (ties: the ECDF steps after all equal values)
        nxt_val = gb[value_col].shift(-1)
        last = nxt_val.isna() | (nxt_val != g[value_col])
        d = (c0 * n1 - c1 * n0).abs()
        d = d.where(last, 0)
        df = pd.DataFrame({**{k: g[k] for k in keys},
                           "numer": d, "n0": n0, "n1": n1})
        out = df.groupby(keys, sort=False, as_index=False) \
            .agg(ks_numer=("numer", "max"), n0=("n0", "max"),
                 n1=("n1", "max"))
        num = out["ks_numer"].to_numpy(dtype=np.float64)
        den = (out["n0"] * out["n1"]).to_numpy(dtype=np.float64)
        ok = den > 0
        out["ks"] = pd.array(
            [float(a / b) if o else None
             for a, b, o in zip(num, den, ok)], dtype="Float64")
        out["ks_numer"] = out["ks_numer"].astype("int64")
        return out

    return bucketed_group_transform(ds, keys, ks, n_buckets=n_buckets)


def grouped_mannwhitney(ds, key_cols, value_col: str, side_col: str,
                        n_buckets: int = 64):
    """Mann-Whitney U / AUC per key, EXACT (the rank-sum companion to
    grouped_ks_statistic; AUC = P(random side-1 value > random side-0
    value) + half-ties — the probability-of-superiority effect size):
    midranks are computed as DOUBLED integers (a tie run at pooled
    1-based positions [i, j] has midrank (i+j)/2, so rank2 = i+j is
    int64-exact — the mad_outliers doubled-int idiom), giving

        R1_2 = Σ rank2 over side-1,   u2 = R1_2 − n1·(n1+1) = 2·U1
        auc  = u2 / (2·n0·n1)

    with ONE float division at the close.  Also emits the exact-int
    ``u2`` and the invariant-friendly sizes.  Keys with an empty side
    yield typed-null auc.  ONE bucketed co-partition; tie runs found
    with vectorized grouped min/max of pooled positions."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(key_cols)

    def mw(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [value_col], kind="mergesort") \
             .reset_index(drop=True)
        pos = g.groupby(keys, sort=False).cumcount() + 1
        first = pos.groupby([g[k] for k in keys] + [g[value_col]],
                            sort=False).transform("min")
        last = pos.groupby([g[k] for k in keys] + [g[value_col]],
                           sort=False).transform("max")
        rank2 = (first + last).astype("int64")
        is1 = (g[side_col].astype("int64") == 1).astype("int64")
        df = pd.DataFrame({**{k: g[k] for k in keys},
                           "r1_2": rank2 * is1, "n1": is1,
                           "n0": 1 - is1})
        s = df.groupby(keys, sort=False, as_index=False).sum()
        n0 = s["n0"].astype("int64")
        n1 = s["n1"].astype("int64")
        u2 = (s["r1_2"] - n1 * (n1 + 1)).astype("int64")
        s["u2"] = u2
        den = (2 * n0 * n1).to_numpy(dtype=np.float64)
        ok = den > 0
        s["auc"] = pd.array(
            [float(a) / b if o else None
             for a, b, o in zip(u2.to_numpy(dtype=np.float64), den, ok)],
            dtype="Float64")
        s["n0"], s["n1"] = n0, n1
        return s.drop(columns=["r1_2"])

    return bucketed_group_transform(ds, keys, mw, n_buckets=n_buckets)


def grouped_welch_ttest(ds, key_cols, value_col: str, side_col: str,
                        n_buckets: int = 64):
    """Welch's unequal-variance t-test per key (the MEAN-shift
    companion to two_proportion_ztest's rates): from exact int64
    per-side moment partials (n, Σx, Σx²),

        m_s  = Σx_s / n_s
        v_s  = (Σx²_s − Σx_s·Σx_s / n_s) / (n_s − 1)
        se2  = v_0/n_0 + v_1/n_1
        t    = (m_1 − m_0) / sqrt(se2)
        df   = se2² / ((v_0/n_0)²/(n_0−1) + (v_1/n_1)²/(n_1−1))

    every float op in this FIXED order (mirrored by the SQL oracle
    with explicit double casts), and t/df floor-rounded at 1e9 for
    hash stability.  Sides with n < 2, or zero pooled variance, yield
    typed-null t/df.  Kilobyte partials only."""
    import pandas as pd

    from .aggregate import grouped_agg

    keys = list(key_cols)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: t.column(k).slice(0, 0) for k in keys},
                             **{c: pa.array([], pa.int64())
                                for c in ("n0", "sx0", "sxx0",
                                          "n1", "sx1", "sxx1")}})
        x = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t.column(side_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({**{k: t.column(k).to_numpy(zero_copy_only=False)
                              for k in keys},
                           "n0": (s == 0).astype(np.int64),
                           "sx0": np.where(s == 0, x, 0),
                           "sxx0": np.where(s == 0, x * x, 0),
                           "n1": (s == 1).astype(np.int64),
                           "sx1": np.where(s == 1, x, 0),
                           "sxx1": np.where(s == 1, x * x, 0)})
        return pa.Table.from_pandas(
            df.groupby(keys, sort=False, as_index=False).sum(),
            preserve_index=False)

    sums = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       keys,
                       [("sum", c, c) for c in
                        ("n0", "sx0", "sxx0", "n1", "sx1", "sxx1")],
                       combine="bucket", n_buckets=n_buckets)

    def close(t: pa.Table) -> pa.Table:
        c = {k: t.column(k).to_numpy(zero_copy_only=False)
             .astype(np.float64)
             for k in ("n0", "sx0", "sxx0", "n1", "sx1", "sxx1")}
        ok = (c["n0"] >= 2) & (c["n1"] >= 2)
        with np.errstate(divide="ignore", invalid="ignore"):
            m0 = c["sx0"] / c["n0"]
            m1 = c["sx1"] / c["n1"]
            v0 = (c["sxx0"] - c["sx0"] * c["sx0"] / c["n0"]) \
                / (c["n0"] - 1.0)
            v1 = (c["sxx1"] - c["sx1"] * c["sx1"] / c["n1"]) \
                / (c["n1"] - 1.0)
            se2 = v0 / c["n0"] + v1 / c["n1"]
            tt = (m1 - m0) / np.sqrt(se2)
            dfr = se2 * se2 / (
                (v0 / c["n0"]) * (v0 / c["n0"]) / (c["n0"] - 1.0)
                + (v1 / c["n1"]) * (v1 / c["n1"]) / (c["n1"] - 1.0))
        ok = ok & (se2 > 0)
        tt = np.floor(tt * 1e9 + 0.5) / 1e9
        dfr = np.floor(dfr * 1e9 + 0.5) / 1e9
        out = t
        out = out.append_column("t", pa.array(
            [float(v) if o else None for v, o in zip(tt, ok)],
            pa.float64()))
        return out.append_column("df", pa.array(
            [float(v) if o else None for v, o in zip(dfr, ok)],
            pa.float64()))

    return sums.map_batches(close, batch_format="pyarrow")


def grouped_fano_factor(ds, key_cols, ts_col: str = "ts",
                        bucket_us: int = 3_600_000_000,
                        n_buckets: int = 64):
    """Burstiness / overdispersion audit: the Fano factor
    var(per-bucket counts) / mean(per-bucket counts) per key over the
    key's OBSERVED span (empty buckets inside the span count as zero —
    computed arithmetically from the span length, never materialized).
    F ~ 1 is Poisson-like arrival, F >> 1 is bursty.  With B buckets in
    the span, n_i the occupied-bucket counts and N = Σn_i:

        mean = N / B,   var = (Σn_i² − N²/B) / B   (population)

    — Σn_i² from occupied buckets only is EXACT because empty buckets
    contribute zero.  Int64 sums; two fixed-order float divisions,
    floor-rounded at 1e9.  Keys with B < 1 yield typed-null."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(key_cols)

    def fano(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64")
        g = g.assign(bucket=ts // bucket_us)
        agg = g.groupby(keys + ["bucket"], sort=False) \
            .agg(n=("bucket", "size")).reset_index()
        gk = [agg[k] for k in keys]
        stats = agg.groupby(keys, as_index=False, sort=False).agg(
            total=("n", "sum"),
            sq=("n", lambda s: int((s.astype("int64") ** 2).sum())),
            bmin=("bucket", "min"), bmax=("bucket", "max"))
        B = (stats["bmax"] - stats["bmin"] + 1).astype("int64")
        N = stats["total"].astype("int64")
        sq = stats["sq"].astype("int64")
        Bf = B.to_numpy(dtype=np.float64)
        Nf = N.to_numpy(dtype=np.float64)
        sqf = sq.to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = Nf / Bf
            var = (sqf - Nf * Nf / Bf) / Bf
            f = var / mean
        f = np.floor(f * 1e9 + 0.5) / 1e9
        ok = (Bf >= 1) & (Nf > 0)
        out = stats[keys].copy()
        out["n_buckets_span"] = B
        out["n_events"] = N
        out["fano"] = pd.array(
            [float(v) if o else None for v, o in zip(f, ok)],
            dtype="Float64")
        return out

    return bucketed_group_transform(ds, keys, fano, n_buckets=n_buckets)


def chi_square_contingency(ds, row_col: str, col_col: str,
                           n_buckets: int = 32):
    """Chi-square test of independence over a contingency table (are
    event type and hour-of-day independent? tool and status?): one
    pass of (row, col) count partials, marginals reduced from the cell
    table, and PER-CELL output — observed, expected =
    row_total·col_total/grand (one fixed-order float expression) and
    the chi² contribution (obs−exp)²/exp — so every float is an
    order-free per-cell expression a SQL oracle replays exactly (a
    single chi² TOTAL would need an ordered float sum, which SQL
    aggregates cannot mirror; callers sum the column knowing the
    caveat).  Cells absent from the data are emitted with observed 0
    (the dense row x col cross — the table is marginal-sized)."""
    import pandas as pd

    import ray

    from .aggregate import grouped_agg

    cells = grouped_agg(
        ds.map_batches(lambda t: t.select([row_col, col_col]),
                       batch_format="pyarrow"),
        [row_col, col_col], [("count", None, "obs")],
        combine="driver")
    tbl = pa.concat_tables(ray.get(cells.materialize().to_arrow_refs()))
    df = tbl.to_pandas()
    rows = df.groupby(row_col, as_index=False)["obs"].sum() \
        .rename(columns={"obs": "row_total"})
    colsm = df.groupby(col_col, as_index=False)["obs"].sum() \
        .rename(columns={"obs": "col_total"})
    grand = int(df["obs"].sum())
    dense = rows.merge(colsm, how="cross")
    dense = dense.merge(df, on=[row_col, col_col], how="left")
    dense["obs"] = dense["obs"].fillna(0).astype("int64")
    rt = dense["row_total"].to_numpy(dtype=np.float64)
    ct = dense["col_total"].to_numpy(dtype=np.float64)
    ob = dense["obs"].to_numpy(dtype=np.float64)
    exp = rt * ct / float(grand)
    contrib = (ob - exp) * (ob - exp) / exp
    dense["row_total"] = dense["row_total"].astype("int64")
    dense["col_total"] = dense["col_total"].astype("int64")
    dense["expected"] = exp
    dense["chi2_contrib"] = contrib
    dense = dense.sort_values([row_col, col_col],
                              kind="mergesort").reset_index(drop=True)
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(dense,
                                              preserve_index=False))
