"""Metric-context dataset functions (transformprocessor metric family).

Re-expresses the dataset-shaped metric functions of
/root/reference/processor/transformprocessor/internal/metrics/ over a
FLATTENED metric table: one row per datapoint, metric-level fields as
``metric_name`` / ``metric_unit`` / ``metric_type`` /
``metric_description`` / ``metric_aggregation_temporality`` /
``metric_is_monotonic`` columns, datapoint fields (``value_double``,
``value_int``, ``count``, ``sum``, ``time_unix_nano``, ``attr_*``) as
plain columns.  The scalar editors (convert_sum_to_gauge /
convert_gauge_to_sum / scale_metric) live in functions/registry.py and
run inside TransformStage(context="metric"|"datapoint"); the functions
here change the ROW SET (copy/extract emit new rows,
aggregate_on_attributes regroups), so they are Dataset-level.

All row-emitting functions are map-only (`map_batches` appends rows per
batch — no shuffle); aggregate_on_attributes delegates to the two-phase
grouped_agg.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_METRIC_COLS = ("metric_name", "metric_description", "metric_unit",
                "metric_type", "metric_aggregation_temporality",
                "metric_is_monotonic")

# metric types whose datapoints carry count/sum fields
# (func_extract_count_metric.go:53-70 switch)
_HISTOGRAMMY = ("Histogram", "ExponentialHistogram", "Summary")


def _set(t: pa.Table, name: str, value) -> pa.Table:
    arr = (value if isinstance(value, (pa.Array, pa.ChunkedArray))
           else pa.array([value] * t.num_rows))
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def copy_metric(ds, name: str, new_name: str, unit: str | None = None,
                description: str | None = None):
    """func_copy_metric.go — duplicate every datapoint row of metric
    ``name`` under ``new_name`` (optional unit/description overrides);
    original rows pass through unchanged.  Map-only."""

    def dup(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.equal(batch.column("metric_name"), name), False)
        copies = batch.filter(mask)
        if copies.num_rows:
            copies = _set(copies, "metric_name", new_name)
            if unit is not None:
                copies = _set(copies, "metric_unit", unit)
            if description is not None:
                copies = _set(copies, "metric_description", description)
            # unit=/description= may add columns the batch lacks
            return pa.concat_tables([batch, copies],
                                    promote_options="permissive")
        return batch

    return ds.map_batches(dup, batch_format="pyarrow")


def _extract(ds, value_from: str, suffix: str, monotonic: bool,
             unit_override: str | None):
    def emit(batch: pa.Table) -> pa.Table:
        t = batch.column("metric_type")
        temp = (batch.column("metric_aggregation_temporality")
                if "metric_aggregation_temporality" in batch.column_names
                else pa.nulls(batch.num_rows, pa.string()))
        # histograms need a known temporality; Summary is implicitly
        # cumulative and always extracts (func_extract_sum_metric.go:
        # getAggregationTemporality returns Cumulative for Summary)
        temp_ok = pc.or_(pc.is_valid(temp),
                         pc.fill_null(pc.equal(t, "Summary"), False))
        mask = pc.and_(pc.fill_null(pc.is_in(t, value_set=pa.array(_HISTOGRAMMY)), False),
                       temp_ok)
        if value_from in batch.column_names:
            mask = pc.and_(mask, pc.is_valid(batch.column(value_from)))
            src = batch.filter(mask)
        else:
            src = batch.slice(0, 0)
        if src.num_rows == 0:
            return batch
        new = _set(src, "metric_name",
                   pc.binary_join_element_wise(src.column("metric_name").cast(pa.string()),
                                               pa.array([suffix] * src.num_rows), ""))
        new = _set(new, "metric_type", "Sum")
        new = _set(new, "metric_is_monotonic", monotonic)
        if "metric_aggregation_temporality" in new.column_names:
            # Summary rows carry no temporality; the extracted Sum is
            # cumulative (getAggregationTemporality)
            new = _set(new, "metric_aggregation_temporality",
                       pc.fill_null(new.column("metric_aggregation_temporality")
                                    .cast(pa.string()), "cumulative"))
        if unit_override is not None:
            new = _set(new, "metric_unit", unit_override)
        val = src.column(value_from).cast(pa.float64())
        new = _set(new, "value_double", val)
        return pa.concat_tables([batch, new], promote_options="permissive")

    return ds.map_batches(emit, batch_format="pyarrow")


def extract_count_metric(ds, monotonic: bool = False):
    """func_extract_count_metric.go:36-80 — for each histogram /
    exp-histogram / summary datapoint (with a known temporality) emit a
    Sum datapoint named ``<name>_count`` with unit '1' carrying the
    count; original rows pass through."""
    return _extract(ds, value_from="count", suffix="_count",
                    monotonic=monotonic, unit_override="1")


def extract_sum_metric(ds, monotonic: bool = False):
    """func_extract_sum_metric.go:40-90 — emit ``<name>_sum`` Sum
    datapoints carrying the sum field (unit kept); datapoints without a
    sum are skipped (addSumDataPoint HasSum gate)."""
    return _extract(ds, value_from="sum", suffix="_sum",
                    monotonic=monotonic, unit_override=None)


def exp_to_explicit_histogram(ds, bounds, keys: Sequence[str],
                              bucket_col: str = "bucket",
                              count_col: str = "n", scale: int = 0,
                              distribution: str = "upper",
                              combine: str = "driver"):
    """func_convert_exponential_hist_to_explicit_hist.go — re-bin
    exponential-bucket rows (keys, bucket index, count — the flattened
    exp_histogram_agg layout) onto explicit bounds.

    distribution='upper' assigns each exp bucket's count to the explicit
    bucket containing its UPPER edge base^(k+1); 'midpoint' uses the
    bucket midpoint — the reference's two deterministic modes (its
    'uniform'/'random' spreads are non-reproducible across batch splits
    and are intentionally not offered).  A null exp index (the
    zero_count bucket) re-bins at value 0.  Output: keys + ``le`` (the
    explicit upper bound, +inf for overflow) + the summed count.
    Map-only re-bin + a small grouped re-sum."""
    import numpy as np

    from .aggregate import grouped_agg

    if distribution not in ("upper", "midpoint"):
        raise ValueError(f"unsupported distribution {distribution!r}")
    base = 2.0 ** (2.0 ** -scale)
    b = np.asarray(sorted(float(x) for x in bounds), dtype=np.float64)

    def rebin(t: pa.Table) -> pa.Table:
        k = t.column(bucket_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)  # null -> nan
        upper = base ** (k + 1.0)
        if distribution == "midpoint":
            v = (base ** k + upper) / 2.0
        else:
            v = upper
        v = np.where(np.isnan(k), 0.0, v)  # zero bucket re-bins at 0
        idx = np.searchsorted(b, v, side="left")
        le = np.where(idx < len(b), b[np.minimum(idx, len(b) - 1)], np.inf)
        return (t.select(list(keys) + [count_col])
                 .append_column("le", pa.array(le, pa.float64())))

    ds = ds.map_batches(rebin, batch_format="pyarrow")
    return grouped_agg(ds, list(keys) + ["le"],
                       [("sum", count_col, count_col)], combine=combine)


def aggregate_on_attribute_value(ds, fn: str = "sum", attribute: str = "",
                                 values: Sequence[str] = (),
                                 new_value: str = "",
                                 value_col: str = "value_double",
                                 combine: str = "bucket"):
    """func_agregate_on_attribute_value_metrics.go — rewrite the listed
    attribute VALUES to new_value (map-only), then aggregate datapoints
    that now collide on identical keys.  Groups on every metric-level
    column plus all attr_* columns (the reference merges datapoints with
    equal attribute sets)."""
    from .aggregate import grouped_agg

    if fn not in ("sum", "max", "min", "mean", "count"):
        raise ValueError(f"unsupported aggregation function {fn!r}")
    col = attribute if attribute.startswith("attr_") else f"attr_{attribute}"
    vals = pa.array(list(values), pa.string())

    def rewrite(t: pa.Table) -> pa.Table:
        if col not in t.column_names:
            return t
        c = t.column(col)
        m = pc.fill_null(pc.is_in(c, value_set=vals), False)
        return t.set_column(t.column_names.index(col), col,
                            pc.if_else(m, pa.scalar(new_value), c))

    ds = ds.map_batches(rewrite, batch_format="pyarrow")
    names = ds.schema().names
    keys = [c for c in names if c in _METRIC_COLS or c.startswith("attr_")]
    spec = (fn, None if fn == "count" else value_col, value_col)
    return grouped_agg(ds, keys, [spec], combine=combine)


def aggregate_on_attributes(ds, fn: str = "sum",
                            attributes: Sequence[str] | None = None,
                            value_col: str = "value_double",
                            combine: str = "bucket"):
    """func_aggregate_on_attributes_metrics.go — regroup datapoints of
    each metric keeping only ``attributes`` (None = drop ALL attributes,
    the reference's default), aggregating ``value_col`` with fn in
    sum/max/min/mean/count.  Two-phase grouped_agg: partial per batch,
    one bucketed shuffle."""
    from .aggregate import grouped_agg

    if fn not in ("sum", "max", "min", "mean", "count"):
        raise ValueError(f"unsupported aggregation function {fn!r}")
    schema_names = ds.schema().names
    keys = [c for c in _METRIC_COLS if c in schema_names]
    keys += [a if a.startswith("attr_") else f"attr_{a}"
             for a in (attributes or [])]
    spec = (fn, None if fn == "count" else value_col, value_col)
    return grouped_agg(ds, keys, [spec], combine=combine)


def histogram_quantile(hist_ds, qs: Sequence[float], keys: Sequence[str],
                       le_col: str = "le", count_col: str = "n",
                       edges: Sequence[float] | None = None,
                       n_buckets: int = 16):
    """PromQL ``histogram_quantile`` over an explicit-bucket histogram
    (prometheus promql/quantile.go bucketQuantile; the consumer side of
    the spanmetrics histogram family): per key group, buckets sort by
    upper bound (the 'inf' label last), counts accumulate, and for each
    q the estimate is

        rank = q * total
        b    = first bucket with cum(b) >= rank
        b is the +Inf bucket  -> highest finite upper bound
        else                  -> start + (end - start) * ((rank - cum(b-1)) / count(b))

    with start = 0 for the first bucket (PromQL's implicit lower
    bound).  ``edges`` densifies each key against the full bound list
    (histogram_agg emits only observed buckets; without densification
    the interpolation start is the previous PRESENT bound — a coarser
    but still valid estimator; WITH edges the math is bucket-for-bucket
    PromQL).  The EXACT operation order is mirrored by the SQL oracle,
    so the float64 results replay bit-for-bit.  One bucketed
    co-partition of the (tiny, keys x buckets) histogram table;
    vectorized across keys per bucket.  Returns keys + ``q`` float64 +
    ``value`` float64."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    keys = list(keys)
    q_arr = np.asarray(list(qs), dtype=np.float64)
    if not len(q_arr) or (q_arr < 0).any() or (q_arr > 1).any():
        raise ValueError(f"quantiles must be in [0, 1]: {list(qs)}")
    full_ubs = None if edges is None else         [float(e) for e in edges] + [np.inf]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(__ub=pd.to_numeric(
            g[le_col].replace("inf", np.inf))).drop(columns=[le_col])
        if full_ubs is not None:
            uk = g[keys].drop_duplicates()
            dense = uk.merge(pd.DataFrame({"__ub": full_ubs}), how="cross")
            g = dense.merge(g[keys + ["__ub", count_col]],
                            on=keys + ["__ub"], how="left")
            g[count_col] = g[count_col].fillna(0).astype(np.int64)
        g = g.sort_values(keys + ["__ub"], kind="mergesort")
        grp = g.groupby(keys, sort=False)
        pos = grp.cumcount().to_numpy()
        cum = grp[count_col].cumsum().to_numpy(dtype=np.float64)
        cnt = g[count_col].to_numpy(dtype=np.float64)
        ubv = g["__ub"].to_numpy(dtype=np.float64)
        start = np.where(pos > 0, np.roll(ubv, 1), 0.0)
        cum_prev = np.where(pos > 0, np.roll(cum, 1), 0.0)
        total = grp[count_col].transform("sum").to_numpy(dtype=np.float64)
        hi_fin = pd.Series(np.where(np.isfinite(ubv), ubv, np.nan)) \
            .groupby([g[k].reset_index(drop=True) for k in keys],
                     sort=False).transform("max").to_numpy()
        out = []
        for q in q_arr:
            rank = q * total
            # first bucket whose cumulative reaches the rank: rows after
            # it have cum_prev >= rank, rows before it fail cum >= rank
            sel = (cum >= rank) & ((cum_prev < rank) | (pos == 0)) \
                & (cnt > 0)
            r = g.loc[sel, keys].copy()
            ub_s = ubv[sel]
            val = np.where(
                np.isinf(ub_s), hi_fin[sel],
                start[sel] + (ub_s - start[sel])
                * ((rank[sel] - cum_prev[sel]) / cnt[sel]))
            r["q"] = q
            r["value"] = val
            out.append(r)
        res = pd.concat(out, ignore_index=True) if out else             pd.DataFrame(columns=keys + ["q", "value"])
        return res.sort_values(keys + ["q"],
                               kind="mergesort").reset_index(drop=True)

    return bucketed_group_transform(hist_ds, keys, per_bucket,
                                    n_buckets=n_buckets)
