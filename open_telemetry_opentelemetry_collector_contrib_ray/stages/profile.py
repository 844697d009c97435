"""One-pass table profiling — per-column data-quality statistics.

Every serious ingestion pipeline fronts its sinks with a profile step
(what the reference leaves to backends: null rates, cardinalities,
ranges — the inputs to schema drift detection and the
expectations gate in stages/validate.py).  This stage computes, for
every requested column in ONE streaming pass over the data:

* ``n`` / ``n_null`` — row and null counts,
* ``n_distinct`` — distinct non-null values (exact or HLL),
* ``min_i`` / ``max_i`` — value range for integer columns,
* ``sum_len`` — total UTF-8 length for string columns (null rate +
  mean length are the standard text-corpus health metrics).

Scale shape: the count/range/length stats reduce through kilobyte
per-batch partials (one row per column per batch, merged on the
driver — the grouped_agg(combine="driver") tree).  Distinct counts are
the only part that can carry data volume:

* ``distinct="exact"`` — per-batch LOCAL distinct per column, then a
  bucketed distinct of (column, value-string) pairs; what shuffles is
  each block's distinct values once, which is exactly the cost SQL
  ``count(DISTINCT col)`` pays.  Right when cardinalities are bounded
  (enums, keys, tags) or for oracle-checked runs.
* ``distinct="approx"`` — the mergeable HLL sketch from
  stages/sketch.py (p=12, ~1.6% rse): constant-size partials, ZERO
  value shuffle.  The 100-TB default for free-text/high-cardinality
  columns.

Value identity for the exact path uses each column's Arrow string
cast, which is injective on distinct values (Arrow formats floats as
shortest-round-trip), so the distinct count equals the engine-native
``count(DISTINCT col)``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_agg


def _is_int(t: pa.DataType) -> bool:
    return pa.types.is_integer(t)


def _is_str(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


class _StatsPartial:
    """One partial row per column per batch."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def __call__(self, t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, lens = [], [], [], [], [], []
        for c in self.columns:
            col = t.column(c)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            if _is_int(col.type):
                mm = pc.min_max(col)
                mins.append(mm["min"].as_py())
                maxs.append(mm["max"].as_py())
            else:
                mins.append(None)
                maxs.append(None)
            if _is_str(col.type):
                s = pc.sum(pc.utf8_length(col))
                lens.append(0 if s.as_py() is None else s.as_py())
            else:
                lens.append(None)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_i": pa.array(mins, pa.int64()),
            "max_i": pa.array(maxs, pa.int64()),
            "sum_len": pa.array(lens, pa.int64())})


class _DistinctPairs:
    """Per-batch LOCAL distinct (column, value-string) pairs."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.array([], pa.string())
        names, vals = [empty], [empty]
        for c in self.columns:
            u = pc.unique(pc.cast(t.column(c), pa.string())).drop_null()
            names.append(pa.array(np.full(len(u), c), pa.string()))
            vals.append(u)
        return pa.table({"col": pa.concat_arrays(names),
                         "v": pa.concat_arrays(vals)})


def profile_table(ds, columns: Sequence[str] | None = None,
                  distinct: str = "exact", hll_p: int = 12,
                  n_buckets: int = 64):
    """Profile ``columns`` (default: all) of a Dataset; returns one row
    per column: col, n, n_null, n_distinct, min_i, max_i, sum_len.
    ``distinct="approx"`` swaps the exact distinct for the HLL
    estimate (int64-rounded) — see module docstring for the trade."""
    if columns is None:
        columns = ds.schema().names
    columns = list(columns)

    stats = grouped_agg(
        ds.map_batches(_StatsPartial(columns), batch_format="pyarrow"),
        ["col"],
        [("sum", "n", "n"), ("sum", "n_null", "n_null"),
         ("min", "min_i", "min_i"), ("max", "max_i", "max_i"),
         ("sum", "sum_len", "sum_len")],
        combine="driver")

    if distinct == "exact":
        pairs = ds.map_batches(_DistinctPairs(columns),
                               batch_format="pyarrow")
        dcounts = grouped_agg(
            grouped_agg(pairs, ["col", "v"], [("count", None, "__one")],
                        combine="bucket", n_buckets=n_buckets),
            ["col"], [("count", None, "n_distinct")], combine="driver")
        d = {r["col"]: r["n_distinct"] for r in dcounts.take_all()}
    elif distinct == "approx":
        from .sketch import approx_distinct
        d = {}
        for c in columns:
            sub = ds.map_batches(
                lambda t, c=c: pa.table(
                    {c: pc.cast(t.column(c), pa.string())}).drop_null(),
                batch_format="pyarrow")
            d[c] = int(round(approx_distinct(sub, c, p=hll_p)))
    else:
        raise ValueError(f"unknown distinct mode {distinct!r}")

    def attach(t: pa.Table) -> pa.Table:
        nd = [d.get(c, 0) for c in t.column("col").to_pylist()]
        return t.append_column("n_distinct", pa.array(nd, pa.int64())) \
                .select(["col", "n", "n_null", "n_distinct", "min_i",
                         "max_i", "sum_len"])

    return stats.map_batches(attach, batch_format="pyarrow")
